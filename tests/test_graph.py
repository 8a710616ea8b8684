"""operators/graph.py: BFS hop counts and degree-oriented triangle
counting, pinned against brute-force Python references on random and
structured graphs; operators/temporal.py scd2_intervals."""

from __future__ import annotations

import itertools
import random
from collections import deque

import pytest
from pyspark.sql import Row

from cerberus_cpp_spark.operators.graph import (
    bfs_hops,
    simple_undirected,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs],
        schema="src long, dst long")


def _seeds(spark, nodes):
    return spark.createDataFrame([Row(node=n) for n in nodes],
                                 schema="node long")


def _brute_bfs(pairs, seeds, max_hops, directed):
    adj = {}
    for a, b in pairs:
        if a is None or b is None:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        x = q.popleft()
        if dist[x] >= max_hops:
            continue
        for y in adj.get(x, ()):
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def _brute_triangles(pairs):
    es = {tuple(sorted(p)) for p in pairs
          if p[0] is not None and p[1] is not None and p[0] != p[1]}
    nodes = sorted({x for e in es for x in e})
    tri = sum(
        1 for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (a, c) in es and (b, c) in es)
    return len(nodes), len(es), tri


@pytest.mark.parametrize("directed", [False, True])
def test_bfs_matches_brute_force(spark, directed) -> None:
    rng = random.Random(5)
    pairs = [(rng.randrange(30), rng.randrange(30))
             for _ in range(70)]
    seeds = [0, 7]
    got = {r.node: r.hops for r in bfs_hops(
        _edges(spark, pairs), _seeds(spark, seeds),
        max_hops=3, directed=directed).collect()}
    assert got == _brute_bfs(pairs, seeds, 3, directed)


def test_bfs_chain_caps_at_max_hops(spark) -> None:
    pairs = [(i, i + 1) for i in range(10)]
    got = {r.node: r.hops for r in bfs_hops(
        _edges(spark, pairs), _seeds(spark, [0]),
        max_hops=4, directed=True).collect()}
    assert got == {i: i for i in range(5)}


def test_bfs_early_exit_on_drained_frontier(spark) -> None:
    pairs = [(0, 1)]
    got = {r.node: r.hops for r in bfs_hops(
        _edges(spark, pairs), _seeds(spark, [0]),
        max_hops=50, directed=True).collect()}
    assert got == {0: 0, 1: 1}


def test_bfs_seed_min_hop_wins(spark) -> None:
    # node 2 reachable at hop 2 from seed 0 and hop 1 from seed 3
    pairs = [(0, 1), (1, 2), (3, 2)]
    got = {r.node: r.hops for r in bfs_hops(
        _edges(spark, pairs), _seeds(spark, [0, 3]),
        max_hops=3, directed=True).collect()}
    assert got[2] == 1


def test_bfs_guards(spark) -> None:
    with pytest.raises(ValueError):
        bfs_hops(_edges(spark, [(0, 1)]), _seeds(spark, [0]),
                 max_hops=0)


def test_triangles_match_brute_force(spark) -> None:
    rng = random.Random(9)
    pairs = [(rng.randrange(25), rng.randrange(25))
             for _ in range(120)]
    row = triangle_count(_edges(spark, pairs)).collect()[0]
    n, m, t = _brute_triangles(pairs)
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (n, m, t)
    assert t > 0  # dense enough that the test is non-vacuous


def test_triangles_known_shapes(spark) -> None:
    # K4 has 4 triangles; duplicate + reversed + self-loop edges
    # must not change the count
    k4 = list(itertools.combinations(range(4), 2))
    noisy = k4 + [(b, a) for a, b in k4] + [(2, 2), (0, 1)]
    row = triangle_count(_edges(spark, noisy)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)


def test_triangles_triangle_free(spark) -> None:
    star = [(0, i) for i in range(1, 6)]
    row = triangle_count(_edges(spark, star)).collect()[0]
    assert row.n_triangles == 0 and row.n_edges == 5


def test_simple_undirected_canonicalizes(spark) -> None:
    got = sorted((r.u, r.v) for r in simple_undirected(
        _edges(spark, [(2, 1), (1, 2), (1, 1), (3, 4)])).collect())
    assert got == [(1, 2), (3, 4)]


# ------------------------------------------------------------- scd2

def test_scd2_intervals(spark) -> None:
    import datetime as dt

    from cerberus_cpp_spark.operators.temporal import scd2_intervals

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    df = spark.createDataFrame(
        [Row(k=1, ts=ts(0), v="a"), Row(k=1, ts=ts(10), v="b"),
         Row(k=1, ts=ts(5), v="c"), Row(k=2, ts=ts(3), v="d"),
         Row(k=3, ts=None, v="x")],
        schema="k long, ts timestamp, v string")
    got = {(r.k, r.version_index): r for r in scd2_intervals(
        df, key="k", ts="ts").collect()}
    assert len(got) == 4  # NULL-ts row dropped
    assert got[(1, 1)].v == "a" and got[(1, 1)].valid_to == ts(5)
    assert got[(1, 2)].v == "c" and got[(1, 2)].valid_to == ts(10)
    assert got[(1, 3)].v == "b" and got[(1, 3)].is_current
    assert got[(2, 1)].is_current and got[(2, 1)].valid_from == ts(3)
    # intervals tile: every non-current valid_to == next valid_from
    assert got[(1, 1)].valid_to == got[(1, 2)].valid_from


def test_scd2_tiebreak_orders_same_microsecond(spark) -> None:
    import datetime as dt

    from cerberus_cpp_spark.operators.temporal import scd2_intervals

    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [Row(k=1, ts=t, seq=2, v="late"),
         Row(k=1, ts=t, seq=1, v="early")],
        schema="k long, ts timestamp, seq long, v string")
    got = {r.version_index: r.v for r in scd2_intervals(
        df, key="k", ts="ts", tiebreak="seq").collect()}
    assert got == {1: "early", 2: "late"}


# ------------------------------------------------------------------
# clustering_coefficients
# ------------------------------------------------------------------


def _brute_lcc(pairs):
    adj = {}
    for a, b in pairs:
        if a is None or b is None or a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nb in adj.items():
        d = len(nb)
        t = sum(
            1 for x, y in itertools.combinations(sorted(nb), 2)
            if y in adj.get(x, ()))
        lcc = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
        out[v] = (d, t, lcc)
    return out


def test_lcc_k4_and_path(spark):
    from cerberus_cpp_spark.operators.graph import (
        clustering_coefficients,
    )

    # K4: every node degree 3, in 3 triangles, lcc 1.0; plus a
    # pendant path 4-10-11 (10 has degree 2, no triangle, lcc 0).
    pairs = list(itertools.combinations([1, 2, 3, 4], 2)) + [
        (4, 10), (10, 11)]
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["lcc"])
        for r in clustering_coefficients(
            _edges(spark, pairs)).collect()
    }
    assert got == _brute_lcc(pairs)
    assert got[1] == (3, 3, 1.0)
    assert got[10] == (2, 0, 0.0)
    assert got[11] == (1, 0, 0.0)


def test_lcc_random_vs_brute(spark):
    from cerberus_cpp_spark.operators.graph import (
        clustering_coefficients,
    )

    rng = random.Random(7)
    pairs = list({(rng.randrange(24), rng.randrange(24))
                  for _ in range(120)})
    got = {
        r["node"]: (r["degree"], r["n_triangles"],
                    round(r["lcc"], 12))
        for r in clustering_coefficients(
            _edges(spark, pairs)).collect()
    }
    want = {v: (d, t, round(l, 12))
            for v, (d, t, l) in _brute_lcc(pairs).items()}
    assert got == want


def test_lcc_consistent_with_triangle_count(spark):
    from cerberus_cpp_spark.operators.graph import (
        clustering_coefficients,
    )

    rng = random.Random(11)
    pairs = list({(rng.randrange(18), rng.randrange(18))
                  for _ in range(90)})
    e = _edges(spark, pairs)
    total = triangle_count(e).collect()[0]["n_triangles"]
    per_node = clustering_coefficients(e).agg(
        {"n_triangles": "sum"}).collect()[0][0]
    assert per_node == 3 * total  # each triangle counted at 3 nodes


# ------------------------------------------------------------------
# pagerank_scaled
# ------------------------------------------------------------------


def _brute_pagerank_scaled(pairs, rounds, num=85, den=100,
                           scale=10**12):
    adj = {}
    nodes = set()
    for a, b in pairs:
        if a is None or b is None or a == b:
            continue
        adj.setdefault(a, set()).add(b)
        nodes.add(a)
        nodes.add(b)
    base = scale * (den - num) // den
    rank = {v: scale for v in nodes}
    for _ in range(rounds):
        inbox = {v: 0 for v in nodes}
        for u, nb in adj.items():
            c = rank[u] // len(nb)
            for v in nb:
                inbox[v] += c
        rank = {v: base + num * inbox[v] // den for v in nodes}
    return rank


def test_pagerank_matches_brute_integer_reference(spark):
    from cerberus_cpp_spark.operators.graph import pagerank_scaled

    rng = random.Random(3)
    pairs = list({(rng.randrange(20), rng.randrange(20))
                  for _ in range(100)})
    got = {r["node"]: r["rank"]
           for r in pagerank_scaled(_edges(spark, pairs),
                                    rounds=3).collect()}
    assert got == _brute_pagerank_scaled(pairs, 3)


def test_pagerank_cycle_uniform(spark):
    from cerberus_cpp_spark.operators.graph import pagerank_scaled

    # a directed cycle is rank-uniform at every round
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    rows = pagerank_scaled(_edges(spark, pairs), rounds=4).collect()
    assert len({r["rank"] for r in rows}) == 1
    assert len(rows) == 5


def test_pagerank_sink_receives_more(spark):
    from cerberus_cpp_spark.operators.graph import pagerank_scaled

    # star into node 0: 0 is dangling and must outrank the spokes
    pairs = [(i, 0) for i in range(1, 6)]
    got = {r["node"]: r["rank"]
           for r in pagerank_scaled(_edges(spark, pairs),
                                    rounds=2).collect()}
    assert got[0] > got[1]
    assert got == _brute_pagerank_scaled(pairs, 2)


def test_pagerank_guards(spark):
    from cerberus_cpp_spark.operators.graph import pagerank_scaled

    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        pagerank_scaled(e, rounds=0)
    with pytest.raises(ValueError):
        pagerank_scaled(e, damping_num=0)
    with pytest.raises(ValueError):
        pagerank_scaled(e, damping_num=101, damping_den=100)
    with pytest.raises(ValueError):
        pagerank_scaled(e, scale=10)


# ------------------------------------------------------------------
# k_core
# ------------------------------------------------------------------


def _brute_k_core(pairs, k):
    adj = {}
    for a, b in pairs:
        if a is None or b is None or a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    live = dict(adj)
    while True:
        bad = [v for v, nb in live.items()
               if len([x for x in nb if x in live]) < k]
        if not bad:
            break
        for v in bad:
            live.pop(v)
    return {v: len([x for x in live[v] if x in live]) for v in live}


def test_k_core_handpicked(spark):
    from cerberus_cpp_spark.operators.graph import k_core

    # K4 + triangle tail + chain: k=3 keeps only the K4
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6), (6, 7), (5, 7), (7, 8), (8, 9)]
    got3 = {r["node"]: r["degree"]
            for r in k_core(_edges(spark, pairs), k=3).collect()}
    assert got3 == {1: 3, 2: 3, 3: 3, 4: 3}
    got2 = {r["node"]: r["degree"]
            for r in k_core(_edges(spark, pairs), k=2).collect()}
    assert got2 == _brute_k_core(pairs, 2)
    assert set(got2) == {1, 2, 3, 4, 5, 6, 7}
    assert k_core(_edges(spark, pairs), k=4).count() == 0


@pytest.mark.parametrize("k", [1, 2, 3])
def test_k_core_random_vs_brute(spark, k):
    from cerberus_cpp_spark.operators.graph import k_core

    rng = random.Random(50 + k)
    pairs = list({(rng.randrange(22), rng.randrange(22))
                  for _ in range(110)})
    got = {r["node"]: r["degree"]
           for r in k_core(_edges(spark, pairs), k=k).collect()}
    assert got == _brute_k_core(pairs, k)


def test_k_core_cascade_needs_multiple_rounds(spark):
    from cerberus_cpp_spark.operators.graph import k_core

    # a path: peeling a 2-core cascades from both ends, one node per
    # round per side — exercises the loop genuinely
    pairs = [(i, i + 1) for i in range(10)]
    assert k_core(_edges(spark, pairs), k=2).count() == 0
    # close it into a cycle: every node survives with degree 2
    got = {r["node"]: r["degree"]
           for r in k_core(_edges(spark, pairs + [(10, 0)]),
                           k=2).collect()}
    assert got == {i: 2 for i in range(11)}


def test_k_core_local_and_distributed_agree(spark):
    # the size-guarded in-process finish must reproduce the pure
    # distributed peel exactly — same fixpoint, same degrees
    rng = random.Random(7)
    pairs = [(rng.randrange(40), rng.randrange(40))
             for _ in range(120)]
    from cerberus_cpp_spark.operators.graph import k_core

    e = _edges(spark, pairs)
    for k in (2, 3):
        local = {(r["node"], r["degree"])
                 for r in k_core(e, k=k).collect()}
        dist = {(r["node"], r["degree"])
                for r in k_core(e, k=k,
                                local_finish_edges=0).collect()}
        assert local == dist


def test_k_core_guards(spark):
    from cerberus_cpp_spark.operators.graph import k_core

    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        k_core(e, k=0)
    with pytest.raises(ValueError):
        k_core(e, k=1, max_rounds=0)
    # the size-guarded local finish solves any small graph outright,
    # so the backstop is only reachable with it disabled
    with pytest.raises(ValueError, match="did not converge"):
        k_core(_edges(spark, [(i, i + 1) for i in range(10)]),
               k=2, max_rounds=2, local_finish_edges=0)
    # ... and with it enabled the same graph converges (empty 2-core)
    assert k_core(_edges(spark, [(i, i + 1) for i in range(10)]),
                  k=2, max_rounds=2).count() == 0


def test_pagerank_local_finish_equals_distributed(spark):
    """local_finish_edges=default (in-process rounds) must reproduce
    the forced-distributed loop rank-for-rank, including the hub-sum
    arithmetic (Python int == decimal(38,0))."""
    from cerberus_cpp_spark.operators.graph import pagerank_scaled

    rng = random.Random(11)
    pairs = list({(rng.randrange(25), rng.randrange(25))
                  for _ in range(140)})
    edges = _edges(spark, pairs)
    local = {(r["node"], r["rank"])
             for r in pagerank_scaled(edges, rounds=3).collect()}
    dist = {(r["node"], r["rank"])
            for r in pagerank_scaled(
                edges, rounds=3, local_finish_edges=0).collect()}
    assert local == dist and local == {
        (n, v) for n, v in _brute_pagerank_scaled(pairs, 3).items()}


def test_bfs_local_finish_equals_distributed(spark):
    """local_finish_edges=default (in-process walk) must reproduce the
    forced-distributed frontier loop node-for-node, directed and
    undirected, including unreachable nodes and isolated seeds."""
    from cerberus_cpp_spark.operators.graph import bfs_hops

    rng = random.Random(7)
    pairs = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(80)})
    edges = _edges(spark, pairs)
    seeds = spark.createDataFrame([(0,), (29,), (None,)],
                                  "node long")
    for directed in (False, True):
        local = {(r["node"], r["hops"])
                 for r in bfs_hops(edges, seeds, max_hops=3,
                                   directed=directed).collect()}
        dist = {(r["node"], r["hops"])
                for r in bfs_hops(edges, seeds, max_hops=3,
                                  directed=directed,
                                  local_finish_edges=0).collect()}
        assert local == dist, directed


def test_triangles_lcc_local_finish_equals_distributed(spark):
    """local_finish_edges=default (in-process enumeration) must equal
    the distributed wedge join exactly — counts are algorithm-
    independent, and the lcc division runs the identical IEEE ops."""
    from cerberus_cpp_spark.operators.graph import (
        clustering_coefficients,
        triangle_count,
    )

    rng = random.Random(5)
    pairs = list({(rng.randrange(40), rng.randrange(40))
                  for _ in range(200)})
    edges = _edges(spark, pairs)
    assert (triangle_count(edges).collect()
            == triangle_count(edges, local_finish_edges=0).collect())
    local = sorted(map(tuple, clustering_coefficients(
        edges).collect()))
    dist = sorted(map(tuple, clustering_coefficients(
        edges, local_finish_edges=0).collect()))
    assert local == dist
