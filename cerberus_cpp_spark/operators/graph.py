"""Graph primitives over edge DataFrames: bounded-depth BFS and
degree-oriented triangle counting.

Why they live here: the dedup family already runs one graph
algorithm at scale (connected components over near-dup pairs,
``operators/dedup.py``); these are the next two questions a curation
loop asks of the same pair graphs — "what else is within k hops of
this contaminated seed set" (blast-radius expansion for eval-set
decontamination) and "how clique-y is the duplicate graph" (triangle
density separates true duplicate clusters from hash-collision
chains). Reference analogue: the referential-integrity multi-hop
chain checks (SURVEY §2.3) generalized from FK paths to arbitrary
edges.

Scale shapes:

- ``bfs_hops`` is frontier expansion with a DRIVER-BOUNDED loop
  (``max_hops`` iterations, like the pointer-jumping rounds in
  ``dedup.connected_components``): each round is one equi-join of
  the CURRENT frontier against the edge table plus an anti-join
  against the visited set — the frontier never re-expands visited
  nodes, so total work is O(edges touched), not O(edges * rounds).
  Every shuffle is keyed on the node id; no step is
  data-proportional on the driver.
- ``triangle_count`` uses the classic degree orientation (each
  undirected edge points from its (degree, id)-smaller endpoint to
  the larger): the oriented graph is acyclic with max out-degree
  O(sqrt(m)) for ANY graph, so the wedge join's fan-out is bounded
  and each triangle is counted EXACTLY once. Two equi-joins, all
  integer arithmetic — the DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def simple_undirected(edges: DataFrame, *, src: str = "src",
                      dst: str = "dst") -> DataFrame:
    """Canonicalize an edge list into a simple undirected graph:
    drop self-loops and NULL endpoints, order each pair as
    (u = least, v = greatest), dedupe. One distinct aggregate."""
    return (
        edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull()
                    & (F.col(src) != F.col(dst)))
        .select(F.least(src, dst).alias("u"),
                F.greatest(src, dst).alias("v"))
        .distinct()
    )


def _bfs_local(spark, adj_rows, seed_rows, *, node_name: str,
               node_type, max_hops: int) -> DataFrame:
    """In-process finish of the frontier walk over the collected
    cleaned adjacency + seed set — identical set semantics (distinct
    neighbors minus visited per hop, seeds at 0), so the (node, hops)
    table is exactly the distributed loop's (pinned in tests)."""
    from pyspark.sql import types as T

    adjm: dict = {}
    for r in adj_rows:
        adjm.setdefault(r["a"], set()).add(r["b"])
    visited = {r["n"]: 0 for r in seed_rows}
    frontier = set(visited)
    for h in range(1, max_hops + 1):
        nxt = set()
        for a in frontier:
            nxt |= adjm.get(a, set())
        nxt -= visited.keys()
        if not nxt:
            break
        for n in nxt:
            visited[n] = h
        frontier = nxt
    schema = T.StructType([
        T.StructField(node_name, node_type, True),
        T.StructField("hops", T.IntegerType(), False),
    ])
    if not visited:
        return spark.createDataFrame([], schema)
    rdd = spark.sparkContext.parallelize(
        sorted(visited.items()), numSlices=1)
    return spark.createDataFrame(rdd, schema)


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_hops: int = 3,
    directed: bool = False,
    local_finish_edges: int = 2_000_000,
) -> DataFrame:
    """Minimum hop count from any seed to every node within
    ``max_hops`` edges: returns ``(node, hops)`` with seeds at 0.
    Undirected mode (default) walks edges both ways.

    Frontier loop, one round per hop (driver-bounded — the loop
    count is a parameter, never data-dependent): new frontier =
    neighbors of the current frontier anti-joined against all
    visited nodes, both sides keyed on the node id. Each round's
    frontier and visited set are lazily ``localCheckpoint``ed —
    each is referenced by the next round AND the final result, and
    without the truncation the lineage doubles per round (the same
    discipline as ``dedup.connected_components``; blocks are freed
    when the frames are garbage-collected). The early-exit probe
    (``limit(1)``) is the only per-round driver action and stops
    the loop as soon as a frontier drains.

    ``local_finish_edges`` (the k_core / CC / pagerank in-process
    discipline): when BOTH the cleaned adjacency and the seed set are
    at most this many rows (bounded ``limit(n+1)`` collects — seeds
    must be guarded too, they are caller data), the whole walk runs
    in-process with identical set semantics; over-guard inputs fall
    through to the unchanged distributed loop (0 forces it).
    Local == distributed is pinned in tests."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    adj = edges.where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    ).select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        adj = adj.unionByName(
            adj.select(F.col("b").alias("a"), F.col("a").alias("b")))
    adj = adj.distinct()
    if local_finish_edges > 0:
        g = int(local_finish_edges)
        adj_rows = adj.limit(g + 1).collect()
        if len(adj_rows) <= g:
            seed_rows = (
                seeds.where(F.col(node).isNotNull())
                .select(F.col(node).alias("n")).distinct()
                .limit(g + 1).collect())
            if len(seed_rows) <= g:
                return _bfs_local(
                    edges.sparkSession, adj_rows, seed_rows,
                    node_name=node,
                    node_type=seeds.schema[node].dataType,
                    max_hops=int(max_hops))

    frontier = (
        seeds.where(F.col(node).isNotNull())
        .select(F.col(node).alias("n")).distinct()
        .localCheckpoint(eager=False)
    )
    visited = frontier.withColumn("hops", F.lit(0)) \
        .localCheckpoint(eager=False)
    for h in range(1, int(max_hops) + 1):
        frontier = (
            adj.join(frontier, adj["a"] == frontier["n"])
            .select(F.col("b").alias("n")).distinct()
            .join(visited.select("n"), "n", "left_anti")
            .localCheckpoint(eager=False)
        )
        if frontier.limit(1).count() == 0:
            break
        visited = visited.unionByName(
            frontier.withColumn("hops", F.lit(h))
        ).localCheckpoint(eager=False)
    return visited.select(F.col("n").alias(node), "hops")


def _oriented(g: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Degree-orient the simple undirected graph ``g`` (columns
    ``u < v``): each edge points from its (degree, id)-smaller
    endpoint to the larger. The oriented graph is acyclic with
    out-degree O(sqrt(m)) for ANY graph, which bounds the wedge
    join's fan-out. Returns ``(a, b)`` plus the degree table as a
    second frame via a tuple."""
    deg = (
        g.select(F.col("u").alias("x"))
        .unionByName(g.select(F.col("v").alias("x")))
        .groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    )
    withd = (
        g.join(deg.withColumnRenamed("x", "u")
               .withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v")
              .withColumnRenamed("d", "dv"), "v")
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    o = withd.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    return o, deg


def _closed_wedges(g: DataFrame, o: DataFrame) -> DataFrame:
    """All triangles of ``g`` as ``(a, p, q)`` rows — apex ``a`` is
    the triangle's (degree, id)-least vertex, ``p < q`` by id (the
    same (least, greatest) convention as ``g`` itself, so the
    closure join hits ``g`` directly). Each triangle appears exactly
    once."""
    w1 = o.select(F.col("a"), F.col("b").alias("p"))
    w2 = o.select(F.col("a"), F.col("b").alias("q"))
    wedges = w1.join(w2, "a").where(F.col("p") < F.col("q"))
    return wedges.join(
        g.select(F.col("u").alias("p"), F.col("v").alias("q")),
        ["p", "q"])


def clustering_coefficients(
    edges: DataFrame, *, src: str = "src", dst: str = "dst",
    local_finish_edges: int = 20_000,
) -> DataFrame:
    """Local clustering coefficient per node of the simple
    undirected graph: ``(node, degree, n_triangles, lcc)`` with
    ``lcc = 2 * n_triangles / (degree * (degree - 1))`` — the share
    of a node's neighbor pairs that are themselves connected, the
    per-node signal that separates true duplicate cliques (lcc → 1)
    from hash-collision chains (lcc → 0); ``triangle_count`` is its
    corpus-level fold. Degree-1 nodes report 0 triangles and
    lcc = 0.0 (no neighbor pair exists — the conventional value).
    Output rows exist only for nodes that appear as an endpoint of
    a surviving simple edge: a node whose every input edge was a
    self-loop or had a NULL endpoint is absent (it has no degree in
    the simple graph), so left-join from your node table if a row
    per node is required.

    Shape: the same bounded-fan-out oriented wedge join as
    ``triangle_count``; each closed triangle then explodes to its
    THREE member nodes (a constant 3× on the triangle frame, not
    the edge frame) and one hash aggregate folds per-node counts.
    All integer until the single final f64 division.

    ``local_finish_edges``: same in-process finish and 20k default
    as :func:`triangle_count` (counts are algorithm-independent and
    the final division runs the identical IEEE ops in the identical
    order — pinned local == distributed in tests); 0 forces
    distributed."""
    g = simple_undirected(edges, src=src, dst=dst)
    if local_finish_edges > 0:
        rows = g.limit(int(local_finish_edges) + 1).collect()
        if len(rows) <= int(local_finish_edges):
            from pyspark.sql import types as T

            degd, tri, _ = _triangles_local(rows)
            schema = T.StructType([
                T.StructField("node", edges.schema[src].dataType,
                              True),
                T.StructField("degree", T.LongType(), False),
                T.StructField("n_triangles", T.LongType(), False),
                T.StructField("lcc", T.DoubleType(), False),
            ])
            out = [
                (n, d, tri[n],
                 (2.0 * tri[n] / (float(d) * (d - 1)))
                 if d >= 2 else 0.0)
                for n, d in sorted(degd.items())
            ]
            if not out:
                return edges.sparkSession.createDataFrame([], schema)
            rdd = edges.sparkSession.sparkContext.parallelize(
                out, numSlices=1)
            return edges.sparkSession.createDataFrame(rdd, schema)
    o, deg = _oriented(g)
    tri = _closed_wedges(g, o)
    per_node = (
        tri.select(F.explode(F.array("a", "p", "q")).alias("x"))
        .groupBy("x").agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(per_node, "x", "left")
        .select(
            F.col("x").alias("node"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long").alias("n_triangles"),
            F.when(
                F.col("d") >= 2,
                2.0 * F.coalesce(F.col("n_triangles"), F.lit(0))
                / (F.col("d").cast("double") * (F.col("d") - 1)),
            ).otherwise(F.lit(0.0)).alias("lcc"),
        )
    )


def _pagerank_local(spark, adj_rows, *, node_type, rounds: int,
                    damping_num: int, damping_den: int,
                    scale: int) -> DataFrame:
    """In-process finish of the PageRank rounds over the collected
    cleaned adjacency — the EXACT distributed arithmetic: Python's
    arbitrary-precision ints reproduce the decimal(38,0) inbox sums
    and ``//`` equals ``div`` on the all-positive ranks, so the
    result is the identical integer rank table (pinned in tests)."""
    from pyspark.sql import types as T

    adj = [(r["a"], r["b"]) for r in adj_rows]
    nodes = sorted({a for a, _ in adj} | {b for _, b in adj})
    outdeg: dict = {}
    for a, _ in adj:
        outdeg[a] = outdeg.get(a, 0) + 1
    base = scale * (damping_den - damping_num) // damping_den
    rank = {n: scale for n in nodes}
    for _ in range(rounds):
        inbox: dict = {}
        for a, b in adj:
            inbox[b] = inbox.get(b, 0) + rank[a] // outdeg[a]
        rank = {n: base + damping_num * inbox.get(n, 0) // damping_den
                for n in nodes}
    schema = T.StructType([
        T.StructField("node", node_type, True),
        T.StructField("rank", T.LongType(), True),
    ])
    # single-slice parallelize (the ledger-commit fix): a tiny frame
    # must not cost one empty Python task per default partition
    if not nodes:
        return spark.createDataFrame([], schema)
    rdd = spark.sparkContext.parallelize(
        [(n, rank[n]) for n in nodes], numSlices=1)
    return spark.createDataFrame(rdd, schema)


def pagerank_scaled(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000_000_000,
    local_finish_edges: int = 2_000_000,
) -> DataFrame:
    """Deterministic INTEGER-scaled PageRank over the directed edge
    list: ranks live in units of ``1/scale`` and every round is pure
    int64 arithmetic — integer sums are order-independent, so the
    result is bit-portable across engines and partitionings (the
    same reason ``hll_estimate`` keeps its denominator integral; an
    f64 PageRank's sum order is not reproducible). With
    ``scale = 1e12`` the floor-rounding error after a handful of
    rounds is < 1e-9 of the f64 value.

    Overflow: the per-node inbox sum and the ``num * inbox``
    product are accumulated in ``decimal(38,0)`` — a hub with
    millions of in-neighbours would otherwise wrap int64 silently
    (~1.1e17 inbox at ``scale=1e12`` crosses 2**63 after the
    damping multiply). Only the FINAL rank must fit int64, which
    holds whenever ``n_nodes * scale < 2**63`` (rank is bounded by
    total mass); pick ``scale`` accordingly for huge graphs.

    Contract (documented variant): ``rank_0 = scale`` for every
    node; each round every node sends ``floor(rank / outdeg)`` along
    each out-edge and
    ``rank' = floor(scale * (den - num) / den) + floor(num * inbox / den)``.
    Dangling nodes (outdeg 0) keep receiving but their mass is NOT
    redistributed (the standard simplification; total mass therefore
    decays — ranks are comparable within a run). Self-loops and
    duplicate edges are dropped; NULL endpoints are dropped.

    Shape: the adjacency and out-degree frames build once; each of
    the ``rounds`` driver-bounded iterations is one equi-join on the
    node id plus one hash aggregate with map-side partials — no step
    is data-proportional on the driver, and each round's rank frame
    is lazily ``localCheckpoint``ed (same lineage discipline as
    ``bfs_hops``).

    ``local_finish_edges`` (the k_core / CC / BPE in-process-finish
    discipline): when the cleaned distinct adjacency is at most this
    many rows (2M rows ≈ 32 MB of ids, the bounded-ferry class), the
    guard and collect share one ``limit(n+1)`` job and ALL rounds run
    in-process with the identical arithmetic — Python's arbitrary-
    precision ints make the inbox sums exact like decimal(38,0), and
    ``//`` equals ``div`` on the all-positive ranks. Over-guard
    graphs fall through to the unchanged distributed loop (0 forces
    it); local == distributed is pinned rank-for-rank in tests."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if not 0 < damping_num <= damping_den:
        raise ValueError("need 0 < damping_num <= damping_den")
    if scale < 10 ** 6:
        raise ValueError("scale must be >= 1e6 (rounding floor)")
    adj = (
        edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull()
                    & (F.col(src) != F.col(dst)))
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct()
    )
    if local_finish_edges > 0:
        rows = adj.limit(int(local_finish_edges) + 1).collect()
        if len(rows) <= int(local_finish_edges):
            return _pagerank_local(
                edges.sparkSession, rows,
                node_type=edges.schema[src].dataType,
                rounds=int(rounds), damping_num=int(damping_num),
                damping_den=int(damping_den), scale=int(scale))
    nodes = (
        adj.select(F.col("a").alias("node"))
        .unionByName(adj.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg"))
    base = int(scale) * (int(damping_den) - int(damping_num)) \
        // int(damping_den)
    rank = nodes.withColumn("rank", F.lit(int(scale)).cast("long")) \
        .localCheckpoint(eager=False)
    for _ in range(int(rounds)):
        send = (
            rank.join(outdeg, "node")
            .join(adj, rank["node"] == adj["a"])
            .select(
                F.col("b").alias("node"),
                # `div` = int64 division (truncation == floor for the
                # all-positive ranks) — never a f64 round-trip, so the
                # result is exact by construction, not by mantissa
                # headroom
                F.expr("rank div outdeg").alias("c"),
            )
            # decimal(38,0) accumulation: Spark sums decimal exactly
            # (no int64 wrap on hub nodes); `div` on decimal returns
            # the exact integral quotient.
            .groupBy("node").agg(
                F.sum(F.col("c").cast("decimal(38,0)")).alias("inbox"))
        )
        rank = (
            nodes.join(send, "node", "left")
            .select(
                "node",
                F.expr(
                    f"{base}L + (CAST({int(damping_num)} AS"
                    f" DECIMAL(38,0)) * coalesce(inbox, CAST(0 AS"
                    f" DECIMAL(38,0)))) div {int(damping_den)}L"
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return rank


def _k_core_local(live: DataFrame, k: int) -> DataFrame:
    """Finish the peel fixpoint in-process from a size-guarded
    collect of the symmetric live-edge frame — the exact same
    algorithm (remove sub-k nodes until none remain), so the result
    set is identical to however many more distributed rounds would
    have run. Returns the (node, degree) frame built from ONE
    driver slice (the tiny-frame ``parallelize`` discipline)."""
    spark = live.sparkSession
    adj: dict = {}
    for r in live.collect():
        adj.setdefault(r["a"], set()).add(r["b"])
    queue = [n for n, nb in adj.items() if len(nb) < k]
    while queue:
        n = queue.pop()
        nbs = adj.pop(n, None)
        if nbs is None:
            continue
        for m in nbs:
            peers = adj.get(m)
            if peers is None:
                continue
            peers.discard(n)
            if len(peers) == k - 1:
                queue.append(m)
    schema = T.StructType([
        T.StructField("node", live.schema["a"].dataType, True),
        T.StructField("degree", T.LongType(), False),
    ])
    rows = [(n, len(nb)) for n, nb in adj.items()]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)


def k_core(
    edges: DataFrame,
    *,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 1_000,
    local_finish_edges: int = 2_000_000,
) -> DataFrame:
    """The k-core of the simple undirected graph — the maximal
    subgraph in which every node has degree >= k — as
    ``(node, degree)`` rows with the WITHIN-core degree. The duplicate
    graph's "how dense is this cluster really" question at corpus
    scale: cores survive where hash-collision chains peel away.

    Classic peeling to the fixpoint: each round computes live
    degrees (one hash aggregate) and anti-joins sub-k nodes out of
    the edge list (two keyed anti-joins); the loop exits on the
    first round whose edge count is unchanged (a removed node has
    live degree >= 1, so an effective round strictly shrinks the
    frame — the count doubles as the convergence probe AND the
    materializer of the round's checkpoint). Peeling is monotone, so
    rounds are bounded by the node count; ``max_rounds`` is a
    diagnostics backstop (raises, never silently truncates — an
    UN-converged peel is not a k-core). Each round's edge frame is
    lazily ``localCheckpoint``ed (lineage doubles per round
    otherwise — the ``bfs_hops`` discipline).

    Peel tails are long chains of near-empty rounds (a tree tail
    peels one level per round), each paying a full driver-job round
    trip; once the live frame is at most ``local_finish_edges``
    symmetric rows (2M rows ≈ 32 MB of ids — the bounded-driver
    ferry discipline of the ADC block loop), the fixpoint finishes
    in-process on the collected frame with the identical algorithm
    (measured 6.6s → 0.9s on a 20-round 101-node tail; the result
    is the same fixpoint either way). Set it to 0 to force every
    round distributed."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    g = simple_undirected(edges, src=src, dst=dst)
    live = (
        g.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(
            g.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .localCheckpoint(eager=False)
    )
    cnt = live.count()
    for _ in range(int(max_rounds)):
        if cnt <= int(local_finish_edges):
            return _k_core_local(live, k)
        bad = (
            live.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") < k).select("a")
            .localCheckpoint(eager=False)
        )
        live = (
            live.join(bad, "a", "left_anti")
            .join(bad.withColumnRenamed("a", "b"), "b", "left_anti")
            .localCheckpoint(eager=False)
        )
        new_cnt = live.count()
        if new_cnt == cnt:
            return (
                live.groupBy(F.col("a").alias("node"))
                .agg(F.count(F.lit(1)).alias("degree"))
            )
        cnt = new_cnt
    raise ValueError(
        f"k_core did not converge within max_rounds={max_rounds}; "
        "raise the backstop (rounds are bounded by the node count)")


def _triangles_local(g_rows):
    """Exact per-node triangle counts + degrees of a collected
    simple graph (rows with ``u < v``). Counting is algorithm-
    independent — a triangle either exists or it does not — so any
    exact enumeration matches the distributed wedge join's counts
    EXACTLY; this one iterates each edge's common-neighbor set with
    the ``w > v`` cut so every triangle counts once. Returns
    ``(deg, tri, n_edges)`` dicts/int."""
    adjs: dict = {}
    deg: dict = {}
    for r in g_rows:
        u, v = r["u"], r["v"]
        adjs.setdefault(u, set()).add(v)
        adjs.setdefault(v, set()).add(u)
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    tri = {n: 0 for n in deg}
    for r in g_rows:
        u, v = r["u"], r["v"]
        for w in adjs[u] & adjs[v]:
            if w > v:
                tri[u] += 1
                tri[v] += 1
                tri[w] += 1
    return deg, tri, len(g_rows)


def triangle_count(edges: DataFrame, *, src: str = "src",
                   dst: str = "dst",
                   local_finish_edges: int = 20_000) -> DataFrame:
    """Exact triangle count of the simple undirected graph, one
    row: ``(n_nodes, n_edges, n_triangles)``.

    Degree orientation: point each edge from its (degree, id)-
    smaller endpoint to the larger — acyclic, out-degree bounded by
    O(sqrt(m)) — then count wedges (a→b, a→c with b < c ordered by
    the same key) closed by an oriented edge b→c. Each triangle has
    exactly one vertex with out-edges to the other two under a total
    order, so the count is exact with no division. Three
    aggregates + two equi-joins, all integers.

    ``local_finish_edges`` (the shared in-process-finish
    discipline): a simple graph of at most this many edges counts
    in-process from one bounded ``limit(n+1)`` collect — a triangle
    either exists or it does not, so any exact enumeration produces
    the identical counts (pinned local == distributed in tests).
    Default 20k (not the 2M of the linear-cost finishes: local
    counting is O(m·√m)); 0 forces distributed."""
    g = simple_undirected(edges, src=src, dst=dst)
    if local_finish_edges > 0:
        rows = g.limit(int(local_finish_edges) + 1).collect()
        if len(rows) <= int(local_finish_edges):
            from pyspark.sql import types as T

            deg, tri, n_edges = _triangles_local(rows)
            schema = T.StructType([
                T.StructField("n_nodes", T.LongType(), False),
                T.StructField("n_edges", T.LongType(), False),
                T.StructField("n_triangles", T.LongType(), False),
            ])
            rdd = edges.sparkSession.sparkContext.parallelize(
                [(len(deg), n_edges, sum(tri.values()) // 3)],
                numSlices=1)
            return edges.sparkSession.createDataFrame(rdd, schema)
    o, deg = _oriented(g)
    closed = _closed_wedges(g, o)
    return (
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(g.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(closed.agg(
            F.count(F.lit(1)).alias("n_triangles")))
    )
