"""Dedup pipeline against planted ground truth at 20k docs — recall
and precision of the full MinHash-LSH-verify path, exact dedup
completeness, all computed from closed-form plants (no quadratic
reference pass)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cerberus_cpp_spark.operators import dedup as DD
from cerberus_cpp_spark.sources.textgen import (
    planted_exact_pairs,
    planted_near_pairs,
    synthetic_docs,
)

N = 20_000


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_docs(spark, N, partitions=8).cache()


def test_generator_shapes(spark, corpus) -> None:
    assert corpus.count() == N
    row = corpus.where("doc_id = 1").collect()[0]
    src = corpus.where("doc_id = 0").collect()[0]
    w1, w0 = row["text"].split(" "), src["text"].split(" ")
    assert len(w1) == len(w0)
    diff = sum(a != b for a, b in zip(w1, w0))
    assert 0 < diff <= len(w0) // 10 + 1  # every 10th token mutated


def test_exact_dedup_completeness(spark, corpus) -> None:
    truth = planted_exact_pairs(N)
    groups = DD.exact_duplicates(corpus).collect()
    found_keep = {g["keep_id"] for g in groups}
    assert {a for a, b in truth} <= found_keep
    assert len(groups) == len(truth)  # no false dup groups


def test_near_dup_recall_and_precision(spark, corpus) -> None:
    truth = planted_near_pairs(N)
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.near_duplicates(corpus, threshold=0.5).collect()
    }
    # exact copies also surface as jaccard-1.0 pairs — count them as
    # correct, not as precision errors
    exact_truth = planted_exact_pairs(N)
    tp = got & truth
    recall = len(tp) / len(truth)
    extras = got - truth - exact_truth
    assert recall >= 0.95, f"recall {recall:.3f}"
    # random 997-word docs share almost no 3-gram shingles: nothing
    # besides the plants should clear jaccard 0.5
    assert not extras, f"unexpected pairs: {sorted(extras)[:5]}"


def test_clusters_match_union_find_at_scale(spark, corpus) -> None:
    """Distributed connected components over the REAL found-pair
    distribution at 20k docs must equal a driver-side union-find on
    the identical pairs — and converge in few rounds (pointer
    jumping; near-dup graphs are shallow)."""
    pairs_df = DD.near_duplicates(corpus, threshold=0.5) \
        .select("id_a", "id_b").localCheckpoint(eager=True)
    pairs = [(r["id_a"], r["id_b"]) for r in pairs_df.collect()]
    assert len(pairs) > 150  # plants actually surfaced

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in pairs for v in e}
    expected = {}
    roots: dict[int, int] = {}
    for v in touched:
        r = find(v)
        roots.setdefault(r, v)
        roots[r] = min(roots[r], v)
    for v in touched:
        expected[v] = roots[find(v)]

    got = {
        r["doc_id"]: (r["cluster_id"], r["keep_id"])
        for r in DD.near_duplicate_clusters(pairs_df, max_iter=8)
        .collect()
    }
    assert len(got) == len(expected)
    for v, cid in expected.items():
        assert got[v] == (cid, cid), (v, got[v], cid)
    # transitive components exist in this corpus (exact-copy chains
    # overlapping near-copy bases) — make sure we exercised >2-node
    # clusters, not just pairs
    from collections import Counter

    sizes = Counter(c for c, _ in got.values())
    assert max(sizes.values()) >= 3


def test_cc_local_and_distributed_agree(spark) -> None:
    """The size-guarded union-find finish must reproduce the
    distributed min-label/pointer-jumping loop row for row."""
    import random

    rng = random.Random(11)
    pairs = {(rng.randrange(60), rng.randrange(60))
             for _ in range(80)}
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    local = {tuple(r) for r in
             DD.near_duplicate_clusters(df).collect()}
    dist = {tuple(r) for r in
            DD.near_duplicate_clusters(
                df, local_finish_edges=0).collect()}
    assert local == dist


def test_cc_scale_pin_million_node_chains(spark) -> None:
    """r3 verdict #8 — CC at 10^6 docs: ~977 planted chains of
    diameter 1023 (the adversarial shape for label propagation; real
    near-dup clusters are far shallower). Pins three things:

    * ROUND COUNT: pointer jumping must converge within 13 rounds
      (O(log2 diameter) + slack); `near_duplicate_clusters` RAISES
      past max_iter, so plain propagation (O(diameter) = 1023
      rounds) fails loudly rather than slowly.
    * CORRECTNESS at scale: every node's cluster_id equals its
      chain head — asserted with one distributed count, no 10^6-row
      driver collect.
    * BLOCK-STORAGE HYGIENE: the per-round checkpoints are freed as
      the loop advances (r3 ADVICE leak); at the end only the final
      labels frame may remain resident.

    Wall time ~50 s at local[4] (BENCH.md §15 records the measured
    local[32] figure).
    """
    import time

    from cerberus_cpp_spark.functions.ckpt import (
        _persistent_ids,
        free_checkpoint,
    )

    n, chain = 1_000_000, 1024
    edges = (
        spark.range(0, n, 1, 8)
        .where((F.col("id") + 1) % chain != 0)   # chain boundaries
        .where(F.col("id") + 1 < n)
        .select(F.col("id").alias("id_a"),
                (F.col("id") + 1).alias("id_b"))
    )
    before = _persistent_ids(spark)
    t0 = time.time()
    # local_finish_edges=0: this test pins the DISTRIBUTED
    # pointer-jumping loop (round count, leak hygiene); the guarded
    # in-process finish would otherwise absorb a 2M-row edge list
    labels = DD.near_duplicate_clusters(edges, max_iter=13,
                                        local_finish_edges=0)
    bad = labels.where(
        F.col("cluster_id")
        != (F.col("doc_id") / chain).cast("long") * chain
    ).count()
    total = labels.count()
    wall = time.time() - t0
    assert total == n and bad == 0, (total, bad)

    leaked = frozenset(_persistent_ids(spark) - before)
    # only the FINAL labels checkpoint may be resident (callers own
    # it); O(rounds) leftovers mean the per-round free regressed
    assert len(leaked) <= 1, f"leaked {len(leaked)} checkpoint RDDs"
    free_checkpoint(spark, leaked)
    assert wall < 600, f"CC at 1M nodes took {wall:.0f}s"
