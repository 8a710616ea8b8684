"""Distributed synthetic document corpus with planted duplicates.

Executor-side generation (spark.range + integer column arithmetic,
like ``distgen``): documents are word sequences over a 997-token
vocabulary (``w0``..``w996``). Planted structure, all deterministic:

- every ``near_every``-th doc (id % near_every == 1) is a NEAR-copy
  of its predecessor: same base sequence, every ``mutate_stride``-th
  token replaced → n-gram Jaccard ≈ 0.6-0.8 vs the source doc;
- every ``exact_every``-th doc is an EXACT copy of the doc
  ``exact_every // 2`` before it.

Ground truth is computable in closed form (`planted_near_pairs`), so
dedup recall/precision can be asserted at any scale without a
quadratic reference pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_docs(
    spark: SparkSession,
    n: int,
    *,
    near_every: int = 100,
    exact_every: int = 251,
    mutate_stride: int = 10,
    min_len: int = 30,
    len_spread: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, text) — deterministic corpus with planted dups."""
    num_parts = partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, n, 1, num_parts)
    base = (
        f"IF(id % {near_every} = 1 AND id > 0, id - 1,"
        f" IF(id % {exact_every} = 0 AND id >= {exact_every},"
        f" id - {exact_every // 2}, id))"
    )
    # doc length and token stream derive from the BASE id, so copies
    # share them; near-copies then mutate every k-th position.
    # Token index must be a NON-LINEAR mix of (base, j): any affine
    # formula makes every doc a shifted window of one cyclic
    # progression and random doc pairs share most shingles (observed:
    # spurious jaccard≈0.9 pairs). hash() is Murmur3 — deterministic
    # across partitions/executors.
    length = f"({min_len} + pmod(({base}) * 2654435761L, {len_spread}))"
    word = f"concat('w', pmod(hash(({base}), j), 997))"
    mutated = (
        f"IF(id % {near_every} = 1 AND id > 0 AND j % {mutate_stride} = 0,"
        f" concat('w', pmod(hash(id, j, 7L), 997)), {word})"
    )
    return df.select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, {length}),"
            f" j -> {mutated}))"
        ).alias("text"),
    )


def _display_streams(
    n: int, near_every: int, exact_every: int
) -> dict[int, tuple[int, bool]]:
    """doc_id → (stream_base_id, mutated?) — the generator's display
    semantics in closed form. Two docs relate iff they share a
    stream base: both pure → exact dup; exactly one mutated → near
    dup; both mutated impossible (one near target per base+1)."""
    out = {}
    for i in range(n):
        if i % near_every == 1 and i > 0:
            out[i] = (i - 1, True)
        elif i % exact_every == 0 and i >= exact_every:
            out[i] = (i - exact_every // 2, False)
        else:
            out[i] = (i, False)
    return out


def _pairs_by_kind(
    n: int, near_every: int, exact_every: int
) -> tuple[set, set]:
    streams = _display_streams(n, near_every, exact_every)
    by_base: dict[int, list[tuple[int, bool]]] = {}
    for i, (base, mut) in streams.items():
        by_base.setdefault(base, []).append((i, mut))
    near, exact = set(), set()
    for group in by_base.values():
        if len(group) < 2:
            continue
        for ai in range(len(group)):
            for bi in range(ai + 1, len(group)):
                (a, am), (b, bm) = group[ai], group[bi]
                pair = (min(a, b), max(a, b))
                if am == bm:
                    exact.add(pair)
                else:
                    near.add(pair)
    return near, exact


def planted_near_pairs(
    n: int, near_every: int = 100, exact_every: int = 251
) -> set[tuple]:
    """All pairs whose displayed texts differ ONLY by the near plant's
    mutations (includes transitive plants: a near copy and an exact
    copy of the same source are near duplicates of each other)."""
    return _pairs_by_kind(n, near_every, exact_every)[0]


def planted_exact_pairs(
    n: int, exact_every: int = 251, near_every: int = 100
) -> set[tuple]:
    """All pairs whose displayed texts are identical."""
    return _pairs_by_kind(n, near_every, exact_every)[1]
