"""Tracked localCheckpoint with explicit block release.

``DataFrame.localCheckpoint`` persists the underlying RDD's blocks in
executor block storage, but ``DataFrame.unpersist()`` does NOT free
them: checkpoint persistence is RDD-level, not a CacheManager entry
(verified empirically on Spark 4 — the persistent-RDD map is unchanged
after ``df.unpersist(True)``). Iterative algorithms that checkpoint
every round (connected components in ``operators/dedup.py``) would
otherwise accumulate O(rounds) full |V|-sized materializations for the
life of the session.

These helpers snapshot the JVM persistent-RDD registry around the
checkpoint call and hand back the delta, so the caller can free
exactly the blocks a finished round owned. Freeing is IRREVERSIBLE:
a localCheckpointed frame's lineage is truncated to the checkpoint
RDD, so the frame must never be used after ``free_checkpoint`` — only
release round N's frame once round N+1 is eagerly materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _persistent_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(i) for i in m.keySet().toArray()}


def checkpoint_tracked(
    df: DataFrame, *, eager: bool = True
) -> tuple[DataFrame, frozenset[int]]:
    """``df.localCheckpoint(eager=eager)`` + the set of persistent-RDD
    ids the call registered (the handle for ``free_checkpoint``)."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint(eager=eager)
    new = frozenset(_persistent_ids(spark) - before)
    return out, new


def free_checkpoint(spark, ids: frozenset[int]) -> None:
    """Release the block-storage memory of a tracked checkpoint.

    The frame that owned these blocks is unusable afterward (its
    lineage is the checkpoint RDD itself — Spark raises
    CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on reuse)."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        j = m.get(int(i))
        if j is not None:
            j.unpersist(False)
