"""Shared partitioning helpers for fan-out-heavy operators.

One policy, used by every explode/HOF-heavy stage (``doc_shingles``,
``simhash``, ``text_profile``, the fingerprint queries): if the input
arrives with fewer splits than ``defaultParallelism`` — the classic
local-bench trap of a single small parquet file = ONE split — fan it
out so the expensive per-row fold runs on every core. At real scale
inputs already carry >= defaultParallelism splits, so the gate never
fires and adds no shuffle on the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout_gate(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism`` iff it is
    parallelism-starved; identity otherwise.

    CAVEAT (round-1 review finding, still binding): the ``.rdd``
    partition probe EAGERLY executes any shuffle/broadcast stage
    already in ``df``'s plan. Call this ONLY on raw scans or narrow
    projections of them; callers holding a derived frame with upstream
    joins must skip the gate (``near_duplicates`` does for its
    candidate side).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = (
            df.repartition(target, *key_cols)
            if key_cols
            else df.repartition(target)
        )
    return df
