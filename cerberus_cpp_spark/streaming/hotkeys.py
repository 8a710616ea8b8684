"""Streaming hot-key detection — the streaming twin of
``checks.heavy_hitters`` (north_rule: "skew from hot phash buckets
... handled with explicit salting" — on a stream the detector must
run continuously, since the hot bucket can appear mid-run).

Structured Streaming cannot run batch pass 2 (the exact verify scan:
the rows are gone), so the streaming operator reports the Misra-Gries
COUNT INTERVAL instead of an exact count: for every surviving
candidate, ``cnt_lo ≤ true window count ≤ cnt_hi`` where
``cnt_hi - cnt_lo`` is the MG deficit bound
``(shard_rows - Σcounters) / (capacity+1)``. With ``capacity`` at or
above the shard's per-window distinct-key count the summary never
prunes, the deficit is 0, and the emitted counts are EXACT — the
same exact-regime trick ``streaming/drift.py`` uses for t-digests
(pinned in tests).

State layout: one MG summary per (event-time window, key shard).
A shard is ``pmod(xxhash64(key), n_shards)``, so a key's FULL window
count lives in exactly one shard — completeness holds per shard
(any key with window count > shard_rows/(capacity+1) survives its
shard's summary, by the same pigeonhole as the batch operator) and
the bound TIGHTENS as shards are added, because shard_rows shrinks
~n_shards-fold while state stays bounded at
O(open_windows × n_shards × capacity) entries. Closed windows are
emitted exactly once when the watermark passes the window end
(EventTimeTimeout) and their state is removed.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.shipping import PKG_PARENT
from .drift import duration_ms

HOT_SCHEMA = (
    "window_start timestamp, shard long, key string, cnt_lo long, "
    "cnt_hi long, shard_rows long"
)
_STATE_SCHEMA = (
    "keys array<string>, cnts array<long>, total long, wend_ms long"
)


def hot_keys_stream(
    stream_df: DataFrame,
    key: str,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    capacity: int = 256,
    n_shards: int = 32,
) -> DataFrame:
    """Per-window hot-key candidates with MG count intervals, emitted
    when the watermark closes the window. Output: ``HOT_SCHEMA``
    (the key is emitted as a string — state arrays are typed, so the
    key column is canonicalized JVM-side with a ``cast(string)``;
    NULL keys are dropped, as in the batch operator)."""
    duration_ms(window)  # validate the window spec up front
    cap = int(capacity)
    if cap < 1:
        raise ValueError(f"capacity must be >= 1: {capacity}")
    pkg_parent = PKG_PARENT

    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .where(F.col(key).isNotNull())
        .select(
            F.window(F.col(ts_col), window).start.alias("wstart"),
            F.pmod(F.xxhash64(F.col(key)), F.lit(int(n_shards)))
            .alias("shard"),
            F.col(key).cast("string").alias("k"),
            # true-epoch window end computed JVM-side (timezone-safe;
            # same rationale as streaming/drift.py)
            F.unix_millis(F.window(F.col(ts_col), window).end)
            .alias("wend_ms"),
            # the watermarked event-time column must survive the
            # projection or EventTimeTimeout refuses the query
            F.col(ts_col).alias("__ts"),
        )
    )

    def update(
        key_tuple: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)

        wstart, shard = key_tuple  # (window start, shard)
        if state.hasTimedOut:
            keys, cnts, total, _ = state.get
            state.remove()
            remainder = total - sum(cnts)
            bound = remainder // (cap + 1)
            yield pd.DataFrame(
                {
                    "window_start": [wstart] * len(keys),
                    "shard": [int(shard)] * len(keys),
                    "key": list(keys),
                    "cnt_lo": [int(c) for c in cnts],
                    "cnt_hi": [int(c) + bound for c in cnts],
                    "shard_rows": [total] * len(keys),
                }
            )
            return

        if state.exists:
            keys, cnts, total, end_ms = state.get
            acc = pd.Series(list(cnts), index=list(keys), dtype="int64")
        else:
            acc, total, end_ms = None, 0, 0
        for pdf in pdfs:
            s = pdf["k"]
            total += len(s)
            vc = s.value_counts()
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > cap:
                kth = acc.nlargest(cap + 1).iloc[-1]
                acc = acc - kth
                acc = acc[acc > 0]
            if len(pdf):
                end_ms = int(pdf["wend_ms"].iloc[0])
        if acc is None:
            acc = pd.Series(dtype="int64")
        state.update(
            (
                [str(k) for k in acc.index],
                [int(c) for c in acc.to_numpy()],
                int(total),
                end_ms,
            )
        )
        state.setTimeoutTimestamp(end_ms)
        yield pd.DataFrame(
            {
                "window_start": pd.Series([], dtype="datetime64[ns]"),
                "shard": pd.Series([], dtype="int64"),
                "key": pd.Series([], dtype="object"),
                "cnt_lo": pd.Series([], dtype="int64"),
                "cnt_hi": pd.Series([], dtype="int64"),
                "shard_rows": pd.Series([], dtype="int64"),
            }
        )

    return keyed.groupBy("wstart", "shard").applyInPandasWithState(
        update,
        outputStructType=HOT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def hot_keys_verdicts(
    emitted: DataFrame, min_count: int
) -> DataFrame:
    """Sink-side fold of the emitted candidate rows: every key whose
    count interval reaches ``min_count``, with ``certain`` = the
    LOWER bound already proves it (cnt_lo ≥ min_count; a False row
    is a possible hitter the caller may re-check downstream). The
    emitted frame is tiny (≤ capacity rows per closed shard-window),
    so this is a narrow filter."""
    thr = int(min_count)
    return emitted.where(F.col("cnt_hi") >= thr).select(
        "window_start",
        "key",
        "cnt_lo",
        "cnt_hi",
        (F.col("cnt_lo") >= thr).alias("certain"),
    )
