"""Streaming sessionization — the streaming face of
``operators/temporal.sessionize``/``session_stats``, built on
Spark's NATIVE session windows (``F.session_window``): gap-merged
event-time windows are exactly the built-in operator for this
semantics, so no custom state machine is needed — the engine
maintains, merges, and evicts session state under the watermark
(bounded state at 10^12 scale; reference analogue: the windowed
rollup family, SURVEY §2.3 time axis).

Boundary-semantics pin (the reason for the ``+ 1 microsecond``):
the batch operator breaks a session when the gap STRICTLY exceeds
``gap_seconds`` — an event landing exactly at the threshold
continues the session. Native session windows merge an event only
when it lands strictly BEFORE ``prev + gap``, i.e. they split at
exact equality. With microsecond-resolution event time,
``gap + 1us`` makes the native merge condition
``next < prev + gap + 1us`` ⟺ ``next <= prev + gap`` — bit-for-bit
the batch rule. Pinned stream==batch and batch-native==batch in
``tests/test_streaming_sessions.py``.

``session_index`` (the batch operator's per-key ordinal) is NOT
reproducible in append-mode streaming — it is a global per-key
rank over all sessions ever seen; the twin therefore identifies
sessions by their content columns (start/end/counts), and the pin
compares exactly those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.temporal import _us


def session_stats_stream(
    stream_df: DataFrame,
    *,
    key: str,
    ts: str,
    gap_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """One row per closed (key, session): ``(key, n_events,
    session_start, session_end, duration_us)`` — the streaming twin
    of ``temporal.session_stats`` minus the per-key ordinal (see
    module docstring). Append mode: a session emits once the
    watermark passes its end + gap; rows with NULL key/ts are
    dropped (same contract as the batch operator). Works unchanged
    on a BATCH frame (session windows are supported in batch
    aggregation — the watermark call is a no-op there), which is how
    the equality pin runs both engines on one code path."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    gap = f"{int(gap_seconds) * 1_000_000 + 1} microseconds"
    base = (
        stream_df
        .where(F.col(key).isNotNull() & F.col(ts).isNotNull())
        .withWatermark(ts, watermark)
    )
    return (
        base.groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            (F.max(_us(ts)) - F.min(_us(ts))).alias("duration_us"),
        )
        .drop("session_window")
    )
