"""Streaming distribution sketches: event-time windowed t-digest.

Structured Streaming has no native custom aggregate, so the windowed
digest is a custom stateful operator (``applyInPandasWithState``,
same pattern as ``streaming/dedup.flag_duplicates_stateful``): state
= one t-digest (centroid arrays) per event-time window, merged
per micro-batch; the finished digest row is emitted exactly once,
when the watermark passes the window end (EventTimeTimeout). State
is bounded: O(compression) doubles per open window, and closed
windows are removed on emit.

Downstream, the emitted digest rows (one tiny row per window) feed
``digest_quantiles`` — a batch helper for the sink side — so drift
across adjacent windows is a comparison of O(probs) numbers, the
streaming analogue of ``checks.tdigest_drift``'s cross-snapshot
comparison.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.shipping import PKG_PARENT

DIGEST_SCHEMA = (
    "window_start timestamp, rows long, means array<double>, "
    "weights array<double>, vmin double, vmax double"
)
STATE_SCHEMA = (
    "rows long, means array<double>, weights array<double>, "
    "vmin double, vmax double, wend_ms long"
)

_DUR_RE = re.compile(
    r"^\s*(\d+)\s*(second|minute|hour|day)s?\s*$", re.IGNORECASE)


def duration_ms(text: str) -> int:
    m = _DUR_RE.match(text)
    if not m:
        raise ValueError(f"unsupported duration {text!r}")
    n = int(m.group(1))
    unit = m.group(2).lower()
    return n * {"second": 1_000, "minute": 60_000,
                "hour": 3_600_000, "day": 86_400_000}[unit]


def windowed_tdigest_stream(
    stream_df: DataFrame,
    col: str,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    compression: int = 100,
) -> DataFrame:
    """One t-digest per tumbling event-time window, emitted when the
    watermark closes the window. Output rows: ``DIGEST_SCHEMA``."""
    duration_ms(window)  # validate the window spec up front
    comp = int(compression)
    pkg_parent = PKG_PARENT

    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window).start.alias("wstart"),
            F.col(col).cast("double").alias("v"),
            # true-epoch window end computed JVM-side: a Python
            # datetime.timestamp() on the naive key would apply the
            # OS-local timezone and shift the timeout whenever the
            # session timezone differs from the OS default
            F.unix_millis(F.window(F.col(ts_col), window).end)
            .alias("wend_ms"),
            # the watermarked event-time column must survive the
            # projection or EventTimeTimeout refuses the query
            F.col(ts_col).alias("__ts"),
        )
        .where(F.col("v").isNotNull())
    )

    def update(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        from cerberus_cpp_spark.functions.tdigest import TDigest as TD

        (wstart,) = key  # datetime (window start)
        if state.hasTimedOut:
            rows, means, weights, vmin, vmax, _ = state.get
            state.remove()
            yield pd.DataFrame({
                "window_start": [wstart], "rows": [rows],
                "means": [means], "weights": [weights],
                "vmin": [vmin], "vmax": [vmax],
            })
            return
        if state.exists:
            rows, means, weights, vmin, vmax, end_ms = state.get
            acc = TD.from_row(
                {"means": means, "weights": weights,
                 "vmin": vmin, "vmax": vmax}, comp)
        else:
            rows, acc, end_ms = 0, TD(comp), 0
        for pdf in pdfs:
            vals = pdf["v"].to_numpy()
            rows += len(vals)
            acc = acc.merge(TD.from_values(vals, comp))
            if len(pdf):
                end_ms = int(pdf["wend_ms"].iloc[0])
        r = acc.to_row()
        state.update((rows, r["means"], r["weights"],
                      r["vmin"], r["vmax"], end_ms))
        # fire once the watermark passes the window END (true epoch
        # ms from the JVM-computed column, timezone-safe)
        state.setTimeoutTimestamp(end_ms)
        yield pd.DataFrame({
            "window_start": pd.Series([], dtype="datetime64[ns]"),
            "rows": pd.Series([], dtype="int64"),
            "means": pd.Series([], dtype="object"),
            "weights": pd.Series([], dtype="object"),
            "vmin": pd.Series([], dtype="float64"),
            "vmax": pd.Series([], dtype="float64"),
        })

    return keyed.groupBy("wstart").applyInPandasWithState(
        update,
        outputStructType=DIGEST_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def digest_quantiles(
    digests: DataFrame,
    probs: Sequence[float] = (0.1, 0.5, 0.9),
    *,
    compression: int = 100,
    method: str = "interp",
) -> DataFrame:
    """Batch helper for the sink side: (window_start, prob, q) from
    emitted digest rows. The frame is tiny (one row per closed
    window), so this is a narrow mapInPandas over centroid arrays."""
    probs = [float(p) for p in probs]
    comp = int(compression)
    pkg_parent = PKG_PARENT
    mth = method

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        from cerberus_cpp_spark.functions.tdigest import TDigest as TD

        for pdf in batches:
            out = {"window_start": [], "prob": [], "q": []}
            for _, row in pdf.iterrows():
                d = TD.from_row(row, comp)
                for p in probs:
                    out["window_start"].append(row["window_start"])
                    out["prob"].append(p)
                    out["q"].append(d.quantile(p, mth))
            yield pd.DataFrame(out)

    return digests.mapInPandas(
        work, schema="window_start timestamp, prob double, q double")
