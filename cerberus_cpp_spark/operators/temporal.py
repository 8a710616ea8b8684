"""Temporal relational operators over event feeds: as-of join,
sessionization, ordered funnels, cohort retention, and a bucketed
interval-point join.

Why they live in the validation engine: the reference's dataset
checks stop at the time AXIS (gaps / staleness / volume anomalies —
SURVEY §2.3, ``checks.missing_time_buckets`` etc.); the monitoring
loop that CONSUMES those verdicts asks the next questions — "what
was the last good snapshot before this event", "did the user reach
the step", "how long do keys stay active" — which are exactly the
as-of / session / funnel / retention shapes. None of them exists as
a Spark built-in; each is composed here from windows and equi-joins
so Catalyst keeps every stage whole-stage-codegen and AQE-planned.

Scale shapes (the part that matters at 100 TB):

- ``asof_join`` is the union-tag-window construction — ONE shuffle
  on the key, never an inequality join: both inputs are unioned
  with a side tag, one window per key ordered by (ts, tag) carries
  the latest right payload forward, and the right side's rows are
  dropped after the fold. A naive ``l.ts >= r.ts`` join is a
  per-key cross product; this is linear in rows per key.
- ``sessionize`` is two windows over ONE sort (same partition +
  order spec, so Spark reuses the Exchange and the sort): lag →
  new-session flag → running sum.
- ``funnel`` filters the feed per step (filter pushdown does the
  work), aggregates each step to one row per key, and chains k-1
  per-key equi-joins — the joined frames are key-cardinality sized,
  so AQE broadcasts them when small.
- ``interval_point_join`` is the textbook distributed range join:
  intervals explode into the fixed-width time buckets they cover
  (guarded by an in-plan ``assert_true`` budget, same policy as
  ``checks.missing_time_buckets``), points map to their single
  bucket, and the match is ONE equi-join on the bucket id plus a
  residual filter — each qualifying pair appears exactly once
  because a point lives in exactly one bucket.

Portability contract (shared with every oracle in the repo): all
time arithmetic is integer microseconds via
``unix_micros(cast(ts as timestamp))`` which equals DuckDB's
``epoch_us(ts)`` byte-for-byte under the UTC session zone, and all
bucket/offset ids are integers so engine timezone RENDERING can
never skew a compare.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col: str | Column) -> Column:
    """Integer microseconds since epoch for TIMESTAMP or
    TIMESTAMP_NTZ columns (the testdata parquet is NTZ; the cast is
    a no-op under the pinned UTC session zone and keeps the
    expression portable to both)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    right_tiebreak: str | None = None,
    strict: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gains the payload of the
    LATEST right row with the same key and ``right_ts <= left_ts``
    (``<`` when ``strict``), or NULLs when no such row exists.

    Construction (one shuffle, no inequality join): tag right rows
    0 and left rows 1, union, and run a single window per key
    ordered by ``(ts, tag, tiebreak)`` with
    ``last(payload, ignorenulls=True)`` over
    ``rowsBetween(unboundedPreceding, currentRow)`` — at equal
    timestamps the right row sorts BEFORE the left row (tags 0 < 1)
    so inclusive semantics fall out of the order; ``strict`` swaps
    the tags so the equal-ts right row sorts after and is excluded.

    Determinism: when several right rows share (key, ts) the one
    with the greatest ``right_tiebreak`` wins (it sorts last in the
    window). Pass a unique column (an id) whenever the right side
    can collide on ts; with no tiebreak the winner is
    partition-order dependent, same caveat as SQL ASOF engines.

    NULL routing: left rows with a NULL key or NULL ts are returned
    unchanged with NULL as-of columns (they have no as-of
    semantics); right rows with NULL key/ts are dropped.

    Output: every left column, ``{prefix}ts`` (the matched right
    timestamp) and ``{prefix}{col}`` for each of ``value_cols``.
    """
    if not value_cols:
        raise ValueError("value_cols must name at least one right column")
    out_names = (prefix + "ts",) + tuple(prefix + c for c in value_cols)
    if len(set(out_names)) != len(out_names):
        # e.g. value_cols containing "ts", or a repeated column —
        # the payload struct would carry duplicate field names and
        # the output two identically-named columns.
        raise ValueError(
            f"asof output column names are not unique: {sorted(out_names)}")
    bad = [c for c in out_names if c in left.columns]
    if bad:
        raise ValueError(f"asof output columns collide with left: {bad}")
    internal = {"__key", "__ts", "__tag", "__tie", "__pay", "__m"}
    dunder = [c for c in left.columns if c in internal]
    if dunder:
        raise ValueError(
            f"left columns collide with asof_join internals: {dunder}; "
            f"rename them first")

    right_tag, left_tag = (1, 0) if strict else (0, 1)
    payload = F.struct(
        F.col(right_ts).alias("ts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    tie = (F.col(right_tiebreak).cast("long")
           if right_tiebreak is not None else F.lit(0).cast("long"))

    lcols = list(left.columns)
    l_ok = left.where(F.col(on).isNotNull() & F.col(left_ts).isNotNull())
    l_null = left.where(F.col(on).isNull() | F.col(left_ts).isNull())

    u = (
        right.where(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
        .select(
            F.col(on).alias("__key"),
            F.col(right_ts).alias("__ts"),
            F.lit(right_tag).alias("__tag"),
            tie.alias("__tie"),
            payload.alias("__pay"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c)
              for c in lcols],
        )
        .unionByName(
            l_ok.select(
                F.col(on).alias("__key"),
                F.col(left_ts).alias("__ts"),
                F.lit(left_tag).alias("__tag"),
                F.lit(None).cast("long").alias("__tie"),
                F.lit(None).cast(
                    "struct<ts:" + right.schema[right_ts].dataType.simpleString()
                    + "," + ",".join(
                        f"{c}:{right.schema[c].dataType.simpleString()}"
                        for c in value_cols) + ">"
                ).alias("__pay"),
                *lcols,
            )
        )
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(),
                 F.col("__tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    folded = (
        u.withColumn("__m", F.last("__pay", ignorenulls=True).over(w))
        .where(F.col("__tag") == left_tag)
    )
    matched = folded.select(
        *lcols,
        F.col("__m.ts").alias(prefix + "ts"),
        *[F.col(f"__m.{c}").alias(prefix + c) for c in value_cols],
    )
    bypass = l_null.select(
        *lcols,
        F.lit(None).cast(right.schema[right_ts].dataType)
        .alias(prefix + "ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(prefix + c)
          for c in value_cols],
    )
    return matched.unionByName(bypass)


def sessionize(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based sessions per key: a new session starts at a
    key's first event and whenever the microsecond gap to the
    previous event EXCEEDS ``gap_seconds`` (strictly greater — an
    event landing exactly at the threshold continues the session).

    Adds ``session_index`` (1-based per key, in time order) and
    ``is_session_start``. Rows with NULL key or ts are dropped (a
    session needs both); keep them upstream if they matter.

    Two window functions over the SAME partition+order spec, so the
    plan carries ONE Exchange and ONE sort — the minimum any
    per-key ordered rule costs. ``tiebreak`` totalizes the order
    when timestamps can collide (pass the event id)."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak is not None else [])
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = int(gap_seconds) * 1_000_000
    prev = F.lag(_us(ts)).over(w)
    start = F.when(
        prev.isNull() | ((_us(ts) - prev) > F.lit(gap_us)), 1
    ).otherwise(0)
    return (
        df.where(F.col(key).isNotNull() & F.col(ts).isNotNull())
        .withColumn("is_session_start", start.cast("boolean"))
        .withColumn(
            "session_index",
            F.sum(start.cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)),
        )
    )


def session_stats(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per (key, session): event count, start/end
    timestamps, and integer-microsecond duration. Composes
    :func:`sessionize` with one partially-aggregated groupBy —
    the aggregate reuses the session shuffle's key so AQE plans a
    cheap follow-on exchange."""
    s = sessionize(df, key=key, ts=ts, gap_seconds=gap_seconds,
                   tiebreak=tiebreak)
    return (
        s.groupBy(F.col(key), F.col("session_index"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            (F.max(_us(ts)) - F.min(_us(ts))).alias("duration_us"),
        )
    )


def funnel(
    events: DataFrame,
    *,
    key: str,
    ts: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered funnel: per key, the FIRST time each step was
    reached, where step i+1 must occur at or after step i's first
    occurrence (non-strict ``>=`` — distinct events sharing a
    microsecond count as ordered; documented, matches the common
    product-analytics contract). Output: one row per key that
    reached step 1, columns ``step{i}_ts`` (NULL once the funnel
    breaks) and ``depth`` (number of steps reached, >= 1).

    Shape: each step is a pushed-down filter + per-key min
    aggregate; steps chain through per-key equi-joins on frames of
    at most key-cardinality rows, which AQE broadcasts when small.
    No windows, no per-key sort."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    base = events.where(
        F.col(key).isNotNull() & F.col(ts).isNotNull())
    cur = (
        base.where(F.col(type_col) == steps[0])
        .groupBy(key)
        .agg(F.min(ts).alias("step1_ts"))
    )
    for i, st in enumerate(steps[1:], start=2):
        prev = f"step{i - 1}_ts"
        nxt = (
            base.where(F.col(type_col) == st)
            .join(cur.select(key, prev), key)
            .where(F.col(ts) >= F.col(prev))
            .groupBy(key)
            .agg(F.min(ts).alias(f"step{i}_ts"))
        )
        cur = cur.join(nxt, key, "left")
    depth = sum(
        (F.col(f"step{i}_ts").isNotNull()).cast("int")
        for i in range(1, len(steps) + 1)
    )
    return cur.withColumn("depth", depth)


def retention(
    events: DataFrame,
    *,
    key: str,
    ts: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Cohort retention: cohort = a key's first activity bucket
    (integer ``floor(epoch_us / bucket_us)`` id — timezone-proof),
    and for every (cohort_bucket, offset) the number of distinct
    keys from that cohort active ``offset`` buckets later.
    ``offset = 0`` rows carry each cohort's size.

    Shape: one distinct (key, bucket) aggregate (map-side partials
    collapse repeat activity), one per-key min for the cohort, an
    equi-join on the key, and the final count aggregate — every
    Exchange ships key- or cohort-cardinality rows, never raw
    events."""
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    bus = int(bucket_seconds) * 1_000_000
    act = (
        events.where(F.col(key).isNotNull() & F.col(ts).isNotNull())
        .select(F.col(key),
                F.floor(_us(ts) / F.lit(bus)).alias("bucket"))
        .distinct()
    )
    cohort = act.groupBy(key).agg(F.min("bucket").alias("cohort_bucket"))
    return (
        act.join(cohort, key)
        .groupBy(
            "cohort_bucket",
            (F.col("bucket") - F.col("cohort_bucket")).alias("offset"),
        )
        .agg(F.count_distinct(F.col(key)).alias("n_active"))
    )


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    lo_ts: str,
    hi_ts: str,
    bucket_seconds: int,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """All (interval, point) pairs with
    ``lo_ts <= point_ts <= hi_ts`` (inclusive ends), computed as ONE
    equi-join: intervals explode into the fixed-width buckets they
    cover, points map to their single bucket, the join runs on the
    bucket id and a residual microsecond filter removes same-bucket
    near-misses. Each qualifying pair appears exactly once (a point
    has exactly one bucket).

    Guards, in-plan (``assert_true`` — same policy as
    ``checks.missing_time_buckets``): ``hi >= lo`` and interval span
    ``<= max_buckets_per_interval`` buckets, so one corrupt row
    cannot explode a 10^12-row job. NULL-bounded intervals and
    NULL-ts points are dropped. Output: every interval column, then
    every point column (names must not collide — checked)."""
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(
            f"point/interval column names collide: {sorted(clash)}")
    bus = int(bucket_seconds) * 1_000_000
    lo_us, hi_us = _us(lo_ts), _us(hi_ts)
    lo_b = F.floor(lo_us / F.lit(bus))
    hi_b = F.floor(hi_us / F.lit(bus))
    span_ok = F.assert_true(
        (hi_us >= lo_us)
        & ((hi_b - lo_b) < F.lit(int(max_buckets_per_interval))),
        F.concat(F.lit("interval exceeds bounds/budget: lo="),
                 F.col(lo_ts).cast("string"),
                 F.lit(" hi="), F.col(hi_ts).cast("string")),
    )
    # the guard is woven INTO the exploded expression (assert_true
    # yields NULL on pass) so column pruning cannot optimize it away
    # — same pattern as checks.missing_time_buckets
    iv = (
        intervals.where(F.col(lo_ts).isNotNull()
                        & F.col(hi_ts).isNotNull())
        .withColumn(
            "__bucket",
            F.explode(F.when(span_ok.isNull(),
                             F.sequence(lo_b, hi_b))),
        )
    )
    pt = points.where(F.col(point_ts).isNotNull()).withColumn(
        "__bucket", F.floor(_us(point_ts) / F.lit(bus)))
    out = (
        iv.join(pt, "__bucket")
        .where((_us(point_ts) >= lo_us) & (_us(point_ts) <= hi_us))
        .drop("__bucket")
    )
    return out.select(*intervals.columns, *points.columns)


def scd2_intervals(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) intervals from a change
    log: per key ordered by ``ts``, each row becomes a version valid
    from its own timestamp until the NEXT change (``valid_to`` NULL
    for the current version), with a 1-based ``version_index`` and
    ``is_current``. The half-open convention ``[valid_from,
    valid_to)`` means intervals tile time exactly per key.

    One window over one key shuffle (lead + row_number share the
    sort). Rows with NULL key or ts are dropped — a change without
    a time has no version semantics. ``tiebreak`` totalizes the
    order for same-microsecond changes (later tiebreak = later
    version)."""
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak is not None else [])
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.where(F.col(key).isNotNull() & F.col(ts).isNotNull())
        .withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w))
        .withColumn("version_index", F.row_number().over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
