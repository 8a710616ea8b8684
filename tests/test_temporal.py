"""operators/temporal.py: as-of join, sessionization, funnel,
retention, and the bucketed interval-point join — each pinned
against a brute-force Python reference on deterministic synthetic
frames, plus guard/NULL-routing contracts and plan-shape pins."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cerberus_cpp_spark.operators import temporal

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def _left(spark, rows):
    return spark.createDataFrame(
        [Row(lid=i, k=k, lts=_ts(s)) for i, (k, s) in enumerate(rows)],
        schema=T.StructType([
            T.StructField("lid", T.LongType()),
            T.StructField("k", T.LongType()),
            T.StructField("lts", T.TimestampType()),
        ]),
    )


def _right(spark, rows):
    return spark.createDataFrame(
        [Row(rid=i, k=k, rts=_ts(s), v=float(i))
         for i, (k, s) in enumerate(rows)],
        schema=T.StructType([
            T.StructField("rid", T.LongType()),
            T.StructField("k", T.LongType()),
            T.StructField("rts", T.TimestampType()),
            T.StructField("v", T.DoubleType()),
        ]),
    )


def _brute_asof(lrows, rrows, strict=False):
    out = {}
    for i, (lk, ls) in enumerate(lrows):
        best = None
        for j, (rk, rs) in enumerate(rrows):
            if rk != lk:
                continue
            if (rs < ls) if strict else (rs <= ls):
                # latest ts wins; ties by greatest rid (=j)
                if best is None or (rs, j) > best[:2]:
                    best = (rs, j)
        out[i] = None if best is None else best[1]
    return out


@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_brute_force(spark, strict) -> None:
    rng = random.Random(7)
    lrows = [(rng.randrange(4), rng.randrange(40)) for _ in range(60)]
    rrows = [(rng.randrange(4), rng.randrange(40)) for _ in range(50)]
    got = temporal.asof_join(
        _left(spark, lrows), _right(spark, rrows),
        on="k", left_ts="lts", right_ts="rts",
        value_cols=("rid", "v"), right_tiebreak="rid", strict=strict,
    ).collect()
    want = _brute_asof(lrows, rrows, strict=strict)
    assert len(got) == len(lrows)
    for r in got:
        exp = want[r.lid]
        if exp is None:
            assert r.asof_rid is None and r.asof_ts is None
        else:
            assert r.asof_rid == exp, (r, exp)
            assert r.asof_ts == _ts(rrows[exp][1])
            assert r.asof_v == float(exp)


def test_asof_equal_ts_inclusive_vs_strict(spark) -> None:
    l = _left(spark, [(1, 10)])
    r = _right(spark, [(1, 10)])
    inc = temporal.asof_join(l, r, on="k", left_ts="lts",
                             right_ts="rts", value_cols=("rid",),
                             right_tiebreak="rid").collect()[0]
    assert inc.asof_rid == 0
    st = temporal.asof_join(l, r, on="k", left_ts="lts",
                            right_ts="rts", value_cols=("rid",),
                            right_tiebreak="rid",
                            strict=True).collect()[0]
    assert st.asof_rid is None


def test_asof_tiebreak_picks_greatest(spark) -> None:
    l = _left(spark, [(1, 20)])
    r = _right(spark, [(1, 5), (1, 5), (1, 5)])
    got = temporal.asof_join(l, r, on="k", left_ts="lts",
                             right_ts="rts", value_cols=("rid",),
                             right_tiebreak="rid").collect()[0]
    assert got.asof_rid == 2


def test_asof_null_routing(spark) -> None:
    l = spark.createDataFrame(
        [Row(lid=0, k=None, lts=_ts(1)),
         Row(lid=1, k=1, lts=None),
         Row(lid=2, k=1, lts=_ts(1))],
        schema="lid long, k long, lts timestamp")
    r = _right(spark, [(1, 0)])
    got = {x.lid: x for x in temporal.asof_join(
        l, r, on="k", left_ts="lts", right_ts="rts",
        value_cols=("v",), right_tiebreak="rid").collect()}
    assert len(got) == 3
    assert got[0].asof_v is None and got[1].asof_v is None
    assert got[2].asof_v == 0.0


def test_asof_rejects_colliding_output(spark) -> None:
    l = _left(spark, [(1, 1)]).withColumnRenamed("lid", "asof_v")
    r = _right(spark, [(1, 0)])
    with pytest.raises(ValueError, match="collide"):
        temporal.asof_join(l, r, on="k", left_ts="lts",
                           right_ts="rts", value_cols=("v",))


def test_asof_single_exchange(spark) -> None:
    """The union-tag-window construction shuffles ONCE (on the key);
    the NULL bypass union adds no Exchange."""
    l = _left(spark, [(1, 1), (2, 3)])
    r = _right(spark, [(1, 0), (2, 2)])
    df = temporal.asof_join(l, r, on="k", left_ts="lts",
                            right_ts="rts", value_cols=("v",),
                            right_tiebreak="rid")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------- sessions

def _ev(spark, rows):
    """rows: (eid, key, seconds)"""
    return spark.createDataFrame(
        [Row(eid=e, k=k, ts=_ts(s)) for e, k, s in rows],
        schema="eid long, k long, ts timestamp")


def test_sessionize_gap_strictly_greater(spark) -> None:
    df = _ev(spark, [(0, 1, 0), (1, 1, 30), (2, 1, 60.000001),
                     (3, 1, 100)])
    got = {r.eid: r.session_index
           for r in temporal.sessionize(
               df, key="k", ts="ts", gap_seconds=30,
               tiebreak="eid").collect()}
    # 0→30 exactly the gap: same session; 30→60.000001 exceeds: new
    assert got == {0: 1, 1: 1, 2: 2, 3: 3}


def test_sessionize_per_key_and_null_drop(spark) -> None:
    rows = [(0, 1, 0), (1, 2, 0), (2, 1, 1000), (3, 2, 5)]
    df = _ev(spark, rows).unionByName(_ev(spark, []).sparkSession
        .createDataFrame([Row(eid=9, k=None, ts=_ts(0))],
                         schema="eid long, k long, ts timestamp"))
    out = temporal.sessionize(df, key="k", ts="ts", gap_seconds=60,
                              tiebreak="eid").collect()
    assert {r.eid for r in out} == {0, 1, 2, 3}
    idx = {r.eid: r.session_index for r in out}
    assert idx == {0: 1, 2: 2, 1: 1, 3: 1}


def test_session_stats(spark) -> None:
    df = _ev(spark, [(0, 1, 0), (1, 1, 10), (2, 1, 1000),
                     (3, 2, 0)])
    got = {(r.k, r.session_index): r for r in temporal.session_stats(
        df, key="k", ts="ts", gap_seconds=60,
        tiebreak="eid").collect()}
    a = got[(1, 1)]
    assert a.n_events == 2 and a.duration_us == 10_000_000
    assert a.session_start == _ts(0) and a.session_end == _ts(10)
    assert got[(1, 2)].n_events == 1
    assert got[(2, 1)].duration_us == 0


def test_sessionize_single_exchange(spark) -> None:
    df = _ev(spark, [(0, 1, 0), (1, 1, 10)])
    out = temporal.sessionize(df, key="k", ts="ts", gap_seconds=60,
                              tiebreak="eid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_sessionize_rejects_bad_gap(spark) -> None:
    df = _ev(spark, [(0, 1, 0)])
    with pytest.raises(ValueError):
        temporal.sessionize(df, key="k", ts="ts", gap_seconds=0)


# ---------------------------------------------------------------- funnel

def _tev(spark, rows):
    """rows: (eid, key, seconds, type)"""
    return spark.createDataFrame(
        [Row(eid=e, k=k, ts=_ts(s), et=t) for e, k, s, t in rows],
        schema="eid long, k long, ts timestamp, et string")


def test_funnel_ordered_first_occurrence(spark) -> None:
    df = _tev(spark, [
        (0, 1, 0, "a"), (1, 1, 5, "b"), (2, 1, 9, "c"),   # full
        (3, 2, 0, "b"), (4, 2, 5, "a"),                   # b before a
        (5, 3, 0, "a"),                                   # depth 1
        (6, 4, 0, "b"),                                   # never entered
    ])
    got = {r.k: r for r in temporal.funnel(
        df, key="k", ts="ts", type_col="et",
        steps=("a", "b", "c")).collect()}
    assert set(got) == {1, 2, 3}  # key 4 never reached step 1
    assert got[1].depth == 3 and got[1].step3_ts == _ts(9)
    assert got[2].depth == 1 and got[2].step2_ts is None
    assert got[3].depth == 1


def test_funnel_equal_ts_counts_as_ordered(spark) -> None:
    df = _tev(spark, [(0, 1, 7, "a"), (1, 1, 7, "b")])
    got = temporal.funnel(df, key="k", ts="ts", type_col="et",
                          steps=("a", "b")).collect()[0]
    assert got.depth == 2 and got.step2_ts == _ts(7)


def test_funnel_later_step_before_entry_ignored(spark) -> None:
    # b happens, then a, then no further b: depth stops at 1
    df = _tev(spark, [(0, 1, 0, "b"), (1, 1, 10, "a")])
    got = temporal.funnel(df, key="k", ts="ts", type_col="et",
                          steps=("a", "b")).collect()[0]
    assert got.depth == 1 and got.step2_ts is None


def test_funnel_needs_two_steps(spark) -> None:
    df = _tev(spark, [(0, 1, 0, "a")])
    with pytest.raises(ValueError):
        temporal.funnel(df, key="k", ts="ts", type_col="et",
                        steps=("a",))


# ---------------------------------------------------------------- retention

def test_retention_hand_example(spark) -> None:
    day = 86_400
    rows = [
        (0, 1, 0 * day), (1, 1, 1 * day), (2, 1, 3 * day),
        (3, 2, 0 * day), (4, 2, 3 * day + 5),
        (5, 3, 1 * day),
    ]
    got = {(r.cohort_bucket - 19723, r.offset): r.n_active
           for r in temporal.retention(
               _ev(spark, rows), key="k", ts="ts").collect()}
    # bucket 19723 = 2024-01-01 (epoch day id); cohort day0 = {1,2}
    assert got[(0, 0)] == 2
    assert got[(0, 1)] == 1   # only key 1 active day 1
    assert got[(0, 3)] == 2   # both active day 3
    assert got[(1, 0)] == 1   # key 3's cohort
    assert set(got) == {(0, 0), (0, 1), (0, 3), (1, 0)}


def test_retention_offset_zero_is_cohort_size(spark) -> None:
    rng = random.Random(3)
    rows = [(i, rng.randrange(5), rng.randrange(10) * 86_400 + rng.randrange(100))
            for i in range(80)]
    ret = temporal.retention(_ev(spark, rows), key="k", ts="ts")
    zero = {r.cohort_bucket: r.n_active
            for r in ret.where("offset = 0").collect()}
    # every cohort's offset-0 count equals its member count
    cohorts = {}
    for _, k, s in rows:
        d = s // 86_400
        cohorts.setdefault(k, d)
        cohorts[k] = min(cohorts[k], d)
    from collections import Counter
    want = Counter(cohorts.values())
    assert zero == {19723 + d: n for d, n in want.items()}


# ------------------------------------------------------- interval joins

def _intervals(spark, rows):
    """rows: (iid, lo_seconds, hi_seconds)"""
    return spark.createDataFrame(
        [Row(iid=i, lo=_ts(a), hi=_ts(b)) for i, a, b in rows],
        schema="iid long, lo timestamp, hi timestamp")


def _points(spark, rows):
    return spark.createDataFrame(
        [Row(pid=i, pts=_ts(s)) for i, s in rows],
        schema="pid long, pts timestamp")


def test_interval_join_matches_brute_force(spark) -> None:
    rng = random.Random(11)
    ivs = []
    for i in range(25):
        a = rng.uniform(0, 500)
        ivs.append((i, a, a + rng.uniform(0, 90)))
    pts = [(i, rng.uniform(-20, 550)) for i in range(80)]
    got = sorted(
        (r.iid, r.pid)
        for r in temporal.interval_point_join(
            _points(spark, pts), _intervals(spark, ivs),
            point_ts="pts", lo_ts="lo", hi_ts="hi",
            bucket_seconds=30).collect())
    want = sorted(
        (i, p)
        for i, a, b in ivs for p, s in pts
        if _ts(a) <= _ts(s) <= _ts(b))
    assert got == want


def test_interval_join_inclusive_ends_exactly_once(spark) -> None:
    ivs = [(0, 10, 70)]  # spans multiple 30s buckets
    pts = [(0, 10), (1, 70), (2, 9.999999), (3, 70.000001), (4, 40)]
    got = sorted((r.iid, r.pid)
                 for r in temporal.interval_point_join(
                     _points(spark, pts), _intervals(spark, ivs),
                     point_ts="pts", lo_ts="lo", hi_ts="hi",
                     bucket_seconds=30).collect())
    assert got == [(0, 0), (0, 1), (0, 4)]


def test_interval_join_guards(spark) -> None:
    from py4j.protocol import Py4JJavaError

    pts = _points(spark, [(0, 5)])
    inverted = _intervals(spark, [(0, 10, 5)])
    with pytest.raises(Exception) as ei:
        temporal.interval_point_join(
            pts, inverted, point_ts="pts", lo_ts="lo", hi_ts="hi",
            bucket_seconds=30).collect()
    assert "interval exceeds" in str(ei.value)
    huge = _intervals(spark, [(0, 0, 10_000_000)])
    with pytest.raises(Exception) as ei:
        temporal.interval_point_join(
            pts, huge, point_ts="pts", lo_ts="lo", hi_ts="hi",
            bucket_seconds=1, max_buckets_per_interval=100).collect()
    assert "interval exceeds" in str(ei.value)


def test_interval_join_rejects_name_clash(spark) -> None:
    pts = _points(spark, [(0, 5)]).withColumnRenamed("pid", "iid")
    with pytest.raises(ValueError, match="collide"):
        temporal.interval_point_join(
            pts, _intervals(spark, [(0, 0, 1)]),
            point_ts="pts", lo_ts="lo", hi_ts="hi", bucket_seconds=30)


def test_interval_join_is_equi_join(spark) -> None:
    """The plan must contain NO cartesian/broadcast-nested-loop —
    the range predicate rides an equi-join on the bucket id."""
    ivs = _intervals(spark, [(0, 0, 50), (1, 100, 140)])
    pts = _points(spark, [(i, i * 3.0) for i in range(60)])
    df = temporal.interval_point_join(
        pts, ivs, point_ts="pts", lo_ts="lo", hi_ts="hi",
        bucket_seconds=30)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
