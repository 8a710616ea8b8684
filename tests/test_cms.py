"""Count-min sketch (operators/sketch.py): never-underestimate
guarantee vs exact counts over hypothesis inputs, exact-recovery
when width beats cardinality, merge == whole-corpus sketch, NULL
routing, parameter guards, and the partial-aggregation plan pin
(the sketch Exchange ships cells, not rows)."""

from __future__ import annotations

import collections

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.sketch import (
    cms_estimate,
    cms_merge,
    cms_sketch,
)


def _est(spark, values, width, depth, seed=0):
    df = spark.createDataFrame(
        [(v,) for v in values], "k string")
    sk = cms_sketch(df, "k", width=width, depth=depth, seed=seed)
    keys = df.where(F.col("k").isNotNull()).distinct()
    out = cms_estimate(sk, keys, "k",
                       width=width, depth=depth, seed=seed)
    return {r["k"]: r["est"] for r in out.collect()}


def test_never_underestimates_and_cell_bound(spark) -> None:
    values = [f"k{i % 7}" for i in range(100)] + [None] * 5
    true = collections.Counter(v for v in values if v is not None)
    est = _est(spark, values, width=8, depth=3)
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t
    df = spark.createDataFrame([(v,) for v in values], "k string")
    sk = cms_sketch(df, "k", width=8, depth=3)
    rows = sk.collect()
    # bounded cell table; per-row totals conserve the NULL-free mass
    assert len(rows) <= 8 * 3
    per_d = collections.Counter()
    for r in rows:
        per_d[r["d"]] += r["cnt"]
    assert all(v == 100 for v in per_d.values())


def test_exact_when_width_dominates(spark) -> None:
    # 3 keys in width 1024: collision probability ~ 0 under the
    # fixed md5 recipe — estimates recover exact counts
    values = ["a"] * 5 + ["b"] * 2 + ["c"]
    est = _est(spark, values, width=1024, depth=4)
    assert est == {"a": 5, "b": 2, "c": 1}


def test_merge_equals_whole(spark) -> None:
    a = spark.createDataFrame(
        [(f"k{i % 5}",) for i in range(40)], "k string")
    b = spark.createDataFrame(
        [(f"k{i % 3}",) for i in range(25)], "k string")
    kw = dict(width=16, depth=3, seed=7)
    merged = cms_merge(cms_sketch(a, "k", **kw),
                       cms_sketch(b, "k", **kw))
    whole = cms_sketch(a.unionByName(b), "k", **kw)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_param_guards(spark) -> None:
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="width"):
        cms_sketch(df, "k", width=1)
    with pytest.raises(ValueError, match="depth"):
        cms_sketch(df, "k", depth=0)
    with pytest.raises(ValueError, match="depth"):
        cms_estimate(df, df, "k", depth=99)


@given(st.lists(st.sampled_from(["a", "b", "c", "d", "e"]),
                min_size=1, max_size=60),
       st.integers(min_value=2, max_value=8),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=12, deadline=None)
def test_overcount_property(spark, values, width, depth) -> None:
    true = collections.Counter(values)
    est = _est(spark, values, width=width, depth=depth, seed=3)
    total = len(values)
    for k, t in true.items():
        assert t <= est[k] <= total


def test_sketch_plan_partial_aggregates(spark) -> None:
    df = spark.createDataFrame(
        [(f"k{i}",) for i in range(50)], "k string")
    sk = cms_sketch(df, "k", width=32, depth=4)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    # map-side partials: the Exchange ships sketch cells, not rows
    assert "partial_count" in plan
    assert plan.count("Exchange") == 1
