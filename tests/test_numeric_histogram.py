"""Exact equi-width histograms (checks.numeric_histogram): bin
assignment and edge arithmetic, NULL/NaN/inf routing, fixed-domain
clamping, the degenerate single-value domain, and plan shape (two
O(1)/O(bins) aggregates, broadcast bounds)."""

from __future__ import annotations

import pytest

from cerberus_cpp_spark.operators.checks import numeric_histogram


def test_exact_bins_and_edges(spark) -> None:
    rows = [(float(i),) for i in range(100)] + [
        (None,), (float("nan",),), (float("inf"),),
        (float("-inf"),)]
    df = spark.createDataFrame(rows, "x double")
    out = sorted(map(tuple, numeric_histogram(df, "x", bins=4)
                     .collect()))
    # bounds 0..99, width 24.75; non-finite rows excluded
    assert out == [
        (0, 0.0, 24.75, 25), (1, 24.75, 49.5, 25),
        (2, 49.5, 74.25, 25), (3, 74.25, 99.0, 25)]
    # x == hi clamps into the last bin (the least() rule)
    assert sum(r[3] for r in out) == 100


def test_fixed_domain_clamps(spark) -> None:
    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (1.5,), (99.0,)], "x double")
    out = {r["bin"]: r["cnt"]
           for r in numeric_histogram(
               df, "x", bins=2, lo=0.0, hi=2.0).collect()}
    # -5 clamps to bin 0; 99 clamps to bin 1
    assert out == {0: 2, 1: 2}


def test_degenerate_domain_and_guard(spark) -> None:
    df = spark.createDataFrame([(7.0,), (7.0,)], "x double")
    out = numeric_histogram(df, "x", bins=8).collect()
    assert len(out) == 1 and out[0]["bin"] == 0 \
        and out[0]["cnt"] == 2
    with pytest.raises(ValueError, match="bins"):
        numeric_histogram(df, "x", bins=0)


def test_plan_shape(spark) -> None:
    df = spark.range(0, 1000).selectExpr("CAST(id AS DOUBLE) x")
    h = numeric_histogram(df, "x", bins=16)
    plan = h._jdf.queryExecution().executedPlan().toString()
    # bounds are broadcast, the bin aggregate partially aggregates
    assert "BroadcastExchange" in plan
    assert "partial_count" in plan


def test_bound_guards(spark) -> None:
    """A single bound is an error (it would silently be ignored),
    and inverted bounds are rejected instead of producing a garbage
    histogram."""
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="BOTH lo and hi"):
        numeric_histogram(df, "x", lo=0.0)
    with pytest.raises(ValueError, match="BOTH lo and hi"):
        numeric_histogram(df, "x", hi=9.0)
    with pytest.raises(ValueError, match="lo must be <= hi"):
        numeric_histogram(df, "x", lo=9.0, hi=0.0)
    # equal bounds are the legal degenerate fixed domain
    out = numeric_histogram(df, "x", bins=4, lo=1.0, hi=1.0).collect()
    assert len(out) == 1 and out[0]["bin"] == 0
