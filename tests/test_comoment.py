"""checks.comoment_stats: exact scaled-integer co-moment sums,
pairwise NULL/NaN deletion, the inexact-value counters, guards, and
the single-Exchange plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from cerberus_cpp_spark.operators.checks import comoment_stats


def _df(spark, rows, schema="a double, b double, c double"):
    return spark.createDataFrame(rows, schema)


def _got(df, cols, **kw):
    return {(r["col_x"], r["col_y"]): r
            for r in comoment_stats(df, cols, **kw).collect()}


def _brute(rows, ix, iy, scale=1):
    vals = [(r[ix], r[iy]) for r in rows
            if r[ix] is not None and r[iy] is not None
            and not math.isnan(r[ix]) and not math.isnan(r[iy])]
    sx = [round(x * scale) for x, _ in vals]
    sy = [round(y * scale) for _, y in vals]
    return (len(vals), sum(sx), sum(sy),
            sum(x * y for x, y in zip(sx, sy)),
            sum(x * x for x in sx), sum(y * y for y in sy))


def test_exact_sums_and_pairwise_deletion(spark):
    rows = [Row(a=1.0, b=2.0, c=3.0),
            Row(a=4.0, b=None, c=5.0),
            Row(a=float("nan"), b=6.0, c=7.0),
            Row(a=8.0, b=9.0, c=None)]
    got = _got(_df(spark, rows), ["a", "b", "c"])
    assert len(got) == 6
    for (cx, cy) in [("a", "a"), ("a", "b"), ("a", "c"),
                     ("b", "b"), ("b", "c"), ("c", "c")]:
        n, sx, sy, sxy, sxx, syy = _brute(rows, cx, cy)
        r = got[(cx, cy)]
        assert r["n"] == n, (cx, cy)
        assert int(r["sum_x"]) == sx and int(r["sum_y"]) == sy
        assert int(r["sum_xy"]) == sxy
        assert int(r["sum_x2"]) == sxx and int(r["sum_y2"]) == syy
        assert r["inexact_x"] == 0 and r["inexact_y"] == 0
    # pairwise deletion really differs per pair
    assert got[("a", "b")]["n"] == 2     # rows 0 and 3
    assert got[("a", "c")]["n"] == 2     # rows 0 and 1
    assert got[("a", "a")]["n"] == 3


def test_cents_scaling_exact(spark):
    rows = [Row(a=1.25, b=10.03, c=0.0),
            Row(a=2.50, b=0.07, c=0.0)]
    got = _got(_df(spark, rows), ["a", "b"], decimals=2)
    r = got[("a", "b")]
    assert (int(r["sum_x"]), int(r["sum_y"])) == (375, 1010)
    assert int(r["sum_xy"]) == 125 * 1003 + 250 * 7
    assert int(r["sum_x2"]) == 125 ** 2 + 250 ** 2
    assert r["inexact_x"] == 0 and r["inexact_y"] == 0


def test_inexact_counter_fires(spark):
    # pi is nobody's fixed-point value at decimals=2
    rows = [Row(a=3.14159, b=1.0, c=0.0), Row(a=2.0, b=2.0, c=0.0)]
    got = _got(_df(spark, rows), ["a", "b"], decimals=2)
    assert got[("a", "b")]["inexact_x"] == 1
    assert got[("a", "b")]["inexact_y"] == 0
    # the sums still report (rounded) — visible, not silent
    assert int(got[("a", "b")]["sum_x"]) == 314 + 200


def test_empty_and_all_null(spark):
    rows = [Row(a=None, b=None, c=None)]
    got = _got(_df(spark, rows), ["a", "b"])
    r = got[("a", "b")]
    assert r["n"] == 0 and r["sum_x"] is None and r["sum_xy"] is None


def test_guards(spark):
    df = _df(spark, [Row(a=1.0, b=1.0, c=1.0)])
    with pytest.raises(ValueError):
        comoment_stats(df, [])
    with pytest.raises(ValueError):
        comoment_stats(df, ["a", "a"])
    with pytest.raises(ValueError):
        comoment_stats(df, ["a"], decimals=9)


def test_two_level_plan(spark):
    # two-level long-limb shape (r6 optimization): bounded-chunk
    # long aggregation + tiny decimal final — exactly TWO Exchanges
    # (chunk partials, then the global fold), no more
    df = _df(spark, [Row(a=1.0, b=2.0, c=3.0)])
    plan = comoment_stats(df, ["a", "b", "c"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "partial" in plan.lower()


def test_negative_values_exact(spark):
    # limb split must reconstruct exactly for negatives too
    # (Spark div truncates toward zero; % follows the dividend sign)
    rows = [Row(a=-12345678.91, b=3.25, c=0.0),
            Row(a=2.5, b=-999999.99, c=0.0),
            Row(a=-0.01, b=-0.02, c=0.0)]
    got = _got(_df(spark, rows), ["a", "b"], decimals=2)
    n, sx, sy, sxy, sxx, syy = _brute(rows, "a", "b", scale=100)
    r = got[("a", "b")]
    assert r["n"] == n
    assert int(r["sum_x"]) == sx and int(r["sum_y"]) == sy
    assert int(r["sum_xy"]) == sxy
    assert int(r["sum_x2"]) == sxx and int(r["sum_y2"]) == syy
