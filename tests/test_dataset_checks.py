"""Dataset-level checks: single-pass stats (incl. HLL accuracy vs
exact), drift frames, duplicate/referential behavior on crafted
violations."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cerberus_cpp_spark.operators import checks


@pytest.fixture(scope="module")
def orders(spark):
    df = spark.read.parquet(
        "/root/testdata/sf0.01/orders.parquet"
    ).cache()
    yield df
    # unpersist: a lingering cache entry for this path replaces the
    # parquet scan in OTHER tests' plans (kills ReadSchema/
    # PushedFilters assertions in test_plan_quality)
    df.unpersist()


def test_column_stats_single_pass(spark, orders) -> None:
    df = checks.column_stats(
        orders, ["o_orderkey", "o_custkey", "o_orderstatus"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ONE aggregation pass for all columns: exactly one shuffle
    assert plan.count("Exchange") == 1
    rows = {r["col_name"]: r for r in df.collect()}
    assert rows["o_orderkey"]["null_count"] == 0
    assert rows["o_orderkey"]["n_rows"] == orders.count()


def test_hll_accuracy_within_rsd(spark, orders) -> None:
    got = {
        r["col_name"]: r["approx_distinct"]
        for r in checks.column_stats(
            orders, ["o_custkey"], rsd=0.05
        ).collect()
    }
    exact = orders.select("o_custkey").distinct().count()
    assert abs(got["o_custkey"] - exact) / exact < 0.15  # 3×rsd


def test_exact_quantile_drift_frame_self_is_zero(spark, orders) -> None:
    out = checks.exact_quantile_drift_frame(
        orders, orders, "o_totalprice"
    ).collect()
    assert len(out) == 7
    assert all(r["rel_gap"] == 0.0 and not r["drifted"] for r in out)


def test_quantile_drift_sketch_detects_shift(spark, orders) -> None:
    shifted = orders.withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    res = checks.quantile_drift(orders, shifted, "o_totalprice",
                                rel_tolerance=0.1)
    assert res["drifted"] and res["max_rel_gap"] > 0.4
