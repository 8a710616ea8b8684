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


def test_cross_modal_conflicts(spark) -> None:
    """One melted scan finds both conflict families; thresholds and
    NULL exclusion pinned; single-aggregation plan (≤2 Exchanges:
    partial-distinct + final)."""
    import pytest

    from cerberus_cpp_spark.operators.checks import cross_modal_conflicts

    df = spark.createDataFrame(
        [
            # phash 1 carries two captions; caption "c" sits on 3 ids
            ("i1", 1, "a"), ("i2", 1, "b"),
            ("i3", 2, "c"), ("i4", 2, "c"),   # same caption = no conflict
            ("i5", 3, "c"), ("i6", 4, "c"),
            ("i7", None, "d"), ("i8", 5, None),   # NULLs excluded
        ],
        "image_id string, phash int, caption string",
    )
    rows = {(r["kind"], r["key"]): (r["n_rows"], r["n_distinct_other"])
            for r in cross_modal_conflicts(df).collect()}
    assert rows == {
        ("phash~caption", "1"): (2, 2),
        ("caption~image_id", "c"): (4, 4),
    }
    # min_distinct raises the bar
    rows3 = {r["key"]
             for r in cross_modal_conflicts(df, min_distinct=3).collect()}
    assert rows3 == {"c"}
    with pytest.raises(ValueError):
        cross_modal_conflicts(df, pairs=[])
    with pytest.raises(ValueError):
        cross_modal_conflicts(df, min_distinct=1)
    plan = (cross_modal_conflicts(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 2, plan
