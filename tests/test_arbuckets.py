"""Aspect-ratio bucketing: table enumeration + nearest assignment."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.arbuckets import (
    ar_bucket_list,
    assign_ar_buckets,
)


def test_default_table_is_the_sdxl_family():
    b = ar_bucket_list()
    assert len(b) == 25
    assert b[0] == (0, 512, 2048)
    assert b[-1] == (24, 2048, 512)
    assert (8, 1024, 1024) in b  # 1024 = 512 + 8*64
    for _, bw, bh in b:
        assert bw % 64 == 0 and bh % 64 == 0
        assert bw * bh <= 1024 * 1024
        assert bw <= 4 * bh and bh <= 4 * bw
        # bh is maximal: one more step would blow the budget
        assert bw * (bh + 64) > 1024 * 1024


def test_enumeration_guards():
    with pytest.raises(ValueError):
        ar_bucket_list(budget_px=100, step=64)
    with pytest.raises(ValueError):
        ar_bucket_list(step=0)


def test_assignment_exact_square_portrait_landscape(spark):
    df = spark.createDataFrame(
        [("sq", 512, 512), ("land", 4000, 1000), ("port", 300, 1200),
         ("nullw", None, 64), ("zero", 0, 64), ("wide", 9000, 16)],
        "image_id string, w int, h int")
    got = {r["image_id"]: r.asDict()
           for r in assign_ar_buckets(df).collect()}
    assert (got["sq"]["bucket_w"], got["sq"]["bucket_h"]) == (1024, 1024)
    # AR 4 exactly: bucket 2048x512 is distance 0
    assert (got["land"]["bucket_w"], got["land"]["bucket_h"]) == (2048, 512)
    # AR 1/4 exactly
    assert (got["port"]["bucket_w"], got["port"]["bucket_h"]) == (512, 2048)
    # AR beyond the window clamps to the widest bucket
    assert got["wide"]["bucket_id"] == 24
    assert got["nullw"]["bucket_id"] is None
    assert got["zero"]["bucket_id"] is None
    assert got["zero"]["bucket_w"] is None


def test_tie_breaks_to_lower_bucket_id(spark):
    # find two adjacent buckets and a rational AR exactly between
    # them: w/h = (a1/b1 + a2/b2)/2 = (a1*b2 + a2*b1) / (2*b1*b2)
    bl = ar_bucket_list()
    (_, a1, b1), (_, a2, b2) = bl[10], bl[11]
    w, h = a1 * b2 + a2 * b1, 2 * b1 * b2
    g = spark.createDataFrame([("t", w, h)],
                              "image_id string, w long, h long")
    got = assign_ar_buckets(g).collect()[0]
    assert got["bucket_id"] == 10  # lower id wins the exact tie


def test_assignment_matches_bruteforce(spark):
    from fractions import Fraction

    bl = ar_bucket_list()
    rows = [(f"i{k}", 16 + (k * 37) % 3000, 16 + (k * 53) % 2500)
            for k in range(200)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    got = {r["image_id"]: r["bucket_id"]
           for r in assign_ar_buckets(df).collect()}
    for rid, w, h in rows:
        best = min(bl, key=lambda t: (abs(Fraction(w, h)
                                          - Fraction(t[1], t[2])), t[0]))
        assert got[rid] == best[0], (rid, w, h)


def test_assignment_is_shuffle_free(spark):
    df = spark.range(0, 100).select(
        F.col("id").cast("string").alias("image_id"),
        (F.col("id") % 3000 + 16).cast("int").alias("w"),
        (F.col("id") % 2500 + 16).cast("int").alias("h"))
    plan = assign_ar_buckets(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
