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


def test_resize_plan_hand_and_properties(spark):
    from fractions import Fraction

    from cerberus_cpp_spark.operators.arbuckets import ar_resize_plan

    rows = [("wide", 4000, 1000, 2048, 512),   # AR 4 exact: no crop
            ("sq", 500, 500, 1024, 1024),      # upscale, no crop
            ("wideish", 1100, 1000, 1024, 1024),
            ("tallish", 1000, 1100, 1024, 1024),
            ("nullb", 100, 100, None, None),
            ("zero", 0, 50, 1024, 1024)]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, bucket_w int, bucket_h int")
    got = {r["image_id"]: r.asDict()
           for r in ar_resize_plan(df).collect()}
    assert (got["wide"]["resize_w"], got["wide"]["resize_h"]) == (2048, 512)
    assert got["wide"]["crop_x"] == 0 and got["wide"]["crop_y"] == 0
    assert (got["sq"]["resize_w"], got["sq"]["resize_h"]) == (1024, 1024)
    # wider than square: match height, crop width overflow
    wr = got["wideish"]
    assert wr["resize_h"] == 1024
    assert wr["resize_w"] == round(Fraction(1100 * 1024, 1000))
    assert wr["crop_x"] == (wr["resize_w"] - 1024) // 2
    assert wr["crop_y"] == 0
    tr = got["tallish"]
    assert tr["resize_w"] == 1024 and tr["crop_x"] == 0
    assert tr["resize_h"] == round(Fraction(1100 * 1024, 1000))
    assert got["nullb"]["resize_w"] is None
    assert got["zero"]["crop_x"] is None

    # property sweep: cover + non-negative centred crops
    import random
    rnd = random.Random(7)
    sweep = [(f"p{k}", rnd.randint(16, 4096), rnd.randint(16, 4096),
              bw, bh)
             for k, (_, bw, bh) in zip(range(300), __import__(
                 'itertools').cycle(
                 [(0, 512, 2048), (0, 1024, 1024), (0, 2048, 512),
                  (0, 832, 1216)]))]
    sdf = spark.createDataFrame(
        sweep, "image_id string, w int, h int, bucket_w int, bucket_h int")
    for r in ar_resize_plan(sdf).collect():
        assert r["resize_w"] >= r["bucket_w"]
        assert r["resize_h"] >= r["bucket_h"]
        assert r["resize_w"] == r["bucket_w"] or r["resize_h"] == r["bucket_h"]
        assert 0 <= r["crop_x"] <= r["resize_w"] - r["bucket_w"]
        assert 0 <= r["crop_y"] <= r["resize_h"] - r["bucket_h"]
        # exact round-half-up of the scaled side
        if r["resize_h"] == r["bucket_h"] and r["resize_w"] != r["bucket_w"]:
            num, den = r["w"] * r["bucket_h"], r["h"]
            assert r["resize_w"] == (2 * num + den) // (2 * den)


def test_pack_batches_contract(spark):
    from cerberus_cpp_spark.operators.arbuckets import pack_batches

    rows = [(f"k{i:03d}", i % 3 if i % 11 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "image_id string, bucket_id int")
    out = pack_batches(df, batch_size=4, key="image_id",
                       n_shards=2).collect()
    got = {r["image_id"]: r for r in out}
    assert len(out) == 200
    # NULL bucket -> NULL everything
    for i in range(0, 200, 11):
        r = got[f"k{i:03d}"]
        assert r["shard"] is None and r["batch_id"] is None
    # every non-remainder batch has exactly batch_size members with
    # positions 0..3; remainder rows have NULL batch columns
    from collections import defaultdict
    batches = defaultdict(list)
    for r in out:
        if r["batch_id"] is not None:
            batches[r["batch_id"]].append(r["batch_pos"])
    assert batches, "no batches formed"
    for bid, poss in batches.items():
        assert sorted(poss) == [0, 1, 2, 3], (bid, poss)
    # batch members share the bucket encoded in the id
    for r in out:
        if r["batch_id"] is not None:
            assert r["batch_id"].startswith(f"{r['bucket_id']}:")
            assert r["batch_id"].split(":")[1] == str(r["shard"])


def test_pack_batches_stable_under_relayout_and_append(spark):
    from cerberus_cpp_spark.operators.arbuckets import pack_batches

    rows = [(f"k{i:03d}", i % 2) for i in range(64)]
    df = spark.createDataFrame(rows, "image_id string, bucket_id int")
    a = {r["image_id"]: (r["shard"], r["batch_id"], r["batch_pos"])
         for r in pack_batches(df, batch_size=4, key="image_id",
                               n_shards=4).collect()}
    b = {r["image_id"]: (r["shard"], r["batch_id"], r["batch_pos"])
         for r in pack_batches(df.repartition(13).sortWithinPartitions(
             F.desc("image_id")), batch_size=4, key="image_id",
             n_shards=4).collect()}
    assert a == b
    # appending rows never moves an EXISTING row to a different
    # (bucket, shard) — shard is a pure key function (positions
    # within a shard may shift; that is the documented contract)
    rows2 = rows + [(f"new{i}", i % 2) for i in range(10)]
    df2 = spark.createDataFrame(rows2, "image_id string, bucket_id int")
    c = {r["image_id"]: r["shard"]
         for r in pack_batches(df2, batch_size=4, key="image_id",
                               n_shards=4).collect()}
    for k, (sh, _, _) in a.items():
        assert c[k] == sh


def test_pack_batches_drop_last_false_and_guards(spark):
    from cerberus_cpp_spark.operators.arbuckets import pack_batches

    rows = [(f"k{i}", 0) for i in range(10)]
    df = spark.createDataFrame(rows, "image_id string, bucket_id int")
    out = pack_batches(df, batch_size=4, key="image_id", n_shards=1,
                       drop_last=False).collect()
    assert all(r["batch_id"] is not None for r in out)
    sizes = {}
    for r in out:
        sizes[r["batch_id"]] = sizes.get(r["batch_id"], 0) + 1
    assert sorted(sizes.values()) == [2, 4, 4]
    with pytest.raises(ValueError):
        pack_batches(df, batch_size=0, key="image_id")
    with pytest.raises(ValueError):
        pack_batches(df, batch_size=4, key="nope")


def test_pack_batches_null_key_routes_to_null(spark):
    from cerberus_cpp_spark.operators.arbuckets import pack_batches

    rows = [("a", 0), ("b", 0), (None, 0), (None, 0)]
    df = spark.createDataFrame(rows, "image_id string, bucket_id int")
    out = pack_batches(df, batch_size=2, key="image_id",
                       n_shards=1).collect()
    for r in out:
        if r["image_id"] is None:
            assert r["shard"] is None and r["batch_id"] is None
        else:
            assert r["shard"] == 0 and r["batch_id"] is not None


def test_output_column_collision_guards(spark):
    from cerberus_cpp_spark.operators.arbuckets import (
        ar_resize_plan,
        pack_batches,
    )

    df = spark.createDataFrame([("a", 100, 100)],
                               "image_id string, w int, h int")
    assigned = assign_ar_buckets(df)
    with pytest.raises(ValueError):
        assign_ar_buckets(assigned)            # bucket cols collide
    planned = ar_resize_plan(assigned)
    with pytest.raises(ValueError):
        ar_resize_plan(planned)                # plan cols collide
    packed = pack_batches(assigned, batch_size=1, key="image_id")
    with pytest.raises(ValueError):
        pack_batches(packed, batch_size=1, key="image_id")


def test_pack_batches_null_rows_bypass_the_window(spark):
    from cerberus_cpp_spark.operators.arbuckets import pack_batches

    rows = [(f"k{i}", 0) for i in range(8)] + [(None, 0), ("x", None)]
    df = spark.createDataFrame(rows, "image_id string, bucket_id int")
    out = pack_batches(df, batch_size=4, key="image_id", n_shards=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the invalid-row branch is a plain filter+project union leg —
    # exactly one Window in the plan, fed only by the valid branch
    assert plan.count("Window") >= 1
    got = {r["image_id"]: r for r in out.collect()}
    assert got[None]["batch_id"] is None and got[None]["shard"] is None
    assert got["x"]["batch_id"] is None
    assert sum(1 for r in got.values() if r["batch_id"]) == 8
    # integer batch_index arithmetic unchanged
    assert sorted(r["batch_index"] for r in got.values()
                  if r["batch_index"] is not None) == [0, 0, 0, 0,
                                                       1, 1, 1, 1]
