"""image_checks.pixel_fingerprints / cross_codec_duplicates: the
same pixels in different containers share one fingerprint; routing;
plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from cerberus_cpp_spark.operators.image_checks import (
    cross_codec_duplicates,
    pixel_fingerprints,
)
from cerberus_cpp_spark.sources.imagegen import (
    encode_pixels,
    pixel_seed,
    synth_pixels,
)


def _payloads():
    px = synth_pixels(pixel_seed(7, 5), 9, 6)
    other = synth_pixels(pixel_seed(8, 5), 9, 6)
    return {
        "png": encode_pixels(px, "png"),
        "bmp": encode_pixels(px, "bmp"),
        "tiff": encode_pixels(px, "tiff"),
        "other": encode_pixels(other, "png"),
    }, px, other


def test_fingerprints_cross_container(spark):
    pay, px, other = _payloads()
    rows = [Row(image_id=k, bytes=bytearray(v))
            for k, v in pay.items()]
    rows += [Row(image_id="null", bytes=None),
             Row(image_id="junk", bytes=bytearray(b"nope"))]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in pixel_fingerprints(df).collect()}
    want = hashlib.md5(px.tobytes()).hexdigest()
    for k in ("png", "bmp", "tiff"):
        assert got[k]["status"] == "ok" and got[k]["fmt"] == k
        assert (got[k]["w"], got[k]["h"]) == (9, 6)
        assert got[k]["pixel_md5"] == want
    assert got["other"]["pixel_md5"] == \
        hashlib.md5(other.tobytes()).hexdigest()
    assert got["other"]["pixel_md5"] != want
    assert got["null"]["status"] == "no_payload"
    assert got["junk"]["status"] == "undecodable"


def test_cross_codec_groups_and_survivor(spark):
    pay, _, _ = _payloads()
    rows = [Row(image_id=f"a-{k}", bytes=bytearray(v))
            for k, v in pay.items() if k != "other"]
    rows += [Row(image_id="z-single",
                 bytes=bytearray(pay["other"])),
             Row(image_id="broken", bytes=bytearray(b"x"))]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r
           for r in cross_codec_duplicates(df).collect()}
    trio = [got[f"a-{k}"] for k in ("png", "bmp", "tiff")]
    assert all(r["group_size"] == 3 for r in trio)
    assert all(r["survivor_id"] == "a-bmp" for r in trio)
    assert [r["is_survivor"] for r in sorted(
        trio, key=lambda r: r["image_id"])] == [True, False, False]
    assert got["z-single"]["group_size"] == 1
    assert got["z-single"]["is_survivor"] is True
    assert got["broken"]["status"] == "undecodable"
    assert got["broken"]["group_size"] is None


def test_fingerprint_plan_is_one_narrow_stage(spark):
    df = spark.createDataFrame(
        [Row(image_id="a", bytes=bytearray(b"x"))],
        "image_id string, bytes binary")
    plan = pixel_fingerprints(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
