"""sources/iccprofile build/parse + image_checks.icc_profile_audit:
structural validation of colour profiles in JPEG/WebP containers."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from cerberus_cpp_spark.operators.image_checks import icc_profile_audit
from cerberus_cpp_spark.sources.iccprofile import (
    build_icc_profile,
    parse_icc_header,
)
from cerberus_cpp_spark.sources.imagegen import (
    encode_pixels,
    pixel_seed,
    synth_pixels,
)
from cerberus_cpp_spark.sources.imagemeta import jpeg_insert_metadata


def test_roundtrip_fields():
    p = build_icc_profile(profile_class="scnr", color_space="GRAY",
                          pcs="Lab ", version=(4, 2),
                          rendering_intent=1,
                          tags=[("desc", b"a" * 20)])
    h = parse_icc_header(p)
    assert h["profile_class"] == "scnr"
    assert h["color_space"] == "GRAY" and h["pcs"] == "Lab "
    assert (h["version_major"], h["version_minor"]) == (4, 2)
    assert h["rendering_intent"] == 1
    assert h["n_tags"] == 1 and h["tags"][0] == ("desc", 144, 20)
    assert h["declared_size"] == h["actual_size"] == 164


def test_structural_raises():
    p = build_icc_profile()
    with pytest.raises(ValueError):
        parse_icc_header(p[:100])
    with pytest.raises(ValueError):
        parse_icc_header(p[:36] + b"nope" + p[40:])
    # tag payload pushed past the declared bound
    bad = p[:136] + struct.pack(">II", 100_000, 8) + p[144:]
    with pytest.raises(ValueError):
        parse_icc_header(bad)


def test_size_mismatch_reported_not_raised():
    p = build_icc_profile()
    padded = p + b"\x00" * 7
    h = parse_icc_header(padded)
    assert h["declared_size"] == len(p)
    assert h["actual_size"] == len(p) + 7


def test_build_guards():
    with pytest.raises(ValueError):
        build_icc_profile(rendering_intent=4)
    with pytest.raises(ValueError):
        build_icc_profile(profile_class="toolong")


def _jpeg_with(icc):
    px = synth_pixels(pixel_seed(3, 4), 8, 8)
    return jpeg_insert_metadata(encode_pixels(px, "jpeg"), icc=icc)


def test_audit_routing(spark):
    from cerberus_cpp_spark.sources.webpx import encode_webp_vp8x

    icc = build_icc_profile(profile_class="prtr",
                            color_space="CMYK", rendering_intent=2)
    px = synth_pixels(pixel_seed(3, 4), 8, 8)
    rgba = np.dstack([px, np.full((8, 8), 255, np.uint8)])
    rows = [
        Row(image_id="jpg-icc", bytes=bytearray(_jpeg_with(icc))),
        Row(image_id="webp-icc", bytes=bytearray(
            encode_webp_vp8x(rgba, lossy=False, icc=icc))),
        Row(image_id="jpg-clean", bytes=bytearray(
            encode_pixels(px, "jpeg"))),
        Row(image_id="png-no-slot", bytes=bytearray(
            encode_pixels(px, "png"))),
        Row(image_id="jpg-bad-icc", bytes=bytearray(
            _jpeg_with(icc[:36] + b"nope" + icc[40:]))),
        Row(image_id="null", bytes=None),
        Row(image_id="junk", bytes=bytearray(b"\x01\x02")),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in icc_profile_audit(df).collect()}
    for rid in ("jpg-icc", "webp-icc"):
        r = got[rid]
        assert r["status"] == "ok" and r["has_icc"]
        assert r["profile_class"] == "prtr"
        assert r["color_space"] == "CMYK" and r["intent"] == 2
        assert r["declared_size"] == r["actual_size"] == len(icc)
    assert got["jpg-clean"]["status"] == "ok"
    assert got["jpg-clean"]["has_icc"] is False
    assert got["png-no-slot"]["has_icc"] is False
    assert got["jpg-bad-icc"]["status"] == "bad_icc"
    assert got["jpg-bad-icc"]["has_icc"] is True
    assert got["jpg-bad-icc"]["n_tags"] is None
    assert got["null"]["status"] == "no_payload"
    assert got["junk"]["status"] == "malformed"


def test_audit_multisegment_jpeg_icc(spark):
    # >64 KiB profile forces the APP2 multi-segment split path
    icc = build_icc_profile(tags=[("desc", b"q" * 70_000)])
    df = spark.createDataFrame(
        [Row(image_id="big", bytes=bytearray(_jpeg_with(icc)))],
        "image_id string, bytes binary")
    r = icc_profile_audit(df).collect()[0]
    assert r["status"] == "ok"
    assert r["declared_size"] == len(icc) == 70_000 + 144


def test_audit_plan_is_one_narrow_stage(spark):
    df = spark.createDataFrame(
        [Row(image_id="a", bytes=bytearray(b"x"))],
        "image_id string, bytes binary")
    plan = icc_profile_audit(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
