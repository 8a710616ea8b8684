"""EXIF GPS: build_exif(gps=) / parse_gps exact-rational roundtrip
across carriers, strip removal, and the gps_pii_audit operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from cerberus_cpp_spark.operators.image_checks import gps_pii_audit
from cerberus_cpp_spark.sources.imagegen import (
    encode_pixels,
    pixel_seed,
    synth_pixels,
)
from cerberus_cpp_spark.sources.imagemeta import (
    build_exif,
    jpeg_insert_metadata,
    parse_gps,
    png_insert_metadata,
    raw_exif,
    strip_metadata,
)

GPS = {"lat_ref": "N", "lat": ((51, 1), (30, 1), (12345, 1000)),
       "lon_ref": "W", "lon": ((0, 1), (7, 1), (56789, 1000)),
       "alt": (3500, 100)}


def _px(w=8, h=6):
    return synth_pixels(pixel_seed(1, 9), w, h)


def _carriers():
    exif = build_exif(description="t", gps=GPS)
    jpg = jpeg_insert_metadata(encode_pixels(_px(), "jpeg"),
                               exif=exif)
    png = png_insert_metadata(encode_pixels(_px(), "png"), exif=exif)
    from cerberus_cpp_spark.sources.webpx import encode_webp_vp8x

    rgba = np.dstack([_px(), np.full((6, 8), 255, np.uint8)])
    webp = encode_webp_vp8x(rgba, lossy=False, exif=exif)
    return {"jpeg": jpg, "png": png, "webp": webp}


@pytest.mark.parametrize("bo", ["<", ">"])
def test_roundtrip_both_byte_orders(bo):
    blob = build_exif(orientation=3, pixel_x=4, pixel_y=2, gps=GPS,
                      byte_order=bo)
    g = parse_gps(blob)
    assert g["lat_ref"] == "N" and g["lon_ref"] == "W"
    assert g["lat"] == [(51, 1), (30, 1), (12345, 1000)]
    assert g["lon"] == [(0, 1), (7, 1), (56789, 1000)]
    assert g["alt"] == (3500, 100)
    # the normalized fields coexist with the GPS sub-IFD
    from cerberus_cpp_spark.sources.imagemeta import parse_exif

    assert parse_exif(blob)["pixel_x"] == 4


def test_no_gps_is_none():
    assert parse_gps(build_exif(description="x")) is None
    assert parse_gps(build_exif(pixel_x=3, pixel_y=3)) is None


def test_carriers_roundtrip_and_strip():
    for fmt, payload in _carriers().items():
        ex = raw_exif(payload)
        assert ex is not None, fmt
        assert parse_gps(ex)["lat"][2] == (12345, 1000), fmt
        stripped, removed = strip_metadata(payload)
        assert "exif" in removed, fmt
        assert raw_exif(stripped) is None, fmt


def test_truncated_gps_ifd_raises():
    blob = build_exif(gps=GPS)
    with pytest.raises(ValueError):
        parse_gps(blob[:len(blob) - 10])


def test_guards():
    with pytest.raises(ValueError):
        build_exif(gps={**GPS, "lat_ref": "X"})
    with pytest.raises(ValueError):
        build_exif(gps={**GPS, "lat": ((1, 1), (2, 1))})


def test_audit_operator_routing(spark):
    cars = _carriers()
    clean = encode_pixels(_px(), "png")
    rows = [
        Row(image_id="jpg-gps", bytes=bytearray(cars["jpeg"])),
        Row(image_id="png-gps", bytes=bytearray(cars["png"])),
        Row(image_id="webp-gps", bytes=bytearray(cars["webp"])),
        Row(image_id="clean", bytes=bytearray(clean)),
        Row(image_id="null", bytes=None),
        Row(image_id="junk", bytes=bytearray(b"\x00\x01garbage")),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in gps_pii_audit(df).collect()}
    for rid in ("jpg-gps", "png-gps", "webp-gps"):
        r = got[rid]
        assert r["status"] == "ok" and r["has_gps"]
        assert (r["lat_ref"], r["lon_ref"]) == ("N", "W")
        assert (r["lat_s_num"], r["lat_s_den"]) == (12345, 1000)
        assert (r["lon_d_num"], r["lon_d_den"]) == (0, 1)
        assert (r["alt_num"], r["alt_den"]) == (3500, 100)
    assert got["clean"]["status"] == "ok"
    assert got["clean"]["has_gps"] is False
    assert got["clean"]["lat_ref"] is None
    assert got["null"]["status"] == "no_payload"
    assert got["junk"]["status"] == "malformed"


def test_audit_plan_is_one_narrow_stage(spark):
    df = spark.createDataFrame(
        [Row(image_id="a", bytes=bytearray(b"x"))],
        "image_id string, bytes binary")
    plan = gps_pii_audit(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_thumbnail_roundtrip_and_bounds():
    import numpy as np
    import pytest

    from cerberus_cpp_spark.sources.imagemeta import (
        build_exif,
        parse_thumbnail,
    )
    from cerberus_cpp_spark.sources.jpegcodec import encode_jpeg

    thumb = encode_jpeg(
        np.arange(144, dtype=np.uint8).reshape(6, 8, 3), quality=60)
    for bo in ("<", ">"):
        ex = build_exif(description="d", orientation=5,
                        thumbnail=thumb, byte_order=bo)
        t = parse_thumbnail(ex)
        assert t["bytes"] == thumb and t["compression"] == 6
        assert t["length"] == len(thumb)
    assert parse_thumbnail(build_exif(description="x")) is None
    with pytest.raises(ValueError):
        parse_thumbnail(build_exif(thumbnail=thumb)[:-3])
    with pytest.raises(ValueError):
        parse_thumbnail(b"II\x2a\x00\x08\x00\x00")


def test_thumbnail_audit_operator(spark):
    import numpy as np

    from cerberus_cpp_spark.operators.image_checks import (
        exif_thumbnail_audit,
    )
    from cerberus_cpp_spark.sources.imagegen import encode_pixels
    from cerberus_cpp_spark.sources.imagemeta import (
        build_exif,
        jpeg_insert_metadata,
    )
    from cerberus_cpp_spark.sources.jpegcodec import encode_jpeg

    host = encode_pixels(
        np.full((8, 8, 3), 77, np.uint8), "jpeg")
    thumb = encode_jpeg(
        np.arange(144, dtype=np.uint8).reshape(6, 8, 3), quality=55)
    with_t = jpeg_insert_metadata(host, exif=build_exif(
        description="t", thumbnail=thumb))
    no_t = jpeg_insert_metadata(host, exif=build_exif(
        description="t"))
    bad = jpeg_insert_metadata(host, exif=build_exif(
        description="t", thumbnail=thumb)[:-5])
    garbage_thumb = jpeg_insert_metadata(host, exif=build_exif(
        thumbnail=b"\x00not-a-jpeg\x00" * 3))
    rows = [("a", with_t), ("b", no_t), ("c", host), ("d", bad),
            ("e", garbage_thumb), ("f", None)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r.asDict()
           for r in exif_thumbnail_audit(df).collect()}
    a = got["a"]
    assert a["status"] == "ok" and a["has_thumbnail"] is True
    assert a["thumb_compression"] == 6
    assert a["thumb_len"] == len(thumb)
    assert a["thumb_decodes"] is True
    assert (a["thumb_w"], a["thumb_h"]) == (8, 6)
    assert got["b"]["has_exif"] is True
    assert got["b"]["has_thumbnail"] is False
    assert got["c"]["has_exif"] is False
    assert got["d"]["status"] == "malformed"
    e = got["e"]
    assert e["status"] == "ok" and e["thumb_decodes"] is False
    assert e["thumb_w"] is None
    assert got["f"]["status"] == "no_payload"


def test_thumbnail_zero_offset_or_length_is_no_thumbnail():
    import struct as _s

    import numpy as np

    from cerberus_cpp_spark.sources.imagemeta import (
        build_exif,
        parse_thumbnail,
    )
    from cerberus_cpp_spark.sources.jpegcodec import encode_jpeg

    thumb = encode_jpeg(np.full((6, 8, 3), 50, np.uint8), quality=60)
    ex = bytearray(build_exif(description="d", thumbnail=thumb))
    # locate IFD1: next pointer after IFD0's single entry
    (ifd0,) = _s.unpack_from("<I", ex, 4)
    (n,) = _s.unpack_from("<H", ex, ifd0)
    (ifd1,) = _s.unpack_from("<I", ex, ifd0 + 2 + 12 * n)
    # IFD1 entries sorted (259, 513, 514): value slots at +8 of each
    for idx in (1, 2):  # zero the 513 offset, then the 514 length
        patched = bytearray(ex)
        _s.pack_into("<I", patched, ifd1 + 2 + 12 * idx + 8, 0)
        assert parse_thumbnail(bytes(patched)) is None, idx
