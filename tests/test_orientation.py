"""EXIF orientation baking (``multimodal.normalize_orientation``):
pixel semantics per CIPA DC-008, metadata rewrite, carrier-format
preservation, and pass-through families."""

import numpy as np
import pytest

from cerberus_cpp_spark.sources.imagegen import (
    decode_image,
    encode_pixels,
    psnr,
    synth_pixels,
)
from cerberus_cpp_spark.sources.imagemeta import (
    apply_exif_orientation,
    build_exif,
    image_metadata,
    jpeg_insert_metadata,
    png_insert_metadata,
)
from cerberus_cpp_spark.sources.tiffcodec import encode_tiff
from cerberus_cpp_spark.sources.webpx import encode_webp_vp8x

PX = synth_pixels(3, 10, 7)  # w=10, h=7


def test_transform_vocabulary():
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    # all eight transforms are bijections that invert as documented
    inverses = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    for o, inv in inverses.items():
        assert np.array_equal(
            apply_exif_orientation(apply_exif_orientation(px, o), inv),
            px), o
    for o in (5, 6, 7, 8):
        assert apply_exif_orientation(px, o).shape == (4, 2, 3)
    with pytest.raises(ValueError):
        apply_exif_orientation(px, 9)


def _carrier(fmt: str, px: np.ndarray, orientation: int) -> bytes:
    h, w = px.shape[:2]
    ex = build_exif(description="keepme", orientation=orientation,
                    pixel_x=w, pixel_y=h)
    if fmt == "jpeg":
        return jpeg_insert_metadata(encode_pixels(px, "jpeg"), exif=ex)
    if fmt == "png":
        return png_insert_metadata(encode_pixels(px, "png"), exif=ex,
                                   text={"Title": "t"})
    if fmt == "tiff":
        return encode_tiff(px, meta_tags={270: "keepme",
                                          274: orientation,
                                          40962: w, 40963: h})
    rgba = np.dstack([px, np.full((h, w), 255, np.uint8)])
    return encode_webp_vp8x(rgba, lossy=False, exif=ex)


@pytest.mark.parametrize("fmt", ["jpeg", "png", "tiff", "webp"])
@pytest.mark.parametrize("o", [2, 3, 5, 6, 8])
def test_normalize_orientation(spark, fmt, o):
    from cerberus_cpp_spark.operators.multimodal import (
        normalize_orientation,
    )

    df = spark.createDataFrame(
        [("a", bytearray(_carrier(fmt, PX, o)))],
        "image_id string, bytes binary")
    row = normalize_orientation(df).collect()[0]
    assert row["fixed"] and row["fmt"] == fmt
    exp = apply_exif_orientation(PX, o)
    assert (row["w"], row["h"]) == (exp.shape[1], exp.shape[0])
    m = image_metadata(bytes(row["bytes"]))
    assert m["exif"]["orientation"] == 1
    assert m["exif"]["pixel_x"] == exp.shape[1]
    assert m["exif"]["pixel_y"] == exp.shape[0]
    assert m["exif"]["description"] == "keepme"
    dfmt, dec = decode_image(bytes(row["bytes"]))
    assert dfmt == fmt
    if fmt == "jpeg":
        assert psnr(dec, exp) >= 40.0
    else:
        assert np.array_equal(dec, exp)


def test_passthrough_families(spark):
    from cerberus_cpp_spark.operators.multimodal import (
        normalize_orientation,
    )

    upright = _carrier("png", PX, 1)
    no_exif = encode_pixels(PX, "png")
    bmp = encode_pixels(PX, "bmp")
    df = spark.createDataFrame(
        [("up", bytearray(upright)), ("plain", bytearray(no_exif)),
         ("bmp", bytearray(bmp)), ("null", None),
         ("junk", bytearray(b"not an image"))],
        "image_id string, bytes binary")
    rows = {r["image_id"]: r for r in
            normalize_orientation(df).collect()}
    for rid, orig in (("up", upright), ("plain", no_exif),
                      ("bmp", bmp)):
        r = rows[rid]
        assert not r["fixed"]
        assert bytes(r["bytes"]) == orig  # byte-identical
    assert rows["null"]["bytes"] is None
    assert "no payload" in rows["null"]["message"]
    assert "unreadable metadata" in rows["junk"]["message"]
    assert bytes(rows["junk"]["bytes"]) == b"not an image"
