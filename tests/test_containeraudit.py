"""Container-integrity walks (sources/containeraudit.py): every
format's structural audit over real encoder output, planted damage
per failure class, and the uniform dispatcher contract."""

import struct

import numpy as np
import pytest

from cerberus_cpp_spark.sources.bmpcodec import encode_bmp
from cerberus_cpp_spark.sources.containeraudit import (
    audit_bmp,
    audit_container,
    audit_gif,
    audit_jpeg,
    audit_riff,
    audit_tiff,
)
from cerberus_cpp_spark.sources.gifcodec import encode_gif
from cerberus_cpp_spark.sources.imagegen import encode_pixels
from cerberus_cpp_spark.sources.tiffcodec import encode_tiff

PX = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)


def test_all_formats_ok() -> None:
    for fmt in ("jpeg", "png", "webp"):
        assert audit_container(encode_pixels(PX, fmt)) == (fmt, "ok", None)
    assert audit_container(encode_gif(PX)) == ("gif", "ok", None)
    assert audit_container(encode_bmp(PX)) == ("bmp", "ok", None)
    assert audit_container(encode_tiff(PX)) == ("tiff", "ok", None)
    assert audit_container(None) == (None, "no_payload", "no payload")
    assert audit_container(b"\x00\x01garbage")[1] == "unknown_format"


def test_jpeg_missing_eoi_and_segment_overrun() -> None:
    blob = encode_pixels(PX, "jpeg")
    n, eoi = audit_jpeg(blob)
    assert eoi and n > 5
    # dropping EOI: decoder TOLERATES this (imagegen pins that), the
    # container audit must not
    n2, eoi2 = audit_jpeg(blob[:-2])
    assert not eoi2
    # corrupt a segment length to overrun the stream: bytes 4-5 are
    # the first segment's length field
    bad = bytearray(blob)
    bad[4:6] = struct.pack(">H", 0xFFFF)
    with pytest.raises(ValueError, match="overruns"):
        audit_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="no SOI"):
        audit_jpeg(b"\x89PNG....")


def test_jpeg_entropy_flip_is_invisible() -> None:
    """A flipped entropy byte leaves the container walk 'ok' — the
    documented no-checksum gap the contract query records."""
    blob = bytearray(encode_pixels(PX, "jpeg"))
    blob[-3] = 0x00
    assert audit_container(bytes(blob)) == ("jpeg", "ok", None)


def test_riff_size_and_chunk_bounds() -> None:
    blob = encode_pixels(PX, "webp")
    assert audit_riff(blob)[0] == "VP8L"
    with pytest.raises(ValueError, match="truncated RIFF"):
        audit_riff(blob[:-2])
    with pytest.raises(ValueError, match="trailing"):
        audit_riff(blob + b"xx")
    bad = bytearray(blob)
    # inflate the VP8L chunk's declared size past the container
    bad[16:20] = struct.pack("<I", len(blob))
    with pytest.raises(ValueError, match="overruns container"):
        audit_riff(bytes(bad))


def test_gif_walk() -> None:
    blob = encode_gif(PX)
    assert audit_gif(blob) >= 1
    with pytest.raises(ValueError, match="truncated GIF"):
        audit_gif(blob[:-3])
    with pytest.raises(ValueError, match="missing trailer"):
        audit_gif(blob[:-1])
    bad = bytearray(blob)
    # overwrite the first block introducer with an unknown one
    intro = 13 + (3 * (2 << (blob[10] & 7)) if blob[10] & 0x80 else 0)
    bad[intro] = 0x7E
    with pytest.raises(ValueError, match="unknown GIF block"):
        audit_gif(bytes(bad))


def test_bmp_bounds() -> None:
    blob = encode_bmp(PX)
    audit_bmp(blob)
    with pytest.raises(ValueError, match="declared size"):
        audit_bmp(blob[:-1])
    bad = bytearray(blob)
    bad[10:14] = struct.pack("<I", len(blob) + 50)  # pixel offset
    with pytest.raises(ValueError, match="offset out of bounds"):
        audit_bmp(bytes(bad))


def test_tiff_strip_and_ifd_bounds() -> None:
    blob = encode_tiff(PX)
    assert audit_tiff(blob) > 4
    with pytest.raises(ValueError, match="strip/tile overruns"):
        audit_tiff(blob[:-3])
    bad = bytearray(blob)
    bad[4:8] = struct.pack("<I", len(blob) + 8)  # first IFD offset
    with pytest.raises(ValueError, match="out of bounds"):
        audit_tiff(bytes(bad))
    # self-referencing IFD chain must terminate, not loop
    (ifd,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd)
    loop = bytearray(blob)
    loop[ifd + 2 + 12 * n:ifd + 2 + 12 * n + 4] = struct.pack("<I", ifd)
    with pytest.raises(ValueError, match="cycle"):
        audit_tiff(bytes(loop))


def test_operator_routes_all_formats(spark) -> None:
    """The Spark operator dispatches every sniffable format plus the
    degenerate rows (GIF/BMP/TIFF are not in the contract query's
    generated corpus, so pin them here)."""
    from cerberus_cpp_spark.operators.image_checks import (
        image_container_audit,
    )

    rows = [
        ("gif", encode_gif(PX)),
        ("bmp", encode_bmp(PX)),
        ("tiff", encode_tiff(PX)),
        ("tiff_bad", encode_tiff(PX)[:-3]),
        ("none", None),
        ("junk", b"\x01\x02\x03\x04"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r for r in image_container_audit(df).collect()}
    assert got["gif"]["verdict"] == "ok" and got["gif"]["fmt"] == "gif"
    assert got["bmp"]["verdict"] == "ok"
    assert got["tiff"]["verdict"] == "ok"
    assert got["tiff_bad"]["verdict"] == "malformed"
    assert "strip/tile" in got["tiff_bad"]["detail"]
    assert got["none"]["verdict"] == "no_payload"
    assert got["junk"]["verdict"] == "unknown_format"
