"""Compressed-payload layer (sources/compression.py): sniffing,
real bounded decode for gzip/zlib/bzip2/xz, the zip-bomb guard,
constant-message damage routing, and the census operator's plan."""

from __future__ import annotations

import bz2
import gzip
import lzma
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_cpp_spark.sources.compression import (
    MSG_BOMB,
    MSG_CORRUPT,
    MSG_NO_ZSTD,
    MSG_TRAILING,
    MSG_UNKNOWN,
    decompress_bounded,
    sniff_compression,
)

_RAW = b"the quick brown fox jumps over the lazy dog " * 40


def _encode(fmt: str, raw: bytes) -> bytes:
    return {"gzip": gzip.compress, "zlib": zlib.compress,
            "bzip2": bz2.compress, "xz": lzma.compress}[fmt](raw)


@pytest.mark.parametrize("fmt", ["gzip", "zlib", "bzip2", "xz"])
def test_roundtrip(fmt) -> None:
    blob = _encode(fmt, _RAW)
    assert sniff_compression(blob) == fmt
    info = decompress_bounded(blob)
    assert info["fmt"] == fmt
    assert info["raw"] == _RAW
    assert info["n_raw"] == len(_RAW)
    assert info["n_comp"] == len(blob)


@given(st.binary(min_size=0, max_size=400),
       st.sampled_from(["gzip", "zlib", "bzip2", "xz"]))
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(raw, fmt) -> None:
    info = decompress_bounded(_encode(fmt, raw))
    assert info["raw"] == raw


def test_sniff_rejections() -> None:
    assert sniff_compression(None) is None
    assert sniff_compression(b"abc") is None
    assert sniff_compression(b"plain text here") is None
    # zlib header checksum rule: 0x78 first byte is not enough
    assert sniff_compression(b"\x78\x00junk") is None
    assert sniff_compression(b"\x78\x9cjunk") == "zlib"
    assert sniff_compression(b"BZh0junk") is None  # level digit 1-9
    assert sniff_compression(b"BZh9junk") == "bzip2"


def test_zstd_detected_but_gated() -> None:
    blob = b"\x28\xb5\x2f\xfd" + b"\x00" * 20
    assert sniff_compression(blob) == "zstd"
    with pytest.raises(ValueError, match=MSG_NO_ZSTD):
        decompress_bounded(blob)


@pytest.mark.parametrize("fmt", ["gzip", "zlib", "bzip2", "xz"])
def test_truncation_and_garbage(fmt) -> None:
    blob = _encode(fmt, _RAW)
    with pytest.raises(ValueError, match=MSG_CORRUPT):
        decompress_bounded(blob[:-5])
    with pytest.raises(ValueError, match=MSG_UNKNOWN):
        decompress_bounded(bytes([blob[0] ^ 0xFF]) + blob[1:])
    # flipping a mid-stream byte corrupts (or truncates) the stream
    mid = len(blob) // 2
    bad = blob[:mid] + bytes([blob[mid] ^ 0xFF]) + blob[mid + 1:]
    with pytest.raises(ValueError,
                       match=f"{MSG_CORRUPT}|{MSG_TRAILING}"):
        decompress_bounded(bad)


@pytest.mark.parametrize("fmt", ["gzip", "zlib", "bzip2", "xz"])
def test_trailing_garbage(fmt) -> None:
    blob = _encode(fmt, _RAW) + b"EXTRA BYTES"
    with pytest.raises(ValueError, match=MSG_TRAILING):
        decompress_bounded(blob)


def test_multi_member_gzip_counts_as_trailing() -> None:
    blob = gzip.compress(b"a" * 100) + gzip.compress(b"b" * 100)
    with pytest.raises(ValueError, match=MSG_TRAILING):
        decompress_bounded(blob)


@pytest.mark.parametrize("fmt", ["gzip", "zlib", "bzip2", "xz"])
def test_zip_bomb_guard(fmt) -> None:
    """A highly-compressible 10 MB payload aborts at a 1 KB budget
    without materializing the output."""
    blob = _encode(fmt, b"\x00" * (10 * 1024 * 1024))
    with pytest.raises(ValueError, match=MSG_BOMB):
        decompress_bounded(blob, max_out=1024)
    # and the exact boundary passes
    small = _encode(fmt, b"\x00" * 1024)
    assert decompress_bounded(small,
                              max_out=1024)["n_raw"] == 1024


def test_empty_payload_roundtrip() -> None:
    for fmt in ("gzip", "zlib", "bzip2", "xz"):
        info = decompress_bounded(_encode(fmt, b""))
        assert info["n_raw"] == 0 and info["raw"] == b""


def test_operator_routing_and_plan(spark) -> None:
    from cerberus_cpp_spark.operators.multimodal import (
        compression_census,
    )

    blob = gzip.compress(_RAW)
    rows = [
        ("ok", bytearray(blob)),
        ("null", None),
        ("plain", bytearray(b"not compressed at all..")),
        ("cut", bytearray(blob[:-5])),
    ]
    df = spark.createDataFrame(rows, "doc_id string, bytes binary")
    out = compression_census(df, id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["clip_id"]: r for r in out.collect()}
    assert got["ok"]["ok"] and got["ok"]["fmt"] == "gzip"
    assert got["ok"]["n_raw"] == len(_RAW)
    import hashlib

    assert got["ok"]["raw_md5"] == hashlib.md5(_RAW).hexdigest()
    assert got["null"]["message"] == "no payload"
    assert got["plain"]["message"] == MSG_UNKNOWN
    assert got["cut"]["message"] == MSG_CORRUPT
