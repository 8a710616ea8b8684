"""Full-spec PNG codec (``sources/pngcodec.py``): roundtrips across
color types x depths x filters x interlace, CRC verification, error
paths, the differential twin against the legacy minimal reader, and
a hypothesis sweep. ImageIO interop lives in test_png_interop.py."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cerberus_cpp_spark.sources import pngcodec as P
from cerberus_cpp_spark.sources.imagegen import (
    _decode_png as legacy_decode,
    decode_image,
    encode_png,
)


def _rand(seed, h, w):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("fm", [0, 1, 2, 3, 4, "adaptive"])
@pytest.mark.parametrize("interlace", [False, True])
def test_rgb_filters_roundtrip(fm, interlace):
    img = _rand(4, 13, 17)
    data = P.encode_png_ex(img, filter_mode=fm, interlace=interlace)
    assert P.sniff_png(data)
    assert P.png_header_info(data) == (17, 13)
    assert np.array_equal(P.decode_png(data), img)


@pytest.mark.parametrize("mode,depth", [
    ("rgb", 16), ("rgba", 8), ("rgba", 16), ("gray", 8),
    ("gray", 16), ("gray_alpha", 8), ("gray_alpha", 16),
])
def test_modes_roundtrip(mode, depth):
    img = _rand(5, 9, 11)
    if mode.startswith("gray"):
        img = np.repeat(img[:, :, :1], 3, axis=2)
    data = P.encode_png_ex(img, mode=mode, depth=depth,
                           filter_mode="adaptive")
    assert np.array_equal(P.decode_png(data), img)


@pytest.mark.parametrize("interlace", [False, True])
def test_palette_roundtrip(interlace):
    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (40, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 40, (7, 23))]
    data = P.encode_png_ex(img, mode="palette", interlace=interlace)
    assert np.array_equal(P.decode_png(data), img)


@pytest.mark.parametrize("w,h", [(1, 1), (1, 9), (9, 1), (2, 2),
                                 (8, 8), (5, 3)])
def test_edge_dims_interlaced(w, h):
    """Adam7 with empty passes (dims smaller than the pass grid)."""
    img = _rand(w * 16 + h, h, w)
    for il in (False, True):
        data = P.encode_png_ex(img, filter_mode="adaptive",
                               interlace=il)
        assert np.array_equal(P.decode_png(data), img)


def test_sub_byte_depths_decode():
    """1/2/4-bit gray and palette streams (hand-assembled — our
    encoder doesn't emit them; ImageIO's 1-bit output is covered in
    the interop suite)."""
    for depth in (1, 2, 4):
        w, h = 11, 5
        maxv = (1 << depth) - 1
        vals = np.random.RandomState(depth).randint(
            0, maxv + 1, (h, w)).astype(np.uint8)
        stride_bits = w * depth
        rows = b""
        for y in range(h):
            bits = []
            for v in vals[y]:
                bits.extend(int(b) for b in f"{v:0{depth}b}")
            bits += [0] * (-len(bits) % 8)
            rows += b"\x00" + np.packbits(
                np.array(bits, np.uint8)).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
        data = (P.PNG_MAGIC + P._png_chunk(b"IHDR", ihdr)
                + P._png_chunk(b"IDAT", zlib.compress(rows))
                + P._png_chunk(b"IEND", b""))
        out = P.decode_png(data)
        exp = ((vals.astype(np.uint16) * 255 + maxv // 2)
               // maxv).astype(np.uint8)
        assert np.array_equal(out, np.repeat(exp[:, :, None], 3, 2))


def test_crc_and_error_paths():
    img = _rand(7, 6, 6)
    data = bytearray(P.encode_png_ex(img))
    data[60] ^= 0xFF
    with pytest.raises(ValueError):
        P.decode_png(bytes(data))
    good = P.encode_png_ex(img)
    with pytest.raises(ValueError):
        P.decode_png(good[:40])          # truncated chunk
    with pytest.raises(ValueError):
        P.decode_png(b"\x89PNG\r\n\x1a\nnope")
    with pytest.raises(ValueError):
        P.encode_png_ex(img, mode="gray")   # R!=G!=B
    with pytest.raises(ValueError):
        P.encode_png_ex(_rand(8, 20, 20), mode="palette")
    # invalid color-type/depth combination in IHDR
    bad = bytearray(good)
    bad[24] = 4   # depth 4 with color type 2: invalid
    bad[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(bad[16:29])) & 0xFFFFFFFF)
    with pytest.raises(ValueError):
        P.decode_png(bytes(bad))


def test_differential_twin_on_minimal_streams():
    """The legacy minimal reader and the full decoder must agree on
    the repo's own filter-0 output (differential pin; the corpora
    that embed those bytes stay byte-identical)."""
    for seed in range(6):
        img = _rand(seed, 3 + seed, 4 + seed)
        blob = encode_png(img)
        assert np.array_equal(legacy_decode(blob), P.decode_png(blob))
        fmt, dec = decode_image(blob)
        assert fmt == "png" and np.array_equal(dec, img)


def test_foreign_adaptive_stream_through_dispatch():
    """A filtered, interlaced stream — the kind the round-1 reader
    rejected — must decode through the public dispatch now."""
    img = _rand(11, 14, 10)
    blob = P.encode_png_ex(img, filter_mode="adaptive", interlace=True)
    fmt, dec = decode_image(blob)
    assert fmt == "png" and np.array_equal(dec, img)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 32), st.integers(1, 20), st.integers(0, 2 ** 31),
       st.sampled_from([0, 1, 2, 3, 4, "adaptive"]),
       st.sampled_from(["rgb", "rgba", "gray", "palette"]),
       st.booleans())
def test_property_roundtrip(w, h, seed, fm, mode, interlace):
    rng = np.random.RandomState(seed % (2 ** 32 - 1))
    if mode == "gray":
        img = np.repeat(rng.randint(0, 256, (h, w, 1)), 3,
                        axis=2).astype(np.uint8)
    elif mode == "palette":
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        img = pal[rng.randint(0, 16, (h, w))]
    else:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    data = P.encode_png_ex(img, mode=mode, filter_mode=fm,
                           interlace=interlace)
    assert P.png_header_info(data) == (w, h)
    assert np.array_equal(P.decode_png(data), img)


def test_audit_chunks_continues_past_crc_mismatch() -> None:
    """Mid-stream corruption: the audit reports the bad chunk AND
    keeps walking (decode-oriented walkers stop; forensics must
    enumerate all damage)."""
    import numpy as np

    from cerberus_cpp_spark.sources.imagegen import encode_png
    from cerberus_cpp_spark.sources.pngcodec import audit_chunks

    px = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    blob = bytearray(encode_png(px))
    assert [t for t, *_ in audit_chunks(bytes(blob))] == [
        "IHDR", "IDAT", "IEND"]
    # flip one byte inside IHDR's payload (offset 8 + 8 = data start)
    blob[16] ^= 0xFF
    got = audit_chunks(bytes(blob))
    assert [(t, ok) for t, _, _, ok in got] == [
        ("IHDR", False), ("IDAT", True), ("IEND", True)]
    # offsets and lengths are reported for every chunk
    assert got[0][1:3] == (8, 13) and got[2][2] == 0


def test_audit_chunks_structural_errors() -> None:
    import numpy as np
    import pytest

    from cerberus_cpp_spark.sources.imagegen import encode_png
    from cerberus_cpp_spark.sources.pngcodec import audit_chunks

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = encode_png(px)
    with pytest.raises(ValueError, match="truncated"):
        audit_chunks(blob[:-14])
    with pytest.raises(ValueError, match="not a PNG"):
        audit_chunks(b"\xff\xd8\xff\xe0 not png")
    with pytest.raises(ValueError, match="IEND"):
        audit_chunks(blob[: len(blob) - 12])  # exact IEND removal
