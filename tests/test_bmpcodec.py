"""BMP codec: roundtrips across every mode, header/sniff routing,
error paths, and a hypothesis sweep. Interop with Java ImageIO lives
in test_bmp_interop.py."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cerberus_cpp_spark.sources import bmpcodec as B
from cerberus_cpp_spark.sources.imagegen import (
    decode_image, encode_pixels, image_header_info, sniff_format)


def _rand(seed, h, w):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("w,h,top_down", [
    (1, 1, False), (5, 3, False), (7, 4, True), (33, 9, True),
    (16, 16, False),
])
@pytest.mark.parametrize("bpp", [24, 32])
def test_truecolor_roundtrip(w, h, top_down, bpp):
    img = _rand(w * h + bpp, h, w)
    data = B.encode_bmp(img, bpp=bpp, top_down=top_down)
    assert B.sniff_bmp(data)
    assert B.bmp_header_info(data) == (w, h)
    assert np.array_equal(B.decode_bmp(data), img)


@pytest.mark.parametrize("bpp,ncol", [(8, 200), (8, 1), (4, 16),
                                      (4, 3), (1, 2), (1, 1)])
def test_palette_roundtrip(bpp, ncol):
    rng = np.random.RandomState(bpp * 31 + ncol)
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    img = pal[rng.randint(0, ncol, (11, 13))]
    data = B.encode_bmp(img, bpp=bpp)
    assert np.array_equal(B.decode_bmp(data), img)


def test_rle8_runs_and_literals():
    rng = np.random.RandomState(77)
    pal = rng.randint(0, 256, (5, 3)).astype(np.uint8)
    runs = pal[np.repeat(rng.randint(0, 5, (9, 7)).astype(np.uint8),
                         3, axis=1)]
    lits = pal[rng.randint(0, 5, (6, 31)).astype(np.uint8)]
    solid = pal[np.zeros((4, 300), np.uint8)]  # runs > 255 split
    for img in (runs, lits, solid):
        data = B.encode_bmp(img, bpp=8, rle=True)
        assert np.array_equal(B.decode_bmp(data), img)


def test_rle8_delta_and_eol_escapes():
    """Hand-built stream using the delta escape (our encoder never
    emits it): 4x3, palette {0: red, 1: blue}; row0 starts with one
    blue then delta-jumps (+2,+1), landing on row1 col3 — skipped
    cells stay palette index 0."""
    pal = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
    palb = B._pal_bytes(pal, 256)
    rle = bytes((1, 1, 0, 2, 2, 1, 1, 1, 0, 0,  # row0(file)=bottom row
                 2, 0, 0, 1))                   # row1 then EOB
    data = B._assemble(4, 3, 8, B.BI_RLE8, palb, rle, False)
    out = B.decode_bmp(data)
    exp = np.zeros((3, 4), int)
    exp[2, 0] = 1   # bottom row, first pixel blue
    exp[1, 3] = 1   # delta target
    assert np.array_equal(out, pal[exp])


def test_16bit_grids_are_exact():
    rng = np.random.RandomState(9)
    v = rng.randint(0, 32, (5, 9, 3)).astype(np.uint32)
    src = (v << 3).astype(np.uint8)
    exp = ((v * 255 + 15) // 31).astype(np.uint8)
    assert np.array_equal(B.decode_bmp(B.encode_bmp(src, bpp=16)), exp)
    r = rng.randint(0, 32, (5, 9))
    g = rng.randint(0, 64, (5, 9))
    b = rng.randint(0, 32, (5, 9))
    src = np.stack([r << 3, g << 2, b << 3], -1).astype(np.uint8)
    exp = np.stack([(r * 255 + 15) // 31, (g * 255 + 31) // 63,
                    (b * 255 + 15) // 31], -1).astype(np.uint8)
    got = B.decode_bmp(B.encode_bmp(src, bpp=16, bitfields_565=True))
    assert np.array_equal(got, exp)


def test_error_paths():
    img = _rand(1, 4, 4)
    data = B.encode_bmp(img)
    with pytest.raises(ValueError):
        B.decode_bmp(data[:30])          # truncated header
    with pytest.raises(ValueError):
        B.decode_bmp(data[:-8])          # truncated pixels
    with pytest.raises(ValueError):
        B.decode_bmp(b"BMnope")          # bad DIB size
    with pytest.raises(ValueError):
        B.encode_bmp(img.astype(np.int32))
    with pytest.raises(ValueError):
        B.encode_bmp(_rand(2, 20, 20), bpp=4)   # too many colors
    with pytest.raises(ValueError):
        B.encode_bmp(img, bpp=4, rle=True)      # RLE4 encode unsupported
    bad = bytearray(data)
    bad[28] = 11                         # bpp=11 unsupported
    with pytest.raises(ValueError):
        B.decode_bmp(bytes(bad))


def test_sniff_rejects_lookalikes():
    assert not B.sniff_bmp(b"BM just text that starts with BM......")
    assert not B.sniff_bmp(b"")
    assert not B.sniff_bmp(None)


def test_imagegen_routing():
    img = _rand(4, 6, 5)
    data = encode_pixels(img, "bmp")
    assert sniff_format(data) == "bmp"
    assert image_header_info(data) == ("bmp", 5, 6)
    fmt, out = decode_image(data)
    assert fmt == "bmp" and np.array_equal(out, img)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 24), st.integers(0, 2 ** 31),
       st.sampled_from([24, 32, 8, 4, 1]), st.booleans())
def test_property_roundtrip(w, h, seed, bpp, top_down):
    rng = np.random.RandomState(seed % (2 ** 32 - 1))
    if bpp in (24, 32):
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    else:
        n = min(1 << bpp, 7)
        pal = rng.randint(0, 256, (n, 3)).astype(np.uint8)
        img = pal[rng.randint(0, n, (h, w))]
    data = B.encode_bmp(img, bpp=bpp, top_down=top_down)
    assert B.bmp_header_info(data) == (w, h)
    assert np.array_equal(B.decode_bmp(data), img)
