"""TIFF codec: roundtrips across compression x byte-order x
predictor x photometric x strip/tile layouts, LZW table-reset, error
paths, and a hypothesis sweep. Interop with Java ImageIO's TIFF
plugin lives in test_tiff_interop.py."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cerberus_cpp_spark.sources import tiffcodec as T
from cerberus_cpp_spark.sources.imagegen import (
    decode_image, encode_pixels, image_header_info, sniff_format)


def _rand(seed, h, w):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw", "deflate"])
@pytest.mark.parametrize("bo", ["<", ">"])
def test_rgb_roundtrip(comp, bo):
    img = _rand(3, 13, 17)
    data = T.encode_tiff(img, compression=comp, byte_order=bo)
    assert T.sniff_tiff(data)
    assert T.tiff_header_info(data) == (17, 13)
    assert np.array_equal(T.decode_tiff(data), img)


@pytest.mark.parametrize("comp", ["lzw", "deflate"])
def test_predictor_roundtrip(comp):
    img = _rand(4, 21, 19)
    data = T.encode_tiff(img, compression=comp, predictor=True)
    assert np.array_equal(T.decode_tiff(data), img)


@pytest.mark.parametrize("mode", ["gray", "gray0"])
def test_gray_roundtrip(mode):
    g = np.repeat(_rand(5, 9, 11)[:, :, :1], 3, axis=2)
    for comp in ("none", "lzw"):
        data = T.encode_tiff(g, mode=mode, compression=comp)
        assert np.array_equal(T.decode_tiff(data), g)


def test_palette_roundtrip():
    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (100, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 100, (7, 23))]
    for comp in ("none", "packbits", "deflate"):
        data = T.encode_tiff(img, mode="palette", compression=comp)
        assert np.array_equal(T.decode_tiff(data), img)


def test_tiles_and_multi_strip():
    img = _rand(7, 40, 50)
    for comp in ("none", "lzw", "deflate", "packbits"):
        assert np.array_equal(
            T.decode_tiff(T.encode_tiff(img, tile=16, compression=comp)),
            img)
    assert np.array_equal(
        T.decode_tiff(T.encode_tiff(img, tile=32, compression="lzw",
                                    predictor=True)), img)
    assert np.array_equal(
        T.decode_tiff(T.encode_tiff(img, rows_per_strip=3,
                                    compression="lzw", predictor=True)),
        img)


def test_lzw_width_growth_and_reset():
    """Random 128x130 RGB = ~50 KB of incompressible bytes in one
    strip: the LZW table fills past every width threshold and
    through at least one 4094-entry reset."""
    img = _rand(8, 128, 130)
    data = T.encode_tiff(img, compression="lzw", rows_per_strip=128)
    assert np.array_equal(T.decode_tiff(data), img)
    low = np.tile(_rand(9, 64, 64) % 4 * 80, (4, 4, 1))
    data = T.encode_tiff(low, compression="lzw", rows_per_strip=256)
    assert np.array_equal(T.decode_tiff(data), low)


def test_error_paths():
    img = _rand(10, 8, 8)
    data = T.encode_tiff(img)
    with pytest.raises(ValueError):
        T.decode_tiff(data[:16])                 # truncated IFD
    with pytest.raises(ValueError):
        T.decode_tiff(b"II\x2b\x00" + data[4:])  # BigTIFF magic
    with pytest.raises(ValueError):
        T.encode_tiff(img, compression="ccitt")
    with pytest.raises(ValueError):
        T.encode_tiff(img, predictor=True)       # predictor sans lzw
    with pytest.raises(ValueError):
        T.encode_tiff(img, tile=10)              # not multiple of 16
    with pytest.raises(ValueError):
        T.encode_tiff(img, mode="gray")          # R!=G!=B
    with pytest.raises(ValueError):
        T.encode_tiff(_rand(11, 20, 20), mode="palette")
    # unsupported-but-honest gates: patch Compression to CCITT G4
    bad = bytearray(data)
    pos = bad.find((259).to_bytes(2, "little"))
    bad[pos + 8:pos + 10] = (4).to_bytes(2, "little")
    with pytest.raises(ValueError, match="compression"):
        T.decode_tiff(bytes(bad))


def test_truncated_strip_payload():
    img = _rand(12, 16, 16)
    data = T.encode_tiff(img, compression="packbits")
    with pytest.raises(ValueError):
        T.decode_tiff(data[:-10])


def test_imagegen_routing():
    img = _rand(13, 6, 5)
    data = encode_pixels(img, "tiff")
    assert sniff_format(data) == "tiff"
    assert image_header_info(data) == ("tiff", 5, 6)
    fmt, out = decode_image(data)
    assert fmt == "tiff" and np.array_equal(out, img)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 24), st.integers(0, 2 ** 31),
       st.sampled_from(["none", "packbits", "lzw", "deflate"]),
       st.sampled_from(["<", ">"]), st.booleans())
def test_property_roundtrip(w, h, seed, comp, bo, pred):
    if pred and comp in ("none", "packbits"):
        pred = False
    rng = np.random.RandomState(seed % (2 ** 32 - 1))
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    data = T.encode_tiff(img, compression=comp, byte_order=bo,
                         predictor=pred)
    assert T.tiff_header_info(data) == (w, h)
    assert np.array_equal(T.decode_tiff(data), img)
