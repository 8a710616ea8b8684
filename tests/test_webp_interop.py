"""Interop oracle for the in-repo VP8L codec against the SYSTEM
libwebp (the reference C implementation, discovered in-container in
round 4 — ``libwebp.so.7``; earlier rounds only probed for Python
bindings and recorded "no interop possible", which was wrong).

Two directions, mirroring ``test_jpeg_interop.py``'s Java-ImageIO
pattern:

- every in-repo ENCODER mode's output must decode bit-exactly in
  libwebp — proving our streams are real WebP, not a private format
  that only our decoder accepts;
- libwebp's OWN lossless encoder output must decode bit-exactly in
  our decoder — proving the decoder handles streams it did not
  author (libwebp picks its own transforms, meta prefix codes, LZ77
  parameters and palette decisions).

Skipped wholesale when the shared library is absent (other
containers); the hand-built bitstreams in ``test_webpcodec.py``
remain the environment-independent conformance floor.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cerberus_cpp_spark.sources import libwebp
from cerberus_cpp_spark.sources.imagegen import psnr, synth_pixels
from cerberus_cpp_spark.sources.webpcodec import (
    decode_webp,
    encode_webp,
    encode_webp_cached,
    encode_webp_color_transformed,
    encode_webp_lz77,
    encode_webp_palette,
    encode_webp_predicted,
)

pytestmark = pytest.mark.skipif(
    not libwebp.available(), reason="system libwebp not present")


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _assert_libwebp_reads_ours(payload: bytes, rgb: np.ndarray) -> None:
    out = libwebp.decode_rgba(payload)
    assert out.shape == (rgb.shape[0], rgb.shape[1], 4)
    assert (out[:, :, 3] == 255).all(), "alpha must decode opaque"
    assert (out[:, :, :3] == rgb).all(), "libwebp disagrees on pixels"


# ---------------------------------------------------------------------------
# our encoders -> libwebp decoder
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sg", [True, False])
def test_literal_mode_decodes_in_libwebp(sg):
    rgb = _rng(1).integers(0, 256, (23, 41, 3), dtype=np.uint8)
    _assert_libwebp_reads_ours(encode_webp(rgb, subtract_green=sg), rgb)


@pytest.mark.parametrize("n_colors", [2, 5, 16, 17, 200])
def test_palette_mode_decodes_in_libwebp(n_colors):
    # covers sub-byte pixel packing (<=16 colors) and plain 8-bit
    rng = _rng(n_colors)
    colors = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (19, 37))
    rgb = colors[idx]
    _assert_libwebp_reads_ours(encode_webp_palette(rgb), rgb)


@pytest.mark.parametrize("cache_bits", [1, 4, 8])
def test_cache_mode_decodes_in_libwebp(cache_bits):
    rng = _rng(cache_bits)
    base = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    rgb = base[rng.integers(0, 8, (21, 33))]
    _assert_libwebp_reads_ours(
        encode_webp_cached(rgb, cache_bits=cache_bits), rgb)


@pytest.mark.parametrize("mode", list(range(14)) + ["auto"])
def test_predicted_mode_decodes_in_libwebp(mode):
    rgb = synth_pixels(77, 48, 32)
    _assert_libwebp_reads_ours(
        encode_webp_predicted(rgb, mode=mode), rgb)


def test_predicted_auto_multimode_decodes_in_libwebp():
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    rgb[20:, :] = synth_pixels(5, 40, 20)
    _assert_libwebp_reads_ours(
        encode_webp_predicted(rgb, mode="auto", size_bits=3), rgb)


def test_color_transformed_mode_decodes_in_libwebp():
    rgb = _rng(5).integers(0, 256, (29, 31, 3), dtype=np.uint8)
    _assert_libwebp_reads_ours(encode_webp_color_transformed(rgb), rgb)


def test_meta_prefix_decodes_in_libwebp():
    from cerberus_cpp_spark.sources.webpcodec import encode_webp_meta

    rng = _rng(7)
    rgb = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    rgb[16:, :] = 7
    _assert_libwebp_reads_ours(encode_webp_meta(rgb, meta_bits=3), rgb)


def test_color_transformed_auto_decodes_in_libwebp():
    rng = _rng(6)
    rgb = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    rgb[20:, :] = synth_pixels(5, 40, 20)
    _assert_libwebp_reads_ours(
        encode_webp_color_transformed(rgb, auto=True, size_bits=3),
        rgb)


def test_lz77_mode_decodes_in_libwebp():
    # repetitive rows => real backrefs in the stream
    tile = _rng(9).integers(0, 256, (4, 11, 3), dtype=np.uint8)
    rgb = np.tile(tile, (6, 5, 1))
    _assert_libwebp_reads_ours(encode_webp_lz77(rgb), rgb)


def test_synthetic_thumbs_decode_in_libwebp():
    # the exact payload family the contract queries carry (literal
    # mode — synth_pixels gradients exceed 256 colors, so the
    # pipeline's palette fast path does not apply to them)
    for seed in range(4):
        rgb = synth_pixels(seed, 40, 28)
        _assert_libwebp_reads_ours(encode_webp(rgb), rgb)


# ---------------------------------------------------------------------------
# libwebp encoder -> our decoder
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed,dims", [(1, (16, 16)), (2, (37, 53)),
                                       (3, (1, 1)), (4, (64, 3))])
def test_our_decoder_reads_libwebp_noise(seed, dims):
    h, w = dims
    rgb = _rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = libwebp.encode_lossless_rgba(rgb)
    assert (decode_webp(data) == rgb).all()


def test_our_decoder_reads_libwebp_structured():
    # gradients + low-color: libwebp picks predictor / palette /
    # LZ77 / meta-code layouts our own encoders never produce
    grad = (np.add.outer(np.arange(50), np.arange(70)) % 256)
    rgb = np.stack([grad, grad[::-1], 255 - grad],
                   axis=-1).astype(np.uint8)
    assert (decode_webp(libwebp.encode_lossless_rgba(rgb)) == rgb).all()

    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                       [10, 20, 30]], np.uint8)
    rgb2 = colors[_rng(11).integers(0, 4, (33, 47))]
    assert (decode_webp(libwebp.encode_lossless_rgba(rgb2)) == rgb2).all()


def test_our_decoder_reads_libwebp_synthetic_thumbs():
    for seed in range(6):
        rgb = synth_pixels(seed, 56, 40)
        assert (decode_webp(libwebp.encode_lossless_rgba(rgb))
                == rgb).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2 ** 32 - 1), st.integers(1, 40),
       st.integers(1, 40), st.sampled_from(["noise", "tile", "flat"]))
def test_hypothesis_cross_decode(seed, w, h, kind):
    rng = _rng(seed)
    if kind == "noise":
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    elif kind == "tile":
        t = rng.integers(0, 256, (max(1, h // 3), max(1, w // 3), 3),
                         dtype=np.uint8)
        rgb = np.tile(t, (3, 3, 1))[:h, :w]
    else:
        rgb = np.full((h, w, 3), rng.integers(0, 256), np.uint8)
    # ours -> libwebp
    _assert_libwebp_reads_ours(encode_webp(rgb), rgb)
    # libwebp -> ours
    assert (decode_webp(libwebp.encode_lossless_rgba(rgb)) == rgb).all()


# ---------------------------------------------------------------------------
# lossy sanity (food for the VP8 route)
# ---------------------------------------------------------------------------


def test_libwebp_lossy_meets_psnr_contract():
    # input_hint: "decoded-pixel allclose (PSNR>=40dB for lossy)".
    # 4:2:0 chroma subsampling bounds PSNR on noise-like content
    # (synth_pixels plateaus ~21.7 dB even at q=100 — measured), so
    # the >=40 contract is only reachable on smooth content; smooth
    # gradients clear it comfortably at q>=90.
    grad = ((np.add.outer(np.arange(48), np.arange(64)) // 2)
            % 200 + 20).astype(np.uint8)
    rgb = np.stack([grad] * 3, axis=-1)
    data = libwebp.encode_rgba(rgb, quality=95.0)
    assert data[12:16] == b"VP8 "  # really lossy, not VP8L
    out = libwebp.decode_rgba(data)[:, :, :3]
    assert psnr(rgb, out) >= 40.0
