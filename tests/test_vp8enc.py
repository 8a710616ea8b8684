"""Tests for the minimal in-repo VP8 encoder (`sources/vp8enc.py`).

The headline property is CROSS-conformance: on streams WE author,
the system libwebp's decode must equal the in-repo decoder's decode
bit-exactly. This covers decoder paths libwebp's own encoder never
emits through the simple API — the SIMPLE loop filter and nonzero
sharpness levels — against the reference C implementation.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cerberus_cpp_spark.sources import libwebp
from cerberus_cpp_spark.sources.vp8codec import VP8Error, decode_vp8_yuv
from cerberus_cpp_spark.sources.vp8enc import (
    BoolEncoder,
    encode_vp8_yuv,
    encode_webp_vp8,
)

needs_libwebp = pytest.mark.skipif(
    not libwebp.available(), reason="system libwebp absent")


def container(payload: bytes) -> bytes:
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def plane(h, w, kind, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "sin":
        return (128 + 50 * np.sin(xx / 5) * np.cos(yy / 7)).astype(np.uint8)
    if kind == "noise":
        return rng.integers(0, 256, (h, w), dtype=np.uint8)
    return ((xx * 3 + yy * 2) % 256).astype(np.uint8)


def psnr(a, b):
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)


def test_bool_coder_roundtrip():
    """Encoder and decoder invert each other over a random prob/bit
    schedule (incl. extreme probabilities that force carries)."""
    from cerberus_cpp_spark.sources.vp8codec import BoolDecoder

    rng = np.random.default_rng(0)
    probs = rng.integers(1, 255, 5000).tolist() + [1, 254] * 50
    bits = rng.integers(0, 2, len(probs)).tolist()
    enc = BoolEncoder()
    for b, p in zip(bits, probs):
        enc.put(int(b), int(p))
    buf = enc.flush()
    dec = BoolDecoder(buf)
    got = [dec.get_bit(int(p)) for p in probs]
    assert got == [int(b) for b in bits]


def test_own_decode_roundtrip_psnr():
    y = plane(32, 48, "sin")
    u = plane(16, 24, "grad")
    v = plane(16, 24, "sin")
    pay = encode_vp8_yuv(y, u, v, q_index=10, filter_level=0)
    dy, du, dv = decode_vp8_yuv(pay)
    assert dy.shape == y.shape and du.shape == u.shape
    assert psnr(y, dy) >= 38.0
    assert psnr(u, du) >= 38.0


@needs_libwebp
@pytest.mark.parametrize("q,fl,sharp,simple", [
    (10, 0, 0, False),          # filter disabled
    (20, 20, 0, False),         # normal filter
    (40, 35, 3, False),         # normal filter + sharpness
    (20, 25, 0, True),          # SIMPLE filter (libwebp never emits)
    (60, 63, 7, True),          # simple, max level + sharpness
])
def test_cross_conformance_on_our_streams(q, fl, sharp, simple):
    """libwebp's decode of OUR stream == our decode, bit-exact —
    including the simple-filter and sharpness paths."""
    for kind in ("sin", "grad", "noise"):
        y = plane(17, 23, kind, seed=q)
        u = plane(9, 12, kind, seed=q + 1)
        v = plane(9, 12, "grad")
        pay = encode_vp8_yuv(y, u, v, q_index=q, filter_level=fl,
                             sharpness=sharp, simple_filter=simple)
        dy, du, dv = decode_vp8_yuv(pay)
        ry, ru, rv = libwebp.decode_yuv(container(pay))
        assert np.array_equal(dy, ry), kind
        assert np.array_equal(du, ru), kind
        assert np.array_equal(dv, rv), kind


@needs_libwebp
def test_skip_macroblocks_conform():
    """A flat image at coarse quant produces skip MBs; both decoders
    agree and the nonzero-context bookkeeping survives."""
    y = np.full((48, 64), 142, np.uint8)
    u = np.full((24, 32), 90, np.uint8)
    v = np.full((24, 32), 200, np.uint8)
    pay = encode_vp8_yuv(y, u, v, q_index=80, filter_level=30)
    dy, du, dv = decode_vp8_yuv(pay)
    ry, ru, rv = libwebp.decode_yuv(container(pay))
    assert np.array_equal(dy, ry)
    assert np.array_equal(du, ru)
    assert np.array_equal(dv, rv)


def test_webp_container_wrapper_roundtrip():
    from cerberus_cpp_spark.sources.webpcodec import decode_webp_any

    im = np.dstack([plane(33, 49, "sin")] * 3)
    data = encode_webp_vp8(im, q_index=15, filter_level=20)
    out = decode_webp_any(data)
    assert out.shape == im.shape
    assert psnr(im, out) >= 40.0


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_vp8_yuv(np.zeros((16, 16), np.uint8),
                       np.zeros((4, 4), np.uint8),
                       np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError):
        encode_webp_vp8(np.zeros((16, 16), np.uint8))
    with pytest.raises(VP8Error):
        decode_vp8_yuv(b"")


def test_planted_lossy_family_margin():
    """The id%30==23 contract plants must fail the 40 dB gate with
    margin for EVERY planted id at contract scale — this pin is what
    lets the DuckDB oracle predict 'mismatch' from id arithmetic."""
    from cerberus_cpp_spark.sources.imagegen import (
        decode_image,
        lossy_webp_payload,
        pixel_seed,
        synth_pixels,
    )
    from cerberus_cpp_spark.sources.imagegen import psnr as img_psnr

    worst = 0.0
    for i in range(23, 3000, 30):
        data = lossy_webp_payload(i, 42)
        fmt, px = decode_image(data)
        assert fmt == "webp"
        ref = synth_pixels(pixel_seed(i, 42), 8 + i % 9, 8 + i % 7)
        assert px.shape == ref.shape
        worst = max(worst, img_psnr(px, ref))
    assert worst < 36.0, worst  # >= 4 dB under the 40 dB gate


def test_planted_lossy_row_verdict(spark):
    """One planted row through the real fidelity_check stage lands on
    'mismatch' with a populated psnr_db (proving the decode ran)."""
    from cerberus_cpp_spark.operators.image_checks import fidelity_check
    from cerberus_cpp_spark.sources.distgen import image_caption_frame

    df = image_caption_frame(spark, 60, with_bytes=True,
                             plant_lossy=True)
    out = {r["image_id"]: r for r in fidelity_check(df).collect()}
    planted = out["img-000000000023"]
    assert planted["verdict"] == "mismatch"
    assert planted["pixels_ok"] is False
    assert planted["psnr_db"] is not None and planted["psnr_db"] < 36
    stub = out["img-000000000008"]
    assert stub["verdict"] == "decode_unsupported"
    assert stub["psnr_db"] is None
