"""Conformance suite for the in-repo VP8 key-frame decoder.

Evidence model: the container's system libwebp is the reference C
implementation of RFC 6386, so every decode is pinned BIT-EXACT
against it — YUV planes (pre- and post-loop-filter, via the advanced
API's ``bypass_filtering``) and fancy-upsampled RGB. Arithmetic-coded
streams make this an unusually strong oracle: a single wrong
probability, tree leaf, predictor pixel, or filter clamp desyncs the
bool decoder and corrupts whole macroblock rows, so exact equality
over varied content is evidence the ENTIRE pipeline (header /
segmentation / modes / tokens / dequant / WHT / DCT / intra
prediction / loop filter) is right, not just the happy path.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cerberus_cpp_spark.sources import libwebp
from cerberus_cpp_spark.sources.vp8codec import (
    VP8Error,
    decode_vp8_rgb,
    decode_vp8_yuv,
    yuv420_to_rgb,
)
from cerberus_cpp_spark.sources.webpcodec import lossy_vp8_stub

needs_libwebp = pytest.mark.skipif(
    not libwebp.available(), reason="system libwebp absent")


def vp8_payload(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        fourcc = webp[pos:pos + 4]
        (size,) = struct.unpack("<I", webp[pos + 4:pos + 8])
        if fourcc == b"VP8 ":
            return webp[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def content(kind: str, h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "noise":
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "sin":
        return np.dstack(
            [(128 + 50 * np.sin(xx / 5 + s) * np.cos(yy / 7 + s))
             .astype(np.uint8) for s in (0, 1, 2)])
    if kind == "edges":
        return np.dstack([(255 * ((xx // 8 + yy // 8) % 2))
                          .astype(np.uint8)] * 3)
    if kind == "grad":
        return np.dstack([
            ((xx * 255) // max(w - 1, 1)).astype(np.uint8),
            ((yy * 255) // max(h - 1, 1)).astype(np.uint8),
            np.full((h, w), 77, np.uint8)])
    raise AssertionError(kind)


SIZES = [(16, 16), (17, 23), (48, 32), (15, 15), (64, 48), (8, 8),
         (33, 49)]
QUALITIES = (5, 40, 75, 95)
KINDS = ("noise", "sin", "edges", "grad")


@needs_libwebp
@pytest.mark.parametrize("h,w", SIZES)
@pytest.mark.parametrize("q", QUALITIES)
def test_yuv_bit_exact_vs_libwebp(h, w, q):
    """Full-pipeline YUV conformance across sizes x qualities x
    content families (segmentation on/off, i16 + B_PRED modes, dense
    high-band tokens, loop-filter levels all vary with q/content)."""
    for kind in KINDS:
        img = content(kind, h, w, h * 31 + w * 7 + q)
        data = libwebp.encode_rgba(img, q)
        ry, ru, rv = libwebp.decode_yuv(data)
        y, u, v = decode_vp8_yuv(vp8_payload(data))
        assert np.array_equal(y, ry), (kind, "Y")
        assert np.array_equal(u, ru), (kind, "U")
        assert np.array_equal(v, rv), (kind, "V")


@needs_libwebp
def test_prefilter_stage_isolated():
    """The reconstruction BEFORE the loop filter also matches
    (advanced-API bypass_filtering) — pins the filter and the recon
    stages independently, so a future regression localizes."""
    from cerberus_cpp_spark.sources import vp8codec as V

    img = content("sin", 48, 32, 9)
    data = libwebp.encode_rgba(img, 60)
    ry, ru, rv = libwebp.decode_yuv_ex(data, bypass_filtering=True)
    hdr, bd, parts = V._parse_frame(vp8_payload(data))
    mbs = V._parse_modes(hdr, bd)
    V._parse_residuals(hdr, mbs, parts)
    Y, U, Vp = V._reconstruct(hdr, mbs)
    h, w = img.shape[:2]
    assert np.array_equal(Y[:h, :w], ry)
    assert np.array_equal(U[:(h + 1) // 2, :(w + 1) // 2], ru)
    assert np.array_equal(Vp[:(h + 1) // 2, :(w + 1) // 2], rv)
    # and the filtered output still differs (the filter did work here)
    fy, _, _ = libwebp.decode_yuv(data)
    assert not np.array_equal(fy, ry)


@needs_libwebp
@pytest.mark.parametrize("h,w", [(16, 16), (17, 23), (48, 32), (8, 8)])
def test_rgb_bit_exact_vs_libwebp(h, w):
    """decode_vp8_rgb == WebPDecodeRGBA (fancy upsampler + 6-bit
    fixed-point YUV matrix), alpha dropped."""
    for q in (40, 90):
        img = content("noise", h, w, q)
        data = libwebp.encode_rgba(img, q)
        ref = libwebp.decode_rgba(data)[..., :3]
        assert np.array_equal(decode_vp8_rgb(vp8_payload(data)), ref)


@needs_libwebp
def test_upsampler_unit_against_libwebp():
    """yuv420_to_rgb alone reproduces libwebp's RGB from libwebp's
    own YUV planes (isolates the upsampler+matrix from the decoder)."""
    img = content("grad", 33, 49, 1)
    data = libwebp.encode_rgba(img, 70)
    y, u, v = libwebp.decode_yuv(data)
    ref = libwebp.decode_rgba(data)[..., :3]
    assert np.array_equal(yuv420_to_rgb(y, u, v), ref)


def test_error_contract():
    with pytest.raises(VP8Error):
        decode_vp8_yuv(b"\x00" * 5)                    # too short
    with pytest.raises(VP8Error):
        # interframe tag (bit0 = 1)
        decode_vp8_yuv(b"\x01\x00\x00" + b"\x9d\x01\x2a"
                       + struct.pack("<HH", 16, 16) + b"\x00" * 32)
    with pytest.raises(VP8Error):
        # bad start code
        decode_vp8_yuv(b"\x00\x00\x00" + b"\xff\x01\x2a"
                       + struct.pack("<HH", 16, 16) + b"\x00" * 32)
    # the planted stub's empty first partition is rejected, keeping
    # its decode_unsupported routing intact
    with pytest.raises(VP8Error):
        decode_vp8_yuv(vp8_payload(lossy_vp8_stub(16, 16)))


@needs_libwebp
def test_truncation_raises_or_differs():
    """Truncating the payload must never be silently accepted as the
    original image (the zero-fill overrun is bounded)."""
    img = content("sin", 32, 32, 2)
    data = libwebp.encode_rgba(img, 80)
    payload = vp8_payload(data)
    ry, _, _ = libwebp.decode_yuv(data)
    try:
        y, _, _ = decode_vp8_yuv(payload[:len(payload) // 3])
    except VP8Error:
        return
    assert not np.array_equal(y, ry)


@needs_libwebp
def test_in_repo_decode_without_libwebp(monkeypatch):
    """The whole lossy path runs WITHOUT the system library: capture
    the reference first, then unplug libwebp and decode in-repo."""
    from cerberus_cpp_spark.sources.webpcodec import decode_webp_any

    img = content("sin", 33, 49, 4)
    data = libwebp.encode_rgba(img, 85)
    ref = libwebp.decode_rgba(data)[..., :3]
    monkeypatch.setattr(libwebp, "_lib", None)
    monkeypatch.setattr(libwebp, "_load_failed", True)
    assert not libwebp.available()
    assert np.array_equal(decode_webp_any(data), ref)
