"""Baseline JPEG codec (sources/jpegcodec.py): round-trip fidelity,
quality monotonicity, restart markers, malformed-stream rejection,
and the imagegen wiring (sniff/encode/decode dispatch)."""

import numpy as np
import pytest

from cerberus_cpp_spark.sources.imagegen import (
    JPEG_QUALITY,
    decode_image,
    encode_image,
    pixel_seed,
    psnr,
    sniff_format,
    synth_pixels,
)
from cerberus_cpp_spark.sources.jpegcodec import decode_jpeg, encode_jpeg


@pytest.mark.parametrize("w,h", [(8, 8), (9, 8), (16, 14), (33, 17),
                                 (64, 64), (1, 1), (7, 3)])
def test_roundtrip_psnr_over_gate(w, h):
    px = synth_pixels(pixel_seed(w * 100 + h), w, h)
    data = encode_jpeg(px, quality=98)
    dec = decode_jpeg(data)
    assert dec.shape == (h, w, 3)
    assert psnr(px, dec) >= 40.0


def test_quality_monotone_in_size_and_psnr():
    px = synth_pixels(pixel_seed(5), 48, 40)
    sizes, psnrs = [], []
    for q in (50, 75, 92, 98):
        d = encode_jpeg(px, quality=q)
        sizes.append(len(d))
        psnrs.append(psnr(px, decode_jpeg(d)))
    assert sizes == sorted(sizes)
    assert psnrs == sorted(psnrs)


def test_smooth_content_high_fidelity():
    # a genuinely smooth ramp (no mod-256 wrap): mid-quality jpeg
    # should be near-transparent
    xs = np.linspace(40, 200, 64)
    ys = np.linspace(60, 180, 48)
    px = np.stack([
        np.add.outer(ys * 0.5, xs * 0.5),
        np.add.outer(ys * 0.3, xs * 0.6),
        np.add.outer(ys * 0.2, xs * 0.4),
    ], axis=-1).astype(np.uint8)
    d = encode_jpeg(px, quality=85)
    assert psnr(px, decode_jpeg(d)) >= 40.0


def test_restart_interval_roundtrip():
    px = synth_pixels(pixel_seed(9), 40, 24)  # 5x3 = 15 MCUs
    plain = encode_jpeg(px, quality=95)
    rst = encode_jpeg(px, quality=95, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_is_real_jfif_stream():
    d = encode_jpeg(synth_pixels(1, 16, 16))
    assert d[:3] == b"\xff\xd8\xff"
    assert d[6:11] == b"JFIF\x00"
    assert d[-2:] == b"\xff\xd9"


def test_truncated_stream_rejected():
    d = encode_jpeg(synth_pixels(2, 32, 32), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(d[: len(d) * 2 // 3])


def test_sequential_scan_under_progressive_frame_rejected():
    # progressive (SOF2) is SUPPORTED (interop tests decode Java's
    # progressive output); a full-band Ss=0..63 scan under a SOF2
    # frame is still malformed and must fail cleanly
    d = bytearray(encode_jpeg(synth_pixels(3, 16, 16)))
    sof = d.find(b"\xff\xc0")
    d[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive scan"):
        decode_jpeg(bytes(d))


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8" + b"\x00" * 20)


def test_imagegen_dispatch_uses_real_jpeg():
    data = encode_image(pixel_seed(4), 12, 10, "jpeg")
    assert sniff_format(data) == "jpeg"
    assert data[:3] == b"\xff\xd8\xff"
    fmt, px = decode_image(data)
    assert fmt == "jpeg"
    ref = synth_pixels(pixel_seed(4), 12, 10)
    assert px.shape == ref.shape
    assert psnr(ref, px) >= 40.0


def test_default_quality_holds_gate_across_seed_family():
    worst = 99.0
    for i in range(25):
        w, h = 8 + i % 9, 8 + i % 7  # the fixtures' thumb geometry
        ref = synth_pixels(pixel_seed(i), w, h)
        _, px = decode_image(encode_image(pixel_seed(i), w, h, "jpeg"))
        worst = min(worst, psnr(ref, px))
    assert worst >= 40.0, worst
    assert JPEG_QUALITY == 98


# -- property-based roundtrip (hypothesis) ----------------------------------

try:
    from hypothesis import given, settings, strategies as st

    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        quality=st.integers(70, 100),
    )
    @settings(max_examples=60, deadline=None)
    def test_property_roundtrip_any_dims(w, h, seed, quality):
        px = synth_pixels(seed, w, h)
        dec = decode_jpeg(encode_jpeg(px, quality=quality))
        assert dec.shape == (h, w, 3)
        # the invariant is structural (dims/channels/no crash) plus a
        # VERY loose fidelity floor: hypothesis found a real 18 dB
        # case (2x2 image whose mod-256 gradient wrap lands on a
        # quantized discontinuity at q70) — legitimate jpeg behavior,
        # so the floor only guards against gross corruption
        assert psnr(px, dec) >= 13.0

    @given(data=st.binary(min_size=0, max_size=300))
    @settings(max_examples=120, deadline=None)
    def test_property_arbitrary_bytes_never_crash(data):
        try:
            decode_jpeg(b"\xff\xd8\xff" + data)
        except ValueError:
            pass
except ImportError:  # hypothesis not installed
    pass


def test_uncovered_component_rejected():
    """A stream whose scans never code some frame component must
    raise, not render silent neutral-gray chroma from all-zero
    coefficients (review finding). The guard lives in _finish; a
    byte-exact Y-only 3-component stream can't be crafted from our
    encoder (entropy layout mismatch raises earlier, also fine), so
    the guard is pinned at its own seam."""
    from cerberus_cpp_spark.sources.jpegcodec import (
        _finish,
        _Frame,
        quality_tables,
    )

    qy, qc = quality_tables(90)
    fr = _Frame(16, 16, [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)],
                progressive=False)
    fr.touched = {0}  # only Y was ever coded
    with pytest.raises(ValueError, match="no scan coded"):
        _finish(fr, {0: qy, 1: qc})
    fr.touched = {0, 1, 2}
    assert _finish(fr, {0: qy, 1: qc}).shape == (16, 16, 3)
