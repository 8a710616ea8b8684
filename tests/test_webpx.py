"""Conformance suite for extended WebP (VP8X / ALPH / ANIM).

Evidence model, mirroring ``test_vp8codec.py``: the system libwebp is
the reference implementation of RFC 9649's container layer, so

- its own lossy-RGBA output (real ``VP8X+ALPH+VP8`` files, with
  whatever alpha filter/compression IT chose) must decode bit-exactly
  through the in-repo path, and
- every (filter × compression) combination OUR encoder emits must
  decode to the original alpha through libwebp — two independent
  implementations agreeing in both directions pins the bit layout.

Animation has no native demuxer in this container (libwebp.so only),
so ANIM composition is covered by encoder↔decoder roundtrips against
numpy-computed expected canvases, with ``WebPGetFeatures`` validating
the muxed extended headers.
"""

from __future__ import annotations

import numpy as np
import pytest

from cerberus_cpp_spark.sources import libwebp, webpx
from cerberus_cpp_spark.sources.webpx import (
    AnimFrame,
    decode_alph,
    decode_webp_frames,
    decode_webp_rgba,
    decode_webp_rgba_any,
    encode_alph,
    encode_webp_anim,
    encode_webp_lossless_rgba,
    encode_webp_vp8x,
    webp_features,
)

needs_libwebp = pytest.mark.skipif(
    not libwebp.available(), reason="system libwebp absent")


def rgba(h: int, w: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 4), dtype=np.uint8)


def alpha_plane(kind: str, h: int, w: int, seed: int = 0) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "noise":
        return np.random.RandomState(seed).randint(
            0, 256, (h, w), dtype=np.uint8)
    if kind == "gradient":  # smooth — what the gradient filter targets
        return ((xx * 7 + yy * 11) % 256).astype(np.uint8)
    if kind == "constant":
        return np.full((h, w), 201, dtype=np.uint8)
    if kind == "binary":  # hard cutout mask
        return (255 * ((xx // 3 + yy // 5) % 2)).astype(np.uint8)
    raise AssertionError(kind)


# ---------------------------------------------------------------------------
# direction 1: libwebp-authored VP8X+ALPH files → in-repo decode
# ---------------------------------------------------------------------------


@needs_libwebp
@pytest.mark.parametrize("h,w,seed", [
    (21, 34, 7), (16, 16, 1), (1, 40, 2), (33, 1, 3), (47, 29, 4)])
def test_libwebp_lossy_alpha_bit_exact(h, w, seed):
    px = rgba(h, w, seed)
    data = libwebp.encode_rgba(px, quality=85.0)
    assert data[12:16] == b"VP8X"  # alpha forces the extended format
    ours = decode_webp_rgba(data)
    theirs = libwebp.decode_rgba(data)
    assert np.array_equal(ours, theirs)
    # alpha is losslessly coded: must equal the source exactly
    assert np.array_equal(ours[..., 3], px[..., 3])


@needs_libwebp
@pytest.mark.parametrize("kind", ["noise", "gradient", "constant",
                                  "binary"])
def test_libwebp_alpha_content_shapes(kind):
    # different alpha content steers libwebp toward different
    # filter/compression choices; all must decode identically
    px = rgba(24, 31, 9)
    px[..., 3] = alpha_plane(kind, 24, 31)
    data = libwebp.encode_rgba(px, quality=75.0)
    assert np.array_equal(decode_webp_rgba(data),
                          libwebp.decode_rgba(data))


# ---------------------------------------------------------------------------
# direction 2: in-repo ALPH encoder → libwebp oracle (all 8 combos)
# ---------------------------------------------------------------------------


@needs_libwebp
@pytest.mark.parametrize("comp", [0, 1])
@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_alph_all_modes_vs_libwebp(comp, filt):
    px = rgba(21, 34, 7)
    px[..., 3] = alpha_plane("gradient", 21, 34)
    data = encode_webp_vp8x(px, lossy=True, alpha_compression=comp,
                            alpha_filtering=filt)
    lw = libwebp.decode_rgba(data)
    assert np.array_equal(lw[..., 3], px[..., 3])  # alpha exact
    assert np.array_equal(decode_webp_rgba(data), lw)  # full RGBA


def test_alph_chunk_roundtrip_without_container():
    plane = alpha_plane("noise", 13, 17, seed=5)
    for comp in (0, 1):
        for filt in (0, 1, 2, 3):
            body = encode_alph(plane, compression=comp, filtering=filt)
            assert np.array_equal(decode_alph(body, 17, 13), plane)


def test_alph_rejects_bad_input():
    with pytest.raises(ValueError):
        decode_alph(b"", 4, 4)
    with pytest.raises(ValueError):
        decode_alph(bytes([2]) + b"\x00" * 16, 4, 4)  # reserved comp
    with pytest.raises(ValueError):
        decode_alph(bytes([0]) + b"\x00" * 3, 4, 4)  # short raw plane
    with pytest.raises(ValueError):
        encode_alph(np.zeros((4, 4), np.uint8), compression=3)
    with pytest.raises(ValueError):
        encode_alph(np.zeros((4, 4), np.uint8), filtering=9)


# ---------------------------------------------------------------------------
# lossless RGBA (VP8L with a live alpha channel)
# ---------------------------------------------------------------------------


@needs_libwebp
def test_lossless_rgba_roundtrip_and_oracle():
    px = rgba(19, 23, 11)
    data = encode_webp_lossless_rgba(px)
    assert np.array_equal(decode_webp_rgba(data), px)
    assert np.array_equal(libwebp.decode_rgba(data), px)


@needs_libwebp
def test_vp8x_wrapped_lossless():
    px = rgba(10, 14, 3)
    data = encode_webp_vp8x(px, lossy=False)
    assert data[12:16] == b"VP8X"
    assert np.array_equal(decode_webp_rgba(data), px)
    assert np.array_equal(libwebp.decode_rgba(data), px)


# ---------------------------------------------------------------------------
# container features vs WebPGetFeatures
# ---------------------------------------------------------------------------


@needs_libwebp
def test_features_match_libwebp():
    from cerberus_cpp_spark.sources.vp8enc import encode_webp_vp8
    from cerberus_cpp_spark.sources.webpcodec import encode_webp

    px = rgba(18, 27, 13)
    payloads = [
        encode_webp(px[..., :3]),                    # bare VP8L
        encode_webp_vp8(px[..., :3]),                # bare VP8
        encode_webp_lossless_rgba(px),               # VP8L + alpha
        encode_webp_vp8x(px, lossy=True),            # VP8X+ALPH+VP8
        encode_webp_vp8x(px, lossy=False),           # VP8X+VP8L
        libwebp.encode_rgba(px, quality=70.0),       # libwebp-muxed
        encode_webp_anim([AnimFrame(px, 30)]),       # animated
    ]
    for data in payloads:
        ours = webp_features(data)
        theirs = libwebp.features(data)
        for k in ("width", "height", "has_alpha", "has_animation"):
            assert ours[k] == theirs[k], (k, ours, theirs)
    anim = payloads[-1]
    assert webp_features(anim)["frame_count"] == 1


@needs_libwebp
@pytest.mark.parametrize("lossy", [False, True])
def test_metadata_chunks_mux_extract(lossy):
    """ICCP/EXIF/XMP mux in RFC order with VP8X flags set; libwebp
    still parses the header and decodes identically with metadata
    chunks present; extract_metadata returns the raw payloads."""
    from cerberus_cpp_spark.sources.webpx import extract_metadata

    px = rgba(11, 13, 5)
    icc, exif, xmp = b"fake-icc" * 4, b"Exif\x00\x00d", b"<x:xmpmeta/>"
    blob = encode_webp_vp8x(px, lossy=lossy, icc=icc, exif=exif,
                            xmp=xmp)
    f = webp_features(blob)
    assert f["has_icc"] and f["has_exif"] and f["has_xmp"]
    assert extract_metadata(blob) == {"icc": icc, "exif": exif,
                                      "xmp": xmp}
    ours = decode_webp_rgba(blob)
    assert np.array_equal(libwebp.decode_rgba(blob), ours)
    if not lossy:
        assert np.array_equal(ours, px)
    bare = encode_webp_vp8x(px, lossy=lossy)
    fb = webp_features(bare)
    assert not (fb["has_icc"] or fb["has_exif"] or fb["has_xmp"])
    assert extract_metadata(bare) == {"icc": None, "exif": None,
                                      "xmp": None}


# ---------------------------------------------------------------------------
# animation mux / demux
# ---------------------------------------------------------------------------


@needs_libwebp
def test_anim_single_frame_roundtrip():
    px = rgba(12, 16, 21)
    data = encode_webp_anim([AnimFrame(px, 40)])
    assert libwebp.features(data)["has_animation"]
    frames = decode_webp_frames(data)
    assert len(frames) == 1
    assert frames[0][1] == 40
    assert np.array_equal(frames[0][0], px)


def test_anim_overwrite_blend_dispose():
    base = rgba(10, 12, 1)
    patch = rgba(6, 8, 2)
    data = encode_webp_anim([
        AnimFrame(base, 40, blend=False),
        AnimFrame(patch, 60, x=2, y=4, blend=True, dispose=True),
        AnimFrame(patch, 30, x=0, y=0, blend=False),
    ])
    frames = decode_webp_frames(data)
    assert [d for _, d in frames] == [40, 60, 30]

    # frame 0: overwrite onto transparent canvas
    assert np.array_equal(frames[0][0], base)
    # frame 1: alpha-blend patch over the base rect
    exp1 = base.copy()
    exp1[4:10, 2:10] = webpx._blend_rgba(base[4:10, 2:10], patch)
    assert np.array_equal(frames[1][0], exp1)
    # frame 2: the disposed rect went transparent, then the new patch
    # OVERWRITES its own rect at (0, 0)
    exp2 = exp1.copy()
    exp2[4:10, 2:10] = 0
    exp2[0:6, 0:8] = patch
    assert np.array_equal(frames[2][0], exp2)


def test_anim_blend_formula_cases():
    # opaque src over anything == src; transparent src over dst == dst
    dst = rgba(4, 4, 5)
    opaque = rgba(4, 4, 6)
    opaque[..., 3] = 255
    clear = rgba(4, 4, 7)
    clear[..., 3] = 0
    assert np.array_equal(webpx._blend_rgba(dst, opaque), opaque)
    out = webpx._blend_rgba(dst, clear)
    assert np.array_equal(out[..., 3], dst[..., 3])
    # rgb preserved wherever dst has any alpha
    vis = dst[..., 3] > 0
    assert np.array_equal(out[..., :3][vis], dst[..., :3][vis])
    # both transparent → all-zero pixel
    zero = webpx._blend_rgba(clear, clear.copy())
    assert not zero.any()


@needs_libwebp
def test_anim_lossy_frames():
    # ALPH+VP8 inside ANMF: alpha exact, rgb within lossy tolerance.
    # RGB must be SMOOTH content: the minimal VP8 encoder's
    # rate-distortion on white noise is ~12.5 dB (bit-exact vs
    # libwebp's decode of the same stream — that's the noise floor,
    # not a codec bug), while gradients clear 39 dB at q_index=10.
    yy, xx = np.mgrid[0:16, 0:16]
    px = np.empty((16, 16, 4), dtype=np.uint8)
    px[..., 0] = (xx * 3 + yy * 5) % 256
    px[..., 1] = (xx * 2 + yy * 7) % 256
    px[..., 2] = (xx * 6 + yy * 1) % 256
    px[..., 3] = alpha_plane("binary", 16, 16)
    data = encode_webp_anim([AnimFrame(px, 25, blend=False)],
                            lossy=True, q_index=10)
    assert libwebp.features(data)["has_animation"]
    (canvas, dur), = decode_webp_frames(data)
    assert dur == 25
    assert np.array_equal(canvas[..., 3], px[..., 3])
    err = (canvas[..., :3].astype(np.int64)
           - px[..., :3].astype(np.int64))
    psnr = 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-9))
    assert psnr > 25.0  # q_index=10 keyframe


def test_anim_rejects_bad_geometry():
    px = rgba(8, 8, 1)
    with pytest.raises(ValueError):
        encode_webp_anim([AnimFrame(px, 10, x=1)])  # odd offset
    with pytest.raises(ValueError):
        encode_webp_anim([AnimFrame(px, 10, x=-2)])  # negative offset
    with pytest.raises(ValueError):
        # would silently truncate to 0 in the 24-bit field otherwise
        encode_webp_anim([AnimFrame(px, duration_ms=1 << 24)])
    with pytest.raises(ValueError):
        encode_webp_anim([AnimFrame(px, 10)], canvas=(4, 4))
    with pytest.raises(ValueError):
        encode_webp_anim([])


def test_static_rgba_first_frame_for_animation():
    px = rgba(9, 9, 41)
    data = encode_webp_anim([AnimFrame(px, 10), AnimFrame(px, 10)])
    assert np.array_equal(decode_webp_rgba(data), px)


@needs_libwebp
def test_decode_rgba_any_routing():
    px = rgba(14, 14, 51)
    static = encode_webp_vp8x(px, lossy=False)
    assert np.array_equal(decode_webp_rgba_any(static), px)
    anim = encode_webp_anim([AnimFrame(px, 10)])
    # plain libwebp cannot decode animations — the in-repo demuxer
    # must take over transparently
    with pytest.raises(ValueError):
        libwebp.decode_rgba(anim)
    assert np.array_equal(decode_webp_rgba_any(anim), px)


# ---------------------------------------------------------------------------
# property sweep
# ---------------------------------------------------------------------------


@needs_libwebp
def test_hypothesis_alpha_sweep():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        seed=st.integers(0, 2 ** 16),
        comp=st.integers(0, 1), filt=st.integers(0, 3),
    )
    def case(h, w, seed, comp, filt):
        px = rgba(h, w, seed)
        data = encode_webp_vp8x(px, lossy=True, alpha_compression=comp,
                                alpha_filtering=filt)
        lw = libwebp.decode_rgba(data)
        assert np.array_equal(lw[..., 3], px[..., 3])
        assert np.array_equal(decode_webp_rgba(data), lw)

    case()


def test_hypothesis_anim_composition_sweep():
    """Randomized frames/offsets/blend/dispose roundtripped through
    the real container vs an INDEPENDENT numpy composition (the
    source-over formula re-derived here, not imported from webpx) —
    a differential oracle for the ANIM decode path."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def compose(canvas, frame, x, y, blend):
        fh, fw = frame.shape[:2]
        rect = canvas[y:y + fh, x:x + fw].astype(np.float64)
        src = frame.astype(np.float64)
        if not blend:
            canvas[y:y + fh, x:x + fw] = frame
            return canvas
        sa = src[..., 3:] / 255.0
        da = rect[..., 3:] / 255.0
        oa = sa + da * (1.0 - sa)
        rgb = src[..., :3] * sa + rect[..., :3] * da * (1.0 - sa)
        out = np.zeros_like(rect)
        nz = oa[..., 0] > 0
        out[nz, :3] = rgb[nz] / oa[nz]
        out[..., 3:] = oa * 255.0
        canvas[y:y + fh, x:x + fw] = np.rint(out).astype(np.uint8)
        return canvas

    frame_st = st.tuples(
        st.integers(1, 10), st.integers(1, 10),       # fh, fw
        st.integers(0, 3), st.integers(0, 3),         # x/2, y/2
        st.integers(0, 2 ** 16),                      # seed
        st.booleans(), st.booleans(),                 # blend, dispose
        st.integers(0, 1000),                         # duration
    )

    @settings(max_examples=25, deadline=None)
    @given(frames=st.lists(frame_st, min_size=1, max_size=5))
    def case(frames):
        specs = []
        for fh, fw, x2, y2, seed, blend, dispose, dur in frames:
            specs.append(AnimFrame(
                rgba=rgba(fh, fw, seed), duration_ms=dur,
                x=2 * x2, y=2 * y2, blend=blend, dispose=dispose))
        cw = max(f.x + f.rgba.shape[1] for f in specs)
        ch = max(f.y + f.rgba.shape[0] for f in specs)
        blob = encode_webp_anim(specs, canvas=(cw, ch))
        decoded = decode_webp_frames(blob)
        assert len(decoded) == len(specs)
        canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
        for f, (got, dur) in zip(specs, decoded):
            canvas = compose(canvas, f.rgba, f.x, f.y, f.blend)
            assert dur == f.duration_ms
            assert np.array_equal(got, canvas)
            if f.dispose:
                fh, fw = f.rgba.shape[:2]
                canvas[f.y:f.y + fh, f.x:f.x + fw] = 0

    case()
