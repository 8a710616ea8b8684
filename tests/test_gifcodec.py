"""In-repo GIF codec: LZW + interlace + composition semantics.

Evidence model mirrors the other codecs: exact roundtrip (GIF is
lossless), hand-planted disposal/transparency composition cases
verified against independent numpy compositing, a hypothesis sweep,
and the LZW 4096-entry dictionary-reset path. ImageIO interop lives
in ``test_gif_interop.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from cerberus_cpp_spark.sources import gifcodec as G
from cerberus_cpp_spark.sources.imagegen import pixel_seed, synth_pixels


def _palette_image(seed: int, h: int, w: int, n_colors: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    return pal[rng.randint(0, n_colors, (h, w))]


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("dims", [(1, 1), (7, 5), (17, 29), (33, 9)])
def test_static_roundtrip(interlace, dims):
    rgb = _palette_image(dims[0] * 7 + dims[1], *dims, n_colors=19)
    blob = G.encode_gif(rgb, interlace=interlace)
    assert np.array_equal(G.decode_gif(blob), rgb)
    assert G.gif_header_info(blob) == (dims[1], dims[0])


def test_gradient_roundtrip():
    px = synth_pixels(pixel_seed(3, 42), 12, 9)
    assert np.array_equal(G.decode_gif(G.encode_gif(px)), px)


def test_exact_256_colors_and_overflow():
    pal = np.array([[i, 255 - i, (i * 7) % 256] for i in range(256)],
                   np.uint8)
    rgb = pal[np.arange(256).reshape(16, 16)]
    assert np.array_equal(G.decode_gif(G.encode_gif(rgb)), rgb)
    bad = np.zeros((17, 17, 3), np.uint8)
    bad[..., 0] = (np.arange(289) % 256).reshape(17, 17)
    bad[..., 1] = (np.arange(289) // 256).reshape(17, 17) * 90
    with pytest.raises(ValueError, match="palette"):
        G.encode_gif(bad)


def test_lzw_dictionary_reset():
    """A large high-entropy indexed image pushes the LZW dictionary
    past 4096 entries — the encoder must emit CLEAR and the decoder
    must rebuild, still bit-exact."""
    rgb = _palette_image(9, 120, 120, n_colors=200)
    assert np.array_equal(G.decode_gif(G.encode_gif(rgb)), rgb)


def test_animation_composition_disposal_transparency():
    rng = np.random.RandomState(4)
    pal = rng.randint(0, 256, (23, 3)).astype(np.uint8)
    base = pal[rng.randint(0, 23, (10, 12))]
    patch = pal[rng.randint(0, 23, (4, 6))]
    mask = np.zeros((4, 6), bool)
    mask[1:3, 2:4] = True
    top = pal[rng.randint(0, 23, (5, 5))]
    blob = G.encode_gif_anim([
        G.GifFrame(base, delay_cs=5, disposal=1),
        G.GifFrame(patch, delay_cs=7, x=3, y=2, disposal=2,
                   transparent_mask=mask),
        G.GifFrame(top, delay_cs=9, x=1, y=1, disposal=3),
    ], loop_count=0)
    frames = G.decode_gif_frames(blob)
    assert [d for _, d in frames] == [5, 7, 9]
    canvas = np.zeros((10, 12, 4), np.uint8)
    canvas[..., :3] = base
    canvas[..., 3] = 255
    assert np.array_equal(frames[0][0], canvas)
    c1 = canvas.copy()
    rect = c1[2:6, 3:9]
    rect[~mask, :3] = patch[~mask]
    rect[~mask, 3] = 255
    assert np.array_equal(frames[1][0], c1)
    c2 = c1.copy()
    c2[2:6, 3:9] = 0                    # disposal 2 after frame 1
    c2[1:6, 1:6, :3] = top
    c2[1:6, 1:6, 3] = 255
    assert np.array_equal(frames[2][0], c2)


def test_disposal_restore_previous():
    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (9, 3)).astype(np.uint8)
    base = pal[rng.randint(0, 9, (8, 8))]
    mid = pal[rng.randint(0, 9, (4, 4))]
    last = pal[rng.randint(0, 9, (2, 2))]
    blob = G.encode_gif_anim([
        G.GifFrame(base, disposal=1),
        G.GifFrame(mid, x=2, y=2, disposal=3),  # restore-previous
        G.GifFrame(last, x=0, y=0, disposal=1),
    ])
    frames = G.decode_gif_frames(blob)
    # after frame 2 disposed, frame 3 composes over the ORIGINAL base
    expect = frames[0][0].copy()
    expect[0:2, 0:2, :3] = last
    assert np.array_equal(frames[2][0], expect)


def test_truncated_and_garbage_raise():
    rgb = _palette_image(2, 9, 11, n_colors=7)
    blob = G.encode_gif(rgb)
    with pytest.raises(ValueError):
        G.decode_gif(blob[:-5])
    with pytest.raises(ValueError):
        G.decode_gif(b"GIF89a" + b"\x00" * 4)
    with pytest.raises(ValueError):
        G.decode_gif(b"NOTAGIF00000")
    with pytest.raises(ValueError):
        G.encode_gif_anim([])
    with pytest.raises(ValueError):
        G.encode_gif_anim([G.GifFrame(rgb, delay_cs=1 << 16)])
    with pytest.raises(ValueError):
        G.encode_gif_anim([G.GifFrame(rgb, disposal=4)])


def test_decode_image_integration():
    from cerberus_cpp_spark.sources.imagegen import (
        decode_image,
        image_header_info,
        sniff_format,
    )

    px = synth_pixels(pixel_seed(5, 42), 10, 8)
    blob = G.encode_gif(px)
    assert sniff_format(blob) == "gif"
    fmt, dec = decode_image(blob)
    assert fmt == "gif" and np.array_equal(dec, px)
    assert image_header_info(blob) == ("gif", 10, 8)


def test_hypothesis_anim_sweep():
    """Random low-color frames / offsets / disposal / transparency:
    container roundtrip vs an INDEPENDENT numpy composition."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frame_st = st.tuples(
        st.integers(1, 8), st.integers(1, 8),    # fh, fw
        st.integers(0, 4), st.integers(0, 4),    # x, y
        st.integers(0, 2 ** 16),                 # seed
        st.integers(0, 3),                       # disposal
        st.booleans(),                           # transparency
        st.integers(0, 500),                     # delay
    )

    @settings(max_examples=25, deadline=None)
    @given(frames=st.lists(frame_st, min_size=1, max_size=4))
    def case(frames):
        specs = []
        for fh, fw, x, y, seed, disp, transp, delay in frames:
            rng = np.random.RandomState(seed)
            pal = rng.randint(0, 256, (5, 3)).astype(np.uint8)
            rgb = pal[rng.randint(0, 5, (fh, fw))]
            mask = (rng.randint(0, 2, (fh, fw)).astype(bool)
                    if transp else None)
            specs.append(G.GifFrame(rgb, delay_cs=delay, x=x, y=y,
                                    disposal=disp,
                                    transparent_mask=mask))
        cw = max(f.x + f.rgb.shape[1] for f in specs)
        ch = max(f.y + f.rgb.shape[0] for f in specs)
        decoded = G.decode_gif_frames(
            G.encode_gif_anim(specs, canvas=(cw, ch)))
        assert len(decoded) == len(specs)
        canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
        for f, (got, delay) in zip(specs, decoded):
            fh, fw = f.rgb.shape[:2]
            before = canvas.copy()
            sub = canvas[f.y:f.y + fh, f.x:f.x + fw]
            opaque = (~f.transparent_mask if f.transparent_mask
                      is not None else np.ones((fh, fw), bool))
            sub[opaque, :3] = f.rgb[opaque]
            sub[opaque, 3] = 255
            assert delay == f.delay_cs
            assert np.array_equal(got, canvas)
            if f.disposal == 2:
                canvas[f.y:f.y + fh, f.x:f.x + fw] = 0
            elif f.disposal == 3:
                canvas = before

    case()
