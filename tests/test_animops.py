"""Animated-WebP validation leg: the deterministic clip generator
(``sources/animgen.py``), the per-frame operator
(``multimodal.animation_frames``), the ``decode_webp_any`` animation
routing, and the ``img_anim_frames`` contract query's plants.

Reference parity anchor: cerberus-cpp's custom-type equality op
(types.hh:41-48) promoted to per-frame pixel equality — the animation
analogue of the still-image fidelity invariant.
"""

from __future__ import annotations

import numpy as np
import pytest

from cerberus_cpp_spark.sources import animgen
from cerberus_cpp_spark.sources.webpx import (
    anim_frame_infos,
    decode_webp_frames,
    decode_webp_subframes,
    webp_features,
)


# ---------------------------------------------------------------------------
# generator / codec layer (no Spark)
# ---------------------------------------------------------------------------


def test_payload_structure_matches_spec():
    for i in (0, 1, 2, 3, 7, 29, 60, 97):
        blob = animgen.anim_payload(i)
        feats = webp_features(blob)
        cw, ch = animgen.canvas_dims(i)
        assert feats["has_animation"]
        assert (feats["width"], feats["height"]) == (cw, ch)
        assert feats["frame_count"] == animgen.n_frames(i)
        for fi, info in enumerate(anim_frame_infos(blob)):
            spec = animgen.frame_spec(i, fi)
            assert info == {k: spec[k] for k in info}


def test_subframes_roundtrip_exact():
    """Lossless VP8L frames: decoded raw subframes equal the
    reference synthesis byte-for-byte (no mismatch plant at i=6)."""
    i = 6
    frames = decode_webp_subframes(animgen.anim_payload(i))
    refs = animgen.reference_subframes(i)
    assert len(frames) == len(refs)
    for fr, ref in zip(frames, refs):
        assert np.array_equal(fr, ref)


def test_mismatch_plant_flags_only_frame_one():
    i = 13
    assert i % animgen.MISMATCH_EVERY == animgen.MISMATCH_RESIDUE
    frames = decode_webp_subframes(animgen.anim_payload(i))
    refs = animgen.reference_subframes(i)
    eq = [np.array_equal(f, r) for f, r in zip(frames, refs)]
    assert eq[1] is False
    assert all(eq[:1] + eq[2:])


def test_truncated_plant_raises():
    i = 11
    assert i % animgen.TRUNC_EVERY == animgen.TRUNC_RESIDUE
    blob = animgen.anim_payload(i)
    with pytest.raises(ValueError):
        decode_webp_subframes(blob)
    with pytest.raises(ValueError):
        decode_webp_frames(blob)


def test_plant_residues_disjoint():
    """The two planted families never collide (a truncated clip
    could not also assert its mismatch row)."""
    hits = [i % 60 for i in range(60)
            if i % animgen.TRUNC_EVERY == animgen.TRUNC_RESIDUE
            and i % animgen.MISMATCH_EVERY == animgen.MISMATCH_RESIDUE]
    assert hits == []


def test_decode_webp_any_composes_first_frame():
    """Animated containers route through decode_image: first
    COMPOSED canvas, RGB — not the raw first subframe (offsets /
    canvas background matter when frame 0 doesn't cover the
    canvas)."""
    from cerberus_cpp_spark.sources.imagegen import decode_image

    i = 2  # frame 0 at a nonzero offset on a larger canvas
    spec = animgen.frame_spec(i, 0)
    cw, ch = animgen.canvas_dims(i)
    assert (spec["w"], spec["h"]) != (cw, ch)
    blob = animgen.anim_payload(i)
    fmt, px = decode_image(blob)
    assert fmt == "webp"
    composed = decode_webp_frames(blob)[0][0][..., :3]
    assert px.shape == (ch, cw, 3)
    assert np.array_equal(px, composed)


def test_vp8x_still_payload_families():
    """The alpha-census still families: container variant, alpha
    flag, and full RGBA decodability per id arithmetic."""
    from cerberus_cpp_spark.sources.webpx import (
        decode_webp_rgba_any,
        webp_features,
    )

    for i in range(0, 16):
        blob = animgen.vp8x_still_payload(i)
        f = webp_features(blob)
        fam = i % 4
        assert f["variant"] == ("VP8L" if fam in (0, 1) else "VP8X")
        assert f["has_alpha"] == (fam != 0)
        assert not f["has_animation"]
        px = decode_webp_rgba_any(blob)
        assert px.shape == (8 + i % 7, 8 + i % 9, 4)
        if fam != 3:  # lossless families roundtrip exactly
            from cerberus_cpp_spark.sources.imagegen import (
                pixel_seed,
                synth_pixels,
            )

            ps = pixel_seed(i, 42)
            assert np.array_equal(
                px[..., :3], synth_pixels(ps, 8 + i % 9, 8 + i % 7))


def test_subframes_static_payload_single_frame():
    from cerberus_cpp_spark.sources.webpx import encode_webp_vp8x

    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    frames = decode_webp_subframes(encode_webp_vp8x(rgba, lossy=False))
    assert len(frames) == 1 and np.array_equal(frames[0], rgba)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------


N = 180  # covers all residues mod 60 three times


@pytest.fixture(scope="module")
def anim_rows(spark):
    from cerberus_cpp_spark.operators.multimodal import animation_frames
    from cerberus_cpp_spark.sources.animgen import anim_clip_frame

    clips = anim_clip_frame(spark, N, partitions=4)
    return animation_frames(clips, reference="animgen").toPandas()


def test_operator_row_count_and_skip(anim_rows):
    expect = sum(animgen.n_frames(i) for i in range(N)
                 if i % animgen.TRUNC_EVERY != animgen.TRUNC_RESIDUE)
    assert len(anim_rows) == expect
    skipped = {f"img-{i:012d}" for i in range(N)
               if i % animgen.TRUNC_EVERY == animgen.TRUNC_RESIDUE}
    assert skipped.isdisjoint(set(anim_rows["image_id"]))


def test_operator_headers_match_spec(anim_rows):
    for row in anim_rows.itertuples(index=False):
        i = int(row.image_id.rsplit("-", 1)[-1])
        spec = animgen.frame_spec(i, int(row.frame_idx))
        cw, ch = animgen.canvas_dims(i)
        assert (row.duration_ms, row.frame_w, row.frame_h) == (
            spec["duration_ms"], spec["w"], spec["h"])
        assert (row.canvas_w, row.canvas_h) == (cw, ch)


def test_operator_pixels_ok_exactly_the_plant(anim_rows):
    bad = anim_rows[~anim_rows["pixels_ok"]]
    expect = {(f"img-{i:012d}", 1) for i in range(N)
              if i % animgen.MISMATCH_EVERY == animgen.MISMATCH_RESIDUE
              and i % animgen.TRUNC_EVERY != animgen.TRUNC_RESIDUE}
    assert set(zip(bad["image_id"], bad["frame_idx"])) == expect


def test_operator_without_reference_nulls(spark):
    from cerberus_cpp_spark.operators.multimodal import animation_frames
    from cerberus_cpp_spark.sources.animgen import anim_clip_frame

    clips = anim_clip_frame(spark, 12, partitions=2)
    pdf = animation_frames(clips).toPandas()
    assert pdf["pixels_ok"].isna().all()
    assert len(pdf) == sum(
        animgen.n_frames(i) for i in range(12)
        if i % animgen.TRUNC_EVERY != animgen.TRUNC_RESIDUE)


def test_operator_foreign_id_unverifiable(spark):
    """A clip whose image_id is not animgen's 'img-%012d' family —
    including one that merely ENDS in digits — must come back with
    pixels_ok NULL (unverifiable), never a comparison against the
    wrong clip's reference."""
    from cerberus_cpp_spark.operators.multimodal import animation_frames

    blob = animgen.anim_payload(7)
    df = spark.createDataFrame(
        [("backup-000000000007", bytearray(blob)),
         ("weird id", bytearray(blob)),
         ("img-000000000007", bytearray(blob))],
        "image_id string, bytes binary")
    pdf = animation_frames(df, reference="animgen").toPandas()
    by_id = {k: bool(v) for k, v in
             pdf.groupby("image_id")["pixels_ok"]
             .apply(lambda c: c.isna().all()).items()}
    assert by_id["backup-000000000007"]  # NULL, not compared
    assert by_id["weird id"]
    assert not by_id["img-000000000007"]  # real family verifies
    assert pdf[pdf["image_id"] == "img-000000000007"]["pixels_ok"].all()


def test_operator_skips_still_images_and_nulls(spark):
    """Static payloads and NULL bytes emit nothing — the operator is
    the animation leg only."""
    from cerberus_cpp_spark.operators.multimodal import animation_frames
    from cerberus_cpp_spark.sources.distgen import image_caption_frame

    stills = image_caption_frame(spark, 30, with_bytes=True)
    assert animation_frames(stills).count() == 0


def test_operator_plan_is_narrow(spark):
    """One Arrow stage, no Exchange — the 100 TB shape."""
    from cerberus_cpp_spark.operators.multimodal import animation_frames
    from cerberus_cpp_spark.sources.animgen import anim_clip_frame

    clips = anim_clip_frame(spark, 12, partitions=2)
    plan = animation_frames(clips, reference="animgen") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
