"""resize_pixels / thumbnail_dims analytics and the resize_images
operator: exact nearest/bilinear semantics, status routing, checksum
policy, re-encode roundtrip, and plan shape (one narrow Arrow stage)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators import image_transform as it
from cerberus_cpp_spark.sources.imagegen import (
    decode_image,
    encode_image,
    encode_pixels,
    pixel_seed,
    synth_pixels,
)


# ---------------------------------------------------------------------------
# pixel math
# ---------------------------------------------------------------------------

def test_nearest_indices_exact() -> None:
    # 2× upscale repeats each source pixel twice
    assert it.nearest_indices(2, 4).tolist() == [0, 0, 1, 1]
    # 2× downscale picks centers 1 and 3
    assert it.nearest_indices(4, 2).tolist() == [1, 3]
    # identity
    assert it.nearest_indices(7, 7).tolist() == list(range(7))
    with pytest.raises(ValueError):
        it.nearest_indices(0, 4)


def test_nearest_resize_exact() -> None:
    px = synth_pixels(123, 5, 4)
    out = it.resize_pixels(px, 10, 8, "nearest")
    xs = it.nearest_indices(5, 10)
    ys = it.nearest_indices(4, 8)
    assert np.array_equal(out, px[np.ix_(ys, xs)])


def test_bilinear_identity_and_constant() -> None:
    px = synth_pixels(7, 9, 6)
    assert np.array_equal(it.resize_pixels(px, 9, 6, "bilinear"), px)
    const = np.full((5, 8, 3), 77, dtype=np.uint8)
    assert np.all(it.resize_pixels(const, 13, 3, "bilinear") == 77)


def test_bilinear_linear_ramp() -> None:
    """Bilinear interpolation of a linear ramp reproduces the ramp:
    out(x) = floor(xf + 0.5) where xf is the source coordinate."""
    w = 17
    ramp = np.tile(
        np.arange(w, dtype=np.uint8)[None, :, None] * 15, (4, 1, 3)
    )
    out = it.resize_pixels(ramp, 33, 4, "bilinear")
    xf = np.clip((np.arange(33) + 0.5) * (w / 33) - 0.5, 0, w - 1)
    want = np.floor(15 * xf + 0.5).astype(np.uint8)
    assert np.array_equal(out[0, :, 0], want)


def test_resize_rejects_unknown_method() -> None:
    with pytest.raises(ValueError):
        it.resize_pixels(np.zeros((2, 2, 3), np.uint8), 4, 4, "bicubic")


def test_thumbnail_dims() -> None:
    assert it.thumbnail_dims(100, 100, 12, 10) == (10, 10)
    assert it.thumbnail_dims(200, 100, 12, 10) == (12, 6)
    assert it.thumbnail_dims(100, 200, 12, 10) == (5, 10)
    # never collapses to zero
    assert it.thumbnail_dims(1, 1000, 12, 10) == (1, 10)
    assert it.thumbnail_dims(1000, 1, 12, 10) == (12, 1)
    with pytest.raises(ValueError):
        it.thumbnail_dims(0, 5, 12, 10)


# ---------------------------------------------------------------------------
# operator
# ---------------------------------------------------------------------------

def _frame(spark):
    rows = [
        ("png", encode_image(pixel_seed(1), 9, 7, "png")),
        ("jpeg", encode_image(pixel_seed(2), 10, 8, "jpeg")),
        ("webp", encode_image(pixel_seed(3), 8, 9, "webp")),
        ("gif", encode_image(pixel_seed(4), 11, 6, "gif")),
        ("none", None),
        ("garbage", b"\x00\x01not an image at all"),
    ]
    return spark.createDataFrame(
        [(f"id-{fmt}", blob) for fmt, blob in rows],
        "image_id string, bytes binary",
    )


def test_resize_images_statuses_and_checksums(spark) -> None:
    out = {
        r["image_id"]: r
        for r in it.resize_images(
            _frame(spark), size=(6, 5), method="nearest"
        ).collect()
    }
    assert out["id-none"]["status"] == "no_payload"
    assert out["id-garbage"]["status"] == "undecodable"
    for fmt in ("png", "jpeg", "webp", "gif"):
        r = out[f"id-{fmt}"]
        assert r["status"] == "ok"
        assert (r["out_w"], r["out_h"], r["out_fmt"]) == (6, 5, fmt)
        assert r["out_bytes"] is not None
    # checksum only for bit-exact sources
    assert out["id-jpeg"]["px_sum"] is None
    for fmt in ("png", "webp", "gif"):
        assert out[f"id-{fmt}"]["px_sum"] is not None
    # non-ok rows carry NULLs
    assert out["id-none"]["out_bytes"] is None
    assert out["id-garbage"]["out_w"] is None


def test_resize_images_roundtrip_exact(spark) -> None:
    """Lossless re-encode of the resized pixels decodes back to
    exactly resize_pixels(decode(src)) — and px_sum matches."""
    src_px = synth_pixels(pixel_seed(1), 9, 7)
    want = it.resize_pixels(src_px, 6, 5, "nearest")
    row = (
        it.resize_images(_frame(spark), size=(6, 5), method="nearest")
        .where("image_id = 'id-png'")
        .collect()[0]
    )
    _, got = decode_image(bytes(row["out_bytes"]))
    assert np.array_equal(got, want)
    assert row["px_sum"] == int(np.sum(want, dtype=np.int64))


def test_resize_images_box_and_out_fmt(spark) -> None:
    out = {
        r["image_id"]: r
        for r in it.resize_images(
            _frame(spark), box=(12, 10), method="bilinear",
            out_fmt="png",
        ).collect()
    }
    # 9×7 → height binds at 10? 9*10=90 <= 7*12=84 is False → width
    assert (out["id-png"]["out_w"], out["id-png"]["out_h"]) == (
        it.thumbnail_dims(9, 7, 12, 10)
    )
    for fmt in ("png", "jpeg", "webp", "gif"):
        assert out[f"id-{fmt}"]["out_fmt"] == "png"
    # jpeg re-encoded losslessly still gets NO checksum (source lossy)
    assert out["id-jpeg"]["px_sum"] is None


def test_resize_images_arg_validation(spark) -> None:
    df = _frame(spark)
    with pytest.raises(ValueError):
        it.resize_images(df, size=(4, 4), box=(4, 4))
    with pytest.raises(ValueError):
        it.resize_images(df)
    with pytest.raises(ValueError):
        it.resize_images(df, size=(0, 4))
    with pytest.raises(ValueError):
        it.resize_images(df, size=(4, 4), method="lanczos")


def test_resize_images_narrow_plan(spark, tmp_path) -> None:
    p = str(tmp_path / "imgs.parquet")
    _frame(spark).write.parquet(p)
    out = it.resize_images(
        spark.read.parquet(p), size=(6, 5), method="nearest"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


# ---------------------------------------------------------------------------
# quality profile
# ---------------------------------------------------------------------------

def test_quality_metrics_constant_gray() -> None:
    px = np.full((6, 5, 3), 80, dtype=np.uint8)
    m = it.quality_metrics(px)
    assert m == {
        "w": 5, "h": 6,
        "luma1000_sum": 1000 * 80 * 30,   # 299+587+114 = 1000
        "luma1000_min": 80000, "luma1000_max": 80000,
        "lap_abs_sum": 0, "n_distinct_rgb": 1, "is_grayscale": True,
    }


def test_quality_metrics_checkerboard() -> None:
    """2-color checkerboard: every interior Laplacian tap is ±4·255
    per channel (4·c − 4 neighbours of the opposite color)."""
    y, x = np.mgrid[0:5, 0:7]
    board = (((x + y) % 2) * 255).astype(np.uint8)
    px = np.stack([board] * 3, axis=-1)
    m = it.quality_metrics(px)
    interior = (5 - 2) * (7 - 2)
    assert m["lap_abs_sum"] == interior * 3 * 4 * 255
    assert m["n_distinct_rgb"] == 2
    assert m["is_grayscale"] is True
    assert m["luma1000_min"] == 0 and m["luma1000_max"] == 255000


def test_quality_metrics_color_and_tiny() -> None:
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 0] = (10, 20, 30)
    m = it.quality_metrics(px)
    assert m["lap_abs_sum"] == 0          # no interior
    assert m["is_grayscale"] is False
    assert m["n_distinct_rgb"] == 2
    assert m["luma1000_sum"] == 299 * 10 + 587 * 20 + 114 * 30


def test_quality_metrics_blur_lowers_sharpness() -> None:
    """Downscale-then-upscale (a cheap blur) must score lower
    Laplacian energy than the original on a noisy image."""
    from cerberus_cpp_spark.sources.imagegen import synth_noise_pixels

    px = synth_noise_pixels(5, 16, 16)
    blurred = it.resize_pixels(
        it.resize_pixels(px, 4, 4, "bilinear"), 16, 16, "bilinear"
    )
    assert (
        it.quality_metrics(blurred)["lap_abs_sum"]
        < it.quality_metrics(px)["lap_abs_sum"] / 2
    )


def test_image_quality_profile_operator(spark, tmp_path) -> None:
    rows = {
        r["image_id"]: r
        for r in it.image_quality_profile(_frame(spark)).collect()
    }
    assert rows["id-none"]["status"] == "no_payload"
    assert rows["id-garbage"]["status"] == "undecodable"
    assert rows["id-none"]["luma1000_sum"] is None
    # decoded png row matches the direct computation exactly
    src_px = synth_pixels(pixel_seed(1), 9, 7)
    want = it.quality_metrics(src_px)
    got = rows["id-png"]
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    # narrow plan
    p = str(tmp_path / "q.parquet")
    _frame(spark).write.parquet(p)
    plan = (
        it.image_quality_profile(spark.read.parquet(p))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


# ---------------------------------------------------------------------------
# augmentation
# ---------------------------------------------------------------------------

def test_transform_pixels_primitives() -> None:
    px = synth_pixels(11, 7, 5)
    assert np.array_equal(
        it.transform_pixels(px, flip_h=True), px[:, ::-1])
    assert np.array_equal(
        it.transform_pixels(px, flip_v=True), px[::-1])
    # 90° clockwise: top row becomes right column
    r = it.transform_pixels(px, rot90=90)
    assert r.shape == (7, 5, 3)
    assert np.array_equal(r[:, -1], px[0])
    # 180 == flip both; 270 == inverse of 90
    assert np.array_equal(
        it.transform_pixels(px, rot90=180), px[::-1, ::-1])
    assert np.array_equal(
        it.transform_pixels(it.transform_pixels(px, rot90=90),
                            rot90=270), px)


def test_transform_pixels_crop() -> None:
    px = synth_pixels(3, 10, 8)
    c = it.transform_pixels(px, crop=("center", 4, 6))
    assert np.array_equal(c, px[1:7, 3:7])
    e = it.transform_pixels(px, crop=(2, 1, 5, 3))
    assert np.array_equal(e, px[1:4, 2:7])
    # center crop clamps to the image
    assert it.transform_pixels(px, crop=("center", 99, 99)).shape \
        == px.shape
    with pytest.raises(ValueError):
        it.transform_pixels(px, crop=(8, 0, 5, 3))
    with pytest.raises(ValueError):
        it.transform_pixels(px, rot90=45)


def test_transform_chain_order() -> None:
    """crop → flip_h → rot90(cw): pinned against the explicit
    composition (the contract oracle replays this algebra)."""
    px = synth_pixels(9, 13, 11)
    got = it.transform_pixels(
        px, crop=("center", 10, 8), flip_h=True, rot90=90)
    want = np.rot90(px[1:9, 1:11][:, ::-1], k=-1)
    assert np.array_equal(got, want)


def test_position_weighted_luma_sensitivity() -> None:
    px = synth_pixels(21, 6, 4)
    base = it.position_weighted_luma(px)
    assert it.position_weighted_luma(px[:, ::-1]) != base
    assert it.position_weighted_luma(np.rot90(px)) != base
    # plain sum is NOT sensitive — that's why pos_sum exists
    assert px.sum() == px[:, ::-1].sum()


def test_augment_images_operator(spark, tmp_path) -> None:
    out = {
        r["image_id"]: r
        for r in it.augment_images(
            _frame(spark), crop=("center", 6, 5), flip_h=True,
            rot90=90,
        ).collect()
    }
    assert out["id-none"]["status"] == "no_payload"
    assert out["id-garbage"]["status"] == "undecodable"
    # png row: exact equality with the local chain
    src_px = synth_pixels(pixel_seed(1), 9, 7)
    want = it.transform_pixels(src_px, crop=("center", 6, 5),
                               flip_h=True, rot90=90)
    r = out["id-png"]
    assert (r["out_w"], r["out_h"]) == (want.shape[1], want.shape[0])
    _, got = decode_image(bytes(r["out_bytes"]))
    assert np.array_equal(got, want)
    assert r["px_sum"] == int(want.sum())
    assert r["pos_sum"] == it.position_weighted_luma(want)
    assert out["id-jpeg"]["pos_sum"] is None
    with pytest.raises(ValueError):
        it.augment_images(_frame(spark), rot90=30)
    # narrow plan
    p = str(tmp_path / "aug.parquet")
    _frame(spark).write.parquet(p)
    plan = (
        it.augment_images(spark.read.parquet(p), flip_h=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


# ---------------------------------------------------------------------------
# property sweeps
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @settings(max_examples=60, deadline=None)
    @given(
        sw=st.integers(1, 24), sh=st.integers(1, 20),
        ow=st.integers(1, 30), oh=st.integers(1, 26),
        seed=st.integers(0, 2**31 - 1),
        method=st.sampled_from(["nearest", "bilinear"]),
    )
    def test_resize_properties(sw, sh, ow, oh, seed, method) -> None:
        from cerberus_cpp_spark.sources.imagegen import (
            synth_noise_pixels,
        )

        px = synth_noise_pixels(seed, sw, sh)
        out = it.resize_pixels(px, ow, oh, method)
        assert out.shape == (oh, ow, 3) and out.dtype == np.uint8
        if method == "nearest":
            # every output pixel is SOME source pixel
            src = {tuple(p) for p in px.reshape(-1, 3)}
            assert {tuple(p) for p in out.reshape(-1, 3)} <= src
        else:
            # bilinear stays inside the source value range per channel
            for c in range(3):
                assert out[..., c].min() >= px[..., c].min()
                assert out[..., c].max() <= px[..., c].max()
        # same-size resize is the identity for both methods
        assert np.array_equal(it.resize_pixels(px, sw, sh, method), px)

    @settings(max_examples=60, deadline=None)
    @given(
        sw=st.integers(2, 20), sh=st.integers(2, 18),
        seed=st.integers(0, 2**31 - 1),
        fh=st.booleans(), fv=st.booleans(),
        rot=st.sampled_from([0, 90, 180, 270]),
    )
    def test_transform_involutions(sw, sh, seed, fh, fv, rot) -> None:
        from cerberus_cpp_spark.sources.imagegen import (
            synth_noise_pixels,
        )

        px = synth_noise_pixels(seed, sw, sh)
        out = it.transform_pixels(px, flip_h=fh, flip_v=fv, rot90=rot)
        # undo in reverse order: rotate back, then unflip
        back = it.transform_pixels(out, rot90=(360 - rot) % 360)
        back = it.transform_pixels(back, flip_h=fh, flip_v=fv)
        assert np.array_equal(back, px)
        # pixel multiset is preserved (pure permutation)
        assert sorted(map(tuple, out.reshape(-1, 3))) \
            == sorted(map(tuple, px.reshape(-1, 3)))

    @settings(max_examples=40, deadline=None)
    @given(
        sw=st.integers(1, 20), sh=st.integers(1, 18),
        bw=st.integers(1, 16), bh=st.integers(1, 16),
    )
    def test_thumbnail_dims_properties(sw, sh, bw, bh) -> None:
        ow, oh = it.thumbnail_dims(sw, sh, bw, bh)
        assert 1 <= ow <= bw and 1 <= oh <= bh
        # at least one side fills the box unless clamped at 1
        assert ow == bw or oh == bh


def test_augment_with_fused_resize(spark) -> None:
    """crop→flip→rot→resize in ONE decode: equals the local chain
    exactly for a lossless row, including both checksums."""
    src_px = synth_pixels(pixel_seed(1), 9, 7)
    want = it.resize_pixels(
        it.transform_pixels(src_px, crop=("center", 6, 5),
                            flip_h=True),
        8, 8, "nearest")
    row = (
        it.augment_images(_frame(spark), crop=("center", 6, 5),
                          flip_h=True, resize_to=(8, 8),
                          resize_method="nearest")
        .where("image_id = 'id-png'")
        .collect()[0]
    )
    assert (row["out_w"], row["out_h"]) == (8, 8)
    _, got = decode_image(bytes(row["out_bytes"]))
    assert np.array_equal(got, want)
    assert row["px_sum"] == int(want.sum())
    assert row["pos_sum"] == it.position_weighted_luma(want)
    import pytest

    with pytest.raises(ValueError):
        it.augment_images(_frame(spark), resize_to=(0, 8))
    with pytest.raises(ValueError):
        it.augment_images(_frame(spark), resize_to=(8, 8),
                          resize_method="area")
