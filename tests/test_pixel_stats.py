"""pixel_stats: exact integer pixel moments + border uniformity.

Hand-computed expectations on tiny deterministic images; decode via
the in-repo PNG codec so the decoded array IS the generated array.
"""
from __future__ import annotations

import numpy as np

from cerberus_cpp_spark.sources.imagegen import encode_pixels


def _frame(spark, rows):
    return spark.createDataFrame(rows, "image_id string, bytes binary")


def test_solid_grey_and_border(spark):
    from cerberus_cpp_spark.operators.image_checks import pixel_stats

    solid = np.full((4, 5, 3), 9, np.uint8)          # grey, dark
    solid_png = encode_pixels(solid, "png")

    grad = np.zeros((3, 4, 3), np.uint8)             # varying ring
    for y in range(3):
        for x in range(4):
            grad[y, x] = (x * 50, y * 60, 7)
    grad_png = encode_pixels(grad, "png")

    boxed = np.full((5, 6, 3), 200, np.uint8)        # bright interior
    boxed[0, :] = boxed[-1, :] = boxed[:, 0] = boxed[:, -1] = (5, 5, 5)
    boxed_png = encode_pixels(boxed, "png")

    rows = [("solid", solid_png), ("grad", grad_png),
            ("boxed", boxed_png), ("nul", None),
            ("junk", b"\x89PNG\r\n\x1a\ngarbage")]
    got = {r["image_id"]: r.asDict()
           for r in pixel_stats(_frame(spark, rows)).collect()}

    s = got["solid"]
    assert s["status"] == "ok" and s["n_pixels"] == 20
    assert s["sum_r"] == s["sum_g"] == s["sum_b"] == 20 * 9
    assert s["sumsq_r"] == 20 * 81
    assert s["n_grey"] == 20 and s["n_dark"] == 20          # 27 < 96
    assert s["border_uniform"] is True
    assert s["border_rgb"] == 9 * 65536 + 9 * 256 + 9

    g = got["grad"]
    assert g["status"] == "ok" and g["n_pixels"] == 12
    assert g["sum_r"] == 3 * (0 + 50 + 100 + 150)
    assert g["sum_g"] == 4 * (0 + 60 + 120)
    assert g["sum_b"] == 12 * 7
    assert g["sumsq_b"] == 12 * 49
    assert g["n_grey"] == 0                     # b=7 never matches
    assert g["border_uniform"] is False
    assert g["border_rgb"] is None

    b = got["boxed"]
    ring = 2 * 6 + 2 * 5 - 4
    inner = 30 - ring
    assert b["n_pixels"] == 30
    assert b["sum_r"] == ring * 5 + inner * 200
    assert b["n_grey"] == 30
    assert b["n_dark"] == ring                               # 15 < 96
    assert b["border_uniform"] is True
    assert b["border_rgb"] == 5 * 65536 + 5 * 256 + 5

    assert got["nul"]["status"] == "no_payload"
    assert got["nul"]["n_pixels"] is None
    assert got["junk"]["status"] == "undecodable"


def test_one_pixel_wide_ring_is_whole_image(spark):
    from cerberus_cpp_spark.operators.image_checks import pixel_stats

    col = np.zeros((4, 1, 3), np.uint8)
    col[:, 0] = [(1, 1, 1), (1, 1, 1), (1, 1, 1), (2, 2, 2)]
    rows = [("col", encode_pixels(col, "png"))]
    got = pixel_stats(_frame(spark, rows)).collect()[0]
    assert got["border_uniform"] is False
    uni = np.full((1, 3, 3), 8, np.uint8)
    got = pixel_stats(
        _frame(spark, [("row", encode_pixels(uni, "png"))])).collect()[0]
    assert got["border_uniform"] is True and got["border_rgb"] == 0x080808


def test_sharpness_hand_computed(spark):
    from cerberus_cpp_spark.operators.image_checks import pixel_sharpness

    # 3x3 single interior pixel: center 10, cross neighbours 1,2,3,4
    a = np.zeros((3, 3, 3), np.uint8)
    a[1, 1] = 10
    a[1, 0] = 1; a[1, 2] = 2; a[0, 1] = 3; a[2, 1] = 4
    # per channel lap = 40 - 1 - 2 - 3 - 4 = 30 -> lap3 = 90
    flat = np.full((4, 5, 3), 7, np.uint8)           # zero response
    tiny = np.full((2, 9, 3), 1, np.uint8)           # no interior
    rows = [("x", encode_pixels(a, "png")),
            ("flat", encode_pixels(flat, "png")),
            ("tiny", encode_pixels(tiny, "png")),
            ("nul", None)]
    got = {r["image_id"]: r.asDict()
           for r in pixel_sharpness(_frame(spark, rows)).collect()}
    assert got["x"]["n_interior"] == 1
    assert got["x"]["lap_sum"] == 90 and got["x"]["lap_max"] == 90
    assert got["x"]["n_edges"] == 0                  # 90 < 128
    f = got["flat"]
    assert f["n_interior"] == 6 and f["lap_sum"] == 0
    assert f["lap_max"] == 0 and f["n_edges"] == 0
    t = got["tiny"]
    assert t["n_interior"] == 0 and t["lap_sum"] == 0
    assert t["lap_max"] is None and t["n_edges"] == 0
    assert got["nul"]["status"] == "no_payload"


def test_sharpness_edge_threshold(spark):
    from cerberus_cpp_spark.operators.image_checks import pixel_sharpness

    a = np.zeros((3, 3, 3), np.uint8)
    a[1, 1] = 50                                     # lap3 = 600
    got = pixel_sharpness(
        _frame(spark, [("e", encode_pixels(a, "png"))])).collect()[0]
    assert got["lap_max"] == 600 and got["n_edges"] == 1


def test_curation_verdict_rule_order(spark):
    from cerberus_cpp_spark.operators.image_checks import (
        image_curation_verdict,
    )
    from cerberus_cpp_spark.sources.jpegcodec import encode_jpeg

    solid_small = np.full((8, 8, 3), 120, np.uint8)       # 64 < 70
    solid_big = np.full((9, 9, 3), 120, np.uint8)         # 81 >= 70
    dark = np.full((9, 9, 3), 10, np.uint8)
    dark[0, 0] = (250, 10, 10)                            # break flat+grey
    dark[1, 1] = (10, 250, 10)
    grey_sharp = np.full((9, 9, 3), 100, np.uint8)
    grey_sharp[::2, ::2] = 200                 # bright checker: sharp, grey
    colour_sharp = np.zeros((9, 9, 3), np.uint8)
    colour_sharp[:, :] = (120, 130, 140)       # bright, not grey
    colour_sharp[::2, ::2] = (250, 60, 160)    # sharp checker

    rows = [
        ("nul", None),
        ("junk", b"\x08junk" * 3),
        ("small", encode_pixels(solid_small, "png")),
        ("lowq", encode_jpeg(solid_big, quality=40)),
        ("hiq_flat", encode_jpeg(solid_big, quality=90)),
        ("flat", encode_pixels(solid_big, "png")),
        ("dark", encode_pixels(dark, "png")),
        ("grey", encode_pixels(grey_sharp, "png")),
        ("keep", encode_pixels(colour_sharp, "png")),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: (r["verdict"], r["reason"])
           for r in image_curation_verdict(df).collect()}
    assert got["nul"] == ("drop", "no_payload")
    assert got["junk"] == ("drop", "undecodable")
    assert got["small"] == ("drop", "too_small")
    assert got["lowq"] == ("drop", "low_quality")
    assert got["hiq_flat"] == ("drop", "too_flat")   # quality passes
    assert got["flat"] == ("drop", "too_flat")
    assert got["dark"] == ("drop", "too_dark")
    assert got["grey"] == ("drop", "greyscale")
    assert got["keep"] == ("keep", None)
