"""H.264 structural layer: Exp-Golomb round-trips, SPS dimension
arithmetic (incl. conformance cropping and high-profile chroma
branches), NAL walk damage classes, emulation-prevention handling,
and the video_header_info operator."""

from __future__ import annotations

import pytest

from cerberus_cpp_spark.sources import h264


def test_expgolomb_roundtrip() -> None:
    w = h264._BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 254, 255, 1023]
    for v in vals:
        w.ue(v)
    r = h264._BitReader(w.bytes_rbsp())
    assert [r.ue() for _ in vals] == vals


def test_sps_dims_exact() -> None:
    # 1920x1080: 120x68 MBs, bottom crop 4 chroma units (8 px)
    sps = h264.build_sps(mb_w=120, mb_h=68, crop_b=4)
    p = h264.parse_sps(sps)
    assert (p["width"], p["height"]) == (1920, 1080)
    assert p["profile_idc"] == 66 and p["chroma_format_idc"] == 1
    # uncropped odd size + high profile branch
    p2 = h264.parse_sps(h264.build_sps(mb_w=3, mb_h=2, crop_r=1,
                                       profile=100))
    assert (p2["width"], p2["height"]) == (46, 32)
    assert p2["profile_idc"] == 100
    with pytest.raises(ValueError):
        h264.parse_sps(h264.build_sps(mb_w=1, mb_h=1, crop_r=99))
    with pytest.raises(ValueError):
        h264.parse_sps(b"\x42")


def test_nal_walk_and_damage() -> None:
    s = h264.build_stream(mb_w=4, mb_h=3, n_slices=3)
    nals = list(h264.iter_nals(s))
    assert [t for t, _ in nals] == [7, 8, 5, 1, 1]
    info = h264.h264_stream_info(s)
    assert info["ok"] and info["n_nals"] == 5
    assert info["n_slices"] == 3 and info["n_idr"] == 1
    assert (info["width"], info["height"]) == (64, 48)
    assert info["has_pps"]
    # damage classes
    assert not h264.sniff_h264_annexb(b"\x12\x34")
    with pytest.raises(ValueError):
        list(h264.iter_nals(b"\x12" + s))
    bad = bytearray(s)
    bad[4] |= 0x80          # forbidden_zero_bit on the SPS
    assert not h264.h264_stream_info(bytes(bad))["ok"]
    no_sps = s[: s.find(b"\x00\x00\x00\x01", 4)]  # SPS only... keep
    only_pps = h264.build_stream(mb_w=2, mb_h=2)
    only_pps = only_pps[only_pps.find(b"\x00\x00\x00\x01", 4):]
    r = h264.h264_stream_info(only_pps)
    assert not r["ok"] and "no SPS" in r["message"]


def test_emulation_prevention() -> None:
    rbsp = b"\x00\x00\x01\x02\x00\x00\x00\x03"
    wire = h264._add_emulation(rbsp)
    assert b"\x00\x00\x01" not in wire[:3]
    assert h264._strip_emulation(wire) == rbsp


def test_video_header_info_operator(spark, tmp_path) -> None:
    from cerberus_cpp_spark.operators.multimodal import video_header_info
    from cerberus_cpp_spark.sources.avicodec import synth_clip

    avi = synth_clip(3, 4, w=16, h=16, fps=10)
    h264s = h264.build_stream(mb_w=5, mb_h=4, crop_b=2, n_slices=4)
    rows = [
        ("avi", avi),
        ("h264", h264s),
        ("h264-bad", h264s[:6]),
        ("none", None),
        ("garbage", b"\x09\x08\x07\x06\x05"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["clip_id"]: r for r in video_header_info(df).collect()}
    a = out["avi"]
    assert a["ok"] and a["fmt"] == "avi"
    assert (a["width"], a["height"], a["n_frames"]) == (16, 16, 4)
    assert a["fps"] == 10.0 and a["profile_idc"] is None
    v = out["h264"]
    assert v["ok"] and v["fmt"] == "h264"
    assert (v["width"], v["height"]) == (80, 60)   # 64-0, 64-4
    assert v["n_frames"] == 4 and v["n_idr"] == 1
    assert v["profile_idc"] == 66 and v["fps"] is None
    assert out["h264-bad"]["ok"] is False
    assert out["none"]["ok"] is False
    assert out["garbage"]["message"] == "unrecognized video stream"
    p = str(tmp_path / "v.parquet")
    df.write.parquet(p)
    plan = (video_header_info(spark.read.parquet(p))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan
