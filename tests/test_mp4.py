"""MP4 (ISO/IEC 14496-12 movie branch) structural layer: build→parse
roundtrips across the spec-valid parameter space, 64-bit version-1
box parsing, damage classes with named boxes, brand-space
disjointness from the HEIF image branch, and the one-narrow-stage
operator routing."""

from __future__ import annotations

import struct

import pytest

from cerberus_cpp_spark.sources.isobmff import (
    audit_isobmff,
    build_mp4,
    mp4_movie_info,
    sniff_isobmff,
    sniff_mp4,
)


def _tracks(i: int) -> list[dict]:
    return [
        {"track_id": 1, "handler": "vide", "codec": "avc1",
         "timescale": 24000 + i, "samples": [(10 + i, 1001), (3, 500)],
         "width": 64 + i, "height": 36 + i, "lang": "eng"},
        {"track_id": 2, "handler": "soun", "codec": "mp4a",
         "timescale": 48000, "samples": [(140, 1024)]},
    ]


def test_build_parse_roundtrip() -> None:
    blob = build_mp4(_tracks(0), brand=b"mp42")
    info = mp4_movie_info(blob)
    assert info["brand"] == "mp42"
    v, a = info["tracks"]
    assert (v["handler"], v["codec"]) == ("vide", "avc1")
    assert (v["width"], v["height"]) == (64, 36)
    assert v["n_samples"] == 13
    assert v["duration"] == 10 * 1001 + 3 * 500
    assert v["lang"] == "eng"
    assert (a["handler"], a["codec"], a["lang"]) == \
        ("soun", "mp4a", "und")
    # movie duration = max track duration rescaled to 1000
    assert info["timescale"] == 1000
    assert info["duration"] == max(
        v["duration"] * 1000 // v["timescale"],
        a["duration"] * 1000 // a["timescale"])
    # structural audit passes on the fixture
    ok, msg, _ = audit_isobmff(blob)
    assert ok, msg


def test_roundtrip_property_sweep() -> None:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 3), st.integers(1, 4),
           st.integers(1, 100000), st.data())
    def check(n_tracks, n_runs, tsc, data):
        tracks = []
        for k in range(n_tracks):
            vide = data.draw(st.booleans())
            runs = [(data.draw(st.integers(1, 500)),
                     data.draw(st.integers(1, 5000)))
                    for _ in range(n_runs)]
            tracks.append({
                "track_id": k + 1,
                "handler": "vide" if vide else "soun",
                "codec": "av01" if vide else "opus",
                "timescale": tsc,
                "samples": runs,
                "width": data.draw(st.integers(0, 8192)) if vide else 0,
                "height": data.draw(st.integers(0, 8192)) if vide else 0,
            })
        info = mp4_movie_info(build_mp4(tracks))
        assert len(info["tracks"]) == n_tracks
        for spec, got in zip(tracks, info["tracks"]):
            assert got["track_id"] == spec["track_id"]
            assert got["n_samples"] == sum(c for c, _ in spec["samples"])
            assert got["duration"] == sum(c * d for c, d
                                          in spec["samples"])
            assert got["timescale"] == tsc
            assert got["width"] == spec["width"]

    check()


def test_version1_boxes_parse() -> None:
    """Hand-built v1 mvhd/tkhd/mdhd (64-bit times) — the branch the
    v0-only builder never emits."""
    from cerberus_cpp_spark.sources.isobmff import (
        _box,
        _full,
        _pack_lang,
        _UNITY_MATRIX,
    )

    dur = 5_000_000_000  # > 2^32: NEEDS version 1
    tkhd = _full(b"tkhd", 1, 7, struct.pack(
        ">QQIIQQhhhh", 0, 0, 7, 0, 1234, 0, 0, 0, 0, 0)
        + _UNITY_MATRIX + struct.pack(">II", 100 << 16, 50 << 16))
    mdhd = _full(b"mdhd", 1, 0, struct.pack(
        ">QQIQHH", 0, 0, 90000, dur, _pack_lang("fra"), 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"\x00")
    entry = struct.pack(">I", 16) + b"hvc1" + b"\x00" * 6 \
        + struct.pack(">H", 1)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 4, 25))
    stbl = _box(b"stbl", stsd + stts)
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
    mvhd = _full(b"mvhd", 1, 0, struct.pack(
        ">QQIQ", 0, 0, 600, dur) + struct.pack(">IHH", 0x10000,
        0x100, 0) + b"\x00" * 8 + _UNITY_MATRIX + b"\x00" * 24
        + struct.pack(">I", 8))
    blob = (_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
            + _box(b"moov", mvhd + _box(b"trak", tkhd + mdia)))
    info = mp4_movie_info(blob)
    assert info["duration"] == dur and info["timescale"] == 600
    t = info["tracks"][0]
    assert t["track_id"] == 7 and t["duration"] == dur
    assert t["timescale"] == 90000 and t["lang"] == "fra"
    assert (t["width"], t["height"]) == (100, 50)
    assert t["codec"] == "hvc1" and t["n_samples"] == 4


@pytest.mark.parametrize("mutate,err", [
    (lambda b: b[:20], "ftyp brand"),
    (lambda b: b.replace(b"moov", b"mooX", 1), "no moov box"),
    (lambda b: b.replace(b"mvhd", b"mvhX", 1), "no mvhd box"),
    (lambda b: b.replace(b"tkhd", b"tkhX", 1), "without tkhd"),
    (lambda b: b.replace(b"mdhd", b"mdhX", 1), "without mdhd"),
    (lambda b: b.replace(b"hdlr", b"hdlX", 1), "without hdlr"),
    (lambda b: b.replace(b"stsd", b"stsX", 1), "without stsd"),
    (lambda b: b.replace(b"stts", b"sttX", 1), "without stts"),
    (lambda b: b[:-12], "overruns"),
])
def test_damage_classes(mutate, err) -> None:
    blob = build_mp4(_tracks(1))
    with pytest.raises(ValueError, match=err):
        mp4_movie_info(mutate(blob))


def test_brand_spaces_disjoint() -> None:
    mp4 = build_mp4(_tracks(2))
    assert sniff_mp4(mp4) == "isom"
    assert sniff_isobmff(mp4) is None
    # a HEIF brand is NOT a movie
    heifish = struct.pack(">I", 16) + b"ftyp" + b"heic" \
        + struct.pack(">I", 0)
    assert sniff_mp4(heifish + b"\x00" * 8) is None
    with pytest.raises(ValueError, match="ftyp brand"):
        mp4_movie_info(heifish)


def test_operator_routing_and_plan(spark) -> None:
    from cerberus_cpp_spark.operators.multimodal import mp4_track_frames

    rows = [
        ("ok2", bytearray(build_mp4(_tracks(3)))),
        ("null", None),
        ("cut", bytearray(build_mp4(_tracks(3))[:20])),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = mp4_track_frames(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {}
    for r in out.collect():
        got.setdefault(r["clip_id"], []).append(r)
    assert len(got["ok2"]) == 2
    assert all(r["ok"] for r in got["ok2"])
    v = next(r for r in got["ok2"] if r["handler"] == "vide")
    assert v["codec"] == "avc1" and v["n_samples"] == 16
    assert v["duration_ms"] == (13 * 1001 + 1500) * 1000 // 24003
    assert got["null"][0]["message"] == "no payload"
    assert not got["null"][0]["ok"]
    assert not got["cut"][0]["ok"]
