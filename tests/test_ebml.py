"""EBML / Matroska / WebM structural layer: VINT edge cases,
build→parse roundtrips across the spec-valid parameter space,
damage classes with named elements, doctype gating, and the
one-narrow-stage operator routing — the sibling suite of
tests/test_mp4.py for the other big web video container."""

from __future__ import annotations

import struct

import pytest

from cerberus_cpp_spark.sources.ebml import (
    _el,
    _el_uint,
    _enc_vint,
    build_webm,
    read_element,
    sniff_webm,
    webm_movie_info,
)


def _tracks(i: int) -> list[dict]:
    return [
        {"number": 1, "type": "video", "codec": "V_VP9",
         "width": 640 + i, "height": 360 + i, "lang": "eng"},
        {"number": 2, "type": "audio", "codec": "A_OPUS",
         "hz": 48000.0, "channels": 2, "lang": "deu"},
    ]


def test_vint_encoding_boundaries() -> None:
    # 1-byte VINT holds 0..126 (127 = all-ones = unknown size)
    assert _enc_vint(0) == b"\x80"
    assert _enc_vint(126) == b"\xfe"
    assert len(_enc_vint(127)) == 2
    assert _enc_vint(127) == b"\x40\x7f"
    # decode back through read_element (payload of that length)
    for v in (0, 1, 126, 127, 128, 16382, 16383, 2 ** 21 - 3):
        el = b"\xec" + _enc_vint(v) + b"\x00" * v   # Void element
        eid, ps, pe = read_element(el, 0, len(el))
        assert eid == b"\xec" and pe - ps == v


def test_unknown_size_rejected() -> None:
    el = b"\xec\xff" + b"\x00" * 7
    with pytest.raises(ValueError, match="unknown-size"):
        read_element(el, 0, len(el))


def test_build_parse_roundtrip() -> None:
    blob = build_webm(_tracks(0), doctype="webm",
                      duration_ms=4321, n_clusters=2)
    assert sniff_webm(blob) == "webm"
    info = webm_movie_info(blob)
    assert info["doctype"] == "webm"
    assert info["timestamp_scale"] == 1_000_000
    assert info["duration_ms"] == 4321
    assert info["n_clusters"] == 2
    v, a = info["tracks"]
    assert (v["number"], v["type"], v["codec"]) == (1, "video",
                                                    "V_VP9")
    assert (v["width"], v["height"], v["lang"]) == (640, 360, "eng")
    assert v["hz"] is None and v["channels"] is None
    assert (a["type"], a["codec"], a["hz"], a["channels"],
            a["lang"]) == ("audio", "A_OPUS", 48000.0, 2, "deu")
    assert a["width"] is None and a["height"] is None


def test_matroska_doctype_and_no_duration() -> None:
    blob = build_webm(_tracks(1), doctype="matroska")
    assert sniff_webm(blob) == "matroska"
    info = webm_movie_info(blob)
    assert info["duration_ms"] is None and info["n_clusters"] == 0


def test_nondefault_timestamp_scale() -> None:
    # 0.1 ms ticks: Duration float = duration_ms * 10, rescale back
    blob = build_webm(_tracks(2), duration_ms=777,
                      timestamp_scale=100_000)
    info = webm_movie_info(blob)
    assert info["timestamp_scale"] == 100_000
    assert info["duration_ms"] == 777


def test_roundtrip_property_sweep() -> None:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 4), st.integers(0, 3),
           st.integers(0, 10 ** 10), st.data())
    def check(n_tracks, n_clusters, dur_ms, data):
        tracks = []
        for k in range(n_tracks):
            vide = data.draw(st.booleans())
            t = {"number": k + 1,
                 "type": "video" if vide else "audio",
                 "codec": "V_AV1" if vide else "A_VORBIS",
                 "lang": data.draw(st.sampled_from(
                     ["und", "eng", "jpn"]))}
            if vide:
                t["width"] = data.draw(st.integers(1, 16384))
                t["height"] = data.draw(st.integers(1, 16384))
            else:
                t["hz"] = float(data.draw(st.integers(1, 192000)))
                t["channels"] = data.draw(st.integers(1, 8))
            tracks.append(t)
        info = webm_movie_info(build_webm(
            tracks, duration_ms=dur_ms, n_clusters=n_clusters))
        assert info["duration_ms"] == dur_ms
        assert info["n_clusters"] == n_clusters
        assert len(info["tracks"]) == n_tracks
        for spec, got in zip(tracks, info["tracks"]):
            assert got["number"] == spec["number"]
            assert got["type"] == spec["type"]
            assert got["codec"] == spec["codec"]
            assert got["lang"] == spec["lang"]
            if spec["type"] == "video":
                assert (got["width"], got["height"]) == \
                    (spec["width"], spec["height"])
            else:
                assert (got["hz"], got["channels"]) == \
                    (spec["hz"], spec["channels"])

    check()


@pytest.mark.parametrize("mutate,err", [
    (lambda b: b[:10], "EBML doctype"),
    (lambda b: b"RIFF" + b[4:], "EBML doctype"),
    (lambda b: b.replace(b"\x16\x54\xae\x6b", b"\x16\x54\xae\x6a",
                         1), "Segment without Tracks"),
    (lambda b: b.replace(b"\x15\x49\xa9\x66", b"\x15\x49\xa9\x67",
                         1), "Segment without Info"),
    (lambda b: b[:-4], "overruns scope"),
])
def test_damage_classes(mutate, err) -> None:
    blob = build_webm(_tracks(3), duration_ms=100)
    with pytest.raises(ValueError, match=err):
        webm_movie_info(mutate(blob))


def test_segment_missing() -> None:
    blob = build_webm(_tracks(4))
    _, hs, he = read_element(blob, 0, len(blob))
    with pytest.raises(ValueError):
        webm_movie_info(blob[:he])


def test_track_entry_missing_mandatory() -> None:
    # a TrackEntry without CodecID must be named, not skipped:
    # rebuild the Segment with a hand-made incomplete entry
    from cerberus_cpp_spark.sources.ebml import iter_elements

    base = build_webm(_tracks(6))
    _, _, he = read_element(base, 0, len(base))
    _, ss, se = read_element(base, he, len(base))
    info_full = next(
        _el(got, base[ps:pe])
        for got, ps, pe in iter_elements(base, ss, se)
        if got == b"\x15\x49\xa9\x66")
    bad_entry = _el(b"\xae", _el_uint(b"\xd7", 1)
                    + _el_uint(b"\x83", 1))   # no CodecID
    seg = info_full + _el(b"\x16\x54\xae\x6b", bad_entry)
    blob = base[:he] + _el(b"\x18\x53\x80\x67", seg)
    with pytest.raises(ValueError, match="TrackEntry missing"):
        webm_movie_info(blob)


def test_doctype_gate() -> None:
    with pytest.raises(ValueError, match="not matroska/webm"):
        build_webm(_tracks(7), doctype="theora")
    # a foreign doctype parses as EBML but is not ours
    blob = build_webm(_tracks(8))
    alien = blob.replace(b"webm", b"webX", 1)
    assert sniff_webm(alien) is None


def test_float32_duration_parses() -> None:
    # rebuild the Segment with a 4-byte-float Duration (the f32
    # branch the f64-writing builder never emits)
    from cerberus_cpp_spark.sources.ebml import iter_elements

    base = build_webm(_tracks(9))
    _, _, he = read_element(base, 0, len(base))
    _, ss, se = read_element(base, he, len(base))
    parts = []
    for got, ps, pe in iter_elements(base, ss, se):
        body = base[ps:pe]
        if got == b"\x15\x49\xa9\x66":
            body += _el(b"\x44\x89", struct.pack(">f", 512.0))
        parts.append(_el(got, body))
    blob = base[:he] + _el(b"\x18\x53\x80\x67", b"".join(parts))
    assert webm_movie_info(blob)["duration_ms"] == 512


def test_operator_routing_and_plan(spark) -> None:
    from cerberus_cpp_spark.operators.multimodal import (
        webm_track_frames,
    )

    rows = [
        ("ok2", bytearray(build_webm(_tracks(10), duration_ms=999,
                                     n_clusters=1))),
        ("null", None),
        ("cut", bytearray(build_webm(_tracks(10))[:10])),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = webm_track_frames(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {}
    for r in out.collect():
        got.setdefault(r["clip_id"], []).append(r)
    assert len(got["ok2"]) == 2
    assert all(r["ok"] for r in got["ok2"])
    v = next(r for r in got["ok2"] if r["track_type"] == "video")
    assert v["codec"] == "V_VP9" and v["width"] == 650
    assert v["movie_duration_ms"] == 999 and v["n_clusters"] == 1
    a = next(r for r in got["ok2"] if r["track_type"] == "audio")
    assert a["sampling_hz"] == 48000.0 and a["channels"] == 2
    assert got["null"][0]["message"] == "no payload"
    assert not got["cut"][0]["ok"]
