"""Ogg structural layer (sources/ogg.py): RFC 3533 page grammar,
CRC, build→parse roundtrip over the spec-valid parameter space, and
damage routing. The CRC is pinned against an independent bitwise
implementation written directly from RFC 3533 appendix A (the module
uses a byte-table) — the same dual-implementation conformance
strategy as the codec interop pins."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_cpp_spark.sources.ogg import (
    FLAG_BOS,
    FLAG_EOS,
    build_ogg_opus,
    build_ogg_vorbis,
    iter_pages,
    ogg_crc,
    ogg_stream_info,
    sniff_ogg,
)


def _crc_bitwise(data: bytes) -> int:
    """Independent RFC 3533 appendix-A CRC: process bit-by-bit."""
    r = 0
    for byte in data:
        for k in range(7, -1, -1):
            bit = (byte >> k) & 1
            top = (r >> 31) & 1
            r = ((r << 1) & 0xFFFFFFFF)
            if top ^ bit:
                r ^= 0x04C11DB7
    return r


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_crc_matches_bitwise(data):
    assert ogg_crc(data) == _crc_bitwise(data)


def test_crc_empty_and_zero():
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"\x00" * 8) == 0


def test_opus_roundtrip():
    blob = build_ogg_opus(serial=7, n_audio_pages=4,
                          duration_ms=2500, pre_skip=312,
                          channels=2)
    assert sniff_ogg(blob)
    info = ogg_stream_info(blob)
    assert info == {"codec": "opus", "channels": 2, "rate": 48000,
                    "pre_skip": 312, "n_pages": 6,
                    "duration_ms": 2500, "crc_ok": True,
                    "eos": True}


def test_vorbis_roundtrip():
    blob = build_ogg_vorbis(serial=9, n_audio_pages=3,
                            duration_ms=1000, rate=44100,
                            channels=1)
    info = ogg_stream_info(blob)
    assert info["codec"] == "vorbis"
    assert info["channels"] == 1
    assert info["rate"] == 44100
    assert info["pre_skip"] == 0
    assert info["n_pages"] == 4
    # duration replays the builder's integer granule arithmetic
    assert info["duration_ms"] == (1000 * 44100 // 1000) \
        * 1000 // 44100
    assert info["crc_ok"] and info["eos"]


@given(st.integers(1, 10), st.integers(0, 100_000),
       st.integers(0, 4000), st.sampled_from([1, 2, 6]))
@settings(max_examples=60, deadline=None)
def test_opus_duration_property(n_pages, dur_ms, pre_skip, ch):
    blob = build_ogg_opus(serial=1, n_audio_pages=n_pages,
                          duration_ms=dur_ms, pre_skip=pre_skip,
                          channels=ch)
    info = ogg_stream_info(blob)
    assert info["duration_ms"] == dur_ms
    assert info["pre_skip"] == pre_skip
    assert info["channels"] == ch
    assert info["n_pages"] == n_pages + 2
    assert info["crc_ok"] and info["eos"]


@given(st.integers(1, 8), st.integers(0, 60_000),
       st.sampled_from([8000, 22050, 44100, 48000]))
@settings(max_examples=60, deadline=None)
def test_vorbis_duration_property(n_pages, dur_ms, rate):
    blob = build_ogg_vorbis(serial=3, n_audio_pages=n_pages,
                            duration_ms=dur_ms, rate=rate)
    info = ogg_stream_info(blob)
    # granule floor then ms floor — within one granule's ms
    assert 0 <= dur_ms - info["duration_ms"] <= (1000 + rate) // rate
    assert info["n_pages"] == n_pages + 1


def test_page_fields_and_flags():
    blob = build_ogg_opus(serial=42, n_audio_pages=2,
                          duration_ms=100)
    pages = list(iter_pages(blob))
    assert [p[3] for p in pages] == [0, 1, 2, 3]     # sequence
    assert all(p[2] == 42 for p in pages)            # serial
    assert pages[0][0] & FLAG_BOS
    assert pages[-1][0] & FLAG_EOS
    assert all(p[4] for p in pages)                  # crc ok


def test_damage_routing():
    blob = build_ogg_opus(serial=1, n_audio_pages=2,
                          duration_ms=500)
    with pytest.raises(ValueError, match="OggS BOS capture"):
        ogg_stream_info(b"NotAnOggStream" + blob[14:])
    with pytest.raises(ValueError, match="overruns"):
        ogg_stream_info(blob[:-3])           # mid-payload cut
    with pytest.raises(ValueError, match="truncated page header"):
        ogg_stream_info(blob + blob[:10])    # trailing partial page
    # version on the FIRST page is part of the sniff
    with pytest.raises(ValueError, match="OggS BOS capture"):
        ogg_stream_info(blob[:4] + b"\x01" + blob[5:])
    _, _, _, _, _, _, pe = next(iter_pages(blob))
    # a non-zero version on a LATER page names the version
    with pytest.raises(ValueError, match="stream version"):
        ogg_stream_info(blob[:pe + 4] + b"\x01" + blob[pe + 5:])
    # second page capture corrupted → bad capture at that offset
    bad = blob[:pe] + b"XggS" + blob[pe + 4:]
    with pytest.raises(ValueError, match="bad capture"):
        ogg_stream_info(bad)
    with pytest.raises(ValueError, match="unknown BOS codec"):
        # corrupt the OpusHead magic inside the BOS packet
        ogg_stream_info(blob.replace(b"OpusHead", b"XpusHead", 1))


def test_sequence_gap_and_serial_mix():
    blob = build_ogg_opus(serial=1, n_audio_pages=2,
                          duration_ms=500)
    # bump the second page's sequence number and re-CRC it
    pages = list(iter_pages(blob))
    off2 = pages[0][6]
    raw = bytearray(blob)
    struct.pack_into("<I", raw, off2 + 18, 9)
    zeroed = bytes(raw[off2:off2 + 22]) + b"\x00" * 4 \
        + bytes(raw[off2 + 26:pages[1][6]])
    struct.pack_into("<I", raw, off2 + 22, ogg_crc(zeroed))
    with pytest.raises(ValueError, match="sequence gap"):
        ogg_stream_info(bytes(raw))
    raw = bytearray(blob)
    struct.pack_into("<I", raw, off2 + 14, 77)
    zeroed = bytes(raw[off2:off2 + 22]) + b"\x00" * 4 \
        + bytes(raw[off2 + 26:pages[1][6]])
    struct.pack_into("<I", raw, off2 + 22, ogg_crc(zeroed))
    with pytest.raises(ValueError, match="mixed bitstream"):
        ogg_stream_info(bytes(raw))


def test_crc_damage_reported_not_fatal():
    """A flipped payload byte breaks the page CRC but not the
    structure: the walk completes with crc_ok=False."""
    blob = build_ogg_opus(serial=1, n_audio_pages=1,
                          duration_ms=20)
    pages = list(iter_pages(blob))
    ps, pe = pages[-1][5], pages[-1][6]
    bad = blob[:ps] + bytes([blob[ps] ^ 0xFF]) + blob[ps + 1:pe]
    info = ogg_stream_info(bad)
    assert info["crc_ok"] is False
    assert info["n_pages"] == 3


def test_lacing_over_255():
    """A packet longer than 255 bytes spans multiple lacing
    segments within one page."""
    blob = build_ogg_opus(serial=5, n_audio_pages=1,
                          duration_ms=10)
    # OpusTags page payload is short; build a long-tags variant by
    # hand through the public builder path: verify the comment page
    # of a vorbis stream with a 0-length payload parses, then a
    # direct long-packet page via the private helper.
    from cerberus_cpp_spark.sources.ogg import _lacing, _page
    pkt = bytes(range(256)) * 3
    page = _page(0, 0, 1, 7, pkt)
    assert page[26] == len(_lacing(len(pkt)))
    (htype, granule, serial, seq, crc_ok, ps,
     pe) = next(iter_pages(page))
    assert (serial, seq, crc_ok) == (1, 7, True)
    assert page[ps:pe] == pkt
    assert sniff_ogg(blob)


def test_operator_routing_and_plan(spark) -> None:
    """ogg_stream_frames: one narrow Arrow stage (zero Exchange),
    per-clip ok=false routing for null/damaged payloads."""
    from cerberus_cpp_spark.operators.multimodal import (
        ogg_stream_frames,
    )

    good = build_ogg_opus(serial=3, n_audio_pages=2,
                          duration_ms=750, pre_skip=100,
                          channels=2)
    rows = [
        ("ok", bytearray(good)),
        ("null", None),
        ("cut", bytearray(good[:10])),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = ogg_stream_frames(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["clip_id"]: r for r in out.collect()}
    assert got["ok"]["ok"] and got["ok"]["codec"] == "opus"
    assert got["ok"]["duration_ms"] == 750
    assert got["ok"]["pre_skip"] == 100
    assert got["ok"]["crc_ok"] and got["ok"]["eos"]
    assert got["null"]["message"] == "no payload"
    assert not got["cut"]["ok"]
    assert "OggS BOS capture" in got["cut"]["message"]
