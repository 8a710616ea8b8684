"""MPEG-audio structural layer: frame-header arithmetic, chain-walk
audit (truncation / parameter-change / ID3 accounting / CBR-VBR),
WAV header info, and the audio_header_info operator."""

from __future__ import annotations

import numpy as np
import pytest

from cerberus_cpp_spark.sources import mpegaudio as ma
from cerberus_cpp_spark.sources.wavcodec import (
    encode_wav,
    synth_pcm,
    wav_header_info,
)


def test_frame_header_arithmetic() -> None:
    f = ma.build_frame(bitrate_kbps=128, sample_rate=44100)
    h = ma.parse_frame_header(f)
    assert h["version"] == "1" and h["layer"] == 3
    assert h["bitrate_kbps"] == 128 and h["sample_rate"] == 44100
    assert h["frame_bytes"] == 144000 * 128 // 44100 == 417
    assert len(f) == 417 and h["samples"] == 1152
    assert h["channels"] == 2 and not h["padding"]
    hp = ma.parse_frame_header(
        ma.build_frame(bitrate_kbps=128, sample_rate=44100,
                       padding=True, mono=True))
    assert hp["frame_bytes"] == 418 and hp["channels"] == 1
    with pytest.raises(ValueError):
        ma.parse_frame_header(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        ma.build_frame(bitrate_kbps=123, sample_rate=44100)


def test_audit_cbr_vbr_id3_and_duration() -> None:
    frames = [ma.build_frame(bitrate_kbps=128, sample_rate=48000)
              for _ in range(5)]
    pay = ma.build_id3v2(40) + b"".join(frames) \
        + b"TAG" + b"\x00" * 125
    a = ma.audit_mpeg_audio(pay)
    assert a["ok"] and a["n_frames"] == 5
    assert a["id3v2"] and a["id3v1"] and a["cbr"]
    assert a["duration_ms"] == 5 * 1152 * 1000 // 48000 == 120
    assert a["bitrate_kbps_min"] == a["bitrate_kbps_max"] == 128
    # VBR: alternate bitrates
    vbr = b"".join(
        ma.build_frame(bitrate_kbps=(128 if i % 2 else 192),
                       sample_rate=44100)
        for i in range(4))
    av = ma.audit_mpeg_audio(vbr)
    assert av["ok"] and not av["cbr"]
    assert (av["bitrate_kbps_min"], av["bitrate_kbps_max"]) == (128, 192)


def test_audit_damage_classes() -> None:
    f = ma.build_frame(bitrate_kbps=96, sample_rate=32000)
    # truncated final frame
    a = ma.audit_mpeg_audio(f + f[:-10])
    assert not a["ok"] and "truncated" in a["message"]
    assert a["n_frames"] == 1
    # mid-stream sample-rate change
    g = ma.build_frame(bitrate_kbps=96, sample_rate=44100)
    a2 = ma.audit_mpeg_audio(f + g)
    assert not a2["ok"] and "parameters change" in a2["message"]
    # garbage / empty
    assert not ma.audit_mpeg_audio(b"not audio at all")["ok"]
    assert not ma.audit_mpeg_audio(ma.build_id3v2(8))["ok"]
    # trailing garbage after the last frame = bad sync
    a3 = ma.audit_mpeg_audio(f + b"\x12\x34\x56\x78\x9a")
    assert not a3["ok"]


def test_sniff() -> None:
    f = ma.build_frame(bitrate_kbps=64, sample_rate=44100)
    assert ma.sniff_mpeg_audio(f)
    assert ma.sniff_mpeg_audio(ma.build_id3v2(16) + f)
    assert not ma.sniff_mpeg_audio(b"RIFFxxxxWAVE")
    assert not ma.sniff_mpeg_audio(None)


def test_wav_header_info_matches_decode() -> None:
    pcm = synth_pcm(7, 4800)
    pay = encode_wav(pcm, sample_rate=16000)
    h = wav_header_info(pay)
    assert h["pcm"] and h["sample_rate"] == 16000
    assert h["n_samples"] == 4800
    assert h["duration_ms"] == 4800 * 1000 // 16000 == 300
    with pytest.raises(ValueError):
        wav_header_info(pay[:20])
    with pytest.raises(ValueError):
        wav_header_info(b"nope")


def test_audio_header_info_operator(spark, tmp_path) -> None:
    from cerberus_cpp_spark.operators.multimodal import audio_header_info

    mp3 = ma.build_id3v2(24) + b"".join(
        ma.build_frame(bitrate_kbps=160, sample_rate=44100)
        for _ in range(3))
    rows = [
        ("wav", encode_wav(synth_pcm(1, 1600), sample_rate=16000)),
        ("mpeg", mp3),
        ("mpeg-bad", mp3[:-20]),
        ("none", None),
        ("garbage", b"\x01\x02\x03\x04\x05\x06\x07\x08"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = {r["clip_id"]: r for r in audio_header_info(df).collect()}
    assert out["wav"]["ok"] and out["wav"]["fmt"] == "wav"
    assert out["wav"]["duration_ms"] == 100
    assert out["wav"]["cbr"] is None          # mpeg-only column
    m = out["mpeg"]
    assert m["ok"] and m["fmt"] == "mpeg" and m["n_frames"] == 3
    assert m["id3v2"] and not m["id3v1"] and m["cbr"]
    assert m["duration_ms"] == 3 * 1152 * 1000 // 44100
    assert out["mpeg-bad"]["ok"] is False
    assert "truncated" in out["mpeg-bad"]["message"]
    assert out["none"]["ok"] is False and out["none"]["fmt"] is None
    assert out["garbage"]["message"] == "unrecognized audio stream"
    # narrow plan
    p = str(tmp_path / "clips.parquet")
    df.write.parquet(p)
    plan = (audio_header_info(spark.read.parquet(p))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


# ---------------------------------------------------------------------------
# AAC ADTS structural layer (ISO/IEC 13818-7 frame arithmetic)
# ---------------------------------------------------------------------------


def test_adts_header_arithmetic() -> None:
    f = ma.build_adts_frame(sample_rate=48000, channel_config=2,
                           profile="lc", payload=50, crc=True,
                           raw_blocks=2, fullness=123)
    h = ma.parse_adts_header(f)
    assert h["sample_rate"] == 48000 and h["channels"] == 2
    assert h["profile"] == "lc" and h["crc"] is True
    assert h["frame_bytes"] == 9 + 50 == len(f)
    assert h["samples"] == 2048 and h["raw_blocks"] == 2
    assert h["fullness"] == 123 and h["header_bytes"] == 9
    # 7.1 mapping and PCE-in-band
    h7 = ma.parse_adts_header(ma.build_adts_frame(channel_config=7))
    assert h7["channels"] == 8
    h0 = ma.parse_adts_header(ma.build_adts_frame(channel_config=0))
    assert h0["channels"] is None
    # guards
    with pytest.raises(ValueError, match="sync"):
        ma.parse_adts_header(b"\x00" * 7)
    with pytest.raises(ValueError, match="sample rate"):
        ma.build_adts_frame(sample_rate=44000)
    with pytest.raises(ValueError, match="profile"):
        ma.build_adts_frame(profile="he")
    with pytest.raises(ValueError, match="raw_blocks"):
        ma.build_adts_frame(raw_blocks=5)
    with pytest.raises(ValueError, match="13 bits"):
        ma.build_adts_frame(payload=10_000)


def test_adts_sniff_disjoint_from_mpeg_audio() -> None:
    """ADTS carries layer bits 00 (reserved for MPEG audio) and MPEG
    audio carries layer != 0 (rejected by the ADTS parser): the two
    sniffers can never cross-classify a payload."""
    aac = ma.build_adts_frame() * 3
    mp3 = ma.build_frame(bitrate_kbps=128, sample_rate=44100) * 3
    assert ma.sniff_adts(aac) and not ma.sniff_mpeg_audio(aac)
    assert ma.sniff_mpeg_audio(mp3) and not ma.sniff_adts(mp3)
    assert ma.sniff_adts(ma.build_id3v2(16) + aac)
    assert not ma.sniff_adts(b"RIFF....WAVE")
    assert not ma.sniff_adts(None) and not ma.sniff_adts(b"\xff")


def test_adts_audit_chain_and_duration() -> None:
    f = ma.build_adts_frame(sample_rate=32000, channel_config=1,
                           profile="main", payload=40)
    a = ma.audit_adts(ma.build_id3v2(8) + f * 5)
    assert a["ok"] and a["n_frames"] == 5 and a["id3v2"]
    assert a["sample_rate"] == 32000 and a["channels"] == 1
    assert a["profile"] == "main"
    assert a["duration_ms"] == 5 * 1024 * 1000 // 32000
    assert a["crc_frames"] == 0 and a["raw_blocks"] == 5
    assert a["buffer_fullness_vbr"] is True  # default 0x7FF
    # CBR-style fullness: not the VBR marker
    g = ma.build_adts_frame(fullness=100)
    assert ma.audit_adts(g * 2)["buffer_fullness_vbr"] is False
    # multi-raw-block frames count 1024 samples per block
    mb = ma.build_adts_frame(raw_blocks=3)
    assert ma.audit_adts(mb)["duration_ms"] == 3 * 1024 * 1000 // 44100


def test_adts_audit_damage_classes() -> None:
    f = ma.build_adts_frame(payload=40)
    trunc = ma.audit_adts((f * 3)[:-10])
    assert not trunc["ok"] and "frame 2 truncated" in trunc["message"]
    assert trunc["n_frames"] == 2
    other = ma.build_adts_frame(payload=40, sample_rate=48000)
    pc = ma.audit_adts(f + other + f)
    assert not pc["ok"]
    assert pc["message"] == "stream parameters change at frame 1"
    assert ma.audit_adts(b"")["message"] == "no ADTS frames"
    # profile change is a parameter change too
    pm = ma.audit_adts(f + ma.build_adts_frame(payload=40,
                                             profile="main"))
    assert "parameters change" in pm["message"]


def test_audio_header_info_routes_adts(spark) -> None:
    from cerberus_cpp_spark.operators.multimodal import (
        audio_header_info,
    )

    aac = ma.build_adts_frame(sample_rate=44100, channel_config=2,
                             profile="ltp", payload=48, crc=True) * 4
    mp3 = ma.build_frame(bitrate_kbps=128, sample_rate=44100) * 2
    df = spark.createDataFrame(
        [("a", bytearray(aac)), ("b", bytearray(mp3)),
         ("c", bytearray((aac * 1)[:-5]))],
        "clip_id string, bytes binary")
    rows = {r["clip_id"]: r for r in audio_header_info(df).collect()}
    a = rows["a"]
    assert a["fmt"] == "adts" and a["ok"]
    assert a["profile"] == "ltp" and a["n_frames"] == 4
    assert a["duration_ms"] == 4 * 1024 * 1000 // 44100
    assert a["bitrate_kbps_min"] is None and a["cbr"] is None
    assert rows["b"]["fmt"] == "mpeg" and rows["b"]["profile"] is None
    c = rows["c"]
    assert c["fmt"] == "adts" and not c["ok"]
    assert "truncated" in c["message"]


def test_adts_build_parse_roundtrip_property() -> None:
    """Every spec-valid parameter combination survives build→parse
    bit-exactly, and chains of n frames audit to exact integer
    durations — pure arithmetic, no Spark."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(
        ridx=st.integers(0, 12),
        pidx=st.integers(0, 3),
        chan=st.integers(0, 7),
        payload=st.integers(1, 512),
        crc=st.booleans(),
        blocks=st.integers(1, 4),
        fullness=st.integers(0, 0x7FF),
        mpeg2=st.booleans(),
        n=st.integers(1, 6),
    )
    def check(ridx, pidx, chan, payload, crc, blocks, fullness,
              mpeg2, n):
        rate = ma._ADTS_RATES[ridx]
        prof = ma._ADTS_PROFILES[pidx]
        f = ma.build_adts_frame(
            sample_rate=rate, channel_config=chan, profile=prof,
            payload=payload, crc=crc, raw_blocks=blocks,
            fullness=fullness, mpeg2=mpeg2)
        h = ma.parse_adts_header(f)
        assert h["sample_rate"] == rate and h["profile"] == prof
        assert h["channel_config"] == chan
        assert h["crc"] is crc and h["raw_blocks"] == blocks
        assert h["fullness"] == fullness
        assert h["frame_bytes"] == len(f) == (9 if crc else 7) + payload
        assert h["mpeg_version"] == ("2" if mpeg2 else "4")
        a = ma.audit_adts(f * n)
        assert a["ok"] and a["n_frames"] == n
        assert a["duration_ms"] == blocks * 1024 * n * 1000 // rate
        assert a["raw_blocks"] == blocks * n
        # truncating the final frame must always be caught
        bad = ma.audit_adts((f * n)[:-1])
        assert not bad["ok"] and "truncated" in bad["message"]

    check()
