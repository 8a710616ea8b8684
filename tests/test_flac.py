"""FLAC structural layer (sources/flac.py): STREAMINFO bit-packing
roundtrip over the spec-valid parameter space, block-walk flags, and
damage routing."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_cpp_spark.sources.flac import (
    build_flac,
    flac_stream_info,
    sniff_flac,
)


def test_roundtrip_basic():
    blob = build_flac(rate=44100, channels=2, bps=16,
                      total_samples=44100 * 3 + 7)
    assert sniff_flac(blob)
    info = flac_stream_info(blob)
    assert info["rate"] == 44100
    assert info["channels"] == 2
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 44100 * 3 + 7
    assert info["duration_ms"] == (44100 * 3 + 7) * 1000 // 44100
    assert info["md5_set"] is True
    assert info["n_blocks"] == 2
    assert info["block_types"] == ["streaminfo", "vorbis_comment"]


@given(st.sampled_from([8000, 16000, 22050, 44100, 48000, 96000,
                        192000]),
       st.integers(1, 8), st.sampled_from([8, 16, 24, 32]),
       st.integers(0, (1 << 36) - 1), st.integers(0, 3))
@settings(max_examples=120, deadline=None)
def test_streaminfo_bitpack_property(rate, ch, bps, total, pads):
    blob = build_flac(rate=rate, channels=ch, bps=bps,
                      total_samples=total, n_padding=pads)
    info = flac_stream_info(blob)
    assert info["rate"] == rate
    assert info["channels"] == ch
    assert info["bits_per_sample"] == bps
    assert info["total_samples"] == total
    assert info["duration_ms"] == (total * 1000 // rate
                                   if total else None)
    assert info["n_blocks"] == 2 + pads
    assert info["block_types"] == (["streaminfo", "vorbis_comment"]
                                   + ["padding"] * pads)


def test_streamed_encode_null_duration():
    info = flac_stream_info(build_flac(rate=48000, channels=1,
                                       bps=16, total_samples=0))
    assert info["duration_ms"] is None
    assert info["total_samples"] == 0


def test_no_vendor_single_block():
    info = flac_stream_info(build_flac(rate=48000, channels=1,
                                       bps=16, total_samples=480,
                                       vendor=None))
    assert info["n_blocks"] == 1
    assert info["block_types"] == ["streaminfo"]


def test_damage_routing():
    blob = build_flac(rate=48000, channels=2, bps=24,
                      total_samples=48000)
    with pytest.raises(ValueError, match="fLaC magic"):
        flac_stream_info(b"fLaX" + blob[4:])
    with pytest.raises(ValueError, match="overruns"):
        flac_stream_info(blob[:-3])
    # kill the last-block flag on the final block
    raw = bytearray(blob)
    # find the vorbis_comment header: byte 4 is STREAMINFO header
    si_end = 4 + 4 + 34
    assert raw[si_end] & 0x80 != 0 or True
    raw[si_end] &= 0x7F
    with pytest.raises(ValueError, match="last-metadata-block"):
        flac_stream_info(bytes(raw))
    # zero sample rate is rejected by the parser (builder refuses
    # to make one, so patch the packed field directly)
    raw = bytearray(blob)
    packed = int.from_bytes(raw[4 + 4 + 10:4 + 4 + 18], "big")
    packed &= (1 << 44) - 1
    raw[4 + 4 + 10:4 + 4 + 18] = packed.to_bytes(8, "big")
    with pytest.raises(ValueError, match="sample rate 0"):
        flac_stream_info(bytes(raw))
    # first block not STREAMINFO
    raw = bytearray(blob)
    raw[4] = (raw[4] & 0x80) | 1
    with pytest.raises(ValueError, match="not STREAMINFO"):
        flac_stream_info(bytes(raw))


def test_builder_guards():
    with pytest.raises(ValueError, match="channels"):
        build_flac(rate=48000, channels=9, bps=16, total_samples=1)
    with pytest.raises(ValueError, match="bits-per-sample"):
        build_flac(rate=48000, channels=2, bps=33, total_samples=1)
    with pytest.raises(ValueError, match="field range"):
        build_flac(rate=1 << 20, channels=2, bps=16,
                   total_samples=1)


def test_operator_routing_and_plan(spark) -> None:
    """flac_stream_frames: one narrow Arrow stage (zero Exchange),
    per-clip ok=false routing for null/damaged payloads."""
    from cerberus_cpp_spark.operators.multimodal import (
        flac_stream_frames,
    )

    good = build_flac(rate=44100, channels=2, bps=16,
                      total_samples=44100 * 2, n_padding=1)
    rows = [
        ("ok", bytearray(good)),
        ("null", None),
        ("bad", bytearray(b"XLaC" + good[4:])),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = flac_stream_frames(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["clip_id"]: r for r in out.collect()}
    assert got["ok"]["ok"] and got["ok"]["rate"] == 44100
    assert got["ok"]["duration_ms"] == 2000
    assert got["ok"]["block_types"] == ["streaminfo",
                                        "vorbis_comment", "padding"]
    assert got["null"]["message"] == "no payload"
    assert not got["bad"]["ok"]
    assert "fLaC magic" in got["bad"]["message"]
