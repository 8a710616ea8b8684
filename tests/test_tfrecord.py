"""TFRecord structural layer (sources/tfrecord.py): CRC-32C pinned
against an independent bitwise implementation AND the published
check value, masked-CRC framing roundtrip, damage routing, operator
plan."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_cpp_spark.sources.tfrecord import (
    MSG_DATA_CRC,
    MSG_EMPTY,
    MSG_LEN_CRC,
    MSG_TRUNC,
    build_tfrecord,
    crc32c,
    masked_crc,
    sniff_tfrecord,
    tfrecord_records,
)


def _crc32c_bitwise(data: bytes) -> int:
    """Independent bit-by-bit reflected CRC-32C."""
    r = 0xFFFFFFFF
    for byte in data:
        r ^= byte
        for _ in range(8):
            r = (r >> 1) ^ 0x82F63B78 if r & 1 else r >> 1
    return r ^ 0xFFFFFFFF


def test_crc32c_check_value() -> None:
    # the published CRC-32C check value (RFC 3720 appendix B.4)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=150, deadline=None)
def test_crc32c_matches_bitwise(data):
    assert crc32c(data) == _crc32c_bitwise(data)


def test_mask_formula() -> None:
    c = crc32c(b"\x08\x00\x00\x00\x00\x00\x00\x00")
    assert masked_crc(b"\x08\x00\x00\x00\x00\x00\x00\x00") \
        == (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def test_roundtrip() -> None:
    payloads = [b"example-one", b"", b"\x00" * 500, b"tail"]
    blob = build_tfrecord(payloads)
    assert sniff_tfrecord(blob)
    got = tfrecord_records(blob)
    assert [r["length"] for r in got] == [11, 0, 500, 4]
    assert all(r["crc_ok"] for r in got)


@given(st.lists(st.binary(min_size=0, max_size=400),
                min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_roundtrip_property(payloads):
    got = tfrecord_records(build_tfrecord(payloads))
    assert [r["length"] for r in got] == [len(p) for p in payloads]
    assert all(r["crc_ok"] for r in got)


def test_damage_routing() -> None:
    blob = build_tfrecord([b"record-a" * 10, b"record-b" * 5])
    with pytest.raises(ValueError, match=MSG_EMPTY):
        tfrecord_records(b"")
    with pytest.raises(ValueError, match=MSG_TRUNC):
        tfrecord_records(blob[:-3])
    with pytest.raises(ValueError, match=MSG_LEN_CRC):
        tfrecord_records(b"\xff" + blob[1:])
    assert not sniff_tfrecord(b"\xff" + blob[1:])
    # flip one payload byte: framing survives, crc_ok=false
    bad = blob[:13] + bytes([blob[13] ^ 0xFF]) + blob[14:]
    got = tfrecord_records(bad)
    assert got[0]["crc_ok"] is False
    assert got[1]["crc_ok"] is True


def test_operator_routing_and_plan(spark) -> None:
    from cerberus_cpp_spark.operators.multimodal import (
        tfrecord_census,
    )

    blob = build_tfrecord([b"a" * 10, b"b" * 20])
    rows = [
        ("ok", bytearray(blob)),
        ("null", None),
        ("cut", bytearray(blob[:-3])),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = tfrecord_census(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {}
    for r in out.collect():
        got.setdefault(r["clip_id"], []).append(r)
    assert [r["length"] for r in got["ok"]] == [10, 20]
    assert all(r["crc_ok"] and r["n_records"] == 2
               for r in got["ok"])
    assert got["null"][0]["message"] == "no payload"
    assert got["cut"][0]["message"] == MSG_TRUNC
