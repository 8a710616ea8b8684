"""Decode-free JPEG quality census: DQT walk + exact IJG inversion.

The operator's whole contract rests on one invariant — all 100
(luma, chroma) pairs under the IJG scaling are DISTINCT, so an exact
match identifies the encoder's quality setting — pinned here.
Reference analogue: rules.hh min/max over a derived scalar.
"""
from __future__ import annotations

import numpy as np
import pytest

from cerberus_cpp_spark.sources.jpegcodec import (
    QUANT_CHROMA,
    QUANT_LUMA,
    encode_jpeg,
    estimate_ijg_quality,
    implied_scale_pct,
    parse_dqt_tables,
    quality_tables,
)


def _px(seed: int = 3, w: int = 16, h: int = 12) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_all_100_quality_levels_distinct_and_invert():
    seen = set()
    for q in range(1, 101):
        y, c = quality_tables(q)
        key = (y.tobytes(), c.tobytes())
        assert key not in seen, f"quality {q} collides"
        seen.add(key)
        assert estimate_ijg_quality(y, c) == q
        assert estimate_ijg_quality(y) == q  # luma alone suffices too


def test_parse_roundtrip_and_natural_order():
    blob = encode_jpeg(_px(), quality=77)
    d = parse_dqt_tables(blob)
    assert set(d["tables"]) == {0, 1}
    assert d["n_segments"] == 1
    y, c = quality_tables(77)
    (py, ty), (pc, tc) = d["tables"][0], d["tables"][1]
    assert py == pc == 8
    assert np.array_equal(ty, y) and np.array_equal(tc, c)


def test_custom_table_no_match_and_approx():
    blob = bytearray(encode_jpeg(_px(), quality=50))
    i = blob.find(b"\xff\xdb")
    assert blob[i + 4] == 0x00  # Pq=0, Tq=0 (luma first)
    assert blob[i + 5] == 16    # q=50 => scale 100 => luma DC = base
    blob[i + 5] = 17
    d = parse_dqt_tables(bytes(blob))
    assert estimate_ijg_quality(d["tables"][0][1],
                                d["tables"][1][1]) is None
    # 63 coefficients imply exactly 100; the patched DC implies
    # floor((200*17+16)/32) = 106; floor((63*100+106)/64) = 100 —
    # the constant the contract oracle hardcodes.
    assert implied_scale_pct(d["tables"][0][1], QUANT_LUMA) == 100
    assert implied_scale_pct(QUANT_CHROMA, QUANT_CHROMA) == 100


def test_parse_rejects_truncation_everywhere():
    blob = encode_jpeg(_px(), quality=60)
    sos = blob.find(b"\xff\xda")
    # every prefix that ends before the SOS segment completes is
    # structurally invalid — a handful of representative cuts
    for cut in (1, 2, 3, 10, sos - 1, sos + 1, sos + 3):
        with pytest.raises(ValueError):
            parse_dqt_tables(blob[:cut])
    with pytest.raises(ValueError):
        parse_dqt_tables(b"\x89PNG\r\n\x1a\n")


def test_parse_16bit_tables():
    tbl = b"".join(int(256 + i).to_bytes(2, "big") for i in range(64))
    dqt = b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + b"\x10" + tbl
    blob = b"\xff\xd8" + dqt + b"\xff\xda\x00\x02"
    d = parse_dqt_tables(blob)
    assert set(d["tables"]) == {0}
    prec, t = d["tables"][0]
    assert prec == 16
    assert t.min() == 256 and t.max() == 319 and t.dtype == np.int64


def test_operator_all_arms(spark):
    from cerberus_cpp_spark.operators.image_checks import (
        jpeg_quality_audit,
    )

    png = bytes.fromhex("89504e470d0a1a0a") + b"\x00" * 20
    custom = bytearray(encode_jpeg(_px(), quality=50))
    custom[custom.find(b"\xff\xdb") + 5] = 17
    tbl16 = b"".join(int(300).to_bytes(2, "big") for _ in range(64))
    sixteen = (b"\xff\xd8" + b"\xff\xdb"
               + (131).to_bytes(2, "big") + b"\x10" + tbl16
               + b"\xff\xda\x00\x02")
    rows = [
        ("a", encode_jpeg(_px(), quality=88)),
        ("b", None),
        ("c", png),
        ("d", b"\x01junkjunk"),
        ("e", bytes(custom)),
        ("f", encode_jpeg(_px(), quality=88)[:30]),
        ("g", sixteen),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r.asDict()
           for r in jpeg_quality_audit(df).collect()}
    assert got["a"]["status"] == "ok"
    assert got["a"]["matched_quality"] == 88
    assert got["a"]["approx_scale_pct"] is None
    assert got["a"]["n_tables"] == 2 and not got["a"]["has_16bit"]
    assert got["b"]["status"] == "no_payload"
    assert got["c"]["status"] == "not_jpeg"
    assert got["d"]["status"] == "malformed"
    assert got["e"]["status"] == "ok"
    assert got["e"]["matched_quality"] is None
    assert got["e"]["approx_scale_pct"] == 100
    assert got["f"]["status"] == "malformed"
    assert got["g"]["status"] == "ok"
    assert got["g"]["has_16bit"] is True
    assert got["g"]["matched_quality"] is None
    assert got["g"]["approx_scale_pct"] is None
    assert got["g"]["n_tables"] == 1


def test_sof_info_on_real_and_fixture_streams():
    from cerberus_cpp_spark.sources.jpegcodec import (
        build_sof_fixture,
        parse_sof_info,
    )

    s = parse_sof_info(encode_jpeg(_px(), quality=80, restart_interval=3))
    assert s["process"] == "baseline" and s["subsampling"] == "4:4:4"
    assert (s["w"], s["h"]) == (16, 12) and s["restart_interval"] == 3
    s = parse_sof_info(build_sof_fixture(
        process=0xC2, comps=[(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]))
    assert s["process"] == "progressive" and s["subsampling"] == "4:2:0"
    s = parse_sof_info(build_sof_fixture(comps=[(1, 1, 2, 0),
                                                (2, 1, 1, 1),
                                                (3, 1, 1, 1)]))
    assert s["subsampling"] == "4:4:0"
    s = parse_sof_info(build_sof_fixture(comps=[(1, 4, 1, 0),
                                                (2, 1, 1, 1),
                                                (3, 1, 1, 1)]))
    assert s["subsampling"] == "other"
    with pytest.raises(ValueError):
        parse_sof_info(b"\xff\xd8\xff\xda\x00\x02")  # no SOF
    with pytest.raises(ValueError):
        parse_sof_info(build_sof_fixture()[:9])      # mid-SOF cut


def test_sof_census_operator(spark):
    from cerberus_cpp_spark.operators.image_checks import jpeg_sof_census
    from cerberus_cpp_spark.sources.jpegcodec import build_sof_fixture

    rows = [
        ("base", encode_jpeg(_px(), quality=70)),
        ("prog420", build_sof_fixture(process=0xC2)),
        ("grey", build_sof_fixture(comps=[(1, 1, 1, 0)])),
        ("nosof", b"\xff\xd8\xff\xda\x00\x02"),
        ("png", bytes.fromhex("89504e470d0a1a0a") + b"\x00" * 8),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    got = {r["image_id"]: r.asDict()
           for r in jpeg_sof_census(df).collect()}
    assert got["base"]["subsampling"] == "4:4:4"
    assert got["base"]["process"] == "baseline"
    assert got["prog420"]["process"] == "progressive"
    assert got["prog420"]["subsampling"] == "4:2:0"
    assert got["grey"]["subsampling"] == "grayscale"
    assert got["grey"]["n_components"] == 1
    assert got["nosof"]["status"] == "malformed"
    assert got["png"]["status"] == "not_jpeg"
    assert got["nul"]["status"] == "no_payload"
