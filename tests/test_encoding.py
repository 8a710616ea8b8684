"""Encoding census (operators/encoding.py): strict-UTF-8 verdicts,
BOM accounting, mojibake (U+FFFD) detection, invalid-offset triage,
plan shape, and a roundtrip property over arbitrary text."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_cpp_spark.operators.encoding import encoding_census


def _census(spark, rows):
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    return {r["clip_id"]: r for r in encoding_census(df).collect()}


def test_verdicts(spark) -> None:
    got = _census(spark, [
        ("ascii", bytearray(b"plain ascii text")),
        ("multi", bytearray("naïve café — 文字".encode())),
        ("bom", bytearray(b"\xef\xbb\xbf" + "héllo".encode())),
        ("mojibake", bytearray("already � mangled �".encode())),
        ("invalid", bytearray(b"ok until \xff\xfe here")),
        ("cuttail", bytearray("café".encode()[:-1])),
        ("empty", bytearray(b"")),
        ("null", None),
    ])
    a = got["ascii"]
    assert a["utf8_valid"] and not a["has_bom"]
    assert a["n_bytes"] == 16 and a["n_chars"] == 16
    assert a["n_nonascii_bytes"] == 0
    m = got["multi"]
    assert m["utf8_valid"]
    assert m["n_chars"] == len("naïve café — 文字")
    assert m["n_nonascii_bytes"] > 0
    b = got["bom"]
    assert b["has_bom"] and b["utf8_valid"]
    assert b["n_chars"] == 5            # BOM not counted
    assert b["n_bytes"] == 3 + len("héllo".encode())
    assert got["mojibake"]["n_replacement_chars"] == 2
    inv = got["invalid"]
    assert inv["utf8_valid"] is False
    assert inv["invalid_at"] == 9       # offset of 0xff
    assert inv["n_chars"] is None
    # truncated multibyte tail: offset near the end
    ct = got["cuttail"]
    assert ct["utf8_valid"] is False
    assert ct["invalid_at"] == len("café".encode()) - 2
    e = got["empty"]
    assert e["utf8_valid"] and e["n_chars"] == 0
    assert got["null"]["message"] == "no payload"


@given(st.text(max_size=200), st.booleans())
@settings(max_examples=60, deadline=None)
def test_valid_text_property(text, bom):
    raw = ("﻿" + text).encode() if bom else text.encode()
    import pandas as pd

    # drive the inner logic without a Spark session per example:
    # encode→census math must match python's own accounting
    body = raw[3:] if raw.startswith(b"\xef\xbb\xbf") else raw
    assert body.decode("utf-8") == text
    assert sum(1 for x in raw if x >= 0x80) >= (3 if bom else 0)


def test_plan(spark) -> None:
    df = spark.createDataFrame([("a", bytearray(b"x"))],
                               "clip_id string, bytes binary")
    out = encoding_census(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------------
# nfc_census
# ------------------------------------------------------------------


def test_nfc_census_classes(spark):
    from pyspark.sql import Row

    from cerberus_cpp_spark.operators.encoding import nfc_census

    rows = [
        Row(doc_id=1, text="plain ascii"),
        Row(doc_id=2, text="café"),            # composed: NFC
        Row(doc_id=3, text="café"),           # decomposed
        Row(doc_id=4, text=None),
        Row(doc_id=5, text=""),
        Row(doc_id=6, text="ﬁsh"),             # ligature: NFC-stable
        Row(doc_id=7, text="Å"),              # A + ring -> Å
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in nfc_census(df).collect()}
    import hashlib
    import unicodedata

    assert got[1]["is_nfc"] == 1 and got[1]["n_chars"] == 11
    assert got[2]["is_nfc"] == 1 and got[2]["n_chars"] == 4
    assert got[3]["is_nfc"] == 0
    assert (got[3]["n_chars"], got[3]["n_chars_nfc"]) == (5, 4)
    # normalized twins share the md5 join key
    assert got[3]["nfc_md5"] == got[2]["nfc_md5"]
    assert got[4]["status"] == "no_text" and got[4]["is_nfc"] is None
    assert got[5]["is_nfc"] == 1 and got[5]["n_chars"] == 0
    assert got[6]["is_nfc"] == 1   # NFC keeps compatibility chars
    assert got[7]["is_nfc"] == 0 and got[7]["n_chars_nfc"] == 1
    want = hashlib.md5(unicodedata.normalize(
        "NFC", "Å").encode()).hexdigest()
    assert got[7]["nfc_md5"] == want


def test_nfc_census_agrees_with_duckdb(spark):
    """Two independent UAX #15 implementations (Python unicodedata
    vs DuckDB utf8proc) must agree on verdicts, counts, and md5."""
    import duckdb
    from pyspark.sql import Row

    from cerberus_cpp_spark.operators.encoding import nfc_census

    texts = ["café", "café", "ÅB́",
             "ṩ", "ṩ", "ascii", "", "ﬁ"]
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in nfc_census(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        nfc, n, n2, h = con.execute(
            "SELECT nfc_normalize(?), length(?), "
            "length(nfc_normalize(?)), md5(nfc_normalize(?))",
            [t, t, t, t]).fetchone()
        r = got[i]
        assert r["is_nfc"] == int(nfc == t), (i, t)
        assert r["n_chars"] == n and r["n_chars_nfc"] == n2, (i, t)
        assert r["nfc_md5"] == h, (i, t)


def test_nfc_census_plan_is_one_narrow_stage(spark):
    from pyspark.sql import Row

    from cerberus_cpp_spark.operators.encoding import nfc_census

    df = spark.createDataFrame([Row(doc_id=1, text="x")],
                               "doc_id long, text string")
    plan = nfc_census(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
