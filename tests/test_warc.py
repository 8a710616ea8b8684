"""WARC record layer (sources/warc.py): build→parse roundtrip,
mandatory-header enforcement, HTTP-status extraction, damage
routing, and the census operator's plan."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_cpp_spark.sources.warc import (
    MSG_HEADER,
    MSG_LENGTH,
    MSG_MANDATORY,
    MSG_NOT_WARC,
    MSG_SEPARATOR,
    build_warc,
    sniff_warc,
    warc_records,
)


def _records():
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html>hi</html>")
    return [
        {"type": "warcinfo", "record_id": "<urn:uuid:1>",
         "block": b"software: cerberus\r\n"},
        {"type": "request", "record_id": "<urn:uuid:2>",
         "uri": "https://example.com/a",
         "content_type": "application/http;msgtype=request",
         "block": b"GET /a HTTP/1.1\r\n\r\n"},
        {"type": "response", "record_id": "<urn:uuid:3>",
         "uri": "https://example.com/a",
         "content_type": "application/http;msgtype=response",
         "block": http},
    ]


def test_roundtrip() -> None:
    blob = build_warc(_records())
    assert sniff_warc(blob)
    got = warc_records(blob)
    assert [r["type"] for r in got] == ["warcinfo", "request",
                                        "response"]
    assert got[0]["uri"] is None
    assert got[1]["uri"] == "https://example.com/a"
    assert got[2]["http_status"] == 200
    assert got[1]["http_status"] is None  # requests carry none
    assert got[2]["content_length"] == len(_records()[2]["block"])


def test_status_variants() -> None:
    for code in (200, 301, 404, 500):
        blk = f"HTTP/1.1 {code} X\r\n\r\nbody".encode()
        blob = build_warc([{
            "type": "response", "record_id": "<r>",
            "content_type": "application/http;msgtype=response",
            "block": blk}])
        assert warc_records(blob)[0]["http_status"] == code
    # non-http response content type → no status parsed
    blob = build_warc([{"type": "response", "record_id": "<r>",
                        "content_type": "text/plain",
                        "block": b"HTTP/1.1 200 OK"}])
    assert warc_records(blob)[0]["http_status"] is None


def test_damage_routing() -> None:
    blob = build_warc(_records())
    with pytest.raises(ValueError, match="version line"):
        warc_records(b"WARC/9.9\r\n" + blob[10:])
    with pytest.raises(ValueError, match="overruns"):
        warc_records(blob[:-10])
    # second record's version line corrupted → header malformed
    second = blob.find(b"WARC/1.0", 10)
    bad = blob[:second] + b"XARC" + blob[second + 4:]
    with pytest.raises(ValueError, match=MSG_HEADER):
        warc_records(bad)
    # drop a mandatory header
    bad = blob.replace(b"WARC-Date", b"X-NonDate", 1)
    with pytest.raises(ValueError, match=MSG_MANDATORY):
        warc_records(bad)
    # separator clipped exactly
    with pytest.raises(ValueError, match=MSG_SEPARATOR):
        warc_records(blob[:-4] + b"XXXX")
    # declared length larger than the block
    bad = blob.replace(b"Content-Length: 20",
                       b"Content-Length: 21", 1)
    with pytest.raises(ValueError,
                       match=f"{MSG_LENGTH}|{MSG_SEPARATOR}"):
        warc_records(bad)


@given(st.lists(st.tuples(st.integers(0, 400),
                          st.sampled_from(["response", "resource",
                                           "metadata"])),
                min_size=1, max_size=8))
@settings(max_examples=40, deadline=None)
def test_roundtrip_property(specs) -> None:
    recs = [{"type": t, "record_id": f"<urn:uuid:{k}>",
             "uri": f"https://x.test/{k}",
             "block": bytes((k + j) % 251 for j in range(sz))}
            for k, (sz, t) in enumerate(specs)]
    got = warc_records(build_warc(recs))
    assert [(r["type"], r["content_length"], r["uri"])
            for r in got] == [
        (r["type"], len(r["block"]), r["uri"]) for r in recs]


def test_operator_routing_and_plan(spark) -> None:
    from cerberus_cpp_spark.operators.multimodal import warc_census

    blob = build_warc(_records())
    rows = [
        ("ok", bytearray(blob)),
        ("null", None),
        ("plain", bytearray(b"HTTP/1.1 200 OK\r\n\r\nnope")),
        ("cut", bytearray(blob[:-10])),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = warc_census(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {}
    for r in out.collect():
        got.setdefault(r["clip_id"], []).append(r)
    assert len(got["ok"]) == 3
    resp = next(r for r in got["ok"]
                if r["record_type"] == "response")
    assert resp["http_status"] == 200
    assert resp["n_records"] == 3
    assert got["null"][0]["message"] == "no payload"
    assert got["plain"][0]["message"] == MSG_NOT_WARC
    assert got["cut"][0]["message"] == MSG_LENGTH


def test_response_bodies() -> None:
    from cerberus_cpp_spark.sources.warc import warc_response_bodies

    blob = build_warc(_records())
    got = warc_response_bodies(blob)
    assert len(got) == 1
    assert got[0]["uri"] == "https://example.com/a"
    assert got[0]["http_status"] == 200
    assert got[0]["body"] == b"<html>hi</html>"
    # headerless block → empty body, status parsed from line 1
    blob2 = build_warc([{"type": "response", "record_id": "<r>",
                         "content_type": "application/http",
                         "block": b"HTTP/1.1 301 Moved"}])
    got2 = warc_response_bodies(blob2)
    assert got2[0]["body"] == b"" and got2[0]["http_status"] == 301
    with pytest.raises(ValueError, match="version line"):
        warc_response_bodies(b"junk")


def test_warc_text_frames(spark) -> None:
    from cerberus_cpp_spark.operators.multimodal import (
        warc_text_frames,
    )

    blob = build_warc(_records())
    rows = [("c1", bytearray(blob)), ("bad", bytearray(b"junk")),
            ("null", None)]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = warc_text_frames(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = out.collect()
    assert len(got) == 1        # bad/null silently dropped
    assert got[0]["html"] == "<html>hi</html>"
    assert got[0]["http_status"] == 200
