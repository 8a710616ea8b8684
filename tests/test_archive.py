"""Archive layer (sources/archive.py): ustar TAR header arithmetic
and ZIP central-directory walk with real deflate decode + CRC
verification. Interop pins: our builders' output parses with the
stdlib tarfile/zipfile modules and vice versa — two independent
implementations agreeing on the same bytes."""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_cpp_spark.sources.archive import (
    MSG_BOMB,
    MSG_NOT_ARCHIVE,
    MSG_TAR_CHKSUM,
    MSG_TAR_TRUNC,
    MSG_ZIP_CRC,
    MSG_ZIP_DATA,
    MSG_ZIP_EOCD,
    MSG_ZIP_METHOD,
    build_tar,
    build_zip,
    sniff_tar,
    sniff_zip,
    tar_members,
    zip_members,
)

_MEMBERS = [
    {"name": "a.txt", "data": b"hello world\n" * 10, "mtime": 7},
    {"name": "dir/", "data": b"", "typeflag": "5"},
    {"name": "dir/b.bin", "data": bytes(range(256)) * 3},
    {"name": "empty", "data": b""},
]


def test_tar_roundtrip() -> None:
    blob = build_tar(_MEMBERS)
    assert sniff_tar(blob)
    got = tar_members(blob)
    assert [(m["name"], m["size"], m["typeflag"]) for m in got] == [
        ("a.txt", 120, "0"), ("dir/", 0, "5"),
        ("dir/b.bin", 768, "0"), ("empty", 0, "0")]
    assert got[0]["mtime"] == 7


def test_tar_stdlib_interop() -> None:
    # our builder → stdlib reader
    blob = build_tar(_MEMBERS)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        names = tf.getnames()
        assert names == ["a.txt", "dir", "dir/b.bin", "empty"]
        assert tf.extractfile("dir/b.bin").read() \
            == bytes(range(256)) * 3
    # stdlib builder → our reader
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for m in _MEMBERS:
            ti = tarfile.TarInfo(m["name"].rstrip("/") or m["name"])
            ti.size = len(m["data"])
            if m.get("typeflag") == "5":
                ti.type = tarfile.DIRTYPE
            tf.addfile(ti, io.BytesIO(m["data"]))
    got = tar_members(buf.getvalue())
    assert [m["size"] for m in got] == [120, 0, 768, 0]


def test_tar_damage() -> None:
    blob = build_tar(_MEMBERS)
    with pytest.raises(ValueError, match=MSG_NOT_ARCHIVE):
        tar_members(blob[:256])
    with pytest.raises(ValueError, match=MSG_NOT_ARCHIVE):
        tar_members(blob[:257] + b"X" + blob[258:])
    with pytest.raises(ValueError, match=MSG_TAR_TRUNC):
        tar_members(blob[:700])
    # corrupt a name byte → checksum no longer matches
    with pytest.raises(ValueError, match=MSG_TAR_CHKSUM):
        tar_members(b"X" + blob[1:])


def test_zip_roundtrip_and_crc() -> None:
    blob = build_zip(_MEMBERS[:1] + _MEMBERS[2:])
    assert sniff_zip(blob)
    got = zip_members(blob)
    assert [(m["name"], m["size"], m["method"], m["crc_ok"])
            for m in got] == [
        ("a.txt", 120, "deflate", True),
        ("dir/b.bin", 768, "deflate", True),
        ("empty", 0, "deflate", True)]
    stored = build_zip([{"name": "s", "data": b"abc",
                         "store": True}])
    assert zip_members(stored)[0]["method"] == "store"


def test_zip_stdlib_interop() -> None:
    blob = build_zip(_MEMBERS[:1] + _MEMBERS[2:])
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        assert zf.namelist() == ["a.txt", "dir/b.bin", "empty"]
        assert zf.read("a.txt") == b"hello world\n" * 10
        assert zf.testzip() is None
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("x.py", "print(1)\n" * 40)
        zf.writestr("y", b"")
    got = zip_members(buf.getvalue())
    assert [(m["name"], m["size"], m["crc_ok"]) for m in got] == [
        ("x.py", 360, True), ("y", 0, True)]


def test_zip_damage() -> None:
    blob = build_zip(_MEMBERS[:1] + _MEMBERS[2:])
    with pytest.raises(ValueError, match=MSG_NOT_ARCHIVE):
        zip_members(b"XK" + blob[2:])
    with pytest.raises(ValueError, match=MSG_ZIP_EOCD):
        zip_members(blob[:-10])
    # flip a payload byte inside the first member's deflate stream:
    # either the stream still inflates (crc_ok False) or it breaks
    pos = 30 + len("a.txt") + 4
    bad = blob[:pos] + bytes([blob[pos] ^ 0xFF]) + blob[pos + 1:]
    try:
        got = zip_members(bad)
        assert got[0]["crc_ok"] is False
        assert got[1]["crc_ok"] and got[2]["crc_ok"]
    except ValueError as e:
        assert str(e) in (MSG_ZIP_DATA, MSG_ZIP_CRC)
    # unsupported method
    raw = bytearray(build_zip([{"name": "s", "data": b"abc",
                                "store": True}]))
    import struct

    for off in range(len(raw) - 4):
        if raw[off:off + 4] in (b"PK\x03\x04", b"PK\x01\x02"):
            struct.pack_into("<H", raw, off + (8 if raw[off + 3]
                                               == 4 else 10), 99)
    with pytest.raises(ValueError, match=MSG_ZIP_METHOD):
        zip_members(bytes(raw))


def test_zip_bomb_guard() -> None:
    blob = build_zip([{"name": "bomb",
                       "data": b"\x00" * (4 * 1024 * 1024)}])
    with pytest.raises(ValueError, match=MSG_BOMB):
        zip_members(blob, max_out=1024)


@given(st.lists(st.tuples(st.integers(0, 5000),
                          st.integers(0, 2)),
                min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_tar_zip_size_property(specs) -> None:
    members = [{"name": f"m{k}.dat",
                "data": bytes((k + j) % 251 for j in range(n))}
               for k, (n, _) in enumerate(specs)]
    tgot = tar_members(build_tar(members))
    assert [m["size"] for m in tgot] == [len(m["data"])
                                         for m in members]
    zgot = zip_members(build_zip(members))
    assert all(m["crc_ok"] for m in zgot)
    assert [m["size"] for m in zgot] == [len(m["data"])
                                         for m in members]


def test_operator_routing_and_plan(spark) -> None:
    from cerberus_cpp_spark.operators.multimodal import (
        archive_census,
    )

    tar = build_tar(_MEMBERS)
    zp = build_zip(_MEMBERS[:1] + _MEMBERS[2:])
    rows = [
        ("tar", bytearray(tar)),
        ("zip", bytearray(zp)),
        ("null", None),
        ("plain", bytearray(b"x" * 600)),
        ("cut", bytearray(tar[:700])),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    out = archive_census(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {}
    for r in out.collect():
        got.setdefault(r["clip_id"], []).append(r)
    assert len(got["tar"]) == 4
    assert {r["member_name"] for r in got["tar"]} == {
        "a.txt", "dir/", "dir/b.bin", "empty"}
    assert all(r["fmt"] == "tar" and r["ok"] for r in got["tar"])
    assert len(got["zip"]) == 3
    z = {r["member_name"]: r for r in got["zip"]}
    assert z["a.txt"]["member_size"] == 120
    assert z["a.txt"]["crc_ok"] and z["a.txt"]["method"] == "deflate"
    assert got["null"][0]["message"] == "no payload"
    assert got["plain"][0]["message"] == MSG_NOT_ARCHIVE
    assert got["cut"][0]["message"] == MSG_TAR_TRUNC
