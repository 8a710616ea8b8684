"""Distributed generator must be bit-for-bit the driver-side fixture."""

from __future__ import annotations

from cerberus_cpp_spark.sources.distgen import image_caption_frame
from cerberus_cpp_spark.sources.fixtures import image_caption_rows

N = 700


def _key(row: dict) -> tuple:
    return (
        row["image_id"], row["w"], row["h"], row["fmt"],
        row["caption"], row["phash"],
    )


def test_matches_driver_fixture(spark) -> None:
    dist = {
        r["id"]: r.asDict()
        for r in image_caption_frame(spark, N, partitions=4).collect()
    }
    ref = image_caption_rows(N)
    assert len(dist) == N
    for i, expected in enumerate(ref):
        assert _key(dist[i]) == _key(expected), f"row {i}"


def test_bytes_match_driver_fixture(spark) -> None:
    n = 60
    dist = {
        r["id"]: bytes(r["bytes"]) if r["bytes"] is not None else None
        for r in image_caption_frame(
            spark, n, partitions=2, with_bytes=True
        ).collect()
    }
    ref = image_caption_rows(n, with_bytes=True)
    for i, expected in enumerate(ref):
        assert dist[i] == expected["bytes"], f"row {i}"


def test_lossy_plant_matches_driver_fixture(spark) -> None:
    n = 60
    dist = {
        r["id"]: bytes(r["bytes"]) if r["bytes"] is not None else None
        for r in image_caption_frame(
            spark, n, partitions=2, with_bytes=True, plant_lossy=True
        ).collect()
    }
    ref = image_caption_rows(n, with_bytes=True, plant_lossy=True)
    planted = [i for i in range(n) if i % 30 == 8]
    assert planted == [8, 38]
    for i, expected in enumerate(ref):
        assert dist[i] == expected["bytes"], f"row {i}"
    for i in planted:
        assert dist[i][:4] == b"RIFF" and b"VP8 " in dist[i][:20]


def test_no_shuffle_in_generation(spark) -> None:
    df = image_caption_frame(spark, 1000, partitions=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
