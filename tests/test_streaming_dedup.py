"""Streaming dedup: watermark-bounded dropDuplicates and the custom
stateful flagger must agree with batch exact dedup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cerberus_cpp_spark.streaming.dedup import (
    dedup_exact_stream,
    flag_duplicates_stateful,
)

DOCS = [
    (0, "alpha beta gamma", "2026-01-01 00:00:00"),
    (1, "alpha  BETA gamma", "2026-01-01 00:10:00"),   # dup of 0
    (2, "delta epsilon", "2026-01-01 00:20:00"),
    (3, "alpha beta gamma", "2026-01-01 00:30:00"),    # dup of 0
    (4, "zeta", "2026-01-01 00:40:00"),
]


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sdd"))
    df = spark.createDataFrame(DOCS, ["doc_id", "text", "ts_s"]) \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_dedup_exact_stream(spark, src_dir) -> None:
    batch = spark.read.parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    q = (
        dedup_exact_stream(stream)
        .writeStream.format("memory").queryName("sdd_drop")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM sdd_drop").collect()
    kept = {r["doc_id"] for r in rows}
    # one survivor per fingerprint group: {0|1|3}, 2, 4
    assert len(kept) == 3
    assert 2 in kept and 4 in kept
    assert len(kept & {0, 1, 3}) == 1


def test_flag_duplicates_stateful(spark, src_dir) -> None:
    batch = spark.read.parquet(src_dir)
    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    q = (
        flag_duplicates_stateful(stream)
        .writeStream.format("memory").queryName("sdd_flag")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in
            spark.sql("SELECT * FROM sdd_flag").collect()}
    assert len(rows) == 5                      # keep-all semantics
    grp = sorted(
        [rows[0], rows[1], rows[3]], key=lambda r: r["occurrence"]
    )
    assert [r["seen_before"] for r in grp] == [False, True, True]
    assert not rows[2]["seen_before"] and not rows[4]["seen_before"]
