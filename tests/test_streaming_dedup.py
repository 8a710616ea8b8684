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


def test_curate_documents_stream_equals_batch(spark,
                                              tmp_path_factory) -> None:
    """Round-4 verdict #7: the curation verdict INCLUDING the
    duplicate reason streams — a single-batch replay of a static
    corpus must equal the batch twin (dedup=True) exactly, column for
    column (the stateful operator sorts each micro-batch group by id,
    reproducing the batch lowest-id survivor)."""
    from cerberus_cpp_spark.operators.text import curate_documents
    from cerberus_cpp_spark.streaming.curate import (
        curate_documents_stream,
    )

    src = str(tmp_path_factory.mktemp("scd"))
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    planted = docs.where("doc_id % 10 = 3").selectExpr(
        "doc_id + 1000000 AS doc_id", "text")  # exact-dup plants
    docs.unionByName(planted).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    want = sorted(map(tuple, curate_documents(
        batch, dedup=True, full_rows=True,
        keep_fingerprint=True).collect()))
    assert any("duplicate" in t[2] for t in want)  # corpus has dups
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (curate_documents_stream(stream)
         .writeStream.format("memory").queryName("scd_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple,
                     spark.sql("SELECT * FROM scd_stream").collect()))
    assert got == want and len(got) == batch.count()


def test_curate_documents_stream_cross_batch_state(
        spark, tmp_path_factory) -> None:
    """Fingerprint state persists across micro-batches (via the
    checkpoint): a duplicate arriving in a LATER batch is flagged
    even though its batch never saw the original."""
    import os

    from cerberus_cpp_spark.streaming.curate import (
        curate_documents_stream,
    )

    base = str(tmp_path_factory.mktemp("scd2"))
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    txt = "a perfectly ordinary english document about cats and dogs"
    os.makedirs(src, exist_ok=True)

    def run_once():
        # parquet sink: the memory sink cannot recover from a
        # checkpoint, and cross-run state recovery is the point here
        stream = spark.readStream.schema(
            "doc_id long, text string").parquet(src)
        q = (curate_documents_stream(stream)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    spark.createDataFrame([(10, txt)], "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()
    spark.createDataFrame([(11, txt), (12, "totally different words "
                                           "about fish and birds")],
                          "doc_id long, text string") \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = {r["doc_id"]: r for r in
            spark.read.parquet(out).collect()}
    assert len(rows) == 3
    assert "duplicate" not in rows[10]["reasons"]
    assert "duplicate" in rows[11]["reasons"]   # cross-batch dup
    assert "duplicate" not in rows[12]["reasons"]


def test_curate_documents_stream_guards(spark) -> None:
    from cerberus_cpp_spark.streaming.curate import (
        curate_documents_stream,
    )

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="fixed by the streaming"):
        curate_documents_stream(df, dedup=True)
    with pytest.raises(ValueError, match="ts_col"):
        curate_documents_stream(df, ts_col="nope")


def test_curate_documents_stream_event_time_ttl(spark,
                                                tmp_path_factory) -> None:
    """ts_col enables watermarking + state expiry (EventTimeTimeout):
    duplicates inside the horizon are still flagged; the query runs
    with bounded state."""
    from pyspark.sql import functions as F

    from cerberus_cpp_spark.streaming.curate import (
        curate_documents_stream,
    )

    src = str(tmp_path_factory.mktemp("scd3"))
    txt = "a perfectly ordinary english document about cats and dogs"
    rows = [(0, txt, "2026-01-01 00:00:00"),
            (1, txt, "2026-01-01 00:05:00"),
            (2, "other words entirely about fish",
             "2026-01-01 00:10:00")]
    spark.createDataFrame(rows, ["doc_id", "text", "ts_s"]) \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s") \
        .coalesce(1).write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (curate_documents_stream(stream, ts_col="ts",
                                 watermark="30 minutes",
                                 state_ttl_ms=1_800_000)
         .writeStream.format("memory").queryName("scd3_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in
           spark.sql("SELECT * FROM scd3_stream").collect()}
    assert len(got) == 3
    assert "duplicate" not in got[0]["reasons"]
    assert "duplicate" in got[1]["reasons"]
    assert "duplicate" not in got[2]["reasons"]
