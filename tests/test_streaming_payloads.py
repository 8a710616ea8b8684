"""stream==batch pins for the round-5 payload operators: every one
is a stateless narrow Arrow/codegen transform, so it applies to a
live ingest frame unchanged — compression_census, archive_census,
the container censuses (ogg/flac), and strip_html. Static corpus,
availableNow trigger, row-for-row equality with the batch pass."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.multimodal import (
    archive_census,
    compression_census,
    flac_stream_frames,
    ogg_stream_frames,
)
from cerberus_cpp_spark.operators.text import strip_html
from cerberus_cpp_spark.sources.archive import build_tar, build_zip
from cerberus_cpp_spark.sources.flac import build_flac
from cerberus_cpp_spark.sources.ogg import build_ogg_opus


def _roundtrip(spark, tmp_path, batch_df, op, name):
    src = str(tmp_path / name)
    batch_df.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    expected = sorted(map(tuple, op(batch).collect()))
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (op(stream).writeStream.format("memory")
         .queryName(f"{name}_s").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple,
                     spark.sql(f"SELECT * FROM {name}_s").collect()))
    assert got == expected and len(got) > 0


def test_stream_compression_census_equals_batch(spark, tmp_path):
    rows = [("c%d" % i,
             bytearray(gzip.compress(("t%d " % i * 30).encode()))
             if i % 5 else None)
            for i in range(60)]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    _roundtrip(spark, tmp_path, df, compression_census, "comp")


def test_stream_archive_census_equals_batch(spark, tmp_path):
    rows = []
    for i in range(40):
        members = [{"name": f"m{i}.txt",
                    "data": (f"d{i} " * 20).encode()}]
        blob = build_tar(members) if i % 2 else build_zip(members)
        rows.append((f"a{i}", bytearray(blob)))
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    _roundtrip(spark, tmp_path, df, archive_census, "arch")


def test_stream_media_censuses_equal_batch(spark, tmp_path):
    ogg_rows = [(f"o{i}", bytearray(build_ogg_opus(
        serial=i + 1, n_audio_pages=1 + i % 3,
        duration_ms=100 + i))) for i in range(30)]
    df = spark.createDataFrame(ogg_rows,
                               "clip_id string, bytes binary")
    _roundtrip(spark, tmp_path, df, ogg_stream_frames, "oggs")
    flac_rows = [(f"f{i}", bytearray(build_flac(
        rate=44100, channels=1 + i % 2, bps=16,
        total_samples=1000 * (i + 1)))) for i in range(30)]
    df = spark.createDataFrame(flac_rows,
                               "clip_id string, bytes binary")
    _roundtrip(spark, tmp_path, df, flac_stream_frames, "flacs")


def test_stream_strip_html_equals_batch(spark, tmp_path):
    rows = [(i, f"<p>doc &amp; {i}</p><script>x<{i}</script>")
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _roundtrip(
        spark, tmp_path, df,
        lambda d: d.select("doc_id", strip_html("text")), "html")
