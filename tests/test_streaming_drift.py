"""Streaming windowed t-digest (streaming/drift.py): emitted digests
must equal batch-built digests per window (exact regime), state must
close exactly once per window, and the sink-side quantile helper
must agree with the batch operator."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from cerberus_cpp_spark.functions.tdigest import TDigest
from cerberus_cpp_spark.streaming.drift import (
    digest_quantiles,
    duration_ms,
    windowed_tdigest_stream,
)

N = 6000  # 6 hourly windows x 1000 events


def test_duration_ms():
    assert duration_ms("1 hour") == 3_600_000
    assert duration_ms("30 minutes") == 1_800_000
    assert duration_ms("2 days") == 172_800_000
    with pytest.raises(ValueError):
        duration_ms("3 fortnights")


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("drift_src"))
    # hour h carries values pmod(id, 20 + h): per-window distinct
    # sets small enough for the digest's exact regime
    df = spark.range(N).select(
        F.expr("timestamp('2026-01-01 00:00:00')"
               " + make_interval(0,0,0,0, cast(id div 1000 as int),"
               " 0, cast(id % 1000 as int))").alias("ts"),
        F.expr("cast(pmod(id, 20 + id div 1000) as double)")
        .alias("value"),
    )
    df.write.mode("overwrite").parquet(path)
    return path


def test_stream_digests_equal_batch(spark, stream_src):
    batch = spark.read.parquet(stream_src)
    stream = spark.readStream.schema(batch.schema).parquet(stream_src)
    out = windowed_tdigest_stream(
        stream, "value", ts_col="ts", window="1 hour",
        watermark="30 minutes", compression=200)
    q = (out.writeStream.format("memory").queryName("digests")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["window_start"].hour: r
           for r in spark.sql("SELECT * FROM digests").collect()}
    # the last window (hour 5) never passes the watermark before the
    # source drains — at least the first 4 must have closed
    assert set(got) >= {0, 1, 2, 3}
    for h, r in got.items():
        ids = np.arange(h * 1000, (h + 1) * 1000)
        vals = (ids % (20 + h)).astype(float)
        expect = TDigest.from_values(vals, 200)
        assert r["rows"] == 1000
        assert np.array_equal(np.asarray(r["means"]), expect.means), h
        assert np.array_equal(np.asarray(r["weights"]), expect.weights)
        assert r["vmin"] == expect.min and r["vmax"] == expect.max


def test_digest_quantiles_helper(spark, stream_src):
    # build digest rows batch-side (no stream needed for the helper)
    rows = []
    for h in range(3):
        ids = np.arange(h * 1000, (h + 1) * 1000)
        d = TDigest.from_values((ids % (20 + h)).astype(float), 200)
        r = d.to_row()
        rows.append((f"2026-01-01 0{h}:00:00", 1000, r["means"],
                     r["weights"], r["vmin"], r["vmax"]))
    df = spark.createDataFrame(
        rows, "window_start string, rows long, means array<double>,"
              " weights array<double>, vmin double, vmax double"
    ).withColumn("window_start", F.to_timestamp("window_start"))
    out = digest_quantiles(df, probs=(0.5,), compression=200,
                           method="nearest")
    got = {r["window_start"].hour: r["q"] for r in out.collect()}
    for h in range(3):
        ids = np.arange(h * 1000, (h + 1) * 1000)
        vals = np.sort((ids % (20 + h)).astype(float))
        assert got[h] == vals[int(np.ceil(0.5 * len(vals))) - 1]
