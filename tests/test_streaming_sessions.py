"""Streaming sessionization (native session windows) must agree with
the batch gap-sessionizer — including the exact-threshold boundary
the +1us gap adjustment exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.temporal import session_stats
from cerberus_cpp_spark.streaming.sessions import session_stats_stream

GAP = 600  # seconds

# user a: events at 0s, 600s (exactly gap — must MERGE like batch),
# 1201s (gap+1s — must SPLIT); user b: single event; a NULL user and
# a NULL ts row must drop on both engines
ROWS = [
    ("a", "2026-01-01 00:00:00"),
    ("a", "2026-01-01 00:10:00"),
    ("a", "2026-01-01 00:30:01"),
    ("b", "2026-01-01 01:00:00"),
    (None, "2026-01-01 02:00:00"),
    ("c", None),
    # a second key with enough headroom that its session CLOSES in
    # the streaming run (the watermark must pass end + gap)
    ("w", "2026-01-01 00:00:00"),
    ("w", "2026-01-01 00:05:00"),
    # sentinel far in the future: pushes the watermark past every
    # real session's close point
    ("zz-sentinel", "2026-01-02 12:00:00"),
]


def _frame(spark):
    return spark.createDataFrame(ROWS, ["user_id", "ts_s"]) \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def _key(r):
    return (r["user_id"], str(r["session_start"]),
            str(r["session_end"]), r["n_events"], r["duration_us"])


def _batch_expected(spark):
    got = session_stats(_frame(spark), key="user_id", ts="ts",
                        gap_seconds=GAP).collect()
    return {_key(r) for r in got}


def test_batch_native_session_windows_equal_sessionize(spark):
    # same code path the stream runs, on a batch frame: must equal
    # the window-based batch operator exactly (incl. the == boundary)
    got = {_key(r) for r in session_stats_stream(
        _frame(spark), key="user_id", ts="ts",
        gap_seconds=GAP).collect()}
    assert got == _batch_expected(spark)
    # and the boundary really merged: user a has a 2-event session
    # (0s + exactly-gap) and a 1-event session (gap+1s)
    a_counts = sorted(k[3] for k in got if k[0] == "a")
    assert a_counts == [1, 2]


def test_stream_equals_batch_for_closed_sessions(spark, tmp_path):
    path = str(tmp_path / "sess_src")
    _frame(spark).coalesce(1).write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    q = (
        session_stats_stream(stream, key="user_id", ts="ts",
                             gap_seconds=GAP, watermark="0 seconds")
        .writeStream.format("memory").queryName("sess_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {_key(r) for r in
           spark.sql("SELECT * FROM sess_out").collect()}
    expected = _batch_expected(spark)
    # emitted sessions are always a subset of the batch truth...
    assert got <= expected
    # ...and every session the sentinel-advanced watermark passed
    # must have emitted (only the sentinel's own session may lag)
    required = {k for k in expected if k[0] != "zz-sentinel"}
    assert required <= got


def test_gap_guard(spark):
    with pytest.raises(ValueError):
        session_stats_stream(_frame(spark), key="user_id", ts="ts",
                             gap_seconds=0)
