"""Streaming hot-key detection (streaming/hotkeys.py): exact-regime
emissions must equal batch counts, pruned-regime intervals must
bracket them, and the sink-side verdict fold must classify
certain/possible hitters correctly."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.streaming.hotkeys import (
    hot_keys_stream,
    hot_keys_verdicts,
)

N = 6000  # 6 hourly windows x 1000 events (the last ~2 never close)


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("hot_src"))
    df = spark.range(N).select(
        F.expr(
            "timestamp('2026-01-01 00:00:00')"
            " + make_interval(0,0,0,0, cast(id div 1000 as int),"
            " 0, cast(id % 1000 as int))"
        ).alias("ts"),
        F.expr("IF(id % 10 = 0, 'H', concat('u', id))").alias("k"),
    )
    df.write.mode("overwrite").parquet(path)
    return path


def _exact_by_window(spark, src):
    rows = spark.read.parquet(src).collect()
    out: dict = collections.defaultdict(collections.Counter)
    for r in rows:
        out[r["ts"].hour][r["k"]] += 1
    return out


def _run(spark, src, name, **kw):
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = hot_keys_stream(stream, "k", ts_col="ts", window="1 hour",
                          watermark="30 minutes", **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_exact_regime_equals_batch_counts(spark, src) -> None:
    # capacity above the per-shard distinct count → no pruning →
    # cnt_lo == cnt_hi == exact count for EVERY key (the t-digest
    # exact-regime trick applied to MG)
    got = _run(spark, src, "hot_exact", capacity=2048, n_shards=4)
    exact = _exact_by_window(spark, src)
    by_win: dict = collections.defaultdict(dict)
    for r in got:
        h = r["window_start"].hour
        assert r["key"] not in by_win[h], "key emitted twice"
        by_win[h][r["key"]] = (r["cnt_lo"], r["cnt_hi"])
    # the last window never passes the watermark before the source
    # drains; at least the first 3 must have closed
    assert set(by_win) >= {0, 1, 2}
    for h, keys in by_win.items():
        assert {k: lo for k, (lo, _) in keys.items()} == dict(exact[h])
        assert all(lo == hi for lo, hi in keys.values())


def test_shard_rows_partition_the_window(spark, src) -> None:
    got = _run(spark, src, "hot_shards", capacity=2048, n_shards=4)
    # each (window, shard) carries a consistent shard_rows, a key
    # appears in exactly one shard, and the shard totals partition
    # the 1000-row window
    per_win: dict = collections.defaultdict(dict)
    key_shards: dict = collections.defaultdict(set)
    for r in got:
        h = r["window_start"].hour
        prev = per_win[h].setdefault(r["shard"], r["shard_rows"])
        assert prev == r["shard_rows"]
        key_shards[(h, r["key"])].add(r["shard"])
    for h in (0, 1, 2):
        assert sum(per_win[h].values()) == 1000
    assert all(len(s) == 1 for s in key_shards.values())


def test_pruned_regime_brackets_exact(spark, src) -> None:
    got = _run(spark, src, "hot_pruned", capacity=8, n_shards=4)
    exact = _exact_by_window(spark, src)
    seen_hot = set()
    for r in got:
        h = r["window_start"].hour
        true = exact[h][r["key"]]
        assert r["cnt_lo"] <= true <= r["cnt_hi"], (r, true)
        if r["key"] == "H":
            seen_hot.add(h)
    # completeness: the hot key (100/window) survives its shard's
    # summary whenever 100 > shard_rows/(8+1), i.e. shard_rows < 900
    # — true unless one shard swallowed ~90% of the window's keys
    assert seen_hot >= {0, 1, 2}


def test_hot_keys_verdicts_fold(spark) -> None:
    rows = [
        ("H", 90, 120, 300),   # possible (lo<100<=hi)
        ("C", 150, 150, 300),  # certain
        ("x", 10, 40, 300),    # dropped
    ]
    df = spark.createDataFrame(
        [("2026-01-01 00:00:00",) + r for r in rows],
        "window_start string, key string, cnt_lo long, cnt_hi long,"
        " shard_rows long",
    ).withColumn("window_start", F.col("window_start").cast("timestamp"))
    got = {r["key"]: r["certain"]
           for r in hot_keys_verdicts(df, 100).collect()}
    assert got == {"H": False, "C": True}


def test_capacity_validation(spark) -> None:
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError):
        hot_keys_stream(df, "value", ts_col="timestamp", capacity=0)
