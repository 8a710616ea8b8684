"""``partitioning.size_balanced`` — payload-weighted re-split for
byte-skewed media tables (north_star: "oversized image partitions ...
size-based coalesce").

Pins: (a) the partition count derives from payload bytes, not row
counts; (b) per-partition payload concentrates around total/n on a
heavy-tailed size distribution where the INPUT layout was maximally
skewed; (c) the estimator never runs a full scan (bounded runJob
probe) and refuses to probe derived frames; (d) coalesce_only merges
without an Exchange; (e) the pipeline wiring decodes the balanced
frame to identical verdicts.

Inputs are written to parquet and read back: the operator's intended
call-site is the raw media scan (a derived frame must pass
``total_bytes`` explicitly), and ``coalesce(1)`` on an in-memory
frame would itself read as a Repartition ancestor.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.partitioning import (
    estimate_total_bytes,
    size_balanced,
)

N_SKEW = 2000
TOTAL_SKEW = sum(16384 if i % 20 == 0 else 1024 for i in range(N_SKEW))


def _skewed_scan(spark, tmp_path, name="skew"):
    """ONE parquet file, heavy-tailed deterministic blob sizes: most
    rows ~1 KB, every 20th ~16 KB — the fat tail that makes
    row-count-even splits byte-skewed."""
    rows = [
        (i, bytes([i % 251]) * (16384 if i % 20 == 0 else 1024))
        for i in range(N_SKEW)
    ]
    path = str(tmp_path / name)
    spark.createDataFrame(rows, "id int, bytes binary").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _partition_payloads(df):
    return [
        r["payload"]
        for r in (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.sum(F.length("bytes")).alias("payload"))
            .collect()
        )
    ]


def test_partition_count_tracks_bytes_not_rows(spark, tmp_path):
    df = _skewed_scan(spark, tmp_path)
    target = 128 * 1024
    out = size_balanced(df, "bytes", target_bytes=target,
                        min_partitions=1)
    got = out.rdd.getNumPartitions()
    # the probe extrapolates from <= 8 partitions; with ONE input
    # split it sees everything, so the count is exact
    assert got == -(-TOTAL_SKEW // target) and got >= 8


def test_payload_balance_on_heavy_tail(spark, tmp_path):
    df = _skewed_scan(spark, tmp_path)
    out = size_balanced(df, "bytes", target_bytes=256 * 1024,
                        min_partitions=1)
    payloads = _partition_payloads(out)
    mean = sum(payloads) / len(payloads)
    # input: ONE split carried 100% of the payload. Output: round-
    # robin placement concentrates every partition near the mean
    # (observed 1.17x/0.87x; the guarantee is statistical — with fat
    # rows at 1/16 of target the relative spread is small, and a
    # single over-target row would lower-bound the skew, which is a
    # data-shape fact no row-atomic re-split can beat)
    assert max(payloads) < 1.5 * mean
    assert min(payloads) > 0.6 * mean


def test_estimator_is_bounded_and_close(spark, tmp_path):
    path = str(tmp_path / "uniform")
    spark.range(0, 1000).select(
        "id", F.repeat(F.lit("x"), 100).cast("binary").alias("bytes")
    ).repartition(20).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    est, nparts = estimate_total_bytes(df, "bytes")
    assert nparts >= 2  # small files pack into a handful of splits
    # uniform sizes → extrapolation from the probed subset is
    # near-exact regardless of how the 20 files packed into splits
    assert abs(est - 100_000) < 12_000


def test_derived_frame_requires_explicit_total(spark, tmp_path):
    base = _skewed_scan(spark, tmp_path)
    derived = base.groupBy("id").agg(F.first("bytes").alias("bytes"))
    with pytest.raises(ValueError, match="total_bytes"):
        size_balanced(derived, "bytes")
    out = size_balanced(derived, "bytes", target_bytes=128 * 1024,
                        total_bytes=1_048_576, min_partitions=1)
    assert out.rdd.getNumPartitions() == 8


def test_rows_preserved_exactly(spark, tmp_path):
    df = _skewed_scan(spark, tmp_path)
    out = size_balanced(df, "bytes", target_bytes=128 * 1024)
    assert sorted(r["id"] for r in out.select("id").collect()) == list(
        range(N_SKEW)
    )


def test_coalesce_only_merges_without_exchange(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(0, 200).select(
        "id", F.repeat(F.lit("y"), 512).cast("binary").alias("bytes")
    ).repartition(16).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    total = 200 * 512
    out = size_balanced(df, "bytes", target_bytes=total // 2 + 1,
                        total_bytes=total, min_partitions=2,
                        coalesce_only=True)
    assert out.rdd.getNumPartitions() == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Coalesce" in plan and "Exchange" not in plan


def test_coalesce_only_noop_when_already_coarse(spark, tmp_path):
    df = _skewed_scan(spark, tmp_path)  # one split
    out = size_balanced(df, "bytes", target_bytes=64 << 20,
                        total_bytes=1, min_partitions=4,
                        coalesce_only=True)
    # coalesce UP is a no-op: still the input's single split
    assert out.rdd.getNumPartitions() == 1


def test_min_partitions_defaults_to_parallelism(spark, tmp_path):
    path = str(tmp_path / "tiny")
    spark.createDataFrame(
        [(1, b"abc")], "id int, bytes binary"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    out = size_balanced(spark.read.parquet(path), "bytes",
                        target_bytes=64 << 20)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_pipeline_balanced_decode_same_verdicts(spark, tmp_path):
    from cerberus_cpp_spark.operators.pipeline import run_full_validation
    from cerberus_cpp_spark.sources.fixtures import (
        IMAGE_TABLE_SCHEMA,
        image_caption_rows,
    )

    rows = image_caption_rows(120, with_bytes=True)
    df = (
        spark.createDataFrame(rows, IMAGE_TABLE_SCHEMA)
        .withColumn("part", F.pmod(F.col("phash"), F.lit(4)))
    )
    rules = {"image_id": {"type": "string", "required": True}}
    kw = dict(
        partition_col="part", unique_key="image_id",
        image_checks=True, partitions_per_commit=4,
    )
    plain = run_full_validation(
        df, rules, ledger_path=str(tmp_path / "l1"), **kw)
    # the pipeline frame is derived (withColumn over an in-memory
    # scan could still probe, but run_full_validation should not
    # guess) → image_total_bytes is the explicit pass-through
    balanced = run_full_validation(
        df, rules, ledger_path=str(tmp_path / "l2"),
        balance_image_bytes=64 * 1024,
        image_total_bytes=sum(len(r["bytes"] or b"") for r in rows),
        **kw)
    assert (
        balanced.image_metadata_violations
        == plain.image_metadata_violations
    )
    assert (
        balanced.image_fidelity_failures
        == plain.image_fidelity_failures
    )
