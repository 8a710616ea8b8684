"""End-to-end pipeline: rule pass + ledger + uniqueness + referential
+ drift over the seeded table; resumability through the same entry."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.pipeline import run_full_validation
from cerberus_cpp_spark.sources.distgen import image_caption_frame
from cerberus_cpp_spark.sources.fixtures import IMAGE_TABLE_RULES

N = 3000


@pytest.fixture()
def table(spark):
    return image_caption_frame(spark, N, partitions=4).withColumn(
        "part", F.expr("pmod(id, 6)")
    ).drop("id").cache()


def test_full_pipeline_report(spark, table, tmp_path) -> None:
    fmt_dim = spark.createDataFrame(
        [("jpeg",), ("png",), ("webp",)], ["fmt_name"]
    )
    clean_half = table.where("phash != 6510615555426900570")  # arbitrary
    report = run_full_validation(
        table,
        IMAGE_TABLE_RULES,
        partition_col="part",
        ledger_path=str(tmp_path / "ledger"),
        unique_key="phash",
        referential=[(fmt_dim, "fmt", "fmt_name")],
        drift_against=clean_half,
        drift_col="w",
    )
    # seeded: every 100th row violates → 30 invalid rows over 6 parts
    assert report.run["partitions_processed"] == 6
    assert sum(p["violations"] for p in report.partition_verdicts) > 0
    # hot phash (every 50th row) duplicates → uniqueness fires
    assert report.unique_violations >= 1
    # seeded 'heif' rows are not in the fmt dimension
    assert report.referential_violations["fmt"] >= 1
    # drift of w vs a near-identical slice: none
    assert report.drift is not None and not report.drift["drifted"]
    assert report.passed() is False  # seeded violations exist


def test_pipeline_resume_skips_done(spark, table, tmp_path) -> None:
    path = str(tmp_path / "ledger")
    r1 = run_full_validation(
        table, IMAGE_TABLE_RULES, partition_col="part",
        ledger_path=path,
    )
    assert r1.run["partitions_processed"] == 6
    r2 = run_full_validation(
        table, IMAGE_TABLE_RULES, partition_col="part",
        ledger_path=path,
    )
    assert r2.run["partitions_processed"] == 0
    # verdicts still reported from the ledger
    assert len(r2.partition_verdicts) == 6


def test_pipeline_container_audit(spark, tmp_path) -> None:
    """png_container_audit=True folds the chunk-CRC walk into the
    SAME decode pass: corrupted PNG containers count as
    container_violations; non-PNG payloads are NULL (not counted)."""
    df = (image_caption_frame(spark, 300, partitions=4,
                              with_bytes=True, violation_every=None)
          .withColumn("part", F.expr("pmod(id, 3)"))
          .withColumn("bytes", F.expr(
              "IF(fmt = 'png' AND id % 30 = 1, "
              "concat(substring(bytes, 1, length(bytes) - 4),"
              "       X'00000000'), bytes)"))
          .drop("id"))
    report = run_full_validation(
        df, IMAGE_TABLE_RULES, partition_col="part",
        ledger_path=str(tmp_path / "ledger"),
        image_checks=True, png_container_audit=True,
    )
    # ids ≡ 1 (mod 30) are png rows (1 % 3 == 1): 10 planted
    assert report.container_violations == 10
    assert report.passed() is False
    # audit off → field None, fidelity unaffected by the CRC flip
    report2 = run_full_validation(
        df, IMAGE_TABLE_RULES, partition_col="part",
        ledger_path=str(tmp_path / "ledger2"),
        image_checks=True,
    )
    assert report2.container_violations is None
