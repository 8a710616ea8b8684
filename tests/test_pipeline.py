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


def test_pipeline_quality_family(spark, tmp_path) -> None:
    """blur_threshold / count_blank_images ride the SAME fused decode
    pass (quality columns from image_full_check(quality=True)): blank
    plants (constant-color payloads have n_distinct_rgb == 1 and
    lap_abs_sum == 0) are counted by both families; undecodable rows
    are NOT double-counted here (they belong to the metadata family)."""
    from cerberus_cpp_spark.functions.shipping import PKG_PARENT

    pkg_parent = PKG_PARENT

    def blank_out(batches):
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        import numpy as np

        from cerberus_cpp_spark.sources.imagegen import encode_pixels

        for pdf in batches:
            pdf = pdf.copy()
            ids = [int(str(s).rsplit("-", 1)[-1])
                   for s in pdf["image_id"]]
            pdf["bytes"] = [
                encode_pixels(
                    np.full((6, 6, 3), 128, dtype=np.uint8), "png")
                if i % 25 == 3 else blob
                for i, blob in zip(ids, pdf["bytes"])
            ]
            yield pdf

    base = image_caption_frame(spark, 300, partitions=4,
                               with_bytes=True, violation_every=None)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in base.schema.fields)
    df = (base.mapInPandas(blank_out, schema=schema)
          .withColumn("part", F.expr("pmod(id, 3)")).drop("id"))

    report = run_full_validation(
        df, IMAGE_TABLE_RULES, partition_col="part",
        ledger_path=str(tmp_path / "ledgerq"),
        image_checks=True, blur_threshold=1, count_blank_images=True,
    )
    # ids ≡ 3 (mod 25) in 0..299 → 12 planted blanks. Blur is NOT just
    # the plants: the synthetic gradient is LINEAR, so its Laplacian
    # is zero wherever no mod-256 wrap falls inside a thumb — compute
    # the exact expectation from the standalone profile instead of
    # assuming.
    from cerberus_cpp_spark.operators.image_transform import (
        image_quality_profile,
    )

    want_blur = image_quality_profile(df).where(
        "lap_abs_sum < 1").count()
    assert report.blank_images == 12
    assert report.blurry_images == want_blur >= 12
    assert report.passed() is False
    # off → fields None and the fused pass carries no quality columns
    report2 = run_full_validation(
        df, IMAGE_TABLE_RULES, partition_col="part",
        ledger_path=str(tmp_path / "ledgerq2"), image_checks=True,
    )
    assert report2.blank_images is None
    assert report2.blurry_images is None


def test_full_check_quality_matches_standalone(spark) -> None:
    """image_full_check(quality=True) emits EXACTLY the standalone
    image_quality_profile metrics (same decoded pixels), NULL on
    non-decodable rows."""
    from cerberus_cpp_spark.operators.image_checks import (
        image_full_check,
    )
    from cerberus_cpp_spark.operators.image_transform import (
        image_quality_profile,
    )

    df = image_caption_frame(spark, 200, partitions=2,
                             with_bytes=True, plant_lossy=True).drop("id")
    fused = {r["image_id"]: r
             for r in image_full_check(df, quality=True).collect()}
    solo = {r["image_id"]: r
            for r in image_quality_profile(df).collect()}
    assert len(fused) == len(solo) == 200
    checked = 0
    for k, s in solo.items():
        f = fused[k]
        for c in ("lap_abs_sum", "n_distinct_rgb", "is_grayscale",
                  "luma1000_min", "luma1000_max"):
            assert f[c] == s[c], (k, c, f[c], s[c])
        if s["status"] != "ok":
            assert f["lap_abs_sum"] is None
        else:
            checked += 1
    assert checked > 150
