"""Table-source abstraction (sources/catalog.py): parquet branch is
fully exercised; Iceberg paths need a configured catalog + runtime
jar (absent in this container) and are pinned at the parse/ref level
plus a clear-failure test."""

from __future__ import annotations

import os

import pytest

from cerberus_cpp_spark.operators.ledger import (
    ValidationLedger,
    run_validation,
)
from cerberus_cpp_spark.plans.engine import TableValidator
from cerberus_cpp_spark.sources import catalog


def test_parse_ref_forms() -> None:
    r = catalog.parse_ref("iceberg:main.db.images@123456")
    assert (r.kind, r.location, r.snapshot) == \
        ("iceberg", "main.db.images", "123456")
    r2 = catalog.parse_ref("iceberg:main.db.images")
    assert (r2.kind, r2.snapshot) == ("iceberg", None)
    r3 = catalog.parse_ref("parquet:/tmp/x")
    assert (r3.kind, r3.location) == ("parquet", "/tmp/x")
    r4 = catalog.parse_ref("/tmp/bare/path")
    assert (r4.kind, r4.location) == ("parquet", "/tmp/bare/path")
    assert catalog.parse_ref(r4) is r4


@pytest.fixture()
def hive_table(spark, tmp_path):
    """A hive-partitioned parquet table day=0..3 with 40 rows."""
    path = str(tmp_path / "tbl")
    df = spark.range(0, 40).selectExpr(
        "id", "cast(id % 4 as string) AS day", "id * 2.0 AS v")
    df.write.partitionBy("day").mode("overwrite").parquet(path)
    return path


def test_list_partitions_from_directory_names(spark, hive_table) -> None:
    vals = catalog.list_partitions(spark, hive_table, "day")
    assert vals == ["0", "1", "2", "3"]


def test_list_partitions_falls_back_to_scan(spark, tmp_path) -> None:
    """Non-hive layout (plain files): same answer via distinct scan."""
    path = str(tmp_path / "flat")
    spark.range(0, 40).selectExpr(
        "id", "cast(id % 4 as string) AS day").write.parquet(path)
    vals = catalog.list_partitions(spark, path, "day")
    assert vals == ["0", "1", "2", "3"]


def test_load_parquet_ref(spark, hive_table) -> None:
    df = catalog.load(spark, f"parquet:{hive_table}")
    assert df.count() == 40
    assert "day" in df.columns


def test_list_snapshots_requires_iceberg() -> None:
    with pytest.raises(ValueError, match="iceberg"):
        catalog.list_snapshots(None, "parquet:/tmp/x")


def test_snapshot_drift_between_paths(spark, tmp_path) -> None:
    """Two parquet 'snapshots' of one logical table: the value
    distribution shifts, drift detection sees it; identical snapshots
    do not drift."""
    a = str(tmp_path / "snap_a")
    b = str(tmp_path / "snap_b")
    spark.range(0, 2000).selectExpr("id", "id % 100 AS v") \
        .write.parquet(a)
    spark.range(0, 2000).selectExpr("id", "(id % 100) * 3 AS v") \
        .write.parquet(b)
    d = catalog.snapshot_drift(spark, a, b, "v")
    assert d["drifted"] is True
    same = catalog.snapshot_drift(spark, a, a, "v")
    assert same["drifted"] is False


def test_pending_partitions_from_catalog_metadata(
    spark, hive_table, tmp_path
) -> None:
    """known_partitions (directory-name listing) replaces the
    discovery scan and composes with ledger resume."""
    ledger = ValidationLedger(spark, str(tmp_path / "ledger"))
    df = catalog.load(spark, hive_table)
    tv = TableValidator({"id": {"type": "integer", "required": True}},
                        allow_unknown=True)
    known = catalog.list_partitions(spark, hive_table, "day")
    summary = run_validation(
        df, tv, "day", ledger, known_partitions=known,
        partitions_per_commit=2,
    )
    assert summary["partitions_total"] == 4
    # everything committed: a resume with the same lineage has nothing
    # to do — still sourced from metadata, no discovery scan
    summary2 = run_validation(
        df, tv, "day", ledger, known_partitions=known,
        partitions_per_commit=2,
    )
    assert summary2["partitions_total"] == 0


def test_list_partitions_unescapes_and_maps_null(spark, tmp_path) -> None:
    """Hive-escaped directory names (%3A for ':') and the NULL
    sentinel directory must decode to the COLUMN's string values /
    the ledger's NULL_PARTITION — otherwise run_validation's IN-list
    matches nothing and records empty 'done' verdicts (review
    finding)."""
    from cerberus_cpp_spark.operators.ledger import NULL_PARTITION

    path = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b:c")], "id int, day string")
    df.write.partitionBy("day").mode("overwrite").parquet(path)
    vals = catalog.list_partitions(spark, path, "day")
    assert vals == sorted([NULL_PARTITION, "a", "b:c"])

    # end-to-end: every row validated, no silently-empty partitions
    ledger = ValidationLedger(spark, str(tmp_path / "led"))
    table = spark.read.parquet(path)
    tv = TableValidator({"id": {"type": "integer", "min": 0}},
                        allow_unknown=True)
    summary = run_validation(table, tv, "day", ledger,
                             known_partitions=vals)
    assert summary["partitions_processed"] == 3
    assert summary["empty_partitions"] == []
    done = {r["partition_value"]: r
            for r in ledger.read().collect()}
    assert done[NULL_PARTITION]["rows"] == 1
    assert done["b:c"]["rows"] == 1 and done["a"]["rows"] == 1


def test_scan_fallback_includes_null_partition(spark, tmp_path) -> None:
    from cerberus_cpp_spark.operators.ledger import NULL_PARTITION

    path = str(tmp_path / "flatnull")
    spark.createDataFrame(
        [(1, "x"), (2, None)], "id int, day string"
    ).write.parquet(path)
    vals = catalog.list_partitions(spark, path, "day")
    assert vals == sorted([NULL_PARTITION, "x"])
