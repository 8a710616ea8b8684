"""Parquet layout audit (operators/layout.py): chunk frame pinned
field-for-field against DuckDB's independent parquet_metadata()
footer parser, report arithmetic, failure routing, plan shape."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.layout import (
    parquet_layout,
    parquet_layout_report,
)

SF = "/root/testdata/sf0.001"


def _paths(spark, extra=()):
    files = sorted(glob.glob(f"{SF}/*.parquet")) + list(extra)
    return spark.createDataFrame([(p,) for p in files],
                                 "path string")


def test_chunks_match_duckdb(spark) -> None:
    got = sorted(
        tuple(r) for r in parquet_layout(_paths(spark)).collect()
    )
    want = sorted(tuple(r) for r in duckdb.sql(f"""
        SELECT regexp_extract(file_name, '[^/]+$') AS file_name,
               TRUE AS ok, NULL AS message,
               CAST(row_group_id AS INTEGER),
               CAST(row_group_num_rows AS BIGINT),
               replace(path_in_schema, ', ', '.') AS path_in_schema,
               compression,
               CAST(num_values AS BIGINT),
               CAST(stats_null_count AS BIGINT),
               stats_null_count IS NOT NULL
                 OR stats_min_value IS NOT NULL AS has_stats,
               CAST(total_compressed_size AS BIGINT),
               CAST(total_uncompressed_size AS BIGINT)
        FROM parquet_metadata('{SF}/*.parquet')
    """).fetchall())
    assert len(got) == len(want) and len(got) > 10
    assert got == want


def test_report_arithmetic(spark, tmp_path) -> None:
    # write a deliberately bad layout: 1000 rows in 10 row groups
    p = str(tmp_path / "tiny_groups.parquet")
    spark.range(0, 1000).repartition(1).write \
        .option("parquet.block.size", 1) \
        .mode("overwrite").parquet(str(tmp_path / "d"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": list(range(1000))}), p,
                   row_group_size=100)
    rep = {r["file_name"]: r for r in parquet_layout_report(
        spark.createDataFrame([(p,)], "path string"),
        min_row_group_rows=500).collect()}
    r = rep["tiny_groups.parquet"]
    assert r["n_rows"] == 1000
    assert r["n_row_groups"] == 10
    assert r["min_row_group_rows"] == 100
    assert r["n_small_row_groups"] == 10
    assert r["compression_ratio"] > 0
    assert r["ok"]
    with pytest.raises(ValueError, match="min_row_group_rows"):
        parquet_layout_report(_paths(spark), min_row_group_rows=0)


def test_failure_routing(spark, tmp_path) -> None:
    bad = str(tmp_path / "not_parquet.parquet")
    with open(bad, "wb") as f:
        f.write(b"this is not parquet at all" * 10)
    out = parquet_layout(_paths(spark, extra=(bad,)))
    rows = out.collect()
    ok_files = {r["file_name"] for r in rows if r["ok"]}
    bad_rows = [r for r in rows if not r["ok"]]
    assert "documents.parquet" in ok_files
    assert len(bad_rows) == 1
    assert bad_rows[0]["file_name"] == "not_parquet.parquet"
    assert bad_rows[0]["message"]
    # and the report carries the failure through
    rep = {r["file_name"]: r for r in parquet_layout_report(
        spark.createDataFrame([(bad,)], "path string")).collect()}
    assert rep["not_parquet.parquet"]["ok"] is False


def test_plan_shapes(spark) -> None:
    chunks = parquet_layout(_paths(spark))
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rep = parquet_layout_report(_paths(spark))
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial_sum" in plan
