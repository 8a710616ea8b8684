"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship validation query;
``queries()`` exposes one callable per implemented operator
(SURVEY.md §2) and ``oracle_sql()`` the DuckDB-equivalent SQL. Column
names/types are aliased identically on both sides (the driver's
compare hashes values after sorting columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators import checks
from cerberus_cpp_spark.plans.engine import TableValidator


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Flagship validation schema over `orders` (exclusive min/max, allowed,
# full-match regex, required — the reference rule vocabulary on a real
# table). allow_unknown: uncovered columns are fine.
# ---------------------------------------------------------------------------

ORDERS_RULES: dict = {
    "o_orderkey": {"type": "integer", "required": True, "min": 0},
    "o_custkey": {"type": "integer", "required": True},
    "o_orderstatus": {"type": "string", "allowed": ["O", "F", "P"]},
    "o_totalprice": {"type": "float", "min": 0, "max": 300000},
    "o_orderpriority": {"type": "string", "regex": "[1-3]-[A-Z ]+"},
}

PART_RULES: dict = {
    "p_partkey": {"type": "integer", "required": True, "min": 0},
    "p_size": {"type": "integer", "min": 0, "max": 50},
    "p_retailprice": {"type": "float", "min": 0},
    "p_brand": {"type": "string", "regex": "Brand#[0-9]+"},
}

EMBEDDING_RULES: dict = {
    "vec_id": {"type": "integer", "required": True},
    "embedding": {"type": "list", "minlength": 64, "maxlength": 64,
                  "empty": False},
}


def q_val_orders_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    tv = TableValidator(ORDERS_RULES, allow_unknown=True)
    res = tv.validate(_t(spark, sf_dir, "orders"))
    return res.violations("o_orderkey")


def q_val_part_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    tv = TableValidator(PART_RULES, allow_unknown=True)
    res = tv.validate(_t(spark, sf_dir, "part"))
    return res.annotated.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_violations").alias("n_violations"),
        F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"),
    )


def q_val_embeddings_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    tv = TableValidator(EMBEDDING_RULES, allow_unknown=True)
    res = tv.validate(_t(spark, sf_dir, "embeddings"))
    return res.violations("vec_id")


def q_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = checks.numeric_stats(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )
    # avg/sum of fractional doubles are summation-order sensitive —
    # keep the oracle-checked projection to exact aggregates
    return df.select("col_name", "null_count", "min_value", "max_value")


def q_nullcount_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("props").isNull().cast("long")).alias("null_props"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_value"),
    )


def q_dup_keys_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return checks.duplicate_keys(
        _t(spark, sf_dir, "orders"), "o_custkey",
        salt_buckets=8, salt_on="o_orderkey",
    )


def q_dup_rows_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return checks.duplicate_rows(
        _t(spark, sf_dir, "orders"), "o_custkey"
    ).select("o_orderkey", "o_custkey")


def q_ref_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential check vs the non-negative-balance customer slice —
    forces real violations (122 negative-balance customers)."""
    orders = _t(spark, sf_dir, "orders")
    dim = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") >= 0)
    return checks.referential_violations(
        orders, dim, "o_custkey", "c_custkey"
    ).select("o_orderkey", "o_custkey")


def q_ref_lineitem_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return checks.referential_violations(
        li, part, "l_partkey", "p_partkey"
    ).select("l_orderkey", "l_partkey")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full rule-vocabulary validation over orders."""
    return q_val_orders_violations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "val_orders_violations": q_val_orders_violations,
        "val_part_summary": q_val_part_summary,
        "val_embeddings_len": q_val_embeddings_len,
        "stats_lineitem": q_stats_lineitem,
        "nullcount_events": q_nullcount_events,
        "dup_keys_orders": q_dup_keys_orders,
        "dup_rows_orders": q_dup_rows_orders,
        "ref_orders_customer": q_ref_orders_customer,
        "ref_lineitem_part": q_ref_lineitem_part,
    }


_ORDERS_VIOL_SQL = """
WITH v AS (
  SELECT o_orderkey, '^.o_orderkey' AS path,
         'min-rule violated' AS message
    FROM orders WHERE o_orderkey IS NOT NULL AND NOT (o_orderkey > 0)
  UNION ALL
  SELECT o_orderkey, '^.o_orderkey', 'required-rule violated: field missing'
    FROM orders WHERE o_orderkey IS NULL
  UNION ALL
  SELECT o_orderkey, '^.o_custkey', 'required-rule violated: field missing'
    FROM orders WHERE o_custkey IS NULL
  UNION ALL
  SELECT o_orderkey, '^.o_orderstatus', 'value disallowed by allowed-rule'
    FROM orders WHERE o_orderstatus IS NOT NULL
                  AND o_orderstatus NOT IN ('O','F','P')
  UNION ALL
  SELECT o_orderkey, '^.o_totalprice', 'min-rule violated'
    FROM orders WHERE o_totalprice IS NOT NULL AND NOT (o_totalprice > 0)
  UNION ALL
  SELECT o_orderkey, '^.o_totalprice', 'max-rule violated'
    FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice >= 300000
  UNION ALL
  SELECT o_orderkey, '^.o_orderpriority', 'regex-rule violated'
    FROM orders WHERE o_orderpriority IS NOT NULL
                  AND NOT regexp_full_match(o_orderpriority, '[1-3]-[A-Z ]+')
)
SELECT * FROM v
"""

_PART_SUMMARY_SQL = """
SELECT count(*) AS n_rows,
       (count(*) FILTER (WHERE p_partkey IS NULL)
        + count(*) FILTER (WHERE p_partkey IS NOT NULL AND NOT (p_partkey > 0))
        + count(*) FILTER (WHERE p_size IS NOT NULL AND NOT (p_size > 0))
        + count(*) FILTER (WHERE p_size IS NOT NULL AND p_size >= 50)
        + count(*) FILTER (WHERE p_retailprice IS NOT NULL
                             AND NOT (p_retailprice > 0))
        + count(*) FILTER (WHERE p_brand IS NOT NULL
                             AND NOT regexp_full_match(p_brand, 'Brand#[0-9]+'))
       ) AS n_violations,
       count(*) FILTER (WHERE
            p_partkey IS NULL
         OR (p_partkey IS NOT NULL AND NOT (p_partkey > 0))
         OR (p_size IS NOT NULL AND (NOT (p_size > 0) OR p_size >= 50))
         OR (p_retailprice IS NOT NULL AND NOT (p_retailprice > 0))
         OR (p_brand IS NOT NULL
             AND NOT regexp_full_match(p_brand, 'Brand#[0-9]+'))
       ) AS invalid_rows
FROM part
"""

_EMB_VIOL_SQL = """
WITH v AS (
  SELECT vec_id, '^.embedding' AS path, 'minlength-rule violated' AS message
    FROM embeddings WHERE COALESCE(len(embedding), 0) < 64
  UNION ALL
  SELECT vec_id, '^.embedding', 'maxlength-rule violated'
    FROM embeddings WHERE COALESCE(len(embedding), 0) > 64
  UNION ALL
  SELECT vec_id, '^.embedding', 'empty-rule violated for sequence'
    FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 0
  UNION ALL
  SELECT vec_id, '^.vec_id', 'required-rule violated: field missing'
    FROM embeddings WHERE vec_id IS NULL
)
SELECT * FROM v
"""


def oracle_sql() -> dict[str, str]:
    return {
        "val_orders_violations": _ORDERS_VIOL_SQL,
        "val_part_summary": _PART_SUMMARY_SQL,
        "val_embeddings_len": _EMB_VIOL_SQL,
        "stats_lineitem": """
            SELECT c.col_name, c.null_count, c.min_value, c.max_value
            FROM (
              SELECT 'l_quantity' AS col_name,
                     count(*) FILTER (WHERE l_quantity IS NULL) AS null_count,
                     min(l_quantity::DOUBLE) AS min_value,
                     max(l_quantity::DOUBLE) AS max_value FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice',
                     count(*) FILTER (WHERE l_extendedprice IS NULL),
                     min(l_extendedprice::DOUBLE),
                     max(l_extendedprice::DOUBLE) FROM lineitem
              UNION ALL
              SELECT 'l_discount',
                     count(*) FILTER (WHERE l_discount IS NULL),
                     min(l_discount::DOUBLE),
                     max(l_discount::DOUBLE) FROM lineitem
            ) c
        """,
        "nullcount_events": """
            SELECT count(*) AS n_rows,
                   count(*) FILTER (WHERE props IS NULL) AS null_props,
                   count(*) FILTER (WHERE value IS NULL) AS null_value
            FROM events
        """,
        "dup_keys_orders": """
            SELECT o_custkey, count(*) AS cnt FROM orders
            GROUP BY o_custkey HAVING count(*) > 1
        """,
        "dup_rows_orders": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (
              SELECT o_custkey FROM orders GROUP BY o_custkey
              HAVING count(*) > 1)
        """,
        "ref_orders_customer": """
            SELECT o_orderkey, o_custkey FROM orders o
            WHERE o_custkey IS NOT NULL AND NOT EXISTS (
              SELECT 1 FROM customer c
              WHERE c.c_acctbal >= 0 AND c.c_custkey = o.o_custkey)
        """,
        "ref_lineitem_part": """
            SELECT l_orderkey, l_partkey FROM lineitem l
            WHERE l_partkey IS NOT NULL AND NOT EXISTS (
              SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
        """,
    }
