"""Production (presence='null') validation over the input_hint table.

Seeded violations at known indices (FIXTURES.md §1) → exact expected
counts; also pins that the validation pass introduces NO shuffle.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cerberus_cpp_spark.plans.engine import TableValidator
from cerberus_cpp_spark.sources.fixtures import (
    IMAGE_TABLE_RULES,
    image_caption_table,
)

N = 5000
# violation kind k hits rows i where i%100==0 and (i//100)%6==k;
# i//100 ranges 0..49 → kinds 0,1 occur 9×, kinds 2..5 occur 8×
EXPECTED = {
    "^.w": 9,       # w=0 fails exclusive min 0
    "^.h": 9,       # h=20000 fails max 16384
    "^.fmt": 8,     # "heif" not allowed
    "^.caption": 8 + 8,  # 8 explicit nulls + 8 control-char regex
    "^.image_id": 8,     # nulls fail required
}


@pytest.fixture(scope="module")
def result(spark):
    df = image_caption_table(spark, N)
    tv = TableValidator(IMAGE_TABLE_RULES)
    return tv.validate(df)


def test_seeded_violation_counts(result) -> None:
    counts = result.counts()
    assert counts["rows"] == N
    assert counts["violations"] == sum(EXPECTED.values())
    assert counts["invalid_rows"] == 50


def test_violation_paths(result) -> None:
    got = {
        r["path"]: r["cnt"]
        for r in result.violations("image_id")
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == EXPECTED


def test_validation_is_shuffle_free(result) -> None:
    """The rule pass must stay a narrow projection: no Exchange in the
    annotated plan beyond the fixture's own repartition."""
    plan = result.annotated._jdf.queryExecution().executedPlan().toString()
    # the fixture repartition(8) is the ONLY exchange allowed
    assert plan.count("Exchange") <= 1, plan


def test_clean_table_is_valid(spark) -> None:
    df = image_caption_table(spark, 300, violation_every=None)
    tv = TableValidator(IMAGE_TABLE_RULES)
    assert tv.validate(df).is_valid()


def test_normalized_drops_nothing_without_purge(result) -> None:
    assert set(result.normalized.columns) == {
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    }


def test_partition_verdicts(result) -> None:
    rows = {r["fmt"]: r for r in
            result.partition_verdicts("fmt").collect()}
    assert not rows["heif"]["passed"]
    assert rows["heif"]["rows"] == 8
    total = sum(r["violations"] for r in rows.values())
    assert total == sum(EXPECTED.values())
