"""dedup.edit_distance_pairs: FastSS deletion-neighborhood blocking
with exact recall (pinned vs a brute-force Levenshtein reference),
exact precision (final filter), guards, and plan shape."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import Row

from cerberus_cpp_spark.operators.dedup import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        d = _lev(sa, sb)
        if d <= k:
            lo, hi = min(ia, ib), max(ia, ib)
            out.add((lo, hi, d))
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=s) for i, s in rows],
        schema="doc_id long, text string")


def _got(spark, rows, k, **kw):
    return {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(_df(spark, rows), k=k,
                                     **kw).collect()
    }


def test_exact_pairs_k1_handpicked(spark):
    rows = [(1, "kitten"), (2, "sitten"), (3, "sittin"),
            (4, "kitte"), (5, "kitten"), (6, "unrelated"),
            (7, "kittens")]
    got = _got(spark, rows, 1)
    assert got == _brute(rows, 1)
    assert (1, 5, 0) in got          # exact dup at distance 0
    assert (1, 4, 1) in got          # deletion
    assert (1, 2, 1) in got          # substitution
    assert (1, 7, 1) in got          # insertion
    assert not any(a == 6 or b == 6 for a, b, _ in got)


def test_exact_pairs_k2_handpicked(spark):
    rows = [(1, "kitten"), (2, "sittin"), (3, "mitten"),
            (4, "kit"), (5, "abcdef")]
    got = _got(spark, rows, 2)
    assert got == _brute(rows, 2)
    assert (1, 2, 2) in got          # two substitutions
    assert (1, 3, 1) in got


@pytest.mark.parametrize("k", [1, 2])
def test_random_vs_brute(spark, k):
    rng = random.Random(40 + k)
    alpha = "abc"
    rows = [
        (i, "".join(rng.choice(alpha)
                    for _ in range(rng.randrange(0, 7))))
        for i in range(60)
    ]
    assert _got(spark, rows, k) == _brute(rows, k)


def test_null_and_overlong_excluded(spark):
    rows_df = _df(spark, [(1, "abcd"), (2, "abcde")])
    rows_df = rows_df.unionByName(
        rows_df.sparkSession.createDataFrame(
            [Row(doc_id=3, text=None),
             Row(doc_id=4, text="x" * 40)],
            schema="doc_id long, text string"))
    got = {(r["id_a"], r["id_b"], r["dist"])
           for r in edit_distance_pairs(rows_df, k=1,
                                        max_len=30).collect()}
    assert got == {(1, 2, 1)}


def test_max_bucket_drops_hot_variant(spark):
    # 30 identical strings share every variant; cap at 10 drops the
    # bucket (documented recall loss), so no pairs survive
    rows = [(i, "same") for i in range(30)]
    assert _got(spark, rows, 1, max_bucket=10) == set()
    assert len(_got(spark, rows, 1)) == 30 * 29 // 2


@pytest.mark.parametrize("k", [1, 2])
def test_identity_groups_vs_brute(spark, k):
    # the dedup-first path: heavy identity groups (repeated strings)
    # plus deletion/substitution neighbors — expansion through the
    # groups must reproduce the brute-force pair multiset exactly
    rows = []
    i = 0
    for word in ["hot bolt", "hot bol", "hot colt", "cold bolt",
                 "hot bolt", "hot bolt", "hot bol", "xyz"]:
        for _ in range(3):
            rows.append((i, word))
            i += 1
    got = _got(spark, rows, k)
    assert got == _brute(rows, k)


def test_capped_and_uncapped_paths_agree(spark):
    # max_bucket set -> the per-id path; a cap too high to fire must
    # reproduce the dedup-first default exactly
    rng = random.Random(99)
    rows = [(i, "".join(rng.choice("ab")
                        for _ in range(rng.randrange(0, 5))))
            for i in range(40)]
    assert _got(spark, rows, 1) == _got(spark, rows, 1,
                                        max_bucket=10_000)


def test_guards(spark):
    df = _df(spark, [(1, "a")])
    with pytest.raises(ValueError):
        edit_distance_pairs(df, k=3)
    with pytest.raises(ValueError):
        edit_distance_pairs(df, k=0)
    with pytest.raises(ValueError):
        edit_distance_pairs(df, k=1, max_len=0)


def test_plan_ships_hashes_not_variants(spark):
    # the candidate join must run on the int64 variant hash — the
    # exploded variant STRING must not survive into the join
    rows = [(i, f"caption {i}") for i in range(8)]
    plan = edit_distance_pairs(_df(spark, rows), k=1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "levenshtein" in plan
