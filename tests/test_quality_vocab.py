"""Linear bag-of-ngrams quality classifier and vocabulary census
(operators/text.py linear_quality_score / vocab_topk / vocab_stats):
exact integer scoring, OOV/NULL/empty routing, duplicate-vocabulary
guard, deterministic top-k ranking, and plan shape (top-k must be a
per-partition TakeOrderedAndProject, never a full sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.text import (
    linear_quality_score,
    vocab_stats,
    vocab_topk,
)


def _docs(spark):
    return spark.createDataFrame([
        (0, "The quick brown fox jumps"),
        (1, "spam spam buy now spam"),
        (2, None),
        (3, ""),
        (4, "Quick brown"),
    ], "doc_id long, text string")


def _weights(spark):
    return spark.createDataFrame([
        ("quick", 5), ("brown", 3), ("spam", -10),
        ("quick brown", 7), ("buy now", -20),
    ], "term string, weight long")


def test_classifier_exact_scores(spark) -> None:
    out = {
        r["doc_id"]: r
        for r in linear_quality_score(
            _docs(spark), _weights(spark), bias=1, threshold=0.5
        ).collect()
    }
    # doc 0: 5 unigrams + 4 bigrams = 9 terms; quick(5) + brown(3)
    # + 'quick brown'(7) = 15, +bias -> 16; mean 16/9 >= 0.5
    assert out[0]["n_terms"] == 9 and out[0]["n_matched"] == 3
    assert out[0]["score_sum"] == 16
    assert out[0]["score_mean"] == 16 / 9
    assert out[0]["label"] is True
    # doc 1: 3x spam(-30) + 'buy now'(-20) -> -49 after bias
    assert out[1]["score_sum"] == -49 and out[1]["label"] is False
    assert out[1]["n_matched"] == 4
    # NULL and token-free docs: bias only, NULL mean, label false
    for d in (2, 3):
        assert out[d]["n_terms"] == 0
        assert out[d]["score_sum"] == 1
        assert out[d]["score_mean"] is None
        assert out[d]["label"] is False
    # doc 4: every term matches
    assert out[4] and out[4]["n_matched"] == out[4]["n_terms"] == 3


def test_classifier_unigrams_only(spark) -> None:
    out = {
        r["doc_id"]: r
        for r in linear_quality_score(
            _docs(spark), _weights(spark), bigrams=False
        ).collect()
    }
    assert out[0]["n_terms"] == 5          # no bigram features
    assert out[0]["score_sum"] == 8        # quick + brown only
    assert out[4]["n_terms"] == 2 and out[4]["score_sum"] == 8


def test_classifier_duplicate_term_guard(spark) -> None:
    dup = spark.createDataFrame(
        [("quick", 1), ("quick", 2)], "term string, weight long")
    with pytest.raises(Exception, match="duplicate weight term"):
        linear_quality_score(_docs(spark), dup).collect()


def test_classifier_oov_only_doc(spark) -> None:
    docs = spark.createDataFrame(
        [(9, "zzz yyy")], "doc_id long, text string")
    r = linear_quality_score(
        docs, _weights(spark), bias=0).collect()[0]
    assert (r["n_terms"], r["n_matched"], r["score_sum"]) == (3, 0, 0)
    assert r["score_mean"] == 0.0 and r["label"] is True  # 0 >= 0


def test_vocab_topk_deterministic_ties(spark) -> None:
    docs = spark.createDataFrame([
        (0, "b a c a"),
        (1, "c b d"),
    ], "doc_id long, text string")
    rows = vocab_topk(docs, k=3).collect()
    # a:2 (1 doc), b:2 (2 docs), c:2 (2 docs), d:1 — tie broken by
    # term ascending
    assert [(r["term"], r["n_occ"], r["n_docs"], r["rank"])
            for r in rows] == [
        ("a", 2, 1, 1), ("b", 2, 2, 2), ("c", 2, 2, 3)]
    with pytest.raises(ValueError, match="k must"):
        vocab_topk(docs, k=0)


def test_vocab_topk_plan_is_take_ordered(spark) -> None:
    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(10)],
        "doc_id long, text string")
    plan = (vocab_topk(docs, k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    # the Zipf-head sort must never be a global Sort+Exchange
    assert "Sort " not in plan.replace("sortOrder", "")


def test_vocab_stats_exact(spark) -> None:
    docs = spark.createDataFrame([
        (0, "a a b"),
        (1, "b c"),
        (2, None),
    ], "doc_id long, text string")
    r = vocab_stats(docs).collect()[0]
    assert r["n_tokens"] == 5 and r["n_types"] == 3
    assert r["n_hapax"] == 1                     # only 'c'
    assert r["type_token_ratio"] == 3 / 5
    assert r["top_share"] == 2 / 5


# ---------------------------------------------------------------
# lm_coverage (reference-corpus bigram coverage)
# ---------------------------------------------------------------

from cerberus_cpp_spark.operators.text import lm_coverage  # noqa: E402


def _lm_frames(spark):
    ref = spark.createDataFrame([
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
    ], "doc_id long, text string")
    docs = spark.createDataFrame([
        (10, "the cat sat"),
        (11, "zz qq"),
        (12, None),
        (13, "one"),
    ], "doc_id long, text string")
    return ref, docs


def test_lm_coverage_exact(spark) -> None:
    ref, docs = _lm_frames(spark)
    out = {r["doc_id"]: tuple(r)[1:]
           for r in lm_coverage(docs, ref, n=2).collect()}
    # 'the cat' occurs twice in ref, 'cat sat' once
    assert out[10] == (2, 2, 1.0, 1.5)
    assert out[11] == (1, 0, 0.0, 0.0)        # fully OOV
    assert out[12] == (0, 0, None, None)      # NULL text
    assert out[13] == (0, 0, None, None)      # < n tokens


def test_lm_coverage_min_count(spark) -> None:
    ref, docs = _lm_frames(spark)
    out = {r["doc_id"]: tuple(r)[1:]
           for r in lm_coverage(docs, ref, n=2,
                                min_count=2).collect()}
    # only 'the cat' (ref count 2) survives the threshold
    assert out[10] == (2, 1, 0.5, 1.0)
    with pytest.raises(ValueError, match="min_count"):
        lm_coverage(docs, ref, min_count=0)
    with pytest.raises(ValueError, match="n must"):
        lm_coverage(docs, ref, n=0)


def test_lm_coverage_plan_ships_hashes(spark) -> None:
    ref, docs = _lm_frames(spark)
    plan = (lm_coverage(docs, ref, n=2)
            ._jdf.queryExecution().executedPlan().toString())
    # grams travel as int64 xxhash64 keys, with map-side partials
    # on the reference frequency aggregate
    assert "xxhash64" in plan and "partial_count" in plan
