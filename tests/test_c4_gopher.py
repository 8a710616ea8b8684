"""The two published corpus-cleaning rule sets as verdict operators
(operators/text.py c4_clean / gopher_quality_filter — Raffel et al.
2020 §2.2, Rae et al. 2021 §A1.1): per-rule branch coverage, NULL
routing, parameter guards, zero-Exchange plan pins, and stream==
batch equality (both are stateless codegen projections)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cerberus_cpp_spark.operators.text import (
    c4_clean,
    gopher_quality_filter,
)


def _pages(spark):
    return spark.createDataFrame([
        (0, "This is a good long sentence with words.\nshort.\n"
            "No terminal punct here\n"
            "Another fine long sentence right here!\n"
            "this line mentions JavaScript sadly today."),
        (1, "Good long sentence number one right here.\n"
            "Good long sentence number two right here."),
        (2, "function f() { return 1; }\n"
            "A fine sentence that would pass easily okay."),
        (3, "Lorem Ipsum dolor sit amet consectetur adipiscing.\n"
            "More fine text in a long sentence here."),
        (4, None),
        (5, "Only one good line survives this page okay.\n"
            "junk\nmore junk"),
        (6, "This page has a forbiddenword inside a sentence.\n"
            "And this other sentence is long and fine."),
    ], "doc_id long, text string")


def test_c4_line_and_page_rules(spark) -> None:
    out = {
        r["doc_id"]: r
        for r in c4_clean(
            _pages(spark), min_kept_lines=2,
            badwords=("forbiddenword",),
        ).collect()
    }
    # line rules: terminal punct + >=5 words + no 'javascript'
    assert out[0]["n_lines"] == 5 and out[0]["n_kept"] == 2
    assert out[0]["dropped"] is False
    assert out[0]["text"] == (
        "This is a good long sentence with words.\n"
        "Another fine long sentence right here!")
    assert out[1]["dropped"] is False and out[1]["n_kept"] == 2
    # page rules, first-fail order
    assert out[2]["drop_reason"] == "curly_brace"
    assert out[3]["drop_reason"] == "lorem_ipsum"
    assert out[4]["drop_reason"] == "null_text"
    assert out[4]["n_lines"] == 0
    assert out[5]["drop_reason"] == "too_few_lines"
    assert out[6]["drop_reason"] == "badword"
    # dropped pages carry NULL text
    for d in (2, 3, 4, 5, 6):
        assert out[d]["dropped"] is True and out[d]["text"] is None


def test_c4_guards(spark) -> None:
    df = _pages(spark)
    with pytest.raises(ValueError, match="min_words_per_line"):
        c4_clean(df, min_words_per_line=0)
    with pytest.raises(ValueError, match="min_kept_lines"):
        c4_clean(df, min_kept_lines=-1)
    with pytest.raises(ValueError, match="badword"):
        c4_clean(df, badwords=("a'b",))


def test_c4_plan_is_narrow(spark) -> None:
    plan = (c4_clean(_pages(spark))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_gopher_rule_branches(spark) -> None:
    docs = spark.createDataFrame([
        # passes everything (threshold-tuned below)
        (0, "the quick brown fox jumps over that lazy dog again "
            "and then it runs back home to rest for a while"),
        # too few words
        (1, "tiny doc with the words."),
        # symbol soup: many #
        (2, "the cat ### sat ## on # the ## mat # again ## now #"),
        # bullets dominate
        (3, "the intro line here\n• one\n• two\n• three"),
        # ellipsis endings dominate
        (4, "the first thought trails ...\nthe second one too ..."),
        # numeric words (alpha fraction low)
        (5, "the 1 2 3 4 5 6 7 8 9 10 11 12"),
        # no stopwords
        (6, "lorem dolor sit amet consectetur adipiscing elit sed"),
        (7, None),
        # mean word length too high
        (8, "extraordinarily incomprehensible misunderstandings "
            "internationalization anthropomorphization the"),
    ], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in gopher_quality_filter(
            docs, min_words=10, max_bullet_frac=0.5,
            min_stop_hits=1,
        ).collect()
    }
    assert out[0]["passed"] is True and out[0]["fail_reasons"] == ""
    assert out[1]["fail_reasons"] == "word_count"
    assert "symbol_ratio" in out[2]["fail_reasons"]
    assert out[2]["symbol_word_ratio"] == 12 / 15
    assert "bullet_lines" in out[3]["fail_reasons"]
    assert out[3]["bullet_line_frac"] == 3 / 4
    assert "ellipsis_lines" in out[4]["fail_reasons"]
    assert out[4]["ellipsis_line_frac"] == 1.0
    assert "alpha_words" in out[5]["fail_reasons"]
    assert out[5]["alpha_word_frac"] == 1 / 13
    assert "stopwords" in out[6]["fail_reasons"]
    assert out[6]["n_stop_hits"] == 0
    assert out[7]["fail_reasons"] == "no_words"
    assert out[7]["mean_word_len"] is None
    assert "mean_word_len" in out[8]["fail_reasons"]
    assert not out[8]["passed"]


def test_gopher_ellipsis_non_overlapping(spark) -> None:
    # '....' = one '...' match left-to-right; '……' = two
    docs = spark.createDataFrame(
        [(0, "the word .... more …… and the end here now ok")],
        "doc_id long, text string")
    r = gopher_quality_filter(docs, min_words=5).collect()[0]
    # symbols: one '...' + two '…' = 3
    assert r["symbol_word_ratio"] == 3 / r["n_words"]


def test_gopher_plan_is_narrow(spark) -> None:
    docs = spark.createDataFrame(
        [(0, "the a b.")], "doc_id long, text string")
    plan = (gopher_quality_filter(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def _roundtrip(spark, tmp_path, batch_df, op, name):
    src = str(tmp_path / name)
    batch_df.write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    expected = sorted(
        map(tuple, op(batch).collect()), key=repr)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (op(stream).writeStream.format("memory")
         .queryName(f"{name}_s").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql(f"SELECT * FROM {name}_s").collect()),
        key=repr)
    assert got == expected and len(got) > 0


def test_stream_equals_batch(spark, tmp_path) -> None:
    """Both rule sets are stateless projections: they apply to a
    live ingest stream unchanged, row-for-row equal to batch."""
    _roundtrip(spark, tmp_path, _pages(spark),
               lambda df: c4_clean(df, min_kept_lines=2), "c4s")
    _roundtrip(spark, tmp_path, _pages(spark),
               lambda df: gopher_quality_filter(df, min_words=5),
               "gqs")
