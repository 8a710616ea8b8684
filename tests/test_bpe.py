"""Distributed BPE training and segmentation (operators/text.py
bpe_train / bpe_segment — Sennrich et al. 2016): merge tables pinned
rule-for-rule against a pure-Python classic-BPE reference (including
over hypothesis-generated corpora), greedy left-to-right replace
mechanics on the wrapped-string encoding, segmentation == final
training state, and the zero-Exchange segmentation plan pin."""

from __future__ import annotations

import collections
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_cpp_spark.operators.text import bpe_segment, bpe_train


def _ref_bpe(words_freq: dict[str, int], k: int):
    """Classic BPE: count adjacent symbol pairs weighted by word
    frequency, merge the (count DESC, left ASC, right ASC) winner
    greedily left-to-right, repeat."""
    state = {w: tuple(w) for w in words_freq}
    merges = []
    for step in range(1, k + 1):
        pc: collections.Counter = collections.Counter()
        for w, f in words_freq.items():
            syms = state[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (l, r), c = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((step, l, r, l + r, c))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = tuple(out)
    return merges, state


def _word_freqs(texts):
    return collections.Counter(
        w for t in texts if t
        for w in re.findall("[a-z0-9]+", t.lower()))


def test_matches_classic_bpe(spark) -> None:
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide wide low",
        None,
        "aaa aa aaaa",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    got = bpe_train(df, n_merges=8)
    want, state = _ref_bpe(_word_freqs(texts), 8)
    assert got == want
    # segmentation with the learned rules == final training state
    seg = {
        r["doc_id"]: r["subwords"]
        for r in df.select(
            "doc_id",
            bpe_segment("text", [(l, r) for _, l, r, _, _ in got]),
        ).collect()
    }
    for d, t in enumerate(texts):
        if t is None:
            assert seg[d] is None
            continue
        assert seg[d] == [
            s for w in re.findall("[a-z0-9]+", t.lower())
            for s in state[w]]


def test_greedy_replace_edge_cases(spark) -> None:
    # 'a a a' under (a,a) -> [aa, a]; 'abab' under (a,b) -> [ab, ab]
    df = spark.createDataFrame(
        [(0, "aaa abab")], "doc_id long, text string")
    seg = df.select(bpe_segment("text", [("a", "a")])).collect()
    assert seg[0]["subwords"] == ["aa", "a", "a", "b", "a", "b"]
    seg = df.select(bpe_segment("text", [("a", "b")])).collect()
    assert seg[0]["subwords"] == ["a", "a", "a", "ab", "ab"]
    # chained: (a,b) then (ab,ab)
    seg = df.select(
        bpe_segment("text", [("a", "b"), ("ab", "ab")])).collect()
    assert seg[0]["subwords"] == ["a", "a", "a", "abab"]


def test_exhausted_corpus_stops_early(spark) -> None:
    # single 1-char word: no pairs at all
    df = spark.createDataFrame(
        [(0, "a a a")], "doc_id long, text string")
    assert bpe_train(df, n_merges=4) == []
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=0)


_word = st.text(alphabet="abc", min_size=1, max_size=5)


@given(st.lists(st.lists(_word, min_size=1, max_size=8),
                min_size=1, max_size=5),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=10, deadline=None)
def test_bpe_property_vs_reference(spark, docs, k) -> None:
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    want, _ = _ref_bpe(_word_freqs(texts), k)
    assert bpe_train(df, n_merges=k) == want


def test_segment_plan_is_narrow(spark) -> None:
    df = spark.createDataFrame(
        [(0, "the cat")], "doc_id long, text string")
    out = df.select("doc_id", bpe_segment("text", [("t", "h")]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@given(st.lists(st.lists(_word, min_size=1, max_size=8),
                min_size=1, max_size=5),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=10, deadline=None)
def test_local_finish_equals_distributed(spark, docs, k) -> None:
    """local_finish_vocab=default (in-process loop) must reproduce the
    forced-distributed loop rule-for-rule including counts."""
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")
    local = bpe_train(df, n_merges=k)
    dist = bpe_train(df, n_merges=k, local_finish_vocab=0)
    assert local == dist
