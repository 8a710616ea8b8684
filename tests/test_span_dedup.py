"""Corpus-level repeated-span removal (operators/text.py
remove_repeated_spans): ExactSubstr-recipe semantics (Lee et al.
2022) at token grain — first-occurrence survival, covered-position
union, within-doc repeats, rebuild fidelity — pinned against a
brute-force Python reference over arbitrary hypothesis corpora,
plus parameter guards, NULL/short-doc routing, and plan shape."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cerberus_cpp_spark.operators.text import remove_repeated_spans


def _ref(rows, n, min_count=2, sep=" "):
    """Brute-force oracle: enumerate every n-token window, find the
    corpus-wide first occurrence of each duplicated window, remove
    every token position covered by any other occurrence."""
    occ: dict[tuple, list[tuple]] = {}
    toks: dict[int, list[str]] = {}
    for d, t in rows:
        if t is None:
            continue
        ts = t.split(sep)
        toks[d] = ts
        for p in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[p:p + n]), []).append((d, p))
    rm: dict[int, set[int]] = {}
    for positions in occ.values():
        if len(positions) >= min_count:
            first = min(positions)
            for o in positions:
                if o != first:
                    d, p = o
                    rm.setdefault(d, set()).update(range(p, p + n))
    out = {}
    for d, t in rows:
        if t is None:
            out[d] = (None, 0, 0)
            continue
        ts, r = toks[d], rm.get(d, set())
        kept = [tk for i, tk in enumerate(ts) if i not in r]
        out[d] = (sep.join(kept), len(ts), len(r))
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_repeated_spans(df, **kw).collect()
    }


def test_cross_doc_first_occurrence_survives(spark) -> None:
    rows = [
        (0, "a b c d e f g"),
        (1, "x y a b c d z"),   # 'a b c d' windows are non-first
        (2, None),
        (3, ""),
        (4, "a b c a b c a b c"),  # within-doc repeats; 'a b c'
                                   # first occurrence is doc 0
        (5, "q r s"),              # shorter than n: untouched
    ]
    got = _run(spark, rows, n=3)
    assert got == _ref(rows, 3)
    # the survivor copy of the shared span lives intact in doc 0
    assert got[0] == ("a b c d e f g", 7, 0)
    assert got[1] == ("x y z", 7, 4)
    assert got[2] == (None, 0, 0)
    assert got[5] == ("q r s", 3, 0)


def test_min_count_spares_below_threshold(spark) -> None:
    rows = [(0, "a b c d"), (1, "a b c e")]  # 'a b c' occurs 2x
    assert _run(spark, rows, n=3, min_count=3) == \
        _ref(rows, 3, min_count=3)
    assert all(nr == 0 for _, _, nr in
               _run(spark, rows, n=3, min_count=3).values())


def test_parameter_guards(spark) -> None:
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n must"):
        remove_repeated_spans(df, n=1)
    with pytest.raises(ValueError, match="min_count"):
        remove_repeated_spans(df, n=3, min_count=1)
    with pytest.raises(ValueError, match="sep"):
        remove_repeated_spans(df, n=3, sep="")


_tok = st.sampled_from(["a", "b", "c", "ab", "x1", ""])


@given(st.lists(st.lists(_tok, min_size=1, max_size=10),
                min_size=1, max_size=7),
       st.integers(min_value=2, max_value=4))
@settings(max_examples=20, deadline=None)
def test_matches_bruteforce_reference(spark, docs, n) -> None:
    """The Spark plan computes EXACTLY the brute-force semantics for
    arbitrary corpora (including empty-string tokens, docs shorter
    than n, and within-doc overlapping repeats)."""
    rows = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
    assert _run(spark, rows, n=n) == _ref(rows, n)


def test_accounting_and_rebuild(spark) -> None:
    rows = [(i, f"u{i} v{i} " + "p q r s t" + f" w{i}")
            for i in range(6)]
    got = _run(spark, rows, n=5)
    want = _ref(rows, 5)
    assert got == want
    # the shared mid-text span survives exactly once corpus-wide
    survivors = sum("p q r s t" in (t or "") for t, _, _ in
                    got.values())
    assert survivors == 1
    for t, n_tok, n_rm in got.values():
        kept = len(t.split(" ")) if t != "" else 0
        if t != "":
            assert kept == n_tok - n_rm


def test_plan_ships_hashes_not_gram_strings(spark) -> None:
    """The span-frequency aggregate exchanges int64 hashes with
    map-side partial aggregation; gram strings are built inside the
    projection and never shuffled."""
    df = spark.createDataFrame(
        [(i, "w x y z " * 3) for i in range(8)],
        "doc_id long, text string")
    out = remove_repeated_spans(df, n=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    # partial aggregation before the span-stats Exchange
    assert "partial_count" in plan or "partial" in plan.lower()
