"""List-index dependency paths — the `[i]` production of the
reference's path mini-language (``stack.hh:146-172``) used by
``dependencies``/``excludes`` (``rules.hh:143-187``, ``205-227``):
columnar resolution must agree with the dynamic interpreter's
``lookup_path`` (out-of-range index → undefined; index into a
non-list → undefined)."""

from __future__ import annotations

import pytest

from cerberus_cpp_spark.plans.engine import TableValidator
from cerberus_cpp_spark.sources.fixtures import golden_frame


def _differential(spark, schema: dict, docs: list[dict]) -> None:
    tv = TableValidator(
        schema, presence="defined", extra_cols=("doc_id", "expected"),
        allow_unknown=True,
    )
    expected = [tv._interp.validate(d, schema) for d in docs]
    frame = golden_frame(
        spark, schema, [(d, e) for d, e in zip(docs, expected)])
    got = {r["doc_id"]: r["valid"]
           for r in tv.validate(frame).annotated.collect()}
    mismatches = [(i, docs[i], expected[i], got[i])
                  for i in range(len(docs)) if got[i] != expected[i]]
    assert not mismatches, f"first mismatch: {mismatches[0]}"


def test_dependency_on_list_index(spark) -> None:
    """`b` requires `xs[1]` to exist: satisfied only when the list has
    at least two elements."""
    schema = {
        "xs": {"type": "list"},
        "b": {"type": "integer", "dependencies": "xs[1]"},
    }
    docs = [
        {"xs": [1, 2, 3], "b": 7},   # xs[1] defined → ok
        {"xs": [1], "b": 7},         # out of range → violation
        {"xs": [], "b": 7},          # empty → violation
        {"b": 7},                    # xs undefined → violation
        {"xs": [1]},                 # b undefined → dependencies no-op
        {"xs": [1, 2]},              # no b → ok
    ]
    _differential(spark, schema, docs)


def test_dependency_list_index_pinned_value(spark) -> None:
    """Dict form: `xs[0]` must exist AND equal one of the pinned
    values (string equality, rules.hh:167)."""
    schema = {
        "xs": {"type": "list"},
        "b": {"type": "integer", "dependencies": {"xs[0]": [1, 5]}},
    }
    docs = [
        {"xs": [1, 9], "b": 7},    # xs[0]=1 pinned → ok
        {"xs": [5], "b": 7},       # pinned → ok
        {"xs": [2], "b": 7},       # wrong value → violation
        {"xs": [], "b": 7},        # out of range → violation
        {"xs": [2]},               # b undefined → no-op
    ]
    _differential(spark, schema, docs)


def test_excludes_list_index(spark) -> None:
    """`b` excludes `xs[2]`: fires only when that element exists."""
    schema = {
        "xs": {"type": "list"},
        "b": {"type": "integer", "excludes": "xs[2]"},
    }
    docs = [
        {"xs": [1, 2, 3], "b": 7},  # xs[2] present → violation
        {"xs": [1, 2], "b": 7},     # absent → ok
        {"xs": [1, 2, 3]},          # b undefined → no-op
    ]
    _differential(spark, schema, docs)


def test_anchored_list_index_from_nested_scope(spark) -> None:
    """`^xs[0]` from inside a nested mapping resolves at the document
    root (stack.hh anchor semantics)."""
    schema = {
        "xs": {"type": "list"},
        "c": {"type": "dict", "schema": {
            "y": {"type": "integer", "dependencies": "^xs[0]"},
        }},
    }
    docs = [
        {"xs": [4], "c": {"y": 1}},  # root xs[0] defined → ok
        {"xs": [], "c": {"y": 1}},   # out of range → violation
        {"c": {"y": 1}},             # xs undefined → violation
        {"xs": [], "c": {}},         # y undefined → no-op
    ]
    _differential(spark, schema, docs)


def test_index_into_non_list_is_undefined(spark) -> None:
    """`a[0]` where `a` is a scalar: undefined in the interpreter
    (lookup only descends lists) — the columnar resolver must agree,
    not crash."""
    schema = {
        "a": {"type": "integer"},
        "b": {"type": "integer", "dependencies": "a[0]"},
    }
    docs = [
        {"a": 3, "b": 7},  # a is scalar → a[0] undefined → violation
        {"a": 3},          # b undefined → no-op
    ]
    _differential(spark, schema, docs)
