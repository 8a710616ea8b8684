"""Exotic nesting parity — map-in-list-in-struct and deeper: the
columnar engine's element emitters (``plans/compiler.py``
``_elem_emitters``/``_mapping_emitters``) must agree with the dynamic
interpreter on verdicts AND violation (path, message) sets for
list-of-dict documents (reference semantics: ``rules.hh:519-573``
schema recursion, ``validator.hh:302-344`` validateDict,
``rules.hh:270-288``/``614-632`` keysrules/valuesrules)."""

from __future__ import annotations

import random

import pytest

from cerberus_cpp_spark.plans.engine import TableValidator
from cerberus_cpp_spark.sources.fixtures import (
    HeterogeneousShape,
    golden_frame,
)


def _differential(spark, schema: dict, docs: list[dict]) -> None:
    tv = TableValidator(
        schema, presence="defined", extra_cols=("doc_id", "expected"))
    exp, exp_errs = [], []
    for d in docs:
        exp.append(tv._interp.validate(d, schema))
        exp_errs.append(
            sorted((e.path, e.message) for e in tv._interp.errors))
    frame = golden_frame(spark, schema, list(zip(docs, exp)))
    rows = {r["doc_id"]: r for r in tv.validate(frame).annotated.collect()}
    mismatches = []
    for i in range(len(docs)):
        got_errs = sorted(
            (x["path"], x["message"]) for x in rows[i]["violations"])
        if rows[i]["valid"] != exp[i] or got_errs != exp_errs[i]:
            mismatches.append((docs[i], exp[i], exp_errs[i],
                               rows[i]["valid"], got_errs))
    assert not mismatches, f"first: {mismatches[0]}"


def test_map_in_list_in_struct(spark) -> None:
    """The headline shape: a struct field holding a list of dicts,
    each with a map child governed by keysrules+valuesrules."""
    schema = {"c": {"type": "dict", "schema": {
        "xs": {"type": "list", "schema": {
            "type": "dict",
            "schema": {
                "y": {"type": "integer", "required": True, "min": 3},
                "m": {"type": "dict",
                      "keysrules": {"regex": "[a-z]+"},
                      "valuesrules": {"type": "integer", "max": 100}},
            },
        }},
    }}}
    docs = [
        {"c": {"xs": [{"y": 5, "m": {"ok": 7}}]}},
        {"c": {"xs": [{"y": 2}]}},                      # min violated
        {"c": {"xs": [{}]}},                            # y required
        {"c": {"xs": [None]}},                          # null element
        {"c": {"xs": [{"y": 5, "z": 1}]}},              # unknown key
        {"c": {"xs": [{"y": 5, "m": {"BAD": 7}}]}},     # keysrules
        {"c": {"xs": [{"y": 5, "m": {"ok": 200}}]}},    # valuesrules max
        {"c": {"xs": [{"y": 5, "m": {"ok": "xx"}}]}},   # valuesrules type
        {"c": {"xs": []}},
        {"c": {}},
        {},
        {"c": {"xs": [{"y": 9, "m": {"a": 1, "B": 2}},  # multi-element
                      {"y": 0, "m": {}}]}},
    ]
    _differential(spark, schema, docs)


def test_list_of_dicts_two_deep(spark) -> None:
    """dict-in-dict inside list elements (two mapping levels below the
    element)."""
    schema = {"xs": {"type": "list", "schema": {
        "type": "dict",
        "schema": {"inner": {"type": "dict", "schema": {
            "v": {"type": "integer", "required": True,
                  "allowed": [1, 2, 3]},
        }}},
    }}}
    docs = [
        {"xs": [{"inner": {"v": 2}}]},
        {"xs": [{"inner": {"v": 9}}]},   # allowed violated
        {"xs": [{"inner": {}}]},         # v required
        {"xs": [{}]},                    # inner undefined → schema no-op
        {"xs": [{"inner": None}]},       # null inner → schema no-op
        {"xs": [{"inner": {"v": 1, "w": 5}}]},  # unknown key in inner
    ]
    _differential(spark, schema, docs)


def test_null_list_elements_fire_injected_nullable(spark) -> None:
    """Explicit null elements violate the auto-injected nullable:false
    (rules.hh:393-397) — elements have no absent-key ambiguity."""
    schema = {"xs": {"type": "list", "schema": {"type": "integer"}}}
    docs = [{"xs": [1, None]}, {"xs": [1, 2]}, {"xs": [None]}]
    _differential(spark, schema, docs)


def test_items_null_element_and_short_list(spark) -> None:
    """items (positional): null element fires injected nullable; a
    too-short list leaves trailing item rules on UNDEFINED (required
    fires, others skip)."""
    schema = {"xs": {"type": "list", "items": [
        {"type": "integer", "min": 0},
        {"type": "string", "required": True},
    ]}}
    docs = [
        {"xs": [1, "a"]},
        {"xs": [None, "a"]},   # null item 0
        {"xs": [1]},           # item 1 undefined → required fires
        {"xs": [-5, "a"]},     # min violated at [0]
        {"xs": []},
    ]
    _differential(spark, schema, docs)


def test_registered_schema_in_list_elements(spark) -> None:
    """Registered-schema indirection for element rules."""
    schema = {"xs": {"type": "list", "schema": {
        "type": "dict", "schema": "point",
    }}}
    point = {"x": {"type": "integer", "required": True},
             "y": {"type": "integer", "required": True}}
    docs = [
        {"xs": [{"x": 1, "y": 2}]},
        {"xs": [{"x": 1}]},          # y required
    ]
    tv = TableValidator(
        schema, presence="defined", extra_cols=("doc_id", "expected"),
        registry={"point": point})
    exp = []
    for d in docs:
        exp.append(tv._interp.validate(d, schema))
    frame = golden_frame(spark, schema, list(zip(docs, exp)),
                         registry={"point": point})
    got = {r["doc_id"]: r["valid"]
           for r in tv.validate(frame).annotated.collect()}
    assert [got[i] for i in range(len(docs))] == exp


NESTED_SCALARS = [0, 1, 7, 42, "a", "zz", "42", None]


def _rand_elem_doc(rng: random.Random) -> dict:
    elem: dict = {}
    if rng.random() < 0.8:
        elem["y"] = rng.choice(NESTED_SCALARS)
    if rng.random() < 0.5:
        elem["m"] = {
            rng.choice(["ok", "deep", "BAD", "k9"]):
                rng.choice([1, 77, 200, "x"])
            for _ in range(rng.randint(0, 3))
        }
    if rng.random() < 0.15:
        elem["zz_unknown"] = 1
    return elem


@pytest.mark.parametrize("seed", range(12))
def test_property_map_in_list_in_struct(seed: int, spark) -> None:
    """Random documents through the headline nested shape: verdict and
    (path, message) sets must match the interpreter exactly."""
    rng = random.Random(4200 + seed)
    schema = {"c": {"type": "dict", "schema": {
        "xs": {"type": "list", "schema": {
            "type": "dict",
            "schema": {
                "y": {"type": "integer",
                      "required": rng.random() < 0.5,
                      "min": rng.choice([0, 3, 41])},
                "m": {"type": "dict",
                      "keysrules": {"regex": "[a-z]+[0-9]?"},
                      "valuesrules": {"type": "integer",
                                      "max": rng.choice([10, 100])}},
            },
        }},
        "tag": {"type": "string"},
    }}}
    docs = []
    for _ in range(16):
        doc: dict = {}
        if rng.random() < 0.9:
            c: dict = {}
            if rng.random() < 0.85:
                c["xs"] = [
                    (None if rng.random() < 0.1 else _rand_elem_doc(rng))
                    for _ in range(rng.randint(0, 3))
                ]
            if rng.random() < 0.4:
                c["tag"] = rng.choice(["t1", "t2"])
            doc["c"] = c
        docs.append(doc)
    try:
        _differential(spark, schema, docs)
    except HeterogeneousShape:
        pytest.skip("mixed shapes — dynamic-interpreter-only case")


def test_schema_plus_keysrules_on_same_element(spark) -> None:
    """A dict element carrying BOTH dict-form schema and keysrules:
    unknown-key check (from the schema rule) and key-pattern check
    (from keysrules) both fire, as in the interpreter."""
    schema = {"xs": {"type": "list", "schema": {
        "type": "dict",
        "schema": {"a": {"type": "integer"}},
        "keysrules": {"regex": "[a-z]+"},
    }}}
    docs = [
        {"xs": [{"a": 1}]},
        {"xs": [{"a": 1, "zz": 2}]},   # unknown key (name matches regex)
        {"xs": [{"a": 1, "Z9": 2}]},   # unknown key AND keysrules
    ]
    _differential(spark, schema, docs)


def test_schema_plus_kv_rules_top_level_field(spark) -> None:
    """Same combination one level up: a FIELD whose value carries
    dict-form schema + keysrules + valuesrules (struct-typed, so key
    names fold to compile-time literals)."""
    schema = {"cfg": {"type": "dict",
                      "schema": {"a": {"type": "integer"}},
                      "keysrules": {"regex": "[a-z]+"},
                      "valuesrules": {"type": "integer", "max": 10}}}
    docs = [
        {"cfg": {"a": 1}},
        {"cfg": {"a": 99}},            # valuesrules max
        {"cfg": {"a": 1, "zz": 2}},    # unknown key only
        {"cfg": {"a": 1, "Z9": 99}},   # unknown + keysrules + valuesrules
        {},                            # cfg undefined: all skip
    ]
    _differential(spark, schema, docs)
