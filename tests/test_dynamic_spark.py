"""Distributed schemaless fallback (dynamic/spark.py).

The whole reference golden corpus — INCLUDING the heterogeneous
``type-simple`` case the columnar compiler must refuse — runs through
``mapInPandas`` + the interpreter, distributed. Verdicts must equal
the corpus expectation AND the driver-side interpreter (differential:
same engine, different execution substrate)."""

from __future__ import annotations

import json
import os

import pytest
import yaml

from pyspark.sql import functions as F

from cerberus_cpp_spark.dynamic.interpreter import Validator
from cerberus_cpp_spark.dynamic.spark import (
    NOT_JSON_MSG,
    json_violations,
    validate_json,
)
from cerberus_cpp_spark.errors import SchemaError

REF_CORPUS = "/root/reference/test/testdata.yml"

if os.path.exists(REF_CORPUS):
    with open(REF_CORPUS) as f:
        CASES: dict = yaml.safe_load(f)
else:  # pragma: no cover
    CASES = {}


def _jsonable(doc) -> bool:
    try:
        json.loads(json.dumps(doc))
        return True
    except (TypeError, ValueError):
        return False


@pytest.mark.parametrize("name", sorted(CASES) or ["<missing>"])
def test_golden_distributed(name: str, spark) -> None:
    if not CASES:
        pytest.skip("reference corpus not available")
    spec = CASES[name]
    docs = [(d, True) for d in spec.get("success") or []] + [
        (d, False) for d in spec.get("failure") or []
    ]
    docs = [(d, exp) for d, exp in docs if _jsonable(d)]
    if not docs:
        pytest.skip("no JSON-representable documents")
    flags = dict(
        allow_unknown=bool(spec.get("allow_unknown", False)),
        purge_unknown=bool(spec.get("purge_unknown", False)),
        require_all=bool(spec.get("require_all", False)),
    )
    registry = spec.get("registry")

    # driver-side interpreter verdicts (the reference twin)
    iv = Validator(spec["schema"], **flags)
    for rname, rschema in (registry or {}).items():
        iv.register_schema(rname, rschema)
    interp = [iv.validate(d) for d, _ in docs]

    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, (d, _) in enumerate(docs)],
        "doc_id int, doc string",
    ).repartition(4)
    ann = validate_json(df, spec["schema"], registry=registry, **flags)
    got = {r["doc_id"]: r for r in ann.collect()}
    for i, (d, expected) in enumerate(docs):
        r = got[i]
        assert r["valid"] == expected, (
            f"{name} doc {i}: expected {expected}, got {r['valid']};"
            f" violations={r['violations']}"
        )
        assert r["valid"] == interp[i], f"{name} doc {i}: engines differ"
        assert r["n_violations"] == len(r["violations"])


def test_type_simple_is_distributed_now(spark) -> None:
    """The one capability gap from round 1: a field that is a dict in
    one row and a scalar in the next (reference rules.hh:549-553,
    golden 'type-simple') validates through a DISTRIBUTED path."""
    docs = [
        (0, '{"simple": 42}', False),        # int where dict expected
        (1, '{"simple": {"x": 1}}', True),   # actual dict
        (2, '{"simple": [1, 2]}', False),    # list
        (3, '{"simple": "s"}', False),       # string
    ]
    df = spark.createDataFrame(docs, "doc_id int, doc string, exp boolean") \
        .repartition(3)
    ann = validate_json(
        df, {"simple": {"type": "dict"}}, id_cols=("doc_id", "exp"),
        allow_unknown=True,
    )
    for r in ann.collect():
        assert r["valid"] == r["exp"], (r["doc_id"], r["violations"])


def test_invalid_json_and_non_mapping(spark) -> None:
    df = spark.createDataFrame(
        [(0, "{not json"), (1, "[1,2,3]"), (2, None), (3, '{"a": 1}')],
        "doc_id int, doc string",
    )
    got = {r["doc_id"]: r for r in
           validate_json(df, {"a": {"type": "integer"}}).collect()}
    assert got[0]["violations"] == [("^", NOT_JSON_MSG)]
    assert got[1]["violations"][0]["message"] == "document is not a mapping"
    assert got[2]["violations"][0]["message"] == "document is not a mapping"
    assert got[3]["valid"] and got[3]["violations"] == []


def test_normalized_output_and_exploded_violations(spark) -> None:
    df = spark.createDataFrame(
        [(0, '{"b": "zz"}'), (1, '{"a": 7, "b": "yy"}')],
        "doc_id int, doc string",
    )
    schema = {"a": {"type": "integer", "default": 5},
              "b": {"type": "string", "rename": "c"}}
    ann = validate_json(df, schema, include_normalized=True)
    norm = {r["doc_id"]: json.loads(r["normalized"])
            for r in ann.collect()}
    assert norm[0] == {"a": 5, "c": "zz"}    # default injected, renamed
    assert norm[1] == {"a": 7, "c": "yy"}

    vdf = json_violations(
        df, {"a": {"type": "integer", "required": True, "min": 10}}
    )
    rows = {(r["doc_id"], r["path"]): r["message"] for r in vdf.collect()}
    assert rows[(0, "^.a")] == "required-rule violated: field missing"
    assert rows[(1, "^.a")] == "min-rule violated"


def test_illformed_schema_raises_on_driver(spark) -> None:
    """Meta-validation happens BEFORE any job is launched."""
    df = spark.createDataFrame([(0, "{}")], "doc_id int, doc string")
    with pytest.raises(SchemaError):
        validate_json(df, {"a": {"type": "integer", "minlength": 2}})


def test_custom_rule_via_configure(spark) -> None:
    """configure() runs per worker Validator — custom rules reach the
    executors (reference registerRule, validator.hh:56-80)."""
    from cerberus_cpp_spark.dynamic.interpreter import Priority

    def add_odd(v) -> None:
        def odd(ctx):
            if ctx.value is not None and not isinstance(ctx.value, dict):
                if int(ctx.value) % 2 == 0:
                    ctx.raise_error("odd-rule violated")
        v.register_rule("odd", {"type": "boolean"}, odd,
                        Priority.VALIDATION)

    df = spark.createDataFrame(
        [(0, '{"n": 3}'), (1, '{"n": 4}')], "doc_id int, doc string"
    )
    ann = validate_json(df, {"n": {"odd": True}}, configure=add_odd,
                        allow_unknown=True)
    got = {r["doc_id"]: r["valid"] for r in ann.collect()}
    assert got == {0: True, 1: False}
