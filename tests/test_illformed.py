"""Ill-formed schemas must raise SchemaError during meta-validation.

Reference: ``test/testcerberus.cc:46-55`` over
``test/illformedschemas.yml`` (unknown rule name, map-valued
``contains``, length rules on scalar-typed fields).
"""

from __future__ import annotations

import os

import pytest
import yaml

from cerberus_cpp_spark.dynamic.interpreter import Validator
from cerberus_cpp_spark.errors import SchemaError

REF = "/root/reference/test/illformedschemas.yml"

if os.path.exists(REF):
    with open(REF) as f:
        CASES: dict = yaml.safe_load(f)
else:  # pragma: no cover
    CASES = {}


@pytest.mark.parametrize("name", sorted(CASES) or ["<missing>"])
def test_illformed_schema_raises(name: str) -> None:
    if not CASES:
        pytest.skip("reference corpus not available")
    v = Validator()
    with pytest.raises(SchemaError):
        v.validate({}, CASES[name])


def test_unknown_rule_raises() -> None:
    with pytest.raises(SchemaError):
        Validator().validate({}, {"f": {"type": "integer", "bogus": 1}})


def test_minlength_on_scalar_raises() -> None:
    with pytest.raises(SchemaError):
        Validator().validate({}, {"f": {"type": "integer", "minlength": 2}})


def test_contains_map_arg_raises() -> None:
    with pytest.raises(SchemaError):
        Validator().validate(
            {}, {"f": {"type": "list", "contains": {"foo": 42}}}
        )


def test_nested_illformed_schema_raises() -> None:
    """Stricter than the reference (which skips nested meta-validation,
    an unpinned gap — SURVEY.md §5): nested rule-maps are checked too."""
    with pytest.raises(SchemaError):
        Validator().validate(
            {},
            {
                "f": {
                    "type": "dict",
                    "schema": {"g": {"type": "string", "bogus": True}},
                }
            },
        )
