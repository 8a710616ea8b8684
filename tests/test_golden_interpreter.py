"""Golden-port suite: every reference test case, via the dynamic path.

Mirrors the reference harness ``test/testcerberus.cc:15-44``: for each
named case in ``test/testdata.yml`` wire the policy flags + registry,
then assert the boolean verdict for every success/failure document.
The corpus is loaded directly from the read-only reference checkout
(not copied); if it is absent the suite falls back to skipping with an
explicit reason so the rest of the tests stand alone.
"""

from __future__ import annotations

import os

import pytest
import yaml

from cerberus_cpp_spark.dynamic.interpreter import Validator

REF_CORPUS = "/root/reference/test/testdata.yml"

if os.path.exists(REF_CORPUS):
    with open(REF_CORPUS) as f:
        CASES: dict = yaml.safe_load(f)
else:  # pragma: no cover
    CASES = {}


def _make_validator(spec: dict) -> Validator:
    v = Validator(
        allow_unknown=bool(spec.get("allow_unknown", False)),
        purge_unknown=bool(spec.get("purge_unknown", False)),
        require_all=bool(spec.get("require_all", False)),
    )
    for name, schema in (spec.get("registry") or {}).items():
        v.register_schema(name, schema)
    return v


@pytest.mark.parametrize("name", sorted(CASES) or ["<missing corpus>"])
def test_golden_case(name: str) -> None:
    if not CASES:
        pytest.skip("reference corpus not available")
    spec = CASES[name]
    v = _make_validator(spec)
    for doc in spec.get("success") or []:
        ok = v.validate(doc, spec["schema"])
        assert ok, f"{name}: expected PASS for {doc!r}, errors={v.errors}"
    for doc in spec.get("failure") or []:
        ok = v.validate(doc, spec["schema"])
        assert not ok, f"{name}: expected FAIL for {doc!r}"


def test_corpus_is_complete() -> None:
    """All 40 named reference cases must be present and exercised."""
    if not CASES:
        pytest.skip("reference corpus not available")
    assert len(CASES) == 40
