"""Dynamic documents as MapType columns validated with a fixed
schema rule-map: per-key presence is ROW-time (map_contains_key),
unlike typed columns where presence is compile-time — the engine's
dual representation (SURVEY.md §1.3)."""

from __future__ import annotations

import pytest

from cerberus_cpp_spark.plans.engine import TableValidator


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (0, {"x": "5", "y": "abc"}),
            (1, {"x": "0", "y": "abc"}),       # x fails exclusive min
            (2, {"y": "abc"}),                 # x absent → required
            (3, {"x": "5", "y": "abc", "z": "1"}),  # unknown key
            (4, None),                         # whole map undefined
            (5, {"x": "abc", "y": "abc"}),     # x not integer-decodable
        ],
        "doc_id long, m map<string,string>",
    )


RULES = {
    "m": {"type": "dict", "schema": {
        "x": {"type": "integer", "min": 0, "required": True},
        "y": {"type": "string", "regex": "[a-z]+"},
    }},
}


def test_map_schema_violations(spark, frame) -> None:
    tv = TableValidator(RULES, extra_cols=("doc_id",))
    got = {
        (r["doc_id"], r["path"], r["message"])
        for r in tv.validate(frame).violations("doc_id").collect()
    }
    assert got == {
        (1, "^.m.x", "min-rule violated"),
        (2, "^.m.x", "required-rule violated: field missing"),
        (3, "^.m", "unknown field not permitted: z"),
        # non-decodable value fires BOTH type and min (matches the
        # interpreter twin: comparison with an undecodable operand is
        # itself a violation, reference doc/index.rst:261-268)
        (5, "^.m.x", "type-rule violated: expected integer"),
        (5, "^.m.x", "min-rule violated"),
    }


def test_map_schema_allow_unknown(spark, frame) -> None:
    tv = TableValidator(RULES, allow_unknown=True,
                        extra_cols=("doc_id",))
    got = {r["doc_id"] for r in
           tv.validate(frame).violations("doc_id").collect()}
    assert 3 not in got  # unknown key tolerated
    assert got == {1, 2, 5}
