"""Columnar extension API — parity with the reference's examples
(``doc/examples/oddrule.cc``, ``datetype.cc``) at the Spark level:
custom rules compile to Columns (or pandas UDFs), custom types plug
convertibility predicates into the ``type`` rule. Meta-validation is
lazy (reference validates at validate() time, ``validator.hh:159``),
so registration after construction is the supported flow."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cerberus_cpp_spark.errors import SchemaError
from cerberus_cpp_spark.plans.compiler import _viol
from cerberus_cpp_spark.plans.engine import TableValidator


def test_custom_column_rule_odd(spark) -> None:
    """oddrule.cc: `odd: true` accepts only odd integers."""

    def compile_odd(ctx, arg):
        if not arg:
            return []
        cond = ctx.defined & (F.pmod(ctx.value, F.lit(2)) == 0)
        return [_viol(cond, F.lit(ctx.path), "odd-rule violated")]

    tv = TableValidator({"n": {"type": "integer", "odd": True}})
    tv.register_column_rule("odd", {"type": "boolean"}, compile_odd)
    df = spark.createDataFrame([(1,), (2,), (7,), (10,)], ["n"])
    res = tv.validate(df)
    bad = {r["n"] for r in res.annotated.where("NOT valid").collect()}
    assert bad == {2, 10}
    v = res.violations("n").collect()
    assert all(r["message"] == "odd-rule violated" for r in v)


def test_unregistered_custom_rule_still_raises(spark) -> None:
    tv = TableValidator({"n": {"type": "integer", "odd": True}})
    df = spark.createDataFrame([(1,)], ["n"])
    with pytest.raises(SchemaError):
        tv.validate(df)


def test_custom_rule_via_pandas_udf(spark) -> None:
    """Escape hatch: a rule backed by an Arrow-batched pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    # NB: functional form — `from __future__ import annotations`
    # stringifies hints, which breaks pandas_udf signature inference
    is_palindrome = pandas_udf(
        lambda s: s.map(lambda x: x is not None and x == x[::-1]),
        "boolean",
    )

    def compile_pal(ctx, arg):
        if not arg:
            return []
        cond = ctx.defined & ~is_palindrome(ctx.value)
        return [_viol(cond, F.lit(ctx.path), "palindrome-rule violated")]

    tv = TableValidator({"w": {"type": "string", "palindrome": True}})
    tv.register_column_rule("palindrome", {"type": "boolean"},
                            compile_pal)
    df = spark.createDataFrame(
        [("anna",), ("otto",), ("spark",)], ["w"]
    )
    res = tv.validate(df)
    bad = {r["w"] for r in res.annotated.where("NOT valid").collect()}
    assert bad == {"spark"}


def test_custom_spark_type_date(spark) -> None:
    """datetype.cc: a custom `date` type usable in `type:` — the
    convertibility predicate is a Column factory; the interpreter
    twin gets a TypeAdapter so meta-validation accepts the name."""
    import datetime

    from cerberus_cpp_spark.functions.pytypes import TypeAdapter

    tv = TableValidator({"d": {"type": "date"}})
    tv.register_spark_type(
        "date",
        lambda col, dtype: F.try_to_timestamp(
            col, F.lit("yyyy-MM-dd")
        ).isNotNull(),
    )

    def decode_date(text):
        try:
            return datetime.date.fromisoformat(text)
        except ValueError:
            return None

    tv._interp.register_type(TypeAdapter("date", decode_date))
    df = spark.createDataFrame(
        [("2021-06-21",), ("not-a-date",), (None,)], ["d"]
    )
    res = tv.validate(df)
    bad = {r["d"] for r in res.annotated.where("NOT valid").collect()}
    # NULL passes: type is skipped for null/undefined (rules.hh:587)
    assert bad == {"not-a-date"}
