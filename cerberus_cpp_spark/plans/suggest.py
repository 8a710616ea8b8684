"""Constraint suggestion: profile a table → propose a rules dict.

The inverse direction of the engine (deequ-style "constraint
suggestion" re-expressed in the reference's rule vocabulary,
``rules.hh:640-667``): one stats pass over the table yields a
cerberus schema that the profiled data itself satisfies — the
starting point a user edits instead of writing rules from scratch.

Emitted rules per column (all deterministic for ``exact=True``):

- ``type``: Spark dtype → reference type name (integer/float/string/
  boolean/list/dict). Date/timestamp/binary columns get NO type rule —
  the reference deliberately omits those types (doc/index.rst:278-284).
- ``required: True`` + implicit ``nullable: False`` when the column
  has zero NULLs; ``nullable: True`` otherwise.
- ``min``/``max`` for numerics: observed bounds widened by 1 (the
  reference's comparisons are EXCLUSIVE — rules.hh:303-339 — so the
  observed extremes must sit strictly inside).
- ``allowed`` for low-cardinality string columns: the full sorted
  distinct set when it has ≤ ``allowed_max_distinct`` values.
- ``minlength``/``maxlength`` for array columns: observed size range.

Scale shape (100 TB): pass 1 is ONE aggregation (map-side partials)
computing null counts, min/max, array-size bounds, and an
``approx_count_distinct`` PRE-FILTER; pass 2 collects exact distinct
values ONLY for the few string columns the prefilter admits, each
bounded to ``allowed_max_distinct + 1`` rows. No full-column
collects, no per-column scans.

Self-consistency property (pinned in tests):
``TableValidator(suggest_rules(df)).validate(df).is_valid()`` is
always True — a suggestion that flags the data it was derived from
would be useless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_NAMES: list[tuple[type, str]] = [
    (T.BooleanType, "boolean"),
    (T.ByteType, "integer"),
    (T.ShortType, "integer"),
    (T.IntegerType, "integer"),
    (T.LongType, "integer"),
    (T.FloatType, "float"),
    (T.DoubleType, "float"),
    (T.DecimalType, "float"),
    (T.StringType, "string"),
    (T.ArrayType, "list"),
    (T.MapType, "dict"),
    (T.StructType, "dict"),
]


def _type_name(dtype: T.DataType) -> str | None:
    for cls, name in _TYPE_NAMES:
        if isinstance(dtype, cls):
            return name
    return None  # date/timestamp/binary/...: reference omits them


def suggest_rules(
    df: DataFrame,
    *,
    allowed_max_distinct: int = 16,
    cols: list[str] | None = None,
) -> dict:
    """Propose a rules dict the profiled ``df`` satisfies. See module
    docstring for the emitted vocabulary and the two-pass shape."""
    fields = [f for f in df.schema.fields
              if cols is None or f.name in cols]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c = F.col(f.name)
        aggs.append(
            F.coalesce(F.sum(c.isNull().cast("long")), F.lit(0))
            .alias(f"__null_{f.name}"))
        if isinstance(f.dataType, (T.ByteType, T.ShortType,
                                   T.IntegerType, T.LongType,
                                   T.FloatType, T.DoubleType,
                                   T.DecimalType)):
            aggs.append(F.min(c).alias(f"__min_{f.name}"))
            aggs.append(F.max(c).alias(f"__max_{f.name}"))
        elif isinstance(f.dataType, T.StringType):
            # cheap prefilter only — the definitive allowed-set
            # decision is pass 2's exact, bounded distinct
            aggs.append(F.approx_count_distinct(c, 0.05)
                        .alias(f"__adist_{f.name}"))
        elif isinstance(f.dataType, T.ArrayType):
            aggs.append(F.min(F.size(c)).alias(f"__minsz_{f.name}"))
            aggs.append(F.max(F.size(c)).alias(f"__maxsz_{f.name}"))
    stats = df.agg(*aggs).collect()[0]

    rules: dict = {}
    for f in fields:
        r: dict = {}
        tname = _type_name(f.dataType)
        if tname is not None:
            r["type"] = tname
        if stats[f"__null_{f.name}"] == 0:
            r["required"] = True
        else:
            r["nullable"] = True
        if f"__min_{f.name}" in stats.asDict():
            lo, hi = stats[f"__min_{f.name}"], stats[f"__max_{f.name}"]
            if lo is not None:
                if tname == "integer":
                    r["min"], r["max"] = int(lo) - 1, int(hi) + 1
                else:
                    # floor()±1 keeps the bounds exact doubles (no
                    # float-repr drift between engines)
                    import math

                    r["min"] = float(math.floor(lo)) - 1.0
                    r["max"] = float(math.floor(hi)) + 1.0
        if f"__minsz_{f.name}" in stats.asDict():
            if stats[f"__minsz_{f.name}"] is not None:
                r["minlength"] = int(stats[f"__minsz_{f.name}"])
                r["maxlength"] = int(stats[f"__maxsz_{f.name}"])
        if (f"__adist_{f.name}" in stats.asDict()
                and stats[f"__adist_{f.name}"]
                <= allowed_max_distinct * 2):
            # pass 2: exact distinct, bounded collect; <= threshold
            # rows back means we hold the COMPLETE distinct set
            vals = [
                row[f.name]
                for row in df.select(f.name).where(
                    F.col(f.name).isNotNull()).distinct()
                .limit(allowed_max_distinct + 1).collect()
            ]
            # an all-NULL column would yield allowed=[] — a rule that
            # rejects every future value; suggest nothing instead
            if 0 < len(vals) <= allowed_max_distinct:
                r["allowed"] = sorted(vals)
        if r:
            rules[f.name] = r
    return rules


def rules_as_rows(rules: dict) -> list[tuple[str, str, str]]:
    """Flatten a suggestion into sorted (col_name, rule, value)
    triples — the driver-contract / oracle-comparable projection.
    Values render deterministically: lists join with '|', floats use
    repr (they are integral by construction), bools lowercase."""
    out = []
    for col, r in rules.items():
        for rule, v in r.items():
            if isinstance(v, list):
                sval = "|".join(str(x) for x in v)
            elif isinstance(v, bool):
                sval = "true" if v else "false"
            elif isinstance(v, float):
                sval = repr(v)
            else:
                sval = str(v)
            out.append((col, rule, sval))
    return sorted(out)
