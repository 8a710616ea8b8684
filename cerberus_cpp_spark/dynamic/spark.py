"""Distributed schemaless validation — the dynamic fallback at scale.

The columnar compiler needs one static Spark type per field; truly
heterogeneous documents — a field that is a dict in one row and a
scalar in the next (reference ``rules.hh:549-553,592-597``, golden
case ``type-simple`` ``test/testdata.yml:505-516``) — cannot be typed
statically and previously validated only driver-side. This module
runs the SAME interpreter (:mod:`cerberus_cpp_spark.dynamic.
interpreter`) inside Arrow-batched ``mapInPandas`` over a JSON string
column, so heterogeneous documents validate distributed.

Scale design:

- The schema is meta-validated + normalized ONCE on the driver
  (``SchemaError`` raised before anything ships); workers receive the
  normalized rule tree and run with ``validate_schema=False``.
- ONE ``Validator`` per worker task, reused across every document in
  its partition (rule/type registries built once, not per row).
- The stage is a narrow projection — no shuffle, embarrassingly
  parallel over input partitions; batches arrive via Arrow.
- Per-document Python is the *fidelity contract* here, not an
  accident: there is no columnar representation of a value whose type
  varies per row, so this is the sanctioned ``mapInPandas`` escape
  hatch (the columnar engine remains the hot path for statically
  typed columns and raises ``HeterogeneousShape`` to route here).
- Output is the columnar engine's violations schema
  (``array<struct<path,message>>`` + allocation-free ``n_violations``
  + ``valid``), so ledgers, partition verdicts and windowed rollups
  compose unchanged.

JSON is the wire format (the usual shape of schemaless payload
columns); absent keys stay absent — this path is presence-exact like
``presence="defined"`` mode, with no null/undefined collapse.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.shipping import PKG_PARENT
from .interpreter import Validator

VIOL_FIELDS = T.ArrayType(T.StructType([
    T.StructField("path", T.StringType(), False),
    T.StructField("message", T.StringType(), False),
]))

#: violation emitted when the payload cannot be parsed as JSON —
#: mirrors the interpreter's top-level "document is not a mapping"
NOT_JSON_MSG = "document is not valid JSON"


def validate_json(
    df: DataFrame,
    schema: dict,
    *,
    doc_col: str = "doc",
    id_cols: tuple[str, ...] | None = None,
    allow_unknown: bool = False,
    purge_unknown: bool = False,
    require_all: bool = False,
    include_normalized: bool = False,
    registry: dict[str, dict] | None = None,
    configure: Callable[[Validator], None] | None = None,
) -> DataFrame:
    """Validate a JSON-document column with the dynamic interpreter,
    distributed via ``mapInPandas``.

    Returns ``id_cols`` (default: every column except ``doc_col``,
    original dtypes preserved) + ``violations`` + ``n_violations`` +
    ``valid`` [+ ``normalized`` JSON string when
    ``include_normalized``, with object keys sorted for deterministic
    output — the reference's ``getDocument()``].

    ``configure`` runs once per worker-side ``Validator`` (register
    custom rules/types there; it must be picklable)."""
    # driver-side meta-validation: fail fast, ship the NORMALIZED tree
    driver_v = Validator(
        allow_unknown=allow_unknown, purge_unknown=purge_unknown,
        require_all=require_all,
    )
    if configure is not None:
        configure(driver_v)
    for name, s in (registry or {}).items():
        driver_v.register_schema(name, s)
    norm_schema = driver_v.normalized_schema(schema)
    norm_registry = {
        name: driver_v.normalized_schema(s)
        for name, s in (registry or {}).items()
    }

    if id_cols is None:
        id_cols = tuple(c for c in df.columns if c != doc_col)
    src = df.select(*id_cols, doc_col)
    out_fields = [df.schema[c] for c in id_cols] + [
        T.StructField("violations", VIOL_FIELDS, False),
        T.StructField("n_violations", T.IntegerType(), False),
        T.StructField("valid", T.BooleanType(), False),
    ]
    if include_normalized:
        out_fields.append(
            T.StructField("normalized", T.StringType(), True)
        )
    out_schema = T.StructType(out_fields)
    pkg_parent = PKG_PARENT
    id_list = list(id_cols)

    def run(batches):
        import sys

        if pkg_parent not in sys.path:
            sys.path.insert(0, pkg_parent)
        import json

        import pandas as pd

        from cerberus_cpp_spark.dynamic.interpreter import Validator

        v = Validator(
            norm_schema,
            allow_unknown=allow_unknown,
            purge_unknown=purge_unknown,
            require_all=require_all,
            validate_schema=False,  # pre-normalized on the driver
        )
        if configure is not None:
            configure(v)
        for name, s in norm_registry.items():
            v.register_schema(name, s)

        for pdf in batches:
            viols, counts, valids, norms = [], [], [], []
            for raw in pdf[doc_col]:
                if raw is None:
                    doc, parse_ok = None, True
                else:
                    try:
                        doc = json.loads(raw)
                        parse_ok = True
                    except (ValueError, TypeError):
                        doc, parse_ok = None, False
                if not parse_ok:
                    errs = [("^", NOT_JSON_MSG)]
                    norm_doc = None
                else:
                    v.validate(doc)
                    errs = [(e.path, e.message) for e in v.errors]
                    norm_doc = v.get_document()
                viols.append(errs)
                counts.append(len(errs))
                valids.append(not errs)
                if include_normalized:
                    norms.append(
                        json.dumps(norm_doc, sort_keys=True,
                                   separators=(",", ":"))
                        if parse_ok else None
                    )
            data = {c: pdf[c] for c in id_list}
            data["violations"] = viols
            data["n_violations"] = counts
            data["valid"] = valids
            if include_normalized:
                data["normalized"] = norms
            yield pd.DataFrame(data)

    return src.mapInPandas(run, schema=out_schema)


def json_violations(
    df: DataFrame,
    schema: dict,
    *,
    doc_col: str = "doc",
    id_cols: tuple[str, ...] | None = None,
    **kw,
) -> DataFrame:
    """Exploded ``(id…, path, message)`` rows — the distributed
    analogue of the reference's error list for schemaless payloads
    (same output shape as ``TableValidationResult.violations``)."""
    if id_cols is None:
        id_cols = tuple(c for c in df.columns if c != doc_col)
    ann = validate_json(df, schema, doc_col=doc_col,
                        id_cols=id_cols, **kw)
    v = F.explode(F.col("violations")).alias("v")
    return (
        ann.where(F.col("n_violations") > 0)
        .select(*id_cols, v)
        .select(*id_cols, F.col("v.path").alias("path"),
                F.col("v.message").alias("message"))
    )
