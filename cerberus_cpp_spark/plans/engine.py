"""TableValidator — the public Spark-facing API of the engine.

One object owns: schema meta-validation (driver-side, via the dynamic
interpreter — reference ``validator.hh:159-175``), the columnar
compilation, and the result surfaces the reference exposes per
document re-expressed per table:

- ``validate(df)`` → :class:`TableValidationResult` with
  ``annotated`` (input + violations array + per-row verdict — the
  reference's ``validate() → bool`` per document),
  ``violations()`` (exploded ``(id…, path, message)`` rows — the
  reference's error list, ``error.hh:42-46``), ``normalized`` (the
  reference's ``getDocument()``, ``validator.hh:200-203``), and
  ``partition_verdicts()`` (per-partition pass/fail aggregation for
  the north-rule ledger).

Scale notes: the validation pass is a single narrow projection — no
shuffle, embarrassingly parallel, AQE-friendly. ``is_valid()`` uses a
LIMIT-1 probe on invalid rows so the common all-clean case never
materializes violation structs driver-side. Partition verdicts are a
single partial+final hash aggregation.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..dynamic.interpreter import Priority, Validator
from ..errors import SchemaError
from .compiler import (
    CompilerOpts,
    FieldCtx,
    FieldRef,
    ScalarViol,
    Scope,
    VIOL_ARRAY_T,
    _truthy,
    assemble_violation_count,
    assemble_violations,
    compile_field,
)

BOOKKEEPING_COLS = ("__defined__",)


def _inject_require_all(schema: dict, active: bool) -> dict:
    """require_all semantics (``validator.hh:273-275`` + scoped rule
    ``rules.hh:471-501``): while active, every field gets
    ``required: true`` injected (overriding an explicit false); a
    ``require_all`` key on a dict field toggles the flag for that
    subtree (and the carrying field itself)."""
    out: dict = {}
    for fname, rules in schema.items():
        rules = dict(rules)
        # the carrying field's own FIRST-phase toggle fires before its
        # NORMALIZATION injection, so a field with require_all: true is
        # itself required even when the outer flag is off
        local = (
            _truthy(rules["require_all"])
            if "require_all" in rules
            else active
        )
        if local:
            rules["required"] = True
        sub = rules.get("schema")
        if isinstance(sub, dict) and (
            not sub
            or (
                all(isinstance(v, dict) for v in sub.values())
                and not (set(sub) & _RULE_NAMES)
            )
        ):
            rules["schema"] = _inject_require_all(sub, local)
        out[fname] = rules
    return out


def _mark_injected_nullable(raw: dict, normalized: dict) -> dict:
    """Tag ``nullable: false`` entries the meta-schema injected (vs
    user-written) so presence='null' mode can keep them inert
    (SURVEY.md §7: the undefined/null collapse)."""
    out: dict = {}
    for fname, rules in normalized.items():
        rules = dict(rules)
        raw_rules = raw.get(fname, {}) if isinstance(raw, dict) else {}
        if "nullable" not in raw_rules and not _truthy(
            rules.get("nullable", False)
        ):
            rules["__nullable_injected__"] = True
        for key in ("schema", "keysrules", "valuesrules"):
            sub = rules.get(key)
            raw_sub = raw_rules.get(key) if isinstance(raw_rules, dict) else None
            if isinstance(sub, dict):
                if key == "schema" and sub and all(
                    isinstance(v, dict) for v in sub.values()
                ) and not (set(sub) & _RULE_NAMES):
                    rules[key] = _mark_injected_nullable(
                        raw_sub if isinstance(raw_sub, dict) else {}, sub
                    )
                else:
                    rules[key] = _mark_injected_nullable(
                        {"_": raw_sub if isinstance(raw_sub, dict) else {}},
                        {"_": sub},
                    )["_"]
        if isinstance(rules.get("items"), list):
            raw_items = raw_rules.get("items") or []
            rules["items"] = [
                _mark_injected_nullable(
                    {"_": raw_items[i] if i < len(raw_items) else {}},
                    {"_": s},
                )["_"]
                if isinstance(s, dict) else s
                for i, s in enumerate(rules["items"])
            ]
        out[fname] = rules
    return out


_RULE_NAMES = {
    "allow_unknown", "allowed", "contains", "default", "dependencies",
    "empty", "excludes", "forbidden", "items", "keysrules", "meta",
    "max", "min", "maxlength", "minlength", "nullable", "purge_unknown",
    "regex", "rename", "require_all", "required", "schema", "type",
    "valuesrules",
}


class TableValidator:
    """Validate DataFrames against a cerberus-style schema."""

    def __init__(
        self,
        schema: dict,
        *,
        allow_unknown: bool = False,
        purge_unknown: bool = False,
        require_all: bool = False,
        presence: str = "null",
        extra_cols: tuple[str, ...] = (),
        registry: dict[str, dict] | None = None,
        structural_regex: bool = False,
    ) -> None:
        self._interp = Validator(
            allow_unknown=allow_unknown,
            purge_unknown=purge_unknown,
            require_all=require_all,
        )
        for name, s in (registry or {}).items():
            self._interp.register_schema(name, s)
        self.raw_schema = copy.deepcopy(schema)
        self._require_all = require_all
        self._schema_cache: dict | None = None
        self.allow_unknown = allow_unknown
        self.purge_unknown = purge_unknown
        self.presence = presence
        self.structural_regex = structural_regex
        self.extra_cols = tuple(extra_cols)
        self._column_rules: dict[str, Callable] = {}
        self._spark_types: dict[str, Callable] = {}
        self._registry = dict(registry or {})
        self._registry_normalized: dict[str, dict] | None = None

    @classmethod
    def from_yaml(cls, source: str, **kwargs) -> "TableValidator":
        """Construct from a YAML schema — the reference's native
        format (``validator.hh:33-38``; every ``test/testdata.yml``
        case is YAML), so a cerberus-cpp user's schema file compiles
        straight to the fused Spark plan. ``source`` is YAML text or
        a ``.yml``/``.yaml`` path; keyword arguments pass through.
        A path-shaped source naming no existing file raises
        ``FileNotFoundError`` (shared helper, ``yamlschema.py``)."""
        from ..yamlschema import load_yaml_schema

        return cls(load_yaml_schema(source), **kwargs)

    @property
    def schema(self) -> dict:
        """Meta-validated + normalized schema. Validation is LAZY (on
        first use, like the reference's validate-time check,
        ``validator.hh:159-179``) so custom rules/types registered
        after construction participate in meta-validation."""
        if self._schema_cache is None:
            normalized = self._interp.normalized_schema(self.raw_schema)
            # always walk: per-field require_all keys inject into
            # their subtrees even when the global flag is off
            normalized = _inject_require_all(normalized, self._require_all)
            self._schema_cache = _mark_injected_nullable(
                self.raw_schema, normalized
            )
        return self._schema_cache

    @schema.setter
    def schema(self, value: dict) -> None:
        self._schema_cache = value

    # -- extension API (parity with registerRule/registerType,
    #    validator.hh:56-95, but compiling to Columns) ----------------
    def register_column_rule(
        self,
        name: str,
        meta_schema: dict,
        compiler: Callable[[FieldCtx, Any], list],
        interpreter_fn: Callable | None = None,
        priority: Priority = Priority.VALIDATION,
    ) -> None:
        self._column_rules[name] = compiler
        self._interp.register_rule(
            name, meta_schema, interpreter_fn or (lambda ctx: None), priority
        )
        self._schema_cache = None  # re-meta-validate with the new rule

    def register_spark_type(
        self,
        name: str,
        convertible: Callable[[Column, T.DataType], Column] | None = None,
        *,
        decode: Callable[[Column, T.DataType], Optional[Column]] | None = None,
        literal: Callable[[Any], Column] | None = None,
        py_decode: Callable[[Any], Any] | None = None,
    ) -> None:
        """Register a custom scalar type (reference ``registerType``,
        ``validator.hh:56-60``; example ``doc/examples/datetype.cc``).

        ``convertible`` feeds the ``type`` rule. ``decode``/``literal``
        supply the custom ordering (``types.hh:16-21`` equality/less)
        used by ``min``/``max``/``allowed``/``forbidden``: both decode
        to one orderable representation and Spark's native comparisons
        apply. ``py_decode`` registers the interpreter twin so
        meta-validation and the dynamic path accept the name too.
        At minimum one of ``convertible``/``decode`` is required.
        """
        from ..functions.sparktypes import SparkTypeAdapter

        if convertible is None:
            if decode is None:
                raise ValueError(
                    "register_spark_type needs convertible= or decode=")
            def convertible(col, dtype, _d=decode):  # noqa: E731
                dec = _d(col, dtype)
                return dec.isNotNull() if dec is not None else F.lit(False)
        self._spark_types[name] = SparkTypeAdapter(
            name, convertible, decode, literal)
        if py_decode is not None:
            from ..functions.pytypes import TypeAdapter

            self._interp.register_type(TypeAdapter(name, py_decode))
        self._schema_cache = None

    def _normalized_registry(self) -> dict[str, dict]:
        if self._registry_normalized is None:
            self._registry_normalized = {
                name: self._interp.normalized_schema(s)
                for name, s in self._registry.items()
            }
        return self._registry_normalized

    # -- compilation ---------------------------------------------------
    def _opts(self) -> CompilerOpts:
        return CompilerOpts(
            presence=self.presence,
            allow_unknown=self.allow_unknown,
            purge_unknown=self.purge_unknown,
            structural_regex=self.structural_regex,
            extra_cols=self.extra_cols,
            schema_registry=self._normalized_registry(),
            column_rules=self._column_rules,
            spark_types=self._spark_types,
        )

    def compile(self, df_schema: T.StructType) -> "CompiledPlan":
        opts = self._opts()
        # extra_cols are exempt from the unknown-key check only — a
        # schema rule for such a column still validates it
        exempt = set(self.extra_cols) | set(BOOKKEEPING_COLS)
        refs: dict[str, FieldRef] = {}
        for f in df_schema.fields:
            if f.name in BOOKKEEPING_COLS:
                continue
            col = F.col(f.name)
            if self.presence == "defined":
                defined = F.coalesce(
                    F.array_contains(F.col("__defined__"), f.name),
                    F.lit(False),
                )
            else:
                defined = col.isNotNull()
            refs[f.name] = FieldRef(col, f.dataType, defined)
        # schema fields absent from the DataFrame: statically undefined
        for fname in self.schema:
            if fname not in refs:
                refs[fname] = FieldRef(None, None, F.lit(False))
        scope = Scope(refs, None)

        viols: list = []
        norm_cols: list[Column] = []
        norm_names: list[str] = []
        for fname, rules in self.schema.items():
            ref = refs[fname]
            ctx = FieldCtx(
                opts, rules, ref.value, ref.dtype, ref.defined,
                f"^.{fname}", scope,
            )
            fviols, eff_value, _ = compile_field(ctx)
            viols.extend(fviols)
            out_name = str(rules.get("rename", fname))
            if eff_value is not None:
                norm_cols.append(eff_value.alias(out_name))
                norm_names.append(out_name)
        # unknown top-level columns (validator.hh:326-339)
        unknown = [
            f.name
            for f in df_schema.fields
            if f.name not in self.schema and f.name not in exempt
        ]
        # purge removes unknown keys BEFORE the allow check sees them
        # (validator.hh:326-339), so purge implies no unknown violations
        if not self.allow_unknown and not self.purge_unknown:
            for k in unknown:
                viols.append(
                    ScalarViol(
                        refs[k].defined,
                        F.when(
                            refs[k].defined,
                            F.struct(
                                F.lit("^").alias("path"),
                                F.lit(
                                    f"unknown field not permitted: {k}"
                                ).alias("message"),
                            ),
                        ),
                    )
                )
        keep_unknown = [] if self.purge_unknown else unknown
        for k in keep_unknown:
            norm_cols.append(F.col(k))
            norm_names.append(k)
        for k in self.extra_cols:
            if k in df_schema.fieldNames():
                norm_cols.insert(0, F.col(k))
                norm_names.insert(0, k)
        return CompiledPlan(
            violations=assemble_violations(viols),
            violation_count=assemble_violation_count(viols),
            normalized_cols=norm_cols,
            normalized_names=norm_names,
        )

    # -- execution -----------------------------------------------------
    def validate(self, df: DataFrame) -> "TableValidationResult":
        plan = self.compile(df.schema)
        # n_violations is the ALLOCATION-FREE integer form, not
        # size(violations): verdict/count jobs then never build the
        # struct array (Catalyst prunes the unused column), and the
        # violations() explode path filters on the cheap count before
        # materializing records (filter pushes through the projection)
        annotated = (
            df.withColumn("violations", plan.violations)
            .withColumn("n_violations", plan.violation_count)
            .withColumn("valid", F.col("n_violations") == 0)
        )
        return TableValidationResult(self, df, plan, annotated)


@dataclass
class CompiledPlan:
    violations: Column
    violation_count: Column
    normalized_cols: list[Column]
    normalized_names: list[str]


@dataclass
class TableValidationResult:
    validator: TableValidator
    source: DataFrame
    plan: CompiledPlan
    annotated: DataFrame

    def violations(self, *id_cols: str) -> DataFrame:
        """Exploded violation rows ``(id…, path, message)`` — the
        distributed analogue of the reference's error list.

        If the validated frame carries an EXPENSIVE derived column
        (``from_json``, a decode, a UDF), wrap it in
        ``functions.barrier.once_per_row`` at the source: the
        count-filter here otherwise pushes below the defining
        projection and re-evaluates the expression once per rule
        branch (measured 12× / 2.8× slower on a JSON-parsed map —
        BENCH.md §14)."""
        ids = [F.col(c) for c in id_cols]
        v = F.explode(F.col("violations")).alias("v")
        return (
            self.annotated.where(F.col("n_violations") > 0)
            .select(*ids, v)
            .select(*id_cols, F.col("v.path").alias("path"),
                    F.col("v.message").alias("message"))
        )

    @property
    def normalized(self) -> DataFrame:
        """The normalized table (defaults injected, renames applied,
        unknown columns purged) — reference ``getDocument()``."""
        return self.source.select(*self.plan.normalized_cols)

    def is_valid(self) -> bool:
        """True iff NO row has violations. LIMIT-1 anti-probe: cheap
        on the clean path, early-exits on the dirty path."""
        return (
            self.annotated.where(~F.col("valid")).limit(1).count() == 0
        )

    def counts(self) -> dict[str, int]:
        row = self.annotated.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("n_violations")).alias("violations"),
            F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"),
        ).collect()[0]
        return {
            "rows": row["rows"],
            "violations": int(row["violations"] or 0),
            "invalid_rows": int(row["invalid_rows"] or 0),
        }

    def partition_verdicts(self, *partition_cols: str) -> DataFrame:
        """Per-partition pass/fail + metrics (north-rule ledger unit):
        one partial+final hash agg, no row data movement beyond the
        tiny aggregate."""
        return self.annotated.groupBy(*partition_cols).agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_violations").alias("violations"),
            F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"),
            (F.sum("n_violations") == 0).alias("passed"),
        )

    def quarantine(self) -> tuple[DataFrame, DataFrame]:
        """Production split: ``(clean, quarantined)``.

        ``clean`` = the NORMALIZED projection (defaults injected,
        renames applied, unknowns purged — reference
        ``getDocument()``) of rows with zero violations — the frame a
        pipeline writes onward. ``quarantined`` = the ORIGINAL rows
        of every failing record plus their ``violations`` array and
        ``n_violations`` — the repair/inspection input.

        Both branches filter the same single compiled pass; writing
        both sinks re-runs the narrow plan once per sink (persist
        ``.annotated`` first if the input scan is the dominant cost
        and memory allows — usually recompute wins, BENCH.md §11)."""
        clean = self.annotated.where(F.col("valid")).select(
            *self.plan.normalized_cols)
        src_cols = [F.col(c) for c in self.source.columns]
        quarantined = self.annotated.where(~F.col("valid")).select(
            *src_cols, F.col("violations"), F.col("n_violations"))
        return clean, quarantined
