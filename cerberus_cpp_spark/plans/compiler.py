"""Schema → fused Column-expression compiler: the engine's scale path.

Where the reference interprets rules per document node with a map
lookup per rule (``validator.hh:279``), we compile the WHOLE schema
once into a single projection: every rule of every field folds into
one ``violations: array<struct<path,message>>`` expression evaluated
in one narrow, shuffle-free pass (Catalyst folds constants, prunes
unread columns, and runs the whole thing inside whole-stage codegen).
N rules never means N scans — SURVEY.md §4.2's "key design move".

Presence semantics (SURVEY.md §7 "undefined vs null collapse"):

- ``presence="null"`` (production tables): SQL NULL plays the
  reference's "undefined". ``required`` fires on NULL, skip-rules
  (min/max/type/allowed/regex) skip NULL, and the auto-injected
  ``nullable: false`` is inert (only an *explicit* ``nullable: false``
  fires) — otherwise every optional column would reject NULL.
- ``presence="defined"`` (full fidelity): a companion
  ``__defined__: array<string>`` column (and sibling struct fields for
  nested dicts) preserves the reference's three-state semantics
  exactly — absent vs explicit-null vs value — including reference
  oddities like min failing on null while max passes
  (``rules.hh:316-336``).

Element-wise rules inside arrays/maps compile to ``F.transform`` with
the index, so per-element violation paths keep the reference's
``^.field[i]`` grammar (``stack.hh:39-54``) without a posexplode.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import reduce
from typing import Any, Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import SchemaError
from ..functions.pytypes import _scalar_text, builtin_types
from ..functions.sparktypes import (
    convertible_expr,
    decode_expr,
    decode_with,
    literal_with,
)

VIOL_ARRAY_T = "array<struct<path:string,message:string>>"

_BUILTIN_TYPE_NAMES = frozenset(builtin_types())


class CompileError(SchemaError):
    """A rule/shape combination the columnar compiler cannot express;
    the dynamic interpreter path still handles it."""


def _as_list(v: Any) -> list:
    if isinstance(v, list):
        return list(v)
    if v is None:
        return []
    return [v]


def _truthy(arg: Any) -> bool:
    if isinstance(arg, bool):
        return arg
    if isinstance(arg, str):
        return arg in ("true", "True", "TRUE", "yes", "on")
    return bool(arg)


class ScalarViol:
    """One rule violation: the raw boolean condition AND the
    struct<path,message>-when-cond column. Keeping the condition
    separate lets the engine compile ``n_violations`` as a pure
    integer sum — zero per-row allocations on the verdict/count path
    (the 100TB hot path); the struct array is only evaluated by the
    violation-explode path, which Catalyst filter-pushdown restricts
    to violating rows."""

    __slots__ = ("cond", "struct")

    def __init__(self, cond: Column, struct: Column):
        self.cond = cond
        self.struct = struct


def _viol(cond: Column, path: Column, message) -> ScalarViol:
    """struct<path,message> when cond else NULL (filtered later)."""
    msg = message if isinstance(message, Column) else F.lit(message)
    return ScalarViol(
        cond,
        F.when(cond, F.struct(path.alias("path"), msg.alias("message"))),
    )


class ArrayViol:
    """Marker wrapper: a Column of array<struct<path,message>> (one
    entry per element) as opposed to a scalar struct-or-null viol."""

    __slots__ = ("col",)

    def __init__(self, col: Column):
        self.col = col


@dataclass
class FieldRef:
    """A resolvable document field: value expr + dtype + definedness."""

    value: Optional[Column]
    dtype: Optional[T.DataType]
    defined: Column


class Scope:
    """One mapping level — resolution context for the ``dependencies``
    / ``excludes`` path language (``stack.hh:146-172``): non-anchored
    paths resolve against the enclosing mapping, ``^`` against the
    document root, dotted segments descend."""

    def __init__(self, fields: dict[str, FieldRef], root: "Scope | None"):
        self.fields = fields
        self.root = root if root is not None else self


@dataclass
class CompilerOpts:
    presence: str = "null"  # "null" | "defined"
    allow_unknown: bool = False
    purge_unknown: bool = False
    # opt-in regex-free structural predicate for eligible patterns
    # (see _regex_fast_path): 2x faster STANDALONE (single-rule scan
    # jobs), but measured ~15% SLOWER inside the fused wide projection
    # (translate's per-row allocation at 32 threads vs anchored
    # rlike) — hence default False; BENCH.md §6 has the A/B numbers
    structural_regex: bool = False
    extra_cols: tuple[str, ...] = ()
    # engine-supplied registries
    schema_registry: dict = dc_field(default_factory=dict)
    column_rules: dict = dc_field(default_factory=dict)
    spark_types: dict = dc_field(default_factory=dict)


@dataclass
class FieldCtx:
    opts: CompilerOpts
    rules: dict
    value: Optional[Column]
    dtype: Optional[T.DataType]
    defined: Column
    path: str
    scope: Scope
    # True when this ctx is a list ELEMENT (items rule): null is then
    # unambiguously explicit (definedness comes from the list length,
    # not isNotNull), so injected nullable:false fires in every
    # presence mode and explicit nullable gates on definedness.
    elem: bool = False

    def declared_type(self) -> str:
        t = self.rules.get("type", "string")
        return str(t[0]) if isinstance(t, list) and t else str(t)

    def decoded(self, target: str | None = None) -> Optional[Column]:
        if self.value is None or self.dtype is None:
            return None
        return decode_with(self.opts.spark_types, self.value, self.dtype,
                           target or self.declared_type())

    def literal(self, value) -> Column:
        return literal_with(self.opts.spark_types, value,
                            self.declared_type())

    def path_lit(self) -> Column:
        return F.lit(self.path)


def _child_ref(parent: FieldRef, name: str, opts: CompilerOpts) -> Optional[FieldRef]:
    """Descend one mapping level below a struct/map-typed field."""
    if parent.value is None or parent.dtype is None:
        return None
    if isinstance(parent.dtype, T.StructType):
        names = parent.dtype.fieldNames()
        if name not in names:
            return None
        v = parent.value[name]
        dt = parent.dtype[name].dataType
        if opts.presence == "defined" and "__defined__" in names:
            defined = parent.defined & F.coalesce(
                F.array_contains(parent.value["__defined__"], name),
                F.lit(False),
            )
        else:
            defined = parent.defined & v.isNotNull()
        return FieldRef(v, dt, defined)
    if isinstance(parent.dtype, T.MapType):
        v = F.try_element_at(parent.value, F.lit(name))
        defined = parent.defined & F.coalesce(
            F.map_contains_key(parent.value, F.lit(name)), F.lit(False)
        )
        return FieldRef(v, parent.dtype.valueType, defined)
    return None


import re as _re

_PATH_TOKEN = _re.compile(r"([^.\[\]]+)|\[(\d+)\]")

# regex-rule structural fast path (OPT-IN via
# CompilerOpts.structural_regex): full-match patterns of the EXACT
# shape <literal prefix>[0-9]{n} (prefix limited to characters that
# are literals in both regex and the emitted predicates; notably no
# '.', no LIKE metacharacters). Eligible patterns compile to
# startswith + two length checks over translate() instead of rlike.
# Measured (BENCH.md §6): 2.0x faster STANDALONE (8.9M vs 4.4M
# rows/s, single-expression scan), but ~15% SLOWER inside the fused
# 25-rule flagship projection (interleaved A/B best-of-3: 10.8s vs
# 9.05s at 120M rows) — translate's per-row allocation hurts at 32
# codegen threads where anchored rlike allocates nothing. Use it for
# sparse single-rule filter jobs; the fused default stays rlike.
_STRUCT_REGEX = _re.compile(
    r"^(?P<prefix>[A-Za-z0-9\- :#/@]*)\[0-9\]\{(?P<n>\d+)\}$")
_DIGITS = "0123456789"


def _regex_fast_path(sdec: Column, pattern_body: str) -> Optional[Column]:
    """Regex-free equivalent of ``^<prefix>[0-9]{n}$`` or None.

    Equivalence: startswith(prefix) pins the first |prefix| chars;
    length = |prefix| + n pins the total; non-digit-count(s) ==
    non-digit-count(prefix) then forces the remaining n characters to
    be digits (translate strips digits; comparing LENGTHS avoids the
    order-ambiguity of comparing the stripped string itself — e.g.
    'i1mg-…' strips to 'img-' but has 5 non-digits, so it still
    fails). NULL propagates through every branch exactly like rlike.
    """
    m = _STRUCT_REGEX.match(str(pattern_body))
    if not m:
        return None
    prefix, n = m.group("prefix"), int(m.group("n"))
    if n < 1:
        return None
    nondigit = sum(1 for c in prefix if not c.isdigit())
    cond = (F.length(sdec) == (len(prefix) + n)) & (
        F.length(F.translate(sdec, _DIGITS, "")) == nondigit)
    if prefix:
        cond = cond & sdec.startswith(prefix)
    return cond


def _resolve(scope: Scope, path_str: str, opts: CompilerOpts) -> Optional[FieldRef]:
    text = str(path_str)
    start = scope
    if text.startswith("^"):
        start = scope.root
        text = text[1:].lstrip(".")
    ref: Optional[FieldRef] = None
    for m in _PATH_TOKEN.finditer(text):
        key, idx = m.group(1), m.group(2)
        if idx is not None:
            # `[i]` list index (stack.hh:146-172): descend into an
            # array element; out-of-range → undefined, mirroring the
            # dynamic interpreter's lookup_path.
            if (ref is None or ref.value is None
                    or not isinstance(ref.dtype, T.ArrayType)):
                return None
            i = int(idx)
            ref = FieldRef(
                F.try_element_at(ref.value, F.lit(i + 1)),
                ref.dtype.elementType,
                ref.defined
                & (F.coalesce(F.size(ref.value), F.lit(0)) > i),
            )
            continue
        if ref is None:
            ref = start.fields.get(key)
            if ref is None:
                return None
        else:
            ref = _child_ref(ref, key, opts)
            if ref is None:
                return None
    return ref


# ---------------------------------------------------------------------------
# Element-wise scalar rule conditions (used inside F.transform lambdas
# for schema-list / items / keysrules / valuesrules).
# ---------------------------------------------------------------------------

_ELEMENT_SAFE = {
    "type", "allowed", "forbidden", "min", "max", "regex", "nullable",
    "meta", "required", "empty", "minlength", "maxlength",
}


def _scalar_conds(
    rules: dict, x: Column, dtype: T.DataType, opts: CompilerOpts
) -> list[tuple[Column, str]]:
    """(violation-condition, message) pairs for the scalar rule subset,
    evaluated on an element value ``x`` (elements are always
    'defined'; explicit null elements follow reference semantics)."""
    unsupported = {
        k for k in rules
        if k not in _ELEMENT_SAFE and not k.startswith("__")
        and k not in ("schema", "items", "keysrules", "valuesrules",
                      "default", "rename", "contains", "dependencies",
                      "excludes", "allow_unknown", "purge_unknown",
                      "require_all")
    }
    t = rules.get("type", "string")
    tname = str(t[0]) if isinstance(t, list) and t else str(t)
    out: list[tuple[Column, str]] = []
    for name, arg in rules.items():
        if name == "type":
            names = [str(n) for n in _as_list(arg)]
            if isinstance(dtype, T.ArrayType):
                ok = "list" in names
                if not ok:
                    out.append((x.isNotNull(),
                                "type-rule violated: expected " + "/".join(names)))
                continue
            if isinstance(dtype, (T.MapType, T.StructType)):
                ok = "dict" in names
                if not ok:
                    out.append((x.isNotNull(),
                                "type-rule violated: expected " + "/".join(names)))
                continue
            preds = [
                opts.spark_types[n].convertible(x, dtype)
                if n in opts.spark_types
                else convertible_expr(x, dtype, n)
                for n in names
                if n in _BUILTIN_TYPE_NAMES or n in opts.spark_types
            ]
            if preds:
                ok_expr = reduce(lambda a, b: a | b, preds)
                out.append((x.isNotNull() & ~ok_expr,
                            "type-rule violated: expected " + "/".join(names)))
            else:
                out.append((x.isNotNull(),
                            "type-rule violated: expected " + "/".join(names)))
        elif name == "allowed":
            dec = decode_with(opts.spark_types, x, dtype, tname)
            if dec is None:
                out.append((x.isNotNull(), "value disallowed by allowed-rule"))
            else:
                lits = [literal_with(opts.spark_types, v, tname)
                        for v in _as_list(arg)]
                out.append((
                    x.isNotNull()
                    & ~F.coalesce(dec.isin(*lits), F.lit(False)),
                    "value disallowed by allowed-rule",
                ))
        elif name == "forbidden":
            dec = decode_with(opts.spark_types, x, dtype, tname)
            if dec is not None:
                for cand in _as_list(arg):
                    out.append((
                        x.isNotNull()
                        & F.coalesce(
                            dec.eqNullSafe(
                                literal_with(opts.spark_types, cand, tname)),
                            F.lit(False),
                        ),
                        f"forbidden-rule violated: {cand}",
                    ))
        elif name == "min":
            dec = decode_with(opts.spark_types, x, dtype, tname)
            cond = (
                ~F.coalesce(dec > literal_with(opts.spark_types, arg, tname),
                            F.lit(False))
                if dec is not None else F.lit(True)
            )
            out.append((cond, "min-rule violated"))
        elif name == "max":
            dec = decode_with(opts.spark_types, x, dtype, tname)
            if dec is not None:
                out.append((
                    F.coalesce(
                        dec >= literal_with(opts.spark_types, arg, tname),
                        F.lit(False)),
                    "max-rule violated",
                ))
        elif name == "regex":
            sdec = decode_expr(x, dtype, "string")
            # std::regex_match is a FULL match. \A..\z, not ^..$:
            # Java's $ matches BEFORE a final line terminator, so
            # "img-123\n" would pass ^-$ anchoring but fails
            # re.fullmatch / std::regex_match (ADVICE r3).
            pattern = f"\\A(?:{arg})\\z"
            if sdec is None:
                out.append((x.isNotNull(), "regex-rule violated"))
            else:
                out.append((
                    x.isNotNull()
                    & ~F.coalesce(sdec.rlike(pattern), F.lit(False)),
                    "regex-rule violated",
                ))
        elif name == "nullable":
            # elements/map-values are unambiguously explicit nulls (no
            # absent-key ambiguity), so the auto-injected nullable:false
            # (rules.hh:393-397) fires here in EVERY presence mode —
            # matching the interpreter's per-element validateItem.
            if not _truthy(arg):
                out.append((x.isNull(), "nullable-rule violated"))
        elif name in ("meta", "required"):
            continue  # elements are always defined
        elif name in ("empty", "minlength", "maxlength"):
            if isinstance(dtype, (T.ArrayType, T.MapType)):
                count = F.coalesce(F.size(x), F.lit(0))
                if name == "empty" and not _truthy(arg):
                    out.append((x.isNotNull() & (count == 0),
                                "empty-rule violated for sequence"))
                elif name == "minlength":
                    out.append((count < F.lit(int(arg)), "minlength-rule violated"))
                elif name == "maxlength":
                    out.append((count > F.lit(int(arg)), "maxlength-rule violated"))
        elif name.startswith("__"):
            continue
        else:
            raise CompileError(
                f"rule {name!r} not supported on array/map elements by the"
                " columnar compiler (use the dynamic interpreter path)"
            )
    if unsupported:
        raise CompileError(
            f"rules {sorted(unsupported)} not compilable on elements"
        )
    return out


# ---------------------------------------------------------------------------
# Field-level compilation
# ---------------------------------------------------------------------------


def _count_expr(ctx: FieldCtx) -> Column:
    """Item count of a list/dict value (reference iterates the node —
    scalars and undefined count 0, ``rules.hh:355-359``)."""
    if ctx.value is None or ctx.dtype is None:
        return F.lit(0)
    if isinstance(ctx.dtype, (T.ArrayType, T.MapType)):
        return F.coalesce(F.size(ctx.value), F.lit(0))
    if isinstance(ctx.dtype, T.StructType):
        names = ctx.dtype.fieldNames()
        if ctx.opts.presence == "defined" and "__defined__" in names:
            return F.coalesce(F.size(ctx.value["__defined__"]), F.lit(0))
        counts = [
            F.when(ctx.value[n].isNotNull(), 1).otherwise(0)
            for n in names if n != "__defined__"
        ]
        base = reduce(lambda a, b: a + b, counts) if counts else F.lit(0)
        return F.when(ctx.value.isNotNull(), base).otherwise(F.lit(0))
    return F.lit(0)


def _elem_path(prefix: str) -> Callable[[Column], Column]:
    return lambda i: F.concat(
        F.lit(prefix + "["), i.cast("string"), F.lit("]")
    )


def _array_rule_viols(
    ctx: FieldCtx, elem_rules: dict
) -> list[Column]:
    """schema(list form): each emitter is ``fn(x, base_path) →
    array<struct<path,message>>`` (null entries allowed) evaluated per
    element inside one F.transform, then flattened. Scalar rules emit
    one-entry arrays; nested dict-form ``schema`` over struct/map
    elements (map-in-list-in-struct) emits suffixed-path entries,
    keysrules/valuesrules emit one entry per offending key."""
    assert isinstance(ctx.dtype, T.ArrayType)
    elem_dt = ctx.dtype.elementType
    path_of = _elem_path(ctx.path)
    empty = F.array().cast(VIOL_ARRAY_T)
    out: list[Column] = []

    def make(emitter):
        def fn(x, i):
            return F.coalesce(emitter(x, path_of(i)), empty)
        return fn

    for emitter in _elem_emitters(elem_rules, elem_dt, ctx.opts):
        arr = F.flatten(F.transform(ctx.value, make(emitter)))
        out.append(ArrayViol(F.coalesce(arr, empty)))
    return out


def _one(cond: Column, path: Column, msg: Column) -> Column:
    """One-entry violation array (entry null when passing)."""
    return F.array(F.when(cond, F.struct(path.alias("path"),
                                         msg.alias("message"))))


def _elem_emitters(
    elem_rules: dict, dtype: T.DataType, opts: CompilerOpts
) -> list[Callable[[Column, Column], Column]]:
    """Violation emitters ``fn(x, base) → array<viol>`` for one array
    element ``x`` whose own path is the Column ``base``: the scalar
    rule subset plus dict-form nested ``schema`` /
    keysrules/valuesrules when elements are structs/maps."""
    mapping_rules = ("schema", "keysrules", "valuesrules",
                     "allow_unknown")
    scalar = {k: v for k, v in elem_rules.items()
              if k not in mapping_rules}
    emitters: list = []
    for b, m in _probe_scalar_conds(scalar, dtype, opts):
        emitters.append(
            lambda x, base, _b=b, _m=m: _one(_b(x), base, F.lit(_m)))

    if not isinstance(dtype, (T.StructType, T.MapType)):
        for r in ("schema", "keysrules", "valuesrules"):
            if r in elem_rules:
                raise CompileError(
                    f"`{r}` inside list elements requires struct/map"
                    " elements in the columnar compiler (use the"
                    " dynamic interpreter path for list-in-list"
                    " nesting)")
        return emitters

    # nested rules skip null elements (the injected nullable:false
    # already fires on them via the scalar path)
    inner = _mapping_emitters(elem_rules, dtype, opts)
    emitters.extend(
        lambda x, base, _ib=ib: F.when(x.isNotNull(), _ib(x, base))
        for ib in inner)
    return emitters


def _mapping_emitters(
    rules: dict, dtype: T.DataType, opts: CompilerOpts
) -> list[Callable[[Column, Column], Column]]:
    """validateDict (``validator.hh:302-344``) over a struct/map value
    inside an array element: nested ``schema`` recursion,
    keysrules/valuesrules, unknown-key checks — all as dynamic-path
    emitters. The caller gates on the mapping's definedness."""
    emitters: list = []
    is_struct = isinstance(dtype, T.StructType)
    names = dtype.fieldNames() if is_struct else ()
    has_def = (opts.presence == "defined" and "__defined__" in names)
    allow_unknown = (_truthy(rules.get("allow_unknown", False))
                     or opts.allow_unknown)

    def accessors(fname: str):
        if is_struct:
            val = (lambda x, _f=fname: x[_f])
            if has_def:
                dfn = (lambda x, _f=fname: F.coalesce(
                    F.array_contains(x["__defined__"], _f), F.lit(False)))
            else:
                dfn = (lambda x, _f=fname: F.coalesce(
                    x[_f].isNotNull(), F.lit(False)))
            fdt = dtype[fname].dataType
        else:
            val = (lambda x, _f=fname: F.try_element_at(x, F.lit(_f)))
            dfn = (lambda x, _f=fname: F.coalesce(
                F.map_contains_key(x, F.lit(_f)), F.lit(False)))
            fdt = dtype.valueType
        return val, dfn, fdt

    nested = rules.get("schema")
    if nested is not None:
        if isinstance(nested, str):
            resolved = opts.schema_registry.get(nested)
            if resolved is None:
                raise CompileError(
                    f"unknown registered schema: {nested}")
            nested = resolved
        for fname, frules in nested.items():
            sfx = F.lit(f".{fname}")
            if is_struct and fname not in names:
                # field absent from the frame: undefined everywhere
                if _truthy(frules.get("required")):
                    emitters.append(
                        lambda x, base, _s=sfx: _one(
                            F.lit(True), F.concat(base, _s),
                            F.lit("required-rule violated: field"
                                  " missing")))
                continue
            val, dfn, fdt = accessors(fname)
            if _truthy(frules.get("required")):
                emitters.append(
                    lambda x, base, _d=dfn, _s=sfx: _one(
                        ~_d(x), F.concat(base, _s),
                        F.lit("required-rule violated: field missing")))
            # nested-mapping rule names are excluded from the scalar
            # probe for EVERY child dtype: on mapping children the
            # recursion below owns them, on non-mapping children the
            # tailored CompileError below must fire (leaving them in
            # made _probe_scalar_conds raise its generic message
            # first, turning that branch into dead code)
            sub_scalar = {
                k: v for k, v in frules.items()
                if k not in ("required", "schema", "keysrules",
                             "valuesrules") + mapping_excl(fdt)}
            for b, m in _probe_scalar_conds(sub_scalar, fdt, opts):
                emitters.append(
                    lambda x, base, _d=dfn, _v=val, _b=b, _m=m, _s=sfx:
                        _one(_d(x) & F.coalesce(_b(_v(x)), F.lit(False)),
                             F.concat(base, _s), F.lit(_m)))
            if isinstance(fdt, (T.StructType, T.MapType)):
                # recurse; nested rules no-op on undefined/null child
                for ib in _mapping_emitters(frules, fdt, opts):
                    emitters.append(
                        lambda x, base, _d=dfn, _v=val, _ib=ib, _s=sfx:
                            F.when(_d(x) & _v(x).isNotNull(),
                                   _ib(_v(x), F.concat(base, _s))))
            elif any(r in frules
                     for r in ("schema", "keysrules", "valuesrules")):
                raise CompileError(
                    "nested mapping rules under a non-mapping element"
                    " field are not columnar-compilable (use the"
                    " dynamic interpreter path)")

    if "keysrules" in rules:
        if isinstance(dtype, T.StructType):
            emitters.extend(_struct_kv_emitters(
                rules["keysrules"], "keysrules", dtype, opts))
        elif not isinstance(dtype, T.MapType):
            raise CompileError(
                "keysrules inside elements requires a mapping-typed value")
        else:
            for b, m in _probe_scalar_conds(rules["keysrules"],
                                            dtype.keyType, opts):
                emitters.append(
                    lambda x, base, _b=b, _m=m: F.transform(
                        F.map_keys(x),
                        lambda k: F.when(
                            _b(k),
                            F.struct(
                                F.concat(base, F.lit("."),
                                         k.cast("string")).alias("path"),
                                F.lit(_m).alias("message")))))
    if "valuesrules" in rules:
        if isinstance(dtype, T.StructType):
            emitters.extend(_struct_kv_emitters(
                rules["valuesrules"], "valuesrules", dtype, opts))
        elif not isinstance(dtype, T.MapType):
            raise CompileError(
                "valuesrules inside elements requires a mapping-typed value")
        else:
            for b, m in _probe_scalar_conds(rules["valuesrules"],
                                            dtype.valueType, opts):
                emitters.append(
                    lambda x, base, _b=b, _m=m: F.transform(
                        F.map_entries(x),
                        lambda e: F.when(
                            _b(e["value"]),
                            F.struct(
                                F.concat(base, F.lit("."),
                                         e["key"].cast("string")
                                         ).alias("path"),
                                F.lit(_m).alias("message")))))

    # unknown keys (validator.hh:334-339), at the mapping's own path —
    # the check belongs to the `schema` rule's validateDict, so it
    # fires iff a dict-form schema is present (keysrules alone puts no
    # constraint on key NAMES beyond its own rule)
    known_names = set((nested or {}).keys()) if nested is not None else set()
    if not allow_unknown and nested is not None:
        if is_struct:
            for fname in names:
                if fname in known_names or fname == "__defined__":
                    continue
                _, dfn, _ = accessors(fname)
                emitters.append(
                    lambda x, base, _d=dfn, _f=fname: _one(
                        _d(x), base,
                        F.lit(f"unknown field not permitted: {_f}")))
        else:
            known = (F.array(*[F.lit(str(k)) for k in known_names])
                     if known_names else F.array().cast("array<string>"))

            def unk(x, _k=known):
                return F.array_except(
                    F.transform(F.map_keys(x),
                                lambda k: k.cast("string")), _k)

            emitters.append(
                lambda x, base: F.transform(
                    F.sort_array(unk(x)),
                    lambda k: F.struct(
                        base.alias("path"),
                        F.concat(F.lit("unknown field not permitted: "),
                                 k).alias("message"))))
    return emitters


def _struct_kv_emitters(
    arg: dict, which: str, dtype: T.StructType, opts: CompilerOpts
) -> list[Callable[[Column, Column], Column]]:
    """keysrules/valuesrules over a STRUCT-typed mapping (a dict-form
    ``schema`` alongside keysrules/valuesrules types the value as a
    struct, so key names are compile-time constants): key checks fold
    to literal probes, value checks probe each field's own dtype.
    Matches the interpreter, which runs keysrules/valuesrules over
    every key PRESENT in the document — known and unknown alike
    (``rules.hh:270-288, 614-632``)."""
    names = dtype.fieldNames()
    has_def = (opts.presence == "defined" and "__defined__" in names)
    ems: list = []
    for fname in names:
        if fname == "__defined__":
            continue
        if has_def:
            dfn = (lambda x, _f=fname: F.coalesce(
                F.array_contains(x["__defined__"], _f), F.lit(False)))
        else:
            dfn = (lambda x, _f=fname: F.coalesce(
                x[_f].isNotNull(), F.lit(False)))
        if which == "keysrules":
            probe_dt: T.DataType = T.StringType()
            val = (lambda x, _f=fname: F.lit(_f))
        else:
            probe_dt = dtype[fname].dataType
            val = (lambda x, _f=fname: x[_f])
        for b, m in _probe_scalar_conds(arg, probe_dt, opts):
            ems.append(
                lambda x, base, _d=dfn, _v=val, _b=b, _m=m, _f=fname:
                    _one(_d(x) & F.coalesce(_b(_v(x)), F.lit(False)),
                         F.concat(base, F.lit("." + _f)), F.lit(_m)))
    return ems


def mapping_excl(fdt: T.DataType) -> tuple:
    """Rule names handled by the mapping recursion (not the scalar
    probe) for a child of dtype ``fdt``."""
    if isinstance(fdt, (T.StructType, T.MapType)):
        return ("schema", "keysrules", "valuesrules", "allow_unknown")
    return ()


def _probe_scalar_conds(rules: dict, dtype: T.DataType, opts: CompilerOpts):
    """Turn _scalar_conds into re-usable (builder, message) pairs: the
    condition must be rebuilt per lambda variable, so probe once for
    messages/ordering, then rebuild inside each transform."""
    probe = _scalar_conds(rules, F.lit(None).cast(dtype), dtype, opts)
    pairs = []
    for idx, (_, msg) in enumerate(probe):
        def builder(x, _i=idx):
            return _scalar_conds(rules, x, dtype, opts)[_i][0]
        pairs.append((builder, msg))
    return pairs


def compile_field(ctx: FieldCtx) -> tuple[list[Column], Column, Column]:
    """Compile one field's rule-map.

    Returns (violation columns, effective value expr, effective
    definedness) — the effective value has NORMALIZATION (default)
    applied so later rules validate the normalized value, mirroring
    the reference's phase order (``validator.hh:266-287``).
    """
    rules = ctx.rules
    opts = ctx.opts
    viols: list[Column] = []
    tname = ctx.declared_type()

    # ---- NORMALIZATION phase: default (rules.hh:128-141) ----
    value, defined = ctx.value, ctx.defined
    if "default" in rules:
        dlit = literal_with(opts.spark_types, rules["default"], tname)
        if value is None:
            value, ctx.dtype = dlit, None  # column absent: constant default
            # dtype left as declared; decode handled via literal
        else:
            value = F.when(~defined, dlit).otherwise(value)
        defined = F.lit(True)
        ctx = FieldCtx(opts, rules, value, ctx.dtype, defined,
                       ctx.path, ctx.scope)

    path = ctx.path_lit()

    for name, arg in rules.items():
        if name.startswith("__"):
            continue
        if name in opts.column_rules:  # custom registered column rules
            viols.extend(opts.column_rules[name](ctx, arg) or [])
            continue
        if name == "required":
            if _truthy(arg):
                viols.append(_viol(~defined, path,
                                   "required-rule violated: field missing"))
        elif name == "nullable":
            explicit = not rules.get("__nullable_injected__", False)
            if not _truthy(arg) and (explicit or opts.presence == "defined"
                                     or ctx.elem):
                if ctx.value is not None:
                    cond = (defined & ctx.value.isNull()
                            if opts.presence == "defined" or ctx.elem
                            else ctx.value.isNull())
                    viols.append(_viol(cond, path, "nullable-rule violated"))
        elif name == "min":
            dec = ctx.decoded()
            cond = (defined & ~F.coalesce(dec > ctx.literal(arg),
                                          F.lit(False))
                    if dec is not None else defined)
            viols.append(_viol(cond, path, "min-rule violated"))
        elif name == "max":
            dec = ctx.decoded()
            if dec is not None:
                viols.append(_viol(
                    defined & F.coalesce(dec >= ctx.literal(arg),
                                         F.lit(False)),
                    path, "max-rule violated"))
        elif name == "allowed":
            dec = ctx.decoded()
            if ctx.value is None:
                continue
            base = defined & ctx.value.isNotNull()
            if dec is None or isinstance(ctx.dtype,
                                         (T.ArrayType, T.MapType, T.StructType)):
                viols.append(_viol(base, path,
                                   "value disallowed by allowed-rule"))
            else:
                lits = [ctx.literal(v) for v in _as_list(arg)]
                viols.append(_viol(
                    base & ~F.coalesce(dec.isin(*lits), F.lit(False)),
                    path, "value disallowed by allowed-rule"))
        elif name == "forbidden":
            dec = ctx.decoded()
            if dec is None or ctx.value is None:
                continue
            for cand in _as_list(arg):
                viols.append(_viol(
                    defined & ctx.value.isNotNull()
                    & F.coalesce(dec.eqNullSafe(ctx.literal(cand)),
                                 F.lit(False)),
                    path, f"forbidden-rule violated: {cand}"))
        elif name == "regex":
            if ctx.value is None:
                continue
            sdec = decode_expr(ctx.value, ctx.dtype, "string") \
                if ctx.dtype is not None else None
            # full match (rules.hh:448); \A..\z so a trailing newline
            # can't sneak past Java's line-terminator-tolerant $ —
            # keeps rlike, the structural fast path, the interpreter
            # twin (re.fullmatch), and the C++ reference in agreement
            pattern = f"\\A(?:{arg})\\z"
            base = defined & ctx.value.isNotNull()
            if sdec is None:
                viols.append(_viol(base, path, "regex-rule violated"))
            else:
                fast = _regex_fast_path(sdec, arg) \
                    if ctx.opts.structural_regex else None
                match = fast if fast is not None else sdec.rlike(pattern)
                viols.append(_viol(
                    base & ~F.coalesce(match, F.lit(False)),
                    path, "regex-rule violated"))
        elif name == "empty":
            if (ctx.value is not None and isinstance(ctx.dtype, T.ArrayType)
                    and not _truthy(arg)):
                viols.append(_viol(
                    defined & ctx.value.isNotNull()
                    & (F.size(ctx.value) == 0),
                    path, "empty-rule violated for sequence"))
        elif name == "minlength":
            viols.append(_viol(_count_expr(ctx) < F.lit(int(arg)), path,
                               "minlength-rule violated"))
        elif name == "maxlength":
            viols.append(_viol(_count_expr(ctx) > F.lit(int(arg)), path,
                               "maxlength-rule violated"))
        elif name == "contains":
            needed = [str(_scalar_text(v)) for v in _as_list(arg)]
            needed_arr = F.array(*[F.lit(n) for n in needed])
            if ctx.value is not None and isinstance(ctx.dtype, T.ArrayType):
                have = F.transform(ctx.value, lambda x: x.cast("string"))
                ok = F.size(F.array_except(needed_arr, have)) == 0
                viols.append(_viol(~F.coalesce(ok, F.lit(False)), path,
                                   "contains-rule violated"))
            else:
                # reference iterates zero items → every needed missing
                viols.append(_viol(F.lit(True), path,
                                   "contains-rule violated"))
        elif name == "type":
            if ctx.value is None or ctx.dtype is None:
                continue  # undefined always → type skipped
            names = [str(n) for n in _as_list(arg)]
            base = defined & ctx.value.isNotNull()
            if isinstance(ctx.dtype, T.ArrayType):
                if "list" not in names:
                    viols.append(_viol(base, path,
                                       "type-rule violated: expected "
                                       + "/".join(names)))
            elif isinstance(ctx.dtype, (T.MapType, T.StructType)):
                if "dict" not in names:
                    viols.append(_viol(base, path,
                                       "type-rule violated: expected "
                                       + "/".join(names)))
            else:
                preds = [
                    opts.spark_types[n].convertible(ctx.value, ctx.dtype)
                    if n in opts.spark_types
                    else convertible_expr(ctx.value, ctx.dtype, n)
                    for n in names
                    if n in _BUILTIN_TYPE_NAMES or n in opts.spark_types
                ]
                ok = reduce(lambda a, b: a | b, preds) if preds else F.lit(False)
                viols.append(_viol(base & ~ok, path,
                                   "type-rule violated: expected "
                                   + "/".join(names)))
        elif name == "dependencies":
            if ctx.value is None:
                continue
            if isinstance(arg, dict):
                for dep, pinned in arg.items():
                    ref = _resolve(ctx.scope, str(dep), opts)
                    if ref is None:
                        viols.append(_viol(
                            defined, path,
                            f"dependencies-rule violated: {dep} required"))
                        continue
                    viols.append(_viol(
                        defined & ~ref.defined, path,
                        f"dependencies-rule violated: {dep} required"))
                    strs = [str(_scalar_text(v)) for v in _as_list(pinned)]
                    dep_str = (decode_expr(ref.value, ref.dtype, "string")
                               if ref.value is not None and ref.dtype is not None
                               else None)
                    pin_ok = (ref.defined
                              & F.coalesce(dep_str.isin(strs), F.lit(False))
                              if dep_str is not None else F.lit(False))
                    opts_s = ", ".join(strs)
                    viols.append(_viol(
                        defined & ~pin_ok, path,
                        f"dependencies-rule violated: {dep} requires value"
                        f" out of [{opts_s}]"))
            else:
                for dep in _as_list(arg):
                    ref = _resolve(ctx.scope, str(dep), opts)
                    cond = (defined & ~ref.defined) if ref is not None else defined
                    viols.append(_viol(
                        cond, path,
                        f"dependencies-rule violated: {dep} required"))
        elif name == "excludes":
            if ctx.value is None:
                continue
            for exc in _as_list(arg):
                ref = _resolve(ctx.scope, str(exc), opts)
                if ref is not None:
                    viols.append(_viol(
                        defined & ref.defined, path,
                        f"excludes-rule violated: {exc} is not allowed"))
        elif name == "schema":
            viols.extend(_compile_schema_rule(ctx, arg, defined))
        elif name == "items":
            if ctx.value is not None and isinstance(ctx.dtype, T.ArrayType):
                elem_dt = ctx.dtype.elementType
                for i, sub in enumerate(_as_list(arg)):
                    ectx = FieldCtx(
                        opts, sub,
                        F.try_element_at(ctx.value, F.lit(i + 1)), elem_dt,
                        defined & (F.coalesce(F.size(ctx.value), F.lit(0)) > i),
                        f"{ctx.path}[{i}]", ctx.scope, elem=True)
                    v2, _, _ = compile_field(ectx)
                    # items no-ops on an undefined list (same skip
                    # semantics as the schema rule)
                    viols.extend(_gate_viols(v2, defined))
        elif name == "keysrules":
            if ctx.value is not None and isinstance(ctx.dtype, T.StructType):
                base = F.lit(ctx.path)
                gate = defined & ctx.value.isNotNull()
                for em in _struct_kv_emitters(arg, "keysrules",
                                              ctx.dtype, opts):
                    viols.append(ArrayViol(
                        F.when(gate, em(ctx.value, base))
                        .otherwise(F.array().cast(VIOL_ARRAY_T))))
            elif ctx.value is not None and isinstance(ctx.dtype, T.MapType):
                key_dt = ctx.dtype.keyType
                prefix = ctx.path + "."

                def make_key_fn(cb, m):
                    def fn(k):
                        return F.when(
                            cb(k),
                            F.struct(
                                F.concat(F.lit(prefix),
                                         k.cast("string")).alias("path"),
                                F.lit(m).alias("message")))
                    return fn

                for cb, msg in _probe_scalar_conds(arg, key_dt, opts):
                    arr = F.transform(F.map_keys(ctx.value),
                                      make_key_fn(cb, msg))
                    viols.append(ArrayViol(F.coalesce(arr, F.array().cast(VIOL_ARRAY_T))))
        elif name == "valuesrules":
            if ctx.value is not None and isinstance(ctx.dtype, T.StructType):
                base = F.lit(ctx.path)
                gate = defined & ctx.value.isNotNull()
                for em in _struct_kv_emitters(arg, "valuesrules",
                                              ctx.dtype, opts):
                    viols.append(ArrayViol(
                        F.when(gate, em(ctx.value, base))
                        .otherwise(F.array().cast(VIOL_ARRAY_T))))
            elif ctx.value is not None and isinstance(ctx.dtype, T.MapType):
                val_dt = ctx.dtype.valueType
                prefix = ctx.path + "."

                def make_val_fn(cb, m):
                    def fn(e):
                        return F.when(
                            cb(e["value"]),
                            F.struct(
                                F.concat(F.lit(prefix),
                                         e["key"].cast("string")).alias("path"),
                                F.lit(m).alias("message")))
                    return fn

                for cb, msg in _probe_scalar_conds(arg, val_dt, opts):
                    arr = F.transform(F.map_entries(ctx.value),
                                      make_val_fn(cb, msg))
                    viols.append(ArrayViol(F.coalesce(arr, F.array().cast(VIOL_ARRAY_T))))
        elif name in ("meta", "rename", "default", "allow_unknown",
                      "purge_unknown", "require_all"):
            pass  # no-op / handled by normalization & engine preprocessing
        else:
            raise CompileError(
                f"unknown rule {name!r} reached the compiler — schema was"
                " not meta-validated")
    return viols, value, defined


def _compile_schema_rule(ctx: FieldCtx, arg: Any, defined: Column) -> list[Column]:
    """The ``schema`` rule (``rules.hh:519-573``): dict form recurses
    into struct/map fields; list form applies one rule-map per element
    via F.transform."""
    opts = ctx.opts
    if isinstance(arg, str):
        resolved = opts.schema_registry.get(arg)
        if resolved is None:
            raise CompileError(f"unknown registered schema: {arg}")
        arg = resolved
    if ctx.value is None or ctx.dtype is None:
        return []
    if isinstance(ctx.dtype, T.ArrayType):
        return _array_rule_viols(ctx, arg)
    if isinstance(ctx.dtype, (T.StructType, T.MapType)):
        # the schema rule NO-OPS when the carrying field is undefined
        # (reference: rules skip undefined values; a missing dict must
        # not fire its children's `required`) — gate every nested
        # violation on the parent's definedness
        nested = _compile_mapping(
            arg, FieldRef(ctx.value, ctx.dtype, defined),
            ctx.path, ctx.scope, opts,
            allow_unknown=_truthy(ctx.rules.get("allow_unknown", False))
            or opts.allow_unknown,
        )
        return _gate_viols(nested, defined)
    return []


def _gate_viols(viols: list, gate: Column) -> list:
    """AND every violation's firing condition with ``gate``."""
    out = []
    empty = F.array().cast(VIOL_ARRAY_T)
    for v in viols:
        if isinstance(v, ArrayViol):
            out.append(ArrayViol(F.when(gate, v.col).otherwise(empty)))
        elif isinstance(v, ScalarViol):
            out.append(ScalarViol(
                gate & F.coalesce(v.cond, F.lit(False)),
                F.when(gate, v.struct),
            ))
        else:  # raw struct-or-null Column
            out.append(F.when(gate, v))
    return out


def _compile_mapping(
    schema: dict,
    parent: FieldRef,
    path: str,
    parent_scope: Scope,
    opts: CompilerOpts,
    *,
    allow_unknown: bool,
) -> list[Column]:
    """validateDict over a nested struct/map column
    (``validator.hh:302-344``): per-field recursion + unknown-key
    violations."""
    viols: list[Column] = []
    refs: dict[str, FieldRef] = {}
    for fname in schema:
        ref = _child_ref(parent, fname, opts)
        if ref is None:
            ref = FieldRef(None, None, F.lit(False))
        refs[fname] = ref
    scope = Scope(refs, parent_scope.root)
    for fname, rules in schema.items():
        ref = refs[fname]
        fctx = FieldCtx(opts, rules, ref.value, ref.dtype, ref.defined,
                        f"{path}.{fname}", scope)
        v2, _, _ = compile_field(fctx)
        viols.extend(v2)
    # unknown keys (validator.hh:334-339)
    if not allow_unknown and parent.dtype is not None:
        if isinstance(parent.dtype, T.StructType):
            for fname in parent.dtype.fieldNames():
                if fname in schema or fname == "__defined__":
                    continue
                ref = _child_ref(parent, fname, opts)
                if ref is not None:
                    viols.append(_viol(
                        ref.defined, F.lit(path),
                        f"unknown field not permitted: {fname}"))
        elif isinstance(parent.dtype, T.MapType):
            known = F.array(*[F.lit(k) for k in schema]) if schema \
                else F.array().cast("array<string>")
            arr = F.transform(
                F.map_keys(parent.value),
                lambda k: F.when(
                    ~F.array_contains(known, k.cast("string")),
                    F.struct(
                        F.lit(path).alias("path"),
                        F.concat(F.lit("unknown field not permitted: "),
                                 k.cast("string")).alias("message"))))
            viols.append(ArrayViol(F.coalesce(arr, F.array().cast(VIOL_ARRAY_T))))
    return viols


def assemble_violations(viols: list) -> Column:
    """Fuse per-rule violation columns into one array.

    Codegen note: higher-order functions (``F.filter``/``transform``
    lambdas) are CodegenFallback in Spark — one lambda in the fused
    projection demotes the ENTIRE expression tree to interpreted mode
    (~10× slower at 1M rows, measured). Scalar rule violations are
    therefore merged as ``concat`` of conditional single-element
    arrays, which stays inside whole-stage codegen. Only genuine
    per-element rules (arrays/maps) pay the HOF cost — their producers
    already use ``transform``, so nothing extra is lost filtering
    their nulls lazily at the same fallback tier."""
    empty = F.array().cast(VIOL_ARRAY_T)
    parts: list[Column] = []
    for v in viols:
        if isinstance(v, ArrayViol):
            parts.append(
                F.filter(v.col, lambda x: x.isNotNull())
                .cast(VIOL_ARRAY_T)
            )
        elif isinstance(v, ScalarViol):
            parts.append(
                F.when(v.cond, F.array(v.struct)).otherwise(empty)
            )
        else:  # raw struct-or-null Column (custom-rule back-compat)
            parts.append(
                F.when(v.isNotNull(), F.array(v)).otherwise(empty)
            )
    if not parts:
        return empty
    merged = F.concat(*parts) if len(parts) > 1 else parts[0]
    return merged.cast(VIOL_ARRAY_T)


def assemble_violation_count(viols: list) -> Column:
    """``n_violations`` as a pure integer expression — no arrays, no
    structs, no string literals on the count path. This is what makes
    verdict-only jobs (the north metric) allocation-free."""
    terms: list[Column] = []
    for v in viols:
        if isinstance(v, ArrayViol):
            terms.append(
                F.coalesce(
                    F.size(F.filter(v.col, lambda x: x.isNotNull())),
                    F.lit(0),
                )
            )
        elif isinstance(v, ScalarViol):
            terms.append(F.when(v.cond, F.lit(1)).otherwise(F.lit(0)))
        else:
            terms.append(
                F.when(v.isNotNull(), F.lit(1)).otherwise(F.lit(0))
            )
    if not terms:
        return F.lit(0)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out
