"""Dynamic document validator — the engine's fidelity path.

A from-scratch Python reimplementation of the reference's recursive
validation pipeline (``/root/reference/include/cerberus-cpp/
validator.hh:159-344`` + ``rules.hh:47-667``), used for three jobs:

1. **Schema meta-validation** on the driver (schema-of-schemas,
   ``validator.hh:159-175``) — raising :class:`SchemaError` for
   ill-formed schemas before anything touches the cluster.
2. **The dynamic fallback** for truly schemaless / heterogeneous
   documents that the columnar compiler cannot type statically —
   distributed via ``mapInPandas`` over a JSON column (see
   ``cerberus_cpp_spark.dynamic.spark``).
3. **The oracle** for the columnar compiler's own tests.

Semantics preserved exactly (see SURVEY.md §1.2): exclusive
``min``/``max`` with asymmetric null handling, ``nullable: false``
auto-injection via meta-schema defaults, YAML-decodability ``type``
checks, string-equality ``contains``/``dependencies``, full-match
``regex``, lexically scoped policies, six priority phases, error
accumulation without short-circuit, ``^``-anchored dependency paths.

Documents are plain Python trees (``yaml.safe_load`` output); the
``UNDEFINED`` sentinel distinguishes an absent key from explicit null.
"""

from __future__ import annotations

import copy
import re
from dataclasses import dataclass, field as dc_field
from enum import IntEnum
from typing import Any, Callable

from ..errors import SchemaError, ValidationErrorItem
from ..functions.pytypes import (
    UNDEFINED,
    TypeAdapter,
    _scalar_text,
    builtin_types,
)


class Priority(IntEnum):
    """Six rule-execution phases (reference ``rules.hh:17-31``)."""

    FIRST = 0
    NORMALIZATION = 1
    VALIDATION = 2
    TYPECHECKING = 3
    POST_NORMALIZATION = 4
    LAST = 5


_PHASES = tuple(Priority)


def as_list(node: Any) -> list[Any]:
    """Scalar → one-element list; list → itself (``rules.hh:36-45``)."""
    if isinstance(node, list):
        return list(node)
    if node is UNDEFINED or node is None:
        return []
    return [node]


def _truthy(arg: Any) -> bool:
    if isinstance(arg, bool):
        return arg
    if isinstance(arg, str):
        return arg in ("true", "True", "TRUE", "yes", "on")
    return bool(arg)


def format_path(parts: tuple[Any, ...]) -> str:
    """Reference path grammar ``^.key[i]`` (``stack.hh:30-54``)."""
    out = ["^"]
    for p in parts:
        if isinstance(p, int):
            out.append(f"[{p}]")
        else:
            out.append(f".{p}")
    return "".join(out)


_PATH_TOKEN = re.compile(r"([^.\[\]]+)|\[(\d+)\]")


@dataclass
class _Item:
    """Mutable holder for one (value, field-name) pair during the
    phases — lets normalization rules (default/rename) write back."""

    value: Any
    field: str | None = None


@dataclass
class RuleCtx:
    """What a rule implementation sees — the Python analogue of the
    reference's ``ValidationRuleInterface`` (``validator.hh:225-470``)."""

    validator: "Validator"
    state: "_State"
    item: _Item
    arg: Any                      # the rule's value in the schema
    field_schema: dict            # the enclosing field rule-map
    path: tuple[Any, ...]
    parent: Any                   # enclosing document mapping (or None)

    @property
    def value(self) -> Any:
        return self.item.value

    @value.setter
    def value(self, v: Any) -> None:
        self.item.value = v

    def raise_error(self, message: str) -> None:
        self.state.errors.append(
            ValidationErrorItem(format_path(self.path), message)
        )

    def get_type(self, name: str | None = None) -> TypeAdapter:
        """Type adapter by name, or from the enclosing field schema's
        ``type:`` entry (reference ``getType`` — ``validator.hh:368-387``);
        defaults to string comparison when no type is declared."""
        if name is None:
            t = self.field_schema.get("type", "string")
            name = t[0] if isinstance(t, list) and t else t
        adapter = self.validator.types.get(str(name))
        if adapter is None:
            adapter = self.validator.types["string"]
        return adapter

    def lookup_path(self, path_str: str) -> Any:
        """Mini path language of ``dependencies``/``excludes``:
        ``^`` anchors at the document root, dotted keys descend,
        ``[i]`` indexes (reference ``stack.hh:146-172``)."""
        text = str(path_str)
        if text.startswith("^"):
            node = self.state.root
            text = text[1:].lstrip(".")
        else:
            node = self.parent
        for m in _PATH_TOKEN.finditer(text):
            key, idx = m.group(1), m.group(2)
            if idx is not None:
                if isinstance(node, list) and int(idx) < len(node):
                    node = node[int(idx)]
                else:
                    return UNDEFINED
            else:
                if isinstance(node, dict) and key in node:
                    node = node[key]
                else:
                    return UNDEFINED
        return node


@dataclass
class _State:
    """Per-validate() mutable state (errors + scoped policies)."""

    root: Any
    errors: list[ValidationErrorItem] = dc_field(default_factory=list)
    allow_unknown: bool = False
    purge_unknown: bool = False
    require_all: bool = False
    policy_stack: list[tuple[str, bool]] = dc_field(default_factory=list)

    def push_policy(self, name: str, value: bool) -> None:
        self.policy_stack.append((name, getattr(self, name)))
        setattr(self, name, value)

    def pop_policy(self, name: str) -> None:
        # pop the most recent entry for this policy name
        for i in range(len(self.policy_stack) - 1, -1, -1):
            if self.policy_stack[i][0] == name:
                setattr(self, name, self.policy_stack[i][1])
                del self.policy_stack[i]
                return


RuleFn = Callable[[RuleCtx], None]


@dataclass(frozen=True)
class Rule:
    name: str
    priority: Priority
    fn: RuleFn


class Validator:
    """Public API mirroring the reference's ``Validator``
    (``validator.hh:22-212``): construct with an optional schema,
    ``validate(doc[, schema])``, ``errors``, ``get_document()`` for the
    normalized output, plus ``register_rule`` / ``register_type`` /
    ``register_schema`` extension points (``validator.hh:56-95``).
    """

    def __init__(
        self,
        schema: dict | None = None,
        *,
        allow_unknown: bool = False,
        purge_unknown: bool = False,
        require_all: bool = False,
        validate_schema: bool = True,
    ) -> None:
        self.schema = schema
        self.allow_unknown = allow_unknown
        self.purge_unknown = purge_unknown
        self.require_all = require_all
        self.validate_schema = validate_schema
        self.types: dict[str, TypeAdapter] = builtin_types()
        self.schema_registry: dict[str, dict] = {}
        # (priority, name) → rule fn; meta-schemas accumulate the
        # schema-of-schemas exactly like registerRule does
        # (``validator.hh:75-80``).
        self._rules: dict[tuple[Priority, str], RuleFn] = {}
        self.schema_schema: dict[str, dict] = {}
        self._state: _State | None = None
        _register_builtin_rules(self)

    @classmethod
    def from_yaml(cls, source: str, **kwargs) -> "Validator":
        """Construct from a YAML schema — the reference's native
        schema format (its ``Validator`` takes ``YAML::Node`` schemas
        and every ``test/testdata.yml`` case is YAML;
        ``validator.hh:33-38``). ``source`` is YAML text, or a path to
        a ``.yml``/``.yaml`` file. ``yaml.safe_load`` output is
        exactly the dict/scalar tree the engine's YAML-decode type
        semantics were built for, so a cerberus-cpp user's schema
        file works verbatim. Keyword arguments pass through to the
        constructor. A path-shaped source naming no existing file
        raises ``FileNotFoundError`` (shared helper,
        ``yamlschema.py``)."""
        from ..yamlschema import load_yaml_schema

        return cls(load_yaml_schema(source), **kwargs)

    # -- extension API -------------------------------------------------
    def register_rule(
        self,
        name: str,
        meta_schema: dict,
        fn: RuleFn,
        priority: Priority = Priority.VALIDATION,
    ) -> None:
        self._rules[(priority, name)] = fn
        if name not in self.schema_schema or meta_schema:
            self.schema_schema[name] = meta_schema

    def register_type(self, adapter: TypeAdapter) -> None:
        self.types[adapter.name] = adapter

    def register_schema(self, name: str, schema: dict) -> None:
        self.schema_registry[name] = schema

    # -- public validation entry points --------------------------------
    def validate(self, document: Any, schema: dict | str | None = None) -> bool:
        if schema is None:
            schema = self.schema
        if isinstance(schema, str):
            if schema not in self.schema_registry:
                raise SchemaError(f"unknown registered schema: {schema}")
            schema = self.schema_registry[schema]
        if schema is None:
            raise SchemaError("no schema given")
        if self.validate_schema:
            schema = self.normalized_schema(schema)
        if not isinstance(document, dict):
            # top-level documents are always mappings (doc/index.rst:88)
            self._state = _State(root=document)
            self._state.errors.append(
                ValidationErrorItem("^", "document is not a mapping")
            )
            return False
        doc = copy.deepcopy(document)  # never mutate caller data
        self._state = _State(
            root=doc,
            allow_unknown=self.allow_unknown,
            purge_unknown=self.purge_unknown,
            require_all=self.require_all,
        )
        self._validate_dict(doc, schema, ())
        return not self._state.errors

    @property
    def errors(self) -> list[ValidationErrorItem]:
        return list(self._state.errors) if self._state else []

    def get_document(self) -> Any:
        """Normalized document of the last validate() call."""
        return self._state.root if self._state else None

    # -- schema meta-validation ----------------------------------------
    def normalized_schema(self, schema: dict) -> dict:
        """Meta-validate + normalize a user schema; raise SchemaError.

        Reference ``validator.hh:159-175``: each field's rule-map is
        validated against the accumulated schema-of-schemas by an inner
        validator with meta-validation off; the *normalized* rule-map
        (e.g. ``nullable: false`` injected by the meta-schema default)
        replaces the user's. We additionally recurse into nested
        ``schema``/``items``/``keysrules``/``valuesrules`` arguments
        (the reference silently skips nested meta-validation — an
        unpinned gap we close; divergence documented in SURVEY.md §5).
        """
        if not isinstance(schema, dict):
            raise SchemaError(f"schema must be a mapping, got {type(schema)}")
        inner = Validator(self.schema_schema, validate_schema=False)
        inner.types = self.types
        inner.schema_registry = self.schema_registry
        out: dict[str, dict] = {}
        for field_name, rules in schema.items():
            if not isinstance(rules, dict):
                raise SchemaError(
                    f"rules for field {field_name!r} must be a mapping"
                )
            if not inner.validate(rules):
                raise SchemaError(inner.errors)
            normalized = inner.get_document()
            out[field_name] = self._normalize_nested(normalized)
        return out

    def _normalize_nested(self, rules: dict) -> dict:
        decl = rules.get("type")
        types = [str(t) for t in as_list(decl)]
        if "schema" in rules and isinstance(rules["schema"], dict):
            if "list" in types:
                # list form: the arg is a single element rule-map
                rules["schema"] = self._meta_one(rules["schema"])
            elif "dict" in types:
                rules["schema"] = self.normalized_schema(rules["schema"])
            # no declared type: shape is ambiguous until data arrives —
            # leave as-is (matches the reference's laissez-faire here)
        if "items" in rules and isinstance(rules["items"], list):
            rules["items"] = [
                self._meta_one(s) if isinstance(s, dict) else s
                for s in rules["items"]
            ]
        for key in ("keysrules", "valuesrules"):
            if key in rules and isinstance(rules[key], dict):
                rules[key] = self._meta_one(rules[key])
        return rules

    def _meta_one(self, rule_map: dict) -> dict:
        inner = Validator(self.schema_schema, validate_schema=False)
        inner.types = self.types
        inner.schema_registry = self.schema_registry
        if not inner.validate(rule_map):
            raise SchemaError(inner.errors)
        return self._normalize_nested(inner.get_document())

    # -- recursive traversal (reference validateDict/validateItem) -----
    def _validate_dict(
        self, doc: dict, schema: dict, path: tuple[Any, ...]
    ) -> None:
        """Reference ``validateDict`` (``validator.hh:302-344``):
        iterate schema fields, descend, apply rename moves, then purge
        or flag unknown keys."""
        st = self._state
        assert st is not None
        found: list[str] = []
        for field_name, rules in schema.items():
            item = _Item(
                value=doc.get(field_name, UNDEFINED), field=field_name
            )
            self._validate_item(item, rules, path + (field_name,), doc)
            if item.field != field_name and field_name in doc:
                del doc[field_name]  # rename move (validator.hh:316-320)
            if item.value is not UNDEFINED:
                doc[item.field] = item.value
            found.append(item.field)
        if st.purge_unknown:
            for k in list(doc.keys()):
                if k not in found:
                    del doc[k]  # validator.hh:326-333
        if not st.allow_unknown:
            for k in doc.keys():
                if k not in found:
                    st.errors.append(
                        ValidationErrorItem(
                            format_path(path),
                            f"unknown field not permitted: {k}",
                        )
                    )  # validator.hh:334-339

    def _validate_item(
        self,
        item: _Item,
        rules: dict,
        path: tuple[Any, ...],
        parent: Any,
    ) -> None:
        """Reference ``validateItem`` (``validator.hh:261-290``): six
        priority phases, schema-key order within a phase, require_all
        injecting ``required: true`` at NORMALIZATION
        (``validator.hh:273-275``)."""
        st = self._state
        assert st is not None
        for phase in _PHASES:
            if phase == Priority.NORMALIZATION and st.require_all:
                # persists into later phases — the reference mutates the
                # schema node itself (validator.hh:273-275)
                rules = {**rules, "required": True}
            for name, arg in rules.items():
                fn = self._rules.get((phase, name))
                if fn is not None:
                    fn(
                        RuleCtx(
                            validator=self,
                            state=st,
                            item=item,
                            arg=arg,
                            field_schema=rules,
                            path=path,
                            parent=parent,
                        )
                    )


# ---------------------------------------------------------------------------
# Builtin rules — the full reference vocabulary (``rules.hh:640-667``),
# re-implemented in Python idiom. Order of registration mirrors the
# reference list for documentation purposes only (execution order is
# phase-then-schema-key order, ``validator.hh:266-287``).
# ---------------------------------------------------------------------------


def _policy_pair(name: str):
    def first(ctx: RuleCtx) -> None:
        ctx.state.push_policy(name, _truthy(ctx.arg))

    def last(ctx: RuleCtx) -> None:
        ctx.state.pop_policy(name)

    return first, last


def _rule_allowed(ctx: RuleCtx) -> None:
    """``rules.hh:79-100``. Divergence (unpinned by the reference
    corpus): undefined/null values are skipped rather than failing the
    equality probe — matches Python cerberus."""
    if ctx.value is UNDEFINED or ctx.value is None:
        return
    t = ctx.get_type()
    if not any(t.equality(cand, ctx.value) for cand in as_list(ctx.arg)):
        ctx.raise_error("value disallowed by allowed-rule")


def _rule_contains(ctx: RuleCtx) -> None:
    """``rules.hh:102-126`` — string equality, ALL listed values
    required; an undefined/non-list document leaves every needed value
    missing (reference iterates zero items → error)."""
    needed = [str(_scalar_text(x)) for x in as_list(ctx.arg)]
    items = ctx.value if isinstance(ctx.value, list) else []
    t = ctx.get_type("string")
    for item in items:
        needed = [n for n in needed if not t.equality(n, item)]
    if needed:
        ctx.raise_error(
            "contains-rule violated: missing " + ", ".join(needed)
        )


def _rule_default(ctx: RuleCtx) -> None:
    """``rules.hh:128-141`` — fires only on UNDEFINED, not null."""
    if ctx.value is UNDEFINED:
        ctx.value = copy.deepcopy(ctx.arg)


def _rule_dependencies(ctx: RuleCtx) -> None:
    """``rules.hh:143-187``: skip when the field itself is undefined;
    map form pins the dependency's value (string equality); paths may
    be ``^``-anchored at the document root."""
    if ctx.value is UNDEFINED:
        return
    t = ctx.get_type("string")
    if isinstance(ctx.arg, dict):
        for dep, pinned in ctx.arg.items():
            looked = ctx.lookup_path(str(dep))
            if looked is UNDEFINED:
                ctx.raise_error(
                    f"dependencies-rule violated: {dep} required"
                )
            if not any(t.equality(looked, v) for v in as_list(pinned)):
                opts = ", ".join(str(v) for v in as_list(pinned))
                ctx.raise_error(
                    f"dependencies-rule violated: {dep} requires value"
                    f" out of [{opts}]"
                )
        return
    for dep in as_list(ctx.arg):
        if ctx.lookup_path(str(dep)) is UNDEFINED:
            ctx.raise_error(f"dependencies-rule violated: {dep} required")


def _rule_empty(ctx: RuleCtx) -> None:
    """``rules.hh:189-203`` — only sequences are checked."""
    if (
        isinstance(ctx.value, list)
        and not _truthy(ctx.arg)
        and len(ctx.value) == 0
    ):
        ctx.raise_error("empty-rule violated for sequence")


def _rule_excludes(ctx: RuleCtx) -> None:
    """``rules.hh:205-227`` — skip when the field is undefined."""
    if ctx.value is UNDEFINED:
        return
    for exc in as_list(ctx.arg):
        if ctx.lookup_path(str(exc)) is not UNDEFINED:
            ctx.raise_error(
                f"excludes-rule violated: {exc} is not allowed"
            )


def _rule_forbidden(ctx: RuleCtx) -> None:
    """``rules.hh:229-244``."""
    if ctx.value is UNDEFINED or ctx.value is None:
        return
    t = ctx.get_type()
    for cand in as_list(ctx.arg):
        if t.equality(cand, ctx.value):
            ctx.raise_error(f"forbidden-rule violated: {cand}")


def _rule_items(ctx: RuleCtx) -> None:
    """``rules.hh:246-268`` — positional per-index schemas."""
    seq = ctx.value if isinstance(ctx.value, list) else []
    for i, sub in enumerate(ctx.arg or []):
        elem = _Item(value=seq[i] if i < len(seq) else UNDEFINED)
        ctx.validator._validate_item(
            elem, sub, ctx.path + (i,), ctx.parent
        )
        if i < len(seq) and elem.value is not UNDEFINED:
            seq[i] = elem.value


def _rule_keysrules(ctx: RuleCtx) -> None:
    """``rules.hh:270-288`` — apply a rule-map to every KEY."""
    if not isinstance(ctx.value, dict):
        return
    for key in ctx.value:
        ctx.validator._validate_item(
            _Item(value=key), ctx.arg, ctx.path + (key,), ctx.value
        )


def _rule_meta(ctx: RuleCtx) -> None:
    """``rules.hh:290-301`` — metadata carrier, no validation."""


def _rule_max(ctx: RuleCtx) -> None:
    """``rules.hh:303-320`` — EXCLUSIVE bound: doc must be strictly
    less than the bound; skip undefined; a non-decodable doc (incl.
    null) passes (both comparisons fail) — asymmetric vs min."""
    if ctx.value is UNDEFINED:
        return
    t = ctx.get_type()
    if t.less(ctx.arg, ctx.value) or t.equality(ctx.value, ctx.arg):
        ctx.raise_error("max-rule violated")


def _rule_min(ctx: RuleCtx) -> None:
    """``rules.hh:322-339`` — EXCLUSIVE bound: doc must be strictly
    greater; skip undefined; a non-decodable doc (incl. null) FAILS
    (``less`` returns false)."""
    if ctx.value is UNDEFINED:
        return
    t = ctx.get_type()
    if not t.less(ctx.arg, ctx.value):
        ctx.raise_error("min-rule violated")


def _count_items(value: Any) -> int:
    if isinstance(value, (list, dict)):
        return len(value)
    return 0  # reference iterates a scalar/undefined node zero times


def _rule_maxlength(ctx: RuleCtx) -> None:
    """``rules.hh:341-363``."""
    if _count_items(ctx.value) > int(ctx.arg):
        ctx.raise_error("maxlength-rule violated")


def _rule_minlength(ctx: RuleCtx) -> None:
    """``rules.hh:365-387``."""
    if _count_items(ctx.value) < int(ctx.arg):
        ctx.raise_error("minlength-rule violated")


def _rule_nullable(ctx: RuleCtx) -> None:
    """``rules.hh:389-404`` — fires on explicit null only; the
    ``default: false`` in its meta-schema is what auto-injects
    ``nullable: false`` into every field (SURVEY.md §1.2.2)."""
    if not _truthy(ctx.arg) and ctx.value is None:
        ctx.raise_error("nullable-rule violated")


def _rule_regex(ctx: RuleCtx) -> None:
    """``rules.hh:438-452`` — FULL match (``std::regex_match``)."""
    if ctx.value is UNDEFINED or ctx.value is None:
        return
    text = _scalar_text(ctx.value)
    if text is None or not re.fullmatch(str(ctx.arg), text):
        ctx.raise_error("regex-rule violated")


def _rule_rename(ctx: RuleCtx) -> None:
    """``rules.hh:454-469`` — POST_NORMALIZATION field move, applied
    by the dict traversal (``validator.hh:316-320``)."""
    ctx.item.field = str(ctx.arg)


def _rule_required(ctx: RuleCtx) -> None:
    """``rules.hh:503-517`` — fires only on UNDEFINED (null passes
    required but fails nullable)."""
    if _truthy(ctx.arg) and ctx.value is UNDEFINED:
        ctx.raise_error("required-rule violated: field missing")


def _rule_schema(ctx: RuleCtx) -> None:
    """``rules.hh:519-573``: dict doc → recurse field-map; list doc →
    apply one rule-map to every element; scalar arg → registered
    schema lookup (``validator.hh:408-415``)."""
    arg = ctx.arg
    if isinstance(arg, str):
        arg = ctx.validator.schema_registry.get(arg)
        if arg is None:
            ctx.raise_error(f"unknown registered schema: {ctx.arg}")
            return
        arg = ctx.validator.normalized_schema(arg)
    if isinstance(ctx.value, dict):
        ctx.validator._validate_dict(ctx.value, arg, ctx.path)
    elif isinstance(ctx.value, list):
        for i in range(len(ctx.value)):
            elem = _Item(value=ctx.value[i])
            ctx.validator._validate_item(
                elem, arg, ctx.path + (i,), ctx.parent
            )
            if elem.value is not UNDEFINED:
                ctx.value[i] = elem.value


def _rule_type(ctx: RuleCtx) -> None:
    """``rules.hh:575-612``: skipped for null/undefined; containers
    check structurally against ``list``/``dict``; scalars must be
    YAML-decodable to at least one named type. TYPECHECKING phase —
    runs after ordinary validation."""
    if ctx.value is UNDEFINED or ctx.value is None:
        return
    names = [str(t) for t in as_list(ctx.arg)]
    if isinstance(ctx.value, list):
        ok = "list" in names
    elif isinstance(ctx.value, dict):
        ok = "dict" in names
    else:
        ok = any(
            ctx.validator.types[n].is_convertible(ctx.value)
            for n in names
            if n in ctx.validator.types
        )
    if not ok:
        ctx.raise_error(
            "type-rule violated: expected " + "/".join(names)
        )


def _rule_valuesrules(ctx: RuleCtx) -> None:
    """``rules.hh:614-632`` — apply a rule-map to every VALUE."""
    if not isinstance(ctx.value, dict):
        return
    for key in list(ctx.value.keys()):
        elem = _Item(value=ctx.value[key])
        ctx.validator._validate_item(
            elem, ctx.arg, ctx.path + (key,), ctx.value
        )
        if elem.value is not UNDEFINED:
            ctx.value[key] = elem.value


def _register_builtin_rules(v: Validator) -> None:
    """Register the 21 + 3 builtin rules with their meta-schemas.

    Meta-schemas transcribed from the reference's registerRule calls
    (``rules.hh:47-667``); note ``minlength``/``maxlength`` use the
    rule vocabulary itself (``dependencies: {type: [list, dict]}``) to
    reject scalar-typed fields at meta-validation time — that is what
    turns ``test/illformedschemas.yml`` cases into SchemaErrors.
    """
    P = Priority
    au_first, au_last = _policy_pair("allow_unknown")
    pu_first, pu_last = _policy_pair("purge_unknown")
    ra_first, ra_last = _policy_pair("require_all")
    length_meta = {
        "type": "integer",
        "min": 0,
        "dependencies": {"type": ["list", "dict"]},
    }
    v.register_rule("allow_unknown", {"type": "boolean"}, au_first, P.FIRST)
    v.register_rule("allow_unknown", {}, au_last, P.LAST)
    v.register_rule("allowed", {"type": "list"}, _rule_allowed)
    v.register_rule(
        "contains", {"type": ["string", "list"]}, _rule_contains
    )
    v.register_rule("default", {}, _rule_default, P.NORMALIZATION)
    v.register_rule("dependencies", {}, _rule_dependencies)
    v.register_rule("empty", {"type": "boolean"}, _rule_empty)
    v.register_rule(
        "excludes", {"type": ["string", "list"]}, _rule_excludes
    )
    v.register_rule("forbidden", {"type": "list"}, _rule_forbidden)
    v.register_rule("items", {"type": "list"}, _rule_items)
    v.register_rule("keysrules", {"type": "dict"}, _rule_keysrules)
    v.register_rule(
        "meta", {"type": "dict", "allow_unknown": True}, _rule_meta
    )
    v.register_rule("max", {}, _rule_max)
    v.register_rule("min", {}, _rule_min)
    v.register_rule("maxlength", dict(length_meta), _rule_maxlength)
    v.register_rule("minlength", dict(length_meta), _rule_minlength)
    v.register_rule(
        "nullable", {"type": "boolean", "default": False}, _rule_nullable
    )
    v.register_rule("purge_unknown", {"type": "boolean"}, pu_first, P.FIRST)
    v.register_rule("purge_unknown", {}, pu_last, P.LAST)
    v.register_rule("regex", {"type": "string"}, _rule_regex)
    v.register_rule("rename", {"type": "string"}, _rule_rename, P.POST_NORMALIZATION)
    v.register_rule("require_all", {"type": "boolean"}, ra_first, P.FIRST)
    v.register_rule("require_all", {}, ra_last, P.LAST)
    v.register_rule("required", {"type": "boolean"}, _rule_required)
    v.register_rule("schema", {}, _rule_schema)
    v.register_rule("type", {}, _rule_type)
    v.register_rule("valuesrules", {"type": "dict"}, _rule_valuesrules)
