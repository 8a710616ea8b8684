"""Scalar type registry — pure-Python side (dynamic interpreter).

Re-expresses the reference's type system (``/root/reference/include/
cerberus-cpp/types.hh:16-72``): each named type exposes exactly three
operations — ``is_convertible`` (= would a YAML decode of the scalar
succeed), ``equality`` and ``less`` — and ``type:`` checks test
*decodability*, not runtime type identity (``rules.hh:575-612``).

The convertibility matrix below is derived from yaml-cpp decode
behavior as pinned by the reference tests (``test/testdata.yml:505-527``):
``42`` decodes as integer AND float, ``true`` does NOT decode as
integer, ``abc`` fails numerics, and any scalar decodes as string.

Values in the dynamic interpreter are plain Python objects as produced
by ``yaml.safe_load`` (int / float / bool / str / None / list / dict)
plus the ``UNDEFINED`` sentinel for absent keys — Python ``None``
models YAML explicit null (``~``), which the reference distinguishes
from an undefined key (``rules.hh:587-588`` vs ``rules.hh:513``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable


class _Undefined:
    """Sentinel for an absent key (YAML ``!IsDefined()``)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:
        return "UNDEFINED"

    def __bool__(self) -> bool:
        return False


UNDEFINED = _Undefined()


# YAML 1.1-ish scalar lexical forms (what yaml-cpp's decode accepts).
_INT_RE = re.compile(r"[-+]?(0x[0-9a-fA-F]+|0o?[0-7]+|[0-9]+)")
_FLOAT_RE = re.compile(
    r"[-+]?(\.[0-9]+|[0-9]+(\.[0-9]*)?)([eE][-+]?[0-9]+)?"
    r"|[-+]?\.(inf|Inf|INF)|\.(nan|NaN|NAN)"
)
_BOOL_TRUE = {"true", "True", "TRUE", "yes", "Yes", "YES", "on", "On", "ON"}
_BOOL_FALSE = {"false", "False", "FALSE", "no", "No", "NO", "off", "Off", "OFF"}


def _scalar_text(value: Any) -> str | None:
    """The YAML scalar text of a Python value (None for containers)."""
    if value is UNDEFINED or value is None:
        return None
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float, str)):
        return str(value)
    return None


@dataclass(frozen=True)
class TypeAdapter:
    """One registered scalar type: decode / equality / less.

    ``decode`` returns the decoded value or raises ``ValueError`` —
    mirroring yaml-cpp ``convert<T>::decode`` returning false
    (``types.hh:35-39``).
    """

    name: str
    decode: Callable[[Any], Any]

    def is_convertible(self, value: Any) -> bool:
        try:
            self.decode(value)
            return True
        except (ValueError, TypeError):
            return False

    def equality(self, a: Any, b: Any) -> bool:
        try:
            return self.decode(a) == self.decode(b)
        except (ValueError, TypeError):
            return False

    def less(self, a: Any, b: Any) -> bool:
        try:
            return self.decode(a) < self.decode(b)
        except (ValueError, TypeError):
            return False


def _decode_integer(value: Any) -> int:
    if isinstance(value, bool):  # yaml: bool scalar does not decode as int
        raise ValueError("boolean is not integer-decodable")
    if isinstance(value, int):
        return value
    if isinstance(value, str) and _INT_RE.fullmatch(value.strip()):
        return int(value.strip(), 0)
    raise ValueError(f"not integer-decodable: {value!r}")


def _decode_float(value: Any) -> float:
    if isinstance(value, bool):
        raise ValueError("boolean is not float-decodable")
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, str) and _FLOAT_RE.fullmatch(value.strip()):
        return float(value.strip().replace(".inf", "inf").replace(".nan", "nan"))
    raise ValueError(f"not float-decodable: {value!r}")


def _decode_boolean(value: Any) -> bool:
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        if value in _BOOL_TRUE:
            return True
        if value in _BOOL_FALSE:
            return False
    raise ValueError(f"not boolean-decodable: {value!r}")


def _decode_string(value: Any) -> str:
    text = _scalar_text(value)
    if text is None:
        raise ValueError(f"not string-decodable: {value!r}")
    return text


def builtin_types() -> dict[str, TypeAdapter]:
    """The five builtin scalar types (reference ``types.hh:64-72``)."""
    return {
        "integer": TypeAdapter("integer", _decode_integer),
        "float": TypeAdapter("float", _decode_float),
        "number": TypeAdapter("number", _decode_float),
        "boolean": TypeAdapter("boolean", _decode_boolean),
        "string": TypeAdapter("string", _decode_string),
    }
