"""Error model of the engine.

Mirrors the reference's error model (``/root/reference/include/
cerberus-cpp/error.hh:20-46``): data-validation problems NEVER raise —
they accumulate as ``(path, message)`` records (``ValidationErrorItem``);
ill-formed *schemas* raise ``SchemaError`` during meta-validation
(``validator.hh:159-175``).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ValidationErrorItem:
    """One violation: reference ``error.hh:42-46`` (path + message).

    ``path`` uses the reference grammar (``stack.hh:30-54``):
    ``^`` root anchor, ``.key`` for mapping descent, ``[i]`` for
    sequence index — e.g. ``^.users[2].name``.
    """

    path: str
    message: str

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return f"{self.path}: {self.message}"


class CerberusError(Exception):
    """Base class for driver-side errors of this engine."""


class SchemaError(CerberusError):
    """Raised when a user schema fails meta-validation.

    Reference: ``error.hh:20-39`` + ``validator.hh:168-169`` — thrown
    for unknown rule names, wrong rule-argument types, and length rules
    applied to scalar-typed fields (``test/illformedschemas.yml``).
    """

    def __init__(self, errors: list[ValidationErrorItem] | str):
        if isinstance(errors, str):
            super().__init__(errors)
            self.errors: list[ValidationErrorItem] = []
        else:
            super().__init__(
                "ill-formed schema:\n"
                + "\n".join(f"  {e}" for e in errors)
            )
            self.errors = list(errors)


class DocumentError(CerberusError):
    """Raised when a document value cannot be represented (e.g. a
    non-mapping top-level document — reference requires mappings,
    ``doc/index.rst:88``)."""
