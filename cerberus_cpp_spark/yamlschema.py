"""Shared YAML schema loading for both engines.

The reference's native schema format is YAML (its ``Validator`` takes
``YAML::Node`` schemas and every ``test/testdata.yml`` case is YAML;
``validator.hh:33-38``). Both the fused columnar engine
(``plans.engine.TableValidator.from_yaml``) and the pure-Python twin
(``dynamic.interpreter.Validator.from_yaml``) load schemas through
this one helper so path-vs-text sniffing cannot drift between them
(ADVICE r4: the 20-line implementation was duplicated verbatim).
"""

from __future__ import annotations

import os

from .errors import SchemaError

__all__ = ["load_yaml_schema"]


def load_yaml_schema(source: str) -> dict:
    """Parse ``source`` — YAML text, or a path to a ``.yml``/``.yaml``
    file — into the mapping tree both validators consume.

    A source that *looks like a path* (ends with ``.yml``/``.yaml``,
    contains no newline) but names no existing file raises
    ``FileNotFoundError`` instead of being silently parsed as YAML
    text (which would surface as a confusing "schema must be a
    mapping, got str" later)."""
    import yaml

    looks_like_path = (len(source) < 4096 and "\n" not in source
                       and source.endswith((".yml", ".yaml")))
    if looks_like_path:
        if not os.path.exists(source):
            raise FileNotFoundError(
                f"YAML schema path does not exist: {source!r} "
                f"(pass YAML text directly if this was not a path)")
        with open(source, "r", encoding="utf-8") as f:
            schema = yaml.safe_load(f)
    else:
        schema = yaml.safe_load(source)
    if not isinstance(schema, dict):
        raise SchemaError(
            f"YAML schema must be a mapping, got "
            f"{type(schema).__name__}")
    return schema
