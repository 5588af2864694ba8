"""Zoi.Struct analogue: derive enforced keys / struct fields from a schema.

The reference (``lib/zoi/struct.ex:45-80``) extracts ``@enforce_keys``
and ``defstruct`` field lists from a struct schema so the Elixir struct
definition stays in sync with the validation schema. The Spark-native
equivalent of an enforced key is a NOT-NULL column: :func:`enforce_keys`
lists them, :func:`struct_fields` returns the defstruct shape, and
:func:`required_struct_type` emits the target ``StructType`` with
``nullable=False`` on every enforced column — the DDL a table-creation
step (Iceberg ``NOT NULL``) derives from the same schema the validator
compiles.

Semantics mirrored from the reference:

* a field is enforced unless explicitly ``optional`` — ``nullable``
  alone does NOT lift enforcement (``struct.ex`` example: ``name:
  string |> nullable`` still appears in ``@enforce_keys``); the
  reference unwraps ``Default`` and checks the inner ``required?``
  (``struct.ex:50-60``), which in this IR is the node's own tri-state;
* ``struct_fields`` renders defaulted fields as ``(key, default)``
  pairs sorted after the plain keys (``struct.ex:70-79``).

Field order follows the schema's declaration order (Python dicts are
ordered; Elixir map key order is not semantically meaningful).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

from .describe import to_struct_type
from .schema import _UNSET, Schema


def _require_fields(schema: Schema, fn: str) -> dict:
    if schema.kind != "fields":
        raise ValueError(f"{fn} requires a fields/struct schema, got {schema.kind}")
    return schema.params["fields"]


def enforce_keys(schema: Schema) -> list[str]:
    """Keys that must be present (``Zoi.Struct.enforce_keys/1``,
    lib/zoi/struct.ex:45-60): every field not marked ``optional``."""
    return [k for k, s in _require_fields(schema, "enforce_keys").items()
            if s.required is not False]


def struct_fields(schema: Schema) -> list[str | tuple[str, Any]]:
    """Defstruct shape (``Zoi.Struct.struct_fields/1``,
    lib/zoi/struct.ex:66-79): plain keys first, then ``(key, default)``
    pairs for defaulted fields (stable order within each group)."""
    plain: list[str] = []
    defaulted: list[tuple[str, Any]] = []
    for k, s in _require_fields(schema, "struct_fields").items():
        if s.default is not _UNSET:
            defaulted.append((k, s.default))
        else:
            plain.append(k)
    return [*plain, *defaulted]


def required_struct_type(schema: Schema) -> T.StructType:
    """Target ``StructType`` with ``nullable=False`` on every enforced,
    non-nullable, non-defaulted column — the Spark-native rendering of
    ``@enforce_keys`` (a defaulted column is filled, a nullable one may
    legitimately hold null)."""
    fields_ = _require_fields(schema, "required_struct_type")
    base = to_struct_type(schema)
    enforced = {k for k in enforce_keys(schema)
                if not fields_[k].nullable and fields_[k].default is _UNSET}
    return T.StructType([
        T.StructField(f.name, f.dataType, nullable=f.name not in enforced)
        for f in base.fields])
