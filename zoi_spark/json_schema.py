"""JSON Schema (draft 2020-12) export / import for the schema IR.

Mirrors ``Zoi.to_json_schema/1`` (``lib/zoi/json_schema.ex:138-322``)
and ``Zoi.from_json_schema/1``
(``lib/zoi/json_schema/decoder.ex:16-120``): types string / integer /
number / boolean / null / array / object, enum, const, anyOf / oneOf /
allOf, formats (email, uuid, uri, date, time, date-time), and the
constraint keywords minLength / maxLength / pattern / minimum /
maximum / exclusiveMinimum / exclusiveMaximum / multipleOf /
minItems / maxItems / uniqueItems / required.
"""

from __future__ import annotations

from typing import Any

from . import regexes
from . import schema as z
from .schema import _UNSET, Check, Schema

_SCHEMA_URI = "https://json-schema.org/draft/2020-12/schema"


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def to_json_schema(schema: Schema, *, root: bool = True) -> dict:
    out = _encode(schema)
    if root:
        out = {"$schema": _SCHEMA_URI, **out}
    return out


def _encode(s: Schema) -> dict:
    k = s.kind
    out: dict[str, Any] = {}

    if k == "string":
        out["type"] = "string"
        _encode_string_checks(s, out)
    elif k == "integer":
        out["type"] = "integer"
        _encode_numeric_checks(s, out)
    elif k in ("float", "number", "decimal"):
        out["type"] = "number"
        _encode_numeric_checks(s, out)
    elif k in ("boolean", "string_boolean"):
        out["type"] = "boolean"
    elif k == "null":
        out["type"] = "null"
    elif k == "any" or k == "json":
        pass  # unconstrained schema
    elif k == "literal":
        out["const"] = s.params["value"]
    elif k == "enum":
        out["enum"] = [v for _k, v in s.params["pairs"]]
    elif k == "date":
        out = {"type": "string", "format": "date"}
    elif k == "time":
        out = {"type": "string", "format": "time"}
    elif k in ("datetime", "naive_datetime"):
        out = {"type": "string", "format": "date-time"}
    elif k == "array":
        out["type"] = "array"
        out["items"] = _encode(s.params["inner"])
        for chk in s.checks:
            if chk.kind == "gte":
                out["minItems"] = chk.params["value"]
            elif chk.kind == "lte":
                out["maxItems"] = chk.params["value"]
            elif chk.kind == "length":
                out["minItems"] = out["maxItems"] = chk.params["value"]
            elif chk.kind == "unique_items":
                out["uniqueItems"] = True
    elif k == "tuple":
        out["type"] = "array"
        out["prefixItems"] = [_encode(f) for f in s.params["fields"]]
        out["minItems"] = out["maxItems"] = len(s.params["fields"])
    elif k == "fields":
        out["type"] = "object"
        props = {}
        required = []
        for name, child in s.params["fields"].items():
            props[name] = _encode(child)
            if child.required is not False and child.default is _UNSET:
                required.append(name)
        out["properties"] = props
        if required:
            out["required"] = required
        if s.params.get("unrecognized") == "error":
            out["additionalProperties"] = False
    elif k == "map_kv":
        out["type"] = "object"
        out["additionalProperties"] = _encode(s.params["value"])
    elif k == "union":
        out["anyOf"] = [_encode(b) for b in s.params["schemas"]]
    elif k == "intersection":
        out["allOf"] = [_encode(b) for b in s.params["schemas"]]
    elif k == "discriminated_union":
        out["oneOf"] = [_encode(b) for b in s.params["lookup"].values()]
    elif k == "codec":
        out = _encode(s.params["from_schema"])
    elif k == "lazy":
        out = {}  # bounded recursion has no closed JSON form
    else:
        raise NotImplementedError(f"cannot encode kind {k!r} to JSON Schema")

    if s.nullable and "type" in out:
        out = {"anyOf": [{"type": "null"}, out]}
    if s.description:
        out["description"] = s.description
    if s.default is not _UNSET:
        out["default"] = s.default
    if s.example is not None:
        out["examples"] = [s.example]
    return out


_FORMAT_BY_PATTERN = {
    regexes.EMAIL: "email",
    regexes.uuid(): "uuid",
    regexes.IPV4: "ipv4",
    regexes.IPV6: "ipv6",
}


def _encode_string_checks(s: Schema, out: dict) -> None:
    for chk in s.checks + [e for t, e in s.effects if t == "check"]:
        if chk.kind == "gte":
            out["minLength"] = chk.params["value"]
        elif chk.kind == "lte":
            out["maxLength"] = chk.params["value"]
        elif chk.kind == "length":
            out["minLength"] = out["maxLength"] = chk.params["value"]
        elif chk.kind == "regex":
            fmt = _FORMAT_BY_PATTERN.get(chk.params["pattern"])
            named = chk.params.get("format")
            if named in ("email", "uuid", "ipv4", "ipv6") or fmt:
                out["format"] = named or fmt
            else:
                out["pattern"] = chk.params["pattern"]
        elif chk.kind == "url":
            out["format"] = "uri"
        elif chk.kind == "iso":
            out["format"] = {"date": "date", "time": "time",
                             "datetime": "date-time",
                             "naive_datetime": "date-time"}[chk.params["which"]]


def _encode_numeric_checks(s: Schema, out: dict) -> None:
    for chk in s.checks + [e for t, e in s.effects if t == "check"]:
        if chk.kind == "gte":
            out["minimum"] = chk.params["value"]
        elif chk.kind == "lte":
            out["maximum"] = chk.params["value"]
        elif chk.kind == "gt":
            out["exclusiveMinimum"] = chk.params["value"]
        elif chk.kind == "lt":
            out["exclusiveMaximum"] = chk.params["value"]
        elif chk.kind == "multiple_of":
            out["multipleOf"] = chk.params["value"]


# ---------------------------------------------------------------------------
# import
# ---------------------------------------------------------------------------

def from_json_schema(js: dict) -> Schema:
    if "const" in js:
        return z.literal(js["const"])
    if "enum" in js:
        return z.enum(js["enum"])
    if "anyOf" in js:
        branches = [from_json_schema(b) for b in js["anyOf"]]
        if len(branches) == 1:
            return branches[0]
        null_branches = [b for b in branches if b.kind == "null"]
        others = [b for b in branches if b.kind != "null"]
        if null_branches and len(others) == 1:
            return others[0].as_nullable()
        return z.union(branches)
    if "oneOf" in js:
        return z.union([from_json_schema(b) for b in js["oneOf"]])
    if "allOf" in js:
        branches = [from_json_schema(b) for b in js["allOf"]]
        return branches[0] if len(branches) == 1 else z.intersection(branches)

    t = js.get("type")
    if t == "string":
        fmt = js.get("format")
        if fmt == "email":
            s = z.email()
        elif fmt == "uuid":
            s = z.uuid()
        elif fmt == "uri":
            s = z.url()
        elif fmt == "ipv4":
            s = z.ipv4()
        elif fmt == "ipv6":
            s = z.ipv6()
        elif fmt == "date":
            s = z.iso_date()
        elif fmt == "time":
            s = z.iso_time()
        elif fmt == "date-time":
            s = z.iso_datetime()
        else:
            s = z.string()
        if "minLength" in js:
            s = s.gte(js["minLength"])
        if "maxLength" in js:
            s = s.lte(js["maxLength"])
        if "pattern" in js:
            s = s.regex(js["pattern"])
        return s
    if t == "integer":
        return _numeric(z.integer(), js)
    if t == "number":
        return _numeric(z.number(), js)
    if t == "boolean":
        return z.boolean()
    if t == "null":
        return z.null()
    if t == "array":
        inner = from_json_schema(js.get("items", {})) if js.get("items") \
            else z.any_()
        s = z.array(inner)
        if "minItems" in js:
            s = s.gte(js["minItems"])
        if "maxItems" in js:
            s = s.lte(js["maxItems"])
        if js.get("uniqueItems"):
            s = s._check("unique_items")
        return s
    if t == "object" or "properties" in js:
        required = set(js.get("required", []))
        fields = {}
        for name, sub in js.get("properties", {}).items():
            child = from_json_schema(sub)
            if name not in required:
                child = child.optional()
            fields[name] = child
        unrecognized = "error" if js.get("additionalProperties") is False \
            else "strip"
        return z.fields(fields, unrecognized=unrecognized)
    return z.any_()


def _numeric(s: Schema, js: dict) -> Schema:
    if "minimum" in js:
        s = s.gte(js["minimum"])
    if "maximum" in js:
        s = s.lte(js["maximum"])
    if "exclusiveMinimum" in js:
        s = s.gt(js["exclusiveMinimum"])
    if "exclusiveMaximum" in js:
        s = s.lt(js["exclusiveMaximum"])
    if "multipleOf" in js:
        s = s.multiple_of(js["multipleOf"])
    return s
