"""Human-readable schema docs + Spark DDL emission.

Mirrors ``Zoi.describe/1`` (``lib/zoi/describe.ex:95-110``) and
``Zoi.type_spec/2`` (``lib/zoi/type_spec.ex``): the former renders the
rule-set as markdown, the latter becomes StructType/DDL emission (the
Spark-world equivalent of an Elixir typespec).
"""

from __future__ import annotations

from pyspark.sql import types as T

from .schema import _UNSET, Schema

_TYPE_WORDS = {
    "string": "string", "integer": "integer", "float": "float",
    "number": "number", "boolean": "boolean",
    "string_boolean": "boolean-like string", "decimal": "decimal",
    "date": "date", "time": "time", "datetime": "datetime",
    "naive_datetime": "naive datetime", "null": "nil", "any": "any",
    "json": "json string",
}


def describe(schema: Schema, *, indent: int = 0) -> str:
    """Markdown description of a schema tree."""
    pad = "  " * indent
    lines: list[str] = []
    k = schema.kind

    def constraints() -> str:
        bits = []
        for chk in schema.checks + [e for t, e in schema.effects
                                    if t == "check"]:
            p = dict(chk.params)
            p.pop("fn", None)
            arg = ", ".join(f"{kk}={vv!r}" for kk, vv in p.items())
            bits.append(f"{chk.kind}({arg})" if arg else chk.kind)
        for t, e in schema.effects:
            if t == "transform":
                bits.append(f"transform:{e.kind}")
        if schema.nullable:
            bits.append("nullable")
        if schema.required is False:
            bits.append("optional")
        if schema.default is not _UNSET:
            bits.append(f"default={schema.default!r}")
        return ("  — " + "; ".join(bits)) if bits else ""

    if k == "fields":
        lines.append(f"{pad}- object ({len(schema.params['fields'])} fields)"
                     + constraints())
        for name, child in schema.params["fields"].items():
            lines.append(f"{pad}  - **{name}**:")
            lines.append(describe(child, indent=indent + 2))
        return "\n".join(lines)
    if k == "array":
        lines.append(f"{pad}- array{constraints()}")
        lines.append(describe(schema.params["inner"], indent=indent + 1))
        return "\n".join(lines)
    if k == "tuple":
        lines.append(f"{pad}- tuple[{len(schema.params['fields'])}]")
        for i, child in enumerate(schema.params["fields"]):
            lines.append(describe(child, indent=indent + 1))
        return "\n".join(lines)
    if k == "enum":
        vals = ", ".join(str(v) for _k, v in schema.params["pairs"])
        return f"{pad}- enum of [{vals}]{constraints()}"
    if k == "literal":
        return f"{pad}- literal `{schema.params['value']!r}`"
    if k in ("union", "intersection"):
        word = "any of" if k == "union" else "all of"
        lines.append(f"{pad}- {word}:")
        for b in schema.params["schemas"]:
            lines.append(describe(b, indent=indent + 1))
        return "\n".join(lines)
    if k == "discriminated_union":
        lines.append(f"{pad}- one of (by `{schema.params['discriminator']}`):")
        for key, b in schema.params["lookup"].items():
            lines.append(f"{pad}  - `{key}`:")
            lines.append(describe(b, indent=indent + 2))
        return "\n".join(lines)
    if k == "map_kv":
        lines.append(f"{pad}- map of:")
        lines.append(describe(schema.params["key"], indent=indent + 1))
        lines.append(describe(schema.params["value"], indent=indent + 1))
        return "\n".join(lines)

    word = _TYPE_WORDS.get(k, k)
    desc = f" — {schema.description}" if schema.description else ""
    return f"{pad}- {word}{constraints()}{desc}"


def to_struct_type(schema: Schema) -> T.StructType:
    """Target StructType of a fields schema (the typespec analogue)."""
    if schema.kind != "fields":
        raise ValueError("to_struct_type requires a fields schema")
    out = []
    for name, child in schema.params["fields"].items():
        nullable = child.required is False or child.nullable
        out.append(T.StructField(name, _leaf_type(child), nullable))
    return T.StructType(out)


def to_ddl(schema: Schema) -> str:
    return to_struct_type(schema).simpleString()[7:-1].replace(",", ", ") \
        if False else ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            + ("" if f.nullable else " NOT NULL")
            for f in to_struct_type(schema).fields)


def _leaf_type(s: Schema) -> T.DataType:
    k = s.kind
    if k == "fields":
        return to_struct_type(s)
    if k == "array":
        return T.ArrayType(_leaf_type(s.params["inner"]))
    if k == "tuple":
        return T.StructType([
            T.StructField(f"_{i}", _leaf_type(c), True)
            for i, c in enumerate(s.params["fields"])])
    if k == "map_kv":
        return T.MapType(_leaf_type(s.params["key"]),
                         _leaf_type(s.params["value"]))
    if k in ("union",):
        inner = {_leaf_type(b).simpleString() for b in s.params["schemas"]}
        return (_leaf_type(s.params["schemas"][0]) if len(inner) == 1
                else T.StringType())
    if k == "intersection":
        return _leaf_type(s.params["schemas"][-1])
    if k == "enum":
        keys = [kk for kk, _v in s.params["pairs"]]
        return T.LongType() if all(isinstance(x, int) for x in keys) \
            else T.StringType()
    return {
        "string": T.StringType(), "integer": T.LongType(),
        "float": T.DoubleType(), "number": T.DoubleType(),
        "boolean": T.BooleanType(), "string_boolean": T.BooleanType(),
        "decimal": T.DecimalType(s.params.get("precision", 38),
                                 s.params.get("scale", 18))
        if k == "decimal" else None,
        "date": T.DateType(), "time": T.StringType(),
        "datetime": T.TimestampType(), "naive_datetime": T.TimestampType(),
        "null": T.NullType(), "any": T.StringType(), "json": T.StringType(),
        "literal": T.StringType(), "lazy": T.StringType(),
        "codec": T.StringType(),
    }.get(k) or T.StringType()


def schema_diff(old: Schema, new: Schema) -> "list[dict]":
    """Rule-set evolution diff — the release gate for schema changes:
    compares two flat ``fields`` schemas and reports every change as
    ``{path, change, detail, breaking}``, where ``breaking`` means
    "rows that passed the old rule-set can now fail" (the reader-side
    compatibility question; relaxations are non-breaking):

    - ``field_added`` — breaking iff the new field is required with no
      default (previously-valid rows lack it)
    - ``field_removed`` — non-breaking for validation (extra columns
      follow the fields-mode policy, not a rule)
    - ``type_changed`` — always breaking
    - ``check_added`` — breaking (tightens); ``check_removed`` —
      non-breaking (loosens). A changed parameter reports as one
      removed + one added entry (multiset diff — deterministic, no
      same-kind pairing heuristics)
    - ``required_added``/``required_removed``, ``nullable_added``/
      ``nullable_removed``, ``default_added``/``default_removed``

    Metadata-sized driver-side computation (a schema has hundreds of
    rules, not 10^12) — returns plain rows; build a DataFrame if a
    report artifact is needed."""
    if old.kind != "fields" or new.kind != "fields":
        raise ValueError("schema_diff compares z.fields(...) schemas, "
                         f"got {old.kind!r} vs {new.kind!r}")
    out: list[dict] = []

    def row(path, change, detail, breaking):
        out.append({"path": path, "change": change,
                    "detail": detail, "breaking": bool(breaking)})

    of, nf = old.params["fields"], new.params["fields"]
    for name in sorted(set(of) | set(nf)):
        if name not in of:
            child = nf[name]
            req = (child.required is not False and not child.nullable
                   and child.default is _UNSET)
            row(name, "field_added", f"kind={child.kind}", req)
            continue
        if name not in nf:
            row(name, "field_removed", f"kind={of[name].kind}", False)
            continue
        o, n = of[name], nf[name]
        if o.kind != n.kind:
            row(name, "type_changed", f"{o.kind} -> {n.kind}", True)

        def key(chk):
            p = {k: v for k, v in dict(chk.params).items() if k != "fn"}
            return (chk.kind,
                    tuple(sorted((k, repr(v)) for k, v in p.items())))

        oc = {key(c) for c in o.checks}
        nc = {key(c) for c in n.checks}
        for k in sorted(nc - oc):
            row(name, "check_added",
                k[0] + "(" + ", ".join(f"{a}={b}" for a, b in k[1]) + ")",
                True)
        for k in sorted(oc - nc):
            row(name, "check_removed",
                k[0] + "(" + ", ".join(f"{a}={b}" for a, b in k[1]) + ")",
                False)
        o_req = o.required is not False and not o.nullable
        n_req = n.required is not False and not n.nullable
        if n_req and not o_req:
            row(name, "required_added", "", True)
        if o_req and not n_req:
            row(name, "required_removed", "", False)
        if n.nullable and not o.nullable:
            row(name, "nullable_added", "", False)
        if o.nullable and not n.nullable:
            row(name, "nullable_removed", "", True)
        if o.default is _UNSET and n.default is not _UNSET:
            row(name, "default_added", repr(n.default), False)
        if o.default is not _UNSET and n.default is _UNSET:
            row(name, "default_removed", repr(o.default), False)
    return out
