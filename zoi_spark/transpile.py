"""Rule-set → ANSI/DuckDB SQL transpilation — the interop mirror of
the compiler: where ``zoi_spark.compile`` lowers a declared schema to
Spark Column predicates, this emits the SAME violation semantics as
portable SQL, so one rule-set can gate a Spark pipeline AND run as a
data-quality query in DuckDB / Trino / a warehouse — or serve as its
own independent cross-engine check (the repo's DuckDB oracles for the
validate queries are exactly this shape, hand-written; this module
generates them).

Violation semantics match the compiled validator row-for-row
(reference: constraint evaluation lib/zoi/validations.ex:10-28, error
naming lib/zoi/error.ex):

- a required, non-nullable, non-defaulted field violates
  ``{field}.required`` when NULL (compile.py ``_wrap_field_node``)
- every check evaluates only on non-NULL values:
  ``{field} IS NOT NULL AND NOT (pred)`` — the compiled
  ``guard & ~coalesce(pred, false)`` gate on a typed column
- string-kind measures are ``length()``, numeric measures the value
  itself (compile.py ``_measure``)
- rule ids are ``{field}.{check_kind}`` with ``#n`` suffixes for
  repeats — identical to ``CompileCtx.rule_id``

SCOPE (honest subset, validated loudly): flat ``fields`` schemas of
scalar types over a TYPED table whose column types already match the
declaration (the Spark validator's no-coercion fast path). Transforms,
refinements, codecs, nested/composite types and format checks raise —
they need an expression engine, not a string template.
"""

from __future__ import annotations

from .schema import _UNSET, Schema

_NUMERIC_KINDS = {"integer", "float", "number", "decimal"}
_SCALAR_KINDS = _NUMERIC_KINDS | {"string", "boolean"}
_SUPPORTED_CHECKS = {"gte", "lte", "gt", "lt", "length", "multiple_of",
                     "regex", "starts_with", "ends_with", "one_of"}


def _q(v) -> str:
    """SQL literal for a python value (single-quote doubling)."""
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "true" if v else "false"
    return repr(v)


def _measure(kind: str, col: str) -> str:
    return f"length({col})" if kind == "string" else col


def _check_sql(kind: str, chk, col: str) -> str:
    """Passing predicate for one check, as SQL (mirrors
    compile._check_pred_and_spec)."""
    p = dict(chk.params)
    k = chk.kind
    m = _measure(kind, col)
    if k == "gte":
        return f"{m} >= {_q(p['value'])}"
    if k == "lte":
        return f"{m} <= {_q(p['value'])}"
    if k == "gt":
        return f"{m} > {_q(p['value'])}"
    if k == "lt":
        return f"{m} < {_q(p['value'])}"
    if k == "length":
        return f"{m} = {_q(p['value'])}"
    if k == "multiple_of":
        v = p["value"]
        if kind in ("float", "number", "decimal") and not (
                isinstance(v, int) and kind == "number"):
            return f"({col} / {_q(v)}) = floor({col} / {_q(v)})"
        return f"({col} % {_q(v)}) = 0"
    if k == "regex":
        return f"regexp_matches({col}, {_q(p['pattern'])})"
    if k == "starts_with":
        return f"starts_with({col}, {_q(p['value'])})"
    if k == "ends_with":
        return f"ends_with({col}, {_q(p['value'])})"
    if k == "one_of":
        vals = ", ".join(_q(v) for v in p["values"])
        return f"{col} IN ({vals})"
    raise AssertionError(k)


def sql_rules(schema: Schema) -> "list[tuple[str, str, str]]":
    """Transpile a flat fields schema to ``(rule_id, field,
    violation_condition)`` triples; the condition is TRUE exactly when
    the compiled Spark validator emits that violation row for a typed
    input. Raises ``ValueError`` for anything outside the documented
    subset, naming the unsupported feature — silent semantic drift
    between the two backends is the one unforgivable failure here."""
    if schema.kind != "fields":
        raise ValueError("sql_rules: top level must be z.fields(...), "
                         f"got {schema.kind!r}")
    if schema.checks or schema.effects:
        raise ValueError("sql_rules: fields-level checks/refinements "
                         "are not SQL-transpilable")
    counters: dict[str, int] = {}

    def rid(field: str, kind: str) -> str:
        base = f"{field}.{kind}"
        n = counters.get(base, 0)
        counters[base] = n + 1
        return base if n == 0 else f"{base}#{n}"

    out: list[tuple[str, str, str]] = []
    for name, child in schema.params["fields"].items():
        if child.kind not in _SCALAR_KINDS:
            raise ValueError(f"sql_rules: field {name!r} has kind "
                             f"{child.kind!r}; only scalar kinds "
                             f"{sorted(_SCALAR_KINDS)} transpile")
        if child.effects:
            kinds = [t for t, _ in child.effects]
            raise ValueError(f"sql_rules: field {name!r} carries "
                             f"effects {kinds}; transforms/refinements "
                             "are not SQL-transpilable")
        for chk in child.checks:
            if chk.kind not in _SUPPORTED_CHECKS:
                raise ValueError(f"sql_rules: field {name!r} check "
                                 f"{chk.kind!r} is not SQL-transpilable")
        # the compiled validator registers child checks before the
        # field's required rule, but ids only collide per (field, kind)
        # so emission order here is free; keep required first for
        # readability
        if (child.required is not False and not child.nullable
                and child.default is _UNSET):
            out.append((rid(name, "required"), name, f"{name} IS NULL"))
        for chk in child.checks:
            pred = _check_sql(child.kind, chk, name)
            out.append((rid(name, chk.kind
                            if chk.kind != "regex"
                            else dict(chk.params).get("format")
                            or "regex"),
                        name,
                        f"{name} IS NOT NULL AND NOT ({pred})"))
    return out


def violations_sql(schema: Schema, *, table: str, id_col: str) -> str:
    """Assemble the full violation query — ``(id, rule_id)`` rows, one
    UNION ALL branch per rule, each a filter the engine can push into
    the scan. This is the deployable artifact: run it in any SQL
    engine over the same table the Spark validator reads and diff the
    row sets (they must be identical)."""
    rules = sql_rules(schema)
    branches = [
        f"SELECT {id_col}, '{rule_id}' AS rule_id FROM {table}\n"
        f"  WHERE {cond}"
        for rule_id, _f, cond in rules]
    return "SELECT * FROM (\n" + "\nUNION ALL\n".join(branches) + "\n)"
