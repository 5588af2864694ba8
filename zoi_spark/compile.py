"""Schema IR → Spark expressions. Compile once on the driver, run JVM-side.

The reference interprets its schema tree per value via protocol dispatch
(``lib/zoi/context.ex:39-79``). We instead compile the whole tree ONCE
into:

* a parsed-value ``Column`` expression per field (guarded casts +
  chain-ordered transforms),
* one ``array<struct<i,p,m>>`` error expression (rule ordinal +
  dynamic path/message only) that evaluates every rule per row and
  collects ALL failures (matching the collect-all semantics of
  ``lib/zoi/validations.ex:10-28`` and ``lib/zoi/types/meta.ex:62-95``)
  — static rule text is broadcast-joined back in the violations view,
* a static rule catalog for describe/JSON-Schema export.

Everything stays inside Catalyst whole-stage codegen except custom
``refine(engine='pandas')`` predicates, which become Arrow-vectorized
``pandas_udf`` batches — never per-row Python (BASELINE.json input_hint).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import errors as E
from . import regexes
from .schema import _UNSET, Check, Schema, Transform

# Hot-path error cell: rule ordinal + ONLY the dynamic parts (path with
# runtime array indexes / map keys, dynamic message), null for the
# common static case. rule_id/code/static path/static message live in
# the driver-side rule catalog and are joined back (broadcast) when the
# violations view is built — per-row state stays a few bytes and the
# generated code stays small enough for HotSpot to JIT (a
# struct<4 strings> per rule measured 15-30× slower first-run from
# bytecode-interpreted whole-stage methods).
ERROR_DDL = "struct<i:int,p:array<string>,m:string>"
ERROR_ARRAY_DDL = f"array<{ERROR_DDL}>"

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType)

# Days from proleptic-gregorian year 0 to 1970-01-01 (Elixir
# Date.from_gregorian_days frame of reference, types/date.ex:67-80).
_GREGORIAN_EPOCH_DAYS = 719_528
_GREGORIAN_EPOCH_SECONDS = 62_167_219_200


@dataclass(frozen=True)
class RuleInfo:
    """Static catalog entry for one compiled rule."""

    rule_id: str
    code: str
    path: tuple
    message: str
    kind: str
    params: dict = dc_field(default_factory=dict)


@dataclass
class Node:
    """Result of compiling one schema node against one input column."""

    value: Column          # parsed (cast + transformed) value
    errors: Column         # array<ERROR_DDL>, already fully guarded
    out_type: T.DataType   # best-effort parsed type


class CompileCtx:
    def __init__(self) -> None:
        self._rule_ids: dict[str, int] = {}
        self.rules: list[RuleInfo] = []

    def rule_id(self, path: Sequence[Any], kind: str) -> str:
        # dynamic components (runtime array indexes / map keys, carried
        # as Columns) render as '*' — one rule id per RULE, not per key
        parts = [p if isinstance(p, str)
                 else ("*" if isinstance(p, Column) else str(p))
                 for p in path]
        base = ".".join(parts) if parts else "$"
        rid = f"{base}.{kind}"
        n = self._rule_ids.get(rid, 0)
        self._rule_ids[rid] = n + 1
        return rid if n == 0 else f"{rid}#{n}"

    def register(self, rule_id: str, spec: E.ErrorSpec, path: Sequence[Any],
                 kind: str, params: dict | None = None) -> int:
        """Add a catalog entry; returns the rule's ordinal (the ``i``
        stored in error cells). Dynamic path components (runtime array
        indexes / map keys) are cataloged as ``*`` — the error cell's
        ``p`` carries the concrete path for those rules."""
        display = tuple(p if isinstance(p, str)
                        else ("*" if isinstance(p, Column) else str(p))
                        for p in path)
        self.rules.append(RuleInfo(rule_id, spec.code, display,
                                   spec.message, kind, dict(params or {})))
        return len(self.rules) - 1


def _empty_errors() -> Column:
    return F.array().cast(ERROR_ARRAY_DDL)


def _mk_error(ordinal: int, path: Sequence[Any] = (),
              message_col: Column | None = None) -> Column:
    """Error cell: ordinal + dynamic path (only when a component is a
    runtime Column) + dynamic message (only when rule text depends on
    row values). Everything static lives in the rule catalog."""
    dynamic_path = any(isinstance(c, Column) for c in path)
    p = (F.array(*_path_lits(path)) if dynamic_path
         else F.lit(None).cast("array<string>"))
    m = message_col if message_col is not None else F.lit(None).cast("string")
    return F.struct(F.lit(ordinal).alias("i"), p.alias("p"), m.alias("m"))


def _collect(maybe_errs: Sequence[tuple[Column, Column]]) -> Column:
    """Batch (condition, error-struct) pairs into one array.

    Deliberately pure CASE WHEN + concat — NO higher-order
    ``F.filter(F.array(...), lambda)``: higher-order functions are
    CodegenFallback, and one appearing in a Filter/Generate (e.g.
    ``where(~valid)`` or ``explode(errors)``, where CollapseProject
    inlines this whole expression) knocks the stage out of whole-stage
    codegen → interpreted per-row evaluation, measured ~100× slower on
    the violations path."""
    if not maybe_errs:
        return _empty_errors()
    parts = [F.when(cond, F.array(err)).otherwise(_empty_errors())
             for cond, err in maybe_errs]
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def _concat_err_arrays(arrays: Sequence[Column]) -> Column:
    arrays = [a for a in arrays if a is not None]
    if not arrays:
        return _empty_errors()
    if len(arrays) == 1:
        return arrays[0]
    return F.concat(*arrays)


def _path_lits(path: Sequence[Any]) -> list[Column]:
    return [p if isinstance(p, Column) else F.lit(str(p)) for p in path]


def _nil_on_any(value: Column, fail_conds: Sequence[Column]) -> Column:
    """Parsed-nil contract for node-level effect errors (meta.ex
    run_effects -> {ctx | parsed: nil}): nil the parsed value when any
    failure predicate holds — the single gate both the scalar-combinator
    and fields paths must share."""
    if not fail_conds:
        return value
    any_fail = fail_conds[0]
    for c in fail_conds[1:]:
        any_fail = any_fail | c
    return F.when(~F.coalesce(any_fail, F.lit(False)), value)


def _safe_not(pred: Column) -> Column:
    # a null predicate counts as a failure (value escaped its guards)
    return ~F.coalesce(pred, F.lit(False))


# ---------------------------------------------------------------------------
# type parsing: (typed value, type_ok, type ErrorSpec) per kind × input type
# ---------------------------------------------------------------------------

def _type_stage(schema: Schema, col: Column, itype: T.DataType
                ) -> tuple[Column, Column, E.ErrorSpec | None, T.DataType]:
    """Guarded cast per SURVEY §1.3: Spark casts are lenient, the
    reference rejects trailing garbage — so string coercions are
    regex-guarded (types/integer.ex:66-71 etc.)."""
    kind, coerce, err = schema.kind, schema.coerce, schema.error
    TRUE = F.lit(True)
    FALSE = F.lit(False)

    if kind == "string":
        if isinstance(itype, T.StringType):
            return col, TRUE, None, T.StringType()
        if coerce and isinstance(itype, T.BinaryType):
            return F.decode(col, "UTF-8"), TRUE, None, T.StringType()
        if coerce and isinstance(itype, (T.NumericType, T.BooleanType,
                                         T.DateType, T.TimestampType)):
            return col.cast("string"), TRUE, None, T.StringType()
        return col.cast("string"), FALSE, E.invalid_type("string", error=err), T.StringType()

    if kind == "integer":
        if isinstance(itype, _INTEGRAL):
            return col.cast("long"), TRUE, None, T.LongType()
        if coerce and isinstance(itype, T.StringType):
            ok = col.rlike(regexes.INTEGER_STRICT)
            return F.when(ok, col.cast("long")), ok, E.invalid_type("integer", error=err), T.LongType()
        return F.lit(None).cast("long"), FALSE, E.invalid_type("integer", error=err), T.LongType()

    if kind == "float":
        # the reference rejects integers for float/1 (types/float.ex:64-73)
        if isinstance(itype, _FRACTIONAL):
            return col.cast("double"), TRUE, None, T.DoubleType()
        if coerce and isinstance(itype, T.StringType):
            ok = col.rlike(regexes.FLOAT_STRICT)
            return F.when(ok, col.cast("double")), ok, E.invalid_type("float", error=err), T.DoubleType()
        return F.lit(None).cast("double"), FALSE, E.invalid_type("float", error=err), T.DoubleType()

    if kind == "number":
        if isinstance(itype, (T.NumericType,)):
            return col, TRUE, None, itype
        if coerce and isinstance(itype, T.StringType):
            ok = col.rlike(regexes.FLOAT_STRICT)
            return F.when(ok, col.cast("double")), ok, E.invalid_type("number", error=err), T.DoubleType()
        return F.lit(None).cast("double"), FALSE, E.invalid_type("number", error=err), T.DoubleType()

    if kind == "boolean":
        if isinstance(itype, T.BooleanType):
            return col, TRUE, None, T.BooleanType()
        if coerce and isinstance(itype, T.StringType):
            # only exact "true"/"false" (types/boolean.ex:21-29)
            ok = col.isin("true", "false")
            return F.when(ok, col == F.lit("true")), ok, E.invalid_type("boolean", error=err), T.BooleanType()
        return F.lit(None).cast("boolean"), FALSE, E.invalid_type("boolean", error=err), T.BooleanType()

    if kind == "string_boolean":
        spec = E.invalid_type("string_boolean",
                              issue="invalid type: expected string boolean",
                              error=err)
        if isinstance(itype, T.BooleanType):
            return col, TRUE, None, T.BooleanType()
        if isinstance(itype, T.StringType):
            cased = F.lower(col) if schema.params["case"] == "insensitive" else col
            truthy = [t.lower() if schema.params["case"] == "insensitive" else t
                      for t in schema.params["truthy"]]
            falsy = [t.lower() if schema.params["case"] == "insensitive" else t
                     for t in schema.params["falsy"]]
            ok = cased.isin(*(truthy + falsy))
            return F.when(ok, cased.isin(*truthy)), ok, spec, T.BooleanType()
        return F.lit(None).cast("boolean"), FALSE, spec, T.BooleanType()

    if kind == "literal":
        v = schema.params["value"]
        ok = col.eqNullSafe(F.lit(v)) if v is None else (col == F.lit(v))
        return col, ok, E.invalid_literal(v, error=err), itype

    if kind == "null":
        return col, col.isNull(), E.invalid_type("nil", error=err), itype

    if kind == "any":
        return col, TRUE, None, itype

    if kind == "enum":
        pairs = schema.params["pairs"]
        values = [v for _k, v in pairs]
        keys = [k for k, _v in pairs]
        member = col.isin(*values)
        if coerce:
            member = member | col.isin(*keys)
        # parse remaps value→key (types/enum.ex:53-66)
        remap = None
        for k, v in pairs:
            cond = (col == F.lit(v)) | ((col == F.lit(k)) if coerce else F.lit(False))
            remap = F.when(cond, F.lit(k)) if remap is None else remap.when(cond, F.lit(k))
        return remap, member, E.invalid_enum_value(values, error=err), itype

    if kind == "date":
        if isinstance(itype, T.DateType):
            return col, TRUE, None, T.DateType()
        spec = E.invalid_type("date", error=err)
        if coerce and isinstance(itype, T.StringType):
            # try_to_timestamp: ANSI mode makes plain to_date THROW on
            # '2024-13-01'; validation must classify, never abort
            parsed = F.try_to_timestamp(col, F.lit("yyyy-MM-dd")).cast("date")
            ok = col.rlike(regexes.ISO_DATE) & parsed.isNotNull()
            return F.when(ok, parsed), ok, spec, T.DateType()
        if coerce and isinstance(itype, _INTEGRAL):
            # gregorian days from year 0 (types/date.ex:67-80)
            val = F.date_add(F.lit("1970-01-01").cast("date"),
                             (col - F.lit(_GREGORIAN_EPOCH_DAYS)).cast("int"))
            return val, TRUE, None, T.DateType()
        return F.lit(None).cast("date"), FALSE, spec, T.DateType()

    if kind == "time":
        # Spark has no TimeType: a validated ISO time stays a string
        spec = E.invalid_type("time", error=err)
        if isinstance(itype, T.StringType):
            ok = col.rlike(regexes.ISO_TIME)
            return F.when(ok, col), ok, spec, T.StringType()
        return F.lit(None).cast("string"), FALSE, spec, T.StringType()

    if kind in ("datetime", "naive_datetime"):
        spec = E.invalid_type(kind, error=err)
        if isinstance(itype, (T.TimestampType, T.TimestampNTZType)):
            return col, TRUE, None, itype
        if coerce and isinstance(itype, T.StringType):
            pat = regexes.ISO_DATETIME if kind == "datetime" else regexes.ISO_NAIVE_DATETIME
            ts = F.try_to_timestamp(F.replace(col, F.lit("T"), F.lit(" ")))
            ok = col.rlike(pat) & ts.isNotNull()
            return F.when(ok, ts), ok, spec, T.TimestampType()
        if coerce and isinstance(itype, _INTEGRAL):
            if kind == "datetime":  # unix seconds (types/datetime.ex:67-87)
                return F.timestamp_seconds(col), TRUE, None, T.TimestampType()
            # gregorian seconds from year 0 (types/naive_datetime.ex:67-81)
            return (F.timestamp_seconds(col - F.lit(_GREGORIAN_EPOCH_SECONDS)),
                    TRUE, None, T.TimestampType())
        return F.lit(None).cast("timestamp"), FALSE, spec, T.TimestampType()

    if kind == "decimal":
        p, s = schema.params["precision"], schema.params["scale"]
        ddl = f"decimal({p},{s})"
        spec = E.invalid_type("decimal", error=err)
        if isinstance(itype, T.DecimalType):
            return col.cast(ddl), TRUE, None, T.DecimalType(p, s)
        if coerce and isinstance(itype, (T.NumericType,)):
            return col.cast(ddl), TRUE, None, T.DecimalType(p, s)
        if coerce and isinstance(itype, T.StringType):
            parsed = col.try_cast(ddl)  # ANSI cast would throw on junk
            ok = col.rlike(regexes.FLOAT_STRICT) & parsed.isNotNull()
            return F.when(ok, parsed), ok, spec, T.DecimalType(p, s)
        return F.lit(None).cast(ddl), FALSE, spec, T.DecimalType(p, s)

    if kind == "json":
        spec = E.invalid_type("json", error=err)
        if isinstance(itype, T.StringType):
            # JVM-side parse probe (Spark 4 variant type); value kept as
            # the original string — a true recursive type is impossible
            # in Spark SQL (SURVEY §1.3 json row)
            if hasattr(F, "try_parse_json"):
                ok = F.try_parse_json(col).isNotNull()
            else:
                ok = F.trim(col).rlike(
                    r'^(\{.*\}|\[.*\]|".*"|-?\d+(\.\d+)?([eE][+-]?\d+)?|true|false|null)$')
            return col, ok, spec, T.StringType()
        return col.cast("string"), FALSE, spec, T.StringType()

    # custom-type extension point (Zoi.Type analogue — lib/zoi/
    # type.ex:1-62): registered kinds plug in their own type stage;
    # every downstream stage (checks, effects, meta, error collection,
    # parsed-nil gating) composes on top unchanged
    from .schema import _CUSTOM_KINDS
    hook = _CUSTOM_KINDS.get(kind)
    if hook is not None:
        return hook(schema, col, itype)

    raise NotImplementedError(f"no type stage for kind={kind!r}")


# ---------------------------------------------------------------------------
# checks
# ---------------------------------------------------------------------------

def _measure(kind: str, value: Column, length_mode: str = "chars") -> Column:
    """What comparisons measure: strings their length (codepoints by
    default; extended grapheme clusters with ``length_mode='grapheme'``
    — the reference's String.length/1 semantics, via an Arrow batch),
    arrays their size, everything else the value itself (SURVEY §2.2)."""
    if kind == "string":
        if length_mode == "grapheme":
            from .text import grapheme_count
            return grapheme_count(value)
        return F.length(value)
    if kind == "array":
        return F.size(value)
    return value


def _check_pred_and_spec(schema_kind: str, chk: Check, value: Column,
                         length_mode: str = "chars"
                         ) -> tuple[Column, E.ErrorSpec, Column | None]:
    """Returns (passing predicate, error spec, dynamic message or None)."""
    p = chk.params
    err = chk.error
    k = chk.kind

    if k == "gte":
        return (_measure(schema_kind, value, length_mode) >= F.lit(p["value"]),
                E.greater_than_or_equal_to(schema_kind, p["value"], error=err), None)
    if k == "lte":
        return (_measure(schema_kind, value, length_mode) <= F.lit(p["value"]),
                E.less_than_or_equal_to(schema_kind, p["value"], error=err), None)
    if k == "gt":
        return (_measure(schema_kind, value, length_mode) > F.lit(p["value"]),
                E.greater_than(schema_kind, p["value"], error=err), None)
    if k == "lt":
        return (_measure(schema_kind, value, length_mode) < F.lit(p["value"]),
                E.less_than(schema_kind, p["value"], error=err), None)
    if k == "length":
        return (_measure(schema_kind, value, length_mode) == F.lit(p["value"]),
                E.invalid_length(schema_kind, p["value"], error=err), None)
    if k == "multiple_of":
        v = p["value"]
        if schema_kind in ("float", "number", "decimal") and not (
                isinstance(v, int) and schema_kind == "number"):
            q = value / F.lit(v)
            pred = q == F.floor(q)
        else:
            pred = value % F.lit(v) == F.lit(0)
        return pred, E.multiple_of(v, error=err), None
    if k == "regex":
        fmt = p.get("format")
        spec = E.invalid_format(p["pattern"], error=err)
        return value.rlike(p["pattern"]), spec, None
    if k == "starts_with":
        return (value.startswith(p["value"]),
                E.invalid_starting_string(p["value"], error=err), None)
    if k == "ends_with":
        return (value.endswith(p["value"]),
                E.invalid_ending_string(p["value"], error=err), None)
    if k == "one_of":
        return (value.isin(*p["values"]),
                E.not_in_values(p["values"], error=err), None)
    if k == "unique_items":
        return (F.size(F.array_distinct(value)) == F.size(value),
                E.not_unique(error=err), None)
    if k == "url":
        # scheme http/https AND host present (types/string.ex:121-131);
        # try_parse_url: plain parse_url THROWS on malformed urls in
        # ANSI mode — a validator must classify, never abort
        host = F.try_parse_url(value, F.lit("HOST"))
        proto = F.try_parse_url(value, F.lit("PROTOCOL"))
        pred = host.isNotNull() & (host != F.lit("")) & proto.isin("http", "https")
        return pred, E.invalid_url(error=err), None
    if k == "iso":
        which = p["which"]
        pats = {"date": regexes.ISO_DATE, "time": regexes.ISO_TIME,
                "datetime": regexes.ISO_DATETIME,
                "naive_datetime": regexes.ISO_NAIVE_DATETIME}
        probe = {
            "date": lambda c: F.try_to_timestamp(
                c, F.lit("yyyy-MM-dd")).isNotNull(),
            "time": lambda c: F.lit(True),
            "datetime": lambda c: F.try_to_timestamp(
                F.replace(c, F.lit("T"), F.lit(" "))).isNotNull(),
            "naive_datetime": lambda c: F.try_to_timestamp(
                F.replace(c, F.lit("T"), F.lit(" "))).isNotNull(),
        }[which]
        spec = E.invalid_format(pats[which],
                                internal_message=f"invalid format: must be a valid ISO {which}",
                                error=err)
        return value.rlike(pats[which]) & probe(value), spec, None
    if k == "refine":
        spec = E.custom_error(p.get("message", "is invalid"))
        fn = p["fn"]
        if p.get("engine") == "expr":
            return F.coalesce(fn(value), F.lit(False)), spec, None
        # Arrow-vectorized batch predicate — the only Python in the plan
        udf = F.pandas_udf(fn, T.BooleanType())
        return udf(value), spec, None

    raise NotImplementedError(f"unknown check kind: {k}")


def _apply_transform(t: Transform, value: Column, out_type: T.DataType) -> Column:
    if t.kind == "trim":
        return F.trim(value)
    if t.kind == "to_downcase":
        return F.lower(value)
    if t.kind == "to_upcase":
        return F.upper(value)
    if t.kind == "expr":
        return t.fn(value)
    if t.kind == "pandas":
        udf = F.pandas_udf(t.fn, out_type)
        return udf(value)
    raise NotImplementedError(f"unknown transform kind: {t.kind}")


# ---------------------------------------------------------------------------
# node compiler
# ---------------------------------------------------------------------------

def compile_node(ctx: CompileCtx, schema: Schema, col: Column,
                 itype: T.DataType, path: tuple, guard: Column,
                 allow_pandas: bool = True) -> Node:
    """Compile one node. ``guard`` gates every emitted error (used by
    union branches, discriminated dispatch and default short-circuit).
    ``allow_pandas=False`` inside array lambdas, where pandas_udf cannot
    be applied to lambda variables."""
    kind = schema.kind

    if kind == "lazy":
        return _compile_lazy(ctx, schema, col, itype, path, guard, allow_pandas)
    if kind == "fields":
        return _compile_fields(ctx, schema, col, itype, path, guard, allow_pandas)
    if kind == "array":
        return _compile_array(ctx, schema, col, itype, path, guard)

    if kind in ("tuple", "map_kv", "union", "intersection",
                "discriminated_union", "codec"):
        fn = {"tuple": _compile_tuple, "union": _compile_union,
              "intersection": _compile_intersection,
              "discriminated_union": _compile_discriminated,
              "codec": _compile_codec}.get(kind)
        node = (_compile_map_kv(ctx, schema, col, itype, path, guard)
                if kind == "map_kv"
                else fn(ctx, schema, col, itype, path, guard, allow_pandas))
        return _apply_post_effects(ctx, schema, node, path, guard)

    return _compile_scalar(ctx, schema, col, itype, path, guard, allow_pandas)


def _apply_post_effects(ctx: CompileCtx, schema: Schema, node: Node,
                        path: tuple, guard: Column) -> Node:
    """Node-level refinements/transforms on combinator schemas (union /
    intersection / discriminated union / tuple / map k-v / codec):
    Zoi's effect chain is universal (meta on every type), runs over the
    PARSED value and only when the type parse succeeded
    (lib/zoi/context.ex:42-44). Expression engine only — the value is a
    combinator output, and cross-value predicates are plain Column
    expressions."""
    if not schema.checks and not schema.effects:
        return node
    value = node.value
    err_arrays = [node.errors]
    maybe: list[tuple[Column, Column]] = []
    fail_conds: list[Column] = []
    gate = guard & (F.size(node.errors) == 0)

    def emit(chk: Check, current: Column) -> None:
        if chk.kind not in ("refine", "refine_ctx"):
            raise NotImplementedError(
                f"check '{chk.kind}' does not apply to a {schema.kind} "
                "schema; use refine/refine_ctx")
        if chk.params.get("engine") != "expr":
            raise NotImplementedError(
                f"{schema.kind}-level refinements must use engine='expr'")
        if chk.kind == "refine":
            spec = E.custom_error(chk.params.get("message", "is invalid"))
            rid = ctx.rule_id(path, "refine")
            _ord = ctx.register(rid, spec, path, "refine", dict(chk.params))
            pred = F.coalesce(chk.params["fn"](current), F.lit(False))
            maybe.append((gate & ~pred, _mk_error(_ord, path)))
            fail_conds.append(gate & ~pred)
        else:
            spec = E.custom_error("is invalid")
            rid = ctx.rule_id(path, "refine_ctx")
            _ord = ctx.register(rid, spec, path, "refine_ctx",
                                dict(chk.params))
            msgs = chk.params["fn"](current)
            cells = F.transform(
                msgs, lambda m: F.struct(
                    F.lit(_ord).alias("i"),
                    F.lit(None).cast("array<string>").alias("p"),
                    m.alias("m")))
            err_arrays.append(F.when(gate & msgs.isNotNull(), cells)
                              .otherwise(_empty_errors()))
            fail_conds.append(gate & msgs.isNotNull() & (F.size(msgs) > 0))

    for chk in schema.checks:
        emit(chk, value)
    for tag, eff in schema.effects:
        if tag == "check":
            emit(eff, value)
        else:
            if eff.kind != "expr":
                raise NotImplementedError(
                    f"{schema.kind}-level transforms must use engine='expr'")
            value = eff.fn(value)
    if maybe:
        err_arrays.append(_collect(maybe))
    # parsed-nil contract on the node itself — same gate
    # _compile_scalar composes as node_ok; without it a
    # tuple/union/map row failing a node-level refine would expose a
    # parsed value the reference nils
    value = _nil_on_any(value, fail_conds)
    return Node(value, _concat_err_arrays(err_arrays), node.out_type)


def _compile_scalar(ctx: CompileCtx, schema: Schema, col: Column,
                    itype: T.DataType, path: tuple, guard: Column,
                    allow_pandas: bool) -> Node:
    present = col.isNotNull()
    has_default = schema.default is not _UNSET

    typed, type_ok, type_spec, out_type = _type_stage(schema, col, itype)

    maybe: list[tuple[Column, Column]] = []
    if type_spec is not None:
        rid = ctx.rule_id(path, "type")
        _ord = ctx.register(rid, type_spec, path, "type")
        maybe.append((guard & present & _safe_not(type_ok),
                      _mk_error(_ord, path)))

    check_guard = guard & present & F.coalesce(type_ok, F.lit(False))
    value = typed
    extra_err_arrays: list[Column] = []

    def emit_refine_ctx(chk: Check, current: Column, gate: Column) -> Column:
        """Context-style refine: one rule ordinal, N dynamic-message
        error cells per row (Zoi Context.add_error, lib/zoi.ex:3120-3143).
        Returns the passing predicate (no messages emitted)."""
        spec = E.custom_error("is invalid")
        rid = ctx.rule_id(path, "refine_ctx")
        _ord = ctx.register(rid, spec, path, "refine_ctx", dict(chk.params))
        fn = chk.params["fn"]
        if chk.params.get("engine") == "expr":
            msgs = fn(current)
        else:
            udf = F.pandas_udf(fn, T.ArrayType(T.StringType()))
            msgs = udf(current)
        cells = F.transform(
            msgs, lambda m: F.struct(
                F.lit(_ord).alias("i"),
                F.lit(None).cast("array<string>").alias("p"),
                m.alias("m")))
        extra_err_arrays.append(
            F.when(gate & msgs.isNotNull(), cells)
            .otherwise(_empty_errors()))
        return msgs.isNull() | (F.size(msgs) == 0)

    length_mode = schema.params.get("length_mode", "chars")
    if length_mode == "grapheme" and not allow_pandas:
        raise NotImplementedError(
            "grapheme length mode is not supported inside array elements "
            "(the counter is an Arrow batch; lambda variables cannot feed "
            "a pandas_udf)")

    def emit_check(chk: Check, current: Column, gate: Column) -> Column:
        """Register one check; returns its passing predicate."""
        if chk.kind in ("refine", "refine_ctx") \
                and chk.params.get("engine") != "expr" and not allow_pandas:
            raise NotImplementedError(
                "pandas refinements are not supported inside array elements; "
                "use engine='expr'")
        if chk.kind == "refine_ctx":
            return emit_refine_ctx(chk, current, gate)
        pred, spec, dyn_msg = _check_pred_and_spec(schema.kind, chk, current,
                                                   length_mode)
        rid = ctx.rule_id(path, chk.kind if chk.kind != "regex"
                          else chk.params.get("format") or "regex")
        _ord = ctx.register(rid, spec, path, chk.kind, dict(chk.params))
        maybe.append((gate & _safe_not(pred),
                      _mk_error(_ord, path, dyn_msg)))
        return F.coalesce(pred, F.lit(False))

    # field constraints: all evaluated on the typed value, errors
    # collected (lib/zoi/validations.ex:10-28)
    cons_preds = [emit_check(chk, value, check_guard)
                  for chk in schema.checks]
    cons_ok = F.lit(True)
    for p in cons_preds:
        cons_ok = cons_ok & p

    # ordered effect chain (lib/zoi/types/meta.ex:62-95). The chain runs
    # ONLY when parse_type succeeded — and for the reference, parse_type
    # INCLUDES the field constraints (Type.parse's `with` runs
    # validate_constraints before returning {:ok,...}; Context.parse
    # skips run_effects otherwise — lib/zoi/context.ex:42-44,
    # lib/zoi/types/string.ex:45-47, test/zoi_test.exs:107-115). Within
    # the chain itself errors are collected, not fail-fast.
    eff_gate = check_guard & cons_ok
    eff_preds: list[Column] = []
    for tag, eff in schema.effects:
        if tag == "check":
            eff_preds.append(emit_check(eff, value, eff_gate))
        else:
            if eff.kind == "pandas" and not allow_pandas:
                raise NotImplementedError(
                    "pandas transforms are not supported inside array elements")
            value = _apply_transform(eff, value, out_type)

    # parsed-value contract (lib/zoi/types/meta.ex:90-95 `{ctx | parsed:
    # nil}`, lib/zoi/context.ex:70-79): a node that produced ANY error
    # yields a nil parsed value — the partial output carried alongside
    # map errors is the struct of per-FIELD results, each nil-ed
    # individually, which this per-node gate composes into.
    node_ok = F.coalesce(type_ok, F.lit(False)) & cons_ok
    for p in eff_preds:
        node_ok = node_ok & p
    if has_default:
        # nil → default, skipping type stage and effects
        # (types/default.ex:16-23)
        value = F.when(~present, F.lit(schema.default)) \
            .otherwise(F.when(node_ok, value))
    else:
        value = F.when(node_ok, value)

    return Node(value,
                _concat_err_arrays([_collect(maybe), *extra_err_arrays]),
                out_type)


def _compile_lazy(ctx, schema, col, itype, path, guard, allow_pandas) -> Node:
    depth = schema.params.get("_depth", 0)
    if depth >= schema.params["max_depth"]:
        return Node(col, _empty_errors(), itype)  # opaque beyond max depth
    inner = schema.params["thunk"]()
    inner = inner._clone()
    if inner.kind == "lazy":
        inner.params["_depth"] = depth + 1
    return compile_node(ctx, inner, col, itype, path, guard, allow_pandas)


def _wrap_field_node(ctx: CompileCtx, child: Schema, col: Column,
                     itype: T.DataType, path: tuple, guard: Column,
                     key: str, allow_pandas: bool) -> Node:
    """Field-level required/optional/nullable handling.

    Map fields are required by default (types/map.ex:13-29); a null in
    the DataFrame maps to Zoi's missing key → `:required` error. For
    optional/nullable fields a null passes with a null parsed value.
    """
    required = child.required is not False and not child.nullable \
        and child.default is _UNSET
    node = compile_node(ctx, child, col, itype, path, guard, allow_pandas)
    errs = node.errors
    if required:
        spec = E.required(key)
        rid = ctx.rule_id(path, "required")
        _ord = ctx.register(rid, spec, path, "required")
        req_err = (guard & col.isNull(), _mk_error(_ord, path))
        errs = _concat_err_arrays([_collect([req_err]), errs])
    return Node(node.value, errs, node.out_type)


def _compile_fields(ctx, schema, col, itype, path, guard, allow_pandas) -> Node:
    if col is not None and not isinstance(itype, T.StructType):
        spec = E.invalid_type("map", error=schema.error)
        rid = ctx.rule_id(path, "type")
        _ord = ctx.register(rid, spec, path, "type")
        err = (guard & col.isNotNull(),
               _mk_error(_ord, path))
        return Node(F.lit(None), _collect([err]), T.StructType([]))

    declared = schema.params["fields"]
    available = {f.name: f.dataType for f in itype.fields}
    unrecognized_mode = schema.params.get("unrecognized", "strip")
    empty_values = schema.params.get("empty_values", ())

    err_arrays: list[Column] = []
    parsed_fields: list[Column] = []
    out_fields: list[T.StructField] = []
    field_guard = guard & col.isNotNull() if col is not None else guard

    for name, child in declared.items():
        child_path = path + (name,)
        if name in available:
            child_col = col.getField(name) if col is not None else F.col(name)
            child_col = _apply_empty_values(child_col, available[name],
                                            empty_values)
            node = _wrap_field_node(ctx, child, child_col, available[name],
                                    child_path, field_guard, name, allow_pandas)
            err_arrays.append(node.errors)
            parsed_fields.append(node.value.alias(name))
            out_fields.append(T.StructField(name, node.out_type, True))
        else:
            # column absent from the input schema entirely
            if child.default is not _UNSET:
                parsed_fields.append(F.lit(child.default).alias(name))
                continue
            if child.required is False or child.nullable:
                continue
            spec = E.required(name)
            rid = ctx.rule_id(child_path, "required")
            _ord = ctx.register(rid, spec, child_path, "required")
            err_arrays.append(_collect([
                (field_guard, _mk_error(_ord, child_path))]))

    extra = [n for n in available if n not in declared]
    if unrecognized_mode == "error":
        for name in extra:
            spec = E.unrecognized_key(name)
            rid = ctx.rule_id(path + (name,), "unrecognized_key")
            _ord = ctx.register(rid, spec, path + (name,), "unrecognized_key")
            err_arrays.append(_collect([
                (field_guard, _mk_error(_ord, path + (name,)))]))
    elif unrecognized_mode == "preserve":
        for name in extra:
            src = col.getField(name) if col is not None else F.col(name)
            parsed_fields.append(src.alias(name))
            out_fields.append(T.StructField(name, available[name], True))
    elif isinstance(unrecognized_mode, tuple):
        # validated preserve ({:preserve, schemas},
        # types/key_value.ex:104-129, 186-196): extra keys parsed through
        # map(key_schema, value_schema). Keys are static column names in
        # the columnar model, so the key-schema check compiles against a
        # literal (Catalyst constant-folds it per rule); a key error
        # fires for every row that carries a value under that key.
        _tag, kschema, vschema = unrecognized_mode
        for name in extra:
            src = col.getField(name) if col is not None else F.col(name)
            key_node = compile_node(ctx, kschema, F.lit(name), T.StringType(),
                                    path + (name,),
                                    field_guard & src.isNotNull(), allow_pandas)
            val_node = compile_node(ctx, vschema, src, available[name],
                                    path + (name,), field_guard, allow_pandas)
            err_arrays.append(key_node.errors)
            err_arrays.append(val_node.errors)
            parsed_fields.append(val_node.value.alias(name))
            out_fields.append(T.StructField(name, val_node.out_type, True))

    value = F.struct(*parsed_fields) if parsed_fields else F.lit(None)

    # node-level effect chain over the PARSED map: Zoi's map |> refine /
    # map |> transform (effects run after field parsing on the whole
    # parsed value, chain-ordered — lib/zoi/types/meta.ex:62-95;
    # cross-field rules live here). Gated on EVERY child parsing
    # cleanly: Context.parse runs effects only when parse_type returned
    # ok, and a map's parse_type errors when any field erred
    # (lib/zoi/context.ex:42-44). Expression engine only — a pandas
    # batch over a struct column has a different UDF signature, and
    # cross-field predicates are plain Column expressions over getField.
    children_ok = F.size(_concat_err_arrays(list(err_arrays))) == 0 \
        if err_arrays else F.lit(True)
    node_gate = field_guard & children_ok
    maybe: list[tuple[Column, Column]] = []
    fail_conds: list[Column] = []

    def emit_node_check(chk: Check, current: Column) -> None:
        if chk.kind not in ("refine", "refine_ctx"):
            raise NotImplementedError(
                f"check '{chk.kind}' does not apply to a fields schema; "
                "use refine/refine_ctx for cross-field rules")
        if chk.params.get("engine") != "expr":
            raise NotImplementedError(
                "fields-level refinements must use engine='expr' (the "
                "predicate receives the parsed struct Column)")
        if chk.kind == "refine":
            spec = E.custom_error(chk.params.get("message", "is invalid"))
            rid = ctx.rule_id(path, "refine")
            _ord = ctx.register(rid, spec, path, "refine", dict(chk.params))
            pred = F.coalesce(chk.params["fn"](current), F.lit(False))
            maybe.append((node_gate & ~pred, _mk_error(_ord, path)))
            fail_conds.append(node_gate & ~pred)
        else:
            spec = E.custom_error("is invalid")
            rid = ctx.rule_id(path, "refine_ctx")
            _ord = ctx.register(rid, spec, path, "refine_ctx",
                                dict(chk.params))
            msgs = chk.params["fn"](current)
            cells = F.transform(
                msgs, lambda m: F.struct(
                    F.lit(_ord).alias("i"),
                    F.lit(None).cast("array<string>").alias("p"),
                    m.alias("m")))
            err_arrays.append(
                F.when(node_gate & msgs.isNotNull(), cells)
                .otherwise(_empty_errors()))
            fail_conds.append(node_gate & msgs.isNotNull()
                              & (F.size(msgs) > 0))

    for chk in schema.checks:
        emit_node_check(chk, value)
    for tag, eff in schema.effects:
        if tag == "check":
            emit_node_check(eff, value)
        else:
            if eff.kind != "expr":
                raise NotImplementedError(
                    "fields-level transforms must use engine='expr' "
                    "(the function receives the parsed struct Column)")
            value = eff.fn(value)
    if maybe:
        err_arrays.append(_collect(maybe))

    # parsed-nil on a failing cross-field refine: node-level effect
    # errors nil the WHOLE parsed map, unlike FIELD errors which keep
    # the partial map — same shared gate as _apply_post_effects
    value = _nil_on_any(value, fail_conds)

    return Node(value, _concat_err_arrays(err_arrays), T.StructType(out_fields))


def _apply_empty_values(col: Column, itype: T.DataType,
                        empty_values: tuple) -> Column:
    """Per-schema empty_values (types/key_value.ex:82-84): raw values in
    the list behave as MISSING — nulled before the required/default/type
    stages. Only type-compatible literals are compared (an ``""`` entry
    is meaningless — and un-castable — against a numeric column)."""
    if not empty_values:
        return col
    if isinstance(itype, T.StringType):
        vals = [v for v in empty_values if isinstance(v, str)]
    elif isinstance(itype, (T.NumericType,)):
        vals = [v for v in empty_values
                if isinstance(v, (int, float)) and not isinstance(v, bool)]
    else:
        vals = [v for v in empty_values if not isinstance(v, str)]
    if not vals:
        return col
    return F.when(col.isin(*vals), F.lit(None).cast(itype.simpleString())) \
        .otherwise(col)


def _compile_array(ctx, schema, col, itype, path, guard) -> Node:
    if not isinstance(itype, T.ArrayType):
        spec = E.invalid_type("array", error=schema.error)
        rid = ctx.rule_id(path, "type")
        _ord = ctx.register(rid, spec, path, "type")
        err = (guard & col.isNotNull(), _mk_error(_ord, path))
        return Node(F.lit(None), _collect([err]), T.ArrayType(T.StringType()))

    inner = schema.params["inner"]
    el_type = itype.elementType

    # element errors with dynamic [index] path (types/array.ex:54-80)
    def elem_errors(x: Column, i: Column) -> Column:
        node = compile_node(ctx, inner, x, el_type,
                            path + (i.cast("string"),), guard,
                            allow_pandas=False)
        return node.errors

    # trick: run one compile to register rules & reuse expression shape —
    # F.transform re-invokes the lambda with real lambda vars
    elem_err_arr = F.flatten(F.transform(col, elem_errors))

    def elem_value(x: Column) -> Column:
        sub = CompileCtx()  # throwaway: avoid double-registering rules
        return compile_node(sub, inner, x, el_type, path, guard,
                            allow_pandas=False).value

    parsed = F.transform(col, elem_value)

    # array-level constraints run on parsed element values — but ONLY
    # when every element parsed cleanly (types/array.ex finalize_result:
    # element errors return immediately, constraints never run), and
    # effect-chain checks additionally require the constraints to have
    # passed (Context.parse skips run_effects on parse_type failure).
    maybe: list[tuple[Column, Column]] = []
    present_guard = guard & col.isNotNull()
    elements_ok = F.size(elem_err_arr) == 0
    cons_gate = present_guard & elements_ok
    cons_ok = F.lit(True)
    for chk in schema.checks:
        pred, spec, _ = _check_pred_and_spec("array", chk, parsed)
        rid = ctx.rule_id(path, chk.kind)
        _ord = ctx.register(rid, spec, path, chk.kind, dict(chk.params))
        maybe.append((cons_gate & _safe_not(pred), _mk_error(_ord, path)))
        cons_ok = cons_ok & F.coalesce(pred, F.lit(False))
    eff_gate = cons_gate & cons_ok
    for chk in [e for t, e in schema.effects if t == "check"]:
        pred, spec, _ = _check_pred_and_spec("array", chk, parsed)
        rid = ctx.rule_id(path, chk.kind)
        _ord = ctx.register(rid, spec, path, chk.kind, dict(chk.params))
        maybe.append((eff_gate & _safe_not(pred), _mk_error(_ord, path)))

    errs = _concat_err_arrays([
        F.when(col.isNotNull(), elem_err_arr).otherwise(_empty_errors()),
        _collect(maybe),
    ])
    return Node(parsed, errs, T.ArrayType(el_type))


def _compile_tuple(ctx, schema, col, itype, path, guard, allow_pandas) -> Node:
    fields_ = schema.params["fields"]
    n = len(fields_)
    err_arrays: list[Column] = []
    values: list[Column] = []
    out_fields: list[T.StructField] = []

    if isinstance(itype, T.StructType):
        actual = len(itype.fields)
        if actual != n:
            spec = E.invalid_tuple(n, actual, error=schema.error)
            rid = ctx.rule_id(path, "tuple_length")
            _ord = ctx.register(rid, spec, path, "tuple_length")
            return Node(col, _collect([
                (guard & col.isNotNull(),
                 _mk_error(_ord, path))]), itype)
        for i, child in enumerate(fields_):
            f = itype.fields[i]
            node = compile_node(ctx, child, col.getField(f.name), f.dataType,
                                path + (i,), guard & col.isNotNull(), allow_pandas)
            err_arrays.append(node.errors)
            values.append(node.value.alias(f.name))
            out_fields.append(T.StructField(f.name, node.out_type, True))
        return Node(F.struct(*values), _concat_err_arrays(err_arrays),
                    T.StructType(out_fields))

    if isinstance(itype, T.ArrayType):
        spec = E.invalid_tuple(n, 0, error=schema.error)
        # dynamic actual length message
        msg = F.concat(F.lit(f"invalid tuple: expected length {n}, got "),
                       F.size(col).cast("string"))
        rid = ctx.rule_id(path, "tuple_length")
        _ord = ctx.register(rid, spec, path, "tuple_length")
        err_arrays.append(_collect([
            (guard & col.isNotNull() & (F.size(col) != n),
             _mk_error(_ord, path, msg))]))
        ok = col.isNotNull() & (F.size(col) == n)
        for i, child in enumerate(fields_):
            node = compile_node(ctx, child, F.try_element_at(col, F.lit(i + 1)),
                                itype.elementType, path + (i,), guard & ok,
                                allow_pandas=False)
            err_arrays.append(node.errors)
            values.append(node.value.alias(f"_{i}"))
        return Node(F.struct(*values), _concat_err_arrays(err_arrays),
                    T.StructType([T.StructField(f"_{i}", itype.elementType, True)
                                  for i in range(n)]))

    spec = E.invalid_type("tuple", error=schema.error)
    rid = ctx.rule_id(path, "type")
    _ord = ctx.register(rid, spec, path, "type")
    return Node(col, _collect([
        (guard & col.isNotNull(), _mk_error(_ord, path))]),
        itype)


def _compile_map_kv(ctx, schema, col, itype, path, guard) -> Node:
    if not isinstance(itype, T.MapType):
        spec = E.invalid_type("map", error=schema.error)
        rid = ctx.rule_id(path, "type")
        _ord = ctx.register(rid, spec, path, "type")
        return Node(col, _collect([
            (guard & col.isNotNull(), _mk_error(_ord, path))]),
            itype)

    kschema, vschema = schema.params["key"], schema.params["value"]

    def entry_errors(e: Column) -> Column:
        kp = path + (e.getField("key").cast("string"),)
        kn = compile_node(ctx, kschema, e.getField("key"), itype.keyType,
                          kp, guard, allow_pandas=False)
        vn = compile_node(ctx, vschema, e.getField("value"), itype.valueType,
                          kp, guard, allow_pandas=False)
        return F.concat(kn.errors, vn.errors)

    errs = F.when(col.isNotNull(),
                  F.flatten(F.transform(F.map_entries(col), entry_errors))) \
        .otherwise(_empty_errors())

    def value_xform(k: Column, v: Column) -> Column:
        sub = CompileCtx()
        return compile_node(sub, vschema, v, itype.valueType, path, guard,
                            allow_pandas=False).value

    parsed = F.transform_values(col, value_xform)
    return Node(parsed, errs, itype)


def _compile_union(ctx, schema, col, itype, path, guard, allow_pandas) -> Node:
    """First-match-wins; total failure reports the LAST branch's errors
    (types/union.ex:23-37) — as an ordered CASE WHEN chain, which
    Catalyst evaluates lazily (SURVEY §4)."""
    branches = schema.params["schemas"]
    nodes = [compile_node(ctx, b, col, itype, path, guard, allow_pandas)
             for b in branches]
    oks = [F.size(n.errors) == 0 for n in nodes]

    # a Spark column is monotyped: heterogeneous branch outputs (e.g.
    # union([integer(coerce), boolean(coerce)])) collapse to string —
    # documented delta vs the reference's dynamic terms
    out_types = {n.out_type.simpleString() for n in nodes}
    values = [n.value if len(out_types) == 1 else n.value.cast("string")
              for n in nodes]
    out_type = nodes[0].out_type if len(out_types) == 1 else T.StringType()

    value = None
    for ok, v in zip(oks, values):
        value = F.when(ok, v) if value is None else value.when(ok, v)

    any_ok = oks[0]
    for ok in oks[1:]:
        any_ok = any_ok | ok

    if schema.error is not None:
        spec = E.custom_error(schema.error)
        rid = ctx.rule_id(path, "union")
        _ord = ctx.register(rid, spec, path, "union")
        errs = _collect([(guard & col.isNotNull() & ~any_ok,
                          _mk_error(_ord, path))])
    else:
        errs = F.when(~any_ok, nodes[-1].errors).otherwise(_empty_errors())
    return Node(value, errs, out_type)


def _compile_intersection(ctx, schema, col, itype, path, guard, allow_pandas) -> Node:
    """All branches parse the ORIGINAL input sequentially; halt on first
    failure; last branch's parsed value wins
    (types/intersection.ex:23-37)."""
    branches = schema.params["schemas"]
    nodes = [compile_node(ctx, b, col, itype, path, guard, allow_pandas)
             for b in branches]
    err_arrays: list[Column] = []
    prev_ok = F.lit(True)
    for n in nodes:
        err_arrays.append(F.when(prev_ok, n.errors).otherwise(_empty_errors()))
        prev_ok = prev_ok & (F.size(n.errors) == 0)
    if schema.error is not None:
        spec = E.custom_error(schema.error)
        rid = ctx.rule_id(path, "intersection")
        _ord = ctx.register(rid, spec, path, "intersection")
        errs = _collect([(guard & ~prev_ok,
                          _mk_error(_ord, path))])
    else:
        errs = _concat_err_arrays(err_arrays)
    return Node(nodes[-1].value, errs, nodes[-1].out_type)


def _compile_discriminated(ctx, schema, col, itype, path, guard,
                           allow_pandas) -> Node:
    """O(1) dispatch on a literal discriminator column → CASE WHEN chain
    (types/discriminated_union.ex:20-75)."""
    disc = schema.params["discriminator"]
    lookup = schema.params["lookup"]

    if not isinstance(itype, T.StructType):
        spec = E.invalid_type("map", error=schema.error)
        rid = ctx.rule_id(path, "type")
        _ord = ctx.register(rid, spec, path, "type")
        return Node(col, _collect([
            (guard & col.isNotNull(), _mk_error(_ord, path))]),
            itype)

    disc_col = col.getField(disc) if col is not None else F.col(disc)
    present = col.isNotNull() if col is not None else F.lit(True)

    err_arrays: list[Column] = []
    known = None
    nodes: list[tuple[Column, Node, Schema]] = []
    for key, branch in lookup.items():
        cond = disc_col == F.lit(key)
        known = cond if known is None else (known | cond)
        node = compile_node(ctx, branch, col, itype, path,
                            guard & present & cond, allow_pandas)
        err_arrays.append(F.when(cond, node.errors).otherwise(_empty_errors()))
        nodes.append((cond, node, branch))

    # branch parsed structs differ in field ORDER/shape per branch —
    # a CASE WHEN needs one type, so align every branch to the union
    # of declared fields (first-declaring branch fixes each type)
    field_types: dict[str, T.DataType] = {}
    for _c, node, _b in nodes:
        if isinstance(node.out_type, T.StructType):
            for f in node.out_type.fields:
                field_types.setdefault(f.name, f.dataType)
    all_names = list(field_types)

    value = None
    for cond, node, branch in nodes:
        have = ({f.name for f in node.out_type.fields}
                if isinstance(node.out_type, T.StructType) else set())
        aligned = F.struct(*[
            (node.value.getField(n).cast(field_types[n].simpleString())
             if n in have
             else F.lit(None).cast(field_types[n].simpleString())).alias(n)
            for n in all_names])
        value = (F.when(cond, aligned) if value is None
                 else value.when(cond, aligned))

    # missing discriminator → required (discriminated_union.ex:75-88)
    req_spec = E.required(disc)
    rid_req = ctx.rule_id(path + (disc,), "required")
    _ord_req = ctx.register(rid_req, req_spec, path + (disc,), "required")
    err_arrays.append(_collect([
        (guard & present & disc_col.isNull(),
         _mk_error(_ord_req, path + (disc,)))]))

    # unknown discriminator → :custom with dynamic value
    # (discriminated_union.ex:95-110)
    unk_spec = E.custom_error(
        "unknown discriminator '%{value}' for field '%{field}'",
        {"value": "?", "field": disc})
    rid_unk = ctx.rule_id(path, "unknown_discriminator")
    _ord_unk = ctx.register(rid_unk, unk_spec, path, "unknown_discriminator")
    dyn_msg = F.concat(F.lit("unknown discriminator '"),
                       disc_col.cast("string"),
                       F.lit(f"' for field '{disc}'"))
    err_arrays.append(_collect([
        (guard & present & disc_col.isNotNull() & ~F.coalesce(known, F.lit(False)),
         _mk_error(_ord_unk, path, dyn_msg))]))

    return Node(value, _concat_err_arrays(err_arrays), itype)


def _compile_codec(ctx, schema, col, itype, path, guard, allow_pandas) -> Node:
    """parse = from → decode → to (types/codec.ex:54-67)."""
    from_node = compile_node(ctx, schema.params["from_schema"], col, itype,
                             path, guard, allow_pandas)
    from_ok = F.size(from_node.errors) == 0
    decode = schema.params.get("decode")
    # decode only runs after the from-side parse succeeded
    # (types/codec.ex:54-60) — and a CASE WHEN branch is lazily
    # evaluated, so ANSI-throwing decode exprs never see bad input
    decoded = (F.when(from_ok, decode(from_node.value)) if decode
               else from_node.value)
    to_schema = schema.params["to_schema"]
    to_itype = _static_out_type(to_schema, from_node.out_type)
    to_node = compile_node(ctx, to_schema, decoded, to_itype, path,
                           guard & from_ok, allow_pandas)
    errs = _concat_err_arrays([
        from_node.errors,
        F.when(from_ok, to_node.errors).otherwise(_empty_errors()),
    ])
    return Node(to_node.value, errs, to_node.out_type)


def _static_out_type(schema: Schema, fallback: T.DataType) -> T.DataType:
    return {
        "string": T.StringType(), "integer": T.LongType(),
        "float": T.DoubleType(), "number": T.DoubleType(),
        "boolean": T.BooleanType(), "date": T.DateType(),
        "datetime": T.TimestampType(), "naive_datetime": T.TimestampType(),
    }.get(schema.kind, fallback)


# ---------------------------------------------------------------------------
# top-level entry
# ---------------------------------------------------------------------------

@dataclass
class CompiledSchema:
    errors_col: Column
    valid_col: Column
    parsed_col: Column
    rules: list[RuleInfo]
    out_type: T.DataType


def compile_schema(schema: Schema, input_type: T.StructType) -> CompiledSchema:
    """Compile a fields-schema against a DataFrame schema. The returned
    Columns reference input columns by name (top-level row = the Zoi
    input term, SURVEY §1.2)."""
    if schema.kind not in ("fields", "discriminated_union"):
        raise ValueError(
            "top-level schema must be a fields/ discriminated_union schema; "
            "wrap single columns in z.fields({...})")
    ctx = CompileCtx()
    node = compile_node(ctx, schema, None, input_type, (), F.lit(True))
    errs = node.errors
    return CompiledSchema(
        errors_col=errs,
        valid_col=F.size(errs) == 0,
        parsed_col=node.value,
        rules=ctx.rules,
        out_type=node.out_type,
    )
