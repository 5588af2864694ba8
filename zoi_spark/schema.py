"""Schema IR — the declarative DSL that compiles to a Spark plan.

The reference (Zoi) models a schema as an immutable struct tree walked
one value at a time (``lib/zoi/type.ex:1-62``). Here the same tree is a
pure-Python IR compiled ONCE on the driver into Spark ``Column``
predicates + cast/transform expressions (see ``compile.py``); executors
never see these objects.

Ordering semantics preserved from the reference
(``lib/zoi/types/meta.ex:62-95``, ``lib/zoi.ex:2666-2672``):

* Constraints attached while the effect chain is empty are *field
  constraints* — they run right after type parsing and ALL of them are
  evaluated (errors collected, no fail-fast;
  ``lib/zoi/validations.ex:10-28``).
* Once any effect (refine/transform) exists, further constraints append
  to the ordered effect chain, so ``string().min(3).trim().min(5)``
  checks ``min(3)`` on the *untrimmed* value and ``min(5)`` on the
  trimmed one.

All builder methods are copy-on-write: schemas are immutable values,
exactly like the reference's structs.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Mapping, Sequence

from . import regexes

_UNSET = object()


@dataclass(frozen=True)
class Check:
    """One constraint: a named predicate with static params.

    ``error`` overrides the built-in message (and flips the code to
    ``custom``, per lib/zoi/error.ex:183-197).
    """

    kind: str
    params: Mapping[str, Any] = dc_field(default_factory=dict)
    error: str | None = None


@dataclass(frozen=True)
class Transform:
    """One value rewrite. ``kind`` in {trim, to_downcase, to_upcase,
    expr, pandas} — ``expr`` carries a Column->Column function built
    from pyspark.sql.functions (JVM-side), ``pandas`` carries a
    vectorized pandas Series->Series function (Arrow batch)."""

    kind: str
    fn: Callable | None = None
    params: Mapping[str, Any] = dc_field(default_factory=dict)


class Schema:
    """One node of the schema tree."""

    __slots__ = (
        "kind", "params", "checks", "effects", "coerce",
        "required", "nullable", "default", "error", "description",
        "example", "metadata",
    )

    def __init__(self, kind: str, **params: Any) -> None:
        self.kind = kind
        self.params: dict[str, Any] = params
        self.checks: list[Check] = []
        self.effects: list[tuple[str, Any]] = []
        self.coerce: bool = bool(params.pop("coerce", False))
        self.required: bool | None = None  # tri-state, like Zoi meta
        self.nullable: bool = False
        self.default: Any = _UNSET
        self.error: str | None = params.pop("error", None)
        self.description: str | None = None
        self.example: Any = None
        self.metadata: dict[str, Any] = {}

    # -- plumbing ----------------------------------------------------------

    def _clone(self) -> "Schema":
        new = Schema.__new__(Schema)
        new.kind = self.kind
        new.params = dict(self.params)
        new.checks = list(self.checks)
        new.effects = list(self.effects)
        new.coerce = self.coerce
        new.required = self.required
        new.nullable = self.nullable
        new.default = self.default
        new.error = self.error
        new.description = self.description
        new.example = self.example
        new.metadata = dict(self.metadata)
        return new

    def _with(self, **attrs: Any) -> "Schema":
        new = self._clone()
        for k, v in attrs.items():
            setattr(new, k, v)
        return new

    def _check(self, kind: str, error: str | None = None, **params: Any) -> "Schema":
        chk = Check(kind, params, error)
        new = self._clone()
        if new.effects:
            # constraint-after-effect becomes an ordered refine effect
            # (lib/zoi.ex:2666-2672 and siblings)
            new.effects.append(("check", chk))
        else:
            new.checks.append(chk)
        return new

    def _transform(self, t: Transform) -> "Schema":
        new = self._clone()
        new.effects.append(("transform", t))
        return new

    def __repr__(self) -> str:  # compact, for test failure output
        bits = [self.kind]
        if self.checks:
            bits.append("checks=" + ",".join(c.kind for c in self.checks))
        if self.effects:
            bits.append("effects=" + ",".join(
                e[1].kind if isinstance(e[1], (Check, Transform)) else "?"
                for e in self.effects))
        return f"<Schema {' '.join(bits)}>"

    # -- meta --------------------------------------------------------------

    def optional(self) -> "Schema":
        return self._with(required=False)

    def require(self) -> "Schema":
        return self._with(required=True)

    def as_nullable(self) -> "Schema":
        return self._with(nullable=True)

    def nullish(self) -> "Schema":
        return self._with(nullable=True, required=False)

    def with_default(self, value: Any) -> "Schema":
        """nil → default; short-circuits effects on nil inputs
        (types/default.ex:16-23)."""
        return self._with(default=value)

    def to_struct(self, tag: str) -> "Schema":
        """``Zoi.to_struct/2`` analogue: tag the parsed map with a
        struct name (lib/zoi.ex:3042-3045). A Spark row IS a struct, so
        this is metadata-only — the tag surfaces in describe()/DDL."""
        new = self._clone()
        new.metadata = {**new.metadata, "struct_tag": tag}
        return new

    def with_coerce(self, flag: bool = True) -> "Schema":
        return self._with(coerce=flag)

    def with_error(self, message: str) -> "Schema":
        return self._with(error=message)

    def describe(self, text: str) -> "Schema":
        return self._with(description=text)

    def with_example(self, value: Any) -> "Schema":
        return self._with(example=value)

    def with_metadata(self, **kv: Any) -> "Schema":
        new = self._clone()
        new.metadata.update(kv)
        return new

    def deprecated(self, message: str = "") -> "Schema":
        """Mark the schema deprecated; validate() warns ONCE per field
        at compile time (the per-value ``IO.warn`` of
        lib/zoi/context.ex:50-63 would be per-row noise over a table —
        one driver-side warning per run carries the same signal)."""
        new = self._clone()
        new.metadata = {**new.metadata, "deprecated": message or "deprecated"}
        return new

    # -- comparison refinements (lib/zoi.ex:2592-2890) ----------------------

    def gte(self, value: Any, *, error: str | None = None) -> "Schema":
        return self._check("gte", error, value=value)

    min = gte  # alias (lib/zoi.ex min/3)

    def lte(self, value: Any, *, error: str | None = None) -> "Schema":
        return self._check("lte", error, value=value)

    max = lte  # alias (lib/zoi.ex max/3)

    def gt(self, value: Any, *, error: str | None = None) -> "Schema":
        return self._check("gt", error, value=value)

    def lt(self, value: Any, *, error: str | None = None) -> "Schema":
        return self._check("lt", error, value=value)

    def positive(self, *, error: str | None = None) -> "Schema":
        return self.gt(0, error=error)

    def negative(self, *, error: str | None = None) -> "Schema":
        return self.lt(0, error=error)

    def non_negative(self, *, error: str | None = None) -> "Schema":
        return self.gte(0, error=error)

    def length(self, value: int, *, error: str | None = None) -> "Schema":
        return self._check("length", error, value=value)

    def multiple_of(self, value: Any, *, error: str | None = None) -> "Schema":
        return self._check("multiple_of", error, value=value)

    def one_of(self, values: Sequence[Any], *, error: str | None = None) -> "Schema":
        return self._check("one_of", error, values=list(values))

    # -- string refinements --------------------------------------------------

    def regex(self, pattern: str, *, error: str | None = None) -> "Schema":
        return self._check("regex", error, pattern=pattern)

    def starts_with(self, prefix: str, *, error: str | None = None) -> "Schema":
        return self._check("starts_with", error, value=prefix)

    def ends_with(self, suffix: str, *, error: str | None = None) -> "Schema":
        return self._check("ends_with", error, value=suffix)

    def downcase(self, *, error: str | None = None) -> "Schema":
        """Must already be all-lowercase (regex ^[^A-Z]*$,
        lib/zoi/regexes.ex:42-44)."""
        return self._check("regex", error, pattern=regexes.DOWNCASE, format="downcase")

    def upcase(self, *, error: str | None = None) -> "Schema":
        return self._check("regex", error, pattern=regexes.UPCASE, format="upcase")

    # -- custom effects ------------------------------------------------------

    def refine(self, fn: Callable, *, error: str = "is invalid",
               engine: str = "pandas") -> "Schema":
        """Custom predicate. ``engine='expr'``: fn(Column)->Column
        boolean (JVM-side, preferred). ``engine='pandas'``:
        fn(pd.Series)->pd.Series[bool], vectorized Arrow batch — never
        per-row Python (mirrors Zoi refine/2, lib/zoi.ex:3120-3143)."""
        return self._check("refine", None, fn=fn, engine=engine, message=error)

    def refine_ctx(self, fn: Callable, *, engine: str = "pandas") -> "Schema":
        """Context-style refine (arity-2 Zoi refine with
        ``Context.add_error``, lib/zoi.ex:3120-3143, lib/zoi/types/meta.
        ex:98-165): the function returns, per value, a LIST of error
        messages (empty/None → valid) so one refinement can emit
        multiple errors. ``engine='expr'``: fn(Column)->Column
        array<string>; ``engine='pandas'``: fn(pd.Series)->pd.Series of
        list[str], vectorized Arrow batch."""
        return self._check("refine_ctx", None, fn=fn, engine=engine)

    def transform(self, fn: Callable, *, engine: str = "expr") -> "Schema":
        """Custom value rewrite, chain-ordered with refinements
        (Zoi transform/2, lib/zoi.ex:3207-3230)."""
        return self._transform(Transform("pandas" if engine == "pandas" else "expr", fn))

    def trim(self) -> "Schema":
        return self._transform(Transform("trim"))

    def to_downcase(self) -> "Schema":
        return self._transform(Transform("to_downcase"))

    def to_upcase(self) -> "Schema":
        return self._transform(Transform("to_upcase"))


# ---------------------------------------------------------------------------
# constructors (mirror the public Zoi API surface, lib/zoi.ex)
# ---------------------------------------------------------------------------

def string(*, coerce: bool = False, error: str | None = None,
           min: int | None = None, max: int | None = None,
           length: int | None = None, length_mode: str = "chars") -> Schema:
    """``length_mode='grapheme'`` makes every length-based rule on this
    node measure EXTENDED GRAPHEME CLUSTERS (the reference's
    String.length/1 semantics) via an Arrow-batched counter
    (text.grapheme_count) instead of the default JVM codepoint length —
    opt-in exactness for unicode-heavy corpora, off the hot path."""
    if length_mode not in ("chars", "grapheme"):
        raise ValueError(f"unknown length_mode: {length_mode!r}")
    s = Schema("string", coerce=coerce, error=error, length_mode=length_mode)
    if min is not None:
        s = s.gte(min)
    if max is not None:
        s = s.lte(max)
    if length is not None:
        s = s.length(length)
    return s


def integer(*, coerce: bool = False, error: str | None = None, **cons: Any) -> Schema:
    return _with_numeric_cons(Schema("integer", coerce=coerce, error=error), cons)


def float_(*, coerce: bool = False, error: str | None = None, **cons: Any) -> Schema:
    return _with_numeric_cons(Schema("float", coerce=coerce, error=error), cons)


def number(*, coerce: bool = False, error: str | None = None, **cons: Any) -> Schema:
    return _with_numeric_cons(Schema("number", coerce=coerce, error=error), cons)


def decimal(*, coerce: bool = False, precision: int = 38, scale: int = 18,
            error: str | None = None, **cons: Any) -> Schema:
    return _with_numeric_cons(
        Schema("decimal", coerce=coerce, error=error,
               precision=precision, scale=scale), cons)


def _with_numeric_cons(s: Schema, cons: Mapping[str, Any]) -> Schema:
    for k in ("gte", "lte", "gt", "lt", "multiple_of"):
        if cons.get(k) is not None:
            s = getattr(s, k)(cons[k])
    return s


def boolean(*, coerce: bool = False, error: str | None = None) -> Schema:
    return Schema("boolean", coerce=coerce, error=error)


def string_boolean(*, truthy: Sequence[str] | None = None,
                   falsy: Sequence[str] | None = None,
                   case: str = "insensitive", error: str | None = None) -> Schema:
    """Truthy/falsy string → boolean (types/string_boolean.ex:50-74)."""
    return Schema(
        "string_boolean", error=error, case=case,
        truthy=list(truthy or ["true", "1", "yes", "on", "y", "enabled"]),
        falsy=list(falsy or ["false", "0", "no", "off", "n", "disabled"]),
    )


def literal(value: Any, *, error: str | None = None) -> Schema:
    return Schema("literal", value=value, error=error)


def null(*, error: str | None = None) -> Schema:
    return Schema("null", error=error)


def any_() -> Schema:
    return Schema("any")


def atom(*, coerce: bool = False, error: str | None = None) -> Schema:
    """BEAM atoms have no Spark analogue; treated as categorical
    strings (SURVEY §1.3)."""
    return Schema("string", coerce=coerce, error=error)


def enum(values: Sequence[Any] | Mapping[Any, Any], *, coerce: bool = False,
         error: str | None = None) -> Schema:
    """Membership; a mapping remaps value→key on parse
    (types/enum.ex:53-66)."""
    if isinstance(values, Mapping):
        pairs = list(values.items())
    else:
        pairs = [(v, v) for v in values]
    return Schema("enum", pairs=pairs, coerce=coerce, error=error)


def date(*, coerce: bool = False, error: str | None = None, **cons: Any) -> Schema:
    return _with_numeric_cons(Schema("date", coerce=coerce, error=error), cons)


def time(*, coerce: bool = False, error: str | None = None, **cons: Any) -> Schema:
    return _with_numeric_cons(Schema("time", coerce=coerce, error=error), cons)


def datetime(*, coerce: bool = False, error: str | None = None, **cons: Any) -> Schema:
    return _with_numeric_cons(Schema("datetime", coerce=coerce, error=error), cons)


def naive_datetime(*, coerce: bool = False, error: str | None = None,
                   **cons: Any) -> Schema:
    return _with_numeric_cons(
        Schema("naive_datetime", coerce=coerce, error=error), cons)


def array(inner: Schema, *, coerce: bool = False, error: str | None = None,
          min_length: int | None = None, max_length: int | None = None,
          length: int | None = None, unique_items: bool = False) -> Schema:
    s = Schema("array", inner=inner, coerce=coerce, error=error)
    if min_length is not None:
        s = s.gte(min_length)
    if max_length is not None:
        s = s.lte(max_length)
    if length is not None:
        s = s.length(length)
    if unique_items:
        s = s._check("unique_items")
    return s


list_ = array  # Zoi list/2 alias (lib/zoi.ex:1932)


def map_set(inner: Schema, *, coerce: bool = False,
            error: str | None = None) -> Schema:
    """Set with element schema — array + implicit unique-items
    semantics (types/map_set.ex)."""
    return array(inner, coerce=coerce, error=error, unique_items=True)


def tuple_(fields: Sequence[Schema], *, error: str | None = None) -> Schema:
    return Schema("tuple", fields=list(fields), error=error)


def fields(field_map: Mapping[str, Schema], *, strict: bool = False,
           unrecognized: "str | tuple | None" = None, coerce: bool = False,
           empty_values: Sequence[Any] = (),
           error: str | None = None) -> Schema:
    """Map/struct/keyword with declared fields; required-by-default
    (types/map.ex:13-29).

    ``unrecognized`` ∈ {strip (default), error, preserve} or the
    validated-preserve form ``("preserve", key_schema, value_schema)``
    — extra keys are parsed through ``Zoi.map(key_schema,
    value_schema)`` and preserved when valid (types/key_value.ex:
    104-129, 186-196). ``strict=True`` is sugar for
    ``unrecognized='error'``; combining it with a DIFFERENT explicit
    mode is contradictory and raises (it used to silently win).

    ``empty_values``: per-schema list of raw values treated as MISSING
    (required error / default fill / skip), mirroring
    types/key_value.ex:82-84; the Form preset is ``("",)``."""
    if strict:
        if unrecognized not in (None, "error"):
            raise ValueError(
                "strict=True means unrecognized='error'; combining it "
                f"with unrecognized={unrecognized!r} is contradictory")
        unrecognized = "error"
    elif unrecognized is None:
        unrecognized = "strip"
    if isinstance(unrecognized, tuple):
        if (len(unrecognized) != 3 or unrecognized[0] != "preserve"
                or not isinstance(unrecognized[1], Schema)
                or not isinstance(unrecognized[2], Schema)):
            raise ValueError(
                "unrecognized= must be 'strip' | 'error' | 'preserve' | "
                "('preserve', key_schema, value_schema)")
    elif unrecognized not in ("strip", "error", "preserve"):
        raise ValueError(f"unknown unrecognized mode: {unrecognized!r}")
    return Schema("fields", fields=dict(field_map), unrecognized=unrecognized,
                  empty_values=tuple(empty_values), coerce=coerce, error=error)


map_ = fields
struct = fields
keyword = fields
object = fields  # Zoi object/2 alias (lib/zoi.ex)


def map_kv(key: Schema, value: Schema, *, coerce: bool = False,
           error: str | None = None) -> Schema:
    """Homogeneous map: per-entry key+value parse, error path = key
    (types/map.ex:63-86)."""
    return Schema("map_kv", key=key, value=value, coerce=coerce, error=error)


def union(schemas: Sequence[Schema], *, error: str | None = None) -> Schema:
    """First-match-wins; on total failure report the LAST branch's
    errors (types/union.ex:23-37)."""
    if len(schemas) < 2:
        raise ValueError("Union type must receive a list of minimum 2 schemas")
    return Schema("union", schemas=list(schemas), error=error)


def intersection(schemas: Sequence[Schema], *, error: str | None = None) -> Schema:
    """All must pass sequentially; halt on first failing branch; value
    of last parse wins (types/intersection.ex:23-37)."""
    if len(schemas) < 2:
        raise ValueError("Intersection type must receive a list of minimum 2 schemas")
    return Schema("intersection", schemas=list(schemas), error=error)


def discriminated_union(discriminator: str, schemas: Sequence[Schema], *,
                        error: str | None = None) -> Schema:
    """O(1) dispatch on a literal discriminator field; duplicate
    discriminators rejected at construction
    (types/discriminated_union.ex:20-52)."""
    lookup: dict[Any, Schema] = {}
    for s in schemas:
        if s.kind != "fields" or discriminator not in s.params["fields"]:
            raise ValueError(
                f"every branch must be a fields schema containing '{discriminator}'")
        disc_schema = s.params["fields"][discriminator]
        if disc_schema.kind != "literal":
            raise ValueError(f"discriminator '{discriminator}' must be a literal")
        key = disc_schema.params["value"]
        if key in lookup:
            raise ValueError(f"duplicate discriminator value: {key!r}")
        lookup[key] = s
    return Schema("discriminated_union", discriminator=discriminator,
                  lookup=lookup, error=error)


def lazy(thunk: Callable[[], Schema], *, max_depth: int = 3) -> Schema:
    """Recursive schema via bounded unrolling — Spark schemas cannot be
    recursive (SURVEY §7 hard parts); beyond ``max_depth`` the value is
    accepted opaquely."""
    return Schema("lazy", thunk=thunk, max_depth=max_depth)


def json(*, max_depth: int = 3) -> Schema:
    """Recursive union of JSON types (types/json.ex:4-16) — kept as a
    string column probed with JVM-side JSON functions."""
    return Schema("json", max_depth=max_depth)


def codec(from_schema: Schema, to_schema: Schema, *,
          decode: Callable | None = None,
          encode: Callable | None = None) -> Schema:
    """Bidirectional pair: parse = from→decode→to; encode = reverse
    (types/codec.ex:38-67). decode/encode are Column->Column builders."""
    return Schema("codec", from_schema=from_schema, to_schema=to_schema,
                  decode=decode, encode=encode)


# -- derived string formats (lib/zoi.ex:2404-2566) --------------------------

def email(*, pattern: str = "default", error: str | None = None) -> Schema:
    pat = {
        "default": regexes.EMAIL,
        "html5": regexes.HTML5_EMAIL,
        "rfc5322": regexes.RFC5322_EMAIL,
        "simple": regexes.SIMPLE_EMAIL,
    }[pattern]
    return string()._check("regex", error, pattern=pat, format="email")


def uuid(*, version: str | None = None, error: str | None = None) -> Schema:
    return string()._check("regex", error, pattern=regexes.uuid(version),
                           format="uuid")


def url(*, error: str | None = None) -> Schema:
    """scheme ∈ {http,https} AND host present (types/string.ex:121-131)."""
    return string()._check("url", error)


def ipv4(*, error: str | None = None) -> Schema:
    return string()._check("regex", error, pattern=regexes.IPV4, format="ipv4")


def ipv6(*, error: str | None = None) -> Schema:
    return string()._check("regex", error, pattern=regexes.IPV6, format="ipv6")


def hex(*, error: str | None = None) -> Schema:
    return string()._check("regex", error, pattern=regexes.HEX, format="hex")


def base64(*, error: str | None = None) -> Schema:
    return string()._check("regex", error, pattern=regexes.BASE64, format="base64")


def base64url(*, error: str | None = None) -> Schema:
    return string()._check("regex", error, pattern=regexes.BASE64URL,
                           format="base64url")


def jwt(*, error: str | None = None) -> Schema:
    return string()._check("regex", error, pattern=regexes.JWT, format="jwt")


# -- ISO string validators (keep the string, lib/zoi/iso.ex:37-143) ---------

def iso_date(*, error: str | None = None) -> Schema:
    return string()._check("iso", error, which="date")


def iso_time(*, error: str | None = None) -> Schema:
    return string()._check("iso", error, which="time")


def iso_datetime(*, error: str | None = None) -> Schema:
    return string()._check("iso", error, which="datetime")


def iso_naive_datetime(*, error: str | None = None) -> Schema:
    return string()._check("iso", error, which="naive_datetime")


# -- ISO string → native struct transforms (lib/zoi/iso.ex:148-196) ----------

def to_date_struct(schema: Schema) -> Schema:
    """Append the ISO-string→Date conversion (``Zoi.ISO.to_date_struct``,
    lib/zoi/iso.ex:162-169) — chain-ordered after the format check.
    try_-variants throughout: transforms also evaluate on rows whose
    format check failed (errors collected, value null), and ANSI casts
    must classify, never abort."""
    from pyspark.sql import functions as F
    return schema.transform(
        lambda c: F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).cast("date"))


def to_datetime_struct(schema: Schema) -> Schema:
    """ISO string → timestamp (``Zoi.ISO.to_datetime_struct``,
    lib/zoi/iso.ex:176-183)."""
    from pyspark.sql import functions as F
    return schema.transform(
        lambda c: F.try_to_timestamp(F.replace(c, F.lit("T"), F.lit(" "))))


def to_naive_datetime_struct(schema: Schema) -> Schema:
    """ISO string → TIMESTAMP_NTZ (``Zoi.ISO.to_naive_datetime_struct``,
    lib/zoi/iso.ex:190-196)."""
    from pyspark.sql import functions as F
    return schema.transform(
        lambda c: F.try_to_timestamp(F.replace(c, F.lit("T"), F.lit(" ")))
        .cast("timestamp_ntz"))


def to_time_struct(schema: Schema) -> Schema:
    """``Zoi.ISO.to_time_struct`` (lib/zoi/iso.ex:148-155). Spark has no
    TimeType: the validated time string is normalized (fraction
    stripped) and KEPT a string — documented delta vs the reference's
    %Time{} struct."""
    from pyspark.sql import functions as F
    return schema.transform(
        lambda c: F.date_format(
            F.try_to_timestamp(F.concat(F.lit("1970-01-01 "), c)),
            "HH:mm:ss"))


# ---------------------------------------------------------------------------
# schema algebra (lib/zoi.ex:1658-1684, lib/zoi/schema.ex:70-238)
# ---------------------------------------------------------------------------

def extend(base: Schema, other: Schema | Mapping[str, Schema]) -> Schema:
    """Merge fields; right-hand side wins; options inherited from the
    left (types/extend.ex:4-55)."""
    _require_fields(base, "extend")
    rhs = other.params["fields"] if isinstance(other, Schema) else dict(other)
    new = base._clone()
    merged = dict(new.params["fields"])
    merged.update(rhs)
    new.params["fields"] = merged
    return new


def pick(base: Schema, keys: Sequence[str]) -> Schema:
    _require_fields(base, "pick")
    new = base._clone()
    new.params["fields"] = {k: v for k, v in base.params["fields"].items()
                            if k in set(keys)}
    return new


def omit(base: Schema, keys: Sequence[str]) -> Schema:
    _require_fields(base, "omit")
    new = base._clone()
    new.params["fields"] = {k: v for k, v in base.params["fields"].items()
                            if k not in set(keys)}
    return new


def _require_fields(s: Schema, op: str) -> None:
    if s.kind != "fields":
        raise ValueError(f"{op}/2 requires a fields schema, got {s.kind}")


def traverse(schema: Schema, fn: Callable[[Schema, tuple], Schema],
             _path: tuple = ()) -> Schema:
    """Post-order rewrite of the schema tree (Zoi.Schema.traverse/2,
    lib/zoi/schema.ex:70-238); lazy nodes are leaves."""
    s = schema._clone()
    if s.kind == "fields":
        s.params["fields"] = {
            k: traverse(v, fn, _path + (k,)) for k, v in s.params["fields"].items()}
    elif s.kind == "array":
        s.params["inner"] = traverse(s.params["inner"], fn, _path + ("[]",))
    elif s.kind == "tuple":
        s.params["fields"] = [traverse(v, fn, _path + (i,))
                              for i, v in enumerate(s.params["fields"])]
    elif s.kind == "map_kv":
        s.params["key"] = traverse(s.params["key"], fn, _path + ("<key>",))
        s.params["value"] = traverse(s.params["value"], fn, _path + ("<value>",))
    elif s.kind in ("union", "intersection"):
        s.params["schemas"] = [traverse(v, fn, _path) for v in s.params["schemas"]]
    elif s.kind == "discriminated_union":
        s.params["lookup"] = {k: traverse(v, fn, _path)
                              for k, v in s.params["lookup"].items()}
    elif s.kind == "codec":
        s.params["from_schema"] = traverse(s.params["from_schema"], fn, _path)
        s.params["to_schema"] = traverse(s.params["to_schema"], fn, _path)
    return fn(s, _path)


def coerce(schema: Schema) -> Schema:
    """Flip coercion on ONE node (``Zoi.coerce/1``, lib/zoi.ex:417-418);
    use :func:`coerce_all` for the whole tree."""
    return schema.with_coerce(True)


def coerce_all(schema: Schema) -> Schema:
    """Flip coercion on every node (Zoi.Form.prepare-style lenient
    ingest, lib/zoi/form.ex:21-62)."""
    return traverse(schema, lambda s, _p: s.with_coerce(True))


def reverse_codecs(schema: Schema) -> Schema:
    """Swap every codec's direction: encode = to→encode-fn→from, the
    mirror image of parse (types/codec.ex:38-50). ``Zoi.encode/3``
    becomes ``validate(df, reverse_codecs(schema))``."""
    def flip(s: Schema, _p: tuple) -> Schema:
        if s.kind != "codec":
            return s
        new = s._clone()
        new.params["from_schema"] = s.params["to_schema"]
        new.params["to_schema"] = s.params["from_schema"]
        new.params["decode"] = s.params.get("encode")
        new.params["encode"] = s.params.get("decode")
        return new
    return traverse(schema, flip)


# ---------------------------------------------------------------------------
# custom-type extension point (Zoi.Type)
# ---------------------------------------------------------------------------

# kind -> type-stage fn. The reference lets users implement the
# Zoi.Type behaviour for their own types (lib/zoi/type.ex:1-62: a
# parse/2 callback the engine dispatches to by struct module); the
# columnar analogue is a registered type-stage hook the compiler
# dispatches to by kind string.
_CUSTOM_KINDS: dict[str, Any] = {}


def register_kind(kind: str, type_stage: Any, *, replace: bool = False,
                  category: str = "number") -> None:
    """Register a custom type kind (``Zoi.Type`` analogue,
    lib/zoi/type.ex:1-62).

    ``type_stage(schema, col, itype)`` must return the same 4-tuple the
    built-in type stages produce::

        (typed_value: Column,   # the parsed value (nil where invalid)
         type_ok: Column,       # boolean predicate: type parse passed
         error_spec,            # errors.ErrorSpec | None for type errors
         out_type: DataType)    # Spark type of typed_value

    Everything downstream composes automatically: refinements/
    transforms/codec chains, required/optional/nullable/default meta,
    error collection and parsed-nil gating all run on top of the
    returned stage, exactly as they do for built-in kinds. Refine/
    transform/codec remain the right tool for one-off cases; register
    a kind when a reusable type with its own coercion rule is wanted.

    Built-in kinds cannot be shadowed, and re-registration requires
    ``replace=True`` (guards against import-order surprises).
    ``category`` picks the message family ("number"/"string"/"date")
    ordering and length checks phrase their errors with.
    """
    from . import errors as E
    if kind in _BUILTIN_KINDS:
        raise ValueError(f"cannot shadow built-in kind {kind!r}")
    if not replace and kind in _CUSTOM_KINDS:
        raise ValueError(f"custom kind {kind!r} already registered; "
                         "pass replace=True to overwrite")
    _CUSTOM_KINDS[kind] = type_stage
    E.register_type_category(kind, category)


def unregister_kind(kind: str) -> None:
    """Remove a registered custom kind (mainly for tests)."""
    from . import errors as E
    _CUSTOM_KINDS.pop(kind, None)
    E.unregister_type_category(kind)


def custom(kind: str, *, error: str | None = None, **params: Any) -> Schema:
    """Schema node for a registered custom kind (see
    :func:`register_kind`); raises if the kind is unknown so typos
    fail at schema-build time, not deep inside compilation."""
    if kind not in _CUSTOM_KINDS:
        raise KeyError(f"custom kind {kind!r} is not registered; call "
                       "register_kind first")
    return Schema(kind, error=error, **params)


# kinds the compiler handles natively — the shadow guard's denylist
_BUILTIN_KINDS = frozenset({
    "string", "integer", "float", "number", "boolean", "string_boolean",
    "decimal", "date", "time", "datetime", "naive_datetime", "null",
    "any", "atom", "literal", "enum", "json", "array", "list", "map_set",
    "tuple", "fields", "map_kv", "union", "intersection",
    "discriminated_union", "lazy", "codec",
})
