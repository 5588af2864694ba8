"""Run a compiled schema over a DataFrame.

The reference's ``Zoi.parse(schema, input)`` validates ONE term and
returns ``{:ok, parsed} | {:error, errors}`` (``lib/zoi.ex:207-218``).
Here one input term = one row (SURVEY §1.2): a validation run is a
single narrow projection over the table producing

* ``annotated``  — input columns + ``valid:boolean`` + ``errors`` array
  (the per-row ``{:ok,..}/{:error,..}``),
* ``violations`` — the exploded error rows ``(id…, rule_id, code, path,
  path_str, message)`` matching ``%Zoi.Error{}`` semantics,
* ``parsed``     — the coerced/transformed output under the target
  schema (Zoi's ``parsed`` value). Input columns are NEVER rewritten —
  parsed values are new columns, which is what makes the byte-identity
  invariant (BASELINE.md) hold by construction.

Everything is lazy: no collect, no driver-side loops; the error array is
one Catalyst expression evaluated inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compile import CompiledSchema, RuleInfo, compile_schema
from .schema import Schema


def rules_meta_df(spark, rules: Sequence[RuleInfo]) -> DataFrame:
    """Tiny driver-side rule catalog (one row per compiled rule) —
    broadcast-joined against exploded error ordinals."""
    rows = [(i, r.rule_id, r.code, list(r.path), r.message)
            for i, r in enumerate(rules)]
    return spark.createDataFrame(
        rows, "i int, rule_id string, code string, "
              "__static_path array<string>, __static_message string")


class ParseError(Exception):
    """Raised by validate_strict when any row violates the schema
    (mirrors ``Zoi.parse!/3`` / ``Zoi.ParseError``, lib/zoi.ex:234-242)."""

    def __init__(self, sample_rows: list):
        self.errors = sample_rows
        super().__init__(
            f"validation failed; first violations: {sample_rows[:5]!r}")


@dataclass
class ValidationResult:
    annotated: DataFrame
    compiled: CompiledSchema
    id_cols: tuple[str, ...]

    @property
    def rules(self) -> list[RuleInfo]:
        return self.compiled.rules

    @property
    def violations(self) -> DataFrame:
        """Exploded violation rows — Zoi's flattened error list with
        paths (lib/zoi/error.ex:118-120).

        The hot path emits only (ordinal, dynamic-path, dynamic-msg)
        cells; rule_id/code/static path/static message come from the
        driver-side rule catalog via a broadcast join — at 10^12-doc
        scale the per-row violation state stays a few bytes and the
        constant strings are never materialized per row.

        explode_OUTER, deliberately: for a plain (non-outer) explode the
        optimizer's InferFiltersFromGenerate rule injects a
        ``size(errors) > 0`` filter below the Generate, and predicate
        pushdown then re-inlines the ENTIRE rule expression into that
        Filter — every rule (and any expensive input like a JSON probe)
        evaluated a second time per row (measured 5× on the violations
        path). With outer explode no filter is inferred; rows with an
        empty error array surface as a null ``e`` and are dropped for
        free by the inner broadcast join below."""
        err = F.explode_outer(F.col("__zoi_errors")).alias("e")
        exploded = self.annotated.select(*self.id_cols, err)
        meta = F.broadcast(rules_meta_df(self.annotated.sparkSession,
                                         self.compiled.rules))
        path = F.coalesce(F.col("e.p"), F.col("__static_path"))
        return (
            exploded
            .join(meta, F.col("e.i") == meta["i"])
            .select(
                *self.id_cols,
                "rule_id",
                "code",
                path.alias("path"),
                F.array_join(path, ".").alias("path_str"),
                F.coalesce(F.col("e.m"), F.col("__static_message"))
                .alias("message"),
            )
        )

    @property
    def valid_rows(self) -> DataFrame:
        return (self.annotated.where(F.col("__zoi_valid"))
                .drop("__zoi_valid", "__zoi_errors", "__zoi_parsed"))

    @property
    def invalid_rows(self) -> DataFrame:
        return (self.annotated.where(~F.col("__zoi_valid"))
                .drop("__zoi_valid", "__zoi_errors", "__zoi_parsed"))

    @property
    def parsed(self) -> DataFrame:
        """id columns + the parsed (cast/transformed) fields expanded."""
        return self.annotated.select(*self.id_cols, F.col("__zoi_parsed.*"))

    def summary(self) -> DataFrame:
        """Per-rule violation counts — one shuffle on a tiny key space."""
        return (self.violations.groupBy("rule_id", "code")
                .agg(F.count("*").alias("n_violations"))
                .orderBy("rule_id"))

    def counts(self) -> DataFrame:
        return self.annotated.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("__zoi_valid").cast("long")).alias("n_valid"),
            F.sum((~F.col("__zoi_valid")).cast("long")).alias("n_invalid"),
        )

    def catalog(self) -> DataFrame:
        """Rule-catalog introspection as a DataFrame — ``(rule_id,
        code, path_str, message)`` for every compiled rule (fired or
        not): the lineage artifact reviewers diff between releases and
        dashboards join violation counts against. Driver-sized (one
        row per RULE, not per row of data)."""
        meta = rules_meta_df(self.annotated.sparkSession,
                             self.compiled.rules)
        return meta.select(
            "rule_id", "code",
            F.array_join("__static_path", ".").alias("path_str"),
            F.col("__static_message").alias("message"))


def validate(df: DataFrame, schema: Schema,
             id_cols: Sequence[str] = ()) -> ValidationResult:
    """Compile ``schema`` against ``df.schema`` and annotate every row.

    Collect-all semantics: every rule is evaluated for every row — no
    fail-fast — matching ``lib/zoi/validations.ex:10-28`` (only union /
    intersection / default short-circuit, by spec).
    """
    _warn_deprecated(schema)
    compiled = compile_schema(schema, df.schema)
    id_cols = tuple(id_cols) or tuple(df.columns[:1])
    # chain withColumn so `valid` references the materialized error
    # array instead of re-inlining the whole rule expression tree
    annotated = (
        df.withColumn("__zoi_errors", compiled.errors_col)
        .withColumn("__zoi_valid", F.size(F.col("__zoi_errors")) == 0)
        .withColumn("__zoi_parsed", compiled.parsed_col)
    )
    return ValidationResult(annotated, compiled, id_cols)


def _warn_deprecated(schema: Schema) -> None:
    """One driver-side DeprecationWarning per deprecated schema node
    (``maybe_warn_deprecated``, lib/zoi/context.ex:50-63 — per-value
    IO.warn collapses to once-per-run over a table)."""
    import warnings

    from .schema import traverse

    def visit(s: Schema, path: tuple) -> Schema:
        msg = s.metadata.get("deprecated")
        if msg:
            field = ".".join(str(p) for p in path) or "schema"
            warnings.warn(f"{field} is deprecated: {msg}",
                          DeprecationWarning, stacklevel=3)
        return s

    traverse(schema, visit)


# aliases mirroring the reference's API surface
parse = validate


def validate_strict(df: DataFrame, schema: Schema,
                    id_cols: Sequence[str] = (), sample: int = 20) -> DataFrame:
    """``Zoi.parse!/3``: raise on any violation, else return the parsed
    frame (lib/zoi.ex:234-242)."""
    res = validate(df, schema, id_cols)
    bad = res.violations.limit(sample).collect()
    if bad:
        raise ParseError([r.asDict() for r in bad])
    return res.parsed


def encode(df: DataFrame, schema: Schema,
           id_cols: Sequence[str] = ()) -> ValidationResult:
    """Codec reverse direction (``Zoi.encode/3``, lib/zoi.ex:3317-3344):
    every codec runs to→encode-fn→from instead of from→decode-fn→to."""
    from .schema import reverse_codecs

    return validate(df, reverse_codecs(schema), id_cols)


def prepare_form(df: DataFrame) -> DataFrame:
    """Lenient-ingest preset (``Zoi.Form.prepare/1``,
    lib/zoi/form.ex:21-62): empty strings in string columns become
    null (`empty_values = ["", nil]`, types/key_value.ex:82-84). Pair
    with ``z.coerce_all(schema)`` for the full HTML-form semantics."""
    out = df
    for f in df.schema.fields:
        if f.dataType.simpleString() == "string":
            out = out.withColumn(f.name, F.nullif(F.col(f.name), F.lit("")))
    return out

