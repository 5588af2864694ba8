"""Schema INFERENCE from semi-structured data — the reverse direction
of the compiler: where `zoi_spark.compile` turns a declared schema
into Column predicates, this derives a draft schema FROM a JSON
column, the bootstrap step every validation deployment starts with
(nobody hand-writes a 200-field rule-set; they infer, then tighten).

Typing rules are deliberately boring and engine-agnostic (the DuckDB
oracle re-derives them): a field is ``integer`` when every non-null
value matches ``^-?[0-9]+$``, ``float`` when every value is integer-
or-decimal shaped, ``boolean`` when every value is true/false,
``string`` otherwise; ``required`` when the field appears in every
valid-JSON row. Nested objects/arrays classify as ``string`` (their
JSON text) — inference is a starting draft, not a parser.

Reference seed: Zoi's from_json_schema (lib/zoi/json_schema/*) maps
declared JSON Schema to Zoi types; this module bootstraps when no
declaration exists at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import schema as S

_INT_RE = r"^-?[0-9]+$"
_FLOAT_RE = r"^-?[0-9]+\.[0-9]+$"


def schema_from_json_report(df: DataFrame, *, json_col: str
                            ) -> DataFrame:
    """Per-field inference report over a JSON string column:
    ``(field, inferred_type, n_present, n_docs, required)``.

    Shape at 10^12 rows: one ``from_json`` → map explode (bounded by
    keys per document), one (field)-keyed aggregation with map-side
    combine — field cardinality ≪ corpus. Rows whose JSON fails to
    parse are excluded from both the denominator and the per-field
    evidence (they are the validator's problem, not the inferrer's).
    """
    parsed = F.from_json(F.col(json_col), "map<string,string>")
    base = (df.where(F.col(json_col).isNotNull())
            .select(parsed.alias("__m"))
            .where(F.col("__m").isNotNull()))
    base = base.persist()
    n_docs = base.count()
    kv = base.select(F.explode("__m").alias("field", "__v"))
    is_int = F.col("__v").rlike(_INT_RE)
    is_float = is_int | F.col("__v").rlike(_FLOAT_RE)
    is_bool = F.col("__v").isin("true", "false")
    out = (kv.groupBy("field")
           .agg(F.count("*").cast("long").alias("n_present"),
                F.min(F.when(F.col("__v").isNull(), None)
                      .otherwise(is_int.cast("int"))).alias("__ai"),
                F.min(F.when(F.col("__v").isNull(), None)
                      .otherwise(is_float.cast("int"))).alias("__af"),
                F.min(F.when(F.col("__v").isNull(), None)
                      .otherwise(is_bool.cast("int"))).alias("__ab"))
           .select("field", "n_present",
                   F.lit(n_docs).cast("long").alias("n_docs"),
                   F.when(F.col("__ab") == 1, F.lit("boolean"))
                   .when(F.col("__ai") == 1, F.lit("integer"))
                   .when(F.col("__af") == 1, F.lit("float"))
                   .otherwise(F.lit("string")).alias("inferred_type"),
                   (F.col("n_present") == n_docs).alias("required"))
           .select("field", "inferred_type", "n_present", "n_docs",
                   "required"))
    out._zoi_persisted = [base]
    return out


_BUILDERS = {
    "integer": lambda: S.integer(coerce=True),
    "float": lambda: S.float_(coerce=True),
    "boolean": lambda: S.boolean(coerce=True),
    "string": lambda: S.string(),
}


def schema_from_report(rows) -> S.Schema:
    """Materialize the inference report (collected rows or (field,
    type, required) tuples) into a runnable `z.fields` schema —
    coercing scalars (JSON values arrive as strings), optional fields
    wrapped. The draft validates the corpus it was inferred from by
    construction; tighten from there."""
    fields = {}
    for r in sorted(rows, key=lambda r: r[0] if isinstance(r, tuple)
                    else r["field"]):
        if isinstance(r, tuple):
            name, typ, required = r[0], r[1], r[-1]
        else:
            name, typ, required = r["field"], r["inferred_type"], \
                r["required"]
        s = _BUILDERS[typ]()
        fields[name] = s if required else s.optional()
    return S.fields(fields)
