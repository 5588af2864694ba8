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


# candidate regex shapes for string columns, TIGHTEST FIRST — the
# first whose match share over non-null values is 1.0 wins; patterns
# chosen to be dialect-identical in Spark (Java regex) and DuckDB (RE2)
_SHAPE_LADDER = (
    r"^[0-9]+$",
    r"^[a-z]+$",
    r"^[A-Za-z]+$",
    r"^[A-Za-z0-9_-]+$",
)


def suggest_rules(df: DataFrame, columns=None, *,
                  enum_max: int | None = 20) -> DataFrame:
    """Draft-rule suggestion from a TYPED table — the profiling
    bootstrap for tabular data (the sibling of
    :func:`schema_from_json_report`, which bootstraps from JSON text):
    one fused aggregation pass derives, per column, the tightest rules
    the observed data already satisfies, as ``(column, rule,
    param_num, param_str)`` rows ready to be tightened by a human:

    - ``required`` (zero NULLs observed) or ``nullable``
    - numeric columns: ``gte`` (observed min), ``lte`` (observed max)
    - string columns: ``min_length`` / ``max_length``, ``regex``
      (tightest ladder shape every non-null value matches), and
      ``one_of`` (the comma-joined sorted vocabulary) when the exact
      distinct count is ≤ ``enum_max``
    - boolean columns: just the null-rule (their domain IS the rule)

    Scale shape: everything rides ONE ``df.agg`` (map-side combine,
    tiny final reduce) and a constant-size explode — except the
    ``one_of`` evidence, whose ``collect_set`` state grows with the
    column's distinct count REGARDLESS of the ``enum_max`` gate (the
    gate applies after aggregation). ``enum_max=None`` skips that
    aggregate entirely — the right call at 10^12 rows unless an HLL
    pass already bounded the column's cardinality.
    """
    dtypes = dict(df.dtypes)
    columns = list(columns or df.columns)
    numeric = {"tinyint", "smallint", "int", "bigint", "float",
               "double", "decimal"}
    aggs, emitters = [], []

    def _slot(col_expr, alias):
        aggs.append(col_expr.alias(alias))
        return F.col(alias)

    for c in columns:
        dt = dtypes[c].split("(")[0]
        nulls = _slot(F.sum(F.col(c).isNull().cast("long")), f"__n_{c}")

        def _rule(rule, num=None, s=None, cond=None, col=c):
            st = F.struct(
                F.lit(col).alias("column"), F.lit(rule).alias("rule"),
                (num if num is not None
                 else F.lit(None).cast("double")).alias("param_num"),
                (s if s is not None
                 else F.lit(None).cast("string")).alias("param_str"))
            emitters.append(
                F.when(cond, st) if cond is not None
                else st.alias(f"__r_{len(emitters)}"))

        _rule("required", cond=nulls == 0)
        _rule("nullable", cond=nulls > 0)
        if dt in numeric:
            mn = _slot(F.min(F.col(c)).cast("double"), f"__mn_{c}")
            mx = _slot(F.max(F.col(c)).cast("double"), f"__mx_{c}")
            _rule("gte", num=mn, cond=mn.isNotNull())
            _rule("lte", num=mx, cond=mx.isNotNull())
        elif dt == "string":
            lmn = _slot(F.min(F.length(c)).cast("double"), f"__lmn_{c}")
            lmx = _slot(F.max(F.length(c)).cast("double"), f"__lmx_{c}")
            _rule("min_length", num=lmn, cond=lmn.isNotNull())
            _rule("max_length", num=lmx, cond=lmx.isNotNull())
            # tightest ladder shape with 100% match over non-nulls
            shares = [_slot(F.avg(F.col(c).rlike(p).cast("double")),
                            f"__s{j}_{c}")
                      for j, p in enumerate(_SHAPE_LADDER)]
            pick = F.lit(None).cast("string")
            for share, pat in reversed(list(zip(shares, _SHAPE_LADDER))):
                pick = F.when(share == 1.0, F.lit(pat)).otherwise(pick)
            _rule("regex", s=pick, cond=pick.isNotNull())
            if enum_max is not None:
                nd = _slot(F.count_distinct(F.col(c)).cast("long"),
                           f"__nd_{c}")
                vocab = _slot(
                    F.array_join(F.array_sort(F.collect_set(c)), ","),
                    f"__v_{c}")
                _rule("one_of", s=vocab,
                      cond=(nd > 0) & (nd <= int(enum_max)))
    one = df.agg(*aggs)
    # conditional emitters are null structs when their condition fails;
    # explode keeps null elements, the final filter drops them
    return (one.select(F.explode(F.array(*emitters)).alias("r"))
            .select("r.*")
            .where(F.col("rule").isNotNull()))
