"""Data contracts — ONE verdict artifact per dataset release.

A contract bundles the three check families this engine already
compiles (row-level schema rules, aggregate expectations, referential
dictionaries) into a single uniform verdict frame ``(check, kind,
metric, passed)`` — the dbt-test / Great-Expectations-suite shape, so
"is this snapshot publishable" is one boolean fold over one small
DataFrame instead of three bespoke reports.

- ``schema:{rule_id}`` rows — violation COUNT per compiled rule,
  including zero-violation rules (the catalog comes from the compiled
  schema, not from observed violations — a rule that never fired is a
  passing row, not a missing row)
- ``expect:{name}`` rows — the fused-agg expectation battery
  (:func:`zoi_spark.tablechecks.expectation_suite`), metric = observed
- ``ref:{column}`` rows — broadcast-anti-join dictionary misses,
  metric = violating-row count

Scale shape: the schema part is one scan + a rule_id-keyed count of
the exploded violations (tiny key space) broadcast-joined against the
driver-side catalog; expectations are ONE fused agg; each reference is
one broadcast anti-join + count. Three check families = three jobs
riding three scans — deliberately NOT fused, so a contract over a
10^12-row table can run its cheap families first and short-circuit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import tablechecks
from .schema import Schema
from .validate import validate


def contract_check(df: DataFrame, *, schema: Schema | None = None,
                   expectations: "Sequence[dict] | None" = None,
                   references: "Sequence[tuple] | None" = None,
                   id_cols: "Sequence[str]" = ()) -> DataFrame:
    """Evaluate a data contract; returns ``(check, kind, metric,
    passed)`` — see module docstring. ``references`` entries are
    ``(column, dictionary_df)`` or ``(column, dictionary_df,
    dict_column)``."""
    if schema is None and not expectations and not references:
        raise ValueError("contract_check: empty contract (no schema, "
                         "expectations, or references)")
    parts: list[DataFrame] = []
    spark = df.sparkSession
    if schema is not None:
        res = validate(df, schema, id_cols=list(id_cols))
        catalog = spark.createDataFrame(
            [(r.rule_id,) for r in res.rules], "rule_id string")
        counts = (res.violations.groupBy("rule_id")
                  .agg(F.count("*").cast("double").alias("__n")))
        parts.append(
            catalog.join(counts, "rule_id", "left")
            .select(F.concat(F.lit("schema:"), "rule_id").alias("check"),
                    F.lit("schema").alias("kind"),
                    F.coalesce("__n", F.lit(0.0)).alias("metric"),
                    (F.coalesce("__n", F.lit(0.0)) == 0.0)
                    .alias("passed")))
    if expectations:
        parts.append(
            tablechecks.expectation_suite(df, expectations)
            .select(F.concat(F.lit("expect:"), "expectation")
                    .alias("check"),
                    "kind",
                    F.col("observed").alias("metric"),
                    "passed"))
    for ref in references or ():
        column, dictionary = ref[0], ref[1]
        dict_column = ref[2] if len(ref) > 2 else None
        cnt = (tablechecks.referential_violations(
                   df, column, dictionary, dict_column)
               .agg(F.count("*").cast("double").alias("metric")))
        parts.append(cnt.select(
            F.lit(f"ref:{column}").alias("check"),
            F.lit("referential").alias("kind"),
            "metric",
            (F.col("metric") == 0.0).alias("passed")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
