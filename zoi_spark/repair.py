"""Violation repair suggestions — validation that proposes the fix.

For the repairable rule families of a flat fields schema, emit one
``(id, rule_id, current, suggestion)`` row per violating row:

- ``one_of`` — the dictionary value with the smallest Levenshtein
  distance to the observed value (ties → lexicographically smallest):
  'enn' → 'en'. Both engines ship the same classic edit distance
  (Spark ``levenshtein``, DuckDB ``levenshtein``), so suggestions are
  oracle-checkable.
- numeric ``gte``/``lte`` — clamp to the violated bound.
- string ``lte`` (max length) — truncate to the bound. String ``gte``
  (min length) has no honest mechanical repair and is skipped — a
  suggestion must never invent content.

Everything else (regex, starts_with, required, …) is reported by the
validator but not repairable mechanically; those rules emit nothing
here.

Scale shape: one Project over one scan per repairable rule family,
fused into a single concat-arrays + explode (the violations-row shape,
compile.py) — the enum candidate set is a constant literal array, so
the Levenshtein argmin is ``|enum|`` codegen terms per row, zero
shuffles, zero Python. Reference seed: Zoi reports errors with the
expected domain (lib/zoi/error.ex not_in_values); this closes the loop
from "invalid" to "here is the nearest valid value".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .schema import Schema

_NUMERIC = {"integer", "float", "number", "decimal"}


def suggest_repairs(df: DataFrame, schema: Schema, *,
                    id_col: str) -> DataFrame:
    """See module docstring. rule_id naming matches the compiled
    validator (``{field}.{check_kind}``) so repair rows join directly
    against ``ValidationResult.violations``."""
    if schema.kind != "fields":
        raise ValueError("suggest_repairs: top level must be "
                         f"z.fields(...), got {schema.kind!r}")
    emitters: list[Column] = []

    def emit(rule_id: str, violates: Column, current: Column,
             suggestion: Column) -> None:
        st = F.struct(F.lit(rule_id).alias("rule_id"),
                      current.cast("string").alias("current"),
                      suggestion.cast("string").alias("suggestion"))
        emitters.append(
            F.when(F.coalesce(violates, F.lit(False)), F.array(st))
            .otherwise(F.array().cast(
                "array<struct<rule_id:string,current:string,"
                "suggestion:string>>")))

    for name, child in schema.params["fields"].items():
        col = F.col(name)
        for chk in child.checks:
            p = dict(chk.params)
            if chk.kind == "one_of" and child.kind == "string":
                cands = sorted(str(v) for v in p["values"])
                best = F.sort_array(F.array(*[
                    F.struct(F.levenshtein(col, F.lit(v)).alias("d"),
                             F.lit(v).alias("v"))
                    for v in cands]))[0]["v"]
                emit(f"{name}.one_of",
                     col.isNotNull() & ~col.isin(*cands), col, best)
            elif chk.kind in ("gte", "lte") and child.kind in _NUMERIC:
                bound = F.lit(p["value"])
                bad = (col < bound) if chk.kind == "gte" else \
                    (col > bound)
                emit(f"{name}.{chk.kind}", col.isNotNull() & bad,
                     col, bound)
            elif (chk.kind == "lte" and child.kind == "string"):
                mx = int(p["value"])
                emit(f"{name}.lte",
                     col.isNotNull() & (F.length(col) > mx),
                     col, F.substring(col, 1, mx))
    if not emitters:
        raise ValueError("suggest_repairs: schema has no repairable "
                         "rules (one_of / numeric bounds / max length)")
    arr = F.concat(*emitters) if len(emitters) > 1 else emitters[0]
    return (df.select(F.col(id_col), F.explode(arr).alias("r"))
            .select(id_col, "r.rule_id", "r.current", "r.suggestion"))
