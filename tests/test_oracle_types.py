"""Roster-wide oracle OUTPUT-TYPE audit (VERDICT r4 items #1/#6).

The driver's CORRECTNESS hash renders values, so type skew between a
DuckDB oracle and its Spark twin can flip `hash_match` even when the
values are numerically identical:

* DuckDB **HUGEINT** (un-cast windowed ``sum(CASE...)``) materializes
  through pandas/Arrow as *float*, so ``3.0`` hashes differently from
  Spark's bigint ``3`` — the r4 ``sessionize_events`` red row.
* DuckDB **DECIMAL** (``round()`` over decimal inputs) materializes as
  ``decimal.Decimal``, again rendering differently from Spark's double.
* Int-width skew (DuckDB BIGINT ``row_number`` vs Spark IntegerType)
  happens to render identically today but is the same fragility class.

These tests audit every ``oracle_sql()`` relation at sf0.001 (cheap:
DuckDB evaluates the full roster in ~2 s) and compare against the lazy
Spark result schema, so a new wave can never reintroduce the skew.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TYPEAUDIT_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB type -> Spark simpleString.  TIMESTAMP maps to BOTH
# timestamp and timestamp_ntz: DuckDB TIMESTAMP is naive, and under the
# repo-wide UTC session timezone both Spark types materialize as the
# same naive datetime — no rendering skew is possible.
_SCALAR_MAP = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "TINYINT": {"tinyint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
    "BLOB": {"binary"},
}

_BANNED = ("HUGEINT", "UHUGEINT")


def _spark_equivalents(duck_type: str) -> set:
    """Spark simpleStrings an oracle column of this DuckDB type may
    carry without rendering skew.  Arrays recurse; DECIMAL demands an
    exact-precision decimal twin (mismatched DECIMAL vs double is the
    landmine)."""
    duck_type = duck_type.strip()
    if duck_type.endswith("[]"):
        return {f"array<{inner}>"
                for inner in _spark_equivalents(duck_type[:-2])}
    if duck_type.startswith("DECIMAL"):
        return {duck_type.lower()}
    return _SCALAR_MAP.get(duck_type, {duck_type.lower()})


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_no_hugeint_oracle_columns(duck):
    """No oracle relation may output HUGEINT/UHUGEINT — DuckDB renders
    int128 through pandas as float, which value-hash-mismatches the
    Spark bigint twin (the r4 `sessionize_events` failure mode)."""
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = duck.sql(sql)
        bad = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
               if any(b in str(t) for b in _BANNED)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"HUGEINT-producing oracles (cast to ::BIGINT): {offenders}")


def test_oracle_columns_match_spark_schema(spark, duck):
    """Every oracle output column must carry a DuckDB type whose
    pandas/Arrow materialization matches the Spark twin's schema —
    exact width, no DECIMAL-vs-double skew.  Spark schemas are built
    lazily (no collect), so the full 575-query roster audits in a few
    minutes."""
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    offenders = {}
    for name, sql in oracles.items():
        rel = duck.sql(sql)
        duck_types = {c.lower(): str(t)
                      for c, t in zip(rel.columns, rel.types)}
        sdf = queries[name](spark, SF_DIR)
        spark_types = {f.name.lower(): f.dataType.simpleString()
                       for f in sdf.schema.fields}
        bad = []
        for col, dt in duck_types.items():
            st = spark_types.get(col)
            if st is None:
                bad.append(f"{col}: oracle-only column ({dt})")
            elif st not in _spark_equivalents(dt):
                bad.append(f"{col}: duckdb {dt} vs spark {st}")
        extra = sorted(set(spark_types) - set(duck_types))
        if extra:
            bad.append(f"spark-only columns: {extra}")
        if bad:
            offenders[name] = bad
        spark.catalog.clearCache()
    assert not offenders, (
        "oracle/Spark output-type skew (add a cast or a "
        "_ORACLE_TYPE_FIXUPS entry in __spark_entry__.py): "
        f"{offenders}")
