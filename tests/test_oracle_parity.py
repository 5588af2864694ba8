"""Driver-contract parity: every queries() entry with an oracle_sql()
twin must produce identical (row-count, schema-width, sorted values)
results to DuckDB at sf0.01 — a local replica of the driver's
CORRECTNESS gate."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(rows, columns):
    """Column-name-sorted, row-sorted, float-fuzz-rounded tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if (v == 0 or (v != v)) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


ORACLED = sorted(set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sorted(sdf.columns)
    spark_rows = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)

    rel = duck.sql(entry_mod.oracle_sql()[name])
    duck_cols = sorted(c.lower() for c in rel.columns)
    duck_rows = _normalize(rel.fetchall(), [c.lower() for c in rel.columns])

    assert spark_cols == duck_cols, f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row-count mismatch"
    mismatches = [(a, b) for a, b in zip(spark_rows, duck_rows) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
    # queries are independent: drop whatever the operator persisted for
    # its own reuse so 160+ parametrized runs don't accumulate caches
    spark.catalog.clearCache()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"doc_id", "rule_id"}


def test_bench_covers_every_query():
    """Every queries() entry must have a bench slot (headline, a
    round list, or the streaming-e2e section) and the bench lists
    must not name unknown queries — guards the drift VERDICT r3 #4
    warned about when waves land without a timing record."""
    import bench

    slots = (set(bench.HEADLINE_NAMES) | set(bench.R2_NAMES)
             | set(bench.R3_NAMES) | set(bench.R4_NAMES)
             | set(bench.R5_NAMES) | set(bench.STREAM_NAMES))
    roster = set(entry_mod.queries())
    assert roster - slots == set(), f"unbenched: {sorted(roster - slots)}"
    assert slots - roster == set(), f"unknown: {sorted(slots - roster)}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle must still execute and return rows."""
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
