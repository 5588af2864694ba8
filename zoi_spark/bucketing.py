"""Bucketed-table helpers: co-located big-big joins without a shuffle.

Broadcast joins cover the dictionary-sized side (tablechecks), but the
big-big joins of a validation deployment — joining today's corpus
snapshot to yesterday's for drift/delta checks, joining violations back
to the corpus, self-joining on a stable doc id — shuffle BOTH sides on
every run unless the tables are pre-bucketed on the join key. Bucketing
pays the shuffle ONCE at write time: both sides stored hash-partitioned
(and optionally sorted) by the key into the same number of buckets, so
every later equi-join on that key reads co-located buckets with ZERO
Exchange in the plan — at 10^12 rows that is the difference between a
full-corpus shuffle per run and none.

Usage contract (Spark bucketing rules): both tables bucketed by the
SAME key into the SAME bucket count, `spark.sql.sources.bucketing
.enabled=true` (default), and the join key equal to the bucket key.
The helpers write through the session catalog (`saveAsTable`) because
bucket metadata lives in the catalog, not in parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, *, key: str, buckets: int,
                   sort: bool = True, path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``buckets`` should be sized like shuffle partitions at the target
    scale (rows_per_bucket × row_width ≲ executor memory); ``sort=True``
    additionally sorts within buckets so sort-merge joins skip their
    per-task sort."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket specs Spark plans a shuffle-free sort-merge join —
    verify with ``assert_no_shuffle_join``."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the executed plan of ``df`` re-shuffles either join
    side (an ``Exchange hashpartitioning`` above a scan) — the
    bucketing contract check a deployment runs once per pipeline
    change instead of discovering the lost co-location at 100 TB."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "join plan re-shuffles despite bucketing:\n" + plan[:2000])
