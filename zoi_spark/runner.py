"""Resumable validation runs: partition manifest, verdicts, lineage.

north_rule: "resumable from a checkpointed per-partition manifest
carrying lineage and metrics … emitting per-partition pass/fail
verdicts". The reference has no notion of partitions (one synchronous
BEAM process, SURVEY §3.1); this module is the engine-side contract:

* deterministic partition ids — ``pmod(xxhash64(id_col), n)`` is stable
  under repartitioning and cluster-size changes, so a resumed run on a
  different executor count skips exactly the finished work
* manifest — one parquet row per (run_id, partition_id) with status,
  row/violation metrics, wall-clock, and lineage (input path + schema
  fingerprint); a schema change invalidates resume by design
* resume — completed partitions are pruned with an isin predicate
  (≤ n_partitions driver-side ints; never a row-level anti-join)
* byte-identity — xxhash64 of the protected column before/after, a
  single anti-join that must return 0 rows (BASELINE.md invariant)
"""

from __future__ import annotations

import hashlib
import json
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import Schema
from .validate import ValidationResult, validate

PID_COL = "__zoi_pid"


def partition_id(key, n_partitions: int):
    return F.pmod(F.xxhash64(key), F.lit(n_partitions)).cast("int")


def schema_fingerprint(schema: Schema, input_type) -> str:
    """Driver-side stable hash of the compiled rule catalog — resume is
    only valid while the rule-set is unchanged."""
    from .compile import compile_schema

    compiled = compile_schema(schema, input_type)
    blob = json.dumps(
        [(r.rule_id, r.code, list(map(str, r.path)), r.message)
         for r in compiled.rules], sort_keys=True)
    return hashlib.md5(blob.encode()).hexdigest()


@dataclass
class RunSummary:
    run_id: str
    n_partitions_total: int
    n_partitions_skipped: int
    n_partitions_processed: int
    n_partitions_failed: int
    n_rows: int
    n_valid: int
    n_invalid: int
    n_violations: int
    elapsed_sec: float


class ValidationRunner:
    """Orchestrates a resumable full-table validation run."""

    def __init__(self, spark: SparkSession, schema: Schema, *,
                 id_col: str, n_partitions: int = 256,
                 manifest_dir: str, violations_dir: str | None = None,
                 input_lineage: str = ""):
        self.spark = spark
        self.schema = schema
        self.id_col = id_col
        self.n_partitions = n_partitions
        self.manifest_dir = manifest_dir
        self.violations_dir = violations_dir
        self.input_lineage = input_lineage

    # -- manifest ------------------------------------------------------------

    def read_manifest(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.manifest_dir)
        except Exception:
            return None

    def completed_partitions(self, run_id: str, fingerprint: str) -> set[int]:
        m = self.read_manifest()
        if m is None:
            return set()
        rows = (m.where((F.col("run_id") == run_id)
                        & (F.col("status").isin("pass", "fail"))
                        & (F.col("schema_fingerprint") == fingerprint))
                .select("partition_id").distinct().collect())
        return {r.partition_id for r in rows}

    # -- run -----------------------------------------------------------------

    def run(self, df: DataFrame, run_id: str, *, resume: bool = True
            ) -> RunSummary:
        t0 = time.time()
        fingerprint = schema_fingerprint(self.schema, df.schema)

        work = df.withColumn(PID_COL, partition_id(F.col(self.id_col),
                                                   self.n_partitions))
        skipped: set[int] = set()
        if resume:
            skipped = self.completed_partitions(run_id, fingerprint)
            if skipped:
                work = work.where(~F.col(PID_COL).isin(*skipped))

        res = validate(work, self.schema, id_cols=[self.id_col])

        if self.violations_dir:
            (res.violations
             .withColumn(PID_COL, partition_id(F.col(self.id_col),
                                               self.n_partitions))
             .write.mode("append").partitionBy(PID_COL)
             .parquet(self.violations_dir))

        # ONE aggregation for all per-partition verdicts + metrics
        verdicts = (
            res.annotated.groupBy(PID_COL)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.col("__zoi_valid").cast("long")).alias("n_valid"),
                F.sum((~F.col("__zoi_valid")).cast("long")).alias("n_invalid"),
                F.sum(F.size("__zoi_errors")).alias("n_violations"),
            )
            .withColumn("status", F.when(F.col("n_invalid") == 0,
                                         F.lit("pass")).otherwise(F.lit("fail")))
            .withColumn("run_id", F.lit(run_id))
            .withColumn("schema_fingerprint", F.lit(fingerprint))
            .withColumn("input_lineage", F.lit(self.input_lineage))
            .withColumn("finished_at", F.current_timestamp())
            .withColumnRenamed(PID_COL, "partition_id")
        )
        verdicts.write.mode("append").parquet(self.manifest_dir)

        # tiny driver-side fold over ≤ n_partitions rows
        m = (self.spark.read.parquet(self.manifest_dir)
             .where(F.col("run_id") == run_id))
        totals = m.agg(
            F.count("*").alias("p"),
            F.sum("n_rows").alias("r"), F.sum("n_valid").alias("v"),
            F.sum("n_invalid").alias("i"), F.sum("n_violations").alias("e"),
            F.sum((F.col("status") == "fail").cast("long")).alias("f"),
        ).collect()[0]
        return RunSummary(
            run_id=run_id,
            n_partitions_total=int(totals.p),
            n_partitions_skipped=len(skipped),
            n_partitions_processed=int(totals.p) - len(skipped),
            n_partitions_failed=int(totals.f or 0),
            n_rows=int(totals.r or 0),
            n_valid=int(totals.v or 0),
            n_invalid=int(totals.i or 0),
            n_violations=int(totals.e or 0),
            elapsed_sec=time.time() - t0,
        )


# ---------------------------------------------------------------------------
# byte-identity invariant (BASELINE.md: text per url byte-identical)
# ---------------------------------------------------------------------------

def content_hashes(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    return df.select(F.col(id_col),
                     F.xxhash64(F.col(content_col)).alias("__content_hash"))


def byte_identity_mismatches(before: DataFrame, after: DataFrame,
                             id_col: str, content_col: str) -> DataFrame:
    """Rows whose content hash changed — must be empty after any
    validation run (validation never rewrites inputs; parsed values are
    new columns)."""
    b = content_hashes(before, id_col, content_col).alias("b")
    a = content_hashes(after, id_col, content_col).alias("a")
    return (b.join(a, F.col(f"b.{id_col}") == F.col(f"a.{id_col}"), "inner")
            .where(F.col("b.__content_hash") != F.col("a.__content_hash"))
            .select(F.col(f"b.{id_col}")))


def assert_byte_identity(before: DataFrame, after: DataFrame,
                         id_col: str, content_col: str) -> bool:
    return byte_identity_mismatches(before, after, id_col,
                                    content_col).limit(1).count() == 0
