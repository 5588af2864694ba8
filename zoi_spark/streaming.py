"""Structured Streaming validation — the same compiled rule-set over an
unbounded stream.

The reference is strictly batch-of-one (``Zoi.parse/3`` on a single
term); its streaming analogue is "validate every arriving row". Because
the compiled rule expressions are pure per-row Columns, they apply to a
streaming DataFrame unchanged: ``readStream → withColumn(errors) →
writeStream``. Extras here:

* ``validate_stream`` — annotate a stream, optionally split valid /
  violation sinks (violations explode exactly like the batch path)
* ``windowed_violation_counts`` — per-rule violation rates in event-time
  windows with a watermark (late data handled by Spark state store)
* ``run_microbatch_manifest`` — foreachBatch wrapper that appends the
  same per-partition manifest rows as the batch runner, giving streams
  the identical checkpoint/lineage contract
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compile import compile_schema
from .schema import Schema


def validate_stream(sdf: DataFrame, schema: Schema) -> DataFrame:
    """Annotate a streaming DataFrame with valid/errors columns. Purely
    stateless — no watermark needed; every operator stays inside
    whole-stage codegen exactly as in batch."""
    compiled = compile_schema(schema, sdf.schema)
    return (sdf.withColumn("__zoi_errors", compiled.errors_col)
            .withColumn("__zoi_valid", F.size(F.col("__zoi_errors")) == 0))


def stream_violations(sdf: DataFrame, schema: Schema,
                      id_cols: list[str]) -> DataFrame:
    """Exploded violation rows over a stream. The rule catalog is a
    static broadcast side (stream-static joins are stateless)."""
    from .validate import rules_meta_df

    compiled = compile_schema(schema, sdf.schema)
    ann = sdf.withColumn("__zoi_errors", compiled.errors_col)
    meta = F.broadcast(rules_meta_df(sdf.sparkSession, compiled.rules))
    # explode_OUTER: a plain explode makes InferFiltersFromGenerate
    # inject a size()>0 filter that re-inlines the whole rule expression
    # (see ValidationResult.violations); null e rows drop in the join
    exploded = ann.select(*id_cols, F.explode_outer("__zoi_errors").alias("e"))
    return (exploded.join(meta, F.col("e.i") == meta["i"])
            .select(*id_cols, "rule_id", "code",
                    F.coalesce(F.col("e.m"), F.col("__static_message"))
                    .alias("message")))


def windowed_violation_counts(sdf: DataFrame, schema: Schema, *,
                              ts_col: str, window: str = "1 minute",
                              watermark: str = "2 minutes") -> DataFrame:
    """Per-rule violation counts in event-time windows. The watermark
    bounds state for late data (readStream → window agg → append)."""
    from .validate import rules_meta_df

    compiled = compile_schema(schema, sdf.schema)
    ann = sdf.withColumn("__zoi_errors", compiled.errors_col)
    exploded = (ann.withWatermark(ts_col, watermark)
                .select(F.col(ts_col),
                        F.explode_outer("__zoi_errors").alias("e")))
    counts = (exploded
              .where(F.col("e").isNotNull())
              .groupBy(F.window(F.col(ts_col), window).alias("w"),
                       F.col("e.i").alias("i"))
              .agg(F.count("*").alias("n_violations")))
    # join the static catalog AFTER the windowed agg — per-window keys
    # are ordinals (ints), the tiny broadcast join runs on agg output
    meta = F.broadcast(rules_meta_df(sdf.sparkSession, compiled.rules))
    return (counts.join(meta, "i")
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "rule_id", "n_violations"))


def run_microbatch_manifest(sdf: DataFrame, schema: Schema, *, id_col: str,
                            n_partitions: int, manifest_dir: str,
                            checkpoint_dir: str,
                            violations_dir: str | None = None,
                            trigger_once: bool = True):
    """foreachBatch bridge to the batch runner: each micro-batch appends
    the same manifest rows (run_id = batch id), so a streaming job is
    resumable/auditable through the identical partition-manifest
    contract as batch runs."""
    from .runner import ValidationRunner

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        runner = ValidationRunner(
            batch_df.sparkSession, schema, id_col=id_col,
            n_partitions=n_partitions, manifest_dir=manifest_dir,
            violations_dir=violations_dir,
            input_lineage=f"stream-microbatch-{batch_id}")
        runner.run(batch_df, run_id=f"batch-{batch_id}", resume=False)

    writer = (sdf.writeStream.foreachBatch(handle)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_violation_tracker(sdf: DataFrame, schema: Schema, *,
                               key_col: str,
                               timeout_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-key CUMULATIVE validation state across micro-batches — running
    row/violation counts and invalid-rate per key (e.g. per source
    host), with a processing-time timeout that flushes and clears idle
    keys so state stays bounded at web scale.

    This is the piece windowed aggregation can't express: the state is
    cumulative across ALL batches (no window boundary), updated by
    Arrow-batched pandas per group — the API the north rule names for
    custom stateful operators. Rows are pre-validated JVM-side
    (validate_stream) so the stateful function only folds two counters
    per key.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    ann = validate_stream(sdf, schema).select(
        F.col(key_col).cast("string").alias("__key"), "__zoi_valid")

    out_type = ("key string, n_rows long, n_invalid long, "
                "invalid_rate double, final boolean")
    state_type = "n_rows long, n_invalid long"

    def track(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n_rows, n_invalid = state.get
            state.remove()
            yield pd.DataFrame({
                "key": [key[0]], "n_rows": [n_rows],
                "n_invalid": [n_invalid],
                "invalid_rate": [n_invalid / n_rows if n_rows else 0.0],
                "final": [True]})
            return
        n_rows, n_invalid = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_rows += len(pdf)
            n_invalid += int((~pdf["__zoi_valid"]).sum())
        state.update((n_rows, n_invalid))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({
            "key": [key[0]], "n_rows": [n_rows], "n_invalid": [n_invalid],
            "invalid_rate": [n_invalid / n_rows if n_rows else 0.0],
            "final": [False]})

    return (ann.groupBy("__key")
            .applyInPandasWithState(track, out_type, state_type, "update",
                                    GroupStateTimeout.ProcessingTimeTimeout))


def dedup_stream(sdf: DataFrame, *, id_col: str = "url",
                 ts_col: str = "warc_ts", text_col: str | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming admission dedup: drop re-deliveries of the same key
    (or same content when ``text_col`` is given — the fingerprint is
    computed first so byte-identical re-crawls under different urls
    also collapse) within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` — state for a key is
    EVICTED once the watermark passes it, so state size is bounded by
    the (keys × horizon) arrival rate instead of growing forever like
    plain ``dropDuplicates`` would on an unbounded stream. That bound
    is the only shape that survives a perpetual crawl feed; horizon
    trade-off (longer = catches more re-deliveries, more state) is the
    caller's knob. Cross-horizon exact dedup belongs to the batch
    compaction pass (`dedup.exact_dedup` /
    `dedup.incremental_new_docs`) over the materialized sink.
    """
    from .text import fingerprint

    keys = [id_col]
    if text_col is not None:
        sdf = sdf.withColumn("__zoi_fp", fingerprint(F.col(text_col)))
        keys = ["__zoi_fp"]
    out = (sdf.withWatermark(ts_col, watermark)
           .dropDuplicatesWithinWatermark(keys))
    return out.drop("__zoi_fp") if text_col is not None else out


def stream_psi_drift(sdf: DataFrame, baseline: DataFrame, *,
                     ts_col: str, key_col: str,
                     window: str = "1 minute",
                     watermark: str = "2 minutes",
                     epsilon: float = 1e-9,
                     psi_threshold: float = 0.2) -> DataFrame:
    """STREAMING distribution-drift monitor: per event-time window,
    PSI of the observed ``key_col`` mix against a static baseline
    distribution — the online sibling of the batch KL/PSI checks
    (`tablechecks.drift_metrics`) and of `rolling_psi`. A crawl whose
    language mix lurches mid-stream alarms within one window +
    watermark delay instead of at the nightly batch audit.

    ``baseline`` is a static ``(key, share)`` frame (shares sum
    to 1). Two chained stateful operators (Spark ≥ 3.4, append
    mode): a watermarked (window, key) count, then a per-window fold
    that packs the joined cells into an array and computes PSI with
    higher-order functions — all JVM-side, no Python in the stream.
    Keys ABSENT from a window contribute no finite PSI term (their
    clamped contribution is unbounded); instead the monitor reports
    ``missing_share`` (baseline mass unseen this window) alongside
    ``psi_present`` and flags on either signal: ``drifted`` =
    psi_present > threshold. State is bounded by the watermark ×
    key-cardinality; the baseline joins broadcast (stream-static
    joins are stateless)."""
    wm = sdf.withWatermark(ts_col, watermark)
    counts = (wm.groupBy(F.window(F.col(ts_col), window).alias("w"),
                         F.col(key_col).alias("__k"))
              .agg(F.count("*").alias("__c")))
    b = F.broadcast(baseline.select(F.col(key_col).alias("__k"),
                                    F.col("share").alias("__p")))
    j = counts.join(b, "__k")
    per = (j.groupBy("w")
           .agg(F.collect_list(F.struct(F.col("__c").alias("c"),
                                        F.col("__p").alias("p")))
                .alias("cells")))
    # hoist the window total out of the PSI fold: referencing it
    # inside the lambda would re-run the count fold per element
    withn = per.select(
        "w", "cells",
        F.aggregate("cells", F.lit(0).cast("long"),
                    lambda acc, x: acc + x["c"]).alias("n"))
    eps = F.lit(float(epsilon))
    n = F.col("n")
    psi = F.aggregate(
        "cells", F.lit(0.0),
        lambda acc, x: acc
        + (x["c"] / n - x["p"])
        * (F.log(F.greatest(x["c"] / n, eps))
           - F.log(F.greatest(x["p"], eps))))
    covered = F.aggregate("cells", F.lit(0.0),
                          lambda acc, x: acc + x["p"])
    return withn.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        n,
        F.round(psi, 6).alias("psi_present"),
        F.round(1.0 - covered, 6).alias("missing_share"),
        (F.round(psi, 6) > F.lit(float(psi_threshold)))
        .alias("drifted"))
