"""Table-level checks — the scale-out side the reference only implies.

The reference validates one value at a time; its only cross-value check
is array `unique_items` (``types/array.ex:260-274``) and membership
(``types/enum.ex:53-66``). At 10^12-document scale (BASELINE.json
north_rule) those semantics become distributed jobs:

* uniqueness on a key      → salted two-phase aggregation (skew-safe)
* referential membership   → broadcast hash join (left_anti violations)
* per-column stats         → ONE fused aggregation pass (operator
  fusion, SURVEY §4 item 2): null counts, HLL distinct, min/max,
  length histograms — a single job, single shuffle-free partial agg
* distribution drift       → histogram snapshot + driver-side KL/PSI
  over ≤~100-bucket arrays (tiny driver math, no extra job)

Every function returns lazy DataFrames / plain dicts; no driver loops
over rows.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import errors as E


# ---------------------------------------------------------------------------
# uniqueness (Zoi `:not_unique`, error.ex:655-667, lifted to table level)
# ---------------------------------------------------------------------------

def duplicates(df: DataFrame, key: str, *, salt_partitions: int | None = None
               ) -> DataFrame:
    """Rows whose ``key`` occurs more than once → violation rows
    ``(key, n_occurrences, rule_id, code, message)``.

    Scale notes: a plain ``groupBy(key).count()`` hash-shuffles on the
    key — correct but hot keys (one host with 10^9 urls) overload a
    reducer. Two-phase salted aggregation bounds any single task:
    phase 1 counts ``(key, salt)`` groups (map-side partial agg does
    most of the work), phase 2 re-aggregates per key over at most
    ``salt_partitions`` rows per key. AQE skew hints only help joins,
    not groupBy hot keys (SURVEY §4 item 1), hence explicit salting.
    """
    spec = E.not_unique()
    if salt_partitions and salt_partitions > 1:
        salted = df.select(
            F.col(key),
            (F.xxhash64(F.monotonically_increasing_id(), F.col(key))
             % salt_partitions).alias("__salt"),
        )
        phase1 = salted.groupBy(key, "__salt").agg(F.count("*").alias("c"))
        counts = phase1.groupBy(key).agg(F.sum("c").alias("n_occurrences"))
    else:
        counts = df.groupBy(key).agg(F.count("*").alias("n_occurrences"))
    return (
        counts.where(F.col("n_occurrences") > 1)
        .select(
            F.col(key),
            F.col("n_occurrences"),
            F.lit(f"{key}.unique").alias("rule_id"),
            F.lit(spec.code).alias("code"),
            F.lit(spec.message).alias("message"),
        )
    )


def assert_unique(df: DataFrame, key: str, **kw) -> bool:
    """True when no duplicates exist (single count job)."""
    return duplicates(df, key, **kw).limit(1).count() == 0


def suggest_salt(df: DataFrame, key: str, *, sample_fraction: float = 0.01,
                 target_rows_per_task: int = 5_000_000,
                 max_salt: int = 1024, seed: int = 42) -> int:
    """Choose the salt factor for :func:`duplicates` from a SAMPLED
    key-frequency sketch (SURVEY §7 hard parts): sample the key column,
    estimate the hottest key's full-data count by scaling the sampled
    max, and size the salt so no single reducer task sees more than
    ``target_rows_per_task`` rows of one key.

    One tiny seeded-sample job at plan time (deterministic across
    resumes — the seed is fixed); at 10^12 rows a 1% sample of one
    column is ~instant next to the aggregation it protects. Returns 1
    (no salting) when even the hottest key fits a task."""
    import math

    top = (df.select(key).sample(fraction=sample_fraction, seed=seed)
           .groupBy(key).agg(F.count("*").alias("c"))
           .agg(F.max("c")).collect()[0][0])
    est_max = (top or 0) / sample_fraction
    return max(1, min(max_salt, math.ceil(est_max / target_rows_per_task)))


# ---------------------------------------------------------------------------
# referential membership (Zoi enum/one_of lifted to a dictionary join)
# ---------------------------------------------------------------------------

def referential_violations(df: DataFrame, column: str, dictionary: DataFrame,
                           dict_column: str | None = None) -> DataFrame:
    """Rows whose ``column`` has no match in ``dictionary`` — broadcast
    left-anti join (the dictionary is small by definition; Zoi analogue
    ``types/enum.ex:53-66`` at table scale, SURVEY §2.6)."""
    dict_column = dict_column or column
    dim = F.broadcast(dictionary.select(F.col(dict_column).alias("__dict_key"))
                      .distinct())
    spec = E.not_in_values(["<dictionary>"])
    return (
        df.join(dim, on=df[column] == dim["__dict_key"], how="left_anti")
        .withColumn("rule_id", F.lit(f"{column}.referential"))
        .withColumn("code", F.lit("not_in_values"))
        .withColumn("message",
                    F.concat(F.lit("invalid value: '"),
                             F.col(column).cast("string"),
                             F.lit(f"' not present in reference dictionary "
                                   f"for {column}")))
    )


def enum_violations(df: DataFrame, column: str, values: Sequence) -> DataFrame:
    """In-literal variant: small value lists stay a Column predicate
    (no join at all — cheapest plan)."""
    spec = E.not_in_values(list(values))
    return (
        df.where(~F.col(column).isin(*values) | F.col(column).isNull())
        .withColumn("rule_id", F.lit(f"{column}.one_of"))
        .withColumn("code", F.lit(spec.code))
        .withColumn("message", F.lit(spec.message))
    )


# ---------------------------------------------------------------------------
# single-pass stats (operator fusion — SURVEY §4 item 2)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class HistogramSpec:
    column: str          # numeric column (or length_of= a string column)
    lo: float
    hi: float
    buckets: int = 20
    length_of: bool = False  # histogram of length(column) instead of value


def _bucket_expr(col, lo: float, hi: float, buckets: int):
    """width_bucket semantics: bucket 0 = underflow, buckets+1 = overflow."""
    width = (hi - lo) / buckets
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("int") + 1
    return (
        F.when(col.isNull(), F.lit(None))
        .when(col < lo, F.lit(0))
        .when(col >= hi, F.lit(buckets + 1))
        .otherwise(raw)
    )


def column_stats(df: DataFrame, columns: Sequence[str] | None = None,
                 histograms: Sequence[HistogramSpec] = (),
                 hll_rsd: float = 0.05, exact_distinct: bool = False) -> DataFrame:
    """ONE aggregation over all requested columns: per column null
    count, approx distinct (HyperLogLog sketch), min, max, and string
    avg-length — plus bucketed histograms as count-map columns.

    This is the engine's fused stats operator: one job, one partial-agg
    (map-side combine) per partition, one tiny final reduce — instead of
    one job per rule. At 100 TB the input scan dominates; everything
    here rides a single scan.

    ``exact_distinct=True`` additionally emits ``{c}__distinct_exact``
    (a real COUNT DISTINCT — an extra expand at scale, intended for
    verification runs that cross-check the HLL sketch error bound).
    """
    columns = list(columns or df.columns)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        dt = dict(df.dtypes)[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(c, rsd=hll_rsd).alias(f"{c}__distinct"))
        if exact_distinct:
            aggs.append(F.countDistinct(c).alias(f"{c}__distinct_exact"))
        if dt not in ("binary",):
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
        if dt == "string":
            aggs.append(F.avg(F.length(c)).alias(f"{c}__avg_length"))
    for h in histograms:
        src = F.length(F.col(h.column)) if h.length_of else F.col(h.column)
        bucket = _bucket_expr(src.cast("double"), h.lo, h.hi, h.buckets)
        name = f"{h.column}__hist" + ("_len" if h.length_of else "")
        # map<bucket,count> via aggregate-by-key without extra shuffle:
        # collect per-bucket counts with conditional sums
        aggs.extend(
            F.sum((bucket == b).cast("long")).alias(f"{name}_{b}")
            for b in range(0, h.buckets + 2)
        )
    return df.agg(*aggs)


def column_quantiles(df: DataFrame, column: str,
                     probs: Sequence[float] = (0.25, 0.5, 0.9),
                     by: str | None = None,
                     approx_accuracy: int | None = None) -> DataFrame:
    """Per-group quantiles of a numeric column — the length-band /
    latency-band stats rule (Zoi's gte/lte range checks applied to a
    distribution rather than a row, SURVEY §2.6): one row per group
    with ``q_{p}`` columns.

    Two modes with one call-site: exact ``percentile`` (a sort-based
    aggregate — fine for verification runs and small strata; linear
    interpolation, bit-matching DuckDB's ``quantile_cont``) or, when
    ``approx_accuracy`` is set, ``percentile_approx`` (the
    KLL/Greenwald-Khanna sketch: bounded memory, map-side combinable —
    the only shape that survives a 10^12-row column; accuracy is the
    standard 1/ε knob). Both are ONE aggregation riding one scan."""
    def q(p: float) -> Column:
        if approx_accuracy is not None:
            c = F.percentile_approx(column, p, approx_accuracy)
        else:
            c = F.percentile(column, p)
        return c.cast("double").alias(f"q_{str(p).replace('.', '_')}")

    aggs = [q(p) for p in probs]
    return df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)


def stats_to_rows(stats_row: dict, histograms: Sequence[HistogramSpec] = ()
                  ) -> list[dict]:
    """Reshape the single wide stats row into per-(column, bucket) rows
    matching the FIXTURES.md F3 baseline_stats shape — driver-side on a
    dict, no extra job."""
    out = []
    for h in histograms:
        name = f"{h.column}__hist" + ("_len" if h.length_of else "")
        width = (h.hi - h.lo) / h.buckets
        for b in range(0, h.buckets + 2):
            lo = float("-inf") if b == 0 else h.lo + (b - 1) * width
            hi = float("inf") if b == h.buckets + 1 else h.lo + b * width
            out.append({
                "column_name": name,
                "bucket": b,
                "lo": lo,
                "hi": hi,
                "count": int(stats_row.get(f"{name}_{b}") or 0),
            })
    return out


# ---------------------------------------------------------------------------
# distribution drift — KL / PSI vs a baseline snapshot
# ---------------------------------------------------------------------------

def categorical_histogram(df: DataFrame, column: str) -> DataFrame:
    """(value, count) — one shuffle on a small key space."""
    return df.groupBy(F.col(column).alias("value")).agg(
        F.count("*").alias("count"))


def drift_metrics(baseline: Sequence[tuple], current: Sequence[tuple],
                  *, epsilon: float = 1e-9) -> dict:
    """KL divergence and PSI between two (bucket, count) sequences.

    Driver-side math on ≤~100 buckets (SURVEY §2.6): the heavy work —
    producing the histograms — already happened in ONE distributed agg;
    comparing two 100-entry arrays on the driver is free and avoids a
    pointless two-row join job.
    """
    b = {k: float(v) for k, v in baseline}
    c = {k: float(v) for k, v in current}
    keys = sorted(set(b) | set(c), key=str)
    tb = sum(b.values()) or 1.0
    tc = sum(c.values()) or 1.0
    kl = 0.0
    psi = 0.0
    for k in keys:
        p = max(b.get(k, 0.0) / tb, epsilon)   # baseline = expected
        q = max(c.get(k, 0.0) / tc, epsilon)   # current  = observed
        kl += q * math.log(q / p)
        psi += (q - p) * math.log(q / p)
    return {"kl": kl, "psi": psi, "n_buckets": len(keys)}


def check_drift(baseline: Sequence[tuple], current: Sequence[tuple],
                *, psi_threshold: float = 0.2) -> dict:
    m = drift_metrics(baseline, current)
    m["drifted"] = m["psi"] > psi_threshold
    m["psi_threshold"] = psi_threshold
    return m


# ---------------------------------------------------------------------------
# distribution-aware outlier rule — z-score vs per-stratum moments
# ---------------------------------------------------------------------------

def zscore_outliers(df: DataFrame, column: str, *, by: str,
                    k: float = 2.5, id_col: str = "doc_id") -> DataFrame:
    """Rows whose ``column`` deviates more than ``k`` sample standard
    deviations from the mean of their ``by``-stratum — the
    distribution-aware extension of Zoi's per-row gte/lte range rules
    (SURVEY §2.2): the bound comes from the data, not the schema, so a
    page that is "valid" in isolation still flags when it is wildly
    atypical for its language/host.

    Returns ``(id, by, column, zscore, rule_id)`` with rule_id
    ``{column}.zscore_outlier`` matching the violation-row contract.

    Scale shape: per-stratum moments are ONE tiny aggregation (strata
    cardinality ≪ corpus), broadcast-joined back onto the full table —
    deliberately NOT a window over the stratum, which would shuffle
    10^12 rows onto a handful of language keys (maximal skew). The
    broadcast join keeps the second pass embarrassingly parallel and
    scan-partitioned. Degenerate strata (n < 2 or zero variance) emit
    no outliers rather than dividing by zero.
    """
    stats = (df.groupBy(by)
             .agg(F.avg(column).alias("__mu"),
                  F.stddev_samp(column).alias("__sigma")))
    z = (F.col(column) - F.col("__mu")) / F.col("__sigma")
    return (df.join(F.broadcast(stats), by)
            .where(F.col("__sigma").isNotNull() & (F.col("__sigma") > 0))
            .where(F.abs(z) > k)
            .select(F.col(id_col), F.col(by), F.col(column),
                    F.round(z, 6).alias("zscore"),
                    F.lit(f"{column}.zscore_outlier").alias("rule_id")))


# ---------------------------------------------------------------------------
# sessionization — gap-based session ids over an event stream
# ---------------------------------------------------------------------------

def sessionize(df: DataFrame, *, user_col: str, ts_col: str,
               gap_minutes: int = 30, order_col: str | None = None,
               session_col: str = "session_id") -> DataFrame:
    """Gap-based sessionization: within each user, a new session starts
    whenever the gap to the previous event exceeds *gap_minutes* — the
    standard event-stream segmentation (the batch twin of Structured
    Streaming's session windows).

    One window per user (lag → gap flag → running sum), one shuffle on
    the user key; at 10^12 events this is the same partitioning the
    per-user state of a streaming session window would use. Ties on
    *ts_col* are broken by *order_col* (pass the event id) so session
    numbering is deterministic under any physical row order.

    Appends *session_col* (1-based per-user session ordinal).
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    # interval comparison, not epoch-second subtraction: it is exact to
    # the microsecond and timezone-free (NTZ wall times never route
    # through the session tz, so a non-UTC session or a DST gap cannot
    # shift the split point)
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | ((F.col(ts_col) - prev)
           > F.expr(f"INTERVAL {int(gap_minutes)} MINUTE")),
        1).otherwise(0)
    sid = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(session_col, sid)


# ---------------------------------------------------------------------------
# KS drift — binned two-sample Kolmogorov–Smirnov statistic
# ---------------------------------------------------------------------------

def ks_drift_binned(df: DataFrame, column: str, *, split,
                    bucket_width: float, n_buckets: int = 100) -> DataFrame:
    """Binned two-sample KS statistic: max |CDF_a − CDF_b| over shared
    histogram buckets — the tail-sensitive complement to KL/PSI
    (:func:`drift_metrics`), which are mass-weighted and can miss a
    pure location shift in a thin tail.

    *split* is a boolean Column: True rows form sample A, False sample
    B. Scale shape: ONE hash aggregation builds both histograms (the
    distributed work — the totals come from a global window over the
    aggregated frame, not a second corpus pass), then the running-sum
    window runs over ≤ *n_buckets* rows — a global-order window is
    fine there because the bucket table is tiny by construction
    (values are clamped into [0, n_buckets) from BOTH ends, so signed
    metrics cannot mint unbounded underflow buckets); the raw values
    are never globally sorted. Returns one row: ``(ks, n_buckets)``.
    """
    bucket = F.greatest(
        F.least(F.floor(F.col(column) / bucket_width),
                F.lit(n_buckets - 1)),
        F.lit(0)).cast("long")
    hist = (df.select(bucket.alias("bucket"),
                      F.when(split, 1).otherwise(0).alias("is_a"))
            .groupBy("bucket")
            .agg(F.sum("is_a").alias("ca"),
                 F.sum(F.lit(1) - F.col("is_a")).alias("cb")))
    wall = Window.partitionBy()
    w = (Window.orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cdf = hist.select(
        F.col("bucket"),
        (F.sum("ca").over(w) / F.sum("ca").over(wall)).alias("cdf_a"),
        (F.sum("cb").over(w) / F.sum("cb").over(wall)).alias("cdf_b"))
    return cdf.agg(
        F.round(F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))), 6)
        .alias("ks"),
        F.count(F.lit(1)).alias("n_buckets"))


# ---------------------------------------------------------------------------
# snapshot schema drift — column add/remove/type-change detection
# ---------------------------------------------------------------------------

def schema_drift(baseline: "T.StructType", current: "T.StructType") -> dict:
    """Structural drift between two table snapshots: columns added,
    removed, type-changed, and nullability-changed — the cheap check a
    validation run does BEFORE row-level rules, because a silently
    added/retyped column is the most common upstream break in a
    crawl-feed pipeline.

    Driver-side on the StructTypes (no data pass — Spark already holds
    the schema from the parquet/Iceberg footer). Field ORDER is
    deliberately ignored: column order is not part of a table's
    contract in either Spark or Iceberg.
    """
    b = {f.name: f for f in baseline.fields}
    c = {f.name: f for f in current.fields}
    added = sorted(set(c) - set(b))
    removed = sorted(set(b) - set(c))
    retyped = sorted(
        n for n in set(b) & set(c)
        if b[n].dataType.simpleString() != c[n].dataType.simpleString())
    renullable = sorted(
        n for n in set(b) & set(c)
        if b[n].nullable != c[n].nullable
        and b[n].dataType.simpleString() == c[n].dataType.simpleString())
    return {"added": added, "removed": removed, "retyped": retyped,
            "nullability_changed": renullable,
            "drifted": bool(added or removed or retyped or renullable)}


# ---------------------------------------------------------------------------
# temperature-scaled mixture weights — multinomial stratum re-weighting
# ---------------------------------------------------------------------------

def temperature_weights(df: DataFrame, *, stratum_col: str,
                        tau: float = 0.7,
                        weight_col: str | None = None) -> DataFrame:
    """Temperature-scaled sampling weights per stratum (the multinomial
    re-weighting of multilingual/multi-domain corpora, e.g. mBERT /
    XLM-R's p_i^tau): with stratum mass p_i = n_i / N (or a supplied
    weight column's sum), the resampling probability is
    q_i = p_i^tau / Σ p_j^tau, and ``boost`` = q_i / p_i is the
    per-document up/down-sampling factor to hand to a sampler.

    One hash aggregation over the corpus — the totals and the pow-sum
    come from global windows over the ≤|strata|-row aggregated frame
    (an earlier draft re-derived the aggregation for each scalar,
    tripling the corpus scans). Returns ``(stratum_col, n, p, q,
    boost)`` with p/q/boost rounded to 6 for cross-engine determinism.
    """
    mass = (F.sum(F.col(weight_col)) if weight_col
            else F.count(F.lit(1))).alias("n")
    agg = df.groupBy(stratum_col).agg(mass)
    wall = Window.partitionBy()
    p = F.col("n") / F.sum("n").over(wall)
    q = F.pow(p, F.lit(tau)) / F.sum(F.pow(p, F.lit(tau))).over(wall)
    return agg.select(F.col(stratum_col), F.col("n"),
                      F.round(p, 6).alias("p"),
                      F.round(q, 6).alias("q"),
                      F.round(q / p, 6).alias("boost"))


def correlation_stats(df: DataFrame, columns: Sequence[str],
                      *, round_to: int = 6) -> DataFrame:
    """Pairwise Pearson correlation + sample covariance over the named
    numeric columns, computed in ONE aggregation pass — the
    cross-column half of the profiling battery (``column_stats`` covers
    the per-column half). Catches the drift a per-column check can't:
    a feed whose price and quantity stop co-varying is broken upstream
    even when each column's own distribution still looks right.

    Returns one row per unordered pair ``(col_a, col_b, corr, covar)``,
    ``col_a < col_b`` in the given column order, values rounded to
    ``round_to``; a constant column yields NULL corr (zero variance),
    matching SQL semantics on both engines.

    Plan shape: every ``corr``/``covar_samp`` is a partial-aggregating
    JVM expression, so all C(n,2) pairs ride a single scan → one
    map-side-combined aggregate → one-row result, unpivoted driver-free
    with ``stack``. At 10^12 rows this costs exactly one pass over the
    projected columns — no joins, no second scan, no Python.
    """
    cols = list(columns)
    if len(cols) < 2:
        raise ValueError("correlation_stats: need at least two columns")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    aggs = []
    for a, b in pairs:
        # corr spelled as covar/(σa·σb) through try_divide, NOT F.corr:
        # a zero-variance column must yield NULL (DuckDB semantics),
        # where the native Corr aggregate raises DIVIDE_BY_ZERO under
        # ANSI mode. Same formula, same single partial-agg pass.
        aggs.append(F.round(
            F.try_divide(F.covar_samp(a, b),
                         F.stddev_samp(a) * F.stddev_samp(b)),
            round_to).alias(f"__corr_{a}_{b}"))
        aggs.append(F.round(F.covar_samp(a, b), round_to)
                    .alias(f"__cov_{a}_{b}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', `__corr_{a}_{b}`, `__cov_{a}_{b}`"
        for a, b in pairs)
    return row.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr, covar)")


def js_divergence_pairs(df: DataFrame, *, group_col: str,
                        value_col: str, round_to: int = 6) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (log2 → bits, bounded [0,1])
    between the categorical *value_col* distributions of every pair of
    *group_col* groups — the symmetric, always-finite complement of
    the KL/PSI drift checks (KL blows up on categories one side lacks;
    JS handles disjoint support, which is exactly the
    new-source-vs-corpus intake question).

    Decomposition that avoids a per-pair full-outer join: with
    m = (p+q)/2,

        JS(p,q) = ½·Σ_shared [p·log2(2p/(p+q)) + q·log2(2q/(p+q))]
                  + ½·(1−Σ_shared p) + ½·(1−Σ_shared q)

    (a category only one side has contributes p·log2(2p/p)/2 = p/2),
    so an INNER join on the category key plus the two shared-mass sums
    is sufficient.

    Shape at scale: one count aggregation per (group, value) with
    map-side combine, per-group totals by window over the group key,
    the category-keyed self-join (categories are a vocabulary,
    ≪ corpus), one (g_a, g_b) rollup, and a broadcast cross of the
    group list to re-attach zero-overlap pairs. Cost rides the number
    of GROUPS², not rows — the operator targets source/shard/lang
    cardinalities (10²-10⁴ groups)."""
    counts = (df.groupBy(group_col, value_col)
              .agg(F.count("*").alias("__c")))
    p = counts.withColumn(
        "__p", F.col("__c") / F.sum("__c").over(
            Window.partitionBy(group_col)))
    a = p.select(F.col(group_col).alias("g_a"),
                 F.col(value_col).alias("__v"), F.col("__p").alias("pa"))
    b = p.select(F.col(group_col).alias("g_b"),
                 F.col(value_col).alias("__v"), F.col("__p").alias("pb"))
    two = F.lit(2.0)
    term = (F.col("pa") * F.log2(two * F.col("pa")
                                 / (F.col("pa") + F.col("pb")))
            + F.col("pb") * F.log2(two * F.col("pb")
                                   / (F.col("pa") + F.col("pb"))))
    # null-safe category join: a NULL category (e.g. lang undetected)
    # is real probability mass on both sides — a plain equi-join would
    # drop it and score identical distributions as drifted
    shared = (a.join(b, a["__v"].eqNullSafe(b["__v"]))
              .where(F.col("g_a") < F.col("g_b"))
              .groupBy("g_a", "g_b")
              .agg(F.sum(term).alias("__t"),
                   F.sum("pa").alias("__sa"),
                   F.sum("pb").alias("__sb")))
    groups = df.select(F.col(group_col)).distinct()
    pairs = (groups.select(F.col(group_col).alias("g_a"))
             .join(F.broadcast(groups.select(
                 F.col(group_col).alias("g_b"))))
             .where(F.col("g_a") < F.col("g_b")))
    js = (F.lit(0.5) * F.coalesce("__t", F.lit(0.0))
          + F.lit(0.5) * (F.lit(1.0) - F.coalesce("__sa", F.lit(0.0)))
          + F.lit(0.5) * (F.lit(1.0) - F.coalesce("__sb", F.lit(0.0))))
    return (pairs.join(shared, ["g_a", "g_b"], "left")
            .select("g_a", "g_b",
                    F.round(js, round_to).alias("js_divergence")))


# Benford first-digit probabilities log10(1 + 1/d), d = 1..9
_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_profile(df: DataFrame, column: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    numeric-forensics QC (organically generated magnitudes follow it;
    synthetic/templated/capped values do not): one row per digit 1-9
    with the observed count/share and Benford's expectation. Zero and
    NULL values are excluded (they have no first significant digit).
    The digit extraction is string-based — the first character of the
    value's scientific notation ('%.9e') — so it never produces an
    empty string (a fixed-decimal format would render |x| < 5e-10 as
    all zeros and abort the ANSI int cast) and float log10 edge cases
    can't misclassify. Values within half an ulp of a digit rollover
    at the 10th significant digit round with IEEE semantics,
    identically on every engine. One projection + one 9-key
    aggregation."""
    first = F.substring(
        F.format_string("%.9e", F.abs(F.col(column)).cast("double")),
        1, 1)
    # counted feeds both the total and the digit join — persist the
    # <=9-row aggregate so the corpus is scanned once
    counted = (df.where(F.col(column).isNotNull()
                        & (F.col(column) != 0))
               .select(first.cast("int").alias("digit"))
               .groupBy("digit").agg(F.count("*").alias("n"))
               .persist())
    total = counted.agg(F.sum("n").alias("__t"))
    bdf = F.broadcast(df.sparkSession.createDataFrame(
        sorted(_BENFORD.items()), "digit int, benford_p double"))
    out = (bdf.join(counted, "digit", "left")
           .crossJoin(F.broadcast(total))
           .select("digit",
                   F.coalesce("n", F.lit(0)).alias("n"),
                   F.round(F.coalesce("n", F.lit(0)) / F.col("__t"), 6)
                   .alias("observed_p"),
                   F.round("benford_p", 6).alias("benford_p")))
    out._zoi_persisted = [counted]  # release after materialization
    return out


def chi2_independence(df: DataFrame, col_a: str,
                      col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the categorical complement of ks_drift_binned /
    js_divergence_pairs (is `lang` independent of `source`, or does
    one crawl feed skew the mixture?). One row out: ``chi2``
    (Σ (obs−exp)²/exp over the FULL margin cross product, zero-observed
    cells included), ``dof`` = (|A|−1)(|B|−1), ``n_rows``, and
    ``cramers_v`` = sqrt(chi2 / (n·min(|A|−1,|B|−1))) — the
    sample-size-free effect size. NULL categories are excluded (they
    have no margin). Compare chi2 against the chi-square quantile for
    dof upstream; the statistic itself is deterministic.

    One (a,b) hash aggregation over the corpus; margins and the cell
    grid are |A|·|B| rows — broadcast-joined, never shuffled."""
    base = df.where(F.col(col_a).isNotNull()
                    & F.col(col_b).isNotNull())
    # obs feeds four consumers (both margins, the total, the cell
    # join) — persist the |A|x|B|-row aggregate so the corpus is
    # scanned once, not four times
    obs = (base.groupBy(F.col(col_a).alias("a"),
                        F.col(col_b).alias("b"))
           .agg(F.count("*").alias("o")).persist())
    ra = obs.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = obs.groupBy("b").agg(F.sum("o").alias("cb"))
    n = obs.agg(F.sum("o").alias("n"))
    cells = (ra.crossJoin(F.broadcast(cb))
             .join(F.broadcast(obs), ["a", "b"], "left")
             .crossJoin(F.broadcast(n)))
    exp = F.col("ra") * F.col("cb") / F.col("n")
    term = F.pow(F.coalesce("o", F.lit(0)) - exp, 2) / exp
    stats = (cells.agg(
        F.sum(term).alias("__chi2"),
        (F.count_distinct("a") - 1).alias("__da"),
        (F.count_distinct("b") - 1).alias("__db"),
        F.max("n").alias("n_rows")))
    v = F.sqrt(F.col("__chi2")
               / (F.col("n_rows") * F.least("__da", "__db")))
    out = stats.select(
        F.round("__chi2", 6).alias("chi2"),
        (F.col("__da") * F.col("__db")).cast("long").alias("dof"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(v, 6).alias("cramers_v"))
    out._zoi_persisted = [obs]  # release after materialization
    return out


def group_entropy(df: DataFrame, *, group_col: str,
                  cat_col: str) -> DataFrame:
    """Per-group Shannon entropy (bits) of a categorical column — the
    mixture-purity profile: a source/host serving 40 languages at
    near-uniform entropy is a spam farm or an MT mill, while organic
    sources are low-entropy. Output per group: ``n_rows``, ``n_cats``,
    ``entropy`` = −Σ (c/n)·log2(c/n), rounded to 6. NULL category
    values form their own category (a missing lang tag is itself
    signal); NULL groups are excluded.

    Two hash aggregations — (group, cat) counts, then the entropy fold
    per group; both shuffle on the group key only."""
    counts = (df.where(F.col(group_col).isNotNull())
              .groupBy(group_col, cat_col)
              .agg(F.count("*").alias("c")))
    n = F.sum("c")
    # −Σ c·log2(c)/n + log2(n): the single-pass decomposition, same
    # trick as token_entropy — no second join against the totals
    ent = F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n
    return (counts.groupBy(group_col)
            .agg(n.cast("long").alias("n_rows"),
                 F.count("*").cast("long").alias("n_cats"),
                 F.round(ent, 6).alias("entropy")))


def interarrival_stats(df: DataFrame, *, ts_col: str,
                       entity_col: str, order_col: str | None = None,
                       group_col: str | None = None) -> DataFrame:
    """Inter-arrival gap profile: per entity (user, host, crawler) the
    events are ordered by timestamp and each event's gap to the
    previous one is measured in seconds; gaps are then aggregated per
    *group_col* (default: per entity) into ``n_gaps`` / ``mean_gap`` /
    ``min_gap`` / ``max_gap``. Bot traffic shows near-constant gaps
    (min≈max); re-crawl scheduling shows per-host periodicity. A gap
    is attributed to the LATER event's group. First events have no gap
    and are excluded, as are NULL timestamps.

    One lag window per entity (one shuffle on the entity key — the
    same partitioning sessionize uses), then one hash aggregation.
    Ties on the timestamp are broken by *order_col* so the gap
    sequence is deterministic under any physical row order. NULL
    entities are excluded: they are unrelated events, and routing
    them through one window partition would fabricate gaps AND
    serialize a corpus-sized partition through one task."""
    td = F.col(ts_col).cast("timestamp").cast("double")
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    gap = td - F.lag(td).over(w)
    key = group_col or entity_col
    return (df.where(F.col(ts_col).isNotNull()
                     & F.col(entity_col).isNotNull())
            .withColumn("__gap", gap)
            .where(F.col("__gap").isNotNull())
            .groupBy(key)
            .agg(F.count("*").cast("long").alias("n_gaps"),
                 F.round(F.avg("__gap"), 6).alias("mean_gap"),
                 F.round(F.min("__gap"), 6).alias("min_gap"),
                 F.round(F.max("__gap"), 6).alias("max_gap")))


def gini(df: DataFrame, *, group_col: str, value_col: str,
         order_col: str) -> DataFrame:
    """Per-group Gini coefficient of an integer-valued column — the
    inequality counterpart to host_concentration's HHI (0 = perfectly
    even, →1 = one row holds all the mass): with values ranked
    ascending (ties broken by *order_col* so the rank is
    deterministic),

        G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx)

    All accumulators are exact integer sums, so the rounded coefficient
    is bit-deterministic. NULL for a group whose total is 0. One
    per-group ranking window + one hash aggregation: each window
    partition holds ONE group's rows — use this for numerous bounded
    groups (per-source, per-host); for a corpus-wide Gini pre-aggregate
    to per-key masses first or the single partition becomes the
    serialization trap the docstrings keep warning about."""
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc(),
                                              F.col(order_col).asc())
    ranked = (df.where(F.col(value_col).isNotNull())
              .withColumn("__r", F.row_number().over(w)))
    g = (2 * F.sum(F.col("__r") * F.col(value_col))
         - (F.count("*") + 1) * F.sum(value_col))
    tot = F.count("*") * F.sum(value_col)
    return (ranked.groupBy(group_col)
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum(value_col).cast("long").alias("total"),
                 F.when(tot > 0, F.round(g / tot, 6)).alias("gini")))


def json_field_profile(df: DataFrame, *, json_col: str, field: str,
                       group_col: str) -> DataFrame:
    """Semi-structured extraction QC: pull ``$.field`` out of a JSON
    string column, count how often it is missing/non-numeric, and
    profile the numeric values per group (n, n_missing, min, max,
    mean). The try-cast keeps malformed payloads as NULLs instead of
    failing the job under ANSI mode — corrupt props rows become a
    count, not an abort. Integer accumulation → deterministic mean.
    One projection (JSON path evaluation is JVM-side, no UDF) + one
    hash aggregation."""
    v = F.get_json_object(F.col(json_col),
                          f"$.{field}").try_cast("long")
    per = df.select(F.col(group_col), v.alias("__v"))
    n = F.count("*")
    return (per.groupBy(group_col)
            .agg(n.cast("long").alias("n_rows"),
                 F.sum(F.when(F.col("__v").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_missing"),
                 F.min("__v").alias("min_value"),
                 F.max("__v").alias("max_value"),
                 F.round(F.sum("__v")
                         / F.count("__v"), 6).alias("mean_value")))


def funnel_stages(df: DataFrame, *, user_col: str, ts_col: str,
                  type_col: str, stages: "list[str]") -> DataFrame:
    """First-occurrence funnel: a user reaches stage k when their FIRST
    stage-k event is strictly later than their first stage-(k−1) event
    (and they reached k−1) — the standard product/conversion funnel on
    first touches, deterministic because only per-(user, stage) min
    timestamps enter the comparison. Output one row per stage:
    ``stage_idx``, ``stage``, ``n_users``, ``conversion`` (share of the
    previous stage, round 6; stage 1's share of all funnel entrants is
    1.0).

    One conditional-min aggregation per user (single shuffle on the
    user key, map-side combine), then a constant-width projection —
    no window, no per-user event lists."""
    if len(stages) < 2:
        raise ValueError("funnel_stages: need at least 2 stages")
    mins = [F.min(F.when(F.col(type_col) == s, F.col(ts_col)))
            .alias(f"__t{i}") for i, s in enumerate(stages)]
    per = (df.where(F.col(type_col).isin(list(stages))
                    & F.col(ts_col).isNotNull())
           .groupBy(user_col).agg(*mins))
    reached = F.col("__t0").isNotNull()
    flags = [reached]
    for i in range(1, len(stages)):
        reached = reached & (F.col(f"__t{i}") > F.col(f"__t{i - 1}"))
        flags.append(reached)
    counts = per.agg(*[
        F.sum(fl.cast("long")).alias(f"__n{i}")
        for i, fl in enumerate(flags)])
    # one struct per stage exploded from the SINGLE 1-row aggregate —
    # a per-stage select + union would re-run the whole funnel scan
    # once per stage
    structs = []
    for i, s in enumerate(stages):
        conv = (F.lit(1.0) if i == 0 else
                F.when(F.col(f"__n{i - 1}") > 0,
                       F.round(F.col(f"__n{i}")
                               / F.col(f"__n{i - 1}"), 6)))
        structs.append(F.struct(
            F.lit(i + 1).alias("stage_idx"), F.lit(s).alias("stage"),
            F.col(f"__n{i}").cast("long").alias("n_users"),
            conv.cast("double").alias("conversion")))
    return (counts.select(F.explode(F.array(*structs)).alias("__r"))
            .select("__r.*"))


def daily_volume_anomalies(df: DataFrame, *, ts_col: str,
                           group_col: str, z: float = 3.0) -> DataFrame:
    """Per-group daily-volume anomaly report: days whose event count
    deviates from the group's mean by more than z standard deviations —
    the crawl/ingest monitoring row (a collapsed fetcher or a
    duplicate-feed burst shows up as a volume spike long before content
    metrics move). The z-test is the cross-multiplied inequality
    (c·n − Σc)² > z²·(n·Σc² − (Σc)²): the variance term is
    accumulated as exact DECIMAL(38,0) (n·Σc² overflows a long around
    10^9 events/day — decimal never aborts), and both sides convert
    to double only at the final comparison, in the same operation
    order as the DuckDB twin, so the classification is bit-identical
    across engines and exact while magnitudes stay below 2^53.
    Output per group:
    ``n_days``, ``total``, ``mean_daily`` (round 6),
    ``n_anomaly_days``.

    Two hash aggregations (day counts, then group moments joined back
    onto the ≤days-per-group table) — both shuffle on the group key."""
    days = (df.where(F.col(ts_col).isNotNull())
            .groupBy(F.col(group_col),
                     F.date_trunc("day", F.col(ts_col)).alias("__d"))
            .agg(F.count("*").alias("c")))
    def dec(c):
        return c.cast("decimal(38,0)")

    mom = (days.groupBy(group_col)
           .agg(F.count("*").alias("__n"), F.sum("c").alias("__s1"),
                dec(F.sum(F.col("c") * F.col("c"))).alias("__s2")))
    j = days.join(mom, group_col)
    # (c·n − s1) fits a long (counts × days); square it in DOUBLE —
    # exactly what DuckDB's pow(int, 2) does — and compute the
    # variance term exactly in decimal before its own double cast
    dev2 = F.pow(F.col("c") * F.col("__n") - F.col("__s1"), 2)
    var = (dec(F.col("__n")) * F.col("__s2")
           - dec(F.col("__s1")) * dec(F.col("__s1")))
    bound = F.lit(float(z) * float(z)) * var.cast("double")
    return (j.groupBy(group_col)
            .agg(F.max("__n").cast("long").alias("n_days"),
                 F.max("__s1").cast("long").alias("total"),
                 F.round(F.max("__s1") / F.max("__n"), 6)
                 .alias("mean_daily"),
                 F.sum((dev2 > bound).cast("long")).cast("long")
                 .alias("n_anomaly_days")))


def retention_cohorts(df: DataFrame, *, user_col: str,
                      ts_col: str) -> DataFrame:
    """Weekly cohort retention: users are assigned to the ISO week of
    their FIRST event; every (cohort_week, week_offset) cell counts the
    distinct cohort members active that many weeks later — the
    engagement matrix behind every retention curve, and for a corpus
    the re-crawl persistence profile per ingestion batch. Output:
    (cohort_week DATE, week_offset, n_users); offsets are exact integer
    day-diffs / 7 between week-truncated timestamps, so the cells are
    deterministic.

    Two aggregations (first-event per user, then the distinct count per
    cell) and one join back — all keyed on the user, the same
    partitioning sessionize uses."""
    base = df.where(F.col(user_col).isNotNull()
                    & F.col(ts_col).isNotNull())
    first = (base.groupBy(user_col)
             .agg(F.date_trunc("week", F.min(ts_col)).alias("__cw")))
    act = (base.select(user_col,
                       F.date_trunc("week", F.col(ts_col)).alias("__w"))
           .distinct()
           .join(first, user_col))
    offset = (F.datediff(F.col("__w"), F.col("__cw")) / 7).cast("int")
    return (act.groupBy(F.col("__cw").cast("date").alias("cohort_week"),
                        offset.alias("week_offset"))
            .agg(F.count_distinct(user_col).alias("n_users")))


def markov_transitions(df: DataFrame, *, entity_col: str,
                       ts_col: str, state_col: str,
                       order_col: str | None = None) -> DataFrame:
    """First-order Markov transition profile of an event stream:
    within each entity's time-ordered history, count every
    (prev_state → next_state) step and normalize per source state —
    the behavioral fingerprint used for bot/crawler detection (crawler
    traffic has near-deterministic transition rows) and for QC'ing
    synthetic event generators against production mixes.

    Returns ``(prev_state, next_state, n, p)`` where ``p`` is the
    row-normalized probability round(n/Σn, 6) — a ratio of exact
    integer counts computed with the same single division in any
    engine, so it is reproducible without quantization tricks.

    Plan: one shuffle on the entity key for the lag window, one
    shuffle on (prev, next) for the count (map-side partial agg), and
    the per-source normalization runs as a window over the COUNTS
    table — |states|² rows, trivially small however large the input.
    Ties on *ts_col* are broken by *order_col* so the step sequence is
    deterministic under any physical row order.
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev = F.lag(F.col(state_col)).over(w)
    steps = (df.select(prev.alias("prev_state"),
                       F.col(state_col).alias("next_state"))
             .where(F.col("prev_state").isNotNull()))
    counts = steps.groupBy("prev_state", "next_state") \
                  .agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy("prev_state"))
    return counts.withColumn(
        "p", F.round(F.col("n") / total, 6))


def cusum_shift(df: DataFrame, *, ts_col: str,
                unit: str = "day") -> DataFrame:
    """CUSUM level-shift scan over per-*unit* event volumes: for each
    time bucket k (ordered), the cumulative deviation from the series
    mean S_k = Σ_{i≤k}(x_i − x̄) — the classic changepoint locator
    (Page 1954): |S_k| peaks at the bucket where the level shifted
    (pipeline regressions, crawler outages, traffic-source flips).

    Everything is EXACT integers: with x̄ = S/n the deviation sum is
    reported scaled by n — ``cusum_scaled = n·prefix_k − k·S`` — so no
    float enters until never (both engines agree bit-for-bit).
    ``is_peak`` marks the bucket(s) attaining max |cusum_scaled|.

    Plan: one shuffle for the per-bucket count; the prefix window and
    the scalar (n, S) broadcast ride the BUCKETS table (≤ thousands of
    rows however large the input), never the corpus.
    """
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("bucket_ts"))
             .agg(F.count("*").alias("n")))
    w_all = Window.partitionBy()
    w_pfx = (Window.partitionBy().orderBy("bucket_ts")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n_buckets = F.count("*").over(w_all)
    total = F.sum("n").over(w_all)
    k = F.row_number().over(Window.partitionBy().orderBy("bucket_ts"))
    cusum = (n_buckets * F.sum("n").over(w_pfx) - k * total) \
        .cast("long")
    out = daily.select("bucket_ts", "n", cusum.alias("cusum_scaled"))
    peak = F.max(F.abs(F.col("cusum_scaled"))).over(w_all)
    return out.withColumn(
        "is_peak", F.abs(F.col("cusum_scaled")) == peak)


def mann_whitney_u(df: DataFrame, *, value_col: str, group_col: str,
                   group_a) -> DataFrame:
    """Mann–Whitney U rank test of *value_col* between group A
    (``group_col == group_a``) and everything else — the standard
    nonparametric two-sample location check (is EN doc length
    distributed like the rest?) that, unlike the KS distance, yields
    the directly interpretable AUC P(a > b) + ½P(a = b).

    Exactness: average ranks over ties are half-integers, so the rank
    sums are reported DOUBLED (``r2_a = Σ 2·avgrank``, an exact
    BIGINT) and likewise ``u2 = 2·U = r2 − n(n+1)``. The AUC is the
    single terminal division round(1e6·u2_a/(2·n_a·n_b))/1e6 — one
    expression, same op order in any engine.

    Plan: ranks are NOT a global row window — values are first
    aggregated to a (value, n_a, n) counts table; cumulative counts
    over THAT table (distinct values only) give every tie-group's
    2·avgrank = 2·cum_before + n_ties + 1. One shuffle for the value
    agg; the window rides the distinct-value table.
    """
    is_a = (F.col(group_col) == F.lit(group_a)).cast("long")
    vc = (df.where(F.col(value_col).isNotNull())
          .groupBy(F.col(value_col).alias("__v"))
          .agg(F.sum(is_a).alias("__na"), F.count("*").alias("__n")))
    w_pfx = (Window.partitionBy().orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, -1))
    cum = F.coalesce(F.sum("__n").over(w_pfx), F.lit(0))
    rank2 = 2 * cum + F.col("__n") + 1            # 2×average rank
    scored = vc.select(
        F.col("__na"), (F.col("__n") - F.col("__na")).alias("__nb"),
        (F.col("__na") * rank2).alias("__r2a"))
    agg = scored.agg(F.sum("__na").alias("n_a"),
                     F.sum("__nb").alias("n_b"),
                     F.sum("__r2a").alias("__r2a"))
    u2_a = (F.col("__r2a") - F.col("n_a") * (F.col("n_a") + 1)) \
        .alias("u2_a")
    return (agg.select("n_a", "n_b", u2_a)
            .withColumn("u2_b",
                        2 * F.col("n_a") * F.col("n_b") - F.col("u2_a"))
            .withColumn("auc_micro",
                        F.round(F.lit(1e6) * F.col("u2_a")
                                / (2 * F.col("n_a") * F.col("n_b")))
                        .cast("long")))


def rfm_segments(df: DataFrame, *, entity_col: str, ts_col: str,
                 amount_col: str, buckets: int = 4) -> DataFrame:
    """RFM segmentation: per entity, Recency (latest ts), Frequency
    (row count) and Monetary (amount sum) are each ntile-bucketed into
    *buckets* quantile groups (1 = best … buckets = worst: every ntile
    orders its metric descending, so the most-recent / most-frequent /
    highest-spend entities land in bucket 1 — the conventional "RFM
    cell 111 = champions" reading), and the
    segment cells are counted — the classic customer-base / host-
    contribution health matrix.

    Determinism: amounts are summed as CENTS (``round(x·100)`` per row
    → BIGINT) so the Monetary ordering never depends on float sum
    order; every ntile is ordered by (metric, entity) so ties split
    identically in any engine. Recency ranks newest-first.

    Plan: one shuffle to the per-entity aggregate; the three ntile
    windows ride the AGGREGATED table (one row per entity — orders of
    magnitude smaller than the input; a cluster sorts 10^8 aggregate
    rows without drama, and the sort is once per metric).
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    per = (df.groupBy(entity_col)
           .agg(F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
                .alias("__rec"),
                F.count("*").alias("__frq"),
                F.sum(F.round(F.col(amount_col) * 100).cast("long"))
                .alias("__mon")))
    r = F.ntile(buckets).over(
        Window.partitionBy().orderBy(F.col("__rec").desc(),
                                     F.col(entity_col)))
    f = F.ntile(buckets).over(
        Window.partitionBy().orderBy(F.col("__frq").desc(),
                                     F.col(entity_col)))
    m = F.ntile(buckets).over(
        Window.partitionBy().orderBy(F.col("__mon").desc(),
                                     F.col(entity_col)))
    return (per.select(r.cast("long").alias("r_bucket"),
                       f.cast("long").alias("f_bucket"),
                       m.cast("long").alias("m_bucket"))
            .groupBy("r_bucket", "f_bucket", "m_bucket")
            .agg(F.count("*").alias("n_entities")))


def volume_autocorr(df: DataFrame, *, ts_col: str,
                    lags: Sequence[int] = (1, 7),
                    unit: str = "day") -> DataFrame:
    """Lag-k autocorrelation of per-*unit* event volumes — the
    seasonality fingerprint (lag-7 ≈ weekly rhythm of human traffic;
    bot floods flatten it; a dead lag-1 means white noise).

    r_k = Σ_t (x_t−x̄)(x_{t+k}−x̄) / Σ_t (x_t−x̄)², both sides
    multiplied by n² so every sum is an exact BIGINT over
    ``n·x_t − S`` terms; the single terminal division is micro-rounded
    with identical op order in any engine. Buckets are matched by
    calendar arithmetic (t+k units), so gap buckets simply drop out of
    the numerator (and stay in the denominator), deterministically.

    Plan: one shuffle to the per-bucket counts; the lag matches are
    equi-joins on the BUCKETS table. Lags are plan-time constants —
    len(lags) small joins over a tiny frame, not a corpus scan each.
    """
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("bucket_ts"))
             .agg(F.count("*").alias("n"))).persist()
    w_all = Window.partitionBy()
    dev = (daily
           .select("bucket_ts",
                   (F.count("*").over(w_all) * F.col("n")
                    - F.sum("n").over(w_all)).cast("long")
                   .alias("__d"))).persist()
    den = dev.agg(F.sum(F.col("__d") * F.col("__d"))
                  .alias("__den"))
    parts = []
    for k in lags:
        shifted = dev.select(
            (F.col("bucket_ts") - F.expr(f"INTERVAL {int(k)} {unit}"))
            .alias("bucket_ts"),
            F.col("__d").alias("__d_lead"))
        num = (dev.join(shifted, "bucket_ts")
               .agg(F.sum(F.col("__d") * F.col("__d_lead"))
                    .alias("__num"),
                    F.count("*").alias("n_pairs")))
        parts.append(num.select(F.lit(int(k)).cast("long").alias("lag"),
                                "n_pairs", "__num"))
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionAll(p)
    out = (stacked.crossJoin(F.broadcast(den))
           .select("lag", "n_pairs",
                   F.round(F.lit(1e6) * F.col("__num") / F.col("__den"))
                   .cast("long").alias("r_micro")))
    out._zoi_persisted = [daily, dev]
    return out


def path_ngrams(df: DataFrame, *, entity_col: str, ts_col: str,
                state_col: str, n: int = 3,
                order_col: str | None = None,
                sep: str = ">") -> DataFrame:
    """Order-(n−1) path mining of an event stream: every length-*n*
    run of consecutive states within an entity's time-ordered history,
    counted corpus-wide — the "what do users actually do" view one
    level above :func:`markov_transitions` (which is n=2): top paths
    expose crawler loops (A>B>A>B…), funnel shortcuts and dead-end
    cycles that pairwise transition rates hide.

    Returns ``(path, n_occurrences)`` with *path* the states joined by
    *sep*. Runs crossing entity boundaries never form (the lag window
    is per-entity); histories shorter than n contribute nothing.

    Plan: ONE shuffle on the entity key computes all n−1 lags in the
    same window pass, then one count shuffle on the path string —
    identical shape whatever n. Ties on *ts_col* break by *order_col*.
    """
    if n < 2:
        raise ValueError("path_ngrams: n must be >= 2")
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    steps = [F.lag(F.col(state_col), n - 1 - i).over(w)
             for i in range(n)]          # oldest … current
    path = F.concat_ws(sep, *steps)
    gate = steps[0].isNotNull()          # full window present
    return (df.select(path.alias("path"), gate.alias("__ok"))
            .where(F.col("__ok"))
            .groupBy("path")
            .agg(F.count("*").alias("n_occurrences")))


def key_skew_profile(df: DataFrame, *, key_col: str,
                     top_k: int = 10) -> DataFrame:
    """Shuffle-skew forensics for a prospective join/groupBy key: the
    *top_k* hottest key values with their exact share of the table —
    the number that decides salting (`suggest_salt`), AQE skew-join
    thresholds, and whether a key is broadcast-safe. A top-1 share of
    20% means one reducer gets a fifth of the shuffle however many
    partitions you give it.

    Returns ``(rank, key, n_rows, share_micro)`` — share is the one
    terminal division round(1e6·cnt/total) over exact counts. NULL
    keys count as a key (they land in ONE partition too — often the
    worst offender, see ADVICE r3 on NULL-url windows).

    Plan: one count shuffle on the key, then TakeOrdered for the
    top-k — no global sort, no window over the corpus; the total
    rides along as a one-row broadcast.
    """
    if top_k < 1:
        raise ValueError("key_skew_profile: top_k must be >= 1")
    counts = (df.groupBy(F.col(key_col).cast("string").alias("key"))
              .agg(F.count("*").alias("n_rows"))).persist()
    total = counts.agg(F.sum("n_rows").alias("__tot"))
    top = counts.orderBy(F.col("n_rows").desc(),
                         F.col("key").asc_nulls_last()).limit(int(top_k))
    w = Window.partitionBy().orderBy(F.col("n_rows").desc(),
                                     F.col("key").asc_nulls_last())
    out = (top.crossJoin(F.broadcast(total))
           .select(F.row_number().over(w).cast("long").alias("rank"),
                   "key", "n_rows",
                   F.round(F.lit(1e6) * F.col("n_rows")
                           / F.col("__tot")).cast("long")
                    .alias("share_micro")))
    out._zoi_persisted = [counts]
    return out


def fano_factor(df: DataFrame, *, ts_col: str, group_col: str,
                unit: str = "day") -> DataFrame:
    """Burstiness (Fano factor) of per-*unit* volumes by group:
    variance-to-mean ratio of the bucket counts — 1 for Poisson
    arrivals, ≫1 for bursty bot floods / batch replays, <1 for
    rate-limited (sub-Poisson) clients. The dispersion complement of
    :func:`volume_autocorr`'s rhythm view.

    Population variance over mean, everything cross-multiplied to
    integers: fano = ((n·Σc² − S²)/n²) / (S/n) = (n·Σc² − S²)/(n·S) —
    one micro-rounded division of exact BIGINTs per group. Returns
    ``(group, n_buckets, total, fano_micro)``.

    Plan: one shuffle to (group, bucket) counts, one to the per-group
    moments. Counts are widened to DECIMAL(38,0) for the squared sums
    (the daily_volume_anomalies overflow lesson).
    """
    dec = T.DecimalType(38, 0)
    daily = (df.groupBy(F.col(group_col).alias("group"),
                        F.date_trunc(unit, F.col(ts_col)).alias("__b"))
             .agg(F.count("*").alias("__c")))
    c = F.col("__c").cast(dec)
    mom = (daily.groupBy("group")
           .agg(F.count("*").cast(dec).alias("__n"),
                F.sum(c).alias("__s"),
                F.sum(c * c).alias("__s2")))
    num = (F.col("__n") * F.col("__s2")
           - F.col("__s") * F.col("__s")).cast("double")
    den = (F.col("__n") * F.col("__s")).cast("double")
    return mom.select(
        "group", F.col("__n").cast("long").alias("n_buckets"),
        F.col("__s").cast("long").alias("total"),
        F.when(den > 0,
               F.round(F.lit(1e6) * num / den).cast("long"))
         .alias("fano_micro"))


def mutual_information(df: DataFrame, *, col_a: str,
                       col_b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns via
    the entropy identity MI = H(a) + H(b) − H(a,b) — "how much does
    source tell you about lang": 0 = independent mixes, high = sources
    are language silos (stratify by source ≈ stratify by lang). The
    info-theoretic complement of chi²/Cramér's V.

    Each entropy is H = ln(T) − Σ c·ln(c)/T computed from EXACT
    BIGINT counts with the float entering only in the final
    projection; results round to 6 decimals (the established float-sum
    tolerance used by the KL/PSI drift twins). NULL categories count
    as a category. Returns one row
    ``(n_a, n_b, n_cells, h_a, h_b, h_ab, mi_nats)``.

    Plan: one shuffle to the (a, b) cell counts; both margins and all
    three Σ c·ln c reduce from the CELLS table (|a|·|b| rows), so the
    corpus is scanned once however large.
    """
    cells = (df.groupBy(F.col(col_a).alias("__a"),
                        F.col(col_b).alias("__b"))
             .agg(F.count("*").alias("__c"))).persist()
    ma = cells.groupBy("__a").agg(F.sum("__c").alias("__c"))
    mb = cells.groupBy("__b").agg(F.sum("__c").alias("__c"))

    def _ent(frame, n_alias):
        return frame.agg(
            F.count("*").alias(n_alias),
            F.sum("__c").alias("__t"),
            F.sum(F.col("__c").cast("double")
                  * F.log(F.col("__c").cast("double"))).alias("__clc"))

    ea = _ent(ma, "n_a").select(
        "n_a", (F.log(F.col("__t").cast("double"))
                - F.col("__clc") / F.col("__t")).alias("__ha"))
    eb = _ent(mb, "n_b").select(
        "n_b", (F.log(F.col("__t").cast("double"))
                - F.col("__clc") / F.col("__t")).alias("__hb"))
    eab = _ent(cells, "n_cells").select(
        "n_cells", (F.log(F.col("__t").cast("double"))
                    - F.col("__clc") / F.col("__t")).alias("__hab"))
    out = (ea.crossJoin(eb).crossJoin(eab)
           .select("n_a", "n_b", "n_cells",
                   F.round("__ha", 6).alias("h_a"),
                   F.round("__hb", 6).alias("h_b"),
                   F.round("__hab", 6).alias("h_ab"),
                   F.round(F.col("__ha") + F.col("__hb")
                           - F.col("__hab"), 6).alias("mi_nats")))
    out._zoi_persisted = [cells]
    return out


def volume_trend(df: DataFrame, *, ts_col: str, group_col: str,
                 unit: str = "day") -> DataFrame:
    """Least-squares trend of per-*unit* volumes by group — the
    grow/shrink slope per event type (is error volume trending up?),
    exact where it can be: x is the calendar bucket index
    (datediff from the group's first bucket), y the bucket count, and
    the OLS slope (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is one micro-rounded
    division of exact BIGINT moments. Groups with a single bucket
    return NULL slope (degenerate denominator) in any engine.

    Returns ``(group, n_buckets, total, slope_micro_per_unit)``.

    Plan: one shuffle to (group, bucket) counts; the x-index needs the
    group's min bucket — a per-group scalar computed in the same
    moments pass via a window over the BUCKETS table, then one final
    per-group aggregation.
    """
    dec = T.DecimalType(38, 0)
    daily = (df.groupBy(F.col(group_col).alias("group"),
                        F.date_trunc(unit, F.col(ts_col)).alias("__b"))
             .agg(F.count("*").alias("__c")))
    w = Window.partitionBy("group")
    x = F.datediff(F.col("__b").cast("date"),
                   F.min(F.col("__b").cast("date")).over(w)).cast(dec)
    y = F.col("__c").cast(dec)
    pts = daily.select("group", x.alias("__x"), y.alias("__y"))
    mom = (pts.groupBy("group")
           .agg(F.count("*").cast(dec).alias("__n"),
                F.sum("__x").alias("__sx"),
                F.sum("__y").alias("__sy"),
                F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
                F.sum(F.col("__x") * F.col("__x")).alias("__sxx")))
    num = (F.col("__n") * F.col("__sxy")
           - F.col("__sx") * F.col("__sy")).cast("double")
    den = (F.col("__n") * F.col("__sxx")
           - F.col("__sx") * F.col("__sx")).cast("double")
    return mom.select(
        "group", F.col("__n").cast("long").alias("n_buckets"),
        F.col("__sy").cast("long").alias("total"),
        F.when(den > 0,
               F.round(F.lit(1e6) * num / den).cast("long"))
         .alias("slope_micro_per_unit"))


def mad_outliers(df: DataFrame, column: str, *, by: str,
                 k: float = 3.5, id_col: str = "doc_id") -> DataFrame:
    """Median-absolute-deviation robust outliers — the heavy-tail-safe
    sibling of :func:`zscore_outliers`: on web-corpus length/value
    distributions the sample mean and stddev are themselves dragged by
    the outliers they are supposed to flag, while the median/MAD pair
    has a 50% breakdown point (Hampel; the 1.4826 factor makes the
    score ≈ a z-score under normality). Rows score
    ``(x − median) / (1.4826 · MAD)`` within their ``by``-stratum and
    flag when |score| > *k*.

    Returns ``(id, by, column, mad_score, rule_id)`` with rule_id
    ``{column}.mad_outlier`` — the violation-row contract
    (errors.py; Zoi seed lib/zoi/error.ex).

    Shape at scale: TWO stratum-keyed percentile aggregations (exact
    interpolated percentile — strata cardinality ≪ corpus, and the
    exact percentile's per-group sort rides the aggregation), each
    broadcast back onto the scan-partitioned table; no corpus-wide
    window, same anti-skew design as zscore_outliers. Degenerate
    strata (MAD = 0) emit no outliers."""
    med = df.groupBy(by).agg(
        F.expr(f"percentile({column}, 0.5)").alias("__med"))
    dev = (df.join(F.broadcast(med), by)
           .withColumn("__ad", F.abs(F.col(column) - F.col("__med"))))
    mad = dev.groupBy(by).agg(
        F.expr("percentile(__ad, 0.5)").alias("__mad"))
    score = (F.col(column) - F.col("__med")) \
        / (F.lit(1.4826) * F.col("__mad"))
    return (dev.join(F.broadcast(mad), by)
            .where(F.col("__mad") > 0)
            .where(F.abs(score) > k)
            .select(F.col(id_col), F.col(by), F.col(column),
                    F.round(score, 6).alias("mad_score"),
                    F.lit(f"{column}.mad_outlier").alias("rule_id")))


def power_tail_hill(df: DataFrame, column: str, *, by: str,
                    k: int = 50) -> DataFrame:
    """Hill estimator of the power-law tail index per ``by``-stratum:
    ``alpha = k / Σ_{i≤k} ln(x_(i) / x_(k+1))`` over the top-k order
    statistics — the standard tail diagnostic for web-corpus size
    distributions (doc length, host volume, user activity are all
    heavy-tailed; alpha ≤ 2 means infinite variance, which is when
    mean/stddev gates like zscore_outliers stop meaning anything and
    the MAD/quantile operators are the right tool).

    Output per stratum: ``(by, n_rows, k_used, x_tail, alpha)`` where
    ``k_used = min(k, n-1)`` and ``x_tail`` is the (k_used+1)-th
    largest value. Strata with < 3 rows or a non-positive tail pivot
    are dropped (the log-ratio is undefined).

    Shape at scale: ONE stratum-keyed top-(k+1) window — the shuffle
    carries the full stratum but only k+1 rows survive per task
    output, and k is O(10²); the alpha reduction runs on strata·k
    rows. For the pathological one-giant-stratum case the same
    TakeOrdered-per-salt-then-merge refinement as key_skew_profile
    applies; at the documented k ≪ partition-size regime the window
    form is the cheaper plan."""
    w = Window.partitionBy(by).orderBy(F.col(column).desc())
    top = (df.where(F.col(column).isNotNull())
           .withColumn("__r", F.row_number().over(w))
           .where(F.col("__r") <= k + 1))
    sizes = (df.where(F.col(column).isNotNull())
             .groupBy(by).agg(F.count("*").alias("n_rows")))
    pivot = (top.groupBy(by)
             .agg(F.count("*").alias("__m"),
                  F.min(column).alias("__xt")))
    return (top.join(F.broadcast(pivot), by)
            .where((F.col("__m") >= 3) & (F.col("__xt") > 0)
                   & (F.col("__r") < F.col("__m")))
            .groupBy(by)
            .agg(F.max(F.col("__m") - 1).alias("k_used"),
                 F.max("__xt").alias("x_tail"),
                 F.round((F.max(F.col("__m")) - 1)
                         / F.sum(F.log(F.col(column) / F.col("__xt"))),
                         6).alias("alpha"))
            .join(F.broadcast(sizes), by)
            .select(by, "n_rows", F.col("k_used").cast("long"),
                    "x_tail", "alpha"))


def diurnal_profile(df: DataFrame, *, ts_col: str, group_col: str,
                    round_to: int = 6) -> DataFrame:
    """Circular time-of-day statistics per group — the activity-rhythm
    fingerprint: bots fire uniformly around the clock (resultant
    length R near 0 means no daily rhythm — or exactly two antipodal
    shifts), humans concentrate in waking hours (R → 1 is a single
    sharp peak). Linear mean/stddev are WRONG on a circle (23:00 and
    01:00 average to noon); the resultant-vector form is the standard
    fix (Fisher, Statistical Analysis of Circular Data, §2.3).

    Per group: ``n_events``, ``r_concentration`` = |Σe^{iθ}|/n and
    ``mean_hour`` = atan2 of the resultant mapped to [0, 24), with
    θ = 2π·(second of day)/86400, both round-*round_to*.

    Shape: one projection (hour/minute/second of the timestamp) + one
    group aggregation with map-side combine — nothing else."""
    import math

    sec = (F.hour(ts_col) * 3600 + F.minute(ts_col) * 60
           + F.second(ts_col))
    theta = sec.cast("double") * F.lit(2.0 * math.pi / 86400.0)
    base = (df.where(F.col(ts_col).isNotNull())
            .select(F.col(group_col).alias("group"),
                    F.cos(theta).alias("__c"), F.sin(theta).alias("__s")))
    tau = 2.0 * math.pi
    mean_hour = F.pmod(F.atan2(F.sum("__s"), F.sum("__c")) + F.lit(tau),
                       F.lit(tau)) * F.lit(24.0 / tau)
    return (base.groupBy("group")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sqrt(F.pow(F.sum("__c"), 2)
                                + F.pow(F.sum("__s"), 2))
                         / F.count("*"), round_to)
                 .alias("r_concentration"),
                 F.round(mean_hour, round_to).alias("mean_hour")))


def quantile_normalize(df: DataFrame, column: str, *, by: str,
                       round_to: int = 6) -> DataFrame:
    """Per-stratum percentile rank of ``column`` — quantile
    normalization, the only way scores from different sources are
    comparable when their raw distributions differ (a perplexity of
    180 is elite for source A and garbage for source B; percentile 0.93
    is percentile 0.93): ``pct = (rank − 1)/(n − 1)`` with rank = 1 +
    count of strictly smaller values (percent_rank semantics, ties
    share a rank).

    Deliberately NOT a percent_rank window over the corpus: that
    shuffles 10^12 rows onto a handful of stratum keys (maximal skew).
    Instead the (stratum, value) DISTINCT table — bounded by the value
    vocabulary, not the corpus — carries a cumulative count window,
    and rows join back on the (stratum, value) key: the same
    broadcast-stats shape as zscore_outliers. Adds ``pct`` (NULL for
    single-row strata, where (n−1) is 0)."""
    vc = (df.where(F.col(column).isNotNull())
          .groupBy(by, column).agg(F.count("*").alias("__c")))
    w = (Window.partitionBy(by).orderBy(column)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    vc = (vc.withColumn("__below", F.sum("__c").over(w) - F.col("__c"))
          .withColumn("__n", F.sum("__c").over(
              Window.partitionBy(by).rowsBetween(
                  Window.unboundedPreceding, Window.unboundedFollowing))))
    pct = F.when(F.col("__n") > 1,
                 F.round(F.col("__below") / (F.col("__n") - 1), round_to))
    return (df.join(F.broadcast(vc.select(
        by, column, pct.alias("pct"))), [by, column], "left"))


def type_affinity(df: DataFrame, *, entity_col: str, type_col: str,
                  round_to: int = 6) -> DataFrame:
    """Cosine affinity between categorical types over shared-entity
    engagement vectors — the bipartite-projection similarity (who
    clicks also buys?): type t's vector is its per-entity count
    profile; affinity(a,b) = Σ_u c_ua·c_ub / (|a||b|). High affinity
    means the types are near-interchangeable signals; near-zero means
    disjoint populations (a segmentation the funnel/Markov operators
    then explain).

    Output: ``(type_a, type_b, n_shared_entities, cosine)`` for
    type_a < type_b.

    Shape at scale: one (entity, type) count aggregation, a self-join
    keyed on the ENTITY (each entity contributes |types-it-touched|²
    products — bounded by the type vocabulary, not the corpus), type-
    keyed norm aggregation broadcast back. Never materializes the
    dense type×entity matrix."""
    c = (df.where(F.col(entity_col).isNotNull())
         .groupBy(entity_col, type_col)
         .agg(F.count("*").alias("__c")))
    c = c.persist()
    norms = (c.groupBy(type_col)
             .agg(F.sqrt(F.sum(F.col("__c") * F.col("__c")))
                  .alias("__nrm")))
    a, b = c.alias("a"), c.alias("b")
    dots = (a.join(b, (F.col(f"a.{entity_col}") == F.col(f"b.{entity_col}"))
                   & (F.col(f"a.{type_col}") < F.col(f"b.{type_col}")))
            .groupBy(F.col(f"a.{type_col}").alias("type_a"),
                     F.col(f"b.{type_col}").alias("type_b"))
            .agg(F.count("*").alias("n_shared_entities"),
                 F.sum(F.col("a.__c") * F.col("b.__c")).alias("__dot")))
    na = norms.select(F.col(type_col).alias("type_a"),
                      F.col("__nrm").alias("__na"))
    nb = norms.select(F.col(type_col).alias("type_b"),
                      F.col("__nrm").alias("__nb"))
    out = (dots.join(F.broadcast(na), "type_a")
           .join(F.broadcast(nb), "type_b")
           .select("type_a", "type_b",
                   F.col("n_shared_entities").cast("long")
                   .alias("n_shared_entities"),
                   F.round(F.col("__dot") / (F.col("__na")
                                             * F.col("__nb")),
                           round_to).alias("cosine")))
    out._zoi_persisted = [c]
    return out


def debounce_events(df: DataFrame, *, entity_col: str, type_col: str,
                    ts_col: str, id_col: str,
                    min_gap_s: int = 5) -> DataFrame:
    """Lag-debounce duplicate-event suppression: a row whose gap to
    the PREVIOUS row of the same (entity, type) — ordered by (ts, id)
    — is under *min_gap_s* is flagged as a bounce (double-click,
    retry storm, at-least-once redelivery). This is the LAG rule, not
    the chained-kept rule: after a kept row at t, rows at t+3 and t+6
    flag only t+3 (t+6's predecessor is t+3). The chained form needs
    sequential state (applyInPandasWithState on a stream — see
    streaming.py); the lag form is one window and catches the same
    storms, slightly over-keeping inside a long burst.

    Returns the input plus ``gap_s`` (NULL for each (entity, type)
    head) and ``bounce``. One (entity, type)-keyed window — the same
    shuffle sessionize pays."""
    w = (Window.partitionBy(entity_col, type_col)
         .orderBy(F.col(ts_col), F.col(id_col)))
    gap = (F.unix_timestamp(F.col(ts_col))
           - F.lag(F.unix_timestamp(F.col(ts_col))).over(w))
    return (df.withColumn("gap_s", gap)
            .withColumn("bounce",
                        F.coalesce(F.col("gap_s") < min_gap_s,
                                   F.lit(False))))


def lognormal_fit(df: DataFrame, column: str, *, by: str,
                  round_to: int = 6) -> DataFrame:
    """Log-normal fit per stratum — the default null model for web
    text-length distributions (lengths are multiplicative processes;
    Mitzenmacher 2004): ``mu``/``sigma`` are the moments of ln(x) with
    the explicit two-moment sample-variance form (identical arithmetic
    in every engine, no streaming-variance implementation drift), and
    ``within_1sigma`` is the empirical mass inside mu±sigma — ≈0.6827
    under a true log-normal; a big deficit means a second mode (spam
    mass) the histogram operators should then localize.

    Rows with x ≤ 0/NULL are excluded. Output: ``(by, n, mu, sigma,
    within_1sigma)``; single-row or zero-variance strata report
    sigma 0 and NULL within_1sigma.

    Shape: one moment aggregation + broadcast join back + one
    re-aggregation — the zscore_outliers anti-skew pattern (no
    stratum-keyed window over the corpus)."""
    lx = F.log(F.col(column))
    base = (df.where(F.col(column).isNotNull() & (F.col(column) > 0))
            .select(F.col(by), lx.alias("__lx")))
    m = (base.groupBy(by)
         .agg(F.count("*").alias("n"), F.sum("__lx").alias("__s"),
              F.sum(F.col("__lx") * F.col("__lx")).alias("__s2")))
    mu = F.col("__s") / F.col("n")
    var = F.when(F.col("n") > 1,
                 (F.col("__s2") - F.col("__s") * F.col("__s")
                  / F.col("n")) / (F.col("n") - 1))
    m = m.select(by, "n", mu.alias("__mu"),
                 F.sqrt(F.greatest(var, F.lit(0.0))).alias("__sig"))
    j = base.join(F.broadcast(m), by)
    inside = F.abs(F.col("__lx") - F.col("__mu")) <= F.col("__sig")
    return (j.groupBy(by)
            .agg(F.max("n").alias("n"),
                 F.round(F.max("__mu"), round_to).alias("mu"),
                 F.round(F.max("__sig"), round_to).alias("sigma"),
                 F.when(F.max("__sig") > 0,
                        F.round(F.avg(inside.cast("int")), round_to))
                 .alias("within_1sigma"))
            .select(by, F.col("n").cast("long").alias("n"), "mu",
                    "sigma", "within_1sigma"))


# ---------------------------------------------------------------------------
# functional dependencies, candidate keys, completeness, KMV overlap
# (round-7 validation wave: schema-level invariants the reference's
# per-value rules can't see — Zoi's `unique_items`/enum membership
# generalized to whole-table dependency checks, types/array.ex:260-274)
# ---------------------------------------------------------------------------

def fd_violations(df: DataFrame, determinant: Sequence[str],
                  dependent: str) -> DataFrame:
    """Functional-dependency check ``determinant → dependent``: emit
    one row per determinant value that maps to MORE than one distinct
    dependent value — ``(*determinant, n_rows, n_dependent, dep_min,
    dep_max)``.

    Shape at 10^12 rows: ONE hash aggregation on the determinant with
    map-side combine (count-distinct over the dependent rewrites to a
    two-phase Expand aggregate); no window, no join. Skewed
    determinants are just big groups — the agg is associative, so AQE
    splits them. NULL determinants group together (SQL GROUP BY
    semantics, same in the DuckDB twin); NULL dependents are ignored
    by count(distinct) on both engines."""
    return (df.groupBy(*determinant)
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct(dependent).alias("n_dependent"),
                 F.min(dependent).alias("dep_min"),
                 F.max(dependent).alias("dep_max"))
            .where(F.col("n_dependent") > 1))


def key_candidates(df: DataFrame, combos: Sequence[Sequence[str]],
                   *, exact: bool = True,
                   round_to: int = 6) -> DataFrame:
    """Candidate-key uniqueness profile: for each column combo report
    ``(combo, n_rows, n_distinct, distinct_ratio, is_key)`` — the
    primary-key discovery pass a validation run does before wiring
    `duplicates()` on the winner.

    ONE aggregation over ONE scan profiles every combo: each combo
    becomes a count-distinct over a NULL-tagged concat key (NULLs are
    tagged, not coalesced away, so (NULL) ≠ ('') and a NULL-bearing
    combo can never count as a key — count_distinct skips fully-NULL
    keys only when every member is NULL). With ``exact=False`` the
    count-distincts become HLL ``approx_count_distinct`` (±2%), the
    10^12-row variant: the multi-distinct Expand (one input row
    duplicated per combo) is replaced by mergeable sketches in a
    single partial agg. The oracle twin runs exact."""
    def key(cols):
        parts = []
        for c in cols:
            parts.append(F.when(F.col(c).isNull(), F.lit("\x01N"))
                         .otherwise(F.concat(F.lit("\x01V"),
                                             F.col(c).cast("string"))))
        return F.concat(*parts)

    cnt = (F.approx_count_distinct if not exact else F.countDistinct)
    aggs = [F.count("*").alias("n_rows")]
    for i, cols in enumerate(combos):
        aggs.append(cnt(key(cols)).alias(f"__d{i}"))
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{'+'.join(cols)}', __d{i}" for i, cols in enumerate(combos))
    out = row.selectExpr(
        "n_rows", f"stack({len(combos)}, {stack}) AS (combo, n_distinct)")
    return out.select(
        "combo", F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(F.col("n_distinct") / F.col("n_rows"),
                round_to).alias("distinct_ratio"),
        (F.col("n_distinct") == F.col("n_rows")).alias("is_key"))


def completeness_matrix(df: DataFrame, columns: Sequence[str],
                        *, by: str,
                        round_to: int = 6) -> DataFrame:
    """Per-segment completeness: ``(segment, column, n_rows, n_null,
    null_rate)`` for every column in ``columns`` — the null-rate
    matrix that catches a broken extractor in ONE source while the
    corpus-wide rate stays green.

    ONE hash aggregation on the segment key (every column's null
    count is a sum aggregate in the same pass, map-side combined),
    then a `stack` unpivot of the tiny per-segment result — no second
    scan, no per-column jobs. Empty string counts as missing for
    string columns (web-extractor convention, matching the
    min-length-1 rules of webtext_schema)."""
    aggs = [F.count("*").alias("n_rows")]
    for i, c in enumerate(columns):
        miss = F.col(c).isNull()
        if dict(df.dtypes).get(c) == "string":
            miss = miss | (F.col(c) == "")
        aggs.append(F.sum(miss.cast("long")).alias(f"__m{i}"))
    g = df.groupBy(F.col(by).alias("segment")).agg(*aggs)
    stack = ", ".join(f"'{c}', __m{i}" for i, c in enumerate(columns))
    return (g.selectExpr("segment", "n_rows",
                         f"stack({len(columns)}, {stack})"
                         " AS (column, n_null)")
            .select("segment", "column",
                    F.col("n_rows").cast("long").alias("n_rows"),
                    F.col("n_null").cast("long").alias("n_null"),
                    F.round(F.col("n_null") / F.col("n_rows"),
                            round_to).alias("null_rate")))


_KMV_HEX = 12  # 48-bit hash: BIGINT-safe, collision odds ~n²/2^49


def _kmv_hash(col) -> "F.Column":
    # first 12 md5 hex chars → 48-bit integer; md5 is bit-identical
    # across Spark and DuckDB (unlike xxhash64), same idiom as
    # sampling.hash_sample
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, _KMV_HEX),
                   16, 10).cast("long"))


def kmv_overlap(df_a: DataFrame, df_b: DataFrame, column: str,
                *, k: int = 256, round_to: int = 6) -> DataFrame:
    """KMV (k-minimum-values) bottom-k sketch overlap of two key sets:
    one row ``(k, d_a_est, d_b_est, d_union_est, jaccard_est,
    d_intersection_est)``.

    THE way to ask "how much does snapshot B overlap snapshot A?" at
    10^12 urls without joining two trillion-row tables: each side
    reduces to its k smallest distinct 48-bit key hashes (a
    TakeOrdered — per-partition bottom-k, then a k·partitions merge
    on the driver side of the exchange; NO full sort, NO shuffle of
    the corpus), and the estimates come from k-row frames. D̂ =
    (k−1)·2^48/h₍ₖ₎ (Beyer et al. 2007); Ĵ = |bottom-k(A∪B) ∩ A ∩
    B| / k; |A∩B| ≈ Ĵ·D̂_union. Deterministic: md5 has no seed, so
    the sketch — and the DuckDB oracle twin — is bit-identical run to
    run. Sides smaller than k are exact by construction."""
    # localCheckpoint the k-row sketches (eager, tiny): each is used
    # twice (merge + per-side stats) — without it the LINEAGE re-runs
    # and the corpus is scanned 4× instead of the minimal 2×
    ha = (df_a.select(_kmv_hash(F.col(column)).alias("h"))
          .where(F.col("h").isNotNull()).distinct()
          .orderBy("h").limit(k).localCheckpoint(eager=True))
    hb = (df_b.select(_kmv_hash(F.col(column)).alias("h"))
          .where(F.col("h").isNotNull()).distinct()
          .orderBy("h").limit(k).localCheckpoint(eager=True))
    a = ha.select("h", F.lit(1).alias("in_a"))
    b = hb.select("h", F.lit(1).alias("in_b"))
    merged = (a.join(b, "h", "full")
              .select("h", F.coalesce("in_a", F.lit(0)).alias("in_a"),
                      F.coalesce("in_b", F.lit(0)).alias("in_b"))
              .orderBy("h").limit(k))
    full = float(16 ** _KMV_HEX)

    def est(n_col, kth_col):
        # fewer than k distinct hashes → the sketch IS the set
        return F.when(n_col < k, n_col.cast("double")).otherwise(
            (F.lit(float(k - 1)) * F.lit(full)) / kth_col)

    stats = merged.agg(
        F.count("*").alias("n_u"), F.max("h").alias("kth_u"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1))
              .cast("long")).alias("n_both"))
    for side, sk in (("a", ha), ("b", hb)):
        s = sk.agg(F.count("*").alias(f"n_{side}"),
                   F.max("h").alias(f"kth_{side}"))
        stats = stats.crossJoin(F.broadcast(s))  # 1×1 frames
    d_u = est(F.col("n_u"), F.col("kth_u"))
    j = F.col("n_both") / F.col("n_u")
    return stats.select(
        F.lit(k).alias("k"),
        F.round(est(F.col("n_a"), F.col("kth_a")), round_to).alias("d_a_est"),
        F.round(est(F.col("n_b"), F.col("kth_b")), round_to).alias("d_b_est"),
        F.round(d_u, round_to).alias("d_union_est"),
        F.round(j, round_to).alias("jaccard_est"),
        F.round(j * d_u, round_to).alias("d_intersection_est"))


def interval_overlaps(df: DataFrame, *, entity_col: str,
                      start_col: str, end_col: str,
                      id_col: str) -> DataFrame:
    """Overlapping-interval audit: rows whose interval starts before a
    previous interval of the SAME entity has ended — double-billing /
    double-session / concurrent-crawl violations. Output: the
    violating row's ``(entity, id, start, end)`` plus ``prev_end``
    (the running max end among its predecessors) and ``overlap``
    (``min(end, prev_end) − start``, > 0 by construction).

    Start/end are numeric (cast timestamps to epoch seconds first —
    keeps the op engine-portable and unit-explicit). Predecessor order
    is ``(start, end, id)``; the running ``max(end)`` over the
    preceding frame catches overlaps with ANY earlier interval, not
    just the adjacent one (a long interval swallowing short ones).

    Shape at 10^12 rows: ONE entity-keyed window (same shuffle
    sessionize pays); no self-join — the O(n²) interval join collapses
    into a running max because intervals are scanned in start order."""
    w = (Window.partitionBy(entity_col)
         .orderBy(start_col, end_col, id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    prev_end = F.max(end_col).over(w)
    return (df.select(entity_col, id_col, start_col, end_col,
                      prev_end.alias("prev_end"))
            .where(F.col("prev_end").isNotNull()
                   & (F.col(start_col) < F.col("prev_end")))
            .withColumn("overlap",
                        F.least(F.col(end_col), F.col("prev_end"))
                        - F.col(start_col)))


def sequence_violations(df: DataFrame, *, entity_col: str,
                        ts_col: str, type_col: str,
                        first_type: str, then_type: str) -> DataFrame:
    """Sequence-constraint audit "``first_type`` happens before
    ``then_type``": per entity, compare FIRST occurrences. Output one
    row per violating entity — ``kind='out_of_order'`` (both present,
    wrong order) or ``kind='missing_precursor'`` (``then_type``
    without any ``first_type``) — with both first timestamps.

    Shape: ONE hash aggregation (conditional mins, map-side combined)
    + a filter; no window, no join — the funnel trick
    (`funnel_stages`) applied to constraint checking."""
    f = F.min(F.when(F.col(type_col) == first_type,
                     F.col(ts_col))).alias("first_ts")
    t = F.min(F.when(F.col(type_col) == then_type,
                     F.col(ts_col))).alias("then_ts")
    g = df.groupBy(entity_col).agg(f, t)
    return (g.where(F.col("then_ts").isNotNull()
                    & (F.col("first_ts").isNull()
                       | (F.col("then_ts") < F.col("first_ts"))))
            .select(entity_col, "first_ts", "then_ts",
                    F.when(F.col("first_ts").isNull(),
                           F.lit("missing_precursor"))
                    .otherwise(F.lit("out_of_order")).alias("kind")))


def reconcile_totals(fact: DataFrame, detail: DataFrame, *,
                     key: str, fact_cents, detail_cents,
                     by: str, tol_cents: int = 1,
                     round_to: int = 6) -> DataFrame:
    """Cross-table aggregate reconciliation: does the fact table's
    stored total equal the sum over its detail rows? Per ``by``
    segment: ``(by, n_facts, n_mismatch, n_missing_detail,
    mismatch_rate, max_abs_delta_cents)``.

    ``fact_cents`` / ``detail_cents`` are Column expressions yielding
    INTEGER minor units (cents) — integer sums are associative, so the
    result is bit-identical regardless of partitioning or engine
    (float sums are NOT: at 15k doubles the accumulation-order error
    already exceeds 1e-3). Facts with no detail rows count as
    ``n_missing_detail``, not mismatches.

    Shape at 10^12 rows: one key-keyed detail aggregation (map-side
    combine), one equi-join fact↔agg (AQE-planned), one segment
    aggregation. Detail skew = hot fact keys; the pre-aggregation
    bounds each join group to one row per side."""
    d = (detail.groupBy(F.col(key))
         .agg(F.sum(detail_cents.cast("long")).alias("__dsum")))
    j = (fact.select(F.col(key), F.col(by).alias("__by"),
                     fact_cents.cast("long").alias("__fsum"))
         .join(d, key, "left"))
    delta = F.col("__fsum") - F.col("__dsum")
    mismatch = (F.col("__dsum").isNotNull()
                & (F.abs(delta) > tol_cents)).cast("long")
    return (j.groupBy(F.col("__by").alias(by))
            .agg(F.count("*").cast("long").alias("n_facts"),
                 F.sum(mismatch).alias("n_mismatch"),
                 F.sum(F.col("__dsum").isNull().cast("long"))
                 .alias("n_missing_detail"),
                 F.round(F.sum(mismatch)
                         / F.count("*"), round_to).alias("mismatch_rate"),
                 F.max(F.when(F.col("__dsum").isNotNull(), F.abs(delta)))
                 .alias("max_abs_delta_cents")))


def derived_mismatch(df: DataFrame, *, stored_col: str, derived,
                     by: str, tol: float = 0,
                     round_to: int = 6) -> DataFrame:
    """Stored-vs-derived column consistency audit: does the
    materialized column still equal the expression it claims to cache
    (``n_chars`` vs ``length(text)``, a stored digest vs a recomputed
    one)? Per ``by`` segment: ``(by, n_rows, n_mismatch,
    mismatch_rate, max_abs_delta)`` — a broken backfill shows up as
    one segment's rate jumping while the rest stay 0.

    ``derived`` is a Column expression evaluated in the same
    projection as the comparison: ONE scan, ONE hash aggregation,
    nothing shuffled but the per-segment partials. NULL stored or
    derived values count as mismatches unless both are NULL."""
    delta = F.abs(F.col(stored_col) - derived)
    mism = F.when(F.col(stored_col).isNull() & derived.isNull(),
                  F.lit(0)) \
            .when(F.col(stored_col).isNull() | derived.isNull(),
                  F.lit(1)) \
            .otherwise((delta > tol).cast("int")).cast("long")
    return (df.groupBy(F.col(by))
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum(mism).alias("n_mismatch"),
                 F.round(F.sum(mism) / F.count("*"),
                         round_to).alias("mismatch_rate"),
                 F.max(delta).alias("max_abs_delta")))


def mode_share(df: DataFrame, columns: Sequence[str],
               *, round_to: int = 6) -> DataFrame:
    """Dominant-value profile: for each column, its most frequent
    value and that value's share of rows — ``(column, top_value,
    n_top, n_rows, top_share)``. A share near 1.0 flags a constant /
    default-stuffed column (broken extractor writing its fallback),
    the complement of the uniqueness checks.

    One stack-unpivot projection (rows × len(columns), no Python) +
    one two-key hash aggregation + one per-column max. The winner is
    ``max(struct(count, value))`` — count first, then value — so ties
    break deterministically toward the larger value string on BOTH
    engines. NULLs are tallied as the tagged literal ``\\x01NULL`` so
    a mostly-NULL column is correctly reported as dominated by it. At
    10^12 rows the unpivot multiplies the shuffle by len(columns):
    profile a hash sample (`sampling.hash_sample`) or swap the exact
    count for a count-min sketch; shares, not exact counts, are the
    signal."""
    tagged = [F.coalesce(F.col(c).cast("string"),
                         F.lit("\x01NULL")).alias(f"__v{i}")
              for i, c in enumerate(columns)]
    stack = ", ".join(f"'{c}', __v{i}" for i, c in enumerate(columns))
    long = (df.select(*tagged)
            .selectExpr(f"stack({len(columns)}, {stack})"
                        " AS (column, value)"))
    counts = long.groupBy("column", "value").agg(
        F.count("*").alias("n"))
    top = (counts.groupBy("column")
           .agg(F.max(F.struct(F.col("n"), F.col("value"))).alias("t"),
                F.sum("n").alias("n_rows")))
    return top.select(
        "column", F.col("t.value").alias("top_value"),
        F.col("t.n").cast("long").alias("n_top"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(F.col("t.n") / F.col("n_rows"),
                round_to).alias("top_share"))


def rate_cap_violations(df: DataFrame, *, entity_col: str,
                        ts_col: str, cap: int,
                        window_s: int = 60) -> DataFrame:
    """Rate-limit audit: ``(entity, window_start_s, n_events)`` for
    every tumbling window where one entity exceeded ``cap`` events —
    the bot / retry-storm / scraper detector on a fetch log.

    Tumbling (not sliding) windows by design: one hash aggregation on
    ``(entity, floor(epoch/window))``, map-side combined, no window
    function, no self-join — at 10^12 events a sliding-window count
    would shuffle every event into every overlapping frame. A burst
    straddling a boundary can evade one tumbling grid by half a
    window; run a second pass with ``window_s`` offset if that
    matters operationally."""
    win = (F.floor(F.unix_timestamp(F.col(ts_col))
                   / F.lit(int(window_s))) * int(window_s))
    return (df.groupBy(F.col(entity_col),
                       win.cast("long").alias("window_start_s"))
            .agg(F.count("*").cast("long").alias("n_events"))
            .where(F.col("n_events") > int(cap)))


def schema_drift_rows(spark, baseline: "T.StructType",
                      current: "T.StructType") -> DataFrame:
    """`schema_drift` as a row-shaped report: one row per drifted
    field — ``(field, change ∈ {added, removed, retyped,
    nullability_changed}, from_type, to_type)`` — so the schema gate
    lands in the same violations sink as the row-level rules.

    Driver-side on the StructTypes (footer metadata, no data pass);
    the frame is trivially small. Types are `simpleString()` forms;
    absent sides are NULL."""
    b = {f.name: f for f in baseline.fields}
    c = {f.name: f for f in current.fields}
    rows = []
    for n in sorted(set(c) - set(b)):
        rows.append((n, "added", None, c[n].dataType.simpleString()))
    for n in sorted(set(b) - set(c)):
        rows.append((n, "removed", b[n].dataType.simpleString(), None))
    for n in sorted(set(b) & set(c)):
        bt = b[n].dataType.simpleString()
        ct = c[n].dataType.simpleString()
        if bt != ct:
            rows.append((n, "retyped", bt, ct))
        elif b[n].nullable != c[n].nullable:
            rows.append((n, "nullability_changed", bt, ct))
    schema = ("field string, change string, from_type string, "
              "to_type string")
    return spark.createDataFrame(rows, schema)


def transition_violations(df: DataFrame, *, entity_col: str,
                          ts_col: str, type_col: str, id_col: str,
                          allowed: "Sequence[tuple]") -> DataFrame:
    """State-machine conformance audit: count adjacent per-entity
    transitions NOT in the ``allowed`` whitelist — ``(from_type,
    to_type, n)``. The complement of `markov_transitions` (which
    estimates probabilities): this one enforces the contract
    "a session may only move signup→view→click→purchase…" and
    surfaces everything else.

    Order is ``(ts, id)`` within the entity (the id tie-break keeps
    equal-timestamp rows deterministic). ONE entity-keyed window for
    the lag + ONE (from,to) aggregation; the whitelist compiles to a
    literal OR-of-pairs predicate (null-safe equality per side — no
    concatenated key, so state values containing any separator byte
    can't alias each other, and a NULL state is never spuriously
    whitelisted). A NULL ``type_col`` on either side of a real
    transition IS a violation (a state machine has no NULL state);
    only the first row per entity — no previous row at all,
    distinguished from a NULL previous VALUE by a lagged marker —
    is exempt."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    prev = F.lag(type_col).over(w)
    # lag of a literal: NULL exactly when there is no previous ROW
    prev_exists = F.coalesce(F.lag(F.lit(True)).over(w), F.lit(False))
    ok = F.lit(False)
    for a, b in allowed:
        ok = ok | (prev.eqNullSafe(F.lit(a))
                   & F.col(type_col).eqNullSafe(F.lit(b)))
    return (df.select(prev.alias("from_type"),
                      F.col(type_col).alias("to_type"),
                      prev_exists.alias("__e"), ok.alias("__ok"))
            .where(F.col("__e") & ~F.col("__ok"))
            .groupBy("from_type", "to_type")
            .agg(F.count("*").cast("long").alias("n")))


def cohen_kappa(df: DataFrame, col_a: str, col_b: str, *,
                round_to: int = 6) -> DataFrame:
    """Chance-corrected agreement between two categorical verdict
    columns (Cohen 1960) — the validation-tier question "do the old
    and new rule engines / the model and the annotator actually agree,
    beyond what the label mix alone predicts?". One row: ``(n,
    po, pe, kappa)`` with po = observed agreement share, pe = expected
    agreement under independent marginals Σ_k p_a(k)·p_b(k).

    ONE corpus shuffle (the (a,b) cell-count aggregation with map-side
    combine, ≤ |A|·|B| cells); everything after runs on the tiny cell
    table — marginal sums, an inner category join, one scalar row.
    Rows with a NULL on either side are excluded (no verdict ≠ a
    verdict)."""
    cells = (df.where(F.col(col_a).isNotNull()
                      & F.col(col_b).isNotNull())
             .groupBy(F.col(col_a).alias("__a"),
                      F.col(col_b).alias("__b"))
             .agg(F.count("*").alias("__n")))
    tot = cells.agg(
        F.sum("__n").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__n"))
              .otherwise(F.lit(0))).alias("n_agree"))
    ma = cells.groupBy("__a").agg(F.sum("__n").alias("na"))
    mb = cells.groupBy("__b").agg(F.sum("__n").alias("nb"))
    pe_num = (ma.join(mb, ma["__a"] == mb["__b"])
              .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")),
                              F.lit(0)).alias("pe_num")))
    po = F.col("n_agree") / F.col("n")
    pe = F.col("pe_num") / (F.col("n") * F.col("n"))
    kappa = F.when(pe < 1.0, (po - pe) / (1.0 - pe))
    return (tot.crossJoin(F.broadcast(pe_num))  # both single-row
            .select(F.col("n").cast("long").alias("n"),
                    F.round(po, round_to).alias("po"),
                    F.round(pe, round_to).alias("pe"),
                    F.round(kappa, round_to).alias("kappa")))


def coverage_gaps(df: DataFrame, col_a: str, col_b: str, *,
                  min_count: int = 1) -> DataFrame:
    """Negative-space audit: expected category combinations that are
    MISSING or under-populated — the cross product of the observed
    per-column category sets, minus combinations with ≥ ``min_count``
    rows. ``(col_a, col_b, n)`` with n = 0 for absent combos. The
    completeness complement of `completeness_matrix` (which measures
    null rates, not combination presence): "every lang should appear
    in every source" style contracts.

    ONE corpus shuffle (the (a,b) cell counts; the per-column distinct
    sets are derived FROM the cell table, not by re-scanning). The
    cross product and the left join run broadcast on category-sized
    frames — this is a categorical tool; a high-cardinality column
    pair belongs in `key_profile`/`fd_violations` instead."""
    cells = (df.where(F.col(col_a).isNotNull()
                      & F.col(col_b).isNotNull())
             .groupBy(F.col(col_a).alias("__a"),
                      F.col(col_b).alias("__b"))
             .agg(F.count("*").alias("__n"))
             .persist())
    da = cells.select("__a").distinct()
    db = cells.select("__b").distinct()
    out = (da.crossJoin(F.broadcast(db))
           .join(F.broadcast(cells), ["__a", "__b"], "left")
           .select(F.col("__a").alias(col_a),
                   F.col("__b").alias(col_b),
                   F.coalesce(F.col("__n"), F.lit(0))
                   .cast("long").alias("n"))
           .where(F.col("n") < int(min_count)))
    out._zoi_persisted = [cells]  # release after materialization
    return out


def _cms_bucket(col: Column, depth_i: int, width: int) -> Column:
    """Row-i count-min bucket: 48-bit md5 prefix of the salted value,
    mod width — DuckDB recomputes it as
    ``('0x' || substr(md5(i || '|' || v), 1, 12))::BIGINT % width``."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{depth_i}|"), col.cast("string"))),
        1, 12), 16, 10).cast("long")
    return F.pmod(h, F.lit(int(width)))


def cms_frequencies(df: DataFrame, column: str,
                    probes: Sequence[str], *, depth: int = 3,
                    width: int = 256) -> DataFrame:
    """Count-min sketch point-frequency estimates (Cormode &
    Muthukrishnan 2005): build a depth×width counter grid in ONE
    aggregation pass, answer "how often does value v occur?" for the
    ``probes`` without a per-probe corpus scan — ``(value, est_n)``,
    est ≥ true count (one-sided overestimate from collisions; error
    ≤ n/width with prob 1-2^-depth). The frequency sibling of the
    KMV distinct sketch (`kmv_overlap`) and the Bloom membership
    filter (`text.bloom_decontamination`).

    Plan: one explode(depth) projection → ONE shuffle keyed on
    (row, bucket) — at most depth·width cells regardless of corpus
    size — then the probe lookup joins a depth·|probes| literal frame
    against the broadcast sketch. Probe buckets are computed
    driver-side with hashlib (bit-identical to the JVM md5)."""
    import hashlib

    col = F.col(column).cast("string")
    cells = F.array(*[
        F.struct(F.lit(i).alias("__i"),
                 _cms_bucket(col, i, width).alias("__bkt"))
        for i in range(depth)])
    sketch = (df.where(col.isNotNull())
              .select(F.explode(cells).alias("c"))
              .groupBy(F.col("c.__i").alias("__i"),
                       F.col("c.__bkt").alias("__bkt"))
              .agg(F.count("*").alias("__n")))

    def bkt(v: str, i: int) -> int:
        h = int(hashlib.md5(f"{i}|{v}".encode()).hexdigest()[:12], 16)
        return h % width

    lookup = df.sparkSession.createDataFrame(
        [(v, i, bkt(v, i)) for v in probes for i in range(depth)],
        "value string, __i int, __bkt long")
    return (lookup.join(F.broadcast(sketch),
                        ["__i", "__bkt"], "left")
            .groupBy("value")
            .agg(F.min(F.coalesce(F.col("__n"), F.lit(0)))
                 .cast("long").alias("est_n")))


def ewma_anomalies(df: DataFrame, *, ts_col: str,
                   alpha: float = 0.3, factor: float = 2.0,
                   round_to: int = 6) -> DataFrame:
    """Daily-volume EWMA baseline + spike flags: per observed day,
    ``(day, n_events, ewma_prev, ratio, is_anomaly)`` where ewma_prev
    is the normalized exponentially-weighted mean of all PRIOR days'
    volumes (weight (1-α)^gap in observed-day rank order — the
    forecast a streaming monitor would hold entering the day) and
    is_anomaly = ratio > factor. The memory-weighted sibling of
    `daily_volume_anomalies` (global z) and `cusum_shift` (level
    shift): EWMA tracks a moving level, so a slow ramp stays quiet
    while a step spike fires.

    ONE corpus shuffle (the daily rollup); the prior-day weighting is
    a self-range-join on the tiny day table (≤ a few·10³ rows for
    years of data — quadratic there is trivial and exactly
    reproducible in SQL, unlike a recursive ewma). First day has NULL
    ewma_prev/ratio and is never an anomaly."""
    daily = (df.where(F.col(ts_col).isNotNull())
             .groupBy(F.to_date(ts_col).alias("day"))
             .agg(F.count("*").alias("n_events")))
    w = Window.orderBy("day")
    ranked = daily.withColumn("__r", F.row_number().over(w))
    cur, prev = ranked.alias("c"), ranked.alias("p")
    wgt = F.pow(F.lit(1.0 - alpha),
                (F.col("c.__r") - 1 - F.col("p.__r")).cast("double"))
    ew = (cur.join(prev, F.col("p.__r") < F.col("c.__r"))
          .groupBy(F.col("c.day").alias("day"),
                   F.col("c.n_events").alias("n_events"))
          .agg((F.sum(wgt * F.col("p.n_events")) / F.sum(wgt))
               .alias("__ew")))
    first = (ranked.where(F.col("__r") == 1)
             .select("day", "n_events",
                     F.lit(None).cast("double").alias("__ew")))
    ratio = F.col("n_events") / F.col("__ew")
    return (ew.unionByName(first)
            .select("day",
                    F.col("n_events").cast("long").alias("n_events"),
                    F.round(F.col("__ew"), round_to).alias("ewma_prev"),
                    F.round(ratio, round_to).alias("ratio"),
                    F.coalesce(ratio > factor, F.lit(False))
                    .alias("is_anomaly")))


def bh_fdr(df: DataFrame, p_col: str, *, by: str, q: float = 0.05,
           round_to: int = 6) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control per family (Benjamini &
    Hochberg 1995): when a validation run fires THOUSANDS of per-rule /
    per-segment hypothesis tests, raw p < 0.05 guarantees a flood of
    false alarms; BH bounds the expected false-discovery RATE at ``q``.
    Per family: ``(family, n_tests, n_rejected, p_crit)`` with
    n_rejected = max{i : p_(i) ≤ i·q/m} (0 and NULL p_crit when
    nothing survives).

    Tie-stability: the threshold i·q/m grows with i, so equal p values
    either all satisfy their own index or none do — row_number tie
    order cannot change n_rejected (no tiebreak column needed).

    Shape at 10^12 tests: ONE shuffle on the family key; the in-family
    sort is bounded by tests-per-family (rule-count × segment-count,
    thousands), never the corpus."""
    w = Window.partitionBy(by).orderBy(F.col(p_col).asc())
    i = F.row_number().over(w)
    base = (df.where(F.col(p_col).isNotNull())
            .select(F.col(by), F.col(p_col).alias("__p"),
                    i.alias("__i")))
    m = Window.partitionBy(by)
    flag = (F.col("__p") * F.count("*").over(m)
            <= F.col("__i") * F.lit(float(q)))
    return (base.withColumn("__hit", flag)
            .groupBy(by)
            .agg(F.count("*").cast("long").alias("n_tests"),
                 F.coalesce(F.max(F.when(F.col("__hit"), F.col("__i"))),
                            F.lit(0)).cast("long").alias("n_rejected"),
                 F.round(F.max(F.when(F.col("__hit"), F.col("__p"))),
                         round_to).alias("p_crit")))


def welch_ttest(df: DataFrame, value_col: str, *, group_col: str,
                group_a, group_b, round_to: int = 6) -> DataFrame:
    """Welch's unequal-variance two-sample t (the default two-engine /
    two-source mean comparison — never assume equal variances across
    web sources): one row ``(n_a, n_b, mean_a, mean_b, t_stat,
    df_welch)`` with the Welch–Satterthwaite degrees of freedom.

    Determinism: n, Σx, Σx² are accumulated EXACTLY (DECIMAL(38,6)),
    so for integer-valued columns (lengths, counts — the usual QA
    inputs) the statistic is bit-deterministic; the final combination
    runs in double on one row. One corpus aggregation, no shuffle
    beyond the 2-row partial merge."""
    x = F.col(value_col).cast("decimal(20,6)")
    g = (df.where(F.col(group_col).isin([group_a, group_b])
                  & F.col(value_col).isNotNull())
         .groupBy(group_col)
         .agg(F.count("*").alias("n"),
              F.sum(x).alias("s1"),
              F.sum((x * x).cast("decimal(38,6)")).alias("s2")))
    a = g.where(F.col(group_col) == group_a) \
         .select(F.col("n").alias("na"), F.col("s1").alias("sa"),
                 F.col("s2").alias("qa"))
    b = g.where(F.col(group_col) == group_b) \
         .select(F.col("n").alias("nb"), F.col("s1").alias("sb"),
                 F.col("s2").alias("qb"))
    j = a.crossJoin(F.broadcast(b))          # both single-row
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    qa, qb = F.col("qa").cast("double"), F.col("qb").cast("double")
    ma, mb = sa / na, sb / nb
    va = (qa - sa * sa / na) / (na - 1)       # sample variance
    vb = (qb - sb * sb / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / F.sqrt(se2)
    dfw = (se2 * se2) / ((va / na) * (va / na) / (na - 1)
                         + (vb / nb) * (vb / nb) / (nb - 1))
    return j.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(ma, round_to).alias("mean_a"),
        F.round(mb, round_to).alias("mean_b"),
        F.round(t, round_to).alias("t_stat"),
        F.round(dfw, round_to).alias("df_welch"))


def spearman_corr(df: DataFrame, col_x: str, col_y: str, *,
                  round_to: int = 6) -> DataFrame:
    """Spearman rank correlation (tie-corrected: Pearson over average
    ranks) between two numeric columns — the monotone-association QA
    check that is robust to the heavy tails web-scale length/score
    columns always have. One row: ``(n, rho)``.

    Average ranks come from the VALUE-DISTINCT counts table of each
    column (2·avgrank = 2·cum_before + n_ties + 1, the mannwhitney_u
    construction), joined back to rows on the value — so the doubled
    ranks are exact integers and every moment (accumulated as
    DECIMAL(38,0), overflow-safe to n ≈ 10^12) is exact; only the
    one-row final combination runs in double. Shape: two distinct-value
    aggregations + two value-keyed equi-joins + one corpus aggregation;
    value-key skew is AQE's standard case."""
    base = (df.where(F.col(col_x).isNotNull()
                     & F.col(col_y).isNotNull())
            .select(F.col(col_x).alias("__x"),
                    F.col(col_y).alias("__y")))

    def rank2_table(col):
        vc = base.groupBy(col).agg(F.count("*").alias("__n"))
        w = (Window.partitionBy().orderBy(col)
             .rowsBetween(Window.unboundedPreceding, -1))
        cum = F.coalesce(F.sum("__n").over(w), F.lit(0))
        return vc.select(col, (2 * cum + F.col("__n") + 1)
                         .cast("decimal(38,0)").alias(col + "_r2"))

    ranked = (base.join(rank2_table("__x"), "__x")
              .join(rank2_table("__y"), "__y"))
    rx = F.col("__x_r2")
    ry = F.col("__y_r2")
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum(rx).alias("sx"), F.sum(ry).alias("sy"),
        F.sum((rx * rx).cast("decimal(38,0)")).alias("sxx"),
        F.sum((ry * ry).cast("decimal(38,0)")).alias("syy"),
        F.sum((rx * ry).cast("decimal(38,0)")).alias("sxy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    rho = F.when(den > 0, F.round(num / den, round_to))
    return agg.select(F.col("n").cast("long").alias("n"),
                      rho.alias("rho"))


def prop_ztest(df: DataFrame, flag_col, *, group_col: str,
               group_a, group_b, round_to: int = 6) -> DataFrame:
    """Two-proportion pooled z-test — "did the pass rate really move
    between engine versions / sources, or is it sample noise?" (the
    validation-tier A/B question). One row: ``(n_a, k_a, n_b, k_b,
    rate_a, rate_b, z_stat)`` with the pooled-variance z; counts are
    exact integers, so z is bit-deterministic. ``flag_col`` may be a
    column name or a boolean Column expression. One corpus aggregation."""
    flag = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    g = (df.where(F.col(group_col).isin([group_a, group_b]))
         .groupBy(group_col)
         .agg(F.count("*").alias("n"),
              F.sum(flag.cast("long")).alias("k")))
    a = g.where(F.col(group_col) == group_a) \
         .select(F.col("n").alias("na"), F.col("k").alias("ka"))
    b = g.where(F.col(group_col) == group_b) \
         .select(F.col("n").alias("nb"), F.col("k").alias("kb"))
    j = a.crossJoin(F.broadcast(b))
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    ka, kb = F.col("ka").cast("double"), F.col("kb").cast("double")
    pa, pb = ka / na, kb / nb
    pool = (ka + kb) / (na + nb)
    se = F.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    z = F.when(se > 0, F.round((pa - pb) / se, round_to))
    return j.select(F.col("na").cast("long").alias("n_a"),
                    F.col("ka").cast("long").alias("k_a"),
                    F.col("nb").cast("long").alias("n_b"),
                    F.col("kb").cast("long").alias("k_b"),
                    F.round(pa, round_to).alias("rate_a"),
                    F.round(pb, round_to).alias("rate_b"),
                    z.alias("z_stat"))


def runs_test(df: DataFrame, flag_col, *, entity_col: str,
              ts_col: str, id_col: str, min_each: int = 5,
              round_to: int = 6) -> DataFrame:
    """Wald–Wolfowitz runs test per entity: are an entity's pass/fail
    outcomes randomly interleaved, or do failures arrive in BURSTS
    (clustered violations = a broken upstream batch, not row noise)?
    Per entity with ≥ ``min_each`` of each outcome: ``(entity, n,
    n_true, n_runs, z_stat)`` where z compares the observed run count
    to μ = 2·n1·n0/n + 1 with the exact W-W variance. Sequence order
    is (ts, id) — deterministic under ties. All counts are exact
    integers; z is derived from them on the aggregated row.

    Shape: ONE entity-keyed window (the lag) + ONE entity aggregation
    — the same shuffle any per-entity audit pays."""
    flag = (F.col(flag_col) if isinstance(flag_col, str)
            else flag_col).cast("boolean")
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    prev = F.lag(flag.cast("int")).over(w)
    step = F.when(prev.isNull() | (prev == flag.cast("int")),
                  F.lit(0)).otherwise(F.lit(1))
    per = (df.select(F.col(entity_col), flag.alias("__f"),
                     step.alias("__s"))
           .groupBy(entity_col)
           .agg(F.count("*").alias("n"),
                F.sum(F.col("__f").cast("long")).alias("n1"),
                (F.sum("__s") + 1).alias("runs")))
    n = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    n0 = n - n1
    mu = 2 * n1 * n0 / n + 1
    var = (2 * n1 * n0 * (2 * n1 * n0 - n)) / (n * n * (n - 1))
    z = F.round((F.col("runs").cast("double") - mu) / F.sqrt(var),
                round_to)
    return (per.where((F.col("n1") >= int(min_each))
                      & (F.col("n") - F.col("n1") >= int(min_each)))
            .select(F.col(entity_col),
                    F.col("n").cast("long").alias("n"),
                    F.col("n1").cast("long").alias("n_true"),
                    F.col("runs").cast("long").alias("n_runs"),
                    z.alias("z_stat")))


def bucket_migration(df: DataFrame, *, snap_col: str, id_col: str,
                     score_col: str,
                     thresholds: Sequence[float]) -> DataFrame:
    """Quality-migration matrix between the two snapshots in
    ``snap_col``: each id's score is bucketed by the EXPLICIT
    ``thresholds`` edges (bucket b = # edges ≤ score, so len+1
    buckets, 0-based) and the (from_bucket, to_bucket) transition
    cells are counted — "did last month's top-quartile pages stay
    top-quartile?". Output: ``(from_bucket, to_bucket, n)`` over ids
    present in BOTH snapshots.

    Thresholds are caller-provided VALUES (derive them once from
    `stats_quantiles` / a KLL sketch) precisely so this needs NO
    global sort or ntile at 10^12 rows: bucketing is a pure
    projection, and the only shuffles are the id equi-join and the
    (≤ (len+1)²)-cell count. An ntile formulation would sort half the
    corpus in one task per snapshot."""
    ts = sorted(float(t) for t in thresholds)
    if not ts:
        raise ValueError("bucket_migration: thresholds required")
    snaps = [r[0] for r in
             df.select(snap_col).distinct().orderBy(snap_col).collect()]
    if len(snaps) != 2:
        raise ValueError(f"bucket_migration expects exactly 2 "
                         f"snapshots, got {snaps!r}")
    b = F.lit(0)
    for t in ts:
        b = b + (F.col(score_col) >= F.lit(t)).cast("int")
    slim = (df.where(F.col(score_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(snap_col).alias("__s"),
                    F.col(id_col).alias("__id"),
                    b.cast("long").alias("__b")))
    a = (slim.where(F.col("__s") == snaps[0])
         .groupBy("__id").agg(F.min("__b").alias("from_bucket")))
    c = (slim.where(F.col("__s") == snaps[1])
         .groupBy("__id").agg(F.min("__b").alias("to_bucket")))
    return (a.join(c, "__id")
            .groupBy("from_bucket", "to_bucket")
            .agg(F.count("*").cast("long").alias("n")))


def median_test(df: DataFrame, value_col: str, *, group_col: str,
                cutpoint: float | None = None,
                round_to: int = 6) -> DataFrame:
    """Mood's median test: do the groups share a common median?
    Counts above/at-or-below a common cutpoint per group and reports
    the chi-square statistic over the 2×g table (df = g−1) — the
    rank-free, outlier-immune complement to `welch_ttest`. Output:
    one row ``(n_groups, n_rows, chi2, dof)`` plus the per-group
    cells via `median_cells`-style columns is deliberately NOT done —
    the statistic row is the verdict; drill into `stats_quantiles`
    for the shapes.

    ``cutpoint``: at 10^12 rows pass an explicit value (from the KLL
    sketch / stats_quantiles); when None the EXACT median is computed
    (``percentile(value, 0.5)`` — exact but memory-bound per the
    documented bounded-corpus contract, fine at test SF)."""
    base = df.where(F.col(value_col).isNotNull()
                    & F.col(group_col).isNotNull())
    if cutpoint is None:
        cutpoint = base.agg(
            F.expr(f"percentile({value_col}, 0.5)")).collect()[0][0]
    above = (F.col(value_col) > F.lit(float(cutpoint))).cast("long")
    cells = (base.groupBy(group_col)
             .agg(F.count("*").alias("n"), F.sum(above).alias("a")))
    # NOT 'N'/'A': Spark resolution is case-insensitive by default,
    # so upper-case totals would collide with the per-group cells
    tot = cells.agg(F.sum("n").alias("__tn"), F.sum("a").alias("__ta"))
    j = cells.crossJoin(F.broadcast(tot))
    # expected above per group = n·A/N; chi2 sums both cells
    ea = F.col("n") * F.col("__ta") / F.col("__tn")
    eb = (F.col("n") * (F.col("__tn") - F.col("__ta"))
          / F.col("__tn"))
    term = ((F.col("a") - ea) * (F.col("a") - ea) / ea
            + ((F.col("n") - F.col("a")) - eb)
            * ((F.col("n") - F.col("a")) - eb) / eb)
    return (j.agg(F.count("*").cast("long").alias("n_groups"),
                  F.sum("n").cast("long").alias("n_rows"),
                  F.round(F.sum(term), round_to).alias("chi2"))
            .withColumn("dof", (F.col("n_groups") - 1).cast("long")))


def shrunk_pass_rates(df: DataFrame, flag_col, *, by: str,
                      prior_strength: float = 100.0,
                      round_to: int = 6) -> DataFrame:
    """Empirical-Bayes shrunken pass rates per segment: raw rate
    k/n pulled toward the corpus mean μ with a fixed-strength prior —
    ``shrunk = (k + s·μ) / (n + s)`` — so a 3-row host with one
    failure doesn't outrank a 10^6-row host at 0.1% failure in the
    "worst hosts" report (the classic small-sample league-table
    fallacy). Output: ``(segment, n, k, rate_raw, rate_shrunk)``.

    All inputs to the formula are exact integer counts plus the
    one-row exact global ratio, so the output is bit-deterministic.
    One segment aggregation + one 1-row broadcast."""
    flag = (F.col(flag_col) if isinstance(flag_col, str)
            else flag_col).cast("long")
    cells = (df.where(F.col(by).isNotNull())
             .groupBy(by)
             .agg(F.count("*").alias("n"), F.sum(flag).alias("k")))
    tot = cells.agg((F.sum("k") / F.sum("n")).alias("__mu"))
    s = float(prior_strength)
    return (cells.crossJoin(F.broadcast(tot))
            .select(F.col(by),
                    F.col("n").cast("long").alias("n"),
                    F.col("k").cast("long").alias("k"),
                    F.round(F.col("k") / F.col("n"), round_to)
                    .alias("rate_raw"),
                    F.round((F.col("k") + F.lit(s) * F.col("__mu"))
                            / (F.col("n") + F.lit(s)), round_to)
                    .alias("rate_shrunk")))


def distribution_jsd(df: DataFrame, key_col: str, *, snap_col: str,
                     round_to: int = 6) -> DataFrame:
    """Jensen–Shannon divergence between the ``key_col`` distributions
    of the two snapshots in ``snap_col`` — the symmetric, bounded
    (≤ ln 2 nats) complement to the KL/PSI pair in `drift_metrics`:
    KL explodes on buckets one side lacks (hence its epsilon floor),
    while JSD handles them exactly (0·log0 = 0 against the mixture),
    so it is the right verdict when snapshots may gain/lose whole
    categories (new language, dropped source). Output one row:
    ``(n_buckets, n_base, n_curr, jsd_nats, jsd_bits)``.

    Fully distributed, unlike the driver-side `drift_metrics` math:
    one (key) hash aggregation with conditional counts per side, a
    1-row total broadcast, then a bucket-sized re-aggregation — so it
    also serves histogram keys with millions of buckets (urls, hosts)
    where collecting to the driver would not fly."""
    snaps = [r[0] for r in
             df.select(snap_col).distinct().orderBy(snap_col).collect()]
    if len(snaps) != 2:
        raise ValueError(f"distribution_jsd expects exactly 2 "
                         f"snapshots, got {snaps!r}")
    s0, s1 = snaps
    cells = (df.where(F.col(key_col).isNotNull())
             .groupBy(key_col)
             .agg(F.sum((F.col(snap_col) == s0).cast("long")).alias("__a"),
                  F.sum((F.col(snap_col) == s1).cast("long")).alias("__b")))
    tot = cells.agg(F.sum("__a").alias("__ta"), F.sum("__b").alias("__tb"))
    j = cells.crossJoin(F.broadcast(tot))
    p = F.col("__a") / F.col("__ta")
    q = F.col("__b") / F.col("__tb")
    m = (p + q) / 2
    # 0·log(0/m) = 0 by continuity: gate each side on its count
    term = (F.when(F.col("__a") > 0, p * F.log(p / m) / 2)
            .otherwise(F.lit(0.0))
            + F.when(F.col("__b") > 0, q * F.log(q / m) / 2)
            .otherwise(F.lit(0.0)))
    return (j.agg(F.count("*").cast("long").alias("n_buckets"),
                  F.sum("__a").cast("long").alias("n_base"),
                  F.sum("__b").cast("long").alias("n_curr"),
                  F.round(F.sum(term), round_to).alias("jsd_nats"),
                  F.round(F.sum(term) / math.log(2.0), round_to)
                  .alias("jsd_bits")))


def theil_decomposition(df: DataFrame, value_col: str, *, group_col: str,
                        round_to: int = 6) -> DataFrame:
    """Theil-T inequality index of a positive measure with its exact
    between/within-group decomposition — the property Gini
    (`source_len_gini`) lacks: ``T = T_between + Σ s_g·T_g`` splits
    corpus length/volume inequality into "sources differ from each
    other" vs "docs differ inside a source", which decides whether to
    rebalance the source mix or to filter within sources. Output one
    row: ``(n_rows, n_groups, theil_total, theil_between,
    theil_within, between_share)``.

    Everything derives from two power sums per group (Σx as exact
    long, Σ x·ln x as double) — one group aggregation, then
    group-cardinality-sized math; rows with value ≤ 0 are excluded
    (Theil is defined on positive measures)."""
    x = F.col(value_col).cast("double")
    cells = (df.where(F.col(value_col).isNotNull()
                      & (F.col(value_col) > 0)
                      & F.col(group_col).isNotNull())
             .groupBy(group_col)
             .agg(F.count("*").alias("__n"),
                  F.sum(F.col(value_col).cast("long")).alias("__s"),
                  F.sum(x * F.log(x)).alias("__sl")))
    tot = cells.agg(F.sum("__n").alias("__tn"), F.sum("__s").alias("__ts"),
                    F.sum("__sl").alias("__tsl"))
    j = cells.crossJoin(F.broadcast(tot))
    mu = F.col("__ts") / F.col("__tn")
    mu_g = F.col("__s") / F.col("__n")
    share = F.col("__s") / F.col("__ts")              # s_g: value share
    t_g = F.col("__sl") / F.col("__s") - F.log(mu_g)  # within-group Theil
    between_term = share * F.log(mu_g / mu)
    total = F.col("__tsl") / F.col("__ts") - F.log(mu)
    out = (j.agg(F.sum("__n").cast("long").alias("n_rows"),
                 F.count("*").cast("long").alias("n_groups"),
                 F.round(F.min(total), round_to).alias("theil_total"),
                 F.round(F.sum(between_term), round_to)
                 .alias("theil_between"),
                 F.round(F.sum(share * t_g), round_to)
                 .alias("theil_within")))
    return out.withColumn(
        "between_share",
        F.when(F.col("theil_total") > 0,
               F.round(F.col("theil_between") / F.col("theil_total"),
                       round_to)).otherwise(F.lit(0.0)))


def partition_advisor(df: DataFrame, *, bytes_col: str = "text",
                      overhead_bytes: int = 64, target_mb: int = 128,
                      round_to: int = 6) -> DataFrame:
    """Parquet layout advisor: from exact measured row bytes
    (``octet_length(bytes_col) + overhead_bytes`` for ids/metadata),
    recommend rows-per-output-partition and the partition count that
    hits ``target_mb`` per file — the number a `repartition(n)` before
    the violations/curated sink should use, instead of the
    shuffle-partition default that writes 10^12-row corpora as either
    10-GB stragglers or millions of 100-KB files. Output one row:
    ``(n_rows, avg_row_bytes, max_row_bytes, est_total_mb,
    rows_per_partition, n_partitions)``.

    One aggregation over exact long sums; the recommendation math is
    driver-free column arithmetic on the 1-row result."""
    rb = (F.octet_length(F.col(bytes_col).cast("string"))
          + F.lit(int(overhead_bytes))).cast("long")
    agg = (df.where(F.col(bytes_col).isNotNull())
           .agg(F.count("*").alias("__n"), F.sum(rb).alias("__b"),
                F.max(rb).alias("__m")))
    target_bytes = int(target_mb) * 1024 * 1024
    avg = F.col("__b") / F.col("__n")
    rpp = F.greatest(F.floor(F.lit(target_bytes) / avg), F.lit(1)) \
        .cast("long")
    return agg.select(
        F.col("__n").cast("long").alias("n_rows"),
        F.round(avg, round_to).alias("avg_row_bytes"),
        F.col("__m").cast("long").alias("max_row_bytes"),
        F.round(F.col("__b") / F.lit(1024.0 * 1024.0), round_to)
        .alias("est_total_mb"),
        rpp.alias("rows_per_partition"),
        F.ceil(F.col("__n") / rpp).cast("long").alias("n_partitions"))


def k_anonymity(df: DataFrame, quasi_cols: "Sequence[str]", *,
                k: int = 5, round_to: int = 6) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set: every row
    must share its quasi-identifier combination with ≥ k−1 others, or
    the "anonymous" corpus re-identifies people by joining on the
    quasi columns — the structural privacy check that complements the
    direct-identifier `pii_scan`/`pii_redact` pair (a row can be
    PII-clean and still unique on (lang, host, length, date)). Output
    one row: ``(n_rows, n_classes, min_class_size, n_small_classes,
    n_rows_at_risk, share_at_risk, k)``.

    One hash aggregation on the quasi tuple + a class-cardinality
    rollup; at-risk rows are counted, never materialized — suppress /
    generalize them with a join against the small-class keys if the
    audit fails."""
    if not quasi_cols:
        raise ValueError("k_anonymity: quasi_cols required")
    classes = (df.groupBy(*[F.col(c) for c in quasi_cols])
               .agg(F.count("*").alias("__n")))
    small = F.col("__n") < int(k)
    return classes.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.min("__n").cast("long").alias("min_class_size"),
        F.sum(small.cast("long")).cast("long").alias("n_small_classes"),
        F.sum(F.when(small, F.col("__n")).otherwise(F.lit(0)))
        .cast("long").alias("n_rows_at_risk"),
        F.round(F.sum(F.when(small, F.col("__n")).otherwise(F.lit(0)))
                / F.sum("__n"), round_to).alias("share_at_risk"),
        F.lit(int(k)).cast("long").alias("k"))


def survivorship_merge(df: DataFrame, key_col: str, *, ts_col: str,
                       value_cols: "Sequence[str]") -> DataFrame:
    """Golden-record survivorship merge: one row per entity carrying,
    for each value column, the LATEST NON-NULL observation (recency
    survivorship — the standard MDM rule) — what a recrawl pipeline
    runs to collapse months of partial refetches into the current
    best row without letting a null-field refetch erase data an older
    fetch had. Output: ``(key, n_versions, first_ts, last_ts,
    <value_cols...>)``.

    One hash aggregation on the entity key: each column is a
    ``max_by(col, ts WHERE col IS NOT NULL)`` (both Spark's max_by and
    DuckDB's arg_max skip NULL ordinals, which is what makes the rule
    expressible without a per-column window)."""
    if not value_cols:
        raise ValueError("survivorship_merge: value_cols required")
    aggs = [F.count("*").cast("long").alias("n_versions"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts")]
    for c in value_cols:
        aggs.append(F.max_by(
            F.col(c), F.when(F.col(c).isNotNull(), F.col(ts_col)))
            .alias(c))
    return (df.where(F.col(key_col).isNotNull()
                     & F.col(ts_col).isNotNull())
            .groupBy(key_col).agg(*aggs))


def kaplan_meier(df: DataFrame, *, entity_col: str, ts_col: str,
                 event_pred: Column, bucket_s: int = 3600,
                 round_to: int = 6) -> DataFrame:
    """Kaplan–Meier survival estimate of time-to-first-event per
    entity: duration runs from an entity's first observation to its
    first row satisfying ``event_pred``; entities that never convert
    are right-censored at the global observation end. Durations are
    bucketed to ``bucket_s`` seconds so the curve is a bounded frame.
    Output per event bucket: ``(t_bucket, n_risk, n_events,
    survival)`` with ``S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)``.

    Scale shape: one per-entity aggregation (uniform key), a global
    1-row max (the censoring horizon), a bucket-sized aggregation,
    then windows over the ≤ (horizon/bucket_s)-row curve — never over
    entities. The cumulative product runs as exp(Σ ln), windowed in
    deterministic bucket order."""
    ts = F.col(ts_col).cast("timestamp").cast("double")
    per = (df.where(F.col(entity_col).isNotNull())
           .groupBy(entity_col)
           .agg(F.min(ts).alias("__entry"),
                F.min(F.when(event_pred, ts)).alias("__event"),
                F.max(ts).alias("__last")))
    horizon = per.agg(F.max("__last").alias("__h"))
    j = per.crossJoin(F.broadcast(horizon))
    observed = F.col("__event").isNotNull()
    dur = F.when(observed, F.col("__event") - F.col("__entry")) \
        .otherwise(F.col("__h") - F.col("__entry"))
    b = F.floor(dur / F.lit(int(bucket_s))).cast("long")
    marks = (j.select(b.alias("t_bucket"),
                      observed.cast("long").alias("__d"))
             .groupBy("t_bucket")
             .agg(F.count("*").alias("__all"), F.sum("__d").alias("__d")))
    w = Window.orderBy("t_bucket") \
        .rowsBetween(Window.unboundedPreceding, -1)
    total = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    n_risk = (F.sum("__all").over(total)
              - F.coalesce(F.sum("__all").over(w), F.lit(0)))
    curve = marks.select("t_bucket", n_risk.alias("n_risk"),
                         F.col("__d").alias("n_events"))
    ws = Window.orderBy("t_bucket") \
        .rowsBetween(Window.unboundedPreceding, 0)
    # d == n_risk is the absorbing end of the curve (everyone still at
    # risk converts in that bucket): survival is exactly 0 there, and
    # ln(1 - d/n) would be ln 0 — Spark's log returns NULL (which sum
    # would silently SKIP, corrupting the product) and DuckDB raises.
    # Gate the log on d < n and carry the absorption as a windowed flag.
    partial = (F.col("n_events") > 0) & (F.col("n_events")
                                         < F.col("n_risk"))
    logs = F.sum(F.when(partial,
                        F.log(1.0 - F.col("n_events")
                              / F.col("n_risk")))
                 .otherwise(F.lit(0.0))).over(ws)
    absorbed = F.max((F.col("n_events") >= F.col("n_risk"))
                     .cast("int")).over(ws)
    survival = F.when(absorbed == 1, F.lit(0.0)) \
        .otherwise(F.round(F.exp(logs), round_to))
    return (curve.where(F.col("n_events") > 0)
            .select(F.col("t_bucket"),
                    F.col("n_risk").cast("long").alias("n_risk"),
                    F.col("n_events").cast("long").alias("n_events"),
                    survival.alias("survival")))


def logreg_newton_step(df: DataFrame, feature, label, *,
                       round_to: int = 6) -> DataFrame:
    """One exact Newton–Raphson step of logistic regression
    (intercept + one feature) from β = 0 — the distributed "learn a
    separating threshold" primitive behind calibrated quality gates:
    at β = 0 every p̂ is exactly ½, so the gradient is
    ``Σ (y−½)·[1,x]`` and the Hessian ``¼·Σ [1,x][1,x]ᵀ``, both plain
    power sums — ONE aggregation pass, a closed-form 2×2 solve, no
    iteration, no collect of anything but the 1-row result. Output:
    ``(n, beta0, beta1)`` with β = H⁻¹·g.

    Chain further steps by materializing p̂ and re-aggregating if full
    convergence is needed; the single step is already the
    direction+scale signal a monitoring gate wants, and it is
    reproducible (no SGD order-dependence)."""
    x = (F.col(feature) if isinstance(feature, str) else feature) \
        .cast("double")
    y = (F.col(label) if isinstance(label, str) else label) \
        .cast("double")
    agg = (df.where(x.isNotNull() & y.isNotNull())
           .agg(F.count("*").alias("__n"), F.sum(x).alias("__sx"),
                F.sum(x * x).alias("__sxx"), F.sum(y).alias("__sy"),
                F.sum(x * y).alias("__sxy")))
    g0 = F.col("__sy") - F.col("__n") / 2.0
    g1 = F.col("__sxy") - F.col("__sx") / 2.0
    # H = ¼·[[n,Sx],[Sx,Sxx]] → H⁻¹ = 4·M⁻¹, folded into det = det(M)/4
    det = (F.col("__n") * F.col("__sxx")
           - F.col("__sx") * F.col("__sx")) / 4.0
    beta0 = (F.col("__sxx") * g0 - F.col("__sx") * g1) / det
    beta1 = (F.col("__n") * g1 - F.col("__sx") * g0) / det
    return agg.select(F.col("__n").cast("long").alias("n"),
                      F.round(beta0, round_to).alias("beta0"),
                      F.round(beta1, round_to).alias("beta1"))


def clustering_skipping_estimate(df: DataFrame, *, order_col: str,
                                 cluster_col: str, value_lo, value_hi,
                                 file_rows: int = 1000,
                                 round_to: int = 6) -> DataFrame:
    """Data-skipping (Z-order/clustering) advisor: how many parquet
    files would a range predicate ``cluster_col BETWEEN lo AND hi``
    have to read if the table is written in ingestion order
    (``order_col``) vs re-clustered on ``cluster_col``? Files are
    simulated as consecutive ``file_rows``-row runs; a file is hit
    when its min/max stripe overlaps the range — exactly the min/max
    pruning parquet/Iceberg perform. Output two rows:
    ``(ordering ∈ {ingest, clustered}, n_files, files_hit,
    skip_ratio)``.

    The row_number simulation is a global sort — run this on a SAMPLE
    (it is an estimate by construction); at 10^12 rows the verdict
    from a 10^7-row hash sample is the same, and the real clustering
    decision this informs (``sortWithinPartitions`` / Iceberg
    ``write.sort-order``) never needs the full sort either."""
    out = []
    for name, key in (("ingest", [F.col(order_col)]),
                      ("clustered", [F.col(cluster_col),
                                     F.col(order_col)])):
        w = Window.orderBy(*key)
        fid = F.floor((F.row_number().over(w) - 1)
                      / F.lit(int(file_rows)))
        files = (df.where(F.col(cluster_col).isNotNull())
                 .select(fid.alias("__f"),
                         F.col(cluster_col).alias("__v"))
                 .groupBy("__f")
                 .agg(F.min("__v").alias("__lo"),
                      F.max("__v").alias("__hi")))
        hit = ((F.col("__hi") >= F.lit(value_lo))
               & (F.col("__lo") <= F.lit(value_hi))).cast("long")
        out.append(files.agg(
            F.lit(name).alias("ordering"),
            F.count("*").cast("long").alias("n_files"),
            F.sum(hit).cast("long").alias("files_hit"),
            F.round(1.0 - F.sum(hit) / F.count("*"), round_to)
            .alias("skip_ratio")))
    return out[0].unionByName(out[1])


def rule_cooccurrence(violations: DataFrame, *, id_col: str = "doc_id",
                      rule_col: str = "rule_id") -> DataFrame:
    """Which validation rules fire TOGETHER? Pairs of distinct rules
    co-firing on the same row, counted across the corpus — the
    drill-down that separates one root cause ("truncated fetches fail
    length AND lang AND url at once") from independent defects, read
    straight off the engine's violation rows. Output:
    ``(rule_a, rule_b, n_docs)`` with rule_a < rule_b.

    Self-equi-join on the row id: per-row violation lists are tiny
    (≤ rule count), so the pair blow-up is bounded by rules², never
    by the corpus."""
    v = (violations.where(F.col(id_col).isNotNull())
         .select(F.col(id_col).alias("__id"),
                 F.col(rule_col).alias("__r")).distinct())
    a = v.select("__id", F.col("__r").alias("rule_a"))
    b = v.select("__id", F.col("__r").alias("rule_b"))
    return (a.join(b, "__id")
            .where(F.col("rule_a") < F.col("rule_b"))
            .groupBy("rule_a", "rule_b")
            .agg(F.count("*").cast("long").alias("n_docs")))


# Poisson(1) inverse-CDF steps for the deterministic bootstrap:
# P(0)=.3679, cum .7358, .9197, .9810, else 4+
_POISSON1_CUM = (0.36787944117144233, 0.7357588823428847,
                 0.9196986029286058, 0.9810118431238462)


def poisson_bootstrap_ci(df: DataFrame, value_col: str, *,
                         id_col: str = "doc_id", n_resamples: int = 32,
                         alpha: float = 0.1,
                         round_to: int = 6) -> DataFrame:
    """Deterministic Poisson bootstrap CI for the mean of an integer
    measure: each (row, resample) draws a Poisson(1) weight from the
    md5 fraction of ``id:b`` (inverse-CDF steps, no RNG state), so the
    interval is bit-reproducible across runs, partitionings and
    engines — the missing uncertainty bar for every mean this engine
    reports. Output one row: ``(mean, ci_lo, ci_hi, n_resamples)``
    with the (α/2, 1−α/2) percentiles over the resample means.

    One pass over the corpus × B (explode of a B-literal array, no
    shuffle before the B-keyed aggregation); resample sums are EXACT
    longs (integer weights × integer values), so the means carry no
    float-accumulation order noise."""
    b = F.explode(F.array(*[F.lit(i) for i in range(int(n_resamples))]))
    base = (df.where(F.col(value_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).cast("string").alias("__id"),
                    F.col(value_col).cast("long").alias("__x"))
            .select("__id", "__x", b.alias("__b")))
    u = (F.conv(F.substring(
        F.md5(F.concat(F.col("__id"), F.lit(":"),
                       F.col("__b").cast("string"))), 1, 8), 16, 10)
        .cast("double") / F.lit(4294967296.0))
    w = (F.when(u < _POISSON1_CUM[0], 0)
         .when(u < _POISSON1_CUM[1], 1)
         .when(u < _POISSON1_CUM[2], 2)
         .when(u < _POISSON1_CUM[3], 3)
         .otherwise(4)).cast("long")
    means = (base.select("__b", w.alias("__w"), F.col("__x"))
             .groupBy("__b")
             .agg((F.sum(F.col("__w") * F.col("__x"))
                   / F.sum("__w")).alias("__m")))
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    direct = df.where(F.col(value_col).isNotNull()
                      & F.col(id_col).isNotNull()) \
        .agg(F.avg(F.col(value_col).cast("long")).alias("__mean"))
    ci = means.agg(
        F.expr(f"percentile(__m, {lo!r})").alias("__lo"),
        F.expr(f"percentile(__m, {hi!r})").alias("__hi"))
    return (direct.crossJoin(F.broadcast(ci))
            .select(F.round("__mean", round_to).alias("mean"),
                    F.round("__lo", round_to).alias("ci_lo"),
                    F.round("__hi", round_to).alias("ci_hi"),
                    F.lit(int(n_resamples)).cast("long")
                    .alias("n_resamples")))


def lateness_profile(df: DataFrame, *, entity_col: str, ts_col: str,
                     order_col: str, bucket_s: int = 3600,
                     round_to: int = 6) -> DataFrame:
    """Event-time lateness histogram — the number that sizes a
    Structured-Streaming watermark: per entity, each event's lateness
    is how far its event time sits behind the running maximum already
    seen (in arrival order ``order_col``); the histogram's tail says
    what ``withWatermark`` horizon keeps (say) 99.9% of events out of
    the late-drop path. Output: ``(lateness_bucket, n_events,
    share)`` in ``bucket_s`` units (bucket 0 = in-order).

    Windows are partitioned by the entity (uniform key), never a
    global order; the histogram is bucket-sized."""
    ts = F.col(ts_col).cast("timestamp").cast("double")
    w = (Window.partitionBy(entity_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    late = F.max(ts).over(w) - ts
    cells = (df.where(F.col(entity_col).isNotNull()
                      & F.col(ts_col).isNotNull())
             .select(F.floor(late / F.lit(int(bucket_s))).cast("long")
                     .alias("lateness_bucket"))
             .groupBy("lateness_bucket")
             .agg(F.count("*").alias("n_events")))
    tot = cells.agg(F.sum("n_events").alias("__t"))
    return (cells.crossJoin(F.broadcast(tot))
            .select("lateness_bucket",
                    F.col("n_events").cast("long").alias("n_events"),
                    F.round(F.col("n_events") / F.col("__t"), round_to)
                    .alias("share")))


def mergeable_stats_check(df: DataFrame, value_col: str, *,
                          split_pred: Column) -> DataFrame:
    """Algebraic-merge property check for the resumable runner's
    partial aggregates: compute (n, sum, min, max, sumsq) on the two
    halves ``split_pred`` induces, merge the partials the way a
    checkpoint-resume merges per-partition manifests, and compare
    against the direct whole-corpus aggregation — all in exact integer
    arithmetic, so ``all_equal`` is a hard invariant, not a tolerance.
    Output one row: the merged and direct values plus ``all_equal``.

    Two aggregations over one scan (the halves) + one direct pass; at
    10^12 rows the point is the ALGEBRA (any partition of the corpus
    merges to the same answer), which is what makes checkpoint/resume
    and map-side combine sound."""
    v = F.col(value_col).cast("long")
    def stats(frame):
        return frame.agg(F.count(v).alias("n"), F.sum(v).alias("s"),
                         F.min(v).alias("mn"), F.max(v).alias("mx"),
                         F.sum(v * v).alias("ss"))
    a = stats(df.where(split_pred)).select(
        *[F.col(c).alias(f"a_{c}") for c in ["n", "s", "mn", "mx", "ss"]])
    bwhere = df.where(~split_pred | split_pred.isNull())
    b = stats(bwhere).select(
        *[F.col(c).alias(f"b_{c}") for c in ["n", "s", "mn", "mx", "ss"]])
    direct = stats(df).select(
        *[F.col(c).alias(f"d_{c}") for c in ["n", "s", "mn", "mx", "ss"]])
    j = a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(direct))
    m_n = F.col("a_n") + F.col("b_n")
    m_s = F.coalesce(F.col("a_s"), F.lit(0)) + \
        F.coalesce(F.col("b_s"), F.lit(0))
    m_mn = F.least("a_mn", "b_mn")
    m_mx = F.greatest("a_mx", "b_mx")
    m_ss = F.coalesce(F.col("a_ss"), F.lit(0)) + \
        F.coalesce(F.col("b_ss"), F.lit(0))
    eq = ((m_n == F.col("d_n")) & (m_s == F.col("d_s"))
          & m_mn.eqNullSafe(F.col("d_mn"))
          & m_mx.eqNullSafe(F.col("d_mx"))
          & (m_ss == F.col("d_ss")))
    return j.select(
        m_n.cast("long").alias("n_merged"),
        F.col("d_n").cast("long").alias("n_direct"),
        m_s.cast("long").alias("sum_merged"),
        F.col("d_s").cast("long").alias("sum_direct"),
        m_mn.cast("long").alias("min_merged"),
        m_mx.cast("long").alias("max_merged"),
        m_ss.cast("long").alias("sumsq_merged"),
        eq.alias("all_equal"))


def l_diversity_audit(df: DataFrame, *, qi_cols: Sequence[str],
                      sensitive_col: str, l: int = 2,
                      round_to: int = 6) -> DataFrame:
    """l-diversity audit over quasi-identifier groups (Machanavajjhala
    et al. 2007) — the release-gate that k-anonymity
    (:func:`k_anonymity_audit` twin in the roster) misses: a group can
    be large (k-anonymous) yet carry ONE sensitive value, so membership
    still discloses it. Per QI group this reports group size ``n``,
    ``l_distinct`` (distinct sensitive values) and the entropy of the
    sensitive distribution in nats; ``ok`` requires BOTH distinct
    l-diversity (``l_distinct ≥ l``) and entropy l-diversity
    (``entropy ≥ ln(l)``), the standard pair of instantiations.

    Shape at 10^12 rows: two hash aggregations — (qi, sensitive) cell
    counts with map-side combine, then the qi rollup computing entropy
    from the cell counts. Nothing wider than the QI×sensitive
    cross-cardinality shuffles; no window, no join.
    """
    if int(l) < 1:
        raise ValueError("l must be ≥ 1")
    qi = [F.col(c) for c in qi_cols]
    cells = (df.groupBy(*qi, F.col(sensitive_col).alias("__s"))
             .agg(F.count("*").alias("__c")))
    n = F.sum("__c")
    ent = -F.sum(F.col("__c") * F.log(F.col("__c")))  # partial form
    out = (cells.groupBy(*[c.alias(name) for c, name
                           in zip(qi, qi_cols)])
           .agg(n.cast("long").alias("n"),
                F.count("*").cast("long").alias("l_distinct"),
                # H = ln(n) - (Σ c·ln c)/n, exact algebra of -Σ p ln p
                F.round(F.log(n) + ent / n, round_to).alias("entropy")))
    return out.withColumn(
        "ok", (F.col("l_distinct") >= int(l))
              & (F.col("entropy") >= F.round(F.lit(math.log(l)),
                                             round_to)))


def exact_discrete_quantiles(df: DataFrame, col: str,
                             qs: Sequence[float] = (0.25, 0.5, 0.75,
                                                    0.9, 0.99)) -> DataFrame:
    """EXACT quantiles of a discrete/integer column at unbounded scale
    — the scale-correct alternative to both a global sort (one
    executor owns the tail) and approx_percentile (a sketch, not a
    number you can gate on): aggregate to (value, count) — vocabulary-
    sized, the only corpus-wide stage — then take the cumulative sum
    over the SORTED VALUE TABLE and pick, per q, the smallest value
    whose cumulative count reaches ``ceil(q·n)`` (the classic "lower"
    / type-1 quantile, exact and engine-agnostic — no interpolation,
    so no float drift between engines).

    Output: ``(q, value, cum_count, n_rows)`` per requested quantile.

    Shape at 10^12 rows: one hash aggregation with map-side combine
    (value domain ≪ corpus for lengths/counts/buckets — the operator's
    documented applicability bound), then windows over the value
    TABLE. The window is a single-partition sort of the value
    vocabulary, not the corpus — for a 10^6-value domain that is one
    task sorting 10^6 rows, deliberate and bounded."""
    counts = (df.where(F.col(col).isNotNull())
              .groupBy(F.col(col).alias("value"))
              .agg(F.count("*").alias("__c")))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = (counts.withColumn("cum_count", F.sum("__c").over(w))
           .withColumn("n_rows",
                       F.sum("__c").over(
                           Window.partitionBy())))  # 1-value window
    cum = cum.persist()
    outs = []
    for q in qs:
        picked = (cum.where(
            F.col("cum_count") >= F.ceil(F.lit(float(q))
                                         * F.col("n_rows")))
            .orderBy("value").limit(1)
            .select(F.lit(float(q)).alias("q"),
                    F.col("value"),
                    F.col("cum_count").cast("long").alias("cum_count"),
                    F.col("n_rows").cast("long").alias("n_rows")))
        outs.append(picked)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    out._zoi_persisted = [cum]
    return out


def verdict_transitions(old: DataFrame, new: DataFrame, *,
                        key_col: str = "partition_id",
                        status_col: str = "status") -> DataFrame:
    """Cross-run verdict drift over two partition manifests
    (runner.ValidationRunner output): which partitions flipped
    pass→fail (regressions — the rows an on-call reads first),
    fail→pass (fixes), appeared, or disappeared. Output one row per
    ``(old_status, new_status)`` cell with the count and up to 5
    sample keys; absent sides read as status 'absent'.

    One full-outer equi-join on the partition key (manifest-sized,
    ≪ corpus) + one cell aggregation."""
    o = old.select(F.col(key_col).alias("__k"),
                   F.col(status_col).alias("old_status"))
    n = new.select(F.col(key_col).alias("__k"),
                   F.col(status_col).alias("new_status"))
    j = (o.join(n, "__k", "full_outer")
         .select("__k",
                 F.coalesce("old_status", F.lit("absent"))
                 .alias("old_status"),
                 F.coalesce("new_status", F.lit("absent"))
                 .alias("new_status")))
    return (j.groupBy("old_status", "new_status")
            .agg(F.count("*").cast("long").alias("n"),
                 F.slice(F.array_sort(F.collect_list("__k")), 1, 5)
                 .alias("sample_keys")))


def ndcg_at_k(df: DataFrame, *, score_col: str, rel_col: str,
              id_col: str, k: int = 10, round_to: int = 6) -> DataFrame:
    """Ranking-quality evaluation: NDCG@k of a scored ranking against
    graded relevance labels — THE retrieval-eval metric (Järvelin &
    Kekäläinen 2002), here for grading BM25/ANN/fusion rankings
    against an oracle labelling. Ranking order is (round-6 score desc,
    id asc) so the cut is bit-deterministic across engines; DCG uses
    the classic ``rel / log2(rank+1)`` form (not the 2^rel variant —
    documented choice, exact for the small integer grades synthetic
    labels carry). One verdict row: ``(k, dcg, idcg, ndcg)``;
    idcg ranks by (relevance desc, id asc). ndcg = 0 when idcg = 0
    (no relevant documents).

    Shape: two top-k windows over the scored frame — at corpus scale
    feed it the candidate pool (the top-k of retrieval output), not
    the raw corpus; the metric is rank-k-bounded by construction."""
    s = F.round(F.col(score_col), round_to)
    ranked = (df.select(F.col(id_col), s.alias("__s"),
                        F.col(rel_col).cast("double").alias("__r"))
              .withColumn("__rank", F.row_number().over(
                  Window.orderBy(F.col("__s").desc(),
                                 F.col(id_col).asc())))
              .withColumn("__irank", F.row_number().over(
                  Window.orderBy(F.col("__r").desc(),
                                 F.col(id_col).asc()))))
    dcg = (ranked.where(F.col("__rank") <= int(k))
           .agg(F.sum(F.col("__r")
                      / F.log2(F.col("__rank") + 1)).alias("dcg")))
    idcg = (ranked.where(F.col("__irank") <= int(k))
            .agg(F.sum(F.col("__r")
                       / F.log2(F.col("__irank") + 1)).alias("idcg")))
    return (dcg.crossJoin(F.broadcast(idcg))  # two 1-row frames
            .select(F.lit(int(k)).alias("k"),
                    F.round("dcg", round_to).alias("dcg"),
                    F.round("idcg", round_to).alias("idcg"),
                    F.when(F.col("idcg") > 0,
                           F.round(F.col("dcg") / F.col("idcg"),
                                   round_to))
                    .otherwise(F.lit(0.0)).alias("ndcg")))


def join_strategy_advisor(left: DataFrame, right: DataFrame, *,
                          key_col: str,
                          left_row_bytes: float, right_row_bytes: float,
                          broadcast_threshold_mb: float = 10.0,
                          target_partition_mb: float = 128.0,
                          skew_share: float = 0.2,
                          round_to: int = 6) -> DataFrame:
    """Join-strategy advisor — the planning calc an engineer runs
    before a 10^12-row join, as one verdict row: row counts per side,
    estimated bytes (rows × caller-supplied avg row bytes — table
    stats a catalog carries; content-derived sizing would itself cost
    a pass), the recommended strategy (``broadcast`` when the smaller
    side fits the broadcast threshold, else ``sort_merge``), the
    shuffle partition count sizing each partition at
    ``target_partition_mb``, and the hot-key share of the LARGER side
    with the salting verdict (share above ``skew_share`` → salt; the
    companion sizing is tablechecks.suggest_salt).

    Shape: one count per side + one key-distribution aggregation on
    the larger side (map-side combine; output = key vocabulary) —
    the advisor costs one cheap pass, the join it plans costs many."""
    ln = left.count()
    rn = right.count()
    big = left if ln >= rn else right
    lb = ln * float(left_row_bytes)
    rb = rn * float(right_row_bytes)
    small_bytes = min(lb, rb)
    strategy = ("broadcast"
                if small_bytes <= broadcast_threshold_mb * 1024 * 1024
                else "sort_merge")
    parts = max(1, int(-(-(lb + rb) //
                         (target_partition_mb * 1024 * 1024))))
    top = (big.groupBy(key_col).agg(F.count("*").alias("__c"))
           .orderBy(F.desc("__c"), F.asc(key_col)).limit(1)
           .select(F.col(key_col).cast("string").alias("top_key"),
                   F.col("__c").alias("__tc")))
    big_n = max(ln, rn)
    return top.select(
        F.lit(ln).cast("long").alias("left_rows"),
        F.lit(rn).cast("long").alias("right_rows"),
        F.round(F.lit(lb), round_to).alias("left_bytes_est"),
        F.round(F.lit(rb), round_to).alias("right_bytes_est"),
        F.lit(strategy).alias("strategy"),
        F.lit(parts).cast("long").alias("shuffle_partitions"),
        F.col("top_key"),
        F.round(F.col("__tc") / F.lit(big_n), round_to)
        .alias("top_key_share"),
        (F.col("__tc") / F.lit(big_n) > F.lit(float(skew_share)))
        .alias("salt_recommended"))


_EXPECTATION_KINDS = ("row_count", "mean", "sum", "min", "max", "stddev",
                      "null_share", "distinct", "distinct_approx",
                      "match_share")


def expectation_suite(df: DataFrame,
                      expectations: "Sequence[dict]", *,
                      by: str | None = None) -> DataFrame:
    """Declarative aggregate-expectation battery (the Deequ
    VerificationSuite / Great Expectations pattern, re-expressed as ONE
    fused Spark aggregation): each expectation is a dict
    ``{name, kind, column?, lo?, hi?, pattern?}`` with kind one of

    - ``row_count`` — total rows (no column)
    - ``mean`` / ``sum`` / ``min`` / ``max`` / ``stddev`` — numeric
      aggregate of ``column`` (cast to double; ``stddev`` is the sample
      standard deviation, matching SQL ``stddev_samp``)
    - ``null_share`` — fraction of NULL values in ``column``
    - ``distinct`` — exact COUNT DISTINCT (verification runs; one
      expand at scale) / ``distinct_approx`` — the HyperLogLog sketch
      (the 10^12-row shape: bounded memory, map-side combinable)
    - ``match_share`` — fraction of NON-NULL ``column`` values matching
      regex ``pattern``

    and passes iff ``lo <= observed <= hi`` (missing bound =
    unbounded; NULL observed — e.g. mean of an all-NULL column — fails
    loudly rather than vacuously passing). Returns one verdict row per
    expectation: ``(expectation, kind, column, observed, lo, hi,
    passed)``.

    Scale shape: the whole battery compiles into a single ``df.agg``
    — one scan, one partial aggregate per partition (map-side
    combine), one tiny final reduce, then a constant-size explode of
    the 1-row result into verdict rows. Adding an expectation adds an
    aggregate expression, never a job. Mirrors the fused-stats design
    of :func:`column_stats` (north_star: "a single aggregation pass
    per partition").

    ``by``: evaluate the whole battery PER GROUP (source, host bucket,
    date partition …) — the north rule's per-partition pass/fail
    verdict, still one aggregation (grouped instead of global, same
    map-side combine); output gains the ``by`` column and has
    ``n_groups × n_expectations`` rows.
    """
    if not expectations:
        raise ValueError("expectation_suite: no expectations given")
    aggs = []
    for i, e in enumerate(expectations):
        kind = e["kind"]
        col = e.get("column")
        if kind not in _EXPECTATION_KINDS:
            raise ValueError(f"expectation_suite: unknown kind {kind!r} "
                             f"(one of {_EXPECTATION_KINDS})")
        if kind != "row_count" and not col:
            raise ValueError(f"expectation_suite: kind {kind!r} needs "
                             f"a column ({e.get('name')!r})")
        if kind == "row_count":
            obs = F.count(F.lit(1)).cast("double")
        elif kind == "mean":
            obs = F.avg(F.col(col).cast("double"))
        elif kind == "sum":
            obs = F.sum(F.col(col).cast("double"))
        elif kind == "min":
            obs = F.min(F.col(col).cast("double"))
        elif kind == "max":
            obs = F.max(F.col(col).cast("double"))
        elif kind == "stddev":
            obs = F.stddev_samp(F.col(col).cast("double"))
        elif kind == "null_share":
            obs = F.avg(F.col(col).isNull().cast("double"))
        elif kind == "distinct":
            obs = F.count_distinct(F.col(col)).cast("double")
        elif kind == "distinct_approx":
            obs = F.approx_count_distinct(col).cast("double")
        else:  # match_share
            obs = F.avg(F.col(col).rlike(e["pattern"]).cast("double"))
        aggs.append(obs.alias(f"__e{i}"))
    one = df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)
    structs = []
    for i, e in enumerate(expectations):
        obs = F.col(f"__e{i}")
        lo, hi = e.get("lo"), e.get("hi")
        ok = F.lit(True)
        if lo is not None:
            ok = ok & (obs >= float(lo))
        if hi is not None:
            ok = ok & (obs <= float(hi))
        structs.append(F.struct(
            F.lit(e["name"]).alias("expectation"),
            F.lit(e["kind"]).alias("kind"),
            (F.lit(e.get("column")) if e.get("column") is not None
             else F.lit(None).cast("string")).alias("column"),
            F.round(obs, 6).alias("observed"),
            (F.lit(float(lo)) if lo is not None
             else F.lit(None).cast("double")).alias("lo"),
            (F.lit(float(hi)) if hi is not None
             else F.lit(None).cast("double")).alias("hi"),
            F.coalesce(ok, F.lit(False)).alias("passed")))
    head = [F.col(by)] if by else []
    return (one.select(*head, F.explode(F.array(*structs)).alias("e"))
            .select(*head, "e.*"))


def snapshot_diff(old: DataFrame, new: DataFrame, *, key_col: str,
                  compare_cols: "Sequence[str]",
                  include_unchanged: bool = False) -> DataFrame:
    """Keyed symmetric diff between two table snapshots — the
    change-data audit behind incremental validation: per key, status
    ``added`` (key only in ``new``), ``removed`` (only in ``old``) or
    ``changed`` (in both, any ``compare_cols`` value differs; NULLs
    compare as equal via the null-safe hash). Returns ``(key,
    status)``; ``include_unchanged=True`` adds the (corpus-sized)
    ``unchanged`` class for verification runs.

    Scale shape: each side is projected to (key, xxhash64 of the
    compared columns) BEFORE the join — the shuffle carries 16 bytes
    per row, not the payload — then one full-outer hash join on key.
    A 64-bit content-hash collision (p ≈ n²/2⁶⁵) can misclassify a
    changed row as unchanged; verification runs can pass the raw
    columns as their own twin. Downstream consumers filter on status,
    which pushes through the join."""
    oh = old.select(F.col(key_col).alias("key"),
                    F.xxhash64(*[F.col(c) for c in compare_cols])
                    .alias("__ho"))
    nh = new.select(F.col(key_col).alias("key"),
                    F.xxhash64(*[F.col(c) for c in compare_cols])
                    .alias("__hn"))
    j = oh.join(nh, "key", "full_outer")
    status = (F.when(F.col("__ho").isNull(), F.lit("added"))
              .when(F.col("__hn").isNull(), F.lit("removed"))
              .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    out = j.select("key", status.alias("status"))
    if not include_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def conditional_violations(df: DataFrame,
                           rules: "Sequence[tuple]", *,
                           id_col: str = "doc_id") -> DataFrame:
    """Cross-column conditional rules — the dependent-requirement
    family JSON Schema spells ``if/then`` and Zoi users write as
    fields-level ``refine`` (reference lib/zoi.ex refine/2 over a map):
    each rule is ``(rule_id, when, then)`` where ``when``/``then`` are
    Column predicates or SQL expression strings; a row VIOLATES when
    ``when`` holds (NULL → not applicable) and ``then`` does not
    (NULL → violation — same coalesce(false) gate as the compiled
    refinements, compile.py). Emits ``(id, rule_id)`` violation rows.

    Scale shape: all rules evaluate in one Project over one scan (the
    flagship's concat-arrays + explode, zero Python, zero shuffle);
    the explode emits only violations, so output is violation-bounded,
    not rules×rows."""
    if not rules:
        raise ValueError("conditional_violations: no rules given")
    arrs = []
    for rid, when, then in rules:
        w = F.expr(when) if isinstance(when, str) else when
        t = F.expr(then) if isinstance(then, str) else then
        hit = F.coalesce(w, F.lit(False)) & ~F.coalesce(t, F.lit(False))
        arrs.append(F.when(hit, F.array(F.lit(rid)))
                    .otherwise(F.array().cast("array<string>")))
    arr = F.concat(*arrs) if len(arrs) > 1 else arrs[0]
    return df.select(F.col(id_col),
                     F.explode(arr).alias("rule_id"))


def sprt_monitor(df: DataFrame, flag_col, *, by: str,
                 p0: float, p1: float, alpha: float = 0.05,
                 beta: float = 0.05) -> DataFrame:
    """Wald's sequential probability ratio test over per-group failure
    flags — the monitoring verdict behind "stop shipping this host's
    data NOW vs keep watching": H0 failure rate ≤ ``p0`` (healthy) vs
    H1 ≥ ``p1`` (degraded), error targets ``alpha`` (false alert) and
    ``beta`` (missed alert). Per group with n trials / k failures the
    log-likelihood ratio is ``k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0))``;
    decision = ``alert`` above ``ln((1−β)/α)``, ``ok`` below
    ``ln(β/(1−α))``, else ``continue`` (not enough evidence yet — the
    whole point of SPRT: it needs ~half the samples of a fixed-n test
    at the same error rates, so small partitions get verdicts sooner).
    Returns ``(by, n, k, llr, decision)``.

    ``flag_col`` may be a name or boolean Column (TRUE/1 = failure;
    NULL rows are excluded — they carry no evidence).

    Scale shape: one group-keyed count aggregation (map-side combine),
    constants folded driver-side — identical cost to the pass-rate
    rollups."""
    if not (0.0 < p0 < p1 < 1.0):
        raise ValueError(f"need 0 < p0 < p1 < 1, got p0={p0}, p1={p1}")
    if not (0.0 < alpha < 1.0 and 0.0 < beta < 1.0):
        raise ValueError(f"alpha/beta must be in (0,1), got "
                         f"{alpha}/{beta}")
    flag = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    flag = flag.cast("int")
    lr_fail = math.log(p1 / p0)
    lr_pass = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    g = (df.where(flag.isNotNull())
         .groupBy(by)
         .agg(F.count("*").cast("long").alias("n"),
              F.sum(flag).cast("long").alias("k")))
    llr = (F.col("k") * F.lit(lr_fail)
           + (F.col("n") - F.col("k")) * F.lit(lr_pass))
    return g.select(
        by, "n", "k", F.round(llr, 6).alias("llr"),
        F.when(llr >= upper, F.lit("alert"))
        .when(llr <= lower, F.lit("ok"))
        .otherwise(F.lit("continue")).alias("decision"))


def multi_column_psi(current: DataFrame, baseline: DataFrame,
                     columns: "Sequence[str]", *,
                     epsilon: float = 1e-9) -> DataFrame:
    """Population-stability index for MANY categorical columns in one
    distributed pass per side — the "which column drifted most"
    triage that per-column drift checks (:func:`drift_metrics`,
    :func:`distribution_jsd`) answer one column at a time: each side
    is unpivoted to (column, value) via one explode, counted per
    (column, value) with map-side combine, outer-joined on the shared
    vocabulary, and reduced to one PSI row per column —
    ``(column, n_values, psi)``, same ``max(share, ε)`` smoothing as
    :func:`drift_metrics` so the two agree to the float on shared
    inputs. NULL values count as the literal bucket ``∅`` (a
    null-share shift IS drift).

    Scale shape: 2 explodes (×len(columns) rows, value-width bounded),
    2 (column,value)-keyed aggs, one join on the vocabulary (tiny),
    one column-keyed reduce. Nothing corpus-quadratic; skew is bounded
    by the hottest (column, value) pair, the same envelope as any
    categorical histogram here."""
    if not columns:
        raise ValueError("multi_column_psi: no columns given")

    def unpivot(df: DataFrame) -> DataFrame:
        pairs = F.array(*[
            F.struct(F.lit(c).alias("column"),
                     F.coalesce(F.col(c).cast("string"),
                                F.lit("∅")).alias("value"))
            for c in columns])
        return (df.select(F.explode(pairs).alias("p"))
                .select("p.column", "p.value")
                .groupBy("column", "value")
                .agg(F.count("*").cast("double").alias("cnt")))

    cur = unpivot(current).withColumnsRenamed({"cnt": "c_cur"})
    base = unpivot(baseline).withColumnsRenamed({"cnt": "c_base"})
    tot_c = Window.partitionBy("column")
    j = (cur.join(base, ["column", "value"], "full_outer")
         .select("column", "value",
                 F.coalesce("c_cur", F.lit(0.0)).alias("c_cur"),
                 F.coalesce("c_base", F.lit(0.0)).alias("c_base")))
    q = F.greatest(F.col("c_cur") / F.greatest(F.sum("c_cur").over(tot_c),
                                               F.lit(1.0)),
                   F.lit(float(epsilon)))
    p = F.greatest(F.col("c_base") / F.greatest(F.sum("c_base").over(tot_c),
                                                F.lit(1.0)),
                   F.lit(float(epsilon)))
    term = (q - p) * F.log(q / p)
    return (j.select("column", term.alias("__t"))
            .groupBy("column")
            .agg(F.count("*").cast("long").alias("n_values"),
                 F.round(F.sum("__t"), 6).alias("psi")))


def woe_iv(df: DataFrame, *, bucket_col: str, flag_col,
           epsilon: float = 0.5) -> DataFrame:
    """Weight-of-evidence / information value per bucket — the classic
    scorecard screen for "does this bucketed feature separate good
    docs from bad": per bucket, WoE = ln(share-of-positives /
    share-of-negatives) with add-``epsilon`` (Laplace) smoothing on
    the counts, and the IV contribution (dist_pos − dist_neg) · WoE;
    Σ iv_term is the feature's information value (rule of thumb:
    <0.02 useless, >0.3 strong). Returns ``(bucket, n_pos, n_neg,
    woe, iv_term)``.

    ``flag_col``: name or boolean/0-1 Column; NULL flags are excluded.

    Scale shape: one bucket-keyed aggregation (map-side combine) plus
    a broadcast of the two global totals — a 1-row cross join, not a
    shuffle."""
    flag = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    flag = flag.cast("int")
    g = (df.where(flag.isNotNull())
         .groupBy(F.col(bucket_col).alias("bucket"))
         .agg(F.sum(flag).cast("double").alias("__pos"),
              F.sum(1 - flag).cast("double").alias("__neg")))
    tot = g.agg(F.sum("__pos").alias("__tp"),
                F.sum("__neg").alias("__tn"),
                F.count("*").alias("__nb"))
    eps = float(epsilon)
    j = g.crossJoin(F.broadcast(tot))
    dp = (F.col("__pos") + eps) / (F.col("__tp") + eps * F.col("__nb"))
    dn = (F.col("__neg") + eps) / (F.col("__tn") + eps * F.col("__nb"))
    woe = F.log(dp / dn)
    return j.select(
        "bucket",
        F.col("__pos").cast("long").alias("n_pos"),
        F.col("__neg").cast("long").alias("n_neg"),
        F.round(woe, 6).alias("woe"),
        F.round((dp - dn) * woe, 6).alias("iv_term"))


def zorder_key(df: DataFrame, columns: "Sequence[str]", *,
               bits: int = 16,
               stats: "dict[str, tuple[float, float]] | None" = None,
               key_col: str = "zorder_key") -> DataFrame:
    """Z-order (Morton) clustering key — the layout step behind
    Delta/Iceberg ``OPTIMIZE ZORDER BY``: each column is min-max
    normalized to a ``bits``-bit integer and the bits are interleaved,
    so a range-sort on the key co-locates rows that are close in EVERY
    dimension; data-skipping on any single column then prunes ~the
    fraction :func:`clustering_skipping_estimate` measures. Returns
    the frame plus ``key_col``; follow with
    ``repartitionByRange(key_col)`` + write.

    ``stats``: per-column (min, max). When omitted, ONE tiny min/max
    aggregate is collected driver-side (the documented small
    aggregate; pass precomputed stats to keep the plan action-free at
    10^12 rows). NULLs and constant columns normalize to 0 — they
    cannot be ordered, only grouped.

    Scale shape: the key is a pure Column expression
    (``bits × n_cols`` shift-and-or terms inside whole-stage codegen)
    — the expensive part is the range sort the CALLER chooses, exactly
    as with any clustering rewrite. ``bits × n_cols`` must fit a
    signed 64-bit key (≤ 62)."""
    if not columns:
        raise ValueError("zorder_key: no columns given")
    if bits < 1 or bits * len(columns) > 62:
        raise ValueError(f"bits*n_cols must be in [1, 62], got "
                         f"{bits}*{len(columns)}")
    if stats is None:
        row = df.agg(*[F.min(F.col(c).cast("double")).alias(f"mn_{c}")
                       for c in columns],
                     *[F.max(F.col(c).cast("double")).alias(f"mx_{c}")
                       for c in columns]).collect()[0]
        stats = {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in columns}
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for ci, c in enumerate(columns):
        mn, mx = stats[c]
        if mn is None or mx is None or mx <= mn:
            continue  # all-NULL or constant: contributes 0
        scaled = F.floor((F.col(c).cast("double") - float(mn))
                         / (float(mx) - float(mn)) * (top + 1))
        v = F.least(F.greatest(F.coalesce(scaled, F.lit(0)),
                               F.lit(0)), F.lit(top)).cast("long")
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)),
                b * len(columns) + ci)
    return df.withColumn(key_col, key)


def fk_sweep(edges: "Sequence[tuple]") -> DataFrame:
    """Referential-integrity sweep over a whole FK graph in one
    report: each edge is ``(name, child_df, child_col, parent_df,
    parent_col)``; per edge the row count with a non-NULL key, the
    orphan count (keys with no parent — SQL FK semantics: NULL keys
    are not violations) and the verdict. Returns ``(edge, n_rows,
    n_orphans, ok)``.

    Scale shape: per edge one anti-join on the key (AQE picks
    broadcast when the parent's distinct-key projection is small —
    dimension tables — and shuffled-hash otherwise) + one count; the
    edges are independent jobs, so a contract runner can parallelize
    or short-circuit them."""
    if not edges:
        raise ValueError("fk_sweep: no edges given")
    parts = []
    for name, child, child_col, parent, parent_col in edges:
        keyed = child.where(F.col(child_col).isNotNull())
        orphans = keyed.join(
            parent.select(F.col(parent_col).alias("__pk")).distinct(),
            on=keyed[child_col] == F.col("__pk"), how="left_anti")
        n = keyed.agg(F.count("*").cast("long").alias("n")) \
            .crossJoin(orphans.agg(F.count("*").cast("long")
                                   .alias("n_orphans")))
        parts.append(n.select(
            F.lit(name).alias("edge"), F.col("n").alias("n_rows"),
            "n_orphans", (F.col("n_orphans") == 0).alias("ok")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rolling_psi(df: DataFrame, *, ts_col: str, key_col: str,
                epsilon: float = 1e-9) -> DataFrame:
    """Day-over-day distribution stability of a categorical column —
    the streaming-adjacent drift monitor: per day, the PSI of
    ``key_col``'s share vector against the PREVIOUS day (same
    ``max(share, ε)`` smoothing as :func:`drift_metrics`). A spike
    says the event/type mix changed that day — the first question on
    any ingest-volume anomaly. Returns ``(day, n_keys, psi)``; the
    first day has no predecessor and is omitted.

    Scale shape: one (day, key)-keyed count (map-side combine —
    day×key is tiny), a zero-filled day×key grid built from two
    sub-aggregates (broadcast cross join of two small sides), window
    shares per day and a lag per key — everything after the first
    aggregation is vocabulary-sized."""
    day = F.to_date(F.col(ts_col)).alias("day")
    counts = (df.where(F.col(ts_col).isNotNull())
              .groupBy(day, F.coalesce(F.col(key_col).cast("string"),
                                       F.lit("∅")).alias("key"))
              .agg(F.count("*").cast("double").alias("cnt")))
    days = counts.select("day").distinct()
    keys = counts.select("key").distinct()
    grid = days.crossJoin(F.broadcast(keys))
    filled = (grid.join(counts, ["day", "key"], "left")
              .select("day", "key",
                      F.coalesce("cnt", F.lit(0.0)).alias("cnt")))
    tot = Window.partitionBy("day")
    share = F.greatest(F.col("cnt") / F.greatest(F.sum("cnt").over(tot),
                                                 F.lit(1.0)),
                       F.lit(float(epsilon)))
    lagged = Window.partitionBy("key").orderBy("day")
    w = (filled.withColumn("__q", share)
         .withColumn("__p", F.lag("__q").over(lagged)))
    term = (F.col("__q") - F.col("__p")) * F.log(F.col("__q")
                                                 / F.col("__p"))
    return (w.where(F.col("__p").isNotNull())
            .groupBy("day")
            .agg(F.count("*").cast("long").alias("n_keys"),
                 F.round(F.sum(term), 6).alias("psi")))


def null_patterns(df: DataFrame, columns: Sequence[str], *,
                  by: str | None = None) -> DataFrame:
    """Row-level missingness-pattern census — the complement of
    :func:`completeness_matrix` (which is column-level): each row is
    reduced to the COMBINATION of columns it is missing ('101' =
    missing 1st and 3rd of ``columns``), and the census counts rows
    per combination. Co-missing fields expose the failure *mode*
    (one broken extractor nulls title+date together; independent
    sparsity nulls them separately) — the first diagnostic cut on any
    completeness regression, and the standard missingness-mechanism
    probe (MCAR vs systematic) from the imputation literature.

    Empty string counts as missing for string columns (same
    web-extractor convention as :func:`completeness_matrix`). Output:
    ``(pattern, missing_cols, n_rows, share)`` (+ leading ``by``
    column when given, shares within the group).

    Scale shape: one projection + ONE hash aggregation whose key
    cardinality is at most 2^len(columns) — tiny result regardless of
    input rows (map-side combine does nearly all the work); the share
    is a window over that tiny grouped result, not over the input."""
    dtypes = dict(df.dtypes)
    bits, names = [], []
    for c in columns:
        miss = F.col(c).isNull()
        if dtypes.get(c) == "string":
            miss = miss | (F.col(c) == "")
        bits.append(F.when(miss, F.lit("1")).otherwise(F.lit("0")))
        names.append(F.when(miss, F.lit(c)))
    keys = ([F.col(by)] if by else []) + [
        F.concat(*bits).alias("pattern"),
        # concat_ws skips NULL operands -> comma list of missing cols
        F.concat_ws(",", *names).alias("missing_cols")]
    g = df.groupBy(*keys).agg(F.count("*").cast("long").alias("n_rows"))
    w = Window.partitionBy(*([by] if by else []))
    return g.withColumn(
        "share", F.round(F.col("n_rows") / F.sum("n_rows").over(w), 6))


def monotonic_violations(df: DataFrame, *, key_col: str,
                         order_col: str, value_col: str,
                         strict: bool = False) -> DataFrame:
    """Per-key monotonicity audit: ordered by ``order_col`` (must be
    unique per key, or the lag — here and in any SQL twin — is
    nondeterministic), count the steps where ``value_col`` moves
    backwards (``<`` previous; ``<=`` when ``strict``). The invariant
    behind event-time ordering per session, cumulative counters,
    version numbers and recrawl timestamps — `sequence_violations`
    checks one type-pair precedence, this checks a whole numeric/time
    column's ordering. Output one row per violating key:
    ``(key, n_rows, n_inversions, inversion_rate)`` with rate over the
    ``n_rows - 1`` steps.

    Scale shape: ONE shuffle on the key — the window's hash
    partitioning satisfies the following groupBy's distribution, so
    the aggregation is shuffle-free; per-key state is a sort of that
    key's rows only (no global sort)."""
    clean = df.where(F.col(key_col).isNotNull()
                     & F.col(order_col).isNotNull()
                     & F.col(value_col).isNotNull())
    w = Window.partitionBy(key_col).orderBy(order_col)
    prev = F.lag(value_col).over(w)
    back = (F.col(value_col) <= prev) if strict \
        else (F.col(value_col) < prev)
    stepped = clean.select(
        key_col, back.cast("long").alias("__inv"))  # NULL on first row
    return (stepped.groupBy(key_col)
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.coalesce(F.sum("__inv"), F.lit(0))
                 .cast("long").alias("n_inversions"))
            .where(F.col("n_inversions") > 0)
            .withColumn("inversion_rate",
                        F.round(F.col("n_inversions")
                                / (F.col("n_rows") - 1), 6)))


def fd_mine(df: DataFrame,
            candidates: "Sequence[tuple[str, str]]") -> DataFrame:
    """Approximate functional-dependency mining over CANDIDATE column
    pairs: for each ``(lhs, rhs)``, the g3-style confidence — the
    share of rows kept by the best rhs-per-lhs assignment,
    ``Σ_lhs max_rhs count / Σ count`` over non-NULL lhs rows (the
    error measure of TANE, Huhtala et al. 1999, and Pyro, Kruse &
    Naumann 2018). ``confidence = 1.0`` means the FD holds exactly
    (what :func:`fd_violations` then pinpoints row-by-row); 0.9 means
    enforcing it would rewrite 10% of rows. Output per candidate:
    ``(lhs, rhs, n_rows, n_lhs, confidence, holds)``.

    Scale shape: per candidate, a (lhs, rhs) hash aggregation, a
    shuffle-free lhs re-aggregation (partitioning reuse), and a
    singleton reduce; candidates are a handful, unioned driver-side.
    Candidate GENERATION is deliberately the caller's job — the
    lattice search of TANE is super-linear in columns and belongs on
    a profiled sample, not the 10^12-row table."""
    if not candidates:
        raise ValueError("fd_mine: no candidate pairs given")
    outs = []
    for lhs, rhs in candidates:
        pair = (df.where(F.col(lhs).isNotNull())
                .groupBy(lhs, rhs).agg(F.count("*").alias("__c")))
        per = pair.groupBy(lhs).agg(F.max("__c").alias("__mx"),
                                    F.sum("__c").alias("__tot"))
        one = per.agg(F.sum("__tot").alias("__n"),
                      F.count("*").alias("__k"),
                      F.sum("__mx").alias("__kept"))
        outs.append(one.select(
            F.lit(lhs).alias("lhs"), F.lit(rhs).alias("rhs"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col("__k").cast("long").alias("n_lhs"),
            F.round(F.col("__kept") / F.col("__n"), 6)
            .alias("confidence"),
            (F.col("__kept") == F.col("__n")).alias("holds")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def scd2_history(df: DataFrame, *, key_col: str, ts_col: str,
                 state_col: str,
                 order_col: str | None = None) -> DataFrame:
    """Type-2 slowly-changing-dimension history build: collapse a
    per-key event/recrawl log into state VERSIONS — one row per run
    of consecutive identical ``state_col`` values, with
    ``valid_from`` / ``valid_to`` interval bounds (half-open;
    ``valid_to`` NULL on the current version). The warehouse pattern
    behind recrawl content histories (url × fingerprint), subscription
    states, and label audit trails — the inverse of "latest wins"
    (`survivorship_merge` keeps one row; this keeps the full interval
    history).

    ``order_col`` (default ``ts_col``) must be unique per key — ties
    make lag/lead nondeterministic here and in any SQL twin. NULL
    states are their own state ('∅'), matching `rolling_psi`.

    Output: ``(key, version, state, valid_from, valid_to, n_rows,
    is_current)``; version is 1-based in order.

    Scale shape: ONE shuffle on the key — change-point lag, running
    version sum, the (key, version, state) aggregation, and the
    valid_to lead all reuse the same HashPartitioning(key) (subset
    satisfies superset clustering). The key keeps its ORIGINAL column
    name until the final projection: renaming it earlier inserts two
    extra exchanges because the window's output partitioning does not
    propagate through the alias (verified empirically on 4.1.2 — the
    aliased variant plans 3 exchanges, this one plans 1); per-key sort
    only, no global sort."""
    order = order_col or ts_col
    clean = df.where(F.col(key_col).isNotNull()
                     & F.col(ts_col).isNotNull())
    st = F.coalesce(F.col(state_col).cast("string"), F.lit("∅"))
    w = Window.partitionBy(key_col).orderBy(order)
    chg = F.when(F.lag(st).over(w).isNull()
                 | (st != F.lag(st).over(w)), F.lit(1)) \
        .otherwise(F.lit(0))
    ver = F.sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    runs = (clean.select(F.col(key_col),
                         F.col(ts_col).alias("__ts"),
                         st.alias("state"), ver.alias("version"))
            .groupBy(key_col, "version", "state")
            .agg(F.min("__ts").alias("valid_from"),
                 F.count("*").cast("long").alias("n_rows")))
    w2 = Window.partitionBy(key_col).orderBy("version")
    return (runs.select(
        F.col(key_col).alias("key"),
        F.col("version").cast("long").alias("version"),
        "state", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"), "n_rows")
        .withColumn("is_current", F.col("valid_to").isNull()))


def group_ols(df: DataFrame, *, x_col: str, y_col: str, by: str,
              round_to: int = 6) -> DataFrame:
    """Per-group simple linear regression (OLS of ``y`` on ``x``):
    slope, intercept, r² — the profiling question "does the
    chars→tokens (or size→cost, length→score) relationship hold in
    every segment, and with the same coefficient?". A segment whose
    slope drifts from the corpus line has a different tokenizer,
    encoding, or extraction bug even when both marginals look fine —
    the bivariate sibling of :func:`correlation_stats`.

    Spelled through the numerically-stable partial aggregates
    (``covar_samp`` / ``var_samp`` / ``stddev_samp``) with
    ``try_divide``, so a zero-variance group yields NULL slope/r²
    instead of an ANSI divide error — the same convention (and the
    same cross-engine float story) as `correlation_stats`. Rows with
    NULL x or y are excluded pairwise.

    Scale shape: ONE hash aggregation on the group key (all moments
    partial-aggregating, map-side combined); the arithmetic runs on
    the tiny grouped result."""
    clean = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    g = clean.groupBy(F.col(by)).agg(
        F.count("*").cast("long").alias("n"),
        F.avg(x_col).alias("__mx"), F.avg(y_col).alias("__my"),
        F.covar_samp(x_col, y_col).alias("__cxy"),
        F.var_samp(x_col).alias("__vx"),
        F.stddev_samp(x_col).alias("__sx"),
        F.stddev_samp(y_col).alias("__sy"))
    slope = F.try_divide(F.col("__cxy"), F.col("__vx"))
    corr = F.try_divide(F.col("__cxy"), F.col("__sx") * F.col("__sy"))
    return g.select(
        by, "n", F.round(slope, round_to).alias("slope"),
        F.round(F.col("__my") - slope * F.col("__mx"),
                round_to).alias("intercept"),
        F.round(corr * corr, round_to).alias("r2"))


def roc_auc(df: DataFrame, *, score_col: str, label_col,
            by: str | None = None, round_to: int = 6) -> DataFrame:
    """ROC AUC of a score against a boolean label, exactly (midrank
    tie handling), optionally per group — the discrimination audit
    for any quality/spam/match score the pipeline gates on: AUC 0.5
    means the score carries no signal in that segment even when its
    marginal distribution looks healthy. Complements
    :func:`quality_calibration` (calibration) and :func:`woe_iv`
    (per-bucket separation) with the threshold-free ranking view.

    Computed via the rank-sum identity on DISTINCT score levels:
    group scores, then AUC = Σ_s p_s·(cumneg_<s + q_s/2) / (P·Q) —
    ties contribute half, which IS the midrank/trapezoid definition,
    with no per-row ranking. A group that is all-positive or
    all-negative yields NULL AUC (``try_divide``), not an error.

    Scale shape: one hash aggregation to (group, score) — the only
    shuffle — then a per-group window over DISTINCT scores (bounded
    by score cardinality, not rows) and a final per-group fold that
    reuses the same partitioning; no global sort, no per-row window.
    """
    lbl = (label_col if isinstance(label_col, Column)
           else F.col(label_col))
    grp = F.col(by) if by else F.lit(0)
    clean = df.where(F.col(score_col).isNotNull() & lbl.isNotNull())
    per_score = (clean.select(grp.alias("__g"),
                              F.col(score_col).alias("__s"),
                              lbl.cast("int").alias("__y"))
                 .groupBy("__g", "__s")
                 .agg(F.sum("__y").alias("__p"),
                      F.sum(1 - F.col("__y")).alias("__q")))
    w = (Window.partitionBy("__g").orderBy("__s")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    contrib = (F.col("__p")
               * (F.sum("__q").over(w) - F.col("__q")
                  + F.col("__q") / F.lit(2.0)))
    agg = (per_score.select("__g", "__p", "__q",
                            contrib.alias("__c"))
           .groupBy("__g")
           .agg(F.sum("__p").cast("long").alias("n_pos"),
                F.sum("__q").cast("long").alias("n_neg"),
                F.round(F.try_divide(
                    F.sum("__c"),
                    F.sum("__p").cast("double")
                    * F.sum("__q").cast("double")),
                    round_to).alias("auc")))
    if by:
        return agg.select(F.col("__g").alias(by), "n_pos", "n_neg",
                          "auc")
    return agg.select("n_pos", "n_neg", "auc")


def lift_table(df: DataFrame, *, score_col: str, flag_col,
               id_col: str, n_buckets: int = 10,
               round_to: int = 6) -> DataFrame:
    """Decile lift/gains table: rank rows by score (best first),
    split into ``n_buckets`` equal tiles, and report each tile's
    response rate, cumulative lift over the base rate, and cumulative
    capture share — the scorecard companion to :func:`woe_iv` that
    answers "if we keep only the top k/10 by this score, what share
    of the positives do we keep?". ``id_col`` (unique) breaks score
    ties so both engines tile identically.

    Scale shape: ntile is a SINGLE-PARTITION window (one global
    sort) — this is an evaluation-sample tool for scored holdouts
    (≤ millions of rows), deliberately exact; the corpus-scale paths
    are `woe_iv` / `perplexity_buckets`, which bucket by value, not
    rank. The rest is one tiny aggregation over ``n_buckets`` rows.
    """
    flag = (flag_col if isinstance(flag_col, Column)
            else F.col(flag_col))
    clean = df.where(F.col(score_col).isNotNull()
                     & F.col(id_col).isNotNull())
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    tiled = clean.select(
        F.ntile(n_buckets).over(w).alias("bucket"),
        flag.cast("int").alias("__y"))
    per = (tiled.groupBy("bucket")
           .agg(F.count("*").cast("long").alias("n"),
                F.sum("__y").cast("long").alias("n_flagged")))
    w2 = (Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    cum_n = F.sum("n").over(w2)
    cum_f = F.sum("n_flagged").over(w2)
    base = F.sum("n_flagged").over(tot) / F.sum("n").over(tot)
    return per.select(
        "bucket", "n", "n_flagged",
        F.round(F.col("n_flagged") / F.col("n"),
                round_to).alias("rate"),
        F.round(F.try_divide(cum_f / cum_n, base),
                round_to).alias("cum_lift"),
        F.round(F.try_divide(cum_f.cast("double"),
                             F.sum("n_flagged").over(tot)
                             .cast("double")),
                round_to).alias("cum_capture"))


def t_closeness_audit(df: DataFrame, *, qi_cols: Sequence[str],
                      sensitive_col: str, t: float = 0.2,
                      round_to: int = 6) -> DataFrame:
    """t-closeness audit over quasi-identifier groups (Li, Li &
    Venkatasubramanian 2007) — the third rung of the release-gate
    ladder after :func:`k_anonymity` and :func:`l_diversity_audit`:
    a group can be large AND diverse yet still leak if its sensitive
    distribution differs sharply from the table's (e.g. one host
    group is 90% flagged where the corpus is 5%). For a categorical
    sensitive attribute with uniform ground distance the EMD is the
    total-variation distance ½·Σ|p_i − q_i|; ``ok`` requires
    ``emd ≤ t``.

    Absent sensitive values (in the table but not the group)
    contribute their full global mass; rather than materialising the
    qi×sensitive grid, the fold uses
    ½·(Σ_present|p−q| + (1 − Σ_present q)), which is algebraically
    the same TVD over only the PRESENT cells.

    Shape at 10^12 rows: one hash aggregation to (qi, sensitive)
    cells, a broadcast join of the global sensitive distribution
    (cardinality of the sensitive attribute — tiny), and one qi
    rollup; no window, no grid blow-up."""
    if not 0 < float(t) <= 1:
        raise ValueError("t must be in (0, 1]")
    qi = list(qi_cols)
    s = F.coalesce(F.col(sensitive_col).cast("string"), F.lit("∅"))
    clean = df.select(*[F.col(c) for c in qi], s.alias("__s"))
    cells = clean.groupBy(*qi, "__s").agg(
        F.count("*").alias("__nc"))
    glob = (clean.groupBy("__s")
            .agg(F.count("*").alias("__ns"))
            .withColumn("__q", F.col("__ns")
                        / F.sum("__ns").over(Window.rowsBetween(
                            Window.unboundedPreceding,
                            Window.unboundedFollowing))))
    joined = cells.join(F.broadcast(glob.select("__s", "__q")),
                        "__s")
    w = Window.partitionBy(*qi)
    withn = joined.select(
        *qi, "__q",
        F.sum("__nc").over(w).alias("__n"),
        F.col("__nc").alias("__nc"))
    per = (withn.groupBy(*qi)
           .agg(F.first("__n").cast("long").alias("n"),
                F.sum(F.abs(F.col("__nc") / F.col("__n")
                            - F.col("__q"))).alias("__sum_abs"),
                F.sum("__q").alias("__sum_q")))
    emd = (F.col("__sum_abs") + (1.0 - F.col("__sum_q"))) / 2.0
    return per.select(
        *qi, "n", F.round(emd, round_to).alias("emd"),
        (F.round(emd, round_to) <= F.lit(t)).alias("ok"))


# ---------------------------------------------------------------------------
# order-invariant table fingerprint — replication / migration parity
# ---------------------------------------------------------------------------

def table_fingerprint(df: DataFrame, columns: Sequence[str], *,
                      by: str | None = None) -> DataFrame:
    """Order-invariant content checksum of a table (or of each *by*
    group): row digest = md5 over the unit-separated, null-sentineled
    canonical strings of *columns*, folded commutatively as
    SUM(digest) mod 2⁶¹ together with the row count and the min/max
    digest. Two frames holding the same multiset of rows produce the
    same (n_rows, fp, fp_min, fp_max) regardless of row order,
    partitioning, or file layout — the cheap way to verify a
    replica/migration/backfill copied everything, without sorting
    either side (a total sort of 10¹² rows is exactly what this
    avoids).

    Canonicalization: each column is cast to string with NULL mapped
    to a sentinel BEFORE concat_ws (concat_ws silently skips NULLs,
    which would make ('a',NULL,'b') collide with ('a','b',NULL)).
    Columns whose string form is engine-dependent (floats, timestamps)
    should be canonicalized by the caller first; integer and string
    columns round-trip identically in Spark and DuckDB, which keeps
    the whole check oracle-verifiable.

    Scale shape: ONE hash aggregation with map-side partial combine —
    the digest sum is associative-commutative, so executors fold their
    partitions locally and ship one partial per group. The 60-bit
    digest (15 hex chars) summed as decimal(38,0) cannot overflow
    before ~10²⁰ rows; the mod-2⁶¹ fold is applied once at the end.
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
             for c in columns]
    digest = F.conv(F.substring(F.md5(F.concat_ws("\x1f", *parts)),
                                1, 15), 16, 10).cast("decimal(38,0)")
    keys = [by] if by else []
    grouped = (df.select(*keys, digest.alias("__d"))
               .groupBy(*keys) if by
               else df.select(digest.alias("__d")).groupBy())
    return grouped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(F.sum("__d"), F.lit(2 ** 61).cast("decimal(38,0)"))
         .cast("long").alias("fp"),
        F.min("__d").cast("long").alias("fp_min"),
        F.max("__d").cast("long").alias("fp_max"))


def snapshot_parity(a: DataFrame, b: DataFrame,
                    columns: Sequence[str], *,
                    by: str) -> DataFrame:
    """Replication-parity verdicts: fingerprint *a* and *b* per *by*
    group (:func:`table_fingerprint`) and full-outer-join the two
    fingerprint tables — one verdict row per group with both row
    counts, both checksums, and ``match`` true iff the group holds the
    identical multiset of rows on both sides. Groups present on one
    side only surface with the other side's count as 0.

    This is the validation-engine answer to "did the Iceberg
    replication/backfill/engine-migration lose or mutate rows?" at
    10¹²-doc scale: two single-pass aggregations (one per side, each
    map-side combined down to |groups| rows) + one tiny join — the
    tables themselves are never sorted, shuffled whole, or compared
    row-by-row.
    """
    fa = table_fingerprint(a, columns, by=by).alias("a")
    fb = table_fingerprint(b, columns, by=by).alias("b")
    key = F.coalesce(F.col(f"a.{by}"), F.col(f"b.{by}"))
    return (fa.join(fb, F.col(f"a.{by}") == F.col(f"b.{by}"), "full")
            .select(
                key.alias(by),
                F.coalesce(F.col("a.n_rows"), F.lit(0)).alias("n_a"),
                F.coalesce(F.col("b.n_rows"), F.lit(0)).alias("n_b"),
                F.col("a.fp").alias("fp_a"),
                F.col("b.fp").alias("fp_b"),
                (F.col("a.n_rows").eqNullSafe(F.col("b.n_rows"))
                 & F.col("a.fp").eqNullSafe(F.col("b.fp"))
                 & F.col("a.fp_min").eqNullSafe(F.col("b.fp_min"))
                 & F.col("a.fp_max").eqNullSafe(F.col("b.fp_max")))
                .alias("match")))


# ---------------------------------------------------------------------------
# exact discrete Wasserstein-1 drift — CDF-area distance
# ---------------------------------------------------------------------------

def wasserstein_drift(df: DataFrame, value_col: str, *,
                      split: Column,
                      round_to: int = 6) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between the two
    empirical distributions of *value_col* selected by the boolean
    *split* (True → sample A, False → B):
    W₁ = ∫ |F_A(x) − F_B(x)| dx, evaluated exactly as the CDF-gap area
    over the merged support — Σ over sorted distinct values v of
    |cdf_A(v) − cdf_B(v)| · (next(v) − v).

    W₁ complements the existing drift family: KL/PSI are
    mass-weighted (blind to a pure location shift in a thin tail), KS
    is the max CDF gap (blind to HOW FAR mass moved), while W₁ prices
    drift in the units of the column — "the length distribution moved
    37 chars" — which is what a drift SLA on a numeric column should
    bound.

    Scale shape: ONE hash aggregation to (value, count_a, count_b) —
    the only pass over the corpus — then running-sum + lead windows
    over the |distinct values| aggregate rows. Exact form is for
    discrete/bounded columns (lengths, counts, scores with fixed
    precision); for unbounded continuous columns bin first (the
    :func:`ks_drift_binned` contract) so the window side stays tiny.
    Returns one row ``(w1, n_values, n_a, n_b)``.
    """
    hist = (df.select(F.col(value_col).alias("v"),
                      F.when(split, 1).otherwise(0).alias("is_a"))
            .where(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.sum("is_a").alias("ca"),
                 F.sum(F.lit(1) - F.col("is_a")).alias("cb")))
    wall = Window.partitionBy()
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lead = Window.orderBy("v")
    cdf = hist.select(
        F.col("v"),
        (F.sum("ca").over(w) / F.sum("ca").over(wall)).alias("cdf_a"),
        (F.sum("cb").over(w) / F.sum("cb").over(wall)).alias("cdf_b"),
        (F.lead("v").over(lead) - F.col("v")).alias("gap"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"))
    return cdf.agg(
        F.round(F.sum(F.abs(F.col("cdf_a") - F.col("cdf_b"))
                      * F.col("gap")), round_to).alias("w1"),
        F.count(F.lit(1)).alias("n_values"),
        F.first("na").cast("long").alias("n_a"),
        F.first("nb").cast("long").alias("n_b"))


# ---------------------------------------------------------------------------
# differentially-private count release — deterministic Laplace mechanism
# ---------------------------------------------------------------------------

def dp_noisy_counts(df: DataFrame, key_col: str, *,
                    epsilon: float = 1.0,
                    seed: str = "dp") -> DataFrame:
    """ε-differentially-private per-key counts via the Laplace
    mechanism (Dwork et al. 2006): released count = true count +
    Laplace(Δf/ε) with sensitivity Δf = 1 (one row changes one key's
    count by one), clamped at 0 and rounded to an integer.

    The noise draw is DETERMINISTIC: U = uniform01-from-md5(seed‖key)
    (52-bit mantissa, strictly inside (0,1)), then the Laplace inverse
    CDF  noise = −(1/ε)·sgn(U−½)·ln(1−2|U−½|).  Determinism serves the
    engineering contract — reruns, retries, and the DuckDB oracle all
    release the SAME value, so the mechanism's arithmetic is
    value-hash-verifiable — at the price of the formal guarantee
    holding only per seed (an adversary who can request many seeds
    averages the noise away; rotate ε-budget per seed exactly as the
    DP accounting literature prescribes for repeated releases).

    Scale shape: ONE hash aggregation to |keys| rows; the md5/ln noise
    math runs on the aggregate, not the corpus. Emits
    ``(key, noisy_count, epsilon)`` — deliberately NOT the true count
    (that would be the leak the mechanism exists to prevent).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("__n")))
    d = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed + ":"), F.col("key").cast("string"))),
        1, 13), 16, 10).cast("long")
    u = (d.cast("double") + F.lit(0.5)) / F.lit(float(2 ** 52))
    v = u - F.lit(0.5)
    noise = (F.lit(-1.0 / float(epsilon)) * F.signum(v)
             * F.log(F.lit(1.0) - 2.0 * F.abs(v)))
    return counts.select(
        F.col("key").alias(key_col),
        F.greatest(F.lit(0).cast("long"),
                   F.round(F.col("__n") + noise, 0).cast("long"))
         .alias("noisy_count"),
        F.lit(float(epsilon)).alias("epsilon"))


# ---------------------------------------------------------------------------
# sequential change detection — Page-Hinkley mean-shift test
# ---------------------------------------------------------------------------

def page_hinkley(df: DataFrame, value_col: str, order_col: str, *,
                 delta: float = 0.0, lam: float = 50.0,
                 round_to: int = 6) -> DataFrame:
    """Page-Hinkley sequential mean-shift detection (Page 1954;
    Hinkley 1971; the streaming-drift formulation in Gama et al. 2014
    "A survey on concept drift adaptation" §3.2) over the series
    *value_col* ordered by *order_col*:

        m_t  = Σ_{s≤t} (x_s − mean_s − δ)      (mean_s = running mean)
        PH_t = m_t − min_{s≤t} m_s
        alarm at t iff PH_t > λ

    Complements the existing monitors: CUSUM (:func:`cusum_shift`)
    tracks deviation from a FIXED reference mean, EWMA smooths but
    does not test, while Page-Hinkley self-references the running mean
    — the standard choice when no baseline window exists yet (cold
    start of a validation deployment).

    Scale shape: the caller aggregates the corpus to the series first
    (e.g. one count-per-day hash aggregation), so the four windows
    here run over |series| rows — days/hours, not documents. Windows
    are unpartitioned BY DESIGN: a monitored series is one logical
    timeline and must stay tiny; do not call this on a per-document
    frame. Returns ``(order, x, run_mean, m, ph, alarm)`` per point.
    """
    w = (Window.orderBy("order")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = df.select(
        F.col(order_col).alias("order"),
        F.col(value_col).cast("double").alias("x"))
    base = base.withColumn("run_mean", F.avg("x").over(w))
    base = base.withColumn(
        "m", F.sum(F.col("x") - F.col("run_mean") - F.lit(float(delta)))
              .over(w))
    base = base.withColumn("ph", F.col("m") - F.min("m").over(w))
    return base.select(
        "order",
        F.round("x", round_to).alias("x"),
        F.round("run_mean", round_to).alias("run_mean"),
        F.round("m", round_to).alias("m"),
        F.round("ph", round_to).alias("ph"),
        (F.col("ph") > F.lit(float(lam))).alias("alarm"))


# ---------------------------------------------------------------------------
# multivariate outliers — ECOD (empirical-CDF tail product)
# ---------------------------------------------------------------------------

def ecod_outliers(df: DataFrame, cols: "Sequence[str]", *,
                  id_cols: "Sequence[str]",
                  round_to: int = 6) -> DataFrame:
    """ECOD outlier scores (Li et al., TKDE 2022, "ECOD: Unsupervised
    Outlier Detection Using Empirical Cumulative Distribution
    Functions") over the numeric columns *cols*: per dimension j the
    left/right empirical tail probabilities

        F_j(x)  = P(X_j ≤ x)        Fr_j(x) = P(X_j ≥ x)

    give dimension scores −log F_j / −log Fr_j; the aggregated scores

        O_left  = Σ_j −log F_j(x_j)
        O_right = Σ_j −log Fr_j(x_j)
        O_auto  = Σ_j (−log F_j  if skew_j < 0 else −log Fr_j)

    and the released score is max(O_left, O_right, O_auto) — larger =
    more extreme in at least one consistent tail direction. Both tails
    include the point itself, so no log(0).

    Scale shape: NO global sort of the corpus. Per dimension, ONE hash
    aggregation to the distinct-value histogram, running-sum windows
    over those (tiny) aggregate rows to turn counts into tail
    probabilities, then a broadcast join back on the value — the big
    table is traversed once per dimension with no ordering
    requirement. Skewness comes from the same histogram's moment sums.
    Returns ``id_cols + [col..., score_left, score_right, score_auto,
    ecod_score]``.
    """
    out = df.select(*[F.col(c) for c in id_cols],
                    *[F.col(c).cast("double").alias(c) for c in cols])
    sl, sr, sa = F.lit(0.0), F.lit(0.0), F.lit(0.0)
    for c in cols:
        hist = (df.select(F.col(c).cast("double").alias("__v"))
                .where(F.col("__v").isNotNull())
                .groupBy("__v").agg(F.count(F.lit(1)).alias("__c")))
        wall = Window.partitionBy()
        w = (Window.orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        n = F.sum("__c").over(wall)
        m1 = F.sum(F.col("__v") * F.col("__c")).over(wall) / n
        m2 = F.sum(F.col("__v") ** 2 * F.col("__c")).over(wall) / n
        m3 = F.sum(F.col("__v") ** 3 * F.col("__c")).over(wall) / n
        var = m2 - m1 ** 2
        skew = F.when(var > 0,
                      (m3 - 3 * m1 * m2 + 2 * m1 ** 3) / var ** 1.5) \
                .otherwise(F.lit(0.0))
        cum = F.sum("__c").over(w)
        tails = hist.select(
            F.col("__v"),
            (cum / n).alias(f"__fl_{c}"),
            ((n - cum + F.col("__c")) / n).alias(f"__fr_{c}"),
            (skew < 0).alias(f"__neg_{c}"))
        out = out.join(F.broadcast(tails),
                       out[c] == tails["__v"], "left").drop("__v")
        fl, fr = -F.log(f"__fl_{c}"), -F.log(f"__fr_{c}")
        sl, sr = sl + F.coalesce(fl, F.lit(0.0)), \
            sr + F.coalesce(fr, F.lit(0.0))
        sa = sa + F.coalesce(
            F.when(F.col(f"__neg_{c}"), fl).otherwise(fr), F.lit(0.0))
    return out.select(
        *id_cols, *cols,
        F.round(sl, round_to).alias("score_left"),
        F.round(sr, round_to).alias("score_right"),
        F.round(sa, round_to).alias("score_auto"),
        F.round(F.greatest(sl, sr, sa), round_to).alias("ecod_score"))


def energy_drift(df: DataFrame, value_col: str, *,
                 split: Column,
                 round_to: int = 6) -> DataFrame:
    """Exact (squared) energy distance between the two empirical
    distributions of *value_col* selected by the boolean *split*
    (True → A, False → B) — Székely & Rizzo 2004:

        D² = 2·E|X−Y| − E|X−X′| − E|Y−Y′|

    evaluated EXACTLY from the merged CDFs: for any pair of
    independent draws, E|U−V| = ∫ [F_U(t)(1−F_V(t)) +
    F_V(t)(1−F_U(t))] dt, so all three terms are CDF-product areas
    over the same sorted distinct-value rows the 1-Wasserstein drift
    uses. D² ≥ 0 with equality iff the distributions coincide, and it
    responds to BOTH location and shape — the rotation-complete
    member of the drift family (KL/PSI mass-weighted, KS max-gap,
    W₁ location-priced).

    Scale shape: identical to :func:`wasserstein_drift` — ONE hash
    aggregation to (value, count_a, count_b), then running-sum + lead
    windows over the |distinct values| aggregate rows. Exact form is
    for discrete/bounded columns; bin continuous columns first.
    Returns one row ``(e_xy, e_xx, e_yy, energy_d2, n_a, n_b)``.
    """
    hist = (df.select(F.col(value_col).alias("v"),
                      F.when(split, 1).otherwise(0).alias("is_a"))
            .where(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.sum("is_a").alias("ca"),
                 F.sum(F.lit(1) - F.col("is_a")).alias("cb")))
    wall = Window.partitionBy()
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lead = Window.orderBy("v")
    cdf = hist.select(
        (F.sum("ca").over(w) / F.sum("ca").over(wall)).alias("fa"),
        (F.sum("cb").over(w) / F.sum("cb").over(wall)).alias("fb"),
        (F.lead("v").over(lead) - F.col("v")).alias("gap"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"))
    terms = cdf.agg(
        F.sum((F.col("fa") * (1 - F.col("fb"))
               + F.col("fb") * (1 - F.col("fa"))) * F.col("gap"))
         .alias("exy"),
        F.sum(2 * F.col("fa") * (1 - F.col("fa")) * F.col("gap"))
         .alias("exx"),
        F.sum(2 * F.col("fb") * (1 - F.col("fb")) * F.col("gap"))
         .alias("eyy"),
        F.first("na").cast("long").alias("n_a"),
        F.first("nb").cast("long").alias("n_b"))
    return terms.select(
        F.round("exy", round_to).alias("e_xy"),
        F.round("exx", round_to).alias("e_xx"),
        F.round("eyy", round_to).alias("e_yy"),
        F.round(2 * F.col("exy") - F.col("exx") - F.col("eyy"),
                round_to).alias("energy_d2"),
        "n_a", "n_b")


def mcnemar(df: DataFrame, flag_a: Column, flag_b: Column, *,
            round_to: int = 6) -> DataFrame:
    """McNemar's test for paired verdict shifts (McNemar 1947), the
    standard before/after significance test when the SAME rows are
    judged under two rule versions: with discordant counts
    b = pass→fail and c = fail→pass,

        χ² = (|b − c| − 1)² / (b + c)     (continuity-corrected)

    Under H₀ (the rule change only reshuffles symmetric noise),
    χ² ~ χ²(1); χ² > 3.841 rejects at 5%. The concordant cells don't
    enter the statistic — that is the point: a rule tightened on a
    drifting corpus shows b ≫ c regardless of the (huge, stable)
    concordant mass. Complements :func:`verdict_transitions` (which
    lists the flips) with the decision statistic.

    Scale shape: ONE aggregation pass, four conditional counts; the
    χ² math runs on the single aggregate row. Returns
    ``(n, n_pass_pass, n_pass_fail, n_fail_pass, n_fail_fail,
    chi2, significant_05)``.
    """
    a = F.coalesce(flag_a.cast("boolean"), F.lit(False))
    b = F.coalesce(flag_b.cast("boolean"), F.lit(False))
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(a & b, 1).otherwise(0)).alias("n_pass_pass"),
        F.sum(F.when(a & ~b, 1).otherwise(0)).alias("n_pass_fail"),
        F.sum(F.when(~a & b, 1).otherwise(0)).alias("n_fail_pass"),
        F.sum(F.when(~a & ~b, 1).otherwise(0)).alias("n_fail_fail"))
    disc = F.col("n_pass_fail") + F.col("n_fail_pass")
    chi2 = F.when(
        disc > 0,
        (F.abs(F.col("n_pass_fail") - F.col("n_fail_pass")) - 1) ** 2
        / disc.cast("double")).otherwise(F.lit(0.0))
    return agg.select(
        "n", "n_pass_pass", "n_pass_fail", "n_fail_pass",
        "n_fail_fail",
        F.round(chi2, round_to).alias("chi2"),
        (chi2 > 3.841459).alias("significant_05"))


# ---------------------------------------------------------------------------
# nonparametric trend battery — Theil-Sen slope + Mann-Kendall test
# ---------------------------------------------------------------------------

def theil_sen(df: DataFrame, value_col: str, order_col: str, *,
              round_to: int = 6) -> DataFrame:
    """Theil-Sen robust slope (Theil 1950; Sen 1968) over the series
    *value_col* ordered by the NUMERIC *order_col*: the median of all
    pairwise slopes (x_j − x_i)/(t_j − t_i), t_j > t_i — the trend
    estimator that tolerates up to ~29% outliers where OLS
    (:func:`group_ols`) is dragged by a single corrupted day.
    Intercept is the median of (x − slope·t).

    Scale shape: the caller aggregates the corpus to the monitored
    series FIRST (days/hours), so the O(n²) pair join runs on n ≈
    tens of points — deliberate and documented, same contract as
    :func:`page_hinkley`. Returns one row
    ``(n_points, n_pairs, slope, intercept)``.
    """
    s = df.select(F.col(order_col).cast("double").alias("t"),
                  F.col(value_col).cast("double").alias("x")) \
          .where(F.col("t").isNotNull() & F.col("x").isNotNull())
    pairs = (s.alias("i")
             .join(s.alias("j"), F.col("j.t") > F.col("i.t"))
             .select(((F.col("j.x") - F.col("i.x"))
                      / (F.col("j.t") - F.col("i.t"))).alias("m")))
    agg = pairs.agg(
        F.expr("percentile(m, 0.5)").alias("slope"),
        F.count(F.lit(1)).alias("n_pairs"))
    n = s.agg(F.count(F.lit(1)).alias("n_points"))
    resid = (s.crossJoin(F.broadcast(agg))
             .agg(F.expr("percentile(x - slope * t, 0.5)")
                  .alias("intercept"),
                  F.first("slope").alias("slope"),
                  F.first("n_pairs").alias("n_pairs")))
    return (n.crossJoin(F.broadcast(resid))
            .select("n_points", "n_pairs",
                    F.round("slope", round_to).alias("slope"),
                    F.round("intercept", round_to).alias("intercept")))


def mann_kendall(df: DataFrame, value_col: str, order_col: str, *,
                 round_to: int = 6) -> DataFrame:
    """Mann-Kendall trend test (Mann 1945; Kendall 1975) — the
    standard nonparametric companion to :func:`theil_sen`: with
    S = Σ_{i<j} sign(x_j − x_i) and the tie-corrected variance

        Var(S) = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18

    the normal approximation z = (S∓1)/√Var(S) (continuity-corrected
    toward 0, z = 0 when S = 0) tests H₀ "no monotone trend". |z| >
    1.96 rejects at 5%. Runs on the pre-aggregated monitored series
    (same tiny-n contract as :func:`theil_sen`). Returns one row
    ``(n, s, var_s, z, trend_05)``.
    """
    ser = df.select(F.col(order_col).cast("double").alias("t"),
                    F.col(value_col).cast("double").alias("x")) \
            .where(F.col("t").isNotNull() & F.col("x").isNotNull())
    pairs = (ser.alias("i")
             .join(ser.alias("j"), F.col("j.t") > F.col("i.t"))
             .agg(F.sum(F.signum(F.col("j.x") - F.col("i.x")))
                  .cast("long").alias("s")))
    n = ser.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ties = (ser.groupBy("x").agg(F.count(F.lit(1)).alias("tc"))
            .where(F.col("tc") > 1)
            .agg(F.coalesce(
                F.sum(F.col("tc") * (F.col("tc") - 1)
                      * (2 * F.col("tc") + 5)), F.lit(0))
                .cast("double").alias("tie_term")))
    base = (n.crossJoin(F.broadcast(pairs))
            .crossJoin(F.broadcast(ties)))
    var_s = (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
             - F.col("tie_term")) / 18.0
    z = F.when(F.col("s") > 0,
               (F.col("s") - 1) / F.sqrt(var_s)) \
         .when(F.col("s") < 0,
               (F.col("s") + 1) / F.sqrt(var_s)) \
         .otherwise(F.lit(0.0))
    return base.select(
        F.col("n").cast("long").alias("n"),
        F.col("s"),
        F.round(var_s, round_to).alias("var_s"),
        F.round(z, round_to).alias("z"),
        (F.abs(z) > 1.959964).alias("trend_05"))


def ts_sanity_audit(df: DataFrame, ts_col: str, *,
                    cutoff: str,
                    round_to: int = 6) -> DataFrame:
    """Timestamp plausibility audit — the sentinel patterns corrupted
    event feeds actually produce: NULLs, epoch-zero defaults
    (1970-01-01T00:00:00, the uninitialized-field classic), rows
    AFTER the supplied *cutoff* (clock skew / unit confusion),
    exact-midnight concentration (date-only values smuggled into a
    timestamp column), and the weekend share (a B2B feed whose
    weekend share suddenly moves has a pipeline change, not new
    users). *cutoff* is an explicit ISO literal, never wall-clock —
    reruns and the oracle must agree.

    ONE aggregation pass; all flags fuse into the scan projection.
    Returns one row ``(n, n_null, n_epoch_zero, n_future,
    n_midnight, weekend_share)``.
    """
    ts = F.col(ts_col)
    nn = ts.isNotNull()
    weekend = F.dayofweek(ts).isin(1, 7)  # Spark: 1=Sun, 7=Sat
    midnight = ((F.hour(ts) == 0) & (F.minute(ts) == 0)
                & (F.second(ts) == 0))
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(ts.isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(ts == F.lit("1970-01-01 00:00:00")
                     .cast("timestamp"), 1).otherwise(0))
         .alias("n_epoch_zero"),
        F.sum(F.when(ts > F.lit(cutoff).cast("timestamp"), 1)
              .otherwise(0)).alias("n_future"),
        F.sum(F.when(nn & midnight, 1).otherwise(0))
         .alias("n_midnight"),
        F.round(F.sum(F.when(nn & weekend, 1).otherwise(0))
                / F.sum(F.when(nn, 1).otherwise(0)),
                round_to).alias("weekend_share"))


def binseg_split(df: DataFrame, value_col: str, order_col: str, *,
                 round_to: int = 6) -> DataFrame:
    """Single-changepoint detection by binary segmentation (Scott &
    Knott 1974; the first split of the binseg recursion every
    changepoint library runs): over the series ordered by
    *order_col*, choose the split that minimizes the summed
    within-segment squared error

        SSE(k) = Σ_left (x−x̄_L)² + Σ_right (x−x̄_R)²

    evaluated for every k from prefix sums — no per-split rescan.
    Reported gain = SSE_total − SSE_split is the variance explained
    by the best single break; a large gain with a coherent date is a
    regime change (deploy, feed swap), where Page-Hinkley
    (:func:`page_hinkley`) only tells you THAT the mean moved.

    Same tiny-series contract as the other monitors: aggregate the
    corpus to the series first. Returns one row ``(split_order,
    n_left, n_right, mean_left, mean_right, sse_total, sse_split,
    gain)`` — split_order is the LAST point of the left segment.
    """
    s = df.select(F.col(order_col).alias("t"),
                  F.col(value_col).cast("double").alias("x")) \
          .where(F.col("t").isNotNull() & F.col("x").isNotNull())
    w = (Window.orderBy("t")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy()
    pre = s.select(
        "t",
        F.row_number().over(Window.orderBy("t")).alias("i"),
        F.sum("x").over(w).alias("s1"),
        F.sum(F.col("x") ** 2).over(w).alias("s2"),
        F.count(F.lit(1)).over(wall).cast("double").alias("n"),
        F.sum("x").over(wall).alias("t1"),
        F.sum(F.col("x") ** 2).over(wall).alias("t2"))
    cand = pre.where(F.col("i") < F.col("n"))
    i, n = F.col("i").cast("double"), F.col("n")
    sse_l = F.col("s2") - F.col("s1") ** 2 / i
    sse_r = ((F.col("t2") - F.col("s2"))
             - (F.col("t1") - F.col("s1")) ** 2 / (n - i))
    sse_tot = F.col("t2") - F.col("t1") ** 2 / n
    scored = cand.select(
        F.col("t").alias("split_order"),
        F.col("i").cast("long").alias("n_left"),
        (n - i).cast("long").alias("n_right"),
        (F.col("s1") / i).alias("ml"),
        ((F.col("t1") - F.col("s1")) / (n - i)).alias("mr"),
        F.round(sse_tot, round_to).alias("sse_tot"),
        # argmin over the ROUNDED sse: raw doubles differ across
        # summation orders at ~1e-12, and the oracle must pick the
        # same split
        F.round(sse_l + sse_r, round_to).alias("sse_split"))
    best = scored.orderBy(F.asc("sse_split"),
                          F.asc("split_order")).limit(1)
    return best.select(
        "split_order", "n_left", "n_right",
        F.round("ml", round_to).alias("mean_left"),
        F.round("mr", round_to).alias("mean_right"),
        F.round("sse_tot", round_to).alias("sse_total"),
        F.round("sse_split", round_to).alias("sse_split"),
        F.round(F.col("sse_tot") - F.col("sse_split"), round_to)
         .alias("gain"))


def weekly_seasonality(df: DataFrame, ts_col: str, *,
                       mad_k: float = 3.0,
                       round_to: int = 6) -> DataFrame:
    """Day-of-week seasonal profile with robust deviation flags — the
    weekly-rhythm audit for event feeds: daily volumes, each day's
    same-weekday mean, the seasonal residual, and a flag when the
    residual sits more than ``mad_k`` robust standard deviations
    (1.4826·MAD) from the median residual. Volume anomalies that
    respect the weekly rhythm (quiet Sundays) stay unflagged;
    a quiet TUESDAY is flagged even when its raw volume is an
    ordinary Sunday level — exactly what a raw-volume z-score
    cannot express.

    Weekday is ISO (1 = Monday … 7 = Sunday) so both engines agree.
    Scale shape: one count-per-day hash aggregation, then windows
    over the day rows (tiny-series contract, as :func:`page_hinkley`).
    Returns per-day rows ``(day, dow, volume, dow_mean, residual,
    flagged)`` — MAD internals stay internal.
    """
    daily = (df.where(F.col(ts_col).isNotNull())
             .groupBy(F.to_date(ts_col).alias("day"))
             .agg(F.count(F.lit(1)).cast("double").alias("x")))
    dow = ((F.dayofweek("day") + 5) % 7) + 1
    wd = Window.partitionBy("dow")
    wall = Window.partitionBy()
    base = daily.select("day", dow.alias("dow"), "x")
    base = base.withColumn("dow_mean", F.avg("x").over(wd))
    base = base.withColumn("res", F.col("x") - F.col("dow_mean"))
    base = base.withColumn(
        "med_r", F.expr("percentile(res, 0.5)").over(wall))
    base = base.withColumn(
        "mad", F.expr("percentile(abs(res - med_r), 0.5)")
               .over(wall))
    dev = F.abs(F.col("res") - F.col("med_r"))
    flagged = F.when(F.col("mad") > 0,
                     dev > F.lit(float(mad_k)) * 1.4826
                     * F.col("mad")) \
               .otherwise(dev > 0)
    return base.select(
        "day", "dow",
        F.col("x").cast("long").alias("volume"),
        F.round("dow_mean", round_to).alias("dow_mean"),
        F.round("res", round_to).alias("residual"),
        flagged.alias("flagged"))


def bin_advisor(df: DataFrame, value_col: str, *,
                round_to: int = 6) -> DataFrame:
    """Histogram bin-width advisor — the three textbook rules
    (Freedman-Diaconis 1981: 2·IQR·n^(−1/3); Scott 1979:
    3.49·σ·n^(−1/3); Sturges 1926: ⌈log₂n⌉+1 bins) computed exactly
    from one pass + two exact percentiles, so histogram-based checks
    (:func:`ks_drift_binned`, PSI) can size their buckets from data
    instead of a hardcoded 10. FD uses the exact interpolated IQR
    (not a sketch) — deliberate: the advisor runs rarely, and both
    engines interpolate quantiles identically.

    Returns one row ``(n, vmin, vmax, iqr, sigma, fd_width,
    scott_width, fd_bins, scott_bins, sturges_bins)``; the *_bins
    counts are NULL when the corresponding width degenerates to 0.
    """
    s = df.select(F.col(value_col).cast("double").alias("v")) \
          .where(F.col("v").isNotNull())
    agg = s.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.min("v").alias("vmin"), F.max("v").alias("vmax"),
        (F.expr("percentile(v, 0.75)")
         - F.expr("percentile(v, 0.25)")).alias("iqr"),
        F.stddev_pop("v").alias("sigma"))
    rng = F.col("vmax") - F.col("vmin")
    fd_w = 2 * F.col("iqr") / F.col("n") ** (1.0 / 3.0)
    sc_w = 3.49 * F.col("sigma") / F.col("n") ** (1.0 / 3.0)
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round("vmin", round_to).alias("vmin"),
        F.round("vmax", round_to).alias("vmax"),
        F.round("iqr", round_to).alias("iqr"),
        F.round("sigma", round_to).alias("sigma"),
        F.round(fd_w, round_to).alias("fd_width"),
        F.round(sc_w, round_to).alias("scott_width"),
        F.when(fd_w > 0, F.ceil(rng / fd_w)).alias("fd_bins"),
        F.when(sc_w > 0, F.ceil(rng / sc_w)).alias("scott_bins"),
        (F.ceil(F.log2("n")) + 1).cast("long").alias("sturges_bins"))


def cvm_drift(df: DataFrame, value_col: str, *,
              split: Column,
              round_to: int = 6) -> DataFrame:
    """Two-sample Cramér-von Mises drift statistic (Anderson 1962)
    between the distributions of *value_col* under the boolean
    *split*:

        T = n·m/(n+m)² · Σ_pooled (F_A(x) − F_B(x))²

    summed over every pooled observation (each distinct value
    weighted by its total multiplicity) — the INTEGRATED squared CDF
    gap, between KS (max gap — one point of disagreement decides) and
    W₁ (linear gap — long thin tails dominate). T is scale-free, so
    one drift SLA threshold works across columns with different
    units; the family member to alert on when you want "overall
    shape moved" rather than "where" (binseg) or "how far" (W₁).

    Scale shape: identical to :func:`wasserstein_drift` — ONE hash
    aggregation to (value, count_a, count_b), windows over the
    distinct-value rows. Returns ``(t, n_a, n_b)``.
    """
    hist = (df.select(F.col(value_col).alias("v"),
                      F.when(split, 1).otherwise(0).alias("is_a"))
            .where(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.sum("is_a").alias("ca"),
                 F.sum(F.lit(1) - F.col("is_a")).alias("cb")))
    wall = Window.partitionBy()
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cdf = hist.select(
        (F.sum("ca").over(w) / F.sum("ca").over(wall)).alias("fa"),
        (F.sum("cb").over(w) / F.sum("cb").over(wall)).alias("fb"),
        (F.col("ca") + F.col("cb")).alias("m_tot"),
        F.sum("ca").over(wall).cast("double").alias("na"),
        F.sum("cb").over(wall).cast("double").alias("nb"))
    return cdf.agg(
        F.round(F.first("na") * F.first("nb")
                / (F.first("na") + F.first("nb")) ** 2
                * F.sum((F.col("fa") - F.col("fb")) ** 2
                        * F.col("m_tot")), round_to).alias("t"),
        F.first("na").cast("long").alias("n_a"),
        F.first("nb").cast("long").alias("n_b"))


def anova_oneway(df: DataFrame, value_col: str, *, by: str,
                 round_to: int = 6) -> DataFrame:
    """One-way ANOVA F-test across ALL groups (Fisher 1925) — does
    the mean of *value_col* differ between ANY of the *by* groups?
    The k-group generalization of :func:`welch_t` pairs: with
    between/within sums of squares,

        F = (SSB / (k−1)) / (SSW / (n−k))

    Computed from ONE aggregation to per-group (n, Σx, Σx²) — the
    textbook sufficient statistics, no second pass. Classic ANOVA
    assumes equal variances (use the pairwise Welch query when that
    is in doubt); here it serves as the one-number screen before
    drilling into pairs. Returns ``(k, n, ssb, ssw, df1, df2, f)``.
    """
    g = (df.where(F.col(value_col).isNotNull()
                  & F.col(by).isNotNull())
         .groupBy(by)
         .agg(F.count(F.lit(1)).cast("double").alias("ni"),
              F.sum(F.col(value_col).cast("double")).alias("si"),
              F.sum(F.col(value_col).cast("double") ** 2)
              .alias("qi")))
    agg = g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("ni").alias("n"),
        F.sum("si").alias("s"),
        F.sum("qi").alias("q"),
        F.sum(F.col("si") ** 2 / F.col("ni")).alias("sg"))
    ssb = F.col("sg") - F.col("s") ** 2 / F.col("n")
    ssw = F.col("q") - F.col("sg")
    df1 = F.col("k") - 1
    df2 = F.col("n") - F.col("k")
    f = F.when((df1 > 0) & (df2 > 0) & (ssw > 0),
               (ssb / df1) / (ssw / df2))
    return agg.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(ssb, round_to).alias("ssb"),
        F.round(ssw, round_to).alias("ssw"),
        df1.cast("long").alias("df1"),
        df2.cast("long").alias("df2"),
        F.round(f, round_to).alias("f"))


def tukey_hsd_pairs(df: DataFrame, value_col: str, *, by: str,
                    round_to: int = 6) -> DataFrame:
    """Tukey HSD pairwise q statistics (Tukey 1949) — the post-hoc
    drill-down after :func:`anova_oneway` says "some mean differs":
    for every group pair,

        q = |x̄_i − x̄_j| / √( MSW/2 · (1/n_i + 1/n_j) )

    with MSW the one-way within-group mean square (the
    Tukey-Kramer unequal-n form). The studentized-range critical
    value depends on (k, n−k) and a table lookup — deliberately NOT
    baked in; downstream compares q against its own α. Ranked by q
    desc, the pairs that drive the ANOVA signal.

    ONE aggregation to per-group (n, Σx, Σx²), then the pair join on
    |groups|² tiny rows. Returns ``(group_a, group_b, mean_a,
    mean_b, q)`` for a < b.
    """
    g = (df.where(F.col(value_col).isNotNull()
                  & F.col(by).isNotNull())
         .groupBy(F.col(by).alias("g"))
         .agg(F.count(F.lit(1)).cast("double").alias("ni"),
              F.avg(F.col(value_col).cast("double")).alias("mi"),
              F.sum(F.col(value_col).cast("double") ** 2)
              .alias("qi"),
              F.sum(F.col(value_col).cast("double")).alias("si")))
    msw = g.agg(
        ((F.sum("qi") - F.sum(F.col("si") ** 2 / F.col("ni")))
         / (F.sum("ni") - F.count(F.lit(1)))).alias("msw"))
    pairs = (g.alias("a")
             .join(g.alias("b"), F.col("a.g") < F.col("b.g"))
             .crossJoin(F.broadcast(msw)))
    q = (F.abs(F.col("a.mi") - F.col("b.mi"))
         / F.sqrt(F.col("msw") / 2
                  * (1 / F.col("a.ni") + 1 / F.col("b.ni"))))
    return pairs.select(
        F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"),
        F.round("a.mi", round_to).alias("mean_a"),
        F.round("b.mi", round_to).alias("mean_b"),
        F.round(q, round_to).alias("q"))


def brown_forsythe(df: DataFrame, value_col: str, *, by: str,
                   round_to: int = 6) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Brown & Forsythe
    1974; Levene's test with the MEDIAN center — the robust form) —
    the assumption check :func:`anova_oneway` needs: transform each
    value to z = |x − median(group)| and run the one-way F on z. A
    significant F says the groups' SPREADS differ, in which case the
    classic ANOVA F on means is untrustworthy and the pairwise
    Welch path is the right drill-down.

    Scale shape: one per-group exact median (interpolated percentile
    over the group — groups are the unit of monitoring, bounded), a
    broadcast join of |groups| medians back, then the one-pass
    ANOVA sufficient statistics on z. Returns the
    :func:`anova_oneway` row shape.
    """
    base = (df.where(F.col(value_col).isNotNull()
                     & F.col(by).isNotNull())
            .select(F.col(by).alias("g"),
                    F.col(value_col).cast("double").alias("x")))
    med = (base.groupBy("g")
           .agg(F.expr("percentile(x, 0.5)").alias("med")))
    z = (base.join(F.broadcast(med), "g")
         .select("g", F.abs(F.col("x") - F.col("med")).alias("z")))
    return anova_oneway(z, "z", by="g", round_to=round_to)


def power_advisor(df: DataFrame, flag: Column, *,
                  mde: float, alpha_z: float = 1.959964,
                  power_z: float = 0.841621,
                  round_to: int = 6) -> DataFrame:
    """Two-proportion sample-size calculator (the standard normal-
    approximation power formula, e.g. Fleiss, Levin & Paik 2003
    §4.2) seeded from the OBSERVED pass rate of *flag*: to detect an
    absolute shift of *mde* in the pass rate at two-sided α (z =
    ``alpha_z``, default 5%) with power (z = ``power_z``, default
    80%),

        n/group = ( z_α·√(2·p̄·(1−p̄)) + z_β·√(p₁q₁+p₂q₂) )² / δ²

    with p₁ the observed rate, p₂ = p₁+δ clamped to [0,1], p̄ their
    mean. This is the monitoring-design question a validation SLA
    must answer — "how many sampled docs until a 1-point pass-rate
    drop is detectable?" — priced from the corpus itself. ONE
    aggregation; the z quantiles are fixed literals (no stats
    library at runtime). Returns ``(n, p1, p2, mde, n_per_group)``.
    """
    if not 0 < mde < 1:
        raise ValueError(f"mde must be in (0,1), got {mde}")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.coalesce(flag.cast("boolean"), F.lit(False))
              .cast("double")).alias("p1"))
    p1 = F.col("p1")
    p2 = F.least(F.lit(1.0), F.greatest(F.lit(0.0),
                                        p1 + F.lit(float(mde))))
    pbar = (p1 + p2) / 2
    num = (F.lit(float(alpha_z))
           * F.sqrt(2 * pbar * (1 - pbar))
           + F.lit(float(power_z))
           * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
    npg = F.ceil(num / F.lit(float(mde)) ** 2)
    return agg.select(
        "n",
        F.round(p1, round_to).alias("p1"),
        F.round(p2, round_to).alias("p2"),
        F.lit(float(mde)).alias("mde"),
        npg.cast("long").alias("n_per_group"))


def classifier_prf(df: DataFrame, label_col: str, pred_col: str, *,
                   round_to: int = 6) -> DataFrame:
    """Per-class precision / recall / F1 from (label, prediction)
    pairs — the evaluation harness for any in-pipeline classifier
    (language-ID, quality gates, rule-suggestion) against declared
    labels: per class c, TP = both c, FP = predicted c but labeled
    otherwise, FN = labeled c but predicted otherwise.

    ONE (label, pred) aggregation (|classes|² max rows), then the
    per-class sums — corpus size enters once. NULL labels or
    predictions are excluded (they are coverage, not confusion).
    Returns ``(class, tp, fp, fn, precision, recall, f1)`` per class
    appearing in labels or predictions.
    """
    cm = (df.where(F.col(label_col).isNotNull()
                   & F.col(pred_col).isNotNull())
          .groupBy(F.col(label_col).alias("lbl"),
                   F.col(pred_col).alias("prd"))
          .agg(F.count(F.lit(1)).alias("c")))
    classes = (cm.select(F.col("lbl").alias("cls"))
               .union(cm.select("prd")).distinct())
    tp = (cm.where(F.col("lbl") == F.col("prd"))
          .select(F.col("lbl").alias("cls"),
                  F.col("c").alias("tp")))
    fp = (cm.where(F.col("lbl") != F.col("prd"))
          .groupBy(F.col("prd").alias("cls"))
          .agg(F.sum("c").alias("fp")))
    fn = (cm.where(F.col("lbl") != F.col("prd"))
          .groupBy(F.col("lbl").alias("cls"))
          .agg(F.sum("c").alias("fn")))
    j = (classes.join(tp, "cls", "left").join(fp, "cls", "left")
         .join(fn, "cls", "left")
         .select("cls",
                 F.coalesce("tp", F.lit(0)).alias("tp"),
                 F.coalesce("fp", F.lit(0)).alias("fp"),
                 F.coalesce("fn", F.lit(0)).alias("fn")))
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp")))
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn")))
    f1 = F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                2 * F.col("tp")
                / (2 * F.col("tp") + F.col("fp") + F.col("fn")))
    return j.select(
        F.col("cls").alias("class"), "tp", "fp", "fn",
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"))


def xcorr(df: DataFrame, x_col: str, y_col: str, order_col: str, *,
          max_lag: int = 3, round_to: int = 6) -> DataFrame:
    """Cross-correlation function between two aligned series — the
    lead/lag monitor: r(k) = Pearson corr(x_t, y_{t+k}) for k in
    [−max_lag, max_lag]. A peak at k > 0 says x LEADS y by k steps
    (views today predict purchases in k days); the k = 0 column is
    plain contemporaneous correlation. Sample Pearson on both
    engines.

    Same tiny-series contract as the other monitors (aggregate
    first); one lead/lag window per lag over the series rows.
    Returns ``(lag, n_pairs, r)`` ordered by lag.
    """
    s = df.select(F.col(order_col).alias("t"),
                  F.col(x_col).cast("double").alias("x"),
                  F.col(y_col).cast("double").alias("y")) \
          .where(F.col("t").isNotNull())
    w = Window.orderBy("t")
    outs = []
    for k in range(-int(max_lag), int(max_lag) + 1):
        shifted = (F.lead("y", k).over(w) if k >= 0
                   else F.lag("y", -k).over(w))
        pair = s.select("x", shifted.alias("ys")) \
                .where(F.col("ys").isNotNull()
                       & F.col("x").isNotNull())
        outs.append(pair.agg(
            F.lit(k).alias("lag"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("x", "ys"), round_to).alias("r")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def simpsons_check(df: DataFrame, x_col: str, y_col: str, *,
                   by: str, round_to: int = 6) -> DataFrame:
    """Simpson's-paradox screen (Simpson 1951): the pooled OLS slope
    of y on x versus each group's slope — when a group's slope sign
    CONTRADICTS the pooled sign, any corpus-level "longer docs score
    higher" conclusion silently reverses inside that stratum, the
    classic aggregation trap a per-table validator must surface
    before anyone acts on the pooled trend.

    ONE aggregation to per-group OLS sufficient statistics (n, Σx,
    Σy, Σxy, Σx²); pooled sums are the column totals — no second
    pass. Returns per-group ``(group, n, slope, pooled_slope,
    reversed)``; slope is NULL for degenerate (zero-x-variance)
    groups and `reversed` only fires on two well-defined opposite
    signs.
    """
    base = (df.where(F.col(x_col).isNotNull()
                     & F.col(y_col).isNotNull()
                     & F.col(by).isNotNull())
            .select(F.col(by).alias("g"),
                    F.col(x_col).cast("double").alias("x"),
                    F.col(y_col).cast("double").alias("y")))
    g = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") ** 2).alias("sxx"))
    tot = g.agg(F.sum("n").alias("tn"), F.sum("sx").alias("tx"),
                F.sum("sy").alias("ty"), F.sum("sxy").alias("txy"),
                F.sum("sxx").alias("txx"))
    pooled = F.when(
        F.col("tn") * F.col("txx") - F.col("tx") ** 2 > 0,
        (F.col("tn") * F.col("txy") - F.col("tx") * F.col("ty"))
        / (F.col("tn") * F.col("txx") - F.col("tx") ** 2))
    slope = F.when(
        F.col("n") * F.col("sxx") - F.col("sx") ** 2 > 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") ** 2))
    j = g.crossJoin(F.broadcast(tot))
    return j.select(
        F.col("g").alias("group"),
        F.col("n").cast("long").alias("n"),
        F.round(slope, round_to).alias("slope"),
        F.round(pooled, round_to).alias("pooled_slope"),
        (slope.isNotNull() & pooled.isNotNull()
         & (F.signum(slope) * F.signum(pooled) < 0))
        .alias("reversed"))


def durbin_watson(df: DataFrame, value_col: str, order_col: str, *,
                  round_to: int = 6) -> DataFrame:
    """Durbin-Watson serial-correlation statistic (Durbin & Watson
    1950) on the residuals of the OLS trend fit of *value_col* on
    *order_col*:

        DW = Σ (e_t − e_{t−1})² / Σ e_t²       (range 0..4)

    DW ≈ 2 means independent residuals; ≪ 2 positive autocorrelation
    (volume shocks persist — alert thresholds tuned on an iid
    assumption will misfire), ≫ 2 negative (oscillation, often a
    batching artifact). The diagnostic that says whether the OLS /
    z-score monitors' iid error assumption HOLDS on this feed.

    Tiny-series contract (aggregate first). OLS fit from sufficient
    statistics, residuals via one broadcast of the 2 coefficients,
    lag window for the differences. Returns ``(n, slope, intercept,
    dw)``.
    """
    s = df.select(F.col(order_col).cast("double").alias("t"),
                  F.col(value_col).cast("double").alias("x")) \
          .where(F.col("t").isNotNull() & F.col("x").isNotNull())
    fit = s.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("t").alias("st"), F.sum("x").alias("sx"),
        F.sum(F.col("t") * F.col("x")).alias("stx"),
        F.sum(F.col("t") ** 2).alias("stt"))
    slope = ((F.col("n") * F.col("stx") - F.col("st") * F.col("sx"))
             / (F.col("n") * F.col("stt") - F.col("st") ** 2))
    icept = (F.col("sx") - slope * F.col("st")) / F.col("n")
    coef = fit.select(F.col("n"), slope.alias("b"),
                      icept.alias("a"))
    res = (s.crossJoin(F.broadcast(coef))
           .select("t", (F.col("x") - F.col("a")
                         - F.col("b") * F.col("t")).alias("e"),
                   "n", "a", "b"))
    w = Window.orderBy("t")
    diff = res.select("n", "a", "b", "e",
                      (F.col("e") - F.lag("e").over(w)).alias("d"))
    return diff.agg(
        F.first("n").cast("long").alias("n"),
        F.round(F.first("b"), round_to).alias("slope"),
        F.round(F.first("a"), round_to).alias("intercept"),
        F.round(F.sum(F.col("d") ** 2) / F.sum(F.col("e") ** 2),
                round_to).alias("dw"))


def periodogram_at(df: DataFrame, value_col: str, order_col: str, *,
                   period: float = 7.0,
                   round_to: int = 6) -> DataFrame:
    """Single-frequency periodogram ordinate (Schuster 1898) — the
    spectral strength of a KNOWN candidate cycle, here defaulting to
    the weekly period: with the mean-centered series,

        a = Σ x̃_t·cos(2πt/P),  b = Σ x̃_t·sin(2πt/P)
        power = (a² + b²)·2/n,  share = power / Σ x̃²

    ``share`` ∈ [0, ~1] is the fraction of series variance the P-cycle
    explains — the one-number answer to "is this feed weekly-
    seasonal?" that :func:`weekly_seasonality` assumes rather than
    tests. No FFT machinery: one aggregation with cos/sin
    projections, exact on both engines. Returns ``(n, period, a, b,
    power, var_share)``.
    """
    s = df.select(F.col(order_col).cast("double").alias("t"),
                  F.col(value_col).cast("double").alias("x")) \
          .where(F.col("t").isNotNull() & F.col("x").isNotNull())
    m = s.agg(F.avg("x").alias("mu"))
    c = s.crossJoin(F.broadcast(m))
    ang = 2 * math.pi / float(period) * F.col("t")
    xt = F.col("x") - F.col("mu")
    agg = c.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xt * F.cos(ang)).alias("a"),
        F.sum(xt * F.sin(ang)).alias("b"),
        F.sum(xt ** 2).alias("ss"))
    power = (F.col("a") ** 2 + F.col("b") ** 2) * 2 / F.col("n")
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.lit(float(period)).alias("period"),
        F.round("a", round_to).alias("a"),
        F.round("b", round_to).alias("b"),
        F.round(power, round_to).alias("power"),
        F.round(F.when(F.col("ss") > 0, power / F.col("ss")), round_to)
         .alias("var_share"))


def cooks_distance(df: DataFrame, value_col: str, order_col: str, *,
                   round_to: int = 6) -> DataFrame:
    """Cook's distance influence diagnostics (Cook 1977) for the
    simple OLS trend fit of *value_col* on *order_col*: per point,
    leverage h = 1/n + (t−t̄)²/S_tt and

        D = e²·h / (p·s²·(1−h)²)        (p = 2, s² = SSE/(n−2))

    D ≳ 4/n marks a day that singlehandedly bends the trend line —
    the "which day do I investigate first" ranking after
    :func:`theil_sen` says the OLS slope is outlier-dragged.

    Tiny-series contract. One sufficient-statistics fit, residuals +
    leverages in one projection. Returns per-point ``(order, x,
    residual, leverage, cooks_d, influential)`` (threshold 4/n).
    """
    s = df.select(F.col(order_col).alias("order"),
                  F.col(order_col).cast("double").alias("t"),
                  F.col(value_col).cast("double").alias("x")) \
          .where(F.col("t").isNotNull() & F.col("x").isNotNull())
    fit = s.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("t").alias("st"), F.sum("x").alias("sx"),
        F.sum(F.col("t") * F.col("x")).alias("stx"),
        F.sum(F.col("t") ** 2).alias("stt"))
    slope = ((F.col("n") * F.col("stx") - F.col("st") * F.col("sx"))
             / (F.col("n") * F.col("stt") - F.col("st") ** 2))
    icept = (F.col("sx") - slope * F.col("st")) / F.col("n")
    coef = fit.select("n", slope.alias("b"), icept.alias("a"),
                      (F.col("st") / F.col("n")).alias("tbar"),
                      (F.col("stt") - F.col("st") ** 2 / F.col("n"))
                      .alias("s_tt"))
    base = (s.crossJoin(F.broadcast(coef))
            .withColumn("e", F.col("x") - F.col("a")
                        - F.col("b") * F.col("t"))
            .withColumn("h", 1 / F.col("n")
                        + (F.col("t") - F.col("tbar")) ** 2
                        / F.col("s_tt")))
    wall = Window.partitionBy()
    base = base.withColumn(
        "s2", F.sum(F.col("e") ** 2).over(wall) / (F.col("n") - 2))
    # s² = 0 (a perfect fit) must yield D = 0, not NaN — and Spark
    # orders NaN above every number, so an unguarded D would flag
    # every point of a perfectly regular feed as influential
    d = F.when(F.col("s2") > 0,
               F.col("e") ** 2 * F.col("h")
               / (2 * F.col("s2") * (1 - F.col("h")) ** 2)) \
         .otherwise(F.lit(0.0))
    return base.select(
        "order",
        F.round("x", round_to).alias("x"),
        F.round("e", round_to).alias("residual"),
        F.round("h", round_to).alias("leverage"),
        F.round(d, round_to).alias("cooks_d"),
        (d > 4 / F.col("n")).alias("influential"))


def negbin_fit(df: DataFrame, count_col: str, *,
               round_to: int = 6) -> DataFrame:
    """Negative-binomial method-of-moments fit (the standard
    overdispersion model for per-entity event counts; Hilbe 2011):
    with sample mean m and sample variance s²,

        r = m² / (s² − m),   p = m / s²     (valid iff s² > m)

    The dispersion ratio s²/m is the one-number verdict: ≈1 the feed
    is Poisson (a homogeneous process), ≫1 burst/heavy-user
    structure — the prior every per-entity rate threshold should be
    set against. Degenerate (s² ≤ m) fits return NULL r/p rather
    than a negative shape. ONE aggregation over the pre-aggregated
    per-entity counts. Returns ``(n, mean, var, dispersion_ratio,
    nb_r, nb_p)``.
    """
    s = df.select(F.col(count_col).cast("double").alias("x")) \
          .where(F.col("x").isNotNull())
    agg = s.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("m"),
        F.var_samp("x").alias("v"))
    r = F.when(F.col("v") > F.col("m"),
               F.col("m") ** 2 / (F.col("v") - F.col("m")))
    p = F.when(F.col("v") > F.col("m"), F.col("m") / F.col("v"))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round("m", round_to).alias("mean"),
        F.round("v", round_to).alias("var"),
        F.round(F.when(F.col("m") > 0, F.col("v") / F.col("m")),
                round_to).alias("dispersion_ratio"),
        F.round(r, round_to).alias("nb_r"),
        F.round(p, round_to).alias("nb_p"))


def cuped(df: DataFrame, pre_col: str, post_col: str, *,
          round_to: int = 6) -> DataFrame:
    """CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM
    2013) — the pre-period covariate adjustment every experimentation
    platform applies before comparing groups: with θ =
    cov(pre, post)/var(pre), the adjusted metric

        post' = post − θ·(pre − mean(pre))

    has variance var(post)·(1 − ρ²). The released numbers answer
    "how much smaller can my experiment be if I adjust": var_ratio =
    1 − ρ² (0.75 → a 25% sample-size saving at equal power,
    composing directly with :func:`power_advisor`). ONE aggregation
    over per-entity (pre, post) pairs; sample moments throughout.
    Returns ``(n, theta, rho, var_post, var_adjusted, var_ratio)``.
    """
    s = df.select(F.col(pre_col).cast("double").alias("a"),
                  F.col(post_col).cast("double").alias("b")) \
          .where(F.col("a").isNotNull() & F.col("b").isNotNull())
    agg = s.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.covar_samp("a", "b").alias("cab"),
        F.var_samp("a").alias("va"),
        F.var_samp("b").alias("vb"))
    theta = F.when(F.col("va") > 0, F.col("cab") / F.col("va"))
    rho = F.when((F.col("va") > 0) & (F.col("vb") > 0),
                 F.col("cab") / F.sqrt(F.col("va") * F.col("vb")))
    var_adj = F.when(rho.isNotNull(),
                     F.col("vb") * (1 - rho ** 2))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(theta, round_to).alias("theta"),
        F.round(rho, round_to).alias("rho"),
        F.round("vb", round_to).alias("var_post"),
        F.round(var_adj, round_to).alias("var_adjusted"),
        F.round(F.when(rho.isNotNull(), 1 - rho ** 2), round_to)
         .alias("var_ratio"))


def jackknife_groups(df: DataFrame, value_col: str, *, by: str,
                     round_to: int = 6) -> DataFrame:
    """Delete-one-GROUP jackknife (Quenouille 1956; Tukey 1958) for
    the corpus mean of *value_col*, leaving out one *by* group at a
    time — the variance estimate that respects cluster structure: at
    web scale rows within a host/source are correlated, so the naive
    iid SE of the mean is optimistically small; the jackknife over
    groups is the standard design-based correction.

        θ̂₍ᵢ₎ = mean without group i   (from totals — no second pass)
        SE²  = (g−1)/g · Σ (θ̂₍ᵢ₎ − mean(θ̂₍·₎))²

    ONE aggregation to per-group (n, Σx); every leave-one-out mean
    is (T−Σxᵢ)/(N−nᵢ). Returns one row ``(g, n, mean, se_naive,
    se_jackknife, design_ratio)`` — design_ratio > 1 quantifies the
    clustering penalty.
    """
    g = (df.where(F.col(value_col).isNotNull()
                  & F.col(by).isNotNull())
         .groupBy(by)
         .agg(F.count(F.lit(1)).cast("double").alias("ni"),
              F.sum(F.col(value_col).cast("double")).alias("si"),
              F.sum(F.col(value_col).cast("double") ** 2)
              .alias("qi")))
    tot = g.agg(F.count(F.lit(1)).cast("double").alias("gn"),
                F.sum("ni").alias("n"), F.sum("si").alias("s"),
                F.sum("qi").alias("q"))
    loo = (g.crossJoin(F.broadcast(tot))
           .select("gn", "n", "s", "q",
                   ((F.col("s") - F.col("si"))
                    / (F.col("n") - F.col("ni"))).alias("theta")))
    agg = loo.agg(
        F.first("gn").alias("gn"), F.first("n").alias("n"),
        F.first("s").alias("s"), F.first("q").alias("q"),
        F.avg("theta").alias("tbar"),
        F.sum(F.col("theta") ** 2).alias("t2"))
    se_jk = F.sqrt((F.col("gn") - 1) / F.col("gn")
                   * (F.col("t2") - F.col("gn")
                      * F.col("tbar") ** 2))
    var = (F.col("q") - F.col("s") ** 2 / F.col("n")) \
        / (F.col("n") - 1)
    se_naive = F.sqrt(var / F.col("n"))
    return agg.select(
        F.col("gn").cast("long").alias("g"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("s") / F.col("n"), round_to).alias("mean"),
        F.round(se_naive, round_to).alias("se_naive"),
        F.round(se_jk, round_to).alias("se_jackknife"),
        F.round(F.when(se_naive > 0, se_jk / se_naive), round_to)
         .alias("design_ratio"))


def markov_entropy_rate(df: DataFrame, state_col: str,
                        order_col, *, by: str,
                        round_to: int = 6) -> DataFrame:
    """Empirical Markov entropy rate of per-entity state streams —
    the conditional entropy H(next | current) over observed
    transitions (Shannon 1948 §7, the entropy of the source given
    first-order structure), pooled across all *by* entities:

        H = −Σ_{i,j} p(i,j) · log₂ p(j|i)        (bits/transition)

    Compared against the marginal state entropy H(next): the gap is
    how much the previous state PREDICTS the next one — a bot's
    scripted loop shows H ≪ H(next) while organic traffic stays
    near-independent. One lag window per entity stream + two
    aggregations over the |states|² transition table. Returns one
    row ``(n_transitions, n_states, h_rate, h_marginal,
    predictability)``. *order_col* may be a list — pass a tiebreaker
    (e.g. ``["ts", "event_id"]``): with timestamp ties the stream
    order, hence the transition counts, would otherwise be
    nondeterministic.
    """
    order_cols = ([order_col] if isinstance(order_col, str)
                  else list(order_col))
    w = Window.partitionBy(by).orderBy(*order_cols)
    tr = (df.where(F.col(state_col).isNotNull()
                   & F.col(by).isNotNull())
          .select(F.col(state_col).alias("cur"),
                  F.lead(state_col).over(w).alias("nxt"))
          .where(F.col("nxt").isNotNull()))
    cnt = tr.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    row = cnt.groupBy("cur").agg(F.sum("c").alias("rc"))
    tot = cnt.agg(F.sum("c").alias("n"))
    j = (cnt.join(F.broadcast(row), "cur")
         .crossJoin(F.broadcast(tot)))
    pij = F.col("c") / F.col("n")
    pji = F.col("c") / F.col("rc")
    hr = j.agg(
        F.first("n").alias("n"),
        (-F.sum(pij * F.log2(pji))).alias("h_rate"))
    marg = (tr.groupBy("nxt").agg(F.count(F.lit(1)).alias("mc"))
            .crossJoin(F.broadcast(tot)))
    hm = marg.agg(
        F.count(F.lit(1)).alias("ns"),
        (-F.sum((F.col("mc") / F.col("n"))
                * F.log2(F.col("mc") / F.col("n")))).alias("h_m"))
    out = hr.crossJoin(F.broadcast(hm))
    return out.select(
        F.col("n").cast("long").alias("n_transitions"),
        F.col("ns").cast("long").alias("n_states"),
        F.round("h_rate", round_to).alias("h_rate"),
        F.round("h_m", round_to).alias("h_marginal"),
        F.round(F.when(F.col("h_m") > 0,
                       1 - F.col("h_rate") / F.col("h_m")),
                round_to).alias("predictability"))


def rolling_reach(df: DataFrame, ts_col: str, id_col: str, *,
                  window_days: int = 7,
                  round_to: int = 6) -> DataFrame:
    """Rolling distinct reach — DAU, WAU and the DAU/WAU stickiness
    ratio per day: WAU(d) = |distinct ids active in [d−6, d]|. The
    canonical engagement/intake-health triple; a stickiness drop
    with stable DAU means the feed is churning through NEW entities
    (bot swarm or id-rotation), invisible to plain counts.

    Exact rolling DISTINCT does not decompose into a running sum, so
    the window is a bounded range join: the distinct (day, id) frame
    joined to the day list within *window_days* — cost |days|·|daily
    ids|, with the day side tiny after the first aggregation.
    Returns ``(day, dau, wau, stickiness)`` per day.
    """
    du = (df.where(F.col(ts_col).isNotNull()
                   & F.col(id_col).isNotNull())
          .select(F.to_date(ts_col).alias("d"),
                  F.col(id_col).alias("u"))
          .distinct())
    dau = du.groupBy(F.col("d").alias("day")) \
            .agg(F.countDistinct("u").alias("dau"))
    days = du.select(F.col("d").alias("day")).distinct()
    wau = (days.join(du, (F.col("d") <= F.col("day"))
                     & (F.col("d") >= F.date_sub(
                         F.col("day"), int(window_days) - 1)))
           .groupBy("day").agg(F.countDistinct("u").alias("wau")))
    return (dau.join(wau, "day")
            .select("day", "dau", "wau",
                    F.round(F.col("dau") / F.col("wau"), round_to)
                     .alias("stickiness")))


def new_vs_returning(df: DataFrame, ts_col: str, id_col: str, *,
                     round_to: int = 6) -> DataFrame:
    """New-vs-returning split per day: an id is NEW on its first
    active day (within the observed window) and RETURNING after —
    the intake-mix monitor: a new-share spike is an acquisition
    event or an id-rotation attack; either way the per-entity
    baselines (negbin, rate caps) need re-fitting.

    Two aggregations: first-seen day per id, then the per-day
    distinct-active counts split on it. Returns ``(day, n_active,
    n_new, n_returning, new_share)``.
    """
    du = (df.where(F.col(ts_col).isNotNull()
                   & F.col(id_col).isNotNull())
          .select(F.to_date(ts_col).alias("day"),
                  F.col(id_col).alias("u"))
          .distinct())
    first = du.groupBy("u").agg(F.min("day").alias("first_day"))
    j = du.join(F.broadcast(first), "u")
    return (j.groupBy("day")
            .agg(F.countDistinct("u").alias("n_active"),
                 F.countDistinct(
                     F.when(F.col("day") == F.col("first_day"),
                            F.col("u"))).alias("n_new"),
                 F.countDistinct(
                     F.when(F.col("day") != F.col("first_day"),
                            F.col("u"))).alias("n_returning"))
            .withColumn("new_share",
                        F.round(F.col("n_new") / F.col("n_active"),
                                round_to)))


def ljung_box(df: DataFrame, value_col: str, order_col: str, *,
              max_lag: int = 7, round_to: int = 6) -> DataFrame:
    """Ljung-Box portmanteau autocorrelation test (Ljung & Box 1978)
    over the series ordered by *order_col*: per lag k the sample
    autocorrelation r_k of the mean-centered series, and the
    accumulated statistic

        Q(m) = n(n+2) · Σ_{k≤m} r_k² / (n−k)   ~  χ²(m) under iid

    — the MULTI-lag complement to Durbin-Watson (which sees only lag
    1): weekly echo at lag 7 shows up here while DW stays near 2.
    Compare the last row's q_cum against the χ²(max_lag) quantile.

    Tiny-series contract. One centering pass, one lag window per k
    over the series rows. Returns per-lag rows ``(lag, r, q_cum)``.
    """
    s = df.select(F.col(order_col).alias("t"),
                  F.col(value_col).cast("double").alias("x")) \
          .where(F.col("t").isNotNull() & F.col("x").isNotNull())
    m = s.agg(F.avg("x").alias("mu"),
              F.count(F.lit(1)).cast("double").alias("n"))
    c = (s.crossJoin(F.broadcast(m))
         .select("t", (F.col("x") - F.col("mu")).alias("e"), "n"))
    w = Window.orderBy("t")
    outs = []
    for k in range(1, int(max_lag) + 1):
        pair = c.select("e", F.lag("e", k).over(w).alias("el"), "n")
        outs.append(pair.agg(
            F.lit(k).alias("lag"),
            (F.sum(F.col("e") * F.col("el"))
             / F.sum(F.col("e") ** 2)).alias("r"),
            F.first("n").alias("n")))
    acf = outs[0]
    for o in outs[1:]:
        acf = acf.unionAll(o)
    wq = (Window.orderBy("lag")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    term = F.col("r") ** 2 / (F.col("n") - F.col("lag"))
    return acf.select(
        "lag",
        F.round("r", round_to).alias("r"),
        F.round(F.col("n") * (F.col("n") + 2)
                * F.sum(term).over(wq), round_to).alias("q_cum"))


def capture_recapture(df: DataFrame, id_col: str, *,
                      in_a: Column, in_b: Column,
                      round_to: int = 6) -> DataFrame:
    """Chapman-corrected Lincoln-Petersen capture-recapture estimate
    (Chapman 1951) of a population's true size from two overlapping
    observation passes — the crawl-completeness question: if crawl A
    saw n₁ urls, crawl B saw n₂, and m appeared in both,

        N̂  = (n₁+1)(n₂+1)/(m+1) − 1
        SE² = (n₁+1)(n₂+1)(n₁−m)(n₂−m) / ((m+1)²(m+2))

    Validity rests on the passes sampling independently — ids must
    not coordinate between passes. ONE aggregation over distinct ids
    with two membership flags. Returns ``(n_universe, n_a, n_b,
    n_both, n_hat, se)`` — n_universe (the observed union) is the
    audit column the estimate should bracket at small scale.
    """
    base = (df.select(F.col(id_col).alias("i"),
                      in_a.alias("a"), in_b.alias("b"))
            .where(F.col("i").isNotNull())
            .groupBy("i")
            .agg(F.max("a").alias("a"), F.max("b").alias("b")))
    agg = base.agg(
        F.sum(F.when(F.col("a") | F.col("b"), 1).otherwise(0))
         .cast("double").alias("u"),
        F.sum(F.when(F.col("a"), 1).otherwise(0))
         .cast("double").alias("n1"),
        F.sum(F.when(F.col("b"), 1).otherwise(0))
         .cast("double").alias("n2"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
         .cast("double").alias("m"))
    nhat = ((F.col("n1") + 1) * (F.col("n2") + 1)
            / (F.col("m") + 1) - 1)
    se = F.sqrt((F.col("n1") + 1) * (F.col("n2") + 1)
                * (F.col("n1") - F.col("m"))
                * (F.col("n2") - F.col("m"))
                / ((F.col("m") + 1) ** 2 * (F.col("m") + 2)))
    return agg.select(
        F.col("u").cast("long").alias("n_universe"),
        F.col("n1").cast("long").alias("n_a"),
        F.col("n2").cast("long").alias("n_b"),
        F.col("m").cast("long").alias("n_both"),
        F.round(nhat, round_to).alias("n_hat"),
        F.round(se, round_to).alias("se"))


def shift_share(df: DataFrame, value_col: str, *, by: str,
                period: Column, round_to: int = 6) -> DataFrame:
    """Shift-share decomposition of a volume change between two
    periods (the regional-economics standard, Dunn 1960, applied to
    feed monitoring): with segment totals v₀/v₁ and grand totals
    T₀/T₁, each segment's change splits into

        growth effect = v₀·(T₁/T₀ − 1)     (its share of overall)
        mix effect    = v₁ − v₀·(T₁/T₀)    (segment-specific shift)

    Σ mix = 0 by construction — a nonzero mix is REDISTRIBUTION, not
    growth, which is exactly the triage question when total volume
    looks flat but one event type quietly ate another.

    *period* is a boolean Column (False → period 0, True → 1). ONE
    aggregation to per-segment (v0, v1). Returns ``(segment, v0, v1,
    delta, growth_effect, mix_effect)``.
    """
    g = (df.where(F.col(by).isNotNull())
         .groupBy(F.col(by).alias("segment"))
         .agg(F.sum(F.when(~period,
                           F.col(value_col).cast("double"))
                    .otherwise(0.0)).alias("v0"),
              F.sum(F.when(period,
                           F.col(value_col).cast("double"))
                    .otherwise(0.0)).alias("v1")))
    tot = g.agg(F.sum("v0").alias("t0"), F.sum("v1").alias("t1"))
    j = g.crossJoin(F.broadcast(tot))
    ratio = F.col("t1") / F.col("t0")
    return j.select(
        "segment",
        F.round("v0", round_to).alias("v0"),
        F.round("v1", round_to).alias("v1"),
        F.round(F.col("v1") - F.col("v0"), round_to).alias("delta"),
        F.round(F.col("v0") * (ratio - 1), round_to)
         .alias("growth_effect"),
        F.round(F.col("v1") - F.col("v0") * ratio, round_to)
         .alias("mix_effect"))


def record_days(df: DataFrame, value_col: str, order_col: str, *,
                round_to: int = 6) -> DataFrame:
    """Record-count anomaly check (classical records theory, Rényi
    1962): in an iid series the k-th observation is a running
    maximum with probability 1/k, so the expected number of records
    is the harmonic number H_n ≈ ln n + γ. A record count well above
    H_n means the series TRENDS (each step beats the last — a
    runaway counter, a cumulative column leaked into a rate field);
    well below, the early values are implausibly large (backfill
    contamination). Distribution-free: no variance estimate to tune.

    Tiny-series contract. One running-max window + one row-number
    sum for H_n. Returns ``(n, n_records, expected_records,
    excess)``.
    """
    s = df.select(F.col(order_col).alias("t"),
                  F.col(value_col).cast("double").alias("x")) \
          .where(F.col("t").isNotNull() & F.col("x").isNotNull())
    w = (Window.orderBy("t")
         .rowsBetween(Window.unboundedPreceding, -1))
    rn = Window.orderBy("t")
    base = s.select(
        F.when(F.max("x").over(w).isNull()
               | (F.col("x") > F.max("x").over(w)), 1)
         .otherwise(0).alias("rec"),
        (1.0 / F.row_number().over(rn)).alias("inv_k"))
    return base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rec").cast("long").alias("n_records"),
        F.round(F.sum("inv_k"), round_to).alias("expected_records"),
        F.round(F.sum("rec") - F.sum("inv_k"), round_to)
         .alias("excess"))


def c_chart(df: DataFrame, value_col: str, order_col: str, *,
            baseline: Column, round_to: int = 6) -> DataFrame:
    """Shewhart c-chart for count data (the SPC standard, Shewhart
    1931; counts assumed Poisson so σ = √c̄): center line c̄ = mean
    of the *baseline* points, control limits c̄ ± 3√c̄ (LCL floored
    at 0), every point flagged against them. The FIXED-baseline
    member of the monitoring family: Page-Hinkley self-references
    and adapts; a c-chart holds the commissioning window constant so
    slow drift cannot recalibrate itself away.

    Tiny-series contract. One baseline aggregation broadcast into
    the per-point projection. Returns ``(order, x, center, ucl,
    lcl, out_of_control)`` per point.
    """
    s = df.select(F.col(order_col).alias("order"),
                  F.col(value_col).cast("double").alias("x"),
                  baseline.alias("is_base")) \
          .where(F.col("order").isNotNull() & F.col("x").isNotNull())
    base = s.where(F.col("is_base")).agg(F.avg("x").alias("c"))
    j = s.crossJoin(F.broadcast(base))
    ucl = F.col("c") + 3 * F.sqrt(F.col("c"))
    lcl = F.greatest(F.lit(0.0), F.col("c") - 3 * F.sqrt(F.col("c")))
    return j.select(
        "order",
        F.round("x", round_to).alias("x"),
        F.round("c", round_to).alias("center"),
        F.round(ucl, round_to).alias("ucl"),
        F.round(lcl, round_to).alias("lcl"),
        ((F.col("x") > ucl) | (F.col("x") < lcl))
        .alias("out_of_control"))


def unit_mix_detector(df: DataFrame, value_col: str, *, by: str,
                      share_threshold: float = 0.2,
                      round_to: int = 6) -> DataFrame:
    """Unit-confusion detector per group — the ms-vs-seconds bug:
    when part of a feed reports a quantity in different units, the
    value distribution splits into clusters ~3 log-decades apart.
    Bucket positive values by ⌊log₁₀⌋, flag a group whose decade
    histogram has TWO OR MORE buckets above *share_threshold* with a
    gap ≥ 2 decades between them — ordinary heavy-tailed data fills
    adjacent decades; a detached second mode is a unit mix.

    One hash aggregation to (group, decade) counts, windows over
    those tiny rows. Returns per-group ``(group, n, n_decades,
    top_decade, top_share, second_decade, second_share, unit_mix)``
    where second_* is the strongest bucket ≥2 decades from the top.
    """
    base = (df.where(F.col(by).isNotNull()
                     & (F.col(value_col).cast("double") > 0))
            .select(F.col(by).alias("group"),
                    # round log10 to 9 dp before flooring: at exact
                    # powers of ten the engines' libm may differ by
                    # 1 ulp and flip the bucket
                    F.floor(F.round(
                        F.log10(F.col(value_col).cast("double")), 9))
                    .cast("long").alias("dec")))
    cnt = base.groupBy("group", "dec").agg(
        F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("group").agg(F.sum("c").alias("n"),
                                   F.count(F.lit(1)).alias("nd"))
    j = cnt.join(F.broadcast(tot), "group") \
           .withColumn("share", F.col("c") / F.col("n"))
    w = Window.partitionBy("group").orderBy(
        F.desc("share"), F.asc("dec"))
    top = (j.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1)
           .select("group", F.col("dec").alias("top_decade"),
                   F.col("share").alias("top_share"),
                   "n", "nd"))
    far = (j.join(top.select("group", "top_decade"), "group")
           .where(F.abs(F.col("dec") - F.col("top_decade")) >= 2))
    w2 = Window.partitionBy("group").orderBy(
        F.desc("share"), F.asc("dec"))
    second = (far.withColumn("rn", F.row_number().over(w2))
              .where(F.col("rn") == 1)
              .select("group", F.col("dec").alias("second_decade"),
                      F.col("share").alias("second_share")))
    thr = float(share_threshold)
    return (top.join(second, "group", "left")
            .select("group",
                    F.col("n").cast("long").alias("n"),
                    F.col("nd").cast("long").alias("n_decades"),
                    "top_decade",
                    F.round("top_share", round_to).alias("top_share"),
                    "second_decade",
                    F.round("second_share", round_to)
                     .alias("second_share"),
                    (F.coalesce(F.col("second_share"), F.lit(0.0))
                     >= thr).alias("unit_mix")))


def event_echo_audit(df: DataFrame, *, by: str, ts_col: str,
                     state_cols: "Sequence[str]",
                     max_gap_seconds: float = 2.0,
                     round_to: int = 6) -> DataFrame:
    """Duplicate-beacon echo audit — the double-firing client bug:
    an event whose *state_cols* exactly repeat the PREVIOUS event of
    the same entity within *max_gap_seconds* is an echo, not new
    behavior. Retry storms and at-least-once delivery both produce
    this signature; counting it separates "volume grew" from "the
    SDK started double-sending".

    One lag window per entity stream (ordered by ts then the state
    columns for tie determinism), one aggregation. Returns one row
    ``(n_events, n_echoes, echo_share, n_entities_affected)``.
    """
    order_cols = [F.col(ts_col)] + [F.col(c) for c in state_cols]
    w = Window.partitionBy(by).orderBy(*order_cols)
    same = None
    for c in state_cols:
        eq = F.col(c).eqNullSafe(F.lag(c).over(w))
        same = eq if same is None else (same & eq)
    # NTZ timestamps refuse a direct double cast — go via timestamp
    secs = F.col(ts_col).cast("timestamp").cast("double")
    gap = secs - F.lag(secs).over(w)
    base = (df.where(F.col(by).isNotNull()
                     & F.col(ts_col).isNotNull())
            .select(F.col(by).alias("e"),
                    (same & (gap <= float(max_gap_seconds)))
                    .alias("echo")))
    return base.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("echo"), 1).otherwise(0))
         .alias("n_echoes"),
        F.round(F.sum(F.when(F.col("echo"), 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"), round_to)
         .alias("echo_share"),
        F.countDistinct(F.when(F.col("echo"), F.col("e")))
         .alias("n_entities_affected"))


def id_continuity_audit(df: DataFrame, id_col: str, *,
                        round_to: int = 6) -> DataFrame:
    """Sequence-continuity audit for numeric surrogate ids — the
    completeness check a monotoneously-assigned id column makes
    free: with span = max − min + 1,

        n_missing    = span − n_distinct      (dropped rows)
        n_duplicated = n_rows − n_distinct    (double ingestion)

    plus the largest internal gap and where it starts — one
    coherent hole is a lost batch; missing ids sprinkled uniformly
    are a lossy channel. One aggregation + one lag window over the
    DISTINCT ids. Returns ``(n_rows, n_distinct, id_min, id_max,
    n_missing, n_duplicated, max_gap, gap_start)``.
    """
    ids = df.select(F.col(id_col).cast("long").alias("i")) \
            .where(F.col("i").isNotNull())
    dist = ids.distinct()
    w = Window.orderBy("i")
    gaps = dist.select(
        "i", (F.col("i") - F.lag("i").over(w) - 1).alias("g"),
        F.lag("i").over(w).alias("prev"))
    # single-row gap summary even when NO gap exists (agg over an
    # empty filter yields one NULL row — no driver-side count())
    gap = (gaps.where(F.col("g") > 0)
           .agg(F.max(F.struct(F.col("g"),
                               (-F.col("prev")).alias("np")))
                .alias("m"))
           .select(F.col("m.g").alias("max_gap"),
                   (-F.col("m.np") + 1).alias("gap_start")))
    agg = ids.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("i").alias("n_distinct"),
        F.min("i").alias("id_min"), F.max("i").alias("id_max"))
    out = agg.crossJoin(F.broadcast(gap))
    return out.select(
        "n_rows", "n_distinct", "id_min", "id_max",
        (F.col("id_max") - F.col("id_min") + 1
         - F.col("n_distinct")).alias("n_missing"),
        (F.col("n_rows") - F.col("n_distinct")).alias("n_duplicated"),
        "max_gap", "gap_start")


def partition_balance(df: DataFrame, key_col: str, *,
                      n_buckets: int = 32,
                      round_to: int = 6) -> DataFrame:
    """Hash-partition balance audit for a candidate shuffle key —
    the pre-flight for the north rule's explicit partitioning: rows
    bucketed by a PORTABLE md5-derived hash (so the oracle agrees;
    engine-native hashes differ), then the skew facts a partition
    plan needs: max/mean bucket ratio (straggler factor), empty
    buckets (wasted executors), and the χ² against uniform (dof =
    buckets − 1). A key whose skew ratio is ≫1 needs salting before
    it becomes a groupBy/join key at scale.

    ONE hash aggregation to n_buckets rows. Returns one row
    ``(n, n_buckets, max_bucket, min_bucket, skew_ratio,
    n_empty_buckets, chi2)``.
    """
    nb = int(n_buckets)
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                           1, 8), 16, 10).cast("long"),
        F.lit(nb))
    cnt = (df.where(F.col(key_col).isNotNull())
           .groupBy(bucket.alias("b"))
           .agg(F.count(F.lit(1)).alias("c")))
    agg = cnt.agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("nb_seen"),
        F.max("c").alias("mx"), F.min("c").alias("mn"),
        F.sum(F.col("c") ** 2).alias("c2"))
    exp = F.col("n") / nb
    # chi2 over ALL nb buckets incl. empties:
    # sum((c-e)^2/e) = (sum c^2 - 2e*sum c + nb*e^2)/e = c2/e - n
    chi2 = F.col("c2") / exp - F.col("n")
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.lit(nb).alias("n_buckets"),
        F.col("mx").cast("long").alias("max_bucket"),
        F.when(F.col("nb_seen") < nb, F.lit(0))
         .otherwise(F.col("mn")).cast("long").alias("min_bucket"),
        F.round(F.col("mx") / exp, round_to).alias("skew_ratio"),
        (F.lit(nb) - F.col("nb_seen")).cast("long")
         .alias("n_empty_buckets"),
        F.round(chi2, round_to).alias("chi2"))


def decile_shift(df: DataFrame, value_col: str, *,
                 split: Column, round_to: int = 6) -> DataFrame:
    """Per-decile quantile shift table between the two split halves
    — WHERE in the distribution the drift lives: exact interpolated
    q10..q90 for A and B and their differences. A pure location
    shift moves every decile equally; a tail event moves only q90 —
    the drill-down after w1/cvm/energy say "something moved".

    Two exact percentile aggregations (the advisor-grade exact form;
    bin first at the 10¹²-row scale). Returns 9 rows ``(decile, q_a,
    q_b, shift)``.
    """
    base = df.select(F.col(value_col).cast("double").alias("v"),
                     split.alias("s")) \
             .where(F.col("v").isNotNull())
    outs = []
    for d in range(1, 10):
        p = d / 10.0
        qa = base.where(F.col("s")).agg(
            F.expr(f"percentile(v, {p})").alias("qa"))
        qb = base.where(~F.col("s")).agg(
            F.expr(f"percentile(v, {p})").alias("qb"))
        outs.append(
            qa.crossJoin(F.broadcast(qb)).select(
                F.lit(d * 10).alias("decile"),
                F.round("qa", round_to).alias("q_a"),
                F.round("qb", round_to).alias("q_b"),
                F.round(F.col("qb") - F.col("qa"), round_to)
                 .alias("shift")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def heavy_hitters(df: DataFrame, item_col: str, *,
                  k: int = 8, round_to: int = 6) -> DataFrame:
    """Exact φ-heavy hitters (φ = 1/k) via the two-phase
    Misra-Gries / "local frequent" pattern: phase 1 runs a
    per-partition candidate pass inside ``mapInPandas`` emitting every
    item whose LOCAL count exceeds n_partition/k — by pigeonhole an
    item with global count > N/k must exceed the local threshold in
    at least one partition, so the candidate union is a guaranteed
    superset of the true heavy hitters while staying ≤ (k−1) items
    per partition. Phase 2 verifies candidates EXACTLY: a broadcast
    semi-join restricts the count shuffle to candidate-matching rows,
    then the global threshold N/k filters.

    This is the shape that survives 10^12 rows with ~10^9 distinct
    keys: the full-cardinality groupBy shuffle never happens — only
    candidate rows (a vanishing fraction) are shuffled, and the
    candidate list itself is tiny (partitions × k). Output is exact
    and partitioning-invariant. Returns ``(item, cnt, share)`` for
    every item with cnt > N/k.
    """
    kk = int(k)
    base = (df.select(F.col(item_col).cast("string").alias("item"))
            .where(F.col("item").isNotNull()))

    def _local_frequent(batches):
        import pandas as pd
        counts = None
        for b in batches:
            vc = b["item"].value_counts()
            counts = vc if counts is None else counts.add(vc,
                                                          fill_value=0)
        if counts is None:
            return
        thresh = float(counts.sum()) / kk
        hits = counts[counts > thresh]
        yield pd.DataFrame({"item": hits.index.astype(str)})

    cand = base.mapInPandas(_local_frequent,
                            schema="item string").distinct()
    exact = (base.join(F.broadcast(cand), "item")
             .groupBy("item").agg(F.count(F.lit(1)).alias("cnt")))
    tot = base.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (exact.crossJoin(F.broadcast(tot))
            .where(F.col("cnt") > F.col("n") / kk)
            .select("item", "cnt",
                    F.round(F.col("cnt") / F.col("n"), round_to)
                     .alias("share")))


def lorenz_curve(df: DataFrame, unit_col: str, *,
                 value_col: str | None = None,
                 round_to: int = 6) -> DataFrame:
    """Lorenz concentration curve at the decile grid — the drill-down
    behind a Gini scalar (:func:`gini`): the share of total volume
    held by the bottom 10%, 20%, …, 100% of units, units ranked by
    their volume ascending (ties broken by unit id, so the curve is
    deterministic). ``value_col=None`` counts rows per unit (event
    volume); otherwise sums it. "Bottom 10% of users produce 0.4% of
    events, top 10% produce 62%" is this table's two ends.

    One per-unit aggregation (the only full shuffle), then a window
    over the UNIT frame — small relative to raw rows, but at ~10^9
    units bin the per-unit totals into a value histogram first and
    integrate that instead (same trade the decile/quantile helpers
    document). Returns 10 rows ``(decile, cut_rank, unit_share,
    value_share)`` where cut_rank = ⌈n_units·d/10⌉.
    """
    val = (F.count(F.lit(1)) if value_col is None
           else F.sum(F.col(value_col).cast("double")))
    u = (df.where(F.col(unit_col).isNotNull())
         .groupBy(F.col(unit_col).alias("unit"))
         .agg(val.cast("double").alias("t")))
    w = Window.orderBy("t", "unit")
    r = u.select(
        "t", F.row_number().over(w).alias("rn"),
        F.sum("t").over(w.rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)).alias("cum"))
    a = u.agg(F.count(F.lit(1)).alias("nu"), F.sum("t").alias("tot"))
    d = df.sparkSession.range(1, 11).select(F.col("id").alias("d"))
    cut = F.ceil(F.col("nu") * F.col("d") / 10.0)
    return (d.crossJoin(F.broadcast(a))
            .join(r, F.col("rn") == cut)
            .select((F.col("d") * 10).cast("int").alias("decile"),
                    cut.cast("long").alias("cut_rank"),
                    F.round(cut / F.col("nu"), round_to)
                     .alias("unit_share"),
                    F.round(F.col("cum") / F.col("tot"), round_to)
                     .alias("value_share"))
            .orderBy("decile"))


def cochran_armitage(df: DataFrame, *, flag: Column, score: Column,
                     round_to: int = 6) -> DataFrame:
    """Cochran-Armitage test for trend (Cochran 1954, Armitage 1955)
    in a binary rate across ORDERED strata — "is the error share
    DRIFTING with day / length decile / crawl depth", the question
    the unordered chi² independence test cannot ask and the
    two-group z-test can only ask pairwise. With strata score s_j,
    size n_j, successes x_j and pooled rate p̄ = X/N:

        T      = Σ s_j x_j − p̄ Σ s_j n_j
        Var(T) = p̄(1−p̄) · (Σ n_j s_j² − (Σ n_j s_j)²/N)
        Z      = T / √Var(T)      ~ N(0,1) under no-trend

    |Z| > 1.96 rejects flat at 5%; Z's sign is the trend direction.
    ONE groupBy(score) partial-agg + one single-row closing
    aggregation — nothing here scales with rows beyond the first
    scan. Returns one row ``(n, x, p_bar, t_stat, var_t, z)``.
    """
    s = df.select(score.cast("double").alias("s"),
                  F.when(flag, 1.0).otherwise(0.0).alias("f")) \
          .where(F.col("s").isNotNull())
    g = s.groupBy("s").agg(F.count(F.lit(1)).cast("double").alias("n"),
                           F.sum("f").alias("x"))
    a = g.agg(F.sum("n").alias("nn"), F.sum("x").alias("xx"),
              F.sum(F.col("n") * F.col("s")).alias("ns"),
              F.sum(F.col("n") * F.col("s") ** 2).alias("ns2"),
              F.sum(F.col("x") * F.col("s")).alias("xs"))
    p = F.col("xx") / F.col("nn")
    t = F.col("xs") - p * F.col("ns")
    var = p * (1 - p) * (F.col("ns2")
                         - F.col("ns") ** 2 / F.col("nn"))
    return a.select(
        F.col("nn").cast("long").alias("n"),
        F.col("xx").cast("long").alias("x"),
        F.round(p, round_to).alias("p_bar"),
        F.round(t, round_to).alias("t_stat"),
        F.round(var, round_to).alias("var_t"),
        F.round(t / F.sqrt(var), round_to).alias("z"))


def kruskal_wallis(df: DataFrame, value_col: str, group_col: str, *,
                   round_to: int = 6) -> DataFrame:
    """Kruskal-Wallis H rank test (Kruskal & Wallis 1952) of
    *value_col* across ALL groups — the k-sample extension of
    Mann-Whitney and the nonparametric sibling of the one-way ANOVA:
    heavy-tailed web-corpus lengths violate ANOVA's normality, ranks
    don't care. With tie-averaged ranks R_g summed per group,

        H  = 12/(N(N+1)) Σ_g R_g²/n_g − 3(N+1)
        C  = 1 − Σ(t³−t)/(N³−N)   (tie correction, t = tie sizes)
        H' = H/C                   ~ χ²(k−1) under equal locations

    Exactness: the same doubled-average-rank idiom as
    :func:`mann_whitney_u` — ranks come from a window over the
    DISTINCT-value counts table (2·avgrank = 2·cum_before + n + 1 is
    an exact integer), never a global row window. One value
    aggregation + one (group, value) aggregation; everything after
    rides tiny frames. Returns one row
    ``(n, k_groups, h, tie_c, h_adj, dof)``.
    """
    base = df.select(F.col(value_col).cast("double").alias("v"),
                     F.col(group_col).alias("g")) \
             .where(F.col("v").isNotNull() & F.col("g").isNotNull())
    vt = base.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    w_pfx = (Window.partitionBy().orderBy("v")
             .rowsBetween(Window.unboundedPreceding, -1))
    ranks = vt.select(
        "v", "n",
        (2 * F.coalesce(F.sum("n").over(w_pfx), F.lit(0))
         + F.col("n") + 1).alias("rank2"))
    gv = base.groupBy("g", "v").agg(F.count(F.lit(1)).alias("ngv"))
    per_g = (gv.join(ranks.select("v", "rank2"), "v")
             .groupBy("g")
             .agg(F.sum("ngv").cast("double").alias("ng"),
                  F.sum(F.col("ngv") * F.col("rank2"))
                   .cast("double").alias("r2g")))
    ties = vt.agg(F.sum(F.col("n") ** 3 - F.col("n"))
                  .cast("double").alias("tsum"))
    a = per_g.agg(
        F.sum("ng").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("r2g") ** 2 / F.col("ng")).alias("rr"))
    nn = F.col("nn")
    # R_g = r2g/2  ⇒  Σ R_g²/n_g = rr/4
    h = 12.0 / (nn * (nn + 1)) * F.col("rr") / 4.0 - 3 * (nn + 1)
    c = 1.0 - F.col("tsum") / (nn ** 3 - nn)
    return (a.crossJoin(F.broadcast(ties))
            .select(nn.cast("long").alias("n"),
                    F.col("k").cast("long").alias("k_groups"),
                    F.round(h, round_to).alias("h"),
                    F.round(c, round_to).alias("tie_c"),
                    F.round(F.when(c > 0, h / c), round_to)
                     .alias("h_adj"),
                    (F.col("k") - 1).cast("long").alias("dof")))


def fleiss_kappa(df: DataFrame, item_col: str, category_col: str, *,
                 round_to: int = 6) -> DataFrame:
    """Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among
    n raters per item (the MULTI-rater generalization of the 2-rater
    :func:`cohen_kappa`): each input row is one rating (item,
    category). With n_ij = ratings of item i in category j and n
    ratings per item,

        P_i = (Σ_j n_ij² − n) / (n(n−1))       per-item agreement
        P̄  = mean_i P_i,   P_e = Σ_j p_j²,    p_j = Σ_i n_ij / (Nn)
        κ   = (P̄ − P_e) / (1 − P_e)

    Landis-Koch: >0.6 substantial, >0.8 almost perfect. Assumes a
    CONSTANT rating count per item (the classic statistic); the
    min==max audit nulls ``n_items`` when per-item counts vary, so
    an invalid input cannot masquerade as a valid kappa.
    Two aggregations: (item, category) cells, then single-row close.
    Returns ``(n_items, n_per_item, n_categories, p_bar, p_e,
    kappa)``.
    """
    cells = (df.select(F.col(item_col).alias("i"),
                       F.col(category_col).alias("c"))
             .where(F.col("i").isNotNull() & F.col("c").isNotNull())
             .groupBy("i", "c")
             .agg(F.count(F.lit(1)).cast("double").alias("nij")))
    per_item = cells.groupBy("i").agg(
        F.sum("nij").alias("ni"),
        F.sum(F.col("nij") ** 2).alias("sq"))
    per_cat = cells.groupBy("c").agg(F.sum("nij").alias("nj"))
    a_items = per_item.agg(
        F.count(F.lit(1)).cast("double").alias("n_items"),
        F.min("ni").alias("n_lo"), F.max("ni").alias("n_hi"),
        F.sum("sq").alias("sq_sum"), F.sum("ni").alias("tot"))
    a_cats = per_cat.agg(
        F.count(F.lit(1)).alias("n_cats"),
        F.sum(F.col("nj") ** 2).alias("nj2"))
    nn = F.col("n_items")
    n = F.col("n_lo")                      # per-item rating count
    # the audit gate doubles as the ANSI-safe divide guard: uneven or
    # single-rating items null every derived column, never a crash
    ok = (F.col("n_lo") == F.col("n_hi")) & (n > 1)
    p_bar = F.when(ok, (F.col("sq_sum") - nn * n)
                   / (nn * n * (n - 1)))
    p_e = F.when(ok, F.col("nj2") / (nn * n) ** 2)
    out = (a_items.crossJoin(F.broadcast(a_cats))
           .select(F.when(ok, nn).cast("long").alias("n_items"),
                   n.cast("long").alias("n_per_item"),
                   F.col("n_cats").cast("long").alias("n_categories"),
                   F.round(p_bar, round_to).alias("p_bar"),
                   F.round(p_e, round_to).alias("p_e"),
                   F.round(F.when(p_e < 1, (p_bar - p_e) / (1 - p_e)),
                           round_to).alias("kappa")))
    return out


def gumbel_maxima(df: DataFrame, value_col: str, *, block: Column,
                  return_period: int = 100,
                  round_to: int = 6) -> DataFrame:
    """Gumbel (EV-I) fit to BLOCK MAXIMA by the method of moments —
    the extreme-value answer to "what daily peak should capacity be
    budgeted for": Fisher-Tippett says block maxima of light-tailed
    series converge to Gumbel, whose moments give

        β̂ = s·√6/π,    μ̂ = m − γ·β̂          (γ = 0.57721…)
        x_T = μ̂ − β̂·ln(−ln(1 − 1/T))          (T-block return level)

    against which the observed all-time max is the sanity check
    (records-theory and c-chart ask different questions: was today
    anomalous vs what will the worst day in T look like). One
    groupBy(block).max partial agg, one 1-row close over the maxima
    (sample stddev, n−1 — both engines agree). Returns
    ``(n_blocks, max_mean, max_sd, mu, beta, rl_T, observed_max)``.
    """
    gamma = 0.5772156649015329
    mx = (df.select(block.alias("b"),
                    F.col(value_col).cast("double").alias("v"))
          .where(F.col("b").isNotNull() & F.col("v").isNotNull())
          .groupBy("b").agg(F.max("v").alias("m")))
    a = mx.agg(F.count(F.lit(1)).alias("n_blocks"),
               F.avg("m").alias("mm"), F.stddev("m").alias("sd"),
               F.max("m").alias("omax"))
    beta = F.col("sd") * math.sqrt(6.0) / math.pi
    mu = F.col("mm") - gamma * beta
    t = float(return_period)
    rl = mu - beta * F.log(-F.log(F.lit(1.0 - 1.0 / t)))
    return a.select(
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.round("mm", round_to).alias("max_mean"),
        F.round("sd", round_to).alias("max_sd"),
        F.round(mu, round_to).alias("mu"),
        F.round(beta, round_to).alias("beta"),
        F.round(rl, round_to).alias(f"rl_{return_period}"),
        F.round("omax", round_to).alias("observed_max"))


def friedman_test(df: DataFrame, *, block_col: str, treat_col: str,
                  value_col: str, round_to: int = 6) -> DataFrame:
    """Friedman repeated-measures rank test (Friedman 1937) + its
    effect size, Kendall's W: treatments (event types, engine
    variants, …) ranked WITHIN each block (day, host, …), so every
    block contributes equally and block-level volume swings cancel —
    the question :func:`kruskal_wallis` cannot ask when measurements
    are paired per block. With per-block average ranks summed to R_j,

        χ²_F = 12/(nk(k+1)) Σ_j R_j² − 3n(k+1)   ~ χ²(k−1)
        W    = χ²_F / (n(k−1))                     ∈ [0, 1]

    Blocks missing any treatment are DROPPED (complete-block
    design), and the dropped count is reported — silence would bias
    R_j. Ties take average ranks (2·avgrank = 2·rank + eq − 1, exact
    integers). Ranking windows ride (block) partitions — k rows
    each, never the raw table. Returns one row
    ``(n_blocks, n_dropped, k_treat, chi2_f, w, dof)``.
    """
    base = (df.select(F.col(block_col).alias("b"),
                      F.col(treat_col).alias("t"),
                      F.col(value_col).cast("double").alias("v"))
            .where(F.col("b").isNotNull() & F.col("t").isNotNull()
                   & F.col("v").isNotNull()))
    k = base.agg(F.countDistinct("t").cast("double").alias("k"))
    sizes = base.groupBy("b").agg(F.countDistinct("t").alias("kb"))
    complete = (base.join(sizes, "b")
                .crossJoin(F.broadcast(k))
                .where(F.col("kb") == F.col("k")))
    wb = Window.partitionBy("b").orderBy("v")
    eq = F.count(F.lit(1)).over(Window.partitionBy("b", "v"))
    rank2 = 2 * F.rank().over(wb) + eq - 1          # 2×average rank
    per_t = (complete.select("t", rank2.alias("r2"), "k")
             .groupBy("t")
             .agg(F.sum("r2").cast("double").alias("r2j"),
                  F.count(F.lit(1)).cast("double").alias("n"),
                  F.first("k").alias("k")))
    a = per_t.agg(F.first("n").alias("n"), F.first("k").alias("k"),
                  F.sum(F.col("r2j") ** 2).alias("rr"))
    dropped = sizes.crossJoin(F.broadcast(k)) \
                   .where(F.col("kb") != F.col("k")) \
                   .agg(F.count(F.lit(1)).alias("n_dropped"))
    n, kk = F.col("n"), F.col("k")
    chi2 = (12.0 / (n * kk * (kk + 1)) * F.col("rr") / 4.0
            - 3.0 * n * (kk + 1))
    return (a.crossJoin(F.broadcast(dropped))
            .select(n.cast("long").alias("n_blocks"),
                    F.col("n_dropped").cast("long").alias("n_dropped"),
                    kk.cast("long").alias("k_treat"),
                    F.round(chi2, round_to).alias("chi2_f"),
                    F.round(chi2 / (n * (kk - 1)), round_to)
                     .alias("w"),
                    (kk - 1).cast("long").alias("dof")))


def cronbach_alpha(df: DataFrame, item_cols: Sequence[str], *,
                   round_to: int = 6) -> DataFrame:
    """Cronbach's α (Cronbach 1951) — internal-consistency audit for
    a composite score assembled from k numeric item columns (quality
    sub-scores, rubric dimensions): do the items move together
    enough to justify summing them?

        α = k/(k−1) · (1 − Σ_i var(item_i) / var(Σ items))

    α < 0.5 says the composite is incoherent — gate on items
    separately. Sample variances (n−1) throughout; rows with ANY
    null item are dropped (listwise, the classical definition), and
    the dropped count is reported. ONE aggregation pass — the item
    variances and the total-score variance fuse into a single job.
    Returns ``(n, n_dropped, k_items, var_sum, var_total, alpha)``.
    """
    items = [F.col(c).cast("double").alias(c) for c in item_cols]
    kk = float(len(item_cols))
    listwise = df.select(*items).na.drop("any", subset=list(item_cols))
    total = sum((F.col(c) for c in item_cols[1:]),
                F.col(item_cols[0]))
    n_all = df.agg(F.count(F.lit(1)).alias("n_all"))  # stays lazy
    a = listwise.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.var_samp(c).alias(f"v_{i}")
          for i, c in enumerate(item_cols)],
        F.var_samp(total).alias("vt")).crossJoin(F.broadcast(n_all))
    vsum = sum((F.col(f"v_{i}") for i in range(1, len(item_cols))),
               F.col("v_0"))
    alpha = (kk / (kk - 1)) * (1.0 - vsum / F.col("vt"))
    return a.select(
        F.col("n").cast("long").alias("n"),
        (F.col("n_all") - F.col("n")).cast("long").alias("n_dropped"),
        F.lit(int(kk)).alias("k_items"),
        F.round(vsum, round_to).alias("var_sum"),
        F.round("vt", round_to).alias("var_total"),
        F.round(F.when(F.col("vt") > 0, alpha), round_to)
         .alias("alpha"))


def youden_threshold(df: DataFrame, *, score_col: str, label_col,
                     round_to: int = 6) -> DataFrame:
    """Optimal decision threshold by Youden's J (Youden 1950): sweep
    every distinct score level t, J(t) = TPR(t) − FPR(t) with
    decision rule score ≥ t, and return the maximizing row — the
    threshold advisor that turns a :func:`roc_auc` "the score has
    signal" into an operating point. Ties on J break toward the
    LOWEST threshold (recall-preserving) deterministically.

    Same scale shape as roc_auc: one aggregation to distinct score
    levels, suffix-cumulative TP/FP via a window over THAT table,
    then a 1-row argmax — no per-row ranking, no global row sort.
    Returns ``(threshold, tp, fp, tpr, fpr, youden_j)``.
    """
    lbl = (label_col if isinstance(label_col, Column)
           else F.col(label_col))
    per_s = (df.where(F.col(score_col).isNotNull() & lbl.isNotNull())
             .select(F.col(score_col).cast("double").alias("s"),
                     lbl.cast("int").alias("y"))
             .groupBy("s")
             .agg(F.sum("y").alias("p"),
                  F.sum(1 - F.col("y")).alias("q")))
    w_sfx = (Window.partitionBy().orderBy("s")
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    tot = per_s.agg(F.sum("p").cast("double").alias("pp"),
                    F.sum("q").cast("double").alias("qq"))
    sw = (per_s.select("s", F.sum("p").over(w_sfx).alias("tp"),
                       F.sum("q").over(w_sfx).alias("fp"))
          .crossJoin(F.broadcast(tot)))
    # try_divide: a single-class label yields NULL J rows (and a NULL
    # argmax), never an ANSI divide-by-zero abort
    j = (F.try_divide(F.col("tp"), F.col("pp"))
         - F.try_divide(F.col("fp"), F.col("qq")))
    best = sw.where(j.isNotNull()).select(
        F.struct(j.alias("j"), (-F.col("s")).alias("ns"),
                 F.col("s").alias("s"), F.col("tp").alias("tp"),
                 F.col("fp").alias("fp"), F.col("pp").alias("pp"),
                 F.col("qq").alias("qq")).alias("r")
    ).agg(F.max("r").alias("r"))
    return best.select(
        F.round(F.col("r.s"), round_to).alias("threshold"),
        F.col("r.tp").cast("long").alias("tp"),
        F.col("r.fp").cast("long").alias("fp"),
        F.round(F.try_divide(F.col("r.tp"), F.col("r.pp")),
                round_to).alias("tpr"),
        F.round(F.try_divide(F.col("r.fp"), F.col("r.qq")),
                round_to).alias("fpr"),
        F.round(F.col("r.j"), round_to).alias("youden_j"))


def mase(df: DataFrame, value_col: str, date_col: str, *,
         season: int = 7, round_to: int = 6) -> DataFrame:
    """MASE — mean absolute scaled error (Hyndman & Koehler 2006) of
    the SEASONAL-naive forecast (x̂_t = x_{t−season}) against the
    plain naive baseline (x̂_t = x_{t−1}) over a daily series: the
    scale-free "does the weekly rhythm actually predict volume"
    audit. MASE < 1 ⇒ the seasonal pattern beats persistence —
    schedule capacity by weekday; MASE ≥ 1 ⇒ the rhythm is noise.

    Forecasts join by CALENDAR date arithmetic, so missing days
    produce NULL forecasts that are excluded and COUNTED rather than
    silently treated as consecutive. All joins ride the tiny
    per-date frame (one row per day). Returns one row ``(n_days,
    n_scored, n_unmatched, mae_seasonal, mae_naive, mase)``.
    """
    s = (df.select(F.col(date_col).cast("date").alias("d"),
                   F.col(value_col).cast("double").alias("x"))
         .where(F.col("d").isNotNull() & F.col("x").isNotNull()))
    lag1 = s.select(F.date_add("d", 1).alias("d"),
                    F.col("x").alias("x1"))
    lagS = s.select(F.date_add("d", int(season)).alias("d"),
                    F.col("x").alias("xs"))
    joined = s.join(lag1, "d", "left").join(lagS, "d", "left")
    scored = joined.where(F.col("x1").isNotNull()
                          & F.col("xs").isNotNull())
    a = scored.agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.avg(F.abs(F.col("x") - F.col("xs"))).alias("mae_s"),
        F.avg(F.abs(F.col("x") - F.col("x1"))).alias("mae_n"))
    n = s.agg(F.count(F.lit(1)).alias("n_days"))
    return (n.crossJoin(F.broadcast(a))
            .select(F.col("n_days").cast("long").alias("n_days"),
                    F.col("n_scored").cast("long").alias("n_scored"),
                    (F.col("n_days") - F.col("n_scored"))
                    .cast("long").alias("n_unmatched"),
                    F.round("mae_s", round_to).alias("mae_seasonal"),
                    F.round("mae_n", round_to).alias("mae_naive"),
                    F.round(F.try_divide(F.col("mae_s"),
                                         F.col("mae_n")), round_to)
                     .alias("mase")))


def nelson_aalen(df: DataFrame, *, entity_col: str, ts_col: str,
                 event_pred: Column, bucket_s: int = 3600,
                 round_to: int = 6) -> DataFrame:
    """Nelson-Aalen cumulative hazard (Nelson 1972, Aalen 1978) on
    the SAME duration model as :func:`kaplan_meier` (first
    observation → first matching event per entity, never-converters
    right-censored at the corpus horizon, durations bucketed):

        H(t)   = Σ_{t_i ≤ t} d_i/n_i          cumulative hazard
        Var(t) = Σ d_i/n_i²
        S̃(t)  = exp(−H(t))                    Fleming-Harrington

    where KM answers "what fraction survives", the hazard increments
    d_i/n_i read directly as per-bucket conversion INTENSITY — flat
    increments mean a memoryless process, a hump means a
    conversion-window. Same scale shape as kaplan_meier: per-entity
    aggregation, 1-row horizon, bucket aggregation, windows over the
    bounded curve only. Returns per event-bucket rows ``(t_bucket,
    n_risk, n_events, cum_hazard, var_hazard, fh_survival)``.
    """
    ts = F.col(ts_col).cast("timestamp").cast("double")
    per = (df.where(F.col(entity_col).isNotNull())
           .groupBy(entity_col)
           .agg(F.min(ts).alias("__entry"),
                F.min(F.when(event_pred, ts)).alias("__event"),
                F.max(ts).alias("__last")))
    horizon = per.agg(F.max("__last").alias("__h"))
    j = per.crossJoin(F.broadcast(horizon))
    observed = F.col("__event").isNotNull()
    dur = F.when(observed, F.col("__event") - F.col("__entry")) \
        .otherwise(F.col("__h") - F.col("__entry"))
    b = F.floor(dur / F.lit(int(bucket_s))).cast("long")
    marks = (j.select(b.alias("t_bucket"),
                      observed.cast("long").alias("__d"))
             .groupBy("t_bucket")
             .agg(F.count("*").alias("__all"),
                  F.sum("__d").alias("__d")))
    w = Window.orderBy("t_bucket") \
        .rowsBetween(Window.unboundedPreceding, -1)
    total = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    n_risk = (F.sum("__all").over(total)
              - F.coalesce(F.sum("__all").over(w), F.lit(0)))
    curve = marks.select("t_bucket", n_risk.alias("n_risk"),
                         F.col("__d").alias("n_events"))
    ws = Window.orderBy("t_bucket") \
        .rowsBetween(Window.unboundedPreceding, 0)
    h = F.sum(F.col("n_events") / F.col("n_risk")).over(ws)
    v = F.sum(F.col("n_events") / F.col("n_risk") ** 2).over(ws)
    return (curve.where(F.col("n_events") > 0)
            .select("t_bucket",
                    F.col("n_risk").cast("long").alias("n_risk"),
                    F.col("n_events").cast("long").alias("n_events"),
                    F.round(h, round_to).alias("cum_hazard"),
                    F.round(v, round_to).alias("var_hazard"),
                    F.round(F.exp(-h), round_to)
                     .alias("fh_survival")))


def robust_shape(df: DataFrame, value_col: str, *, by: str,
                 round_to: int = 6) -> DataFrame:
    """Quantile-based distribution-shape profile per group: Bowley
    skewness from quartiles and Moors kurtosis from octiles —

        skew_B = (Q3 + Q1 − 2·Q2) / (Q3 − Q1)          ∈ [−1, 1]
        kurt_M = ((E7−E5) + (E3−E1)) / (E6 − E2)       (1.23 ≈ normal)

    — the moment-free shape readout that heavy-tailed web-corpus
    columns demand: third/fourth moments explode on power-law
    lengths (:func:`power_tail_hill`), octile ratios don't. One
    exact-percentile aggregation per group (bin first at 10¹²-row
    scale, as the decile helpers document). Returns per-group rows
    ``(group, n, q1, median, q3, bowley_skew, moors_kurt)``.
    """
    base = df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & F.col("v").isNotNull())
    octs = [F.expr(f"percentile(v, {i / 8.0})").alias(f"e{i}")
            for i in range(1, 8)]
    a = base.groupBy("g").agg(F.count(F.lit(1)).alias("n"), *octs)
    bowley = F.try_divide(
        F.col("e6") + F.col("e2") - 2 * F.col("e4"),
        F.col("e6") - F.col("e2"))
    moors = F.try_divide(
        (F.col("e7") - F.col("e5")) + (F.col("e3") - F.col("e1")),
        F.col("e6") - F.col("e2"))
    return a.select(
        F.col("g").alias("group"), F.col("n").cast("long").alias("n"),
        F.round("e2", round_to).alias("q1"),
        F.round("e4", round_to).alias("median"),
        F.round("e6", round_to).alias("q3"),
        F.round(bowley, round_to).alias("bowley_skew"),
        F.round(moors, round_to).alias("moors_kurt"))


def gk_lambda(df: DataFrame, x_col: str, y_col: str, *,
              round_to: int = 6) -> DataFrame:
    """Goodman-Kruskal λ (Goodman & Kruskal 1954) — proportional
    reduction in prediction error between two categoricals: how much
    better does knowing X (source) make a modal guess of Y (lang)?

        λ_{Y|X} = (Σ_x max_y n_xy − max_y n_{·y})
                  / (N − max_y n_{·y})

    λ = 0 means X is useless for predicting Y even when chi²
    "finds" association (λ reads in error-rate units, chi² in
    sample-size units); both directions are reported because λ is
    asymmetric. ONE (x, y) cell aggregation feeds both directions.
    Returns one row ``(n, lambda_y_given_x, lambda_x_given_y)``.
    """
    cells = (df.select(F.col(x_col).alias("x"),
                       F.col(y_col).alias("y"))
             .where(F.col("x").isNotNull() & F.col("y").isNotNull())
             .groupBy("x", "y")
             .agg(F.count(F.lit(1)).cast("double").alias("n")))
    per_x = cells.groupBy("x").agg(F.max("n").alias("mx"),
                                   F.sum("n").alias("nx"))
    per_y = cells.groupBy("y").agg(F.max("n").alias("my"),
                                   F.sum("n").alias("ny"))
    ax = per_x.agg(F.sum("mx").alias("sum_max_y"),
                   F.max("nx").alias("max_marg_x"))
    ay = per_y.agg(F.sum("my").alias("sum_max_x"),
                   F.max("ny").alias("max_marg_y"),
                   F.sum("ny").alias("nn"))
    lam_yx = F.try_divide(F.col("sum_max_y") - F.col("max_marg_y"),
                          F.col("nn") - F.col("max_marg_y"))
    lam_xy = F.try_divide(F.col("sum_max_x") - F.col("max_marg_x"),
                          F.col("nn") - F.col("max_marg_x"))
    return (ay.crossJoin(F.broadcast(ax))
            .select(F.col("nn").cast("long").alias("n"),
                    F.round(lam_yx, round_to)
                     .alias("lambda_y_given_x"),
                    F.round(lam_xy, round_to)
                     .alias("lambda_x_given_y")))


def kuiper_two_sample(df: DataFrame, value_col: str, *,
                      split: Column, round_to: int = 6) -> DataFrame:
    """Kuiper two-sample test (Kuiper 1960): V = D⁺ + D⁻, the sum of
    the largest CDF excursions in each direction — the KS variant
    that is INVARIANT to a cyclic shift of the support, which makes
    it the correct drift test for circular variables (hour-of-day,
    day-of-week): KS near a cut point under-reads a phase shift,
    Kuiper doesn't care where midnight is.

    Same scale shape as the KS/CvM rows: one distinct-value counts
    aggregation, cumulative CDFs via a window over THAT table, one
    closing max. Returns one row ``(n_a, n_b, d_plus, d_minus,
    v_stat)``.
    """
    base = df.select(F.col(value_col).cast("double").alias("v"),
                     split.alias("s")) \
             .where(F.col("v").isNotNull() & F.col("s").isNotNull())
    vc = base.groupBy("v").agg(
        F.sum(F.when(F.col("s"), 1).otherwise(0))
         .cast("double").alias("na"),
        F.sum(F.when(~F.col("s"), 1).otherwise(0))
         .cast("double").alias("nb"))
    tot = vc.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cdfs = (vc.select(F.sum("na").over(w).alias("ca"),
                      F.sum("nb").over(w).alias("cb"))
            .crossJoin(F.broadcast(tot)))
    diff = F.col("ca") / F.col("ta") - F.col("cb") / F.col("tb")
    a = cdfs.agg(F.max(diff).alias("dp"),
                 F.max(-diff).alias("dm"),
                 F.first("ta").alias("ta"), F.first("tb").alias("tb"))
    dp = F.greatest(F.col("dp"), F.lit(0.0))
    dm = F.greatest(F.col("dm"), F.lit(0.0))
    return a.select(
        F.col("ta").cast("long").alias("n_a"),
        F.col("tb").cast("long").alias("n_b"),
        F.round(dp, round_to).alias("d_plus"),
        F.round(dm, round_to).alias("d_minus"),
        F.round(dp + dm, round_to).alias("v_stat"))


def poisson_scan(df: DataFrame, ts_col: str, *,
                 windows: Sequence[int] = (1, 3, 7),
                 round_to: int = 6) -> DataFrame:
    """Kulldorff-style Poisson scan statistic over the daily series:
    for each window length w, slide a w-day interval over the span
    and score the count inside against the uniform-rate expectation

        LLR = x·ln(x/e) + (N−x)·ln((N−x)/(N−e))    (0 unless x > e)

    returning each length's maximizing interval — WHERE the burst is
    and how implausible under a flat rate, the interval answer the
    pointwise c-chart / EWMA rows cannot give. Calendar gaps are
    handled by a RANGE window over day indices (absent days count
    0); edge windows with partial coverage are excluded. Ties break
    to the earliest start. Runs entirely on the per-day frame.
    Returns one row per window length ``(w_days, start_day, x,
    expected, llr)``.
    """
    daily = (df.select(F.to_date(F.col(ts_col)).alias("d"))
             .where(F.col("d").isNotNull())
             .groupBy("d").agg(F.count(F.lit(1))
                               .cast("double").alias("x")))
    lo = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"),
                   F.sum("x").alias("nn"))
    idx = (daily.crossJoin(F.broadcast(lo))
           .select("d", "x", F.datediff("d", F.col("d0")).alias("i"),
                   (F.datediff("d1", F.col("d0")) + 1)
                   .cast("double").alias("t"), "nn"))
    outs = []
    for wdays in windows:
        wd = int(wdays)
        win = (Window.orderBy("i")
               .rangeBetween(-(wd - 1), 0))
        seg = (idx.select(
            "d", "t", "nn", F.col("i"),
            F.sum("x").over(win).alias("wx"))
            .where(F.col("i") >= wd - 1))
        e = F.col("nn") * wd / F.col("t")
        x = F.col("wx")
        n = F.col("nn")
        llr = F.when(
            x > e,
            x * F.log(x / e)
            + F.when(x < n, (n - x) * F.log((n - x) / (n - e)))
               .otherwise(F.lit(0.0))).otherwise(F.lit(0.0))
        start = F.date_sub("d", wd - 1)
        best = (seg.select(F.struct(
            llr.alias("llr"),
            (-F.col("i")).alias("ni"),
            start.alias("s"), x.alias("x"), e.alias("e")).alias("r"))
            .agg(F.max("r").alias("r")))
        outs.append(best.select(
            F.lit(wd).alias("w_days"),
            F.col("r.s").alias("start_day"),
            F.col("r.x").cast("long").alias("x"),
            F.round(F.col("r.e"), round_to).alias("expected"),
            F.round(F.col("r.llr"), round_to).alias("llr")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def chow_break(df: DataFrame, x_col: str, y_col: str, *,
               split: Column, round_to: int = 6) -> DataFrame:
    """Chow structural-break test (Chow 1960): did the LINEAR
    relationship y ~ a + b·x change between two regimes (before /
    after a deploy, first / second half of the crawl)? Where
    :func:`binseg_split` finds a MEAN shift, Chow detects a SLOPE or
    intercept change with an F-verdict:

        F = ((SSE_p − SSE₁ − SSE₂)/2) / ((SSE₁+SSE₂)/(n₁+n₂−4))
                                           ~ F(2, n₁+n₂−4)

    Every SSE comes from sufficient statistics (Σx Σy Σxy Σx² Σy²
    per regime: SSE = S_yy − S_xy²/S_xx), so the whole test is ONE
    aggregation pass with conditional sums — no residual
    materialization. Returns one row ``(n1, n2, sse_pooled,
    sse_split, f_stat, dof2)``; NULL F when either regime is
    degenerate (< 3 rows or constant x).
    """
    s = df.select(F.col(x_col).cast("double").alias("x"),
                  F.col(y_col).cast("double").alias("y"),
                  split.alias("g")) \
          .where(F.col("x").isNotNull() & F.col("y").isNotNull()
                 & F.col("g").isNotNull())

    def stats(pred):
        m = lambda c: F.sum(F.when(pred, c).otherwise(F.lit(0.0)))
        n = F.sum(F.when(pred, 1).otherwise(0)).cast("double")
        return n, m(F.col("x")), m(F.col("y")), \
            m(F.col("x") * F.col("y")), m(F.col("x") ** 2), \
            m(F.col("y") ** 2)

    cols = {}
    for tag, pred in (("1", F.col("g")), ("2", ~F.col("g")),
                      ("p", F.lit(True))):
        n, sx, sy, sxy, sx2, sy2 = stats(pred)
        cols[f"n{tag}"] = n
        cols[f"sxx{tag}"] = sx2 - sx ** 2 / n
        cols[f"sxy{tag}"] = sxy - sx * sy / n
        cols[f"syy{tag}"] = sy2 - sy ** 2 / n
    a = s.agg(*[v.alias(k) for k, v in cols.items()])
    sse = {t: F.col(f"syy{t}")
           - F.col(f"sxy{t}") ** 2 / F.col(f"sxx{t}")
           for t in ("1", "2", "p")}
    ok = ((F.col("n1") >= 3) & (F.col("n2") >= 3)
          & (F.col("sxx1") > 0) & (F.col("sxx2") > 0))
    dof2 = F.col("n1") + F.col("n2") - 4
    f_stat = F.when(ok & (sse["1"] + sse["2"] > 0),
                    ((sse["p"] - sse["1"] - sse["2"]) / 2.0)
                    / ((sse["1"] + sse["2"]) / dof2))
    return a.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(sse["p"], round_to).alias("sse_pooled"),
        F.round(F.when(ok, sse["1"] + sse["2"]), round_to)
         .alias("sse_split"),
        F.round(f_stat, round_to).alias("f_stat"),
        dof2.cast("long").alias("dof2"))


def weighted_kappa(df: DataFrame, a_col: str, b_col: str, *,
                   round_to: int = 6) -> DataFrame:
    """Linearly weighted Cohen's kappa (Cohen 1968) for ORDINAL
    labels (quality buckets, severity grades): near-misses earn
    partial credit w_ij = 1 − |i−j|/(k−1), so a rater who is
    consistently one bucket off scores far better than one who is
    randomly wrong — the distinction unweighted :func:`cohen_kappa`
    cannot make. Labels must be numeric ordinals; k spans the
    OBSERVED min..max of both raters.

        κ_w = (p_o,w − p_e,w) / (1 − p_e,w),
        p_e,w = Σ_ij w_ij·p_i·q_j

    One (a,b) cell aggregation; the expected term crosses the two
    marginal vectors — k² rows, label-cardinality-bounded, never
    row-bounded. Returns ``(n, k_levels, po_w, pe_w, kappa_w)``.
    """
    base = df.select(F.col(a_col).cast("long").alias("a"),
                     F.col(b_col).cast("long").alias("b")) \
             .where(F.col("a").isNotNull() & F.col("b").isNotNull())
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("n"))
    span = cells.agg(
        F.least(F.min("a"), F.min("b")).alias("lo"),
        F.greatest(F.max("a"), F.max("b")).alias("hi"),
        F.sum("n").alias("nn"))
    def wspan():
        return F.when(
            F.col("hi") > F.col("lo"),
            1.0 - F.abs(F.col("i") - F.col("j"))
            / (F.col("hi") - F.col("lo"))).otherwise(F.lit(1.0))

    # observed weighted agreement
    obs = (cells.crossJoin(F.broadcast(span))
           .select(F.col("a").alias("i"), F.col("b").alias("j"),
                   "n", "nn", "lo", "hi"))
    po_w = obs.agg(F.sum(wspan() * F.col("n") / F.col("nn"))
                   .alias("po"),
                   F.first("nn").alias("nn"),
                   F.first("lo").alias("lo"),
                   F.first("hi").alias("hi"))
    ma = cells.groupBy("a").agg(F.sum("n").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("n").alias("nb"))
    exp = (ma.crossJoin(mb).crossJoin(F.broadcast(span))
           .select(F.col("a").alias("i"), F.col("b").alias("j"),
                   "na", "nb", "nn", "lo", "hi"))
    pe_w = exp.agg(F.sum(wspan() * F.col("na") * F.col("nb")
                         / (F.col("nn") ** 2)).alias("pe"))
    out = po_w.crossJoin(F.broadcast(pe_w))
    return out.select(
        F.col("nn").cast("long").alias("n"),
        (F.col("hi") - F.col("lo") + 1).cast("long")
         .alias("k_levels"),
        F.round("po", round_to).alias("po_w"),
        F.round("pe", round_to).alias("pe_w"),
        F.round(F.when(F.col("pe") < 1,
                       (F.col("po") - F.col("pe"))
                       / (1 - F.col("pe"))), round_to)
         .alias("kappa_w"))


def partial_corr(df: DataFrame, x_col: str, y_col: str,
                 z_col: str, *, round_to: int = 6) -> DataFrame:
    """First-order partial correlation — the x~y association with a
    confounder z HELD CONSTANT:

        r_xy·z = (r_xy − r_xz·r_yz) / √((1−r_xz²)(1−r_yz²))

    the one-step answer to "is length correlated with quality, or
    are both just driven by language". All three Pearson
    correlations fuse into ONE aggregation (Spark's corr is a
    partial-aggregable JVM primitive). Rows with any null among
    x/y/z are dropped listwise so the three r's share a population.
    Returns ``(n, r_xy, r_xz, r_yz, partial_r)``.
    """
    base = df.select(F.col(x_col).cast("double").alias("x"),
                     F.col(y_col).cast("double").alias("y"),
                     F.col(z_col).cast("double").alias("z")) \
             .na.drop("any")
    a = base.agg(F.count(F.lit(1)).alias("n"),
                 F.corr("x", "y").alias("rxy"),
                 F.corr("x", "z").alias("rxz"),
                 F.corr("y", "z").alias("ryz"))
    den = F.sqrt((1 - F.col("rxz") ** 2) * (1 - F.col("ryz") ** 2))
    pr = F.when(den > 0,
                (F.col("rxy") - F.col("rxz") * F.col("ryz")) / den)
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.round("rxy", round_to).alias("r_xy"),
        F.round("rxz", round_to).alias("r_xz"),
        F.round("ryz", round_to).alias("r_yz"),
        F.round(pr, round_to).alias("partial_r"))


def jonckheere_terpstra(df: DataFrame, value_col: str,
                        score_col: str, *,
                        round_to: int = 6) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative test (Jonckheere
    1954, Terpstra 1952): are values MONOTONICALLY shifting across
    groups ordered by *score_col*? The trend-aware refinement of
    :func:`kruskal_wallis` (which only asks "any difference") and
    the continuous-value counterpart of :func:`cochran_armitage`
    (binary rates). J counts, over every ordered group pair, the
    value pairs that agree with the ordering (ties credit ½):

        J = Σ_{g<g'} U_{gg'},   z = (J − μ)/σ  with the
        TIE-CORRECTED null moments (Hollander & Wolfe).

    Plan: a (group, value) cell aggregation densified to the
    group×value GRID (bounded by cardinalities, never rows), one
    per-group cumulative window over values and one per-value
    cumulative over ordered groups — J is then a single weighted
    sum. Returns ``(n, k_groups, j_stat, mean_j, var_j, z)``.
    """
    base = df.select(F.col(score_col).cast("double").alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & F.col("v").isNotNull())
    cells = base.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("double").alias("n"))
    groups = cells.select("g").distinct()
    values = cells.select("v").distinct()
    grid = (groups.crossJoin(values)
            .join(cells, ["g", "v"], "left")
            .na.fill({"n": 0.0}))
    w_v = (Window.partitionBy("g").orderBy("v")
           .rowsBetween(Window.unboundedPreceding, -1))
    g1 = grid.select("g", "v", "n",
                     F.coalesce(F.sum("n").over(w_v), F.lit(0.0))
                      .alias("cum_lt"))
    w_g = (Window.partitionBy("v").orderBy("g")
           .rowsBetween(Window.unboundedPreceding, -1))
    g2 = g1.select(
        "g", "v", "n",
        F.coalesce(F.sum("cum_lt").over(w_g), F.lit(0.0)).alias("a"),
        F.coalesce(F.sum("n").over(w_g), F.lit(0.0)).alias("b"))
    j = g2.agg(F.sum(F.col("n") * (F.col("a") + F.col("b") / 2))
               .alias("j"))
    szs = cells.groupBy("g").agg(F.sum("n").alias("ng"))
    ties = cells.groupBy("v").agg(F.sum("n").alias("tv"))
    m1 = szs.agg(
        F.sum("ng").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("ng") ** 2).alias("s2"),
        F.sum(F.col("ng") * (F.col("ng") - 1)
              * (2 * F.col("ng") + 5)).alias("u1"),
        F.sum(F.col("ng") * (F.col("ng") - 1)
              * (F.col("ng") - 2)).alias("u2"),
        F.sum(F.col("ng") * (F.col("ng") - 1)).alias("u3"))
    m2 = ties.agg(
        F.sum(F.col("tv") * (F.col("tv") - 1)
              * (2 * F.col("tv") + 5)).alias("t1"),
        F.sum(F.col("tv") * (F.col("tv") - 1)
              * (F.col("tv") - 2)).alias("t2"),
        F.sum(F.col("tv") * (F.col("tv") - 1)).alias("t3"))
    nn = F.col("nn")
    mean_j = (nn ** 2 - F.col("s2")) / 4.0
    var_j = ((nn * (nn - 1) * (2 * nn + 5) - F.col("u1")
              - F.col("t1")) / 72.0
             + F.col("u2") * F.col("t2")
             / (36.0 * nn * (nn - 1) * (nn - 2))
             + F.col("u3") * F.col("t3")
             / (8.0 * nn * (nn - 1)))
    out = (j.crossJoin(F.broadcast(m1)).crossJoin(F.broadcast(m2)))
    return out.select(
        nn.cast("long").alias("n"),
        F.col("k").cast("long").alias("k_groups"),
        F.round("j", round_to).alias("j_stat"),
        F.round(mean_j, round_to).alias("mean_j"),
        F.round(var_j, round_to).alias("var_j"),
        F.round(F.when(var_j > 0,
                       (F.col("j") - mean_j) / F.sqrt(var_j)),
                round_to).alias("z"))


def sketch_quantile_audit(df: DataFrame, value_col: str, *, by: str,
                          probs: Sequence[float] = (0.5, 0.9, 0.99),
                          accuracy: int = 1000,
                          round_to: int = 6) -> DataFrame:
    """Mergeable-sketch quantile audit — the production path for
    quantiles at 10¹² rows is ``approx_percentile`` (Greenwald-Khanna
    partial-aggregable sketch), not the exact ``percentile`` the
    small-SF drill-downs use; this operator VERIFIES the sketch's
    contract on real data: for each group × prob, the sketch value's
    true rank must sit within n/accuracy of p·n (the GK guarantee).

    Per (group, prob): the exact quantile, and ``within_bound`` —
    whether the interval [count(v < approx), count(v ≤ approx)]
    intersects [p·n − n/acc, p·n + n/acc]. A FALSE row means the
    sketch path cannot be trusted for that column's gating. Two
    aggregations + a broadcast join of the tiny per-group quantile
    table back onto the data for the rank count. Returns
    ``(group, prob, n, exact_q, within_bound)``.
    """
    acc = int(accuracy)
    base = df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & F.col("v").isNotNull())
    pl = list(probs)
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.expr(f"percentile(v, {p})").alias(f"ex{i}")
          for i, p in enumerate(pl)],
        *[F.expr(f"approx_percentile(v, {p}, {acc})")
          .alias(f"ap{i}") for i, p in enumerate(pl)])
    joined = base.join(F.broadcast(agg), "g")
    ranks = joined.groupBy("g").agg(
        F.first("n").alias("n"),
        *[F.first(f"ex{i}").alias(f"ex{i}") for i in range(len(pl))],
        *[F.sum((F.col("v") < F.col(f"ap{i}")).cast("long"))
          .cast("double").alias(f"lt{i}") for i in range(len(pl))],
        *[F.sum((F.col("v") <= F.col(f"ap{i}")).cast("long"))
          .cast("double").alias(f"le{i}") for i in range(len(pl))])
    outs = []
    for i, p in enumerate(pl):
        lo = F.lit(p) * F.col("n") - F.col("n") / acc - 1
        hi = F.lit(p) * F.col("n") + F.col("n") / acc + 1
        ok = (F.col(f"le{i}") >= lo) & (F.col(f"lt{i}") <= hi)
        outs.append(ranks.select(
            F.col("g").alias("group"), F.lit(p).alias("prob"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col(f"ex{i}"), round_to).alias("exact_q"),
            ok.alias("within_bound")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def breusch_pagan(df: DataFrame, x_col: str, y_col: str, *,
                  round_to: int = 6) -> DataFrame:
    """Breusch-Pagan heteroscedasticity test (Breusch & Pagan 1979,
    Koenker's studentized LM form): after fitting y ~ a + b·x, do
    the SQUARED residuals still depend on x? LM = n·R²(e², x) ~
    χ²(1). Heteroscedastic event values mean a single global
    variance gate misfires at the extremes — the premise behind
    per-group z-score and c-chart rows breaks silently; this row
    says when.

    Two chained aggregations, both from sufficient statistics (the
    slope lands via broadcast, residuals are a closed-form
    projection, never materialized wide). Returns one row
    ``(n, slope, r2_resid, lm_stat, dof)``.
    """
    s = df.select(F.col(x_col).cast("double").alias("x"),
                  F.col(y_col).cast("double").alias("y")) \
          .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    a1 = s.agg(F.count(F.lit(1)).cast("double").alias("n"),
               F.avg("x").alias("mx"), F.avg("y").alias("my"),
               F.covar_pop("x", "y").alias("cxy"),
               F.var_pop("x").alias("vx"))
    w = s.crossJoin(F.broadcast(a1))
    b = F.col("cxy") / F.col("vx")
    e2 = (F.col("y") - F.col("my")
          - b * (F.col("x") - F.col("mx"))) ** 2
    a2 = (w.select("x", e2.alias("u"), "n")
          .agg(F.first("n").alias("n"),
               F.corr("x", "u").alias("r"),
               F.covar_pop("x", "u").alias("cu"),
               F.var_pop("x").alias("vx2")))
    r2 = F.col("r") ** 2
    return a2.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.try_divide(F.col("cu"), F.col("vx2")), round_to)
         .alias("resid_slope"),
        F.round(r2, round_to).alias("r2_resid"),
        F.round(F.col("n") * r2, round_to).alias("lm_stat"),
        F.lit(1).alias("dof"))


def wilcoxon_signed_rank(df: DataFrame, a_col: str, b_col: str, *,
                         round_to: int = 6) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon 1945) on PAIRED
    measurements (each row one entity measured twice: first-half vs
    second-half volume, before vs after a deploy): rank |b−a| with
    tie-averaged ranks, sum the ranks of positive differences,

        W⁺,  μ = n_r(n_r+1)/4,
        σ² = n_r(n_r+1)(2n_r+1)/24 − Σ(t³−t)/48,
        z = (W⁺ − μ)/σ

    — the paired complement of :func:`mann_whitney_u` (independent
    samples) and the 2-level sibling of :func:`friedman_test`. Zero
    differences are dropped and counted (the classical Wilcoxon
    convention). Ranks ride the distinct-|d| counts table (the
    doubled-average-rank idiom), never a per-row window. Returns one
    row ``(n_pairs, n_zero, w_plus, w_minus, mean_w, var_w, z)``.
    """
    d = df.select((F.col(b_col).cast("double")
                   - F.col(a_col).cast("double")).alias("d")) \
          .where(F.col("d").isNotNull())
    nz = d.agg(F.sum((F.col("d") == 0).cast("long")).alias("n_zero"))
    r = d.where(F.col("d") != 0) \
         .select(F.abs("d").alias("ad"),
                 (F.col("d") > 0).cast("double").alias("pos"))
    vc = r.groupBy("ad").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("pos").alias("np"))
    w_pfx = (Window.orderBy("ad")
             .rowsBetween(Window.unboundedPreceding, -1))
    rank2 = (2 * F.coalesce(F.sum("n").over(w_pfx), F.lit(0))
             + F.col("n") + 1)
    scored = vc.select(
        "n", "np", (F.col("np") * rank2).alias("w2p"),
        (F.col("n") ** 3 - F.col("n")).alias("tt"))
    a = scored.agg(F.sum("n").alias("nr"), F.sum("w2p").alias("w2"),
                   F.sum("tt").alias("ts"))
    nr = F.col("nr")
    mean_w = nr * (nr + 1) / 4.0
    var_w = (nr * (nr + 1) * (2 * nr + 1) / 24.0
             - F.col("ts") / 48.0)
    w_plus = F.col("w2") / 2.0
    return (a.crossJoin(F.broadcast(nz))
            .select(nr.cast("long").alias("n_pairs"),
                    F.col("n_zero").cast("long").alias("n_zero"),
                    F.round(w_plus, round_to).alias("w_plus"),
                    F.round(nr * (nr + 1) / 2.0 - w_plus, round_to)
                     .alias("w_minus"),
                    F.round(mean_w, round_to).alias("mean_w"),
                    F.round(var_w, round_to).alias("var_w"),
                    F.round(F.when(var_w > 0,
                                   (w_plus - mean_w)
                                   / F.sqrt(var_w)), round_to)
                     .alias("z")))


def hodges_lehmann_shift(df: DataFrame, value_col: str, *,
                         split: Column,
                         round_to: int = 6) -> DataFrame:
    """Hodges-Lehmann shift estimator (Hodges & Lehmann 1963): the
    MEDIAN of all pairwise differences b − a between the two split
    sides — the robust "how big is the shift" companion to the
    Wilcoxon/Mann-Whitney "is there a shift" verdicts: 30% outliers
    barely move it, while mean-difference follows them anywhere.

    The n_a×n_b pair cloud is never materialized row-wise: both
    sides reduce to DISTINCT-value count tables, the difference grid
    is |V_a|×|V_b| weighted cells (value-cardinality-bounded), and
    the weighted median is one cumulative window over the sorted
    grid. Bin values first if distinct cardinality is itself huge.
    Interpolation follows the weighted-median convention: when the
    half-weight falls exactly on a cell boundary, the midpoint of
    the straddling diffs. Returns one row ``(n_a, n_b, n_pairs,
    hl_shift)``.
    """
    base = df.select(F.col(value_col).cast("double").alias("v"),
                     split.alias("s")) \
             .where(F.col("v").isNotNull() & F.col("s").isNotNull())
    va = base.where(F.col("s")).groupBy(F.col("v").alias("a")) \
             .agg(F.count(F.lit(1)).cast("double").alias("na"))
    vb = base.where(~F.col("s")).groupBy(F.col("v").alias("b")) \
             .agg(F.count(F.lit(1)).cast("double").alias("nb"))
    grid = (va.crossJoin(vb)
            .select((F.col("b") - F.col("a")).alias("d"),
                    (F.col("na") * F.col("nb")).alias("w")))
    cells = grid.groupBy("d").agg(F.sum("w").alias("w"))
    wc = (Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    c = cells.select(
        "d", F.sum("w").over(wc).alias("cum"),
        (F.sum("w").over(wc) - F.col("w")).alias("cum_before"),
        F.sum("w").over(tot).alias("tw"))
    half = F.col("tw") / 2.0
    # cells that contain the half-weight point; exact-boundary cells
    # contribute both straddling diffs, averaged
    lo = c.where((F.col("cum_before") <= half)
                 & (F.col("cum") >= half))
    med = lo.agg(((F.min("d") + F.max("d")) / 2).alias("hl"))
    counts = base.agg(
        F.sum(F.when(F.col("s"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("s"), 1).otherwise(0)).alias("n_b"))
    return (counts.crossJoin(F.broadcast(med))
            .select(F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    (F.col("n_a") * F.col("n_b")).cast("long")
                    .alias("n_pairs"),
                    F.round("hl", round_to).alias("hl_shift")))


def ansari_bradley(df: DataFrame, value_col: str, *, split: Column,
                   round_to: int = 6) -> DataFrame:
    """Ansari-Bradley two-sample SCALE test (Ansari & Bradley 1960):
    are the two sides equally DISPERSED around a common center? Rank
    from both ends inward — score(r) = min(r, N+1−r) on the joint
    ordering, tie-averaged — and sum side A's scores. Where
    Mann-Whitney sees location, AB sees spread: a variance blow-up
    with an unmoved median is invisible to MW and lights up here
    (the nonparametric sibling of :func:`brown_forsythe`).

        A = Σ_{i∈a} score_i,  exact tie-aware moments from the
        score-frequency table:  μ = n_a·s̄,
        σ² = n_a·n_b·(ss̄ − s̄²)/(N−1),   z = (A − μ)/σ

    Scores ride the DISTINCT-value counts table: tie-averaged
    both-end ranks are (2·cum_before + n + 1) and (2·(N−cum) + n
    + 1) halved-min composites — exact half-integers, no per-row
    window. Returns one row ``(n_a, n_b, ab_stat, mean_ab, var_ab,
    z)``.
    """
    base = df.select(F.col(value_col).cast("double").alias("v"),
                     split.alias("s")) \
             .where(F.col("v").isNotNull() & F.col("s").isNotNull())
    vc = base.groupBy("v").agg(
        F.sum(F.when(F.col("s"), 1).otherwise(0))
         .cast("double").alias("na"),
        F.count(F.lit(1)).cast("double").alias("n"))
    w_pfx = (Window.orderBy("v")
             .rowsBetween(Window.unboundedPreceding, -1))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    cumb = F.coalesce(F.sum("n").over(w_pfx), F.lit(0.0))
    nn = F.sum("n").over(tot)
    # tie-block average of min(r, N+1-r) over the block's ranks:
    # ranks occupy [cumb+1, cumb+n]; from-the-end ranks occupy
    # [N-cumb-n+1, N-cumb]. The blockwise mean of the elementwise
    # min is derived from the overlap of the two arithmetic runs.
    lo1 = cumb + 1                       # first forward rank
    lo2 = nn - cumb - F.col("n") + 1     # first backward rank
    # elementwise: min(lo1+i, N+1-(lo1+i)) for i in 0..n-1.
    # split at the crossover rank m = floor(N/2): forward ranks ≤ m
    # keep themselves, ranks > N-m keep the mirrored value. Sum in
    # closed form via clamped run segments.
    m = F.floor(nn / 2)

    def run_sum(first, cnt):
        # sum of arithmetic run first, first+1, … (cnt terms)
        return cnt * first + cnt * (cnt - 1) / 2

    # forward part: ranks r in [lo1, lo1+n-1] with r <= m
    fwd_cnt = F.greatest(
        F.least(m - lo1 + 1, F.col("n")), F.lit(0.0))
    fwd_sum = run_sum(lo1, fwd_cnt)
    # mirrored part: remaining ranks use N+1-r, a descending run
    rem_cnt = F.col("n") - fwd_cnt
    rem_first = nn + 1 - (lo1 + fwd_cnt)     # largest mirrored score
    rem_sum = rem_cnt * rem_first - rem_cnt * (rem_cnt - 1) / 2
    block_sum = fwd_sum + rem_sum            # Σ scores in tie block
    avg_score = block_sum / F.col("n")
    scored = vc.select("na", "n", avg_score.alias("sc"))
    a = scored.agg(
        F.sum(F.col("na") * F.col("sc")).alias("ab"),
        F.sum("na").alias("ta"),
        F.sum("n").alias("tn"),
        F.sum(F.col("n") * F.col("sc")).alias("ssum"),
        F.sum(F.col("n") * F.col("sc") ** 2).alias("ssq"))
    na, nb = F.col("ta"), F.col("tn") - F.col("ta")
    sbar = F.col("ssum") / F.col("tn")
    s2bar = F.col("ssq") / F.col("tn")
    mean_ab = na * sbar
    var_ab = na * nb * (s2bar - sbar ** 2) / (F.col("tn") - 1)
    return a.select(
        na.cast("long").alias("n_a"), nb.cast("long").alias("n_b"),
        F.round("ab", round_to).alias("ab_stat"),
        F.round(mean_ab, round_to).alias("mean_ab"),
        F.round(var_ab, round_to).alias("var_ab"),
        F.round(F.when(var_ab > 0,
                       (F.col("ab") - mean_ab) / F.sqrt(var_ab)),
                round_to).alias("z"))


def hampel_filter(df: DataFrame, value_col: str, order_col: str, *,
                  half_window: int = 3, k: float = 3.0,
                  round_to: int = 6) -> DataFrame:
    """Hampel identifier (Hampel 1974) over an ordered series:
    each point is scored against the MEDIAN and MAD of its ±w
    neighborhood — the robust rolling outlier filter that a level
    shift cannot drag along (a rolling mean ± z·sd follows the
    outlier; the rolling median doesn't). Flag when

        |x_i − med_i| > k · 1.4826 · MAD_i      (MAD_i > 0)

    and, when the whole window is constant (MAD 0), when the value
    differs from the window median at all. Tiny-series contract
    (daily/hourly aggregates): the neighborhood is a RANGE self-join
    on the numeric order column, so calendar gaps shrink the
    neighborhood instead of silently stretching it. Returns the full
    scored curve ``(order, value, med, mad, score, flagged)``.
    """
    s = df.select(F.col(order_col).cast("double").alias("i"),
                  F.col(value_col).cast("double").alias("v")) \
          .where(F.col("i").isNotNull() & F.col("v").isNotNull())
    w = float(half_window)
    a, b = s.alias("a"), s.alias("b")
    nbrs = a.join(b, (F.col("b.i") >= F.col("a.i") - w)
                  & (F.col("b.i") <= F.col("a.i") + w))
    med = (nbrs.groupBy(F.col("a.i").alias("i"))
           .agg(F.expr("percentile(b.v, 0.5)").alias("med")))
    nbrs2 = (a.join(b, (F.col("b.i") >= F.col("a.i") - w)
                    & (F.col("b.i") <= F.col("a.i") + w))
             .join(med.alias("m"), F.col("a.i") == F.col("m.i"))
             .select(F.col("a.i").alias("i"),
                     F.col("a.v").alias("v"), F.col("m.med"),
                     F.abs(F.col("b.v") - F.col("m.med"))
                      .alias("dev")))
    curve = (nbrs2.groupBy("i")
             .agg(F.first("v").alias("v"), F.first("med").alias("med"),
                  F.expr("percentile(dev, 0.5)").alias("mad")))
    score = F.try_divide(F.abs(F.col("v") - F.col("med")),
                         1.4826 * F.col("mad"))
    flagged = F.when(F.col("mad") > 0,
                     F.abs(F.col("v") - F.col("med"))
                     > k * 1.4826 * F.col("mad")) \
               .otherwise(F.col("v") != F.col("med"))
    return curve.select(
        F.col("i").alias("order"),
        F.round("v", round_to).alias("value"),
        F.round("med", round_to).alias("med"),
        F.round("mad", round_to).alias("mad"),
        F.round(score, round_to).alias("score"),
        flagged.alias("flagged"))


def rbo_top_terms(df_a: DataFrame, df_b: DataFrame, term_col: str,
                  *, k: int = 50, p: float = 0.9,
                  round_to: int = 6) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010), truncated
    at depth k, between the two sides' TOP-TERM lists — the
    principled "did the vocabulary head change" score: top-weighted
    (a swap at rank 2 costs more than at rank 40), and defined for
    lists that only partially overlap, where plain Jaccard@k throws
    the ranks away and Spearman needs identical membership.

        RBO_trunc = (1−p) Σ_{d≤k} p^{d−1}·|A_d ∩ B_d|/d
                  = (1−p) Σ_{t∈A∩B} T(max(r_A, r_B)),
        T(m) = Σ_{d=m}^{k} p^{d−1}/d     (suffix table, k rows)

    Inputs are term frames (one row per occurrence); ranking is by
    (count desc, term asc) — fully deterministic. Everything beyond
    the two term counts rides k-row frames. Returns one row
    ``(k, p, n_common, rbo)``.
    """
    kk, pp = int(k), float(p)

    def top(d: DataFrame) -> DataFrame:
        c = (d.where(F.col(term_col).isNotNull())
             .groupBy(F.col(term_col).alias("t"))
             .agg(F.count(F.lit(1)).alias("n")))
        w = Window.orderBy(F.col("n").desc(), F.col("t"))
        return (c.select("t", F.row_number().over(w).alias("r"))
                .where(F.col("r") <= kk))
    ta, tb = top(df_a), top(df_b)
    joined = (ta.alias("x").join(tb.alias("y"),
                                 F.col("x.t") == F.col("y.t"))
              .select(F.greatest(F.col("x.r"), F.col("y.r"))
                      .alias("m")))
    spark = df_a.sparkSession
    depths = spark.range(1, kk + 1).select(
        F.col("id").alias("d"),
        (F.pow(F.lit(pp), F.col("id") - 1) / F.col("id"))
         .alias("wd"))
    wsfx = (Window.orderBy("d")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    tails = depths.select(F.col("d").alias("m"),
                          F.sum("wd").over(wsfx).alias("tail"))
    contrib = joined.join(F.broadcast(tails), "m")
    agg = contrib.agg(F.count(F.lit(1)).alias("n_common"),
                      F.sum("tail").alias("tsum"))
    return agg.select(
        F.lit(kk).alias("k"), F.lit(pp).alias("p"),
        F.col("n_common").cast("long").alias("n_common"),
        F.round((1 - pp) * F.coalesce(F.col("tsum"), F.lit(0.0)),
                round_to).alias("rbo"))


def ratio_ci_delta(df: DataFrame, num_col: str, den_col: str, *,
                   by: str | None = None,
                   round_to: int = 6) -> DataFrame:
    """Delta-method CI for a RATIO-of-sums metric (Σx/Σy — revenue
    per click, tokens per doc, violations per crawl) over iid units:
    naive per-row CIs are wrong because numerator and denominator
    share units; the delta method propagates the unit-level
    covariance:

        r = x̄/ȳ,
        Var(r) ≈ (var_x + r²·var_y − 2r·cov_xy) / (n·ȳ²)

    (Fieller's exact interval degenerates at the same places the
    guard nulls this one.) Aggregate to the UNIT level first — the
    CI is clustered on whatever rows represent. ONE aggregation per
    group, sample moments. Returns ``([group], n, ratio, se, ci_lo,
    ci_hi)`` with 95% normal bounds; NULL when ȳ ≤ 0 or n < 2.
    """
    grp = F.col(by) if by else F.lit(0)
    base = df.select(grp.alias("g"),
                     F.col(num_col).cast("double").alias("x"),
                     F.col(den_col).cast("double").alias("y")) \
             .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    a = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"), F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"), F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"))
    r = F.col("mx") / F.col("my")
    ok = (F.col("my") > 0) & (F.col("n") >= 2)
    var_r = (F.col("vx") + r ** 2 * F.col("vy")
             - 2 * r * F.col("cxy")) / (F.col("n")
                                        * F.col("my") ** 2)
    se = F.sqrt(F.greatest(var_r, F.lit(0.0)))
    out = a.select(
        F.col("g").alias("group"),
        F.col("n").cast("long").alias("n"),
        F.round(F.when(ok, r), round_to).alias("ratio"),
        F.round(F.when(ok, se), round_to).alias("se"),
        F.round(F.when(ok, r - 1.96 * se), round_to).alias("ci_lo"),
        F.round(F.when(ok, r + 1.96 * se), round_to).alias("ci_hi"))
    return out if by else out.drop("group")


def float_anomalies(df: DataFrame, value_col: str, *,
                    by: str | None = None) -> DataFrame:
    """IEEE-754 hygiene census for a double column — the float
    anomalies that sail through a null check and poison aggregates
    downstream: NaN (kills sums silently in some engines, propagates
    in others), ±Inf (one overflow in a derived metric), NEGATIVE
    ZERO (breaks naive `sign(x) == -1 or x == 0` branching and
    string round-trips), and SUBNORMALS (precision collapse, often
    an underflowed division upstream). A different axis than the
    range/outlier rows: these are REPRESENTATION defects, not
    statistical ones. Negative zero is detected via the string cast
    (both engines print "-0.0"), since 1/x probes trip ANSI
    division guards.

    ONE aggregation. Returns ``([group], n, n_null, n_nan, n_posinf,
    n_neginf, n_negzero, n_subnormal, n_clean)``.
    """
    grp = F.col(by) if by else F.lit(0)
    v = F.col(value_col).cast("double")
    base = df.select(grp.alias("g"), v.alias("v"))
    is_null = F.col("v").isNull()
    is_nan = F.isnan("v")
    posinf = F.col("v") == float("inf")
    neginf = F.col("v") == float("-inf")
    negzero = ((F.col("v") == 0)
               & F.col("v").cast("string").startswith("-"))
    subnormal = ((F.abs("v") > 0)
                 & (F.abs("v") < 2.2250738585072014e-308))
    bad = (is_null | is_nan | posinf | neginf | negzero | subnormal)
    c = lambda p: F.sum(p.cast("long"))
    out = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        c(is_null).alias("n_null"), c(is_nan).alias("n_nan"),
        c(posinf).alias("n_posinf"), c(neginf).alias("n_neginf"),
        c(negzero).alias("n_negzero"),
        c(subnormal).alias("n_subnormal"),
        c(~bad).alias("n_clean"))
    out = out.withColumnRenamed("g", "group")
    return out if by else out.drop("group")


def attribution_credit(df: DataFrame, *, entity_col: str,
                       ts_col: str, conv_pred: Column,
                       touch_pred: Column, type_col: str,
                       round_to: int = 6) -> DataFrame:
    """Multi-touch attribution over event streams: every conversion
    distributes one unit of credit across the entity's PRIOR touch
    events under four standard models — first-touch, last-touch,
    linear (1/k each) and U-shaped (40/20/40: 0.4 to first and last,
    0.2 split over the middle; 1.0 / 0.5-0.5 for k=1 / k=2). The
    per-touch-type totals answer "which upstream event type actually
    precedes purchases", which a raw funnel share cannot (funnels
    ignore multiplicity and position).

    Plan: conversions × prior-touches join keyed on the entity (the
    one real shuffle; per-entity history is the bounded dimension —
    cap or window it upstream for hot entities), then rank windows
    PER CONVERSION (tiny partitions) and one final type aggregation.
    Returns per-type rows ``(touch_type, n_touches, ft_credit,
    lt_credit, linear_credit, u_credit)``.
    """
    ts = F.col(ts_col).cast("timestamp").cast("double")
    base = df.where(F.col(entity_col).isNotNull()
                    & F.col(ts_col).isNotNull())
    convs = base.where(conv_pred).select(
        F.col(entity_col).alias("e"), ts.alias("tc"))
    touches = base.where(touch_pred).select(
        F.col(entity_col).alias("e"), ts.alias("tt"),
        F.col(type_col).alias("ty"))
    pairs = convs.join(touches, "e").where(F.col("tt") < F.col("tc"))
    wconv = Window.partitionBy("e", "tc")
    rn = F.row_number().over(wconv.orderBy("tt", "ty"))
    kk = F.count(F.lit(1)).over(wconv)
    scored = pairs.select("ty", rn.alias("rn"), kk.alias("kk"))
    first = F.col("rn") == 1
    last = F.col("rn") == F.col("kk")
    ft = F.when(first, 1.0).otherwise(0.0)
    lt = F.when(last, 1.0).otherwise(0.0)
    lin = 1.0 / F.col("kk")
    u = (F.when(F.col("kk") == 1, 1.0)
         .when(F.col("kk") == 2, 0.5)
         .otherwise(F.when(first | last, 0.4)
                    .otherwise(0.2 / (F.col("kk") - 2))))
    agg = scored.groupBy(F.col("ty").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum(ft).cast("long").alias("conversions_first"),
        F.round(F.sum(ft), round_to).alias("ft_credit"),
        F.round(F.sum(lt), round_to).alias("lt_credit"),
        F.round(F.sum(lin), round_to).alias("linear_credit"),
        F.round(F.sum(u), round_to).alias("u_credit"))
    return agg.drop("conversions_first")


def cvar_tail(df: DataFrame, value_col: str, *, by: str,
              alpha: float = 0.95, round_to: int = 6) -> DataFrame:
    """Conditional value-at-risk (expected shortfall) per group:
    VaR_α is the α-quantile; CVaR_α is the MEAN of everything at or
    beyond it — "when a bad day happens, how bad is it on average",
    the coherent tail metric the quantile alone understates (two
    corpora can share q95 while one's tail is 10× heavier). The
    companion to :func:`gumbel_maxima` (block extremes) for
    within-block tails.

    Exact two-stage: per-group quantile, broadcast back, conditional
    mean over v ≥ VaR (ties at the threshold included — documented
    convention). Returns ``(group, n, var_q, cvar, tail_n)``.
    """
    a = float(alpha)
    base = df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & F.col("v").isNotNull())
    q = base.groupBy("g").agg(
        F.expr(f"percentile(v, {a})").alias("var_q"),
        F.count(F.lit(1)).alias("n"))
    j = base.join(F.broadcast(q), "g")
    out = (j.where(F.col("v") >= F.col("var_q"))
           .groupBy("g")
           .agg(F.first("n").alias("n"),
                F.first("var_q").alias("var_q"),
                F.avg("v").alias("cvar"),
                F.count(F.lit(1)).alias("tail_n")))
    return out.select(
        F.col("g").alias("group"), F.col("n").cast("long").alias("n"),
        F.round("var_q", round_to).alias("var_q"),
        F.round("cvar", round_to).alias("cvar"),
        F.col("tail_n").cast("long").alias("tail_n"))


def encoding_advisor(df: DataFrame, cols: Sequence[str],
                     order_col: str, *,
                     round_to: int = 6) -> DataFrame:
    """Columnar-encoding advisor — the physical-design sibling of
    :func:`partition_advisor` / :func:`zorder_key`: per column,
    the three statistics that decide a parquet/ORC encoding and the
    suggestion they imply:

        distinct_ratio < 1%            → DICT
        avg run length ≥ 4 (ordered)   → RLE   (wins over dict)
        ≥ 99% non-decreasing steps     → DELTA (numeric ids, ts)
        otherwise                      → PLAIN

    Run-length and monotonicity are measured in *order_col* order —
    the file's write order, which is what the encoder sees. ONE sort
    window feeds every column's lag probes, then one aggregation;
    at 10¹² rows run this on a file-sized SAMPLE (the advisor's
    answer is per-file anyway). Returns one row per column
    ``(column, n, n_distinct, distinct_ratio, avg_run_len,
    monotone_share, suggestion)``.
    """
    w = Window.orderBy(order_col)
    probes = []
    for c in cols:
        v = F.col(c)
        lagv = F.lag(c).over(w)
        probes += [
            (~v.eqNullSafe(lagv)).cast("long").alias(f"brk_{c}"),
            F.when(lagv.isNull(), None)
             .otherwise((v >= lagv).cast("long"))
             .alias(f"mono_{c}")]
    s = df.select(*[F.col(c) for c in cols], *probes)
    aggs = []
    for c in cols:
        aggs += [F.count(F.col(c)).alias(f"n_{c}"),
                 F.countDistinct(F.col(c)).alias(f"d_{c}"),
                 F.sum(f"brk_{c}").alias(f"runs_{c}"),
                 F.avg(f"mono_{c}").alias(f"ms_{c}")]
    a = s.agg(*aggs)
    outs = []
    for c in cols:
        n = F.col(f"n_{c}").cast("double")
        ratio = F.try_divide(F.col(f"d_{c}"), n)
        avg_run = F.try_divide(n, F.col(f"runs_{c}"))
        mono = F.col(f"ms_{c}")
        sugg = (F.when(avg_run >= 4, F.lit("rle"))
                .when(ratio < 0.01, F.lit("dict"))
                .when(mono > 0.99, F.lit("delta"))
                .otherwise(F.lit("plain")))
        outs.append(a.select(
            F.lit(c).alias("column"),
            n.cast("long").alias("n"),
            F.col(f"d_{c}").cast("long").alias("n_distinct"),
            F.round(ratio, round_to).alias("distinct_ratio"),
            F.round(avg_run, round_to).alias("avg_run_len"),
            F.round(mono, round_to).alias("monotone_share"),
            sugg.alias("suggestion")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def breusch_godfrey(df: DataFrame, x_col: str, y_col: str,
                    order_col: str, *,
                    round_to: int = 6) -> DataFrame:
    """Breusch-Godfrey LM test (Breusch 1978, Godfrey 1978) for
    FIRST-ORDER serial correlation in the residuals of y ~ a + b·x
    ordered by *order_col*: the auxiliary regression e_t ~ x_t +
    e_{t−1} gives LM = (n−1)·R²_aux ~ χ²(1). Durbin-Watson's lag-1
    statistic is biased toward 2 when x is itself trending; BG
    conditions on x and is the textbook replacement. Tiny-series
    contract (run on the aggregated daily frame).

    R²_aux for the two-regressor case closes over the pairwise
    correlations — everything is sufficient statistics, two chained
    aggregations. Returns one row ``(n, r2_aux, lm_stat, dof)``.
    """
    s = df.select(F.col(order_col).alias("t"),
                  F.col(x_col).cast("double").alias("x"),
                  F.col(y_col).cast("double").alias("y")) \
          .where(F.col("t").isNotNull() & F.col("x").isNotNull()
                 & F.col("y").isNotNull())
    a1 = s.agg(F.avg("x").alias("mx"), F.avg("y").alias("my"),
               F.covar_pop("x", "y").alias("cxy"),
               F.var_pop("x").alias("vx"))
    res = (s.crossJoin(F.broadcast(a1))
           .select("t", "x",
                   (F.col("y") - F.col("my")
                    - F.col("cxy") / F.col("vx")
                    * (F.col("x") - F.col("mx"))).alias("e")))
    w = Window.orderBy("t")
    lagd = res.select("x", "e", F.lag("e").over(w).alias("el")) \
              .where(F.col("el").isNotNull())
    a2 = lagd.agg(F.count(F.lit(1)).cast("double").alias("n"),
                  F.corr("e", "x").alias("r1"),
                  F.corr("e", "el").alias("r2"),
                  F.corr("x", "el").alias("r12"))
    r2aux = F.when(
        F.col("r12") ** 2 < 1,
        (F.col("r1") ** 2 + F.col("r2") ** 2
         - 2 * F.col("r1") * F.col("r2") * F.col("r12"))
        / (1 - F.col("r12") ** 2))
    return a2.select(
        F.col("n").cast("long").alias("n"),
        F.round(r2aux, round_to).alias("r2_aux"),
        F.round(F.col("n") * r2aux, round_to).alias("lm_stat"),
        F.lit(1).alias("dof"))


def yuen_trimmed_t(df: DataFrame, value_col: str, *, split: Column,
                   trim: float = 0.2,
                   round_to: int = 6) -> DataFrame:
    """Yuen's trimmed-mean t-test (Yuen 1974): Welch's test on
    20%-TRIMMED means with winsorized variances — the two-sample
    location test that keeps its nominal error rate under the heavy
    tails that wreck the plain t (and answers in VALUE units, which
    the rank tests don't). Trim thresholds are EXACT order
    statistics x_(g+1), x_(n−g) per side, found on the distinct-
    value cumulative table; winsorization is then a clamp, and the
    trimmed mean closes over the winsorized sum:

        tm = (n·x̄_w − g·lo − g·hi) / h,    h = n − 2g
        d  = (n−1)·s²_w / (h(h−1)),        t = Δtm / √(d₁+d₂)

    with Welch-Satterthwaite df on (h₁−1, h₂−1). Two aggregations
    plus two tiny threshold joins. Returns one row ``(n_a, n_b,
    h_a, h_b, tm_a, tm_b, t_stat, dof)``.
    """
    tr = float(trim)
    base = df.select(F.col(value_col).cast("double").alias("v"),
                     split.alias("s")) \
             .where(F.col("v").isNotNull() & F.col("s").isNotNull())
    vc = base.groupBy("s", "v").agg(
        F.count(F.lit(1)).cast("double").alias("c"))
    wcum = (Window.partitionBy("s").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = vc.select("s", "v", F.sum("c").over(wcum).alias("cum"))
    ns = base.groupBy("s").agg(F.count(F.lit(1)).cast("double")
                               .alias("n"))
    g = F.floor(F.col("n") * tr)
    cumn = cum.join(F.broadcast(ns), "s")
    lo = (cumn.where(F.col("cum") >= g + 1)
          .groupBy("s").agg(F.min("v").alias("lo")))
    hi = (cumn.where(F.col("cum") >= F.col("n") - g)
          .groupBy("s").agg(F.min("v").alias("hi")))
    thr = ns.join(F.broadcast(lo), "s").join(F.broadcast(hi), "s") \
            .select("s", "n", g.alias("g"), "lo", "hi")
    wins = (base.join(F.broadcast(thr), "s")
            .select("s", "n", "g", "lo", "hi",
                    F.greatest(F.least(F.col("v"), F.col("hi")),
                               F.col("lo")).alias("vw")))
    per = wins.groupBy("s").agg(
        F.first("n").alias("n"), F.first("g").alias("g"),
        F.first("lo").alias("lo"), F.first("hi").alias("hi"),
        F.avg("vw").alias("wm"), F.var_samp("vw").alias("wv"))
    h = F.col("n") - 2 * F.col("g")
    tm = (F.col("n") * F.col("wm") - F.col("g") * F.col("lo")
          - F.col("g") * F.col("hi")) / h
    d = (F.col("n") - 1) * F.col("wv") / (h * (h - 1))
    sided = per.select("s", F.col("n").alias("n"), h.alias("h"),
                       tm.alias("tm"), d.alias("d"))
    a = sided.where(F.col("s")).select(
        F.col("n").alias("n_a"), F.col("h").alias("h_a"),
        F.col("tm").alias("tm_a"), F.col("d").alias("d_a"))
    b = sided.where(~F.col("s")).select(
        F.col("n").alias("n_b"), F.col("h").alias("h_b"),
        F.col("tm").alias("tm_b"), F.col("d").alias("d_b"))
    j = a.crossJoin(F.broadcast(b))
    dsum = F.col("d_a") + F.col("d_b")
    t = (F.col("tm_a") - F.col("tm_b")) / F.sqrt(dsum)
    cshare = F.col("d_a") / dsum
    dof = 1.0 / (cshare ** 2 / (F.col("h_a") - 1)
                 + (1 - cshare) ** 2 / (F.col("h_b") - 1))
    return j.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("h_a").cast("long").alias("h_a"),
        F.col("h_b").cast("long").alias("h_b"),
        F.round("tm_a", round_to).alias("tm_a"),
        F.round("tm_b", round_to).alias("tm_b"),
        F.round(F.when(dsum > 0, t), round_to).alias("t_stat"),
        F.round(dof, round_to).alias("dof"))


def cluster_robust_slope(df: DataFrame, x_col: str, y_col: str, *,
                         cluster_col: str,
                         round_to: int = 6) -> DataFrame:
    """OLS slope of y ~ a + b·x with CLUSTER-ROBUST (CR1 /
    Liang-Zeger) standard errors: rows sharing a cluster (user,
    host, day) violate the iid assumption every naive SE rests on —
    with strong within-cluster correlation the naive SE can be
    wrong by √(cluster size). The sandwich sums the per-cluster
    score Σ_{i∈g} x̃_i e_i BEFORE squaring:

        Var(b) = c/Sxx² · Σ_g (Σ_{i∈g} x̃_i e_i)²,
        c = G/(G−1) · (n−1)/(n−2)

    Three chained aggregations, all sufficient statistics (the
    residual is a closed-form projection). Returns one row ``(n,
    n_clusters, slope, se_naive, se_cluster, inflation)``.
    """
    s = df.select(F.col(x_col).cast("double").alias("x"),
                  F.col(y_col).cast("double").alias("y"),
                  F.col(cluster_col).alias("g")) \
          .where(F.col("x").isNotNull() & F.col("y").isNotNull()
                 & F.col("g").isNotNull())
    a1 = s.agg(F.count(F.lit(1)).cast("double").alias("n"),
               F.avg("x").alias("mx"), F.avg("y").alias("my"),
               F.covar_pop("x", "y").alias("cxy"),
               F.var_pop("x").alias("vx"))
    j = s.crossJoin(F.broadcast(a1))
    xt = F.col("x") - F.col("mx")
    e = (F.col("y") - F.col("my")
         - F.col("cxy") / F.col("vx") * xt)
    per_g = (j.select("g", (xt * e).alias("u"),
                      (xt ** 2).alias("x2"), (e ** 2).alias("e2"),
                      "n", "cxy", "vx")
             .groupBy("g")
             .agg(F.sum("u").alias("ug"), F.sum("x2").alias("x2g"),
                  F.sum("e2").alias("e2g"),
                  F.first("n").alias("n"),
                  F.first("cxy").alias("cxy"),
                  F.first("vx").alias("vx")))
    a2 = per_g.agg(
        F.first("n").alias("n"),
        F.count(F.lit(1)).cast("double").alias("gg"),
        F.sum(F.col("ug") ** 2).alias("u2"),
        F.sum("x2g").alias("sxx"), F.sum("e2g").alias("sse"),
        F.first("cxy").alias("cxy"), F.first("vx").alias("vx"))
    n, gg = F.col("n"), F.col("gg")
    slope = F.col("cxy") / F.col("vx")
    se_naive = F.sqrt(F.col("sse") / (n - 2) / F.col("sxx"))
    corr = gg / (gg - 1) * (n - 1) / (n - 2)
    se_cl = F.sqrt(corr * F.col("u2") / F.col("sxx") ** 2)
    return a2.select(
        n.cast("long").alias("n"), gg.cast("long").alias("n_clusters"),
        F.round(slope, round_to).alias("slope"),
        F.round(se_naive, round_to).alias("se_naive"),
        F.round(se_cl, round_to).alias("se_cluster"),
        F.round(F.try_divide(se_cl, se_naive), round_to)
         .alias("inflation"))


def permutation_test_mean(df: DataFrame, value_col: str, *,
                          split: Column, id_col: str,
                          n_perm: int = 64,
                          round_to: int = 6) -> DataFrame:
    """Deterministic randomization test for a mean difference: the
    observed Δ = mean_A − mean_B is compared against *n_perm* ≤ 128
    pseudo-random relabelings, every one derived from the BITS of a
    single md5(id) per row — fully reproducible on any engine, no
    RNG state, and NO row blowup: relabeling b uses bit b of the
    hash, so all n_perm deltas fold into one aggregation pass (2
    conditional sums per b), then a driver-free horizontal array
    fold computes the p-value. Add-one smoothed, the standard
    Monte-Carlo convention. The relabeling is a fair-coin
    assignment, not a size-preserving permutation — the
    randomization-test variant; document when exact group sizes
    matter.

    Returns ``(n_a, n_b, delta_obs, n_perm, n_ge, p_value)``.
    """
    b = int(n_perm)
    if b > 128:
        raise ValueError("n_perm is capped at 128 (md5 bit budget)")
    n_nib = (b + 3) // 4
    h = F.md5(F.col(id_col).cast("string"))
    # hex nibbles parsed ONCE in a projection (same trick as
    # aa_calibration): the 2*b aggregates read integer columns
    base = df.select(
        F.col(value_col).cast("double").alias("v"), split.alias("s"),
        *[F.conv(F.substring(h, i + 1, 1), 16, 10).cast("long")
          .alias(f"nib{i}") for i in range(n_nib)]) \
        .where(F.col("v").isNotNull() & F.col("s").isNotNull())

    def bit(i: int):
        return F.shiftright(F.col(f"nib{i // 4}"), i % 4) \
                .bitwiseAND(F.lit(1)) == 0

    aggs = [
        (F.avg(F.when(F.col("s"), F.col("v")))
         - F.avg(F.when(~F.col("s"), F.col("v")))).alias("d_obs"),
        F.sum(F.when(F.col("s"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("s"), 1).otherwise(0)).alias("n_b")]
    for i in range(b):
        f = bit(i)
        aggs += [F.sum(F.when(f, F.col("v"))).alias(f"sx{i}"),
                 F.sum(F.when(f, 1).otherwise(0)).alias(f"cx{i}")]
    # one total sum/count pair serves every b
    aggs += [F.sum("v").alias("s_tot"),
             F.count(F.lit(1)).cast("double").alias("c_tot")]
    a = base.agg(*aggs)
    deltas = F.array(*[
        (F.col(f"sx{i}") / F.col(f"cx{i}")
         - (F.col("s_tot") - F.col(f"sx{i}"))
         / (F.col("c_tot") - F.col(f"cx{i}")))
        for i in range(b)])
    n_ge = F.size(F.filter(
        deltas, lambda d: F.abs(d) >= F.abs(F.col("d_obs"))))
    return a.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("d_obs", round_to).alias("delta_obs"),
        F.lit(b).alias("n_perm"),
        n_ge.cast("long").alias("n_ge"),
        F.round((n_ge + 1) / F.lit(float(b + 1)), round_to)
         .alias("p_value"))

def conformal_interval(df: DataFrame, x_col: str, y_col: str, *,
                       id_col: str, alpha: float = 0.1,
                       round_to: int = 6) -> DataFrame:
    """Split-conformal prediction interval (Vovk et al.; Lei et al.
    2018) for the linear gate y ~ a + b·x: fit on one md5-bit half,
    take the ⌈(n_c+1)(1−α)⌉-th smallest absolute residual on the
    OTHER half — the resulting ŷ ± q̂ interval has ≥ 1−α coverage
    for exchangeable data with NO distributional assumption, which
    is the honest way to turn a regression into an accept band
    (normal-theory intervals silently assume the Gaussian tails web
    data never has). Split is deterministic (bit 0 of md5(id)).

    Fit is closed-form sufficient statistics; the conformal
    quantile is an EXACT order statistic off the distinct-|r|
    cumulative table. Returns one row ``(n_fit, n_calib, slope,
    intercept, q_hat, coverage)`` — coverage is the calibration-side
    empirical check, ≥ 1−α by construction.
    """
    a = float(alpha)
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                           1, 1), 16, 10).cast("long")
    base = df.select(F.col(x_col).cast("double").alias("x"),
                     F.col(y_col).cast("double").alias("y"),
                     (h.bitwiseAND(F.lit(1)) == 0).alias("calib")) \
             .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    fit = base.where(~F.col("calib")).agg(
        F.count(F.lit(1)).alias("n_fit"),
        F.avg("x").alias("mx"), F.avg("y").alias("my"),
        F.covar_pop("x", "y").alias("cxy"),
        F.var_pop("x").alias("vx"))
    cal = (base.where(F.col("calib"))
           .crossJoin(F.broadcast(fit))
           .select("n_fit", "mx", "my", "cxy", "vx",
                   F.abs(F.col("y") - F.col("my")
                         - F.col("cxy") / F.col("vx")
                         * (F.col("x") - F.col("mx"))).alias("r")))
    nc = cal.agg(F.count(F.lit(1)).alias("n_c"))
    vc = cal.groupBy("r").agg(F.count(F.lit(1)).alias("c"))
    wcum = (Window.orderBy("r")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = vc.select("r", F.sum("c").over(wcum).alias("cum")) \
            .crossJoin(F.broadcast(nc))
    k = F.least(F.ceil((F.col("n_c") + 1) * (1.0 - a)),
                F.col("n_c"))
    q = (cum.where(F.col("cum") >= k)
         .agg(F.min("r").alias("q_hat")))
    cov = (cal.crossJoin(F.broadcast(q))
           .agg(F.avg((F.col("r") <= F.col("q_hat"))
                      .cast("double")).alias("coverage"),
                F.first("q_hat").alias("q_hat"),
                F.count(F.lit(1)).alias("n_calib"),
                F.first("n_fit").alias("n_fit"),
                F.first("cxy").alias("cxy"),
                F.first("vx").alias("vx"),
                F.first("mx").alias("mx"),
                F.first("my").alias("my")))
    slope = F.col("cxy") / F.col("vx")
    return cov.select(
        F.col("n_fit").cast("long").alias("n_fit"),
        F.col("n_calib").cast("long").alias("n_calib"),
        F.round(slope, round_to).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), round_to)
         .alias("intercept"),
        F.round("q_hat", round_to).alias("q_hat"),
        F.round("coverage", round_to).alias("coverage"))


def bernstein_bound(df: DataFrame, value_col: str, *, by: str,
                    lo: float, hi: float, delta: float = 0.05,
                    round_to: int = 6) -> DataFrame:
    """Empirical-Bernstein confidence bound (Maurer & Pontil 2009)
    for the mean of a BOUNDED metric per group:

        half = √(2·v̂·ln(3/δ)/n) + 3(hi−lo)·ln(3/δ)/n

    — a FINITE-SAMPLE guarantee, no normality plea: valid at n=30
    where the CLT interval is a hope, and variance-adaptive where
    plain Hoeffding pays the full range. The right bound for gating
    small segments (per-host pass rates, per-lang shares) where the
    z-interval under-covers. Values are clamp-audited: rows outside
    [lo, hi] are COUNTED (they void the guarantee), not silently
    clipped. One aggregation. Returns ``(group, n, n_oob, mean,
    var, eb_half, lo_bound, hi_bound)`` with bounds clipped to the
    metric range.
    """
    d = float(delta)
    rng = float(hi) - float(lo)
    ln3d = math.log(3.0 / d)
    base = df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & F.col("v").isNotNull())
    oob = (F.col("v") < float(lo)) | (F.col("v") > float(hi))
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(oob.cast("long")).alias("n_oob"),
        F.avg("v").alias("m"), F.var_samp("v").alias("s2"))
    half = (F.sqrt(2 * F.col("s2") * ln3d / F.col("n"))
            + 3 * rng * ln3d / F.col("n"))
    return agg.select(
        F.col("g").alias("group"), F.col("n").cast("long").alias("n"),
        F.col("n_oob").cast("long").alias("n_oob"),
        F.round("m", round_to).alias("mean"),
        F.round("s2", round_to).alias("var"),
        F.round(half, round_to).alias("eb_half"),
        F.round(F.greatest(F.col("m") - half, F.lit(float(lo))),
                round_to).alias("lo_bound"),
        F.round(F.least(F.col("m") + half, F.lit(float(hi))),
                round_to).alias("hi_bound"))


def basket_rules(df: DataFrame, *, basket_cols: Sequence[str],
                 item_col: str, min_support: float = 0.01,
                 round_to: int = 6) -> DataFrame:
    """Pairwise association rules over baskets (the support /
    confidence / lift triple of Agrawal et al. 1993, restricted to
    single-item antecedents): a basket is whatever *basket_cols*
    identifies (user x day, session, order), and for every ordered
    item pair A->B present together in >= min_support of baskets:

        support    = P(A and B)      confidence = P(B | A)
        lift       = P(B | A)/P(B)   (>1 means genuine affinity)

    The basket-level DISTINCT projection comes first, so item
    multiplicity inside a basket never inflates support, and the
    pair join runs per basket (bounded by per-basket item
    cardinality, not rows). Returns ``(antecedent, consequent,
    n_both, support, confidence, lift)``.
    """
    bcols = [F.col(c) for c in basket_cols]
    items = (df.where(F.col(item_col).isNotNull())
             .select(F.concat_ws("|", *bcols).alias("bk"),
                     F.col(item_col).alias("it"))
             .where(F.col("bk") != "")
             .distinct())
    nb = items.select("bk").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_baskets"))
    per_item = items.groupBy("it").agg(
        F.count(F.lit(1)).cast("double").alias("ni"))
    pairs = (items.alias("a")
             .join(items.alias("b"), F.col("a.bk") == F.col("b.bk"))
             .where(F.col("a.it") != F.col("b.it"))
             .groupBy(F.col("a.it").alias("ia"),
                      F.col("b.it").alias("ib"))
             .agg(F.count(F.lit(1)).cast("double").alias("nab")))
    j = (pairs
         .join(per_item.select(F.col("it").alias("ia"),
                               F.col("ni").alias("na")), "ia")
         .join(per_item.select(F.col("it").alias("ib"),
                               F.col("ni").alias("nbi")), "ib")
         .crossJoin(F.broadcast(nb)))
    supp = F.col("nab") / F.col("n_baskets")
    conf = F.col("nab") / F.col("na")
    lift = conf / (F.col("nbi") / F.col("n_baskets"))
    return (j.where(supp >= float(min_support))
            .select(F.col("ia").alias("antecedent"),
                    F.col("ib").alias("consequent"),
                    F.col("nab").cast("long").alias("n_both"),
                    F.round(supp, round_to).alias("support"),
                    F.round(conf, round_to).alias("confidence"),
                    F.round(lift, round_to).alias("lift")))


def dkw_band(df: DataFrame, value_col: str, *,
             delta: float = 0.05,
             round_to: int = 6) -> DataFrame:
    """Dvoretzky-Kiefer-Wolfowitz confidence band around the
    empirical CDF: with eps = sqrt(ln(2/delta)/2n), the TRUE
    distribution function lies within +/- eps of the empirical one
    EVERYWHERE, simultaneously - the uniform finite-sample companion
    to the pointwise quantile drill-downs: a gate placed at an
    empirical decile is really a gate at a probability in
    [p-eps, p+eps]. One quantile aggregation; eps is closed-form.
    Returns 9 rows ``(decile, value, p_lo, p_hi, epsilon)``.
    """
    dl = float(delta)
    base = df.select(F.col(value_col).cast("double").alias("v")) \
             .where(F.col("v").isNotNull())
    agg = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.expr(f"percentile(v, {k / 10.0})").alias(f"q{k}")
          for k in range(1, 10)])
    eps = F.sqrt(F.log(F.lit(2.0 / dl)) / (2 * F.col("n")))
    outs = []
    for k in range(1, 10):
        p = k / 10.0
        outs.append(agg.select(
            F.lit(k * 10).alias("decile"),
            F.round(F.col(f"q{k}"), round_to).alias("value"),
            F.round(F.greatest(F.lit(p) - eps, F.lit(0.0)),
                    round_to).alias("p_lo"),
            F.round(F.least(F.lit(p) + eps, F.lit(1.0)),
                    round_to).alias("p_hi"),
            F.round(eps, round_to).alias("epsilon")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def krippendorff_alpha(df: DataFrame, item_col: str,
                       category_col: str, *,
                       round_to: int = 6) -> DataFrame:
    """Krippendorff's alpha (nominal data): chance-corrected
    agreement that, unlike :func:`cohen_kappa` (exactly 2 raters)
    and :func:`fleiss_kappa` (constant rater count), accepts a
    VARIABLE number of ratings per item and simply drops
    single-rating items - the real shape of crowdsourced labels.
    From per-item category counts n_uc (item u, category c, m_u =
    total ratings of u, pairable items only):

        D_o = sum_u sum_c n_uc (m_u - n_uc) / (m_u - 1)
        D_e = (N - sum_c p_c^2 N) ...  via  1 - sum_c (N_c/N)^2
        alpha = 1 - (D_o / N) / (1 - sum_c (N_c/N)^2) * ...

    concretely the coincidence-matrix form: observed disagreement
    rate divided by expected disagreement rate over the pooled
    margins. Two aggregations over (item, category) cells. Returns
    ``(n_items, n_pairable, n_ratings, d_o, d_e, alpha)``.
    """
    cells = (df.select(F.col(item_col).alias("u"),
                       F.col(category_col).alias("c"))
             .where(F.col("u").isNotNull() & F.col("c").isNotNull())
             .groupBy("u", "c")
             .agg(F.count(F.lit(1)).cast("double").alias("n")))
    per_u = cells.groupBy("u").agg(F.sum("n").alias("m"))
    pair = cells.join(per_u, "u").where(F.col("m") > 1)
    # observed within-item disagreement, normalized per item pair
    do_terms = pair.groupBy("u").agg(
        F.first("m").alias("m"),
        F.sum(F.col("n") * (F.col("m") - F.col("n"))
              / (F.col("m") - 1)).alias("du"))
    a1 = do_terms.agg(
        F.count(F.lit(1)).alias("n_pairable"),
        F.sum("m").alias("nn"),
        F.sum("du").alias("d_o_sum"))
    marg = (pair.groupBy("c").agg(F.sum("n").alias("nc"))
            .agg(F.sum(F.col("nc") ** 2).alias("nc2"),
                 F.sum("nc").alias("ntot")))
    n_items = cells.select("u").distinct().agg(
        F.count(F.lit(1)).alias("n_items"))
    j = (a1.crossJoin(F.broadcast(marg))
         .crossJoin(F.broadcast(n_items)))
    d_o = F.col("d_o_sum") / F.col("nn")
    d_e = (1.0 - F.col("nc2") / F.col("ntot") ** 2) \
        * F.col("ntot") / (F.col("ntot") - 1)
    alpha = 1.0 - F.try_divide(d_o, d_e)
    return j.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_pairable").cast("long").alias("n_pairable"),
        F.col("nn").cast("long").alias("n_ratings"),
        F.round(d_o, round_to).alias("d_o"),
        F.round(d_e, round_to).alias("d_e"),
        F.round(alpha, round_to).alias("alpha"))


def dalenius_strata(df: DataFrame, value_col: str, *,
                    n_strata: int = 4, n_bins: int = 50,
                    round_to: int = 6) -> DataFrame:
    """Dalenius-Hodges cum-sqrt(f) stratification advisor (Dalenius
    & Hodges 1959): bin the column into *n_bins* equal-width bins,
    accumulate sqrt(bin frequency), and cut where the cumulative
    crosses equal shares - the classical rule that makes strata
    near-optimal for Neyman allocation (:func:`neyman_allocation`
    ALLOCATES to given strata; this DESIGNS them). Skewed web
    metrics stratified this way need far fewer samples per audit
    than equal-width strata.

    One histogram aggregation, windows over the n_bins frame.
    Returns per-stratum rows ``(stratum, lo_edge, hi_edge, n_rows,
    share)`` (hi edge of the last stratum = column max).
    """
    ks, nb = int(n_strata), int(n_bins)
    base = df.select(F.col(value_col).cast("double").alias("v")) \
             .where(F.col("v").isNotNull())
    ext = base.agg(F.min("v").alias("lo"), F.max("v").alias("hi"),
                   F.count(F.lit(1)).cast("double").alias("n"))
    width = (F.col("hi") - F.col("lo")) / nb
    binned = (base.crossJoin(F.broadcast(ext))
              .select(F.least(
                  F.floor((F.col("v") - F.col("lo")) / width),
                  F.lit(nb - 1)).cast("long").alias("b"),
                  "lo", "hi", "n")
              .groupBy("b")
              .agg(F.count(F.lit(1)).cast("double").alias("c"),
                   F.first("lo").alias("lo"),
                   F.first("hi").alias("hi"),
                   F.first("n").alias("n")))
    wc = (Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    scored = binned.select(
        "b", "c", "lo", "hi", "n",
        F.sum(F.sqrt("c")).over(wc).alias("csf"),
        F.sum(F.sqrt("c")).over(tot).alias("tsf"))
    stratum = F.least(
        F.floor(F.col("csf") / F.col("tsf") * ks + 1e-12),
        F.lit(ks - 1)).cast("long")
    width2 = (F.col("hi") - F.col("lo")) / nb
    per = (scored.select(stratum.alias("stratum"), "b", "c",
                         "lo", "hi", "n", width2.alias("w"))
           .groupBy("stratum")
           .agg((F.first("lo") + F.min("b") * F.first("w"))
                .alias("lo_edge"),
                (F.first("lo") + (F.max("b") + 1) * F.first("w"))
                .alias("hi_edge_raw"),
                F.max("hi").alias("vmax"),
                F.sum("c").alias("n_rows"),
                F.first("n").alias("n")))
    hi_edge = F.when(F.col("stratum") == ks - 1, F.col("vmax")) \
               .otherwise(F.col("hi_edge_raw"))
    return per.select(
        "stratum",
        F.round("lo_edge", round_to).alias("lo_edge"),
        F.round(hi_edge, round_to).alias("hi_edge"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(F.col("n_rows") / F.col("n"), round_to)
         .alias("share")).orderBy("stratum")


def median_rollup_bias(df: DataFrame, value_col: str, *, by: str,
                       round_to: int = 6) -> DataFrame:
    """Hierarchical-median rollup bias audit: the GLOBAL median vs
    the mean-of-group-medians vs the median-of-group-medians - the
    three numbers dashboards silently conflate when a per-partition
    pre-aggregate gets re-aggregated (medians do not compose;
    means do). A large spread between the three is the concrete
    evidence that a rollup pipeline must ship raw quantile sketches
    (:func:`sketch_quantile_audit`) instead of per-group medians.
    Two aggregations. Returns one row ``(n, n_groups,
    global_median, mean_of_medians, median_of_medians, max_abs_gap)``.
    """
    base = df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & F.col("v").isNotNull())
    per_g = base.groupBy("g").agg(
        F.expr("percentile(v, 0.5)").alias("med"),
        F.count(F.lit(1)).alias("ng"))
    g_agg = per_g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("ng").alias("n"),
        F.avg("med").alias("mom"),
        F.expr("percentile(med, 0.5)").alias("mmed"))
    glob = base.agg(F.expr("percentile(v, 0.5)").alias("gmed"))
    j = g_agg.crossJoin(F.broadcast(glob))
    gap = F.greatest(F.abs(F.col("mom") - F.col("gmed")),
                     F.abs(F.col("mmed") - F.col("gmed")))
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_groups").cast("long").alias("n_groups"),
        F.round("gmed", round_to).alias("global_median"),
        F.round("mom", round_to).alias("mean_of_medians"),
        F.round("mmed", round_to).alias("median_of_medians"),
        F.round(gap, round_to).alias("max_abs_gap"))


def cochran_q(df: DataFrame, *, item_col: str, treat_col: str,
              flag_col, round_to: int = 6) -> DataFrame:
    """Cochran's Q test (Cochran 1950) - the k-treatment extension
    of :func:`mcnemar` and the binary sibling of
    :func:`friedman_test`: each item (url, doc) carries a PASS/FAIL
    under every treatment (validator version, ruleset, crawler),
    and Q asks whether the pass rates differ beyond chance GIVEN
    the per-item pairing:

        Q = k(k-1) * sum_j (G_j - G_bar)^2
            / (k * sum_i L_i - sum_i L_i^2)    ~  chi2(k-1)

    with G_j = passes under treatment j, L_i = passes of item i
    across treatments. Items missing any treatment are DROPPED and
    counted (complete-block design, as in friedman_test). Two
    aggregations over the (item, treatment) grid. Returns one row
    ``(n_items, n_dropped, k_treat, q_stat, dof)``.
    """
    flag = (flag_col if isinstance(flag_col, Column)
            else F.col(flag_col))
    base = (df.select(F.col(item_col).alias("i"),
                      F.col(treat_col).alias("t"),
                      flag.cast("double").alias("x"))
            .where(F.col("i").isNotNull() & F.col("t").isNotNull()
                   & F.col("x").isNotNull()))
    k = base.agg(F.countDistinct("t").cast("double").alias("k"))
    per_i = base.groupBy("i").agg(
        F.countDistinct("t").alias("kt"),
        F.sum("x").alias("li"))
    complete = per_i.crossJoin(F.broadcast(k)) \
                    .where(F.col("kt") == F.col("k"))
    dropped = per_i.crossJoin(F.broadcast(k)) \
                   .where(F.col("kt") != F.col("k")) \
                   .agg(F.count(F.lit(1)).alias("n_dropped"))
    rows = base.join(complete.select("i"), "i")
    per_t = rows.groupBy("t").agg(F.sum("x").alias("gj"))
    at = per_t.agg(F.count(F.lit(1)).cast("double").alias("k"),
                   F.sum("gj").alias("gsum"),
                   F.sum(F.col("gj") ** 2).alias("g2"))
    ai = complete.agg(F.count(F.lit(1)).alias("n_items"),
                      F.sum("li").alias("lsum"),
                      F.sum(F.col("li") ** 2).alias("l2"))
    j = (at.crossJoin(F.broadcast(ai))
         .crossJoin(F.broadcast(dropped)))
    kk = F.col("k")
    num = kk * (kk - 1) * (F.col("g2")
                           - F.col("gsum") ** 2 / kk)
    den = kk * F.col("lsum") - F.col("l2")
    return j.select(
        F.col("n_items").cast("long").alias("n_items"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        kk.cast("long").alias("k_treat"),
        F.round(F.try_divide(num, den), round_to).alias("q_stat"),
        (kk - 1).cast("long").alias("dof"))


def turning_points(df: DataFrame, value_col: str, order_col: str, *,
                   round_to: int = 6) -> DataFrame:
    """Turning-point test for serial randomness (Kendall): count
    strict local extrema in the ordered series; under iid,

        E[T] = 2(n-2)/3,   Var[T] = (16n - 29)/90,
        z = (T - E)/sqrt(Var)

    Too FEW turning points means trend/stickiness, too MANY means
    alternation (over-correction, load-balancer ping-pong) - the
    direction Ljung-Box's omnibus Q cannot give in one glance.
    Tiny-series contract; ties produce no turning point (strict
    inequalities). One lag/lead window over the series frame.
    Returns one row ``(n, t_points, expect_t, var_t, z)``.
    """
    s = df.select(F.col(order_col).alias("t"),
                  F.col(value_col).cast("double").alias("x")) \
          .where(F.col("t").isNotNull() & F.col("x").isNotNull())
    w = Window.orderBy("t")
    lagx = F.lag("x").over(w)
    leadx = F.lead("x").over(w)
    tp = ((lagx.isNotNull()) & (leadx.isNotNull())
          & (((F.col("x") > lagx) & (F.col("x") > leadx))
             | ((F.col("x") < lagx) & (F.col("x") < leadx))))
    a = s.select(tp.cast("long").alias("tp")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("tp").alias("t_points"))
    n = F.col("n")
    et = 2.0 * (n - 2) / 3.0
    vt = (16.0 * n - 29.0) / 90.0
    return a.select(
        n.cast("long").alias("n"),
        F.col("t_points").cast("long").alias("t_points"),
        F.round(et, round_to).alias("expect_t"),
        F.round(vt, round_to).alias("var_t"),
        F.round(F.when(vt > 0, (F.col("t_points") - et)
                       / F.sqrt(vt)), round_to).alias("z"))


def last_digit_uniformity(df: DataFrame, value_col: str, *,
                          scale: int = 100,
                          round_to: int = 6) -> DataFrame:
    """Last-digit uniformity audit - the fabrication/rounding
    detector that complements the FIRST-digit Benford row: genuine
    fine-grained measurements have a UNIFORM final digit (at the
    *scale* precision, e.g. cents at scale=100), while fabricated or
    silently rounded data piles onto 0 and 5. Reports the digit
    histogram's chi2 against uniform (dof 9) plus the round-number
    shares. One aggregation. Returns one row ``(n, chi2, dof,
    share_0, share_5, max_digit_share)``.
    """
    v = F.col(value_col).cast("double")
    digit = F.pmod(F.round(v * int(scale)).cast("long"), 10)
    base = df.where(v.isNotNull()) \
             .select(digit.alias("d"))
    cnt = base.groupBy("d").agg(
        F.count(F.lit(1)).cast("double").alias("c"))
    a = cnt.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") ** 2).alias("c2"),
        F.max(F.when(F.col("d") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("d") == 5, F.col("c"))).alias("c5"),
        F.max("c").alias("cmax"))
    n = F.col("n")
    # chi2 vs uniform over 10 digits: sum((c-n/10)^2/(n/10))
    chi2 = F.col("c2") / (n / 10.0) - n
    return a.select(
        n.cast("long").alias("n"),
        F.round(chi2, round_to).alias("chi2"),
        F.lit(9).alias("dof"),
        F.round(F.coalesce(F.col("c0"), F.lit(0.0)) / n, round_to)
         .alias("share_0"),
        F.round(F.coalesce(F.col("c5"), F.lit(0.0)) / n, round_to)
         .alias("share_5"),
        F.round(F.col("cmax") / n, round_to)
         .alias("max_digit_share"))


def stump_split(df: DataFrame, *, score_col: str, label_col,
                round_to: int = 6) -> DataFrame:
    """Best decision-stump threshold by Gini impurity decrease (the
    CART split criterion, Breiman et al. 1984): sweep every distinct
    score level t, split at score >= t, and maximize

        gain = gini(parent) - w_L*gini(L) - w_R*gini(R)

    The Gini-optimal cut is NOT the Youden-optimal one
    (:func:`youden_threshold` weighs classes equally; Gini weighs by
    mass), which is exactly why a gate tuned on one criterion
    surprises on the other - this row shows both worlds. Same scale
    shape as roc_auc: distinct-score aggregation, suffix-cumulative
    counts via a window over THAT table, 1-row argmax (ties break
    to the LOWEST threshold). Returns ``(threshold, n_left,
    n_right, gini_parent, gini_split, gain)``.
    """
    lbl = (label_col if isinstance(label_col, Column)
           else F.col(label_col))
    per_s = (df.where(F.col(score_col).isNotNull() & lbl.isNotNull())
             .select(F.col(score_col).cast("double").alias("s"),
                     lbl.cast("int").alias("y"))
             .groupBy("s")
             .agg(F.sum("y").cast("double").alias("p"),
                  F.sum(1 - F.col("y")).cast("double").alias("q")))
    tot = per_s.agg(F.sum("p").alias("pp"), F.sum("q").alias("qq"))
    w_sfx = (Window.orderBy("s")
             .rowsBetween(Window.currentRow,
                          Window.unboundedFollowing))
    sw = (per_s.select("s", F.sum("p").over(w_sfx).alias("rp"),
                       F.sum("q").over(w_sfx).alias("rq"))
          .crossJoin(F.broadcast(tot)))
    n = F.col("pp") + F.col("qq")
    nr = F.col("rp") + F.col("rq")
    nl = n - nr
    lp = F.col("pp") - F.col("rp")
    lq = F.col("qq") - F.col("rq")
    gini = lambda a, b, m: F.when(
        m > 0, 1.0 - (a / m) ** 2 - (b / m) ** 2).otherwise(0.0)
    g_parent = gini(F.col("pp"), F.col("qq"), n)
    g_split = (nl / n) * gini(lp, lq, nl) + (nr / n) \
        * gini(F.col("rp"), F.col("rq"), nr)
    gain = g_parent - g_split
    best = (sw.where((nl > 0) & (nr > 0))
            .select(F.struct(
                gain.alias("gain"), (-F.col("s")).alias("ns"),
                F.col("s").alias("s"), nl.alias("nl"),
                nr.alias("nr"), g_parent.alias("gp"),
                g_split.alias("gs")).alias("r"))
            .agg(F.max("r").alias("r")))
    return best.select(
        F.round(F.col("r.s"), round_to).alias("threshold"),
        F.col("r.nl").cast("long").alias("n_left"),
        F.col("r.nr").cast("long").alias("n_right"),
        F.round(F.col("r.gp"), round_to).alias("gini_parent"),
        F.round(F.col("r.gs"), round_to).alias("gini_split"),
        F.round(F.col("r.gain"), round_to).alias("gain"))


def context_truncation_loss(df: DataFrame, token_count_col, *,
                            lengths: Sequence[int] = (512, 1024,
                                                      2048, 4096),
                            round_to: int = 6) -> DataFrame:
    """Context-length truncation planner for LM training: for each
    candidate context length L, the share of DOCS that overflow and
    - the number that actually matters - the share of TOKENS lost to
    the cutoff (sum of max(0, t - L) over total tokens). Doc-share
    understates the damage by orders of magnitude on heavy-tailed
    corpora: 2% of docs can carry 30% of the tokens. One aggregation
    with one conditional sum per L. Returns per-L rows
    ``(context_len, n_docs, docs_over, docs_over_share,
    tokens_total, tokens_lost, token_loss_share)``.
    """
    tc = (token_count_col if isinstance(token_count_col, Column)
          else F.col(token_count_col))
    base = df.select(tc.cast("double").alias("t")) \
             .where(F.col("t").isNotNull())
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("t").alias("tt")]
    for ln in lengths:
        aggs += [
            F.sum((F.col("t") > ln).cast("long")).alias(f"o{ln}"),
            F.sum(F.greatest(F.col("t") - ln, F.lit(0.0)))
             .alias(f"l{ln}")]
    a = base.agg(*aggs)
    outs = []
    for ln in lengths:
        outs.append(a.select(
            F.lit(int(ln)).alias("context_len"),
            F.col("n").cast("long").alias("n_docs"),
            F.col(f"o{ln}").cast("long").alias("docs_over"),
            F.round(F.col(f"o{ln}") / F.col("n"), round_to)
             .alias("docs_over_share"),
            F.col("tt").cast("long").alias("tokens_total"),
            F.col(f"l{ln}").cast("long").alias("tokens_lost"),
            F.round(F.col(f"l{ln}") / F.col("tt"), round_to)
             .alias("token_loss_share")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def deming_fit(df: DataFrame, x_col: str, y_col: str, *,
               lam: float = 1.0, round_to: int = 6) -> DataFrame:
    """Deming regression (Deming 1943) - the line when BOTH
    variables carry measurement error (error-variance ratio *lam* =
    var_ey/var_ex): comparing two token counters, two extraction
    pipelines, two replica measurements, OLS is simply wrong (its
    slope attenuates toward 0 by the noise in x); Deming's closed
    form is symmetric:

        b = (Syy - lam*Sxx + sqrt((Syy - lam*Sxx)^2
             + 4*lam*Sxy^2)) / (2*Sxy)

    ONE aggregation of the five sufficient statistics. Returns one
    row ``(n, slope, intercept, ols_slope, attenuation)`` -
    attenuation = ols/deming, how much naive OLS understates.
    """
    s = df.select(F.col(x_col).cast("double").alias("x"),
                  F.col(y_col).cast("double").alias("y")) \
          .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    a = s.agg(F.count(F.lit(1)).cast("double").alias("n"),
              F.avg("x").alias("mx"), F.avg("y").alias("my"),
              F.covar_pop("x", "y").alias("sxy"),
              F.var_pop("x").alias("sxx"),
              F.var_pop("y").alias("syy"))
    lm = float(lam)
    diff = F.col("syy") - lm * F.col("sxx")
    b = F.when(F.col("sxy") != 0,
               (diff + F.sqrt(diff ** 2
                              + 4 * lm * F.col("sxy") ** 2))
               / (2 * F.col("sxy")))
    ols = F.try_divide(F.col("sxy"), F.col("sxx"))
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.round(b, round_to).alias("slope"),
        F.round(F.col("my") - b * F.col("mx"), round_to)
         .alias("intercept"),
        F.round(ols, round_to).alias("ols_slope"),
        F.round(F.try_divide(ols, b), round_to)
         .alias("attenuation"))


def effect_size_pairs(df: DataFrame, value_col: str, *, by: str,
                      round_to: int = 6) -> DataFrame:
    """Pairwise standardized effect sizes between all groups:
    Cohen's d on the pooled SD plus Hedges' small-sample correction
    g = d*(1 - 3/(4(n1+n2)-9)) - the PRACTICAL-significance
    companion to the Tukey/Games-Howell p-value rows: with web-scale
    n everything is "significant", and d says whether anyone should
    care (0.2 small / 0.5 medium / 0.8 large). One per-group moment
    aggregation, then a G x G self-join on the tiny group frame
    (a < b ordering, each unordered pair once). Returns
    ``(group_a, group_b, n_a, n_b, mean_diff, pooled_sd, cohens_d,
    hedges_g)``.
    """
    per = (df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("double").alias("v"))
           .where(F.col("g").isNotNull() & F.col("v").isNotNull())
           .groupBy("g")
           .agg(F.count(F.lit(1)).cast("double").alias("n"),
                F.avg("v").alias("m"),
                F.var_samp("v").alias("s2")))
    a, b = per.alias("a"), per.alias("b")
    j = a.join(b, F.col("a.g") < F.col("b.g"))
    na, nb = F.col("a.n"), F.col("b.n")
    pooled = F.sqrt(((na - 1) * F.col("a.s2")
                     + (nb - 1) * F.col("b.s2")) / (na + nb - 2))
    d = F.try_divide(F.col("b.m") - F.col("a.m"), pooled)
    g = d * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))
    return j.select(
        F.col("a.g").alias("group_a"), F.col("b.g").alias("group_b"),
        na.cast("long").alias("n_a"), nb.cast("long").alias("n_b"),
        F.round(F.col("b.m") - F.col("a.m"), round_to)
         .alias("mean_diff"),
        F.round(pooled, round_to).alias("pooled_sd"),
        F.round(d, round_to).alias("cohens_d"),
        F.round(g, round_to).alias("hedges_g"))


def mahalanobis_2d(df: DataFrame, x_col: str, y_col: str, *,
                   threshold: float = 5.991,
                   round_to: int = 6) -> DataFrame:
    """Bivariate Mahalanobis outlier audit on (x, y): squared
    distance d2 = z' S^-1 z with the 2x2 covariance inverted in
    closed form - the CORRELATION-AWARE outlier test the univariate
    z-score/MAD rows cannot be: a doc whose length and token count
    are each unremarkable but mutually inconsistent (len 50, tokens
    4000) only lights up here. d2 ~ chi2(2) under normality;
    threshold defaults to its 95% quantile (5.991). Two chained
    aggregations (moments, then the scored pass). Returns one
    summary row ``(n, n_flagged, flag_share, max_d2, corr_xy)``.
    """
    s = df.select(F.col(x_col).cast("double").alias("x"),
                  F.col(y_col).cast("double").alias("y")) \
          .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    m = s.agg(F.avg("x").alias("mx"), F.avg("y").alias("my"),
              F.var_samp("x").alias("vx"),
              F.var_samp("y").alias("vy"),
              F.covar_samp("x", "y").alias("cxy"))
    j = s.crossJoin(F.broadcast(m))
    det = F.col("vx") * F.col("vy") - F.col("cxy") ** 2
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    d2 = (F.col("vy") * dx ** 2 - 2 * F.col("cxy") * dx * dy
          + F.col("vx") * dy ** 2) / det
    scored = j.select(d2.alias("d2"),
                      F.try_divide(
                          F.col("cxy"),
                          F.sqrt(F.col("vx") * F.col("vy")))
                      .alias("r"))
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("d2") > float(threshold)).cast("long"))
         .alias("n_flagged"),
        F.round(F.avg((F.col("d2") > float(threshold))
                      .cast("double")), round_to)
         .alias("flag_share"),
        F.round(F.max("d2"), round_to).alias("max_d2"),
        F.round(F.first("r"), round_to).alias("corr_xy"))


def design_effect(df: DataFrame, value_col: str, *,
                  cluster_col: str,
                  round_to: int = 6) -> DataFrame:
    """Survey design effect for cluster sampling (Kish 1965): the
    one-way ANOVA variance components give the intraclass
    correlation rho, and

        DEFF = 1 + (m_bar - 1) * rho,    n_eff = n / DEFF

    - how many iid-equivalent observations a clustered sample is
    really worth (crawl batches by host, events by user). The
    DESIGN-stage sibling of :func:`cluster_robust_slope` (which
    fixes the ANALYSIS stage). rho uses the standard ANOVA
    estimator with m0 = (n - sum(m_g^2)/n)/(G-1) for unequal
    clusters. Two aggregations. Returns ``(n, n_clusters,
    avg_cluster, icc, deff, n_effective)``.
    """
    base = df.select(F.col(cluster_col).alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & F.col("v").isNotNull())
    glob = base.agg(F.avg("v").alias("gm"))
    per = (base.crossJoin(F.broadcast(glob))
           .groupBy("g")
           .agg(F.count(F.lit(1)).cast("double").alias("m"),
                F.avg("v").alias("mg"),
                F.sum((F.col("v") - F.col("gm")) ** 2).alias("tss"),
                F.first("gm").alias("gm")))
    a = per.agg(
        F.sum("m").alias("n"),
        F.count(F.lit(1)).cast("double").alias("gg"),
        F.sum(F.col("m") ** 2).alias("m2"),
        F.sum(F.col("m") * (F.col("mg") - F.col("gm")) ** 2)
         .alias("ssb"),
        F.sum("tss").alias("sst"))
    n, gg = F.col("n"), F.col("gg")
    ssw = F.col("sst") - F.col("ssb")
    msb = F.col("ssb") / (gg - 1)
    msw = ssw / (n - gg)
    m0 = (n - F.col("m2") / n) / (gg - 1)
    icc = F.try_divide(msb - msw, msb + (m0 - 1) * msw)
    mbar = n / gg
    deff = 1.0 + (mbar - 1) * F.greatest(icc, F.lit(0.0))
    return a.select(
        n.cast("long").alias("n"), gg.cast("long").alias("n_clusters"),
        F.round(mbar, round_to).alias("avg_cluster"),
        F.round(icc, round_to).alias("icc"),
        F.round(deff, round_to).alias("deff"),
        F.round(n / deff, round_to).alias("n_effective"))


def gpd_tail_fit(df: DataFrame, value_col: str, *,
                 tail_q: float = 0.95,
                 round_to: int = 6) -> DataFrame:
    """Peaks-over-threshold GPD fit by method of moments: excesses
    over the tail_q quantile follow (asymptotically) a generalized
    Pareto with

        xi    = 0.5 * (1 - m^2/s^2)          (shape; >0 heavy tail)
        sigma = 0.5 * m * (1 + m^2/s^2)      (scale)

    from the excess mean/variance - the OTHER pillar of extreme-
    value theory next to :func:`gumbel_maxima` (block maxima): POT
    uses every exceedance instead of one per block, so it sees far
    more of the tail. The reported return level is the value
    expected to be exceeded once per 10n observations (10x rarer
    than anything in-sample):

        x_RL = u + sigma/xi * ((10 * n_exc)^xi - 1)    (xi != 0)

    Two chained aggregations (quantile, then excess moments).
    Returns one row ``(n, n_exceed, threshold, mean_excess, xi,
    sigma, rl_10x)``; xi = 0.5 means infinite variance - mean-based
    gates are fiction there.
    """
    tq = float(tail_q)
    base = df.select(F.col(value_col).cast("double").alias("v")) \
             .where(F.col("v").isNotNull())
    th = base.agg(F.expr(f"percentile(v, {tq})").alias("u"),
                  F.count(F.lit(1)).alias("n"))
    exc = (base.crossJoin(F.broadcast(th))
           .where(F.col("v") > F.col("u"))
           .select((F.col("v") - F.col("u")).alias("e"),
                   "u", "n"))
    a = exc.agg(F.count(F.lit(1)).cast("double").alias("ne"),
                F.avg("e").alias("m"), F.var_samp("e").alias("s2"),
                F.first("u").alias("u"), F.first("n").alias("n"))
    ratio = F.col("m") ** 2 / F.col("s2")
    xi = 0.5 * (1.0 - ratio)
    sigma = 0.5 * F.col("m") * (1.0 + ratio)
    rl = F.when(
        F.abs(xi) > 1e-9,
        F.col("u") + sigma / xi
        * (F.pow(10.0 * F.col("ne"), xi) - 1)) \
        .otherwise(F.col("u") + sigma * F.log(10.0 * F.col("ne")))
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.col("ne").cast("long").alias("n_exceed"),
        F.round("u", round_to).alias("threshold"),
        F.round("m", round_to).alias("mean_excess"),
        F.round(xi, round_to).alias("xi"),
        F.round(sigma, round_to).alias("sigma"),
        F.round(rl, round_to).alias("rl_10x"))


def seasonal_mann_kendall(df: DataFrame, value_col: str,
                          date_col: str, *,
                          round_to: int = 6) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch & Slack 1984):
    the plain MK statistic computed WITHIN each season (day-of-week
    here) and summed - a weekly rhythm no longer masquerades as
    trend, because Mondays are only ever compared with Mondays:

        S = sum_seasons S_i,  Var = sum Var_i (tie-corrected),
        Z = (S - sign(S)) / sqrt(Var)        (continuity-corrected)

    Tiny-series contract: pair enumeration is a per-season
    self-join over the per-day frame (days/7 rows per season).
    Returns one row ``(n_seasons, n_obs, s_total, var_total, z)``.
    """
    s = df.select(F.col(date_col).cast("date").alias("d"),
                  F.col(value_col).cast("double").alias("v")) \
          .where(F.col("d").isNotNull() & F.col("v").isNotNull()) \
          .select(F.dayofweek("d").alias("w"), "d", "v")
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(b, (F.col("a.w") == F.col("b.w"))
                   & (F.col("a.d") < F.col("b.d")))
    s_tot = pairs.agg(
        F.sum(F.signum(F.col("b.v") - F.col("a.v"))).alias("s"))
    per_season = s.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("n"))
    ties = (s.groupBy("w", "v")
            .agg(F.count(F.lit(1)).cast("double").alias("t"))
            .groupBy("w")
            .agg(F.sum(F.col("t") * (F.col("t") - 1)
                       * (2 * F.col("t") + 5)).alias("tc")))
    var = (per_season.join(ties, "w")
           .agg(F.sum(F.col("n") * (F.col("n") - 1)
                      * (2 * F.col("n") + 5) / 18.0
                      - F.col("tc") / 18.0).alias("var"),
                F.count(F.lit(1)).alias("n_seasons"),
                F.sum("n").alias("n_obs")))
    j = var.crossJoin(F.broadcast(s_tot))
    z = F.when(F.col("s") != 0,
               (F.col("s") - F.signum(F.col("s")))
               / F.sqrt(F.col("var"))).otherwise(F.lit(0.0))
    return j.select(
        F.col("n_seasons").cast("long").alias("n_seasons"),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round("s", round_to).alias("s_total"),
        F.round("var", round_to).alias("var_total"),
        F.round(F.when(F.col("var") > 0, z), round_to).alias("z"))


# Phi^-1 at the deciles, the only normal-theory constants the QQ
# table needs (Abramowitz-Stegun values, 6 dp)
_NORMAL_DECILE_Z = {10: -1.281552, 20: -0.841621, 30: -0.524401,
                    40: -0.253347, 50: 0.0, 60: 0.253347,
                    70: 0.524401, 80: 0.841621, 90: 1.281552}


def qq_normal_table(df: DataFrame, value_col: str, *,
                    round_to: int = 6) -> DataFrame:
    """Q-Q-against-normal table at the deciles: the empirical
    quantile next to the Gaussian prediction mu + sigma*z_p - WHERE
    normality fails, not just that it does (a goodness-of-fit
    scalar): right-tail points drifting above the line = heavy
    upper tail (log the column); an S-shape = mixture. One fused
    aggregation (moments + 9 exact percentiles). Returns 9 rows
    ``(decile, empirical_q, normal_q, gap, gap_in_sd)``.
    """
    base = df.select(F.col(value_col).cast("double").alias("v")) \
             .where(F.col("v").isNotNull())
    agg = base.agg(
        F.avg("v").alias("mu"), F.stddev("v").alias("sd"),
        *[F.expr(f"percentile(v, {k / 100.0})").alias(f"q{k}")
          for k in _NORMAL_DECILE_Z])
    outs = []
    for k, z in _NORMAL_DECILE_Z.items():
        nq = F.col("mu") + F.lit(z) * F.col("sd")
        gap = F.col(f"q{k}") - nq
        outs.append(agg.select(
            F.lit(k).alias("decile"),
            F.round(F.col(f"q{k}"), round_to).alias("empirical_q"),
            F.round(nq, round_to).alias("normal_q"),
            F.round(gap, round_to).alias("gap"),
            F.round(F.try_divide(gap, F.col("sd")), round_to)
             .alias("gap_in_sd")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def timestamp_rounding_audit(df: DataFrame, ts_col: str, *,
                             round_to: int = 6) -> DataFrame:
    """Timestamp digit-preference audit - the bot / batch-import
    fingerprint: organic events land uniformly within the minute
    and hour, while schedulers and backfills pile onto :00 seconds,
    :00 minutes and whole microseconds. Reported as the observed
    share vs the uniform expectation and their RATIO (a ratio of 5
    on second==0 means five-fold digit preference; the on-the-hour
    ratio is the cron tell). One aggregation. Returns one row
    ``(n, sec0_share, sec0_ratio, min0_share, min0_ratio,
    micro0_share, subsec_uniform_chi2)`` - the chi2 is over the 60
    second-of-minute bins (dof 59).
    """
    ts = F.col(ts_col)
    # NTZ-safe: unix_micros requires TIMESTAMP; the cast goes
    # through the session zone and keeps the fractional second
    base = df.where(ts.isNotNull()).select(
        F.second(ts).alias("s"), F.minute(ts).alias("m"),
        (F.unix_micros(ts.cast("timestamp")) % 1000000 == 0)
        .cast("long").alias("u0"))
    per_s = base.groupBy("s").agg(
        F.count(F.lit(1)).cast("double").alias("c"))
    chi = per_s.agg(F.sum("c").alias("n"),
                    F.sum(F.col("c") ** 2).alias("c2"))
    a = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg((F.col("s") == 0).cast("double")).alias("s0"),
        F.avg((F.col("m") == 0).cast("double")).alias("m0"),
        F.avg("u0").alias("u0"))
    j = a.crossJoin(F.broadcast(
        chi.select((F.col("c2") / (F.col("n") / 60.0)
                    - F.col("n")).alias("chi2"))))
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.round("s0", round_to).alias("sec0_share"),
        F.round(F.col("s0") * 60.0, round_to).alias("sec0_ratio"),
        F.round("m0", round_to).alias("min0_share"),
        F.round(F.col("m0") * 60.0, round_to).alias("min0_ratio"),
        F.round("u0", round_to).alias("micro0_share"),
        F.round("chi2", round_to).alias("subsec_uniform_chi2"))


def aa_calibration(df: DataFrame, value_col: str, *, id_col: str,
                   n_splits: int = 64,
                   round_to: int = 6) -> DataFrame:
    """A/A-test calibration harness: split the data *n_splits* <=
    128 times by the BITS of one md5(id) per row (no RNG, no
    explode - the :func:`permutation_test_mean` trick), run the
    Welch z for a mean difference on every split, and report how
    often "significance" fires. On iid data ~5% of A/A splits
    should cross |z| > 1.96; materially more means the testing
    pipeline's variance model is broken for this data (clustering -
    see :func:`design_effect` - or heavy tails), and every real A/B
    read-out built on it is overconfident. One aggregation pass (4
    conditional moments per split), then a horizontal array fold.
    Returns ``(n, n_splits, n_sig, sig_share, max_abs_z)``.
    """
    b = int(n_splits)
    if b > 128:
        raise ValueError("n_splits is capped at 128 (md5 bits)")
    n_nib = (b + 3) // 4
    h = F.md5(F.col(id_col).cast("string"))
    # parse each needed hex nibble ONCE in a projection; the 3*b
    # aggregate expressions then read cheap integer columns instead
    # of re-deriving conv(substring(md5)) per expression
    base = df.select(
        F.col(value_col).cast("double").alias("v"),
        *[F.conv(F.substring(h, i + 1, 1), 16, 10).cast("long")
          .alias(f"nib{i}") for i in range(n_nib)]) \
        .where(F.col("v").isNotNull())

    def bit(i: int):
        return F.shiftright(F.col(f"nib{i // 4}"), i % 4) \
                .bitwiseAND(F.lit(1)) == 0

    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s_tot"),
            F.sum(F.col("v") ** 2).alias("s2_tot")]
    for i in range(b):
        f = bit(i)
        aggs += [F.sum(F.when(f, F.col("v"))).alias(f"s{i}"),
                 F.sum(F.when(f, F.col("v") ** 2)).alias(f"q{i}"),
                 F.sum(F.when(f, 1).otherwise(0)).cast("double")
                  .alias(f"c{i}")]
    a = base.agg(*aggs)
    zs = []
    for i in range(b):
        c1 = F.col(f"c{i}")
        c2 = F.col("n") - c1
        m1 = F.col(f"s{i}") / c1
        m2 = (F.col("s_tot") - F.col(f"s{i}")) / c2
        v1 = (F.col(f"q{i}") - c1 * m1 ** 2) / (c1 - 1)
        v2 = ((F.col("s2_tot") - F.col(f"q{i}")) - c2 * m2 ** 2) \
            / (c2 - 1)
        zs.append((m1 - m2) / F.sqrt(v1 / c1 + v2 / c2))
    arr = F.array(*zs)
    n_sig = F.size(F.filter(arr, lambda z: F.abs(z) > 1.96))
    max_z = F.array_max(F.transform(arr, F.abs))
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.lit(b).alias("n_splits"),
        n_sig.cast("long").alias("n_sig"),
        F.round(n_sig / F.lit(float(b)), round_to)
         .alias("sig_share"),
        F.round(max_z, round_to).alias("max_abs_z"))


def logrank_test(df: DataFrame, *, entity_col: str, ts_col: str,
                 event_pred: Column, group_pred: Column,
                 bucket_s: int = 3600,
                 round_to: int = 6) -> DataFrame:
    """Two-group log-rank test (Mantel 1966) on the SAME duration
    model as :func:`kaplan_meier` / :func:`nelson_aalen` (first
    observation -> first matching event per entity, right-censored
    at the corpus horizon, bucketed): at every event bucket with d
    events and n at risk (n1 in group 1),

        O - E = sum (d1 - d*n1/n)
        V     = sum d*(n1/n)*(n2/n)*(n-d)/(n-1)
        chi2  = (O - E)^2 / V     ~ chi2(1)

    - "do the two cohorts convert at the same rate", properly
    weighting every bucket by who is still at risk (a naive end-of-
    window conversion share ignores censoring entirely). The group
    label is per-entity (its FIRST row's predicate value). Same
    scale shape as the survival rows. Returns one row ``(n1, n2,
    events1, events2, o_minus_e, var, chi2)``.
    """
    ts = F.col(ts_col).cast("timestamp").cast("double")
    per = (df.where(F.col(entity_col).isNotNull())
           .groupBy(entity_col)
           .agg(F.min(ts).alias("entry"),
                F.min(F.when(event_pred, ts)).alias("ev"),
                F.max(ts).alias("lastts"),
                F.max(F.when(group_pred, 1).otherwise(0))
                 .alias("g1")))
    horizon = per.agg(F.max("lastts").alias("hz"))
    j = per.crossJoin(F.broadcast(horizon))
    observed = F.col("ev").isNotNull()
    dur = F.when(observed, F.col("ev") - F.col("entry")) \
        .otherwise(F.col("hz") - F.col("entry"))
    b = F.floor(dur / F.lit(int(bucket_s))).cast("long")
    marks = (j.select(b.alias("t"), observed.cast("long").alias("d"),
                      F.col("g1"))
             .groupBy("t")
             .agg(F.count("*").cast("double").alias("all_"),
                  F.sum(F.col("g1")).cast("double").alias("all1"),
                  F.sum("d").cast("double").alias("d"),
                  F.sum(F.col("d") * F.col("g1")).cast("double")
                   .alias("d1")))
    wp = (Window.orderBy("t")
          .rowsBetween(Window.unboundedPreceding, -1))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    n_r = (F.sum("all_").over(tot)
           - F.coalesce(F.sum("all_").over(wp), F.lit(0.0)))
    n1_r = (F.sum("all1").over(tot)
            - F.coalesce(F.sum("all1").over(wp), F.lit(0.0)))
    curve = marks.select("t", "d", "d1", n_r.alias("n"),
                         n1_r.alias("n1"))
    terms = curve.where((F.col("d") > 0) & (F.col("n") > 1)).select(
        (F.col("d1") - F.col("d") * F.col("n1") / F.col("n"))
        .alias("oe"),
        (F.col("d") * (F.col("n1") / F.col("n"))
         * ((F.col("n") - F.col("n1")) / F.col("n"))
         * (F.col("n") - F.col("d")) / (F.col("n") - 1))
        .alias("v"))
    sums = terms.agg(F.sum("oe").alias("oe"), F.sum("v").alias("v"))
    sides = per.agg(
        F.sum("g1").alias("n1"),
        F.sum(1 - F.col("g1")).alias("n2"),
        F.sum(F.when(F.col("ev").isNotNull() & (F.col("g1") == 1),
                     1).otherwise(0)).alias("e1"),
        F.sum(F.when(F.col("ev").isNotNull() & (F.col("g1") == 0),
                     1).otherwise(0)).alias("e2"))
    out = sides.crossJoin(F.broadcast(sums))
    return out.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("e1").cast("long").alias("events1"),
        F.col("e2").cast("long").alias("events2"),
        F.round("oe", round_to).alias("o_minus_e"),
        F.round("v", round_to).alias("var"),
        F.round(F.try_divide(F.col("oe") ** 2, F.col("v")),
                round_to).alias("chi2"))


def cem_imbalance(df: DataFrame, *, treat: Column,
                  strata: Sequence[Column],
                  round_to: int = 6) -> DataFrame:
    """Coarsened-exact-matching imbalance (Iacus, King & Porro
    2012): bin the covariates coarsely (the caller's strata
    expressions), then the multivariate L1 statistic

        L1 = 0.5 * sum_strata | f_treated - f_control |

    - 0 means the two groups occupy the covariate space
    identically, 1 means disjoint. The BALANCE audit to run before
    attributing any outcome difference to the "treatment" (weekend
    traffic, a new crawler, an A/B arm): high L1 says the
    comparison is confounded and needs matching/weighting first.
    One aggregation over the strata grid. Returns one row
    ``(n_treated, n_control, n_strata, n_common_strata, l1)``.
    """
    cells = (df.select(treat.cast("int").alias("tr"),
                       *[s.alias(f"s{i}")
                         for i, s in enumerate(strata)])
             .groupBy(*[f"s{i}" for i in range(len(strata))])
             .agg(F.sum("tr").cast("double").alias("nt"),
                  F.sum(1 - F.col("tr")).cast("double").alias("nc")))
    a = cells.agg(
        F.sum("nt").alias("tt"), F.sum("nc").alias("tc"),
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(((F.col("nt") > 0) & (F.col("nc") > 0)).cast("long"))
         .alias("n_common"))
    l1 = (cells.crossJoin(F.broadcast(a))
          .agg((0.5 * F.sum(F.abs(F.col("nt") / F.col("tt")
                                  - F.col("nc") / F.col("tc"))))
               .alias("l1"),
               F.first("tt").alias("tt"), F.first("tc").alias("tc"),
               F.first("n_strata").alias("n_strata"),
               F.first("n_common").alias("n_common")))
    return l1.select(
        F.col("tt").cast("long").alias("n_treated"),
        F.col("tc").cast("long").alias("n_control"),
        F.col("n_strata").cast("long").alias("n_strata"),
        F.col("n_common").cast("long").alias("n_common_strata"),
        F.round("l1", round_to).alias("l1"))


def jarque_bera(df: DataFrame, value_col: str, *, by: str,
                round_to: int = 6) -> DataFrame:
    """Jarque-Bera normality test per group: JB = n/6 * (S^2 +
    K^2/4) ~ chi2(2) from the CLASSICAL population moments S =
    m3/m2^1.5, K = m4/m2^2 - 3 - computed from explicit central
    moments (a two-pass mean-then-moments plan) rather than engine
    built-ins, whose bias corrections differ between engines. Heavy
    web-metric tails make JB explode; a group where it DOESN'T is
    the one where normal-theory gates (z-scores, c-charts) are
    actually licensed - the one-number verdict behind the
    :func:`qq_normal_table` drill-down. Returns per-group rows
    ``(group, n, skewness, ex_kurtosis, jb_stat, dof)``.
    """
    base = df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & F.col("v").isNotNull())
    means = base.groupBy("g").agg(F.avg("v").alias("mu"))
    dev = base.join(F.broadcast(means), "g") \
              .select("g", (F.col("v") - F.col("mu")).alias("d"))
    a = dev.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(F.col("d") ** 2).alias("m2"),
        F.avg(F.col("d") ** 3).alias("m3"),
        F.avg(F.col("d") ** 4).alias("m4"))
    sk = F.try_divide(F.col("m3"), F.col("m2") ** 1.5)
    ek = F.try_divide(F.col("m4"), F.col("m2") ** 2) - 3.0
    jb = F.col("n") / 6.0 * (sk ** 2 + ek ** 2 / 4.0)
    return a.select(
        F.col("g").alias("group"), F.col("n").cast("long").alias("n"),
        F.round(sk, round_to).alias("skewness"),
        F.round(ek, round_to).alias("ex_kurtosis"),
        F.round(jb, round_to).alias("jb_stat"),
        F.lit(2).alias("dof")).orderBy("group")


def file_layout_audit(df: DataFrame, *,
                      target_rows_per_file: int = 1_000_000,
                      round_to: int = 6) -> DataFrame:
    """Small-files audit - the physical-layout pathology that
    quietly dominates 10^12-row scans: thousands of tiny parquet
    files mean scheduler overhead, broken row-group statistics and
    open-cost-bound reads. Rows are attributed to their source file
    via input_file_name() (so *df* must be a direct file scan), and
    the report gives the per-file row distribution plus the
    coalesce target that would hit *target_rows_per_file*. One
    aggregation per file then a 1-row close. Returns ``(n_files,
    rows_total, rows_min, rows_median, rows_max, skew_ratio,
    small_files, suggested_files)`` - small_files counts files
    under half the median.
    """
    per = (df.select(F.regexp_extract(F.input_file_name(),
                                      r"[^/]+$", 0).alias("f"))
           .groupBy("f")
           .agg(F.count(F.lit(1)).cast("double").alias("r")))
    a = per.agg(
        F.count(F.lit(1)).cast("double").alias("nf"),
        F.sum("r").alias("rt"), F.min("r").alias("rmin"),
        F.expr("percentile(r, 0.5)").alias("rmed"),
        F.max("r").alias("rmax"))
    small = (per.crossJoin(F.broadcast(a))
             .agg(F.sum((F.col("r") < F.col("rmed") / 2)
                        .cast("long")).alias("small")))
    j = a.crossJoin(F.broadcast(small))
    return j.select(
        F.col("nf").cast("long").alias("n_files"),
        F.col("rt").cast("long").alias("rows_total"),
        F.col("rmin").cast("long").alias("rows_min"),
        F.round("rmed", round_to).alias("rows_median"),
        F.col("rmax").cast("long").alias("rows_max"),
        F.round(F.col("rmax") / (F.col("rt") / F.col("nf")),
                round_to).alias("skew_ratio"),
        F.col("small").cast("long").alias("small_files"),
        F.greatest(F.ceil(F.col("rt")
                          / float(target_rows_per_file)),
                   F.lit(1)).cast("long").alias("suggested_files"))


def session_gap_curve(df: DataFrame, *, entity_col: str,
                      ts_col: str,
                      gaps_s: Sequence[int] = (300, 1800, 3600,
                                               14400),
                      round_to: int = 6) -> DataFrame:
    """Session-gap sensitivity curve - the advisor in FRONT of
    :func:`sessionize`: the session count at threshold g is
    n_entities + #(inter-event gaps > g), so one per-entity lag
    pass with one conditional sum per candidate yields the whole
    curve; the knee (where halving g stops multiplying sessions) is
    the defensible timeout, instead of the folklore 30 minutes.
    Returns per-gap rows ``(gap_s, n_sessions, events_per_session,
    sessions_per_entity)``.
    """
    ts = F.col(ts_col).cast("timestamp").cast("double")
    base = df.where(F.col(entity_col).isNotNull()
                    & F.col(ts_col).isNotNull()) \
             .select(F.col(entity_col).alias("e"), ts.alias("t"))
    w = Window.partitionBy("e").orderBy("t")
    gapped = base.select(
        "e", (F.col("t") - F.lag("t").over(w)).alias("gap"))
    aggs = [F.count(F.lit(1)).cast("double").alias("n_events"),
            F.countDistinct("e").cast("double").alias("n_ent")]
    for g in gaps_s:
        aggs.append(F.sum((F.col("gap") > int(g)).cast("long"))
                    .alias(f"brk{g}"))
    a = gapped.agg(*aggs)
    outs = []
    for g in gaps_s:
        ns = F.col("n_ent") + F.col(f"brk{g}")
        outs.append(a.select(
            F.lit(int(g)).alias("gap_s"),
            ns.cast("long").alias("n_sessions"),
            F.round(F.col("n_events") / ns, round_to)
             .alias("events_per_session"),
            F.round(ns / F.col("n_ent"), round_to)
             .alias("sessions_per_entity")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def qn_scale(df: DataFrame, value_col: str, *,
             round_to: int = 6) -> DataFrame:
    """Rousseeuw-Croux Qn robust scale estimator (1993): 2.2219
    times the k-th smallest pairwise distance |x_i - x_j|, k =
    C(h,2), h = floor(n/2)+1 - 50% breakdown like the MAD but (a)
    82% Gaussian efficiency (MAD: 37%) and (b) NO symmetry
    assumption, which skewed web metrics violate by construction.
    The pair cloud reduces to the distinct-value weighted grid
    (the :func:`hodges_lehmann_shift` trick - bin first if distinct
    cardinality is itself huge), and the k-th order statistic is
    one cumulative window over sorted distances. Returns one row
    ``(n, k, d_k, qn, mad_scaled, stddev)`` with the MAD- and
    SD-based scales alongside for the divergence read-out.
    """
    base = df.select(F.col(value_col).cast("double").alias("v")) \
             .where(F.col("v").isNotNull())
    vc = base.groupBy("v").agg(
        F.count(F.lit(1)).cast("double").alias("c"))
    a1, b1 = vc.alias("a"), vc.alias("b")
    cross = (a1.join(b1, F.col("a.v") < F.col("b.v"))
             .select((F.col("b.v") - F.col("a.v")).alias("d"),
                     (F.col("a.c") * F.col("b.c")).alias("w")))
    zeros = vc.where(F.col("c") > 1).select(
        F.lit(0.0).alias("d"),
        (F.col("c") * (F.col("c") - 1) / 2).alias("w"))
    dists = cross.unionByName(zeros).groupBy("d").agg(
        F.sum("w").alias("w"))
    n_agg = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.stddev("v").alias("sd"),
        F.expr("percentile(v, 0.5)").alias("med"))
    mad = (base.crossJoin(F.broadcast(n_agg))
           .select(F.abs(F.col("v") - F.col("med")).alias("ad"))
           .agg(F.expr("percentile(ad, 0.5)").alias("mad")))
    wcum = (Window.orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = dists.select("d", F.sum("w").over(wcum).alias("cum")) \
               .crossJoin(F.broadcast(n_agg))
    h = F.floor(F.col("n") / 2) + 1
    k = h * (h - 1) / 2
    dk = (cum.where(F.col("cum") >= k)
          .agg(F.min("d").alias("d_k"), F.first("n").alias("n"),
               F.first("sd").alias("sd")))
    j = dk.crossJoin(F.broadcast(mad))
    hh = F.floor(F.col("n") / 2) + 1
    return j.select(
        F.col("n").cast("long").alias("n"),
        (hh * (hh - 1) / 2).cast("long").alias("k"),
        F.round("d_k", round_to).alias("d_k"),
        F.round(F.col("d_k") * 2.2219, round_to).alias("qn"),
        F.round(F.col("mad") * 1.4826, round_to).alias("mad_scaled"),
        F.round("sd", round_to).alias("stddev"))


def rmst_cohorts(df: DataFrame, *, entity_col: str, ts_col: str,
                 event_pred: Column, group_pred: Column,
                 tau_s: int, bucket_s: int = 3600,
                 round_to: int = 6) -> DataFrame:
    """Restricted mean survival time per cohort - the EFFECT-SIZE
    companion to the :func:`logrank_test` verdict: RMST(tau) =
    integral of the KM curve over [0, tau] reads directly as "mean
    event-free time within the window", and the cohort difference
    is in time units managers understand, robust where median
    survival is undefined (fewer than half convert). Same duration
    model as the other survival rows; the integral is a step-sum
    over each cohort's bounded KM curve. Returns one row per cohort
    ``(cohort, n, n_events, rmst_s, rmst_share)`` - rmst_share =
    RMST/tau.
    """
    ts = F.col(ts_col).cast("timestamp").cast("double")
    per = (df.where(F.col(entity_col).isNotNull())
           .groupBy(entity_col)
           .agg(F.min(ts).alias("entry"),
                F.min(F.when(event_pred, ts)).alias("ev"),
                F.max(ts).alias("lastts"),
                F.max(F.when(group_pred, 1).otherwise(0))
                 .alias("g1")))
    horizon = per.agg(F.max("lastts").alias("hz"))
    j = per.crossJoin(F.broadcast(horizon))
    observed = F.col("ev").isNotNull()
    dur = F.when(observed, F.col("ev") - F.col("entry")) \
        .otherwise(F.col("hz") - F.col("entry"))
    b = F.floor(dur / F.lit(int(bucket_s))).cast("long")
    marks = (j.select(F.col("g1").alias("g"), b.alias("t"),
                      observed.cast("long").alias("d"))
             .groupBy("g", "t")
             .agg(F.count("*").cast("double").alias("all_"),
                  F.sum("d").cast("double").alias("d")))
    wp = (Window.partitionBy("g").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, -1))
    tot = (Window.partitionBy("g")
           .rowsBetween(Window.unboundedPreceding,
                        Window.unboundedFollowing))
    n_r = (F.sum("all_").over(tot)
           - F.coalesce(F.sum("all_").over(wp), F.lit(0.0)))
    curve = marks.select("g", "t", "d", n_r.alias("n"))
    ws = (Window.partitionBy("g").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, 0))
    part = (F.col("d") > 0) & (F.col("d") < F.col("n"))
    logs = F.sum(F.when(part, F.log(1.0 - F.col("d")
                                    / F.col("n")))
                 .otherwise(F.lit(0.0))).over(ws)
    absorbed = F.max((F.col("d") >= F.col("n")).cast("int")).over(ws)
    surv = F.when(absorbed == 1, F.lit(0.0)).otherwise(F.exp(logs))
    # S(t) holds on [t_bucket_end, next_bucket_end); integrate step
    # widths within [0, tau]; S=1 before the first event bucket ends
    tau_b = float(tau_s) / float(bucket_s)
    stepped = curve.select("g", "t", surv.alias("s"))
    wlead = Window.partitionBy("g").orderBy("t")
    seg = stepped.select(
        "g", "s",
        F.least(F.col("t") + 1, F.lit(tau_b)).alias("lo"),
        F.least(F.coalesce(F.lead("t").over(wlead) + 1,
                           F.lit(tau_b)), F.lit(tau_b)).alias("hi"),
        F.first("t").over(
            Window.partitionBy("g").orderBy("t")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)).alias("t0"))
    contrib = (seg.groupBy("g")
               .agg(F.sum(F.when(F.col("hi") > F.col("lo"),
                                 (F.col("hi") - F.col("lo"))
                                 * F.col("s"))
                          .otherwise(0.0)).alias("tail_area"),
                    (F.least(F.min("t0") + 1, F.lit(tau_b)))
                    .alias("head")))
    sides = per.groupBy(F.col("g1").alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("ev").isNotNull(), 1).otherwise(0))
         .alias("n_events"))
    out = sides.join(contrib, "g", "left")
    rmst_b = (F.coalesce(F.col("head"), F.lit(tau_b))
              + F.coalesce(F.col("tail_area"), F.lit(0.0)))
    return out.select(
        F.col("g").cast("long").alias("cohort"),
        F.col("n").cast("long").alias("n"),
        F.col("n_events").cast("long").alias("n_events"),
        F.round(rmst_b * float(bucket_s), round_to).alias("rmst_s"),
        F.round(rmst_b / tau_b, round_to).alias("rmst_share")
    ).orderBy("cohort")


def bland_altman(df: DataFrame, a_col: str, b_col: str, *,
                 round_to: int = 6) -> DataFrame:
    """Bland-Altman limits of agreement (Bland & Altman 1986): for
    two measurements of the same quantity, the mean difference
    (bias) and bias +/- 1.96 sd(diff) - the interval within which
    95% of method disagreements live. The DECISION companion to
    :func:`deming_fit`: Deming says what the structural relation
    is; Bland-Altman says whether one method can replace the other
    at the precision you need. Proportional bias (diff growing with
    magnitude) shows in the diff~mean correlation, reported too.
    One aggregation. Returns ``(n, bias, sd_diff, loa_lo, loa_hi,
    prop_bias_r)``.
    """
    s = df.select(F.col(a_col).cast("double").alias("a"),
                  F.col(b_col).cast("double").alias("b")) \
          .where(F.col("a").isNotNull() & F.col("b").isNotNull())
    d = s.select((F.col("b") - F.col("a")).alias("d"),
                 ((F.col("a") + F.col("b")) / 2).alias("m"))
    # corr() raises under ANSI when a side is constant (perfect
    # agreement up to offset); the covariance form degrades to NULL
    agg = d.agg(F.count(F.lit(1)).alias("n"),
                F.avg("d").alias("bias"),
                F.stddev("d").alias("sd"),
                F.try_divide(
                    F.covar_samp("d", "m"),
                    F.stddev("d") * F.stddev("m")).alias("r"))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round("bias", round_to).alias("bias"),
        F.round("sd", round_to).alias("sd_diff"),
        F.round(F.col("bias") - 1.96 * F.col("sd"), round_to)
         .alias("loa_lo"),
        F.round(F.col("bias") + 1.96 * F.col("sd"), round_to)
         .alias("loa_hi"),
        F.round("r", round_to).alias("prop_bias_r"))


def siegel_slope(df: DataFrame, x_col: str, y_col: str, *,
                 round_to: int = 6) -> DataFrame:
    """Siegel repeated-median slope (Siegel 1982): for each point
    the MEDIAN of its pairwise slopes, then the median of those -
    50% breakdown, against Theil-Sen's 29%: HALF the series can be
    garbage (a sensor stuck at zero for two weeks) and the trend
    estimate still stands. Tiny-series contract (daily aggregates):
    the pair enumeration is a self-join on the series frame, the
    per-point median a grouped exact percentile. Returns one row
    ``(n, slope, intercept)`` with the median-based intercept
    med(y - slope*x).
    """
    s = df.select(F.col(x_col).cast("double").alias("x"),
                  F.col(y_col).cast("double").alias("y")) \
          .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    a, b = s.alias("a"), s.alias("b")
    pairs = a.join(b, F.col("a.x") != F.col("b.x")) \
             .select(F.col("a.x").alias("x"),
                     ((F.col("b.y") - F.col("a.y"))
                      / (F.col("b.x") - F.col("a.x"))).alias("sl"))
    per_pt = pairs.groupBy("x").agg(
        F.expr("percentile(sl, 0.5)").alias("ms"))
    slope = per_pt.agg(F.expr("percentile(ms, 0.5)").alias("slope"))
    icept = (s.crossJoin(F.broadcast(slope))
             .select((F.col("y") - F.col("slope") * F.col("x"))
                     .alias("r"), "slope")
             .agg(F.expr("percentile(r, 0.5)").alias("icept"),
                  F.first("slope").alias("slope"),
                  F.count(F.lit(1)).alias("n")))
    return icept.select(
        F.col("n").cast("long").alias("n"),
        F.round("slope", round_to).alias("slope"),
        F.round("icept", round_to).alias("intercept"))


def sample_topk_stability(df: DataFrame, term_col: str, *,
                          rates: Sequence[float] = (0.01, 0.05,
                                                    0.25),
                          k: int = 10, id_col: str | None = None,
                          round_to: int = 6) -> DataFrame:
    """Sample-sufficiency advisor for top-k profiling: at each
    deterministic md5-hash sample rate, how much of the FULL top-k
    does the sample's top-k recover? Counting queries over 10^12
    rows are routinely answered on samples; this row says which
    rate is safe for head-of-distribution questions (overlap ~ k)
    and which silently lies (overlap near 0). Sampling hashes the
    term occurrence's id (or the term itself when id_col is None -
    then sampling is BY TERM, keeping or dropping whole terms).
    Ranking is (count desc, term asc), deterministic. One counts
    pass per rate over the shared base. Returns per-rate rows
    ``(rate, k, overlap, overlap_share)``.
    """
    kk = int(k)
    key = (F.col(id_col) if id_col else F.col(term_col))
    base = df.where(F.col(term_col).isNotNull()).select(
        F.col(term_col).alias("t"),
        (F.conv(F.substring(F.md5(key.cast("string")), 1, 8),
                16, 10).cast("long") % 1000000).alias("hk"))

    def top(frame):
        c = frame.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
        w = Window.orderBy(F.col("n").desc(), F.col("t"))
        return (c.select("t", F.row_number().over(w).alias("r"))
                .where(F.col("r") <= kk).select("t"))
    full = top(base)
    outs = []
    for rate in rates:
        cut = int(float(rate) * 1000000)
        samp = top(base.where(F.col("hk") < cut))
        ov = (full.join(samp, "t")
              .agg(F.count(F.lit(1)).alias("overlap")))
        outs.append(ov.select(
            F.lit(float(rate)).alias("rate"),
            F.lit(kk).alias("k"),
            F.col("overlap").cast("long").alias("overlap"),
            F.round(F.col("overlap") / kk, round_to)
             .alias("overlap_share")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def filter_funnel(df: DataFrame, gates: Sequence[tuple], *,
                  round_to: int = 6) -> DataFrame:
    """Ordered filter-funnel attribution: for a curation pipeline's
    gate sequence, each gate's SOLO failure rate (how many rows
    fail it alone) next to its MARGINAL kill count (rows it
    removes given everything before it already ran) - the two
    numbers that explain "gate 4 looks harmless solo but kills
    nothing because gate 2 already took its prey" vs "gate 4 is
    the only thing standing between us and 30% junk". One
    conditional-sums pass. *gates* is a sequence of (name,
    boolean-Column PASS predicate) pairs. Returns one row per gate
    in order ``(stage, gate, n_fail_solo, solo_share,
    n_kill_marginal, survivors_after)``.
    """
    names = [g[0] for g in gates]
    preds = [g[1] for g in gates]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    run = F.lit(True)
    for i, p in enumerate(preds):
        aggs.append(F.sum((~p).cast("long")).alias(f"solo{i}"))
        aggs.append(F.sum((run & ~p).cast("long"))
                    .alias(f"kill{i}"))
        run = run & p
    aggs.append(F.sum(run.cast("long")).alias("final"))
    a = df.agg(*aggs)
    outs = []
    survivors = F.col("n")
    for i, name in enumerate(names):
        survivors = survivors - F.col(f"kill{i}")
        outs.append(a.select(
            F.lit(i + 1).alias("stage"),
            F.lit(name).alias("gate"),
            F.col(f"solo{i}").cast("long").alias("n_fail_solo"),
            F.round(F.col(f"solo{i}") / F.col("n"), round_to)
             .alias("solo_share"),
            F.col(f"kill{i}").cast("long").alias("n_kill_marginal"),
            survivors.cast("long").alias("survivors_after")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def median_ci(df: DataFrame, value_col: str, *, by: str,
              round_to: int = 6) -> DataFrame:
    """Distribution-free confidence interval for the MEDIAN via
    order statistics: the interval [x_(l), x_(u)] with l,u =
    n/2 -+ 1.96*sqrt(n)/2 (the binomial normal approximation)
    covers the true median at ~95% with NO distributional
    assumption - the honest uncertainty for the quantile gates the
    robust rows recommend, where a normal-theory mean CI is both
    wrong-parameter and wrong-model. Order statistics come off the
    per-group distinct-value cumulative table. Returns per-group
    rows ``(group, n, median, ci_lo, ci_hi)``.
    """
    base = df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & F.col("v").isNotNull())
    ns = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.expr("percentile(v, 0.5)").alias("med"))
    vc = base.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("double").alias("c"))
    wc = (Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = vc.select("g", "v", F.sum("c").over(wc).alias("cum")) \
            .join(F.broadcast(ns), "g")
    l_rank = F.greatest(F.floor(F.col("n") / 2
                                - 1.96 * F.sqrt(F.col("n")) / 2),
                        F.lit(1))
    u_rank = F.least(F.ceil(F.col("n") / 2
                            + 1.96 * F.sqrt(F.col("n")) / 2 + 1),
                     F.col("n"))
    lo = (cum.where(F.col("cum") >= l_rank)
          .groupBy("g").agg(F.min("v").alias("ci_lo")))
    hi = (cum.where(F.col("cum") >= u_rank)
          .groupBy("g").agg(F.min("v").alias("ci_hi")))
    out = ns.join(F.broadcast(lo), "g").join(F.broadcast(hi), "g")
    return out.select(
        F.col("g").alias("group"), F.col("n").cast("long").alias("n"),
        F.round("med", round_to).alias("median"),
        F.round("ci_lo", round_to).alias("ci_lo"),
        F.round("ci_hi", round_to).alias("ci_hi")).orderBy("group")


def spiegelhalter_z(df: DataFrame, *, prob_col, label_col,
                    round_to: int = 6) -> DataFrame:
    """Spiegelhalter's calibration Z test (Spiegelhalter 1986): for
    predicted probabilities p and outcomes y,

        Z = sum (y - p)(1 - 2p) / sqrt(sum (1-2p)^2 p(1-p))

    - a TEST of calibration with an exact null variance, where the
    binned reliability table (:func:`quality_calibration`) is a
    picture and ECE a summary without a yardstick. |Z| > 1.96 says
    the score's probabilities are not probabilities; discrimination
    (:func:`roc_auc`) can still be fine. ONE aggregation. Returns
    ``(n, base_rate, mean_pred, z)``.
    """
    p = (prob_col if isinstance(prob_col, Column)
         else F.col(prob_col))
    y = (label_col if isinstance(label_col, Column)
         else F.col(label_col))
    base = df.select(p.cast("double").alias("p"),
                     y.cast("int").cast("double").alias("y")) \
             .where(F.col("p").isNotNull() & F.col("y").isNotNull())
    a = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("br"), F.avg("p").alias("mp"),
        F.sum((F.col("y") - F.col("p"))
              * (1 - 2 * F.col("p"))).alias("num"),
        F.sum((1 - 2 * F.col("p")) ** 2 * F.col("p")
              * (1 - F.col("p"))).alias("den"))
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.round("br", round_to).alias("base_rate"),
        F.round("mp", round_to).alias("mean_pred"),
        F.round(F.when(F.col("den") > 0,
                       F.col("num") / F.sqrt(F.col("den"))),
                round_to).alias("z"))


def lin_ccc(df: DataFrame, x_col: str, y_col: str, *,
            round_to: int = 6) -> DataFrame:
    """Lin's concordance correlation coefficient (Lin 1989):

        CCC = 2*cov(x,y) / (var_x + var_y + (mu_x - mu_y)^2)

    - agreement with the 45-degree line, not just linearity:
    Pearson's r is 1 for y = 2x + 7; CCC punishes both the scale
    and location bias, which is exactly the question when two
    pipelines are supposed to produce the SAME number. The scalar
    companion to :func:`bland_altman` (interval view) and
    :func:`deming_fit` (structural view); the bias-correction
    factor C_b = CCC/r separates precision from accuracy. ONE
    aggregation. Returns ``(n, pearson_r, c_b, ccc)``.
    """
    s = df.select(F.col(x_col).cast("double").alias("x"),
                  F.col(y_col).cast("double").alias("y")) \
          .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    a = s.agg(F.count(F.lit(1)).alias("n"),
              F.avg("x").alias("mx"), F.avg("y").alias("my"),
              F.var_pop("x").alias("vx"), F.var_pop("y").alias("vy"),
              F.covar_pop("x", "y").alias("cxy"))
    ccc = (2 * F.col("cxy")
           / (F.col("vx") + F.col("vy")
              + (F.col("mx") - F.col("my")) ** 2))
    r = F.try_divide(F.col("cxy"),
                     F.sqrt(F.col("vx") * F.col("vy")))
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.round(r, round_to).alias("pearson_r"),
        F.round(F.try_divide(ccc, r), round_to).alias("c_b"),
        F.round(ccc, round_to).alias("ccc"))


def skew_scan(df: DataFrame, cols: Sequence[str], *,
              round_to: int = 6) -> DataFrame:
    """Multi-column tail-heaviness sweep - the five-second triage
    that decides which columns need the heavy tail machinery
    (:func:`power_tail_hill`, :func:`gpd_tail_fit`, robust scales)
    and which are safe for mean-based gates: per numeric column,
    p50/p99/p999, the p99/p50 TAIL RATIO (>10 = log it before
    anything else) and the coefficient of variation. ONE fused
    aggregation for every column. Returns one row per column
    ``(column, n, p50, p99, p999, tail_ratio, cv)``.
    """
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [
            F.count(v).alias(f"n_{c}"),
            F.expr(f"percentile({c}, 0.5)").alias(f"p50_{c}"),
            F.expr(f"percentile({c}, 0.99)").alias(f"p99_{c}"),
            F.expr(f"percentile({c}, 0.999)").alias(f"p999_{c}"),
            F.avg(v).alias(f"m_{c}"),
            F.stddev(v).alias(f"s_{c}")]
    a = df.agg(*aggs)
    outs = []
    for c in cols:
        outs.append(a.select(
            F.lit(c).alias("column"),
            F.col(f"n_{c}").cast("long").alias("n"),
            F.round(F.col(f"p50_{c}"), round_to).alias("p50"),
            F.round(F.col(f"p99_{c}"), round_to).alias("p99"),
            F.round(F.col(f"p999_{c}"), round_to).alias("p999"),
            F.round(F.try_divide(F.col(f"p99_{c}"),
                                 F.col(f"p50_{c}")), round_to)
             .alias("tail_ratio"),
            F.round(F.try_divide(F.col(f"s_{c}"), F.col(f"m_{c}")),
                    round_to).alias("cv")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def page_trend(df: DataFrame, *, block_col: str, treat_score,
               value_col: str, round_to: int = 6) -> DataFrame:
    """Page's L trend test (Page 1963) - the ORDERED-alternative
    refinement of :func:`friedman_test`, exactly as Jonckheere
    refines Kruskal-Wallis: treatments carry a hypothesized order
    (version 1 < 2 < 3), values are ranked within blocks, and

        L = sum_j j * R_j,
        mu = b*k(k+1)^2/4,
        sigma^2 = b*(k^3 - k)^2 / (144*(k - 1))

    so a monotone improvement that Friedman's omnibus chi2 dilutes
    across k-1 dof shows as one signed z. Complete blocks only
    (dropped count reported); ties take average ranks. Returns one
    row ``(n_blocks, n_dropped, k_treat, l_stat, mean_l, z)``.
    """
    score = (treat_score if isinstance(treat_score, Column)
             else F.col(treat_score))
    base = (df.select(F.col(block_col).alias("b"),
                      score.cast("double").alias("j"),
                      F.col(value_col).cast("double").alias("v"))
            .where(F.col("b").isNotNull() & F.col("j").isNotNull()
                   & F.col("v").isNotNull()))
    k = base.agg(F.countDistinct("j").cast("double").alias("k"))
    sizes = base.groupBy("b").agg(F.countDistinct("j").alias("kb"))
    complete = (base.join(sizes, "b").crossJoin(F.broadcast(k))
                .where(F.col("kb") == F.col("k")))
    dropped = sizes.crossJoin(F.broadcast(k)) \
                   .where(F.col("kb") != F.col("k")) \
                   .agg(F.count(F.lit(1)).alias("n_dropped"))
    wb = Window.partitionBy("b").orderBy("v")
    eq = F.count(F.lit(1)).over(Window.partitionBy("b", "v"))
    rank2 = 2 * F.rank().over(wb) + eq - 1
    per_j = (complete.select("j", rank2.alias("r2"), "k")
             .groupBy("j")
             .agg(F.sum("r2").cast("double").alias("r2j"),
                  F.count(F.lit(1)).cast("double").alias("nb"),
                  F.first("k").alias("k")))
    # rank of the treatment score itself defines j's position 1..k
    wj = Window.orderBy("j")
    pos = per_j.select(F.row_number().over(wj).alias("pos"),
                       "r2j", "nb", "k")
    a = pos.agg(F.first("nb").alias("b"), F.first("k").alias("k"),
                F.sum(F.col("pos") * F.col("r2j") / 2.0)
                 .alias("l"))
    bq, kq = F.col("b"), F.col("k")
    mean_l = bq * kq * (kq + 1) ** 2 / 4.0
    var_l = bq * (kq ** 3 - kq) ** 2 / (144.0 * (kq - 1))
    return a.crossJoin(F.broadcast(dropped)).select(
        bq.cast("long").alias("n_blocks"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        kq.cast("long").alias("k_treat"),
        F.round("l", round_to).alias("l_stat"),
        F.round(mean_l, round_to).alias("mean_l"),
        F.round(F.when(var_l > 0, (F.col("l") - mean_l)
                       / F.sqrt(var_l)), round_to).alias("z"))


def atkinson_index(df: DataFrame, value_col: str, *, by: str,
                   eps: float = 0.5,
                   round_to: int = 6) -> DataFrame:
    """Atkinson inequality index per group (Atkinson 1970): 1 minus
    the ratio of the equally-distributed-equivalent value to the
    mean, with inequality aversion eps -

        eps != 1:  A = 1 - (mean(x^(1-eps)))^(1/(1-eps)) / mean(x)
        eps == 1:  A = 1 - geomean(x) / mean(x)

    The NORMATIVE member of the inequality family (:func:`gini` is
    geometric, Theil information-theoretic): A = 0.3 reads directly
    as "we could discard 30% of total volume and, distributed
    equally, be as well off" - the right framing for crawl-budget
    and sampling-fairness questions. Positive values only. One
    aggregation per group. Returns ``(group, n, mean, ede,
    atkinson)``.
    """
    e = float(eps)
    base = df.select(F.col(by).alias("g"),
                     F.col(value_col).cast("double").alias("v")) \
             .where(F.col("g").isNotNull() & (F.col("v") > 0))
    if abs(e - 1.0) < 1e-12:
        a = base.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("v").alias("m"),
            F.exp(F.avg(F.log("v"))).alias("ede"))
    else:
        p = 1.0 - e
        a = base.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("v").alias("m"),
            F.pow(F.avg(F.pow("v", p)), 1.0 / p).alias("ede"))
    return a.select(
        F.col("g").alias("group"), F.col("n").cast("long").alias("n"),
        F.round("m", round_to).alias("mean"),
        F.round("ede", round_to).alias("ede"),
        F.round(1.0 - F.col("ede") / F.col("m"), round_to)
         .alias("atkinson")).orderBy("group")


def pettitt_test(df: DataFrame, *, ts_col: str,
                 unit: str = "day") -> DataFrame:
    """Pettitt (1979) rank-based change-point scan over per-*unit*
    event volumes: U_k = Σ_{i≤k} Σ_{j>k} sgn(x_i − x_j), the
    nonparametric sibling of :func:`cusum_shift` — immune to the
    heavy-tailed daily volumes that drag a mean-based CUSUM around,
    the standard "did the level shift, and when" test for series
    with outliers (crawler bursts, bot storms).

    Exactness: via the rank identity U_k = Σ_{i≤k} V_i with
    V_i = Σ_j sgn(x_i − x_j) = 2·rank_i + ties_i − n − 2 (average
    ranks doubled → pure BIGINT arithmetic), both engines agree
    bit-for-bit; no O(n²) pair loop on the Spark side. ``is_peak``
    marks the bucket(s) attaining max |U_k| — the located
    change-point; the classic significance approximation is
    p ≈ 2·exp(−6K²/(n³+n²)) on K = max|U_k|.

    Plan: one shuffle to the per-bucket counts; the rank / tie /
    prefix windows ride the BUCKETS table (≤ thousands of rows
    however large the input), never the corpus.
    """
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("bucket_ts"))
             .agg(F.count(F.lit(1)).alias("n")))
    w_all = Window.partitionBy()
    n_buckets = F.count(F.lit(1)).over(w_all)
    rnk = F.rank().over(Window.partitionBy().orderBy("n"))
    ties = F.count(F.lit(1)).over(Window.partitionBy("n"))
    v_k = (2 * rnk + ties - n_buckets - 2).cast("long")
    w_pfx = (Window.partitionBy().orderBy("bucket_ts")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    scored = daily.select("bucket_ts", F.col("n").cast("long").alias("n"),
                          v_k.alias("__v"))
    out = scored.select(
        "bucket_ts", "n",
        F.sum("__v").over(w_pfx).cast("long").alias("u_stat"))
    peak = F.max(F.abs(F.col("u_stat"))).over(w_all)
    return out.withColumn("is_peak", F.abs(F.col("u_stat")) == peak)


def cliffs_delta(df: DataFrame, *, value_col: str,
                 group_col: str) -> DataFrame:
    """Cliff's delta of *value_col* for EACH group vs the rest of the
    corpus: δ = (#{a>b} − #{a<b}) / (n_a·n_b), the ordinal effect
    size (= 2·AUC − 1) that, unlike Hedges g, needs no normality and
    saturates at ±1 — the robust "how much longer are EN docs,
    really" number. ``magnitude`` applies the Romano et al. (2006)
    thresholds (|δ| < .147 negligible, < .33 small, < .474 medium,
    else large) on the ROUNDED value so both engines label
    identically.

    Exactness: one GLOBAL pooled ranking serves every group at once —
    for sample-vs-complement, pooled(a ∪ rest) IS the corpus, so
    2·U_a = R2_a − n_a(n_a+1) with R2_a the doubled rank sum
    (BIGINT), and δ = (2U_a − 2U_b)/(2·n_a·n_b) is a single terminal
    division reported as round(1e6·δ) → ``delta_micro``.

    Plan: one shuffle to the (value, group) counts; the cumulative
    window rides the DISTINCT-VALUE table; a second small shuffle to
    the per-group aggregate. Never a pair join.
    """
    base = df.where(F.col(value_col).isNotNull()
                    & F.col(group_col).isNotNull()) \
             .select(F.col(group_col).alias("g"),
                     F.col(value_col).alias("__v"))
    vc = base.groupBy("__v", "g").agg(F.count(F.lit(1)).alias("__na"))
    dv = vc.groupBy("__v").agg(F.sum("__na").alias("__nv"))
    w_pfx = (Window.partitionBy().orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, -1))
    rank2 = (2 * F.coalesce(F.sum("__nv").over(w_pfx), F.lit(0))
             + F.col("__nv") + 1)
    ranked = dv.select("__v", rank2.alias("__r2"))
    agg = (vc.join(ranked, "__v")
           .groupBy("g")
           .agg(F.sum("__na").alias("n_a"),
                F.sum(F.col("__na") * F.col("__r2")).alias("__r2a")))
    n_total = F.sum("n_a").over(Window.partitionBy())
    scored = agg.select(
        F.col("g"), F.col("n_a").cast("long").alias("n_a"),
        (n_total - F.col("n_a")).cast("long").alias("n_b"),
        (F.col("__r2a") - F.col("n_a") * (F.col("n_a") + 1))
        .alias("__u2a"))
    u2b = 2 * F.col("n_a") * F.col("n_b") - F.col("__u2a")
    delta_micro = F.round(F.lit(1e6) * (F.col("__u2a") - u2b)
                          / (2 * F.col("n_a") * F.col("n_b"))) \
                   .cast("long")
    out = scored.select(
        F.col("g").alias("group"), "n_a", "n_b",
        delta_micro.alias("delta_micro"))
    mag = (F.when(F.abs(F.col("delta_micro")) < 147000, "negligible")
           .when(F.abs(F.col("delta_micro")) < 330000, "small")
           .when(F.abs(F.col("delta_micro")) < 474000, "medium")
           .otherwise("large"))
    return out.withColumn("magnitude", mag).orderBy("group")


def hellinger_drift(df: DataFrame, value_col: str, *, split,
                    bin_width: int = 32, max_bin: int = 63,
                    round_to: int = 6) -> DataFrame:
    """Hellinger distance H and Bhattacharyya coefficient BC between
    the *value_col* histograms of the two *split* sides:
    BC = Σ √(p_i·q_i), H = √(1 − BC) — the bounded [0,1] member of
    the drift family, symmetric (unlike KL), defined on
    zero-overlap bins (unlike PSI's ±∞), and metric (triangle
    inequality holds — usable as a distance in drift clustering).

    Binning is EXACT integer division (``least(v div bin_width,
    max_bin)``) so bin assignment is engine-identical; the only
    floats are the ≤ ``max_bin``+1 √(pq) terms, far inside the
    round-6 report. Plan: one hash aggregation to (bin, side
    counts) — ≤ 64 rows — then a scalar aggregate. One shuffle.
    """
    side = F.when(split, F.lit(0)).otherwise(F.lit(1))
    h = (df.where(F.col(value_col).isNotNull())
         .groupBy(F.least(F.expr(f"{value_col} div {int(bin_width)}"),
                          F.lit(int(max_bin))).alias("bin"))
         .agg(F.sum(F.when(side == 0, 1).otherwise(0)).alias("ca"),
              F.sum(F.when(side == 1, 1).otherwise(0)).alias("cb")))
    w_all = Window.partitionBy()
    na = F.sum("ca").over(w_all)
    nb = F.sum("cb").over(w_all)
    terms = h.select(
        F.col("ca"), F.col("cb"),
        F.sqrt((F.col("ca") / na) * (F.col("cb") / nb)).alias("__t"))
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.round(F.sum("__t"), round_to).alias("bc"),
        F.round(F.sqrt(1.0 - F.least(F.sum("__t"), F.lit(1.0))),
                round_to).alias("hellinger"))


def brier_decomposition(df: DataFrame, *, prob_col: str,
                        label_col: str, bins: int = 10,
                        round_to: int = 6) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score into
    reliability − resolution + uncertainty over *bins* equal-width
    probability bins:

        REL = Σ n_k (p̄_k − ō_k)² / N   (calibration error — lower
                                          is better)
        RES = Σ n_k (ō_k − ō)² / N     (discrimination — higher is
                                          better)
        UNC = ō (1 − ō)                (irreducible base-rate term)

    plus the DIRECT Brier = mean (p − y)². The diagnostic sibling of
    :func:`spiegelhalter_z` (which only answers "is calibration
    wrong"): decomposition says whether a bad score is a calibration
    problem (REL) or a no-signal problem (RES) — the difference
    between recalibrating a quality gate and retraining it.

    Binning is ``least(floor(p·bins), bins−1)`` — IEEE multiply +
    floor, engine-identical. Plan: one hash aggregation to ≤ *bins*
    rows carrying exact (n_k, Σp, Σy), then a scalar aggregate; the
    direct Brier rides the same pass as Σp², Σpy. One shuffle.
    """
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("int").cast("double")
    b = F.least(F.floor(p * bins), F.lit(bins - 1))
    per = (df.where(p.isNotNull() & y.isNotNull())
           .groupBy(b.alias("bin"))
           .agg(F.count(F.lit(1)).cast("double").alias("nk"),
                F.avg(p).alias("pk"), F.avg(y).alias("ok"),
                F.sum((p - y) ** 2).alias("sq")))
    w_all = Window.partitionBy()
    n = F.sum("nk").over(w_all)
    obar = F.sum(F.col("nk") * F.col("ok")).over(w_all) / n
    t = per.select(
        "nk", "sq",
        (F.col("nk") * (F.col("pk") - F.col("ok")) ** 2).alias("rl"),
        (F.col("nk") * (F.col("ok") - obar) ** 2).alias("rs"),
        obar.alias("ob"))
    return t.agg(
        F.sum("nk").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.round(F.sum("sq") / F.sum("nk"), round_to).alias("brier"),
        F.round(F.sum("rl") / F.sum("nk"), round_to)
         .alias("reliability"),
        F.round(F.sum("rs") / F.sum("nk"), round_to)
         .alias("resolution"),
        F.round(F.any_value("ob") * (1.0 - F.any_value("ob")),
                round_to).alias("uncertainty"))


def kendalls_w(df: DataFrame, *, rater_col: str, item_col: str,
               value_col: str, round_to: int = 6) -> DataFrame:
    """Kendall's W coefficient of concordance with tie correction:
    m raters each rank n items by *value_col* (one row per
    rater×item; average ranks over ties), and

        W = 12·S / (m²(n³−n) − m·ΣT_j),   T_j = Σ_ties (t³−t)

    — do the raters agree on the ORDERING at all (sources ranking
    langs by length, snapshots ranking hosts by volume), the
    many-rater generalization of Spearman that :func:`fleiss_kappa`
    (nominal labels) and :func:`weighted_kappa` (two raters) don't
    cover. ``chi2`` = m(n−1)W is the large-n test statistic.

    Items missing from any rater are DROPPED (complete-block design
    required); ranks use the doubled-rank identity so everything
    before the terminal division is exact integers. Plan: windows
    ride the rater×item table (m·n rows — tiny by construction since
    the caller pre-aggregates), one shuffle to the per-item rank
    sums.
    """
    base = df.select(F.col(rater_col).alias("r"),
                     F.col(item_col).alias("i"),
                     F.col(value_col).alias("v")) \
             .where(F.col("r").isNotNull() & F.col("i").isNotNull()
                    & F.col("v").isNotNull())
    m = base.select("r").distinct().count()
    complete = (base.groupBy("i")
                .agg(F.count(F.lit(1)).alias("__c"))
                .where(F.col("__c") == m).drop("__c"))
    base = base.join(F.broadcast(complete), "i")
    rnk = F.rank().over(Window.partitionBy("r").orderBy("v"))
    ties = F.count(F.lit(1)).over(Window.partitionBy("r", "v"))
    ranked = base.select("r", "i", "v",
                         (2 * rnk + ties - 1).alias("__r2"),
                         ties.alias("__t"))
    # per-item doubled rank sums -> S4 = sum (R2_i - mean R2)^2 = 4S
    per_item = ranked.groupBy("i").agg(F.sum("__r2").alias("__R2"))
    w_all = Window.partitionBy()
    meanr = F.avg("__R2").over(w_all)
    s4 = per_item.select(((F.col("__R2") - meanr) ** 2).alias("__d")) \
                 .agg(F.sum("__d").alias("s4"),
                      F.count(F.lit(1)).alias("n_items"))
    # tie term: each tie-group of size t contributes t*(t^2-1) once;
    # ranked carries t per ROW, so divide the row-sum by t -> count
    # groups exactly (integer arithmetic: sum (t^2-1) per group)
    tsum = ranked.select("r", "v", F.col("__t")).distinct() \
                 .agg(F.coalesce(F.sum(F.col("__t")
                                       * (F.col("__t") ** 2 - 1)),
                                 F.lit(0)).alias("tsum"))
    out = s4.crossJoin(F.broadcast(tsum))
    n_i = F.col("n_items")
    denom = (F.lit(float(m * m)) * (n_i ** 3 - n_i)
             - F.lit(float(m)) * F.col("tsum"))
    w = F.lit(3.0) * F.col("s4") / denom
    return out.select(
        F.lit(m).cast("long").alias("n_raters"),
        n_i.cast("long").alias("n_items"),
        F.round(w, round_to).alias("w"),
        F.round(F.lit(float(m)) * (n_i - 1) * w, round_to)
         .alias("chi2"))


def taylors_law(df: DataFrame, *, entity_col: str, ts_col: str,
                unit: str = "day", min_buckets: int = 2,
                round_to: int = 6) -> DataFrame:
    """Taylor's power law fit across entities: per entity the mean m
    and variance v of its per-*unit* event counts (over the buckets
    it is ACTIVE in — absence days are not zeros), then the OLS fit

        ln v = intercept + slope · ln m

    across entities with v > 0. slope ≈ 1 is Poisson-like arrival,
    slope → 2 is burst-dominated (sessions, bots, campaigns) — the
    cross-entity aggregation law complementing the per-type Fano
    factor (fluctuation scaling, Taylor 1961; Eisler et al. 2008).

    Per-entity moments come from exact integer (k, Σx, Σx²) sums —
    population variance (Σx² − (Σx)²/k)/k — so entity points are
    engine-identical before the log; the OLS is closed-form over the
    entity table. Two shuffles (entity×bucket, then entity), both
    key-uniform. Returns one row ``(n_entities, slope, intercept,
    r2)``.
    """
    per_bucket = (df.where(F.col(entity_col).isNotNull())
                  .groupBy(F.col(entity_col).alias("e"),
                           F.date_trunc(unit, F.col(ts_col))
                           .alias("b"))
                  .agg(F.count(F.lit(1)).alias("x")))
    per_entity = (per_bucket.groupBy("e")
                  .agg(F.count(F.lit(1)).alias("k"),
                       F.sum("x").alias("s1"),
                       F.sum(F.col("x") * F.col("x")).alias("s2")))
    mean = F.col("s1") / F.col("k")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")) \
        / F.col("k")
    pts = (per_entity.where(F.col("k") >= min_buckets)
           .select(F.log(mean).alias("lx"), F.log(var).alias("ly"))
           .where(F.col("ly").isNotNull()))   # var > 0 only
    agg = pts.agg(F.count(F.lit(1)).cast("double").alias("n"),
                  F.avg("lx").alias("mx"), F.avg("ly").alias("my"),
                  F.covar_pop("lx", "ly").alias("cxy"),
                  F.var_pop("lx").alias("vx"),
                  F.var_pop("ly").alias("vy"))
    slope = F.col("cxy") / F.col("vx")
    return agg.select(
        F.col("n").cast("long").alias("n_entities"),
        F.round(slope, round_to).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), round_to)
         .alias("intercept"),
        F.round((F.col("cxy") ** 2) / (F.col("vx") * F.col("vy")),
                round_to).alias("r2"))


def ad_drift(df: DataFrame, value_col: str, *, split,
             round_to: int = 6) -> DataFrame:
    """Two-sample Anderson–Darling drift statistic (Scholz–Stephens
    1987, k=2, tie-aware discrete form): over the pooled distinct
    values z_j (multiplicity l_j, pooled cumulative B_j, per-side
    cumulative M_aj/M_bj),

        A² = Σ_{B_j<N} (l_j/N) · [ (N·M_aj − n·B_j)²/(n·B_j(N−B_j))
                                 + (N·M_bj − m·B_j)²/(m·B_j(N−B_j)) ]

    — the EDF member that up-weights the TAILS (weight 1/(F(1−F))),
    where CvM weighs uniformly, KS takes the max and W₁ the area:
    the alarm for "the p99 moved" when the body of the distribution
    hasn't. Under H₀, E[A²] ≈ 1; large values reject.

    Every squared numerator is exact BIGINT (counts only); divisions
    are terminal. Scale shape identical to :func:`cvm_drift`: ONE
    hash aggregation to (value, count_a, count_b), windows over the
    distinct-value rows. Returns ``(a2, n_values, n_a, n_b)``.
    """
    hist = (df.select(F.col(value_col).alias("v"),
                      F.when(split, 1).otherwise(0).alias("is_a"))
            .where(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.sum("is_a").alias("ca"),
                 F.sum(F.lit(1) - F.col("is_a")).alias("cb")))
    wall = Window.partitionBy()
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    n = F.sum("ca").over(wall)
    m = F.sum("cb").over(wall)
    cum = hist.select(
        (F.col("ca") + F.col("cb")).cast("long").alias("l"),
        F.sum("ca").over(w).cast("long").alias("ma"),
        F.sum("cb").over(w).cast("long").alias("mb"),
        (F.sum("ca").over(w) + F.sum("cb").over(w)).cast("long")
        .alias("b"),
        n.cast("long").alias("n"), m.cast("long").alias("m"),
        (n + m).cast("long").alias("nn"))
    da = F.col("nn") * F.col("ma") - F.col("n") * F.col("b")
    db = F.col("nn") * F.col("mb") - F.col("m") * F.col("b")
    t = cum.where(F.col("b") < F.col("nn")).select(
        "l", "n", "m", "nn",
        (da * da).alias("qa"), (db * db).alias("qb"),
        (F.col("b") * (F.col("nn") - F.col("b"))).alias("w"))
    term = (F.col("l") / F.col("nn")
            * (F.col("qa") / (F.col("n") * F.col("w"))
               + F.col("qb") / (F.col("m") * F.col("w"))))
    return t.agg(
        F.round(F.sum(term), round_to).alias("a2"),
        (F.count(F.lit(1)) + 1).cast("long").alias("n_values"),
        F.any_value("n").alias("n_a"),
        F.any_value("m").alias("n_b"))


def bowker_test(df: DataFrame, *, id_col: str, cat_col: str,
                split, round_to: int = 6) -> DataFrame:
    """Bowker (1948) symmetry test — the k×k generalization of
    McNemar: each subject's MODAL category under the two *split*
    phases (ties broken by (count desc, category asc) so both
    engines pick identically), then

        χ² = Σ_{i<j} (n_ij − n_ji)² / (n_ij + n_ji),
        df = #{pairs i<j with n_ij + n_ji > 0}

    — are the switches BALANCED (style drift both ways) or
    DIRECTIONAL (the corpus is migrating i→j)? :func:`mcnemar` only
    answers this for two categories; transition_audit shows the
    matrix but doesn't test it. Subjects seen in only one phase are
    dropped (paired design).

    All numerators/denominators are exact integer cell counts; the
    division is terminal. Plan: one (id, phase, cat) aggregation,
    a row_number window over it, an id-keyed self-join of the tiny
    modal table, a cell aggregation — every post-corpus stage rides
    subjects, not events. Returns ``(n_subjects, n_switchers, df,
    chi2)``.
    """
    base = (df.where(F.col(id_col).isNotNull()
                     & F.col(cat_col).isNotNull())
            .select(F.col(id_col).alias("i"),
                    F.when(split, 0).otherwise(1).alias("h"),
                    F.col(cat_col).alias("c")))
    counts = base.groupBy("i", "h", "c").agg(
        F.count(F.lit(1)).alias("k"))
    rn = F.row_number().over(
        Window.partitionBy("i", "h")
        .orderBy(F.col("k").desc(), F.col("c")))
    modal = counts.withColumn("__rn", rn).where(F.col("__rn") == 1)
    a = modal.where(F.col("h") == 0).select("i", F.col("c").alias("c1"))
    b = modal.where(F.col("h") == 1).select("i", F.col("c").alias("c2"))
    cells = (a.join(b, "i")
             .groupBy("c1", "c2").agg(F.count(F.lit(1)).alias("n")))
    tot = cells.agg(F.sum("n").cast("long").alias("n_subjects"))
    off = cells.where(F.col("c1") != F.col("c2"))
    pairs = (off.groupBy(F.least("c1", "c2").alias("x"),
                         F.greatest("c1", "c2").alias("y"))
             .agg(F.sum(F.when(F.col("c1") < F.col("c2"),
                               F.col("n")).otherwise(0)).alias("nij"),
                  F.sum(F.when(F.col("c1") > F.col("c2"),
                               F.col("n")).otherwise(0)).alias("nji")))
    stat = pairs.agg(
        F.coalesce(F.sum(F.col("nij") + F.col("nji")), F.lit(0))
        .cast("long").alias("n_switchers"),
        F.count(F.lit(1)).cast("long").alias("df"),
        F.round(F.coalesce(
            F.sum(((F.col("nij") - F.col("nji")) ** 2)
                  / (F.col("nij") + F.col("nji"))), F.lit(0.0)),
            round_to).alias("chi2"))
    return (F.broadcast(tot).crossJoin(stat)
            .select("n_subjects", "n_switchers", "df", "chi2"))


def odds_ratio(df: DataFrame, *, exposure, outcome,
               round_to: int = 6) -> DataFrame:
    """2×2 odds ratio with the Woolf (1955) confidence interval:
    OR = ad/bc and ln OR ± 1.96·√(1/a+1/b+1/c+1/d) — the effect-size
    companion to the chi-square/G independence tests: "how much more
    likely is a purchase on a weekend", with a CI that says whether
    the data can even support the claim. When ANY cell is zero the
    Haldane–Anscombe ½ correction is applied to all four cells
    (``corrected`` column says so).

    One aggregation pass over the corpus computing the four exact
    integer cells; everything after is scalar arithmetic. Returns
    ``(a, b, c, d, corrected, odds_ratio, ci_lo, ci_hi)``.
    """
    e = F.when(exposure, 1).otherwise(0)
    o = F.when(outcome, 1).otherwise(0)
    cells = df.agg(
        F.sum(e * o).cast("long").alias("a"),
        F.sum(e * (1 - o)).cast("long").alias("b"),
        F.sum((1 - e) * o).cast("long").alias("c"),
        F.sum((1 - e) * (1 - o)).cast("long").alias("d"))
    zero = ((F.col("a") == 0) | (F.col("b") == 0)
            | (F.col("c") == 0) | (F.col("d") == 0))
    adj = F.when(zero, 0.5).otherwise(0.0)
    aa = F.col("a") + adj
    bb = F.col("b") + adj
    cc = F.col("c") + adj
    dd = F.col("d") + adj
    lor = F.log(aa * dd / (bb * cc))
    se = F.sqrt(1.0 / aa + 1.0 / bb + 1.0 / cc + 1.0 / dd)
    return cells.select(
        "a", "b", "c", "d", zero.alias("corrected"),
        F.round(aa * dd / (bb * cc), round_to).alias("odds_ratio"),
        F.round(F.exp(lor - 1.959964 * se), round_to).alias("ci_lo"),
        F.round(F.exp(lor + 1.959964 * se), round_to).alias("ci_hi"))


def ind_discovery(sources, *, round_to: int = 6) -> DataFrame:
    """Unary inclusion-dependency discovery (the SPIDER/Binder
    profiling primitive): *sources* is a list of ``(label, df,
    column)`` triples; for every ORDERED pair (L, R) report whether
    distinct(L) ⊆ distinct(R) and how many L-values violate it —
    the candidate-foreign-key map a schema auditor starts from,
    upstream of :func:`fk_integrity` (which checks ONE declared FK
    with row counts).

    Values are compared as strings (the standard profiling
    normalization — documented, deterministic in both engines).
    Plan: one distinct over the unioned (label, value) pairs, ONE
    aggregation computing all |pairs|² presence sums from a
    collect_set per value (labels are few; the agg emits L·(L−1)
    scalar columns), then an unpivot — the value table is scanned
    once however many pairs there are. Returns ``(lhs, rhs,
    n_lhs_distinct, n_violations, holds)`` ordered by (lhs, rhs).
    """
    labels = [lab for lab, _, _ in sources]
    if len(set(labels)) != len(labels):
        raise ValueError("duplicate labels in sources")
    parts = []
    for lab, df, col in sources:
        parts.append(df.where(F.col(col).isNotNull())
                     .select(F.lit(lab).alias("lab"),
                             F.col(col).cast("string").alias("v")))
    uni = parts[0]
    for p in parts[1:]:
        uni = uni.unionByName(p)
    m = uni.distinct().groupBy("v").agg(
        F.collect_set("lab").alias("labs"))
    aggs = []
    names = []
    for ia, a in enumerate(labels):
        has_a = F.array_contains("labs", a).cast("long")
        aggs.append(F.sum(has_a).alias(f"__n_{ia}"))
        for ib, b in enumerate(labels):
            if a == b:
                continue
            miss_b = (~F.array_contains("labs", b)).cast("long")
            aggs.append(F.sum(has_a * miss_b)
                        .alias(f"__v_{ia}_{ib}"))
            names.append((ia, ib))
    wide = m.agg(*aggs)
    esc = [lab.replace("'", "''") for lab in labels]
    stack_args = [
        f"'{esc[ia]}', '{esc[ib]}', __n_{ia}, __v_{ia}_{ib}"
        for ia, ib in names]
    expr = (f"stack({len(names)}, {', '.join(stack_args)}) "
            "as (lhs, rhs, n_lhs_distinct, n_violations)")
    return (wide.selectExpr(expr)
            .withColumn("holds", F.col("n_violations") == 0)
            .orderBy("lhs", "rhs"))


def cohens_h(df: DataFrame, *, group_col: str, success,
             round_to: int = 6) -> DataFrame:
    """Cohen's h effect size for PROPORTIONS between every group
    pair: h = 2·asin√p₁ − 2·asin√p₂ (the arcsine-stabilized gap,
    Cohen 1988), labeled with the conventional |h| thresholds
    (< 0.2 negligible, < 0.5 small, < 0.8 medium, else large) on
    the ROUNDED value. The proportion sibling of Hedges g (means)
    and Cliff's delta (orderings): "is the pass-rate difference
    between DE and EN practically meaningful", independent of the
    sample sizes a p-value rides on.

    One aggregation to per-group (n, successes); the pair join rides
    the tiny group table. Returns ``(group_a, group_b, p_a, p_b, h,
    magnitude)`` for group_a < group_b.
    """
    s = F.when(success, 1).otherwise(0)
    per = (df.where(F.col(group_col).isNotNull())
           .groupBy(F.col(group_col).alias("g"))
           .agg(F.count(F.lit(1)).alias("n"), F.sum(s).alias("k")))
    per = per.select("g", (F.col("k") / F.col("n")).alias("p"))
    a, b = per.alias("a"), per.alias("b")
    phi = lambda p: 2.0 * F.asin(F.sqrt(p))
    h = phi(F.col("a.p")) - phi(F.col("b.p"))
    out = (a.join(b, F.col("a.g") < F.col("b.g"))
           .select(F.col("a.g").alias("group_a"),
                   F.col("b.g").alias("group_b"),
                   F.round("a.p", round_to).alias("p_a"),
                   F.round("b.p", round_to).alias("p_b"),
                   F.round(h, round_to).alias("h")))
    mag = (F.when(F.abs(F.col("h")) < 0.2, "negligible")
           .when(F.abs(F.col("h")) < 0.5, "small")
           .when(F.abs(F.col("h")) < 0.8, "medium")
           .otherwise("large"))
    return out.withColumn("magnitude", mag) \
              .orderBy("group_a", "group_b")


def brunner_munzel(df: DataFrame, *, value_col: str, group_col: str,
                   group_a, round_to: int = 6) -> DataFrame:
    """Brunner–Munzel test (2000) of *value_col* between group A and
    the rest — the rank test that, unlike Mann–Whitney, does NOT
    assume equal variances/shapes under H₀ (the nonparametric
    Behrens–Fisher problem): the right default when EN doc lengths
    are both shifted AND differently spread. Reports the stochastic
    superiority p̂ = P(A < B) + ½P(A = B), the studentized statistic
    W and its Welch-type df (scipy.stats.brunnermunzel's
    formulation).

    Exactness: pooled and within-sample midranks are DOUBLED
    integers from distinct-value cumulative windows (never a row
    window); each distinct (value, side) row carries an exact
    placement d2 = rank2_pooled − rank2_within, and the S² terms are
    count-weighted variances of d2 — floats enter only in the
    terminal variance/ratio arithmetic. One shuffle to the value
    histogram. Returns ``(n_a, n_b, p_hat, w, df)``.
    """
    is_a = (F.col(group_col) == F.lit(group_a)).cast("int")
    vc = (df.where(F.col(value_col).isNotNull()
                   & F.col(group_col).isNotNull())
          .groupBy(F.col(value_col).alias("v"),
                   is_a.alias("a"))
          .agg(F.count(F.lit(1)).alias("c")))
    # pooled doubled midranks over distinct values
    dv = vc.groupBy("v").agg(F.sum("c").alias("nv"))
    wp = (Window.partitionBy().orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1))
    pooled = dv.select(
        "v", (2 * F.coalesce(F.sum("nv").over(wp), F.lit(0))
              + F.col("nv") + 1).alias("r2c"))
    # within-side doubled midranks
    ww = (Window.partitionBy("a").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1))
    within = vc.select(
        "v", "a", "c",
        (2 * F.coalesce(F.sum("c").over(ww), F.lit(0))
         + F.col("c") + 1).alias("r2w"))
    j = within.join(pooled, "v").select(
        "a", "c", "r2c",
        (F.col("r2c") - F.col("r2w")).alias("d2"))
    per = j.groupBy("a").agg(
        F.sum("c").alias("n"),
        (F.sum(F.col("c") * F.col("r2c")) / (2.0 * F.sum("c")))
        .alias("rbar"),
        F.sum(F.col("c") * F.col("d2")).alias("sd2"),
        F.sum(F.col("c") * F.col("d2") * F.col("d2")).alias("sq2"))
    # count-weighted sample variance of d2/2 with (n-1) divisor
    s2 = ((F.col("sq2") - F.col("sd2") * F.col("sd2") / F.col("n"))
          / (4.0 * (F.col("n") - 1)))
    per = per.select("a", "n", "rbar", s2.alias("s2"))
    a = per.where(F.col("a") == 1).select(
        F.col("n").alias("na"), F.col("rbar").alias("ra"),
        F.col("s2").alias("sa"))
    b = per.where(F.col("a") == 0).select(
        F.col("n").alias("nb"), F.col("rbar").alias("rb"),
        F.col("s2").alias("sb"))
    t = a.crossJoin(F.broadcast(b))
    nn = F.col("na") + F.col("nb")
    num = F.col("na") * F.col("nb") * (F.col("rb") - F.col("ra"))
    den = nn * F.sqrt(F.col("na") * F.col("sa")
                      + F.col("nb") * F.col("sb"))
    dfree = (((F.col("na") * F.col("sa")
               + F.col("nb") * F.col("sb")) ** 2)
             / ((F.col("na") * F.col("sa")) ** 2 / (F.col("na") - 1)
                + (F.col("nb") * F.col("sb")) ** 2
                / (F.col("nb") - 1)))
    p_hat = (F.col("rb") - (F.col("nb") + 1) / 2.0) / F.col("na")
    return t.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(p_hat, round_to).alias("p_hat"),
        F.round(num / den, round_to).alias("w"),
        F.round(dfree, round_to).alias("df"))


def mh_odds(df: DataFrame, *, stratum_col: str, exposure, outcome,
            round_to: int = 6) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio + Cochran–MH χ² (1 df, no
    continuity correction) across strata:

        OR_MH = Σᵢ aᵢdᵢ/Nᵢ  /  Σᵢ bᵢcᵢ/Nᵢ
        χ²    = (Σᵢ (aᵢ − r1ᵢc1ᵢ/Nᵢ))² / Σᵢ r1ᵢr0ᵢc1ᵢc0ᵢ/(Nᵢ²(Nᵢ−1))

    — the confounder-adjusted effect the crude :func:`odds_ratio`
    can't give: when simpsons_check says the marginal association
    flips within strata, THIS is the number to report instead.
    Single-row strata (Nᵢ ≤ 1) contribute nothing to either sum
    (0/0 guards → 0). One aggregation to the per-stratum cells;
    everything after rides the strata table. Returns ``(n_strata,
    or_mh, cmh_chi2)``.
    """
    e = F.when(exposure, 1).otherwise(0)
    o = F.when(outcome, 1).otherwise(0)
    cells = (df.where(F.col(stratum_col).isNotNull())
             .groupBy(F.col(stratum_col).alias("s"))
             .agg(F.sum(e * o).alias("a"),
                  F.sum(e * (1 - o)).alias("b"),
                  F.sum((1 - e) * o).alias("c"),
                  F.sum((1 - e) * (1 - o)).alias("d")))
    nn = (F.col("a") + F.col("b") + F.col("c") + F.col("d")) \
        .cast("double")
    r1 = F.col("a") + F.col("b")
    r0 = F.col("c") + F.col("d")
    c1 = F.col("a") + F.col("c")
    c0 = F.col("b") + F.col("d")
    t = cells.select(
        (F.col("a") * F.col("d") / nn).alias("num"),
        (F.col("b") * F.col("c") / nn).alias("den"),
        (F.col("a") - r1 * c1 / nn).alias("dev"),
        F.when(nn > 1, r1 * r0 * c1 * c0 / (nn * nn * (nn - 1)))
         .otherwise(0.0).alias("var"))
    agg = t.agg(F.count(F.lit(1)).cast("long").alias("n_strata"),
                F.sum("num").alias("num"), F.sum("den").alias("den"),
                F.sum("dev").alias("dev"), F.sum("var").alias("var"))
    return agg.select(
        "n_strata",
        F.round(F.col("num") / F.col("den"), round_to)
         .alias("or_mh"),
        F.round(F.col("dev") * F.col("dev") / F.col("var"),
                round_to).alias("cmh_chi2"))


def kupiec_pof(df: DataFrame, *, value_col: str, split,
               nominal: float = 0.1, round_to: int = 6) -> DataFrame:
    """Kupiec proportion-of-failures backtest (1995): calibrate a
    (1−*nominal*) upper threshold on the *split*=true half (exact
    type-1 quantile: smallest value whose CDF ≥ 1−nominal), count
    exceedances x in n held-out rows, and test x/n against nominal
    with the likelihood ratio

        LR = −2[ (n−x)·ln(1−p) + x·ln p
                 − (n−x)·ln(1−x/n) − x·ln(x/n) ]  ~  χ²₁

    — the coverage audit for ANY quantile gate (outlier caps, SLA
    thresholds, conformal intervals): "the p90 cap we shipped — does
    it still cap 10%?" ``reject`` applies the 95% χ²₁ cut (3.841459)
    on the rounded LR. x = 0 or x = n degenerate terms use the
    0·ln(0) = 0 convention via guards.

    Plan: one distinct-value histogram of the calibration half
    (cumulative window over distinct values, never a row sort), one
    scalar threshold broadcast, one count pass over the held-out
    half. Returns ``(threshold, n, x, miss_rate, lr, reject)``.
    """
    p = float(nominal)
    cal = (df.where(split & F.col(value_col).isNotNull())
           .groupBy(F.col(value_col).alias("v"))
           .agg(F.count(F.lit(1)).alias("c")))
    wall = Window.partitionBy()
    wp = (Window.partitionBy().orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cdfed = cal.select(
        "v", (F.sum("c").over(wp) / F.sum("c").over(wall))
        .alias("cdf"))
    thr = (cdfed.where(F.col("cdf") >= 1.0 - p)
           .agg(F.min("v").alias("threshold")))
    test = df.where((~split) & F.col(value_col).isNotNull())
    t = (test.crossJoin(F.broadcast(thr))
         .agg(F.any_value("threshold").alias("threshold"),
              F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(F.when(F.col(value_col)
                           > F.col("threshold"), 1).otherwise(0))
              .cast("long").alias("x")))
    n = F.col("n").cast("double")
    x = F.col("x").cast("double")
    import math
    term_p = (n - x) * F.lit(math.log(1.0 - p)) \
        + x * F.lit(math.log(p))
    term_hat = (F.when(x > 0, x * F.log(x / n)).otherwise(0.0)
                + F.when(x < n, (n - x) * F.log(1.0 - x / n))
                .otherwise(0.0))
    lr = F.round(-2.0 * (term_p - term_hat), round_to)
    out = t.select(
        "threshold", "n", "x",
        F.round(x / n, round_to).alias("miss_rate"),
        lr.alias("lr"))
    return out.withColumn("reject", F.col("lr") > 3.841459)


def cucconi_test(df: DataFrame, *, value_col: str, split,
                 round_to: int = 6) -> DataFrame:
    """Cucconi (1968) joint location-scale rank test between the two
    *split* sides: with S_j the pooled midranks of side B,

        U = (6ΣS_j² − m(N+1)(2N+1)) / √(nm(N+1)(2N+1)(8N+11)/5)
        V = same with contrary ranks (N+1−S_j)
        ρ = 2(N²−4)/((2N+1)(8N+11)) − 1
        C = (U² + V² − 2ρUV) / (2(1−ρ²))

    — ONE statistic that fires on a location shift OR a scale change
    (or both): the single-alarm alternative to running mannwhitney
    (location) and ansari_bradley (scale) separately, and older and
    usually more powerful than the Lepage combination. Under H₀,
    C ~ Exp(1): P(C > c) = e^{−c} — ``p_approx`` reports it.

    Midranks are DOUBLED integers from the distinct-value histogram
    (ΣS² is carried as the exact BIGINT Σc·r2², = 4ΣS²); floats
    enter only in the terminal normalizations. One shuffle to the
    value histogram. Returns ``(n_a, n_b, u, v, c, p_approx)``.
    """
    is_b = F.when(split, 0).otherwise(1)
    vc = (df.where(F.col(value_col).isNotNull())
          .groupBy(F.col(value_col).alias("v"))
          .agg(F.sum(is_b).alias("cb"),
               F.count(F.lit(1)).alias("ct")))
    wp = (Window.partitionBy().orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1))
    r2 = (2 * F.coalesce(F.sum("ct").over(wp), F.lit(0))
          + F.col("ct") + 1)
    wall = Window.partitionBy()
    nn = F.sum("ct").over(wall)
    scored = vc.select(
        "cb", "ct", r2.alias("r2"), nn.alias("nn"))
    agg = scored.agg(
        F.any_value("nn").cast("long").alias("n"),
        F.sum("cb").cast("long").alias("m"),
        F.sum(F.col("cb") * F.col("r2") * F.col("r2"))
        .alias("s2_4x"),                    # 4·ΣS²   (exact)
        F.sum(F.col("cb") * F.col("r2")).alias("s1_2x"))  # 2·ΣS
    n_tot = F.col("n").cast("double")
    m_b = F.col("m").cast("double")
    n_a = n_tot - m_b
    s2 = F.col("s2_4x") / 4.0
    # contrary ranks: Σ(N+1−S)² = m(N+1)² − 2(N+1)ΣS + ΣS²
    s1 = F.col("s1_2x") / 2.0
    s2c = (m_b * (n_tot + 1) * (n_tot + 1)
           - 2 * (n_tot + 1) * s1 + s2)
    denom = F.sqrt(n_a * m_b * (n_tot + 1) * (2 * n_tot + 1)
                   * (8 * n_tot + 11) / 5.0)
    u = (6.0 * s2 - m_b * (n_tot + 1) * (2 * n_tot + 1)) / denom
    v = (6.0 * s2c - m_b * (n_tot + 1) * (2 * n_tot + 1)) / denom
    rho = (2.0 * (n_tot * n_tot - 4.0)
           / ((2 * n_tot + 1) * (8 * n_tot + 11)) - 1.0)
    c = (u * u + v * v - 2.0 * rho * u * v) / (2.0 * (1 - rho * rho))
    return agg.select(
        n_a.cast("long").alias("n_a"), F.col("m").alias("n_b"),
        F.round(u, round_to).alias("u"),
        F.round(v, round_to).alias("v"),
        F.round(c, round_to).alias("c"),
        F.round(F.exp(-c), round_to).alias("p_approx"))


def wilson_interval(df: DataFrame, *, group_col: str, success,
                    z: float = 1.959964,
                    round_to: int = 6) -> DataFrame:
    """Wilson (1927) score interval for a proportion, per group:

        center = (p̂ + z²/2n) / (1 + z²/n)
        half   = z·√(p̂(1−p̂)/n + z²/4n²) / (1 + z²/n)

    — the proportion CI that behaves at p̂ near 0/1 and small n,
    where the Wald interval collapses to zero width around an
    estimate of 0 ("this source had no violations… so far"). The
    per-group uncertainty report backing pass_rate_ztest's pairwise
    verdicts. One aggregation. Returns ``(group, n, k, p, lo, hi)``
    with lo/hi clamped to [0, 1].
    """
    s = F.when(success, 1).otherwise(0)
    per = (df.where(F.col(group_col).isNotNull())
           .groupBy(F.col(group_col).alias("group"))
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(s).cast("long").alias("k")))
    zz = float(z) * float(z)
    n = F.col("n").cast("double")
    p = F.col("k") / n
    denom = 1.0 + zz / n
    center = (p + zz / (2 * n)) / denom
    half = (float(z)
            * F.sqrt(p * (1 - p) / n + zz / (4 * n * n)) / denom)
    return per.select(
        "group", "n", "k",
        F.round(p, round_to).alias("p"),
        F.round(F.greatest(center - half, F.lit(0.0)), round_to)
         .alias("lo"),
        F.round(F.least(center + half, F.lit(1.0)), round_to)
         .alias("hi")).orderBy("group")


def distance_correlation(df: DataFrame, *, x_col: str, y_col: str,
                         id_col: str, m: int = 128,
                         round_to: int = 6) -> DataFrame:
    """Székely's distance correlation (2007) on an md5-ranked sample
    of *m* rows: double-centered pairwise |Δx|, |Δy| matrices,
    dCov² = ΣA_ij·B_ij/m², dCor = dCov/√(dVarx·dVary). dCor = 0 IFF
    independent — the dependence detector that catches the U-shaped
    and heteroscedastic relations Pearson/Spearman (numeric_corr,
    partial_corr) miss entirely.

    The O(m²) pair table is the SAMPLE squared (fixed as the corpus
    grows — the estimator converges in m), built from one broadcast
    self-join; the sample is the deterministic md5 rank, so both
    engines center identical matrices. Returns ``(m, dcor, dvar_x,
    dvar_y)``.
    """
    s = (df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
                  & F.col(id_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(m))
         .select(F.col(id_col).alias("i"),
                 F.col(x_col).cast("double").alias("x"),
                 F.col(y_col).cast("double").alias("y")))
    a, b = s.alias("a"), s.alias("b")
    pairs = (F.broadcast(a).crossJoin(F.broadcast(b))
             .select(F.col("a.i").alias("i"), F.col("b.i").alias("j"),
                     F.abs(F.col("a.x") - F.col("b.x")).alias("dx"),
                     F.abs(F.col("a.y") - F.col("b.y")).alias("dy")))
    wi = Window.partitionBy("i")
    wj = Window.partitionBy("j")
    wall = Window.partitionBy()
    cen = pairs.select(
        (F.col("dx") - F.avg("dx").over(wi) - F.avg("dx").over(wj)
         + F.avg("dx").over(wall)).alias("ax"),
        (F.col("dy") - F.avg("dy").over(wi) - F.avg("dy").over(wj)
         + F.avg("dy").over(wall)).alias("by"))
    agg = cen.agg(
        (F.count(F.lit(1))).alias("m2"),
        F.avg(F.col("ax") * F.col("by")).alias("dcov2"),
        F.avg(F.col("ax") * F.col("ax")).alias("dvarx"),
        F.avg(F.col("by") * F.col("by")).alias("dvary"))
    dcor = F.when(
        (F.col("dvarx") > 0) & (F.col("dvary") > 0),
        F.sqrt(F.sqrt(F.col("dcov2") * F.col("dcov2"))
               / F.sqrt(F.col("dvarx") * F.col("dvary")))
        * F.when(F.col("dcov2") < 0, -1.0).otherwise(1.0)) \
        .otherwise(0.0)
    return agg.select(
        F.sqrt(F.col("m2")).cast("long").alias("m"),
        F.round(dcor, round_to).alias("dcor"),
        F.round("dvarx", round_to).alias("dvar_x"),
        F.round("dvary", round_to).alias("dvar_y"))


def fisher_exact(df: DataFrame, *, exposure, outcome, id_col: str,
                 sample_m: int = 120,
                 round_to: int = 6) -> DataFrame:
    """Fisher's EXACT 2×2 test on an md5-ranked sample of
    *sample_m* rows — the small-cell regime where the chi-square /
    G approximations (and the Woolf CI) break down is exactly where
    a fixed-size audit sample lands, so the sampling IS the use
    case. Two-sided p by the standard rule: sum the hypergeometric
    probabilities of every table as or less likely than the observed
    one (tolerance 1+1e-7 for float ties).

    No factorials: log-weights are built along the support
    k ∈ [max(0, c1−r0), min(r1, c1)] from the exact ratio recurrence
    w(k+1)/w(k) = (r1−k)(c1−k)/((k+1)(r0−c1+k+1)) as cumulative
    log-sums inside ONE array expression (same fold in DuckDB), then
    normalized by the max — no overflow at any table size, fully
    deterministic. Plan: the sample is a TakeOrdered md5 rank, the
    cells one aggregation, the support arithmetic a single-row
    expression. Returns ``(a, b, c, d, p_two_sided)``.
    """
    s = (df.where(F.col(id_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(sample_m)))
    e = F.when(exposure, 1).otherwise(0)
    o = F.when(outcome, 1).otherwise(0)
    cells = s.agg(F.sum(e * o).cast("long").alias("a"),
                  F.sum(e * (1 - o)).cast("long").alias("b"),
                  F.sum((1 - e) * o).cast("long").alias("c"),
                  F.sum((1 - e) * (1 - o)).cast("long").alias("d"))
    r1 = F.col("a") + F.col("b")
    r0 = F.col("c") + F.col("d")
    c1 = F.col("a") + F.col("c")
    k0 = F.greatest(F.lit(0), c1 - r0)
    kmax = F.least(r1, c1)
    # ln of the ratio w(k+1)/w(k) along the support
    lr = F.transform(
        F.sequence(k0, kmax - 1),
        lambda k: F.log((r1 - k) * (c1 - k))
        - F.log((k + 1) * (r0 - c1 + k + 1)))
    # cumulative log-weights, lw(k0) = 0
    lws = F.transform(
        F.sequence(k0, kmax),
        lambda k: F.aggregate(F.slice(lr, 1, (k - k0).cast("int")),
                              F.lit(0.0), lambda acc, x: acc + x))
    t = cells.select(
        "a", "b", "c", "d", k0.alias("k0"), lws.alias("lws"))
    lw_obs = F.element_at(
        F.col("lws"), (F.col("a") - F.col("k0") + 1).cast("int"))
    wmax = F.array_max("lws")
    total = F.aggregate(F.col("lws"), F.lit(0.0),
                        lambda acc, x: acc + F.exp(x - wmax))
    extreme = F.aggregate(
        F.col("lws"), F.lit(0.0),
        lambda acc, x: acc + F.when(x <= lw_obs + 1e-7,
                                    F.exp(x - wmax)).otherwise(0.0))
    # degenerate support (one possible table): p = 1; also guards
    # Spark's sequence(start, stop) flipping DESCENDING when the
    # support is empty
    support = F.size("lws") > 1
    return t.select(
        "a", "b", "c", "d",
        F.round(F.when(support,
                       F.least(extreme / total, F.lit(1.0)))
                .otherwise(F.lit(1.0)), round_to)
         .alias("p_two_sided"))


def gk_gamma(df: DataFrame, *, x_bin, y_bin,
             round_to: int = 6) -> DataFrame:
    """Goodman–Kruskal gamma and Stuart–Kendall tau-c between two
    ORDINAL binnings: from the contingency cells, concordant pairs
    C = Σ n_ij·(mass below-right), discordant D = (mass below-left),

        γ = (C − D)/(C + D),    τ_c = 2m(C − D)/(N²(m − 1))

    (m = min(rows, cols)). γ ignores ties (interpretable as "of the
    untied pairs, how many agree"); τ_c corrects for table shape —
    the ordinal-association pair that Pearson (linear) and the
    nominal chi-square both miss. The caller supplies integer bin
    EXPRESSIONS so binning is engine-exact.

    Plan: one aggregation to the (x, y) cells, then a self-join of
    the TINY cells table (≤ bins² rows) — never a pair join over
    rows. All counts exact BIGINT; divisions terminal. Returns
    ``(n, n_cells, concordant, discordant, gamma, tau_c)``.
    """
    cells = (df.groupBy(x_bin.alias("x"), y_bin.alias("y"))
             .agg(F.count(F.lit(1)).alias("n"))
             .where(F.col("x").isNotNull() & F.col("y").isNotNull()))
    a, b = cells.alias("a"), cells.alias("b")
    cd = (a.join(F.broadcast(b),
                 (F.col("b.x") > F.col("a.x"))
                 & (F.col("b.y") != F.col("a.y")))
          .select((F.col("a.n") * F.col("b.n")).alias("prod"),
                  (F.col("b.y") > F.col("a.y")).alias("conc")))
    sums = cd.agg(
        F.coalesce(F.sum(F.when(F.col("conc"), F.col("prod"))),
                   F.lit(0)).cast("long").alias("cc"),
        F.coalesce(F.sum(F.when(~F.col("conc"), F.col("prod"))),
                   F.lit(0)).cast("long").alias("dd"))
    shape = cells.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.least(F.count_distinct("x"), F.count_distinct("y"))
        .cast("double").alias("m"))
    t = sums.crossJoin(F.broadcast(shape))
    n = F.col("n_rows").cast("double")
    gamma = F.when(F.col("cc") + F.col("dd") > 0,
                   (F.col("cc") - F.col("dd"))
                   / (F.col("cc") + F.col("dd"))).otherwise(0.0)
    tau_c = (2.0 * F.col("m") * (F.col("cc") - F.col("dd"))
             / (n * n * (F.col("m") - 1)))
    return t.select(
        F.col("n_rows").alias("n"), "n_cells",
        F.col("cc").alias("concordant"),
        F.col("dd").alias("discordant"),
        F.round(gamma, round_to).alias("gamma"),
        F.round(tau_c, round_to).alias("tau_c"))


def theils_u(df: DataFrame, *, x_col: str, y_col: str,
             round_to: int = 6) -> DataFrame:
    """Theil's uncertainty coefficient between two categoricals,
    BOTH directions: U(x|y) = MI/H(x) and U(y|x) = MI/H(y) (natural
    logs) — the asymmetric, [0,1]-normalized "how much of x does
    knowing y explain", the pandas-profiling association default.
    Complements the symmetric raw MI (lang_source_mi) and the
    modal-error lambda (gk_lambda): U is the one that says WHICH
    column predicts which.

    One aggregation to the joint cells; marginals and entropies ride
    the tiny cells table. Returns ``(n, h_x, h_y, mi, u_x_given_y,
    u_y_given_x)``.
    """
    base = df.where(F.col(x_col).isNotNull()
                    & F.col(y_col).isNotNull())
    cells = (base.groupBy(F.col(x_col).alias("x"),
                          F.col(y_col).alias("y"))
             .agg(F.count(F.lit(1)).alias("c")))
    wall = Window.partitionBy()
    n = F.sum("c").over(wall)
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    cx = F.sum("c").over(wx)
    cy = F.sum("c").over(wy)
    t = cells.select(
        "c", n.alias("n"), cx.alias("cx"), cy.alias("cy"),
        (F.col("c") / n * F.log(F.col("c") / n)).alias("hxy_t"),
        (F.col("c") / n
         * F.log((F.col("c") * n)
                 / (cx.cast("double") * cy))).alias("mi_t"))
    agg = t.agg(
        F.any_value("n").cast("long").alias("n"),
        (-F.sum(F.col("c") / F.col("n")
                * F.log(F.col("cx") / F.col("n")))).alias("hx"),
        (-F.sum(F.col("c") / F.col("n")
                * F.log(F.col("cy") / F.col("n")))).alias("hy"),
        F.sum("mi_t").alias("mi"))
    return agg.select(
        "n",
        F.round("hx", round_to).alias("h_x"),
        F.round("hy", round_to).alias("h_y"),
        F.round("mi", round_to).alias("mi"),
        F.round(F.col("mi") / F.col("hx"), round_to)
         .alias("u_x_given_y"),
        F.round(F.col("mi") / F.col("hy"), round_to)
         .alias("u_y_given_x"))


def bartlett_test(df: DataFrame, value_col: str, *, by: str,
                  round_to: int = 6) -> DataFrame:
    """Bartlett's (1937) test of equal variances across k groups:

        T = [(N−k)·ln s_p² − Σ(nᵢ−1)·ln sᵢ²]
            / (1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1)))  ~  χ²_{k−1}

    — the MOST POWERFUL equal-variance test when the data are close
    to normal, and notoriously oversensitive to heavy tails: read it
    NEXT TO the robust :func:`levene` (levene_len_langs) — Bartlett
    fires & Levene doesn't ⇒ tails, not variances, differ. Groups
    with nᵢ < 2 are dropped (variance undefined).

    ONE aggregation to per-group (n, Σx, Σx²) — sᵢ² is the exact
    (Σx² − (Σx)²/n)/(n−1); logs/divisions are terminal. Returns
    ``(k, n, pooled_var, t_stat)``.
    """
    g = (df.where(F.col(value_col).isNotNull()
                  & F.col(by).isNotNull())
         .groupBy(by)
         .agg(F.count(F.lit(1)).alias("ni"),
              F.sum(F.col(value_col).cast("double")).alias("si"),
              F.sum(F.col(value_col).cast("double")
                    * F.col(value_col).cast("double")).alias("qi")))
    g = g.where(F.col("ni") >= 2)
    ni = F.col("ni").cast("double")
    s2 = ((F.col("qi") - F.col("si") * F.col("si") / ni)
          / (ni - 1))
    t = g.select(ni.alias("ni"), s2.alias("s2"))
    agg = t.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("ni").alias("n"),
        F.sum((F.col("ni") - 1) * F.col("s2")).alias("ssw"),
        F.sum((F.col("ni") - 1) * F.log("s2")).alias("sumlog"),
        F.sum(1.0 / (F.col("ni") - 1)).alias("suminv"))
    nk = F.col("n") - F.col("k")
    sp2 = F.col("ssw") / nk
    num = nk * F.log(sp2) - F.col("sumlog")
    cfac = (1.0 + (F.col("suminv") - 1.0 / nk)
            / (3.0 * (F.col("k") - 1)))
    return agg.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(sp2, round_to).alias("pooled_var"),
        F.round(num / cfac, round_to).alias("t_stat"))


def welch_anova(df: DataFrame, value_col: str, *, by: str,
                round_to: int = 6) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA (1951): with weights
    wᵢ = nᵢ/sᵢ² and the weighted grand mean x̄_w,

        F* = [Σ wᵢ(x̄ᵢ − x̄_w)²/(k−1)] / [1 + 2(k−2)Λ/(k²−1)],
        Λ  = Σ (1 − wᵢ/Σw)²/(nᵢ−1),   df₂ = (k²−1)/(3Λ)

    — the k-group mean test that stays valid when variances differ
    (classic :func:`anova_oneway` assumes they don't; the pairwise
    welch_len_sources is this test's k=2 special case). Groups with
    nᵢ < 2 or sᵢ² = 0 are dropped.

    ONE aggregation to per-group sufficient statistics, a scalar
    combine after. Returns ``(k, n, f_stat, df1, df2)``.
    """
    g = (df.where(F.col(value_col).isNotNull()
                  & F.col(by).isNotNull())
         .groupBy(by)
         .agg(F.count(F.lit(1)).alias("ni"),
              F.sum(F.col(value_col).cast("double")).alias("si"),
              F.sum(F.col(value_col).cast("double")
                    * F.col(value_col).cast("double")).alias("qi")))
    ni = F.col("ni").cast("double")
    mean = F.col("si") / ni
    s2 = (F.col("qi") - F.col("si") * F.col("si") / ni) / (ni - 1)
    t = (g.where(F.col("ni") >= 2)
         .select(ni.alias("ni"), mean.alias("mi"), s2.alias("s2"))
         .where(F.col("s2") > 0)
         .select("ni", "mi", (F.col("ni") / F.col("s2")).alias("w")))
    wall = Window.partitionBy()
    sw = F.sum("w").over(wall)
    xw = F.sum(F.col("w") * F.col("mi")).over(wall) / sw
    per = t.select(
        "ni", "w",
        (F.col("w") * (F.col("mi") - xw) * (F.col("mi") - xw))
        .alias("bt"),
        ((1.0 - F.col("w") / sw) * (1.0 - F.col("w") / sw)
         / (F.col("ni") - 1)).alias("lt"))
    agg = per.agg(F.count(F.lit(1)).cast("double").alias("k"),
                  F.sum("ni").alias("n"),
                  F.sum("bt").alias("b"), F.sum("lt").alias("lam"))
    k = F.col("k")
    a = F.col("b") / (k - 1)
    denom = 1.0 + 2.0 * (k - 2) * F.col("lam") / (k * k - 1)
    return agg.select(
        k.cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(a / denom, round_to).alias("f_stat"),
        (k - 1).cast("long").alias("df1"),
        F.round((k * k - 1) / (3.0 * F.col("lam")), round_to)
         .alias("df2"))


def bernoulli_eprocess(df: DataFrame, *, ts_col: str, success,
                       p0: float, lam: float = 0.5,
                       unit: str = "day", alpha: float = 0.05,
                       round_to: int = 6) -> DataFrame:
    """Anytime-valid e-process for a Bernoulli rate (the betting
    martingale of Waudby-Smith & Ramdas 2023): against H₀ "success
    rate = p0", wealth multiplies by (1 + λ(x − p0)) per
    observation, so per time bucket

        Δln E = k·ln(1 + λ(1 − p0)) + (n − k)·ln(1 − λ·p0)

    and the RUNNING ln E (cumulative, ordered by bucket) can be
    monitored continuously: reject whenever ln E ≥ ln(1/α) — no
    peeking penalty, ever (Ville's inequality), unlike the fixed-n
    z-test (pass_rate_ztest) or even the SPRT (sprt_langs, which
    needs a point alternative). λ ∈ (0, 1/p0) is the bet size.

    Exact integer (k, n) per bucket; the two log constants are
    computed once; the prefix window rides the bucket table.
    Returns ``(bucket_ts, n, k, ln_e, rejected)`` where ``rejected``
    latches once the boundary ln(1/α) has been crossed.
    """
    import math
    p = float(p0)
    l = float(lam)
    if not 0 < l < 1.0 / p:
        raise ValueError("lam must be in (0, 1/p0)")
    up = math.log(1.0 + l * (1.0 - p))
    dn = math.log(1.0 - l * p)
    s = F.when(success, 1).otherwise(0)
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("bucket_ts"))
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum(s).cast("long").alias("k")))
    wp = (Window.partitionBy().orderBy("bucket_ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lne = F.sum(F.col("k") * F.lit(up)
                + (F.col("n") - F.col("k")) * F.lit(dn)).over(wp)
    bound = math.log(1.0 / float(alpha))
    out = daily.select("bucket_ts", "n", "k",
                       F.round(lne, round_to).alias("ln_e"))
    crossed = F.max((F.col("ln_e") >= round(bound, 6))
                    .cast("int")).over(wp)
    return out.withColumn("rejected", crossed == 1)


def benford_mad(df: DataFrame, value_col: str, *,
                round_to: int = 6) -> DataFrame:
    """First-TWO-digit Benford conformity via Nigrini's MAD: digits
    are read from the INTEGER-CENTS STRING (round(v·100) → string —
    float formatting never enters, so digit assignment is
    engine-exact), all 90 bins 10-99 are scored including absent
    ones, and

        MAD = mean_d |p̂(d) − log₁₀(1 + 1/d)|

    labeled with Nigrini's first-two-digit bands (< .0006 close,
    < .0012 acceptable, < .0022 marginal, else nonconforming) — the
    forensic refinement of the first-digit screen (benford_prices):
    invented values pass first-digit far more often than first-two.

    One aggregation to ≤ 90 bins, a broadcast join against the
    literal bin table. Returns ``(n, mad, worst_digit, worst_gap,
    conformity)``.
    """
    cents = F.round(F.abs(F.col(value_col)) * 100).cast("long")
    istr = F.regexp_replace(cents.cast("string"), "^0+", "")
    d2 = F.substring(istr, 1, 2).cast("int")
    obs = (df.where(F.col(value_col).isNotNull())
           .select(d2.alias("d"), F.length(istr).alias("len"))
           .where(F.col("len") >= 2)
           .groupBy("d").agg(F.count(F.lit(1)).alias("c")))
    spark = df.sparkSession
    bins = spark.range(10, 100).select(F.col("id").cast("int")
                                       .alias("d"))
    full = (bins.join(obs, "d", "left")
            .select("d", F.coalesce("c", F.lit(0)).alias("c")))
    wall = Window.partitionBy()
    n = F.sum("c").over(wall)
    pben = F.log10(1.0 + 1.0 / F.col("d"))
    t = full.select(
        "d", n.alias("n"),
        F.abs(F.col("c") / n - pben).alias("gap"))
    agg = t.agg(
        F.any_value("n").cast("long").alias("n"),
        F.avg("gap").alias("mad"),
        # deterministic tie-break: (gap, d) lexicographic
        F.max_by("d", F.struct(F.col("gap"), F.col("d")))
        .alias("worst_digit"),
        F.max("gap").alias("worst_gap"))
    conf = (F.when(F.col("mad") < 0.0006, "close")
            .when(F.col("mad") < 0.0012, "acceptable")
            .when(F.col("mad") < 0.0022, "marginal")
            .otherwise("nonconforming"))
    return agg.select(
        "n", F.round("mad", round_to).alias("mad"),
        F.col("worst_digit").cast("long").alias("worst_digit"),
        F.round("worst_gap", round_to).alias("worst_gap"),
        conf.alias("conformity"))


def p_chart(df: DataFrame, *, ts_col: str, success,
            unit: str = "day", round_to: int = 6) -> DataFrame:
    """Shewhart p-chart: per time bucket the success share p̂ with
    variable 3σ control limits around the overall center line,

        p̄ ± 3·√(p̄(1−p̄)/nᵢ)   (clamped to [0, 1])

    — the SPC view for RATES with uneven bucket sizes, next to the
    count c-chart (c_chart_volume): a quiet Sunday's wide limits
    won't false-alarm, a busy Monday's tight ones will catch a real
    shift. ``out_of_control`` flags buckets outside their limits.

    One shuffle to the bucket table; the center line is a window
    over it. Returns ``(bucket_ts, n, k, p, lcl, ucl,
    out_of_control)``.
    """
    s = F.when(success, 1).otherwise(0)
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("bucket_ts"))
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum(s).cast("long").alias("k")))
    wall = Window.partitionBy()
    pbar = F.sum("k").over(wall) / F.sum("n").over(wall)
    half = 3.0 * F.sqrt(pbar * (1.0 - pbar)
                        / F.col("n").cast("double"))
    t = daily.select(
        "bucket_ts", "n", "k",
        (F.col("k") / F.col("n")).alias("p"),
        F.greatest(pbar - half, F.lit(0.0)).alias("lcl"),
        F.least(pbar + half, F.lit(1.0)).alias("ucl"))
    return t.select(
        "bucket_ts", "n", "k",
        F.round("p", round_to).alias("p"),
        F.round("lcl", round_to).alias("lcl"),
        F.round("ucl", round_to).alias("ucl"),
        ((F.col("p") < F.col("lcl")) | (F.col("p") > F.col("ucl")))
        .alias("out_of_control")).orderBy("bucket_ts")


def seasonal_strength(df: DataFrame, *, ts_col: str,
                      unit: str = "day", period: int = 7,
                      round_to: int = 6) -> DataFrame:
    """Hyndman's seasonal / trend strength from a classical moving-
    average decomposition of the per-*unit* volume series: trend =
    centered MA(period) (full windows only), seasonal = mean
    detrended value per phase (position mod period), remainder = the
    rest, and

        F_seasonal = max(0, 1 − Var(R)/Var(S+R))
        F_trend    = max(0, 1 − Var(R)/Var(T+R))

    — the two [0,1] numbers that say whether weekly_seasonality's
    pattern and event_volume_trend's slope are LOAD-BEARING or
    noise. Deterministic: phase comes from the row_number of the
    ordered bucket series, not calendar dow, so gaps don't desync
    the engines.

    All windows ride the bucket table. Returns ``(n_buckets,
    n_used, seasonal_strength, trend_strength)``.
    """
    p = int(period)
    half = p // 2
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("b"))
             .agg(F.count(F.lit(1)).cast("double").alias("x")))
    wo = Window.partitionBy().orderBy("b")
    idx = F.row_number().over(wo) - 1
    wma = (Window.partitionBy().orderBy("b")
           .rowsBetween(-half, half))
    t = daily.select(
        "b", "x", idx.alias("i"),
        F.when(F.count(F.lit(1)).over(wma) == 2 * half + 1,
               F.avg("x").over(wma)).alias("trend"))
    t = t.where(F.col("trend").isNotNull()) \
         .select("b", "x", "i", "trend",
                 (F.col("x") - F.col("trend")).alias("d"),
                 F.pmod("i", F.lit(p)).alias("ph"))
    wph = Window.partitionBy("ph")
    t2 = t.select(
        "b", "x", "d", "trend",
        F.avg("d").over(wph).alias("s"))
    t2 = t2.select(
        "d", (F.col("d") - F.col("s")).alias("r"),
        (F.col("x") - F.col("s")).alias("deseas"))
    n_all = daily.count()
    agg = t2.agg(
        F.count(F.lit(1)).cast("long").alias("n_used"),
        F.var_pop("r").alias("vr"),
        F.var_pop("d").alias("vd"),
        F.var_pop("deseas").alias("vt"))
    return agg.select(
        F.lit(n_all).cast("long").alias("n_buckets"), "n_used",
        F.round(F.greatest(F.lit(0.0),
                           1.0 - F.col("vr") / F.col("vd")),
                round_to).alias("seasonal_strength"),
        F.round(F.greatest(F.lit(0.0),
                           1.0 - F.col("vr") / F.col("vt")),
                round_to).alias("trend_strength"))


def hurst_rs(df: DataFrame, *, ts_col: str, unit: str = "day",
             block_sizes=(5, 10, 15),
             round_to: int = 6) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis of the
    per-*unit* volume series: for each block size m, split the
    ordered series into full blocks, compute R/S per block (range of
    the cumulative mean-deviation over the population std), average
    across blocks, and fit ln(R/S) = c + H·ln(m). H ≈ 0.5 reads
    memoryless arrivals, H → 1 persistent bursts (heavy crawl
    sessions), H < 0.5 mean-reverting — the long-memory axis that
    the lag-1 autocorrelation (volume_autocorr) and Taylor's law
    (cross-entity) don't measure.

    Blocks with zero variance are dropped. Two window layers per
    (m, block) over the tiny bucket×|sizes| table; closed-form OLS
    over |sizes| points. Returns ``(n_buckets, hurst, r2,
    n_sizes)``.
    """
    sizes = [int(m) for m in block_sizes]
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("b"))
             .agg(F.count(F.lit(1)).cast("double").alias("x")))
    wo = Window.partitionBy().orderBy("b")
    ser = daily.select("b", "x",
                       (F.row_number().over(wo) - 1).alias("i"))
    spark = df.sparkSession
    ms = spark.createDataFrame([(m,) for m in sizes], "m int")
    e = (ser.crossJoin(F.broadcast(ms))
         .select("m", "x", "i",
                 F.floor(F.col("i") / F.col("m")).alias("blk")))
    wb = Window.partitionBy("m", "blk")
    e = e.select(
        "m", "blk", "x", "i",
        F.count(F.lit(1)).over(wb).alias("bn"),
        F.avg("x").over(wb).alias("bm"),
        F.stddev_pop("x").over(wb).alias("bs"))
    e = e.where(F.col("bn") == F.col("m"))
    wcum = (Window.partitionBy("m", "blk").orderBy("i")
            .rowsBetween(Window.unboundedPreceding,
                         Window.currentRow))
    cum = F.sum(F.col("x") - F.col("bm")).over(wcum)
    per_blk = (e.select("m", "blk", "bs", cum.alias("c"))
               .groupBy("m", "blk")
               .agg((F.max("c") - F.min("c")).alias("r"),
                    F.any_value("bs").alias("s")))
    rs = (per_blk.where(F.col("s") > 0)
          .groupBy("m")
          .agg(F.avg(F.col("r") / F.col("s")).alias("rs")))
    pts = rs.where(F.col("rs") > 0).select(
        F.log(F.col("m").cast("double")).alias("lx"),
        F.log("rs").alias("ly"))
    fit = pts.agg(F.count(F.lit(1)).cast("long").alias("n_sizes"),
                  F.covar_pop("lx", "ly").alias("cxy"),
                  F.var_pop("lx").alias("vx"),
                  F.var_pop("ly").alias("vy"))
    n_all = daily.count()
    return fit.select(
        F.lit(n_all).cast("long").alias("n_buckets"),
        F.round(F.col("cxy") / F.col("vx"), round_to)
         .alias("hurst"),
        F.round((F.col("cxy") * F.col("cxy"))
                / (F.col("vx") * F.col("vy")), round_to)
         .alias("r2"),
        "n_sizes")


def granger_lag1(df: DataFrame, *, ts_col: str, y_on, x_on,
                 unit: str = "day", round_to: int = 6) -> DataFrame:
    """Lag-1 Granger causality F-test: does yesterday's x series
    improve today's y forecast beyond yesterday's y?

        restricted:    y_t = a + b·y_{t−1}
        unrestricted:  y_t = a + b·y_{t−1} + c·x_{t−1}
        F = (RSS_r − RSS_u) / (RSS_u / (n − 3))  ~  F(1, n−3)

    — the TEST volume_xcorr's raw cross-correlation curve lacks: a
    lagged correlation that survives y's own autocorrelation.
    Direction matters; run it both ways to separate "clicks lead
    purchases" from the converse. (Granger ≠ causation — it rules
    predictive value IN, confounders not OUT.)

    One shuffle to the per-bucket (y, x) counts, a lag window, one
    closed-form 2-predictor OLS (exact determinant algebra on
    centered sums). Returns ``(n, f_stat, df2, rss_r, rss_u)``.
    """
    yv = F.sum(F.when(y_on, 1).otherwise(0)).cast("double")
    xv = F.sum(F.when(x_on, 1).otherwise(0)).cast("double")
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("b"))
             .agg(yv.alias("y"), xv.alias("x")))
    wo = Window.partitionBy().orderBy("b")
    lagged = daily.select(
        "b", "y",
        F.lag("y").over(wo).alias("z1"),
        F.lag("x").over(wo).alias("z2")) \
        .where(F.col("z1").isNotNull())
    wall = Window.partitionBy()
    cen = lagged.select(
        (F.col("y") - F.avg("y").over(wall)).alias("cy"),
        (F.col("z1") - F.avg("z1").over(wall)).alias("c1"),
        (F.col("z2") - F.avg("z2").over(wall)).alias("c2"))
    s = cen.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("cy") * F.col("cy")).alias("syy"),
        F.sum(F.col("c1") * F.col("c1")).alias("s11"),
        F.sum(F.col("c2") * F.col("c2")).alias("s22"),
        F.sum(F.col("c1") * F.col("c2")).alias("s12"),
        F.sum(F.col("c1") * F.col("cy")).alias("s1y"),
        F.sum(F.col("c2") * F.col("cy")).alias("s2y"))
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    bb = (F.col("s1y") * F.col("s22")
          - F.col("s2y") * F.col("s12")) / det
    cc = (F.col("s2y") * F.col("s11")
          - F.col("s1y") * F.col("s12")) / det
    rss_u = (F.col("syy") - bb * F.col("s1y") - cc * F.col("s2y"))
    rss_r = (F.col("syy")
             - F.col("s1y") * F.col("s1y") / F.col("s11"))
    # rss_u = 0 (x_{t-1} predicts y_t EXACTLY) makes F infinite:
    # reported as NULL, read "unbounded evidence"
    fstat = F.when(rss_u > 0,
                   (rss_r - rss_u) / (rss_u / (F.col("n") - 3)))
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(fstat, round_to).alias("f_stat"),
        (F.col("n") - 3).cast("long").alias("df2"),
        F.round(rss_r, round_to).alias("rss_r"),
        F.round(rss_u, round_to).alias("rss_u"))


def quade_test(df: DataFrame, *, block_col: str, treat_col: str,
               value_col: str, round_to: int = 6) -> DataFrame:
    """Quade test (1979): the block-weighted Friedman — blocks are
    weighted by the rank of their within-block RANGE, so blocks
    where treatments actually differ carry the verdict. With
    within-block midranks r_ij, block-range ranks Q_i, and
    S_ij = Q_i·(r_ij − (k+1)/2):

        A = ΣΣ S_ij²,  B = (1/b)·Σ_j (Σ_i S_ij)²,
        F = (b−1)·B / (A − B)  ~  F(k−1, (b−1)(k−1))

    — noticeably more powerful than Friedman for small k (the
    common 3-5-treatment monitoring case). Incomplete blocks are
    dropped. Doubled midranks keep S_ij in exact integer quarters
    (scale cancels in F). Windows ride the block×treatment table.
    Returns ``(b, k, f_stat, df1, df2)``.
    """
    base = (df.where(F.col(block_col).isNotNull()
                     & F.col(treat_col).isNotNull()
                     & F.col(value_col).isNotNull())
            .select(F.col(block_col).alias("blk"),
                    F.col(treat_col).alias("trt"),
                    F.col(value_col).alias("v")))
    k_count = base.select("trt").distinct().count()
    complete = (base.groupBy("blk")
                .agg(F.count(F.lit(1)).alias("c"),
                     F.count_distinct("trt").alias("ct"))
                .where((F.col("c") == k_count)
                       & (F.col("ct") == k_count))
                .select("blk"))
    base = base.join(F.broadcast(complete), "blk")
    # within-block doubled midranks: 2*rank + ties - 1
    rnk = F.rank().over(Window.partitionBy("blk").orderBy("v"))
    ties = F.count(F.lit(1)).over(Window.partitionBy("blk", "v"))
    r2 = 2 * rnk + ties - 1
    rng = (F.max("v").over(Window.partitionBy("blk"))
           - F.min("v").over(Window.partitionBy("blk")))
    t = base.select("blk", "trt", r2.alias("r2"), rng.alias("rng"))
    # block weights: doubled midranks of the ranges across blocks
    blocks = t.select("blk", "rng").distinct()
    brnk = F.rank().over(Window.partitionBy().orderBy("rng"))
    bties = F.count(F.lit(1)).over(Window.partitionBy("rng"))
    q2 = blocks.select("blk", (2 * brnk + bties - 1).alias("q2"))
    j = t.join(F.broadcast(q2), "blk").select(
        "blk", "trt",
        (F.col("q2") * (F.col("r2") - (k_count + 1))).alias("s4"))
    per_t = j.groupBy("trt").agg(F.sum("s4").alias("sj"))
    a = j.agg(F.sum(F.col("s4") * F.col("s4")).alias("a"),
              F.count_distinct("blk").cast("double").alias("b"))
    bsum = per_t.agg(F.sum(F.col("sj") * F.col("sj")).alias("bs"))
    tbl = a.crossJoin(F.broadcast(bsum))
    bb = F.col("bs") / F.col("b")
    fstat = F.when(F.col("a") - bb > 0,
                   (F.col("b") - 1) * bb / (F.col("a") - bb))
    return tbl.select(
        F.col("b").cast("long").alias("b"),
        F.lit(k_count).cast("long").alias("k"),
        F.round(fstat, round_to).alias("f_stat"),
        F.lit(k_count - 1).cast("long").alias("df1"),
        ((F.col("b") - 1) * (k_count - 1)).cast("long")
        .alias("df2"))


def bws_test(df: DataFrame, *, value_col: str, split,
             round_to: int = 6) -> DataFrame:
    """Baumgartner–Weiß–Schindler test (1998) between the two
    *split* sides: for side X (size n, the i-th ordered value's
    pooled midrank Rᵢ),

        B_X = (1/n)·Σᵢ (Rᵢ − (m+n)/n·i)²
              / [ (i/(n+1))·(1 − i/(n+1)) · m(m+n)/n ]

    and B = (B_X + B_Y)/2 — the variance-weighted EDF statistic
    that consistently beats KS and CvM in power studies (the gaps
    are studentized pointwise, so tail disagreements count at full
    weight without AD's infinite-weight edge). Ties use pooled
    midranks; the per-side index i over tied values is arbitrary
    but the SUM is tie-order invariant.

    One shuffle to the value histogram for midranks; one per-side
    ordered window for i (this test genuinely needs the order
    statistic — same cost class as every EDF member). Returns
    ``(n_a, n_b, b_a, b_b, b)``.
    """
    side = F.when(split, 0).otherwise(1)
    base = (df.where(F.col(value_col).isNotNull())
            .select(F.col(value_col).alias("v"),
                    side.alias("s")))
    dv = base.groupBy("v").agg(F.count(F.lit(1)).alias("nv"))
    wp = (Window.partitionBy().orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1))
    mid = dv.select(
        "v", ((2 * F.coalesce(F.sum("nv").over(wp), F.lit(0))
               + F.col("nv") + 1) / 2.0).alias("r"))
    ranked = base.join(mid, "v")
    i = F.row_number().over(Window.partitionBy("s").orderBy("v"))
    wside = Window.partitionBy("s")
    n_side = F.count(F.lit(1)).over(wside)
    n_tot = F.count(F.lit(1)).over(Window.partitionBy())
    t = ranked.select(
        "s", "r", i.alias("i"), n_side.alias("ns"),
        (n_tot - n_side).alias("no"))
    ns = F.col("ns").cast("double")
    no = F.col("no").cast("double")
    ii = F.col("i").cast("double")
    num = (F.col("r") - (ns + no) / ns * ii) ** 2
    den = ((ii / (ns + 1)) * (1.0 - ii / (ns + 1))
           * (no * (ns + no) / ns))
    per = t.groupBy("s").agg(
        F.any_value("ns").cast("long").alias("n"),
        (F.sum(num / den) / F.any_value("ns")).alias("bstat"))
    aa = per.where(F.col("s") == 0).select(
        F.col("n").alias("n_a"), F.col("bstat").alias("ba"))
    bb = per.where(F.col("s") == 1).select(
        F.col("n").alias("n_b"), F.col("bstat").alias("bb"))
    out = aa.crossJoin(F.broadcast(bb))
    return out.select(
        "n_a", "n_b",
        F.round("ba", round_to).alias("b_a"),
        F.round("bb", round_to).alias("b_b"),
        F.round((F.col("ba") + F.col("bb")) / 2.0, round_to)
         .alias("b"))


def burstiness(df: DataFrame, *, entity_col: str, ts_col: str,
               min_events: int = 3,
               round_to: int = 6) -> DataFrame:
    """Goh–Barabási burstiness (2008) of inter-event gaps, per
    entity then summarized:  B = (σ − μ)/(σ + μ)  over each
    entity's gap sequence — B ≈ −1 metronome (a polite crawler),
    B ≈ 0 Poisson, B → 1 heavy bursts (sessions, retry storms).
    The DIMENSIONLESS per-entity shape number that the gap
    magnitudes (host_fetch_gaps) and the cross-entity Taylor slope
    don't give; entities need ≥ *min_events* events (≥ 2 gaps).

    Gaps are exact integer seconds (unix_timestamp); per-entity μ/σ
    come from exact (k, Σg, Σg²); the population summary reports
    the mean and exact type-1 quartiles of B over entities. Two
    uniform-key shuffles. Returns one row ``(n_entities, mean_b,
    p25_b, p50_b, p75_b)``.
    """
    base = (df.where(F.col(entity_col).isNotNull()
                     & F.col(ts_col).isNotNull())
            .select(F.col(entity_col).alias("e"),
                    F.unix_timestamp(F.col(ts_col)).alias("t")))
    w = Window.partitionBy("e").orderBy("t")
    gaps = base.select(
        "e", (F.col("t") - F.lag("t").over(w)).alias("g")) \
        .where(F.col("g").isNotNull())
    per = gaps.groupBy("e").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("g").alias("s1"),
        F.sum(F.col("g") * F.col("g")).alias("s2"))
    k = F.col("k").cast("double")
    mu = F.col("s1") / k
    sig = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / k) / k)
    b = (per.where(F.col("k") >= int(min_events) - 1)
         .select(F.when(sig + mu > 0, (sig - mu) / (sig + mu))
                 .otherwise(0.0).alias("b"))
         .where(F.col("b").isNotNull()))
    # exact type-1 quartiles over the per-entity B values
    dv = b.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    wall = Window.partitionBy()
    wp = (Window.partitionBy().orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cdf = dv.select("b", (F.sum("c").over(wp)
                          / F.sum("c").over(wall)).alias("cdf"))
    q = lambda p: (cdf.where(F.col("cdf") >= p)
                   .agg(F.min("b").alias(f"q")))
    stats = b.agg(F.count(F.lit(1)).cast("long").alias("n_entities"),
                  F.round(F.avg("b"), round_to).alias("mean_b"))
    q25 = q(0.25).select(F.round("q", round_to).alias("p25_b"))
    q50 = q(0.50).select(F.round("q", round_to).alias("p50_b"))
    q75 = q(0.75).select(F.round("q", round_to).alias("p75_b"))
    return (stats.crossJoin(F.broadcast(q25))
            .crossJoin(F.broadcast(q50))
            .crossJoin(F.broadcast(q75)))


def pickands_tail(df: DataFrame, value_col: str, *, k: int = 25,
                  round_to: int = 6) -> DataFrame:
    """Pickands (1975) tail-index estimator from three upper order
    statistics:

        ξ̂ = ln[(X₍k₎ − X₍2k₎) / (X₍2k₎ − X₍4k₎)] / ln 2

    — valid for EVERY tail domain (ξ > 0 heavy, = 0 exponential-ish,
    < 0 bounded), where the Hill estimator (hill_tail) presumes
    heavy; Hill says "how heavy", Pickands says "which regime".
    Depends only on the sorted multiset, so rank ties cannot
    introduce nondeterminism.

    Plan: TakeOrdered of the top 4k values (no full sort — Spark
    pushes the limit into the sort), then a 3-value pivot. Returns
    ``(n, k, x_k, x_2k, x_4k, xi)``; ξ is NULL when an order-stat
    gap is zero (discrete plateaus — raise k).
    """
    kk = int(k)
    base = df.where(F.col(value_col).isNotNull()) \
             .select(F.col(value_col).cast("double").alias("v"))
    n = base.count()
    if n < 4 * kk:
        raise ValueError(f"need at least {4 * kk} rows, got {n}")
    top = base.orderBy(F.col("v").desc()).limit(4 * kk)
    rn = F.row_number().over(Window.partitionBy()
                             .orderBy(F.col("v").desc()))
    picked = (top.select("v", rn.alias("rn"))
              .where(F.col("rn").isin(kk, 2 * kk, 4 * kk))
              .agg(F.max(F.when(F.col("rn") == kk, F.col("v")))
                   .alias("x_k"),
                   F.max(F.when(F.col("rn") == 2 * kk, F.col("v")))
                   .alias("x_2k"),
                   F.max(F.when(F.col("rn") == 4 * kk, F.col("v")))
                   .alias("x_4k")))
    import math
    num = F.col("x_k") - F.col("x_2k")
    den = F.col("x_2k") - F.col("x_4k")
    xi = F.when((num > 0) & (den > 0),
                F.log(num / den) / F.lit(math.log(2.0)))
    return picked.select(
        F.lit(n).cast("long").alias("n"),
        F.lit(kk).cast("long").alias("k"),
        F.round("x_k", round_to).alias("x_k"),
        F.round("x_2k", round_to).alias("x_2k"),
        F.round("x_4k", round_to).alias("x_4k"),
        F.round(xi, round_to).alias("xi"))


def extremal_index(df: DataFrame, *, ts_col: str,
                   unit: str = "day", q: float = 0.9,
                   run: int = 1,
                   round_to: int = 6) -> DataFrame:
    """Extremal index θ by runs declustering (Leadbetter): threshold
    u = type-1 q-quantile of the per-*unit* volumes; exceedance
    buckets separated by more than *run* quiet buckets form
    clusters, and θ̂ = clusters / exceedances ∈ (0,1] — θ ≈ 1 reads
    independent extremes, small θ "extremes arrive in storms" (the
    GEV/GPD fits, gumbel_daily_max and gpd_value_tail, silently
    assume θ = 1; this measures whether that's true, and 1/θ is the
    mean storm length).

    Exact type-1 quantile from the distinct-value histogram;
    clustering is one lag over the exceedance-day indices. All
    windows ride the bucket table. Returns ``(n_buckets, threshold,
    n_exceed, n_clusters, theta)``.
    """
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("b"))
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    wall = Window.partitionBy()
    wp = (Window.partitionBy().orderBy("x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    dv = daily.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    cdf = dv.select("x", (F.sum("c").over(wp.orderBy("x"))
                          / F.sum("c").over(wall)).alias("cdf"))
    thr = (cdf.where(F.col("cdf") >= float(q))
           .agg(F.min("x").alias("u")))
    idx = daily.select(
        "b", "x",
        F.row_number().over(Window.partitionBy().orderBy("b"))
        .alias("i"))
    exc = (idx.crossJoin(F.broadcast(thr))
           .where(F.col("x") > F.col("u")))
    lagged = exc.select(
        "i", "u",
        F.lag("i").over(Window.partitionBy().orderBy("i"))
        .alias("pi"))
    starts = F.when(F.col("pi").isNull()
                    | (F.col("i") - F.col("pi") > int(run) + 0),
                    1).otherwise(0)
    agg = lagged.agg(F.any_value("u").alias("threshold"),
                     F.count(F.lit(1)).cast("long")
                     .alias("n_exceed"),
                     F.sum(starts).cast("long").alias("n_clusters"))
    n_all = daily.count()
    return agg.select(
        F.lit(n_all).cast("long").alias("n_buckets"),
        F.col("threshold").cast("long").alias("threshold"),
        "n_exceed", "n_clusters",
        F.round(F.col("n_clusters") / F.col("n_exceed"), round_to)
         .alias("theta"))


def mean_excess(df: DataFrame, value_col: str, *,
                probs=(0.5, 0.6, 0.7, 0.8, 0.9),
                round_to: int = 6) -> DataFrame:
    """Mean-residual-life table: for thresholds u at the type-1
    quantiles *probs*, the mean excess e(u) = E[X − u | X > u] —
    the diagnostic BEHIND gpd_value_tail's fit: e(u) linear in u ⇒
    GPD regime (slope ξ/(1−ξ)); flat ⇒ exponential; falling ⇒ a
    bounded tail. Five numbers that tell you whether fitting a GPD
    was legitimate at all.

    One distinct-value pass for all thresholds, one broadcast of
    the |probs|-row threshold table against the data (filtered
    pre-aggregation, so the blowup is only on exceedances).
    Returns ``(p, threshold, n_exceed, mean_excess)`` per prob.
    """
    base = df.where(F.col(value_col).isNotNull()) \
             .select(F.col(value_col).cast("double").alias("v"))
    wall = Window.partitionBy()
    wp = (Window.partitionBy().orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    dv = base.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cdf = dv.select("v", (F.sum("c").over(wp)
                          / F.sum("c").over(wall)).alias("cdf"))
    thr = None
    for p in probs:
        t = (cdf.where(F.col("cdf") >= float(p))
             .agg(F.lit(float(p)).alias("p"),
                  F.min("v").alias("u")))
        thr = t if thr is None else thr.unionByName(t)
    joined = base.crossJoin(F.broadcast(thr)) \
                 .where(F.col("v") > F.col("u"))
    return (joined.groupBy("p", "u")
            .agg(F.count(F.lit(1)).cast("long").alias("n_exceed"),
                 F.round(F.avg(F.col("v") - F.col("u")), round_to)
                 .alias("mean_excess"))
            .select(F.round("p", round_to).alias("p"),
                    F.round("u", round_to).alias("threshold"),
                    "n_exceed", "mean_excess")
            .orderBy("p"))


def skyline2(df: DataFrame, *, x_col: str, y_col: str,
             id_col: str) -> DataFrame:
    """2-criteria skyline (Pareto frontier, Börzsönyi 2001): rows
    not DOMINATED — no other row is ≥ in both of (*x_col*, *y_col*)
    and > in at least one (both maximized; negate a column to
    minimize). The multi-objective "best documents" operator a
    single weighted score can't express: every weighting's optimum
    lies ON the skyline, so materializing it once serves every
    downstream trade-off.

    Plan (integer criteria): dominance is resolved with TWO window
    maxima — max(y) over strictly-greater x (a RANGE frame, so the
    window is by VALUE, no self-join) and max(y) within the same x —
    never the O(n²) pairwise check. One sort-shuffle by x. Returns
    the skyline rows ``(id, x, y)`` ordered by x desc.
    """
    base = (df.where(F.col(x_col).isNotNull()
                     & F.col(y_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.col(x_col).cast("long").alias("x"),
                    F.col(y_col).cast("long").alias("y")))
    w_gt = (Window.partitionBy().orderBy("x")
            .rangeBetween(1, Window.unboundedFollowing))
    w_eq = Window.partitionBy("x")
    best_gt = F.max("y").over(w_gt)
    best_eq = F.max("y").over(w_eq)
    t = base.select(
        "id", "x", "y", best_gt.alias("bg"), best_eq.alias("be"))
    keep = ((F.col("bg").isNull() | (F.col("bg") < F.col("y")))
            & (F.col("be") <= F.col("y")))
    return (t.where(keep).select("id", "x", "y")
            .orderBy(F.col("x").desc(), F.col("id")))


def cif_competing(df: DataFrame, *, entity_col: str, ts_col: str,
                  cause, unit: str = "day",
                  round_to: int = 6) -> DataFrame:
    """Aalen–Johansen cumulative incidence under competing risks:
    each entity's FIRST event is either the cause of interest or a
    competing one; with per-time risk sets nⱼ, cause counts d₁ⱼ and
    competing counts d₂ⱼ,

        S(tⱼ₋₁) = Π_{i<j} (1 − (d₁ᵢ+d₂ᵢ)/nᵢ),
        CIF(tⱼ)  = Σ_{i≤j} S(tᵢ₋₁)·d₁ᵢ/nᵢ

    — the honest "share who purchased by day t" when churning first
    REMOVES you: the naive 1−KM of purchases alone overstates it
    (the classic competing-risks bias; Putter 2007). Completes the
    survival family (km/nelson_aalen/logrank/rmst are single-risk).

    First-event extraction is one min_by per entity; everything
    after rides the event-time grid (≤ buckets rows): the product
    is an exp-sum-log prefix window. Returns per bucket
    ``(bucket_ts, n_risk, d_cause, d_other, cif)``.
    """
    c = F.when(cause, 1).otherwise(0)
    base = (df.where(F.col(entity_col).isNotNull()
                     & F.col(ts_col).isNotNull())
            .select(F.col(entity_col).alias("e"),
                    F.date_trunc(unit, F.col(ts_col)).alias("b"),
                    c.alias("c")))
    # first event per entity: earliest bucket, cause resolved by
    # (bucket, cause desc) so a same-bucket cause event wins
    # deterministically
    rn = F.row_number().over(
        Window.partitionBy("e").orderBy("b", F.col("c").desc()))
    first = base.withColumn("__rn", rn).where(F.col("__rn") == 1)
    grid = (first.groupBy("b")
            .agg(F.sum("c").alias("d1"),
                 F.sum(1 - F.col("c")).alias("d2")))
    wall = Window.partitionBy()
    wo = Window.partitionBy().orderBy("b")
    later = (F.sum(F.col("d1") + F.col("d2")).over(wall)
             - F.coalesce(F.sum(F.col("d1") + F.col("d2"))
                          .over(wo.rowsBetween(
                              Window.unboundedPreceding, -1)),
                          F.lit(0)))
    t = grid.select("b", "d1", "d2", later.alias("n_risk"))
    frac = (F.col("d1") + F.col("d2")) / F.col("n_risk")
    # the final bucket's hazard is 1 (everyone left leaves): its
    # ln(0) is never inside any prior-prefix frame, but guard it so
    # neither engine evaluates a log of zero
    safe_log = F.when(frac < 1.0, F.log(1.0 - frac)).otherwise(0.0)
    s_prev = F.exp(F.coalesce(
        F.sum(safe_log).over(
            Window.partitionBy().orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0.0)))
    term = s_prev * F.col("d1") / F.col("n_risk")
    t2 = t.select("b", "d1", "d2", "n_risk", term.alias("__t"))
    cif = F.sum("__t").over(
        Window.partitionBy().orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (t2.select(F.col("b").alias("bucket_ts"),
                      F.col("n_risk").cast("long").alias("n_risk"),
                      F.col("d1").cast("long").alias("d_cause"),
                      F.col("d2").cast("long").alias("d_other"),
                      F.round(cif, round_to).alias("cif"))
            .orderBy("bucket_ts"))


def lorenz_asymmetry(df: DataFrame, value_col: str, *, by: str,
                     round_to: int = 6) -> DataFrame:
    """Damgaard–Weiner Lorenz asymmetry coefficient per group:
    S = F(μ) + L(μ), where the Lorenz curve crosses slope 1 — with
    m = #{x < μ}, the bracketing order stats x₍m₎ ≤ μ ≤ x₍m+1₎,
    δ = (μ − x₍m₎)/(x₍m+1₎ − x₍m₎):

        F(μ) = (m + δ)/n,   L(μ) = (Σ_{x<μ} x + δ·x₍m+1₎)/Σx

    S = 1 is a symmetric Lorenz curve; S > 1 says the inequality
    (source_len_gini's number) is driven by a FEW HUGE documents,
    S < 1 by MANY TINY ones — the "which end do I trim" answer the
    Gini/Atkinson/Theil scalars can't give.

    Two aggregations per group (mean, then the conditional sums and
    bracketing stats — max below / min at-or-above the mean). All
    conditional aggregates, no sort. Returns ``(group, n, mean,
    f_mu, l_mu, s_asym)``.
    """
    base = (df.where(F.col(by).isNotNull()
                     & F.col(value_col).isNotNull()
                     & (F.col(value_col) > 0))
            .select(F.col(by).alias("g"),
                    F.col(value_col).cast("double").alias("v")))
    mu = base.groupBy("g").agg(F.avg("v").alias("mu"))
    j = base.join(F.broadcast(mu), "g")
    agg = j.groupBy("g").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.any_value("mu").alias("mu"),
        F.sum("v").alias("tot"),
        F.sum(F.when(F.col("v") < F.col("mu"), F.col("v"))
              .otherwise(0.0)).alias("below"),
        F.sum(F.when(F.col("v") < F.col("mu"), 1).otherwise(0))
        .cast("double").alias("m"),
        F.max(F.when(F.col("v") < F.col("mu"), F.col("v")))
        .alias("xm"),
        F.min(F.when(F.col("v") >= F.col("mu"), F.col("v")))
        .alias("xm1"))
    delta = F.when(F.col("xm1") != F.col("xm"),
                   (F.col("mu") - F.col("xm"))
                   / (F.col("xm1") - F.col("xm"))).otherwise(0.0)
    delta = F.when(F.col("xm").isNull(), 0.0).otherwise(delta)
    f_mu = (F.col("m") + delta) / F.col("n")
    l_mu = (F.col("below") + delta * F.col("xm1")) / F.col("tot")
    return agg.select(
        F.col("g").alias("group"),
        F.col("n").cast("long").alias("n"),
        F.round("mu", round_to).alias("mean"),
        F.round(f_mu, round_to).alias("f_mu"),
        F.round(l_mu, round_to).alias("l_mu"),
        F.round(f_mu + l_mu, round_to).alias("s_asym")) \
        .orderBy("group")


def cox_stuart(df: DataFrame, *, ts_col: str, unit: str = "day",
               round_to: int = 6) -> DataFrame:
    """Cox–Stuart trend test (1955): pair bucket i with bucket
    i + ⌈n/2⌉ and count how often the LATER value is larger; under
    no-trend S⁺ ~ Binomial(m, ½) over the m non-tied pairs, so

        z = (S⁺ − m/2) / √(m/4)

    — the sign-test-simple trend check whose verdict survives ANY
    monotone transform of the series (Mann-Kendall compares all
    O(n²) pairs; Cox-Stuart only the half-offset ones — weaker but
    assumption-free and O(n)). Ties are dropped, exactly.

    One index join on the tiny bucket table. Returns ``(n_buckets,
    m, s_plus, z)``.
    """
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("b"))
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    idx = daily.select(
        "x", (F.row_number().over(Window.partitionBy().orderBy("b"))
              - 1).alias("i"))
    n = idx.count()
    h = (n + 1) // 2
    a = idx.alias("a")
    b = idx.alias("b")
    pairs = (a.join(b, F.col("b.i") == F.col("a.i") + h)
             .select(F.col("a.x").alias("x1"),
                     F.col("b.x").alias("x2")))
    agg = pairs.agg(
        F.sum(F.when(F.col("x2") != F.col("x1"), 1).otherwise(0))
        .cast("long").alias("m"),
        F.sum(F.when(F.col("x2") > F.col("x1"), 1).otherwise(0))
        .cast("long").alias("s_plus"))
    m = F.col("m").cast("double")
    z = F.when(m > 0, (F.col("s_plus") - m / 2.0)
               / F.sqrt(m / 4.0))
    return agg.select(
        F.lit(n).cast("long").alias("n_buckets"), "m", "s_plus",
        F.round(z, round_to).alias("z"))


def bartels_rank(df: DataFrame, *, ts_col: str, unit: str = "day",
                 round_to: int = 6) -> DataFrame:
    """Bartels' rank version of the von Neumann ratio (1982):
    with midranks rᵢ of the ordered-in-time series,

        RVN = Σ (rᵢ − rᵢ₊₁)² / Σ (rᵢ − r̄)²

    ≈ 2 under randomness; << 2 means positive serial dependence
    (trend/regime), >> 2 oscillation — the RANK randomness test
    beside the parametric Durbin-Watson (its statistic twin on raw
    values) and the sign-only turning-point test. z uses the exact
    small-sample variance 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²).

    Doubled midranks keep both sums exact integers (the scale
    cancels in the ratio); all windows ride the bucket table.
    Returns ``(n_buckets, rvn, z)``.
    """
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("b"))
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    rnk = F.rank().over(Window.partitionBy().orderBy("x"))
    ties = F.count(F.lit(1)).over(Window.partitionBy("x"))
    r2 = 2 * rnk + ties - 1
    t = daily.select("b", r2.alias("r2"))
    nxt = F.lead("r2").over(Window.partitionBy().orderBy("b"))
    wall = Window.partitionBy()
    rbar2 = F.avg("r2").over(wall)           # doubled mean rank
    scored = t.select(
        "r2", nxt.alias("r2n"), rbar2.alias("rb"))
    agg = scored.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("r2n").isNotNull(),
                     (F.col("r2") - F.col("r2n"))
                     * (F.col("r2") - F.col("r2n")))
              .otherwise(0)).alias("num4"),
        F.sum((F.col("r2") - F.col("rb"))
              * (F.col("r2") - F.col("rb"))).alias("den4"))
    n = F.col("n")
    rvn = F.col("num4") / F.col("den4")
    var = (4.0 * (n - 2) * (5 * n * n - 2 * n - 9)
           / (5.0 * n * (n + 1) * (n - 1) * (n - 1)))
    z = (rvn - 2.0) / F.sqrt(var)
    return agg.select(
        n.cast("long").alias("n_buckets"),
        F.round(rvn, round_to).alias("rvn"),
        F.round(z, round_to).alias("z"))


def james_stein(df: DataFrame, value_col: str, *, by: str,
                round_to: int = 6) -> DataFrame:
    """James–Stein shrinkage of per-group means (the Efron–Morris
    1975 practical form): with group means x̄ᵢ, common sampling
    variance V = mean(sᵢ²/nᵢ) and grand mean μ̄,

        c = max(0, 1 − (k−3)·V / Σ(x̄ᵢ − μ̄)²),
        x̃ᵢ = μ̄ + c·(x̄ᵢ − μ̄)

    — dominates the raw means in total squared error whenever
    k ≥ 4: the MEANS sibling of the empirical-Bayes rate shrinkage
    (host_pass_shrunk), and the honest leaderboard when some
    sources have 30 docs and others 30k. Groups with nᵢ < 2 are
    dropped.

    One aggregation to per-group sufficient statistics, a scalar
    combine, a broadcast join back. Returns ``(group, n, mean,
    js_mean, shrinkage_c)`` ordered by group.
    """
    g = (df.where(F.col(value_col).isNotNull()
                  & F.col(by).isNotNull())
         .groupBy(F.col(by).alias("g"))
         .agg(F.count(F.lit(1)).alias("ni"),
              F.sum(F.col(value_col).cast("double")).alias("si"),
              F.sum(F.col(value_col).cast("double")
                    * F.col(value_col).cast("double")).alias("qi"))
         .where(F.col("ni") >= 2))
    ni = F.col("ni").cast("double")
    mean = F.col("si") / ni
    s2 = (F.col("qi") - F.col("si") * F.col("si") / ni) / (ni - 1)
    per = g.select("g", ni.alias("ni"), mean.alias("mi"),
                   (s2 / ni).alias("vi"))
    wall = Window.partitionBy()
    per2 = per.select(
        "g", "ni", "mi",
        F.count(F.lit(1)).over(wall).alias("k"),
        F.avg("mi").over(wall).alias("mu"),
        F.avg("vi").over(wall).alias("v"))
    per3 = per2.select(
        "g", "ni", "mi", "k", "mu", "v",
        F.sum((F.col("mi") - F.col("mu"))
              * (F.col("mi") - F.col("mu"))).over(wall)
        .alias("ssb"))
    # ssb = 0 (all group means equal) → shrink fully; also keeps
    # ANSI mode from erroring on the double zero-division
    c = F.when(F.col("ssb") > 0,
               F.greatest(F.lit(0.0),
                          1.0 - (F.col("k") - 3).cast("double")
                          * F.col("v") / F.col("ssb"))) \
         .otherwise(0.0)
    t = per3.select(
        "g", F.col("ni").cast("long").alias("n"),
        F.round("mi", round_to).alias("mean"),
        F.round(F.col("mu") + c * (F.col("mi") - F.col("mu")),
                round_to).alias("js_mean"),
        F.round(c, round_to).alias("shrinkage_c"))
    return t.select(F.col("g").alias("group"), "n", "mean",
                    "js_mean", "shrinkage_c").orderBy("group")


def obf_boundaries(df: DataFrame, *, ts_col: str, success,
                   p0: float, unit: str = "day",
                   z_alpha: float = 1.959964,
                   round_to: int = 6) -> DataFrame:
    """O'Brien–Fleming group-sequential boundary check: the daily
    CUMULATIVE pass-rate z against the OBF-shaped boundary
    u(t) = z_α/√t (t = information fraction n_cum/N) — spend almost
    no alpha early, the full z_α at the end. The scheduled-looks
    classic between pass_rate_ztest's single fixed-n look and the
    fully-continuous e-process: the shape regulators and clinical
    monitors expect.

    Exact integer cumulative counts; the boundary is one terminal
    expression per bucket row. Returns ``(bucket_ts, n_cum, k_cum,
    t_frac, z, obf_bound, crossed)`` where ``crossed`` latches.
    """
    import math
    p = float(p0)
    s = F.when(success, 1).otherwise(0)
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("bucket_ts"))
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum(s).cast("long").alias("k")))
    wall = Window.partitionBy()
    wp = (Window.partitionBy().orderBy("bucket_ts")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ncum = F.sum("n").over(wp)
    kcum = F.sum("k").over(wp)
    ntot = F.sum("n").over(wall)
    t = daily.select(
        "bucket_ts", ncum.alias("n_cum"), kcum.alias("k_cum"),
        ntot.alias("ntot"))
    nn = F.col("n_cum").cast("double")
    tf = nn / F.col("ntot").cast("double")
    z = ((F.col("k_cum") - nn * p)
         / F.sqrt(nn * p * (1.0 - p)))
    bound = F.lit(float(z_alpha)) / F.sqrt(tf)
    scored = t.select(
        "bucket_ts", "n_cum", "k_cum",
        F.round(tf, round_to).alias("t_frac"),
        F.round(z, round_to).alias("z"),
        F.round(bound, round_to).alias("obf_bound"),
        (F.abs(F.round(z, round_to))
         >= F.round(bound, round_to)).cast("int").alias("__x"))
    crossed = F.max("__x").over(
        Window.partitionBy().orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (scored.withColumn("crossed", crossed == 1)
            .drop("__x").orderBy("bucket_ts"))


def otsu_threshold(df: DataFrame, value_col: str, *,
                   round_to: int = 6) -> DataFrame:
    """Otsu's threshold (1979) on the exact value histogram: the
    cut t maximizing the between-class variance
    w₀(1−w₀)(μ₀−μ₁)² — the optimal 2-class Jenks break, computed
    the way image binarization does it but over ANY numeric column:
    the parameter-free answer to "where should the quality gate
    go" that replaces an eyeballed round number. Ties resolve to
    the smallest threshold.

    ONE distinct-value pass: cumulative (count, sum) windows give
    every candidate's class moments simultaneously; exact integers
    until the terminal divisions. Returns ``(threshold, w0,
    mu0, mu1, between_var)``.
    """
    dv = (df.where(F.col(value_col).isNotNull())
          .groupBy(F.col(value_col).alias("v"))
          .agg(F.count(F.lit(1)).alias("c"),
               F.sum(F.col(value_col).cast("double")).alias("s")))
    wall = Window.partitionBy()
    wp = (Window.partitionBy().orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t = dv.select(
        "v",
        F.sum("c").over(wp).alias("cn"),
        F.sum("s").over(wp).alias("cs"),
        F.sum("c").over(wall).alias("n"),
        F.sum("s").over(wall).alias("ts"))
    t = t.where(F.col("cn") < F.col("n"))   # both classes non-empty
    w0 = F.col("cn") / F.col("n")
    mu0 = F.col("cs") / F.col("cn")
    mu1 = (F.col("ts") - F.col("cs")) / (F.col("n") - F.col("cn"))
    bv = w0 * (1.0 - w0) * (mu0 - mu1) * (mu0 - mu1)
    scored = t.select("v", w0.alias("w0"), mu0.alias("mu0"),
                      mu1.alias("mu1"), bv.alias("bv"))
    rn = F.row_number().over(
        Window.partitionBy().orderBy(F.col("bv").desc(), "v"))
    return (scored.withColumn("__rn", rn).where(F.col("__rn") == 1)
            .select(F.col("v").alias("threshold"),
                    F.round("w0", round_to).alias("w0"),
                    F.round("mu0", round_to).alias("mu0"),
                    F.round("mu1", round_to).alias("mu1"),
                    F.round("bv", round_to).alias("between_var")))


def spectral_entropy(df: DataFrame, *, ts_col: str,
                     unit: str = "day", max_freq: int = 10,
                     round_to: int = 6) -> DataFrame:
    """Normalized spectral entropy of the per-*unit* volume series:
    DFT power at frequencies 1..K (centered series, direct cos/sin
    sums — no FFT needed at bucket counts), normalized to a
    probability vector, and H = −Σ p·ln p / ln K ∈ [0,1]. H → 0
    reads "one periodicity owns the series" (strict weekly cycle),
    H → 1 "white noise" — the one-number regularity score that
    weekly_spectrum's single-frequency power and seasonal_strength's
    period-7 decomposition both presuppose a period for.

    The freq table (K rows) broadcasts against the bucket table —
    O(n·K) trig terms, all on the tiny bucket frame. Returns
    ``(n_buckets, n_freqs, peak_freq, peak_share, entropy)``.
    """
    import math
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("b"))
             .agg(F.count(F.lit(1)).cast("double").alias("x")))
    wall = Window.partitionBy()
    wo = Window.partitionBy().orderBy("b")
    ser = daily.select(
        (F.col("x") - F.avg("x").over(wall)).alias("x"),
        (F.row_number().over(wo) - 1).cast("double").alias("i"),
        F.count(F.lit(1)).over(wall).cast("double").alias("n"))
    spark = df.sparkSession
    freqs = spark.range(1, int(max_freq) + 1).select(
        F.col("id").cast("double").alias("f"))
    terms = (ser.crossJoin(F.broadcast(freqs))
             .select("f",
                     (F.col("x") * F.cos(2.0 * math.pi * F.col("f")
                                         * F.col("i") / F.col("n")))
                     .alias("c"),
                     (F.col("x") * F.sin(2.0 * math.pi * F.col("f")
                                         * F.col("i") / F.col("n")))
                     .alias("s")))
    power = (terms.groupBy("f")
             .agg((F.sum("c") * F.sum("c")
                   + F.sum("s") * F.sum("s")).alias("p")))
    tot = F.sum("p").over(Window.partitionBy())
    probs = power.select("f", (F.col("p") / tot).alias("pr"))
    n_buckets = daily.count()
    agg = probs.agg(
        F.count(F.lit(1)).cast("long").alias("n_freqs"),
        # deterministic tie-break: (power share, then frequency)
        F.max_by("f", F.struct(F.col("pr"), F.col("f")))
        .cast("long").alias("peak_freq"),
        F.round(F.max("pr"), round_to).alias("peak_share"),
        F.round(-F.sum(F.when(F.col("pr") > 0,
                              F.col("pr") * F.log("pr"))
                       .otherwise(0.0))
                / F.lit(math.log(float(max_freq))), round_to)
        .alias("entropy"))
    return agg.select(F.lit(n_buckets).cast("long")
                      .alias("n_buckets"), "n_freqs", "peak_freq",
                      "peak_share", "entropy")


def permutation_entropy(df: DataFrame, *, ts_col: str,
                        unit: str = "day",
                        round_to: int = 6) -> DataFrame:
    """Bandt–Pompe permutation entropy (order 3) of the per-*unit*
    volume series: each consecutive triple maps to its ordinal
    pattern (ties broken by position, the original convention), and
    H = −Σ p·ln p / ln 6 ∈ [0,1] over the 6 patterns. H → 0 means
    the DYNAMICS are deterministic (monotone ramps, strict cycles)
    whatever the marginal distribution; H → 1 is dynamically random
    — complements spectral entropy (frequency view) with a
    shape-of-motion view that is immune to any monotone transform
    of the values.

    Patterns come from two lead windows + exact comparisons on the
    bucket table. Returns ``(n_windows, n_patterns_seen,
    modal_pattern, perm_entropy)`` — pattern encoded as the rank
    string of the three positions (e.g. '012' ascending).
    """
    import math
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("b"))
             .agg(F.count(F.lit(1)).cast("long").alias("x")))
    wo = Window.partitionBy().orderBy("b")
    t = daily.select(
        F.col("x").alias("a"),
        F.lead("x", 1).over(wo).alias("m"),
        F.lead("x", 2).over(wo).alias("c")) \
        .where(F.col("m").isNotNull() & F.col("c").isNotNull())
    lt = lambda u, v, tie: F.when(F.col(u) < F.col(v), 1) \
        .when((F.col(u) == F.col(v)) & F.lit(tie), 1).otherwise(0)
    # rank of each position among the triple; ties -> earlier
    # position ranks lower (Bandt-Pompe order-of-appearance rule)
    r0 = lt("m", "a", False) + lt("c", "a", False)
    r1 = lt("a", "m", True) + lt("c", "m", False)
    r2 = lt("a", "c", True) + lt("m", "c", True)
    pat = F.concat(r0.cast("string"), r1.cast("string"),
                   r2.cast("string"))
    counts = t.select(pat.alias("p")).groupBy("p") \
        .agg(F.count(F.lit(1)).alias("c"))
    tot = F.sum("c").over(Window.partitionBy())
    probs = counts.select("p", "c", (F.col("c") / tot).alias("pr"))
    agg = probs.agg(
        F.sum("c").cast("long").alias("n_windows"),
        F.count(F.lit(1)).cast("long").alias("n_patterns_seen"),
        F.max_by("p", F.struct(F.col("c"), F.col("p")))
        .alias("modal_pattern"),
        F.round(-F.sum(F.col("pr") * F.log("pr"))
                / F.lit(math.log(6.0)), round_to)
        .alias("perm_entropy"))
    return agg


def weibull_fit(df: DataFrame, *, entity_col: str, ts_col: str,
                round_to: int = 6) -> DataFrame:
    """Weibull plot fit of pooled inter-event gaps: with the
    midpoint empirical CDF F over distinct gap values,

        ln(−ln(1−F))  =  k·ln(g) − k·ln(λ)

    so the OLS slope IS the shape k and exp(−intercept/k) the scale
    λ. k < 1 reads "bursty/clustered arrivals" (decreasing hazard —
    the longer the silence, the longer it will last), k = 1
    memoryless, k > 1 aging — the PARAMETRIC companion to the
    burstiness index: B says whether, k says how, and λ prices the
    timeout to set. Gaps are exact integer seconds; the regression
    rides the distinct-gap table. Returns ``(n_gaps, shape, scale,
    r2)``.
    """
    base = (df.where(F.col(entity_col).isNotNull()
                     & F.col(ts_col).isNotNull())
            .select(F.col(entity_col).alias("e"),
                    F.unix_timestamp(F.col(ts_col)).alias("t")))
    w = Window.partitionBy("e").orderBy("t")
    gaps = base.select(
        (F.col("t") - F.lag("t").over(w)).alias("g")) \
        .where(F.col("g").isNotNull() & (F.col("g") > 0))
    dv = gaps.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    wall = Window.partitionBy()
    wp = (Window.partitionBy().orderBy("g")
          .rowsBetween(Window.unboundedPreceding, -1))
    n = F.sum("c").over(wall)
    fmid = ((F.coalesce(F.sum("c").over(wp), F.lit(0))
             + F.col("c") / 2.0) / n)
    pts = dv.select(
        F.log(F.col("g").cast("double")).alias("x"),
        F.log(-F.log(1.0 - fmid)).alias("y"),
        n.alias("n"))
    agg = pts.agg(
        F.any_value("n").cast("long").alias("n_gaps"),
        F.covar_pop("x", "y").alias("cxy"),
        F.var_pop("x").alias("vx"), F.var_pop("y").alias("vy"),
        F.avg("x").alias("mx"), F.avg("y").alias("my"))
    k = F.col("cxy") / F.col("vx")
    intercept = F.col("my") - k * F.col("mx")
    return agg.select(
        "n_gaps",
        F.round(k, round_to).alias("shape"),
        F.round(F.exp(-intercept / k), round_to).alias("scale"),
        F.round(F.col("cxy") * F.col("cxy")
                / (F.col("vx") * F.col("vy")), round_to)
         .alias("r2"))


def discord_week(df: DataFrame, *, ts_col: str, unit: str = "day",
                 w: int = 7, round_to: int = 6) -> DataFrame:
    """Matrix-profile-style discord/motif scan of the per-*unit*
    volume series with window length *w*: every window's Pearson
    correlation to every other window at least *w* apart (the
    standard trivial-match exclusion zone), then

        discord = the window whose BEST match is worst
        motif   = the pair that matches best

    — "which week behaved like no other" (incident forensics) and
    "which two weeks rhyme" (seasonality evidence), the shape-based
    anomaly view that point outlier tests (z-score/Hampel/ECOD)
    can't see. Ties break to smaller indices.

    The window×position table is buckets·w rows; the pair join is
    windows², both tiny. Returns one row ``(n_windows,
    discord_start, discord_best_corr, motif_i, motif_j,
    motif_corr)`` — starts are 0-based bucket indices.
    """
    daily = (df.groupBy(F.date_trunc(unit, F.col(ts_col))
                        .alias("b"))
             .agg(F.count(F.lit(1)).cast("double").alias("x")))
    wo = Window.partitionBy().orderBy("b")
    ser = daily.select(
        "x", (F.row_number().over(wo) - 1).alias("i"))
    spark = df.sparkSession
    offs = spark.range(int(w)).select(F.col("id").alias("p"))
    wins = (ser.crossJoin(F.broadcast(offs))
            .select((F.col("i") - F.col("p")).alias("win"),
                    "p", "x")
            .where(F.col("win") >= 0))
    full = (wins.groupBy("win")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") == int(w)).select("win"))
    wins = wins.join(F.broadcast(full), "win")
    a, b = wins.alias("a"), wins.alias("b")
    pairs = (a.join(b, (F.col("a.p") == F.col("b.p"))
                    & (F.col("b.win") >= F.col("a.win") + int(w)))
             .groupBy(F.col("a.win").alias("wi"),
                      F.col("b.win").alias("wj"))
             .agg(F.count(F.lit(1)).cast("double").alias("n"),
                  F.sum(F.col("a.x")).alias("sx"),
                  F.sum(F.col("b.x")).alias("sy"),
                  F.sum(F.col("a.x") * F.col("b.x")).alias("sxy"),
                  F.sum(F.col("a.x") * F.col("a.x")).alias("sxx"),
                  F.sum(F.col("b.x") * F.col("b.x")).alias("syy")))
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    corr = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    sym = pairs.select("wi", "wj", corr.alias("r")) \
        .where(F.col("r").isNotNull())
    both = sym.unionByName(
        sym.select(F.col("wj").alias("wi"), F.col("wi").alias("wj"),
                   "r"))
    best = both.groupBy("wi").agg(F.max("r").alias("best"))
    rn_d = F.row_number().over(
        Window.partitionBy().orderBy(F.col("best"), F.col("wi")))
    discord = best.withColumn("__r", rn_d).where(F.col("__r") == 1)
    rn_m = F.row_number().over(
        Window.partitionBy().orderBy(F.col("r").desc(), "wi", "wj"))
    motif = sym.withColumn("__r", rn_m).where(F.col("__r") == 1)
    n_win = full.count()
    return (discord.select(
        F.lit(n_win).cast("long").alias("n_windows"),
        F.col("wi").cast("long").alias("discord_start"),
        F.round("best", round_to).alias("discord_best_corr"))
        .crossJoin(F.broadcast(motif.select(
            F.col("wi").cast("long").alias("motif_i"),
            F.col("wj").cast("long").alias("motif_j"),
            F.round("r", round_to).alias("motif_corr")))))


def gorilla_ts_bits(df: DataFrame, *, entity_col: str,
                    ts_col: str, round_to: int = 6) -> DataFrame:
    """Gorilla timestamp-compression estimate (Pelkonen 2015, the
    Facebook TSDB paper): per entity stream, second deltas-of-deltas
    D = (tᵢ−tᵢ₋₁) − (tᵢ₋₁−tᵢ₋₂) are billed with the paper's
    variable-length classes —

        D = 0 → 1 bit;  [−63,64] → 9;  [−255,256] → 12;
        [−2047,2048] → 16;  else → 36

    — the time-column sibling of the Elias-gamma postings estimate:
    how many bits/event a Gorilla-style encoder would spend on THIS
    corpus's arrival pattern (regular crawls compress ~60×, bursty
    event streams don't). First two events per entity are billed at
    64 and 9+... their actual cost is amortized out; they are
    EXCLUDED here (documented), so the number is the steady-state
    rate. All integers exact. Returns ``(n_events, bits_total,
    bits_per_event, ratio_vs_64bit, share_zero_dod)``.
    """
    base = (df.where(F.col(entity_col).isNotNull()
                     & F.col(ts_col).isNotNull())
            .select(F.col(entity_col).alias("e"),
                    F.unix_timestamp(F.col(ts_col)).alias("t")))
    w = Window.partitionBy("e").orderBy("t")
    # dod = (t_i - t_{i-1}) - (t_{i-1} - t_{i-2}), two lags over the
    # per-entity time order
    dd = base.select(
        "e",
        (F.col("t") - 2 * F.lag("t", 1).over(w)
         + F.lag("t", 2).over(w)).alias("dod")) \
        .where(F.col("dod").isNotNull())
    bits = (F.when(F.col("dod") == 0, 1)
            .when((F.col("dod") >= -63) & (F.col("dod") <= 64), 9)
            .when((F.col("dod") >= -255) & (F.col("dod") <= 256), 12)
            .when((F.col("dod") >= -2047) & (F.col("dod") <= 2048),
                  16)
            .otherwise(36))
    t = dd.select(bits.alias("b"),
                  (F.col("dod") == 0).cast("int").alias("z"))
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("b").cast("long").alias("bits_total"),
        F.round(F.avg(F.col("b").cast("double")), round_to)
         .alias("bits_per_event"),
        F.round(64.0 / F.avg(F.col("b").cast("double")), round_to)
         .alias("ratio_vs_64bit"),
        F.round(F.avg(F.col("z").cast("double")), round_to)
         .alias("share_zero_dod"))


def session_depth(df: DataFrame, *, entity_col: str, ts_col: str,
                  type_col: str, horizon: int = 4,
                  round_to: int = 6) -> DataFrame:
    """Expected remaining events by current event type, via
    *horizon* rounds of value iteration on the empirical transition
    matrix (absorbing END state where a user's stream stops):

        v₀ = 0,   v_{k+1}(s) = Σ_t P(s→t)·(1 + v_k(t)),  P(s→END)
        contributes 0

    — "a user who just searched has how many events left", the
    number session-length histograms can't give per STATE. The
    horizon TRUNCATES (documented): v_h is the expected events
    within the next h steps, a lower bound on the true absorption
    depth; like the fixed-round PageRank, truncation is what makes
    the DuckDB twin an unrolled CTE chain.

    One transition aggregation (lead over the per-entity order);
    each round rides the k×(k+1) matrix. Returns ``(state, n_out,
    p_end, v)`` ordered by state.
    """
    base = (df.where(F.col(entity_col).isNotNull()
                     & F.col(ts_col).isNotNull()
                     & F.col(type_col).isNotNull())
            .select(F.col(entity_col).alias("e"),
                    F.col(ts_col).alias("t"),
                    F.col(type_col).alias("s")))
    w = Window.partitionBy("e").orderBy("t", "s")
    trans = base.select(
        "s", F.lead("s").over(w).alias("nxt"))
    counts = (trans.groupBy("s", "nxt")
              .agg(F.count(F.lit(1)).alias("c")))
    outs = counts.groupBy("s").agg(F.sum("c").alias("tot"))
    p = (counts.join(outs, "s")
         .select("s", "nxt", (F.col("c") / F.col("tot"))
                 .alias("p"))
         .persist())
    states = outs.select("s").persist()
    v = states.select("s", F.lit(0.0).alias("v"))
    for _ in range(int(horizon)):
        nv = (p.where(F.col("nxt").isNotNull())
              .join(v.select(F.col("s").alias("nxt"),
                             F.col("v").alias("vn")), "nxt")
              .groupBy("s")
              .agg(F.sum(F.col("p") * (1.0 + F.col("vn")))
                   .alias("v")))
        v = (states.join(nv, "s", "left")
             .select("s", F.coalesce("v", F.lit(0.0)).alias("v")))
        v = v.localCheckpoint(eager=True)
    pend = (p.groupBy("s")
            .agg(F.coalesce(
                F.sum(F.when(F.col("nxt").isNull(), F.col("p"))),
                F.lit(0.0)).alias("p_end")))
    out = (outs.join(pend, "s").join(v, "s")
           .select(F.col("s").alias("state"),
                   F.col("tot").cast("long").alias("n_out"),
                   F.round("p_end", round_to).alias("p_end"),
                   F.round("v", round_to).alias("v"))
           .orderBy("state"))
    p.unpersist()
    states.unpersist()
    return out


def schema_match(sources, *, round_to: int = 6) -> DataFrame:
    """Instance-based schema matching (the COMA/Valentine family
    primitive): *sources* is a list of ``(label, df, column)``; for
    every UNORDERED pair, the Jaccard similarity of their distinct
    value sets (as strings — the profiling normalization). Where
    :func:`ind_discovery` asks the boolean "is A contained in B",
    this RANKS candidate column correspondences for schema
    integration — c_nationkey ↔ s_nationkey surfaces by VALUES, no
    name heuristics.

    One distinct over the unioned (label, value) pairs; pair
    intersections come from per-value label-set co-occurrence —
    the value table is scanned once however many columns are
    compared. Returns ``(col_a, col_b, n_a, n_b, n_common,
    jaccard)`` ordered by jaccard desc, then names.
    """
    labels = [lab for lab, _, _ in sources]
    if len(set(labels)) != len(labels):
        raise ValueError("duplicate labels in sources")
    parts = []
    for lab, df, col in sources:
        parts.append(df.where(F.col(col).isNotNull())
                     .select(F.lit(lab).alias("lab"),
                             F.col(col).cast("string").alias("v")))
    uni = parts[0]
    for p in parts[1:]:
        uni = uni.unionByName(p)
    d = uni.distinct().persist()
    sizes = d.groupBy("lab").agg(F.count(F.lit(1)).alias("n"))
    a, b = d.alias("a"), d.alias("b")
    inter = (a.join(b, (F.col("a.v") == F.col("b.v"))
                    & (F.col("a.lab") < F.col("b.lab")))
             .groupBy(F.col("a.lab").alias("la"),
                      F.col("b.lab").alias("lb"))
             .agg(F.count(F.lit(1)).alias("nc")))
    # every unordered pair, including zero-overlap ones
    from itertools import combinations
    spark = sources[0][1].sparkSession
    pairs = spark.createDataFrame(
        [(x, y) for x, y in combinations(sorted(labels), 2)],
        "la string, lb string")
    t = (pairs.join(inter, ["la", "lb"], "left")
         .join(sizes.select(F.col("lab").alias("la"),
                            F.col("n").alias("n_a")), "la")
         .join(sizes.select(F.col("lab").alias("lb"),
                            F.col("n").alias("n_b")), "lb")
         .select("la", "lb", "n_a", "n_b",
                 F.coalesce("nc", F.lit(0)).alias("nc")))
    jac = (F.col("nc")
           / (F.col("n_a") + F.col("n_b") - F.col("nc")))
    out = t.select(
        F.col("la").alias("col_a"), F.col("lb").alias("col_b"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("nc").cast("long").alias("n_common"),
        F.round(jac, round_to).alias("jaccard")) \
        .orderBy(F.col("jaccard").desc(), "col_a", "col_b")
    d.unpersist()
    return out


def markov_drift(df: DataFrame, *, entity_col: str, ts_col: str,
                 type_col: str, split,
                 round_to: int = 6) -> DataFrame:
    """Drift of the DYNAMICS: per current state, the Jensen-Shannon
    divergence between the next-state distributions of the two
    *split* phases (transitions stay within their phase; an
    entity's phase-crossing step is dropped). The scalar drift
    family watches marginals; transition_audit shows one matrix —
    this TESTS whether the behavioral graph itself moved, state by
    state ("after a search, users now click less"). JSD is bounded
    [0, ln 2] and defined on zero-probability cells.

    One transition aggregation per phase (lead windows), the JSD
    fold on the tiny state×state table. Returns per state
    ``(state, n_1, n_2, jsd)`` ordered by state.
    """
    base = (df.where(F.col(entity_col).isNotNull()
                     & F.col(ts_col).isNotNull()
                     & F.col(type_col).isNotNull())
            .select(F.col(entity_col).alias("e"),
                    F.col(ts_col).alias("t"),
                    F.col(type_col).alias("s"),
                    F.when(split, 0).otherwise(1).alias("h")))
    w = Window.partitionBy("e", "h").orderBy("t", "s")
    trans = base.select(
        "h", "s", F.lead("s").over(w).alias("nxt")) \
        .where(F.col("nxt").isNotNull())
    counts = (trans.groupBy("h", "s", "nxt")
              .agg(F.count(F.lit(1)).alias("c")))
    tot = Window.partitionBy("h", "s")
    p = counts.select(
        "h", "s", "nxt",
        (F.col("c") / F.sum("c").over(tot)).alias("p"))
    p1 = p.where(F.col("h") == 0).select(
        "s", "nxt", F.col("p").alias("p1"))
    p2 = p.where(F.col("h") == 1).select(
        "s", "nxt", F.col("p").alias("p2"))
    j = (p1.join(p2, ["s", "nxt"], "full_outer")
         .select("s", "nxt",
                 F.coalesce("p1", F.lit(0.0)).alias("p1"),
                 F.coalesce("p2", F.lit(0.0)).alias("p2")))
    mmid = (F.col("p1") + F.col("p2")) / 2.0
    term = (F.when(F.col("p1") > 0,
                   F.col("p1") / 2.0 * F.log(F.col("p1") / mmid))
            .otherwise(0.0)
            + F.when(F.col("p2") > 0,
                     F.col("p2") / 2.0 * F.log(F.col("p2") / mmid))
            .otherwise(0.0))
    per_s = j.groupBy("s").agg(F.sum(term).alias("jsd"))
    n1 = (trans.where(F.col("h") == 0).groupBy("s")
          .agg(F.count(F.lit(1)).alias("n_1")))
    n2 = (trans.where(F.col("h") == 1).groupBy("s")
          .agg(F.count(F.lit(1)).alias("n_2")))
    return (per_s.join(n1, "s", "left").join(n2, "s", "left")
            .select(F.col("s").alias("state"),
                    F.coalesce("n_1", F.lit(0)).cast("long")
                    .alias("n_1"),
                    F.coalesce("n_2", F.lit(0)).cast("long")
                    .alias("n_2"),
                    F.round("jsd", round_to).alias("jsd"))
            .orderBy("state"))


def huber_location(df: DataFrame, value_col: str, *, by: str,
                   c: float = 1.345,
                   round_to: int = 6) -> DataFrame:
    """One-step Huber M-estimator of location per group: from the
    exact type-1 median and MAD, one Newton step with the Huber ψ
    (clamp at ±c, the 95%-efficiency constant 1.345):

        μ̂ = med + MAD · Σψ_c((x−med)/MAD) / #{|u| ≤ c}

    — 95% of the mean's efficiency under normality while shrugging
    off the heavy tail that drags the mean (the median keeps only
    64% efficiency; winsorizing needs a quantile choice). The
    M-estimation member beside median/MAD/Qn/winsor in the robust
    kit. Groups where MAD = 0 report the median.

    Two distinct-value passes (median, then MAD), then one
    aggregation — no row sort. Returns ``(group, n, mean, median,
    mad, huber)``.
    """
    base = (df.where(F.col(value_col).isNotNull()
                     & F.col(by).isNotNull())
            .select(F.col(by).alias("g"),
                    F.col(value_col).cast("double").alias("v")))
    def _median(frame, col, out):
        dv = frame.groupBy("g", col).agg(
            F.count(F.lit(1)).alias("c"))
        wp = (Window.partitionBy("g").orderBy(col)
              .rowsBetween(Window.unboundedPreceding,
                           Window.currentRow))
        wall = Window.partitionBy("g")
        cdf = dv.select("g", F.col(col),
                        (F.sum("c").over(wp)
                         / F.sum("c").over(wall)).alias("cdf"))
        return (cdf.where(F.col("cdf") >= 0.5)
                .groupBy("g").agg(F.min(col).alias(out)))
    med = _median(base, "v", "med")
    j = base.join(F.broadcast(med), "g") \
            .withColumn("ad", F.abs(F.col("v") - F.col("med")))
    mad = _median(j, "ad", "mad")
    j2 = j.join(F.broadcast(mad), "g")
    u = (F.col("v") - F.col("med")) / F.col("mad")
    psi = F.greatest(F.lit(-float(c)), F.least(F.lit(float(c)), u))
    inlier = (F.abs(u) <= float(c)).cast("long")
    agg = (j2.groupBy("g")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.avg("v").alias("mean"),
                F.any_value("med").alias("med"),
                F.any_value("mad").alias("mad"),
                F.sum(F.when(F.col("mad") > 0, psi)).alias("sp"),
                F.sum(F.when(F.col("mad") > 0, inlier)
                      .otherwise(0)).alias("nw")))
    huber = F.when((F.col("mad") > 0) & (F.col("nw") > 0),
                   F.col("med") + F.col("mad") * F.col("sp")
                   / F.col("nw")).otherwise(F.col("med"))
    return agg.select(
        F.col("g").alias("group"), "n",
        F.round("mean", round_to).alias("mean"),
        F.round("med", round_to).alias("median"),
        F.round("mad", round_to).alias("mad"),
        F.round(huber, round_to).alias("huber")).orderBy("group")


def lmoments(df: DataFrame, value_col: str, *, by: str,
             round_to: int = 6) -> DataFrame:
    """First four L-moments per group (Hosking 1990): from the
    probability-weighted moments b_r = Σ C(i−1, r)/C(n−1, r)·x₍ᵢ₎/n,

        λ₁ = b₀,  λ₂ = 2b₁ − b₀,  λ₃ = 6b₂ − 6b₁ + b₀,
        λ₄ = 20b₃ − 30b₂ + 12b₁ − b₀,
        τ₃ = λ₃/λ₂ (L-skew),  τ₄ = λ₄/λ₂ (L-kurtosis)

    — the order-statistic moment system: EVERY L-moment exists
    whenever the mean does, so L-skew/L-kurt stay meaningful on the
    heavy-tailed web distributions where classical skew/kurtosis
    (jarque_bera's inputs) explode. τ₄ ≈ 0.1226 reads normal.

    Rank weights ride a per-group row_number (tie order is
    irrelevant: tied values share x, and the weight SUM over a tie
    block is order-invariant). One sort-shuffle per group key.
    Returns ``(group, n, l1, l2, t3, t4)``.
    """
    base = (df.where(F.col(value_col).isNotNull()
                     & F.col(by).isNotNull())
            .select(F.col(by).alias("g"),
                    F.col(value_col).cast("double").alias("v")))
    i = F.row_number().over(
        Window.partitionBy("g").orderBy("v")).cast("double")
    n = F.count(F.lit(1)).over(Window.partitionBy("g")) \
         .cast("double")
    w1 = (i - 1) / (n - 1)
    w2 = w1 * (i - 2) / (n - 2)
    w3 = w2 * (i - 3) / (n - 3)
    t = base.select(
        "g", "v", i.alias("i"), n.alias("n"),
        (F.col("v") * w1).alias("x1"),
        (F.col("v") * w2).alias("x2"),
        (F.col("v") * w3).alias("x3"))
    agg = (t.groupBy("g")
           .agg(F.any_value("n").alias("n"),
                F.avg("v").alias("b0"),
                (F.sum("x1") / F.any_value("n")).alias("b1"),
                (F.sum("x2") / F.any_value("n")).alias("b2"),
                (F.sum("x3") / F.any_value("n")).alias("b3")))
    l1 = F.col("b0")
    l2 = 2 * F.col("b1") - F.col("b0")
    l3 = 6 * F.col("b2") - 6 * F.col("b1") + F.col("b0")
    l4 = (20 * F.col("b3") - 30 * F.col("b2")
          + 12 * F.col("b1") - F.col("b0"))
    return agg.select(
        F.col("g").alias("group"),
        F.col("n").cast("long").alias("n"),
        F.round(l1, round_to).alias("l1"),
        F.round(l2, round_to).alias("l2"),
        F.round(F.when(l2 != 0, l3 / l2), round_to).alias("t3"),
        F.round(F.when(l2 != 0, l4 / l2), round_to).alias("t4")) \
        .orderBy("group")


def calibration_slope(df: DataFrame, *, prob_col: str,
                      label_col: str, bins: int = 10,
                      round_to: int = 6) -> DataFrame:
    """Weak-calibration line: count-weighted OLS of observed rate on
    mean predicted probability across *bins* equal-width bins —

        slope < 1: overconfident (predictions too spread),
        slope > 1: underconfident,  intercept ≠ 0: base-rate shift

    — the RECALIBRATION RECIPE the Brier decomposition's REL scalar
    doesn't give: o ≈ a + b·p says exactly how to squeeze the
    scores. Same engine-exact binning as
    :func:`brier_decomposition`; one aggregation to ≤ bins rows,
    closed-form weighted OLS after. Returns ``(n, n_bins, slope,
    intercept, r2)``.
    """
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("int").cast("double")
    b = F.least(F.floor(p * bins), F.lit(bins - 1))
    per = (df.where(p.isNotNull() & y.isNotNull())
           .groupBy(b.alias("bin"))
           .agg(F.count(F.lit(1)).cast("double").alias("w"),
                F.avg(p).alias("pk"), F.avg(y).alias("ok")))
    wall = Window.partitionBy()
    sw = F.sum("w").over(wall)
    mx = F.sum(F.col("w") * F.col("pk")).over(wall) / sw
    my = F.sum(F.col("w") * F.col("ok")).over(wall) / sw
    t = per.select(
        "w", "pk", "ok", sw.alias("sw"), mx.alias("mx"),
        my.alias("my"))
    agg = t.agg(
        F.any_value("sw").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(F.col("w") * (F.col("pk") - F.col("mx"))
              * (F.col("ok") - F.col("my"))).alias("sxy"),
        F.sum(F.col("w") * (F.col("pk") - F.col("mx"))
              * (F.col("pk") - F.col("mx"))).alias("sxx"),
        F.sum(F.col("w") * (F.col("ok") - F.col("my"))
              * (F.col("ok") - F.col("my"))).alias("syy"),
        F.any_value("mx").alias("mx"), F.any_value("my").alias("my"))
    slope = F.col("sxy") / F.col("sxx")
    return agg.select(
        F.col("n").cast("long").alias("n"), "n_bins",
        F.round(slope, round_to).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), round_to)
         .alias("intercept"),
        F.round(F.when(F.col("syy") > 0,
                       F.col("sxy") * F.col("sxy")
                       / (F.col("sxx") * F.col("syy")))
                .otherwise(1.0), round_to).alias("r2"))


def cramers_v_corrected(df: DataFrame, *, x_col: str, y_col: str,
                        round_to: int = 6) -> DataFrame:
    """Bias-corrected Cramér's V (Bergsma 2013) between two
    categoricals: from the chi-square φ² = χ²/n,

        φ²' = max(0, φ² − (r−1)(c−1)/(n−1)),
        r' = r − (r−1)²/(n−1),  c' = c − (c−1)²/(n−1),
        V' = √(φ²' / min(r'−1, c'−1))

    — the small-sample-honest effect size for the lang×source
    association the raw chi-square screen (lang_source_chi2)
    detects: raw V is inflated exactly when tables are sparse, the
    regime a drilled-down drift check lives in. One cells
    aggregation; expected counts from marginal windows. Returns
    ``(n, r, c, chi2, v_raw, v_corrected)``.
    """
    base = df.where(F.col(x_col).isNotNull()
                    & F.col(y_col).isNotNull())
    cells = (base.groupBy(F.col(x_col).alias("x"),
                          F.col(y_col).alias("y"))
             .agg(F.count(F.lit(1)).alias("o")))
    wall = Window.partitionBy()
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    n = F.sum("o").over(wall)
    e = (F.sum("o").over(wx).cast("double")
         * F.sum("o").over(wy) / n)
    t = cells.select(
        "x", "y", "o", n.alias("n"), e.alias("e"))
    # chi2 over PRESENT cells only understates when zeros exist:
    # add the missing-cell term sum(e) over absent cells =
    # n - sum(e_present)
    agg = t.agg(
        F.any_value("n").cast("double").alias("n"),
        F.count_distinct("x").cast("double").alias("r"),
        F.count_distinct("y").cast("double").alias("c"),
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))
              / F.col("e")).alias("chi2_present"),
        F.sum("e").alias("e_present"))
    chi2 = F.col("chi2_present") + (F.col("n") - F.col("e_present"))
    phi2 = chi2 / F.col("n")
    rr = F.col("r")
    cc = F.col("c")
    nn = F.col("n")
    phi2c = F.greatest(F.lit(0.0),
                       phi2 - (rr - 1) * (cc - 1) / (nn - 1))
    rprime = rr - (rr - 1) * (rr - 1) / (nn - 1)
    cprime = cc - (cc - 1) * (cc - 1) / (nn - 1)
    vraw = F.sqrt(phi2 / F.least(rr - 1, cc - 1))
    vcorr = F.sqrt(phi2c / F.least(rprime - 1, cprime - 1))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("r"),
        F.col("c").cast("long").alias("c"),
        F.round(chi2, round_to).alias("chi2"),
        F.round(vraw, round_to).alias("v_raw"),
        F.round(vcorr, round_to).alias("v_corrected"))


def anonymity_curve(df: DataFrame, *, quasi_cols, value_col: str,
                    widths=(1, 2, 4, 8, 16, 32, 64, 128),
                    k: int = 5, round_to: int = 6) -> DataFrame:
    """k-anonymity generalization curve: for each bucket *width*
    applied to *value_col* (the numeric quasi-identifier), the
    equivalence classes over (*quasi_cols*, bucketed value) and

        min_class, share of rows in classes smaller than k

    — the privacy-utility TRADE-OFF the single-width k_anonymity
    check can't show: how much coarsening buys how much anonymity,
    the table you pick a generalization level from. Integer
    division bucketing, engine-exact.

    One aggregation per width over the class keys (widths are few;
    each is a uniform-key shuffle). Returns per width ``(width,
    n_classes, min_class, n_at_risk, risk_share)``.
    """
    rows = None
    for w in widths:
        bucket = F.expr(f"{value_col} div {int(w)}")
        classes = (df.where(F.col(value_col).isNotNull())
                   .groupBy(*[F.col(c) for c in quasi_cols],
                            bucket.alias("__b"))
                   .agg(F.count(F.lit(1)).alias("c")))
        agg = classes.agg(
            F.lit(int(w)).cast("long").alias("width"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("c").cast("long").alias("min_class"),
            F.sum(F.when(F.col("c") < int(k), F.col("c"))
                  .otherwise(0)).cast("long").alias("n_at_risk"),
            F.round(F.sum(F.when(F.col("c") < int(k), F.col("c"))
                          .otherwise(0))
                    / F.sum("c").cast("double"), round_to)
            .alias("risk_share"))
        rows = agg if rows is None else rows.unionByName(agg)
    return rows.orderBy("width")


def ece(df: DataFrame, *, prob_col: str, label_col: str,
        bins: int = 10, round_to: int = 6) -> DataFrame:
    """Expected and Maximum Calibration Error over equal-width
    probability bins:

        ECE = Σ (n_k/N)·|ō_k − p̄_k|,   MCE = max_k |ō_k − p̄_k|

    — THE quoted calibration scalars (Guo 2017), completing the
    calibration kit: the reliability table shows, Spiegelhalter
    tests, Brier decomposes, the slope prescribes — ECE/MCE are the
    headline numbers papers compare. Same engine-exact binning as
    brier_decomposition. Returns ``(n, n_bins, ece, mce)``.
    """
    p = F.col(prob_col).cast("double")
    y = F.col(label_col).cast("int").cast("double")
    b = F.least(F.floor(p * bins), F.lit(bins - 1))
    per = (df.where(p.isNotNull() & y.isNotNull())
           .groupBy(b.alias("bin"))
           .agg(F.count(F.lit(1)).cast("double").alias("nk"),
                F.avg(p).alias("pk"), F.avg(y).alias("ok")))
    gap = F.abs(F.col("ok") - F.col("pk"))
    return per.agg(
        F.sum("nk").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.round(F.sum(F.col("nk") * gap) / F.sum("nk"), round_to)
         .alias("ece"),
        F.round(F.max(gap), round_to).alias("mce"))


# blank-like strings that disguise missing values (case-insensitive;
# the classic census list from data-quality practice)
DISGUISED_NULL_TOKENS = (
    "", " ", "-", "--", "n/a", "na", "null", "none", "nil",
    "unknown", "undefined", "missing", "?", ".",
)


def disguised_nulls(df: DataFrame, *, cols,
                    round_to: int = 6) -> DataFrame:
    """Disguised-missing-value census: per string column, how many
    values are REAL nulls vs blank-like stand-ins ('', 'N/A',
    'null', 'unknown', '-', …; matched after trim+lower) — the
    classic data-quality trap null_patterns (true-NULL
    co-occurrence) cannot see: a feed that writes 'N/A' passes
    every NOT NULL check while poisoning group-bys and joins.

    One aggregation computing all columns' counts in a single pass.
    Returns per column ``(col_name, n, n_null, n_disguised,
    disguised_share)`` ordered by col_name.
    """
    toks = [t for t in DISGUISED_NULL_TOKENS]
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        low = F.lower(F.trim(F.col(c)))
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"__null_{c}"))
        aggs.append(F.sum(low.isin(*toks).cast("long"))
                    .alias(f"__dis_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __dis_{c}" for c in cols)
    out = wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) "
        "as (col_name, n_null, n_disguised)")
    return (out.select(
        "col_name", F.col("__n").alias("n"),
        F.coalesce("n_null", F.lit(0)).alias("n_null"),
        F.coalesce("n_disguised", F.lit(0)).alias("n_disguised"),
        F.round(F.coalesce("n_disguised", F.lit(0))
                / F.col("__n").cast("double"), round_to)
        .alias("disguised_share"))
        .orderBy("col_name"))


def waterfill(df: DataFrame, *, key_col: str, cap_col: str,
              budget: float, round_to: int = 6) -> DataFrame:
    """Water-filling (max-min fair) budget allocation: give every
    key an equal share, but never more than its cap — small keys
    are filled COMPLETELY and their leftovers raise everyone
    else's water level:

        alloc_i = min(cap_i, level),
        level = (B − Σ_{caps<level} cap) / #{caps ≥ level}

    — the fair token-budget splitter across sources
    (temperature_weights reweights proportionally, THIS guarantees
    min-share fairness; the classic link-bandwidth algorithm). If
    the budget exceeds total capacity every key gets its cap.

    Closed form, no iteration: sort caps ascending, and the level
    is determined by the FIRST prefix position where the remaining
    equal-split fits under the next cap — one cumulative window
    over the keys table. Returns ``(key, cap, alloc, filled)``
    ordered by key.
    """
    b = float(budget)
    base = (df.where(F.col(key_col).isNotNull()
                     & F.col(cap_col).isNotNull())
            .select(F.col(key_col).alias("k"),
                    F.col(cap_col).cast("double").alias("cap")))
    wo = Window.partitionBy().orderBy("cap", "k")
    wall = Window.partitionBy()
    t = base.select(
        "k", "cap",
        F.row_number().over(wo).alias("r"),
        F.sum("cap").over(wo.rowsBetween(
            Window.unboundedPreceding, -1)).alias("cum_before"),
        F.count(F.lit(1)).over(wall).alias("n"))
    cumb = F.coalesce(F.col("cum_before"), F.lit(0.0))
    remaining = F.lit(b) - cumb
    share = remaining / (F.col("n") - F.col("r") + 1)
    # the level applies at the FIRST r where the equal split fits
    # under this cap (later rows qualify trivially with negative
    # shares once the budget is exhausted — struct-min on (r, share)
    # picks the earliest, not the smallest share)
    lvl_struct = F.min(F.when(share <= F.col("cap"),
                              F.struct(F.col("r").alias("r"),
                                       share.alias("s")))) \
                  .over(wall)
    level = lvl_struct.getField("s")
    alloc = F.when(level.isNull(), F.col("cap")) \
             .otherwise(F.least(F.col("cap"),
                                F.greatest(level, F.lit(0.0))))
    out = t.select(
        F.col("k").alias("key"),
        F.round("cap", round_to).alias("cap"),
        F.round(alloc, round_to).alias("alloc"),
        (alloc >= F.col("cap") - 1e-9).alias("filled"))
    return out.orderBy("key")


def clustering_factor(df: DataFrame, *, order_col: str, cols,
                      round_to: int = 6) -> DataFrame:
    """Zone-map clustering factor per column: scanning the table in
    *order_col* order, how many RUNS does each column break into,
    and the factor runs/distinct — 1.0 means every value sits in
    one contiguous stretch (zone maps / min-max pruning skip
    perfectly), n_rows/distinct means fully scattered (pruning
    skips nothing). The measured input behind the z-order and
    partition advisors: THIS is what those layouts are trying to
    drive toward 1.

    One pass with a lag window per column (computed together in a
    single projection). Returns per column ``(col_name, n_rows,
    n_distinct, n_runs, factor)`` ordered by col_name.
    """
    w = Window.partitionBy().orderBy(order_col)
    lagged = df.select(
        order_col,
        *[F.col(c) for c in cols],
        *[(F.col(c).eqNullSafe(F.lag(c).over(w)) == False)
          .cast("long").alias(f"__brk_{c}") for c in cols])
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(F.sum(f"__brk_{c}").alias(f"__runs_{c}"))
        aggs.append(F.count_distinct(F.col(c))
                    .alias(f"__dist_{c}"))
    wide = lagged.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __runs_{c}, __dist_{c}" for c in cols)
    out = wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) "
        "as (col_name, n_breaks, n_distinct)")
    # the first row's lag is NULL, and eqNullSafe(value, NULL) is
    # false, so it registers as a break: n_breaks == n_runs exactly
    return (out.select(
        "col_name", F.col("__n").alias("n_rows"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_breaks").cast("long").alias("n_runs"),
        F.round(F.col("n_breaks")
                / F.col("n_distinct").cast("double"), round_to)
        .alias("factor"))
        .orderBy("col_name"))


def markov_order_test(df: DataFrame, *, entity_col: str,
                      ts_col: str, type_col: str,
                      round_to: int = 6) -> DataFrame:
    """Likelihood-ratio test of Markov ORDER (1 vs 2): with triple
    counts n(a,b,c) and the order-1/order-2 conditional MLEs,

        G² = 2·Σ n(a,b,c)·ln[ P̂(c|a,b) / P̂(c|b) ]
        df = k(k−1)² (k observed states)

    — does YESTERDAY-BEFORE-LAST matter: the modeling-assumption
    test every first-order machinery here (markov_event_mix,
    session_depth, markov_drift) silently makes. G² far above df
    says the chain has memory the order-1 matrix is erasing.

    One lead-window pass building triples, two count aggregations;
    all numerators are exact integers. Returns ``(n_triples, k, g2,
    dof)``.
    """
    base = (df.where(F.col(entity_col).isNotNull()
                     & F.col(ts_col).isNotNull()
                     & F.col(type_col).isNotNull())
            .select(F.col(entity_col).alias("e"),
                    F.col(ts_col).alias("t"),
                    F.col(type_col).alias("s")))
    w = Window.partitionBy("e").orderBy("t", "s")
    tri = base.select(
        F.col("s").alias("a"),
        F.lead("s", 1).over(w).alias("b"),
        F.lead("s", 2).over(w).alias("c")) \
        .where(F.col("b").isNotNull() & F.col("c").isNotNull())
    n3 = tri.groupBy("a", "b", "c").agg(
        F.count(F.lit(1)).alias("n"))
    # order-2 denominator: triples sharing (a, b); order-1 ratio
    # P(c|b) from the SAME triple table (so both models see
    # identical data)
    w_ab = Window.partitionBy("a", "b")
    w_b = Window.partitionBy("b")
    w_bc = Window.partitionBy("b", "c")
    t = n3.select(
        "a", "b", "c", "n",
        F.sum("n").over(w_ab).alias("n_ab"),
        F.sum("n").over(w_bc).alias("n_bc"),
        F.sum("n").over(w_b).alias("n_b"))
    term = (F.col("n")
            * F.log((F.col("n") / F.col("n_ab"))
                    / (F.col("n_bc") / F.col("n_b"))))
    k = tri.select("a").unionByName(tri.select(F.col("b")
                                               .alias("a"))) \
        .unionByName(tri.select(F.col("c").alias("a"))) \
        .distinct().count()
    agg = t.agg(
        F.sum("n").cast("long").alias("n_triples"),
        F.round(2.0 * F.sum(term), round_to).alias("g2"))
    return agg.select(
        "n_triples", F.lit(k).cast("long").alias("k"), "g2",
        F.lit(k * (k - 1) * (k - 1)).cast("long").alias("dof"))


def n50(df: DataFrame, value_col: str, *,
        round_to: int = 6) -> DataFrame:
    """N50/L50 of a size distribution (the genome-assembly
    statistic, applied to corpus documents): sort by size
    descending; N50 is the size of the element at which the
    cumulative mass crosses HALF the total, L50 how many elements
    that took —

        "half the corpus volume lives in the L50 biggest docs,
         each at least N50 units long"

    — the one-line concentration summary that speaks in UNITS
    (chars) where Gini/Lorenz speak in shares; N90/L90 ride along
    for the tail. Cumulative windows over the distinct-size
    histogram (never a row sort). Returns ``(n, total, n50, l50,
    n90, l90)``.
    """
    base = (df.where(F.col(value_col).isNotNull()
                     & (F.col(value_col) > 0))
            .select(F.col(value_col).cast("long").alias("v")))
    dv = base.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    wall = Window.partitionBy()
    wp = (Window.partitionBy().orderBy(F.col("v").desc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t = dv.select(
        "v", "c",
        F.sum(F.col("v") * F.col("c")).over(wp).alias("cum_mass"),
        F.sum("c").over(wp).alias("cum_n"),
        F.sum(F.col("v") * F.col("c")).over(wall).alias("total"),
        F.sum("c").over(wall).alias("n"))
    # exact integer thresholds: cum_mass*10 >= total*5 (N50) and
    # cum_mass*10 >= total*9 (N90) avoid float fractions entirely
    n50_row = (t.where(F.col("cum_mass") * 10 >= F.col("total") * 5)
               .agg(F.max("v").alias("n50v")))
    l50_row = (t.where(F.col("cum_mass") * 10 >= F.col("total") * 5)
               .agg(F.min("cum_n").alias("l50v")))
    n90_row = (t.where(F.col("cum_mass") * 10 >= F.col("total") * 9)
               .agg(F.max("v").alias("n90v")))
    l90_row = (t.where(F.col("cum_mass") * 10 >= F.col("total") * 9)
               .agg(F.min("cum_n").alias("l90v")))
    tot = t.agg(F.any_value("n").cast("long").alias("n"),
                F.any_value("total").cast("long").alias("total"))
    out = (tot.crossJoin(F.broadcast(n50_row))
           .crossJoin(F.broadcast(l50_row))
           .crossJoin(F.broadcast(n90_row))
           .crossJoin(F.broadcast(l90_row)))
    return out.select(
        "n", "total",
        F.col("n50v").cast("long").alias("n50"),
        F.col("l50v").cast("long").alias("l50"),
        F.col("n90v").cast("long").alias("n90"),
        F.col("l90v").cast("long").alias("l90"))


def kendall_tau_b(df: DataFrame, *, x_col: str, y_col: str,
                  round_to: int = 6) -> DataFrame:
    """Kendall's tau-b between two numeric columns over a SMALL
    keyed table (aggregate metrics per group — the intended input):

        τ_b = (C − D) / √((C + D + Tx)(C + D + Ty))

    with concordant/discordant/tied pair counts — the tie-aware
    rank correlation for "do sources rank the same by volume as by
    quality", completing gamma (ignores ties) and tau-c (table
    shape). Pairs come from a self-join of the aggregate table —
    the caller aggregates FIRST, so the join is rows², rows tiny.
    All counts exact integers. Returns ``(n, concordant,
    discordant, ties_x, ties_y, tau_b)``.
    """
    base = (df.where(F.col(x_col).isNotNull()
                     & F.col(y_col).isNotNull())
            .select(F.col(x_col).alias("x"),
                    F.col(y_col).alias("y")))
    base = base.withColumn(
        "__i", F.row_number().over(
            Window.partitionBy().orderBy("x", "y")))
    a, b = base.alias("a"), base.alias("b")
    pairs = (a.join(b, F.col("a.__i") < F.col("b.__i"))
             .select(
                 F.signum(F.col("b.x") - F.col("a.x")).alias("sx"),
                 F.signum(F.col("b.y") - F.col("a.y")).alias("sy")))
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum((F.col("sx") * F.col("sy") > 0).cast("long"))
        .alias("cc"),
        F.sum((F.col("sx") * F.col("sy") < 0).cast("long"))
        .alias("dd"),
        F.sum(((F.col("sx") == 0) & (F.col("sy") != 0))
              .cast("long")).alias("tx"),
        F.sum(((F.col("sy") == 0) & (F.col("sx") != 0))
              .cast("long")).alias("ty"))
    n_rows = base.count()
    denom = F.sqrt((F.col("cc") + F.col("dd") + F.col("tx"))
                   .cast("double")
                   * (F.col("cc") + F.col("dd") + F.col("ty")))
    tau = F.when(denom > 0,
                 (F.col("cc") - F.col("dd")) / denom)
    return agg.select(
        F.lit(n_rows).cast("long").alias("n"),
        F.col("cc").alias("concordant"),
        F.col("dd").alias("discordant"),
        F.col("tx").alias("ties_x"), F.col("ty").alias("ties_y"),
        F.round(tau, round_to).alias("tau_b"))


def hash_collision_audit(df: DataFrame, *, key_col: str,
                         bits=(16, 24, 32),
                         round_to: int = 6) -> DataFrame:
    """Fingerprint-width advisor: truncate md5(key) to each *bits*
    width, count OBSERVED collisions (n − distinct hashes) next to
    the birthday-bound expectation n(n−1)/2^{b+1} — the measured
    answer to "how wide must the dedup fingerprint be", where the
    rule-of-thumb only estimates. A width whose observed collisions
    exceed ~2× expectation flags a biased key distribution, not
    just bad luck.

    One distinct + one aggregation per width (widths are few).
    Returns ``(bits, n, n_distinct_hashes, collisions_observed,
    collisions_expected)``.
    """
    base = (df.where(F.col(key_col).isNotNull())
            .select(F.col(key_col).cast("string").alias("k"))
            .distinct().persist())
    rows = None
    for b in bits:
        hexd = (int(b) + 3) // 4
        h = F.conv(F.substring(F.md5("k"), 1, hexd), 16, 10) \
             .cast("long") % (1 << int(b))
        agg = base.select(h.alias("h")).agg(
            F.lit(int(b)).cast("long").alias("bits"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_distinct("h").cast("long")
            .alias("n_distinct_hashes"))
        agg = agg.select(
            "bits", "n", "n_distinct_hashes",
            (F.col("n") - F.col("n_distinct_hashes")).cast("long")
            .alias("collisions_observed"),
            F.round(F.col("n").cast("double")
                    * (F.col("n") - 1)
                    / F.lit(float(2 ** (int(b) + 1))), round_to)
            .alias("collisions_expected"))
        rows = agg if rows is None else rows.unionByName(agg)
    out = rows.orderBy("bits")
    out._zoi_persisted = [base]
    return out
