"""Corpus sampling / throttling operators for web-scale curation.

A 10^12-doc Common-Crawl-style corpus is never consumed whole: training
pipelines cap over-represented hosts, sample strata (languages,
sources) to a token budget, and fold each new crawl snapshot into the
corpus incrementally. These are first-class curation operators next to
dedup/quality (reference analogue: Zoi validates per-row; corpus-level
admission is the table-level extension SURVEY §2.6 models — same
pattern as `tablechecks.unique_salted`).

Design rules (100 TB):

* **Deterministic.** All selection keys are md5-derived, so a re-run —
  or the DuckDB oracle twin — picks the identical rows. No RNG, no
  ``TABLESAMPLE`` (nondeterministic under AQE/split changes).
* **Shuffle-free where possible.** `hash_sample` / `stratified_sample`
  are pure filters: Catalyst pushes the md5-prefix predicate into the
  scan stage; zero exchanges at any scale.
* **Skew-safe where a shuffle is inherent.** `host_cap` is a per-host
  top-N — a single window over a mega-host (a 10^9-page domain is
  routine in Common Crawl) would funnel that host into ONE task, so
  the two-phase pre-salted variant bounds per-task work at
  ``cap × presalt`` rows without changing the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_sample",
    "stratified_sample",
    "host_cap",
    "sample_key",
    "pack_sequences",
    "dsir_logweights",
]

_HEX_WIDTH = 8  # 32 bits of the md5 → rate granularity 2^-32


def sample_key(id_col: Column, *, salt: str = "") -> Column:
    """Deterministic uniform sampling key: the first 8 hex chars of
    ``md5(salt || id)``. Uniform over [0, 16^8); identical in DuckDB
    (`md5` is bit-identical across engines, unlike xxhash64/`hash`),
    so sampling decisions are oracle-checkable. ``salt`` decorrelates
    independent sampling passes over the same ids."""
    return F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))),
                       1, _HEX_WIDTH)


def _rate_threshold(rate: float) -> str:
    """Lowercase 8-hex-digit threshold t with P[key < t] == rate (to
    2^-32). rate=1.0 maps to 'g' (> every hex digit) so the filter
    keeps all rows exactly."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g" * _HEX_WIDTH  # lexicographically above any hex key
    return format(int(rate * (16 ** _HEX_WIDTH)), f"0{_HEX_WIDTH}x")


def hash_sample(df: DataFrame, *, id_col: str, rate: float,
                salt: str = "") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows — a pure filter
    (`sample_key(id) < threshold`), NO shuffle, no action: at 10^12
    docs this is a predicate inside the scan stage, and the same rows
    survive on every re-run and on the oracle side. The comparison is
    lexicographic on fixed-width lowercase hex, which orders exactly
    like the integer value — no hex→int conversion needed in either
    engine."""
    key = sample_key(F.col(id_col), salt=salt)
    return df.where(key < F.lit(_rate_threshold(rate)))


def stratified_sample(df: DataFrame, *, id_col: str, stratum_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling (language/source token-budget
    shaping): each stratum gets its own keep-rate. Still a pure filter
    — the per-stratum threshold is a chained CASE on ``stratum_col``,
    so the whole operator stays inside whole-stage codegen with zero
    exchanges. Strata not listed in ``rates`` fall to
    ``default_rate`` (0.0 = drop, the conservative default for a
    curation allow-list)."""
    thr: Column = F.lit(_rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == value,
                     F.lit(_rate_threshold(rate))).otherwise(thr)
    key = sample_key(F.col(id_col), salt=salt)
    return df.where(key < thr)


def host_cap(df: DataFrame, *, host_col: str, id_col: str, cap: int,
             presalt: int | None = None,
             keep_rank: bool = False) -> DataFrame:
    """Keep at most ``cap`` rows per host — the standard anti-
    over-representation throttle for web corpora. Selection is
    deterministic: rows rank by ``(sample_key(id), id)`` within the
    host, so the "first cap" is a uniform, re-run-stable choice (NOT
    insertion order, which depends on scan split planning).

    Scale shape: ``row_number`` shuffles on ``host_col`` and a
    mega-host lands in one task. With ``presalt = s``, a first
    window over ``(host, pmod(md5-derived split, s))`` keeps the top
    ``cap`` per salt — bounding any task at its salt's share — and
    only the ≤ ``cap × s`` per-host survivors reach the global
    window. The two-phase result is IDENTICAL to the single-phase one
    (each salt's global top-cap members survive their salt-local
    top-cap), which `tests/test_sampling.py` pins.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    key = sample_key(F.col(id_col))
    order = [key.asc(), F.col(id_col).asc()]
    if presalt is not None and presalt > 1:
        # md5-derived salt split: deterministic, engine-portable
        split = F.conv(F.substring(
            F.md5(F.concat(F.lit("split:"), F.col(id_col).cast("string"))),
            1, 8), 16, 10).cast("long") % presalt
        w1 = Window.partitionBy(F.col(host_col), split).orderBy(*order)
        df = (df.withColumn("_zoi_presalt_rk", F.row_number().over(w1))
                .where(F.col("_zoi_presalt_rk") <= cap)
                .drop("_zoi_presalt_rk"))
    w = Window.partitionBy(host_col).orderBy(*order)
    out = (df.withColumn("host_rank", F.row_number().over(w))
             .where(F.col("host_rank") <= cap))
    return out if keep_rank else out.drop("host_rank")


def pack_sequences(df: DataFrame, *, token_col: str, capacity: int,
                   order_col: str, shard_col: Column | str | None = None,
                   n_shards: int = 0) -> DataFrame:
    """Assign every document a training-sequence bin of ~``capacity``
    tokens — the packing step that turns a curated corpus into
    fixed-budget training sequences. Bin id = ``floor(running-token-
    total-before-this-doc / capacity)`` in a deterministic document
    order (cumulative-sum chunking: each bin holds the docs that start
    inside one capacity window — the standard streaming-packing
    approximation; a doc may straddle its boundary and is split by the
    downstream tokenizer).

    Scale shape: a global running sum would be ONE sorted partition —
    the classic non-scalable window. Packing is therefore per-shard:
    pass ``shard_col`` (e.g. an existing partition key) or ``n_shards``
    to derive a deterministic md5 shard from ``order_col``; the window
    partitions by shard and orders within it, so shards pack in
    parallel and each emits its own independent bin space
    ``(shard, seq_bin)``. Sharded packing is what a 1000-executor run
    does anyway — sequences never span input shards.
    """
    if shard_col is None:
        if n_shards < 1:
            raise ValueError("pass shard_col or n_shards >= 1")
        shard = F.conv(F.substring(
            F.md5(F.concat(F.lit("shard:"),
                           F.col(order_col).cast("string"))), 1, 8),
            16, 10).cast("long") % n_shards
    else:
        shard = F.col(shard_col) if isinstance(shard_col, str) else shard_col
    w = (Window.partitionBy(shard)
         .orderBy(F.col(order_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(token_col)).over(w)
    return (df.withColumn("pack_shard", shard)
            .withColumn("seq_bin",
                        F.floor((cum - F.col(token_col))
                                / F.lit(capacity)).cast("long")))


def token_budget_fill(df: DataFrame, *, id_col: str, weight_col: str,
                      budget: int,
                      stratum_col: str | None = None) -> DataFrame:
    """Greedy token-budget fill: walk each stratum in deterministic
    ``id_col`` order and keep rows while the running token total stays
    within *budget* — how a training mixture is actually assembled
    ("N billion tokens of lang=X", "M tokens of domain=Y").

    One window (running sum) per stratum; the window's sort shuffles
    once on the stratum key. Always pass ``stratum_col`` at corpus
    scale: with no stratum the running sum is a single total order —
    one partition must sort everything, exactly like any global
    cumulative operator.

    Adds ``cum_tokens`` (the running total INCLUDING the row);
    returns only rows that fit the budget.
    """
    part = F.col(stratum_col) if stratum_col else F.lit(0)
    w = (Window.partitionBy(part).orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(weight_col)).over(w)
    return (df.withColumn("cum_tokens", cum)
            .where(F.col("cum_tokens") <= budget))


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling", NeurIPS — public)
# ---------------------------------------------------------------------------

def _gram_bucket(gram: Column, buckets: int) -> Column:
    """Hashed-n-gram feature index: first 32 bits of md5(gram) mod
    ``buckets``. md5 (not xxhash64) so the DuckDB oracle derives the
    identical bucket for every gram."""
    return (F.conv(F.substring(F.md5(gram), 1, 8), 16, 10)
            .cast("long") % buckets)


def dsir_logweights(df: DataFrame, target: DataFrame, *,
                    text_col: str = "text", id_col: str = "doc_id",
                    shingle_n: int = 2, buckets: int = 1024,
                    smoothing: float = 0.5) -> DataFrame:
    """Per-document DSIR importance log-weight: score each raw doc by
    how target-like its hashed n-gram profile is,
    ``w(doc) = Σ_g count_g(doc) · (ln p̂_target[b(g)] − ln q̂_raw[b(g)])``
    with Laplace-``smoothing`` multinomials over ``buckets`` hashed
    n-gram features. Selecting/resampling by these weights is how DSIR
    picks pre-training data matched to a target distribution (the
    feature space and estimator follow the paper; selection itself
    composes with :func:`hash_sample` / :func:`token_budget_fill` /
    ``tablechecks.temperature_weights``).

    Plan at 10^12 docs — three aggregations, no joins bigger than the
    feature table:

    1. raw-side bucket counts: explode grams → groupBy bucket (map-side
       combine; ``buckets`` keys, so the shuffle is tiny regardless of
       corpus size);
    2. target-side bucket counts: same over ``target`` (the target
       sample is small by construction — it's the distribution you
       want more of);
    3. per-doc weights: explode grams → broadcast-join the
       ``buckets``-row log-ratio table → groupBy doc. The only big
       shuffle keys on ``id_col`` (same cardinality as the corpus).

    The raw corpus is scanned twice (bucket totals, then per-doc
    scores); at scale persist the gram explode — or pass a
    ``hash_sample`` of ``df`` as its own estimator corpus, since q̂
    only needs enough mass per bucket to be stable.

    Deterministic end-to-end (md5 buckets, closed-form estimates):
    the DuckDB twin re-derives every weight bit-for-bit at 6 decimals.

    Returns ``(id_col, n_grams, dsir_logweight)``.
    """
    from . import text as _text

    k = F.lit(buckets)
    a = F.lit(float(smoothing))

    def grams(frame: DataFrame) -> DataFrame:
        g = _text.word_shingles(F.col(text_col), shingle_n)
        return (frame
                .where(F.col(text_col).isNotNull())
                .select(F.col(id_col),
                        F.explode(g).alias("__gram"))
                .where(F.col("__gram") != "")
                .select(F.col(id_col),
                        _gram_bucket(F.col("__gram"), buckets)
                        .alias("__bucket")))

    # buckets absent from one estimator still carry smoothed mass:
    # full-outer join the two count tables and coalesce the missing
    # side to 0. Totals come from a global window over the JOINED
    # k-row table — a separate .agg(sum) would re-derive the whole
    # gram explode (a third corpus scan at 10^12 docs); the window
    # funnels only `buckets` rows (bounded, ≤ ~1M) into one task.
    raw_counts = grams(df).groupBy("__bucket").agg(
        F.count("*").alias("__cq"))
    tgt_counts = grams(target).groupBy("__bucket").agg(
        F.count("*").alias("__cp"))
    w = Window.partitionBy(F.lit(1))
    cq = F.coalesce(F.col("__cq"), F.lit(0))
    cp = F.coalesce(F.col("__cp"), F.lit(0))
    ratio = (raw_counts.join(tgt_counts, "__bucket", "full_outer")
             .select(
                 "__bucket",
                 (F.log((cp + a) / (F.sum(cp).over(w) + a * k))
                  - F.log((cq + a) / (F.sum(cq).over(w) + a * k)))
                 .alias("__lr")))

    return (grams(df)
            .join(F.broadcast(ratio), "__bucket")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_grams"),
                 F.round(F.sum("__lr"), 6).alias("dsir_logweight")))


def hash_split(df: DataFrame, *, id_col: str,
               weights: "dict[str, float]",
               salt: str = "split:",
               out_col: str = "split") -> DataFrame:
    """Deterministic, leakage-free corpus split (train/val/test): each
    document's md5 fraction ``conv(md5(salt||id)[:8]) / 2^32`` falls
    into cumulative-weight intervals in ``weights`` declaration order.
    The assignment is a pure projection keyed only on the id — stable
    across re-runs, partitions, and snapshot growth (a document keeps
    its split forever, the property that keeps eval sets leak-free as
    the corpus is re-crawled), and resumable for free.

    ``weights`` are normalized, so ``{"train": 8, "val": 1, "test": 1}``
    and ``{"train": .8, "val": .1, "test": .1}`` are identical. Use a
    different ``salt`` per experiment to draw independent splits.

    Plan shape: one md5 + CASE per row fused into the scan — no
    shuffle; downstream ``WHERE split = 'train'`` is a pushable
    predicate on the materialized column.
    """
    if not weights:
        raise ValueError("hash_split: weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("hash_split: weights must sum to > 0")
    frac = (F.conv(sample_key(F.col(id_col), salt=salt), 16, 10)
            .cast("double") / float(1 << 32))
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        cond = frac < F.lit(cum)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    last = F.lit(names[-1])
    return df.withColumn(out_col,
                         last if expr is None else expr.otherwise(last))


def split_boundaries(weights: "dict[str, float]") -> "list[float]":
    """The cumulative boundaries hash_split compares against, computed
    with the SAME float arithmetic (exposed so the DuckDB oracle can
    interpolate bit-identical literals instead of re-deriving them)."""
    total = float(sum(weights.values()))
    out, cum = [], 0.0
    for name in list(weights)[:-1]:
        cum += weights[name] / total
        out.append(cum)
    return out


def recency_weights(df: DataFrame, *, ts_col: str = "ts",
                    half_life_days: float = 30.0,
                    out_col: str = "recency_weight") -> DataFrame:
    """Exponential recency decay weights — ``0.5^(Δdays/half_life)``
    with Δ measured from the corpus-maximum timestamp, the freshness
    re-weighting a recrawl-heavy corpus applies before sampling (pair
    with temperature_weights/token_budget_fill as the sampling rate).
    Rows with a NULL timestamp get weight NULL (the caller's policy
    decision, not a silent 0 or 1).

    Shape at scale: the corpus max rides in as a broadcast one-row
    cross join (the pagerank dangling-mass idiom) — the weight itself
    is a pure projection, no window, no per-row shuffle."""
    mx = df.agg(F.max(F.col(ts_col)).alias("__max_ts"))
    # cast-to-double keeps sub-second precision (unix_timestamp
    # truncates to whole seconds and would diverge from DuckDB
    # epoch()); the intermediate timestamp cast covers TIMESTAMP_NTZ
    # inputs, which cannot cast to double directly
    def _secs(c: Column) -> Column:
        return c.cast("timestamp").cast("double")

    delta_days = ((_secs(F.col("__max_ts")) - _secs(F.col(ts_col)))
                  / F.lit(86400.0))
    w = F.pow(F.lit(0.5), delta_days / F.lit(float(half_life_days)))
    return (df.crossJoin(F.broadcast(mx))
            .withColumn(out_col, F.round(w, 6))
            .drop("__max_ts"))


def shuffle_shards(df: DataFrame, *, id_col: str,
                   n_shards: int = 1024, seed: str = "") -> DataFrame:
    """Deterministic training-order shuffle: every row gets a ``shard``
    (md5 of seed+id, mod n_shards) and a ``shard_pos`` (md5-ordered
    rank WITHIN the shard) — the reproducible global permutation a
    training run reads as shard-major order. Changing *seed* reshuffles
    everything; re-running never does.

    Scale contract: there is deliberately NO global row_number (a
    corpus-wide ordering window serializes through one task) — the
    permutation is (shard, shard_pos), where each rank window runs over
    one shard ≈ corpus/n_shards rows. Size n_shards so a shard fits an
    executor's sort buffer."""
    key = F.md5(F.concat(F.lit(seed), F.lit(":"),
                         F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long"),
        F.lit(int(n_shards)))
    w = Window.partitionBy("shard").orderBy(F.col("__key"),
                                            F.col(id_col))
    return (df.withColumn("__key", key)
            .withColumn("shard", shard)
            .withColumn("shard_pos", F.row_number().over(w))
            .drop("__key"))


def epoch_factors(df: DataFrame, *, stratum_col: str,
                  targets: "dict[str, float]",
                  budget_multiplier: float = 1.0) -> DataFrame:
    """Per-stratum repetition factors — the LLaMA-style data recipe
    step that hits a target mixture by REPEATING under-represented
    strata whole numbers of times (epochs) rather than subsampling:
    with corpus size N and normalized target share t_s,

        factor_s = max(1, ceil(t_s · N · budget_multiplier / n_s))

    Emits one row per stratum present in the corpus: ``n_rows``,
    ``target_share`` (NULL → factor 1: strata missing from the recipe
    are passed through once), ``epoch_factor`` and ``effective_rows``.
    Materialize the repetition downstream with
    ``join + explode(sequence(1, epoch_factor))``. One count
    aggregation + a broadcast of the (tiny) recipe."""
    if not targets:
        raise ValueError("epoch_factors: targets is empty")
    total = sum(targets.values())
    recipe = [(k, float(v) / total) for k, v in sorted(targets.items())]
    spark = df.sparkSession
    tdf = F.broadcast(spark.createDataFrame(
        recipe, f"{stratum_col} string, target_share double"))
    # counts feeds both the total and the recipe join — persist the
    # strata-row aggregate so the corpus is scanned once
    counts = (df.groupBy(stratum_col)
              .agg(F.count("*").alias("n_rows")).persist())
    n_total = counts.agg(F.sum("n_rows").alias("__n"))
    factor = F.when(
        F.col("target_share").isNotNull(),
        F.greatest(F.lit(1), F.ceil(
            F.col("target_share") * F.col("__n")
            * F.lit(float(budget_multiplier)) / F.col("n_rows"))
            .cast("long"))).otherwise(F.lit(1))
    out = (counts.join(tdf, stratum_col, "left")
           .crossJoin(F.broadcast(n_total))
           .withColumn("epoch_factor", factor)
           .withColumn("effective_rows",
                       F.col("epoch_factor") * F.col("n_rows"))
           .drop("__n"))
    out._zoi_persisted = [counts]  # release after materialization
    return out


def winsorize_stats(df: DataFrame, *, stratum_col: str,
                    value_col: str, order_col: str,
                    p_low: float = 0.01,
                    p_high: float = 0.99) -> DataFrame:
    """Per-stratum rank-winsorization report: the clip thresholds are
    the values at ranks ceil(p·n) (type-1 quantiles — integer ranks,
    NO interpolation, so the thresholds are actual corpus values and
    the whole report is exact), plus how many rows each side would
    clip and the winsorized mean. The outlier-taming step before
    length/score-weighted sampling: one doc with a 100 MB body should
    not own the batch budget. Ties rank deterministically by
    *order_col*. Output per stratum: n_rows, lo, hi, n_clipped_low,
    n_clipped_high, winsorized_mean (exact integer clip sums).

    One per-stratum ranking window (each partition = one stratum, the
    gini() caveat applies) + one aggregation."""
    if not (0.0 < p_low < p_high < 1.0):
        raise ValueError("winsorize_stats: need 0 < p_low < p_high < 1")
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(value_col).asc(), F.col(order_col).asc())
    nw = Window.partitionBy(stratum_col)
    ranked = (df.where(F.col(value_col).isNotNull())
              .withColumn("__r", F.row_number().over(w))
              .withColumn("__n", F.count("*").over(nw)))
    rlo = F.greatest(F.lit(1), F.ceil(F.lit(p_low) * F.col("__n")))
    rhi = F.greatest(F.lit(1), F.ceil(F.lit(p_high) * F.col("__n")))
    marked = ranked.select(
        stratum_col, value_col, "__n",
        F.when(F.col("__r") == rlo, F.col(value_col)).alias("__lo"),
        F.when(F.col("__r") == rhi, F.col(value_col)).alias("__hi"))
    th = (marked.groupBy(stratum_col)
          .agg(F.max("__n").alias("n_rows"),
               F.max("__lo").alias("lo"), F.max("__hi").alias("hi")))
    joined = (df.where(F.col(value_col).isNotNull())
              .join(th, stratum_col))
    x = F.col(value_col)
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), x))
    return (joined.groupBy(stratum_col)
            .agg(F.max("n_rows").cast("long").alias("n_rows"),
                 F.max("lo").alias("lo"), F.max("hi").alias("hi"),
                 F.sum(F.when(x < F.col("lo"), 1).otherwise(0))
                 .cast("long").alias("n_clipped_low"),
                 F.sum(F.when(x > F.col("hi"), 1).otherwise(0))
                 .cast("long").alias("n_clipped_high"),
                 F.round(F.sum(clipped) / F.count("*"), 6)
                 .alias("winsorized_mean")))


def best_per_stratum(df: DataFrame, *, stratum_col: str,
                     score_col: str, k: int,
                     order_col: str) -> DataFrame:
    """Keep the top-*k* rows per stratum by descending score — the
    "best N documents per language/source" curation step (FineWeb-style
    quality-first selection under a per-stratum budget). Ties break by
    ascending *order_col*, so the kept set is deterministic. Appends
    ``__rank`` (1-based within the stratum).

    One ranking window per stratum (single shuffle on the stratum key);
    rank ≤ k lets Spark's WindowGroupLimit push the limit below the
    sort, so each partition keeps a k-row heap rather than sorting the
    full stratum."""
    if k < 1:
        raise ValueError("best_per_stratum: k must be >= 1")
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(score_col).desc(), F.col(order_col).asc())
    return (df.withColumn("__rank", F.row_number().over(w))
            .where(F.col("__rank") <= k))


def ab_readout(df: DataFrame, *, unit_col: str, value_col: str,
               seed: str = "", arms: int = 2) -> DataFrame:
    """Deterministic A/B experiment readout: every unit is assigned an
    ``arm`` by md5(seed:unit) mod *arms* (the same hash-interval
    arithmetic as hash_split — re-running or adding data never
    reassigns anyone), then each arm is profiled: rows, distinct units,
    and the mean of *value_col* accumulated as micro-unit integers so
    the readout is bit-deterministic. Change *seed* to re-randomize a
    new experiment; arms stay balanced in expectation.

    One projection + one aggregation on the arm key; the distinct-unit
    count shuffles (arm, unit) once."""
    if arms < 2:
        raise ValueError("ab_readout: need at least 2 arms")
    key = F.md5(F.concat(F.lit(seed), F.lit(":"),
                         F.col(unit_col).cast("string")))
    arm = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long"),
        F.lit(int(arms)))
    v6 = F.round(F.col(value_col) * 1e6).cast("long")
    per = df.select(arm.alias("arm"), F.col(unit_col).alias("__u"),
                    v6.alias("__v6"))
    return (per.groupBy("arm")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.count_distinct("__u").alias("n_units"),
                 F.round(F.sum("__v6") / 1e6 / F.count("__v6"), 6)
                 .alias("mean_value")))


def neyman_allocation(df: DataFrame, value_col: str, *, stratum_col: str,
                      budget: int, round_to: int = 6) -> DataFrame:
    """Neyman optimal allocation of a fixed sampling ``budget`` across
    strata: draw from stratum h in proportion to ``N_h·σ_h`` — the
    allocation minimizing the variance of the stratified mean — so
    volatile strata (mixed-quality hosts) get more audit rows than
    uniform ones, instead of the proportional split `stratified_sample`
    uses. Output: ``(stratum, n_rows, sigma, alloc_share, alloc_n)``
    with ``alloc_n = floor(budget·share)`` (floored, so Σ ≤ budget and
    the result is deterministic — no largest-remainder tie dance).

    σ is computed from exact integer power sums (Σx, Σx²) so the
    output is bit-deterministic under any partitioning; at 10^12 rows
    swap the long sums for DECIMAL(38) (Σx² overflows long past
    ~3·10^9 rows of 10^4-char pages — documented bounded contract
    here, same as the other exact-moment operators)."""
    v = F.col(value_col).cast("long")
    cells = (df.where(F.col(value_col).isNotNull()
                      & F.col(stratum_col).isNotNull())
             .groupBy(stratum_col)
             .agg(F.count("*").alias("__n"),
                  F.sum(v).alias("__s1"),
                  F.sum(v * v).alias("__s2")))
    # sample variance from exact sums; degenerate strata (n<2) → σ=0
    var = F.when(F.col("__n") > 1,
                 (F.col("__s2") - F.col("__s1") * F.col("__s1")
                  / F.col("__n")) / (F.col("__n") - 1)).otherwise(F.lit(0.0))
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    w = F.col("__n") * sigma
    tot = (cells.select(w.alias("__w"))
           .agg(F.sum("__w").alias("__tw")))
    share = F.when(F.col("__tw") > 0, w / F.col("__tw")).otherwise(F.lit(0.0))
    return (cells.crossJoin(F.broadcast(tot))
            .select(F.col(stratum_col).alias("stratum"),
                    F.col("__n").cast("long").alias("n_rows"),
                    F.round(sigma, round_to).alias("sigma"),
                    F.round(share, round_to).alias("alloc_share"),
                    F.floor(F.lit(int(budget)) * share).cast("long")
                    .alias("alloc_n")))


def split_leakage(df: DataFrame, *, id_col: str, fp_col: str,
                  weights: "dict[str, float]", salt: str = "split:",
                  round_to: int = 6) -> DataFrame:
    """Train/eval leakage audit: after `hash_split`, does any content
    fingerprint appear in MORE THAN ONE split? Hash-splitting by id is
    leakage-free only for EXACT rows — duplicated content with
    different ids lands in different splits and inflates eval scores,
    the classic benchmark-contamination failure. Output one row:
    ``(n_fp_groups, n_dup_groups, n_cross_split_groups,
    n_docs_cross_split, leak_share)`` where leak_share is the doc
    share sitting in a cross-split duplicate group.

    Same split math as `hash_split` (pure projection), then ONE
    fingerprint-keyed aggregation; nothing is materialized per pair."""
    s = hash_split(df, id_col=id_col, weights=weights, salt=salt)
    groups = (s.where(F.col(fp_col).isNotNull())
              .groupBy(fp_col)
              .agg(F.count("*").alias("__n"),
                   F.count_distinct("split").alias("__k")))
    cross = F.col("__k") > 1
    return groups.agg(
        F.count("*").cast("long").alias("n_fp_groups"),
        F.sum((F.col("__n") > 1).cast("long")).cast("long")
        .alias("n_dup_groups"),
        F.sum(cross.cast("long")).cast("long")
        .alias("n_cross_split_groups"),
        F.sum(F.when(cross, F.col("__n")).otherwise(F.lit(0)))
        .cast("long").alias("n_docs_cross_split"),
        F.round(F.sum(F.when(cross, F.col("__n")).otherwise(F.lit(0)))
                / F.sum("__n"), round_to).alias("leak_share"))


def contrastive_negatives(df: DataFrame, *, id_col: str = "doc_id",
                          k: int = 4, seed: str = "neg") -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for every anchor, ``k`` pseudo-random OTHER documents, derived
    from md5 so the sample is reproducible across runs and engines
    (no RNG state, no shuffle-order dependence). REQUIRES dense ids
    0..n−1 (the standard post-shuffle-shard layout; re-index with a
    row_number pass otherwise — checked at runtime against max id).

    Negative j of anchor i is ``(i + 1 + h(i,j) mod (n−1)) mod n``
    where h = the first 12 hex digits of md5('<seed>:<i>:<j>') — never
    the anchor itself, uniform over the other n−1 ids, collision-free
    per (anchor, j) pair only by chance (duplicates across j are kept:
    sampling WITH replacement, the standard contrastive setup).

    Shape at 10^12 rows: one projection + explode (k rows per anchor)
    — no join against the corpus is needed to CHOOSE ids; joining the
    negatives' CONTENT back is the caller's one equi-join."""
    if int(k) < 1:
        raise ValueError("k must be ≥ 1")
    n_rows = df.select(F.max(id_col).alias("m"),
                       F.count("*").alias("c")).collect()[0]
    if n_rows.c != n_rows.m + 1:
        raise ValueError(
            f"contrastive_negatives requires dense ids 0..n-1 "
            f"(max={n_rows.m}, count={n_rows.c})")
    n = int(n_rows.c)
    negs = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            ((F.col(id_col) + 1
              + F.conv(F.substring(F.md5(F.concat(
                  F.lit(f"{seed}:"), F.col(id_col).cast("string"),
                  F.lit(f":{j}"))), 1, 12), 16, 10).cast("long")
              % F.lit(n - 1)) % F.lit(n)).alias("neg_id"))
        for j in range(int(k))])
    return (df.select(F.col(id_col).alias("anchor_id"),
                      F.explode(negs).alias("__n"))
            .select("anchor_id", F.col("__n.j").alias("j"),
                    F.col("__n.neg_id").alias("neg_id")))


def weighted_sample(df: DataFrame, *, weight_col: str, id_col: str,
                    k: int, stratum_col: str | None = None,
                    salt: str = "") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis-Spirakis A-RES scheme (Inf. Proc. Letters 97(5), 2006):
    each row draws a uniform u from the md5 of (salt, id) and is ranked
    by ln(u)/w (the order-equivalent log form of u^(1/w)); the top-k
    per stratum is EXACTLY a weight-proportional sample without
    replacement, reproducible across runs and engines (md5 is
    bit-identical everywhere, unlike xxhash64/rand). The quality-
    weighted corpus draw: high-quality docs are favoured but every
    positive-weight doc has a chance.

    Rows with NULL or non-positive weight are dropped (they have no
    defined inclusion probability) — pre-clamp upstream to keep them.

    Scale shape: one Project for the key (inside the scan stage), one
    hash shuffle on ``stratum_col`` + per-partition top-k via
    row_number — identical to every keep-best window here; with no
    stratum the single global window is the documented
    verification-run shape (use strata at 10^12 rows)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = ((F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            1, 8), 16, 10).cast("double") + 1.0)
         / float(16 ** 8 + 1))  # u in (0, 1]: ln defined, 0 excluded
    key = F.log(u) / F.col(weight_col).cast("double")
    w = (Window.partitionBy(stratum_col) if stratum_col
         else Window.partitionBy()).orderBy(
             F.desc("__ares_key"), F.asc(id_col))
    out = (df.where(F.col(weight_col).isNotNull()
                    & (F.col(weight_col).cast("double") > 0))
           .withColumn("__ares_key", key)
           .withColumn("__ares_rank", F.row_number().over(w))
           .where(F.col("__ares_rank") <= int(k))
           .drop("__ares_key", "__ares_rank"))
    return out


def sample_gof(df: DataFrame, *, id_col: str, stratum_col: str,
               rate: float, salt: str = "") -> DataFrame:
    """Goodness-of-fit audit of the deterministic md5 sampler — the
    self-check that :func:`hash_sample` draws the rate it promises in
    EVERY stratum (a biased id scheme — e.g. ids correlated with the
    stratum — would show up here long before it skews a training mix):
    per stratum the kept count, the binomial expectation n·rate, the
    normal-approximation z-score and the chi-square term; |z| > 3 on a
    large stratum means the id/salt combination is not mixing.
    Returns ``(stratum, n, kept, expected, z, chi2_term)``.

    Scale shape: the membership flag is the sampler's own pure-filter
    predicate evaluated inline (no second pass over a materialized
    sample), then one stratum-keyed aggregation."""
    if not 0.0 < rate < 1.0:
        raise ValueError(f"rate must be in (0, 1), got {rate}")
    keep = (sample_key(F.col(id_col), salt=salt)
            < F.lit(_rate_threshold(rate))).cast("int")
    g = (df.groupBy(F.col(stratum_col).alias("stratum"))
         .agg(F.count("*").cast("long").alias("n"),
              F.sum(keep).cast("long").alias("kept")))
    e = F.col("n") * float(rate)
    var = F.col("n") * float(rate) * (1.0 - float(rate))
    return g.select(
        "stratum", "n", "kept",
        F.round(e, 6).alias("expected"),
        F.round((F.col("kept") - e) / F.sqrt(var), 6).alias("z"),
        F.round((F.col("kept") - e) * (F.col("kept") - e) / e, 6)
        .alias("chi2_term"))


def raking_weights(df: DataFrame, *, row_col: str, col_col: str,
                   row_targets: dict, col_targets: dict,
                   rounds: int = 2, round_to: int = 6) -> DataFrame:
    """Raking / iterative proportional fitting (Deming & Stephan
    1940): per-cell weights that rebalance the corpus so BOTH
    marginals match target shares simultaneously — the joint
    counterpart of :func:`temperature_weights` (one marginal at a
    time). The training-mixture use: "make the corpus 40% English
    AND uniform across sources" cannot be done with two independent
    reweights; IPF alternates row- and column-scaling passes and
    converges geometrically for strictly positive cells.

    ``row_targets`` / ``col_targets`` are {value: share} dicts (each
    summing to 1). Cells whose value is missing from a target dict
    get NULL weight — visible, not silently dropped. ``rounds`` full
    (row+col) passes; 2 is plenty for reporting, raise it for exact
    convergence checks.

    Shape at 10^12 rows: ONE hash aggregation to (row, col) cells;
    every IPF pass is two window sums over that R×C cell frame
    (thousands of rows at most) — iteration cost is decoupled from
    corpus size, the same cells-not-rows shape as `t_closeness_audit`.
    Apply the result by broadcast-joining the weights back on
    (row, col)."""
    if rounds < 1:
        raise ValueError("rounds must be ≥ 1")
    rt = F.create_map(*[F.lit(x) for kv in row_targets.items()
                        for x in kv])
    ct = F.create_map(*[F.lit(x) for kv in col_targets.items()
                        for x in kv])
    cells = (df.groupBy(F.col(row_col).alias("row_val"),
                        F.col(col_col).alias("col_val"))
             .agg(F.count("*").cast("long").alias("n"))
             .select("row_val", "col_val", "n",
                     rt[F.col("row_val")].alias("__tr"),
                     ct[F.col("col_val")].alias("__tc"),
                     F.lit(1.0).alias("w")))
    allw = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    for _ in range(rounds):
        for part, tgt in (("row_val", "__tr"), ("col_val", "__tc")):
            share = (F.sum(F.col("n") * F.col("w"))
                     .over(Window.partitionBy(part))
                     / F.sum(F.col("n") * F.col("w")).over(allw))
            cells = cells.withColumn(
                "w", F.col("w") * F.col(tgt) / share)
    return cells.select("row_val", "col_val", "n",
                        F.round("w", round_to).alias("weight"))


def weight_ess(df: DataFrame, *, weight_col: str,
               by: str | None = None,
               round_to: int = 6) -> DataFrame:
    """Kish effective sample size and design effect of a weight
    column: ESS = (Σw)²/Σw², deff = n·Σw²/(Σw)² — the one-line audit
    that tells you whether a reweighting (raking, temperature,
    inverse-duplication) quietly destroyed your sample ("1M rows at
    deff 50 is 20k effective rows"). Run it on every weight column
    a sampler emits before trusting downstream estimates.

    Shape: one hash aggregation (all moments partial); NULL or
    non-positive weights are excluded and counted."""
    grp = F.col(by) if by else F.lit(0)
    w = F.col(weight_col)
    g = (df.select(grp.alias("__g"),
                   F.when(w > 0, w).alias("__w"))
         .groupBy("__g")
         .agg(F.count("*").cast("long").alias("n_rows"),
              F.count("__w").cast("long").alias("n_weighted"),
              F.sum("__w").alias("__sw"),
              F.sum(F.col("__w") * F.col("__w")).alias("__sw2")))
    ess = F.try_divide(F.col("__sw") * F.col("__sw"), F.col("__sw2"))
    deff = F.try_divide(F.col("n_weighted") * F.col("__sw2"),
                        F.col("__sw") * F.col("__sw"))
    out = g.select("__g", "n_rows", "n_weighted",
                   F.round(ess, round_to).alias("ess"),
                   F.round(deff, round_to).alias("deff"))
    if by:
        return out.withColumnRenamed("__g", by)
    return out.drop("__g")


def uniform01(id_col: Column, *, salt: str = "") -> Column:
    """Deterministic Uniform(0,1) from ``md5(salt || id)``: the first
    13 hex chars (52 bits — exactly representable in a double) as an
    integer, shifted by +0.5 and scaled by 2⁻⁵², so the result lies
    strictly inside (0, 1) — both endpoints excluded, which keeps
    downstream inverse-CDF transforms (Laplace, exponential) finite.
    Bit-identical in DuckDB (``('0x'||substr(md5(..),1,13))::BIGINT``),
    so every consumer stays oracle-checkable."""
    d = F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                          id_col.cast("string"))),
                           1, 13), 16, 10).cast("long")
    return (d.cast("double") + F.lit(0.5)) / F.lit(float(2 ** 52))


def horvitz_thompson(df: DataFrame, y_col: str, *,
                     pi: Column, id_col: str = "doc_id",
                     by: str | None = None, salt: str = "ht",
                     round_to: int = 6) -> DataFrame:
    """Horvitz-Thompson estimation under deterministic Poisson
    sampling: row i is included iff ``uniform01(id) < π_i`` (*pi* is
    the caller's inclusion-probability Column — e.g. size-proportional
    ``least(1.0, n_chars/2000)``), and the population total of *y_col*
    is estimated from the sample alone as ``Σ y_i/π_i`` with the
    Poisson-design variance estimator ``Σ (1−π_i)/π_i² · y_i²``
    (Horvitz & Thompson 1952; Särndal et al. 1992 eq. 2.8.8 — every
    term is computable from the included rows, no joint-inclusion
    probabilities needed under Poisson sampling).

    This is how a 10¹²-doc validation run prices a full-corpus SUM
    without a full-corpus pass: the sample is a pushed-down filter on
    a deterministic hash (no shuffle, no state), and the estimator
    carries its own standard error so the verdict can say "total is
    X ± 2·SE" honestly. Emits per group (or one row): ``n_sampled``,
    ``ht_total``, ``ht_se`` — plus ``true_total`` and ``n_pop`` for
    audit runs at test scale where the truth is computable (drop
    those columns in production use; computing them IS the full pass
    the estimator exists to avoid).

    Scale shape: ONE aggregation over the frame with the inclusion
    flag fused into the scan projection; map-side partial combine
    does the heavy lifting, the shuffle carries |groups| rows.
    """
    u = uniform01(F.col(id_col), salt=salt)
    inc = (u < pi).cast("int")
    y = F.col(y_col).cast("double")
    keys = [by] if by else []
    g = (df.select(*keys, y.alias("__y"), pi.alias("__pi"),
                   inc.alias("__in"))
         .groupBy(*keys))
    return g.agg(
        F.sum("__in").cast("long").alias("n_sampled"),
        F.count(F.lit(1)).alias("n_pop"),
        F.round(F.sum(F.col("__in") * F.col("__y") / F.col("__pi")),
                round_to).alias("ht_total"),
        F.round(F.sqrt(F.sum(F.col("__in") * (1.0 - F.col("__pi"))
                             / (F.col("__pi") * F.col("__pi"))
                             * F.col("__y") * F.col("__y"))),
                round_to).alias("ht_se"),
        F.round(F.sum("__y"), round_to).alias("true_total"))


def greedy_set_cover(df: DataFrame, *, group_col: str,
                     item_col: str, k: int = 3) -> DataFrame:
    """Greedy maximum-coverage group selection (the classic
    (1-1/e)-approximate greedy for set cover / max-coverage,
    Nemhauser-Wolsey-Fisher 1978): each round picks the group whose
    set of distinct *item_col* values adds the most NOT-yet-covered
    items (ties by group asc), adds them to the covered set, repeats
    up to *k* rounds, stopping early once nothing remains.

    The data-mixing / monitoring question it answers: "which k
    sources buy the most distinct vocabulary", "which k days reach
    the most distinct users" -- the submodular selection pass corpus
    curation runs before committing acquisition budget.

    Scale shape: ONE distinct (group, item) aggregation up front
    (persisted and released); each round is an anti-join against the
    covered set plus a groupBy -- k is small by construction. The
    per-round winner is a driver-side single-row pick (a documented
    tiny collect, the same pattern as IVF centroid seeding). Returns
    up to k rows ``(round, group, gain, covered_total)``.
    """
    gw = (df.where(F.col(group_col).isNotNull()
                   & F.col(item_col).isNotNull())
          .select(F.col(group_col).cast("string").alias("g"),
                  F.col(item_col).alias("w"))
          .distinct()
          .persist())
    spark = df.sparkSession
    covered = None
    records = []
    total = 0
    for i in range(1, int(k) + 1):
        remaining = (gw if covered is None
                     else gw.join(covered, "w", "left_anti"))
        gains = (remaining.groupBy("g")
                 .agg(F.countDistinct("w").alias("gain"))
                 .orderBy(F.desc("gain"), F.asc("g")).limit(1)
                 .collect())
        if not gains or gains[0]["gain"] == 0:
            break
        g, gain = gains[0]["g"], gains[0]["gain"]
        total += gain
        records.append((i, g, gain, total))
        newly = gw.where(F.col("g") == g).select("w")
        covered = (newly if covered is None
                   else covered.union(newly).distinct())
        covered = covered.persist()
    gw.unpersist()
    return spark.createDataFrame(
        records, "round int, group string, gain long, "
                 "covered_total long")


def source_set_cover(df: DataFrame, *, text_col: str = "text",
                     by: str = "source", k: int = 3) -> DataFrame:
    """Vocabulary max-coverage over text groups: which k *by* groups
    cover the most distinct normalized tokens -- a thin wrapper that
    explodes tokens and delegates to :func:`greedy_set_cover`."""
    from .text import normalize_text

    toks = F.split(normalize_text(F.col(text_col)), " ")
    words = (df.where(F.col(text_col).isNotNull())
             .select(F.col(by).alias("__g"),
                     F.explode(toks).alias("__w"))
             .where(F.col("__w") != ""))
    return greedy_set_cover(words, group_col="__g", item_col="__w",
                            k=k)


def pareto_front(df: DataFrame, *, by: str,
                 maximize: "list[str]" = (),
                 minimize: "list[str]" = ()) -> DataFrame:
    """Pareto non-dominance flag over per-group metric rows — the
    multi-objective data-mixing decision (which sources are
    EFFICIENT trade-offs of coverage vs duplication vs quality?
    Everything off the front is strictly worse than some other
    source on every axis): group a is dominated iff some b is at
    least as good on EVERY metric and strictly better on at least
    one, with *maximize*/*minimize* giving each metric's direction.

    |groups|² comparison join on the (tiny, pre-aggregated) metric
    rows. Input must already be one row per group. Returns the input
    plus ``on_front`` boolean.
    """
    cols = list(maximize) + list(minimize)
    if not cols:
        raise ValueError("need at least one metric column")
    a, b = df.alias("a"), df.alias("b")
    geq = None
    strict = None
    for c in cols:
        better = (F.col(f"b.{c}") >= F.col(f"a.{c}")
                  if c in maximize else
                  F.col(f"b.{c}") <= F.col(f"a.{c}"))
        sbetter = (F.col(f"b.{c}") > F.col(f"a.{c}")
                   if c in maximize else
                   F.col(f"b.{c}") < F.col(f"a.{c}"))
        geq = better if geq is None else (geq & better)
        strict = sbetter if strict is None else (strict | sbetter)
    dominated = (a.join(b, geq & strict
                        & (F.col(f"a.{by}") != F.col(f"b.{by}")))
                 .select(F.col(f"a.{by}").alias(by)).distinct())
    return df.join(dominated.withColumn("__dom", F.lit(True)),
                   by, "left") \
             .withColumn("on_front", F.col("__dom").isNull()) \
             .drop("__dom")
