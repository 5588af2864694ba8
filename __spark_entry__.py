"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship full-rule-set validation on
sf0.001; ``queries()`` exposes one callable per implemented operator
(SURVEY.md §2 + the training-data ops); ``oracle_sql()`` gives the
DuckDB-equivalent SQL the driver cross-checks at sf0.01.

Column-name parity: every computed column is aliased identically on
both sides; floating-point results are rounded to 6 (or 4) decimals and
both engines compute in IEEE double with the same fold order.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import zoi_spark as z
from zoi_spark import dedup, similarity, tablechecks, text


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # oracle semantics are defined in UTC: parquet stores UTC-adjusted
    # micros and DuckDB renders them as naive UTC wall time, so any
    # timestamp-rendering query (codec_shipdate, orders datetime bound)
    # must format in UTC regardless of the harness session's zone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# shared schemas (the flagship rule-sets)
# ---------------------------------------------------------------------------

def customer_schema() -> z.Schema:
    """Webtext-style rule-set over the customer table: range, length,
    prefix, membership — every rule seeded to fire on real data."""
    return z.fields({
        "c_custkey": z.integer(gte=100),
        "c_name": z.string(min=5, max=25).starts_with("Customer#"),
        "c_nationkey": z.integer(gte=0, lte=24),
        "c_acctbal": z.float_(lte=5000.0),
        "c_mktsegment": z.string().one_of(
            ["BUILDING", "FURNITURE", "MACHINERY"]),
    })


def documents_schema() -> z.Schema:
    """Flagship webtext rule-set over the documents table."""
    return z.fields({
        "doc_id": z.integer().non_negative(),
        "text": z.string(min=50, max=520),
        "lang": z.string(min=2, max=2).one_of(["en", "de", "es", "fr"]),
        "source": z.string().starts_with("src"),
        "n_chars": z.integer(gte=50),
    })


def _dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with seeded exact duplicates (every 25th doc repeated
    under doc_id+10000) — the dedup-query corpus, defined identically
    in SQL. ``block`` = (lang, width-50 length-bucket) is the pair-join blocking
    key: near-dups necessarily share it, and it turns the O(n²) pair
    space into ~|block|² per block (the 100 TB-scale play)."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    dups = (d.where(F.col("doc_id") % 25 == 0)
            .select((F.col("doc_id") + 10000).alias("doc_id"), "text", "lang"))
    u = d.unionAll(dups)
    return u.withColumn(
        "block",
        F.concat(F.col("lang"), F.lit("|"),
                 F.floor(F.length("text") / 50).cast("string")))


_DUP_DOCS_SQL = """
    SELECT doc_id, text,
           lang || '|' || CAST(floor(length(text) / 50) AS BIGINT) AS block
    FROM (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 10000, text, lang FROM documents WHERE doc_id % 25 = 0
    )
"""

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_customer_violation_rows(spark, sf_dir):
    res = z.validate(_read(spark, sf_dir, "customer"), customer_schema(),
                     id_cols=["c_custkey"])
    return res.violations.select("c_custkey", "rule_id")


def q_customer_rule_counts(spark, sf_dir):
    res = z.validate(_read(spark, sf_dir, "customer"), customer_schema(),
                     id_cols=["c_custkey"])
    return (res.violations.groupBy("rule_id")
            .agg(F.count("*").alias("n")))


def q_orders_rule_counts(spark, sf_dir):
    schema = z.fields({
        "o_orderkey": z.integer().non_negative(),
        "o_custkey": z.integer().non_negative(),
        "o_orderstatus": z.string().one_of(["O", "F"]),
        "o_totalprice": z.float_(gt=0.0, lte=300000.0),
        "o_orderdate": z.datetime(gte="1996-01-01 00:00:00"),
        "o_orderpriority": z.string().regex("^[1-3]-[A-Z ]+$"),
    })
    res = z.validate(_read(spark, sf_dir, "orders"), schema,
                     id_cols=["o_orderkey"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_lineitem_rule_counts(spark, sf_dir):
    schema = z.fields({
        "l_orderkey": z.integer().non_negative(),
        "l_quantity": z.float_(gte=1.0, lte=45.0),
        "l_discount": z.float_(lte=0.08),
        "l_extendedprice": z.float_().positive(),
        "l_returnflag": z.string().one_of(["A", "N", "R"]),
    })
    res = z.validate(_read(spark, sf_dir, "lineitem"), schema,
                     id_cols=["l_orderkey"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_events_json_coercion(spark, sf_dir):
    """JSON probe + strict guarded coercion (SURVEY §1.3 integer row):
    props.k extracted as string, coerced to int, range-checked."""
    ev = _read(spark, sf_dir, "events").select(
        "event_id", "event_type",
        F.get_json_object("props", "$.k").alias("k"))
    schema = z.fields({
        "event_id": z.integer().non_negative(),
        "event_type": z.string().one_of(
            ["click", "view", "signup", "purchase"]),
        "k": z.integer(coerce=True, gte=0, lte=50),
    })
    res = z.validate(ev, schema, id_cols=["event_id"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_referential_custkey(spark, sf_dir):
    """Broadcast anti-join referential check: orders whose customer is
    outside the (custkey % 7 != 0) dictionary slice."""
    orders = _read(spark, sf_dir, "orders")
    dictionary = (_read(spark, sf_dir, "customer")
                  .where(F.col("c_custkey") % 7 != 0)
                  .select("c_custkey"))
    bad = tablechecks.referential_violations(
        orders, "o_custkey", dictionary, "c_custkey")
    return bad.agg(F.count("*").alias("n_violations"))


def q_unique_doc_groups(spark, sf_dir):
    """Exact-duplicate groups on the seeded corpus: fingerprint,
    group size, kept representative."""
    docs = _dup_docs(spark, sf_dir)
    return (docs.select(text.fingerprint(F.col("text")).alias("fp"), "doc_id")
            .groupBy("fp")
            .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
            .where(F.col("n_docs") > 1))


def q_stats_customer(spark, sf_dir):
    """Fused single-pass stats (exact-distinct flavor for the oracle;
    the engine's HLL flavor is benchmarked, not oracled)."""
    c = _read(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("c_acctbal").isNull().cast("long")).alias("acctbal_nulls"),
        F.round(F.min("c_acctbal"), 2).alias("acctbal_min"),
        F.round(F.max("c_acctbal"), 2).alias("acctbal_max"),
        F.countDistinct("c_mktsegment").alias("segments"),
        F.countDistinct("c_nationkey").alias("nations"),
        F.round(F.avg(F.length("c_name")), 6).alias("name_avg_len"),
    )


def q_hist_doc_length(spark, sf_dir):
    """Length histogram: width-100 buckets over n_chars."""
    d = _read(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 100), F.lit(9)).cast("long")
    return (d.groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias("n")))


def q_drift_lang_psi(spark, sf_dir):
    """PSI of the lang distribution between the two doc_id parity
    halves — distributed histogram + expression-level PSI fold."""
    d = _read(spark, sf_dir, "documents")
    hist = (d.groupBy("lang")
            .agg(F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("c0"),
                 F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("c1")))
    tot = hist.agg(F.sum("c0").alias("t0"), F.sum("c1").alias("t1"))
    joined = hist.crossJoin(tot)
    p = F.greatest(F.col("c0").cast("double") / F.col("t0"), F.lit(1e-9))
    q = F.greatest(F.col("c1").cast("double") / F.col("t1"), F.lit(1e-9))
    return joined.agg(
        F.round(F.sum((q - p) * F.log(q / p)), 6).alias("psi"),
        F.count(F.lit(1)).alias("n_buckets"))


def q_dedup_jaccard_pairs(spark, sf_dir):
    """3-word-shingle Jaccard near-dup pairs on the seeded corpus,
    blocked on (lang, length-bucket) so the pair join is an equi-join
    per block instead of a full cross product."""
    return dedup.ngram_jaccard_pairs(_dup_docs(spark, sf_dir),
                                     n=3, threshold=0.6, block_col="block")


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 for query vectors vec_id<3; rank by
    (rounded cosine desc, vec_id asc) so ordering is identical in both
    engines."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    q = F.broadcast(queries.withColumnRenamed("embedding", "__qvec"))
    sim = F.round(dedup.cosine_similarity(F.col("embedding"),
                                          F.col("__qvec")), 4)
    scored = (emb.join(q)
              .where(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id", sim.alias("cosine")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5))


def q_text_token_stats(spark, sf_dir):
    """Per-lang token statistics via the text-analysis expressions."""
    d = _read(spark, sf_dir, "documents")
    return (d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(text.token_count(F.col("text"))).alias("n_tokens"),
        F.round(F.avg(text.avg_token_length(F.col("text"))), 6)
        .alias("avg_tok_len")))


def q_text_quality_buckets(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    bucket = F.floor(text.quality_score(F.col("text")) * 10).cast("long")
    return d.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


def q_text_lang_id(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return (d.groupBy("lang", text.lang_id(F.col("text")).alias("lang_pred"))
            .agg(F.count("*").alias("n")))


def q_fingerprints(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return d.select("doc_id",
                    text.fingerprint(F.col("text")).alias("fingerprint"))


def q_documents_flagship(spark, sf_dir):
    res = z.validate(_read(spark, sf_dir, "documents"), documents_schema(),
                     id_cols=["doc_id"])
    return res.violations.select("doc_id", "rule_id")


# -- wave-2 operators: combinators, codec, verdicts, embeddings --------------

def q_disc_union_events(spark, sf_dir):
    """Discriminated union (types/discriminated_union.ex:20-75): O(1)
    CASE WHEN dispatch on event_type; the 'error' type is not a branch,
    so those rows surface the unknown-discriminator rule."""
    ev = _read(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")

    def branch(t, val):
        return z.fields({"event_type": z.literal(t), "value": val})

    schema = z.discriminated_union("event_type", [
        branch("click", z.float_(lte=100.0)),
        branch("view", z.float_(lt=200.0)),
        branch("purchase", z.float_(gte=1.0)),
        branch("signup", z.float_(gt=0.5)),
    ])
    res = z.validate(ev, schema, id_cols=["event_id"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_union_mixed_ts(spark, sf_dir):
    """Ordered union first-match (types/union.ex:23-37): ISO datetime
    strings coerce through the datetime branch; pure-digit unix-seconds
    strings fail its format guard and fall through to the integer
    branch. Branch output types differ → value collapses to string."""
    ev = _read(spark, sf_dir, "events").where(F.col("event_id") < 500)
    iso = F.concat(F.lit("2024-01-"),
                   F.lpad((F.col("event_id") % 27 + 1).cast("string"), 2, "0"),
                   F.lit(" 01:"),
                   F.lpad((F.col("event_id") % 60).cast("string"), 2, "0"),
                   F.lit(":00"))
    unix = (F.lit(1704067200) + F.col("event_id")).cast("string")
    mixed = ev.select(
        "event_id",
        F.when(F.col("event_id") % 2 == 0, iso).otherwise(unix).alias("mixed"))
    schema = z.fields({
        "event_id": z.integer(),
        "mixed": z.union([z.naive_datetime(coerce=True),
                          z.integer(coerce=True)]),
    })
    res = z.validate(mixed, schema, id_cols=["event_id"])
    return res.annotated.select(
        "event_id", F.col("__zoi_parsed.mixed").alias("parsed"))


def q_codec_shipdate(spark, sf_dir):
    """Codec parse direction (types/codec.ex:54-67): guarded string →
    decode(to_date) → date schema; result grouped by parsed year."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_str"))
    schema = z.fields({
        "l_orderkey": z.integer(),
        "ship_str": z.codec(
            z.string().regex("^\\d{4}-\\d{2}-\\d{2}$"), z.date(),
            decode=lambda c: F.to_date(c, "yyyy-MM-dd"),
            encode=lambda c: F.date_format(c, "yyyy-MM-dd")),
    })
    res = z.validate(li, schema, id_cols=["l_orderkey"])
    return (res.annotated
            .select(F.year(F.col("__zoi_parsed.ship_str")).alias("ship_year"))
            .groupBy("ship_year").agg(F.count("*").alias("n")))


def q_partition_verdicts(spark, sf_dir):
    """Per-partition pass/fail verdicts + metrics (north_rule core).
    Bucket = pmod(doc_id, 16) — the SQL-expressible stand-in for the
    runner's pmod(xxhash64(id), n) (zoi_spark/runner.py)."""
    res = z.validate(_read(spark, sf_dir, "documents"), documents_schema(),
                     id_cols=["doc_id"])
    pid = F.pmod(F.col("doc_id"), F.lit(16)).cast("int")
    return (res.annotated
            .groupBy(pid.alias("partition_id"))
            .agg(F.count("*").alias("n_rows"),
                 F.sum((~F.col("__zoi_valid")).cast("long")).alias("n_invalid"),
                 F.sum(F.size("__zoi_errors").cast("long")).alias("n_violations"))
            .withColumn("status",
                        F.when(F.col("n_invalid") == 0, F.lit("pass"))
                        .otherwise(F.lit("fail"))))


def q_stats_by_source(spark, sf_dir):
    """Grouped single-pass stats (SURVEY §2.6 stats row, per group)."""
    d = _read(spark, sf_dir, "documents")
    return (d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("text").isNull().cast("long")).alias("text_nulls"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("lang").alias("langs"),
        F.round(F.avg(F.length("text")), 6).alias("avg_len")))


def q_drift_len_kl(spark, sf_dir):
    """KL divergence of the doc-length histogram between the doc_id
    parity halves — the KL twin of the PSI drift check."""
    d = _read(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 100), F.lit(9)).cast("long")
    hist = (d.groupBy(bucket.alias("bucket"))
            .agg(F.sum((F.col("doc_id") % 2 == 0).cast("long")).alias("c0"),
                 F.sum((F.col("doc_id") % 2 == 1).cast("long")).alias("c1")))
    tot = hist.agg(F.sum("c0").alias("t0"), F.sum("c1").alias("t1"))
    joined = hist.crossJoin(tot)
    p = F.greatest(F.col("c0").cast("double") / F.col("t0"), F.lit(1e-9))
    q = F.greatest(F.col("c1").cast("double") / F.col("t1"), F.lit(1e-9))
    return joined.agg(
        F.round(F.sum(p * F.log(p / q)), 6).alias("kl"),
        F.count(F.lit(1)).alias("n_buckets"))


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked on label so the pair
    join is an equi-join per block (dedup.embedding_near_dups)."""
    emb = _read(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dups(emb, id_col="vec_id",
                                     vec_col="embedding",
                                     threshold=0.35, block_col="label")


def q_array_rules_embeddings(spark, sf_dir):
    """Array-type rules in the oracle gate: fixed length on the vector,
    range on the label (lte=7 seeds violations on labels 8-9)."""
    emb = _read(spark, sf_dir, "embeddings")
    schema = z.fields({
        "vec_id": z.integer().non_negative(),
        "embedding": z.array(z.float_(), length=64),
        "label": z.integer(gte=0, lte=7),
    })
    res = z.validate(emb, schema, id_cols=["vec_id"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_exact_dedup_keepfirst(spark, sf_dir):
    """Exact dedup keep-min-id representative (window over the content
    fingerprint — one shuffle, no join)."""
    kept = dedup.exact_dedup(_dup_docs(spark, sf_dir))
    return kept.select("doc_id")


def q_unique_salted(spark, sf_dir):
    """Salted two-phase uniqueness (SURVEY §4 item 1): same verdicts as
    a plain groupBy — the salt only bounds per-task key width — so the
    plain-SQL oracle checks the skew-safe path end to end."""
    docs = _dup_docs(spark, sf_dir)
    keyed = docs.select(text.fingerprint(F.col("text")).alias("fp"))
    return (tablechecks.duplicates(keyed, "fp", salt_partitions=8)
            .select("fp", "n_occurrences", "rule_id", "code"))


def q_form_ingest_events(spark, sf_dir):
    """Lenient HTML-form ingest (Zoi.Form.prepare, lib/zoi/form.ex:
    21-62): stringified inputs, empty-string-as-null, coerce-all —
    rows with ''/garbage surface required/type violations."""
    ev = _read(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    form = ev.select(
        "event_id",
        F.when(F.col("event_id") % 11 == 0, F.lit(""))
         .otherwise(F.col("user_id").cast("string")).alias("user_id"),
        F.when(F.col("event_id") % 13 == 0, F.lit("n/a"))
         .otherwise(F.round("value", 2).cast("string")).alias("value"),
    )
    schema = z.coerce_all(z.fields({
        "event_id": z.integer(),
        "user_id": z.integer().non_negative(),
        "value": z.float_(gte=0.0),
    }))
    res = z.validate(z.prepare_form(form), schema, id_cols=["event_id"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_ann_topk_arrow(spark, sf_dir):
    """Arrow/numpy block-wise exact top-k (similarity.
    brute_force_topk_arrow) — the vectorized-Pandas-UDF path, checked
    against the same SQL oracle shape as the JVM expression path."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.brute_force_topk_arrow(emb, queries, k=5)


# -- non-SQL-expressible ops (rows-only checks) ------------------------------

def q_ivf_ann_topk(spark, sf_dir):
    """IVF ANN (coarse-centroid inverted lists, nprobe probing) —
    centroid sampling is engine-specific, so recall is pytest-verified
    against brute force rather than SQL-oracled."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=4)


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH verified near-dup pairs (signature permutations are
    engine-specific → no SQL oracle; validated in pytest against exact
    Jaccard)."""
    return dedup.minhash_dedup_pairs(_dup_docs(spark, sf_dir),
                                     threshold=0.8, num_hashes=64, bands=16)


def q_simhash_pairs(spark, sf_dir):
    return dedup.simhash_near_dups(_dup_docs(spark, sf_dir), max_hamming=3)


def q_lsh_ann_topk(spark, sf_dir):
    emb = _read(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.lsh_topk(emb, queries, k=5, bits=4)


def q_stats_hll(spark, sf_dir):
    """HLL-sketch flavor of the fused stats pass (approx distinct has
    no deterministic SQL twin → rows-only)."""
    d = _read(spark, sf_dir, "documents")
    hist = tablechecks.HistogramSpec("text", 0, 600, buckets=6, length_of=True)
    return tablechecks.column_stats(d, ["text", "lang"], histograms=[hist])


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full rule-set validation over documents at sf0.001."""
    return q_documents_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "customer_violation_rows": q_customer_violation_rows,
        "customer_rule_counts": q_customer_rule_counts,
        "orders_rule_counts": q_orders_rule_counts,
        "lineitem_rule_counts": q_lineitem_rule_counts,
        "events_json_coercion": q_events_json_coercion,
        "referential_custkey": q_referential_custkey,
        "unique_doc_groups": q_unique_doc_groups,
        "stats_customer": q_stats_customer,
        "hist_doc_length": q_hist_doc_length,
        "drift_lang_psi": q_drift_lang_psi,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
        "ann_cosine_topk": q_ann_cosine_topk,
        "text_token_stats": q_text_token_stats,
        "text_quality_buckets": q_text_quality_buckets,
        "text_lang_id": q_text_lang_id,
        "fingerprints": q_fingerprints,
        "documents_flagship": q_documents_flagship,
        "disc_union_events": q_disc_union_events,
        "union_mixed_ts": q_union_mixed_ts,
        "codec_shipdate": q_codec_shipdate,
        "partition_verdicts": q_partition_verdicts,
        "stats_by_source": q_stats_by_source,
        "drift_len_kl": q_drift_len_kl,
        "embedding_near_dups": q_embedding_near_dups,
        "array_rules_embeddings": q_array_rules_embeddings,
        "exact_dedup_keepfirst": q_exact_dedup_keepfirst,
        "ann_topk_arrow": q_ann_topk_arrow,
        "unique_salted": q_unique_salted,
        "form_ingest_events": q_form_ingest_events,
        # rows-only (no SQL-expressible oracle):
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "lsh_ann_topk": q_lsh_ann_topk,
        "ivf_ann_topk": q_ivf_ann_topk,
        "stats_hll": q_stats_hll,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "customer_violation_rows": """
            SELECT c_custkey, rule_id FROM (
              SELECT c_custkey, 'c_custkey.gte' AS rule_id FROM customer
                WHERE c_custkey IS NOT NULL AND NOT (c_custkey >= 100)
              UNION ALL
              SELECT c_custkey, 'c_name.gte' FROM customer
                WHERE c_name IS NOT NULL AND NOT (length(c_name) >= 5)
              UNION ALL
              SELECT c_custkey, 'c_name.lte' FROM customer
                WHERE c_name IS NOT NULL AND NOT (length(c_name) <= 25)
              UNION ALL
              SELECT c_custkey, 'c_name.starts_with' FROM customer
                WHERE c_name IS NOT NULL AND NOT starts_with(c_name, 'Customer#')
              UNION ALL
              SELECT c_custkey, 'c_nationkey.gte' FROM customer
                WHERE c_nationkey IS NOT NULL AND NOT (c_nationkey >= 0)
              UNION ALL
              SELECT c_custkey, 'c_nationkey.lte' FROM customer
                WHERE c_nationkey IS NOT NULL AND NOT (c_nationkey <= 24)
              UNION ALL
              SELECT c_custkey, 'c_acctbal.lte' FROM customer
                WHERE c_acctbal IS NOT NULL AND NOT (c_acctbal <= 5000.0)
              UNION ALL
              SELECT c_custkey, 'c_mktsegment.one_of' FROM customer
                WHERE c_mktsegment IS NOT NULL
                  AND c_mktsegment NOT IN ('BUILDING','FURNITURE','MACHINERY')
            )
        """,
        "customer_rule_counts": """
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'c_custkey.gte' AS rule_id FROM customer
                WHERE c_custkey IS NOT NULL AND NOT (c_custkey >= 100)
              UNION ALL
              SELECT 'c_acctbal.lte' FROM customer
                WHERE c_acctbal IS NOT NULL AND NOT (c_acctbal <= 5000.0)
              UNION ALL
              SELECT 'c_mktsegment.one_of' FROM customer
                WHERE c_mktsegment IS NOT NULL
                  AND c_mktsegment NOT IN ('BUILDING','FURNITURE','MACHINERY')
            ) GROUP BY rule_id
        """,
        "orders_rule_counts": """
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'o_orderstatus.one_of' AS rule_id FROM orders
                WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('O','F')
              UNION ALL
              SELECT 'o_totalprice.lte' FROM orders
                WHERE o_totalprice IS NOT NULL AND NOT (o_totalprice <= 300000.0)
              UNION ALL
              SELECT 'o_orderdate.gte' FROM orders
                WHERE o_orderdate IS NOT NULL
                  AND NOT (o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
              UNION ALL
              SELECT 'o_orderpriority.regex' FROM orders
                WHERE o_orderpriority IS NOT NULL
                  AND NOT regexp_matches(o_orderpriority, '^[1-3]-[A-Z ]+$')
            ) GROUP BY rule_id
        """,
        "lineitem_rule_counts": """
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'l_quantity.lte' AS rule_id FROM lineitem
                WHERE l_quantity IS NOT NULL AND NOT (l_quantity <= 45.0)
              UNION ALL
              SELECT 'l_discount.lte' FROM lineitem
                WHERE l_discount IS NOT NULL AND NOT (l_discount <= 0.08)
            ) GROUP BY rule_id
        """,
        "events_json_coercion": """
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'k.lte' AS rule_id FROM events
                WHERE json_extract_string(props, '$.k') IS NOT NULL
                  AND regexp_matches(json_extract_string(props, '$.k'), '^[+-]?\\d+$')
                  AND NOT (json_extract_string(props, '$.k')::BIGINT <= 50)
              UNION ALL
              SELECT 'event_type.one_of' FROM events
                WHERE event_type IS NOT NULL
                  AND event_type NOT IN ('click','view','signup','purchase')
            ) GROUP BY rule_id
        """,
        "referential_custkey": """
            SELECT count(*)::BIGINT AS n_violations FROM orders o
            WHERE NOT EXISTS (
              SELECT 1 FROM customer c
              WHERE c.c_custkey % 7 != 0 AND c.c_custkey = o.o_custkey)
        """,
        "unique_doc_groups": f"""
            WITH docs AS ({_DUP_DOCS_SQL})
            SELECT md5({_NORM_SQL}) AS fp,
                   count(*)::BIGINT AS n_docs,
                   min(doc_id) AS keep_id
            FROM docs GROUP BY 1 HAVING count(*) > 1
        """,
        "stats_customer": """
            SELECT count(*)::BIGINT AS n_rows,
                   sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)::BIGINT
                     AS acctbal_nulls,
                   round(min(c_acctbal), 2) AS acctbal_min,
                   round(max(c_acctbal), 2) AS acctbal_max,
                   count(DISTINCT c_mktsegment)::BIGINT AS segments,
                   count(DISTINCT c_nationkey)::BIGINT AS nations,
                   round(avg(length(c_name)), 6) AS name_avg_len
            FROM customer
        """,
        "hist_doc_length": """
            SELECT least(floor(n_chars / 100), 9)::BIGINT AS bucket,
                   count(*)::BIGINT AS n
            FROM documents GROUP BY 1
        """,
        "drift_lang_psi": """
            WITH hist AS (
              SELECT lang,
                     sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS c0,
                     sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c1
              FROM documents GROUP BY lang),
            tot AS (SELECT sum(c0) AS t0, sum(c1) AS t1 FROM hist)
            SELECT round(sum((q - p) * ln(q / p)), 6) AS psi,
                   count(*)::BIGINT AS n_buckets
            FROM (
              SELECT greatest(c0::DOUBLE / t0, 1e-9) AS p,
                     greatest(c1::DOUBLE / t1, 1e-9) AS q
              FROM hist, tot)
        """,
        "dedup_jaccard_pairs": f"""
            WITH docs AS ({_DUP_DOCS_SQL}),
            toks AS (
              SELECT doc_id, block, string_split({_NORM_SQL}, ' ') AS t
              FROM docs),
            sh AS (
              SELECT DISTINCT doc_id, block, shingle FROM (
                SELECT doc_id, block, unnest(
                  CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 1),
                                           i -> array_to_string(t[i:i+2], ' '))
                  END) AS shingle
                FROM toks)),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::DOUBLE AS i
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.block = b.block
                   AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(i / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i / (sa.sz + sb.sz - i) >= 0.6
        """,
        "ann_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4)
                       AS cosine
              FROM embeddings e, q WHERE e.vec_id != q.query_id),
            ranked AS (
              SELECT query_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id ASC)
                       AS rank
              FROM scored)
            SELECT query_id, vec_id, cosine, rank::BIGINT AS rank
            FROM ranked WHERE rank <= 5
        """,
        "ann_topk_arrow": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                       AS cosine
              FROM embeddings e, q WHERE e.vec_id != q.query_id),
            ranked AS (
              SELECT query_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, vec_id ASC)
                       AS rank
              FROM scored)
            SELECT query_id, vec_id, cosine, rank::BIGINT AS rank
            FROM ranked WHERE rank <= 5
        """,
        "text_token_stats": """
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END
                   )::BIGINT AS n_tokens,
                   round(avg(CASE
                     WHEN length(trim(text)) = 0
                          OR len(string_split_regex(trim(text), '\\s+')) = 0
                       THEN 0.0
                     ELSE length(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE
                          / len(string_split_regex(trim(text), '\\s+'))
                   END), 6) AS avg_tok_len
            FROM documents GROUP BY lang
        """,
        "text_quality_buckets": """
            WITH m AS (
              SELECT
                least(length(text)::DOUBLE / 2000.0, 1.0) AS length_c,
                least((CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\\s+')) END
                      )::DOUBLE / 200.0, 1.0) AS token_c,
                1.0 - least((CASE WHEN length(text) > 0 THEN
                    (length(text) - length(regexp_replace(text,
                       '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / length(text)
                  ELSE 0.0 END) * 5.0, 1.0) AS punct_c,
                1.0 - least((CASE WHEN length(text) > 0 THEN
                    (length(text) - length(regexp_replace(text, '[A-Z]', '',
                       'g')))::DOUBLE / length(text)
                  ELSE 0.0 END) * 4.0, 1.0) AS caps_c
              FROM documents)
            SELECT floor(round((length_c + token_c + punct_c + caps_c) / 4.0,
                               6) * 10)::BIGINT AS bucket,
                   count(*)::BIGINT AS n
            FROM m GROUP BY 1
        """,
        "text_lang_id": """
            WITH scores AS (
              SELECT lang,
                len(regexp_extract_all(text,
                  '(?i)\\b(the|and|of|to|in)\\b'))::BIGINT AS s_en,
                len(regexp_extract_all(text,
                  '(?i)\\b(der|die|und|das|nicht)\\b'))::BIGINT AS s_de,
                len(regexp_extract_all(text,
                  '(?i)\\b(le|la|et|les|des)\\b'))::BIGINT AS s_fr,
                len(regexp_extract_all(text,
                  '(?i)\\b(el|los|que|por|una)\\b'))::BIGINT AS s_es
              FROM documents)
            SELECT lang,
                   CASE
                     WHEN s_en > 0 AND s_en > greatest(s_de, s_fr, s_es) THEN 'en'
                     WHEN s_de > 0 AND s_de > greatest(s_en, s_fr, s_es) THEN 'de'
                     WHEN s_fr > 0 AND s_fr > greatest(s_en, s_de, s_es) THEN 'fr'
                     WHEN s_es > 0 AND s_es > greatest(s_en, s_de, s_fr) THEN 'es'
                     ELSE 'und'
                   END AS lang_pred,
                   count(*)::BIGINT AS n
            FROM scores GROUP BY 1, 2
        """,
        "fingerprints": f"""
            SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents
        """,
        "documents_flagship": """
            SELECT doc_id, rule_id FROM (
              SELECT doc_id, 'doc_id.gte' AS rule_id FROM documents
                WHERE doc_id IS NOT NULL AND NOT (doc_id >= 0)
              UNION ALL
              SELECT doc_id, 'text.gte' FROM documents
                WHERE text IS NOT NULL AND NOT (length(text) >= 50)
              UNION ALL
              SELECT doc_id, 'text.lte' FROM documents
                WHERE text IS NOT NULL AND NOT (length(text) <= 520)
              UNION ALL
              SELECT doc_id, 'lang.gte' FROM documents
                WHERE lang IS NOT NULL AND NOT (length(lang) >= 2)
              UNION ALL
              SELECT doc_id, 'lang.lte' FROM documents
                WHERE lang IS NOT NULL AND NOT (length(lang) <= 2)
              UNION ALL
              SELECT doc_id, 'lang.one_of' FROM documents
                WHERE lang IS NOT NULL AND lang NOT IN ('en','de','es','fr')
              UNION ALL
              SELECT doc_id, 'source.starts_with' FROM documents
                WHERE source IS NOT NULL AND NOT starts_with(source, 'src')
              UNION ALL
              SELECT doc_id, 'n_chars.gte' FROM documents
                WHERE n_chars IS NOT NULL AND NOT (n_chars >= 50)
            )
        """,
        "disc_union_events": """
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT CASE
                WHEN event_type NOT IN ('click','view','purchase','signup')
                  THEN '$.unknown_discriminator'
                WHEN event_type = 'click' AND value IS NOT NULL
                  AND NOT (value <= 100.0) THEN 'value.lte'
                WHEN event_type = 'view' AND value IS NOT NULL
                  AND NOT (value < 200.0) THEN 'value.lt'
                WHEN event_type = 'purchase' AND value IS NOT NULL
                  AND NOT (value >= 1.0) THEN 'value.gte'
                WHEN event_type = 'signup' AND value IS NOT NULL
                  AND NOT (value > 0.5) THEN 'value.gt'
                END AS rule_id
              FROM events)
            WHERE rule_id IS NOT NULL GROUP BY 1
        """,
        "union_mixed_ts": """
            SELECT event_id,
                   CASE WHEN event_id % 2 = 0
                     THEN '2024-01-' || lpad((event_id % 27 + 1)::VARCHAR, 2, '0')
                          || ' 01:' || lpad((event_id % 60)::VARCHAR, 2, '0')
                          || ':00'
                     ELSE (1704067200 + event_id)::VARCHAR
                   END AS parsed
            FROM events WHERE event_id < 500
        """,
        "codec_shipdate": """
            SELECT CAST(strftime(l_shipdate, '%Y') AS INTEGER) AS ship_year,
                   count(*)::BIGINT AS n
            FROM lineitem GROUP BY 1
        """,
        "partition_verdicts": """
            WITH per AS (
              SELECT doc_id % 16 AS partition_id,
                (CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                + (CASE WHEN doc_id IS NOT NULL AND NOT (doc_id >= 0) THEN 1 ELSE 0 END)
                + (CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                + (CASE WHEN text IS NOT NULL AND NOT (length(text) >= 50) THEN 1 ELSE 0 END)
                + (CASE WHEN text IS NOT NULL AND NOT (length(text) <= 520) THEN 1 ELSE 0 END)
                + (CASE WHEN lang IS NULL THEN 1 ELSE 0 END)
                + (CASE WHEN lang IS NOT NULL AND NOT (length(lang) >= 2) THEN 1 ELSE 0 END)
                + (CASE WHEN lang IS NOT NULL AND NOT (length(lang) <= 2) THEN 1 ELSE 0 END)
                + (CASE WHEN lang IS NOT NULL AND lang NOT IN ('en','de','es','fr') THEN 1 ELSE 0 END)
                + (CASE WHEN source IS NULL THEN 1 ELSE 0 END)
                + (CASE WHEN source IS NOT NULL AND NOT starts_with(source, 'src') THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
                + (CASE WHEN n_chars IS NOT NULL AND NOT (n_chars >= 50) THEN 1 ELSE 0 END)
                AS v
              FROM documents)
            SELECT partition_id::INTEGER AS partition_id,
                   count(*)::BIGINT AS n_rows,
                   sum(CASE WHEN v > 0 THEN 1 ELSE 0 END)::BIGINT AS n_invalid,
                   sum(v)::BIGINT AS n_violations,
                   CASE WHEN sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) = 0
                        THEN 'pass' ELSE 'fail' END AS status
            FROM per GROUP BY 1
        """,
        "stats_by_source": """
            SELECT source,
                   count(*)::BIGINT AS n_docs,
                   sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT
                     AS text_nulls,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   count(DISTINCT lang)::BIGINT AS langs,
                   round(avg(length(text)), 6) AS avg_len
            FROM documents GROUP BY 1
        """,
        "drift_len_kl": """
            WITH hist AS (
              SELECT least(floor(n_chars / 100), 9)::BIGINT AS bucket,
                     sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS c0,
                     sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS c1
              FROM documents GROUP BY 1),
            tot AS (SELECT sum(c0) AS t0, sum(c1) AS t1 FROM hist)
            SELECT round(sum(p * ln(p / q)), 6) AS kl,
                   count(*)::BIGINT AS n_buckets
            FROM (
              SELECT greatest(c0::DOUBLE / t0, 1e-9) AS p,
                     greatest(c1::DOUBLE / t1, 1e-9) AS q
              FROM hist, tot)
        """,
        "embedding_near_dups": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(
                     a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                     AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(
                    a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
        """,
        "array_rules_embeddings": """
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'vec_id.gte' AS rule_id FROM embeddings
                WHERE vec_id IS NOT NULL AND NOT (vec_id >= 0)
              UNION ALL
              SELECT 'embedding.length' FROM embeddings
                WHERE embedding IS NOT NULL AND NOT (len(embedding) = 64)
              UNION ALL
              SELECT 'label.gte' FROM embeddings
                WHERE label IS NOT NULL AND NOT (label >= 0)
              UNION ALL
              SELECT 'label.lte' FROM embeddings
                WHERE label IS NOT NULL AND NOT (label <= 7)
            ) GROUP BY 1
        """,
        "unique_salted": f"""
            WITH docs AS ({_DUP_DOCS_SQL})
            SELECT md5({_NORM_SQL}) AS fp,
                   count(*)::BIGINT AS n_occurrences,
                   'fp.unique' AS rule_id,
                   'not_unique' AS code
            FROM docs GROUP BY 1 HAVING count(*) > 1
        """,
        "form_ingest_events": """
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'user_id.required' AS rule_id FROM events
                WHERE event_id < 2000 AND (event_id % 11 = 0
                                           OR user_id IS NULL)
              UNION ALL
              SELECT 'value.type' FROM events
                WHERE event_id < 2000 AND event_id % 13 = 0
            ) GROUP BY 1
        """,
        "exact_dedup_keepfirst": f"""
            WITH docs AS ({_DUP_DOCS_SQL})
            SELECT doc_id FROM (
              SELECT doc_id, row_number() OVER (
                PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
              FROM docs)
            WHERE rn = 1
        """,
    }
