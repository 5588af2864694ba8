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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

import zoi_spark as z
from zoi_spark import dedup, similarity, tablechecks, text


def _utc(spark: SparkSession) -> SparkSession:
    """One explicit session-setup step, applied by the queries()/entry
    wrappers below (NOT hidden inside the read helper): oracle semantics
    are defined in UTC — parquet stores UTC-adjusted micros and DuckDB
    renders them as naive UTC wall time, so any timestamp-rendering
    query (codec_shipdate, orders datetime bound) must format in UTC
    regardless of the harness session's zone."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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

# the DuckDB twin of the flagship rule-set's violation rows — defined
# ONCE and reused by documents_flagship AND rule_cooccurrence (a
# drifted hand-copy would silently break one of the two gates)
_FLAGSHIP_SQL = """
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
"""

# the DuckDB twin of text.quality_score over a column named `text` —
# defined ONCE; every oracle needing the quality formula interpolates
# this (a drifted hand-copy would silently break a gate)
_QUALITY_SQL = """round((
    least(length(text)::DOUBLE / 2000.0, 1.0)
    + least((CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(string_split_regex(trim(text), '\\s+')) END
            )::DOUBLE / 200.0, 1.0)
    + 1.0 - least((CASE WHEN length(text) > 0 THEN
        (length(text) - length(regexp_replace(text,
           '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE / length(text)
      ELSE 0.0 END) * 5.0, 1.0)
    + 1.0 - least((CASE WHEN length(text) > 0 THEN
        (length(text) - length(regexp_replace(text, '[A-Z]', '',
           'g')))::DOUBLE / length(text)
      ELSE 0.0 END) * 4.0, 1.0)) / 4.0, 6)"""


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
    """Exact-Jaccard near-dup pairs at threshold 0.6 — the flagship
    near-dup plan: MinHash-LSH banding generates the candidate pairs
    (equi-join on (band, bucket), cost ∝ bucket collisions, never
    quadratic in a block) and exact 3-word-shingle Jaccard runs ONLY as
    the verify stage over those candidates. The r1 plan blocked the
    exact-Jaccard join on (lang, length-bucket), which is quadratic
    within a block and unbounded at web scale; `ngram_jaccard_pairs`
    remains available for bounded verification corpora.

    Oracle parity: with 32 bands × 2 rows a true pair at J=0.6 is
    missed with p=(1-0.36)^32 ≈ 6e-7 (the seeded corpus's pairs are all
    J ≥ 0.9 → p ≈ 1e-20), so the LSH+verify output equals the full
    all-pairs Jaccard answer the DuckDB oracle computes."""
    return dedup.minhash_dedup_pairs(_dup_docs(spark, sf_dir),
                                     threshold=0.6, num_hashes=64, bands=32)


def q_jaccard_blocked_verify(spark, sf_dir):
    """The blocked n-gram Jaccard operator (dedup.ngram_jaccard_pairs)
    on its own oracle row: equi-join per (lang, length-bucket) block
    with hashed shingles + size-ratio prefilter. This is the BOUNDED-
    corpus verification shape — within-block cost is quadratic, so at
    web scale the flagship plan (q_dedup_jaccard_pairs) generates
    candidates with LSH instead and uses exact Jaccard only as the
    verify stage; this query exists to keep the operator itself
    value-checked at gate scale."""
    return dedup.ngram_jaccard_pairs(_dup_docs(spark, sf_dir),
                                     n=3, threshold=0.6, block_col="block")


def q_codec_encode_shipdate(spark, sf_dir):
    """Codec ENCODE direction (Zoi.encode/3, types/codec.ex:38-50):
    the mirror image of q_codec_shipdate — native dates run
    to→encode-fn→from, producing validated strings; grouped by the
    encoded year-month."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship_str"))
    schema = z.fields({
        "l_orderkey": z.integer(),
        "ship_str": z.codec(
            z.string().regex("^\\d{4}-\\d{2}-\\d{2}$"), z.date(),
            decode=lambda c: F.to_date(c, "yyyy-MM-dd"),
            encode=lambda c: F.date_format(c, "yyyy-MM-dd")),
    })
    res = z.encode(li, schema, id_cols=["l_orderkey"])
    return (res.annotated
            .select(F.substring(F.col("__zoi_parsed.ship_str"), 1, 7)
                    .alias("ym"))
            .groupBy("ym").agg(F.count("*").alias("n")))


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
    """Per-lang token statistics: whitespace tokens AND BPE-ish
    pre-token runs (text.bpe_ish_token_count — letter/digit/punct runs,
    the GPT-2-style pre-tokenizer proxy)."""
    d = _read(spark, sf_dir, "documents")
    return (d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(text.token_count(F.col("text"))).alias("n_tokens"),
        F.sum(text.bpe_ish_token_count(F.col("text"))).alias("n_bpe_tokens"),
        F.round(F.avg(text.avg_token_length(F.col("text"))), 6)
        .alias("avg_tok_len")))


def q_text_quality_buckets(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    bucket = F.floor(text.quality_score(F.col("text")) * 10).cast("long")
    return d.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


def q_text_quality_stopword(spark, sf_dir):
    """quality_score_v2 buckets — adds the stopword-density component
    (the length/punct/STOPWORD-ratio triple the training-data
    literature uses; text.stopword_ratio over the union of all marker
    lists)."""
    d = _read(spark, sf_dir, "documents")
    bucket = F.floor(text.quality_score_v2(F.col("text")) * 10).cast("long")
    return d.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


def _quality_stopword_sql() -> str:
    words = sorted({w for ws in text.LANG_MARKERS.values() for w in ws})
    pat = r"(?i)\b(" + "|".join(words) + r")\b"
    toks = ("CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE len(string_split_regex(trim(text), '\\s+')) END")
    return f"""
        WITH m AS (
          SELECT
            least(length(text)::DOUBLE / 2000.0, 1.0) AS length_c,
            least(({toks})::DOUBLE / 200.0, 1.0) AS token_c,
            1.0 - least((CASE WHEN length(text) > 0 THEN
                (length(text) - length(regexp_replace(text,
                   '[!-/:-@\\[-`{{-~]', '', 'g')))::DOUBLE / length(text)
              ELSE 0.0 END) * 5.0, 1.0) AS punct_c,
            1.0 - least((CASE WHEN length(text) > 0 THEN
                (length(text) - length(regexp_replace(text, '[A-Z]', '',
                   'g')))::DOUBLE / length(text)
              ELSE 0.0 END) * 4.0, 1.0) AS caps_c,
            least((CASE WHEN ({toks}) > 0 THEN
                len(regexp_extract_all(coalesce(text, ''), '{pat}'))::DOUBLE
                / ({toks}) ELSE 0.0 END) / 0.05, 1.0) AS stop_c
          FROM documents)
        SELECT floor(round((length_c + token_c + punct_c + caps_c + stop_c)
                           / 5.0, 6) * 10)::BIGINT AS bucket,
               count(*)::BIGINT AS n
        FROM m GROUP BY 1
    """


def q_text_lang_id(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return (d.groupBy("lang", text.lang_id(F.col("text")).alias("lang_pred"))
            .agg(F.count("*").alias("n")))


def q_fingerprints(spark, sf_dir):
    d = _read(spark, sf_dir, "documents")
    return d.select("doc_id",
                    text.fingerprint(F.col("text")).alias("fingerprint"))


def q_winnowing_fingerprints(spark, sf_dir):
    """Winnowing (rolling-hash) local fingerprints — per-doc summary of
    the selected k-gram hash set (count/min/max/sum are order-free and
    hash-compare cleanly; the full arrays back dedup joins). The oracle
    recomputes the identical polynomial over unicode codepoints and the
    identical window minima in SQL."""
    d = _read(spark, sf_dir, "documents")
    fp = text.winnowing_fingerprints(F.col("text"), k=5, w=8)
    return d.select(
        "doc_id",
        F.size(fp).alias("n_fp"),
        F.array_min(fp).alias("fp_min"),
        F.array_max(fp).alias("fp_max"),
        F.aggregate(fp, F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("fp_sum"))


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
    """Embedding-cosine near-dup pairs blocked on the NATURAL label
    column — the BOUNDED-corpus flavor (label has fixed cardinality, so
    block population grows with the corpus; the flagship scale path is
    q_embedding_near_dups_lsh). Pair scoring is the Arrow matmul
    engine: one numpy (n×d)·(d×n) per block."""
    emb = _read(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dups(emb, id_col="vec_id",
                                     vec_col="embedding",
                                     threshold=0.35, block_col="label")


def q_embedding_near_dups_lsh(spark, sf_dir):
    """The FLAGSHIP 100 TB embedding near-dup path: block on a seeded
    random-hyperplane bucket (similarity.random_hyperplane_bucket) so
    the pair join is an equi-join on the bucket key — candidates ~
    n²/2^bits instead of n². ``bits=4`` here is gate-scale; at corpus
    scale derive it with ``similarity.suggest_bits(n)`` so the expected
    block population stays bounded as the corpus grows. Same
    inlined-plane constants as the ANN queries, so the oracle re-derives
    the buckets in SQL."""
    emb = _read(spark, sf_dir, "embeddings")
    planes = similarity.hyperplanes(64, 4, seed=42)
    bucketed = emb.withColumn(
        "__bucket",
        similarity.random_hyperplane_bucket(F.col("embedding"), planes))
    return dedup.embedding_near_dups(bucketed, id_col="vec_id",
                                     vec_col="embedding",
                                     threshold=0.35, block_col="__bucket")


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


# -- probabilistic / sketch ops, oracled via deterministic twins -------------

def q_ivf_ann_topk(spark, sf_dir):
    """IVF ANN (coarse-centroid inverted lists, nprobe probing). The
    centroid selection rule is md5-rank over ids (similarity.
    sample_centroids) and every argmax works on 9-decimal-rounded dots,
    so the DuckDB oracle re-derives centroids, list assignment and
    probes exactly — full SQL parity, no recall hand-waving."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=4)


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidates verified with exact Jaccard ≥ 0.8. The
    oracle is the full all-pairs exact-Jaccard answer: LSH recall at
    16 bands × 4 rows is 1-(1-J⁴)^16 ≥ 1-1e-7 for J ≥ 0.9 (every true
    pair on this corpus), and the verify stage prunes all false
    positives, so candidates∩verify ≡ the exact answer."""
    return dedup.minhash_dedup_pairs(_dup_docs(spark, sf_dir),
                                     threshold=0.8, num_hashes=64, bands=16)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs — pure Column expressions end to end
    (dedup.simhash: one transform + one aggregate fold, no UDF). The
    md5 token-hash flavor is bit-identical to DuckDB's
    ('0x'||substr(md5(t),1,15))::BIGINT, so the oracle recomputes the
    full 60-bit simhash, the prefix blocking AND the hamming join."""
    return dedup.simhash_near_dups(_dup_docs(spark, sf_dir), max_hamming=3,
                                   hash="md5")


def q_lsh_ann_topk(spark, sf_dir):
    """Random-hyperplane LSH ANN. Hyperplanes are seeded literals
    (similarity.hyperplanes(64, 4, seed=42)) — the oracle inlines the
    same constants and re-derives buckets + per-bucket top-k in SQL."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.lsh_topk(emb, queries, k=5, bits=4, dim=64)


def q_lsh_ann_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN (own bucket + every single-bit flip) — the
    recall knob over q_lsh_ann_topk; the oracle derives the same probe
    set with xor over the inlined-plane buckets."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.lsh_topk_multiprobe(emb, queries, k=5, bits=4, dim=64)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTER resolution: LSH-verified pairs at J ≥ 0.8 →
    connected components via min-label propagation
    (dedup.duplicate_clusters) → (doc_id, cluster_id = min id of the
    component). Pairs alone are not a dedup verdict — A≈B≈C must
    collapse to one kept doc even when A≉C; the oracle computes the
    same transitive closure with a recursive CTE over the all-pairs
    exact-Jaccard answer."""
    pairs = dedup.minhash_dedup_pairs(_dup_docs(spark, sf_dir),
                                      threshold=0.8, num_hashes=64, bands=16)
    return dedup.duplicate_clusters(pairs)


def q_stats_hll(spark, sf_dir):
    """HLL-sketch flavor of the fused stats pass. The sketch estimate
    itself has no deterministic SQL twin, so the query emits the exact
    fused-stats columns PLUS `*_hll_ok` booleans asserting the sketch
    landed within 3·rsd of the exact distinct count — the oracle checks
    the exact columns value-for-value and the error-bound CLAIM (its
    side is literally TRUE), keeping the sketch in the gated plan."""
    d = _read(spark, sf_dir, "documents")
    hist = tablechecks.HistogramSpec("text", 0, 600, buckets=6, length_of=True)
    wide = tablechecks.column_stats(d, ["text", "lang"], histograms=[hist],
                                    hll_rsd=0.05, exact_distinct=True)
    rsd3 = 3 * 0.05
    hll_ok = lambda c: (  # noqa: E731
        F.abs(F.col(f"{c}__distinct") - F.col(f"{c}__distinct_exact"))
        <= rsd3 * F.col(f"{c}__distinct_exact"))
    return wide.select(
        "n_rows", "text__nulls", "lang__nulls",
        F.col("lang__min"), F.col("lang__max"),
        F.round("text__avg_length", 6).alias("text_avg_len"),
        F.col("text__distinct_exact"), F.col("lang__distinct_exact"),
        hll_ok("text").alias("text_hll_ok"),
        hll_ok("lang").alias("lang_hll_ok"),
        *[F.col(f"text__hist_len_{b}") for b in range(0, 8)],
    )


# -- format validators (SURVEY §2.3) over a deterministic seeded corpus ------

_FORMAT_POOLS: dict[str, list[str]] = {
    # (format, candidate pool) — index = doc_id % len(pool); pools mix
    # valid and invalid shapes so every rule fires. Pool strings chosen
    # so Java-regex (engine) and RE2 (DuckDB oracle) agree; the default
    # email's lookaheads are re-expressed as conjunctions oracle-side.
    "email": ["alice@example.com", "bob.smith+tag@mail.example.org",
              "bad..dots@example.com", ".leading@example.com",
              "no-at-sign.example.com", "upper@EXAMPLE.COM"],
    "uuid": ["550e8400-e29b-41d4-a716-446655440000",
             "00000000-0000-7000-8000-000000000001",
             "550e8400-e29b-91d4-a716-446655440000",   # version 9 → invalid
             "not-a-uuid",
             "550e8400-e29b-41d4-c716-446655440000"],  # variant c → invalid
    "url": ["https://example.com/path?q=1", "http://sub.example.org/x",
            "ftp://example.com/file", "https://", "not a url",
            "http://host.tld"],
    "ipv4": ["192.168.0.1", "255.255.255.255", "256.1.1.1", "10.0.0",
             "1.2.3.4.5"],
    # NB the reference ipv6 regex is UNANCHORED (lib/zoi/regexes.ex:79)
    # — any substring match passes, so the invalid entry must contain no
    # valid ipv6 fragment at all (no '::', no 'hex:hex' run)
    "ipv6": ["2001:db8::1", "::1", "fe80::1%eth0", "zz:zz",
             "1:2:3:4:5:6:7:8"],
    "hexcol": ["deadBEEF01", "", "0123456789abcdef", "xyz123", "12 34"],
    "b64": ["aGVsbG8=", "AAAA", "aGVsbG8", "a===", "!!!!"],
    "b64u": ["aGVsbG8", "AA==", "a-_9", "a$bc", "####"],
    "jwtcol": ["eyJhbGciOiJIUzI1NiJ9.eyJzdWIiOiIxIn0.sig123",
               "a.b.c", "onlyonepart", "two.parts", "a.b.c.d"],
    "iso_d": ["2024-01-15", "2024-02-30", "2024-1-5", "15/01/2024"],
    "iso_t": ["10:30:00", "10:30:00.123", "10:30", "25:00:00x"],
    "iso_dt": ["2024-01-15T10:30:00Z", "2024-01-15 10:30:00+02:00",
               "2024-01-15T10:30:00", "2024-13-01T00:00:00Z"],
    "iso_ndt": ["2024-01-15T10:30:00", "2024-01-15 10:30:00",
                "2024-01-15T10:30:00Z", "2024-02-30T00:00:00"],
}


def _format_corpus(spark, sf_dir):
    """documents.doc_id → one deterministic candidate string per format
    column (identical CASE construction in the SQL oracle)."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    cols = [F.col("doc_id")]
    for name, pool in _FORMAT_POOLS.items():
        expr = None
        for i, s in enumerate(pool):
            cond = F.pmod(F.col("doc_id"), F.lit(len(pool))) == i
            expr = F.when(cond, F.lit(s)) if expr is None else expr.when(cond, F.lit(s))
        cols.append(expr.alias(name))
    return d.select(*cols)


def _format_corpus_sql() -> str:
    selects = ["doc_id"]
    for name, pool in _FORMAT_POOLS.items():
        whens = " ".join(
            f"WHEN ((doc_id % {len(pool)}) + {len(pool)}) % {len(pool)} = {i} "
            f"THEN '{s.replace(chr(39), chr(39) * 2)}'"
            for i, s in enumerate(pool))
        selects.append(f"CASE {whens} END AS {name}")
    return "SELECT " + ", ".join(selects) + " FROM documents"


def q_format_validators(spark, sf_dir):
    """Every §2.3 format rule over the seeded corpus → rule_id counts
    (reference lib/zoi/regexes.ex:7-88, lib/zoi/types/string.ex:121-174)."""
    corpus = _format_corpus(spark, sf_dir)
    schema = z.fields({
        "doc_id": z.integer(),
        "email": z.email(),            # default "reasonable email" pattern
        "uuid": z.uuid(),
        "url": z.url(),
        "ipv4": z.ipv4(),
        "ipv6": z.ipv6(),
        "hexcol": z.hex(),
        "b64": z.base64(),
        "b64u": z.base64url(),
        "jwtcol": z.jwt(),
        "iso_d": z.iso_date(),
        "iso_t": z.iso_time(),
        "iso_dt": z.iso_datetime(),
        "iso_ndt": z.iso_naive_datetime(),
    })
    res = z.validate(corpus, schema, id_cols=["doc_id"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


# -- remaining §2 combinators in the oracle gate -----------------------------

def q_tuple_rules(spark, sf_dir):
    """Tuple array-form (types/tuple.ex:23-63): fixed length 3 with a
    dynamic actual-length message (every 7th row ships only 2 elements)
    plus positional element rules with [index] paths."""
    li = _read(spark, sf_dir, "lineitem")
    short = F.array(F.col("l_quantity"), F.col("l_discount"))
    full = F.array("l_quantity", "l_discount", "l_extendedprice")
    t = li.select(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 7 == 0, short).otherwise(full).alias("t"))
    schema = z.fields({
        "l_orderkey": z.integer(),
        "t": z.tuple_([z.float_(lte=45.0), z.float_(lte=0.05),
                       z.float_(lte=30000.0)]),
    })
    res = z.validate(t, schema, id_cols=["l_orderkey"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_intersection_enum_remap(spark, sf_dir):
    """Intersection halt-on-first-failing-branch (types/intersection.
    ex:23-37) on a seeded name column + enum kv-pair value→key remap on
    c_mktsegment (types/enum.ex:53-66): violations by rule and
    remapped-parse counts in one result. Seeds: every 5th name truncated
    to 8 chars (fails min(10); branch 2 halts — its starts_with failure
    on the truncated 'Customer' prefix is NOT reported), every 7th
    upper-cased prefix (passes min, fails starts_with)."""
    c = _read(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment",
        F.when(F.col("c_custkey") % 5 == 0, F.substring("c_name", 1, 8))
         .when(F.col("c_custkey") % 7 == 0,
               F.concat(F.lit("CUSTOMER#"), F.substring("c_name", 10, 30)))
         .otherwise(F.col("c_name")).alias("c_name"))
    schema = z.fields({
        "c_custkey": z.integer(),
        "c_name": z.intersection([z.string(min=10),
                                  z.string().starts_with("Customer#")]),
        "c_mktsegment": z.enum({"bld": "BUILDING", "fur": "FURNITURE",
                                "mach": "MACHINERY", "auto": "AUTOMOBILE",
                                "house": "HOUSEHOLD"}),
    })
    res = z.validate(c, schema, id_cols=["c_custkey"])
    by_rule = (res.violations.groupBy(F.col("rule_id").alias("key"))
               .agg(F.count("*").alias("n")))
    by_remap = (res.annotated
                .groupBy(F.concat(F.lit("seg:"),
                                  F.col("__zoi_parsed.c_mktsegment"))
                         .alias("key"))
                .agg(F.count("*").alias("n")))
    return by_rule.unionAll(by_remap)


def q_mapkv_props(spark, sf_dir):
    """Homogeneous map k/v form (types/map.ex:63-86): events.props
    parsed as map<string,string>, keys membership-checked, values
    strict-coerced to int and range-checked; counts by error code."""
    ev = _read(spark, sf_dir, "events")
    # seeds: every 19th event carries a non-numeric value (type rule),
    # every 17th an unexpected key (key one_of rule); both → both
    props2 = (F.when(F.col("event_id") % 19 == 0, F.lit('{"k": "abc"}'))
              .otherwise(F.col("props")))
    props3 = (F.when(F.col("event_id") % 17 == 0,
                     F.regexp_replace(props2, '"k"', '"x"'))
              .otherwise(props2))
    ev = ev.select("event_id",
                   F.from_json(props3, "map<string,string>").alias("props"))
    schema = z.fields({
        "event_id": z.integer(),
        "props": z.map_kv(z.string().one_of(["k"]),
                          z.integer(coerce=True, lte=50)),
    })
    res = z.validate(ev, schema, id_cols=["event_id"])
    return res.violations.groupBy("code").agg(F.count("*").alias("n"))


def q_multiple_unique_decimal(spark, sf_dir):
    """multiple_of (types/integer.ex:153-165), array unique_items
    (types/array.ex:260-274) and guarded decimal coercion
    (types/decimal.ex:70) in one seeded lineitem projection."""
    li = _read(spark, sf_dir, "lineitem")
    # price string built from integer columns only (no float→string
    # formatting — rounding modes differ across engines)
    price = F.concat(F.pmod("l_partkey", F.lit(10000)).cast("string"),
                     F.lit("."),
                     F.lpad(F.pmod("l_suppkey", F.lit(100)).cast("string"),
                            2, "0"))
    d = li.select(
        "l_orderkey",
        F.col("l_partkey").alias("pk"),
        F.array(F.pmod("l_partkey", F.lit(10)),
                F.pmod("l_suppkey", F.lit(10)),
                F.pmod("l_orderkey", F.lit(10))).alias("arr"),
        F.when(F.col("l_orderkey") % 13 == 0, F.lit("n/a"))
         .otherwise(price).alias("price_str"),
    )
    schema = z.fields({
        "l_orderkey": z.integer(),
        "pk": z.integer(multiple_of=4),
        "arr": z.array(z.integer(), unique_items=True),
        "price_str": z.decimal(coerce=True, precision=12, scale=2),
    })
    res = z.validate(d, schema, id_cols=["l_orderkey"])
    counts = res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))
    total = (res.annotated
             .agg(F.sum(F.col("__zoi_parsed.price_str")).alias("s"))
             .select(F.lit("price_sum_x100").alias("rule_id"),
                     (F.col("s") * 100).cast("long").alias("n")))
    return counts.unionAll(total)


# ---------------------------------------------------------------------------
# r3: oracle rows for the previously pytest-only §2 components
# ---------------------------------------------------------------------------

_SCALAR_POOLS: dict[str, list[str]] = {
    # seeded corpora for the scalar type/coercion/transform matrix
    # (reference test/zoi_test.exs:54-815); index = doc_id % len(pool)
    "num_s": ["42", "-3.5", "1e3", "abc", "7.25"],
    "bool_s": ["true", "false", "TRUE", "1"],
    "sb": ["yes", "NO", "on", "disabled", "maybe"],
    "atom_s": ["red", "green", "blue", "magenta"],
    "time_s": ["10:30:00", "10:30:00.123", "10:30", "25:00:00x"],
    "chain": ["  ab  ", "abc", "  abcdef  "],
    "tx": [" a ", "b ", " A"],
}


def _pool_col(name: str, pool: list[str]) -> F.Column:
    expr = None
    for i, s in enumerate(pool):
        cond = F.pmod(F.col("doc_id"), F.lit(len(pool))) == i
        expr = F.when(cond, F.lit(s)) if expr is None else expr.when(cond, F.lit(s))
    return expr.alias(name)


def _pool_sql(name: str, pool: list[str]) -> str:
    whens = " ".join(
        f"WHEN ((doc_id % {len(pool)}) + {len(pool)}) % {len(pool)} = {i} "
        f"THEN '{s.replace(chr(39), chr(39) * 2)}'"
        for i, s in enumerate(pool))
    return f"CASE {whens} END AS {name}"


def q_scalar_coercion_matrix(spark, sf_dir):
    """The scalar §1.3/§2.4 matrix in one oracle row: number / boolean
    / string_boolean / atom / null / any / time / map_set types,
    downcase/upcase refinements, trim + to_downcase/to_upcase
    transforms, and constraint-after-transform chain order
    (string(min=6).trim().to_downcase().gte(5) checks min on the RAW
    value, gte on the trimmed+lowered one, and the chained gte runs
    ONLY when the field constraint passed — Context.parse skips
    run_effects after a parse_type failure, lib/zoi/context.ex:42-44).
    Output = violation counts by rule + parsed-value aggregates proving
    the coercions/transforms produced the right values (and that a
    node with errors parses to nil, meta.ex:90-95)."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    corpus = d.select(
        "doc_id",
        *[_pool_col(n, p) for n, p in _SCALAR_POOLS.items()],
        F.when(F.pmod("doc_id", F.lit(10)) == 0, F.lit("x"))
         .otherwise(F.lit(None).cast("string")).alias("null_c"),
        F.lit("anything").alias("any_c"),
        F.when(F.pmod("doc_id", F.lit(6)) == 0, F.lit("Mixed"))
         .otherwise(F.lit("lower")).alias("dc"),
        F.when(F.pmod("doc_id", F.lit(8)) == 0, F.lit("mixed"))
         .otherwise(F.lit("UPPER")).alias("uc"),
        F.array(F.pmod("doc_id", F.lit(7)),
                F.pmod("doc_id", F.lit(3))).alias("ms"),
    )
    schema = z.fields({
        "doc_id": z.integer(),
        "num_s": z.number(coerce=True, gte=0.0),
        "bool_s": z.boolean(coerce=True),
        "sb": z.string_boolean(),
        "atom_s": z.atom().one_of(["red", "green", "blue"]),
        "null_c": z.null().optional(),
        "any_c": z.any_().optional(),
        "time_s": z.time(),
        "ms": z.map_set(z.integer()),
        "dc": z.string().downcase(),
        "uc": z.string().upcase(),
        "chain": z.string(min=6).trim().to_downcase().gte(5),
        "tx": z.string().trim().to_upcase(),
    })
    res = z.validate(corpus, schema, id_cols=["doc_id"])
    counts = (res.violations.groupBy(F.col("rule_id").alias("key"))
              .agg(F.count("*").alias("n")))
    p = F.col("__zoi_parsed")
    aggs = res.annotated.agg(
        (F.sum(p.getField("num_s")) * 100).cast("long").alias("num_sum_x100"),
        F.sum(p.getField("bool_s").cast("long")).alias("bool_true"),
        F.sum(p.getField("sb").cast("long")).alias("sb_true"),
        F.countDistinct(p.getField("tx")).alias("tx_distinct"),
        F.countDistinct(p.getField("atom_s")).alias("atom_distinct"),
    )
    extra = aggs.selectExpr(
        "stack(5, 'num_sum_x100', num_sum_x100, 'bool_true', bool_true, "
        "'sb_true', sb_true, 'tx_distinct', tx_distinct, "
        "'atom_distinct', atom_distinct) as (key, n)")
    return counts.unionAll(extra)


def q_schema_algebra(spark, sf_dir):
    """extend / pick / omit (lib/zoi.ex:1658-1684, types/extend.ex:
    4-55, types/pick.ex, types/omit.ex) in the gate: the customer
    schema extended with a synthetic tag rule, then picked+omitted down
    to {c_custkey, c_name, c_tag} — the violations can only match the
    oracle if the algebra produced exactly that rule set (no
    c_mktsegment/one_of, no c_acctbal/lte rows may appear)."""
    c = _read(spark, sf_dir, "customer").withColumn(
        "c_tag", F.concat(F.lit("tag-"), F.col("c_custkey").cast("string")))
    # the extension rides through the keyword alias (Zoi keyword/2,
    # lib/zoi.ex:1549 — same field machinery as map/struct)
    extended = z.extend(customer_schema(),
                        z.keyword({"c_tag": z.string(min=8)
                                   .starts_with("tag-")}))
    final = z.omit(z.pick(extended,
                          ["c_custkey", "c_name", "c_acctbal", "c_tag"]),
                   ["c_acctbal"])
    res = z.validate(c, final, id_cols=["c_custkey"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_json_schema_roundtrip(spark, sf_dir):
    """from_json_schema → to_json_schema → from_json_schema round-trip
    IN the gated path (lib/zoi/json_schema/decoder.ex:16-120, encoder
    lib/zoi/json_schema.ex:138-322): the validated rule set derives
    entirely from a JSON-Schema document that survives one full
    encode/decode cycle, so both directions are oracle-checked."""
    ev = _read(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", "user_id",
        F.get_json_object("props", "$.k").alias("k"))
    js = {
        "type": "object",
        "properties": {
            "event_id": {"type": "integer", "minimum": 0},
            "event_type": {"enum": ["click", "view", "signup", "purchase"]},
            "value": {"type": "number", "maximum": 150.0},
            "user_id": {"type": "integer", "exclusiveMinimum": 0},
            "k": {"type": "string", "pattern": "^[0-4]?[0-9]$"},
        },
        "required": ["event_id", "event_type", "value", "user_id"],
    }
    schema = z.from_json_schema(z.to_json_schema(z.from_json_schema(js)))
    res = z.validate(ev, schema, id_cols=["event_id"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_refine_ctx_multi(spark, sf_dir):
    """Context-refine emitting MULTIPLE dynamic messages per value
    (Zoi refine/2 arity-2 with Context.add_error, lib/zoi.ex:3120-3143)
    + an expr refine + an Arrow-batched pandas refine, grouped by
    MESSAGE — plus the treefy/prettify post-processors
    (lib/zoi.ex:452-521) run on a bounded collected subset so the real
    driver-side functions are inside the oracle gate."""

    def name_issues(c):
        last = F.substring(c, F.length(c).cast("int"), 1)
        return F.filter(F.array(
            F.when(last.rlike("^[0-4]$"),
                   F.concat(F.lit("name ends "), last)),
            F.when(c.contains("00"), F.lit("padded name")),
        ), lambda m: m.isNotNull())

    schema = z.fields({
        "c_custkey": z.integer(),
        "c_name": z.string().refine_ctx(name_issues, engine="expr"),
        "c_acctbal": z.float_().refine(lambda c: c <= F.lit(9000.0),
                                       error="balance too high",
                                       engine="expr"),
        "c_nationkey": z.integer().refine(
            lambda s: s.between(0, 20), error="nation out of range",
            engine="pandas"),
    })
    res = z.validate(_read(spark, sf_dir, "customer"), schema,
                     id_cols=["c_custkey"])
    counts = (res.violations.groupBy(F.col("message").alias("key"))
              .agg(F.count("*").alias("n")))

    from collections import Counter

    from zoi_spark import errors as zerr
    sub = [r.asDict() for r in
           (res.violations.where(F.col("c_custkey") <= 120)
            .select("path", "message").collect())]
    pretty = Counter(zerr.prettify_errors(sub))
    tree = zerr.treefy_errors(sub)
    rows = [("pretty:" + line, n) for line, n in pretty.items()]
    rows += [("treefy:" + k, len(v.get("__errors__", [])))
             for k, v in tree.items()]
    extra = spark.createDataFrame(rows, "key string, n long")
    return counts.unionAll(extra)


_EMAIL_POOL = [
    "alice@example.com",        # valid under all four patterns
    "Abc..def@example.com",     # consecutive dots: html5/simple only
    "a@b",                      # no TLD: html5/simple only
    "name@host.example.org",    # valid under all four
    "bad name@example.com",     # space: invalid everywhere
    '"quoted"@example.com',     # quoted local: rfc5322/simple only
]


def q_email_variants(spark, sf_dir):
    """The four selectable email patterns (lib/zoi/regexes.ex:7-31):
    default 'reasonable', html5, rfc5322, simple — one column per
    variant over the same pool, counts by rule."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    corpus = d.select("doc_id", *[
        _pool_col(n, _EMAIL_POOL)
        for n in ("em_default", "em_html5", "em_rfc", "em_simple")])
    schema = z.fields({
        "doc_id": z.integer(),
        "em_default": z.email(),
        "em_html5": z.email(pattern="html5"),
        "em_rfc": z.email(pattern="rfc5322"),
        "em_simple": z.email(pattern="simple"),
    })
    res = z.validate(corpus, schema, id_cols=["doc_id"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def _schema_docs_mini() -> z.Schema:
    """Branch-rich schema exercising describe()'s enum / array / union /
    literal / default / optional renderings."""
    return z.fields({
        "kind": z.enum({"a": "A", "b": "B"}),
        "tags": z.array(z.string(min=1), min_length=1).optional(),
        "val": z.union([z.integer(), z.float_()]),
        "flag": z.literal("on"),
        "score": z.float_(gte=0.0).with_default(1.0),
    })


def q_schema_docs(spark, sf_dir):
    """Zoi.describe/1 (lib/zoi/describe.ex:95-110, test
    test/zoi/describe_test.exs): render the rule-set as markdown and
    emit one row per line. The engine derives the rows from
    describe(); the oracle is the hand-written expected text — a
    renderer drift in either direction fails the hash (same contract
    as q_schema_introspection)."""
    from zoi_spark.describe import describe as zdescribe

    rows = []
    for part, schema in (("documents", documents_schema()),
                         ("mini", _schema_docs_mini())):
        for i, line in enumerate(zdescribe(schema).split("\n")):
            rows.append((part, i, line))
    return spark.createDataFrame(rows,
                                 "part string, line_no long, line string")


def q_schema_introspection(spark, sf_dir):
    """Driver-side schema derivations in the gate: Zoi.type_spec
    (to_struct_type/to_ddl, lib/zoi.ex:284-289),
    Zoi.Struct.enforce_keys / struct_fields (lib/zoi/struct.ex:45-80).
    The engine derives the rows from the real APIs; the oracle is the
    hand-written expectation — a drift in either fails the hash."""
    from zoi_spark import struct_keys as zsk
    from zoi_spark.describe import to_ddl

    doc = documents_schema()
    rows = [(f"doc:{f.name}", f.dataType.simpleString(), not f.nullable)
            for f in zsk.required_struct_type(doc).fields]
    rows.append(("doc:__ddl__", to_ddl(doc), False))
    mini = z.fields({"a": z.integer(), "b": z.string().optional(),
                     "c": z.integer().with_default(7)})
    rows.append(("mini:enforce_keys", ",".join(zsk.enforce_keys(mini)),
                 False))
    rows.append(("mini:struct_fields",
                 ",".join(x if isinstance(x, str) else f"{x[0]}={x[1]}"
                          for x in zsk.struct_fields(mini)), False))
    rows += [(f"mini:{f.name}", f.dataType.simpleString(), not f.nullable)
             for f in zsk.required_struct_type(mini).fields]
    return spark.createDataFrame(rows, "key string, info string, "
                                       "enforced boolean")


def q_validate_strict_parsed(spark, sf_dir):
    """Zoi.parse!/3 pass path (lib/zoi.ex:234-242): validate_strict on
    the rule-clean customer subset returns the PARSED frame (raising
    path is pytest-covered — an oracle can't observe a raise)."""
    cond = ((F.col("c_custkey") >= 100)
            & F.length("c_name").between(5, 25)
            & F.col("c_name").startswith("Customer#")
            & F.col("c_nationkey").between(0, 24)
            & (F.col("c_acctbal") <= 5000.0)
            & F.col("c_mktsegment").isin("BUILDING", "FURNITURE",
                                         "MACHINERY"))
    clean = _read(spark, sf_dir, "customer").where(cond)
    parsed = z.validate_strict(clean, customer_schema(),
                               id_cols=["c_custkey"])
    named = parsed.toDF("id", "c_custkey", "c_name", "c_nationkey",
                        "c_acctbal", "c_mktsegment")
    return named.select("c_custkey", "c_name",
                        F.round("c_acctbal", 2).alias("bal"))


def q_lazy_tree(spark, sf_dir):
    """Recursive schema via bounded lazy unrolling (types/lazy.ex:
    19-27, SURVEY §7 hard parts): a two-level tree struct validated by
    a self-referential fields schema; element rules fire with full
    nested paths at both depths."""
    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.struct(
            F.pmod("doc_id", F.lit(8)).alias("v"),
            F.struct(F.pmod(F.floor(F.col("doc_id") / 8).cast("long"),
                            F.lit(8)).alias("v")).alias("child"),
        ).alias("tree"))

    def node():
        return z.fields({"v": z.integer(lte=5),
                         "child": z.lazy(node, max_depth=4).optional()})

    schema = z.fields({"doc_id": z.integer(),
                       "tree": z.lazy(node, max_depth=4)})
    res = z.validate(d, schema, id_cols=["doc_id"])
    return (res.violations.groupBy("rule_id", "path_str")
            .agg(F.count("*").alias("n")))


def q_json_probe(spark, sf_dir):
    """z.json() string-probe type (types/json.ex:4-16): every 23rd
    event's props replaced with truncated (invalid) JSON; the probe
    (try_parse_json JVM-side) must flag exactly those."""
    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.pmod("event_id", F.lit(23)) == 0,
               F.concat(F.lit('{"broken": '),
                        F.col("event_id").cast("string")))
         .otherwise(F.col("props")).alias("props"))
    schema = z.fields({"event_id": z.integer(), "props": z.json()})
    res = z.validate(ev, schema, id_cols=["event_id"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


_GRAPHEME_POOL = [
    "hello!",                                   # 6 chars / 6 graphemes
    "u\u0301n\u0301o\u0301",             # combining accents: 6 chars / 3 graphemes
    "\U0001F1FA\U0001F1F8\U0001F1E9\U0001F1EA",  # 2 flags: 4 / 2
    "\U0001F468\u200d\U0001F469\u200d\U0001F467 ok",  # ZWJ family: 8 / 4
    "cafe\u0301 latte",                       # combining accents: 11 chars / 10 graphemes
    "abc\u200ddef",                            # ZWJ between letters: 7 / 6
    "plain ascii text",                         # 16 / 16
]


def q_grapheme_length_rules(spark, sf_dir):
    """Grapheme-exact length mode (SURVEY §7 hard parts — the
    reference's String.length/1 counts extended grapheme clusters, not
    codepoints): the same unicode pool validated under BOTH modes; the
    two rule sets must disagree exactly where clusters != codepoints.
    The oracle recomputes with DuckDB's UAX#29 length_grapheme."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    corpus = d.select("doc_id",
                      _pool_col("gstr", _GRAPHEME_POOL),
                      _pool_col("cstr", _GRAPHEME_POOL))
    schema = z.fields({
        "doc_id": z.integer(),
        "gstr": z.string(min=6, length_mode="grapheme"),
        "cstr": z.string(min=6),
    })
    res = z.validate(corpus, schema, id_cols=["doc_id"])
    return res.violations.groupBy("rule_id").agg(F.count("*").alias("n"))


def q_winnowing_overlap_pairs(spark, sf_dir):
    """MOSS-style near-dup pairs via shared winnowed fingerprints
    (dedup.winnowing_overlap_pairs): substring-level overlap robust to
    insertion/reordering, pair join blocked on the hash with a
    document-frequency cap pruning boilerplate n-grams before the
    join (the stopword analogue of the LSH mega-bucket cap)."""
    return dedup.winnowing_overlap_pairs(
        _dup_docs(spark, sf_dir).select("doc_id", "text"),
        k=5, w=8, min_shared=5, max_hash_docs=20)


def q_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + url-level dedup (zoi_spark.urls): five
    byte-different decorations of the same resource (host case, :80,
    utm params, fragment) must collapse to one canonical form — groups
    of 10 per host at sf0.01. The cheapest dedup pass at corpus scale:
    one string projection + one hash aggregation, run BEFORE any
    content fingerprint."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(50)).cast("string")
    base = F.concat(F.lit("http://host"), g, F.lit(".example.com/p/"), g)
    variants = [
        base,
        F.concat(F.lit("HTTP://HOST"), g, F.lit(".EXAMPLE.COM/p/"), g),
        F.concat(F.lit("http://host"), g, F.lit(".example.com:80/p/"), g),
        F.concat(base, F.lit("?utm_source=x&utm_campaign=y")),
        F.concat(base, F.lit("#frag")),
    ]
    v = F.pmod("doc_id", F.lit(5))
    url = None
    for i, expr in enumerate(variants):
        url = F.when(v == i, expr) if url is None else url.when(v == i, expr)
    docs = d.select("doc_id", url.alias("url"))
    return urls.url_dedup_groups(docs)


def q_pii_scan(spark, sf_dir):
    """PII hygiene scan (text.with_pii_flags): per-lang totals of
    email / IPv4 / phone pattern matches over text seeded with known
    PII strings — the flag-for-scrub pass of a training-data intake."""
    d = _read(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.when(F.pmod("doc_id", F.lit(11)) == 0,
               F.lit(" contact bob@example.com")).otherwise(F.lit("")),
        F.when(F.pmod("doc_id", F.lit(13)) == 0,
               F.lit(" server 192.168.1.1 up")).otherwise(F.lit("")),
        F.when(F.pmod("doc_id", F.lit(17)) == 0,
               F.lit(" call +1 (555) 123-4567")).otherwise(F.lit("")))
    flagged = text.with_pii_flags(
        d.select("doc_id", "lang", seeded.alias("text")))
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_pii_email").alias("emails"),
        F.sum("n_pii_ipv4").alias("ips"),
        F.sum("n_pii_phone").alias("phones"),
        F.sum(F.col("has_pii").cast("long")).alias("docs_with_pii"))


def q_cross_field_rules(spark, sf_dir):
    """Cross-field (whole-row) refinements — Zoi's ``map |> refine``
    (effects over the parsed map, lib/zoi/types/meta.ex:62-95): the
    TOP-LEVEL fields schema carries two rules that relate columns —
    net price sanity (extendedprice·(1−discount) ≤ 60000) and a
    ctx-refine emitting a dynamic message when quantity and discount
    are jointly extreme."""
    li = _read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount")

    def net_ok(row):
        return (row.getField("l_extendedprice")
                * (F.lit(1.0) - row.getField("l_discount"))) <= 60000.0

    def extreme(row):
        q, d = row.getField("l_quantity"), row.getField("l_discount")
        return F.filter(F.array(
            F.when((q >= 49.0) & (d >= 0.09),
                   F.concat(F.lit("extreme combo q="),
                            q.cast("int").cast("string")))),
            lambda m: m.isNotNull())

    schema = z.fields({
        "l_orderkey": z.integer(),
        "l_quantity": z.float_(),
        "l_extendedprice": z.float_(),
        "l_discount": z.float_(),
    }).refine(net_ok, error="net price too high", engine="expr") \
      .refine_ctx(extreme, engine="expr")
    res = z.validate(li, schema, id_cols=["l_orderkey"])
    return res.violations.groupBy("message").agg(F.count("*").alias("n"))


def q_ivf_train_step(spark, sf_dir):
    """One Lloyd iteration of IVF centroid training
    (similarity.refine_centroids): md5-rank seed centroids → assign →
    per-component means (rounded, so SQL re-derives the trained
    centroids exactly) → re-assign. Output = per-centroid membership
    counts before and after the step; the reassignment movement is the
    oracle-checkable evidence the training step actually ran."""
    emb = _read(spark, sf_dir, "embeddings")
    cents0 = similarity.sample_centroids(emb, n_centroids=8)
    cents1 = similarity.refine_centroids(emb, cents0, iters=1, round_to=6)
    before = (emb.select(similarity.nearest_centroid(
        F.col("embedding"), cents0).alias("cent"))
        .groupBy("cent").agg(F.count("*").alias("n_before")))
    after = (emb.select(similarity.nearest_centroid(
        F.col("embedding"), cents1).alias("cent"))
        .groupBy("cent").agg(F.count("*").alias("n_after")))
    allc = spark.range(8).select(F.col("id").cast("int").alias("cent"))
    return (allc.join(before, "cent", "left").join(after, "cent", "left")
            .select("cent",
                    F.coalesce("n_before", F.lit(0)).alias("n_before"),
                    F.coalesce("n_after", F.lit(0)).alias("n_after")))


def q_ivf_topk_trained(spark, sf_dir):
    """Trained-IVF ANN end to end: seed centroids refined with one
    spherical-k-means step, then the standard inverted-list probe/rank
    (similarity.ivf_topk(train_iters=1)) — training and search both
    inside one oracle-checked plan."""
    emb = _read(spark, sf_dir, "embeddings")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return similarity.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=4,
                               train_iters=1)


def q_contamination_probes(spark, sf_dir):
    """Benchmark-decontamination scan (text.contamination_check): the
    probe set is derived lazily from the corpus itself (35-char
    normalized substrings of three documents — guaranteed hits, no
    driver collect) plus one miss probe; the corpus checks containment
    against the broadcast probes in one scan."""
    d = _read(spark, sf_dir, "documents")
    norm = text.normalize_text(F.col("text"))
    probes = (d.where(F.col("doc_id").isin(3, 57, 111))
              .select(F.col("doc_id").alias("probe_id"),
                      F.substring(norm, 11, 35).alias("probe_text")))
    miss = spark.createDataFrame([(999, "zzz qqq vvv")],
                                 "probe_id long, probe_text string")
    return text.contamination_check(d, probes.unionAll(miss))


def q_top_bigrams(spark, sf_dir):
    """Corpus bigram frequencies (text.ngram_counts): explode + hash
    aggregation with map-side combine; top 15 by (count desc, gram asc)
    — the candidate-generation shape for contamination and boilerplate
    mining."""
    d = _read(spark, sf_dir, "documents")
    return (text.ngram_counts(d, n=2, min_count=2)
            .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
            .limit(15))


def _media_payloads() -> list[bytes]:
    """Three deterministic 24-bit BMPs with ANALYTICALLY-known pixel
    statistics (so the oracle's expected features are hand-derived
    constants, not recomputed by the same decoder): solid red 8×4,
    solid gray(100) 5×5, half-black/half-white 6×2."""
    import numpy as np

    from zoi_spark import multimodal

    red = np.zeros((4, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    gray = np.full((5, 5, 3), 100, dtype=np.uint8)
    half = np.zeros((2, 6, 3), dtype=np.uint8)
    half[:, 3:, :] = 255
    return [multimodal.encode_bmp(a) for a in (red, gray, half)]


def q_media_decode_features(spark, sf_dir):
    """Multimodal decode in the oracle gate: deterministic BMP payloads
    (hex literals → unhex → binary column) run through the REAL
    pure-numpy decode (multimodal.decode_image_features over
    mapInPandas); per-variant dimensions and pixel-statistic features
    must equal the hand-computed expectations in the SQL twin."""
    from zoi_spark import multimodal

    d = _read(spark, sf_dir, "documents").select("doc_id")
    payloads = _media_payloads()
    v = F.pmod("doc_id", F.lit(3))
    payload = None
    for i, p in enumerate(payloads):
        expr = F.unhex(F.lit(p.hex()))
        payload = (F.when(v == i, expr) if payload is None
                   else payload.when(v == i, expr))
    media = d.select(F.col("doc_id").alias("media_id"),
                     payload.alias("payload"))
    feats = multimodal.decode_image_features(media, dim=8)
    variant = F.pmod("media_id", F.lit(3)).alias("variant")
    fcols = [F.round(F.max(F.element_at("feature", i + 1)), 6)
             .alias(f"f{i}") for i in range(8)]
    return (feats.groupBy(variant)
            .agg(F.count("*").alias("n_docs"),
                 F.max("width").alias("w"), F.max("height").alias("h"),
                 F.max("n_bytes").alias("nb"), *fcols))


def _media_decode_sql() -> str:
    """Hand-derived expectations: features are [meanR, meanG, meanB,
    stdR, stdG, stdB, grayMin, grayMax] — for solid colors the stds
    are 0 and gray = channel mean; for the half-black/half-white image
    every channel is Bernoulli(1/2)·255 → mean = std = 127.5. All
    values are float32-exact, so no rounding ambiguity."""
    payloads = _media_payloads()
    nb = [len(p) for p in payloads]
    rows = [
        # variant, w, h, nb, f0..f7
        (0, 8, 4, nb[0], 255.0, 0.0, 0.0, 0.0, 0.0, 0.0, 85.0, 85.0),
        (1, 5, 5, nb[1], 100.0, 100.0, 100.0, 0.0, 0.0, 0.0, 100.0, 100.0),
        (2, 6, 2, nb[2], 127.5, 127.5, 127.5, 127.5, 127.5, 127.5,
         0.0, 255.0),
    ]
    values = ",\n              ".join(
        "(" + ", ".join(repr(x) for x in r) + ")" for r in rows)
    return f"""
        WITH expected(variant, w, h, nb, f0, f1, f2, f3, f4, f5, f6, f7)
          AS (VALUES
              {values}),
        counts AS (
          SELECT ((doc_id % 3) + 3) % 3 AS variant,
                 count(*)::BIGINT AS n_docs
          FROM documents GROUP BY 1)
        SELECT e.variant::BIGINT AS variant, c.n_docs,
               e.w::INTEGER AS w, e.h::INTEGER AS h, e.nb::BIGINT AS nb,
               e.f0::FLOAT AS f0, e.f1::FLOAT AS f1, e.f2::FLOAT AS f2,
               e.f3::FLOAT AS f3, e.f4::FLOAT AS f4, e.f5::FLOAT AS f5,
               e.f6::FLOAT AS f6, e.f7::FLOAT AS f7
        FROM expected e JOIN counts c ON c.variant = e.variant
    """


def _audio_payloads() -> list[bytes]:
    """Four PCM-16 WAVs with ANALYTIC feature expectations: constant
    +1000 (rms=1000, zcr=0), alternating ±2000 (rms=2000, zcr=1),
    silence (all zero), and a stereo pair (+500/−500) whose mono
    mixdown is exactly zero."""
    import numpy as np

    from zoi_spark import multimodal

    const = np.full(8, 1000, dtype=np.int16)
    alt = np.array([2000, -2000] * 4, dtype=np.int16)
    silence = np.zeros(16, dtype=np.int16)
    stereo = np.tile(np.array([[500, -500]], dtype=np.int16), (4, 1))
    return [multimodal.encode_wav(const, 8000),
            multimodal.encode_wav(alt, 8000),
            multimodal.encode_wav(silence, 16000),
            multimodal.encode_wav(stereo, 8000)]


def q_media_audio_features(spark, sf_dir):
    """Audio decode in the oracle gate (the WAV analogue of
    media_decode_features): deterministic PCM-16 payloads → real
    pure-numpy decode (chunk walk, stereo mixdown) → per-variant
    sample rate / frames / duration / rms / peak / zero-cross rate
    checked against hand-derived constants."""
    from zoi_spark import multimodal

    d = _read(spark, sf_dir, "documents").select("doc_id")
    payloads = _audio_payloads()
    v = F.pmod("doc_id", F.lit(len(payloads)))
    payload = None
    for i, p in enumerate(payloads):
        expr = F.unhex(F.lit(p.hex()))
        payload = (F.when(v == i, expr) if payload is None
                   else payload.when(v == i, expr))
    media = d.select(F.col("doc_id").alias("media_id"),
                     payload.alias("payload"))
    feats = multimodal.decode_audio_features(media)
    variant = F.pmod("media_id", F.lit(len(payloads))).alias("variant")
    return (feats.groupBy(variant)
            .agg(F.count("*").alias("n_docs"),
                 F.max("sample_rate").alias("rate"),
                 F.max("n_frames").alias("frames"),
                 F.round(F.max("duration_ms"), 6).alias("dur_ms"),
                 F.round(F.max("rms"), 6).alias("rms"),
                 F.max("peak").alias("peak"),
                 F.round(F.max("zero_cross_rate"), 6).alias("zcr")))


def _media_audio_sql() -> str:
    rows = [
        # variant, rate, frames, dur_ms, rms, peak, zcr
        (0, 8000, 8, 1.0, 1000.0, 1000, 0.0),
        (1, 8000, 8, 1.0, 2000.0, 2000, 1.0),
        (2, 16000, 16, 1.0, 0.0, 0, 0.0),
        (3, 8000, 4, 0.5, 0.0, 500, 0.0),
    ]
    values = ",\n              ".join(
        "(" + ", ".join(repr(x) for x in r) + ")" for r in rows)
    return f"""
        WITH expected(variant, rate, frames, dur_ms, rms, peak, zcr)
          AS (VALUES
              {values}),
        counts AS (
          SELECT ((doc_id % 4) + 4) % 4 AS variant,
                 count(*)::BIGINT AS n_docs
          FROM documents GROUP BY 1)
        SELECT e.variant::BIGINT AS variant, c.n_docs,
               e.rate::INTEGER AS rate, e.frames::BIGINT AS frames,
               e.dur_ms::DOUBLE AS dur_ms, e.rms::DOUBLE AS rms,
               e.peak::INTEGER AS peak, e.zcr::DOUBLE AS zcr
        FROM expected e JOIN counts c ON c.variant = e.variant
    """


def q_media_video_frames(spark, sf_dir):
    """Video frame sampling in the oracle gate: a synthesized 6-frame
    Y4M literal decoded for real (multimodal.sample_frames chunk-walks
    the container and emits raw 4:2:0 frames); per sampled frame the
    byte length and md5 digest must equal constants the oracle derives
    from FIRST PRINCIPLES (frame j = 32 luma bytes of 20·(j+1) + 16
    neutral chroma bytes — no decoder involved oracle-side)."""
    import numpy as np

    from zoi_spark import multimodal

    payload = multimodal.encode_y4m(
        [np.full((4, 8), 20 * (i + 1), dtype=np.uint8) for i in range(6)],
        fps=(30, 1))
    d = _read(spark, sf_dir, "documents").select("doc_id")
    media = d.select(F.col("doc_id").alias("media_id"),
                     F.unhex(F.lit(payload.hex())).alias("payload"))
    frames = multimodal.sample_frames(media, every_n=2, max_frames=3)
    return (frames.groupBy("frame_idx")
            .agg(F.count("*").alias("n_docs"),
                 F.max(F.length("frame")).alias("nb"),
                 F.max(F.md5("frame")).alias("digest")))


def _media_video_sql() -> str:
    import hashlib

    rows = []
    for j in (0, 2, 4):
        frame = bytes([20 * (j + 1)]) * 32 + bytes([128]) * 16
        rows.append((j, 48, hashlib.md5(frame).hexdigest()))
    values = ",\n              ".join(
        f"({j}, {nb}, '{dg}')" for j, nb, dg in rows)
    return f"""
        WITH expected(frame_idx, nb, digest) AS (VALUES
              {values}),
        total AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
        SELECT e.frame_idx::INTEGER AS frame_idx, t.n_docs,
               e.nb::INTEGER AS nb, e.digest
        FROM expected e, total t
    """


def q_stream_validate_docs(spark, sf_dir):
    """Structured Streaming validation in the oracle gate: the
    documents table read as a STREAM (file source), validated with the
    flagship rule-set via zoi_spark.streaming.stream_violations
    (stateless annotate + stream-static broadcast of the rule
    catalog), sunk to parquet with an availableNow trigger, then the
    materialized sink aggregated — identical semantics to the batch
    path, so the batch SQL is the oracle."""
    import shutil
    import tempfile

    from zoi_spark import streaming

    out_dir = os.path.join(tempfile.gettempdir(), "zoi_stream_gate")
    shutil.rmtree(out_dir, ignore_errors=True)
    # the parquet file-stream source requires a DIRECTORY (its basePath);
    # stage the table file into one — the same shape a real deployment
    # streams from (a landing directory fed with arriving files)
    in_dir = os.path.join(out_dir, "in")
    os.makedirs(in_dir)
    shutil.copy(f"{sf_dir}/documents.parquet",
                os.path.join(in_dir, "documents.parquet"))
    batch_schema = _read(spark, sf_dir, "documents").schema
    sdf = spark.readStream.schema(batch_schema).parquet(in_dir)
    viol = streaming.stream_violations(sdf, documents_schema(), ["doc_id"])
    q = (viol.select("doc_id", "rule_id").writeStream
         .format("parquet")
         .option("path", f"{out_dir}/data")
         .option("checkpointLocation", f"{out_dir}/ckpt")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return (spark.read.parquet(f"{out_dir}/data")
            .groupBy("rule_id").agg(F.count("*").alias("n")))


# -- corpus sampling / admission operators (web-scale curation) -------------

def q_host_cap_sample(spark, sf_dir):
    """Per-host throttle (sampling.host_cap): keep the 5
    deterministically-chosen docs per source, two-phase pre-salted so a
    mega-host never funnels into one task; returns the full kept
    membership (id, host, rank) so the oracle checks WHICH rows
    survive, not just how many. The two-phase plan provably equals the
    single-phase one (pinned in tests/test_sampling.py)."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    return sampling.host_cap(d, host_col="source", id_col="doc_id",
                             cap=5, presalt=4, keep_rank=True
                             ).select("doc_id", "source", "host_rank")


def q_stratified_sample_langs(spark, sf_dir):
    """Token-budget shaping (sampling.stratified_sample): per-language
    deterministic keep-rates via one shuffle-free md5-prefix filter —
    the plan is a single codegen'd scan+filter at any corpus size.
    Membership (not counts) is the oracled result."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    return sampling.stratified_sample(
        d, id_col="doc_id", stratum_col="lang",
        rates={"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.125},
        default_rate=0.0).select("doc_id", "lang")


def q_incremental_new_docs(spark, sf_dir):
    """Cross-snapshot admission (dedup.incremental_new_docs): the new
    crawl = genuinely-new docs (id ≥ 400) plus 50 re-crawls of base
    pages (same text, re-keyed id+10000); the anti-join on the content
    fingerprint must admit exactly the 100 new docs and reject every
    re-crawl."""
    d = _read(spark, sf_dir, "documents")
    base = d.where(F.col("doc_id") < 400)
    recrawl = (d.where(F.col("doc_id") < 50)
               .withColumn("doc_id", F.col("doc_id") + F.lit(10000)))
    new = d.where(F.col("doc_id") >= 400).unionByName(recrawl)
    return dedup.incremental_new_docs(new, base).select("doc_id", "source")


def q_repetition_quality(spark, sf_dir):
    """Gopher-style repetition gates (text.repetition_stats): per-doc
    distinct-token ratio and top-unigram/-bigram fractions; the 20 most
    repetitive docs. Both aggregation legs key on the doc id, so
    corpus-level token skew cannot skew any partition."""
    d = _read(spark, sf_dir, "documents")
    return (text.repetition_stats(d)
            .orderBy(F.col("top_token_frac").desc(), F.col("doc_id"))
            .limit(20))


def q_stats_quantiles(spark, sf_dir):
    """Per-language length quantiles (tablechecks.column_quantiles,
    exact mode): one sort-based aggregation, linear interpolation —
    bit-matching DuckDB's quantile_cont. The approx KLL-sketch mode
    (the 10^12-row shape) shares the call-site and is pinned against
    this exact result in tests/test_sampling.py."""
    q = tablechecks.column_quantiles(
        _read(spark, sf_dir, "documents"), "n_chars",
        probs=(0.25, 0.5, 0.9), by="lang")
    return q.select("lang", *[F.round(c, 6).alias(c)
                              for c in ("q_0_25", "q_0_5", "q_0_9")])


def q_zscore_outliers(spark, sf_dir):
    """Distribution-aware range rule (tablechecks.zscore_outliers):
    docs whose length is > 2σ from their language's mean. Per-stratum
    moments are one tiny aggregation broadcast back onto the table —
    NOT a window over the language key, which would shuffle the whole
    corpus onto a handful of keys."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.zscore_outliers(d, "n_chars", by="lang", k=2.0)


def q_pack_sequences(spark, sf_dir):
    """Training-sequence packing (sampling.pack_sequences): per-shard
    cumulative-budget chunking into ~3000-char bins; full (doc → shard,
    bin) assignment is the oracled result. Shards pack in parallel —
    the window never sees more than one shard's rows."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    return (sampling.pack_sequences(
                d, token_col="n_chars", capacity=3000, order_col="doc_id",
                shard_col=F.pmod("doc_id", F.lit(8)))
            .select("doc_id", "pack_shard", "seq_bin"))


def _lined_docs(spark, sf_dir, *, words_per_line=3):
    """The documents table with deterministic line structure: the token
    stream re-chunked into fixed-width lines (text.chunk_lines) — the
    fixture corpus carries no newlines, so line-level curation queries
    synthesize them identically in Spark and the DuckDB twin."""
    d = _read(spark, sf_dir, "documents")
    return d.withColumn(
        "text", text.chunk_lines(F.col("text"), words_per_line=words_per_line))


def _lined_docs_sql(words_per_line=3):
    k = words_per_line
    return f"""
        SELECT doc_id,
               array_to_string(
                 list_transform(
                   range(1, greatest(cast(ceil(len(string_split_regex(trim(text), '\\s+')) / {k}.0) AS INT), 1) + 1),
                   i -> array_to_string(
                          (string_split_regex(trim(text), '\\s+'))[(i-1)*{k}+1:(i-1)*{k}+{k}],
                          ' ')),
                 chr(10)) AS text
        FROM documents
    """


def q_boilerplate_strip(spark, sf_dir):
    """RefinedWeb/CCNet-style boilerplate removal
    (text.frequent_lines + text.strip_boilerplate): mine the top-50
    corpus-frequent lines (≥3 docs), broadcast the capped removal set,
    rebuild every document from the surviving lines. md5 of the
    cleaned text proves byte-exact line order preservation. Reference
    parity: same repeated-value shape as Zoi's unique/one_of table
    checks (`lib/zoi.ex` refinements), lifted to corpus scale."""
    lined = _lined_docs(spark, sf_dir)
    out = text.strip_boilerplate(lined, min_docs=3, max_lines=50)
    return (out.select("doc_id", "n_lines", "n_kept",
                       F.md5("clean_text").alias("clean_md5"))
            .orderBy("doc_id").limit(400))


def q_c4_line_filter(spark, sf_dir):
    """C4-style line filter (text.c4_line_filter): ≥4 words, terminal
    punctuation, no blocklist marker ('slow'). Terminal punctuation is
    synthesized deterministically (lines whose length % 3 == 0 get a
    trailing '.') since the word-salad fixture has none. One codegen'd
    projection — no shuffle."""
    lined = _lined_docs(spark, sf_dir, words_per_line=5)
    punct = lined.withColumn(
        "text",
        F.array_join(
            F.transform(
                text.split_lines(F.col("text")),
                lambda x: F.when(F.length(x) % 3 == 0,
                                 F.concat(x, F.lit("."))).otherwise(x)),
            "\n"))
    out = text.c4_line_filter(punct, min_words=4, require_terminal=True,
                              blocklist=("slow",))
    return (out.select("doc_id", "n_lines", "n_kept",
                       F.md5("clean_text").alias("clean_md5"))
            .orderBy("doc_id").limit(400))


def q_unigram_surprisal(spark, sf_dir):
    """CCNet-style perplexity proxy (text.unigram_logprob): corpus
    unigram MLE → per-doc mean −log2 p; the 20 most surprising docs.
    Vocabulary is broadcast back onto the (doc, token) counts — the
    only corpus-wide shuffle is the first keyed aggregation."""
    d = _read(spark, sf_dir, "documents")
    out = text.unigram_logprob(d)
    return (out.orderBy(F.col("mean_surprisal").desc(), "doc_id")
            .limit(20))


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (dedup.semantic_dedup): trained spherical-k-means cells
    (same seed→Lloyd-step chain the IVF queries oracle) partition the
    embeddings; one Arrow matmul per cell scores in-cell cosine; every
    vector with a smaller-id neighbor ≥ 0.35 drops. Output = the kept
    ids with their cell — the whole kept set is value-hashed, so the
    assignment, the pairing AND the keep rule are all under the gate."""
    emb = _read(spark, sf_dir, "embeddings")
    cents0 = similarity.sample_centroids(emb, n_centroids=8)
    cents = similarity.refine_centroids(emb, cents0, iters=1, round_to=6)
    kept = dedup.semantic_dedup(emb, id_col="vec_id", vec_col="embedding",
                                centroids=cents, threshold=0.35)
    return kept.select("vec_id",
                       F.col("__semdedup_cell").cast("int").alias("cell"))


def q_dup_ngram_fraction(spark, sf_dir):
    """Cross-document duplicated 5-gram fraction
    (text.dup_ngram_fraction): the shuffle-native stand-in for
    exact-substring dedup — per doc, the share of its word 5-grams
    found in ≥2 distinct documents. Docs with any duplicated gram
    (the gate's decision set)."""
    d = _read(spark, sf_dir, "documents")
    out = text.dup_ngram_fraction(d, n=5, min_docs=2)
    return out.where(F.col("n_dup") > 0)


def q_gopher_quality(spark, sf_dir):
    """Gopher admission battery (text.gopher_quality_flags): all seven
    rule booleans + the pass conjunction, per document — the whole
    battery is one fused scan projection (no explode/UDF/shuffle), and
    every boolean lands under the value hash. min_words lowered to 20
    and the stop list re-seated on the synthetic corpus's head tokens
    so every rule fires both ways on the gate corpus."""
    d = _read(spark, sf_dir, "documents")
    out = text.gopher_quality_flags(
        d, min_words=20,
        stopwords=("join", "hash", "row", "batch", "scan",
                   "filter", "data", "merge"))
    return out.select("doc_id", "g_word_count", "g_mean_word_len",
                      "g_symbol_ratio", "g_bullet_ratio",
                      "g_ellipsis_ratio", "g_alpha_ratio", "g_stopwords",
                      "gopher_pass")


def q_ngram_decontam(spark, sf_dir):
    """13-gram-overlap decontamination (text.ngram_decontamination,
    the GPT-3/PaLM protocol): probes are 20-token windows lifted from
    three corpus documents (word-aligned, so overlap is guaranteed)
    plus one synthetic miss; corpus and probe sides explode to
    distinct (id, gram) and meet in ONE hash join on the gram."""
    d = _read(spark, sf_dir, "documents")
    toks = F.split(text.normalize_text(F.col("text")), " ")
    probes = (d.where(F.col("doc_id").isin(7, 42, 203))
              .select(F.col("doc_id").alias("probe_id"),
                      F.concat_ws(" ", F.slice(toks, 6, 20))
                      .alias("probe_text")))
    miss = spark.createDataFrame(
        [(999, " ".join(f"w{i}" for i in range(20)))],
        "probe_id long, probe_text string")
    return text.ngram_decontamination(d, probes.unionAll(miss), n=13)


def q_url_quality(spark, sf_dir):
    """FineWeb-style URL intake filtering (urls.url_quality_flags):
    seven seeded variants per doc_id — clean, IPv4 host, blocklist
    word, digit-heavy host, crawler-trap depth, param flood, over-long
    — so every rule fires both ways; all seven booleans + the pass
    conjunction land under the value hash."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(50)).cast("string")
    base = F.concat(F.lit("http://host"), g, F.lit(".example.com/p/"), g)
    variants = [
        base,
        F.concat(F.lit("http://93.184.216.34/p/"), g),
        F.concat(F.lit("http://host"), g,
                 F.lit(".example.com/casino/"), g),
        F.concat(F.lit("http://9876543210"), g,
                 F.lit(".example.com/p/"), g),
        F.concat(F.lit("http://host"), g,
                 F.lit(".example.com/a/b/c/d/e/f/g/h/i/j/k/l/m/"), g),
        F.concat(base, F.lit("?" + "&".join(
            f"p{i}=1" for i in range(12)))),
        F.concat(base, F.lit("/" + "x" * 300)),
    ]
    sel = F.pmod("doc_id", F.lit(7))
    url = F.when(sel == 0, variants[0])
    for i, v in enumerate(variants[1:], 1):
        url = url.when(sel == i, v)
    seeded = d.select("doc_id", url.alias("url"))
    out = urls.url_quality_flags(seeded)
    return out.select("doc_id", "u_valid", "u_not_ip", "u_not_blocked",
                      "u_host_digits", "u_depth", "u_params", "u_length",
                      "url_pass")


def q_curate_e2e(spark, sf_dir):
    """The ENTIRE curation pipeline under one oracle: pipeline.curate
    (validate → quality gate ≥ 0.55 → exact dedup → MinHash-LSH +
    exact-verify pairs at J ≥ 0.8 → connected components → keep one
    per cluster) over the seeded dup corpus; output = the kept doc
    ids. The DuckDB twin recomputes every stage (validity filter,
    quality formula, md5 keep-min window, all-pairs exact Jaccard,
    recursive-CTE transitive closure), so stage ORDER and the
    composition itself are value-hashed — not just each operator in
    isolation. Each stage provably bites on this corpus: the seeded
    +10000 copies die at exact dedup, ~16% of docs die at the quality
    gate, and 25 natural J≥0.8 pairs drive cluster drops."""
    from zoi_spark import pipeline

    d = _dup_docs(spark, sf_dir).select("doc_id", "text")
    schema = z.fields({"doc_id": z.integer().non_negative(),
                       "text": z.string(min=1)})
    res = pipeline.curate(d, schema, id_col="doc_id",
                          min_quality=0.55,
                          near_dup_threshold=0.8,
                          minhash_bands=16)
    return res.kept.select("doc_id")


def q_dedup_doc_lines(spark, sf_dir):
    """Within-document repeated-line removal
    (text.strip_repeated_lines): every line keeps its first occurrence
    — the in-doc complement of corpus-level boilerplate stripping, one
    fused array_distinct projection. md5 of the rebuilt text proves
    byte-exact first-occurrence order."""
    lined = _lined_docs(spark, sf_dir)
    out = text.strip_repeated_lines(lined)
    return out.select("doc_id", "n_lines", "n_kept",
                      F.md5("clean_text").alias("clean_md5"))


def q_url_latest_dedup(spark, sf_dir):
    """Recrawl handling (urls.url_dedup_latest): the same five seeded
    canonical-url decorations as url_canonical_dedup, plus a
    deterministic crawl timestamp per row — keep the LATEST fetch per
    canonical form (ties → min id) instead of first-seen."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(50)).cast("string")
    base = F.concat(F.lit("http://host"), g, F.lit(".example.com/p/"), g)
    variants = [
        base,
        F.concat(F.lit("HTTP://HOST"), g, F.lit(".EXAMPLE.COM/p/"), g),
        F.concat(F.lit("http://host"), g, F.lit(".example.com:80/p/"), g),
        F.concat(base, F.lit("?utm_source=x&utm_campaign=y")),
        F.concat(base, F.lit("#frag")),
    ]
    sel = F.pmod("doc_id", F.lit(5))
    url = F.when(sel == 0, variants[0])
    for i, v in enumerate(variants[1:], 1):
        url = url.when(sel == i, v)
    seeded = d.select(
        "doc_id", url.alias("url"),
        F.timestamp_seconds(
            F.lit(1577836800)
            + F.pmod(F.col("doc_id") * 7919, F.lit(100000))).alias("ts"))
    return (urls.url_dedup_latest(seeded, url_col="url", ts_col="ts",
                                  id_col="doc_id")
            .select("doc_id"))


def q_token_budget_fill(spark, sf_dir):
    """Training-mixture assembly (sampling.token_budget_fill): walk
    each lang stratum in doc_id order and keep documents while the
    running whitespace-token total stays ≤ 5000 — one running-sum
    window per stratum, the cumulative column itself value-hashed."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    dd = d.select("doc_id", "lang",
                  text.token_count(F.col("text")).alias("n_tokens"))
    out = sampling.token_budget_fill(dd, id_col="doc_id",
                                     weight_col="n_tokens",
                                     budget=5000, stratum_col="lang")
    return out.select("doc_id", "lang", "cum_tokens")


def q_cluster_best_rep(spark, sf_dir):
    """Quality-based near-dup retention (dedup.cluster_representatives):
    per duplicate cluster keep the argmax quality_score member (ties →
    min id) instead of the smallest id — the retention policy real
    pipelines run. Chain: LSH pairs at J ≥ 0.8 → connected components
    → per-cluster argmax window; the oracle recomputes clusters via
    the recursive-CTE closure and the identical quality formula."""
    d = _dup_docs(spark, sf_dir)
    pairs = dedup.minhash_dedup_pairs(d, threshold=0.8, num_hashes=64,
                                      bands=16)
    clusters = dedup.duplicate_clusters(pairs)
    scored = d.select("doc_id",
                      text.quality_score(F.col("text")).alias("q"))
    reps = dedup.cluster_representatives(clusters, scored, score_col="q")
    return reps.select("cluster_id", "keep_id", "q")


def q_stream_dedup_docs(spark, sf_dir):
    """STREAMING content dedup in the oracle gate
    (streaming.dedup_stream → dropDuplicatesWithinWatermark on the
    content fingerprint): the seeded dup corpus staged as a landing
    file, streamed with an availableNow trigger into a parquet sink.
    WHICH twin of a duplicate pair survives depends on per-key arrival
    order (racy if the scan ever splits the file across tasks), but
    the survivor's CONTENT is identical by construction — so the gated
    value is the kept rows' content fingerprints, order-invariant and
    equal to the distinct fingerprint set of the corpus. Exactly-once
    + dedup-happened are both under the value hash (520 rows → 500
    fingerprints, each exactly once)."""
    import shutil
    import tempfile

    from zoi_spark import streaming

    out_dir = os.path.join(tempfile.gettempdir(), "zoi_stream_dedup_gate")
    shutil.rmtree(out_dir, ignore_errors=True)
    in_dir = os.path.join(out_dir, "in")
    os.makedirs(in_dir)
    corpus = (_dup_docs(spark, sf_dir)
              .select("doc_id", "text",
                      F.timestamp_seconds(
                          F.lit(1577836800) + F.pmod("doc_id", F.lit(600)))
                      .alias("warc_ts"))
              .coalesce(1).sortWithinPartitions("doc_id"))
    corpus.write.mode("overwrite").parquet(in_dir)
    sdf = spark.readStream.schema(corpus.schema).parquet(in_dir)
    deduped = streaming.dedup_stream(sdf, id_col="doc_id",
                                     ts_col="warc_ts", text_col="text",
                                     watermark="1 hour")
    q = (deduped.select(
            text.fingerprint(F.col("text")).alias("fp")).writeStream
         .format("parquet")
         .option("path", f"{out_dir}/data")
         .option("checkpointLocation", f"{out_dir}/ckpt")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.read.parquet(f"{out_dir}/data").select("fp")


def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization (tablechecks.sessionize): per user, a
    >30-minute silence starts a new session; the per-session ledger
    (user, session ordinal, event count, first event id) is
    value-hashed, so the lag/flag/running-sum window chain is fully
    oracle-checked. Ties broken by event_id — deterministic under any
    physical row order."""
    ev = _read(spark, sf_dir, "events")
    s = tablechecks.sessionize(ev, user_col="user_id", ts_col="ts",
                               gap_minutes=30, order_col="event_id")
    return (s.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("event_id").alias("first_event")))


def q_ks_drift_len(spark, sf_dir):
    """Binned two-sample KS drift (tablechecks.ks_drift_binned) on the
    doc-length distribution, even vs odd doc ids — the tail-sensitive
    complement of the KL/PSI drift rows, same bucketing as
    drift_len_kl; one hash aggregation + a window over ≤10 bucket
    rows."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.ks_drift_binned(
        d, "n_chars", split=F.col("doc_id") % 2 == 0,
        bucket_width=100.0, n_buckets=10)


def q_temperature_weights(spark, sf_dir):
    """Multinomial temperature re-weighting per language
    (tablechecks.temperature_weights, the mBERT/XLM-R p^tau scheme):
    stratum mass → q = p^tau / Σp^tau → per-doc boost factor; one hash
    aggregation, the power/normalize math on the tiny stratum table.
    All five columns (n, p, q, boost) land under the value hash."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.temperature_weights(d, stratum_col="lang",
                                           tau=0.7)


def q_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (sampling.dsir_logweights; Xie et
    al. 2023): target = the lang='en' slice, raw = the whole corpus;
    hashed-bigram (md5 mod 256) Laplace multinomials, per-doc
    Σ count·log-ratio. The DuckDB twin re-derives the normalize →
    bigram → bucket → smoothed-log-ratio → per-doc sum chain from
    scratch, so estimator math AND feature hashing are value-checked.
    Top 40 by (weight desc, id) keeps the gate row-stable."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    w = sampling.dsir_logweights(
        d, d.where(F.col("lang") == "en"),
        text_col="text", id_col="doc_id", buckets=256)
    return (w.orderBy(F.col("dsir_logweight").desc(), F.col("doc_id"))
            .limit(40))


def q_host_pagerank(spark, sf_dir):
    """Host-graph PageRank (graph.pagerank; Page et al. 1999) — the
    link-centrality quality prior of web intake (Common Crawl ships
    host-level ranks computed exactly this way). The host graph is
    derived deterministically: doc d on host d%40 links to hosts
    (7d+11)%40 and (13d+5)%40; hosts 35-39 never source an edge, so
    the dangling-mass redistribution path is exercised, not just
    claimed. 4 power-iteration rounds, damping 0.85; the DuckDB twin
    unrolls the same 4 rounds as a CTE chain, so the update rule —
    teleport + damped in-contributions + uniform dangling share — is
    value-checked to 1e-6."""
    from zoi_spark import graph

    d = _read(spark, sf_dir, "documents").select("doc_id")
    linking = d.where(F.pmod("doc_id", F.lit(40)) < 35)
    src = F.pmod("doc_id", F.lit(40))
    edges = linking.select(
        src.alias("src"),
        F.pmod(F.col("doc_id") * 7 + 11, F.lit(40)).alias("dst")
    ).unionAll(linking.select(
        src.alias("src"),
        F.pmod(F.col("doc_id") * 13 + 5, F.lit(40)).alias("dst")))
    pr = graph.pagerank(edges, iters=4, damping=0.85)
    return pr.select(F.col("node").alias("host"),
                     F.round("rank", 6).alias("pagerank")).orderBy("host")


def q_bloom_decontam(spark, sf_dir):
    """Bloom-filter decontamination screen (text.bloom_decontamination):
    same probe set as `ngram_decontam` (three 20-token windows lifted
    from the corpus + one synthetic miss), but membership goes through
    k=4 md5 bit positions in an m=256 filter — m deliberately TINY at
    this SF so false positives actually occur and the oracle checks
    the Bloom semantics (all-k-bits-set), not just exact overlap. The
    corpus side never shuffles on the gram key: the bit table is
    broadcast. Returns per-doc totals for contaminated docs only,
    capped to the top 40 by (hits desc, id) for row stability."""
    d = _read(spark, sf_dir, "documents")
    toks = F.split(text.normalize_text(F.col("text")), " ")
    probes = (d.where(F.col("doc_id").isin(7, 42, 203))
              .select(F.concat_ws(" ", F.slice(toks, 6, 20))
                      .alias("probe_text")))
    out = text.bloom_decontamination(d, probes, n=13, m=256, k=4)
    return (out.where(F.col("bloom_contaminated"))
            .orderBy(F.col("n_hit_grams").desc(), F.col("doc_id"))
            .limit(40))


def q_quality_linear(spark, sf_dir):
    """Hashed-feature linear quality classifier
    (text.linear_quality_score): the fastText/CCNet model-based
    quality stage with a frozen md5-derived weight lattice so the
    DuckDB twin re-derives every score — feature hashing (md5 mod
    1024, real collisions), bucket→weight lookup, mean-pool, sigmoid —
    bit-for-bit. Pure projection: no explode, no join, no shuffle.
    Histogram of score deciles per lang keeps the gate row-stable
    while hashing every document's score."""
    d = _read(spark, sf_dir, "documents")
    s = text.linear_quality_score(d)
    withlang = s.join(d.select("doc_id", "lang"), "doc_id")
    decile = F.least(F.floor(F.col("qlin_score") * 10), F.lit(9))
    return (withlang.where(F.col("qlin_score").isNotNull())
            .groupBy("lang", decile.cast("int").alias("decile"))
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg("qlin_score"), 6).alias("avg_score"))
            .orderBy("lang", "decile"))


def q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity split (text.perplexity_buckets;
    Wenzek et al. 2020 §4.3): per-language ntile(3) over the unigram
    surprisal proxy, ties broken on doc_id. Aggregated per (lang,
    bucket) — the counts pin the ntile boundaries exactly and the
    surprisal means value-check the scoring chain underneath."""
    d = _read(spark, sf_dir, "documents")
    b = text.perplexity_buckets(d, n_buckets=3)
    return (b.groupBy("lang", "ppl_bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg("mean_surprisal"), 6)
                 .alias("avg_surprisal"))
            .orderBy("lang", "ppl_bucket"))


def q_crosscorpus_join(spark, sf_dir):
    """Cross-corpus fuzzy join (dedup.minhash_lsh_join): fuzzy
    benchmark decontamination — the 'benchmark' side is the first 3/4
    of the tokens of every 97th document (a near-copy at Jaccard
    ≈ 0.75 of its source, plus any seeded duplicates of that source),
    LSH-met on shared band buckets and verified at Jaccard ≥ 0.6.
    bands=32 over 64 hashes (r=2 rows/band) keeps per-pair miss
    probability ≤ (1-0.6²)^32 ≈ 6e-7 — across the ≤ dozens of true
    pairs at gate SFs the LSH layer is lossless, so the DuckDB twin is
    the full cross-corpus shingle Jaccard with the same ROUNDED
    threshold."""
    from zoi_spark import dedup

    d = _read(spark, sf_dir, "documents")
    toks = F.split(text.normalize_text(F.col("text")), " ")
    cut = F.greatest(F.floor(F.size(toks) * 3 / 4).cast("int"), F.lit(1))
    bench = (d.where(F.pmod("doc_id", F.lit(97)) == 3)
             .select(F.col("doc_id").alias("probe_id"),
                     F.concat_ws(" ", F.slice(toks, 1, cut))
                     .alias("probe_text")))
    out = dedup.minhash_lsh_join(d, bench, threshold=0.6,
                                 num_hashes=64, bands=32, shingle_n=3)
    return out.orderBy("doc_id", "probe_id")


# script-sample literals shared VERBATIM by q_script_mix and its DuckDB
# twin (a drifted hand-copy would silently break the byte-level counts)
_SCRIPT_SAMPLES = {
    1: "привет мир слова большой текст",
    2: "漢字テスト中文の文章です",
    3: "مرحبا بالعالم هذا نص",
    4: "12345 67890 2024",
}


def q_script_mix(spark, sf_dir):
    """Unicode script-mix QC (text.script_profile): every 5th document
    is replaced by a pure-Cyrillic / CJK / Arabic / digit sample, so
    dominant-script election, per-script counts, and latin_fraction
    all vary and every branch of the tie-break CASE fires. Aggregated
    per (lang, dominant_script); the DuckDB twin recomputes the counts
    from the SAME range literals (interpolated from SCRIPT_RANGES, not
    hand-copied)."""
    d = _read(spark, sf_dir, "documents")
    v = F.pmod("doc_id", F.lit(5))
    body = F.col("text")
    for k, s in _SCRIPT_SAMPLES.items():
        body = F.when(v == k, F.lit(s)).otherwise(body)
    seeded = d.select("doc_id", "lang", body.alias("text"))
    p = text.script_profile(seeded)
    withlang = p.join(seeded.select("doc_id", "lang"), "doc_id")
    return (withlang.groupBy("lang", "dominant_script")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_cyrillic").alias("cyrillic_chars"),
                 F.sum("n_cjk").alias("cjk_chars"),
                 F.round(F.avg("latin_fraction"), 6)
                 .alias("avg_latin_frac"))
            .orderBy("lang", "dominant_script"))


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_corpus_split(spark, sf_dir):
    """Deterministic train/val/test split (sampling.hash_split): md5
    fractions into cumulative-weight intervals, a pure projection with
    no shuffle — the leakage-free split a training pipeline derives
    once and keeps stable across recrawls. The DuckDB twin re-derives
    the fraction AND compares against boundary literals interpolated
    from sampling.split_boundaries (the same float arithmetic, so the
    0.8+0.1 ulp artifact can never diverge)."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    s = sampling.hash_split(d, id_col="doc_id", weights=_SPLIT_WEIGHTS)
    return (s.groupBy("split", "lang")
            .agg(F.count("*").alias("n_docs"))
            .orderBy("split", "lang"))


def q_host_reputation(spark, sf_dir):
    """Host-level reputation (urls.host_reputation): per-host quality
    aggregation over the heuristic quality score, hosts derived as
    doc_id mod 50; the 0.605 threshold sits at the observed per-host
    median so BOTH flag branches fire at both gate SFs. One hash
    aggregation on the host key — the FineWeb-style wholesale host
    blocklist pass."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents")
    scored = d.select(
        F.concat(F.lit("host"), F.pmod("doc_id", F.lit(50)).cast("string"))
        .alias("host"),
        text.quality_score(F.col("text")).alias("quality"))
    return (urls.host_reputation(scored, min_docs=5,
                                 min_avg_quality=0.605)
            .orderBy("host"))


def q_mojibake_scan(spark, sf_dir):
    """Encoding-artifact scan (text.mojibake_stats; the detection half
    of ftfy's fix_encoding heuristics): documents are deterministically
    corrupted — every 7th gets 1-5 appended ' Ã©' double-decode
    artifacts, every 11th a U+FFFD replacement char, every 13th a
    leading in-body BOM — so every marker class and both flag branches
    fire. Pure replace-and-measure projection, no regex; aggregated
    per (lang, mojibake_flagged) with marker-class sums so the hash
    covers every per-doc count."""
    d = _read(spark, sf_dir, "documents")
    t = F.col("text")
    t = F.when(F.pmod("doc_id", F.lit(7)) == 2,
               F.concat(t, F.repeat(
                   F.lit(" Ã©"),
                   (F.pmod("doc_id", F.lit(5)) + 1).cast("int")))
               ).otherwise(t)
    t = F.when(F.pmod("doc_id", F.lit(11)) == 3,
               F.concat(t, F.lit(" �"))).otherwise(t)
    t = F.when(F.pmod("doc_id", F.lit(13)) == 4,
               F.concat(F.lit("﻿"), t)).otherwise(t)
    seeded = d.select("doc_id", "lang", t.alias("text"))
    m = text.mojibake_stats(seeded, max_ratio=0.004)
    withlang = m.join(seeded.select("doc_id", "lang"), "doc_id")
    return (withlang.groupBy("lang", "mojibake_flagged")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("mojibake_chars").alias("artifact_chars"),
                 F.sum("n_utf8_latin1").alias("utf8_latin1_hits"),
                 F.sum("n_replacement").alias("replacement_hits"),
                 F.sum("n_stray_bom").alias("bom_hits"),
                 F.round(F.avg("mojibake_ratio"), 6).alias("avg_ratio"))
            .orderBy("lang", "mojibake_flagged"))


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_numeric_corr(spark, sf_dir):
    """Cross-column correlation profile (tablechecks.correlation_stats):
    Pearson corr + sample covariance for all six lineitem pairs in ONE
    aggregation pass — the co-variation drift check next to the
    per-column fused stats. corr is rounded at 6 (it is scale-free);
    covariance at 2 (its magnitude rides the price scale, where the
    engines' summation orders differ in the last few ulps)."""
    from zoi_spark import tablechecks

    li = _read(spark, sf_dir, "lineitem")
    out = tablechecks.correlation_stats(li, _CORR_COLS, round_to=6)
    return (out.select("col_a", "col_b", "corr",
                       F.round("covar", 2).alias("covar"))
            .orderBy("col_a", "col_b"))


def q_bigram_surprisal(spark, sf_dir):
    """Bigram-LM surprisal (text.bigram_logprob): add-0.5-smoothed
    corpus bigram model, one order up from `unigram_surprisal` — the
    KenLM/CCNet conditional-probability construction with every count
    (bigram, context, vocabulary size) re-derived by the DuckDB twin.
    Top 20 by mean surprisal (the noise tail a perplexity gate trims),
    rounded-value ordering with doc_id tiebreak for row stability."""
    d = _read(spark, sf_dir, "documents")
    s = text.bigram_logprob(d, k=0.5)
    return (s.orderBy(F.col("mean_bigram_surprisal").desc(), "doc_id")
            .limit(20))


def q_containment_pairs(spark, sf_dir):
    """Directed shingle containment (dedup.containment_pairs; Broder
    1997): the corpus is augmented with derived excerpt docs — the
    first 3/5 of the tokens of every 89th document under shifted ids —
    so true subset relations exist: excerpt→source containment is 1.0
    (and clears the 0.9 gate) while source→excerpt is ~0.6 (and is cut),
    exercising the asymmetry that distinguishes containment from
    Jaccard. max_shingle_docs=50 applies the boilerplate-shingle cap on
    both engines."""
    from zoi_spark import dedup

    d = _read(spark, sf_dir, "documents")
    toks = F.split(text.normalize_text(F.col("text")), " ")
    cut = F.greatest(F.floor(F.size(toks) * 3 / 5).cast("int"), F.lit(1))
    excerpts = (d.where(F.pmod("doc_id", F.lit(89)) == 4)
                .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                        F.concat_ws(" ", F.slice(toks, 1, cut))
                        .alias("text")))
    corpus = d.select("doc_id", "text").unionAll(excerpts)
    out = dedup.containment_pairs(corpus, threshold=0.9, shingle_n=3,
                                  max_shingle_docs=50)
    return out.orderBy("id_a", "id_b")


def q_host_hits(spark, sf_dir):
    """Host-graph HITS (graph.hits; Kleinberg 1999): hubs/authorities
    over a second deterministic host graph — doc d on host d%37 links
    to hosts (11d+3)%37 and (5d+17)%37 when d%37 < 33, so hosts 33-36
    receive links but never source them (hub 0, the link-farm
    asymmetry HITS exists to expose). 4 max-normalized rounds; the
    DuckDB twin unrolls the same 4 rounds (two join-aggregate halves +
    two scalar maxima per round) as a CTE chain, value-checking the
    whole mutual-reinforcement recursion to 1e-6."""
    from zoi_spark import graph

    d = _read(spark, sf_dir, "documents").select("doc_id")
    linking = d.where(F.pmod("doc_id", F.lit(37)) < 33)
    src = F.pmod("doc_id", F.lit(37))
    edges = linking.select(
        src.alias("src"),
        F.pmod(F.col("doc_id") * 11 + 3, F.lit(37)).alias("dst")
    ).unionAll(linking.select(
        src.alias("src"),
        F.pmod(F.col("doc_id") * 5 + 17, F.lit(37)).alias("dst")))
    h = graph.hits(edges, iters=4)
    return (h.select(F.col("node").alias("host"),
                     F.round("hub", 6).alias("hub"),
                     F.round("authority", 6).alias("authority"))
            .orderBy("host"))


def q_tfidf_terms(spark, sf_dir):
    """Per-document top-5 TF-IDF keywords (text.tfidf_top_terms;
    Salton & Buckley 1988, smoothed idf per scikit-learn's default):
    the keyword-extraction pass of an indexing/clustering pipeline.
    Rank within each doc uses the ROUNDED score (ties → term ASC) so
    the k-th/k+1-th cut is engine-independent; the DuckDB twin
    re-derives term counts, document frequencies, doc lengths and N
    from the same normalized token stream."""
    d = _read(spark, sf_dir, "documents")
    out = text.tfidf_top_terms(d, k=5)
    return out.orderBy("doc_id", "rank")


def q_paragraph_dedup(spark, sf_dir):
    """Corpus-wide exact paragraph dedup (text.dedup_paragraphs;
    CCNet Wenzek et al. 2020 §4.2 — every duplicated paragraph keeps
    only its globally FIRST (doc_id, position) occurrence). Documents
    are re-composed into multi-paragraph pages: a 3-variant shared
    boilerplate header, the doc's own 8-token lead, a blank paragraph
    on every 5th doc (blank = layout, EXEMPT from dedup), an in-doc
    repeat of the lead on every 4th doc (first-occurrence logic must
    fire WITHIN a doc too), and a footer shared by all docs — so
    cross-doc, in-doc, exempt and sole-survivor branches all fire."""
    d = _read(spark, sf_dir, "documents")
    own = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8))
    boiler = F.concat(F.lit("subscribe to newsletter "),
                      F.pmod("doc_id", F.lit(3)).cast("string"))
    blank = F.when(F.pmod("doc_id", F.lit(5)) == 2, F.lit(""))
    rep = F.when(F.pmod("doc_id", F.lit(4)) == 1, own)
    footer = F.lit("copyright 2026 example corp")
    seeded = d.select(
        "doc_id",
        F.concat_ws("\n", boiler, own, blank, rep, footer).alias("text"))
    out = text.dedup_paragraphs(seeded)
    return (out.select("doc_id", "n_paragraphs", "n_kept", "clean_text")
            .orderBy("doc_id"))


def q_pii_redact(spark, sf_dir):
    """PII redaction (text.pii_redact — the scrub pass behind the
    pii_scan flags): seeded emails / IPv4s / phone numbers are replaced
    with <EMAIL>/<IP>/<PHONE> tokens and counted on the original text;
    the value hash covers the full redacted string of every affected
    document, so substitution spans — not just counts — are checked."""
    d = _read(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.when(F.pmod("doc_id", F.lit(11)) == 0,
               F.lit(" contact bob@example.com or sue@test.org")
               ).otherwise(F.lit("")),
        F.when(F.pmod("doc_id", F.lit(13)) == 0,
               F.lit(" server 192.168.1.1 up")).otherwise(F.lit("")),
        F.when(F.pmod("doc_id", F.lit(17)) == 0,
               F.lit(" call +1 (555) 123-4567")).otherwise(F.lit("")))
    r = text.pii_redact(d.select("doc_id", seeded.alias("text")))
    return (r.where((F.col("n_pii_email") + F.col("n_pii_ipv4")
                     + F.col("n_pii_phone")) > 0)
            .select("doc_id", "n_pii_email", "n_pii_ipv4", "n_pii_phone",
                    "redacted_text")
            .orderBy("doc_id"))


def q_zipf_profile(spark, sf_dir):
    """Corpus Zipf fit (text.zipf_profile): OLS slope + r² of ln(freq)
    on ln(rank) over the top-1000 terms, one summary row — the corpus
    forensics gate (natural text ≈ −1; templates flatten). The DuckDB
    twin recomputes the vocabulary, the (count DESC, term ASC) top-k
    and the covar_pop/var_pop regression to 6 decimals."""
    d = _read(spark, sf_dir, "documents")
    return text.zipf_profile(d, max_rank=1000)


_BLOCKLIST = ["tracker.example", "ads.example.com", "example.com",
              "spam.test"]


def q_domain_blocklist(spark, sf_dir):
    """Registrable-domain blocklist intake gate
    (urls.domain_blocklist_flags — the UT1/C4-style domain filter):
    six seeded host shapes per doc — exact match (uppercased in the
    URL to check case folding), subdomain inheriting the verdict, a
    sibling look-alike that must stay clean, a second exact match, a
    deep host matching TWO entries (deepest/longest must win), and a
    clean host. blocked_domain carries the winning entry under the
    value hash."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(6))
    hosts = ["TRACKER.example", "ads.tracker.example",
             "nottracker.example", "spam.test",
             "deep.sub.ads.example.com", "clean.org"]
    url = F.when(g == 0, F.lit(f"http://{hosts[0]}/p/0"))
    for i, h in enumerate(hosts[1:], 1):
        url = url.when(g == i, F.lit(f"http://{h}/p/{i}"))
    seeded = d.select("doc_id", url.alias("url"))
    out = urls.domain_blocklist_flags(seeded, _BLOCKLIST)
    return (out.select("doc_id", "host", "blocked_domain", "blocked")
            .orderBy("doc_id"))


def q_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate (text.oov_rate): per-doc fraction of
    token occurrences outside the corpus top-20 vocabulary — the
    tokenizer-prep gate. V=20 sits inside the synthetic corpus's ~31
    word vocabulary so both in- and out-of-vocab branches carry mass,
    and the V-th/V+1-th tie (count DESC, token ASC) is exercised."""
    d = _read(spark, sf_dir, "documents")
    out = text.oov_rate(d, vocab_size=20)
    return out.orderBy("doc_id")


def q_punct_normalize(spark, sf_dir):
    """Unicode punctuation unification (text.normalize_punct): every
    3rd doc gets curly quotes/em-dash/ellipsis appended, every 7th
    NBSP + zero-width chars — the normalized text (substitution AND
    deletion semantics of translate) plus a changed flag go under the
    value hash; the DuckDB twin runs the identical translate+replace
    chain."""
    d = _read(spark, sf_dir, "documents")
    t = F.col("text")
    t = F.when(F.pmod("doc_id", F.lit(3)) == 1,
               F.concat(t, F.lit(" “it’s” — fine…"))).otherwise(t)
    t = F.when(F.pmod("doc_id", F.lit(7)) == 5,
               F.concat(t, F.lit(" a b​c﻿d"))).otherwise(t)
    seeded = d.select("doc_id", t.alias("text"))
    norm = text.normalize_punct(F.col("text"))
    return (seeded.select("doc_id", norm.alias("norm_text"),
                          (norm != F.col("text")).alias("changed"))
            .orderBy("doc_id"))


def q_path_templates(spark, sf_dir):
    """Crawler-trap template mining (urls.path_templates): per-host
    '/item/{N}/view' templates accumulate ~20 distinct urls each and
    cross the min_urls=5 trap line, while '/about' (repeated by many
    docs but ONE distinct url) stays clean — distinct-url counting,
    digit-run collapsing and the threshold all under the hash."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(20)).cast("string")
    path = F.when(F.pmod("doc_id", F.lit(10)) < 2, F.lit("/about")
                  ).otherwise(F.concat(F.lit("/item/"),
                                       F.col("doc_id").cast("string"),
                                       F.lit("/view")))
    seeded = d.select(
        "doc_id",
        F.concat(F.lit("http://host"), g, F.lit(".example"), path)
        .alias("url"))
    out = urls.path_templates(seeded, min_urls=5)
    return out.orderBy("host", "path_template")


def q_sq_ann(spark, sf_dir):
    """Int8 scalar-quantized ANN (similarity.with_quantized +
    quantized_topk; the FAISS SQ8 storage path): cosine top-5 over
    quantized codes for query vectors vec_id<3. The per-vector scales
    cancel in cosine, so the whole score is integer dot products plus
    one sqrt/divide — bit-reproducible across engines, making this the
    rare ANN oracle with NO float-fuzz caveat (the DuckDB twin
    re-derives scale, codes and score from the raw floats)."""
    from zoi_spark import similarity

    emb = _read(spark, sf_dir, "embeddings")
    qz = similarity.with_quantized(emb)
    queries = (qz.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "q"))
    out = similarity.quantized_topk(qz, queries, k=5)
    return (out.select("query_id", "rank", "vec_id", "q_cosine")
            .orderBy("query_id", "rank"))


def q_js_drift(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between per-source lang
    distributions (tablechecks.js_divergence_pairs) — the symmetric,
    disjoint-support-safe drift metric next to KL/PSI/KS. All 190
    source pairs; the DuckDB twin recomputes the shared-mass
    decomposition (inner join + complement terms, no full outer)."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents")
    out = tablechecks.js_divergence_pairs(
        d, group_col="source", value_col="lang")
    return out.orderBy("g_a", "g_b")


def q_token_windows(spark, sf_dir):
    """Sliding-context chunking (text.token_windows): window 32,
    stride 16 over every document — win_idx enumeration, the final
    ≤32-token tail window and the exact token slices all re-derived
    by the DuckDB twin (range-with-step + inclusive list slicing)."""
    d = _read(spark, sf_dir, "documents")
    out = text.token_windows(d, window=32, stride=16)
    return out.orderBy("doc_id", "win_idx")


def q_dup_paras(spark, sf_dir):
    """Within-doc duplicate-paragraph fractions
    (text.dup_paragraph_fraction; MassiveText Table A1's paragraph
    repetition signals): docs are recomposed as lead/meta/lead-again
    (every 2nd doc — an in-doc dup), a blank on every 7th (ignored),
    so count and char fractions both fire. Pure array projection in
    Spark; list_distinct algebra in the twin."""
    d = _read(spark, sf_dir, "documents")
    own = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8))
    meta = F.concat(F.lit("meta "), F.pmod("doc_id", F.lit(5)).cast("string"))
    rep = F.when(F.pmod("doc_id", F.lit(2)) == 0, own)
    blank = F.when(F.pmod("doc_id", F.lit(7)) == 3, F.lit(""))
    seeded = d.select(
        "doc_id",
        F.concat_ws("\n", own, meta, rep, blank).alias("text"))
    out = text.dup_paragraph_fraction(seeded)
    return (out.select("doc_id", "n_paras", "n_dup_paras",
                       "dup_para_frac", "dup_para_char_frac")
            .orderBy("doc_id"))


def q_centroid_drift(spark, sf_dir):
    """Embedding centroid drift (similarity.centroid_drift): pairwise
    cosine between the 10 per-label mean vectors — component means
    rounded to the 9-decimal grid (the refine_centroids precedent)
    before the cosine so both engines rank from identical centroids."""
    from zoi_spark import similarity

    emb = _read(spark, sf_dir, "embeddings")
    out = similarity.centroid_drift(emb, group_col="label")
    return out.orderBy("g_a", "g_b")


def q_recency_weights(spark, sf_dir):
    """Freshness re-weighting (sampling.recency_weights): half-life 7
    days from the corpus-max event timestamp, summed per event_type —
    sub-second timestamp deltas included (cast-to-double, not
    unix_timestamp truncation), which the DuckDB twin's epoch()
    reproduces exactly."""
    from zoi_spark import sampling

    ev = _read(spark, sf_dir, "events")
    w = sampling.recency_weights(ev, ts_col="ts", half_life_days=7.0)
    return (w.groupBy("event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("recency_weight"), 4).alias("sum_weight"),
                 F.round(F.min("recency_weight"), 6).alias("min_weight"),
                 F.round(F.max("recency_weight"), 6).alias("max_weight"))
            .orderBy("event_type"))


def q_degree_stats(spark, sf_dir):
    """Host-graph degree/reciprocity profile (graph.degree_stats) over
    the q_host_hits graph (d%37 < 33 sources two targets): hosts 33-36
    have out_deg 0 (sink asymmetry), host 5's second edge is a
    self-loop (excluded), and the 9↔28 reciprocal pair makes
    reciprocity fire — all re-derived by the twin's distinct-edge
    algebra."""
    from zoi_spark import graph

    d = _read(spark, sf_dir, "documents").select("doc_id")
    linking = d.where(F.pmod("doc_id", F.lit(37)) < 33)
    src = F.pmod("doc_id", F.lit(37))
    edges = linking.select(
        src.alias("src"),
        F.pmod(F.col("doc_id") * 11 + 3, F.lit(37)).alias("dst")
    ).unionAll(linking.select(
        src.alias("src"),
        F.pmod(F.col("doc_id") * 5 + 17, F.lit(37)).alias("dst")))
    return graph.degree_stats(edges).orderBy("node")


def q_heaps_fit(spark, sf_dir):
    """Heaps'-law vocabulary growth (text.heaps_profile): OLS fit of
    ln(V) on ln(tokens) over 20 arithmetic doc-id prefixes — both the
    cumulative-vocab trick (first-containing-doc ≤ bound) and the
    regression re-derived by the twin."""
    d = _read(spark, sf_dir, "documents")
    return text.heaps_profile(d, n_points=20)


def q_link_graph(spark, sf_dir):
    """Outlink extraction (text.extract_links): documents seeded with
    anchors in all three href quoting syntaxes (double, single, bare —
    cycling by doc_id) plus a second link on every 4th doc; link
    order, cleanup of the attribute prefix/quotes and the multi-link
    enumeration all land under the value hash."""
    d = _read(spark, sf_dir, "documents")
    g = F.pmod("doc_id", F.lit(30)).cast("string")
    tgt = F.concat(F.lit("http://host"), g, F.lit(".example/p/"), g)
    sel = F.pmod("doc_id", F.lit(3))
    a = F.when(sel == 0,
               F.concat(F.lit(' <a href="'), tgt, F.lit('">x</a>')))
    a = a.when(sel == 1,
               F.concat(F.lit(" <a HREF='"), tgt, F.lit("'>x</a>")))
    a = a.otherwise(F.concat(F.lit(" <a href="), tgt, F.lit(">x</a>")))
    extra = F.when(F.pmod("doc_id", F.lit(4)) == 1,
                   F.concat(F.lit(' <a href="http://extra'), g,
                            F.lit('.example/q">y</a>'))
                   ).otherwise(F.lit(""))
    seeded = d.select(
        "doc_id", F.concat(F.col("text"), a, extra).alias("text"))
    out = text.extract_links(seeded)
    return out.orderBy("doc_id", "link_idx")


def q_pmi_bigrams(spark, sf_dir):
    """PMI collocations (text.pmi_collocations; word2vec's phrase
    pass): top-40 adjacent-pair PMI with a min-count-5 floor — counts,
    the shared bigram-slot denominator and the rounded-score ordering
    all re-derived by the twin."""
    d = _read(spark, sf_dir, "documents")
    return text.pmi_collocations(d, min_count=5, top_k=40)


def q_host_concentration(spark, sf_dir):
    """Host concentration (urls.host_concentration): half the corpus
    is pinned to one mega-host (doc_id%4 < 2) and the rest spread over
    25 — HHI, host/doc totals and the top-5 share in one summary row,
    with NULL-host rows (every 31st doc) excluded on both engines."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    host = F.when(F.pmod("doc_id", F.lit(31)) == 7, F.lit(None))
    host = host.when(F.pmod("doc_id", F.lit(4)) < 2,
                     F.lit("bighost.example"))
    host = host.otherwise(F.concat(
        F.lit("host"), F.pmod("doc_id", F.lit(25)).cast("string"),
        F.lit(".example")))
    seeded = d.select("doc_id", host.alias("host"))
    return urls.host_concentration(seeded, top_k=5)


def q_ann_recall(spark, sf_dir):
    """ANN quality evaluation (similarity.recall_at_k): recall@5 of
    the int8-quantized top-k against the exact float32 brute-force
    top-k for queries vec_id<3 — the quantization-loss number an SQ8
    deployment is tuned on. The twin recomputes BOTH rankings (integer
    dot products for SQ, list_cosine_similarity for exact) and the
    hit join."""
    from zoi_spark import similarity

    emb = _read(spark, sf_dir, "embeddings")
    qz = similarity.with_quantized(emb)
    approx = similarity.quantized_topk(
        qz, qz.where(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), "q"), k=5)
    exact = similarity.brute_force_topk(
        emb, emb.where(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), "embedding"), k=5)
    out = similarity.recall_at_k(approx, exact)
    return out.orderBy("query_id")


def q_token_entropy(spark, sf_dir):
    """Token-distribution entropy + type/token ratio
    (text.token_entropy) — the compressibility proxy, computed with
    the Σc·log2(c) decomposition so one doc-keyed aggregation carries
    both n and the entropy sum; the twin re-derives the identical
    algebra."""
    d = _read(spark, sf_dir, "documents")
    return text.token_entropy(d).orderBy("doc_id")


def q_sentence_stats(spark, sf_dir):
    """Sentence-shape profile (text.sentence_stats): docs re-punctuated
    into 9-word sentences over their first 27 tokens (index-aware
    transform), every 3rd doc left WITHOUT terminal punctuation — so
    sentence counting, the per-sentence word counts, the long-sentence
    fraction (max_words=8 → only the partial tail is 'short') and the
    ends_terminal branch all fire both ways."""
    d = _read(spark, sf_dir, "documents")
    toks = F.slice(F.split(F.col("text"), " "), 1, 27)
    dotted = F.array_join(F.transform(
        toks,
        lambda x, i: F.concat(
            x, F.when((i + 1) % 9 == 0, F.lit(".")).otherwise(
                F.lit("")))), " ")
    seeded = d.select(
        "doc_id",
        F.concat(dotted,
                 F.when(F.pmod("doc_id", F.lit(3)) == 0,
                        F.lit(" trailing no punct"))
                 .otherwise(F.lit(""))).alias("text"))
    out = text.sentence_stats(seeded, max_words=8)
    return (out.select("doc_id", "n_sentences", "mean_sentence_words",
                       "frac_long_sentences", "ends_terminal")
            .orderBy("doc_id"))


def q_boiler_phrases(spark, sf_dir):
    """Boilerplate phrase battery (text.boilerplate_phrase_flags):
    four seeded chrome phrases on overlapping doc_id moduli give hit
    counts 0-4, so every per-phrase boolean and both flag branches
    land under the hash."""
    d = _read(spark, sf_dir, "documents")
    t = F.col("text")
    t = F.when(F.pmod("doc_id", F.lit(3)) == 0,
               F.concat(t, F.lit(" Subscribe to our newsletter!"))
               ).otherwise(t)
    t = F.when(F.pmod("doc_id", F.lit(4)) == 0,
               F.concat(t, F.lit(" All Rights Reserved."))).otherwise(t)
    t = F.when(F.pmod("doc_id", F.lit(5)) == 0,
               F.concat(t, F.lit(" click HERE"))).otherwise(t)
    t = F.when(F.pmod("doc_id", F.lit(6)) == 0,
               F.concat(t, F.lit(" enable JavaScript to continue"))
               ).otherwise(t)
    seeded = d.select("doc_id", t.alias("text"))
    out = text.boilerplate_phrase_flags(seeded, max_hits=2)
    return (out.select("doc_id", "bp_0", "bp_1", "bp_2", "bp_3", "bp_4",
                       "bp_5", "n_boiler_hits", "boiler_flagged")
            .orderBy("doc_id"))


def q_trigram_surprisal(spark, sf_dir):
    """Jelinek-Mercer interpolated trigram surprisal
    (text.trigram_logprob): λ=(0.6,0.3,0.1) over prefix/suffix/unigram
    slot marginals of ONE corpus trigram table — every marginal, the
    interpolation and the mean re-derived by the twin. Top 20 by mean
    surprisal, doc_id tiebreak."""
    d = _read(spark, sf_dir, "documents")
    s = text.trigram_logprob(d)
    return (s.orderBy(F.col("mean_trigram_surprisal").desc(), "doc_id")
            .limit(20))


def q_cluster_sizes(spark, sf_dir):
    """Dedup report (dedup.cluster_size_histogram): size distribution
    of the J≥0.8 near-dup components from the dedup_clusters pipeline —
    the mirrors-vs-template-farm diagnostic; the twin wraps the same
    recursive-CTE transitive closure."""
    pairs = dedup.minhash_dedup_pairs(_dup_docs(spark, sf_dir),
                                      threshold=0.8, num_hashes=64,
                                      bands=16)
    clusters = dedup.duplicate_clusters(pairs)
    out = dedup.cluster_size_histogram(clusters)
    return out.orderBy("cluster_size")


def _payload_by_variant(d, payloads):
    """(doc_id frame, [bytes]) -> (media_id, payload) with payload i
    assigned where doc_id % len(payloads) == i — the shared seeding for
    every media oracle (dhash / frames / audio / scene cuts)."""
    v = F.pmod("doc_id", F.lit(len(payloads)))
    payload = None
    for i, p in enumerate(payloads):
        expr = F.unhex(F.lit(p.hex()))
        payload = (F.when(v == i, expr) if payload is None
                   else payload.when(v == i, expr))
    return d.select(F.col("doc_id").alias("media_id"),
                    payload.alias("payload"))


def _dhash_payloads() -> list[bytes]:
    """Five deterministic BMPs with ANALYTICALLY-known dHashes: the
    three solid/half fixtures (uniform rows → dhash 0) plus a column
    checkerboard (alternating bits → 0xAAAA… = -6148914691236517206
    signed) and a strictly descending gradient (all 64 bits set → -1).
    Constants derived by hand from the 9×8 nearest-neighbor grid +
    horizontal-pair rule (multimodal.dhash_bmp docstring)."""
    import numpy as np

    from zoi_spark import multimodal

    red = np.zeros((4, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    gray = np.full((5, 5, 3), 100, dtype=np.uint8)
    half = np.zeros((2, 6, 3), dtype=np.uint8)
    half[:, 3:, :] = 255
    checker = np.zeros((8, 9, 3), dtype=np.uint8)
    checker[:, 1::2, :] = 255
    grad = np.zeros((8, 18, 3), dtype=np.uint8)
    for c in range(18):
        grad[:, c, :] = 255 - c * 14
    return [multimodal.encode_bmp(a)
            for a in (red, gray, half, checker, grad)]


def q_image_dhash(spark, sf_dir):
    """Perceptual image hashing (multimodal.image_dhash): five
    deterministic BMP variants through the REAL pure-numpy decode +
    dHash — dimensions and the exact 64-bit hashes (0 / 0 / 0 /
    0xAAAA… / all-ones) are hand-derived constants in the twin, the
    same constants-not-recomputed pattern as the other media oracles."""
    from zoi_spark import multimodal

    d = _read(spark, sf_dir, "documents").select("doc_id")
    media = _payload_by_variant(d, _dhash_payloads())
    out = multimodal.image_dhash(media)
    return (out.groupBy(F.pmod("media_id", F.lit(5)).alias("variant"))
            .agg(F.count("*").alias("n_docs"),
                 F.max("width").alias("w"), F.max("height").alias("h"),
                 F.min("dhash").alias("dhash_min"),
                 F.max("dhash").alias("dhash_max"))
            .orderBy("variant"))


def q_lpa_communities(spark, sf_dir):
    """Label-propagation communities (graph.lpa_communities; Raghavan
    2007, synchronous min-tie-break variant): two 10-host chorded
    rings joined by ONE bridge edge — connected components would merge
    them, LPA keeps the dense sides apart, which is the point. 3
    rounds; the twin unrolls the same 3 rounds (message join →
    neighbor-label counts → (count DESC, label ASC) argmax →
    isolated-node coalesce) as a CTE chain."""
    from zoi_spark import graph

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(10))
    blk = F.pmod(F.floor(F.col("doc_id") / 10), F.lit(2)) * 10
    ring = d.select((g + blk).alias("src"),
                    (F.pmod(g + 1, F.lit(10)) + blk).alias("dst"))
    chord = d.select((g + blk).alias("src"),
                     (F.pmod(g + 2, F.lit(10)) + blk).alias("dst"))
    bridge = d.where(F.pmod("doc_id", F.lit(97)) == 0).select(
        F.lit(0).cast("long").alias("src"),
        F.lit(10).cast("long").alias("dst"))
    edges = ring.unionAll(chord).unionAll(bridge)
    out = graph.lpa_communities(edges, iters=3)
    return out.orderBy("node")


def q_shuffle_shards(spark, sf_dir):
    """Deterministic training-order shuffle (sampling.shuffle_shards):
    md5 shard assignment + shard-local md5 rank — the reproducible
    (shard, shard_pos) permutation; both the hex→int shard arithmetic
    and the within-shard ordering re-derived by the twin."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents").select("doc_id")
    out = sampling.shuffle_shards(d, id_col="doc_id", n_shards=8,
                                  seed="r4")
    return out.orderBy("shard", "shard_pos")


def q_epoch_factors(spark, sf_dir):
    """Mixture-by-repetition recipe (sampling.epoch_factors; the
    LLaMA-style per-source epoch counts): targets over three of the
    five langs (the other two pass through at factor 1), ceil math and
    effective rows all re-derived by the twin."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    out = sampling.epoch_factors(
        d, stratum_col="lang",
        targets={"en": 0.5, "de": 0.2, "zh": 0.3})
    return (out.select("lang", "n_rows", "target_share",
                       "epoch_factor", "effective_rows")
            .orderBy("lang"))


def q_benford_prices(spark, sf_dir):
    """Benford first-digit forensics (tablechecks.benford_profile) over
    lineitem extended prices — string-based digit extraction (no float
    log10 edge cases), all nine digits present with observed vs
    Benford shares under the hash."""
    from zoi_spark import tablechecks

    li = _read(spark, sf_dir, "lineitem")
    out = tablechecks.benford_profile(li, "l_extendedprice")
    return out.orderBy("digit")


def q_triangle_profile(spark, sf_dir):
    """Per-node triangle counts + clustering coefficient
    (graph.triangle_stats): a 12-node circulant host graph with an
    extra irregular chord family ((7g+3) mod 12) so degrees and
    triangle counts vary across nodes — the canonical-ordering
    two-join node-iterator fully re-derived by the twin."""
    from zoi_spark import graph

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(12))
    edges = (d.select(g.alias("src"),
                      F.pmod(g + 1, F.lit(12)).alias("dst"))
             .unionAll(d.select(g.alias("src"),
                                F.pmod(g + 2, F.lit(12)).alias("dst")))
             .unionAll(d.select(g.alias("src"),
                                F.pmod(g * 7 + 3, F.lit(12))
                                .alias("dst"))))
    return graph.triangle_stats(edges).orderBy("node")


def q_lang_source_chi2(spark, sf_dir):
    """Chi-square independence of lang × source
    (tablechecks.chi2_independence): full margin cross product with
    zero-observed cells, dof and Cramér's V — one statistic row whose
    every intermediate (margins, expected counts) the twin recomputes."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.chi2_independence(d, "lang", "source")


def q_vocab_coverage(spark, sf_dir):
    """Top-V token-mass coverage curve (text.vocab_coverage) at V ∈
    {16, 256, 4096}: the tokenizer-sizing report. The Spark side cuts
    the vocabulary with a distributed TakeOrdered (orderBy+limit),
    never a corpus-wide window; the twin ranks with row_number over
    the same (freq DESC, token ASC) order."""
    d = _read(spark, sf_dir, "documents")
    return (text.vocab_coverage(d, thresholds=(16, 256, 4096))
            .orderBy("vocab_size"))


def q_source_lang_entropy(spark, sf_dir):
    """Per-source language entropy (tablechecks.group_entropy): the
    mixture-purity / spam-farm signal, computed with the single-pass
    log2(n) − Σc·log2(c)/n decomposition (no totals join) that the
    twin mirrors term by term."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.group_entropy(d, group_col="source",
                                      cat_col="lang")
            .orderBy("source"))


def q_user_gaps(spark, sf_dir):
    """Inter-arrival gap profile (tablechecks.interarrival_stats) over
    events: per-user lag gaps in seconds (NTZ ts cast through
    timestamp→double, the recency_weights-proven epoch path),
    aggregated per event type of the LATER event — bot cadence shows
    as min≈max."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.interarrival_stats(
        ev, ts_col="ts", entity_col="user_id", order_col="event_id",
        group_col="event_type").orderBy("event_type"))


def _host_graph_edges(spark, sf_dir):
    """The wave-11 host graph: a 24-ring with chords only on even
    nodes (heterogeneous degrees — assortativity needs variance) used
    by assortativity; kcore builds its own richer family."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(24))
    ring = d.select(g.alias("src"),
                    F.pmod(g + 1, F.lit(24)).alias("dst"))
    chords = (d.where(F.pmod("doc_id", F.lit(2)) == 0)
              .select(g.alias("src"),
                      F.pmod(g + 2, F.lit(24)).alias("dst")))
    return ring.unionAll(chords)


def q_assortativity(spark, sf_dir):
    """Degree assortativity (graph.degree_assortativity; Newman 2002)
    over a ring-with-even-chords host graph: exact integer moment sums
    → a bit-deterministic Pearson coefficient the twin recomputes from
    the same five sums."""
    from zoi_spark import graph

    return graph.degree_assortativity(_host_graph_edges(spark, sf_dir))


def q_kcore_profile(spark, sf_dir):
    """k-core peeling (graph.kcore, k=3, 4 unrolled rounds): the
    C12(1,2) circulant with the irregular (7g+3) chord family PLUS
    two-hop pendant chains — leaves peel in round 1, their anchors in
    round 2, the dense nucleus survives with its final in-core
    degrees. The twin unrolls the same degree→filter→semi-join rounds
    as a CTE chain."""
    from zoi_spark import graph

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(12))
    fam = [d.select(g.alias("src"),
                    F.pmod(g + 1, F.lit(12)).alias("dst")),
           d.select(g.alias("src"),
                    F.pmod(g + 2, F.lit(12)).alias("dst")),
           d.select(g.alias("src"),
                    F.pmod(g * 7 + 3, F.lit(12)).alias("dst")),
           d.select(g.alias("src"), (g + 100).alias("dst")),
           d.select((g + 100).alias("src"), (g + 200).alias("dst"))]
    edges = fam[0]
    for f in fam[1:]:
        edges = edges.unionAll(f)
    return graph.kcore(edges, k=3, rounds=4).orderBy("node")


def q_silhouette_labels(spark, sf_dir):
    """Centroid silhouette per embedding label
    (similarity.silhouette_centroid): own-centroid vs
    nearest-other-centroid cosine distances, component means on the
    9-decimal grid and per-point scores on the 6-decimal grid before
    averaging — the centroid_drift numerical-pairing precedent."""
    from zoi_spark import similarity

    emb = _read(spark, sf_dir, "embeddings")
    return similarity.silhouette_centroid(emb).orderBy("label")


def q_lang_fertility(spark, sf_dir):
    """Tokenizer-fertility proxies per language (text.byte_fertility):
    UTF-8 bytes/char, chars/token, bytes/token as corpus-level
    SUM-ratios over exact integer accumulators — CJK languages separate
    from Latin-script ones on the first ratio alone."""
    d = _read(spark, sf_dir, "documents")
    return text.byte_fertility(d).orderBy("lang")


def q_gram_novelty(spark, sf_dir):
    """First-occurrence 3-gram novelty (text.gram_novelty): per doc,
    the fraction of its distinct shingles first seen (by ascending
    doc_id) in that doc — the marginal-contribution score; min-agg on
    the gram key, no first-seen join tower."""
    d = _read(spark, sf_dir, "documents")
    return text.gram_novelty(d, n=3).orderBy("doc_id")


def q_readability_langs(spark, sf_dir):
    """Flesch reading-ease profile per language
    (text.readability_profile): per-doc scores are pure functions of
    three integer counts (words / sentence runs / vowel groups), group
    means ride micro-unit integer sums — every division re-executed by
    the twin in the same order."""
    d = _read(spark, sf_dir, "documents")
    return text.readability_profile(d).orderBy("lang")


def q_source_len_gini(spark, sf_dir):
    """Per-source Gini of doc lengths (tablechecks.gini): the
    rank-formula coefficient from exact integer sums, ties broken by
    doc_id — the inequality complement of the HHI concentration row."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.gini(d, group_col="source",
                             value_col="n_chars", order_col="doc_id")
            .orderBy("source"))


def q_len_winsorize(spark, sf_dir):
    """Rank-winsorization report per lang (sampling.winsorize_stats,
    p05/p95): type-1 quantile thresholds (integer ranks, no
    interpolation — thresholds are actual corpus values), clip counts
    and the exact winsorized mean."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    return (sampling.winsorize_stats(
        d, stratum_col="lang", value_col="n_chars",
        order_col="doc_id", p_low=0.05, p_high=0.95).orderBy("lang"))


def q_props_profile(spark, sf_dir):
    """JSON field extraction QC (tablechecks.json_field_profile) over
    events.props: $.k pulled JVM-side (get_json_object, no UDF),
    malformed/missing become a count via try_cast instead of an ANSI
    abort, numeric profile per event type."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.json_field_profile(
        ev, json_col="props", field="k", group_col="event_type")
        .orderBy("event_type"))


def q_event_cooccurrence(spark, sf_dir):
    """Item co-occurrence projection (graph.cooccurrence_pairs) of the
    user↔event-type bipartite graph: distinct-entity overlap counts +
    Jaccard affinity per unordered type pair — the market-basket
    matrix, marginals broadcast onto the pair table."""
    from zoi_spark import graph

    ev = _read(spark, sf_dir, "events")
    return (graph.cooccurrence_pairs(ev, entity_col="user_id",
                                     item_col="event_type")
            .orderBy("item_a", "item_b"))


def q_signup_funnel(spark, sf_dir):
    """First-occurrence conversion funnel (tablechecks.funnel_stages)
    signup→view→click→purchase: stage reached iff the user's first
    stage-k event is strictly later than their first stage-(k−1) event
    — per-user conditional mins only, the twin chains the same flags."""
    ev = _read(spark, sf_dir, "events")
    return tablechecks.funnel_stages(
        ev, user_col="user_id", ts_col="ts", type_col="event_type",
        stages=["signup", "view", "click", "purchase"]).orderBy(
        "stage_idx")


def q_seed_hop_distance(spark, sf_dir):
    """Multi-source BFS (graph.seed_distance, TrustRank-style): a
    30-ring with seeds {0, 15}, 3 hops — frontier-only expansion with
    an anti-join against the reached set; the twin unrolls the same
    hop CTEs."""
    from zoi_spark import graph

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(30))
    edges = d.select(g.alias("src"),
                     F.pmod(g + 1, F.lit(30)).alias("dst"))
    seeds = spark.createDataFrame([(0,), (15,)], "node long")
    out = graph.seed_distance(edges, seeds, max_hops=3)
    return out.orderBy("node")


def _scene_payloads() -> list[bytes]:
    """Four deterministic Y4M clips with ANALYTICALLY-known cut
    profiles at threshold 100 (strict >): luma sequences
    [0,0,200,200] → 1 cut / max 200; [0,100,100] → 0 cuts / max
    exactly 100 (the boundary — strict comparison pinned);
    [10]*5 → 0 cuts; [0,255] → 1 cut / max 255."""
    import numpy as np

    from zoi_spark import multimodal

    def clip(lumas, w=6, h=4):
        return multimodal.encode_y4m(
            [np.full((h, w), v, dtype=np.uint8) for v in lumas])

    return [clip([0, 0, 200, 200]), clip([0, 100, 100]),
            clip([10] * 5), clip([0, 255])]


def q_video_scene_cuts(spark, sf_dir):
    """Shot-boundary detection (multimodal.scene_cuts): deterministic
    Y4M clips through the REAL pure-python decode — frame counts, cut
    counts and max luma deltas are hand-derived constants in the twin
    (the constants-not-recomputed pattern of the other media oracles),
    including the exactly-at-threshold clip that pins the strict
    comparison."""
    from zoi_spark import multimodal

    d = _read(spark, sf_dir, "documents").select("doc_id")
    media = _payload_by_variant(d, _scene_payloads())
    out = multimodal.scene_cuts(media, threshold=100.0)
    return (out.groupBy(F.pmod("media_id", F.lit(4)).alias("variant"))
            .agg(F.count("*").alias("n_docs"),
                 F.max("n_frames").alias("n_frames"),
                 F.max("n_cuts").alias("n_cuts"),
                 F.max("max_diff").alias("max_diff"))
            .orderBy("variant"))


def q_lang_best_docs(spark, sf_dir):
    """Per-stratum quality selection (sampling.best_per_stratum): the
    top 25 docs per language by the v1 quality score, ties by doc_id —
    the FineWeb-style keep-the-best budget step; WindowGroupLimit keeps
    a 25-row heap per partition instead of sorting the stratum."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    scored = d.withColumn("q", text.quality_score(F.col("text")))
    out = sampling.best_per_stratum(scored, stratum_col="lang",
                                    score_col="q", k=25,
                                    order_col="doc_id")
    return (out.select("lang", F.col("__rank").alias("rank"),
                       "doc_id", "q")
            .orderBy("lang", "rank"))


def q_source_caps(spark, sf_dir):
    """ALL-CAPS shoutiness QC (text.caps_profile) per source: exact
    integer sum-ratios of ^[A-Z]{2,}$ tokens plus the per-doc shouty
    flag count — lambda-filter token scan on the Spark side,
    list_filter + regexp_full_match in the twin."""
    d = _read(spark, sf_dir, "documents")
    return (text.caps_profile(d, shouty_ratio=0.05)
            .orderBy("source"))


def q_prefix_dups(spark, sf_dir):
    """Truncation-duplicate groups (dedup.prefix_dup_groups, k=32):
    docs with doc_id%7 < 2 get a 40-token shared head per doc_id%5
    family (the truncated-recrawl seeding), everything else keeps its
    own text — the md5-of-first-k-tokens grouping recomputed verbatim
    by the twin, including the short-doc whole-text fallback."""
    from zoi_spark import dedup

    d = _read(spark, sf_dir, "documents")
    fam = F.pmod("doc_id", F.lit(5)).cast("string")
    head = F.repeat(F.concat(F.lit("head"), fam, F.lit(" tok ")), 20)
    seeded = d.select(
        "doc_id",
        F.when(F.pmod("doc_id", F.lit(7)) < 2,
               F.concat(head, F.col("text")))
        .otherwise(F.col("text")).alias("text"))
    out = dedup.prefix_dup_groups(seeded, k=32)
    return out.orderBy("prefix_md5", "doc_id")


def q_url_params(spark, sf_dir):
    """Query-parameter mining (urls.query_param_profile): a seeded url
    corpus exercising valued params, EMPTY values (utm_campaign=), bare
    flags (no '='), and query-less urls — key extraction, distinct-url
    counting and the value gate all re-derived by the twin."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    m = F.pmod("doc_id", F.lit(4))
    q = (F.when(m == 0, F.lit("?utm_source=x&utm_campaign="))
         .when(m == 1, F.concat(F.lit("?id="),
                                F.col("doc_id").cast("string"),
                                F.lit("&utm_source=y")))
         .when(m == 2, F.lit("?flag")).otherwise(F.lit("")))
    seeded = d.select(F.concat(
        F.lit("http://h"), F.pmod("doc_id", F.lit(9)).cast("string"),
        F.lit(".example/p/"), F.col("doc_id").cast("string"), q)
        .alias("url"))
    return urls.query_param_profile(seeded).orderBy("param")


def _silence_payloads() -> list[bytes]:
    """Four deterministic WAV clips with ANALYTICALLY-known silence
    profiles at threshold 256: mono 10×0+5×5000+5×0 (ratio 0.75,
    longest run 10); stereo (+300,−300) frames whose MIXDOWN is 0
    (ratio 1.0 — pins the mean-before-threshold order); all-loud
    (0.0); alternating 0/5000 (0.5, run 1)."""
    import numpy as np

    from zoi_spark import multimodal

    def wav(arr):
        return multimodal.encode_wav(np.array(arr, dtype=np.int16),
                                     8000)

    return [wav([0] * 10 + [5000] * 5 + [0] * 5),
            wav([[300, -300]] * 4),
            wav([10000] * 8),
            wav([0, 5000] * 4)]


def q_audio_silence_profile(spark, sf_dir):
    """Dead-air profiling (multimodal.audio_silence): deterministic PCM
    clips through the REAL WAV decode — silence ratios and longest runs
    are hand-derived constants in the twin, including the stereo clip
    whose per-frame mixdown cancels to exact silence."""
    from zoi_spark import multimodal

    d = _read(spark, sf_dir, "documents").select("doc_id")
    media = _payload_by_variant(d, _silence_payloads())
    out = multimodal.audio_silence(media, threshold=256)
    return (out.groupBy(F.pmod("media_id", F.lit(4)).alias("variant"))
            .agg(F.count("*").alias("n_docs"),
                 F.max("n_frames").alias("n_frames"),
                 F.max("silence_ratio").alias("silence_ratio"),
                 F.max("longest_silence").alias("longest_silence"))
            .orderBy("variant"))


def q_event_volume_anomalies(spark, sf_dir):
    """Daily-volume anomaly report (tablechecks.daily_volume_anomalies,
    z=1.5): the z-test runs in INTEGER arithmetic — (c·n−Σc)² >
    z²·(n·Σc²−(Σc)²) — so day classification has no float boundary;
    the twin evaluates the same inequality."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.daily_volume_anomalies(
        ev, ts_col="ts", group_col="event_type", z=1.5)
        .orderBy("event_type"))


def q_ab_arms(spark, sf_dir):
    """Deterministic A/B readout (sampling.ab_readout, 3 arms): md5
    unit assignment (the hash_split arithmetic) + micro-unit value
    means per arm — assignment hex math and the quantized mean both
    re-derived by the twin."""
    from zoi_spark import sampling

    ev = _read(spark, sf_dir, "events")
    return (sampling.ab_readout(ev, unit_col="user_id",
                                value_col="value", seed="exp1",
                                arms=3).orderBy("arm"))


_HTML_WRAP_PRE = ('<html><head><script type="x">var a=1;</script>'
                  "<style>p{color:red}</style></head><body><p>")
_HTML_WRAP_POST = "</p>&lt;tag&gt; &amp; &nbsp;done</body></html>"


def q_html_strip_report(spark, sf_dir):
    """HTML→text stripping (text.html_strip): a third of the docs are
    wrapped in script/style/tag/entity chrome; the report compares raw
    vs stripped character mass per source. The twin replays the exact
    regexp chain and the entity-decode ORDER (&amp; last, decode after
    tag-strip, so '&lt;tag&gt;' survives as literal text)."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id", "source",
        F.when(F.pmod("doc_id", F.lit(3)) == 0,
               F.concat(F.lit(_HTML_WRAP_PRE), F.col("text"),
                        F.lit(_HTML_WRAP_POST)))
        .otherwise(F.col("text")).alias("text"))
    out = text.html_strip(seeded)
    return (out.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length("text")).cast("long").alias("raw_chars"),
                 F.sum(F.length("text_plain")).cast("long")
                 .alias("plain_chars"),
                 F.round(F.sum(F.length("text_plain"))
                         / F.sum(F.length("text")), 6).alias("kept"))
            .orderBy("source"))


def q_retention_weeks(spark, sf_dir):
    """Weekly cohort retention (tablechecks.retention_cohorts): ISO-week
    cohorts by first event, distinct actives per (cohort, offset) cell —
    the exact-integer day-diff/7 offsets re-derived by the twin."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.retention_cohorts(ev, user_col="user_id",
                                          ts_col="ts")
            .orderBy("cohort_week", "week_offset"))


def q_tld_mix(spark, sf_dir):
    """Corpus TLD mix (urls.tld_profile) over a seeded frontier with
    three host families — .example, .org and a dot-less localhost (the
    whole-host fallback pinned) — counts, distinct hosts and shares all
    under the hash."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(9)).cast("string")
    host = (F.when(F.pmod("doc_id", F.lit(7)) == 0, F.lit("localhost"))
            .when(F.pmod("doc_id", F.lit(5)) == 0,
                  F.concat(F.lit("h"), g, F.lit(".test.org")))
            .otherwise(F.concat(F.lit("h"), g, F.lit(".example"))))
    seeded = d.select(F.concat(F.lit("http://"), host, F.lit("/p/"),
                               F.col("doc_id").cast("string"))
                      .alias("url"))
    return urls.tld_profile(seeded).orderBy("tld")


def q_word_len_mix(spark, sf_dir):
    """Word-length histogram per lang (text.word_len_hist, cap 12):
    corpus-shape QC with the overflow bucket and per-lang shares — the
    window denominator rides the ≤12-row histogram, never the corpus."""
    d = _read(spark, sf_dir, "documents")
    return (text.word_len_hist(d, max_len=12)
            .orderBy("lang", "word_len"))


def q_mutual_knn(spark, sf_dir):
    """Mutual-kNN graph construction (similarity.mutual_topk_pairs,
    k=5 over vec_id<300): pairs kept only when each side ranks the
    other in its cosine top-5 — the twin re-ranks both directions with
    the SAME fold-order cosine formula (dot / (√na·√nb), round 6, the
    silhouette-proven numerical pairing) and semi-joins for mutuality."""
    from zoi_spark import similarity

    emb = _read(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    return (similarity.mutual_topk_pairs(emb, k=5)
            .orderBy("id_a", "id_b"))


def q_asof_attribution(spark, sf_dir):
    """Purchase→click as-of attribution (joins.asof_join): every
    purchase is matched to the SAME USER's most recent prior-or-equal
    click via the tag-union + running-last merge scan — one shuffle on
    user_id, no candidate-pair blowup. Per-user rollup: purchases,
    attributed purchases, total attribution gap in exact integer
    microseconds (no float drift). The DuckDB twin is an independent
    construct — its native ASOF LEFT JOIN — so the match semantics
    (greatest right ts ≤ left ts, left-outer) are cross-validated
    against a second engine's implementation, not a re-derivation."""
    from zoi_spark import joins

    ev = _read(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase") \
                  .select("user_id", "ts", "event_id")
    clicks = ev.where(F.col("event_type") == "click") \
               .select("user_id", "ts", "event_id")
    j = joins.asof_join(purchases, clicks, on="user_id", left_ts="ts",
                        payload=["ts"], right_order="event_id")
    return (j.groupBy("user_id")
            .agg(F.count("*").alias("n_purchase"),
                 F.count("ts_asof").alias("n_attributed"),
                 F.coalesce(
                     F.sum(F.unix_micros(F.col("ts").cast("timestamp"))
                           - F.unix_micros(F.col("ts_asof")
                                           .cast("timestamp"))),
                     F.lit(0).cast("long")).alias("gap_us_total"))
            .orderBy("user_id"))


def q_range_join_sessions(spark, sf_dir):
    """Binned interval join (joins.range_join): purchases located
    inside the same user's click/view sessions (tablechecks.sessionize,
    12h gaps — long enough that the synthetic event cadence yields
    real containment mass, ~140 hits at sf0.01, so the oracle checks
    the BETWEEN path, not a vacuous zero column). The join is an
    EQUI-join on (12h bucket, user) plus
    the exact BETWEEN filter — the plan Catalyst cannot produce from a
    raw theta-join (that would be a nested loop). Output per user:
    session count and purchases landing in-session. The twin re-derives
    sessions with the same lag/gap window and joins with a plain
    BETWEEN predicate (DuckDB plans it as an IEJoin — again an
    independent range-join implementation)."""
    from zoi_spark import joins

    ev = _read(spark, sf_dir, "events")
    nav = ev.where(F.col("event_type").isin("click", "view"))
    s = tablechecks.sessionize(nav, user_col="user_id", ts_col="ts",
                               gap_minutes=720, order_col="event_id")
    sessions = (s.groupBy("user_id", "session_id")
                .agg(F.min("ts").alias("start_ts"),
                     F.max("ts").alias("end_ts")))
    purchases = ev.where(F.col("event_type") == "purchase") \
                  .select("user_id", "ts")
    inside = joins.range_join(purchases, sessions, point_col="ts",
                              start_col="start_ts", end_col="end_ts",
                              on="user_id", bucket_width=43200.0)
    hits = inside.groupBy("user_id") \
                 .agg(F.count("*").alias("n_in_session"))
    counts = sessions.groupBy("user_id") \
                     .agg(F.count("*").alias("n_sessions"))
    return (counts.join(hits, "user_id", "left")
            .select("user_id", "n_sessions",
                    F.coalesce("n_in_session", F.lit(0).cast("long"))
                     .alias("n_in_session"))
            .orderBy("user_id"))


def q_adamic_adar_hosts(spark, sf_dir):
    """Adamic–Adar link affinity (graph.adamic_adar) over the SAME
    deterministic 40-host graph as `host_pagerank`: for every host
    pair sharing neighbors, common-neighbor count and Σ 1/ln(deg(z))
    as exact micro-units (integer sums commute — no float-order
    drift). include_connected=True keeps already-linked pairs so the
    degree/contribution math is checked on every pair, not only the
    sparse unlinked complement. Twin re-derives symmetrize → degree →
    shared-neighbor self-join → integer-contribution sum from scratch.
    Top 40 by (aa_micro desc, a, b) keeps the gate row-stable."""
    from zoi_spark import graph

    d = _read(spark, sf_dir, "documents").select("doc_id")
    linking = d.where(F.pmod("doc_id", F.lit(40)) < 35)
    src = F.pmod("doc_id", F.lit(40))
    edges = linking.select(
        src.alias("src"),
        F.pmod(F.col("doc_id") * 7 + 11, F.lit(40)).alias("dst")
    ).unionAll(linking.select(
        src.alias("src"),
        F.pmod(F.col("doc_id") * 13 + 5, F.lit(40)).alias("dst")))
    aa = graph.adamic_adar(edges, include_connected=True)
    return (aa.orderBy(F.col("aa_micro").desc(), "node_a", "node_b")
            .limit(40))


def q_markov_event_mix(spark, sf_dir):
    """First-order Markov transition matrix of the event stream
    (tablechecks.markov_transitions): per-user time-ordered
    (prev→next) event-type steps, counted and row-normalized — the
    bot-vs-human behavioral fingerprint. p is a single division of
    exact integer counts (identical op order both engines, round 6).
    ≤25 output rows regardless of input size: the normalization window
    rides the counts table, never the corpus."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.markov_transitions(
                ev, entity_col="user_id", ts_col="ts",
                state_col="event_type", order_col="event_id")
            .orderBy("prev_state", "next_state"))


def q_lev_prefix_pairs(spark, sf_dir):
    """Edit-distance near-dup verify (dedup.levenshtein_verify_pairs):
    pairs within Levenshtein ≤3 on the 40-char normalized prefix,
    blocked by the first 8 chars with the mega-block cap at 200 —
    the tracking-suffix / OCR-noise dedup pass where set similarity
    is too coarse. Spark side uses the threshold form (banded DP,
    early abandon); the twin recomputes full levenshtein() and
    filters, so the threshold optimization is proven value-neutral.
    Top 40 by (dist, id_a, id_b)."""
    d = _read(spark, sf_dir, "documents")
    pairs = dedup.levenshtein_verify_pairs(
        d, max_dist=3, key_len=40, block_prefix=8, max_block_size=200)
    return pairs.orderBy("lev_dist", "id_a", "id_b").limit(40)


def q_cusum_volume_shift(spark, sf_dir):
    """CUSUM changepoint scan (tablechecks.cusum_shift) over daily
    event volumes: cumulative deviation from the series mean, scaled
    by n so every value is an exact BIGINT (n·prefix_k − k·total) —
    the |S_k| peak marks the level-shift day. The twin re-derives the
    identical integer recurrence with window sums; no float enters
    either engine."""
    ev = _read(spark, sf_dir, "events")
    out = tablechecks.cusum_shift(ev, ts_col="ts", unit="day")
    return (out.select(F.col("bucket_ts").cast("date").alias("day"),
                       "n", "cusum_scaled", "is_peak")
            .orderBy("day"))


def q_mannwhitney_len(spark, sf_dir):
    """Mann-Whitney U test (tablechecks.mann_whitney_u): EN doc length
    vs all other languages. Rank sums are computed on the DISTINCT-
    value counts table (2·avgrank = 2·cum_before + ties + 1 — exact
    integers, no global row window), doubled to stay integral under
    tie averaging; AUC is the one terminal division, micro-rounded
    with identical op order in the twin."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.mann_whitney_u(d, value_col="n_chars",
                                      group_col="lang", group_a="en")


def q_rfm_customers(spark, sf_dir):
    """RFM segmentation (tablechecks.rfm_segments) of customers from
    orders: Recency/Frequency/Monetary quartiles (ntile over the
    per-customer aggregate, ties broken by custkey; monetary summed
    as exact CENTS so no float-sum order can flip a bucket), then
    segment-cell counts. The twin mirrors the same three ntile
    windows in DuckDB."""
    o = _read(spark, sf_dir, "orders")
    return (tablechecks.rfm_segments(
                o, entity_col="o_custkey", ts_col="o_orderdate",
                amount_col="o_totalprice", buckets=4)
            .orderBy("r_bucket", "f_bucket", "m_bucket"))


def q_volume_autocorr(spark, sf_dir):
    """Daily-volume autocorrelation at lags 1/2/3/7
    (tablechecks.volume_autocorr) — the weekly-rhythm fingerprint.
    Numerator and denominator are both scaled by n² so the sums run
    over exact BIGINT deviations (n·x_t − S); lag matching is calendar
    arithmetic on the tiny buckets table; r is one micro-rounded
    division, same op order in the twin."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.volume_autocorr(ev, ts_col="ts",
                                        lags=(1, 2, 3, 7), unit="day")
            .orderBy("lag"))


def q_phash_dup_groups(spark, sf_dir):
    """Perceptual-hash near-dup groups (dedup.hamming_dup_groups,
    max_dist=3): 60 deterministic 64-bit hashes — 12 nibble-replicated
    group codes (pairwise Hamming ≥ 4 by the repetition bound) × 5
    low-bit noise offsets (pairwise ≤ 3) — so exactly the within-group
    pairs survive. Spark finds candidates with the PIGEONHOLE banded
    equi-join (4 bands of 16 bits: distance ≤ 3 ⇒ one band equal);
    the twin does all-pairs over distinct hashes with
    bit_count(xor(a,b)) — the blocking is proven recall-lossless
    against an unblocked second engine."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    g = F.pmod("doc_id", F.lit(12))
    noise = F.pmod("doc_id", F.lit(5))
    offset = (F.when(noise == 0, 0).when(noise == 1, 1)
              .when(noise == 2, 3).when(noise == 3, 1048576)
              .otherwise(1048577))
    h = d.select((g * F.lit(4369) * F.lit(1099511627776)
                  + offset).alias("phash"))
    return (dedup.hamming_dup_groups(h, hash_col="phash", max_dist=3)
            .orderBy("hash_a", "hash_b"))



def q_trust_rank_hosts(spark, sf_dir):
    """TrustRank (graph.trust_rank; Gyöngyi 2004) over the SAME
    deterministic 40-host graph as `host_pagerank`, seeds {0,1,2},
    4 rounds: teleport AND dangling mass flow to the seed set only, so
    hosts unreachable from the trusted core rank ~0 — the spam-mass
    complement of PageRank. The twin unrolls the identical recursion
    as a CTE chain (see _trustrank_sql); round-6 match like
    host_pagerank."""
    from zoi_spark import graph

    d = _read(spark, sf_dir, "documents").select("doc_id")
    linking = d.where(F.pmod("doc_id", F.lit(40)) < 35)
    src_ = F.pmod("doc_id", F.lit(40))
    edges = linking.select(
        src_.alias("src"),
        F.pmod(F.col("doc_id") * 7 + 11, F.lit(40)).alias("dst")
    ).unionAll(linking.select(
        src_.alias("src"),
        F.pmod(F.col("doc_id") * 13 + 5, F.lit(40)).alias("dst")))
    seeds = spark.range(3).select(F.col("id").alias("node"))
    tr = graph.trust_rank(edges, seeds, iters=4)
    return (tr.select(F.col("node").alias("host"),
                      F.round("rank", 6).alias("trust"))
            .orderBy("host"))


def q_lang_source_rollup(spark, sf_dir):
    """Multi-granularity corpus composition via ROLLUP: doc counts and
    exact char sums at (lang, source), (lang) and () levels in ONE
    aggregation pass (Spark plans rollup as a single Expand+Aggregate
    — no per-level rescan), with grouping_id disambiguating subtotal
    rows from genuine NULL groups. The twin is DuckDB's GROUP BY
    ROLLUP + GROUPING() — same ANSI bit convention."""
    d = _read(spark, sf_dir, "documents")
    return (d.rollup("lang", "source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("chars_total"),
                 F.grouping_id().cast("long").alias("gid"))
            .orderBy(F.col("gid"), F.col("lang").asc_nulls_first(),
                     F.col("source").asc_nulls_first()))


def q_click_paths(spark, sf_dir):
    """Order-2 path mining (tablechecks.path_ngrams, n=3): every
    3-step state run per user, counted corpus-wide — crawler loops and
    funnel shortcuts that pairwise Markov rates hide. All lags come
    from ONE per-user window pass. Top 40 by (count desc, path) keeps
    the gate row-stable."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.path_ngrams(ev, entity_col="user_id",
                                    ts_col="ts", state_col="event_type",
                                    n=3, order_col="event_id")
            .orderBy(F.col("n_occurrences").desc(), "path")
            .limit(40))


def q_user_key_skew(spark, sf_dir):
    """Shuffle-skew forensics (tablechecks.key_skew_profile): the 10
    hottest user_id values in events with exact micro-shares — the
    report that decides salting/broadcast before any join on the key.
    TakeOrdered top-k, no global window; total rides as a one-row
    broadcast."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.key_skew_profile(ev, key_col="user_id",
                                         top_k=10)
            .orderBy("rank"))


def q_cross_source_copy_map(spark, sf_dir):
    """Cross-source syndication map (dedup.cross_source_copies,
    prefix_chars=40): distinct truncation-level fingerprints shared by
    source pairs — DISTINCT (fp, source) first, so per-source copy
    mass can never blow up the pair join. The twin re-derives the
    prefix-md5 + distinct + self-join from scratch."""
    d = _read(spark, sf_dir, "documents")
    return (dedup.cross_source_copies(d, prefix_chars=40)
            .orderBy("source_a", "source_b"))



def q_embedding_angle_hist(spark, sf_dir):
    """Embedding-space angular histogram (similarity.angular_histogram,
    64 id-blocks, 10 bins): cosine distribution over a deterministic
    blocked pair sample — duplicate mass shows as a spike near 1,
    encoder collapse as mass at 0. Cosines are micro-rounded BEFORE
    binning (integer bin edges can't flip between engines); the twin
    re-derives the same blocks, the same fold-order dot products and
    the same integer bin rule."""
    from zoi_spark import similarity

    e = _read(spark, sf_dir, "embeddings")
    return (similarity.angular_histogram(e, n_blocks=64, bins=10)
            .orderBy("bin"))


def q_lang_vocab_overlap(spark, sf_dir):
    """Pairwise language-vocabulary Jaccard (text.vocab_overlap):
    distinct token sets per lang, token-keyed intersection join,
    inclusion-exclusion union — the mislabeled-language detector.
    Exact distinct counts; jaccard is the single micro division."""
    d = _read(spark, sf_dir, "documents")
    return (text.vocab_overlap(d, group_col="lang", text_col="text")
            .orderBy("group_a", "group_b"))


def q_event_fano(spark, sf_dir):
    """Daily-volume burstiness by event type (tablechecks.fano_factor):
    variance-to-mean of bucket counts as one micro-rounded division of
    exact decimal-widened integer moments — Poisson = 1e6, bursty > 1e6.
    The twin re-derives the same cross-multiplied formula."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.fano_factor(ev, ts_col="ts",
                                    group_col="event_type")
            .orderBy("group"))


def q_lang_source_mi(spark, sf_dir):
    """Mutual information lang↔source (tablechecks.mutual_information):
    MI = H(lang) + H(source) − H(lang, source) from exact BIGINT cell
    counts, floats only in the final ln projection, round-6 (the
    KL/PSI float-sum tolerance). One corpus scan; margins and
    entropies reduce from the cells table."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.mutual_information(d, col_a="lang",
                                          col_b="source")


def q_event_volume_trend(spark, sf_dir):
    """Per-event-type daily-volume OLS trend (tablechecks.volume_trend):
    slope (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) over calendar day indices, exact
    integer moments, one micro division; single-bucket groups yield
    NULL in both engines (guarded degenerate denominator)."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.volume_trend(ev, ts_col="ts",
                                     group_col="event_type")
            .orderBy("group"))


def q_embedding_norm_qc(spark, sf_dir):
    """Embedding-column intake QC (similarity.embedding_norm_qc): per
    label, NULL-vector / dimension-drift / zero-norm / NaN counts plus
    round-6 norm stats — one scan, one group aggregation; norms are
    the proven left-fold sum-of-squares contract."""
    e = _read(spark, sf_dir, "embeddings")
    return similarity.embedding_norm_qc(e).orderBy("group")


def q_emb_covariance(spark, sf_dir):
    """Embedding covariance matrix (similarity.covariance_pairs): the
    Arrow partial-aggregation pattern — one numpy XᵀX per batch, d²
    partial sums reduced in one hash agg; the twin re-derives the
    population covariance from per-position unnests."""
    e = _read(spark, sf_dir, "embeddings")
    return similarity.covariance_pairs(e).orderBy("i", "j")


def q_ann_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of cosine and L2 rankings
    (similarity.rrf_topk, k=5, rrf_k=60): both ranks from one
    broadcast-join scored projection, fused = Σ 1/(60+rank) — exact
    small-integer rationals, identical in every engine."""
    e = _read(spark, sf_dir, "embeddings")
    qs = (e.where(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    return (similarity.rrf_topk(e, qs, k=5)
            .orderBy("query_id", "rank"))


def q_snapshot_host_overlap(spark, sf_dir):
    """Consecutive-snapshot host-set Jaccard (urls.snapshot_host_overlap)
    over a seeded 4-month webtext frame whose host vocabulary widens
    each month (doc_id mod (20+10·month)) so every pair overlaps
    partially; exact distinct-host counts, inclusion-exclusion, one
    round-6 division."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    m = F.pmod("doc_id", F.lit(4)).cast("int")
    # divide the month selector OUT of the host index: doc_id//4 walks
    # every residue, so month m's host set is the PREFIX {0..20+10m-1}
    # and consecutive months overlap by construction (jaccard 2/3, 3/4,
    # 4/5 at full coverage) — a seed keyed on doc_id%… instead makes
    # the sets parity-disjoint and the common-host path never fires
    h = F.pmod(F.floor(F.col("doc_id") / F.lit(4)),
               F.lit(20) + F.lit(10) * m)
    url = F.concat(F.lit("http://host"), h.cast("string"),
                   F.lit(".example.com/p/"),
                   F.col("doc_id").cast("string"))
    ts = F.add_months(F.to_date(F.lit("2024-01-01")), m).cast("timestamp")
    seeded = d.select(url.alias("url"), ts.alias("warc_ts"))
    return urls.snapshot_host_overlap(seeded).orderBy("snap_a")


def q_mad_outliers(spark, sf_dir):
    """Median/MAD robust outliers on events.value by event_type
    (tablechecks.mad_outliers, k=2.5): two exact-percentile stratum
    aggregations broadcast back — the heavy-tail-safe twin of
    zscore_outliers; both engines interpolate percentiles with the
    same lower+(upper−lower)·frac rule."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.mad_outliers(ev, "value", by="event_type",
                                     k=2.5, id_col="event_id")
            .orderBy("event_id"))


def q_pq_ann(spark, sf_dir):
    """Product-quantization ANN (similarity.pq_topk, m=4 subspaces ×
    ksub=8 seeded codebook centroids, k=5): corpus vectors compress to
    4 argmin codes (9-decimal grid, first-index ties), queries score
    by asymmetric distance through a per-query m×ksub table; the twin
    re-derives codes and ADC sums from the same codebook literals."""
    e = _read(spark, sf_dir, "embeddings")
    qs = (e.where(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    return (similarity.pq_topk(e, qs, k=5, m=4, ksub=8, seed=42)
            .orderBy("query_id", "rank"))


def q_hill_tail(spark, sf_dir):
    """Hill power-law tail index of document length by lang
    (tablechecks.power_tail_hill, k=50): alpha from the top-50 log
    ratios against the 51st order statistic — tie-straddling at the
    rank boundary is value-multiset-invariant, so both engines land on
    identical sums."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.power_tail_hill(d, "n_chars", by="lang", k=50)
            .orderBy("lang"))


def q_host_fetch_gaps(spark, sf_dir):
    """Crawl-politeness cadence (urls.host_fetch_gaps) over a seeded
    13-host webtext frame with quadratic-residue fetch times (doc_id²
    mod 1e5 seconds past 2024-01-01): per-host min/median/max
    inter-fetch gap in exact integer seconds; the median is the same
    interpolated percentile on both engines."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    h = F.pmod("doc_id", F.lit(13)).cast("string")
    ts = F.timestamp_seconds(
        F.lit(1704067200).cast("long")
        + F.pmod(F.col("doc_id") * F.col("doc_id"), F.lit(100000)))
    seeded = d.select(
        F.concat(F.lit("http://host"), h,
                 F.lit(".example.com/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        ts.alias("warc_ts"))
    return urls.host_fetch_gaps(seeded).orderBy("host")


def q_anchor_texts(spark, sf_dir):
    """Anchor-text mining per target host (text.anchor_texts):
    documents seeded with anchors cycling quoting syntax, case and
    two anchor-text variants (plus a second link every 4th doc) so
    top-anchor selection, tie-breaks and the distinct-anchor counts
    all land under the value hash."""
    d = _read(spark, sf_dir, "documents")
    g = F.pmod("doc_id", F.lit(12)).cast("string")
    tgt = F.concat(F.lit("http://anchor"), g, F.lit(".example/p"))
    sel = F.pmod("doc_id", F.lit(3))
    atext = F.when(F.pmod("doc_id", F.lit(2)) == 0, F.lit("Read More")) \
        .otherwise(F.concat(F.lit("page "), g))
    a = F.when(sel == 0, F.concat(F.lit(' <a href="'), tgt,
                                  F.lit('">'), atext, F.lit("</a>")))
    a = a.when(sel == 1, F.concat(F.lit(" <A HREF='"), tgt,
                                  F.lit("'>"), atext, F.lit("</A>")))
    a = a.otherwise(F.concat(F.lit(' <a class="x" href='), tgt,
                             F.lit(">"), atext, F.lit("</a>")))
    extra = F.when(F.pmod("doc_id", F.lit(4)) == 1,
                   F.concat(F.lit(' <a href="http://anchor'), g,
                            F.lit('.example/q">also this</a>'))
                   ).otherwise(F.lit(""))
    seeded = d.select(
        "doc_id", F.concat(F.col("text"), a, extra).alias("text"))
    return text.anchor_texts(seeded).orderBy("host")


def q_quality_calibration(spark, sf_dir):
    """Decile calibration of the heuristic quality score against
    exact-duplicate membership (text.quality_calibration): fingerprint
    counts joined back, round-6 dup rate and mean score per score
    decile — the does-the-gate-deserve-its-threshold report."""
    d = _read(spark, sf_dir, "documents")
    return text.quality_calibration(d).orderBy("bucket")


def q_ppjoin_pairs(spark, sf_dir):
    """Exact set-similarity join with prefix filtering
    (dedup.ppjoin_pairs, t=0.9) over the doc_id%10 slice of the
    dup-seeded corpus (the synthetic generator's template text makes
    token-set similarity dense, so the full corpus at a loose
    threshold emits millions of true pairs — correct but useless as a
    gate row). The twin is deliberately the ALL-SHARED-TOKEN-pairs
    exact Jaccard — PPJoin is exact, so matching it proves the prefix
    filter loses nothing, not just that both sides ran the same
    pruning."""
    d = _dup_docs(spark, sf_dir).where(F.pmod("doc_id", F.lit(10)) == 0)
    return (dedup.ppjoin_pairs(d, threshold=0.9)
            .orderBy("id_a", "id_b"))


def q_diurnal_profile(spark, sf_dir):
    """Circular time-of-day stats per event type
    (tablechecks.diurnal_profile): resultant length R and circular
    mean hour from Σcos/Σsin — the constant 2π/86400 and the 24/2π
    remap are computed with the same op order on both engines."""
    ev = _read(spark, sf_dir, "events")
    return tablechecks.diurnal_profile(ev, ts_col="ts",
                                       group_col="event_type")


def q_quantile_norm(spark, sf_dir):
    """Per-source percentile rank of n_chars
    (tablechecks.quantile_normalize): the cumulative window runs over
    the (source, value) DISTINCT table, rows join back on the pair key
    — percent_rank semantics, NULL pct for single-row strata; output
    the doc_id % 7 sample."""
    d = _read(spark, sf_dir, "documents")
    out = tablechecks.quantile_normalize(d, "n_chars", by="source")
    return (out.where(F.pmod("doc_id", F.lit(7)) == 0)
            .select("doc_id", "source", "n_chars", "pct")
            .orderBy("doc_id"))


def q_meta_robots(spark, sf_dir):
    """Robots-meta directive census (text.meta_robots) over seeded
    pages cycling quote style, case and directive lists (plus pages
    with no tag) — first-tag extraction, comma split, trim+lower all
    land under the value hash."""
    d = _read(spark, sf_dir, "documents")
    sel = F.pmod("doc_id", F.lit(4))
    tag = F.when(sel == 0,
                 F.lit(' <meta name="robots" content="noindex, nofollow">'))
    tag = tag.when(sel == 1,
                   F.lit(" <META NAME=ROBOTS CONTENT='noarchive'>"))
    tag = tag.when(sel == 2,
                   F.lit(' <meta name="robots" content="index, follow">'))
    tag = tag.otherwise(F.lit(""))
    seeded = d.select("doc_id",
                      F.concat(F.col("text"), tag).alias("text"))
    return text.meta_robots(seeded).orderBy("directive")


def q_hashed_features(spark, sf_dir):
    """Hashing-trick featurizer (text.hashed_features, 16 buckets,
    md5-prefix hash) for the doc_id % 11 sample: L1-normalized sparse
    (id, bucket, w) rows — the text→vector bridge whose md5 bucket
    assignment DuckDB reproduces bit-identically."""
    d = _read(spark, sf_dir, "documents")
    return (text.hashed_features(
        d.where(F.pmod("doc_id", F.lit(11)) == 0))
        .orderBy("doc_id", "bucket"))


def q_type_affinity(spark, sf_dir):
    """Bipartite-projection cosine affinity between event types over
    shared-user count vectors (tablechecks.type_affinity) — the
    who-clicks-also-buys matrix; integer dot/norm sums keep the
    round-6 cosine engine-exact."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.type_affinity(ev, entity_col="user_id",
                                      type_col="event_type")
            .orderBy("type_a", "type_b"))


def q_event_debounce(spark, sf_dir):
    """Lag-debounce duplicate-event suppression
    (tablechecks.debounce_events, 60s gap): per (user, type) the gap
    to the previous event — ordered by (ts, event_id) — flags retry
    storms; epoch seconds are floored identically on both engines.
    Output the event_id % 9 sample of the annotated stream."""
    ev = _read(spark, sf_dir, "events")
    out = tablechecks.debounce_events(ev, entity_col="user_id",
                                      type_col="event_type",
                                      ts_col="ts", id_col="event_id",
                                      min_gap_s=60)
    return (out.where(F.pmod("event_id", F.lit(9)) == 0)
            .select("event_id", "user_id", "event_type", "gap_s",
                    "bounce")
            .orderBy("event_id"))


def q_lognormal_len(spark, sf_dir):
    """Log-normal fit of n_chars per lang (tablechecks.lognormal_fit):
    mu/sigma from the explicit two-moment form (same op order in both
    engines) plus the empirical mu±sigma mass — ≈0.68 under a true
    log-normal; a deficit flags a second (spam) mode."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.lognormal_fit(d, "n_chars", by="lang")
            .orderBy("lang"))


def q_bitext_pairs(spark, sf_dir):
    """Bitext-mining candidates (text.bitext_candidates, max_df=3):
    cross-language pairs anchored by RARE shared tokens. The doc_id%13
    slice is seeded with two per-pair anchor tokens and an alternating
    en/de lang tag (the synthetic template vocabulary is all
    high-df, so unseeded rare anchors barely exist) — the df≤3 filter
    and the pair join run over real text + anchors on both engines."""
    d = _read(spark, sf_dir, "documents").where(
        F.pmod("doc_id", F.lit(13)) == 0)
    g = F.floor(F.col("doc_id") / 26).cast("long").cast("string")
    seeded = d.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" zqa"), g, F.lit(" zqb"), g)
        .alias("text"),
        F.when(F.pmod((F.col("doc_id") / F.lit(13)).cast("long"),
                      F.lit(2)) == 0,
               F.lit("en")).otherwise(F.lit("de")).alias("lang"))
    return (text.bitext_candidates(seeded)
            .orderBy("id_a", "id_b"))


def q_good_turing(spark, sf_dir):
    """Simple Good-Turing unseen-mass per lang (text.good_turing_mass):
    P0 = singletons/total-tokens, the reserve a LM should hold for
    never-seen tokens — all-integer aggregates, exact across engines."""
    d = _read(spark, sf_dir, "documents")
    return text.good_turing_mass(d).orderBy("lang")


def q_fd_check(spark, sf_dir):
    """Functional-dependency audit (tablechecks.fd_violations): the
    violated `source → lang` dependency (every multi-lang source is a
    violation row with its lang span) UNION the holding `doc_id →
    lang` (zero rows — the absence is the assertion). One hash
    aggregation per dependency, no joins/windows."""
    d = _read(spark, sf_dir, "documents")
    v1 = (tablechecks.fd_violations(d, ["source"], "lang")
          .select(F.lit("source->lang").alias("fd"),
                  F.col("source").alias("determinant"),
                  "n_rows", "n_dependent", "dep_min", "dep_max"))
    v2 = (tablechecks.fd_violations(d, ["doc_id"], "lang")
          .select(F.lit("doc_id->lang").alias("fd"),
                  F.col("doc_id").cast("string").alias("determinant"),
                  "n_rows", "n_dependent", "dep_min", "dep_max"))
    return v1.unionByName(v2).orderBy("fd", "determinant")


def q_key_profile(spark, sf_dir):
    """Candidate-key discovery (tablechecks.key_candidates): distinct
    ratio + is_key verdict for three combos of documents columns in
    ONE aggregation over ONE scan (NULL-tagged concat keys; stack
    unpivot of the single result row)."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.key_candidates(
        d, [["doc_id"], ["source", "lang"],
            ["source", "lang", "n_chars"]]).orderBy("combo")


def q_kmv_overlap(spark, sf_dir):
    """KMV bottom-k sketch overlap (tablechecks.kmv_overlap, k=256)
    between two seeded url snapshots (A: doc_id%3≠0, B: doc_id%2=0 —
    true Jaccard 1/4 of the page universe): distinct/union/Jaccard/
    intersection estimates from two 256-row sketches — the
    trillion-url snapshot-overlap question WITHOUT a corpus join.
    Side B lands under k (exact path); A and the union exercise the
    (k−1)·2^48/h₍ₖ₎ estimator. md5-derived 48-bit hashes, engine
    bit-identical."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(F.lit("http://host"),
                   F.pmod("doc_id", F.lit(97)).cast("string"),
                   F.lit(".example.com/p/"),
                   F.col("doc_id").cast("string")).alias("url")
    a = d.where(F.pmod("doc_id", F.lit(3)) != 0).select(url)
    b = d.where(F.pmod("doc_id", F.lit(2)) == 0).select(url)
    return tablechecks.kmv_overlap(a, b, "url", k=256)


def q_completeness_by_source(spark, sf_dir):
    """Per-source completeness matrix (tablechecks.completeness_matrix)
    over documents with seeded holes (lang NULLed at doc_id%13=0,
    text blanked at doc_id%17=0): null/empty rate per (source,
    column) from ONE segment aggregation + stack unpivot — catches
    the one-source extractor break a corpus-wide rate hides."""
    d = _read(spark, sf_dir, "documents")
    holed = d.select(
        "doc_id", "source", "n_chars",
        F.when(F.pmod("doc_id", F.lit(13)) == 0, F.lit(None))
        .otherwise(F.col("lang")).alias("lang"),
        F.when(F.pmod("doc_id", F.lit(17)) == 0, F.lit(""))
        .otherwise(F.col("text")).alias("text"))
    return (tablechecks.completeness_matrix(
        holed, ["text", "lang", "n_chars"], by="source")
        .orderBy("segment", "column"))


def q_url_content_churn(spark, sf_dir):
    """Per-host refetch content churn (urls.content_churn) — the
    north-rule byte-identity invariant as a table check. Two seeded
    snapshots share a page universe (page = doc_id//2, host =
    page%23); snapshot 1 mutates pages with page%10<3, so every host
    converges to churn ≈ 0.3. Rows slim to (url, host, 48-bit
    digest) BEFORE the url equi-join; text never ships."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    page = F.floor(F.col("doc_id") / 2).cast("long")
    snap = F.pmod("doc_id", F.lit(2)).cast("int")
    url = F.concat(F.lit("http://host"),
                   F.pmod(page, F.lit(23)).cast("string"),
                   F.lit(".example.com/p/"), page.cast("string"))
    text = F.when((snap == 1) & (F.pmod(page, F.lit(10)) < 3),
                  F.concat(F.lit("content-"), page.cast("string"),
                           F.lit("-v2"))) \
            .otherwise(F.concat(F.lit("content-"), page.cast("string")))
    seeded = d.select(snap.alias("snap"), url.alias("url"),
                      text.alias("text"))
    return urls.content_churn(seeded).orderBy("host")


def q_session_overlap(spark, sf_dir):
    """Overlapping-interval audit (tablechecks.interval_overlaps) over
    seeded event intervals (start = epoch(ts), duration = 60 +
    event_id%540 s): per-user running-max-end window — no self-join —
    emitting every interval that starts inside a predecessor."""
    ev = _read(spark, sf_dir, "events")
    iv = ev.select(
        "user_id", "event_id",
        F.unix_timestamp("ts").alias("start_s"),
        (F.unix_timestamp("ts") + 60
         + F.pmod("event_id", F.lit(540))).alias("end_s"))
    return (tablechecks.interval_overlaps(
        iv, entity_col="user_id", start_col="start_s",
        end_col="end_s", id_col="event_id")
        .orderBy("user_id", "event_id"))


def q_sequence_audit(spark, sf_dir):
    """Sequence-constraint audit (tablechecks.sequence_violations):
    users whose first `purchase` precedes their first `signup` (or
    who purchase without ever signing up) — one conditional-min hash
    aggregation, no window/join."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.sequence_violations(
        ev, entity_col="user_id", ts_col="ts",
        type_col="event_type", first_type="signup",
        then_type="purchase")
        .orderBy("user_id"))


def q_order_reconciliation(spark, sf_dir):
    """Cross-table reconciliation (tablechecks.reconcile_totals):
    o_totalprice vs Σ l_extendedprice·(1+tax)·(1−discount) per order,
    in integer CENTS (associative sums — bit-identical across
    partitionings and engines; float sums drift >1e-3 at this row
    count), rolled up per order status. The synthetic data violates
    the TPC-H invariant by design — the report measures it."""
    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    fact_cents = F.round(F.col("o_totalprice") * 100, 0)
    det_cents = F.round(F.col("l_extendedprice")
                        * (1 + F.col("l_tax"))
                        * (1 - F.col("l_discount")) * 100, 0)
    return (tablechecks.reconcile_totals(
        o.withColumnRenamed("o_orderkey", "okey"),
        li.withColumnRenamed("l_orderkey", "okey"),
        key="okey", fact_cents=fact_cents, detail_cents=det_cents,
        by="o_orderstatus", tol_cents=1)
        .orderBy("o_orderstatus"))


def q_dup_rate_by_source(spark, sf_dir):
    """Per-source exact-duplicate pressure (dedup.dup_rate_by_group)
    over documents with seeded duplicates (doc_id%7=0 rows collapse to
    a per-source template text): 1 − distinct md5 / rows per source —
    predicts exactly what exact_dedup would drop, segment by
    segment."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.select(
        "source",
        F.when(F.pmod("doc_id", F.lit(7)) == 0,
               F.concat(F.lit("template:"), F.col("source")))
        .otherwise(F.col("text")).alias("text"))
    return (dedup.dup_rate_by_group(seeded, group_col="source")
            .orderBy("group"))


def q_derived_consistency(spark, sf_dir):
    """Stored-vs-derived consistency audit (tablechecks.
    derived_mismatch): n_chars vs length(text) per source, with a
    seeded corruption (+7 at doc_id%19=0) — the broken-backfill
    detector. Clean sources report rate 0 (the generator maintains
    the invariant); corrupted rows surface with their max delta."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.select(
        "source", "text",
        F.when(F.pmod("doc_id", F.lit(19)) == 0,
               F.col("n_chars") + 7)
        .otherwise(F.col("n_chars")).alias("n_chars"))
    return (tablechecks.derived_mismatch(
        seeded, stored_col="n_chars", derived=F.length("text"),
        by="source").orderBy("source"))


def q_mode_share(spark, sf_dir):
    """Dominant-value profile (tablechecks.mode_share) over lang /
    source / n_chars with lang NULLed at doc_id%13=0 — the
    constant-column detector; the NULL tag rides the same max(struct)
    election as real values, ties break toward the larger string on
    both engines."""
    d = _read(spark, sf_dir, "documents")
    holed = d.select(
        "source", "n_chars",
        F.when(F.pmod("doc_id", F.lit(13)) == 0, F.lit(None))
        .otherwise(F.col("lang")).alias("lang"))
    return (tablechecks.mode_share(holed, ["lang", "source", "n_chars"])
            .orderBy("column"))


def q_rate_cap(spark, sf_dir):
    """Rate-limit audit (tablechecks.rate_cap_violations): users with
    >1 event in a tumbling hour — one (user, hour-bucket) hash
    aggregation, no window function, no self-join; the scraper /
    retry-storm detector at fetch-log scale."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.rate_cap_violations(
        ev, entity_col="user_id", ts_col="ts", cap=1, window_s=3600)
        .orderBy("user_id", "window_start_s"))


def q_selflink_ratio(spark, sf_dir):
    """Per-host internal-link share (urls.selflink_ratio): pages on
    host doc_id%6 carry one seeded link whose target alternates self /
    next host by doc_id parity, EXCEPT doc_id%3==0 pages which use the
    common ROOT-RELATIVE form ('/q/N') — a same-host link per RFC 3986
    that must count as self regardless of parity. Link extraction
    (carry-cols, no join-back) + host compare + one host
    aggregation."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents")
    g = F.pmod("doc_id", F.lit(6)).cast("string")
    tgt = F.when(F.pmod("doc_id", F.lit(2)) == 0, g).otherwise(
        F.pmod(F.col("doc_id") + 1, F.lit(6)).cast("string"))
    href = F.when(F.pmod("doc_id", F.lit(3)) == 0,
                  F.concat(F.lit("/q/"),
                           F.col("doc_id").cast("string"))) \
            .otherwise(F.concat(F.lit("http://host"), tgt,
                                F.lit(".example/q/"),
                                F.col("doc_id").cast("string")))
    seeded = d.select(
        "doc_id",
        F.concat(F.lit("http://host"), g, F.lit(".example/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.col("text"), F.lit(' <a href="'), href,
                 F.lit('">x</a>')).alias("text"))
    return urls.selflink_ratio(seeded).orderBy("host")


def q_schema_evolution(spark, sf_dir):
    """Schema-evolution gate (tablechecks.schema_drift_rows): the LIVE
    parquet footer schema of documents diffed against a pinned
    baseline contract (which expects lang:int and a quality column,
    and predates n_chars) — added/removed/retyped rows from metadata
    only, no data pass. The DuckDB twin derives the live side from
    DESCRIBE, so both engines genuinely read their catalog."""
    baseline = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("quality", T.DoubleType()),
    ])
    current = _read(spark, sf_dir, "documents").schema
    return (tablechecks.schema_drift_rows(spark, baseline, current)
            .orderBy("field"))


def q_transition_audit(spark, sf_dir):
    """State-machine conformance (tablechecks.transition_violations):
    adjacent per-user event transitions outside the whitelist
    signup→view→click→purchase (+ self-loops back to view) — one
    (ts, event_id)-ordered lag window + one pair aggregation; the
    enforcement complement of markov_event_mix. Every 97th event's
    type is nulled to exercise the NULL-state contract: a NULL state
    on either side of a real transition is a violation (rendered
    '(null)' here so the row survives engine-specific NULL sort
    orders), while first-rows-per-entity stay exempt."""
    ev = _read(spark, sf_dir, "events")
    ev = ev.withColumn(
        "event_type",
        F.when(F.pmod("event_id", F.lit(97)) == 0, F.lit(None))
        .otherwise(F.col("event_type")))
    allowed = [("signup", "view"), ("view", "click"),
               ("click", "purchase"), ("view", "view"),
               ("click", "view"), ("purchase", "view")]
    out = tablechecks.transition_violations(
        ev, entity_col="user_id", ts_col="ts",
        type_col="event_type", id_col="event_id", allowed=allowed)
    return (out.select(
        F.coalesce("from_type", F.lit("(null)")).alias("from_type"),
        F.coalesce("to_type", F.lit("(null)")).alias("to_type"), "n")
        .orderBy("from_type", "to_type"))


def q_canonical_audit(spark, sf_dir):
    """rel=canonical conformance (urls.canonical_mismatch): pages on
    host doc_id%5 declare a canonical for doc_id%3≠2; every 4th
    declarer points at a mirror host instead of itself → per-host
    mismatch rate ≈ 1/4. doc_id%4==1 declarers use the common
    ROOT-RELATIVE self-canonical form ('/p/N'), which resolve_href
    absolutizes against the page url — it must count as a match.
    Declared and self urls both normalize through canonical_url."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents")
    g = F.pmod("doc_id", F.lit(5)).cast("string")
    self_url = F.concat(F.lit("http://host"), g,
                        F.lit(".example/p/"),
                        F.col("doc_id").cast("string"))
    href = F.when(F.pmod("doc_id", F.lit(4)) == 0,
                  F.concat(F.lit("http://mirror.example/p/"),
                           F.col("doc_id").cast("string"))) \
            .when(F.pmod("doc_id", F.lit(4)) == 1,
                  F.concat(F.lit("/p/"),
                           F.col("doc_id").cast("string"))) \
            .otherwise(self_url)
    decl = F.when(F.pmod("doc_id", F.lit(3)) != 2,
                  F.concat(F.lit(' <link rel="canonical" href="'),
                           href, F.lit('">'))).otherwise(F.lit(""))
    seeded = d.select(self_url.alias("url"),
                      F.concat(F.col("text"), decl).alias("text"))
    return urls.canonical_mismatch(seeded).orderBy("host")


def q_staleness_audit(spark, sf_dir):
    """Freshness-SLA audit (urls.staleness_audit, 30-day SLA): host h
    = doc_id%10 fetches on days 8h+doc_id%5, so the corpus watermark
    sits at day 76 and hosts 0–5 fall >30 days behind — watermark-
    anchored integer age, one host agg + one 1-row broadcast."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents")
    h = F.pmod("doc_id", F.lit(10))
    day = h * 8 + F.pmod("doc_id", F.lit(5))
    ts = F.timestamp_seconds(F.lit(1704067200) + day * 86400)
    seeded = d.select(
        F.concat(F.lit("http://host"), h.cast("string"),
                 F.lit(".example/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        ts.alias("warc_ts"))
    return (urls.staleness_audit(seeded, max_age_s=30 * 86400)
            .orderBy("host"))


def q_rater_kappa(spark, sf_dir):
    """Cohen's kappa (tablechecks.cohen_kappa) between the stored lang
    label and a synthetic second rater that answers 'unk' on every 5th
    document: po/pe/kappa from one (a,b) cell aggregation; the DuckDB
    twin re-derives the marginal products exactly."""
    d = _read(spark, sf_dir, "documents")
    rater_b = (F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("unk"))
               .otherwise(F.col("lang")))
    seeded = (d.where(F.col("lang").isNotNull())
              .select(F.col("lang").alias("rater_a"),
                      rater_b.alias("rater_b")))
    return tablechecks.cohen_kappa(seeded, "rater_a", "rater_b")


def q_coverage_langs(spark, sf_dir):
    """Combination-coverage audit (tablechecks.coverage_gaps): docs are
    bucketed by source parity and the (zh, odd) combination is
    structurally removed upstream — the audit must report exactly the
    absent combos (n=0) under min_count=1, at every SF."""
    d = _read(spark, sf_dir, "documents")
    parity = (F.when(F.pmod(F.regexp_extract("source", r"(\d+)", 1)
                            .cast("long"), F.lit(2)) == 0, "even")
              .otherwise("odd"))
    seeded = (d.where(F.col("lang").isNotNull())
              .select("lang", parity.alias("src_parity"))
              .where(~((F.col("lang") == "zh")
                       & (F.col("src_parity") == "odd"))))
    return (tablechecks.coverage_gaps(seeded, "lang", "src_parity",
                                      min_count=1)
            .orderBy("lang", "src_parity"))


def q_cms_lang_counts(spark, sf_dir):
    """Count-min sketch point estimates (tablechecks.cms_frequencies)
    for two present langs and one absent probe, width=64 so collisions
    actually occur — the DuckDB twin rebuilds the identical md5-bucket
    grid and takes the same min over depths."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.cms_frequencies(d, "lang", ["en", "de", "xx"],
                                        depth=3, width=64)
            .orderBy("value"))


def q_ewma_volume(spark, sf_dir):
    """EWMA daily-volume baseline (tablechecks.ewma_anomalies) over the
    events table. alpha=0.5 deliberately: powers of 0.5 are exact
    dyadic doubles and every weighted partial sum here stays within a
    53-bit span, so the weighted mean is bit-identical across
    engines and aggregation orders (no float-drift hash risk)."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.ewma_anomalies(ev, ts_col="ts", alpha=0.5,
                                       factor=1.2)
            .orderBy("day"))


def q_fdr_drift(spark, sf_dir):
    """Benjamini–Hochberg FDR control (tablechecks.bh_fdr, q=0.05)
    over a seeded per-test p-value column, one family per source:
    ~5% of tests (doc_id%20==0) carry genuinely tiny p ≤ 7e-4 (the
    "real" drift alarms), the rest uniform-ish ≥ 0.1 noise — BH must
    reject exactly the tiny block and nothing else. All p values are
    integer-ratio doubles so both engines compare identical bits."""
    d = _read(spark, sf_dir, "documents")
    p = F.when(F.pmod("doc_id", F.lit(20)) == 0,
               (F.pmod("doc_id", F.lit(7)) + 1) / F.lit(10000.0)) \
         .otherwise((F.pmod(F.col("doc_id") * 37, F.lit(900)) + 100)
                    / F.lit(1000.0))
    seeded = d.select("source", p.alias("p"))
    return (tablechecks.bh_fdr(seeded, "p", by="source", q=0.05)
            .orderBy("source"))


def q_welch_len_sources(spark, sf_dir):
    """Welch's unequal-variance t (tablechecks.welch_ttest) comparing
    mean n_chars between src0 and src1 — exact decimal moment sums
    (integer inputs), one-row double combination."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.welch_ttest(d, "n_chars", group_col="source",
                                   group_a="src0", group_b="src1")


def q_spearman_len_tokens(spark, sf_dir):
    """Spearman rank correlation (tablechecks.spearman_corr) between
    n_chars and whitespace token count — tie-corrected via exact
    doubled average ranks from value-distinct counts tables
    (DECIMAL(38,0) moments; only the 1-row combination is double)."""
    d = _read(spark, sf_dir, "documents")
    base = d.where(F.col("text").isNotNull()).select(
        F.col("n_chars").alias("x"),
        F.size(F.split("text", " ")).cast("long").alias("y"))
    return tablechecks.spearman_corr(base, "x", "y")


def q_pass_rate_ztest(spark, sf_dir):
    """Two-proportion pooled z-test (tablechecks.prop_ztest): did the
    n_chars ≥ 128 pass rate move between src0 and src1? Exact integer
    counts → bit-deterministic z."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.prop_ztest(
        d, F.col("n_chars") >= 128, group_col="source",
        group_a="src0", group_b="src1")


def q_runs_pass_audit(spark, sf_dir):
    """Wald–Wolfowitz runs test per user (tablechecks.runs_test):
    are 'view' outcomes randomly interleaved with other event types,
    or bursty? (ts, event_id)-ordered lag + one entity aggregation;
    users need ≥5 of each outcome."""
    ev = _read(spark, sf_dir, "events")
    return (tablechecks.runs_test(
        ev, F.col("event_type") == "view", entity_col="user_id",
        ts_col="ts", id_col="event_id", min_each=5)
        .orderBy("user_id"))


def q_hapax_langs(spark, sf_dir):
    """Hapax-legomena share per lang (text.hapax_rate): the type-level
    singleton share of each language's vocabulary — explode + two hash
    aggregations, the standard corpus-vocabulary shuffle pair."""
    from zoi_spark import text

    d = _read(spark, sf_dir, "documents")
    return text.hapax_rate(d).orderBy("lang")


def q_quality_migration(spark, sf_dir):
    """Quality-bucket migration matrix (tablechecks.bucket_migration,
    fixed edges 25/50/75 — NO global sort): page = doc_id//2 scored
    (page·31)%100 in snapshot 0; snapshot 1 shifts every 5th page's
    score by +37 mod 100, so exactly the page%5==0 cells migrate."""
    d = _read(spark, sf_dir, "documents").select("doc_id")
    page = F.floor(F.col("doc_id") / 2).cast("long")
    snap = F.pmod("doc_id", F.lit(2)).cast("int")
    s0 = F.pmod(page * 31, F.lit(100))
    score = F.when((snap == 1) & (F.pmod(page, F.lit(5)) == 0),
                   F.pmod(s0 + 37, F.lit(100))).otherwise(s0)
    seeded = d.select(snap.alias("snap"), page.alias("page"),
                      score.cast("double").alias("score"))
    return (tablechecks.bucket_migration(
        seeded, snap_col="snap", id_col="page", score_col="score",
        thresholds=[25.0, 50.0, 75.0])
        .orderBy("from_bucket", "to_bucket"))


def q_median_lang_lens(spark, sf_dir):
    """Mood's median test (tablechecks.median_test) on n_chars across
    langs — counts above the exact corpus median per group, one
    chi-square verdict row (dof = g−1)."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.median_test(d, "n_chars", group_col="lang")


def q_host_pass_shrunk(spark, sf_dir):
    """Empirical-Bayes shrunken pass rates (tablechecks.
    shrunk_pass_rates, prior strength 100): per seeded host
    (doc_id%10), the n_chars ≥ 128 pass rate pulled toward the corpus
    mean — the league-table-safe worst-host ranking."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.select(
        F.concat(F.lit("host"), F.pmod("doc_id", F.lit(10))
                 .cast("string")).alias("host"),
        (F.col("n_chars") >= 128).alias("ok"))
    return (tablechecks.shrunk_pass_rates(
        seeded, "ok", by="host", prior_strength=100.0)
        .orderBy("host"))


def q_url_ext_mix(spark, sf_dir):
    """Path-extension census (urls.url_ext_census): seven seeded url
    shapes per doc_id%7 — extensionless file, .html, .php, case-folded
    .HTML, .jpg, a directory path, and .tar.gz (ext = 'gz') — one
    regexp projection + vocabulary-sized aggregation."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    k = F.pmod("doc_id", F.lit(7))
    tail = (F.when(k == 0, F.lit("page"))
            .when(k == 1, F.lit("a.html"))
            .when(k == 2, F.lit("index.php"))
            .when(k == 3, F.lit("UP.HTML"))
            .when(k == 4, F.lit("img.jpg"))
            .when(k == 5, F.lit("dir/"))
            .otherwise(F.lit("pkg.tar.gz")))
    seeded = d.select(
        F.concat(F.lit("http://h"),
                 F.pmod("doc_id", F.lit(3)).cast("string"),
                 F.lit(".example/p/"), tail).alias("url"))
    return urls.url_ext_census(seeded).orderBy("ext")


def q_jsd_lang_drift(spark, sf_dir):
    """Distributed Jensen–Shannon drift (tablechecks.distribution_jsd)
    between the lang distributions of two seeded snapshots
    (doc_id%2) — the symmetric, bounded complement to drift_lang_psi;
    one (lang) aggregation + 1-row broadcast, never driver-side."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.select(F.pmod("doc_id", F.lit(2)).cast("int").alias("snap"),
                      "lang")
    return tablechecks.distribution_jsd(seeded, "lang", snap_col="snap")


def q_url_depth_mix(spark, sf_dir):
    """Path-depth census (urls.url_depth_census): six seeded url
    shapes per doc_id%6 — root, depth 1, depth 2, depth 3 with a
    query string, a trailing-slash depth 1, and depth 5 — one
    higher-order-function projection + tiny aggregation."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    k = F.pmod("doc_id", F.lit(6))
    tail = (F.when(k == 0, F.lit(""))
            .when(k == 1, F.lit("/a"))
            .when(k == 2, F.lit("/a/b"))
            .when(k == 3, F.lit("/a/b/c?x=1"))
            .when(k == 4, F.lit("/a/"))
            .otherwise(F.lit("/a/b/c/d/e")))
    seeded = d.select(
        F.concat(F.lit("http://h"),
                 F.pmod("doc_id", F.lit(3)).cast("string"),
                 F.lit(".example"), tail).alias("url"))
    return urls.url_depth_census(seeded).orderBy("depth")


def q_idn_hosts(spark, sf_dir):
    """Suspicious-host census (urls.idn_host_census) over ten seeded
    hosts (doc_id%10, five shapes ×2): clean, punycode `xn--` label,
    digit-heavy, hyphen-stuffed, and over-long — hosts distinct-ed
    FIRST, flags once per host, single verdict row."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    k = F.pmod("doc_id", F.lit(10))
    shape = F.pmod(k, F.lit(5))
    ks = k.cast("string")
    host = (F.when(shape == 0, F.concat(F.lit("site"), ks,
                                        F.lit(".example.com")))
            .when(shape == 1, F.concat(F.lit("xn--site"), ks,
                                       F.lit(".example")))
            .when(shape == 2, F.concat(ks, F.lit("23456789.net")))
            .when(shape == 3, F.concat(F.lit("s-i-t-e"), ks,
                                       F.lit(".shop")))
            .otherwise(F.concat(F.lit("a" * 40), ks, F.lit(".org"))))
    seeded = d.select(F.concat(F.lit("http://"), host,
                               F.lit("/p")).alias("url"))
    return urls.idn_host_census(seeded)


def q_lsh_curve(spark, sf_dir):
    """MinHash-LSH S-curve planning table (dedup.lsh_tuning_curve,
    64 hashes, threshold 0.8 → the suggest_minhash_bands banding):
    19 grid rows of P(candidate) = 1−(1−s^r)^b — plan-time math over
    spark.range, zero corpus scans."""
    return (dedup.lsh_tuning_curve(spark, num_hashes=64, threshold=0.8)
            .orderBy("s"))


def q_neyman_alloc(spark, sf_dir):
    """Neyman optimal audit-budget allocation (sampling.
    neyman_allocation, budget 1000) of n_chars review rows across
    langs — σ from exact integer power sums, allocation ∝ N_h·σ_h,
    floored so Σ ≤ budget and the row set is bit-deterministic."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    return (sampling.neyman_allocation(d, "n_chars", stratum_col="lang",
                                       budget=1000)
            .orderBy("stratum"))


def q_bm25_spark_docs(spark, sf_dir):
    """BM25 top-20 (text.bm25_topk, Lucene idf, k1=1.2 b=0.75) for the
    query {hash, spark, window} — postings filtered to the term set
    BEFORE the tf shuffle, TakeOrdered cut on (rounded score, id)."""
    d = _read(spark, sf_dir, "documents")
    return text.bm25_topk(d, ["hash", "spark", "window"], k=20)


def q_postings_sample(spark, sf_dir):
    """Capped inverted index (text.build_postings, min_df 2, first 8
    sorted doc ids per token): (token, df, cf, postings) over the
    corpus vocabulary — explode + two hash aggregations."""
    d = _read(spark, sf_dir, "documents")
    return text.build_postings(d, min_df=2, max_postings=8) \
        .orderBy("token")


def q_theil_len_sources(spark, sf_dir):
    """Theil-T inequality of n_chars across sources with exact
    between/within decomposition (tablechecks.theil_decomposition) —
    two power sums per source, group-sized math, one verdict row."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.theil_decomposition(d, "n_chars",
                                           group_col="source")


def q_code_switch_docs(spark, sf_dir):
    """Code-switching scan (text.code_switch_profile): seeded
    composite docs gluing doc 2p and doc 2p+1 with '. ', the second
    half salted with its OWN lang's marker words (twice, to outvote
    the shared tech vocab's stray 'the's) — so a de/fr/es right half
    flips its segment verdict and the doc counts as mixed whenever
    the two halves' languages disagree."""
    d = _read(spark, sf_dir, "documents")
    pid = F.floor(F.col("doc_id") / 2).cast("long")
    mk = (F.when(F.col("lang") == "de",
                 F.lit("der die und das nicht der die und das nicht"))
          .when(F.col("lang") == "fr",
                F.lit("le la et les des le la et les des"))
          .when(F.col("lang") == "es",
                F.lit("el los que por una el los que por una"))
          .when(F.col("lang") == "en",
                F.lit("the and of to in the and of to in"))
          .otherwise(F.lit("")))
    left = (d.where(F.pmod("doc_id", F.lit(2)) == 0)
            .select(pid.alias("pid"), F.col("text").alias("t0")))
    right = (d.where(F.pmod("doc_id", F.lit(2)) == 1)
             .select(pid.alias("pid"),
                     F.concat(mk, F.lit(" "), F.col("text"))
                     .alias("t1")))
    seeded = (left.join(right, "pid")
              .select(F.col("pid").alias("doc_id"),
                      F.concat("t0", F.lit(". "), F.col("t1"))
                      .alias("text")))
    return text.code_switch_profile(seeded)


def q_partition_plan(spark, sf_dir):
    """Parquet layout advisor (tablechecks.partition_advisor, 1 MiB
    target so small-SF output is non-degenerate): measured row bytes →
    rows-per-partition and partition count for the curated sink."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.partition_advisor(d, bytes_col="text",
                                         target_mb=1)


def q_shape_templates(spark, sf_dir):
    """Template-shape census (text.shape_template_census, 40-char
    prefix): four seeded header styles per doc_id%4 (id header, date
    bracket, starred, raw) — letter/digit runs collapse so each style
    lands on its own shape family."""
    d = _read(spark, sf_dir, "documents")
    k = F.pmod("doc_id", F.lit(4))
    ds = F.col("doc_id").cast("string")
    seeded = d.select(
        (F.when(k == 0, F.concat(F.lit("ID "), ds, F.lit(" - "),
                                 F.col("text")))
         .when(k == 1, F.concat(F.lit("[2024-01-15] "), F.col("text")))
         .when(k == 2, F.concat(F.lit("*** "), F.col("text")))
         .otherwise(F.col("text"))).alias("text"))
    return text.shape_template_census(seeded).orderBy("template")


def q_term_burstiness(spark, sf_dir):
    """Church–Gale burstiness (text.term_burstiness, df ≥ 5, top 15):
    cf/df per vocabulary term, deterministic (rounded burst, token)
    cut — the keyword-stuffing / boilerplate-token gauge."""
    d = _read(spark, sf_dir, "documents")
    return text.term_burstiness(d, min_df=5, k=15)


def q_lexical_hhi(spark, sf_dir):
    """Per-doc unigram Herfindahl concentration histogram
    (text.lexical_concentration): HHI from exact integer power sums,
    10 fixed buckets — the word-stuffing detector."""
    d = _read(spark, sf_dir, "documents")
    return text.lexical_concentration(d).orderBy("bucket")


def q_url_prefix_compression(spark, sf_dir):
    """Delta-encoding win estimate (urls.prefix_compression_stats):
    seeded per-host url manifests (5 hosts × section/page paths) —
    host-partitioned sort, lag window, 8/16/32-char prefix-agreement
    shares."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    seeded = d.select(
        F.concat(F.lit("http://h"),
                 F.pmod("doc_id", F.lit(5)).cast("string"),
                 F.lit(".example/section"),
                 F.pmod("doc_id", F.lit(20)).cast("string"),
                 F.lit("/page"),
                 F.col("doc_id").cast("string")).alias("url"))
    return urls.prefix_compression_stats(seeded)


def q_split_leakage_docs(spark, sf_dir):
    """Train/eval leakage audit (sampling.split_leakage over the
    hash_split assignment and the content fingerprint): every 25th
    doc gets an identical-text copy under a NEW id (+5·10^5) — the
    copy hashes into its own split, so ~88% of the dup groups straddle
    a split boundary (exactly the eval-inflating groups the audit
    exists to count; the testdata itself carries no exact dups)."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (d.where(F.pmod("doc_id", F.lit(25)) == 0)
              .select((F.col("doc_id") + 500000).alias("doc_id"),
                      "text"))
    seeded = (d.unionByName(copies)
              .select("doc_id",
                      text.fingerprint(F.col("text")).alias("fp")))
    return sampling.split_leakage(seeded, id_col="doc_id", fp_col="fp",
                                  weights=_SPLIT_WEIGHTS)


def q_golden_urls(spark, sf_dir):
    """Golden-record survivorship merge (tablechecks.
    survivorship_merge): 50 seeded entities × ~10 versions ordered by
    doc_id, lang nulled every 3rd version and n_chars every 4th — the
    merged row must carry the LATEST NON-NULL of each, not the latest
    row's nulls."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.select(
        F.concat(F.lit("u"), F.pmod("doc_id", F.lit(50)).cast("string"))
        .alias("entity"),
        F.col("doc_id").alias("version_ts"),
        F.when(F.pmod("doc_id", F.lit(3)) != 0, F.col("lang"))
        .alias("lang"),
        F.when(F.pmod("doc_id", F.lit(4)) != 0, F.col("n_chars"))
        .alias("n_chars"))
    return (tablechecks.survivorship_merge(
        seeded, "entity", ts_col="version_ts",
        value_cols=["lang", "n_chars"])
        .orderBy("entity"))


def q_km_purchase(spark, sf_dir):
    """Kaplan–Meier time-to-first-purchase (tablechecks.kaplan_meier,
    1 h buckets): per-user first event → first purchase, never-buyers
    right-censored at the corpus horizon; survival = windowed
    exp(Σ ln(1−d/n)) over the bounded bucket curve."""
    d = _read(spark, sf_dir, "events")
    return (tablechecks.kaplan_meier(
        d, entity_col="user_id", ts_col="ts",
        event_pred=F.col("event_type") == "purchase", bucket_s=3600)
        .orderBy("t_bucket"))


def q_bag_dedup_groups(spark, sf_dir):
    """Reorder-invariant dedup (dedup.bag_fingerprint_groups): every
    10th doc gets a token-REVERSED copy (id + 10^6) — exact
    fingerprints differ, bag fingerprints collapse, so exactly those
    groups (plus any natural reorders) surface."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    rev = (d.where(F.pmod("doc_id", F.lit(10)) == 0)
           .select((F.col("doc_id") + 1000000).alias("doc_id"),
                   F.array_join(
                       F.reverse(F.split(text.normalize_text(
                           F.col("text")), " ")), " ").alias("text")))
    seeded = d.unionByName(rev)
    return (dedup.bag_fingerprint_groups(seeded, max_ids=8)
            .orderBy("bag_fp"))


def q_logreg_len_gate(spark, sf_dir):
    """One exact Newton step of logistic regression (tablechecks.
    logreg_newton_step) learning a length gate: x = n_chars/100,
    y = (n_chars + 37·(doc_id%11) > 450) — power sums in one pass,
    closed-form 2×2 solve, no iteration."""
    d = _read(spark, sf_dir, "documents")
    x = F.col("n_chars") / 100.0
    y = (F.col("n_chars") + 37 * F.pmod("doc_id", F.lit(11)) > 450)
    return tablechecks.logreg_newton_step(d, x, y)


def q_zorder_advisor(spark, sf_dir):
    """Data-skipping advisor (tablechecks.clustering_skipping_estimate,
    50-row files, predicate n_chars BETWEEN 200 AND 250): min/max
    pruning hit rate in ingestion order vs n_chars-clustered order —
    the Iceberg write.sort-order decision, quantified."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.clustering_skipping_estimate(
        d, order_col="doc_id", cluster_col="n_chars",
        value_lo=200, value_hi=250, file_rows=50)
        .orderBy("ordering"))


def q_rule_cooccurrence(spark, sf_dir):
    """Validation-rule co-firing matrix (tablechecks.
    rule_cooccurrence) over the flagship rule-set's violation rows —
    root-cause triage read straight off the engine output."""
    viol = q_documents_flagship(spark, sf_dir)
    return (tablechecks.rule_cooccurrence(viol)
            .orderBy("rule_a", "rule_b"))


def q_bootstrap_len_ci(spark, sf_dir):
    """Deterministic Poisson-bootstrap CI (tablechecks.
    poisson_bootstrap_ci, B=32, α=0.1) for mean n_chars — md5-derived
    Poisson(1) weights, exact-long resample sums, bit-reproducible
    interval."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.poisson_bootstrap_ci(d, "n_chars",
                                            n_resamples=32, alpha=0.1)


def q_event_lateness(spark, sf_dir):
    """Event-time lateness histogram (tablechecks.lateness_profile,
    1 h buckets). The synthetic events arrive in event-time order, so
    arrival is seeded as the md5 permutation of event_id — a
    deterministic out-of-order delivery that actually exercises the
    watermark-sizing readout."""
    d = _read(spark, sf_dir, "events")
    arrival = F.conv(F.substring(
        F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10) \
        .cast("long")
    seeded = d.select("user_id", "ts", arrival.alias("arrival"))
    return (tablechecks.lateness_profile(
        seeded, entity_col="user_id", ts_col="ts", order_col="arrival",
        bucket_s=3600 * 24)
        .orderBy("lateness_bucket"))


def q_agg_merge_check(spark, sf_dir):
    """Algebraic partial-aggregate merge invariant (tablechecks.
    mergeable_stats_check, halves = doc_id parity): merged
    (n, Σ, min, max, Σx²) must equal the direct pass exactly — the
    property the checkpoint/resume manifest relies on."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.mergeable_stats_check(
        d, "n_chars", split_pred=F.pmod("doc_id", F.lit(2)) == 0)


def q_k_anonymity_docs(spark, sf_dir):
    """k-anonymity audit (tablechecks.k_anonymity, k=5) on the quasi
    tuple (lang, source, n_chars//100): class-size census + rows in
    classes smaller than k — the structural privacy complement to
    pii_scan."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.select("lang", "source",
                      F.floor(F.col("n_chars") / 100).cast("long")
                      .alias("len_bucket"))
    return tablechecks.k_anonymity(seeded,
                                   ["lang", "source", "len_bucket"],
                                   k=5)


def q_substring_spans(spark, sf_dir):
    """Exact-substring shared spans (dedup.exact_substring_spans, the
    Lee et al. 2021 suffix-array signal relationally): every 12-token
    window hashed (48-bit md5 prefix), windows meet in one equi-join,
    consecutive matches merge on constant diagonals into maximal
    spans. Corpus = the seeded-dup documents, so exact duplicates
    yield whole-document spans and natural near-dups yield partial
    ones; window hashes in >20 docs are DF-pruned (both engines)."""
    from zoi_spark import dedup

    d = _dup_docs(spark, sf_dir).select("doc_id", "text")
    return dedup.exact_substring_spans(d, min_len=12,
                                       max_window_docs=20)


_ROBOTS_BODIES = [
    "User-agent: *\nDisallow: /private\nAllow: /private/pub\n",
    "User-agent: zoibot\nDisallow: /\n\nUser-agent: *\nDisallow: /tmp\n",
    "# comments only\nUser-agent: *\nDisallow:\n",
    ("User-agent: zoibot\nUser-agent: altbot\n"
     "Disallow: /deep\nAllow: /deep/ok\n"),
    "User-agent: *\nDisallow: /a\nDisallow: /b\nCrawl-delay: 5\n",
    "",
]

_ROBOTS_PATHS = ["/private/pub/x", "/private/x", "/tmp/x", "/deep/ok/y",
                 "/a/z"]


def q_robots_check_urls(spark, sf_dir):
    """robots.txt compliance (urls.robots_rules + robots_check, the
    RFC 9309 prefix subset): six literal robots bodies — wildcard
    group, agent-specific group beating '*', comment/empty bodies,
    stacked user-agents, multiple disallows — parsed into rules, then
    every (host, path) combination synthesized from doc_id is
    evaluated for agent 'zoibot' (longest-prefix wins, allow beats
    disallow on ties, absent host ⇒ allowed). The DuckDB twin
    re-implements the PARSER (group windows) and the precedence pick
    in SQL, so both stages sit under the value hash."""
    from zoi_spark import urls as _urls

    robots = spark.createDataFrame(
        [(f"h{i}.example.com", b) for i, b in enumerate(_ROBOTS_BODIES)],
        "host string, robots_txt string")
    rules = _urls.robots_rules(robots)
    d = _read(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(F.lit("h"), F.pmod("doc_id", F.lit(7)).cast("string"),
                    F.lit(".example.com"))
    sel = F.pmod("doc_id", F.lit(5))
    path = F.lit(_ROBOTS_PATHS[0])
    for i, p in enumerate(_ROBOTS_PATHS[1:], 1):
        path = F.when(sel == i, F.lit(p)).otherwise(path)
    uu = d.select(F.concat(F.lit("http://"), host, path).alias("url")) \
          .distinct()
    return _urls.robots_check(uu, rules, agent="zoibot")


def q_sitemap_frontier(spark, sf_dir):
    """Sitemap frontier mining (urls.sitemap_locs): every 10th doc_id
    carries a synthesized two-<loc> sitemap body (one url already in
    the corpus, one new), locs are regex-mined + exploded, and the
    anti-join against the corpus url set yields the per-host new
    frontier: ``(host, n_locs, n_new)``."""
    from zoi_spark import urls as _urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    site = F.concat(F.lit("http://s"),
                    F.pmod("doc_id", F.lit(20)).cast("string"),
                    F.lit(".example.com/page/"))
    body = F.concat(
        F.lit("<urlset><url><loc>"), site, F.col("doc_id").cast("string"),
        F.lit("</loc></url><url><loc> "), site,
        (F.col("doc_id") * 1000 + 7).cast("string"),
        F.lit(" </loc></url></urlset>"))
    sm = (d.where(F.col("doc_id") % 10 == 0)
          .select("doc_id", body.alias("text")))
    locs = _urls.sitemap_locs(sm)
    known = d.select(F.concat(site, F.col("doc_id").cast("string"))
                     .alias("url"))
    n_locs = (locs.groupBy("host")
              .agg(F.count("*").cast("long").alias("n_locs")))
    n_new = (locs.join(known, locs["loc"] == known["url"], "left_anti")
             .groupBy("host")
             .agg(F.count("*").cast("long").alias("n_new")))
    return (n_locs.join(n_new, "host", "left")
            .select("host", "n_locs",
                    F.coalesce("n_new", F.lit(0).cast("long"))
                    .alias("n_new")))


def q_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood blocking (dedup.sorted_neighborhood_pairs,
    Hernández-Stolfo merge/purge): the seeded-dup corpus sorted on the
    normalized text within 4-char prefix blocks, window-2 successor
    pairs — exact duplicates sort adjacent and surface as same_key
    pairs; output ``(id_a, id_b, offset, same_key)``."""
    from zoi_spark import dedup, text as _text

    d = (_dup_docs(spark, sf_dir)
         .select("doc_id", _text.normalize_text(F.col("text")).alias("k")))
    pairs = dedup.sorted_neighborhood_pairs(d, key_col="k", window=2,
                                            block_chars=4)
    return pairs.select("id_a", "id_b",
                        F.col("offset").cast("long").alias("offset"),
                        (F.col("key_a") == F.col("key_b")).alias("same_key"))


def q_link_density_main(spark, sf_dir):
    """Link-density main-content extraction (text.link_density_strip,
    the jusText/boilerpipe block heuristic): each document's text is
    wrapped in synthetic page chrome — an all-anchor nav div (dropped:
    link density 1), the body paragraph (kept), a one-anchor footer
    (kept: density 0.2), and a tiny anchor div (dropped: too short) —
    and the extractor must keep exactly the prose blocks. Output
    ``(doc_id, n_blocks, n_kept, main_len, main_md5)``; the DuckDB
    twin recomputes the block split, per-block visible/anchor lengths
    and the position-ordered rebuild in SQL."""
    from zoi_spark import text as _text

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.concat(
        F.lit('<div><a href="/">Home</a> <a href="/about">About</a>'
              '</div><p>'),
        F.col("text"),
        F.lit('</p><p>Copyright 2026 Example Corp, all rights reserved '
              '<a href="/terms">terms</a></p><div><a href="/x">x</a>'
              '</div>'))
    out = _text.link_density_strip(d.select("doc_id", html.alias("html")),
                                   html_col="html")
    return out.select("doc_id", "n_blocks", "n_kept",
                      F.length("main_text").cast("long").alias("main_len"),
                      F.md5("main_text").alias("main_md5"))


def q_violation_examples(spark, sf_dir):
    """Per-rule violation exemplars (triage view): for every flagship
    rule, the three smallest violating doc_ids — the report a data
    steward reads first. One windowed rank over the violation rows
    (rule cardinality partitions, each tiny)."""
    d = _read(spark, sf_dir, "documents")
    res = z.validate(d, documents_schema(), id_cols=["doc_id"])
    w = Window.partitionBy("rule_id").orderBy("doc_id")
    return (res.violations.select("doc_id", "rule_id")
            .withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= 3)
            .select("rule_id", "rnk", "doc_id"))


def q_l_diversity_docs(spark, sf_dir):
    """l-diversity privacy audit (tablechecks.l_diversity_audit,
    Machanavajjhala et al. 2007): QI = (lang, 100-char length bucket),
    sensitive attribute = source, l = 3 — both the distinct and the
    entropy instantiation gate each group."""
    from zoi_spark import tablechecks

    d = (_read(spark, sf_dir, "documents")
         .select("lang", "source",
                 F.floor(F.col("n_chars") / 100).cast("long")
                 .alias("len_bucket")))
    return tablechecks.l_diversity_audit(
        d, qi_cols=["lang", "len_bucket"], sensitive_col="source", l=3)


def q_crawl_plan(spark, sf_dir):
    """Politeness-constrained crawl-capacity plan
    (urls.crawl_schedule_plan): hosts synthesized from doc_id (50
    hosts, uneven via the doc_id%7 == 0 doubling), 0.5s delay, 8
    slots — one summary row with the LPT makespan lower bound and the
    binding constraint."""
    from zoi_spark import urls as _urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    dbl = d.where(F.col("doc_id") % 7 == 0)
    host = F.concat(F.lit("h"), F.pmod("doc_id", F.lit(50)).cast("string"),
                    F.lit(".example.com"))
    hh = d.unionAll(dbl).select(host.alias("host"))
    return _urls.crawl_schedule_plan(hh, delay_s=0.5, parallelism=8)


def q_bpe_pairs(spark, sf_dir):
    """Adjacent char-pair census (text.bpe_pair_counts) — the argmax
    statistic of one BPE merge step — top 25 pairs over the documents
    token stream."""
    from zoi_spark import text as _text

    d = _read(spark, sf_dir, "documents")
    return _text.bpe_pair_counts(d, top_k=25)


def q_stream_window_violations(spark, sf_dir):
    """Event-time windowed violation counts over a STREAM
    (streaming.windowed_violation_counts): documents stream from a
    staged landing dir, event time synthesized from doc_id (10 one-
    minute windows), watermarked windowed agg (append mode, state
    bounded), sunk with availableNow. Append mode emits exactly the
    windows the FINAL watermark (max event time − 2 min) has closed —
    the last three windows stay in state, and the DuckDB oracle
    encodes that eviction rule, so the value hash pins the watermark
    semantics themselves, not just the counts."""
    import shutil
    import tempfile

    from zoi_spark import streaming

    out_dir = os.path.join(tempfile.gettempdir(), "zoi_stream_win")
    shutil.rmtree(out_dir, ignore_errors=True)
    in_dir = os.path.join(out_dir, "in")
    os.makedirs(in_dir)
    shutil.copy(f"{sf_dir}/documents.parquet",
                os.path.join(in_dir, "documents.parquet"))
    batch_schema = _read(spark, sf_dir, "documents").schema
    sdf = (spark.readStream.schema(batch_schema).parquet(in_dir)
           .withColumn("ts", F.timestamp_seconds(
               F.lit(1767225600) + F.pmod("doc_id", F.lit(600)))))
    win = streaming.windowed_violation_counts(
        sdf, documents_schema(), ts_col="ts",
        window="1 minute", watermark="2 minutes")
    q = (win.writeStream.format("parquet")
         .option("path", f"{out_dir}/data")
         .option("checkpointLocation", f"{out_dir}/ckpt")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return (spark.read.parquet(f"{out_dir}/data")
            .select("window_start", "window_end", "rule_id",
                    F.col("n_violations").cast("long")
                    .alias("n_violations")))


def q_weighted_jaccard(spark, sf_dir):
    """Weighted (multiset) Jaccard pairs (dedup.weighted_jaccard_pairs)
    at J_w ≥ 0.8 within the (lang, length-bucket) block — Σ min / Σ max
    over token COUNTS, with the union mass derived as
    tot_a + tot_b − Σ min so only the intersection join runs."""
    from zoi_spark import dedup

    d = _dup_docs(spark, sf_dir)
    return dedup.weighted_jaccard_pairs(d, threshold=0.8,
                                        block_col="block")


def q_soft_dedup_weights(spark, sf_dir):
    """Duplication-aware sampling weights (dedup.dup_inverse_weights,
    soft dedup): every row of the seeded-dup corpus keeps weight
    1/n_copies so each distinct content contributes unit training
    mass; the min-id member is flagged canonical."""
    from zoi_spark import dedup

    d = _dup_docs(spark, sf_dir).select("doc_id", "text")
    return dedup.dup_inverse_weights(d)


def q_structure_docs(spark, sf_dir):
    """Document structure census (text.structure_profile): four seeded
    shapes per doc_id%4 — prose (the real text), a fenced+braced code
    block, a pipe table, a bullet list — every signal column and both
    verdicts land under the value hash."""
    from zoi_spark import text as _text

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    code = ("```\ndef f(x) {\n    return x;\n}\n```")
    table = "| a | b |\n| 1 | 2 |\n| 3 | 4 |"
    bullets = "- one\n- two\n1. three\nplain tail"
    sel = F.pmod("doc_id", F.lit(4))
    synth = (F.when(sel == 1, F.lit(code))
             .when(sel == 2, F.lit(table))
             .when(sel == 3, F.lit(bullets))
             .otherwise(F.col("text")))
    out = _text.structure_profile(d.select("doc_id",
                                           synth.alias("text")))
    return out.select("doc_id", "n_lines", "code_fences",
                      "indent_ratio", "brace_semi_density",
                      "table_lines", "bullet_ratio", "is_codeish",
                      "is_tableish")


def q_cluster_audit(spark, sf_dir):
    """Clustering-invariant audit (dedup.cluster_consistency_audit):
    near-dup pairs (LSH + exact verify at J ≥ 0.8, = the exhaustive
    pair set per the banding recall argument) → connected components →
    the audit must find ZERO pairs whose endpoints land in different
    clusters. The DuckDB twin recomputes the closure with a recursive
    CTE and re-derives every summary stat, so the value hash pins the
    transitive-closure contract itself."""
    from zoi_spark import dedup

    d = _dup_docs(spark, sf_dir)
    pairs = dedup.minhash_dedup_pairs(d, threshold=0.8, num_hashes=64,
                                      bands=16)
    clusters = dedup.duplicate_clusters(pairs)
    return dedup.cluster_consistency_audit(pairs, clusters)


_ROBOTS_WILD = [
    ("w0.example.com",
     "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*\n"
     "Allow: /tmp/keep$\n"),
    ("w1.example.com",
     "User-agent: *\nDisallow: /a/*/secret\nAllow: /a/*/secret/ok$\n"),
]

_WILD_PATHS = ["/doc.pdf", "/doc.pdfx", "/tmp/x", "/tmp/keep",
               "/a/b/secret/no", "/a/b/secret/ok", "/clean"]


def q_robots_wildcards(spark, sf_dir):
    """RFC 9309 WILDCARD rules (urls.robots_check): ``*`` mid-pattern,
    trailing ``$`` anchors, and length-based specificity — patterns
    compile to LIKE expressions identically in Spark and the DuckDB
    twin, so the wildcard semantics themselves sit under the value
    hash (``/doc.pdfx`` must escape the anchored ``/*.pdf$``;
    ``/tmp/keep`` must win its longer anchored Allow)."""
    from zoi_spark import urls as _urls

    robots = spark.createDataFrame(_ROBOTS_WILD,
                                   "host string, robots_txt string")
    rules = _urls.robots_rules(robots)
    d = _read(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(F.lit("w"), F.pmod("doc_id", F.lit(2)).cast("string"),
                    F.lit(".example.com"))
    sel = F.pmod("doc_id", F.lit(7))
    path = F.lit(_WILD_PATHS[0])
    for i, p in enumerate(_WILD_PATHS[1:], 1):
        path = F.when(sel == i, F.lit(p)).otherwise(path)
    uu = d.select(F.concat(F.lit("http://"), host, path).alias("url")) \
          .distinct()
    return _urls.robots_check(uu, rules, agent="*")


def q_homoglyph_dups(spark, sf_dir):
    """Adversarial dedup via homoglyph folding
    (text.homoglyph_fingerprint): every 25th document re-enters with
    its latin a/e/o swapped for Cyrillic а/е/о (byte-different,
    pixel-identical — the classic exact-dedup evasion); groups under
    the folded key with >1 member AND >1 exact variant are exactly
    those seeded evasions."""
    from zoi_spark import text as _text

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (d.where(F.col("doc_id") % 25 == 0)
              .select((F.col("doc_id") + 20000).alias("doc_id"),
                      F.translate("text", "aeo", "аео").alias("text")))
    u = d.unionAll(copies)
    hfp = _text.homoglyph_fingerprint(F.col("text"))
    efp = _text.fingerprint(F.col("text"))
    return (u.select("doc_id", hfp.alias("hfp"), efp.alias("__e"))
            .groupBy("hfp")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.count_distinct("__e").cast("long")
                 .alias("n_exact_variants"),
                 F.min("doc_id").alias("keep_id"))
            .where((F.col("n_docs") > 1)
                   & (F.col("n_exact_variants") > 1)))


def q_emb_energy_hist(spark, sf_dir):
    """Matryoshka-truncation QC (similarity.emb_prefix_energy): the
    histogram of per-vector squared-mass share in the first half of
    the dimensions — the store-truncated-embeddings decision
    statistic."""
    from zoi_spark import similarity as _sim

    d = _read(spark, sf_dir, "embeddings")
    return _sim.emb_prefix_energy(d)


def q_incremental_lsh_join(spark, sf_dir):
    """Persisted-index incremental dedup (dedup.write_minhash_index +
    lsh_join_index): the base corpus (doc_id < 400) is signed ONCE
    into an on-disk LSH index (buckets + shingle sets + hash-family
    meta); the new snapshot (doc_id ≥ 400, plus 50 re-crawled copies
    of base pages under new ids) joins against the stored index —
    only the new side is ever signed. Every re-crawl must pair with
    its base original at J = 1.0; the oracle recomputes the full
    cross-corpus exact Jaccard."""
    import shutil
    import tempfile

    from zoi_spark import dedup

    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.where(F.col("doc_id") < 400)
    idx_dir = os.path.join(tempfile.gettempdir(), "zoi_lsh_index")
    shutil.rmtree(idx_dir, ignore_errors=True)
    dedup.write_minhash_index(base, idx_dir)
    recrawl = (d.where(F.col("doc_id") < 50)
               .select((F.col("doc_id") + 30000).alias("doc_id"),
                       "text"))
    new = d.where(F.col("doc_id") >= 400).unionByName(recrawl)
    return dedup.lsh_join_index(new, idx_dir, threshold=0.8)


def q_exact_len_quantiles(spark, sf_dir):
    """Scale-exact discrete quantiles
    (tablechecks.exact_discrete_quantiles): value-histogram +
    cumulative pick — exact type-1 quantiles without a corpus sort or
    a sketch; the window runs over the value VOCABULARY, not rows."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.exact_discrete_quantiles(
        d, "n_chars", qs=(0.25, 0.5, 0.9, 0.99))


def q_corpus_card(spark, sf_dir):
    """Dataset-card summary (Datasheets-for-Datasets shape): one
    (section, metric, value) row per headline corpus fact — sizes,
    length profile, exact-dup rate, flagship-rule pass rate — each
    re-derived independently by the DuckDB twin."""
    d = _read(spark, sf_dir, "documents")
    from zoi_spark import text as _text

    fp = _text.fingerprint(F.col("text"))
    sizes = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.count_distinct("lang").cast("double").alias("n_langs"),
        F.count_distinct("source").cast("double").alias("n_sources"),
        F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        F.expr("percentile(n_chars, 0.5)").alias("p50_chars"),
        F.round(F.lit(1) - F.count_distinct(fp) / F.count("*"), 6)
        .alias("dup_rate"))
    res = z.validate(d, documents_schema(), id_cols=["doc_id"])
    bad = (res.violations.select("doc_id").distinct()
           .agg(F.count("*").cast("double").alias("n_bad")))
    card = sizes.crossJoin(F.broadcast(bad))  # both 1 row
    rows = [("size", "n_docs", F.col("n_docs")),
            ("size", "n_langs", F.col("n_langs")),
            ("size", "n_sources", F.col("n_sources")),
            ("length", "mean_chars", F.col("mean_chars")),
            ("length", "p50_chars", F.col("p50_chars")),
            ("dedup", "dup_rate", F.col("dup_rate")),
            ("validate", "pass_rate",
             F.round((F.col("n_docs") - F.col("n_bad"))
                     / F.col("n_docs"), 6))]
    stacked = F.explode(F.array(*[
        F.struct(F.lit(s).alias("section"), F.lit(m).alias("metric"),
                 v.cast("double").alias("value"))
        for s, m, v in rows]))
    return (card.select(stacked.alias("__r"))
            .select("__r.section", "__r.metric", "__r.value"))


def q_verdict_flips(spark, sf_dir):
    """Cross-run manifest drift (tablechecks.verdict_transitions):
    two synthesized partition manifests with overlapping key ranges —
    the transition matrix must show the seeded pass→fail regressions,
    fail→pass fixes, and appeared/disappeared partitions, with sorted
    sample keys."""
    pids = (_read(spark, sf_dir, "documents")
            .select(F.pmod("doc_id", F.lit(24)).alias("partition_id"))
            .distinct())
    old = (pids.where(F.col("partition_id") < 20)
           .withColumn("status",
                       F.when(F.col("partition_id") % 3 != 0,
                              F.lit("pass")).otherwise(F.lit("fail"))))
    new = (pids.where(F.col("partition_id") >= 4)
           .withColumn("status",
                       F.when(F.col("partition_id") % 4 != 0,
                              F.lit("pass")).otherwise(F.lit("fail"))))
    return tablechecks.verdict_transitions(old, new)


def q_negatives_sample(spark, sf_dir):
    """Deterministic contrastive negative sampling
    (sampling.contrastive_negatives): 3 md5-derived negatives per
    anchor over the dense doc_id domain — reproducible across runs
    and engines, never the anchor itself."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents").select("doc_id")
    return sampling.contrastive_negatives(d, k=3)


def q_bm25_ndcg(spark, sf_dir):
    """Retrieval-quality evaluation (tablechecks.ndcg_at_k): BM25
    top-20 for ('hash','spark','window') graded against term-presence
    relevance — NDCG@10 with round-6-deterministic rank order; the
    DuckDB twin recomputes scores, grades, both rankings and the
    log2 sums."""
    d = _read(spark, sf_dir, "documents")
    top = text.bm25_topk(d, ["hash", "spark", "window"], k=20)
    toks = F.split(text.normalize_text(F.col("text")), " ")
    rel = sum(F.array_contains(toks, t).cast("int")
              for t in ["hash", "spark", "window"])
    graded = top.join(d.select("doc_id", rel.alias("rel")), "doc_id")
    return tablechecks.ndcg_at_k(graded, score_col="score",
                                 rel_col="rel", id_col="doc_id", k=10)


def q_join_advisor(spark, sf_dir):
    """Join-strategy advisor (tablechecks.join_strategy_advisor):
    documents (fact, 600 B/row) against the language dim (16 B/row) —
    must recommend broadcast, size the shuffle, and report the hot
    language's share with the salting verdict."""
    d = _read(spark, sf_dir, "documents")
    dim = d.select("lang").distinct()
    return tablechecks.join_strategy_advisor(
        d.select("lang"), dim, key_col="lang",
        left_row_bytes=600.0, right_row_bytes=16.0)


def q_infer_json_schema(spark, sf_dir):
    """Schema inference (infer.schema_from_json_report): a synthesized
    JSON column with integer/float/boolean/string fields, an optional
    field (every 3rd row) and invalid rows (every 7th, excluded from
    evidence) — the inferred (field, type, required) report is the
    draft rule-set a deployment starts from."""
    from zoi_spark import infer

    d = _read(spark, sf_dir, "documents").select("doc_id")
    ok = F.when(F.col("doc_id") % 2 == 0, F.lit("true")) \
        .otherwise(F.lit("false"))
    tag = F.when(F.col("doc_id") % 3 == 0,
                 F.lit(', "tag": "x"')).otherwise(F.lit(""))
    body = F.concat(
        F.lit('{"id": '), F.col("doc_id").cast("string"),
        F.lit(', "score": '), F.pmod("doc_id", F.lit(10)).cast("string"),
        F.lit('.5, "ok": '), ok,
        F.lit(', "name": "u'), F.col("doc_id").cast("string"),
        F.lit('"'), tag, F.lit("}"))
    js = F.when(F.col("doc_id") % 7 == 0, F.lit("{oops")).otherwise(body)
    return infer.schema_from_json_report(
        d.select(js.alias("js")), json_col="js")


def q_multi_signal_dedup(spark, sf_dir):
    """Union-of-evidence clustering (dedup.multi_signal_clusters):
    MinHash-Jaccard pairs UNION canonical-url pairs (the seeded
    re-crawls share a url) → one connected-components pass → per
    cluster the member/pair counts and the sorted signal names that
    built it. The DuckDB twin recomputes both pair sets, the closure
    (recursive CTE) and the signal rollup."""
    from zoi_spark import dedup

    d = _dup_docs(spark, sf_dir)
    jac = dedup.minhash_dedup_pairs(d, threshold=0.8, num_hashes=64,
                                    bands=32).select("id_a", "id_b")
    grp = F.pmod("doc_id", F.lit(10000))
    w = Window.partitionBy(grp)
    upairs = (d.select("doc_id", F.min("doc_id").over(w).alias("__mn"))
              .where(F.col("doc_id") != F.col("__mn"))
              .select(F.col("__mn").alias("id_a"),
                      F.col("doc_id").alias("id_b")))
    out = dedup.multi_signal_clusters({"jaccard": jac, "url": upairs})
    return out.withColumn("signals", F.array_join("signals", ","))


def q_frontier_scores(spark, sf_dir):
    """OPIC frontier priority (urls.frontier_priority): every fetched
    page (quality = (doc_id%100)/100) splits its mass over two
    synthetic outlinks; unfetched-url priority = accumulated mass —
    the crawl-ordering signal, one src join + one dst aggregation."""
    from zoi_spark import urls as _urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    src = F.concat(F.lit("p"), F.col("doc_id").cast("string"))
    dsts = F.array(
        F.concat(F.lit("http://t.example.com/a/"),
                 F.pmod("doc_id", F.lit(37)).cast("string")),
        F.concat(F.lit("http://t.example.com/b/"),
                 F.pmod("doc_id", F.lit(23)).cast("string")))
    edges = d.select(src.alias("src"), F.explode(dsts).alias("dst"))
    quality = d.select(src.alias("src"),
                       (F.pmod("doc_id", F.lit(100)) / 100.0)
                       .alias("quality"))
    return _urls.frontier_priority(edges, quality)


def q_blocking_pairwork(spark, sf_dir):
    """Blocking pair-work advisor (dedup.blocking_profile): the
    Σ s·(s−1)/2 budget of the (lang, length-bucket) blocking key over
    the seeded-dup corpus, the top block's share, and the before/after
    of a max_block_size=100 cap — the quantitative case every capped
    pair operator here rests on."""
    from zoi_spark import dedup

    d = _dup_docs(spark, sf_dir)
    return dedup.blocking_profile(d, block_col="block",
                                  max_block_size=100)


def q_expectation_battery(spark, sf_dir):
    """Declarative aggregate-expectation battery
    (tablechecks.expectation_suite — the Deequ/Great-Expectations
    pattern as ONE fused agg): eight expectations over documents
    (row count, mean/max/σ of text length, lang null-share, exact
    lang vocabulary, lang shape regex, min id), one deliberately
    failing (σ ≤ 60 vs the corpus's ~138) so the verdict row shape is
    exercised both ways. The DuckDB twin computes the same aggregates
    and re-derives every verdict."""
    from zoi_spark import tablechecks

    d = (_read(spark, sf_dir, "documents")
         .withColumn("text_len", F.length("text")))
    return tablechecks.expectation_suite(d, [
        {"name": "has_rows", "kind": "row_count", "lo": 1},
        {"name": "len_mean", "kind": "mean", "column": "text_len",
         "lo": 50, "hi": 2000},
        {"name": "lang_nulls", "kind": "null_share", "column": "lang",
         "hi": 0.0},
        {"name": "lang_vocab", "kind": "distinct", "column": "lang",
         "lo": 2, "hi": 50},
        {"name": "lang_shape", "kind": "match_share", "column": "lang",
         "pattern": "^[a-z]{2}$", "lo": 0.99},
        {"name": "id_min", "kind": "min", "column": "doc_id", "lo": 0},
        {"name": "len_sd", "kind": "stddev", "column": "text_len",
         "hi": 60.0},
        {"name": "len_max", "kind": "max", "column": "text_len",
         "hi": 1000},
    ])


def q_snapshot_changes(spark, sf_dir):
    """Keyed snapshot diff (tablechecks.snapshot_diff): the new
    snapshot drops every 17th doc, rewrites every 10th's text and adds
    a re-keyed copy of every 13th — the operator classifies each key
    added/removed/changed off a 16-byte-per-row hash join; the DuckDB
    twin full-outer-joins the raw columns (IS DISTINCT FROM), proving
    the hash classification exact on this corpus."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    new = (d.where(F.col("doc_id") % 17 != 0)
           .withColumn("text",
                       F.when(F.col("doc_id") % 10 == 0,
                              F.concat("text", F.lit(" v2")))
                       .otherwise(F.col("text"))))
    adds = (d.where(F.col("doc_id") % 13 == 0)
            .select((F.col("doc_id") + 10000000).alias("doc_id"),
                    "text", "lang"))
    return tablechecks.snapshot_diff(
        d, new.unionByName(adds), key_col="doc_id",
        compare_cols=["text", "lang"])


def q_conditional_rules(spark, sf_dir):
    """Cross-column conditional rules
    (tablechecks.conditional_violations — JSON-Schema if/then as one
    Project): English docs must be ≥80 chars, src3 docs must have even
    ids, short docs must carry a major lang — violation rows (doc_id,
    rule_id), NULL-when → not applicable, NULL-then → violation, same
    coalesce(false) gate as the compiled refinements."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents")
    return tablechecks.conditional_violations(d, [
        ("en_min_len", "lang = 'en'", "length(text) >= 80"),
        ("src3_even_id", "source = 'src3'", "doc_id % 2 = 0"),
        ("short_known_lang", "length(text) < 60",
         "lang IN ('en','de','fr')"),
    ])


def q_suggest_rules(spark, sf_dir):
    """Draft-rule suggestion from the typed documents table
    (infer.suggest_rules — the tabular sibling of JSON-column
    inference): one fused agg derives nullability, numeric gte/lte,
    string length bounds, the tightest ladder regex and the one_of
    vocabulary per column; the DuckDB twin recomputes every rule from
    the same aggregates."""
    from zoi_spark import infer

    return infer.suggest_rules(_read(spark, sf_dir, "documents"))


def q_weighted_sample(spark, sf_dir):
    """Deterministic Efraimidis-Spirakis weighted sampling
    (sampling.weighted_sample): quality weight (doc_id%100+1)/100,
    top-10 per lang by ln(u)/w with md5-derived u — the DuckDB twin
    recomputes the identical keys and windows (md5 is bit-identical
    across engines; the log/exp forms only reorder on exact float
    ties, which the id tiebreak resolves)."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents").withColumn(
        "w", (F.pmod("doc_id", F.lit(100)) + 1) / 100.0)
    return (sampling.weighted_sample(d, weight_col="w",
                                     id_col="doc_id", k=10,
                                     stratum_col="lang", salt="ws")
            .select("doc_id", "lang"))


def q_nfc_audit(spark, sf_dir):
    """Unicode NFC QC (text.nfc_audit, Arrow-vectorized
    unicodedata.is_normalized): every 7th doc gets a decomposed
    e+U+0301 appended (NOT NFC), every 11th a precomposed U+00E9
    (NFC-normal) — per-lang counts and shares; the DuckDB twin is
    nfc_normalize(text) <> text over the same seeded corpus."""
    from zoi_spark import text as zt

    d = _read(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat("text", F.lit("e\u0301")))  # decomposed
        .when(F.col("doc_id") % 11 == 0,
              F.concat("text", F.lit("\u00e9")))  # precomposed
        .otherwise(F.col("text")))
    return zt.nfc_audit(d, text_col="text", by="lang")


def _transpile_demo_schema():
    """Rule-set shared by q_transpiled_rules AND its oracle — the
    oracle SQL is GENERATED from this schema by transpile.violations_sql,
    so the driver's gate proves the transpiler emits the compiled
    validator's exact violation rows."""
    return z.fields({
        "event_id": z.integer().non_negative(),
        "event_type": z.string(min=3, max=20).one_of(
            ["view", "click", "signup", "purchase"]),
        "value": z.float_(gte=0.0).lt(100.0),
        "props": z.string().starts_with("{").ends_with("}")
                  .regex('^\\{"k": [0-9]+\\}$'),
    })


def q_transpiled_rules(spark, sf_dir):
    """SQL-transpiler parity (zoi_spark.transpile): the Spark side is
    the COMPILED validator's violation rows over events; the DuckDB
    twin is not hand-written — it is transpile.violations_sql() output
    for the same schema, so a green row proves rule-for-rule,
    row-for-row equivalence of the two backends."""
    res = z.validate(_read(spark, sf_dir, "events"),
                     _transpile_demo_schema(), id_cols=["event_id"])
    return res.violations.select("event_id", "rule_id")


def q_sprt_langs(spark, sf_dir):
    """Wald SPRT pass-rate monitoring (tablechecks.sprt_monitor): per
    lang, is the short-doc failure rate (len<100) still ≤5% or already
    ≥20%? The DuckDB twin recomputes the log-likelihood ratio with the
    same folded constants and thresholds."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents").withColumn(
        "bad", (F.length("text") < 100).cast("int"))
    return tablechecks.sprt_monitor(d, "bad", by="lang",
                                    p0=0.05, p1=0.2)


def q_columns_psi(spark, sf_dir):
    """Multi-column PSI triage (tablechecks.multi_column_psi): current
    snapshot drops zh docs, so lang drifts hard while source barely
    moves — one unpivoted pass per side ranks every column's drift at
    once; the DuckDB twin recomputes both unpivots, the vocabulary
    join and the smoothed PSI terms."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents")
    cur = d.where(F.col("lang") != "zh")
    return tablechecks.multi_column_psi(cur, d, ["lang", "source"])


def q_vocab_prune(spark, sf_dir):
    """Vocabulary-pruning tradeoff curve (text.vocab_prune_curve):
    per min_count threshold the surviving vocab size and covered token
    mass — one token-keyed count, then the vocabulary table crossed
    with the constant thresholds; the DuckDB twin recomputes the
    token counts and every threshold row."""
    from zoi_spark import text as zt

    return zt.vocab_prune_curve(_read(spark, sf_dir, "documents"),
                                thresholds=[1, 2, 5, 10, 20])


def q_quality_woe(spark, sf_dir):
    """Weight-of-evidence scorecard (tablechecks.woe_iv): does lang
    separate long docs (≥300 chars) from short ones? Laplace-smoothed
    WoE and IV contribution per lang; the DuckDB twin recomputes the
    smoothed shares and logs."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents").withColumn(
        "long_doc", (F.length("text") >= 300).cast("int"))
    return tablechecks.woe_iv(d, bucket_col="lang",
                              flag_col="long_doc", epsilon=0.5)


def q_contract_verdicts(spark, sf_dir):
    """Data-contract verdict artifact (contract.contract_check): the
    flagship schema's 13-rule violation counts (zero-violation rules
    present and passing), a 3-expectation battery, and a referential
    lang dictionary that deliberately omits zh — one uniform
    (check, kind, metric, passed) frame; the DuckDB twin re-derives
    all three families including the rule catalog."""
    from zoi_spark import contract

    d = _read(spark, sf_dir, "documents")
    dic = spark.createDataFrame([("en",), ("de",), ("es",), ("fr",)],
                                "lang string")
    return contract.contract_check(
        d, schema=documents_schema(),
        expectations=[
            {"name": "rows", "kind": "row_count", "lo": 1},
            {"name": "lang_nulls", "kind": "null_share",
             "column": "lang", "hi": 0.0},
            {"name": "nchars_mean", "kind": "mean", "column": "n_chars",
             "lo": 50, "hi": 2000},
        ],
        references=[("lang", dic)],
        id_cols=["doc_id"])


def q_rule_catalog(spark, sf_dir):
    """Rule-catalog lineage (ValidationResult.catalog): every compiled
    rule of the flagship schema as (rule_id, code, path_str, message)
    — fired or not; the DuckDB twin is the independently hand-derived
    13-row catalog (the same strings Zoi's error templates render,
    lib/zoi/error.ex)."""
    res = z.validate(_read(spark, sf_dir, "documents"),
                     documents_schema(), id_cols=["doc_id"])
    return res.catalog()


def q_ruleset_diff(spark, sf_dir):
    """Schema-evolution diff (describe.schema_diff): the flagship
    rule-set vs a successor that tightens text.lte, widens
    lang.one_of, adds a required url, makes n_chars optional and drops
    source — (path, change, detail, breaking) rows with
    reader-compatibility verdicts; the DuckDB twin is the
    independently hand-derived change list."""
    from zoi_spark.describe import schema_diff

    new = z.fields({
        "doc_id": z.integer().non_negative(),
        "text": z.string(min=50, max=400),
        "lang": z.string(min=2, max=2).one_of(
            ["en", "de", "es", "fr", "zh"]),
        "url": z.string().starts_with("http"),
        "n_chars": z.integer(gte=50).optional(),
    })
    rows = schema_diff(documents_schema(), new)
    return spark.createDataFrame(
        [(r["path"], r["change"], r["detail"], r["breaking"])
         for r in rows],
        "path string, change string, detail string, breaking boolean")


def q_zorder_keys(spark, sf_dir):
    """Z-order clustering keys (tablechecks.zorder_key): (doc_id,
    n_chars) min-max normalized to 8 bits each and bit-interleaved —
    the OPTIMIZE ZORDER layout step; the DuckDB twin recomputes the
    normalization and all 16 shift-and-or terms."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return tablechecks.zorder_key(d, ["doc_id", "n_chars"], bits=8)


def q_repair_suggestions(spark, sf_dir):
    """Violation auto-repair (repair.suggest_repairs): zh docs get
    their Levenshtein-nearest dictionary lang, out-of-range n_chars
    clamp to the violated bound, over-long text truncates — (id,
    rule_id, current, suggestion) rows; the DuckDB twin recomputes the
    edit-distance argmin (window over the candidate cross join) and
    the clamps."""
    from zoi_spark.repair import suggest_repairs

    d = _read(spark, sf_dir, "documents")
    schema = z.fields({
        "lang": z.string().one_of(["en", "de", "es", "fr"]),
        "n_chars": z.integer(gte=50, lte=400),
        "text": z.string(max=520),
    })
    return suggest_repairs(d, schema, id_col="doc_id")


def q_fk_sweep(spark, sf_dir):
    """Referential-integrity sweep (tablechecks.fk_sweep): the whole
    TPC-H FK graph — customer→nation, orders→customer,
    lineitem→orders, supplier→nation, nation→region — orphan counts
    per edge in one report; the DuckDB twin recomputes every edge with
    NOT IN anti-semantics on non-NULL keys."""
    from zoi_spark import tablechecks

    c = _read(spark, sf_dir, "customer")
    n = _read(spark, sf_dir, "nation")
    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    s = _read(spark, sf_dir, "supplier")
    r = _read(spark, sf_dir, "region")
    return tablechecks.fk_sweep([
        ("customer->nation", c, "c_nationkey", n, "n_nationkey"),
        ("orders->customer", o, "o_custkey", c, "c_custkey"),
        ("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        ("supplier->nation", s, "s_nationkey", n, "n_nationkey"),
        ("nation->region", n, "n_regionkey", r, "r_regionkey"),
    ])


def q_expectations_by_source(spark, sf_dir):
    """Per-partition expectation verdicts (expectation_suite with
    by=): the battery grouped by source — the north rule's
    per-partition pass/fail as one grouped aggregation; the DuckDB
    twin recomputes every (source, expectation) verdict."""
    from zoi_spark import tablechecks

    d = (_read(spark, sf_dir, "documents")
         .withColumn("text_len", F.length("text")))
    return tablechecks.expectation_suite(d, [
        {"name": "rows", "kind": "row_count", "lo": 20},
        {"name": "len_mean", "kind": "mean", "column": "text_len",
         "lo": 50, "hi": 2000},
        {"name": "langs", "kind": "distinct", "column": "lang",
         "lo": 1},
    ], by="source")


def q_sampler_gof(spark, sf_dir):
    """Sampler goodness-of-fit (sampling.sample_gof): per lang, does
    the md5 hash-sampler keep the promised 20%? Binomial z and
    chi-square terms; the DuckDB twin recomputes the sampler's own
    md5-threshold predicate and the same statistics."""
    from zoi_spark import sampling

    return sampling.sample_gof(_read(spark, sf_dir, "documents"),
                               id_col="doc_id", stratum_col="lang",
                               rate=0.2, salt="gof")


def q_rolling_psi(spark, sf_dir):
    """Day-over-day distribution stability (tablechecks.rolling_psi):
    PSI of the event_type mix per day vs the previous day, zero-filled
    over the day×type grid; the DuckDB twin recomputes the grid,
    shares, lags and smoothed terms."""
    from zoi_spark import tablechecks

    return tablechecks.rolling_psi(_read(spark, sf_dir, "events"),
                                   ts_col="ts", key_col="event_type")


def q_null_patterns(spark, sf_dir):
    """Missingness-pattern census (tablechecks.null_patterns): the
    testdata has no NULLs, so the query first masks fields with
    deterministic doc_id rules (text %7, lang %5, source %11 -> '')
    that the DuckDB twin mirrors verbatim, then counts rows per
    missing-column combination with within-corpus shares."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("text")).alias("text"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None))
        .otherwise(F.col("lang")).alias("lang"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(""))
        .otherwise(F.col("source")).alias("source"))
    return tablechecks.null_patterns(d, ["text", "lang", "source"])


def q_ts_monotonic(spark, sf_dir):
    """Per-key monotonicity audit (tablechecks.monotonic_violations):
    treating events.value as a per-user counter ordered by the unique
    event_id, report every user whose counter ever steps backwards —
    the DuckDB twin re-derives the lag and the inversion counts."""
    from zoi_spark import tablechecks

    return tablechecks.monotonic_violations(
        _read(spark, sf_dir, "events"), key_col="user_id",
        order_col="event_id", value_col="value")


def q_fd_mine(spark, sf_dir):
    """Approximate-FD mining (tablechecks.fd_mine): g3 confidence for
    the candidates lang->source (weak), source->lang (strong at this
    SF) and doc_id->lang (exact, doc_id is the key); the DuckDB twin
    recomputes max-per-lhs / total for each pair."""
    from zoi_spark import tablechecks

    return tablechecks.fd_mine(
        _read(spark, sf_dir, "documents"),
        [("lang", "source"), ("source", "lang"), ("doc_id", "lang")])


def q_badword_rate(spark, sf_dir):
    """C4-style blocklist gate (text.badword_rate): share of documents
    per lang containing 'slow' or 'legacy' as a whole word,
    case-insensitive; the DuckDB twin runs the identical alternation
    regex under RE2 ('i' flag)."""
    from zoi_spark import text

    return text.badword_rate(_read(spark, sf_dir, "documents"),
                             ["slow", "legacy"], by="lang")


def q_scd2_history(spark, sf_dir):
    """Type-2 SCD history build (tablechecks.scd2_history): collapse
    each user's event log (ordered by the unique event_id) into runs
    of consecutive identical event_type values with half-open
    valid_from/valid_to intervals — the recrawl content-history
    pattern. The DuckDB twin re-derives the lag change-points, the
    running version sum, and the lead() interval bound."""
    from zoi_spark import tablechecks

    return tablechecks.scd2_history(
        _read(spark, sf_dir, "events"), key_col="user_id",
        ts_col="ts", state_col="event_type", order_col="event_id")


def q_resolve_chains(spark, sf_dir):
    """Redirect/alias-chain resolution by pointer doubling
    (graph.resolve_chains): a synthetic functional redirect map over
    doc_id (every doc not a multiple of 50 points one id down) is
    collapsed so every source reports its chain endpoint — chains up
    to 49 hops resolve in 6 doubling joins, not 49. The DuckDB twin
    walks the same map with a recursive CTE to the terminal node."""
    from zoi_spark import graph

    edges = (_read(spark, sf_dir, "documents")
             .where(F.col("doc_id") % 50 != 0)
             .select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") - 1).alias("dst")))
    return graph.resolve_chains(edges)


def q_group_ols(spark, sf_dir):
    """Per-group OLS fit (tablechecks.group_ols): slope/intercept/r²
    of extendedprice on quantity per returnflag in ONE aggregation —
    the 'does the size→cost line hold in every segment' profile.
    r² is scale-free (round 6); slope/intercept ride the price scale,
    so both sides double-round them (6 then 2), the numeric_corr
    convention for magnitude-bearing floats."""
    from zoi_spark import tablechecks

    out = tablechecks.group_ols(
        _read(spark, sf_dir, "lineitem"), x_col="l_quantity",
        y_col="l_extendedprice", by="l_returnflag", round_to=6)
    return out.select(
        "l_returnflag", "n", F.round("slope", 2).alias("slope"),
        F.round("intercept", 2).alias("intercept"), "r2")


def q_roc_auc(spark, sf_dir):
    """Per-language ROC AUC (tablechecks.roc_auc): does document
    length discriminate docs containing 'table', per lang — the
    threshold-free ranking audit for any score the pipeline gates on.
    The DuckDB twin re-derives the distinct-score midrank formula
    (cumulative negatives below + half the ties)."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents")
    return tablechecks.roc_auc(
        d, score_col="n_chars",
        label_col=F.col("text").contains("table"), by="lang")


def q_lift_table(spark, sf_dir):
    """Decile lift/gains table (tablechecks.lift_table): rank docs by
    n_chars (doc_id tiebreak), split into 10 tiles, report per-tile
    hit rate, cumulative lift and capture for docs containing
    'spark'. The DuckDB twin runs the identical deterministic ntile
    (same ORDER BY) and the same running-sum ratios."""
    from zoi_spark import tablechecks

    d = _read(spark, sf_dir, "documents")
    return tablechecks.lift_table(
        d, score_col="n_chars",
        flag_col=F.col("text").contains("spark"),
        id_col="doc_id", n_buckets=10)


def q_fs_weights(spark, sf_dir):
    """Fellegi–Sunter linkage weights (dedup.fs_linkage_weights):
    candidate pairs are adjacent doc_ids within a lang; agreement
    fields are same-source, same length-bucket (width 25), same
    20-char prefix; the proxy match rule is exact n_chars equality.
    The DuckDB twin rebuilds the same pairs and the same
    Laplace-smoothed m/u → log₂ weight arithmetic per field."""
    from zoi_spark import dedup

    d = _read(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars", "text"]
    a = d.select(*(F.col(c).alias(c + "_a") for c in cols))
    b = d.select(*(F.col(c).alias(c + "_b") for c in cols))
    pairs = (a.join(b, (F.col("doc_id_a") + 1 == F.col("doc_id_b"))
                    & (F.col("lang_a") == F.col("lang_b")))
             .select(
                 (F.col("source_a") == F.col("source_b"))
                 .alias("agree_source"),
                 (F.floor(F.col("n_chars_a") / 25)
                  == F.floor(F.col("n_chars_b") / 25))
                 .alias("agree_len"),
                 (F.substring("text_a", 1, 20)
                  == F.substring("text_b", 1, 20))
                 .alias("agree_prefix"),
                 (F.col("n_chars_a") == F.col("n_chars_b"))
                 .alias("proxy")))
    return dedup.fs_linkage_weights(
        pairs, agree_cols=["agree_source", "agree_len",
                           "agree_prefix"], proxy_col="proxy")


def q_t_closeness(spark, sf_dir):
    """t-closeness audit (tablechecks.t_closeness_audit): per
    (lang, 100-char length bucket) QI group, total-variation EMD of
    the source distribution against the corpus-wide one, gated at
    t=0.2 — the third privacy rung after k-anonymity/l-diversity.
    The DuckDB twin re-derives the present-cells TVD fold."""
    from zoi_spark import tablechecks

    d = (_read(spark, sf_dir, "documents")
         .withColumn("len_bucket", F.floor(F.col("n_chars") / 100)))
    return tablechecks.t_closeness_audit(
        d, qi_cols=["lang", "len_bucket"], sensitive_col="source",
        t=0.2)


def q_keyness(spark, sf_dir):
    """Dunning log-likelihood keyness (text.keyness_terms): which
    terms are over/under-represented in the English slice vs the
    rest of the corpus, signed G² per term with total count ≥ 5.
    The DuckDB twin recomputes the expected counts and the
    0·ln0-guarded G² from the same normalized token stream."""
    from zoi_spark import text

    return text.keyness_terms(
        _read(spark, sf_dir, "documents"),
        focus=F.col("lang") == "en", min_count=5)


def q_vocab_richness(spark, sf_dir):
    """Chao1 vocabulary richness per lang (text.vocab_richness):
    observed vocab, hapax/dis-legomena counts, the bias-corrected
    Chao1 lower bound on true vocabulary size, and Good's coverage —
    the unseen-SPECIES companion to good_turing_mass. The DuckDB
    twin replays the (lang, term) count histogram fold."""
    from zoi_spark import text

    return text.vocab_richness(
        _read(spark, sf_dir, "documents"), by="lang")


_RAKE_ROW_T = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15,
               "zh": 0.15}
_RAKE_COL_T = {f"src{i}": 0.05 for i in range(20)}


def q_raking_weights(spark, sf_dir):
    """IPF raking (sampling.raking_weights): per-(lang, source) cell
    weights that make the corpus simultaneously 40% English and
    uniform across the 20 sources — two full row/col passes. The
    DuckDB twin unrolls the same four scaling stages as window-sum
    CTEs over the identical cell frame."""
    from zoi_spark import sampling

    return sampling.raking_weights(
        _read(spark, sf_dir, "documents"), row_col="lang",
        col_col="source", row_targets=_RAKE_ROW_T,
        col_targets=_RAKE_COL_T, rounds=2)


def q_weight_ess(spark, sf_dir):
    """Kish effective sample size (sampling.weight_ess) of a
    deterministic inverse-length weight per lang — the audit that a
    reweighting didn't quietly destroy the sample. The DuckDB twin
    recomputes (Σw)²/Σw² and the design effect from the same
    weights."""
    from zoi_spark import sampling

    d = (_read(spark, sf_dir, "documents")
         .withColumn("w", 1.0 / (1.0 + F.col("n_chars") / 100.0)))
    return sampling.weight_ess(d, weight_col="w", by="lang")


def q_stream_psi(spark, sf_dir):
    """STREAMING PSI drift monitor (streaming.stream_psi_drift):
    documents stream from a staged landing dir (event time = doc_id
    mod 600 s → 10 one-minute windows), per-window language mix
    compared against the corpus-wide baseline via two chained
    stateful operators in append mode. The DuckDB twin recomputes
    per-window PSI AND the watermark eviction rule (emit end ≤ max
    event − 2 min), so the value hash pins both the drift math and
    the append-mode semantics."""
    import shutil
    import tempfile

    from zoi_spark import streaming

    out_dir = os.path.join(tempfile.gettempdir(), "zoi_stream_psi")
    shutil.rmtree(out_dir, ignore_errors=True)
    in_dir = os.path.join(out_dir, "in")
    os.makedirs(in_dir)
    shutil.copy(f"{sf_dir}/documents.parquet",
                os.path.join(in_dir, "documents.parquet"))
    batch = _read(spark, sf_dir, "documents")
    baseline = (batch.groupBy("lang")
                .agg(F.count("*").alias("__n"))
                .select("lang",
                        (F.col("__n")
                         / F.sum("__n").over(
                             Window.rowsBetween(
                                 Window.unboundedPreceding,
                                 Window.unboundedFollowing)))
                        .alias("share")))
    sdf = (spark.readStream.schema(batch.schema).parquet(in_dir)
           .withColumn("ts", F.timestamp_seconds(
               F.lit(1767225600) + F.pmod("doc_id", F.lit(600)))))
    res = streaming.stream_psi_drift(sdf, baseline, ts_col="ts",
                                     key_col="lang")
    q = (res.writeStream.format("parquet")
         .option("path", f"{out_dir}/data")
         .option("checkpointLocation", f"{out_dir}/ckpt")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.read.parquet(f"{out_dir}/data")


def q_snapshot_parity(spark, sf_dir):
    """Order-invariant replication-parity verdicts
    (tablechecks.snapshot_parity): per-source (n, checksum) of
    documents vs a deterministically perturbed replica — rows with
    doc_id%101==0 dropped (count divergence) and text mutated where
    doc_id%97==0 (content divergence at equal counts) — so the
    verdict table exercises match=true, count-mismatch, and
    same-count-different-content groups in one run. The checksum is
    the commutative SUM(md5-digest) mod 2⁶¹ fold of
    tablechecks.table_fingerprint: two single-pass map-side-combined
    aggregations + one tiny outer join, no sort of either side. The
    DuckDB twin recomputes the identical digest arithmetic
    (('0x'||substr(md5,1,15))::HUGEINT), pinning the canonicalization
    (NUL sentinel, unit separator) byte-for-byte."""
    d = _read(spark, sf_dir, "documents")
    replica = (d.where(F.pmod("doc_id", F.lit(101)) != 0)
               .withColumn("text",
                           F.when(F.pmod("doc_id", F.lit(97)) == 0,
                                  F.concat(F.col("text"), F.lit("!")))
                           .otherwise(F.col("text"))))
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    return (tablechecks.snapshot_parity(d, replica, cols, by="source")
            .orderBy("source"))


def q_jw_title_pairs(spark, sf_dir):
    """Jaro-Winkler near-dup pairs (dedup.jaro_winkler_pairs) over the
    40-char normalized document prefix, blocked on the first 8 chars
    with the mega-block cap at 200 — the record-linkage similarity
    for short keys where Levenshtein over-penalizes transpositions.
    The Spark side scores candidates with an Arrow-batched pandas
    kernel implementing the textbook JW (window ⌊max/2⌋−1, greedy
    matching, half-transpositions, prefix boost p=0.1 past jaro 0.7);
    the DuckDB twin scores the SAME blocked pairs with the built-in
    jaro_winkler_similarity — value-identical by construction, so the
    kernel's every branch is oracle-pinned. Top 40 by (jw desc,
    id_a, id_b)."""
    d = _read(spark, sf_dir, "documents")
    pairs = dedup.jaro_winkler_pairs(
        d, threshold=0.9, key_len=40, block_prefix=8,
        max_block_size=200)
    return pairs.orderBy(F.desc("jw"), "id_a", "id_b").limit(40)


def q_dp_lang_counts(spark, sf_dir):
    """ε-DP per-language count release (tablechecks.dp_noisy_counts,
    Laplace mechanism, Dwork et al. 2006) with the deterministic
    md5-seeded inverse-CDF noise draw — reruns and the DuckDB twin
    release the SAME value, so the mechanism's arithmetic (uniform
    from 52 md5 bits, sgn·ln transform, clamp-at-0, half-up round) is
    value-hash-verifiable end-to-end. One hash aggregation; noise math
    runs on the |langs| aggregate rows."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.dp_noisy_counts(d, "lang", epsilon=0.5,
                                        seed="dp-r4")
            .orderBy("lang"))


def q_ht_total_chars(spark, sf_dir):
    """Horvitz-Thompson corpus-total estimation per language
    (sampling.horvitz_thompson): deterministic Poisson sample with
    size-proportional inclusion π = min(1, n_chars/500), estimate
    Σ n_chars from the sampled rows alone as Σ y/π with the
    Poisson-design SE — the way a 10¹²-doc validation prices a
    full-corpus sum without a full pass. true_total/n_pop are emitted
    here as the audit columns (test scale; the twin re-derives the
    identical inclusion decisions and estimator terms)."""
    from zoi_spark import sampling

    d = _read(spark, sf_dir, "documents")
    return (sampling.horvitz_thompson(
        d, "n_chars",
        pi=F.least(F.lit(1.0), F.col("n_chars") / 500.0),
        id_col="doc_id", by="lang", salt="ht")
        .orderBy("lang"))


def q_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (text.rake_phrases; Rose et al. 2010):
    stopword/punctuation-delimited candidate phrases, word scores
    degree/frequency over all phrase occurrences, phrase score = sum
    of word scores; corpus top-20 by (score desc, phrase). The twin
    re-runs the identical two regex delimits, split, and the same
    two-aggregation + join pipeline in SQL."""
    d = _read(spark, sf_dir, "documents")
    return text.rake_phrases(d, top_k=20)


def q_w1_len_drift(spark, sf_dir):
    """Exact discrete 1-Wasserstein drift
    (tablechecks.wasserstein_drift) between the doc-length
    distributions of even vs odd doc ids — the CDF-gap-area metric
    that prices drift in column units ("lengths moved N chars"),
    complementing KS (max gap, drift_len_kl's bucketing) and KL/PSI
    (mass-weighted). One hash aggregation to (value, c_even, c_odd),
    then running-sum + lead windows over the distinct-value rows; the
    twin re-integrates the identical CDF area with window sums."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.wasserstein_drift(
        d, "n_chars", split=F.pmod("doc_id", F.lit(2)) == 0)


def q_page_hinkley_volume(spark, sf_dir):
    """Page-Hinkley sequential mean-shift detection
    (tablechecks.page_hinkley; Page 1954, Gama et al. 2014) over the
    daily event-volume series: one count-per-day hash aggregation,
    then the running-mean / cumulative-deviation / running-min
    windows over the ~30 day rows. Complements CUSUM (fixed
    reference mean) and EWMA (smoother, no test) — PH self-references
    the running mean, the cold-start drift monitor. The twin
    re-derives the identical two window layers in SQL."""
    e = _read(spark, sf_dir, "events")
    daily = (e.groupBy(F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("volume")))
    return (tablechecks.page_hinkley(daily, "volume", "day",
                                     delta=0.0, lam=30.0)
            .orderBy("order"))


def q_ecod_outliers(spark, sf_dir):
    """ECOD multivariate outlier scores (tablechecks.ecod_outliers;
    Li et al., TKDE 2022) over (n_chars, whitespace token count):
    per-dimension −log empirical tail probabilities aggregated
    left/right/auto (skew-directed), released score = max of the
    three. Scale shape: per dimension ONE distinct-value histogram
    aggregation + windows over the tiny histogram + a broadcast join
    back — no global sort of the corpus. Top 25 by (score desc,
    doc_id); the twin re-derives the same tails from the same
    histograms."""
    d = _read(spark, sf_dir, "documents")
    base = d.where(F.col("text").isNotNull()).select(
        "doc_id", "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    return (tablechecks.ecod_outliers(
        base, ["n_chars", "n_tokens"], id_cols=["doc_id"])
        .orderBy(F.desc("ecod_score"), "doc_id").limit(25))


def q_cdc_chunk_dedup(spark, sf_dir):
    """Content-defined-chunking shared-passage census
    (dedup.cdc_shared_chunks; gear/FastCDC boundary idea, Xia et al.
    ATC 2016, stateless form): chunk boundaries where the 8-char
    window's md5 opens with '00' (expected chunk ≈256 chars), chunk
    hashes aggregated across documents — the byte-level near-dup
    signal that survives insertions which break fixed-offset
    blocking. One codegen projection + one uniform-key hash
    aggregation. Chunks ≥20 chars shared by ≥2 docs, top 30; the
    twin re-derives boundaries per position with the same md5
    predicate and chunks via a lead window over cut positions."""
    d = _read(spark, sf_dir, "documents")
    shared = dedup.cdc_shared_chunks(
        d, text_col="text", id_col="doc_id",
        window=8, boundary_nibbles=2, min_docs=2)
    return (shared.where(F.col("chunk_len") >= 20)
            .orderBy(F.desc("n_docs"), F.desc("n_occurrences"),
                     "chunk_hash")
            .limit(30))


def q_kn_bigrams(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities
    (text.kneser_ney_bigrams; Kneser & Ney 1995, Chen & Goodman 1998)
    with discount 0.75: absolute discounting plus the
    continuation-count backoff that down-weights words frequent in
    only one context. Top 40 bigrams by (count desc, bigram); the
    twin re-derives the same context totals, distinct-continuation
    counts and type total from the same normalized tokens."""
    d = _read(spark, sf_dir, "documents")
    return text.kneser_ney_bigrams(d, discount=0.75, top_k=40)


def q_burrows_delta(spark, sf_dir):
    """Burrows' Delta stylometric distance between sources
    (text.burrows_delta; Burrows 2002): z-scored relative frequencies
    of the corpus-top-40 words across source groups, Δ = mean |z_a −
    z_b| per pair — the register-drift audit. Zero-filled group×word
    grid (absent word = frequency 0, not a missing row). Ordered by
    (group_a, group_b); the twin rebuilds the same grid with a cross
    join and the same population z-scores."""
    d = _read(spark, sf_dir, "documents")
    return (text.burrows_delta(d, by="source", top_k_words=40)
            .orderBy("group_a", "group_b"))


def q_energy_len_drift(spark, sf_dir):
    """Exact squared energy distance (tablechecks.energy_drift;
    Székely & Rizzo 2004) between even/odd-doc_id length
    distributions — 2E|X−Y| − E|X−X′| − E|Y−Y′| with every term an
    exact CDF-product area over the merged distinct-value rows, the
    shape-complete member of the drift family next to w1_len_drift's
    location metric. Same single-aggregation scale shape; the twin
    re-integrates the identical three areas."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.energy_drift(
        d, "n_chars", split=F.pmod("doc_id", F.lit(2)) == 0)


def q_mcnemar_rule_shift(spark, sf_dir):
    """McNemar paired verdict-shift test (tablechecks.mcnemar;
    McNemar 1947, continuity-corrected): does tightening the length
    rule from n_chars≥100 to n_chars≥120 flip verdicts
    asymmetrically? b/c discordant counts + χ²(1) in ONE aggregation
    pass — the decision statistic on top of verdict_transitions'
    flip listing. The twin recomputes the four cells and the
    corrected χ²."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.mcnemar(d, F.col("n_chars") >= 100,
                               F.col("n_chars") >= 120)


def q_pan_luhn_scan(spark, sf_dir):
    """Luhn-validated payment-card scan (text.luhn_pan_scan; ISO/IEC
    7812 mod-10): digit runs of 13-19 are candidates, only
    checksum-passing runs count as PAN hits — the false-positive gate
    real PII scanners run after the regex. Deterministic fixture:
    every 7th doc gets a Luhn-VALID test PAN appended, every 11th a
    near-miss (last digit off by one); the scan must count the first
    and reject the second. Matched digits are never emitted. The
    twin re-runs the identical extraction and checksum with list
    expressions."""
    d = _read(spark, sf_dir, "documents")
    inj = d.withColumn("text2", F.concat(
        F.col("text"),
        F.when(F.pmod("doc_id", F.lit(7)) == 0,
               F.lit(" 4111111111111111"))
         .when(F.pmod("doc_id", F.lit(11)) == 0,
               F.lit(" 4111111111111112"))
         .otherwise(F.lit(""))))
    return (text.luhn_pan_scan(inj, text_col="text2")
            .orderBy("id"))


def q_kn_source_ppl(spark, sf_dir):
    """Per-source corpus perplexity under the interpolated Kneser-Ney
    bigram LM (text.kn_cross_entropy): every document's bigrams
    scored against the corpus-level KN table (top_k=None full
    surface), H = −mean log₂ p_kn and 2^H per source — the
    principled-smoothing register-drift monitor. Equi-join against
    the Zipf-bounded bigram vocabulary, deliberately not broadcast.
    Ordered by source; the twin re-derives the full LM and the same
    join + aggregation."""
    d = _read(spark, sf_dir, "documents")
    return text.kn_cross_entropy(d, by="source").orderBy("group")


def q_textrank_keywords(spark, sf_dir):
    """TextRank keyword extraction (text.textrank_keywords; Mihalcea
    & Tarau 2004): 4-round weighted PageRank over the content-word
    co-occurrence graph (adjacent normalized tokens, stopwords and
    non-alphabetic tokens dropped, undirected count-weighted edges) —
    rides graph.pagerank, so the dangling-mass and lineage-checkpoint
    machinery is exercised on a second surface. Top 25 by (rank desc,
    word); the twin unrolls the same 4 rounds as a CTE chain from the
    same edge derivation."""
    d = _read(spark, sf_dir, "documents")
    return text.textrank_keywords(d, iters=4, top_k=25)


def q_theil_sen_volume(spark, sf_dir):
    """Theil-Sen robust trend slope (tablechecks.theil_sen; Sen 1968)
    over the daily event-volume series: median of all pairwise
    slopes + median-residual intercept — the monitoring trend line a
    single corrupted day cannot drag, unlike OLS. O(n²) pair join
    runs on the ~30 aggregated day rows by contract. The twin
    re-derives the same medians (both engines interpolate the even-n
    median)."""
    e = _read(spark, sf_dir, "events")
    daily = (e.groupBy(F.datediff(F.to_date("ts"),
                                  F.lit("1970-01-01")).alias("day"))
             .agg(F.count(F.lit(1)).alias("volume")))
    return tablechecks.theil_sen(daily, "volume", "day")


def q_mann_kendall_volume(spark, sf_dir):
    """Mann-Kendall nonparametric trend test
    (tablechecks.mann_kendall; Mann 1945) on the same daily
    event-volume series as theil_sen_volume: S = Σ sign(x_j − x_i),
    tie-corrected variance, continuity-corrected z — the
    significance companion to the Theil-Sen slope estimate. The twin
    recomputes S, the tie term and z."""
    e = _read(spark, sf_dir, "events")
    daily = (e.groupBy(F.datediff(F.to_date("ts"),
                                  F.lit("1970-01-01")).alias("day"))
             .agg(F.count(F.lit(1)).alias("volume")))
    return tablechecks.mann_kendall(daily, "volume", "day")


def q_user_day_cover(spark, sf_dir):
    """Greedy max-coverage day selection (sampling.greedy_set_cover;
    Nemhauser-Wolsey-Fisher 1978): which 3 days reach the most
    distinct users — each round picks the day adding the most
    not-yet-covered user_ids, stopping early once coverage is total.
    The per-round winner is a documented tiny driver-side pick; the
    twin unrolls the same 3 greedy rounds as CTEs and filters
    zero-gain rounds exactly like the early stop."""
    from zoi_spark import sampling

    e = _read(spark, sf_dir, "events")
    du = e.select(F.to_date("ts").alias("day"), "user_id")
    return sampling.greedy_set_cover(du, group_col="day",
                                     item_col="user_id", k=3)


def q_ts_sanity(spark, sf_dir):
    """Timestamp plausibility audit (tablechecks.ts_sanity_audit):
    NULLs, epoch-zero defaults, rows after an explicit cutoff
    literal, exact-midnight concentration (date-only values smuggled
    into a timestamp), weekend share. Deterministic fixture: every
    97th event becomes epoch zero, every 89th jumps 400 days into
    the future, every 13th truncates to midnight — all five counters
    are exercised, not just claimed. ONE fused aggregation pass."""
    e = _read(spark, sf_dir, "events")
    ts2 = (F.when(F.pmod("event_id", F.lit(97)) == 0,
                  F.lit("1970-01-01 00:00:00").cast("timestamp"))
           .when(F.pmod("event_id", F.lit(89)) == 0,
                 F.col("ts") + F.expr("INTERVAL 400 DAYS"))
           .when(F.pmod("event_id", F.lit(13)) == 0,
                 F.date_trunc("day", F.col("ts")))
           .otherwise(F.col("ts")))
    inj = e.select(ts2.alias("ts2"))
    return tablechecks.ts_sanity_audit(inj, "ts2",
                                       cutoff="2024-06-01 00:00:00")


def q_binseg_volume(spark, sf_dir):
    """Single-changepoint binary segmentation
    (tablechecks.binseg_split; Scott & Knott 1974) on the daily
    event-volume series: the split minimizing summed within-segment
    SSE, from prefix sums — locates WHERE the regime changed, where
    Page-Hinkley only alarms that it did. Argmin over the rounded
    SSE so the twin picks the identical split."""
    e = _read(spark, sf_dir, "events")
    daily = (e.groupBy(F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("volume")))
    return tablechecks.binseg_split(daily, "volume", "day")


def q_weekly_seasonality(spark, sf_dir):
    """Day-of-week seasonal profile with robust deviation flags
    (tablechecks.weekly_seasonality): daily volumes vs same-weekday
    means, residual z'd against 1.4826·MAD — flags the quiet Tuesday
    a raw-volume z-score can't see past the weekly rhythm. ISO
    weekday on both engines; exact interpolated medians. Ordered by
    day."""
    e = _read(spark, sf_dir, "events")
    return tablechecks.weekly_seasonality(e, "ts").orderBy("day")


def q_bin_advisor(spark, sf_dir):
    """Histogram bin-width advisor (tablechecks.bin_advisor):
    Freedman-Diaconis, Scott and Sturges from one pass + two exact
    interpolated percentiles over n_chars — the data-derived bucket
    sizing for the PSI/KS histogram checks. One summary row; the
    twin recomputes all three rules from the same moments and
    quantiles."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.bin_advisor(d, "n_chars")


def q_multibyte_audit(spark, sf_dir):
    """UTF-8 byte-density audit per lang (text.multibyte_audit):
    chars vs encoded bytes, bytes-per-char density, pure-ASCII doc
    share. Deterministic fixture: every 5th doc gets a non-ASCII
    suffix (accents + CJK) so the char≠byte path is exercised on
    both engines, not just claimed. Ordered by group."""
    d = _read(spark, sf_dir, "documents")
    inj = d.withColumn(
        "text2",
        F.when(F.pmod("doc_id", F.lit(5)) == 0,
               F.concat("text", F.lit(" café naïve 中文")))
         .otherwise(F.col("text")))
    return (text.multibyte_audit(inj, text_col="text2", by="lang")
            .orderBy("group"))


def q_cvm_len_drift(spark, sf_dir):
    """Two-sample Cramér-von Mises drift (tablechecks.cvm_drift;
    Anderson 1962) between even/odd-doc_id length distributions: the
    integrated squared CDF gap, scale-free — completes the drift
    family (KS max-gap, W₁ linear gap, energy shape-complete,
    KL/PSI mass-weighted). Same single-aggregation shape; the twin
    re-integrates the same pooled-multiplicity sum."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.cvm_drift(
        d, "n_chars", split=F.pmod("doc_id", F.lit(2)) == 0)


def q_anova_len_sources(spark, sf_dir):
    """One-way ANOVA F across ALL sources (tablechecks.anova_oneway;
    Fisher 1925) for mean doc length: between/within sums of squares
    from ONE aggregation to per-group sufficient statistics — the
    k-group screen before pairwise Welch drilling. The twin
    recomputes SSB/SSW from the same (n, Σx, Σx²) triples."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.anova_oneway(d, "n_chars", by="source")


def q_cdc_chunk_dedup_arrow(spark, sf_dir):
    """Gear-hash CDC shared-chunk census — the 100-TB engine for
    cdc_chunk_dedup (dedup.cdc_chunks engine='arrow'): a vectorized
    numpy gear rolling hash picks boundaries over UTF-8 bytes and
    md5 runs once PER CHUNK instead of per position (~window× less
    hashing; see the waves bench window for the measured speedup).
    Boundary function is gear, not md5-prefix, so this is
    deliberately rows-only: structurally identical output, different
    (equally valid) cut points — the expr twin stays the
    value-oracled reference."""
    d = _read(spark, sf_dir, "documents")
    shared = dedup.cdc_shared_chunks(
        d, text_col="text", id_col="doc_id",
        window=8, boundary_nibbles=2, min_docs=2, engine="arrow")
    return (shared.where(F.col("chunk_len") >= 20)
            .orderBy(F.desc("n_docs"), F.desc("n_occurrences"),
                     "chunk_hash")
            .limit(30))


def q_tukey_hsd_langs(spark, sf_dir):
    """Tukey-Kramer HSD pairwise q statistics
    (tablechecks.tukey_hsd_pairs; Tukey 1949) for mean doc length
    across langs — the post-hoc drill-down after the ANOVA screen:
    |mean diff| over the pooled-MSW standard error per pair, ordered
    by (group_a, group_b). The twin recomputes MSW and every q from
    the same per-group sufficient statistics."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.tukey_hsd_pairs(d, "n_chars", by="lang")
            .orderBy("group_a", "group_b"))


def q_levene_len_langs(spark, sf_dir):
    """Brown-Forsythe variance-homogeneity test
    (tablechecks.brown_forsythe; Levene with median centers, 1974)
    for doc length across langs: the ANOVA-assumption check — F on
    |x − group median|. Exact per-group interpolated medians,
    broadcast back, then the one-pass ANOVA statistics on the
    transformed values; the twin mirrors all three stages."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.brown_forsythe(d, "n_chars", by="lang")


def q_power_advisor(spark, sf_dir):
    """Two-proportion sample-size advisor (tablechecks.power_advisor;
    Fleiss-Levin-Paik normal-approximation formula) seeded from the
    observed n_chars≥128 pass rate: docs per group needed to detect
    a 1-point absolute pass-rate shift at 5%/80% — the monitoring-
    design number a validation SLA quotes. Fixed z literals, one
    aggregation; the twin recomputes the same closed form."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.power_advisor(d, F.col("n_chars") >= 128,
                                     mde=0.01)


def q_lang_id_prf(spark, sf_dir):
    """Per-class precision/recall/F1 of the marker language-ID
    against declared labels (tablechecks.classifier_prf over
    text.lang_id) — the evaluation layer on top of text_lang_id's
    raw confusion matrix: TP/FP/FN per class with guarded ratios.
    The twin re-derives the same confusion counts from the same
    marker scoring SQL and the same per-class sums."""
    d = _read(spark, sf_dir, "documents")
    base = d.select("lang",
                    text.lang_id(F.col("text")).alias("pred"))
    return (tablechecks.classifier_prf(base, "lang", "pred")
            .orderBy("class"))


def q_volume_xcorr(spark, sf_dir):
    """Cross-correlation function (tablechecks.xcorr) between daily
    view and purchase volumes at lags −3..3: r(k) = Pearson
    corr(views_t, purchases_{t+k}) — a peak at positive k says views
    LEAD purchases by k days. Sample Pearson on both engines; one
    lead/lag window per lag over the ~30 day rows. Ordered by lag."""
    e = _read(spark, sf_dir, "events")
    daily = (e.where(F.col("ts").isNotNull())
             .groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum(F.when(F.col("event_type") == "view", 1)
                        .otherwise(0)).alias("views"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("purchases")))
    return (tablechecks.xcorr(daily, "views", "purchases", "day",
                              max_lag=3)
            .orderBy("lag"))


def q_simpsons_check(spark, sf_dir):
    """Simpson's-paradox screen (tablechecks.simpsons_check; Simpson
    1951): per-lang OLS slope of token count on char count vs the
    pooled slope, with a `reversed` flag when a stratum contradicts
    the corpus-level trend — the aggregation trap a validator must
    surface before anyone acts on a pooled conclusion. One
    aggregation to per-group sufficient statistics; pooled sums are
    the totals. Ordered by group."""
    d = _read(spark, sf_dir, "documents")
    doc = d.withColumn("n_tokens", F.size(F.split("text", " ")))
    return (tablechecks.simpsons_check(doc, "n_chars", "n_tokens",
                                       by="lang")
            .orderBy("group"))


def _daily_volume(spark, sf_dir):
    e = _read(spark, sf_dir, "events")
    return (e.groupBy(F.datediff(F.to_date("ts"),
                                 F.lit("1970-01-01")).alias("day"))
            .agg(F.count(F.lit(1)).alias("volume")))


def q_durbin_watson_volume(spark, sf_dir):
    """Durbin-Watson serial-correlation diagnostic
    (tablechecks.durbin_watson; 1950) on the OLS-trend residuals of
    daily event volume — tests the iid-error assumption every
    z-score/OLS monitor in this suite rests on. Sufficient-statistics
    fit + one lag window; the twin recomputes the same fit and
    difference ratio."""
    return tablechecks.durbin_watson(
        _daily_volume(spark, sf_dir), "volume", "day")


def q_weekly_spectrum(spark, sf_dir):
    """Single-frequency periodogram at the weekly period
    (tablechecks.periodogram_at; Schuster 1898): cos/sin projections
    of the mean-centered daily volume, power and the variance share
    the 7-day cycle explains — the TEST behind what
    weekly_seasonality assumes. One aggregation, exact on both
    engines."""
    return tablechecks.periodogram_at(
        _daily_volume(spark, sf_dir), "volume", "day", period=7.0)


def q_cooks_volume(spark, sf_dir):
    """Cook's distance influence ranking (tablechecks.cooks_distance;
    Cook 1977) for the daily-volume trend fit: leverage + residual →
    D per day with the 4/n influence flag — which day to investigate
    first when Theil-Sen and OLS disagree. Per-day rows ordered by
    day; the twin recomputes e, h, s² and D from the same sufficient
    statistics."""
    return (tablechecks.cooks_distance(
        _daily_volume(spark, sf_dir), "volume", "day")
        .orderBy("order"))


def q_negbin_user_events(spark, sf_dir):
    """Negative-binomial method-of-moments fit
    (tablechecks.negbin_fit; Hilbe 2011) over per-user event counts:
    dispersion ratio s²/m plus the (r, p) shape when overdispersed —
    the prior for per-entity rate thresholds. One aggregation over
    the per-user counts; the twin recomputes the same sample
    moments."""
    e = _read(spark, sf_dir, "events")
    uc = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    return tablechecks.negbin_fit(uc, "c")


def q_cuped_users(spark, sf_dir):
    """CUPED variance reduction (tablechecks.cuped; Deng et al. WSDM
    2013): per-user first-half-of-month event count as the pre-period
    covariate for the second-half count — θ, ρ and the 1−ρ² variance
    ratio that prices the sample-size saving (composes with
    power_advisor). Sample moments on both engines."""
    e = _read(spark, sf_dir, "events")
    up = (e.groupBy("user_id")
          .agg(F.sum(F.when(F.dayofmonth("ts") <= 15, 1)
                     .otherwise(0)).alias("pre"),
               F.sum(F.when(F.dayofmonth("ts") > 15, 1)
                     .otherwise(0)).alias("post")))
    return tablechecks.cuped(up, "pre", "post")


def q_pareto_sources(spark, sf_dir):
    """Pareto-efficient source selection (sampling.pareto_front):
    per-source vocab rate (max), exact-dup rate (min) and mean doc
    length (max), metrics ROUNDED to 6 before the dominance join so
    both engines compare identical values; sources off the front are
    strictly worse trade-offs. |sources|² comparison on the tiny
    metric rows; the twin re-derives the metrics and the dominance
    EXISTS."""
    d = (_read(spark, sf_dir, "documents")
         .where(F.col("text").isNotNull()
                & F.col("source").isNotNull()))
    g1 = (d.groupBy("source")
          .agg(F.round(F.avg("n_chars"), 6).alias("mean_chars"),
               F.round(1 - F.countDistinct(
                   text.fingerprint(F.col("text")))
                   / F.count(F.lit(1)), 6).alias("dup_rate")))
    toks = F.split(text.normalize_text(F.col("text")), " ")
    g2 = (d.select("source", F.explode(toks).alias("w"))
          .where(F.col("w") != "")
          .groupBy("source")
          .agg(F.round(F.countDistinct("w") / F.count(F.lit(1)), 6)
               .alias("vocab_rate")))
    met = g1.join(g2, "source")
    from zoi_spark import sampling

    return (sampling.pareto_front(
        met, by="source", maximize=["vocab_rate", "mean_chars"],
        minimize=["dup_rate"])
        .orderBy("source"))


def q_renyi_langs(spark, sf_dir):
    """Rényi entropy spectrum per lang (text.renyi_profile; Rényi
    1961): H₀/H₁/H₂ of the token distribution in bits — the spectrum
    GAPS separate long-tail natural text from keyword-stuffed
    templates. One (group, token) aggregation; the twin recomputes
    all three orders from the same counts. Ordered by group."""
    d = _read(spark, sf_dir, "documents")
    return text.renyi_profile(d, by="lang").orderBy("group")


def q_jackknife_sources(spark, sf_dir):
    """Delete-one-source jackknife SE for the corpus mean length
    (tablechecks.jackknife_groups; Quenouille/Tukey): the
    cluster-respecting standard error vs the naive iid one, with the
    design ratio — the correction any corpus-mean SLA needs when
    rows within a source correlate. Leave-one-out means derived from
    totals, no second pass; the twin re-derives the same
    pseudo-values."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.jackknife_groups(d, "n_chars", by="source")


def q_markov_entropy(spark, sf_dir):
    """Empirical Markov entropy rate of per-user event streams
    (tablechecks.markov_entropy_rate; Shannon 1948 §7): H(next |
    current) vs the marginal H(next) — the predictability gap that
    separates scripted bots from organic sessions. Streams ordered
    by (ts, event_id) so timestamp ties cannot reorder transitions
    across engines."""
    e = _read(spark, sf_dir, "events")
    return tablechecks.markov_entropy_rate(
        e, "event_type", ["ts", "event_id"], by="user_id")


def q_chao_shen_langs(spark, sf_dir):
    """Coverage-adjusted Shannon entropy per lang
    (text.chao_shen_entropy; Chao & Shen 2003): Good-Turing coverage
    from singletons, shrunk probabilities, Horvitz-Thompson detection
    weights — the undersampling-honest entropy next to renyi_langs'
    MLE H₁. Ordered by group; the twin re-derives coverage and both
    entropies from the same token counts."""
    d = _read(spark, sf_dir, "documents")
    return text.chao_shen_entropy(d, by="lang").orderBy("group")


def q_rolling_reach_users(spark, sf_dir):
    """Rolling DAU/WAU reach (tablechecks.rolling_reach): per-day
    distinct users, 7-day rolling distinct users, and the DAU/WAU
    stickiness ratio — the churn-vs-rotation monitor plain counts
    miss. Exact rolling distinct via the bounded range join (|days|
    side tiny). Ordered by day."""
    e = _read(spark, sf_dir, "events")
    return (tablechecks.rolling_reach(e, "ts", "user_id")
            .orderBy("day"))


def q_daily_new_returning(spark, sf_dir):
    """New-vs-returning user split per day
    (tablechecks.new_vs_returning): first-seen day per user, then
    the per-day active split and new-share — the intake-mix monitor
    whose spike says the per-entity baselines need re-fitting. Two
    aggregations; ordered by day."""
    e = _read(spark, sf_dir, "events")
    return (tablechecks.new_vs_returning(e, "ts", "user_id")
            .orderBy("day"))


def q_ljung_box_volume(spark, sf_dir):
    """Ljung-Box portmanteau test (tablechecks.ljung_box; 1978) over
    daily event volume, lags 1-7: per-lag autocorrelations and the
    accumulated Q ~ χ²(m) — the multi-lag echo detector Durbin-
    Watson's single lag misses. Ordered by lag; the twin re-derives
    the same centered autocorrelations and running Q."""
    return (tablechecks.ljung_box(
        _daily_volume(spark, sf_dir), "volume", "day", max_lag=7)
        .orderBy("lag"))


def q_capture_recapture(spark, sf_dir):
    """Chapman capture-recapture population estimate
    (tablechecks.capture_recapture; Chapman 1951): two deterministic
    observation passes over doc ids (doc_id%3==0 and doc_id%5∈{0,1}),
    overlap → N̂ + SE — the crawl-completeness estimator, with the
    observed union as the audit column. One aggregation; the twin
    recomputes the same flags and closed forms."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.capture_recapture(
        d, "doc_id",
        in_a=F.pmod("doc_id", F.lit(3)) == 0,
        in_b=F.pmod("doc_id", F.lit(5)).isin(0, 1))


def q_shift_share_volume(spark, sf_dir):
    """Shift-share decomposition (tablechecks.shift_share; Dunn
    1960) of per-event-type value totals between the two halves of
    the month: growth effect vs mix effect (Σ mix = 0) — the triage
    that separates overall growth from quiet redistribution between
    types. Ordered by segment."""
    e = _read(spark, sf_dir, "events")
    return (tablechecks.shift_share(
        e, "value", by="event_type",
        period=F.dayofmonth("ts") > 15)
        .orderBy("segment"))


def q_record_days(spark, sf_dir):
    """Record-count anomaly check (tablechecks.record_days; records
    theory, Rényi 1962): running-maximum count vs the harmonic-number
    expectation — the distribution-free trend detector (a cumulative
    column leaked into a rate field beats H_n immediately). One
    window pass over the daily series."""
    return tablechecks.record_days(
        _daily_volume(spark, sf_dir), "volume", "day")


def q_c_chart_volume(spark, sf_dir):
    """Shewhart c-chart (tablechecks.c_chart; SPC standard) on daily
    event volume: center from the FIXED first-two-weeks baseline,
    Poisson ±3√c̄ limits, per-day out-of-control flags — the
    non-adaptive complement to Page-Hinkley (slow drift cannot
    recalibrate a frozen baseline away). Ordered by day."""
    e = _read(spark, sf_dir, "events")
    daily = (e.groupBy(F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("volume")))
    return (tablechecks.c_chart(
        daily, "volume", "day",
        baseline=F.col("day") <= F.lit("2024-01-14").cast("date"))
        .orderBy("order"))


def q_pct_encoding_audit(spark, sf_dir):
    """Percent-encoding validity census (urls.pct_encoding_audit;
    RFC 3986): valid %XX escapes, strictly-illegal escapes and
    %25XX double-encodings per url — the serialization-bug and
    dedup-breaking-alias detector. Seeded url corpus exercising all
    four cases (valid / double / invalid / multi-escape); pure
    regexp_count projection. Ordered by url."""
    from zoi_spark import urls

    d = _read(spark, sf_dir, "documents").select("doc_id")
    m = F.pmod("doc_id", F.lit(5))
    seg = (F.when(m == 0, F.lit("%20ok"))
           .when(m == 1, F.lit("%2541"))
           .when(m == 2, F.lit("%zz"))
           .when(m == 3, F.lit("%e9%a1"))
           .otherwise(F.lit("plain")))
    seeded = d.select(F.concat(
        F.lit("http://h.example/p/"),
        F.col("doc_id").cast("string"), F.lit("/"), seg)
        .alias("url"))
    return urls.pct_encoding_audit(seeded).orderBy("url")


def q_html_entity_audit(spark, sf_dir):
    """HTML-entity residue census per lang (text.html_entity_audit):
    named entities, numeric/hex references and bare ampersands — the
    double-escape / under-decode detector whose spike means a group's
    fingerprints diverged from their decoded twins. Deterministic
    fixture: docs cycle through &amp; / &#65; / bare-& / &#x1F600;
    suffixes so every counter is exercised. Ordered by group."""
    d = _read(spark, sf_dir, "documents")
    m = F.pmod("doc_id", F.lit(6))
    ent = (F.when(m == 0, F.lit(" &amp; ok"))
           .when(m == 1, F.lit(" &#65; num"))
           .when(m == 2, F.lit(" a & b"))
           .when(m == 3, F.lit(" &#x1F600; hex"))
           .otherwise(F.lit("")))
    inj = d.withColumn("t2", F.concat("text", ent))
    return (text.html_entity_audit(inj, text_col="t2", by="lang")
            .orderBy("group"))


def q_control_char_audit(spark, sf_dir):
    """Control/invisible-codepoint census per lang
    (text.control_char_audit): CRLF vs bare-CR, C0 controls, BOM,
    NBSP, zero-width space — the bytes that survive sloppy
    extraction and break whitespace tokenizers. Deterministic
    fixture injects CRLF, bare CR + BEL, and NBSP+ZWSP suffixes.
    Ordered by group."""
    d = _read(spark, sf_dir, "documents")
    m = F.pmod("doc_id", F.lit(6))
    cc = (F.when(m == 0, F.lit("\r\nline"))
          .when(m == 1, F.lit("\rbare\x07bell"))
          .when(m == 2, F.lit(" nb zw​"))
          .otherwise(F.lit("")))
    inj = d.withColumn("t2", F.concat("text", cc))
    return (text.control_char_audit(inj, text_col="t2", by="lang")
            .orderBy("group"))


def q_truncation_audit(spark, sf_dir):
    """Truncation detector per source (text.truncation_audit):
    mid-sentence-ending share + modal-length ceiling spike — every
    9th doc is cut to exactly 120 chars so the fixture plants the
    VARCHAR-ceiling signature the audit must find (modal_len 120).
    Ordered by group."""
    d = _read(spark, sf_dir, "documents")
    tr = d.withColumn(
        "t2", F.when(F.pmod("doc_id", F.lit(9)) == 0,
                     F.substring("text", 1, 120))
              .otherwise(F.col("text")))
    return (text.truncation_audit(tr, text_col="t2", by="source")
            .orderBy("group"))


def q_unit_mix(spark, sf_dir):
    """Unit-confusion detector (tablechecks.unit_mix_detector): every
    3rd 'view' value is scaled ×1000 — the ms-vs-seconds bug — and
    the log-decade histogram must flag EXACTLY that type (a detached
    ≥2-decade second mode above 20%). log10 rounded before flooring
    so engine libm ulps can't flip buckets. Ordered by group."""
    e = _read(spark, sf_dir, "events")
    v2 = (F.when((F.col("event_type") == "view")
                 & (F.pmod("event_id", F.lit(3)) == 0),
                 F.col("value") * 1000)
          .otherwise(F.col("value")))
    inj = e.withColumn("v2", v2)
    return (tablechecks.unit_mix_detector(inj, "v2",
                                          by="event_type")
            .orderBy("group"))


def q_event_echo(spark, sf_dir):
    """Duplicate-beacon echo audit (tablechecks.event_echo_audit):
    every 13th event is re-sent 1s later with identical
    (event_type, value) — at-least-once delivery's signature — and
    the audit must count exactly those echoes within the 2s gap.
    Per-entity lag windows with deterministic tie order."""
    e = _read(spark, sf_dir, "events")
    dup = (e.where(F.pmod("event_id", F.lit(13)) == 0)
           .withColumn("ts", F.col("ts")
                       + F.expr("INTERVAL 1 SECOND")))
    ee = e.unionByName(dup)
    return tablechecks.event_echo_audit(
        ee, by="user_id", ts_col="ts",
        state_cols=["event_type", "value"])


def q_shouting_audit(spark, sf_dir):
    """Shouting/exclamation spam profile per lang
    (text.shouting_audit): uppercase share, ALL-CAPS-word share,
    exclamation density and multi-'!' runs — the register-shift
    tells quality gates don't price. Every 7th doc gets a clickbait
    suffix so all four counters move. Ordered by group."""
    d = _read(spark, sf_dir, "documents")
    sh = d.withColumn(
        "t2", F.when(F.pmod("doc_id", F.lit(7)) == 0,
                     F.concat("text",
                              F.lit(" BUY NOW!!! AMAZING DEAL!")))
              .otherwise(F.col("text")))
    return (text.shouting_audit(sh, text_col="t2", by="lang")
            .orderBy("group"))


def q_id_continuity(spark, sf_dir):
    """Sequence-continuity audit (tablechecks.id_continuity_audit):
    event_ids 400-449 are removed (a lost batch) and every 101st
    surviving id is duplicated (double ingestion) — the audit must
    report exactly 50 missing, the gap at 400, and the duplicate
    count. One aggregation + one lag window over distinct ids."""
    e = _read(spark, sf_dir, "events")
    holes = e.where(~F.col("event_id").between(400, 449))
    dups = holes.where(F.pmod("event_id", F.lit(101)) == 0)
    inj = holes.unionByName(dups)
    return tablechecks.id_continuity_audit(inj, "event_id")


def q_partition_balance(spark, sf_dir):
    """Hash-partition balance pre-flight
    (tablechecks.partition_balance): user_id bucketed by a PORTABLE
    md5-derived hash into 32 buckets — straggler skew ratio, empty
    buckets and χ² vs uniform, the audit run before a column becomes
    a shuffle key at the north rule's scale. One hash aggregation."""
    e = _read(spark, sf_dir, "events")
    return tablechecks.partition_balance(e, "user_id", n_buckets=32)


def q_decile_shift(spark, sf_dir):
    """Per-decile quantile shift table (tablechecks.decile_shift)
    between even/odd-doc_id length distributions: exact interpolated
    q10..q90 per side + shifts — WHERE the drift lives, the
    drill-down after the w1/cvm/energy scalars say something moved.
    Ordered by decile."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.decile_shift(
        d, "n_chars", split=F.pmod("doc_id", F.lit(2)) == 0)
        .orderBy("decile"))


def q_heavy_hitters(spark, sf_dir):
    """Exact 1/k-heavy hitters (tablechecks.heavy_hitters) over
    event_type with k=6: per-partition Misra-Gries-style candidate
    pass in mapInPandas (superset guarantee by pigeonhole), broadcast
    semi-join exact verify — the full-cardinality groupBy shuffle
    never happens. Output is partitioning-invariant and exact."""
    e = _read(spark, sf_dir, "events")
    return tablechecks.heavy_hitters(e, "event_type", k=6)


def q_error_rate_trend(spark, sf_dir):
    """Cochran-Armitage trend test (tablechecks.cochran_armitage):
    is the error-event share drifting ACROSS ordered days? Scores =
    day-of-month, flag = event_type='error' — the ordered-strata
    complement of the unordered chi² independence and two-group
    z-test. One groupBy(day) + one closing aggregation."""
    e = _read(spark, sf_dir, "events")
    return tablechecks.cochran_armitage(
        e, flag=F.col("event_type") == "error",
        score=F.dayofmonth("ts"))


def q_lorenz_table(spark, sf_dir):
    """Lorenz concentration curve (tablechecks.lorenz_curve) of event
    volume across users at the decile grid — the drill-down behind
    the Gini scalar: cumulative value share at each ⌈n·d/10⌉ rank
    cut, ties broken by user id."""
    e = _read(spark, sf_dir, "events")
    return tablechecks.lorenz_curve(e, "user_id")


def q_kruskal_len_langs(spark, sf_dir):
    """Kruskal-Wallis H (tablechecks.kruskal_wallis) of doc length
    across langs — the nonparametric k-sample sibling of the ANOVA
    row: tie-corrected H from doubled average ranks over the
    distinct-value counts table (the mann_whitney_u idiom), never a
    global row window."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.kruskal_wallis(d, "n_chars", "lang")


def q_fleiss_langs(spark, sf_dir):
    """Fleiss' kappa (tablechecks.fleiss_kappa) over three synthetic
    deterministic raters of each doc's lang: rater A = stored label,
    rater B answers 'unk' every 5th doc, rater C mislabels to 'en'
    every 7th — the multi-rater generalization of the Cohen row; the
    DuckDB twin re-derives P̄/P_e from the same unpivoted ratings."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull())
    ratings = d.select(
        F.col("doc_id").alias("item"),
        F.explode(F.array(
            F.col("lang"),
            F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("unk"))
             .otherwise(F.col("lang")),
            F.when(F.pmod("doc_id", F.lit(7)) == 0, F.lit("en"))
             .otherwise(F.col("lang")))).alias("cat"))
    return tablechecks.fleiss_kappa(ratings, "item", "cat")


def q_gumbel_daily_max(spark, sf_dir):
    """Gumbel method-of-moments fit (tablechecks.gumbel_maxima) to
    the daily maxima of event value, with the 100-day return level —
    the capacity-planning complement of the records-theory and
    c-chart rows."""
    e = _read(spark, sf_dir, "events")
    return tablechecks.gumbel_maxima(
        e, "value", block=F.to_date("ts"), return_period=100)


def q_friedman_types(spark, sf_dir):
    """Friedman repeated-measures test (tablechecks.friedman_test):
    event types ranked WITHIN each day by daily count — do the types
    keep a consistent volume ordering across days? χ²_F + Kendall's
    W; incomplete days dropped and counted. Per-day rank windows
    ride k-row partitions, never the raw table."""
    e = _read(spark, sf_dir, "events")
    daily = (e.where(F.col("ts").isNotNull()
                     & F.col("event_type").isNotNull())
             .groupBy(F.to_date("ts").alias("day"),
                      "event_type")
             .agg(F.count(F.lit(1)).cast("double").alias("cnt")))
    return tablechecks.friedman_test(
        daily, block_col="day", treat_col="event_type",
        value_col="cnt")


def q_cronbach_quality(spark, sf_dir):
    """Cronbach's α (tablechecks.cronbach_alpha) over three derived
    per-doc quality sub-scores (log length, alpha-share, avg word
    length) — is the composite coherent enough to sum? One fused
    variance aggregation; listwise-dropped rows counted."""
    d = _read(spark, sf_dir, "documents")
    scored = d.select(
        F.log(F.col("n_chars") + 1).alias("len_score"),
        (F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
         / F.greatest(F.length("text"), F.lit(1))).alias("alpha_share"),
        (F.length("text")
         / F.greatest(F.size(F.split(F.col("text"), r"\s+")),
                      F.lit(1))).alias("avg_wlen"))
    return tablechecks.cronbach_alpha(
        scored, ["len_score", "alpha_share", "avg_wlen"])


def q_youden_len_gate(spark, sf_dir):
    """Youden-J optimal threshold (tablechecks.youden_threshold) for
    gating lang='en' on doc length — turns the roc_auc signal into
    an operating point; ties on J break toward the LOWEST threshold.
    Same distinct-score sweep shape as roc_auc."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull())
    return tablechecks.youden_threshold(
        d, score_col="n_chars", label_col=F.col("lang") == "en")


def q_mase_volume(spark, sf_dir):
    """MASE forecast-accuracy audit (tablechecks.mase): does the
    weekly rhythm (seasonal-naive lag 7) beat plain persistence
    (lag 1) at predicting daily event volume? Calendar-date joins on
    the per-day frame; unmatched days counted, never silently
    shifted."""
    e = _read(spark, sf_dir, "events")
    daily = (e.where(F.col("ts").isNotNull())
             .groupBy(F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).cast("double").alias("cnt")))
    return tablechecks.mase(daily, "cnt", "day", season=7)


def q_nelson_aalen_purchase(spark, sf_dir):
    """Nelson-Aalen cumulative hazard (tablechecks.nelson_aalen) of
    time-to-first-purchase on the SAME duration model as the
    Kaplan-Meier row (1 h buckets, right-censored never-buyers) —
    hazard increments read as per-bucket conversion intensity, plus
    the Fleming-Harrington survival exp(−H)."""
    e = _read(spark, sf_dir, "events")
    return (tablechecks.nelson_aalen(
        e, entity_col="user_id", ts_col="ts",
        event_pred=F.col("event_type") == "purchase", bucket_s=3600)
        .orderBy("t_bucket"))


def q_robust_shape_langs(spark, sf_dir):
    """Moment-free shape profile (tablechecks.robust_shape) of doc
    length per lang: Bowley quartile skewness + Moors octile
    kurtosis — the shape readout that survives power-law tails where
    third/fourth moments explode."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.robust_shape(d, "n_chars", by="lang")
            .orderBy("group"))


def q_gk_lambda_source_lang(spark, sf_dir):
    """Goodman-Kruskal λ (tablechecks.gk_lambda) between source and
    lang — does knowing the source reduce lang-prediction error
    (and vice versa)? The error-rate-units association reading the
    chi² row can't give. One (x,y) cell aggregation."""
    d = _read(spark, sf_dir, "documents")
    return tablechecks.gk_lambda(d, "source", "lang")


def q_kuiper_diurnal(spark, sf_dir):
    """Kuiper two-sample V (tablechecks.kuiper_two_sample) on
    hour-of-day between weekend and weekday events — the cyclic-safe
    drift test: a phase shift around midnight that KS under-reads
    shows fully in V = D⁺ + D⁻."""
    e = _read(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    hours = e.select(F.hour("ts").cast("double").alias("h"),
                     F.dayofweek("ts").isin(1, 7).alias("wk"))
    return tablechecks.kuiper_two_sample(hours, "h",
                                         split=F.col("wk"))


def q_poisson_scan_volume(spark, sf_dir):
    """Kulldorff-style Poisson scan (tablechecks.poisson_scan) over
    daily event volume at window lengths 1/3/7 days: each length's
    max-LLR interval — where the burst is, not just that one day was
    anomalous. RANGE windows over day indices, gap-safe."""
    e = _read(spark, sf_dir, "events")
    return (tablechecks.poisson_scan(e, "ts", windows=(1, 3, 7))
            .orderBy("w_days"))


def q_chow_value_halves(spark, sf_dir):
    """Chow structural-break test (tablechecks.chow_break): did the
    hour-of-day → value linear relation change between the first and
    second half of the month? One conditional-sums aggregation —
    SSEs from sufficient statistics, no residual frame."""
    e = _read(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    s = e.select(F.hour("ts").cast("double").alias("hh"),
                 F.col("value"),
                 (F.dayofmonth("ts") <= 15).alias("half"))
    return tablechecks.chow_break(s, "hh", "value",
                                  split=F.col("half"))


def q_weighted_kappa_buckets(spark, sf_dir):
    """Linearly weighted Cohen's kappa (tablechecks.weighted_kappa)
    between two deterministic ordinal quality raters: rater A =
    length quintile bucket 0-4, rater B = the same bucket nudged one
    level up every 4th doc — near-misses earn partial credit, the
    distinction the unweighted kappa row cannot make."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull())
    bucket = F.least(F.floor(F.col("n_chars") / 120), F.lit(4))
    rated = d.select(
        bucket.alias("ra"),
        F.least(bucket + F.when(F.pmod("doc_id", F.lit(4)) == 0,
                                1).otherwise(0),
                F.lit(4)).alias("rb"))
    return tablechecks.weighted_kappa(rated, "ra", "rb")


def q_partial_corr_len(spark, sf_dir):
    """First-order partial correlation (tablechecks.partial_corr):
    n_chars ~ token count with mean word length held constant — all
    three Pearson r's in one fused aggregation, listwise nulls."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("text").isNotNull())
    feats = d.select(
        F.col("n_chars").cast("double").alias("len"),
        F.size(F.split(F.col("text"), r"\s+")).cast("double")
         .alias("toks"),
        F.try_divide(F.length("text"),
                     F.size(F.split(F.col("text"), r"\s+")))
         .alias("wlen"))
    return tablechecks.partial_corr(feats, "len", "toks", "wlen")


def q_jonckheere_len_trend(spark, sf_dir):
    """Jonckheere-Terpstra ordered trend (tablechecks.
    jonckheere_terpstra): do doc lengths shift monotonically across
    source-id buckets ordered 0..4? Tie-corrected null moments; the
    trend refinement of the Kruskal-Wallis omnibus row. The grid
    plan is bounded by group×value cardinality, never rows."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("source").isNotNull())
    scored = d.select(
        (F.ascii(F.substring("source", -1, 1)) % 5)
        .cast("double").alias("bucket"),
        F.col("n_chars").cast("double").alias("len"))
    return tablechecks.jonckheere_terpstra(scored, "len", "bucket")


def q_emoji_sources(spark, sf_dir):
    """Emoji/pictograph census (text.emoji_profile) per source over
    a seeded frame: every 7th doc gets doc_id%3+1 flame emoji
    appended (the synthetic corpus is emoji-free) — counts are
    regexp MATCHES, codepoint-safe on both engines."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.withColumn(
        "text",
        F.when(F.pmod("doc_id", F.lit(7)) == 0,
               F.concat(F.col("text"), F.lit(" "),
                        F.repeat(F.lit("🔥"),
                                 (F.pmod("doc_id", F.lit(3)) + 1)
                                 .cast("int"))))
         .otherwise(F.col("text")))
    return (text.emoji_profile(seeded, by="source")
            .orderBy("group"))


def q_social_residue_sources(spark, sf_dir):
    """Social-platform residue census (text.social_residue) per
    source, seeded: every 11th doc gets ' #trending @user
    http://t.co/abc' appended — hashtag/mention/URL rates per kchar,
    the scraped-feed detector."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.withColumn(
        "text",
        F.when(F.pmod("doc_id", F.lit(11)) == 0,
               F.concat(F.col("text"),
                        F.lit(" #trending @user http://t.co/abc")))
         .otherwise(F.col("text")))
    return (text.social_residue(seeded, by="source")
            .orderBy("group"))


def q_sketch_quantile_audit(spark, sf_dir):
    """GK-sketch quantile audit (tablechecks.sketch_quantile_audit):
    per-lang p50/p90/p99 of n_chars — exact value plus whether
    Spark's approx_percentile(accuracy=100) lands its rank within
    the guaranteed n/accuracy bound. The production quantile path at
    10^12 rows IS the sketch; this row proves it holds on real data.
    The oracle twin re-derives exacts and expects every bound to
    hold."""
    d = _read(spark, sf_dir, "documents")
    return (tablechecks.sketch_quantile_audit(
        d, "n_chars", by="lang", probs=(0.5, 0.9, 0.99),
        accuracy=100).orderBy("group", "prob"))


def q_breusch_pagan_value(spark, sf_dir):
    """Breusch-Pagan/Koenker heteroscedasticity test (tablechecks.
    breusch_pagan): after value ~ hour-of-day, do squared residuals
    trend with the hour? LM = n·R² against χ²(1); two chained
    sufficient-statistic aggregations."""
    e = _read(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    s = e.select(F.hour("ts").cast("double").alias("hh"),
                 F.col("value"))
    return tablechecks.breusch_pagan(s, "hh", "value")


def q_wilcoxon_user_halves(spark, sf_dir):
    """Wilcoxon signed-rank (tablechecks.wilcoxon_signed_rank) on
    paired per-user mean event values, first half vs second half of
    the month — the paired complement of the Mann-Whitney row; zero
    diffs dropped and counted, ranks on the distinct-|d| table."""
    e = _read(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
        & F.col("user_id").isNotNull())
    pairs = (e.groupBy("user_id")
             .agg(F.avg(F.when(F.dayofmonth("ts") <= 15,
                               F.col("value"))).alias("a"),
                  F.avg(F.when(F.dayofmonth("ts") > 15,
                               F.col("value"))).alias("b"))
             .where(F.col("a").isNotNull() & F.col("b").isNotNull()))
    return tablechecks.wilcoxon_signed_rank(pairs, "a", "b")


def q_hl_shift_lens(spark, sf_dir):
    """Hodges-Lehmann shift estimate (tablechecks.
    hodges_lehmann_shift) of doc length, en vs the rest — the robust
    HOW-BIG companion to the rank-test verdict rows; the pair cloud
    stays a distinct-value weighted grid, never row-materialized."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull())
    return tablechecks.hodges_lehmann_shift(
        d, "n_chars", split=F.col("lang") == "en")


def q_ansari_bradley_lens(spark, sf_dir):
    """Ansari-Bradley scale test (tablechecks.ansari_bradley): is
    even-doc_id length dispersion equal to odd — the nonparametric
    sibling of the Brown-Forsythe row; both-end tie-averaged scores
    in closed form over the distinct-value table."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull())
    return tablechecks.ansari_bradley(
        d, "n_chars", split=F.pmod("doc_id", F.lit(2)) == 0)


def q_gibberish_sources(spark, sf_dir):
    """Gibberish/keyboard-mash profile (text.gibberish_profile) per
    source over a seeded frame: every 13th doc gets ' asdfghjklzxcv'
    appended (run of 13 consonants) — longest-consonant-run and
    vowel-share flags, the model-free mash detector."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.withColumn(
        "text",
        F.when(F.pmod("doc_id", F.lit(13)) == 0,
               F.concat(F.col("text"), F.lit(" asdfghjklzxcv")))
         .otherwise(F.col("text")))
    return (text.gibberish_profile(seeded, by="source")
            .orderBy("group"))


def q_hampel_days(spark, sf_dir):
    """Hampel rolling median±MAD outlier filter (tablechecks.
    hampel_filter, ±3 days, k=3) over daily event volume — the
    robust rolling detector a level shift cannot drag along;
    RANGE-joined neighborhoods shrink at gaps instead of
    stretching."""
    e = _read(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = (e.groupBy(F.to_date("ts").alias("d"))
             .agg(F.count(F.lit(1)).cast("double").alias("cnt")))
    lo = daily.agg(F.min("d").alias("d0"))
    idx = (daily.crossJoin(F.broadcast(lo))
           .select(F.datediff("d", F.col("d0")).cast("double")
                   .alias("i"), "cnt"))
    return (tablechecks.hampel_filter(idx, "cnt", "i",
                                      half_window=3, k=3.0)
            .orderBy("order"))


def q_rbo_terms_halves(spark, sf_dir):
    """Rank-biased overlap (tablechecks.rbo_top_terms, k=50, p=0.9)
    of the top-term lists between even- and odd-doc_id halves — the
    top-weighted 'did the vocabulary head move' score; ranking is
    (count desc, term asc), fully deterministic."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("text").isNotNull())
    toks = d.select(F.pmod("doc_id", F.lit(2)).alias("h"),
                    F.explode(F.split(F.lower("text"), "[^a-z]+"))
                     .alias("term")) \
            .where(F.length("term") >= 3)
    return tablechecks.rbo_top_terms(
        toks.where(F.col("h") == 0), toks.where(F.col("h") == 1),
        "term", k=50, p=0.9)


def q_ratio_value_per_click(spark, sf_dir):
    """Delta-method ratio CI (tablechecks.ratio_ci_delta): purchase
    value per click with USER-clustered variance — numerator and
    denominator share users, so the unit-level covariance term is
    load-bearing; aggregate per user first, then one moment pass."""
    e = _read(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull())
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase",
                     F.col("value")).otherwise(0.0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "click", 1.0)
              .otherwise(0.0)).alias("y"))
    return tablechecks.ratio_ci_delta(per_user, "x", "y")


def q_float_anomalies(spark, sf_dir):
    """IEEE-754 hygiene census (tablechecks.float_anomalies) over a
    seeded value column: every 17th event becomes NaN, 19th +Inf,
    23rd −0.0, 29th a subnormal — representation defects a null
    check can't see; −0.0 detected via the string cast (both
    engines print '-0.0')."""
    e = _read(spark, sf_dir, "events")
    seeded = e.withColumn(
        "value",
        F.when(F.pmod("event_id", F.lit(17)) == 0,
               F.lit(float("nan")))
         .when(F.pmod("event_id", F.lit(19)) == 0,
               F.lit(float("inf")))
         .when(F.pmod("event_id", F.lit(23)) == 0, F.lit(-0.0))
         .when(F.pmod("event_id", F.lit(29)) == 0, F.lit(1e-310))
         .otherwise(F.col("value")))
    return tablechecks.float_anomalies(seeded, "value")


def q_attribution_purchase(spark, sf_dir):
    """Multi-touch attribution (tablechecks.attribution_credit):
    purchases distribute credit over the user's PRIOR click/view
    touches under first/last/linear/U-shaped models — per-conversion
    rank windows ride tiny partitions; the only shuffle is the
    entity join."""
    e = _read(spark, sf_dir, "events")
    return (tablechecks.attribution_credit(
        e, entity_col="user_id", ts_col="ts",
        conv_pred=F.col("event_type") == "purchase",
        touch_pred=F.col("event_type").isin("click", "view"),
        type_col="event_type").orderBy("touch_type"))


def q_cvar_value_types(spark, sf_dir):
    """Expected shortfall per event type (tablechecks.cvar_tail,
    α=0.95): VaR plus the mean of the tail at-or-beyond it — how bad
    the bad days are, not just where they start."""
    e = _read(spark, sf_dir, "events").where(
        F.col("value").isNotNull())
    return (tablechecks.cvar_tail(e, "value", by="event_type",
                                  alpha=0.95).orderBy("group"))


def q_encoding_advisor(spark, sf_dir):
    """Columnar-encoding advisor (tablechecks.encoding_advisor) over
    events in event_id write order: distinct ratio, run lengths and
    monotone share per column → dict/rle/delta/plain suggestion —
    the physical-design sibling of the partition/zorder advisors."""
    e = _read(spark, sf_dir, "events")
    return (tablechecks.encoding_advisor(
        e, ["event_type", "user_id", "event_id"], "event_id")
        .orderBy("column"))


def q_breusch_godfrey_daily(spark, sf_dir):
    """Breusch-Godfrey LM test (tablechecks.breusch_godfrey) for
    lag-1 serial correlation in daily-volume residuals after the
    volume ~ day-index fit — the x-conditioned replacement for the
    Durbin-Watson row; tiny-series contract."""
    e = _read(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = (e.groupBy(F.to_date("ts").alias("d"))
             .agg(F.count(F.lit(1)).cast("double").alias("cnt")))
    lo = daily.agg(F.min("d").alias("d0"))
    idx = (daily.crossJoin(F.broadcast(lo))
           .select(F.datediff("d", F.col("d0")).cast("double")
                   .alias("i"), "cnt"))
    return tablechecks.breusch_godfrey(idx, "i", "cnt", "i")


def q_yuen_trimmed_lens(spark, sf_dir):
    """Yuen's 20%-trimmed-mean t (tablechecks.yuen_trimmed_t):
    en vs rest doc length in VALUE units with heavy-tail-proof
    error rates — exact order-statistic trim thresholds off the
    distinct-value cumulative table."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull())
    return tablechecks.yuen_trimmed_t(
        d, "n_chars", split=F.col("lang") == "en", trim=0.2)


def q_cluster_robust_hour(spark, sf_dir):
    """Cluster-robust OLS (tablechecks.cluster_robust_slope): the
    value ~ hour slope with USER-clustered CR1 sandwich errors —
    events from one user are not independent draws, and the
    inflation column says how badly the naive SE lies."""
    e = _read(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
        & F.col("user_id").isNotNull())
    s = e.select(F.hour("ts").cast("double").alias("hh"),
                 F.col("value"), F.col("user_id"))
    return tablechecks.cluster_robust_slope(
        s, "hh", "value", cluster_col="user_id")


def q_permutation_value_weekend(spark, sf_dir):
    """Deterministic randomization test (tablechecks.
    permutation_test_mean, 64 md5-seeded relabelings): weekend vs
    weekday mean event value — reproducible on any engine, no RNG
    state; p-value add-one smoothed."""
    e = _read(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    s = e.select(F.col("value"), F.col("event_id"),
                 F.dayofweek("ts").isin(1, 7).alias("wk"))
    return tablechecks.permutation_test_mean(
        s, "value", split=F.col("wk"), id_col="event_id",
        n_perm=64)


def q_common_prefix_sources(spark, sf_dir):
    """Template-head census (text.common_prefix_profile) per source
    over a seeded frame: three sources get a shared 'NEWSLETTER |
    subscribe now || ' opener prepended — set-LCP computed from just
    the lexicographic (min, max) pair, one aggregation."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.withColumn(
        "text",
        F.when(F.col("source").isin("src1", "src2", "src3"),
               F.concat(F.lit("NEWSLETTER | subscribe now || "),
                        F.col("text")))
         .otherwise(F.col("text")))
    return (text.common_prefix_profile(seeded, by="source")
            .orderBy("group"))


def q_conformal_value_hour(spark, sf_dir):
    """Split-conformal interval (tablechecks.conformal_interval,
    α=0.1): value ~ hour fit on one md5-bit half, the exact
    ⌈(n+1)·0.9⌉-th absolute residual on the other — an assumption-
    free accept band; coverage column is the calibration check."""
    e = _read(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    s = e.select(F.hour("ts").cast("double").alias("hh"),
                 F.col("value"), F.col("event_id"))
    return tablechecks.conformal_interval(
        s, "hh", "value", id_col="event_id", alpha=0.1)


def q_bernstein_error_days(spark, sf_dir):
    """Empirical-Bernstein bound (tablechecks.bernstein_bound,
    δ=0.05) on the per-day error-event rate — finite-sample valid
    at daily n where the z-interval is a hope; out-of-range rows
    counted, never silently clipped."""
    e = _read(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    s = e.select(F.to_date("ts").cast("string").alias("day"),
                 (F.col("event_type") == "error")
                 .cast("double").alias("err"))
    return (tablechecks.bernstein_bound(
        s, "err", by="day", lo=0.0, hi=1.0, delta=0.05)
        .orderBy("group"))


def q_hyphenation_sources(spark, sf_dir):
    """Hyphenation-artifact census (text.hyphenation_artifacts) per
    source, seeded: every 9th doc gets ' exam-\\nple hy-\\nphen'
    appended and every 15th a soft hyphen — the PDF-extraction
    fingerprint tokenizers choke on."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.withColumn(
        "text",
        F.when(F.pmod("doc_id", F.lit(9)) == 0,
               F.concat(F.col("text"), F.lit(" exam-\nple hy-\nphen")))
         .when(F.pmod("doc_id", F.lit(15)) == 0,
               F.concat(F.col("text"), F.lit("soft­hyphen")))
         .otherwise(F.col("text")))
    return (text.hyphenation_artifacts(seeded, by="source")
            .orderBy("group"))


def q_basket_rules_types(spark, sf_dir):
    """Pairwise association rules (tablechecks.basket_rules) over
    user-day baskets of event types: support/confidence/lift with
    the basket-level distinct first so multiplicity never inflates
    support. min_support=0.05."""
    e = _read(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    s = e.select(F.col("user_id"),
                 F.to_date("ts").cast("string").alias("day"),
                 F.col("event_type"))
    return (tablechecks.basket_rules(
        s, basket_cols=["user_id", "day"], item_col="event_type",
        min_support=0.05).orderBy("antecedent", "consequent"))


def q_dkw_len_band(spark, sf_dir):
    """DKW simultaneous CDF band (tablechecks.dkw_band, δ=0.05)
    around the document-length deciles — every decile gate is
    really a probability in [p−ε, p+ε], uniformly."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull())
    return (tablechecks.dkw_band(d, "n_chars", delta=0.05)
            .orderBy("decile"))


def q_typosquat_hosts(spark, sf_dir):
    """Typosquat detector (urls.typosquat_candidates) over seeded
    hosts: docs map to host{0..12}.example.com, every 97th doc's
    host is spoofed to h0st{k} — rare edit-distance-≤2 neighbors of
    high-volume hosts, volume-ratio-gated so legit siblings stay
    out. k×|hosts| levenshtein pass, never |hosts|²."""
    from zoi_spark import urls
    d = _read(spark, sf_dir, "documents")
    legit = F.concat(F.lit("host"),
                     F.pmod("doc_id", F.lit(13)).cast("string"),
                     F.lit(".example.com"))
    spoof = F.concat(F.lit("h0st"),
                     F.pmod("doc_id", F.lit(13)).cast("string"),
                     F.lit(".example.com"))
    seeded = d.select(
        F.when(F.pmod("doc_id", F.lit(97)) == 0, spoof)
         .otherwise(legit).alias("host"))
    return (urls.typosquat_candidates(seeded, "host", top_k=13)
            .orderBy("suspect", "legit"))


def q_krippendorff_langs(spark, sf_dir):
    """Krippendorff's nominal alpha (tablechecks.
    krippendorff_alpha) over a VARIABLE-rater seeded frame: every
    doc gets the stored lang, even docs a second rating ('unk'
    every 5th), %3 docs a third ('en' every 7th) — single-rating
    items drop from the pairable pool, the crowdsourcing shape
    Cohen/Fleiss can't take."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull())
    r1 = d.select(F.col("doc_id").alias("item"),
                  F.col("lang").alias("cat"))
    r2 = d.where(F.pmod("doc_id", F.lit(2)) == 0).select(
        F.col("doc_id").alias("item"),
        F.when(F.pmod("doc_id", F.lit(5)) == 0, F.lit("unk"))
         .otherwise(F.col("lang")).alias("cat"))
    r3 = d.where(F.pmod("doc_id", F.lit(3)) == 0).select(
        F.col("doc_id").alias("item"),
        F.when(F.pmod("doc_id", F.lit(7)) == 0, F.lit("en"))
         .otherwise(F.col("lang")).alias("cat"))
    ratings = r1.unionByName(r2).unionByName(r3)
    return tablechecks.krippendorff_alpha(ratings, "item", "cat")


def q_dalenius_len_strata(spark, sf_dir):
    """Dalenius-Hodges cum-√f stratification advisor (tablechecks.
    dalenius_strata, 4 strata over 50 bins) for doc length — the
    design step in front of the Neyman-allocation row."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull())
    return tablechecks.dalenius_strata(d, "n_chars", n_strata=4,
                                       n_bins=50)


def q_median_rollup_bias(spark, sf_dir):
    """Hierarchical-median rollup bias audit (tablechecks.
    median_rollup_bias): global median vs mean- and median-of-lang-
    medians — the medians-don't-compose evidence behind shipping
    quantile sketches instead of per-group medians."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull())
    return tablechecks.median_rollup_bias(d, "n_chars", by="lang")


def q_cochran_q_rules(spark, sf_dir):
    """Cochran's Q (tablechecks.cochran_q) over three derived
    pass/fail 'validator versions' of each doc (length gates at
    150/250/350 chars) — does the pass rate differ across rulesets
    GIVEN per-doc pairing; the k-ary McNemar."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull())
    rows = d.select(
        F.col("doc_id").alias("item"),
        F.explode(F.array(
            F.struct(F.lit("v150").alias("t"),
                     (F.col("n_chars") >= 150).alias("x")),
            F.struct(F.lit("v250").alias("t"),
                     (F.col("n_chars") >= 250).alias("x")),
            F.struct(F.lit("v350").alias("t"),
                     (F.col("n_chars") >= 350).alias("x"))))
        .alias("r")) \
        .select("item", F.col("r.t").alias("treat"),
                F.col("r.x").alias("x"))
    return tablechecks.cochran_q(rows, item_col="item",
                                 treat_col="treat", flag_col="x")


def q_turning_points_daily(spark, sf_dir):
    """Turning-point randomness test (tablechecks.turning_points)
    on daily event volume — too few extrema = trend, too many =
    alternation; the directional one-glance complement of the
    Ljung-Box row."""
    e = _read(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = (e.groupBy(F.to_date("ts").alias("d"))
             .agg(F.count(F.lit(1)).cast("double").alias("cnt")))
    return tablechecks.turning_points(daily, "cnt", "d")


def q_last_digit_values(spark, sf_dir):
    """Last-digit uniformity audit (tablechecks.
    last_digit_uniformity, cents scale) over event values — the
    fabrication/rounding detector complementing the Benford
    first-digit row."""
    e = _read(spark, sf_dir, "events").where(
        F.col("value").isNotNull())
    return tablechecks.last_digit_uniformity(e, "value", scale=100)


def q_stump_split_len(spark, sf_dir):
    """Gini decision-stump split (tablechecks.stump_split) for
    gating lang='en' on doc length — the CART-objective counterpart
    of the Youden row; same distinct-score suffix sweep, ties to
    the lowest threshold."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull())
    return tablechecks.stump_split(
        d, score_col="n_chars", label_col=F.col("lang") == "en")


def q_context_truncation(spark, sf_dir):
    """Context-length truncation planner (tablechecks.
    context_truncation_loss) over whitespace token counts at
    L ∈ {64, 128, 256, 512} — the token-loss share the doc-share
    number understates on heavy tails."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("text").isNotNull())
    toks = F.size(F.split(F.col("text"), r"\s+"))
    return (tablechecks.context_truncation_loss(
        d, toks, lengths=(64, 128, 256, 512))
        .orderBy("context_len"))


def q_deming_len_tokens(spark, sf_dir):
    """Deming errors-in-both regression (tablechecks.deming_fit,
    λ=1): n_chars vs 5×whitespace-tokens — two noisy measurements of
    document size; the attenuation column is how much naive OLS
    understates the relation."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull())
    s = d.select(F.col("n_chars").cast("double").alias("x"),
                 (F.size(F.split(F.col("text"), r"\s+")) * 5.0)
                 .alias("y"))
    return tablechecks.deming_fit(s, "x", "y", lam=1.0)


def q_effect_size_langs(spark, sf_dir):
    """Pairwise Hedges-g effect sizes (tablechecks.
    effect_size_pairs) of doc length across langs — the practical-
    significance companion to the Tukey row; G×G join on the tiny
    group-moment frame."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull())
    return (tablechecks.effect_size_pairs(d, "n_chars", by="lang")
            .orderBy("group_a", "group_b"))


def q_mahalanobis_len_tokens(spark, sf_dir):
    """Bivariate Mahalanobis audit (tablechecks.mahalanobis_2d) on
    (n_chars, token count): correlation-aware outliers the
    univariate z-score rows cannot see; χ²(2) 95% threshold."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull())
    s = d.select(F.col("n_chars").cast("double").alias("x"),
                 F.size(F.split(F.col("text"), r"\s+"))
                 .cast("double").alias("y"))
    return tablechecks.mahalanobis_2d(s, "x", "y")


def q_design_effect_users(spark, sf_dir):
    """Survey design effect (tablechecks.design_effect): event
    values clustered by user — ICC via ANOVA components, DEFF and
    the iid-equivalent effective n; the design-stage sibling of the
    cluster-robust-SE row."""
    e = _read(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("user_id").isNotNull())
    return tablechecks.design_effect(e, "value",
                                     cluster_col="user_id")


def q_bidi_audit_sources(spark, sf_dir):
    """Trojan-Source bidi census (text.bidi_audit) per source over
    a seeded frame: every 21st doc gets a BALANCED RLO…PDF span,
    every 35th a lone RLO — overrides/isolates counted and
    unbalanced embeddings (the attack tell) reported separately."""
    d = _read(spark, sf_dir, "documents")
    seeded = d.withColumn(
        "text",
        F.when(F.pmod("doc_id", F.lit(21)) == 0,
               F.concat(F.col("text"), F.lit("‮evil‬")))
         .when(F.pmod("doc_id", F.lit(35)) == 0,
               F.concat(F.col("text"), F.lit("‮")))
         .otherwise(F.col("text")))
    return (text.bidi_audit(seeded, by="source").orderBy("group"))


def q_gpd_value_tail(spark, sf_dir):
    """Peaks-over-threshold GPD fit (tablechecks.gpd_tail_fit,
    u = q95) on event values — every exceedance informs the tail,
    not one per block; rl_10x is the once-per-10n level."""
    e = _read(spark, sf_dir, "events").where(
        F.col("value").isNotNull())
    return tablechecks.gpd_tail_fit(e, "value", tail_q=0.95)


def q_seasonal_mk_volume(spark, sf_dir):
    """Seasonal Mann-Kendall (tablechecks.seasonal_mann_kendall)
    on daily event volume — Mondays only compare with Mondays, so
    the weekly rhythm cannot masquerade as trend; tie-corrected,
    continuity-corrected."""
    e = _read(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = (e.groupBy(F.to_date("ts").alias("d"))
             .agg(F.count(F.lit(1)).cast("double").alias("cnt")))
    return tablechecks.seasonal_mann_kendall(daily, "cnt", "d")


def q_qq_normal_values(spark, sf_dir):
    """Q-Q-against-normal decile table (tablechecks.
    qq_normal_table) for event values — WHERE normality fails, in
    SD units; one fused moments+percentiles pass."""
    e = _read(spark, sf_dir, "events").where(
        F.col("value").isNotNull())
    return (tablechecks.qq_normal_table(e, "value")
            .orderBy("decile"))


def q_ts_rounding_audit(spark, sf_dir):
    """Timestamp digit-preference audit (tablechecks.
    timestamp_rounding_audit) over a seeded frame: every 11th event
    truncated to the whole minute — the cron/backfill fingerprint
    as share-vs-uniform ratios plus the 60-bin second chi²."""
    e = _read(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    seeded = e.withColumn(
        "ts", F.when(F.pmod("event_id", F.lit(11)) == 0,
                     F.date_trunc("minute", F.col("ts")))
               .otherwise(F.col("ts")))
    return tablechecks.timestamp_rounding_audit(seeded, "ts")


def q_aa_calibration_values(spark, sf_dir):
    """A/A calibration harness (tablechecks.aa_calibration, 64
    md5-bit splits): how often does a Welch z cross 1.96 on null
    splits of event value — the is-my-testing-pipeline-overconfident
    audit; one pass, no explode."""
    e = _read(spark, sf_dir, "events").where(
        F.col("value").isNotNull())
    return tablechecks.aa_calibration(e, "value", id_col="event_id",
                                      n_splits=64)


def q_logrank_purchase_cohorts(spark, sf_dir):
    """Two-group log-rank test (tablechecks.logrank_test) on the
    km_purchase duration model: even vs odd user_id cohorts — do
    they convert at the same rate, weighting every bucket by who is
    still at risk; the censoring-aware verdict a raw conversion
    share cannot give."""
    e = _read(spark, sf_dir, "events")
    return tablechecks.logrank_test(
        e, entity_col="user_id", ts_col="ts",
        event_pred=F.col("event_type") == "purchase",
        group_pred=F.pmod("user_id", F.lit(2)) == 0,
        bucket_s=3600)


def q_cem_weekend_balance(spark, sf_dir):
    """CEM L1 imbalance (tablechecks.cem_imbalance): weekend vs
    weekday events over (hour-of-day band × value quartile band)
    strata — how confounded a naive weekend/weekday outcome
    comparison would be."""
    e = _read(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("value").isNotNull())
    return tablechecks.cem_imbalance(
        e, treat=F.dayofweek("ts").isin(1, 7),
        strata=[F.floor(F.hour("ts") / 6),
                F.least(F.floor(F.col("value") / 50), F.lit(4))])


def q_jarque_bera_types(spark, sf_dir):
    """Jarque-Bera normality verdict (tablechecks.jarque_bera) per
    event type — which segments license normal-theory gates at all;
    classical population moments, engine-neutral two-pass."""
    e = _read(spark, sf_dir, "events").where(
        F.col("value").isNotNull())
    return tablechecks.jarque_bera(e, "value", by="event_type")


def q_file_layout_docs(spark, sf_dir):
    """Parquet small-files audit (tablechecks.file_layout_audit)
    over the documents scan — per-file row distribution, skew, and
    the coalesce target for 1M-row files; rows attributed via
    input_file_name()."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tablechecks.file_layout_audit(
        d, target_rows_per_file=1_000_000)


def q_session_gap_curve(spark, sf_dir):
    """Session-gap sensitivity curve (tablechecks.
    session_gap_curve) at 5m/30m/1h/4h thresholds — one lag pass
    gives the whole curve; the knee justifies the sessionize
    timeout instead of folklore."""
    e = _read(spark, sf_dir, "events")
    return (tablechecks.session_gap_curve(
        e, entity_col="user_id", ts_col="ts",
        gaps_s=(300, 1800, 3600, 14400)).orderBy("gap_s"))


def q_qn_scale_lens(spark, sf_dir):
    """Rousseeuw-Croux Qn scale (tablechecks.qn_scale) of doc
    length next to the MAD and SD scales — the symmetry-free robust
    dispersion; k-th pairwise distance off the distinct-value
    weighted grid."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull())
    return tablechecks.qn_scale(d, "n_chars")


def q_rmst_purchase_cohorts(spark, sf_dir):
    """Restricted mean survival time (tablechecks.rmst_cohorts,
    τ=72h, 1h buckets) for even vs odd user cohorts on the
    km_purchase duration model — the time-unit effect size behind
    the log-rank verdict; robust where median survival is
    undefined."""
    e = _read(spark, sf_dir, "events")
    return tablechecks.rmst_cohorts(
        e, entity_col="user_id", ts_col="ts",
        event_pred=F.col("event_type") == "purchase",
        group_pred=F.pmod("user_id", F.lit(2)) == 0,
        tau_s=72 * 3600, bucket_s=3600)


def q_bland_altman_size(spark, sf_dir):
    """Bland-Altman limits of agreement (tablechecks.bland_altman)
    between two document-size measurements (n_chars/5 vs whitespace
    tokens) — can one replace the other, and is the bias
    proportional; the decision companion to the Deming row."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull())
    s = d.select((F.col("n_chars") / 5.0).alias("a"),
                 F.size(F.split(F.col("text"), r"\s+"))
                 .cast("double").alias("b"))
    return tablechecks.bland_altman(s, "a", "b")


def q_siegel_volume_trend(spark, sf_dir):
    """Siegel repeated-median slope (tablechecks.siegel_slope) of
    daily volume on day index — 50% breakdown robust trend, the
    step beyond the Theil-Sen row; tiny-series contract."""
    e = _read(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = (e.groupBy(F.to_date("ts").alias("d"))
             .agg(F.count(F.lit(1)).cast("double").alias("cnt")))
    lo = daily.agg(F.min("d").alias("d0"))
    idx = (daily.crossJoin(F.broadcast(lo))
           .select(F.datediff("d", F.col("d0")).cast("double")
                   .alias("i"), "cnt"))
    return tablechecks.siegel_slope(idx, "i", "cnt")


def q_sample_topk_terms(spark, sf_dir):
    """Sample-sufficiency advisor (tablechecks.
    sample_topk_stability): top-10 term recovery at 1%/5%/25%
    md5-hash samples of token occurrences — which profiling rate is
    safe for head-of-distribution questions."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("text").isNotNull())
    toks = (d.select(
        F.col("doc_id"),
        F.posexplode(F.split(F.lower("text"), "[^a-z]+"))
        .alias("pos", "term"))
        .where(F.length("term") >= 3)
        .select((F.col("doc_id") * 10000 + F.col("pos"))
                .alias("occ_id"), "term"))
    return (tablechecks.sample_topk_stability(
        toks, "term", rates=(0.01, 0.05, 0.25), k=10,
        id_col="occ_id").orderBy("rate"))


def q_filter_funnel_docs(spark, sf_dir):
    """Ordered filter-funnel attribution (tablechecks.
    filter_funnel) over four curation gates (length ≥ 100, lang
    known, text non-empty, length ≤ 520) — solo failure rate vs
    marginal kills per stage, the over-blocking diagnosis."""
    d = _read(spark, sf_dir, "documents")
    gates = [
        ("min_len", F.col("n_chars") >= 100),
        ("lang_known", F.col("lang").isNotNull()),
        ("has_text", F.col("text").isNotNull()
         & (F.length("text") > 0)),
        ("max_len", F.col("n_chars") <= 520)]
    return (tablechecks.filter_funnel(d, gates).orderBy("stage"))


def q_median_ci_langs(spark, sf_dir):
    """Distribution-free median CI (tablechecks.median_ci) per lang
    via order-statistic ranks — honest uncertainty for quantile
    gates, no normality plea."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull())
    return tablechecks.median_ci(d, "n_chars", by="lang")


def q_spiegelhalter_len_gate(spark, sf_dir):
    """Spiegelhalter calibration Z (tablechecks.spiegelhalter_z):
    a logistic length score p = σ((len−300)/50) predicting
    lang='en' — are the probabilities probabilities; the yardstick
    the binned reliability table lacks."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull() & F.col("n_chars").isNotNull())
    p = 1.0 / (1.0 + F.exp(-(F.col("n_chars") - 300.0) / 50.0))
    s = d.select(p.alias("p"),
                 (F.col("lang") == "en").alias("y"))
    return tablechecks.spiegelhalter_z(s, prob_col="p",
                                       label_col=F.col("y"))


def q_lin_ccc_size(spark, sf_dir):
    """Lin's concordance correlation (tablechecks.lin_ccc) between
    n_chars/5 and whitespace tokens — agreement with the 45° line,
    with C_b separating precision from accuracy; the scalar beside
    the Bland-Altman and Deming rows."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull())
    s = d.select((F.col("n_chars") / 5.0).alias("a"),
                 F.size(F.split(F.col("text"), r"\s+"))
                 .cast("double").alias("b"))
    return tablechecks.lin_ccc(s, "a", "b")


def q_yule_k_sources(spark, sf_dir):
    """Yule's K repeat-rate (text.yule_k) per source — the length-
    invariant vocabulary-dispersion constant; template churn reads
    high, rich prose low."""
    d = _read(spark, sf_dir, "documents")
    return text.yule_k(d, by="source")


def q_corpus_scorecard(spark, sf_dir):
    """One-pass corpus health scorecard (text.corpus_scorecard):
    ten hygiene signals fused into a single scan — the sentinel
    that says WHICH drill-down operator to run on one pass's
    budget."""
    d = _read(spark, sf_dir, "documents")
    return text.corpus_scorecard(d)


def q_skew_scan_events(spark, sf_dir):
    """Multi-column tail sweep (tablechecks.skew_scan) over
    (value, user_id, event_id) — p50/p99/p999, tail ratio and CV
    per column in one fused aggregation; the triage before any
    heavy tail machinery."""
    e = _read(spark, sf_dir, "events")
    return (tablechecks.skew_scan(
        e, ["value", "user_id", "event_id"]).orderBy("column"))


def q_page_trend_rules(spark, sf_dir):
    """Page's L ordered trend (tablechecks.page_trend) over three
    per-doc 'version scores' (length rescaled by 1.0/1.02/1.04) —
    the one-signed-z monotone-improvement read the Friedman omnibus
    dilutes."""
    d = _read(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull())
    rows = d.select(
        F.col("doc_id").alias("blk"),
        F.explode(F.array(
            F.struct(F.lit(1.0).alias("j"),
                     (F.col("n_chars") * 1.0
                      + F.pmod("doc_id", F.lit(7))).alias("v")),
            F.struct(F.lit(2.0).alias("j"),
                     (F.col("n_chars") * 1.02
                      + F.pmod("doc_id", F.lit(5))).alias("v")),
            F.struct(F.lit(3.0).alias("j"),
                     (F.col("n_chars") * 1.04
                      + F.pmod("doc_id", F.lit(3))).alias("v"))))
        .alias("r")) \
        .select("blk", F.col("r.j").alias("j"),
                F.col("r.v").alias("v"))
    return tablechecks.page_trend(rows, block_col="blk",
                                  treat_score="j", value_col="v")


def q_effective_dim_emb(spark, sf_dir):
    """Participation-ratio effective dimension (similarity.
    effective_dim) of the embeddings — how many of the 64 dims the
    corpus actually uses; dead dims are broken featurizer
    outputs."""
    em = _read(spark, sf_dir, "embeddings")
    return similarity.effective_dim(em, "embedding")


def q_anisotropy_emb(spark, sf_dir):
    """Exact corpus anisotropy (similarity.anisotropy): the mean
    pairwise cosine via the ||Σu||² identity — one pass instead of
    n²/2 dot products; high values collapse cosine's useful
    range."""
    em = _read(spark, sf_dir, "embeddings")
    return similarity.anisotropy(em, "embedding")


def q_norm_length_bias(spark, sf_dir):
    """Embedding-norm vs doc-length bias (similarity.
    norm_length_bias): is the norm a length feature in disguise —
    one id join + one moment pass."""
    em = _read(spark, sf_dir, "embeddings")
    d = _read(spark, sf_dir, "documents")
    return similarity.norm_length_bias(em, d)


def q_label_retrieval_eval(spark, sf_dir):
    """Label-as-relevance retrieval eval (similarity.
    label_retrieval_eval, k=10, 20 queries): precision@k, MRR and
    coverage from exact cosine ranking — is the embedding
    retrieval-ready before any index exists."""
    em = _read(spark, sf_dir, "embeddings")
    return similarity.label_retrieval_eval(em, k=10, n_queries=20)


def q_cluster_validity_emb(spark, sf_dir):
    """Calinski-Harabasz + Davies-Bouldin validity (similarity.
    cluster_validity) of the label partition — centroid/scatter
    math only, never a pairwise point pass."""
    em = _read(spark, sf_dir, "embeddings")
    return similarity.cluster_validity(em)


def q_label_confusability(spark, sf_dir):
    """Label-pair centroid-cosine confusability matrix (similarity.
    label_confusability) — which classes the space cannot tell
    apart; k×k tiny pair frame."""
    em = _read(spark, sf_dir, "embeddings")
    return (similarity.label_confusability(em)
            .orderBy("label_a", "label_b"))


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full rule-set validation over documents at sf0.001."""
    return q_documents_flagship(_utc(spark), "/root/testdata/sf0.001")


def _with_utc(fn: Callable[[SparkSession, str], DataFrame]
              ) -> Callable[[SparkSession, str], DataFrame]:
    return lambda spark, sf_dir: fn(_utc(spark), sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_utc(fn) for name, fn in _QUERIES.items()}


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # Roster order: driver CORRECTNESS checks read the first ~50 entries.
        # r4: the 42 queries the r3 driver window never reached come FIRST
        # (VERDICT r3 "Next round" #1); the 50 three-round-green queries follow.
        # tests/test_oracle_parity.py still replays ALL entries at two SFs.
        # r5 rotation plan: once CORRECTNESS_r04 lands (covering positions
        # 1-50), the never-driver-checked remainder is positions 51-213
        # (the r4 wave additions through `agg_merge_check`) plus the
        # wave-35-40 block at the end (`substring_spans` ...
        # `infer_json_schema`) — move 50 of those to the front each round;
        # the driver-green blocks rotate to the back. Every entry stays
        # covered by tests/test_oracle_parity.py at two SFs regardless of
        # position. Pre-flight any new order with
        # `python scripts/driver_gate_check.py 50` (~3 min), or replay the
        # full roster in slices: `driver_gate_check.py 60 <offset>`.
        "schema_docs": q_schema_docs,
        "email_variants": q_email_variants,
        "schema_introspection": q_schema_introspection,
        "validate_strict_parsed": q_validate_strict_parsed,
        "lazy_tree": q_lazy_tree,
        "json_probe": q_json_probe,
        "grapheme_length_rules": q_grapheme_length_rules,
        "winnowing_overlap_pairs": q_winnowing_overlap_pairs,
        "media_decode_features": q_media_decode_features,
        "media_audio_features": q_media_audio_features,
        "media_video_frames": q_media_video_frames,
        "contamination_probes": q_contamination_probes,
        "top_bigrams": q_top_bigrams,
        "cross_field_rules": q_cross_field_rules,
        "ivf_train_step": q_ivf_train_step,
        "ivf_topk_trained": q_ivf_topk_trained,
        "url_canonical_dedup": q_url_canonical_dedup,
        "pii_scan": q_pii_scan,
        "stream_validate_docs": q_stream_validate_docs,
        "host_cap_sample": q_host_cap_sample,
        "stratified_sample_langs": q_stratified_sample_langs,
        "incremental_new_docs": q_incremental_new_docs,
        "repetition_quality": q_repetition_quality,
        "stats_quantiles": q_stats_quantiles,
        "zscore_outliers": q_zscore_outliers,
        "pack_sequences": q_pack_sequences,
        "boilerplate_strip": q_boilerplate_strip,
        "c4_line_filter": q_c4_line_filter,
        "unigram_surprisal": q_unigram_surprisal,
        "semantic_dedup": q_semantic_dedup,
        "dup_ngram_fraction": q_dup_ngram_fraction,
        "gopher_quality": q_gopher_quality,
        "ngram_decontam": q_ngram_decontam,
        "url_quality": q_url_quality,
        "curate_e2e": q_curate_e2e,
        "dedup_doc_lines": q_dedup_doc_lines,
        "url_latest_dedup": q_url_latest_dedup,
        "token_budget_fill": q_token_budget_fill,
        "cluster_best_rep": q_cluster_best_rep,
        "stream_dedup_docs": q_stream_dedup_docs,
        "sessionize_events": q_sessionize_events,
        "ks_drift_len": q_ks_drift_len,
        "temperature_weights": q_temperature_weights,
        "dsir_weights": q_dsir_weights,
        "host_pagerank": q_host_pagerank,
        "bloom_decontam": q_bloom_decontam,
        "quality_linear": q_quality_linear,
        "ccnet_buckets": q_ccnet_buckets,
        "crosscorpus_join": q_crosscorpus_join,
        "script_mix": q_script_mix,
        # corpus_split/host_reputation sit at positions 51-52 — OUTSIDE
        # the driver's 50-row window this round (local two-SF replay
        # only); rotate them to the front in r5
        "corpus_split": q_corpus_split,
        "host_reputation": q_host_reputation,
        "mojibake_scan": q_mojibake_scan,
        "numeric_corr": q_numeric_corr,
        "bigram_surprisal": q_bigram_surprisal,
        "containment_pairs": q_containment_pairs,
        "host_hits": q_host_hits,
        "tfidf_terms": q_tfidf_terms,
        "paragraph_dedup": q_paragraph_dedup,
        "pii_redact": q_pii_redact,
        "zipf_profile": q_zipf_profile,
        "domain_blocklist": q_domain_blocklist,
        "oov_rate": q_oov_rate,
        "punct_normalize": q_punct_normalize,
        "path_templates": q_path_templates,
        "sq_ann": q_sq_ann,
        "js_drift": q_js_drift,
        "token_windows": q_token_windows,
        "dup_paras": q_dup_paras,
        "centroid_drift": q_centroid_drift,
        "recency_weights": q_recency_weights,
        "degree_stats": q_degree_stats,
        "heaps_fit": q_heaps_fit,
        "link_graph": q_link_graph,
        "pmi_bigrams": q_pmi_bigrams,
        "host_concentration": q_host_concentration,
        "ann_recall": q_ann_recall,
        "token_entropy": q_token_entropy,
        "sentence_stats": q_sentence_stats,
        "boiler_phrases": q_boiler_phrases,
        "trigram_surprisal": q_trigram_surprisal,
        "cluster_sizes": q_cluster_sizes,
        "image_dhash": q_image_dhash,
        "lpa_communities": q_lpa_communities,
        "shuffle_shards": q_shuffle_shards,
        "epoch_factors": q_epoch_factors,
        "benford_prices": q_benford_prices,
        "triangle_profile": q_triangle_profile,
        "lang_source_chi2": q_lang_source_chi2,
        "vocab_coverage": q_vocab_coverage,
        "source_lang_entropy": q_source_lang_entropy,
        "user_gaps": q_user_gaps,
        "assortativity": q_assortativity,
        "kcore_profile": q_kcore_profile,
        "silhouette_labels": q_silhouette_labels,
        "lang_fertility": q_lang_fertility,
        "gram_novelty": q_gram_novelty,
        "readability_langs": q_readability_langs,
        "source_len_gini": q_source_len_gini,
        "len_winsorize": q_len_winsorize,
        "props_profile": q_props_profile,
        "event_cooccurrence": q_event_cooccurrence,
        "signup_funnel": q_signup_funnel,
        "seed_hop_distance": q_seed_hop_distance,
        "video_scene_cuts": q_video_scene_cuts,
        "lang_best_docs": q_lang_best_docs,
        "source_caps": q_source_caps,
        "prefix_dups": q_prefix_dups,
        "url_params": q_url_params,
        "audio_silence_profile": q_audio_silence_profile,
        "event_volume_anomalies": q_event_volume_anomalies,
        "ab_arms": q_ab_arms,
        "html_strip_report": q_html_strip_report,
        "retention_weeks": q_retention_weeks,
        "tld_mix": q_tld_mix,
        "word_len_mix": q_word_len_mix,
        "mutual_knn": q_mutual_knn,
        # --- three-round driver-green queries (r1-r3) ---
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
        "jaccard_blocked_verify": q_jaccard_blocked_verify,
        "codec_encode_shipdate": q_codec_encode_shipdate,
        "ann_cosine_topk": q_ann_cosine_topk,
        "text_token_stats": q_text_token_stats,
        "text_quality_buckets": q_text_quality_buckets,
        "text_quality_stopword": q_text_quality_stopword,
        "text_lang_id": q_text_lang_id,
        "fingerprints": q_fingerprints,
        "winnowing_fingerprints": q_winnowing_fingerprints,
        "documents_flagship": q_documents_flagship,
        "disc_union_events": q_disc_union_events,
        "union_mixed_ts": q_union_mixed_ts,
        "codec_shipdate": q_codec_shipdate,
        "partition_verdicts": q_partition_verdicts,
        "stats_by_source": q_stats_by_source,
        "drift_len_kl": q_drift_len_kl,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_near_dups_lsh": q_embedding_near_dups_lsh,
        "array_rules_embeddings": q_array_rules_embeddings,
        "exact_dedup_keepfirst": q_exact_dedup_keepfirst,
        "ann_topk_arrow": q_ann_topk_arrow,
        "unique_salted": q_unique_salted,
        "form_ingest_events": q_form_ingest_events,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "lsh_ann_topk": q_lsh_ann_topk,
        "ivf_ann_topk": q_ivf_ann_topk,
        "stats_hll": q_stats_hll,
        "lsh_ann_multiprobe": q_lsh_ann_multiprobe,
        "dedup_clusters": q_dedup_clusters,
        "format_validators": q_format_validators,
        "tuple_rules": q_tuple_rules,
        "intersection_enum_remap": q_intersection_enum_remap,
        "mapkv_props": q_mapkv_props,
        "multiple_unique_decimal": q_multiple_unique_decimal,
        "scalar_coercion_matrix": q_scalar_coercion_matrix,
        "schema_algebra": q_schema_algebra,
        "json_schema_roundtrip": q_json_schema_roundtrip,
        "refine_ctx_multi": q_refine_ctx_multi,
        # wave 16 (r4 session 5): temporal joins, link prediction,
        # transition profiling, edit-distance verify
        "asof_attribution": q_asof_attribution,
        "range_join_sessions": q_range_join_sessions,
        "adamic_adar_hosts": q_adamic_adar_hosts,
        "markov_event_mix": q_markov_event_mix,
        "lev_prefix_pairs": q_lev_prefix_pairs,
        # wave 17 (r4 session 5): changepoint/rank/seasonality stats,
        # RFM segmentation, perceptual-hash dup groups
        "cusum_volume_shift": q_cusum_volume_shift,
        "mannwhitney_len": q_mannwhitney_len,
        "rfm_customers": q_rfm_customers,
        "volume_autocorr": q_volume_autocorr,
        "phash_dup_groups": q_phash_dup_groups,
        # wave 18 (r4 session 5): TrustRank, rollup composition,
        # path mining, skew forensics, syndication map
        "trust_rank_hosts": q_trust_rank_hosts,
        "lang_source_rollup": q_lang_source_rollup,
        "click_paths": q_click_paths,
        "user_key_skew": q_user_key_skew,
        "cross_source_copy_map": q_cross_source_copy_map,
        # wave 19 (r4 session 5): embedding-space health, vocab
        # overlap, burstiness, mutual information, volume trends
        "embedding_angle_hist": q_embedding_angle_hist,
        "lang_vocab_overlap": q_lang_vocab_overlap,
        "event_fano": q_event_fano,
        "lang_source_mi": q_lang_source_mi,
        "event_volume_trend": q_event_volume_trend,
        # wave 20 (r4 session 6): embedding QC, covariance matrix,
        # RRF rank fusion, snapshot host drift, MAD robust outliers
        "embedding_norm_qc": q_embedding_norm_qc,
        "emb_covariance": q_emb_covariance,
        "ann_rrf_fusion": q_ann_rrf_fusion,
        "snapshot_host_overlap": q_snapshot_host_overlap,
        "mad_outliers": q_mad_outliers,
        # wave 21 (r4 session 6): PQ ANN, Hill tail index, fetch
        # cadence, anchor-text mining, quality calibration
        "pq_ann": q_pq_ann,
        "hill_tail": q_hill_tail,
        "host_fetch_gaps": q_host_fetch_gaps,
        "anchor_texts": q_anchor_texts,
        "quality_calibration": q_quality_calibration,
        # wave 22 (r4 session 6): PPJoin, circular rhythm stats,
        # quantile normalization, robots census, feature hashing
        "ppjoin_pairs": q_ppjoin_pairs,
        "diurnal_profile": q_diurnal_profile,
        "quantile_norm": q_quantile_norm,
        "meta_robots": q_meta_robots,
        "hashed_features": q_hashed_features,
        # wave 23 (r4 session 7): type affinity, event debounce,
        # log-normal fit, bitext mining, Good-Turing unseen mass
        "type_affinity": q_type_affinity,
        "event_debounce": q_event_debounce,
        "lognormal_len": q_lognormal_len,
        "bitext_pairs": q_bitext_pairs,
        "good_turing": q_good_turing,
        "fd_check": q_fd_check,
        "key_profile": q_key_profile,
        "kmv_overlap": q_kmv_overlap,
        "completeness_by_source": q_completeness_by_source,
        "url_content_churn": q_url_content_churn,
        "session_overlap": q_session_overlap,
        "sequence_audit": q_sequence_audit,
        "order_reconciliation": q_order_reconciliation,
        "dup_rate_by_source": q_dup_rate_by_source,
        "derived_consistency": q_derived_consistency,
        "mode_share": q_mode_share,
        "rate_cap": q_rate_cap,
        "selflink_ratio": q_selflink_ratio,
        "schema_evolution": q_schema_evolution,
        "transition_audit": q_transition_audit,
        "canonical_audit": q_canonical_audit,
        "staleness_audit": q_staleness_audit,
        "rater_kappa": q_rater_kappa,
        "coverage_langs": q_coverage_langs,
        "cms_lang_counts": q_cms_lang_counts,
        "ewma_volume": q_ewma_volume,
        "fdr_drift": q_fdr_drift,
        "welch_len_sources": q_welch_len_sources,
        "spearman_len_tokens": q_spearman_len_tokens,
        "pass_rate_ztest": q_pass_rate_ztest,
        "runs_pass_audit": q_runs_pass_audit,
        "hapax_langs": q_hapax_langs,
        "quality_migration": q_quality_migration,
        "median_lang_lens": q_median_lang_lens,
        "host_pass_shrunk": q_host_pass_shrunk,
        "url_ext_mix": q_url_ext_mix,
        "jsd_lang_drift": q_jsd_lang_drift,
        "url_depth_mix": q_url_depth_mix,
        "idn_hosts": q_idn_hosts,
        "lsh_curve": q_lsh_curve,
        "neyman_alloc": q_neyman_alloc,
        "bm25_spark_docs": q_bm25_spark_docs,
        "postings_sample": q_postings_sample,
        "theil_len_sources": q_theil_len_sources,
        "code_switch_docs": q_code_switch_docs,
        "partition_plan": q_partition_plan,
        "shape_templates": q_shape_templates,
        "term_burstiness": q_term_burstiness,
        "lexical_hhi": q_lexical_hhi,
        "url_prefix_compression": q_url_prefix_compression,
        "k_anonymity_docs": q_k_anonymity_docs,
        "split_leakage_docs": q_split_leakage_docs,
        "golden_urls": q_golden_urls,
        "km_purchase": q_km_purchase,
        "bag_dedup_groups": q_bag_dedup_groups,
        "logreg_len_gate": q_logreg_len_gate,
        "zorder_advisor": q_zorder_advisor,
        "rule_cooccurrence": q_rule_cooccurrence,
        "bootstrap_len_ci": q_bootstrap_len_ci,
        "event_lateness": q_event_lateness,
        "agg_merge_check": q_agg_merge_check,
        # wave 35 (round-4 additions; enter the driver window at the
        # r5 rotation)
        "substring_spans": q_substring_spans,
        "robots_check_urls": q_robots_check_urls,
        "sitemap_frontier": q_sitemap_frontier,
        "sorted_neighborhood": q_sorted_neighborhood,
        "link_density_main": q_link_density_main,
        # wave 36
        "violation_examples": q_violation_examples,
        "l_diversity_docs": q_l_diversity_docs,
        "crawl_plan": q_crawl_plan,
        "bpe_pairs": q_bpe_pairs,
        "stream_window_violations": q_stream_window_violations,
        # wave 37
        "weighted_jaccard": q_weighted_jaccard,
        "soft_dedup_weights": q_soft_dedup_weights,
        "structure_docs": q_structure_docs,
        "cluster_audit": q_cluster_audit,
        # wave 38
        "robots_wildcards": q_robots_wildcards,
        "homoglyph_dups": q_homoglyph_dups,
        "emb_energy_hist": q_emb_energy_hist,
        "incremental_lsh_join": q_incremental_lsh_join,
        # wave 39
        "exact_len_quantiles": q_exact_len_quantiles,
        "corpus_card": q_corpus_card,
        "verdict_flips": q_verdict_flips,
        "negatives_sample": q_negatives_sample,
        # wave 40
        "bm25_ndcg": q_bm25_ndcg,
        "join_advisor": q_join_advisor,
        "infer_json_schema": q_infer_json_schema,
        # wave 41
        "multi_signal_dedup": q_multi_signal_dedup,
        "frontier_scores": q_frontier_scores,
        "blocking_pairwork": q_blocking_pairwork,
        # wave 42 — validation-core: expectation battery, snapshot
        # diff, conditional cross-column rules
        "expectation_battery": q_expectation_battery,
        "snapshot_changes": q_snapshot_changes,
        "conditional_rules": q_conditional_rules,
        # wave 43 — typed-table rule bootstrap, weighted sampling,
        # Unicode normalization QC
        "suggest_rules": q_suggest_rules,
        "weighted_sample": q_weighted_sample,
        "nfc_audit": q_nfc_audit,
        # wave 44 — SQL transpiler parity, SPRT monitoring,
        # multi-column PSI triage
        "transpiled_rules": q_transpiled_rules,
        "sprt_langs": q_sprt_langs,
        "columns_psi": q_columns_psi,
        # wave 45 — vocab pruning curve, WoE/IV scorecard, data
        # contract verdicts
        "vocab_prune": q_vocab_prune,
        "quality_woe": q_quality_woe,
        "contract_verdicts": q_contract_verdicts,
        # wave 46 — rule-catalog lineage, schema-evolution diff
        "rule_catalog": q_rule_catalog,
        "ruleset_diff": q_ruleset_diff,
        # wave 47 — z-order layout keys, violation auto-repair,
        # FK-graph sweep
        "zorder_keys": q_zorder_keys,
        "repair_suggestions": q_repair_suggestions,
        "fk_integrity": q_fk_sweep,
        # wave 48 — per-partition expectation verdicts, sampler GOF,
        # rolling PSI
        "expectations_by_source": q_expectations_by_source,
        "sampler_gof": q_sampler_gof,
        "rolling_psi": q_rolling_psi,
        # wave 49 — missingness-pattern census, per-key monotonicity,
        # approximate-FD mining, C4 badword gate
        "null_patterns": q_null_patterns,
        "ts_monotonic": q_ts_monotonic,
        "fd_mine": q_fd_mine,
        "badword_rate": q_badword_rate,
        # wave 50 — SCD2 state history, pointer-doubling chain
        # resolution, per-group OLS fit
        "scd2_history": q_scd2_history,
        "resolve_chains": q_resolve_chains,
        "group_ols": q_group_ols,
        # wave 51 — score-evaluation + probabilistic linkage: ROC AUC,
        # decile lift/gains, Fellegi–Sunter field weights
        "roc_auc": q_roc_auc,
        "lift_table": q_lift_table,
        "fs_weights": q_fs_weights,
        # wave 52 — t-closeness privacy gate, Dunning keyness,
        # Chao1 vocabulary richness
        "t_closeness": q_t_closeness,
        "keyness": q_keyness,
        "vocab_richness": q_vocab_richness,
        # wave 53 — IPF raking, weight ESS audit, streaming PSI drift
        "raking_weights": q_raking_weights,
        "weight_ess": q_weight_ess,
        "stream_psi": q_stream_psi,
        # wave 54 — replication-parity checksums, Jaro-Winkler linkage,
        # exact Wasserstein-1 drift
        "snapshot_parity": q_snapshot_parity,
        "jw_title_pairs": q_jw_title_pairs,
        "w1_len_drift": q_w1_len_drift,
        # wave 55 — DP count release, Horvitz-Thompson estimation,
        # RAKE keyword extraction
        "dp_lang_counts": q_dp_lang_counts,
        "ht_total_chars": q_ht_total_chars,
        "rake_keywords": q_rake_keywords,
        # wave 56: Page-Hinkley drift, ECOD outliers, CDC dedup
        "page_hinkley_volume": q_page_hinkley_volume,
        "ecod_outliers": q_ecod_outliers,
        "cdc_chunk_dedup": q_cdc_chunk_dedup,
        # wave 57: Kneser-Ney LM, Burrows' Delta, energy distance
        "kn_bigrams": q_kn_bigrams,
        "burrows_delta_sources": q_burrows_delta,
        "energy_len_drift": q_energy_len_drift,
        # wave 58: McNemar shift test, Luhn PAN scan, KN perplexity
        "mcnemar_rule_shift": q_mcnemar_rule_shift,
        "pan_luhn_scan": q_pan_luhn_scan,
        "kn_source_ppl": q_kn_source_ppl,
        # wave 59: TextRank keywords, Theil-Sen slope, Mann-Kendall
        "textrank_keywords": q_textrank_keywords,
        "theil_sen_volume": q_theil_sen_volume,
        "mann_kendall_volume": q_mann_kendall_volume,
        # wave 60: greedy set cover, timestamp sanity, binseg split
        "user_day_cover": q_user_day_cover,
        "ts_sanity": q_ts_sanity,
        "binseg_volume": q_binseg_volume,
        # wave 61: weekly seasonality, bin advisor, multibyte audit
        "weekly_seasonality": q_weekly_seasonality,
        "bin_advisor": q_bin_advisor,
        "multibyte_audit": q_multibyte_audit,
        # wave 62: CvM drift, one-way ANOVA, gear-CDC scale engine
        "cvm_len_drift": q_cvm_len_drift,
        "anova_len_sources": q_anova_len_sources,
        "cdc_chunk_dedup_arrow": q_cdc_chunk_dedup_arrow,
        # wave 63: Tukey HSD, Brown-Forsythe, power advisor
        "tukey_hsd_langs": q_tukey_hsd_langs,
        "levene_len_langs": q_levene_len_langs,
        "power_advisor": q_power_advisor,
        # wave 64: classifier PRF, volume xcorr, Simpson's screen
        "lang_id_prf": q_lang_id_prf,
        "volume_xcorr": q_volume_xcorr,
        "simpsons_check": q_simpsons_check,
        # wave 65: OLS diagnostics battery — DW, periodogram, Cook's
        "durbin_watson_volume": q_durbin_watson_volume,
        "weekly_spectrum": q_weekly_spectrum,
        "cooks_volume": q_cooks_volume,
        # wave 66: negbin overdispersion, CUPED, Pareto sources
        "negbin_user_events": q_negbin_user_events,
        "cuped_users": q_cuped_users,
        "pareto_sources": q_pareto_sources,
        # wave 67: Rényi spectrum, jackknife SE, Markov entropy rate
        "renyi_langs": q_renyi_langs,
        "jackknife_sources": q_jackknife_sources,
        "markov_entropy": q_markov_entropy,
        # wave 68: Chao-Shen entropy, rolling reach, new/returning
        "chao_shen_langs": q_chao_shen_langs,
        "rolling_reach_users": q_rolling_reach_users,
        "daily_new_returning": q_daily_new_returning,
        # wave 69: Ljung-Box, capture-recapture, shift-share
        "ljung_box_volume": q_ljung_box_volume,
        "capture_recapture": q_capture_recapture,
        "shift_share_volume": q_shift_share_volume,
        # wave 70: record days, c-chart, percent-encoding audit
        "record_days": q_record_days,
        "c_chart_volume": q_c_chart_volume,
        "pct_encoding_audit": q_pct_encoding_audit,
        # wave 71: entity residue, control chars, truncation
        "html_entity_audit": q_html_entity_audit,
        "control_char_audit": q_control_char_audit,
        "truncation_audit": q_truncation_audit,
        # wave 72: unit mix, event echoes, shouting profile
        "unit_mix": q_unit_mix,
        "event_echo": q_event_echo,
        "shouting_audit": q_shouting_audit,
        # wave 73: id continuity, partition balance, decile shift
        "id_continuity": q_id_continuity,
        "partition_balance": q_partition_balance,
        "decile_shift": q_decile_shift,
        # wave 74: heavy hitters, error-rate trend, Lorenz curve
        "heavy_hitters": q_heavy_hitters,
        "error_rate_trend": q_error_rate_trend,
        "lorenz_table": q_lorenz_table,
        # wave 75: Kruskal-Wallis, Fleiss' kappa, Gumbel maxima
        "kruskal_len_langs": q_kruskal_len_langs,
        "fleiss_langs": q_fleiss_langs,
        "gumbel_daily_max": q_gumbel_daily_max,
        # wave 76: Friedman test, Cronbach's alpha, Youden threshold
        "friedman_types": q_friedman_types,
        "cronbach_quality": q_cronbach_quality,
        "youden_len_gate": q_youden_len_gate,
        # wave 77: MASE forecast audit, Nelson-Aalen, robust shape
        "mase_volume": q_mase_volume,
        "nelson_aalen_purchase": q_nelson_aalen_purchase,
        "robust_shape_langs": q_robust_shape_langs,
        # wave 78: GK lambda, Kuiper diurnal, Poisson scan
        "gk_lambda_source_lang": q_gk_lambda_source_lang,
        "kuiper_diurnal": q_kuiper_diurnal,
        "poisson_scan_volume": q_poisson_scan_volume,
        # wave 79: Chow break, weighted kappa, partial correlation
        "chow_value_halves": q_chow_value_halves,
        "weighted_kappa_buckets": q_weighted_kappa_buckets,
        "partial_corr_len": q_partial_corr_len,
        # wave 80: Jonckheere trend, emoji census, social residue
        "jonckheere_len_trend": q_jonckheere_len_trend,
        "emoji_sources": q_emoji_sources,
        "social_residue_sources": q_social_residue_sources,
        # wave 81: sketch quantile audit, Breusch-Pagan, Wilcoxon
        "sketch_quantile_audit": q_sketch_quantile_audit,
        "breusch_pagan_value": q_breusch_pagan_value,
        "wilcoxon_user_halves": q_wilcoxon_user_halves,
        # wave 82: Hodges-Lehmann, Ansari-Bradley, gibberish profile
        "hl_shift_lens": q_hl_shift_lens,
        "ansari_bradley_lens": q_ansari_bradley_lens,
        "gibberish_sources": q_gibberish_sources,
        # wave 83: Hampel filter, RBO top terms, ratio-metric CI
        "hampel_days": q_hampel_days,
        "rbo_terms_halves": q_rbo_terms_halves,
        "ratio_value_per_click": q_ratio_value_per_click,
        # wave 84: float anomalies, attribution, expected shortfall
        "float_anomalies": q_float_anomalies,
        "attribution_purchase": q_attribution_purchase,
        "cvar_value_types": q_cvar_value_types,
        # wave 85: encoding advisor, Breusch-Godfrey, Yuen's t
        "encoding_advisor": q_encoding_advisor,
        "breusch_godfrey_daily": q_breusch_godfrey_daily,
        "yuen_trimmed_lens": q_yuen_trimmed_lens,
        # wave 86: cluster-robust SE, permutation test, prefix LCP
        "cluster_robust_hour": q_cluster_robust_hour,
        "permutation_value_weekend": q_permutation_value_weekend,
        "common_prefix_sources": q_common_prefix_sources,
        # wave 87: conformal interval, Bernstein bound, hyphenation
        "conformal_value_hour": q_conformal_value_hour,
        "bernstein_error_days": q_bernstein_error_days,
        "hyphenation_sources": q_hyphenation_sources,
        # wave 88: basket rules, DKW band, typosquat hosts
        "basket_rules_types": q_basket_rules_types,
        "dkw_len_band": q_dkw_len_band,
        "typosquat_hosts": q_typosquat_hosts,
        # wave 89: Krippendorff alpha, Dalenius strata, median bias
        "krippendorff_langs": q_krippendorff_langs,
        "dalenius_len_strata": q_dalenius_len_strata,
        "median_rollup_bias": q_median_rollup_bias,
        # wave 90: Cochran's Q, turning points, last digits
        "cochran_q_rules": q_cochran_q_rules,
        "turning_points_daily": q_turning_points_daily,
        "last_digit_values": q_last_digit_values,
        # wave 91: Gini stump, truncation planner, Deming fit
        "stump_split_len": q_stump_split_len,
        "context_truncation": q_context_truncation,
        "deming_len_tokens": q_deming_len_tokens,
        # wave 92: effect sizes, Mahalanobis, design effect
        "effect_size_langs": q_effect_size_langs,
        "mahalanobis_len_tokens": q_mahalanobis_len_tokens,
        "design_effect_users": q_design_effect_users,
        # wave 93: bidi audit, GPD tail fit, seasonal Mann-Kendall
        "bidi_audit_sources": q_bidi_audit_sources,
        "gpd_value_tail": q_gpd_value_tail,
        "seasonal_mk_volume": q_seasonal_mk_volume,
        # wave 94: QQ table, timestamp rounding, A/A calibration
        "qq_normal_values": q_qq_normal_values,
        "ts_rounding_audit": q_ts_rounding_audit,
        "aa_calibration_values": q_aa_calibration_values,
        # wave 95: log-rank test, CEM imbalance, Jarque-Bera
        "logrank_purchase_cohorts": q_logrank_purchase_cohorts,
        "cem_weekend_balance": q_cem_weekend_balance,
        "jarque_bera_types": q_jarque_bera_types,
        # wave 96: file layout, session-gap curve, Qn scale
        "file_layout_docs": q_file_layout_docs,
        "session_gap_curve": q_session_gap_curve,
        "qn_scale_lens": q_qn_scale_lens,
        # wave 97: RMST, Bland-Altman, Siegel slope
        "rmst_purchase_cohorts": q_rmst_purchase_cohorts,
        "bland_altman_size": q_bland_altman_size,
        "siegel_volume_trend": q_siegel_volume_trend,
        # wave 98: sample sufficiency, filter funnel, median CI
        "sample_topk_terms": q_sample_topk_terms,
        "filter_funnel_docs": q_filter_funnel_docs,
        "median_ci_langs": q_median_ci_langs,
        # wave 99: Spiegelhalter Z, Lin's CCC, Yule's K
        "spiegelhalter_len_gate": q_spiegelhalter_len_gate,
        "lin_ccc_size": q_lin_ccc_size,
        "yule_k_sources": q_yule_k_sources,
        # wave 100: fused scorecard, skew scan, Page trend
        "corpus_scorecard": q_corpus_scorecard,
        "skew_scan_events": q_skew_scan_events,
        "page_trend_rules": q_page_trend_rules,
        # wave 101: effective dim, anisotropy, norm-length bias
        "effective_dim_emb": q_effective_dim_emb,
        "anisotropy_emb": q_anisotropy_emb,
        "norm_length_bias": q_norm_length_bias,
        # wave 102: retrieval eval, cluster validity, confusability
        "label_retrieval_eval": q_label_retrieval_eval,
        "cluster_validity_emb": q_cluster_validity_emb,
        "label_confusability": q_label_confusability,
    }


# -- oracle-SQL generators ---------------------------------------------------

def _jaccard_pairs_sql(threshold: float) -> str:
    """Full all-pairs 3-word-shingle Jaccard ≥ threshold over the seeded
    corpus — the deterministic twin of the LSH-candidates + exact-verify
    plan (see q_dedup_jaccard_pairs for the recall argument)."""
    return f"""
        WITH docs AS ({_DUP_DOCS_SQL}),
        toks AS (
          SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
          FROM docs),
        sh AS (
          SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(
              CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
                   ELSE list_transform(range(1, len(t) - 1),
                                       i -> array_to_string(t[i:i+2], ' '))
              END) AS shingle
            FROM toks)),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY 1),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::DOUBLE AS i
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(i / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i / (sa.sz + sb.sz - i) >= {threshold}
    """


def _simhash_pairs_sql(max_hamming: int = 3, prefix_bits: int = 16) -> str:
    """Full 60-bit simhash recomputation in SQL: md5-prefix token hashes
    (bit-identical to dedup.token_hash60(hash='md5')), per-bit votes,
    majority bits, prefix blocking, hamming via xor+bit_count."""
    bits = 60
    h60 = "('0x' || substr(md5(t),1,15))::BIGINT"
    votes = ",\n              ".join(
        f"list_sum(list_transform(hs, h -> CASE WHEN h % {2**(j+1)} >= {2**j} "
        f"THEN 1 ELSE 0 END)) AS v{j}"
        for j in range(bits))
    sim = " + ".join(
        f"CASE WHEN 2*v{j} > n THEN {2**j}::BIGINT ELSE 0::BIGINT END"
        for j in range(bits))
    return f"""
        WITH docs AS ({_DUP_DOCS_SQL}),
        toks AS (
          SELECT doc_id,
                 list_transform(string_split({_NORM_SQL}, ' '),
                                t -> {h60}) AS hs
          FROM docs),
        v AS (SELECT doc_id, len(hs) AS n,
              {votes}
              FROM toks),
        sh AS (SELECT doc_id, ({sim}) AS simhash FROM v),
        blk AS (SELECT doc_id, simhash,
                       simhash >> {bits - prefix_bits} AS block FROM sh)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
        FROM blk a JOIN blk b
          ON a.block = b.block AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in plane) + "]"


def _lsh_ann_sql(k: int = 5, bits: int = 4, dim: int = 64, seed: int = 42,
                 multiprobe: bool = False) -> str:
    """Re-derive the random-hyperplane buckets with the SAME seeded
    literals the Spark plan inlines (similarity.hyperplanes), then rank
    within buckets — full SQL parity with similarity.lsh_topk /
    lsh_topk_multiprobe (probe set = own bucket + single-bit flips)."""
    planes = similarity.hyperplanes(dim, bits, seed)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_plane_sql(p)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    if multiprobe:
        probe_list = ", ".join(
            ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(bits)])
        q_cte = f"""
        q0 AS (SELECT vec_id AS query_id, v AS qv, bucket
               FROM bk WHERE vec_id < 3),
        q AS (SELECT query_id, qv,
                     unnest([{probe_list}]) AS bucket FROM q0),"""
    else:
        q_cte = """
        q AS (SELECT vec_id AS query_id, v AS qv, bucket
              FROM bk WHERE vec_id < 3),"""
    return f"""
        WITH c AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        bk AS (SELECT vec_id, v, ({bucket}) AS bucket FROM c),{q_cte}
        scored AS (
          SELECT q.query_id, bk.vec_id,
                 round(list_cosine_similarity(bk.v, q.qv), 6) AS cosine
          FROM bk JOIN q ON bk.bucket = q.bucket AND bk.vec_id != q.query_id),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scored)
        SELECT query_id, vec_id, cosine, rank::BIGINT AS rank
        FROM ranked WHERE rank <= {k}
    """


def _winnow_fp_ctes(k: int, w: int, source_sql: str) -> str:
    """The shared winnowing CTE chain (norm → rolling hashes → window
    minima → distinct fingerprint set ``fp(doc_id, u)``) over an
    arbitrary ``(doc_id, text)`` source — used by both the per-doc
    summary oracle and the overlap-pairs oracle."""
    B, M = text.WINNOW_BASE, text.WINNOW_MOD
    gram = " + ".join(
        f"unicode(substr(s, i + {j}, 1))::BIGINT * {pow(B, k - 1 - j, M)}"
        for j in range(k))
    # len < k: whole text hashed with the last `len` powers — modular
    # powers enumerated per concrete length (float power() would lose
    # integer precision past 2^53)
    short = " ".join(
        "WHEN length(s) = {L} THEN [({terms}) % {M}]".format(
            L=L, M=M,
            terms=" + ".join(
                f"unicode(substr(s, {j} + 1, 1))::BIGINT * {pow(B, L - 1 - j, M)}"
                for j in range(L)))
        for L in range(1, k))
    return f"""norm AS (
          SELECT doc_id, {_NORM_SQL} AS s
          FROM ({source_sql})),
        hashed AS (
          SELECT doc_id, s,
                 CASE
                   WHEN length(s) = 0 THEN []
                   {short}
                   ELSE list_transform(
                     range(1, length(s) - {k} + 2),
                     i -> ({gram}) % {M})
                 END AS hs
          FROM norm),
        winnowed AS (
          SELECT doc_id,
                 CASE
                   WHEN len(hs) = 0 THEN []
                   WHEN len(hs) <= {w} THEN [list_min(hs)]
                   ELSE list_transform(
                     range(1, len(hs) - {w} + 2),
                     i -> list_min(hs[i:i + {w} - 1]))
                 END AS sel
          FROM hashed),
        fp AS (SELECT doc_id, list_distinct(sel) AS u FROM winnowed)"""


def _winnowing_sql(k: int = 5, w: int = 8) -> str:
    """Re-derive the winnowing fingerprint summary in SQL: the same
    polynomial rolling hash over unicode codepoints (generated k-term
    sum, text.WINNOW_BASE/MOD constants) and the same sliding-window
    minima + distinct."""
    B, M = text.WINNOW_BASE, text.WINNOW_MOD
    gram = " + ".join(
        f"unicode(substr(s, i + {j}, 1))::BIGINT * {pow(B, k - 1 - j, M)}"
        for j in range(k))
    # len < k: whole text hashed with the last `len` powers — modular
    # powers enumerated per concrete length (float power() would lose
    # integer precision past 2^53)
    short = " ".join(
        "WHEN length(s) = {L} THEN [({terms}) % {M}]".format(
            L=L, M=M,
            terms=" + ".join(
                f"unicode(substr(s, {j} + 1, 1))::BIGINT * {pow(B, L - 1 - j, M)}"
                for j in range(L)))
        for L in range(1, k))
    return f"""
        WITH norm AS (
          SELECT doc_id, {_NORM_SQL} AS s
          FROM documents),
        hashed AS (
          SELECT doc_id, s,
                 CASE
                   WHEN length(s) = 0 THEN []
                   {short}
                   ELSE list_transform(
                     range(1, length(s) - {k} + 2),
                     i -> ({gram}) % {M})
                 END AS hs
          FROM norm),
        winnowed AS (
          SELECT doc_id,
                 CASE
                   WHEN len(hs) = 0 THEN []
                   WHEN len(hs) <= {w} THEN [list_min(hs)]
                   ELSE list_transform(
                     range(1, len(hs) - {w} + 2),
                     i -> list_min(hs[i:i + {w} - 1]))
                 END AS sel
          FROM hashed),
        fp AS (SELECT doc_id, list_distinct(sel) AS u FROM winnowed)
        SELECT doc_id,
               len(u)::INTEGER AS n_fp,
               list_min(u) AS fp_min,
               list_max(u) AS fp_max,
               coalesce(list_sum(u), 0)::BIGINT AS fp_sum
        FROM fp
    """


def _winnow_pairs_sql(k: int = 5, w: int = 8, min_shared: int = 5,
                      max_hash_docs: int = 20) -> str:
    """SQL twin of dedup.winnowing_overlap_pairs over the seeded dup
    corpus: same fingerprint sets, the same document-frequency pruning,
    the same shared-count threshold."""
    return f"""
        WITH {_winnow_fp_ctes(k, w, _DUP_DOCS_SQL)},
        ex AS (SELECT doc_id, unnest(u) AS h FROM fp),
        rare AS (SELECT h FROM ex GROUP BY h
                 HAVING count(*) <= {max_hash_docs}),
        pruned AS (SELECT ex.doc_id, ex.h FROM ex JOIN rare USING (h))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               count(*)::BIGINT AS n_shared
        FROM pruned a JOIN pruned b
          ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= {min_shared}
    """


def _embedding_lsh_pairs_sql(threshold: float, bits: int = 4,
                             dim: int = 64, seed: int = 42) -> str:
    """Pairs with cosine ≥ threshold within the same hyperplane bucket
    — the SQL twin of q_embedding_near_dups_lsh (same plane literals)."""
    planes = similarity.hyperplanes(dim, bits, seed)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_plane_sql(p)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    return f"""
        WITH bk AS (
          SELECT vec_id, embedding::DOUBLE[] AS v,
                 ({bucket}) AS bucket
          FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM bk a JOIN bk b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
    """


def _dedup_clusters_sql(threshold: float = 0.8) -> str:
    """Transitive closure of the all-pairs Jaccard graph: per-node
    reachability via a recursive CTE, cluster id = min reachable node
    — the deterministic twin of min-label propagation."""
    return f"""
        WITH RECURSIVE jpairs AS ({_jaccard_pairs_sql(threshold)}),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM jpairs
          UNION
          SELECT id_b, id_a FROM jpairs),
        reach AS (
          SELECT a AS src, a AS node FROM edges
          UNION
          SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a)
        SELECT src AS doc_id, min(node) AS cluster_id
        FROM reach GROUP BY src
    """


def _url_latest_sql() -> str:
    """SQL twin of q_url_latest_dedup: same seeded decorations and
    deterministic crawl timestamp, canonicalized with the
    urls.canonical_url_sql pipeline, keep latest (ties → min id)."""
    from zoi_spark.urls import canonical_url_sql

    return f"""
        WITH seeded AS (
          SELECT doc_id,
                 CASE ((doc_id % 5) + 5) % 5
                   WHEN 0 THEN 'http://host' || g || '.example.com/p/' || g
                   WHEN 1 THEN 'HTTP://HOST' || g || '.EXAMPLE.COM/p/' || g
                   WHEN 2 THEN 'http://host' || g
                               || '.example.com:80/p/' || g
                   WHEN 3 THEN 'http://host' || g || '.example.com/p/' || g
                               || '?utm_source=x&utm_campaign=y'
                   ELSE 'http://host' || g || '.example.com/p/' || g
                        || '#frag'
                 END AS url,
                 to_timestamp(1577836800
                              + (((doc_id * 7919) % 100000) + 100000)
                                % 100000) AS ts
          FROM (SELECT doc_id,
                       (((doc_id % 50) + 50) % 50)::VARCHAR AS g
                FROM documents)),
        c AS (
          SELECT doc_id, ts, {canonical_url_sql('url')} AS curl
          FROM seeded)
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (
            PARTITION BY curl ORDER BY ts DESC, doc_id ASC) AS rn
          FROM c)
        WHERE rn = 1
    """


def _curate_e2e_sql(min_quality: float = 0.55,
                    threshold: float = 0.8) -> str:
    """The whole pipeline.curate composition in one recursive query:
    validity filter → quality_score gate → md5 keep-min exact dedup →
    all-pairs exact Jaccard ≥ threshold → transitive closure → drop
    non-representatives. Stage order mirrors curate() exactly."""
    return f"""
        WITH RECURSIVE base AS (
          SELECT doc_id, text FROM ({_DUP_DOCS_SQL})
          WHERE doc_id IS NOT NULL AND doc_id >= 0
            AND text IS NOT NULL AND length(text) >= 1),
        q AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text, {_QUALITY_SQL} AS qs FROM base)
          WHERE qs >= {min_quality}),
        ex AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text, row_number() OVER (
              PARTITION BY md5({_NORM_SQL}) ORDER BY doc_id) AS rn
            FROM q)
          WHERE rn = 1),
        toks AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
                 FROM ex),
        sh AS (
          SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest(
              CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
                   ELSE list_transform(range(1, len(t) - 1),
                                       i -> array_to_string(t[i:i+2], ' '))
              END) AS shingle
            FROM toks)),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh
                  GROUP BY 1),
        jpairs AS (
          SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*)::DOUBLE AS i
            FROM sh a JOIN sh b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
          JOIN sizes sa ON sa.doc_id = id_a
          JOIN sizes sb ON sb.doc_id = id_b
          WHERE i / (sa.sz + sb.sz - i) >= {threshold}),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM jpairs
          UNION
          SELECT id_b, id_a FROM jpairs),
        reach AS (
          SELECT a AS src, a AS node FROM edges
          UNION
          SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
        clusters AS (
          SELECT src AS doc_id, min(node) AS cluster_id
          FROM reach GROUP BY src),
        drops AS (
          SELECT doc_id FROM clusters WHERE cluster_id != doc_id)
        SELECT e.doc_id FROM ex e
        LEFT JOIN drops d ON e.doc_id = d.doc_id
        WHERE d.doc_id IS NULL
    """


def _ivf_ann_sql(k: int = 5, n_centroids: int = 8, nprobe: int = 4) -> str:
    """Re-derive IVF end to end: md5-ranked centroid sample (the same
    deterministic rule as similarity.sample_centroids), 9-decimal-
    rounded argmax list assignment (ties → lowest index, mirroring
    nearest_centroid), nprobe probe lists ordered (dot DESC, index DESC)
    (mirroring reverse(array_sort) in top_centroids), then per-candidate
    cosine ranking."""
    return f"""
        WITH c AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents AS (
          SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1
                   AS i, v AS cv
          FROM c QUALIFY i < {n_centroids}),
        corp AS (
          SELECT vec_id, v, i AS cent FROM (
            SELECT c.vec_id, c.v, ct.i,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY round(list_dot_product(c.v, ct.cv), 9) DESC,
                              ct.i ASC) AS rn
            FROM c, cents ct)
          WHERE rn = 1),
        probes AS (
          SELECT query_id, qv, i AS cent FROM (
            SELECT q.vec_id AS query_id, q.v AS qv, ct.i,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY round(list_dot_product(q.v, ct.cv), 9) DESC,
                              ct.i DESC) AS rn
            FROM (SELECT vec_id, v FROM c WHERE vec_id < 3) q, cents ct)
          WHERE rn <= {nprobe}),
        scored AS (
          SELECT p.query_id, corp.vec_id,
                 round(list_cosine_similarity(corp.v, p.qv), 6) AS cosine
          FROM corp JOIN probes p
            ON corp.cent = p.cent AND corp.vec_id != p.query_id),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scored)
        SELECT query_id, vec_id, cosine, rank::BIGINT AS rank
        FROM ranked WHERE rank <= {k}
    """


def _pq_ann_sql(k: int = 5, m: int = 4, ksub: int = 8,
                seed: int = 42, dim: int = 64) -> str:
    """Re-derive PQ end to end from the SAME seeded codebook literals
    similarity.pq_codebooks generates: per-subspace squared-L2 via the
    |a|²+|c|²−2a·c identity (each term a sequential list_dot_product),
    9-decimal rounding before the argmin (ties → lowest centroid,
    mirroring the when-chain), then ADC = sum of the query's rounded
    subspace distances at the corpus codes, round-6, rank (adc ASC,
    id ASC)."""
    from zoi_spark.similarity import pq_codebooks

    books = pq_codebooks(dim, m=m, ksub=ksub, seed=seed)
    sub_d = dim // m
    rows = ",\n                 ".join(
        f"({s}, {c}, {list(map(float, cv))}::DOUBLE[])"
        for s, book in enumerate(books)
        for c, cv in enumerate(book))
    return f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents(s, c, cv) AS (
          VALUES {rows}),
        cd AS (
          SELECT vec_id, s, c,
                 round(list_dot_product(sub, sub)
                       + list_dot_product(cv, cv)
                       - 2 * list_dot_product(sub, cv), 9) AS d2
          FROM (SELECT vec_id, s, c, cv,
                       list_slice(v, s * {sub_d} + 1,
                                  s * {sub_d} + {sub_d}) AS sub
                FROM e, cents) t),
        codes AS (
          SELECT vec_id, s, c AS code FROM (
            SELECT vec_id, s, c,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY d2 ASC, c ASC) AS rn
            FROM cd) WHERE rn = 1),
        qd AS (
          SELECT vec_id AS query_id, s, c, d2 FROM cd
          WHERE vec_id < 3),
        scored AS (
          SELECT q.query_id, kk.vec_id, round(sum(q.d2), 6) AS adc
          FROM codes kk JOIN qd q
            ON q.s = kk.s AND q.c = kk.code
               AND kk.vec_id != q.query_id
          GROUP BY 1, 2),
        ranked AS (
          SELECT query_id, vec_id, adc,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc ASC, vec_id ASC)
                   AS rank
          FROM scored)
        SELECT query_id, vec_id, adc, rank FROM ranked
        WHERE rank <= {k}
    """


def _anchor_texts_sql() -> str:
    """Twin of q_anchor_texts: same seeded anchors, same element/href
    regexes and cleanup as text.anchor_texts/extract_links, top anchor
    via (count DESC, anchor ASC) row_number — the same order the
    Spark side's min((-n, anchor)) struct encodes."""
    from zoi_spark.text import _ANCHOR_RE, _HREF_RE

    apat = _ANCHOR_RE.replace("'", "''")
    hpat = _HREF_RE.replace("'", "''")
    return f"""
        WITH seeded AS (
          SELECT doc_id,
                 text || CASE doc_id % 3
                   WHEN 0 THEN ' <a href="http://anchor'
                     || (doc_id % 12)::VARCHAR || '.example/p">'
                     || CASE WHEN doc_id % 2 = 0 THEN 'Read More'
                             ELSE 'page ' || (doc_id % 12)::VARCHAR
                        END || '</a>'
                   WHEN 1 THEN ' <A HREF=''http://anchor'
                     || (doc_id % 12)::VARCHAR || '.example/p''>'
                     || CASE WHEN doc_id % 2 = 0 THEN 'Read More'
                             ELSE 'page ' || (doc_id % 12)::VARCHAR
                        END || '</A>'
                   ELSE ' <a class="x" href=http://anchor'
                     || (doc_id % 12)::VARCHAR || '.example/p>'
                     || CASE WHEN doc_id % 2 = 0 THEN 'Read More'
                             ELSE 'page ' || (doc_id % 12)::VARCHAR
                        END || '</a>'
                 END
                 || CASE WHEN doc_id % 4 = 1
                         THEN ' <a href="http://anchor'
                           || (doc_id % 12)::VARCHAR
                           || '.example/q">also this</a>'
                         ELSE '' END AS t
          FROM documents),
        els AS (
          SELECT unnest(regexp_extract_all(t, '{apat}')) AS el
          FROM seeded),
        pairs AS (
          SELECT lower(regexp_extract(
                   regexp_replace(
                     regexp_replace(regexp_extract(el, '{hpat}'),
                                    '(?i)^href\\s*=\\s*', '', 'g'),
                     '^["'']|["''>]+$', '', 'g'),
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                   AS host,
                 trim(lower(regexp_extract(el, '{apat}', 1))) AS anchor
          FROM els),
        counts AS (
          SELECT host, anchor, count(*) AS n FROM pairs
          WHERE host != '' AND anchor != '' GROUP BY 1, 2),
        ranked AS (
          SELECT host, anchor, n,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY n DESC, anchor ASC) AS r
          FROM counts),
        agg AS (
          SELECT host, sum(n)::BIGINT AS n_links,
                 count(*)::BIGINT AS n_anchors
          FROM counts GROUP BY host)
        SELECT a.host, a.n_links, a.n_anchors,
               r.anchor AS top_anchor, r.n::BIGINT AS top_anchor_n
        FROM agg a JOIN ranked r ON a.host = r.host AND r.r = 1
        WHERE a.n_links >= 1
        ORDER BY a.host
    """


def _scalar_matrix_sql() -> str:
    """SQL twin of q_scalar_coercion_matrix: same pools, same strict
    coercion guards, same chain-order semantics (min on raw, gte#1 on
    trimmed+lowered), same parsed-value aggregates."""
    pools = ",\n                     ".join(
        _pool_sql(n, p) for n, p in _SCALAR_POOLS.items())
    truthy = "('true','1','yes','on','y','enabled')"
    falsy = "('false','0','no','off','n','disabled')"
    num_re = r"^[+-]?\d+(\.\d+)?([eE][+-]?\d+)?$"
    return f"""
        WITH corpus AS (
              SELECT doc_id,
                     {pools},
                     CASE WHEN ((doc_id % 10) + 10) % 10 = 0 THEN 'x' END
                       AS null_c,
                     'anything' AS any_c,
                     CASE WHEN ((doc_id % 6) + 6) % 6 = 0 THEN 'Mixed'
                          ELSE 'lower' END AS dc,
                     CASE WHEN ((doc_id % 8) + 8) % 8 = 0 THEN 'mixed'
                          ELSE 'UPPER' END AS uc,
                     [((doc_id % 7) + 7) % 7,
                      ((doc_id % 3) + 3) % 3] AS ms
              FROM documents)
        SELECT key, n FROM (
          SELECT 'num_s.type' AS key, count(*)::BIGINT AS n FROM corpus
            WHERE num_s IS NOT NULL
              AND NOT regexp_matches(num_s, '{num_re}')
          UNION ALL
          SELECT 'num_s.gte', count(*)::BIGINT FROM corpus
            WHERE num_s IS NOT NULL AND regexp_matches(num_s, '{num_re}')
              AND NOT (num_s::DOUBLE >= 0.0)
          UNION ALL
          SELECT 'bool_s.type', count(*)::BIGINT FROM corpus
            WHERE bool_s IS NOT NULL AND bool_s NOT IN ('true', 'false')
          UNION ALL
          SELECT 'sb.type', count(*)::BIGINT FROM corpus
            WHERE sb IS NOT NULL AND lower(sb) NOT IN
              ('true','1','yes','on','y','enabled',
               'false','0','no','off','n','disabled')
          UNION ALL
          SELECT 'atom_s.one_of', count(*)::BIGINT FROM corpus
            WHERE atom_s IS NOT NULL
              AND atom_s NOT IN ('red', 'green', 'blue')
          UNION ALL
          SELECT 'null_c.type', count(*)::BIGINT FROM corpus
            WHERE null_c IS NOT NULL
          UNION ALL
          SELECT 'time_s.type', count(*)::BIGINT FROM corpus
            WHERE time_s IS NOT NULL AND NOT regexp_matches(time_s,
              '^\\d{{2}}:\\d{{2}}:\\d{{2}}(\\.\\d{{1,6}})?$')
          UNION ALL
          SELECT 'ms.unique_items', count(*)::BIGINT FROM corpus
            WHERE len(list_distinct(ms)) != len(ms)
          UNION ALL
          SELECT 'dc.downcase', count(*)::BIGINT FROM corpus
            WHERE dc IS NOT NULL AND NOT regexp_matches(dc, '^[^A-Z]*$')
          UNION ALL
          SELECT 'uc.upcase', count(*)::BIGINT FROM corpus
            WHERE uc IS NOT NULL AND NOT regexp_matches(uc, '^[^a-z]*$')
          UNION ALL
          SELECT 'chain.gte', count(*)::BIGINT FROM corpus
            WHERE chain IS NOT NULL AND NOT (length(chain) >= 6)
          UNION ALL
          SELECT 'chain.gte#1', count(*)::BIGINT FROM corpus
            WHERE chain IS NOT NULL
              AND length(chain) >= 6          -- effects skipped when the
                                              -- field constraint failed
              AND NOT (length(lower(trim(chain))) >= 5)
          UNION ALL
          SELECT 'num_sum_x100',
                 -- parsed is nil for any erring node: the gte-failing
                 -- negatives drop out of the sum (meta.ex:90-95)
                 (sum(CASE WHEN regexp_matches(num_s, '{num_re}')
                            AND num_s::DOUBLE >= 0.0
                           THEN num_s::DOUBLE END) * 100)::BIGINT
          FROM corpus
          UNION ALL
          SELECT 'bool_true',
                 sum(CASE WHEN bool_s = 'true' THEN 1 ELSE 0 END)::BIGINT
          FROM corpus
          UNION ALL
          SELECT 'sb_true',
                 sum(CASE WHEN lower(sb) IN {truthy} THEN 1
                          ELSE 0 END)::BIGINT
          FROM corpus
          UNION ALL
          SELECT 'tx_distinct', count(DISTINCT upper(trim(tx)))::BIGINT
          FROM corpus
          UNION ALL
          SELECT 'atom_distinct', count(DISTINCT CASE
                   WHEN atom_s IN ('red', 'green', 'blue') THEN atom_s
                 END)::BIGINT
          FROM corpus
        ) WHERE n > 0
    """


def _refine_ctx_sql() -> str:
    """SQL twin of q_refine_ctx_multi: the same dynamic/static
    messages, plus the prettified/treefied post-processing of the
    c_custkey <= 120 subset."""
    branches = """
              SELECT 'name ends ' || substr(c_name, length(c_name), 1)
                AS key FROM customer
                WHERE c_name IS NOT NULL
                  AND substr(c_name, length(c_name), 1)
                      IN ('0','1','2','3','4') {extra}
              UNION ALL
              SELECT 'padded name' FROM customer
                WHERE c_name IS NOT NULL AND contains(c_name, '00') {extra}
              UNION ALL
              SELECT 'balance too high' FROM customer
                WHERE c_acctbal IS NOT NULL AND NOT (c_acctbal <= 9000.0)
                {extra}
              UNION ALL
              SELECT 'nation out of range' FROM customer
                WHERE c_nationkey IS NOT NULL
                  AND NOT (c_nationkey BETWEEN 0 AND 20) {extra}
    """
    all_rows = branches.format(extra="")
    sub = branches.format(extra="AND c_custkey <= 120")
    return f"""
        SELECT key, count(*)::BIGINT AS n FROM ({all_rows}) GROUP BY key
        UNION ALL
        SELECT 'pretty:' || key || ', at ' ||
               CASE WHEN key IN ('balance too high') THEN 'c_acctbal'
                    WHEN key IN ('nation out of range') THEN 'c_nationkey'
                    ELSE 'c_name' END AS key,
               count(*)::BIGINT FROM ({sub}) GROUP BY 1
        UNION ALL
        SELECT 'treefy:' ||
               CASE WHEN key IN ('balance too high') THEN 'c_acctbal'
                    WHEN key IN ('nation out of range') THEN 'c_nationkey'
                    ELSE 'c_name' END AS key,
               count(*)::BIGINT FROM ({sub}) GROUP BY 1
    """


def _email_variants_sql() -> str:
    """SQL twins of the four email patterns; the default's lookaheads
    re-expressed as conjunctions for RE2 (same device as
    format_validators)."""
    pool = _pool_sql("em", _EMAIL_POOL)
    html5 = (r"(?i)^[\w.!#$%&''*+/=?^`{|}~-]+@[a-z\d](?:[a-z\d-]{0,61}"
             r"[a-z\d])?(?:\.[a-z\d](?:[a-z\d-]{0,61}[a-z\d])?)*$")
    # the apostrophe in the rfc5322 local-part class is doubled for the
    # SQL string literal
    rfc = (r'^(?:"[^"]+"|[!#-' + "''" + r'*+/-9=?A-Z^_`a-z{|}~]+)@'
           r"(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?\.)+"
           r"[A-Za-z]{2,63}$")
    simple = r"^[^@,;\s]+@[^@,;\s]+$"
    return f"""
        WITH corpus AS (SELECT doc_id, {pool} FROM documents)
        SELECT rule_id, count(*)::BIGINT AS n FROM (
          SELECT 'em_default.email' AS rule_id FROM corpus
            WHERE em IS NOT NULL AND NOT (
              regexp_matches(em,
                '(?i)^([a-z0-9_''+\\-\\.]*)[a-z0-9_+\\-]@([a-z0-9][a-z0-9\\-]*\\.)+[a-z]{{2,}}$')
              AND NOT regexp_matches(em, '^\\.')
              AND NOT contains(em, '..'))
          UNION ALL
          SELECT 'em_html5.email' FROM corpus
            WHERE em IS NOT NULL AND NOT regexp_matches(em, '{html5}')
          UNION ALL
          SELECT 'em_rfc.email' FROM corpus
            WHERE em IS NOT NULL AND NOT regexp_matches(em, '{rfc}')
          UNION ALL
          SELECT 'em_simple.email' FROM corpus
            WHERE em IS NOT NULL AND NOT regexp_matches(em, '{simple}')
        ) GROUP BY rule_id
    """


def _url_dedup_sql() -> str:
    """SQL twin of q_url_canonical_dedup: same seeded decorations,
    canonicalized with the urls.canonical_url_sql pipeline (identical
    RE2 regex steps)."""
    from zoi_spark.urls import canonical_url_sql

    return f"""
        WITH seeded AS (
          SELECT doc_id,
                 CASE ((doc_id % 5) + 5) % 5
                   WHEN 0 THEN 'http://host' || g || '.example.com/p/' || g
                   WHEN 1 THEN 'HTTP://HOST' || g || '.EXAMPLE.COM/p/' || g
                   WHEN 2 THEN 'http://host' || g || '.example.com:80/p/' || g
                   WHEN 3 THEN 'http://host' || g || '.example.com/p/' || g
                               || '?utm_source=x&utm_campaign=y'
                   ELSE 'http://host' || g || '.example.com/p/' || g
                        || '#frag'
                 END AS url
          FROM (SELECT doc_id,
                       (((doc_id % 50) + 50) % 50)::VARCHAR AS g
                FROM documents)),
        canon AS (SELECT doc_id, {canonical_url_sql("url")} AS curl
                  FROM seeded)
        SELECT curl, count(*)::BIGINT AS n_docs, min(doc_id) AS keep_id
        FROM canon WHERE curl IS NOT NULL AND curl != ''
        GROUP BY curl HAVING count(*) > 1
    """


def _pii_scan_sql() -> str:
    from zoi_spark.text import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

    def cnt(pat: str) -> str:
        esc = pat.replace("'", "''")
        return (f"len(regexp_extract_all(coalesce(t, ''), '{esc}'))::BIGINT")

    return f"""
        WITH seeded AS (
          SELECT doc_id, lang,
                 text
                 || CASE WHEN ((doc_id % 11) + 11) % 11 = 0
                         THEN ' contact bob@example.com' ELSE '' END
                 || CASE WHEN ((doc_id % 13) + 13) % 13 = 0
                         THEN ' server 192.168.1.1 up' ELSE '' END
                 || CASE WHEN ((doc_id % 17) + 17) % 17 = 0
                         THEN ' call +1 (555) 123-4567' ELSE '' END AS t
          FROM documents),
        counted AS (
          SELECT lang,
                 {cnt(PII_EMAIL_RE)} AS e,
                 {cnt(PII_IPV4_RE)} AS i,
                 {cnt(PII_PHONE_RE)} AS p
          FROM seeded)
        SELECT lang, count(*)::BIGINT AS n_docs,
               sum(e)::BIGINT AS emails,
               sum(i)::BIGINT AS ips,
               sum(p)::BIGINT AS phones,
               sum(CASE WHEN e + i + p > 0 THEN 1 ELSE 0 END)::BIGINT
                 AS docs_with_pii
        FROM counted GROUP BY lang
    """


def _pii_redact_sql() -> str:
    from zoi_spark.text import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE

    def esc(pat: str) -> str:
        return pat.replace("'", "''")

    def cnt(pat: str) -> str:
        return f"len(regexp_extract_all(t, '{esc(pat)}'))::BIGINT"

    return f"""
        WITH seeded AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 11 = 0
                         THEN ' contact bob@example.com or sue@test.org'
                         ELSE '' END
                 || CASE WHEN doc_id % 13 = 0
                         THEN ' server 192.168.1.1 up' ELSE '' END
                 || CASE WHEN doc_id % 17 = 0
                         THEN ' call +1 (555) 123-4567' ELSE '' END AS t
          FROM documents),
        red AS (
          SELECT doc_id,
                 {cnt(PII_EMAIL_RE)} AS n_pii_email,
                 {cnt(PII_IPV4_RE)} AS n_pii_ipv4,
                 {cnt(PII_PHONE_RE)} AS n_pii_phone,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(t, '{esc(PII_EMAIL_RE)}',
                                    '<EMAIL>', 'g'),
                     '{esc(PII_IPV4_RE)}', '<IP>', 'g'),
                   '{esc(PII_PHONE_RE)}', '<PHONE>', 'g')
                   AS redacted_text
          FROM seeded)
        SELECT doc_id, n_pii_email, n_pii_ipv4, n_pii_phone,
               redacted_text
        FROM red
        WHERE n_pii_email + n_pii_ipv4 + n_pii_phone > 0
        ORDER BY doc_id
    """


def _domain_blocklist_sql() -> str:
    hosts = ["TRACKER.example", "ads.tracker.example",
             "nottracker.example", "spam.test",
             "deep.sub.ads.example.com", "clean.org"]
    cases = " ".join(
        f"WHEN {i} THEN 'http://{h}/p/{i}'" for i, h in enumerate(hosts))
    entries = ", ".join(f"('{d}')" for d in sorted(set(_BLOCKLIST)))
    return f"""
        WITH seeded AS (
          SELECT doc_id, CASE doc_id % 6 {cases} END AS url
          FROM documents),
        hosted AS (
          SELECT doc_id,
                 lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS host
          FROM seeded)
        SELECT doc_id, host,
               (SELECT d FROM (VALUES {entries}) b(d)
                WHERE host = d OR host LIKE '%.' || d
                ORDER BY len(d) DESC, d DESC LIMIT 1) AS blocked_domain,
               (SELECT count(*) > 0 FROM (VALUES {entries}) b(d)
                WHERE host = d OR host LIKE '%.' || d) AS blocked
        FROM hosted ORDER BY doc_id
    """


def _punct_normalize_sql() -> str:
    from zoi_spark.text import _PUNCT_FROM, _PUNCT_TO

    frm = _PUNCT_FROM.replace("'", "''")
    to = _PUNCT_TO.replace("'", "''")
    return f"""
        WITH seeded AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 3 = 1
                         THEN ' “it’s” — fine…' ELSE '' END
                 || CASE WHEN doc_id % 7 = 5
                         THEN ' a b​c﻿d' ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
               replace(translate(t, '{frm}', '{to}'), '…', '...')
                 AS norm_text,
               replace(translate(t, '{frm}', '{to}'), '…', '...') != t
                 AS changed
        FROM seeded ORDER BY doc_id
    """


def _boiler_phrases_sql() -> str:
    from zoi_spark.text import BOILER_PHRASES

    flags = ", ".join(
        f"contains(lower(t), '{p}') AS bp_{i}"
        for i, p in enumerate(BOILER_PHRASES))
    hits = " + ".join(
        f"bp_{i}::INT" for i in range(len(BOILER_PHRASES)))
    return f"""
        WITH seeded AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 3 = 0
                         THEN ' Subscribe to our newsletter!'
                         ELSE '' END
                 || CASE WHEN doc_id % 4 = 0
                         THEN ' All Rights Reserved.' ELSE '' END
                 || CASE WHEN doc_id % 5 = 0
                         THEN ' click HERE' ELSE '' END
                 || CASE WHEN doc_id % 6 = 0
                         THEN ' enable JavaScript to continue'
                         ELSE '' END AS t
          FROM documents),
        flagged AS (SELECT doc_id, {flags} FROM seeded)
        SELECT *, ({hits})::BIGINT AS n_boiler_hits,
               ({hits}) >= 2 AS boiler_flagged
        FROM flagged ORDER BY doc_id
    """


def _lpa_sql(iters: int = 3) -> str:
    """Unrolled synchronous LPA twin: per round a message join, a
    (node,label) count, the (count DESC, label ASC) argmax and the
    isolated-node coalesce — mirroring graph.lpa_communities over the
    two-chorded-rings-plus-bridge seeded graph."""
    rounds = []
    for r in range(1, iters + 1):
        prev = f"l{r - 1}"
        rounds.append(f"""
        m{r} AS (
          SELECT s.b AS dst, l.label, count(*) AS n
          FROM sym s JOIN {prev} l ON s.a = l.node GROUP BY 1, 2),
        w{r} AS (
          SELECT dst, label FROM (
            SELECT dst, label, row_number() OVER (
                     PARTITION BY dst
                     ORDER BY n DESC, label ASC) AS rn
            FROM m{r}) WHERE rn = 1),
        l{r} AS (
          SELECT p.node, coalesce(w{r}.label, p.label) AS label
          FROM {prev} p LEFT JOIN w{r} ON w{r}.dst = p.node)""")
    return f"""
        WITH d AS (
          SELECT doc_id % 10 AS g,
                 (doc_id // 10) % 2 * 10 AS blk, doc_id
          FROM documents),
        e0 AS (
          SELECT g + blk AS a, (g + 1) % 10 + blk AS b FROM d
          UNION ALL SELECT g + blk, (g + 2) % 10 + blk FROM d
          UNION ALL SELECT 0, 10 FROM documents WHERE doc_id % 97 = 0),
        e AS (SELECT a, b FROM e0 WHERE a != b),
        sym AS (
          SELECT DISTINCT a, b FROM (
            SELECT a, b FROM e UNION ALL SELECT b, a FROM e)),
        n0 AS (SELECT DISTINCT a AS node FROM sym),
        l0 AS (SELECT node, node AS label FROM n0),{','.join(rounds)}
        SELECT node, label AS community FROM l{iters} ORDER BY node
    """


def _benford_sql(column: str, table: str) -> str:
    from zoi_spark.tablechecks import _BENFORD

    vals = ", ".join(f"({d}, {p!r}::DOUBLE)"
                     for d, p in sorted(_BENFORD.items()))
    return f"""
        WITH vals AS (
          SELECT {column} AS v FROM {table}
          WHERE {column} IS NOT NULL AND {column} != 0),
        dig AS (
          SELECT substr(printf('%.9e', abs(v)), 1, 1)::INT AS digit
          FROM vals),
        counted AS (SELECT digit, count(*) AS n FROM dig GROUP BY 1),
        tot AS (SELECT sum(n) AS t FROM counted),
        bens AS (SELECT * FROM (VALUES {vals}) b(digit, benford_p))
        SELECT bens.digit,
               coalesce(n, 0)::BIGINT AS n,
               round(coalesce(n, 0) / t::DOUBLE, 6) AS observed_p,
               round(benford_p, 6) AS benford_p
        FROM bens LEFT JOIN counted USING (digit) CROSS JOIN tot
        ORDER BY bens.digit
    """


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled k-core peeling twin: per round a degree count, the
    ≥k survivor filter, and the two endpoint semi-joins — mirroring
    graph.kcore over the circulant-plus-pendant-chains seeded graph."""
    body = []
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        body.append(f"""
        d{r} AS (SELECT a, count(*) AS d FROM {prev} GROUP BY 1),
        k{r} AS (SELECT a FROM d{r} WHERE d >= {k}),
        s{r} AS (
          SELECT x.a, x.b FROM {prev} x
          JOIN k{r} ka ON x.a = ka.a
          JOIN k{r} kb ON x.b = kb.a)""")
    return f"""
        WITH g AS (SELECT doc_id % 12 AS g FROM documents),
        e0 AS (
          SELECT g AS s, (g + 1) % 12 AS d FROM g
          UNION ALL SELECT g, (g + 2) % 12 FROM g
          UNION ALL SELECT g, (g * 7 + 3) % 12 FROM g
          UNION ALL SELECT g, g + 100 FROM g
          UNION ALL SELECT g + 100, g + 200 FROM g),
        e AS (SELECT s, d FROM e0 WHERE s != d),
        s0 AS (
          SELECT DISTINCT a, b FROM (
            SELECT s AS a, d AS b FROM e
            UNION ALL SELECT d, s FROM e)),{','.join(body)}
        SELECT a AS node, count(*)::BIGINT AS degree
        FROM s{rounds} GROUP BY 1 ORDER BY node
    """


def _seed_bfs_sql(max_hops: int) -> str:
    """Unrolled multi-source BFS twin: per hop, frontier-adjacent nodes
    minus the reached set — mirroring graph.seed_distance over the
    30-ring with seeds {0, 15}."""
    body = []
    for h in range(1, max_hops + 1):
        prev = f"r{h - 1}"
        pf = f"f{h - 1}"
        body.append(f"""
        n{h} AS (
          SELECT DISTINCT b AS node FROM sym
          JOIN {pf} ON sym.a = {pf}.node
          WHERE b NOT IN (SELECT node FROM {prev})),
        r{h} AS (SELECT node, distance FROM {prev}
                 UNION ALL SELECT node, {h} FROM n{h}),
        f{h} AS (SELECT node FROM n{h})""")
    return f"""
        WITH g AS (SELECT DISTINCT doc_id % 30 AS g FROM documents),
        e AS (SELECT g AS s, (g + 1) % 30 AS d FROM g),
        sym AS (
          SELECT DISTINCT a, b FROM (
            SELECT s AS a, d AS b FROM e UNION ALL SELECT d, s FROM e)),
        r0 AS (SELECT * FROM (VALUES (0::BIGINT, 0), (15::BIGINT, 0))
               t(node, distance)),
        f0 AS (SELECT node FROM r0),{','.join(body)}
        SELECT node, distance FROM r{max_hops} ORDER BY node
    """


def _link_graph_sql() -> str:
    from zoi_spark.text import _HREF_RE

    pat = _HREF_RE.replace("'", "''")
    return f"""
        WITH seeded AS (
          SELECT doc_id,
                 text || CASE doc_id % 3
                   WHEN 0 THEN ' <a href="http://host'
                     || (doc_id % 30)::VARCHAR || '.example/p/'
                     || (doc_id % 30)::VARCHAR || '">x</a>'
                   WHEN 1 THEN ' <a HREF=''http://host'
                     || (doc_id % 30)::VARCHAR || '.example/p/'
                     || (doc_id % 30)::VARCHAR || '''>x</a>'
                   ELSE ' <a href=http://host'
                     || (doc_id % 30)::VARCHAR || '.example/p/'
                     || (doc_id % 30)::VARCHAR || '>x</a>'
                 END
                 || CASE WHEN doc_id % 4 = 1
                         THEN ' <a href="http://extra'
                           || (doc_id % 30)::VARCHAR
                           || '.example/q">y</a>'
                         ELSE '' END AS t
          FROM documents),
        matched AS (
          SELECT doc_id,
                 list_transform(
                   regexp_extract_all(t, '{pat}'),
                   m -> regexp_replace(
                          regexp_replace(m, '(?i)^href\\s*=\\s*', '',
                                         'g'),
                          '^["'']|["''>]+$', '', 'g')) AS links
          FROM seeded),
        ex AS (
          SELECT doc_id,
                 unnest(range(0, len(links))) AS link_idx,
                 unnest(links) AS href
          FROM matched)
        SELECT doc_id, link_idx, href FROM ex
        WHERE href != '' ORDER BY doc_id, link_idx
    """


def _ivf_train_ctes(n_centroids: int, dim: int, round_to: int) -> str:
    """Shared CTE chain for one Lloyd step: md5-rank seed centroids →
    9-dec-rounded argmax assignment (a0) → per-component means →
    spherical normalization rounded to the refine_centroids grid →
    ``refined(i, cv)`` (emptied/zero-mean clusters keep the seed)."""
    mean_terms = ", ".join(f"avg(v[{i + 1}])" for i in range(dim))
    return f"""c AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents AS (
          SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1
                   AS i, v AS cv
          FROM c QUALIFY i < {n_centroids}),
        a0 AS (
          SELECT vec_id, v, i AS cent FROM (
            SELECT c.vec_id, c.v, ct.i,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY round(list_dot_product(c.v, ct.cv), 9) DESC,
                              ct.i ASC) AS rn
            FROM c, cents ct)
          WHERE rn = 1),
        means AS (
          SELECT cent, [{mean_terms}] AS m
          FROM a0 GROUP BY cent),
        normed AS (
          -- spherical update: L2-normalize the mean, THEN round to the
          -- shared grid (refine_centroids does the same driver-side)
          SELECT cent,
                 list_transform(m, x -> round(
                   x / sqrt(list_dot_product(m, m)), {round_to})) AS cv
          FROM means WHERE list_dot_product(m, m) > 0),
        refined AS (
          SELECT ct.i, coalesce(n.cv, ct.cv) AS cv
          FROM cents ct LEFT JOIN normed n ON n.cent = ct.i)"""


def _ivf_train_sql(n_centroids: int = 8, dim: int = 64,
                   round_to: int = 6) -> str:
    """Membership counts before/after one Lloyd step (the twin of
    q_ivf_train_step)."""
    return f"""
        WITH {_ivf_train_ctes(n_centroids, dim, round_to)},
        a1 AS (
          SELECT vec_id, i AS cent FROM (
            SELECT c.vec_id, r.i,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY round(list_dot_product(c.v, r.cv), 9) DESC,
                              r.i ASC) AS rn
            FROM c, refined r)
          WHERE rn = 1),
        nb AS (SELECT cent, count(*) AS n FROM a0 GROUP BY 1),
        na AS (SELECT cent, count(*) AS n FROM a1 GROUP BY 1)
        SELECT t.i::INTEGER AS cent,
               coalesce(nb.n, 0)::BIGINT AS n_before,
               coalesce(na.n, 0)::BIGINT AS n_after
        FROM (SELECT unnest(range({n_centroids})) AS i) t
        LEFT JOIN nb ON nb.cent = t.i
        LEFT JOIN na ON na.cent = t.i
    """


def _ivf_trained_topk_sql(k: int = 5, n_centroids: int = 8, nprobe: int = 4,
                          dim: int = 64, round_to: int = 6) -> str:
    """Trained-IVF top-k: the full Lloyd-step chain, then list
    assignment + probes + ranking against the REFINED centroids (probe
    ties i DESC mirroring top_centroids' reverse sort; assignment ties
    i ASC mirroring nearest_centroid)."""
    return f"""
        WITH {_ivf_train_ctes(n_centroids, dim, round_to)},
        corp AS (
          SELECT vec_id, v, i AS cent FROM (
            SELECT c.vec_id, c.v, r.i,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY round(list_dot_product(c.v, r.cv), 9) DESC,
                              r.i ASC) AS rn
            FROM c, refined r)
          WHERE rn = 1),
        probes AS (
          SELECT query_id, qv, i AS cent FROM (
            SELECT q.vec_id AS query_id, q.v AS qv, r.i,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY round(list_dot_product(q.v, r.cv), 9) DESC,
                              r.i DESC) AS rn
            FROM (SELECT vec_id, v FROM c WHERE vec_id < 3) q, refined r)
          WHERE rn <= {nprobe}),
        scored AS (
          SELECT p.query_id, corp.vec_id,
                 round(list_cosine_similarity(corp.v, p.qv), 6) AS cosine
          FROM corp JOIN probes p
            ON corp.cent = p.cent AND corp.vec_id != p.query_id),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id ASC) AS rank
          FROM scored)
        SELECT query_id, vec_id, cosine, rank::BIGINT AS rank
        FROM ranked WHERE rank <= {k}
    """


def _pagerank_sql(iters: int) -> str:
    """DuckDB twin of q_host_pagerank: the SAME deterministic host
    graph (src = doc_id%40 for doc_id%40 < 35; dsts = (7d+11)%40 and
    (13d+5)%40) and the SAME update rule as graph.pagerank — teleport
    (1-d)/N + d·(weighted in-contributions + uniform dangling share) —
    unrolled as one CTE trio (dangling mass, contributions, new ranks)
    per power-iteration round."""
    ctes = ["""e0 AS (
              SELECT doc_id % 40 AS src, (doc_id * 7 + 11) % 40 AS dst
              FROM documents WHERE doc_id % 40 < 35
              UNION ALL
              SELECT doc_id % 40, (doc_id * 13 + 5) % 40
              FROM documents WHERE doc_id % 40 < 35),
            e AS (SELECT src, dst, count(*)::DOUBLE AS w
                  FROM e0 GROUP BY src, dst),
            nodes AS (SELECT src AS node FROM e
                      UNION SELECT dst FROM e),
            nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
            ow AS (SELECT src AS node, sum(w) AS out_w
                   FROM e GROUP BY src),
            base AS (SELECT nodes.node, ow.out_w
                     FROM nodes LEFT JOIN ow USING (node)),
            r0 AS (SELECT node, (SELECT 1.0 / n FROM nn) AS rank, out_w
                   FROM base)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""d{i} AS (
              SELECT coalesce(sum(CASE WHEN out_w IS NULL
                                       THEN rank END), 0.0) AS dm
              FROM r{i - 1}),
            c{i} AS (
              SELECT e.dst AS node, sum(r.rank * e.w / r.out_w) AS contrib
              FROM e JOIN r{i - 1} r ON e.src = r.node
              GROUP BY e.dst),
            r{i} AS (
              SELECT b.node,
                     (SELECT 0.15::DOUBLE / n FROM nn)
                     + 0.85::DOUBLE
                       * (coalesce(c.contrib, 0.0)
                          + (SELECT dm FROM d{i}) / (SELECT n FROM nn))
                       AS rank,
                     b.out_w
              FROM base b LEFT JOIN c{i} c USING (node))""")
    return ("WITH " + ",\n            ".join(ctes)
            + f"""
            SELECT node AS host, round(rank, 6) AS pagerank
            FROM r{iters} ORDER BY host""")


def _textrank_sql(iters: int) -> str:
    """DuckDB twin of q_textrank_keywords: the SAME content-word
    co-occurrence edges (adjacent normalized tokens, non-alphabetic /
    stopword / self pairs dropped, both directions, count-weighted)
    and the SAME pagerank recursion as _pagerank_sql, unrolled one
    CTE trio per round; top-25 by (rank desc, word)."""
    sw_list = ", ".join(f"'{w}'" for w in text.RAKE_STOPWORDS)
    ctes = [f"""toks AS (
              SELECT string_split({_NORM_SQL}, ' ') AS t
              FROM documents WHERE text IS NOT NULL),
            e0 AS (
              SELECT t[i] AS a, t[i + 1] AS b
              FROM (SELECT t, unnest(range(1, len(t))) AS i
                    FROM toks WHERE len(t) >= 2)),
            ef AS (
              SELECT a, b FROM e0
              WHERE a <> b
                AND regexp_matches(a, '^[a-z]+$')
                AND regexp_matches(b, '^[a-z]+$')
                AND a NOT IN ({sw_list})
                AND b NOT IN ({sw_list})),
            eb AS (SELECT a, b FROM ef
                   UNION ALL SELECT b, a FROM ef),
            e AS (SELECT a AS src, b AS dst, count(*)::DOUBLE AS w
                  FROM eb GROUP BY 1, 2),
            nodes AS (SELECT src AS node FROM e
                      UNION SELECT dst FROM e),
            nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
            ow AS (SELECT src AS node, sum(w) AS out_w
                   FROM e GROUP BY src),
            base AS (SELECT nodes.node, ow.out_w
                     FROM nodes LEFT JOIN ow USING (node)),
            r0 AS (SELECT node, (SELECT 1.0 / n FROM nn) AS rank,
                          out_w
                   FROM base)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""d{i} AS (
              SELECT coalesce(sum(CASE WHEN out_w IS NULL
                                       THEN rank END), 0.0) AS dm
              FROM r{i - 1}),
            c{i} AS (
              SELECT e.dst AS node, sum(r.rank * e.w / r.out_w) AS contrib
              FROM e JOIN r{i - 1} r ON e.src = r.node
              GROUP BY e.dst),
            r{i} AS (
              SELECT b.node,
                     (SELECT 0.15::DOUBLE / n FROM nn)
                     + 0.85::DOUBLE
                       * (coalesce(c.contrib, 0.0)
                          + (SELECT dm FROM d{i}) / (SELECT n FROM nn))
                       AS rank,
                     b.out_w
              FROM base b LEFT JOIN c{i} c USING (node))""")
    return ("WITH " + ",\n            ".join(ctes)
            + f"""
            SELECT node AS word, round(rank, 8) AS rank
            FROM r{iters} ORDER BY rank DESC, word LIMIT 25""")


def _ljung_box_sql(max_lag: int) -> str:
    """DuckDB twin of q_ljung_box_volume: same daily series, one lag
    branch per k, same accumulated Q over the unioned lag rows."""
    branches = []
    for k in range(1, max_lag + 1):
        branches.append(f"""
            SELECT {k} AS lag, sum(e * el) / sum(e * e) AS r
            FROM (SELECT e, lag(e, {k}) OVER (ORDER BY t) AS el
                  FROM c)""")
    return ("""
            WITH daily AS (
              SELECT (CAST(ts AS DATE) - DATE '1970-01-01')::DOUBLE
                       AS t,
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1),
            m AS (SELECT avg(x) AS mu, count(*)::DOUBLE AS n
                  FROM daily),
            c AS (SELECT t, x - (SELECT mu FROM m) AS e FROM daily),
            acf AS ("""
            + " UNION ALL ".join(branches)
            + """)
            SELECT lag, round(r, 6) AS r,
                   round((SELECT n FROM m) * ((SELECT n FROM m) + 2)
                         * sum(r * r / ((SELECT n FROM m) - lag))
                           OVER (ORDER BY lag
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW), 6) AS q_cum
            FROM acf ORDER BY lag""")


def _xcorr_sql(max_lag: int) -> str:
    """DuckDB twin of q_volume_xcorr: same daily (views, purchases)
    series, one lead/lag window branch per lag, sample Pearson corr
    on both engines."""
    branches = []
    for k in range(-max_lag, max_lag + 1):
        fn = "lead" if k >= 0 else "lag"
        branches.append(f"""
            SELECT {k} AS lag, count(*)::BIGINT AS n_pairs,
                   round(corr(x, ys), 6) AS r
            FROM (SELECT x, {fn}(y, {abs(k)}) OVER (ORDER BY t)
                    AS ys FROM daily)
            WHERE ys IS NOT NULL AND x IS NOT NULL""")
    return ("""
            WITH daily AS (
              SELECT CAST(ts AS DATE) AS t,
                     sum(CASE WHEN event_type = 'view'
                         THEN 1 ELSE 0 END)::DOUBLE AS x,
                     sum(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END)::DOUBLE AS y
              FROM events WHERE ts IS NOT NULL GROUP BY 1)
            SELECT * FROM ("""
            + " UNION ALL ".join(branches)
            + ") ORDER BY lag")


def _trustrank_sql(iters: int) -> str:
    """DuckDB twin of q_trust_rank_hosts: the SAME 40-host graph as
    _pagerank_sql and the SAME TrustRank recursion as graph.trust_rank
    — teleport (1-d)·s + d·(in-contributions + dm·s) with s uniform on
    seeds {0,1,2} — unrolled one CTE trio per round from r0 = s."""
    ctes = ["""e0 AS (
              SELECT doc_id % 40 AS src, (doc_id * 7 + 11) % 40 AS dst
              FROM documents WHERE doc_id % 40 < 35
              UNION ALL
              SELECT doc_id % 40, (doc_id * 13 + 5) % 40
              FROM documents WHERE doc_id % 40 < 35),
            e AS (SELECT src, dst, count(*)::DOUBLE AS w
                  FROM e0 GROUP BY src, dst),
            nodes AS (SELECT src AS node FROM e
                      UNION SELECT dst FROM e),
            ow AS (SELECT src AS node, sum(w) AS out_w
                   FROM e GROUP BY src),
            ns AS (SELECT count(*)::DOUBLE AS k FROM nodes
                   WHERE node IN (0, 1, 2)),
            base AS (SELECT nodes.node, ow.out_w,
                            CASE WHEN nodes.node IN (0, 1, 2)
                                 THEN 1.0 / (SELECT k FROM ns)
                                 ELSE 0.0 END AS s
                     FROM nodes LEFT JOIN ow USING (node)),
            r0 AS (SELECT node, s AS rank, out_w, s FROM base)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""d{i} AS (
              SELECT coalesce(sum(CASE WHEN out_w IS NULL
                                       THEN rank END), 0.0) AS dm
              FROM r{i - 1}),
            c{i} AS (
              SELECT e.dst AS node, sum(r.rank * e.w / r.out_w) AS contrib
              FROM e JOIN r{i - 1} r ON e.src = r.node
              WHERE r.out_w IS NOT NULL
              GROUP BY e.dst),
            r{i} AS (
              SELECT b.node,
                     0.15::DOUBLE * b.s
                     + 0.85::DOUBLE
                       * (coalesce(c.contrib, 0.0)
                          + (SELECT dm FROM d{i}) * b.s) AS rank,
                     b.out_w, b.s
              FROM base b LEFT JOIN c{i} c USING (node))""")
    return ("WITH " + ",\n            ".join(ctes)
            + f"""
            SELECT node AS host, round(rank, 6) AS trust
            FROM r{iters} ORDER BY host""")


def _hits_sql(iters: int) -> str:
    """DuckDB twin of q_host_hits: the SAME deterministic host graph
    (src = doc_id%37 for doc_id%37 < 33; dsts = (11d+3)%37 and
    (5d+17)%37) and the SAME max-normalized HITS recursion as
    graph.hits, unrolled one CTE quartet (authority raw/max, hub
    raw/max) per round from hub ≡ 1. Every CTE is MATERIALIZED
    (Postgres-style hint DuckDB honors): each level references the
    previous one up to four times, so inlined evaluation is
    O(4^iters) re-computation of the whole chain — materialization
    makes it linear, with no change to the values."""
    ctes = ["""e0 AS MATERIALIZED (
              SELECT doc_id % 37 AS src, (doc_id * 11 + 3) % 37 AS dst
              FROM documents WHERE doc_id % 37 < 33
              UNION ALL
              SELECT doc_id % 37, (doc_id * 5 + 17) % 37
              FROM documents WHERE doc_id % 37 < 33),
            e AS MATERIALIZED (SELECT src, dst, count(*)::DOUBLE AS w
                  FROM e0 GROUP BY src, dst),
            nodes AS MATERIALIZED (SELECT src AS node FROM e
                      UNION SELECT dst FROM e),
            h0 AS MATERIALIZED (SELECT node, 1.0::DOUBLE AS hub FROM nodes)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""ar{i} AS MATERIALIZED (
              SELECT e.dst AS node, sum(h.hub * e.w) AS v
              FROM e JOIN h{i - 1} h ON e.src = h.node
              GROUP BY e.dst),
            a{i} AS MATERIALIZED (
              SELECT n.node,
                     coalesce(r.v / (SELECT max(v) FROM ar{i}), 0.0)
                       AS auth
              FROM nodes n LEFT JOIN ar{i} r USING (node)),
            hr{i} AS MATERIALIZED (
              SELECT e.src AS node, sum(a.auth * e.w) AS v
              FROM e JOIN a{i} a ON e.dst = a.node
              GROUP BY e.src),
            h{i} AS MATERIALIZED (
              SELECT n.node,
                     coalesce(r.v / (SELECT max(v) FROM hr{i}), 0.0)
                       AS hub
              FROM nodes n LEFT JOIN hr{i} r USING (node))""")
    return ("WITH " + ",\n            ".join(ctes)
            + f"""
            SELECT h.node AS host, round(h.hub, 6) AS hub,
                   round(a.auth, 6) AS authority
            FROM h{iters} h JOIN a{iters} a USING (node)
            ORDER BY host""")


def _rake_sql() -> str:
    """DuckDB twin of q_raking_weights: the SAME target shares
    (interpolated from _RAKE_ROW_T/_RAKE_COL_T — one source of truth)
    and the SAME two full IPF passes, unrolled as four window-sum
    scaling stages over the identical (lang, source) cell frame."""
    rc = " ".join(f"WHEN '{k}' THEN {v}"
                  for k, v in _RAKE_ROW_T.items())
    cc = " ".join(f"WHEN '{k}' THEN {v}"
                  for k, v in _RAKE_COL_T.items())
    stage = ("SELECT row_val, col_val, n, tr, tc, "
             "{w} * {t} / (sum(n * {w}) OVER (PARTITION BY {p}) "
             "/ sum(n * {w}) OVER ()) AS {o} FROM {src}")
    s1 = stage.format(w="w", t="tr", p="row_val", o="w1", src="cells")
    s2 = stage.format(w="w1", t="tc", p="col_val", o="w2", src="s1")
    s3 = stage.format(w="w2", t="tr", p="row_val", o="w3", src="s2")
    s4 = stage.format(w="w3", t="tc", p="col_val", o="w4", src="s3")
    return f"""
        WITH cells AS (
          SELECT lang AS row_val, source AS col_val,
                 count(*)::BIGINT AS n,
                 CASE lang {rc} END AS tr,
                 CASE source {cc} END AS tc,
                 1.0 AS w
          FROM documents GROUP BY 1, 2),
        s1 AS ({s1}), s2 AS ({s2}), s3 AS ({s3}), s4 AS ({s4})
        SELECT row_val, col_val, n, round(w4, 6) AS weight FROM s4
    """


def _numeric_corr_sql() -> str:
    """DuckDB twin of q_numeric_corr: the SAME pairs (interpolated from
    _CORR_COLS) and the SAME double rounding — corr at 6, covariance at
    6 then 2 (mirroring the Spark side's round(round(., 6), 2))."""
    cols = _CORR_COLS
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    sels = [f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
                       round(corr({a}, {b}), 6) AS corr,
                       round(round(covar_samp({a}, {b}), 6), 2) AS covar
                FROM lineitem""" for a, b in pairs]
    body = "\n                UNION ALL\n                ".join(sels)
    return (f"SELECT * FROM ({body})\n"
            f"                ORDER BY col_a, col_b")


def _mojibake_sql() -> str:
    """DuckDB twin of q_mojibake_scan: the SAME seeded corruption
    (appended ' Ã©' repeats, U+FFFD, leading BOM — successive CTEs
    mirror the Spark when-chain nesting order) and the SAME
    replace-and-measure counts, marker literals interpolated from
    text.MOJIBAKE_MARKERS (single source of truth)."""
    cnt = {n: f"((length(text) - length(replace(text, '{m}', '')))"
              f" // {len(m)})"
           for n, m in text.MOJIBAKE_MARKERS.items()}
    total = " + ".join(cnt.values())
    count_sel = ",\n                 ".join(
        f"{cnt[n]}::BIGINT AS n_{n}" for n in text.MOJIBAKE_MARKERS)
    return f"""
        WITH s1 AS (
          SELECT doc_id, lang,
                 CASE WHEN doc_id % 7 = 2
                      THEN text || repeat(' Ã©', (doc_id % 5 + 1)::INT)
                      ELSE text END AS text
          FROM documents),
        s2 AS (
          SELECT doc_id, lang,
                 CASE WHEN doc_id % 11 = 3 THEN text || ' �'
                      ELSE text END AS text
          FROM s1),
        s3 AS (
          SELECT doc_id, lang,
                 CASE WHEN doc_id % 13 = 4 THEN '﻿' || text
                      ELSE text END AS text
          FROM s2),
        m AS (
          SELECT doc_id, lang,
                 {count_sel},
                 ({total})::BIGINT AS mojibake_chars,
                 CASE WHEN length(text) > 0
                      THEN round(({total})::DOUBLE / length(text), 6)
                 END AS mojibake_ratio
          FROM s3),
        f AS (
          SELECT *, coalesce(mojibake_ratio > 0.004, false)
                      AS mojibake_flagged
          FROM m)
        SELECT lang, mojibake_flagged, count(*)::BIGINT AS n_docs,
               sum(mojibake_chars)::BIGINT AS artifact_chars,
               sum(n_utf8_latin1)::BIGINT AS utf8_latin1_hits,
               sum(n_replacement)::BIGINT AS replacement_hits,
               sum(n_stray_bom)::BIGINT AS bom_hits,
               round(avg(mojibake_ratio), 6) AS avg_ratio
        FROM f GROUP BY lang, mojibake_flagged
        ORDER BY lang, mojibake_flagged
    """


def _script_mix_sql() -> str:
    """DuckDB twin of q_script_mix: the SAME seeded script samples
    (_SCRIPT_SAMPLES) and the SAME codepoint ranges (interpolated from
    text.SCRIPT_RANGES — single source of truth), counts by
    regexp_replace deletion, dominant script = declaration-order-first
    maximal count, per-doc rounded latin fraction averaged per group."""
    ranges = text.SCRIPT_RANGES
    cnt = {n: f"(length(text) - length(regexp_replace(text, '[{r}]', "
              f"'', 'g')))" for n, r in ranges.items()}
    total = " + ".join(cnt.values())
    best = "greatest(" + ", ".join(f"n_{n}" for n in ranges) + ")"
    dom = "CASE " + " ".join(
        f"WHEN n_{n} = __best THEN '{n}'" for n in ranges) + " END"
    case = " ".join(f"WHEN {k} THEN '{s}'"
                    for k, s in _SCRIPT_SAMPLES.items())
    count_sel = ",\n                     ".join(
        f"{cnt[n]} AS n_{n}" for n in ranges)
    return f"""
        WITH seeded AS (
          SELECT doc_id, lang,
                 CASE doc_id % 5 {case} ELSE text END AS text
          FROM documents),
        counts AS (
          SELECT doc_id, lang,
                     {count_sel},
                 ({total}) AS script_chars
          FROM seeded),
        prof AS (
          SELECT *, {best} AS __best FROM counts),
        dom AS (
          SELECT doc_id, lang, n_cyrillic, n_cjk,
                 CASE WHEN __best > 0 THEN {dom} END AS dominant_script,
                 CASE WHEN script_chars > 0
                      THEN round(n_latin::DOUBLE / script_chars, 6)
                 END AS latin_fraction
          FROM prof)
        SELECT lang, dominant_script, count(*)::BIGINT AS n_docs,
               sum(n_cyrillic)::BIGINT AS cyrillic_chars,
               sum(n_cjk)::BIGINT AS cjk_chars,
               round(avg(latin_fraction), 6) AS avg_latin_frac
        FROM dom GROUP BY lang, dominant_script
        ORDER BY lang, dominant_script
    """


def _corpus_split_sql() -> str:
    """DuckDB twin of q_corpus_split: same md5 fraction, same split
    names, boundary literals interpolated from
    sampling.split_boundaries (bit-identical Python float arithmetic —
    0.8 + 0.1 is 0.9000000000000001 in doubles, and a hand-written
    0.9 here would disagree on fractions inside the ulp gap)."""
    from zoi_spark import sampling

    names = list(_SPLIT_WEIGHTS)
    bounds = sampling.split_boundaries(_SPLIT_WEIGHTS)
    case = "CASE " + " ".join(
        f"WHEN f < {b!r} THEN '{n}'" for n, b in zip(names, bounds)
    ) + f" ELSE '{names[-1]}' END"
    return f"""
        WITH s AS (
          SELECT lang,
                 (('0x' || substr(md5('split:' || doc_id), 1, 8))
                  ::UBIGINT)::DOUBLE / 4294967296.0 AS f
          FROM documents)
        SELECT {case} AS split, lang, count(*)::BIGINT AS n_docs
        FROM s GROUP BY split, lang ORDER BY split, lang
    """


def _split_leakage_sql() -> str:
    """DuckDB twin of q_split_leakage_docs: the corpus_split fraction
    and boundary literals (see _corpus_split_sql), grouped by the
    content fingerprint instead of (split, lang)."""
    from zoi_spark import sampling

    names = list(_SPLIT_WEIGHTS)
    bounds = sampling.split_boundaries(_SPLIT_WEIGHTS)
    case = "CASE " + " ".join(
        f"WHEN f < {b!r} THEN '{n}'" for n, b in zip(names, bounds)
    ) + f" ELSE '{names[-1]}' END"
    return f"""
        WITH seeded AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 500000 AS doc_id, text FROM documents
          WHERE doc_id % 25 = 0),
        s AS (
          SELECT md5({_NORM_SQL}) AS fp,
                 (('0x' || substr(md5('split:' || doc_id), 1, 8))
                  ::UBIGINT)::DOUBLE / 4294967296.0 AS f
          FROM seeded),
        g AS (
          SELECT fp, count(*) AS n, count(DISTINCT {case}) AS k
          FROM s WHERE fp IS NOT NULL GROUP BY fp)
        SELECT count(*)::BIGINT AS n_fp_groups,
               sum((n > 1)::INT)::BIGINT AS n_dup_groups,
               sum((k > 1)::INT)::BIGINT AS n_cross_split_groups,
               sum(CASE WHEN k > 1 THEN n ELSE 0 END)::BIGINT
                 AS n_docs_cross_split,
               round(sum(CASE WHEN k > 1 THEN n ELSE 0 END) / sum(n),
                     6) AS leak_share
        FROM g
    """


def _suggest_rules_sql() -> str:
    """DuckDB twin of infer.suggest_rules over documents: one
    aggregate CTE, then UNION ALL verdict selects gated by the same
    conditions (tightest-ladder regex via CASE, one_of via exact
    distinct ≤ 20)."""
    ladder = ["^[0-9]+$", "^[a-z]+$", "^[A-Za-z]+$", "^[A-Za-z0-9_-]+$"]
    num_cols = ["doc_id", "n_chars"]
    str_cols = ["text", "lang", "source"]
    aggs, picks = [], []
    for c in num_cols:
        aggs.append(f"sum(({c} IS NULL)::INT) AS n_{c}")
        aggs.append(f"min({c})::DOUBLE AS mn_{c}")
        aggs.append(f"max({c})::DOUBLE AS mx_{c}")
        picks.append(f"""
          SELECT '{c}' AS "column", 'required' AS rule,
                 NULL::DOUBLE AS param_num, NULL::VARCHAR AS param_str
          FROM a WHERE n_{c} = 0
          UNION ALL SELECT '{c}', 'nullable', NULL, NULL FROM a
            WHERE n_{c} > 0
          UNION ALL SELECT '{c}', 'gte', mn_{c}, NULL FROM a
            WHERE mn_{c} IS NOT NULL
          UNION ALL SELECT '{c}', 'lte', mx_{c}, NULL FROM a
            WHERE mx_{c} IS NOT NULL""")
    for c in str_cols:
        aggs.append(f"sum(({c} IS NULL)::INT) AS n_{c}")
        aggs.append(f"min(length({c}))::DOUBLE AS lmn_{c}")
        aggs.append(f"max(length({c}))::DOUBLE AS lmx_{c}")
        for j, p in enumerate(ladder):
            aggs.append(
                f"avg(CASE WHEN {c} IS NULL THEN NULL WHEN "
                f"regexp_matches({c}, '{p}') THEN 1.0 ELSE 0.0 END) "
                f"AS s{j}_{c}")
        aggs.append(f"count(DISTINCT {c}) AS nd_{c}")
        aggs.append(f"array_to_string(list_sort(list(DISTINCT {c})), "
                    f"',') AS v_{c}")
        case = " ".join(f"WHEN s{j}_{c} = 1.0 THEN '{p}'"
                        for j, p in enumerate(ladder))
        picks.append(f"""
          SELECT '{c}', 'required', NULL, NULL FROM a WHERE n_{c} = 0
          UNION ALL SELECT '{c}', 'nullable', NULL, NULL FROM a
            WHERE n_{c} > 0
          UNION ALL SELECT '{c}', 'min_length', lmn_{c}, NULL FROM a
            WHERE lmn_{c} IS NOT NULL
          UNION ALL SELECT '{c}', 'max_length', lmx_{c}, NULL FROM a
            WHERE lmx_{c} IS NOT NULL
          UNION ALL SELECT '{c}', 'regex', NULL,
            CASE {case} END FROM a
            WHERE (CASE {case} END) IS NOT NULL
          UNION ALL SELECT '{c}', 'one_of', NULL, v_{c} FROM a
            WHERE nd_{c} > 0 AND nd_{c} <= 20""")
    body = "\n          UNION ALL".join(picks)
    return f"""
        WITH a AS (SELECT {', '.join(aggs)} FROM documents)
        {body}
    """


def _sprt_sql(p0: float = 0.05, p1: float = 0.2,
              alpha: float = 0.05, beta: float = 0.05) -> str:
    """DuckDB twin of q_sprt_langs: the same constants are folded in
    Python (repr keeps all 17 significant digits) so both engines
    multiply identical doubles."""
    import math as _m

    lr_f, lr_p = _m.log(p1 / p0), _m.log((1 - p1) / (1 - p0))
    upper = _m.log((1 - beta) / alpha)
    lower = _m.log(beta / (1 - alpha))
    return f"""
        WITH g AS (
          SELECT lang, count(*)::BIGINT AS n,
                 sum((length(text) < 100)::INT)::BIGINT AS k
          FROM documents WHERE text IS NOT NULL
          GROUP BY lang),
        l AS (SELECT lang, n, k,
                     k * {lr_f!r}::DOUBLE
                       + (n - k) * {lr_p!r}::DOUBLE AS llr
              FROM g)
        SELECT lang, n, k, round(llr, 6) AS llr,
               CASE WHEN llr >= {upper!r}::DOUBLE THEN 'alert'
                    WHEN llr <= {lower!r}::DOUBLE THEN 'ok'
                    ELSE 'continue' END AS decision
        FROM l
    """


def _columns_psi_sql(epsilon: float = 1e-9) -> str:
    """DuckDB twin of q_columns_psi: both unpivots, the vocabulary
    outer join and the max(share, eps) smoothing of
    tablechecks.multi_column_psi."""
    unpivot = """
          SELECT 'lang' AS c, coalesce(lang, '∅') AS v FROM {src}
          UNION ALL
          SELECT 'source', coalesce(source, '∅') FROM {src}"""
    cur_src = "(SELECT * FROM documents WHERE lang <> 'zh')"
    return f"""
        WITH cur AS (SELECT c, v, count(*)::DOUBLE AS cnt FROM (
                       {unpivot.format(src=cur_src)}) GROUP BY c, v),
        base AS (SELECT c, v, count(*)::DOUBLE AS cnt FROM (
                   {unpivot.format(src='documents')}) GROUP BY c, v),
        j AS (
          SELECT coalesce(cur.c, base.c) AS c,
                 coalesce(cur.v, base.v) AS v,
                 coalesce(cur.cnt, 0.0) AS c_cur,
                 coalesce(base.cnt, 0.0) AS c_base
          FROM cur FULL OUTER JOIN base
            ON cur.c = base.c AND cur.v = base.v),
        t AS (
          SELECT c, v, c_cur, c_base,
                 greatest(c_cur / greatest(sum(c_cur) OVER
                            (PARTITION BY c), 1.0), {epsilon!r}) AS q,
                 greatest(c_base / greatest(sum(c_base) OVER
                            (PARTITION BY c), 1.0), {epsilon!r}) AS p
          FROM j)
        SELECT c AS "column", count(*)::BIGINT AS n_values,
               round(sum((q - p) * ln(q / p)), 6) AS psi
        FROM t GROUP BY c
    """


def _zorder_sql(bits: int = 8) -> str:
    """DuckDB twin of q_zorder_keys: same min-max stats (recomputed in
    a CTE), same clamp, same interleave — one shift-and-or term per
    (column, bit)."""
    cols = ["doc_id", "n_chars"]
    top = (1 << bits) - 1
    terms = []
    for ci, c in enumerate(cols):
        v = (f"least(greatest(coalesce(floor((({c}::DOUBLE) - mn_{c}) "
             f"/ (mx_{c} - mn_{c}) * {top + 1}), 0), 0), {top})::BIGINT")
        for b in range(bits):
            terms.append(f"((({v} >> {b}) & 1) "
                         f"<< {b * len(cols) + ci})")
    key = "\n                 + ".join(terms)
    stats = ", ".join(
        f"min({c}::DOUBLE) AS mn_{c}, max({c}::DOUBLE) AS mx_{c}"
        for c in cols)
    return f"""
        WITH s AS (SELECT {stats} FROM documents)
        SELECT doc_id, n_chars,
               ({key})::BIGINT AS zorder_key
        FROM documents, s
    """


def _repair_sql() -> str:
    """DuckDB twin of q_repair_suggestions: Levenshtein argmin via a
    candidate cross join + row_number, numeric clamps, truncation."""
    return """
        WITH cand(v) AS (VALUES ('de'), ('en'), ('es'), ('fr')),
        enumfix AS (
          SELECT doc_id, lang, v,
                 row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY levenshtein(lang, v), v) AS rn
          FROM documents CROSS JOIN cand
          WHERE lang IS NOT NULL
            AND lang NOT IN ('de', 'en', 'es', 'fr'))
        SELECT doc_id, 'lang.one_of' AS rule_id, lang AS current,
               v AS suggestion
        FROM enumfix WHERE rn = 1
        UNION ALL
        SELECT doc_id, 'n_chars.gte', n_chars::VARCHAR, '50'
        FROM documents WHERE n_chars IS NOT NULL AND n_chars < 50
        UNION ALL
        SELECT doc_id, 'n_chars.lte', n_chars::VARCHAR, '400'
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 400
        UNION ALL
        SELECT doc_id, 'text.lte', text, substr(text, 1, 520)
        FROM documents WHERE text IS NOT NULL AND length(text) > 520
    """


def _fk_sweep_sql() -> str:
    """DuckDB twin of q_fk_sweep: per edge, non-NULL key count and
    NOT IN orphan count."""
    edges = [
        ("customer->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("orders->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("supplier->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]
    branches = []
    for name, child, ck, parent, pk in edges:
        branches.append(f"""
          SELECT '{name}' AS edge,
                 count(*)::BIGINT AS n_rows,
                 sum(({ck} NOT IN (SELECT {pk} FROM {parent}
                                   WHERE {pk} IS NOT NULL))::INT)
                   ::BIGINT AS n_orphans
          FROM {child} WHERE {ck} IS NOT NULL""")
    u = "\n          UNION ALL".join(branches)
    return f"""
        SELECT edge, n_rows, n_orphans, n_orphans = 0 AS ok FROM (
          {u})
    """


def _sampler_gof_sql(rate: float = 0.2, salt: str = "gof") -> str:
    """DuckDB twin of q_sampler_gof: the sampler's own md5-threshold
    predicate (single source of truth: sampling._rate_threshold) and
    the binomial statistics."""
    from zoi_spark.sampling import _rate_threshold

    thr = _rate_threshold(rate)
    return f"""
        WITH g AS (
          SELECT lang AS stratum, count(*)::BIGINT AS n,
                 sum((substr(md5('{salt}' || doc_id), 1, 8)
                      < '{thr}')::INT)::BIGINT AS kept
          FROM documents GROUP BY lang)
        SELECT stratum, n, kept,
               round(n * {rate!r}::DOUBLE, 6) AS expected,
               round((kept - n * {rate!r}::DOUBLE)
                     / sqrt(n * {rate!r}::DOUBLE
                            * (1.0 - {rate!r}::DOUBLE)), 6) AS z,
               round((kept - n * {rate!r}::DOUBLE)
                     * (kept - n * {rate!r}::DOUBLE)
                     / (n * {rate!r}::DOUBLE), 6) AS chi2_term
        FROM g
    """


def _contract_sql() -> str:
    """DuckDB twin of q_contract_verdicts: flagship check rules + the
    5 required rules as the violation union, the 13-rule catalog as
    VALUES (zero-violation rules pass), the 3-expectation battery and
    the zh-less referential dictionary."""
    fields = ["doc_id", "text", "lang", "source", "n_chars"]
    req_branches = "\n              UNION ALL ".join(
        f"SELECT doc_id, '{f}.required' AS rule_id FROM documents "
        f"WHERE {f} IS NULL" for f in fields)
    cat = ", ".join(
        f"('{r}')" for r in
        ["doc_id.gte", "doc_id.required", "text.gte", "text.lte",
         "text.required", "lang.gte", "lang.lte", "lang.one_of",
         "lang.required", "source.starts_with", "source.required",
         "n_chars.gte", "n_chars.required"])
    return f"""
        WITH viol AS (
          SELECT * FROM ({_FLAGSHIP_SQL})
          UNION ALL {req_branches}),
        vc AS (SELECT rule_id, count(*)::DOUBLE AS n FROM viol
               GROUP BY rule_id),
        cat(rule_id) AS (VALUES {cat}),
        schema_rows AS (
          SELECT 'schema:' || cat.rule_id AS "check",
                 'schema' AS kind,
                 coalesce(n, 0.0) AS metric,
                 coalesce(n, 0.0) = 0.0 AS passed
          FROM cat LEFT JOIN vc USING (rule_id)),
        a AS (SELECT count(*)::DOUBLE AS c_rows,
                     avg((lang IS NULL)::INT)::DOUBLE AS ns_lang,
                     avg(n_chars) AS m_nc
              FROM documents),
        expect_rows AS (
          SELECT 'expect:rows' AS "check", 'row_count' AS kind,
                 round(c_rows, 6) AS metric,
                 coalesce(c_rows >= 1.0, false) AS passed FROM a
          UNION ALL
          SELECT 'expect:lang_nulls', 'null_share', round(ns_lang, 6),
                 coalesce(ns_lang <= 0.0, false) FROM a
          UNION ALL
          SELECT 'expect:nchars_mean', 'mean', round(m_nc, 6),
                 coalesce(m_nc >= 50.0 AND m_nc <= 2000.0, false)
          FROM a),
        ref_rows AS (
          SELECT 'ref:lang' AS "check", 'referential' AS kind,
                 sum((lang IS NULL OR lang NOT IN
                      ('en', 'de', 'es', 'fr'))::INT)::DOUBLE AS metric,
                 sum((lang IS NULL OR lang NOT IN
                      ('en', 'de', 'es', 'fr'))::INT) = 0 AS passed
          FROM documents)
        SELECT * FROM schema_rows
        UNION ALL SELECT * FROM expect_rows
        UNION ALL SELECT * FROM ref_rows
    """


def oracle_sql() -> dict[str, str]:
    from zoi_spark.urls import canonical_url_sql as _url_canonical_sql
    from zoi_spark.urls import resolve_href_sql as _resolve_href_sql
    from zoi_spark.transpile import violations_sql as _transpile_violations_sql

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
        "dedup_jaccard_pairs": _jaccard_pairs_sql(0.6),
        "jaccard_blocked_verify": f"""
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
        "codec_encode_shipdate": """
            SELECT strftime(l_shipdate, '%Y-%m') AS ym,
                   count(*)::BIGINT AS n
            FROM lineitem GROUP BY 1
        """,
        "minhash_lsh_pairs": _jaccard_pairs_sql(0.8),
        "simhash_pairs": _simhash_pairs_sql(max_hamming=3, prefix_bits=16),
        "lsh_ann_topk": _lsh_ann_sql(k=5, bits=4, dim=64, seed=42),
        "lsh_ann_multiprobe": _lsh_ann_sql(k=5, bits=4, dim=64, seed=42,
                                           multiprobe=True),
        "dedup_clusters": _dedup_clusters_sql(0.8),
        "ivf_ann_topk": _ivf_ann_sql(k=5, n_centroids=8, nprobe=4),
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
                   sum(len(regexp_extract_all(coalesce(text, ''),
                       '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]+')))::BIGINT
                     AS n_bpe_tokens,
                   round(avg(CASE
                     WHEN length(trim(text)) = 0
                          OR len(string_split_regex(trim(text), '\\s+')) = 0
                       THEN 0.0
                     ELSE length(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE
                          / len(string_split_regex(trim(text), '\\s+'))
                   END), 6) AS avg_tok_len
            FROM documents GROUP BY lang
        """,
        "text_quality_buckets": f"""
            SELECT floor({_QUALITY_SQL} * 10)::BIGINT AS bucket,
                   count(*)::BIGINT AS n
            FROM documents GROUP BY 1
        """,
        "text_quality_stopword": _quality_stopword_sql(),
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
        "winnowing_fingerprints": _winnowing_sql(k=5, w=8),
        "documents_flagship": _FLAGSHIP_SQL,
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
            -- ((x % 16) + 16) % 16 ≡ Spark pmod — sign-stable should the
            -- regenerated data ever carry negative ids
            WITH per AS (
              SELECT ((doc_id % 16) + 16) % 16 AS partition_id,
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
        "embedding_near_dups_lsh": _embedding_lsh_pairs_sql(
            0.35, bits=4, dim=64, seed=42),
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
            -- every engine rule mirrored definitionally (the gte/required
            -- mirrors emit zero rows on current data but keep the oracle
            -- aligned with the rule-set if the data regenerates)
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'user_id.required' AS rule_id FROM events
                WHERE event_id < 2000 AND (event_id % 11 = 0
                                           OR user_id IS NULL)
              UNION ALL
              SELECT 'user_id.gte' FROM events
                WHERE event_id < 2000 AND event_id % 11 != 0
                  AND user_id IS NOT NULL AND user_id < 0
              UNION ALL
              SELECT 'value.type' FROM events
                WHERE event_id < 2000 AND event_id % 13 = 0
              UNION ALL
              SELECT 'value.required' FROM events
                WHERE event_id < 2000 AND event_id % 13 != 0
                  AND value IS NULL
              UNION ALL
              SELECT 'value.gte' FROM events
                WHERE event_id < 2000 AND event_id % 13 != 0
                  AND value IS NOT NULL AND round(value, 2) < 0
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
        "stats_hll": """
            SELECT count(*)::BIGINT AS n_rows,
                   sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT
                     AS text__nulls,
                   sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT
                     AS lang__nulls,
                   min(lang) AS lang__min,
                   max(lang) AS lang__max,
                   round(avg(length(text)), 6) AS text_avg_len,
                   count(DISTINCT text)::BIGINT AS text__distinct_exact,
                   count(DISTINCT lang)::BIGINT AS lang__distinct_exact,
                   -- the HLL error-bound CLAIM (|approx-exact| <= 3·rsd·exact):
                   -- deterministic for fixed data; the engine derives it from
                   -- the actual sketch, the oracle asserts the guarantee
                   true AS text_hll_ok,
                   true AS lang_hll_ok,
                   sum(CASE WHEN length(text) < 0 THEN 1 ELSE 0 END)::BIGINT
                     AS text__hist_len_0,
                   sum(CASE WHEN length(text) >= 0 AND length(text) < 100
                       THEN 1 ELSE 0 END)::BIGINT AS text__hist_len_1,
                   sum(CASE WHEN length(text) >= 100 AND length(text) < 200
                       THEN 1 ELSE 0 END)::BIGINT AS text__hist_len_2,
                   sum(CASE WHEN length(text) >= 200 AND length(text) < 300
                       THEN 1 ELSE 0 END)::BIGINT AS text__hist_len_3,
                   sum(CASE WHEN length(text) >= 300 AND length(text) < 400
                       THEN 1 ELSE 0 END)::BIGINT AS text__hist_len_4,
                   sum(CASE WHEN length(text) >= 400 AND length(text) < 500
                       THEN 1 ELSE 0 END)::BIGINT AS text__hist_len_5,
                   sum(CASE WHEN length(text) >= 500 AND length(text) < 600
                       THEN 1 ELSE 0 END)::BIGINT AS text__hist_len_6,
                   sum(CASE WHEN length(text) >= 600 THEN 1 ELSE 0 END)::BIGINT
                     AS text__hist_len_7
            FROM documents
        """,
        "format_validators": f"""
            WITH corpus AS ({_format_corpus_sql()})
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'email.email' AS rule_id FROM corpus
                WHERE email IS NOT NULL AND NOT (
                  regexp_matches(email,
                    '(?i)^([a-z0-9_''+\\-\\.]*)[a-z0-9_+\\-]@([a-z0-9][a-z0-9\\-]*\\.)+[a-z]{{2,}}$')
                  AND NOT regexp_matches(email, '^\\.')
                  AND NOT contains(email, '..'))
              UNION ALL
              SELECT 'uuid.uuid' FROM corpus
                WHERE uuid IS NOT NULL AND NOT regexp_matches(uuid,
                  '^([0-9a-fA-F]{{8}}-[0-9a-fA-F]{{4}}-[1-8][0-9a-fA-F]{{3}}-[89abAB][0-9a-fA-F]{{3}}-[0-9a-fA-F]{{12}})$')
              UNION ALL
              SELECT 'url.url' FROM corpus
                WHERE url IS NOT NULL
                  AND NOT regexp_matches(url, '^https?://[^/?#[:space:]]+')
              UNION ALL
              SELECT 'ipv4.ipv4' FROM corpus
                WHERE ipv4 IS NOT NULL AND NOT regexp_matches(ipv4,
                  '^((25[0-5]|(2[0-4]|1\\d|[1-9]|)\\d)\\.?\\b){{4}}$')
              UNION ALL
              SELECT 'ipv6.ipv6' FROM corpus
                WHERE ipv6 IS NOT NULL AND NOT regexp_matches(ipv6,
                  '(([0-9a-fA-F]{{1,4}}:){{7,7}}[0-9a-fA-F]{{1,4}}|([0-9a-fA-F]{{1,4}}:){{1,7}}:|([0-9a-fA-F]{{1,4}}:){{1,6}}:[0-9a-fA-F]{{1,4}}|([0-9a-fA-F]{{1,4}}:){{1,5}}(:[0-9a-fA-F]{{1,4}}){{1,2}}|([0-9a-fA-F]{{1,4}}:){{1,4}}(:[0-9a-fA-F]{{1,4}}){{1,3}}|([0-9a-fA-F]{{1,4}}:){{1,3}}(:[0-9a-fA-F]{{1,4}}){{1,4}}|([0-9a-fA-F]{{1,4}}:){{1,2}}(:[0-9a-fA-F]{{1,4}}){{1,5}}|[0-9a-fA-F]{{1,4}}:((:[0-9a-fA-F]{{1,4}}){{1,6}})|:((:[0-9a-fA-F]{{1,4}}){{1,7}}|:)|fe80:(:[0-9a-fA-F]{{0,4}}){{0,4}}%[0-9a-zA-Z]{{1,}}|::(ffff(:0{{1,4}}){{0,1}}:){{0,1}}((25[0-5]|(2[0-4]|1{{0,1}}[0-9]){{0,1}}[0-9])\\.){{3,3}}(25[0-5]|(2[0-4]|1{{0,1}}[0-9]){{0,1}}[0-9])|([0-9a-fA-F]{{1,4}}:){{1,4}}:((25[0-5]|(2[0-4]|1{{0,1}}[0-9]){{0,1}}[0-9])\\.){{3,3}}(25[0-5]|(2[0-4]|1{{0,1}}[0-9]){{0,1}}[0-9]))')
              UNION ALL
              SELECT 'hexcol.hex' FROM corpus
                WHERE hexcol IS NOT NULL
                  AND NOT regexp_matches(hexcol, '^[0-9a-fA-F]*$')
              UNION ALL
              SELECT 'b64.base64' FROM corpus
                WHERE b64 IS NOT NULL AND NOT regexp_matches(b64,
                  '^(?:[A-Za-z0-9+/]{{4}})*(?:[A-Za-z0-9+/]{{2}}==|[A-Za-z0-9+/]{{3}}=)?$')
              UNION ALL
              SELECT 'b64u.base64url' FROM corpus
                WHERE b64u IS NOT NULL AND NOT regexp_matches(b64u,
                  '^(?:[A-Za-z0-9_-]{{4}})*(?:[A-Za-z0-9_-]{{2}}(?:==)?|[A-Za-z0-9_-]{{3}}=?)?$')
              UNION ALL
              SELECT 'jwtcol.jwt' FROM corpus
                WHERE jwtcol IS NOT NULL AND NOT regexp_matches(jwtcol,
                  '^[A-Za-z0-9_-]+\\.[A-Za-z0-9_-]+\\.[A-Za-z0-9_-]*$')
              UNION ALL
              SELECT 'iso_d.iso' FROM corpus
                WHERE iso_d IS NOT NULL AND NOT (
                  regexp_matches(iso_d, '^\\d{{4}}-\\d{{2}}-\\d{{2}}$')
                  AND try_strptime(iso_d, '%Y-%m-%d') IS NOT NULL)
              UNION ALL
              SELECT 'iso_t.iso' FROM corpus
                WHERE iso_t IS NOT NULL AND NOT regexp_matches(iso_t,
                  '^\\d{{2}}:\\d{{2}}:\\d{{2}}(\\.\\d{{1,6}})?$')
              UNION ALL
              SELECT 'iso_dt.iso' FROM corpus
                WHERE iso_dt IS NOT NULL AND NOT (
                  regexp_matches(iso_dt,
                    '^\\d{{4}}-\\d{{2}}-\\d{{2}}[T ]\\d{{2}}:\\d{{2}}:\\d{{2}}(\\.\\d{{1,6}})?(Z|[+-]\\d{{2}}:?\\d{{2}})$')
                  AND TRY_CAST(replace(iso_dt, 'T', ' ') AS TIMESTAMPTZ)
                      IS NOT NULL)
              UNION ALL
              SELECT 'iso_ndt.iso' FROM corpus
                WHERE iso_ndt IS NOT NULL AND NOT (
                  regexp_matches(iso_ndt,
                    '^\\d{{4}}-\\d{{2}}-\\d{{2}}[T ]\\d{{2}}:\\d{{2}}:\\d{{2}}(\\.\\d{{1,6}})?$')
                  AND TRY_CAST(replace(iso_ndt, 'T', ' ') AS TIMESTAMP)
                      IS NOT NULL)
            ) GROUP BY rule_id
        """,
        "tuple_rules": """
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 't.tuple_length' AS rule_id FROM lineitem
                WHERE ((l_orderkey % 7) + 7) % 7 = 0
              UNION ALL
              SELECT 't.0.lte' FROM lineitem
                WHERE ((l_orderkey % 7) + 7) % 7 != 0
                  AND l_quantity IS NOT NULL AND NOT (l_quantity <= 45.0)
              UNION ALL
              SELECT 't.1.lte' FROM lineitem
                WHERE ((l_orderkey % 7) + 7) % 7 != 0
                  AND l_discount IS NOT NULL AND NOT (l_discount <= 0.05)
              UNION ALL
              SELECT 't.2.lte' FROM lineitem
                WHERE ((l_orderkey % 7) + 7) % 7 != 0
                  AND l_extendedprice IS NOT NULL
                  AND NOT (l_extendedprice <= 30000.0)
            ) GROUP BY rule_id
        """,
        "intersection_enum_remap": """
            WITH seeded AS (
              SELECT c_custkey, c_mktsegment,
                     CASE WHEN ((c_custkey % 5) + 5) % 5 = 0
                            THEN substr(c_name, 1, 8)
                          WHEN ((c_custkey % 7) + 7) % 7 = 0
                            THEN 'CUSTOMER#' || substr(c_name, 10, 30)
                          ELSE c_name END AS c_name
              FROM customer)
            SELECT key, count(*)::BIGINT AS n FROM (
              -- intersection branch 1 (min 10); branch 2 halts when 1 fails
              SELECT 'c_name.gte' AS key FROM seeded
                WHERE c_name IS NOT NULL AND NOT (length(c_name) >= 10)
              UNION ALL
              SELECT 'c_name.starts_with' FROM seeded
                WHERE c_name IS NOT NULL AND length(c_name) >= 10
                  AND NOT starts_with(c_name, 'Customer#')
              UNION ALL
              SELECT 'seg:' || CASE c_mktsegment
                       WHEN 'BUILDING' THEN 'bld'
                       WHEN 'FURNITURE' THEN 'fur'
                       WHEN 'MACHINERY' THEN 'mach'
                       WHEN 'AUTOMOBILE' THEN 'auto'
                       WHEN 'HOUSEHOLD' THEN 'house' END
              FROM seeded
            ) GROUP BY key
        """,
        "mapkv_props": """
            -- the %19 seed replaces props BEFORE the null check, exactly
            -- as the engine's when().otherwise(props) does, so a null
            -- props row that lands on the seed still validates; a null
            -- map surfaces the required rule (definitional alignment if
            -- the data ever regenerates with null props)
            WITH seeded AS (
              SELECT event_id,
                     CASE WHEN ((event_id % 19) + 19) % 19 = 0
                          THEN '{"k": "abc"}' ELSE props END AS p2,
                     CASE WHEN ((event_id % 17) + 17) % 17 = 0 THEN 'x'
                          ELSE 'k' END AS key
              FROM events),
            vals AS (
              SELECT event_id, key, p2,
                     json_extract_string(p2, '$.k') AS val
              FROM seeded)
            SELECT code, count(*)::BIGINT AS n FROM (
              SELECT 'required' AS code FROM vals WHERE p2 IS NULL
              UNION ALL
              SELECT 'not_in_values' FROM vals
                WHERE p2 IS NOT NULL AND key != 'k'
              UNION ALL
              SELECT 'invalid_type' FROM vals
                WHERE p2 IS NOT NULL AND val IS NOT NULL
                  AND NOT regexp_matches(val, '^[+-]?\\d+$')
              UNION ALL
              SELECT 'less_than_or_equal_to' FROM vals
                WHERE p2 IS NOT NULL AND val IS NOT NULL
                  AND regexp_matches(val, '^[+-]?\\d+$')
                  AND NOT (val::BIGINT <= 50)
            ) GROUP BY code
        """,
        "multiple_unique_decimal": """
            WITH seeded AS (
              SELECT l_orderkey, l_partkey AS pk,
                     [((l_partkey % 10) + 10) % 10,
                      ((l_suppkey % 10) + 10) % 10,
                      ((l_orderkey % 10) + 10) % 10] AS arr,
                     CASE WHEN ((l_orderkey % 13) + 13) % 13 = 0 THEN 'n/a'
                          ELSE (((l_partkey % 10000) + 10000) % 10000)::VARCHAR
                               || '.' ||
                               lpad((((l_suppkey % 100) + 100) % 100)::VARCHAR,
                                    2, '0')
                     END AS price_str
              FROM lineitem)
            SELECT rule_id, n FROM (
              SELECT 'pk.multiple_of' AS rule_id, count(*)::BIGINT AS n
              FROM seeded WHERE pk IS NOT NULL AND NOT (pk % 4 = 0)
              UNION ALL
              SELECT 'arr.unique_items', count(*)::BIGINT
              FROM seeded WHERE len(list_distinct(arr)) != len(arr)
              UNION ALL
              SELECT 'price_str.type', count(*)::BIGINT
              FROM seeded WHERE price_str IS NOT NULL
                AND NOT (regexp_matches(price_str,
                           '^[+-]?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$')
                         AND TRY_CAST(price_str AS DECIMAL(12,2)) IS NOT NULL)
              UNION ALL
              SELECT 'price_sum_x100',
                     (sum(TRY_CAST(price_str AS DECIMAL(12,2))) * 100)::BIGINT
              FROM seeded
            ) WHERE n > 0
        """,
        "scalar_coercion_matrix": _scalar_matrix_sql(),
        "schema_algebra": """
            WITH seeded AS (
              SELECT c_custkey, c_name,
                     'tag-' || c_custkey::VARCHAR AS c_tag
              FROM customer)
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'c_custkey.gte' AS rule_id FROM seeded
                WHERE c_custkey IS NOT NULL AND NOT (c_custkey >= 100)
              UNION ALL
              SELECT 'c_name.gte' FROM seeded
                WHERE c_name IS NOT NULL AND NOT (length(c_name) >= 5)
              UNION ALL
              SELECT 'c_name.lte' FROM seeded
                WHERE c_name IS NOT NULL AND NOT (length(c_name) <= 25)
              UNION ALL
              SELECT 'c_name.starts_with' FROM seeded
                WHERE c_name IS NOT NULL
                  AND NOT starts_with(c_name, 'Customer#')
              UNION ALL
              SELECT 'c_tag.gte' FROM seeded
                WHERE c_tag IS NOT NULL AND NOT (length(c_tag) >= 8)
              UNION ALL
              SELECT 'c_tag.starts_with' FROM seeded
                WHERE c_tag IS NOT NULL AND NOT starts_with(c_tag, 'tag-')
            ) GROUP BY rule_id
        """,
        "json_schema_roundtrip": """
            WITH ev AS (
              SELECT event_id, event_type, value, user_id,
                     json_extract_string(props, '$.k') AS k
              FROM events)
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'event_id.gte' AS rule_id FROM ev
                WHERE event_id IS NOT NULL AND NOT (event_id >= 0)
              UNION ALL
              SELECT 'event_id.required' FROM ev WHERE event_id IS NULL
              UNION ALL
              SELECT 'event_type.type' FROM ev
                WHERE event_type IS NOT NULL
                  AND event_type NOT IN ('click','view','signup','purchase')
              UNION ALL
              SELECT 'event_type.required' FROM ev WHERE event_type IS NULL
              UNION ALL
              SELECT 'value.lte' FROM ev
                WHERE value IS NOT NULL AND NOT (value <= 150.0)
              UNION ALL
              SELECT 'value.required' FROM ev WHERE value IS NULL
              UNION ALL
              SELECT 'user_id.gt' FROM ev
                WHERE user_id IS NOT NULL AND NOT (user_id > 0)
              UNION ALL
              SELECT 'user_id.required' FROM ev WHERE user_id IS NULL
              UNION ALL
              SELECT 'k.regex' FROM ev
                WHERE k IS NOT NULL
                  AND NOT regexp_matches(k, '^[0-4]?[0-9]$')
            ) GROUP BY rule_id
        """,
        "refine_ctx_multi": _refine_ctx_sql(),
        "email_variants": _email_variants_sql(),
        "schema_docs": """
            SELECT * FROM (VALUES
              ('documents', 0, '- object (5 fields)'),
              ('documents', 1, '  - **doc_id**:'),
              ('documents', 2, '    - integer  — gte(value=0)'),
              ('documents', 3, '  - **text**:'),
              ('documents', 4, '    - string  — gte(value=50); lte(value=520)'),
              ('documents', 5, '  - **lang**:'),
              ('documents', 6, '    - string  — gte(value=2); lte(value=2); one_of(values=[''en'', ''de'', ''es'', ''fr''])'),
              ('documents', 7, '  - **source**:'),
              ('documents', 8, '    - string  — starts_with(value=''src'')'),
              ('documents', 9, '  - **n_chars**:'),
              ('documents', 10, '    - integer  — gte(value=50)'),
              ('mini', 0, '- object (5 fields)'),
              ('mini', 1, '  - **kind**:'),
              ('mini', 2, '    - enum of [A, B]'),
              ('mini', 3, '  - **tags**:'),
              ('mini', 4, '    - array  — gte(value=1); optional'),
              ('mini', 5, '      - string  — gte(value=1)'),
              ('mini', 6, '  - **val**:'),
              ('mini', 7, '    - any of:'),
              ('mini', 8, '      - integer'),
              ('mini', 9, '      - float'),
              ('mini', 10, '  - **flag**:'),
              ('mini', 11, '    - literal `''on''`'),
              ('mini', 12, '  - **score**:'),
              ('mini', 13, '    - float  — gte(value=0.0); default=1.0')
            ) t(part, line_no, line)
        """,
        "schema_introspection": """
            SELECT * FROM (VALUES
              ('doc:doc_id', 'bigint', true),
              ('doc:text', 'string', true),
              ('doc:lang', 'string', true),
              ('doc:source', 'string', true),
              ('doc:n_chars', 'bigint', true),
              ('doc:__ddl__',
               'doc_id bigint NOT NULL, text string NOT NULL, ' ||
               'lang string NOT NULL, source string NOT NULL, ' ||
               'n_chars bigint NOT NULL', false),
              ('mini:enforce_keys', 'a,c', false),
              ('mini:struct_fields', 'a,b,c=7', false),
              ('mini:a', 'bigint', true),
              ('mini:b', 'string', false),
              ('mini:c', 'bigint', false)
            ) t(key, info, enforced)
        """,
        "validate_strict_parsed": """
            SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
            FROM customer
            WHERE c_custkey >= 100
              AND length(c_name) BETWEEN 5 AND 25
              AND starts_with(c_name, 'Customer#')
              AND c_nationkey BETWEEN 0 AND 24
              AND c_acctbal <= 5000.0
              AND c_mktsegment IN ('BUILDING','FURNITURE','MACHINERY')
        """,
        "lazy_tree": """
            SELECT rule_id, path_str, count(*)::BIGINT AS n FROM (
              SELECT 'tree.v.lte' AS rule_id, 'tree.v' AS path_str
              FROM documents WHERE ((doc_id % 8) + 8) % 8 > 5
              UNION ALL
              SELECT 'tree.child.v.lte', 'tree.child.v'
              FROM documents
              WHERE (((doc_id // 8) % 8) + 8) % 8 > 5
            ) GROUP BY 1, 2
        """,
        "json_probe": """
            WITH seeded AS (
              SELECT CASE WHEN ((event_id % 23) + 23) % 23 = 0
                          THEN '{"broken": ' || event_id::VARCHAR
                          ELSE props END AS p
              FROM events)
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT CASE WHEN p IS NULL THEN 'props.required'
                          WHEN NOT json_valid(p) THEN 'props.type'
                     END AS rule_id
              FROM seeded)
            WHERE rule_id IS NOT NULL GROUP BY 1
        """,
        "winnowing_overlap_pairs": _winnow_pairs_sql(
            k=5, w=8, min_shared=5, max_hash_docs=20),
        "media_decode_features": _media_decode_sql(),
        "media_audio_features": _media_audio_sql(),
        "media_video_frames": _media_video_sql(),
        "ivf_train_step": _ivf_train_sql(n_centroids=8, dim=64, round_to=6),
        "ivf_topk_trained": _ivf_trained_topk_sql(
            k=5, n_centroids=8, nprobe=4, dim=64, round_to=6),
        "cross_field_rules": """
            SELECT message, count(*)::BIGINT AS n FROM (
              SELECT 'net price too high' AS message FROM lineitem
                WHERE NOT coalesce(
                  l_extendedprice * (1.0 - l_discount) <= 60000.0, false)
              UNION ALL
              SELECT 'extreme combo q=' || l_quantity::INTEGER::VARCHAR
              FROM lineitem
              WHERE l_quantity >= 49.0 AND l_discount >= 0.09
            ) GROUP BY message
        """,
        "contamination_probes": f"""
            WITH docs AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
            probes AS (
              -- second normalization pass = trim only (the substring
              -- of an already-normalized text can carry edge spaces)
              SELECT doc_id AS probe_id, trim(substr(t, 11, 35)) AS p
              FROM docs WHERE doc_id IN (3, 57, 111)
              UNION ALL SELECT 999, 'zzz qqq vvv')
            SELECT probe_id, count(*)::BIGINT AS n_docs,
                   min(doc_id) AS first_doc_id
            FROM docs JOIN probes ON contains(t, p)
            GROUP BY probe_id
        """,
        "top_bigrams": f"""
            WITH toks AS (
              SELECT string_split({_NORM_SQL}, ' ') AS t FROM documents),
            grams AS (
              SELECT unnest(
                CASE WHEN len(t) <= 1 THEN [array_to_string(t, ' ')]
                     ELSE list_transform(range(1, len(t)),
                                         i -> array_to_string(t[i:i+1], ' '))
                END) AS ngram
              FROM toks)
            SELECT ngram, count(*)::BIGINT AS n_occurrences
            FROM grams GROUP BY ngram HAVING count(*) >= 2
            ORDER BY n_occurrences DESC, ngram ASC LIMIT 15
        """,
        "url_canonical_dedup": _url_dedup_sql(),
        "pii_scan": _pii_scan_sql(),
        "grapheme_length_rules": f"""
            WITH corpus AS (
              SELECT doc_id,
                     {_pool_sql("gstr", _GRAPHEME_POOL)},
                     {_pool_sql("cstr", _GRAPHEME_POOL)}
              FROM documents)
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'gstr.gte' AS rule_id FROM corpus
                WHERE gstr IS NOT NULL
                  AND NOT (length_grapheme(gstr) >= 6)
              UNION ALL
              SELECT 'cstr.gte' FROM corpus
                WHERE cstr IS NOT NULL AND NOT (length(cstr) >= 6)
            ) GROUP BY rule_id
        """,
        "stream_validate_docs": """
            SELECT rule_id, count(*)::BIGINT AS n FROM (
              SELECT 'doc_id.gte' AS rule_id FROM documents
                WHERE doc_id IS NOT NULL AND NOT (doc_id >= 0)
              UNION ALL
              SELECT 'text.gte' FROM documents
                WHERE text IS NOT NULL AND NOT (length(text) >= 50)
              UNION ALL
              SELECT 'text.lte' FROM documents
                WHERE text IS NOT NULL AND NOT (length(text) <= 520)
              UNION ALL
              SELECT 'lang.gte' FROM documents
                WHERE lang IS NOT NULL AND NOT (length(lang) >= 2)
              UNION ALL
              SELECT 'lang.lte' FROM documents
                WHERE lang IS NOT NULL AND NOT (length(lang) <= 2)
              UNION ALL
              SELECT 'lang.one_of' FROM documents
                WHERE lang IS NOT NULL AND lang NOT IN ('en','de','es','fr')
              UNION ALL
              SELECT 'source.starts_with' FROM documents
                WHERE source IS NOT NULL AND NOT starts_with(source, 'src')
              UNION ALL
              SELECT 'n_chars.gte' FROM documents
                WHERE n_chars IS NOT NULL AND NOT (n_chars >= 50)
            ) GROUP BY rule_id
        """,
        "host_cap_sample": """
            SELECT doc_id, source, host_rank FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                                doc_id) AS host_rank
              FROM documents)
            WHERE host_rank <= 5
        """,
        "stratified_sample_langs": """
            SELECT doc_id, lang FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
              CASE lang WHEN 'en' THEN '80000000'
                        WHEN 'de' THEN '40000000'
                        WHEN 'fr' THEN '40000000'
                        WHEN 'es' THEN '20000000'
                        ELSE '00000000' END
        """,
        "incremental_new_docs": f"""
            WITH base AS (
              SELECT md5({_NORM_SQL}) AS fp FROM documents WHERE doc_id < 400),
            new_snap AS (
              SELECT doc_id, text, source FROM documents WHERE doc_id >= 400
              UNION ALL
              SELECT doc_id + 10000, text, source FROM documents
                WHERE doc_id < 50)
            SELECT doc_id, source FROM new_snap
            WHERE md5({_NORM_SQL}) NOT IN (SELECT fp FROM base)
        """,
        "repetition_quality": f"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents),
            uni AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
            u AS (SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                         count(*)::BIGINT AS n_distinct, max(c) AS top_c
                  FROM uni GROUP BY 1),
            grams AS (
              SELECT doc_id, unnest(
                CASE WHEN len(l) <= 1
                     THEN [list_aggregate(l, 'string_agg', ' ')]
                     ELSE list_transform(range(1, len(l)),
                                         i -> l[i] || ' ' || l[i + 1]) END
              ) AS gram
              FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS l
                    FROM documents)),
            bc AS (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2),
            b AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS top_bc
                  FROM bc GROUP BY 1)
            SELECT u.doc_id, n_tokens, n_distinct,
                   round(n_distinct * 1.0 / n_tokens, 6) AS distinct_ratio,
                   round(top_c * 1.0 / n_tokens, 6) AS top_token_frac,
                   round(top_bc * 1.0 / n_bigrams, 6) AS top_bigram_frac
            FROM u JOIN b USING (doc_id)
            ORDER BY top_token_frac DESC, u.doc_id
            LIMIT 20
        """,
        "stats_quantiles": """
            SELECT lang,
                   round(quantile_cont(n_chars, 0.25), 6) AS q_0_25,
                   round(quantile_cont(n_chars, 0.5), 6) AS q_0_5,
                   round(quantile_cont(n_chars, 0.9), 6) AS q_0_9
            FROM documents GROUP BY lang
        """,
        "zscore_outliers": """
            WITH s AS (SELECT lang, avg(n_chars) AS mu,
                              stddev_samp(n_chars) AS sigma
                       FROM documents GROUP BY lang)
            SELECT doc_id, d.lang, n_chars,
                   round((n_chars - mu) / sigma, 6) AS zscore,
                   'n_chars.zscore_outlier' AS rule_id
            FROM documents d JOIN s USING (lang)
            WHERE sigma IS NOT NULL AND sigma > 0
              AND abs((n_chars - mu) / sigma) > 2.0
        """,
        "pack_sequences": """
            SELECT doc_id, pack_shard,
                   CAST(floor((cums - n_chars) / 3000.0) AS BIGINT)
                     AS seq_bin
            FROM (
              SELECT doc_id, n_chars, doc_id % 8 AS pack_shard,
                     sum(n_chars) OVER (
                       PARTITION BY doc_id % 8 ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS cums
              FROM documents)
        """,
        "boilerplate_strip": f"""
            WITH lined AS ({_lined_docs_sql()}),
            doc_lines AS (
              SELECT doc_id, trim(line) AS line
              FROM (SELECT doc_id,
                           unnest(string_split(text, chr(10))) AS line
                    FROM lined)
              WHERE length(trim(line)) > 0),
            freq AS (
              SELECT line, count(*) AS n_docs
              FROM (SELECT DISTINCT doc_id, line FROM doc_lines)
              GROUP BY line HAVING count(*) >= 3
              ORDER BY n_docs DESC, line LIMIT 50),
            dropset AS (SELECT coalesce(list(line), []) AS drop_lines
                        FROM freq),
            stripped AS (
              SELECT l.doc_id,
                     len(list_filter(string_split(l.text, chr(10)),
                                     x -> length(trim(x)) > 0))
                       AS n_lines,
                     list_filter(string_split(l.text, chr(10)),
                                 x -> length(trim(x)) > 0
                                      AND NOT list_contains(
                                            d.drop_lines, trim(x)))
                       AS kept
              FROM lined l CROSS JOIN dropset d)
            SELECT doc_id,
                   CAST(n_lines AS INT) AS n_lines,
                   CAST(len(kept) AS INT) AS n_kept,
                   md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
            FROM stripped ORDER BY doc_id LIMIT 400
        """,
        "c4_line_filter": f"""
            WITH lined AS ({_lined_docs_sql(5)}),
            punct AS (
              SELECT doc_id,
                     array_to_string(
                       list_transform(
                         string_split(text, chr(10)),
                         x -> CASE WHEN length(x) % 3 = 0
                                   THEN x || '.' ELSE x END),
                       chr(10)) AS text
              FROM lined),
            filt AS (
              SELECT doc_id,
                     len(list_filter(string_split(text, chr(10)),
                                     x -> length(trim(x)) > 0))
                       AS n_lines,
                     list_filter(
                       string_split(text, chr(10)),
                       x -> len(string_split_regex(trim(x), '\\s+')) >= 4
                            AND length(trim(x)) > 0
                            AND substr(trim(x), -1, 1) IN ('.', '!', '?')
                            AND NOT contains(lower(trim(x)), 'slow'))
                       AS kept
              FROM punct)
            SELECT doc_id,
                   CAST(n_lines AS INT) AS n_lines,
                   CAST(len(kept) AS INT) AS n_kept,
                   md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
            FROM filt ORDER BY doc_id LIMIT 400
        """,
        "unigram_surprisal": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents),
            dt AS (
              SELECT doc_id, tok, count(*) AS c
              FROM toks WHERE length(tok) > 0
              GROUP BY doc_id, tok),
            vocab AS (SELECT tok, sum(c) AS cw FROM dt GROUP BY tok),
            total AS (SELECT sum(cw) AS nt FROM vocab)
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   round(sum(c * -log2(cw / nt)) / sum(c), 6)
                     AS mean_surprisal
            FROM dt JOIN vocab USING (tok) CROSS JOIN total
            GROUP BY doc_id
            ORDER BY mean_surprisal DESC, doc_id LIMIT 20
        """,
        "semantic_dedup": f"""
            WITH {_ivf_train_ctes(8, 64, 6)},
            assign AS (
              SELECT vec_id, v, i AS cell FROM (
                SELECT c.vec_id, c.v, r.i,
                       row_number() OVER (
                         PARTITION BY c.vec_id
                         ORDER BY round(list_dot_product(c.v, r.cv), 9)
                                    DESC,
                                  r.i ASC) AS rn
                FROM c, refined r)
              WHERE rn = 1),
            drops AS (
              SELECT DISTINCT b.vec_id FROM assign a JOIN assign b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.35)
            SELECT s.vec_id, s.cell::INTEGER AS cell
            FROM assign s LEFT JOIN drops d ON s.vec_id = d.vec_id
            WHERE d.vec_id IS NULL
        """,
        "dup_ngram_fraction": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            grams AS (
              SELECT doc_id, unnest(
                CASE WHEN len(t) <= 4 THEN [array_to_string(t, ' ')]
                     ELSE list_transform(range(1, len(t) - 3),
                                         i -> array_to_string(t[i:i+4], ' '))
                END) AS gram
              FROM toks),
            dfreq AS (
              SELECT gram FROM grams
              GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
            SELECT g.doc_id,
                   count(*)::BIGINT AS n_grams,
                   sum(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END)
                     ::BIGINT AS n_dup,
                   round(sum(CASE WHEN d.gram IS NOT NULL
                                  THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
                     AS dup_fraction
            FROM grams g LEFT JOIN dfreq d ON g.gram = d.gram
            GROUP BY g.doc_id
            HAVING sum(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
        """,
        "gopher_quality": f"""
            WITH base AS (
              SELECT doc_id, text,
                     list_filter(string_split({_NORM_SQL}, ' '),
                                 x -> length(x) > 0) AS t,
                     string_split(text, chr(10)) AS ls
              FROM documents),
            m AS (
              SELECT doc_id,
                     len(t) AS nw,
                     CASE WHEN len(t) > 0 THEN
                       list_sum(list_transform(t, x -> length(x)))::DOUBLE
                         / len(t)
                     ELSE 0.0 END AS mwl,
                     len(regexp_extract_all(text, '#'))
                       + len(regexp_extract_all(text, '\\.\\.\\.'))
                       + len(regexp_extract_all(text, '…')) AS nsym,
                     len(ls) AS nl,
                     len(list_filter(ls,
                       x -> regexp_matches(trim(x), '^[-*•]'))) AS nb,
                     len(list_filter(ls,
                       x -> regexp_matches(trim(x), '(\\.\\.\\.|…)$')))
                       AS ne,
                     len(list_filter(t,
                       x -> regexp_matches(x, '[a-z]'))) AS na,
                     len(list_intersect(t, ['join','hash','row','batch',
                                            'scan','filter','data',
                                            'merge'])) AS ns
              FROM base)
            SELECT doc_id,
                   (nw >= 20 AND nw <= 100000) AS g_word_count,
                   (nw > 0 AND mwl >= 3.0 AND mwl <= 10.0)
                     AS g_mean_word_len,
                   (nw > 0 AND nsym / nw <= 0.1) AS g_symbol_ratio,
                   (nl > 0 AND nb / nl <= 0.1) AS g_bullet_ratio,
                   (nl > 0 AND ne / nl <= 0.3) AS g_ellipsis_ratio,
                   (nw > 0 AND na / nw >= 0.8) AS g_alpha_ratio,
                   (ns >= 2) AS g_stopwords,
                   ((nw >= 20 AND nw <= 100000)
                    AND (nw > 0 AND mwl >= 3.0 AND mwl <= 10.0)
                    AND (nw > 0 AND nsym / nw <= 0.1)
                    AND (nl > 0 AND nb / nl <= 0.1)
                    AND (nl > 0 AND ne / nl <= 0.3)
                    AND (nw > 0 AND na / nw >= 0.8)
                    AND (ns >= 2)) AS gopher_pass
            FROM m
        """,
        "ngram_decontam": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            probes AS (
              SELECT doc_id AS probe_id,
                     array_to_string(t[6:25], ' ') AS ptext
              FROM toks WHERE doc_id IN (7, 42, 203)
              UNION ALL
              SELECT 999, 'w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 '
                          || 'w13 w14 w15 w16 w17 w18 w19'),
            pt AS (SELECT probe_id, string_split(ptext, ' ') AS t
                   FROM probes),
            pg AS (
              SELECT DISTINCT probe_id, gram FROM (
                SELECT probe_id, unnest(
                  CASE WHEN len(t) <= 12 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 11),
                              i -> array_to_string(t[i:i+12], ' '))
                  END) AS gram
                FROM pt)),
            dg AS (
              SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(t) <= 12 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 11),
                              i -> array_to_string(t[i:i+12], ' '))
                  END) AS gram
                FROM toks))
            SELECT dg.doc_id, pg.probe_id,
                   count(*)::BIGINT AS n_shared_grams
            FROM dg JOIN pg USING (gram)
            GROUP BY 1, 2
        """,
        "url_quality": """
            WITH seeded AS (
              SELECT doc_id,
                     CASE ((doc_id % 7) + 7) % 7
                       WHEN 0 THEN 'http://host' || g
                                   || '.example.com/p/' || g
                       WHEN 1 THEN 'http://93.184.216.34/p/' || g
                       WHEN 2 THEN 'http://host' || g
                                   || '.example.com/casino/' || g
                       WHEN 3 THEN 'http://9876543210' || g
                                   || '.example.com/p/' || g
                       WHEN 4 THEN 'http://host' || g
                         || '.example.com/a/b/c/d/e/f/g/h/i/j/k/l/m/' || g
                       WHEN 5 THEN 'http://host' || g
                         || '.example.com/p/' || g
                         || '?p0=1&p1=1&p2=1&p3=1&p4=1&p5=1&p6=1&p7=1'
                         || '&p8=1&p9=1&p10=1&p11=1'
                       ELSE 'http://host' || g || '.example.com/p/' || g
                            || '/' || repeat('x', 300)
                     END AS url
              FROM (SELECT doc_id,
                           (((doc_id % 50) + 50) % 50)::VARCHAR AS g
                    FROM documents)),
            m AS (
              SELECT doc_id, url,
                     lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS host,
                     regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)
                       AS path
              FROM seeded),
            f AS (
              SELECT doc_id,
                     regexp_matches(url, '(?i)^https?://[^/:?#]+')
                       AS u_valid,
                     NOT regexp_matches(host,
                       '^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$') AS u_not_ip,
                     NOT regexp_matches(lower(url),
                       '(casino|xxx|viagra|lottery)') AS u_not_blocked,
                     (length(host) > 0 AND
                      (length(host) - length(regexp_replace(host,
                         '[0-9]', '', 'g'))) / length(host) <= 1.0/3)
                       AS u_host_digits,
                     (length(path) - length(replace(path, '/', ''))) <= 12
                       AS u_depth,
                     (CASE WHEN regexp_matches(url, '\\?')
                           THEN length(regexp_replace(url, '[^&]', '',
                                                      'g')) + 1
                           ELSE 0 END) <= 10 AS u_params,
                     length(url) <= 300 AS u_length
              FROM m)
            SELECT doc_id, u_valid, u_not_ip, u_not_blocked,
                   u_host_digits, u_depth, u_params, u_length,
                   (u_valid AND u_not_ip AND u_not_blocked
                    AND u_host_digits AND u_depth AND u_params
                    AND u_length) AS url_pass
            FROM f
        """,
        "curate_e2e": _curate_e2e_sql(min_quality=0.55, threshold=0.8),
        "dedup_doc_lines": f"""
            WITH lined AS ({_lined_docs_sql()}),
            l AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1)
                       AS pos
              FROM lined),
            k AS (
              SELECT doc_id, line, pos FROM (
                SELECT doc_id, line, pos,
                       row_number() OVER (
                         PARTITION BY doc_id, line ORDER BY pos) AS rn
                FROM l)
              WHERE rn = 1 OR trim(line) = ''),
            a AS (SELECT doc_id, count(*)::BIGINT AS n_lines
                  FROM l GROUP BY 1),
            b AS (
              SELECT doc_id, count(*)::BIGINT AS n_kept,
                     md5(string_agg(line, chr(10) ORDER BY pos))
                       AS clean_md5
              FROM k GROUP BY doc_id)
            SELECT a.doc_id, n_lines, n_kept, clean_md5
            FROM a JOIN b USING (doc_id)
        """,
        "url_latest_dedup": _url_latest_sql(),
        "cluster_best_rep": f"""
            WITH clus AS ({_dedup_clusters_sql(0.8)}),
            scored AS (
              SELECT doc_id, {_QUALITY_SQL} AS q
              FROM ({_DUP_DOCS_SQL}))
            SELECT cluster_id, keep_id, q FROM (
              SELECT c.cluster_id, c.doc_id AS keep_id, s.q,
                     row_number() OVER (
                       PARTITION BY c.cluster_id
                       ORDER BY s.q DESC, c.doc_id ASC) AS rn
              FROM clus c JOIN scored s ON s.doc_id = c.doc_id)
            WHERE rn = 1
        """,
        "stream_dedup_docs": f"""
            SELECT DISTINCT md5({_NORM_SQL}) AS fp
            FROM ({_DUP_DOCS_SQL})
        """,
        "sessionize_events": """
            WITH lagged AS (
              SELECT user_id, event_id, ts,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM events),
            s AS (
              SELECT user_id, event_id,
                     sum(CASE WHEN prev_ts IS NULL
                              OR ts - prev_ts > INTERVAL 30 MINUTE
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
              FROM lagged)
            SELECT user_id, session_id,
                   count(*)::BIGINT AS n_events,
                   min(event_id) AS first_event
            FROM s GROUP BY 1, 2
        """,
        "ks_drift_len": """
            WITH hist AS (
              SELECT greatest(least(floor(n_chars / 100.0), 9), 0)
                       ::BIGINT AS bucket,
                     sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                       AS ca,
                     sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                       AS cb
              FROM documents GROUP BY 1),
            tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM hist),
            cdf AS (
              SELECT bucket,
                     sum(ca) OVER (ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING)
                       / ta AS cdf_a,
                     sum(cb) OVER (ORDER BY bucket
                                   ROWS UNBOUNDED PRECEDING)
                       / tb AS cdf_b
              FROM hist, tot)
            SELECT round(max(abs(cdf_a - cdf_b)), 6) AS ks,
                   count(*)::BIGINT AS n_buckets
            FROM cdf
        """,
        "temperature_weights": """
            WITH agg AS (
              SELECT lang, count(*)::BIGINT AS n
              FROM documents GROUP BY 1),
            tot AS (SELECT sum(n) AS ntot FROM agg),
            ps AS (SELECT sum(pow(n / ntot, 0.7)) AS s FROM agg, tot)
            SELECT lang, n,
                   round(n / ntot, 6) AS p,
                   round(pow(n / ntot, 0.7) / s, 6) AS q,
                   round((pow(n / ntot, 0.7) / s) / (n / ntot), 6)
                     AS boost
            FROM agg, tot, ps
        """,
        "token_budget_fill": """
            WITH t AS (
              SELECT doc_id, lang,
                     (CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+'))
                      END)::BIGINT AS n
              FROM documents),
            c AS (
              SELECT doc_id, lang,
                     sum(n) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum_tokens
              FROM t)
            SELECT doc_id, lang, cum_tokens::BIGINT AS cum_tokens
            FROM c WHERE cum_tokens <= 5000
        """,
        "dsir_weights": f"""
            WITH toks AS (
              SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS t
              FROM documents WHERE text IS NOT NULL),
            grams AS (
              SELECT doc_id, lang, unnest(
                CASE WHEN len(t) <= 1 THEN [array_to_string(t, ' ')]
                     ELSE list_transform(range(1, len(t)),
                                         i -> array_to_string(t[i:i+1], ' '))
                END) AS gram
              FROM toks),
            feat AS (
              SELECT doc_id, lang,
                     (('0x' || substr(md5(gram), 1, 8))::UBIGINT
                      % 256)::BIGINT AS bucket
              FROM grams WHERE gram <> ''),
            q AS (SELECT bucket, count(*)::DOUBLE AS cq FROM feat
                  GROUP BY bucket),
            p AS (SELECT bucket, count(*)::DOUBLE AS cp FROM feat
                  WHERE lang = 'en' GROUP BY bucket),
            tq AS (SELECT sum(cq) AS t FROM q),
            tp AS (SELECT sum(cp) AS t FROM p),
            lr AS (
              SELECT q.bucket,
                     ln((coalesce(p.cp, 0) + 0.5) / (tp.t + 0.5 * 256))
                   - ln((q.cq + 0.5) / (tq.t + 0.5 * 256)) AS lr
              FROM q LEFT JOIN p ON q.bucket = p.bucket, tq, tp)
            SELECT doc_id, count(*)::BIGINT AS n_grams,
                   round(sum(lr.lr), 6) AS dsir_logweight
            FROM feat JOIN lr ON feat.bucket = lr.bucket
            GROUP BY doc_id
            ORDER BY dsir_logweight DESC, doc_id LIMIT 40
        """,
        "host_pagerank": _pagerank_sql(iters=4),
        "bloom_decontam": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            probes AS (
              SELECT array_to_string(t[6:25], ' ') AS ptext
              FROM toks WHERE doc_id IN (7, 42, 203)),
            pt AS (SELECT string_split(ptext, ' ') AS t FROM probes),
            pg AS (
              SELECT DISTINCT gram FROM (
                SELECT unnest(
                  CASE WHEN len(t) <= 12 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 11),
                              i -> array_to_string(t[i:i+12], ' '))
                  END) AS gram
                FROM pt) WHERE gram <> ''),
            bits AS (
              SELECT DISTINCT
                     (('0x' || substr(md5('bloom' || r.i || ':' || gram),
                                      1, 8))::UBIGINT % 256)::BIGINT AS pos
              FROM pg, range(4) AS r(i)),
            dg AS (
              SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(t) <= 12 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 11),
                              i -> array_to_string(t[i:i+12], ' '))
                  END) AS gram
                FROM toks) WHERE gram <> ''),
            dpos AS (
              SELECT doc_id, gram, r.i,
                     (('0x' || substr(md5('bloom' || r.i || ':' || gram),
                                      1, 8))::UBIGINT % 256)::BIGINT AS pos
              FROM dg, range(4) AS r(i)),
            hitg AS (
              SELECT doc_id, gram FROM dpos JOIN bits USING (pos)
              GROUP BY doc_id, gram HAVING count(DISTINCT i) = 4),
            hd AS (SELECT doc_id, count(*)::BIGINT AS n_hit_grams
                   FROM hitg GROUP BY doc_id),
            tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams
                    FROM dg GROUP BY doc_id)
            SELECT tot.doc_id, tot.n_grams, hd.n_hit_grams,
                   TRUE AS bloom_contaminated
            FROM tot JOIN hd USING (doc_id)
            ORDER BY hd.n_hit_grams DESC, tot.doc_id LIMIT 40
        """,
        "quality_linear": f"""
            WITH s AS (
              SELECT doc_id, lang,
                     list_filter(string_split({_NORM_SQL}, ' '),
                                 x -> len(x) > 0) AS t
              FROM documents),
            sc AS (
              SELECT doc_id, lang, len(t) AS n,
                     list_sum(list_transform(t, x ->
                       (('0x' || substr(md5('qlin#' ||
                            (('0x' || substr(md5(x), 1, 8))::UBIGINT
                             % 1024)),
                          1, 8))::UBIGINT % 2000001)::DOUBLE / 1e6
                       - 1.0)) AS total
              FROM s),
            scored AS (
              SELECT doc_id, lang,
                     round(1.0 / (1.0 + exp(-(total / n))), 6) AS q
              FROM sc WHERE n > 0)
            SELECT lang, least(floor(q * 10), 9)::INT AS decile,
                   count(*)::BIGINT AS n_docs,
                   round(avg(q), 6) AS avg_score
            FROM scored GROUP BY lang, decile ORDER BY lang, decile
        """,
        "ccnet_buckets": f"""
            WITH toks AS (
              SELECT doc_id, lang,
                     unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents),
            dt AS (
              SELECT doc_id, lang, tok, count(*) AS c
              FROM toks WHERE length(tok) > 0
              GROUP BY doc_id, lang, tok),
            vocab AS (SELECT tok, sum(c) AS cw FROM dt GROUP BY tok),
            total AS (SELECT sum(cw) AS nt FROM vocab),
            sc AS (
              SELECT doc_id, lang,
                     round(sum(c * -log2(cw / nt)) / sum(c), 6) AS ms
              FROM dt JOIN vocab USING (tok) CROSS JOIN total
              GROUP BY doc_id, lang),
            b AS (
              SELECT lang,
                     (ntile(3) OVER (PARTITION BY lang
                                     ORDER BY ms, doc_id))::INT
                       AS ppl_bucket,
                     ms
              FROM sc)
            SELECT lang, ppl_bucket, count(*)::BIGINT AS n_docs,
                   round(avg(ms), 6) AS avg_surprisal
            FROM b GROUP BY lang, ppl_bucket ORDER BY lang, ppl_bucket
        """,
        "crosscorpus_join": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            bench AS (
              SELECT doc_id AS probe_id,
                     array_to_string(
                       t[1:greatest((len(t) * 3) // 4, 1)], ' ') AS ptext
              FROM toks WHERE doc_id % 97 = 3),
            bt AS (SELECT probe_id, string_split(ptext, ' ') AS t
                   FROM bench),
            dsh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 1),
                              i -> array_to_string(t[i:i+2], ' '))
                  END) AS shingle
                FROM toks)),
            bsh AS (
              SELECT DISTINCT probe_id, shingle FROM (
                SELECT probe_id, unnest(
                  CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 1),
                              i -> array_to_string(t[i:i+2], ' '))
                  END) AS shingle
                FROM bt)),
            dsz AS (SELECT doc_id, count(*)::DOUBLE AS sz
                    FROM dsh GROUP BY 1),
            bsz AS (SELECT probe_id, count(*)::DOUBLE AS sz
                    FROM bsh GROUP BY 1),
            inter AS (
              SELECT d.doc_id, b.probe_id, count(*)::DOUBLE AS i
              FROM dsh d JOIN bsh b USING (shingle)
              GROUP BY 1, 2)
            SELECT inter.doc_id, inter.probe_id,
                   round(i / (dsz.sz + bsz.sz - i), 6) AS jaccard
            FROM inter
            JOIN dsz ON dsz.doc_id = inter.doc_id
            JOIN bsz ON bsz.probe_id = inter.probe_id
            WHERE round(i / (dsz.sz + bsz.sz - i), 6) >= 0.6
            ORDER BY inter.doc_id, inter.probe_id
        """,
        "script_mix": _script_mix_sql(),
        "corpus_split": _corpus_split_sql(),
        "host_reputation": f"""
            WITH scored AS (
              SELECT 'host' || (doc_id % 50) AS host,
                     {_QUALITY_SQL} AS quality
              FROM documents),
            agg AS (
              SELECT host, count(*)::BIGINT AS n_docs,
                     round(avg(quality), 6) AS avg_quality,
                     min(quality) AS min_quality,
                     max(quality) AS max_quality
              FROM scored GROUP BY host)
            SELECT host, n_docs, avg_quality, min_quality, max_quality,
                   (n_docs >= 5 AND avg_quality < 0.605) AS host_flagged
            FROM agg ORDER BY host
        """,
        "mojibake_scan": _mojibake_sql(),
        "numeric_corr": _numeric_corr_sql(),
        "bigram_surprisal": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            el AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
            grams AS (
              SELECT doc_id, unnest(
                list_transform(range(1, len(t)),
                               i -> array_to_string(t[i:i+1], ' ')))
                AS gram
              FROM el),
            dg AS (SELECT doc_id, gram, count(*) AS c
                   FROM grams GROUP BY 1, 2),
            bg AS (SELECT gram, sum(c) AS c12 FROM dg GROUP BY 1),
            ctx AS (SELECT string_split(gram, ' ')[1] AS w1,
                           sum(c12) AS c1
                    FROM bg GROUP BY 1),
            vocab AS (
              SELECT count(DISTINCT tok)::DOUBLE AS v FROM (
                SELECT string_split(gram, ' ')[1] AS tok FROM bg
                UNION
                SELECT string_split(gram, ' ')[2] FROM bg))
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                   round(sum(c * -log2((c12 + 0.5) / (c1 + 0.5 * v)))
                         / sum(c), 6) AS mean_bigram_surprisal
            FROM dg JOIN bg USING (gram)
            JOIN ctx ON ctx.w1 = string_split(dg.gram, ' ')[1]
            CROSS JOIN vocab
            GROUP BY doc_id
            ORDER BY mean_bigram_surprisal DESC, doc_id LIMIT 20
        """,
        "containment_pairs": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            exc AS (
              SELECT doc_id + 1000000 AS doc_id,
                     array_to_string(
                       t[1:greatest((len(t) * 3) // 5, 1)], ' ') AS text
              FROM toks WHERE doc_id % 89 = 4),
            corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id, text FROM exc),
            ct AS (
              SELECT doc_id,
                     string_split(regexp_replace(lower(trim(text)),
                                                 '\\s+', ' ', 'g'),
                                  ' ') AS t
              FROM corpus),
            sh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 1),
                              i -> array_to_string(t[i:i+2], ' '))
                  END) AS shingle
                FROM ct)),
            rare AS (SELECT shingle FROM sh
                     GROUP BY shingle HAVING count(*) <= 50),
            kept AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
            sz AS (SELECT doc_id, count(*)::DOUBLE AS s
                   FROM kept GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*)::BIGINT AS n_shared
              FROM kept a JOIN kept b USING (shingle)
              WHERE a.doc_id != b.doc_id GROUP BY 1, 2)
            SELECT id_a, id_b, n_shared,
                   round(n_shared / s, 6) AS containment
            FROM inter JOIN sz ON sz.doc_id = inter.id_a
            WHERE round(n_shared / s, 6) >= 0.9
            ORDER BY id_a, id_b
        """,
        "host_hits": _hits_sql(iters=4),
        "tfidf_terms": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
            dt AS (SELECT doc_id, term, count(*) AS c
                   FROM tok WHERE len(term) > 0 GROUP BY 1, 2),
            dfq AS (SELECT term, count(*) AS dfc FROM dt GROUP BY 1),
            nd AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs
                   FROM dt),
            dl AS (SELECT doc_id, sum(c)::DOUBLE AS dlen
                   FROM dt GROUP BY 1),
            scored AS (
              SELECT dt.doc_id, dt.term,
                     round((dt.c / dl.dlen)
                           * (ln((nd.n_docs + 1.0) / (dfq.dfc + 1.0))
                              + 1.0), 6) AS tfidf
              FROM dt JOIN dfq USING (term) JOIN dl USING (doc_id)
              CROSS JOIN nd)
            SELECT doc_id, rank, term, tfidf FROM (
              SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC) AS rank
              FROM scored)
            WHERE rank <= 5 ORDER BY doc_id, rank
        """,
        "paragraph_dedup": """
            WITH seeded AS (
              SELECT doc_id, concat_ws(chr(10),
                'subscribe to newsletter ' || (doc_id % 3)::VARCHAR,
                array_to_string(string_split(text, ' ')[1:8], ' '),
                CASE WHEN doc_id % 5 = 2 THEN '' END,
                CASE WHEN doc_id % 4 = 1
                     THEN array_to_string(string_split(text, ' ')[1:8],
                                          ' ') END,
                'copyright 2026 example corp') AS t
              FROM documents),
            sp AS (SELECT doc_id, string_split(t, chr(10)) AS paras
                   FROM seeded),
            occ AS (
              SELECT doc_id, unnest(paras) AS para,
                     unnest(range(0, len(paras))) AS pos
              FROM sp),
            first AS (
              SELECT para, min({'d': doc_id, 'p': pos}) AS w
              FROM occ WHERE trim(para) != '' GROUP BY 1),
            kept AS (
              SELECT occ.* FROM occ LEFT JOIN first USING (para)
              WHERE trim(para) = ''
                 OR (first.w['d'] = occ.doc_id
                     AND first.w['p'] = occ.pos)),
            rebuilt AS (
              SELECT doc_id, count(*)::BIGINT AS n_kept,
                     string_agg(para, chr(10) ORDER BY pos)
                       AS clean_text
              FROM kept GROUP BY 1)
            SELECT sp.doc_id, len(sp.paras)::INTEGER AS n_paragraphs,
                   coalesce(rebuilt.n_kept, 0)::BIGINT AS n_kept,
                   coalesce(rebuilt.clean_text, '') AS clean_text
            FROM sp LEFT JOIN rebuilt USING (doc_id)
            ORDER BY doc_id
        """,
        "pii_redact": _pii_redact_sql(),
        "zipf_profile": f"""
            WITH tok AS (
              SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents),
            vocab AS (SELECT tok, count(*) AS cw FROM tok
                      WHERE len(tok) > 0 GROUP BY 1),
            totals AS (SELECT count(*)::BIGINT AS n_vocab,
                              sum(cw)::BIGINT AS n_tokens FROM vocab),
            top AS (SELECT tok, cw FROM vocab
                    ORDER BY cw DESC, tok ASC LIMIT 1000),
            xy AS (
              SELECT ln(row_number() OVER (ORDER BY cw DESC, tok ASC)
                        ::DOUBLE) AS x,
                     ln(cw::DOUBLE) AS y
              FROM top),
            fit AS (SELECT count(*)::BIGINT AS n_ranks_fit,
                           covar_pop(x, y) / var_pop(x) AS slope,
                           corr(x, y) AS r FROM xy)
            SELECT n_vocab, n_tokens, n_ranks_fit,
                   round(slope, 6) AS zipf_slope,
                   round(r * r, 6) AS zipf_r2
            FROM fit CROSS JOIN totals
        """,
        "domain_blocklist": _domain_blocklist_sql(),
        "oov_rate": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
            dt AS (SELECT doc_id, tok, count(*) AS c
                   FROM tok WHERE len(tok) > 0 GROUP BY 1, 2),
            vocab AS (
              SELECT tok FROM (
                SELECT tok, sum(c) AS cw FROM dt GROUP BY 1
                ORDER BY cw DESC, tok ASC LIMIT 20)),
            agg AS (
              SELECT dt.doc_id, sum(dt.c)::BIGINT AS n_tokens,
                     sum(CASE WHEN v.tok IS NULL THEN dt.c
                              ELSE 0 END)::BIGINT AS n_oov
              FROM dt LEFT JOIN vocab v USING (tok) GROUP BY 1)
            SELECT doc_id, n_tokens, n_oov,
                   round(n_oov / n_tokens::DOUBLE, 6) AS oov_rate
            FROM agg ORDER BY doc_id
        """,
        "punct_normalize": _punct_normalize_sql(),
        "path_templates": """
            WITH seeded AS (
              SELECT doc_id,
                     'http://host' || (doc_id % 20)::VARCHAR
                     || '.example'
                     || CASE WHEN doc_id % 10 < 2 THEN '/about'
                             ELSE '/item/' || doc_id::VARCHAR || '/view'
                        END AS url
              FROM documents)
            SELECT lower(regexp_extract(url,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS host,
                   regexp_replace(
                     regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                     '[0-9]+', '{N}', 'g') AS path_template,
                   count(DISTINCT url)::BIGINT AS n_urls,
                   count(DISTINCT url) >= 5 AS trap
            FROM seeded GROUP BY 1, 2 ORDER BY host, path_template
        """,
        "sq_ann": """
            WITH c AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            sc AS (
              SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x))) / 127.0
                       AS s
              FROM c),
            q AS (
              SELECT vec_id,
                     CASE WHEN s > 0
                          THEN list_transform(v, x -> round(x / s))
                          ELSE list_transform(v, x -> 0.0) END AS qv
              FROM sc),
            n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nn
                  FROM q),
            scored AS (
              SELECT a.vec_id AS query_id, b.vec_id,
                     round(list_dot_product(a.qv, b.qv)
                           / sqrt(a.nn * b.nn), 6) AS q_cosine
              FROM n a JOIN n b ON a.vec_id < 3
                                AND b.vec_id != a.vec_id
              WHERE a.nn > 0 AND b.nn > 0)
            SELECT query_id, rank, vec_id, q_cosine FROM (
              SELECT *, row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY q_cosine DESC, vec_id ASC) AS rank
              FROM scored)
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "js_drift": """
            WITH counts AS (
              SELECT source, lang, count(*) AS c
              FROM documents GROUP BY 1, 2),
            p AS (
              SELECT source, lang,
                     c / sum(c) OVER (PARTITION BY source) AS p
              FROM counts),
            shared AS (
              SELECT a.source AS g_a, b.source AS g_b,
                     sum(a.p * log2(2.0 * a.p / (a.p + b.p))
                         + b.p * log2(2.0 * b.p / (a.p + b.p))) AS t,
                     sum(a.p) AS sa, sum(b.p) AS sb
              FROM p a JOIN p b
                ON a.lang IS NOT DISTINCT FROM b.lang
                AND a.source < b.source
              GROUP BY 1, 2),
            g AS (SELECT DISTINCT source FROM documents),
            pairs AS (
              SELECT ga.source AS g_a, gb.source AS g_b
              FROM g ga, g gb WHERE ga.source < gb.source)
            SELECT g_a, g_b,
                   round(0.5 * coalesce(t, 0)
                         + 0.5 * (1 - coalesce(sa, 0))
                         + 0.5 * (1 - coalesce(sb, 0)), 6)
                     AS js_divergence
            FROM pairs LEFT JOIN shared USING (g_a, g_b)
            ORDER BY g_a, g_b
        """,
        "token_windows": f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split({_NORM_SQL}, ' '),
                                 t -> len(t) > 0) AS t
              FROM documents),
            nz AS (SELECT doc_id, t, len(t) AS n FROM toks
                   WHERE len(t) > 0),
            grids AS (
              SELECT doc_id, t,
                     CASE WHEN (greatest(n - 31, 1) - 1) % 16 = 0
                          THEN range(1, greatest(n - 31, 1) + 1, 16)
                          ELSE list_append(
                                 range(1, greatest(n - 31, 1) + 1, 16),
                                 greatest(n - 31, 1))
                     END AS starts
              FROM nz),
            st AS (
              SELECT doc_id, t,
                     unnest(range(0, len(starts))) AS win_idx,
                     unnest(starts) AS start
              FROM grids)
            SELECT doc_id, win_idx,
                   len(t[start:start + 31])::INTEGER AS win_tokens,
                   array_to_string(t[start:start + 31], ' ')
                     AS window_text
            FROM st ORDER BY doc_id, win_idx
        """,
        "dup_paras": """
            WITH seeded AS (
              SELECT doc_id, concat_ws(chr(10),
                array_to_string(string_split(text, ' ')[1:8], ' '),
                'meta ' || (doc_id % 5)::VARCHAR,
                CASE WHEN doc_id % 2 = 0
                     THEN array_to_string(string_split(text, ' ')[1:8],
                                          ' ') END,
                CASE WHEN doc_id % 7 = 3 THEN '' END) AS t
              FROM documents),
            paras AS (
              SELECT doc_id,
                     list_filter(string_split(t, chr(10)),
                                 p -> trim(p) != '') AS ps
              FROM seeded),
            m AS (
              SELECT doc_id, len(ps)::INTEGER AS n_paras,
                     (len(ps) - len(list_distinct(ps)))::INTEGER
                       AS n_dup_paras,
                     coalesce(list_aggregate(
                       list_transform(ps, p -> length(p)), 'sum'), 0)
                       AS c_all,
                     coalesce(list_aggregate(
                       list_transform(list_distinct(ps),
                                      p -> length(p)), 'sum'), 0)
                       AS c_uniq
              FROM paras)
            SELECT doc_id, n_paras, n_dup_paras,
                   CASE WHEN n_paras > 0
                        THEN round(n_dup_paras / n_paras::DOUBLE, 6)
                        ELSE 0.0 END AS dup_para_frac,
                   CASE WHEN c_all > 0
                        THEN round((c_all - c_uniq) / c_all::DOUBLE, 6)
                        ELSE 0.0 END AS dup_para_char_frac
            FROM m ORDER BY doc_id
        """,
        "centroid_drift": """
            WITH c AS (
              SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
            comp AS (
              SELECT label, i, round(avg(v[i]), 9) AS m
              FROM c, range(1, 65) r(i) GROUP BY 1, 2),
            cent AS (
              SELECT label, list(m ORDER BY i) AS cv FROM comp
              GROUP BY 1),
            n AS (SELECT label, cv, list_dot_product(cv, cv) AS nn
                  FROM cent)
            SELECT a.label AS g_a, b.label AS g_b,
                   CASE WHEN a.nn > 0 AND b.nn > 0
                        THEN round(list_dot_product(a.cv, b.cv)
                                   / sqrt(a.nn * b.nn), 6)
                   END AS centroid_cosine
            FROM n a JOIN n b ON a.label < b.label
            ORDER BY g_a, g_b
        """,
        "recency_weights": """
            WITH mx AS (SELECT max(ts) AS mt FROM events),
            w AS (
              SELECT event_type,
                     pow(0.5, ((epoch(mt) - epoch(ts)) / 86400.0)
                              / 7.0) AS wraw
              FROM events CROSS JOIN mx)
            SELECT event_type, count(*)::BIGINT AS n_events,
                   round(sum(round(wraw, 6)), 4) AS sum_weight,
                   round(min(round(wraw, 6)), 6) AS min_weight,
                   round(max(round(wraw, 6)), 6) AS max_weight
            FROM w GROUP BY event_type ORDER BY event_type
        """,
        "degree_stats": """
            WITH e AS (
              SELECT DISTINCT doc_id % 37 AS s,
                     (doc_id * 11 + 3) % 37 AS d
              FROM documents WHERE doc_id % 37 < 33
              UNION
              SELECT DISTINCT doc_id % 37, (doc_id * 5 + 17) % 37
              FROM documents WHERE doc_id % 37 < 33),
            ee AS (SELECT s, d FROM e WHERE s != d),
            o AS (SELECT s AS node, count(*)::BIGINT AS out_deg
                  FROM ee GROUP BY 1),
            i AS (SELECT d AS node, count(*)::BIGINT AS in_deg
                  FROM ee GROUP BY 1),
            r AS (
              SELECT a.s AS node, count(*)::BIGINT AS n_reciprocal
              FROM ee a JOIN ee b ON a.s = b.d AND a.d = b.s
              GROUP BY 1)
            SELECT coalesce(o.node, i.node) AS node,
                   coalesce(out_deg, 0) AS out_deg,
                   coalesce(in_deg, 0) AS in_deg,
                   coalesce(n_reciprocal, 0) AS n_reciprocal,
                   CASE WHEN coalesce(out_deg, 0) > 0
                        THEN round(coalesce(n_reciprocal, 0)
                                   / out_deg::DOUBLE, 6)
                        ELSE 0.0 END AS reciprocity
            FROM o FULL JOIN i ON o.node = i.node
            LEFT JOIN r ON coalesce(o.node, i.node) = r.node
            ORDER BY node
        """,
        "heaps_fit": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            tok AS (
              SELECT doc_id, unnest(t) AS tok FROM toks),
            tk AS (SELECT doc_id, tok FROM tok WHERE len(tok) > 0),
            first AS (SELECT tok, min(doc_id) AS f FROM tk GROUP BY 1),
            per_doc AS (SELECT doc_id, count(*) AS c FROM tk
                        GROUP BY 1),
            rng AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi
                    FROM per_doc),
            bounds AS (
              SELECT DISTINCT
                     lo + floor((hi - lo) * i / 20)::BIGINT AS b
              FROM rng, range(1, 21) r(i)),
            v AS (SELECT b, count(*) AS v FROM bounds, first
                  WHERE f <= b GROUP BY 1),
            t AS (SELECT b, sum(c) AS t FROM bounds, per_doc
                  WHERE doc_id <= b GROUP BY 1),
            xy AS (SELECT ln(t.t::DOUBLE) AS x, ln(v.v::DOUBLE) AS y
                   FROM v JOIN t USING (b)),
            fit AS (
              SELECT count(*)::BIGINT AS n_points_fit,
                     covar_pop(x, y) / var_pop(x) AS beta,
                     avg(y) - covar_pop(x, y) / var_pop(x) * avg(x)
                       AS lnk
              FROM xy),
            totals AS (
              SELECT count(DISTINCT tok)::BIGINT AS n_vocab,
                     count(*)::BIGINT AS n_tokens FROM tk)
            SELECT n_vocab, n_tokens, n_points_fit,
                   round(beta, 6) AS heaps_beta,
                   round(exp(lnk), 6) AS heaps_k
            FROM fit CROSS JOIN totals
        """,
        "link_graph": _link_graph_sql(),
        "pmi_bigrams": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            el AS (SELECT t FROM toks WHERE len(t) >= 2),
            grams AS (
              SELECT unnest(
                list_transform(range(1, len(t)),
                               i -> array_to_string(t[i:i+1], ' ')))
                AS bigram
              FROM el),
            big AS (SELECT bigram, count(*) AS c FROM grams
                    GROUP BY 1),
            w1 AS (SELECT string_split(bigram, ' ')[1] AS w,
                          sum(c) AS c1 FROM big GROUP BY 1),
            w2 AS (SELECT string_split(bigram, ' ')[2] AS w,
                          sum(c) AS c2 FROM big GROUP BY 1),
            tot AS (SELECT sum(c) AS n FROM big)
            SELECT bigram, c,
                   round(log2((c::DOUBLE * n::DOUBLE)
                              / (c1::DOUBLE * c2::DOUBLE)), 6) AS pmi
            FROM big
            JOIN w1 ON w1.w = string_split(big.bigram, ' ')[1]
            JOIN w2 ON w2.w = string_split(big.bigram, ' ')[2]
            CROSS JOIN tot
            WHERE c >= 5
            ORDER BY pmi DESC, bigram ASC LIMIT 40
        """,
        "host_concentration": """
            WITH seeded AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 31 = 7 THEN NULL
                          WHEN doc_id % 4 < 2 THEN 'bighost.example'
                          ELSE 'host' || (doc_id % 25)::VARCHAR
                               || '.example' END AS host
              FROM documents),
            counts AS (
              SELECT host, count(*) AS c FROM seeded
              WHERE host IS NOT NULL AND host != '' GROUP BY 1),
            totals AS (SELECT count(*)::BIGINT AS n_hosts,
                              sum(c)::BIGINT AS n_docs FROM counts),
            topk AS (
              SELECT sum(c) AS top FROM (
                SELECT c FROM counts
                ORDER BY c DESC, host ASC LIMIT 5)),
            hhi AS (
              SELECT round(sum(pow(c / n_docs::DOUBLE, 2)), 6) AS hhi
              FROM counts CROSS JOIN totals)
            SELECT n_hosts, n_docs, hhi,
                   round(top / n_docs::DOUBLE, 6) AS topk_share
            FROM totals CROSS JOIN hhi CROSS JOIN topk
        """,
        "ann_recall": """
            WITH c AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            sc AS (
              SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x))) / 127.0
                       AS s
              FROM c),
            q AS (
              SELECT vec_id,
                     CASE WHEN s > 0
                          THEN list_transform(v, x -> round(x / s))
                          ELSE list_transform(v, x -> 0.0) END AS qv
              FROM sc),
            n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS nn
                  FROM q),
            sq AS (
              SELECT query_id, vec_id FROM (
                SELECT a.vec_id AS query_id, b.vec_id,
                       row_number() OVER (
                         PARTITION BY a.vec_id
                         ORDER BY round(list_dot_product(a.qv, b.qv)
                                        / sqrt(a.nn * b.nn), 6) DESC,
                                  b.vec_id ASC) AS rank
                FROM n a JOIN n b ON a.vec_id < 3
                                  AND b.vec_id != a.vec_id
                WHERE a.nn > 0 AND b.nn > 0)
              WHERE rank <= 5),
            ex AS (
              SELECT query_id, vec_id FROM (
                SELECT a.vec_id AS query_id, b.vec_id,
                       row_number() OVER (
                         PARTITION BY a.vec_id
                         ORDER BY round(list_cosine_similarity(
                                          b.v, a.v), 6) DESC,
                                  b.vec_id ASC) AS rank
                FROM c a JOIN c b ON a.vec_id < 3
                                  AND b.vec_id != a.vec_id)
              WHERE rank <= 5)
            SELECT ex.query_id,
                   count(*)::BIGINT AS n_exact,
                   sum(CASE WHEN sq.vec_id IS NOT NULL
                            THEN 1 ELSE 0 END)::BIGINT AS n_hit,
                   round(sum(CASE WHEN sq.vec_id IS NOT NULL
                                  THEN 1 ELSE 0 END)
                         / count(*)::DOUBLE, 6) AS recall
            FROM ex LEFT JOIN sq USING (query_id, vec_id)
            GROUP BY ex.query_id ORDER BY ex.query_id
        """,
        "token_entropy": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
            dt AS (SELECT doc_id, tok, count(*) AS c
                   FROM tok WHERE len(tok) > 0 GROUP BY 1, 2),
            agg AS (
              SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                     count(*)::BIGINT AS n_types,
                     sum(c * log2(c)) AS clogc
              FROM dt GROUP BY 1)
            SELECT doc_id, n_tokens, n_types,
                   round(n_types / n_tokens::DOUBLE, 6)
                     AS type_token_ratio,
                   round(log2(n_tokens) - clogc / n_tokens, 6)
                     AS token_entropy
            FROM agg ORDER BY doc_id
        """,
        "sentence_stats": """
            WITH seeded AS (
              SELECT doc_id,
                     array_to_string(
                       list_transform(
                         range(1, least(len(string_split(text, ' ')),
                                        27) + 1),
                         i -> string_split(text, ' ')[i]
                              || CASE WHEN i % 9 = 0 THEN '.'
                                      ELSE '' END), ' ')
                     || CASE WHEN doc_id % 3 = 0
                             THEN ' trailing no punct' ELSE '' END AS t
              FROM documents),
            sp AS (
              SELECT doc_id, t,
                     list_filter(string_split_regex(t, '[.!?]+'),
                                 s -> trim(s) != '') AS sents
              FROM seeded),
            wc AS (
              SELECT doc_id, t, len(sents) AS n,
                     list_transform(sents,
                       s -> len(list_filter(
                              string_split_regex(trim(s), '\\s+'),
                              w -> len(w) > 0))) AS wcs
              FROM sp)
            SELECT doc_id, n::INTEGER AS n_sentences,
                   CASE WHEN n > 0 THEN round(
                     coalesce(list_aggregate(wcs, 'sum'), 0)
                     / n::DOUBLE, 6) ELSE 0.0 END
                     AS mean_sentence_words,
                   CASE WHEN n > 0 THEN round(
                     len(list_filter(wcs, x -> x > 8)) / n::DOUBLE, 6)
                     ELSE 0.0 END AS frac_long_sentences,
                   regexp_matches(rtrim(t), '[.!?]$') AS ends_terminal
            FROM wc ORDER BY doc_id
        """,
        "boiler_phrases": _boiler_phrases_sql(),
        "trigram_surprisal": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            el AS (SELECT doc_id, t FROM toks WHERE len(t) >= 3),
            grams AS (
              SELECT doc_id, unnest(
                list_transform(range(1, len(t) - 1),
                               i -> array_to_string(t[i:i+2], ' ')))
                AS gram
              FROM el),
            dg AS (SELECT doc_id, gram, count(*) AS c
                   FROM grams GROUP BY 1, 2),
            tri AS (SELECT gram, sum(c) AS c123 FROM dg GROUP BY 1),
            pre AS (SELECT array_to_string(
                             string_split(gram, ' ')[1:2], ' ') AS w12,
                           sum(c123) AS c12 FROM tri GROUP BY 1),
            suf AS (SELECT array_to_string(
                             string_split(gram, ' ')[2:3], ' ') AS w23,
                           sum(c123) AS c23 FROM tri GROUP BY 1),
            mid AS (SELECT string_split(gram, ' ')[2] AS w2,
                           sum(c123) AS c2 FROM tri GROUP BY 1),
            uni AS (SELECT string_split(gram, ' ')[3] AS w3,
                           sum(c123) AS c3 FROM tri GROUP BY 1),
            tot AS (SELECT sum(c123) AS n FROM tri)
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
                   round(sum(c * -log2(
                       0.6 * c123 / c12 + 0.3 * c23 / c2
                       + 0.1 * c3 / n)) / sum(c), 6)
                     AS mean_trigram_surprisal
            FROM dg
            JOIN tri USING (gram)
            JOIN pre ON pre.w12 = array_to_string(
                          string_split(dg.gram, ' ')[1:2], ' ')
            JOIN suf ON suf.w23 = array_to_string(
                          string_split(dg.gram, ' ')[2:3], ' ')
            JOIN mid ON mid.w2 = string_split(dg.gram, ' ')[2]
            JOIN uni ON uni.w3 = string_split(dg.gram, ' ')[3]
            CROSS JOIN tot
            GROUP BY doc_id
            ORDER BY mean_trigram_surprisal DESC, doc_id LIMIT 20
        """,
        "cluster_sizes": f"""
            WITH clus AS ({_dedup_clusters_sql(0.8)}),
            sizes AS (
              SELECT cluster_id, count(*) AS cluster_size
              FROM clus GROUP BY 1)
            SELECT cluster_size,
                   count(*)::BIGINT AS n_clusters,
                   sum(cluster_size)::BIGINT AS n_docs
            FROM sizes GROUP BY 1 ORDER BY cluster_size
        """,
        "image_dhash": """
            WITH c AS (
              SELECT doc_id % 5 AS variant, count(*)::BIGINT AS n_docs
              FROM documents GROUP BY 1),
            k AS (SELECT * FROM (VALUES
                    (0, 8, 4, 0),
                    (1, 5, 5, 0),
                    (2, 6, 2, 0),
                    (3, 9, 8, -6148914691236517206),
                    (4, 18, 8, -1)) t(variant, w, h, dh))
            SELECT c.variant, n_docs, w, h,
                   dh::BIGINT AS dhash_min, dh::BIGINT AS dhash_max
            FROM c JOIN k USING (variant) ORDER BY c.variant
        """,
        "lpa_communities": _lpa_sql(iters=3),
        "shuffle_shards": """
            WITH k AS (
              SELECT doc_id,
                     md5('r4:' || doc_id::VARCHAR) AS key
              FROM documents),
            s AS (
              SELECT doc_id, key,
                     (('0x' || substr(key, 1, 15))::UBIGINT % 8)
                       ::BIGINT AS shard
              FROM k)
            SELECT doc_id, shard,
                   row_number() OVER (PARTITION BY shard
                                      ORDER BY key, doc_id)
                     AS shard_pos
            FROM s ORDER BY shard, shard_pos
        """,
        "epoch_factors": """
            WITH counts AS (
              SELECT lang, count(*) AS n_rows FROM documents
              GROUP BY 1),
            tot AS (SELECT sum(n_rows) AS n FROM counts),
            recipe AS (SELECT * FROM (VALUES
                ('de', 0.2::DOUBLE), ('en', 0.5::DOUBLE),
                ('zh', 0.3::DOUBLE)) t(lang, target_share))
            SELECT c.lang, n_rows::BIGINT AS n_rows, r.target_share,
                   CASE WHEN r.target_share IS NOT NULL
                        THEN greatest(1, ceil(r.target_share * n * 1.0
                                              / n_rows)::BIGINT)
                        ELSE 1 END AS epoch_factor,
                   CASE WHEN r.target_share IS NOT NULL
                        THEN greatest(1, ceil(r.target_share * n * 1.0
                                              / n_rows)::BIGINT)
                        ELSE 1 END * n_rows AS effective_rows
            FROM counts c LEFT JOIN recipe r USING (lang)
            CROSS JOIN tot ORDER BY c.lang
        """,
        "benford_prices": _benford_sql("l_extendedprice", "lineitem"),
        "triangle_profile": """
            WITH g AS (SELECT doc_id % 12 AS g FROM documents),
            e0 AS (
              SELECT g AS s, (g + 1) % 12 AS d FROM g
              UNION ALL SELECT g, (g + 2) % 12 FROM g
              UNION ALL SELECT g, (g * 7 + 3) % 12 FROM g),
            canon AS (
              SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v
              FROM e0 WHERE s != d),
            tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM canon e1
              JOIN canon e2 ON e2.u = e1.v
              JOIN canon e3 ON e3.u = e1.u AND e3.v = e2.v),
            corners AS (
              SELECT node, count(*) AS n_tri FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri) GROUP BY 1),
            deg AS (
              SELECT node, count(*) AS degree FROM (
                SELECT u AS node FROM canon
                UNION ALL SELECT v FROM canon) GROUP BY 1)
            SELECT deg.node, degree,
                   coalesce(n_tri, 0)::BIGINT AS n_triangles,
                   CASE WHEN degree >= 2 THEN
                     round(2.0 * coalesce(n_tri, 0)
                           / (degree * (degree - 1)), 6)
                   ELSE 0.0 END AS clustering
            FROM deg LEFT JOIN corners USING (node) ORDER BY node
        """,
        "lang_source_chi2": """
            WITH base AS (
              SELECT lang AS a, source AS b FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL),
            obs AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
            ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY 1),
            cb AS (SELECT b, sum(o) AS cb FROM obs GROUP BY 1),
            tot AS (SELECT sum(o) AS n FROM obs),
            cells AS (
              SELECT ra.a, cb.b, ra, cb, coalesce(o, 0) AS o, n
              FROM ra CROSS JOIN cb
              LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b
              CROSS JOIN tot),
            s AS (
              SELECT sum(pow(o - ra * cb / n, 2) / (ra * cb / n))
                       AS chi2,
                     count(DISTINCT a) - 1 AS da,
                     count(DISTINCT b) - 1 AS db,
                     max(n) AS n_rows
              FROM cells)
            SELECT round(chi2, 6) AS chi2, (da * db)::BIGINT AS dof,
                   n_rows::BIGINT AS n_rows,
                   round(sqrt(chi2 / (n_rows * least(da, db))), 6)
                     AS cramers_v
            FROM s
        """,
        "vocab_coverage": f"""
            WITH toks AS (
              SELECT unnest(string_split({_NORM_SQL}, ' ')) AS token
              FROM documents),
            counts AS (
              SELECT token, count(*) AS n FROM toks
              WHERE token != '' GROUP BY 1),
            tot AS (SELECT sum(n) AS total FROM counts),
            ranked AS (
              SELECT n, row_number() OVER (
                       ORDER BY n DESC, token ASC) AS rnk
              FROM counts),
            th AS (SELECT * FROM (VALUES (16), (256), (4096))
                   t(vocab_size))
            SELECT vocab_size,
                   sum(n)::BIGINT AS covered_tokens,
                   max(total)::BIGINT AS total_tokens,
                   round(sum(n) / max(total)::DOUBLE, 6) AS coverage
            FROM th JOIN ranked ON rnk <= vocab_size CROSS JOIN tot
            GROUP BY 1 ORDER BY vocab_size
        """,
        "source_lang_entropy": """
            WITH counts AS (
              SELECT source, lang, count(*) AS c FROM documents
              WHERE source IS NOT NULL GROUP BY 1, 2)
            SELECT source, sum(c)::BIGINT AS n_rows,
                   count(*)::BIGINT AS n_cats,
                   round(log2(sum(c))
                         - sum(c * log2(c)) / sum(c), 6) AS entropy
            FROM counts GROUP BY 1 ORDER BY source
        """,
        "assortativity": """
            WITH g AS (SELECT doc_id % 24 AS g, doc_id FROM documents),
            e0 AS (
              SELECT g AS s, (g + 1) % 24 AS d FROM g
              UNION ALL
              SELECT g, (g + 2) % 24 FROM g WHERE doc_id % 2 = 0),
            e AS (SELECT s, d FROM e0 WHERE s != d),
            sym AS (
              SELECT DISTINCT a, b FROM (
                SELECT s AS a, d AS b FROM e
                UNION ALL SELECT d, s FROM e)),
            deg AS (SELECT a AS node, count(*) AS d FROM sym
                    GROUP BY 1),
            p AS (
              SELECT dx.d AS x, dy.d AS y FROM sym
              JOIN deg dx ON sym.a = dx.node
              JOIN deg dy ON sym.b = dy.node),
            s AS (
              SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
                     sum(x * y) AS sxy, sum(x * x) AS sxx,
                     sum(y * y) AS syy
              FROM p)
            SELECT (m / 2)::BIGINT AS n_edges,
                   CASE WHEN m * sxx - sx * sx > 0
                         AND m * syy - sy * sy > 0 THEN
                     round((m * sxy - sx * sy)
                           / sqrt((m * sxx - sx * sx)::DOUBLE
                                  * (m * syy - sy * sy)), 6)
                   END AS assortativity
            FROM s
        """,
        "kcore_profile": _kcore_sql(k=3, rounds=4),
        "silhouette_labels": """
            WITH c AS (
              SELECT vec_id, label, embedding::DOUBLE[] AS v
              FROM embeddings),
            comp AS (
              SELECT label AS gl, i, round(avg(v[i]), 9) AS m
              FROM c, range(1, 65) r(i) GROUP BY 1, 2),
            cent AS (
              SELECT gl, list(m ORDER BY i) AS cv FROM comp
              GROUP BY 1),
            cn AS (SELECT gl, cv, sqrt(list_dot_product(cv, cv)) AS nc
                   FROM cent),
            pn AS (SELECT vec_id, label, v,
                          sqrt(list_dot_product(v, v)) AS nv
                   FROM c),
            d AS (
              SELECT vec_id, label, gl,
                     1.0 - list_dot_product(v, cv) / (nv * nc) AS dist
              FROM pn CROSS JOIN cn WHERE nv > 0 AND nc > 0),
            per AS (
              SELECT vec_id, label,
                     min(CASE WHEN gl = label THEN dist END) AS a,
                     min(CASE WHEN gl != label THEN dist END) AS b
              FROM d GROUP BY 1, 2),
            per2 AS (
              SELECT label,
                     round(a * 1e6)::BIGINT AS ra,
                     round(b * 1e6)::BIGINT AS rb,
                     round((CASE WHEN greatest(a, b) > 0
                                 THEN (b - a) / greatest(a, b)
                                 ELSE 0.0 END) * 1e6)::BIGINT AS s
              FROM per WHERE a IS NOT NULL AND b IS NOT NULL)
            SELECT label, count(*)::BIGINT AS n_points,
                   round(sum(ra) / 1e6 / count(*), 6) AS mean_a,
                   round(sum(rb) / 1e6 / count(*), 6) AS mean_b,
                   round(sum(s) / 1e6 / count(*), 6)
                     AS mean_silhouette
            FROM per2 GROUP BY 1 ORDER BY label
        """,
        "lang_fertility": """
            WITH s AS (
              SELECT lang, count(*) AS n_docs,
                     sum(strlen(text)) AS b,
                     sum(length(text)) AS c,
                     sum(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text),
                                                     '\\s+')) END) AS t
              FROM documents GROUP BY 1)
            SELECT lang, n_docs::BIGINT AS n_docs,
                   coalesce(t, 0)::BIGINT AS n_tokens,
                   CASE WHEN c > 0
                        THEN round(b / c::DOUBLE, 6) END
                     AS bytes_per_char,
                   CASE WHEN t > 0
                        THEN round(c / t::DOUBLE, 6) END
                     AS chars_per_token,
                   CASE WHEN t > 0
                        THEN round(b / t::DOUBLE, 6) END
                     AS bytes_per_token
            FROM s ORDER BY lang
        """,
        "html_strip_report": f"""
            WITH seeded AS (
              SELECT source,
                CASE WHEN doc_id % 3 = 0
                     THEN '{_HTML_WRAP_PRE}' || text
                          || '{_HTML_WRAP_POST}'
                     ELSE text END AS t
              FROM documents),
            p AS (
              SELECT source, t,
                trim(regexp_replace(
                  replace(replace(replace(replace(replace(replace(
                    regexp_replace(regexp_replace(regexp_replace(t,
                      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                      '(?s)<[^>]*>', ' ', 'g'),
                    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                    '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
                  '\\s+', ' ', 'g')) AS plain
              FROM seeded)
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(length(t))::BIGINT AS raw_chars,
                   sum(length(plain))::BIGINT AS plain_chars,
                   round(sum(length(plain))
                         / sum(length(t)), 6) AS kept
            FROM p GROUP BY 1 ORDER BY source
        """,
        "retention_weeks": """
            WITH base AS (
              SELECT user_id, ts FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            f AS (
              SELECT user_id, date_trunc('week', min(ts)) AS cw
              FROM base GROUP BY 1),
            act AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS w
              FROM base),
            j AS (SELECT act.user_id, w, cw
                  FROM act JOIN f USING (user_id))
            SELECT cw::DATE AS cohort_week,
                   (date_diff('day', cw, w) / 7)::INT AS week_offset,
                   count(DISTINCT user_id)::BIGINT AS n_users
            FROM j GROUP BY 1, 2 ORDER BY cohort_week, week_offset
        """,
        "tld_mix": """
            WITH seeded AS (
              SELECT 'http://' ||
                CASE WHEN doc_id % 7 = 0 THEN 'localhost'
                     WHEN doc_id % 5 = 0
                       THEN 'h' || (doc_id % 9)::VARCHAR || '.test.org'
                     ELSE 'h' || (doc_id % 9)::VARCHAR || '.example'
                END || '/p/' || doc_id::VARCHAR AS url
              FROM documents),
            h AS (
              SELECT lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                     AS host
              FROM seeded WHERE url IS NOT NULL),
            t AS (
              SELECT regexp_extract(host, '([^.]+)$', 1) AS tld, host
              FROM h),
            c AS (
              SELECT tld, count(*) AS n_urls,
                     count(DISTINCT host) AS n_hosts
              FROM t WHERE tld != '' GROUP BY 1)
            SELECT tld, n_urls::BIGINT AS n_urls,
                   n_hosts::BIGINT AS n_hosts,
                   round(n_urls / sum(n_urls) OVER (), 6) AS share
            FROM c ORDER BY tld
        """,
        "word_len_mix": f"""
            WITH toks AS (
              SELECT lang,
                     unnest(string_split({_NORM_SQL}, ' ')) AS token
              FROM documents),
            c AS (
              SELECT lang, least(length(token), 12) AS word_len,
                     count(*) AS n_words
              FROM toks WHERE token != '' GROUP BY 1, 2)
            SELECT lang, word_len, n_words::BIGINT AS n_words,
                   round(n_words / sum(n_words)
                         OVER (PARTITION BY lang), 6) AS share
            FROM c ORDER BY lang, word_len
        """,
        "mutual_knn": """
            WITH c AS (
              SELECT vec_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id < 300),
            scored AS (
              SELECT q.vec_id AS a, e.vec_id AS b,
                     round(list_dot_product(e.v, q.v)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(q.v, q.v))), 6)
                       AS cosine
              FROM c q JOIN c e ON e.vec_id != q.vec_id),
            ranked AS (
              SELECT a, b, cosine,
                     row_number() OVER (PARTITION BY a
                                        ORDER BY cosine DESC, b ASC)
                       AS rnk
              FROM scored),
            top AS (SELECT a, b, cosine FROM ranked WHERE rnk <= 5)
            SELECT t.a AS id_a, t.b AS id_b, t.cosine
            FROM top t JOIN top r ON r.a = t.b AND r.b = t.a
            WHERE t.a < t.b ORDER BY id_a, id_b
        """,
        "prefix_dups": f"""
            WITH seeded AS (
              SELECT doc_id,
                CASE WHEN doc_id % 7 < 2 THEN
                  repeat('head' || (doc_id % 5)::VARCHAR || ' tok ', 20)
                    || text
                ELSE text END AS text
              FROM documents),
            toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM seeded),
            keyed AS (
              SELECT doc_id,
                     md5(array_to_string(t[1:32], ' ')) AS prefix_md5
              FROM toks),
            g AS (
              SELECT prefix_md5, count(*) AS n_docs,
                     min(doc_id) AS first_doc
              FROM keyed GROUP BY 1 HAVING count(*) >= 2)
            SELECT prefix_md5, doc_id, n_docs::BIGINT AS n_docs,
                   first_doc
            FROM keyed JOIN g USING (prefix_md5)
            ORDER BY prefix_md5, doc_id
        """,
        "url_params": """
            WITH seeded AS (
              SELECT 'http://h' || (doc_id % 9)::VARCHAR
                     || '.example/p/' || doc_id::VARCHAR ||
                CASE doc_id % 4
                  WHEN 0 THEN '?utm_source=x&utm_campaign='
                  WHEN 1 THEN '?id=' || doc_id::VARCHAR
                              || '&utm_source=y'
                  WHEN 2 THEN '?flag' ELSE '' END AS url
              FROM documents),
            q AS (
              SELECT url AS u,
                     regexp_extract(url, '\\?([^#]*)', 1) AS qs
              FROM seeded WHERE url IS NOT NULL),
            p AS (
              SELECT u, unnest(string_split(qs, '&')) AS p
              FROM q WHERE qs != ''),
            kv AS (
              SELECT u, split_part(p, '=', 1) AS param,
                     CASE WHEN len(string_split(p, '=')) > 1
                           AND string_split(p, '=')[-1] != ''
                          THEN 1 ELSE 0 END AS hv
              FROM p WHERE p != '')
            SELECT param, count(DISTINCT u)::BIGINT AS n_urls,
                   count(*)::BIGINT AS n_occurrences,
                   sum(hv)::BIGINT AS n_with_value
            FROM kv GROUP BY 1 ORDER BY param
        """,
        "audio_silence_profile": """
            WITH c AS (
              SELECT doc_id % 4 AS variant, count(*)::BIGINT AS n_docs
              FROM documents GROUP BY 1),
            k AS (SELECT * FROM (VALUES
                    (0, 20, 0.75, 10), (1, 4, 1.0, 4),
                    (2, 8, 0.0, 0), (3, 8, 0.5, 1))
                  t(variant, n_frames, silence_ratio, longest_silence))
            SELECT c.variant, n_docs, n_frames, silence_ratio,
                   longest_silence
            FROM c JOIN k USING (variant) ORDER BY c.variant
        """,
        "event_volume_anomalies": """
            WITH days AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                     count(*) AS c
              FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
            mom AS (
              SELECT event_type, count(*) AS n, sum(c) AS s1,
                     sum(c * c) AS s2
              FROM days GROUP BY 1)
            SELECT days.event_type, max(n)::BIGINT AS n_days,
                   max(s1)::BIGINT AS total,
                   round(max(s1) / max(n), 6) AS mean_daily,
                   sum(CASE WHEN pow(c * n - s1, 2)
                             > 2.25 * (n * s2 - s1 * s1)
                            THEN 1 ELSE 0 END)::BIGINT
                     AS n_anomaly_days
            FROM days JOIN mom USING (event_type)
            GROUP BY 1 ORDER BY event_type
        """,
        "ab_arms": """
            WITH k AS (
              SELECT user_id, value,
                     md5('exp1:' || user_id::VARCHAR) AS key
              FROM events),
            a AS (
              SELECT (('0x' || substr(key, 1, 15))::UBIGINT % 3)
                       ::BIGINT AS arm,
                     user_id, round(value * 1e6)::BIGINT AS v6
              FROM k)
            SELECT arm, count(*)::BIGINT AS n_rows,
                   count(DISTINCT user_id)::BIGINT AS n_units,
                   round(sum(v6) / 1e6 / count(v6), 6) AS mean_value
            FROM a GROUP BY 1 ORDER BY arm
        """,
        "signup_funnel": """
            WITH per AS (
              SELECT user_id,
                min(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
                min(CASE WHEN event_type = 'view' THEN ts END) AS t1,
                min(CASE WHEN event_type = 'click' THEN ts END) AS t2,
                min(CASE WHEN event_type = 'purchase' THEN ts END)
                  AS t3
              FROM events
              WHERE ts IS NOT NULL AND event_type IN
                ('signup', 'view', 'click', 'purchase')
              GROUP BY 1),
            fl AS (
              SELECT (t0 IS NOT NULL) AS f0,
                     (t0 IS NOT NULL AND t1 > t0) AS f1,
                     (t0 IS NOT NULL AND t1 > t0 AND t2 > t1) AS f2,
                     (t0 IS NOT NULL AND t1 > t0 AND t2 > t1
                      AND t3 > t2) AS f3
              FROM per),
            c AS (SELECT sum(f0::INT) AS n0, sum(f1::INT) AS n1,
                         sum(f2::INT) AS n2, sum(f3::INT) AS n3
                  FROM fl)
            SELECT * FROM (
              SELECT 1 AS stage_idx, 'signup' AS stage,
                     n0::BIGINT AS n_users, 1.0 AS conversion FROM c
              UNION ALL SELECT 2, 'view', n1::BIGINT,
                CASE WHEN n0 > 0 THEN round(n1 / n0, 6) END FROM c
              UNION ALL SELECT 3, 'click', n2::BIGINT,
                CASE WHEN n1 > 0 THEN round(n2 / n1, 6) END FROM c
              UNION ALL SELECT 4, 'purchase', n3::BIGINT,
                CASE WHEN n2 > 0 THEN round(n3 / n2, 6) END FROM c)
            ORDER BY stage_idx
        """,
        "seed_hop_distance": _seed_bfs_sql(max_hops=3),
        "video_scene_cuts": """
            WITH c AS (
              SELECT doc_id % 4 AS variant, count(*)::BIGINT AS n_docs
              FROM documents GROUP BY 1),
            k AS (SELECT * FROM (VALUES
                    (0, 4, 1, 200.0), (1, 3, 0, 100.0),
                    (2, 5, 0, 0.0), (3, 2, 1, 255.0))
                  t(variant, n_frames, n_cuts, max_diff))
            SELECT c.variant, n_docs, n_frames, n_cuts, max_diff
            FROM c JOIN k USING (variant) ORDER BY c.variant
        """,
        "lang_best_docs": f"""
            WITH scored AS (
              SELECT doc_id, lang, {_QUALITY_SQL} AS q
              FROM documents),
            r AS (
              SELECT lang, doc_id, q,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY q DESC, doc_id ASC) AS rank
              FROM scored)
            SELECT lang, rank, doc_id, q FROM r
            WHERE rank <= 25 ORDER BY lang, rank
        """,
        "source_caps": """
            WITH per AS (
              SELECT source,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+'))
                END AS t,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(list_filter(
                            string_split_regex(trim(text), '\\s+'),
                            x -> regexp_full_match(x, '[A-Z]{2,}')))
                END AS c
              FROM documents)
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(t)::BIGINT AS n_tokens,
                   sum(c)::BIGINT AS n_caps_tokens,
                   CASE WHEN sum(t) > 0
                        THEN round(sum(c) / sum(t), 6) END
                     AS caps_ratio,
                   sum(CASE WHEN t > 0 AND c / t > 0.05
                            THEN 1 ELSE 0 END)::BIGINT AS n_shouty
            FROM per GROUP BY 1 ORDER BY source
        """,
        "readability_langs": """
            WITH per AS (
              SELECT lang,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text),
                                                      '\\s+')) END AS w,
                     greatest(1, len(regexp_extract_all(
                       text, '[.!?]+'))) AS s,
                     len(regexp_extract_all(
                       lower(text), '[aeiouy]+')) AS y
              FROM documents),
            f AS (
              SELECT lang, w, s, y,
                     round((206.835 - 1.015 * (w / s)
                            - 84.6 * (y / w)) * 1e6)::BIGINT AS f6
              FROM per WHERE w > 0)
            SELECT lang, count(*)::BIGINT AS n_docs,
                   round(sum(w) / count(*), 6) AS mean_words,
                   round(sum(w) / sum(s), 6) AS words_per_sentence,
                   round(sum(y) / sum(w), 6) AS syllables_per_word,
                   round(sum(f6) / 1e6 / count(*), 6) AS mean_flesch
            FROM f GROUP BY 1 ORDER BY lang
        """,
        "source_len_gini": """
            WITH ranked AS (
              SELECT source, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars ASC, doc_id ASC) AS r
              FROM documents WHERE n_chars IS NOT NULL)
            SELECT source, count(*)::BIGINT AS n_rows,
                   sum(n_chars)::BIGINT AS total,
                   CASE WHEN count(*) * sum(n_chars) > 0 THEN
                     round((2 * sum(r * n_chars)
                            - (count(*) + 1) * sum(n_chars))
                           / (count(*) * sum(n_chars)), 6)
                   END AS gini
            FROM ranked GROUP BY 1 ORDER BY source
        """,
        "len_winsorize": """
            WITH ranked AS (
              SELECT lang, n_chars, doc_id,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY n_chars ASC, doc_id ASC) AS r,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM documents WHERE n_chars IS NOT NULL),
            th AS (
              SELECT lang, max(n) AS n_rows,
                     max(CASE WHEN r = greatest(1, ceil(0.05 * n))
                              THEN n_chars END) AS lo,
                     max(CASE WHEN r = greatest(1, ceil(0.95 * n))
                              THEN n_chars END) AS hi
              FROM ranked GROUP BY 1)
            SELECT d.lang, max(n_rows)::BIGINT AS n_rows,
                   max(lo) AS lo, max(hi) AS hi,
                   sum(CASE WHEN n_chars < lo THEN 1 ELSE 0 END)
                     ::BIGINT AS n_clipped_low,
                   sum(CASE WHEN n_chars > hi THEN 1 ELSE 0 END)
                     ::BIGINT AS n_clipped_high,
                   round(sum(greatest(lo, least(hi, n_chars)))
                         / count(*), 6) AS winsorized_mean
            FROM documents d JOIN th ON th.lang = d.lang
            WHERE n_chars IS NOT NULL
            GROUP BY 1 ORDER BY d.lang
        """,
        "props_profile": """
            WITH v AS (
              SELECT event_type,
                     try_cast(json_extract_string(props, '$.k')
                              AS BIGINT) AS v
              FROM events)
            SELECT event_type, count(*)::BIGINT AS n_rows,
                   sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
                     ::BIGINT AS n_missing,
                   min(v) AS min_value, max(v) AS max_value,
                   round(sum(v) / count(v), 6) AS mean_value
            FROM v GROUP BY 1 ORDER BY event_type
        """,
        "event_cooccurrence": """
            WITH ei AS (
              SELECT DISTINCT user_id AS e, event_type AS i
              FROM events
              WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
            co AS (
              SELECT a.i AS item_a, b.i AS item_b,
                     count(*) AS n_both
              FROM ei a JOIN ei b ON a.e = b.e AND a.i < b.i
              GROUP BY 1, 2),
            sizes AS (SELECT i, count(*) AS n FROM ei GROUP BY 1)
            SELECT item_a, item_b, n_both::BIGINT AS n_both,
                   sa.n::BIGINT AS n_a, sb.n::BIGINT AS n_b,
                   round(n_both / (sa.n + sb.n - n_both), 6)
                     AS affinity
            FROM co
            JOIN sizes sa ON sa.i = item_a
            JOIN sizes sb ON sb.i = item_b
            ORDER BY item_a, item_b
        """,
        "gram_novelty": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 1),
                              i -> array_to_string(t[i:i+2], ' '))
                  END) AS g
                FROM toks) WHERE g != ''),
            f AS (SELECT g, min(doc_id) AS fst FROM sh GROUP BY 1)
            SELECT doc_id, count(*)::BIGINT AS n_grams,
                   sum(CASE WHEN fst = doc_id THEN 1 ELSE 0 END)
                     ::BIGINT AS n_novel,
                   round(sum(CASE WHEN fst = doc_id THEN 1 ELSE 0 END)
                         / count(*)::DOUBLE, 6) AS novelty
            FROM sh JOIN f USING (g) GROUP BY 1 ORDER BY doc_id
        """,
        "user_gaps": """
            WITH gaps AS (
              SELECT event_type,
                     epoch(ts) - lag(epoch(ts)) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS gap
              FROM events
              WHERE ts IS NOT NULL AND user_id IS NOT NULL)
            SELECT event_type, count(*)::BIGINT AS n_gaps,
                   round(avg(gap), 6) AS mean_gap,
                   round(min(gap), 6) AS min_gap,
                   round(max(gap), 6) AS max_gap
            FROM gaps WHERE gap IS NOT NULL
            GROUP BY 1 ORDER BY event_type
        """,
        # twin of q_asof_attribution — deliberately an INDEPENDENT
        # construct: DuckDB's native ASOF LEFT JOIN vs the Spark-side
        # tag-union merge scan
        "asof_attribution": """
            WITH p AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'click')
            SELECT p.user_id,
                   count(*)::BIGINT AS n_purchase,
                   count(c.ts)::BIGINT AS n_attributed,
                   coalesce(sum(epoch_us(p.ts) - epoch_us(c.ts)), 0)
                     ::BIGINT AS gap_us_total
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            GROUP BY p.user_id ORDER BY p.user_id
        """,
        # twin of q_range_join_sessions — sessions re-derived with the
        # same lag/gap window; containment via a plain BETWEEN theta
        # join (DuckDB IEJoin), vs Spark's binned equi-join
        "range_join_sessions": """
            WITH nav AS (
              SELECT user_id, event_id, ts FROM events
              WHERE event_type IN ('click', 'view')),
            lagged AS (
              SELECT user_id, event_id, ts,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM nav),
            s AS (
              SELECT user_id, ts,
                     sum(CASE WHEN prev_ts IS NULL
                              OR ts - prev_ts > INTERVAL 720 MINUTE
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
              FROM lagged),
            sessions AS (
              SELECT user_id, session_id,
                     min(ts) AS start_ts, max(ts) AS end_ts
              FROM s GROUP BY 1, 2),
            p AS (SELECT user_id, ts FROM events
                  WHERE event_type = 'purchase'),
            hits AS (
              SELECT se.user_id, count(*)::BIGINT AS n_in_session
              FROM p JOIN sessions se
                ON p.user_id = se.user_id
               AND p.ts BETWEEN se.start_ts AND se.end_ts
              GROUP BY 1),
            counts AS (
              SELECT user_id, count(*)::BIGINT AS n_sessions
              FROM sessions GROUP BY 1)
            SELECT c.user_id, c.n_sessions,
                   coalesce(h.n_in_session, 0)::BIGINT AS n_in_session
            FROM counts c LEFT JOIN hits h USING (user_id)
            ORDER BY user_id
        """,
        # twin of q_adamic_adar_hosts — symmetrize → degree →
        # shared-neighbor self-join → integer micro-contribution sum,
        # re-derived from the same deterministic host graph
        "adamic_adar_hosts": """
            WITH raw AS (
              SELECT doc_id % 40 AS src, (doc_id * 7 + 11) % 40 AS dst
              FROM documents WHERE doc_id % 40 < 35
              UNION ALL
              SELECT doc_id % 40, (doc_id * 13 + 5) % 40
              FROM documents WHERE doc_id % 40 < 35),
            base AS (
              SELECT src AS a, dst AS b FROM raw
              WHERE src IS NOT NULL AND dst IS NOT NULL AND src != dst),
            sym AS (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM base
                UNION ALL SELECT b, a FROM base)),
            deg AS (SELECT a AS z, count(*) AS dg FROM sym GROUP BY 1),
            nbrs AS (
              SELECT s.b AS z, s.a AS n,
                     CAST(round(1e6 / ln(d.dg)) AS BIGINT) AS c
              FROM sym s JOIN deg d ON d.z = s.b),
            pairs AS (
              SELECT l.n AS node_a, r.n AS node_b, l.c
              FROM nbrs l JOIN nbrs r
                ON l.z = r.z AND l.n < r.n)
            SELECT node_a, node_b,
                   count(*)::BIGINT AS common_neighbors,
                   sum(c)::BIGINT AS aa_micro
            FROM pairs GROUP BY 1, 2
            ORDER BY aa_micro DESC, node_a, node_b LIMIT 40
        """,
        # twin of q_markov_event_mix — p is one division of exact
        # integer counts (identical op order both engines)
        "markov_event_mix": """
            WITH steps AS (
              SELECT lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_state,
                     event_type AS next_state
              FROM events),
            counts AS (
              SELECT prev_state, next_state, count(*)::BIGINT AS n
              FROM steps WHERE prev_state IS NOT NULL
              GROUP BY 1, 2)
            SELECT prev_state, next_state, n,
                   round(n / sum(n) OVER (PARTITION BY prev_state), 6)
                     AS p
            FROM counts ORDER BY prev_state, next_state
        """,
        # twin of q_lev_prefix_pairs — FULL levenshtein() then filter,
        # proving Spark's banded threshold form value-neutral
        "lev_prefix_pairs": f"""
            WITH k AS (
              SELECT doc_id,
                     substr({_NORM_SQL}, 1, 40) AS key
              FROM documents),
            b AS (
              SELECT doc_id, key, substr(key, 1, 8) AS block,
                     length(key) AS len
              FROM k),
            ok AS (SELECT block FROM b GROUP BY block
                   HAVING count(*) <= 200),
            c AS (SELECT b.* FROM b JOIN ok USING (block)),
            p AS (
              SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                     levenshtein(l.key, r.key)::INTEGER AS lev_dist
              FROM c l JOIN c r
                ON l.block = r.block AND l.doc_id < r.doc_id
               AND abs(l.len - r.len) <= 3)
            SELECT id_a, id_b, lev_dist FROM p WHERE lev_dist <= 3
            ORDER BY lev_dist, id_a, id_b LIMIT 40
        """,
        # twin of q_cusum_volume_shift — same integer recurrence
        "cusum_volume_shift": """
            WITH d AS (
              SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n
              FROM events GROUP BY 1),
            s AS (
              SELECT day, n,
                     count(*) OVER () AS nb,
                     sum(n) OVER () AS tot,
                     sum(n) OVER (ORDER BY day
                                  ROWS UNBOUNDED PRECEDING) AS pfx,
                     row_number() OVER (ORDER BY day) AS k
              FROM d),
            c AS (
              SELECT day, n,
                     (nb * pfx - k * tot)::BIGINT AS cusum_scaled
              FROM s)
            SELECT day, n, cusum_scaled,
                   abs(cusum_scaled) = max(abs(cusum_scaled)) OVER ()
                     AS is_peak
            FROM c ORDER BY day
        """,
        # twin of q_mannwhitney_len — distinct-value rank sums, exact
        # doubled ranks, one terminal division
        "mannwhitney_len": """
            WITH vc AS (
              SELECT n_chars AS v,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       ::BIGINT AS na,
                     count(*)::BIGINT AS n
              FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
            r AS (
              SELECT na, n - na AS nb,
                     na * (2 * coalesce(sum(n) OVER (
                               ORDER BY v ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING), 0)
                           + n + 1) AS r2a
              FROM vc),
            a AS (
              SELECT sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b,
                     sum(r2a)::BIGINT AS r2a
              FROM r)
            SELECT n_a, n_b,
                   (r2a - n_a * (n_a + 1))::BIGINT AS u2_a,
                   (2 * n_a * n_b - (r2a - n_a * (n_a + 1)))::BIGINT
                     AS u2_b,
                   CAST(round(1e6 * (r2a - n_a * (n_a + 1))
                              / (2 * n_a * n_b)) AS BIGINT) AS auc_micro
            FROM a
        """,
        # twin of q_rfm_customers — same cents-exact aggregate, same
        # (metric DESC, entity) ntile order
        "rfm_customers": """
            WITH per AS (
              SELECT o_custkey AS e,
                     max(epoch_us(o_orderdate))::BIGINT AS rec,
                     count(*)::BIGINT AS frq,
                     sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       ::BIGINT AS mon
              FROM orders GROUP BY 1),
            b AS (
              SELECT ntile(4) OVER (ORDER BY rec DESC, e) AS r_bucket,
                     ntile(4) OVER (ORDER BY frq DESC, e) AS f_bucket,
                     ntile(4) OVER (ORDER BY mon DESC, e) AS m_bucket
              FROM per)
            SELECT r_bucket, f_bucket, m_bucket,
                   count(*)::BIGINT AS n_entities
            FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        # twin of q_volume_autocorr — n²-scaled integer deviations,
        # calendar-matched lags
        "volume_autocorr": """
            WITH d AS (
              SELECT date_trunc('day', ts) AS b, count(*)::BIGINT AS n
              FROM events GROUP BY 1),
            dev AS (
              SELECT b,
                     ((SELECT count(*) FROM d) * n
                      - (SELECT sum(n) FROM d))::BIGINT AS dd
              FROM d),
            den AS (SELECT sum(dd * dd)::BIGINT AS den FROM dev),
            lags(lag) AS (VALUES (1), (2), (3), (7)),
            num AS (
              SELECT l.lag::BIGINT AS lag, count(*)::BIGINT AS n_pairs,
                     sum(a.dd * c.dd)::BIGINT AS num
              FROM lags l
              JOIN dev a ON true
              JOIN dev c ON c.b = a.b + l.lag * INTERVAL 1 DAY
              GROUP BY 1)
            SELECT lag, n_pairs,
                   CAST(round(1e6 * num / den) AS BIGINT) AS r_micro
            FROM num, den ORDER BY lag
        """,
        # twin of q_phash_dup_groups — all-pairs over distinct hashes,
        # NO blocking: proves the pigeonhole bands recall-lossless
        "phash_dup_groups": """
            WITH ph AS (
              SELECT (doc_id % 12) * 4369 * 1099511627776
                     + CASE doc_id % 5
                         WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3
                         WHEN 3 THEN 1048576 ELSE 1048577 END AS h
              FROM documents),
            hc AS (SELECT h, count(*)::BIGINT AS n FROM ph GROUP BY 1)
            SELECT l.h AS hash_a, r.h AS hash_b,
                   bit_count(xor(l.h, r.h))::INTEGER AS hamming,
                   l.n AS n_a, r.n AS n_b,
                   (l.n * r.n)::BIGINT AS n_pairs
            FROM hc l JOIN hc r ON l.h < r.h
            WHERE bit_count(xor(l.h, r.h)) <= 3
            ORDER BY hash_a, hash_b
        """,
        # twin of q_trust_rank_hosts — unrolled TrustRank CTE chain
        "trust_rank_hosts": _trustrank_sql(iters=4),
        # twin of q_lang_source_rollup — ANSI ROLLUP + GROUPING bits
        "lang_source_rollup": """
            SELECT lang, source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS chars_total,
                   GROUPING(lang, source)::BIGINT AS gid
            FROM documents
            GROUP BY ROLLUP(lang, source)
            ORDER BY gid, lang NULLS FIRST, source NULLS FIRST
        """,
        # twin of q_click_paths — two lags in one window, same
        # tie-break, same top-40 cut
        "click_paths": """
            WITH s AS (
              SELECT lag(event_type, 2) OVER w AS s1,
                     lag(event_type, 1) OVER w AS s2,
                     event_type AS s3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT s1 || '>' || s2 || '>' || s3 AS path,
                   count(*)::BIGINT AS n_occurrences
            FROM s WHERE s1 IS NOT NULL
            GROUP BY 1
            ORDER BY n_occurrences DESC, path LIMIT 40
        """,
        # twin of q_user_key_skew — same (count desc, key) order, same
        # single micro division
        "user_key_skew": """
            WITH c AS (
              SELECT user_id::VARCHAR AS key, count(*)::BIGINT AS n_rows
              FROM events GROUP BY 1),
            t AS (SELECT sum(n_rows)::BIGINT AS tot FROM c),
            top AS (
              SELECT key, n_rows,
                     row_number() OVER (ORDER BY n_rows DESC,
                                        key ASC NULLS LAST)
                       ::BIGINT AS rank
              FROM c ORDER BY n_rows DESC, key ASC NULLS LAST LIMIT 10)
            SELECT rank, key, n_rows,
                   CAST(round(1e6 * n_rows / (SELECT tot FROM t))
                        AS BIGINT) AS share_micro
            FROM top ORDER BY rank
        """,
        # twin of q_cross_source_copy_map — prefix-40 md5, distinct
        # (fp, source), self-join
        "cross_source_copy_map": f"""
            WITH fs AS (
              SELECT DISTINCT
                     md5(substr({_NORM_SQL}, 1, 40)) AS fp, source
              FROM documents WHERE source IS NOT NULL)
            SELECT l.source AS source_a, r.source AS source_b,
                   count(*)::BIGINT AS n_shared_fps
            FROM fs l JOIN fs r
              ON l.fp = r.fp AND l.source < r.source
            GROUP BY 1, 2 ORDER BY source_a, source_b
        """,
        # twin of q_embedding_angle_hist — same blocks, same fold-order
        # cosine, same integer micro bin rule
        "embedding_angle_hist": """
            WITH b AS (
              SELECT vec_id AS id, embedding::DOUBLE[] AS v,
                     vec_id % 64 AS blk
              FROM embeddings),
            p AS (
              SELECT CAST(round(1e6 * (list_dot_product(l.v, r.v)
                       / (sqrt(list_dot_product(l.v, l.v))
                          * sqrt(list_dot_product(r.v, r.v)))))
                     AS BIGINT) AS cm
              FROM b l JOIN b r ON l.blk = r.blk AND l.id < r.id),
            x AS (
              SELECT least(floor((cm + 1000000) * 10 / 2000000),
                           9)::BIGINT AS bin, cm
              FROM p)
            SELECT bin, count(*)::BIGINT AS n_pairs,
                   min(cm) AS lo_micro, max(cm) AS hi_micro
            FROM x GROUP BY 1 ORDER BY bin
        """,
        # twin of q_lang_vocab_overlap — distinct token sets,
        # token-keyed intersection, inclusion-exclusion union
        "lang_vocab_overlap": f"""
            WITH toks AS (
              SELECT DISTINCT lang AS g, t FROM (
                SELECT lang,
                       unnest(string_split({_NORM_SQL}, ' ')) AS t
                FROM documents)
              WHERE t <> '' AND g IS NOT NULL),
            sizes AS (SELECT g, count(*)::BIGINT AS n
                      FROM toks GROUP BY 1),
            inter AS (
              SELECT l.g AS group_a, r.g AS group_b,
                     count(*)::BIGINT AS n_common
              FROM toks l JOIN toks r ON l.t = r.t AND l.g < r.g
              GROUP BY 1, 2)
            SELECT group_a, group_b, n_common,
                   sa.n AS n_a, sb.n AS n_b,
                   CAST(round(1e6 * n_common
                              / (sa.n + sb.n - n_common)) AS BIGINT)
                     AS jaccard_micro
            FROM inter
            JOIN sizes sa ON sa.g = group_a
            JOIN sizes sb ON sb.g = group_b
            ORDER BY group_a, group_b
        """,
        # twin of q_event_fano — same cross-multiplied variance/mean
        "event_fano": """
            WITH d AS (
              SELECT event_type AS grp, date_trunc('day', ts) AS b,
                     count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2),
            m AS (
              SELECT grp, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
                     sum(c * c)::BIGINT AS s2
              FROM d GROUP BY 1)
            SELECT grp AS "group", n AS n_buckets, s AS total,
                   CASE WHEN n * s > 0
                        THEN CAST(round(1e6 * (n * s2 - s * s)
                                        / (n * s)) AS BIGINT) END
                     AS fano_micro
            FROM m ORDER BY "group"
        """,
        # twin of q_lang_source_mi — H identities from exact counts,
        # floats only in the final ln projection
        "lang_source_mi": """
            WITH cells AS (
              SELECT lang AS a, source AS b, count(*)::BIGINT AS c
              FROM documents GROUP BY 1, 2),
            ma AS (SELECT a, sum(c)::BIGINT AS c FROM cells GROUP BY 1),
            mb AS (SELECT b, sum(c)::BIGINT AS c FROM cells GROUP BY 1),
            ea AS (SELECT count(*)::BIGINT AS n_a,
                          ln(sum(c)::DOUBLE)
                          - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c)
                            AS ha
                   FROM ma),
            eb AS (SELECT count(*)::BIGINT AS n_b,
                          ln(sum(c)::DOUBLE)
                          - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c)
                            AS hb
                   FROM mb),
            eab AS (SELECT count(*)::BIGINT AS n_cells,
                           ln(sum(c)::DOUBLE)
                           - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c)
                             AS hab
                    FROM cells)
            SELECT n_a, n_b, n_cells,
                   round(ha, 6) AS h_a, round(hb, 6) AS h_b,
                   round(hab, 6) AS h_ab,
                   round(ha + hb - hab, 6) AS mi_nats
            FROM ea, eb, eab
        """,
        # twin of q_event_volume_trend — same integer OLS moments,
        # same guarded degenerate denominator
        "event_volume_trend": """
            WITH d AS (
              SELECT event_type AS grp, date_trunc('day', ts) AS b,
                     count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2),
            pts AS (
              SELECT grp,
                     date_diff('day',
                               min(b::DATE) OVER (PARTITION BY grp),
                               b::DATE)::BIGINT AS x,
                     c AS y
              FROM d),
            m AS (
              SELECT grp, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                     sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
                     sum(x * x)::BIGINT AS sxx
              FROM pts GROUP BY 1)
            SELECT grp AS "group", n AS n_buckets, sy AS total,
                   CASE WHEN (n * sxx - sx * sx) > 0
                        THEN CAST(round(1e6 * (n * sxy - sx * sy)
                                        / (n * sxx - sx * sx))
                                  AS BIGINT) END
                     AS slope_micro_per_unit
            FROM m ORDER BY "group"
        """,
        # twin of q_embedding_norm_qc — same left-fold sum-of-squares
        # norm, same NULL/dim/zero/NaN gates, round-6 norm stats
        "embedding_norm_qc": """
            WITH b AS (
              SELECT label AS "group",
                     CASE WHEN embedding IS NULL THEN NULL
                          ELSE sqrt(list_aggregate(list_transform(
                                 embedding,
                                 x -> x::DOUBLE * x::DOUBLE), 'sum'))
                     END AS norm,
                     CASE WHEN embedding IS NULL THEN NULL
                          ELSE len(embedding)::INT END AS dim,
                     CASE WHEN embedding IS NULL THEN NULL
                          ELSE len(list_filter(
                                 embedding,
                                 x -> isnan(x::DOUBLE))) > 0
                     END AS nan
              FROM embeddings)
            SELECT "group", count(norm)::BIGINT AS n_vecs,
                   (count(*) - count(norm))::BIGINT AS n_null,
                   min(dim) AS dim_min, max(dim) AS dim_max,
                   sum(CASE WHEN norm = 0 THEN 1 ELSE 0 END)::BIGINT
                     AS n_zero_norm,
                   sum(CASE WHEN nan THEN 1 ELSE 0 END)::BIGINT
                     AS n_nan,
                   round(avg(norm), 6) AS norm_avg,
                   round(min(norm), 6) AS norm_min,
                   round(max(norm), 6) AS norm_max
            FROM b GROUP BY 1 ORDER BY 1
        """,
        # twin of q_emb_covariance — population covariance from
        # per-position unnests; same sum/count − mean·mean shape
        "emb_covariance": """
            WITH x AS (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) - 1 AS i,
                     unnest(embedding)::DOUBLE AS v
              FROM embeddings WHERE embedding IS NOT NULL)
            SELECT a.i::INT AS i, b.i::INT AS j,
                   round(sum(a.v * b.v) / count(*)
                         - (sum(a.v) / count(*))
                         * (sum(b.v) / count(*)), 6) AS cov
            FROM x a JOIN x b
              ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i ORDER BY 1, 2
        """,
        # twin of q_ann_rrf_fusion — same round-6 metrics, same
        # (metric, id) rank ties, same exact-rational fusion
        "ann_rrf_fusion": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(
                       e.embedding::DOUBLE[], q.qv), 6) AS c,
                     round(list_distance(
                       e.embedding::DOUBLE[], q.qv), 6) AS l
              FROM embeddings e, q WHERE e.vec_id != q.query_id),
            ranked AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY c DESC, vec_id ASC)
                       AS rank_cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY l ASC, vec_id ASC)
                       AS rank_l2
              FROM scored),
            fused AS (
              SELECT *,
                     1.0 / (60 + rank_cos) + 1.0 / (60 + rank_l2) AS f
              FROM ranked)
            SELECT query_id, vec_id, rank_cos, rank_l2,
                   CAST(round(f * 1e6) AS BIGINT) AS rrf_micro,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY f DESC, vec_id ASC)
                     AS rank
            FROM fused QUALIFY rank <= 5
        """,
        # twin of q_snapshot_host_overlap — same seeded 4-month frame,
        # same distinct-host inclusion-exclusion jaccard
        "snapshot_host_overlap": """
            WITH seeded AS (
              SELECT 'http://host'
                       || ((doc_id // 4)
                           % (20 + 10 * (doc_id % 4)))::VARCHAR
                       || '.example.com/p/' || doc_id::VARCHAR AS url,
                     (DATE '2024-01-01'
                       + ((doc_id % 4)::INT) * INTERVAL 1 MONTH
                     )::TIMESTAMP AS warc_ts
              FROM documents),
            hosts AS (
              SELECT DISTINCT date_trunc('month', warc_ts)::DATE AS snap,
                     lower(regexp_extract(
                       url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS host
              FROM seeded WHERE warc_ts IS NOT NULL),
            h2 AS (SELECT * FROM hosts WHERE host != ''),
            snaps AS (
              SELECT snap, row_number() OVER (ORDER BY snap) AS r
              FROM (SELECT DISTINCT snap FROM h2)),
            counts AS (SELECT snap, count(*) AS n FROM h2 GROUP BY snap),
            h AS (SELECT h2.snap, h2.host, s.r
                  FROM h2 JOIN snaps s USING (snap)),
            common AS (
              SELECT x.r AS r, count(*) AS n_common
              FROM h x JOIN h y ON x.r + 1 = y.r AND x.host = y.host
              GROUP BY x.r),
            pairs AS (
              SELECT a.snap AS snap_a, b.snap AS snap_b, a.r
              FROM snaps a JOIN snaps b ON a.r + 1 = b.r)
            SELECT snap_a, snap_b, ca.n::BIGINT AS hosts_a,
                   cb.n::BIGINT AS hosts_b,
                   coalesce(c.n_common, 0)::BIGINT AS n_common,
                   round(coalesce(c.n_common, 0)
                         / (ca.n + cb.n - coalesce(c.n_common, 0)), 6)
                     AS jaccard
            FROM pairs p
            JOIN counts ca ON ca.snap = p.snap_a
            JOIN counts cb ON cb.snap = p.snap_b
            LEFT JOIN common c ON c.r = p.r
            ORDER BY snap_a
        """,
        # twin of q_mad_outliers — same two-stage exact interpolated
        # percentile, same 1.4826 Hampel scale, same k gate
        "mad_outliers": """
            WITH med AS (
              SELECT event_type, quantile_cont(value, 0.5) AS med
              FROM events GROUP BY event_type),
            dev AS (
              SELECT e.event_id, e.event_type, e.value, m.med,
                     abs(e.value - m.med) AS ad
              FROM events e JOIN med m USING (event_type)),
            mad AS (
              SELECT event_type, quantile_cont(ad, 0.5) AS mad
              FROM dev GROUP BY event_type)
            SELECT d.event_id, d.event_type, d.value,
                   round((d.value - d.med) / (1.4826 * t.mad), 6)
                     AS mad_score,
                   'value.mad_outlier' AS rule_id
            FROM dev d JOIN mad t USING (event_type)
            WHERE t.mad > 0
              AND abs((d.value - d.med) / (1.4826 * t.mad)) > 2.5
            ORDER BY d.event_id
        """,
        "pq_ann": _pq_ann_sql(k=5, m=4, ksub=8, seed=42),
        # twin of q_hill_tail — same top-(k+1) order statistics, same
        # log-ratio sum against the tail pivot
        "hill_tail": """
            WITH d AS (
              SELECT lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars DESC) AS r
              FROM documents WHERE n_chars IS NOT NULL),
            top AS (SELECT * FROM d WHERE r <= 51),
            piv AS (SELECT lang, count(*) AS m, min(n_chars) AS xt
                    FROM top GROUP BY lang),
            sizes AS (SELECT lang, count(*) AS n_rows FROM documents
                      WHERE n_chars IS NOT NULL GROUP BY lang),
            alpha AS (
              SELECT t.lang, max(p.m) - 1 AS k_used,
                     max(p.xt) AS x_tail,
                     round((max(p.m) - 1)
                           / sum(ln(t.n_chars / p.xt)), 6) AS alpha
              FROM top t JOIN piv p USING (lang)
              WHERE p.m >= 3 AND p.xt > 0 AND t.r < p.m
              GROUP BY t.lang)
            SELECT a.lang, s.n_rows::BIGINT AS n_rows,
                   a.k_used::BIGINT AS k_used, a.x_tail, a.alpha
            FROM alpha a JOIN sizes s USING (lang)
            ORDER BY a.lang
        """,
        # twin of q_host_fetch_gaps — same seeded quadratic-residue
        # fetch times, same lag gaps, same interpolated median
        "host_fetch_gaps": """
            WITH seeded AS (
              SELECT 'host' || (doc_id % 13)::VARCHAR
                       || '.example.com' AS host,
                     1704067200 + (doc_id * doc_id) % 100000 AS t
              FROM documents),
            gaps AS (
              SELECT host,
                     t - lag(t) OVER (PARTITION BY host ORDER BY t)
                       AS gap
              FROM seeded QUALIFY gap IS NOT NULL)
            SELECT host, (count(*) + 1)::BIGINT AS n_fetches,
                   min(gap)::BIGINT AS min_gap_s,
                   quantile_cont(gap, 0.5) AS median_gap_s,
                   max(gap)::BIGINT AS max_gap_s
            FROM gaps GROUP BY host
            HAVING count(*) + 1 >= 3
            ORDER BY host
        """,
        # twin of q_anchor_texts — same element regex, same href
        # cleanup as link_graph, same min-struct top-anchor tie rule
        "anchor_texts": _anchor_texts_sql(),
        # twin of q_quality_calibration — same round-6 quality score,
        # same fingerprint dup label, same decile floor
        "quality_calibration": f"""
            WITH b AS (
              SELECT md5({{NORM}}) AS fp, {{QUALITY}} AS q
              FROM documents),
            c AS (SELECT fp, count(*) AS n FROM b GROUP BY fp)
            SELECT least(floor(b.q * 10), 9)::BIGINT AS bucket,
                   count(*)::BIGINT AS n_docs,
                   sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END)::BIGINT
                     AS n_dup,
                   round(avg(CASE WHEN c.n > 1 THEN 1 ELSE 0 END), 6)
                     AS dup_rate,
                   round(avg(b.q), 6) AS avg_quality
            FROM b JOIN c USING (fp)
            GROUP BY 1 ORDER BY 1
        """.replace("{NORM}", _NORM_SQL).replace("{QUALITY}",
                                                 _QUALITY_SQL),
        # twin of q_ppjoin_pairs — the INDEPENDENT exact form (pairs
        # sharing ≥1 token, full Jaccard): proves prefix filtering
        # loses nothing
        "ppjoin_pairs": f"""
            WITH docs AS (
              SELECT * FROM ({_DUP_DOCS_SQL}) WHERE doc_id % 10 = 0),
            sets AS (
              SELECT doc_id,
                     list_distinct(list_filter(
                       string_split({_NORM_SQL}, ' '),
                       x -> x != '')) AS toks
              FROM docs),
            nz AS (SELECT * FROM sets WHERE len(toks) > 0),
            tk AS (SELECT doc_id, unnest(toks) AS tok FROM nz),
            sizes AS (SELECT doc_id, len(toks) AS n FROM nz),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS c
              FROM tk a JOIN tk b
                ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b, sa.n::BIGINT AS n_a, sb.n::BIGINT AS n_b,
                   c::BIGINT AS n_common,
                   round(c / (sa.n + sb.n - c), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(c / (sa.n + sb.n - c), 6) >= 0.9
            ORDER BY id_a, id_b
        """,
        # twin of q_diurnal_profile — same 2π/86400 and 24/2π
        # constants (identical op order), round-6 aggregates
        "diurnal_profile": """
            WITH b AS (
              SELECT event_type AS "group",
                     (extract(hour FROM ts) * 3600
                      + extract(minute FROM ts) * 60
                      + extract(second FROM ts))::DOUBLE
                       * (2 * pi() / 86400) AS theta
              FROM events WHERE ts IS NOT NULL)
            SELECT "group", count(*)::BIGINT AS n_events,
                   round(sqrt(pow(sum(cos(theta)), 2)
                              + pow(sum(sin(theta)), 2))
                         / count(*), 6) AS r_concentration,
                   round(((atan2(sum(sin(theta)), sum(cos(theta)))
                           + 2 * pi()) % (2 * pi()))
                         * (24 / (2 * pi())), 6) AS mean_hour
            FROM b GROUP BY 1
        """,
        # twin of q_quantile_norm — same (stratum, value)-distinct
        # cumulative table, same (rank−1)/(n−1) percent_rank rule
        "quantile_norm": """
            WITH vc AS (
              SELECT source, n_chars, count(*) AS c FROM documents
              WHERE n_chars IS NOT NULL GROUP BY 1, 2),
            cum AS (
              SELECT source, n_chars,
                     sum(c) OVER (PARTITION BY source ORDER BY n_chars
                                  ROWS UNBOUNDED PRECEDING) - c
                       AS below,
                     sum(c) OVER (PARTITION BY source) AS n
              FROM vc)
            SELECT d.doc_id, d.source, d.n_chars,
                   CASE WHEN cum.n > 1
                        THEN round(cum.below / (cum.n - 1), 6) END
                     AS pct
            FROM documents d
            LEFT JOIN cum ON d.source = cum.source
                         AND d.n_chars = cum.n_chars
            WHERE d.doc_id % 7 = 0 ORDER BY d.doc_id
        """,
        # twin of q_meta_robots — same seeded tags, same first-tag
        # extraction + content split + trim/lower
        "meta_robots": """
            WITH seeded AS (
              SELECT text || CASE doc_id % 4
                WHEN 0 THEN ' <meta name="robots" content="noindex, nofollow">'
                WHEN 1 THEN ' <META NAME=ROBOTS CONTENT=''noarchive''>'
                WHEN 2 THEN ' <meta name="robots" content="index, follow">'
                ELSE '' END AS t
              FROM documents),
            tags AS (
              SELECT regexp_extract(t,
                '(?i)<meta\\s[^>]*name\\s*=\\s*["'']?robots["'']?[^>]*>')
                AS tag
              FROM seeded),
            contents AS (
              SELECT regexp_extract(tag,
                '(?i)content\\s*=\\s*["'']([^"''>]*)', 1) AS content
              FROM tags WHERE tag != ''),
            parts AS (
              SELECT trim(lower(unnest(string_split(content, ','))))
                AS directive
              FROM contents)
            SELECT directive, count(*)::BIGINT AS n_docs FROM parts
            WHERE directive != '' GROUP BY 1 ORDER BY 1
        """,
        # twin of q_hashed_features — bit-identical md5-prefix bucket,
        # same L1 normalization
        "hashed_features": f"""
            WITH tk AS (
              SELECT doc_id,
                     unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                        x -> x != '')) AS tok
              FROM documents WHERE doc_id % 11 = 0),
            b AS (
              SELECT doc_id,
                     ('0x' || substr(md5(tok), 1, 15))::BIGINT % 16
                       AS bucket
              FROM tk),
            c AS (SELECT doc_id, bucket, count(*) AS c FROM b
                  GROUP BY 1, 2)
            SELECT doc_id, bucket::BIGINT AS bucket,
                   round(c / (sum(c) OVER (PARTITION BY doc_id)), 6)
                     AS w
            FROM c ORDER BY doc_id, bucket
        """,
        # twin of q_type_affinity — integer dot/norm sums, round-6
        # cosine, type_a < type_b
        "type_affinity": """
            WITH c AS (
              SELECT user_id, event_type, count(*) AS c
              FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
            n AS (
              SELECT event_type, sqrt(sum(c * c)) AS nrm
              FROM c GROUP BY 1)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*)::BIGINT AS n_shared_entities,
                   round(sum(a.c * b.c) / (na.nrm * nb.nrm), 6)
                     AS cosine
            FROM c a
            JOIN c b ON a.user_id = b.user_id
                    AND a.event_type < b.event_type
            JOIN n na ON na.event_type = a.event_type
            JOIN n nb ON nb.event_type = b.event_type
            GROUP BY 1, 2, na.nrm, nb.nrm
            ORDER BY 1, 2
        """,
        # twin of q_event_debounce — same floored epoch seconds, same
        # (ts, event_id) order, NULL gap for each (user, type) head
        "event_debounce": """
            WITH g AS (
              SELECT event_id, user_id, event_type,
                     floor(epoch(ts))::BIGINT
                     - lag(floor(epoch(ts))::BIGINT) OVER (
                         PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) AS gap_s
              FROM events)
            SELECT event_id, user_id, event_type, gap_s,
                   coalesce(gap_s < 60, FALSE) AS bounce
            FROM g WHERE event_id % 9 = 0 ORDER BY event_id
        """,
        # twin of q_lognormal_len — identical two-moment arithmetic
        # (s2 - s*s/n)/(n-1), sigma-0 single-row strata, round 6
        "lognormal_len": """
            WITH base AS (
              SELECT lang, ln(n_chars::DOUBLE) AS lx FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0),
            m AS (
              SELECT lang, count(*) AS n, sum(lx) AS s,
                     sum(lx * lx) AS s2
              FROM base GROUP BY 1),
            p AS (
              SELECT lang, n, s / n AS mu,
                     sqrt(greatest(coalesce(
                       CASE WHEN n > 1
                            THEN (s2 - s * s / n) / (n - 1) END,
                       0.0), 0.0)) AS sig
              FROM m)
            SELECT b.lang, max(p.n)::BIGINT AS n,
                   round(max(p.mu), 6) AS mu,
                   round(max(p.sig), 6) AS sigma,
                   CASE WHEN max(p.sig) > 0 THEN
                     round(avg(CASE WHEN abs(b.lx - p.mu) <= p.sig
                               THEN 1 ELSE 0 END), 6) END
                     AS within_1sigma
            FROM base b JOIN p ON p.lang = b.lang
            GROUP BY 1 ORDER BY 1
        """,
        # twin of q_bitext_pairs — same seeded anchors/langs, same
        # df<=3 rare-token filter, same cross-lang pair aggregation
        "bitext_pairs": f"""
            WITH seeded AS (
              SELECT doc_id,
                     text || ' zqa' || (doc_id // 26)::VARCHAR
                          || ' zqb' || (doc_id // 26)::VARCHAR AS text,
                     CASE WHEN (doc_id // 13) % 2 = 0
                          THEN 'en' ELSE 'de' END AS lang
              FROM documents WHERE doc_id % 13 = 0),
            rows_ AS (
              SELECT doc_id AS id, lang,
                     unnest(list_distinct(list_filter(
                       string_split({_NORM_SQL}, ' '),
                       x -> x != ''))) AS tok
              FROM seeded),
            dfreq AS (
              SELECT tok FROM rows_ GROUP BY 1
              HAVING count(*) <= 3),
            rare AS (SELECT r.* FROM rows_ r JOIN dfreq USING (tok))
            SELECT a.id AS id_a, a.lang AS lang_a,
                   b.id AS id_b, b.lang AS lang_b,
                   count(*)::BIGINT AS n_shared
            FROM rare a
            JOIN rare b ON a.tok = b.tok AND a.id < b.id
                       AND a.lang != b.lang
            GROUP BY 1, 2, 3, 4
            HAVING count(*) >= 2
            ORDER BY id_a, id_b
        """,
        # twin of q_good_turing — all-integer aggregates, exact
        "good_turing": f"""
            WITH tk AS (
              SELECT lang,
                     unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                        x -> x != '')) AS tok
              FROM documents),
            tc AS (
              SELECT lang, tok, count(*) AS c FROM tk GROUP BY 1, 2)
            SELECT lang, sum(c)::BIGINT AS n_tokens,
                   count(*)::BIGINT AS n_types,
                   sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT
                     AS singletons,
                   sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT
                     AS doubletons,
                   round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                         / sum(c), 6) AS p_unseen
            FROM tc GROUP BY 1 ORDER BY 1
        """,
        "fd_check": """
            WITH v1 AS (
              SELECT 'source->lang' AS fd, source AS determinant,
                     count(*)::BIGINT AS n_rows,
                     count(DISTINCT lang)::BIGINT AS n_dependent,
                     min(lang) AS dep_min, max(lang) AS dep_max
              FROM documents GROUP BY source
              HAVING count(DISTINCT lang) > 1),
            v2 AS (
              SELECT 'doc_id->lang' AS fd, doc_id::VARCHAR AS determinant,
                     count(*)::BIGINT AS n_rows,
                     count(DISTINCT lang)::BIGINT AS n_dependent,
                     min(lang) AS dep_min, max(lang) AS dep_max
              FROM documents GROUP BY doc_id
              HAVING count(DISTINCT lang) > 1)
            SELECT * FROM v1 UNION ALL SELECT * FROM v2
            ORDER BY fd, determinant
        """,
        "key_profile": """
            WITH s AS (
              SELECT count(*) AS n_rows,
                     count(DISTINCT
                       CASE WHEN doc_id IS NULL THEN chr(1)||'N'
                            ELSE chr(1)||'V'||doc_id::VARCHAR END)
                       AS d0,
                     count(DISTINCT
                       (CASE WHEN source IS NULL THEN chr(1)||'N'
                             ELSE chr(1)||'V'||source END)
                       || (CASE WHEN lang IS NULL THEN chr(1)||'N'
                                ELSE chr(1)||'V'||lang END)) AS d1,
                     count(DISTINCT
                       (CASE WHEN source IS NULL THEN chr(1)||'N'
                             ELSE chr(1)||'V'||source END)
                       || (CASE WHEN lang IS NULL THEN chr(1)||'N'
                                ELSE chr(1)||'V'||lang END)
                       || (CASE WHEN n_chars IS NULL THEN chr(1)||'N'
                                ELSE chr(1)||'V'||n_chars::VARCHAR END))
                       AS d2
              FROM documents),
            u AS (
              SELECT 'doc_id' AS combo, n_rows, d0 AS n_distinct FROM s
              UNION ALL
              SELECT 'source+lang', n_rows, d1 FROM s
              UNION ALL
              SELECT 'source+lang+n_chars', n_rows, d2 FROM s)
            SELECT combo, n_rows::BIGINT AS n_rows,
                   n_distinct::BIGINT AS n_distinct,
                   round(n_distinct / n_rows, 6) AS distinct_ratio,
                   n_distinct = n_rows AS is_key
            FROM u ORDER BY combo
        """,
        "kmv_overlap": """
            WITH urls AS (
              SELECT doc_id,
                     'http://host' || (doc_id % 97)::VARCHAR
                       || '.example.com/p/' || doc_id::VARCHAR AS url
              FROM documents),
            ha AS (SELECT DISTINCT
                     ('0x' || substr(md5(url), 1, 12))::BIGINT AS h
                   FROM urls WHERE doc_id % 3 != 0
                   ORDER BY h LIMIT 256),
            hb AS (SELECT DISTINCT
                     ('0x' || substr(md5(url), 1, 12))::BIGINT AS h
                   FROM urls WHERE doc_id % 2 = 0
                   ORDER BY h LIMIT 256),
            merged AS (
              SELECT coalesce(a.h, b.h) AS h,
                     CASE WHEN a.h IS NULL THEN 0 ELSE 1 END AS in_a,
                     CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS in_b
              FROM ha a FULL JOIN hb b ON a.h = b.h
              ORDER BY 1 LIMIT 256),
            su AS (SELECT count(*) AS n_u, max(h) AS kth_u,
                          sum(CASE WHEN in_a = 1 AND in_b = 1
                              THEN 1 ELSE 0 END) AS n_both
                   FROM merged),
            sa AS (SELECT count(*) AS n_a, max(h) AS kth_a FROM ha),
            sb AS (SELECT count(*) AS n_b, max(h) AS kth_b FROM hb)
            SELECT 256 AS k,
                   round(CASE WHEN n_a < 256 THEN n_a::DOUBLE
                         ELSE CAST(71776119061217280 AS DOUBLE) / kth_a END, 6)
                     AS d_a_est,
                   round(CASE WHEN n_b < 256 THEN n_b::DOUBLE
                         ELSE CAST(71776119061217280 AS DOUBLE) / kth_b END, 6)
                     AS d_b_est,
                   round(CASE WHEN n_u < 256 THEN n_u::DOUBLE
                         ELSE CAST(71776119061217280 AS DOUBLE) / kth_u END, 6)
                     AS d_union_est,
                   round(n_both / n_u, 6) AS jaccard_est,
                   round((n_both / n_u)
                         * (CASE WHEN n_u < 256 THEN n_u::DOUBLE
                            ELSE CAST(71776119061217280 AS DOUBLE) / kth_u END),
                         6) AS d_intersection_est
            FROM su, sa, sb
        """,
        "completeness_by_source": """
            WITH holed AS (
              SELECT source, n_chars,
                     CASE WHEN doc_id % 13 = 0 THEN NULL
                          ELSE lang END AS lang,
                     CASE WHEN doc_id % 17 = 0 THEN ''
                          ELSE text END AS text
              FROM documents),
            g AS (
              SELECT source AS segment, count(*) AS n_rows,
                     sum(CASE WHEN text IS NULL OR text = ''
                         THEN 1 ELSE 0 END) AS m0,
                     sum(CASE WHEN lang IS NULL OR lang = ''
                         THEN 1 ELSE 0 END) AS m1,
                     sum(CASE WHEN n_chars IS NULL
                         THEN 1 ELSE 0 END) AS m2
              FROM holed GROUP BY source),
            u AS (
              SELECT segment, 'text' AS "column", n_rows, m0 AS n_null
              FROM g
              UNION ALL SELECT segment, 'lang', n_rows, m1 FROM g
              UNION ALL SELECT segment, 'n_chars', n_rows, m2 FROM g)
            SELECT segment, "column", n_rows::BIGINT AS n_rows,
                   n_null::BIGINT AS n_null,
                   round(n_null / n_rows, 6) AS null_rate
            FROM u ORDER BY segment, "column"
        """,
        "url_content_churn": """
            WITH s AS (
              SELECT (doc_id % 2)::INT AS snap,
                     doc_id // 2 AS page
              FROM documents),
            seeded AS (
              SELECT snap,
                     'http://host' || (page % 23)::VARCHAR
                       || '.example.com/p/' || page::VARCHAR AS url,
                     CASE WHEN snap = 1 AND page % 10 < 3
                          THEN 'content-' || page::VARCHAR || '-v2'
                          ELSE 'content-' || page::VARCHAR END AS text
              FROM s),
            slim AS (
              SELECT snap, url,
                     lower(regexp_extract(
                       url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS host,
                     ('0x' || substr(md5(text), 1, 12))::BIGINT AS d
              FROM seeded
              WHERE url IS NOT NULL AND text IS NOT NULL),
            a AS (SELECT url, min(host) AS host, min(d) AS d
                  FROM slim WHERE snap = 0 GROUP BY url),
            b AS (SELECT url, min(d) AS d2
                  FROM slim WHERE snap = 1 GROUP BY url)
            SELECT a.host, count(*)::BIGINT AS n_common,
                   sum(CASE WHEN a.d != b.d2 THEN 1 ELSE 0 END)::BIGINT
                     AS n_changed,
                   round(sum(CASE WHEN a.d != b.d2 THEN 1 ELSE 0 END)
                         / count(*), 6) AS churn_rate
            FROM a JOIN b ON a.url = b.url
            GROUP BY a.host ORDER BY host
        """,
        "session_overlap": """
            WITH iv AS (
              SELECT user_id, event_id,
                     floor(epoch(ts))::BIGINT AS start_s,
                     floor(epoch(ts))::BIGINT + 60 + (event_id % 540)
                       AS end_s
              FROM events),
            W AS (
              SELECT user_id, event_id, start_s, end_s,
                     max(end_s) OVER (
                       PARTITION BY user_id
                       ORDER BY start_s, end_s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_end
              FROM iv)
            SELECT user_id, event_id, start_s, end_s, prev_end,
                   least(end_s, prev_end) - start_s AS overlap
            FROM W
            WHERE prev_end IS NOT NULL AND start_s < prev_end
            ORDER BY user_id, event_id
        """,
        "sequence_audit": """
            WITH g AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'signup'
                         THEN ts END) AS first_ts,
                     min(CASE WHEN event_type = 'purchase'
                         THEN ts END) AS then_ts
              FROM events GROUP BY user_id)
            SELECT user_id, first_ts, then_ts,
                   CASE WHEN first_ts IS NULL THEN 'missing_precursor'
                        ELSE 'out_of_order' END AS kind
            FROM g
            WHERE then_ts IS NOT NULL
              AND (first_ts IS NULL OR then_ts < first_ts)
            ORDER BY user_id
        """,
        "order_reconciliation": """
            WITH d AS (
              SELECT l_orderkey AS okey,
                     sum(round(l_extendedprice * (1 + l_tax)
                               * (1 - l_discount) * 100, 0)::BIGINT)
                       AS dsum
              FROM lineitem GROUP BY l_orderkey),
            j AS (
              SELECT o.o_orderstatus,
                     round(o.o_totalprice * 100, 0)::BIGINT AS fsum,
                     d.dsum
              FROM orders o LEFT JOIN d ON d.okey = o.o_orderkey)
            SELECT o_orderstatus,
                   count(*)::BIGINT AS n_facts,
                   sum(CASE WHEN dsum IS NOT NULL
                            AND abs(fsum - dsum) > 1
                       THEN 1 ELSE 0 END)::BIGINT AS n_mismatch,
                   sum(CASE WHEN dsum IS NULL THEN 1 ELSE 0 END)::BIGINT
                     AS n_missing_detail,
                   round(sum(CASE WHEN dsum IS NOT NULL
                                  AND abs(fsum - dsum) > 1
                             THEN 1 ELSE 0 END) / count(*), 6)
                     AS mismatch_rate,
                   max(CASE WHEN dsum IS NOT NULL
                       THEN abs(fsum - dsum) END)::BIGINT
                     AS max_abs_delta_cents
            FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "dup_rate_by_source": """
            WITH seeded AS (
              SELECT source AS "group",
                     CASE WHEN doc_id % 7 = 0
                          THEN 'template:' || source
                          ELSE text END AS text
              FROM documents)
            SELECT "group", count(*)::BIGINT AS n_rows,
                   count(DISTINCT md5(text))::BIGINT AS n_distinct,
                   round(1.0 - count(DISTINCT md5(text)) / count(*), 6)
                     AS dup_rate
            FROM seeded GROUP BY "group" ORDER BY "group"
        """,
        "derived_consistency": """
            WITH seeded AS (
              SELECT source, text,
                     CASE WHEN doc_id % 19 = 0 THEN n_chars + 7
                          ELSE n_chars END AS n_chars
              FROM documents),
            m AS (
              SELECT source,
                     abs(n_chars - length(text)) AS delta,
                     CASE WHEN n_chars IS NULL AND text IS NULL THEN 0
                          WHEN n_chars IS NULL OR text IS NULL THEN 1
                          WHEN abs(n_chars - length(text)) > 0 THEN 1
                          ELSE 0 END AS mism
              FROM seeded)
            SELECT source, count(*)::BIGINT AS n_rows,
                   sum(mism)::BIGINT AS n_mismatch,
                   round(sum(mism) / count(*), 6) AS mismatch_rate,
                   max(delta)::BIGINT AS max_abs_delta
            FROM m GROUP BY source ORDER BY source
        """,
        "mode_share": """
            WITH holed AS (
              SELECT source, n_chars,
                     CASE WHEN doc_id % 13 = 0 THEN NULL
                          ELSE lang END AS lang
              FROM documents),
            long AS (
              SELECT 'lang' AS "column",
                     coalesce(lang, chr(1) || 'NULL') AS value
              FROM holed
              UNION ALL
              SELECT 'source', coalesce(source, chr(1) || 'NULL')
              FROM holed
              UNION ALL
              SELECT 'n_chars',
                     coalesce(n_chars::VARCHAR, chr(1) || 'NULL')
              FROM holed),
            counts AS (
              SELECT "column", value, count(*) AS n
              FROM long GROUP BY 1, 2),
            ranked AS (
              SELECT "column", value, n,
                     sum(n) OVER (PARTITION BY "column") AS n_rows,
                     row_number() OVER (
                       PARTITION BY "column"
                       ORDER BY n DESC, value DESC) AS r
              FROM counts)
            SELECT "column", value AS top_value, n::BIGINT AS n_top,
                   n_rows::BIGINT AS n_rows,
                   round(n / n_rows, 6) AS top_share
            FROM ranked WHERE r = 1 ORDER BY "column"
        """,
        "rate_cap": """
            SELECT user_id,
                   (floor(epoch(ts))::BIGINT // 3600) * 3600
                     AS window_start_s,
                   count(*)::BIGINT AS n_events
            FROM events
            GROUP BY 1, 2 HAVING count(*) > 1
            ORDER BY user_id, window_start_s
        """,
        "selflink_ratio": """
            WITH seeded AS (
              SELECT doc_id,
                     'http://host' || (doc_id % 6)::VARCHAR
                       || '.example/p/' || doc_id::VARCHAR AS url,
                     text || ' <a href="'
                       || CASE WHEN doc_id % 3 = 0
                          THEN '/q/' || doc_id::VARCHAR
                          ELSE 'http://host'
                            || (CASE WHEN doc_id % 2 = 0
                                THEN doc_id % 6
                                ELSE (doc_id + 1) % 6 END)::VARCHAR
                            || '.example/q/' || doc_id::VARCHAR END
                       || '">x</a>' AS text
              FROM documents),
            pages AS (
              SELECT doc_id,
                     lower(regexp_extract(
                       url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS src_host,
                     text
              FROM seeded WHERE url IS NOT NULL),
            matched AS (
              SELECT doc_id, src_host,
                     list_transform(
                       regexp_extract_all(text,
                         '(?i)href\\s*=\\s*(?:"([^"]*)"|''([^'']*)''|([^\\s>"'']+))'),
                       m -> regexp_replace(
                              regexp_replace(m, '(?i)^href\\s*=\\s*',
                                             '', 'g'),
                              '^["'']|["''>]+$', '', 'g')) AS links
              FROM pages),
            ex AS (
              SELECT src_host, unnest(links) AS href FROM matched),
            lk AS (
              SELECT src_host,
                     CASE WHEN regexp_matches(href,
                            '^[a-zA-Z][a-zA-Z0-9+.-]*://')
                          THEN lower(regexp_extract(href,
                            '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                          WHEN href LIKE '//%'
                          THEN lower(regexp_extract(href,
                            '^//([^/:?#]+)', 1))
                          ELSE src_host END AS dst_host
              FROM ex WHERE href != '' AND src_host != '')
            SELECT src_host AS host, count(*)::BIGINT AS n_links,
                   sum(CASE WHEN dst_host = src_host
                       THEN 1 ELSE 0 END)::BIGINT AS n_self,
                   round(sum(CASE WHEN dst_host = src_host
                             THEN 1 ELSE 0 END) / count(*), 6)
                     AS self_ratio
            FROM lk GROUP BY src_host ORDER BY host
        """,
        "schema_evolution": """
            WITH cur AS (
              SELECT column_name AS f,
                     CASE column_type
                       WHEN 'BIGINT' THEN 'bigint'
                       WHEN 'INTEGER' THEN 'int'
                       WHEN 'VARCHAR' THEN 'string'
                       WHEN 'DOUBLE' THEN 'double'
                       WHEN 'TIMESTAMP' THEN 'timestamp_ntz'
                       ELSE lower(column_type) END AS t
              FROM (DESCRIBE SELECT * FROM documents)),
            base AS (
              SELECT * FROM (VALUES
                ('doc_id', 'bigint'), ('text', 'string'),
                ('lang', 'int'), ('source', 'string'),
                ('quality', 'double')) AS v(f, t)),
            added AS (
              SELECT c.f AS field, 'added' AS change,
                     NULL AS from_type, c.t AS to_type
              FROM cur c LEFT JOIN base b ON b.f = c.f
              WHERE b.f IS NULL),
            removed AS (
              SELECT b.f, 'removed', b.t, NULL
              FROM base b LEFT JOIN cur c ON c.f = b.f
              WHERE c.f IS NULL),
            retyped AS (
              SELECT b.f, 'retyped', b.t, c.t
              FROM base b JOIN cur c ON c.f = b.f
              WHERE b.t != c.t)
            SELECT * FROM added
            UNION ALL SELECT * FROM removed
            UNION ALL SELECT * FROM retyped
            ORDER BY field
        """,
        "transition_audit": """
            WITH src AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN event_id % 97 = 0 THEN NULL
                          ELSE event_type END AS event_type
              FROM events),
            lagged AS (
              SELECT lag(event_type) OVER w AS from_type,
                     lag(1) OVER w AS prev_marker,
                     event_type AS to_type
              FROM src
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts, event_id))
            SELECT coalesce(from_type, '(null)') AS from_type,
                   coalesce(to_type, '(null)') AS to_type,
                   count(*)::BIGINT AS n
            FROM lagged
            WHERE prev_marker IS NOT NULL
              AND NOT coalesce(
                       (from_type = 'signup' AND to_type = 'view')
                    OR (from_type = 'view' AND to_type = 'click')
                    OR (from_type = 'click' AND to_type = 'purchase')
                    OR (from_type = 'view' AND to_type = 'view')
                    OR (from_type = 'click' AND to_type = 'view')
                    OR (from_type = 'purchase' AND to_type = 'view'),
                    FALSE)
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        "canonical_audit": """
            WITH seeded AS (
              SELECT 'http://host' || (doc_id % 5)::VARCHAR
                       || '.example/p/' || doc_id::VARCHAR AS url,
                     text || CASE WHEN doc_id % 3 != 2
                       THEN ' <link rel="canonical" href="'
                         || CASE WHEN doc_id % 4 = 0
                            THEN 'http://mirror.example/p/'
                              || doc_id::VARCHAR
                            WHEN doc_id % 4 = 1
                            THEN '/p/' || doc_id::VARCHAR
                            ELSE 'http://host' || (doc_id % 5)::VARCHAR
                              || '.example/p/' || doc_id::VARCHAR END
                         || '">'
                       ELSE '' END AS text
              FROM documents),
            base AS (
              SELECT url,
                     lower(regexp_extract(
                       url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS host,
                     {self_canon} AS self_c,
                     regexp_extract(text,
                       '(?i)<link[^>]*rel=["\\x27]?canonical["\\x27]?[^>]*href=["\\x27]?([^"\\x27> ]+)',
                       1) AS decl
              FROM seeded WHERE url IS NOT NULL),
            resolved AS (
              SELECT host, self_c, {decl_resolved} AS decl
              FROM base WHERE decl != '' AND host != ''),
            declared AS (
              SELECT host, self_c, decl,
                     {decl_canon} AS decl_c
              FROM resolved)
            SELECT host, count(*)::BIGINT AS n_canonical,
                   sum(CASE WHEN decl_c != self_c
                       THEN 1 ELSE 0 END)::BIGINT AS n_mismatch,
                   round(sum(CASE WHEN decl_c != self_c
                             THEN 1 ELSE 0 END) / count(*), 6)
                     AS mismatch_rate
            FROM declared GROUP BY host ORDER BY host
        """.replace("{self_canon}", _url_canonical_sql("url"))
           .replace("{decl_resolved}", _resolve_href_sql("decl", "url"))
           .replace("{decl_canon}", _url_canonical_sql("decl")),
        "staleness_audit": """
            WITH seeded AS (
              SELECT (doc_id % 10) AS h,
                     1704067200
                       + ((doc_id % 10) * 8 + (doc_id % 5)) * 86400
                       AS t
              FROM documents),
            per_host AS (
              SELECT 'host' || h::VARCHAR || '.example' AS host,
                     max(t)::BIGINT AS last_fetch_s,
                     count(*)::BIGINT AS n_fetches
              FROM seeded GROUP BY h),
            wm AS (SELECT max(t)::BIGINT AS w FROM seeded)
            SELECT host, last_fetch_s,
                   (w - last_fetch_s)::BIGINT AS age_s, n_fetches
            FROM per_host, wm
            WHERE w - last_fetch_s > 30 * 86400
            ORDER BY host
        """,
        "rater_kappa": """
            WITH pairs AS (
              SELECT lang AS a,
                     CASE WHEN doc_id % 5 = 0 THEN 'unk'
                          ELSE lang END AS b
              FROM documents WHERE lang IS NOT NULL),
            cells AS (
              SELECT a, b, count(*) AS n FROM pairs GROUP BY a, b),
            tot AS (
              SELECT sum(n) AS n,
                     sum(CASE WHEN a = b THEN n ELSE 0 END) AS n_agree
              FROM cells),
            ma AS (SELECT a, sum(n) AS na FROM cells GROUP BY a),
            mb AS (SELECT b, sum(n) AS nb FROM cells GROUP BY b),
            pe AS (SELECT coalesce(sum(na * nb), 0) AS pe_num
                   FROM ma JOIN mb ON ma.a = mb.b)
            SELECT n::BIGINT AS n,
                   round(n_agree / n, 6) AS po,
                   round(pe_num / (n * n), 6) AS pe,
                   round((n_agree / n - pe_num / (n * n))
                         / (1 - pe_num / (n * n)), 6) AS kappa
            FROM tot, pe
        """,
        "coverage_langs": """
            WITH seeded AS (
              SELECT lang,
                     CASE WHEN regexp_extract(source, '(\\d+)', 1)::BIGINT
                            % 2 = 0 THEN 'even' ELSE 'odd' END AS p
              FROM documents WHERE lang IS NOT NULL),
            filt AS (SELECT * FROM seeded
                     WHERE NOT (lang = 'zh' AND p = 'odd')),
            cells AS (
              SELECT lang, p, count(*) AS n FROM filt GROUP BY lang, p),
            da AS (SELECT DISTINCT lang FROM cells),
            db AS (SELECT DISTINCT p FROM cells)
            SELECT da.lang, db.p AS src_parity,
                   coalesce(c.n, 0)::BIGINT AS n
            FROM da CROSS JOIN db
            LEFT JOIN cells c ON c.lang = da.lang AND c.p = db.p
            WHERE coalesce(c.n, 0) < 1
            ORDER BY da.lang, src_parity
        """,
        "cms_lang_counts": """
            WITH vals AS (
              SELECT lang AS v FROM documents WHERE lang IS NOT NULL),
            cells AS (
              SELECT d.i,
                     ('0x' || substr(md5(d.i::VARCHAR || '|' || v),
                                     1, 12))::BIGINT % 64 AS bkt,
                     count(*) AS n
              FROM vals CROSS JOIN (VALUES (0), (1), (2)) d(i)
              GROUP BY 1, 2),
            look AS (
              SELECT p.value, d.i,
                     ('0x' || substr(md5(d.i::VARCHAR || '|' || p.value),
                                     1, 12))::BIGINT % 64 AS bkt
              FROM (VALUES ('en'), ('de'), ('xx')) p(value)
              CROSS JOIN (VALUES (0), (1), (2)) d(i))
            SELECT value, min(coalesce(c.n, 0))::BIGINT AS est_n
            FROM look l LEFT JOIN cells c
              ON c.i = l.i AND c.bkt = l.bkt
            GROUP BY value ORDER BY value
        """,
        "ewma_volume": """
            WITH daily AS (
              SELECT ts::DATE AS day, count(*) AS n
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            ranked AS (
              SELECT day, n,
                     row_number() OVER (ORDER BY day) AS r
              FROM daily),
            ew AS (
              SELECT c.day, c.n,
                     sum(power(0.5, c.r - 1 - p.r) * p.n)
                       / sum(power(0.5, c.r - 1 - p.r)) AS e
              FROM ranked c JOIN ranked p ON p.r < c.r
              GROUP BY c.day, c.n),
            allr AS (
              SELECT day, n, e FROM ew
              UNION ALL
              SELECT day, n, NULL FROM ranked WHERE r = 1)
            SELECT day, n::BIGINT AS n_events,
                   round(e, 6) AS ewma_prev,
                   round(n / e, 6) AS ratio,
                   coalesce(n / e > 1.2, FALSE) AS is_anomaly
            FROM allr ORDER BY day
        """,
        "fdr_drift": """
            WITH seeded AS (
              SELECT source,
                     CASE WHEN doc_id % 20 = 0
                          THEN ((doc_id % 7) + 1) / 10000.0
                          ELSE ((doc_id * 37) % 900 + 100) / 1000.0
                     END AS p
              FROM documents),
            r AS (
              SELECT source, p,
                     row_number() OVER (
                       PARTITION BY source ORDER BY p) AS i,
                     count(*) OVER (PARTITION BY source) AS m
              FROM seeded WHERE p IS NOT NULL)
            SELECT source, count(*)::BIGINT AS n_tests,
                   coalesce(max(CASE WHEN p * m <= i * 0.05
                                THEN i END), 0)::BIGINT AS n_rejected,
                   round(max(CASE WHEN p * m <= i * 0.05 THEN p END),
                         6) AS p_crit
            FROM r GROUP BY source ORDER BY source
        """,
        "welch_len_sources": """
            WITH g AS (
              SELECT source, count(*)::DOUBLE AS n,
                     sum(n_chars)::DOUBLE AS s,
                     sum(n_chars * n_chars)::DOUBLE AS q2
              FROM documents
              WHERE source IN ('src0', 'src1') AND n_chars IS NOT NULL
              GROUP BY source),
            a AS (SELECT n AS na, s AS sa, q2 AS qa FROM g
                  WHERE source = 'src0'),
            b AS (SELECT n AS nb, s AS sb, q2 AS qb FROM g
                  WHERE source = 'src1'),
            j AS (SELECT * FROM a, b),
            d AS (
              SELECT na, nb, sa / na AS ma, sb / nb AS mb,
                     (qa - sa * sa / na) / (na - 1) AS va,
                     (qb - sb * sb / nb) / (nb - 1) AS vb
              FROM j),
            e AS (
              SELECT na, nb, ma, mb, va, vb,
                     va / na + vb / nb AS se2
              FROM d)
            SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
                   round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
                   round((ma - mb) / sqrt(se2), 6) AS t_stat,
                   round((se2 * se2)
                         / ((va / na) * (va / na) / (na - 1)
                            + (vb / nb) * (vb / nb) / (nb - 1)), 6)
                     AS df_welch
            FROM e
        """,
        "spearman_len_tokens": """
            WITH base AS (
              SELECT n_chars AS x,
                     array_length(string_split(text, ' '))::BIGINT AS y
              FROM documents
              WHERE text IS NOT NULL AND n_chars IS NOT NULL),
            vx AS (SELECT x, count(*) AS c FROM base GROUP BY x),
            rx AS (SELECT x,
                     (2 * coalesce(sum(c) OVER (
                        ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + c + 1)::HUGEINT AS r2x
                   FROM vx),
            vy AS (SELECT y, count(*) AS c FROM base GROUP BY y),
            ry AS (SELECT y,
                     (2 * coalesce(sum(c) OVER (
                        ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) + c + 1)::HUGEINT AS r2y
                   FROM vy),
            jj AS (SELECT r2x AS a, r2y AS b
                   FROM base JOIN rx USING (x) JOIN ry USING (y)),
            s AS (SELECT count(*)::DOUBLE AS n,
                         sum(a)::DOUBLE AS sx, sum(b)::DOUBLE AS sy,
                         sum(a * a)::DOUBLE AS sxx,
                         sum(b * b)::DOUBLE AS syy,
                         sum(a * b)::DOUBLE AS sxy
                  FROM jj)
            SELECT n::BIGINT AS n,
                   CASE WHEN (n * sxx - sx * sx)
                             * (n * syy - sy * sy) > 0
                        THEN round((n * sxy - sx * sy)
                                   / sqrt((n * sxx - sx * sx)
                                          * (n * syy - sy * sy)), 6)
                   END AS rho
            FROM s
        """,
        "pass_rate_ztest": """
            WITH g AS (
              SELECT source, count(*) AS n,
                     sum(CASE WHEN n_chars >= 128 THEN 1 ELSE 0 END)
                       AS k
              FROM documents WHERE source IN ('src0', 'src1')
              GROUP BY source),
            a AS (SELECT n AS na, k AS ka FROM g WHERE source = 'src0'),
            b AS (SELECT n AS nb, k AS kb FROM g WHERE source = 'src1'),
            j AS (SELECT na::DOUBLE AS na, ka::DOUBLE AS ka,
                         nb::DOUBLE AS nb, kb::DOUBLE AS kb
                  FROM a, b),
            d AS (
              SELECT na, ka, nb, kb, ka / na AS pa, kb / nb AS pb,
                     sqrt(((ka + kb) / (na + nb))
                          * (1 - (ka + kb) / (na + nb))
                          * (1 / na + 1 / nb)) AS se
              FROM j)
            SELECT na::BIGINT AS n_a, ka::BIGINT AS k_a,
                   nb::BIGINT AS n_b, kb::BIGINT AS k_b,
                   round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
                   CASE WHEN se > 0
                        THEN round((pa - pb) / se, 6) END AS z_stat
            FROM d
        """,
        "runs_pass_audit": """
            WITH f AS (
              SELECT user_id, ts, event_id,
                     (event_type = 'view') AS fl
              FROM events),
            l AS (
              SELECT user_id, fl,
                     CASE WHEN lag(fl) OVER w IS NULL
                            OR lag(fl) OVER w = fl
                          THEN 0 ELSE 1 END AS s
              FROM f
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts, event_id)),
            per AS (
              SELECT user_id, count(*) AS n,
                     sum(CASE WHEN fl THEN 1 ELSE 0 END) AS n1,
                     sum(s) + 1 AS runs
              FROM l GROUP BY user_id),
            d AS (
              SELECT user_id, n, n1, runs,
                     n::DOUBLE AS nd, n1::DOUBLE AS n1d,
                     (n - n1)::DOUBLE AS n0d
              FROM per WHERE n1 >= 5 AND n - n1 >= 5)
            SELECT user_id, n::BIGINT AS n, n1::BIGINT AS n_true,
                   runs::BIGINT AS n_runs,
                   round((runs::DOUBLE - (2 * n1d * n0d / nd + 1))
                         / sqrt((2 * n1d * n0d * (2 * n1d * n0d - nd))
                                / (nd * nd * (nd - 1))), 6) AS z_stat
            FROM d ORDER BY user_id
        """,
        "hapax_langs": f"""
            WITH tk AS (
              SELECT lang,
                     unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                        x -> x != '')) AS tok
              FROM documents WHERE lang IS NOT NULL),
            tc AS (
              SELECT lang, tok, count(*) AS c FROM tk GROUP BY 1, 2)
            SELECT lang, count(*)::BIGINT AS vocab_size,
                   sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT
                     AS n_hapax,
                   round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                         / count(*), 6) AS hapax_share,
                   sum(c)::BIGINT AS n_tokens
            FROM tc GROUP BY lang ORDER BY lang
        """,
        "quality_migration": """
            WITH seeded AS (
              SELECT (doc_id % 2)::INT AS snap,
                     doc_id // 2 AS page,
                     (CASE WHEN doc_id % 2 = 1
                             AND (doc_id // 2) % 5 = 0
                           THEN ((doc_id // 2) * 31 + 37) % 100
                           ELSE ((doc_id // 2) * 31) % 100
                      END)::DOUBLE AS score
              FROM documents),
            bucketed AS (
              SELECT snap, page,
                     ((score >= 25)::INT + (score >= 50)::INT
                      + (score >= 75)::INT)::BIGINT AS b
              FROM seeded WHERE score IS NOT NULL),
            a AS (SELECT page, min(b) AS from_bucket FROM bucketed
                  WHERE snap = 0 GROUP BY page),
            c AS (SELECT page, min(b) AS to_bucket FROM bucketed
                  WHERE snap = 1 GROUP BY page)
            SELECT from_bucket, to_bucket, count(*)::BIGINT AS n
            FROM a JOIN c USING (page)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "median_lang_lens": """
            WITH base AS (
              SELECT lang, n_chars FROM documents
              WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
            med AS (SELECT quantile_cont(n_chars, 0.5) AS m FROM base),
            cells AS (
              SELECT lang, count(*) AS n,
                     sum(CASE WHEN n_chars > (SELECT m FROM med)
                         THEN 1 ELSE 0 END) AS a
              FROM base GROUP BY lang),
            tot AS (SELECT sum(n) AS tn, sum(a) AS ta FROM cells),
            j AS (SELECT * FROM cells, tot),
            t AS (
              SELECT n, a,
                     n * ta / tn AS ea,
                     n * (tn - ta) / tn AS eb
              FROM j)
            SELECT count(*)::BIGINT AS n_groups,
                   sum(n)::BIGINT AS n_rows,
                   round(sum((a - ea) * (a - ea) / ea
                             + ((n - a) - eb) * ((n - a) - eb) / eb),
                         6) AS chi2,
                   (count(*) - 1)::BIGINT AS dof
            FROM t
        """,
        "host_pass_shrunk": """
            WITH seeded AS (
              SELECT 'host' || (doc_id % 10)::VARCHAR AS host,
                     (n_chars >= 128) AS ok
              FROM documents),
            cells AS (
              SELECT host, count(*) AS n,
                     sum(CASE WHEN ok THEN 1 ELSE 0 END) AS k
              FROM seeded GROUP BY host),
            tot AS (SELECT sum(k) / sum(n) AS mu FROM cells)
            SELECT host, n::BIGINT AS n, k::BIGINT AS k,
                   round(k / n, 6) AS rate_raw,
                   round((k + 100.0 * (SELECT mu FROM tot))
                         / (n + 100.0), 6) AS rate_shrunk
            FROM cells ORDER BY host
        """,
        "url_ext_mix": """
            WITH seeded AS (
              SELECT 'http://h' || (doc_id % 3)::VARCHAR
                       || '.example/p/'
                       || CASE doc_id % 7
                          WHEN 0 THEN 'page'
                          WHEN 1 THEN 'a.html'
                          WHEN 2 THEN 'index.php'
                          WHEN 3 THEN 'UP.HTML'
                          WHEN 4 THEN 'img.jpg'
                          WHEN 5 THEN 'dir/'
                          ELSE 'pkg.tar.gz' END AS url
              FROM documents),
            cells AS (
              SELECT lower(regexp_extract(url,
                       '^[^?#]*/[^/?#]*\\.([^./?#]+)([?#]|$)', 1))
                       AS ext,
                     count(*) AS n_urls
              FROM seeded WHERE url IS NOT NULL GROUP BY 1),
            tot AS (SELECT sum(n_urls) AS t FROM cells)
            SELECT ext, n_urls::BIGINT AS n_urls,
                   round(n_urls / (SELECT t FROM tot), 6) AS share
            FROM cells ORDER BY ext
        """,
        "jsd_lang_drift": """
            WITH seeded AS (
              SELECT (doc_id % 2)::INT AS snap, lang FROM documents
              WHERE lang IS NOT NULL),
            cells AS (
              SELECT lang,
                     sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS a,
                     sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS b
              FROM seeded GROUP BY lang),
            tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM cells),
            j AS (SELECT a, b, a / ta AS p, b / tb AS q
                  FROM cells, tot),
            t AS (
              SELECT a, b,
                     CASE WHEN a > 0
                          THEN p * ln(p / ((p + q) / 2)) / 2
                          ELSE 0 END
                     + CASE WHEN b > 0
                            THEN q * ln(q / ((p + q) / 2)) / 2
                            ELSE 0 END AS term
              FROM j)
            SELECT count(*)::BIGINT AS n_buckets,
                   sum(a)::BIGINT AS n_base, sum(b)::BIGINT AS n_curr,
                   round(sum(term), 6) AS jsd_nats,
                   round(sum(term) / ln(2), 6) AS jsd_bits
            FROM t
        """,
        "url_depth_mix": """
            WITH seeded AS (
              SELECT 'http://h' || (doc_id % 3)::VARCHAR || '.example'
                       || CASE doc_id % 6
                          WHEN 0 THEN ''
                          WHEN 1 THEN '/a'
                          WHEN 2 THEN '/a/b'
                          WHEN 3 THEN '/a/b/c?x=1'
                          WHEN 4 THEN '/a/'
                          ELSE '/a/b/c/d/e' END AS url
              FROM documents),
            cells AS (
              SELECT len(list_filter(string_split(
                       regexp_extract(url,
                         '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)',
                         1), '/'), x -> x != ''))::BIGINT AS depth,
                     count(*) AS n_urls
              FROM seeded WHERE url IS NOT NULL GROUP BY 1),
            tot AS (SELECT sum(n_urls) AS t FROM cells)
            SELECT depth, n_urls::BIGINT AS n_urls,
                   round(n_urls / (SELECT t FROM tot), 6) AS share
            FROM cells ORDER BY depth
        """,
        "idn_hosts": """
            WITH seeded AS (
              SELECT (doc_id % 10) AS k, ((doc_id % 10) % 5) AS shape
              FROM documents),
            hosts AS (
              SELECT DISTINCT
                     CASE shape
                       WHEN 0 THEN 'site' || k::VARCHAR || '.example.com'
                       WHEN 1 THEN 'xn--site' || k::VARCHAR || '.example'
                       WHEN 2 THEN k::VARCHAR || '23456789.net'
                       WHEN 3 THEN 's-i-t-e' || k::VARCHAR || '.shop'
                       ELSE repeat('a', 40) || k::VARCHAR || '.org'
                     END AS h
              FROM seeded),
            flags AS (
              SELECT h,
                     regexp_matches(h, '(^|\\.)xn--') AS puny,
                     (length(regexp_replace(h, '[^0-9]', '', 'g'))
                      / length(h)) >= 0.25 AS dig,
                     length(regexp_replace(h, '[^-]', '', 'g')) > 2
                       AS hyp,
                     length(h) > 39 AS lng
              FROM hosts)
            SELECT count(*)::BIGINT AS n_hosts,
                   sum(puny::INT)::BIGINT AS n_punycode,
                   sum(dig::INT)::BIGINT AS n_digit_heavy,
                   sum(hyp::INT)::BIGINT AS n_hyphen_heavy,
                   sum(lng::INT)::BIGINT AS n_long,
                   round(sum((puny OR dig OR hyp OR lng)::INT)
                         / count(*), 6) AS share_flagged
            FROM flags
        """,
        "lsh_curve": """
            SELECT round((range + 1) / 20.0, 6) AS s,
                   round(1 - pow(1 - pow(round((range + 1) / 20.0, 6),
                                         8.0), 8.0), 6) AS p_candidate,
                   8::BIGINT AS bands, 8::BIGINT AS rows_per_band,
                   round(pow(1.0 / 8.0, 1.0 / 8.0), 6) AS midpoint
            FROM range(19) ORDER BY s
        """,
        "neyman_alloc": """
            WITH cells AS (
              SELECT lang AS stratum, count(*) AS n,
                     sum(n_chars) AS s1,
                     sum(n_chars * n_chars) AS s2
              FROM documents
              WHERE n_chars IS NOT NULL AND lang IS NOT NULL
              GROUP BY lang),
            m AS (
              SELECT stratum, n,
                     sqrt(greatest(
                       CASE WHEN n > 1
                            THEN (s2 - s1 * s1 / n) / (n - 1)
                            ELSE 0 END, 0)) AS sigma
              FROM cells),
            tot AS (SELECT sum(n * sigma) AS tw FROM m)
            SELECT stratum, n::BIGINT AS n_rows,
                   round(sigma, 6) AS sigma,
                   round(CASE WHEN (SELECT tw FROM tot) > 0
                         THEN n * sigma / (SELECT tw FROM tot)
                         ELSE 0 END, 6) AS alloc_share,
                   floor(1000 * CASE WHEN (SELECT tw FROM tot) > 0
                         THEN n * sigma / (SELECT tw FROM tot)
                         ELSE 0 END)::BIGINT AS alloc_n
            FROM m ORDER BY stratum
        """,
        "bm25_spark_docs": f"""
            WITH base AS (
              SELECT doc_id,
                     list_filter(string_split({_NORM_SQL}, ' '),
                                 x -> x != '') AS t
              FROM documents
              WHERE text IS NOT NULL AND doc_id IS NOT NULL),
            d AS (SELECT doc_id, len(t) AS dl, unnest(t) AS tok
                  FROM base),
            tf AS (
              SELECT doc_id, tok, count(*) AS tf, min(dl) AS dl
              FROM d WHERE tok IN ('hash', 'spark', 'window')
              GROUP BY 1, 2),
            dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
            st AS (SELECT count(*) AS n, avg(len(t)) AS avgdl
                   FROM base),
            sc AS (
              SELECT doc_id,
                     round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                           * tf * (1.2 + 1)
                           / (tf + 1.2 * (1 - 0.75
                                          + 0.75 * dl / avgdl))), 6)
                       AS score
              FROM tf JOIN dfq USING (tok), st GROUP BY doc_id)
            SELECT doc_id, score FROM sc
            ORDER BY score DESC, doc_id LIMIT 20
        """,
        "postings_sample": f"""
            WITH pairs AS (
              SELECT tok, doc_id, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                          x -> x != '')) AS tok
                FROM documents
                WHERE text IS NOT NULL AND doc_id IS NOT NULL)
              GROUP BY 1, 2)
            SELECT tok AS token, count(*)::BIGINT AS df,
                   sum(tf)::BIGINT AS cf,
                   (list_sort(list(doc_id)))[1:8] AS postings
            FROM pairs GROUP BY tok HAVING count(*) >= 2
            ORDER BY token
        """,
        "theil_len_sources": """
            WITH cells AS (
              SELECT source AS g, count(*) AS n, sum(n_chars) AS s,
                     sum(n_chars * ln(n_chars)) AS sl
              FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0
                AND source IS NOT NULL
              GROUP BY source),
            tot AS (SELECT sum(n) AS tn, sum(s) AS ts, sum(sl) AS tsl
                    FROM cells),
            j AS (SELECT * FROM cells, tot),
            agg AS (
              SELECT sum(n) AS n_rows, count(*) AS n_groups,
                     min(tsl / ts - ln(ts / tn)) AS t_total,
                     sum((s / ts) * ln((s / n) / (ts / tn)))
                       AS t_between,
                     sum((s / ts) * (sl / s - ln(s / n))) AS t_within
              FROM j)
            SELECT n_rows::BIGINT AS n_rows, n_groups::BIGINT AS n_groups,
                   round(t_total, 6) AS theil_total,
                   round(t_between, 6) AS theil_between,
                   round(t_within, 6) AS theil_within,
                   CASE WHEN round(t_total, 6) > 0
                        THEN round(round(t_between, 6)
                                   / round(t_total, 6), 6)
                        ELSE 0.0 END AS between_share
            FROM agg
        """,
        "code_switch_docs": """
            WITH l AS (SELECT doc_id // 2 AS pid, text AS t0
                       FROM documents WHERE doc_id % 2 = 0),
            r AS (SELECT doc_id // 2 AS pid,
                         CASE lang
                           WHEN 'de' THEN 'der die und das nicht '
                                       || 'der die und das nicht'
                           WHEN 'fr' THEN 'le la et les des '
                                       || 'le la et les des'
                           WHEN 'es' THEN 'el los que por una '
                                       || 'el los que por una'
                           WHEN 'en' THEN 'the and of to in '
                                       || 'the and of to in'
                           ELSE '' END || ' ' || text AS t1
                  FROM documents WHERE doc_id % 2 = 1),
            seeded AS (
              SELECT pid AS doc_id, t0 || '. ' || t1 AS text
              FROM l JOIN r USING (pid)),
            segs AS (
              SELECT doc_id,
                     unnest(string_split_regex(text, '[.!?]+\\s+'))
                       AS seg
              FROM seeded
              WHERE text IS NOT NULL AND doc_id IS NOT NULL),
            scored AS (
              SELECT doc_id,
                len(regexp_extract_all(seg,
                  '(?i)\\b(the|and|of|to|in)\\b'))::BIGINT AS s_en,
                len(regexp_extract_all(seg,
                  '(?i)\\b(der|die|und|das|nicht)\\b'))::BIGINT AS s_de,
                len(regexp_extract_all(seg,
                  '(?i)\\b(le|la|et|les|des)\\b'))::BIGINT AS s_fr,
                len(regexp_extract_all(seg,
                  '(?i)\\b(el|los|que|por|una)\\b'))::BIGINT AS s_es
              FROM segs WHERE trim(seg) != ''),
            pred AS (
              SELECT doc_id,
                     CASE
                       WHEN s_en > 0 AND s_en > greatest(s_de, s_fr, s_es)
                         THEN 'en'
                       WHEN s_de > 0 AND s_de > greatest(s_en, s_fr, s_es)
                         THEN 'de'
                       WHEN s_fr > 0 AND s_fr > greatest(s_en, s_de, s_es)
                         THEN 'fr'
                       WHEN s_es > 0 AND s_es > greatest(s_en, s_de, s_fr)
                         THEN 'es'
                       ELSE 'und'
                     END AS p
              FROM scored),
            per AS (
              SELECT doc_id, count(*) AS nseg,
                     count(DISTINCT CASE WHEN p != 'und' THEN p END)
                       AS nlang
              FROM pred GROUP BY doc_id)
            SELECT count(*)::BIGINT AS n_docs,
                   sum((nseg > 1)::INT)::BIGINT AS n_multiseg,
                   sum((nlang > 1)::INT)::BIGINT AS n_mixed,
                   round(sum((nlang > 1)::INT) / count(*), 6)
                     AS share_mixed
            FROM per
        """,
        "partition_plan": """
            WITH agg AS (
              SELECT count(*) AS n,
                     sum(strlen(text) + 64) AS b,
                     max(strlen(text) + 64) AS m
              FROM documents WHERE text IS NOT NULL)
            SELECT n::BIGINT AS n_rows,
                   round(b / n, 6) AS avg_row_bytes,
                   m::BIGINT AS max_row_bytes,
                   round(b / (1024.0 * 1024.0), 6) AS est_total_mb,
                   greatest(floor(1048576 / (b / n)), 1)::BIGINT
                     AS rows_per_partition,
                   ceil(n / greatest(floor(1048576 / (b / n)), 1))
                     ::BIGINT AS n_partitions
            FROM agg
        """,
        "shape_templates": f"""
            WITH seeded AS (
              SELECT CASE doc_id % 4
                       WHEN 0 THEN 'ID ' || doc_id::VARCHAR || ' - '
                                   || text
                       WHEN 1 THEN '[2024-01-15] ' || text
                       WHEN 2 THEN '*** ' || text
                       ELSE text END AS text
              FROM documents),
            cells AS (
              SELECT regexp_replace(
                       regexp_replace(
                         substr({_NORM_SQL}, 1, 40),
                         '[a-z]+', 'a', 'g'),
                       '[0-9]+', '0', 'g') AS template,
                     count(*) AS n_docs
              FROM seeded WHERE text IS NOT NULL GROUP BY 1),
            tot AS (SELECT sum(n_docs) AS t FROM cells)
            SELECT template, n_docs::BIGINT AS n_docs,
                   round(n_docs / (SELECT t FROM tot), 6) AS share
            FROM cells ORDER BY template
        """,
        "term_burstiness": f"""
            WITH pairs AS (
              SELECT tok, doc_id, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                          x -> x != '')) AS tok
                FROM documents
                WHERE text IS NOT NULL AND doc_id IS NOT NULL)
              GROUP BY 1, 2),
            terms AS (
              SELECT tok AS token, count(*)::BIGINT AS df,
                     sum(tf)::BIGINT AS cf
              FROM pairs GROUP BY tok HAVING count(*) >= 5)
            SELECT token, df, cf, round(cf / df, 6) AS burst
            FROM terms ORDER BY burst DESC, token LIMIT 15
        """,
        "lexical_hhi": f"""
            WITH tf AS (
              SELECT doc_id, tok, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                          x -> x != '')) AS tok
                FROM documents
                WHERE text IS NOT NULL AND doc_id IS NOT NULL)
              GROUP BY 1, 2),
            per_doc AS (
              SELECT doc_id, sum(tf * tf) AS s2, sum(tf) AS s1
              FROM tf GROUP BY doc_id),
            cells AS (
              SELECT least(floor(10.0 * s2 / (s1 * s1)), 9)::BIGINT
                       AS bucket,
                     count(*) AS n_docs
              FROM per_doc GROUP BY 1),
            tot AS (SELECT sum(n_docs) AS t FROM cells)
            SELECT bucket, n_docs::BIGINT AS n_docs,
                   round(n_docs / (SELECT t FROM tot), 6) AS share
            FROM cells ORDER BY bucket
        """,
        "url_prefix_compression": """
            WITH seeded AS (
              SELECT 'http://h' || (doc_id % 5)::VARCHAR
                       || '.example/section' || (doc_id % 20)::VARCHAR
                       || '/page' || doc_id::VARCHAR AS url
              FROM documents),
            base AS (
              SELECT url AS u,
                     regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)
                       AS h
              FROM seeded WHERE url IS NOT NULL),
            withp AS (
              SELECT u, lag(u) OVER (PARTITION BY h ORDER BY u) AS p
              FROM base WHERE h != '')
            SELECT count(*)::BIGINT AS n_urls,
                   count(p)::BIGINT AS n_pairs,
                   round(sum(CASE WHEN p IS NOT NULL
                             AND substr(u, 1, 8) = substr(p, 1, 8)
                             THEN 1 ELSE 0 END) / count(p), 6)
                     AS share_p8,
                   round(sum(CASE WHEN p IS NOT NULL
                             AND substr(u, 1, 16) = substr(p, 1, 16)
                             THEN 1 ELSE 0 END) / count(p), 6)
                     AS share_p16,
                   round(sum(CASE WHEN p IS NOT NULL
                             AND substr(u, 1, 32) = substr(p, 1, 32)
                             THEN 1 ELSE 0 END) / count(p), 6)
                     AS share_p32
            FROM withp
        """,
        "k_anonymity_docs": """
            WITH classes AS (
              SELECT lang, source, (n_chars // 100) AS len_bucket,
                     count(*) AS n
              FROM documents GROUP BY 1, 2, 3)
            SELECT sum(n)::BIGINT AS n_rows,
                   count(*)::BIGINT AS n_classes,
                   min(n)::BIGINT AS min_class_size,
                   sum(CASE WHEN n < 5 THEN 1 ELSE 0 END)::BIGINT
                     AS n_small_classes,
                   sum(CASE WHEN n < 5 THEN n ELSE 0 END)::BIGINT
                     AS n_rows_at_risk,
                   round(sum(CASE WHEN n < 5 THEN n ELSE 0 END)
                         / sum(n), 6) AS share_at_risk,
                   5::BIGINT AS k
            FROM classes
        """,
        "split_leakage_docs": _split_leakage_sql(),
        "golden_urls": """
            WITH seeded AS (
              SELECT 'u' || (doc_id % 50)::VARCHAR AS entity,
                     doc_id AS version_ts,
                     CASE WHEN doc_id % 3 != 0 THEN lang END AS lang,
                     CASE WHEN doc_id % 4 != 0 THEN n_chars END
                       AS n_chars
              FROM documents)
            SELECT entity, count(*)::BIGINT AS n_versions,
                   min(version_ts) AS first_ts,
                   max(version_ts) AS last_ts,
                   arg_max(lang, CASE WHEN lang IS NOT NULL
                                 THEN version_ts END) AS lang,
                   arg_max(n_chars, CASE WHEN n_chars IS NOT NULL
                                    THEN version_ts END) AS n_chars
            FROM seeded
            WHERE entity IS NOT NULL AND version_ts IS NOT NULL
            GROUP BY entity ORDER BY entity
        """,
        "km_purchase": """
            WITH per AS (
              SELECT user_id, min(epoch(ts)) AS entry,
                     min(CASE WHEN event_type = 'purchase'
                         THEN epoch(ts) END) AS ev,
                     max(epoch(ts)) AS lastts
              FROM events WHERE user_id IS NOT NULL
              GROUP BY user_id),
            h AS (SELECT max(lastts) AS hz FROM per),
            marks AS (
              SELECT floor((CASE WHEN ev IS NOT NULL THEN ev - entry
                            ELSE hz - entry END) / 3600)::BIGINT
                       AS t_bucket,
                     count(*) AS alln,
                     sum(CASE WHEN ev IS NOT NULL THEN 1 ELSE 0 END)
                       AS d
              FROM per, h GROUP BY 1),
            curve AS (
              SELECT t_bucket,
                     sum(alln) OVER ()
                       - coalesce(sum(alln) OVER (
                           ORDER BY t_bucket ROWS BETWEEN UNBOUNDED
                           PRECEDING AND 1 PRECEDING), 0) AS n_risk,
                     d AS n_events
              FROM marks),
            kmq AS (
              SELECT t_bucket, n_risk, n_events,
                     exp(sum(CASE WHEN n_events > 0
                                  AND n_events < n_risk
                             THEN ln(1 - n_events / n_risk)
                             ELSE 0 END)
                         OVER (ORDER BY t_bucket ROWS BETWEEN
                               UNBOUNDED PRECEDING AND CURRENT ROW))
                       AS sv,
                     max(CASE WHEN n_events >= n_risk THEN 1
                         ELSE 0 END)
                         OVER (ORDER BY t_bucket ROWS BETWEEN
                               UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS absorbed
              FROM curve)
            SELECT t_bucket, n_risk::BIGINT AS n_risk,
                   n_events::BIGINT AS n_events,
                   CASE WHEN absorbed = 1 THEN 0.0
                        ELSE round(sv, 6) END AS survival
            FROM kmq WHERE n_events > 0 ORDER BY t_bucket
        """,
        "bag_dedup_groups": f"""
            WITH rev AS (
              SELECT doc_id + 1000000 AS doc_id,
                     array_to_string(
                       list_reverse(string_split({_NORM_SQL}, ' ')),
                       ' ') AS text
              FROM documents WHERE doc_id % 10 = 0),
            seeded AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id, text FROM rev),
            base AS (
              SELECT doc_id,
                     md5(array_to_string(list_sort(
                       list_filter(string_split({_NORM_SQL}, ' '),
                                   x -> x != '')), ' ')) AS bag_fp,
                     md5({_NORM_SQL}) AS efp
              FROM seeded
              WHERE text IS NOT NULL AND doc_id IS NOT NULL)
            SELECT bag_fp, count(*)::BIGINT AS n_docs,
                   count(DISTINCT efp)::BIGINT AS n_exact_variants,
                   (list_sort(list(doc_id)))[1:8] AS sample_ids
            FROM base GROUP BY bag_fp
            HAVING count(*) > 1 AND count(DISTINCT efp) > 1
            ORDER BY bag_fp
        """,
        "logreg_len_gate": """
            WITH base AS (
              SELECT n_chars / 100.0 AS x,
                     CASE WHEN n_chars + 37 * (doc_id % 11) > 450
                          THEN 1.0 ELSE 0.0 END AS y
              FROM documents
              WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
            s AS (SELECT count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx,
                         sum(y) AS sy, sum(x * y) AS sxy
                  FROM base)
            SELECT n::BIGINT AS n,
                   round((sxx * (sy - n / 2.0) - sx * (sxy - sx / 2.0))
                         / ((n * sxx - sx * sx) / 4.0), 6) AS beta0,
                   round((n * (sxy - sx / 2.0) - sx * (sy - n / 2.0))
                         / ((n * sxx - sx * sx) / 4.0), 6) AS beta1
            FROM s
        """,
        "zorder_advisor": """
            WITH ing AS (
              SELECT ((row_number() OVER (ORDER BY doc_id)) - 1) // 50
                       AS f, n_chars AS v
              FROM documents WHERE n_chars IS NOT NULL),
            ingf AS (SELECT f, min(v) AS lo, max(v) AS hi FROM ing
                     GROUP BY f),
            clu AS (
              SELECT ((row_number() OVER (ORDER BY n_chars, doc_id))
                      - 1) // 50 AS f, n_chars AS v
              FROM documents WHERE n_chars IS NOT NULL),
            cluf AS (SELECT f, min(v) AS lo, max(v) AS hi FROM clu
                     GROUP BY f)
            SELECT 'ingest' AS ordering, count(*)::BIGINT AS n_files,
                   sum((hi >= 200 AND lo <= 250)::INT)::BIGINT
                     AS files_hit,
                   round(1.0 - sum((hi >= 200 AND lo <= 250)::INT)
                         / count(*), 6) AS skip_ratio
            FROM ingf
            UNION ALL
            SELECT 'clustered', count(*)::BIGINT,
                   sum((hi >= 200 AND lo <= 250)::INT)::BIGINT,
                   round(1.0 - sum((hi >= 200 AND lo <= 250)::INT)
                         / count(*), 6)
            FROM cluf
            ORDER BY ordering
        """,
        "rule_cooccurrence": f"""
            WITH v AS (SELECT DISTINCT doc_id, rule_id
                       FROM ({_FLAGSHIP_SQL}) WHERE doc_id IS NOT NULL)
            SELECT a.rule_id AS rule_a, b.rule_id AS rule_b,
                   count(*)::BIGINT AS n_docs
            FROM v a JOIN v b USING (doc_id)
            WHERE a.rule_id < b.rule_id
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "bootstrap_len_ci": """
            WITH base AS (
              SELECT doc_id::VARCHAR AS id, n_chars::BIGINT AS x
              FROM documents
              WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
            drawn AS (
              SELECT b.range AS b, x,
                     (('0x' || substr(md5(id || ':' || b.range::VARCHAR),
                                      1, 8))::UBIGINT)::DOUBLE
                       / 4294967296.0 AS u
              FROM base CROSS JOIN range(32) b),
            weighted AS (
              SELECT b, x,
                     CASE WHEN u < 0.36787944117144233 THEN 0
                          WHEN u < 0.7357588823428847 THEN 1
                          WHEN u < 0.9196986029286058 THEN 2
                          WHEN u < 0.9810118431238462 THEN 3
                          ELSE 4 END AS w
              FROM drawn),
            means AS (
              SELECT b, sum(w * x) / sum(w) AS m
              FROM weighted GROUP BY b),
            ci AS (SELECT quantile_cont(m, 0.05) AS lo,
                          quantile_cont(m, 0.95) AS hi FROM means),
            d AS (SELECT avg(x) AS mean FROM base)
            SELECT round(mean, 6) AS mean, round(lo, 6) AS ci_lo,
                   round(hi, 6) AS ci_hi, 32::BIGINT AS n_resamples
            FROM d, ci
        """,
        "event_lateness": """
            WITH seeded AS (
              SELECT user_id, ts,
                     ('0x' || substr(md5(event_id::VARCHAR), 1, 8))
                       ::UBIGINT::BIGINT AS arrival
              FROM events),
            late AS (
              SELECT floor((max(epoch(ts)) OVER (
                       PARTITION BY user_id ORDER BY arrival
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) - epoch(ts)) / 86400)::BIGINT
                       AS lateness_bucket
              FROM seeded
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            cells AS (SELECT lateness_bucket, count(*) AS n_events
                      FROM late GROUP BY 1),
            tot AS (SELECT sum(n_events) AS t FROM cells)
            SELECT lateness_bucket, n_events::BIGINT AS n_events,
                   round(n_events / (SELECT t FROM tot), 6) AS share
            FROM cells ORDER BY lateness_bucket
        """,
        "agg_merge_check": """
            WITH a AS (
              SELECT count(n_chars) AS n, sum(n_chars) AS s,
                     min(n_chars) AS mn, max(n_chars) AS mx,
                     sum(n_chars * n_chars) AS ss
              FROM documents WHERE doc_id % 2 = 0),
            b AS (
              SELECT count(n_chars) AS n, sum(n_chars) AS s,
                     min(n_chars) AS mn, max(n_chars) AS mx,
                     sum(n_chars * n_chars) AS ss
              FROM documents
              WHERE NOT (doc_id % 2 = 0) OR (doc_id % 2 = 0) IS NULL),
            d AS (
              SELECT count(n_chars) AS n, sum(n_chars) AS s,
                     min(n_chars) AS mn, max(n_chars) AS mx,
                     sum(n_chars * n_chars) AS ss
              FROM documents)
            SELECT (a.n + b.n)::BIGINT AS n_merged,
                   d.n::BIGINT AS n_direct,
                   (coalesce(a.s, 0) + coalesce(b.s, 0))::BIGINT
                     AS sum_merged,
                   d.s::BIGINT AS sum_direct,
                   least(a.mn, b.mn)::BIGINT AS min_merged,
                   greatest(a.mx, b.mx)::BIGINT AS max_merged,
                   (coalesce(a.ss, 0) + coalesce(b.ss, 0))::BIGINT
                     AS sumsq_merged,
                   (a.n + b.n = d.n
                    AND coalesce(a.s, 0) + coalesce(b.s, 0) = d.s
                    AND least(a.mn, b.mn) IS NOT DISTINCT FROM d.mn
                    AND greatest(a.mx, b.mx) IS NOT DISTINCT FROM d.mx
                    AND coalesce(a.ss, 0) + coalesce(b.ss, 0) = d.ss)
                     AS all_equal
            FROM a, b, d
        """,
        "substring_spans": f"""
            WITH toks AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
              FROM ({_DUP_DOCS_SQL})),
            posd AS (
              SELECT doc_id, t, unnest(
                CASE WHEN len(t) <= 11 THEN [CAST(1 AS BIGINT)]
                     ELSE range(1, len(t) - 10) END) AS pos
              FROM toks),
            wins AS (
              SELECT doc_id, pos,
                     ('0x' || substr(md5(array_to_string(
                        t[pos:pos+11], ' ')), 1, 12))::UBIGINT::BIGINT AS h
              FROM posd),
            rare AS (
              SELECT h FROM wins GROUP BY h
              HAVING count(DISTINCT doc_id) <= 20),
            jw AS (SELECT w.* FROM wins w JOIN rare USING (h)),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM jw a JOIN jw b USING (h)
              WHERE a.doc_id < b.doc_id),
            isl AS (
              SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS diag,
                     pos_a - row_number() OVER (
                       PARTITION BY id_a, id_b, pos_a - pos_b
                       ORDER BY pos_a) AS grp
              FROM pairs)
            SELECT id_a, id_b,
                   min(pos_a)::BIGINT AS start_a,
                   min(pos_b)::BIGINT AS start_b,
                   (count(*) + 11)::BIGINT AS len_tokens
            FROM isl GROUP BY id_a, id_b, diag, grp
        """,
        "robots_check_urls": """
            WITH robots(host, body) AS (VALUES
              ('h0.example.com', e'User-agent: *\\nDisallow: /private\\nAllow: /private/pub\\n'),
              ('h1.example.com', e'User-agent: zoibot\\nDisallow: /\\n\\nUser-agent: *\\nDisallow: /tmp\\n'),
              ('h2.example.com', e'# comments only\\nUser-agent: *\\nDisallow:\\n'),
              ('h3.example.com', e'User-agent: zoibot\\nUser-agent: altbot\\nDisallow: /deep\\nAllow: /deep/ok\\n'),
              ('h4.example.com', e'User-agent: *\\nDisallow: /a\\nDisallow: /b\\nCrawl-delay: 5\\n'),
              ('h5.example.com', '')),
            ls0 AS (SELECT host, string_split(body, chr(10)) AS ls
                    FROM robots),
            ls1 AS (SELECT host, ls,
                           unnest(range(1, len(ls) + 1)) AS pos
                    FROM ls0),
            parsed AS (
              SELECT host, pos,
                     lower(regexp_extract(ls[pos],
                       '^\\s*([A-Za-z-]+)\\s*:', 1)) AS d,
                     trim(regexp_extract(ls[pos],
                       '^\\s*[A-Za-z-]+\\s*:\\s*([^#]*)', 1)) AS v
              FROM ls1),
            kept AS (SELECT * FROM parsed
                     WHERE d IN ('user-agent', 'allow', 'disallow')),
            flagged AS (
              SELECT host, pos, d, v,
                     CASE WHEN d = 'user-agent' THEN 1 ELSE 0 END AS iu
              FROM kept),
            opened AS (
              SELECT host, pos, d, v, iu,
                     CASE WHEN iu = 1 AND coalesce(lag(iu) OVER (
                       PARTITION BY host ORDER BY pos), 0) = 0
                     THEN 1 ELSE 0 END AS opens
              FROM flagged),
            grouped AS (
              SELECT host, pos, d, v,
                     sum(opens) OVER (PARTITION BY host ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS grp
              FROM opened),
            agents AS (SELECT host, grp, lower(v) AS agent
                       FROM grouped WHERE d = 'user-agent'),
            rls AS (SELECT host, grp, d AS rule, v AS path
                    FROM grouped WHERE d <> 'user-agent' AND v <> ''),
            rule_tab AS (
              SELECT DISTINCT host, agent, rule, path
              FROM agents JOIN rls USING (host, grp)),
            hx AS (SELECT host,
                          max(CASE WHEN agent = 'zoibot' THEN 1 ELSE 0
                              END) AS he
                   FROM rule_tab GROUP BY host),
            eff AS (
              SELECT r.host, r.rule, r.path AS rule_path
              FROM rule_tab r JOIN hx USING (host)
              WHERE (agent = 'zoibot' AND he = 1)
                 OR (agent = '*' AND he = 0)),
            uu AS (
              SELECT DISTINCT 'http://h' || (doc_id % 7)
                || '.example.com'
                || (CASE doc_id % 5 WHEN 1 THEN '/private/x'
                    WHEN 2 THEN '/tmp/x' WHEN 3 THEN '/deep/ok/y'
                    WHEN 4 THEN '/a/z' ELSE '/private/pub/x' END) AS url
              FROM documents),
            base AS (
              SELECT url,
                     lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS host,
                     CASE WHEN regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1)
                       = '' THEN '/'
                     ELSE regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1)
                     END AS path
              FROM uu),
            m AS (
              SELECT b.url, b.host, b.path, e.rule, e.rule_path,
                     (e.rule_path IS NOT NULL
                      AND starts_with(b.path, e.rule_path)) AS mt
              FROM base b LEFT JOIN eff e USING (host)),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY url
                ORDER BY mt DESC, length(rule_path) DESC, rule ASC)
                AS rn
              FROM m)
            SELECT url, host, path,
                   CASE WHEN mt THEN rule END AS rule,
                   CASE WHEN mt THEN rule_path END AS rule_path,
                   coalesce(CASE WHEN mt THEN rule = 'allow' END, true)
                     AS allowed
            FROM ranked WHERE rn = 1
        """,
        "sitemap_frontier": """
            WITH d AS (SELECT doc_id FROM documents),
            sm AS (
              SELECT doc_id,
                     '<urlset><url><loc>http://s' || (doc_id % 20)
                     || '.example.com/page/' || doc_id
                     || '</loc></url><url><loc> http://s'
                     || (doc_id % 20) || '.example.com/page/'
                     || (doc_id * 1000 + 7)
                     || ' </loc></url></urlset>' AS text
              FROM d WHERE doc_id % 10 = 0),
            locs0 AS (
              SELECT doc_id, unnest(regexp_extract_all(text,
                '(?i)<loc>\\s*([^<]+?)\\s*</loc>', 1)) AS loc
              FROM sm),
            locs AS (
              SELECT doc_id, loc,
                     lower(regexp_extract(loc,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS host
              FROM locs0 WHERE loc <> ''),
            known AS (
              SELECT 'http://s' || (doc_id % 20)
                     || '.example.com/page/' || doc_id AS url
              FROM d),
            nl AS (SELECT host, count(*)::BIGINT AS n_locs
                   FROM locs GROUP BY host),
            nn AS (SELECT host, count(*)::BIGINT AS n_new
                   FROM locs
                   WHERE loc NOT IN (SELECT url FROM known)
                   GROUP BY host)
            SELECT nl.host, nl.n_locs,
                   coalesce(nn.n_new, 0)::BIGINT AS n_new
            FROM nl LEFT JOIN nn USING (host)
        """,
        "sorted_neighborhood": f"""
            WITH c AS (
              SELECT doc_id AS id, {_NORM_SQL} AS k
              FROM ({_DUP_DOCS_SQL})),
            r AS (
              SELECT id, k,
                     lead(id, 1) OVER w AS ib1, lead(k, 1) OVER w AS kb1,
                     lead(id, 2) OVER w AS ib2, lead(k, 2) OVER w AS kb2
              FROM c
              WINDOW w AS (PARTITION BY substr(k, 1, 4)
                           ORDER BY k, id)),
            u AS (
              SELECT id AS id_a, ib1 AS id_b, 1 AS off,
                     (k = kb1) AS same_key
              FROM r WHERE ib1 IS NOT NULL
              UNION ALL
              SELECT id, ib2, 2, (k = kb2)
              FROM r WHERE ib2 IS NOT NULL)
            SELECT id_a, id_b, off::BIGINT AS offset, same_key FROM u
        """,
        "link_density_main": """
            WITH d AS (
              SELECT doc_id,
                '<div><a href="/">Home</a> <a href="/about">About</a></div><p>'
                || text ||
                '</p><p>Copyright 2026 Example Corp, all rights reserved <a href="/terms">terms</a></p><div><a href="/x">x</a></div>'
                AS html
              FROM documents),
            blk AS (
              SELECT doc_id, regexp_split_to_array(html,
                '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer|nav|aside|blockquote|pre|br)\\b[^>]*>')
                AS bs
              FROM d),
            nb AS (SELECT doc_id, len(bs)::BIGINT AS n_blocks, bs
                   FROM blk),
            ex AS (SELECT doc_id, bs,
                          unnest(range(1, len(bs) + 1)) AS pos
                   FROM nb),
            scored AS (
              SELECT doc_id, pos,
                     trim(regexp_replace(regexp_replace(bs[pos],
                       '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) AS txt,
                     coalesce(list_sum(list_transform(
                       regexp_extract_all(bs[pos],
                         '(?is)<a\\b[^>]*>(.*?)</a>', 1),
                       s -> length(trim(regexp_replace(regexp_replace(
                         s, '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))))),
                       0) AS alen
              FROM ex),
            kept AS (SELECT * FROM scored
                     WHERE length(txt) >= 20
                       AND alen <= 0.5 * length(txt)),
            reb AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
                           string_agg(txt, chr(10) ORDER BY pos) AS mt
                    FROM kept GROUP BY doc_id)
            SELECT nb.doc_id, nb.n_blocks,
                   coalesce(reb.n_kept, 0)::BIGINT AS n_kept,
                   length(coalesce(reb.mt, ''))::BIGINT AS main_len,
                   md5(coalesce(reb.mt, '')) AS main_md5
            FROM nb LEFT JOIN reb USING (doc_id)
        """,
        "violation_examples": f"""
            WITH v AS ({_FLAGSHIP_SQL}),
            r AS (
              SELECT rule_id, doc_id,
                     row_number() OVER (PARTITION BY rule_id
                       ORDER BY doc_id)::BIGINT AS rnk
              FROM v)
            SELECT rule_id, rnk, doc_id FROM r WHERE rnk <= 3
        """,
        "l_diversity_docs": """
            WITH base AS (
              SELECT lang, source,
                     CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket
              FROM documents),
            cells AS (
              SELECT lang, len_bucket, source, count(*)::DOUBLE AS c
              FROM base GROUP BY 1, 2, 3),
            g AS (
              SELECT lang, len_bucket,
                     sum(c) AS n, count(*) AS l_distinct,
                     round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6)
                       AS entropy
              FROM cells GROUP BY 1, 2)
            SELECT lang, len_bucket, n::BIGINT AS n,
                   l_distinct::BIGINT AS l_distinct, entropy,
                   (l_distinct >= 3 AND entropy >= round(ln(3), 6))
                     AS ok
            FROM g
        """,
        "crawl_plan": """
            WITH d AS (SELECT doc_id FROM documents),
            hh AS (
              SELECT 'h' || (doc_id % 50) || '.example.com' AS host
              FROM d
              UNION ALL
              SELECT 'h' || (doc_id % 50) || '.example.com'
              FROM d WHERE doc_id % 7 = 0),
            counts AS (SELECT host, count(*) AS n FROM hh GROUP BY host),
            top AS (SELECT host AS bottleneck_host,
                           n AS max_host_urls
                    FROM counts ORDER BY n DESC, host ASC LIMIT 1),
            tot AS (SELECT count(*)::BIGINT AS n_hosts,
                           sum(n)::BIGINT AS n_urls FROM counts)
            SELECT n_hosts, n_urls,
                   max_host_urls::BIGINT AS max_host_urls,
                   bottleneck_host,
                   round(max_host_urls * 0.5, 6) AS host_time_s,
                   round(n_urls * 0.5 / 8, 6) AS fleet_time_s,
                   round(greatest(max_host_urls * 0.5,
                                  n_urls * 0.5 / 8), 6)
                     AS makespan_lb_s,
                   (max_host_urls * 0.5 >= n_urls * 0.5 / 8)
                     AS host_bound
            FROM tot, top
        """,
        "bpe_pairs": f"""
            WITH words AS (
              SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w
              FROM documents),
            ws AS (SELECT w FROM words WHERE length(w) >= 2),
            pairs AS (
              SELECT unnest(list_transform(range(1, length(w)),
                i -> substr(w, i, 2))) AS pair
              FROM ws),
            cells AS (SELECT pair, count(*)::BIGINT AS n
                      FROM pairs GROUP BY pair),
            ranked AS (
              SELECT pair, n,
                     row_number() OVER (ORDER BY n DESC, pair ASC)
                       ::BIGINT AS rank
              FROM cells)
            SELECT pair, n, rank FROM ranked WHERE rank <= 25
        """,
        "stream_window_violations": f"""
            WITH v AS ({_FLAGSHIP_SQL}),
            ts AS (
              SELECT doc_id,
                     TIMESTAMP '2026-01-01 00:00:00'
                     + ((doc_id % 600) // 60) * INTERVAL 1 MINUTE
                       AS window_start
              FROM documents)
            -- append mode only emits windows the final watermark has
            -- closed: wm = max event time − 2 min, emit end ≤ wm
            SELECT t.window_start,
                   t.window_start + INTERVAL 1 MINUTE AS window_end,
                   v.rule_id, count(*)::BIGINT AS n_violations
            FROM v JOIN ts t USING (doc_id)
            GROUP BY 1, 2, 3
            HAVING t.window_start + INTERVAL 1 MINUTE <=
              (SELECT TIMESTAMP '2026-01-01 00:00:00'
                      + max((doc_id % 600)) * INTERVAL 1 SECOND
                      - INTERVAL 2 MINUTE
               FROM documents)
        """,
        "weighted_jaccard": f"""
            WITH docs AS ({_DUP_DOCS_SQL}),
            toks AS (
              SELECT doc_id, block,
                     unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM docs),
            tc AS (
              SELECT doc_id, block, tok, count(*)::BIGINT AS c
              FROM toks WHERE tok <> '' GROUP BY 1, 2, 3),
            tot AS (SELECT doc_id, sum(c) AS tot FROM tc GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     sum(least(a.c, b.c)) AS min_mass
              FROM tc a JOIN tc b
                ON a.tok = b.tok AND a.block = b.block
                   AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   ta.tot::BIGINT AS tot_a, tb.tot::BIGINT AS tot_b,
                   min_mass::BIGINT AS min_mass,
                   round(min_mass / (ta.tot + tb.tot - min_mass), 6)
                     AS weighted_jaccard
            FROM inter
            JOIN tot ta ON ta.doc_id = id_a
            JOIN tot tb ON tb.doc_id = id_b
            WHERE 0.8 * tb.tot <= ta.tot AND ta.tot <= tb.tot / 0.8
              AND round(min_mass / (ta.tot + tb.tot - min_mass), 6)
                  >= 0.8
        """,
        "soft_dedup_weights": f"""
            WITH docs AS ({_DUP_DOCS_SQL}),
            fp AS (SELECT doc_id, md5({_NORM_SQL}) AS f FROM docs)
            SELECT doc_id,
                   count(*) OVER (PARTITION BY f)::BIGINT AS n_copies,
                   round(1.0 / count(*) OVER (PARTITION BY f), 6)
                     AS weight,
                   (doc_id = min(doc_id) OVER (PARTITION BY f))
                     AS is_canonical
            FROM fp
        """,
        "structure_docs": """
            WITH synth AS (
              SELECT doc_id,
                     CASE doc_id % 4
                       WHEN 1 THEN e'```\\ndef f(x) {\\n    return x;\\n}\\n```'
                       WHEN 2 THEN e'| a | b |\\n| 1 | 2 |\\n| 3 | 4 |'
                       WHEN 3 THEN e'- one\\n- two\\n1. three\\nplain tail'
                       ELSE text END AS text
              FROM documents),
            base AS (
              SELECT doc_id, text,
                     string_split(coalesce(text, ''), chr(10)) AS ls
              FROM synth),
            m AS (
              SELECT doc_id,
                     len(ls)::BIGINT AS n_lines,
                     CAST(floor(len(list_filter(ls,
                       x -> regexp_matches(x, '^```'))) / 2) AS BIGINT)
                       AS code_fences,
                     round(len(list_filter(ls,
                       x -> regexp_matches(x, '^(    |\\t)')))
                       / greatest(len(ls), 1), 6) AS indent_ratio,
                     round((length(text) - length(regexp_replace(text,
                       '[{};()=]', '', 'g')))
                       / greatest(length(text), 1), 6)
                       AS brace_semi_density,
                     len(list_filter(ls,
                       x -> length(x) - length(regexp_replace(x,
                         '\\|', '', 'g')) >= 2))::BIGINT AS table_lines,
                     round(len(list_filter(ls,
                       x -> regexp_matches(x,
                         '^\\s*(-|\\*|[0-9]+\\.)\\s')))
                       / greatest(len(ls), 1), 6) AS bullet_ratio
              FROM base)
            SELECT doc_id, n_lines, code_fences, indent_ratio,
                   brace_semi_density, table_lines, bullet_ratio,
                   ((CASE WHEN code_fences >= 1 THEN 1 ELSE 0 END)
                    + (CASE WHEN indent_ratio >= 0.2 THEN 1 ELSE 0 END)
                    + (CASE WHEN brace_semi_density >= 0.02 THEN 1
                       ELSE 0 END)) >= 2 AS is_codeish,
                   table_lines >= 3 AS is_tableish
            FROM m
        """,
        "cluster_audit": f"""
            WITH RECURSIVE jpairs AS ({_jaccard_pairs_sql(0.8)}),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM jpairs
              UNION
              SELECT id_b, id_a FROM jpairs),
            reach AS (
              SELECT a AS src, a AS node FROM edges
              UNION
              SELECT r.src, e.b FROM reach r JOIN edges e
                ON r.node = e.a),
            clusters AS (
              SELECT src AS doc_id, min(node) AS cluster_id
              FROM reach GROUP BY src),
            pj AS (
              SELECT p.id_a, p.id_b,
                     ca.cluster_id AS c1, cb.cluster_id AS c2
              FROM jpairs p
              JOIN clusters ca ON ca.doc_id = p.id_a
              JOIN clusters cb ON cb.doc_id = p.id_b),
            ps AS (
              SELECT count(*)::BIGINT AS n_pairs,
                     coalesce(sum(CASE WHEN c1 <> c2 THEN 1 ELSE 0
                       END), 0)::BIGINT AS n_pair_violations
              FROM pj),
            sz AS (SELECT cluster_id, count(*) AS n
                   FROM clusters GROUP BY 1),
            cs AS (SELECT sum(n)::BIGINT AS n_docs,
                          count(*)::BIGINT AS n_clusters,
                          max(n)::BIGINT AS max_cluster_size
                   FROM sz)
            SELECT n_pairs, n_pair_violations, n_docs, n_clusters,
                   max_cluster_size, (n_pair_violations = 0) AS ok
            FROM ps, cs
        """,
        "robots_wildcards": """
            WITH robots(host, body) AS (VALUES
              ('w0.example.com', e'User-agent: *\\nDisallow: /*.pdf$\\nDisallow: /tmp*\\nAllow: /tmp/keep$\\n'),
              ('w1.example.com', e'User-agent: *\\nDisallow: /a/*/secret\\nAllow: /a/*/secret/ok$\\n')),
            ls0 AS (SELECT host, string_split(body, chr(10)) AS ls
                    FROM robots),
            ls1 AS (SELECT host, ls,
                           unnest(range(1, len(ls) + 1)) AS pos
                    FROM ls0),
            parsed AS (
              SELECT host, pos,
                     lower(regexp_extract(ls[pos],
                       '^\\s*([A-Za-z-]+)\\s*:', 1)) AS d,
                     trim(regexp_extract(ls[pos],
                       '^\\s*[A-Za-z-]+\\s*:\\s*([^#]*)', 1)) AS v
              FROM ls1),
            kept AS (SELECT * FROM parsed
                     WHERE d IN ('user-agent', 'allow', 'disallow')),
            opened AS (
              SELECT host, pos, d, v,
                     CASE WHEN d = 'user-agent'
                          AND coalesce(lag(CASE WHEN d = 'user-agent'
                            THEN 1 ELSE 0 END) OVER (
                            PARTITION BY host ORDER BY pos), 0) = 0
                     THEN 1 ELSE 0 END AS opens
              FROM kept),
            grouped AS (
              SELECT host, pos, d, v,
                     sum(opens) OVER (PARTITION BY host ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS grp
              FROM opened),
            agents AS (SELECT host, grp, lower(v) AS agent
                       FROM grouped WHERE d = 'user-agent'),
            rls AS (SELECT host, grp, d AS rule, v AS path
                    FROM grouped WHERE d <> 'user-agent' AND v <> ''),
            rule_tab AS (
              SELECT DISTINCT host, agent, rule, path
              FROM agents JOIN rls USING (host, grp)),
            eff AS (
              SELECT host, rule, path AS rule_path,
                     (substr(path, length(path), 1) = '$') AS anch,
                     CASE WHEN substr(path, length(path), 1) = '$'
                       THEN substr(path, 1, length(path) - 1)
                       ELSE path END AS raw
              FROM rule_tab WHERE agent = '*'),
            effp AS (
              SELECT host, rule, rule_path,
                     CASE WHEN anch THEN pat0 ELSE pat0 || '%' END
                       AS pat
              FROM (SELECT host, rule, rule_path, anch,
                           replace(replace(replace(replace(raw,
                             '\\', '\\\\'), '%', '\\%'), '_', '\\_'),
                             '*', '%') AS pat0
                    FROM eff)),
            uu AS (
              SELECT DISTINCT 'http://w' || (doc_id % 2)
                || '.example.com'
                || (CASE doc_id % 7 WHEN 1 THEN '/doc.pdfx'
                    WHEN 2 THEN '/tmp/x' WHEN 3 THEN '/tmp/keep'
                    WHEN 4 THEN '/a/b/secret/no'
                    WHEN 5 THEN '/a/b/secret/ok' WHEN 6 THEN '/clean'
                    ELSE '/doc.pdf' END) AS url
              FROM documents),
            base AS (
              SELECT url,
                     lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1))
                       AS host,
                     CASE WHEN regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1)
                       = '' THEN '/'
                     ELSE regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1)
                     END AS path
              FROM uu),
            m AS (
              SELECT b.url, b.host, b.path, e.rule, e.rule_path,
                     (e.rule_path IS NOT NULL
                      AND b.path LIKE e.pat ESCAPE '\\') AS mt
              FROM base b LEFT JOIN effp e USING (host)),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY url
                ORDER BY mt DESC, length(rule_path) DESC, rule ASC)
                AS rn
              FROM m)
            SELECT url, host, path,
                   CASE WHEN mt THEN rule END AS rule,
                   CASE WHEN mt THEN rule_path END AS rule_path,
                   coalesce(CASE WHEN mt THEN rule = 'allow' END, true)
                     AS allowed
            FROM ranked WHERE rn = 1
        """,
        "homoglyph_dups": f"""
            WITH u AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 20000, translate(text, 'aeo', 'аео')
              FROM documents WHERE doc_id % 25 = 0),
            k AS (
              SELECT doc_id,
                     md5(translate({_NORM_SQL},
                       'аеорсхуіјѕԛԝο', 'aeopcxyijsqwo')) AS hfp,
                     md5({_NORM_SQL}) AS e
              FROM u)
            SELECT hfp, count(*)::BIGINT AS n_docs,
                   count(DISTINCT e)::BIGINT AS n_exact_variants,
                   min(doc_id) AS keep_id
            FROM k GROUP BY hfp
            HAVING count(*) > 1 AND count(DISTINCT e) > 1
        """,
        "emb_energy_hist": """
            WITH v AS (SELECT embedding AS e FROM embeddings
                       WHERE embedding IS NOT NULL),
            m AS (
              SELECT
                list_sum(list_transform(e,
                  x -> x::DOUBLE * x::DOUBLE)) AS fe,
                list_sum(list_transform(
                  e[1:greatest(len(e) // 2, 1)],
                  x -> x::DOUBLE * x::DOUBLE)) AS pe
              FROM v),
            s AS (SELECT round(CASE WHEN fe > 0 THEN pe / fe
                                    ELSE 0 END, 6) AS share FROM m),
            b AS (SELECT least(CAST(floor(share * 10) AS BIGINT),
                               9) AS bucket FROM s)
            SELECT bucket, round(bucket / 10.0, 6) AS lo,
                   count(*)::BIGINT AS n_vecs
            FROM b GROUP BY bucket
        """,
        "incremental_lsh_join": f"""
            WITH base AS (SELECT doc_id, text FROM documents
                          WHERE doc_id < 400),
            newd AS (
              SELECT doc_id, text FROM documents WHERE doc_id >= 400
              UNION ALL
              SELECT doc_id + 30000, text FROM documents
              WHERE doc_id < 50),
            bt AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
                   FROM base),
            nt AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
                   FROM newd),
            bsh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 1),
                              i -> array_to_string(t[i:i+2], ' '))
                  END) AS shingle
                FROM bt)),
            nsh AS (
              SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(
                  CASE WHEN len(t) <= 2 THEN [array_to_string(t, ' ')]
                       ELSE list_transform(range(1, len(t) - 1),
                              i -> array_to_string(t[i:i+2], ' '))
                  END) AS shingle
                FROM nt)),
            bsz AS (SELECT doc_id, count(*)::DOUBLE AS sz
                    FROM bsh GROUP BY 1),
            nsz AS (SELECT doc_id, count(*)::DOUBLE AS sz
                    FROM nsh GROUP BY 1),
            inter AS (
              SELECT n.doc_id AS new_id, b.doc_id AS index_id,
                     count(*)::DOUBLE AS i
              FROM nsh n JOIN bsh b USING (shingle)
              GROUP BY 1, 2)
            SELECT new_id, index_id,
                   round(i / (ns.sz + bs.sz - i), 6) AS jaccard
            FROM inter
            JOIN nsz ns ON ns.doc_id = new_id
            JOIN bsz bs ON bs.doc_id = index_id
            WHERE i / (ns.sz + bs.sz - i) >= 0.8
        """,
        "exact_len_quantiles": """
            WITH c AS (
              SELECT n_chars AS value, count(*) AS c FROM documents
              WHERE n_chars IS NOT NULL GROUP BY 1),
            cum AS (
              SELECT value,
                     sum(c) OVER (ORDER BY value ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_count,
                     sum(c) OVER () AS n_rows
              FROM c),
            qv(q) AS (VALUES (CAST(0.25 AS DOUBLE)), (0.5), (0.9),
                      (0.99)),
            sel AS (
              SELECT qv.q, cum.value, cum.cum_count, cum.n_rows,
                     row_number() OVER (PARTITION BY qv.q
                       ORDER BY cum.value) AS rn
              FROM qv CROSS JOIN cum
              WHERE cum.cum_count >= ceil(qv.q * cum.n_rows))
            SELECT q, value, cum_count::BIGINT AS cum_count,
                   n_rows::BIGINT AS n_rows
            FROM sel WHERE rn = 1
        """,
        "corpus_card": f"""
            WITH sizes AS (
              SELECT count(*)::DOUBLE AS n_docs,
                     count(DISTINCT lang)::DOUBLE AS n_langs,
                     count(DISTINCT source)::DOUBLE AS n_sources,
                     round(avg(n_chars), 6) AS mean_chars,
                     quantile_cont(n_chars, 0.5) AS p50_chars,
                     round(1 - count(DISTINCT md5({_NORM_SQL}))
                           / count(*), 6) AS dup_rate
              FROM documents),
            bad AS (
              SELECT count(DISTINCT doc_id)::DOUBLE AS n_bad
              FROM ({_FLAGSHIP_SQL}))
            SELECT section, metric, value FROM (
              SELECT 'size' AS section, 'n_docs' AS metric,
                     n_docs AS value FROM sizes
              UNION ALL SELECT 'size', 'n_langs', n_langs FROM sizes
              UNION ALL SELECT 'size', 'n_sources', n_sources
                FROM sizes
              UNION ALL SELECT 'length', 'mean_chars', mean_chars
                FROM sizes
              UNION ALL SELECT 'length', 'p50_chars', p50_chars
                FROM sizes
              UNION ALL SELECT 'dedup', 'dup_rate', dup_rate
                FROM sizes
              UNION ALL
              SELECT 'validate', 'pass_rate',
                     round((s.n_docs - b.n_bad) / s.n_docs, 6)
              FROM sizes s, bad b)
        """,
        "verdict_flips": """
            WITH pids AS (
              SELECT DISTINCT doc_id % 24 AS partition_id
              FROM documents),
            old AS (
              SELECT partition_id,
                     CASE WHEN partition_id % 3 <> 0 THEN 'pass'
                          ELSE 'fail' END AS old_status
              FROM pids WHERE partition_id < 20),
            new AS (
              SELECT partition_id,
                     CASE WHEN partition_id % 4 <> 0 THEN 'pass'
                          ELSE 'fail' END AS new_status
              FROM pids WHERE partition_id >= 4),
            j AS (
              SELECT coalesce(o.partition_id, n.partition_id) AS k,
                     coalesce(o.old_status, 'absent') AS old_status,
                     coalesce(n.new_status, 'absent') AS new_status
              FROM old o FULL OUTER JOIN new n USING (partition_id))
            SELECT old_status, new_status, count(*)::BIGINT AS n,
                   (list_sort(list(k)))[1:5] AS sample_keys
            FROM j GROUP BY 1, 2
        """,
        "negatives_sample": """
            WITH n AS (SELECT count(*) AS n FROM documents),
            j(j) AS (VALUES (0), (1), (2))
            SELECT d.doc_id AS anchor_id, j.j AS j,
                   ((d.doc_id + 1
                     + (('0x' || substr(md5('neg:' || d.doc_id
                         || ':' || j.j), 1, 12))::UBIGINT::BIGINT
                        % (n.n - 1))) % n.n) AS neg_id
            FROM documents d, j, n
        """,
        "bm25_ndcg": """
            WITH base AS (
              SELECT doc_id,
                     list_filter(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
                                 x -> x != '') AS t
              FROM documents
              WHERE text IS NOT NULL AND doc_id IS NOT NULL),
            d AS (SELECT doc_id, len(t) AS dl, unnest(t) AS tok
                  FROM base),
            tf AS (
              SELECT doc_id, tok, count(*) AS tf, min(dl) AS dl
              FROM d WHERE tok IN ('hash', 'spark', 'window')
              GROUP BY 1, 2),
            dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
            st AS (SELECT count(*) AS n, avg(len(t)) AS avgdl
                   FROM base),
            sc AS (
              SELECT doc_id,
                     round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                           * tf * (1.2 + 1)
                           / (tf + 1.2 * (1 - 0.75
                                          + 0.75 * dl / avgdl))), 6)
                       AS score
              FROM tf JOIN dfq USING (tok), st GROUP BY doc_id),
            pool AS (SELECT doc_id, score FROM sc
                     ORDER BY score DESC, doc_id LIMIT 20),
            rel AS (
              SELECT doc_id,
                     (list_contains(t, 'hash')::INT
                      + list_contains(t, 'spark')::INT
                      + list_contains(t, 'window')::INT)::DOUBLE
                       AS rel
              FROM base),
            g AS (SELECT p.doc_id, p.score, r.rel
                  FROM pool p JOIN rel r USING (doc_id)),
            rk AS (
              SELECT doc_id, rel,
                     row_number() OVER (ORDER BY round(score, 6) DESC,
                                        doc_id) AS rank,
                     row_number() OVER (ORDER BY rel DESC, doc_id)
                       AS irank
              FROM g),
            dcg AS (SELECT sum(rel / log2(rank + 1)) AS dcg
                    FROM rk WHERE rank <= 10),
            idcg AS (SELECT sum(rel / log2(irank + 1)) AS idcg
                     FROM rk WHERE irank <= 10)
            SELECT 10 AS k, round(dcg, 6) AS dcg,
                   round(idcg, 6) AS idcg,
                   CASE WHEN idcg > 0 THEN round(dcg / idcg, 6)
                        ELSE 0.0 END AS ndcg
            FROM dcg, idcg
        """,
        "join_advisor": """
            WITH l AS (SELECT count(*) AS n FROM documents),
            r AS (SELECT count(DISTINCT lang) AS n FROM documents),
            top AS (SELECT lang::VARCHAR AS top_key, count(*) AS tc
                    FROM documents GROUP BY lang
                    ORDER BY tc DESC, lang ASC LIMIT 1)
            SELECT l.n::BIGINT AS left_rows, r.n::BIGINT AS right_rows,
                   round(l.n * 600.0, 6) AS left_bytes_est,
                   round(r.n * 16.0, 6) AS right_bytes_est,
                   CASE WHEN least(l.n * 600.0, r.n * 16.0)
                          <= 10 * 1024 * 1024 THEN 'broadcast'
                        ELSE 'sort_merge' END AS strategy,
                   greatest(1, ceil((l.n * 600.0 + r.n * 16.0)
                                    / (128 * 1024 * 1024)))::BIGINT
                     AS shuffle_partitions,
                   top.top_key,
                   round(top.tc / l.n, 6) AS top_key_share,
                   (top.tc / l.n > 0.2) AS salt_recommended
            FROM l, r, top
        """,
        "infer_json_schema": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN '{oops' ELSE
                       '{"id": ' || doc_id || ', "score": '
                       || (doc_id % 10) || '.5, "ok": '
                       || (CASE WHEN doc_id % 2 = 0 THEN 'true'
                           ELSE 'false' END)
                       || ', "name": "u' || doc_id || '"'
                       || (CASE WHEN doc_id % 3 = 0
                           THEN ', "tag": "x"' ELSE '' END) || '}'
                     END AS js
              FROM documents),
            valid AS (SELECT js FROM d WHERE json_valid(js)),
            n AS (SELECT count(*) AS n_docs FROM valid),
            kv AS (SELECT unnest(json_keys(js)) AS field, js
                   FROM valid),
            kv2 AS (SELECT field,
                           json_extract_string(js, '$.' || field) AS v
                    FROM kv),
            agg AS (
              SELECT field, count(*) AS n_present,
                     min(CASE WHEN v IS NULL THEN NULL
                         WHEN regexp_matches(v, '^-?[0-9]+$') THEN 1
                         ELSE 0 END) AS ai,
                     min(CASE WHEN v IS NULL THEN NULL
                         WHEN regexp_matches(v, '^-?[0-9]+$')
                           OR regexp_matches(v, '^-?[0-9]+\\.[0-9]+$')
                         THEN 1 ELSE 0 END) AS af,
                     min(CASE WHEN v IS NULL THEN NULL
                         WHEN v IN ('true', 'false') THEN 1
                         ELSE 0 END) AS ab
              FROM kv2 GROUP BY field)
            SELECT field,
                   CASE WHEN ab = 1 THEN 'boolean'
                        WHEN ai = 1 THEN 'integer'
                        WHEN af = 1 THEN 'float'
                        ELSE 'string' END AS inferred_type,
                   n_present::BIGINT AS n_present,
                   n.n_docs::BIGINT AS n_docs,
                   (n_present = n.n_docs) AS required
            FROM agg, n
        """,
        "multi_signal_dedup": f"""
            WITH RECURSIVE jp AS ({_jaccard_pairs_sql(0.8)}),
            docs AS ({_DUP_DOCS_SQL}),
            up AS (
              SELECT mn AS id_a, doc_id AS id_b FROM (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY doc_id % 10000)
                         AS mn
                FROM docs)
              WHERE doc_id <> mn),
            tagged AS (
              SELECT id_a, id_b, 'jaccard' AS signal FROM jp
              UNION ALL
              SELECT id_a, id_b, 'url' AS signal FROM up),
            e0 AS (SELECT DISTINCT id_a, id_b FROM tagged),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM e0
              UNION
              SELECT id_b, id_a FROM e0),
            reach AS (
              SELECT a AS src, a AS node FROM edges
              UNION
              SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a),
            clusters AS (
              SELECT src AS doc_id, min(node) AS cluster_id
              FROM reach GROUP BY src),
            mc AS (SELECT cluster_id, count(*)::BIGINT AS n_docs
                   FROM clusters GROUP BY 1),
            pe AS (SELECT c.cluster_id, t.id_a, t.id_b, t.signal
                   FROM tagged t JOIN clusters c ON c.doc_id = t.id_a),
            pc AS (SELECT cluster_id, count(*)::BIGINT AS n_pairs FROM (
                     SELECT DISTINCT cluster_id, id_a, id_b FROM pe)
                   GROUP BY 1),
            sg AS (SELECT cluster_id,
                          array_to_string(
                            list_sort(list(DISTINCT signal)), ',')
                            AS signals
                   FROM pe GROUP BY 1)
            SELECT mc.cluster_id, n_docs, n_pairs, signals
            FROM mc
            JOIN pc USING (cluster_id)
            JOIN sg USING (cluster_id)
        """,
        "frontier_scores": """
            WITH d AS (SELECT doc_id FROM documents),
            e AS (
              SELECT 'p' || doc_id AS src,
                     'http://t.example.com/a/' || (doc_id % 37) AS dst
              FROM d
              UNION ALL
              SELECT 'p' || doc_id,
                     'http://t.example.com/b/' || (doc_id % 23)
              FROM d),
            q AS (SELECT 'p' || doc_id AS src,
                         (doc_id % 100) / 100.0 AS quality
                  FROM d),
            deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
            mass AS (SELECT q.src, quality / deg AS m
                     FROM deg JOIN q USING (src))
            SELECT dst, count(*)::BIGINT AS n_parents,
                   round(sum(m), 6) AS priority
            FROM e JOIN mass USING (src)
            GROUP BY dst
        """,
        "blocking_pairwork": f"""
            WITH docs AS ({_DUP_DOCS_SQL}),
            counts AS (SELECT block, count(*) AS s FROM docs GROUP BY 1),
            top AS (SELECT block AS top_block, s AS top_s FROM counts
                    ORDER BY s DESC, block ASC LIMIT 1)
            SELECT count(*)::BIGINT AS n_blocks,
                   sum(s)::BIGINT AS n_rows,
                   max(s)::BIGINT AS max_block_size,
                   (SELECT top_block FROM top) AS top_block,
                   sum(s * (s - 1) / 2)::BIGINT AS pair_work,
                   round(((SELECT top_s FROM top)
                          * ((SELECT top_s FROM top) - 1) / 2.0)
                         / greatest(sum(s * (s - 1) / 2), 1), 6)
                     AS top_block_pairwork_share,
                   sum(CASE WHEN s <= 100 THEN s * (s - 1) / 2
                       ELSE 0 END)::BIGINT AS capped_pair_work,
                   round(sum(CASE WHEN s <= 100 THEN s * (s - 1) / 2
                             ELSE 0 END)
                         / greatest(sum(s * (s - 1) / 2), 1)::DOUBLE, 6)
                     AS capped_share
            FROM counts
        """,
        "expectation_battery": """
            WITH d AS (SELECT *, length(text) AS text_len
                       FROM documents),
            a AS (SELECT count(*)::DOUBLE AS c_rows,
                         avg(text_len) AS m_len,
                         avg((lang IS NULL)::INT)::DOUBLE AS ns_lang,
                         count(DISTINCT lang)::DOUBLE AS d_lang,
                         avg(CASE WHEN lang IS NULL THEN NULL
                             WHEN regexp_matches(lang, '^[a-z]{2}$')
                             THEN 1.0 ELSE 0.0 END) AS ms_lang,
                         min(doc_id)::DOUBLE AS mn_id,
                         stddev_samp(text_len) AS sd_len,
                         max(text_len)::DOUBLE AS mx_len
                  FROM d)
            SELECT * FROM (
              SELECT 'has_rows' AS expectation, 'row_count' AS kind,
                     NULL::VARCHAR AS "column",
                     round(c_rows, 6) AS observed,
                     1.0::DOUBLE AS lo, NULL::DOUBLE AS hi,
                     coalesce(c_rows >= 1.0, false) AS passed FROM a
              UNION ALL
              SELECT 'len_mean', 'mean', 'text_len', round(m_len, 6),
                     50.0, 2000.0,
                     coalesce(m_len >= 50.0 AND m_len <= 2000.0, false)
              FROM a
              UNION ALL
              SELECT 'lang_nulls', 'null_share', 'lang',
                     round(ns_lang, 6), NULL, 0.0,
                     coalesce(ns_lang <= 0.0, false) FROM a
              UNION ALL
              SELECT 'lang_vocab', 'distinct', 'lang',
                     round(d_lang, 6), 2.0, 50.0,
                     coalesce(d_lang >= 2.0 AND d_lang <= 50.0, false)
              FROM a
              UNION ALL
              SELECT 'lang_shape', 'match_share', 'lang',
                     round(ms_lang, 6), 0.99, NULL,
                     coalesce(ms_lang >= 0.99, false) FROM a
              UNION ALL
              SELECT 'id_min', 'min', 'doc_id', round(mn_id, 6),
                     0.0, NULL, coalesce(mn_id >= 0.0, false) FROM a
              UNION ALL
              SELECT 'len_sd', 'stddev', 'text_len', round(sd_len, 6),
                     NULL, 60.0, coalesce(sd_len <= 60.0, false) FROM a
              UNION ALL
              SELECT 'len_max', 'max', 'text_len', round(mx_len, 6),
                     NULL, 1000.0, coalesce(mx_len <= 1000.0, false)
              FROM a)
        """,
        "snapshot_changes": """
            WITH d AS (SELECT doc_id, text, lang FROM documents),
            new AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
                          ELSE text END AS text,
                     lang
              FROM d WHERE doc_id % 17 <> 0
              UNION ALL
              SELECT doc_id + 10000000, text, lang FROM d
              WHERE doc_id % 13 = 0),
            j AS (SELECT coalesce(o.doc_id, n.doc_id) AS key,
                         o.doc_id IS NOT NULL AS in_old,
                         n.doc_id IS NOT NULL AS in_new,
                         (o.text IS DISTINCT FROM n.text)
                           OR (o.lang IS DISTINCT FROM n.lang) AS diff
                  FROM d o FULL OUTER JOIN new n
                    ON o.doc_id = n.doc_id)
            SELECT key,
                   CASE WHEN NOT in_old THEN 'added'
                        WHEN NOT in_new THEN 'removed'
                        WHEN diff THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM j
            WHERE NOT (in_old AND in_new AND NOT diff)
        """,
        "conditional_rules": """
            SELECT doc_id, rule_id FROM (
              SELECT doc_id, 'en_min_len' AS rule_id FROM documents
               WHERE coalesce(lang = 'en', false)
                 AND NOT coalesce(length(text) >= 80, false)
              UNION ALL
              SELECT doc_id, 'src3_even_id' FROM documents
               WHERE coalesce(source = 'src3', false)
                 AND NOT coalesce(doc_id % 2 = 0, false)
              UNION ALL
              SELECT doc_id, 'short_known_lang' FROM documents
               WHERE coalesce(length(text) < 60, false)
                 AND NOT coalesce(lang IN ('en', 'de', 'fr'), false))
        """,
        "suggest_rules": _suggest_rules_sql(),
        "weighted_sample": """
            WITH d AS (SELECT doc_id, lang,
                              ((doc_id % 100) + 1) / 100.0 AS w
                       FROM documents),
            k AS (SELECT doc_id, lang,
                         ln((('0x' || substr(md5('ws' || doc_id), 1, 8))
                             ::BIGINT + 1.0) / 4294967297.0) / w AS key
                  FROM d WHERE w IS NOT NULL AND w > 0)
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang, row_number() OVER (
                PARTITION BY lang ORDER BY key DESC, doc_id ASC) AS rn
              FROM k)
            WHERE rn <= 10
        """,
        "nfc_audit": """
            WITH d AS (
              SELECT doc_id, lang,
                     CASE WHEN doc_id % 7 = 0
                            THEN text || 'e' || chr(769)
                          WHEN doc_id % 11 = 0 THEN text || chr(233)
                          ELSE text END AS text
              FROM documents)
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum((nfc_normalize(text) <> text)::INT)::BIGINT
                     AS n_not_nfc,
                   round(avg((nfc_normalize(text) <> text)::INT), 6)
                     AS not_nfc_share
            FROM d WHERE text IS NOT NULL
            GROUP BY lang
        """,
        "transpiled_rules": _transpile_violations_sql(
            _transpile_demo_schema(), table="events",
            id_col="event_id"),
        "sprt_langs": _sprt_sql(),
        "columns_psi": _columns_psi_sql(),
        "vocab_prune": f"""
            WITH toks AS (
              SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents),
            counts AS (SELECT tok, count(*)::BIGINT AS c FROM toks
                       WHERE tok <> '' GROUP BY tok),
            th(min_count) AS (VALUES (1), (2), (5), (10), (20))
            SELECT min_count::INT AS min_count,
                   sum((c >= min_count)::INT)::BIGINT AS vocab_size,
                   round(sum(CASE WHEN c >= min_count THEN c
                             ELSE 0 END) / sum(c)::DOUBLE, 6)
                     AS covered_share
            FROM counts CROSS JOIN th
            GROUP BY min_count
        """,
        "quality_woe": """
            WITH g AS (
              SELECT lang AS bucket,
                     sum((length(text) >= 300)::INT)::DOUBLE AS pos,
                     sum((length(text) < 300)::INT)::DOUBLE AS neg
              FROM documents WHERE text IS NOT NULL
              GROUP BY 1),
            t AS (SELECT sum(pos) AS tp, sum(neg) AS tn,
                         count(*)::DOUBLE AS nb FROM g),
            s AS (SELECT bucket, pos, neg,
                         (pos + 0.5) / (tp + 0.5 * nb) AS dp,
                         (neg + 0.5) / (tn + 0.5 * nb) AS dn
                  FROM g, t)
            SELECT bucket, pos::BIGINT AS n_pos, neg::BIGINT AS n_neg,
                   round(ln(dp / dn), 6) AS woe,
                   round((dp - dn) * ln(dp / dn), 6) AS iv_term
            FROM s
        """,
        "contract_verdicts": _contract_sql(),
        "rule_catalog": """
            SELECT * FROM (VALUES
              ('doc_id.gte', 'greater_than_or_equal_to', 'doc_id',
               'too small: must be at least 0'),
              ('doc_id.required', 'required', 'doc_id', 'is required'),
              ('text.gte', 'greater_than_or_equal_to', 'text',
               'too small: must have at least 50 character(s)'),
              ('text.lte', 'less_than_or_equal_to', 'text',
               'too big: must have at most 520 character(s)'),
              ('text.required', 'required', 'text', 'is required'),
              ('lang.gte', 'greater_than_or_equal_to', 'lang',
               'too small: must have at least 2 character(s)'),
              ('lang.lte', 'less_than_or_equal_to', 'lang',
               'too big: must have at most 2 character(s)'),
              ('lang.one_of', 'not_in_values', 'lang',
               'invalid value: expected one of en, de, es, fr'),
              ('lang.required', 'required', 'lang', 'is required'),
              ('source.starts_with', 'invalid_format', 'source',
               'invalid format: must start with ''src'''),
              ('source.required', 'required', 'source', 'is required'),
              ('n_chars.gte', 'greater_than_or_equal_to', 'n_chars',
               'too small: must be at least 50'),
              ('n_chars.required', 'required', 'n_chars', 'is required')
            ) AS t(rule_id, code, path_str, message)
        """,
        "ruleset_diff": """
            SELECT * FROM (VALUES
              ('lang', 'check_added',
               'one_of(values=[''en'', ''de'', ''es'', ''fr'', ''zh''])',
               true),
              ('lang', 'check_removed',
               'one_of(values=[''en'', ''de'', ''es'', ''fr''])', false),
              ('n_chars', 'required_removed', '', false),
              ('source', 'field_removed', 'kind=string', false),
              ('text', 'check_added', 'lte(value=400)', true),
              ('text', 'check_removed', 'lte(value=520)', false),
              ('url', 'field_added', 'kind=string', true)
            ) AS t(path, change, detail, breaking)
        """,
        "zorder_keys": _zorder_sql(),
        "repair_suggestions": _repair_sql(),
        "fk_integrity": _fk_sweep_sql(),
        "expectations_by_source": """
            WITH a AS (
              SELECT source, count(*)::DOUBLE AS c,
                     avg(length(text)) AS m,
                     count(DISTINCT lang)::DOUBLE AS dl
              FROM documents GROUP BY source)
            SELECT source, 'rows' AS expectation, 'row_count' AS kind,
                   NULL::VARCHAR AS "column", round(c, 6) AS observed,
                   20.0::DOUBLE AS lo, NULL::DOUBLE AS hi,
                   coalesce(c >= 20.0, false) AS passed
            FROM a
            UNION ALL
            SELECT source, 'len_mean', 'mean', 'text_len', round(m, 6),
                   50.0, 2000.0,
                   coalesce(m >= 50.0 AND m <= 2000.0, false)
            FROM a
            UNION ALL
            SELECT source, 'langs', 'distinct', 'lang', round(dl, 6),
                   1.0, NULL, coalesce(dl >= 1.0, false)
            FROM a
        """,
        "sampler_gof": _sampler_gof_sql(),
        "rolling_psi": """
            WITH counts AS (
              SELECT CAST(ts AS DATE) AS day,
                     coalesce(event_type, '∅') AS key,
                     count(*)::DOUBLE AS cnt
              FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
            grid AS (SELECT d.day, k.key
                     FROM (SELECT DISTINCT day FROM counts) d
                     CROSS JOIN (SELECT DISTINCT key FROM counts) k),
            filled AS (SELECT g.day, g.key,
                              coalesce(c.cnt, 0.0) AS cnt
                       FROM grid g LEFT JOIN counts c
                         USING (day, key)),
            sh AS (SELECT day, key,
                          greatest(cnt / greatest(sum(cnt) OVER
                                     (PARTITION BY day), 1.0),
                                   1e-9) AS q
                   FROM filled),
            lagd AS (SELECT day, key, q,
                            lag(q) OVER (PARTITION BY key
                                         ORDER BY day) AS p
                     FROM sh)
            SELECT day, count(*)::BIGINT AS n_keys,
                   round(sum((q - p) * ln(q / p)), 6) AS psi
            FROM lagd WHERE p IS NOT NULL
            GROUP BY day
        """,
        "null_patterns": """
            WITH masked AS (
              SELECT CASE WHEN doc_id % 7 = 0 THEN NULL
                          ELSE text END AS text,
                     CASE WHEN doc_id % 5 = 0 THEN NULL
                          ELSE lang END AS lang,
                     CASE WHEN doc_id % 11 = 0 THEN ''
                          ELSE source END AS source
              FROM documents),
            flags AS (
              SELECT (text IS NULL OR text = '') AS m0,
                     (lang IS NULL OR lang = '') AS m1,
                     (source IS NULL OR source = '') AS m2
              FROM masked),
            census AS (
              SELECT concat(CASE WHEN m0 THEN '1' ELSE '0' END,
                            CASE WHEN m1 THEN '1' ELSE '0' END,
                            CASE WHEN m2 THEN '1' ELSE '0' END)
                       AS pattern,
                     concat_ws(',',
                       CASE WHEN m0 THEN 'text' END,
                       CASE WHEN m1 THEN 'lang' END,
                       CASE WHEN m2 THEN 'source' END)
                       AS missing_cols,
                     count(*)::BIGINT AS n_rows
              FROM flags GROUP BY 1, 2)
            SELECT pattern, missing_cols, n_rows,
                   round(n_rows / sum(n_rows) OVER (), 6) AS share
            FROM census
        """,
        "ts_monotonic": """
            WITH stepped AS (
              SELECT user_id,
                     CASE WHEN value < lag(value) OVER
                            (PARTITION BY user_id ORDER BY event_id)
                          THEN 1 ELSE 0 END AS inv
              FROM events
              WHERE user_id IS NOT NULL AND event_id IS NOT NULL
                AND value IS NOT NULL),
            agg AS (
              SELECT user_id, count(*)::BIGINT AS n_rows,
                     sum(inv)::BIGINT AS n_inversions
              FROM stepped GROUP BY user_id)
            SELECT user_id, n_rows, n_inversions,
                   round(n_inversions / (n_rows - 1), 6)
                     AS inversion_rate
            FROM agg WHERE n_inversions > 0
        """,
        "fd_mine": """
            WITH c1 AS (SELECT lang, source, count(*) AS c
                        FROM documents WHERE lang IS NOT NULL
                        GROUP BY 1, 2),
            p1 AS (SELECT lang, max(c) AS mx, sum(c) AS tot
                   FROM c1 GROUP BY lang),
            r1 AS (SELECT 'lang' AS lhs, 'source' AS rhs,
                          sum(tot)::BIGINT AS n_rows,
                          count(*)::BIGINT AS n_lhs,
                          round(sum(mx) / sum(tot), 6) AS confidence,
                          sum(mx) = sum(tot) AS holds
                   FROM p1),
            c2 AS (SELECT source, lang, count(*) AS c
                   FROM documents WHERE source IS NOT NULL
                   GROUP BY 1, 2),
            p2 AS (SELECT source, max(c) AS mx, sum(c) AS tot
                   FROM c2 GROUP BY source),
            r2 AS (SELECT 'source' AS lhs, 'lang' AS rhs,
                          sum(tot)::BIGINT AS n_rows,
                          count(*)::BIGINT AS n_lhs,
                          round(sum(mx) / sum(tot), 6) AS confidence,
                          sum(mx) = sum(tot) AS holds
                   FROM p2),
            c3 AS (SELECT doc_id, lang, count(*) AS c
                   FROM documents WHERE doc_id IS NOT NULL
                   GROUP BY 1, 2),
            p3 AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot
                   FROM c3 GROUP BY doc_id),
            r3 AS (SELECT 'doc_id' AS lhs, 'lang' AS rhs,
                          sum(tot)::BIGINT AS n_rows,
                          count(*)::BIGINT AS n_lhs,
                          round(sum(mx) / sum(tot), 6) AS confidence,
                          sum(mx) = sum(tot) AS holds
                   FROM p3)
            SELECT * FROM r1 UNION ALL SELECT * FROM r2
            UNION ALL SELECT * FROM r3
        """,
        "badword_rate": """
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum(CASE WHEN regexp_matches(
                              text, '\\b(?:slow|legacy)\\b', 'i')
                            THEN 1 ELSE 0 END)::BIGINT AS n_flagged,
                   round(sum(CASE WHEN regexp_matches(
                              text, '\\b(?:slow|legacy)\\b', 'i')
                            THEN 1 ELSE 0 END) / count(*), 6)
                     AS flag_rate
            FROM documents GROUP BY lang
        """,
        "scd2_history": """
            WITH clean AS (
              SELECT user_id AS key, ts AS __ts, event_id,
                     coalesce(CAST(event_type AS VARCHAR), '∅')
                       AS state
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            stepped AS (
              SELECT key, __ts, state, event_id,
                     CASE WHEN lag(state) OVER w IS NULL
                               OR state <> lag(state) OVER w
                          THEN 1 ELSE 0 END AS chg
              FROM clean
              WINDOW w AS (PARTITION BY key ORDER BY event_id)),
            versioned AS (
              SELECT key, __ts, state,
                     sum(chg) OVER (PARTITION BY key ORDER BY event_id
                                    ROWS UNBOUNDED PRECEDING)
                       AS version
              FROM stepped),
            runs AS (
              SELECT key, version, state,
                     min(__ts) AS valid_from,
                     count(*)::BIGINT AS n_rows
              FROM versioned GROUP BY 1, 2, 3)
            SELECT key, version::BIGINT AS version, state, valid_from,
                   lead(valid_from) OVER w2 AS valid_to, n_rows,
                   lead(valid_from) OVER w2 IS NULL AS is_current
            FROM runs
            WINDOW w2 AS (PARTITION BY key ORDER BY version)
        """,
        "resolve_chains": """
            WITH RECURSIVE emap AS (
              SELECT src, min(dst) AS dst FROM (
                SELECT doc_id AS src, doc_id - 1 AS dst
                FROM documents WHERE doc_id % 50 <> 0)
              GROUP BY src),
            walk AS (
              SELECT src, dst AS cur FROM emap
              UNION ALL
              SELECT w.src, e.dst FROM walk w
              JOIN emap e ON w.cur = e.src)
            SELECT w.src, w.cur AS resolved,
                   w.cur NOT IN (SELECT src FROM emap) AS is_terminal
            FROM walk w
            WHERE w.cur NOT IN (SELECT src FROM emap)
        """,
        "group_ols": """
            WITH g AS (
              SELECT l_returnflag, count(*)::BIGINT AS n,
                     avg(l_quantity) AS mx,
                     avg(l_extendedprice) AS my,
                     covar_samp(l_quantity, l_extendedprice) AS cxy,
                     var_samp(l_quantity) AS vx,
                     stddev_samp(l_quantity) AS sx,
                     stddev_samp(l_extendedprice) AS sy
              FROM lineitem
              WHERE l_quantity IS NOT NULL
                AND l_extendedprice IS NOT NULL
              GROUP BY 1)
            SELECT l_returnflag, n,
                   round(round(cxy / vx, 6), 2) AS slope,
                   round(round(my - (cxy / vx) * mx, 6), 2)
                     AS intercept,
                   round((cxy / (sx * sy)) * (cxy / (sx * sy)), 6)
                     AS r2
            FROM g
        """,
        "roc_auc": """
            WITH clean AS (
              SELECT lang AS g, n_chars AS s,
                     CASE WHEN contains(text, 'table')
                          THEN 1 ELSE 0 END AS y
              FROM documents
              WHERE n_chars IS NOT NULL AND text IS NOT NULL),
            per_score AS (
              SELECT g, s, sum(y) AS p, sum(1 - y) AS q
              FROM clean GROUP BY 1, 2),
            cum AS (
              SELECT g, p, q,
                     sum(q) OVER (PARTITION BY g ORDER BY s
                                  ROWS UNBOUNDED PRECEDING) - q
                       AS below
              FROM per_score)
            SELECT g AS lang, sum(p)::BIGINT AS n_pos,
                   sum(q)::BIGINT AS n_neg,
                   round(sum(p * (below + q / 2.0))
                         / (sum(p)::DOUBLE * sum(q)::DOUBLE), 6)
                     AS auc
            FROM cum GROUP BY g
        """,
        "lift_table": """
            WITH tiled AS (
              SELECT ntile(10) OVER (ORDER BY n_chars DESC,
                                     doc_id ASC) AS bucket,
                     CASE WHEN contains(text, 'spark')
                          THEN 1 ELSE 0 END AS y
              FROM documents
              WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL),
            per AS (
              SELECT bucket, count(*)::BIGINT AS n,
                     sum(y)::BIGINT AS n_flagged
              FROM tiled GROUP BY 1)
            SELECT bucket, n, n_flagged,
                   round(n_flagged / n, 6) AS rate,
                   round((sum(n_flagged) OVER w * 1.0
                          / sum(n) OVER w)
                         / (sum(n_flagged) OVER () * 1.0
                            / sum(n) OVER ()), 6) AS cum_lift,
                   round(sum(n_flagged) OVER w * 1.0
                         / sum(n_flagged) OVER (), 6) AS cum_capture
            FROM per
            WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        """,
        "fs_weights": """
            WITH pairs AS (
              SELECT (a.source = b.source)::INT AS g_source,
                     (floor(a.n_chars / 25.0)
                      = floor(b.n_chars / 25.0))::INT AS g_len,
                     (substr(a.text, 1, 20)
                      = substr(b.text, 1, 20))::INT AS g_prefix,
                     (a.n_chars = b.n_chars)::INT AS m
              FROM documents a JOIN documents b
                ON a.doc_id + 1 = b.doc_id AND a.lang = b.lang),
            f AS (
              SELECT 'agree_source' AS field, sum(m) AS nm,
                     sum(1 - m) AS nn, sum(g_source * m) AS am,
                     sum(g_source * (1 - m)) AS au FROM pairs
              UNION ALL
              SELECT 'agree_len', sum(m), sum(1 - m),
                     sum(g_len * m), sum(g_len * (1 - m)) FROM pairs
              UNION ALL
              SELECT 'agree_prefix', sum(m), sum(1 - m),
                     sum(g_prefix * m), sum(g_prefix * (1 - m))
              FROM pairs)
            SELECT field, nm::BIGINT AS n_match,
                   nn::BIGINT AS n_nonmatch,
                   round((am + 0.5) / (nm + 1.0), 6) AS m,
                   round((au + 0.5) / (nn + 1.0), 6) AS u,
                   round(log2(((am + 0.5) / (nm + 1.0))
                              / ((au + 0.5) / (nn + 1.0))), 6)
                     AS agreement_weight,
                   round(log2((1 - (am + 0.5) / (nm + 1.0))
                              / (1 - (au + 0.5) / (nn + 1.0))), 6)
                     AS disagreement_weight
            FROM f
        """,
        "t_closeness": """
            WITH base AS (
              SELECT lang, floor(n_chars / 100.0)::BIGINT
                       AS len_bucket,
                     coalesce(source, '∅') AS s
              FROM documents),
            cells AS (
              SELECT lang, len_bucket, s, count(*) AS nc
              FROM base GROUP BY 1, 2, 3),
            gdist AS (
              SELECT s, count(*) * 1.0
                       / (SELECT count(*) FROM base) AS q
              FROM base GROUP BY s),
            j AS (
              SELECT c.lang, c.len_bucket, c.nc, g.q,
                     sum(c.nc) OVER (PARTITION BY c.lang,
                                     c.len_bucket) AS n
              FROM cells c JOIN gdist g USING (s))
            SELECT lang, len_bucket, any_value(n)::BIGINT AS n,
                   round((sum(abs(nc * 1.0 / n - q))
                          + (1 - sum(q))) / 2, 6) AS emd,
                   round((sum(abs(nc * 1.0 / n - q))
                          + (1 - sum(q))) / 2, 6) <= 0.2 AS ok
            FROM j GROUP BY 1, 2
        """,
        "keyness": f"""
            WITH lng AS (
              SELECT CASE WHEN lang IS NULL THEN NULL
                          WHEN lang = 'en' THEN 1 ELSE 0 END AS f,
                     unnest(string_split({_NORM_SQL}, ' ')) AS term
              FROM documents),
            counts AS (
              SELECT term, sum(f)::DOUBLE AS a,
                     sum(1 - f)::DOUBLE AS b
              FROM lng WHERE term <> '' AND f IS NOT NULL
              GROUP BY term),
            tot AS (
              SELECT sum(f)::DOUBLE AS c, sum(1 - f)::DOUBLE AS d
              FROM lng WHERE term <> '' AND f IS NOT NULL),
            j AS (
              SELECT term, a, b, c, d,
                     c * (a + b) / (c + d) AS e1,
                     d * (a + b) / (c + d) AS e2
              FROM counts, tot WHERE a + b >= 5),
            g AS (
              SELECT term, a, b, c, d,
                     2 * (CASE WHEN a > 0 THEN a * ln(a / e1)
                               ELSE 0 END
                          + CASE WHEN b > 0 THEN b * ln(b / e2)
                                 ELSE 0 END) AS g2
              FROM j)
            SELECT term, a::BIGINT AS n_focus, b::BIGINT AS n_ref,
                   round(CASE WHEN a / c > b / d THEN g2
                              ELSE -g2 END, 6) AS keyness
            FROM g
        """,
        "vocab_richness": f"""
            WITH lng AS (
              SELECT lang AS g,
                     unnest(string_split({_NORM_SQL}, ' ')) AS t
              FROM documents),
            per AS (
              SELECT g, t, count(*) AS c
              FROM lng WHERE t <> '' GROUP BY 1, 2),
            agg AS (
              SELECT g, sum(c)::BIGINT AS n_tokens,
                     count(*)::BIGINT AS vocab,
                     sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS f1,
                     sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT
                       AS f2
              FROM per GROUP BY g)
            SELECT g AS lang, n_tokens, vocab, f1, f2,
                   round(vocab + f1 * (f1 - 1) / (2.0 * (f2 + 1)),
                         6) AS chao1,
                   round(1 - f1 * 1.0 / n_tokens, 6) AS coverage
            FROM agg
        """,
        "raking_weights": _rake_sql(),
        "weight_ess": """
            WITH wts AS (
              SELECT lang,
                     1.0 / (1.0 + n_chars / 100.0) AS w
              FROM documents),
            g AS (
              SELECT lang, count(*)::BIGINT AS n_rows,
                     count(CASE WHEN w > 0 THEN w END)::BIGINT
                       AS n_weighted,
                     sum(CASE WHEN w > 0 THEN w END) AS sw,
                     sum(CASE WHEN w > 0 THEN w * w END) AS sw2
              FROM wts GROUP BY lang)
            SELECT lang, n_rows, n_weighted,
                   round(sw * sw / sw2, 6) AS ess,
                   round(n_weighted * sw2 / (sw * sw), 6) AS deff
            FROM g
        """,
        "stream_psi": """
            WITH ts AS (
              SELECT doc_id, lang,
                     TIMESTAMP '2026-01-01 00:00:00'
                     + ((doc_id % 600) // 60) * INTERVAL 1 MINUTE
                       AS window_start
              FROM documents),
            base AS (
              SELECT lang, count(*) * 1.0
                       / (SELECT count(*) FROM documents) AS p
              FROM documents GROUP BY lang),
            counts AS (
              SELECT window_start, lang, count(*) AS c
              FROM ts GROUP BY 1, 2),
            tot AS (
              SELECT window_start, sum(c) AS n
              FROM counts GROUP BY 1),
            per AS (
              SELECT c.window_start, any_value(t.n) AS n,
                     sum((c.c * 1.0 / t.n - b.p)
                         * (ln(greatest(c.c * 1.0 / t.n, 1e-9))
                            - ln(greatest(b.p, 1e-9)))) AS psi,
                     sum(b.p) AS covered
              FROM counts c
              JOIN base b USING (lang)
              JOIN tot t USING (window_start)
              GROUP BY 1)
            -- append mode only emits windows the final watermark has
            -- closed: wm = max event time - 2 min, emit end <= wm
            SELECT window_start,
                   window_start + INTERVAL 1 MINUTE AS window_end,
                   n::BIGINT AS n, round(psi, 6) AS psi_present,
                   round(1 - covered, 6) AS missing_share,
                   round(psi, 6) > 0.2 AS drifted
            FROM per
            WHERE window_start + INTERVAL 1 MINUTE <=
              (SELECT TIMESTAMP '2026-01-01 00:00:00'
                      + max((doc_id % 600)) * INTERVAL 1 SECOND
                      - INTERVAL 2 MINUTE
               FROM documents)
        """,
        # twin of q_snapshot_parity — identical digest arithmetic:
        # NUL-sentineled, unit-separated canonical row string → md5 →
        # first 15 hex chars as a 60-bit integer → commutative SUM
        # mod 2^61 per source (HUGEINT here, decimal(38,0) in Spark)
        "snapshot_parity": """
            WITH canon AS (
              SELECT source, doc_id,
                     ('0x' || substr(md5(concat_ws(chr(31),
                        coalesce(doc_id::VARCHAR, chr(0)),
                        coalesce(text, chr(0)),
                        coalesce(lang, chr(0)),
                        coalesce(source, chr(0)),
                        coalesce(n_chars::VARCHAR, chr(0)))),
                        1, 15))::BIGINT AS d
              FROM documents),
            canon_b AS (
              SELECT source, doc_id,
                     ('0x' || substr(md5(concat_ws(chr(31),
                        coalesce(doc_id::VARCHAR, chr(0)),
                        coalesce(CASE WHEN doc_id % 97 = 0
                                      THEN text || '!'
                                      ELSE text END, chr(0)),
                        coalesce(lang, chr(0)),
                        coalesce(source, chr(0)),
                        coalesce(n_chars::VARCHAR, chr(0)))),
                        1, 15))::BIGINT AS d
              FROM documents WHERE doc_id % 101 <> 0),
            fa AS (
              SELECT source, count(*)::BIGINT AS n_rows,
                     (sum(d) % 2305843009213693952)::BIGINT AS fp,
                     min(d)::BIGINT AS fp_min, max(d)::BIGINT AS fp_max
              FROM canon GROUP BY source),
            fb AS (
              SELECT source, count(*)::BIGINT AS n_rows,
                     (sum(d) % 2305843009213693952)::BIGINT AS fp,
                     min(d)::BIGINT AS fp_min, max(d)::BIGINT AS fp_max
              FROM canon_b GROUP BY source)
            SELECT coalesce(fa.source, fb.source) AS source,
                   coalesce(fa.n_rows, 0) AS n_a,
                   coalesce(fb.n_rows, 0) AS n_b,
                   fa.fp AS fp_a, fb.fp AS fp_b,
                   (fa.n_rows IS NOT DISTINCT FROM fb.n_rows
                    AND fa.fp IS NOT DISTINCT FROM fb.fp
                    AND fa.fp_min IS NOT DISTINCT FROM fb.fp_min
                    AND fa.fp_max IS NOT DISTINCT FROM fb.fp_max)
                     AS match
            FROM fa FULL JOIN fb ON fa.source = fb.source
            ORDER BY source
        """,
        # twin of q_jw_title_pairs — same normalize/blocking CTEs as
        # lev_prefix_pairs, scored with DuckDB's built-in
        # jaro_winkler_similarity (the Spark pandas kernel implements
        # the identical textbook JW, verified value-identical)
        "jw_title_pairs": f"""
            WITH k AS (
              SELECT doc_id,
                     substr({_NORM_SQL}, 1, 40) AS key
              FROM documents),
            b AS (
              SELECT doc_id, key, substr(key, 1, 8) AS block
              FROM k),
            ok AS (SELECT block FROM b GROUP BY block
                   HAVING count(*) <= 200),
            c AS (SELECT b.* FROM b JOIN ok USING (block)),
            p AS (
              SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                     round(jaro_winkler_similarity(l.key, r.key), 6)
                       AS jw
              FROM c l JOIN c r
                ON l.block = r.block AND l.doc_id < r.doc_id)
            SELECT id_a, id_b, jw FROM p WHERE jw >= 0.9
            ORDER BY jw DESC, id_a, id_b LIMIT 40
        """,
        # twin of q_w1_len_drift — the same exact CDF-gap-area
        # integral with window sums over the distinct-value rows
        "w1_len_drift": """
            WITH h AS (
              SELECT n_chars AS v,
                     sum(CASE WHEN doc_id % 2 = 0
                              THEN 1 ELSE 0 END) AS ca,
                     sum(CASE WHEN doc_id % 2 = 0
                              THEN 0 ELSE 1 END) AS cb
              FROM documents WHERE n_chars IS NOT NULL
              GROUP BY n_chars),
            c AS (
              SELECT v,
                     sum(ca) OVER (ORDER BY v) * 1.0
                       / sum(ca) OVER () AS cdf_a,
                     sum(cb) OVER (ORDER BY v) * 1.0
                       / sum(cb) OVER () AS cdf_b,
                     lead(v) OVER (ORDER BY v) - v AS gap,
                     sum(ca) OVER () AS na,
                     sum(cb) OVER () AS nb
              FROM h)
            SELECT round(sum(abs(cdf_a - cdf_b) * gap), 6) AS w1,
                   count(*)::BIGINT AS n_values,
                   any_value(na)::BIGINT AS n_a,
                   any_value(nb)::BIGINT AS n_b
            FROM c
        """,
        # twin of q_dp_lang_counts — identical deterministic Laplace
        # draw: 52 md5 bits → (0,1) uniform → inverse CDF with
        # scale 1/ε = 2.0, clamp at 0, half-up round
        "dp_lang_counts": """
            WITH c AS (
              SELECT lang, count(*)::BIGINT AS n
              FROM documents GROUP BY lang),
            u AS (
              SELECT lang, n,
                     (('0x' || substr(md5('dp-r4:' || lang), 1, 13))
                        ::BIGINT + 0.5) / 4503599627370496.0 AS u
              FROM c)
            SELECT lang,
                   greatest(0, round(n + (-2.0) * sign(u - 0.5)
                                     * ln(1 - 2 * abs(u - 0.5)))
                              ::BIGINT) AS noisy_count,
                   0.5 AS epsilon
            FROM u ORDER BY lang
        """,
        # twin of q_ht_total_chars — same inclusion decisions
        # (uniform01 from md5('ht'||id), π = min(1, n_chars/500)) and
        # the same HT total / Poisson-design variance terms
        "ht_total_chars": """
            WITH b AS (
              SELECT lang, n_chars::DOUBLE AS y,
                     least(1.0, n_chars / 500.0) AS pi,
                     (('0x' || substr(md5('ht' || doc_id::VARCHAR),
                                      1, 13))::BIGINT + 0.5)
                       / 4503599627370496.0 AS u
              FROM documents)
            SELECT lang,
                   sum(CASE WHEN u < pi THEN 1 ELSE 0 END)::BIGINT
                     AS n_sampled,
                   count(*)::BIGINT AS n_pop,
                   round(sum(CASE WHEN u < pi THEN y / pi
                             ELSE 0 END), 6) AS ht_total,
                   round(sqrt(sum(CASE WHEN u < pi
                                  THEN (1 - pi) / (pi * pi) * y * y
                                  ELSE 0 END)), 6) AS ht_se,
                   round(sum(y), 6) AS true_total
            FROM b GROUP BY lang ORDER BY lang
        """,
        # twin of q_rake_keywords — identical delimiting regexes
        # (punctuation runs and word-bounded stopwords → '|'), split,
        # then the same word-stats agg + distinct-phrase agg + join
        "rake_keywords": f"""
            WITH frag AS (
              SELECT unnest(string_split(
                regexp_replace(
                  regexp_replace({_NORM_SQL}, '[^a-z0-9 ]+', '|', 'g'),
                  '\\b(?:{"|".join(text.RAKE_STOPWORDS)})\\b',
                  '|', 'g'),
                '|')) AS f
              FROM documents),
            phr AS (SELECT trim(f) AS phrase FROM frag
                    WHERE trim(f) <> ''),
            occ AS (SELECT phrase,
                           len(string_split(phrase, ' '))::BIGINT
                             AS plen
                    FROM phr),
            winst AS (SELECT plen,
                             unnest(string_split(phrase, ' ')) AS word
                      FROM occ),
            ws AS (SELECT word,
                          sum(plen) * 1.0 / count(*) AS wscore
                   FROM winst GROUP BY word),
            dp AS (SELECT phrase, count(*)::BIGINT AS n_occ,
                          any_value(plen) AS n_words
                   FROM occ GROUP BY phrase),
            dw AS (SELECT phrase,
                          unnest(string_split(phrase, ' ')) AS word
                   FROM dp),
            ps AS (SELECT phrase, round(sum(wscore), 6) AS score
                   FROM dw JOIN ws USING (word) GROUP BY phrase)
            SELECT dp.phrase, dp.n_words, dp.n_occ, ps.score
            FROM dp JOIN ps USING (phrase)
            ORDER BY score DESC, phrase LIMIT 20
        """,
        # twin of q_page_hinkley_volume — same two window layers
        # (running mean first, then cumulative deviation + running
        # min) over the same daily aggregation
        "page_hinkley_volume": """
            WITH daily AS (
              SELECT CAST(ts AS DATE) AS "order",
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1),
            s1 AS (
              SELECT "order", x,
                     avg(x) OVER (ORDER BY "order"
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS run_mean
              FROM daily),
            s2 AS (
              SELECT "order", x, run_mean,
                     sum(x - run_mean) OVER (ORDER BY "order"
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS m
              FROM s1),
            s3 AS (
              SELECT "order", x, run_mean, m,
                     m - min(m) OVER (ORDER BY "order"
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS ph
              FROM s2)
            SELECT "order", round(x, 6) AS x,
                   round(run_mean, 6) AS run_mean,
                   round(m, 6) AS m, round(ph, 6) AS ph,
                   ph > 30.0 AS alarm
            FROM s3 ORDER BY "order"
        """,
        # twin of q_ecod_outliers — identical per-dimension
        # distinct-value histograms, tail probabilities and
        # moment-based skew direction
        "ecod_outliers": """
            WITH base AS (
              SELECT doc_id, n_chars::DOUBLE AS n_chars,
                     len(string_split(text, ' '))::DOUBLE AS n_tokens
              FROM documents WHERE text IS NOT NULL),
            h1 AS (SELECT n_chars AS v, count(*)::DOUBLE AS c
                   FROM base WHERE n_chars IS NOT NULL GROUP BY 1),
            mo1 AS (SELECT sum(c) AS n, sum(v * c) / sum(c) AS mu,
                           sum(v * v * c) / sum(c) AS m2,
                           sum(v * v * v * c) / sum(c) AS m3
                    FROM h1),
            sk1 AS (SELECT (CASE WHEN m2 - mu * mu > 0
                       THEN (m3 - 3 * mu * m2 + 2 * mu * mu * mu)
                            / pow(m2 - mu * mu, 1.5)
                       ELSE 0.0 END) < 0 AS neg FROM mo1),
            t1 AS (SELECT v,
                     sum(c) OVER (ORDER BY v) / (SELECT n FROM mo1)
                       AS fl,
                     ((SELECT n FROM mo1) - sum(c) OVER (ORDER BY v)
                      + c) / (SELECT n FROM mo1) AS fr
                   FROM h1),
            h2 AS (SELECT n_tokens AS v, count(*)::DOUBLE AS c
                   FROM base WHERE n_tokens IS NOT NULL GROUP BY 1),
            mo2 AS (SELECT sum(c) AS n, sum(v * c) / sum(c) AS mu,
                           sum(v * v * c) / sum(c) AS m2,
                           sum(v * v * v * c) / sum(c) AS m3
                    FROM h2),
            sk2 AS (SELECT (CASE WHEN m2 - mu * mu > 0
                       THEN (m3 - 3 * mu * m2 + 2 * mu * mu * mu)
                            / pow(m2 - mu * mu, 1.5)
                       ELSE 0.0 END) < 0 AS neg FROM mo2),
            t2 AS (SELECT v,
                     sum(c) OVER (ORDER BY v) / (SELECT n FROM mo2)
                       AS fl,
                     ((SELECT n FROM mo2) - sum(c) OVER (ORDER BY v)
                      + c) / (SELECT n FROM mo2) AS fr
                   FROM h2),
            j AS (
              SELECT b.doc_id, b.n_chars, b.n_tokens,
                     coalesce(-ln(t1.fl), 0) AS l1,
                     coalesce(-ln(t1.fr), 0) AS r1,
                     coalesce(CASE WHEN (SELECT neg FROM sk1)
                              THEN -ln(t1.fl) ELSE -ln(t1.fr) END, 0)
                       AS a1,
                     coalesce(-ln(t2.fl), 0) AS l2,
                     coalesce(-ln(t2.fr), 0) AS r2,
                     coalesce(CASE WHEN (SELECT neg FROM sk2)
                              THEN -ln(t2.fl) ELSE -ln(t2.fr) END, 0)
                       AS a2
              FROM base b
              LEFT JOIN t1 ON b.n_chars = t1.v
              LEFT JOIN t2 ON b.n_tokens = t2.v)
            SELECT doc_id, n_chars, n_tokens,
                   round(l1 + l2, 6) AS score_left,
                   round(r1 + r2, 6) AS score_right,
                   round(a1 + a2, 6) AS score_auto,
                   round(greatest(l1 + l2, r1 + r2, a1 + a2), 6)
                     AS ecod_score
            FROM j
            ORDER BY ecod_score DESC, doc_id LIMIT 25
        """,
        # twin of q_cdc_chunk_dedup — boundaries re-derived per
        # position with the same md5-window predicate, chunks via a
        # lead window over cut positions
        "cdc_chunk_dedup": """
            WITH docs AS (
              SELECT doc_id, text, length(text) AS ln FROM documents
              WHERE text IS NOT NULL AND length(text) > 0),
            pos AS (
              SELECT doc_id, text,
                     unnest(range(2, greatest(2, ln - 6))) AS i
              FROM docs),
            cuts AS (
              SELECT doc_id, i FROM pos
              WHERE substr(md5(substr(text, i::INT, 8)), 1, 2)
                    = '00'),
            starts AS (
              SELECT doc_id, 1::BIGINT AS s FROM docs
              UNION ALL SELECT doc_id, i FROM cuts),
            chunks AS (
              SELECT st.doc_id,
                     substr(d.text, st.s::INT,
                            (coalesce(lead(st.s) OVER (
                               PARTITION BY st.doc_id ORDER BY st.s),
                               d.ln + 1) - st.s)::INT) AS chunk
              FROM starts st JOIN docs d USING (doc_id))
            SELECT md5(chunk) AS chunk_hash,
                   max(length(chunk))::BIGINT AS chunk_len,
                   count(DISTINCT doc_id)::BIGINT AS n_docs,
                   count(*)::BIGINT AS n_occurrences
            FROM chunks GROUP BY 1
            HAVING count(DISTINCT doc_id) >= 2
               AND max(length(chunk)) >= 20
            ORDER BY n_docs DESC, n_occurrences DESC, chunk_hash
            LIMIT 30
        """,
        # twin of q_kn_bigrams — same normalized tokens, adjacent
        # pairs by position, and the same four KN count tables
        "kn_bigrams": f"""
            WITH toks AS (
              SELECT string_split({_NORM_SQL}, ' ') AS t
              FROM documents WHERE text IS NOT NULL),
            big AS (
              SELECT t[i] || ' ' || t[i + 1] AS bigram
              FROM (SELECT t, unnest(range(1, len(t))) AS i
                    FROM toks WHERE len(t) >= 2)),
            bc AS (SELECT bigram, count(*)::BIGINT AS c
                   FROM big GROUP BY 1),
            ctx AS (SELECT string_split(bigram, ' ')[1] AS w1,
                           sum(c) AS c_ctx, count(*) AS n1p_ctx
                    FROM bc GROUP BY 1),
            cont AS (SELECT string_split(bigram, ' ')[2] AS w2,
                            count(*) AS n1p_cont
                     FROM bc GROUP BY 1),
            tot AS (SELECT count(*)::DOUBLE AS n1p_total FROM bc)
            SELECT bigram, c,
                   round(greatest(c - 0.75, 0) / c_ctx
                         + (0.75 / c_ctx) * n1p_ctx
                           * (n1p_cont / (SELECT n1p_total FROM tot)),
                         6) AS p_kn
            FROM bc
            JOIN ctx ON string_split(bigram, ' ')[1] = ctx.w1
            JOIN cont ON string_split(bigram, ' ')[2] = cont.w2
            ORDER BY c DESC, bigram LIMIT 40
        """,
        # twin of q_burrows_delta — same zero-filled group × word
        # grid, population z-scores, pairwise mean |z_a − z_b|
        "burrows_delta_sources": f"""
            WITH words AS (
              SELECT source AS g,
                     unnest(string_split({_NORM_SQL}, ' ')) AS w
              FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL),
            wf AS (SELECT g, w, count(*)::BIGINT AS c
                   FROM words WHERE w <> '' GROUP BY 1, 2),
            top AS (SELECT w FROM (
                      SELECT w, sum(c) AS cw FROM wf GROUP BY 1)
                    ORDER BY cw DESC, w LIMIT 40),
            gt AS (SELECT g, sum(c) AS gtot FROM wf GROUP BY 1),
            grid AS (
              SELECT gt.g, top.w, gt.gtot,
                     coalesce(wf.c, 0) AS c
              FROM gt CROSS JOIN top
              LEFT JOIN wf ON wf.g = gt.g AND wf.w = top.w),
            freq AS (SELECT g, w, c * 1.0 / gtot AS f FROM grid),
            st AS (SELECT w, avg(f) AS mu, stddev_pop(f) AS sd
                   FROM freq GROUP BY 1),
            z AS (SELECT g, freq.w AS w, (f - mu) / sd AS z
                  FROM freq JOIN st ON freq.w = st.w
                  WHERE sd > 0)
            SELECT a.g AS group_a, b.g AS group_b,
                   round(avg(abs(a.z - b.z)), 6) AS delta,
                   count(*)::BIGINT AS n_words
            FROM z a JOIN z b ON a.w = b.w AND a.g < b.g
            GROUP BY 1, 2
            ORDER BY group_a, group_b
        """,
        # twin of q_energy_len_drift — the three CDF-product areas
        # over the same merged distinct-value rows as w1_len_drift
        "energy_len_drift": """
            WITH h AS (
              SELECT n_chars AS v,
                     sum(CASE WHEN doc_id % 2 = 0
                              THEN 1 ELSE 0 END) AS ca,
                     sum(CASE WHEN doc_id % 2 = 0
                              THEN 0 ELSE 1 END) AS cb
              FROM documents WHERE n_chars IS NOT NULL
              GROUP BY n_chars),
            c AS (
              SELECT sum(ca) OVER (ORDER BY v) * 1.0
                       / sum(ca) OVER () AS fa,
                     sum(cb) OVER (ORDER BY v) * 1.0
                       / sum(cb) OVER () AS fb,
                     lead(v) OVER (ORDER BY v) - v AS gap,
                     sum(ca) OVER () AS na,
                     sum(cb) OVER () AS nb
              FROM h),
            terms AS (
              SELECT sum((fa * (1 - fb) + fb * (1 - fa)) * gap)
                       AS exy,
                     sum(2 * fa * (1 - fa) * gap) AS exx,
                     sum(2 * fb * (1 - fb) * gap) AS eyy,
                     any_value(na)::BIGINT AS n_a,
                     any_value(nb)::BIGINT AS n_b
              FROM c)
            SELECT round(exy, 6) AS e_xy, round(exx, 6) AS e_xx,
                   round(eyy, 6) AS e_yy,
                   round(2 * exy - exx - eyy, 6) AS energy_d2,
                   n_a, n_b
            FROM terms
        """,
        # twin of q_mcnemar_rule_shift — same four cells, same
        # continuity-corrected chi-square
        "mcnemar_rule_shift": """
            WITH cells AS (
              SELECT count(*)::BIGINT AS n,
                     sum(CASE WHEN n_chars >= 100 AND n_chars >= 120
                         THEN 1 ELSE 0 END)::BIGINT AS n_pass_pass,
                     sum(CASE WHEN n_chars >= 100
                              AND NOT n_chars >= 120
                         THEN 1 ELSE 0 END)::BIGINT AS n_pass_fail,
                     sum(CASE WHEN NOT n_chars >= 100
                              AND n_chars >= 120
                         THEN 1 ELSE 0 END)::BIGINT AS n_fail_pass,
                     sum(CASE WHEN NOT n_chars >= 100
                              AND NOT n_chars >= 120
                         THEN 1 ELSE 0 END)::BIGINT AS n_fail_fail
              FROM documents),
            st AS (
              SELECT *,
                     CASE WHEN n_pass_fail + n_fail_pass > 0
                          THEN pow(abs(n_pass_fail - n_fail_pass)
                                   - 1, 2)
                               / (n_pass_fail + n_fail_pass)
                          ELSE 0.0 END AS chi2_raw
              FROM cells)
            SELECT n, n_pass_pass, n_pass_fail, n_fail_pass,
                   n_fail_fail, round(chi2_raw, 6) AS chi2,
                   chi2_raw > 3.841459 AS significant_05
            FROM st
        """,
        # twin of q_pan_luhn_scan — identical candidate regex and
        # mod-10 checksum over the reversed digit run (DuckDB list
        # lambdas are 1-based: position i even == Spark 0-based odd)
        "pan_luhn_scan": """
            WITH t AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 7 = 0
                                  THEN ' 4111111111111111'
                                  WHEN doc_id % 11 = 0
                                  THEN ' 4111111111111112'
                                  ELSE '' END AS text2
              FROM documents WHERE text IS NOT NULL),
            c AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(text2,
                                               '\\d{13,19}')) AS run
              FROM t),
            v AS (
              SELECT doc_id,
                     (list_sum(list_transform(
                        range(1, length(run) + 1),
                        i -> CASE WHEN i % 2 = 0 THEN
                               CASE WHEN CAST(substr(reverse(run),
                                         i::INT, 1) AS INT) * 2 > 9
                                    THEN CAST(substr(reverse(run),
                                         i::INT, 1) AS INT) * 2 - 9
                                    ELSE CAST(substr(reverse(run),
                                         i::INT, 1) AS INT) * 2 END
                             ELSE CAST(substr(reverse(run),
                                       i::INT, 1) AS INT) END))
                      % 10 = 0) AS ok
              FROM c)
            SELECT doc_id AS id, count(*)::BIGINT AS n_candidates,
                   sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT
                     AS n_luhn_valid
            FROM v GROUP BY 1 ORDER BY id
        """,
        # twin of q_kn_source_ppl — full KN table (no limit) joined
        # back to per-doc bigrams, per-source bits + perplexity
        "kn_source_ppl": f"""
            WITH toks AS (
              SELECT source, string_split({_NORM_SQL}, ' ') AS t
              FROM documents WHERE text IS NOT NULL),
            big AS (
              SELECT source, t[i] || ' ' || t[i + 1] AS bigram
              FROM (SELECT source, t, unnest(range(1, len(t))) AS i
                    FROM toks WHERE len(t) >= 2)),
            bc AS (SELECT bigram, count(*)::BIGINT AS c
                   FROM big GROUP BY 1),
            ctx AS (SELECT string_split(bigram, ' ')[1] AS w1,
                           sum(c) AS c_ctx, count(*) AS n1p_ctx
                    FROM bc GROUP BY 1),
            cont AS (SELECT string_split(bigram, ' ')[2] AS w2,
                            count(*) AS n1p_cont
                     FROM bc GROUP BY 1),
            tot AS (SELECT count(*)::DOUBLE AS n1p_total FROM bc),
            lm AS (
              SELECT bigram,
                     round(greatest(c - 0.75, 0) / c_ctx
                           + (0.75 / c_ctx) * n1p_ctx
                             * (n1p_cont
                                / (SELECT n1p_total FROM tot)),
                           6) AS p_kn
              FROM bc
              JOIN ctx ON string_split(bigram, ' ')[1] = ctx.w1
              JOIN cont ON string_split(bigram, ' ')[2] = cont.w2),
            j AS (
              SELECT big.source AS "group", lm.p_kn
              FROM big JOIN lm USING (bigram)
              WHERE big.source IS NOT NULL)
            SELECT "group", count(*)::BIGINT AS n_bigrams,
                   round(-avg(log2(p_kn)), 6) AS bits,
                   round(pow(2, -avg(log2(p_kn))), 6) AS ppl
            FROM j GROUP BY 1 ORDER BY "group"
        """,
        # twin of q_textrank_keywords — same edges, same unrolled
        # pagerank rounds (generator shared shape with host_pagerank)
        "textrank_keywords": _textrank_sql(iters=4),
        # twin of q_theil_sen_volume — same pairwise-slope and
        # residual medians over the same daily aggregation
        "theil_sen_volume": """
            WITH daily AS (
              SELECT (CAST(ts AS DATE) - DATE '1970-01-01')::DOUBLE
                       AS t,
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1),
            p AS (SELECT (j.x - i.x) / (j.t - i.t) AS m
                  FROM daily i JOIN daily j ON j.t > i.t),
            a AS (SELECT median(m) AS slope,
                         count(*)::BIGINT AS n_pairs FROM p),
            r AS (SELECT median(x - (SELECT slope FROM a) * t)
                    AS intercept FROM daily)
            SELECT (SELECT count(*) FROM daily)::BIGINT AS n_points,
                   (SELECT n_pairs FROM a) AS n_pairs,
                   round((SELECT slope FROM a), 6) AS slope,
                   round((SELECT intercept FROM r), 6) AS intercept
        """,
        # twin of q_mann_kendall_volume — same S, tie term and
        # continuity-corrected z
        "mann_kendall_volume": """
            WITH daily AS (
              SELECT (CAST(ts AS DATE) - DATE '1970-01-01')::DOUBLE
                       AS t,
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1),
            p AS (SELECT sum(CASE WHEN j.x > i.x THEN 1
                                  WHEN j.x < i.x THEN -1
                                  ELSE 0 END)::BIGINT AS s
                  FROM daily i JOIN daily j ON j.t > i.t),
            tie AS (SELECT coalesce(sum(tc * (tc - 1)
                                        * (2 * tc + 5)), 0)::DOUBLE
                      AS tie_term
                    FROM (SELECT count(*) AS tc FROM daily
                          GROUP BY x)
                    WHERE tc > 1),
            nn AS (SELECT count(*)::DOUBLE AS n FROM daily),
            st AS (
              SELECT n, (SELECT s FROM p) AS s,
                     (n * (n - 1) * (2 * n + 5)
                      - (SELECT tie_term FROM tie)) / 18.0 AS var_s
              FROM nn),
            zz AS (
              SELECT *,
                     CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                          WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                          ELSE 0.0 END AS z_raw
              FROM st)
            SELECT n::BIGINT AS n, s, round(var_s, 6) AS var_s,
                   round(z_raw, 6) AS z,
                   abs(z_raw) > 1.959964 AS trend_05
            FROM zz
        """,
        # twin of q_user_day_cover — the same 3 greedy rounds
        # unrolled; zero-gain rounds filtered = the early stop
        "user_day_cover": """
            WITH du AS (
              SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR)
                       AS g, user_id AS w
              FROM events
              WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            g1 AS (SELECT g, count(DISTINCT w) AS gain
                   FROM du GROUP BY 1),
            p1 AS (SELECT g, gain FROM g1
                   ORDER BY gain DESC, g LIMIT 1),
            c1 AS (SELECT DISTINCT w FROM du
                   WHERE g = (SELECT g FROM p1)),
            g2 AS (SELECT g, count(DISTINCT w) AS gain FROM du
                   WHERE w NOT IN (SELECT w FROM c1) GROUP BY 1),
            p2 AS (SELECT g, gain FROM g2
                   ORDER BY gain DESC, g LIMIT 1),
            c2 AS (SELECT w FROM c1
                   UNION SELECT w FROM du
                   WHERE g = (SELECT g FROM p2)),
            g3 AS (SELECT g, count(DISTINCT w) AS gain FROM du
                   WHERE w NOT IN (SELECT w FROM c2) GROUP BY 1),
            p3 AS (SELECT g, gain FROM g3
                   ORDER BY gain DESC, g LIMIT 1)
            SELECT * FROM (
              SELECT 1 AS round, (SELECT g FROM p1) AS "group",
                     (SELECT gain FROM p1)::BIGINT AS gain,
                     (SELECT count(*) FROM c1)::BIGINT
                       AS covered_total
              UNION ALL
              SELECT 2, (SELECT g FROM p2),
                     (SELECT gain FROM p2)::BIGINT,
                     (SELECT count(*) FROM c2)::BIGINT
              UNION ALL
              SELECT 3, (SELECT g FROM p3),
                     (SELECT gain FROM p3)::BIGINT,
                     ((SELECT count(*) FROM c2)
                      + (SELECT coalesce(gain, 0) FROM p3))::BIGINT)
            WHERE gain > 0 ORDER BY round
        """,
        # twin of q_ts_sanity — same injected anomalies (same
        # when-chain precedence), same five fused counters
        "ts_sanity": """
            WITH inj AS (
              SELECT CASE
                       WHEN event_id % 97 = 0
                         THEN TIMESTAMP '1970-01-01 00:00:00'
                       WHEN event_id % 89 = 0
                         THEN ts + INTERVAL 400 DAY
                       WHEN event_id % 13 = 0
                         THEN date_trunc('day', ts)
                       ELSE ts END AS ts2
              FROM events)
            SELECT count(*)::BIGINT AS n,
                   sum(CASE WHEN ts2 IS NULL THEN 1 ELSE 0 END)
                     ::BIGINT AS n_null,
                   sum(CASE WHEN ts2 = TIMESTAMP
                            '1970-01-01 00:00:00'
                       THEN 1 ELSE 0 END)::BIGINT AS n_epoch_zero,
                   sum(CASE WHEN ts2 > TIMESTAMP
                            '2024-06-01 00:00:00'
                       THEN 1 ELSE 0 END)::BIGINT AS n_future,
                   sum(CASE WHEN ts2 IS NOT NULL
                            AND extract(hour FROM ts2) = 0
                            AND extract(minute FROM ts2) = 0
                            AND extract(second FROM ts2) = 0
                       THEN 1 ELSE 0 END)::BIGINT AS n_midnight,
                   round(sum(CASE WHEN ts2 IS NOT NULL
                                  AND isodow(ts2) IN (6, 7)
                             THEN 1 ELSE 0 END) * 1.0
                         / sum(CASE WHEN ts2 IS NOT NULL
                               THEN 1 ELSE 0 END), 6)
                     AS weekend_share
            FROM inj
        """,
        # twin of q_binseg_volume — same prefix-sum SSE table,
        # argmin over the same rounded sse_split
        "binseg_volume": """
            WITH daily AS (
              SELECT CAST(ts AS DATE) AS t,
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1),
            pre AS (
              SELECT t,
                     row_number() OVER (ORDER BY t) AS i,
                     sum(x) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS s1,
                     sum(x * x) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS s2,
                     count(*) OVER ()::DOUBLE AS n,
                     sum(x) OVER () AS t1,
                     sum(x * x) OVER () AS t2
              FROM daily),
            scored AS (
              SELECT t AS split_order, i::BIGINT AS n_left,
                     (n - i)::BIGINT AS n_right,
                     s1 / i AS ml,
                     (t1 - s1) / (n - i) AS mr,
                     round(t2 - t1 * t1 / n, 6) AS sse_tot,
                     round((s2 - s1 * s1 / i)
                           + ((t2 - s2)
                              - (t1 - s1) * (t1 - s1) / (n - i)),
                           6) AS sse_split
              FROM pre WHERE i < n)
            SELECT split_order, n_left, n_right,
                   round(ml, 6) AS mean_left,
                   round(mr, 6) AS mean_right,
                   sse_tot AS sse_total, sse_split,
                   round(sse_tot - sse_split, 6) AS gain
            FROM scored
            ORDER BY sse_split, split_order LIMIT 1
        """,
        # twin of q_weekly_seasonality — same ISO-dow means, same
        # median/MAD residual gate
        "weekly_seasonality": """
            WITH daily AS (
              SELECT CAST(ts AS DATE) AS day, count(*)::DOUBLE AS x
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            b AS (
              SELECT day, isodow(day) AS dow, x,
                     avg(x) OVER (PARTITION BY isodow(day))
                       AS dow_mean
              FROM daily),
            r AS (SELECT day, dow, x, dow_mean,
                         x - dow_mean AS res FROM b),
            mm AS (SELECT median(res) AS med_r FROM r),
            dd AS (SELECT median(abs(res - (SELECT med_r FROM mm)))
                     AS mad FROM r)
            SELECT day, dow, x::BIGINT AS volume,
                   round(dow_mean, 6) AS dow_mean,
                   round(res, 6) AS residual,
                   CASE WHEN (SELECT mad FROM dd) > 0
                        THEN abs(res - (SELECT med_r FROM mm))
                             > 3 * 1.4826 * (SELECT mad FROM dd)
                        ELSE abs(res - (SELECT med_r FROM mm)) > 0
                   END AS flagged
            FROM r ORDER BY day
        """,
        # twin of q_bin_advisor — same moments, same exact
        # interpolated quantiles, same three rules
        "bin_advisor": """
            WITH s AS (
              SELECT n_chars::DOUBLE AS v FROM documents
              WHERE n_chars IS NOT NULL),
            a AS (
              SELECT count(*)::DOUBLE AS n, min(v) AS vmin,
                     max(v) AS vmax,
                     quantile_cont(v, 0.75)
                       - quantile_cont(v, 0.25) AS iqr,
                     stddev_pop(v) AS sigma
              FROM s),
            w AS (
              SELECT *, 2 * iqr / pow(n, 1.0 / 3) AS fd_w,
                     3.49 * sigma / pow(n, 1.0 / 3) AS sc_w
              FROM a)
            SELECT n::BIGINT AS n, round(vmin, 6) AS vmin,
                   round(vmax, 6) AS vmax, round(iqr, 6) AS iqr,
                   round(sigma, 6) AS sigma,
                   round(fd_w, 6) AS fd_width,
                   round(sc_w, 6) AS scott_width,
                   (CASE WHEN fd_w > 0
                         THEN ceil((vmax - vmin) / fd_w) END)
                     ::BIGINT AS fd_bins,
                   (CASE WHEN sc_w > 0
                         THEN ceil((vmax - vmin) / sc_w) END)
                     ::BIGINT AS scott_bins,
                   (ceil(log2(n)) + 1)::BIGINT AS sturges_bins
            FROM w
        """,
        # twin of q_multibyte_audit — same injected non-ASCII
        # suffix, chars via length(), bytes via strlen()
        "multibyte_audit": """
            WITH inj AS (
              SELECT lang,
                     CASE WHEN doc_id % 5 = 0
                          THEN text || ' café naïve 中文'
                          ELSE text END AS t
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL)
            SELECT lang AS "group", count(*)::BIGINT AS n_docs,
                   sum(length(t))::BIGINT AS total_chars,
                   sum(strlen(t))::BIGINT AS total_bytes,
                   round(sum(strlen(t)) * 1.0 / sum(length(t)), 6)
                     AS bytes_per_char,
                   round(sum(CASE WHEN length(t) = strlen(t)
                             THEN 1 ELSE 0 END) * 1.0 / count(*),
                         6) AS ascii_doc_share
            FROM inj GROUP BY 1 ORDER BY "group"
        """,
        # twin of q_cvm_len_drift — same pooled-multiplicity
        # integrated squared CDF gap
        "cvm_len_drift": """
            WITH h AS (
              SELECT n_chars AS v,
                     sum(CASE WHEN doc_id % 2 = 0
                              THEN 1 ELSE 0 END) AS ca,
                     sum(CASE WHEN doc_id % 2 = 0
                              THEN 0 ELSE 1 END) AS cb
              FROM documents WHERE n_chars IS NOT NULL
              GROUP BY n_chars),
            c AS (
              SELECT sum(ca) OVER (ORDER BY v) * 1.0
                       / sum(ca) OVER () AS fa,
                     sum(cb) OVER (ORDER BY v) * 1.0
                       / sum(cb) OVER () AS fb,
                     ca + cb AS m_tot,
                     sum(ca) OVER ()::DOUBLE AS na,
                     sum(cb) OVER ()::DOUBLE AS nb
              FROM h)
            SELECT round(any_value(na) * any_value(nb)
                         / pow(any_value(na) + any_value(nb), 2)
                         * sum((fa - fb) * (fa - fb) * m_tot), 6)
                     AS t,
                   any_value(na)::BIGINT AS n_a,
                   any_value(nb)::BIGINT AS n_b
            FROM c
        """,
        # twin of q_anova_len_sources — same sufficient statistics,
        # same SSB/SSW decomposition
        "anova_len_sources": """
            WITH g AS (
              SELECT source, count(*)::DOUBLE AS ni,
                     sum(n_chars::DOUBLE) AS si,
                     sum(n_chars::DOUBLE * n_chars) AS qi
              FROM documents
              WHERE n_chars IS NOT NULL AND source IS NOT NULL
              GROUP BY source),
            a AS (
              SELECT count(*)::DOUBLE AS k, sum(ni) AS n,
                     sum(si) AS s, sum(qi) AS q,
                     sum(si * si / ni) AS sg
              FROM g),
            t AS (
              SELECT k, n, sg - s * s / n AS ssb, q - sg AS ssw
              FROM a)
            SELECT k::BIGINT AS k, n::BIGINT AS n,
                   round(ssb, 6) AS ssb, round(ssw, 6) AS ssw,
                   (k - 1)::BIGINT AS df1, (n - k)::BIGINT AS df2,
                   round(CASE WHEN k > 1 AND n > k AND ssw > 0
                              THEN (ssb / (k - 1))
                                   / (ssw / (n - k)) END, 6) AS f
            FROM t
        """,
        # twin of q_tukey_hsd_langs — same per-group sufficient
        # statistics, pooled MSW and Tukey-Kramer standard error
        "tukey_hsd_langs": """
            WITH g AS (
              SELECT lang AS g, count(*)::DOUBLE AS ni,
                     avg(n_chars::DOUBLE) AS mi,
                     sum(n_chars::DOUBLE * n_chars) AS qi,
                     sum(n_chars::DOUBLE) AS si
              FROM documents
              WHERE n_chars IS NOT NULL AND lang IS NOT NULL
              GROUP BY 1),
            m AS (SELECT (sum(qi) - sum(si * si / ni))
                           / (sum(ni) - count(*)) AS msw
                  FROM g)
            SELECT a.g AS group_a, b.g AS group_b,
                   round(a.mi, 6) AS mean_a,
                   round(b.mi, 6) AS mean_b,
                   round(abs(a.mi - b.mi)
                         / sqrt((SELECT msw FROM m) / 2
                                * (1 / a.ni + 1 / b.ni)), 6) AS q
            FROM g a JOIN g b ON a.g < b.g
            ORDER BY group_a, group_b
        """,
        # twin of q_levene_len_langs — same median centers, same
        # ANOVA decomposition on |x - median|
        "levene_len_langs": """
            WITH base AS (
              SELECT lang AS g, n_chars::DOUBLE AS x
              FROM documents
              WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
            med AS (SELECT g, median(x) AS med FROM base GROUP BY 1),
            z AS (SELECT base.g, abs(x - med) AS z
                  FROM base JOIN med ON base.g = med.g),
            gg AS (SELECT g, count(*)::DOUBLE AS ni, sum(z) AS si,
                          sum(z * z) AS qi
                   FROM z GROUP BY 1),
            a AS (SELECT count(*)::DOUBLE AS k, sum(ni) AS n,
                         sum(si) AS s, sum(qi) AS q,
                         sum(si * si / ni) AS sg
                  FROM gg),
            t AS (SELECT k, n, sg - s * s / n AS ssb, q - sg AS ssw
                  FROM a)
            SELECT k::BIGINT AS k, n::BIGINT AS n,
                   round(ssb, 6) AS ssb, round(ssw, 6) AS ssw,
                   (k - 1)::BIGINT AS df1, (n - k)::BIGINT AS df2,
                   round(CASE WHEN k > 1 AND n > k AND ssw > 0
                              THEN (ssb / (k - 1))
                                   / (ssw / (n - k)) END, 6) AS f
            FROM t
        """,
        # twin of q_power_advisor — same closed form, same z
        # literals
        "power_advisor": """
            WITH a AS (
              SELECT count(*)::BIGINT AS n,
                     avg(CASE WHEN coalesce(n_chars >= 128, FALSE)
                         THEN 1.0 ELSE 0.0 END) AS p1
              FROM documents),
            w AS (SELECT n, p1,
                         least(1.0, greatest(0.0, p1 + 0.01)) AS p2
                  FROM a)
            SELECT n, round(p1, 6) AS p1, round(p2, 6) AS p2,
                   0.01::DOUBLE AS mde,
                   ceil(pow(1.959964
                            * sqrt(2 * ((p1 + p2) / 2)
                                   * (1 - (p1 + p2) / 2))
                            + 0.841621
                              * sqrt(p1 * (1 - p1)
                                     + p2 * (1 - p2)), 2)
                        / pow(0.01, 2))::BIGINT AS n_per_group
            FROM w
        """,
        # twin of q_lang_id_prf — same marker scoring as the
        # text_lang_id twin, then the same per-class TP/FP/FN sums
        "lang_id_prf": """
            WITH scores AS (
              SELECT lang,
                len(regexp_extract_all(text,
                  '(?i)\\b(the|and|of|to|in)\\b'))::BIGINT AS s_en,
                len(regexp_extract_all(text,
                  '(?i)\\b(der|die|und|das|nicht)\\b'))::BIGINT
                  AS s_de,
                len(regexp_extract_all(text,
                  '(?i)\\b(le|la|et|les|des)\\b'))::BIGINT AS s_fr,
                len(regexp_extract_all(text,
                  '(?i)\\b(el|los|que|por|una)\\b'))::BIGINT AS s_es
              FROM documents WHERE text IS NOT NULL),
            cm AS (
              SELECT lang AS lbl,
                     CASE
                       WHEN s_en > 0 AND s_en
                            > greatest(s_de, s_fr, s_es) THEN 'en'
                       WHEN s_de > 0 AND s_de
                            > greatest(s_en, s_fr, s_es) THEN 'de'
                       WHEN s_fr > 0 AND s_fr
                            > greatest(s_en, s_de, s_es) THEN 'fr'
                       WHEN s_es > 0 AND s_es
                            > greatest(s_en, s_de, s_fr) THEN 'es'
                       ELSE 'und'
                     END AS prd,
                     count(*)::BIGINT AS c
              FROM scores WHERE lang IS NOT NULL GROUP BY 1, 2),
            classes AS (SELECT lbl AS cls FROM cm
                        UNION SELECT prd FROM cm),
            tp AS (SELECT lbl AS cls, sum(c) AS tp FROM cm
                   WHERE lbl = prd GROUP BY 1),
            fp AS (SELECT prd AS cls, sum(c) AS fp FROM cm
                   WHERE lbl <> prd GROUP BY 1),
            fn AS (SELECT lbl AS cls, sum(c) AS fn FROM cm
                   WHERE lbl <> prd GROUP BY 1),
            j AS (
              SELECT cls, coalesce(tp, 0)::BIGINT AS tp,
                     coalesce(fp, 0)::BIGINT AS fp,
                     coalesce(fn, 0)::BIGINT AS fn
              FROM classes LEFT JOIN tp USING (cls)
              LEFT JOIN fp USING (cls) LEFT JOIN fn USING (cls))
            SELECT cls AS class, tp, fp, fn,
                   round(CASE WHEN tp + fp > 0
                         THEN tp * 1.0 / (tp + fp) END, 6)
                     AS precision,
                   round(CASE WHEN tp + fn > 0
                         THEN tp * 1.0 / (tp + fn) END, 6)
                     AS recall,
                   round(CASE WHEN 2 * tp + fp + fn > 0
                         THEN 2.0 * tp / (2 * tp + fp + fn) END, 6)
                     AS f1
            FROM j ORDER BY class
        """,
        # twin of q_volume_xcorr — generated lead/lag branches
        "volume_xcorr": _xcorr_sql(max_lag=3),
        # twin of q_simpsons_check — same sufficient statistics,
        # same slope guards and sign test
        "simpsons_check": """
            WITH base AS (
              SELECT lang AS g, n_chars::DOUBLE AS x,
                     len(string_split(text, ' '))::DOUBLE AS y
              FROM documents
              WHERE n_chars IS NOT NULL AND text IS NOT NULL
                AND lang IS NOT NULL),
            g AS (SELECT g, count(*)::DOUBLE AS n, sum(x) AS sx,
                         sum(y) AS sy, sum(x * y) AS sxy,
                         sum(x * x) AS sxx
                  FROM base GROUP BY 1),
            t AS (SELECT sum(n) AS tn, sum(sx) AS tx,
                         sum(sy) AS ty, sum(sxy) AS txy,
                         sum(sxx) AS txx
                  FROM g)
            SELECT g AS "group", n::BIGINT AS n,
                   round(CASE WHEN n * sxx - sx * sx > 0
                         THEN (n * sxy - sx * sy)
                              / (n * sxx - sx * sx) END, 6)
                     AS slope,
                   round(CASE WHEN tn * txx - tx * tx > 0
                         THEN (tn * txy - tx * ty)
                              / (tn * txx - tx * tx) END, 6)
                     AS pooled_slope,
                   (CASE WHEN n * sxx - sx * sx > 0
                              AND tn * txx - tx * tx > 0
                         THEN sign((n * sxy - sx * sy)
                                   / (n * sxx - sx * sx))
                              * sign((tn * txy - tx * ty)
                                     / (tn * txx - tx * tx)) < 0
                         ELSE FALSE END) AS reversed
            FROM g, t ORDER BY "group"
        """,
        # twin of q_durbin_watson_volume — same sufficient-stats
        # fit, same residual-difference ratio
        "durbin_watson_volume": """
            WITH daily AS (
              SELECT (CAST(ts AS DATE) - DATE '1970-01-01')::DOUBLE
                       AS t,
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1),
            f AS (SELECT count(*)::DOUBLE AS n, sum(t) AS st,
                         sum(x) AS sx, sum(t * x) AS stx,
                         sum(t * t) AS stt
                  FROM daily),
            c AS (SELECT n,
                         (n * stx - st * sx)
                           / (n * stt - st * st) AS b,
                         (sx - (n * stx - st * sx)
                               / (n * stt - st * st) * st) / n AS a
                  FROM f),
            r AS (SELECT t, x - (SELECT a FROM c)
                            - (SELECT b FROM c) * t AS e
                  FROM daily),
            d AS (SELECT e, e - lag(e) OVER (ORDER BY t) AS d
                  FROM r)
            SELECT (SELECT n FROM c)::BIGINT AS n,
                   round((SELECT b FROM c), 6) AS slope,
                   round((SELECT a FROM c), 6) AS intercept,
                   round(sum(d * d) / sum(e * e), 6) AS dw
            FROM d
        """,
        # twin of q_weekly_spectrum — same cos/sin projections of
        # the mean-centered series
        "weekly_spectrum": """
            WITH daily AS (
              SELECT (CAST(ts AS DATE) - DATE '1970-01-01')::DOUBLE
                       AS t,
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1),
            m AS (SELECT avg(x) AS mu FROM daily),
            agg AS (
              SELECT count(*)::DOUBLE AS n,
                     sum((x - (SELECT mu FROM m))
                         * cos(2 * pi() / 7.0 * t)) AS a,
                     sum((x - (SELECT mu FROM m))
                         * sin(2 * pi() / 7.0 * t)) AS b,
                     sum(pow(x - (SELECT mu FROM m), 2)) AS ss
              FROM daily)
            SELECT n::BIGINT AS n, 7.0::DOUBLE AS period,
                   round(a, 6) AS a, round(b, 6) AS b,
                   round((a * a + b * b) * 2 / n, 6) AS power,
                   round(CASE WHEN ss > 0
                         THEN (a * a + b * b) * 2 / n / ss END, 6)
                     AS var_share
            FROM agg
        """,
        # twin of q_cooks_volume — same fit, leverage, s² and D
        "cooks_volume": """
            WITH daily AS (
              SELECT (CAST(ts AS DATE) - DATE '1970-01-01') AS ord,
                     (CAST(ts AS DATE) - DATE '1970-01-01')::DOUBLE
                       AS t,
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1, 2),
            f AS (SELECT count(*)::DOUBLE AS n, sum(t) AS st,
                         sum(x) AS sx, sum(t * x) AS stx,
                         sum(t * t) AS stt
                  FROM daily),
            c AS (SELECT n,
                         (n * stx - st * sx)
                           / (n * stt - st * st) AS b,
                         (sx - (n * stx - st * sx)
                               / (n * stt - st * st) * st) / n
                           AS a,
                         st / n AS tbar,
                         stt - st * st / n AS s_tt
                  FROM f),
            base AS (
              SELECT ord, x,
                     x - c.a - c.b * t AS e,
                     1 / c.n + pow(t - c.tbar, 2) / c.s_tt AS h
              FROM daily, c),
            s2 AS (SELECT sum(e * e) / ((SELECT n FROM c) - 2)
                     AS v FROM base)
            SELECT ord AS "order", round(x, 6) AS x,
                   round(e, 6) AS residual,
                   round(h, 6) AS leverage,
                   round(CASE WHEN (SELECT v FROM s2) > 0
                         THEN e * e * h / (2 * (SELECT v FROM s2)
                              * pow(1 - h, 2)) ELSE 0.0 END, 6)
                     AS cooks_d,
                   (CASE WHEN (SELECT v FROM s2) > 0
                    THEN e * e * h / (2 * (SELECT v FROM s2)
                         * pow(1 - h, 2)) ELSE 0.0 END)
                     > 4 / (SELECT n FROM c) AS influential
            FROM base ORDER BY "order"
        """,
        # twin of q_negbin_user_events — same sample moments and
        # method-of-moments shape
        "negbin_user_events": """
            WITH uc AS (SELECT user_id, count(*)::DOUBLE AS c
                        FROM events GROUP BY 1),
            a AS (SELECT count(*)::DOUBLE AS n, avg(c) AS m,
                         var_samp(c) AS v
                  FROM uc)
            SELECT n::BIGINT AS n, round(m, 6) AS mean,
                   round(v, 6) AS var,
                   round(CASE WHEN m > 0 THEN v / m END, 6)
                     AS dispersion_ratio,
                   round(CASE WHEN v > m
                         THEN m * m / (v - m) END, 6) AS nb_r,
                   round(CASE WHEN v > m THEN m / v END, 6) AS nb_p
            FROM a
        """,
        # twin of q_cuped_users — same per-user pre/post windows,
        # same sample covariance identities
        "cuped_users": """
            WITH up AS (
              SELECT user_id,
                     sum(CASE WHEN extract(day FROM ts) <= 15
                         THEN 1 ELSE 0 END)::DOUBLE AS a,
                     sum(CASE WHEN extract(day FROM ts) > 15
                         THEN 1 ELSE 0 END)::DOUBLE AS b
              FROM events GROUP BY 1),
            g AS (SELECT count(*)::DOUBLE AS n,
                         covar_samp(a, b) AS cab,
                         var_samp(a) AS va, var_samp(b) AS vb
                  FROM up)
            SELECT n::BIGINT AS n,
                   round(CASE WHEN va > 0 THEN cab / va END, 6)
                     AS theta,
                   round(CASE WHEN va > 0 AND vb > 0
                         THEN cab / sqrt(va * vb) END, 6) AS rho,
                   round(vb, 6) AS var_post,
                   round(CASE WHEN va > 0 AND vb > 0
                         THEN vb * (1 - pow(cab / sqrt(va * vb), 2))
                         END, 6) AS var_adjusted,
                   round(CASE WHEN va > 0 AND vb > 0
                         THEN 1 - pow(cab / sqrt(va * vb), 2) END,
                         6) AS var_ratio
            FROM g
        """,
        # twin of q_pareto_sources — same rounded metrics, same
        # dominance EXISTS
        "pareto_sources": f"""
            WITH base AS (
              SELECT source, n_chars, md5({_NORM_SQL}) AS fp, text
              FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL),
            g1 AS (SELECT source,
                          round(avg(n_chars), 6) AS mean_chars,
                          round(1 - count(DISTINCT fp) * 1.0
                                    / count(*), 6) AS dup_rate
                   FROM base GROUP BY 1),
            tok AS (
              SELECT source,
                     unnest(string_split({_NORM_SQL}, ' ')) AS w
              FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL),
            g2 AS (SELECT source,
                          round(count(DISTINCT w) * 1.0 / count(*),
                                6) AS vocab_rate
                   FROM (SELECT source, w FROM tok WHERE w <> '')
                   GROUP BY 1),
            m AS (SELECT g1.source, mean_chars, dup_rate, vocab_rate
                  FROM g1 JOIN g2 USING (source))
            SELECT m.source, m.mean_chars, m.dup_rate, m.vocab_rate,
                   NOT EXISTS (
                     SELECT 1 FROM m b
                     WHERE b.source <> m.source
                       AND b.vocab_rate >= m.vocab_rate
                       AND b.mean_chars >= m.mean_chars
                       AND b.dup_rate <= m.dup_rate
                       AND (b.vocab_rate > m.vocab_rate
                            OR b.mean_chars > m.mean_chars
                            OR b.dup_rate < m.dup_rate))
                     AS on_front
            FROM m ORDER BY m.source
        """,
        # twin of q_renyi_langs — same token counts, same three
        # spectrum orders
        "renyi_langs": f"""
            WITH words AS (
              SELECT lang AS "group",
                     unnest(string_split({_NORM_SQL}, ' ')) AS w
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL),
            gw AS (SELECT "group", w, count(*)::BIGINT AS c
                   FROM words WHERE w <> '' GROUP BY 1, 2),
            tot AS (SELECT "group", sum(c) AS n FROM gw GROUP BY 1)
            SELECT gw."group",
                   any_value(n)::BIGINT AS n_tokens,
                   round(log2(count(*)), 6) AS h0,
                   round(-sum((c * 1.0 / n)
                              * log2(c * 1.0 / n)), 6) AS h1,
                   round(-log2(sum(pow(c * 1.0 / n, 2))), 6) AS h2
            FROM gw JOIN tot USING ("group")
            GROUP BY 1 ORDER BY 1
        """,
        # twin of q_jackknife_sources — same leave-one-out means
        # from totals
        "jackknife_sources": """
            WITH g AS (
              SELECT source, count(*)::DOUBLE AS ni,
                     sum(n_chars::DOUBLE) AS si,
                     sum(n_chars::DOUBLE * n_chars) AS qi
              FROM documents
              WHERE n_chars IS NOT NULL AND source IS NOT NULL
              GROUP BY 1),
            tt AS (SELECT count(*)::DOUBLE AS gn, sum(ni) AS n,
                          sum(si) AS s, sum(qi) AS q
                   FROM g),
            loo AS (SELECT (s - si) / (n - ni) AS theta FROM g, tt),
            a AS (SELECT avg(theta) AS tbar,
                         sum(theta * theta) AS t2
                  FROM loo),
            fin AS (SELECT tt.gn, tt.n, tt.s, tt.q, a.tbar, a.t2
                    FROM tt, a)
            SELECT gn::BIGINT AS g, n::BIGINT AS n,
                   round(s / n, 6) AS mean,
                   round(sqrt((q - s * s / n) / (n - 1) / n), 6)
                     AS se_naive,
                   round(sqrt((gn - 1) / gn
                              * (t2 - gn * tbar * tbar)), 6)
                     AS se_jackknife,
                   round(CASE WHEN sqrt((q - s * s / n)
                                        / (n - 1) / n) > 0
                         THEN sqrt((gn - 1) / gn
                                   * (t2 - gn * tbar * tbar))
                              / sqrt((q - s * s / n)
                                     / (n - 1) / n) END, 6)
                     AS design_ratio
            FROM fin
        """,
        # twin of q_markov_entropy — same (ts, event_id)-ordered
        # streams, same conditional/marginal entropies
        "markov_entropy": """
            WITH tr AS (
              SELECT event_type AS cur,
                     lead(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
              FROM events
              WHERE event_type IS NOT NULL
                AND user_id IS NOT NULL),
            t2 AS (SELECT cur, nxt FROM tr WHERE nxt IS NOT NULL),
            cnt AS (SELECT cur, nxt, count(*)::DOUBLE AS c
                    FROM t2 GROUP BY 1, 2),
            rw AS (SELECT cur, sum(c) AS rc FROM cnt GROUP BY 1),
            tt AS (SELECT sum(c) AS n FROM cnt),
            hr AS (SELECT -sum((c / (SELECT n FROM tt))
                               * log2(c / rc)) AS h_rate
                   FROM cnt JOIN rw USING (cur)),
            mg AS (SELECT nxt, count(*)::DOUBLE AS mc
                   FROM t2 GROUP BY 1),
            hm AS (SELECT count(*)::BIGINT AS ns,
                          -sum((mc / (SELECT n FROM tt))
                               * log2(mc / (SELECT n FROM tt)))
                            AS h_m
                   FROM mg)
            SELECT (SELECT n FROM tt)::BIGINT AS n_transitions,
                   (SELECT ns FROM hm) AS n_states,
                   round((SELECT h_rate FROM hr), 6) AS h_rate,
                   round((SELECT h_m FROM hm), 6) AS h_marginal,
                   round(CASE WHEN (SELECT h_m FROM hm) > 0
                         THEN 1 - (SELECT h_rate FROM hr)
                              / (SELECT h_m FROM hm) END, 6)
                     AS predictability
        """,
        # twin of q_chao_shen_langs — same coverage shrinkage and
        # detection weights
        "chao_shen_langs": f"""
            WITH words AS (
              SELECT lang AS "group",
                     unnest(string_split({_NORM_SQL}, ' ')) AS w
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL),
            gw AS (SELECT "group", w, count(*)::BIGINT AS c
                   FROM words WHERE w <> '' GROUP BY 1, 2),
            tot AS (SELECT "group", sum(c) AS n,
                           count(*) AS types,
                           sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                             AS f1
                    FROM gw GROUP BY 1)
            SELECT gw."group",
                   any_value(n)::BIGINT AS n_tokens,
                   any_value(types)::BIGINT AS n_types,
                   any_value(f1)::BIGINT AS f1,
                   round(any_value(1 - f1 * 1.0 / n), 6)
                     AS coverage,
                   round(-sum((c * 1.0 / n)
                              * log2(c * 1.0 / n)), 6) AS h_mle,
                   round(-sum(CASE WHEN (1 - f1 * 1.0 / n)
                                        * c / n > 0
                              THEN ((1 - f1 * 1.0 / n) * c / n)
                                   * log2((1 - f1 * 1.0 / n)
                                          * c / n)
                                   / (1 - pow(1 - (1 - f1 * 1.0 / n)
                                              * c / n, n))
                              ELSE 0.0 END), 6) AS h_cs
            FROM gw JOIN tot USING ("group")
            GROUP BY 1 ORDER BY 1
        """,
        # twin of q_rolling_reach_users — same bounded range join
        "rolling_reach_users": """
            WITH du AS (
              SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u
              FROM events
              WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            dau AS (SELECT d AS day, count(DISTINCT u) AS dau
                    FROM du GROUP BY 1),
            days AS (SELECT DISTINCT d AS day FROM du),
            wau AS (
              SELECT days.day, count(DISTINCT du.u) AS wau
              FROM days JOIN du
                ON du.d <= days.day
               AND du.d >= days.day - INTERVAL 6 DAY
              GROUP BY 1)
            SELECT day, dau::BIGINT AS dau, wau::BIGINT AS wau,
                   round(dau * 1.0 / wau, 6) AS stickiness
            FROM dau JOIN wau USING (day) ORDER BY day
        """,
        # twin of q_daily_new_returning — same first-seen split
        "daily_new_returning": """
            WITH du AS (
              SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
              FROM events
              WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            fs AS (SELECT u, min(day) AS first_day
                   FROM du GROUP BY 1)
            SELECT day,
                   count(DISTINCT u)::BIGINT AS n_active,
                   count(DISTINCT CASE WHEN day = first_day
                         THEN u END)::BIGINT AS n_new,
                   count(DISTINCT CASE WHEN day <> first_day
                         THEN u END)::BIGINT AS n_returning,
                   round(count(DISTINCT CASE WHEN day = first_day
                               THEN u END) * 1.0
                         / count(DISTINCT u), 6) AS new_share
            FROM du JOIN fs USING (u)
            GROUP BY day ORDER BY day
        """,
        # twin of q_ljung_box_volume — generated per-lag branches
        "ljung_box_volume": _ljung_box_sql(max_lag=7),
        # twin of q_capture_recapture — same membership flags,
        # Chapman estimator and SE
        "capture_recapture": """
            WITH base AS (
              SELECT doc_id,
                     max(CASE WHEN doc_id % 3 = 0
                         THEN 1 ELSE 0 END) AS a,
                     max(CASE WHEN doc_id % 5 IN (0, 1)
                         THEN 1 ELSE 0 END) AS b
              FROM documents WHERE doc_id IS NOT NULL GROUP BY 1),
            g AS (
              SELECT sum(CASE WHEN a = 1 OR b = 1
                         THEN 1 ELSE 0 END)::DOUBLE AS u,
                     sum(a)::DOUBLE AS n1, sum(b)::DOUBLE AS n2,
                     sum(CASE WHEN a = 1 AND b = 1
                         THEN 1 ELSE 0 END)::DOUBLE AS m
              FROM base)
            SELECT u::BIGINT AS n_universe, n1::BIGINT AS n_a,
                   n2::BIGINT AS n_b, m::BIGINT AS n_both,
                   round((n1 + 1) * (n2 + 1) / (m + 1) - 1, 6)
                     AS n_hat,
                   round(sqrt((n1 + 1) * (n2 + 1) * (n1 - m)
                              * (n2 - m)
                              / (pow(m + 1, 2) * (m + 2))), 6)
                     AS se
            FROM g
        """,
        # twin of q_shift_share_volume — same period split, same
        # growth/mix decomposition
        "shift_share_volume": """
            WITH g AS (
              SELECT event_type AS segment,
                     sum(CASE WHEN NOT (extract(day FROM ts) > 15)
                         THEN value ELSE 0 END) AS v0,
                     sum(CASE WHEN extract(day FROM ts) > 15
                         THEN value ELSE 0 END) AS v1
              FROM events WHERE event_type IS NOT NULL GROUP BY 1),
            t AS (SELECT sum(v0) AS t0, sum(v1) AS t1 FROM g)
            SELECT segment, round(v0, 6) AS v0, round(v1, 6) AS v1,
                   round(v1 - v0, 6) AS delta,
                   round(v0 * (t1 / t0 - 1), 6) AS growth_effect,
                   round(v1 - v0 * (t1 / t0), 6) AS mix_effect
            FROM g, t ORDER BY segment
        """,
        # twin of q_record_days — same running-max flags and
        # harmonic expectation
        "record_days": """
            WITH daily AS (
              SELECT (CAST(ts AS DATE) - DATE '1970-01-01')::DOUBLE
                       AS t,
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1),
            b AS (
              SELECT CASE WHEN max(x) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) IS NULL
                          OR x > max(x) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING)
                     THEN 1 ELSE 0 END AS rec,
                     1.0 / row_number() OVER (ORDER BY t) AS inv_k
              FROM daily)
            SELECT count(*)::BIGINT AS n,
                   sum(rec)::BIGINT AS n_records,
                   round(sum(inv_k), 6) AS expected_records,
                   round(sum(rec) - sum(inv_k), 6) AS excess
            FROM b
        """,
        # twin of q_c_chart_volume — same frozen baseline and
        # Poisson limits
        "c_chart_volume": """
            WITH daily AS (
              SELECT CAST(ts AS DATE) AS "order",
                     count(*)::DOUBLE AS x
              FROM events GROUP BY 1),
            b AS (SELECT avg(x) AS c FROM daily
                  WHERE "order" <= DATE '2024-01-14')
            SELECT "order", round(x, 6) AS x,
                   round((SELECT c FROM b), 6) AS center,
                   round((SELECT c FROM b)
                         + 3 * sqrt((SELECT c FROM b)), 6) AS ucl,
                   round(greatest(0.0, (SELECT c FROM b)
                         - 3 * sqrt((SELECT c FROM b))), 6) AS lcl,
                   (x > (SELECT c FROM b)
                        + 3 * sqrt((SELECT c FROM b))
                    OR x < greatest(0.0, (SELECT c FROM b)
                           - 3 * sqrt((SELECT c FROM b))))
                     AS out_of_control
            FROM daily ORDER BY "order"
        """,
        # twin of q_pct_encoding_audit — same seeded urls, same
        # escape regexes
        "pct_encoding_audit": """
            WITH seeded AS (
              SELECT 'http://h.example/p/' || doc_id::VARCHAR
                     || '/' ||
                     CASE doc_id % 5
                       WHEN 0 THEN '%20ok'
                       WHEN 1 THEN '%2541'
                       WHEN 2 THEN '%zz'
                       WHEN 3 THEN '%e9%a1'
                       ELSE 'plain' END AS url
              FROM documents)
            SELECT url,
                   len(regexp_extract_all(url,
                       '%[0-9A-Fa-f]{2}'))::INT AS n_valid_escapes,
                   (len(regexp_extract_all(url, '%'))
                    - len(regexp_extract_all(url,
                          '%[0-9A-Fa-f]{2}')))::INT
                     AS n_invalid_escapes,
                   len(regexp_extract_all(url,
                       '%25[0-9A-Fa-f]{2}'))::INT
                     AS n_double_encoded
            FROM seeded WHERE contains(url, '%')
            ORDER BY url
        """,
        # twin of q_html_entity_audit — same injected suffixes,
        # same entity regexes
        "html_entity_audit": """
            WITH inj AS (
              SELECT lang,
                     text || CASE doc_id % 6
                       WHEN 0 THEN ' &amp; ok'
                       WHEN 1 THEN ' &#65; num'
                       WHEN 2 THEN ' a & b'
                       WHEN 3 THEN ' &#x1F600; hex'
                       ELSE '' END AS t
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL)
            SELECT lang AS "group", count(*)::BIGINT AS n_docs,
                   sum(len(regexp_extract_all(t,
                       '&[a-zA-Z][a-zA-Z0-9]{1,31};')))::BIGINT
                     AS n_named,
                   sum(len(regexp_extract_all(t,
                       '&#(?:[0-9]{1,7}|[xX][0-9A-Fa-f]{1,6});')))
                     ::BIGINT AS n_numeric,
                   sum(len(regexp_extract_all(t, '&'))
                       - len(regexp_extract_all(t,
                           '&[a-zA-Z][a-zA-Z0-9]{1,31};'))
                       - len(regexp_extract_all(t,
                           '&#(?:[0-9]{1,7}|[xX][0-9A-Fa-f]{1,6});'
                         )))::BIGINT AS n_bare_amp,
                   sum(CASE WHEN len(regexp_extract_all(t,
                         '&[a-zA-Z][a-zA-Z0-9]{1,31};'))
                         + len(regexp_extract_all(t,
                         '&#(?:[0-9]{1,7}|[xX][0-9A-Fa-f]{1,6});'))
                         > 0 THEN 1 ELSE 0 END)::BIGINT
                     AS docs_with_entities
            FROM inj GROUP BY 1 ORDER BY "group"
        """,
        # twin of q_control_char_audit — same injected bytes (via
        # escape-string literals), same codepoint classes
        "control_char_audit": """
            WITH inj AS (
              SELECT lang,
                     text || CASE doc_id % 6
                       WHEN 0 THEN E'\\r\\nline'
                       WHEN 1 THEN E'\\rbare\\x07bell'
                       WHEN 2 THEN ' nb' || chr(160) || 'zw'
                                   || chr(8203)
                       ELSE '' END AS t
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL)
            SELECT lang AS "group", count(*)::BIGINT AS n_docs,
                   sum(len(regexp_extract_all(t, E'\\r\\n')))
                     ::BIGINT AS n_crlf,
                   sum(len(regexp_extract_all(t, E'\\r'))
                       - len(regexp_extract_all(t, E'\\r\\n')))
                     ::BIGINT AS n_bare_cr,
                   sum(len(regexp_extract_all(t,
                       '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')))
                     ::BIGINT AS n_ctrl,
                   sum(len(regexp_extract_all(t, chr(65279))))
                     ::BIGINT AS n_bom,
                   sum(len(regexp_extract_all(t, chr(160))))
                     ::BIGINT AS n_nbsp,
                   sum(len(regexp_extract_all(t, chr(8203))))
                     ::BIGINT AS n_zwsp
            FROM inj GROUP BY 1 ORDER BY "group"
        """,
        # twin of q_truncation_audit — same 120-char cut, same
        # terminal-punct class, same modal tie-break (count desc,
        # length asc)
        "truncation_audit": """
            WITH tr AS (
              SELECT source,
                     CASE WHEN doc_id % 9 = 0
                          THEN substr(text, 1, 120)
                          ELSE text END AS t
              FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL),
            base AS (
              SELECT source AS "group", length(trim(t)) AS ln,
                     CASE WHEN NOT regexp_matches(trim(t),
                          '[.!?"''”)]$') THEN 1 ELSE 0 END
                       AS no_term
              FROM tr),
            lens AS (SELECT "group", ln, count(*) AS lc
                     FROM base GROUP BY 1, 2),
            modal AS (
              SELECT "group", ln AS modal_len, lc AS modal_count
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY "group"
                      ORDER BY lc DESC, ln ASC) AS rn
                    FROM lens)
              WHERE rn = 1),
            g AS (SELECT "group", count(*)::BIGINT AS n_docs,
                         sum(no_term) AS nt
                  FROM base GROUP BY 1)
            SELECT g."group", n_docs,
                   round(nt * 1.0 / n_docs, 6)
                     AS no_terminal_share,
                   modal_len::BIGINT AS modal_len,
                   round(modal_count * 1.0 / n_docs, 6)
                     AS modal_share
            FROM g JOIN modal USING ("group")
            ORDER BY g."group"
        """,
        # twin of q_unit_mix — same injection, same rounded-log10
        # decade buckets, same two-mode rule
        "unit_mix": """
            WITH inj AS (
              SELECT event_type,
                     CASE WHEN event_type = 'view'
                               AND event_id % 3 = 0
                          THEN value * 1000 ELSE value END AS v
              FROM events),
            base AS (
              SELECT event_type AS "group",
                     floor(round(log10(v), 9))::BIGINT AS dec
              FROM inj WHERE event_type IS NOT NULL AND v > 0),
            cnt AS (SELECT "group", dec, count(*)::DOUBLE AS c
                    FROM base GROUP BY 1, 2),
            tot AS (SELECT "group", sum(c) AS n, count(*) AS nd
                    FROM cnt GROUP BY 1),
            j AS (SELECT cnt."group", dec, c / n AS share, n, nd
                  FROM cnt JOIN tot USING ("group")),
            top AS (SELECT * FROM (
                      SELECT "group", dec AS top_decade,
                             share AS top_share, n, nd,
                             row_number() OVER (
                               PARTITION BY "group"
                               ORDER BY share DESC, dec ASC) AS rn
                      FROM j) WHERE rn = 1),
            far AS (SELECT j."group", j.dec, j.share
                    FROM j JOIN top USING ("group")
                    WHERE abs(j.dec - top.top_decade) >= 2),
            sec AS (SELECT * FROM (
                      SELECT "group", dec AS second_decade,
                             share AS second_share,
                             row_number() OVER (
                               PARTITION BY "group"
                               ORDER BY share DESC, dec ASC) AS rn
                      FROM far) WHERE rn = 1)
            SELECT top."group", n::BIGINT AS n,
                   nd::BIGINT AS n_decades, top_decade,
                   round(top_share, 6) AS top_share,
                   second_decade,
                   round(second_share, 6) AS second_share,
                   coalesce(second_share, 0) >= 0.2 AS unit_mix
            FROM top LEFT JOIN sec USING ("group")
            ORDER BY "group"
        """,
        # twin of q_event_echo — same duplication, same tie-ordered
        # lag windows and 2s gap
        "event_echo": """
            WITH ee AS (
              SELECT user_id, ts, event_type, value FROM events
              UNION ALL
              SELECT user_id, ts + INTERVAL 1 SECOND, event_type,
                     value
              FROM events WHERE event_id % 13 = 0),
            b AS (
              SELECT user_id,
                     (event_type IS NOT DISTINCT FROM
                        lag(event_type) OVER w)
                     AND (value IS NOT DISTINCT FROM
                        lag(value) OVER w)
                     AND (extract(epoch FROM ts)
                          - lag(extract(epoch FROM ts)) OVER w
                          <= 2.0) AS echo
              FROM ee
              WHERE user_id IS NOT NULL AND ts IS NOT NULL
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY ts, event_type, value))
            SELECT count(*)::BIGINT AS n_events,
                   sum(CASE WHEN echo THEN 1 ELSE 0 END)::BIGINT
                     AS n_echoes,
                   round(sum(CASE WHEN echo THEN 1 ELSE 0 END)
                         * 1.0 / count(*), 6) AS echo_share,
                   count(DISTINCT CASE WHEN echo
                         THEN user_id END)::BIGINT
                     AS n_entities_affected
            FROM b
        """,
        # twin of q_shouting_audit — same suffix, same regex
        # counters
        "shouting_audit": """
            WITH sh AS (
              SELECT lang,
                     CASE WHEN doc_id % 7 = 0
                          THEN text || ' BUY NOW!!! AMAZING DEAL!'
                          ELSE text END AS t
              FROM documents
              WHERE text IS NOT NULL AND lang IS NOT NULL)
            SELECT lang AS "group", count(*)::BIGINT AS n_docs,
                   round(sum(len(regexp_extract_all(t, '[A-Z]')))
                         * 1.0 / sum(greatest(
                             len(regexp_extract_all(t,
                                 '[A-Za-z]')), 1)), 6)
                     AS upper_char_share,
                   round(sum(len(regexp_extract_all(t,
                             '\\b[A-Z]{3,}\\b'))) * 1.0
                         / sum(greatest(len(regexp_extract_all(t,
                             '\\b[A-Za-z]{3,}\\b')), 1)), 6)
                     AS caps_word_share,
                   round(sum(len(regexp_extract_all(t, '!')))
                         * 1000.0
                         / sum(greatest(length(t), 1)), 6)
                     AS excl_per_kchar,
                   sum(len(regexp_extract_all(t, '!{2,}')))
                     ::BIGINT AS n_multi_excl
            FROM sh GROUP BY 1 ORDER BY "group"
        """,
        # twin of q_id_continuity — same hole/dup injection, same
        # distinct-id lag gaps
        "id_continuity": """
            WITH inj0 AS (
              SELECT event_id FROM events
              WHERE NOT (event_id BETWEEN 400 AND 449)),
            inj AS (
              SELECT event_id FROM inj0
              UNION ALL
              SELECT event_id FROM inj0 WHERE event_id % 101 = 0),
            ids AS (SELECT event_id::BIGINT AS i FROM inj
                    WHERE event_id IS NOT NULL),
            dist AS (SELECT DISTINCT i FROM ids),
            gaps AS (
              SELECT i - lag(i) OVER (ORDER BY i) - 1 AS g,
                     lag(i) OVER (ORDER BY i) AS prev
              FROM dist),
            gp AS (SELECT g AS max_gap, prev + 1 AS gap_start
                   FROM gaps WHERE g > 0
                   ORDER BY g DESC, prev ASC LIMIT 1),
            agg AS (
              SELECT count(*)::BIGINT AS n_rows,
                     count(DISTINCT i)::BIGINT AS n_distinct,
                     min(i) AS id_min, max(i) AS id_max
              FROM ids)
            SELECT n_rows, n_distinct, id_min, id_max,
                   (id_max - id_min + 1 - n_distinct)::BIGINT
                     AS n_missing,
                   (n_rows - n_distinct)::BIGINT AS n_duplicated,
                   (SELECT max_gap FROM gp)::BIGINT AS max_gap,
                   (SELECT gap_start FROM gp)::BIGINT AS gap_start
            FROM agg
        """,
        # twin of q_partition_balance — same portable md5 bucket,
        # same skew facts (chi2 over all buckets incl. empties)
        "partition_balance": """
            WITH cnt AS (
              SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 8))
                       ::BIGINT % 32 AS b,
                     count(*)::DOUBLE AS c
              FROM events WHERE user_id IS NOT NULL GROUP BY 1),
            a AS (
              SELECT sum(c) AS n, count(*) AS nb_seen,
                     max(c) AS mx, min(c) AS mn,
                     sum(c * c) AS c2
              FROM cnt)
            SELECT n::BIGINT AS n, 32 AS n_buckets,
                   mx::BIGINT AS max_bucket,
                   (CASE WHEN nb_seen < 32 THEN 0 ELSE mn END)
                     ::BIGINT AS min_bucket,
                   round(mx / (n / 32), 6) AS skew_ratio,
                   (32 - nb_seen)::BIGINT AS n_empty_buckets,
                   round(c2 / (n / 32) - n, 6) AS chi2
            FROM a
        """,
        # twin of q_decile_shift — same exact interpolated deciles
        # (quantile fractions must be constants in DuckDB, so the 9
        # deciles are unrolled)
        "decile_shift": """
            WITH base AS (
              SELECT n_chars::DOUBLE AS v,
                     doc_id % 2 = 0 AS s
              FROM documents WHERE n_chars IS NOT NULL),
            qa AS (SELECT """ + ", ".join(
            f"quantile_cont(v, {k / 10.0}) AS qa{k}"
            for k in range(1, 10)) + """
                   FROM base WHERE s),
            qb AS (SELECT """ + ", ".join(
            f"quantile_cont(v, {k / 10.0}) AS qb{k}"
            for k in range(1, 10)) + """
                   FROM base WHERE NOT s)
            SELECT * FROM (""" + " UNION ALL ".join(
            f"""SELECT {k * 10} AS decile,
                   round((SELECT qa{k} FROM qa), 6) AS q_a,
                   round((SELECT qb{k} FROM qb), 6) AS q_b,
                   round((SELECT qb{k} FROM qb)
                         - (SELECT qa{k} FROM qa), 6) AS shift"""
            for k in range(1, 10)) + """
            ) ORDER BY decile
        """,
        # twin of q_heavy_hitters — plain GROUP BY + HAVING over the
        # same N/k threshold (the Spark side's sketch+verify is exact,
        # so the naive oracle agrees)
        "heavy_hitters": """
            WITH c AS (
              SELECT event_type AS item, count(*)::BIGINT AS cnt
              FROM events WHERE event_type IS NOT NULL GROUP BY 1),
            n AS (SELECT sum(cnt)::DOUBLE AS n FROM c)
            SELECT item, cnt,
                   round(cnt / (SELECT n FROM n), 6) AS share
            FROM c WHERE cnt > (SELECT n FROM n) / 6
        """,
        # twin of q_error_rate_trend — same per-day (n, x) table,
        # same closed-form T / Var(T) / Z
        "error_rate_trend": """
            WITH s AS (
              SELECT extract(day FROM ts)::DOUBLE AS s,
                     count(*)::DOUBLE AS n,
                     sum(CASE WHEN event_type = 'error'
                              THEN 1 ELSE 0 END)::DOUBLE AS x
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            a AS (
              SELECT sum(n) AS nn, sum(x) AS xx,
                     sum(n * s) AS ns, sum(n * s * s) AS ns2,
                     sum(x * s) AS xs
              FROM s)
            SELECT nn::BIGINT AS n, xx::BIGINT AS x,
                   round(xx / nn, 6) AS p_bar,
                   round(xs - (xx / nn) * ns, 6) AS t_stat,
                   round((xx / nn) * (1 - xx / nn)
                         * (ns2 - ns * ns / nn), 6) AS var_t,
                   round((xs - (xx / nn) * ns)
                         / sqrt((xx / nn) * (1 - xx / nn)
                                * (ns2 - ns * ns / nn)), 6) AS z
            FROM a
        """,
        # twin of q_lorenz_table — same asc (t, unit) ranking, same
        # ceil rank cuts
        "lorenz_table": """
            WITH u AS (
              SELECT user_id AS unit, count(*)::DOUBLE AS t
              FROM events WHERE user_id IS NOT NULL GROUP BY 1),
            r AS (SELECT t,
                         row_number() OVER (ORDER BY t, unit) AS rn,
                         sum(t) OVER (ORDER BY t, unit
                                      ROWS UNBOUNDED PRECEDING) AS cum
                  FROM u),
            a AS (SELECT count(*)::BIGINT AS nu, sum(t) AS tot FROM u),
            d AS (SELECT unnest(generate_series(1, 10)) AS d)
            SELECT (d.d * 10)::INT AS decile,
                   ceil(a.nu * d.d / 10.0)::BIGINT AS cut_rank,
                   round(ceil(a.nu * d.d / 10.0) / a.nu, 6)
                     AS unit_share,
                   round(r.cum / a.tot, 6) AS value_share
            FROM d, a, r WHERE r.rn = ceil(a.nu * d.d / 10.0)
            ORDER BY decile
        """,
        # twin of q_kruskal_len_langs — same doubled-average-rank
        # table over distinct values, same tie-corrected H
        "kruskal_len_langs": """
            WITH base AS (
              SELECT n_chars::DOUBLE AS v, lang AS g FROM documents
              WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
            vt AS (SELECT v, count(*)::DOUBLE AS n FROM base
                   GROUP BY v),
            ranks AS (
              SELECT v, n,
                     2 * coalesce(sum(n) OVER (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND
                         1 PRECEDING), 0) + n + 1 AS rank2
              FROM vt),
            gv AS (SELECT g, v, count(*)::DOUBLE AS ngv FROM base
                   GROUP BY g, v),
            per_g AS (
              SELECT g, sum(ngv) AS ng,
                     sum(ngv * r.rank2) AS r2g
              FROM gv JOIN ranks r USING (v) GROUP BY g),
            ties AS (SELECT sum(n*n*n - n) AS tsum FROM vt),
            a AS (SELECT sum(ng) AS nn, count(*)::DOUBLE AS k,
                         sum(r2g * r2g / ng) AS rr
                  FROM per_g)
            SELECT nn::BIGINT AS n, k::BIGINT AS k_groups,
                   round(12.0/(nn*(nn+1)) * rr/4.0 - 3*(nn+1), 6)
                     AS h,
                   round(1.0 - (SELECT tsum FROM ties)
                         / (nn*nn*nn - nn), 6) AS tie_c,
                   round((12.0/(nn*(nn+1)) * rr/4.0 - 3*(nn+1))
                         / (1.0 - (SELECT tsum FROM ties)
                            / (nn*nn*nn - nn)), 6) AS h_adj,
                   (k - 1)::BIGINT AS dof
            FROM a
        """,
        # twin of q_fleiss_langs — same three deterministic raters
        # unpivoted to ratings, same P̄ / P_e close
        "fleiss_langs": """
            WITH d AS (SELECT doc_id, lang FROM documents
                       WHERE lang IS NOT NULL),
            ratings AS (
              SELECT doc_id AS i, lang AS c FROM d
              UNION ALL
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN 'unk'
                          ELSE lang END FROM d
              UNION ALL
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN 'en'
                          ELSE lang END FROM d),
            cells AS (SELECT i, c, count(*)::DOUBLE AS nij
                      FROM ratings GROUP BY i, c),
            per_item AS (SELECT i, sum(nij) AS ni,
                                sum(nij * nij) AS sq
                         FROM cells GROUP BY i),
            per_cat AS (SELECT c, sum(nij) AS nj FROM cells
                        GROUP BY c),
            ai AS (SELECT count(*)::DOUBLE AS n_items,
                          min(ni) AS n_lo, max(ni) AS n_hi,
                          sum(sq) AS sq_sum FROM per_item),
            ac AS (SELECT count(*)::BIGINT AS n_cats,
                          sum(nj * nj) AS nj2 FROM per_cat)
            SELECT (CASE WHEN n_lo = n_hi THEN n_items END)::BIGINT
                     AS n_items,
                   n_lo::BIGINT AS n_per_item,
                   n_cats AS n_categories,
                   round((sq_sum - n_items * n_lo)
                         / (n_items * n_lo * (n_lo - 1)), 6)
                     AS p_bar,
                   round(nj2 / (n_items * n_lo)
                         / (n_items * n_lo), 6) AS p_e,
                   round(((sq_sum - n_items * n_lo)
                          / (n_items * n_lo * (n_lo - 1))
                          - nj2 / (n_items*n_lo) / (n_items*n_lo))
                         / (1 - nj2 / (n_items*n_lo)
                            / (n_items*n_lo)), 6) AS kappa
            FROM ai, ac
        """,
        # twin of q_gumbel_daily_max — same daily maxima, same MOM
        # fit (sample stddev on both engines) and 100-day level
        "gumbel_daily_max": """
            WITH mx AS (
              SELECT ts::DATE AS b, max(value) AS m FROM events
              WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY 1),
            a AS (SELECT count(*)::BIGINT AS n_blocks,
                         avg(m) AS mm, stddev(m) AS sd,
                         max(m) AS omax
                  FROM mx)
            SELECT n_blocks,
                   round(mm, 6) AS max_mean,
                   round(sd, 6) AS max_sd,
                   round(mm - 0.5772156649015329
                         * (sd * sqrt(6.0) / pi()), 6) AS mu,
                   round(sd * sqrt(6.0) / pi(), 6) AS beta,
                   round(mm - 0.5772156649015329
                           * (sd * sqrt(6.0) / pi())
                         - (sd * sqrt(6.0) / pi())
                           * ln(-ln(1.0 - 1.0/100.0)), 6) AS rl_100,
                   round(omax, 6) AS observed_max
            FROM a
        """,
        # twin of q_friedman_types — same per-day counts, same
        # within-block 2×average ranks, same complete-block drop
        "friedman_types": """
            WITH daily AS (
              SELECT ts::DATE AS b, event_type AS t,
                     count(*)::DOUBLE AS v
              FROM events
              WHERE ts IS NOT NULL AND event_type IS NOT NULL
              GROUP BY 1, 2),
            k AS (SELECT count(DISTINCT t)::DOUBLE AS k FROM daily),
            sizes AS (SELECT b, count(DISTINCT t) AS kb FROM daily
                      GROUP BY b),
            complete AS (
              SELECT d.* FROM daily d JOIN sizes USING (b), k
              WHERE sizes.kb = k.k),
            ranked AS (
              SELECT t,
                     2 * rank() OVER (PARTITION BY b ORDER BY v)
                       + count(*) OVER (PARTITION BY b, v) - 1 AS r2
              FROM complete),
            per_t AS (SELECT t, sum(r2)::DOUBLE AS r2j,
                             count(*)::DOUBLE AS n
                      FROM ranked GROUP BY t),
            a AS (SELECT any_value(n) AS n, count(*)::DOUBLE AS kk,
                         sum(r2j * r2j) AS rr
                  FROM per_t),
            drp AS (SELECT count(*) AS n_dropped FROM sizes, k
                    WHERE sizes.kb <> k.k)
            SELECT n::BIGINT AS n_blocks,
                   (SELECT n_dropped FROM drp)::BIGINT AS n_dropped,
                   kk::BIGINT AS k_treat,
                   round(12.0/(n*kk*(kk+1)) * rr/4.0
                         - 3.0*n*(kk+1), 6) AS chi2_f,
                   round((12.0/(n*kk*(kk+1)) * rr/4.0
                          - 3.0*n*(kk+1)) / (n*(kk-1)), 6) AS w,
                   (kk - 1)::BIGINT AS dof
            FROM a
        """,
        # twin of q_cronbach_quality — same derived sub-scores, same
        # sample variances (regex class matches the Spark side)
        "cronbach_quality": """
            WITH s AS (
              SELECT ln(n_chars + 1) AS a,
                     length(regexp_replace(text, '[^A-Za-z]', '',
                                           'g'))
                       / greatest(length(text), 1)::DOUBLE AS b,
                     length(text) / greatest(
                       length(regexp_split_to_array(text, '\\s+')),
                       1)::DOUBLE AS c
              FROM documents),
            l AS (SELECT * FROM s
                  WHERE a IS NOT NULL AND b IS NOT NULL
                    AND c IS NOT NULL),
            agg AS (
              SELECT count(*)::BIGINT AS n,
                     var_samp(a) + var_samp(b) + var_samp(c)
                       AS var_sum,
                     var_samp(a + b + c) AS var_total
              FROM l),
            tot AS (SELECT count(*)::BIGINT AS n_all FROM s)
            SELECT n, (SELECT n_all FROM tot) - n AS n_dropped,
                   3 AS k_items,
                   round(var_sum, 6) AS var_sum,
                   round(var_total, 6) AS var_total,
                   round(CASE WHEN var_total > 0 THEN
                     1.5 * (1 - var_sum / var_total) END, 6) AS alpha
            FROM agg
        """,
        # twin of q_youden_len_gate — same distinct-score suffix
        # sweep, same lowest-threshold tie-break
        "youden_len_gate": """
            WITH b AS (
              SELECT n_chars::DOUBLE AS s,
                     (lang = 'en')::INT AS y
              FROM documents
              WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
            per_s AS (SELECT s, sum(y)::DOUBLE AS p,
                             sum(1 - y)::DOUBLE AS q
                      FROM b GROUP BY s),
            tot AS (SELECT sum(p) AS pp, sum(q) AS qq FROM per_s),
            sw AS (
              SELECT s,
                     sum(p) OVER (ORDER BY s DESC
                                  ROWS UNBOUNDED PRECEDING) AS tp,
                     sum(q) OVER (ORDER BY s DESC
                                  ROWS UNBOUNDED PRECEDING) AS fp
              FROM per_s),
            j AS (SELECT s, tp, fp,
                         tp / t.pp - fp / t.qq AS jj
                  FROM sw, tot t),
            best AS (SELECT * FROM j
                     ORDER BY jj DESC, s ASC LIMIT 1)
            SELECT round(s, 6) AS threshold,
                   tp::BIGINT AS tp, fp::BIGINT AS fp,
                   round(tp / (SELECT pp FROM tot), 6) AS tpr,
                   round(fp / (SELECT qq FROM tot), 6) AS fpr,
                   round(jj, 6) AS youden_j
            FROM best
        """,
        # twin of q_mase_volume — same calendar-date forecast joins
        "mase_volume": """
            WITH s AS (
              SELECT ts::DATE AS d, count(*)::DOUBLE AS x
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            scored AS (
              SELECT s.x, l1.x AS x1, l7.x AS xs
              FROM s
              LEFT JOIN s l1 ON l1.d + INTERVAL 1 DAY = s.d
              LEFT JOIN s l7 ON l7.d + INTERVAL 7 DAY = s.d),
            a AS (
              SELECT count(*) FILTER (x1 IS NOT NULL
                                      AND xs IS NOT NULL) AS n_scored,
                     avg(abs(x - xs)) FILTER (x1 IS NOT NULL
                                              AND xs IS NOT NULL)
                       AS mae_s,
                     avg(abs(x - x1)) FILTER (x1 IS NOT NULL
                                              AND xs IS NOT NULL)
                       AS mae_n,
                     count(*) AS n_days
              FROM scored)
            SELECT n_days::BIGINT AS n_days,
                   n_scored::BIGINT AS n_scored,
                   (n_days - n_scored)::BIGINT AS n_unmatched,
                   round(mae_s, 6) AS mae_seasonal,
                   round(mae_n, 6) AS mae_naive,
                   round(CASE WHEN mae_n > 0 THEN mae_s / mae_n END,
                         6) AS mase
            FROM a
        """,
        # twin of q_nelson_aalen_purchase — km_purchase's duration
        # model, Nelson-Aalen close
        "nelson_aalen_purchase": """
            WITH per AS (
              SELECT user_id, min(epoch(ts)) AS entry,
                     min(CASE WHEN event_type = 'purchase'
                         THEN epoch(ts) END) AS ev,
                     max(epoch(ts)) AS lastts
              FROM events WHERE user_id IS NOT NULL
              GROUP BY user_id),
            h AS (SELECT max(lastts) AS hz FROM per),
            marks AS (
              SELECT floor((CASE WHEN ev IS NOT NULL THEN ev - entry
                            ELSE hz - entry END) / 3600)::BIGINT
                       AS t_bucket,
                     count(*) AS alln,
                     sum(CASE WHEN ev IS NOT NULL THEN 1 ELSE 0 END)
                       AS d
              FROM per, h GROUP BY 1),
            curve AS (
              SELECT t_bucket,
                     sum(alln) OVER ()
                       - coalesce(sum(alln) OVER (
                           ORDER BY t_bucket ROWS BETWEEN UNBOUNDED
                           PRECEDING AND 1 PRECEDING), 0) AS n_risk,
                     d AS n_events
              FROM marks),
            na AS (
              SELECT t_bucket, n_risk, n_events,
                     sum(n_events / n_risk)
                       OVER (ORDER BY t_bucket ROWS BETWEEN
                             UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS ch,
                     sum(n_events / (n_risk * n_risk))
                       OVER (ORDER BY t_bucket ROWS BETWEEN
                             UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS vh
              FROM curve)
            SELECT t_bucket, n_risk::BIGINT AS n_risk,
                   n_events::BIGINT AS n_events,
                   round(ch, 6) AS cum_hazard,
                   round(vh, 6) AS var_hazard,
                   round(exp(-ch), 6) AS fh_survival
            FROM na WHERE n_events > 0 ORDER BY t_bucket
        """,
        # twin of q_robust_shape_langs — same interpolated octiles
        "robust_shape_langs": """
            WITH base AS (
              SELECT lang AS g, n_chars::DOUBLE AS v FROM documents
              WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
            a AS (
              SELECT g, count(*)::BIGINT AS n,
                     quantile_cont(v, 0.125) AS e1,
                     quantile_cont(v, 0.250) AS e2,
                     quantile_cont(v, 0.375) AS e3,
                     quantile_cont(v, 0.500) AS e4,
                     quantile_cont(v, 0.625) AS e5,
                     quantile_cont(v, 0.750) AS e6,
                     quantile_cont(v, 0.875) AS e7
              FROM base GROUP BY g)
            SELECT g AS "group", n,
                   round(e2, 6) AS q1, round(e4, 6) AS median,
                   round(e6, 6) AS q3,
                   round(CASE WHEN e6 > e2 THEN
                     (e6 + e2 - 2*e4) / (e6 - e2) END, 6)
                     AS bowley_skew,
                   round(CASE WHEN e6 > e2 THEN
                     ((e7 - e5) + (e3 - e1)) / (e6 - e2) END, 6)
                     AS moors_kurt
            FROM a ORDER BY g
        """,
        # twin of q_gk_lambda_source_lang — same cell table, both
        # asymmetric directions
        "gk_lambda_source_lang": """
            WITH cells AS (
              SELECT source AS x, lang AS y, count(*)::DOUBLE AS n
              FROM documents
              WHERE source IS NOT NULL AND lang IS NOT NULL
              GROUP BY 1, 2),
            px AS (SELECT x, max(n) AS mx, sum(n) AS nx FROM cells
                   GROUP BY x),
            py AS (SELECT y, max(n) AS my, sum(n) AS ny FROM cells
                   GROUP BY y),
            ax AS (SELECT sum(mx) AS sum_max_y,
                          max(nx) AS max_marg_x FROM px),
            ay AS (SELECT sum(my) AS sum_max_x,
                          max(ny) AS max_marg_y,
                          sum(ny) AS nn FROM py)
            SELECT nn::BIGINT AS n,
                   round((sum_max_y - max_marg_y)
                         / nullif(nn - max_marg_y, 0), 6)
                     AS lambda_y_given_x,
                   round((sum_max_x - max_marg_x)
                         / nullif(nn - max_marg_x, 0), 6)
                     AS lambda_x_given_y
            FROM ay, ax
        """,
        # twin of q_kuiper_diurnal — same distinct-value CDF sweep
        "kuiper_diurnal": """
            WITH base AS (
              SELECT extract(hour FROM ts)::DOUBLE AS v,
                     extract(dow FROM ts) IN (0, 6) AS s
              FROM events WHERE ts IS NOT NULL),
            vc AS (
              SELECT v,
                     sum(CASE WHEN s THEN 1 ELSE 0 END)::DOUBLE
                       AS na,
                     sum(CASE WHEN s THEN 0 ELSE 1 END)::DOUBLE
                       AS nb
              FROM base GROUP BY v),
            tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM vc),
            cdfs AS (
              SELECT sum(na) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS ca,
                     sum(nb) OVER (ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cb
              FROM vc),
            a AS (
              SELECT greatest(max(ca / t.ta - cb / t.tb), 0)
                       AS dp,
                     greatest(max(cb / t.tb - ca / t.ta), 0)
                       AS dm
              FROM cdfs, tot t)
            SELECT (SELECT ta FROM tot)::BIGINT AS n_a,
                   (SELECT tb FROM tot)::BIGINT AS n_b,
                   round(dp, 6) AS d_plus,
                   round(dm, 6) AS d_minus,
                   round(dp + dm, 6) AS v_stat
            FROM a
        """,
        # twin of q_poisson_scan_volume — same RANGE windows over
        # day indices, same Kulldorff LLR and earliest-start ties
        "poisson_scan_volume": """
            WITH daily AS (
              SELECT ts::DATE AS d, count(*)::DOUBLE AS x
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            lo AS (SELECT min(d) AS d0, max(d) AS d1,
                          sum(x) AS nn FROM daily),
            idx AS (
              SELECT d, x, (d - lo.d0) AS i,
                     (lo.d1 - lo.d0 + 1)::DOUBLE AS t, lo.nn
              FROM daily, lo),
            scans AS (
              SELECT w, d, i, t, nn,
                     sum(x) OVER (PARTITION BY w ORDER BY i
                                  RANGE BETWEEN w - 1 PRECEDING
                                  AND CURRENT ROW) AS wx
              FROM idx CROSS JOIN
                   (SELECT unnest([1, 3, 7]) AS w)),
            scored AS (
              SELECT w, d - (w - 1) AS start_day, i, wx,
                     nn * w / t AS e, nn
              FROM scans WHERE i >= w - 1),
            llrs AS (
              SELECT w, start_day, i, wx, e,
                     CASE WHEN wx > e THEN
                       wx * ln(wx / e)
                       + CASE WHEN wx < nn THEN
                           (nn - wx) * ln((nn - wx) / (nn - e))
                         ELSE 0 END
                     ELSE 0 END AS llr
              FROM scored),
            best AS (
              SELECT w, start_day, wx, e, llr,
                     row_number() OVER (PARTITION BY w
                       ORDER BY llr DESC, i ASC) AS rn
              FROM llrs)
            SELECT w AS w_days, start_day,
                   wx::BIGINT AS x, round(e, 6) AS expected,
                   round(llr, 6) AS llr
            FROM best WHERE rn = 1 ORDER BY w_days
        """,
        # twin of q_chow_value_halves — same sufficient-statistic
        # SSEs, same degenerate-regime guard
        "chow_value_halves": """
            WITH s AS (
              SELECT extract(hour FROM ts)::DOUBLE AS x,
                     value AS y,
                     extract(day FROM ts) <= 15 AS g
              FROM events
              WHERE ts IS NOT NULL AND value IS NOT NULL),
            a AS (
              SELECT
                sum(CASE WHEN g THEN 1 ELSE 0 END)::DOUBLE AS n1,
                sum(CASE WHEN NOT g THEN 1 ELSE 0 END)::DOUBLE AS n2,
                count(*)::DOUBLE AS np,
                sum(CASE WHEN g THEN x ELSE 0 END) AS sx1,
                sum(CASE WHEN g THEN y ELSE 0 END) AS sy1,
                sum(CASE WHEN g THEN x*y ELSE 0 END) AS sxy1,
                sum(CASE WHEN g THEN x*x ELSE 0 END) AS sx21,
                sum(CASE WHEN g THEN y*y ELSE 0 END) AS sy21,
                sum(CASE WHEN NOT g THEN x ELSE 0 END) AS sx2,
                sum(CASE WHEN NOT g THEN y ELSE 0 END) AS sy2,
                sum(CASE WHEN NOT g THEN x*y ELSE 0 END) AS sxy2,
                sum(CASE WHEN NOT g THEN x*x ELSE 0 END) AS sx22,
                sum(CASE WHEN NOT g THEN y*y ELSE 0 END) AS sy22,
                sum(x) AS sxp, sum(y) AS syp, sum(x*y) AS sxyp,
                sum(x*x) AS sx2p, sum(y*y) AS sy2p
              FROM s),
            d AS (
              SELECT n1, n2, np,
                     sx21 - sx1*sx1/n1 AS sxx1,
                     sxy1 - sx1*sy1/n1 AS sxy1c,
                     sy21 - sy1*sy1/n1 AS syy1,
                     sx22 - sx2*sx2/n2 AS sxx2,
                     sxy2 - sx2*sy2/n2 AS sxy2c,
                     sy22 - sy2*sy2/n2 AS syy2,
                     sx2p - sxp*sxp/np AS sxxp,
                     sxyp - sxp*syp/np AS sxypc,
                     sy2p - syp*syp/np AS syyp
              FROM a),
            e AS (
              SELECT n1, n2,
                     syyp - sxypc*sxypc/sxxp AS ssep,
                     syy1 - sxy1c*sxy1c/sxx1 AS sse1,
                     syy2 - sxy2c*sxy2c/sxx2 AS sse2,
                     (n1 >= 3 AND n2 >= 3 AND sxx1 > 0
                      AND sxx2 > 0) AS ok
              FROM d)
            SELECT n1::BIGINT AS n1, n2::BIGINT AS n2,
                   round(ssep, 6) AS sse_pooled,
                   round(CASE WHEN ok THEN sse1 + sse2 END, 6)
                     AS sse_split,
                   round(CASE WHEN ok AND sse1 + sse2 > 0 THEN
                     ((ssep - sse1 - sse2) / 2.0)
                     / ((sse1 + sse2) / (n1 + n2 - 4)) END, 6)
                     AS f_stat,
                   (n1 + n2 - 4)::BIGINT AS dof2
            FROM e
        """,
        # twin of q_weighted_kappa_buckets — same cells, marginal
        # cross, linear weights over the observed span
        "weighted_kappa_buckets": """
            WITH rated AS (
              SELECT least(floor(n_chars / 120), 4)::BIGINT AS a,
                     least(least(floor(n_chars / 120), 4)
                           + CASE WHEN doc_id % 4 = 0 THEN 1
                             ELSE 0 END, 4)::BIGINT AS b
              FROM documents WHERE n_chars IS NOT NULL),
            cells AS (SELECT a, b, count(*)::DOUBLE AS n FROM rated
                      GROUP BY a, b),
            span AS (SELECT least(min(a), min(b)) AS lo,
                            greatest(max(a), max(b)) AS hi,
                            sum(n) AS nn FROM cells),
            po AS (
              SELECT sum((CASE WHEN s.hi > s.lo THEN
                          1.0 - abs(c.a - c.b)::DOUBLE
                                / (s.hi - s.lo)
                          ELSE 1.0 END) * c.n / s.nn) AS po
              FROM cells c, span s),
            ma AS (SELECT a, sum(n) AS na FROM cells GROUP BY a),
            mb AS (SELECT b, sum(n) AS nb FROM cells GROUP BY b),
            pe AS (
              SELECT sum((CASE WHEN s.hi > s.lo THEN
                          1.0 - abs(ma.a - mb.b)::DOUBLE
                                / (s.hi - s.lo)
                          ELSE 1.0 END) * ma.na * mb.nb
                         / (s.nn * s.nn)) AS pe
              FROM ma, mb, span s)
            SELECT s.nn::BIGINT AS n,
                   (s.hi - s.lo + 1)::BIGINT AS k_levels,
                   round(po.po, 6) AS po_w,
                   round(pe.pe, 6) AS pe_w,
                   round(CASE WHEN pe.pe < 1 THEN
                     (po.po - pe.pe) / (1 - pe.pe) END, 6)
                     AS kappa_w
            FROM span s, po, pe
        """,
        # twin of q_partial_corr_len — same listwise frame, same
        # three Pearson r's and the first-order formula
        "partial_corr_len": """
            WITH feats AS (
              SELECT n_chars::DOUBLE AS x,
                     length(regexp_split_to_array(text, '\\s+'))
                       ::DOUBLE AS y,
                     length(text)::DOUBLE
                       / length(regexp_split_to_array(text, '\\s+'))
                       AS z
              FROM documents WHERE text IS NOT NULL),
            l AS (SELECT * FROM feats
                  WHERE x IS NOT NULL AND y IS NOT NULL
                    AND z IS NOT NULL),
            a AS (SELECT count(*)::BIGINT AS n,
                         corr(x, y) AS rxy, corr(x, z) AS rxz,
                         corr(y, z) AS ryz
                  FROM l)
            SELECT n, round(rxy, 6) AS r_xy,
                   round(rxz, 6) AS r_xz, round(ryz, 6) AS r_yz,
                   round(CASE WHEN (1 - rxz*rxz) * (1 - ryz*ryz) > 0
                     THEN (rxy - rxz*ryz)
                          / sqrt((1 - rxz*rxz) * (1 - ryz*ryz))
                     END, 6) AS partial_r
            FROM a
        """,
        # twin of q_jonckheere_len_trend — same dense grid, same
        # tie-corrected moments
        "jonckheere_len_trend": """
            WITH base AS (
              SELECT (ascii(right(source, 1)) % 5)::DOUBLE AS g,
                     n_chars::DOUBLE AS v
              FROM documents
              WHERE source IS NOT NULL AND n_chars IS NOT NULL),
            cells AS (SELECT g, v, count(*)::DOUBLE AS n FROM base
                      GROUP BY g, v),
            grid AS (
              SELECT gs.g, vs.v, coalesce(c.n, 0) AS n
              FROM (SELECT DISTINCT g FROM cells) gs
              CROSS JOIN (SELECT DISTINCT v FROM cells) vs
              LEFT JOIN cells c ON c.g = gs.g AND c.v = vs.v),
            g1 AS (
              SELECT g, v, n,
                     coalesce(sum(n) OVER (PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cum_lt
              FROM grid),
            g2 AS (
              SELECT g, v, n,
                     coalesce(sum(cum_lt) OVER (PARTITION BY v
                       ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS a,
                     coalesce(sum(n) OVER (PARTITION BY v ORDER BY g
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS b
              FROM g1),
            jj AS (SELECT sum(n * (a + b / 2)) AS j FROM g2),
            szs AS (SELECT g, sum(n) AS ng FROM cells GROUP BY g),
            tvs AS (SELECT v, sum(n) AS tv FROM cells GROUP BY v),
            m1 AS (SELECT sum(ng) AS nn, count(*)::BIGINT AS k,
                          sum(ng*ng) AS s2,
                          sum(ng*(ng-1)*(2*ng+5)) AS u1,
                          sum(ng*(ng-1)*(ng-2)) AS u2,
                          sum(ng*(ng-1)) AS u3
                   FROM szs),
            m2 AS (SELECT sum(tv*(tv-1)*(2*tv+5)) AS t1,
                          sum(tv*(tv-1)*(tv-2)) AS t2,
                          sum(tv*(tv-1)) AS t3
                   FROM tvs)
            SELECT nn::BIGINT AS n, k AS k_groups,
                   round(j, 6) AS j_stat,
                   round((nn*nn - s2) / 4.0, 6) AS mean_j,
                   round((nn*(nn-1)*(2*nn+5) - u1 - t1) / 72.0
                         + u2*t2 / (36.0*nn*(nn-1)*(nn-2))
                         + u3*t3 / (8.0*nn*(nn-1)), 6) AS var_j,
                   round((j - (nn*nn - s2) / 4.0)
                         / sqrt((nn*(nn-1)*(2*nn+5) - u1 - t1)/72.0
                                + u2*t2/(36.0*nn*(nn-1)*(nn-2))
                                + u3*t3/(8.0*nn*(nn-1))), 6) AS z
            FROM jj, m1, m2
        """,
        # twin of q_emoji_sources — same seeded injection, match
        # counts via regexp_extract_all (DuckDB has no regexp_count)
        "emoji_sources": """
            WITH seeded AS (
              SELECT source, n_chars,
                     CASE WHEN doc_id % 7 = 0
                          THEN text || ' '
                               || repeat('🔥', (doc_id % 3 + 1)::INT)
                          ELSE text END AS text
              FROM documents),
            base AS (
              SELECT source AS "group",
                     len(regexp_extract_all(text,
                       '[\\x{2600}-\\x{27BF}\\x{1F300}-\\x{1F5FF}\\x{1F600}-\\x{1F64F}\\x{1F680}-\\x{1F6FF}\\x{1F900}-\\x{1F9FF}\\x{1FA70}-\\x{1FAFF}]'))
                       AS h,
                     n_chars::DOUBLE AS c
              FROM seeded
              WHERE text IS NOT NULL AND source IS NOT NULL)
            SELECT "group", count(*)::BIGINT AS n_docs,
                   sum(CASE WHEN h > 0 THEN 1 ELSE 0 END)::BIGINT
                     AS docs_with_emoji,
                   sum(h)::BIGINT AS emoji_hits,
                   round(sum(h) * 1000.0 / nullif(sum(c), 0), 6)
                     AS emoji_per_kchar,
                   round(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END)
                         / count(*)::DOUBLE, 6) AS docs_share
            FROM base GROUP BY 1 ORDER BY 1
        """,
        # twin of q_social_residue_sources — same seeded injection
        "social_residue_sources": """
            WITH seeded AS (
              SELECT source, n_chars,
                     CASE WHEN doc_id % 11 = 0
                          THEN text
                               || ' #trending @user http://t.co/abc'
                          ELSE text END AS text
              FROM documents),
            base AS (
              SELECT source AS "group",
                     len(regexp_extract_all(text,
                       '(^|\\s)#\\w{2,}')) AS ht,
                     len(regexp_extract_all(text,
                       '(^|\\s)@\\w{2,}')) AS mn,
                     len(regexp_extract_all(text,
                       'https?://[^\\s]+')) AS ur,
                     n_chars::DOUBLE AS cc
              FROM seeded
              WHERE text IS NOT NULL AND source IS NOT NULL)
            SELECT "group", count(*)::BIGINT AS n_docs,
                   sum(ht)::BIGINT AS hashtag_hits,
                   sum(mn)::BIGINT AS mention_hits,
                   sum(ur)::BIGINT AS url_hits,
                   sum(CASE WHEN ht + mn + ur > 0 THEN 1
                       ELSE 0 END)::BIGINT AS docs_with_any,
                   round((sum(ht) + sum(mn) + sum(ur)) * 1000.0
                         / nullif(sum(cc), 0), 6)
                     AS residue_per_kchar
            FROM base GROUP BY 1 ORDER BY 1
        """,
        # twin of q_sketch_quantile_audit — exact quantiles; the
        # sketch side is Spark-internal, so the oracle asserts the
        # COVENANT (within_bound true) rather than the sketch value
        "sketch_quantile_audit": """
            WITH base AS (
              SELECT lang AS g, n_chars::DOUBLE AS v FROM documents
              WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
            a AS (
              SELECT g, count(*)::BIGINT AS n,
                     quantile_cont(v, 0.5) AS e0,
                     quantile_cont(v, 0.9) AS e1,
                     quantile_cont(v, 0.99) AS e2
              FROM base GROUP BY g)
            SELECT g AS "group", p.prob::DOUBLE AS prob, n,
                   round(CASE p.i WHEN 0 THEN e0 WHEN 1 THEN e1
                         ELSE e2 END, 6) AS exact_q,
                   TRUE AS within_bound
            FROM a CROSS JOIN (
              SELECT * FROM (VALUES (0, 0.5), (1, 0.9), (2, 0.99))
                AS t(i, prob)) p
            ORDER BY "group", p.prob
        """,
        # twin of q_breusch_pagan_value — same two-stage closed form
        "breusch_pagan_value": """
            WITH s AS (
              SELECT extract(hour FROM ts)::DOUBLE AS x, value AS y
              FROM events
              WHERE ts IS NOT NULL AND value IS NOT NULL),
            a1 AS (
              SELECT count(*)::DOUBLE AS n, avg(x) AS mx,
                     avg(y) AS my, covar_pop(x, y) AS cxy,
                     var_pop(x) AS vx
              FROM s),
            u AS (
              SELECT s.x,
                     pow(s.y - a1.my
                         - (a1.cxy / a1.vx) * (s.x - a1.mx), 2)
                       AS u, a1.n
              FROM s, a1),
            a2 AS (
              SELECT any_value(n) AS n, corr(x, u) AS r,
                     covar_pop(x, u) AS cu, var_pop(x) AS vx2
              FROM u)
            SELECT n::BIGINT AS n,
                   round(CASE WHEN vx2 > 0 THEN cu / vx2 END, 6)
                     AS resid_slope,
                   round(r * r, 6) AS r2_resid,
                   round(n * r * r, 6) AS lm_stat,
                   1 AS dof
            FROM a2
        """,
        # twin of q_wilcoxon_user_halves — same paired means, same
        # doubled-average-rank table
        "wilcoxon_user_halves": """
            WITH pairs AS (
              SELECT user_id,
                     avg(CASE WHEN extract(day FROM ts) <= 15
                         THEN value END) AS a,
                     avg(CASE WHEN extract(day FROM ts) > 15
                         THEN value END) AS b
              FROM events
              WHERE ts IS NOT NULL AND value IS NOT NULL
                AND user_id IS NOT NULL
              GROUP BY user_id
              HAVING a IS NOT NULL AND b IS NOT NULL),
            d AS (SELECT b - a AS d FROM pairs),
            nz AS (SELECT sum(CASE WHEN d = 0 THEN 1 ELSE 0 END)
                     AS n_zero FROM d),
            r AS (SELECT abs(d) AS ad,
                         CASE WHEN d > 0 THEN 1.0 ELSE 0.0 END
                           AS pos
                  FROM d WHERE d <> 0),
            vc AS (SELECT ad, count(*)::DOUBLE AS n, sum(pos) AS np
                   FROM r GROUP BY ad),
            rk AS (
              SELECT n, np,
                     np * (2 * coalesce(sum(n) OVER (ORDER BY ad
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) + n + 1) AS w2p,
                     n*n*n - n AS tt
              FROM vc),
            a AS (SELECT sum(n) AS nr, sum(w2p) AS w2,
                         sum(tt) AS ts FROM rk)
            SELECT nr::BIGINT AS n_pairs,
                   (SELECT n_zero FROM nz)::BIGINT AS n_zero,
                   round(w2 / 2.0, 6) AS w_plus,
                   round(nr*(nr+1)/2.0 - w2/2.0, 6) AS w_minus,
                   round(nr*(nr+1)/4.0, 6) AS mean_w,
                   round(nr*(nr+1)*(2*nr+1)/24.0 - ts/48.0, 6)
                     AS var_w,
                   round(CASE WHEN nr*(nr+1)*(2*nr+1)/24.0 - ts/48.0
                              > 0 THEN
                     (w2/2.0 - nr*(nr+1)/4.0)
                     / sqrt(nr*(nr+1)*(2*nr+1)/24.0 - ts/48.0) END,
                     6) AS z
            FROM a
        """,
        # twin of q_hl_shift_lens — same weighted diff grid and
        # boundary-averaging weighted median
        "hl_shift_lens": """
            WITH base AS (
              SELECT n_chars::DOUBLE AS v, lang = 'en' AS s
              FROM documents
              WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
            va AS (SELECT v AS a, count(*)::DOUBLE AS na FROM base
                   WHERE s GROUP BY v),
            vb AS (SELECT v AS b, count(*)::DOUBLE AS nb FROM base
                   WHERE NOT s GROUP BY v),
            cells AS (
              SELECT b - a AS d, sum(na * nb) AS w
              FROM va CROSS JOIN vb GROUP BY b - a),
            c AS (
              SELECT d,
                     sum(w) OVER (ORDER BY d
                       ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(w) OVER (ORDER BY d
                       ROWS UNBOUNDED PRECEDING) - w AS cum_before,
                     sum(w) OVER () AS tw
              FROM cells),
            med AS (
              SELECT (min(d) + max(d)) / 2 AS hl FROM c
              WHERE cum_before <= tw / 2.0 AND cum >= tw / 2.0),
            counts AS (
              SELECT sum(CASE WHEN s THEN 1 ELSE 0 END)::BIGINT
                       AS n_a,
                     sum(CASE WHEN s THEN 0 ELSE 1 END)::BIGINT
                       AS n_b
              FROM base)
            SELECT n_a, n_b, (n_a * n_b)::BIGINT AS n_pairs,
                   round((SELECT hl FROM med), 6) AS hl_shift
            FROM counts
        """,
        # twin of q_ansari_bradley_lens — same closed-form tie-block
        # score means over the distinct-value table
        "ansari_bradley_lens": """
            WITH base AS (
              SELECT n_chars::DOUBLE AS v, doc_id % 2 = 0 AS s
              FROM documents WHERE n_chars IS NOT NULL),
            vc AS (
              SELECT v,
                     sum(CASE WHEN s THEN 1 ELSE 0 END)::DOUBLE
                       AS na,
                     count(*)::DOUBLE AS n
              FROM base GROUP BY v),
            rk AS (
              SELECT na, n,
                     coalesce(sum(n) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cumb,
                     sum(n) OVER () AS nn
              FROM vc),
            sc AS (
              SELECT na, n, nn,
                     -- forward segment: ranks <= floor(N/2)
                     greatest(least(floor(nn/2) - (cumb+1) + 1, n),
                              0) AS fc,
                     cumb + 1 AS lo1
              FROM rk),
            sc2 AS (
              SELECT na, n, nn,
                     (fc * lo1 + fc * (fc - 1) / 2)
                     + ((n - fc) * (nn + 1 - (lo1 + fc))
                        - (n - fc) * (n - fc - 1) / 2) AS bsum
              FROM sc),
            scored AS (SELECT na, n, bsum / n AS sc FROM sc2),
            a AS (
              SELECT sum(na * sc) AS ab, sum(na) AS ta,
                     sum(n) AS tn, sum(n * sc) AS ssum,
                     sum(n * sc * sc) AS ssq
              FROM scored)
            SELECT ta::BIGINT AS n_a, (tn - ta)::BIGINT AS n_b,
                   round(ab, 6) AS ab_stat,
                   round(ta * ssum / tn, 6) AS mean_ab,
                   round(ta * (tn - ta)
                         * (ssq / tn - (ssum / tn) ^ 2)
                         / (tn - 1), 6) AS var_ab,
                   round((ab - ta * ssum / tn)
                         / sqrt(ta * (tn - ta)
                                * (ssq / tn - (ssum / tn) ^ 2)
                                / (tn - 1)), 6) AS z
            FROM a
        """,
        # twin of q_gibberish_sources — same seeded mash injection
        "gibberish_sources": """
            WITH seeded AS (
              SELECT source,
                     CASE WHEN doc_id % 13 = 0
                          THEN text || ' asdfghjklzxcv'
                          ELSE text END AS text
              FROM documents),
            base AS (
              SELECT source AS "group",
                     coalesce((SELECT max(length(r)) FROM unnest(
                       regexp_extract_all(lower(text),
                         '[bcdfghjklmnpqrstvwxz]+')) AS t(r)), 0)
                       AS mr,
                     len(regexp_extract_all(lower(text),
                         '[aeiouy]'))::DOUBLE AS nv,
                     len(regexp_extract_all(lower(text),
                         '[a-z]'))::DOUBLE AS nl
              FROM seeded
              WHERE text IS NOT NULL AND source IS NOT NULL),
            flags AS (
              SELECT "group", mr,
                     nv / nullif(nl, 0) AS vs,
                     CASE WHEN mr >= 7
                          OR nv / nullif(nl, 0) < 0.2
                     THEN 1 ELSE 0 END AS fl
              FROM base)
            SELECT "group", count(*)::BIGINT AS n_docs,
                   sum(fl)::BIGINT AS n_flagged,
                   round(sum(fl) / count(*)::DOUBLE, 6)
                     AS flagged_share,
                   round(avg(vs), 6) AS mean_vowel_share,
                   max(mr)::INT AS max_run_seen
            FROM flags GROUP BY 1 ORDER BY 1
        """,
        # twin of q_hampel_days — same RANGE self-joined
        # neighborhoods, same median/MAD scoring
        "hampel_days": """
            WITH daily AS (
              SELECT ts::DATE AS d, count(*)::DOUBLE AS cnt
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            lo AS (SELECT min(d) AS d0 FROM daily),
            idx AS (SELECT (d - lo.d0)::DOUBLE AS i, cnt AS v
                    FROM daily, lo),
            med AS (
              SELECT a.i, quantile_cont(b.v, 0.5) AS med
              FROM idx a JOIN idx b
                ON b.i BETWEEN a.i - 3 AND a.i + 3
              GROUP BY a.i),
            curve AS (
              SELECT a.i, any_value(a.v) AS v,
                     any_value(m.med) AS med,
                     quantile_cont(abs(b.v - m.med), 0.5) AS mad
              FROM idx a
              JOIN idx b ON b.i BETWEEN a.i - 3 AND a.i + 3
              JOIN med m ON m.i = a.i
              GROUP BY a.i)
            SELECT i AS "order",
                   round(v, 6) AS value, round(med, 6) AS med,
                   round(mad, 6) AS mad,
                   round(CASE WHEN 1.4826 * mad > 0
                     THEN abs(v - med) / (1.4826 * mad) END, 6)
                     AS score,
                   CASE WHEN mad > 0
                        THEN abs(v - med) > 3.0 * 1.4826 * mad
                        ELSE v <> med END AS flagged
            FROM curve ORDER BY i
        """,
        # twin of q_rbo_terms_halves — same deterministic ranking,
        # same suffix tail table
        "rbo_terms_halves": """
            WITH toks AS (
              SELECT doc_id % 2 AS h, t.term
              FROM documents,
                   unnest(regexp_split_to_array(lower(text),
                          '[^a-z]+')) AS t(term)
              WHERE text IS NOT NULL AND length(t.term) >= 3),
            ca AS (SELECT term, count(*) AS n FROM toks WHERE h = 0
                   GROUP BY term),
            cb AS (SELECT term, count(*) AS n FROM toks WHERE h = 1
                   GROUP BY term),
            ra AS (SELECT term, row_number() OVER
                     (ORDER BY n DESC, term) AS r FROM ca
                   QUALIFY r <= 50),
            rb AS (SELECT term, row_number() OVER
                     (ORDER BY n DESC, term) AS r FROM cb
                   QUALIFY r <= 50),
            joined AS (
              SELECT greatest(ra.r, rb.r) AS m
              FROM ra JOIN rb USING (term)),
            depths AS (
              SELECT d, pow(0.9, d - 1) / d AS wd
              FROM (SELECT unnest(generate_series(1, 50)) AS d)),
            tails AS (
              SELECT d AS m,
                     sum(wd) OVER (ORDER BY d ROWS BETWEEN
                       CURRENT ROW AND UNBOUNDED FOLLOWING) AS tail
              FROM depths),
            agg AS (
              SELECT count(*)::BIGINT AS n_common,
                     sum(t.tail) AS tsum
              FROM joined j JOIN tails t ON t.m = j.m)
            SELECT 50 AS k, 0.9::DOUBLE AS p, n_common,
                   round(0.1 * coalesce(tsum, 0), 6) AS rbo
            FROM agg
        """,
        # twin of q_ratio_value_per_click — same user-level moments
        "ratio_value_per_click": """
            WITH per_user AS (
              SELECT user_id,
                     sum(CASE WHEN event_type = 'purchase'
                         THEN value ELSE 0 END) AS x,
                     sum(CASE WHEN event_type = 'click'
                         THEN 1.0 ELSE 0 END) AS y
              FROM events WHERE user_id IS NOT NULL
              GROUP BY user_id),
            a AS (
              SELECT count(*)::DOUBLE AS n, avg(x) AS mx,
                     avg(y) AS my, var_samp(x) AS vx,
                     var_samp(y) AS vy, covar_samp(x, y) AS cxy
              FROM per_user
              WHERE x IS NOT NULL AND y IS NOT NULL)
            SELECT n::BIGINT AS n,
                   round(CASE WHEN my > 0 AND n >= 2
                     THEN mx / my END, 6) AS ratio,
                   round(CASE WHEN my > 0 AND n >= 2 THEN
                     sqrt(greatest((vx + pow(mx/my, 2) * vy
                           - 2 * (mx/my) * cxy) / (n * my * my),
                          0)) END, 6) AS se,
                   round(CASE WHEN my > 0 AND n >= 2 THEN
                     mx/my - 1.96 * sqrt(greatest((vx
                       + pow(mx/my, 2)*vy - 2*(mx/my)*cxy)
                       / (n*my*my), 0)) END, 6) AS ci_lo,
                   round(CASE WHEN my > 0 AND n >= 2 THEN
                     mx/my + 1.96 * sqrt(greatest((vx
                       + pow(mx/my, 2)*vy - 2*(mx/my)*cxy)
                       / (n*my*my), 0)) END, 6) AS ci_hi
            FROM a
        """,
        # twin of q_float_anomalies — same seeded IEEE defects; the
        # -0.0 probe is the string cast on both engines
        "float_anomalies": """
            WITH seeded AS (
              SELECT CASE
                       WHEN event_id % 17 = 0 THEN 'nan'::DOUBLE
                       WHEN event_id % 19 = 0 THEN 'inf'::DOUBLE
                       WHEN event_id % 23 = 0 THEN -0.0::DOUBLE
                       WHEN event_id % 29 = 0 THEN 1e-310::DOUBLE
                       ELSE value END AS v
              FROM events),
            f AS (
              SELECT v,
                     (v IS NULL) AS is_null,
                     coalesce(isnan(v), FALSE) AS is_nan,
                     coalesce(v = 'inf'::DOUBLE, FALSE) AS posinf,
                     coalesce(v = '-inf'::DOUBLE, FALSE) AS neginf,
                     coalesce(v = 0 AND v::VARCHAR LIKE '-%',
                              FALSE) AS negzero,
                     coalesce(abs(v) > 0 AND abs(v) <
                       2.2250738585072014e-308, FALSE) AS subn
              FROM seeded)
            SELECT count(*)::BIGINT AS n,
                   sum(is_null::INT)::BIGINT AS n_null,
                   sum(is_nan::INT)::BIGINT AS n_nan,
                   sum(posinf::INT)::BIGINT AS n_posinf,
                   sum(neginf::INT)::BIGINT AS n_neginf,
                   sum(negzero::INT)::BIGINT AS n_negzero,
                   sum(subn::INT)::BIGINT AS n_subnormal,
                   sum((NOT (is_null OR is_nan OR posinf OR neginf
                        OR negzero OR subn))::INT)::BIGINT
                     AS n_clean
            FROM f
        """,
        # twin of q_attribution_purchase — same prior-touch pairs,
        # same per-conversion ranks and credit models
        "attribution_purchase": """
            WITH convs AS (
              SELECT user_id AS e, epoch(ts) AS tc FROM events
              WHERE event_type = 'purchase'
                AND user_id IS NOT NULL AND ts IS NOT NULL),
            touches AS (
              SELECT user_id AS e, epoch(ts) AS tt,
                     event_type AS ty
              FROM events
              WHERE event_type IN ('click', 'view')
                AND user_id IS NOT NULL AND ts IS NOT NULL),
            pairs AS (
              SELECT c.e, c.tc, t.tt, t.ty
              FROM convs c JOIN touches t USING (e)
              WHERE t.tt < c.tc),
            scored AS (
              SELECT ty,
                     row_number() OVER (PARTITION BY e, tc
                       ORDER BY tt, ty) AS rn,
                     count(*) OVER (PARTITION BY e, tc) AS kk
              FROM pairs),
            credits AS (
              SELECT ty,
                     CASE WHEN rn = 1 THEN 1.0 ELSE 0.0 END AS ft,
                     CASE WHEN rn = kk THEN 1.0 ELSE 0.0 END AS lt,
                     1.0 / kk AS lin,
                     CASE WHEN kk = 1 THEN 1.0
                          WHEN kk = 2 THEN 0.5
                          WHEN rn = 1 OR rn = kk THEN 0.4
                          ELSE 0.2 / (kk - 2) END AS u
              FROM scored)
            SELECT ty AS touch_type, count(*)::BIGINT AS n_touches,
                   round(sum(ft), 6) AS ft_credit,
                   round(sum(lt), 6) AS lt_credit,
                   round(sum(lin), 6) AS linear_credit,
                   round(sum(u), 6) AS u_credit
            FROM credits GROUP BY ty ORDER BY ty
        """,
        # twin of q_cvar_value_types — same threshold-inclusive tail
        "cvar_value_types": """
            WITH base AS (
              SELECT event_type AS g, value AS v FROM events
              WHERE value IS NOT NULL AND event_type IS NOT NULL),
            q AS (SELECT g, quantile_cont(v, 0.95) AS var_q,
                         count(*)::BIGINT AS n
                  FROM base GROUP BY g)
            SELECT b.g AS "group", any_value(q.n) AS n,
                   round(any_value(q.var_q), 6) AS var_q,
                   round(avg(b.v), 6) AS cvar,
                   count(*)::BIGINT AS tail_n
            FROM base b JOIN q ON q.g = b.g
            WHERE b.v >= q.var_q
            GROUP BY b.g ORDER BY b.g
        """,
        # twin of q_encoding_advisor — same write-order lag probes
        "encoding_advisor": """
            WITH s AS (
              SELECT event_type, user_id, event_id,
                     lag(event_type) OVER (ORDER BY event_id)
                       AS l_et,
                     lag(user_id) OVER (ORDER BY event_id) AS l_u,
                     lag(event_id) OVER (ORDER BY event_id) AS l_id
              FROM events),
            a AS (
              SELECT
                count(event_type)::DOUBLE AS n_et,
                count(DISTINCT event_type)::DOUBLE AS d_et,
                sum(CASE WHEN event_type IS DISTINCT FROM l_et
                    THEN 1 ELSE 0 END)::DOUBLE AS runs_et,
                avg(CASE WHEN l_et IS NULL THEN NULL
                    WHEN event_type >= l_et THEN 1.0 ELSE 0.0 END)
                  AS ms_et,
                count(user_id)::DOUBLE AS n_u,
                count(DISTINCT user_id)::DOUBLE AS d_u,
                sum(CASE WHEN user_id IS DISTINCT FROM l_u
                    THEN 1 ELSE 0 END)::DOUBLE AS runs_u,
                avg(CASE WHEN l_u IS NULL THEN NULL
                    WHEN user_id >= l_u THEN 1.0 ELSE 0.0 END)
                  AS ms_u,
                count(event_id)::DOUBLE AS n_id,
                count(DISTINCT event_id)::DOUBLE AS d_id,
                sum(CASE WHEN event_id IS DISTINCT FROM l_id
                    THEN 1 ELSE 0 END)::DOUBLE AS runs_id,
                avg(CASE WHEN l_id IS NULL THEN NULL
                    WHEN event_id >= l_id THEN 1.0 ELSE 0.0 END)
                  AS ms_id
              FROM s)
            SELECT * FROM (
              SELECT 'event_type' AS "column", n_et::BIGINT AS n,
                     d_et::BIGINT AS n_distinct,
                     round(d_et / n_et, 6) AS distinct_ratio,
                     round(n_et / runs_et, 6) AS avg_run_len,
                     round(ms_et, 6) AS monotone_share,
                     CASE WHEN n_et / runs_et >= 4 THEN 'rle'
                          WHEN d_et / n_et < 0.01 THEN 'dict'
                          WHEN ms_et > 0.99 THEN 'delta'
                          ELSE 'plain' END AS suggestion
              FROM a
              UNION ALL
              SELECT 'user_id', n_u::BIGINT, d_u::BIGINT,
                     round(d_u / n_u, 6), round(n_u / runs_u, 6),
                     round(ms_u, 6),
                     CASE WHEN n_u / runs_u >= 4 THEN 'rle'
                          WHEN d_u / n_u < 0.01 THEN 'dict'
                          WHEN ms_u > 0.99 THEN 'delta'
                          ELSE 'plain' END
              FROM a
              UNION ALL
              SELECT 'event_id', n_id::BIGINT, d_id::BIGINT,
                     round(d_id / n_id, 6), round(n_id / runs_id, 6),
                     round(ms_id, 6),
                     CASE WHEN n_id / runs_id >= 4 THEN 'rle'
                          WHEN d_id / n_id < 0.01 THEN 'dict'
                          WHEN ms_id > 0.99 THEN 'delta'
                          ELSE 'plain' END
              FROM a
            ) ORDER BY "column"
        """,
        # twin of q_breusch_godfrey_daily — same residual lag pass
        "breusch_godfrey_daily": """
            WITH daily AS (
              SELECT ts::DATE AS d, count(*)::DOUBLE AS cnt
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            lo AS (SELECT min(d) AS d0 FROM daily),
            idx AS (SELECT (d - lo.d0)::DOUBLE AS i, cnt AS y
                    FROM daily, lo),
            a1 AS (SELECT avg(i) AS mx, avg(y) AS my,
                          covar_pop(i, y) AS cxy, var_pop(i) AS vx
                   FROM idx),
            res AS (
              SELECT i AS x,
                     y - a1.my - (a1.cxy / a1.vx) * (i - a1.mx)
                       AS e
              FROM idx, a1),
            lagd AS (
              SELECT x, e, lag(e) OVER (ORDER BY x) AS el
              FROM res QUALIFY el IS NOT NULL),
            a2 AS (SELECT count(*)::DOUBLE AS n,
                          corr(e, x) AS r1, corr(e, el) AS r2,
                          corr(x, el) AS r12
                   FROM lagd)
            SELECT n::BIGINT AS n,
                   round((r1*r1 + r2*r2 - 2*r1*r2*r12)
                         / (1 - r12*r12), 6) AS r2_aux,
                   round(n * (r1*r1 + r2*r2 - 2*r1*r2*r12)
                         / (1 - r12*r12), 6) AS lm_stat,
                   1 AS dof
            FROM a2
        """,
        # twin of q_yuen_trimmed_lens — same exact order-statistic
        # thresholds and winsorized close
        "yuen_trimmed_lens": """
            WITH base AS (
              SELECT n_chars::DOUBLE AS v, lang = 'en' AS s
              FROM documents
              WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
            ns AS (SELECT s, count(*)::DOUBLE AS n FROM base
                   GROUP BY s),
            vc AS (SELECT s, v, count(*)::DOUBLE AS c FROM base
                   GROUP BY s, v),
            cum AS (
              SELECT s, v,
                     sum(c) OVER (PARTITION BY s ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM vc),
            thr AS (
              SELECT ns.s, ns.n, floor(ns.n * 0.2) AS g,
                     (SELECT min(v) FROM cum
                      WHERE cum.s = ns.s
                        AND cum.cum >= floor(ns.n * 0.2) + 1)
                       AS lo,
                     (SELECT min(v) FROM cum
                      WHERE cum.s = ns.s
                        AND cum.cum >= ns.n - floor(ns.n * 0.2))
                       AS hi
              FROM ns),
            wins AS (
              SELECT b.s, t.n, t.g, t.lo, t.hi,
                     greatest(least(b.v, t.hi), t.lo) AS vw
              FROM base b JOIN thr t ON t.s = b.s),
            per AS (
              SELECT s, any_value(n) AS n, any_value(g) AS g,
                     any_value(lo) AS lo, any_value(hi) AS hi,
                     avg(vw) AS wm, var_samp(vw) AS wv
              FROM wins GROUP BY s),
            sided AS (
              SELECT s, n, n - 2*g AS h,
                     (n * wm - g * lo - g * hi) / (n - 2*g) AS tm,
                     (n - 1) * wv / ((n - 2*g) * (n - 2*g - 1))
                       AS d
              FROM per),
            j AS (
              SELECT a.n AS n_a, b.n AS n_b, a.h AS h_a,
                     b.h AS h_b, a.tm AS tm_a, b.tm AS tm_b,
                     a.d AS d_a, b.d AS d_b
              FROM (SELECT * FROM sided WHERE s) a,
                   (SELECT * FROM sided WHERE NOT s) b)
            SELECT n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
                   h_a::BIGINT AS h_a, h_b::BIGINT AS h_b,
                   round(tm_a, 6) AS tm_a, round(tm_b, 6) AS tm_b,
                   round(CASE WHEN d_a + d_b > 0 THEN
                     (tm_a - tm_b) / sqrt(d_a + d_b) END, 6)
                     AS t_stat,
                   round(1.0 / (pow(d_a/(d_a+d_b), 2) / (h_a - 1)
                         + pow(1 - d_a/(d_a+d_b), 2) / (h_b - 1)),
                         6) AS dof
            FROM j
        """,
        # twin of q_cluster_robust_hour — same CR1 sandwich sums
        "cluster_robust_hour": """
            WITH s AS (
              SELECT extract(hour FROM ts)::DOUBLE AS x,
                     value AS y, user_id AS g
              FROM events
              WHERE ts IS NOT NULL AND value IS NOT NULL
                AND user_id IS NOT NULL),
            a1 AS (SELECT count(*)::DOUBLE AS n, avg(x) AS mx,
                          avg(y) AS my, covar_pop(x, y) AS cxy,
                          var_pop(x) AS vx
                   FROM s),
            per_g AS (
              SELECT s.g,
                     sum((s.x - a1.mx) * (s.y - a1.my
                         - (a1.cxy/a1.vx) * (s.x - a1.mx))) AS ug,
                     sum(pow(s.x - a1.mx, 2)) AS x2g,
                     sum(pow(s.y - a1.my
                         - (a1.cxy/a1.vx) * (s.x - a1.mx), 2))
                       AS e2g,
                     any_value(a1.n) AS n,
                     any_value(a1.cxy) AS cxy,
                     any_value(a1.vx) AS vx
              FROM s, a1 GROUP BY s.g),
            a2 AS (
              SELECT any_value(n) AS n, count(*)::DOUBLE AS gg,
                     sum(ug * ug) AS u2, sum(x2g) AS sxx,
                     sum(e2g) AS sse, any_value(cxy) AS cxy,
                     any_value(vx) AS vx
              FROM per_g)
            SELECT n::BIGINT AS n, gg::BIGINT AS n_clusters,
                   round(cxy / vx, 6) AS slope,
                   round(sqrt(sse / (n - 2) / sxx), 6) AS se_naive,
                   round(sqrt(gg/(gg-1) * (n-1)/(n-2) * u2
                              / (sxx * sxx)), 6) AS se_cluster,
                   round(sqrt(gg/(gg-1) * (n-1)/(n-2) * u2
                              / (sxx * sxx))
                         / sqrt(sse / (n - 2) / sxx), 6)
                     AS inflation
            FROM a2
        """,
        # twin of q_permutation_value_weekend — same md5 coin flips
        "permutation_value_weekend": """
            WITH base AS (
              SELECT value AS v,
                     extract(dow FROM ts) IN (0, 6) AS s,
                     event_id::VARCHAR AS i
              FROM events
              WHERE ts IS NOT NULL AND value IS NOT NULL),
            obs AS (
              SELECT avg(v) FILTER (s) - avg(v) FILTER (NOT s)
                       AS d_obs,
                     sum(CASE WHEN s THEN 1 ELSE 0 END)::BIGINT
                       AS n_a,
                     sum(CASE WHEN s THEN 0 ELSE 1 END)::BIGINT
                       AS n_b
              FROM base),
            perms AS (
              SELECT b.v, p.b,
                     ((('0x' || substr(md5(b.i), (p.b // 4) + 1,
                        1))::BIGINT >> (p.b % 4)) & 1) = 0 AS f
              FROM base b CROSS JOIN
                   (SELECT unnest(generate_series(0, 63)) AS b) p),
            deltas AS (
              SELECT b, avg(v) FILTER (f) - avg(v) FILTER (NOT f)
                       AS d
              FROM perms GROUP BY b),
            agg AS (
              SELECT sum(CASE WHEN abs(d) >=
                     (SELECT abs(d_obs) FROM obs)
                     THEN 1 ELSE 0 END)::BIGINT AS n_ge
              FROM deltas)
            SELECT o.n_a, o.n_b, round(o.d_obs, 6) AS delta_obs,
                   64 AS n_perm, a.n_ge,
                   round((a.n_ge + 1) / 65.0, 6) AS p_value
            FROM obs o, agg a
        """,
        # twin of q_common_prefix_sources — same (min, max) LCP
        "common_prefix_sources": """
            WITH seeded AS (
              SELECT source,
                     CASE WHEN source IN ('src1', 'src2', 'src3')
                          THEN 'NEWSLETTER | subscribe now || '
                               || text
                          ELSE text END AS text
              FROM documents),
            agg AS (
              SELECT source AS "group", count(*)::BIGINT AS n_docs,
                     min(text) AS lo, max(text) AS hi
              FROM seeded
              WHERE text IS NOT NULL AND source IS NOT NULL
              GROUP BY 1),
            scored AS (
              SELECT "group", n_docs, lo, hi,
                     least(coalesce(
                       (SELECT min(p) FROM unnest(
                          generate_series(1, 100)) AS t(p)
                        WHERE substr(lo, p, 1) <> substr(hi, p, 1))
                       - 1, 100),
                       least(length(lo), length(hi), 100))
                       AS lcp
              FROM agg)
            SELECT "group", n_docs, lcp::BIGINT AS lcp_len,
                   substr(lo, 1, least(lcp, 20)::INT) AS lcp_head
            FROM scored ORDER BY "group"
        """,
        # twin of q_conformal_value_hour — same md5-bit split, same
        # exact conformal order statistic
        "conformal_value_hour": """
            WITH base AS (
              SELECT extract(hour FROM ts)::DOUBLE AS x,
                     value AS y,
                     (('0x' || substr(md5(event_id::VARCHAR), 1, 1))
                      ::BIGINT & 1) = 0 AS calib
              FROM events
              WHERE ts IS NOT NULL AND value IS NOT NULL),
            fit AS (
              SELECT count(*)::BIGINT AS n_fit, avg(x) AS mx,
                     avg(y) AS my, covar_pop(x, y) AS cxy,
                     var_pop(x) AS vx
              FROM base WHERE NOT calib),
            cal AS (
              SELECT abs(b.y - f.my - (f.cxy / f.vx)
                         * (b.x - f.mx)) AS r
              FROM base b, fit f WHERE b.calib),
            nc AS (SELECT count(*)::BIGINT AS n_c FROM cal),
            cum AS (
              SELECT r, sum(c) OVER (ORDER BY r
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM (SELECT r, count(*) AS c FROM cal GROUP BY r)),
            q AS (
              SELECT min(r) AS q_hat FROM cum, nc
              WHERE cum >= least(ceil((nc.n_c + 1) * 0.9),
                                 nc.n_c)),
            cov AS (
              SELECT avg(CASE WHEN cal.r <= q.q_hat THEN 1.0
                         ELSE 0.0 END) AS coverage
              FROM cal, q)
            SELECT f.n_fit, (SELECT n_c FROM nc) AS n_calib,
                   round(f.cxy / f.vx, 6) AS slope,
                   round(f.my - (f.cxy / f.vx) * f.mx, 6)
                     AS intercept,
                   round((SELECT q_hat FROM q), 6) AS q_hat,
                   round((SELECT coverage FROM cov), 6) AS coverage
            FROM fit f
        """,
        # twin of q_bernstein_error_days — same closed-form bound
        "bernstein_error_days": """
            WITH base AS (
              SELECT ts::DATE::VARCHAR AS g,
                     (event_type = 'error')::INT::DOUBLE AS v
              FROM events
              WHERE ts IS NOT NULL AND event_type IS NOT NULL),
            a AS (
              SELECT g, count(*)::DOUBLE AS n,
                     sum(CASE WHEN v < 0 OR v > 1 THEN 1
                         ELSE 0 END)::BIGINT AS n_oob,
                     avg(v) AS m, var_samp(v) AS s2
              FROM base GROUP BY g)
            SELECT g AS "group", n::BIGINT AS n, n_oob,
                   round(m, 6) AS mean, round(s2, 6) AS var,
                   round(sqrt(2 * s2 * ln(3.0/0.05) / n)
                         + 3 * 1.0 * ln(3.0/0.05) / n, 6)
                     AS eb_half,
                   round(greatest(m - (sqrt(2*s2*ln(3.0/0.05)/n)
                         + 3*ln(3.0/0.05)/n), 0.0), 6) AS lo_bound,
                   round(least(m + (sqrt(2*s2*ln(3.0/0.05)/n)
                         + 3*ln(3.0/0.05)/n), 1.0), 6) AS hi_bound
            FROM a ORDER BY g
        """,
        # twin of q_hyphenation_sources — same seeded artifacts;
        # soft hyphen built via chr(173) so no invisible literals
        "hyphenation_sources": """
            WITH seeded AS (
              SELECT source, n_chars,
                     CASE WHEN doc_id % 9 = 0
                          THEN text || ' exam-' || chr(10)
                               || 'ple hy-' || chr(10) || 'phen'
                          WHEN doc_id % 15 = 0
                          THEN text || 'soft' || chr(173) || 'hyphen'
                          ELSE text END AS text
              FROM documents),
            base AS (
              SELECT source AS "group",
                     len(regexp_extract_all(text,
                       '[a-z]-' || chr(10) || '[a-z]')) AS b,
                     len(regexp_extract_all(text,
                       '-' || chr(10))) AS d,
                     len(regexp_extract_all(text, chr(173))) AS s,
                     n_chars::DOUBLE AS cc
              FROM seeded
              WHERE text IS NOT NULL AND source IS NOT NULL)
            SELECT "group", count(*)::BIGINT AS n_docs,
                   sum(b)::BIGINT AS hyphen_breaks,
                   sum(d)::BIGINT AS dangling_hyphen_lines,
                   sum(s)::BIGINT AS soft_hyphens,
                   sum(CASE WHEN b + d + s > 0 THEN 1
                       ELSE 0 END)::BIGINT AS docs_affected,
                   round((sum(b) + sum(d) + sum(s)) * 1000.0
                         / nullif(sum(cc), 0), 6)
                     AS artifacts_per_kchar
            FROM base GROUP BY 1 ORDER BY 1
        """,
        # twin of q_basket_rules_types — same distinct-first baskets
        "basket_rules_types": """
            WITH items AS (
              SELECT DISTINCT user_id::VARCHAR || '|'
                       || ts::DATE::VARCHAR AS bk,
                     event_type AS it
              FROM events
              WHERE ts IS NOT NULL AND user_id IS NOT NULL
                AND event_type IS NOT NULL),
            nb AS (SELECT count(DISTINCT bk)::DOUBLE AS n_baskets
                   FROM items),
            per_item AS (SELECT it, count(*)::DOUBLE AS ni
                         FROM items GROUP BY it),
            pairs AS (
              SELECT a.it AS ia, b.it AS ib,
                     count(*)::DOUBLE AS nab
              FROM items a JOIN items b ON a.bk = b.bk
              WHERE a.it <> b.it GROUP BY a.it, b.it),
            j AS (
              SELECT p.ia, p.ib, p.nab, x.ni AS na, y.ni AS nbi,
                     nb.n_baskets
              FROM pairs p
              JOIN per_item x ON x.it = p.ia
              JOIN per_item y ON y.it = p.ib, nb)
            SELECT ia AS antecedent, ib AS consequent,
                   nab::BIGINT AS n_both,
                   round(nab / n_baskets, 6) AS support,
                   round(nab / na, 6) AS confidence,
                   round((nab / na) / (nbi / n_baskets), 6) AS lift
            FROM j WHERE nab / n_baskets >= 0.05
            ORDER BY antecedent, consequent
        """,
        # twin of q_dkw_len_band — same closed-form epsilon
        "dkw_len_band": """
            WITH base AS (SELECT n_chars::DOUBLE AS v
                          FROM documents WHERE n_chars IS NOT NULL),
            a AS (
              SELECT count(*)::DOUBLE AS n, """ + ", ".join(
            f"quantile_cont(v, {k / 10.0}) AS q{k}"
            for k in range(1, 10)) + """
              FROM base)
            SELECT * FROM (""" + " UNION ALL ".join(
            f"""SELECT {k * 10} AS decile,
                   round(q{k}, 6) AS value,
                   round(greatest({k / 10.0}
                     - sqrt(ln(2.0/0.05)/(2*n)), 0.0), 6) AS p_lo,
                   round(least({k / 10.0}
                     + sqrt(ln(2.0/0.05)/(2*n)), 1.0), 6) AS p_hi,
                   round(sqrt(ln(2.0/0.05)/(2*n)), 6) AS epsilon
                FROM a"""
            for k in range(1, 10)) + """
            ) ORDER BY decile
        """,
        # twin of q_typosquat_hosts — same seeded spoofs, same
        # top-k broadcast levenshtein pass
        "typosquat_hosts": """
            WITH seeded AS (
              SELECT CASE WHEN doc_id % 97 = 0
                     THEN 'h0st' || (doc_id % 13)::VARCHAR
                          || '.example.com'
                     ELSE 'host' || (doc_id % 13)::VARCHAR
                          || '.example.com' END AS host
              FROM documents),
            counts AS (SELECT host AS h, count(*)::BIGINT AS c
                       FROM seeded GROUP BY host),
            top AS (SELECT h AS legit, c AS n_legit FROM counts
                    ORDER BY c DESC, h LIMIT 13),
            cand AS (SELECT h AS suspect, c AS n_suspect
                     FROM counts)
            SELECT suspect, legit,
                   levenshtein(suspect, legit)::INT AS dist,
                   n_suspect, n_legit,
                   round(n_suspect / n_legit::DOUBLE, 6)
                     AS volume_ratio
            FROM cand CROSS JOIN top
            WHERE suspect <> legit
              AND levenshtein(suspect, legit) <= 2
              AND n_suspect <= 0.1 * n_legit
            ORDER BY suspect, legit
        """,
        # twin of q_krippendorff_langs — same variable-rater seed,
        # same coincidence-form disagreements
        "krippendorff_langs": """
            WITH d AS (SELECT doc_id, lang FROM documents
                       WHERE lang IS NOT NULL),
            ratings AS (
              SELECT doc_id AS u, lang AS c FROM d
              UNION ALL
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN 'unk'
                          ELSE lang END
              FROM d WHERE doc_id % 2 = 0
              UNION ALL
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN 'en'
                          ELSE lang END
              FROM d WHERE doc_id % 3 = 0),
            cells AS (SELECT u, c, count(*)::DOUBLE AS n
                      FROM ratings GROUP BY u, c),
            per_u AS (SELECT u, sum(n) AS m FROM cells GROUP BY u),
            pair AS (SELECT cells.*, per_u.m
                     FROM cells JOIN per_u USING (u)
                     WHERE per_u.m > 1),
            do_terms AS (
              SELECT u, any_value(m) AS m,
                     sum(n * (m - n) / (m - 1)) AS du
              FROM pair GROUP BY u),
            a1 AS (SELECT count(*)::BIGINT AS n_pairable,
                          sum(m) AS nn, sum(du) AS d_o_sum
                   FROM do_terms),
            marg AS (
              SELECT sum(nc * nc) AS nc2, sum(nc) AS ntot
              FROM (SELECT c, sum(n) AS nc FROM pair GROUP BY c)),
            ni AS (SELECT count(DISTINCT u)::BIGINT AS n_items
                   FROM cells)
            SELECT ni.n_items, a1.n_pairable,
                   a1.nn::BIGINT AS n_ratings,
                   round(a1.d_o_sum / a1.nn, 6) AS d_o,
                   round((1.0 - marg.nc2 / (marg.ntot * marg.ntot))
                         * marg.ntot / (marg.ntot - 1), 6) AS d_e,
                   round(1.0 - (a1.d_o_sum / a1.nn)
                         / ((1.0 - marg.nc2
                             / (marg.ntot * marg.ntot))
                            * marg.ntot / (marg.ntot - 1)), 6)
                     AS alpha
            FROM a1, marg, ni
        """,
        # twin of q_dalenius_len_strata — same bins, same cum-sqrt
        "dalenius_len_strata": """
            WITH base AS (SELECT n_chars::DOUBLE AS v
                          FROM documents WHERE n_chars IS NOT NULL),
            ext AS (SELECT min(v) AS lo, max(v) AS hi,
                           count(*)::DOUBLE AS n FROM base),
            binned AS (
              SELECT least(floor((v - ext.lo)
                       / ((ext.hi - ext.lo) / 50)), 49)::BIGINT
                       AS b,
                     count(*)::DOUBLE AS c,
                     any_value(ext.lo) AS lo,
                     any_value(ext.hi) AS hi,
                     any_value(ext.n) AS n
              FROM base, ext GROUP BY 1),
            scored AS (
              SELECT b, c, lo, hi, n,
                     sum(sqrt(c)) OVER (ORDER BY b
                       ROWS UNBOUNDED PRECEDING) AS csf,
                     sum(sqrt(c)) OVER () AS tsf
              FROM binned),
            tagged AS (
              SELECT least(floor(csf / tsf * 4 + 1e-12), 3)::BIGINT
                       AS stratum,
                     b, c, lo, hi, n,
                     (hi - lo) / 50 AS w
              FROM scored),
            per AS (
              SELECT stratum,
                     any_value(lo) + min(b) * any_value(w)
                       AS lo_edge,
                     any_value(lo) + (max(b) + 1) * any_value(w)
                       AS hi_edge_raw,
                     max(hi) AS vmax, sum(c) AS n_rows,
                     any_value(n) AS n
              FROM tagged GROUP BY stratum)
            SELECT stratum, round(lo_edge, 6) AS lo_edge,
                   round(CASE WHEN stratum = 3 THEN vmax
                         ELSE hi_edge_raw END, 6) AS hi_edge,
                   n_rows::BIGINT AS n_rows,
                   round(n_rows / n, 6) AS share
            FROM per ORDER BY stratum
        """,
        # twin of q_median_rollup_bias — same three medians
        "median_rollup_bias": """
            WITH base AS (
              SELECT lang AS g, n_chars::DOUBLE AS v
              FROM documents
              WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
            per_g AS (SELECT g, quantile_cont(v, 0.5) AS med,
                             count(*) AS ng
                      FROM base GROUP BY g),
            ga AS (SELECT count(*)::BIGINT AS n_groups,
                          sum(ng)::BIGINT AS n,
                          avg(med) AS mom,
                          quantile_cont(med, 0.5) AS mmed
                   FROM per_g),
            gl AS (SELECT quantile_cont(v, 0.5) AS gmed FROM base)
            SELECT ga.n, ga.n_groups,
                   round(gl.gmed, 6) AS global_median,
                   round(ga.mom, 6) AS mean_of_medians,
                   round(ga.mmed, 6) AS median_of_medians,
                   round(greatest(abs(ga.mom - gl.gmed),
                                  abs(ga.mmed - gl.gmed)), 6)
                     AS max_abs_gap
            FROM ga, gl
        """,
        # twin of q_cochran_q_rules — same three derived rulesets
        "cochran_q_rules": """
            WITH rows_ AS (
              SELECT doc_id AS i, t.t,
                     CASE t.t WHEN 'v150' THEN n_chars >= 150
                              WHEN 'v250' THEN n_chars >= 250
                              ELSE n_chars >= 350
                     END::INT::DOUBLE AS x
              FROM documents CROSS JOIN
                   (SELECT unnest(['v150','v250','v350']) AS t) t
              WHERE n_chars IS NOT NULL),
            per_i AS (SELECT i, count(DISTINCT t) AS kt,
                             sum(x) AS li
                      FROM rows_ GROUP BY i),
            k AS (SELECT count(DISTINCT t)::DOUBLE AS k
                  FROM rows_),
            complete AS (SELECT per_i.* FROM per_i, k
                         WHERE per_i.kt = k.k),
            per_t AS (
              SELECT r.t, sum(r.x) AS gj
              FROM rows_ r JOIN complete c ON c.i = r.i
              GROUP BY r.t),
            at AS (SELECT count(*)::DOUBLE AS k, sum(gj) AS gsum,
                          sum(gj * gj) AS g2
                   FROM per_t),
            ai AS (SELECT count(*)::BIGINT AS n_items,
                          sum(li) AS lsum, sum(li * li) AS l2
                   FROM complete),
            drp AS (SELECT count(*)::BIGINT AS n_dropped
                    FROM per_i, k WHERE per_i.kt <> k.k)
            SELECT ai.n_items, drp.n_dropped,
                   at.k::BIGINT AS k_treat,
                   round(CASE WHEN at.k * ai.lsum - ai.l2 > 0 THEN
                     at.k * (at.k - 1)
                     * (at.g2 - at.gsum * at.gsum / at.k)
                     / (at.k * ai.lsum - ai.l2) END, 6) AS q_stat,
                   (at.k - 1)::BIGINT AS dof
            FROM at, ai, drp
        """,
        # twin of q_turning_points_daily — same strict extrema
        "turning_points_daily": """
            WITH daily AS (
              SELECT ts::DATE AS d, count(*)::DOUBLE AS x
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            s AS (
              SELECT x, lag(x) OVER (ORDER BY d) AS lx,
                     lead(x) OVER (ORDER BY d) AS nx
              FROM daily),
            a AS (
              SELECT count(*)::DOUBLE AS n,
                     sum(CASE WHEN lx IS NOT NULL
                              AND nx IS NOT NULL
                              AND ((x > lx AND x > nx)
                                   OR (x < lx AND x < nx))
                         THEN 1 ELSE 0 END)::BIGINT AS t_points
              FROM s)
            SELECT n::BIGINT AS n, t_points,
                   round(2.0 * (n - 2) / 3.0, 6) AS expect_t,
                   round((16.0 * n - 29.0) / 90.0, 6) AS var_t,
                   round((t_points - 2.0 * (n - 2) / 3.0)
                         / sqrt((16.0 * n - 29.0) / 90.0), 6) AS z
            FROM a
        """,
        # twin of q_last_digit_values — same cents digit histogram
        "last_digit_values": """
            WITH base AS (
              SELECT (round(value * 100)::BIGINT % 10 + 10) % 10
                       AS d
              FROM events WHERE value IS NOT NULL),
            cnt AS (SELECT d, count(*)::DOUBLE AS c FROM base
                    GROUP BY d),
            a AS (
              SELECT sum(c) AS n, sum(c * c) AS c2,
                     max(CASE WHEN d = 0 THEN c END) AS c0,
                     max(CASE WHEN d = 5 THEN c END) AS c5,
                     max(c) AS cmax
              FROM cnt)
            SELECT n::BIGINT AS n,
                   round(c2 / (n / 10.0) - n, 6) AS chi2,
                   9 AS dof,
                   round(coalesce(c0, 0) / n, 6) AS share_0,
                   round(coalesce(c5, 0) / n, 6) AS share_5,
                   round(cmax / n, 6) AS max_digit_share
            FROM a
        """,
        # twin of q_stump_split_len — same suffix sweep, same
        # lowest-threshold tie-break
        "stump_split_len": """
            WITH b AS (
              SELECT n_chars::DOUBLE AS s, (lang = 'en')::INT AS y
              FROM documents
              WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
            per_s AS (SELECT s, sum(y)::DOUBLE AS p,
                             sum(1 - y)::DOUBLE AS q
                      FROM b GROUP BY s),
            tot AS (SELECT sum(p) AS pp, sum(q) AS qq FROM per_s),
            sw AS (
              SELECT s,
                     sum(p) OVER (ORDER BY s DESC
                       ROWS UNBOUNDED PRECEDING) AS rp,
                     sum(q) OVER (ORDER BY s DESC
                       ROWS UNBOUNDED PRECEDING) AS rq
              FROM per_s),
            scored AS (
              SELECT s, rp, rq, t.pp, t.qq,
                     t.pp + t.qq AS n, rp + rq AS nr,
                     t.pp + t.qq - rp - rq AS nl,
                     t.pp - rp AS lp, t.qq - rq AS lq
              FROM sw, tot t),
            g AS (
              SELECT s, nl, nr,
                     1.0 - pow(pp/n, 2) - pow(qq/n, 2) AS gp,
                     (nl/n) * (CASE WHEN nl > 0 THEN
                        1.0 - pow(lp/nl, 2) - pow(lq/nl, 2)
                        ELSE 0 END)
                     + (nr/n) * (CASE WHEN nr > 0 THEN
                        1.0 - pow(rp/nr, 2) - pow(rq/nr, 2)
                        ELSE 0 END) AS gs
              FROM scored WHERE nl > 0 AND nr > 0),
            best AS (
              SELECT *, gp - gs AS gain FROM g
              ORDER BY gain DESC, s ASC LIMIT 1)
            SELECT round(s, 6) AS threshold,
                   nl::BIGINT AS n_left, nr::BIGINT AS n_right,
                   round(gp, 6) AS gini_parent,
                   round(gs, 6) AS gini_split,
                   round(gain, 6) AS gain
            FROM best
        """,
        # twin of q_context_truncation — same conditional sums
        "context_truncation": """
            WITH b AS (
              SELECT length(regexp_split_to_array(text, '\\s+'))
                       ::DOUBLE AS t
              FROM documents WHERE text IS NOT NULL),
            a AS (
              SELECT count(*)::BIGINT AS n, sum(t) AS tt,
                     """ + ", ".join(
            f"""sum(CASE WHEN t > {ln} THEN 1 ELSE 0 END)::BIGINT
                       AS o{ln},
                     sum(greatest(t - {ln}, 0)) AS l{ln}"""
            for ln in (64, 128, 256, 512)) + """
              FROM b)
            SELECT * FROM (""" + " UNION ALL ".join(
            f"""SELECT {ln} AS context_len, n AS n_docs,
                   o{ln} AS docs_over,
                   round(o{ln} / n::DOUBLE, 6) AS docs_over_share,
                   tt::BIGINT AS tokens_total,
                   l{ln}::BIGINT AS tokens_lost,
                   round(l{ln} / tt, 6) AS token_loss_share
                FROM a"""
            for ln in (64, 128, 256, 512)) + """
            ) ORDER BY context_len
        """,
        # twin of q_deming_len_tokens — same closed form
        "deming_len_tokens": """
            WITH s AS (
              SELECT n_chars::DOUBLE AS x,
                     length(regexp_split_to_array(text, '\\s+'))
                       * 5.0 AS y
              FROM documents
              WHERE text IS NOT NULL AND n_chars IS NOT NULL),
            a AS (
              SELECT count(*)::DOUBLE AS n, avg(x) AS mx,
                     avg(y) AS my, covar_pop(x, y) AS sxy,
                     var_pop(x) AS sxx, var_pop(y) AS syy
              FROM s),
            f AS (
              SELECT n, mx, my, sxy, sxx, syy,
                     CASE WHEN sxy <> 0 THEN
                       (syy - sxx + sqrt(pow(syy - sxx, 2)
                        + 4 * sxy * sxy)) / (2 * sxy) END AS b
              FROM a)
            SELECT n::BIGINT AS n, round(b, 6) AS slope,
                   round(my - b * mx, 6) AS intercept,
                   round(sxy / sxx, 6) AS ols_slope,
                   round((sxy / sxx) / b, 6) AS attenuation
            FROM f
        """,
        # twin of q_effect_size_langs — same pooled-SD pairs
        "effect_size_langs": """
            WITH per AS (
              SELECT lang AS g, count(*)::DOUBLE AS n,
                     avg(n_chars) AS m, var_samp(n_chars) AS s2
              FROM documents
              WHERE lang IS NOT NULL AND n_chars IS NOT NULL
              GROUP BY lang),
            j AS (
              SELECT a.g AS ga, b.g AS gb, a.n AS na, b.n AS nb,
                     b.m - a.m AS md,
                     sqrt(((a.n - 1) * a.s2 + (b.n - 1) * b.s2)
                          / (a.n + b.n - 2)) AS sd
              FROM per a JOIN per b ON a.g < b.g)
            SELECT ga AS group_a, gb AS group_b,
                   na::BIGINT AS n_a, nb::BIGINT AS n_b,
                   round(md, 6) AS mean_diff,
                   round(sd, 6) AS pooled_sd,
                   round(md / sd, 6) AS cohens_d,
                   round(md / sd
                         * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0)),
                         6) AS hedges_g
            FROM j ORDER BY group_a, group_b
        """,
        # twin of q_mahalanobis_len_tokens — same closed-form
        # 2x2 inverse
        "mahalanobis_len_tokens": """
            WITH s AS (
              SELECT n_chars::DOUBLE AS x,
                     length(regexp_split_to_array(text, '\\s+'))
                       ::DOUBLE AS y
              FROM documents
              WHERE text IS NOT NULL AND n_chars IS NOT NULL),
            m AS (
              SELECT avg(x) AS mx, avg(y) AS my,
                     var_samp(x) AS vx, var_samp(y) AS vy,
                     covar_samp(x, y) AS cxy
              FROM s),
            scored AS (
              SELECT (m.vy * pow(s.x - m.mx, 2)
                      - 2 * m.cxy * (s.x - m.mx) * (s.y - m.my)
                      + m.vx * pow(s.y - m.my, 2))
                     / (m.vx * m.vy - m.cxy * m.cxy) AS d2,
                     m.cxy / sqrt(m.vx * m.vy) AS r
              FROM s, m)
            SELECT count(*)::BIGINT AS n,
                   sum(CASE WHEN d2 > 5.991 THEN 1 ELSE 0 END)
                     ::BIGINT AS n_flagged,
                   round(avg(CASE WHEN d2 > 5.991 THEN 1.0
                             ELSE 0.0 END), 6) AS flag_share,
                   round(max(d2), 6) AS max_d2,
                   round(any_value(r), 6) AS corr_xy
            FROM scored
        """,
        # twin of q_design_effect_users — same ANOVA components
        "design_effect_users": """
            WITH base AS (
              SELECT user_id AS g, value AS v FROM events
              WHERE value IS NOT NULL AND user_id IS NOT NULL),
            gmean AS (SELECT avg(v) AS gm FROM base),
            per AS (
              SELECT g, count(*)::DOUBLE AS m, avg(v) AS mg,
                     sum(pow(v - gmean.gm, 2)) AS tss,
                     any_value(gmean.gm) AS gm
              FROM base, gmean GROUP BY g),
            a AS (
              SELECT sum(m) AS n, count(*)::DOUBLE AS gg,
                     sum(m * m) AS m2,
                     sum(m * pow(mg - gm, 2)) AS ssb,
                     sum(tss) AS sst
              FROM per),
            f AS (
              SELECT n, gg, m2, ssb, sst - ssb AS ssw,
                     ssb / (gg - 1) AS msb,
                     (sst - ssb) / (n - gg) AS msw,
                     (n - m2 / n) / (gg - 1) AS m0
              FROM a),
            icc AS (
              SELECT n, gg,
                     (msb - msw) / (msb + (m0 - 1) * msw) AS rho
              FROM f)
            SELECT n::BIGINT AS n, gg::BIGINT AS n_clusters,
                   round(n / gg, 6) AS avg_cluster,
                   round(rho, 6) AS icc,
                   round(1.0 + (n / gg - 1) * greatest(rho, 0.0),
                         6) AS deff,
                   round(n / (1.0 + (n / gg - 1)
                              * greatest(rho, 0.0)), 6)
                     AS n_effective
            FROM icc
        """,
        # twin of q_bidi_audit_sources — same seeded spans; chr()
        # builds the controls so no invisible literals in SQL
        "bidi_audit_sources": """
            WITH seeded AS (
              SELECT source,
                     CASE WHEN doc_id % 21 = 0
                          THEN text || chr(8238) || 'evil'
                               || chr(8236)
                          WHEN doc_id % 35 = 0
                          THEN text || chr(8238)
                          ELSE text END AS text
              FROM documents),
            base AS (
              SELECT source AS "group",
                     len(regexp_extract_all(text,
                       '[' || chr(8234) || '-' || chr(8238) || ']'))
                       AS ov,
                     len(regexp_extract_all(text,
                       '[' || chr(8294) || '-' || chr(8297) || ']'))
                       AS iso,
                     len(regexp_extract_all(text,
                       '[' || chr(8234) || chr(8235) || chr(8237)
                       || chr(8238) || ']'))
                       <> len(regexp_extract_all(text, chr(8236)))
                     OR len(regexp_extract_all(text,
                       '[' || chr(8294) || chr(8295) || chr(8296)
                       || ']'))
                       <> len(regexp_extract_all(text, chr(8297)))
                       AS ub
              FROM seeded
              WHERE text IS NOT NULL AND source IS NOT NULL)
            SELECT "group", count(*)::BIGINT AS n_docs,
                   sum(ov)::BIGINT AS n_overrides,
                   sum(iso)::BIGINT AS n_isolates,
                   sum(CASE WHEN ov + iso > 0 THEN 1 ELSE 0 END)
                     ::BIGINT AS docs_affected,
                   sum(ub::INT)::BIGINT AS unbalanced_docs
            FROM base GROUP BY 1 ORDER BY 1
        """,
        # twin of q_gpd_value_tail — same MOM closed form
        "gpd_value_tail": """
            WITH base AS (SELECT value AS v FROM events
                          WHERE value IS NOT NULL),
            th AS (SELECT quantile_cont(v, 0.95) AS u,
                          count(*)::BIGINT AS n FROM base),
            exc AS (SELECT b.v - th.u AS e, th.u, th.n
                    FROM base b, th WHERE b.v > th.u),
            a AS (
              SELECT count(*)::DOUBLE AS ne, avg(e) AS m,
                     var_samp(e) AS s2, any_value(u) AS u,
                     any_value(n) AS n
              FROM exc),
            f AS (
              SELECT n, ne, u, m,
                     0.5 * (1.0 - m*m/s2) AS xi,
                     0.5 * m * (1.0 + m*m/s2) AS sigma
              FROM a)
            SELECT n, ne::BIGINT AS n_exceed,
                   round(u, 6) AS threshold,
                   round(m, 6) AS mean_excess,
                   round(xi, 6) AS xi, round(sigma, 6) AS sigma,
                   round(CASE WHEN abs(xi) > 1e-9 THEN
                     u + sigma/xi * (pow(10.0*ne, xi) - 1)
                     ELSE u + sigma * ln(10.0*ne) END, 6) AS rl_10x
            FROM f
        """,
        # twin of q_seasonal_mk_volume — same per-season pairs
        "seasonal_mk_volume": """
            WITH daily AS (
              SELECT ts::DATE AS d, count(*)::DOUBLE AS v
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            s AS (SELECT (dayofweek(d) + 1) AS w, d, v FROM daily),
            st AS (
              SELECT sum(sign(b.v - a.v)) AS s
              FROM s a JOIN s b ON a.w = b.w AND a.d < b.d),
            per AS (SELECT w, count(*)::DOUBLE AS n FROM s
                    GROUP BY w),
            ties AS (
              SELECT w, sum(t * (t - 1) * (2*t + 5)) AS tc
              FROM (SELECT w, v, count(*)::DOUBLE AS t FROM s
                    GROUP BY w, v)
              GROUP BY w),
            var AS (
              SELECT sum(per.n * (per.n - 1) * (2*per.n + 5) / 18.0
                         - ties.tc / 18.0) AS var,
                     count(*)::BIGINT AS n_seasons,
                     sum(per.n)::BIGINT AS n_obs
              FROM per JOIN ties USING (w))
            SELECT var.n_seasons, var.n_obs,
                   round(st.s, 6) AS s_total,
                   round(var.var, 6) AS var_total,
                   round(CASE WHEN var.var > 0 THEN
                     CASE WHEN st.s <> 0 THEN
                       (st.s - sign(st.s)) / sqrt(var.var)
                     ELSE 0.0 END END, 6) AS z
            FROM var, st
        """,
        # twin of q_qq_normal_values — same decile z constants
        "qq_normal_values": """
            WITH base AS (SELECT value AS v FROM events
                          WHERE value IS NOT NULL),
            a AS (
              SELECT avg(v) AS mu, stddev(v) AS sd, """ + ", ".join(
            f"quantile_cont(v, {k / 100.0}) AS q{k}"
            for k in range(10, 100, 10)) + """
              FROM base)
            SELECT * FROM (""" + " UNION ALL ".join(
            f"""SELECT {k} AS decile,
                   round(q{k}, 6) AS empirical_q,
                   round(mu + ({z}) * sd, 6) AS normal_q,
                   round(q{k} - (mu + ({z}) * sd), 6) AS gap,
                   round((q{k} - (mu + ({z}) * sd)) / sd, 6)
                     AS gap_in_sd
                FROM a"""
            for k, z in ((10, -1.281552), (20, -0.841621),
                         (30, -0.524401), (40, -0.253347),
                         (50, 0.0), (60, 0.253347),
                         (70, 0.524401), (80, 0.841621),
                         (90, 1.281552))) + """
            ) ORDER BY decile
        """,
        # twin of q_ts_rounding_audit — same seeded truncation
        "ts_rounding_audit": """
            WITH seeded AS (
              SELECT CASE WHEN event_id % 11 = 0
                          THEN date_trunc('minute', ts)
                          ELSE ts END AS ts
              FROM events WHERE ts IS NOT NULL),
            base AS (
              SELECT extract(second FROM ts)::INT AS s,
                     extract(minute FROM ts)::INT AS m,
                     (epoch_us(ts) % 1000000 = 0)::INT AS u0
              FROM seeded),
            per_s AS (SELECT s, count(*)::DOUBLE AS c FROM base
                      GROUP BY s),
            chi AS (SELECT sum(c) AS n, sum(c * c) AS c2
                    FROM per_s),
            a AS (
              SELECT count(*)::DOUBLE AS n,
                     avg(CASE WHEN s = 0 THEN 1.0 ELSE 0.0 END)
                       AS s0,
                     avg(CASE WHEN m = 0 THEN 1.0 ELSE 0.0 END)
                       AS m0,
                     avg(u0) AS u0
              FROM base)
            SELECT a.n::BIGINT AS n,
                   round(a.s0, 6) AS sec0_share,
                   round(a.s0 * 60.0, 6) AS sec0_ratio,
                   round(a.m0, 6) AS min0_share,
                   round(a.m0 * 60.0, 6) AS min0_ratio,
                   round(a.u0, 6) AS micro0_share,
                   round(chi.c2 / (chi.n / 60.0) - chi.n, 6)
                     AS subsec_uniform_chi2
            FROM a, chi
        """,
        # twin of q_aa_calibration_values — same md5-bit splits,
        # Welch z per split (oracle may explode; flags must match)
        "aa_calibration_values": """
            WITH base AS (
              SELECT value AS v, md5(event_id::VARCHAR) AS h
              FROM events WHERE value IS NOT NULL),
            perms AS (
              SELECT v, p.b,
                     ((('0x' || substr(h, (p.b // 4) + 1, 1))
                       ::BIGINT >> (p.b % 4)) & 1) = 0 AS f
              FROM base CROSS JOIN
                   (SELECT unnest(generate_series(0, 63)) AS b) p),
            per_b AS (
              SELECT b,
                     avg(v) FILTER (f) AS m1,
                     avg(v) FILTER (NOT f) AS m2,
                     var_samp(v) FILTER (f) AS v1,
                     var_samp(v) FILTER (NOT f) AS v2,
                     count(*) FILTER (f)::DOUBLE AS c1,
                     count(*) FILTER (NOT f)::DOUBLE AS c2
              FROM perms GROUP BY b),
            zs AS (
              SELECT b, (m1 - m2) / sqrt(v1/c1 + v2/c2) AS z
              FROM per_b),
            agg AS (
              SELECT sum(CASE WHEN abs(z) > 1.96 THEN 1
                         ELSE 0 END)::BIGINT AS n_sig,
                     max(abs(z)) AS max_abs_z
              FROM zs),
            nn AS (SELECT count(*)::BIGINT AS n FROM base)
            SELECT nn.n, 64 AS n_splits, agg.n_sig,
                   round(agg.n_sig / 64.0, 6) AS sig_share,
                   round(agg.max_abs_z, 6) AS max_abs_z
            FROM nn, agg
        """,
        # twin of q_logrank_purchase_cohorts — km duration model,
        # O-E / V accumulation over event buckets
        "logrank_purchase_cohorts": """
            WITH per AS (
              SELECT user_id, min(epoch(ts)) AS entry,
                     min(CASE WHEN event_type = 'purchase'
                         THEN epoch(ts) END) AS ev,
                     max(epoch(ts)) AS lastts,
                     max(CASE WHEN user_id % 2 = 0 THEN 1
                         ELSE 0 END) AS g1
              FROM events WHERE user_id IS NOT NULL
              GROUP BY user_id),
            h AS (SELECT max(lastts) AS hz FROM per),
            marks AS (
              SELECT floor((CASE WHEN ev IS NOT NULL THEN ev - entry
                            ELSE hz - entry END) / 3600)::BIGINT
                       AS t,
                     count(*)::DOUBLE AS all_,
                     sum(g1)::DOUBLE AS all1,
                     sum(CASE WHEN ev IS NOT NULL THEN 1
                         ELSE 0 END)::DOUBLE AS d,
                     sum(CASE WHEN ev IS NOT NULL THEN g1
                         ELSE 0 END)::DOUBLE AS d1
              FROM per, h GROUP BY 1),
            curve AS (
              SELECT t, d, d1,
                     sum(all_) OVER ()
                       - coalesce(sum(all_) OVER (ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS n,
                     sum(all1) OVER ()
                       - coalesce(sum(all1) OVER (ORDER BY t
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS n1
              FROM marks),
            terms AS (
              SELECT sum(d1 - d * n1 / n) AS oe,
                     sum(d * (n1/n) * ((n - n1)/n) * (n - d)
                         / (n - 1)) AS v
              FROM curve WHERE d > 0 AND n > 1),
            sides AS (
              SELECT sum(g1)::BIGINT AS n1,
                     sum(1 - g1)::BIGINT AS n2,
                     sum(CASE WHEN ev IS NOT NULL AND g1 = 1
                         THEN 1 ELSE 0 END)::BIGINT AS e1,
                     sum(CASE WHEN ev IS NOT NULL AND g1 = 0
                         THEN 1 ELSE 0 END)::BIGINT AS e2
              FROM per)
            SELECT s.n1, s.n2, s.e1 AS events1, s.e2 AS events2,
                   round(t.oe, 6) AS o_minus_e,
                   round(t.v, 6) AS var,
                   round(CASE WHEN t.v > 0 THEN t.oe * t.oe / t.v
                         END, 6) AS chi2
            FROM sides s, terms t
        """,
        # twin of q_cem_weekend_balance — same strata grid
        "cem_weekend_balance": """
            WITH cells AS (
              SELECT floor(extract(hour FROM ts) / 6) AS s0,
                     least(floor(value / 50), 4) AS s1,
                     sum((extract(dow FROM ts) IN (0, 6))::INT)
                       ::DOUBLE AS nt,
                     sum((extract(dow FROM ts) NOT IN (0, 6))::INT)
                       ::DOUBLE AS nc
              FROM events
              WHERE ts IS NOT NULL AND value IS NOT NULL
              GROUP BY 1, 2),
            a AS (
              SELECT sum(nt) AS tt, sum(nc) AS tc,
                     count(*)::BIGINT AS n_strata,
                     sum(CASE WHEN nt > 0 AND nc > 0 THEN 1
                         ELSE 0 END)::BIGINT AS n_common
              FROM cells)
            SELECT a.tt::BIGINT AS n_treated,
                   a.tc::BIGINT AS n_control,
                   a.n_strata, a.n_common AS n_common_strata,
                   round(0.5 * (SELECT sum(abs(c.nt / a.tt
                                              - c.nc / a.tc))
                                FROM cells c), 6) AS l1
            FROM a
        """,
        # twin of q_jarque_bera_types — same two-pass central
        # moments
        "jarque_bera_types": """
            WITH base AS (
              SELECT event_type AS g, value AS v FROM events
              WHERE value IS NOT NULL AND event_type IS NOT NULL),
            means AS (SELECT g, avg(v) AS mu FROM base GROUP BY g),
            dev AS (SELECT b.g, b.v - m.mu AS d
                    FROM base b JOIN means m ON m.g = b.g),
            a AS (
              SELECT g, count(*)::DOUBLE AS n,
                     avg(d*d) AS m2, avg(d*d*d) AS m3,
                     avg(d*d*d*d) AS m4
              FROM dev GROUP BY g)
            SELECT g AS "group", n::BIGINT AS n,
                   round(m3 / pow(m2, 1.5), 6) AS skewness,
                   round(m4 / (m2*m2) - 3.0, 6) AS ex_kurtosis,
                   round(n/6.0 * (pow(m3/pow(m2,1.5), 2)
                         + pow(m4/(m2*m2) - 3.0, 2)/4.0), 6)
                     AS jb_stat,
                   2 AS dof
            FROM a ORDER BY "group"
        """,
        # twin of q_file_layout_docs — the oracle sees only the
        # registered VIEW, not filenames; the driver testdata is one
        # parquet file per table at every SF, so the twin derives
        # the same report from that known layout (the Spark side
        # measures it for real via input_file_name)
        "file_layout_docs": """
            WITH a AS (SELECT count(*)::DOUBLE AS rt
                       FROM documents)
            SELECT 1::BIGINT AS n_files,
                   rt::BIGINT AS rows_total,
                   rt::BIGINT AS rows_min,
                   round(rt, 6) AS rows_median,
                   rt::BIGINT AS rows_max,
                   1.0 AS skew_ratio,
                   0::BIGINT AS small_files,
                   greatest(ceil(rt / 1000000.0), 1)::BIGINT
                     AS suggested_files
            FROM a
        """,
        # twin of q_session_gap_curve — same lag pass
        "session_gap_curve": """
            WITH base AS (
              SELECT user_id AS e, epoch(ts) AS t FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            gapped AS (
              SELECT e, t - lag(t) OVER (PARTITION BY e
                       ORDER BY t) AS gap
              FROM base),
            a AS (
              SELECT count(*)::DOUBLE AS n_events,
                     count(DISTINCT e)::DOUBLE AS n_ent,
                     """ + ", ".join(
            f"""sum(CASE WHEN gap > {g} THEN 1 ELSE 0 END)
                       ::DOUBLE AS brk{g}"""
            for g in (300, 1800, 3600, 14400)) + """
              FROM gapped)
            SELECT * FROM (""" + " UNION ALL ".join(
            f"""SELECT {g} AS gap_s,
                   (n_ent + brk{g})::BIGINT AS n_sessions,
                   round(n_events / (n_ent + brk{g}), 6)
                     AS events_per_session,
                   round((n_ent + brk{g}) / n_ent, 6)
                     AS sessions_per_entity
                FROM a"""
            for g in (300, 1800, 3600, 14400)) + """
            ) ORDER BY gap_s
        """,
        # twin of q_qn_scale_lens — same weighted pair grid
        "qn_scale_lens": """
            WITH base AS (SELECT n_chars::DOUBLE AS v
                          FROM documents WHERE n_chars IS NOT NULL),
            vc AS (SELECT v, count(*)::DOUBLE AS c FROM base
                   GROUP BY v),
            cross_ AS (
              SELECT b.v - a.v AS d, a.c * b.c AS w
              FROM vc a JOIN vc b ON a.v < b.v
              UNION ALL
              SELECT 0.0, c * (c - 1) / 2 FROM vc WHERE c > 1),
            dists AS (SELECT d, sum(w) AS w FROM cross_ GROUP BY d),
            n_agg AS (
              SELECT count(*)::DOUBLE AS n, stddev(v) AS sd,
                     quantile_cont(v, 0.5) AS med
              FROM base),
            mad AS (
              SELECT quantile_cont(abs(b.v - n_agg.med), 0.5)
                       AS mad
              FROM base b, n_agg),
            cum AS (
              SELECT d, sum(w) OVER (ORDER BY d
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM dists),
            k AS (
              SELECT (floor(n/2) + 1) * floor(n/2) / 2 AS k, n, sd
              FROM n_agg),
            dk AS (
              SELECT min(cum.d) AS d_k FROM cum, k
              WHERE cum.cum >= k.k)
            SELECT k.n::BIGINT AS n, k.k::BIGINT AS k,
                   round(dk.d_k, 6) AS d_k,
                   round(dk.d_k * 2.2219, 6) AS qn,
                   round(mad.mad * 1.4826, 6) AS mad_scaled,
                   round(k.sd, 6) AS stddev
            FROM dk, k, mad
        """,
        # twin of q_rmst_purchase_cohorts — same duration model and
        # step integral of the per-cohort KM curve
        "rmst_purchase_cohorts": """
            WITH per AS (
              SELECT user_id, min(epoch(ts)) AS entry,
                     min(CASE WHEN event_type = 'purchase'
                         THEN epoch(ts) END) AS ev,
                     max(epoch(ts)) AS lastts,
                     max(CASE WHEN user_id % 2 = 0 THEN 1
                         ELSE 0 END) AS g
              FROM events WHERE user_id IS NOT NULL
              GROUP BY user_id),
            h AS (SELECT max(lastts) AS hz FROM per),
            marks AS (
              SELECT g,
                     floor((CASE WHEN ev IS NOT NULL THEN ev - entry
                            ELSE hz - entry END) / 3600)::BIGINT
                       AS t,
                     count(*)::DOUBLE AS all_,
                     sum(CASE WHEN ev IS NOT NULL THEN 1
                         ELSE 0 END)::DOUBLE AS d
              FROM per, h GROUP BY g, 2),
            curve AS (
              SELECT g, t, d,
                     sum(all_) OVER (PARTITION BY g)
                       - coalesce(sum(all_) OVER (PARTITION BY g
                           ORDER BY t ROWS BETWEEN UNBOUNDED
                           PRECEDING AND 1 PRECEDING), 0) AS n
              FROM marks),
            stepped AS (
              SELECT g, t,
                     CASE WHEN max(CASE WHEN d >= n THEN 1
                               ELSE 0 END)
                            OVER (PARTITION BY g ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) = 1
                     THEN 0.0
                     ELSE exp(sum(CASE WHEN d > 0 AND d < n
                               THEN ln(1 - d / n) ELSE 0 END)
                            OVER (PARTITION BY g ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW)) END AS s
              FROM curve),
            seg AS (
              SELECT g, s,
                     least(t + 1, 72.0) AS lo,
                     least(coalesce(lead(t) OVER (PARTITION BY g
                             ORDER BY t) + 1, 72.0), 72.0) AS hi,
                     min(t) OVER (PARTITION BY g) AS t0
              FROM stepped),
            contrib AS (
              SELECT g,
                     sum(CASE WHEN hi > lo THEN (hi - lo) * s
                         ELSE 0 END) AS tail_area,
                     least(min(t0) + 1, 72.0) AS head
              FROM seg GROUP BY g),
            sides AS (
              SELECT g, count(*)::BIGINT AS n,
                     sum(CASE WHEN ev IS NOT NULL THEN 1
                         ELSE 0 END)::BIGINT AS n_events
              FROM per GROUP BY g)
            SELECT s.g::BIGINT AS cohort, s.n, s.n_events,
                   round((coalesce(c.head, 72.0)
                          + coalesce(c.tail_area, 0)) * 3600, 6)
                     AS rmst_s,
                   round((coalesce(c.head, 72.0)
                          + coalesce(c.tail_area, 0)) / 72.0, 6)
                     AS rmst_share
            FROM sides s LEFT JOIN contrib c ON c.g = s.g
            ORDER BY cohort
        """,
        # twin of q_bland_altman_size — same diff moments
        "bland_altman_size": """
            WITH s AS (
              SELECT n_chars / 5.0 AS a,
                     length(regexp_split_to_array(text, '\\s+'))
                       ::DOUBLE AS b
              FROM documents
              WHERE text IS NOT NULL AND n_chars IS NOT NULL),
            d AS (SELECT b - a AS d, (a + b) / 2 AS m FROM s),
            agg AS (
              SELECT count(*)::BIGINT AS n, avg(d) AS bias,
                     stddev(d) AS sd, corr(d, m) AS r
              FROM d)
            SELECT n, round(bias, 6) AS bias,
                   round(sd, 6) AS sd_diff,
                   round(bias - 1.96 * sd, 6) AS loa_lo,
                   round(bias + 1.96 * sd, 6) AS loa_hi,
                   round(r, 6) AS prop_bias_r
            FROM agg
        """,
        # twin of q_siegel_volume_trend — same repeated medians
        "siegel_volume_trend": """
            WITH daily AS (
              SELECT ts::DATE AS d, count(*)::DOUBLE AS cnt
              FROM events WHERE ts IS NOT NULL GROUP BY 1),
            lo AS (SELECT min(d) AS d0 FROM daily),
            s AS (SELECT (d - lo.d0)::DOUBLE AS x, cnt AS y
                  FROM daily, lo),
            pairs AS (
              SELECT a.x, (b.y - a.y) / (b.x - a.x) AS sl
              FROM s a JOIN s b ON a.x <> b.x),
            per_pt AS (SELECT x, quantile_cont(sl, 0.5) AS ms
                       FROM pairs GROUP BY x),
            slope AS (SELECT quantile_cont(ms, 0.5) AS slope
                      FROM per_pt),
            icept AS (
              SELECT quantile_cont(s.y - sl.slope * s.x, 0.5)
                       AS icept,
                     any_value(sl.slope) AS slope,
                     count(*)::BIGINT AS n
              FROM s, slope sl)
            SELECT n, round(slope, 6) AS slope,
                   round(icept, 6) AS intercept
            FROM icept
        """,
        # twin of q_sample_topk_terms — same occurrence ids, same
        # md5 cut, same deterministic ranking
        "sample_topk_terms": """
            WITH arrs AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(text), '[^a-z]+')
                       AS a
              FROM documents WHERE text IS NOT NULL),
            toks AS (
              SELECT doc_id * 10000 + (s.i - 1) AS occ_id,
                     a[s.i] AS term
              FROM arrs,
                   unnest(generate_series(1, len(a))) AS s(i)
              WHERE length(a[s.i]) >= 3),
            base AS (
              SELECT term AS t,
                     ('0x' || substr(md5(occ_id::VARCHAR), 1, 8))
                       ::BIGINT % 1000000 AS hk
              FROM toks),
            full_top AS (
              SELECT t FROM (
                SELECT t, row_number() OVER
                  (ORDER BY count(*) DESC, t) AS r
                FROM base GROUP BY t) WHERE r <= 10),
            o1 AS (SELECT count(*)::BIGINT AS ov FROM full_top
                   JOIN (SELECT t FROM (
                     SELECT t, row_number() OVER
                       (ORDER BY count(*) DESC, t) AS r
                     FROM base WHERE hk < 10000 GROUP BY t)
                     WHERE r <= 10) s USING (t)),
            o5 AS (SELECT count(*)::BIGINT AS ov FROM full_top
                   JOIN (SELECT t FROM (
                     SELECT t, row_number() OVER
                       (ORDER BY count(*) DESC, t) AS r
                     FROM base WHERE hk < 50000 GROUP BY t)
                     WHERE r <= 10) s USING (t)),
            o25 AS (SELECT count(*)::BIGINT AS ov FROM full_top
                    JOIN (SELECT t FROM (
                      SELECT t, row_number() OVER
                        (ORDER BY count(*) DESC, t) AS r
                      FROM base WHERE hk < 250000 GROUP BY t)
                      WHERE r <= 10) s USING (t))
            SELECT 0.01::DOUBLE AS rate, 10 AS k, o1.ov AS overlap,
                   round(o1.ov / 10.0, 6) AS overlap_share FROM o1
            UNION ALL
            SELECT 0.05::DOUBLE, 10, o5.ov,
                   round(o5.ov / 10.0, 6) FROM o5
            UNION ALL
            SELECT 0.25::DOUBLE, 10, o25.ov,
                   round(o25.ov / 10.0, 6) FROM o25
            ORDER BY rate
        """,
        # twin of q_filter_funnel_docs — same conditional sums
        "filter_funnel_docs": """
            WITH a AS (
              SELECT count(*)::DOUBLE AS n,
                sum((NOT (n_chars >= 100))::INT)::BIGINT AS solo0,
                sum((NOT (n_chars >= 100))::INT)::BIGINT AS kill0,
                sum((NOT (lang IS NOT NULL))::INT)::BIGINT
                  AS solo1,
                sum(((n_chars >= 100) AND lang IS NULL)::INT)
                  ::BIGINT AS kill1,
                sum((NOT (text IS NOT NULL AND length(text) > 0))
                    ::INT)::BIGINT AS solo2,
                sum(((n_chars >= 100) AND lang IS NOT NULL
                     AND NOT (text IS NOT NULL
                              AND length(text) > 0))::INT)::BIGINT
                  AS kill2,
                sum((NOT (n_chars <= 520))::INT)::BIGINT AS solo3,
                sum(((n_chars >= 100) AND lang IS NOT NULL
                     AND text IS NOT NULL AND length(text) > 0
                     AND NOT (n_chars <= 520))::INT)::BIGINT
                  AS kill3
              FROM documents)
            SELECT * FROM (
              SELECT 1 AS stage, 'min_len' AS gate,
                     solo0 AS n_fail_solo,
                     round(solo0 / n, 6) AS solo_share,
                     kill0 AS n_kill_marginal,
                     (n - kill0)::BIGINT AS survivors_after FROM a
              UNION ALL
              SELECT 2, 'lang_known', solo1, round(solo1 / n, 6),
                     kill1, (n - kill0 - kill1)::BIGINT FROM a
              UNION ALL
              SELECT 3, 'has_text', solo2, round(solo2 / n, 6),
                     kill2, (n - kill0 - kill1 - kill2)::BIGINT
              FROM a
              UNION ALL
              SELECT 4, 'max_len', solo3, round(solo3 / n, 6),
                     kill3,
                     (n - kill0 - kill1 - kill2 - kill3)::BIGINT
              FROM a
            ) ORDER BY stage
        """,
        # twin of q_median_ci_langs — same order-statistic ranks
        "median_ci_langs": """
            WITH base AS (
              SELECT lang AS g, n_chars::DOUBLE AS v
              FROM documents
              WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
            ns AS (SELECT g, count(*)::DOUBLE AS n,
                          quantile_cont(v, 0.5) AS med
                   FROM base GROUP BY g),
            vc AS (SELECT g, v, count(*)::DOUBLE AS c FROM base
                   GROUP BY g, v),
            cum AS (
              SELECT vc.g, vc.v,
                     sum(vc.c) OVER (PARTITION BY vc.g ORDER BY vc.v
                       ROWS UNBOUNDED PRECEDING) AS cum,
                     ns.n
              FROM vc JOIN ns ON ns.g = vc.g),
            lo AS (
              SELECT g, min(v) AS ci_lo FROM cum
              WHERE cum >= greatest(floor(n/2 - 1.96*sqrt(n)/2), 1)
              GROUP BY g),
            hi AS (
              SELECT g, min(v) AS ci_hi FROM cum
              WHERE cum >= least(ceil(n/2 + 1.96*sqrt(n)/2 + 1), n)
              GROUP BY g)
            SELECT ns.g AS "group", ns.n::BIGINT AS n,
                   round(ns.med, 6) AS median,
                   round(lo.ci_lo, 6) AS ci_lo,
                   round(hi.ci_hi, 6) AS ci_hi
            FROM ns JOIN lo ON lo.g = ns.g
            JOIN hi ON hi.g = ns.g
            ORDER BY "group"
        """,
        # twin of q_spiegelhalter_len_gate — same logistic score
        "spiegelhalter_len_gate": """
            WITH s AS (
              SELECT 1.0 / (1.0 + exp(-(n_chars - 300.0) / 50.0))
                       AS p,
                     (lang = 'en')::INT::DOUBLE AS y
              FROM documents
              WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
            a AS (
              SELECT count(*)::BIGINT AS n, avg(y) AS br,
                     avg(p) AS mp,
                     sum((y - p) * (1 - 2*p)) AS num,
                     sum(pow(1 - 2*p, 2) * p * (1 - p)) AS den
              FROM s)
            SELECT n, round(br, 6) AS base_rate,
                   round(mp, 6) AS mean_pred,
                   round(CASE WHEN den > 0 THEN num / sqrt(den)
                         END, 6) AS z
            FROM a
        """,
        # twin of q_lin_ccc_size — same closed form
        "lin_ccc_size": """
            WITH s AS (
              SELECT n_chars / 5.0 AS x,
                     length(regexp_split_to_array(text, '\\s+'))
                       ::DOUBLE AS y
              FROM documents
              WHERE text IS NOT NULL AND n_chars IS NOT NULL),
            a AS (
              SELECT count(*)::BIGINT AS n, avg(x) AS mx,
                     avg(y) AS my, var_pop(x) AS vx,
                     var_pop(y) AS vy, covar_pop(x, y) AS cxy
              FROM s),
            f AS (
              SELECT n,
                     cxy / sqrt(vx * vy) AS r,
                     2 * cxy / (vx + vy + pow(mx - my, 2)) AS ccc
              FROM a)
            SELECT n, round(r, 6) AS pearson_r,
                   round(ccc / r, 6) AS c_b,
                   round(ccc, 6) AS ccc
            FROM f
        """,
        # twin of q_yule_k_sources — same token aggregation
        "yule_k_sources": """
            WITH toks AS (
              SELECT source AS g, t.term AS t
              FROM documents,
                   unnest(regexp_split_to_array(lower(text),
                          '[^a-z]+')) AS t(term)
              WHERE text IS NOT NULL AND source IS NOT NULL
                AND length(t.term) >= 1),
            tc AS (SELECT g, t, count(*)::DOUBLE AS n FROM toks
                   GROUP BY g, t),
            a AS (
              SELECT g, sum(n) AS nn, count(*)::BIGINT AS types,
                     sum(n * n) AS n2
              FROM tc GROUP BY g)
            SELECT g AS "group", nn::BIGINT AS n_tokens,
                   types AS n_types,
                   round(1e4 * (n2 - nn) / (nn * nn), 6) AS yule_k
            FROM a ORDER BY "group"
        """,
        # twin of q_corpus_scorecard — same fused signal definitions
        "corpus_scorecard": """
            WITH base AS (
              SELECT
                len(regexp_extract_all(text,
                  '[\\x{2600}-\\x{27BF}\\x{1F300}-\\x{1F5FF}\\x{1F600}-\\x{1F64F}\\x{1F680}-\\x{1F6FF}\\x{1F900}-\\x{1F9FF}\\x{1FA70}-\\x{1FAFF}]'))
                  AS em,
                len(regexp_extract_all(text, '(^|\\s)#\\w{2,}'))
                + len(regexp_extract_all(text, '(^|\\s)@\\w{2,}'))
                + len(regexp_extract_all(text, 'https?://[^\\s]+'))
                  AS so,
                coalesce((SELECT max(length(r)) FROM unnest(
                  regexp_extract_all(lower(text),
                    '[bcdfghjklmnpqrstvwxz]+')) AS t(r)), 0) AS mr,
                len(regexp_extract_all(lower(text), '[aeiouy]'))
                  ::DOUBLE AS nv,
                len(regexp_extract_all(lower(text), '[a-z]'))
                  ::DOUBLE AS nl,
                len(regexp_extract_all(text, '-' || chr(10)))
                + len(regexp_extract_all(text, chr(173))) AS hy,
                len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                  AS pi,
                len(regexp_extract_all(text,
                  '[' || chr(8234) || '-' || chr(8238) || ']'))
                + len(regexp_extract_all(text,
                  '[' || chr(8294) || '-' || chr(8297) || ']'))
                  AS bd,
                len(regexp_extract_all(text, '[A-Z]'))::DOUBLE
                  AS nu,
                md5(text) AS fp,
                n_chars::DOUBLE AS cc
              FROM documents WHERE text IS NOT NULL),
            a AS (
              SELECT count(*)::DOUBLE AS n, avg(cc) AS mc,
                     count(DISTINCT fp)::DOUBLE AS nd,
                     sum(em) AS em, sum(so) AS so,
                     sum(CASE WHEN mr >= 7
                              OR nv / nullif(nl, 0) < 0.2
                         THEN 1 ELSE 0 END) AS gb,
                     sum(hy) AS hy, sum(pi) AS pi, sum(bd) AS bd,
                     avg(nu / nullif(nu + nl, 0)) AS cp,
                     avg(nv / nullif(nl, 0)) AS vs
              FROM base)
            SELECT n::BIGINT AS n_docs,
                   round(mc, 6) AS mean_chars,
                   round(nd / n, 6) AS dup_fingerprint_ratio,
                   round(em * 1000.0 / n, 6) AS emoji_per_kdoc,
                   round(so * 1000.0 / n, 6) AS social_per_kdoc,
                   round(gb / n, 6) AS gibberish_share,
                   round(hy * 1000.0 / n, 6) AS hyphen_per_kdoc,
                   round(pi * 1000.0 / n, 6) AS pii_email_per_kdoc,
                   round(bd * 1000.0 / n, 6) AS bidi_per_kdoc,
                   round(cp, 6) AS caps_share,
                   round(vs, 6) AS vowel_share
            FROM a
        """,
        # twin of q_skew_scan_events — same fused percentiles
        "skew_scan_events": """
            WITH a AS (
              SELECT """ + ", ".join(
            f"""count({c})::BIGINT AS n_{c},
                     quantile_cont({c}, 0.5) AS p50_{c},
                     quantile_cont({c}, 0.99) AS p99_{c},
                     quantile_cont({c}, 0.999) AS p999_{c},
                     avg({c}) AS m_{c}, stddev({c}) AS s_{c}"""
            for c in ("value", "user_id", "event_id")) + """
              FROM events)
            SELECT * FROM (""" + " UNION ALL ".join(
            f"""SELECT '{c}' AS "column", n_{c} AS n,
                   round(p50_{c}, 6) AS p50,
                   round(p99_{c}, 6) AS p99,
                   round(p999_{c}, 6) AS p999,
                   round(p99_{c} / nullif(p50_{c}, 0), 6)
                     AS tail_ratio,
                   round(s_{c} / nullif(m_{c}, 0), 6) AS cv
                FROM a"""
            for c in ("value", "user_id", "event_id")) + """
            ) ORDER BY "column"
        """,
        # twin of q_page_trend_rules — same within-block ranks
        "page_trend_rules": """
            WITH rows_ AS (
              SELECT doc_id AS b, t.j,
                     CASE t.j WHEN 1.0 THEN n_chars * 1.0
                              + (doc_id % 7)
                          WHEN 2.0 THEN n_chars * 1.02
                              + (doc_id % 5)
                          ELSE n_chars * 1.04 + (doc_id % 3)
                     END AS v
              FROM documents CROSS JOIN
                   (SELECT unnest([1.0, 2.0, 3.0]) AS j) t
              WHERE n_chars IS NOT NULL),
            ranked AS (
              SELECT b, j,
                     2 * rank() OVER (PARTITION BY b ORDER BY v)
                       + count(*) OVER (PARTITION BY b, v) - 1
                       AS r2
              FROM rows_),
            per_j AS (
              SELECT j, sum(r2)::DOUBLE AS r2j,
                     count(*)::DOUBLE AS nb
              FROM ranked GROUP BY j),
            pos AS (SELECT row_number() OVER (ORDER BY j) AS pos,
                           r2j, nb
                    FROM per_j),
            a AS (SELECT any_value(nb) AS b,
                         count(*)::DOUBLE AS k,
                         sum(pos * r2j / 2.0) AS l
                  FROM pos)
            SELECT b::BIGINT AS n_blocks, 0::BIGINT AS n_dropped,
                   k::BIGINT AS k_treat,
                   round(l, 6) AS l_stat,
                   round(b * k * pow(k + 1, 2) / 4.0, 6) AS mean_l,
                   round((l - b * k * pow(k + 1, 2) / 4.0)
                         / sqrt(b * pow(k*k*k - k, 2)
                                / (144.0 * (k - 1))), 6) AS z
            FROM a
        """,
        # twin of q_effective_dim_emb — same per-dim variances
        "effective_dim_emb": """
            WITH per AS (
              SELECT s.i,
                     var_pop(embedding[s.i]::DOUBLE) AS v,
                     count(*)::BIGINT AS n
              FROM embeddings,
                   unnest(generate_series(1, len(embedding)))
                     AS s(i)
              WHERE embedding IS NOT NULL
              GROUP BY s.i),
            a AS (
              SELECT any_value(n) AS n, count(*)::BIGINT AS d,
                     sum(v) AS sv, sum(v * v) AS sv2,
                     sum(CASE WHEN v < 1e-12 THEN 1 ELSE 0 END)
                       ::BIGINT AS dead,
                     max(v) AS vmax
              FROM per)
            SELECT n, d, round(sv, 6) AS total_var,
                   round(sv * sv / sv2, 6) AS pr_effective_dim,
                   dead AS n_dead_dims,
                   round(vmax / sv, 6) AS top_var_share
            FROM a
        """,
        # twin of q_anisotropy_emb — same normalized component sums
        "anisotropy_emb": """
            WITH base AS (
              SELECT embedding AS e,
                     sqrt(list_sum(list_transform(embedding,
                       x -> x::DOUBLE * x::DOUBLE))) AS nm
              FROM embeddings WHERE embedding IS NOT NULL),
            keep AS (SELECT * FROM base WHERE nm > 0),
            per AS (
              SELECT s.i,
                     sum(e[s.i]::DOUBLE / nm) AS su,
                     count(*)::BIGINT AS n,
                     avg(nm) AS mn
              FROM keep,
                   unnest(generate_series(1, len(e))) AS s(i)
              GROUP BY s.i),
            a AS (
              SELECT any_value(n) AS n, count(*)::BIGINT AS d,
                     sum(su * su) AS s2, any_value(mn) AS mn
              FROM per)
            SELECT n, d,
                   round((s2 - n) / (n * (n - 1.0)), 6)
                     AS mean_cosine,
                   round(mn, 6) AS mean_norm
            FROM a
        """,
        # twin of q_norm_length_bias — same join and moments
        "norm_length_bias": """
            WITH e AS (
              SELECT vec_id AS id,
                     sqrt(list_sum(list_transform(embedding,
                       x -> x::DOUBLE * x::DOUBLE))) AS nm
              FROM embeddings WHERE embedding IS NOT NULL),
            d AS (SELECT doc_id AS id, n_chars::DOUBLE AS ln
                  FROM documents WHERE n_chars IS NOT NULL),
            j AS (SELECT e.nm, d.ln FROM e JOIN d USING (id)),
            a AS (
              SELECT count(*)::BIGINT AS n, avg(nm) AS mn,
                     covar_pop(nm, ln) AS c,
                     stddev_pop(nm) AS sn, stddev_pop(ln) AS sl,
                     var_pop(ln) AS vl
              FROM j)
            SELECT n, round(mn, 6) AS mean_norm,
                   round(CASE WHEN sn * sl > 0 THEN c / (sn * sl)
                         END, 6) AS pearson_r,
                   round(CASE WHEN vl > 0 THEN c / vl * 1000.0
                         END, 6) AS slope_per_kchar
            FROM a
        """,
        # twin of q_label_retrieval_eval — same exact cosine ranks
        "label_retrieval_eval": """
            WITH base AS (
              SELECT vec_id AS id, embedding::DOUBLE[] AS e,
                     label AS lb
              FROM embeddings
              WHERE embedding IS NOT NULL AND label IS NOT NULL),
            qs AS (SELECT id AS qid, e AS qe, lb AS qlb FROM base
                   ORDER BY id LIMIT 20),
            scored AS (
              SELECT q.qid, q.qlb, b.id, b.lb,
                     list_cosine_similarity(b.e, q.qe) AS cos
              FROM base b, qs q WHERE b.id <> q.qid),
            ranked AS (
              SELECT qid, qlb, lb,
                     row_number() OVER (PARTITION BY qid
                       ORDER BY cos DESC, id) AS r
              FROM scored QUALIFY r <= 10),
            per_q AS (
              SELECT qid,
                     avg((lb = qlb)::INT::DOUBLE) AS p_at_k,
                     min(CASE WHEN lb = qlb THEN r END)
                       AS first_hit
              FROM ranked GROUP BY qid),
            a AS (
              SELECT count(*)::BIGINT AS nq, avg(p_at_k) AS p,
                     avg(coalesce(1.0 / first_hit, 0.0)) AS mrr,
                     avg((first_hit IS NOT NULL)::INT::DOUBLE)
                       AS cov
              FROM per_q)
            SELECT nq AS n_queries, 10 AS k,
                   round(p, 6) AS precision_at_k,
                   round(mrr, 6) AS mrr,
                   round(cov, 6) AS coverage_at_k
            FROM a
        """,
        # twin of q_cluster_validity_emb — same centroid math
        "cluster_validity_emb": """
            WITH base AS (
              SELECT label AS lb, s.i,
                     embedding[s.i]::DOUBLE AS x
              FROM embeddings,
                   unnest(generate_series(1, len(embedding)))
                     AS s(i)
              WHERE embedding IS NOT NULL AND label IS NOT NULL),
            per AS (
              SELECT lb, i, avg(x) AS c, sum(x * x) AS sx2,
                     count(*)::DOUBLE AS n
              FROM base GROUP BY lb, i),
            per_l AS (
              SELECT lb, any_value(n) AS n,
                     sum(sx2 - n * c * c) AS w
              FROM per GROUP BY lb),
            gl AS (SELECT i, avg(x) AS g FROM base GROUP BY i),
            betw AS (
              SELECT per.lb, any_value(per.n) AS n,
                     sum(pow(per.c - gl.g, 2)) AS b2
              FROM per JOIN gl USING (i) GROUP BY per.lb),
            tot AS (
              SELECT per_l.lb, per_l.n, per_l.w, betw.b2
              FROM per_l JOIN betw ON betw.lb = per_l.lb),
            a AS (
              SELECT sum(n) AS nn, count(*)::DOUBLE AS k,
                     sum(w) AS ww, sum(n * b2) AS bb
              FROM tot),
            pair_d AS (
              SELECT x.lb AS la, y.lb AS lc,
                     sqrt(sum(pow(x.c - y.c, 2))) AS d
              FROM per x JOIN per y
                ON x.i = y.i AND x.lb <> y.lb
              GROUP BY x.lb, y.lb),
            s_l AS (SELECT lb, sqrt(w / n) AS s FROM per_l),
            ratios AS (
              SELECT p.la, (sa.s + sc.s) / p.d AS ratio
              FROM pair_d p
              JOIN s_l sa ON sa.lb = p.la
              JOIN s_l sc ON sc.lb = p.lc),
            db AS (
              SELECT avg(r) AS db FROM (
                SELECT la, max(ratio) AS r FROM ratios
                GROUP BY la))
            SELECT a.nn::BIGINT AS n, a.k::BIGINT AS k_labels,
                   round((a.bb / (a.k - 1))
                         / (a.ww / (a.nn - a.k)), 6) AS ch_index,
                   round(db.db, 6) AS db_index
            FROM a, db
        """,
        # twin of q_label_confusability — same centroid cosines
        "label_confusability": """
            WITH per AS (
              SELECT label AS lb, s.i,
                     avg(embedding[s.i]::DOUBLE) AS c,
                     count(*)::BIGINT AS n
              FROM embeddings,
                   unnest(generate_series(1, len(embedding)))
                     AS s(i)
              WHERE embedding IS NOT NULL AND label IS NOT NULL
              GROUP BY label, s.i),
            pairs AS (
              SELECT a.lb AS label_a, b.lb AS label_b,
                     sum(a.c * b.c) AS dot,
                     sqrt(sum(a.c * a.c)) AS na,
                     sqrt(sum(b.c * b.c)) AS nb,
                     any_value(a.n) AS n_a, any_value(b.n) AS n_b
              FROM per a JOIN per b
                ON a.i = b.i AND a.lb < b.lb
              GROUP BY a.lb, b.lb)
            SELECT label_a, label_b, n_a, n_b,
                   round(CASE WHEN na * nb > 0
                         THEN dot / (na * nb) END, 6)
                     AS centroid_cosine
            FROM pairs ORDER BY label_a, label_b
        """,
    }
