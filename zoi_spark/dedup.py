"""Deduplication operators for web-scale training-data pipelines.

Five strategies, all DataFrame-native:

* exact            — hash-groupBy on a canonical fingerprint
* n-gram Jaccard   — shingle-set similarity on candidate pairs
* MinHash + LSH    — shingles → minhash signature → banded buckets →
                     bucket-join candidates → exact-Jaccard verify
* SimHash          — 64-bit near-dup hash via per-bit token votes
* embedding cosine — near-dup via normalized-vector dot product

Scale notes: every strategy avoids the O(n²) cross join. LSH banding
turns pairing into an equi-join on (band, bucket-hash); exact dedup is
one hash aggregation with map-side partial combine. MinHash signatures
are pure Column expressions (xxhash64 + universal-hash permutations) —
no Python in the signature path; SimHash uses one Arrow-vectorized
pandas UDF (bit votes have no tractable Column form).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import char_shingles, fingerprint, normalize_text, word_shingles

# Mersenne prime 2^31-1 for universal hashing: with h, a, b < 2^31 the
# product a*h + b stays below 2^62, inside signed-64 range — Spark 4
# runs ANSI mode and hard-fails on long overflow, so the hash domain is
# sized to make overflow impossible rather than wrapped. Parameters
# derive deterministically from the permutation index (no RNG at plan
# time — plans are identical across runs/resumes).
_MERSENNE = (1 << 31) - 1


def _perm_params(i: int) -> tuple[int, int]:
    # splitmix64-style mixing of the index → (a, b), a nonzero
    x = (i + 1) * 0x9E3779B97F4A7C15 % (1 << 64)
    x ^= x >> 30
    x = x * 0xBF58476D1CE4E5B9 % (1 << 64)
    a = (x % (_MERSENNE - 1)) + 1
    b = (x >> 13) % _MERSENNE
    return a, b


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) documents:
    ``(fp, n_docs, keep_id)`` for every group with >1 member.
    One hash shuffle on the fingerprint; partial agg map-side."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each identical-content group.
    Window over the fingerprint hash — one shuffle, no join."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


# ---------------------------------------------------------------------------
# n-gram Jaccard on candidate pairs
# ---------------------------------------------------------------------------

def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two array<string> columns (set semantics)."""
    ad, bd = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(ad, bd)).cast("double")
    union = F.size(F.array_union(ad, bd)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def hashed_shingles(text: Column, n: int, *, chars: bool = False) -> Column:
    """Distinct shingles hashed to int64 (xxhash64). Set operations on
    longs are several times cheaper than on UTF8 strings, and Jaccard
    over hashes equals Jaccard over strings up to a ~n²/2⁶⁴ collision
    probability — negligible at any real shingle count."""
    sh = (char_shingles if chars else word_shingles)(text, n)
    return F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s)))


def ngram_jaccard_pairs(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8,
                        block_col: str | None = None,
                        chars: bool = False) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-Jaccard ≥ threshold.

    WARNING: without ``block_col`` this is a full self-join — fine for
    verification corpora, quadratic at scale. At 100 TB pass a blocking
    key (e.g. lang, or an LSH band from :func:`minhash_lsh_candidates`)
    so the join is an equi-join per block.

    Per-pair cost engineering (the hot loop at scale):

    * shingles are int64 hashes, not strings (see
      :func:`hashed_shingles`) — measured ~4× on the pair join;
    * a size-ratio prefilter runs before any set op: J(A,B) ≥ t forces
      t·|B| ≤ |A| ≤ |B|/t, so mismatched sizes never pay an intersect;
    * |A∪B| is derived as |A|+|B|−|A∩B| — one hash-set build per pair
      instead of two. Catalyst pushes the threshold predicate below the
      projection, so the intersect runs once per candidate and the
      surviving pairs (a tiny fraction) recompute it once more.
    """
    base = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        hashed_shingles(F.col(text_col), n, chars=chars).alias("__shingles"),
    )
    # the pair join's cost lives on the STREAMED side (each of its rows
    # probes the broadcast/hash side for every in-block partner), so its
    # task count bounds parallelism. Small single-file inputs scan as
    # 1-2 splits — spread them across the cluster; at real scale the
    # scan already has thousands of splits and this is a cheap no-op
    # relative to the pair work.
    par = df.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(par).alias("a")
    b = base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    sa = F.size(F.col("a.__shingles")).cast("double")
    sb = F.size(F.col("b.__shingles")).cast("double")
    ratio_ok = (sa >= threshold * sb) & (sb >= threshold * sa)
    inter = F.size(F.array_intersect(F.col("a.__shingles"),
                                     F.col("b.__shingles"))).cast("double")
    union = sa + sb - inter
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        a.join(b, cond)
        .where(ratio_ok)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """array<long> minhash signature in ONE pass over the shingles.

    A naive formulation (num_hashes separate ``array_min(transform(…))``
    expressions) re-traverses the shingle array per permutation and
    blows up the codegen tree ~64×. Instead fold once with
    ``aggregate``: the accumulator is the running min per permutation
    and each shingle updates all permutations via ``zip_with`` against a
    literal (a, b) parameter array."""
    params = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
        for a, b in (_perm_params(i) for i in range(num_hashes))])
    init = F.array(*[F.lit(_MERSENNE).cast("long")] * num_hashes)
    return F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(
            acc, params,
            lambda m, p: F.least(
                m, F.pmod(F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
                          * p.getField("a") + p.getField("b"),
                          F.lit(_MERSENNE)))),
    )


def with_minhash(df: DataFrame, *, text_col: str = "text",
                 num_hashes: int = 64, shingle_n: int = 3,
                 chars: bool = False) -> DataFrame:
    sh = (char_shingles if chars else word_shingles)(F.col(text_col), shingle_n)
    return df.withColumn("__minhash",
                         minhash_signature(F.array_distinct(sh), num_hashes))


def minhash_lsh_candidates(df: DataFrame, *, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 64,
                           bands: int = 16, shingle_n: int = 3,
                           chars: bool = False) -> DataFrame:
    """Candidate near-dup pairs via banded LSH.

    signature → ``bands`` slices → hash each slice → explode to
    (band, bucket) rows → self-equi-join on (band, bucket) → distinct
    pairs. The join is an equi-join: Catalyst shuffles both sides on
    the band key, so cost is proportional to bucket collisions, not n².
    """
    rows_per_band = num_hashes // bands
    sig_df = with_minhash(df.select(id_col, text_col), text_col=text_col,
                          num_hashes=num_hashes, shingle_n=shingle_n,
                          chars=chars)
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.concat_ws(
                ",", F.slice(F.col("__minhash"), b * rows_per_band + 1,
                             rows_per_band))).alias("bucket"),
        ),
    )
    # persist the tiny (id, band, bucket) table: the self-join would
    # otherwise recompute every signature on BOTH sides of the join
    buckets = (sig_df
               .withColumn("__band", F.explode(band_arr))
               .select(id_col, F.col("__band.band").alias("band"),
                       F.col("__band.bucket").alias("bucket"))
               .persist())
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(df: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.8,
                        num_hashes: int = 64, bands: int = 16,
                        shingle_n: int = 3, chars: bool = False) -> DataFrame:
    """LSH candidates verified with exact shingle Jaccard — the full
    minhash near-dup operator (candidates ⊇ true pairs, verify prunes
    false positives)."""
    cands = minhash_lsh_candidates(df, id_col=id_col, text_col=text_col,
                                   num_hashes=num_hashes, bands=bands,
                                   shingle_n=shingle_n, chars=chars)
    sets_df = df.select(
        F.col(id_col),
        hashed_shingles(F.col(text_col), shingle_n, chars=chars)
        .alias("__shingles"))
    a = sets_df.alias("sa")
    b = sets_df.alias("sb")
    sa = F.size(F.col("sa.__shingles")).cast("double")
    sb = F.size(F.col("sb.__shingles")).cast("double")
    inter = F.size(F.array_intersect(F.col("sa.__shingles"),
                                     F.col("sb.__shingles"))).cast("double")
    union = sa + sb - inter
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        cands
        .join(a, cands["id_a"] == F.col(f"sa.{id_col}"))
        .join(b, cands["id_b"] == F.col(f"sb.{id_col}"))
        .select("id_a", "id_b", F.round(sim, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_batch(tokens: pd.Series) -> pd.Series:
    """Arrow-batched 64-bit simhash: per-token FNV-1a hash, per-bit
    votes, sign → bit. numpy-vectorized within each document."""
    import numpy as np

    out = np.zeros(len(tokens), dtype=np.int64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            continue
        hs = np.fromiter(
            (_fnv1a64(t) for t in toks), dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sim |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sim)
    return pd.Series(out)


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x100000001B3) % (1 << 64)
    return h


def with_simhash(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    udf = F.pandas_udf(_simhash_batch, T.LongType())
    tokens = F.split(normalize_text(F.col(text_col)), " ")
    return df.withColumn("__simhash", udf(tokens))


def simhash_near_dups(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3,
                      prefix_bits: int = 16) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Blocking: equal high ``prefix_bits`` → equi-join per block (docs
    differing within the prefix are missed — standard simhash
    multi-table trade-off; raise coverage by unioning rotations)."""
    sim_df = with_simhash(df.select(id_col, text_col), text_col=text_col)
    blocked = sim_df.withColumn(
        "__block", F.shiftrightunsigned(F.col("__simhash"), 64 - prefix_bits))
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.__simhash").bitwiseXOR(F.col("b.__simhash")))
    return (
        a.join(b, "__block")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two array<float|double> columns via zip_with +
    aggregate — JVM-side, no UDF."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0),
                            lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_near_dups(df: DataFrame, *, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95,
                        block_col: str | None = None) -> DataFrame:
    """Pairs with cosine ≥ threshold. Without a block column this is a
    self cross-join (verification scale only); at scale pass an LSH
    bucket from similarity.random_hyperplane_bucket as ``block_col``.

    Vector norms are folded ONCE per row before the pair join (the
    same left-to-right fold as the per-pair form, so the quotient is
    bitwise identical) — per-pair work is a single dot product instead
    of three array folds."""
    norm = F.sqrt(F.aggregate(
        F.col(vec_col), F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))
    base = df.select(id_col, vec_col, norm.alias("__norm"),
                     *( [block_col] if block_col else [] ))
    # spread the streamed side: pair-probe parallelism is bounded by its
    # task count (see ngram_jaccard_pairs)
    par = df.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(par).alias("a")
    b = base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    dot = F.aggregate(
        F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    na, nb = F.col("a.__norm"), F.col("b.__norm")
    sim = F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
    return (a.join(b, cond)
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.round(sim, 6).alias("cosine"))
            .where(F.col("cosine") >= threshold))
