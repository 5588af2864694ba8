"""Deduplication operators for web-scale training-data pipelines.

All DataFrame-native:

* exact              — hash-groupBy on a canonical fingerprint
* n-gram Jaccard     — shingle-set similarity on candidate pairs
* MinHash + LSH      — shingles → minhash signature → banded buckets →
                       bucket-join candidates (optional mega-bucket
                       cap) → exact-Jaccard verify
* SimHash            — 60-bit near-dup hash via per-bit token votes
* embedding cosine   — near-dup via normalized-vector dot product
* duplicate clusters — connected components over near-dup pairs
                       (min-label propagation → keep-one-per-cluster)

Scale notes: every strategy avoids the O(n²) cross join. LSH banding
turns pairing into an equi-join on (band, bucket-hash); exact dedup is
one hash aggregation with map-side partial combine. MinHash and SimHash
hash every token/shingle string ONCE, JVM-side; the per-bit vote /
per-permutation min fold then runs as an Arrow-vectorized numpy batch
over the numeric hash arrays (default — no per-token Python anywhere)
or as a pure Column ``aggregate`` (``engine='column'``, zero Python in
the plan, bit-identical output, ~10× slower: Catalyst higher-order
folds are CodegenFallback and copy the accumulator array per element).
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


def incremental_new_docs(new_df: DataFrame, base_df: DataFrame, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         broadcast_base: bool = False) -> DataFrame:
    """Cross-snapshot incremental dedup: rows of the NEW crawl snapshot
    whose normalized-content fingerprint does not already exist in the
    BASE corpus — the admission filter run on every fresh Common-Crawl
    dump before it is folded into a training corpus (re-crawled pages
    are byte-identical re-fetches and must not re-enter).

    Shape at 10^12 docs: a LEFT ANTI hash join on the md5 fingerprint —
    both sides shuffle once on a uniformly distributed 128-bit key, so
    there is no skew by construction (unlike joining on url/host). The
    base side projects to the single fingerprint column before the
    join (column pruning reaches the base scan), and only the *new*
    snapshot — the small side of the workload — is rewritten. Set
    ``broadcast_base=True`` only when the base fingerprint set fits an
    executor (bootstrap runs); at full corpus scale the shuffle join
    is the correct plan and AQE keeps it.

    Within-snapshot duplicates are NOT collapsed here — compose with
    `exact_dedup` for that; this operator is deliberately the
    snapshot-vs-corpus step so the two concerns stay independently
    testable (same split as the reference's per-rule tests,
    test/zoi_test.exs strategy per SURVEY §5).
    """
    fp = fingerprint(F.col(text_col)).alias("__zoi_fp")
    base_fps = base_df.select(fp).distinct()
    if broadcast_base:
        base_fps = F.broadcast(base_fps)
    return (new_df.withColumn("__zoi_fp", fingerprint(F.col(text_col)))
            .join(base_fps, "__zoi_fp", "left_anti")
            .drop("__zoi_fp"))


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


def _jaccard_block_batch_factory(threshold: float):
    """applyInPandas kernel: all within-block exact Jaccards via ONE
    incidence-matrix matmul per block. Shingle sets become rows of a
    (n_docs × n_distinct_hashes) 0/1 matrix M; G = M·Mᵀ yields every
    pairwise INTERSECTION size in one BLAS call, |A∪B| = |A|+|B|−|A∩B|.
    All counts are exact integers (float64 holds them exactly), so the
    output is bit-identical to the expression engine's
    array_intersect/size arithmetic — same values, ~10² less time than
    an interpreted per-pair set op."""
    import numpy as np
    import pandas as pd

    def batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        # id columns keep their incoming dtype (long ids stay int64,
        # string/UUID ids stay objects) — pandas string sort is
        # code-point order, which equals Spark's UTF-8 binary `<`
        empty = pd.DataFrame({"id_a": pdf["__id"].iloc[:0],
                              "id_b": pdf["__id"].iloc[:0],
                              "jaccard": pd.Series([], dtype="float64")})
        if n < 2:
            return empty
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        ids = pdf["__id"].to_numpy()
        sets = [np.asarray(a if a is not None else [], dtype=np.int64)
                for a in pdf["__shingles"]]
        lens = np.array([s.size for s in sets], dtype=np.int64)
        if lens.sum() == 0:
            return empty
        uniq, inv = np.unique(np.concatenate(sets), return_inverse=True)
        M = np.zeros((n, uniq.size), dtype=np.float32)
        off = 0
        for r, s in enumerate(sets):
            M[r, inv[off:off + s.size]] = 1.0
            off += s.size
        G = (M @ M.T).astype(np.float64)
        iu, ju = np.triu_indices(n, k=1)
        inter = G[iu, ju]
        union = lens[iu] + lens[ju] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            j = np.where(union > 0, inter / union, 0.0)
        j = np.round(j, 6)
        keep = j >= threshold
        return pd.DataFrame({"id_a": ids[iu[keep]], "id_b": ids[ju[keep]],
                             "jaccard": j[keep]})

    return batch


def ngram_jaccard_pairs(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8,
                        block_col: str | None = None,
                        max_block_size: int | None = None,
                        chars: bool = False,
                        engine: str = "arrow") -> DataFrame:
    """All pairs (id_a < id_b) with shingle-Jaccard ≥ threshold.

    WARNING: without ``block_col`` this is all-pairs — fine for
    verification corpora, quadratic at scale. At 100 TB pass a blocking
    key (e.g. lang, or an LSH band from :func:`minhash_lsh_candidates`)
    so pair work stays within blocks — AND ``max_block_size``, which
    EXCLUDES blocks above the cap from pairing (the mega-bucket
    contract of :func:`minhash_lsh_candidates`): in-block cost is
    quadratic, so one unbounded block defeats the blocking no matter
    how rare, and capped blocks' members belong to the fingerprint/LSH
    paths instead.

    ``engine='arrow'`` (default): group by block, compute every
    in-block pairwise intersection with one incidence-matrix matmul
    (see :func:`_jaccard_block_batch_factory`) — exact integer counts,
    bit-identical to the expression engine. ``engine='column'``: pure
    expression self-equi-join; per-pair cost engineering there:

    * shingles are int64 hashes, not strings (see
      :func:`hashed_shingles`) — measured ~4× on the pair join;
    * a size-ratio prefilter runs before any set op: J(A,B) ≥ t forces
      t·|B| ≤ |A| ≤ |B|/t, so mismatched sizes never pay an intersect;
    * |A∪B| is derived as |A|+|B|−|A∩B| — one hash-set build per pair
      instead of two.
    """
    # arrow engine + word shingles: numeric-domain shingles from JVM
    # token hashes (ONE Arrow batch — the string-domain construction is
    # a CodegenFallback higher-order chain measured ~20× slower).
    # Jaccard is invariant to the shingle hash domain (set semantics,
    # ~2⁻⁶⁴ collisions), so both engines yield identical values.
    shingle_col = (hashed_shingles_arrow(F.col(text_col), n)
                   if engine == "arrow" and not chars
                   else hashed_shingles(F.col(text_col), n, chars=chars))
    base = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        shingle_col.alias("__shingles"),
    )
    if max_block_size is not None:
        if block_col is None:
            raise ValueError("max_block_size requires block_col")
        sizes = (df.groupBy(block_col)
                 .agg(F.count("*").alias("__bs"))
                 .where(F.col("__bs") <= max_block_size)
                 .drop("__bs"))
        base = base.join(sizes, block_col)

    if engine == "arrow":
        block = F.col(block_col) if block_col else F.lit(0)
        # ids flow through the kernel in their ORIGINAL type — string/
        # UUID ids must not be cast to long (ANSI mode aborts; legacy
        # mode nulls them and silently drops every pair)
        id_type = df.schema[id_col].dataType
        grouped = base.select(F.col(id_col).alias("__id"),
                              F.col("__shingles"),
                              block.alias("__block"))
        out_schema = T.StructType([
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("jaccard", T.DoubleType()),
        ])
        return (grouped.groupBy("__block")
                .applyInPandas(_jaccard_block_batch_factory(threshold),
                               out_schema))
    if engine != "column":
        raise ValueError(f"unknown ngram_jaccard_pairs engine: {engine!r}")
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

# Odd 64-bit multipliers + splitmix finalizer for the vectorized
# numeric shingle mix (order-sensitive combination of consecutive token
# hashes). Deliberate uint64 wraparound — numpy unsigned arithmetic.
_MIX_K = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _splitmix_finalize(z):
    import numpy as np
    z = z.copy()
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _mix_multiplier(j: int) -> int:
    """Distinct odd 64-bit multiplier per token offset. The first three
    are the published xxhash/splitmix constants; beyond that each offset
    gets its own splitmix-finalized multiplier — cycling the three
    constants would make offsets j and j+3 commute (shingles differing
    only by swapping those tokens would collide, breaking the
    order-sensitivity claim for shingle_n > 3)."""
    if j < len(_MIX_K):
        return _MIX_K[j]
    x = (j + 1) * 0x9E3779B97F4A7C15 % (1 << 64)
    x ^= x >> 30
    x = x * 0xBF58476D1CE4E5B9 % (1 << 64)
    x ^= x >> 27
    x = x * 0x94D049BB133111EB % (1 << 64)
    x ^= x >> 31
    return x | 1


def _numeric_shingles(h, shingle_n: int):
    """Distinct shingle hashes from a token-hash vector, fully
    vectorized: shingle_i = finalize(Σ_j K_j·h_{i+j}) with a distinct
    odd multiplier K_j per offset (order-sensitive for every
    shingle_n). Short docs (< shingle_n tokens) zero-pad to one
    whole-doc shingle — mirroring word_shingles' single degenerate
    shingle. Distinctness matches the string-shingle domain up to
    ~2⁻⁶⁴ collisions (Jaccard over either domain is therefore equal —
    the same argument hashed_shingles already relies on)."""
    import numpy as np

    if h.size < shingle_n:
        padded = np.zeros(shingle_n, dtype=np.uint64)
        padded[:h.size] = h
        h = padded
    acc = np.zeros(h.size - shingle_n + 1, dtype=np.uint64)
    for j in range(shingle_n):
        acc += np.uint64(_mix_multiplier(j) | 1) * \
            h[j:h.size - shingle_n + 1 + j]
    return np.unique(_splitmix_finalize(acc))


def _minhash_from_tokens_factory(num_hashes: int, shingle_n: int):
    """ONE Arrow batch for the whole signature pipeline: token hashes
    (already computed JVM-side) → numeric shingles → distinct →
    (n_shingles × k) universal-hash matrix → column min. numpy only —
    no per-token Python anywhere. Shingle construction in the string
    domain (transform over sequence + slice + concat_ws) is itself a
    CodegenFallback higher-order chain, measured ~20× the token scan —
    this path never builds a shingle string at all."""
    import numpy as np
    import pandas as pd

    params = [(a, b) for a, b in (_perm_params(i) for i in range(num_hashes))]
    A = np.array([p[0] for p in params], dtype=np.uint64)
    B = np.array([p[1] for p in params], dtype=np.uint64)
    M = np.uint64(_MERSENNE)
    empty = [int(_MERSENNE)] * num_hashes

    def batch(tok_hashes: "pd.Series") -> "pd.Series":
        out: list = []
        for arr in tok_hashes:
            if arr is None:
                out.append(None)
                continue
            h = np.asarray(arr, dtype=np.uint64)
            if h.size == 0:
                out.append(list(empty))
                continue
            sh = _numeric_shingles(h, shingle_n) % M
            sig = ((sh[:, None] * A + B) % M).min(axis=0)
            out.append(sig.astype(np.int64).tolist())
        return pd.Series(out, dtype="object")

    return batch


def _shingle_hash_factory(shingle_n: int):
    """Arrow batch emitting just the distinct numeric shingle hashes
    (the verify-stage set column) — same shingle domain as
    :func:`_minhash_from_tokens_factory` so candidates and verify agree."""
    import numpy as np
    import pandas as pd

    def batch(tok_hashes: "pd.Series") -> "pd.Series":
        out: list = []
        for arr in tok_hashes:
            if arr is None:
                out.append(None)
                continue
            h = np.asarray(arr, dtype=np.uint64)
            if h.size == 0:
                out.append([])
                continue
            sh = _numeric_shingles(h, shingle_n)
            out.append(sh.astype(np.int64).tolist())
        return pd.Series(out, dtype="object")

    return batch


def _token_hashes(text: Column) -> Column:
    """array<long> xxhash64 per whitespace token — one cheap JVM pass
    (transform over split; no sequence/slice higher-order chain)."""
    return F.transform(F.split(normalize_text(text), " "),
                       lambda t: F.xxhash64(t))


def hashed_shingles_arrow(text: Column, n: int) -> Column:
    """Distinct shingle hashes via the numeric-domain Arrow path."""
    from pyspark.sql import types as T
    udf = F.pandas_udf(_shingle_hash_factory(n), T.ArrayType(T.LongType()))
    return udf(_token_hashes(text))


def _minhash_batch_factory(num_hashes: int):
    """Vectorized minhash over PRE-HASHED shingles: (n_shingles × k)
    universal-hash matrix, column min — numpy only, no per-shingle
    Python. Exact same integers as the Column fold (h·a+b < 2^62 is
    exact in uint64)."""
    import numpy as np
    import pandas as pd

    params = [(a, b) for a, b in (_perm_params(i) for i in range(num_hashes))]
    A = np.array([p[0] for p in params], dtype=np.uint64)
    B = np.array([p[1] for p in params], dtype=np.uint64)
    M = np.uint64(_MERSENNE)
    empty = [int(_MERSENNE)] * num_hashes

    def batch(hash_arrays: "pd.Series") -> "pd.Series":
        out: list = []
        for arr in hash_arrays:
            if arr is None:
                out.append(None)
                continue
            hs = np.asarray(arr, dtype=np.uint64)
            if hs.size == 0:
                out.append(list(empty))
                continue
            sig = ((hs[:, None] * A + B) % M).min(axis=0)
            out.append(sig.astype(np.int64).tolist())
        return pd.Series(out, dtype="object")

    return batch


def minhash_signature(shingles: Column, num_hashes: int = 64,
                      engine: str = "arrow") -> Column:
    """array<long> minhash signature. Shingle strings are hashed into
    the Mersenne domain ONCE, JVM-side (a naive per-permutation
    formulation re-hashes each string 64×); the permutation fold then
    runs either as

    * ``engine='arrow'`` (default): one Arrow batch over the
      ``array<long>`` hashes — a (n × 64) numpy matrix min per doc.
      The expression fold below is CodegenFallback (interpreted, and
      ``zip_with`` copies the 64-long accumulator per shingle), so the
      vectorized batch wins by ~an order of magnitude.
    * ``engine='column'``: pure Column ``aggregate`` —
      running min per permutation via ``zip_with`` against a literal
      (a, b) array; zero Python in the plan, bit-identical output.
    """
    hashed = F.transform(shingles,
                         lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    if engine == "arrow":
        from pyspark.sql import types as T
        udf = F.pandas_udf(_minhash_batch_factory(num_hashes),
                           T.ArrayType(T.LongType()))
        return udf(hashed)
    if engine != "column":
        raise ValueError(f"unknown minhash engine: {engine!r}")
    params = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
        for a, b in (_perm_params(i) for i in range(num_hashes))])
    init = F.array(*[F.lit(_MERSENNE).cast("long")] * num_hashes)
    return F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(
            acc, params,
            lambda m, p: F.least(
                m, F.pmod(h * p.getField("a") + p.getField("b"),
                          F.lit(_MERSENNE)))),
    )


def with_minhash(df: DataFrame, *, text_col: str = "text",
                 num_hashes: int = 64, shingle_n: int = 3,
                 chars: bool = False, engine: str = "arrow") -> DataFrame:
    """Attach the ``__minhash`` signature column.

    ``engine='arrow'`` (default, word shingles only): JVM token hashes
    → ONE fused Arrow batch (numeric shingles + distinct + signature)
    — skips string-shingle construction entirely (the dominant cost of
    the column path). ``engine='column'``: string shingles + pure
    Column fold, zero Python in the plan."""
    if engine == "arrow" and not chars:
        from pyspark.sql import types as T
        udf = F.pandas_udf(_minhash_from_tokens_factory(num_hashes, shingle_n),
                           T.ArrayType(T.LongType()))
        return df.withColumn("__minhash", udf(_token_hashes(F.col(text_col))))
    sh = (char_shingles if chars else word_shingles)(F.col(text_col), shingle_n)
    return df.withColumn("__minhash",
                         minhash_signature(F.array_distinct(sh), num_hashes,
                                           engine=engine))


def suggest_minhash_bands(num_hashes: int = 64, threshold: float = 0.8,
                          fp_weight: float = 0.25) -> int:
    """Threshold-derived band count: pick the ``b`` (with ``r = n/b``
    rows per band) minimizing the weighted false-positive +
    false-negative mass of the S-curve ``P(candidate) = 1-(1-s^r)^b``
    around ``threshold`` — the standard MMDS ch.3 tuning (same
    selection datasketch's ``_optimal_param`` performs). The default
    weighting biases toward recall because the pipeline verifies
    candidates with exact Jaccard: a false positive costs one pruned
    comparison, a false negative is an unrecoverable missed duplicate.
    Pure numeric integration at plan time, no data peek;
    deterministic.

    Constraint: only bandings whose S-curve midpoint ``(1/b)^(1/r)``
    sits at or below ``threshold`` are considered — the midpoint is
    where candidate recall crosses 50%, so a midpoint above the query
    threshold means pairs the caller asked for are more likely missed
    than found. Within that recall floor, the weighted integral picks
    the most selective banding."""
    allowed = [b for b in range(1, num_hashes + 1)
               if num_hashes % b == 0
               and (1.0 / b) ** (b / num_hashes) <= threshold]
    if not allowed:   # threshold below every midpoint: most permissive
        allowed = [num_hashes]
    best_b, best_err = allowed[0], float("inf")
    steps = 500
    for b in allowed:
        r = num_hashes // b
        fp = fn = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s ** r) ** b
            if s < threshold:
                fp += p / steps
            else:
                fn += (1.0 - p) / steps
        err = fp * fp_weight + fn * (1.0 - fp_weight)
        if err < best_err:
            best_b, best_err = b, err
    return best_b


def suggest_max_bucket_size(n_rows: int | None = None,
                            target_pairs: int = 2_000_000) -> int:
    """Pair-work-derived mega-bucket cap: the verify stage does
    ``size·(size-1)/2`` comparisons per bucket, so cap bucket
    population at ``≈ sqrt(2·target_pairs)`` — one task's worth of
    pair work regardless of corpus size (buckets past that are
    boilerplate-degenerate, not near-dup signal). ``n_rows`` (from a
    count the caller already has) only bounds the cap for tiny
    corpora, where capping is a no-op anyway."""
    import math

    cap = max(64, math.isqrt(2 * target_pairs))
    if n_rows is not None:
        cap = min(cap, max(64, n_rows))
    return cap


def suggest_cluster_iters(n_rows: int, *, floor: int = 12,
                          ceiling: int = 48) -> int:
    """Corpus-size-derived label-propagation round budget: min-label
    spreads one hop per round, and observed near-dup chain diameters
    grow ~logarithmically with corpus size, so budget
    ``log2(n) + 8`` rounds (clamped) — enough headroom at 10^12 rows
    without letting a pathological graph spin forever."""
    import math

    return max(floor, min(ceiling, math.ceil(math.log2(max(n_rows, 2))) + 8))


def _band_bucket_table(df: DataFrame, *, id_col: str, text_col: str,
                       num_hashes: int, bands: int, shingle_n: int,
                       chars: bool, engine: str) -> DataFrame:
    """(id, band, bucket) rows: the minhash signature sliced into
    ``bands`` slices, each hashed to one bucket key. Shared by the
    self-join candidates (:func:`minhash_lsh_candidates`) and the
    cross-corpus join (:func:`minhash_lsh_join`) — both sides of any
    LSH meet must derive buckets with IDENTICAL parameters or the
    banding guarantees are void.

    explode_OUTER (band_arr is never empty, but a plain explode makes
    InferFiltersFromGenerate add a size()>0 probe filter that would
    re-inline the banding expression below the Generate)."""
    rows_per_band = num_hashes // bands
    sig_df = with_minhash(df.select(id_col, text_col), text_col=text_col,
                          num_hashes=num_hashes, shingle_n=shingle_n,
                          chars=chars, engine=engine)
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.concat_ws(
                ",", F.slice(F.col("__minhash"), b * rows_per_band + 1,
                             rows_per_band))).alias("bucket"),
        ),
    )
    return (sig_df
            .withColumn("__band", F.explode_outer(band_arr))
            .select(id_col, F.col("__band.band").alias("band"),
                    F.col("__band.bucket").alias("bucket")))


def minhash_lsh_candidates(df: DataFrame, *, id_col: str = "doc_id",
                           text_col: str = "text", num_hashes: int = 64,
                           bands: int = 16, shingle_n: int = 3,
                           chars: bool = False,
                           engine: str = "arrow",
                           max_bucket_size: int | None = None) -> DataFrame:
    """Candidate near-dup pairs via banded LSH.

    signature → ``bands`` slices → hash each slice → explode to
    (band, bucket) rows → self-equi-join on (band, bucket) → distinct
    pairs. The join is an equi-join: Catalyst shuffles both sides on
    the band key, so cost is proportional to bucket collisions, not n².

    ``max_bucket_size``: web corpora have degenerate mega-buckets
    (boilerplate/template pages hash to one bucket by the million) and
    one such bucket is a quadratic blow-up no matter how good the
    banding is. With a cap, buckets above the threshold are EXCLUDED
    from the pair join — their members are near-certain exact-level
    duplicates and belong to the cheap fingerprint groupBy path
    (exact_duplicates) instead of the pairwise one. The bucket-size
    count is one extra aggregation over the (id, band, bucket) table;
    the pruned join's worst-case per-bucket work is then bounded by
    max_bucket_size², independent of corpus size.
    """
    # persist the tiny (id, band, bucket) table: the self-join would
    # otherwise recompute every signature on BOTH sides of the join.
    # Lifecycle: the cache is NOT leaked for the session — the persisted
    # frame rides along on the result as ``_zoi_persisted`` and
    # :func:`unpersist_candidates` releases it once the pairs have been
    # consumed (materialize → write/collect → unpersist).
    buckets = _band_bucket_table(df, id_col=id_col, text_col=text_col,
                                 num_hashes=num_hashes, bands=bands,
                                 shingle_n=shingle_n, chars=chars,
                                 engine=engine).persist()
    joinable = buckets
    if max_bucket_size is not None:
        sizes = (buckets.groupBy("band", "bucket")
                 .agg(F.count("*").alias("__bs"))
                 .where(F.col("__bs") <= max_bucket_size)
                 .drop("__bs"))
        joinable = buckets.join(sizes, ["band", "bucket"])
    a, b = joinable.alias("a"), joinable.alias("b")
    out = (
        a.join(b, ["band", "bucket"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    out._zoi_persisted = [buckets]
    return out


def unpersist_candidates(pairs: DataFrame) -> None:
    """Release the bucket cache a candidate/pairs DataFrame rides on
    (see :func:`minhash_lsh_candidates`). Call after the pairs have been
    materialized; a no-op for frames without an attached cache.

    CONTRACT: the ``_zoi_persisted`` handle lives on the EXACT frame
    the operator returned — any further transformation (filter, select,
    checkpoint) produces a new DataFrame without it, making this call a
    silent no-op. Either call it on the returned frame, or keep the
    handle yourself: ``cache = getattr(pairs, "_zoi_persisted", None)``
    before transforming (pipeline.CurationResult.caches does exactly
    that).

    ``_zoi_persisted`` is standardized as a LIST of cached frames;
    single-frame handles (older callers) are accepted too."""
    cached = getattr(pairs, "_zoi_persisted", None)
    if cached is None:
        return
    frames = cached if isinstance(cached, (list, tuple)) else [cached]
    for frame in frames:
        frame.unpersist()


def minhash_dedup_pairs(df: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.8,
                        num_hashes: int = 64, bands: int = 16,
                        shingle_n: int = 3, chars: bool = False,
                        engine: str = "arrow",
                        max_bucket_size: int | None = None) -> DataFrame:
    """LSH candidates verified with exact shingle Jaccard — the full
    minhash near-dup operator (candidates ⊇ true pairs, verify prunes
    false positives)."""
    cands = minhash_lsh_candidates(df, id_col=id_col, text_col=text_col,
                                   num_hashes=num_hashes, bands=bands,
                                   shingle_n=shingle_n, chars=chars,
                                   engine=engine,
                                   max_bucket_size=max_bucket_size)
    shingle_col = (hashed_shingles_arrow(F.col(text_col), shingle_n)
                   if engine == "arrow" and not chars
                   else hashed_shingles(F.col(text_col), shingle_n,
                                        chars=chars))
    sets_df = df.select(F.col(id_col), shingle_col.alias("__shingles"))
    a = sets_df.alias("sa")
    b = sets_df.alias("sb")
    sa = F.size(F.col("sa.__shingles")).cast("double")
    sb = F.size(F.col("sb.__shingles")).cast("double")
    inter = F.size(F.array_intersect(F.col("sa.__shingles"),
                                     F.col("sb.__shingles"))).cast("double")
    union = sa + sb - inter
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    out = (
        cands
        .join(a, cands["id_a"] == F.col(f"sa.{id_col}"))
        .join(b, cands["id_b"] == F.col(f"sb.{id_col}"))
        .select("id_a", "id_b", F.round(sim, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
    # propagate the bucket cache so unpersist_candidates works on the
    # verified pairs too
    out._zoi_persisted = list(getattr(cands, "_zoi_persisted", []) or [])
    return out


def minhash_lsh_join(left: DataFrame, right: DataFrame, *,
                     left_id: str = "doc_id", left_text: str = "text",
                     right_id: str = "probe_id",
                     right_text: str = "probe_text",
                     threshold: float = 0.8, num_hashes: int = 64,
                     bands: int = 16, shingle_n: int = 3,
                     chars: bool = False, engine: str = "arrow",
                     max_bucket_size: int | None = None,
                     broadcast_right: bool = True) -> DataFrame:
    """Cross-corpus fuzzy join: (left_id, right_id, jaccard) for every
    pair whose word-shingle Jaccard ≥ ``threshold`` AND that collides
    in at least one LSH band — fuzzy BENCHMARK DECONTAMINATION at
    corpus scale (is any training document a near-copy of an eval
    document?), cross-snapshot near-dup linking, and fuzzy
    entity/record matching. The self-join operators
    (:func:`minhash_dedup_pairs`) answer "which corpus docs duplicate
    EACH OTHER"; this answers "which LEFT docs duplicate a RIGHT doc"
    without ever pairing left against left — at 10^12 × 10^5
    (corpus × benchmark) that difference is the whole job.

    Both sides derive band buckets with IDENTICAL hash parameters
    (same signature family, same banding — the S-curve collision
    guarantee only holds on a shared hash family), meet in ONE
    equi-join on (band, bucket), and candidates are verified with
    exact hashed-shingle Jaccard. The right side is typically
    benchmark-sized → its bucket table is broadcast by AQE and the
    left side's only shuffles are its own bucket aggregation (when
    ``max_bucket_size`` is set) and the final verify join on ids.

    ``max_bucket_size`` caps LEFT-side mega-buckets exactly like
    :func:`minhash_lsh_candidates` — a boilerplate bucket with 10^6
    left members colliding with one right probe is 10^6 verify pairs;
    above the cap those buckets are excluded (handle their members via
    exact fingerprint matching instead).

    Returns the verified pairs; release the bucket caches with
    :func:`unpersist_candidates`. ``left_id`` and ``right_id`` must
    differ (the output carries both as columns); alias one side first.
    """
    if left_id == right_id:
        raise ValueError(
            "minhash_lsh_join: left_id and right_id must differ "
            f"(both {left_id!r}) — alias one side's id column first")
    lb = _band_bucket_table(left, id_col=left_id, text_col=left_text,
                            num_hashes=num_hashes, bands=bands,
                            shingle_n=shingle_n, chars=chars,
                            engine=engine).persist()
    rb = _band_bucket_table(right, id_col=right_id, text_col=right_text,
                            num_hashes=num_hashes, bands=bands,
                            shingle_n=shingle_n, chars=chars,
                            engine=engine).persist()
    joinable = lb
    if max_bucket_size is not None:
        sizes = (lb.groupBy("band", "bucket")
                 .agg(F.count("*").alias("__bs"))
                 .where(F.col("__bs") <= max_bucket_size)
                 .drop("__bs"))
        joinable = lb.join(sizes, ["band", "bucket"])
    cands = (joinable.join(rb, ["band", "bucket"])
             .select(left_id, right_id).distinct())

    shingle_col = (hashed_shingles_arrow
                   if engine == "arrow" and not chars
                   else lambda c, n: hashed_shingles(c, n, chars=chars))
    lsets = left.select(F.col(left_id),
                        shingle_col(F.col(left_text), shingle_n)
                        .alias("__lsh"))
    rsets = right.select(F.col(right_id),
                         shingle_col(F.col(right_text), shingle_n)
                         .alias("__rsh"))
    sa = F.size("__lsh").cast("double")
    sb = F.size("__rsh").cast("double")
    inter = F.size(F.array_intersect(F.col("__lsh"),
                                     F.col("__rsh"))).cast("double")
    union = sa + sb - inter
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    rside = F.broadcast(rsets) if broadcast_right else rsets
    out = (cands.join(lsets, left_id).join(rside, right_id)
           .select(left_id, right_id, F.round(sim, 6).alias("jaccard"))
           .where(F.col("jaccard") >= threshold))
    out._zoi_persisted = [lb, rb]
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

# 60-bit simhash: both token-hash flavors (masked xxhash64 and
# md5-prefix) land in [0, 2^60) so every bit op below stays inside
# signed-64 with headroom (2·2^59 = 2^60 < 2^63 — no ANSI overflow).
SIMHASH_BITS = 60


def token_hash60(tok: Column, *, hash: str = "xxhash64") -> Column:
    """Non-negative 60-bit token hash.

    * ``xxhash64`` (default, fastest JVM path): xxhash64 folded into
      [0, 2^60) with pmod.
    * ``md5``: first 15 hex chars of md5 — bit-identical to DuckDB's
      ``('0x' || substr(md5(t),1,15))::BIGINT``, which is what lets the
      SQL oracle recompute the full simhash (driver contract).
    """
    if hash == "xxhash64":
        return F.pmod(F.xxhash64(tok), F.lit(1 << SIMHASH_BITS))
    if hash == "md5":
        return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown token hash: {hash!r}")


def _bitvote_batch(hash_arrays: "pd.Series") -> "pd.Series":
    """Arrow-vectorized bit votes over PRE-HASHED token arrays.

    The token hashing already happened JVM-side (``token_hash60``) — the
    batch receives ``array<long>`` columns and does ONLY numpy matrix
    math per document (no per-token Python, which was the r1 version's
    scale-killer). Per doc: one (n_tokens × 60) bit matrix, column sums,
    majority mask, weighted sum — all vectorized."""
    import numpy as np

    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    pows = (np.uint64(1) << shifts).astype(np.int64)
    out: list = []
    for arr in hash_arrays:
        if arr is None:
            out.append(None)
            continue
        hs = np.asarray(arr, dtype=np.uint64)
        if hs.size == 0:
            out.append(0)
            continue
        bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        majority = 2 * bits.sum(axis=0) > hs.size
        out.append(int((pows * majority).sum()))
    return pd.Series(out, dtype="object")


def simhash(text: Column, *, hash: str = "xxhash64",
            engine: str = "arrow") -> Column:
    """60-bit simhash over whitespace tokens of the normalized text.

    Both engines hash every token ONCE, JVM-side, via
    :func:`token_hash60`; they differ only in how the per-bit majority
    vote is folded:

    * ``engine='arrow'`` (default): one Arrow-batched pandas UDF over
      the ``array<long>`` hash column — numpy bit-matrix math per doc,
      no per-token Python anywhere (measured ~10× the expression fold:
      Catalyst's ``aggregate``+``zip_with`` is CodegenFallback and
      copies the 60-long accumulator per token).
    * ``engine='column'``: pure Column expressions — zero Python in the
      plan (bit j of h = ``pmod(h, 2^{j+1}) >= 2^j``; set iff
      ``2·votes_j > n``, ties → 0). Use where a UDF is unacceptable;
      output is bit-identical to the arrow engine.
    """
    tokens = F.split(normalize_text(text), " ")
    hs = F.transform(tokens, lambda t: token_hash60(t, hash=hash))
    if engine == "arrow":
        from pyspark.sql import types as T
        udf = F.pandas_udf(_bitvote_batch, T.LongType())
        return udf(hs)
    if engine != "column":
        raise ValueError(f"unknown simhash engine: {engine!r}")
    pows = F.array(*[F.lit(1 << j).cast("long") for j in range(SIMHASH_BITS)])
    init = F.array(*[F.lit(0).cast("long")] * SIMHASH_BITS)
    votes = F.aggregate(
        hs, init,
        lambda acc, h: F.zip_with(
            acc, pows,
            lambda a, p: a + F.when(F.pmod(h, p * 2) >= p, F.lit(1))
                              .otherwise(F.lit(0)).cast("long")))
    n = F.size(hs)
    return F.aggregate(
        F.zip_with(votes, pows,
                   lambda v, p: F.when(v * 2 > n, p)
                                 .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def with_simhash(df: DataFrame, *, text_col: str = "text",
                 hash: str = "xxhash64", engine: str = "arrow") -> DataFrame:
    return df.withColumn("__simhash",
                         simhash(F.col(text_col), hash=hash, engine=engine))


def simhash_near_dups(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3,
                      prefix_bits: int = 16,
                      hash: str = "xxhash64", engine: str = "arrow") -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Blocking: equal high ``prefix_bits`` → equi-join per block (docs
    differing within the prefix are missed — standard simhash
    multi-table trade-off; raise coverage by unioning rotations).

    The tiny (id, simhash, block) projection is persisted for the
    self-join — both sides would otherwise recompute the hashing pass
    over the full text. Same lifecycle contract as
    :func:`minhash_lsh_candidates`: release with
    :func:`unpersist_candidates` after materializing."""
    sim_df = with_simhash(df.select(id_col, text_col), text_col=text_col,
                          hash=hash, engine=engine)
    blocked = (sim_df
               .select(id_col, "__simhash",
                       F.shiftrightunsigned(
                           F.col("__simhash"),
                           SIMHASH_BITS - prefix_bits).alias("__block"))
               .persist())
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.__simhash").bitwiseXOR(F.col("b.__simhash")))
    out = (
        a.join(b, "__block")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
    out._zoi_persisted = [blocked]
    return out


# ---------------------------------------------------------------------------
# winnowing-overlap near-dup (MOSS-style shared local fingerprints)
# ---------------------------------------------------------------------------

def winnowing_overlap_pairs(df: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 5, w: int = 8,
                            min_shared: int = 5,
                            max_hash_docs: int | None = None) -> DataFrame:
    """Pairs sharing ≥ ``min_shared`` winnowed k-gram fingerprints —
    the MOSS/plagiarism-detection shape: local (substring-level)
    overlap that survives insertions/reordering, where set-level
    Jaccard/MinHash sees two different documents.

    Plan shape at scale: explode the per-doc fingerprint set → ONE
    equi-join on the hash → count per pair. Never quadratic in the
    corpus — pair work is Σ_h df(h)², which ``max_hash_docs`` bounds:
    hashes present in more than that many docs (boilerplate n-grams,
    the web-corpus analogue of stopwords) are EXCLUDED before the join,
    the same document-frequency pruning the mega-bucket cap applies to
    LSH buckets. The (id, hash) projection is persisted for the
    self-join; release via :func:`unpersist_candidates`."""
    from .text import winnowing_fingerprints

    fp = winnowing_fingerprints(F.col(text_col), k=k, w=w)
    sel = (df.select(F.col(id_col), F.explode_outer(fp).alias("__h"))
           .where(F.col("__h").isNotNull())
           .persist())
    joinable = sel
    if max_hash_docs is not None:
        rare = (sel.groupBy("__h")
                .agg(F.count("*").alias("__df"))
                .where(F.col("__df") <= max_hash_docs)
                .drop("__df"))
        joinable = sel.join(rare, "__h")
    a, b = joinable.alias("a"), joinable.alias("b")
    out = (a.join(b, "__h")
           .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
           .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
           .agg(F.count("*").alias("n_shared"))
           .where(F.col("n_shared") >= min_shared))
    out._zoi_persisted = [sel]
    return out

def containment_pairs(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", threshold: float = 0.8,
                      shingle_n: int = 3,
                      max_shingle_docs: int | None = None) -> DataFrame:
    """Directed n-gram containment pairs: C(a→b) = |S(a)∩S(b)| / |S(a)|
    over distinct word shingles — Broder's containment (1997, "On the
    resemblance and containment of documents") next to the symmetric
    resemblance the Jaccard/MinHash operators compute. Containment is
    the signal for QUOTE/SUBSET relations: a short page embedded
    verbatim in a long one scores ~1.0 here while its Jaccard washes
    out toward |A|/|B|, so decontamination ("is this benchmark prompt
    contained in a training doc?") and sub-page detection need this
    asymmetric form.

    Returns directed rows ``(id_a, id_b, n_shared, containment)`` —
    the containment OF id_a's shingle set IN id_b — for pairs at or
    above ``threshold`` (compared on the 6-rounded value, the oracle
    convention). Both directions of a pair appear when both clear the
    gate (exact duplicates emit 1.0 each way).

    Plan shape at scale: explode distinct shingles → ONE equi-join on
    the shingle → count per directed pair. Pair work is Σ_s df(s)²,
    which ``max_shingle_docs`` bounds exactly as
    :func:`winnowing_overlap_pairs` bounds hash buckets: shingles in
    more than that many documents (boilerplate) are dropped from BOTH
    the intersection and the denominators before the join, so the
    ratio stays a true containment over the pruned universe. The
    shingle projection is persisted (it feeds the frequency table, the
    sizes, and both join sides); release via
    :func:`unpersist_candidates`.
    """
    from .text import word_shingles

    sh = (df.select(F.col(id_col),
                    F.explode(F.array_distinct(
                        word_shingles(F.col(text_col), shingle_n)))
                    .alias("__sh"))
          .persist())
    handles = [sh]
    kept = sh
    if max_shingle_docs is not None:
        rare = (sh.groupBy("__sh")
                .agg(F.count("*").alias("__df"))
                .where(F.col("__df") <= max_shingle_docs)
                .drop("__df"))
        kept = sh.join(rare, "__sh").persist()
        handles.append(kept)
    sizes = (kept.groupBy(F.col(id_col).alias("id_a"))
             .agg(F.count("*").alias("__sz")))
    a, b = kept.alias("a"), kept.alias("b")
    inter = (a.join(b, "__sh")
             .where(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count("*").alias("n_shared")))
    cont = F.round(F.col("n_shared") / F.col("__sz"), 6)
    out = (inter.join(sizes, "id_a")
           .select("id_a", "id_b", "n_shared",
                   cont.alias("containment"))
           .where(F.col("containment") >= threshold))
    out._zoi_persisted = handles
    return out


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over near-dup pairs)
# ---------------------------------------------------------------------------

def duplicate_clusters(pairs: DataFrame, *, id_a: str = "id_a",
                       id_b: str = "id_b", max_iters: int = 20) -> DataFrame:
    """(doc_id, cluster_id) for every doc in ``pairs`` — connected
    components with cluster_id = the component's minimum doc id (the
    keep-one-per-cluster contract composes as
    ``clusters.where(doc_id != cluster_id)`` = the drop list).

    Near-dup PAIRS are not a dedup verdict: A≈B and B≈C must collapse
    to one kept document even when A≉C, which needs the transitive
    closure. Alternating large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014 — the
    algorithm behind GraphFrames' connectedComponents): each round
    rewires every node toward its neighborhood minimum, so component
    depth roughly HALVES per round and convergence takes O(log d)
    rounds — unlike 1-hop min-label propagation, whose O(diameter)
    rounds melt down on gradual-drift duplicate chains (A≈B≈…≈Z is
    routine in recrawled/templated web pages). Neither phase ever
    materializes a neighbor LIST: both are (groupBy-min + equi-join)
    over the edge table (size = number of near-dup pairs, ≪ corpus),
    so a 10^8-degree template hub costs a wide groupBy key, not an
    executor-memory neighbor array.

    Each round's edge set is ``localCheckpoint(eager=True)``-ed — a
    mere persist leaves the full round tower in the lineage, so the
    final plan re-derives every round (hundreds of scans) whenever a
    cached partition is lost, and the plan itself grows toward
    optimizer blow-up; the checkpoint truncates lineage to the
    materialized RDD each round, and superseded round RDDs are freed
    by Spark's ContextCleaner as driver references drop.

    If the loop exhausts ``max_iters`` (each iteration = one
    large-star + one small-star phase) before the edge set stabilizes,
    the returned labels are NOT a valid transitive closure: a
    ``RuntimeWarning`` is emitted and the result carries
    ``_zoi_converged = False`` so callers (pipeline.curate) can fail
    loudly instead of dropping the wrong documents.
    """
    import warnings

    # nodes from BOTH pair columns before any edge filtering, so a doc
    # whose only rows are self-pairs or NULL-partner pairs still gets a
    # (doc, doc) label instead of vanishing from the map
    nodes = (pairs.select(F.col(id_a).alias("doc_id"))
             .unionAll(pairs.select(F.col(id_b).alias("doc_id")))
             .where(F.col("doc_id").isNotNull())
             .distinct().localCheckpoint(eager=True))
    # symmetric undirected edge table (self-loops and NULL ends are
    # connectivity no-ops; star rounds contract edges away, hence the
    # separate node snapshot above)
    edges = (pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
             .unionAll(pairs.select(F.col(id_b).alias("u"),
                                    F.col(id_a).alias("v")))
             .where(F.col("u") != F.col("v"))
             .where(F.col("u").isNotNull() & F.col("v").isNotNull())
             .distinct().localCheckpoint(eager=True))

    def _sym(e: DataFrame) -> DataFrame:
        return (e.unionAll(e.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
                .where(F.col("u") != F.col("v")).distinct())

    def _large_star(e: DataFrame) -> DataFrame:
        # per node u: m = min(N(u) ∪ {u}); connect strictly-larger
        # neighbors to m
        m = (e.groupBy("u")
             .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        return (e.join(m, "u").where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v")).distinct())

    def _small_star(e: DataFrame) -> DataFrame:
        # orient high→low; per node u: m = min of its smaller
        # neighborhood; connect those neighbors AND u itself to m
        lo = (e.where(F.col("v") < F.col("u"))
              .unionAll(e.where(F.col("u") < F.col("v"))
                        .select(F.col("v").alias("u"),
                                F.col("u").alias("v"))))
        m = lo.groupBy("u").agg(F.min("v").alias("m"))
        nbrs = (lo.join(m, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v")))
        selfe = m.select(F.col("u"), F.col("m").alias("v"))
        return (nbrs.unionAll(selfe)
                .where(F.col("u") != F.col("v")).distinct())

    converged = False
    for _ in range(max_iters):
        after = (_small_star(_sym(_large_star(_sym(edges))))
                 .localCheckpoint(eager=True))
        # stable iff the round was a no-op on the edge set (compare
        # both directions with two tiny anti-join probes)
        changed = (after.exceptAll(edges).limit(1).count()
                   or edges.exceptAll(after).limit(1).count())
        edges = after
        if changed == 0:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"duplicate_clusters: star contraction did not converge in "
            f"{max_iters} rounds — cluster ids are incomplete; raise "
            f"max_iters", RuntimeWarning)
    # converged edge set is a star forest pointing at component minima;
    # nodes that ARE the minimum have no outgoing low edge → label self
    lab = (edges.where(F.col("v") < F.col("u"))
           .groupBy("u").agg(F.min("v").alias("cluster_id"))
           .select(F.col("u").alias("doc_id"), "cluster_id"))
    out = (nodes.join(lab, "doc_id", "left")
           .select("doc_id",
                   F.coalesce("cluster_id", "doc_id").alias("cluster_id")))
    out._zoi_converged = converged
    return out


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


def _block_pair_batch_factory(threshold: float):
    """applyInPandas kernel: all within-block cosine pairs via ONE
    numpy matmul per block. Per block of n vectors the pair scoring is
    an (n × d)·(d × n) float64 matmul — BLAS-vectorized, ~3 orders of
    magnitude over evaluating an interpreted per-pair array fold in the
    join condition, and the per-task work is small enough that host
    scheduling jitter cannot stretch a straggler. Division order
    matches the expression engine (dot / (nᵢ·nⱼ)); zero norms → 0.0."""
    import numpy as np
    import pandas as pd

    def batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # null vectors cannot pair (the expression engine's fold yields
        # null → filtered); drop them before the matmul
        pdf = pdf[pdf["__vec"].notna()]
        n = len(pdf)
        if n < 2:
            # keep the incoming id dtype (see _jaccard_block_batch_factory)
            return pd.DataFrame({"id_a": pdf["__id"].iloc[:0],
                                 "id_b": pdf["__id"].iloc[:0],
                                 "cosine": pd.Series([], dtype="float64")})
        pdf = pdf.sort_values("__id").reset_index(drop=True)
        ids = pdf["__id"].to_numpy()
        V = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in pdf["__vec"]])
        G = V @ V.T
        norms = np.sqrt(np.einsum("ij,ij->i", V, V))
        denom = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            C = np.where(denom > 0, G / denom, 0.0)
        iu, ju = np.triu_indices(n, k=1)
        cos = np.round(C[iu, ju], 6)
        keep = cos >= threshold
        return pd.DataFrame({"id_a": ids[iu[keep]], "id_b": ids[ju[keep]],
                             "cosine": cos[keep]})

    return batch


def embedding_near_dups(df: DataFrame, *, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        threshold: float = 0.95,
                        block_col: str | None = None,
                        max_block_size: int | None = None,
                        engine: str = "arrow") -> DataFrame:
    """Pairs with cosine ≥ threshold. Without a block column this is
    all-pairs (verification scale only); at scale pass an LSH bucket
    from ``similarity.random_hyperplane_bucket`` as ``block_col`` —
    and size its ``bits`` from the corpus via
    ``similarity.suggest_bits`` so the block population stays bounded
    as the corpus grows (a fixed-cardinality key makes in-block pair
    work quadratic again at 100×).

    ``max_block_size``: blocks larger than the cap are EXCLUDED from
    pairing (same contract as ``minhash_lsh_candidates``'s mega-bucket
    cap): a degenerate block is a quadratic blow-up regardless of the
    engine, and its members belong to the exact-dup fingerprint path.

    ``engine='arrow'`` (default): group by block, score all in-block
    pairs with one numpy matmul per block (applyInPandas) — the
    vectorized verify stage. ``engine='column'``: pure-expression
    self-equi-join with the norms folded once per row; zero Python in
    the plan, ~10² slower per pair (the dot product is an interpreted
    higher-order fold inside the join condition)."""
    block = F.col(block_col) if block_col else F.lit(0)
    # preserve the id type end-to-end (string/UUID ids supported; see
    # ngram_jaccard_pairs arrow branch for the cast-to-long hazard)
    base = df.select(F.col(id_col).alias("__id"),
                     F.col(vec_col).alias("__vec"),
                     block.alias("__block"))
    if max_block_size is not None:
        sizes = (base.groupBy("__block")
                 .agg(F.count("*").alias("__bs"))
                 .where(F.col("__bs") <= max_block_size)
                 .drop("__bs"))
        base = base.join(sizes, "__block")

    if engine == "arrow":
        id_type = df.schema[id_col].dataType
        out_schema = T.StructType([
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine", T.DoubleType()),
        ])
        return (base.groupBy("__block")
                .applyInPandas(_block_pair_batch_factory(threshold),
                               out_schema))
    if engine != "column":
        raise ValueError(f"unknown embedding_near_dups engine: {engine!r}")

    norm = F.sqrt(F.aggregate(
        F.col("__vec"), F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))
    base = base.select("__id", "__vec", "__block", norm.alias("__norm"))
    # spread the streamed side: pair-probe parallelism is bounded by its
    # task count (see ngram_jaccard_pairs)
    par = df.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(par).alias("a")
    b = base.alias("b")
    cond = (F.col("a.__id") < F.col("b.__id")) & \
        (F.col("a.__block") == F.col("b.__block"))
    dot = F.aggregate(
        F.zip_with(F.col("a.__vec"), F.col("b.__vec"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    na, nb = F.col("a.__norm"), F.col("b.__norm")
    sim = F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
    return (a.join(b, cond)
            .select(F.col("a.__id").alias("id_a"),
                    F.col("b.__id").alias("id_b"),
                    F.round(sim, 6).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def semantic_dedup(df: DataFrame, *, id_col: str = "doc_id",
                   vec_col: str = "embedding",
                   centroids: Sequence[Sequence[float]],
                   threshold: float = 0.95,
                   max_block_size: int | None = None,
                   engine: str = "arrow",
                   cell_col: str | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the corpus into k-means cells, score
    cosine similarity only WITHIN each cell, and drop every vector
    that has a SMALLER-ID in-cell neighbor at ≥ threshold. The kept
    set is deterministic, and no two kept vectors in a cell are within
    threshold of each other — but the rule is the greedy drop, NOT the
    transitive closure: in a chain a≈b≈c with a̸≈c, b drops (neighbor
    a) and c drops (neighbor b) even though c has no kept neighbor.
    That matches SemDeDup's per-cluster greedy policy; when you want
    one-representative-per-connected-component semantics instead, feed
    the pair list to :func:`duplicate_clusters`.

    Composition of existing primitives, so every scale property is
    inherited: cell assignment is a pure expression chain over inlined
    centroid literals (``similarity.nearest_centroid`` — typically the
    trained output of ``similarity.refine_centroids``); in-cell pairing
    is ``embedding_near_dups`` with the cell as the block key (one
    numpy matmul per cell under the default Arrow engine, and the same
    ``max_block_size`` degenerate-cell cap); the greedy drop rule
    needs only the pair list's ``id_b`` side — no label propagation,
    one anti-join.

    At 10^12 docs: cells ≈ corpus/k, so k must grow with the corpus
    (SemDeDup used 50k clusters for LAION) — size it like
    ``similarity.suggest_bits`` sizes hyperplane bits. The anti-join is
    deliberately NOT broadcast: semantic dup rates of 20-50% mean the
    drop list scales with the corpus (AQE downgrades to broadcast when
    it is in fact small).

    Returns ``df`` minus the dropped rows, with a ``__semdedup_cell``
    column when ``cell_col`` is not already supplied (callers wanting a
    per-cell ledger can group on it; drop it otherwise).
    """
    from . import similarity

    if cell_col is None:
        cell_col = "__semdedup_cell"
        df = df.withColumn(
            cell_col, similarity.nearest_centroid(F.col(vec_col),
                                                  list(centroids)))
    pairs = embedding_near_dups(df, id_col=id_col, vec_col=vec_col,
                                threshold=threshold, block_col=cell_col,
                                max_block_size=max_block_size,
                                engine=engine)
    # pairs always satisfy id_a < id_b, so "drop every id_b" keeps
    # precisely the docs with no smaller-id near-duplicate in-cell
    drop = pairs.select(F.col("id_b").alias("__semdedup_drop")).distinct()
    return df.join(drop, df[id_col] == F.col("__semdedup_drop"),
                   "left_anti")


def cluster_representatives(clusters: DataFrame, scores: DataFrame, *,
                            id_col: str = "doc_id",
                            cluster_col: str = "cluster_id",
                            score_col: str = "score") -> DataFrame:
    """Pick the KEPT document per near-dup cluster by quality instead
    of by id: argmax *score_col* (ties → min id) over each cluster
    from :func:`duplicate_clusters`. Real pipelines keep the
    best-quality member of a duplicate group (longest, cleanest,
    highest classifier score), not the one with the smallest id — this
    is that retention policy as a first-class operator.

    One id equi-join (scores side is the corpus — hash join, AQE picks
    the build side) + one window per cluster. The join is LEFT outer
    with unscored members ordered last: a scores frame computed on a
    filtered subset (e.g. post-quality-gate) must never silently drop
    cluster members from the argmax — an inner join would leave a
    fully-unscored cluster with NO representative, so every duplicate
    in it would survive the recommended drop pattern. Returns
    ``(cluster_col, keep_id, score_col)``; anti-join the cluster
    members against ``keep_id`` to drop the rest::

        reps  = cluster_representatives(clusters, scored, ...)
        drops = clusters.join(reps, cluster_col) \\
                        .where(F.col(id_col) != F.col("keep_id"))
    """
    j = clusters.join(scores, id_col, "left")
    w = (Window.partitionBy(cluster_col)
         .orderBy(F.col(score_col).desc_nulls_last(),
                  F.col(id_col).asc()))
    return (j.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(cluster_col, F.col(id_col).alias("keep_id"),
                    score_col))


def cluster_size_histogram(clusters: DataFrame, *,
                           cluster_col: str = "cluster_id"
                           ) -> DataFrame:
    """Duplicate-cluster size distribution — the dedup REPORT (how
    much of the corpus is 2-copies vs 10 000-copies tells you whether
    you have mirrors or a template farm, and sizes the keep-one
    savings estimate): one row per distinct cluster size with
    ``n_clusters`` and ``n_docs``. Two key-local aggregations over the
    duplicate_clusters output — nothing corpus-wide."""
    sizes = (clusters.groupBy(cluster_col)
             .agg(F.count("*").alias("cluster_size")))
    return (sizes.groupBy("cluster_size")
            .agg(F.count("*").alias("n_clusters"),
                 F.sum("cluster_size").alias("n_docs")))


def prefix_dup_groups(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 32) -> DataFrame:
    """Truncation-duplicate detection: group documents by the md5 of
    their first *k* normalized tokens — the cheap catch for re-crawls
    cut off mid-page, paywalled tails and mirror sites that share the
    article head byte-for-byte but diverge later (full-text exact dedup
    misses them, MinHash needs the similarity to survive truncation).
    Docs shorter than k tokens hash their whole normalized text, which
    degrades gracefully to exact-dup grouping. Output: one row per
    member of a group with ≥2 docs — (prefix_md5, id, n_docs,
    first_doc) — keep ``id == first_doc`` downstream.

    One projection + one count aggregation + one re-join keyed on the
    16-byte hash (never the text): the standard two-pass group-and-mark,
    no window."""
    from .text import normalize_text

    tokens = F.split(normalize_text(F.col(text_col)), " ")
    fp = F.md5(F.concat_ws(" ", F.slice(tokens, 1, int(k))))
    keyed = df.select(F.col(id_col), fp.alias("prefix_md5"))
    groups = (keyed.groupBy("prefix_md5")
              .agg(F.count("*").alias("n_docs"),
                   F.min(id_col).alias("first_doc"))
              .where(F.col("n_docs") >= 2))
    return (keyed.join(groups, "prefix_md5")
            .select("prefix_md5", id_col,
                    F.col("n_docs").cast("long").alias("n_docs"),
                    "first_doc"))


def levenshtein_verify_pairs(df: DataFrame, *, id_col: str = "doc_id",
                             text_col: str = "text",
                             max_dist: int = 3, key_len: int = 40,
                             block_prefix: int = 8,
                             max_block_size: int | None = None
                             ) -> DataFrame:
    """Edit-distance near-duplicate pairs over a normalized fixed-
    length key: pairs (id_a < id_b) whose first *key_len* normalized
    characters are within Levenshtein distance *max_dist* — the
    verify stage for title/prefix-level dedup (tracking-id suffixes,
    OCR single-char noise, mirrored pages differing by a byline),
    where set-similarity (Jaccard/MinHash) is too coarse because a
    1-char edit shifts every shingle.

    Blocking: equal first *block_prefix* chars → candidate pairs stay
    within blocks (pairs whose edits fall inside the prefix are missed
    — the standard prefix-blocking recall tradeoff; run multiple
    passes with rotated keys for higher recall). In-block cost is
    quadratic, so ``max_block_size`` EXCLUDES oversized blocks (the
    mega-bucket contract shared with :func:`minhash_lsh_candidates`).
    A |len_a − len_b| ≤ max_dist prefilter runs before any distance —
    length difference lower-bounds edit distance.

    The distance itself is ``levenshtein(a, b, threshold=max_dist)``:
    Spark's threshold form abandons a pair as soon as the running
    distance exceeds the cap (banded DP, O(key_len·max_dist) instead
    of O(key_len²)) and returns −1, which the filter drops — within
    the threshold it returns the exact distance.

    Returns ``(id_a, id_b, lev_dist)``.
    """
    key = F.substring(normalize_text(F.col(text_col)),
                      1, int(key_len))
    base = df.select(F.col(id_col).alias("__id"), key.alias("__key"),
                     F.substring(key, 1, int(block_prefix))
                      .alias("__block"),
                     F.length(key).alias("__len"))
    if max_block_size is not None:
        sizes = (base.groupBy("__block")
                 .agg(F.count("*").alias("__bs"))
                 .where(F.col("__bs") <= int(max_block_size))
                 .drop("__bs"))
        base = base.join(sizes, "__block")
    dist = F.levenshtein(F.col("l.__key"), F.col("r.__key"),
                         int(max_dist))
    return (base.alias("l")
            .join(base.alias("r"),
                  (F.col("l.__block") == F.col("r.__block"))
                  & (F.col("l.__id") < F.col("r.__id"))
                  & (F.abs(F.col("l.__len") - F.col("r.__len"))
                     <= int(max_dist)))
            .select(F.col("l.__id").alias("id_a"),
                    F.col("r.__id").alias("id_b"),
                    dist.alias("lev_dist"))
            .where(F.col("lev_dist") >= 0))


def hamming_dup_groups(df: DataFrame, *, hash_col: str,
                       id_col: str = "media_id",
                       max_dist: int = 3) -> DataFrame:
    """Near-duplicate HASH-GROUP pairs under Hamming distance — the
    second stage of perceptual-hash image dedup (dHash/pHash): two
    images are near-dups when their 64-bit hashes differ in ≤
    *max_dist* bits.

    Two scale moves, both exact (zero recall loss):

    1. the corpus collapses to DISTINCT (hash, count) first — exact-
       duplicate groups, one shuffle — so the pair space is |H|², not
       |rows|², and the exact-dup mass rides along as
       ``n_pairs = n_a·n_b`` without being enumerated;
    2. the self-join is a banded EQUI-join, not a theta nested-loop:
       the 64-bit hash is sliced into ``max_dist + 1`` bit-bands — by
       pigeonhole, two hashes within distance d agree on at least one
       whole band — candidates meet on (band_id, band_bits) and the
       exact ``bit_count(a XOR b)`` verifies. A pair agreeing on
       several bands is deduped BEFORE the verify.

    Distance is ``bit_count(a XOR b)`` — one JVM expression, no UDF.
    Returns ``(hash_a, hash_b, hamming, n_a, n_b, n_pairs)`` with
    hash_a < hash_b.
    """
    if not 0 <= max_dist <= 63:
        raise ValueError("max_dist must be in [0, 63]")
    n_bands = int(max_dist) + 1
    width = 64 // n_bands
    hc = (df.groupBy(F.col(hash_col).alias("__h"))
          .agg(F.count("*").alias("__n"))).persist()
    bands = []
    for i in range(n_bands):
        start = i * width
        w_i = width if i < n_bands - 1 else 64 - start
        bits = F.shiftrightunsigned(F.col("__h"), start)
        if w_i < 64:
            bits = bits.bitwiseAND(F.lit((1 << w_i) - 1))
        bands.append(F.struct(F.lit(i).alias("b"), bits.alias("v")))
    keyed = hc.select("__h", F.explode(F.array(*bands)).alias("__k"))
    cand = (keyed.alias("l")
            .join(keyed.alias("r"),
                  (F.col("l.__k") == F.col("r.__k"))
                  & (F.col("l.__h") < F.col("r.__h")))
            .select(F.col("l.__h").alias("hash_a"),
                    F.col("r.__h").alias("hash_b"))
            .distinct())
    dist = F.bit_count(F.col("hash_a").bitwiseXOR(F.col("hash_b")))
    out = (cand.withColumn("hamming", dist)
           .where(F.col("hamming") <= int(max_dist))
           .join(hc.select(F.col("__h").alias("hash_a"),
                           F.col("__n").alias("n_a")), "hash_a")
           .join(hc.select(F.col("__h").alias("hash_b"),
                           F.col("__n").alias("n_b")), "hash_b")
           .select("hash_a", "hash_b", "hamming", "n_a", "n_b",
                   (F.col("n_a") * F.col("n_b")).alias("n_pairs")))
    out._zoi_persisted = [hc]
    return out


def cross_source_copies(df: DataFrame, *, text_col: str = "text",
                        source_col: str = "source",
                        id_col: str = "doc_id",
                        prefix_chars: int | None = None) -> DataFrame:
    """Cross-source copy detection: for every pair of sources, how
    many distinct document fingerprints they BOTH carry — the mirror/
    scraper/syndication map of a multi-crawl corpus, and the first
    number to check before attributing dedup mass to any one source.

    Plan: (fingerprint, source) is made DISTINCT first (one shuffle) —
    so a source that carries the same text 10^6 times still
    contributes one row — and only then self-joined on the
    fingerprint with source_a < source_b. Pair fan-out per
    fingerprint is C(k,2) in its DISTINCT-source count k, bounded by
    the (small, fixed) source vocabulary, never by corpus size.

    ``prefix_chars`` fingerprints only the first k NORMALIZED chars —
    the truncation-level identity of :func:`prefix_dup_groups`, which
    catches syndication with differing boilerplate tails that the
    whole-text fingerprint misses.

    Returns ``(source_a, source_b, n_shared_fps)``.
    """
    norm = normalize_text(F.col(text_col))
    if prefix_chars is not None:
        norm = F.substring(norm, 1, int(prefix_chars))
    fs = (df.select(F.md5(norm).alias("__fp"),
                    F.col(source_col).alias("__s"))
          .where(F.col("__s").isNotNull())
          .distinct()).persist()
    out = (fs.alias("l")
           .join(fs.alias("r"),
                 (F.col("l.__fp") == F.col("r.__fp"))
                 & (F.col("l.__s") < F.col("r.__s")))
           .groupBy(F.col("l.__s").alias("source_a"),
                    F.col("r.__s").alias("source_b"))
           .agg(F.count("*").alias("n_shared_fps")))
    out._zoi_persisted = [fs]
    return out


def ppjoin_pairs(df: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text",
                 threshold: float = 0.7) -> DataFrame:
    """Exact set-similarity join with PREFIX FILTERING (PPJoin,
    Xiao et al., WWW'08) over distinct word-token sets: two sets with
    Jaccard ≥ t MUST share a token inside each other's first
    ``n − ⌈t·n⌉ + 1`` tokens under any single global token order — so
    candidates are generated by an equi-join on PREFIX tokens only,
    not on every token (the all-token join is the classic
    hot-token blow-up: 'the' joins everything with everything).

    The global order is (document-frequency ASC, token ASC): rarest
    first, which makes prefixes maximally selective — a stopword can
    only enter a prefix for documents that are almost entirely
    stopwords. The length filter ``min(n_a,n_b) ≥ t·max(n_a,n_b)``
    prunes candidates before the verify; verification is exact
    ``|∩|/|∪|`` on the distinct-token arrays.

    Output: ``(id_a, id_b, n_a, n_b, n_common, jaccard)`` with
    jaccard ≥ t, round-6.

    Shape at 10^12 docs: token df is one hash agg (Zipf-bounded
    vocabulary); the prefix explode emits ~(1−t)·|d| rows per doc; the
    candidate join keys on rare-by-construction tokens; the verify is
    one candidate-keyed join back to the (persisted) token-set table.
    Compare minhash_lsh_candidates: PPJoin is EXACT (no banding
    recall loss) at the cost of prefix-join selectivity depending on
    the df distribution rather than on tunable bands."""
    from .text import normalize_text

    t = float(threshold)
    if not 0 < t <= 1:
        raise ValueError("threshold must be in (0, 1]")
    toks = F.array_distinct(F.filter(
        F.split(normalize_text(F.col(text_col)), " "),
        lambda x: x != ""))
    base = (df.select(F.col(id_col).alias("__id"), toks.alias("__toks"))
            .where(F.size("__toks") > 0))
    base = base.persist()
    rows = base.select("__id", F.explode("__toks").alias("__tok"))
    dfreq = rows.groupBy("__tok").agg(F.count("*").alias("__df"))
    ordered = (rows.join(dfreq, "__tok")
               .groupBy("__id")
               .agg(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("__df").alias("d"),
                                F.col("__tok").alias("t")))),
                   lambda s: s["t"]).alias("__ord")))
    n = F.size("__ord")
    prefix_len = (n - F.ceil(n * F.lit(t)).cast("int") + 1)
    pref = ordered.select(
        F.col("__id"), n.alias("__n"),
        F.explode(F.slice("__ord", 1, prefix_len)).alias("__tok"))
    cands = (pref.alias("a")
             .join(pref.alias("b"),
                   (F.col("a.__tok") == F.col("b.__tok"))
                   & (F.col("a.__id") < F.col("b.__id"))
                   & (F.least("a.__n", "b.__n")
                      >= F.lit(t) * F.greatest("a.__n", "b.__n")))
             .select(F.col("a.__id").alias("id_a"),
                     F.col("b.__id").alias("id_b"))
             .distinct())
    a = base.select(F.col("__id").alias("id_a"),
                    F.col("__toks").alias("__ta"))
    b = base.select(F.col("__id").alias("id_b"),
                    F.col("__toks").alias("__tb"))
    inter = F.size(F.array_intersect("__ta", "__tb"))
    na, nb = F.size("__ta"), F.size("__tb")
    jac = F.round(inter / (na + nb - inter), 6)
    out = (cands.join(a, "id_a").join(b, "id_b")
           .select("id_a", "id_b",
                   na.cast("long").alias("n_a"),
                   nb.cast("long").alias("n_b"),
                   inter.cast("long").alias("n_common"),
                   jac.alias("jaccard"))
           .where(F.col("jaccard") >= t))
    out._zoi_persisted = [base]
    return out


def dup_rate_by_group(df: DataFrame, *, group_col: str,
                      text_col: str = "text",
                      round_to: int = 6) -> DataFrame:
    """Per-segment exact-duplicate rate: ``(group, n_rows,
    n_distinct, dup_rate)`` where dup_rate = 1 − distinct
    fingerprints / rows — the dedup-pressure report that says WHICH
    source ships boilerplate before any dedup pass runs.

    Fingerprint is md5 of the raw text (same key `exact_dedup` drops
    on, so the report predicts exactly what that pass would remove).
    ONE hash aggregation; the count-distinct rewrites to a two-phase
    Expand aggregate with map-side partials. At 10^12 rows swap
    `countDistinct` for `approx_count_distinct` (±2% HLL) to skip the
    Expand — the report is advisory, the oracle twin runs exact."""
    return (df.groupBy(F.col(group_col).alias("group"))
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.countDistinct(F.md5(F.col(text_col)))
                 .alias("n_distinct"))
            .select("group", "n_rows",
                    F.col("n_distinct").cast("long").alias("n_distinct"),
                    F.round(F.lit(1.0) - F.col("n_distinct")
                            / F.col("n_rows"), round_to)
                    .alias("dup_rate")))


def lsh_tuning_curve(spark, *, num_hashes: int = 64,
                     bands: int | None = None, threshold: float = 0.8,
                     steps: int = 19, round_to: int = 6) -> DataFrame:
    """The MinHash-LSH S-curve as a DataFrame — the planning readout
    behind :func:`suggest_minhash_bands`: for each Jaccard similarity
    ``s`` on a uniform grid, the candidate-pair probability
    ``P = 1 − (1 − s^r)^b`` with ``r = num_hashes / bands``, plus the
    curve midpoint ``(1/b)^(1/r)`` (where recall crosses 50%).
    Defaults derive ``bands`` from the threshold exactly as the
    pipeline does, so the emitted table documents the banding a
    `minhash_lsh` run will actually use. Output:
    ``(s, p_candidate, bands, rows_per_band, midpoint)``.

    Plan-time math over a ``spark.range(steps)`` literal — no corpus
    scan; emit it next to a dedup run's metrics so the recall/precision
    trade sits in the audit record rather than in a notebook."""
    b = bands if bands is not None else suggest_minhash_bands(
        num_hashes, threshold)
    if num_hashes % b != 0:
        raise ValueError(f"bands={b} must divide num_hashes={num_hashes}")
    r = num_hashes // b
    mid = (1.0 / b) ** (1.0 / r)
    s = F.round((F.col("id") + 1) / F.lit(float(steps + 1)), 6)
    p = 1.0 - F.pow(1.0 - F.pow(s, F.lit(float(r))), F.lit(float(b)))
    return (spark.range(steps)
            .select(s.alias("s"),
                    F.round(p, round_to).alias("p_candidate"),
                    F.lit(int(b)).cast("long").alias("bands"),
                    F.lit(int(r)).cast("long").alias("rows_per_band"),
                    F.round(F.lit(mid), round_to).alias("midpoint")))


def bag_fingerprint_groups(df: DataFrame, *, text_col: str = "text",
                           id_col: str = "doc_id",
                           max_ids: int = 8) -> DataFrame:
    """Reorder-invariant duplicate groups: the bag fingerprint hashes
    the SORTED token sequence (multiset, duplicates kept), so
    token-shuffled copies — paragraph-reordered plagiarism, list pages
    re-sorted by a template, sentence-permuted spins — collapse onto
    one key even though their exact fingerprints differ. Emitted
    groups have >1 doc AND >1 distinct exact fingerprint, i.e. the
    reordered copies exact dedup cannot see. Output: ``(bag_fp,
    n_docs, n_exact_variants, sample_ids)`` (first ``max_ids`` sorted).

    Same one-shuffle shape as exact dedup — the sort is per-document
    inside a projection (O(len log len) per row), not a corpus sort."""
    from .text import normalize_text

    toks = F.array_sort(F.filter(
        F.split(normalize_text(F.col(text_col)), " "),
        lambda x: x != ""))
    bag_fp = F.md5(F.array_join(toks, " "))
    exact_fp = F.md5(normalize_text(F.col(text_col)))
    base = (df.where(F.col(text_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    bag_fp.alias("bag_fp"), exact_fp.alias("__efp")))
    return (base.groupBy("bag_fp")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.count_distinct("__efp").alias("n_exact_variants"),
                 F.slice(F.array_sort(F.collect_list("__id")), 1,
                         int(max_ids)).alias("sample_ids"))
            .where((F.col("n_docs") > 1)
                   & (F.col("n_exact_variants") > 1)))


def exact_substring_spans(df: DataFrame, *, text_col: str = "text",
                          id_col: str = "doc_id", min_len: int = 20,
                          max_window_docs: int | None = None) -> DataFrame:
    """Maximal cross-document shared token spans of ≥ ``min_len``
    words — the exact-substring dedup signal of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499), re-expressed relationally: their suffix-array
    pass finds substrings ≥ 50 tokens shared across documents; here
    every ``min_len``-token window is hashed, windows meet in ONE
    equi-join on the hash, and runs of consecutive matching windows
    merge back into maximal spans with a gaps-and-islands pass (two
    identical windows advance BOTH documents by one position, so a
    contiguous match lies on a constant diagonal ``pos_a − pos_b``).

    Returns ``(id_a, id_b, start_a, start_b, len_tokens)`` — one row
    per maximal shared span (1-based token positions, id_a < id_b).
    A span of k consecutive matching windows covers k + min_len − 1
    tokens. Documents shorter than ``min_len`` tokens emit one
    whole-document window (word_shingles' degenerate form), so exact
    short-doc duplicates still pair.

    ``max_window_docs``: window hashes present in more than that many
    documents (licence boilerplate, navigation chrome — the substring
    analogue of stopwords) are EXCLUDED before the self-join, the same
    document-frequency pruning winnowing_overlap_pairs applies: pair
    work is Σ_h df(h)², and one viral window defeats the plan.

    Plan shape at 10^12 docs: the window explode is O(tokens) rows per
    document (the published cost of exact-substring dedup — the suffix
    array touches every token too), ONE hash equi-join, then the
    island merge is a window function over (pair, diagonal) — keyed by
    pair, so the shuffle after the join is pair-bounded, never
    corpus-quadratic. Within a repeated-substring document the same
    window hash appears at several positions; each (pos_a, pos_b)
    combination joins, landing on different diagonals — internal
    repetitions can therefore multi-count spans (documented; Lee et
    al.'s suffix array has the same property).
    """
    w = int(min_len)
    if w < 2:
        raise ValueError("min_len must be ≥ 2 tokens")
    grams = word_shingles(F.col(text_col), w)
    # 48-bit md5 prefix as the join key: numeric equi-join, identical
    # derivation in the DuckDB oracle, ~2^-48 per-pair collision odds
    h = F.conv(F.substring(F.md5(F.col("__gram")), 1, 12), 16, 10) \
        .cast("long")
    wins = (df.select(F.col(id_col).alias("__id"),
                      F.posexplode(grams).alias("__pos0", "__gram"))
            .select("__id", (F.col("__pos0") + 1).alias("pos"),
                    h.alias("__h")))
    if max_window_docs is not None:
        wins = wins.persist()
        rare = (wins.groupBy("__h")
                .agg(F.count_distinct("__id").alias("__df"))
                .where(F.col("__df") <= int(max_window_docs))
                .drop("__df"))
        joinable = wins.join(rare, "__h")
    else:
        joinable = wins
    a, b = joinable.alias("a"), joinable.alias("b")
    pairs = (a.join(b, "__h")
             .where(F.col("a.__id") < F.col("b.__id"))
             .select(F.col("a.__id").alias("id_a"),
                     F.col("b.__id").alias("id_b"),
                     F.col("a.pos").alias("pos_a"),
                     F.col("b.pos").alias("pos_b")))
    diag = (F.col("pos_a") - F.col("pos_b")).alias("__diag")
    iw = Window.partitionBy("id_a", "id_b", "__diag").orderBy("pos_a")
    islands = (pairs.select("id_a", "id_b", "pos_a", "pos_b", diag)
               .withColumn("__grp",
                           F.col("pos_a") - F.row_number().over(iw)))
    out = (islands.groupBy("id_a", "id_b", "__diag", "__grp")
           .agg(F.min("pos_a").cast("long").alias("start_a"),
                F.min("pos_b").cast("long").alias("start_b"),
                (F.count("*") + w - 1).cast("long").alias("len_tokens"))
           .select("id_a", "id_b", "start_a", "start_b", "len_tokens"))
    if max_window_docs is not None:
        out._zoi_persisted = [wins]
    return out


def sorted_neighborhood_pairs(df: DataFrame, *, key_col: str,
                              id_col: str = "doc_id", window: int = 3,
                              block_chars: int | None = None
                              ) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995, the
    merge/purge method): sort the corpus by a fuzzy blocking key and
    emit every pair within a sliding window of ``window`` successors —
    the classic record-linkage candidate generator for keys where
    near-duplicates SORT near each other (normalized titles, name+zip,
    canonical-url prefixes) but share no exact token, which defeats
    equi-join blocking.

    Returns ``(id_a, id_b, key_a, key_b, offset)`` — offset = rank
    distance (1 = adjacent). id_a/id_b follow sort order, not id
    order. Compose with a verify stage (ngram_jaccard_pairs on the
    candidate ids, containment, edit distance) — this emits
    CANDIDATES, not verdicts.

    ``block_chars=None`` runs ONE global sort window — verification
    scale only (a single-partition window at 10^12 rows is a
    one-executor sort). At scale pass ``block_chars=b``: the window
    partitions on the key's first *b* characters, so each block sorts
    in parallel and pairs never cross blocks — the standard multi-pass
    SNM answer is to run again with a different key (or block length)
    to recover boundary pairs, which composes here by unioning two
    calls. The blocked plan is one hash shuffle on the prefix + a
    per-block sort: distributable, skew bounded by the hottest prefix
    (pick b so prefixes stay under the partition budget).
    """
    k = int(window)
    if k < 1:
        raise ValueError("window must be ≥ 1")
    sel = df.select(F.col(id_col).alias("__id"),
                    F.col(key_col).alias("__k"))
    if block_chars is not None:
        blk = F.substring(F.col("__k"), 1, int(block_chars))
        sel = sel.withColumn("__blk", blk)
        w = Window.partitionBy("__blk").orderBy("__k", "__id")
    else:
        w = Window.orderBy("__k", "__id")
    # window expressions can't live inside a generator: materialize the
    # k leads as columns first, then explode the struct array
    lead_cols = []
    for i in range(1, k + 1):
        sel = (sel.withColumn(f"__ib{i}", F.lead("__id", i).over(w))
               .withColumn(f"__kb{i}", F.lead("__k", i).over(w)))
        lead_cols.append(F.struct(F.col(f"__ib{i}").alias("id_b"),
                                  F.col(f"__kb{i}").alias("key_b"),
                                  F.lit(i).alias("offset")))
    return (sel.select(F.col("__id").alias("id_a"),
                       F.col("__k").alias("key_a"),
                       F.explode(F.array(*lead_cols)).alias("__n"))
            .where(F.col("__n.id_b").isNotNull())
            .select("id_a", F.col("__n.id_b").alias("id_b"),
                    "key_a", F.col("__n.key_b").alias("key_b"),
                    F.col("__n.offset").alias("offset")))


def weighted_jaccard_pairs(df: DataFrame, *, text_col: str = "text",
                           id_col: str = "doc_id",
                           threshold: float = 0.8,
                           block_col: str | None = None,
                           max_block_size: int | None = None
                           ) -> DataFrame:
    """Pairs with WEIGHTED (multiset) Jaccard ≥ threshold:
    J_w(a,b) = Σ_t min(c_a(t), c_b(t)) / Σ_t max(c_a(t), c_b(t)) over
    token COUNTS — the tf-aware similarity that separates documents
    whose token SETS coincide but whose repetition profiles differ
    (template pages stuffing one keyword vs. the clean original),
    which plain set Jaccard (:func:`ngram_jaccard_pairs`) scores 1.0.

    The union mass never materializes: Σ max = tot_a + tot_b − Σ min,
    so only the INTERSECTION join runs — (id, token, count) rows meet
    in one equi-join on the token (within ``block_col`` when given,
    same contract/cap as every pair operator here), then one pair
    aggregation of min-counts and a broadcast-friendly join back to
    the per-doc totals. A size-ratio prefilter (J_w ≥ t forces
    t·tot_b ≤ tot_a ≤ tot_b/t) drops mismatched pairs before the
    aggregate. Returns ``(id_a, id_b, tot_a, tot_b, min_mass,
    weighted_jaccard)``; round-6 on the ratio (oracle convention).
    """
    t = float(threshold)
    if not 0 < t <= 1:
        raise ValueError("threshold must be in (0, 1]")
    toks = F.filter(F.split(normalize_text(F.col(text_col)), " "),
                    lambda x: x != "")
    blk = F.col(block_col) if block_col else F.lit(0)
    base = (df.select(F.col(id_col).alias("__id"), blk.alias("__blk"),
                      F.explode(toks).alias("__tok"))
            .groupBy("__id", "__blk", "__tok")
            .agg(F.count("*").alias("__c")))
    base = base.persist()
    if max_block_size is not None:
        sizes = (base.select("__blk", "__id").distinct()
                 .groupBy("__blk").agg(F.count("*").alias("__bs"))
                 .where(F.col("__bs") <= int(max_block_size))
                 .drop("__bs"))
        base = base.join(sizes, "__blk")
    totals = base.groupBy("__id").agg(F.sum("__c").alias("__tot"))
    a, b = base.alias("a"), base.alias("b")
    inter = (a.join(b, (F.col("a.__tok") == F.col("b.__tok"))
                    & (F.col("a.__blk") == F.col("b.__blk"))
                    & (F.col("a.__id") < F.col("b.__id")))
             .groupBy(F.col("a.__id").alias("id_a"),
                      F.col("b.__id").alias("id_b"))
             .agg(F.sum(F.least("a.__c", "b.__c")).alias("min_mass")))
    ta = totals.select(F.col("__id").alias("id_a"),
                       F.col("__tot").alias("tot_a"))
    tb = totals.select(F.col("__id").alias("id_b"),
                       F.col("__tot").alias("tot_b"))
    wj = F.round(F.col("min_mass")
                 / (F.col("tot_a") + F.col("tot_b") - F.col("min_mass")),
                 6)
    out = (inter.join(ta, "id_a").join(tb, "id_b")
           .where((F.lit(t) * F.col("tot_b") <= F.col("tot_a"))
                  & (F.col("tot_a") <= F.col("tot_b") / F.lit(t)))
           .select("id_a", "id_b",
                   F.col("tot_a").cast("long").alias("tot_a"),
                   F.col("tot_b").cast("long").alias("tot_b"),
                   F.col("min_mass").cast("long").alias("min_mass"),
                   wj.alias("weighted_jaccard"))
           .where(F.col("weighted_jaccard") >= t))
    out._zoi_persisted = [base]
    return out


def dup_inverse_weights(df: DataFrame, *, text_col: str = "text",
                        id_col: str = "doc_id",
                        round_to: int = 6) -> DataFrame:
    """Duplication-aware sampling weights — SOFT dedup: instead of
    dropping exact duplicates, every row keeps weight 1/n where n is
    its fingerprint group size, so each distinct CONTENT contributes
    unit mass to training regardless of how many crawls carried it
    (the sampling-weight alternative to exact_dedup that preserves
    provenance and lets the sampler see all copies). Emits every input
    row with ``(n_copies, weight, is_canonical)`` — canonical = the
    min-id member, the row hard dedup would keep.

    Shape: the same single fingerprint-keyed shuffle as exact_dedup
    (one window, no join); weight math is per-row arithmetic."""
    fp = fingerprint(F.col(text_col))
    w = Window.partitionBy("__fp")
    base = df.select(F.col(id_col), fp.alias("__fp"))
    return (base
            .withColumn("n_copies",
                        F.count("*").over(w).cast("long"))
            .withColumn("weight",
                        F.round(F.lit(1.0) / F.col("n_copies"), round_to))
            .withColumn("is_canonical",
                        F.col(id_col) == F.min(id_col).over(w))
            .drop("__fp"))


def cluster_consistency_audit(pairs: DataFrame, clusters: DataFrame, *,
                              id_a: str = "id_a", id_b: str = "id_b",
                              id_col: str = "doc_id",
                              cluster_col: str = "cluster_id"
                              ) -> DataFrame:
    """Invariant audit over a dedup clustering: every near-dup PAIR's
    endpoints must land in the SAME cluster (pairs ⊆ components — the
    defining property of the transitive closure
    :func:`duplicate_clusters` computes; a violation means truncated
    label propagation or a stale cluster table joined against fresh
    pairs). One verdict row: ``(n_pairs, n_pair_violations, n_docs,
    n_clusters, max_cluster_size, ok)``.

    Shape: two broadcast-friendly equi-joins of the pair table against
    the (doc, cluster) table (both dedup-output-sized, ≪ corpus) and
    one rollup — the audit costs less than the clustering it checks."""
    ca = clusters.select(F.col(id_col).alias(id_a),
                         F.col(cluster_col).alias("__ca"))
    cb = clusters.select(F.col(id_col).alias(id_b),
                         F.col(cluster_col).alias("__cb"))
    joined = pairs.select(id_a, id_b).join(ca, id_a).join(cb, id_b)
    pair_stats = joined.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum((F.col("__ca") != F.col("__cb")).cast("long"))
        .cast("long").alias("n_pair_violations"))
    sizes = clusters.groupBy(cluster_col).agg(F.count("*").alias("__n"))
    cstats = sizes.agg(F.sum("__n").cast("long").alias("n_docs"),
                       F.count("*").cast("long").alias("n_clusters"),
                       F.max("__n").cast("long")
                       .alias("max_cluster_size"))
    return (pair_stats.crossJoin(F.broadcast(cstats))  # 1 row × 1 row
            .withColumn("ok", F.col("n_pair_violations") == 0))


def write_minhash_index(df: DataFrame, path: str, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_hashes: int = 64, bands: int = 16,
                        shingle_n: int = 3, chars: bool = False,
                        engine: str = "arrow") -> None:
    """Persist a reusable MinHash-LSH index of this corpus:
    ``path/buckets`` (index_id, band, bucket), ``path/shingles``
    (index_id, hashed shingle set — the exact-verify side), and
    ``path/meta`` (the hash-family parameters, as a 1-row parquet so
    the layout is filesystem-agnostic). Incremental dedup then never
    re-signs the base corpus: each new snapshot runs
    :func:`lsh_join_index` against the stored index — at 10^12 base
    docs, re-deriving signatures per snapshot IS the dominant cost,
    and this amortizes it to one write.

    The stored parameters are authoritative: the probe side derives
    its buckets from ``path/meta``, because LSH guarantees only hold
    when both sides share one hash family."""
    spark = df.sparkSession
    (_band_bucket_table(df, id_col=id_col, text_col=text_col,
                        num_hashes=num_hashes, bands=bands,
                        shingle_n=shingle_n, chars=chars, engine=engine)
     .withColumnRenamed(id_col, "index_id")
     .write.mode("overwrite").parquet(f"{path}/buckets"))
    shingle_col = (hashed_shingles_arrow(F.col(text_col), shingle_n)
                   if engine == "arrow" and not chars
                   else hashed_shingles(F.col(text_col), shingle_n,
                                        chars=chars))
    (df.select(F.col(id_col).alias("index_id"),
               shingle_col.alias("__shingles"))
     .write.mode("overwrite").parquet(f"{path}/shingles"))
    meta = spark.createDataFrame(
        [(int(num_hashes), int(bands), int(shingle_n), bool(chars),
          str(engine))],
        "num_hashes int, bands int, shingle_n int, chars boolean, "
        "engine string")
    meta.write.mode("overwrite").parquet(f"{path}/meta")


def lsh_join_index(df: DataFrame, path: str, *, id_col: str = "doc_id",
                   text_col: str = "text", threshold: float = 0.8,
                   max_bucket_size: int | None = None) -> DataFrame:
    """Join NEW documents against a persisted MinHash index
    (:func:`write_minhash_index`): ``(new_id, index_id, jaccard)`` for
    every cross pair with exact shingle Jaccard ≥ ``threshold`` that
    collides in ≥1 band — the incremental-snapshot dedup path: only
    the new side is signed (O(new), not O(base)), buckets meet in one
    equi-join, and the exact verify joins the stored shingle sets.

    ``max_bucket_size`` prunes INDEX mega-buckets (boilerplate
    shingle-sets) before the meet, the standard cap. Hash parameters
    come from the index's own meta — passing different knobs here is
    impossible by construction."""
    spark = df.sparkSession
    m = spark.read.parquet(f"{path}/meta").collect()[0]
    ib = spark.read.parquet(f"{path}/buckets")
    ish = spark.read.parquet(f"{path}/shingles")
    if max_bucket_size is not None:
        ok_b = (ib.groupBy("band", "bucket")
                .agg(F.count("*").alias("__bs"))
                .where(F.col("__bs") <= int(max_bucket_size))
                .drop("__bs"))
        ib = ib.join(ok_b, ["band", "bucket"])
    nb = _band_bucket_table(df, id_col=id_col, text_col=text_col,
                            num_hashes=m.num_hashes, bands=m.bands,
                            shingle_n=m.shingle_n, chars=m.chars,
                            engine=m.engine)
    cands = (nb.join(ib, ["band", "bucket"])
             .select(F.col(id_col).alias("new_id"), "index_id")
             .distinct())
    shingle_col = (hashed_shingles_arrow(F.col(text_col), m.shingle_n)
                   if m.engine == "arrow" and not m.chars
                   else hashed_shingles(F.col(text_col), m.shingle_n,
                                        chars=m.chars))
    ns = df.select(F.col(id_col).alias("new_id"),
                   shingle_col.alias("__ns"))
    sa = F.size("__ns").cast("double")
    sb = F.size("__shingles").cast("double")
    inter = F.size(F.array_intersect("__ns", "__shingles")) \
        .cast("double")
    union = sa + sb - inter
    sim = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (cands.join(ns, "new_id").join(ish, "index_id")
            .select("new_id", "index_id",
                    F.round(sim, 6).alias("jaccard"))
            .where(F.col("jaccard") >= float(threshold)))


def multi_signal_clusters(signal_pairs: "dict[str, DataFrame]", *,
                          id_a: str = "id_a", id_b: str = "id_b",
                          max_iters: int = 20) -> DataFrame:
    """Union-of-evidence duplicate clustering: production dedup rarely
    trusts ONE signal — URL identity, MinHash Jaccard, SimHash and
    embedding cosine each catch duplicates the others miss, and the
    deployable verdict is connected components over the UNION of their
    pair sets. Takes ``{signal_name: pairs_df}``, clusters the distinct
    union (:func:`duplicate_clusters` — large-star/small-star), and
    reports per cluster: ``(cluster_id, n_docs, n_pairs, signals)``
    with the sorted distinct signal names whose evidence built the
    cluster — the audit view that says WHY these documents collapsed
    (a url-only cluster is a recrawl; a jaccard-only cluster is a
    template family).

    Shape: pair tables are dedup output (≪ corpus); one union + one
    distinct, the closure's own cost, then two joins of edges/members
    against the cluster map — all edge-bounded, nothing corpus-wide.
    """
    if not signal_pairs:
        raise ValueError("multi_signal_clusters: no signals given")
    tagged = None
    for name in sorted(signal_pairs):
        t = signal_pairs[name].select(
            F.col(id_a).alias("id_a"), F.col(id_b).alias("id_b"),
            F.lit(name).alias("signal"))
        tagged = t if tagged is None else tagged.unionByName(t)
    edges = tagged.select("id_a", "id_b").distinct()
    clusters = duplicate_clusters(edges, max_iters=max_iters)
    member_counts = (clusters.groupBy("cluster_id")
                     .agg(F.count("*").cast("long").alias("n_docs")))
    ca = clusters.select(F.col("doc_id").alias("id_a"),
                         F.col("cluster_id"))
    per_edge = tagged.join(ca, "id_a")
    pair_counts = (per_edge.select("cluster_id", "id_a", "id_b")
                   .distinct()
                   .groupBy("cluster_id")
                   .agg(F.count("*").cast("long").alias("n_pairs")))
    signals = (per_edge.groupBy("cluster_id")
               .agg(F.array_sort(F.collect_set("signal"))
                    .alias("signals")))
    return (member_counts.join(pair_counts, "cluster_id")
            .join(signals, "cluster_id")
            .select("cluster_id", "n_docs", "n_pairs", "signals"))


def blocking_profile(df: DataFrame, *, block_col: str,
                     max_block_size: int | None = None,
                     round_to: int = 6) -> DataFrame:
    """Pair-work profile of a blocking key — the evidence behind every
    ``max_block_size`` cap in this module: in-block pair cost is
    Σ s·(s−1)/2 over block sizes s, so ONE mega-block can dominate the
    whole join no matter how rare. One verdict row: ``(n_blocks,
    n_rows, max_block_size, top_block, pair_work,
    top_block_pairwork_share, capped_pair_work, capped_share)`` —
    capped values exclude blocks above ``max_block_size`` (the work
    the capped operators actually run), so the pair of numbers is the
    before/after of the cap decision.

    Shape: one block-keyed count (map-side combine) + one rollup over
    the block vocabulary + a rank-1 pick — advisor-priced."""
    counts = (df.groupBy(F.col(block_col).alias("block"))
              .agg(F.count("*").alias("__s")))
    counts = counts.persist()
    pw = F.col("__s") * (F.col("__s") - 1) / 2
    w = Window.orderBy(F.desc("__s"), F.asc("block"))
    top = (counts.withColumn("__r", F.row_number().over(w))
           .where(F.col("__r") == 1)
           .select(F.col("block").cast("string").alias("top_block"),
                   F.col("__s").alias("__top_s")))
    cap = int(max_block_size) if max_block_size is not None else None
    capped_pw = F.when(F.col("__s") <= cap, pw).otherwise(F.lit(0)) \
        if cap is not None else pw
    tot = counts.agg(
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("__s").cast("long").alias("n_rows"),
        F.max("__s").cast("long").alias("max_block_size"),
        F.sum(pw).cast("long").alias("pair_work"),
        F.sum(capped_pw).cast("long").alias("capped_pair_work"))
    out = (tot.crossJoin(F.broadcast(top))  # two 1-row frames
           .select("n_blocks", "n_rows", "max_block_size", "top_block",
                   "pair_work",
                   F.round((F.col("__top_s") * (F.col("__top_s") - 1)
                            / 2) / F.greatest("pair_work", F.lit(1)),
                           round_to).alias("top_block_pairwork_share"),
                   "capped_pair_work",
                   F.round(F.col("capped_pair_work")
                           / F.greatest("pair_work", F.lit(1)),
                           round_to).alias("capped_share")))
    out._zoi_persisted = [counts]
    return out


def fs_linkage_weights(pairs: DataFrame, *,
                       agree_cols: Sequence[str], proxy_col: str,
                       laplace: float = 0.5,
                       round_to: int = 6) -> DataFrame:
    """Fellegi–Sunter record-linkage field weights (Fellegi & Sunter
    1969): for each boolean agreement field over candidate pairs,
    estimate m = P(agree | match) and u = P(agree | non-match) from a
    deterministic proxy label (an exact-key rule, a seed list, a
    prior model's verdict), and emit the log₂ evidence weights a
    linkage scorer adds per field — agreement_weight = log₂(m/u),
    disagreement_weight = log₂((1-m)/(1-u)). This is the classical
    supervised-ish seed step of probabilistic entity resolution
    (Splink-style); summing the weights over fields scores any pair.

    Laplace-smoothed with ``laplace`` pseudo-counts on both sides so
    a field that never (dis)agrees among the proxy matches yields a
    finite weight instead of ±inf — the standard guard when the
    proxy-match set is small.

    Scale shape: the K agreement columns are unpivoted with
    ``stack`` so the whole estimate is ONE hash aggregation on the
    field name (K keys, map-side combined) over however many
    candidate pairs the blocker produced; no collect, no per-row
    Python. Output: (field, n_match, n_nonmatch, m, u,
    agreement_weight, disagreement_weight), one row per field."""
    if not agree_cols:
        raise ValueError("agree_cols must be non-empty")
    k = len(agree_cols)
    stack_args = ", ".join(
        f"'{c}', cast(`{c}` as int)" for c in agree_cols)
    lng = (pairs.select(
        F.col(proxy_col).cast("int").alias("__m"),
        F.expr(f"stack({k}, {stack_args}) as (field, agree)"))
        .where(F.col("agree").isNotNull() & F.col("__m").isNotNull()))
    a = F.lit(float(laplace))
    g = lng.groupBy("field").agg(
        F.sum("__m").cast("long").alias("n_match"),
        F.sum(1 - F.col("__m")).cast("long").alias("n_nonmatch"),
        F.sum(F.col("agree") * F.col("__m")).alias("__am"),
        F.sum(F.col("agree") * (1 - F.col("__m"))).alias("__au"))
    m = (F.col("__am") + a) / (F.col("n_match") + 2 * a)
    u = (F.col("__au") + a) / (F.col("n_nonmatch") + 2 * a)
    return g.select(
        "field", "n_match", "n_nonmatch",
        F.round(m, round_to).alias("m"),
        F.round(u, round_to).alias("u"),
        F.round(F.log2(m / u), round_to).alias("agreement_weight"),
        F.round(F.log2((1 - m) / (1 - u)),
                round_to).alias("disagreement_weight"))


def _jaro_winkler_batch(a: "pd.Series", b: "pd.Series") -> "pd.Series":
    """Arrow-batched Jaro-Winkler kernel — the EXACT textbook
    definition DuckDB's ``jaro_winkler_similarity`` implements
    (verified value-identical on the adversarial cases: transposition
    'martha/marhta', window-miss 'ab/ba'→0, 'dixon/dicksonx',
    repeated-char 'aaaa/aaa'): match window ⌊max/2⌋−1, greedy
    left-to-right matching, half-transpositions, Winkler prefix boost
    p=0.1 over the first 4 chars applied only when jaro > 0.7."""

    def jw(s1: str, s2: str) -> float:
        if s1 == s2:
            return 1.0
        l1, l2 = len(s1), len(s2)
        if not l1 or not l2:
            return 0.0
        md = max(l1, l2) // 2 - 1
        m1 = [False] * l1
        m2 = [False] * l2
        m = 0
        for i, c in enumerate(s1):
            for j in range(max(0, i - md), min(l2, i + md + 1)):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        j = (m / l1 + m / l2 + (m - t // 2) / m) / 3.0
        if j <= 0.7:
            return j
        pre = 0
        for x, y in zip(s1[:4], s2[:4]):
            if x != y:
                break
            pre += 1
        return j + pre * 0.1 * (1.0 - j)

    return pd.Series([jw(x or "", y or "")
                      for x, y in zip(a.tolist(), b.tolist())],
                     dtype="float64")


def jaro_winkler_pairs(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", threshold: float = 0.9,
                       key_len: int = 40, block_prefix: int = 8,
                       max_block_size: int | None = None) -> DataFrame:
    """Jaro-Winkler near-duplicate pairs over a normalized fixed-length
    key: pairs (id_a < id_b) sharing the first *block_prefix*
    normalized chars whose first *key_len* chars score ≥ *threshold* —
    the record-linkage similarity of choice for short keys
    (titles, names, product labels; Winkler 1990), where Levenshtein
    over-penalizes transpositions and set-similarity has no signal at
    all (JW is positional, not bag-of-tokens).

    Blocking contract is shared with :func:`levenshtein_verify_pairs`:
    equal-prefix blocks keep the join an equi-join (pairs differing
    inside the prefix are missed — standard blocking recall tradeoff),
    and ``max_block_size`` EXCLUDES oversized blocks so no single
    block goes quadratic. The JW kernel itself runs as an
    Arrow-batched pandas UDF over the already-blocked pairs (the
    expensive O(key_len²)-per-pair character walk never sees the full
    corpus, only the candidates), value-identical to DuckDB's
    ``jaro_winkler_similarity`` so the whole operator is
    oracle-checkable end-to-end.

    Returns ``(id_a, id_b, jw)``, jw rounded to 6 dp.
    """
    key = F.substring(normalize_text(F.col(text_col)), 1, int(key_len))
    base = df.select(F.col(id_col).alias("__id"), key.alias("__key"),
                     F.substring(key, 1, int(block_prefix))
                      .alias("__block"))
    if max_block_size is not None:
        sizes = (base.groupBy("__block")
                 .agg(F.count("*").alias("__bs"))
                 .where(F.col("__bs") <= int(max_block_size))
                 .drop("__bs"))
        base = base.join(sizes, "__block")
    udf = F.pandas_udf(_jaro_winkler_batch, T.DoubleType())
    pairs = (base.alias("l")
             .join(base.alias("r"),
                   (F.col("l.__block") == F.col("r.__block"))
                   & (F.col("l.__id") < F.col("r.__id")))
             .select(F.col("l.__id").alias("id_a"),
                     F.col("r.__id").alias("id_b"),
                     F.round(udf(F.col("l.__key"), F.col("r.__key")),
                             6).alias("jw")))
    return pairs.where(F.col("jw") >= float(threshold))


# ---------------------------------------------------------------------------
# content-defined chunking — gear-style boundary dedup
# ---------------------------------------------------------------------------

def _gear_table() -> "list[int]":
    """Deterministic 256-entry gear table: gear[b] = first 32 bits of
    md5(byte b). Public construction (the gear/FastCDC papers leave
    the table free; md5-derived keeps it seedless and reproducible)."""
    import hashlib

    return [int(hashlib.md5(bytes([b])).hexdigest()[:8], 16)
            for b in range(256)]


def _gear_cdc_batch_factory(window: int, mask: int):
    """mapInPandas kernel: true gear rolling hash over UTF-8 BYTES,
    vectorized — h_i = Σ_{j<W} gear[b_{i−j}] << j (the bounded-window
    gear sum), cut before byte i when h over bytes[i−W:i] & mask == 0.
    One md5 PER CHUNK (~expected-chunk-size bytes), not per position —
    the ~W× hashing reduction that makes CDC viable at corpus scale.
    """
    import hashlib

    import numpy as np

    gear = None

    def batches(it):
        nonlocal gear
        import pandas as pd

        if gear is None:
            gear = np.asarray(_gear_table(), dtype=np.uint64)
        for pdf in it:
            ids, idxs, lens, hashes = [], [], [], []
            for id_, txt in zip(pdf["__id"], pdf["__text"]):
                b = txt.encode("utf-8")
                n = len(b)
                if n == 0:
                    continue
                cuts = [0]
                if n > window:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    g = gear[arr]
                    # h over windows ending at positions W-1 .. n-2
                    # (a cut BEFORE byte i needs the window ending
                    # at i-1, i in [W, n-1])
                    h = np.zeros(n - window, dtype=np.uint64)
                    for j in range(window):
                        h += (g[window - 1 - j: n - 1 - j]
                              << np.uint64(j))
                    cut_pos = (np.nonzero((h & np.uint64(mask)) == 0)
                               [0] + window).tolist()
                    cuts += cut_pos
                cuts.append(n)
                for k in range(len(cuts) - 1):
                    chunk = b[cuts[k]:cuts[k + 1]]
                    ids.append(id_)
                    idxs.append(k)
                    lens.append(len(chunk))
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({"id": ids, "chunk_idx": idxs,
                                "chunk_len": lens,
                                "chunk_hash": hashes})

    return batches


def cdc_chunks(df: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id", window: int = 8,
               boundary_nibbles: int = 1,
               engine: str = "expr") -> DataFrame:
    """Content-defined chunking of *text_col*: a chunk boundary opens
    at every position i whose *window*-char context hashes into the
    boundary class — substr(md5(substr(text, i, window)), 1,
    *boundary_nibbles*) all-zero, i.e. an expected chunk length of
    16^nibbles characters. This is the gear/FastCDC family's core idea
    (Xia et al., USENIX ATC 2016) restricted to its stateless form
    (no min-length skip), so every position's boundary decision
    depends ONLY on its local window — the property that makes CDC
    robust to insertions (an edit reshuffles at most the chunks it
    touches, unlike fixed-size blocks) AND makes this implementation
    embarrassingly parallel: no sequential scan state, one array
    expression per row.

    Scale shape: boundary positions, chunk starts/ends and the chunk
    substrings are all computed inside ONE whole-stage-codegen
    projection (sequence → filter → zip_with); the only shuffle is
    whatever the caller aggregates afterwards. Returns one row per
    chunk: ``(id, chunk_idx, chunk_len, chunk_hash)`` — the chunk text
    itself is hashed away so the exploded frame stays narrow.

    Engines: ``"expr"`` (default) hashes EVERY window position with
    md5 in pure Column expressions — oracle-twinnable, but one md5
    per character; ``"arrow"`` is the 100-TB path: a vectorized gear
    rolling hash (numpy) picks the boundaries and md5 runs once PER
    CHUNK, an ~window× hashing reduction. The engines share the
    stateless-window semantics but intentionally differ in boundary
    function (gear vs md5-prefix) and offset unit (bytes vs chars),
    so arrow output is structurally identical, not value-identical.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if engine == "arrow":
        mask = 16 ** int(boundary_nibbles) - 1
        out_schema = T.StructType([
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk_len", T.IntegerType()),
            T.StructField("chunk_hash", T.StringType()),
        ])
        base = (df.where(F.col(text_col).isNotNull()
                         & (F.length(text_col) > 0))
                .select(F.col(id_col).alias("__id"),
                        F.col(text_col).alias("__text")))
        return base.mapInPandas(
            _gear_cdc_batch_factory(int(window), mask), out_schema)
    if engine != "expr":
        raise ValueError(f"unknown cdc_chunks engine: {engine!r}")
    zeros = "0" * int(boundary_nibbles)
    text = F.col(text_col)
    ln = F.length(text)
    cand = F.when(
        ln >= window + 1,
        F.sequence(F.lit(2), ln - window + 1)
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.filter(
        cand,
        lambda i: F.substring(F.md5(text.substr(i, F.lit(window))),
                              1, int(boundary_nibbles)) == zeros)
    starts = F.concat(F.array(F.lit(1)), cuts)
    ends = F.concat(cuts, F.array(ln + 1))
    chunks = F.zip_with(starts, ends,
                        lambda s, e: text.substr(s, e - s))
    rows = (df.where(text.isNotNull() & (ln > 0))
            .select(F.col(id_col).alias("id"),
                    F.posexplode(chunks).alias("chunk_idx", "__chunk")))
    return rows.select(
        "id", "chunk_idx",
        F.length("__chunk").alias("chunk_len"),
        F.md5("__chunk").alias("chunk_hash"))


def cdc_shared_chunks(df: DataFrame, *, text_col: str = "text",
                      id_col: str = "doc_id", window: int = 8,
                      boundary_nibbles: int = 1,
                      min_docs: int = 2,
                      engine: str = "expr") -> DataFrame:
    """Cross-document shared-chunk census over :func:`cdc_chunks`:
    chunks (by content hash) that appear in at least *min_docs*
    distinct documents, with their occurrence counts and length —
    the byte-level near-dup signal that catches shared passages that
    whole-document fingerprints miss and that survives insertions
    that break fixed-offset blocking.

    Scale shape: one projection (the chunker), one hash aggregation
    keyed by chunk_hash; skew-safe because md5 keys are uniform.
    Returns ``(chunk_hash, chunk_len, n_docs, n_occurrences)``.
    """
    chunks = cdc_chunks(df, text_col=text_col, id_col=id_col,
                        window=window,
                        boundary_nibbles=boundary_nibbles,
                        engine=engine)
    return (chunks.groupBy("chunk_hash")
            .agg(F.max("chunk_len").alias("chunk_len"),
                 F.countDistinct("id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .where(F.col("n_docs") >= int(min_docs)))


def simhash_bit_bias(df: DataFrame, *, text_col: str = "text",
                     hash: str = "md5", engine: str = "arrow",
                     round_to: int = 6) -> DataFrame:
    """Bit-balance audit of the simhash fingerprint itself: per bit
    j ∈ 0..59, the share of documents with bit j set, summarized as
    the worst and mean absolute deviation from ½. A healthy token
    hash keeps every bit near 0.5; a biased bit means the underlying
    hash (or a degenerate token distribution — one template owning
    the corpus) is collapsing fingerprint entropy, which silently
    RAISES simhash collision rates and near-dup false positives. The
    QC for the dedup pipeline's own instrument, upstream of
    simhash_pairs.

    One pass computing all 60 bit shares in a single aggregation;
    the fingerprint uses the Arrow vote kernel by default (its
    output is bit-identical to the Column fold, ~10x faster — see
    :func:`simhash`). Returns ``(n_docs, worst_bit, max_abs_bias,
    mean_abs_bias)``.
    """
    h = simhash(F.col(text_col), hash=hash, engine=engine)
    base = df.where(F.col(text_col).isNotNull()).select(h.alias("h"))
    aggs = [F.count(F.lit(1)).cast("long").alias("n_docs")]
    for j in range(SIMHASH_BITS):
        p = 1 << j
        bit = (F.pmod(F.col("h"), F.lit(p * 2)) >= p).cast("double")
        aggs.append(F.avg(bit).alias(f"b{j}"))
    wide = base.agg(*aggs)
    shares = F.array(*[F.col(f"b{j}") for j in range(SIMHASH_BITS)])
    devs = F.transform(shares, lambda s: F.abs(s - 0.5))
    worst = F.array_position(devs, F.array_max(devs)) - 1
    return wide.select(
        "n_docs",
        worst.cast("long").alias("worst_bit"),
        F.round(F.array_max(devs), round_to).alias("max_abs_bias"),
        F.round(F.aggregate(devs, F.lit(0.0),
                            lambda a, x: a + x)
                / F.lit(float(SIMHASH_BITS)), round_to)
        .alias("mean_abs_bias"))
