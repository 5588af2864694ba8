"""Approximate-nearest-neighbor search over an embedding column.

Two paths:

* brute-force cosine top-k — broadcast the (small) query set, score
  every corpus vector with JVM-side zip_with/aggregate expressions,
  rank per query with a window. Exact; one shuffle (the window).
* LSH-bucketed ANN — random-hyperplane sign bits → bucket key; queries
  probe only their bucket (plus optional multi-probe neighbors). The
  scale path: candidate set per query is ~n / 2^bits.

Hyperplanes are generated from a fixed seed on the driver and inlined
as literals — deterministic plans, nothing random at execution time.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_similarity


def brute_force_topk(corpus: DataFrame, queries: DataFrame, *, k: int = 10,
                     corpus_id: str = "vec_id", query_id: str = "query_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query: broadcast-join the query set
    against the corpus (no shuffle for the join), rank by (cosine desc,
    corpus id asc) for deterministic ties."""
    q = F.broadcast(queries.select(F.col(query_id),
                                   F.col(vec_col).alias("__qvec")))
    sim = cosine_similarity(F.col(vec_col), F.col("__qvec"))
    scored = (corpus.join(q)
              .where(F.col(corpus_id) != F.col(query_id))
              .select(query_id, corpus_id, F.round(sim, 6).alias("cosine")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).round(6).tolist()


def suggest_bits(n_rows: int, *, target_block: int = 1024,
                 max_bits: int = 24) -> int:
    """Corpus-size-derived hyperplane count: ``bits ≈ log2(n / target)``
    keeps the EXPECTED bucket population ~``target_block`` as the corpus
    grows — the same parameterize-from-the-data habit as
    ``tablechecks.suggest_salt``. A fixed ``bits`` makes bucket
    population grow linearly with the corpus, so in-bucket pair work
    turns quadratic again at 100×; pass the (approximate) corpus size
    from a count you already have — never peek at the data during plan
    construction."""
    import math

    if n_rows <= target_block:
        return 1
    return max(1, min(max_bits, math.ceil(math.log2(n_rows / target_block))))


def random_hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit_i = 1 iff vec · plane_i > 0. Pure
    expressions — each dot product is a zip_with against a literal
    array."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in plane]),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(corpus: DataFrame, queries: DataFrame, *, k: int = 10,
             bits: int = 8, dim: int | None = None,
             corpus_id: str = "vec_id", query_id: str = "query_id",
             vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Bucketed ANN: score only corpus vectors in the query's bucket.

    Recall < 1 by construction (neighbors across a hyperplane are
    missed); increase recall with fewer bits or multi-probe. At 10^12
    rows the bucket key also serves as the repartition key so each
    executor sees one bucket range.

    ``dim`` is required: hyperplanes are plan-time literals and the
    array length is not part of the Spark schema, so inferring it would
    mean a driver action inside plan construction.
    """
    if dim is None:
        raise ValueError(
            "lsh_topk requires dim= (the embedding dimensionality); "
            "ArrayType carries no length and plan construction must not "
            "trigger a job to peek at the data")
    planes = hyperplanes(dim, bits, seed)
    c = corpus.withColumn("__bucket",
                          random_hyperplane_bucket(F.col(vec_col), planes))
    q = F.broadcast(
        queries
        .select(F.col(query_id), F.col(vec_col).alias("__qvec"))
        .withColumn("__bucket",
                    random_hyperplane_bucket(F.col("__qvec"), planes)))
    sim = cosine_similarity(F.col(vec_col), F.col("__qvec"))
    scored = (c.join(q, "__bucket")
              .where(F.col(corpus_id) != F.col(query_id))
              .select(query_id, corpus_id, F.round(sim, 6).alias("cosine")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def lsh_topk_multiprobe(corpus: DataFrame, queries: DataFrame, *,
                        k: int = 10, bits: int = 8, dim: int | None = None,
                        corpus_id: str = "vec_id", query_id: str = "query_id",
                        vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own bucket PLUS every
    single-bit-flip neighbor (1 + bits buckets) — the standard recall
    knob for hyperplane LSH (a near neighbor across one hyperplane is
    recovered by flipping that plane's bit) at (1+bits)/2^bits of the
    corpus per query instead of 1/2^bits. Corpus vectors live in
    exactly one bucket, probe buckets are distinct, so candidates never
    duplicate and no distinct pass is needed. Same cost model as
    :func:`lsh_topk` otherwise: bucketing is pure expressions, the
    probe is an equi-join on the bucket key.
    """
    if dim is None:
        raise ValueError("lsh_topk_multiprobe requires dim= "
                         "(see lsh_topk)")
    planes = hyperplanes(dim, bits, seed)
    c = corpus.withColumn("__bucket",
                          random_hyperplane_bucket(F.col(vec_col), planes))
    qb = random_hyperplane_bucket(F.col("__qvec"), planes)
    probe_arr = F.array(qb, *[qb.bitwiseXOR(F.lit(1 << i))
                              for i in range(bits)])
    q = F.broadcast(
        queries
        .select(F.col(query_id), F.col(vec_col).alias("__qvec"))
        .withColumn("__bucket", F.explode_outer(probe_arr)))
    sim = cosine_similarity(F.col(vec_col), F.col("__qvec"))
    scored = (c.join(q, "__bucket")
              .where(F.col(corpus_id) != F.col(query_id))
              .select(query_id, corpus_id, F.round(sim, 6).alias("cosine")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def sample_centroids(corpus: DataFrame, *, n_centroids: int = 16,
                     corpus_id: str = "vec_id",
                     vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic coarse centroids: hash-rank the corpus ids and take
    the first ``n_centroids`` vectors. One tiny collect on the driver —
    at 10^12 rows you'd sample ~1e-9 of the table the same way (a
    k-means refinement is a drop-in replacement; the IVF plumbing below
    is unchanged).

    The rank hash is md5-of-id (not xxhash64) so the selection rule is
    expressible in ANSI SQL — the DuckDB oracle re-derives the exact
    same centroid set; the (md5, id) compound key makes the order total.
    """
    rows = (corpus.select(corpus_id, vec_col)
            .orderBy(F.md5(F.col(corpus_id).cast("string")), F.col(corpus_id))
            .limit(n_centroids).collect())
    return [list(map(float, r[1])) for r in rows]


def _centroid_scores(vec: Column, cents: list[list[float]]) -> list[Column]:
    out = []
    for c in cents:
        arr = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, v: acc + v)
        out.append(dot)
    return out


def nearest_centroid(vec: Column, cents: list[list[float]]) -> Column:
    """argmax-dot centroid index as a pure expression chain (first
    index wins ties — deterministic). Scores are rounded to 9 decimals
    before comparison — same grid as :func:`top_centroids` — so an
    engine computing the dot in a different fold order (the SQL oracle)
    lands on the identical argmax."""
    scores = [F.round(s, 9) for s in _centroid_scores(vec, cents)]
    best = None
    mx = F.greatest(*scores) if len(scores) > 1 else scores[0]
    for i, s in enumerate(scores):
        cond = s == mx
        best = F.when(cond, F.lit(i)) if best is None else best.when(cond, F.lit(i))
    return best


def top_centroids(vec: Column, cents: list[list[float]], nprobe: int) -> Column:
    """array<int> of the ``nprobe`` highest-dot centroid indexes —
    sort (score, index) structs descending without leaving the JVM."""
    scores = _centroid_scores(vec, cents)
    structs = F.array(*[
        F.struct(F.round(s, 9).alias("s"), F.lit(i).alias("i"))
        for i, s in enumerate(scores)])
    ranked = F.reverse(F.array_sort(structs))
    return F.transform(F.slice(ranked, 1, nprobe), lambda x: x.getField("i"))


def refine_centroids(corpus: DataFrame, centroids: list[list[float]], *,
                     vec_col: str = "embedding", iters: int = 1,
                     round_to: int = 6) -> list[list[float]]:
    """SPHERICAL k-means refinement of the coarse IVF centroids: assign
    every vector to its nearest centroid (the deterministic
    9-decimal-rounded argmax-dot of :func:`nearest_centroid`), replace
    each centroid with the L2-NORMALIZED mean of its assigned vectors
    (the correct update when assignment/probing rank by dot/cosine — a
    raw mean shrinks toward zero and corrupts the dot ranking), an
    emptied or zero-mean cluster keeps its old centroid; repeat
    ``iters`` times.

    Per iteration: ONE distributed aggregation (groupBy centroid with
    per-component avg — map-side partial combine) and a driver collect
    bounded by n_centroids × dim. Normalized components are rounded to
    ``round_to`` decimals so the trained centroids — and therefore the
    whole trained-IVF plan — remain re-derivable in ANSI SQL for the
    oracle gate (cross-engine fold order drifts at ~1e-15, far inside
    the rounding grid)."""
    import math

    cents = [list(map(float, c)) for c in centroids]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = corpus.select(
            nearest_centroid(F.col(vec_col), cents).alias("__c"),
            F.col(vec_col).alias("__v"))
        rows = (assigned.groupBy("__c")
                .agg(*[F.avg(F.element_at(F.col("__v"), i + 1))
                       .alias(f"m{i}")
                       for i in range(dim)])
                .collect())
        new = {}
        for r in rows:
            m = [float(r[f"m{i}"]) for i in range(dim)]
            norm = math.sqrt(sum(x * x for x in m))
            if norm > 0:
                new[int(r["__c"])] = [round(x / norm, round_to) for x in m]
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return cents


def ivf_topk(corpus: DataFrame, queries: DataFrame, *, k: int = 10,
             n_centroids: int = 16, nprobe: int = 2,
             corpus_id: str = "vec_id", query_id: str = "query_id",
             vec_col: str = "embedding", train_iters: int = 0) -> DataFrame:
    """IVF ANN: corpus vectors are inverted-listed under their nearest
    coarse centroid; each query scores only the lists of its ``nprobe``
    closest centroids. Candidate fraction ≈ nprobe / n_centroids.

    ``train_iters`` > 0 refines the md5-rank seed centroids with that
    many spherical-k-means Lloyd steps (:func:`refine_centroids`)
    before building the lists — better-balanced lists and higher recall
    at the same nprobe, still fully deterministic/oracle-checkable.

    The centroid id is also the natural repartition/bucketing key at
    scale — each executor owns whole inverted lists, and the query →
    list join is an equi-join on the centroid index."""
    cents = sample_centroids(corpus, n_centroids=n_centroids,
                             corpus_id=corpus_id, vec_col=vec_col)
    if train_iters > 0:
        cents = refine_centroids(corpus, cents, vec_col=vec_col,
                                 iters=train_iters)
    c = corpus.withColumn("__cent",
                          nearest_centroid(F.col(vec_col), cents))
    q = F.broadcast(
        queries.select(F.col(query_id), F.col(vec_col).alias("__qvec"))
        .withColumn("__cent", F.explode(
            top_centroids(F.col("__qvec"), cents, nprobe))))
    sim = cosine_similarity(F.col(vec_col), F.col("__qvec"))
    scored = (c.join(q, "__cent")
              .where(F.col(corpus_id) != F.col(query_id))
              .select(query_id, corpus_id, F.round(sim, 6).alias("cosine")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def brute_force_topk_arrow(corpus: DataFrame, queries: DataFrame, *,
                           k: int = 10, corpus_id: str = "vec_id",
                           query_id: str = "query_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k via Arrow-vectorized numpy: the (small) query matrix
    is closed over and L2-normalized once; each corpus batch becomes one
    normalized matmul. Per-partition top-k first (mapInPandas emits at
    most k rows per query per batch), then a global re-rank — the
    standard block-wise top-k that keeps the shuffle tiny at scale."""
    import pandas as pd

    q_rows = queries.select(query_id, vec_col).collect()
    q_ids = [int(r[0]) for r in q_rows]
    qm = np.array([r[1] for r in q_rows], dtype=np.float64)
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)

    out_schema = f"{query_id} long, {corpus_id} long, cosine double"

    def score(batches):
        for pdf in batches:
            ids = pdf[corpus_id].to_numpy()
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cm /= np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)
            sims = cm @ qm.T                      # (batch, n_queries)
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                mask = ids != qid
                # round BEFORE selection and break boundary ties by id —
                # the global re-rank orders by (rounded cosine desc, id
                # asc), so batch selection must keep exactly the rows
                # that ordering would keep (an argpartition on raw
                # cosines can drop the deterministic winner of a tie)
                cand_ids, cand = ids[mask], np.round(col[mask], 6)
                if len(cand) > k:
                    order = np.lexsort((cand_ids, -cand))[:k]
                    cand_ids, cand = cand_ids[order], cand[order]
                yield pd.DataFrame({query_id: qid,
                                    corpus_id: cand_ids.astype("int64"),
                                    "cosine": cand})

    scored = corpus.select(corpus_id, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def with_quantized(df: DataFrame, *, vec_col: str = "embedding",
                   q_col: str = "q", scale_col: str = "q_scale"
                   ) -> DataFrame:
    """Symmetric int8 scalar quantization (the SQ8 storage path of
    FAISS/Milvus): per-vector ``scale = max|x|/127`` and
    ``q_i = round(x_i/scale)`` ∈ [-127, 127] — 4-8× less memory and
    bandwidth than float32, which is what makes a 10^10-vector corpus
    scannable at all. The scale is materialized as a COLUMN before the
    quantize lambda references it (an expression inside a
    higher-order-function lambda re-evaluates per element — embedding
    the array_max here would be O(d²) per row). Zero vectors get scale
    NULL and an all-zero code."""
    absmax = F.array_max(F.transform(
        F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    df = df.withColumn(scale_col,
                       F.when(absmax > 0, absmax / F.lit(127.0)))
    q = F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double")
                                      / F.col(scale_col), 0).cast("int"))
    zeros = F.transform(F.col(vec_col), lambda x: F.lit(0))
    return df.withColumn(
        q_col, F.when(F.col(scale_col).isNotNull(), q).otherwise(zeros))


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def quantized_topk(corpus: DataFrame, queries: DataFrame, *, k: int = 10,
                   corpus_id: str = "vec_id", query_id: str = "query_id",
                   q_col: str = "q") -> DataFrame:
    """Cosine top-k over int8-quantized vectors (run `with_quantized`
    on both sides first). Key property: the per-vector scales CANCEL
    in cosine — cos(s_a·q_a, s_b·q_b) = (q_a·q_b)/(|q_a||q_b|) — so
    the whole score is integer dot products (exact in any engine; with
    d=64 and |q_i|≤127 the products fit a long with 10^6× headroom)
    plus one sqrt+divide, making quantized scores bit-reproducible
    where float32 scans are ulp-wobbly. Broadcast the query block,
    rank by (rounded score DESC, corpus id ASC); zero vectors (NULL
    scale → zero code) score NULL and are excluded."""
    # materialize both self-norms BEFORE the join: computed inside the
    # joined projection, the corpus norm's O(d) fold would re-run once
    # per QUERY instead of once per corpus row
    qs = F.broadcast(
        queries.select(F.col(query_id), F.col(q_col).alias("__qq"))
        .withColumn("__nbb", _int_dot(F.col("__qq"), F.col("__qq"))))
    corpus = corpus.withColumn(
        "__naa", _int_dot(F.col(q_col), F.col(q_col)))
    dot = _int_dot(F.col(q_col), F.col("__qq"))
    naa = F.col("__naa")
    nbb = F.col("__nbb")
    score = F.when((naa > 0) & (nbb > 0),
                   F.round(dot / F.sqrt((naa * nbb).cast("double")), 6))
    scored = (corpus.join(qs)
              .where(F.col(corpus_id) != F.col(query_id))
              .select(query_id, corpus_id, score.alias("q_cosine"))
              .where(F.col("q_cosine").isNotNull()))
    w = Window.partitionBy(query_id).orderBy(F.col("q_cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def centroid_drift(df: DataFrame, *, group_col: str = "label",
                   vec_col: str = "embedding", round_to: int = 9
                   ) -> DataFrame:
    """Pairwise cosine between per-group MEAN embeddings — the
    embedding-space drift check (did source X's content shift away
    from source Y's? are two shards semantically interchangeable?)
    that sits next to the token-space JS/KL checks. Component means
    are rounded to *round_to* decimals before the cosine (the
    refine_centroids precedent: engines sum floats in different orders
    and the rounding grid absorbs the last-ulp wobble).

    Shape at scale: posexplode to (group, dim) — dim is a constant
    ~10²-10³ multiplier, not a blowup — one avg aggregation with
    map-side combine, re-assembled per group (groups ≪ corpus), then
    a broadcast self-join over the group list for the pairwise
    cosines. Cost rides groups² · dim."""
    comp = (df.select(F.col(group_col).alias("g"),
                      F.posexplode(F.transform(
                          F.col(vec_col),
                          lambda x: x.cast("double"))).alias("i", "x"))
            .groupBy("g", "i")
            .agg(F.round(F.avg("x"), round_to).alias("m")))
    cent = (comp.groupBy("g")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))),
                lambda s: s["m"]).alias("c")))
    a = cent.select(F.col("g").alias("g_a"), F.col("c").alias("__ca"))
    b = cent.select(F.col("g").alias("g_b"), F.col("c").alias("__cb"))
    dot = F.aggregate(F.zip_with("__ca", "__cb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform("__ca", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform("__cb", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    cos = F.when((na > 0) & (nb > 0), F.round(dot / (na * nb), 6))
    return (a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))
            .select("g_a", "g_b", cos.alias("centroid_cosine")))


def recall_at_k(approx: DataFrame, exact: DataFrame, *,
                query_id: str = "query_id",
                corpus_id: str = "vec_id") -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one —
    the evaluation loop every ANN deployment runs before trading
    recall for speed (quantization, LSH bits, nprobe are all tuned on
    this number). Both inputs are (query, neighbor[, rank]) frames
    (the shape every top-k operator here returns); k is whatever the
    inputs carry. Output: per-query ``n_exact``, ``n_hit``,
    ``recall`` — macro-average downstream as needed.

    Shape: one equi-join on (query, neighbor) + one query-keyed
    aggregation; both sides are query-count·k sized, ≪ corpus."""
    # distinct both projections: duplicate (query, neighbor) rows (e.g.
    # unioned LSH probe rounds) would fan the left join out and inflate
    # n_exact
    ex = exact.select(F.col(query_id).alias("__q"),
                      F.col(corpus_id).alias("__n")).distinct()
    ap = (approx.select(F.col(query_id).alias("__q"),
                        F.col(corpus_id).alias("__n")).distinct()
          .withColumn("__hit", F.lit(1)))
    return (ex.join(ap, ["__q", "__n"], "left")
            .groupBy(F.col("__q").alias(query_id))
            .agg(F.count("*").alias("n_exact"),
                 F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hit"))
            .withColumn("recall",
                        F.round(F.col("n_hit") / F.col("n_exact"), 6)))


def silhouette_centroid(df: DataFrame, *, id_col: str = "vec_id",
                        group_col: str = "label",
                        vec_col: str = "embedding",
                        round_to: int = 9) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster: for every
    point, a = cosine distance to its OWN centroid, b = cosine distance
    to the nearest OTHER centroid, s = (b−a)/max(a,b); emitted per
    cluster as (label, n_points, mean_a, mean_b, mean_silhouette) —
    the clustering-quality report for IVF/semantic-dedup partitions
    without the O(n²) pairwise classic silhouette. Component means are
    rounded to *round_to* decimals before any cosine (the
    centroid_drift / refine_centroids precedent), per-point s to 6.
    Zero-norm points or centroids are excluded (cosine undefined).

    Shape at scale: centroids via one posexplode aggregation (dim is a
    constant multiplier), then ONE broadcast join of the corpus
    against the ≤groups-row centroid table — cost n·groups·dim, no
    shuffle of the embedding column beyond the scan."""
    comp = (df.select(F.col(group_col).alias("g"),
                      F.posexplode(F.transform(
                          F.col(vec_col),
                          lambda x: x.cast("double"))).alias("i", "x"))
            .groupBy("g", "i")
            .agg(F.round(F.avg("x"), round_to).alias("m")))
    cent = (comp.groupBy("g")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("i", "m"))),
                lambda s: s["m"]).alias("c")))
    pts = df.select(F.col(id_col).alias("__id"),
                    F.col(group_col).alias("__lbl"),
                    F.transform(F.col(vec_col),
                                lambda x: x.cast("double")).alias("v"))
    dot = F.aggregate(F.zip_with("v", "c", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nc = F.sqrt(F.aggregate(F.transform("c", lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    d = (pts.join(F.broadcast(cent))
         .where((nv > 0) & (nc > 0))
         .select("__id", "__lbl", "g",
                 (F.lit(1.0) - dot / (nv * nc)).alias("dist")))
    per = (d.groupBy("__id", "__lbl")
           .agg(F.min(F.when(F.col("g") == F.col("__lbl"),
                             F.col("dist"))).alias("a"),
                F.min(F.when(F.col("g") != F.col("__lbl"),
                             F.col("dist"))).alias("b"))
           .where(F.col("a").isNotNull() & F.col("b").isNotNull()))
    s = F.when(F.greatest("a", "b") > 0,
               (F.col("b") - F.col("a")) / F.greatest("a", "b")) \
        .otherwise(F.lit(0.0))
    # per-point values quantized to exact micro-unit integers BEFORE
    # aggregation: integer sums are order-independent, so the means
    # can't wobble across engines at the 6th decimal the way a
    # float-sum average can
    def micro(c):
        return F.round(c * 1e6).cast("long")

    scored = per.select(F.col("__lbl").alias(group_col),
                        micro(s).alias("s"),
                        micro(F.col("a")).alias("ra"),
                        micro(F.col("b")).alias("rb"))

    def mean6(c):
        return F.round(F.sum(c) / 1e6 / F.count("*"), 6)

    return (scored.groupBy(group_col)
            .agg(F.count("*").cast("long").alias("n_points"),
                 mean6(F.col("ra")).alias("mean_a"),
                 mean6(F.col("rb")).alias("mean_b"),
                 mean6(F.col("s")).alias("mean_silhouette")))


def mutual_topk_pairs(df: DataFrame, *, k: int = 10,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Mutual-kNN pairs: (a, b) kept only when each vector is in the
    OTHER's cosine top-k — the standard symmetric-graph construction
    for semantic dedup / clustering (one-directional kNN links hubs to
    everything; mutuality prunes them). Output: (id_a, id_b, cosine)
    with id_a < id_b, cosine rounded like brute_force_topk.

    Built on brute_force_topk's broadcast scoring: all-pairs n²·dim —
    run it per block/cell (IVF or LSH bucket) at corpus scale, exactly
    like the exact-verify stage of the other dedup paths. The top-k
    edge list is persisted: it feeds both join sides."""
    qs = df.select(F.col(id_col).alias("query_id"),
                   F.col(vec_col).alias(vec_col))
    top = (brute_force_topk(df, qs, k=k, corpus_id=id_col,
                            vec_col=vec_col)
           .select(F.col("query_id").alias("a"),
                   F.col(id_col).alias("b"), "cosine")
           .persist())
    rev = top.select(F.col("b").alias("ra"), F.col("a").alias("rb"))
    out = (top.where(F.col("a") < F.col("b"))
           .join(rev, (F.col("a") == F.col("ra"))
                 & (F.col("b") == F.col("rb")), "left_semi")
           .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"),
                   "cosine"))
    out._zoi_persisted = [top]  # release after materialization
    return out


def angular_histogram(df: DataFrame, *, id_col: str = "vec_id",
                      vec_col: str = "embedding", n_blocks: int = 64,
                      bins: int = 10) -> DataFrame:
    """Histogram of pairwise cosine similarity over a DETERMINISTIC
    blocked pair sample — the embedding-space health check: a healthy
    corpus has a unimodal mass away from 1.0; a spike near 1.0 means
    duplicate mass, a spike near 0 with high dimension means the
    encoder collapsed. Run before trusting any ANN/SemDeDup pass.

    Sampling is id-arithmetic, not random: vectors pair within
    ``id % n_blocks`` blocks (a < b) — every engine reproduces the
    same pair set, and the pair count is Σ C(block,2) ≈ N²/(2·B),
    tuned by ``n_blocks`` (scale B ∝ N for a linear sample).

    Bins are computed in INTEGER micro-space: cos is micro-rounded
    first (the proven round-6 cross-engine contract for fold-order
    float sums), then ``floor((cos_micro + 1e6)·bins / 2e6)`` — the
    division is exact in double for these magnitudes, so bin edges
    can't flip between engines. Returns ``(bin, n_pairs, lo_micro,
    hi_micro)`` per non-empty bin.
    """
    if bins < 1 or n_blocks < 1:
        raise ValueError("bins and n_blocks must be >= 1")
    from .dedup import cosine_similarity

    b = df.select(F.col(id_col).alias("__id"),
                  F.col(vec_col).alias("__v"),
                  F.pmod(id_col, F.lit(int(n_blocks))).alias("__blk"))
    pairs = (b.alias("l")
             .join(b.alias("r"),
                   (F.col("l.__blk") == F.col("r.__blk"))
                   & (F.col("l.__id") < F.col("r.__id"))))
    cm = F.round(F.lit(1e6) * cosine_similarity(
        F.col("l.__v"), F.col("r.__v"))).cast("long")
    binned = pairs.select(cm.alias("__cm")).select(
        F.least(F.floor((F.col("__cm") + F.lit(1_000_000))
                        * F.lit(int(bins)) / F.lit(2_000_000)),
                F.lit(bins - 1)).cast("long").alias("bin"),
        "__cm")
    return (binned.groupBy("bin")
            .agg(F.count("*").alias("n_pairs"),
                 F.min("__cm").alias("lo_micro"),
                 F.max("__cm").alias("hi_micro")))


def embedding_norm_qc(df: DataFrame, *, group_col: str = "label",
                      vec_col: str = "embedding") -> DataFrame:
    """Per-group embedding-column intake QC — the checks an embedding
    table must pass BEFORE any cosine-based operator is trusted: NULL
    vectors (upstream encoder failures), dimension drift (a model swap
    mid-corpus shows as dim_min != dim_max and silently breaks every
    zip_with), zero-norm vectors (cosine is undefined; every operator
    here guards them, but mass of them means the encoder is broken)
    and NaN components (poisoned accumulators).

    Output per group: ``n_vecs`` (non-NULL), ``n_null``, ``dim_min``,
    ``dim_max``, ``n_zero_norm``, ``n_nan``, ``norm_avg`` / ``norm_min``
    / ``norm_max`` (round-6; norms are per-row left-fold sums of
    squares, the proven cross-engine float contract).

    Shape at 10^10 vectors: ONE scan + one hash aggregation on the
    group key with map-side combine — the same single-pass-stats shape
    as ``tablechecks.column_stats``, just over array-typed payload.
    Zoi seed: array type checks (lib/zoi/types/array.ex:54-80) do the
    per-element walk one term at a time; here the walk is a fused
    JVM fold per row.
    """
    v = F.col("__v")
    norm = F.when(
        v.isNotNull(),
        F.sqrt(F.aggregate(v, F.lit(0.0),
                           lambda acc, x: acc + x.cast("double")
                           * x.cast("double"))))
    has_nan = F.when(v.isNotNull(),
                     F.exists(v, lambda x: F.isnan(x.cast("double"))))
    base = df.select(F.col(group_col).alias("group"),
                     F.col(vec_col).alias("__v"))
    base = base.select(
        "group", norm.alias("__norm"),
        F.when(v.isNotNull(), F.size(v)).alias("__dim"),
        has_nan.alias("__nan"))
    return (base.groupBy("group").agg(
        F.count("__norm").alias("n_vecs"),
        (F.count("*") - F.count("__norm")).alias("n_null"),
        F.min("__dim").alias("dim_min"),
        F.max("__dim").alias("dim_max"),
        F.sum(F.when(F.col("__norm") == 0, 1).otherwise(0))
        .cast("long").alias("n_zero_norm"),
        F.sum(F.when(F.col("__nan"), 1).otherwise(0))
        .cast("long").alias("n_nan"),
        F.round(F.avg("__norm"), 6).alias("norm_avg"),
        F.round(F.min("__norm"), 6).alias("norm_min"),
        F.round(F.max("__norm"), 6).alias("norm_max")))


def covariance_pairs(df: DataFrame, *, vec_col: str = "embedding",
                     round_to: int = 6) -> DataFrame:
    """Population covariance matrix of the embedding columns as
    ``(i, j, cov)`` rows (upper triangle, i <= j) — the input to any
    PCA/whitening step (anisotropic embeddings are the usual reason
    raw cosine thresholds transfer badly between corpora; the
    covariance spectrum is the diagnosis).

    Physical shape — the canonical Arrow PARTIAL-AGGREGATION pattern:
    ``mapInPandas`` reduces each Arrow batch to ONE partial row
    ``(n, sum_vec, sum_outer)`` with a single numpy ``Xᵀ·X`` per
    batch, then the partials (one row per ~10k-row batch — tiny at any
    corpus size) explode to (position, value) and sum in one hash
    aggregation. Nothing wider than d² ever shuffles, no per-row
    Python, and the driver never sees raw vectors. A posexplode×2
    per-row alternative would shuffle N·d² rows — that is the design
    this operator exists to avoid at 100 TB.

    NULL vectors are skipped; rows with inconsistent dims raise inside
    the kernel (run :func:`embedding_norm_qc` first).
    """
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            vs = [v for v in pdf["__v"] if v is not None]
            if not vs:
                continue
            m = np.array([np.asarray(v, dtype=np.float64) for v in vs])
            yield pd.DataFrame({
                "n": [len(m)],
                "s": [m.sum(axis=0).tolist()],
                "o": [(m.T @ m).ravel().tolist()],
            })

    parts = (df.select(F.col(vec_col).alias("__v"))
             .mapInPandas(partials,
                          "n long, s array<double>, o array<double>")
             .withColumn("__d", F.size("s")))
    parts = parts.persist()
    # flatten to (pos, partial-sum) and reduce — d² keys, corpus-free
    osum = (parts.select(F.col("__d"),
                         F.posexplode("o").alias("p", "x"))
            .groupBy("__d", "p").agg(F.sum("x").alias("oxx")))
    ssum = (parts.select(F.posexplode("s").alias("i", "x"))
            .groupBy("i").agg(F.sum("x").alias("sx")))
    ntot = parts.agg(F.sum("n").alias("nn"))
    mi = ssum.select(F.col("i").alias("__mi"), F.col("sx").alias("__si"))
    mj = ssum.select(F.col("i").alias("__mj"), F.col("sx").alias("__sj"))
    out = (osum
           .withColumn("i", (F.col("p") / F.col("__d")).cast("int"))
           .withColumn("j", F.pmod("p", F.col("__d")).cast("int"))
           .where(F.col("i") <= F.col("j"))
           .join(F.broadcast(mi), F.col("i") == F.col("__mi"))
           .join(F.broadcast(mj), F.col("j") == F.col("__mj"))
           .crossJoin(F.broadcast(ntot))
           .select("i", "j",
                   F.round(F.col("oxx") / F.col("nn")
                           - (F.col("__si") / F.col("nn"))
                           * (F.col("__sj") / F.col("nn")),
                           round_to).alias("cov")))
    out._zoi_persisted = [parts]
    return out


def rrf_topk(corpus: DataFrame, queries: DataFrame, *, k: int = 10,
             rrf_k: int = 60, corpus_id: str = "vec_id",
             query_id: str = "query_id",
             vec_col: str = "embedding") -> DataFrame:
    """Reciprocal-rank fusion of a cosine ranking and an L2 ranking
    per query (Cormack et al., SIGIR'09): fused = Σ 1/(rrf_k + rank).
    The standard way to combine retrieval signals WITHOUT calibrating
    their score scales — here the two metrics disagree exactly when
    vector norms carry information, which is also when picking one of
    them silently loses it.

    Both ranks come from ONE broadcast join + scored projection; the
    two row_numbers share the same window partitioning, so the whole
    operator is a single query-keyed shuffle. Ranks order by the
    micro-rounded metric with the corpus id as tiebreak (the proven
    deterministic-ties contract); the fused score is exact rational
    arithmetic on small integers, identical in every engine.

    Output: ``(query_id, corpus_id, rank_cos, rank_l2, rrf_micro,
    rank)`` — top-*k* by (fused desc, id asc).
    """
    from .dedup import cosine_similarity

    q = F.broadcast(queries.select(F.col(query_id),
                                   F.col(vec_col).alias("__qvec")))
    cos = F.round(cosine_similarity(F.col(vec_col), F.col("__qvec")), 6)
    l2 = F.round(F.sqrt(F.aggregate(
        F.zip_with(F.col(vec_col), F.col("__qvec"),
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)), 6)
    scored = (corpus.join(q)
              .where(F.col(corpus_id) != F.col(query_id))
              .select(query_id, corpus_id, cos.alias("__cos"),
                      l2.alias("__l2")))
    wc = Window.partitionBy(query_id).orderBy(
        F.col("__cos").desc(), F.col(corpus_id).asc())
    wl = Window.partitionBy(query_id).orderBy(
        F.col("__l2").asc(), F.col(corpus_id).asc())
    ranked = (scored
              .withColumn("rank_cos", F.row_number().over(wc))
              .withColumn("rank_l2", F.row_number().over(wl)))
    fused = (F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("rank_cos"))
             + F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("rank_l2")))
    wf = Window.partitionBy(query_id).orderBy(
        fused.desc(), F.col(corpus_id).asc())
    return (ranked
            .withColumn("rrf_micro",
                        F.round(fused * 1e6).cast("long"))
            .withColumn("rank", F.row_number().over(wf))
            .where(F.col("rank") <= int(k))
            .select(query_id, corpus_id, "rank_cos", "rank_l2",
                    "rrf_micro", "rank"))


def pq_codebooks(dim: int, m: int = 4, ksub: int = 8,
                 seed: int = 42) -> list[list[list[float]]]:
    """Seeded product-quantization codebooks: *m* subspaces × *ksub*
    centroids × dim/m components, driver-generated literals (the
    hyperplanes() convention — deterministic plans, nothing random at
    execution time; real deployments train these with k-means per
    subspace, which refine_centroids already demonstrates)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.RandomState(seed)
    return rng.randn(m, ksub, dim // m).round(6).tolist()


def _l2sq(sub: Column, cent: list[float]) -> Column:
    """Squared L2 via the |a|²+|c|²−2a·c identity — each term a
    sequential fold/dot both engines reproduce; callers round to 9
    before comparing (the nearest_centroid grid)."""
    arr = F.array(*[F.lit(float(x)) for x in cent])
    dot = F.aggregate(F.zip_with(sub, arr, lambda a, b:
                                 a.cast("double") * b),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.aggregate(sub, F.lit(0.0),
                     lambda acc, v: acc + v.cast("double")
                     * v.cast("double"))
    nc = F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v * v)
    return na + nc - 2.0 * dot


def pq_topk(corpus: DataFrame, queries: DataFrame, *, k: int = 10,
            m: int = 4, ksub: int = 8, seed: int = 42,
            corpus_id: str = "vec_id", query_id: str = "query_id",
            vec_col: str = "embedding") -> DataFrame:
    """Product-quantization ANN (Jégou et al., PAMI 2011): corpus
    vectors compress to *m* codebook indexes (argmin squared-L2 per
    subspace, 9-decimal grid, first index wins ties); queries score
    candidates by ASYMMETRIC distance — the exact query subvector
    against the corpus centroid code, summed over subspaces via a
    per-query distance TABLE (m × ksub) built once.

    Why it matters at 10^10+ vectors: the scan side touches only
    m·log2(ksub) bits per vector (here 12 bits vs 64 floats = 170×
    smaller), the distance is m table lookups instead of a d-length
    fold, and the table build is per-QUERY work, off the corpus scan.
    Recall tuning = train the codebooks (refine_centroids per
    subspace) and raise ksub; eval with recall_at_k.

    Everything is JVM expressions: encode is a when-chain argmin,
    the lookup is element_at into a broadcast literal-array column.
    Output: ``(query_id, corpus_id, adc, rank)`` — ascending ADC,
    id tiebreak, top-*k*."""
    books = pq_codebooks(_vec_dim(corpus, vec_col), m=m, ksub=ksub,
                         seed=seed)
    sub_d = len(books[0][0])

    def sub(vec: Column, s: int) -> Column:
        return F.slice(vec, s * sub_d + 1, sub_d)

    # corpus side: m argmin codes per vector
    codes = []
    for s, book in enumerate(books):
        d2 = [F.round(_l2sq(sub(F.col(vec_col), s), c), 9) for c in book]
        mn = F.least(*d2)
        code = None
        for i, d in enumerate(d2):
            cond = d == mn
            code = F.when(cond, F.lit(i)) if code is None \
                else code.when(cond, F.lit(i))
        codes.append(code)
    corp = corpus.select(F.col(corpus_id), F.array(*codes).alias("__code"))

    # query side: the m × ksub ADC table (exact subvector vs centroid)
    dtab = F.array(*[
        F.array(*[F.round(_l2sq(sub(F.col(vec_col), s), c), 9)
                  for c in book])
        for s, book in enumerate(books)])
    q = F.broadcast(queries.select(F.col(query_id),
                                   dtab.alias("__dtab")))
    adc = None
    for s in range(m):
        term = F.element_at(F.element_at("__dtab", s + 1),
                            F.element_at("__code", s + 1) + 1)
        adc = term if adc is None else adc + term
    scored = (corp.join(q)
              .where(F.col(corpus_id) != F.col(query_id))
              .select(query_id, corpus_id,
                      F.round(adc, 6).alias("adc")))
    w = Window.partitionBy(query_id).orderBy(F.col("adc").asc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k)))


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from table METADATA when the source
    declares it, else from one row (a driver-side LIMIT-1 probe — the
    only alternative is making every caller pass dim)."""
    row = df.select(F.size(vec_col)).where(
        F.col(vec_col).isNotNull()).limit(1).collect()
    if not row:
        raise ValueError(f"cannot infer dim: {vec_col} is all NULL")
    return int(row[0][0])


def emb_prefix_energy(df: DataFrame, *, vec_col: str = "embedding",
                      prefix_dims: int | None = None,
                      n_buckets: int = 10,
                      round_to: int = 6) -> DataFrame:
    """Matryoshka-truncation QC: how much of each vector's energy
    (squared L2 mass) lives in its first ``prefix_dims`` dimensions —
    the decision statistic for storing truncated embeddings (MRL,
    Kusupati et al. 2022): truncation preserves cosine ranking only
    when prefix energy is uniformly high. Vectors are bucketed by
    ``floor(share · n_buckets)`` (share-1.0 clamps into the top
    bucket) and the histogram ``(bucket, lo, n_vecs)`` is returned —
    a left-heavy histogram says the index can halve its dimensions, a
    flat one says it cannot. Defaults to the first HALF of the
    dimensions (probed once from data).

    Shape at 10^10 vectors: one fused projection (two in-expression
    squared-sum folds over the array) + one ≤``n_buckets``-row
    aggregation — no shuffle wider than the bucket count, no Python.
    """
    k = int(prefix_dims) if prefix_dims is not None \
        else max(1, _vec_dim(df, vec_col) // 2)
    sq = lambda acc, v: acc + v.cast("double") * v.cast("double")  # noqa: E731
    full = F.aggregate(F.col(vec_col), F.lit(0.0), sq)
    pref = F.aggregate(F.slice(F.col(vec_col), 1, k), F.lit(0.0), sq)
    # round-6 BEFORE bucketing: the fold order of float sums can differ
    # across engines by an ulp, and floor() at a bucket boundary would
    # amplify that into a different bucket
    share = F.round(F.when(full > 0, pref / full).otherwise(F.lit(0.0)),
                    round_to)
    bucket = F.least(F.floor(share * n_buckets),
                     F.lit(n_buckets - 1)).cast("long")
    return (df.where(F.col(vec_col).isNotNull())
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_vecs"))
            .select("bucket",
                    F.round(F.col("bucket") / n_buckets, round_to)
                    .alias("lo"), "n_vecs"))


def effective_dim(df: DataFrame, vec_col: str = "embedding", *,
                  dead_eps: float = 1e-12,
                  round_to: int = 6) -> DataFrame:
    """Participation-ratio effective dimension of an embedding
    column: PR = (sum var_d)^2 / sum var_d^2 over the per-dimension
    variances - the eigendecomposition-free estimate of how many
    dimensions the corpus ACTUALLY uses (diagonal approximation:
    exact when dims are uncorrelated, a ceiling otherwise,
    documented). An advertised-768-dim embedding with PR 40 pays
    19x storage and ANN cost for nothing; dead dims (var < eps) are
    broken featurizer outputs. One explode + per-dim aggregation +
    1-row close. Returns ``(n, d, total_var, pr_effective_dim,
    n_dead_dims, top_var_share)``.
    """
    per = (df.where(F.col(vec_col).isNotNull())
           .select(F.posexplode(F.col(vec_col))
                   .alias("i", "x"))
           .groupBy("i")
           .agg(F.var_pop("x").alias("v"),
                F.count(F.lit(1)).alias("n")))
    a = per.agg(
        F.first("n").alias("n"),
        F.count(F.lit(1)).alias("d"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") ** 2).alias("sv2"),
        F.sum((F.col("v") < float(dead_eps)).cast("long"))
         .alias("dead"),
        F.max("v").alias("vmax"))
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.col("d").cast("long").alias("d"),
        F.round("sv", round_to).alias("total_var"),
        F.round(F.col("sv") ** 2 / F.col("sv2"), round_to)
         .alias("pr_effective_dim"),
        F.col("dead").cast("long").alias("n_dead_dims"),
        F.round(F.col("vmax") / F.col("sv"), round_to)
         .alias("top_var_share"))


def anisotropy(df: DataFrame, vec_col: str = "embedding", *,
               round_to: int = 6) -> DataFrame:
    """EXACT mean pairwise cosine similarity of the corpus
    (Ethayarajh 2019's anisotropy) without a pair in sight: for
    L2-normalized vectors u_i,

        mean_{i != j} cos(u_i, u_j)
            = (||sum_i u_i||^2 - n) / (n(n-1))

    so one pass summing normalized components answers what a naive
    implementation would need n^2/2 dot products for. High
    anisotropy (all vectors crowd a cone) destroys cosine's
    discriminative range - the reason whitening exists. One explode
    + per-dim sums. Returns ``(n, d, mean_cosine, mean_norm)`` -
    mean_norm is the pre-normalization L2 mean, the scale sanity
    check.
    """
    norm = F.sqrt(F.aggregate(
        F.col(vec_col), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    base = df.where(F.col(vec_col).isNotNull()) \
             .select(F.col(vec_col).alias("e"), norm.alias("nm")) \
             .where(F.col("nm") > 0)
    per = (base.select(
        "nm", F.posexplode(F.col("e")).alias("i", "x"))
        .select("i", (F.col("x").cast("double")
                      / F.col("nm")).alias("u"), "nm")
        .groupBy("i")
        .agg(F.sum("u").alias("su"), F.count(F.lit(1)).alias("n"),
             F.avg("nm").alias("mn")))
    a = per.agg(F.first("n").alias("n"),
                F.count(F.lit(1)).alias("d"),
                F.sum(F.col("su") ** 2).alias("s2"),
                F.first("mn").alias("mn"))
    mean_cos = (F.col("s2") - F.col("n")) \
        / (F.col("n") * (F.col("n") - 1))
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.col("d").cast("long").alias("d"),
        F.round(mean_cos, round_to).alias("mean_cosine"),
        F.round("mn", round_to).alias("mean_norm"))


def norm_length_bias(emb_df: DataFrame, doc_df: DataFrame, *,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     doc_id_col: str = "doc_id",
                     len_col: str = "n_chars",
                     round_to: int = 6) -> DataFrame:
    """Embedding-norm vs document-length bias audit: if ||e(doc)||
    correlates with length, cosine-ranked retrieval silently
    prefers (or punishes) long documents, and any norm-based
    filtering is a length filter in disguise. One join on the id
    column + one moment aggregation. Returns ``(n, mean_norm,
    pearson_r, slope_per_kchar)``.
    """
    norm = F.sqrt(F.aggregate(
        F.col(vec_col), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    e = emb_df.where(F.col(vec_col).isNotNull()) \
              .select(F.col(id_col).alias("id"), norm.alias("nm"))
    d = doc_df.where(F.col(len_col).isNotNull()) \
              .select(F.col(doc_id_col).alias("id"),
                      F.col(len_col).cast("double").alias("ln"))
    j = e.join(d, "id")
    a = j.agg(F.count(F.lit(1)).alias("n"),
              F.avg("nm").alias("mn"),
              F.try_divide(F.covar_pop("nm", "ln"),
                           F.stddev_pop("nm")
                           * F.stddev_pop("ln")).alias("r"),
              F.try_divide(F.covar_pop("nm", "ln"),
                           F.var_pop("ln")).alias("sl"))
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.round("mn", round_to).alias("mean_norm"),
        F.round("r", round_to).alias("pearson_r"),
        F.round(F.col("sl") * 1000.0, round_to)
         .alias("slope_per_kchar"))


def label_retrieval_eval(df: DataFrame, *,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         label_col: str = "label",
                         k: int = 10, n_queries: int = 20,
                         round_to: int = 6) -> DataFrame:
    """Label-as-relevance retrieval eval: using each sampled query's
    LABEL as the relevance oracle, rank the corpus by exact cosine
    and report precision@k (the mean same-label share in the top
    k), MRR (how high the FIRST relevant hit sits) and coverage@k
    (queries with any hit) - the three numbers that say whether an
    embedding is retrieval-ready before any ANN index exists.
    Queries are the n_queries smallest ids (deterministic). The
    query block is a broadcast k x d matrix against the corpus -
    the documented small-side pattern of the ANN rows. Returns one
    row ``(n_queries, k, precision_at_k, mrr, coverage_at_k)``.
    """
    kk = int(k)
    base = df.where(F.col(vec_col).isNotNull()
                    & F.col(label_col).isNotNull()) \
             .select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("e"),
                     F.col(label_col).alias("lb"))
    qs = base.orderBy("id").limit(int(n_queries)) \
             .select(F.col("id").alias("qid"),
                     F.col("e").alias("qe"),
                     F.col("lb").alias("qlb"))
    pairs = (base.crossJoin(F.broadcast(qs))
             .where(F.col("id") != F.col("qid")))
    dot = F.aggregate(
        F.zip_with("e", "qe", lambda a, b:
                   a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.col("e"), F.lit(0.0),
                            lambda acc, x: acc + x.cast("double")
                            * x.cast("double")))
    nb = F.sqrt(F.aggregate(F.col("qe"), F.lit(0.0),
                            lambda acc, x: acc + x.cast("double")
                            * x.cast("double")))
    scored = pairs.select(
        "qid", "qlb", "id", "lb",
        (dot / na / nb).alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(),
                                          F.col("id"))
    ranked = scored.select("qid", "qlb", "lb",
                           F.row_number().over(w).alias("r")) \
                   .where(F.col("r") <= kk)
    hit = (F.col("lb") == F.col("qlb")).cast("double")
    per_q = ranked.groupBy("qid").agg(
        F.avg(hit).alias("p_at_k"),
        F.min(F.when(F.col("lb") == F.col("qlb"),
                     F.col("r"))).alias("first_hit"))
    agg = per_q.agg(
        F.count(F.lit(1)).alias("nq"),
        F.avg("p_at_k").alias("p"),
        F.avg(F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0)))
         .alias("mrr"),
        F.avg(F.col("first_hit").isNotNull().cast("double"))
         .alias("cov"))
    return agg.select(
        F.col("nq").cast("long").alias("n_queries"),
        F.lit(kk).alias("k"),
        F.round("p", round_to).alias("precision_at_k"),
        F.round("mrr", round_to).alias("mrr"),
        F.round("cov", round_to).alias("coverage_at_k"))


def cluster_validity(df: DataFrame, *, vec_col: str = "embedding",
                     label_col: str = "label",
                     round_to: int = 6) -> DataFrame:
    """Calinski-Harabasz and Davies-Bouldin validity indices for a
    labeled embedding corpus - the two standard "are these labels
    geometric clusters" scalars (CH higher-better: between/within
    variance ratio; DB lower-better: worst-pair compactness/
    separation), both computable from per-label centroids and
    scatters alone, so the plan is one explode aggregation + a
    k x k centroid matrix, never a pairwise pass over points.
    Returns one row ``(n, k_labels, ch_index, db_index)``.
    """
    base = df.where(F.col(vec_col).isNotNull()
                    & F.col(label_col).isNotNull()) \
             .select(F.col(label_col).alias("lb"),
                     F.posexplode(F.col(vec_col)).alias("i", "x")) \
             .select("lb", "i", F.col("x").cast("double").alias("x"))
    per = base.groupBy("lb", "i").agg(
        F.avg("x").alias("c"),
        F.sum(F.col("x") ** 2).alias("sx2"),
        F.count(F.lit(1)).cast("double").alias("n"))
    # within-cluster scatter per label: sum over dims of
    # (sum x^2 - n*c^2); intra = sqrt(W_l / n_l)
    per_l = per.groupBy("lb").agg(
        F.first("n").alias("n"),
        F.sum(F.col("sx2") - F.col("n") * F.col("c") ** 2)
         .alias("w"))
    glob = base.groupBy("i").agg(F.avg("x").alias("g"))
    between = (per.join(glob, "i")
               .groupBy("lb")
               .agg(F.first("n").alias("n"),
                    F.sum((F.col("c") - F.col("g")) ** 2)
                    .alias("b2")))
    tot = per_l.join(between.select("lb", "b2"), "lb")
    a = tot.agg(F.sum("n").alias("nn"),
                F.count(F.lit(1)).cast("double").alias("k"),
                F.sum("w").alias("ww"),
                F.sum(F.col("n") * F.col("b2")).alias("bb"))
    ch = (F.col("bb") / (F.col("k") - 1)) \
        / (F.col("ww") / (F.col("nn") - F.col("k")))
    # DB: centroid pair distances from the tiny per-label frame
    cents = per.select("lb", "i", "c", "n")
    x, y = cents.alias("x"), cents.alias("y")
    pair_d = (x.join(y, (F.col("x.i") == F.col("y.i"))
                     & (F.col("x.lb") != F.col("y.lb")))
              .groupBy(F.col("x.lb").alias("la"),
                       F.col("y.lb").alias("lc"))
              .agg(F.sqrt(F.sum((F.col("x.c") - F.col("y.c")) ** 2))
                   .alias("d")))
    s_l = per_l.select("lb", F.sqrt(F.col("w") / F.col("n"))
                       .alias("s"))
    ratios = (pair_d
              .join(s_l.select(F.col("lb").alias("la"),
                               F.col("s").alias("sa")), "la")
              .join(s_l.select(F.col("lb").alias("lc"),
                               F.col("s").alias("sc")), "lc")
              .select("la", ((F.col("sa") + F.col("sc"))
                             / F.col("d")).alias("ratio")))
    db = ratios.groupBy("la").agg(F.max("ratio").alias("r")) \
               .agg(F.avg("r").alias("db"))
    out = a.crossJoin(F.broadcast(db))
    return out.select(
        F.col("nn").cast("long").alias("n"),
        F.col("k").cast("long").alias("k_labels"),
        F.round(ch, round_to).alias("ch_index"),
        F.round("db", round_to).alias("db_index"))


def label_confusability(df: DataFrame, *,
                        vec_col: str = "embedding",
                        label_col: str = "label",
                        round_to: int = 6) -> DataFrame:
    """Label-pair confusability matrix: the cosine between label
    CENTROIDS for every unordered pair - which classes the
    embedding space cannot tell apart (centroid cosine near 1),
    i.e. where a nearest-centroid router or a dedup-by-label
    assumption will bleed. Per-label centroids from one explode
    aggregation; the pair matrix is k x k tiny. Returns per-pair
    rows ``(label_a, label_b, n_a, n_b, centroid_cosine)``.
    """
    per = (df.where(F.col(vec_col).isNotNull()
                    & F.col(label_col).isNotNull())
           .select(F.col(label_col).alias("lb"),
                   F.posexplode(F.col(vec_col)).alias("i", "x"))
           .groupBy("lb", "i")
           .agg(F.avg(F.col("x").cast("double")).alias("c"),
                F.count(F.lit(1)).alias("n")))
    a, b = per.alias("a"), per.alias("b")
    pairs = (a.join(b, (F.col("a.i") == F.col("b.i"))
                    & (F.col("a.lb") < F.col("b.lb")))
             .groupBy(F.col("a.lb").alias("label_a"),
                      F.col("b.lb").alias("label_b"))
             .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("dot"),
                  F.sqrt(F.sum(F.col("a.c") ** 2)).alias("na"),
                  F.sqrt(F.sum(F.col("b.c") ** 2)).alias("nb"),
                  F.first("a.n").alias("n_a"),
                  F.first("b.n").alias("n_b")))
    return pairs.select(
        "label_a", "label_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.try_divide(F.col("dot"),
                             F.col("na") * F.col("nb")), round_to)
         .alias("centroid_cosine"))


def _euclid(a: Column, b: Column) -> Column:
    """Euclidean distance between two double arrays — a sequential
    zip_with/aggregate fold, the same IEEE op order as DuckDB's
    list_distance, so both engines produce bit-identical doubles."""
    sq = F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                     F.lit(0.0), lambda acc, v: acc + v)
    return F.sqrt(sq)


def hopkins_statistic(df: DataFrame, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", m: int = 48,
                      round_to: int = 6) -> DataFrame:
    """Hopkins clusterability statistic (Hopkins & Skellam 1954,
    distance-sum variant): m synthetic points uniform in the
    per-dimension bounding box vs m real probe points; with
    u = Σ min-dist(synthetic → data) and w = Σ min-dist(probe →
    data∖{probe}),  H = u / (u + w).  H ≈ 0.5 reads "as clusterable
    as noise", H → 1 "strongly clustered" — the run-BEFORE-k-means
    gate that cluster_validity's CH/DB indices (which presume you
    already clustered) cannot provide.

    Determinism: probes are the m smallest md5(id) (the IVF-seed
    rank trick); synthetic coordinates are md5(i:j)-fraction uniforms
    scaled into the bbox — no RNG at execution time, both engines
    regenerate identical points. Distances are sequential folds
    (same IEEE order as list_distance).

    Plan at scale: the bbox is one aggregation (collected: 2·dim
    scalars); probes + synthetics are ≤ 2m rows BROADCAST against the
    corpus — one pass, min per probe, no shuffle of the data side.
    ``m`` stays fixed as the corpus grows (statistic converges in m,
    not n).
    """
    data = (df.where(F.col(vec_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    F.col(vec_col).cast("array<double>").alias("__v")))
    dim_rows = (data.select(F.posexplode("__v").alias("j", "x"))
                .groupBy("j").agg(F.min("x").alias("mn"),
                                  F.max("x").alias("mx"))
                .orderBy("j").collect())
    mn = [r["mn"] for r in dim_rows]
    span = [r["mx"] - r["mn"] for r in dim_rows]
    spark = df.sparkSession
    frac = lambda i, j: (F.conv(F.substring(
        F.md5(F.concat_ws(":", i.cast("string"), F.lit(str(j)))),
        1, 8), 16, 10).cast("double") / F.lit(4294967296.0))
    synth = spark.range(int(m)).select(
        F.col("id").alias("__q"),
        F.array(*[(F.lit(mn[j]) + frac(F.col("id"), j)
                   * F.lit(span[j]))
                  for j in range(len(mn))]).alias("__v"))
    probes = (data.orderBy(F.md5(F.col("__id").cast("string")))
              .limit(int(m))
              .select(F.col("__id").alias("__q"),
                      F.col("__v").alias("__pv")))
    u = (F.broadcast(synth).alias("s")
         .crossJoin(data.alias("d"))
         .select("s.__q", _euclid(F.col("s.__v"), F.col("d.__v"))
                 .alias("__d"))
         .groupBy("__q").agg(F.min("__d").alias("__u"))
         .agg(F.sum("__u").alias("sum_u"),
              F.count(F.lit(1)).alias("__m")))
    w = (F.broadcast(probes).alias("p")
         .join(data.alias("d"), F.col("p.__q") != F.col("d.__id"))
         .select("p.__q", _euclid(F.col("p.__pv"), F.col("d.__v"))
                 .alias("__d"))
         .groupBy("__q").agg(F.min("__d").alias("__w"))
         .agg(F.sum("__w").alias("sum_w")))
    n = data.count()
    return (u.crossJoin(w)
            .select(F.lit(n).cast("long").alias("n"),
                    F.col("__m").cast("long").alias("m"),
                    F.round("sum_u", round_to).alias("sum_u"),
                    F.round("sum_w", round_to).alias("sum_w"),
                    F.round(F.col("sum_u")
                            / (F.col("sum_u") + F.col("sum_w")),
                            round_to).alias("hopkins")))


def twonn_intrinsic_dim(df: DataFrame, *, vec_col: str = "embedding",
                        id_col: str = "vec_id", m: int = 64,
                        round_to: int = 6) -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017): for m
    probe points, μ = r₂/r₁ (first/second neighbor distances), and
    the MLE  d̂ = k / Σ ln μ.  A 64-dim embedding cloud that lives on
    a d̂ ≈ 9 manifold tells you how hard ANN recall will be and how
    much PCA/PQ compression is safe — the geometry diagnostic behind
    effective_dim_emb's covariance-spectrum view (TwoNN is local and
    nonlinear, the participation ratio global and linear).

    r₂ is min{d : d > r₁} in BOTH engines (strict — duplicate-point
    probes with r₁ = 0 or no strictly-larger distance are dropped and
    counted in ``n_dropped``). Probes are the m smallest md5(id).
    Plan: probes broadcast against the corpus, one pass for r₁, a
    self-join of the tiny per-probe table for r₂ — the data side is
    scanned twice, shuffled never; ``m`` is fixed as n grows.
    """
    data = (df.where(F.col(vec_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("__id"),
                    F.col(vec_col).cast("array<double>").alias("__v")))
    probes = (data.orderBy(F.md5(F.col("__id").cast("string")))
              .limit(int(m))
              .select(F.col("__id").alias("__q"),
                      F.col("__v").alias("__pv")))
    n_probes_sel = probes.count()
    dists = (F.broadcast(probes).alias("p")
             .join(data.alias("d"), F.col("p.__q") != F.col("d.__id"))
             .select("p.__q", _euclid(F.col("p.__pv"), F.col("d.__v"))
                     .alias("__d"))
             .persist())
    r1 = dists.groupBy("__q").agg(F.min("__d").alias("r1"))
    r2 = (dists.join(F.broadcast(r1), "__q")
          .where(F.col("__d") > F.col("r1"))
          .groupBy("__q").agg(F.any_value("r1").alias("r1"),
                              F.min("__d").alias("r2")))
    used = r2.where(F.col("r1") > 0)
    out = used.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.round(F.count(F.lit(1))
                / F.sum(F.log(F.col("r2") / F.col("r1"))),
                round_to).alias("intrinsic_dim"),
        F.round(F.avg(F.col("r2") / F.col("r1")), round_to)
         .alias("mean_mu"))
    out = out.select(
        "n_probes",
        (F.lit(int(n_probes_sel)) - F.col("n_probes")).cast("long")
        .alias("n_dropped"),
        "intrinsic_dim", "mean_mu")
    out._zoi_persisted = [dists]
    return out


def kcenter_prototypes(df: DataFrame, *, vec_col: str = "embedding",
                       id_col: str = "vec_id", k: int = 8,
                       sample_m: int = 256,
                       round_to: int = 6) -> DataFrame:
    """Greedy k-center prototype selection (Gonzalez 1985,
    2-approximation) on an md5-ranked sample: start from the
    md5-first point, then repeatedly add the point FARTHEST from
    the chosen set (ties → smallest id). The classic coreset /
    prototype builder for training-data diversity — unlike k-means
    centroids these are REAL documents, and the selection radius
    sequence is the coverage guarantee (every sample point is
    within ``radius`` of a prototype).

    k−1 tiny Spark rounds over the persisted sample (the chosen
    point — one row — is collected each round and inlined as a
    literal; the min-distance column folds with ``least``).
    ``sample_m`` is fixed as the corpus grows. Returns ``(step,
    id, radius)`` — radius is the max-min distance at selection
    time (NULL for step 0), non-increasing.
    """
    data = (df.where(F.col(vec_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
            .orderBy(F.md5(F.col("id").cast("string")))
            .limit(int(sample_m))
            .persist())
    first = data.orderBy(F.md5(F.col("id").cast("string"))) \
                .limit(1).collect()[0]
    chosen = [(0, first["id"], None)]
    lit_vec = lambda vals: F.array(*[F.lit(float(x)) for x in vals])
    cur = data.select(
        "id", "v", _euclid(F.col("v"), lit_vec(first["v"]))
        .alias("mind"))
    for step in range(1, int(k)):
        far = (cur.orderBy(F.col("mind").desc(), F.col("id"))
               .limit(1).collect()[0])
        chosen.append((step, far["id"],
                       round(float(far["mind"]), round_to)))
        cur = cur.select(
            "id", "v",
            F.least(F.col("mind"),
                    _euclid(F.col("v"), lit_vec(far["v"])))
            .alias("mind"))
    data.unpersist()
    spark = df.sparkSession
    out = spark.createDataFrame(
        chosen, "step int, id long, radius double")
    return out.select(F.col("step").cast("long").alias("step"),
                      F.col("id").alias("id"),
                      F.col("radius")).orderBy("step")


def dunn_index(df: DataFrame, *, vec_col: str = "embedding",
               id_col: str = "vec_id", label_col: str = "label",
               sample_m: int = 200,
               round_to: int = 6) -> DataFrame:
    """Dunn index (1974) of a labeled embedding cloud, exact on an
    md5-ranked sample: min inter-cluster pair distance over max
    intra-cluster diameter — the worst-case separation/compactness
    ratio that the AVERAGE-based CH/DB indices
    (cluster_validity_emb) smooth away: one pair of touching
    clusters tanks Dunn while barely moving CH. Higher is better;
    > 1 means every cluster gap exceeds every cluster diameter.

    The O(m²) pair table is the fixed-size sample squared (the
    index converges in m; the corpus never pairs with itself), one
    broadcast self-join. Returns ``(m, n_labels, min_inter,
    max_intra, dunn)``.
    """
    s = (df.where(F.col(vec_col).isNotNull()
                  & F.col(id_col).isNotNull()
                  & F.col(label_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(sample_m))
         .select(F.col(id_col).alias("i"),
                 F.col(label_col).alias("l"),
                 F.col(vec_col).cast("array<double>").alias("v")))
    a, b = s.alias("a"), s.alias("b")
    pairs = (F.broadcast(a).crossJoin(F.broadcast(b))
             .where(F.col("a.i") < F.col("b.i"))
             .select((F.col("a.l") == F.col("b.l")).alias("same"),
                     _euclid(F.col("a.v"), F.col("b.v"))
                     .alias("d")))
    agg = pairs.agg(
        F.min(F.when(~F.col("same"), F.col("d")))
        .alias("min_inter"),
        F.max(F.when(F.col("same"), F.col("d")))
        .alias("max_intra"))
    counts = s.agg(F.count(F.lit(1)).cast("long").alias("m"),
                   F.count_distinct("l").cast("long")
                   .alias("n_labels"))
    t = counts.crossJoin(F.broadcast(agg))
    dunn = F.when(F.col("max_intra") > 0,
                  F.col("min_inter") / F.col("max_intra"))
    return t.select(
        "m", "n_labels",
        F.round("min_inter", round_to).alias("min_inter"),
        F.round("max_intra", round_to).alias("max_intra"),
        F.round(dunn, round_to).alias("dunn"))


def triplet_accuracy(df: DataFrame, *, vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     label_col: str = "label", m: int = 96,
                     round_to: int = 6) -> DataFrame:
    """Triplet accuracy of a labeled embedding space on m md5-ranked
    anchors: for each anchor, is the nearest SAME-label point closer
    than the nearest OTHER-label point? The ranking-free version of
    the retrieval eval (label_retrieval_eval's P@k needs a k; this
    asks the minimal metric-learning question directly), plus the
    mean margin (d_diff − d_same) that says HOW separable. Anchors
    with no same-label peer are dropped.

    Anchors broadcast against the corpus — one pass, two
    conditional mins per anchor; m fixed as the corpus grows.
    Returns ``(n_anchors, accuracy, mean_margin)``.
    """
    data = (df.where(F.col(vec_col).isNotNull()
                     & F.col(id_col).isNotNull()
                     & F.col(label_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.col(label_col).alias("l"),
                    F.col(vec_col).cast("array<double>").alias("v")))
    anchors = (data.orderBy(F.md5(F.col("id").cast("string")))
               .limit(int(m))
               .select(F.col("id").alias("aid"),
                       F.col("l").alias("al"),
                       F.col("v").alias("av")))
    pairs = (F.broadcast(anchors).alias("a")
             .join(data.alias("d"),
                   F.col("a.aid") != F.col("d.id"))
             .select("a.aid",
                     (F.col("a.al") == F.col("d.l")).alias("same"),
                     _euclid(F.col("a.av"), F.col("d.v"))
                     .alias("dist")))
    per = pairs.groupBy("aid").agg(
        F.min(F.when(F.col("same"), F.col("dist")))
        .alias("d_same"),
        F.min(F.when(~F.col("same"), F.col("dist")))
        .alias("d_diff"))
    used = per.where(F.col("d_same").isNotNull()
                     & F.col("d_diff").isNotNull())
    return used.agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.round(F.avg((F.col("d_same") < F.col("d_diff"))
                      .cast("double")), round_to).alias("accuracy"),
        F.round(F.avg(F.col("d_diff") - F.col("d_same")), round_to)
         .alias("mean_margin"))


def cka_dim_halves(df: DataFrame, *, vec_col: str = "embedding",
                   id_col: str = "vec_id", m: int = 128,
                   round_to: int = 6) -> DataFrame:
    """Linear CKA (Kornblith 2019) between the FIRST and SECOND
    halves of the embedding dimensions, on an md5-ranked sample:
    centered Gram matrices K (first half) and L (second half),
    CKA = ΣK_c∘L_c / √(ΣK_c² · ΣL_c²) ∈ [0,1]. High CKA says the
    two dim-halves encode the SAME geometry — the representation is
    redundant and PQ/PCA compression (what twonn/effective_dim
    size) is nearly free; low CKA says the halves carry different
    information and truncation is lossy.

    Same fixed-sample O(m²) pair shape as distance_correlation,
    with dot products instead of distances. Returns ``(m, cka)``.
    """
    s = (df.where(F.col(vec_col).isNotNull()
                  & F.col(id_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(m))
         .select(F.col(id_col).alias("i"),
                 F.col(vec_col).cast("array<double>").alias("v")))
    half = F.size("v") / 2
    s = s.select(
        "i",
        F.slice("v", 1, half.cast("int")).alias("x"),
        F.expr("slice(v, int(size(v)/2) + 1, "
               "size(v) - int(size(v)/2))").alias("y"))
    dot = lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda p, q: p * q), F.lit(0.0),
        lambda acc, z: acc + z)
    a, b = s.alias("a"), s.alias("b")
    pairs = (F.broadcast(a).crossJoin(F.broadcast(b))
             .select(F.col("a.i").alias("i"), F.col("b.i").alias("j"),
                     dot(F.col("a.x"), F.col("b.x")).alias("k"),
                     dot(F.col("a.y"), F.col("b.y")).alias("l")))
    wi = Window.partitionBy("i")
    wj = Window.partitionBy("j")
    wall = Window.partitionBy()
    cen = pairs.select(
        (F.col("k") - F.avg("k").over(wi) - F.avg("k").over(wj)
         + F.avg("k").over(wall)).alias("kc"),
        (F.col("l") - F.avg("l").over(wi) - F.avg("l").over(wj)
         + F.avg("l").over(wall)).alias("lc"))
    agg = cen.agg(F.count(F.lit(1)).alias("m2"),
                  F.sum(F.col("kc") * F.col("lc")).alias("hsic"),
                  F.sum(F.col("kc") * F.col("kc")).alias("kk"),
                  F.sum(F.col("lc") * F.col("lc")).alias("ll"))
    cka = F.when((F.col("kk") > 0) & (F.col("ll") > 0),
                 F.col("hsic")
                 / F.sqrt(F.col("kk") * F.col("ll")))
    return agg.select(
        F.sqrt(F.col("m2").cast("double")).cast("long").alias("m"),
        F.round(cka, round_to).alias("cka"))


def c2st_1nn(df: DataFrame, *, vec_col: str = "embedding",
             id_col: str = "vec_id", split=None, m: int = 128,
             round_to: int = 6) -> DataFrame:
    """Classifier two-sample test via leave-one-out 1-NN (the
    train-free C2ST of Lopez-Paz & Oquab 2017, Friedman 2004): label
    each sampled vector by *split* (default: even/odd id), predict
    each point's label from its nearest OTHER sample point, and
    compare accuracy to the 50% a single distribution would give:

        z = (acc − ½) / √(¼/m)

    — the two-sample drift test for EMBEDDINGS, where the scalar
    drift family (KS/AD/W1/…) has no natural multivariate form: did
    this week's encoder output drift from last week's? Ties break to
    the smaller id, deterministically.

    The O(m²) pair table is the fixed sample squared; one broadcast
    self-join. Returns ``(m, accuracy, z)``.
    """
    sp = split if split is not None \
        else F.pmod(F.col(id_col), F.lit(2)) == 0
    s = (df.where(F.col(vec_col).isNotNull()
                  & F.col(id_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(m))
         .select(F.col(id_col).alias("i"),
                 F.when(sp, 0).otherwise(1).alias("c"),
                 F.col(vec_col).cast("array<double>").alias("v")))
    a, b = s.alias("a"), s.alias("b")
    pairs = (F.broadcast(a).crossJoin(F.broadcast(b))
             .where(F.col("a.i") != F.col("b.i"))
             .select(F.col("a.i").alias("i"),
                     F.col("a.c").alias("c"),
                     F.col("b.i").alias("j"),
                     F.col("b.c").alias("cj"),
                     _euclid(F.col("a.v"), F.col("b.v"))
                     .alias("d")))
    rn = F.row_number().over(
        Window.partitionBy("i").orderBy("d", "j"))
    nn = pairs.withColumn("__rn", rn).where(F.col("__rn") == 1)
    agg = nn.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.avg((F.col("c") == F.col("cj")).cast("double"))
        .alias("acc"))
    z = ((F.col("acc") - 0.5)
         / F.sqrt(0.25 / F.col("m").cast("double")))
    return agg.select(
        "m", F.round("acc", round_to).alias("accuracy"),
        F.round(z, round_to).alias("z"))


def bayes_error_bound(df: DataFrame, *, vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      label_col: str = "label", m: int = 200,
                      round_to: int = 6) -> DataFrame:
    """Cover–Hart Bayes-error bracket from leave-one-out 1-NN on an
    md5-ranked sample: with 1-NN error ε over k classes, the
    irreducible Bayes risk R* satisfies (asymptotically)

        ε/2  ≤  R*  ≤  ε

    — the label-noise / class-overlap floor: if ε says 30%, NO
    model can beat ~15-30% error on these labels, so a classifier
    stuck at 25% is near the ceiling, not underfit. The
    quality-of-the-LABELS diagnostic beside triplet_accuracy's
    quality-of-the-SPACE one. NN ties break to the smaller id.

    Fixed-sample O(m²) pair table, one broadcast self-join.
    Returns ``(m, n_classes, nn_error, bayes_lo, bayes_hi)``.
    """
    s = (df.where(F.col(vec_col).isNotNull()
                  & F.col(id_col).isNotNull()
                  & F.col(label_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(m))
         .select(F.col(id_col).alias("i"),
                 F.col(label_col).alias("l"),
                 F.col(vec_col).cast("array<double>").alias("v")))
    a, b = s.alias("a"), s.alias("b")
    pairs = (F.broadcast(a).crossJoin(F.broadcast(b))
             .where(F.col("a.i") != F.col("b.i"))
             .select(F.col("a.i").alias("i"),
                     F.col("a.l").alias("l"),
                     F.col("b.i").alias("j"),
                     F.col("b.l").alias("lj"),
                     _euclid(F.col("a.v"), F.col("b.v"))
                     .alias("d")))
    rn = F.row_number().over(
        Window.partitionBy("i").orderBy("d", "j"))
    nn = pairs.withColumn("__rn", rn).where(F.col("__rn") == 1)
    classes = s.agg(F.count_distinct("l").alias("k"))
    agg = nn.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.avg((F.col("l") != F.col("lj")).cast("double"))
        .alias("err"))
    t = agg.crossJoin(F.broadcast(classes))
    return t.select(
        "m", F.col("k").cast("long").alias("n_classes"),
        F.round("err", round_to).alias("nn_error"),
        F.round(F.col("err") / 2.0, round_to).alias("bayes_lo"),
        F.round("err", round_to).alias("bayes_hi"))


def canopy_blocks(df: DataFrame, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", t2: float = 1.3,
                  max_centers: int = 6,
                  round_to: int = 6) -> DataFrame:
    """Canopy clustering (McCallum–Nigam–Ungar 2000) as a blocking
    pre-pass: repeatedly take the md5-first still-UNASSIGNED point
    as a canopy center and assign every unassigned point within the
    cheap-metric radius *t2* to it — the classic
    create-overlapping-ish-blocks-cheaply step upstream of an
    expensive pairwise match, the distance-threshold sibling of the
    hash-bucket LSH blocks. Bounded at *max_centers* rounds (the
    remainder is reported as the final unassigned count), which is
    also what lets the DuckDB twin unroll.

    Each round: one broadcast of the center against the unassigned
    frame. Returns ``(step, center_id, n_assigned)`` rows plus a
    terminal ``(step = max, center_id = NULL, n_assigned =
    n_unassigned)`` remainder row.
    """
    data = (df.where(F.col(vec_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"),
                    F.md5(F.col(id_col).cast("string"))
                    .alias("rk"))
            .persist())
    un = data
    out = []
    step = 0
    for step in range(int(max_centers)):
        head = un.orderBy("rk").limit(1).collect()
        if not head:
            break
        c = head[0]
        lit_vec = F.array(*[F.lit(float(x)) for x in c["v"]])
        dcol = _euclid(F.col("v"), lit_vec)
        n_assigned = un.where(dcol <= float(t2)).count()
        out.append((step, int(c["id"]), n_assigned))
        un = un.where(dcol > float(t2)).localCheckpoint(eager=True)
    rest = un.count()
    out.append((len(out), None, rest))
    data.unpersist()
    spark = df.sparkSession
    return (spark.createDataFrame(
        out, "step int, center_id long, n_assigned long")
        .select(F.col("step").cast("long").alias("step"),
                "center_id", "n_assigned").orderBy("step"))


def lof_outliers(df: DataFrame, *, vec_col: str = "embedding",
                 id_col: str = "vec_id", k: int = 5,
                 sample_m: int = 128, top: int = 5,
                 round_to: int = 6) -> DataFrame:
    """Local Outlier Factor (Breunig 2000) on an md5-ranked sample:
    per point, k-distance, reachability-smoothed local density
    lrd = 1/avg(max(kdist(B), d(A,B)) over the k neighbors), and
    LOF = avg neighbor-lrd / own-lrd — DENSITY-relative outliers: a
    point at the edge of a sparse cluster scores ~1 while the same
    distance from a dense cluster screams. The embedding-space
    outlier detector beside the scalar z-score/MAD/Hampel/ECOD kit
    (and the outlier complement to c2st's drift and LOF cousin
    ECOD's marginal view). Neighbor ties break by id.

    Fixed-sample O(m²) pair table + rank windows. Returns the
    ``top`` rows by LOF desc ``(id, kdist, lrd, lof)``.
    """
    s = (df.where(F.col(vec_col).isNotNull()
                  & F.col(id_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(sample_m))
         .select(F.col(id_col).alias("i"),
                 F.col(vec_col).cast("array<double>").alias("v")))
    a, b = s.alias("a"), s.alias("b")
    pairs = (F.broadcast(a).crossJoin(F.broadcast(b))
             .where(F.col("a.i") != F.col("b.i"))
             .select(F.col("a.i").alias("i"),
                     F.col("b.i").alias("j"),
                     _euclid(F.col("a.v"), F.col("b.v"))
                     .alias("d")))
    rn = F.row_number().over(
        Window.partitionBy("i").orderBy("d", "j"))
    nb = pairs.withColumn("__rn", rn) \
              .where(F.col("__rn") <= int(k)).persist()
    kd = nb.groupBy("i").agg(F.max("d").alias("kdist"))
    reach = (nb.join(kd.select(F.col("i").alias("j"),
                               F.col("kdist").alias("kd_j")), "j")
             .select("i", "j",
                     F.greatest(F.col("d"), F.col("kd_j"))
                     .alias("r")))
    lrd = reach.groupBy("i").agg(
        (1.0 / F.avg("r")).alias("lrd"))
    lof = (nb.select("i", "j")
           .join(lrd.select(F.col("i").alias("j"),
                            F.col("lrd").alias("lrd_j")), "j")
           .groupBy("i").agg(F.avg("lrd_j").alias("alrd")))
    out = (lrd.join(lof, "i").join(kd, "i")
           .select("i", "kdist", "lrd",
                   (F.col("alrd") / F.col("lrd")).alias("lof")))
    res = (out.orderBy(F.col("lof").desc(), "i").limit(int(top))
           .select(F.col("i").alias("id"),
                   F.round("kdist", round_to).alias("kdist"),
                   F.round("lrd", round_to).alias("lrd"),
                   F.round("lof", round_to).alias("lof"))
           .orderBy(F.col("lof").desc(), "id"))
    # release via dedup.unpersist_candidates after materialization
    res._zoi_persisted = [nb]
    return res


def dbscan_labels(df: DataFrame, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", eps: float = 1.2,
                  min_pts: int = 5, sample_m: int = 200,
                  round_to: int = 6) -> DataFrame:
    """DBSCAN point-role classification on an md5-ranked sample:
    CORE (≥ min_pts neighbors within eps, self included), BORDER
    (non-core within eps of a core), NOISE (the rest) — the
    parameter diagnostic run BEFORE committing to a density
    clustering: all-noise says eps is too tight, all-core says it's
    vacuous, and the noise share at the chosen (eps, min_pts) IS
    the outlier rate a DBSCAN run would discard. Role counts are
    closed-form from the pair table — no connectivity iteration
    (cluster extraction is lpa_communities' job).

    Fixed-sample O(m²) pair table. Returns one row ``(m, n_core,
    n_border, n_noise, core_share, noise_share)``.
    """
    s = (df.where(F.col(vec_col).isNotNull()
                  & F.col(id_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(sample_m))
         .select(F.col(id_col).alias("i"),
                 F.col(vec_col).cast("array<double>").alias("v")))
    a, b = s.alias("a"), s.alias("b")
    pairs = (F.broadcast(a).crossJoin(F.broadcast(b))
             .select(F.col("a.i").alias("i"),
                     F.col("b.i").alias("j"),
                     _euclid(F.col("a.v"), F.col("b.v"))
                     .alias("d"))
             .where(F.col("d") <= float(eps)))   # includes self d=0
    deg = pairs.groupBy("i").agg(F.count(F.lit(1)).alias("deg"))
    core = deg.where(F.col("deg") >= int(min_pts)) \
              .select(F.col("i").alias("c")).persist()
    near_core = (pairs.join(core, pairs["j"] == core["c"])
                 .select("i").distinct())
    roles = (deg.join(core.select(F.col("c").alias("i"))
                      .withColumn("__is_core", F.lit(1)),
                      "i", "left")
             .join(near_core.withColumn("__near", F.lit(1)),
                   "i", "left"))
    t = roles.select(
        F.when(F.col("__is_core") == 1, "core")
        .when(F.col("__near") == 1, "border")
        .otherwise("noise").alias("role"))
    agg = t.groupBy().pivot("role", ["core", "border", "noise"]) \
           .count()
    m_n = s.count()
    out = agg.select(
        F.lit(m_n).cast("long").alias("m"),
        F.coalesce("core", F.lit(0)).cast("long").alias("n_core"),
        F.coalesce("border", F.lit(0)).cast("long")
        .alias("n_border"),
        F.coalesce("noise", F.lit(0)).cast("long")
        .alias("n_noise"))
    out = out.select(
        "m", "n_core", "n_border", "n_noise",
        F.round(F.col("n_core") / F.col("m").cast("double"),
                round_to).alias("core_share"),
        F.round(F.col("n_noise") / F.col("m").cast("double"),
                round_to).alias("noise_share"))
    out._zoi_persisted = [core]
    return out


def hubness(df: DataFrame, *, vec_col: str = "embedding",
            id_col: str = "vec_id", k: int = 5,
            sample_m: int = 200,
            round_to: int = 6) -> DataFrame:
    """Hubness audit (Radovanović 2010) on an md5-ranked sample:
    N_k(x) = how often x appears in OTHER points' k-NN lists; its
    skewness is THE high-dimensionality pathology number — hubs
    (N_k ≫ k) dominate every neighbor list and poison k-NN dedup
    and retrieval, anti-hubs (N_k = 0) are unreachable. Rising
    N_k-skew is the early warning that the kNN-based operators
    (semantic dedup, triplet eval, LOF) are degrading.

    From the same fixed-sample pair table as the other kNN audits;
    the N_k census is one aggregation over the neighbor lists.
    Returns ``(m, k, max_nk, skew_nk, share_hubs, share_antihubs)``
    — hubs: N_k ≥ 2k; anti-hubs: N_k = 0.
    """
    s = (df.where(F.col(vec_col).isNotNull()
                  & F.col(id_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(sample_m))
         .select(F.col(id_col).alias("i"),
                 F.col(vec_col).cast("array<double>").alias("v")))
    a, b = s.alias("a"), s.alias("b")
    pairs = (F.broadcast(a).crossJoin(F.broadcast(b))
             .where(F.col("a.i") != F.col("b.i"))
             .select(F.col("a.i").alias("i"),
                     F.col("b.i").alias("j"),
                     _euclid(F.col("a.v"), F.col("b.v"))
                     .alias("d")))
    rn = F.row_number().over(
        Window.partitionBy("i").orderBy("d", "j"))
    nb = pairs.withColumn("__rn", rn).where(F.col("__rn") <= int(k))
    nk = (s.select(F.col("i").alias("j"))
          .join(nb.groupBy("j").agg(F.count(F.lit(1)).alias("nk")),
                "j", "left")
          .select(F.coalesce("nk", F.lit(0)).alias("nk")))
    mstats = nk.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.max("nk").cast("long").alias("max_nk"),
        F.avg(F.col("nk").cast("double")).alias("mu"),
        F.stddev_pop(F.col("nk").cast("double")).alias("sd"),
        (F.sum(F.pow(F.col("nk").cast("double"), 3))
         / F.count(F.lit(1))).alias("m3r"),
        F.avg((F.col("nk") >= 2 * int(k)).cast("double"))
        .alias("hub_share"),
        F.avg((F.col("nk") == 0).cast("double"))
        .alias("anti_share"))
    # population skew from raw moments: (E[x^3] - 3 mu s^2 - mu^3)/s^3
    skew = ((F.col("m3r") - 3 * F.col("mu") * F.col("sd")
             * F.col("sd") - F.col("mu") ** 3)
            / (F.col("sd") ** 3))
    return mstats.select(
        "m", F.lit(int(k)).cast("long").alias("k"), "max_nk",
        F.round(F.when(F.col("sd") > 0, skew).otherwise(0.0),
                round_to).alias("skew_nk"),
        F.round("hub_share", round_to).alias("share_hubs"),
        F.round("anti_share", round_to).alias("share_antihubs"))


def metricity_audit(df: DataFrame, *, vec_col: str = "embedding",
                    id_col: str = "vec_id", sample_m: int = 40,
                    round_to: int = 6) -> DataFrame:
    """Triangle-inequality audit of TWO similarity-derived
    distances on all sampled triples: euclidean (a true metric —
    violations must be 0, the harness sanity check) and cosine
    DISTANCE 1−cos (famously NOT a metric): the violation share
    says how badly — which prices how much trust canopy radii,
    k-center coverage guarantees and LOF reachability deserve when
    run on cosine instead of L2. Violation: d(a,c) > d(a,b) +
    d(b,c) + 1e-12 (float guard).

    The triple table is the m-sample's ordered 3-subsets (~m³/6
    rows — m stays small); distances come from one m² pair table
    joined three ways. Returns ``(m, n_triples, eucl_violations,
    cos_violation_share)``.
    """
    s = (df.where(F.col(vec_col).isNotNull()
                  & F.col(id_col).isNotNull())
         .orderBy(F.md5(F.col(id_col).cast("string")))
         .limit(int(sample_m))
         .select(F.col(id_col).alias("i"),
                 F.col(vec_col).cast("array<double>").alias("v")))
    a, b = s.alias("a"), s.alias("b")
    dot = lambda x, y: F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0),
        lambda acc, z: acc + z)
    nrm = lambda x: F.sqrt(dot(x, x))
    pairs = (F.broadcast(a).crossJoin(F.broadcast(b))
             .where(F.col("a.i") < F.col("b.i"))
             .select(F.col("a.i").alias("x"),
                     F.col("b.i").alias("y"),
                     _euclid(F.col("a.v"), F.col("b.v"))
                     .alias("de"),
                     (1.0 - dot(F.col("a.v"), F.col("b.v"))
                      / (nrm(F.col("a.v")) * nrm(F.col("b.v"))))
                     .alias("dc"))
             .persist())
    ids = s.select("i")
    tri = (ids.alias("p").crossJoin(ids.alias("q"))
           .crossJoin(ids.alias("r"))
           .where((F.col("p.i") < F.col("q.i"))
                  & (F.col("q.i") < F.col("r.i")))
           .select(F.col("p.i").alias("ia"),
                   F.col("q.i").alias("ib"),
                   F.col("r.i").alias("ic")))
    def leg(x, y, de, dc):
        return pairs.select(F.col("x").alias(x),
                            F.col("y").alias(y),
                            F.col("de").alias(de),
                            F.col("dc").alias(dc))
    t = (tri.join(leg("ia", "ib", "e_ab", "c_ab"), ["ia", "ib"])
         .join(leg("ib", "ic", "e_bc", "c_bc"), ["ib", "ic"])
         .join(leg("ia", "ic", "e_ac", "c_ac"), ["ia", "ic"]))
    eps = 1e-12
    # each unordered triple yields three triangle inequalities;
    # check all three per distance
    def viol(d1, d2, d3):
        return ((F.col(d3) > F.col(d1) + F.col(d2) + eps)
                | (F.col(d1) > F.col(d2) + F.col(d3) + eps)
                | (F.col(d2) > F.col(d1) + F.col(d3) + eps)) \
            .cast("long")
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.sum(viol("e_ab", "e_bc", "e_ac"))
        .alias("eucl_violations"),
        F.avg(viol("c_ab", "c_bc", "c_ac").cast("double"))
        .alias("cos_share"))
    m_n = s.count()
    out = agg.select(
        F.lit(m_n).cast("long").alias("m"), "n_triples",
        "eucl_violations",
        F.round("cos_share", round_to)
        .alias("cos_violation_share"))
    out._zoi_persisted = [pairs]
    return out
