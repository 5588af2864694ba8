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
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
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
