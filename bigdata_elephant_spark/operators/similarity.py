"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: one scan, the dot
  product and norms computed with higher-order array functions
  (``zip_with`` + ``aggregate``, JVM-side, left-fold order — which
  keeps results bit-identical across engines), then
  ``TakeOrderedAndProject``. O(n·d) per query; the correct baseline
  and the verifier for approximate variants.
- :func:`lsh_bucket_assignments` / :func:`cosine_topk_lsh` — the
  scale path: random-hyperplane LSH. Each vector gets a small integer
  bucket from the sign pattern of dot products with fixed
  pseudo-random hyperplanes (derived from seeded PRNG driver-side, so
  any engine can replay them). A query probes only its own bucket —
  at 100 TB with the table *partitioned by bucket*, that is partition
  pruning: only 1/2^planes of the data is scanned. Recall is tunable
  by multi-probing neighboring buckets.

All floats are cast to double before any arithmetic (float32 ->
float64 is exact) so cross-engine comparison is deterministic.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity with deterministic fold order."""
    return _dot(a, b) / (F.sqrt(_norm2(a)) * F.sqrt(_norm2(b)))


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of ``query_vec_id`` by cosine.

    The single query row is broadcast (a 1-row cross join); Spark
    plans the sort+limit as TakeOrderedAndProject — per-partition
    heaps, no global sort shuffle.
    """
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec")
    )
    return (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(
                cosine_expr(F.col(vec_col), F.col("_qvec")), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes (reproducible in any engine)."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id of ``vec`` against ``planes``."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bucket = bucket + F.when(
            _dot(vec, plane) > 0, F.lit(2**j)
        ).otherwise(F.lit(0))
    return bucket.cast("long")


def lsh_bucket_assignments(
    embeddings: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, bucket)`` assignment — the write-side of the index."""
    return embeddings.select(
        id_col, bucket_expr(F.col(vec_col), planes).alias("bucket")
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec_id: int,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: brute force *within the query's LSH bucket*.

    Deterministic (bucket assignment and scoring replay identically
    in the oracle), so approximate != unverifiable: the oracle
    recomputes the same bucketed search.
    """
    with_bucket = embeddings.select(
        id_col,
        vec_col,
        bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    q = with_bucket.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec"), F.col("bucket").alias("_qbucket")
    )
    return (
        with_bucket.crossJoin(F.broadcast(q))
        .filter(
            (F.col("bucket") == F.col("_qbucket"))
            & (F.col(id_col) != query_vec_id)
        )
        .select(
            id_col,
            F.round(
                cosine_expr(F.col(vec_col), F.col("_qvec")), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
