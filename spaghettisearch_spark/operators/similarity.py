"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane / SRP) variant as the scale path. Planes are derived
from the portable 60-bit hash so bucketing is deterministic across runs
and engines (no RNG state shipped to executors).

Scale: brute force is a single narrow scan + TakeOrderedAndProject —
embarrassingly parallel, no shuffle; right answer for one-off queries.
For repeated queries, ``srp_buckets`` pre-buckets vectors by sign
pattern; a probe only scans its own bucket (and optionally Hamming-1
neighbors), trading recall for a ~2^n_planes scan reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import term_hash60_py


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector. All JVM-side
    higher-order array functions — no Python crossing."""
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    v = F.col(vec_col).cast("array<double>")
    scored = embeddings.select(
        F.col(id_col),
        (_dot(v, q) / (_norm(v) * _norm(q))).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def srp_plane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    portable (same formula in Python/Spark/SQL via term_hash60)."""
    return [
        (term_hash60_py(f"plane:{plane}:dim:{d}") % 2_000_001) / 1_000_000.0 - 1.0
        for d in range(dim)
    ]


def srp_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket int) — signed-random-projection bucket: bit i = sign of
    dot(vec, plane_i)."""
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.lit(srp_plane(dim, p)).cast("array<double>")
        bucket = bucket + F.when(_dot(v, plane) >= 0, F.lit(1 << p)).otherwise(0)
    return embeddings.select(F.col(id_col), bucket.cast("int").alias("bucket"))


def ann_topk_bucketed(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: scan only the query's SRP bucket.
    Recall < 1 by construction; the exact path is cosine_topk."""
    import numpy as np

    qb = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for p in range(n_planes):
        if float(qv @ np.asarray(srp_plane(dim, p))) >= 0:
            qb |= 1 << p
    buckets = srp_buckets(embeddings, dim, n_planes, id_col, vec_col)
    cand = embeddings.join(
        buckets.filter(F.col("bucket") == qb).select(id_col), id_col
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
