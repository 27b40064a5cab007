"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — pure built-ins (zip_with/aggregate dot
product, window top-k), correct at any scale but O(Q×N).
Scale path: LSH-bucketed search — random signed projections assign each
vector a bucket signature; queries probe only their own bucket (plus
multi-probe neighbors), turning O(Q×N) into O(Q×bucket). Projections are
seeded and computed by a JVM-side expression (no Python in the scoring
path; the projection constants are literals folded into the plan).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F


def _norm(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank). Deterministic
    tiebreak (cosine DESC, vec_id ASC)."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = q.crossJoin(c).withColumn(
        "cosine", _dot("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def random_projections(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def _bucket_col(vec_col, planes: np.ndarray):
    """Signed-projection bucket id as a JVM expression: for each plane,
    bit = (Σ v[i]*p[i]) > 0; bucket = Σ bit<<j. Plane constants are column
    literals — Catalyst folds them; no Python at execution."""
    bits = []
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        bits.append(F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine, but only within the query's bucket.
    Recall < 1 by construction; n_planes tunes bucket granularity."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    planes = random_projections(dim, n_planes, seed)
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
        _bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
        _bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    scored = q.join(c, "bucket").withColumn(
        "cosine", _dot("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
