"""Similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline (fully Catalyst-native:
``zip_with`` + ``aggregate`` fold, no UDF); random-hyperplane LSH bucketing
is the scale path — at 10^12 vectors the query joins only its own bucket
ring instead of scanning everything.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_lit_array(vec: list[float]):
    return F.array(*[F.lit(float(x)) for x in vec])


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    Plan shape: one projection computing the score (whole-stage codegen)
    followed by ``TakeOrderedAndProject`` — Spark's distributed top-k, no
    global sort materialization. Tie-break on id for a deterministic set.
    """
    q = _as_lit_array(query_vec)
    emb = F.col(vec_col).cast("array<double>")
    score = F.round(_dot(emb, q) / (_norm(emb) * _norm(q)), 6)
    return (
        embeddings.select(F.col(id_col), score.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    num_planes: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SRP) LSH: sign pattern of ``num_planes`` fixed
    seeded hyperplanes → integer bucket. Deterministic given the seed.
    Adds a ``bucket`` column; equal buckets = candidate neighbors."""
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
    emb = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        bit = F.when(_dot(emb, _as_lit_array(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + (bit.cast("long") * F.lit(1 << i))
    return embeddings.withColumn("bucket", bucket)


def ann_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict the exact scorer to the query's SRP
    bucket (and therefore a ~2^-num_planes fraction of the corpus).

    Recall/latency is tuned by ``num_planes``; candidates within the bucket
    are scored exactly, so results are a subset of the brute-force ranking.
    """
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]
    qbucket = 0
    for i, p in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, p)) >= 0:
            qbucket |= 1 << i
    bucketed = hyperplane_lsh_buckets(
        embeddings, num_planes=num_planes, dim=dim, seed=seed, id_col=id_col, vec_col=vec_col
    )
    return cosine_topk(
        bucketed.filter(F.col("bucket") == qbucket).drop("bucket"),
        query_vec,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
    )
