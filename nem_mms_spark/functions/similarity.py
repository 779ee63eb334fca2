"""Similarity search over an embedding column (array<float>).

  brute-force cosine top-k  — zip_with/aggregate dot product, JVM-side;
                              exact baseline, O(n) per query
  LSH-bucketed ANN          — random-hyperplane signs -> bucket key;
                              candidates = same-bucket rows (scale path:
                              the full scan becomes a bucket-pruned scan)

The hyperplanes are derived deterministically from a seed (splitmix-style
per-dimension hash) so signatures are reproducible across engines/runs.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(col) -> "F.Column":
    return F.sqrt(
        F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_to_query(col, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.sum(np.asarray(query, dtype=np.float64) ** 2)))
    return _dot(col, q) / (l2_norm(col) * F.lit(qn))


def brute_force_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (deterministic ties via id)."""
    sim = cosine_to_query(F.col(vec_col), query)
    return (
        embeddings.select(id_col, sim.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("cosine", 4).alias("cosine"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Sign-bit bucket id from random hyperplanes (JVM-side dot products)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(
            _dot(vec_col, arr) > 0, F.lit(1 << i)
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """ANN: restrict the exact scan to the query's LSH bucket (falls back
    to nothing if the bucket is empty — callers widen planes/seeds).

    At scale the bucket column is precomputed and the table is
    partitioned/bucketed by it, turning top-k into a single-bucket scan.
    """
    planes = hyperplanes(len(query), n_planes, seed)
    qsig = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(p, query)) > 0))
    bucketed = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("bucket") == qsig)
    return brute_force_topk(cand, query, k, id_col, vec_col)


def avg_norm_by_label(embeddings: DataFrame) -> DataFrame:
    return (
        embeddings.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(l2_norm(F.col("embedding"))), 4).alias("avg_norm"),
        )
        .select("label", "n", "avg_norm")
    )
