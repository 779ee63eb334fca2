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


def multiprobe_buckets(
    spark, query: list[float], planes: np.ndarray, n_probes: int
) -> list[int]:
    """Probe sequence: the query's exact bucket plus single-bit flips of
    the ``n_probes`` planes with the smallest |margin| (the planes the
    query sits closest to — where a true neighbor most likely landed on
    the other side).  The margins are evaluated with the SAME Catalyst
    fold expressions as the data-side bucket signs, so an independent SQL
    replication (left-fold dot products) derives the identical probe set.
    """
    qcol = F.array(*[F.lit(float(x)) for x in query])
    exprs = [lsh_bucket_col(qcol, planes).alias("sig")] + [
        F.abs(_dot(qcol, F.array(*[F.lit(float(x)) for x in p]))).alias(f"m{i}")
        for i, p in enumerate(planes)
    ]
    row = spark.range(1).select(*exprs).collect()[0]
    sig = int(row["sig"])
    order = sorted(range(len(planes)), key=lambda i: (row[f"m{i}"], i))
    return [sig] + [sig ^ (1 << i) for i in order[:n_probes]]


def lsh_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    n_probes: int = 4,
) -> DataFrame:
    """ANN: restrict the exact scan to the query's LSH bucket plus the
    ``n_probes`` nearest sign-flip buckets (multi-probe: an empty or
    sparse exact bucket no longer silently shrinks the result — the
    single-probe recall hole from round 2).

    At scale the bucket column is precomputed and the table is
    partitioned/bucketed by it, turning top-k into an (n_probes+1)-bucket
    scan.  Recall vs the exact scan is contract-checked by the
    ``ann_lsh_recall`` query.
    """
    planes = hyperplanes(len(query), n_planes, seed)
    probes = multiprobe_buckets(
        embeddings.sparkSession, query, planes, n_probes
    )
    bucketed = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("bucket").isin(probes))
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
