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


def banded_candidate_pairs(
    embeddings: DataFrame,
    n_bands: int = 8,
    band_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """LSH-banded candidate pairs for embedding near-dup (the MinHash-LSH
    band trick applied to sign-LSH): ``n_bands`` independent signatures of
    ``band_bits`` hyperplane sign bits each; two vectors are candidates if
    they collide in ANY band.  One explode + one equi-join — pair work is
    O(sum of bucket^2 per band), never the all-pairs O(n^2) (the scale
    path the round-3 verdict asked to wire in, replacing the
    BroadcastNestedLoopJoin).

    At 10^12-doc scale: band signatures are cheap narrow ints computed in
    one scan; the self-join shuffles on (band, sig) so each bucket joins
    co-located, and a bucket-size cap (mirror of dedup.py's mega-bucket
    cap) would bound a degenerate bucket — the synthetic embeddings are
    near-uniform so buckets stay ~n/2^band_bits.

    Returns distinct (vec_a, vec_b) with vec_a < vec_b.
    """
    planes = hyperplanes(
        _dim_of(embeddings, vec_col), n_bands * band_bits, seed
    )
    tagged = _band_sigs(
        embeddings, planes, n_bands, band_bits, id_col, vec_col
    )
    a = tagged.alias("a")
    b = tagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .distinct()
    )


def _band_sigs(
    embeddings: DataFrame,
    planes: np.ndarray,
    n_bands: int,
    band_bits: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, band, sig) band signatures, WHOLE-STAGE-CODEGEN fast.

    A literal fold expression per plane (F.aggregate over zip_with) is
    interpreted by Catalyst — ~1 ms per 64-dim fold, and the per-row
    rebuild of 48 literal plane arrays dwarfs the arithmetic.  Instead:
    posexplode the vector, broadcast-join a (plane, dim, w) weights
    table, and hash-aggregate sum(x*w) — every operator codegens.

    Bit-exactness contract with the SQL oracle's list_dot_product fold:
    the explode emits dims in ascending order, the broadcast hash join
    preserves stream order, and each vector's rows live in ONE task, so
    the partial sum for (id, plane) accumulates x0*w0, x1*w1, ... from
    0.0 in dimension order — the identical float64 addition sequence as
    the left fold.  (The final agg then merges exactly one partial.)"""
    spark = embeddings.sparkSession
    n_planes, dim = planes.shape
    dims = spark.createDataFrame(
        [
            (p, d, float(planes[p, d]))
            for p in range(n_planes)
            for d in range(dim)
        ],
        schema="plane int, dim int, w double",
    )
    par = spark.sparkContext.defaultParallelism
    ex = embeddings.repartition(par).select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    )
    dots = (
        ex.join(F.broadcast(dims), "dim")
        .groupBy(id_col, "plane")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    return (
        dots.withColumn("band", (F.col("plane") / band_bits).cast("int"))
        .withColumn(
            "bit",
            F.expr(
                f"CASE WHEN dot > 0 THEN shiftleft(CAST(1 AS BIGINT), "
                f"CAST(plane % {band_bits} AS INT)) "
                "ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .groupBy(id_col, "band")
        .agg(F.sum("bit").alias("sig"))
    )


def _dim_of(embeddings: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from one row (metadata-scale collect)."""
    row = embeddings.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    return int(row[0]["d"]) if row else 0


def cosine_pairs_topk(
    embeddings: DataFrame,
    pairs: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact fold-cosine on a (vec_a, vec_b) candidate set -> top-k.
    The fold expression matches DuckDB's list_dot_product bit-exactly, so
    the oracle can replicate ordering and rounding.

    Plan shape: norms are computed once per VECTOR (not per pair — saves
    two folds per candidate), the vector table is broadcast to both join
    sides, and the candidate set keeps an explicit partition count (AQE
    would coalesce the byte-tiny pair list onto one core and serialize
    the interpreted dot-product folds)."""
    e = embeddings.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("_n", l2_norm(F.col("v")))
    a = e.alias("ea")
    b = e.alias("eb")
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    joined = (
        pairs.repartition(par)
        .join(F.broadcast(a), pairs["vec_a"] == F.col(f"ea.{id_col}"))
        .join(F.broadcast(b), pairs["vec_b"] == F.col(f"eb.{id_col}"))
    )
    cos = _dot(F.col("ea.v"), F.col("eb.v")) / (
        F.col("ea._n") * F.col("eb._n")
    )
    return (
        joined.select("vec_a", "vec_b", cos.alias("_cos"))
        .orderBy(F.desc("_cos"), "vec_a", "vec_b")
        .limit(k)
        .select("vec_a", "vec_b", F.round("_cos", 4).alias("cosine"))
    )


def exact_pairs_topk(
    embeddings: DataFrame,
    k: int = 20,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all-pairs cosine top-k via blocked Gram matrices — the
    distributed brute-force baseline the LSH recall contract compares
    against.  The table is split into ``n_blocks`` row blocks; every
    block PAIR (n_blocks^2/2 tasks) computes its Gram submatrix in one
    numpy matmul and emits only its local top-k, so the quadratic
    compute is vectorized (BLAS, not an interpreted per-pair fold) and
    fully distributed; the driver-side final top-k sees only
    n_blocks^2/2 * k rows.  O(n^2) WORK is inherent to an exact
    baseline — the scale answer is the banded LSH path; this exists to
    measure that path's recall."""
    import pandas as pd

    packed = embeddings.groupBy(
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("blk")
    ).agg(
        F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))).alias("rows")
    )
    bp = (
        packed.alias("x")
        .join(packed.alias("y"), F.col("x.blk") <= F.col("y.blk"))
        .select(
            F.col("x.blk").alias("blk_a"),
            F.col("x.rows").alias("rows_a"),
            F.col("y.blk").alias("blk_b"),
            F.col("y.rows").alias("rows_b"),
        )
        .repartition(n_blocks * (n_blocks + 1) // 2)
    )

    def gram_topk(batches):
        for pdf in batches:
            outs = []
            for _, row in pdf.iterrows():
                ia = np.array([r["i"] for r in row["rows_a"]], dtype=np.int64)
                ib = np.array([r["i"] for r in row["rows_b"]], dtype=np.int64)
                ma = np.array([r["v"] for r in row["rows_a"]], dtype=np.float64)
                mb = np.array([r["v"] for r in row["rows_b"]], dtype=np.float64)
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                g = ma @ mb.T
                mask = ia[:, None] < ib[None, :]
                flat = np.flatnonzero(mask)
                if len(flat) == 0:
                    continue
                kk = min(k, len(flat))
                top = flat[np.argpartition(-g.ravel()[flat], kk - 1)[:kk]]
                ra, rb = np.unravel_index(top, g.shape)
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_a": ia[ra],
                            "vec_b": ib[rb],
                            "_cos": g[ra, rb],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    local = bp.mapInPandas(
        gram_topk, schema="vec_a long, vec_b long, _cos double"
    )
    return (
        local.orderBy(F.desc("_cos"), "vec_a", "vec_b")
        .limit(k)
        .select("vec_a", "vec_b", F.round("_cos", 4).alias("cosine"))
    )


def avg_norm_by_label(embeddings: DataFrame) -> DataFrame:
    return (
        embeddings.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(l2_norm(F.col("embedding"))), 4).alias("avg_norm"),
        )
        .select("label", "n", "avg_norm")
    )
