"""Headline queries over the driver-provided testdata tables, each paired
with an ANSI-SQL oracle (DuckDB) in ORACLE_SQL.  Contract: identical column
names, types and (order-insensitive) values between the Spark DataFrame and
the oracle result — floats are rounded at the query boundary, timestamps
are rendered as strings, and every LIMIT has a deterministic tie-break.

Queries marked rows-only (in ROWS_ONLY_QUERIES) have no SQL-expressible
oracle (engine pipeline runs, LSH bucketing, multimodal stubs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from nem_mms_spark.functions import dedup, similarity, text as T


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------------ relational suite


def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-06-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-06-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_nation_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def topk_events_per_type(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "event_type", "event_id", F.round("value", 4).alias("value"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def events_hourly_rollup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def user_sessions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.lag(
        F.unix_micros(F.col("ts").cast("timestamp"))
    ).over(w)
    new_s = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_s", new_s)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("new_s").alias("n_sessions"),
        )
    )


def orders_priority_matrix(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_o"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_p"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


# --------------------------------------------- codec-analytics suite
# (the SQL-visible shadows of the encode engine's per-column statistics)


def lang_dict_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def lang_rle_runs(spark, sf_dir):
    """Run-length structure of `lang` in doc_id order — the RLE codec's
    cost-model statistic as a query."""
    d = _t(spark, sf_dir, "documents")
    w = W.orderBy("doc_id")
    is_start = F.when(
        F.lag("lang").over(w).isNull() | (F.lag("lang").over(w) != F.col("lang")), 1
    ).otherwise(0)
    return (
        d.select("doc_id", "lang")
        .withColumn("run_start", is_start)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("run_start").alias("n_runs"),
        )
    )


def events_ts_delta_stats(spark, sf_dir):
    """Delta distribution of the timestamp column in event_id order — the
    DELTA+FOR+bitpack codec's width estimator as a query."""
    ev = _t(spark, sf_dir, "events")
    w = W.orderBy("event_id")
    delta = F.unix_micros(F.col("ts").cast("timestamp")) - F.lag(
        F.unix_micros(F.col("ts").cast("timestamp"))
    ).over(w)
    return (
        ev.select(delta.alias("delta_us"))
        .filter(F.col("delta_us").isNotNull())
        .agg(
            F.count("*").alias("n_deltas"),
            F.min("delta_us").alias("min_delta_us"),
            F.max("delta_us").alias("max_delta_us"),
            F.round(F.avg("delta_us"), 4).alias("avg_delta_us"),
        )
    )


def for_bitwidth_by_type(spark, sf_dir):
    """Frame-of-reference bit width per group (user_id column)."""
    ev = _t(spark, sf_dir, "events")
    rng = F.max("user_id") - F.min("user_id")
    return ev.groupBy("event_type").agg(
        F.min("user_id").alias("for_ref"),
        F.max("user_id").alias("max_id"),
        F.when(rng > 0, F.floor(F.log2(rng) + 1)).otherwise(F.lit(0))
        .cast("long")
        .alias("bit_width"),
    )


def block_framing_stats(spark, sf_dir):
    """Row-aligned 256-row block framing over documents (P6 analogue)."""
    d = _t(spark, sf_dir, "documents")
    w = W.orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("block_id", F.floor((F.col("rn") - 1) / 256))
        .groupBy("block_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ------------------------------------------------- training-data suite


def dedup_exact_stats(spark, sf_dir):
    return dedup.exact_dedup_stats(_t(spark, sf_dir, "documents"))


def jaccard_pairs_small(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.jaccard_pairs(d, k=1, threshold=0.5)


def doc_fingerprints(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint(F.col("text")).alias("md5"))


def text_quality(spark, sf_dir):
    return T.text_quality_df(_t(spark, sf_dir, "documents"))


def token_counts_by_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).alias("n_tokens"),
        F.sum(T.bpe_ish_token_count(F.col("text"))).alias("n_bpe_tokens"),
    )


def lang_id_accuracy(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pred = T.lang_id(F.col("text"))
    return (
        d.withColumn("pred", pred)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("pred") == F.col("lang"), 1).otherwise(0)).alias(
                "n_match"
            ),
        )
    )


def ann_topk_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.brute_force_topk(emb, list(q), k=10).select("vec_id")


def embedding_norms_by_label(spark, sf_dir):
    return similarity.avg_norm_by_label(_t(spark, sf_dir, "embeddings"))


# ------------------------------------------ rows-only (no SQL oracle)


def minhash_lsh_candidates(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return dedup.lsh_candidate_pairs(d, n_perm=16, bands=4, k=1)


def simhash_fingerprints(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return dedup.simhash_df(d)


def ann_lsh_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return similarity.lsh_topk(emb, list(q), k=10, n_planes=6)


def multimodal_image_meta(spark, sf_dir):
    """Fake-image decode plumbing: derive deterministic image blobs from
    documents, run the Arrow-batched metadata extractor."""
    from nem_mms_spark.functions import multimodal as MM
    import pandas as pd

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)

    def attach(batches):
        for pdf in batches:
            pdf = pdf[["doc_id", "n_chars"]].copy()
            pdf["image"] = [
                MM.make_fake_image(8 + int(c) % 16, 8, 3, seed=int(i))
                for i, c in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            yield pdf[["doc_id", "image"]]

    imgs = d.mapInPandas(attach, schema="doc_id long, image binary")
    return MM.decode_image_meta(imgs)


def encode_roundtrip_metrics(spark, sf_dir):
    """Full engine run on the documents table: encode -> manifest stats.
    Not SQL-expressible (the engine itself); rows-only check."""
    import tempfile

    from nem_mms_spark.jobs.encode import encode_dataframe
    from nem_mms_spark.jobs.decode import read_manifest

    d = _t(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="nem_mms_enc_")
    encode_dataframe(spark, d, out, key_col="doc_id", num_parts=4, resume=False)
    man = read_manifest(spark, out)
    return man.groupBy("column").agg(
        F.sum("n_values").alias("n_values"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("encoded_bytes").alias("encoded_bytes"),
    )


# ------------------------------------------------------------- registry

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_nation_revenue": q5_nation_revenue,
    "topk_events_per_type": topk_events_per_type,
    "events_hourly_rollup": events_hourly_rollup,
    "user_sessions": user_sessions,
    "orders_priority_matrix": orders_priority_matrix,
    "lang_dict_stats": lang_dict_stats,
    "lang_rle_runs": lang_rle_runs,
    "events_ts_delta_stats": events_ts_delta_stats,
    "for_bitwidth_by_type": for_bitwidth_by_type,
    "block_framing_stats": block_framing_stats,
    "dedup_exact_stats": dedup_exact_stats,
    "jaccard_pairs_small": jaccard_pairs_small,
    "doc_fingerprints": doc_fingerprints,
    "text_quality": text_quality,
    "token_counts_by_source": token_counts_by_source,
    "lang_id_accuracy": lang_id_accuracy,
    "ann_topk_cosine": ann_topk_cosine,
    "embedding_norms_by_label": embedding_norms_by_label,
    "minhash_lsh_candidates": minhash_lsh_candidates,
    "simhash_fingerprints": simhash_fingerprints,
    "ann_lsh_topk": ann_lsh_topk,
    "multimodal_image_meta": multimodal_image_meta,
    "encode_roundtrip_metrics": encode_roundtrip_metrics,
}

ORACLE_SQL = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-06-01 00:00:00'
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_nation_revenue": """
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "topk_events_per_type": """
        SELECT event_type, event_id, round(value, 4) AS value, rn
        FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rn
            FROM events
        )
        WHERE rn <= 3
    """,
    "events_hourly_rollup": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "user_sessions": """
        SELECT user_id, count(*) AS n_events, CAST(sum(new_s) AS BIGINT) AS n_sessions
        FROM (
            SELECT user_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800000000 OR
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                   THEN 1 ELSE 0 END AS new_s
            FROM events
        ) GROUP BY user_id
    """,
    "orders_priority_matrix": """
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders GROUP BY o_orderpriority
    """,
    "lang_dict_stats": """
        SELECT lang, count(*) AS n_docs,
               count(DISTINCT source) AS n_sources,
               round(avg(n_chars), 4) AS avg_chars,
               min(n_chars) AS min_chars, max(n_chars) AS max_chars
        FROM documents GROUP BY lang
    """,
    "lang_rle_runs": """
        SELECT lang, count(*) AS n_docs, CAST(sum(run_start) AS BIGINT) AS n_runs
        FROM (
            SELECT lang,
                   CASE WHEN lag(lang) OVER (ORDER BY doc_id) IS DISTINCT FROM lang
                   THEN 1 ELSE 0 END AS run_start
            FROM documents
        ) GROUP BY lang
    """,
    "events_ts_delta_stats": """
        SELECT count(*) AS n_deltas, min(delta_us) AS min_delta_us,
               max(delta_us) AS max_delta_us,
               round(avg(delta_us), 4) AS avg_delta_us
        FROM (
            SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (ORDER BY event_id)
                   AS delta_us
            FROM events
        ) WHERE delta_us IS NOT NULL
    """,
    "for_bitwidth_by_type": """
        SELECT event_type, min(user_id) AS for_ref, max(user_id) AS max_id,
               CAST(CASE WHEN max(user_id) - min(user_id) > 0
                    THEN floor(log2(max(user_id) - min(user_id)) + 1)
                    ELSE 0 END AS BIGINT) AS bit_width
        FROM events GROUP BY event_type
    """,
    "block_framing_stats": """
        SELECT block_id, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM (
            SELECT doc_id, n_chars,
                   CAST(floor((row_number() OVER (ORDER BY doc_id) - 1) / 256)
                        AS BIGINT) AS block_id
            FROM documents
        ) GROUP BY block_id
    """,
    "dedup_exact_stats": """
        SELECT lang, count(*) AS n_docs,
               count(DISTINCT md5(text)) AS n_distinct,
               count(*) - count(DISTINCT md5(text)) AS dup_docs
        FROM documents GROUP BY lang
    """,
    "jaccard_pairs_small": """
        WITH sh AS (
            SELECT DISTINCT doc_id,
                   unnest(string_split(lower(text), ' ')) AS shingle
            FROM documents WHERE doc_id < 200
        ),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, n_common,
               round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4)
                   AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    """,
    "doc_fingerprints": "SELECT doc_id, md5(text) AS md5 FROM documents",
    "text_quality": """
        SELECT doc_id,
               CAST(n_tokens AS INTEGER) AS n_tokens,
               round(char_total / greatest(n_tokens, 1), 4) AS avg_token_len,
               round(n_stop / greatest(n_tokens, 1), 4) AS stopword_ratio,
               round((CASE WHEN n_tokens BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.3 END
                    + CASE WHEN char_total / greatest(n_tokens, 1) BETWEEN 3 AND 12
                           THEN 1.0 ELSE 0.5 END
                    + CASE WHEN punct / greatest(length(text), 1) < 0.2
                           THEN 1.0 ELSE 0.4 END) / 3.0, 4) AS quality
        FROM (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_tokens,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                        t -> t IN ('the','a','an','and','or','of','to','in','is','it')))
                        AS DOUBLE) AS n_stop,
                   CAST(length(replace(text, ' ', '')) AS DOUBLE) AS char_total,
                   CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                        AS DOUBLE) AS punct
            FROM documents
        )
    """,
    "token_counts_by_source": """
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS n_bpe_tokens
        FROM documents GROUP BY source
    """,
    "lang_id_accuracy": """
        SELECT lang, count(*) AS n_docs,
               CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_match
        FROM (
            SELECT lang,
                   CASE
                     WHEN h_es > greatest(h_en, h_de, h_fr, 0) THEN 'es'
                     WHEN h_fr > greatest(h_en, h_de, 0) THEN 'fr'
                     WHEN h_de > greatest(h_en, 0) THEN 'de'
                     WHEN h_en > 0 THEN 'en'
                     ELSE 'und'
                   END AS pred
            FROM (
                SELECT lang,
                   len(list_filter(string_split(lower(text), ' '),
                       t -> t IN ('the','and','of'))) AS h_en,
                   len(list_filter(string_split(lower(text), ' '),
                       t -> t IN ('der','die','und'))) AS h_de,
                   len(list_filter(string_split(lower(text), ' '),
                       t -> t IN ('le','la','et'))) AS h_fr,
                   len(list_filter(string_split(lower(text), ' '),
                       t -> t IN ('el','los','que'))) AS h_es
                FROM documents
            )
        ) GROUP BY lang
    """,
    "ann_topk_cosine": """
        WITH q AS (
            SELECT generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS qv
            FROM embeddings WHERE vec_id = 0
        ),
        e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS ev
            FROM embeddings
        )
        SELECT vec_id
        FROM e JOIN q USING (i)
        GROUP BY vec_id
        ORDER BY sum(ev * qv) / (sqrt(sum(ev * ev)) * sqrt(sum(qv * qv))) DESC,
                 vec_id
        LIMIT 10
    """,
    "embedding_norms_by_label": """
        SELECT label, count(*) AS n, round(avg(norm), 4) AS avg_norm
        FROM (
            SELECT label, sqrt(sum_sq) AS norm
            FROM (
                SELECT label, vec_id,
                       sum(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)) AS sum_sq
                FROM (SELECT label, vec_id, unnest(embedding) AS e FROM embeddings)
                GROUP BY label, vec_id
            )
        ) GROUP BY label
    """,
}

ROWS_ONLY_QUERIES = sorted(set(QUERIES) - set(ORACLE_SQL))
