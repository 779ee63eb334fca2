#!/usr/bin/env python
"""Phase-level timing of the aligned encode at local[8] vs local[32].

Separates the scalable kernel work (mapInArrow blocks write) from the
fixed-cost tail (manifest aggregation job, checkpoint commit, hot
detection) to locate the non-scaling constant in the encode wall.

Usage: python tools/profile_encode.py [rows] [levels-csv]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 31))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 31))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
LEVELS = (
    tuple(int(x) for x in sys.argv[2].split(","))
    if len(sys.argv) > 2
    else (32, 8, 32, 8)
)
SHM = "/dev/shm/nem_mms_bench"

_PHASES = {}


def _phase(name: str):
    import contextlib

    @contextlib.contextmanager
    def cm():
        t0 = time.monotonic()
        yield
        _PHASES.setdefault(name, []).append(time.monotonic() - t0)

    return cm()


def patched_encode(spark, df, out_dir, **kw):
    """encode_dataframe with phase timers spliced around its stages."""
    import nem_mms_spark.jobs.encode as E

    orig_write = E.DataFrame.write  # noqa: F841  (marker only)
    t_all0 = time.monotonic()
    # monkeypatch: time the blocks write vs everything after it
    import nem_mms_spark.manifest as M
    from nem_mms_spark import checkpoint as ckpt
    from pyspark.sql import functions as F

    num_parts = kw.get("num_parts", 64)
    work = df.withColumn("part_id", F.spark_partition_id())
    sort_cols = [c for c in ("warc_ts", "ts") if c in df.columns]
    with _phase("meta_guard"):
        ckpt.clear_checkpoint(out_dir)
        ckpt.check_partitioning_meta(
            out_dir,
            {"partitioning": "aligned", "num_parts": num_parts,
             "key_col": "url", "salt_buckets": 8},
            resume=False,
        )
    if sort_cols:
        work = work.sortWithinPartitions(*sort_cols)
    encode_fn = E._make_encoder(df.columns, 65536, 16 << 20, "url")
    blocks_dir = os.path.join(out_dir, M.BLOCKS_DIR)
    with _phase("blocks_write"):
        (
            work.mapInArrow(encode_fn, M.BLOCK_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("part_id")
            .option("compression", "none")
            .option("partitionOverwriteMode", "static")
            .parquet(blocks_dir)
        )
    with _phase("bmeta_manifest"):
        bmeta = spark.read.parquet(blocks_dir).select(
            "part_id", "block_id", "col_idx", "column", "logical_type",
            "codec", "value_count", "null_count", "raw_bytes",
            "encoded_bytes", "encode_ns", "fingerprint",
        )
        per_codec = bmeta.groupBy(
            "part_id", "col_idx", "column", "logical_type", "codec"
        ).agg(
            F.count("*").alias("cnt"),
            F.sum("value_count").alias("n_values"),
            F.sum("null_count").alias("null_count"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
            F.max("fingerprint").alias("fingerprint"),
            F.max("encode_ns").alias("encode_ns"),
        )
        man = (
            per_codec.groupBy("part_id", "col_idx", "column", "logical_type")
            .agg(
                F.sum("cnt").alias("n_blocks"),
                F.sum("n_values").alias("n_values"),
                F.sum("null_count").alias("null_count"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum("encoded_bytes").alias("encoded_bytes"),
                F.to_json(
                    F.map_from_entries(
                        F.array_sort(F.collect_list(F.struct("codec", "cnt")))
                    )
                ).alias("codecs"),
                F.max("fingerprint").alias("fingerprint"),
                F.max("encode_ns").alias("encode_ns"),
            )
        )
        (
            man.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("part_id")
            .parquet(os.path.join(out_dir, M.MANIFEST_DIR))
        )
    with _phase("checkpoint_commit"):
        man_rows = E._read_manifest_rows(os.path.join(out_dir, M.MANIFEST_DIR))
        ckpt.commit_checkpoint_rows(
            ckpt.checkpoint_rows_from_manifest(man_rows), out_dir
        )
        totals = ckpt.checkpoint_totals(out_dir)
    _PHASES.setdefault("total", []).append(time.monotonic() - t_all0)
    return totals


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    os.makedirs(SHM, exist_ok=True)
    src = os.path.join(SHM, "prof_src")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        from nem_mms_spark.datagen import web_pages_df

        spark = bench._new_spark(32)
        web_pages_df(spark, ROWS, num_partitions=64).write.mode(
            "overwrite"
        ).parquet(src)
        spark.stop()

    for cores in LEVELS:
        _PHASES.clear()
        spark = bench._new_spark(cores)
        bench._warm_up(spark, src)
        df = spark.read.parquet(src).cache()
        df.count()
        out = os.path.join(SHM, f"prof_enc_{cores}")
        for rep in range(3):  # rep 0 = warm
            shutil.rmtree(out, ignore_errors=True)
            patched_encode(spark, df, out, num_parts=64)
            if rep == 0:
                _PHASES.clear()
        spark.stop()
        print(f"--- local[{cores}] (min of 2 timed reps, s) ---")
        for name, vals in _PHASES.items():
            print(f"  {name:<20} {min(vals):8.3f}   reps={['%.2f' % v for v in vals]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
