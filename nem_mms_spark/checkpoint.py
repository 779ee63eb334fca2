"""Checkpoint / lineage table: idempotent resume for the encode job.

Semantics (generalizing the reference's crude `create_new(true)` skip of
already-downloaded files, /root/reference/src/packages/fetch.rs:264-282, and
its filename-encoded state, /root/reference/src/manage/state.rs:46-102):

  * a partition is DONE iff its checkpoint row exists with status='done';
  * the encode job starts with a LEFT ANTI join of source partitions
    against done rows (broadcast — the checkpoint table is tiny relative
    to data: one row per partition);
  * blocks/manifest/checkpoint are written partition-dir-scoped with
    dynamic partition overwrite, so a re-run of a partition that crashed
    mid-write replaces its half-written output instead of duplicating it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from nem_mms_spark import manifest as M


def checkpoint_path(out_dir: str) -> str:
    return os.path.join(out_dir, M.CHECKPOINT_DIR)


def read_checkpoint(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = checkpoint_path(out_dir)
    # fast-path existence check avoids a noisy AnalysisException stack
    # trace on first run (local/posix paths; object stores hit the except)
    if "://" not in path and not os.path.isdir(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def done_parts(spark: SparkSession, out_dir: str) -> DataFrame | None:
    ckpt = read_checkpoint(spark, out_dir)
    if ckpt is None:
        return None
    return ckpt.filter(F.col("status") == "done").select("part_id")


def filter_pending(df: DataFrame, done: DataFrame | None) -> DataFrame:
    """Anti-join source rows against completed partitions (resume)."""
    if done is None:
        return df
    return df.join(F.broadcast(done), "part_id", "left_anti")


def write_checkpoint_rows(rows: DataFrame, out_dir: str) -> None:
    (
        rows.repartition(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_id")
        .parquet(checkpoint_path(out_dir))
    )
