"""The decode job: encoded blocks + manifest -> reconstructed DataFrame.

Reads the manifest first (tiny) to learn the output schema, then groups
block rows by (part_id, block_id) and pivots the per-column payloads back
into rows with an Arrow-vectorized grouped map.  The shuffle this implies
moves *compressed* bytes only — the cheapest possible width for a
columnar->row pivot.  Requesting a column subset prunes both the parquet
scan (predicate on `column` pushes down) and the decode work.

The per-block `value_count` assertion is the reference's EOR row-count
checksum (/root/reference/src/flatfile.rs:475-488) applied per block.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from nem_mms_spark import framing
from nem_mms_spark import manifest as M
from nem_mms_spark.codecs import decode_block


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, M.MANIFEST_DIR))


def decode_blocks(
    spark: SparkSession,
    out_dir: str,
    columns: list[str] | None = None,
    parts: list[int] | None = None,
) -> DataFrame:
    man = read_manifest(spark, out_dir)
    col_rows = (
        man.select("col_idx", "column", "logical_type").distinct().collect()
    )
    if columns is not None:
        keep = set(columns)
        col_rows = [r for r in col_rows if r["column"] in keep]
        missing = keep - {r["column"] for r in col_rows}
        if missing:
            raise ValueError(f"columns not in manifest: {sorted(missing)}")
    out_schema = M.decode_schema_of(col_rows)
    ordered = [
        r["column"] for r in sorted(col_rows, key=lambda r: r["col_idx"])
    ]
    types = {r["column"]: r["logical_type"] for r in col_rows}

    bdf = spark.read.parquet(os.path.join(out_dir, M.BLOCKS_DIR))
    if parts is not None:
        bdf = bdf.filter(F.col("part_id").isin(parts))
    if columns is not None:
        bdf = bdf.filter(F.col("column").isin(list(columns)))

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        n = int(pdf["value_count"].iloc[0])
        if not (pdf["value_count"] == n).all():
            raise ValueError(
                "corrupt block group: value_count mismatch across columns "
                f"(part={pdf['part_id'].iloc[0]} block={pdf['block_id'].iloc[0]})"
            )
        out = {}
        for row in pdf.itertuples(index=False):
            values = decode_block(
                bytes(row.payload),
                json.loads(row.params),
                n - int(row.null_count),
                _kernel_dtype_of(types[row.column]),
                row.codec,
            )
            arr = framing.from_kernel(
                values, types[row.column], bytes(row.validity), n,
                int(row.null_count),
            )
            if len(arr) != n:
                raise ValueError(
                    f"decode count mismatch on {row.column}: {len(arr)} != {n}"
                )
            out[row.column] = arr.to_pandas()
        if set(out) != set(ordered):
            raise ValueError(
                f"block group missing columns: {sorted(set(ordered) - set(out))}"
            )
        return pd.DataFrame({c: out[c] for c in ordered})

    return bdf.groupBy("part_id", "block_id").applyInPandas(
        decode_group, schema=out_schema
    )


def _kernel_dtype_of(logical_type: str) -> str:
    import pyarrow as pa  # local import: executors only need it lazily

    from nem_mms_spark.framing import _parse_type, kernel_dtype

    return kernel_dtype(_parse_type(logical_type))
