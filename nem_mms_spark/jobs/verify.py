"""Round-trip verification: decode everything and compare bit-identical
against the source — the engine-wide correctness gate (BASELINE.json
input_hint: "byte-identical extracted text per url"; testing philosophy from
the reference's parser round-trip tests, /root/reference/src/flatfile.rs:648+).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from nem_mms_spark.jobs.decode import decode_blocks


def verify_roundtrip(
    spark: SparkSession,
    source: DataFrame,
    out_dir: str,
    key: str = "url",
) -> dict:
    """Inner-join decoded rows to source rows on `key`; every column must be
    null-safe-equal.  Returns counts; raises AssertionError on mismatch."""
    decoded = decode_blocks(spark, out_dir)
    cols = source.columns
    s = source.alias("s")
    d = decoded.alias("d")
    joined = s.join(d, F.col(f"s.{key}") == F.col(f"d.{key}"), "inner")
    neq = reduce(
        lambda a, b: a | b,
        [~F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}")) for c in cols],
    )
    agg = joined.agg(
        F.count("*").alias("joined"),
        F.sum(F.when(neq, 1).otherwise(0)).alias("mismatched"),
    ).collect()[0]
    n_source = source.count()
    n_decoded = decoded.count()
    result = {
        "source_rows": n_source,
        "decoded_rows": n_decoded,
        "joined_rows": agg["joined"],
        "mismatched_rows": int(agg["mismatched"] or 0),
    }
    assert n_source == n_decoded == agg["joined"], f"row count mismatch: {result}"
    assert result["mismatched_rows"] == 0, f"value mismatch: {result}"
    return result
