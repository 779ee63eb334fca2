"""Encoded-block / manifest / checkpoint table schemas + type mapping.

Layout under an encode output directory (plain parquet standing in for the
Iceberg tables `encoded_blocks` / `manifest` / `checkpoint` — catalog I/O is
isolated here so an Iceberg catalog can be swapped in; SURVEY.md §7 design
stance):

  blocks/     one row per (partition, column, block): codec id, payload,
              validity bitmap, counts, byte sizes  (SURVEY.md §1.4)
  manifest/   one row per (partition, column): codec histogram + params
              summary — the decode-side registry (reference ancestor:
              Package::schema() lookup, /root/reference/src/packages/mod.rs:102-112)
  checkpoint/ one row per partition: status + fingerprint + byte metrics,
              written LAST so its presence marks a durably completed
              partition (reference ancestor: create_new(true) download
              idempotence, /root/reference/src/packages/fetch.rs:264-282)
"""

from __future__ import annotations

BLOCKS_DIR = "blocks"
MANIFEST_DIR = "manifest"
CHECKPOINT_DIR = "checkpoint"

# zmin/zmax are the block's zone map (data-skipping stats): exact int64
# bounds for integer-kind columns (incl. timestamps as epoch micros) in
# zmin_i/zmax_i, exact double bounds for float columns in zmin_d/zmax_d;
# all four NULL when stats don't apply (bytes columns, all-null or
# NaN-containing blocks) — a NULL zone map means "cannot skip".
BLOCK_SCHEMA = (
    "part_id int, block_id int, col_idx int, column string, "
    "logical_type string, codec string, params string, payload binary, "
    "validity binary, value_count long, null_count long, raw_bytes long, "
    "encoded_bytes long, encode_ns long, fingerprint long, "
    "zmin_i long, zmax_i long, zmin_d double, zmax_d double"
)

MANIFEST_SCHEMA = (
    "part_id int, col_idx int, column string, logical_type string, "
    "n_blocks long, n_values long, null_count long, raw_bytes long, "
    "encoded_bytes long, codecs string"
)

CHECKPOINT_SCHEMA = (
    "part_id int, status string, n_rows long, n_blocks long, n_columns int, "
    "raw_bytes long, encoded_bytes long, fingerprint long, encode_ns long"
)

# arrow logical type string -> Spark DDL type (decode output schema)
_ARROW_TO_SPARK = {
    "string": "string",
    "large_string": "string",
    "binary": "binary",
    "large_binary": "binary",
    "int8": "byte",
    "int16": "short",
    "int32": "int",
    "int64": "long",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "date32[day]": "date",
}


def spark_type_of(logical_type: str) -> str:
    if logical_type in _ARROW_TO_SPARK:
        return _ARROW_TO_SPARK[logical_type]
    if logical_type.startswith("timestamp["):
        return "timestamp" if ", tz=" in logical_type else "timestamp_ntz"
    raise ValueError(f"unsupported logical type {logical_type!r}")


def decode_schema_of(manifest_rows) -> str:
    """Spark DDL for decode output, in original column order.

    manifest_rows: iterable of Rows with col_idx, column, logical_type
    (one partition's manifest or the distinct column set).
    """
    seen = {}
    for r in manifest_rows:
        seen[r["col_idx"]] = (r["column"], r["logical_type"])
    parts = [
        f"`{name}` {spark_type_of(lt)}"
        for _, (name, lt) in sorted(seen.items())
    ]
    return ", ".join(parts)
