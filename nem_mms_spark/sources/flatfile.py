"""AEMO MMS flat-file CSV dialect, Spark-first (reference parity layer).

The reference parses files of C/I/D-tagged rows into typed Arrow batches
(/root/reference/src/flatfile.rs): C = file-level comments (EMMS/BUT
headers, EOR row-count trailer), I = in-file table headers (schema +
column names), D = data rows.  One file carries MANY tables; schema binding
is by column NAME from the registry, extra columns are dropped, missing
headers are fatal (flatfile.rs:109-132).

Spark restatement (no per-row Python after line extraction):

  lines        sc.binaryFiles -> container recursion (zip-in-zip) ->
               exact per-file line numbers  [S1/S2/S3]
  classify     first CSV field 'C'/'I'/'D' via split + when  [P1/P2]
  segment      running count of I-rows over a per-file window — the
               sessionization idiom for the reference's stateful
               segmentation scan (flatfile.rs:83-103)  [P6]
  bind+cast    join D-rows to their segment's I-row, look up each schema
               field's index in the header array, cast with the trial
               ladder (timestamp formats per flatfile.rs:619-640)  [P7/P8]
  validate     nulls in non-nullable fields are fatal (flatfile.rs:163);
               unknown (report_type, report_subtype) pairs are skipped
               with a warning (mod.rs:201-207)
  route        one parquet dataset per package  [S7/S8]

Dialect note: fields are split on ',' — embedded commas inside quoted
fields are not supported (none appear in the reference's own test corpus).
"""

from __future__ import annotations

import io
import os
import zipfile

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from nem_mms_spark.sources.schemas import PACKAGE_OF_REPORT, PACKAGE_SCHEMAS

LINES_SCHEMA = "file string, line_no long, value string"


def read_flatfile_lines(spark: SparkSession, path: str) -> DataFrame:
    """Recursive scan of csv/zip files -> (file, line_no, value) rows.

    binaryFiles distributes one file per task; zip members (including
    nested zips, /root/reference/src/zip.rs:13-40) are expanded in-task.
    Line numbers are exact per logical file — the ordering the
    segmentation window requires.
    """

    def expand(item):
        fname, data = item
        yield from _expand_blob(fname, bytes(data))

    # directory recursion (reference S3, /root/reference/src/main.rs:158-190):
    # binaryFiles does not descend into nested dirs, so enumerate local
    # directories explicitly (csv/zip only, unknown extensions skipped)
    src = path
    if "://" not in path and os.path.isdir(path):
        files = []
        for root, _dirs, names in os.walk(path):
            for nm in names:
                if nm.lower().endswith((".csv", ".zip")):
                    files.append(os.path.join(root, nm))
        if not files:
            return spark.createDataFrame([], schema=LINES_SCHEMA)
        src = ",".join(sorted(files))
    rdd = spark.sparkContext.binaryFiles(src).flatMap(expand)
    return spark.createDataFrame(rdd, schema=LINES_SCHEMA)


def _expand_blob(name: str, blob: bytes):
    lower = name.lower()
    if lower.endswith(".zip"):
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            for member in zf.namelist():
                mlower = member.lower()
                if mlower.endswith((".csv", ".zip")):
                    yield from _expand_blob(
                        f"{name}!{member}", zf.read(member)
                    )
    elif lower.endswith(".csv"):
        text = blob.decode("utf-8", errors="replace")
        for i, line in enumerate(text.splitlines()):
            if line:
                yield (name, i, line)
    # other extensions: skipped (main.rs:187)


def classify_lines(lines: DataFrame) -> DataFrame:
    """P1/P2: record classification + segmentation ids."""
    df = lines.withColumn("fields", F.split("value", ","))
    c0 = F.col("fields")[0]
    df = df.withColumn(
        "rtype",
        F.when(c0.isin("C", "I", "D"), c0).otherwise(F.lit(None)),
    )
    bad = df.filter(F.col("rtype").isNull()).limit(1).collect()
    if bad:
        raise ValueError(
            f"unrecognized payload at {bad[0]['file']}:{bad[0]['line_no']}: "
            f"{bad[0]['value'][:80]!r}"
        )
    w = W.partitionBy("file").orderBy("line_no").rowsBetween(
        W.unboundedPreceding, 0
    )
    return (
        df.withColumn(
            "seg", F.sum(F.when(F.col("rtype") == "I", 1).otherwise(0)).over(w)
        )
        .withColumn(
            "last_c",
            F.max(
                F.when(F.col("rtype") == "C", F.col("line_no"))
            ).over(w),
        )
        .withColumn(
            "last_i",
            F.max(
                F.when(F.col("rtype") == "I", F.col("line_no"))
            ).over(w),
        )
    )


def segment_info(classified: DataFrame) -> DataFrame:
    """One row per (file, seg): the I-record's report identity + headers."""
    return classified.filter(F.col("rtype") == "I").select(
        "file",
        "seg",
        F.col("fields")[1].alias("report_type"),
        F.col("fields")[2].alias("report_subtype"),
        F.col("fields")[3].cast("int").alias("report_version"),
        F.slice(
            F.col("fields"), 5, F.greatest(F.size("fields") - 4, F.lit(0))
        ).alias("headers"),
    )


def comment_records(classified: DataFrame) -> DataFrame:
    """EMMS / BUT / EOR comment rows, parsed (P3).  EOR carries the
    row-count checksum (flatfile.rs:475-488)."""
    c = classified.filter(F.col("rtype") == "C")
    is_eor = F.col("fields")[1] == "END OF REPORT"
    return c.select(
        "file",
        "line_no",
        F.when(is_eor, "EOR").otherwise("HEADER").alias("kind"),
        F.when(is_eor, F.col("fields")[2].cast("long")).alias(
            "count_of_records"
        ),
        F.when(~is_eor, F.col("fields")[1]).alias("system"),
        F.when(~is_eor, F.col("fields")[2]).alias("report_id"),
        F.when(
            ~is_eor, F.try_to_timestamp(F.concat_ws(" ", F.col("fields")[5], F.col("fields")[6]), F.lit("yyyy/MM/dd HH:mm:ss"))
        ).alias("publish_dt"),
    )


_TS_LADDER_FORMATS = ("yyyy/MM/dd HH:mm:ss", "yyyy/MM/dd HH:mm", "yyyy/MM/dd")


def _cast_cell(raw, spark_type: str):
    """The trial-parse/coercion ladder (P5/P8).  Empty string -> NULL."""
    v = F.nullif(F.trim(raw), F.lit(""))
    v = F.regexp_replace(v, '^"(.*)"$', r"$1")  # strip full-field quotes
    if spark_type == "string":
        return v
    if spark_type == "double":
        return v.cast("double")
    if spark_type in ("short", "byte", "int", "long", "smallint", "tinyint", "bigint"):
        return v.cast(spark_type)
    if spark_type == "boolean":
        # integer 1 -> true, other ints -> false (flatfile.rs:565-571)
        return F.when(v.isNull(), F.lit(None).cast("boolean")).otherwise(
            v.cast("long") == 1
        )
    if spark_type.startswith("timestamp"):
        ts = None
        for fmt in _TS_LADDER_FORMATS:
            t = F.try_to_timestamp(v, F.lit(fmt))
            ts = t if ts is None else F.coalesce(ts, t)
        return ts.cast("timestamp_ntz")
    raise ValueError(f"unsupported cast target {spark_type}")


def parse_flatfiles(
    spark: SparkSession, path: str, strict_nulls: bool = True
) -> dict[str, DataFrame]:
    """Full pipeline: path -> {package_name: typed DataFrame} (the
    reference's `parse` entry point, main.rs:92-99)."""
    lines = read_flatfile_lines(spark, path)
    classified = classify_lines(lines)
    info = segment_info(classified)

    data = classified.filter(
        (F.col("rtype") == "D")
        & F.col("last_i").isNotNull()
        & (
            F.col("last_c").isNull()
            | (F.col("last_i") > F.col("last_c"))
        )
    ).select("file", "seg", "line_no", "fields", F.col("value"))

    joined = data.join(F.broadcast(info), ["file", "seg"])

    present = {
        (r["report_type"], r["report_subtype"])
        for r in info.select("report_type", "report_subtype").distinct().collect()
    }
    out: dict[str, DataFrame] = {}
    for key in sorted(present):
        pkg = PACKAGE_OF_REPORT.get(key)
        if pkg is None:
            # skipped with a warning, not fatal (mod.rs:201-207)
            print(f"WARNING: unrecognized package {key}, skipping")
            continue
        schema = PACKAGE_SCHEMAS[pkg]
        rows = joined.filter(
            (F.col("report_type") == key[0])
            & (F.col("report_subtype") == key[1])
        )
        # header presence check per segment variant
        # (MissingColumnHeader, flatfile.rs:120)
        for hdr in (
            info.filter(
                (F.col("report_type") == key[0])
                & (F.col("report_subtype") == key[1])
            )
            .select("headers")
            .distinct()
            .collect()
        ):
            have = set(hdr["headers"])
            missing = [f.name for f in schema.fields if f.name not in have]
            if missing:
                raise ValueError(
                    f"{pkg}: missing column headers {missing} in {key}"
                )
        cols = []
        for field in schema.fields:
            # bind by NAME via the segment's header array; data cells
            # start at CSV index 4 (flatfile.rs:110,118-125)
            idx = F.array_position(F.col("headers"), field.name)
            raw = F.get(F.col("fields"), (idx + 3).cast("int"))
            cols.append(
                _cast_cell(raw, field.dataType.simpleString()).alias(field.name)
            )
        typed = rows.select(*cols)
        if strict_nulls:
            req = [f.name for f in schema.fields if not f.nullable]
            if req:
                viol = typed.filter(
                    F.greatest(*[F.col(c).isNull().cast("int") for c in req])
                    == 1
                ).count()
                if viol:
                    raise ValueError(
                        f"{pkg}: {viol} rows violate non-null fields {req}"
                    )
        out[pkg] = typed
    return out


def flatfiles_to_parquet(
    spark: SparkSession, in_path: str, out_dir: str
) -> dict[str, str]:
    """S7/S8 output routing: one parquet dataset per package."""
    written = {}
    for pkg, df in parse_flatfiles(spark, in_path).items():
        dest = os.path.join(out_dir, f"{pkg}.parquet")
        df.write.mode("overwrite").parquet(dest)
        written[pkg] = dest
    return written
