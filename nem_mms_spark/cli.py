"""Command-line entry points (spark-submit friendly):

  python -m nem_mms_spark.cli generate --rows N --out DIR
  python -m nem_mms_spark.cli encode   --input PARQUET --out DIR [opts]
  python -m nem_mms_spark.cli decode   --encoded DIR --out PARQUET [--columns a,b]
  python -m nem_mms_spark.cli verify   --source PARQUET --encoded DIR [--key url]
  python -m nem_mms_spark.cli info     [--encoded DIR]

Reference ancestor: the clap dispatch in /root/reference/src/main.rs:91-154
(parse/fetch/info/manage); fetch is out of scope (our source is a table),
manage-init is subsumed by encode's directory layout.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from nem_mms_spark.session import get_spark

    return get_spark(master=args.master)


def cmd_generate(args) -> int:
    from nem_mms_spark.datagen import web_pages_df

    spark = _spark(args)
    web_pages_df(spark, args.rows).write.mode("overwrite").parquet(args.out)
    print(json.dumps({"written": args.out, "rows": args.rows}))
    return 0


def cmd_encode(args) -> int:
    from nem_mms_spark.jobs.encode import encode_dataframe, encode_parquet

    spark = _spark(args)
    if args.partitioning in ("source_direct", "salted_direct"):
        metrics = encode_parquet(
            spark,
            args.input,
            args.out,
            key_col=args.key or "url",
            resume=not args.no_resume,
            partitioning=(
                "salted" if args.partitioning == "salted_direct"
                else "source_direct"
            ),
        )
    else:
        df = spark.read.parquet(args.input)
        metrics = encode_dataframe(
            spark,
            df,
            args.out,
            num_parts=args.num_parts,
            key_col=args.key,
            salt_buckets=args.salt_buckets,
            resume=not args.no_resume,
            partitioning=args.partitioning,
        )
    print(json.dumps(metrics))
    return 0


def cmd_decode(args) -> int:
    from nem_mms_spark.jobs.decode import decode_blocks, decode_blocks_direct

    spark = _spark(args)
    cols = args.columns.split(",") if args.columns else None
    engine = getattr(args, "engine", "direct")
    if engine == "direct":
        df = decode_blocks_direct(spark, args.encoded, columns=cols)
    else:
        df = decode_blocks(spark, args.encoded, columns=cols, engine=engine)
    df.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"written": args.out, "engine": engine}))
    return 0


def cmd_verify(args) -> int:
    from nem_mms_spark.jobs.verify import verify_roundtrip

    spark = _spark(args)
    source = spark.read.parquet(args.source)
    result = verify_roundtrip(spark, source, args.encoded, key=args.key)
    print(json.dumps(result))
    return 0


def cmd_parse(args) -> int:
    """MMS flat-file parse -> one parquet dataset per package (the
    reference's flagship `parse` subcommand, main.rs:92-99)."""
    from nem_mms_spark.sources.flatfile import flatfiles_to_parquet

    spark = _spark(args)
    written = flatfiles_to_parquet(spark, args.input, args.out)
    print(json.dumps(written))
    return 0


def cmd_stream(args) -> int:
    """Drain currently-available files from a landing dir into encoded
    blocks (incremental encode; availableNow trigger)."""
    from nem_mms_spark.streaming import incremental_encode

    spark = _spark(args)
    incremental_encode(
        spark, args.input, args.out, num_parts=args.num_parts
    )
    print(json.dumps({"drained": args.input, "out": args.out}))
    return 0


def _print_package_schemas() -> None:
    """Reference-parity pretty-print of every package schema (the `info`
    display, /root/reference/src/packages/mod.rs:132-194).  Fetch
    operations are marked unsupported by design: this engine's source is
    a table / flat files, not nemweb HTTP (SURVEY.md section 7)."""
    from nem_mms_spark.sources.schemas import PACKAGE_SCHEMAS

    for name, schema in sorted(PACKAGE_SCHEMAS.items()):
        print(f"Package name: {name}")
        print("Supported operations:")
        print("    ✓ Parse (flat file -> typed table)")
        print("    ✗ Fetch Current   (out of scope: source is a table)")
        print("    ✗ Fetch Archive   (out of scope: source is a table)")
        print("    ✗ Fetch Historic  (out of scope: source is a table)")
        print("Schema:")
        rows = [
            (f.name, f.dataType.simpleString(),
             "✓" if f.nullable else "✗")
            for f in schema.fields
        ]
        w0 = max(len("Name"), *(len(r[0]) for r in rows))
        w1 = max(len("Data type"), *(len(r[1]) for r in rows))
        print(f"    {'Name':<{w0}} {'Data type':<{w1}} Nullable")
        print(f"    {'-' * w0} {'-' * w1} --------")
        for r in rows:
            print(f"    {r[0]:<{w0}} {r[1]:<{w1}} {r[2]}")
        print()


def cmd_info(args) -> int:
    from nem_mms_spark.codecs import registry

    if args.schemas:
        _print_package_schemas()
        return 0
    out = {
        "codecs": {
            "bytes": registry.candidate_codecs("bytes"),
            "int": registry.candidate_codecs("<i8"),
            "float": registry.candidate_codecs("<f8"),
        },
    }
    if args.encoded:
        spark = _spark(args)
        from nem_mms_spark.jobs.decode import read_manifest
        from pyspark.sql import functions as F

        man = read_manifest(spark, args.encoded)
        out["columns"] = [
            r.asDict()
            for r in man.groupBy("column", "logical_type")
            .agg(
                F.sum("n_values").alias("n_values"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum("encoded_bytes").alias("encoded_bytes"),
            )
            .collect()
        ]
    print(json.dumps(out, indent=2))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="nem_mms_spark")
    p.add_argument("--master", default=None, help="spark master override")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write a synthetic web_pages table")
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--out", required=True)
    g.set_defaults(fn=cmd_generate)

    e = sub.add_parser("encode", help="encode a parquet table")
    e.add_argument("--input", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--num-parts", type=int, default=None)
    e.add_argument("--key", default=None)
    e.add_argument("--salt-buckets", type=int, default=4)
    e.add_argument("--no-resume", action="store_true")
    e.add_argument(
        "--partitioning",
        default="salted",
        choices=(
            "salted", "salted_full", "aligned", "source_direct",
            "salted_direct",
        ),
        help="salted = hybrid hot-key-only shuffle on a DataFrame read "
        "(default); salted_full = legacy full shuffle; aligned = "
        "zero-shuffle in-place; source_direct = one task per parquet "
        "file, scanned with pyarrow inside the task (fastest ingest of "
        "an existing table); salted_direct = source-direct INCLUDING "
        "skew handling (hot hosts spill task-side to right-sized salt "
        "buckets — zero JVM bytes; the recommended skew mode for "
        "parquet/Iceberg sources)",
    )
    e.set_defaults(fn=cmd_encode)

    d = sub.add_parser("decode", help="decode blocks back to parquet")
    d.add_argument("--encoded", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--columns", default=None)
    d.add_argument(
        "--engine",
        default="direct",
        choices=("direct", "arrow", "pandas"),
        help="direct = source-direct per-part-dir decode (zero shuffle, "
        "fastest); arrow/pandas = generic Spark-scan engines",
    )
    d.set_defaults(fn=cmd_decode)

    v = sub.add_parser("verify", help="bit-identical round-trip check")
    v.add_argument("--source", required=True)
    v.add_argument("--encoded", required=True)
    v.add_argument("--key", default="url")
    v.set_defaults(fn=cmd_verify)

    pa = sub.add_parser("parse", help="parse MMS flat files to parquet")
    pa.add_argument("--input", required=True)
    pa.add_argument("--out", required=True)
    pa.set_defaults(fn=cmd_parse)

    st = sub.add_parser("stream", help="incremental encode of a landing dir")
    st.add_argument("--input", required=True)
    st.add_argument("--out", required=True)
    st.add_argument("--num-parts", type=int, default=None)
    st.set_defaults(fn=cmd_stream)

    i = sub.add_parser("info", help="print codec registry / encoded stats")
    i.add_argument("--encoded", default=None)
    i.add_argument(
        "--schemas", action="store_true",
        help="pretty-print every package schema (reference info parity)",
    )
    i.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
