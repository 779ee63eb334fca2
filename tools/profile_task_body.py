#!/usr/bin/env python
"""Serial per-phase profile of the source-direct encode task body.

Phase 1 (gen): generate the bench web_pages input (same shape as
bench.py's run_encode_scaling: web_pages_df(4M rows, 64 files)) into
/dev/shm/nem_mms_profile/web_pages.

Phase 2 (profile): for K files, run the exact task body serially —
fetch, pq.read_table, sort_by, fingerprint, to_kernel, select_and_encode
(per column), zone stats, blocks-table build, parquet write — with
wall timers per phase and per column, printed as JSON.

Usage:
  python tools/profile_task_body.py gen [rows] [files]
  python tools/profile_task_body.py profile [k_files]
  python tools/profile_task_body.py cprofile   # cProfile one file
"""

from __future__ import annotations

import json
import os
import sys
import time

SRC = "/dev/shm/nem_mms_profile/web_pages"
OUT = "/dev/shm/nem_mms_profile/enc"


def gen(rows: int = 4_000_000, files: int = 64) -> None:
    from nem_mms_spark.session import get_spark
    from nem_mms_spark.datagen import web_pages_df

    spark = get_spark(master="local[32]", shuffle_partitions=64,
                      app_name="profile_gen",
                      extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")
    pages = web_pages_df(spark, rows, num_partitions=files)
    pages.write.mode("overwrite").parquet(SRC)
    spark.stop()
    total = sum(
        os.path.getsize(os.path.join(SRC, f))
        for f in os.listdir(SRC) if f.endswith(".parquet")
    )
    print(f"generated {rows} rows in {files} files, {total/1e9:.2f} GB parquet")


def profile(k_files: int = 2) -> None:
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from nem_mms_spark.jobs import encode as E

    pa.set_cpu_count(1)
    files = sorted(
        f for f in os.listdir(SRC)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )[:k_files]
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(os.path.join(OUT, "blocks"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "manifest"), exist_ok=True)

    from nem_mms_spark import framing
    from nem_mms_spark.selector import ColumnContext, select_and_encode

    agg: dict = {}
    col_enc: dict = {}
    col_kernel: dict = {}
    raw_total = 0
    t_all = time.monotonic()
    for pid, fname in enumerate(files):
        path = os.path.join(SRC, fname)
        t0 = time.monotonic()
        with open(path, "rb", buffering=0) as fh:
            raw = fh.read()
        t1 = time.monotonic()
        tbl = pq.read_table(pa.BufferReader(raw), columns=None)
        del raw
        t2 = time.monotonic()
        tbl = tbl.sort_by([("warc_ts", "ascending")])
        t3 = time.monotonic()
        agg["rfetch"] = agg.get("rfetch", 0) + (t1 - t0)
        agg["rparse"] = agg.get("rparse", 0) + (t2 - t1)
        agg["rsort"] = agg.get("rsort", 0) + (t3 - t2)

        # inline _encode_partition_table with per-column timers
        fp = E._fingerprint(tbl, "url")
        t4 = time.monotonic()
        agg["fprint"] = agg.get("fprint", 0) + (t4 - t3)
        ranges = framing.block_ranges(
            tbl, framing.DEFAULT_BLOCK_ROWS, framing.DEFAULT_BLOCK_BYTES)
        ctxs = {name: ColumnContext() for name in tbl.column_names}
        payloads = []
        for block_id, (start, length) in enumerate(ranges):
            for name in tbl.column_names:
                tk = time.monotonic()
                arr = tbl.column(name).slice(start, length).combine_chunks()
                values, dtype, validity, null_count, rawb = framing.to_kernel(arr)
                te = time.monotonic()
                codec, payload, params, _est = select_and_encode(
                    values, dtype, ctxs[name])
                td = time.monotonic()
                col_kernel[name] = col_kernel.get(name, 0) + (te - tk)
                col_enc.setdefault(name, {}).setdefault(codec, [0, 0, 0])
                rec = col_enc[name][codec]
                rec[0] += td - te
                rec[1] += rawb
                rec[2] += len(payload)
                raw_total += rawb
                tz = time.monotonic()
                E._zone_stats(values, dtype)
                agg["zstats"] = agg.get("zstats", 0) + (time.monotonic() - tz)
                payloads.append((block_id, name, codec, payload))
        t5 = time.monotonic()
        # write cost: reuse the real writer on a real blocks table shape
        blocks_tbl = pa.table({
            "block_id": pa.array([p[0] for p in payloads], type=pa.int32()),
            "column": pa.array([p[1] for p in payloads], type=pa.string()),
            "codec": pa.array([p[2] for p in payloads], type=pa.string()),
            "payload": pa.array([p[3] for p in payloads], type=pa.binary()),
        })
        E._atomic_write(
            blocks_tbl,
            os.path.join(OUT, "blocks", f"part_id={pid}", "data.parquet"),
        )
        agg["write"] = agg.get("write", 0) + (time.monotonic() - t5)

    wall = time.monotonic() - t_all
    out = {
        "files": len(files),
        "raw_gb": round(raw_total / 1e9, 3),
        "wall_s": round(wall, 3),
        "mb_per_s": round(raw_total / wall / 1e6, 1),
        "phases_s": {k: round(v, 3) for k, v in sorted(agg.items())},
        "kernel_per_col_s": {k: round(v, 3) for k, v in col_kernel.items()},
        "encode_per_col": {
            c: {
                codec: {
                    "s": round(v[0], 3),
                    "raw_mb": round(v[1] / 1e6, 1),
                    "enc_mb": round(v[2] / 1e6, 1),
                    "mb_per_s": round(v[1] / max(v[0], 1e-9) / 1e6, 1),
                }
                for codec, v in d.items()
            }
            for c, d in col_enc.items()
        },
    }
    print(json.dumps(out, indent=1))


def cprof() -> None:
    import cProfile
    import pstats

    pr = cProfile.Profile()
    pr.enable()
    profile(1)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(40)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "profile"
    if cmd == "gen":
        gen(int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 64)
    elif cmd == "profile":
        profile(int(sys.argv[2]) if len(sys.argv) > 2 else 2)
    elif cmd == "cprofile":
        cprof()
    else:
        raise SystemExit(f"unknown command {cmd}")
