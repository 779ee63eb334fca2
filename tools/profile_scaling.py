#!/usr/bin/env python
"""Per-stage 8-vs-32 contention profile for the source-direct encode.

Round-4 verdict item 1: summed in-task encode seconds inflate ~1.35x
from local[8] to local[32] while the same kernels standalone scale at
0.94 — WHICH stage inflates?  This runs the bench's aligned protocol
(warm workers, tmpfs source, alternating levels) and prints the summed
per-stage task seconds per rep, per level, so the inflation localizes.

Usage: python tools/profile_scaling.py [rows] [reps]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 31))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 31))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SHM = "/dev/shm/nem_mms_prof"
LEVELS = (8, 32)


def new_spark(cores: int):
    from nem_mms_spark.session import get_spark

    os.makedirs(SHM, exist_ok=True)
    return get_spark(
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        app_name=f"prof_{cores}",
        extra_conf={
            "spark.local.dir": SHM,
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:ParallelGCThreads=4",
        },
    )


def main() -> None:
    from bench import _membw_quick, _warm_up

    from nem_mms_spark.datagen import web_pages_df
    from nem_mms_spark.jobs.encode import encode_parquet

    src = os.path.join(SHM, "web_pages")
    if not os.path.isdir(src):
        spark = new_spark(32)
        web_pages_df(spark, ROWS, num_partitions=64).write.mode(
            "overwrite"
        ).parquet(src)
        spark.stop()

    out = os.path.join(SHM, "enc")
    results = []
    for sess in range(2):
        for cores in LEVELS:
            bw = _membw_quick(cores)
            spark = new_spark(cores)
            _warm_up(spark, src)
            shutil.rmtree(out, ignore_errors=True)
            encode_parquet(spark, src, out, resume=False)  # untimed warm
            for rep in range(REPS):
                shutil.rmtree(out, ignore_errors=True)
                t0 = time.monotonic()
                m = encode_parquet(spark, src, out, resume=False)
                wall = time.monotonic() - t0
                rec = {
                    "sess": sess,
                    "cores": cores,
                    "rep": rep,
                    "wall_s": round(wall, 3),
                    "membw_gb_s": bw,
                    "task_encode_s_sum": m["task_encode_s_sum"],
                    "stage_s": m["task_stage_s"],
                }
                results.append(rec)
                print(json.dumps(rec), flush=True)
            spark.stop()

    # per-level best (min) per stage across all reps
    print("\n=== summed task seconds per stage, min across reps ===")
    stages = sorted({k for r in results for k in r["stage_s"]})
    best = {}
    for cores in LEVELS:
        recs = [r for r in results if r["cores"] == cores]
        best[cores] = {
            s: min(r["stage_s"].get(s, 0.0) for r in recs) for s in stages
        }
        # stall seconds = wall not spent on-CPU (faults + preemption),
        # from the rep with the minimal stall (paired within a rep)
        def _stall(r):
            body_wall = sum(
                r["stage_s"].get(k, 0.0)
                for k in ("fprint", "kernel", "encode", "zstats", "build", "write")
            )
            return (
                r["stage_s"].get("read", 0.0)
                - r["stage_s"].get("c_read_cpu", 0) / 1e9,
                body_wall - r["stage_s"].get("c_cpu", 0) / 1e9,
            )
        stalls = [_stall(r) for r in recs]
        best[cores]["READ_STALL"] = min(s[0] for s in stalls)
        best[cores]["BODY_STALL"] = min(s[1] for s in stalls)
        best[cores]["TOTAL_encode_ns"] = min(
            r["task_encode_s_sum"] for r in recs
        )
        best[cores]["WALL"] = min(r["wall_s"] for r in recs)
    hdr = f"{'stage':>16} " + " ".join(f"{c:>12}" for c in LEVELS) + "  ratio"
    print(hdr)
    for s in stages + ["READ_STALL", "BODY_STALL", "TOTAL_encode_ns", "WALL"]:
        lo, hi = best[LEVELS[0]][s], best[LEVELS[1]][s]
        if s.startswith("c_") and not s.endswith("cpu"):
            lo, hi = float(lo), float(hi)
        elif s.startswith("c_"):
            lo, hi = lo / 1e9, hi / 1e9
        ratio = hi / lo if lo else float("nan")
        print(f"{s:>16} {lo:>12.2f} {hi:>12.2f}  {ratio:.3f}")


if __name__ == "__main__":
    main()
