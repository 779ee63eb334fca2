#!/usr/bin/env python
"""Round-6 scheduling experiment: does tasks-per-slot > 1 (multi-wave
backfill) close the reproducible 32-way in-Spark wall gap?

Paired protocol (one local[32] session, interleaved reps, levels share
every noise window).  Grid: tasks_per_slot in {1, 4} x parallelism in
{8, 32}, plus a parallelism=30 variant (leave the JVM two cores).
Per-rep timeline decomposition: busy work vs schedule tail.
"""

import json
import os
import shutil
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 31))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 31))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("BENCH_ROWS", "4000000"))


def decomp(m, p):
    tl = m["timeline"]
    wall = m["job_wall_s"]
    busy = sum(t["end_s"] - t["start_s"] for t in tl)
    makespan = max(t["end_s"] for t in tl) - min(t["start_s"] for t in tl)
    launch = min(t["start_s"] for t in tl)
    last_end = max(t["end_s"] for t in tl)
    # tail: time the last-finishing 10% of work runs with < p/2 busy slots
    evs = sorted(
        [(t["start_s"], 1) for t in tl] + [(t["end_s"], -1) for t in tl]
    )
    cur = 0
    half_idle = 0.0
    prev = evs[0][0]
    for t, d in evs:
        if cur < p / 2:
            half_idle += t - prev
        cur += d
        prev = t
    return {
        "wall": round(wall, 3),
        "busy_s": round(busy, 2),
        "ideal_s": round(busy / p, 3),
        "makespan": round(makespan, 3),
        "launch_lag": round(launch, 3),
        "post_job": round(wall - last_end, 3),
        "underhalf_s": round(half_idle, 3),
        "util": round(busy / (p * makespan), 3),
    }


def main():
    import bench
    from nem_mms_spark.datagen import web_pages_df
    from nem_mms_spark.jobs.encode import encode_parquet

    src = "/dev/shm/nem_mms_bench/web_pages"
    out = "/dev/shm/nem_mms_bench/enc"
    os.makedirs("/dev/shm/nem_mms_bench", exist_ok=True)
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        spark = bench._new_spark(32)
        web_pages_df(spark, ROWS, num_partitions=64).write.mode(
            "overwrite"
        ).parquet(src)
        spark.stop()

    spark = bench._new_spark(32)
    bench._warm_up(spark, src)
    shutil.rmtree(out, ignore_errors=True)
    encode_parquet(spark, src, out, resume=False, parallelism=32,
                   tasks_per_slot=1)  # untimed warm
    raw = None
    res = {}
    grid = [(8, 1), (32, 1), (8, 4), (32, 4), (30, 4), (32, 2)]
    for rep in range(3):
        for p, tps in grid:
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.monotonic()
            m = encode_parquet(spark, src, out, resume=False,
                               parallelism=p, tasks_per_slot=tps)
            wall = time.monotonic() - t0
            raw = m["raw_bytes"]
            key = f"p{p}_tps{tps}"
            rec = decomp(m, p)
            rec["outer_wall"] = round(wall, 3)
            res.setdefault(key, []).append(rec)
            print(key, "rep", rep, json.dumps(rec), flush=True)
    spark.stop()

    print("\n==== summary (min over reps, GB/s on job wall) ====")
    for key, reps in res.items():
        best = min(reps, key=lambda r: r["wall"])
        gbs = raw / best["wall"] / 1e9
        print(key, "wall", best["wall"], "gb/s", round(gbs, 4),
              "util", best["util"], "ideal", best["ideal_s"],
              "walls", [r["wall"] for r in reps], flush=True)
    for tps in (1, 2, 4):
        k8, k32 = f"p8_tps{tps}", f"p32_tps{tps}"
        if k8 in res and k32 in res:
            w8 = min(r["wall"] for r in res[k8])
            w32 = min(r["wall"] for r in res[k32])
            print(f"tps{tps}: eff 8->32 =", round((w8 / w32) / 4, 4))


if __name__ == "__main__":
    main()
