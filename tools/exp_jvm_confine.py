#!/usr/bin/env python
"""Round-6 experiment 2: does fencing the JVM onto a small core subset
(executor-cpuset stand-in) close the 32-way in-Spark wall gap?

One local[32] session; interleaved reps of {unconfined, confined-4,
confined-2} at p32/tps4, with paired p8 reps for the efficiency pair.
"""

import json
import os
import shutil
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 31))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 31))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.exp_sched import decomp  # noqa: E402


def main():
    import bench
    from nem_mms_spark.datagen import web_pages_df
    from nem_mms_spark.jobs.encode import encode_parquet
    from nem_mms_spark.session import confine_jvm

    src = "/dev/shm/nem_mms_bench/web_pages"
    out = "/dev/shm/nem_mms_bench/enc"
    os.makedirs("/dev/shm/nem_mms_bench", exist_ok=True)
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        spark = bench._new_spark(32)
        web_pages_df(spark, 4000000, num_partitions=64).write.mode(
            "overwrite"
        ).parquet(src)
        spark.stop()

    spark = bench._new_spark(32)
    allcores = set(range(os.cpu_count()))
    bench._warm_up(spark, src)
    shutil.rmtree(out, ignore_errors=True)
    encode_parquet(spark, src, out, resume=False, parallelism=32)  # warm

    res = {}
    raw = None
    grid = [
        ("p32_free", 32, None),
        ("p32_jvm4", 32, {28, 29, 30, 31}),
        ("p32_jvm2", 32, {30, 31}),
        ("p8_free", 8, None),
        ("p8_jvm4", 8, {28, 29, 30, 31}),
    ]
    for rep in range(3):
        for key, p, fence in grid:
            if fence:
                n = confine_jvm(spark, fence)
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.monotonic()
            m = encode_parquet(spark, src, out, resume=False, parallelism=p,
                               tasks_per_slot=4)
            wall = time.monotonic() - t0
            if fence:
                confine_jvm(spark, allcores)
            raw = m["raw_bytes"]
            rec = decomp(m, p)
            rec["outer_wall"] = round(wall, 3)
            if fence:
                rec["threads_affined"] = n
            res.setdefault(key, []).append(rec)
            print(key, "rep", rep, json.dumps(rec), flush=True)
    spark.stop()

    print("\n==== summary (min over reps) ====")
    for key, reps in res.items():
        best = min(reps, key=lambda r: r["wall"])
        print(key, "wall", best["wall"],
              "gb/s", round(raw / best["wall"] / 1e9, 4),
              "util", best["util"], "ideal", best["ideal_s"],
              "walls", [r["wall"] for r in reps], flush=True)
    for hi, lo in (("p32_free", "p8_free"), ("p32_jvm4", "p8_jvm4"),
                   ("p32_jvm2", "p8_free")):
        if hi in res and lo in res:
            w8 = min(r["wall"] for r in res[lo])
            w32 = min(r["wall"] for r in res[hi])
            print(f"{lo}->{hi}: eff =", round((w8 / w32) / 4, 4))


if __name__ == "__main__":
    main()
