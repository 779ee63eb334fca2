#!/usr/bin/env python
"""Round-7 optimization measurement harness (bench.py is frozen for the
driver, so the extra evidence lives here — guide §1.1/§1.4).

Per-query isolation with the SAME session config and action method as
bench.py's query phase (collect()), plus:
  * optional multiple reps (min + all reps reported)
  * optional noop-sink timing (computes every column, guide §1.4)
  * .explain("formatted") capture per query into a plans dir

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --reps 2 \
      [--noop] [--plans plans/r07 --suffix before] [query ...]

Prints one JSON line: {"sf": ..., "queries": {name: min_sec},
"reps": {name: [sec, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 31))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 31))


def _new_spark(cores: int):
    from nem_mms_spark.session import get_spark

    shm = "/dev/shm/nem_mms_bench"
    os.makedirs(shm, exist_ok=True)
    return get_spark(
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        app_name=f"bench_extra_{cores}",
        extra_conf={
            "spark.local.dir": shm,
            "spark.sql.inMemoryColumnarStorage.compressed": "false",
            "spark.driver.extraJavaOptions": (
                "-XX:+UseParallelGC -XX:ParallelGCThreads=4"
            ),
        },
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--noop", action="store_true",
                    help="time df.write.format('noop') instead of collect()")
    ap.add_argument("--plans", default=None,
                    help="directory to write <query>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from nem_mms_spark.queries import QUERIES

    names = args.queries or list(QUERIES)
    spark = _new_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    reps: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        reps[name] = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} [{args.sf}]")
            t0 = time.monotonic()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            reps[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{name}: {reps[name]}", flush=True)
    spark.stop()
    print(json.dumps({
        "sf": args.sf,
        "queries": {n: min(r) for n, r in reps.items()},
        "reps": reps,
    }))


if __name__ == "__main__":
    main()
