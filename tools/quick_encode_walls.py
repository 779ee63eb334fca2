#!/usr/bin/env python
"""Quick bench-shaped encode walls: one local[32] session, warm pass,
then reps of encode_parquet at parallelism 2/8/32 over the 4M-row
web_pages input in /dev/shm (same shape as bench.py's headline).

Usage: python tools/quick_encode_walls.py [reps] [levels-csv]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 31))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 31))

SRC = "/dev/shm/nem_mms_profile/web_pages"
OUT = "/dev/shm/nem_mms_profile/enc_walls"

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
LEVELS = (
    tuple(int(x) for x in sys.argv[2].split(","))
    if len(sys.argv) > 2
    else (8, 32, 2)
)


def main() -> None:
    from nem_mms_spark.session import get_spark
    from nem_mms_spark.jobs.encode import encode_parquet

    spark = get_spark(
        master="local[32]", shuffle_partitions=32, app_name="quick_walls",
        extra_conf={
            "spark.local.dir": "/dev/shm/nem_mms_profile",
            "spark.driver.extraJavaOptions": (
                "-XX:+UseParallelGC -XX:ParallelGCThreads=4"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm pass (untimed): worker spawn + imports + native compile
    shutil.rmtree(OUT, ignore_errors=True)
    encode_parquet(spark, SRC, OUT, resume=False, parallelism=32)
    walls: dict = {}
    for _ in range(REPS):
        for p in LEVELS:
            shutil.rmtree(OUT, ignore_errors=True)
            t0 = time.monotonic()
            m = encode_parquet(spark, SRC, OUT, resume=False, parallelism=p)
            walls.setdefault(p, []).append(round(time.monotonic() - t0, 3))
    raw = m["raw_bytes"]
    print(json.dumps({
        "raw_gb": round(raw / 1e9, 3),
        "walls": walls,
        "gb_per_s_min": {
            p: round(raw / min(w) / 1e9, 4) for p, w in walls.items()
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
