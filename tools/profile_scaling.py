#!/usr/bin/env python
"""Diagnose WHICH engine kernel anti-scales from K=8 to K=32 workers.

Runs, at K in {8, 32} concurrent processes (pinned one-per-core):
  controls:  memcpy64  (64 MB np.copyto — DRAM-bound, the bench probe)
             memcpy1p5 (1.5 MB np.copyto — L2-resident, core-private)
             alu       (int mul-add on a 256 KB buffer — pure compute)
             stream30  (sequential uint64 sum over a 30 MB buffer — the
                        engine's per-worker working-set size; separates
                        "fits in shared L3 at K=8, spills at K=32" from
                        genuine DRAM-bandwidth saturation)
  kernels:   per-column select_and_encode over the same 16384-row slice
             the bench's _kernel_warm_scaling uses, but timed PER COLUMN.

Prints a table of per-task wall (mean of workers, min over reps) at each K
and the 8->32 efficiency.  Usage: python tools/profile_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 31))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 31))

REPS = int(os.environ.get("PROF_REPS", "3"))


def _controls(seed: int) -> dict:
    import numpy as np

    out = {}
    # memcpy 64 MB (DRAM)
    n = (64 << 20) // 8
    src = np.arange(n, dtype=np.int64)
    dst = np.empty(n, dtype=np.int64)
    np.copyto(dst, src)
    best = min(_t(lambda: np.copyto(dst, src)) for _ in range(3))
    out["memcpy64"] = best
    # memcpy 1.5 MB (L2)
    n2 = (1536 << 10) // 8
    s2, d2 = src[:n2].copy(), np.empty(n2, dtype=np.int64)
    np.copyto(d2, s2)
    best = min(_t(lambda: [np.copyto(d2, s2) for _ in range(64)]) for _ in range(3))
    out["memcpy1p5"] = best
    # ALU: multiply-add on 256 KB
    n3 = (256 << 10) // 8
    a = np.arange(n3, dtype=np.uint64)
    b = np.empty(n3, dtype=np.uint64)

    def alu():
        for _ in range(256):
            np.multiply(a, np.uint64(0x9E3779B97F4A7C15), out=b)
            np.add(b, np.uint64(12345), out=b)

    alu()
    out["alu"] = min(_t(alu) for _ in range(3))
    # stream 30 MB sum
    n4 = (30 << 20) // 8
    s4 = np.arange(n4, dtype=np.uint64)
    s4.sum()
    out["stream30"] = min(_t(lambda: s4.sum()) for _ in range(3))
    return out


def _t(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _kernels(seed: int) -> dict:
    import numpy as np
    import pyarrow as pa

    from nem_mms_spark import framing
    from nem_mms_spark.datagen.webpages import generate_pages
    from nem_mms_spark.selector import ColumnContext, select_and_encode

    pdf = generate_pages(np.arange(seed * 16384, (seed + 1) * 16384))
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    cols = {}
    for name in tbl.column_names:
        arr = tbl.column(name).combine_chunks()
        values, dtype, *_r = framing.to_kernel(arr)
        cols[name] = (values, dtype, _r[-1])
    out = {}
    for rep in range(1 + REPS):  # rep 0 = warm
        for name, (values, dtype, nb) in cols.items():
            ctx = ColumnContext()
            t0 = time.perf_counter()
            select_and_encode(values, dtype, ctx)
            dt = time.perf_counter() - t0
            if rep:
                key = f"col:{name}"
                out[key] = min(out.get(key, 1e9), dt)
                out[f"mb:{name}"] = nb / 1e6
    return out


def _worker(seed: int, kind: str, q) -> None:
    try:
        os.sched_setaffinity(0, {seed % os.cpu_count()})
    except OSError:
        pass
    res = _controls(seed) if kind == "controls" else _kernels(seed)
    q.put(res)


def run_level(k: int, kind: str) -> dict:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(i, kind, q)) for i in range(k)]
    [p.start() for p in ps]
    res = [q.get() for _ in ps]
    [p.join() for p in ps]
    keys = res[0].keys()
    return {key: sum(r[key] for r in res) / len(res) for key in keys}


def main() -> None:
    results = {}
    for kind in ("controls", "kernels"):
        for k in (8, 32):
            results[(kind, k)] = run_level(k, kind)
    print(f"{'task':<22}{'K=8 (s)':>12}{'K=32 (s)':>12}{'eff 8->32':>12}")
    rows = {}
    for kind in ("controls", "kernels"):
        for key in results[(kind, 8)]:
            if key.startswith("mb:"):
                continue
            t8 = results[(kind, 8)][key]
            t32 = results[(kind, 32)][key]
            eff = t8 / t32  # perfect scaling => t32 == t8 => eff 1.0
            rows[key] = {"t8": round(t8, 4), "t32": round(t32, 4),
                         "eff": round(eff, 3)}
            print(f"{key:<22}{t8:>12.4f}{t32:>12.4f}{eff:>12.3f}")
    for key in results[("kernels", 8)]:
        if key.startswith("mb:"):
            rows[key] = round(results[("kernels", 8)][key], 2)
    print(json.dumps(rows))


if __name__ == "__main__":
    sys.exit(main())
