#!/usr/bin/env python
"""Measured DRAM-bandwidth bound for the single-box scaling proxy.

The 2↔8-core scaling pair shares ONE memory controller: if k pinned
threads saturate the socket's streaming bandwidth, a memory-bound stage
cannot scale past aggregate-BW/per-core-BW regardless of engine quality
— that ceiling is a property of the box, not the engine, and a real
N→4N cluster (each node brings its own memory controllers) does not
have it.  This probe measures it directly so BENCH/BASELINE.md can
state the bound instead of hand-waving it.

Kernel: numpy copy (y[:] = x) over arrays far larger than LLC — 2 reads
+ 1 write per element stream (write-allocate), the same access pattern
as a shuffle spill/scan.  Each worker is pinned to its own core on the
same core range the scaling legs use (top of the host range).

Prints one JSON line:
  {"per_thread_gbs": {1: ..., 2: ..., 4: ..., 8: ...},
   "aggregate_gbs": {...}, "bw_scaling_2_to_8": r,
   "membound_efficiency_ceiling_2_to_8": r/4 normalized}

Usage: python scripts/membw_probe.py [max_threads] [seconds_per_level]
Run ONLY on a quiet host (it is itself a load source); never during a
scaling leg.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

ARR_MB = 512  # per worker, 3 streams × 512 MB >> any LLC


def _worker(core: int, seconds: float, q: mp.Queue) -> None:
    os.sched_setaffinity(0, {core})
    import numpy as np

    n = ARR_MB * 1024 * 1024 // 8
    x = np.ones(n, dtype=np.float64)
    y = np.empty_like(x)
    # warm page tables + first-touch allocation on the pinned core
    y[:] = x
    reps = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        y[:] = x
        reps += 1
    dt = time.perf_counter() - t0
    # copy moves read(x) + write-allocate read(y) + write(y) ≈ 3 streams;
    # report the conventional 2-stream (read+write) figure so numbers
    # are comparable to STREAM-copy conventions
    gb = reps * (2 * n * 8) / 1e9
    q.put(gb / dt)


def measure(nthreads: int, seconds: float) -> dict:
    n_host = os.cpu_count() or 32
    cores = list(range(n_host - nthreads, n_host))  # same range as the legs
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(c, seconds, q)) for c in cores
    ]
    for p in procs:
        p.start()
    rates = [q.get(timeout=seconds * 20 + 60) for _ in procs]
    for p in procs:
        p.join()
    return {"per_thread": rates, "aggregate": sum(rates)}


def main() -> None:
    max_t = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    levels = [t for t in (1, 2, 4, 8, 16) if t <= max_t]
    agg = {}
    per = {}
    for t in levels:
        r = measure(t, secs)
        agg[t] = round(r["aggregate"], 2)
        per[t] = round(r["aggregate"] / t, 2)
    out = {"arr_mb": ARR_MB, "aggregate_gbs": agg, "per_thread_gbs": per}
    if 2 in agg and 8 in agg:
        bw_scale = agg[8] / agg[2]  # ideal = 4.0
        out["bw_scaling_2_to_8"] = round(bw_scale, 3)
        # a PERFECTLY memory-bound stage scales exactly with aggregate
        # bandwidth: efficiency ceiling = (T2/T8)/4 = bw_scale/4
        out["membound_efficiency_ceiling_2_to_8"] = round(bw_scale / 4, 3)
    if 1 in agg and 4 in agg:
        out["bw_scaling_1_to_4"] = round(agg[4] / agg[1], 3)
        out["membound_efficiency_ceiling_1_to_4"] = round(agg[4] / agg[1] / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
