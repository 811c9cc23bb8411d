"""STREAM-triad bandwidth probe: the hardware ceiling the resident curve
is compared against.

N barrier-synced processes each run a memory-bound triad
(a = b + 0.5*c over arrays far larger than L2) and report per-process
and aggregate GB/s. If the OCR kernel's per-span inflation at 32
residents (tools/resident_probe.py) matches the triad's per-process
slowdown at 32 residents, the in-UDF inflation is the box's shared
memory system, not a code working-set problem.

    RESIDENTS=1,8,32 python tools/stream_probe.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

MB = 1 << 20


def _worker(n_mb: int, reps: int, barrier, out_q):
    import numpy as np

    n = n_mb * MB // 8
    b = np.random.default_rng(1).random(n)
    c = np.random.default_rng(2).random(n)
    a = np.empty_like(b)
    # warm (page-touch all three)
    np.add(b, c, out=a)
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(reps):
        np.multiply(c, 0.5, out=a)
        a += b
    dt = time.perf_counter() - t0
    # numpy can't fuse: this is TWO passes, not one triad —
    #   pass 1: read c, write a (+RFO read of a)        ≈ 3 streams
    #   pass 2: read a, read b, write a (no extra RFO)  = 3 streams
    # `triad` keeps the classic 4-stream convention (comparable to the
    # r5 recorded runs); `traffic` is the actual ~6-stream movement.
    out_q.put((reps * 4 * n * 8 / dt, reps * 6 * n * 8 / dt))


def run_level(n: int, n_mb: int, reps: int) -> dict:
    barrier = mp.Barrier(n)
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(n_mb, reps, barrier, q))
        for _ in range(n)
    ]
    for p in procs:
        p.start()
    pairs = [q.get() for _ in procs]
    for p in procs:
        p.join()
    triad = [t for t, _ in pairs]
    traffic = [t for _, t in pairs]
    return {
        "residents": n,
        "per_proc_gb_s": round(sum(triad) / len(triad) / 1e9, 2),
        "aggregate_gb_s": round(sum(triad) / 1e9, 2),
        "aggregate_traffic_gb_s": round(sum(traffic) / 1e9, 2),
    }


def main() -> None:
    levels = [
        int(x) for x in os.environ.get("RESIDENTS", "1,8,32").split(",")
    ]
    n_mb = int(os.environ.get("STREAM_MB", "64"))
    reps = int(os.environ.get("STREAM_REPS", "8"))
    results = []
    for n in levels:
        r = run_level(n, n_mb, reps)
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]["per_proc_gb_s"]
    print(json.dumps({
        "summary": {
            str(r["residents"]): {
                "per_proc_gb_s": r["per_proc_gb_s"],
                "slowdown_vs_first": round(base / r["per_proc_gb_s"], 3),
            }
            for r in results
        }
    }))


if __name__ == "__main__":
    sys.exit(main())
