"""Pure-compute resident probe: the frequency/scheduling floor.

Each of N barrier-synced processes runs an L1-resident loop (64x64
matmul, 32 KB working set — no LLC/DRAM pressure by construction) and
reports iterations/s. Per-process slowdown at 32 residents vs solo
bounds what NO working-set reduction can recover: all-core frequency
licensing plus co-tenant time-slicing. Compare against
tools/stream_probe.py (the bandwidth ceiling) and
tools/resident_probe.py (the real kernel): if kernel inflation at 32
residents ~= the compute floor, the 8->32 scaling residual is not a
code working set at all.

    RESIDENTS=1,8,32 python tools/compute_probe.py
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


def _worker(reps: int, barrier, out_q) -> None:
    import numpy as np

    a = np.random.default_rng(0).random((64, 64))
    b = np.random.default_rng(1).random((64, 64))
    c = a @ b  # warm: BLAS init, code paging
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(reps):
        c = a @ b
        a = c * 1e-3 + a * 0.999  # keep values bounded, defeat CSE
    dt = time.perf_counter() - t0
    out_q.put(reps / dt)


def run_level(n: int, reps: int) -> dict:
    barrier = mp.Barrier(n)
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(reps, barrier, q))
        for _ in range(n)
    ]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return {
        "residents": n,
        "iters_per_s_per_proc": round(sum(rates) / len(rates), 1),
    }


def main() -> None:
    levels = [
        int(x) for x in os.environ.get("RESIDENTS", "1,8,32").split(",")
    ]
    reps = int(os.environ.get("COMPUTE_REPS", "20000"))
    results = []
    for n in levels:
        r = run_level(n, reps)
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]["iters_per_s_per_proc"]
    print(json.dumps({
        "summary": {
            str(r["residents"]): {
                "iters_per_s_per_proc": r["iters_per_s_per_proc"],
                "slowdown_vs_first": round(
                    base / r["iters_per_s_per_proc"], 3
                ),
            }
            for r in results
        }
    }))


if __name__ == "__main__":
    sys.exit(main())
