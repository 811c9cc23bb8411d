"""Spark-free resident-contention probe: per-span kernel cost vs the
number of co-resident workers on this box.

The 8→32 scaling residual is in-UDF per-span inflation (LLC/DRAM
contention, BENCH/BASELINE.md); this tool measures that inflation curve
directly, with zero Spark in the loop: N barrier-synced processes each
run ``pipeline._ocr_one`` (BLAS=1, matching executor env) over the same
payload slice, and the probe reports aggregate spans/s and per-span ms
at each N. Inflation(N) = ms_per_span(N) / ms_per_span(1). If the curve
tracks a bandwidth model (flat until aggregate demand nears DRAM
bandwidth, then linear in N), the residual is a hardware floor, not a
code lever.

    RESIDENTS=1,2,4,8,16,32 PROBE_SPANS=120 python tools/resident_probe.py

Prints one JSON line per level plus a summary line.
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(payloads, barrier, out_q):
    from ppocr_spark.config import PPOCRConfig
    from ppocr_spark.pipeline import _ocr_one

    cfg = PPOCRConfig()
    for p in payloads[:5]:  # template bank + numpy first-touch
        _ocr_one(p, cfg)
    barrier.wait()
    t0 = time.perf_counter()
    for p in payloads:
        _ocr_one(p, cfg)
    out_q.put((len(payloads), time.perf_counter() - t0))


def run_level(n: int, payloads: list, repeats: int) -> dict:
    best = None
    for _ in range(repeats):
        barrier = mp.Barrier(n)
        q: mp.Queue = mp.Queue()
        procs = [
            mp.Process(target=_worker, args=(payloads, barrier, q))
            for _ in range(n)
        ]
        for p in procs:
            p.start()
        done = [q.get() for _ in procs]
        for p in procs:
            p.join()
        spans = sum(d[0] for d in done)
        wall = max(d[1] for d in done)
        ms = wall * 1000 * n / spans  # per-span cost per worker
        if best is None or ms < best["ms_per_span"]:
            best = {
                "residents": n,
                "spans_total": spans,
                "wall_s": round(wall, 2),
                "agg_spans_per_s": round(spans / wall, 1),
                "ms_per_span": round(ms, 2),
            }
    return best


def main() -> None:
    import pyarrow.parquet as pq

    from ppocr_spark.corpus import ensure_corpus

    levels = [
        int(x)
        for x in os.environ.get("RESIDENTS", "1,8,32").split(",")
    ]
    n_spans = int(os.environ.get("PROBE_SPANS", "120"))
    repeats = int(os.environ.get("PROBE_REPEATS", "2"))
    corpus = ensure_corpus(int(os.environ.get("SCALING_DOCS", "12800")))
    media = pq.read_table(os.path.join(corpus, "media.parquet")).to_pylist()
    payloads = [m["content"] for m in media if m["content"]][:n_spans]

    results = []
    for n in levels:
        r = run_level(n, payloads, repeats)
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]["ms_per_span"]
    print(json.dumps({
        "summary": {
            str(r["residents"]): {
                "ms_per_span": r["ms_per_span"],
                "inflation_vs_first": round(r["ms_per_span"] / base, 3),
            }
            for r in results
        }
    }))


if __name__ == "__main__":
    main()
