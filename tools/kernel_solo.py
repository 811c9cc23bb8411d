"""Solo per-span kernel timing — the authoritative single-thread number
next to the 8→32 pair (CLAUDE.md measurement discipline / VERDICT r3 #9).

Runs ``pipeline._ocr_one`` over the first N media payloads of the cached
scaling corpus in ONE process with BLAS pinned to 1 thread (matching the
executor environment), best-of-k over interleaved passes, and prints one
JSON line:

    SOLO_SPANS=200 SOLO_REPEATS=3 python tools/kernel_solo.py

Record the result WITH the same-session 32-core probe (scaling_run --one)
so every kernel number carries its window context — the band tracks host
load more than code.
"""

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyarrow.parquet as pq

    from ppocr_spark.config import PPOCRConfig
    from ppocr_spark.corpus import ensure_corpus
    from ppocr_spark.pipeline import _ocr_one

    n_spans = int(os.environ.get("SOLO_SPANS", "200"))
    repeats = int(os.environ.get("SOLO_REPEATS", "3"))
    corpus = ensure_corpus(int(os.environ.get("SCALING_DOCS", "12800")))
    media = pq.read_table(os.path.join(corpus, "media.parquet")).to_pylist()
    payloads = [m["content"] for m in media[:n_spans] if m["content"]]
    cfg = PPOCRConfig()

    # warmup (template bank load, numpy first-touch)
    for p in payloads[:5]:
        _ocr_one(p, cfg)

    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for p in payloads:
            _ocr_one(p, cfg)
        walls.append(time.perf_counter() - t0)

    best = min(walls)
    print(json.dumps({
        "spans": len(payloads),
        "repeats": repeats,
        "ms_per_span_best": round(best * 1000 / len(payloads), 2),
        "ms_per_span_all": [round(w * 1000 / len(payloads), 2)
                            for w in walls],
    }))


if __name__ == "__main__":
    main()
