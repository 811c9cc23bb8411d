"""Repo-wide physical-plan hygiene audit.

Builds every ``__spark_entry__.queries()`` plan at sf0.001 and flags
scale-hostile nodes: BroadcastNestedLoopJoin, CartesianProduct, and
BatchEvalPython (row-at-a-time Python). Exits non-zero on any flag
outside the whitelist below, so a new query with an accidental
nested-loop join fails loudly instead of hiding among 65 green values.

Whitelisted flags (each deliberate, each documented at the source):

- 1-row constant attach: ``text_bm25_topk`` / ``text_tfidf_terms`` /
  ``clean_corpus_stats`` / ``text_quality_tiers`` crossJoin a single
  aggregated stats row (tier boundaries, corpus totals) onto
  the stream — Spark plans a BroadcastNestedLoopJoin whose build side is
  ONE row, i.e. a map, not a quadratic join.
- labeled baselines: ``dedup_embedding_cosine`` and
  ``ann_topk_bruteforce`` are the documented all-pairs / brute-force
  recall baselines the LSH/IVF paths are checked against; their
  nested-loop shape is the point, and their docstrings say so.

Run: python tools/plan_audit.py   (~2 min)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGS = ("BroadcastNestedLoopJoin", "CartesianProduct", "BatchEvalPython")

WHITELIST: dict[str, set[str]] = {
    "sample_mix_sources": {"BroadcastNestedLoopJoin"},  # 1-row ΣW attach
    "text_bm25_topk": {"BroadcastNestedLoopJoin"},
    "text_tfidf_terms": {"BroadcastNestedLoopJoin"},
    "clean_corpus_stats": {"BroadcastNestedLoopJoin"},
    "text_quality_tiers": {"BroadcastNestedLoopJoin"},
    "dedup_embedding_cosine": {"BroadcastNestedLoopJoin"},
    "ann_topk_bruteforce": {"BroadcastNestedLoopJoin"},
    # recall eval's ground-truth side IS the brute-force all-pairs scan
    # (that is what makes it exact); the IVF side and the recall join
    # itself are hash joins on slim id pairs.
    "ann_recall_eval": {"BroadcastNestedLoopJoin"},
    # same exact-ground-truth brute-force side, swept over n_probe
    "ann_probe_sweep": {"BroadcastNestedLoopJoin"},
    # label propagation scores the small labeled probe set against the
    # corpus via brute_force_topk — the same deliberate exact-scoring
    # BNLJ as ann_topk_bruteforce; the vote path is hash joins only.
    "knn_classify": {"BroadcastNestedLoopJoin"},
    # 1-row summary + 1-row exact-count attaches onto the ≤256-row
    # register table (the whitelisted constant-attach pattern).
    "distinct_hll": {"BroadcastNestedLoopJoin"},
    # 1-row grand-total attach onto the 20-row top-k table
    "key_skew_report": {"BroadcastNestedLoopJoin"},
    # 1-row total attach onto the 168-cell seasonality table
    "events_seasonality": {"BroadcastNestedLoopJoin"},
    # 1-row τ (boundary-priority) attach onto the k-row sample
    "sample_priority_weighted": {"BroadcastNestedLoopJoin"},
    # per-iteration 1-row n / dangling-mass attaches onto the slim rank
    # relation (the constant-attach pattern; the rank propagation itself
    # is hash equi-joins + map-side-combinable sums)
    "dedup_pagerank": {"BroadcastNestedLoopJoin"},
    # per-iteration 1-row max-|w| normalizer attach onto the 64-row
    # loading vector (constant-attach pattern; the Gram matvec is a
    # hash equi-join + 4096-key sum)
    "embeddings_pca_power": {"BroadcastNestedLoopJoin"},
    # |sources|² pair join over the per-group SKETCH table (the overlap
    # matrix IS the output); corpus rows never enter the pair join
    "source_overlap_minhash": {"BroadcastNestedLoopJoin"},
    # same |sources|² matrix-is-the-output class: the pair universe is
    # a sizes × sizes inequality join over the tiny dimension table
    "source_overlap_exact": {"BroadcastNestedLoopJoin"},
}


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from ppocr_spark import cache

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("plan-audit")
        .getOrCreate()
    )
    sf_dir = os.environ.get("PLAN_AUDIT_SF_DIR", "/root/testdata/sf0.001")
    failures: list[str] = []
    for name, fn in entry.queries().items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            hits = {m for m in FLAGS if m in plan}
        except Exception as ex:  # plan construction itself failed
            failures.append(f"{name}: ERROR {type(ex).__name__}: {ex}")
            cache.release_all()
            continue
        unexpected = hits - WHITELIST.get(name, set())
        status = "ok"
        if unexpected:
            failures.append(f"{name}: {sorted(unexpected)}")
            status = "FLAGGED " + ",".join(sorted(unexpected))
        elif hits:
            status = "ok (whitelisted " + ",".join(sorted(hits)) + ")"
        print(f"{status:44s} {name}", flush=True)
        cache.release_all()
    if failures:
        print(f"\n{len(failures)} PLAN FAILURES:")
        for f in failures:
            print("  " + f)
        return 1
    print("\nall plans clean (whitelist applied)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
