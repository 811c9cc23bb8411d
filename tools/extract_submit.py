"""spark-submit driver for the extraction pipeline (north-rule packaging):

    spark-submit --py-files dist/ppocr_spark.zip tools/extract_submit.py \
        --documents /path/documents_spans.parquet \
        --media /path/media.parquet \
        --output /path/results.parquet \
        [--resumable] [--no-broadcast-media] \
        [--parser multi_para] [--html-strip off|strip|main] \
        [--salt-buckets 8] [--compact-target-mb 256]

Reads the interleaved documents + media tables, runs
detect→classify→recognize→layout with salted reassembly, writes the
per-document span results, and (with --resumable) writes bucketed results
+ per-bucket manifests under --output, resuming from completed buckets on
rerun. The engine code arrives on executors via the --py-files zip; no
repo checkout is needed cluster-side.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--media", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--resumable", action="store_true")
    ap.add_argument("--no-broadcast-media", action="store_true")
    ap.add_argument("--parser", default="multi_para")
    ap.add_argument("--html-strip", default="off",
                    choices=["off", "strip", "main"])
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument(
        "--compact-target-mb", type=int, default=0,
        help="after a --resumable run, re-pack each bucket partition to "
        "~this file size (0 = skip); long resumed runs otherwise "
        "accumulate task-count small files per bucket",
    )
    args = ap.parse_args()

    # imports AFTER argparse: on executors this module is not imported at
    # all; on the driver, pyspark must come from the spark-submit runtime
    from pyspark.sql import SparkSession

    from ppocr_spark.config import PPOCRConfig
    from ppocr_spark.pipeline import extract_documents, warm_workers

    spark = SparkSession.builder.appName("ppocr-extract").getOrCreate()
    cfg = PPOCRConfig(
        cls=True,
        use_angle_cls=True,
        parser=args.parser,
        html_strip=args.html_strip,
        doc_salt_buckets=args.salt_buckets,
    )
    docs = spark.read.parquet(args.documents)
    media = spark.read.parquet(args.media)
    warm_workers(spark)

    if args.resumable:
        from ppocr_spark.checkpoint import run_resumable

        stats = run_resumable(
            spark,
            docs,
            media,
            out_dir=args.output,
            cfg=cfg,
            broadcast_media=not args.no_broadcast_media,
        )
        print(f"resumable run: {stats}")
        if args.compact_target_mb > 0:
            from ppocr_spark.checkpoint import compact_results

            cstats = compact_results(
                spark, args.output,
                target_bytes=args.compact_target_mb << 20,
            )
            print(f"compaction: {cstats}")
    else:
        from ppocr_spark.pipeline import (
            make_stage_metrics,
            snapshot_stage_metrics,
        )

        metrics = make_stage_metrics(spark)
        out = extract_documents(
            docs, media, cfg,
            broadcast_media=not args.no_broadcast_media,
            metrics=metrics,
        )
        out.write.mode("overwrite").parquet(args.output)
        print(f"stage_ms: {snapshot_stage_metrics(metrics)}")
    spark.stop()


if __name__ == "__main__":
    main()
