"""Checkpoint/resume semantics: a second invocation recomputes nothing;
a changed input slice invalidates only its bucket (lineage guard)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ppocr_spark.checkpoint import run_resumable
from ppocr_spark.config import PPOCRConfig


def test_resume_skips_completed(spark, small_corpus, tmp_path):
    docs = spark.read.parquet(f"{small_corpus}/documents_spans.parquet")
    media = spark.read.parquet(f"{small_corpus}/media.parquet")
    cfg = PPOCRConfig(cls=True, use_angle_cls=True)
    out = str(tmp_path / "run")

    s1 = run_resumable(spark, docs, media, out, cfg, n_buckets=8,
                       broadcast_media=True)
    assert s1["buckets_run"] > 0

    # K5 stage metrics: the run snapshot and manifest rows carry per-stage
    # wall-ms (AutoLogger analog) — real OCR work must show nonzero
    # det/rec time and a span count
    assert s1["stage_ms"]["det_ms"] > 0
    assert s1["stage_ms"]["rec_ms"] > 0
    assert s1["stage_ms"]["ocr_spans"] > 0
    man = spark.read.parquet(f"{out}/manifest")
    assert "run_det_ms" in man.columns
    assert man.agg(F.max("run_det_ms")).collect()[0][0] > 0

    s2 = run_resumable(spark, docs, media, out, cfg, n_buckets=8,
                       broadcast_media=True)
    assert s2["buckets_run"] == 0
    assert s2["buckets_skipped"] == 8

    # results complete & unique per doc
    res = spark.read.parquet(f"{out}/results")
    assert res.count() == docs.count()
    assert res.select("doc_id").distinct().count() == docs.count()

    # lineage guard: a new doc lands in some bucket → only that bucket reruns
    extra = docs.limit(1).withColumn(
        "doc_id", F.concat(F.col("doc_id"), F.lit("_v2"))
    )
    docs2 = docs.unionByName(extra)
    s3 = run_resumable(spark, docs2, media, out, cfg, n_buckets=8,
                       broadcast_media=True)
    assert 1 <= s3["buckets_run"] <= 2

    # EXACTLY-ONCE after the invalidated-bucket re-run: the bucket's
    # pre-existing docs must not be duplicated by the recompute (dynamic
    # partition overwrite replaces the partition; append would double it)
    res3 = spark.read.parquet(f"{out}/results")
    assert res3.count() == docs2.count()
    assert res3.select("doc_id").distinct().count() == docs2.count()


def test_kill_between_results_and_manifest(spark, small_corpus, tmp_path):
    """Simulate a kill AFTER the results write but BEFORE the manifest
    write: results exist on disk, no manifest row marks them complete.
    The resume must recompute those buckets WITHOUT duplicating rows."""
    import shutil

    docs = spark.read.parquet(f"{small_corpus}/documents_spans.parquet")
    media = spark.read.parquet(f"{small_corpus}/media.parquet")
    cfg = PPOCRConfig(cls=True, use_angle_cls=True)
    out = str(tmp_path / "run")

    run_resumable(spark, docs, media, out, cfg, n_buckets=8,
                  broadcast_media=True)
    # the kill: manifest never landed, results did
    shutil.rmtree(f"{out}/manifest")

    s2 = run_resumable(spark, docs, media, out, cfg, n_buckets=8,
                       broadcast_media=True)
    assert s2["buckets_run"] > 0  # nothing was marked complete

    res = spark.read.parquet(f"{out}/results")
    assert res.count() == docs.count()
    assert res.select("doc_id").distinct().count() == docs.count()


class TestCompaction:
    def _write_fragmented(self, spark, path, buckets=4, files_per=6,
                          rows_per=120):
        rows = [
            (f"d{b}_{i}", b, "x" * 64)
            for b in range(buckets)
            for i in range(rows_per)
        ]
        df = spark.createDataFrame(
            rows, "doc_id string, bucket int, payload string"
        )
        df.repartition(files_per).write.partitionBy("bucket").parquet(
            f"{path}/results"
        )
        return df

    def test_compacts_to_target_and_preserves_rows(self, spark, tmp_path):
        from ppocr_spark.checkpoint import _bucket_file_stats, compact_results

        out = str(tmp_path / "sink")
        df = self._write_fragmented(spark, out)
        before = _bucket_file_stats(spark, f"{out}/results")
        assert all(n > 1 for n, _ in before.values())
        orig = {
            (r.doc_id, r.bucket, r.payload)
            for r in spark.read.parquet(f"{out}/results").collect()
        }

        stats = compact_results(spark, out, target_bytes=1 << 30)
        assert stats["buckets_compacted"] == 4
        assert stats["files_after"] < stats["files_before"]
        after = _bucket_file_stats(spark, f"{out}/results")
        assert all(n == 1 for n, _ in after.values())
        got = {
            (r.doc_id, r.bucket, r.payload)
            for r in spark.read.parquet(f"{out}/results").collect()
        }
        assert got == orig

        # idempotent: second pass is a no-op
        again = compact_results(spark, out, target_bytes=1 << 30)
        assert again["buckets_compacted"] == 0

    def test_kill_mid_swap_is_recovered(self, spark, tmp_path):
        """Simulate every kill point of the journaled swap and assert the
        next compact_results call restores a complete sink first."""
        import shutil
        import os as _os

        from ppocr_spark.checkpoint import compact_results

        out = str(tmp_path / "sink")
        self._write_fragmented(spark, out, buckets=3)
        orig = {
            (r.doc_id, r.bucket, r.payload)
            for r in spark.read.parquet(f"{out}/results").collect()
        }
        res0 = f"{out}/results/bucket=0"
        res1 = f"{out}/results/bucket=1"

        # kill point A: staged + journaled, original moved to trash, staged
        # copy NOT yet renamed in (bucket missing from results/)
        _os.makedirs(f"{out}/_compact_journal", exist_ok=True)
        open(f"{out}/_compact_journal/bucket=0", "w").close()
        _os.makedirs(f"{out}/_compact_staging", exist_ok=True)
        shutil.move(res0, f"{out}/_compact_staging/bucket=0")
        stats = compact_results(spark, out, target_bytes=1 << 30)
        assert stats["recovered"] == 1
        got = {
            (r.doc_id, r.bucket, r.payload)
            for r in spark.read.parquet(f"{out}/results").collect()
        }
        assert got == orig  # nothing lost, compaction completed

        # kill point B: journaled, original renamed to trash, no staged
        # copy reached disk for that bucket -> original restored
        _os.makedirs(f"{out}/_compact_journal", exist_ok=True)
        open(f"{out}/_compact_journal/bucket=1", "w").close()
        _os.makedirs(f"{out}/_compact_trash", exist_ok=True)
        shutil.move(res1, f"{out}/_compact_trash/bucket=1")
        stats = compact_results(spark, out, target_bytes=1 << 30)
        assert stats["recovered"] == 1
        got = {
            (r.doc_id, r.bucket, r.payload)
            for r in spark.read.parquet(f"{out}/results").collect()
        }
        assert got == orig

    def test_untouched_buckets_keep_their_files(self, spark, tmp_path):
        import os as _os

        from ppocr_spark.checkpoint import compact_results

        out = str(tmp_path / "sink")
        self._write_fragmented(spark, out, buckets=3)
        # bucket 99 is already one file: must not be rewritten
        spark.createDataFrame(
            [("solo", 99, "y")], "doc_id string, bucket int, payload string"
        ).coalesce(1).write.mode("append").partitionBy("bucket").parquet(
            f"{out}/results"
        )
        solo_dir = f"{out}/results/bucket=99"
        files_before = sorted(
            f for f in _os.listdir(solo_dir) if f.endswith(".parquet")
        )
        compact_results(spark, out, target_bytes=1 << 30)
        files_after = sorted(
            f for f in _os.listdir(solo_dir) if f.endswith(".parquet")
        )
        assert files_after == files_before

    def test_failed_rename_raises_before_any_cleanup(self, tmp_path):
        """HDFS FileSystem.rename signals many failures by returning False
        (dest exists from a concurrent compactor, missing parent) — an
        unchecked swap would then delete trash+staging, destroying the
        only complete copies. Every swap/recovery rename must go through
        _rename_or_raise, which raises on a False return."""
        import pytest

        from ppocr_spark.checkpoint import _rename_or_raise

        class FalseRenameFS:
            deleted = []

            def rename(self, src, dst):
                return False

            def delete(self, p, rec):  # pragma: no cover - must not run
                self.deleted.append(p)

        fs = FalseRenameFS()
        with pytest.raises(RuntimeError, match="rename failed"):
            _rename_or_raise(fs, "a", "b", "swap-out bucket=0")
        assert fs.deleted == []

    def test_swap_and_recovery_renames_are_all_checked(self):
        """Source-level invariant: no bare fs.rename( remains in
        checkpoint.py outside _rename_or_raise itself."""
        import inspect

        import ppocr_spark.checkpoint as cp

        src = inspect.getsource(cp)
        bare = [
            ln for ln in src.splitlines()
            if "fs.rename(" in ln and "_rename_or_raise" not in ln
            and "if not fs.rename" not in ln
        ]
        assert bare == [], f"unchecked renames: {bare}"


def test_lineage_aba_reverted_input_recomputes(spark, small_corpus, tmp_path):
    """A-B-A staleness guard: input X → Y → X again. The manifest is
    append-only, so a historical (bucket, fp_X) row exists when run 3
    sees X — but the results on disk hold Y's data. completed_buckets
    must compare against each bucket's LATEST row only, forcing the
    reverted bucket to recompute (the old any-row match silently served
    Y's results as X's)."""
    docs = spark.read.parquet(f"{small_corpus}/documents_spans.parquet")
    media = spark.read.parquet(f"{small_corpus}/media.parquet")
    cfg = PPOCRConfig(cls=True, use_angle_cls=True)
    out = str(tmp_path / "run")

    run_resumable(spark, docs, media, out, cfg, n_buckets=8,
                  broadcast_media=True)  # X

    extra = docs.limit(1).withColumn(
        "doc_id", F.concat(F.col("doc_id"), F.lit("_aba"))
    )
    docs_y = docs.unionByName(extra)
    s_y = run_resumable(spark, docs_y, media, out, cfg, n_buckets=8,
                        broadcast_media=True)  # Y: the extra doc's bucket
    assert s_y["buckets_run"] >= 1

    s_x = run_resumable(spark, docs, media, out, cfg, n_buckets=8,
                        broadcast_media=True)  # back to X
    assert s_x["buckets_run"] >= 1  # the old any-row match skipped ALL
    res = spark.read.parquet(f"{out}/results")
    assert res.count() == docs.count()  # Y's extra doc gone from results
    assert res.filter(F.col("doc_id").endswith("_aba")).count() == 0
