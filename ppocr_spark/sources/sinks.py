"""Sinks (K1-K5 in SURVEY.md §2.1).

K1  JSON result sink — the reference's response envelope
    ``{"code": int, "data": [{text, score, box[4][2]} ...]}``
    (get_ocr_result_json, cpp/src/task.cpp:61-108) as a JVM `to_json`
    expression over the typed block columns. The empty-text/score<=0
    filters already ran inside the pipeline (K1 contract).
K2  status sink — the ``code`` column itself; error rows carry
    ``{"code": c, "data": "<message>"}``.
K3  ascii-escape — optional \\uXXXX escaping of non-ASCII
    (Task::json_dump, cpp/src/task.cpp:22-37). Implemented as a tiny
    deterministic post-pass (`ensure_ascii_json`) used by clients that
    need the reference's exact byte stream; the engine keeps typed columns.
K5  metrics sink — per-run counts via the checkpoint manifest
    (ppocr_spark/checkpoint.py) instead of the reference's AutoLogger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ppocr_spark.status import SUCCESS_CODES, StatusCode, state_message


def response_envelope(ocr: DataFrame) -> DataFrame:
    """Per media span → (doc_id, offset, media_ref, response:string JSON),
    reproducing the reference's one-answer-per-request contract."""
    block = F.expr(
        """
        to_json(named_struct(
          'code', code,
          'data', CASE WHEN code = 100 THEN
            transform(arrays_zip(texts, scores, boxes), z ->
              named_struct(
                'text', z.texts,
                'score', z.scores,
                'box', transform(sequence(0, 3), i ->
                         array(z.boxes[i*2], z.boxes[i*2+1]))
              ))
            ELSE NULL END
        ))
        """
    )
    return ocr.select("doc_id", "offset", "media_ref", block.alias("response"))


def error_envelope(code_col: F.Column) -> F.Column:
    """K2: {"code": c, "data": msg} for non-success codes."""
    mapping = F.create_map(
        *[
            x
            for c in StatusCode
            for x in (F.lit(int(c)), F.lit(state_message(c)))
        ]
    )
    return F.to_json(
        F.struct(code_col.alias("code"), mapping[code_col].alias("data"))
    )


def ensure_ascii_json(s: str) -> str:
    """K3: escape non-ASCII as \\uXXXX (surrogate pairs for astral chars),
    byte-compatible with the reference's ensure_ascii output."""
    out = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x80:
            out.append(ch)
        elif cp <= 0xFFFF:
            out.append(f"\\u{cp:04x}")
        else:
            cp -= 0x10000
            out.append(f"\\u{0xD800 + (cp >> 10):04x}")
            out.append(f"\\u{0xDC00 + (cp & 0x3FF):04x}")
    return "".join(out)


def write_results(results: DataFrame, path: str, partition_cols=("bucket",)):
    """Typed results sink: parquet partitioned for downstream pruning.
    (Iceberg `writeTo(...).append()` when a catalog is configured.)"""
    cols = [c for c in partition_cols if c in results.columns]
    w = results.write.mode("append")
    if cols:
        w = w.partitionBy(*cols)
    w.parquet(path)


__all__ = [
    "SUCCESS_CODES",
    "ensure_ascii_json",
    "error_envelope",
    "response_envelope",
    "write_results",
]
