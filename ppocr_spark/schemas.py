"""Explicit StructTypes for every stage boundary.

The reference's schemas are fixed C++ structs (``cpp/include/utility.h:36-54``,
request/response envelopes ``cpp/src/task.cpp:61-212``); we declare — never
infer — the Spark equivalents (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Input: interleaved documents (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

SPAN = StructType(
    [
        StructField("kind", StringType(), False),       # 'text' | 'media'
        StructField("text", StringType(), True),        # kind='text' payload
        StructField("media_ref", StringType(), True),   # kind='media' key
        StructField("offset", IntegerType(), False),    # original order
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN, False), False),
    ]
)

# media side table: media_ref -> PNG bytes (+ generation-time ground truth,
# test-only, never read by the pipeline)
MEDIA_TRUTH = StructType(
    [
        StructField("text", StringType(), False),
        StructField("box", ArrayType(ArrayType(IntegerType(), False), False), False),
    ]
)

MEDIA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("content", BinaryType(), True),
        StructField("truth", ArrayType(MEDIA_TRUTH, False), True),
    ]
)

# ---------------------------------------------------------------------------
# Per-box OCR record — OCRPredictResult (cpp/include/utility.h:36-43)
# box: 4x2 int quad clockwise from top-left (postprocess_op.cpp:82-99)
# sentinels match the reference: score=-1.0, cls_label=-1
# ---------------------------------------------------------------------------

BOX = ArrayType(ArrayType(IntegerType(), False), False)

OCR_RECORD = StructType(
    [
        StructField("box", BOX, False),
        StructField("text", StringType(), False),
        StructField("score", FloatType(), False),
        StructField("cls_label", IntegerType(), True),
        StructField("cls_score", FloatType(), True),
        StructField("end", StringType(), True),  # tbpu separator (tbpu.py:13-22)
    ]
)

# ---------------------------------------------------------------------------
# Stage-boundary frames (mapInPandas input/output schemas)
# ---------------------------------------------------------------------------

# exploded media span, pre-detect
MEDIA_REQUEST = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("media_ref", StringType(), True),
        StructField("content", BinaryType(), True),
    ]
)

# det output: one row per media span, boxes packed as flat int arrays
# (8 ints per box, x0 y0 x1 y1 x2 y2 x3 y3) to stay Arrow-friendly
DETECTED = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("media_ref", StringType(), True),
        StructField("code", IntegerType(), False),
        StructField("boxes", ArrayType(ArrayType(IntegerType(), False), False), True),
        StructField("crops", ArrayType(BinaryType(), False), True),  # PNG per box
    ]
)

# rec/cls output: one row per media span with per-box parallel arrays
RECOGNIZED = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("media_ref", StringType(), True),
        StructField("code", IntegerType(), False),
        StructField("boxes", ArrayType(ArrayType(IntegerType(), False), False), True),
        StructField("texts", ArrayType(StringType(), False), True),
        StructField("scores", ArrayType(FloatType(), False), True),
        StructField("cls_labels", ArrayType(IntegerType(), False), True),
        StructField("cls_scores", ArrayType(FloatType(), False), True),
    ]
)

# layout (tbpu) output: adds per-box `end` separators and final text assembly
LAID_OUT = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("offset", IntegerType(), False),
        StructField("media_ref", StringType(), True),
        StructField("code", IntegerType(), False),
        StructField("boxes", ArrayType(ArrayType(IntegerType(), False), False), True),
        StructField("texts", ArrayType(StringType(), False), True),
        StructField("scores", ArrayType(FloatType(), False), True),
        StructField("ends", ArrayType(StringType(), False), True),
        StructField("assembled", StringType(), True),  # concat(text+end per box)
    ]
)

# ---------------------------------------------------------------------------
# Output: reassembled interleaved documents — span-sequence equality target
# (kind, text, media_ref, order) per FIXTURES.md F3
# ---------------------------------------------------------------------------

RESULT_SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("order", IntegerType(), False),
        StructField("code", IntegerType(), False),
    ]
)

RESULTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(RESULT_SPAN, False), False),
    ]
)

# ---------------------------------------------------------------------------
# Checkpoint manifest (north_rule: per-partition lineage + metrics)
# ---------------------------------------------------------------------------

MANIFEST = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("input_fingerprint", StringType(), False),
        StructField("doc_count", IntegerType(), False),
        StructField("span_count", IntegerType(), False),
        StructField("box_count", IntegerType(), False),
        StructField("status", StringType(), False),  # 'complete'
    ]
)
