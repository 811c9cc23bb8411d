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


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    shard_tokens: int,
    bucket_hex: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Export sink for the packing stage: lay the corpus out as
    ~``shard_tokens``-token training shards (``sampling.token_shards``
    assignment — deterministic md5 order, documents never split) and
    write ONE parquet file per shard directory
    (``out_dir/shard_id=.../``), carrying (id, shard_pos, n_toks, text).

    One-file-per-shard comes from ``repartition(shard_id)`` before the
    partitioned write — each shard's rows land in a single task — and
    ``sortWithinPartitions(shard_id, shard_pos)`` makes the file's ROW
    ORDER the packing order (repartition alone leaves shuffle-arbitrary
    order, which would silently destroy the deterministic md5 layout
    ``token_shards`` computed): a shard is one contiguous file a
    trainer streams front-to-back. Reruns are idempotent: dynamic
    partition overwrite replaces each shard directory atomically (the
    bucket-resume device, checkpoint.py)."""
    from ppocr_spark.functions.sampling import token_shards

    shards = token_shards(
        docs, shard_tokens, bucket_hex, text_col=text_col, id_col=id_col
    )
    rows = docs.select(
        F.col(id_col), F.col(text_col).alias("text")
    ).join(shards, id_col)
    (
        rows.repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "shard_pos")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )


__all__ = [
    "SUCCESS_CODES",
    "ensure_ascii_json",
    "error_envelope",
    "response_envelope",
    "write_results",
    "write_training_shards",
]


def draw_boxes(img, boxes, thickness: int = 1):
    """K4 visualization (PPOCR_visualize.createBox,
    api/python/PPOCR_visualize.py:13-38): draw each quad's outline onto a
    copy of the grayscale page (ink value 0). Pure numpy — line segments
    rasterized with a dense parametric sweep; deterministic."""
    import numpy as np

    out = np.asarray(img).copy()
    h, w = out.shape[:2]
    for quad in boxes:
        q = np.asarray(quad, dtype=np.float64).reshape(4, 2)
        for i in range(4):
            x0, y0 = q[i]
            x1, y1 = q[(i + 1) % 4]
            n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2 + 1
            ts = np.linspace(0.0, 1.0, n)
            xs = np.clip(np.round(x0 + (x1 - x0) * ts), 0, w - 1).astype(int)
            ys = np.clip(np.round(y0 + (y1 - y0) * ts), 0, h - 1).astype(int)
            for d in range(thickness):
                out[np.clip(ys + d, 0, h - 1), xs] = 0
                out[ys, np.clip(xs + d, 0, w - 1)] = 0
    return out


def _paint_text(canvas, text: str, x: int, y: int) -> None:
    """Paint a string onto a grayscale canvas with the procedural glyph
    bank (ink 0), clipped at the borders; chars without a glyph skipped."""
    import numpy as np

    from ppocr_spark.font import GLYPH_H, GLYPH_W, glyph_bank

    bank = glyph_bank()
    h, w = canvas.shape[:2]
    cx = x
    for ch in text:
        if ch == " " or ch not in bank:
            cx += GLYPH_W + 2
            continue
        gy0, gx0 = max(y, 0), max(cx, 0)
        gy1, gx1 = min(y + GLYPH_H, h), min(cx + GLYPH_W, w)
        if gy1 > gy0 and gx1 > gx0:
            g = bank[ch][gy0 - y : gy1 - y, gx0 - cx : gx1 - cx]
            region = canvas[gy0:gy1, gx0:gx1]
            region[np.asarray(g, dtype=bool)] = 0
        cx += GLYPH_W + 2


def draw_order(img, boxes):
    """K4 order layer (PPOCR_visualize.createOrder,
    api/python/PPOCR_visualize.py:61-77): paint each block's 0-based
    reading-order index at its top-left corner."""
    import numpy as np

    out = np.asarray(img).copy()
    for i, quad in enumerate(boxes):
        q = np.asarray(quad, dtype=np.float64).reshape(4, 2)
        _paint_text(out, str(i), int(q[:, 0].min()) + 1, int(q[:, 1].min()) + 1)
    return out


def draw_text_layer(shape, boxes, texts):
    """K4 text layer (PPOCR_visualize.createText,
    api/python/PPOCR_visualize.py:40-59): a white page with each block's
    recognized text painted at its box position."""
    import numpy as np

    out = np.full(shape, 255, dtype=np.uint8)
    for quad, text in zip(boxes, texts):
        q = np.asarray(quad, dtype=np.float64).reshape(4, 2)
        _paint_text(out, text or "", int(q[:, 0].min()), int(q[:, 1].min()))
    return out


def draw_contrast(img, boxes, texts):
    """K4 contrast layer (PPOCR_visualize.createContrast,
    api/python/PPOCR_visualize.py:79-109): source page with box outlines
    on the left, recognized text layer on the right, side by side."""
    import numpy as np

    left = draw_boxes(img, boxes)
    right = draw_text_layer(np.asarray(img).shape[:2], boxes, texts)
    return np.concatenate([left, right], axis=1)


def render_viz_layer(img, boxes, texts, layer: str):
    """Dispatch one K4 layer by name: 'box' | 'order' | 'text' |
    'contrast' — the four layers of api/python/PPOCR_visualize.py."""
    import numpy as np

    if layer == "box":
        return draw_boxes(img, boxes)
    if layer == "order":
        return draw_order(img, boxes)
    if layer == "text":
        return draw_text_layer(np.asarray(img).shape[:2], boxes, texts)
    if layer == "contrast":
        return draw_contrast(img, boxes, texts)
    raise ValueError(f"unknown viz layer: {layer}")


def visualize_results(
    ocr: DataFrame, media: DataFrame, layer: str = "box"
) -> DataFrame:
    """K4 sink: join OCR box results back to their source images and emit
    an annotated PNG per media span (media_ref, viz_png). ``layer``
    selects box / order / text / contrast (PPOCR_visualize's four
    layers). Arrow-batched; debug/inspection path, not on the hot
    extraction route."""
    import pandas as pd

    joined = (
        ocr.filter(F.size("boxes") > 0)
        .select("doc_id", "offset", "media_ref", "boxes", "texts")
        .join(
            F.broadcast(
                media.select(
                    F.col("media_ref").alias("m_ref"), "content"
                )
            ),
            F.regexp_replace(F.col("media_ref"), r"#page=\d+$", "")
            == F.col("m_ref"),
            "inner",
        )
        .drop("m_ref")
    )

    def viz(batches):
        from ppocr_spark.png import PngError, decode, encode_gray, to_gray
        from ppocr_spark.sources.pdf import (
            PdfError,
            decode_pdf_page,
            is_pdf,
            split_page_ref,
        )

        for pdf in batches:
            refs, pngs = [], []
            for ref, content, boxes, texts in zip(
                pdf["media_ref"], pdf["content"], pdf["boxes"],
                pdf["texts"],
            ):
                try:
                    data = bytes(content)
                    if is_pdf(data):
                        _, page = split_page_ref(ref)
                        img = decode_pdf_page(data, page or 1)
                    else:
                        img = to_gray(decode(data))
                except (PngError, PdfError, TypeError):
                    continue
                quads = [
                    [(b[2 * i], b[2 * i + 1]) for i in range(4)]
                    for b in boxes
                ]
                refs.append(ref)
                pngs.append(
                    encode_gray(render_viz_layer(img, quads, texts, layer))
                )
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "viz_png": pd.Series(pngs, dtype="object"),
                }
            )

    return joined.mapInPandas(viz, schema="media_ref string, viz_png binary")
