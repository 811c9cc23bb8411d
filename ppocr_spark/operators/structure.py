"""Structure/table path — SURVEY.md §2.4 (X1-X3), built Spark-first.

The reference ships (but disables at its entry point, cpp/src/main.cpp:126-130)
a structure pipeline: PicoDet layout detection with per-class NMS
(cpp/src/structure_layout.cpp:20-99, cpp/src/postprocess_op.cpp:442-573),
table-structure recognition (cpp/src/structure_table.cpp:20-123), and a
cell↔text nearest-neighbor spatial match that stitches OCR text into table
HTML (PaddleStructure::rebuild_table, cpp/src/paddlestructure.cpp:144-257).

This module re-expresses each:

- X1: ``iou`` / ``nms`` / ``dis_pred_to_bbox`` / ``picodet_decode`` as pure
  numpy (golden unit tests); the per-image decode runs inside an Arrow UDF.
- X2: our table "model" is deterministic geometry — ruled tables are
  detected by projection-profile grid detection (``detect_grid`` →
  ``detect_table_cells``), rules erased, and the ordinary det→rec OCR stack
  run on the remaining text (``ocr_table_image``). The attention decoder of
  the reference is a learned model; its *output contract* (cell boxes +
  HTML tag stream) is what we reproduce.
- X3: the nearest-neighbor match is a REAL relational join here — candidate
  pairs via an equi-join on media_ref (cells broadcast: a table has tens of
  cells), distance = L1 corner distance with (1 − IoU) tiebreak exactly as
  ``PaddleStructure::dis`` (cpp/src/paddlestructure.cpp:259-276), winner by
  ``row_number() == 1`` over a Window — the SURVEY §2.4 mapping, and the
  same shape Catalyst would pick for any small-dim spatial join at 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ppocr_spark.config import PPOCRConfig

# ---------------------------------------------------------------------------
# X1 — IoU / NMS / PicoDet distance decode (pure numpy)
# ---------------------------------------------------------------------------


def iou_xyxy(a, b) -> float:
    """Axis-aligned IoU of [x0,y0,x1,y1] boxes
    (Utility::iou, cpp/src/utility.cpp:527-579)."""
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix1 - ix0), max(0.0, iy1 - iy0)
    inter = iw * ih
    if inter <= 0:
        return 0.0
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return float(inter / (area_a + area_b - inter))


def nms(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float) -> list[int]:
    """Greedy score-descending NMS → kept indices (ascending), the
    per-class loop of PicodetPostProcessor::nms
    (cpp/src/postprocess_op.cpp:556-573). Ties broken by index for
    determinism."""
    order = sorted(range(len(scores)), key=lambda i: (-float(scores[i]), i))
    kept: list[int] = []
    for i in order:
        if all(iou_xyxy(boxes[i], boxes[j]) <= iou_thresh for j in kept):
            kept.append(i)
    return sorted(kept)


def dis_pred_to_bbox(
    dis_pred: np.ndarray, x: int, y: int, stride: int, reg_max: int,
    w: int, h: int,
) -> np.ndarray:
    """PicoDet distance-to-bbox decode for one cell: dis_pred is
    (4, reg_max+1) logits; each side's distance is the softmax-weighted
    expectation over bins, scaled by stride; the box is the grid center
    ± distances, clamped to the image
    (PicodetPostProcessor::disPred2Bbox, cpp/src/postprocess_op.cpp:497-528;
    softmax via Utility, cpp/src/utility.cpp:494-525)."""
    ct_x = (x + 0.5) * stride
    ct_y = (y + 0.5) * stride
    dis = np.zeros(4, dtype=np.float64)
    for side in range(4):
        logits = dis_pred[side].astype(np.float64)
        e = np.exp(logits - logits.max())
        p = e / e.sum()
        dis[side] = float((p * np.arange(reg_max + 1)).sum()) * stride
    return np.array(
        [
            max(ct_x - dis[0], 0.0),
            max(ct_y - dis[1], 0.0),
            min(ct_x + dis[2], float(w)),
            min(ct_y + dis[3], float(h)),
        ]
    )


def picodet_decode(
    score_grids: list[np.ndarray],
    dis_grids: list[np.ndarray],
    strides: list[int],
    img_w: int,
    img_h: int,
    score_thresh: float = 0.4,
    nms_thresh: float = 0.5,
    reg_max: int = 7,
) -> list[dict]:
    """Full PicoDet post-process: per FPN level, per grid cell take the
    class argmax, gate on score_thresh, distance-decode the box; then
    per-class greedy NMS (PicodetPostProcessor::Run,
    cpp/src/postprocess_op.cpp:442-495 + structure_layout.cpp:20-99).

    score_grids[l]: (H_l, W_l, n_classes); dis_grids[l]: (H_l, W_l, 4,
    reg_max+1). Returns [{bbox: [x0,y0,x1,y1], label, score}] sorted by
    (label, score desc)."""
    per_class: dict[int, list[tuple[np.ndarray, float]]] = {}
    for scores, dis, stride in zip(score_grids, dis_grids, strides):
        hh, ww = scores.shape[:2]
        for yy in range(hh):
            for xx in range(ww):
                label = int(np.argmax(scores[yy, xx]))
                sc = float(scores[yy, xx, label])
                if sc < score_thresh:
                    continue
                bbox = dis_pred_to_bbox(
                    dis[yy, xx], xx, yy, stride, reg_max, img_w, img_h
                )
                per_class.setdefault(label, []).append((bbox, sc))
    out: list[dict] = []
    for label in sorted(per_class):
        boxes = np.array([b for b, _ in per_class[label]])
        scs = np.array([s for _, s in per_class[label]])
        for i in nms(boxes, scs, nms_thresh):
            out.append(
                {"bbox": boxes[i].tolist(), "label": label,
                 "score": float(scs[i])}
            )
    out.sort(key=lambda r: (r["label"], -r["score"]))
    return out


# ---------------------------------------------------------------------------
# X2 — ruled-table grid detection + cell extraction + in-cell OCR
# ---------------------------------------------------------------------------


def _runs(mask: np.ndarray) -> list[tuple[int, int]]:
    """Consecutive-True runs → [(start, end)] inclusive."""
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return []
    splits = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate(([0], splits + 1))
    ends = np.concatenate((splits, [idx.size - 1]))
    return [(int(idx[s]), int(idx[e])) for s, e in zip(starts, ends)]


def _has_long_run(dark: np.ndarray, min_run: int, axis: int) -> np.ndarray:
    """Per-line (row if axis=1, column if axis=0) test: does the line
    contain >= min_run CONSECUTIVE dark pixels? Contiguity separates rule
    segments (solid, >= one cell long) from text lines (glyph strokes a
    few px wide broken by intra/inter-glyph white) far more robustly than
    a dark-fraction projection — and keeps working when a merged cell
    erases part of a rule. Vectorized: a window-sum of the 0/1 mask equals
    the window length iff every pixel in the window is dark."""
    d = dark if axis == 1 else dark.T
    n = d.shape[1]
    if n < min_run:
        return np.zeros(d.shape[0], dtype=bool)
    s = np.cumsum(d, axis=1, dtype=np.int32)
    win = s[:, min_run - 1 :].copy()
    win[:, 1:] -= s[:, :-min_run]
    return (win == min_run).any(axis=1)


def detect_grid(
    gray: np.ndarray, dark_thresh: int = 128, min_run_px: int = 64
) -> tuple[list[tuple[int, int]], list[tuple[int, int]]]:
    """Ruled-line detection by contiguous-run evidence: a row (column)
    belongs to a horizontal (vertical) rule iff it carries a solid dark
    run of >= min_run_px (shorter than any cell edge, longer than any
    glyph stroke). Partial rules — interrupted by merged-cell regions —
    still register from their surviving segments. → (h_runs, v_runs)."""
    dark = gray < dark_thresh
    h_runs = _runs(_has_long_run(dark, min_run_px, axis=1))
    v_runs = _runs(_has_long_run(dark, min_run_px, axis=0))
    return h_runs, v_runs


def _boundary_open(
    dark: np.ndarray,
    rule_run: tuple[int, int],
    span_run: tuple[int, int],
    vertical: bool,
    seg_frac: float = 0.5,
) -> bool:
    """Is the rule segment between two adjacent grid cells ABSENT?
    ``rule_run``: the rule's thickness span; ``span_run``: the crossing
    cell band's inner span. Present = the segment is mostly dark."""
    r0, r1 = rule_run
    s0, s1 = span_run
    seg = (
        dark[s0 : s1 + 1, r0 : r1 + 1]
        if vertical
        else dark[r0 : r1 + 1, s0 : s1 + 1]
    )
    return float(seg.mean()) < seg_frac


def _ink_bands(
    dark: np.ndarray, axis: int, min_gap: int
) -> list[tuple[int, int]]:
    """Ink bands along one axis: maximal runs of lines (rows if axis=1,
    columns if axis=0) containing ANY dark pixel, with runs separated by
    a white gutter NARROWER than ``min_gap`` merged (intra-glyph gaps —
    an 'i' dot, aligned word spaces — must not split a band; only a
    deliberate table gutter may)."""
    proj = dark.any(axis=axis)
    runs = _runs(proj)
    merged: list[tuple[int, int]] = []
    for s, e in runs:
        if merged and s - merged[-1][1] - 1 < min_gap:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    return merged


def detect_table_cells_gutter(
    gray: np.ndarray,
    dark_thresh: int = 128,
    min_row_gap: int = 16,
    min_col_gap: int = 64,
) -> list[dict]:
    """Borderless-table cell inference by WHITESPACE GUTTERS: when a table
    has no ruled lines, its structure is still visible as white bands —
    row bands = ink runs of the horizontal projection, column bands = ink
    runs of the vertical projection (columns align across rows, so the
    global projection keeps each column solid while the inter-column
    gutter stays white in every row). Cells = row band × column band,
    uniform grid (no colspan/rowspan — span inference needs appearance
    cues a projection cannot see; the reference's learned table model
    emits these from attention decode, cpp/src/structure_table.cpp:20-123,
    cpp/src/postprocess_op.cpp:354-440 — its *cell box* contract is what
    this reproduces for borderless input). Bounds are exact ink extents.

    ``min_col_gap`` sits between the widest in-cell word space (~40 px at
    the corpus glyph scale) and the narrowest column gutter (2×HPAD+rule
    ≥ 115 px); ``min_row_gap`` above intra-glyph vertical gaps (an 'i'
    dot, ≤ 8 px) and below the inter-row gutter (≥ 64 px)."""
    dark = gray < dark_thresh
    row_bands = _ink_bands(dark, axis=1, min_gap=min_row_gap)
    col_bands = _ink_bands(dark, axis=0, min_gap=min_col_gap)
    cells = []
    for r, (y0, y1) in enumerate(row_bands):
        for c, (x0, x1) in enumerate(col_bands):
            cells.append(
                {
                    "row": r,
                    "col": c,
                    "rowspan": 1,
                    "colspan": 1,
                    "x0": x0,
                    "y0": y0,
                    "x1": x1,
                    "y1": y1,
                }
            )
    return cells


def detect_table_cells(gray: np.ndarray, dark_thresh: int = 128) -> list[dict]:
    """Grid → cells, with merged-cell (colspan/rowspan) recovery: grid
    positions whose shared rule segment is erased belong to one spanning
    cell (the colspan/rowspan the reference's table tag stream expresses,
    cpp/src/paddlestructure.cpp:222-257). Returns
    [{row, col, rowspan, colspan, x0, y0, x1, y1}] (inclusive coords,
    anchor row/col, covered positions omitted), row-major.

    BORDERLESS FALLBACK: when no ruled grid exists at all (fewer than two
    rules in either direction), cells are inferred from whitespace
    gutters instead (``detect_table_cells_gutter``) — the unruled-table
    case the reference's learned model handles by appearance."""
    dark = gray < dark_thresh
    h_runs, v_runs = detect_grid(gray, dark_thresh)
    n_r, n_c = len(h_runs) - 1, len(v_runs) - 1
    if n_r <= 0 or n_c <= 0:
        # partially ruled (rules in one direction only): erase them so
        # they can't weld the projection into one band, then gutter-infer
        work = erase_grid(gray) if (h_runs or v_runs) else gray
        if (work < dark_thresh).any():
            return detect_table_cells_gutter(work, dark_thresh)
        return []
    inner_y = [
        (h_runs[r][1] + 1, h_runs[r + 1][0] - 1) for r in range(n_r)
    ]
    inner_x = [
        (v_runs[c][1] + 1, v_runs[c + 1][0] - 1) for c in range(n_c)
    ]

    # union-find over grid positions joined across absent rule segments
    parent = {(r, c): (r, c) for r in range(n_r) for c in range(n_c)}

    def find(p):
        while parent[p] != p:
            parent[p] = parent[parent[p]]
            p = parent[p]
        return p

    def union(p, q):
        parent[find(q)] = find(p)

    for r in range(n_r):
        for c in range(n_c - 1):  # right boundary = vertical rule c+1
            if _boundary_open(dark, v_runs[c + 1], inner_y[r], True):
                union((r, c), (r, c + 1))
    for r in range(n_r - 1):  # bottom boundary = horizontal rule r+1
        for c in range(n_c):
            if _boundary_open(dark, h_runs[r + 1], inner_x[c], False):
                union((r, c), (r + 1, c))

    regions: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for p in parent:
        regions.setdefault(find(p), []).append(p)
    cells = []
    for members in regions.values():
        rows = [r for r, _ in members]
        cols = [c for _, c in members]
        r0, c0 = min(rows), min(cols)
        cells.append(
            {
                "row": r0,
                "col": c0,
                "rowspan": max(rows) - r0 + 1,
                "colspan": max(cols) - c0 + 1,
                "x0": inner_x[c0][0],
                "y0": inner_y[r0][0],
                "x1": inner_x[max(cols)][1],
                "y1": inner_y[max(rows)][1],
            }
        )
    cells.sort(key=lambda c: (c["row"], c["col"]))
    return cells


def erase_grid(gray: np.ndarray) -> np.ndarray:
    """White out detected rules (±1 px guard band) so the ordinary OCR
    det stage sees only the cell text."""
    h_runs, v_runs = detect_grid(gray)
    out = gray.copy()
    h, w = out.shape
    for y0, y1 in h_runs:
        out[max(y0 - 1, 0) : min(y1 + 2, h), :] = 255
    for x0, x1 in v_runs:
        out[:, max(x0 - 1, 0) : min(x1 + 2, w)] = 255
    return out


def ocr_table_image(gray: np.ndarray, cfg: PPOCRConfig) -> list[dict]:
    """Erase rules → ordinary det→rec on the remaining text → per-block
    records [{block_idx, text, score, x0, y0, x1, y1}] in reading order
    (the OCR half of PaddleStructure::structure,
    cpp/src/paddlestructure.cpp:43-142)."""
    from ppocr_spark.geometry import perspective_crop
    from ppocr_spark.operators.detect import detect
    from ppocr_spark.operators.recognize import recognize_batch

    clean = erase_grid(gray)
    quads = detect(clean, cfg)
    if not quads:
        return []
    crops = [perspective_crop(clean, q) for q in quads]
    rec = recognize_batch(crops, img_h=cfg.rec_img_h,
                          batch_num=cfg.rec_batch_num)
    out = []
    for q, (txt, score) in zip(quads, rec):
        if not txt or score <= 0:
            continue
        out.append(
            {
                "block_idx": len(out),
                "text": txt,
                "score": float(score),
                "x0": int(q[:, 0].min()),
                "y0": int(q[:, 1].min()),
                "x1": int(q[:, 0].max()),
                "y1": int(q[:, 1].max()),
            }
        )
    return out


# ---------------------------------------------------------------------------
# Spark operators (Arrow UDF scans + the X3 relational match)
# ---------------------------------------------------------------------------

CELLS_SCHEMA = (
    "media_ref string, row int, col int, rowspan int, colspan int, "
    "x0 int, y0 int, x1 int, y1 int"
)
BLOCKS_SCHEMA = (
    "media_ref string, block_idx int, text string, score float, "
    "x0 int, y0 int, x1 int, y1 int"
)


def _media_udf(fn, fields):
    import pyarrow as pa

    out_type = pa.struct(fields)

    def udf(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from ppocr_spark.png import PngError, decode, to_gray

        for batch in batches:
            refs = batch.column("media_ref").to_pylist()
            contents = batch.column("content")
            rows = []
            for i in range(batch.num_rows):
                if not contents[i].is_valid:
                    continue
                try:
                    img = to_gray(decode(bytes(contents[i].as_py())))
                except PngError:
                    continue
                rows.extend(fn(refs[i], img))
            arr = pa.array(rows, type=out_type)
            yield pa.RecordBatch.from_struct_array(arr)

    return udf


def detect_cells_df(media: DataFrame) -> DataFrame:
    """media(media_ref, content) → one row per detected cell."""
    import pyarrow as pa

    def per_image(ref, img):
        return [{"media_ref": ref, **c} for c in detect_table_cells(img)]

    fields = [("media_ref", pa.string()), ("row", pa.int32()),
              ("col", pa.int32()), ("rowspan", pa.int32()),
              ("colspan", pa.int32()), ("x0", pa.int32()),
              ("y0", pa.int32()), ("x1", pa.int32()), ("y1", pa.int32())]
    return media.select("media_ref", "content").mapInArrow(
        _media_udf(per_image, fields), schema=CELLS_SCHEMA
    )


def ocr_table_blocks_df(media: DataFrame, cfg: PPOCRConfig) -> DataFrame:
    """media(media_ref, content) → one row per recognized text block."""
    import pyarrow as pa

    def per_image(ref, img):
        return [{"media_ref": ref, **b} for b in ocr_table_image(img, cfg)]

    fields = [("media_ref", pa.string()), ("block_idx", pa.int32()),
              ("text", pa.string()), ("score", pa.float32()),
              ("x0", pa.int32()), ("y0", pa.int32()),
              ("x1", pa.int32()), ("y1", pa.int32())]
    return media.select("media_ref", "content").mapInArrow(
        _media_udf(per_image, fields), schema=BLOCKS_SCHEMA
    )


def match_cells(blocks: DataFrame, cells: DataFrame) -> DataFrame:
    """X3 — the nearest-neighbor spatial join, relationally:
    blocks × cells equi-joined on media_ref (cells broadcast — a table has
    tens of cells), ranked per block by (L1 corner distance, 1 − IoU,
    cell order), keep rank 1 (PaddleStructure::rebuild_table candidate
    choice, cpp/src/paddlestructure.cpp:144-257; dis :259-276).

    Output: one row per block with its (row, col) cell assignment."""
    b = blocks.select(
        "media_ref", "block_idx", "text",
        F.col("x0").alias("bx0"), F.col("y0").alias("by0"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
    )
    c = cells.select(
        "media_ref", "row", "col",
        F.col("x0").alias("cx0"), F.col("y0").alias("cy0"),
        F.col("x1").alias("cx1"), F.col("y1").alias("cy1"),
    )
    # L1 distance over the 4 corners of axis-aligned boxes = 2*(Σ edge L1)
    dist = 2.0 * (
        F.abs(F.col("bx0") - F.col("cx0")) + F.abs(F.col("bx1") - F.col("cx1"))
        + F.abs(F.col("by0") - F.col("cy0"))
        + F.abs(F.col("by1") - F.col("cy1"))
    )
    ix = F.greatest(
        F.lit(0.0),
        F.least(F.col("bx1"), F.col("cx1")).cast("double")
        - F.greatest(F.col("bx0"), F.col("cx0")),
    )
    iy = F.greatest(
        F.lit(0.0),
        F.least(F.col("by1"), F.col("cy1")).cast("double")
        - F.greatest(F.col("by0"), F.col("cy0")),
    )
    inter = ix * iy
    area_b = (F.col("bx1") - F.col("bx0")).cast("double") * (
        F.col("by1") - F.col("by0")
    )
    area_c = (F.col("cx1") - F.col("cx0")).cast("double") * (
        F.col("cy1") - F.col("cy0")
    )
    iou = F.when(inter > 0, inter / (area_b + area_c - inter)).otherwise(0.0)
    # containment precedence: a spanning (colspan/rowspan) cell's far
    # corners sit a full cell away from its content, so raw corner
    # distance would prefer an adjacent normal cell — the cell that
    # CONTAINS the block center wins first, corner distance only breaks
    # ties among containers (uniform grids: exactly one container, so
    # ranking is unchanged there)
    bcx = (F.col("bx0") + F.col("bx1")) / 2.0
    bcy = (F.col("by0") + F.col("by1")) / 2.0
    contains = (
        (bcx >= F.col("cx0")) & (bcx <= F.col("cx1"))
        & (bcy >= F.col("cy0")) & (bcy <= F.col("cy1"))
    ).cast("int")
    w = Window.partitionBy("media_ref", "block_idx").orderBy(
        contains.desc(), dist.asc(), (1.0 - iou).asc(),
        F.col("row").asc(), F.col("col").asc()
    )
    return (
        b.join(F.broadcast(c), "media_ref")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("media_ref", "block_idx", "text", "row", "col")
    )


def table_html_df(matched: DataFrame, cells: DataFrame) -> DataFrame:
    """Stitch matched text into per-table HTML
    (the <tr>/<td> stream rebuild of PaddleStructure::rebuild_table,
    cpp/src/paddlestructure.cpp:222-257). Pure relational assembly:
    per-cell text = blocks sorted by block_idx joined by ' '; empty cells
    kept via the cells grid; rows/cols ordered by array_sort over structs."""
    cell_text = matched.groupBy("media_ref", "row", "col").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("block_idx", "text"))
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("cell_text")
    )
    span_cols = (
        ["rowspan", "colspan"]
        if "rowspan" in cells.columns
        else []
    )
    grid = cells.select("media_ref", "row", "col", *span_cols).join(
        cell_text, ["media_ref", "row", "col"], "left"
    )
    if not span_cols:  # legacy uniform grid → all spans 1
        grid = grid.withColumn("rowspan", F.lit(1)).withColumn(
            "colspan", F.lit(1)
        )
    # <td colspan=".." rowspan="..">: attributes only when > 1, matching
    # the reference's tag-stream contract for spanning cells
    # (cpp/src/paddlestructure.cpp:222-257)
    td = F.concat(
        F.lit("<td"),
        F.when(
            F.col("colspan") > 1,
            F.concat(
                F.lit(' colspan="'),
                F.col("colspan").cast("string"),
                F.lit('"'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("rowspan") > 1,
            F.concat(
                F.lit(' rowspan="'),
                F.col("rowspan").cast("string"),
                F.lit('"'),
            ),
        ).otherwise(F.lit("")),
        F.lit(">"),
        F.coalesce(F.col("cell_text"), F.lit("")),
        F.lit("</td>"),
    )
    rows = grid.groupBy("media_ref", "row").agg(
        F.concat(
            F.lit("<tr>"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("col", td.alias("td")))
                    ),
                    lambda s: s["td"],
                ),
                "",
            ),
            F.lit("</tr>"),
        ).alias("row_html")
    )
    return rows.groupBy("media_ref").agg(
        F.concat(
            F.lit("<table>"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("row", "row_html"))),
                    lambda s: s["row_html"],
                ),
                "",
            ),
            F.lit("</table>"),
        ).alias("html")
    )
