"""Structure/table path (SURVEY §2.4 X1-X3): golden unit tests for the
pure geometry (IoU, NMS, PicoDet distance decode), the grid detector, the
in-cell OCR, and a Spark end-to-end match+HTML equality check."""

import numpy as np
import pytest

from ppocr_spark.operators.structure import (
    detect_grid,
    detect_table_cells,
    dis_pred_to_bbox,
    erase_grid,
    iou_xyxy,
    nms,
    ocr_table_image,
    picodet_decode,
)
from ppocr_spark.render import render_table


def test_iou_golden():
    assert iou_xyxy([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert iou_xyxy([0, 0, 10, 10], [10, 0, 20, 10]) == 0.0
    # overlap 5x10=50, union 150 → 1/3
    assert iou_xyxy([0, 0, 10, 10], [5, 0, 15, 10]) == pytest.approx(1 / 3)


def test_nms_greedy_order():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 0, 11, 10], [100, 0, 110, 10], [2, 0, 12, 10]],
        dtype=float,
    )
    scores = np.array([0.9, 0.95, 0.5, 0.6])
    # 1 wins its cluster (suppresses 0 and 3); 2 is disjoint and survives
    assert nms(boxes, scores, 0.5) == [1, 2]
    # score tie: lower index wins deterministically
    assert nms(boxes[:2], np.array([0.7, 0.7]), 0.5) == [0]


def test_dis_pred_to_bbox_golden():
    # uniform logits → expectation = reg_max/2 per side
    reg_max = 7
    dis = np.zeros((4, reg_max + 1))
    box = dis_pred_to_bbox(dis, x=10, y=12, stride=8, reg_max=reg_max,
                           w=1000, h=1000)
    ct = ((10 + 0.5) * 8, (12 + 0.5) * 8)
    d = reg_max / 2 * 8
    assert box == pytest.approx([ct[0] - d, ct[1] - d, ct[0] + d, ct[1] + d])
    # clamp at the image border
    edge = dis_pred_to_bbox(dis, x=0, y=0, stride=8, reg_max=reg_max,
                            w=1000, h=1000)
    assert edge[0] == 0.0 and edge[1] == 0.0
    # one-hot logits → that bin's distance exactly
    dis2 = np.full((4, reg_max + 1), -20.0)
    dis2[:, 4] = 20.0
    box2 = dis_pred_to_bbox(dis2, x=0, y=0, stride=4, reg_max=reg_max,
                            w=1000, h=1000)
    assert box2 == pytest.approx([0.0, 0.0, 2 + 16, 2 + 16])


def test_picodet_decode_thresh_and_nms():
    # 2x2 grid, 2 classes; one strong cell per class + one sub-threshold
    scores = np.zeros((2, 2, 2))
    scores[0, 0, 0] = 0.9
    scores[1, 1, 1] = 0.8
    scores[0, 1, 0] = 0.2  # below thresh
    dis = np.zeros((2, 2, 4, 8))
    out = picodet_decode([scores], [dis], [8], 64, 64,
                         score_thresh=0.4, nms_thresh=0.5)
    assert [(r["label"], round(r["score"], 2)) for r in out] == [
        (0, 0.9), (1, 0.8)
    ]


def test_grid_detection_matches_truth():
    img, cells, _blocks = render_table(
        [["alpha", "beta"], ["gamma", ""], ["", "delta"]]
    )
    det = detect_table_cells(img)
    want = [
        {"row": c.row, "col": c.col, "rowspan": c.rowspan,
         "colspan": c.colspan, "x0": c.x0, "y0": c.y0,
         "x1": c.x1, "y1": c.y1}
        for c in cells
    ]
    assert det == want
    h_runs, v_runs = detect_grid(img)
    assert len(h_runs) == 4 and len(v_runs) == 3


def test_merged_cell_detection():
    """colspan/rowspan recovery: erased interior rule segments merge grid
    positions into ONE spanning cell with the anchor row/col."""
    img, cells, _blocks = render_table(
        [["alpha", "beta", "gam"], ["delta", "", "eps"],
         ["zeta", "eta", "theta"]],
        merges=[(1, 0, 1, 2)],  # delta spans cols 0-1 of row 1
    )
    det = detect_table_cells(img)
    want = [
        {"row": c.row, "col": c.col, "rowspan": c.rowspan,
         "colspan": c.colspan, "x0": c.x0, "y0": c.y0,
         "x1": c.x1, "y1": c.y1}
        for c in cells
    ]
    assert det == want
    assert len(det) == 8  # 9 grid positions, one pair merged
    merged = [c for c in det if c["colspan"] == 2]
    assert len(merged) == 1 and merged[0]["row"] == 1
    assert merged[0]["col"] == 0 and merged[0]["rowspan"] == 1

    img2, cells2, _b2 = render_table(
        [["alpha", "beta", "gam"], ["delta", "eps", "zeta"],
         ["", "eta", "theta"]],
        merges=[(1, 0, 2, 1)],  # delta spans rows 1-2 of col 0
    )
    det2 = detect_table_cells(img2)
    want2 = [
        {"row": c.row, "col": c.col, "rowspan": c.rowspan,
         "colspan": c.colspan, "x0": c.x0, "y0": c.y0,
         "x1": c.x1, "y1": c.y1}
        for c in cells2
    ]
    assert det2 == want2
    merged2 = [c for c in det2 if c["rowspan"] == 2]
    assert len(merged2) == 1 and (merged2[0]["row"], merged2[0]["col"]) == (1, 0)


def test_erase_grid_removes_rules():
    img, _cells, _blocks = render_table([["alpha"], ["beta"]])
    clean = erase_grid(img)
    h_runs, v_runs = detect_grid(clean)
    assert h_runs == [] and v_runs == []
    assert (clean < 128).sum() > 0  # text ink survives


def test_ocr_table_image_reads_cells():
    from ppocr_spark.config import PPOCRConfig

    img, _cells, blocks = render_table(
        [["alpha", "beta"], ["gamma", "delta"]]
    )
    out = ocr_table_image(img, PPOCRConfig())
    assert [b["text"] for b in out] == [b.text for b in blocks]


def test_spark_match_and_html_equal_truth(spark, tmp_path):
    from ppocr_spark.corpus import ensure_table_corpus
    from ppocr_spark.operators.structure import (
        detect_cells_df,
        match_cells,
        ocr_table_blocks_df,
        table_html_df,
    )
    from ppocr_spark.config import PPOCRConfig

    tdir = ensure_table_corpus(6, base_dir=str(tmp_path))
    media = spark.read.parquet(f"{tdir}/table_media.parquet")
    cells = detect_cells_df(media)
    blocks = ocr_table_blocks_df(media, PPOCRConfig())
    got = {
        (r.media_ref, r.block_idx): (r.text, r.row, r.col)
        for r in match_cells(blocks, cells).collect()
    }
    want = {
        (r.media_ref, r.block_idx): (r.text, r.cell_row, r.cell_col)
        for r in spark.read.parquet(f"{tdir}/table_blocks.parquet").collect()
    }
    assert got == want

    html = {
        r.media_ref: r.html
        for r in table_html_df(match_cells(blocks, cells), cells).collect()
    }
    truth = {
        r.media_ref: r.html
        for r in spark.read.parquet(f"{tdir}/table_html.parquet").collect()
    }
    assert html == truth


def test_borderless_gutter_detection():
    """No ruled lines at all → cells inferred from whitespace gutters:
    a full row×col grid with exact ink-extent bounds (spans all 1)."""
    import numpy as np

    img, _cells, blocks = render_table(
        [["alpha", "beta"], ["gamma", "delta"], ["eps", "zeta fi"]],
        ruled=False,
    )
    det = detect_table_cells(img)
    assert len(det) == 6
    assert all(c["rowspan"] == 1 and c["colspan"] == 1 for c in det)
    assert [(c["row"], c["col"]) for c in det] == [
        (r, c) for r in range(3) for c in range(2)
    ]
    # truth bands from the renderer's ink quads (independent derivation)
    row_band, col_band = {}, {}
    for b in blocks:
        r, c = b.line_idx // 2, b.line_idx % 2
        xs = [p[0] for p in b.quad]
        ys = [p[1] for p in b.quad]
        rb = row_band.setdefault(r, [min(ys), max(ys)])
        rb[0], rb[1] = min(rb[0], min(ys)), max(rb[1], max(ys))
        cb = col_band.setdefault(c, [min(xs), max(xs)])
        cb[0], cb[1] = min(cb[0], min(xs)), max(cb[1], max(xs))
    for cell in det:
        assert [cell["y0"], cell["y1"]] == row_band[cell["row"]]
        assert [cell["x0"], cell["x1"]] == col_band[cell["col"]]
    # word spaces must NOT split a column: 'zeta fi' is one cell
    assert len({c["col"] for c in det}) == 2
    # empty image → no cells, no fallback
    assert detect_table_cells(np.full((64, 64), 255, dtype=np.uint8)) == []


def test_borderless_with_empty_cells():
    """Empty cells are kept as grid positions as long as their row and
    column carry ink elsewhere (the gutter contract)."""
    img, _c, _b = render_table(
        [["alpha", ""], ["", "delta"]], ruled=False
    )
    det = detect_table_cells(img)
    assert [(c["row"], c["col"]) for c in det] == [
        (0, 0), (0, 1), (1, 0), (1, 1)
    ]


def test_partially_ruled_falls_back_to_gutters():
    """Horizontal rules only (no vertical): rules are erased before the
    gutter pass so they cannot weld the column projection together."""
    import numpy as np

    img, _cells, _blocks = render_table(
        [["alpha", "beta"], ["gamma", "delta"]], ruled=False
    )
    # paint horizontal rules only (full width → would poison the
    # column projection if not erased)
    from ppocr_spark.operators.structure import detect_grid

    img = img.copy()
    img[2:5, :] = 0
    img[-5:-2, :] = 0
    h_runs, v_runs = detect_grid(img)
    assert len(h_runs) >= 2 and len(v_runs) == 0
    det = detect_table_cells(img)
    assert len({c["col"] for c in det}) == 2  # columns still separate
