"""Text-box detection — the DB-style det stage (D1-D8 in SURVEY.md §2.2).

Pipeline per image (all pure numpy; reference citations per step):

  D1 resize      — cap longest side at ``limit_side_len`` (or floor shortest,
                   limit_type='min'), round H/W to multiples of 32, keep the
                   ratios for the final rescale
                   (ResizeImgType0, cpp/src/preprocess_op.cpp:56-91)
  D2-D4 model    — probability map. The reference runs a learned DB network;
                   this engine's from-scratch 'network' is an anisotropic
                   windowed ink-density map (separable box filter, fixed
                   receptive field 21x5): high inside text strokes/lines,
                   decaying across gaps — the same shrunk-region semantics a
                   DB model is trained to produce (cpp/src/ocr_det.cpp:103-121)
  D5 binarize    — prob > det_db_thresh; optional 2x2 dilation
                   (cpp/src/ocr_det.cpp:123-149)
  D6 boxes       — connected components (≤max_candidates), min-area rect,
                   sside gate, polygon/bbox score gate, unclip expansion
                   (BoxesFromBitmap, cpp/src/postprocess_op.cpp:246-321)
  D7 rescale     — order clockwise, divide by resize ratios, clamp to source,
                   drop tiny boxes (FilterTagDetRes,
                   cpp/src/postprocess_op.cpp:323-352)
  D8 sort        — (y, x) sort of top-left + the reference's adjacent-swap
                   pass for same-line boxes with Δy < 10
                   (Utility::sorted_boxes, cpp/src/utility.cpp:443-460)
"""

from __future__ import annotations

import numpy as np

from ppocr_spark.config import PPOCRConfig
from ppocr_spark.geometry import (
    connected_component_runs,
    expand_rect,
    min_area_rect,
    order_points_clockwise,
    run_row_extremes,
    unclip_distance,
)

# fixed 'receptive field' of the density model (odd window sizes), defined
# at STRIDE-2 resolution: like a real DB head, the model evaluates on a
# 2x2-mean-pooled feature map (quarter the memory traffic of full-res) and
# its outputs are rescaled back through the resize ratios
WIN_W = 11
WIN_H = 3
STRIDE = 2


def resize_dims(
    h: int, w: int, limit_type: str, limit_side_len: int
) -> tuple[int, int]:
    """D1 target dims: longest side <= limit (type 'max') or shortest
    side >= limit (type 'min'); rounded to multiples of 32, min 32."""
    if limit_type == "max":
        ratio = float(limit_side_len) / max(h, w) if max(h, w) > limit_side_len else 1.0
    else:
        ratio = float(limit_side_len) / min(h, w) if min(h, w) < limit_side_len else 1.0
    resize_h = max(int(round(h * ratio / 32) * 32), 32)
    resize_w = max(int(round(w * ratio / 32) * 32), 32)
    return resize_h, resize_w


def resize_type0(
    img: np.ndarray, limit_type: str, limit_side_len: int
) -> tuple[np.ndarray, float, float]:
    """D1: materialized resize (kept for callers that need pixels; the det
    hot path uses the fused ``pooled_ink`` instead).
    Returns (resized, ratio_h, ratio_w)."""
    h, w = img.shape[:2]
    resize_h, resize_w = resize_dims(h, w, limit_type, limit_side_len)
    resized = _bilinear_resize(img, resize_h, resize_w)
    return resized, resize_h / float(h), resize_w / float(w)


def _bilinear_resize(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    h, w = img.shape[:2]
    if (nh, nw) == (h, w):
        return img
    ys = (np.arange(nh) + 0.5) * h / nh - 0.5
    xs = (np.arange(nw) + 0.5) * w / nw - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 2)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 2)
    fy = np.clip(ys - y0, 0, 1)[:, None].astype(np.float32)
    fx = np.clip(xs - x0, 0, 1)[None, :].astype(np.float32)
    # separable two-pass float32 blend; collapse along the axis that shrinks
    # the intermediate most (memory traffic dominates this kernel).
    # In-place ops below perform the SAME per-element expressions in the
    # same order as the naive a*(1-f) + b*f form — bit-identical, fewer
    # temporaries (this kernel runs ~10x per span). First-pass gathers read
    # the uint8 source directly (gather-then-astype == astype-then-gather),
    # skipping the full-input float32 copy
    if nh * w <= h * nw:
        v = img[y0].astype(np.float32)
        v *= 1 - fy
        t = img[y0 + 1].astype(np.float32)
        t *= fy
        v += t                                         # (nh, w)
        out = v[:, x0]
        out *= 1 - fx
        t2 = v[:, x0 + 1]
        t2 *= fx
        out += t2                                      # (nh, nw)
    else:
        hh = img[:, x0].astype(np.float32)
        hh *= 1 - fx
        t = img[:, x0 + 1].astype(np.float32)
        t *= fx
        hh += t                                        # (h, nw)
        out = hh[y0]
        out *= 1 - fy
        t2 = hh[y0 + 1]
        t2 *= fy
        out += t2                                      # (nh, nw)
    np.round(out, out=out)
    np.clip(out, 0, 255, out=out)
    return out.astype(np.uint8)


def _box_filter(a: np.ndarray, wh: int, ww: int) -> np.ndarray:
    """Separable mean filter via cumulative sums (zero-padded borders)."""
    rh, rw = wh // 2, ww // 2
    # horizontal
    c = np.cumsum(np.pad(a, ((0, 0), (rw + 1, rw)), mode="constant"), axis=1)
    hsum = c[:, ww:] - c[:, :-ww]
    # vertical
    c2 = np.cumsum(np.pad(hsum, ((rh + 1, rh), (0, 0)), mode="constant"), axis=0)
    vsum = c2[wh:, :] - c2[:-wh, :]
    return vsum / float(wh * ww)


def _hmax_filter(a: np.ndarray, width: int) -> np.ndarray:
    """Horizontal sliding-window maximum (grayscale dilation), width odd.

    Log-doubling van-Herk-style composition: O(log width) full-array passes
    instead of the naive windowed reduce's O(width) — the det stage is the
    pipeline's memory-bandwidth hot spot and this keeps it ~6 passes."""
    r = width // 2
    pad = np.pad(a, ((0, 0), (r, r)), mode="constant")
    # running max over windows of growing power-of-two span
    span = 1
    cur = pad
    while span < width:
        step = min(span, width - span)
        shifted = cur[:, step:]
        n = shifted.shape[1]
        out = cur[:, :n].copy()
        np.maximum(out, shifted, out=out)
        cur = out
        span += step
    return cur


#: width of the horizontal dilation layer (stride-2 pixels) — binds
#: intra-line gaps (char gaps ~4, word gaps ~18, ~13 after the 960-cap
#: resize, all in stride-2 units) so one text line = one box, the reference
#: DB model's granularity, without bridging column gutters (>= 42)
DILATE_W = 21


def _pool2(gray: np.ndarray) -> np.ndarray:
    """2x2 mean pool (stride-2 feature map), uint8 → float32 ink in [0,1]."""
    h, w = gray.shape
    h2, w2 = h - (h % 2), w - (w % 2)
    # sum the four uint8 taps directly into float32 (integer sums ≤ 1020
    # are exact in float32, so this equals the old full-page float32
    # conversion bit-for-bit) — skips the page-sized float copy, the
    # largest het-stage temporary at 32 residents
    s = np.add(
        gray[0:h2:2, 0:w2:2], gray[0:h2:2, 1:w2:2], dtype=np.float32
    )
    s += gray[1:h2:2, 0:w2:2]
    s += gray[1:h2:2, 1:w2:2]
    s *= 0.25
    np.subtract(255.0, s, out=s)
    s /= 255.0
    return s


def _pooled_axis_taps(src: int, dst: int):
    """Compose bilinear(src→dst) with 2-mean pooling along one axis:
    per stride-2 output k, four source taps (a0, a0+1, a1, a1+1) with
    weights ((1-f0)/2, f0/2, (1-f1)/2, f1/2) where (a0,f0)/(a1,f1) are the
    bilinear taps of rows 2k and 2k+1."""
    ys = (np.arange(dst) + 0.5) * src / dst - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, src - 2)
    fy = np.clip(ys - y0, 0, 1).astype(np.float32)
    half = dst // 2
    a0 = y0[0 : 2 * half : 2]
    a1 = y0[1 : 2 * half : 2]
    f0 = fy[0 : 2 * half : 2] * 0.5
    g0 = 0.5 - f0
    f1 = fy[1 : 2 * half : 2] * 0.5
    g1 = 0.5 - f1
    return a0, a1, g0, f0, g1, f1


def pooled_ink(img: np.ndarray, resize_h: int, resize_w: int) -> np.ndarray:
    """Fused D1+pool: the stride-2 ink map the det head consumes, computed
    directly from the source image (one gather pass per axis at half
    resolution) instead of materializing the full-resolution D1 resize and
    pooling it — the det stage's largest memory pass removed. Float32
    end-to-end (no intermediate uint8 quantization)."""
    h, w = img.shape[:2]
    a0, a1, g0, f0, g1, f1 = _pooled_axis_taps(h, resize_h)
    # in-place accumulation, same left-associated per-element expression
    # as the naive 4-term sums; row-gather straight from the uint8 page
    # (float32(img)[rows] == img[rows].astype(float32) bit-for-bit), so the
    # full-page float32 copy — the largest det-stage temporary and the
    # main LLC/DRAM load at 32 residents — is never materialized
    v = img[a0].astype(np.float32)
    v *= g0[:, None]
    t = img[a0 + 1].astype(np.float32)
    t *= f0[:, None]
    v += t
    t = img[a1].astype(np.float32)
    t *= g1[:, None]
    v += t
    t = img[a1 + 1].astype(np.float32)
    t *= f1[:, None]
    v += t
    b0, b1, h0, e0, h1, e1 = _pooled_axis_taps(w, resize_w)
    pooled = v[:, b0]
    pooled *= h0[None, :]
    t = v[:, b0 + 1]
    t *= e0[None, :]
    pooled += t
    t = v[:, b1]
    t *= h1[None, :]
    pooled += t
    t = v[:, b1 + 1]
    t *= e1[None, :]
    pooled += t
    np.subtract(255.0, pooled, out=pooled)
    pooled /= 255.0
    return pooled


def probability_map(gray: np.ndarray) -> np.ndarray:
    """D2-D4: the from-scratch 'DB network' — a fixed conv-style stack at
    stride 2: 2x2 mean pool, horizontal grayscale dilation (binds the
    characters of a line across word gaps), anisotropic mean filter (11x3
    receptive field: wide horizontally, narrow vertically so adjacent lines
    stay apart). Output in [0,1] at half resolution — high inside text
    lines, decaying across gaps: the shrunk-region semantics a DB model is
    trained to produce (cpp/src/ocr_det.cpp:103-121)."""
    return _det_head(_pool2(gray))


def _det_head(ink: np.ndarray) -> np.ndarray:
    """The shared 'DB network' head (horizontal max-dilate + box filter)
    consumed by BOTH probability_map (the legacy/test composition) and
    the fused detect() path — one definition so the two cannot
    desynchronize (TestFusedDetFrontEnd compares them)."""
    ink = _hmax_filter(ink, DILATE_W)
    return _box_filter(ink, WIN_H, WIN_W).astype(np.float32, copy=False)


def _dilate2x2(bitmap: np.ndarray) -> np.ndarray:
    out = bitmap.copy()
    out[1:, :] |= bitmap[:-1, :]
    out[:, 1:] |= bitmap[:, :-1]
    out[1:, 1:] |= bitmap[:-1, :-1]
    return out


def boxes_from_bitmap(
    prob: np.ndarray,
    bitmap: np.ndarray,
    cfg: PPOCRConfig,
) -> tuple[list[np.ndarray], list[float]]:
    """D6: components → min-area rect → gates → unclip. Operates in the
    *resized* coordinate frame; returns float quads + scores.

    Gate order mirrors BoxesFromBitmap (cpp/src/postprocess_op.cpp:246-321):
    candidate cap, sside < min_box_size, score < det_db_box_thresh, unclip,
    sside < min_box_size + 2 post-unclip."""
    comps = connected_component_runs(bitmap, max_components=cfg.max_candidates)
    boxes: list[np.ndarray] = []
    scores: list[float] = []
    for rows, rxs, rxe in comps:
        pts = run_row_extremes(rows, rxs, rxe)
        rect, sside = min_area_rect(pts)
        if sside < cfg.min_box_size:
            continue
        if cfg.det_db_score_mode == "slow":
            # polygon-mask mean: concatenating the row slices in run
            # (scan) order yields the exact 1-D array the old
            # ``prob[ys, xs]`` gather produced — same mean bits — without
            # ever building the per-pixel int64 index arrays
            vals = np.concatenate(
                [prob[r, s:e] for r, s, e
                 in zip(rows.tolist(), rxs.tolist(), rxe.tolist())]
            )
            score = float(vals.mean())
        else:  # 'fast': axis-aligned bbox mean
            x0, x1 = int(rxs.min()), int(rxe.max())
            y0, y1 = int(rows[0]), int(rows[-1]) + 1
            score = float(prob[y0:y1, x0:x1].mean())
        if score < cfg.det_db_box_thresh:
            continue
        dist = unclip_distance(rect, cfg.det_db_unclip_ratio)
        big = expand_rect(order_points_clockwise(rect), dist)
        _, sside2 = min_area_rect(big)
        if sside2 < cfg.min_box_size + 2:
            continue
        h, w = prob.shape
        big[:, 0] = np.clip(big[:, 0], 0, w - 1)
        big[:, 1] = np.clip(big[:, 1], 0, h - 1)
        boxes.append(big)
        scores.append(score)
    return boxes, scores


def filter_tag_det_res(
    boxes: list[np.ndarray],
    ratio_h: float,
    ratio_w: float,
    src_h: int,
    src_w: int,
    min_area_size: int = 4,
) -> list[np.ndarray]:
    """D7: order clockwise, rescale to source coords, clamp, drop boxes with
    either side <= min_area_size (FilterTagDetRes,
    cpp/src/postprocess_op.cpp:323-352)."""
    out = []
    for box in boxes:
        q = order_points_clockwise(box)
        q[:, 0] = np.clip(np.round(q[:, 0] / ratio_w), 0, src_w - 1)
        q[:, 1] = np.clip(np.round(q[:, 1] / ratio_h), 0, src_h - 1)
        qi = q.astype(np.int64)
        rect_w = int(np.hypot(*(qi[0] - qi[1])))
        rect_h = int(np.hypot(*(qi[0] - qi[3])))
        if rect_w <= min_area_size or rect_h <= min_area_size:
            continue
        out.append(qi)
    return out


def sorted_boxes(boxes: list[np.ndarray]) -> list[np.ndarray]:
    """D8: sort by (y, x) of the top-left corner, then one adjacent-swap
    pass: for consecutive boxes with |Δy| < 10, order by x — the reference's
    observable reading order (cpp/src/utility.cpp:443-460)."""
    out = sorted(boxes, key=lambda b: (int(b[0][1]), int(b[0][0])))
    for i in range(len(out) - 1):
        for j in range(i, -1, -1):
            a, b = out[j], out[j + 1]
            if abs(int(b[0][1]) - int(a[0][1])) < 10 and int(b[0][0]) < int(a[0][0]):
                out[j], out[j + 1] = b, a
            else:
                break
    return out


def detect(gray: np.ndarray, cfg: PPOCRConfig) -> list[np.ndarray]:
    """Full det stage on one grayscale image → list of int quads (4,2) in
    source coordinates, reading order."""
    src_h, src_w = gray.shape
    resize_h, resize_w = resize_dims(
        src_h, src_w, cfg.limit_type, cfg.limit_side_len
    )
    ratio_h = resize_h / float(src_h)
    ratio_w = resize_w / float(src_w)
    prob = _det_head(pooled_ink(gray, resize_h, resize_w))
    bitmap = prob > cfg.det_db_thresh
    if cfg.use_dilation:
        bitmap = _dilate2x2(bitmap)
    boxes, _scores = boxes_from_bitmap(prob, bitmap, cfg)
    # geometry lives in stride-2 coordinates: fold STRIDE into the ratios
    boxes = filter_tag_det_res(
        boxes, ratio_h / STRIDE, ratio_w / STRIDE, src_h, src_w,
        cfg.min_area_size,
    )
    return sorted_boxes(boxes)
