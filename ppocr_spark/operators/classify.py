"""Angle classification — the cls stage (C1-C3 in SURVEY.md §2.2).

The reference runs a learned 2-class (0°/180°) classifier
(cpp/src/ocr_cls.cpp:20-105) and rotates a crop when
``label % 2 == 1 and score > cls_thresh`` (cpp/src/paddleocr.cpp:126-137).

This engine's from-scratch classifier is a real discriminative forward
pass: it evaluates the recognition template correlation of the crop in both
orientations and softmaxes the two evidence scores — upside-down text
correlates poorly against the (orientation-asymmetric, enforced at font
generation) glyph bank. C1's fixed-shape resize+pad
(3x48x192 → here 48x192 grayscale, cpp/src/preprocess_op.cpp:118-135)
is provided as the standalone ``cls_resize`` (golden-pinned); the
``classify()`` forward itself resizes proportionally per segment batch
(documented at its call site) — evaluating correlation on the fixed
192-wide pad would waste the width budget on short crops without
changing the argmax.
"""

from __future__ import annotations

import numpy as np

from ppocr_spark.font import GLYPH_H, GLYPH_W, template_stack
from ppocr_spark.operators.detect import _bilinear_resize
from ppocr_spark.operators.recognize import _segments
from ppocr_spark.resample import batched_area_resize

CLS_H = 48
CLS_W = 192
CLS_SOFTMAX_TEMP = 12.0


def cls_resize(crop: np.ndarray) -> np.ndarray:
    """C1: resize keeping ratio to height 48, right-pad with white to 192
    (ClsResizeImg + zero-pad, cpp/src/ocr_cls.cpp:49-54 — the reference
    pads with 0 in normalized space; white is our background fiber)."""
    h, w = crop.shape
    ratio = w / float(h)
    rw = CLS_W if int(np.ceil(CLS_H * ratio)) > CLS_W else int(np.ceil(CLS_H * ratio))
    out = _bilinear_resize(crop, CLS_H, max(rw, 1))
    if out.shape[1] < CLS_W:
        pad = np.full((CLS_H, CLS_W - out.shape[1]), 255, dtype=np.uint8)
        out = np.concatenate([out, pad], axis=1)
    return out


def _orientation_evidence(img: np.ndarray) -> float:
    """Mean best template correlation over the crop's segments."""
    templates, _ = template_stack()
    ink = img < 128
    segs = _segments(ink)
    if not segs:
        return 0.0
    srcs: list[np.ndarray | None] = []
    for s, e in segs[:4]:  # cap work; 4 segments is plenty of evidence
        seg = ink[:, s:e]
        rnz = np.flatnonzero(seg.any(axis=1))
        srcs.append(
            img[rnz[0] : rnz[-1] + 1, s:e] if rnz.size else None
        )
    feats: list[np.ndarray] = []
    for tile in batched_area_resize(srcs, GLYPH_H, GLYPH_W):
        if tile is None:
            continue
        feat = (255.0 - tile).reshape(-1) / 255.0
        feat -= feat.mean()
        nrm = np.linalg.norm(feat)
        if nrm < 1e-6:
            continue
        feats.append(feat / nrm)
    if not feats:
        return 0.0
    # one matmul for all segments — k independent columns. BLAS gemm vs
    # per-segment gemv is NOT guaranteed bit-identical (cls decisions are
    # ulp-sensitive here); the current results are pinned by golden tests,
    # so any BLAS/threading change must re-run the goldens, not assume
    # equivalence
    corr = templates @ np.stack(feats, axis=1)
    return float(corr.max(axis=0).mean())


def classify(crop: np.ndarray) -> tuple[int, float]:
    """C2: label (0 = upright, 1 = rotated 180°) + softmax score.

    Evidence is computed at height 48 with *proportional* width — the
    reference's fixed 192-px cls width (a learned CNN tolerates the squeeze)
    would alias our template correlation into noise on wide line crops."""
    h, w = crop.shape
    # evidence uses <=4 segments, so only the crop ends matter: resize just
    # the leftmost slice for 0° and the rightmost (flipped) for 180° —
    # resizing the full width of a long line crop would dominate cls cost
    span = min(w, 8 * h)
    left = crop[:, :span]
    right = crop[:, w - span:]
    ratio = span / float(h)
    rw = max(int(np.ceil(CLS_H * ratio)), 1)
    e0 = _orientation_evidence(_bilinear_resize(left, CLS_H, rw))
    e180 = _orientation_evidence(
        _bilinear_resize(np.ascontiguousarray(right[::-1, ::-1]), CLS_H, rw)
    )
    logits = np.array([e0, e180]) * CLS_SOFTMAX_TEMP
    ex = np.exp(logits - logits.max())
    p = ex / ex.sum()
    label = int(np.argmax(p))
    return label, float(p[label])


def classify_batch(
    crops: list[np.ndarray], batch_num: int = 1
) -> list[tuple[int, float]]:
    """Batched C2 — batch_num mirrors cls_batch_num (cpp/src/args.cpp:57);
    computation is per-crop, the batching is the Arrow-batch contract."""
    return [classify(c) for c in crops]


def maybe_rotate(
    crop: np.ndarray, label: int, score: float, cls_thresh: float
) -> np.ndarray:
    """C3: rotate 180° iff label is odd and score above threshold
    (cpp/src/paddleocr.cpp:126-137)."""
    if label % 2 == 1 and score > cls_thresh:
        return np.ascontiguousarray(crop[::-1, ::-1])
    return crop
