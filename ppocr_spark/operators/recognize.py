"""Text recognition — the CRNN+CTC rec stage (R1-R4 in SURVEY.md §2.2).

The reference runs a learned CRNN (cpp/src/ocr_rec.cpp:73-92) and a greedy
CTC decode (cpp/src/ocr_rec.cpp:94-132). This engine's from-scratch forward
pass is a real computation over pixels, not a lookup:

  R1 aspect-ratio sort — sort the batch by w/h so padded widths cluster,
     results restored via the index map (cpp/src/utility.cpp:224-237,
     cpp/src/ocr_rec.cpp:30-35,128-129). Executor-local, also our
     intra-batch skew control.
  R2 resize — crop scaled to fixed H (rec_img_h=48), width proportional,
     capped at int(H * max_wh_ratio) per batch, right-padded
     (CrnnResizeImg, cpp/src/preprocess_op.cpp:93-116).
  R3 forward — column-projection segmentation + per-segment normalized
     template correlation against the glyph bank, softmax over classes →
     a T x C probability grid (T = 2 timesteps per segment + blank
     separators, exercising CTC's repeat/blank collapse honestly).
  R4 CTC greedy decode — per-timestep argmax, skip blank(0) and repeats,
     text = concat dict[idx], score = mean(max prob over kept steps),
     NaN → drop (cpp/src/ocr_rec.cpp:94-132). Dict layout: '#' blank
     prepended, ' ' appended (cpp/include/ocr_rec.h:51-54).
"""

from __future__ import annotations

import numpy as np

from ppocr_spark.font import GLYPH_H, GLYPH_W, char_dict, template_stack
from ppocr_spark.operators.detect import _bilinear_resize
from ppocr_spark.resample import batched_area_resize

SOFTMAX_TEMP = 24.0
#: a horizontal gap wider than this fraction of the median segment width
#: decodes as a space (the ' ' class appended to the dict). Measured on
#: the synthetic corpus renderings (BENCH/BASELINE.md cross-scale
#: band): intra-letter gaps cluster at ~0.2-0.5x the median glyph
#: width and inter-word gaps at ~1.4-1.9x; the original 1.5 cut INSIDE
#: the word-gap cluster (gaps of 1.43-1.48x read as letter spacing,
#: deleting spaces on 3 of the 4 divergent sf0.1 images), while 1.0
#: separates the two clusters with margin on both sides.
SPACE_GAP_FRAC = 1.0


def _segments(ink: np.ndarray) -> list[tuple[int, int]]:
    """Maximal runs of columns containing ink → [(x0, x1_exclusive)]."""
    cols = ink.any(axis=0)
    if not cols.any():
        return []
    d = np.diff(np.concatenate([[0], cols.astype(np.int8), [0]]))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return [(int(s), int(e)) for s, e in zip(starts, ends)]


def forward_probs(crop: np.ndarray, lang: str = "full") -> np.ndarray:
    """R3: one crop (uint8 gray) → (T, C) probability grid.

    C = len(char_dict(lang)) = 1 blank + charset + space; ``lang``
    selects the per-language dict (the reference's per-language
    rec_char_dict_path analog)."""
    templates, labels = template_stack(lang)
    dict_size = len(labels) + 2  # blank + labels + space
    space_cls = dict_size - 1
    ink = crop < 128
    segs = _segments(ink)
    rows: list[np.ndarray] = []
    blank = np.zeros(dict_size, dtype=np.float32)
    blank[0] = 1.0
    if not segs:
        return np.stack([blank, blank])
    widths = [e - s for s, e in segs]
    med_w = float(np.median(widths))
    # pass 1: extract segment source tiles (Python loop — tile shapes
    # differ before the resize); the area resizes are then batched PER
    # SOURCE SHAPE (glyph segments cluster heavily on a few shapes), and
    # normalization + template correlation batch over ALL segments at
    # once. Per-slice matmuls inside the batched resize are the same
    # gemms as the per-tile calls — bit-identical, pinned by goldens.
    srcs: list[np.ndarray | None] = []
    space_before: list[bool] = []
    prev_end: int | None = None
    for (s, e) in segs:
        space_before.append(
            prev_end is not None and (s - prev_end) > SPACE_GAP_FRAC * med_w
        )
        prev_end = e
        seg = ink[:, s:e]
        rnz = np.flatnonzero(seg.any(axis=1))
        if rnz.size == 0:
            srcs.append(None)
            continue
        srcs.append(crop[rnz[0] : rnz[-1] + 1, s:e])
    tiles = batched_area_resize(srcs, GLYPH_H, GLYPH_W)

    vstack = [t for t in tiles if t is not None]
    feats: list[np.ndarray | None]
    if vstack:
        # grayscale ink fraction — anti-aliased edges carry subpixel signal
        m = (255.0 - np.stack(vstack).reshape(len(vstack), -1)) / 255.0
        m -= m.mean(axis=1, keepdims=True)
        nrm = np.sqrt((m * m).sum(axis=1))
        ok = nrm >= 1e-6
        m /= np.maximum(nrm, 1e-12)[:, None]
        feats = []
        j = 0
        for t in tiles:
            if t is None:
                feats.append(None)
            else:
                feats.append(m[j] if ok[j] else None)
                j += 1
    else:
        feats = [None] * len(tiles)

    valid = [f for f in feats if f is not None]
    if valid:
        corr_all = np.stack(valid) @ templates.T  # (n_valid, n_labels)
        logits = np.full((len(valid), dict_size), -4.0, dtype=np.float32)
        logits[:, 1 : 1 + len(labels)] = corr_all * SOFTMAX_TEMP
        ex = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs_all = (ex / ex.sum(axis=1, keepdims=True)).astype(np.float32)
    vi = 0
    # a dead segment (zero-norm tile — e.g. a solid bar) must not
    # swallow a pending inter-word space: carry it to the next live
    # segment (no-op on crops without dead segments, which is every
    # golden/corpus input)
    pending_space = False
    for f, sp_before in zip(feats, space_before):
        if f is None:
            pending_space = pending_space or sp_before
            continue
        if sp_before or pending_space:
            sp = np.zeros(dict_size, dtype=np.float32)
            sp[space_cls] = 1.0
            rows.extend([blank, sp])
        pending_space = False
        prob = probs_all[vi]
        vi += 1
        # two identical timesteps per segment + a blank separator: real CTC
        # inputs (repeats collapse, blanks delimit)
        rows.extend([blank, prob, prob])
    rows.append(blank)
    return np.stack(rows)


def ctc_greedy_decode(probs: np.ndarray, lang: str = "full") -> tuple[str, float]:
    """R4: greedy CTC over a (T, C) grid with the reference's exact
    semantics — argmax per step, skip blank(0), skip repeats, score =
    mean(max prob) over kept steps; empty/NaN → ('', -1.0)."""
    dictionary = char_dict(lang)
    idx = probs.argmax(axis=1)
    mx = probs.max(axis=1)
    chars: list[str] = []
    kept: list[float] = []
    last = 0
    for t in range(len(idx)):
        c = int(idx[t])
        if c != 0 and c != last:
            chars.append(dictionary[c])
            kept.append(float(mx[t]))
        last = c
    if not kept:
        return "", -1.0
    score = float(np.mean(kept))
    if np.isnan(score):
        return "", -1.0
    return "".join(chars), score


def resize_norm(crop: np.ndarray, img_h: int, max_wh_ratio: float) -> np.ndarray:
    """R2: scale to fixed height, proportional width capped at
    int(img_h * max_wh_ratio), right-pad with white."""
    h, w = crop.shape
    img_w = int(img_h * max_wh_ratio)
    ratio = w / float(h)
    resize_w = img_w if int(np.ceil(img_h * ratio)) > img_w else int(
        np.ceil(img_h * ratio)
    )
    resized = _bilinear_resize(crop, img_h, max(resize_w, 1))
    if resized.shape[1] < img_w:
        pad = np.full((img_h, img_w - resized.shape[1]), 255, dtype=np.uint8)
        resized = np.concatenate([resized, pad], axis=1)
    return resized


def recognize_batch(
    crops: list[np.ndarray],
    img_h: int = 48,
    batch_num: int = 6,
    lang: str = "full",
) -> list[tuple[str, float]]:
    """R1-R4 over a list of crops: aspect-ratio argsort, sub-batches of
    `batch_num` sharing a max_wh_ratio, per-crop forward+decode, results
    restored to input order. ``lang`` selects the recognition dict."""
    n = len(crops)
    if n == 0:
        return []
    ratios = [c.shape[1] / float(c.shape[0]) for c in crops]
    order = np.argsort(ratios, kind="stable")
    results: list[tuple[str, float]] = [("", -1.0)] * n
    for b0 in range(0, n, batch_num):
        idxs = order[b0 : b0 + batch_num]
        # floor of 1.0 (each crop's own ratio is in the max; the floor
        # only pads, and _segments ignores white padding)
        max_ratio = max(1.0, *(ratios[i] for i in idxs))
        for i in idxs:
            norm = resize_norm(crops[i], img_h, max_ratio)
            probs = forward_probs(norm, lang)
            results[i] = ctc_greedy_decode(probs, lang)
    return results
