"""Deterministic 2-D geometry kernels (pure numpy, no OpenCV).

Implements the reference's detection post-processing geometry from scratch:

- connected components  — replaces cv::findContours for region extraction
  (cpp/src/postprocess_op.cpp:246-263 walks contours; we walk components,
  which is equivalent for filled text blobs)
- convex hull + rotating-calipers min-area rect — replaces cv::minAreaRect
  (used by GetMiniBoxes, cpp/src/postprocess_op.cpp:127-160)
- order_points_clockwise — exact semantics of
  cpp/src/postprocess_op.cpp:82-99 (top-left start, clockwise)
- unclip — Clipper round-join polygon offset by area*ratio/perimeter
  (cpp/src/postprocess_op.cpp:37-67). The reference always feeds convex
  quads and immediately takes minAreaRect of the offset polygon, for which
  the round-join offset reduces exactly to "expand the rect by the offset
  distance along its own axes" — we implement that closed form.
- perspective crop — replaces cv::getPerspectiveTransform/warpPerspective
  (GetRotateCropImage, cpp/src/utility.cpp:163-221), including the
  transpose+flip for vertical text (h >= 1.5*w).
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# connected components (row-run union-find; fast for sparse text masks)
# ---------------------------------------------------------------------------

def connected_component_runs(mask: np.ndarray, max_components: int = 100000):
    """8-connected components of a bool mask as row-run lists.

    Returns a list of (rows, xs, xe) int64 arrays, one per component
    (scan order: rows non-decreasing, runs of one row adjacent), ordered
    by first-encountered row-run. The run form is the cheap one: callers
    that only need per-row extremes or row slices (detection's rect +
    score path) never pay the per-pixel index materialization.
    """
    h, w = mask.shape
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    # extract ALL row-runs in one vectorized pass: pad a False column on
    # each side, flatten row-major, one diff over the whole bitmap — the
    # per-row numpy call overhead (not the union-find) dominated the loop
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = mask
    d = np.diff(padded.reshape(-1))
    starts_f = np.flatnonzero(d == 1)
    ends_f = np.flatnonzero(d == -1)
    rows_of = starts_f // (w + 2)
    xs_all = starts_f - rows_of * (w + 2)
    xe_all = ends_f - rows_of * (w + 2)

    # runs[r] = list of (x_start, x_end_exclusive, label)
    prev_runs: list[tuple[int, int, int]] = []  # runs of row prev_row
    cur: list[tuple[int, int, int]] = []        # runs of the current row
    all_runs: list[tuple[int, int, int, int]] = []  # (row, xs, xe, label)
    prev_row = -2
    # .tolist() once: iterating Python ints beats per-element numpy
    # scalar extraction in this (run-count-bounded) loop
    for r, xs, xe in zip(rows_of.tolist(), xs_all.tolist(), xe_all.tolist()):
        if r != prev_row:
            prev_runs = cur if r == prev_row + 1 else []
            cur = []
            prev_row = r
        lbl = len(parent)
        parent.append(lbl)
        # 8-connectivity: overlap with [xs-1, xe+1) in previous row
        for pxs, pxe, plbl in prev_runs:
            if pxs < xe + 1 and pxe > xs - 1:
                union(lbl, plbl)
        cur.append((xs, xe, lbl))
        all_runs.append((r, xs, xe, lbl))

    groups: dict[int, list[tuple[int, int, int]]] = {}
    order: list[int] = []
    for r, xs, xe, lbl in all_runs:
        root = find(lbl)
        if root not in groups:
            groups[root] = []
            order.append(root)
        groups[root].append((r, xs, xe))
    comps = []
    for root in order[:max_components]:
        runs = groups[root]
        n = len(runs)
        rows = np.fromiter((r[0] for r in runs), np.int64, n)
        rxs = np.fromiter((r[1] for r in runs), np.int64, n)
        rxe = np.fromiter((r[2] for r in runs), np.int64, n)
        comps.append((rows, rxs, rxe))
    return comps


def connected_components(mask: np.ndarray, max_components: int = 100000):
    """8-connected components of a bool mask.

    Returns a list of (ys, xs) integer index arrays, one per component,
    ordered by first-encountered row-run (deterministic scan order) —
    the materialized form of ``connected_component_runs`` (same values,
    same order, per pixel)."""
    comps = []
    for rows, rxs, rxe in connected_component_runs(mask, max_components):
        ys = np.repeat(rows, rxe - rxs)
        xs = np.concatenate(
            [np.arange(s, e, dtype=np.int64)
             for s, e in zip(rxs.tolist(), rxe.tolist())]
        )
        comps.append((ys, xs))
    return comps


def run_row_extremes(rows: np.ndarray, rxs: np.ndarray, rxe: np.ndarray) -> np.ndarray:
    """Per-row min/max x points straight from a component's run list —
    the same point SET as ``row_extremes`` over the materialized pixels
    (``convex_hull`` dedups points through a set, so only the set matters
    to every downstream consumer). Runs arrive row-sorted (scan order)."""
    first = np.concatenate([[True], rows[1:] != rows[:-1]])
    idx = np.flatnonzero(first)
    minx = np.minimum.reduceat(rxs, idx)
    maxx = np.maximum.reduceat(rxe, idx) - 1
    ur = rows[idx]
    return np.concatenate(
        [np.stack([minx, ur], axis=1), np.stack([maxx, ur], axis=1)]
    )


# ---------------------------------------------------------------------------
# convex hull + min-area rect
# ---------------------------------------------------------------------------

def row_extremes(ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Reduce a pixel cloud to its per-row min/max x points — the only
    possible hull vertices — before convex_hull (turns ~10^6 component
    pixels into ~2x rows candidates)."""
    order = np.lexsort((xs, ys))
    ys_s, xs_s = ys[order], xs[order]
    first = np.concatenate([[True], ys_s[1:] != ys_s[:-1]])
    starts = np.flatnonzero(first)
    ends = np.concatenate([starts[1:] - 1, [len(ys_s) - 1]])
    pts = np.concatenate(
        [
            np.stack([xs_s[starts], ys_s[starts]], axis=1),
            np.stack([xs_s[ends], ys_s[ends]], axis=1),
        ]
    )
    return pts


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain. points: (n,2) float/int → hull (m,2) CCW.

    Pure-Python floats (exact float64 arithmetic, same results as the numpy
    formulation) — hull inputs are tiny (~2x rows of a component), where
    per-element numpy call overhead dominates any vectorization win."""
    pts = sorted({(float(p[0]), float(p[1])) for p in np.asarray(points)})
    if len(pts) <= 2:
        return np.array(pts, dtype=np.float64)

    def half(seq):
        out: list[tuple[float, float]] = []
        for p in seq:
            while len(out) >= 2:
                ax = out[-1][0] - out[-2][0]
                ay = out[-1][1] - out[-2][1]
                bx = p[0] - out[-2][0]
                by = p[1] - out[-2][1]
                if ax * by - ay * bx <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def min_area_rect(points: np.ndarray):
    """Rotating calipers min-area rectangle.

    Returns (corners (4,2) float64, sside) where sside is the shorter side —
    the 'ssid' the reference gates on (cpp/src/postprocess_op.cpp:277-279).
    """
    hull = convex_hull(points)
    if len(hull) == 1:
        p = hull[0]
        return np.array([p, p, p, p], dtype=np.float64), 0.0
    if len(hull) == 2:
        a, b = hull
        return np.array([a, b, b, a], dtype=np.float64), 0.0
    # all edges at once; elementwise expressions keep the exact arithmetic
    # (and therefore tie-breaking) of the per-edge scalar loop
    e = np.roll(hull, -1, axis=0) - hull
    norm = np.hypot(e[:, 0], e[:, 1])
    ok = norm >= 1e-12
    norm_safe = np.where(ok, norm, 1.0)
    ux = e[:, 0] / norm_safe
    uy = e[:, 1] / norm_safe
    # projections of every hull point on every edge frame: (n_pts, n_edges)
    px = hull[:, 0, None] * ux[None, :] + hull[:, 1, None] * uy[None, :]
    py = -hull[:, 0, None] * uy[None, :] + hull[:, 1, None] * ux[None, :]
    x0s = px.min(axis=0)
    x1s = px.max(axis=0)
    y0s = py.min(axis=0)
    y1s = py.max(axis=0)
    ws = x1s - x0s
    hs = y1s - y0s
    areas = np.where(ok, ws * hs, math.inf)
    # sequential 1e-9-tolerance improvement rule (first edge wins ties)
    bi = -1
    best_area = math.inf
    for i in range(len(areas)):
        if areas[i] < best_area - 1e-9:
            best_area = areas[i]
            bi = i
    assert bi >= 0
    x0, x1, y0, y1 = x0s[bi], x1s[bi], y0s[bi], y1s[bi]
    bux, buy = ux[bi], uy[bi]
    corners = [
        [cx * bux - cy * buy, cx * buy + cy * bux]
        for cx, cy in ((x0, y0), (x1, y0), (x1, y1), (x0, y1))
    ]
    return np.array(corners), min(ws[bi], hs[bi])


def order_points_clockwise(box: np.ndarray) -> np.ndarray:
    """Exact OrderPointsClockwise semantics
    (cpp/src/postprocess_op.cpp:82-99): sort by x; of the two leftmost the
    upper is corner 0, lower corner 3; of the two rightmost the upper is
    corner 1, lower corner 2."""
    pts = np.asarray(box, dtype=np.float64)
    idx = np.argsort(pts[:, 0], kind="stable")
    left = pts[idx[:2]]
    right = pts[idx[2:]]
    lt, lb = (left[0], left[1]) if left[0][1] <= left[1][1] else (left[1], left[0])
    rt, rb = (right[0], right[1]) if right[0][1] <= right[1][1] else (right[1], right[0])
    return np.array([lt, rt, rb, lb])


# ---------------------------------------------------------------------------
# unclip (polygon offset, closed form for rectangles)
# ---------------------------------------------------------------------------

def unclip_distance(corners: np.ndarray, unclip_ratio: float) -> float:
    """Clipper offset distance: area * ratio / perimeter
    (cpp/src/postprocess_op.cpp:37-50)."""
    x = corners[:, 0]
    y = corners[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    per = np.sum(np.hypot(np.diff(np.append(x, x[0])), np.diff(np.append(y, y[0]))))
    if per < 1e-9:
        return 0.0
    return float(area * unclip_ratio / per)


def expand_rect(corners: np.ndarray, dist: float) -> np.ndarray:
    """Expand an (ordered clockwise) rectangle outward by `dist` along its
    own axes — the minAreaRect of the Clipper round-join offset of a convex
    quad (see module docstring)."""
    c = np.asarray(corners, dtype=np.float64)
    out = np.empty_like(c)
    u = c[1] - c[0]
    v = c[3] - c[0]
    nu = u / max(np.linalg.norm(u), 1e-12)
    nv = v / max(np.linalg.norm(v), 1e-12)
    # PRECONDITION: c is order_points_clockwise output — the fixed sign
    # table pushes each corner outward only for clockwise winding (a CCW
    # quad would be shrunk inward); the sole caller guarantees it
    signs = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    for i, (su, sv) in enumerate(signs):
        out[i] = c[i] + su * dist * nu + sv * dist * nv
    return out


# ---------------------------------------------------------------------------
# perspective crop (GetRotateCropImage analog)
# ---------------------------------------------------------------------------

def _homography(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3x3 homography mapping src (4,2) → dst (4,2) (solve 8x8 system —
    what cv::getPerspectiveTransform does)."""
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def perspective_crop(img: np.ndarray, quad) -> np.ndarray:
    """Warp the quad region to an upright rect of size (crop_w, crop_h)
    where crop_w = max(top,bottom edge len), crop_h = max(left,right edge
    len); then transpose+flip if h >= 1.5*w (vertical text rule,
    cpp/src/utility.cpp:163-221)."""
    q = np.asarray(quad, dtype=np.float64)
    crop_w = int(max(np.linalg.norm(q[0] - q[1]), np.linalg.norm(q[2] - q[3])))
    crop_h = int(max(np.linalg.norm(q[0] - q[3]), np.linalg.norm(q[1] - q[2])))
    crop_w = max(crop_w, 1)
    crop_h = max(crop_h, 1)
    # axis-aligned INTEGER fast path: the identity homography samples
    # exactly the integer-aligned sub-rectangle, so a direct slice is
    # bit-identical to the warp (and most detected boxes are unrotated).
    # Fractional axis-aligned corners must NOT take it — int() would
    # truncate the half-pixel offset and skip the bilinear blend the
    # warp semantics promise — so integrality is part of the condition.
    if (
        q[0][1] == q[1][1]
        and q[2][1] == q[3][1]
        and q[0][0] == q[3][0]
        and q[1][0] == q[2][0]
        and float(q[0][0]).is_integer()
        and float(q[0][1]).is_integer()
    ):
        x0, y0 = int(q[0][0]), int(q[0][1])
        out = img[y0 : y0 + crop_h, x0 : x0 + crop_w]
        if out.shape == (crop_h, crop_w):
            out = np.ascontiguousarray(out)
            if crop_h >= crop_w * 1.5:
                out = np.ascontiguousarray(out.T[::-1])
            return out
    dst = np.array(
        [[0, 0], [crop_w, 0], [crop_w, crop_h], [0, crop_h]], dtype=np.float64
    )
    hmat = _homography(dst, q)  # dest -> src direction
    xs = np.arange(crop_w, dtype=np.float64) + 0.5
    ys = np.arange(crop_h, dtype=np.float64) + 0.5
    # outer-product expansion of the projective map — avoids materializing
    # the 3xHxW point grid (memory traffic matters under 32-way parallelism)
    mx = hmat[0, 0] * xs[None, :] + hmat[0, 1] * ys[:, None] + hmat[0, 2]
    my = hmat[1, 0] * xs[None, :] + hmat[1, 1] * ys[:, None] + hmat[1, 2]
    mw = hmat[2, 0] * xs[None, :] + hmat[2, 1] * ys[:, None] + hmat[2, 2]
    # in-place: sx = mx/mw - 0.5 with identical per-element ops (divide
    # then subtract) — drops two crop-sized float64 temporaries
    np.divide(mx, mw, out=mx)
    mx -= 0.5
    sx = mx
    np.divide(my, mw, out=my)
    my -= 0.5
    sy = my
    h, w = img.shape[:2]
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 2)
    sx -= x0
    np.clip(sx, 0.0, 1.0, out=sx)
    fx = sx.astype(np.float32)
    sy -= y0
    np.clip(sy, 0.0, 1.0, out=sy)
    fy = sy.astype(np.float32)
    # flat gathers straight from the uint8 page (gather-then-astype ==
    # astype-then-gather bit-for-bit): no float32 sub-image is ever
    # materialized — the gathers touch only the cache lines the clamped
    # sample indices hit, the warp's whole read traffic. A non-contiguous
    # page (ROI view) copies only the bounding sub-rect the clamped
    # indices touch, never the whole page — same gathered bytes.
    if img.flags.c_contiguous:
        flat = img.reshape(-1)
        stride = w
        base = y0 * stride + x0
    else:
        by0, bx0 = int(y0.min()), int(x0.min())
        sub = np.ascontiguousarray(
            img[by0 : int(y0.max()) + 2, bx0 : int(x0.max()) + 2]
        )
        flat = sub.reshape(-1)
        stride = sub.shape[1]
        base = (y0 - by0) * stride + (x0 - bx0)
    # in-place accumulation of the SAME left-associated per-element
    # products/sums as the naive 4-term blend — bit-identical, ~half the
    # temporaries (this is the hottest per-box kernel on skewed pages)
    gx = 1 - fx
    gy = 1 - fy
    out = flat[base].astype(np.float32)
    out *= gx
    out *= gy
    t = flat[base + 1].astype(np.float32)
    t *= fx
    t *= gy
    out += t
    t = flat[base + stride].astype(np.float32)
    t *= gx
    t *= fy
    out += t
    t = flat[base + stride + 1].astype(np.float32)
    t *= fx
    t *= fy
    out += t
    np.round(out, out=out)
    np.clip(out, 0, 255, out=out)
    out = out.astype(np.uint8)
    if crop_h >= crop_w * 1.5:
        # transpose + vertical flip — the reference's vertical-text rule
        out = np.ascontiguousarray(out.T[::-1])
    return out
