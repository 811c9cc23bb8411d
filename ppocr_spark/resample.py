"""Deterministic image resampling kernels (pure numpy).

``area_resize`` is the cv2.INTER_AREA analog — pixel-exact box averaging
over fractional source windows — used wherever the pipeline downsamples
(recognition tiles, template construction), because point-sampled bilinear
aliases badly below 0.5x and the recognizer's correlation margin depends on
alias-free tiles.
"""

from __future__ import annotations

import numpy as np


def _axis_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) sparse-ish weight matrix for 1-D box averaging."""
    w = np.zeros((dst, src), dtype=np.float64)
    scale = src / dst
    for i in range(dst):
        a = i * scale
        b = (i + 1) * scale
        j0 = int(np.floor(a))
        j1 = min(int(np.ceil(b)), src)
        for j in range(j0, j1):
            lo = max(a, j)
            hi = min(b, j + 1)
            if hi > lo:
                w[i, j] = hi - lo
        w[i] /= max(w[i].sum(), 1e-12)
    return w


_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _weights(src: int, dst: int) -> np.ndarray:
    key = (src, dst)
    if key not in _CACHE:
        if len(_CACHE) > 4096:
            _CACHE.clear()
        _CACHE[key] = _axis_weights(src, dst)
    return _CACHE[key]


def area_resize(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """Box-average resize of a 2-D float/uint8 array → float32 (nh, nw).

    float32 throughout: weights are exact-enough (row-normalized float64
    rounded once), inputs are 8-bit, and every consumer (recognition
    tiles AND the template bank) shifts consistently — the correlation
    margin is orders of magnitude above the rounding."""
    a = img.astype(np.float32)
    h, w = a.shape
    if h != nh:
        a = _weights32(h, nh) @ a
    if w != nw:
        a = a @ _weights32(w, nw).T
    return a


_CACHE32: dict[tuple[int, int], np.ndarray] = {}


def _weights32(src: int, dst: int) -> np.ndarray:
    key = (src, dst)
    if key not in _CACHE32:
        if len(_CACHE32) > 4096:
            _CACHE32.clear()
        _CACHE32[key] = _weights(src, dst).astype(np.float32)
    return _CACHE32[key]


def batched_area_resize(
    srcs: list[np.ndarray | None], nh: int, nw: int
) -> list[np.ndarray | None]:
    """``area_resize`` over a list, grouped by source shape: same-shape
    tiles share one stacked pair of matmuls. numpy's batched matmul runs
    the SAME gemm per slice as the per-tile call — results are
    bit-identical to mapping ``area_resize`` (goldens pin this); the win
    is amortized per-call overhead, which dominates for glyph-sized
    tiles (segment shapes cluster on a handful of glyph boxes)."""
    out: list[np.ndarray | None] = [None] * len(srcs)
    groups: dict[tuple[int, int], list[int]] = {}
    for i, s in enumerate(srcs):
        if s is None:
            continue
        groups.setdefault(s.shape, []).append(i)
    for (h, w), idxs in groups.items():
        if len(idxs) == 1:
            out[idxs[0]] = area_resize(srcs[idxs[0]], nh, nw)
            continue
        a = np.stack([srcs[i] for i in idxs]).astype(np.float32)
        if h != nh:
            a = np.matmul(_weights32(h, nh), a)
        if w != nw:
            a = np.matmul(a, _weights32(w, nw).T)
        for j, i in enumerate(idxs):
            out[i] = a[j]
    return out
