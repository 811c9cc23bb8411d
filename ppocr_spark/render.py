"""Deterministic page renderer for the synthetic corpus (FIXTURES.md F2).

Renders text lines with the procedural glyph bank onto white pages, black
ink, optional page rotation (skew), optional 180°-flipped lines (to exercise
the angle classifier), returning per-word ground truth: (text, ink bounding
quad clockwise from top-left — the convention of
cpp/src/postprocess_op.cpp:82-99).

Words are separated by a full space cell so the DB-style detector naturally
segments word-level boxes; CJK runs carry no spaces and render as one block
per line. All geometry is integer at scale=2 (24x32 px glyphs) so template
recognition has margin after resize/warp resampling.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ppocr_spark.font import GLYPH_H, GLYPH_W, glyph_bank

SCALE = 2
CELL_W = (GLYPH_W + 2) * SCALE   # 28 px advance per char
CELL_H = (GLYPH_H + 4) * SCALE   # 40 px cell height
LINE_GAP = 16 * SCALE            # inter-line spacing, > unclip reach
MARGIN = 12 * SCALE


@dataclass
class TruthBlock:
    text: str
    quad: list[list[int]]  # 4x2 clockwise from top-left
    line_idx: int


def _split_blocks(line: str) -> list[tuple[int, str]]:
    """(char_offset, word) pairs — blocks split at spaces, the unit the
    detector will naturally segment."""
    out = []
    i = 0
    n = len(line)
    while i < n:
        if line[i] == " ":
            i += 1
            continue
        j = i
        while j < n and line[j] != " ":
            j += 1
        out.append((i, line[i:j]))
        i = j
    return out


def render_page(
    lines: list[str],
    *,
    two_columns: bool = False,
    indents: list[int] | None = None,
    skew_deg: float = 0.0,
    flip_lines: set[int] | None = None,
    gutter_cells: int = 4,
) -> tuple[np.ndarray, list[TruthBlock]]:
    """Render lines → (uint8 page image, truth blocks).

    indents: per-line indent in cells (code-block layout, FIXTURES F2).
    flip_lines: indices of lines rendered rotated 180° in place (cls signal).
    """
    bank = glyph_bank()
    indents = indents or [0] * len(lines)
    flip_lines = flip_lines or set()

    if two_columns and len(lines) >= 2:
        half = (len(lines) + 1) // 2
        cols = [lines[:half], lines[half:]]
        col_indents = [indents[:half], indents[half:]]
    else:
        cols = [lines]
        col_indents = [indents]

    col_w = [
        max((len(ln) + ind) * CELL_W for ln, ind in zip(c, ci)) if c else CELL_W
        for c, ci in zip(cols, col_indents)
    ]
    gutter = gutter_cells * CELL_W
    width = 2 * MARGIN + sum(col_w) + (gutter if len(cols) == 2 else 0)
    height = 2 * MARGIN + max(len(c) for c in cols) * (CELL_H + LINE_GAP) - LINE_GAP

    page = np.full((height, width), 255, dtype=np.uint8)
    blocks: list[TruthBlock] = []
    global_line = 0
    x_base = MARGIN
    for ci, (col, cinds) in enumerate(zip(cols, col_indents)):
        for li, line in enumerate(col):
            y0 = MARGIN + li * (CELL_H + LINE_GAP)
            ind = cinds[li] if li < len(cinds) else 0
            # paint glyphs
            line_cells: list[tuple[int, str]] = []  # (cell_index, char)
            for k, ch in enumerate(line):
                if ch == " " or ch not in bank:
                    continue
                line_cells.append((k + ind, ch))
            for k, ch in line_cells:
                gx = x_base + k * CELL_W + SCALE  # 1-cell-pixel left margin
                gy = y0 + 2 * SCALE
                glyph = np.kron(bank[ch], np.ones((SCALE, SCALE), dtype=bool))
                page[gy : gy + GLYPH_H * SCALE, gx : gx + GLYPH_W * SCALE][glyph] = 0
            flipped = global_line in flip_lines and bool(line_cells)
            if flipped:
                # rotate the whole line strip 180° in place; the angle
                # classifier un-rotates the crop, so the recognized text is
                # the original line (reference C2/C3 behavior)
                ys, ye = y0, y0 + CELL_H
                fxs = x_base + (line_cells[0][0]) * CELL_W
                fxe = x_base + (line_cells[-1][0] + 1) * CELL_W
                page[ys:ye, fxs:fxe] = page[ys:ye, fxs:fxe][::-1, ::-1]
            # ground-truth block: one per line (the detector's granularity —
            # one DB-style box per text line), ink bounding box + line text
            # with single internal spaces
            if line_cells:
                xs = x_base + line_cells[0][0] * CELL_W
                xe = x_base + (line_cells[-1][0] + 1) * CELL_W
                strip = page[y0 : y0 + CELL_H, xs:xe]
                ink = strip < 128
                if ink.any():
                    rows = np.flatnonzero(ink.any(axis=1))
                    colsnz = np.flatnonzero(ink.any(axis=0))
                    bx0, bx1 = xs + int(colsnz[0]), xs + int(colsnz[-1])
                    by0, by1 = y0 + int(rows[0]), y0 + int(rows[-1])
                    quad = [[bx0, by0], [bx1, by0], [bx1, by1], [bx0, by1]]
                    text = " ".join(w for _, w in _split_blocks(line))
                    blocks.append(TruthBlock(text, quad, global_line))
            global_line += 1
        x_base += col_w[ci] + gutter

    if abs(skew_deg) > 1e-9:
        page, blocks = _rotate_page(page, blocks, skew_deg)
    return page, blocks


RULE_W = 3            # ruled-line thickness (px)
TABLE_HPAD = 2 * CELL_W   # inner cell padding; > the det stage's dilation
TABLE_VPAD = LINE_GAP // 2  # reach so neighbouring cells never merge


@dataclass
class TruthCell:
    row: int
    col: int
    x0: int
    y0: int
    x1: int
    y1: int  # inclusive inner region between rules
    rowspan: int = 1
    colspan: int = 1


def render_table(
    cell_texts: list[list[str]],
    merges: list[tuple[int, int, int, int]] | None = None,
    ruled: bool = True,
) -> tuple[np.ndarray, list[TruthCell], list[TruthBlock]]:
    """Render a ruled table → (page, truth cells, truth text blocks).

    ``ruled=False`` renders the SAME layout without painting any rule
    lines (a borderless table): text geometry, truth blocks and the
    frame-based TruthCells are unchanged — only the ink differs. The
    whitespace-gutter truth a borderless detector must reproduce is
    derived from the truth blocks by the caller (corpus generation), not
    here, so detector and truth stay independent.

    cell_texts: R rows × C cols of strings ('' = empty cell). Columns are
    sized to their longest text; every cell text is one short line. Truth
    blocks carry the ink bounding quad (same convention as render_page)
    and line_idx = row * C + col, so the cell a block belongs to is
    recoverable without geometry.

    ``merges``: [(row, col, rowspan, colspan)] spanning regions (the
    colspan/rowspan the reference's table tag stream can express,
    cpp/src/paddlestructure.cpp:222-257). Interior rule segments inside a
    merged region are erased; the anchor cell covers the whole region and
    covered cells are omitted from the truth. Covered cells' texts must
    be ''. Merged regions must not overlap."""
    bank = glyph_bank()
    n_rows = len(cell_texts)
    n_cols = len(cell_texts[0]) if n_rows else 0

    col_w = [
        max(max((len(cell_texts[r][c]) for r in range(n_rows)), default=1), 1)
        * CELL_W
        + 2 * TABLE_HPAD
        for c in range(n_cols)
    ]
    row_h = CELL_H + 2 * TABLE_VPAD

    # rule-line positions (left edge of each rule)
    xs = [MARGIN]
    for c in range(n_cols):
        xs.append(xs[-1] + RULE_W + col_w[c])
    ys = [MARGIN]
    for _ in range(n_rows):
        ys.append(ys[-1] + RULE_W + row_h)

    width = xs[-1] + RULE_W + MARGIN
    height = ys[-1] + RULE_W + MARGIN
    page = np.full((height, width), 255, dtype=np.uint8)

    if ruled:
        for x in xs:  # vertical rules
            page[ys[0] : ys[-1] + RULE_W, x : x + RULE_W] = 0
        for y in ys:  # horizontal rules
            page[y : y + RULE_W, xs[0] : xs[-1] + RULE_W] = 0

    merges = merges or []
    # anchor → (rowspan, colspan); covered (non-anchor) positions
    span_at = {(r, c): (rs, cs) for r, c, rs, cs in merges}
    covered = {
        (r + dr, c + dc)
        for r, c, rs, cs in merges
        for dr in range(rs)
        for dc in range(cs)
        if (dr, dc) != (0, 0)
    }
    # erase interior rule segments inside merged regions (the pixels that
    # make the region ONE cell to any ruled-grid reader)
    for r, c, rs, cs in merges:
        for k in range(c + 1, c + cs):  # interior vertical rules
            page[ys[r] + RULE_W : ys[r + rs], xs[k] : xs[k] + RULE_W] = 255
        for k in range(r + 1, r + rs):  # interior horizontal rules
            page[ys[k] : ys[k] + RULE_W, xs[c] + RULE_W : xs[c + cs]] = 255

    cells: list[TruthCell] = []
    blocks: list[TruthBlock] = []
    for r in range(n_rows):
        for c in range(n_cols):
            if (r, c) in covered:
                continue
            rs, cs = span_at.get((r, c), (1, 1))
            cx0, cx1 = xs[c] + RULE_W, xs[c + cs] - 1
            cy0, cy1 = ys[r] + RULE_W, ys[r + rs] - 1
            cells.append(TruthCell(r, c, cx0, cy0, cx1, cy1, rs, cs))
            text = cell_texts[r][c]
            if not text:
                continue
            tx = cx0 + TABLE_HPAD
            ty = cy0 + TABLE_VPAD
            painted = False
            for k, ch in enumerate(text):
                if ch == " " or ch not in bank:
                    continue
                gx = tx + k * CELL_W + SCALE
                gy = ty + 2 * SCALE
                glyph = np.kron(bank[ch], np.ones((SCALE, SCALE), dtype=bool))
                page[gy : gy + GLYPH_H * SCALE, gx : gx + GLYPH_W * SCALE][
                    glyph
                ] = 0
                painted = True
            if painted:
                strip = page[cy0 : cy1 + 1, cx0 : cx1 + 1]
                ink = strip < 128
                # exclude the (already outside) rules: strip is inner region
                rows_nz = np.flatnonzero(ink.any(axis=1))
                cols_nz = np.flatnonzero(ink.any(axis=0))
                bx0, bx1 = cx0 + int(cols_nz[0]), cx0 + int(cols_nz[-1])
                by0, by1 = cy0 + int(rows_nz[0]), cy0 + int(rows_nz[-1])
                quad = [[bx0, by0], [bx1, by0], [bx1, by1], [bx0, by1]]
                blocks.append(
                    TruthBlock(
                        " ".join(w for _, w in _split_blocks(text)),
                        quad,
                        r * n_cols + c,
                    )
                )
    return page, cells, blocks


def _rotate_page(
    page: np.ndarray, blocks: list[TruthBlock], deg: float
) -> tuple[np.ndarray, list[TruthBlock]]:
    """Rotate the page by `deg` around its center (bilinear, white fill),
    expanding the canvas so nothing clips; rotate truth quads to match."""
    h, w = page.shape
    rad = math.radians(deg)
    c, s = math.cos(rad), math.sin(rad)
    nw = int(math.ceil(abs(w * c) + abs(h * s)))
    nh = int(math.ceil(abs(w * s) + abs(h * c)))
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ncx, ncy = (nw - 1) / 2.0, (nh - 1) / 2.0
    yy, xx = np.mgrid[0:nh, 0:nw]
    # inverse map: dest -> src (rotate by -deg)
    sx = (xx - ncx) * c + (yy - ncy) * s + cx
    sy = -(xx - ncx) * s + (yy - ncy) * c + cy
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    valid = (x0 >= 0) & (x0 < w - 1) & (y0 >= 0) & (y0 < h - 1)
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    p = page.astype(np.float32)
    v = (
        p[y0c, x0c] * (1 - fx) * (1 - fy)
        + p[y0c, x0c + 1] * fx * (1 - fy)
        + p[y0c + 1, x0c] * (1 - fx) * fy
        + p[y0c + 1, x0c + 1] * fx * fy
    )
    out = np.where(valid, v, 255.0)
    out = np.clip(np.round(out), 0, 255).astype(np.uint8)

    new_blocks = []
    for b in blocks:
        quad = []
        for x, y in b.quad:
            nx = (x - cx) * c - (y - cy) * s + ncx
            ny = (x - cx) * s + (y - cy) * c + ncy
            quad.append([int(round(nx)), int(round(ny))])
        new_blocks.append(TruthBlock(b.text, quad, b.line_idx))
    return out, new_blocks
