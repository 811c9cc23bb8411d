"""Layout post-processing — the tbpu stage (T1-T11 in SURVEY.md §2.3).

Re-expression (not a copy) of the reference's text-block processing units
(``api/python/tbpu/``): reading-order sort, paragraph analysis, and
end-separator prediction over the OCR blocks of ONE image. All functions are
pure; the Spark pipeline runs them inside a grouped Arrow UDF.

Observable semantics — including the reference's arithmetic quirks, which
are part of its output contract — are preserved and cited per function.
Blocks are dicts ``{box, text, score, end?}`` exactly like the reference's
client-side schema (``api/python/tbpu/tbpu.py:13-22``).
"""

from __future__ import annotations

import math
import unicodedata
from bisect import bisect_left
from statistics import median

# ---------------------------------------------------------------------------
# word separator (paragraph_parse.py:9-36)
# ---------------------------------------------------------------------------

_CJK_RANGES = (
    (0x4E00, 0x9FFF),
    (0x3040, 0x30FF),
    (0x1100, 0x11FF),
    (0x3130, 0x318F),
    (0xAC00, 0xD7AF),
    (0x3000, 0x303F),
    (0xFE30, 0xFE4F),
    (0xFF00, 0xFFEF),
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def word_separator(tail: str, head: str) -> str:
    """Separator between a block ending in `tail` and one starting with
    `head`: CJK·CJK → '', trailing hyphen → '', leading punctuation → '',
    else ' ' (api/python/tbpu/parser_tools/paragraph_parse.py:9-36)."""
    if _is_cjk(tail) and _is_cjk(head):
        return ""
    if tail == "-":
        return ""
    if unicodedata.category(head).startswith("P"):
        return ""
    return " "


# ---------------------------------------------------------------------------
# T2: deskew preprocessing (line_preprocessing.py)
# ---------------------------------------------------------------------------

ANGLE_THRESHOLD_RAD = math.radians(3)


def _box_angle(box) -> float:
    """Angle of the longer edge, normalized to [-pi/2+th, pi/2+th)
    (line_preprocessing.py:18-40)."""
    w = math.dist(box[0], box[1])
    h = math.dist(box[1], box[2])
    if w < h:
        ang = math.atan2(box[2][1] - box[1][1], box[2][0] - box[1][0])
    else:
        ang = math.atan2(box[1][1] - box[0][1], box[1][0] - box[0][0])
    if ang < -math.pi / 2 + ANGLE_THRESHOLD_RAD:
        ang += math.pi
    elif ang >= math.pi / 2 + ANGLE_THRESHOLD_RAD:
        ang -= math.pi
    return ang


def preprocess_blocks(blocks: list[dict]) -> list[dict]:
    """T2: estimate page rotation (median of per-box angles), derive each
    block's axis-aligned ``nbbox`` (rotating by -angle when above the 3°
    threshold, translating negatives to zero), then sort by bbox top
    (linePreprocessing, line_preprocessing.py:44-95). Mutates and returns."""
    rot = median(_box_angle(b["box"]) for b in blocks)
    if abs(rot) <= ANGLE_THRESHOLD_RAD:
        for b in blocks:
            xs = [p[0] for p in b["box"]]
            ys = [p[1] for p in b["box"]]
            b["nbbox"] = (min(xs), min(ys), max(xs), max(ys))
    else:
        cos_a = math.cos(-rot)
        sin_a = math.sin(-rot)
        min_x = min_y = math.inf
        for b in blocks:
            pts = [
                (cos_a * x - sin_a * y, sin_a * x + cos_a * y) for x, y in b["box"]
            ]
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            bb = (min(xs), min(ys), max(xs), max(ys))
            b["nbbox"] = bb
            min_x = min(min_x, bb[0])
            min_y = min(min_y, bb[1])
        if min_x < 0 or min_y < 0:
            for b in blocks:
                x0, y0, x1, y1 = b["nbbox"]
                b["nbbox"] = (x0 - min_x, y0 - min_y, x1 - min_x, y1 - min_y)
    blocks.sort(key=lambda b: b["nbbox"][1])
    return blocks


# ---------------------------------------------------------------------------
# T3: GapTree reading-order sort (gap_tree.py)
# ---------------------------------------------------------------------------


def _rows_and_cuts(units, page_l, page_r):
    """Sweep top→down grouping vertically-overlapping units into rows; track
    horizontal gaps persisting across consecutive rows → completed vertical
    cut lines (gap_tree.py:88-176). units sorted by top already.

    Returns (cuts=[(l, r, row_start, row_end)], rows=[[unit...]])."""
    page_l -= 1
    page_r += 1
    rows: list[list] = []
    cuts: list[tuple] = []
    live: list[tuple] = []  # (l, r, start_row) gaps under consideration
    i = 0
    n = len(units)
    row_idx = 0
    while i < n:
        bottom = units[i][0][3]
        row = [units[i]]
        while i + 1 < n and units[i + 1][0][1] <= bottom:
            i += 1
            row.append(units[i])
        row.sort(key=lambda u: (u[0][0], u[0][2]))
        # horizontal gaps of this row (left→right uncovered intervals)
        gaps_here = []
        cursor = page_l
        for u in row:
            l, _, r, _ = u[0]
            if l > cursor:
                gaps_here.append((cursor, l, row_idx))
            if r > cursor:
                cursor = r
        gaps_here.append((cursor, page_r, row_idx))
        # intersect live gaps with this row's gaps
        survived: list[tuple] = []
        used_new = [False] * len(gaps_here)
        dropped: list[tuple] = []
        for g in live:
            hit = False
            for k, h in enumerate(gaps_here):
                lo = max(g[0], h[0])
                hi = min(g[1], h[1])
                if lo <= hi:
                    survived.append((lo, hi, g[2]))
                    used_new[k] = True
                    hit = True
            if not hit:
                dropped.append(g)
        for k, h in enumerate(gaps_here):
            if not used_new[k]:
                survived.append(h)
        for g in dropped:
            cuts.append((g[0], g[1], g[2], row_idx - 1))
        live = survived
        rows.append(row)
        i += 1
        row_idx += 1
    for g in live:
        cuts.append((g[0], g[1], g[2], len(rows) - 1))
    cuts.sort(key=lambda c: c[0])
    return cuts, rows


def _build_tree(cuts, rows):
    """Column-block layout tree from cuts+rows (gap_tree.py:191-309)."""
    per_row_gaps: list[list[tuple]] = [[] for _ in rows]
    for cut in cuts:
        for r in range(cut[2], cut[3] + 1):
            per_row_gaps[r].append((cut[0], cut[1]))

    root = {
        "xl": cuts[0][0] - 1,
        "xr": cuts[-1][1] + 1,
        "rt": -1,
        "rb": -1,
        "units": [],
        "children": [],
    }
    done = [root]

    def finish(node):
        # parent = among finished nodes whose horizontal span contains this
        # node's right edge minus 2 and whose bottom row is above this
        # node's top: the lowest, then rightmost (gap_tree.py:218-243)
        probe = node["xr"] - 2
        best_row = -2
        cands: list[dict] = []
        for c in done:
            if probe < c["xl"] or probe > c["xr"] + 1e-4:
                continue
            if c["rb"] >= node["rt"]:
                continue
            if c["rb"] > best_row:
                best_row = c["rb"]
                cands = [c]
            elif c["rb"] == best_row:
                cands.append(c)
        parent = max(cands, key=lambda n: n["xr"])
        parent["children"].append(node)
        done.append(node)

    active: list[dict] = []
    for r, row in enumerate(rows):
        gaps = per_row_gaps[r]
        # close nodes whose edges are no longer continued by this row's gaps
        still: list[dict] = []
        for node in active:
            l_ok = r_ok = False
            broken = False
            for g in gaps:
                if g[1] == node["xl"]:
                    l_ok = True
                if g[0] == node["xr"]:
                    r_ok = True
                if node["xl"] < g[0] < node["xr"] or node["xl"] < g[1] < node["xr"]:
                    broken = True
                    break
            if broken or not l_ok or not r_ok:
                finish(node)
            else:
                node["rb"] = r
                still.append(node)
        active = still
        # place units into the inter-gap intervals
        u = g = 0
        while u < len(row):
            unit = row[u]
            xl = gaps[g][1]
            xr = gaps[g + 1][0]
            if unit[0][0] + 1e-4 > xr:
                g += 1
                continue
            for node in active:
                if node["xl"] == xl and node["xr"] == xr:
                    node["units"].append(unit)
                    break
            else:
                active.append(
                    {
                        "xl": xl,
                        "xr": xr,
                        "rt": r,
                        "rb": r,
                        "units": [unit],
                        "children": [],
                    }
                )
            u += 1
    for node in active:
        finish(node)
    for node in done:
        node["children"].sort(key=lambda n: n["xl"])
        node["units"].sort(key=lambda un: un[0][1])
    return root


def gap_tree_sort(blocks: list[dict]) -> tuple[list[dict], list[list[dict]]]:
    """T3: sort blocks in human reading order via the gap-tree; returns
    (flat sorted blocks, per-column-node block groups) — the groups feed
    per-node paragraph analysis in multi_para (gap_tree.py:19-56)."""
    units = []
    page_l, page_r = math.inf, -1.0
    for b in blocks:
        bb = b["nbbox"]
        units.append((bb, b))
        page_l = min(page_l, bb[0])
        page_r = max(page_r, bb[2])
    units.sort(key=lambda u: u[0][1])
    cuts, rows = _rows_and_cuts(units, page_l, page_r)
    root = _build_tree(cuts, rows)
    # preorder traversal, children left→right (gap_tree.py:312-330)
    stack = [root]
    ordered: list[dict] = []
    groups: list[list[dict]] = []
    while stack:
        node = stack.pop()
        if node["units"]:
            group = [u[1] for u in node["units"]]
            groups.append(group)
            ordered.extend(group)
        stack.extend(reversed(node["children"]))
    return ordered, groups


# ---------------------------------------------------------------------------
# T4: paragraph analysis (paragraph_parse.py:39-173)
# ---------------------------------------------------------------------------

PARA_TH = 1.2


def parse_paragraphs(blocks: list[dict], set_end) -> None:
    """Greedy paragraph grouping over one column's blocks (top→down), then
    the single-line-reattach pass, then end assignment. ``set_end(block,
    sep)`` writes the separator. Running averages and tolerances mirror
    ParagraphParse._parse exactly."""
    units = sorted(blocks, key=lambda b: b["nbbox"][1])
    first = units[0]["nbbox"]
    pl, pr = first[0], first[2]
    p_bottom = first[3]
    line_h = first[3] - first[1]
    line_s: float | None = None
    current = [units[0]]
    paras: list[list[dict]] = []
    spaces: list[float | None] = []
    for u in units[1:]:
        l, top, r, bottom = u["nbbox"]
        ls = top - p_bottom
        if (
            abs(pl - l) <= line_h * PARA_TH
            and abs(pr - r) <= line_h * PARA_TH
            and (line_s is None or ls < line_s + line_h * 0.5)
        ):
            pl = (pl + l) / 2
            pr = (pr + r) / 2
            line_h = (line_h + (bottom - top)) / 2
            line_s = ls if line_s is None else (line_s + ls) / 2
            current.append(u)
        else:
            paras.append(current)
            spaces.append(line_s)
            current = [u]
            pl, pr, line_h = l, r, bottom - top
            line_s = None
        p_bottom = bottom
    paras.append(current)
    spaces.append(line_s)

    # reattach single-line paragraphs to a neighbor (reversed scan,
    # paragraph_parse.py:108-158)
    for i in reversed(range(len(paras))):
        if len(paras[i]) != 1:
            continue
        l, top, r, bottom = paras[i][0]["nbbox"]
        up_ok = down_ok = False
        if i > 0:
            ul, ut, ur, ub = paras[i - 1][-1]["nbbox"]
            uh = ub - ut
            up_ok = abs(ul - l) <= uh * PARA_TH and r <= ur + uh * PARA_TH
            if spaces[i - 1] is not None and top - ub > spaces[i - 1] + uh * 0.5:
                up_ok = False
        if i < len(paras) - 1:
            dl, dt, dr, db = paras[i + 1][0]["nbbox"]
            dh = db - dt
            if dl - dh * PARA_TH <= l <= dl + dh * (1 + PARA_TH):
                if len(paras[i + 1]) > 1:
                    down_ok = abs(dr - r) <= dh * PARA_TH
                else:
                    down_ok = dr - dh * PARA_TH < r
            if spaces[i + 1] is not None and dt - bottom > spaces[i + 1] + dh * 0.5:
                down_ok = False
        if up_ok and down_ok:
            ub = paras[i - 1][-1]["nbbox"][3]
            dt = paras[i + 1][0]["nbbox"][1]
            if top - ub < dt - bottom:
                paras[i - 1].append(paras[i][0])
            else:
                paras[i + 1].insert(0, paras[i][0])
        elif up_ok:
            paras[i - 1].append(paras[i][0])
        elif down_ok:
            paras[i + 1].insert(0, paras[i][0])
        if up_ok or down_ok:
            del paras[i]
            del spaces[i]

    for para in paras:
        for j in range(len(para) - 1):
            sep = word_separator(para[j]["text"][-1], para[j + 1]["text"][0])
            set_end(para[j], sep)
        set_end(para[-1], "\n")


# ---------------------------------------------------------------------------
# T8: line assembly (parser_single_line.py:13-73)
# ---------------------------------------------------------------------------


def assemble_lines(blocks: list[dict]) -> list[list[dict]]:
    """Greedy left→right chaining of blocks into physical lines; sets `end`
    on every block (forced ' ' for gaps > 1.5h, word_separator otherwise,
    '\\n' at line end); lines returned sorted by top. The gap height formula
    ``h = (bottom1 + bottom2 - top1 - LEFT2) / 2`` reproduces the
    reference's own arithmetic (parser_single_line.py:49 uses l2 where t2
    was presumably intended — the quirk is part of the observable
    contract)."""
    pool: list[dict | None] = sorted(blocks, key=lambda b: b["nbbox"][0])
    lines: list[list[dict]] = []
    for i, anchor in enumerate(pool):
        if anchor is None:
            continue
        l1, t1, r1, b1 = anchor["nbbox"]
        h1 = b1 - t1
        line = [anchor]
        for j in range(i + 1, len(pool)):
            cand = pool[j]
            if cand is None:
                continue
            l2, t2, r2, b2 = cand["nbbox"]
            h2 = b2 - t2
            if l2 < r1 - h1:
                continue
            if t2 < t1 - h1 * 0.5 or b2 > b1 + h1 * 0.5:
                continue
            if abs(h1 - h2) > min(h1, h2) * 0.5:
                continue
            line.append(cand)
            pool[j] = None
            r1 = r2
        for k in range(len(line) - 1):
            al, at, ar, ab = line[k]["nbbox"]
            bl, bt, br, bb_ = line[k + 1]["nbbox"]
            h = (ab + bb_ - at - bl) * 0.5  # reference formula, see docstring
            if bl - ar > h * 1.5:
                line[k]["end"] = " "
            else:
                line[k]["end"] = word_separator(
                    line[k]["text"][-1], line[k + 1]["text"][0]
                )
        line[-1]["end"] = "\n"
        lines.append(line)
        pool[i] = None
    lines.sort(key=lambda ln: ln[0]["nbbox"][1])
    return lines


# ---------------------------------------------------------------------------
# T11 helpers: code-block merge + indent (parser_single_code.py)
# ---------------------------------------------------------------------------


def merge_line_blocks(line: list[dict]) -> dict:
    """Merge one line's blocks into a single block: inter-block gaps become
    round(gap / running-average-height) double-spaces, bbox unioned, score
    averaged (parser_single_code.py:13-42)."""
    head = line[0]
    box = [list(p) for p in head["box"]]
    avg_h = box[3][1] - box[0][1]
    score_sum = head["score"]
    text = head["text"]
    for blk in line[1:]:
        bb = blk["box"]
        avg_h = (avg_h + bb[3][1] - bb[0][1]) / 2
        spaces = 0
        if bb[0][0] > box[1][0]:
            spaces = round((bb[0][0] - box[1][0]) / avg_h)
        text += "  " * spaces + blk["text"]
        y_top = min(box[0][1], box[1][1], bb[0][1], bb[1][1])
        y_bot = max(box[2][1], box[3][1], bb[2][1], bb[3][1])
        x_l = min(box[0][0], box[3][0], bb[0][0], bb[3][0])
        x_r = max(box[1][0], box[2][0], bb[1][0], bb[2][0])
        box[0][1] = box[1][1] = y_top
        box[2][1] = box[3][1] = y_bot
        box[0][0] = box[3][0] = x_l
        box[1][0] = box[2][0] = x_r
        score_sum += blk["score"]
    return {
        "box": box,
        "text": text,
        "score": score_sum / len(line),
        "end": "\n",
    }


def apply_indent(blocks: list[dict]) -> None:
    """Bucket line-start x offsets into line-height-sized indent levels and
    prefix '  ' * level; left edges snapped to the minimum
    (parser_single_code.py:44-67)."""
    if not blocks:
        return
    lh = sum(b["box"][3][1] - b["box"][0][1] for b in blocks) / len(blocks)
    x_min = min(b["box"][0][0] for b in blocks)
    x_max = max(b["box"][0][0] for b in blocks)
    levels: list[float] = []
    x = x_min
    while x < x_max:
        levels.append(x)
        x += lh
    half = lh / 2
    for b in blocks:
        level = bisect_left(levels, b["box"][0][0] + half) - 1
        b["text"] = "  " * level + b["text"]
        b["box"][0][0] = b["box"][3][0] = x_min


# ---------------------------------------------------------------------------
# parser compositions (T1, T5-T11) — registry mirrors tbpu/__init__.py:14-29
# ---------------------------------------------------------------------------


def _strip_nbbox(blocks: list[dict]) -> list[dict]:
    for b in blocks:
        b.pop("nbbox", None)
    return blocks


def parser_none(blocks: list[dict]) -> list[dict]:
    """T1: default end='\\n' (parser_none.py:10-14)."""
    for b in blocks:
        b.setdefault("end", "\n")
    return blocks


def parser_multi_para(blocks: list[dict]) -> list[dict]:
    """T5: deskew → gap-tree sort → per-column paragraph analysis."""
    blocks = preprocess_blocks(blocks)
    ordered, groups = gap_tree_sort(blocks)
    def set_end(b, sep):
        b["end"] = sep
    for group in groups:
        parse_paragraphs(group, set_end)
    return _strip_nbbox(ordered)


def parser_multi_line(blocks: list[dict]) -> list[dict]:
    """T6: deskew → gap-tree sort → every block '\\n'."""
    blocks = preprocess_blocks(blocks)
    ordered, _ = gap_tree_sort(blocks)
    for b in ordered:
        b["end"] = "\n"
    return _strip_nbbox(ordered)


def parser_multi_none(blocks: list[dict]) -> list[dict]:
    """T7: deskew → gap-tree sort → word_separator between consecutive
    blocks, '\\n' on the last."""
    blocks = preprocess_blocks(blocks)
    ordered, _ = gap_tree_sort(blocks)
    for i, b in enumerate(ordered):
        if i < len(ordered) - 1:
            b["end"] = word_separator(b["text"][-1], ordered[i + 1]["text"][0])
        else:
            b["end"] = "\n"
    return _strip_nbbox(ordered)


def parser_single_line(blocks: list[dict]) -> list[dict]:
    """T8: deskew → line assembly → flatten."""
    blocks = preprocess_blocks(blocks)
    lines = assemble_lines(blocks)
    return _strip_nbbox([b for line in lines for b in line])


def parser_single_para(blocks: list[dict]) -> list[dict]:
    """T9: lines → synthetic per-line blocks → paragraph analysis over
    lines → unpack. The synthetic line bbox accumulates with the
    reference's own min/max mix-up (parser_single_para.py:28-33:
    ``b2 = max(b1, bb[2]); b3 = max(b1, bb[3])``) — quirk preserved."""
    blocks = preprocess_blocks(blocks)
    lines = assemble_lines(blocks)
    pseudo = []
    for line in lines:
        b0, b1, b2, b3 = line[0]["nbbox"]
        for blk in line[1:]:
            bb = blk["nbbox"]
            b1 = min(b1, bb[1])
            b2 = max(b1, bb[2])  # sic — reference arithmetic
            b3 = max(b1, bb[3])  # sic
        pseudo.append(
            {
                "nbbox": (b0, b1, b2, b3),
                "text": line[0]["text"][0] + line[-1]["text"][-1],
                "line": line,
            }
        )
    def set_end(pb, sep):
        pb["line"][-1]["end"] = sep
    parse_paragraphs(pseudo, set_end)
    return _strip_nbbox([b for pb in pseudo for b in pb["line"]])


def parser_single_none(blocks: list[dict]) -> list[dict]:
    """T10: single_line, then '\\n' (except the final block) rewritten via
    word_separator (parser_single_none.py:11-19)."""
    out = parser_single_line(blocks)
    for i in range(len(out) - 1):
        if out[i]["end"] == "\n":
            out[i]["end"] = word_separator(out[i]["text"][-1], out[i + 1]["text"][0])
    return out


def parser_single_code(blocks: list[dict]) -> list[dict]:
    """T11: lines merged one-block-per-line with gap-proportional double
    spaces, then indent reconstruction."""
    blocks = preprocess_blocks(blocks)
    lines = assemble_lines(blocks)
    merged = [merge_line_blocks(line) for line in lines]
    apply_indent(merged)
    return merged


PARSERS = {
    "none": parser_none,
    "multi_para": parser_multi_para,
    "multi_line": parser_multi_line,
    "multi_none": parser_multi_none,
    "single_para": parser_single_para,
    "single_line": parser_single_line,
    "single_none": parser_single_none,
    "single_code": parser_single_code,
}


def run_parser(name: str, blocks: list[dict]) -> list[dict]:
    """Dispatch by config string (GetParser, tbpu/__init__.py:31-34).
    Empty input → empty output (the reference never calls tbpu with no
    blocks; we make that path total)."""
    if not blocks:
        return []
    return PARSERS[name](blocks)


def assemble_text(blocks: list[dict]) -> str:
    """Concatenate text+end over ordered blocks — the span text of an OCR'd
    media span (FIXTURES.md F3). A trailing final '\\n' is stripped so span
    text round-trips cleanly."""
    s = "".join(b["text"] + b.get("end", "\n") for b in blocks)
    return s[:-1] if s.endswith("\n") else s
