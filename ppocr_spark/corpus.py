"""Deterministic synthetic corpus of interleaved text+media documents.

Implements FIXTURES.md F1-F3: the ``documents`` table (doc_id, spans),
the ``media`` side table (media_ref → PNG bytes + ground truth), and the
``expected_spans`` golden table — the span-sequence-equality oracle
(kind, text, media_ref, order) per BASELINE.json.

Everything is seeded (seed=42, per-entity sub-seeds); no wall clock, no
unseeded RNG; byte-for-byte reproducible.

Expected media text is computed at generation time by running the real
detector on the rendered page, asserting a 1:1 box↔truth-line mapping
(generation FAILS if detection is broken — no silent drift), assigning the
*known source text* to each box, and running the configured tbpu parser
over the detected geometry. The pipeline must then reproduce that text via
actual recognition — recognition accuracy is what the e2e equality tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ppocr_spark.config import PPOCRConfig
from ppocr_spark.font import _CJK, glyph_bank
from ppocr_spark.operators.detect import detect
from ppocr_spark.operators.layout import assemble_text, run_parser
from ppocr_spark.png import encode_gray
from ppocr_spark.render import render_page
from ppocr_spark.status import StatusCode

SEED = 42

# CHARSET-safe word pools (every char must be in the glyph bank)
_LATIN_WORDS = (
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs spark engine document span media text line column layout "
    "paragraph detect classify recognize batch shuffle partition broadcast "
    "salt skew manifest resume lineage metric vector table scan filter "
    "join window sort limit union agg hash range bucket codec glyph pixel "
    "quad warp crop angle rotate decode encode score index offset order"
).split()

_PUNCT_TAIL = [".", ",", "!", "?", ":", ";"]


@dataclass
class MediaSpec:
    media_ref: str
    content: bytes | None
    truth_lines: list[str]
    expected_text: str
    expected_code: int
    expected_blocks: list[dict] | None = None  # laid blocks (box/text/end)
    # (width, height, ink_ratio, feat_sum)
    meta: tuple[int, int, float, float] | None = None


def _rng(*parts) -> np.random.Generator:
    """Seeded RNG from structural parts. Uses crc32, NOT Python hash() —
    str hash is salted per process and would break reproducibility across
    executors."""
    import zlib

    seed = SEED
    for p in parts:
        v = p if isinstance(p, int) else zlib.crc32(str(p).encode())
        seed = (seed * 1_000_003 + v) % (2**31)
    return np.random.default_rng(seed)


def _latin_line(rng: np.random.Generator, min_w=2, max_w=6) -> str:
    n = int(rng.integers(min_w, max_w + 1))
    words = [str(rng.choice(_LATIN_WORDS)) for _ in range(n)]
    if rng.random() < 0.2:
        words[-1] += str(rng.choice(_PUNCT_TAIL))
    return " ".join(words)


def _cjk_line(rng: np.random.Generator) -> str:
    n = int(rng.integers(4, 11))
    idx = rng.integers(0, len(_CJK), size=n)
    return "".join(_CJK[i] for i in idx)


def _text_span_payload(rng: np.random.Generator) -> str:
    """Raw text for a text span: Latin / CJK / mixed / trailing hyphen /
    leading punct / whitespace-dirty / empty-after-trim (FIXTURES F1)."""
    kind = rng.random()
    if kind < 0.40:
        s = _latin_line(rng, 3, 9)
    elif kind < 0.55:
        s = _cjk_line(rng)
    elif kind < 0.65:
        s = _latin_line(rng, 2, 4) + " " + _cjk_line(rng)
    elif kind < 0.72:
        s = _latin_line(rng, 2, 5) + "-"
    elif kind < 0.79:
        s = "." + _latin_line(rng, 2, 5)
    elif kind < 0.94:
        s = "  " + _latin_line(rng, 2, 6) + "\t "
    else:
        s = "   "  # empty after trim → NO_TEXT analog
    return s


def normalize_text_span(raw: str | None) -> tuple[str, int]:
    """The text-branch normalizer: collapse whitespace runs to single
    spaces, strip ends. Empty result → NO_TEXT(101), else OK(100). This is
    the boilerplate-strip analog of the north_star; implemented in Spark
    built-ins in the pipeline (regexp_replace + trim), mirrored here for
    golden generation."""
    s = " ".join((raw or "").split())
    return (s, int(StatusCode.OK)) if s else ("", int(StatusCode.NO_TEXT))


# ---------------------------------------------------------------------------
# media image pool
# ---------------------------------------------------------------------------


def _render_spec(i: int, cfg: PPOCRConfig) -> MediaSpec:
    """Render image i of the pool and derive its expected OCR output."""
    ref = f"img_{i:08d}"
    rng = _rng("media", i)
    flavor = rng.random()

    if flavor < 0.03:  # blank page → NO_TEXT
        h = int(rng.integers(96, 300))
        w = int(rng.integers(96, 300))
        img = np.full((h, w), 255, dtype=np.uint8)
        return MediaSpec(ref, encode_gray(img), [], "", int(StatusCode.NO_TEXT),
                         [], _meta_of(img))
    if flavor < 0.05:  # undecodable bytes → PATH_READ_FAIL analog
        junk = bytes(_rng("junk", i).integers(0, 256, size=64, dtype=np.uint8))
        return MediaSpec(ref, junk, [], "", int(StatusCode.PATH_READ_FAIL),
                         [], None)

    n_lines = int(rng.integers(1, 7))
    cjk_doc = rng.random() < 0.2
    kw: dict = {}
    layout = rng.random()
    two_col = layout < 0.2 and n_lines >= 4
    # two-column pages: shorter lines + a wide gutter so the gutter stays
    # >64 px after the 960-px det resize (gutter must out-gap the det
    # model's dilation+window reach at the smallest resize ratio)
    max_words = 5 if two_col else 8
    lines = [
        _cjk_line(rng) if cjk_doc else _latin_line(rng, 2, max_words)
        for _ in range(n_lines)
    ]
    if two_col:
        kw["two_columns"] = True
        kw["gutter_cells"] = 8
    elif layout < 0.3:
        kw["skew_deg"] = float(rng.uniform(-2.5, 2.5))
    elif layout < 0.35:
        kw["skew_deg"] = float(rng.choice([-1, 1])) * float(rng.uniform(5.0, 7.0))
    elif layout < 0.42 and cfg.cls:
        kw["flip_lines"] = {int(j) for j in range(n_lines) if _rng("flip", i, j).random() < 0.4}

    img, truth = render_page(lines, **kw)
    expected, code, laid = _expected_for_page(img, truth, ref, cfg)
    return MediaSpec(ref, encode_gray(img), lines, expected, code, laid,
                     _meta_of(img))


def _meta_of(img) -> tuple[int, int, float, float]:
    """(width, height, ink_ratio, feat_sum) — the image_metadata and
    image_features ground truth, computed with the identical expressions
    the UDFs use ((img < 128).mean(); 4x4 area-pooled ink sum)."""
    from ppocr_spark.resample import area_resize

    pooled = area_resize((255.0 - img.astype(np.float32)) / 255.0, 4, 4)
    feat_sum = float(sum(float(x) for x in pooled.reshape(-1)))
    return (int(img.shape[1]), int(img.shape[0]),
            float((img < 128).mean()), feat_sum)


def _expected_for_page(img, truth, ref: str, cfg: PPOCRConfig):
    """Run the real detector over a rendered page, assert a 1:1 box↔truth
    mapping, assign known source text, run the tbpu parser → the expected
    OCR output for that page. Fails loudly if detection is broken."""
    boxes = detect(img, cfg)
    truth_sorted = truth
    assigned: list[str] = []
    used = set()
    for b in boxes:
        cx = float(np.mean([p[0] for p in b]))
        cy = float(np.mean([p[1] for p in b]))
        best, best_d = None, None
        for k, t in enumerate(truth_sorted):
            if k in used:
                continue
            tx = (t.quad[0][0] + t.quad[2][0]) / 2
            ty = (t.quad[0][1] + t.quad[2][1]) / 2
            d = (tx - cx) ** 2 + (ty - cy) ** 2
            if best_d is None or d < best_d:
                best, best_d = k, d
        if best is None:
            raise RuntimeError(f"{ref}: more boxes than truth lines")
        used.add(best)
        assigned.append(truth_sorted[best].text)
    if len(boxes) != len(truth_sorted):
        raise RuntimeError(
            f"{ref}: det found {len(boxes)} boxes for {len(truth_sorted)} lines"
        )

    blocks = [
        {"box": b.tolist(), "text": t, "score": 1.0}
        for b, t in zip(boxes, assigned)
    ]
    laid = run_parser(cfg.parser, blocks) if blocks else []
    expected = assemble_text(laid) if laid else ""
    code = int(StatusCode.OK) if expected else int(StatusCode.NO_TEXT)
    golden = [
        {
            "box": [[int(x), int(y)] for x, y in b["box"]],
            "text": b["text"],
            "end": b.get("end", "\n"),
        }
        for b in laid
    ]
    return expected, code, golden


def build_media_pool(n_images: int, cfg: PPOCRConfig) -> list[MediaSpec]:
    """Render the pool; parallel for large pools (each spec is a pure
    function of (i, cfg) — deterministic regardless of worker count)."""
    if n_images < 64:
        return [_render_spec(i, cfg) for i in range(n_images)]
    import multiprocessing as mp

    with mp.Pool(min(16, mp.cpu_count())) as pool:
        return pool.starmap(
            _render_spec, [(i, cfg) for i in range(n_images)], chunksize=8
        )


@dataclass
class PdfSpec:
    base_ref: str
    content: bytes | None
    # per page: (expected_text, expected_code, expected_blocks)
    pages: list[tuple[str, int, list[dict]]]


def build_pdf_pool(n_pdfs: int, cfg: PPOCRConfig) -> list[PdfSpec]:
    """Multi-page PDF media (north-rule 'PDF/layout parse'): spans address
    single pages via ``base#page=N`` refs; the payload is stored once per
    base ref and the page is resolved executor-side. Parallel for large
    pools (pure function of (i, cfg))."""
    if n_pdfs >= 32:
        import multiprocessing as mp

        with mp.Pool(min(16, mp.cpu_count())) as pool:
            return pool.starmap(
                _pdf_spec, [(i, cfg) for i in range(n_pdfs)], chunksize=4
            )
    return [_pdf_spec(i, cfg) for i in range(n_pdfs)]


def _pdf_spec(i: int, cfg: PPOCRConfig) -> PdfSpec:
    from ppocr_spark.sources.pdf import encode_pdf

    if True:
        ref = f"pdf_{i:08d}"
        rng = _rng("pdf", i)
        if rng.random() < 0.06:  # corrupt container → pages unreadable
            junk = b"%PDF-1.4\n" + bytes(
                _rng("pdfjunk", i).integers(0, 256, size=96, dtype=np.uint8)
            )
            return PdfSpec(
                ref, junk, [("", int(StatusCode.PATH_READ_FAIL), [])] * 2
            )
        n_pages = int(rng.integers(1, 4))
        imgs, page_exp = [], []
        for p in range(n_pages):
            prng = _rng("pdfpage", i, p)
            lines = [
                _latin_line(prng, 2, 7)
                for _ in range(int(prng.integers(1, 5)))
            ]
            img, truth = render_page(lines)
            exp, code, laid = _expected_for_page(
                img, truth, f"{ref}#page={p + 1}", cfg
            )
            imgs.append(img)
            page_exp.append((exp, code, laid))
        return PdfSpec(ref, encode_pdf(imgs), page_exp)


# ---------------------------------------------------------------------------
# documents + expected_spans
# ---------------------------------------------------------------------------

MISSING_REF = "img_missing"  # referenced by ~0.5% of media spans, no media row


def _html_span_payload(rng: np.random.Generator) -> tuple[str, str]:
    """Authored-HTML text span → (raw_html, authored_main_text). The main
    text is KNOWN at authoring; the pipeline's html_strip='main' mode must
    recover it through the generic extractor (never run at generation)."""
    paras = [_html_paragraph(rng) for _ in range(int(rng.integers(1, 3)))]
    nav = f"<nav>{_html_linklist(rng, int(rng.integers(2, 5)), 'nav')}</nav>"
    dense = (
        '<div class="rel">'
        + " ".join(
            f'<a href="/r/{k}">{rng.choice(_LATIN_WORDS)}</a>'
            for k in range(int(rng.integers(2, 4)))
        )
        + "</div>"
    )
    html = "<div>" + nav + "".join(p for p, _ in paras) + dense + "</div>"
    return html, " ".join(t for _, t in paras)


def generate_corpus(
    n_docs: int,
    cfg: PPOCRConfig | None = None,
    media_pool_size: int | None = None,
    skew_tail: bool = True,
):
    """→ (documents_rows, media_rows, expected_rows).

    documents_rows: [{doc_id, spans:[{kind,text,media_ref,offset}]}]
    media_rows:     [{media_ref, content, truth}]
    expected_rows:  [{doc_id, spans:[{kind,text,media_ref,order,code}]}]
    """
    cfg = cfg or PPOCRConfig(cls=True, use_angle_cls=True)
    if media_pool_size is None:
        media_pool_size = max(8, n_docs // 3)
    pool = build_media_pool(media_pool_size, cfg)
    pdf_pool = build_pdf_pool(max(2, media_pool_size // 4), cfg)

    documents, expected, expected_main = [], [], []
    for d in range(n_docs):
        doc_id = f"doc_{d:08d}"
        rng = _rng("doc", d)
        if skew_tail and rng.random() < 0.01:
            n_spans = int(rng.integers(50, 201))  # media-heavy skew tail
            media_frac = 0.95
        else:
            n_spans = int(rng.integers(1, 13))
            media_frac = 0.30
        spans, exp_spans, exp_main_spans = [], [], []
        for off in range(n_spans):
            if rng.random() < media_frac:
                r = rng.random()
                if r < 0.005:
                    ref = MISSING_REF
                    exp = ("media", "", ref, off, int(StatusCode.PATH_NOT_EXIST))
                elif r < 0.18:  # PDF page span
                    ps = pdf_pool[int(rng.integers(0, len(pdf_pool)))]
                    k = int(rng.integers(0, len(ps.pages)))
                    ref = f"{ps.base_ref}#page={k + 1}"
                    ptext, pcode, _pblocks = ps.pages[k]
                    exp = ("media", ptext, ref, off, pcode)
                else:
                    spec = pool[int(rng.integers(0, len(pool)))]
                    ref = spec.media_ref
                    exp = ("media", spec.expected_text, ref, off, spec.expected_code)
                spans.append(
                    {"kind": "media", "text": None, "media_ref": ref, "offset": off}
                )
            else:
                if rng.random() < 0.10:  # authored-HTML text span
                    raw, main_txt = _html_span_payload(rng)
                else:
                    raw = _text_span_payload(rng)
                    norm0, _c0 = normalize_text_span(raw)
                    # html_strip='main' keeps a plain block iff >= 2 words
                    # (MIN_BLOCK_WORDS) — known at authoring, not computed
                    # by the extractor under test
                    main_txt = norm0 if len(norm0.split()) >= 2 else ""
                norm, code = normalize_text_span(raw)
                spans.append(
                    {"kind": "text", "text": raw, "media_ref": None, "offset": off}
                )
                exp = ("text", norm, None, off, code)
                exp_main = (
                    "text", main_txt, None, off,
                    int(StatusCode.OK) if main_txt else int(StatusCode.NO_TEXT),
                )
            if exp[0] == "media":
                exp_main = exp  # html_strip touches only the text branch
            exp_spans.append(
                {
                    "kind": exp[0],
                    "text": exp[1],
                    "media_ref": exp[2],
                    "order": exp[3],
                    "code": exp[4],
                }
            )
            exp_main_spans.append(
                {
                    "kind": exp_main[0],
                    "text": exp_main[1],
                    "media_ref": exp_main[2],
                    "order": exp_main[3],
                    "code": exp_main[4],
                }
            )
        documents.append({"doc_id": doc_id, "spans": spans})
        expected.append({"doc_id": doc_id, "spans": exp_spans})
        expected_main.append({"doc_id": doc_id, "spans": exp_main_spans})

    media_rows = [
        {
            "media_ref": s.media_ref,
            "content": s.content,
            "truth": [{"text": t, "box": None} for t in s.truth_lines] or None,
        }
        for s in pool
    ] + [
        {"media_ref": p.base_ref, "content": p.content, "truth": None}
        for p in pdf_pool
    ]

    # generation-truth side tables: per-block goldens (ocr_blocks oracle)
    # and image metadata goldens (image_metadata oracle)
    block_rows = []
    for s in pool:
        for bi, b in enumerate(s.expected_blocks or []):
            block_rows.append(
                {"media_ref": s.media_ref, "block_idx": bi,
                 "box": b["box"], "text": b["text"], "end": b["end"]}
            )
    for p in pdf_pool:
        for k, (_t, _c, laid) in enumerate(p.pages):
            for bi, b in enumerate(laid):
                block_rows.append(
                    {"media_ref": f"{p.base_ref}#page={k + 1}",
                     "block_idx": bi,
                     "box": b["box"], "text": b["text"], "end": b["end"]}
                )
    meta_rows = [
        {
            "media_ref": s.media_ref,
            "width": s.meta[0] if s.meta else 0,
            "height": s.meta[1] if s.meta else 0,
            "channels": 1 if s.meta else 0,
            "decode_ok": s.meta is not None,
            "ink_ratio": s.meta[2] if s.meta else 0.0,
            "feat_sum": s.meta[3] if s.meta else None,
        }
        for s in pool
    ] + [
        # PDF payloads are not PNG-decodable: metadata probe yields zeros
        {"media_ref": p.base_ref, "width": 0, "height": 0, "channels": 0,
         "decode_ok": False, "ink_ratio": 0.0, "feat_sum": None}
        for p in pdf_pool
    ]
    return (documents, media_rows, expected, block_rows, meta_rows,
            expected_main)


# ---------------------------------------------------------------------------
# table corpus (structure path, SURVEY §2.4)
# ---------------------------------------------------------------------------


def _short_words(rng: np.random.Generator, n: int) -> str:
    pool = [w for w in _LATIN_WORDS if len(w) <= 6]
    return " ".join(str(rng.choice(pool)) for _ in range(n))


def generate_table_corpus(n_tables: int):
    """Deterministic ruled-table corpus → (media_rows, cell_rows,
    block_rows, html_rows). Golden geometry/text comes from the renderer's
    ground truth (independent of the detectors); generation FAILS if the
    pixel path (grid detect → erase → det → rec) does not reproduce it —
    the same fail-fast discipline as the span corpus."""
    from ppocr_spark.operators.detect import sorted_boxes
    from ppocr_spark.operators.structure import (
        detect_table_cells,
        ocr_table_image,
    )
    from ppocr_spark.render import render_table

    cfg = PPOCRConfig()
    media_rows, cell_rows, block_rows, html_rows = [], [], [], []
    for i in range(n_tables):
        ref = f"tbl_{i:06d}"
        rng = _rng("table", i)
        n_r = int(rng.integers(2, 5))
        n_c = int(rng.integers(2, 4))
        # ~30% of tables are BORDERLESS (no ruled lines): exercises the
        # whitespace-gutter fallback of detect_table_cells. Uniform grid
        # only (span inference needs appearance cues projections lack).
        borderless = rng.random() < 0.3
        texts = []
        for r in range(n_r):
            row = []
            for c in range(n_c):
                u = rng.random()
                if u < 0.15:
                    row.append("")
                elif u < 0.85:
                    row.append(_short_words(rng, 1))
                else:
                    row.append(_short_words(rng, 2))
            texts.append(row)
        if all(t == "" for row in texts for t in row):
            texts[0][0] = "table"
        if borderless:
            # gutter inference needs ink in every row and column band
            for r in range(n_r):
                if all(t == "" for t in texts[r]):
                    texts[r][int(rng.integers(0, n_c))] = _short_words(rng, 1)
            for c in range(n_c):
                if all(texts[r][c] == "" for r in range(n_r)):
                    texts[int(rng.integers(0, n_r))][c] = _short_words(rng, 1)

        # ~40% of 3x3+ tables get ONE spanning cell (rowspan or colspan 2);
        # covered cells blanked; never a full row/column of coverage
        merges: list[tuple[int, int, int, int]] = []
        if not borderless and n_r >= 3 and n_c >= 3 and rng.random() < 0.4:
            if rng.random() < 0.5:  # colspan=2
                mr = int(rng.integers(0, n_r))
                mc = int(rng.integers(0, n_c - 1))
                merges = [(mr, mc, 1, 2)]
                texts[mr][mc + 1] = ""
            else:  # rowspan=2
                mr = int(rng.integers(0, n_r - 1))
                mc = int(rng.integers(0, n_c))
                merges = [(mr, mc, 2, 1)]
                texts[mr + 1][mc] = ""
            if not texts[merges[0][0]][merges[0][1]]:
                texts[merges[0][0]][merges[0][1]] = _short_words(rng, 1)
        img, cells, truth_blocks = render_table(
            texts, merges, ruled=not borderless
        )

        if borderless:
            # gutter truth from the RENDERER's ink quads (independent of
            # the detector): row band r / col band c = union of ink
            # extents of the blocks in that table row / column
            row_band: dict[int, list[int]] = {}
            col_band: dict[int, list[int]] = {}
            for b in truth_blocks:
                r0, c0 = b.line_idx // n_c, b.line_idx % n_c
                xs = [p[0] for p in b.quad]
                ys = [p[1] for p in b.quad]
                rb = row_band.setdefault(r0, [min(ys), max(ys)])
                rb[0], rb[1] = min(rb[0], min(ys)), max(rb[1], max(ys))
                cb = col_band.setdefault(c0, [min(xs), max(xs)])
                cb[0], cb[1] = min(cb[0], min(xs)), max(cb[1], max(xs))
            from ppocr_spark.render import TruthCell

            cells = [
                TruthCell(
                    r, c,
                    col_band[c][0], row_band[r][0],
                    col_band[c][1], row_band[r][1],
                )
                for r in range(n_r)
                for c in range(n_c)
            ]

        det_cells = detect_table_cells(img)
        want_cells = [
            {"row": c.row, "col": c.col, "rowspan": c.rowspan,
             "colspan": c.colspan, "x0": c.x0, "y0": c.y0,
             "x1": c.x1, "y1": c.y1}
            for c in cells
        ]
        if det_cells != want_cells:
            raise RuntimeError(f"{ref}: cell grid detection drifted")

        # truth blocks in detector reading order (D8 sort on truth quads)
        quads = [np.array(b.quad) for b in truth_blocks]
        order = sorted(
            range(len(quads)),
            key=lambda k: [q.tolist() for q in sorted_boxes(quads)].index(
                quads[k].tolist()
            ),
        )
        ordered = [truth_blocks[k] for k in order]

        ocr = ocr_table_image(img, cfg)
        if [b["text"] for b in ocr] != [b.text for b in ordered]:
            raise RuntimeError(
                f"{ref}: table OCR drifted: "
                f"{[b['text'] for b in ocr]} != {[b.text for b in ordered]}"
            )

        media_rows.append({"media_ref": ref, "content": encode_gray(img)})
        for c in cells:
            cell_rows.append({"media_ref": ref, **{
                "row": c.row, "col": c.col, "rowspan": c.rowspan,
                "colspan": c.colspan, "x0": c.x0, "y0": c.y0,
                "x1": c.x1, "y1": c.y1}})
        for bi, b in enumerate(ordered):
            xs = [p[0] for p in b.quad]
            ys = [p[1] for p in b.quad]
            block_rows.append(
                {
                    "media_ref": ref, "block_idx": bi, "text": b.text,
                    "x0": min(xs), "y0": min(ys),
                    "x1": max(xs), "y1": max(ys),
                    "cell_row": b.line_idx // n_c,
                    "cell_col": b.line_idx % n_c,
                }
            )
        # authored truth HTML: anchors carry colspan/rowspan attributes,
        # covered cells emit no <td> (the tag-stream contract)
        span_of = {(r0, c0): (rs0, cs0) for r0, c0, rs0, cs0 in merges}
        cov = {
            (r0 + dr, c0 + dc)
            for r0, c0, rs0, cs0 in merges
            for dr in range(rs0)
            for dc in range(cs0)
            if (dr, dc) != (0, 0)
        }
        parts = ["<table>"]
        for r, row in enumerate(texts):
            parts.append("<tr>")
            for c, t in enumerate(row):
                if (r, c) in cov:
                    continue
                rs0, cs0 = span_of.get((r, c), (1, 1))
                attrs = ""
                if cs0 > 1:
                    attrs += f' colspan="{cs0}"'
                if rs0 > 1:
                    attrs += f' rowspan="{rs0}"'
                parts.append(f"<td{attrs}>{' '.join(t.split())}</td>")
            parts.append("</tr>")
        parts.append("</table>")
        html_rows.append({"media_ref": ref, "html": "".join(parts)})
    return media_rows, cell_rows, block_rows, html_rows


def ensure_table_corpus(n_tables: int, base_dir: str | None = None) -> str:
    """Idempotent cached table corpus under ``<repo>/.cache/tables_<n>/``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if base_dir is None:
        base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                ".cache")
    # v2: spanning cells (colspan/rowspan) — bump on any generation change
    # _v3: borderless tables added (expected cells/blocks/html change)
    out = os.path.join(base_dir, f"tables_{n_tables}_v3")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    media, cells, blocks, htmls = generate_table_corpus(n_tables)
    pq.write_table(
        pa.table(
            {
                "media_ref": [m["media_ref"] for m in media],
                "content": pa.array([m["content"] for m in media],
                                    pa.binary()),
            }
        ),
        os.path.join(out, "table_media.parquet"),
    )
    pq.write_table(
        pa.table({k: [c[k] for c in cells]
                  for k in ("media_ref", "row", "col", "rowspan", "colspan",
                            "x0", "y0", "x1", "y1")}),
        os.path.join(out, "table_cells.parquet"),
    )
    pq.write_table(
        pa.table({k: [b[k] for b in blocks]
                  for k in ("media_ref", "block_idx", "text", "x0", "y0",
                            "x1", "y1", "cell_row", "cell_col")}),
        os.path.join(out, "table_blocks.parquet"),
    )
    pq.write_table(
        pa.table({k: [h[k] for h in htmls] for k in ("media_ref", "html")}),
        os.path.join(out, "table_html.parquet"),
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


# ---------------------------------------------------------------------------
# parquet materialization (pyarrow, no Spark needed)
# ---------------------------------------------------------------------------


def ensure_corpus(n_docs: int, base_dir: str | None = None) -> str:
    """Idempotent cached corpus: generate once under
    ``<repo>/.cache/corpus_<n>/``, reuse forever (deterministic content).
    Both the Spark queries and the DuckDB oracle read these files."""
    if base_dir is None:
        base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                ".cache")
    # v6: authored-HTML text spans + html_strip='main' golden table (bump on any generation
    # change so stale caches never leak across versions)
    out = os.path.join(base_dir, f"corpus_{n_docs}_v6")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    write_corpus(out, n_docs)
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def write_corpus(out_dir: str, n_docs: int, cfg: PPOCRConfig | None = None, **kw):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    (docs, media, expected, blocks, meta,
     expected_main) = generate_corpus(n_docs, cfg, **kw)

    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    docs_t = pa.table(
        {
            "doc_id": [d["doc_id"] for d in docs],
            "spans": pa.array([d["spans"] for d in docs], pa.list_(span_t)),
        }
    )
    truth_t = pa.struct([("text", pa.string()), ("box", pa.string())])
    media_t = pa.table(
        {
            "media_ref": [m["media_ref"] for m in media],
            "content": pa.array([m["content"] for m in media], pa.binary()),
            "truth": pa.array(
                [
                    [{"text": t["text"], "box": None} for t in (m["truth"] or [])]
                    or None
                    for m in media
                ],
                pa.list_(truth_t),
            ),
        }
    )
    exp_span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("order", pa.int32()), ("code", pa.int32())]
    )
    exp_t = pa.table(
        {
            "doc_id": [e["doc_id"] for e in expected],
            "spans": pa.array([e["spans"] for e in expected], pa.list_(exp_span_t)),
        }
    )
    pq.write_table(docs_t, os.path.join(out_dir, "documents_spans.parquet"))
    pq.write_table(media_t, os.path.join(out_dir, "media.parquet"))
    pq.write_table(exp_t, os.path.join(out_dir, "expected_spans.parquet"))
    exp_main_t = pa.table(
        {
            "doc_id": [e["doc_id"] for e in expected_main],
            "spans": pa.array(
                [e["spans"] for e in expected_main], pa.list_(exp_span_t)
            ),
        }
    )
    pq.write_table(
        exp_main_t, os.path.join(out_dir, "expected_spans_main.parquet")
    )
    blocks_t = pa.table(
        {
            "media_ref": [b["media_ref"] for b in blocks],
            "block_idx": pa.array([b["block_idx"] for b in blocks],
                                  pa.int32()),
            "box": pa.array([b["box"] for b in blocks],
                            pa.list_(pa.list_(pa.int32()))),
            "text": [b["text"] for b in blocks],
            "end": [b["end"] for b in blocks],
        }
    )
    pq.write_table(blocks_t, os.path.join(out_dir, "expected_blocks.parquet"))
    meta_t = pa.table(
        {
            "media_ref": [m["media_ref"] for m in meta],
            "width": pa.array([m["width"] for m in meta], pa.int32()),
            "height": pa.array([m["height"] for m in meta], pa.int32()),
            "channels": pa.array([m["channels"] for m in meta], pa.int32()),
            "decode_ok": pa.array([m["decode_ok"] for m in meta], pa.bool_()),
            "ink_ratio": pa.array([m["ink_ratio"] for m in meta],
                                  pa.float64()),
            "feat_sum": pa.array([m["feat_sum"] for m in meta],
                                 pa.float64()),
        }
    )
    pq.write_table(meta_t, os.path.join(out_dir, "media_meta.parquet"))
    return out_dir


# ---------------------------------------------------------------------------
# HTML corpus (boilerplate-strip / DOM-heuristics path; north-rule text tier)
# ---------------------------------------------------------------------------


def _html_paragraph(rng: np.random.Generator) -> tuple[str, str]:
    """→ (html, truth_text) for one authored main-content paragraph.
    At most one short inline link (density stays ≤ 1/3) and occasional
    entities, so the extractor's generic rules must keep it."""
    n = int(rng.integers(6, 16))
    words = [str(rng.choice(_LATIN_WORDS)) for _ in range(n)]
    truth_words = list(words)
    r = rng.random()
    if r < 0.25:
        j = int(rng.integers(0, n))
        words[j] = f'<a href="/w/{words[j]}">{words[j]}</a>'
    elif r < 0.40:
        j = int(rng.integers(0, n))
        words[j] = f"<b>{words[j]}</b>"
    if rng.random() < 0.2:
        j = int(rng.integers(0, n - 1))
        words[j] += " &amp;"
        truth_words[j] += " &"
    html = "<p>" + " ".join(words) + "</p>"
    return html, " ".join(truth_words)


def _html_linklist(rng: np.random.Generator, n: int, cls: str) -> str:
    items = "".join(
        f'<li><a href="/{cls}/{k}">{rng.choice(_LATIN_WORDS)} '
        f"{rng.choice(_LATIN_WORDS)}</a></li>"
        for k in range(n)
    )
    return f'<ul class="{cls}">{items}</ul>'


def generate_html_page(i: int) -> tuple[str, str]:
    """Deterministic page i → (html, main_text truth).

    Truth is AUTHORED (known at generation), never computed by running the
    extractor — the extractor must independently recover it through its
    generic boilerplate/link-density/min-words rules."""
    rng = _rng("html", i)
    title_words = [str(rng.choice(_LATIN_WORDS)) for _ in range(int(rng.integers(3, 6)))]
    title = " ".join(title_words)
    paras = [_html_paragraph(rng) for _ in range(int(rng.integers(2, 7)))]

    head = (
        "<head><title>site — page</title>"
        "<style>body{margin:0} .ad{color:red}</style>"
        f"<script>var page={i}; if (page > 0) {{ track('<div>') }}</script>"
        '<meta charset="utf-8"></head>'
    )
    nav = f"<nav>{_html_linklist(rng, int(rng.integers(3, 8)), 'nav')}</nav>"
    header = '<header><div class="logo">Example Site</div></header>'
    aside = (
        f"<aside><div class='ad'>buy {rng.choice(_LATIN_WORDS)} now "
        f"{rng.choice(_LATIN_WORDS)}</div>"
        f"{_html_linklist(rng, int(rng.integers(2, 6)), 'promo')}</aside>"
    )
    # link-dense related-posts div OUTSIDE boilerplate ancestors — must be
    # dropped by the link-density rule, not the ancestor rule
    related = (
        '<div class="related">'
        + " ".join(
            f'<a href="/r/{k}">{rng.choice(_LATIN_WORDS)} '
            f"{rng.choice(_LATIN_WORDS)}</a>"
            for k in range(int(rng.integers(2, 5)))
        )
        + "</div>"
    )
    share = "<div>Share</div>"  # < MIN_BLOCK_WORDS → dropped
    footer = (
        f"<footer>{_html_linklist(rng, 4, 'foot')}"
        "<div>© example site all rights reserved</div></footer>"
    )
    comment = "<!-- rendered by generator <div>not content</div> -->"
    body_main = (
        "<main><article>"
        + f"<h1>{title}</h1>"
        + "".join(p for p, _ in paras)
        + "</article></main>"
    )
    html = (
        "<html>" + head + "<body>" + comment + nav + header
        + body_main + related + share + aside + footer + "</body></html>"
    )
    truth = " ".join([title] + [t for _, t in paras])
    return html, truth


def ensure_html_corpus(n_pages: int, base_dir: str | None = None) -> str:
    """Idempotent cached HTML corpus under ``<repo>/.cache/html_<n>/``:
    html_docs.parquet(doc_id, html) + html_truth.parquet(doc_id, main_text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if base_dir is None:
        base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                ".cache")
    # bump the version suffix on ANY change to generate_html_page /
    # _html_paragraph — same stale-cache invariant as ensure_corpus
    out = os.path.join(base_dir, f"html_{n_pages}_v1")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    pages = [generate_html_page(i) for i in range(n_pages)]
    ids = [f"page_{i:08d}" for i in range(n_pages)]
    pq.write_table(
        pa.table({"doc_id": ids, "html": [h for h, _ in pages]}),
        os.path.join(out, "html_docs.parquet"),
    )
    pq.write_table(
        pa.table({"doc_id": ids, "main_text": [t for _, t in pages]}),
        os.path.join(out, "html_truth.parquet"),
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


# ---------------------------------------------------------------------------
# audio corpus (multimodal audio leg: WAV payloads + generation truth)
# ---------------------------------------------------------------------------


def generate_audio_corpus(n_clips: int, n_frames: int = 16):
    """→ (media_rows, truth_rows). Deterministic synthetic WAV clips
    (tone mixes + noise bursts + silence + a few corrupt payloads);
    truth = metadata + framed-RMS features computed AT GENERATION with
    the same arithmetic the UDFs use."""
    from ppocr_spark.audio import encode_wav, frame_rms

    media_rows, truth_rows = [], []
    for i in range(n_clips):
        ref = f"aud_{i:06d}"
        rng = _rng("audio", i)
        kind = rng.random()
        if kind < 0.08:  # corrupt container
            content = bytes(
                _rng("audjunk", i).integers(0, 256, size=48, dtype=np.uint8)
            )
            media_rows.append({"media_ref": ref, "content": content})
            truth_rows.append(
                {"media_ref": ref, "sample_rate": 0, "channels": 0,
                 "n_samples": 0, "duration_s": 0.0, "decode_ok": False,
                 "rms": 0.0, "features": None}
            )
            continue
        rate = int(rng.choice([8000, 16000, 22050]))
        ch = 2 if rng.random() < 0.3 else 1
        n = int(rng.integers(rate // 4, rate))  # 0.25-1.0 s
        t = np.arange(n) / rate
        sig = np.zeros((n, ch))
        for _ in range(int(rng.integers(1, 4))):  # tone mix
            f = float(rng.uniform(80, 2000))
            amp = float(rng.uniform(0.1, 0.5))
            tone = amp * np.sin(2 * np.pi * f * t)
            for c in range(ch):
                sig[:, c] += tone * float(rng.uniform(0.5, 1.0))
        if rng.random() < 0.3:  # noise burst in one window
            b0 = int(rng.integers(0, max(n - n // 8, 1)))
            sig[b0 : b0 + n // 8] += rng.normal(
                0, 0.2, size=(min(n // 8, n - b0), ch)
            )
        if rng.random() < 0.15:  # leading silence
            sig[: n // 4] = 0.0
        np.clip(sig, -1.0, 1.0, out=sig)
        content = encode_wav(sig, rate)
        # truth via the SAME decode path the UDF runs (PCM quantization
        # happens in encode; decode returns the quantized signal)
        from ppocr_spark.audio import decode_wav

        a, r2 = decode_wav(content)
        truth_rows.append(
            {
                "media_ref": ref, "sample_rate": r2,
                "channels": int(a.shape[1]), "n_samples": int(a.shape[0]),
                "duration_s": a.shape[0] / float(r2), "decode_ok": True,
                "rms": float(np.sqrt(np.mean(
                    a.mean(axis=1).astype(np.float64) ** 2
                ))),
                "features": [float(x) for x in frame_rms(a, n_frames)],
            }
        )
        media_rows.append({"media_ref": ref, "content": content})
    return media_rows, truth_rows


def ensure_audio_corpus(n_clips: int, base_dir: str | None = None) -> str:
    """Idempotent cached audio corpus: audio_media.parquet(media_ref,
    content) + audio_truth.parquet(metadata + features)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if base_dir is None:
        base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                ".cache")
    # bump on any generate_audio_corpus change (stale-cache invariant)
    out = os.path.join(base_dir, f"audio_{n_clips}_v1")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    media, truth = generate_audio_corpus(n_clips)
    pq.write_table(
        pa.table(
            {
                "media_ref": [m["media_ref"] for m in media],
                "content": pa.array(
                    [m["content"] for m in media], pa.binary()
                ),
            }
        ),
        os.path.join(out, "audio_media.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "media_ref": [t["media_ref"] for t in truth],
                "sample_rate": pa.array(
                    [t["sample_rate"] for t in truth], pa.int32()
                ),
                "channels": pa.array(
                    [t["channels"] for t in truth], pa.int32()
                ),
                "n_samples": pa.array(
                    [t["n_samples"] for t in truth], pa.int32()
                ),
                "duration_s": pa.array(
                    [t["duration_s"] for t in truth], pa.float64()
                ),
                "decode_ok": pa.array(
                    [t["decode_ok"] for t in truth], pa.bool_()
                ),
                "rms": pa.array([t["rms"] for t in truth], pa.float64()),
                "features": pa.array(
                    [t["features"] for t in truth], pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(out, "audio_truth.parquet"),
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


# ---------------------------------------------------------------------------
# video corpus (multimodal video leg: AVI payloads + generation truth)
# ---------------------------------------------------------------------------


def generate_video_corpus(n_clips: int, every_n: int = 2):
    """→ (media_rows, truth_rows, frame_rows). Deterministic synthetic AVI
    clips (moving gradients + drifting blocks + a few grayscale-source and
    corrupt payloads); truth = container metadata + per-frame luma profile
    + md5 of every sampled PNG thumbnail, all computed AT GENERATION with
    the same arithmetic the UDFs use."""
    import hashlib

    from ppocr_spark.png import encode_gray
    from ppocr_spark.video import (decode_avi, encode_avi,
                                   frame_luma_profile, luma8)

    media_rows, truth_rows, frame_rows = [], [], []
    for i in range(n_clips):
        ref = f"vid_{i:06d}"
        rng = _rng("video", i)
        kind = rng.random()
        if kind < 0.08:  # corrupt container
            content = bytes(
                _rng("vidjunk", i).integers(0, 256, size=64, dtype=np.uint8)
            )
            media_rows.append({"media_ref": ref, "content": content})
            truth_rows.append(
                {"media_ref": ref, "width": 0, "height": 0, "n_frames": 0,
                 "fps": 0.0, "duration_s": 0.0, "decode_ok": False,
                 "features": None}
            )
            continue
        w = int(rng.integers(6, 25))
        h = int(rng.integers(6, 21))
        n = int(rng.integers(3, 13))
        fps = int(rng.choice([5, 10, 12, 24]))
        # moving diagonal gradient + one drifting bright block per frame
        yy, xx = np.mgrid[0:h, 0:w]
        frames = np.empty((n, h, w, 3), dtype=np.uint8)
        phase = int(rng.integers(0, 256))
        step = int(rng.integers(3, 17))
        bw = max(2, w // 4)
        bh = max(2, h // 4)
        for k in range(n):
            base = ((xx * 7 + yy * 13 + phase + k * step) % 256).astype(
                np.uint8
            )
            frm = np.stack([base, (base + 85) % 256, (base + 170) % 256],
                           axis=2).astype(np.uint8)
            bx = (k * step) % max(w - bw, 1)
            by = (k * (step // 2 + 1)) % max(h - bh, 1)
            frm[by : by + bh, bx : bx + bw] = 255
            frames[k] = frm
        if rng.random() < 0.2:  # grayscale-source clip (encoder replicates)
            frames = np.stack([luma8(frames[k]) for k in range(n)])
        content = encode_avi(frames, fps)
        # truth via the SAME decode path the UDFs run
        dec, fps2 = decode_avi(content)
        truth_rows.append(
            {
                "media_ref": ref, "width": int(dec.shape[2]),
                "height": int(dec.shape[1]), "n_frames": int(dec.shape[0]),
                "fps": float(fps2),
                "duration_s": dec.shape[0] / float(fps2),
                "decode_ok": True,
                "features": [float(x) for x in frame_luma_profile(dec)],
            }
        )
        for k in range(0, dec.shape[0], every_n):
            png = encode_gray(luma8(dec[k]))
            frame_rows.append(
                {"media_ref": ref, "frame_idx": k,
                 "frame_md5": hashlib.md5(png).hexdigest()}
            )
        media_rows.append({"media_ref": ref, "content": content})
    return media_rows, truth_rows, frame_rows


def ensure_video_corpus(n_clips: int, base_dir: str | None = None) -> str:
    """Idempotent cached video corpus: video_media.parquet(media_ref,
    content) + video_truth.parquet(metadata + luma profile) +
    video_frames.parquet(sampled-thumbnail md5s)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if base_dir is None:
        base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                ".cache")
    # bump on any generate_video_corpus change (stale-cache invariant)
    out = os.path.join(base_dir, f"video_{n_clips}_v1")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    media, truth, frames = generate_video_corpus(n_clips)
    pq.write_table(
        pa.table(
            {
                "media_ref": [m["media_ref"] for m in media],
                "content": pa.array(
                    [m["content"] for m in media], pa.binary()
                ),
            }
        ),
        os.path.join(out, "video_media.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "media_ref": [t["media_ref"] for t in truth],
                "width": pa.array([t["width"] for t in truth], pa.int32()),
                "height": pa.array([t["height"] for t in truth], pa.int32()),
                "n_frames": pa.array(
                    [t["n_frames"] for t in truth], pa.int32()
                ),
                "fps": pa.array([t["fps"] for t in truth], pa.float64()),
                "duration_s": pa.array(
                    [t["duration_s"] for t in truth], pa.float64()
                ),
                "decode_ok": pa.array(
                    [t["decode_ok"] for t in truth], pa.bool_()
                ),
                "features": pa.array(
                    [t["features"] for t in truth], pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(out, "video_truth.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "media_ref": [r["media_ref"] for r in frames],
                "frame_idx": pa.array(
                    [r["frame_idx"] for r in frames], pa.int32()
                ),
                "frame_md5": [r["frame_md5"] for r in frames],
            }
        ),
        os.path.join(out, "video_frames.parquet"),
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


# ---------------------------------------------------------------------------
# request corpus (S7 dispatch + S5 base64 taxonomy, incl. codes 300/301)
# ---------------------------------------------------------------------------


def generate_request_corpus(n_requests: int, cfg: PPOCRConfig | None = None):
    """→ (request_rows, media_rows, truth_rows).

    Request JSON strings covering the full dispatch taxonomy with the
    expected code KNOWN at authoring (generation picks the failure mode;
    the pipeline under test must classify it the same way):

      valid path → pool expected_code · missing path → 202
      valid b64 of a pool image → pool expected_code
      b64 with out-of-alphabet chars → 300 · valid b64 of junk bytes → 301
      unparseable JSON → 200 · ambiguous keys → 201
    """
    import base64 as b64mod
    import json

    cfg = cfg or PPOCRConfig(cls=True, use_angle_cls=True)
    pool = build_media_pool(max(6, n_requests // 10), cfg)

    requests, truth = [], []
    for i in range(n_requests):
        rng = _rng("req", i)
        rid = f"req_{i:08d}"
        r = rng.random()
        text = ""
        if r < 0.28:  # path to an existing media row
            spec = pool[int(rng.integers(0, len(pool)))]
            req = json.dumps({"image_path": spec.media_ref})
            code = spec.expected_code
            text = spec.expected_text
        elif r < 0.38:  # path to a missing media row
            req = json.dumps({"image_path": f"img_missing_{i}"})
            code = int(StatusCode.PATH_NOT_EXIST)
        elif r < 0.64:  # valid base64 of a valid image
            spec = pool[int(rng.integers(0, len(pool)))]
            req = json.dumps(
                {"image_base64": b64mod.b64encode(spec.content).decode()}
            )
            code = spec.expected_code
            text = spec.expected_text
        elif r < 0.76:  # base64 with characters outside the alphabet
            req = json.dumps({"image_base64": f"@@not-base64!!{i}"})
            code = int(StatusCode.BASE64_DECODE_FAIL)
        elif r < 0.88:  # well-formed base64 of non-image bytes
            junk = bytes(
                _rng("reqjunk", i).integers(0, 256, size=64, dtype=np.uint8)
            )
            req = json.dumps(
                {"image_base64": b64mod.b64encode(junk).decode()}
            )
            code = int(StatusCode.BASE64_IMAGE_FAIL)
        elif r < 0.94:  # unparseable JSON
            req = '{"image_path": broken'
            code = int(StatusCode.JSON_PARSE_ERR)
        else:  # ambiguous: two task keys
            req = json.dumps({"image_path": "x", "image_base64": "eA=="})
            code = int(StatusCode.JSON_KEY_INVALID)
        requests.append({"req_id": rid, "request": req})
        truth.append({"req_id": rid, "expected_code": int(code),
                      "expected_text": text})

    media_rows = [
        {"media_ref": s.media_ref, "content": s.content} for s in pool
    ]
    return requests, media_rows, truth


def ensure_request_corpus(n_requests: int, base_dir: str | None = None) -> str:
    """Idempotent cached request corpus: requests.parquet(req_id, request)
    + request_media.parquet(media_ref, content) +
    request_truth.parquet(req_id, expected_code)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if base_dir is None:
        base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                ".cache")
    # bump on any generate_request_corpus change (stale-cache invariant)
    out = os.path.join(base_dir, f"requests_{n_requests}_v2")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    reqs, media, truth = generate_request_corpus(n_requests)
    pq.write_table(
        pa.table(
            {
                "req_id": [r["req_id"] for r in reqs],
                "request": [r["request"] for r in reqs],
            }
        ),
        os.path.join(out, "requests.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "media_ref": [m["media_ref"] for m in media],
                "content": pa.array(
                    [m["content"] for m in media], pa.binary()
                ),
            }
        ),
        os.path.join(out, "request_media.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "req_id": [t["req_id"] for t in truth],
                "expected_code": pa.array(
                    [t["expected_code"] for t in truth], pa.int32()
                ),
                "expected_text": [t["expected_text"] for t in truth],
            }
        ),
        os.path.join(out, "request_truth.parquet"),
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return out
