"""Deterministic procedural bitmap font.

The reference OCRs real rasterized text with a learned CRNN; this repo has no
image/ML libraries, so the synthetic corpus (FIXTURES.md F2) is rendered with
a *procedural* glyph bank: every character maps to a fixed 12x16 ink bitmap
derived from a seeded RNG, with enforced constraints that make honest
recognition possible:

- ink density within a fixed band (so the DB-style probability map —
  windowed ink density — stays above ``det_db_thresh`` inside text lines);
- pairwise Hamming distance >= MIN_DIST between every pair of glyphs (so
  template correlation has margin and CTC argmax is unambiguous);
- Hamming distance >= MIN_DIST between every glyph and every 180°-rotated
  glyph, including itself (so the angle classifier C2 — cpp/src/ocr_cls.cpp —
  has real signal to detect upside-down crops).

The bank is generated once per process and cached (the Spark analog of the
reference's per-process model load, cpp/src/task.cpp:243-250); on executors
it is rebuilt deterministically from the seed rather than shipped.
"""

from __future__ import annotations

import functools

import numpy as np

GLYPH_W = 12
GLYPH_H = 16
MIN_DIST = 36          # Hamming floor between any two bank entries
DENSITY_LO = 58        # ink pixels per glyph, inclusive band
DENSITY_HI = 110
SEED = 42

# ASCII printable minus space (space is layout, not ink) + a CJK sample set +
# CJK punctuation, enough to exercise the word_separator Unicode rules
# (api/python/tbpu/parser_tools/paragraph_parse.py:12-36).
_CJK = "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下以生会自着去之过家学对可她里后小么心多天而能好都然没日于起还发成事只作当想看文无开手十用主行方又如前所本见经头面公同三已老从"
_CJK_PUNCT = "。，、！？：；“”（）《》"
CHARSET = "".join(chr(c) for c in range(33, 127)) + _CJK + _CJK_PUNCT


def _candidate(char: str, salt: int) -> np.ndarray:
    """One candidate 16x12 bool glyph: union of seeded random rectangles in
    the interior (1-px empty border keeps adjacent glyphs from touching).
    Structural constraints checked by the caller: every interior column and
    row must carry ink (so column-projection segmentation never splits a
    glyph), and the ink bbox must span the full interior (so tight-crop
    resizing is identical for tile and template)."""
    seed = (ord(char) * 1_000_003 + salt * 7919 + SEED) % (2**32)
    rng = np.random.default_rng(seed)
    g = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
    # skeleton strokes guaranteeing full row/column coverage: one horizontal
    # bar, one vertical bar, at seeded positions
    hy = int(rng.integers(1, GLYPH_H - 2))
    vx = int(rng.integers(1, GLYPH_W - 2))
    g[hy : hy + 2, 1 : GLYPH_W - 1] = True
    g[1 : GLYPH_H - 1, vx : vx + 2] = True
    # 4-7 random rectangles for identity
    for _ in range(int(rng.integers(4, 8))):
        w = int(rng.integers(2, 6))
        h = int(rng.integers(2, 5))
        x = int(rng.integers(1, GLYPH_W - w))
        y = int(rng.integers(1, GLYPH_H - h))
        g[y : y + h, x : x + w] = True
    return g


def _structurally_ok(g: np.ndarray) -> bool:
    interior_cols = g[:, 1 : GLYPH_W - 1]
    interior_rows = g[1 : GLYPH_H - 1, :]
    if not interior_cols.any(axis=0).all():
        return False
    if not interior_rows.any(axis=1).all():
        return False
    return True


@functools.lru_cache(maxsize=1)
def glyph_bank() -> dict[str, np.ndarray]:
    """char -> bool (GLYPH_H, GLYPH_W) ink mask, constraints enforced."""
    accepted: list[np.ndarray] = []
    bank: dict[str, np.ndarray] = {}
    # flat views of accepted glyphs and their 180° rotations, for fast
    # vectorized Hamming checks
    pool = np.zeros((0, GLYPH_H * GLYPH_W), dtype=bool)
    for ch in CHARSET:
        for salt in range(400):
            g = _candidate(ch, salt)
            n = int(g.sum())
            if not (DENSITY_LO <= n <= DENSITY_HI):
                continue
            if not _structurally_ok(g):
                continue
            flat = g.reshape(-1)
            rot = g[::-1, ::-1].reshape(-1)
            # vs self-rotation (orientation signal)
            if int((flat != rot).sum()) < MIN_DIST:
                continue
            if pool.shape[0]:
                d = np.minimum(
                    (pool != flat).sum(axis=1).min(),
                    (pool != rot).sum(axis=1).min(),
                )
                if int(d) < MIN_DIST:
                    continue
            bank[ch] = g
            pool = np.vstack([pool, flat[None, :], rot[None, :]])
            accepted.append(g)
            break
        else:  # pragma: no cover - generation exhausted
            raise RuntimeError(f"could not place glyph for {ch!r}")
    return bank


def charset_for(lang: str = "full") -> str:
    """Per-language charset — the analog of the reference's per-language
    ``rec_char_dict_path`` configs (cpp/src/args.cpp:109-163 rewrites the
    models/dict paths per shipped language config). 'en' = ASCII
    printable; 'zh'/'full' = ASCII + CJK sample + CJK punctuation."""
    if lang == "en":
        return "".join(chr(c) for c in range(33, 127))
    if lang in ("zh", "full"):
        return CHARSET
    raise ValueError(f"unknown rec language: {lang}")


@functools.lru_cache(maxsize=8)
def template_stack(lang: str = "full") -> tuple[np.ndarray, str]:
    """(float32 stack [n, GLYPH_H*GLYPH_W] of zero-mean unit-norm templates,
    labels) — the recognition 'model weights' (R3 analog), restricted to
    the language's charset (the per-language dict surface).

    Templates are the glyphs tight-cropped to their ink bbox and resampled
    to (GLYPH_H, GLYPH_W) exactly as recognition tiles are, so the match is
    distribution-aligned. Deterministic."""
    from ppocr_spark.resample import area_resize

    bank = glyph_bank()
    # labels in charset_for ORDER, not bank insertion order: forward_probs
    # writes class i+1 for labels[i] and ctc_greedy_decode maps class c to
    # char_dict(lang)[c] = charset_for(lang)[c-1] — the two dictionaries
    # must be the same sequence BY CONSTRUCTION, not by the accident that
    # the bank happens to iterate in charset order (a reordered CHARSET
    # would silently transliterate every recognized character otherwise)
    charset = charset_for(lang)
    missing = [ch for ch in charset if ch not in bank]
    if missing:
        raise RuntimeError(
            f"glyph bank is missing {len(missing)} charset glyphs "
            f"(first: {missing[0]!r}) — rec class indices would shift"
        )
    labels = charset
    mats = []
    for c in labels:
        g = bank[c]
        ys = np.flatnonzero(g.any(axis=1))
        xs = np.flatnonzero(g.any(axis=0))
        tight = g[ys[0] : ys[-1] + 1, xs[0] : xs[-1] + 1].astype(np.float32)
        # simulate the render path: x2 upscale then area resample back
        up = np.kron(tight, np.ones((2, 2), dtype=np.float32))
        mats.append(area_resize(up, GLYPH_H, GLYPH_W).reshape(-1))
    stack = np.stack(mats)
    stack -= stack.mean(axis=1, keepdims=True)
    norms = np.linalg.norm(stack, axis=1, keepdims=True)
    stack /= np.maximum(norms, 1e-6)
    return stack, labels


def char_dict(lang: str = "full") -> list[str]:
    """CTC label list: blank '#' prepended, ' ' appended — exactly the
    reference's dict assembly (cpp/include/ocr_rec.h:51-54,
    cpp/src/utility.cpp:37-56); per-language via ``charset_for``."""
    return ["#"] + list(charset_for(lang)) + [" "]
