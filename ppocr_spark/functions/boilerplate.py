"""HTML boilerplate strip + DOM-heuristic main-content extraction.

The north-rule names three text-branch capabilities for an extraction
engine at this tier: *HTML boilerplate strip, PDF/layout parse, DOM
heuristics*. This module is the HTML half (PDF lives in
``ppocr_spark/sources/pdf.py``):

- ``strip_tags_col`` — pure-JVM expression (whole-stage codegen, zero
  Python): drop comments / script / style blocks, flatten tags to spaces,
  decode the core entities, collapse whitespace. The regex subset is
  portable between Spark (java.util.regex) and DuckDB (RE2) — no
  backreferences, inline ``(?is)`` flags only — so the DuckDB oracle runs
  the *same* strip and the driver gate checks value equality.
- ``main_content`` — the DOM-heuristic extractor (Arc90-readability-style
  text-density scoring, public technique): a from-scratch block tokenizer
  + ancestor tracking in an Arrow-batched pandas UDF. Blocks under
  boilerplate ancestors (nav/header/footer/aside/form/figure) are dropped;
  remaining blocks are dropped when link-dense (link_density > 1/3) or
  trivially short (< 2 words). Rows TRANSFER per Arrow batch but the
  extraction itself is per-row Python (a regex tokenizer walk over each
  page) — cost scales with rows, not batches; only ``strip_tags_col``
  is the zero-Python tier.

The reference engine has no HTML path (its inputs are images); this stage
is the text-branch analog of its tbpu normalizer (SURVEY.md §2.3) applied
to markup instead of box geometry.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tier 1: tag strip (JVM expressions; DuckDB twin in _STRIP_STEPS)
# ---------------------------------------------------------------------------

#: (pattern, replacement) chain; every pattern is valid in BOTH
#: java.util.regex and RE2 with identical semantics on well-formed markup.
STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?is)<noscript\b[^>]*>.*?</noscript>", " "),
    (r"(?s)<[^>]*>", " "),
)

#: entity → char, applied after tag removal (literal replaces)
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
)


def strip_tags_col(col: Column) -> Column:
    """Boilerplate strip as a single JVM expression tree."""
    out = col
    for pat, rep in STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def strip_tags_sql(expr: str, dialect: str) -> str:
    """The same strip chain as SQL text for ``dialect`` in
    {'spark', 'duckdb'} — used by the driver-gate oracle pairs."""
    out = expr
    for pat, rep in STRIP_STEPS:
        p = pat.replace("\\", "\\\\") if dialect == "spark" else pat
        out = f"regexp_replace({out}, '{p}', '{rep}'" + (
            ", 'g')" if dialect == "duckdb" else ")"
        )
    for ent, ch in ENTITIES:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    ws = "'\\\\s+'" if dialect == "spark" else "'\\s+'"
    g = ", 'g'" if dialect == "duckdb" else ""
    return f"trim(regexp_replace({out}, {ws}, ' '{g}))"


def strip_tags(df: DataFrame, html_col: str = "html",
               out_col: str = "text") -> DataFrame:
    return df.withColumn(out_col, strip_tags_col(F.col(html_col)))


# ---------------------------------------------------------------------------
# tier 2: DOM-heuristic main-content extraction (pandas UDF)
# ---------------------------------------------------------------------------

#: ancestors whose entire subtree is boilerplate
BOILERPLATE_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "form", "figure", "head"}
)
#: tags that delimit text blocks
BLOCK_TAGS = frozenset(
    {"p", "div", "article", "section", "main", "li", "ul", "ol", "table",
     "tr", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote",
     "pre", "body", "html"}
)
#: void elements — never pushed on the ancestor stack
VOID_TAGS = frozenset(
    {"br", "hr", "img", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

MAX_LINK_DENSITY = 1.0 / 3.0
MIN_BLOCK_WORDS = 2

_TOKEN_RE = re.compile(r"<!--.*?-->|<[^>]*>|[^<]+", re.S)
_COMMENT_OR_RAW_RE = re.compile(
    r"(?is)<!--.*?-->|<script\b[^>]*>.*?</script>"
    r"|<style\b[^>]*>.*?</style>|<noscript\b[^>]*>.*?</noscript>"
)
_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_WS_RE = re.compile(r"\s+")


def _decode_entities(s: str) -> str:
    for ent, ch in ENTITIES:
        s = s.replace(ent, ch)
    return s


def extract_main_content(html: str) -> str:
    """Pure function: one HTML page → its main text.

    Tokenizes tags with a from-scratch scanner, tracks the open-element
    stack, cuts the text into blocks at block-tag boundaries, and keeps a
    block iff (a) no boilerplate ancestor, (b) link density ≤ 1/3,
    (c) ≥ MIN_BLOCK_WORDS words. Kept blocks are joined with a single
    space after whitespace collapse (same normalization as strip_tags).
    """
    if not html:
        return ""
    html = _COMMENT_OR_RAW_RE.sub(" ", html)
    stack: list[str] = []
    boiler_depth = 0
    link_depth = 0
    cur_text: list[str] = []
    cur_link: list[str] = []
    blocks: list[tuple[str, str]] = []  # (text, link_text)

    def flush() -> None:
        if cur_text:
            blocks.append(("".join(cur_text), "".join(cur_link)))
            cur_text.clear()
            cur_link.clear()

    for m in _TOKEN_RE.finditer(html):
        tok = m.group(0)
        if tok.startswith("<"):
            nm = _TAG_NAME_RE.match(tok)
            if not nm:
                continue
            name = nm.group(1).lower()
            closing = tok.startswith("</")
            if name in BLOCK_TAGS:
                flush()
            if name in VOID_TAGS:
                continue
            if closing:
                # pop to the matching open tag (tolerates misnesting)
                if name in stack:
                    while stack:
                        top = stack.pop()
                        if top in BOILERPLATE_TAGS:
                            boiler_depth = max(boiler_depth - 1, 0)
                        if top == "a":
                            link_depth = max(link_depth - 1, 0)
                        if top == name:
                            break
            elif not tok.endswith("/>"):
                stack.append(name)
                if name in BOILERPLATE_TAGS:
                    boiler_depth += 1
                if name == "a":
                    link_depth += 1
        else:
            if boiler_depth > 0:
                continue
            text = _decode_entities(tok)
            cur_text.append(text)
            if link_depth > 0:
                cur_link.append(text)
    flush()

    kept: list[str] = []
    for text, link_text in blocks:
        norm = _WS_RE.sub(" ", text).strip()
        if not norm:
            continue
        if len(norm.split()) < MIN_BLOCK_WORDS:
            continue
        ld = len(_WS_RE.sub(" ", link_text).strip()) / max(len(norm), 1)
        if ld > MAX_LINK_DENSITY:
            continue
        kept.append(norm)
    return " ".join(kept)


def main_content(df: DataFrame, html_col: str = "html",
                 out_col: str = "main_text") -> DataFrame:
    """DataFrame stage: Arrow-batched TRANSFER (rows arrive per Arrow
    batch); the extraction itself is per-row Python — the tokenizer
    regex walks each page — so the stage scales with per-row cost, not
    batch count. NULL html propagates to NULL output (the strip_tags
    tier's JVM null semantics — the two tiers must classify a missing
    document identically, the gate's NULL-vs-'' lesson)."""
    import pandas as pd  # noqa: F401 (resolves the UDF type hints)
    from pyspark.sql.functions import pandas_udf

    def _extract(s):
        return s.map(
            lambda h: None if h is None else extract_main_content(h)
        )

    _extract_udf = pandas_udf(_extract, "string")
    return df.withColumn(out_col, _extract_udf(F.col(html_col)))
