"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are Spark built-ins (whole-stage codegen, no
Python): language-ID (stopword-hit heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting (min-over-ngram-md5, a 1-permutation
MinHash — only *portable* primitives so the DuckDB oracle can mirror the
math exactly)."""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (deterministic heuristic, not a
# model; shared verbatim with the SQL oracle in __spark_entry__)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty-safe."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def spread(df: DataFrame) -> DataFrame:
    """Repartition a slim projection to the cluster's parallelism when the
    source scan under-partitions (one small parquet file locally; a handful
    of splits for a small dimension at cluster scale). The projections this
    guards are tiny relative to the corpus and feed a key shuffle anyway,
    so the extra exchange is noise at 100 TB but turns a 1-core local scan
    into an n-core one. At real corpus scale the scan is already split by
    maxPartitionBytes and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# \r is in the excluded class: CRLF corpora must not count the carriage
# return as a symbol token (one phantom token per line otherwise)
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]"


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish count: letter runs, digit runs, and single symbols —
    the regex-segmentation style of BPE pre-tokenizers. The pattern is
    shared verbatim with the DuckDB oracle (``BPE_ISH_PATTERN``)."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[\p{P}]", "")
    return (F.length(col) - F.length(stripped)) / F.greatest(
        F.length(col), F.lit(1)
    )


def stopword_hits(col: Column, lang: str) -> Column:
    toks = tokens(F.lower(col))
    hits = F.filter(toks, lambda t: t.isin(STOPWORDS[lang]))
    return F.size(hits)


def dup_ngram_fraction(col: Column, n: int) -> Column:
    """Gopher/MassiveText-style repetition signal: the fraction of word
    n-gram occurrences that repeat an earlier occurrence in the same
    document, ``1 - distinct/total`` (0 for docs shorter than n tokens).
    Pure JVM higher-order functions — no explode, no shuffle: this is a
    per-row expression and scales as a map."""
    def _frac(t: Column) -> Column:
        grams = ngrams_from_tokens(t, n)
        total = F.size(grams)
        return F.when(total <= 0, F.lit(0.0)).otherwise(
            F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / total, 6)
        )

    # bind the token array ONCE via a singleton-array lambda: passing the
    # inline tokenizer straight into ngrams_from_tokens would re-tokenize
    # per gram (the O(len²) trap its docstring forbids; measured 11.7x at
    # 2000 tokens). transform evaluates tokens(col) once and the lambda
    # variable is an O(1) reference inside every gram slice.
    return F.transform(F.array(tokens(col)), _frac)[0]


def quality_score(text_col: Column) -> Column:
    """Composite quality in [0,1]: length band + low punctuation + mean
    word length band. Deterministic arithmetic, oracle-mirrorable."""
    n = F.length(text_col)
    toks = tokens(text_col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    mean_wl = n / n_tok
    len_ok = F.when((n >= 50) & (n <= 10000), 1.0).otherwise(0.4)
    punct_ok = F.when(punct_ratio(text_col) < 0.2, 1.0).otherwise(0.5)
    wl_ok = F.when((mean_wl >= 3) & (mean_wl <= 12), 1.0).otherwise(0.6)
    return F.round((len_ok * punct_ok * wl_ok), 6)


def lang_id(text_col: Column) -> Column:
    """Heuristic language ID: CJK-char fraction → 'zh'; else the language
    with the most stopword hits; no-hits → 'und'. Ties break by declared
    language priority (en > de > fr > es — STOPWORDS insertion order), the
    same rule the generated SQL dialects state as a CASE chain."""
    cjk = F.length(F.regexp_replace(text_col, r"[^一-鿿]", ""))
    frac_cjk = cjk / F.greatest(F.length(text_col), F.lit(1))
    langs = list(STOPWORDS)
    # struct comparison is field-order lexicographic: (hits, priority)
    # ranks by hits first, then by earlier-declared language
    arr = F.array(
        *[
            F.struct(
                stopword_hits(text_col, lang).alias("hits"),
                F.lit(len(langs) - i).alias("pri"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(arr)
    return (
        F.when(frac_cjk > 0.3, F.lit("zh"))
        .when(best["hits"] > 0, best["lang"])
        .otherwise(F.lit("und"))
    )


def ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-grams from a *materialized* tokens column.

    `toks` must be a real column reference, not an inline expression: the
    slice runs inside a per-gram lambda, so an inline tokenizer would be
    re-evaluated once per gram (O(len²) per document)."""
    return F.when(F.size(toks) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Array of word n-grams joined by single spaces (portable).
    Convenience form — prefer projecting `tokens(col)` to a column and
    calling `ngrams_from_tokens` on it in hot paths."""
    return ngrams_from_tokens(tokens(col), n)


def minhash_from_grams(grams: Column, k: int = 8) -> Column:
    """k-permutation MinHash from a *materialized* grams column.

    Keep `grams` a real column (not an inline expression): Catalyst does
    not share subexpressions across the k lambda bodies, so inlining the
    n-gram pipeline here evaluates it k times per row.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(
                    grams,
                    lambda g: F.md5(F.concat(F.lit(f"{i}:"), g)),
                )
            )
            for i in range(k)
        ]
    )


def minhash_signature(col: Column, k: int = 8, n: int = 3) -> Column:
    """k-permutation MinHash over word n-grams using md5-string ordering —
    md5 is identical in Spark and DuckDB, so the oracle reproduces the
    signature bit-for-bit. Permutation i = lexicographic min of
    md5(i || ':' || gram).

    Prefer projecting `word_ngrams` to a column first and calling
    `minhash_from_grams` on it (see dedup.minhash_lsh_candidates) — this
    convenience form re-evaluates the n-gram pipeline k times."""
    return minhash_from_grams(word_ngrams(col, n), k)


def doc_fingerprint(col: Column, n: int = 3) -> Column:
    """1-permutation MinHash = content fingerprint robust to local edits
    (the rolling-hash winnowing analog, portable to the oracle)."""
    return F.array_min(F.transform(word_ngrams(col, n), F.md5))


def token_hashes(col: Column) -> Column:
    """Per-token 60-bit hashes: first 15 hex chars of md5 (portable to the
    DuckDB oracle) parsed as bigint."""
    return F.transform(
        tokens(F.lower(col)),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )


def simhash_from_hashes_expr(hs: Column) -> Column:
    """Pure-expression 60-bit SimHash (bit votes via sign of sum) — the
    readable reference form mirrored verbatim by the DuckDB oracle. NOT
    the hot path: Catalyst evaluates higher-order-function lambdas
    interpreted per array element, so 60 ``aggregate`` passes over the
    hash array cost ~1.8 s on 5,000 sf0.1 docs vs ~0.1 s for the Arrow
    kernel in ``simhash_from_hashes`` (same integers, measured round 3)."""
    bits = []
    for b in range(60):  # 60 bits from 15 hex chars
        vote = F.aggregate(
            hs,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bits.append(F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def simhash_from_hashes(hs: Column) -> Column:
    """60-bit SimHash from a *materialized* token-hash column: per-bit
    votes (+1 if bit set, −1 if clear) summed over the tokens, bit b of
    the fingerprint = 1 iff vote_b > 0.

    Arrow-vectorized kernel (integer-exact — same fingerprints as
    ``simhash_from_hashes_expr`` and the DuckDB oracle, pinned by the
    ``dedup_simhash`` gate): one ``(n_tokens, 60)`` bit matrix per batch,
    per-document segment sums via ``np.add.reduceat``. The expression
    form is interpreted per element by Catalyst (HOF lambdas don't
    codegen) and measured ~18× slower on the bit-vote stage."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _simhash(hashes: pd.Series) -> pd.Series:
        n = len(hashes)
        out = np.zeros(n, dtype=np.int64)
        if n == 0:
            return pd.Series(out)
        arrs = [
            np.asarray(a, dtype=np.int64)
            if a is not None
            else np.empty(0, np.int64)
            for a in hashes
        ]
        lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=n)
        if int(lens.sum()) == 0:
            return pd.Series(out)
        flat = np.concatenate([a for a in arrs if a.size])
        # ±1 votes per (token, bit); flat is int64 so the expression is
        # already int64 — no astype (it would COPY the full
        # (total_tokens, 60) matrix, doubling the kernel's peak memory)
        bits = ((flat[:, None] >> np.arange(60)) & 1) * 2 - 1
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        nz = lens > 0
        # reduceat over the starts of NON-EMPTY segments only: those are
        # strictly increasing, so each output row is exactly one segment
        # sum (equal adjacent indices would yield a single element, not a
        # zero-length sum)
        votes = np.add.reduceat(bits, starts[nz], axis=0)
        sims = ((votes > 0).astype(np.int64) << np.arange(60)).sum(axis=1)
        out[nz] = sims
        return pd.Series(out)

    return _simhash(hs)


def simhash64(col: Column) -> Column:
    """64-bit-style SimHash over tokens (60 usable bits). Convenience
    single-expression form — prefer projecting `token_hashes` to a column
    and calling `simhash_from_hashes` on it (see dedup.simhash_fingerprints)."""
    return simhash_from_hashes(token_hashes(col))


def add_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        doc_fingerprint(c).alias("fingerprint"),
    )


def winnowing_fingerprint(
    col: Column, k: int = 8, w: int = 5
) -> Column:
    """Winnowing document fingerprint (Schleimer/Wilkerson/Aiken 2003,
    public algorithm): hash every k-char gram of the lowercased text, take
    the minimum hash of each w-length window, dedupe — robust to
    insertions/reordering, the classic plagiarism/doc-identity sketch.
    Pure JVM expressions (portable: same md5 text hashing in DuckDB)."""
    s = F.lower(col)
    n = F.length(s)
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.md5(s.substr(i, F.lit(k))),
    )
    mins = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(hashes) - (w - 1), F.lit(1))
        ),
        lambda j: F.array_min(F.slice(hashes, j, w)),
    )
    return F.array_sort(F.array_distinct(mins))


# --- PII scrubbing (training-data redaction pass) -------------------------
#
# Patterns are kept inside the Java-regex ∩ RE2 common subset (no
# lookaround, no backreferences) so the identical literals run in Spark's
# regexp_* (Java) and the DuckDB oracle's regexp_* (RE2). Applied in a
# fixed order (emails → phones → IPv4) so a later pattern never matches
# inside an earlier placeholder.

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# phones: alternatives ordered longest-first (both engines try
# alternatives left to right at each position) —
#   +CC 10-digit        +1-555-123-4567 / +1 (555) 123-4567 / +15551234567
#   +CC-DDD-DDDD        +44-555-0199 (short intl, the round-3 form)
#   (DDD) DDD-DDDD      (555) 123-4567
#   DDD-DDD-DDDD        555-123-4567 / 555.123.4567 / 555 123 4567
# Bare 10-digit runs without separators are deliberately NOT matched
# (indistinguishable from ids/quantities — precision over recall there).
PII_PHONE = (
    r"\+\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b"
    r"|\+\d{1,3}-\d{3}-\d{4}\b"
    r"|\(\d{3}\)[-. ]?\d{3}[-. ]?\d{4}\b"
    r"|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
)
PII_IPV4 = r"\b\d{1,3}(\.\d{1,3}){3}\b"

PII_PATTERNS = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_PHONE, "<PHONE>"),
    (PII_IPV4, "<IP>"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category PII hit counts (emails/phones/ipv4) as JVM regexp
    expressions — counted on the RAW text, before scrubbing."""
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(col, F.lit(PII_PHONE), F.lit(0))),
        "n_ipv4": F.size(F.regexp_extract_all(col, F.lit(PII_IPV4), F.lit(0))),
    }


def pii_scrub(col: Column) -> Column:
    """Redact PII spans with typed placeholders: the standard scrub pass a
    training corpus runs before tokenization. Pure per-row JVM regexp
    chain — no shuffle, no UDF; whole-stage-codegen keeps it in the scan
    stage."""
    out = col
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# --- unigram LM scoring (CCNet-style perplexity quality signal) ------------


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-fit unigram language-model score per document: mean
    add-one-smoothed log-probability of its tokens under the corpus's own
    unigram distribution — the cheap stand-in for the LM-perplexity
    quality filter of CCNet-style pipelines (docs of improbable tokens
    score low; boilerplate-heavy docs score suspiciously high).

    Two passes, both shuffle-disciplined:
    1. vocabulary fit: explode tokens → groupBy(token) count (map-side
       partial agg; the token-level shuffle is the floor for any LM fit);
    2. scoring: re-explode and equi-join each token to its count (AQE
       handles hot-token skew), then mean log p per document where
       p = (count + 1) / (total + |V|).

    The fitted relation feeds both the total/|V| scalars and the join, so
    it is persisted via ``cache.track`` (released by
    ``cache.release_all``). Returns (id, n_toks, logprob) with logprob
    rounded to 6 (float log arithmetic; portable at that precision).
    """
    from ppocr_spark import cache

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = cache.track(toks.groupBy("tok").agg(F.count("*").alias("c")))
    totals = vocab.agg(
        F.sum("c").alias("total"), F.count("*").alias("v")
    ).collect()[0]
    denom = float(totals["total"]) + float(totals["v"])
    # per-token log p is rounded then DECIMAL-summed: the mean is exact
    # and order-independent across partitions (a double sum would drift
    # with partition layout — the round-after-unordered-float-sum trap)
    scored = toks.join(vocab, "tok").select(
        "id",
        F.round(
            F.log((F.col("c") + 1).cast("double") / F.lit(denom)), 9
        ).cast("decimal(28,9)").alias("lp"),
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_toks"),
        # exact decimal sum → double, THEN one double divide: the same
        # IEEE op order the oracle states (a decimal divide would round
        # at a different scale than DuckDB's)
        F.round(
            F.sum("lp").cast("double") / F.count("*"), 6
        ).alias("logprob"),
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-fit bigram language-model score per document: mean
    add-one-smoothed log p(w2|w1) of its token bigrams under the corpus's
    own bigram distribution — one order up from ``unigram_logprob`` on
    the road to the KenLM-style perplexity filter CCNet uses (a bigram
    model already separates fluent text from shuffled-token boilerplate,
    which a unigram model scores identically).

    Scale shape: bigram formation is ARRAY-SIDE (two slices zipped per
    row — no shuffle, no self-join on position); the fit is one
    groupBy(w1, w2) with map-side partial aggregation (the bigram-level
    shuffle is the floor for any bigram fit) and the context counts
    c(w1) derive from the fitted relation, not a second corpus pass.
    |V| is a single bounded driver scalar. Scoring re-joins each bigram
    occurrence to its two counts (AQE handles hot-bigram skew).

    Determinism: per-bigram log p is rounded to 9 then DECIMAL-summed so
    the mean is partition-order independent (same contract as
    ``unigram_logprob``, driver-proven); the final divide is one double
    op in the oracle's stated order. Documents with fewer than two
    tokens have no bigrams and emit no row — in both engines.
    Returns (id, n_bigrams, logprob).
    """
    from ppocr_spark import cache

    # spread: the tokenize+zip+explode chain runs several times (vocab
    # scalar, fit, scoring probe) and must not serialize on one local
    # parquet split (no-op at corpus scale)
    base = spread(
        docs.select(
            F.col(id_col).alias("id"),
            tokens(F.col(text_col)).alias("__toks"),
        )
    )
    # |V| over ALL tokens (including single-token docs): one slim
    # distinct-count aggregate → bounded driver scalar
    v = int(
        base.select(F.explode("__toks").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
        .collect()[0]["v"]
    )
    sz = F.size(F.col("__toks"))
    pairs = (
        base.filter(sz >= 2)
        .withColumn("__a", F.slice(F.col("__toks"), F.lit(1), sz - 1))
        .withColumn("__b", F.slice(F.col("__toks"), F.lit(2), sz - 1))
        .select("id", F.explode(F.arrays_zip("__a", "__b")).alias("__bg"))
        .select(
            "id",
            F.col("__bg.__a").alias("w1"),
            F.col("__bg.__b").alias("w2"),
        )
    )
    # the fitted relation feeds the scoring join AND the context counts:
    # persist only when the source scan is big enough for recompute to
    # cost a second corpus pass (the bm25 lesson — see cache.track_if_large)
    big = cache.track_if_large(
        docs, pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    )
    ctx = big.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        pairs.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .select(
            "id",
            F.round(
                F.log(
                    (F.col("c2") + 1).cast("double")
                    / (F.col("c1") + F.lit(v)).cast("double")
                ),
                9,
            ).cast("decimal(28,9)").alias("lp"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum("lp").cast("double") / F.count("*"), 6).alias(
            "logprob"
        ),
    )


def quality_tiers(
    docs: DataFrame,
    n_tiers: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style quality tiering: split the corpus into ``n_tiers``
    equal-mass tiers by unigram-LM score (tier 0 = lowest logprob =
    highest perplexity = CCNet's "tail"; the top tier is its "head").
    Training mixes sample head/middle/tail at different rates — this is
    the bucketing step that makes that possible.

    Scale shape: scoring is ``unigram_logprob`` (its two bounded
    shuffles); tier BOUNDARIES are one slim exact-percentile aggregate
    over a single double per document (the only extra pass), attached
    back as a 1-row broadcast constant — no global sort of the corpus,
    no per-tier window. Tier assignment is a map-side comparison chain.

    Determinism: scores are the decimal-exact rounded logprobs;
    Spark ``percentile`` and DuckDB ``quantile_cont`` interpolate
    identically ((n-1)·p linear interpolation over the same doubles), so
    boundaries — and therefore tiers — match the oracle bit-for-bit.
    Returns (id, n_toks, logprob, tier).
    """
    scored = unigram_logprob(docs, text_col, id_col)
    ps = [i / n_tiers for i in range(1, n_tiers)]
    bounds = scored.agg(
        F.percentile("logprob", F.array(*[F.lit(p) for p in ps])).alias(
            "__b"
        )
    )
    tier = F.lit(n_tiers - 1)
    for i in range(n_tiers - 2, -1, -1):
        tier = F.when(
            F.col("logprob") <= F.col("__b")[i], F.lit(i)
        ).otherwise(tier)
    return (
        scored.crossJoin(F.broadcast(bounds))
        .withColumn("tier", tier)
        .drop("__b")
    )


# --- Gopher-style repetition filters (Rae et al. 2021, table A1) -----------
#
# The Gopher corpus rules flag documents whose content is dominated by
# repeated fragments. The paper's line/paragraph rules need line structure;
# over a whitespace token stream the operative family is the n-gram one,
# expressed here as token-count fractions:
#   frac_top_token  — occurrences of the most frequent token / n_toks
#   frac_top_2gram  — tokens covered by the most frequent 2-gram / n_toks
#                     (count x 2, the paper's "fraction of characters in
#                     the most common n-gram" in token units)
#   frac_dup_2gram  — repeated 2-gram INSTANCES / all 2-gram instances
#                     (instances beyond each gram's first occurrence)
# Thresholds follow the paper's shape (top-2gram 0.20); the top-token and
# dup-2gram cuts are calibrated loose (0.30 / 0.60) since token fractions
# run higher than character fractions.

GOPHER_TOP_TOKEN_MAX = 0.30
GOPHER_TOP_2GRAM_MAX = 0.20
GOPHER_DUP_2GRAM_MAX = 0.60


def gopher_repetition(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repetition metrics + pass flags.

    Scale shape: two explode→partial-agg chains (tokens, 2-grams), each
    one shuffle keyed by (doc, gram) with map-side combine absorbing the
    explosion, reduced to one row per document and equi-joined back on
    the id. Max/sum over exact integer counts, fractions rounded to 6 —
    order- and partition-independent, so the DuckDB twin hash-matches.
    Documents with fewer than 2 tokens get 0 ppm for both 2-gram
    metrics, and ZERO-token (empty/whitespace) documents still emit a
    row (n_toks=0, all ppm 0, all flags pass) - rooting the final join
    at the docs base rather than the token aggregate, so a filtering
    pipeline's inner join can't silently wave empty docs past the gate
    (same branches in the oracle)."""
    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    )
    tok_counts = (
        base.select("id", F.explode("t").alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(
            F.max("c").cast("long").alias("top_tok"),
            F.sum("c").cast("long").alias("n_toks"),
        )
    )
    # 2-grams via the module's one ngram former (empty for < 2 tokens;
    # it owns the sequence-descends-for-negative-n guard)
    grams = base.select(
        "id", F.explode(ngrams_from_tokens(F.col("t"), 2)).alias("g")
    )
    gram_counts = (
        grams.groupBy("id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(
            F.max("c").cast("long").alias("top_2gram"),
            F.sum("c").cast("long").alias("n_2grams"),
            F.count("*").cast("long").alias("n_2grams_distinct"),
        )
    )
    # metrics in integer PARTS-PER-MILLION: (1e6 * count) DIV denominator
    # — exact integer math, no float round() tie-break to reconcile across
    # engines (the repo's decimal-exactness rule, integer flavor)
    j = (
        base.select("id")
        .join(tok_counts, "id", "left")
        .join(gram_counts, "id", "left")
    ).select(
        "id",
        F.coalesce(F.col("n_toks"), F.lit(0)).cast("long").alias("n_toks"),
        F.coalesce(
            (F.lit(1_000_000) * F.col("top_tok")).cast("long"),
            F.lit(0).cast("long"),
        ).alias("_tt"),
        F.coalesce(
            (F.lit(2_000_000) * F.col("top_2gram")).cast("long"),
            F.lit(0).cast("long"),
        ).alias("_t2"),
        F.coalesce(
            (
                F.lit(1_000_000)
                * (F.col("n_2grams") - F.col("n_2grams_distinct"))
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("_d2"),
        F.coalesce(F.col("n_2grams"), F.lit(1)).cast("long").alias("_n2"),
    )
    out = j.select(
        F.col("id").alias("doc_id"),
        "n_toks",
        F.expr("_tt DIV greatest(n_toks, 1)").alias("top_token_ppm"),
        F.expr("_t2 DIV greatest(n_toks, 1)").alias("top_2gram_ppm"),
        F.expr("_d2 DIV _n2").alias("dup_2gram_ppm"),
    )
    return out.select(
        "doc_id",
        "n_toks",
        "top_token_ppm",
        "top_2gram_ppm",
        "dup_2gram_ppm",
        (F.col("top_token_ppm") <= int(GOPHER_TOP_TOKEN_MAX * 1_000_000))
        .alias("ok_top_token"),
        (F.col("top_2gram_ppm") <= int(GOPHER_TOP_2GRAM_MAX * 1_000_000))
        .alias("ok_top_2gram"),
        (F.col("dup_2gram_ppm") <= int(GOPHER_DUP_2GRAM_MAX * 1_000_000))
        .alias("ok_dup_2gram"),
    )


def _bucket_hash(col: Column, buckets: int) -> Column:
    """Portable feature-bucket hash: first 15 md5 hex chars as bigint,
    mod ``buckets`` (non-negative since 15 hex chars < 2^60). The DuckDB
    twin is ``('0x' || substr(md5(f), 1, 15))::BIGINT % buckets``."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % F.lit(int(buckets))
    )


def dsir_weights(
    docs: DataFrame,
    target: Column,
    buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document log
    importance weight under hashed n-gram feature distributions —
    log w(x) = Σ_b n_b(x) · (log p̂_target(b) − log p̂_raw(b)), where
    features are unigrams + bigrams hashed into ``buckets`` buckets and
    both distributions are add-one smoothed. ``target`` is a boolean
    Column over ``docs`` marking the target-domain rows (the
    high-quality slice the mix should look like); the raw distribution
    fits on ALL rows. Resampling = rank/threshold on the returned weight
    with the deterministic samplers in ``sampling``.

    Scale shape: features form ARRAY-SIDE per row (unigram array +
    zipped bigram slices — no positional self-join); ONE corpus-sized
    shuffle fits per-(doc, bucket) counts with map-side partial
    aggregation, and both distributions derive from that table (the
    target side via the carried boolean — no second corpus pass). The
    per-bucket delta table is ≤ ``buckets`` rows → broadcast back; the
    feature totals are a 2-scalar bounded driver sync (the |V| pattern
    of ``bigram_logprob``).

    Determinism: each log p̂ is rounded to 9 decimals (the
    ``bigram_logprob`` contract, driver-proven — the only float op),
    the per-bucket delta is then EXACT decimal subtraction lifted to
    integer nano-units (×10⁹ of a scale-9 decimal is exact), and the
    doc score is a pure int64 Σ count × delta_nano — partition-order
    independent with no cross-engine rounding surface at all (the
    integer-ppm lesson). Bound: |delta_nano| < 2³⁷ and Σ count per doc
    is document length, so scores stay far inside int64 for any
    real document. Returns (id, n_features, dsir_nano)."""
    from ppocr_spark import cache

    b = int(buckets)
    base = spread(
        docs.select(
            F.col(id_col).alias("id"),
            target.cast("boolean").alias("__tgt"),
            tokens(F.col(text_col)).alias("__toks"),
        )
    )
    sz = F.size("__toks")
    bigrams = F.when(
        sz >= 2,
        F.zip_with(
            F.slice(F.col("__toks"), F.lit(1), sz - 1),
            F.slice(F.col("__toks"), F.lit(2), sz - 1),
            lambda a, c: F.concat_ws(" ", a, c),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = base.select(
        "id",
        "__tgt",
        F.explode(F.concat(F.col("__toks"), bigrams)).alias("__f"),
    ).select("id", "__tgt", _bucket_hash(F.col("__f"), b).alias("__b"))
    # the per-(doc,bucket) table feeds scoring AND both fits: persist only
    # when the source scan is big enough for recompute to cost more than
    # materialization (the bm25 lesson — cache.track_if_large)
    grp = cache.track_if_large(
        docs,
        feats.groupBy("id", "__tgt", "__b").agg(F.count("*").alias("__c")),
    )
    dist = grp.groupBy("__b").agg(
        F.sum("__c").alias("__cq"),
        F.sum(F.when(F.col("__tgt"), F.col("__c")).otherwise(F.lit(0)))
        .alias("__ct"),
    )
    totals = dist.agg(
        F.sum("__cq").alias("cq"), F.sum("__ct").alias("ct")
    ).collect()[0]
    c_raw, c_tgt = int(totals["cq"] or 0), int(totals["ct"] or 0)
    lp = lambda c, tot: F.round(  # noqa: E731  (shared tiny expression)
        F.log((c + 1).cast("double") / F.lit(float(tot + b))), 9
    ).cast("decimal(28,9)")
    delta = dist.select(
        "__b",
        (
            (lp(F.col("__ct"), c_tgt) - lp(F.col("__cq"), c_raw))
            * F.lit(1_000_000_000)
        ).cast("long").alias("__d"),
    )
    return (
        grp.join(F.broadcast(delta), "__b")
        .groupBy("id")
        .agg(
            F.sum("__c").alias("n_features"),
            F.sum(F.col("__c") * F.col("__d")).alias("dsir_nano"),
        )
    )


def nano_ln_lift(c):
    """round(ln, 9) lifted to exact integer nano-units — THE parity
    contract shared by token_entropy / source_token_kl / pmi_bigrams
    (one definition: a precision or tie-mode change affects all
    consumers or none). Engine-identical: Spark round() and DuckDB
    round() both round half away from zero on doubles."""
    return (
        F.round(F.log(c.cast("double")), 9).cast("decimal(28,9)")
        * F.lit(1_000_000_000)
    ).cast("long")


def token_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (natural
    log, reported in integer MILLI-NATS) — the vocabulary-diversity
    quality signal: low entropy = repetitive/boilerplate text. It
    complements ``gopher_repetition`` (top-k mass fractions) with a
    whole-distribution measure:  H = ln N − (Σ c_i·ln c_i)/N  over the
    per-token counts c_i, N = token count.

    Exactness: each ln is rounded to 9 decimals (the driver-proven
    contract) and lifted to exact integer nano-units; everything after
    is pure int64 arithmetic ending in ONE integer DIV —
      entropy_milli = (N·lnN_nano − Σ c_i·lnc_nano) DIV (N·10⁶)
    — partition-order and engine independent (the integer-ppm lesson).
    Bound: N·lnN_nano < 2⁶³ for any N up to ~3·10⁸ tokens/doc.

    Scale: one explode + groupBy(id, token) with map-side combine (the
    floor for any per-document distribution), then a per-doc aggregate
    — two bounded shuffles, no joins. Empty documents emit no row (no
    tokens → no distribution) in both engines.
    Returns (id, n_toks, entropy_milli)."""
    nano = nano_ln_lift
    counts = (
        spread(
            docs.select(
                F.col(id_col).alias("id"),
                tokens(F.col(text_col)).alias("__t"),
            )
        )
        .select("id", F.explode("__t").alias("__tok"))
        .groupBy("id", "__tok")
        .agg(F.count("*").alias("__c"))
    )
    per = counts.groupBy("id").agg(
        F.sum("__c").alias("n_toks"),
        F.sum(F.col("__c") * nano(F.col("__c"))).alias("__s"),
    )
    return (
        per.withColumn("__lnn", nano(F.col("n_toks")))
        .select(
            "id",
            "n_toks",
            F.expr("(n_toks * __lnn - __s) div (n_toks * 1000000)")
            .alias("entropy_milli"),
        )
    )


def source_quality_report(
    docs: DataFrame,
    short_chars: int = 112,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-source data-audit report card — the rollup a 100 TB pipeline
    publishes per crawl/domain to decide source weights (cf. the
    per-dump quality tables of CCNet and the per-domain audits of
    RefinedWeb): document/token/char mass, short-document rate, and
    language mix (diversity + majority language share).

    All ratios are integer ppm (``(1e6 * num) DIV den`` — exact and
    engine-identical; float round() ties are the documented
    cross-engine hazard). The majority language ties to the
    lexicographically-LOWEST lang via one ``min(struct(-n, lang))``
    aggregate — no per-source window, so a mega-source never becomes
    one unsplittable window key.

    At scale: text is projected away after the slim per-doc measure
    row (source, lang, n_toks, n_chars) — two groupBys on
    (source, lang) then source, both bounded by |sources| x |langs|
    after the first aggregate; nothing document-sized ever shuffles.
    Output: (source, n_docs, n_tokens, n_chars_total, short_ppm,
    n_langs, top_lang, top_lang_ppm), counts all int64."""
    per_doc = spread(
        docs.select(
            F.col(source_col).alias("source"),
            F.col(lang_col).alias("__lang"),
            F.col(chars_col).cast("long").alias("__nc"),
            token_count(F.col(text_col)).cast("long").alias("__nt"),
        )
    )
    by_lang = per_doc.groupBy("source", "__lang").agg(
        F.count("*").alias("__n"),
        F.sum("__nt").alias("__t"),
        F.sum("__nc").alias("__c"),
        F.sum(F.when(F.col("__nc") < short_chars, 1).otherwise(0)).alias(
            "__s"
        ),
    )
    rep = by_lang.groupBy("source").agg(
        F.sum("__n").cast("long").alias("n_docs"),
        F.sum("__t").cast("long").alias("n_tokens"),
        F.sum("__c").cast("long").alias("n_chars_total"),
        F.sum("__s").alias("__short"),
        F.countDistinct("__lang").cast("long").alias("n_langs"),
        F.min(
            F.struct((-F.col("__n")).alias("nn"), F.col("__lang"))
        ).alias("__top"),
    )
    return rep.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars_total",
        F.expr("(1000000 * __short) DIV n_docs").cast("long").alias(
            "short_ppm"
        ),
        "n_langs",
        F.col("__top.__lang").alias("top_lang"),
        F.expr("(1000000 * -`__top`.nn) DIV n_docs").cast("long").alias(
            "top_lang_ppm"
        ),
    ).orderBy("source")


def source_token_kl(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source KL divergence of the token distribution vs the whole
    corpus, KL(P_source ‖ P_corpus), in integer MICRO-NATS — the
    source-drift diagnostic behind mixture reweighting (a source whose
    unigram distribution diverges from the blend it feeds is the one
    to up/down-weight; cf. the per-domain distribution audits of DSIR
    and The Pile). Support-restricted exact form: terms with
    p_source(w)=0 contribute 0, and p_corpus(w)>0 on the source's
    support by construction, so no smoothing enters —
      KL = [Σ_w c_s(w)·(ln c_s(w) − ln c(w)) + n_s·(ln n − ln n_s)] / n_s.

    Determinism: every ln is the driver-proven round(ln, 9) lifted to
    exact integer nano-units (the ``dsir_weights``/``token_entropy``
    contract); products/sums are decimal(38,0) (DuckDB HUGEINT) so the
    arithmetic stays EXACT past int64 at 10¹²-token corpus scale; the
    result is one integer DIV of a non-negative numerator (KL ≥ 0 in
    exact math; greatest(·,0) absorbs sub-micro ln-rounding residue
    identically in both engines, closing the truncation-sign hazard).

    Scale: one corpus-sized explode → groupBy(source, token) with
    map-side combine; the corpus distribution RE-AGGREGATES that slim
    table (no second corpus pass); the join back is vocabulary-bounded
    on a high-cardinality token key; the grand total is a 1-scalar
    bounded driver sync. A source with no tokens emits no row (no
    distribution) in both engines.
    Returns (source, n_toks, n_types, kl_micro)."""
    from ppocr_spark import cache

    nano = nano_ln_lift
    counts = cache.track_if_large(
        docs,
        spread(
            docs.select(
                F.col(source_col).alias("src"),
                tokens(F.col(text_col)).alias("__t"),
            )
        )
        .select("src", F.explode("__t").alias("__tok"))
        .groupBy("src", "__tok")
        .agg(F.count("*").alias("__c")),
    )
    corpus = counts.groupBy("__tok").agg(F.sum("__c").alias("__cc"))
    n_total = int(
        counts.agg(F.sum("__c").alias("n")).collect()[0]["n"] or 0
    )
    if n_total == 0:
        return counts.sparkSession.createDataFrame(
            [],
            "source string, n_toks long, n_types long, kl_micro long",
        )
    per = (
        counts.join(corpus, "__tok")
        .groupBy("src")
        .agg(
            F.sum("__c").cast("long").alias("n_toks"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(
                F.col("__c").cast("decimal(19,0)")
                * (nano(F.col("__c")) - nano(F.col("__cc")))
                .cast("decimal(19,0)")
            ).cast("decimal(38,0)").alias("__s"),
        )
    )
    num = (
        F.col("__s")
        + F.col("n_toks").cast("decimal(19,0)")
        * (nano(F.lit(n_total)) - nano(F.col("n_toks")))
        .cast("decimal(19,0)")
    ).cast("decimal(38,0)")
    return per.withColumn("__num", num).select(
        F.col("src").alias("source"),
        "n_toks",
        "n_types",
        F.expr(
            "greatest(cast(0 as decimal(38,0)), __num)"
            " div (n_toks * 1000)"
        ).cast("long").alias("kl_micro"),
    )


def pmi_bigrams(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over adjacent
    token bigrams — the classic corpus-analysis signal (Church & Hanks
    1990) for phrase mining / tokenizer-merge candidates:
      PMI(x,y) = ln p(x,y) − ln p(x) − ln p(y)
               = ln c_xy − ln N_b − ln c_x − ln c_y + 2·ln N_t
    with bigram probability over the bigram stream (N_b bigrams) and
    unigram probabilities over the token stream (N_t tokens). The
    ``min_count`` floor is the standard low-frequency-PMI guard.

    Determinism: every ln — including the corpus totals, lifted
    IN-ENGINE via the shared ``nano_ln_lift`` (never Python round(),
    whose half-even ties violate the half-away contract) — is the
    driver-proven round(ln, 9) in exact integer nano-units, and the
    score is a pure int64 SUM of five lifts — NO division anywhere, so
    the negative-quotient truncation-direction hazard never arises. Top-k order (pmi_nano DESC, w1, w2) is total because
    (w1, w2) is unique.

    Scale: bigrams form ARRAY-SIDE (two zipped slices — the
    ``dsir_weights`` shape, no positional self-join); one
    corpus-sized explode each for bigram and unigram counts, both
    map-side combined; unigram joins back on high-cardinality token
    keys; totals are 2-scalar bounded driver syncs; top-k plans as
    TakeOrderedAndProject (per-task k-row heaps, no global sort).
    Returns (w1, w2, c_pair, pmi_nano)."""
    from ppocr_spark import cache

    nano = nano_ln_lift
    base = cache.track_if_large(
        docs,
        spread(docs.select(tokens(F.col(text_col)).alias("__t"))),
    )
    uni = base.select(F.explode("__t").alias("w")).groupBy("w").agg(
        F.count("*").alias("cu")
    )
    sz = F.size("__t")
    big_arr = F.when(
        sz >= 2,
        F.zip_with(
            F.slice(F.col("__t"), F.lit(1), sz - 1),
            F.slice(F.col("__t"), F.lit(2), sz - 1),
            lambda a, c: F.struct(a.alias("w1"), c.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = (
        base.select(F.explode(big_arr).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_pair"))
        .filter(F.col("c_pair") >= F.lit(int(min_count)))
    )
    totals = base.select(
        F.sum(sz).alias("nt"),
        F.sum(F.greatest(sz - 1, F.lit(0))).alias("nb"),
    ).collect()[0]
    n_t, n_b = int(totals["nt"] or 0), int(totals["nb"] or 0)
    if n_b == 0:
        return docs.sparkSession.createDataFrame(
            [], "w1 string, w2 string, c_pair long, pmi_nano long"
        )
    scored = (
        pairs.join(uni.select(F.col("w").alias("w1"),
                              F.col("cu").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("cu").alias("c2")), "w2")
        .select(
            "w1", "w2", F.col("c_pair").cast("long").alias("c_pair"),
            (
                nano(F.col("c_pair")) - nano(F.lit(n_b))
                - nano(F.col("c1")) - nano(F.col("c2"))
                + F.lit(2) * nano(F.lit(n_t))
            ).cast("long").alias("pmi_nano"),
        )
    )
    return scored.orderBy(
        F.col("pmi_nano").desc(), "w1", "w2"
    ).limit(int(k))



def readability(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch–Kincaid-style readability signals per document — the
    sentence-structure quality heuristic family (words/sentence,
    chars/word as the syllable proxy, and the FKGL-shaped composite)
    used in C4-era rule filters alongside length/punct gates.

    All ratios are exact integers (the integer-ppm lesson):
      wps_milli = 1000·n_words DIV n_sents
      cpw_milli = 1000·n_chars DIV n_words
      fk_micro  = (390000·n_words) DIV n_sents
                + (11800000·n_chars) DIV n_words − 15590000
    (the FKGL coefficients 0.39 / 11.8 / −15.59 lifted to micro-units;
    two integer DIVs of non-negative operands, engine-identical).
    Sentences = non-empty segments after splitting on /[.!?]+/ (same
    regex class in Java and RE2); a doc with no terminator counts as
    ONE sentence; n_chars sums TOKEN lengths (consistent with the
    shared whitespace tokenizer, so punctuation-only "words" count as
    their symbols). Token-less documents emit no row (no denominator)
    in both engines.

    Scale: pure per-row JVM expressions — zero shuffles, a map over
    the corpus. Returns (id, n_sents, n_words, n_chars, wps_milli,
    cpw_milli, fk_micro)."""
    base = docs.select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("__t"),
        F.greatest(
            F.size(
                F.filter(
                    F.split(F.col(text_col), r"[.!?]+"),
                    lambda s: F.trim(s) != "",
                )
            ),
            F.lit(1),
        ).cast("long").alias("n_sents"),
    ).filter(F.size("__t") > 0)
    per = base.select(
        "id",
        "n_sents",
        F.size("__t").cast("long").alias("n_words"),
        F.aggregate(
            F.col("__t"), F.lit(0).cast("long"),
            lambda a, t: a + F.length(t),
        ).alias("n_chars"),
    )
    return per.select(
        "id",
        "n_sents",
        "n_words",
        "n_chars",
        F.expr("(1000 * n_words) DIV n_sents").cast("long")
        .alias("wps_milli"),
        F.expr("(1000 * n_chars) DIV n_words").cast("long")
        .alias("cpw_milli"),
        F.expr(
            "(390000 * n_words) DIV n_sents"
            " + (11800000 * n_chars) DIV n_words - 15590000"
        ).cast("long").alias("fk_micro"),
    )


def lang_confusion(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Declared-vs-predicted language confusion matrix for the lang-ID
    heuristic — the model-eval table a pipeline publishes before
    trusting predicted language for routing/filtering (which cells
    disagree tells you which stopword sets need work). One row per
    (declared, predicted) pair with the count and its share of the
    declared language's mass in integer ppm.

    Scale: the per-row predictor is pure JVM expressions; the matrix
    is one groupBy(lang, lang_pred) bounded by |langs|²; the row share
    joins the per-lang total BACK onto the matrix (groupBy + broadcast
    join, not a count-over-window on the lang key — the documented
    skew trap: a mega-language would be one unsplittable window
    partition). Returns (lang, lang_pred, n, row_ppm)."""
    cells = (
        docs.select(
            F.col(lang_col).alias("lang"),
            lang_id(F.col(text_col)).alias("lang_pred"),
        )
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = cells.groupBy("lang").agg(F.sum("n").alias("__t"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "lang_pred",
            "n",
            F.expr("(1000000 * n) DIV __t").cast("long").alias("row_ppm"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram NOVELTY: the share of a doc's distinct
    n-grams that occur in NO other document (corpus df = 1), in integer
    ppm — the inverse-boilerplate signal: high novelty marks original
    content, near-zero novelty marks mirror/template pages even when
    no single pair clears a near-dup threshold (the diffuse-duplication
    case pairwise dedup misses). The per-doc complement of the
    corpus-level duplicate-mass counts in ``chunk_cdc``.

    Exact integer ppm; docs with < n tokens emit no row (no grams) in
    both engines. Scale: one distinct-gram explode (the MinHash
    chain's fan-out floor) → gram df groupBy with map-side combine →
    join back on the high-cardinality gram key → per-doc count
    aggregate. No windows, no skewed keys (a hot boilerplate gram is
    one grouped row, and its df>1 verdict broadcasts back through the
    equi-join). Returns (id, n_grams, n_unique, novelty_ppm)."""
    from ppocr_spark import cache

    grams = cache.track_if_large(
        docs,
        spread(
            docs.select(F.col(id_col).alias("id"),
                        tokens(F.col(text_col)).alias("__t"))
        )
        .select("id", F.explode(
            F.array_distinct(ngrams_from_tokens(F.col("__t"), n))
        ).alias("g")),
    )
    df_tab = grams.groupBy("g").agg(F.count("*").alias("__df"))
    return (
        grams.join(df_tab, "g")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("__df") == 1, 1).otherwise(0))
            .cast("long").alias("n_unique"),
        )
        .select(
            "id", "n_grams", "n_unique",
            F.expr("(1000000 * n_unique) DIV n_grams").cast("long")
            .alias("novelty_ppm"),
        )
    )
