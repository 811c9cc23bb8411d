"""Distributed BPE vocabulary training + application (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units") —
the tokenizer-training step of an LLM data pipeline, built Spark-first.

The classic reduction makes this tractable at corpus scale: BPE never
iterates the corpus, it iterates the WORD-FREQUENCY table (one
corpus-sized shuffle up front collapses 10^12 docs to a vocabulary-sized
(word, freq) relation). Each merge step is then

  1. one map-side-combined groupBy over the word table's adjacent
     symbol pairs (vocabulary-sized, not corpus-sized), and
  2. a bounded driver sync of exactly ONE row (the argmax pair — the
     same pattern as a Lloyd iteration's centroid sync), and
  3. a map-side per-row fold that applies the merge to each word's
     symbol sequence (no shuffle).

Applying a trained vocabulary to the corpus is one equi-join of the
exploded token stream against the vocabulary-sized segmentation table —
broadcastable for real vocabularies.

Cross-engine exactness: the greedy left-to-right non-overlapping merge
is expressed as a string fold over separator-prefixed symbols — the
same CASE/endswith/concat chain runs as Spark ``aggregate`` and DuckDB
``list_reduce`` (see ``tools/check_oracles.py`` twins), so every merge
decision, tie-break (count DESC, left ASC, right ASC — binary compare
over ASCII tokens), and segmented stream is bit-identical. No floats
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ppocr_spark import cache
from ppocr_spark.functions.text import spread, tokens

#: end-of-word marker appended to every word's character sequence (the
#: Sennrich convention; lets merges distinguish suffixes from prefixes)
EOW = "</w>"


def _sql_lit(s: str) -> str:
    """Spark-SQL single-quoted literal (backslash escaping)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(seq_col: str, left: str, right: str) -> str:
    """Greedy left-to-right non-overlapping merge of (left, right) in a
    symbol array, as a pure string fold: symbols are prefixed with the
    unit separator (char(31) — excluded from the token universe by
    ``word_table``'s filter, so never part of a symbol), so
    ``endswith(acc, sep || left)`` tests exactly "the last complete
    symbol is `left`" (symbols are separator-free, and a symbol merged
    earlier in the same fold can never equal `left` — it is
    left||right, which is strictly longer). Chains resolve exactly like
    the sequential scan: 'a a a a' under (a,a) → [aa, aa]."""
    ls, rs = _sql_lit(left), _sql_lit(right)
    return (
        f"filter(split(aggregate(transform({seq_col}, "
        "s -> concat(char(31), s)), '', (acc, x) -> CASE WHEN "
        f"endswith(acc, concat(char(31), {ls})) "
        f"AND x = concat(char(31), {rs}) "
        f"THEN concat(acc, {rs}) ELSE concat(acc, x) END), char(31)), "
        "s -> s <> '')"
    )


def _char_seq_expr(word_col: str) -> str:
    """word → its character symbols plus the end-of-word marker."""
    return (
        f"concat(filter(split({word_col}, ''), c -> c <> ''), "
        f"array({_sql_lit(EOW)}))"
    )


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized pass: (word, freq) with map-side combine.

    Tokens containing the fold separator (U+001F, which whitespace
    tokenization does NOT remove — it isn't regex ``\\s``) are excluded:
    a separator inside a symbol would fragment the merge fold's
    separator-prefixed string encoding and silently corrupt pair counts.
    Excluding them here (and therefore from the segmentation vocabulary,
    whose inner join drops the same tokens corpus-side) is the standard
    pre-tokenizer control-character normalization, applied identically
    by the DuckDB twin."""
    return (
        spread(docs.select(tokens(F.col(text_col)).alias("__toks")))
        .select(F.explode("__toks").alias("word"))
        .filter(~F.col("word").contains("\x1f"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, segmented_words)``: the merge table
    (merge_idx 1.., left, right, pair_count) and the final
    vocabulary-sized segmentation table (word, freq, seq) that
    ``bpe_segment`` joins against. Each step's pair count is a
    vocabulary-sized aggregate; the argmax is ONE driver row; ties
    break (count DESC, left ASC, right ASC)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = cache.track(word_table(docs, text_col))
    seqs = words.withColumn("seq", F.expr(_char_seq_expr("word")))
    merges: list[tuple[int, str, str, int]] = []
    # cache rotation: step s's argmax job fills step s's cache while
    # reading step s-1's — after the collect, s-1's copy is dead. Without
    # rotation a large n_merges pins O(n_merges) materialized vocabulary
    # tables in executor storage until release_all.
    prev_cached: DataFrame | None = None
    for step in range(1, n_merges + 1):
        seqs = cache.track(seqs)
        best = (
            seqs.withColumn(
                "__a", F.expr("slice(seq, 1, size(seq) - 1)")
            )
            .withColumn("__b", F.expr("slice(seq, 2, size(seq) - 1)"))
            .select(
                "freq", F.explode(F.arrays_zip("__a", "__b")).alias("__p")
            )
            .groupBy(
                F.col("__p.__a").alias("l"), F.col("__p.__b").alias("r")
            )
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if prev_cached is not None:
            prev_cached.unpersist()  # release_all's later no-op is safe
        prev_cached = seqs
        if not best:  # corpus exhausted (every word fully merged)
            break
        row = best[0]
        merges.append((step, row["l"], row["r"], int(row["c"])))
        seqs = seqs.withColumn(
            "seq", F.expr(_merge_expr("seq", row["l"], row["r"]))
        )
    spark = docs.sparkSession
    merges_df = spark.createDataFrame(
        merges, "merge_idx long, left string, right string, pair_count long"
    )
    return merges_df, seqs


def bpe_segment(
    docs: DataFrame,
    segmented_words: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained segmentation to the corpus: explode the token
    stream, equi-join each token against the vocabulary-sized
    (word, seq) table (broadcastable for real vocabularies; Spark's
    join selection handles it), and reassemble per-document stats.
    Returns (doc_id, n_tokens, n_symbols, stream_md5) where stream_md5
    fingerprints the full space-joined symbol stream in token order —
    string-exact across engines."""
    toks = spread(
        docs.select(
            F.col(id_col), tokens(F.col(text_col)).alias("__toks")
        )
    ).select(
        id_col, F.posexplode("__toks").alias("pos", "word")
    )
    seg = toks.join(
        segmented_words.select("word", "seq"), "word"
    ).select(
        id_col,
        "pos",
        F.size("seq").alias("n_sym"),
        F.array_join("seq", " ").alias("segtxt"),
    )
    return seg.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("n_sym").alias("n_symbols"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "segtxt"))),
                    lambda x: x["segtxt"],
                ),
                " ",
            )
        ).alias("stream_md5"),
    )
