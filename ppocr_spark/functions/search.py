"""Corpus search operators: BM25 scoring / top-k retrieval.

A training-data pipeline mines its corpus constantly — "find the
documents most about X" (quality probes, contamination spot-checks,
targeted sampling). BM25 over the whitespace token stream is the
standard lexical scorer; here it is one declarative Spark plan with the
scale levers explicit:

- tokens are filtered to the QUERY'S terms *before* any shuffle — the
  exploded stream that reaches the aggregation is ≤ |query| rows per
  document, not the corpus token count;
- corpus constants (N, avgdl) and per-term document frequencies reduce
  to one broadcastable row / ≤|query| rows — the joins that attach them
  are broadcast hash joins, never a shuffle of the corpus side;
- the per-(doc, term) partial scores are summed as DECIMALS after
  rounding, so the document score is independent of partition order /
  term arrival order and the DuckDB oracle reproduces it bit-for-bit
  (the repo-wide decimal-exact aggregation rule);
- top-k is a global ``orderBy(...).limit(k)`` — Spark plans
  TakeOrderedAndProject (per-partition heap + driver merge of k rows),
  NOT a full sort shuffle.

No Python rows anywhere: pure pyspark.sql expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

# score precision: partial scores rounded to 9 decimals, summed exactly
_SCALE = 9


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25(query) → (id, score, rank).

    idf(t) = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))  (Robertson/Lucene
    form — always positive), tf saturation k1, length normalization b
    against the corpus mean token count. Ties break on doc id ascending.

    Per-term partial scores are computed in float64 with one fixed
    expression tree (identical in the DuckDB oracle), rounded to 9
    decimals, and summed as DECIMAL(38,9) so the total is exact and
    term-order/partition independent; the final score is surfaced
    rounded to 6.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))

    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    ).select("id", "toks", F.size("toks").cast("long").alias("dl"))

    # corpus constants: one row, broadcast to every partial-score row
    consts = F.broadcast(
        base.agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.sum("dl") / F.count("*")).alias("avgdl"),
        )
    )

    # per-(doc, term) counts — tokens filtered to the query terms BEFORE
    # the explode/shuffle, so the aggregated stream is tiny. tf feeds BOTH
    # dfreq and the scored join below; whether to persist it depends on
    # scale (track_if_large): against a multi-TB corpus the persist saves
    # a second full scan, but at bench scale it LOSES to recomputation
    # (interleaved A/B at sf0.1: 1.35 s persisted vs 0.89 s recomputed —
    # the cache barrier costs more than re-running the slim subtree)
    from ppocr_spark import cache

    tf = cache.track_if_large(
        docs,
        base.select(
            "id",
            "dl",
            F.explode(
                F.filter(F.col("toks"), lambda t: t.isin(*terms))
            ).alias("term"),
        )
        .groupBy("id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf")),
    )

    # per-term document frequency: ≤ |query| rows — broadcast
    dfreq = F.broadcast(
        tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    part = (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("dl") / F.col("avgdl"))
            )
        )
        * idf
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(consts)
        .select(
            "id",
            F.round(part, _SCALE)
            .cast(f"decimal(38,{_SCALE})")
            .alias("part"),
        )
        .groupBy("id")
        .agg(F.sum("part").alias("dscore"))
    )
    # TakeOrderedAndProject keeps k rows; ranking the k survivors is a
    # single-partition window over k rows (exact dscore order, then the
    # display score is rounded)
    top = scored.orderBy(F.col("dscore").desc(), F.col("id").asc()).limit(k)
    w = Window.orderBy(F.col("dscore").desc(), F.col("id").asc())
    return top.select(
        "id",
        F.round(F.col("dscore").cast("double"), 6).alias("score"),
        F.row_number().over(w).alias("rank"),
    )


def tfidf_topk_terms(
    docs: DataFrame,
    k: int = 5,
    min_df: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k keywords by tf-idf → (id, term, tf, score,
    rank) — the keyword/topic-mining pass of a corpus pipeline.

    tf-idf(t, d) = (tf / dl) * ln(N / df_t) with raw counts, natural log,
    ties → term ascending. ``min_df`` drops hapax noise before ranking.

    Scale shape: one shuffle builds the (doc, term) count table from the
    exploded token stream (map-side partial aggregation absorbs the
    explosion), the per-term document-frequency table derives from the
    SAME table (one more bounded shuffle on term — vocabulary-sized, not
    corpus-sized), and the re-join of idf onto the counts is an equi-join
    on term. The final top-k is a per-document window — partitions
    bounded by a document's distinct-term count. No driver-side state,
    no broadcast of anything unbounded (vocabularies outgrow broadcast).
    """
    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    ).select("id", "toks", F.size("toks").cast("double").alias("dl"))
    n_docs = F.broadcast(
        base.agg(F.count("*").cast("double").alias("n_docs"))
    )
    # tf feeds dfreq AND the scored re-join: persist only at scale
    # (track_if_large — see bm25_topk; A/B at sf0.1: 1.26 s recomputed
    # vs 1.64 s persisted)
    from ppocr_spark import cache

    tf = cache.track_if_large(
        docs,
        base.select("id", "dl", F.explode("toks").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf")),
    )
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    ).filter(F.col("df") >= float(min_df))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(n_docs)
        .select(
            "id",
            "term",
            F.col("tf").cast("long").alias("tf_count"),
            F.round(
                (F.col("tf") / F.col("dl"))
                * F.log(F.col("n_docs") / F.col("df")),
                9,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "id",
            "term",
            F.col("tf_count").alias("tf"),
            "score",
            "rank",
        )
    )


def build_inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    max_df: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Build the serving-side INVERTED INDEX artifact for the BM25/tf-idf
    query operators: per term, document frequency, collection frequency,
    and the posting list (doc_id:tf entries in ascending doc order,
    serialized to one deterministic string — the segment-file payload).

    Bounded-state by construction: the df band filter (``min_df`` ≤ df ≤
    ``max_df``) runs BEFORE any per-term collect, so no group ever
    aggregates more than ``max_df`` postings — hot stopword terms are
    ELIDED (the classic posting-list strategy: terms in every document
    carry no ranking signal and would otherwise put the whole corpus
    behind single keys), not truncated (truncation would make the
    artifact partition-order dependent). ``sort_array`` pins the posting
    order; nothing in the plan is a window over a term key (the
    documented hot-key trap — df banding is a groupBy + semi-join).

    Scale: one corpus explode → (id, term) tf groupBy (map-side
    combine), one vocabulary-bounded df aggregate, one semi-join back,
    one per-term collect bounded by max_df. Returns
    (term, df, cf, postings)."""
    from ppocr_spark import cache

    from .text import spread as _spread

    tf = cache.track_if_large(
        docs,
        _spread(
            docs.select(
                F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
            )
        )
        .select("id", F.explode("t").alias("term"))
        .groupBy("term", "id")
        .agg(F.count("*").alias("tf")),
    )
    band = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
        .filter(
            (F.col("df") >= F.lit(int(min_df)))
            & (F.col("df") <= F.lit(int(max_df)))
        )
    )
    return (
        tf.join(band, "term")
        .groupBy("term", "df", "cf")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("id", "tf"))
                    ),
                    lambda s: F.concat_ws(":", s["id"], s["tf"]),
                ),
                ",",
            ).alias("postings")
        )
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            "postings",
        )
    )
