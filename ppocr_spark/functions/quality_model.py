"""Distilled quality model: a linear probe trained distributed over the
corpus to imitate the rule-based quality gate — the classifier-distillation
step of an LLM data-curation pipeline (heuristic gates label a corpus
sample; a cheap learned scorer generalizes them), expressed entirely as
DataFrame aggregations. No MLlib, no driver-side data beyond the weight
vector.

Training is full-batch gradient descent on squared loss:

    w ← w − lr · (2/n) Σ_i (w·x_i − y_i) x_i

Each step is ONE slim distributed aggregate: per-row residuals stay in
whole-stage codegen, per-feature gradient terms are rounded then summed
as DECIMALS — exact and order-independent across partials — so the same
step is reproducible bit-for-bit by the DuckDB oracle (the same device as
``similarity.ivf_topk``'s decimal-exact Lloyd step; float sums would
diverge between engines and between runs). The driver holds only the
n_features-long weight vector between steps.

At 100 TB: each step is a map-side-combined aggregate over
(feature_idx) — n_features partial rows per task, one tiny shuffle; cost
is one corpus scan per step (or per k steps if features are cached).
Squared loss (a linear probe) rather than logistic keeps every operation
closed-form arithmetic: no transcendentals whose last-ulp behavior
differs across libms/engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import dup_ngram_fraction, token_count

# feature scaling keeps raw magnitudes O(1) so literal weights stay tame
FEATURE_NAMES = ("bias", "tokens_c", "chars_k", "dup2")
INIT_WEIGHTS = (0.1, -0.05, 0.2, -0.3)
ROUND = 9  # gradient-term rounding (shared with the oracle)


def doc_features(text_col: Column) -> Column:
    """Feature vector [1, n_tokens/100, n_chars/1000, dup_2gram_frac] —
    every component a portable JVM expression the oracle restates."""
    return F.array(
        F.lit(1.0),
        (token_count(text_col).cast("double") / F.lit(100.0)),
        (F.length(text_col).cast("double") / F.lit(1000.0)),
        dup_ngram_fraction(text_col, 2).cast("double"),
    )


def gate_label(text_col: Column) -> Column:
    """Teacher label: the Gopher-style rule gate (len + repetition), as a
    0/1 double."""
    keep = (F.length(text_col) >= 100) & (
        dup_ngram_fraction(text_col, 2) < 0.05
    )
    return keep.cast("double")


def gd_step(
    feats: DataFrame,
    weights: list[float],
    lr: float = 0.5,
    x_col: str = "x",
    y_col: str = "y",
) -> tuple[list[float], list[float]]:
    """One distributed full-batch GD step. ``feats`` has x: array<double>
    (len = len(weights)) and y: double. Returns (gradient, new_weights),
    both plain Python lists (n_features long — the only driver-side
    state).

    Exactness: residual·x_j is rounded to ``ROUND`` decimals per row and
    summed as decimal(28,9) — associative/commutative, so any partition
    layout (and the sequential DuckDB oracle) produces identical sums.

    Null hygiene: rows with a null label or any null feature are DROPPED
    before the aggregate — sum() skips null terms but count(*) would
    still count their rows, silently diluting the gradient denominator
    (grad = 2·Σ/n over fewer contributors than n)."""
    feats = feats.filter(
        F.col(y_col).isNotNull()
        & F.col(x_col).isNotNull()
        & ~F.exists(F.col(x_col), lambda v: v.isNull())
    )
    w = F.array(*[F.lit(float(v)) for v in weights])
    resid = (
        F.aggregate(
            F.zip_with(F.col(x_col), w, lambda x, wi: x * wi),
            F.lit(0.0),
            lambda a, z: a + z,
        )
        - F.col(y_col)
    )
    terms = feats.select(
        resid.alias("r"),
        F.posexplode(x_col).alias("j", "xj"),
    ).select(
        "j",
        F.round(F.col("r") * F.col("xj"), ROUND)
        .cast("decimal(28,9)")
        .alias("t"),
    )
    agg = (
        terms.groupBy("j")
        .agg(F.sum("t").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    grad = [0.0] * len(weights)
    for r in agg:
        grad[r["j"]] = 2.0 * float(r["s"]) / float(r["n"])
    # pure float64 update — IEEE-identical on any engine, no rounding
    # (Python round() is banker's, SQL round() is half-away: never mix)
    new_w = [wi - lr * gi for wi, gi in zip(weights, grad)]
    return grad, new_w


def train_quality_probe(
    docs: DataFrame,
    text_col: str = "text",
    iters: int = 8,
    lr: float = 0.5,
    init: tuple[float, ...] = INIT_WEIGHTS,
) -> list[float]:
    """Distill the rule gate into a linear probe: ``iters`` distributed GD
    steps over (doc_features, gate_label). Deterministic end to end —
    same corpus, same weights, any cluster size."""
    feats = docs.select(
        doc_features(F.col(text_col)).alias("x"),
        gate_label(F.col(text_col)).alias("y"),
    )
    feats = feats.persist()
    try:
        w = list(init)
        for _ in range(iters):
            _, w = gd_step(feats, w, lr)
        return w
    finally:
        feats.unpersist()


def score_docs(
    docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained probe: quality_score = w·x, clamped to [0, 1] (the
    squared-loss probe regresses the 0/1 teacher directly). Pure per-row
    JVM expressions — scoring a corpus is one scan, no shuffle."""
    w = F.array(*[F.lit(float(v)) for v in weights])
    raw = F.aggregate(
        F.zip_with(doc_features(F.col(text_col)), w, lambda x, wi: x * wi),
        F.lit(0.0),
        lambda a, z: a + z,
    )
    return docs.select(
        F.col(id_col),
        F.round(F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw)), 6).alias(
            "quality_score"
        ),
    )
