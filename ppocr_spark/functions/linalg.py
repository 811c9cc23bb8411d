"""Distributed linear algebra over embedding columns — the spectral
member of the embedding-analytics family: Gram/covariance accumulation
and top-principal-component extraction (embedding-health dashboards,
whitening decisions, anisotropy diagnostics à la Ethayarajh 2019).

Spark-first shape:

- The ONLY corpus-scale pass is the Gram accumulation: one
  ``mapInArrow`` sweep emitting a 64×64 int64 partial product matrix
  per Arrow batch (a single BLAS-free integer matmul — no per-row
  Python), then a groupBy((i,j)) sum over dim² = 4096 keys with
  map-side combine. No shuffle ever carries vectors; what moves is
  ≤ 4096 rows per task.
- Power iterations then run on the 4096-row Gram relation itself:
  matvec = equi-join on j + groupBy(i) sum; normalization = one 1-row
  max attach (the whitelisted constant-attach pattern). Iteration cost
  is independent of corpus size.

Integer exactness contract: vectors are quantized JVM-side with the
fine-quantizer rule (similarity._quantized — ``round(x·10⁶)``, the
proven cross-engine contract), Gram entries are exact integer sums
(decimal(38,0) accumulation ≡ DuckDB HUGEINT), and each iteration
renormalizes with one truncating DIV (Spark ``DIV`` ≡ DuckDB ``//``),
so an oracle replaying the same arithmetic reproduces every loading
bit-for-bit regardless of partitioning.

Magnitude budget (documented, not hoped): |vq| ≤ q·max|x|; Gram entry
≤ n·(q·max|x|)² must fit int64 during per-batch accumulation only per
BATCH (asserted), the cross-batch sum is decimal(38,0)/HUGEINT — exact
to n ≈ 10¹² rows at q = 10⁶, |x| ≤ 1. The matvec ≤ dim·|G|·vscale and
the pre-DIV product ≤ that ×vscale stay under 10³⁸ through the same
range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ppocr_spark import cache
from ppocr_spark.functions.similarity import QUANT, _quantized

#: normalized loading scale per iteration (max |loading| = VSCALE)
VSCALE = 10**6


def gram_matrix_q(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    quant: int = QUANT,
) -> DataFrame:
    """Exact integer Gram matrix Σ x·xᵀ of the quantized embedding
    column: (i, j, g) with g = Σ_rows vq[i]·vq[j] as decimal(38,0).
    One corpus pass, one 4096-key aggregate."""
    import pyarrow as pa

    pre = df.select(_quantized(F.col(vec_col), quant).alias("vq"))

    def batches(it):
        import numpy as np

        idx = np.arange(dim, dtype=np.int64)
        ii, jj = np.repeat(idx, dim), np.tile(idx, dim)
        for b in it:
            if b.num_rows == 0:
                continue
            flat = (
                b.column(0)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            x = flat.reshape(b.num_rows, dim)
            mx = int(np.abs(x).max(initial=0))
            if mx and b.num_rows >= (2**63 - 1) // (mx * mx):
                raise ValueError(
                    "gram_matrix_q per-batch int64 bound exceeded: "
                    f"{b.num_rows} rows × (max|vq|={mx})²"
                )
            gp = x.T @ x
            yield pa.RecordBatch.from_arrays(
                [pa.array(ii), pa.array(jj), pa.array(gp.reshape(-1))],
                ["i", "j", "g_part"],
            )

    part = pre.mapInArrow(batches, "i long, j long, g_part long")
    return part.groupBy("i", "j").agg(
        F.sum(F.col("g_part").cast("decimal(28,0)")).alias("g")
    )


def pca_power_top(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
    quant: int = QUANT,
    vscale: int = VSCALE,
) -> DataFrame:
    """Top principal direction of the (uncentered) Gram matrix via
    ``iters`` integer power-iteration steps from the all-ones start:

        w_i  = Σ_j G[i,j] · v_j          (exact decimal sum)
        v'_i = (w_i · vscale) DIV max(|w|, 1)   (truncating DIV)

    Returns (dim, loading_micro) — 64 rows, |loading| ≤ vscale, sign
    pinned by the deterministic start vector. The Gram relation is
    persisted across iterations (cache.track) so the corpus is scanned
    exactly once."""
    spark = df.sparkSession
    g = cache.track(gram_matrix_q(df, vec_col, dim, quant))
    v = spark.range(dim).select(
        F.col("id").cast("long").alias("j"),
        F.lit(vscale).cast("long").alias("v"),
    )
    for _ in range(iters):
        w = (
            g.join(v, "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.col("g") * F.col("v").cast("decimal(8,0)")
                ).alias("w")
            )
        )
        m = w.agg(
            F.expr(
                "greatest(max(abs(w)), CAST(1 AS DECIMAL(38,0)))"
            ).alias("m")
        )
        v = w.crossJoin(m).select(
            F.col("i").alias("j"),
            F.expr(f"CAST((w * {vscale}) DIV m AS BIGINT)").alias("v"),
        )
    return v.select(
        F.col("j").alias("dim"), F.col("v").alias("loading_micro")
    )
