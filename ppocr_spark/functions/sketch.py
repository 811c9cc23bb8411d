"""Distributed cardinality sketch: a HyperLogLog whose every step is
engine-replayable (portable hash, string-arithmetic rank, exact integer
harmonic sum).

Why hand-roll when Spark ships ``approx_count_distinct``: the built-in's
HLL++ state is an opaque binary blob with engine-specific hashing and
bias tables — the estimate cannot be value-checked against any other
engine, and the sketch cannot be stored next to the data and merged by
plain SQL. This variant keys registers off ``md5`` (bit-identical in
every engine), derives the rank with pure substring/CASE arithmetic,
and carries the harmonic mean in exact integer nano-units, so the whole
chain — registers, harmonic sum, estimate — replays bit-for-bit in
DuckDB (see ``distinct_hll`` in ``__spark_entry__``).

Scale shape (the reason this family exists at 100 TB): an exact
``countDistinct`` over content hashes shuffles every distinct key; the
sketch is O(m) state. Partial aggregation reduces EACH partition to at
most ``m = 256`` register rows (2 KB) before the one tiny shuffle, so a
10^12-row distinct count runs as a map-side-combine scan plus a 256-row
reduce. Two shards' sketches merge with ``GROUP BY bucket →
max(register)`` — set union is register max — which also makes the
register table a storable, incrementally-updatable audit artifact
(per-crawl sketches unioned into a corpus-wide distinct count without
rescanning old crawls).

Format constants are fixed, not knobs: ``m = 256`` (p=8) means the
bucket is exactly the first md5 byte and the rank reads the next 14 hex
chars — changing them changes the on-disk sketch format. Standard error
is 1.04/sqrt(256) ≈ 6.5%. Below ~2.5·m distinct keys raw HLL reads high
(the regime where the classic estimator switches to linear counting);
``hll_summary`` emits ``zeros`` so a consumer can apply
``m·ln(m/zeros)`` — deliberately NOT emitted here because ``ln`` is a
libm call whose last ulp differs across engines, the documented
cross-engine hazard class.

The reference (hiroi-sora/PaddleOCR-json) has no sketch family; this
extends the corpus-audit surface (cf. ``text.source_quality_report``)
that a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ppocr_spark import cache

# fixed sketch format: p=8 → m=256 buckets (first md5 byte); rank over
# the next 14 hex chars (56 bits) → rho ∈ [1, 57].
M = 256
_SUF = 14
_RHO_MAX = 4 * _SUF + 1

# alpha_256 * m^2 * 10^12 as one exact integer constant, embedded
# identically in the Spark expression and the DuckDB oracle so the
# estimate is a single integer division in both engines:
# alpha_m = 0.7213 / (1 + 1.079/m) = 923264/1285395 exactly at m=256.
K_MILLI = 923264 * M * M * 10**12 // 1285395


def hll_registers(
    df: DataFrame,
    key_col: str = "text",
    salt: str = "hll",
    group_cols: tuple = (),
) -> DataFrame:
    """(group..., bucket, register) sketch rows — at most ``M`` per
    group, whatever the input size. All string/CASE arithmetic,
    JVM-side, one groupBy over ``|groups| x 256`` keys (partial max per
    partition, then a slim shuffle). With ``group_cols`` this is the
    realistic audit shape — distinct users per day/type/source as one
    bounded table instead of one exact countDistinct shuffle per group.

    The rank is HLL's geometric rho read off hex digits: 4 bits per
    leading '0' char, plus 1–4 bits from the first non-zero hex digit
    (d≥8 → its top bit is 1 → one more trial; d=1 → three more zero
    bits first). P(rho ≥ j) = 2^-j exactly, same as bit-level HLL."""
    keys = [F.col(c) for c in group_cols]
    d = df.select(
        *keys,
        F.md5(F.concat(F.lit(salt + ":"), F.col(key_col))).alias("__hx"),
    ).select(
        *group_cols,
        F.conv(F.substring("__hx", 1, 2), 16, 10)
        .cast("long")
        .alias("bucket"),
        F.expr(f"trim(LEADING '0' FROM substring(__hx, 3, {_SUF}))").alias(
            "__st"
        ),
    )
    first = F.substring("__st", 1, 1)
    rho = F.when(F.col("__st") == "", F.lit(_RHO_MAX)).otherwise(
        F.lit(4) * (F.lit(_SUF) - F.length("__st"))
        + F.when(first >= "8", 1)
        .when(first >= "4", 2)
        .when(first >= "2", 3)
        .otherwise(4)
    )
    return (
        d.select(*group_cols, "bucket", rho.cast("long").alias("__rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").cast("long").alias("register"))
    )


def hll_merge(*sketches: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Union of the underlying key sets ≡ per-bucket register max —
    merging K shard/crawl sketches is a ≤ K·M-row aggregate, no rescan."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bucket").agg(
        F.max("register").cast("long").alias("register")
    )


def hll_summary(regs: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """One row per group: (group..., zeros, sum_nano, est_milli).

    The harmonic sum is exact integers: each hit bucket contributes
    ``1e9 DIV 2^register`` nano-units (truncation is identical integer
    division in any engine; total truncation error < m nano-units) and
    each never-hit bucket a whole 1e9. The estimate is then ONE integer
    division by the shared constant ``K_MILLI`` — no float touches the
    chain, so the number is engine-identical by construction. With
    ``group_cols`` the global-aggregate form becomes one bounded
    groupBy (``groupBy()`` with no columns IS the global aggregate, so
    the empty-input one-row contract is unchanged)."""
    agg = regs.groupBy(*group_cols).agg(
        (F.lit(M) - F.count("*")).cast("long").alias("zeros"),
        (
            # coalesce: SUM over an EMPTY register table is NULL, which
            # would poison the zeros-only sum (empty input is the valid
            # "sketch of nothing": zeros = m, est ≈ alpha·m, the raw-HLL
            # n→0 regime the zeros column exists to flag)
            F.coalesce(
                F.sum(
                    F.expr(
                        "1000000000 DIV "
                        "shiftleft(cast(1 as bigint), register)"
                    )
                ),
                F.lit(0),
            )
            + (F.lit(M) - F.count("*")) * F.lit(1000000000)
        )
        .cast("long")
        .alias("sum_nano"),
    )
    # greatest(…,1): sum_nano hits 0 only when every bucket's register
    # ≥ 30 (≳3·10^11 distinct keys) — unreachable at gate scale, but a
    # bare DIV would NULL on Spark and ERROR on DuckDB there; the guard
    # is written identically on both sides so the expressions stay twins
    return agg.select(
        *group_cols,
        "zeros",
        "sum_nano",
        F.expr(f"{K_MILLI} DIV greatest(sum_nano, 1)")
        .cast("long")
        .alias("est_milli"),
    )


# ---------------------------------------------------------------------------
# count-min sketch — the frequency member of the bounded-state family
# (HLL above = distinct counts, dedup.bloom_decontaminate = membership)
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 4096


def _cms_positions(key: Column, salt: str) -> Column:
    """Array of (row, col) cells for one key — the same portable
    md5-15-hex-chars → bigint % w convention as the Bloom filter
    (dedup.bloom_decontaminate), one salted hash row per sketch row."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"cms{j}:{salt}"), key)),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(CMS_W)
                ).alias("col"),
            )
            for j in range(CMS_D)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str = "token", salt: str = ""
) -> DataFrame:
    """(row, col, cnt) counter cells from a key stream — at most
    ``CMS_D x CMS_W`` (16,384) rows whatever the input size: partial
    aggregation combines each partition down to the cell grid before
    the one bounded shuffle, so frequency estimation over a 10^12-token
    stream is a map-side-combine scan plus a 16k-row reduce where the
    exact groupBy would shuffle every distinct token.

    The sketch is LINEAR: two shards'/crawls' sketches merge by
    cell-wise SUM (``cms_merge``), and the standard guarantee holds —
    point estimates overcount by at most ``e/CMS_W`` of the stream
    length with probability ``1 - e^-CMS_D``, never undercount."""
    return (
        df.select(F.explode(_cms_positions(F.col(key_col), salt)).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.col").alias("col"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — stream concatenation ≡ counter addition."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


# fixed sketch format (like the HLL's m and the CMS grid, these are the
# on-disk layout, not knobs): 2^6 = 64 bins per value unit, bin ids
# clamped to +/-2^15 — at most 65,536 cells per group whatever the
# input size, and each cell's lower edge is an EXACT integer number of
# micro-units (10^6 / 64 = 15,625).
QH_SHIFT = 6
QH_SCALE = 1 << QH_SHIFT
QH_BIN_MIN = -(1 << 15)
QH_BIN_MAX = (1 << 15) - 1
QH_LO_MICRO = 10**6 >> QH_SHIFT  # exact: 15625


def _clamped_bin(value: Column) -> Column:
    """Histogram bin for one value — every step float-exact: ``value *
    QH_SCALE`` multiplies by a power of two (an exponent shift, never a
    rounded mantissa), ``floor`` is exact, and the clamp is integer
    ``least/greatest`` — so the bin is bit-identical in any IEEE-754
    engine. Out-of-range values land in the edge bins (documented lossy
    tails, same rule both engines)."""
    return F.least(
        F.greatest(
            F.floor(value * F.lit(QH_SCALE)).cast("long"),
            F.lit(QH_BIN_MIN),
        ),
        F.lit(QH_BIN_MAX),
    )


def quantile_hist(
    df: DataFrame, value_col: str = "value", group_cols: tuple = ()
) -> DataFrame:
    """(group..., bin, cnt) histogram cells — the quantile member of the
    bounded-state sketch family (HLL = distinct counts, CMS = point
    frequencies, Bloom = membership). At most ``2^16`` cells per group
    whatever the input size: partial aggregation combines each partition
    down to its cell set before the one bounded shuffle, so a
    10^12-row percentile estimate runs as a map-side-combine scan plus
    a tiny reduce where Spark's exact ``percentile`` shuffles and sorts
    every value. The sketch is LINEAR (``quantile_hist_merge`` =
    cell-wise sum), so per-shard/per-crawl histograms are storable audit
    artifacts that roll up into corpus-wide quantiles without rescans —
    and unlike ``percentile_approx`` (whose KLL-style state is an
    engine-private blob), every cell and every derived quantile replays
    bit-for-bit in DuckDB (``events_quantile_sketch``).

    Totality: NULL/NaN/±Inf rows are EXCLUDED up front — Spark's
    non-ANSI double→long cast would fold them into edge/null bins while
    DuckDB errors on them, the exact cross-engine divergence class this
    module exists to rule out. A DuckDB twin mirrors the rule with
    ``WHERE isfinite(value)``."""
    keys = [F.col(c) for c in group_cols]
    v = F.col(value_col).cast("double")
    finite = (
        v.isNotNull()
        & ~F.isnan(v)
        & (F.abs(v) != F.lit(float("inf")))
    )
    return (
        df.filter(finite)
        .select(*keys, _clamped_bin(F.col(value_col)).alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def quantile_hist_merge(
    *hists: DataFrame, group_cols: tuple = ()
) -> DataFrame:
    """Stream concatenation ≡ cell-wise count addition."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def quantile_hist_quantiles(
    hist: DataFrame,
    qs: dict[str, int] | None = None,
    group_cols: tuple = (),
) -> DataFrame:
    """Per-group quantile estimates from the cell table: one row per
    group with ``n`` plus, for each requested quantile, the LOWER EDGE
    of the bin holding rank ``ceil(q_ppm * n / 1e6)`` in exact integer
    micro-units (``bin * 15625``); the true value lies within
    ``1/QH_SCALE`` above it. All integer arithmetic — quantile targets
    in ppm, ceil as ``(q*n + 999999) DIV 1e6`` — so the estimates are
    engine-identical by construction (float ranks + round() tie-break
    differently across engines, the documented hazard class).

    Scale shape: the cumulative window and the final groupBy run over
    the ALREADY-BOUNDED cell table (≤ 2^16 rows per group), never the
    value stream."""
    from pyspark.sql import Window

    if qs is None:
        qs = {"p50": 500_000, "p90": 900_000, "p99": 990_000}
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = hist.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w_cum).cast("long").alias("__cum"),
        F.sum("cnt").over(w_all).cast("long").alias("__n"),
    )
    aggs = [F.max("__n").cast("long").alias("n")]
    for name, q_ppm in qs.items():
        rank = F.expr(f"({int(q_ppm)} * __n + 999999) DIV 1000000")
        aggs.append(
            (
                F.min(F.when(F.col("__cum") >= rank, F.col("bin")))
                * F.lit(QH_LO_MICRO)
            )
            .cast("long")
            .alias(f"{name}_lo_micro")
        )
    return c.groupBy(*group_cols).agg(*aggs)


def cms_query(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str = "token",
    salt: str = "",
) -> DataFrame:
    """Point-frequency estimates: min over the key's ``CMS_D`` cells
    (missing cell ⇒ 0). |keys| x CMS_D slim probe rows equi-join the
    cell table — corpus-size-independent."""
    probes = keys.select(
        F.col(key_col).alias("__ck"),
        F.explode(_cms_positions(F.col(key_col), salt)).alias("p"),
    ).select("__ck", F.col("p.row").alias("row"), F.col("p.col").alias("col"))
    j = probes.alias("__cp").join(cms.alias("__cs"), ["row", "col"], "left")
    return (
        j.groupBy("__ck")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("n_est")
        )
        .withColumnRenamed("__ck", key_col)
    )


# ---------------------------------------------------------------------------
# per-group MinHash union signatures → cross-group overlap matrix
# ---------------------------------------------------------------------------
#
# The set-similarity member of the mergeable-sketch family: each group's
# signature is the k-permutation MinHash of the UNION of its documents'
# n-gram sets — because min is associative, the per-group signature is
# just element-wise min over the per-document signatures (one map-side-
# combinable groupBy; the same min merges shard sketches, so per-crawl
# signatures union into corpus-wide ones without rescanning). The
# pairwise matrix estimates cross-source content overlap (Jaccard of the
# gram universes) at |groups|² sketch comparisons — corpus-size-
# independent, the audit a mixture designer runs before weighting
# sources. Signature arithmetic (md5-permutation string mins) is the
# proven dedup_minhash cross-engine contract.


def source_minhash_sigs(
    df: DataFrame,
    group_col: str = "source",
    k: int = 8,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(grp, ssig, n_docs): per-group union MinHash signature — element-
    wise min over the per-doc signatures of the shared dedup chain
    (tokens → ≥n filter → distinct word n-grams → k md5 permutations)."""
    from ppocr_spark.functions.text import (minhash_from_grams,
                                            ngrams_from_tokens, tokens)

    rows = (
        df.select(
            F.col(group_col).alias("grp"),
            tokens(F.col(text_col)).alias("toks"),
        )
        .filter(F.size("toks") >= n)
        .select(
            "grp",
            F.array_distinct(
                ngrams_from_tokens(F.col("toks"), n)
            ).alias("grams"),
        )
        .select(
            "grp", minhash_from_grams(F.col("grams"), k).alias("sig")
        )
    )
    return rows.groupBy("grp").agg(
        F.array(*[F.min(F.col("sig")[i]) for i in range(k)]).alias("ssig"),
        F.count("*").alias("n_docs"),
    )


def minhash_sigs_merge(*sketches: DataFrame, k: int = 8) -> DataFrame:
    """Merge shard signature tables: element-wise min + doc-count sum
    (set union is signature min — same law the per-group aggregate
    uses, so merge(shards) ≡ sketch(union of shards)."""
    from functools import reduce

    u = reduce(DataFrame.unionByName, sketches)
    ex = u.select("grp", "n_docs", *[
        F.col("ssig")[i].alias(f"__h{i}") for i in range(k)
    ])
    return ex.groupBy("grp").agg(
        F.array(*[F.min(f"__h{i}") for i in range(k)]).alias("ssig"),
        F.sum("n_docs").alias("n_docs"),
    )


def minhash_overlap_matrix(sigs: DataFrame, k: int = 8) -> DataFrame:
    """All ordered pairs (a < b) of group signatures with the matching-
    permutation count and the integer-ppm overlap estimate. The pair
    join runs on the |groups|-row SKETCH table (the matrix IS the
    output), never on corpus rows."""
    a = sigs.select(
        F.col("grp").alias("source_a"), F.col("ssig").alias("sa")
    )
    b = sigs.select(
        F.col("grp").alias("source_b"), F.col("ssig").alias("sb")
    )
    return (
        a.join(b, F.col("source_a") < F.col("source_b"))
        .select(
            "source_a",
            "source_b",
            F.expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))")
            .cast("long")
            .alias("matches"),
        )
        .withColumn("overlap_ppm", F.expr(f"(1000000 * matches) DIV {k}"))
    )


def source_gram_overlap_exact(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """EXACT cross-source gram-universe overlap matrix — the
    calibration twin of ``minhash_overlap_matrix`` (the 8-permutation
    sketch estimates this table; running both on a sample is how the
    sketch's error is audited before trusting it at full scale): per
    source pair, |grams(A) ∩ grams(B)|, the union, and exact
    integer-ppm Jaccard.

    Scale: the corpus collapses to the DISTINCT (source, gram) set
    (vocabulary × |sources| bound — grams are per-doc-distinct before
    the global distinct, shrinking the explode); intersections come
    from the gram self-join whose per-gram fan-out is bounded by
    |sources|² (≤ a few hundred pairs per gram no matter how hot the
    gram is — sources, not documents, join); set sizes are one slim
    groupBy. Unlike the sketch path this DOES scan gram strings —
    linear in vocabulary, which is why the sketch exists for
    continuous monitoring and this runs on samples/audits. Emits the
    FULL |sources|² pair universe — zero-intersection pairs included
    (where the sketch errs worst), via a left join from the sizes
    cross product.
    Returns (source_a, source_b, inter, union_n, jaccard_ppm)."""
    from ppocr_spark.functions.text import (
        ngrams_from_tokens,
        spread,
        tokens,
    )

    g = cache.track_if_large(
        docs,
        spread(
            docs.select(
                F.col(source_col).alias("src"),
                tokens(F.col(text_col)).alias("__t"),
            )
        )
        .select(
            "src",
            F.explode(
                F.array_distinct(ngrams_from_tokens(F.col("__t"), n))
            ).alias("g"),
        )
        .distinct(),
    )
    sizes = g.groupBy("src").agg(F.count("*").alias("n"))
    inter = (
        g.alias("x")
        .join(g.alias("y"), (F.col("x.g") == F.col("y.g"))
              & (F.col("x.src") < F.col("y.src")))
        .groupBy(F.col("x.src").alias("source_a"),
                 F.col("y.src").alias("source_b"))
        .agg(F.count("*").alias("__i"))
    )
    # FULL |sources|² pair universe (sizes × sizes, a < b), not just
    # pairs sharing a gram: zero-intersection pairs are exactly where
    # the k=8 sketch errs worst (one accidental permutation match
    # reads 125000 ppm), so the calibration table must show their 0
    pairs = (
        sizes.select(F.col("src").alias("source_a"),
                     F.col("n").alias("na"))
        .join(
            sizes.select(F.col("src").alias("source_b"),
                         F.col("n").alias("nb")),
            F.col("source_a") < F.col("source_b"),
        )
    )
    return (
        pairs.join(inter, ["source_a", "source_b"], "left")
        .select(
            "source_a", "source_b",
            F.coalesce(F.col("__i"), F.lit(0)).cast("long")
            .alias("inter"),
            (F.col("na") + F.col("nb") - F.coalesce(F.col("__i"),
                                                    F.lit(0)))
            .cast("long").alias("union_n"),
            F.expr(
                "(1000000 * coalesce(__i, 0))"
                " DIV (na + nb - coalesce(__i, 0))"
            ).cast("long").alias("jaccard_ppm"),
        )
    )
