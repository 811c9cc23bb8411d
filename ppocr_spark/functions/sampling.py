"""Deterministic corpus splitting / sampling operators for training-data
pipelines: hash splits, stratified sampling, and token-budget mixture
sampling.

All "randomness" is content-keyed md5 over stable ids — reproducible
across runs, engines (the DuckDB oracles share the literal thresholds),
cluster sizes, and input partitionings; no RNG state, no driver
coordination, no ``rand()`` (whose per-partition seeding makes results
depend on the physical split layout).

100 TB design notes:

- ``hash_split`` / ``stratified_sample`` are narrow per-row projections /
  filters — ZERO shuffles; they push down past nothing and cost one scan.
- ``token_budget_sample`` is the exact "largest hash-ordered prefix whose
  token sum fits the budget" selection (the mixture-weighting step of a
  training run: take ~B tokens of lang X, deterministically). A naive
  implementation is a global per-group window cumsum — a single-partition
  sort per group, which dies when one group holds 50 TB. Here it is a
  two-pass bucketed cumulative histogram instead:

    1. map-side-combined ``groupBy(group, bucket)`` over 16-bit md5
       buckets → at most n_groups × 65536 rows, whatever N is;
    2. cross-bucket prefix sums via a window over THAT bounded table;
    3. broadcast the surviving (cum_start < budget) bucket offsets back
       and run the per-row cumsum window partitioned by (group, bucket) —
       every window partition is ~N/65536 rows, and buckets entirely
       past the budget are pruned by the inner join before the sort.

  No global sort, no unbounded window partition, one shuffle for the
  histogram and one for the per-bucket window.

Hex-string ordering trick: md5 renders lowercase fixed-width hex in both
Spark and DuckDB, and lexicographic order on fixed-width lowercase hex
equals numeric order ('0'-'9' < 'a'-'f' in ASCII) — so thresholds and
bucket sort keys are plain string literals both engines agree on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count, tokens

HEX_W = 4  # 16-bit bucket space: 65536 buckets / threshold resolution
# per-group cap/quota filters use a 32-bit threshold space: 16 bits
# truncates to zero (drops the whole group) once n > cap * 65536
CAP_HEX_W = 8


def _id_hash(id_col: Column, salt: str = "") -> Column:
    """Stable lowercase-hex hash of a row id (salted to decorrelate
    independent sampling decisions on the same ids)."""
    if salt:
        return F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string")))
    return F.md5(id_col.cast("string"))


def frac_threshold(frac: float) -> str:
    """Hex threshold literal t with P[hash4 < t] = floor(frac*2^16)/2^16.
    Shared with the DuckDB oracles (same literal, same comparison)."""
    t = int(frac * (1 << (4 * HEX_W)))
    return format(min(t, (1 << (4 * HEX_W)) - 1), f"0{HEX_W}x") \
        if frac < 1.0 else "g" * HEX_W  # 'gggg' > any hex string: keep all


def split_thresholds(
    weights: list[tuple[str, float]],
) -> list[tuple[str, str]]:
    """Cumulative hex thresholds for ``hash_split``: [(name, upper_hex)].
    The last class is the ELSE arm (its threshold is unused) so weights
    that don't sum exactly to 1.0 still partition every row."""
    total = sum(w for _, w in weights)
    out, cum = [], 0.0
    for name, w in weights:
        cum += w / total
        out.append((name, frac_threshold(min(cum, 1.0))))
    return out


def hash_split(
    df: DataFrame,
    weights: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column
    keyed on md5(id) bucket thresholds. Pure projection — no shuffle, no
    RNG; the same id lands in the same split on any cluster, any run,
    any partitioning (unlike ``randomSplit``, whose assignment changes
    with the physical partition layout)."""
    weights = weights or [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    h4 = F.substring(_id_hash(F.col(id_col), salt), 1, HEX_W)
    ths = split_thresholds(weights)
    expr = F.lit(ths[-1][0])
    for name, upper in reversed(ths[:-1]):
        expr = F.when(h4 < F.lit(upper), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff
    md5(salt:stratum:id)[:4] < threshold(stratum). Strata absent from
    ``fractions`` are dropped (fraction 0). Pure filter — no shuffle;
    hashing (stratum, id) decorrelates the keep decision from any other
    hash-keyed stage (splits, buckets) on the same ids."""
    h4 = F.substring(
        F.md5(
            F.concat(
                F.lit(salt + ":"),
                F.col(strata_col),
                F.lit(":"),
                F.col(id_col).cast("string"),
            )
        ),
        1,
        HEX_W,
    )
    cond = F.lit(False)
    for stratum, frac in sorted(fractions.items()):
        cond = cond | (
            (F.col(strata_col) == stratum) & (h4 < F.lit(frac_threshold(frac)))
        )
    return df.filter(cond)


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int] | int,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-budget mixture sampling: per group, keep the largest
    md5-hash-ordered prefix of documents whose cumulative whitespace-token
    count stays within the group's budget. Deterministic and maximal: the
    kept set is identical on any cluster, and adding the next document in
    hash order would exceed the budget.

    Returns (id, group, n_toks, cum_toks) for kept rows, where cum_toks
    is the running total in the canonical (bucket, hash, id) order — the
    DuckDB oracle recomputes the identical prefix with one naive window.

    Scale path (see module docstring): bucketed cumulative histogram —
    bounded histogram window, broadcast bucket offsets, per-bucket row
    window; buckets wholly past the budget never reach the sort.
    """
    if isinstance(budgets, int):
        budget = F.lit(budgets)
        groups_filter = None
    else:
        budget = F.lit(None).cast("long")
        for g, b in sorted(budgets.items()):
            budget = F.when(F.col(group_col) == g, F.lit(b)).otherwise(budget)
        groups_filter = F.col(group_col).isin(*budgets.keys())

    h = _id_hash(F.col(id_col), "budget")
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        token_count(F.col(text_col)).cast("long").alias("n_toks"),
        h.alias("h"),
        F.substring(h, 1, HEX_W).alias("bkt"),
    )
    if groups_filter is not None:
        base = base.filter(groups_filter)

    # pass 1: bounded histogram (map-side partial agg → ≤ groups×65536 rows)
    hist = base.groupBy(group_col, "bkt").agg(F.sum("n_toks").alias("btoks"))
    wb = Window.partitionBy(group_col).orderBy("bkt")
    offsets = (
        hist.withColumn("cum_end", F.sum("btoks").over(wb))
        .withColumn("cum_start", (F.col("cum_end") - F.col("btoks")))
        # prune buckets that start past the budget — <=, not <: a bucket
        # starting exactly AT the budget can still contribute zero-token
        # rows whose running total equals the budget (kept by cum<=budget)
        .filter(F.col("cum_start") <= budget)
        .select(group_col, "bkt", "cum_start")
    )

    # pass 2: per-bucket row cumsum on the surviving buckets only
    joined = base.join(F.broadcast(offsets), [group_col, "bkt"])
    wr = (
        Window.partitionBy(group_col, "bkt")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn(
            "cum_toks", F.col("cum_start") + F.sum("n_toks").over(wr)
        )
        .filter(F.col("cum_toks") <= budget)
        .select(id_col, group_col, "n_toks", "cum_toks")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows (the training /
    retrieval chunking step): chunk i covers whitespace tokens
    [i*stride, i*stride + chunk_tokens). Windows are emitted while they
    add new tokens — a start > 0 whose tokens are fully covered by the
    previous window is dropped (no degenerate tail subsets); zero-token
    documents emit no chunks.

    Pure per-row JVM expressions (sequence → filter → posexplode →
    slice): ZERO shuffles, whole-stage codegen, scales as one scan.
    Returns (id, chunk_idx, chunk_text, n_tokens).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    # tokenize ONCE into a materialized column — the regex split chain is
    # the dominant per-row cost, and Catalyst does not share the
    # subexpression across the filter / sequence bound / slice uses
    base = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") > 0)
    n = F.size(F.col("__toks"))
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        # keep a start iff the previous window did not already reach the
        # document's end (start 0 always kept for non-empty docs)
        lambda s: (s == 0) | (s - stride + chunk_tokens < n),
    )
    return (
        base.select(
            F.col(id_col),
            F.col("__toks"),
            F.posexplode(starts).alias("chunk_idx", "__start"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
            F.size(
                F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
            ).alias("n_tokens"),
        )
    )


def chunk_cdc(
    df: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_dup_counts: bool = True,
) -> DataFrame:
    """Content-defined chunking (Rabin/FastCDC family, stateless
    variant): cut each document where the rolling ``window``-char gram's
    content hash hits a fixed pattern, so chunk boundaries survive
    insertions/deletions — shifting a prefix re-aligns every later
    boundary, which fixed-size chunking cannot do. This is the
    sub-document dedup primitive (chunk-level dedup of crawl/code
    corpora finds duplicated passages that whole-doc hashing misses).

    Boundary rule: a cut falls AFTER 1-based char position i
    (window <= i <= len-1) iff ``md5`` of the ``window`` chars ending at
    i ends in hex '0' — an expected boundary rate of 1/16, i.e. a mean
    chunk of ~16 chars over the window floor. md5 is byte-identical
    across engines, so boundaries are string-exact and need no float or
    integer-conversion contract. The classic min/max chunk-size clamps
    are deliberately omitted: they make boundary j depend on boundary
    j-1 (a sequential scan), while the stateless rule is a pure per-row
    expression.

    Scale shape: boundary detection, chunk slicing, and hashing are
    per-row JVM higher-order functions — ZERO shuffles, whole-stage
    codegen, scales as one scan. The optional corpus duplicate count is
    one groupBy on the content hash (md5 keys: uniform, skew-free) plus
    an equi-join back. Returns (doc_id, chunk_idx, start, len,
    chunk_md5[, n_dups_corpus]).
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    w = window
    from ppocr_spark.functions.text import spread

    # spread: the md5-per-position boundary scan is the dominant cost and
    # must not run on a single local parquet split (no-op at corpus scale)
    base = spread(
        df.select(F.col(id_col), F.col(text_col).alias("__t")).filter(
            F.length("__t") >= 1
        )
    )
    # sequence(a, b) runs DESCENDING when b < a — guard short docs to an
    # empty boundary list instead
    bnds = F.when(
        F.length("__t") > w,
        F.expr(
            f"filter(sequence({w}, length(__t) - 1), "
            f"i -> substring(md5(substring(__t, i - {w - 1}, {w})), 32, 1)"
            " = '0')"
        ),
    ).otherwise(F.array().cast("array<int>"))
    ext = (
        base.withColumn("__bnds", bnds)
        .withColumn(
            "__starts",
            F.concat(
                F.array(F.lit(1)),
                F.transform(F.col("__bnds"), lambda b: b + 1),
            ),
        )
        .withColumn(
            "__ends",
            F.concat(F.col("__bnds"), F.array(F.length("__t"))),
        )
    )
    chunks = ext.select(
        id_col,
        "__t",
        F.posexplode(F.arrays_zip("__starts", "__ends")).alias(
            "chunk_idx", "__se"
        ),
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("__se.__starts").cast("long").alias("start"),
        (F.col("__se.__ends") - F.col("__se.__starts") + 1)
        .cast("long")
        .alias("len"),
        F.md5(
            F.expr("substring(__t, __se.__starts, "
                   "__se.__ends - __se.__starts + 1)")
        ).alias("chunk_md5"),
    )
    if not with_dup_counts:
        return chunks
    # groupBy + equi-join back, NOT count-over-window: the md5 KEY space
    # is uniform, but duplicate CONTENT is exactly what this column
    # counts — a boilerplate chunk repeated 10^8 times across a crawl
    # puts every copy behind ONE window-partition key in one reducer
    # task (windows can't be split by AQE). The aggregate combines
    # map-side, so the hot key costs one partial per task; the chunk
    # subtree feeds both the aggregate and the probe side, so persist it
    # when the source is big enough for recompute to cost a second pass
    # (the bm25 lesson — cache.track_if_large).
    from ppocr_spark import cache

    chunks = cache.track_if_large(df, chunks)
    counts = chunks.groupBy("chunk_md5").agg(
        F.count("*").alias("n_dups_corpus")
    )
    return chunks.join(counts, "chunk_md5").select(
        id_col, "chunk_idx", "start", "len", "chunk_md5", "n_dups_corpus"
    )


# auto bucket sizing target: keep every window partition at or below this
# many rows (a single reducer sorts one bucket — ~4M slim rows is a
# comfortable in-memory sort at executor scale)
TOKEN_SHARD_ROWS_PER_BUCKET = 1 << 22


def derive_bucket_hex(n_rows: int) -> int:
    """Smallest md5-prefix hex width keeping every ``token_shards``
    window bucket at ~``n_rows / 16^hex <= TOKEN_SHARD_ROWS_PER_BUCKET``
    rows; capped at 8 (16^8 ≈ 4.3e9 buckets — ample through 10^12+
    docs, where this returns 5: ~10^6 buckets of ~10^6 rows)."""
    import math

    if n_rows <= TOKEN_SHARD_ROWS_PER_BUCKET:
        return 1
    return max(
        1,
        min(8, math.ceil(
            math.log(n_rows / TOKEN_SHARD_ROWS_PER_BUCKET, 16)
        )),
    )


def token_shards(
    df: DataFrame,
    shard_tokens: int,
    bucket_hex: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contiguous corpus sharding by cumulative token count — the
    shard/packing step that turns a cleaned corpus into ~equal-token
    training shards. Documents are laid out in deterministic md5 order
    and cut into shards whose token sums reach ``shard_tokens``; a
    document is never split, so a shard overshoots by at most one
    document. shard_id = (bucket, floor(cumsum_before / shard_tokens)).

    Scale path: the order is md5-bucketed FIRST (``16**bucket_hex``
    macro-buckets) and both windows partition by bucket. There is no
    GLOBAL sort, but each bucket IS one window partition — one reducer
    task sorts ~N/16^bucket_hex rows, which is the operator's real
    bound. ``bucket_hex=None`` (default) derives the smallest hex width
    that keeps that bound ≤ ``TOKEN_SHARD_ROWS_PER_BUCKET`` (~4M rows)
    from one count() of the input — at 10^12 docs that is bucket_hex=5
    (~10^6 buckets of ~10^6 rows), where the round-3 default of 1 put
    N/16 rows behind single reducers (straggler/OOM at corpus scale).
    Pass an explicit ``bucket_hex`` for a reproducible layout across
    differently-sized inputs (the shard layout is a function of
    (corpus, bucket_hex)). Two bounded shuffles total (bucket cumsum +
    shard row-number). Returns (id, shard_id, shard_pos, n_toks).
    """
    if bucket_hex is None:
        bucket_hex = derive_bucket_hex(df.count())
    h = _id_hash(F.col(id_col), "shard")
    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_toks"),
        h.alias("h"),
        F.substring(h, 1, bucket_hex).alias("bkt"),
    )
    wb = (
        Window.partitionBy("bkt")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn(
        "shard_idx",
        F.floor(
            (F.sum("n_toks").over(wb) - F.col("n_toks"))
            / F.lit(shard_tokens)
        ),
    ).withColumn(
        "shard_id", F.concat_ws(":", F.col("bkt"), F.col("shard_idx"))
    )
    wp = Window.partitionBy("bkt", "shard_idx").orderBy("h", id_col)
    return cum.withColumn("shard_pos", F.row_number().over(wp)).select(
        id_col, "shard_id", "shard_pos", "n_toks"
    )


def source_cap(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    exact: bool = False,
    salt: str = "cap",
) -> DataFrame:
    """Per-source document cap (domain balancing): downsample every
    ``group_col`` group to ~``cap`` rows so no single domain dominates a
    training mix — the standard web-pipeline balancing step (C4 /
    RefinedWeb-style per-domain caps). Groups at or under ``cap`` pass
    through whole. Deterministic: selection is keyed on md5(id) like
    every sampler here — same rows survive on any cluster size, any
    partitioning, any run.

    Scale path (``exact=False``, default): one slim ``groupBy(group)``
    count (map-side combined), broadcast back, and a map-side filter
    ``h8 < hex((cap * 2^32) div n)`` — keeps an EXPECTED ``cap`` rows
    per group (binomial around cap, like any hash sampler) with ZERO
    sorts and no per-group window: a 10^9-doc hot domain costs the same
    as a small one. The threshold space is 32-BIT (8 hex chars), not
    the module's 16-bit HEX_W: a 16-bit threshold truncates to ZERO for
    any group with n > cap·65536 — silently deleting the hot domain the
    function exists to cap — and under-samples by up to 2× below that.
    32 bits keeps the keep-rate representable down to cap/n = 2⁻³²
    (a 4·10⁹-row domain capped to 1). Integer math both engines
    truncate identically (Spark ``div``, DuckDB ``//``), rendered as a
    fixed-width lowercase hex string (the shared hex-ordering trick).

    ``exact=True`` keeps EXACTLY ``cap`` rows (the first ``cap`` in
    FULL md5 order — a short prefix would tie for n > 16^prefix rows
    and fall back to raw-id order, a biased sample) via a per-group
    row_number window — one reducer sorts each group, so reserve it for
    group cardinalities a single task can sort (~10^7); the default
    path is the 100 TB shape.
    """
    if not 0 < cap < (1 << 31):
        raise ValueError(f"cap must be in (0, 2^31): {cap}")
    h = _id_hash(F.col(id_col), salt)
    if exact:
        w = Window.partitionBy(group_col).orderBy(
            h.asc(), F.col(id_col).asc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= cap)
            .drop("__rn")
        )
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    thr = F.lower(
        F.lpad(
            F.hex(F.expr(f"({int(cap)} * 4294967296) div __n")),
            CAP_HEX_W,
            "0",
        )
    )
    return (
        df.join(F.broadcast(counts), group_col)
        .filter(
            (F.col("__n") <= cap) | (F.substring(h, 1, CAP_HEX_W) < thr)
        )
        .drop("__n")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    bucket_hex: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing: concatenate the token stream in a
    deterministic order and cut every ``seq_len`` tokens, SPLITTING
    documents across sequence boundaries (zero padding — the complement
    of ``token_shards``, which never splits). Emits, per document, where
    its tokens land: (id, n_toks, seq_first, seq_last, offset_in_first,
    n_seqs) with sequence ids namespaced by layout bucket.

    Scale path is token_shards' device: md5-bucketed layout first, one
    window cumsum per bucket (no global sort; reducer bound =
    rows-per-bucket, auto-derived via ``derive_bucket_hex``). Pure
    integer window math — bit-identical in the DuckDB twin. Documents
    with zero tokens are dropped (they occupy no sequence positions)."""
    if bucket_hex is None:
        bucket_hex = derive_bucket_hex(df.count())
    h = _id_hash(F.col(id_col), "pack")
    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_toks"),
        h.alias("h"),
        F.substring(h, 1, bucket_hex).alias("bkt"),
    ).filter(F.col("n_toks") > 0)
    wb = (
        Window.partitionBy("bkt")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.select(
        id_col,
        "n_toks",
        "bkt",
        (F.sum("n_toks").over(wb) - F.col("n_toks")).alias("start"),
    )
    return cum.select(
        id_col,
        "n_toks",
        F.concat_ws(
            ":", F.col("bkt"), F.floor(F.col("start") / seq_len)
        ).alias("seq_first"),
        F.concat_ws(
            ":",
            F.col("bkt"),
            F.floor((F.col("start") + F.col("n_toks") - 1) / seq_len),
        ).alias("seq_last"),
        (F.col("start") % seq_len).alias("offset_in_first"),
        (
            F.floor((F.col("start") + F.col("n_toks") - 1) / seq_len)
            - F.floor(F.col("start") / seq_len)
            + 1
        ).cast("long").alias("n_seqs"),
    )


def _isqrt(x: Column) -> Column:
    """Exact integer sqrt of a non-negative BIGINT: one float floor(sqrt)
    plus a ±1 correction step (double error on int64 inputs is < 1 ulp,
    so one step each way is sufficient). Both engines run the identical
    expression — the float intermediate can differ by at most 1 and the
    corrections erase it, so the result is engine-identical integer math."""
    f = F.floor(F.sqrt(x.cast("double"))).cast("long")
    f = F.when((f + 1) * (f + 1) <= x, f + 1).otherwise(f)
    return F.when(f * f > x, f - 1).otherwise(f)


def mix_sources(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    exact: bool = False,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-scaled source mixing (the data-mixing step of a
    training run — The Pile / XLM-R style α-smoothed multinomial over
    domains, α = 1/2): allocate a total document ``budget`` across
    ``group_col`` groups proportionally to sqrt(group size), then keep
    each group's deterministic md5-ordered share. Square-root smoothing
    upweights small domains relative to raw proportions without letting
    any giant domain swamp the mix.

    Integer-exact everywhere: weights are exact integer sqrts
    (``_isqrt`` — float sqrt plus a correction both engines agree on),
    quotas are one integer DIV, so the selected set is engine- and
    partitioning-independent. quota_g = min(n_g, (budget * w_g) div W).

    Scale shape (``exact=False``, default): one slim map-side-combined
    ``groupBy(group)`` count; the total weight W is a 1-row aggregate
    attached by constant crossJoin (a map, not a join — the plan-audit
    whitelisted shape); quotas broadcast back and the keep decision is
    the ``source_cap`` hash-threshold filter (32-BIT threshold space —
    see source_cap's resolution note: a 16-bit threshold truncates to
    zero and DELETES any domain whose quota falls under n/65536,
    inverting the smoothing's whole point of keeping giant domains
    represented) — EXPECTED quota_g rows per group, zero sorts, a
    10^9-doc domain costs the same as a small one. ``exact=True`` keeps
    exactly quota_g rows via a per-group row_number window over the
    FULL hash (one reducer sorts each group — reserve for group
    cardinalities a single task can sort)."""
    if not 0 < budget < (1 << 31):
        raise ValueError(f"budget must be in (0, 2^31): {budget}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    w = counts.withColumn("__w", _isqrt(F.col("__n")))
    # the totals row derives from the same subtree as the per-group side;
    # alias both so the 1-row crossJoin attach resolves unambiguously
    tot = w.agg(F.sum("__w").alias("__tw")).alias("t")
    quotas = (
        w.alias("g")
        .crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "__n",
            F.least(
                F.col("__n"),
                F.expr(f"({int(budget)} * g.__w) div t.__tw"),
            ).alias("__q"),
        )
    )
    h = _id_hash(F.col(id_col), salt)
    if exact:
        w_rn = Window.partitionBy(group_col).orderBy(
            h.asc(), F.col(id_col).asc()
        )
        return (
            df.join(F.broadcast(quotas), group_col)
            .withColumn("__rn", F.row_number().over(w_rn))
            .filter(F.col("__rn") <= F.col("__q"))
            .drop("__rn", "__n", "__q")
        )
    thr = F.lower(
        F.lpad(F.hex(F.expr("(__q * 4294967296) div __n")), CAP_HEX_W, "0")
    )
    return (
        df.join(F.broadcast(quotas), group_col)
        .filter(
            (F.col("__n") <= F.col("__q"))
            | (F.substring(h, 1, CAP_HEX_W) < thr)
        )
        .drop("__n", "__q")
    )


def sample_exact_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "exactk",
) -> DataFrame:
    """Exactly-k global sample: the first ``k`` rows in deterministic
    md5(id) order — the fixed-size eval/holdout carve (same rows on any
    cluster size, partitioning, or run; no RNG state).

    Scale shape: orderBy+limit plans as TakeOrderedAndProject — each
    task keeps a k-row heap and the driver merges ONE k-row result per
    partition; there is no global sort and no single-reducer window.
    Bounded by k fitting on the driver (the same bound as any top-k)."""
    h = _id_hash(F.col(id_col), salt)
    return (
        df.withColumn("__h", h)
        .orderBy("__h", F.col(id_col))
        .limit(int(k))
        .drop("__h")
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "prio",
) -> DataFrame:
    """Priority sampling (Duffield, Lund & Thorup 2007): a fixed-size
    weight-proportional sample with Horvitz–Thompson subset-sum
    estimates — the principled way to carve a k-doc sample where big/
    high-quality docs matter more (weight = tokens, chars, or a quality
    score). Each item gets priority ``floor(w / u)`` with ``u`` a
    deterministic md5-uniform in (0, 1]; the top-k by priority are the
    sample, and ``w_est = max(w, τ)`` (τ = the (k+1)-th priority) makes
    ``sum(w_est)`` an unbiased estimator of any subset's total weight.

    Exactness: ``u = (h+1)/2^40`` over a 40-bit hash, so the priority
    is ONE integer expression ``(w << 40) DIV (h+1)`` — engine-
    identical, no float ``w/u`` whose rounding could flip the boundary
    rank (ties then break on id). Requires ``0 ≤ w < 2^23`` so the
    shift cannot overflow int64 — enforced INSIDE the priority
    expression (a ``raise_error`` branch; a separate check column would
    be pruned by Catalyst and silently skipped).

    Scale shape: zero shuffles — the hash/priority are per-row JVM
    expressions and both the k-row and (k+1)-row heads plan as
    TakeOrderedAndProject (per-task heaps, driver merges k+1 rows); τ
    is a whitelisted 1-row broadcast attach. A 10^12-doc weighted
    sample costs one scan."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + ":"), F.col(id_col).cast("string")
                    )
                ),
                1,
                10,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("__h")
    )
    prio = F.expr(
        f"CASE WHEN {weight_col} >= 0 AND {weight_col} < 8388608 "
        f"THEN shiftleft(CAST({weight_col} AS BIGINT), 40) DIV (__h + 1) "
        f"ELSE raise_error('priority_sample weight out of [0, 2^23): ' "
        f"|| CAST({weight_col} AS STRING)) END"
    )
    cand = (
        df.select(F.col(id_col), F.col(weight_col), h)
        .select(
            id_col,
            weight_col,
            prio.cast("long").alias("priority"),
        )
        .orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(int(k) + 1)
    )
    tau = cand.agg(
        F.when(F.count("*") == int(k) + 1, F.min("priority"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__tau")
    )
    return (
        cand.orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(int(k))
        .crossJoin(F.broadcast(tau))
        .select(
            id_col,
            weight_col,
            "priority",
            F.greatest(F.col(weight_col).cast("long"), F.col("__tau"))
            .cast("long")
            .alias("w_est"),
        )
    )


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    pre-bucketed dimensions (each must already be in ``[0, 2^bits)`` —
    callers bucket by range/quantile/modulo first). Pure integer
    shift/mask arithmetic, unrolled at plan-build time into one
    whole-stage-codegen expression; the disjoint bit positions sum, so
    ``+`` is bitwise-or and the key replays bit-for-bit in any engine
    (``layout_zorder`` value-checks it against DuckDB).

    Why first-class at 100 TB: min/max file pruning only skips files
    for predicates on the SORT key — sorting by ``x`` leaves ``y``
    scattered across every file. A Z-order key maps the (x, y) grid
    onto a locality-preserving curve, so ranging on the key yields
    files TIGHT IN BOTH dimensions and either predicate prunes (the
    Delta/Iceberg OPTIMIZE ZORDER strategy, here as a plain column +
    range repartition — engine-neutral, nothing to vendored-format)."""
    terms = []
    for k in range(int(bits)):
        terms.append(
            F.shiftleft(F.shiftright(x, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, k).bitwiseAND(F.lit(1)), 2 * k)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    partitions: int | None = None,
    key_col: str = "zkey",
) -> DataFrame:
    """Cluster rows for two-dimensional file pruning: attach the Morton
    key and range-repartition + sort on it, so each output file covers
    one compact segment of the Z-curve — a small rectangle in (x, y).
    Write the result with any sink; both dimensions' min/max file stats
    stay tight. ``repartitionByRange`` samples boundaries (one pass)
    and balances output sizes; the in-partition sort is the only other
    cost — no extra shuffle over a plain repartition-for-write."""
    d = df.withColumn(
        key_col, zorder_key(F.col(x_col), F.col(y_col), bits)
    )
    n = int(partitions) if partitions else int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return d.repartitionByRange(n, key_col).sortWithinPartitions(key_col)


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 20,
) -> DataFrame:
    """Hot-key diagnostic — the measurement you run BEFORE choosing a
    salt factor, bucket count, or broadcast threshold: the ``top``
    heaviest keys with exact counts, per-key load share, and cumulative
    share, all in integer ppm (``(1e6*n) DIV total`` — exact and
    engine-identical; float shares + round() tie-break differently
    across engines).

    Why it's first-class: every skew valve in this repo (wave
    cost-ordering, ``max_bucket``/``max_cell``, salted reassembly, the
    groupBy+broadcast-back forms) needs a NUMBER to be sized — at
    100 TB you run this slim report on a sample or the full table and
    read off "the hottest key is 3.1% of all rows, the top 20 are 40%",
    which decides salt width and whether AQE skew-join handles it.

    Scale shape: one map-side-combined ``groupBy(key)`` (the only
    full shuffle, over slim (key, count) partials); the top-k is
    ``orderBy(n DESC, key).limit(k)`` → TakeOrderedAndProject (per-task
    k-row heaps, no global sort); the grand total is a 1-row broadcast
    attach (whitelisted pattern); the cumulative-share window runs over
    the ALREADY-LIMITED k-row table — the single-partition sort it
    implies is k rows, never the keyspace. (count DESC, key ASC) is a
    total order, so ranks and the boundary are deterministic.

    Output: (rank, key — cast to string for schema stability, n,
    share_ppm, cum_share_ppm), counts int64."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count("*").cast("long").alias("n")
    )
    total = counts.agg(F.sum("n").cast("long").alias("__tot"))
    head = (
        counts.orderBy(F.col("n").desc(), "key")
        .limit(int(top))
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.col("n").desc(), "key").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        head.select(
            F.row_number().over(w).cast("long").alias("rank"),
            "key",
            "n",
            F.expr("(1000000 * n) DIV __tot").cast("long").alias(
                "share_ppm"
            ),
            F.expr(
                "(1000000 * sum(n) OVER (ORDER BY n DESC, key "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) "
                "DIV __tot"
            )
            .cast("long")
            .alias("cum_share_ppm"),
        )
        .orderBy("rank")
    )


def kfold_assign(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    salt: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: adds ``fold`` =
    md5-derived integer mod k — the exact-k rotation counterpart of the
    fraction-based ``hash_split`` (every doc lands in exactly one of k
    folds; fold i's eval set is disjoint from its train set by
    construction). Pure projection — no shuffle, no RNG; the same id
    gets the same fold on any cluster, any partitioning, any run, and
    the 60-bit hash space makes the mod-k buckets uniform to ~2⁻⁶⁰
    bias. Salted so fold assignment decorrelates from every other
    hash-keyed decision (splits, buckets, caps) on the same ids."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"),
                           F.col(id_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    return df.withColumn("fold", (h % F.lit(int(k))).cast("long"))
