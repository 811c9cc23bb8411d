"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (interleaved
documents → OCR → reassembled spans) on a deterministic cached corpus.
``queries()``/``oracle_sql()`` pair every implemented operator family from
SURVEY.md §2 (+ the training-data ops) with an independent DuckDB oracle.

Oracle-parity rules used throughout: only portable primitives (md5,
regex \\s+, list/array ops, double math with identical evaluation order),
aggregates rounded before export, every computed column aliased identically
on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ppocr_spark.config import PPOCRConfig  # noqa: E402
from ppocr_spark.functions.graph import (  # noqa: E402
    PAGERANK_SCALE as _PAGERANK_SCALE,
)
from ppocr_spark.functions.sketch import K_MILLI as sketch_K_MILLI  # noqa: E402


# ---------------------------------------------------------------------------
# corpus cache (shared by Spark queries and DuckDB oracles)
# ---------------------------------------------------------------------------


def _corpus_docs_for(sf_dir: str) -> int:
    name = os.path.basename(sf_dir.rstrip("/"))
    if "0.1" in name and "0.01" not in name:
        return 800  # bench scale: large enough that fixed costs are <1/3
    if "0.01" in name:
        return 80
    return 40


def _corpus(sf_dir: str) -> str:
    from ppocr_spark.corpus import ensure_corpus

    return ensure_corpus(_corpus_docs_for(sf_dir))


def _table_corpus(sf_dir: str) -> str:
    from ppocr_spark.corpus import ensure_table_corpus

    return ensure_table_corpus(max(8, _corpus_docs_for(sf_dir) // 3))


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# shared SQL fragments (Spark-dialect / DuckDB-dialect pairs)
# ---------------------------------------------------------------------------

_SPARK_TOKS = "filter(split(trim(text), '\\\\s+'), w -> w <> '')"
_DUCK_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '')"

_DUCK_GRAMS = (
    "CASE WHEN len(toks) < 3 THEN [] "
    "ELSE list_distinct(list_transform(range(0, len(toks)-2), "
    "i -> array_to_string(toks[i+1:i+3], ' '))) END"
)

_STOP = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "los", "que", "de"),
}


def _hits(engine: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _STOP[lang])
    if engine == "spark":
        return (
            f"size(filter(split(lower(text), '\\\\s+'), t -> t IN ({words})))"
        )
    return (
        f"len(list_filter(string_split_regex(lower(text), '\\s+'), "
        f"t -> t IN ({words})))"
    )


def _langid_case(engine: str) -> str:
    h = {lang: _hits(engine, lang) for lang in _STOP}
    return (
        f"CASE WHEN {h['en']} >= {h['de']} AND {h['en']} >= {h['fr']} "
        f"AND {h['en']} >= {h['es']} AND {h['en']} > 0 THEN 'en' "
        f"WHEN {h['de']} >= {h['fr']} AND {h['de']} >= {h['es']} "
        f"AND {h['de']} > 0 THEN 'de' "
        f"WHEN {h['fr']} >= {h['es']} AND {h['fr']} > 0 THEN 'fr' "
        f"WHEN {h['es']} > 0 THEN 'es' ELSE 'und' END"
    )


def _simhash_expr(engine: str) -> str:
    """60-bit SimHash over lowercase tokens, generated for each dialect."""
    if engine == "spark":
        toks = "filter(split(lower(text), '\\\\s+'), w -> w <> '')"
        h = "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"
        hashes = f"transform({toks}, t -> {h})"
        bit = (
            "aggregate(hs, 0, (acc, h) -> acc + "
            "CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        )
        terms = " + ".join(
            f"(CASE WHEN ({bit.format(b=b)}) > 0 THEN cast({1 << b} as bigint) "
            f"ELSE 0 END)"
            for b in range(60)
        )
        return hashes, terms
    toks = "list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')"
    h = "(('0x' || substr(md5(t), 1, 15))::BIGINT)"
    hashes = f"list_transform({toks}, t -> {h})"
    bit = (
        "list_reduce(list_prepend(0, list_transform(hs, h -> "
        "CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END)), (a, b) -> a + b)"
    )
    terms = " + ".join(
        f"(CASE WHEN ({bit.format(b=b)}) > 0 THEN ({1 << b})::BIGINT "
        f"ELSE 0 END)"
        for b in range(60)
    )
    return hashes, terms


def _minhash_sig(engine: str) -> str:
    if engine == "spark":
        return (
            "array("
            + ", ".join(
                f"array_min(transform(grams, g -> md5(concat('{i}:', g))))"
                for i in range(8)
            )
            + ")"
        )
    return (
        "["
        + ", ".join(
            f"list_aggregate(list_transform(grams, g -> md5('{i}:' || g)), 'min')"
            for i in range(8)
        )
        + "]"
    )


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= '1998-09-01'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_Q3_SQL = """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _load(spark, sf_dir, "region")
    n = _load(spark, sf_dir, "nation")
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    s = _load(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name")
    )


_Q5_SQL = """
SELECT r_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def _top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = _load(spark, sf_dir, "customer")
    n = _load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"),
                "rnk")
        .orderBy("n_name", "rnk")
    )


_TOP_CUSTOMERS_SQL = """
SELECT n_name, c_custkey, round(c_acctbal, 2) AS acctbal, rnk FROM (
  SELECT n_name, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) WHERE rnk <= 3 ORDER BY n_name, rnk
"""


def _events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


_EVENTS_DAILY_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n,
       round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""


def _events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count anomaly flags per event type: a day is a spike when
    its count exceeds 2x the type's daily mean, evaluated in exact
    integer arithmetic (n * n_days > 2 * total — engine-identical; a
    float mean + comparison can flip on representation ties). Shape:
    one groupBy(day, type), then the slim per-type totals broadcast
    back. A count-over-window on event_type would make each type one
    unsplittable window key (the documented skew trap) — groupBy +
    broadcast join back is the scale-safe form."""
    e = _load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    tot = daily.groupBy("event_type").agg(
        F.sum("n").alias("total"), F.count("*").alias("n_days")
    )
    return (
        daily.join(F.broadcast(tot), "event_type")
        .select(
            "day",
            "event_type",
            "n",
            "n_days",
            "total",
            (F.col("n") * F.col("n_days") > F.lit(2) * F.col("total"))
            .alias("spike"),
        )
        .orderBy("day", "event_type")
    )


_EVENTS_ANOMALY_SQL = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, sum(n)::BIGINT AS total, count(*)::BIGINT AS n_days
  FROM daily GROUP BY event_type
)
SELECT day, d.event_type, n, n_days, total,
       n * n_days > 2 * total AS spike
FROM daily d JOIN tot t ON d.event_type = t.event_type
ORDER BY day, d.event_type
"""


def _events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction over the JSON props column
    (`F.get_json_object` — JVM-side, stays in whole-stage codegen; no
    Python touches the hot path), then a per-key rollup. The value sum
    is carried in exact integer micro-units (`floor(value * 1e6)` — the
    double scaling and floor are IEEE-identical in both engines, and
    int64 sums are order-independent; `round(sum(double))` is the
    documented cross-engine hazard). Invalid/blank JSON degrades to a
    NULL key group on both sides (Spark's get_json_object returns NULL;
    the oracle guards with json_valid)."""
    e = _load(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            "user_id",
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long"))
            .cast("long")
            .alias("value_micros"),
        )
        .orderBy("k")
    )


_EVENTS_JSON_SQL = """
SELECT CASE WHEN json_valid(props)
            THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
       END AS k,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       sum(CAST(floor(value * 1000000) AS BIGINT))::BIGINT AS value_micros
FROM events GROUP BY 1 ORDER BY k
"""


def _events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour event-time windows (F.window — the batch twin of
    the Structured-Streaming windowed aggregation)."""
    e = _load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # decimal sum → exact and order-independent across partials
            # (double sums + avg ties flip round(.,4) between engines)
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias(
                "win_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


_EVENTS_WINDOWED_SQL = """
SELECT strftime(time_bucket(INTERVAL 6 HOURS, ts), '%Y-%m-%d %H:%M')
           AS win_start,
       event_type, count(*) AS n,
       round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY win_start, event_type
"""


def _events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per event type (median + p90)."""
    e = _load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.min("value"), 6).alias("vmin"),
            F.round(F.max("value"), 6).alias("vmax"),
        )
        .orderBy("event_type")
    )


_EVENTS_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events GROUP BY event_type ORDER BY event_type
"""


def _events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier report: median + MAD (median absolute
    deviation — the robust spread that one wild value can't poison,
    unlike stddev) and the count/share of values beyond 3·MAD — the
    monitoring rule for metric streams. Two grouped exact-percentile
    aggregates (the ``quality_tiers``-proven Spark percentile ≡ DuckDB
    quantile_cont parity) + slim joins back on the type key; the
    outlier comparison runs on UNROUNDED doubles that are
    engine-identical because both sides computed them with the same
    IEEE ops; med/mad round to 6 for display only."""
    from ppocr_spark import cache

    e = _load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("__med")
    )
    # dev feeds the MAD aggregate AND the final aggregate — persist or
    # the events scan re-evaluates per consumer (track_if_large)
    dev = cache.track_if_large(e, e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "__med",
        F.abs(F.col("value") - F.col("__med")).alias("__ad"),
    ))
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(__ad, 0.5)").alias("__mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.max("__med"), 6).alias("med"),
            F.round(F.max("__mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("__ad") > 3 * F.col("__mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .select(
            "event_type", "n", "med", "mad", "n_outliers",
            F.expr("(1000000 * n_outliers) DIV n").cast("long")
            .alias("outlier_ppm"),
        )
        .orderBy("event_type")
    )


_EVENTS_VALUE_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, med.m, abs(e.value - med.m) AS ad
  FROM events e JOIN med USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS md
  FROM dev GROUP BY event_type
)
SELECT d.event_type, count(*)::BIGINT AS n,
       round(max(d.m), 6) AS med,
       round(max(mad.md), 6) AS mad,
       sum(CASE WHEN d.ad > 3 * mad.md THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers,
       ((1000000 * sum(CASE WHEN d.ad > 3 * mad.md THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS outlier_ppm
FROM dev d JOIN mad USING (event_type)
GROUP BY d.event_type ORDER BY event_type
"""


_SESSION_GAP_US = 7_200_000_000  # 2 h inactivity closes a session


def _ntz_us(col: str):
    """Integer microseconds since epoch for a TIMESTAMP_NTZ column —
    timestampdiff is timezone-independent (unix_micros demands LTZ and
    would shift with the session zone), and it equals DuckDB's
    epoch_us() on naive timestamps exactly."""
    return F.expr(
        "timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def _events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the batch twin of a session-window
    stream): a new session starts when a user's inter-event gap exceeds
    2 h. One shuffle on user_id; the lag/cumulative-sum window and the
    per-session aggregate both run inside that partitioning (the groupBy
    keys start with user_id, so its partials are map-side combined and
    the second exchange carries one slim row per session, not per
    event). Timestamps are compared in integer microseconds — exact and
    engine-identical. Deterministic: event timestamps are unique per
    user at every SF (verified), so the window order is total."""
    from pyspark.sql import Window

    e = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    us = _ntz_us("ts")
    gap = us - F.lag(us).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > F.lit(_SESSION_GAP_US)), 1
    ).otherwise(0)
    return (
        e.withColumn(
            "session_idx",
            F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            (F.max(_ntz_us("ts")) - F.min(_ntz_us("ts"))).alias(
                "duration_us"
            ),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("total_value"),
        )
        .orderBy("user_id", "session_idx")
    )


_EVENTS_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts)
                   - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts)
                   <= 7200000000
              THEN 0 ELSE 1 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING)::BIGINT
             AS session_idx
  FROM g
)
SELECT user_id, session_idx, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us,
       round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS total_value
FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx
"""


def _events_attribution_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (last-touch attribution): each purchase matched to the
    most recent view/click by the same user at-or-before its timestamp.

    Spark has no ASOF JOIN, and the naive range join is a per-key
    quadratic BNLJ — so this uses the scale-correct union form: tag both
    sides, union, and carry the touch columns forward with
    last(..., ignorenulls=True) over (user_id ORDER BY ts, tag). One
    shuffle on user_id, linear in rows, no candidate explosion; at equal
    timestamps the touch sorts first (tag 0 < 1), matching the oracle's
    inclusive `>=`. For mega-keys this composes with time-bucketed
    sub-keys carrying one boundary row per bucket. Oracle: DuckDB native
    ASOF LEFT JOIN. Unmatched purchases keep NULL touch columns in both
    engines."""
    from pyspark.sql import Window

    e = _load(spark, sf_dir, "events")
    touches = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        "ts",
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("event_id").alias("click_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        touches.unionByName(purchases)
        .withColumn(
            "last_click_id", F.last("click_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_click_us",
            F.last(
                F.when(F.col("click_id").isNotNull(), _ntz_us("ts")),
                ignorenulls=True,
            ).over(w),
        )
    )
    return (
        carried.filter(F.col("is_purchase") == 1)
        .select(
            F.col("purchase_id").alias("event_id"),
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias(
                "purchase_ts"
            ),
            F.col("last_click_id").alias("click_id"),
            (_ntz_us("ts") - F.col("last_click_us")).alias("gap_us"),
        )
        .orderBy("event_id")
    )


_EVENTS_ATTRIBUTION_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_id, user_id, ts AS cts
  FROM events WHERE event_type IN ('view', 'click')
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       c.click_id,
       epoch_us(p.ts) - epoch_us(c.cts) AS gap_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.cts
ORDER BY event_id
"""


_INTERVAL_US = 3_600_000_000  # 1 h attribution window


def _events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: per purchase, the count and value sum of
    view/click touches in the preceding hour. A raw time-range join is a
    per-key BNLJ, so the scale form buckets time by the interval width:
    each touch is exploded into its own bucket and the next (2× one slim
    side), the join is a plain equi-join on (user_id, bucket), and the
    exact range predicate filters after. Every in-range pair lands in
    exactly one bucket pairing, so no dedup is needed. Bucket ids use
    integer DIV — floor-exact, no double rounding at boundaries."""
    e = _load(spark, sf_dir, "events")
    us = _ntz_us("ts")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", us.alias("p_us")
    ).withColumn("bk", F.expr(f"p_us DIV {_INTERVAL_US}"))
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", us.alias("t_us"), "value"
    ).withColumn("tbk", F.expr(f"t_us DIV {_INTERVAL_US}"))
    t2 = t.withColumn(
        "bk", F.explode(F.array(F.col("tbk"), F.col("tbk") + 1))
    ).drop("tbk")
    in_range = (F.col("p_us") - F.col("t_us") >= 0) & (
        F.col("p_us") - F.col("t_us") < F.lit(_INTERVAL_US)
    )
    return (
        p.join(t2, ["user_id", "bk"], "left")
        .groupBy("event_id", "user_id", "ts")
        .agg(
            F.sum(F.when(in_range, 1).otherwise(0)).alias("n_touches"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            in_range,
                            F.col("value").cast("decimal(18,6)"),
                        )
                    ).cast("double"),
                    F.lit(0.0),
                ),
                4,
            ).alias("touched_value"),
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias(
                "purchase_ts"
            ),
            "n_touches",
            "touched_value",
        )
        .orderBy("event_id")
    )


_EVENTS_INTERVAL_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, epoch_us(ts) AS t_us, value
  FROM events WHERE event_type IN ('view', 'click')
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       count(t.t_us) AS n_touches,
       round(COALESCE(sum(CAST(t.value AS DECIMAL(18,6))), 0)::DOUBLE, 4)
           AS touched_value
FROM p LEFT JOIN t
  ON p.user_id = t.user_id
 AND epoch_us(p.ts) - t.t_us >= 0
 AND epoch_us(p.ts) - t.t_us < 3600000000
GROUP BY p.event_id, p.user_id, p.ts
ORDER BY event_id
"""


def _events_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1h rolling stats (count / min / max / sum) —
    the sliding-window member of the time-series family (sessionize =
    gap windows, interval_join = fixed lookback JOIN, this = a RANGE
    frame per event). One shuffle on user_id, then a single in-partition
    sort serves the whole frame: Spark evaluates the RANGE frame with a
    sliding pointer pair over the sorted run, O(n) per user, no
    candidate explosion — at 100 TB this is strictly cheaper than the
    equivalent self-join (which interval_join exists for when the two
    sides differ). Skewed users are the hazard; ``key_skew_report``
    is the sizing tool. Exactness: frame bounds compare integer
    microseconds (engine-identical); min/max are order-independent on
    doubles; the sum runs in decimal so addition order cannot change
    the rounded result."""
    from pyspark.sql import Window

    e = _load(spark, sf_dir, "events")
    us = _ntz_us("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__us"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.withColumn("__us", us)
        .select(
            "event_id",
            "user_id",
            F.count("*").over(w).cast("long").alias("n_1h"),
            F.round(F.min("value").over(w), 6).alias("vmin_1h"),
            F.round(F.max("value").over(w), 6).alias("vmax_1h"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)"))
                .over(w)
                .cast("double"),
                4,
            ).alias("vsum_1h"),
        )
        .orderBy("event_id")
    )


_EVENTS_ROLLING_SQL = """
SELECT event_id, user_id,
       count(*) OVER w::BIGINT AS n_1h,
       round(min(value) OVER w, 6) AS vmin_1h,
       round(max(value) OVER w, 6) AS vmax_1h,
       round((sum(CAST(value AS DECIMAL(18,6))) OVER w)::DOUBLE, 4)
           AS vsum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


_FUNNEL_STEPS = ("view", "click", "purchase")


def _events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): per user,
    the greedy earliest chain — first view, earliest click STRICTLY
    after it, earliest purchase strictly after that. Greedy-earliest is
    optimal (an earlier view only widens the feasible clicks), so it
    matches the oracle's min()-chain exactly.

    Scale shape: the SQL min-chain needs three sequential aggregations
    (each step's threshold feeds the next), i.e. three shuffles on
    user_id. Instead this folds each user's funnel-relevant events in
    ONE shuffle: filter to the three step types first (bounds the
    per-user array to funnel events only), collect_list(struct(us,tp)),
    array_sort, then a JVM-side F.aggregate whose accumulator holds the
    three step timestamps. All comparisons are strict integer
    microseconds — engine-identical. Hot-user caveat: a user whose
    funnel-event count alone overflows one task needs time-segmented
    pre-folding (carry the open accumulator per segment); at that point
    the three-shuffle min-chain form is the fallback."""
    e = _load(spark, sf_dir, "events")
    f = e.filter(F.col("event_type").isin(*_FUNNEL_STEPS)).select(
        "user_id",
        _ntz_us("ts").alias("us"),
        F.col("event_type").alias("tp"),
    )
    init = F.struct(
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("long").alias("c"),
        F.lit(None).cast("long").alias("p"),
    )

    def _step(acc, x):
        return F.struct(
            F.when(
                acc["v"].isNull() & (x["tp"] == "view"), x["us"]
            ).otherwise(acc["v"]).alias("v"),
            F.when(
                acc["c"].isNull()
                & acc["v"].isNotNull()
                & (x["tp"] == "click")
                & (x["us"] > acc["v"]),
                x["us"],
            ).otherwise(acc["c"]).alias("c"),
            F.when(
                acc["p"].isNull()
                & acc["c"].isNotNull()
                & (x["tp"] == "purchase")
                & (x["us"] > acc["c"]),
                x["us"],
            ).otherwise(acc["p"]).alias("p"),
        )

    folded = (
        f.groupBy("user_id")
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("us"), F.col("tp")))
                ),
                init,
                _step,
            ).alias("acc")
        )
        .select("user_id", "acc.v", "acc.c", "acc.p")
    )
    stage = (
        F.when(F.col("p").isNotNull(), 3)
        .when(F.col("c").isNotNull(), 2)
        .when(F.col("v").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
    )
    return folded.select(
        "user_id",
        stage.alias("stage"),
        (F.col("c") - F.col("v")).alias("view_to_click_us"),
        (F.col("p") - F.col("c")).alias("click_to_purchase_us"),
        (F.col("p") - F.col("v")).alias("funnel_us"),
    ).orderBy("user_id")


_PATHS_TOPK = 20


def _events_topk_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-event paths (behavioral sequence mining): per user,
    consecutive event-type trigrams via two lead() windows, counted
    corpus-wide, top-k under the total order (count DESC, path ASC).
    One shuffle on user_id for the window (event timestamps are unique
    per user — verified for the sessionize family), map-side-combined
    counts, TakeOrderedAndProject for the head."""
    from pyspark.sql import Window

    e = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    t2 = F.lead("event_type", 1).over(w)
    t3 = F.lead("event_type", 2).over(w)
    return (
        e.select(
            F.concat_ws(
                ">", F.col("event_type"), t2, t3
            ).alias("path"),
            t3.alias("_t3"),
        )
        .filter(F.col("_t3").isNotNull())  # complete trigrams only
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATHS_TOPK)
    )


_EVENTS_PATHS_SQL = f"""
WITH t AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n
FROM t WHERE t3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT {_PATHS_TOPK}
"""


def _events_markov_transitions(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences — the normalized companion of ``events_topk_paths``
    (paths mine raw trigram counts; this is the behavioral MODEL:
    P(next | current) per type pair). One lead() window per user
    (unique timestamps per user — the sessionize family's verified
    precondition), |types|² groupBy, row probabilities as integer ppm
    with the per-from-type total joined back (groupBy + broadcast, no
    count-over-window on a type key — the skew trap: one hot type
    would be a single window partition)."""
    from pyspark.sql import Window

    e = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    cells = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type", 1).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = cells.groupBy("from_type").agg(F.sum("n").alias("__t"))
    return (
        cells.join(F.broadcast(totals), "from_type")
        .select(
            "from_type", "to_type", "n",
            F.expr("(1000000 * n) DIV __t").cast("long").alias("p_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


_EVENTS_MARKOV_SQL = """
WITH t AS (
  SELECT event_type AS from_type,
         lead(event_type, 1) OVER w AS to_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), cells AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n
  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
), totals AS (
  SELECT from_type, sum(n)::BIGINT AS tt FROM cells GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n,
       ((1000000 * c.n) // t.tt)::BIGINT AS p_ppm
FROM cells c JOIN totals t USING (from_type)
ORDER BY from_type, to_type
"""


_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


def _events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × day-of-week activity profile — the seasonality
    heatmap behind capacity planning and anomaly baselines (a spike is
    only a spike relative to its cell). Both coordinates are pure
    integer arithmetic on the epoch microseconds (hour = µs DIV 3600e6
    mod 24; dow = (µs DIV day + 3) mod 7, 0 = Monday — 1970-01-01 was
    a Thursday), so no calendar/locale surface can diverge between
    engines; shares are integer ppm of total events. 168 cells —
    one map-side-combined groupBy, a 1-row total joined back via
    broadcast."""
    e = _load(spark, sf_dir, "events")
    us = (
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " ts)"
    )
    cells = (
        e.select(
            F.expr(f"(({us}) DIV {_HOUR_US}) % 24").cast("long")
            .alias("hour"),
            F.expr(f"((({us}) DIV {_DAY_US}) + 3) % 7").cast("long")
            .alias("dow"),
        )
        .groupBy("dow", "hour")
        .agg(F.count("*").cast("long").alias("n"))
    )
    total = cells.agg(F.sum("n").alias("__t"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "dow", "hour", "n",
            F.expr("(1000000 * n) DIV __t").cast("long")
            .alias("share_ppm"),
        )
        .orderBy("dow", "hour")
    )


_EVENTS_SEASONALITY_SQL = f"""
WITH cells AS (
  SELECT ((epoch_us(ts) // {_HOUR_US}) % 24)::BIGINT AS hour,
         (((epoch_us(ts) // {_DAY_US}) + 3) % 7)::BIGINT AS dow,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), tot AS (SELECT sum(n)::BIGINT AS t FROM cells)
SELECT dow, hour, n, ((1000000 * n) // t)::BIGINT AS share_ppm
FROM cells, tot ORDER BY dow, hour
"""


def _events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, one
    row per (cohort_day, offset_days) with the distinct-user count.

    Scale shape: ONE shuffle on user_id — per user, min(day) and
    collect_set(day) in a single aggregate (the set is bounded by the
    calendar, not the event count, and its partials combine map-side),
    then explode the day set and count plain rows per (cohort, offset):
    each user contributes at most one row per cell by construction, so
    count(*) IS the distinct-user count and no countDistinct expand is
    needed. Day ids are integer-µs DIV — floor-exact, engine-identical."""
    e = _load(spark, sf_dir, "events")
    # integer day id (floor division in the JVM, no doubles)
    day = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" ts) DIV {_DAY_US}"
    )
    per_user = (
        e.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(
            F.min("day").alias("cohort_day"),
            F.collect_set("day").alias("days"),
        )
    )
    return (
        per_user.select(
            "cohort_day", F.explode("days").alias("day")
        )
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("offset_days"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "offset_days")
    )


_EVENTS_RETENTION_SQL = f"""
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
), c AS (
  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1
)
SELECT c.cohort_day, d.day - c.cohort_day AS offset_days,
       count(*) AS n_users
FROM d JOIN c ON d.user_id = c.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement OLAP staple. WAU is
    EXACT, with bounded fan-out instead of a trailing distinct window:
    each (user, active-day) row supports the 7 days [day, day+6], so
    exploding it 7× and de-duplicating gives per-day weekly actives as
    a plain count (the ``events_retention`` calendar-bounded trick —
    no countDistinct over a RANGE frame, whose state is unbounded on
    hot days). Day ids are integer-µs DIV (floor-exact,
    engine-identical); stickiness is integer ppm. Output restricted
    to days that HAVE events (the dau side)."""
    e = _load(spark, sf_dir, "events")
    day = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" ts) DIV {_DAY_US}"
    )
    ud = e.select("user_id", day.alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    wau = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + F.lit(6))
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("long").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.expr("(1000000 * dau) DIV wau").cast("long")
            .alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


_EVENTS_DAU_WAU_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
), dau AS (
  SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY day
), w AS (
  SELECT DISTINCT user_id, day + o AS day
  FROM ud, unnest([0, 1, 2, 3, 4, 5, 6]) AS t(o)
), wau AS (
  SELECT day, count(*)::BIGINT AS wau FROM w GROUP BY day
)
SELECT d.day::BIGINT AS day, d.dau, wa.wau,
       ((1000000 * d.dau) // wa.wau)::BIGINT AS stickiness_ppm
FROM dau d JOIN wau wa USING (day) ORDER BY day
"""


def _events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B lift table: users bucket into control/treat by
    md5 (the ``hash_split`` rule — how real experiment systems assign:
    layout/run independent, no RNG), then per event type the
    events-per-user rate in each arm (exact integer micro-units) and
    the relative lift in signed ppm (toward-zero truncating DIV —
    engine-identical, verified). On synthetic traffic the lift should
    hover near zero — the A/A-test reading of this table is itself the
    assignment-health check. Denominators are ARM sizes (users with
    any event), so types a user never triggers still dilute the rate."""
    e = _load(spark, sf_dir, "events")
    arm = F.when(
        F.substring(F.md5(F.concat(F.lit("ab:"),
                                   F.col("user_id").cast("string"))),
                    1, 4) < F.lit("8000"),
        F.lit("control"),
    ).otherwise(F.lit("treat"))
    ev = e.select(arm.alias("arm"), "user_id", "event_type")
    arm_sizes = (
        ev.select("arm", "user_id").distinct()
        .groupBy("arm").agg(F.count("*").alias("n_users"))
    )
    cells = ev.groupBy("arm", "event_type").agg(
        F.count("*").alias("n_events")
    )
    rates = (
        cells.join(F.broadcast(arm_sizes), "arm")
        .select(
            "arm", "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            F.expr("(1000000 * n_events) DIV n_users").cast("long")
            .alias("epu_micro"),
        )
    )
    c = rates.filter(F.col("arm") == "control").select(
        "event_type",
        F.col("n_events").alias("control_events"),
        F.col("epu_micro").alias("control_epu_micro"),
    )
    t = rates.filter(F.col("arm") == "treat").select(
        "event_type",
        F.col("n_events").alias("treat_events"),
        F.col("epu_micro").alias("treat_epu_micro"),
    )
    return (
        c.join(t, "event_type", "full")
        .select(
            "event_type",
            F.coalesce("control_events", F.lit(0)).cast("long")
            .alias("control_events"),
            F.coalesce("treat_events", F.lit(0)).cast("long")
            .alias("treat_events"),
            F.coalesce("control_epu_micro", F.lit(0)).cast("long")
            .alias("control_epu_micro"),
            F.coalesce("treat_epu_micro", F.lit(0)).cast("long")
            .alias("treat_epu_micro"),
            F.expr(
                "CASE WHEN coalesce(control_epu_micro, 0) = 0 THEN NULL"
                " ELSE (1000000 * (coalesce(treat_epu_micro, 0)"
                " - control_epu_micro)) DIV control_epu_micro END"
            ).cast("long").alias("lift_ppm"),
        )
        .orderBy("event_type")
    )


_EVENTS_AB_LIFT_SQL = """
WITH ev AS (
  SELECT CASE WHEN substr(md5(concat('ab:', user_id::VARCHAR)), 1, 4)
              < '8000' THEN 'control' ELSE 'treat' END AS arm,
         user_id, event_type
  FROM events
), arm_sizes AS (
  SELECT arm, count(*)::BIGINT AS n_users
  FROM (SELECT DISTINCT arm, user_id FROM ev) GROUP BY arm
), cells AS (
  SELECT arm, event_type, count(*)::BIGINT AS n_events
  FROM ev GROUP BY 1, 2
), rates AS (
  SELECT c.arm, c.event_type, c.n_events,
         ((1000000 * c.n_events) // a.n_users)::BIGINT AS epu_micro
  FROM cells c JOIN arm_sizes a USING (arm)
), c AS (
  SELECT event_type, n_events AS control_events,
         epu_micro AS control_epu_micro
  FROM rates WHERE arm = 'control'
), t AS (
  SELECT event_type, n_events AS treat_events,
         epu_micro AS treat_epu_micro
  FROM rates WHERE arm = 'treat'
)
SELECT coalesce(c.event_type, t.event_type) AS event_type,
       coalesce(control_events, 0)::BIGINT AS control_events,
       coalesce(treat_events, 0)::BIGINT AS treat_events,
       coalesce(control_epu_micro, 0)::BIGINT AS control_epu_micro,
       coalesce(treat_epu_micro, 0)::BIGINT AS treat_epu_micro,
       (CASE WHEN coalesce(control_epu_micro, 0) = 0 THEN NULL
             ELSE (1000000 * (coalesce(treat_epu_micro, 0)
                              - control_epu_micro))
                  // control_epu_micro END)::BIGINT AS lift_ppm
FROM c FULL OUTER JOIN t ON c.event_type = t.event_type
ORDER BY event_type
"""


_EVENTS_FUNNEL_SQL = """
WITH f AS (
  SELECT user_id, event_type AS tp, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
), v AS (
  SELECT user_id, min(us) AS v_us FROM f WHERE tp = 'view' GROUP BY 1
), c AS (
  SELECT f.user_id, min(f.us) AS c_us
  FROM f JOIN v ON f.user_id = v.user_id
  WHERE f.tp = 'click' AND f.us > v.v_us GROUP BY 1
), p AS (
  SELECT f.user_id, min(f.us) AS p_us
  FROM f JOIN c ON f.user_id = c.user_id
  WHERE f.tp = 'purchase' AND f.us > c.c_us GROUP BY 1
), base AS (
  SELECT DISTINCT user_id FROM f
)
SELECT base.user_id,
       (CASE WHEN p.p_us IS NOT NULL THEN 3
             WHEN c.c_us IS NOT NULL THEN 2
             WHEN v.v_us IS NOT NULL THEN 1
             ELSE 0 END)::BIGINT AS stage,
       c.c_us - v.v_us AS view_to_click_us,
       p.p_us - c.c_us AS click_to_purchase_us,
       p.p_us - v.v_us AS funnel_us
FROM base
LEFT JOIN v ON base.user_id = v.user_id
LEFT JOIN c ON base.user_id = c.user_id
LEFT JOIN p ON base.user_id = p.user_id
ORDER BY base.user_id
"""


def _distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _load(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .orderBy("event_type")
    )


_DISTINCT_EVENT_TYPES_SQL = (
    "SELECT DISTINCT event_type FROM events ORDER BY event_type"
)


def _orders_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_initial"),
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.length("o_orderstatus").alias("status_len"),
    ).orderBy("o_orderkey")


_ORDERS_CASE_SQL = """
SELECT o_orderkey, upper(substr(o_orderpriority, 1, 1)) AS prio_initial,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS price_band,
       length(o_orderstatus) AS status_len
FROM orders ORDER BY o_orderkey
"""


def _span_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode→filter→reassemble glue — the relational skeleton of the
    extraction pipeline, oracle-checked end to end."""
    d = _load(spark, sf_dir, "documents")
    spans = d.select(
        "doc_id",
        F.posexplode(F.expr(_SPARK_TOKS)).alias("pos", "w"),
    ).filter(F.length("w") > 3)
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("w")))
                    ),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("reassembled"),
        )
        .orderBy("doc_id")
    )


_SPAN_EXPLODE_SQL = f"""
SELECT doc_id,
       len(list_filter({_DUCK_TOKS}, w -> len(w) > 3)) AS n_spans,
       array_to_string(list_filter({_DUCK_TOKS}, w -> len(w) > 3), ' ')
           AS reassembled
FROM documents
WHERE len(list_filter({_DUCK_TOKS}, w -> len(w) > 3)) > 0
ORDER BY doc_id
"""


def _status_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K2 status-code discipline as a relational op: every row mapped
    to exactly one code, counted per code."""
    d = _load(spark, sf_dir, "documents")
    code = (
        F.when(F.trim("text") == "", 101)
        .when(F.col("n_chars") > 350, 200)
        .otherwise(100)
    )
    return (
        d.select(code.alias("code"))
        .groupBy("code")
        .count()
        .orderBy("code")
    )


_STATUS_TAXONOMY_SQL = """
SELECT code, count(*) AS count FROM (
  SELECT CASE WHEN trim(text) = '' THEN 101
              WHEN n_chars > 350 THEN 200 ELSE 100 END AS code
  FROM documents
) GROUP BY code ORDER BY code
"""


def _request_corpus(sf_dir: str) -> str:
    from ppocr_spark.corpus import ensure_request_corpus

    return ensure_request_corpus(max(60, _corpus_docs_for(sf_dir)))


def _base64_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S7 failure taxonomy end-to-end: JSON requests (valid path /
    missing path / valid b64 / invalid b64 / b64-of-junk / bad JSON /
    ambiguous keys) through the REAL dispatch + decode + OCR plan; counts
    per status code incl. 300 (BASE64_DECODE_FAIL) and 301
    (BASE64_IMAGE_FAIL). Oracle = authoring-time expected codes."""
    from ppocr_spark.pipeline import ocr_requests

    rdir = _request_corpus(sf_dir)
    reqs = spark.read.parquet(f"{rdir}/requests.parquet")
    media = spark.read.parquet(f"{rdir}/request_media.parquet")
    out = ocr_requests(reqs, media, PPOCRConfig(cls=True, use_angle_cls=True))
    return (
        out.groupBy("code")
        .agg(F.count("*").alias("n_requests"))
        .orderBy("code")
    )


def _base64_taxonomy_sql(sf_dir: str) -> str:
    rdir = _request_corpus(sf_dir)
    return (
        "SELECT expected_code AS code, count(*) AS n_requests "
        f"FROM read_parquet('{rdir}/request_truth.parquet') "
        "GROUP BY 1 ORDER BY code"
    )


def _request_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-request (code, text) equality through the REAL dispatch + OCR
    plan — S3/S5/S7 end-to-end including recognized text, not just the
    code census."""
    from ppocr_spark.pipeline import ocr_requests

    rdir = _request_corpus(sf_dir)
    reqs = spark.read.parquet(f"{rdir}/requests.parquet")
    media = spark.read.parquet(f"{rdir}/request_media.parquet")
    out = ocr_requests(reqs, media, PPOCRConfig(cls=True, use_angle_cls=True))
    return out.select("req_id", "code", "text").orderBy("req_id")


def _request_results_sql(sf_dir: str) -> str:
    rdir = _request_corpus(sf_dir)
    return (
        "SELECT req_id, expected_code AS code, expected_text AS text "
        f"FROM read_parquet('{rdir}/request_truth.parquet') ORDER BY req_id"
    )


def _k1_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1's drop-empty/score<=0 output filter, applied relationally."""
    e = _load(spark, sf_dir, "events")
    return (
        e.filter((F.col("value") > 0) & (F.trim("props") != ""))
        .groupBy("event_type")
        .agg(F.count("*").alias("kept"))
        .orderBy("event_type")
    )


_K1_FILTER_SQL = """
SELECT event_type, count(*) AS kept FROM events
WHERE value > 0 AND trim(props) <> ''
GROUP BY event_type ORDER BY event_type
"""


def _quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/length gates: per-doc duplicate n-gram
    fractions (library dup_ngram_fraction — per-row JVM HOFs, no shuffle)
    plus a composite keep flag."""
    from ppocr_spark.functions.text import dup_ngram_fraction

    d = _load(spark, sf_dir, "documents")
    n_chars = F.length("text")
    d2 = dup_ngram_fraction(F.col("text"), 2)
    return d.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        dup_ngram_fraction(F.col("text"), 1).alias("dup_word_frac"),
        d2.alias("dup_2gram_frac"),
        dup_ngram_fraction(F.col("text"), 3).alias("dup_3gram_frac"),
        ((n_chars >= 100) & (d2 < 0.05)).alias("keep"),
    ).orderBy("doc_id")


_QUALITY_GATES_SQL = f"""
WITH toks AS (SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents),
fr AS (
  SELECT doc_id, length(text) AS n_chars,
    CASE WHEN len(t) < 1 THEN 0.0 ELSE
      round(1 - len(list_distinct([array_to_string(t[i:i], ' ')
                                   FOR i IN range(1, len(t) + 1)]))
              / (len(t) - 0), 6) END AS dup_word_frac,
    CASE WHEN len(t) < 2 THEN 0.0 ELSE
      round(1 - len(list_distinct([array_to_string(t[i:i+1], ' ')
                                   FOR i IN range(1, len(t))]))
              / (len(t) - 1), 6) END AS dup_2gram_frac,
    CASE WHEN len(t) < 3 THEN 0.0 ELSE
      round(1 - len(list_distinct([array_to_string(t[i:i+2], ' ')
                                   FOR i IN range(1, len(t) - 1)]))
              / (len(t) - 2), 6) END AS dup_3gram_frac
  FROM toks)
SELECT doc_id, n_chars, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
       (n_chars >= 100 AND dup_2gram_frac < 0.05) AS keep
FROM fr ORDER BY doc_id
"""


def _text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calls the SHIPPED library surface (functions.text.add_text_features)
    so the gate certifies what users import, not an inline twin."""
    from ppocr_spark.functions.text import add_text_features

    d = _load(spark, sf_dir, "documents")
    return (
        add_text_features(d.select("doc_id", "text"))
        .select(
            "doc_id",
            "n_tokens",
            F.round("punct_ratio", 6).alias("punct_ratio"),
            F.round("quality", 6).alias("quality"),
        )
        .orderBy("doc_id")
    )


_TEXT_FEATURES_SQL = f"""
SELECT doc_id,
       len({_DUCK_TOKS}) AS n_tokens,
       round((length(text) - length(regexp_replace(text, '[\\p{{P}}]', '', 'g')))
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(
         (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 1.0 ELSE 0.4 END) *
         (CASE WHEN (length(text) - length(regexp_replace(text, '[\\p{{P}}]', '', 'g')))
                    / greatest(length(text), 1) < 0.2 THEN 1.0 ELSE 0.5 END) *
         (CASE WHEN length(text) / greatest(len({_DUCK_TOKS}), 1)
                    BETWEEN 3 AND 12 THEN 1.0 ELSE 0.6 END), 6)::DOUBLE AS quality
FROM documents ORDER BY doc_id
"""


def _text_charclass_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-class composition — the script/noise
    profile under the length-band gates: ASCII-letter, digit,
    whitespace, punctuation (the proven cross-engine ``[\\p{P}]``
    class), and everything-else shares in exact integer ppm of the
    char count. Counts are length-deltas after class-strip
    ``regexp_replace`` (the ``punct_ratio`` technique — Java and RE2
    agree on these classes, proven by the text_features row). Pure
    per-row JVM expressions, zero shuffles."""
    e = _load(spark, sf_dir, "documents")

    def cnt(cls: str):
        return F.length("text") - F.length(
            F.regexp_replace(F.col("text"), cls, "")
        )

    den = F.greatest(F.length("text"), F.lit(1))
    # counts cast to LONG before the ppm multiply: length() is 32-bit
    # and 1e6 x a >2147-char class count overflows IntegerType (ANSI
    # mode raises; non-ANSI would wrap negative and diverge from the
    # BIGINT oracle) — caught by review, pinned by test
    alpha, digit, space, punct = (
        cnt("[A-Za-z]").cast("long"), cnt("[0-9]").cast("long"),
        cnt(r"[\s]").cast("long"), cnt(r"[\p{P}]").cast("long")
    )
    return (
        e.select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            (F.lit(1_000_000) * alpha).cast("long").alias("__a"),
            (F.lit(1_000_000) * digit).cast("long").alias("__d"),
            (F.lit(1_000_000) * space).cast("long").alias("__s"),
            (F.lit(1_000_000) * punct).cast("long").alias("__p"),
            (
                F.lit(1_000_000)
                * (F.length("text").cast("long")
                   - alpha - digit - space - punct)
            ).cast("long").alias("__o"),
            den.cast("long").alias("__den"),
        )
        .select(
            "doc_id", "n_chars",
            F.expr("__a DIV __den").cast("long").alias("alpha_ppm"),
            F.expr("__d DIV __den").cast("long").alias("digit_ppm"),
            F.expr("__s DIV __den").cast("long").alias("space_ppm"),
            F.expr("__p DIV __den").cast("long").alias("punct_ppm"),
            F.expr("__o DIV __den").cast("long").alias("other_ppm"),
        )
        .orderBy("doc_id")
    )


_CHARCLASS_SQL = """
WITH c AS (
  SELECT doc_id, length(text)::BIGINT AS n_chars,
         (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
           ::BIGINT AS a,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
           ::BIGINT AS d,
         (length(text) - length(regexp_replace(text, '[\\s]', '', 'g')))
           ::BIGINT AS s,
         (length(text) - length(regexp_replace(text, '[\\p{P}]', '', 'g')))
           ::BIGINT AS p,
         greatest(length(text), 1)::BIGINT AS den
  FROM documents
)
SELECT doc_id, n_chars,
       ((1000000 * a) // den)::BIGINT AS alpha_ppm,
       ((1000000 * d) // den)::BIGINT AS digit_ppm,
       ((1000000 * s) // den)::BIGINT AS space_ppm,
       ((1000000 * p) // den)::BIGINT AS punct_ppm,
       ((1000000 * (n_chars - a - d - s - p)) // den)::BIGINT AS other_ppm
FROM c ORDER BY doc_id
"""


def _langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library lang_id (priority tie-break en>de>fr>es) vs the oracle's
    CASE chain — the same rule stated two independent ways."""
    from ppocr_spark.functions.text import lang_id

    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", lang_id(F.col("text")).alias("lang_pred")
    ).orderBy("doc_id")


_LANGID_SQL = (
    f"SELECT doc_id, {_langid_case('duck')} AS lang_pred "
    "FROM documents ORDER BY doc_id"
)


def _lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-predicted language confusion matrix (library
    text.lang_confusion): the lang-ID model-eval table. |langs|²
    groupBy; row shares join the per-lang total back (no
    count-over-window on a language key — the skew trap); integer
    ppm."""
    from ppocr_spark.functions.text import lang_confusion

    d = _load(spark, sf_dir, "documents")
    return lang_confusion(d).orderBy("lang", "lang_pred")


_LANG_CONFUSION_SQL = f"""
WITH cells AS (
  SELECT lang, {_langid_case('duck')} AS lang_pred, count(*)::BIGINT AS n
  FROM documents GROUP BY 1, 2
), totals AS (
  SELECT lang, sum(n)::BIGINT AS t FROM cells GROUP BY lang
)
SELECT c.lang, c.lang_pred, c.n,
       ((1000000 * c.n) // t.t)::BIGINT AS row_ppm
FROM cells c JOIN totals t USING (lang)
ORDER BY lang, lang_pred
"""


def _fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.functions.text import doc_fingerprint

    d = _load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
        )
        .filter(F.col("fingerprint").isNotNull())  # < n tokens → no grams
        .orderBy("doc_id")
    )


_FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_aggregate(list_transform(grams, g -> md5(g)), 'min') AS fingerprint
FROM (
  SELECT doc_id, {_DUCK_GRAMS} AS grams
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
) WHERE len(grams) > 0 ORDER BY doc_id
"""


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-pre-tokenizer-style token counting — the shipped
    functions (token_count / bpe_ish_token_count); the oracle mirrors
    BPE_ISH_PATTERN verbatim."""
    from ppocr_spark.functions.text import bpe_ish_token_count, token_count

    d = _load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_ish"),
    ).orderBy("doc_id")


_TOKEN_COUNTS_SQL = f"""
SELECT doc_id, len({_DUCK_TOKS}) AS n_ws_tokens,
       len(regexp_extract_all(text,
                              '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]'))
           AS n_bpe_ish
FROM documents ORDER BY doc_id
"""


def _text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio (lexical diversity — the 'fraction of unique
    words' quality signal, Gopher-family): distinct tokens per million
    tokens as an exact integer (1e6*distinct) DIV total — float round()
    ties are a cross-engine hazard (CLAUDE.md), integer ppm is not.
    Pure per-row JVM expressions, zero shuffle; token-less docs emit
    NULL in both engines."""
    from ppocr_spark.functions.text import tokens

    d = _load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.when(
            n > 0,
            F.expr("1000000L") * uniq.cast("long"),
        ).cast("long").alias("_num"),
        n.cast("long").alias("n_tokens"),
        uniq.cast("long").alias("n_distinct"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.expr("_num DIV n_tokens").alias("ttr_ppm"),
    ).orderBy("doc_id")


_TEXT_TTR_SQL = f"""
SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       len(list_distinct(toks))::BIGINT AS n_distinct,
       CASE WHEN len(toks) > 0
            THEN (1000000 * len(list_distinct(toks))::BIGINT)
                 // len(toks)::BIGINT
            ELSE NULL END AS ttr_ppm
FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
ORDER BY doc_id
"""


_VOCAB_TOPK = 200


def _vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by total occurrence count
    (tokenizer/vocab-building precursor — the frequency table BPE and
    unigram-LM trainers start from). Explode → groupBy(token) with
    map-side partial counts; n_docs comes from a per-(token,doc) distinct
    pass whose partials also combine map-side. The (count DESC, token
    ASC) sort is a total order, so the top-k SET is deterministic at the
    boundary; limit-k compiles to TakeOrderedAndProject — no global
    sort materializes."""
    from ppocr_spark.functions.text import tokens

    d = _load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("n_tok"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_tok").desc(), "token")
        .limit(_VOCAB_TOPK)
    )


_VOCAB_TOPK_SQL = f"""
SELECT tok AS token, count(*) AS n_tok, count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents)
GROUP BY tok ORDER BY n_tok DESC, tok LIMIT {_VOCAB_TOPK}
"""


def _winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (k=8 char grams, window 5) — classic
    near-identity document sketch; JVM expressions only. The per-char
    md5 chain is the heaviest per-row expression in the text family, so
    the input is spread to cluster parallelism (a single local parquet
    file otherwise pins the whole corpus to one core; at real scale
    maxPartitionBytes already splits the scan and spread is a no-op)."""
    from ppocr_spark.functions.text import spread, winnowing_fingerprint

    d = spread(_load(spark, sf_dir, "documents"))
    fp = winnowing_fingerprint(F.col("text"), k=8, w=5)
    return d.select(
        "doc_id",
        F.size(fp).alias("n_fp"),
        F.element_at(fp, 1).alias("fp_min"),
    ).orderBy("doc_id")


_WINNOWING_SQL = """
SELECT doc_id, len(fps) AS n_fp, fps[1] AS fp_min FROM (
  SELECT doc_id, list_sort(list_distinct(
    list_transform(range(1, greatest(len(hs) - 4, 1) + 1),
                   j -> list_aggregate(hs[j:j+4], 'min')))) AS fps
  FROM (
    SELECT doc_id,
           list_transform(range(1, greatest(length(lower(text)) - 7, 1) + 1),
                          i -> md5(substr(lower(text), i, 8))) AS hs
    FROM documents
  )
) ORDER BY doc_id
"""


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.functions.dedup import exact_dedup

    d = _load(spark, sf_dir, "documents")
    return exact_dedup(d.withColumn("doc_id", F.col("doc_id").cast("long"))) \
        .orderBy("h")


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY md5(text) ORDER BY h
"""


def _dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.functions.dedup import ngram_jaccard_pairs

    d = _load(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(d, threshold=0.12, n=3)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("a", "b")
    )


_DEDUP_JACCARD_SQL = f"""
WITH g AS (
  SELECT doc_id AS id, unnest(grams) AS g FROM (
    SELECT doc_id, {_DUCK_GRAMS} AS grams
    FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
  )
), sizes AS (SELECT id, count(*) AS n_g FROM g GROUP BY id),
shared AS (
  SELECT x.id AS a, y.id AS b, count(*) AS inter
  FROM g x JOIN g y ON x.g = y.g AND x.id < y.id
  GROUP BY x.id, y.id
)
SELECT a, b, round(inter / (sa.n_g + sb.n_g - inter), 6) AS jaccard
FROM shared JOIN sizes sa ON sa.id = a JOIN sizes sb ON sb.id = b
WHERE inter / (sa.n_g + sb.n_g - inter) >= 0.12
ORDER BY a, b
"""


def _dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment pairs (library
    dedup.ngram_containment_pairs): the asymmetric subset-dup signal —
    a doc quoted inside a longer one scores ~1e6 ppm short→long even
    when Jaccard is tiny. Integer-ppm exact; same gram-equi-join
    candidate generator as the Jaccard baseline (scale path = run it
    over MinHash-banded candidates only)."""
    from ppocr_spark.functions.dedup import ngram_containment_pairs

    d = _load(spark, sf_dir, "documents")
    return (
        ngram_containment_pairs(d, threshold_ppm=300_000, n=3)
        .orderBy("a", "b")
    )


_DEDUP_CONTAINMENT_SQL = f"""
WITH g AS (
  SELECT doc_id AS id, unnest(grams) AS g FROM (
    SELECT doc_id, {_DUCK_GRAMS} AS grams
    FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
  )
), sizes AS (SELECT id, count(*) AS n_g FROM g GROUP BY id),
shared AS (
  SELECT x.id AS a, y.id AS b, count(*) AS inter
  FROM g x JOIN g y ON x.g = y.g AND x.id <> y.id
  GROUP BY x.id, y.id
)
SELECT a, b, ((1000000 * inter) // sa.n_g)::BIGINT AS cont_ppm
FROM shared JOIN sizes sa ON sa.id = a
WHERE (1000000 * inter) // sa.n_g >= 300000
ORDER BY a, b
"""


def _dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup spans (Lee et al. style at word granularity):
    maximal token ranges covered by a 12-token window occurring >1 time in
    the corpus. Spark side keys the shuffle on xxhash64 of the gram; the
    oracle joins on the gram string (values agree absent 64-bit
    collisions)."""
    from ppocr_spark.functions.dedup import substring_dup_spans

    d = _load(spark, sf_dir, "documents")
    return (
        substring_dup_spans(d, k=12)
        .select(
            F.col("id").alias("doc_id"),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
        )
        .orderBy("doc_id", "span_start")
    )


# shared CTE chain: positional 12-gram duplicated-window spans (Lee et
# al.); consumed by the dedup_substring_spans oracle AND the impact
# report (one definition — a span-semantics change moves both or neither)
_SUBSTRING_SPANS_CTES = f"""stoks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
grams AS (
  SELECT doc_id, pos, array_to_string(t[pos:pos+11], ' ') AS g
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 10)) AS pos
        FROM stoks WHERE len(t) >= 12)
),
freq AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
dup AS (SELECT doc_id, pos - 1 AS pos FROM grams JOIN freq USING (g)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                   OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 12
              THEN 1 ELSE 0 END AS brk
  FROM dup),
isl2 AS (SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM isl),
spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + 12 AS span_end
  FROM isl2 GROUP BY doc_id, island)"""


_DEDUP_SUBSTRING_SQL = f"""
WITH {_SUBSTRING_SPANS_CTES}
SELECT doc_id, span_start, span_end
FROM spans ORDER BY doc_id, span_start
"""


def _decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 20 == 0 stand in for
    the held-out benchmark set; spans of the remaining corpus covered by
    any benchmark 12-gram are flagged."""
    from ppocr_spark.functions.dedup import contamination_spans

    d = _load(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 20 != 0)
    probe = d.filter(F.col("doc_id") % 20 == 0)
    return (
        contamination_spans(corpus, probe, k=12)
        .select(
            F.col("id").alias("doc_id"),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
        )
        .orderBy("doc_id", "span_start")
    )


_DECONTAMINATE_SQL = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
cg AS (
  SELECT doc_id, pos, array_to_string(t[pos:pos+11], ' ') AS g
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 10)) AS pos
        FROM toks WHERE len(t) >= 12 AND doc_id % 20 <> 0)
),
pg AS (
  SELECT DISTINCT array_to_string(t[pos:pos+11], ' ') AS g
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 10)) AS pos
        FROM toks WHERE len(t) >= 12 AND doc_id % 20 = 0)
),
dup AS (SELECT doc_id, pos - 1 AS pos FROM cg JOIN pg USING (g)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                   OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 12
              THEN 1 ELSE 0 END AS brk
  FROM dup),
isl2 AS (SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM isl)
SELECT doc_id, min(pos) AS span_start, max(pos) + 12 AS span_end
FROM isl2 GROUP BY doc_id, island ORDER BY doc_id, span_start
"""


def _clean_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline in one plan: repetition/length
    gates → exact dedup (min-id representative) → exact-substring span
    accounting on the surviving corpus. One summary row; every stage is
    the shipped library op the standalone gate queries certify."""
    from ppocr_spark import cache
    from ppocr_spark.functions.dedup import exact_dedup, substring_dup_spans
    from ppocr_spark.functions.text import dup_ngram_fraction, token_count

    d = _load(spark, sf_dir, "documents")
    # gated feeds three subtrees (count, exact_dedup, the join probe) and
    # corpus two more (token sum, span accounting) in ONE crossJoin plan —
    # persist both or the gate filter re-evaluates ~5x per action
    gated = cache.track(
        d.filter(
            (F.length("text") >= 100)
            & (dup_ngram_fraction(F.col("text"), 2) < 0.05)
        )
    )
    reps = exact_dedup(gated).select(F.col("keep_id").alias("doc_id"))
    corpus = cache.track(gated.join(reps, "doc_id"))
    spans = substring_dup_spans(corpus, k=12)
    n_raw = d.agg(F.count("*").cast("long").alias("n_raw"))
    n_gated = gated.agg(F.count("*").cast("long").alias("n_gated"))
    kept = corpus.agg(
        F.count("*").cast("long").alias("n_after_exact"),
        F.sum(token_count(F.col("text"))).cast("long").alias("total_tokens"),
    )
    dup_tok = spans.agg(
        F.coalesce(F.sum(F.col("span_end") - F.col("span_start")), F.lit(0))
        .cast("long")
        .alias("dup_span_tokens")
    )
    return n_raw.crossJoin(n_gated).crossJoin(kept).crossJoin(dup_tok)


_CLEAN_CORPUS_SQL = f"""
WITH feats AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents
),
gated AS (
  SELECT doc_id, text, t FROM feats
  WHERE length(text) >= 100 AND (
    CASE WHEN len(t) < 2 THEN 0.0 ELSE
      round(1 - len(list_distinct([array_to_string(t[i:i+1], ' ')
                                   FOR i IN range(1, len(t))]))
              / (len(t) - 1), 6) END) < 0.05
),
reps AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
corpus AS (SELECT g.doc_id, g.t FROM gated g JOIN reps USING (doc_id)),
grams AS (
  SELECT doc_id, pos, array_to_string(t[pos:pos+11], ' ') AS g
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 10)) AS pos
        FROM corpus WHERE len(t) >= 12)
),
freq AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
dup AS (SELECT doc_id, pos - 1 AS pos FROM grams JOIN freq USING (g)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                   OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 12
              THEN 1 ELSE 0 END AS brk
  FROM dup),
isl2 AS (SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM isl),
spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 12 AS e
          FROM isl2 GROUP BY doc_id, island)
SELECT (SELECT count(*) FROM documents) AS n_raw,
       (SELECT count(*) FROM gated) AS n_gated,
       (SELECT count(*) FROM corpus) AS n_after_exact,
       (SELECT sum(len(t))::BIGINT FROM corpus) AS total_tokens,
       (SELECT coalesce(sum(e - s), 0)::BIGINT FROM spans) AS dup_span_tokens
"""


def _dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.functions.dedup import minhash_dedup_pairs

    d = _load(spark, sf_dir, "documents")
    return (
        minhash_dedup_pairs(d, threshold=0.12, k=8, bands=4, n=3)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("a", "b")
    )


_DEDUP_MINHASH_SQL = f"""
WITH base AS (
  SELECT doc_id AS id, {_DUCK_GRAMS} AS grams
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
), sigs AS (
  SELECT id, grams, {_minhash_sig('duck')} AS sig FROM base WHERE len(grams) > 0
), banded AS (
  SELECT id, b AS band, array_to_string(sig[b*2+1:b*2+2], '|') AS key
  FROM sigs, unnest([0, 1, 2, 3]) AS t(b)
), cands AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.key = y.key AND x.id < y.id
)
SELECT a, b,
       round(len(list_intersect(ga.grams, gb.grams))::DOUBLE /
             len(list_distinct(list_concat(ga.grams, gb.grams))), 6) AS jaccard
FROM cands JOIN base ga ON ga.id = a JOIN base gb ON gb.id = b
WHERE len(list_intersect(ga.grams, gb.grams))::DOUBLE /
      len(list_distinct(list_concat(ga.grams, gb.grams))) >= 0.12
ORDER BY a, b
"""


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster formation over the MinHash near-dup pairs: distributed
    connected components (min-label propagation + pointer jumping) →
    per-document (cluster_id, keep) verdict, the keep-one-per-cluster
    policy of a dedup stage. Oracle: DuckDB recursive CTE reachability
    over the identical pair list."""
    from ppocr_spark.functions.dedup import (dedup_representatives,
                                             minhash_dedup_pairs)

    d = _load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, threshold=0.12, k=8, bands=4, n=3)
    return dedup_representatives(pairs, d).orderBy("doc_id")


# shared CTE chain prefix: MinHash LSH → verified near-dup pairs (a < b);
# consumed by the cc chain below AND the PageRank oracle
_MINHASH_PAIRS_CTES = f"""base AS (
  SELECT doc_id AS id, {_DUCK_GRAMS} AS grams
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
), sigs AS (
  SELECT id, grams, {_minhash_sig('duck')} AS sig FROM base WHERE len(grams) > 0
), banded AS (
  SELECT id, b AS band, array_to_string(sig[b*2+1:b*2+2], '|') AS key
  FROM sigs, unnest([0, 1, 2, 3]) AS t(b)
), cands AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.key = y.key AND x.id < y.id
), pairs AS (
  SELECT a, b
  FROM cands JOIN base ga ON ga.id = a JOIN base gb ON gb.id = b
  WHERE len(list_intersect(ga.grams, gb.grams))::DOUBLE /
        len(list_distinct(list_concat(ga.grams, gb.grams))) >= 0.12
)"""

# shared CTE chain: MinHash LSH pairs → recursive reachability → cc
# (node, cluster_id); consumed by dedup_clusters AND dedup_keep_best
_MINHASH_CC_CTE = f"""
WITH RECURSIVE {_MINHASH_PAIRS_CTES}, edges AS (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), reach AS (
  SELECT u AS node, u AS lab FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
), cc AS (
  SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
)"""

_DEDUP_CLUSTERS_SQL = f"""{_MINHASH_CC_CTE}
SELECT d.doc_id,
       coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
       d.doc_id = coalesce(cc.cluster_id, d.doc_id) AS keep
FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
ORDER BY d.doc_id
"""

_DEDUP_KEEP_BEST_SQL = f"""{_MINHASH_CC_CTE},
lab AS (
  SELECT d.doc_id, d.n_chars,
         coalesce(cc.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
), ranked AS (
  SELECT doc_id, cluster_id,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM lab
)
SELECT doc_id, cluster_id, rn = 1 AS keep FROM ranked ORDER BY doc_id
"""


def _dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram over the MinHash-LSH near-dup clusters
    (library dedup.cluster_size_histogram): how much corpus mass sits in
    multi-document clusters — the diagnostic that decides a dedup
    policy's bite. Same pair generation + connected components as
    ``dedup_clusters``, then two slim int64-only groupBys (cluster →
    size, size → n_clusters); document payloads never shuffle."""
    from ppocr_spark.functions.dedup import (cluster_size_histogram,
                                             dedup_representatives,
                                             minhash_dedup_pairs)

    d = _load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, threshold=0.12, k=8, bands=4, n=3)
    labels = dedup_representatives(pairs, d)
    return cluster_size_histogram(labels)


_DEDUP_CLUSTER_SIZES_SQL = f"""{_MINHASH_CC_CTE},
lab AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
), sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id
)
SELECT cluster_size::BIGINT AS cluster_size, count(*)::BIGINT AS n_clusters
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""


def _dedup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the symmetrized MinHash near-dup graph
    (library graph.pagerank): the iterative link-analysis member of the
    dedup family — rank near-dup cluster members by how connected they
    are (most-central representative, diversity-aware sample weighting).
    Integer pico-mass ranks: every step is int64 add/mul/truncating DIV
    (Spark ``DIV`` ≡ DuckDB ``//``), so the oracle replays all three
    iterations bit-for-bit. Per iteration: one slim equi-join + map-side-
    combinable sum (celebrity in-degree safe) and two 1-row constant
    attaches (n, dangling mass — whitelisted BNLJ-as-map)."""
    from ppocr_spark.functions.dedup import minhash_dedup_pairs
    from ppocr_spark.functions.graph import pagerank

    d = _load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, threshold=0.12, k=8, bands=4, n=3)
    edges = pairs.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).union(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
    nodes = d.select(F.col("doc_id").alias("node"))
    pr = pagerank(edges, nodes, iters=3)
    return pr.select(
        F.col("node").alias("doc_id"), F.col("pr").alias("pagerank_pico")
    ).orderBy("doc_id")


def _pagerank_iter_ctes(iters: int, scale: int) -> str:
    """Unrolled PageRank iteration CTEs (generator pattern follows
    ``_kmeans_fine_cte``): d{t} = dangling mass, c{t} = received
    contributions, r{t} = damped update — the exact integer expression
    graph.pagerank evaluates."""
    parts = []
    for t in range(1, iters + 1):
        p = f"r{t - 1}"
        parts.append(f"""
d{t} AS (
  SELECT coalesce(sum(pr), 0)::BIGINT AS dang
  FROM {p} LEFT JOIN deg ON deg.u = {p}.node WHERE deg.u IS NULL
),
c{t} AS (
  SELECT e.v AS node, sum(r.pr // g.deg)::BIGINT AS recv
  FROM edges e JOIN {p} r ON r.node = e.u JOIN deg g ON g.u = e.u
  GROUP BY e.v
),
r{t} AS (
  SELECT nd.node,
         ((15 * ({scale} // nn.n)) // 100
          + (85 * (coalesce(c{t}.recv, 0) + d{t}.dang // nn.n)) // 100
         )::BIGINT AS pr
  FROM nodes nd LEFT JOIN c{t} ON c{t}.node = nd.node, nn, d{t}
)""")
    return ",".join(parts)


_DEDUP_PAGERANK_SQL = f"""
WITH {_MINHASH_PAIRS_CTES},
edges AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT u, count(*)::BIGINT AS deg FROM edges GROUP BY u),
nodes AS (SELECT doc_id AS node FROM documents),
nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
r0 AS (SELECT node, ({_PAGERANK_SCALE} // n)::BIGINT AS pr FROM nodes, nn),
{_pagerank_iter_ctes(3, _PAGERANK_SCALE)}
SELECT node AS doc_id, pr AS pagerank_pico FROM r3 ORDER BY doc_id
"""


def _dedup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficient over the MinHash
    near-dup graph (library graph.triangle_stats): the cohesion
    diagnostic — tight cliques (high clustering) are safe keep-one
    clusters, low-clustering chains flag transitive over-deletion risk.
    Degree-ordered edge orientation caps wedge fan-out at O(√m) (the
    celebrity-node valve); all joins are hash equi-joins; coefficients
    are integer ppm ((2·10⁶·tri) DIV deg(deg−1) — exact both engines)."""
    from ppocr_spark.functions.dedup import minhash_dedup_pairs
    from ppocr_spark.functions.graph import triangle_stats

    d = _load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, threshold=0.12, k=8, bands=4, n=3)
    nodes = d.select(F.col("doc_id").alias("node"))
    return (
        triangle_stats(pairs.select("a", "b"), nodes)
        .select(
            F.col("node").alias("doc_id"),
            "degree",
            "triangles",
            "clustering_ppm",
        )
        .orderBy("doc_id")
    )


_DEDUP_TRIANGLES_SQL = f"""
WITH {_MINHASH_PAIRS_CTES},
edges AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT u AS node, count(*)::BIGINT AS deg FROM edges GROUP BY u),
orient AS (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND p.a < p.b)
              THEN p.a ELSE p.b END AS s,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND p.a < p.b)
              THEN p.b ELSE p.a END AS t
  FROM pairs p JOIN deg da ON da.node = p.a JOIN deg db ON db.node = p.b
),
wedge AS (
  SELECT o1.s AS u, o1.t AS x, o2.t AS y
  FROM orient o1 JOIN orient o2 ON o1.s = o2.s
  JOIN deg dx ON dx.node = o1.t JOIN deg dy ON dy.node = o2.t
  WHERE (dx.deg < dy.deg) OR (dx.deg = dy.deg AND o1.t < o2.t)
),
tri AS (
  SELECT w.u, w.x, w.y
  FROM wedge w JOIN orient o ON o.s = w.x AND o.t = w.y
),
pern AS (
  SELECT node, count(*)::BIGINT AS triangles FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT x FROM tri
    UNION ALL SELECT y FROM tri
  ) GROUP BY node
)
SELECT d.doc_id,
       coalesce(g.deg, 0)::BIGINT AS degree,
       coalesce(p.triangles, 0)::BIGINT AS triangles,
       (CASE WHEN coalesce(g.deg, 0) >= 2
             THEN (2000000 * coalesce(p.triangles, 0))
                  // (g.deg * (g.deg - 1))
             ELSE 0 END)::BIGINT AS clustering_ppm
FROM documents d
LEFT JOIN deg g ON g.node = d.doc_id
LEFT JOIN pern p ON p.node = d.doc_id
ORDER BY d.doc_id
"""


def _dedup_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic label-propagation communities over the MinHash
    near-dup graph (library graph.label_propagation): the
    soft-clustering companion to connected components — weakly-bridged
    near-dup cliques stay separate communities. Coin-flips removed:
    simultaneous update, most-frequent neighbor label, ties to the
    lowest label via one min(struct(-cnt, lab)) aggregate; 2 unrolled
    iterations so the oracle replays exactly."""
    from ppocr_spark.functions.dedup import minhash_dedup_pairs
    from ppocr_spark.functions.graph import label_propagation

    d = _load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, threshold=0.12, k=8, bands=4, n=3)
    edges = pairs.select("a", "b").unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).select(F.col("a").alias("u"), F.col("b").alias("v"))
    nodes = d.select(F.col("doc_id").alias("node"))
    return (
        label_propagation(edges, nodes, iters=2)
        .select(F.col("node").alias("doc_id"), "community")
        .orderBy("doc_id")
    )


def _lpa_round(i: int) -> str:
    """One unrolled LPA round: votes from l{i-1}, argmax with
    (cnt DESC, lab ASC), isolated nodes carry their label."""
    p = i - 1
    return f"""v{i} AS (
  SELECT e.v AS node, l.lab, count(*) AS cnt
  FROM e JOIN l{p} l ON l.node = e.u GROUP BY 1, 2
), b{i} AS (
  SELECT node, lab FROM (
    SELECT node, lab,
           row_number() OVER (PARTITION BY node
                              ORDER BY cnt DESC, lab) AS rn
    FROM v{i})
  WHERE rn = 1
), l{i} AS (
  SELECT l{p}.node, coalesce(b{i}.lab, l{p}.lab) AS lab
  FROM l{p} LEFT JOIN b{i} USING (node)
)"""


_DEDUP_LPA_SQL = f"""
WITH {_MINHASH_PAIRS_CTES},
e AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
l0 AS (SELECT doc_id AS node, doc_id AS lab FROM documents),
{_lpa_round(1)},
{_lpa_round(2)}
SELECT node AS doc_id, lab AS community FROM l2 ORDER BY doc_id
"""


def _snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two corpus snapshots (library
    incremental.snapshot_diff): per-doc added/removed/changed/unchanged
    verdicts — what an ingest pipeline runs on every crawl drop to
    decide the reprocess set. Both snapshots collapse to slim
    (id, md5) rows BEFORE the one co-partitioned full-outer equi-join;
    payloads never shuffle. The "old" snapshot is derived
    deterministically from the same table via md5(doc_id) hex
    predicates (≈25% added, ≈12.5% removed via '-retired' ids, a
    quarter of the retained docs content-changed), so the oracle
    replays the derivation and the diff exactly."""
    from ppocr_spark.functions.incremental import snapshot_diff

    d = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    h1 = F.substring(F.md5(F.col("doc_id")), 1, 1)
    h2 = F.substring(F.md5(F.col("doc_id")), 2, 1)
    old = (
        d.filter(h1 < F.lit("c"))
        .select(
            "doc_id",
            F.when(
                h2 < F.lit("4"), F.concat(F.col("text"), F.lit(" stale"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .union(
            d.filter(h1 >= F.lit("e")).select(
                F.concat(F.col("doc_id"), F.lit("-retired")).alias(
                    "doc_id"
                ),
                "text",
            )
        )
    )
    return snapshot_diff(old, d).orderBy("doc_id")


_SNAPSHOT_DIFF_SQL = """
WITH docs AS (
  SELECT doc_id::VARCHAR AS doc_id, text FROM documents
), old AS (
  SELECT doc_id,
         CASE WHEN substr(md5(doc_id), 2, 1) < '4'
              THEN text || ' stale' ELSE text END AS text
  FROM docs WHERE substr(md5(doc_id), 1, 1) < 'c'
  UNION ALL
  SELECT doc_id || '-retired', text FROM docs
  WHERE substr(md5(doc_id), 1, 1) >= 'e'
), oh AS (SELECT doc_id AS id, md5(text) AS h_old FROM old),
nh AS (SELECT doc_id AS id, md5(text) AS h_new FROM docs)
SELECT coalesce(oh.id, nh.id) AS doc_id,
       CASE WHEN oh.id IS NULL THEN 'added'
            WHEN nh.id IS NULL THEN 'removed'
            WHEN h_old <> h_new THEN 'changed'
            ELSE 'unchanged' END AS status
FROM oh FULL OUTER JOIN nh ON oh.id = nh.id
ORDER BY doc_id
"""


def _dedup_ssjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-set Jaccard similarity join via PREFIX FILTERING
    (library dedup.ssjoin_prefix_pairs — SSJoin/AllPairs/PPJoin
    family): distinct 3-grams globally ordered by ascending document
    frequency, each doc joins only on its first m − ceil(t·m) + 1
    grams (the prefix lemma guarantees no lost pair), candidates
    verified with an exact integer-ppm Jaccard. The
    exact-AND-sub-quadratic leg next to the probabilistic MinHash
    path and the quadratic gram-join baseline."""
    from ppocr_spark.functions.dedup import ssjoin_prefix_pairs

    d = _load(spark, sf_dir, "documents")
    return (
        ssjoin_prefix_pairs(d, threshold_ppm=500_000, n=3)
        .orderBy("a", "b")
    )


_SSJOIN_PREFIX_SQL = f"""
WITH toks AS (
  SELECT id, unnest(g) AS tok FROM (
    SELECT doc_id AS id, {_DUCK_GRAMS} AS g
    FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents))
), freq AS (
  SELECT tok, count(*)::BIGINT AS dfreq FROM toks GROUP BY tok
), ranked AS (
  SELECT t.id, t.tok,
         row_number() OVER (PARTITION BY t.id ORDER BY f.dfreq, t.tok)
           AS rn,
         count(*) OVER (PARTITION BY t.id) AS n
  FROM toks t JOIN freq f USING (tok)
), pref AS (
  SELECT id, tok FROM ranked
  WHERE rn <= n - ((500000::BIGINT * n + 999999) // 1000000) + 1
), cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM pref x JOIN pref y ON x.tok = y.tok AND x.id < y.id
), sizes AS (
  SELECT id, count(*)::BIGINT AS n FROM toks GROUP BY id
), inter AS (
  SELECT c.a, c.b, count(*)::BIGINT AS inter
  FROM cand c
  JOIN toks ta ON ta.id = c.a
  JOIN toks tb ON tb.id = c.b AND tb.tok = ta.tok
  GROUP BY c.a, c.b
)
SELECT i.a, i.b, i.inter,
       (sa.n + sb.n - i.inter)::BIGINT AS union_n,
       ((1000000 * i.inter) // (sa.n + sb.n - i.inter))::BIGINT
         AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.id = i.a
JOIN sizes sb ON sb.id = i.b
WHERE (1000000 * i.inter) // (sa.n + sb.n - i.inter) >= 500000
ORDER BY a, b
"""


def _source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution KL divergence vs the corpus in
    integer micro-nats (library text.source_token_kl): the
    source-drift diagnostic behind mixture reweighting. Exact
    support-restricted KL — round(ln, 9) nano-lifts, decimal(38,0)/
    HUGEINT sums (int64-safe at 10¹² tokens), one non-negative
    integer DIV; the corpus distribution re-aggregates the slim
    (source, token) table, no second corpus pass."""
    from ppocr_spark.functions.text import source_token_kl

    d = _load(spark, sf_dir, "documents")
    return source_token_kl(d).orderBy("source")


_SOURCE_TOKEN_KL_SQL = f"""
WITH counts AS (
  SELECT source AS src, tok, count(*)::BIGINT AS c
  FROM (SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents)
  GROUP BY 1, 2
), corpus AS (
  SELECT tok, sum(c)::BIGINT AS cc FROM counts GROUP BY tok
), tot AS (
  SELECT sum(c)::BIGINT AS n FROM counts
), per AS (
  SELECT src,
         sum(c)::BIGINT AS n_toks,
         count(*)::BIGINT AS n_types,
         sum(c::HUGEINT
             * (((round(ln(c::DOUBLE), 9)::DECIMAL(28,9)) * 1000000000)
                ::BIGINT
                - ((round(ln(cc::DOUBLE), 9)::DECIMAL(28,9)) * 1000000000)
                ::BIGINT)::HUGEINT) AS s
  FROM counts JOIN corpus USING (tok) GROUP BY src
)
SELECT src AS source, n_toks, n_types,
       (greatest(
          s + n_toks::HUGEINT
              * (((round(ln((SELECT n FROM tot)::DOUBLE), 9)
                   ::DECIMAL(28,9)) * 1000000000)::BIGINT
                 - ((round(ln(n_toks::DOUBLE), 9)::DECIMAL(28,9))
                    * 1000000000)::BIGINT)::HUGEINT,
          0::HUGEINT)
        // (n_toks::HUGEINT * 1000))::BIGINT AS kl_micro
FROM per ORDER BY source
"""


def _text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k PMI collocations over adjacent token bigrams (library
    text.pmi_bigrams — Church & Hanks): phrase-mining / tokenizer-merge
    candidates. Score = pure int64 SUM of five round(ln, 9) nano-lifts
    — no division, so the negative-quotient truncation hazard never
    arises; top-k plans as TakeOrderedAndProject."""
    from ppocr_spark.functions.text import pmi_bigrams

    d = _load(spark, sf_dir, "documents")
    return pmi_bigrams(d, min_count=5, k=64)


_PMI_BIGRAMS_SQL = f"""
WITH toks AS (SELECT {_DUCK_TOKS} AS l FROM documents),
nl AS (SELECT (round(ln(x::DOUBLE), 9)::DECIMAL(28,9) * 1000000000)
         ::BIGINT AS v, x FROM (
           SELECT DISTINCT x FROM (
             SELECT sum(len(l))::BIGINT AS x FROM toks
             UNION ALL
             SELECT sum(greatest(len(l) - 1, 0))::BIGINT FROM toks))),
tot AS (SELECT sum(len(l))::BIGINT AS nt,
               sum(greatest(len(l) - 1, 0))::BIGINT AS nb FROM toks),
uni AS (SELECT tok AS w, count(*)::BIGINT AS cu
        FROM (SELECT unnest(l) AS tok FROM toks) GROUP BY tok),
bg AS (
  SELECT p[1] AS w1, p[2] AS w2
  FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
        FROM toks WHERE len(l) >= 2)
),
pairs AS (SELECT w1, w2, count(*)::BIGINT AS c_pair
          FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
lift AS (
  SELECT p.w1, p.w2, p.c_pair,
         ((round(ln(p.c_pair::DOUBLE), 9)::DECIMAL(28,9)
           * 1000000000)::BIGINT
          - (SELECT v FROM nl, tot WHERE x = nb)
          - (round(ln(u1.cu::DOUBLE), 9)::DECIMAL(28,9)
             * 1000000000)::BIGINT
          - (round(ln(u2.cu::DOUBLE), 9)::DECIMAL(28,9)
             * 1000000000)::BIGINT
          + 2 * (SELECT v FROM nl, tot WHERE x = nt))::BIGINT AS pmi_nano
  FROM pairs p
  JOIN uni u1 ON u1.w = p.w1
  JOIN uni u2 ON u2.w = p.w2
)
SELECT w1, w2, c_pair, pmi_nano
FROM lift ORDER BY pmi_nano DESC, w1, w2 LIMIT 64
"""


def _dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup (library
    dedup.incremental_minhash_matches): the 20% delta batch
    (doc_id % 5 = 0) probes the base corpus's MinHash band index —
    base×base pairs are never regenerated — plus the earlier-delta
    (min-id-keeps) rule within the batch. Same signature chain and
    exact gram-Jaccard verify as the batch operator; integer-ppm
    scores."""
    from ppocr_spark.functions.dedup import incremental_minhash_matches

    d = _load(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 5 != 0)
    delta = d.filter(F.col("doc_id") % 5 == 0)
    return (
        incremental_minhash_matches(
            base, delta, threshold_ppm=120_000, k=8, bands=4, n=3
        )
        .orderBy("doc_id", "match_src", "match_id")
    )


_DEDUP_INCREMENTAL_SQL = f"""
WITH docs AS (
  SELECT doc_id AS id, doc_id % 5 = 0 AS is_delta, {_DUCK_GRAMS} AS grams
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
), sigs AS (
  SELECT id, is_delta, grams, {_minhash_sig('duck')} AS sig
  FROM docs WHERE len(grams) > 0
), banded AS (
  SELECT id, is_delta, b AS band,
         array_to_string(sig[b*2+1:b*2+2], '|') AS key
  FROM sigs, unnest([0, 1, 2, 3]) AS t(b)
), cands AS (
  SELECT DISTINCT x.id AS id, y.id AS mid, 'base' AS match_src
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.key = y.key
  WHERE x.is_delta AND NOT y.is_delta
  UNION
  SELECT DISTINCT x.id, y.id, 'delta'
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.key = y.key AND y.id < x.id
  WHERE x.is_delta AND y.is_delta
)
SELECT c.id AS doc_id, c.mid AS match_id, c.match_src,
       ((1000000 * len(list_intersect(gi.grams, gm.grams)))
        // len(list_distinct(list_concat(gi.grams, gm.grams))))::BIGINT
         AS jaccard_ppm
FROM cands c
JOIN sigs gi ON gi.id = c.id
JOIN sigs gm ON gm.id = c.mid
WHERE (1000000 * len(list_intersect(gi.grams, gm.grams)))
      // len(list_distinct(list_concat(gi.grams, gm.grams))) >= 120000
ORDER BY doc_id, match_src, match_id
"""


def _text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build artifact (library search.build_inverted_index):
    per term in the df band [2, 400], document frequency, collection
    frequency, and the doc_id:tf posting list in ascending doc order
    serialized to one deterministic string. The df band filter runs
    BEFORE the collect, so per-term state is bounded and hot stopword
    terms are elided, not truncated."""
    from ppocr_spark.functions.search import build_inverted_index

    d = _load(spark, sf_dir, "documents")
    return build_inverted_index(d, min_df=2, max_df=400).orderBy("term")


_INVERTED_INDEX_SQL = f"""
WITH tf AS (
  SELECT tok AS term, doc_id AS id, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents)
  GROUP BY 1, 2
), band AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
  FROM tf GROUP BY term HAVING count(*) BETWEEN 2 AND 400
)
SELECT b.term, b.df, b.cf,
       string_agg(t.id::VARCHAR || ':' || t.tf::VARCHAR, ','
                  ORDER BY t.id) AS postings
FROM band b JOIN tf t USING (term)
GROUP BY 1, 2, 3 ORDER BY term
"""


def _dedup_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup-policy report (library dedup.dedup_source_report):
    deletion rate of the keep-one policy and cross-source cluster mass
    (the syndication/mirror signal) per source, integer ppm, over the
    same MinHash clusters as ``dedup_clusters``."""
    from ppocr_spark.functions.dedup import (dedup_representatives,
                                             dedup_source_report,
                                             minhash_dedup_pairs)

    d = _load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, threshold=0.12, k=8, bands=4, n=3)
    labels = dedup_representatives(pairs, d)
    return dedup_source_report(labels, d).orderBy("source")


_DEDUP_SOURCE_REPORT_SQL = f"""{_MINHASH_CC_CTE}
, lab AS (
  SELECT d.doc_id AS id, d.source,
         coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
         d.doc_id = coalesce(cc.cluster_id, d.doc_id) AS keep
  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
), spreads AS (
  SELECT cluster_id, count(DISTINCT source) AS ns
  FROM lab GROUP BY cluster_id
), rep AS (
  SELECT l.source, count(*)::BIGINT AS n_docs,
         sum(CASE WHEN NOT l.keep THEN 1 ELSE 0 END)::BIGINT AS n_dups,
         sum(CASE WHEN s.ns >= 2 THEN 1 ELSE 0 END)::BIGINT
           AS n_xsource
  FROM lab l JOIN spreads s USING (cluster_id)
  GROUP BY l.source
)
SELECT source, n_docs, n_dups,
       ((1000000 * n_dups) // n_docs)::BIGINT AS dup_ppm,
       n_xsource,
       ((1000000 * n_xsource) // n_docs)::BIGINT AS xsource_ppm
FROM rep ORDER BY source
"""


def _text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch–Kincaid-style readability signals (library
    text.readability): words/sentence, chars/word, FKGL-shaped
    composite — all exact integer milli/micro units (two non-negative
    integer DIVs, engine-identical). Pure per-row JVM expressions,
    zero shuffles."""
    from ppocr_spark.functions.text import readability

    d = _load(spark, sf_dir, "documents")
    return (
        readability(d)
        .select(F.col("id").alias("doc_id"), "n_sents", "n_words",
                "n_chars", "wps_milli", "cpw_milli", "fk_micro")
        .orderBy("doc_id")
    )


_READABILITY_SQL = f"""
WITH base AS (
  SELECT doc_id, {_DUCK_TOKS} AS l,
         greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
                                  s -> trim(s) <> '')), 1)::BIGINT
           AS n_sents
  FROM documents
), per AS (
  SELECT doc_id, n_sents, len(l)::BIGINT AS n_words,
         list_sum(list_transform(l, t -> length(t)))::BIGINT AS n_chars
  FROM base WHERE len(l) > 0
)
SELECT doc_id, n_sents, n_words, n_chars,
       ((1000 * n_words) // n_sents)::BIGINT AS wps_milli,
       ((1000 * n_chars) // n_words)::BIGINT AS cpw_milli,
       ((390000 * n_words) // n_sents
        + (11800000 * n_chars) // n_words - 15590000)::BIGINT AS fk_micro
FROM per ORDER BY doc_id
"""


def _dedup_lsh_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH banding S-curve, MEASURED: recall of the MinHash-LSH
    near-dup path (``minhash_dedup_pairs`` at its 0.12 operating
    point) against the exact prefix-join ground truth
    (``ssjoin_prefix_pairs`` at the same threshold), per 0.1-wide
    Jaccard band — the estimator-calibration table a pipeline
    publishes before trusting the probabilistic path's misses (recall
    must climb with Jaccard exactly as the banding curve predicts;
    the whole curve is deterministic given the md5 permutations).
    Integer-ppm everywhere; band = jaccard_ppm DIV 100000. NOTE: at
    this low threshold the prefix filter prunes little — the truth
    side is a LABELED exact-baseline cost (the ann_topk_bruteforce
    class), run at eval scale or with ssjoin's max_df valve, never as
    the production dedup path."""
    from ppocr_spark.functions.dedup import (minhash_dedup_pairs,
                                             ssjoin_prefix_pairs)

    d = _load(spark, sf_dir, "documents")
    truth = ssjoin_prefix_pairs(d, threshold_ppm=120_000, n=3).select(
        "a", "b", "jaccard_ppm"
    )
    found = minhash_dedup_pairs(
        d, threshold=0.12, k=8, bands=4, n=3
    ).select("a", "b", F.lit(1).alias("__hit"))
    return (
        truth.join(found, ["a", "b"], "left")
        .groupBy(F.expr("jaccard_ppm DIV 100000").cast("long")
                 .alias("band"))
        .agg(
            F.count("*").cast("long").alias("n_true"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long").alias("n_found"),
        )
        .select(
            "band", "n_true", "n_found",
            F.expr("(1000000 * n_found) DIV n_true").cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("band")
    )


_LSH_RECALL_SQL = f"""
WITH {_MINHASH_PAIRS_CTES},
tgrams AS (
  SELECT doc_id AS id, unnest(grams) AS g FROM (
    SELECT doc_id, {_DUCK_GRAMS} AS grams
    FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents))
), tsizes AS (
  SELECT id, count(*)::BIGINT AS n FROM tgrams GROUP BY id
), tinter AS (
  SELECT x.id AS a, y.id AS b, count(*)::BIGINT AS i
  FROM tgrams x JOIN tgrams y ON x.g = y.g AND x.id < y.id
  GROUP BY 1, 2
), truth AS (
  SELECT t.a, t.b,
         (1000000 * t.i) // (sa.n + sb.n - t.i) AS jp
  FROM tinter t
  JOIN tsizes sa ON sa.id = t.a
  JOIN tsizes sb ON sb.id = t.b
  WHERE (1000000 * t.i) // (sa.n + sb.n - t.i) >= 120000
)
SELECT (t.jp // 100000)::BIGINT AS band,
       count(*)::BIGINT AS n_true,
       sum(CASE WHEN p.a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_found,
       ((1000000 * sum(CASE WHEN p.a IS NOT NULL THEN 1 ELSE 0 END))
        // count(*))::BIGINT AS recall_ppm
FROM truth t LEFT JOIN pairs p ON p.a = t.a AND p.b = t.b
GROUP BY 1 ORDER BY band
"""


def _dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-level dedup impact dashboard: for each of the three
    dedup families — exact (md5 keep-min), near-dup (MinHash keep-one
    clusters), exact-substring (Lee et al. span cuts) — the documents
    affected and tokens that stage alone would remove. The
    policy-decision table read before ordering/choosing dedup stages
    (stages overlap; each row is the stage's standalone bite).
    Compositional: every number derives from the already-oracle-shared
    chains; all joins are slim id/hash keys; integer counts only."""
    from ppocr_spark import cache
    from ppocr_spark.functions.dedup import (dedup_representatives,
                                             exact_dedup,
                                             minhash_dedup_pairs,
                                             substring_dup_spans)
    from ppocr_spark.functions.text import token_count

    d = _load(spark, sf_dir, "documents")
    # three consumers (one per dedup arm) in ONE unioned action — persist
    # the slim token-count projection or the corpus scan + tokenize
    # re-evaluates per arm (the bm25/track_if_large lesson)
    toks = cache.track_if_large(
        d,
        d.select("doc_id",
                 token_count(F.col("text")).cast("long").alias("nt")),
    )
    # exact arm derives from the REAL stage operator (dedup.exact_dedup)
    # so a keep-rule change moves the stage and this report together
    h = d.select("doc_id", F.md5("text").alias("h"))
    exact_removed = (
        h.join(exact_dedup(d).select("h", "keep_id"), "h")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .join(toks, "doc_id")
        .agg(F.count("*").alias("nd"), F.sum("nt").alias("ntok"))
        .select(F.lit("exact").alias("stage"),
                F.col("nd").cast("long").alias("n_docs_affected"),
                F.coalesce(F.col("ntok"), F.lit(0)).cast("long")
                .alias("n_tokens_removed"))
    )
    pairs = minhash_dedup_pairs(d, threshold=0.12, k=8, bands=4, n=3)
    near_removed = (
        dedup_representatives(pairs, d)
        .filter(~F.col("keep"))
        .join(toks, "doc_id")
        .agg(F.count("*").alias("nd"), F.sum("nt").alias("ntok"))
        .select(F.lit("near_dup").alias("stage"),
                F.col("nd").cast("long").alias("n_docs_affected"),
                F.coalesce(F.col("ntok"), F.lit(0)).cast("long")
                .alias("n_tokens_removed"))
    )
    spans = substring_dup_spans(d, k=12)
    sub_removed = (
        spans.groupBy("id")
        .agg(F.sum(F.col("span_end") - F.col("span_start")).alias("cut"))
        .agg(F.count("*").alias("nd"), F.sum("cut").alias("ntok"))
        .select(F.lit("substring").alias("stage"),
                F.col("nd").cast("long").alias("n_docs_affected"),
                F.coalesce(F.col("ntok"), F.lit(0)).cast("long")
                .alias("n_tokens_removed"))
    )
    return (
        exact_removed.unionByName(near_removed).unionByName(sub_removed)
        .orderBy("stage")
    )


def _dedup_impact_sql() -> str:
    return f"""{_MINHASH_CC_CTE}
, {_SUBSTRING_SPANS_CTES}
, tcnt AS (
  SELECT doc_id, len({_DUCK_TOKS})::BIGINT AS nt FROM documents
), hx AS (
  SELECT doc_id, md5(text) AS h FROM documents
), keepmin AS (SELECT h, min(doc_id) AS k FROM hx GROUP BY h),
exact_rm AS (
  SELECT 'exact' AS stage, count(*)::BIGINT AS n_docs_affected,
         coalesce(sum(t.nt), 0)::BIGINT AS n_tokens_removed
  FROM hx JOIN keepmin USING (h) JOIN tcnt t USING (doc_id)
  WHERE hx.doc_id <> keepmin.k
),
lab AS (
  SELECT d.doc_id,
         d.doc_id = coalesce(cc.cluster_id, d.doc_id) AS keep
  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
),
near_rm AS (
  SELECT 'near_dup' AS stage, count(*)::BIGINT,
         coalesce(sum(t.nt), 0)::BIGINT
  FROM lab JOIN tcnt t USING (doc_id) WHERE NOT lab.keep
),
sub_rm AS (
  SELECT 'substring' AS stage, count(*)::BIGINT,
         coalesce(sum(cut), 0)::BIGINT
  FROM (SELECT doc_id, sum(span_end - span_start)::BIGINT AS cut
        FROM spans GROUP BY doc_id)
)
SELECT * FROM exact_rm
UNION ALL SELECT * FROM near_rm
UNION ALL SELECT * FROM sub_rm
ORDER BY stage
"""


def _dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster representative (library dedup.dedup_keep_best):
    same MinHash-LSH clusters as ``dedup_clusters``, but each cluster
    keeps its LONGEST document (n_chars as the quality score, min id on
    ties) — the RefinedWeb-style keep policy. The argmax is one
    groupBy(cluster) over a (score, −id) struct; no per-cluster window."""
    from ppocr_spark.functions.dedup import (dedup_keep_best,
                                             minhash_dedup_pairs)

    d = _load(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(d, threshold=0.12, k=8, bands=4, n=3)
    return dedup_keep_best(pairs, d, score_col="n_chars").orderBy("doc_id")


def _sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k deterministic global sample (library
    sampling.sample_exact_k): first 64 documents in md5(id) order —
    plans as TakeOrderedAndProject (per-task k-row heaps, no global
    sort)."""
    from ppocr_spark.functions.sampling import sample_exact_k

    d = _load(spark, sf_dir, "documents")
    return sample_exact_k(d.select("doc_id", "source"), k=64).orderBy(
        "doc_id"
    )


_SAMPLE_EXACT_K_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source FROM documents
  ORDER BY md5(concat('exactk:', doc_id::VARCHAR)), doc_id LIMIT 64
) ORDER BY doc_id
"""


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library simhash (dedup.simhash_fingerprints) vs the generated
    DuckDB dialect of the same bit-vote definition."""
    from ppocr_spark.functions.dedup import simhash_fingerprints

    d = _load(spark, sf_dir, "documents")
    return simhash_fingerprints(d).orderBy("doc_id")


def _dedup_simhash_sql() -> str:
    hashes, terms = _simhash_expr("duck")
    return (
        f"SELECT doc_id, {terms} AS simhash FROM "
        f"(SELECT doc_id, {hashes} AS hs FROM documents) ORDER BY doc_id"
    )


def _simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bit balance of the 60-bit SimHash fingerprints — the
    hash-health diagnostic behind the pigeonhole near-dup path: a
    biased bit position (share far from 50%) weakens the hamming
    bound's uniformity assumptions and flags a broken token-hash mix.
    ONE aggregate pass (60 shiftright-sum expressions + a count), then
    a driver-side unpivot of the single 61-column row — the
    ``documents_profile`` one-agg stack shape, no 60× row fan-out over
    the corpus. Shares are integer ppm."""
    from ppocr_spark.functions.dedup import simhash_fingerprints

    d = _load(spark, sf_dir, "documents")
    fp = simhash_fingerprints(d)
    one = fp.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("simhash"), b) % 2)
            .cast("long").alias(f"b{b}")
            for b in range(60)
        ]
    )
    stack = ", ".join(f"{b}, b{b}" for b in range(60))
    return (
        one.selectExpr("n", f"stack(60, {stack}) AS (bit, n_set)")
        .select(
            F.col("bit").cast("int").alias("bit"),
            F.col("n_set"),
            F.expr("(1000000 * n_set) DIV n").cast("long")
            .alias("share_ppm"),
        )
        .orderBy("bit")
    )


def _simhash_bit_balance_sql() -> str:
    hashes, terms = _simhash_expr("duck")
    return f"""
WITH s AS (
  SELECT doc_id, {terms} AS simhash FROM
  (SELECT doc_id, {hashes} AS hs FROM documents)
), tot AS (SELECT count(*)::BIGINT AS n FROM s),
bits AS (
  SELECT b.bit::INT AS bit,
         sum((s.simhash >> b.bit) & 1)::BIGINT AS n_set
  FROM s, unnest(range(0, 60)) AS b(bit)
  GROUP BY b.bit
)
SELECT bit, n_set, ((1000000 * n_set) // t.n)::BIGINT AS share_ppm
FROM bits, tot t ORDER BY bit
"""


def _dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at hamming ≤ 8 via the pigeonhole multi-block plan.
    The oracle is the BRUTE-FORCE all-pairs hamming join — pigeonhole
    bucketing guarantees identical output, and the gate proves it."""
    from ppocr_spark.functions.dedup import simhash_near_pairs

    d = _load(spark, sf_dir, "documents")
    return simhash_near_pairs(d, max_hamming=8).orderBy("a", "b")


def _dedup_simhash_pairs_sql() -> str:
    hashes, terms = _simhash_expr("duck")
    return f"""
WITH fp AS (
  SELECT doc_id, {terms} AS simhash FROM
  (SELECT doc_id, {hashes} AS hs FROM documents)
)
SELECT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.simhash, y.simhash)) AS hamming
FROM fp x JOIN fp y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 8
ORDER BY a, b
"""


def _emb_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.functions.dedup import embedding_near_dup_pairs

    e = _load(spark, sf_dir, "embeddings")
    return (
        embedding_near_dup_pairs(e, threshold=0.4)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
        .orderBy("a", "b")
    )


_EMB_COSINE_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
       sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.4
ORDER BY a, b
"""


def _ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.functions.similarity import brute_force_topk

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return brute_force_topk(e, q, k=5).orderBy("query_id", "rank")


_ANN_BRUTE_SQL = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
          sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos_raw
  FROM embeddings q JOIN embeddings c ON q.vec_id < 8
   AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


def _ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.functions.similarity import lsh_topk

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return lsh_topk(e, q, k=5, bits=6, tables=4, dim=64).orderBy(
        "query_id", "rank"
    )


def _lsh_sigs_cte(bits: int, tables: int, dim: int) -> str:
    """DuckDB CTE computing per-table bucket ids from the SAME hyperplane
    literals the Spark operators inline (similarity.hyperplanes — single
    source; kills the rows-only check on the LSH path)."""
    from ppocr_spark.functions.similarity import (
        hyperplanes,
        signature_sql_duckdb,
    )

    planes = hyperplanes(dim, bits, tables)
    sigs = ", ".join(
        f"{signature_sql_duckdb(planes[t])} AS b{t}" for t in range(tables)
    )
    return f"SELECT vec_id, embedding, {sigs} FROM embeddings"


def _ann_lsh_sql() -> str:
    tables = 4
    match = " OR ".join(f"c.b{t} = q.b{t}" for t in range(tables))
    return f"""
WITH base AS ({_lsh_sigs_cte(bits=6, tables=4, dim=64)}),
q AS (SELECT * FROM base WHERE vec_id < 8),
scored AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
          sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos_raw
  FROM base c JOIN q ON ({match}) AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: literal init centroids → one distributed Lloyd step
    (decimal-exact means) → inverted lists → n_probe probing → exact
    re-rank. The oracle recomputes the ENTIRE refinement in SQL — the
    centroids must agree bit-for-bit across engines."""
    from ppocr_spark.functions.similarity import ivf_topk

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return ivf_topk(
        e, q, k=5, n_centroids=8, n_probe=3, dim=64
    ).orderBy("query_id", "rank")


def _ann_ivf_ctes(with_probe_rank: bool = False) -> str:
    """CTE chain replaying ivf_topk bit-for-bit (init → one Lloyd step →
    inverted lists → probes → ranked candidates); shared by the IVF
    top-k oracle, the recall-eval oracle, and (with
    ``with_probe_rank``) the probe-sweep oracle so all replay the SAME
    index. With the flag, ``scored`` carries ``first_prb`` — the
    minimum probe rank at which each candidate appears — so rank-np
    subsets re-rank exactly the candidate set a literal n_probe=np run
    would see; without it the emitted SQL is unchanged."""
    from ppocr_spark.functions.similarity import _ivf_init

    init = _ivf_init(64, 8, seed=7, scale=0.125)
    vals = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(init)
    )
    d_of = (
        "list_sum(list_transform(range(1, 65), j -> "
        "(e.embedding[j]::DOUBLE - {c}[j]) * "
        "(e.embedding[j]::DOUBLE - {c}[j])))"
    )
    prb_col = ", rn AS prb" if with_probe_rank else ""
    head = "" if with_probe_rank else "DISTINCT"
    prb_min = ", min(p.prb) AS first_prb" if with_probe_rank else ""
    prb_grp = (
        "\n  GROUP BY p.qid, c.vec_id, cos_raw" if with_probe_rank else ""
    )
    return f"""init(cl, cent) AS (VALUES {vals}),
a1 AS (
  SELECT vec_id, embedding, cl FROM (
    SELECT e.vec_id, e.embedding, i.cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d_of.format(c='i.cent')}, i.cl) AS rn
    FROM embeddings e CROSS JOIN init i
  ) WHERE rn = 1
),
comp AS (
  SELECT cl, generate_subscripts(embedding, 1) AS pos,
         unnest(embedding) AS val
  FROM a1
),
ref AS (
  SELECT cl, list(c ORDER BY pos) AS cent FROM (
    SELECT cl, pos,
           (sum(CAST(round(val::DOUBLE, 7) AS DECIMAL(27,7)))::DOUBLE
            / count(*)) AS c
    FROM comp GROUP BY cl, pos
  ) GROUP BY cl
),
full_c AS (
  SELECT i.cl, coalesce(r.cent, i.cent) AS cent
  FROM init i LEFT JOIN ref r ON i.cl = r.cl
),
a2 AS (
  SELECT vec_id, embedding, cl FROM (
    SELECT e.vec_id, e.embedding, f.cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d_of.format(c='f.cent')}, f.cl) AS rn
    FROM embeddings e CROSS JOIN full_c f
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS qid, embedding AS qv, cl{prb_col} FROM (
    SELECT e.vec_id, e.embedding, f.cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d_of.format(c='f.cent')}, f.cl) AS rn
    FROM embeddings e CROSS JOIN full_c f
    WHERE e.vec_id < 8
  ) WHERE rn <= 3
),
scored AS (
  SELECT {head} p.qid AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(p.qv::DOUBLE[], c.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(p.qv::DOUBLE[], p.qv::DOUBLE[])) *
          sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos_raw{prb_min}
  FROM probes p JOIN a2 c ON p.cl = c.cl AND c.vec_id <> p.qid{prb_grp}
),
ranked AS (
  SELECT query_id, neighbor_id, cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
)"""


def _ann_ivf_sql() -> str:
    return f"""
WITH {_ann_ivf_ctes()}
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


def _ann_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall-vs-n_probe operating curve, measured: mean
    recall@5 ppm against the exact brute-force top-5 at n_probe =
    1, 2, 3 — the table that picks the index's latency/recall
    operating point (the IVF counterpart of the LSH banding S-curve
    row). Ground truth AND the index are computed ONCE and persisted:
    ivf_topk's ``with_probe_rank`` output carries each candidate's
    minimum probe rank, so every arm is a filter + re-rank
    (first_prb ≤ np ⟺ the candidate's cell is in the top-np probes —
    the exact set a literal n_probe=np run sees); the oracle replays
    the same shape."""
    from pyspark.sql import Window

    from ppocr_spark import cache
    from ppocr_spark.functions.similarity import (brute_force_topk,
                                                  ivf_topk, recall_at_k)

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = cache.track(brute_force_topk(e, q, k=5))
    # the index is n_probe-independent: fit + invert ONCE at the max
    # probe count with the first_prb column, derive every arm by
    # filtering + re-ranking (the oracle's own shape)
    cand = cache.track(
        ivf_topk(e, q, k=5, n_centroids=8, n_probe=3, dim=64,
                 with_probe_rank=True)
    )
    out = None
    for np_ in (1, 2, 3):
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        arm = (
            cand.filter(F.col("first_prb") <= np_)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id")
        )
        r = recall_at_k(exact, arm, k=5)
        row = (
            r.agg(F.count("*").alias("nq"), F.sum("hits").alias("h"))
            .select(
                F.lit(np_).cast("long").alias("n_probe"),
                F.col("nq").cast("long").alias("n_queries"),
                F.col("h").cast("long").alias("total_hits"),
                F.expr("(1000000 * h) DIV (5 * nq)").cast("long")
                .alias("recall_ppm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n_probe")


def _ann_probe_sweep_sql() -> str:
    arms = []
    for np_ in (1, 2, 3):
        arms.append(f"""(
  SELECT {np_}::BIGINT AS n_probe,
         count(*)::BIGINT AS n_queries,
         sum(hits)::BIGINT AS total_hits,
         ((1000000 * sum(hits)) // (5 * count(*)))::BIGINT AS recall_ppm
  FROM (
    SELECT b.query_id, count(i.query_id) AS hits
    FROM brute b LEFT JOIN (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_raw DESC, neighbor_id)
                 AS rank
        FROM scored WHERE first_prb <= {np_}
      ) WHERE rank <= 5
    ) i ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
  )
)""")
    return f"""
WITH {_ann_ivf_ctes(with_probe_rank=True)},
bscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(q.embedding::DOUBLE[],
                                q.embedding::DOUBLE[])) *
          sqrt(list_dot_product(c.embedding::DOUBLE[],
                                c.embedding::DOUBLE[]))) AS cos_raw
  FROM embeddings q JOIN embeddings c
    ON q.vec_id < 8 AND c.vec_id <> q.vec_id
), branked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM bscored
), brute AS (SELECT query_id, neighbor_id FROM branked WHERE rank <= 5)
SELECT * FROM ({" UNION ALL ".join(arms)}) ORDER BY n_probe
"""


def _ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index quality evaluation (library similarity.recall_at_k):
    per-query recall@5 of the IVF index against the exact brute-force
    top-5, as an integer ppm ((1e6*hits) DIV k — engine-identical; a
    float ratio + round() is the documented cross-engine tie hazard).
    The oracle replays BOTH indexes in SQL (the shared `_ann_ivf_ctes`
    chain plus the brute-force window) and intersects the id pairs, so
    the recall number itself is value-checked, not just row-counted."""
    from ppocr_spark.functions.similarity import (brute_force_topk,
                                                  ivf_topk, recall_at_k)

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(e, q, k=5)
    approx = ivf_topk(e, q, k=5, n_centroids=8, n_probe=3, dim=64)
    return recall_at_k(exact, approx, k=5)


def _ann_recall_sql() -> str:
    return f"""
WITH {_ann_ivf_ctes()},
ivf AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5),
bscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
          sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos_raw
  FROM embeddings q JOIN embeddings c ON q.vec_id < 8 AND c.vec_id <> q.vec_id
), branked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM bscored
), brute AS (SELECT query_id, neighbor_id FROM branked WHERE rank <= 5),
hits AS (
  SELECT b.query_id, count(i.query_id) AS hits
  FROM brute b LEFT JOIN ivf i
    ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
  GROUP BY b.query_id
)
SELECT query_id, hits::BIGINT AS hits,
       ((hits * 1000000) // 5)::BIGINT AS recall_ppm
FROM hits ORDER BY query_id
"""


def _knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote classification (library similarity.knn_classify):
    predict each probe vector's label from its 5 exact nearest
    neighbors' labels — the label-propagation primitive. The top-k sets
    are engine-identical (same deterministic tie-break the
    ann_topk_bruteforce parity already pins), so the votes and the
    (votes DESC, label ASC) argmax replay exactly."""
    from ppocr_spark.functions.similarity import knn_classify

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 32)
    return knn_classify(e, q, k=5)


_KNN_CLASSIFY_SQL = """
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
          sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos_raw
  FROM embeddings q JOIN embeddings c ON q.vec_id < 32
   AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_raw DESC, neighbor_id) AS rank
  FROM scored
), votes AS (
  SELECT r.query_id, e.label::BIGINT AS lab, count(*) AS votes
  FROM ranked r JOIN embeddings e ON e.vec_id = r.neighbor_id
  WHERE r.rank <= 5 GROUP BY 1, 2
), best AS (
  SELECT query_id, lab, votes,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, lab) AS rn
  FROM votes
)
SELECT query_id, lab AS pred_label, votes::BIGINT AS votes
FROM best WHERE rn = 1 ORDER BY query_id
"""


def _cluster_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality evaluation (library similarity.cluster_label_purity):
    majority-label purity of the deterministic k-means cells against
    the labeled slice, in integer ppm. The oracle replays the SAME two
    Lloyd rounds through the shared ``_kmeans_cte`` chain, so the
    purity numbers are value-checked end-to-end, not just counted."""
    from ppocr_spark.functions.similarity import (cluster_label_purity,
                                                  kmeans_fit_assign)

    e = _load(spark, sf_dir, "embeddings")
    assignment, _ = kmeans_fit_assign(e, n_centroids=8, iters=2, dim=64)
    return cluster_label_purity(
        assignment.withColumnRenamed("id", "vec_id"),
        e.select("vec_id", "label"),
    )


def _cluster_purity_sql() -> str:
    return f"""
WITH {_kmeans_cte(2)},
asg AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, f.cl AS cluster,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_KM_D_OF.format(c='f.cent')}, f.cl)
             AS rn
    FROM embeddings e CROSS JOIN full_2 f
  ) WHERE rn = 1
), cnt AS (
  SELECT a.cluster, e.label::BIGINT AS lab, count(*) AS n
  FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY 1, 2
), top AS (
  SELECT cluster, lab, n,
         sum(n) OVER (PARTITION BY cluster) AS n_vecs,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY n DESC, lab) AS rn
  FROM cnt
)
SELECT cluster, n_vecs::BIGINT AS n_vecs, lab AS top_label,
       n::BIGINT AS top_n, ((n * 1000000) // n_vecs)::BIGINT AS purity_ppm
FROM top WHERE rn = 1 ORDER BY cluster
"""


# list_reduce = strict left fold, matching Spark's F.aggregate evaluation
# order bit-for-bit (list_sum may regroup and land on the other side of a
# round-6 boundary when the distance VALUE is exported)
_KM_D_OF = (
    "list_reduce(list_transform(range(1, 65), j -> "
    "(e.embedding[j]::DOUBLE - {c}[j]) * "
    "(e.embedding[j]::DOUBLE - {c}[j])), (a, b) -> a + b)"
)


def _kmeans_cte(iters: int = 2) -> str:
    """CTE chain replaying kmeans_fit_assign bit-for-bit: per iteration,
    argmin assignment (ties → lowest cluster), decimal-exact means,
    empty clusters coalescing to the PREVIOUS iteration's centroid.
    Ends with a CTE ``full_{iters}`` holding the final centroid table."""
    from ppocr_spark.functions.similarity import _ivf_init

    init = _ivf_init(64, 8, seed=7, scale=0.125)
    vals = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in c)}]::DOUBLE[])"
        for i, c in enumerate(init)
    )
    parts = [f"full_0(cl, cent) AS (VALUES {vals})"]
    for it in range(1, iters + 1):
        prev = f"full_{it - 1}"
        parts.append(f"""
a_{it} AS (
  SELECT vec_id, embedding, cl FROM (
    SELECT e.vec_id, e.embedding, f.cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_KM_D_OF.format(c='f.cent')}, f.cl)
             AS rn
    FROM embeddings e CROSS JOIN {prev} f
  ) WHERE rn = 1
),
m_{it} AS (
  SELECT cl, list(c ORDER BY pos) AS cent FROM (
    SELECT cl, pos,
           (sum(CAST(round(val::DOUBLE, 7) AS DECIMAL(27,7)))::DOUBLE
            / count(*)) AS c
    FROM (SELECT cl, generate_subscripts(embedding, 1) AS pos,
                 unnest(embedding) AS val FROM a_{it})
    GROUP BY cl, pos
  ) GROUP BY cl
),
full_{it} AS (
  SELECT p.cl, coalesce(m.cent, p.cent) AS cent
  FROM {prev} p LEFT JOIN m_{it} m ON p.cl = m.cl
)""")
    return ", ".join(parts)


def _embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed deterministic k-means (library
    similarity.kmeans_fit_assign): 2 Lloyd rounds, decimal-exact means,
    literal seeded init; output = final (vec_id, cluster, sq_dist).
    Oracle unrolls both iterations in SQL and must agree bit-for-bit."""
    from ppocr_spark.functions.similarity import kmeans_fit_assign

    e = _load(spark, sf_dir, "embeddings")
    assignment, _ = kmeans_fit_assign(e, n_centroids=8, iters=2, dim=64)
    return assignment.withColumnRenamed("id", "vec_id").orderBy("vec_id")


def _embedding_kmeans_sql() -> str:
    return f"""
WITH {_kmeans_cte(2)}
SELECT vec_id, cluster, round(d, 6) AS sq_dist FROM (
  SELECT e.vec_id, f.cl AS cluster,
         {_KM_D_OF.format(c='f.cent')} AS d,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_KM_D_OF.format(c='f.cent')}, f.cl)
           AS rn
  FROM embeddings e CROSS JOIN full_2 f
) WHERE rn = 1 ORDER BY vec_id
"""


# integer distance between a quantized embedding and an integer centroid —
# exact BIGINT math, identical in any evaluation order (the fine-path
# exactness contract; similarity._fine_assign computes the same integers
# via one float64 matmul per Arrow batch)
_KMF_D_OF = (
    "list_sum(list_transform(range(1, 65), j -> "
    "(e.vq[j] - {c}[j]) * (e.vq[j] - {c}[j])))"
)


def _kmeans_fine_cte(n_centroids: int, iters: int) -> str:
    """CTE chain replaying similarity.kmeans_fine bit-for-bit: integer
    init centroids (the SAME ints the Spark path uses — single source,
    similarity.init_centroids_q), per-iteration integer argmin
    assignment (ties → lowest cluster) and the ``(2s + n) // (2n)``
    integer centroid update (both engines truncate toward zero), empty
    clusters coalescing to the previous centroid. Ends with
    ``cq_{iters}`` holding the final integer centroid table and ``e6``
    holding the quantized embeddings."""
    from ppocr_spark.functions.similarity import init_centroids_q

    init = init_centroids_q(64, n_centroids)
    vals = ", ".join(
        f"({i}, [{', '.join(str(int(x)) for x in c)}]::BIGINT[])"
        for i, c in enumerate(init)
    )
    parts = [
        f"cq_0(cl, cent) AS (VALUES {vals})",
        """
e6 AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> round(x::DOUBLE * 1000000)::BIGINT) AS vq
  FROM embeddings
)""",
    ]
    for it in range(1, iters + 1):
        prev = f"cq_{it - 1}"
        parts.append(f"""
a_{it} AS (
  SELECT vec_id, vq, cl FROM (
    SELECT e.vec_id, e.vq, c.cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_KMF_D_OF.format(c='c.cent')}, c.cl)
             AS rn
    FROM e6 e CROSS JOIN {prev} c
  ) WHERE rn = 1
),
m_{it} AS (
  SELECT cl, list(c ORDER BY pos) AS cent FROM (
    SELECT cl, pos,
           ((2 * sum(val) + count(*)) // (2 * count(*)))::BIGINT AS c
    FROM (SELECT cl, generate_subscripts(vq, 1) AS pos,
                 unnest(vq) AS val FROM a_{it})
    GROUP BY cl, pos
  ) GROUP BY cl
),
cq_{it} AS (
  SELECT p.cl, coalesce(m.cent, p.cent) AS cent
  FROM {prev} p LEFT JOIN m_{it} m ON p.cl = m.cl
)""")
    return ", ".join(parts)


def _pq_cte(
    n_cells: int = 64,
    cell_iters: int = 1,
    m: int = 4,
    n_codes: int = 16,
    pq_iters: int = 1,
    seed: int = 7,
    pq_init_scale: float = 0.03,
) -> str:
    """CTE chain replaying similarity.pq_fit_encode bit-for-bit on top of
    ``_kmeans_fine_cte``: coarse assignment under the final cells,
    integer residuals, one integer-Lloyd chain per PQ subspace (same
    argmin tie rule and ``(2s + n) // (2n)`` update), and the per-row
    code vector. Ends with ``cellcodes`` (vec_id, cl, code_0..code_{m-1})
    and ``res`` (vec_id, cl, rq)."""
    from ppocr_spark.functions.similarity import init_centroids_q

    d_sub = 64 // m
    fin = f"cq_{cell_iters}"

    def dsub_dist(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {d_sub + 1}), d -> "
            f"({a}[d] - {b}[d]) * ({a}[d] - {b}[d])))"
        )

    parts = [_kmeans_fine_cte(n_cells, cell_iters)]
    parts.append(f"""
asg AS (
  SELECT vec_id, vq, cl FROM (
    SELECT e.vec_id, e.vq, c.cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_KMF_D_OF.format(c='c.cent')}, c.cl)
             AS rn
    FROM e6 e CROSS JOIN {fin} c
  ) WHERE rn = 1
),
res AS (
  SELECT a.vec_id, a.cl,
         list_transform(range(1, 65), i -> a.vq[i] - c.cent[i]) AS rq
  FROM asg a JOIN {fin} c ON a.cl = c.cl
)""")
    code_joins = []
    for j in range(m):
        init = init_centroids_q(
            d_sub, n_codes, seed + 101 + j, pq_init_scale
        )
        vals = ", ".join(
            f"({i}, [{', '.join(str(int(x)) for x in c)}]::BIGINT[])"
            for i, c in enumerate(init)
        )
        lo, hi = j * d_sub + 1, (j + 1) * d_sub
        parts.append(f"""
pj{j}_0(cl, cent) AS (VALUES {vals}),
sub{j} AS (SELECT vec_id, rq[{lo}:{hi}] AS vq FROM res)""")
        for it in range(1, pq_iters + 1):
            prev = f"pj{j}_{it - 1}"
            parts.append(f"""
pa{j}_{it} AS (
  SELECT vec_id, vq, cl FROM (
    SELECT s.vec_id, s.vq, c.cl,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY {dsub_dist('s.vq', 'c.cent')}, c.cl)
             AS rn
    FROM sub{j} s CROSS JOIN {prev} c
  ) WHERE rn = 1
),
pm{j}_{it} AS (
  SELECT cl, list(c ORDER BY pos) AS cent FROM (
    SELECT cl, pos,
           ((2 * sum(val) + count(*)) // (2 * count(*)))::BIGINT AS c
    FROM (SELECT cl, generate_subscripts(vq, 1) AS pos,
                 unnest(vq) AS val FROM pa{j}_{it})
    GROUP BY cl, pos
  ) GROUP BY cl
),
pj{j}_{it} AS (
  SELECT p.cl, coalesce(mm.cent, p.cent) AS cent
  FROM {prev} p LEFT JOIN pm{j}_{it} mm ON p.cl = mm.cl
)""")
        parts.append(f"""
pc{j} AS (
  SELECT vec_id, cl AS code_{j} FROM (
    SELECT s.vec_id, c.cl,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY {dsub_dist('s.vq', 'c.cent')}, c.cl)
             AS rn
    FROM sub{j} s CROSS JOIN pj{j}_{pq_iters} c
  ) WHERE rn = 1
)""")
        code_joins.append(f"pc{j}")
    joins = " ".join(f"JOIN {t} USING (vec_id)" for t in code_joins)
    cols = ", ".join(f"code_{j}" for j in range(m))
    parts.append(f"""
cellcodes AS (
  SELECT r.vec_id, r.cl, {cols}
  FROM res r {joins}
)""")
    return ", ".join(parts)


def _pq_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace PQ quantization-error report (library
    similarity.pq_reconstruction_report): mean squared
    residual-to-codeword distance per subspace — the codebook-quality
    audit behind the IVF-PQ index, at zero extra passes (the argmin
    distance rides out of the encode Arrow pass). Oracle replays the
    full fit via the shared ``_pq_cte`` chain and recomputes each
    assigned codeword's distance."""
    from ppocr_spark.functions.similarity import pq_reconstruction_report

    e = _load(spark, sf_dir, "embeddings")
    return pq_reconstruction_report(e).orderBy("subspace")


def _pq_reconstruction_sql() -> str:
    m, d_sub, pq_iters = 4, 16, 1

    def dd(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {d_sub + 1}), d -> "
            f"({a}[d] - {b}[d]) * ({a}[d] - {b}[d])))"
        )

    errs = ",\n".join(
        f"""er{j} AS (
  SELECT s.vec_id, {j} AS subspace, {dd("s.vq", "c.cent")}::BIGINT AS err
  FROM pc{j} p
  JOIN sub{j} s USING (vec_id)
  JOIN pj{j}_{pq_iters} c ON c.cl = p.code_{j}
)"""
        for j in range(m)
    )
    union = " UNION ALL ".join(f"SELECT * FROM er{j}" for j in range(m))
    return f"""
WITH {_pq_cte()},
{errs},
allerr AS ({union})
SELECT subspace::INT AS subspace, count(*)::BIGINT AS n_vecs,
       (sum(err::HUGEINT) // count(*)::HUGEINT)::BIGINT AS mse_q2
FROM allerr GROUP BY subspace ORDER BY subspace
"""


def _embeddings_dim_variance(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """Per-dimension variance report over the quantized embeddings —
    the dead/degenerate-dimension diagnostic (a near-zero-variance
    dimension wastes PQ codebook capacity and distance budget; the
    complement of the PCA top-component view). Exact integer moments:
    per dim, Σx and Σx² of the int64-quantized values in
    decimal(38,0) (HUGEINT in the oracle), then
    var·n² = n·Σx² − (Σx)² reported as var_q2 = that DIV n²
    (non-negative by Cauchy–Schwarz, so truncation direction is
    moot). One posexplode pass, 64-key groupBy with map-side
    combine."""
    e = _load(spark, sf_dir, "embeddings")
    from ppocr_spark.functions.similarity import _quantized

    per = (
        e.select(F.posexplode(_quantized(F.col("embedding")))
                 .alias("dim", "__v"))
        .groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("__v").cast("decimal(38,0)")).alias("__s"),
            F.sum(
                (F.col("__v") * F.col("__v")).cast("decimal(38,0)")
            ).alias("__s2"),
        )
    )
    return (
        per.select(
            F.col("dim").cast("int").alias("dim"),
            "n",
            F.expr(
                "cast((n * __s2 - __s * __s) div (cast(n as decimal(38,0))"
                " * n) as bigint)"
            ).alias("var_q2"),
        )
        .orderBy("dim")
    )


_EMB_DIM_VARIANCE_SQL = """
WITH q AS (
  SELECT list_transform(embedding,
                        x -> round(x::DOUBLE * 1000000)::BIGINT) AS qv
  FROM embeddings
), per AS (
  SELECT pos AS dim, count(*)::BIGINT AS n,
         sum(v::HUGEINT) AS s, sum((v * v)::HUGEINT) AS s2
  FROM (SELECT generate_subscripts(qv, 1) - 1 AS pos, unnest(qv) AS v
        FROM q)
  GROUP BY pos
)
SELECT dim::INT AS dim, n,
       ((n::HUGEINT * s2 - s * s) // (n::HUGEINT * n::HUGEINT))::BIGINT
         AS var_q2
FROM per ORDER BY dim
"""


def _embedding_kmeans_fine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fine-quantizer k-means (library similarity.kmeans_fine, k=256 ≫
    the coarse plan-literal envelope): broadcast centroid matrix +
    Arrow-batched matmul assignment, INTEGER distance contract. The
    oracle replays both Lloyd iterations in integer SQL and must agree
    bit-for-bit — including dist_q, the exact integer squared
    distance."""
    from ppocr_spark.functions.similarity import kmeans_fine

    e = _load(spark, sf_dir, "embeddings")
    assignment, _ = kmeans_fine(e, n_centroids=256, iters=2, dim=64)
    return assignment.withColumnRenamed("id", "vec_id").orderBy("vec_id")


def _embedding_kmeans_fine_sql() -> str:
    return f"""
WITH {_kmeans_fine_cte(256, 2)}
SELECT vec_id, cluster, dist_q::BIGINT AS dist_q FROM (
  SELECT e.vec_id, c.cl AS cluster,
         {_KMF_D_OF.format(c='c.cent')} AS dist_q,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {_KMF_D_OF.format(c='c.cent')}, c.cl)
           AS rn
  FROM e6 e CROSS JOIN cq_2 c
) WHERE rn = 1 ORDER BY vec_id
"""


def _ann_ivf_fine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fine-quantizer IVF top-k (library similarity.ivf_topk_fine,
    k-means cells at k=256 ≫ the coarse plan-literal envelope): broadcast
    integer centroid matrix + one matmul per Arrow batch for corpus
    assignment AND query multi-probe; disjoint cells need no candidate
    dedup. The oracle replays the integer k-means chain, the corpus
    inversion, the top-n_probe probe ranking and the exact cosine
    re-rank."""
    from ppocr_spark.functions.similarity import ivf_topk_fine

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return ivf_topk_fine(
        e, q, k=5, n_centroids=256, iters=2, n_probe=8, dim=64
    ).orderBy("query_id", "rank")


def _fine_topk_sql(probe_where: str, n_probe: int, k: int) -> str:
    """Generator for the fine-quantizer IVF top-k replay: integer
    k-means chain → corpus inversion → top-``n_probe`` probe ranking →
    exact cosine re-rank. ``probe_where`` selects the query set
    ('' = every corpus vector, i.e. the offline kNN self-join)."""
    return f"""
WITH {_kmeans_fine_cte(256, 2)},
inv AS (
  SELECT vec_id AS nid, cl FROM (
    SELECT e.vec_id, c.cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_KMF_D_OF.format(c='c.cent')}, c.cl)
             AS rn
    FROM e6 e CROSS JOIN cq_2 c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS qid, cl FROM (
    SELECT e.vec_id, c.cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_KMF_D_OF.format(c='c.cent')}, c.cl)
             AS rn
    FROM e6 e CROSS JOIN cq_2 c
    {probe_where}
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.qid, i.nid,
         list_dot_product(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(q.embedding::DOUBLE[],
                                q.embedding::DOUBLE[])) *
          sqrt(list_dot_product(n.embedding::DOUBLE[],
                                n.embedding::DOUBLE[]))) AS cosine
  FROM probes p
  JOIN inv i ON i.cl = p.cl AND i.nid <> p.qid
  JOIN embeddings q ON q.vec_id = p.qid
  JOIN embeddings n ON n.vec_id = i.nid
)
SELECT qid AS query_id, nid AS neighbor_id,
       round(cosine, 6) AS cosine, rank FROM (
  SELECT qid, nid, cosine,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, nid) AS rank
  FROM cand
) WHERE rank <= {k} ORDER BY query_id, rank
"""


def _ann_ivf_fine_sql() -> str:
    return _fine_topk_sql("WHERE e.vec_id < 8", 8, 5)


def _knn_join_fine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus kNN self-join (offline all-pairs top-k — the SemDeDup /
    cluster-QA primitive): ``ivf_topk_fine`` with queries = the corpus
    itself. The query side rides the SHUFFLE equi-join arm of the
    broadcast gate at real scale (a corpus-sized broadcast would OOM —
    the r4 VERDICT fix); candidate volume per vector stays
    ~n_probe/n_centroids of the corpus, and disjoint cells need no
    candidate dedup."""
    from ppocr_spark.functions.similarity import ivf_topk_fine

    e = _load(spark, sf_dir, "embeddings")
    return ivf_topk_fine(
        e, e, k=3, n_centroids=256, iters=2, n_probe=4, dim=64
    ).orderBy("query_id", "rank")


def _knn_join_fine_sql() -> str:
    return _fine_topk_sql("", 4, 3)


def _ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (library similarity.ivf_pq_topk, Jégou et al. 2011):
    coarse integer k-means cells → integer residuals → per-subspace
    integer-Lloyd codebooks → one-pass encoding → multi-probe +
    asymmetric-distance scoring, where the per-candidate hot path is a
    fixed m-term JVM table lookup (codes only — raw vectors never
    re-enter the query plan, the PQ contract at 10^9 vectors). Every
    stage is integer-exact; the oracle replays the entire fit, encode
    and ADC chain bit-for-bit."""
    from ppocr_spark.functions.similarity import ivf_pq_topk

    e = _load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    return ivf_pq_topk(e, q, k=5).orderBy("query_id", "rank")


def _ann_ivf_pq_sql() -> str:
    m, d_sub = 4, 16
    adc_terms = " + ".join(
        f"list_sum(list_transform(range(1, {d_sub + 1}), d -> "
        f"(p.qrq[{j * d_sub} + d] - b{j}.cent[d]) * "
        f"(p.qrq[{j * d_sub} + d] - b{j}.cent[d])))"
        for j in range(m)
    )
    cb_joins = " ".join(
        f"JOIN pj{j}_1 b{j} ON b{j}.cl = n.code_{j}" for j in range(m)
    )
    return f"""
WITH {_pq_cte()},
probes AS (
  SELECT vec_id AS qid, cl FROM (
    SELECT e.vec_id, c.cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_KMF_D_OF.format(c='c.cent')}, c.cl)
             AS rn
    FROM e6 e CROSS JOIN cq_1 c
    WHERE e.vec_id < 8
  ) WHERE rn <= 8
),
qres AS (
  SELECT p.qid, p.cl,
         list_transform(range(1, 65), i -> e.vq[i] - c.cent[i]) AS qrq
  FROM probes p
  JOIN e6 e ON e.vec_id = p.qid
  JOIN cq_1 c ON c.cl = p.cl
),
cand AS (
  SELECT p.qid, n.vec_id AS nid, ({adc_terms})::BIGINT AS adc
  FROM qres p
  JOIN cellcodes n ON n.cl = p.cl AND n.vec_id <> p.qid
  {cb_joins}
)
SELECT qid AS query_id, nid AS neighbor_id, adc AS adc_dist_q, rank FROM (
  SELECT qid, nid, adc,
         row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rank
  FROM cand
) WHERE rank <= 5 ORDER BY query_id, rank
"""


def _dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at its real operating point (library
    similarity.semantic_dedup_fine): fine-quantizer k-means cells
    (k=256 ≫ the coarse-k envelope) → within-cell cosine pairs only →
    connected components → keep-one. Per-cell pair cost is bounded by
    the disjoint-cell Σm² (the ``max_cell`` valve caps it at corpus
    scale; exact/None here — what the oracle checks). Oracle replays
    the integer k-means chain, the within-cell pair search, and
    recursive reachability."""
    from ppocr_spark.functions.similarity import semantic_dedup_fine

    e = _load(spark, sf_dir, "embeddings")
    return semantic_dedup_fine(
        e, threshold=0.25, n_centroids=256, iters=2, dim=64
    ).orderBy("vec_id")


def _dedup_semantic_sql() -> str:
    return f"""
WITH RECURSIVE {_kmeans_fine_cte(256, 2)},
asg AS (
  SELECT a.vec_id, v.embedding, a.cluster FROM (
    SELECT e.vec_id, c.cl AS cluster,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_KMF_D_OF.format(c='c.cent')}, c.cl)
             AS rn
    FROM e6 e CROSS JOIN cq_2 c
  ) a JOIN embeddings v ON v.vec_id = a.vec_id
  WHERE a.rn = 1
),
pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM asg x JOIN asg y
    ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  WHERE list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) /
        (sqrt(list_dot_product(x.embedding::DOUBLE[],
                               x.embedding::DOUBLE[])) *
         sqrt(list_dot_product(y.embedding::DOUBLE[],
                               y.embedding::DOUBLE[]))) >= 0.25
), edges AS (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), reach AS (
  SELECT u AS node, u AS lab FROM edges
  UNION
  SELECT e2.v, r.lab FROM reach r JOIN edges e2 ON e2.u = r.node
), cc AS (
  SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
)
SELECT v.vec_id,
       coalesce(cc.cluster_id, v.vec_id) AS cluster_id,
       v.vec_id = coalesce(cc.cluster_id, v.vec_id) AS keep
FROM embeddings v LEFT JOIN cc ON cc.node = v.vec_id
ORDER BY v.vec_id
"""


def _emb_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-scale embedding near-dup path: hyperplane-LSH bucket
    join + exact cosine verify on candidates only (the all-pairs
    dedup_embedding_cosine is the test-only recall baseline)."""
    from ppocr_spark.functions.similarity import lsh_near_dup_pairs

    e = _load(spark, sf_dir, "embeddings")
    return (
        lsh_near_dup_pairs(e, threshold=0.4, bits=6, tables=4, dim=64)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
        .orderBy("a", "b")
    )


def _emb_lsh_pairs_sql() -> str:
    tables = 4
    match = " OR ".join(f"x.b{t} = y.b{t}" for t in range(tables))
    return f"""
WITH base AS ({_lsh_sigs_cte(bits=6, tables=4, dim=64)}),
pairs AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b,
         list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(x.embedding::DOUBLE[], x.embedding::DOUBLE[])) *
          sqrt(list_dot_product(y.embedding::DOUBLE[], y.embedding::DOUBLE[]))) AS cos_raw
  FROM base x JOIN base y ON ({match}) AND x.vec_id < y.vec_id
)
SELECT a, b, round(cos_raw, 6) AS cosine FROM pairs
WHERE cos_raw >= 0.4 ORDER BY a, b
"""


def _split_leakage_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split semantic leakage audit (library
    similarity.embedding_split_leakage): per test-split vector, the
    count and max cosine of train-side near-duplicates found by the
    hyperplane-LSH path — the eval-integrity check that n-gram
    decontamination misses (paraphrase twins share no 12-gram). Pure
    composition: deterministic md5 hash_split × lsh_near_dup_pairs;
    cosines rounded BEFORE the max."""
    from ppocr_spark.functions.similarity import embedding_split_leakage

    e = _load(spark, sf_dir, "embeddings")
    return (
        embedding_split_leakage(
            e, [("train", 0.9), ("test", 0.1)],
            threshold=0.15, bits=6, tables=4, dim=64,
        )
        .select(
            F.col("eval_id").alias("vec_id"),
            "n_train_neardups",
            "max_cosine",
        )
        .orderBy("vec_id")
    )


def _split_leakage_embedding_sql() -> str:
    from ppocr_spark.functions.sampling import split_thresholds

    ths = split_thresholds([("train", 0.9), ("test", 0.1)])
    h4 = "substr(md5(concat('split:', vec_id::VARCHAR)), 1, 4)"
    arms = "\n".join(
        f"  WHEN {h4} < '{upper}' THEN '{name}'"
        for name, upper in ths[:-1]
    )
    tables = 4
    match = " OR ".join(f"x.b{t} = y.b{t}" for t in range(tables))
    return f"""
WITH base AS ({_lsh_sigs_cte(bits=6, tables=4, dim=64)}),
pairs AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b,
         list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) /
         (sqrt(list_dot_product(x.embedding::DOUBLE[],
                                x.embedding::DOUBLE[])) *
          sqrt(list_dot_product(y.embedding::DOUBLE[],
                                y.embedding::DOUBLE[]))) AS cos_raw
  FROM base x JOIN base y ON ({match}) AND x.vec_id < y.vec_id
),
sp AS (
  SELECT vec_id, CASE
{arms}
    ELSE '{ths[-1][0]}' END AS split
  FROM embeddings
),
leak AS (
  SELECT CASE WHEN sa.split = 'test' THEN p.a ELSE p.b END AS vec_id,
         round(p.cos_raw, 6) AS cos_r
  FROM pairs p
  JOIN sp sa ON sa.vec_id = p.a
  JOIN sp sb ON sb.vec_id = p.b
  WHERE p.cos_raw >= 0.15
    AND ((sa.split = 'test' AND sb.split = 'train')
         OR (sb.split = 'test' AND sa.split = 'train'))
)
SELECT vec_id, count(*)::BIGINT AS n_train_neardups,
       max(cos_r) AS max_cosine
FROM leak GROUP BY vec_id ORDER BY vec_id
"""


def _embeddings_class_separation(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Pairwise class-centroid separation matrix (library
    similarity.class_separation): the between-class separability
    report behind knn_classify / cluster-purity claims. Quantized
    int64 sums, truncating-DIV centroids (Spark DIV ≡ DuckDB //
    including negatives — both truncate toward zero), exact-isqrt
    distance in micro-coordinate units."""
    from ppocr_spark.functions.similarity import class_separation

    e = _load(spark, sf_dir, "embeddings")
    return class_separation(e).orderBy("label_a", "label_b")


_CLASS_SEPARATION_SQL = """
WITH q AS (
  SELECT label AS lab,
         list_transform(embedding,
                        x -> round(x::DOUBLE * 1000000)::BIGINT) AS qv
  FROM embeddings
), per AS (
  SELECT lab, pos, sum(v)::BIGINT AS s
  FROM (SELECT lab, generate_subscripts(qv, 1) AS pos, unnest(qv) AS v
        FROM q)
  GROUP BY 1, 2
), counts AS (
  SELECT lab, count(*)::BIGINT AS n FROM q GROUP BY lab
), cent AS (
  SELECT p.lab, c.n, p.pos, p.s // c.n AS cc
  FROM per p JOIN counts c USING (lab)
), pd AS (
  SELECT x.lab AS label_a, y.lab AS label_b, x.n AS n_a, y.n AS n_b,
         sum((x.cc - y.cc) * (x.cc - y.cc))::BIGINT AS d2
  FROM cent x JOIN cent y ON x.pos = y.pos AND x.lab < y.lab
  GROUP BY 1, 2, 3, 4
), r0 AS (
  SELECT label_a, label_b, n_a, n_b, d2,
         floor(sqrt(d2::DOUBLE))::BIGINT AS f
  FROM pd
), r1 AS (
  SELECT label_a, label_b, n_a, n_b, d2,
         CASE WHEN (f + 1) * (f + 1) <= d2 THEN f + 1 ELSE f END AS f
  FROM r0
)
SELECT label_a, label_b, n_a, n_b,
       (CASE WHEN f * f > d2 THEN f - 1 ELSE f END)::BIGINT AS dist_q
FROM r1 ORDER BY label_a, label_b
"""


# --- OCR pipeline queries (our own interleaved corpus; oracle = the
# generation-time expected_spans golden parquet, read by DuckDB directly) ---


def _ocr_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.pipeline import extract_documents

    corpus = _corpus(sf_dir)
    docs = spark.read.parquet(f"{corpus}/documents_spans.parquet")
    media = spark.read.parquet(f"{corpus}/media.parquet")
    cfg = PPOCRConfig(cls=True, use_angle_cls=True)
    res = extract_documents(docs, media, cfg, broadcast_media=True)
    return res.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.order").alias("order"),
        F.col("s.code").alias("code"),
    ).orderBy("doc_id", "order")


def _ocr_extract_sql(sf_dir: str) -> str:
    corpus = _corpus(sf_dir)
    return f"""
SELECT doc_id, u.kind AS kind, u.text AS text, u.media_ref AS media_ref,
       u."order" AS "order", u.code AS code
FROM (SELECT doc_id, unnest(spans) AS u
      FROM read_parquet('{corpus}/expected_spans.parquet'))
ORDER BY doc_id, "order"
"""


def _ocr_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction-health rollup over the flagship pipeline's output:
    per (kind, status code), span count, documents touched, and total
    extracted characters — the per-run report an extraction job
    publishes next to its checkpoint manifests (a code-mix shift
    between runs flags a decode/model regression before any
    span-equality check runs). Aggregates the REAL pipeline output
    (same extract_documents call as ``ocr_extract_spans``); the oracle
    aggregates the generation-truth expected spans — so the rollup is
    one more span-sequence-equality surface, at report granularity."""
    from ppocr_spark.pipeline import extract_documents

    corpus = _corpus(sf_dir)
    docs = spark.read.parquet(f"{corpus}/documents_spans.parquet")
    media = spark.read.parquet(f"{corpus}/media.parquet")
    cfg = PPOCRConfig(cls=True, use_angle_cls=True)
    res = extract_documents(docs, media, cfg, broadcast_media=True)
    spans = res.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.code").alias("code"),
        F.length(F.coalesce(F.col("s.text"), F.lit(""))).alias("__len"),
    )
    return (
        spans.groupBy("kind", "code")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum("__len").cast("long").alias("n_chars"),
        )
        .orderBy("kind", "code")
    )


def _ocr_corpus_report_sql(sf_dir: str) -> str:
    corpus = _corpus(sf_dir)
    return f"""
SELECT u.kind AS kind, u.code AS code,
       count(*)::BIGINT AS n_spans,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       sum(length(coalesce(u.text, '')))::BIGINT AS n_chars
FROM (SELECT doc_id, unnest(spans) AS u
      FROM read_parquet('{corpus}/expected_spans.parquet'))
GROUP BY 1, 2 ORDER BY kind, code
"""


def _ocr_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 per-block payload vs generation-truth blocks (box geometry from
    the real detector at generation + assigned source text + parser end
    separators). Recognition scores are runtime-only → excluded."""
    from ppocr_spark.pipeline import ocr_blocks

    corpus = _corpus(sf_dir)
    docs = spark.read.parquet(f"{corpus}/documents_spans.parquet")
    media = spark.read.parquet(f"{corpus}/media.parquet")
    cfg = PPOCRConfig(cls=True, use_angle_cls=True)
    return (
        ocr_blocks(docs, media, cfg, broadcast_media=True)
        .select(
            "doc_id", "offset", "media_ref", "block_idx",
            F.expr(
                "concat_ws(',', transform(flatten(box), "
                "x -> cast(x as string)))"
            ).alias("box_str"),
            "text", "end",
        )
        .orderBy("doc_id", "offset", "block_idx")
    )


def _ocr_blocks_sql(sf_dir: str) -> str:
    corpus = _corpus(sf_dir)
    return f"""
SELECT s.doc_id, s."order" AS "offset", s.media_ref, b.block_idx,
       array_to_string(flatten(b.box), ',') AS box_str, b.text, b."end"
FROM (
  SELECT doc_id, u.media_ref AS media_ref, u."order" AS "order"
  FROM (SELECT doc_id, unnest(spans) AS u
        FROM read_parquet('{corpus}/expected_spans.parquet'))
  WHERE u.kind = 'media' AND u.code = 100
) s JOIN read_parquet('{corpus}/expected_blocks.parquet') b
  ON b.media_ref = s.media_ref
ORDER BY doc_id, "offset", block_idx
"""


def _image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-probe vs generation-truth dimensions/ink (identical float
    expression both sides; PNG roundtrip is lossless)."""
    from ppocr_spark.functions.multimodal import image_metadata

    corpus = _corpus(sf_dir)
    media = spark.read.parquet(f"{corpus}/media.parquet")
    return image_metadata(media).select(
        "media_ref", "width", "height", "channels", "decode_ok",
        F.round("ink_ratio", 4).alias("ink_ratio"),
    ).orderBy("media_ref")


def _image_metadata_sql(sf_dir: str) -> str:
    corpus = _corpus(sf_dir)
    return (
        "SELECT media_ref, width, height, channels, decode_ok, "
        "round(ink_ratio, 4) AS ink_ratio "
        f"FROM read_parquet('{corpus}/media_meta.parquet') ORDER BY media_ref"
    )


def _image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4x4 pooled-ink features vs generation-truth sums (identical
    float32 pooling both sides)."""
    from ppocr_spark.functions.multimodal import image_features

    corpus = _corpus(sf_dir)
    media = spark.read.parquet(f"{corpus}/media.parquet")
    feats = image_features(media, grid=4)
    return feats.select(
        "media_ref",
        F.round(
            F.aggregate("features", F.lit(0.0),
                        lambda a, x: a + x.cast("double")),
            4,
        ).alias("feat_sum"),
    ).orderBy("media_ref")


def _image_features_sql(sf_dir: str) -> str:
    corpus = _corpus(sf_dir)
    return (
        "SELECT media_ref, round(feat_sum, 4) AS feat_sum "
        f"FROM read_parquet('{corpus}/media_meta.parquet') "
        "WHERE feat_sum IS NOT NULL ORDER BY media_ref"
    )


def _audio_corpus(sf_dir: str) -> str:
    from ppocr_spark.corpus import ensure_audio_corpus

    return ensure_audio_corpus(max(40, _corpus_docs_for(sf_dir) // 2))


def _audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode-probe (from-scratch WAV/PCM codec) vs generation
    truth — the multimodal audio leg, real end to end."""
    from ppocr_spark.functions.multimodal import audio_metadata

    adir = _audio_corpus(sf_dir)
    media = spark.read.parquet(f"{adir}/audio_media.parquet")
    return audio_metadata(media).select(
        "media_ref", "sample_rate", "channels", "n_samples",
        F.round("duration_s", 6).alias("duration_s"), "decode_ok",
        F.round("rms", 6).alias("rms"),
    ).orderBy("media_ref")


def _audio_metadata_sql(sf_dir: str) -> str:
    adir = _audio_corpus(sf_dir)
    return (
        "SELECT media_ref, sample_rate, channels, n_samples, "
        "round(duration_s, 6) AS duration_s, decode_ok, "
        "round(rms, 6) AS rms "
        f"FROM read_parquet('{adir}/audio_truth.parquet') ORDER BY media_ref"
    )


def _audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed-RMS audio embedding vs generation truth (identical
    window/RMS arithmetic both sides)."""
    from ppocr_spark.functions.multimodal import audio_features

    adir = _audio_corpus(sf_dir)
    media = spark.read.parquet(f"{adir}/audio_media.parquet")
    feats = audio_features(media, n_frames=16)
    return feats.select(
        "media_ref",
        F.round(
            F.aggregate("features", F.lit(0.0),
                        lambda a, x: a + x.cast("double")),
            6,
        ).alias("feat_sum"),
        F.size("features").alias("n_frames"),
    ).orderBy("media_ref")


def _audio_features_sql(sf_dir: str) -> str:
    adir = _audio_corpus(sf_dir)
    return f"""
SELECT media_ref,
       round(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(features, x -> x::DOUBLE)), (a, b) -> a + b), 6)
           AS feat_sum,
       len(features) AS n_frames
FROM read_parquet('{adir}/audio_truth.parquet')
WHERE features IS NOT NULL ORDER BY media_ref
"""


def _video_corpus(sf_dir: str) -> str:
    from ppocr_spark.corpus import ensure_video_corpus

    return ensure_video_corpus(max(32, _corpus_docs_for(sf_dir) // 2))


def _video_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video decode-probe (from-scratch RIFF/AVI codec) vs generation
    truth — the multimodal video leg, real end to end."""
    from ppocr_spark.functions.multimodal import video_metadata

    vdir = _video_corpus(sf_dir)
    media = spark.read.parquet(f"{vdir}/video_media.parquet")
    return video_metadata(media).select(
        "media_ref", "width", "height", "n_frames",
        F.round("fps", 6).alias("fps"),
        F.round("duration_s", 6).alias("duration_s"), "decode_ok",
    ).orderBy("media_ref")


def _video_metadata_sql(sf_dir: str) -> str:
    vdir = _video_corpus(sf_dir)
    return (
        "SELECT media_ref, width, height, n_frames, round(fps, 6) AS fps, "
        "round(duration_s, 6) AS duration_s, decode_ok "
        f"FROM read_parquet('{vdir}/video_truth.parquet') ORDER BY media_ref"
    )


def _video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame mean-luma 'video embedding' vs generation truth
    (identical decode + BT.601 arithmetic both sides)."""
    from ppocr_spark.functions.multimodal import video_features

    vdir = _video_corpus(sf_dir)
    media = spark.read.parquet(f"{vdir}/video_media.parquet")
    feats = video_features(media)
    return feats.select(
        "media_ref",
        F.round(
            F.aggregate("features", F.lit(0.0),
                        lambda a, x: a + x.cast("double")),
            6,
        ).alias("feat_sum"),
        F.size("features").alias("n_frames_vec"),
    ).orderBy("media_ref")


def _video_features_sql(sf_dir: str) -> str:
    vdir = _video_corpus(sf_dir)
    return f"""
SELECT media_ref,
       round(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(features, x -> x::DOUBLE)), (a, b) -> a + b), 6)
           AS feat_sum,
       len(features) AS n_frames_vec
FROM read_parquet('{vdir}/video_truth.parquet')
WHERE features IS NOT NULL ORDER BY media_ref
"""


def _video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: every 2nd frame re-encoded as a PNG-gray thumbnail
    (AVI decode → BT.601 luma → the repo's PNG encoder), verified by md5
    against thumbnails computed independently at generation."""
    from ppocr_spark.functions.multimodal import sample_video_frames

    vdir = _video_corpus(sf_dir)
    media = spark.read.parquet(f"{vdir}/video_media.parquet")
    return sample_video_frames(media, every_n=2).select(
        "media_ref", "frame_idx", F.md5("frame").alias("frame_md5")
    ).orderBy("media_ref", "frame_idx")


def _video_frame_sample_sql(sf_dir: str) -> str:
    vdir = _video_corpus(sf_dir)
    return (
        "SELECT media_ref, frame_idx, frame_md5 "
        f"FROM read_parquet('{vdir}/video_frames.parquet') "
        "ORDER BY media_ref, frame_idx"
    )


def _semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins: customers with vs without orders,
    summarized per market segment."""
    c = _load(spark, sf_dir, "customer")
    o = _load(spark, sf_dir, "orders").select("o_custkey")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return (
        with_orders.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
        .join(
            without.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_without_orders")),
            "c_mktsegment",
            "outer",
        )
        .fillna(0, ["n_with_orders", "n_without_orders"])
        .orderBy("c_mktsegment")
    )


_SEMI_ANTI_SQL = """
WITH w AS (
  SELECT c_mktsegment, count(*) AS n_with_orders FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY 1
), wo AS (
  SELECT c_mktsegment, count(*) AS n_without_orders FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY 1
)
SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
       coalesce(n_with_orders, 0) AS n_with_orders,
       coalesce(n_without_orders, 0) AS n_without_orders
FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
ORDER BY c_mktsegment
"""


def _set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over nation keys of customers vs suppliers."""
    c = _load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = _load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    both = c.intersect(s).withColumn("src", F.lit("both"))
    conly = c.subtract(s).withColumn("src", F.lit("customer_only"))
    return both.unionByName(conly).orderBy("src", "nk")


_SET_OPS_SQL = """
SELECT nk, 'both' AS src FROM
  (SELECT c_nationkey AS nk FROM customer
   INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nk, 'customer_only' AS src FROM
  (SELECT DISTINCT c_nationkey AS nk FROM customer
   WHERE c_nationkey NOT IN (SELECT s_nationkey FROM supplier))
ORDER BY src, nk
"""


def _rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (grouping-sets) aggregation over order priority x status."""
    o = _load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("prio"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            "total",
        )
        .orderBy("prio", "status")
    )


_ROLLUP_SQL = """
SELECT coalesce(o_orderpriority, 'ALL') AS prio,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY prio, status
"""


def _events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 2^k grouping sets) over event type × day with the
    grouping_id bitmask — the OLAP companion to ROLLUP
    (`rollup_revenue`): one pass emits per-cell, per-type, per-day and
    grand totals, each row tagged with which dimensions are aggregated
    (Spark ``grouping_id()`` ≡ DuckDB ``GROUPING(a, b)``, first column
    = MSB in both). Value sums run in decimal so the 4 grouping sets
    cannot round differently; Spark plans CUBE as one Expand (k
    row-replicas) + one map-side-combined aggregate — no per-set
    rescans."""
    e = _load(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.dayofmonth("ts").cast("long").alias("d"),
            "value",
        )
        .cube("event_type", "d")
        .agg(
            F.grouping_id().cast("long").alias("gmask"),
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"),
                4,
            ).alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("d", F.lit(-1)).cast("long").alias("d"),
            "gmask",
            "n",
            "total_value",
        )
        .orderBy("event_type", "d")
    )


_EVENTS_CUBE_SQL = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(d, -1)::BIGINT AS d,
       grouping(event_type, d)::BIGINT AS gmask,
       count(*)::BIGINT AS n,
       round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS total_value
FROM (SELECT event_type, day(ts)::BIGINT AS d, value FROM events)
GROUP BY CUBE (event_type, d)
ORDER BY event_type, d
"""


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def _events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: the wide daily activity matrix (one column per event
    type) — the reshape every dashboard export needs. The pivot value
    list is EXPLICIT (the stable taxonomy), which is also the scale
    rule: with literal values Spark skips the distinct-value discovery
    job (a full extra scan + driver collect) and plans ONE scan into
    its two-level pivot aggregate (slim (d, type) partials, then the
    wide fold — both map-side combined). Missing cells surface as 0 on
    both engines (coalesce here, conditional-sum in the oracle)."""
    e = _load(spark, sf_dir, "events")
    p = (
        e.select("event_type", F.dayofmonth("ts").cast("long").alias("d"))
        .groupBy("d")
        .pivot("event_type", list(_PIVOT_TYPES))
        .count()
    )
    return p.select(
        "d",
        *[
            F.coalesce(F.col(t), F.lit(0))
            .cast("long")
            .alias(f"n_{t}")
            for t in _PIVOT_TYPES
        ],
    ).orderBy("d")


_EVENTS_PIVOT_SQL = """
SELECT day(ts)::BIGINT AS d,
       sum((event_type = 'click')::INT)::BIGINT AS n_click,
       sum((event_type = 'error')::INT)::BIGINT AS n_error,
       sum((event_type = 'purchase')::INT)::BIGINT AS n_purchase,
       sum((event_type = 'signup')::INT)::BIGINT AS n_signup,
       sum((event_type = 'view')::INT)::BIGINT AS n_view
FROM events GROUP BY 1 ORDER BY d
"""


# --- HTML boilerplate strip / DOM heuristics (north-rule text tier;
# oracle tier 1 = the same portable regex chain run by DuckDB, tier 2 =
# generation-time authored main text) ---


def _html_corpus(sf_dir: str) -> str:
    from ppocr_spark.corpus import ensure_html_corpus

    return ensure_html_corpus(_corpus_docs_for(sf_dir))


def _html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.functions.boilerplate import strip_tags_col

    hdir = _html_corpus(sf_dir)
    df = spark.read.parquet(f"{hdir}/html_docs.parquet")
    return df.select(
        "doc_id", strip_tags_col(F.col("html")).alias("stripped_text")
    ).orderBy("doc_id")


def _html_strip_sql(sf_dir: str) -> str:
    from ppocr_spark.functions.boilerplate import strip_tags_sql

    hdir = _html_corpus(sf_dir)
    return (
        f"SELECT doc_id, {strip_tags_sql('html', 'duckdb')} AS stripped_text "
        f"FROM read_parquet('{hdir}/html_docs.parquet') ORDER BY doc_id"
    )


def _html_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ppocr_spark.functions.boilerplate import main_content

    hdir = _html_corpus(sf_dir)
    df = spark.read.parquet(f"{hdir}/html_docs.parquet")
    return (
        main_content(df)
        .select("doc_id", "main_text")
        .orderBy("doc_id")
    )


def _html_main_sql(sf_dir: str) -> str:
    hdir = _html_corpus(sf_dir)
    return (
        f"SELECT doc_id, main_text "
        f"FROM read_parquet('{hdir}/html_truth.parquet') ORDER BY doc_id"
    )


# --- structure/table path (SURVEY §2.4 X1-X3; oracle = renderer ground
# truth, independent of every detector) ---


def _table_cell_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 end-to-end: pixels → grid cells + OCR blocks → nearest-cell
    relational join; oracle is the renderer's true cell assignment."""
    from ppocr_spark.operators.structure import (
        detect_cells_df,
        match_cells,
        ocr_table_blocks_df,
    )

    tdir = _table_corpus(sf_dir)
    media = spark.read.parquet(f"{tdir}/table_media.parquet")
    cells = detect_cells_df(media)
    blocks = ocr_table_blocks_df(media, PPOCRConfig())
    return (
        match_cells(blocks, cells)
        .select(
            "media_ref", "block_idx", "text",
            F.col("row").alias("cell_row"), F.col("col").alias("cell_col"),
        )
        .orderBy("media_ref", "block_idx")
    )


def _table_cell_match_sql(sf_dir: str) -> str:
    tdir = _table_corpus(sf_dir)
    return f"""
SELECT media_ref, block_idx, text, cell_row, cell_col
FROM read_parquet('{tdir}/table_blocks.parquet')
ORDER BY media_ref, block_idx
"""


def _table_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+X3 end-to-end: pixels → cells → OCR → match → HTML rebuild;
    oracle is the generation-time HTML built directly from truth."""
    from ppocr_spark.operators.structure import (
        detect_cells_df,
        match_cells,
        ocr_table_blocks_df,
        table_html_df,
    )

    tdir = _table_corpus(sf_dir)
    media = spark.read.parquet(f"{tdir}/table_media.parquet")
    cells = detect_cells_df(media)
    blocks = ocr_table_blocks_df(media, PPOCRConfig())
    return table_html_df(match_cells(blocks, cells), cells).orderBy(
        "media_ref"
    )


def _table_html_sql(sf_dir: str) -> str:
    tdir = _table_corpus(sf_dir)
    return (
        f"SELECT media_ref, html FROM "
        f"read_parquet('{tdir}/table_html.parquet') ORDER BY media_ref"
    )


def _nms_candidates(cells: DataFrame) -> DataFrame:
    """3 deterministic jittered candidates per golden cell (md5-derived
    jitter/score so the DuckDB oracle reproduces them bit-for-bit)."""

    def h16(suffix: str):
        s = F.concat_ws(
            ":", "media_ref", F.col("row"), F.col("col"), F.col("k"),
            F.lit(suffix),
        )
        return F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("long")

    cand = cells.select(
        "media_ref", "row", "col",
        F.explode(F.array(*[F.lit(k) for k in range(3)])).alias("k"),
        "x0", "y0", "x1", "y1",
    )
    return cand.select(
        "media_ref", "row", "col", "k",
        (F.col("x0") + (h16("x0") % 7 - 3)).alias("jx0"),
        (F.col("y0") + (h16("y0") % 7 - 3)).alias("jy0"),
        (F.col("x1") + (h16("x1") % 7 - 3)).alias("jx1"),
        (F.col("y1") + (h16("y1") % 7 - 3)).alias("jy1"),
        (F.lit(0.5) + (h16("s") % 100) / F.lit(250.0)).alias("score"),
    )


def _layout_nms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: REAL greedy NMS (operators.structure.nms) per image over
    deterministic jittered candidates. On this input family (per-cell
    clusters, disjoint across cells) greedy NMS provably keeps exactly the
    per-cell score argmax — which is what the SQL oracle states."""
    tdir = _table_corpus(sf_dir)
    cells = spark.read.parquet(f"{tdir}/table_cells.parquet")
    cand = _nms_candidates(cells)

    def nms_group(pdf):
        from ppocr_spark.operators.structure import nms

        pdf = pdf.sort_values(["row", "col", "k"]).reset_index(drop=True)
        boxes = pdf[["jx0", "jy0", "jx1", "jy1"]].to_numpy(dtype=float)
        keep = nms(boxes, pdf["score"].to_numpy(), 0.5)
        return pdf.iloc[keep][["media_ref", "row", "col", "k", "score"]]

    out = cand.groupBy("media_ref").applyInPandas(
        nms_group,
        schema="media_ref string, row int, col int, k int, score double",
    )
    return out.select(
        "media_ref", "row", "col", "k", F.round("score", 4).alias("score")
    ).orderBy("media_ref", "row", "col")


def _layout_nms_sql(sf_dir: str) -> str:
    tdir = _table_corpus(sf_dir)
    h = (
        "(('0x' || substr(md5(media_ref || ':' || \"row\" || ':' || col "
        "|| ':' || k || ':s'), 1, 4))::BIGINT)"
    )
    return f"""
WITH cand AS (
  SELECT media_ref, "row", col, k, 0.5 + ({h} % 100) / 250.0 AS score
  FROM read_parquet('{tdir}/table_cells.parquet'), unnest([0,1,2]) AS t(k)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY media_ref, "row", col
                               ORDER BY score DESC, k) AS rnk
  FROM cand
)
SELECT media_ref, "row", col, k, round(score, 4) AS score
FROM ranked WHERE rnk = 1 ORDER BY media_ref, "row", col
"""


# --- deterministic sampling / splitting / scrubbing (training-data ops) ---


_SPLIT_WEIGHTS = [("train", 0.9), ("val", 0.05), ("test", 0.05)]


def _sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split (library sampling.hash_split): md5-keyed
    train/val/test assignment, reproducible across engines/clusters (no
    randomSplit partition-layout dependence). Pure projection."""
    from ppocr_spark.functions.sampling import hash_split

    d = _load(spark, sf_dir, "documents")
    return hash_split(d.select("doc_id", "lang"),
                      _SPLIT_WEIGHTS).orderBy("doc_id")


def _sample_split_sql() -> str:
    from ppocr_spark.functions.sampling import split_thresholds

    ths = split_thresholds(_SPLIT_WEIGHTS)
    h4 = "substr(md5(concat('split:', doc_id::VARCHAR)), 1, 4)"
    arms = "\n".join(
        f"  WHEN {h4} < '{upper}' THEN '{name}'"
        for name, upper in ths[:-1]
    )
    return f"""
SELECT doc_id, lang, CASE
{arms}
  ELSE '{ths[-1][0]}' END AS split
FROM documents ORDER BY doc_id
"""


def _sample_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (library sampling.kfold_assign):
    md5-derived integer mod 5 — the exact-k rotation counterpart of
    the fraction-based hash split; pure projection, layout/run
    independent."""
    from ppocr_spark.functions.sampling import kfold_assign

    d = _load(spark, sf_dir, "documents")
    return kfold_assign(d.select("doc_id"), k=5).orderBy("doc_id")


_SAMPLE_KFOLD_SQL = """
SELECT doc_id,
       (('0x' || substr(md5(concat('fold:', doc_id::VARCHAR)), 1, 15))
        ::BIGINT % 5)::BIGINT AS fold
FROM documents ORDER BY doc_id
"""


_STRAT_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.75, "es": 1.0}


def _sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (library
    sampling.stratified_sample): keep iff md5(salt:lang:id) clears the
    stratum's hex threshold; strata without a fraction (zh here) drop.
    Pure filter — zero shuffles."""
    from ppocr_spark.functions.sampling import stratified_sample

    d = _load(spark, sf_dir, "documents")
    return stratified_sample(
        d.select("doc_id", "lang"), _STRAT_FRACTIONS
    ).orderBy("doc_id")


def _sample_stratified_sql() -> str:
    from ppocr_spark.functions.sampling import frac_threshold

    h4 = ("substr(md5(concat('strat:', lang, ':', doc_id::VARCHAR)), "
          "1, 4)")
    conds = " OR ".join(
        f"(lang = '{s}' AND {h4} < '{frac_threshold(f)}')"
        for s, f in sorted(_STRAT_FRACTIONS.items())
    )
    return f"SELECT doc_id, lang FROM documents WHERE {conds} ORDER BY doc_id"


def _sample_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group document cap / domain balancing (library
    sampling.source_cap, scale path): groups over the cap are hash-
    downsampled to ~cap rows via a broadcast per-group threshold —
    zero sorts, no per-group window. Grouped on ``lang`` (skewed in the
    fixture: en 218 vs 64-75 for the rest) with cap=100 so the gate
    exercises BOTH branches: en filtered, every other group passing
    whole through the ``n <= cap`` arm."""
    from ppocr_spark.functions.sampling import source_cap

    d = _load(spark, sf_dir, "documents")
    return source_cap(
        d.select("doc_id", "lang"), cap=100, group_col="lang"
    ).orderBy("doc_id")


def _sample_source_cap_sql() -> str:
    h8 = "substr(md5(concat('cap:', doc_id::VARCHAR)), 1, 8)"
    return f"""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang FROM documents d JOIN counts c USING (lang)
WHERE c.n <= 100
   OR {h8} < lower(lpad(hex((100 * 4294967296) // c.n), 8, '0'))
ORDER BY d.doc_id
"""


_TOKEN_BUDGETS = {"en": 6000, "de": 2000, "zh": 999999}


def _sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling (library
    sampling.token_budget_sample): per lang, the largest md5-ordered
    document prefix whose cumulative whitespace-token count fits the
    budget — exact, deterministic, and implemented as the two-pass
    bucketed cumulative histogram (bounded windows only; no global
    per-group sort). zh's budget exceeds its total (keep-all edge); fr/es
    have no budget (dropped)."""
    from ppocr_spark.functions.sampling import token_budget_sample

    d = _load(spark, sf_dir, "documents")
    return token_budget_sample(d, _TOKEN_BUDGETS).orderBy("doc_id")


def _sample_token_budget_sql() -> str:
    budget = "CASE lang " + " ".join(
        f"WHEN '{g}' THEN {b}" for g, b in sorted(_TOKEN_BUDGETS.items())
    ) + " END"
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         len({_DUCK_TOKS})::BIGINT AS n_toks,
         md5(concat('budget:', doc_id::VARCHAR)) AS h
  FROM documents WHERE lang IN ('en', 'de', 'zh')
), c AS (
  SELECT doc_id, lang, n_toks,
         sum(n_toks) OVER (PARTITION BY lang
                           ORDER BY substr(h, 1, 4), h, doc_id
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_toks
  FROM t
)
SELECT doc_id, lang, n_toks, cum_toks FROM c
WHERE cum_toks <= {budget} ORDER BY doc_id
"""


def _chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (library
    sampling.chunk_documents): chunk i = whitespace tokens
    [16*i, 16*i+32); windows that add no new tokens beyond the previous
    one are dropped, empty docs emit nothing. Pure per-row JVM
    sequence→filter→posexplode→slice — zero shuffles."""
    from ppocr_spark.functions.sampling import chunk_documents

    d = _load(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=32, stride=16).orderBy(
        "doc_id", "chunk_idx"
    )


def _chunk_documents_sql() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), s AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 16)) AS start
  FROM t WHERE len(toks) > 0
), kept AS (
  SELECT doc_id, toks, start,
         (row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1)::INT
           AS chunk_idx
  FROM s WHERE start = 0 OR start - 16 + 32 < len(toks)
)
SELECT doc_id, chunk_idx,
       array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text,
       len(toks[start + 1 : start + 32])::INT AS n_tokens
FROM kept ORDER BY doc_id, chunk_idx
"""


def _token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous token-count sharding (library sampling.token_shards):
    documents in md5 order, bucketed first (16 macro-buckets) so both
    windows are bounded — no global sort; shards cut every 500 cumulative
    tokens, documents never split."""
    from ppocr_spark.functions.sampling import token_shards

    d = _load(spark, sf_dir, "documents")
    return token_shards(d, shard_tokens=500, bucket_hex=1).orderBy("doc_id")


# shared CTE chain: deterministic md5 layout → cumulative-token shard
# assignment; consumed by the token_shards oracle AND the balance report
# (one definition — a layout change moves both replays or neither)
_TOKEN_SHARDS_CTE = f"""t AS (
  SELECT doc_id, len({_DUCK_TOKS})::BIGINT AS n_toks,
         md5(concat('shard:', doc_id::VARCHAR)) AS h
  FROM documents
), c AS (
  SELECT doc_id, n_toks, h, substr(h, 1, 1) AS bkt,
         ((sum(n_toks) OVER (PARTITION BY substr(h, 1, 1)
                             ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_toks)
          // 500)::BIGINT AS shard_idx
  FROM t
)"""


def _token_shards_sql() -> str:
    return f"""
WITH {_TOKEN_SHARDS_CTE}
SELECT doc_id,
       concat(bkt, ':', shard_idx::VARCHAR) AS shard_id,
       (row_number() OVER (PARTITION BY bkt, shard_idx
                           ORDER BY h, doc_id))::INT AS shard_pos,
       n_toks
FROM c ORDER BY doc_id
"""


def _token_shards_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance audit over ``token_shards`` (same 500-token target
    as the ``token_shards`` gate row): per shard, doc count, token sum,
    and signed deviation from target in integer ppm (truncating DIV is
    engine-identical on negatives — verified) — the table an export job
    reads to confirm the never-split-a-doc overshoot stays bounded by
    one document and only bucket-tail shards undershoot."""
    from ppocr_spark.functions.sampling import token_shards

    d = _load(spark, sf_dir, "documents")
    return (
        token_shards(d, shard_tokens=500, bucket_hex=1)
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("shard_toks"),
        )
        .select(
            "shard_id", "n_docs", "shard_toks",
            F.expr("(1000000 * (shard_toks - 500)) DIV 500").cast("long")
            .alias("dev_ppm"),
        )
        .orderBy("shard_id")
    )


_TOKEN_SHARDS_BALANCE_SQL = f"""
WITH {_TOKEN_SHARDS_CTE}
SELECT concat(bkt, ':', shard_idx::VARCHAR) AS shard_id,
       count(*)::BIGINT AS n_docs,
       sum(n_toks)::BIGINT AS shard_toks,
       ((1000000 * (sum(n_toks) - 500)) // 500)::BIGINT AS dev_ppm
FROM c GROUP BY bkt, shard_idx ORDER BY shard_id
"""


def _pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (library sampling.pack_sequences):
    concatenate the token stream in md5-bucketed deterministic order and
    cut every 128 tokens, splitting documents across boundaries (the
    zero-padding complement of token_shards). Pure integer window math —
    the DuckDB twin replays it bit-for-bit."""
    from ppocr_spark.functions.sampling import pack_sequences

    d = _load(spark, sf_dir, "documents")
    return pack_sequences(d, seq_len=128, bucket_hex=1).orderBy("doc_id")


_PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, len({_DUCK_TOKS})::BIGINT AS n_toks,
         md5(concat('pack:', doc_id::VARCHAR)) AS h
  FROM documents
), f AS (SELECT * FROM t WHERE n_toks > 0),
c AS (
  SELECT doc_id, n_toks, substr(h, 1, 1) AS bkt,
         ((sum(n_toks) OVER (PARTITION BY substr(h, 1, 1)
                             ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING)) - n_toks)::BIGINT
           AS start
  FROM f
)
SELECT doc_id, n_toks,
       concat(bkt, ':', (start // 128)::VARCHAR) AS seq_first,
       concat(bkt, ':', ((start + n_toks - 1) // 128)::VARCHAR) AS seq_last,
       (start % 128)::BIGINT AS offset_in_first,
       ((start + n_toks - 1) // 128 - start // 128 + 1)::BIGINT AS n_seqs
FROM c ORDER BY doc_id
"""


def _gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition filters (library
    text.gopher_repetition): per-document top-token / top-2-gram /
    duplicate-2-gram fractions in integer parts-per-million plus pass
    flags — exact integer DIV, no float round() to reconcile."""
    from ppocr_spark.functions.text import gopher_repetition

    d = _load(spark, sf_dir, "documents")
    return gopher_repetition(d).orderBy("doc_id")


_GOPHER_REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS tk FROM documents),
tc AS (
  SELECT doc_id, tok, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY doc_id, tok
),
ta AS (SELECT doc_id, max(c)::BIGINT AS top_tok, sum(c)::BIGINT AS n_toks
       FROM tc GROUP BY doc_id),
gc AS (
  SELECT doc_id, g, count(*)::BIGINT AS c
  FROM (SELECT doc_id,
               unnest(CASE WHEN len(tk) >= 2
                      THEN list_transform(range(1, len(tk)),
                                          i -> tk[i] || ' ' || tk[i+1])
                      ELSE [] END) AS g
        FROM t) GROUP BY doc_id, g
),
ga AS (SELECT doc_id, max(c)::BIGINT AS top_2gram,
              sum(c)::BIGINT AS n_2grams,
              count(*)::BIGINT AS n_2grams_distinct
       FROM gc GROUP BY doc_id),
j AS (
  SELECT t.doc_id, coalesce(ta.n_toks, 0)::BIGINT AS n_toks,
         coalesce((1000000 * top_tok)::BIGINT, 0) AS tt,
         coalesce((2000000 * top_2gram)::BIGINT, 0) AS t2,
         coalesce((1000000 * (n_2grams - n_2grams_distinct))::BIGINT, 0)
           AS d2,
         coalesce(n_2grams, 1)::BIGINT AS n2
  FROM t LEFT JOIN ta USING (doc_id) LEFT JOIN ga USING (doc_id)
)
SELECT doc_id, n_toks,
       (tt // greatest(n_toks, 1))::BIGINT AS top_token_ppm,
       (t2 // greatest(n_toks, 1))::BIGINT AS top_2gram_ppm,
       (d2 // n2)::BIGINT AS dup_2gram_ppm,
       (tt // greatest(n_toks, 1)) <= 300000 AS ok_top_token,
       (t2 // greatest(n_toks, 1)) <= 200000 AS ok_top_2gram,
       (d2 // n2) <= 600000 AS ok_dup_2gram
FROM j ORDER BY doc_id
"""


def _bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit bigram LM quality score (library text.bigram_logprob):
    mean add-one-smoothed log p(w2|w1) per document — one order up from
    the unigram CCNet stand-in; bigram formation is array-side (two
    slices zipped, no positional self-join) and the per-bigram log p is
    rounded then decimal-summed so the mean is partition-order
    independent (the unigram contract, driver-proven)."""
    from ppocr_spark.functions.text import bigram_logprob

    d = _load(spark, sf_dir, "documents")
    return (
        bigram_logprob(d)
        .select(F.col("id").alias("doc_id"), "n_bigrams", "logprob")
        .orderBy("doc_id")
    )


_BIGRAM_LOGPROB_SQL = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS l FROM documents),
vocab AS (SELECT count(DISTINCT tok) AS v
          FROM (SELECT unnest(l) AS tok FROM toks)),
bg AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
        FROM toks WHERE len(l) >= 2)
),
big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c2) AS c1 FROM big GROUP BY 1),
lp AS (
  SELECT doc_id,
         round(ln((c2 + 1)::DOUBLE / (c1 + v)::DOUBLE), 9)::DECIMAL(28,9)
           AS lp
  FROM bg JOIN big USING (w1, w2) JOIN ctx USING (w1), vocab)
SELECT doc_id, count(*) AS n_bigrams,
       round(sum(lp)::DOUBLE / count(*), 6) AS logprob
FROM lp GROUP BY doc_id ORDER BY doc_id
"""


def _bpe_cte(k: int) -> str:
    """Shared DuckDB CTE prefix replaying ``bpe.bpe_train`` bit-for-bit:
    word-frequency table → char+EOW symbol sequences → k rounds of
    (pair count, argmax with count DESC / left ASC / right ASC
    tie-break, greedy fold merge). The fold is the SAME
    separator-prefixed string reduction the Spark side runs (DuckDB
    ``list_reduce`` seeds with the first element, Spark ``aggregate``
    with '' — identical output because every element carries its own
    chr(31) prefix). Generator pattern follows ``_pq_cte``."""
    parts = [f"""toks AS (SELECT doc_id, {_DUCK_TOKS} AS l FROM documents),
words AS (SELECT tok AS word, count(*)::BIGINT AS freq
          FROM (SELECT unnest(l) AS tok FROM toks)
          WHERE NOT contains(tok, chr(31)) GROUP BY tok),
s0 AS (SELECT word, freq,
        list_append([word[i] FOR i IN range(1, length(word) + 1)],
                    '</w>') AS seq
       FROM words)"""]
    for s in range(1, k + 1):
        p = s - 1
        parts.append(f"""p{s} AS (
  SELECT pr[1] AS l, pr[2] AS r, sum(freq)::BIGINT AS c
  FROM (SELECT freq,
               unnest(list_zip(seq[1:len(seq)-1], seq[2:len(seq)])) AS pr
        FROM s{p})
  GROUP BY 1, 2),
b{s} AS (SELECT l, r, c FROM p{s} ORDER BY c DESC, l ASC, r ASC LIMIT 1),
s{s} AS (
  SELECT word, freq,
         list_filter(string_split(list_reduce(
           [chr(31) || y FOR y IN seq],
           (acc, x) -> CASE WHEN ends_with(acc, chr(31) || b{s}.l)
                             AND x = chr(31) || b{s}.r
                       THEN acc || b{s}.r ELSE acc || x END), chr(31)),
           y -> y <> '') AS seq
  FROM s{p} LEFT JOIN b{s} ON TRUE)""")
    return "WITH " + ",\n".join(parts)


_BPE_K = 8


def _bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary training (library bpe.bpe_train — Sennrich et al.
    2016): 8 merges learned over the corpus word-frequency table. Each
    row depends on the whole corpus AND all previous merges; the oracle
    replays every pair count, tie-break, and greedy fold merge
    bit-for-bit in generated CTE stages. Scale shape: one corpus pass
    builds (word, freq); each step is a vocabulary-sized aggregate plus
    a ONE-row driver sync (the Lloyd-iteration pattern)."""
    from ppocr_spark.functions.bpe import bpe_train

    d = _load(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, n_merges=_BPE_K)
    return merges.orderBy("merge_idx")


_BPE_MERGES_SQL = _bpe_cte(_BPE_K) + "\n" + " UNION ALL ".join(
    f"SELECT {s}::BIGINT AS merge_idx, l AS left, r AS right, "
    f"c AS pair_count FROM b{s}"
    for s in range(1, _BPE_K + 1)
) + " ORDER BY merge_idx"


def _bpe_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-BPE application (library bpe.bpe_segment): the exploded
    token stream equi-joins the vocabulary-sized segmentation table and
    reassembles per-document (n_tokens, n_symbols, stream_md5) — the
    md5 fingerprints the full space-joined symbol stream in token
    order, so one flipped merge anywhere changes every affected doc's
    hash. String-exact across engines."""
    from ppocr_spark.functions.bpe import bpe_segment, bpe_train

    d = _load(spark, sf_dir, "documents")
    _, seqs = bpe_train(d, n_merges=_BPE_K)
    return bpe_segment(d, seqs).orderBy("doc_id")


_BPE_SEGMENT_SQL = _bpe_cte(_BPE_K) + f""",
seg AS (
  SELECT t.doc_id, t.pos, s{_BPE_K}.seq
  FROM (SELECT doc_id, unnest(l) AS word,
               generate_subscripts(l, 1) AS pos
        FROM toks) t
  JOIN s{_BPE_K} ON s{_BPE_K}.word = t.word)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       sum(len(seq))::BIGINT AS n_symbols,
       md5(string_agg(array_to_string(seq, ' '), ' ' ORDER BY pos))
         AS stream_md5
FROM seg GROUP BY doc_id ORDER BY doc_id
"""


def _chunk_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (library sampling.chunk_cdc): stateless
    Rabin/FastCDC-family boundaries — cut after char i iff md5 of the
    8-char gram ending at i ends in hex '0' — plus the cross-corpus
    duplicate count per chunk hash (the sub-document dedup primitive).
    All boundary/slice/hash work is per-row JVM HOFs (zero shuffle);
    the dup count is one groupBy on uniform md5 keys. md5 is
    byte-identical across engines, so the oracle is string-exact with
    no numeric contract at all."""
    from ppocr_spark.functions.sampling import chunk_cdc

    d = _load(spark, sf_dir, "documents")
    return chunk_cdc(d, window=8).orderBy("doc_id", "chunk_idx")


_CHUNK_CDC_SQL = """
WITH base AS (
  SELECT doc_id, text, length(text) AS n,
    CASE WHEN length(text) > 8 THEN
      [i FOR i IN range(8, length(text))
         IF substr(md5(substr(text, i - 7, 8)), 32, 1) = '0']
    ELSE [] END AS bnds
  FROM documents WHERE length(text) >= 1
), ext AS (
  SELECT doc_id, text,
         list_prepend(1, [b + 1 FOR b IN bnds]) AS starts,
         list_append(bnds, n::BIGINT) AS ends
  FROM base
), ch AS (
  SELECT doc_id, j - 1 AS chunk_idx, starts[j]::BIGINT AS start,
         (ends[j] - starts[j] + 1)::BIGINT AS len,
         md5(substr(text, starts[j]::INT,
                    (ends[j] - starts[j] + 1)::INT)) AS chunk_md5
  FROM (SELECT *, unnest(range(1, len(starts) + 1)) AS j FROM ext)
)
SELECT doc_id, chunk_idx, start, len, chunk_md5,
       count(*) OVER (PARTITION BY chunk_md5) AS n_dups_corpus
FROM ch ORDER BY doc_id, chunk_idx
"""


_BM25_TERMS = ["hash", "stream", "vector"]


def _bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 corpus search (library search.bm25_topk): top-15 documents
    for a 3-term query. Tokens are filtered to the query terms BEFORE the
    shuffle, corpus constants and per-term document frequencies broadcast,
    per-term partials rounded then decimal-summed (order-independent),
    top-k via TakeOrderedAndProject. Oracle reproduces the identical
    expression tree."""
    from ppocr_spark.functions.search import bm25_topk

    d = _load(spark, sf_dir, "documents")
    return bm25_topk(d, _BM25_TERMS, k=15).orderBy("rank")


def _bm25_topk_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(_BM25_TERMS)))
    return f"""
WITH d AS (
  SELECT doc_id AS id, {_DUCK_TOKS} AS toks FROM documents
), dd AS (
  SELECT id, len(toks)::BIGINT AS dl, toks FROM d
), consts AS (
  SELECT count(*)::BIGINT AS n_docs,
         (sum(dl)::DOUBLE / count(*)) AS avgdl
  FROM dd
), tf AS (
  SELECT id, dl, term, count(*)::DOUBLE AS tf
  FROM (SELECT id, dl,
               unnest(list_filter(toks, t -> t IN ({terms}))) AS term
        FROM dd)
  GROUP BY id, dl, term
), dfreq AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), parts AS (
  SELECT id,
         round(tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
               * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)),
               9)::DECIMAL(38,9) AS part
  FROM tf JOIN dfreq USING (term) CROSS JOIN consts
), sc AS (
  SELECT id, sum(part) AS dscore FROM parts GROUP BY id
)
SELECT id, round(dscore::DOUBLE, 6) AS score,
       (row_number() OVER (ORDER BY dscore DESC, id ASC))::INT AS rank
FROM sc ORDER BY dscore DESC, id ASC LIMIT 15
"""


def _tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction (library search.tfidf_topk_terms):
    top-3 terms by (tf/dl)·ln(N/df), rounded scores rank with term-asc
    ties. One corpus shuffle + a vocabulary-bounded df table."""
    from ppocr_spark.functions.search import tfidf_topk_terms

    d = _load(spark, sf_dir, "documents")
    return tfidf_topk_terms(d, k=3).orderBy("id", "rank")


def _tfidf_terms_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id AS id, {_DUCK_TOKS} AS toks FROM documents
), dd AS (
  SELECT id, len(toks)::DOUBLE AS dl, toks FROM d
), nd AS (
  SELECT count(*)::DOUBLE AS n_docs FROM dd
), tf AS (
  SELECT id, dl, term, count(*)::DOUBLE AS tfv
  FROM (SELECT id, dl, unnest(toks) AS term FROM dd)
  GROUP BY id, dl, term
), dfreq AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
), scored AS (
  SELECT id, term, tfv::BIGINT AS tfc,
         round((tfv / dl) * ln(n_docs / df), 9) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
), ranked AS (
  SELECT id, term, tfc, score,
         row_number() OVER (PARTITION BY id
                            ORDER BY score DESC, term ASC) AS rnk
  FROM scored
)
SELECT id, term, tfc AS tf, score, rnk::INT AS rank
FROM ranked WHERE rnk <= 3 ORDER BY id, rank
"""


def _pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (library text.pii_scrub/pii_counts): per-row JVM
    regexp chain over the Java∩RE2 pattern subset. The corpus text carries
    no PII, so the query injects deterministic synthetic emails / phones /
    IPs derived from doc_id — identically on both engines — then counts
    and scrubs them."""
    from ppocr_spark.functions.text import pii_counts, pii_scrub

    d = _load(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1"),
    )
    base = d.select("doc_id", injected.alias("txt"))
    counts = pii_counts(F.col("txt"))
    return base.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ipv4"].alias("n_ipv4"),
        pii_scrub(F.col("txt")).alias("clean_text"),
    ).orderBy("doc_id")


def _pii_scrub_sql() -> str:
    from ppocr_spark.functions.text import PII_EMAIL, PII_IPV4, PII_PHONE

    scrub = "txt"
    for pat, repl in ((PII_EMAIL, "<EMAIL>"), (PII_PHONE, "<PHONE>"),
                      (PII_IPV4, "<IP>")):
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return f"""
WITH inj AS (
  SELECT doc_id,
         concat(text, ' contact user', doc_id::VARCHAR,
                '@example.com or +1-555-',
                lpad((doc_id % 10000)::VARCHAR, 4, '0'),
                ' from 10.', (doc_id % 256)::VARCHAR, '.0.1') AS txt
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(txt, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(txt, '{PII_PHONE}')) AS n_phones,
       len(regexp_extract_all(txt, '{PII_IPV4}')) AS n_ipv4,
       {scrub} AS clean_text
FROM inj ORDER BY doc_id
"""


def _emb_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTER formation: hyperplane-LSH pair finding
    (the scale path: exploded (table,bucket) equi-join + exact verify)
    composed with distributed connected components + keep-one policy —
    the full embedding-dedup stage in one plan. Oracle: DuckDB recursive
    reachability over the identical LSH pair list."""
    from ppocr_spark.functions.dedup import dedup_representatives
    from ppocr_spark.functions.similarity import lsh_near_dup_pairs

    e = _load(spark, sf_dir, "embeddings")
    pairs = lsh_near_dup_pairs(e, threshold=0.4, bits=6, tables=4, dim=64)
    return (
        dedup_representatives(pairs, e, id_col="vec_id")
        .withColumnRenamed("doc_id", "vec_id")
        .orderBy("vec_id")
    )


def _emb_clusters_sql() -> str:
    tables = 4
    match = " OR ".join(f"x.b{t} = y.b{t}" for t in range(tables))
    return f"""
WITH RECURSIVE base AS ({_lsh_sigs_cte(bits=6, tables=4, dim=64)}),
pairs AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM base x JOIN base y ON ({match}) AND x.vec_id < y.vec_id
  WHERE list_dot_product(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) /
        (sqrt(list_dot_product(x.embedding::DOUBLE[],
                               x.embedding::DOUBLE[])) *
         sqrt(list_dot_product(y.embedding::DOUBLE[],
                               y.embedding::DOUBLE[]))) >= 0.4
), edges AS (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), reach AS (
  SELECT u AS node, u AS lab FROM edges
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
), cc AS (
  SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
)
SELECT v.vec_id,
       coalesce(cc.cluster_id, v.vec_id) AS cluster_id,
       v.vec_id = coalesce(cc.cluster_id, v.vec_id) AS keep
FROM embeddings v LEFT JOIN cc ON cc.node = v.vec_id
ORDER BY v.vec_id
"""


def _unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit unigram LM quality signal (library
    text.unigram_logprob): mean add-one-smoothed log-prob per document —
    the CCNet-style perplexity filter stand-in. Per-token log p is
    rounded then decimal-summed, so the mean is partition-order
    independent and the oracle reproduces it exactly."""
    from ppocr_spark.functions.text import unigram_logprob

    d = _load(spark, sf_dir, "documents")
    return (
        unigram_logprob(d)
        .select(F.col("id").alias("doc_id"), "n_toks", "logprob")
        .orderBy("doc_id")
    )


_UNIGRAM_LOGPROB_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents),
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c)::DOUBLE + count(*)::DOUBLE AS denom FROM vocab),
lp AS (
  SELECT doc_id,
         round(ln((c + 1)::DOUBLE / denom), 9)::DECIMAL(28,9) AS lp
  FROM toks JOIN vocab USING (tok), tot)
SELECT doc_id, count(*) AS n_toks,
       round(sum(lp)::DOUBLE / count(*), 6) AS logprob
FROM lp GROUP BY doc_id ORDER BY doc_id
"""


def _stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming exact dedup run END-TO-END through the real
    streaming machinery (library streaming.stream_distinct_content:
    file-source readStream → dropDuplicatesWithinWatermark state →
    availableNow drain → memory sink) over the static fixture. Output
    columns are functions of CONTENT only, so the value set is
    independent of arrival order / file splits / batch boundaries and a
    plain DISTINCT oracle hash-matches it — streaming gets a
    value-checked gate row, not just a rows-only one."""
    from ppocr_spark.streaming.stream import stream_distinct_content

    return stream_distinct_content(
        spark, f"{sf_dir}/documents.parquet"
    ).orderBy("content_key")


_STREAM_DEDUP_EXACT_SQL = """
SELECT DISTINCT md5(text) AS content_key, n_chars
FROM documents ORDER BY content_key
"""


def _stream_dedup_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second VALUE-checked streaming row (library
    streaming.stream_distinct_signatures): the near-dup path's
    value-checkable projection — each arriving doc maps to its full
    8-permutation MinHash signature BEFORE the stateful dedup, and the
    drained set of distinct signatures (the strictest all-band LSH
    collision level) is arrival-order independent because the emitted
    column IS the dedup key. Oracle: plain DISTINCT over the identical
    portable signature expression."""
    from ppocr_spark.streaming.stream import stream_distinct_signatures

    return stream_distinct_signatures(
        spark, f"{sf_dir}/documents.parquet", k=8, n=3
    ).orderBy("sig_key")


_STREAM_DEDUP_SIG_SQL = f"""
WITH base AS (SELECT doc_id AS id, {_DUCK_GRAMS} AS grams
              FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents))
SELECT DISTINCT array_to_string({_minhash_sig('duck')}, '|') AS sig_key
FROM base WHERE len(grams) > 0 ORDER BY sig_key
"""


def _stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third VALUE-checked streaming row (library
    streaming.stream_sessionize): native ``F.session_window``
    aggregation — a genuinely different stateful operator from the two
    dropDuplicates rows. Session membership is a function of event time
    only (Spark merges overlapping windows whatever the arrival order),
    and the complete-mode availableNow drain emits the aggregation over
    the whole fixture, so a window-function oracle hash-matches it.
    Boundary rule pinned here: an exact 2 h difference starts a NEW
    session (Spark merges only strictly-overlapping windows), hence the
    oracle's ``< 7200000000`` merge condition — the complement of the
    batch ``events_sessionize``'s ``>`` rule."""
    from ppocr_spark.streaming.stream import stream_sessionize

    return stream_sessionize(
        spark, f"{sf_dir}/events.parquet", gap="2 hours"
    ).orderBy("user_id", "session_start")


def _stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth VALUE-checked streaming row (library
    streaming.stream_windowed_counts): tumbling event-time window
    aggregation — window membership is event-time-only with no merging,
    so the complete-mode drain equals the batch aggregation exactly.
    Spark's tumbling windows are epoch-aligned; the oracle buckets by
    epoch_us DIV 3600000000 and rebuilds the window start with
    make_timestamp(bucket*width)."""
    from ppocr_spark.streaming.stream import stream_windowed_counts

    return stream_windowed_counts(
        spark, f"{sf_dir}/events.parquet", width="1 hour"
    ).orderBy("event_type", "window_start")


_STREAM_WINDOWED_SQL = """
SELECT event_type,
       strftime(make_timestamp((epoch_us(ts) // 3600000000)
                               * 3600000000),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_events,
       round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS total_value
FROM events GROUP BY 1, 2 ORDER BY event_type, window_start
"""


_STREAM_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts)
                   - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts)
                   < 7200000000
              THEN 0 ELSE 1 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(CAST(value AS DECIMAL(18,6)))::DOUBLE, 4) AS total_value
FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_start
"""


def _quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality tiers (library text.quality_tiers): corpus
    split into equal-mass tiers by unigram-LM logprob — tier 0 is the
    high-perplexity "tail", the top tier the "head" a training mix
    upsamples. Boundaries are one slim exact-percentile aggregate
    attached as a 1-row broadcast constant (no global sort); Spark
    percentile and DuckDB quantile_cont interpolate identically over the
    same decimal-exact scores, so tiers match bit-for-bit."""
    from ppocr_spark.functions.text import quality_tiers

    d = _load(spark, sf_dir, "documents")
    return (
        quality_tiers(d, n_tiers=3)
        .select(F.col("id").alias("doc_id"), "n_toks", "logprob", "tier")
        .orderBy("doc_id")
    )


_QUALITY_TIERS_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents),
vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT sum(c)::DOUBLE + count(*)::DOUBLE AS denom FROM vocab),
lp AS (
  SELECT doc_id,
         round(ln((c + 1)::DOUBLE / denom), 9)::DECIMAL(28,9) AS lp
  FROM toks JOIN vocab USING (tok), tot),
scored AS (
  SELECT doc_id, count(*) AS n_toks,
         round(sum(lp)::DOUBLE / count(*), 6) AS logprob
  FROM lp GROUP BY doc_id),
b AS (SELECT quantile_cont(logprob, {1 / 3!r}) AS b0,
             quantile_cont(logprob, {2 / 3!r}) AS b1 FROM scored)
SELECT doc_id, n_toks, logprob,
       (CASE WHEN logprob <= b0 THEN 0
             WHEN logprob <= b1 THEN 1
             ELSE 2 END)::INT AS tier
FROM scored CROSS JOIN b ORDER BY doc_id
"""


def _substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup applied as a transformation (library
    dedup.substring_rewrite): every maximal duplicated 12-token span is
    cut from the text (the ExactSubstr remove-all-copies policy), tokens
    re-joined. The oracle rebuilds the cleaned text with the identical
    span set computed on gram strings."""
    from ppocr_spark.functions.dedup import substring_rewrite

    d = _load(spark, sf_dir, "documents")
    return (
        substring_rewrite(d, k=12)
        .select(F.col("id").alias("doc_id"), "clean_text", "n_removed")
        .orderBy("doc_id")
    )


_SUBSTRING_REWRITE_SQL = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
grams AS (
  SELECT doc_id, pos, array_to_string(t[pos:pos+11], ' ') AS g
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 10)) AS pos
        FROM toks WHERE len(t) >= 12)
),
freq AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
dup AS (SELECT doc_id, pos - 1 AS pos FROM grams JOIN freq USING (g)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                   OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 12
              THEN 1 ELSE 0 END AS brk
  FROM dup),
isl2 AS (SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM isl),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 12 AS e
  FROM isl2 GROUP BY doc_id, island),
sp AS (SELECT doc_id, list(s ORDER BY s) AS ss, list(e ORDER BY s) AS ee
       FROM spans GROUP BY doc_id),
cut AS (
  SELECT d.doc_id, d.t,
         [d.t[i] FOR i IN range(1, len(d.t) + 1)
          IF len(list_filter(coalesce(sp.ss, []),
                             (s, j) -> i - 1 >= s
                                   AND i - 1 < coalesce(sp.ee, [])[j])) = 0
         ] AS kept
  FROM toks d LEFT JOIN sp USING (doc_id))
SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS clean_text,
       (len(t) - len(kept))::BIGINT AS n_removed
FROM cut ORDER BY doc_id
"""


def _quality_model_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed GD step of the distilled quality probe (library
    quality_model.gd_step): squared-loss linear regression of the
    rule-gate label on [1, tokens/100, chars/1000, dup2] from literal
    init weights. Gradient terms are rounded then DECIMAL-summed —
    order-independent across partials — so DuckDB reproduces the step
    bit-for-bit (the ivf_topk device). The aggregation runs on Spark;
    only the 4-float gradient reaches the driver."""
    from ppocr_spark.functions.quality_model import (
        FEATURE_NAMES,
        INIT_WEIGHTS,
        doc_features,
        gate_label,
        gd_step,
    )

    d = _load(spark, sf_dir, "documents")
    feats = d.select(
        doc_features(F.col("text")).alias("x"),
        gate_label(F.col("text")).alias("y"),
    )
    grad, w1 = gd_step(feats, list(INIT_WEIGHTS), lr=0.5)
    rows = [
        (j, FEATURE_NAMES[j], float(grad[j]), float(w1[j]))
        for j in range(len(FEATURE_NAMES))
    ]
    return spark.createDataFrame(
        rows, "j int, feature string, grad double, w_new double"
    )


def _quality_model_step_sql() -> str:
    from ppocr_spark.functions.quality_model import (
        FEATURE_NAMES,
        INIT_WEIGHTS,
    )

    w = [repr(float(v)) for v in INIT_WEIGHTS]
    names = ", ".join(f"'{n}'" for n in FEATURE_NAMES)
    dup2 = _DUCK_DUP2
    return f"""
WITH f AS (
  SELECT length(text)::DOUBLE AS n_chars,
         len(t)::DOUBLE / 100.0 AS x1,
         length(text)::DOUBLE / 1000.0 AS x2,
         {dup2} AS dup2
  FROM (SELECT text, {_DUCK_TOKS} AS t FROM documents)
), r AS (
  SELECT ((((0.0 + 1.0 * ({w[0]})) + x1 * ({w[1]}))
           + x2 * ({w[2]})) + dup2 * ({w[3]}))
         - (CASE WHEN n_chars >= 100 AND dup2 < 0.05
                 THEN 1.0 ELSE 0.0 END) AS resid,
         [1.0, x1, x2, dup2] AS x
  FROM f
), terms AS (
  SELECT u.j - 1 AS j,
         round(resid * x[u.j], 9)::DECIMAL(28,9) AS t
  FROM r, unnest([1, 2, 3, 4]) AS u(j)
), g AS (
  SELECT j, (2.0 * sum(t)::DOUBLE) / count(*) AS grad FROM terms GROUP BY j
)
SELECT j, ([{names}])[j + 1] AS feature, grad,
       ([{w[0]}, {w[1]}, {w[2]}, {w[3]}])[j + 1] - 0.5 * grad AS w_new
FROM g ORDER BY j
"""


# dup-2gram feature SQL — shared by the quality_model_step oracle AND the
# quality_probe_calibration oracle (the calibration replay must track any
# feature-definition change, or the two rows split-brain)
_DUCK_DUP2 = (
    "CASE WHEN len(t) < 2 THEN 0.0 ELSE "
    "round(1 - len(list_distinct([array_to_string(t[i:i+1], ' ') "
    "FOR i IN range(1, len(t))])) / (len(t) - 1), 6) END"
)


def _quality_probe_calibration(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Calibration table of the distilled quality probe: score deciles
    vs the rule-gate teacher's actual pass rate — the reliability
    diagram a pipeline publishes before replacing the rule gate with
    the learned scorer (a well-calibrated probe's pass_ppm climbs
    monotonically with the decile). Probe = ONE deterministic GD step
    from the literal init (the ``quality_model_step`` contract — the
    oracle replays training AND scoring bit-for-bit; every float op
    has a fixed association order). Deciles are exact integer buckets
    of the 6-dp-rounded score (decimal lift, no float×10 floor
    hazard); pass rates are integer ppm."""
    from ppocr_spark.functions.quality_model import (
        INIT_WEIGHTS,
        doc_features,
        gate_label,
        gd_step,
        score_docs,
    )

    d = _load(spark, sf_dir, "documents")
    feats = d.select(
        doc_features(F.col("text")).alias("x"),
        gate_label(F.col("text")).alias("y"),
    )
    _, w1 = gd_step(feats, list(INIT_WEIGHTS), lr=0.5)
    scored = score_docs(d, [float(v) for v in w1]).join(
        d.select("doc_id", gate_label(F.col("text")).alias("__y")),
        "doc_id",
    )
    return (
        scored.select(
            F.expr(
                "least(9, cast(cast(round(quality_score, 6) as"
                " decimal(18,6)) * 1000000 as bigint) div 100000)"
            ).cast("long").alias("decile"),
            "__y",
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__y").cast("long").alias("n_pass"),
        )
        .select(
            "decile", "n_docs", "n_pass",
            F.expr("(1000000 * n_pass) DIV n_docs").cast("long")
            .alias("pass_ppm"),
        )
        .orderBy("decile")
    )


def _quality_probe_calibration_sql() -> str:
    from ppocr_spark.functions.quality_model import INIT_WEIGHTS

    w = [repr(float(v)) for v in INIT_WEIGHTS]
    dup2 = _DUCK_DUP2
    return f"""
WITH f AS (
  SELECT doc_id, length(text)::DOUBLE AS n_chars,
         len(t)::DOUBLE / 100.0 AS x1,
         length(text)::DOUBLE / 1000.0 AS x2,
         {dup2} AS dup2
  FROM (SELECT doc_id, text, {_DUCK_TOKS} AS t FROM documents)
), r AS (
  SELECT doc_id, x1, x2, dup2,
         ((((0.0 + 1.0 * ({w[0]})) + x1 * ({w[1]}))
           + x2 * ({w[2]})) + dup2 * ({w[3]}))
         - (CASE WHEN n_chars >= 100 AND dup2 < 0.05
                 THEN 1.0 ELSE 0.0 END) AS resid,
         CASE WHEN n_chars >= 100 AND dup2 < 0.05
              THEN 1 ELSE 0 END AS y,
         [1.0, x1, x2, dup2] AS x
  FROM f
), terms AS (
  SELECT u.j - 1 AS j, round(resid * x[u.j], 9)::DECIMAL(28,9) AS t
  FROM r, unnest([1, 2, 3, 4]) AS u(j)
), g AS (
  SELECT j, (2.0 * sum(t)::DOUBLE) / count(*) AS grad FROM terms GROUP BY j
), wt AS (
  SELECT list(([{w[0]}, {w[1]}, {w[2]}, {w[3]}])[j + 1] - 0.5 * grad
              ORDER BY j) AS wl
  FROM g
), scored AS (
  SELECT r.doc_id, r.y,
         round(greatest(0.0, least(1.0,
           (((0.0 + 1.0 * wl[1]) + r.x1 * wl[2])
            + r.x2 * wl[3]) + r.dup2 * wl[4])), 6) AS s
  FROM r, wt
), dec AS (
  SELECT least(9, ((round(s, 6)::DECIMAL(18,6) * 1000000)::BIGINT)
                  // 100000)::BIGINT AS decile, y
  FROM scored
)
SELECT decile, count(*)::BIGINT AS n_docs, sum(y)::BIGINT AS n_pass,
       ((1000000 * sum(y)) // count(*))::BIGINT AS pass_ppm
FROM dec GROUP BY decile ORDER BY decile
"""


def _sample_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (library sampling.mix_sources,
    scale path): a 200-document budget allocated across sources
    proportionally to exact-integer sqrt(group size) (α=1/2 smoothing,
    The Pile / XLM-R style), each group keeping its deterministic
    hash-threshold share — zero sorts, quota table broadcast."""
    from ppocr_spark.functions.sampling import mix_sources

    d = _load(spark, sf_dir, "documents")
    return mix_sources(
        d.select("doc_id", "source"), budget=200, group_col="source"
    ).orderBy("doc_id")


def _sample_mix_sources_sql() -> str:
    h8 = "substr(md5(concat('mix:', doc_id::VARCHAR)), 1, 8)"
    return f"""
WITH c AS (SELECT source, count(*)::BIGINT AS n FROM documents
           GROUP BY source),
w0 AS (SELECT source, n, floor(sqrt(n::DOUBLE))::BIGINT AS f FROM c),
w1 AS (SELECT source, n,
              CASE WHEN (f + 1) * (f + 1) <= n THEN f + 1 ELSE f END AS f
       FROM w0),
w AS (SELECT source, n, CASE WHEN f * f > n THEN f - 1 ELSE f END AS wt
      FROM w1),
tot AS (SELECT sum(wt)::BIGINT AS tw FROM w),
q AS (SELECT source, n, least(n, (200 * wt) // tw)::BIGINT AS qt
      FROM w, tot)
SELECT d.doc_id, d.source FROM documents d JOIN q USING (source)
WHERE q.n <= q.qt
   OR {h8} < lower(lpad(hex((q.qt * 4294967296) // q.n), 8, '0'))
ORDER BY d.doc_id
"""


def _text_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (library text.dsir_weights — Xie et al.
    2023): hashed unigram+bigram features (4096 buckets, portable md5
    bucket hash), target distribution fit on the lang='en' slice, raw on
    the whole corpus; per-document score = Σ count × delta in exact
    integer nano-units (the only float op is the driver-proven
    round(ln, 9))."""
    from ppocr_spark.functions.text import dsir_weights

    d = _load(spark, sf_dir, "documents")
    return (
        dsir_weights(d, target=F.col("lang") == "en", buckets=4096)
        .select(F.col("id").alias("doc_id"), "n_features", "dsir_nano")
        .orderBy("doc_id")
    )


_DSIR_SQL = f"""
WITH toks AS (SELECT doc_id, (lang = 'en') AS tgt, {_DUCK_TOKS} AS l
              FROM documents),
feats AS (
  SELECT doc_id, tgt,
         unnest(list_concat(l,
           CASE WHEN len(l) >= 2
                THEN list_transform(range(1, len(l)),
                                    i -> l[i] || ' ' || l[i+1])
                ELSE [] END)) AS f
  FROM toks),
fb AS (SELECT doc_id, tgt,
              ('0x' || substr(md5(f), 1, 15))::BIGINT % 4096 AS b
       FROM feats),
grp AS (SELECT doc_id, tgt, b, count(*)::BIGINT AS c
        FROM fb GROUP BY 1, 2, 3),
dist AS (SELECT b, sum(c)::BIGINT AS cq,
                sum(CASE WHEN tgt THEN c ELSE 0 END)::BIGINT AS ct
         FROM grp GROUP BY b),
tot AS (SELECT sum(cq)::BIGINT AS tq, sum(ct)::BIGINT AS tt FROM dist),
delta AS (
  SELECT b,
         ((round(ln((ct + 1)::DOUBLE / (tt + 4096)::DOUBLE), 9)
             ::DECIMAL(28,9)
           - round(ln((cq + 1)::DOUBLE / (tq + 4096)::DOUBLE), 9)
             ::DECIMAL(28,9)) * 1000000000)::BIGINT AS d
  FROM dist, tot)
SELECT doc_id, sum(c)::BIGINT AS n_features,
       sum(c * d)::BIGINT AS dsir_nano
FROM grp JOIN delta USING (b)
GROUP BY doc_id ORDER BY doc_id
"""


def _decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (library dedup.bloom_decontaminate):
    benchmark 12-grams (doc_id % 20 == 0 stand-in) set 3 salted bits in
    a 2^20-bit filter; corpus documents are flagged by grams whose bits
    are ALL set. The corpus side never shuffles — the set-bit table
    broadcasts. False positives are the filter's own and the oracle
    replays them bit-for-bit."""
    from ppocr_spark.functions.dedup import bloom_decontaminate

    d = _load(spark, sf_dir, "documents")
    return (
        bloom_decontaminate(
            d.filter(F.col("doc_id") % 20 != 0),
            d.filter(F.col("doc_id") % 20 == 0),
            m_bits=1 << 20,
            k_hashes=3,
            k=12,
        )
        .select(
            F.col("id").alias("doc_id"), "n_grams", "n_hits", "contaminated"
        )
        .orderBy("doc_id")
    )


def _decontaminate_bloom_sql() -> str:
    pos = ", ".join(
        f"('0x' || substr(md5('{j}:' || g), 1, 15))::BIGINT % {1 << 20}"
        for j in range(3)
    )
    return f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
pg AS (SELECT DISTINCT array_to_string(t[pos:pos+11], ' ') AS g
       FROM (SELECT t, unnest(range(1, len(t) - 10)) AS pos
             FROM toks WHERE len(t) >= 12 AND doc_id % 20 = 0)),
bits AS (SELECT DISTINCT unnest([{pos}]) AS bit FROM pg),
cg AS (SELECT doc_id, pos AS gi, array_to_string(t[pos:pos+11], ' ') AS g
       FROM (SELECT doc_id, t, unnest(range(1, len(t) - 10)) AS pos
             FROM toks WHERE len(t) >= 12 AND doc_id % 20 <> 0)),
cpos AS (SELECT doc_id, gi, unnest([{pos}]) AS bit FROM cg),
m AS (SELECT doc_id, gi FROM cpos JOIN bits USING (bit)
      GROUP BY doc_id, gi HAVING count(*) = 3),
hits AS (SELECT doc_id, count(*)::BIGINT AS n_hits FROM m GROUP BY doc_id),
base AS (SELECT doc_id, greatest(len(t) - 11, 0)::BIGINT AS n_grams
         FROM toks WHERE doc_id % 20 <> 0)
SELECT b.doc_id, n_grams,
       coalesce(n_hits, 0)::BIGINT AS n_hits,
       coalesce(n_hits, 0) > 0 AS contaminated
FROM base b LEFT JOIN hits USING (doc_id) ORDER BY doc_id
"""


def _text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy in integer milli-nats (library
    text.token_entropy): the vocabulary-diversity quality signal. All
    arithmetic after the driver-proven round(ln, 9) is exact int64 —
    one integer DIV at the end, no cross-engine float surface."""
    from ppocr_spark.functions.text import token_entropy

    d = _load(spark, sf_dir, "documents")
    return (
        token_entropy(d)
        .select(F.col("id").alias("doc_id"), "n_toks", "entropy_milli")
        .orderBy("doc_id")
    )


_TOKEN_ENTROPY_SQL = f"""
WITH counts AS (
  SELECT doc_id, tok, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents)
  GROUP BY doc_id, tok
), per AS (
  SELECT doc_id, sum(c)::BIGINT AS n_toks,
         sum(c * ((round(ln(c::DOUBLE), 9)::DECIMAL(28,9))
                  * 1000000000)::BIGINT)::BIGINT AS s
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_toks,
       ((n_toks * ((round(ln(n_toks::DOUBLE), 9)::DECIMAL(28,9))
                   * 1000000000)::BIGINT - s)
        // (n_toks * 1000000))::BIGINT AS entropy_milli
FROM per ORDER BY doc_id
"""


def _text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty (library text.ngram_novelty): share
    of the doc's distinct 3-grams with corpus df = 1, integer ppm —
    the inverse-boilerplate / diffuse-duplication signal. One
    distinct-gram explode, df groupBy, join back; no windows."""
    from ppocr_spark.functions.text import ngram_novelty

    d = _load(spark, sf_dir, "documents")
    return (
        ngram_novelty(d, n=3)
        .select(F.col("id").alias("doc_id"), "n_grams", "n_unique",
                "novelty_ppm")
        .orderBy("doc_id")
    )


_NGRAM_NOVELTY_SQL = f"""
WITH grams AS (
  SELECT doc_id AS id, unnest(g) AS g FROM (
    SELECT doc_id, {_DUCK_GRAMS} AS g
    FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents))
), dfs AS (
  SELECT g, count(*)::BIGINT AS df FROM grams GROUP BY g
), per AS (
  SELECT gr.id, count(*)::BIGINT AS n_grams,
         sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique
  FROM grams gr JOIN dfs d USING (g) GROUP BY gr.id
)
SELECT id AS doc_id, n_grams, n_unique,
       ((1000000 * n_unique) // n_grams)::BIGINT AS novelty_ppm
FROM per ORDER BY doc_id
"""


def _source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-audit report card (library
    text.source_quality_report): doc/token/char mass, short-doc ppm,
    language diversity, and majority-language share per source — the
    per-crawl/per-domain quality table that decides source weights.
    Integer-ppm ratios; majority lang ties to the lowest lang via one
    min(struct(-n, lang)) aggregate (no per-source window)."""
    from ppocr_spark.functions.text import source_quality_report

    d = _load(spark, sf_dir, "documents")
    return source_quality_report(d, short_chars=112)


_SOURCE_QUALITY_SQL = f"""
WITH per AS (
  SELECT source, lang, n_chars, len({_DUCK_TOKS}) AS nt
  FROM documents
), by_lang AS (
  SELECT source, lang, count(*) AS n, sum(nt) AS t, sum(n_chars) AS c,
         sum(CASE WHEN n_chars < 112 THEN 1 ELSE 0 END) AS s
  FROM per GROUP BY 1, 2
), top AS (
  SELECT source, lang, n,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, lang) AS rn
  FROM by_lang
)
SELECT b.source,
       sum(b.n)::BIGINT AS n_docs,
       sum(b.t)::BIGINT AS n_tokens,
       sum(b.c)::BIGINT AS n_chars_total,
       ((1000000 * sum(b.s)) // sum(b.n))::BIGINT AS short_ppm,
       count(DISTINCT b.lang)::BIGINT AS n_langs,
       max(t.lang) AS top_lang,
       ((1000000 * max(t.n)) // sum(b.n))::BIGINT AS top_lang_ppm
FROM by_lang b JOIN top t ON t.source = b.source AND t.rn = 1
GROUP BY b.source ORDER BY b.source
"""


def _source_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-source gram-universe overlap matrix (library
    sketch.source_gram_overlap_exact): the calibration twin of
    ``source_overlap_minhash`` — the sample/audit run that measures
    the 8-permutation sketch's estimation error before trusting it
    for continuous monitoring. Same gram universe (per-doc-distinct
    3-grams), exact integer-ppm Jaccard; per-gram join fan-out is
    bounded by |sources|², never documents."""
    from ppocr_spark.functions.sketch import source_gram_overlap_exact

    d = _load(spark, sf_dir, "documents")
    return source_gram_overlap_exact(d, n=3).orderBy(
        "source_a", "source_b"
    )


_SOURCE_OVERLAP_EXACT_SQL = f"""
WITH g AS (
  SELECT DISTINCT source AS src, g FROM (
    SELECT source, unnest(gr) AS g FROM (
      SELECT source, {_DUCK_GRAMS} AS gr
      FROM (SELECT source, {_DUCK_TOKS} AS toks FROM documents)))
), sizes AS (
  SELECT src, count(*)::BIGINT AS n FROM g GROUP BY src
), inter AS (
  SELECT x.src AS source_a, y.src AS source_b, count(*)::BIGINT AS i
  FROM g x JOIN g y ON x.g = y.g AND x.src < y.src
  GROUP BY 1, 2
), pairs AS (
  SELECT sa.src AS source_a, sb.src AS source_b, sa.n AS na, sb.n AS nb
  FROM sizes sa JOIN sizes sb ON sa.src < sb.src
)
SELECT p.source_a, p.source_b,
       coalesce(i.i, 0)::BIGINT AS inter,
       (p.na + p.nb - coalesce(i.i, 0))::BIGINT AS union_n,
       ((1000000 * coalesce(i.i, 0))
        // (p.na + p.nb - coalesce(i.i, 0)))::BIGINT AS jaccard_ppm
FROM pairs p
LEFT JOIN inter i
  ON i.source_a = p.source_a AND i.source_b = p.source_b
ORDER BY p.source_a, p.source_b
"""


def _source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source content-overlap matrix (library
    sketch.source_minhash_sigs + minhash_overlap_matrix): each source's
    union-of-grams MinHash signature is the element-wise min over its
    docs' signatures (one map-side-combinable groupBy; min is the merge
    law, so shard sketches union without rescanning), and the pairwise
    matching-permutation ppm estimates the Jaccard overlap of the gram
    universes — the audit a mixture designer runs before weighting
    sources. The pair join is |sources|² over the sketch table (the
    matrix IS the output — whitelisted), never corpus rows."""
    from ppocr_spark.functions.sketch import (minhash_overlap_matrix,
                                              source_minhash_sigs)

    d = _load(spark, sf_dir, "documents")
    sigs = source_minhash_sigs(d, group_col="source", k=8, n=3)
    return minhash_overlap_matrix(sigs, k=8).orderBy(
        "source_a", "source_b"
    )


_SOURCE_OVERLAP_SQL = f"""
WITH base AS (
  SELECT source, {_DUCK_GRAMS} AS grams
  FROM (SELECT source, {_DUCK_TOKS} AS toks FROM documents)
), sigs AS (
  SELECT source, {_minhash_sig('duck')} AS sig
  FROM base WHERE len(grams) > 0
), src AS (
  SELECT source,
         [{', '.join(f'min(sig[{i + 1}])' for i in range(8))}] AS ssig
  FROM sigs GROUP BY source
)
SELECT a.source AS source_a, b.source AS source_b,
       len(list_filter(range(8), i -> a.ssig[i+1] = b.ssig[i+1]))::BIGINT
         AS matches,
       ((1000000 * len(list_filter(range(8),
                                   i -> a.ssig[i+1] = b.ssig[i+1]))) // 8
       )::BIGINT AS overlap_ppm
FROM src a JOIN src b ON a.source < b.source
ORDER BY source_a, source_b
"""


def _distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-replayable HyperLogLog distinct count over document
    content (library sketch.hll_registers/hll_summary): md5-keyed
    buckets, string-arithmetic rank, exact integer harmonic sum, and an
    estimate that is ONE integer division by a shared constant — every
    register and the estimate itself value-check against DuckDB. Result
    = the ≤256-row register table (the mergeable sketch state) with the
    1-row summary and the exact distinct count (calibration column —
    at gate scale the exact pass is cheap; at 100 TB you would publish
    the sketch alone) attached via whitelisted 1-row broadcasts."""
    from ppocr_spark.functions import sketch

    d = _load(spark, sf_dir, "documents")
    regs = sketch.hll_registers(d, "text")
    summ = sketch.hll_summary(regs)
    exact = d.agg(
        F.countDistinct(F.md5(F.concat(F.lit("hll:"), F.col("text"))))
        .cast("long")
        .alias("n_exact")
    )
    return (
        regs.alias("__hr")
        .crossJoin(F.broadcast(summ.alias("__hs")))
        .crossJoin(F.broadcast(exact))
        .select(
            "bucket", "register", "zeros", "sum_nano", "est_milli",
            "n_exact",
        )
        .orderBy("bucket")
    )


_DISTINCT_HLL_SQL = f"""
WITH hx AS (
  SELECT md5('hll:' || text) AS h FROM documents
), st AS (
  SELECT ('0x' || substr(h, 1, 2))::BIGINT AS bucket,
         ltrim(substr(h, 3, 14), '0') AS s
  FROM hx
), rho AS (
  SELECT bucket,
         CASE WHEN s = '' THEN 57
              ELSE 4 * (14 - length(s))
                   + CASE WHEN substr(s, 1, 1) >= '8' THEN 1
                          WHEN substr(s, 1, 1) >= '4' THEN 2
                          WHEN substr(s, 1, 1) >= '2' THEN 3
                          ELSE 4 END
         END AS r
  FROM st
), regs AS (
  SELECT bucket, max(r)::BIGINT AS register FROM rho GROUP BY bucket
), summ AS (
  SELECT (256 - count(*))::BIGINT AS zeros,
         (coalesce(sum(1000000000 // (CAST(1 AS BIGINT) << register)), 0)
          + (256 - count(*)) * 1000000000)::BIGINT AS sum_nano
  FROM regs
), ex AS (
  SELECT count(DISTINCT md5('hll:' || text))::BIGINT AS n_exact
  FROM documents
)
SELECT bucket, register, zeros, sum_nano,
       ({sketch_K_MILLI} // greatest(sum_nano, 1))::BIGINT AS est_milli,
       n_exact
FROM regs, summ, ex
ORDER BY bucket
"""


def _freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation (library sketch.cms_build/
    cms_query) evaluated against exact counts: build the d×w counter
    grid over the full corpus token stream (cell table bounded at 16k
    rows — map-side combine, the exact groupBy's full-vocabulary
    shuffle never happens), then probe the exact top-32 tokens and emit
    (token, n_exact, n_est, over_count). CMS never undercounts, so
    over_count ≥ 0 is part of the checked contract; the identical
    salted-md5 cell layout replays in DuckDB, so even collision
    overcounts match bit-for-bit."""
    from ppocr_spark.functions import sketch
    from ppocr_spark.functions.text import tokens

    d = _load(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    top = (
        tok.groupBy("token")
        .agg(F.count("*").cast("long").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "token")
        .limit(32)
    )
    cms = sketch.cms_build(tok, "token")
    est = sketch.cms_query(cms, top.select("token"), "token")
    return (
        top.join(est, "token")
        .select(
            "token",
            "n_exact",
            "n_est",
            (F.col("n_est") - F.col("n_exact"))
            .cast("long")
            .alias("over_count"),
        )
        .orderBy("token")
    )


_FREQ_CMS_SQL = f"""
WITH tok AS (
  SELECT unnest({_DUCK_TOKS}) AS token FROM documents
), top AS (
  SELECT token, count(*)::BIGINT AS n_exact
  FROM tok GROUP BY token ORDER BY n_exact DESC, token LIMIT 32
), hj AS (
  SELECT unnest([0, 1, 2, 3]) AS j
), cells AS (
  SELECT j,
         ('0x' || substr(md5('cms' || j::VARCHAR || ':' || token), 1, 15))
             ::BIGINT % 4096 AS col,
         count(*)::BIGINT AS cnt
  FROM tok, hj GROUP BY 1, 2
), probe AS (
  SELECT t.token, t.n_exact, j,
         ('0x' || substr(md5('cms' || j::VARCHAR || ':' || t.token), 1, 15))
             ::BIGINT % 4096 AS col
  FROM top t, hj
), est AS (
  SELECT token, n_exact, min(coalesce(c.cnt, 0))::BIGINT AS n_est
  FROM probe p LEFT JOIN cells c ON c.j = p.j AND c.col = p.col
  GROUP BY 1, 2
)
SELECT token, n_exact, n_est, (n_est - n_exact)::BIGINT AS over_count
FROM est ORDER BY token
"""


def _stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth VALUE-checked streaming row (library
    streaming.stream_hll_registers): the HLL register aggregation as a
    streaming query — where dropDuplicates-based streaming distinct
    grows state per distinct key, the sketch caps streaming state at
    256 register rows forever. Register max is commutative/associative,
    so arrival order and batch boundaries cannot change the final
    complete-mode table; the oracle is the batch ``distinct_hll``
    register CTE chain."""
    from ppocr_spark.streaming.stream import stream_hll_registers

    return stream_hll_registers(
        spark, f"{sf_dir}/documents.parquet"
    ).orderBy("bucket")


_STREAM_HLL_SQL = """
WITH hx AS (
  SELECT md5('hll:' || text) AS h FROM documents
), st AS (
  SELECT ('0x' || substr(h, 1, 2))::BIGINT AS bucket,
         ltrim(substr(h, 3, 14), '0') AS s
  FROM hx
), rho AS (
  SELECT bucket,
         CASE WHEN s = '' THEN 57
              ELSE 4 * (14 - length(s))
                   + CASE WHEN substr(s, 1, 1) >= '8' THEN 1
                          WHEN substr(s, 1, 1) >= '4' THEN 2
                          WHEN substr(s, 1, 1) >= '2' THEN 3
                          ELSE 4 END
         END AS r
  FROM st
)
SELECT bucket, max(r)::BIGINT AS register
FROM rho GROUP BY bucket ORDER BY bucket
"""


def _events_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-quantile sketch (library sketch.quantile_hist
    family — the third bounded-state member: HLL = distinct, CMS =
    frequency, this = quantiles): per-event-type p50/p90/p99 from a
    ≤2^16-cell histogram whose every step — power-of-two binning,
    cell-wise merge, integer ceil-rank selection — replays bit-for-bit
    in DuckDB. Where Spark's exact ``percentile`` shuffles and sorts
    every value and ``percentile_approx``'s KLL state is an
    engine-private blob, this sketch is map-side-combined to a bounded
    cell table and is storable/mergeable across shards. ``exact_p50``
    is the calibration column (same integer rank applied to the raw
    values — the sketch's lower edge must sit within 1/64 below it); at
    100 TB you publish the sketch alone, the exact pick is gate-scale
    evidence like ``distinct_hll.n_exact``."""
    from pyspark.sql import Window

    from ppocr_spark.functions import sketch

    e = _load(spark, sf_dir, "events")
    hist = sketch.quantile_hist(e, "value", ("event_type",))
    q = sketch.quantile_hist_quantiles(hist, group_cols=("event_type",))
    w_ord = Window.partitionBy("event_type").orderBy("value", "event_id")
    w_all = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ex = (
        e.select(
            "event_type",
            "value",
            F.row_number().over(w_ord).alias("__rn"),
            F.count("*").over(w_all).alias("__n"),
        )
        .filter(F.col("__rn") == F.expr("(500000 * __n + 999999) DIV 1000000"))
        .select("event_type", F.col("value").alias("exact_p50"))
    )
    return (
        q.join(ex, "event_type")
        .select(
            "event_type",
            "n",
            "p50_lo_micro",
            "p90_lo_micro",
            "p99_lo_micro",
            "exact_p50",
        )
        .orderBy("event_type")
    )


_EVENTS_QSKETCH_SQL = """
WITH b AS (
  SELECT event_type,
         least(greatest(CAST(floor(value * 64) AS BIGINT), -32768),
               32767) AS bin
  FROM events
), h AS (
  SELECT event_type, bin, count(*)::BIGINT AS cnt FROM b GROUP BY 1, 2
), c AS (
  SELECT event_type, bin,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM h
), q AS (
  SELECT event_type, max(n)::BIGINT AS n,
         (min(CASE WHEN cum >= (500000 * n + 999999) // 1000000
                   THEN bin END) * 15625)::BIGINT AS p50_lo_micro,
         (min(CASE WHEN cum >= (900000 * n + 999999) // 1000000
                   THEN bin END) * 15625)::BIGINT AS p90_lo_micro,
         (min(CASE WHEN cum >= (990000 * n + 999999) // 1000000
                   THEN bin END) * 15625)::BIGINT AS p99_lo_micro
  FROM c GROUP BY event_type
), ex AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT q.event_type, q.n, p50_lo_micro, p90_lo_micro, p99_lo_micro,
       e.value AS exact_p50
FROM q JOIN ex e ON e.event_type = q.event_type
   AND e.rn = (500000 * e.n + 999999) // 1000000
ORDER BY q.event_type
"""


def _embeddings_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-health audit (library similarity.embedding_quality_report):
    per-label counts, dim bounds, zero-vector count and integer-exact
    squared-norm stats over the shared ``_quantized`` int64 contract —
    the pre-index QA card for a new embedding drop. One slim groupBy;
    decimal(38) group sums so no scale overflows the mean."""
    from ppocr_spark.functions.similarity import embedding_quality_report

    d = _load(spark, sf_dir, "embeddings")
    return embedding_quality_report(d)


_EMBEDDINGS_QUALITY_SQL = """
WITH per AS (
  SELECT label,
         len(embedding)::BIGINT AS dim,
         list_aggregate(
           list_transform(
             embedding,
             x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT)
                  * CAST(round(x::DOUBLE * 1000000) AS BIGINT)
           ),
           'sum'
         )::BIGINT AS ssq,
         (len(list_filter(
            embedding,
            x -> CAST(round(x::DOUBLE * 1000000) AS BIGINT) <> 0
          )) = 0)::BIGINT AS zero
  FROM embeddings
)
SELECT label, count(*)::BIGINT AS n_vecs,
       min(dim)::BIGINT AS dim_min, max(dim)::BIGINT AS dim_max,
       sum(zero)::BIGINT AS n_zero,
       min(ssq)::BIGINT AS ssq_min, max(ssq)::BIGINT AS ssq_max,
       (sum(ssq::HUGEINT) // count(*))::BIGINT AS ssq_mean
FROM per GROUP BY label ORDER BY label
"""


def _embeddings_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding Gram matrix (library
    linalg.pca_power_top): the spectral anisotropy diagnostic — which
    direction dominates an embedding drop. The only corpus-scale pass
    is the Arrow-batched integer Gram accumulation (one 64×64 matmul
    per batch → 4096-key map-side-combined sum); three power iterations
    then run on the 4096-row Gram relation with exact decimal matvecs
    and one truncating-DIV renormalization each (1-row max attach —
    whitelisted BNLJ-as-map). Oracle replays the identical arithmetic
    in HUGEINT."""
    from ppocr_spark.functions.linalg import pca_power_top

    d = _load(spark, sf_dir, "embeddings")
    return pca_power_top(d, dim=64, iters=3).orderBy("dim")


def _pca_iter_ctes(iters: int, vscale: int) -> str:
    """Unrolled power-iteration CTEs (generator pattern follows
    ``_pagerank_iter_ctes``): w{t} = Gram matvec, m{t} = max |w|
    normalizer, v{t} = renormalized loading — the exact expressions
    linalg.pca_power_top evaluates."""
    parts = []
    for t in range(1, iters + 1):
        parts.append(f"""
w{t} AS (
  SELECT g.i, sum(g.g * v.v) AS w FROM g JOIN v{t - 1} v ON v.j = g.j
  GROUP BY g.i
),
m{t} AS (SELECT greatest(max(abs(w)), 1::HUGEINT) AS m FROM w{t}),
v{t} AS (
  SELECT i AS j, ((w * {vscale}) // m{t}.m) AS v FROM w{t}, m{t}
)""")
    return ",".join(parts)


_EMBEDDINGS_PCA_SQL = f"""
WITH eq AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> round(x::DOUBLE * 1000000)::BIGINT) AS vq
  FROM embeddings
), cells AS (
  SELECT vec_id, generate_subscripts(vq, 1) AS p, unnest(vq) AS x FROM eq
), g AS (
  SELECT a.p - 1 AS i, b.p - 1 AS j, sum(a.x::HUGEINT * b.x) AS g
  FROM cells a JOIN cells b USING (vec_id) GROUP BY a.p, b.p
), v0 AS (
  SELECT i AS j, 1000000::HUGEINT AS v FROM range(64) t(i)
),
{_pca_iter_ctes(3, 1000000)}
SELECT j::BIGINT AS dim, v::BIGINT AS loading_micro FROM v3 ORDER BY dim
"""


def _documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiler (library profile.profile_table): per
    column of `documents` — nulls, exact distinct, native-typed min/max
    — the ANALYZE-style audit run before trusting a data drop. One
    aggregate (multi-distinct = Spark's Expand through a single
    shuffle) + a zero-shuffle stack unpivot; the oracle is the same
    stats as per-column UNION ALL. All profiled columns are int/string,
    so the min/max string casts are engine-identical (doubles would
    not be — documented in the module)."""
    from ppocr_spark.functions.profile import profile_table

    d = _load(spark, sf_dir, "documents")
    return profile_table(d).orderBy("col_name")


def _profile_col_sql(c: str) -> str:
    return f"""
SELECT '{c}' AS col_name, count(*)::BIGINT AS n_rows,
       sum(({c} IS NULL)::INT)::BIGINT AS n_nulls,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       min({c})::VARCHAR AS min_value, max({c})::VARCHAR AS max_value
FROM documents"""


_DOCUMENTS_PROFILE_SQL = (
    " UNION ALL ".join(
        _profile_col_sql(c)
        for c in ("doc_id", "text", "lang", "source", "n_chars")
    )
    + " ORDER BY col_name"
)


def _sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional fixed-size sampling (library
    sampling.priority_sample — Duffield/Lund/Thorup priority sampling):
    top-50 docs by ``floor(n_chars / u)`` with deterministic md5 ``u``,
    plus the Horvitz–Thompson ``w_est = max(w, τ)`` column whose sum
    unbiasedly estimates subset weight totals. The priority is one
    int64 expression — ``(w << 40) DIV (h+1)`` — so the sample set, the
    boundary rank, and τ replay exactly in DuckDB. Plans as
    TakeOrderedAndProject + a 1-row τ broadcast: zero shuffles."""
    from ppocr_spark.functions.sampling import priority_sample

    d = _load(spark, sf_dir, "documents")
    return priority_sample(d, 50, "n_chars").orderBy("doc_id")


_SAMPLE_PRIORITY_SQL = """
WITH p AS (
  SELECT doc_id, n_chars,
         (n_chars::BIGINT << 40)
           // (('0x' || substr(md5('prio:' || doc_id::VARCHAR), 1, 10))
               ::BIGINT + 1) AS priority
  FROM documents
), top AS (
  SELECT * FROM p ORDER BY priority DESC, doc_id LIMIT 51
), tau AS (
  SELECT CASE WHEN count(*) = 51 THEN min(priority) ELSE 0 END AS t
  FROM top
)
SELECT doc_id, n_chars, priority,
       greatest(n_chars, t)::BIGINT AS w_est
FROM (SELECT * FROM top ORDER BY priority DESC, doc_id LIMIT 50), tau
ORDER BY doc_id
"""


def _events_distinct_users_hll(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Grouped HLL (library sketch.hll_registers/hll_summary with
    group_cols): distinct users per event type from ONE bounded
    |types|×256-row register table — the realistic audit shape, where
    exact per-group countDistinct shuffles every (group, key) pair.
    The whole chain (per-group registers → exact integer harmonic sum →
    one integer division) replays in DuckDB GROUP BY for GROUP BY;
    ``n_exact`` is the gate-scale calibration column. At ~150 users per
    type the sketch sits in raw-HLL's documented high-read regime
    (n < 2.5·m) — the ``zeros`` column exists to flag exactly that, and
    both engines compute the identical number either way."""
    from ppocr_spark.functions import sketch

    e = _load(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    regs = sketch.hll_registers(e, "uid", group_cols=("event_type",))
    summ = sketch.hll_summary(regs, group_cols=("event_type",))
    exact = e.groupBy("event_type").agg(
        F.countDistinct("uid").cast("long").alias("n_exact")
    )
    return (
        summ.join(exact, "event_type")
        .select("event_type", "zeros", "sum_nano", "est_milli", "n_exact")
        .orderBy("event_type")
    )


_EVENTS_DISTINCT_HLL_SQL = f"""
WITH hx AS (
  SELECT event_type, md5('hll:' || user_id::VARCHAR) AS h FROM events
), st AS (
  SELECT event_type, ('0x' || substr(h, 1, 2))::BIGINT AS bucket,
         ltrim(substr(h, 3, 14), '0') AS s
  FROM hx
), rho AS (
  SELECT event_type, bucket,
         CASE WHEN s = '' THEN 57
              ELSE 4 * (14 - length(s))
                   + CASE WHEN substr(s, 1, 1) >= '8' THEN 1
                          WHEN substr(s, 1, 1) >= '4' THEN 2
                          WHEN substr(s, 1, 1) >= '2' THEN 3
                          ELSE 4 END
         END AS r
  FROM st
), regs AS (
  SELECT event_type, bucket, max(r)::BIGINT AS register
  FROM rho GROUP BY 1, 2
), summ AS (
  SELECT event_type, (256 - count(*))::BIGINT AS zeros,
         (coalesce(sum(1000000000 // (CAST(1 AS BIGINT) << register)), 0)
          + (256 - count(*)) * 1000000000)::BIGINT AS sum_nano
  FROM regs GROUP BY 1
), ex AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_exact
  FROM events GROUP BY 1
)
SELECT s.event_type, zeros, sum_nano,
       ({sketch_K_MILLI} // greatest(sum_nano, 1))::BIGINT AS est_milli,
       n_exact
FROM summ s JOIN ex ON ex.event_type = s.event_type
ORDER BY s.event_type
"""


def _layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key for two-dimensional file pruning
    (library sampling.zorder_key / zorder_layout): events bucketed on
    (day-of-month, user_id % 256), keyed onto the Z-curve, then rolled
    up per 10-bit key prefix — each prefix is one curve segment, i.e.
    one would-be file, and the emitted min/max rectangle IS the
    file-statistics tightness that lets EITHER predicate prune: a
    prefix leaves 5 free bits per dimension, so BOTH spans are ≤ 32 by
    construction, where a single-dim sort leaves the other dimension
    unbounded (every file spans all 256 user buckets).
    The key is pure shift/mask integer arithmetic in whole-stage
    codegen; the oracle rebuilds it bit-for-bit from the same unrolled
    terms (``_zorder_sql_expr`` — one generator, two engines). One
    map-side-combined groupBy over ≤ 2^6 prefixes; the actual layout
    write (range repartition + in-partition sort on the key) is
    exercised by the layout test, not the gate."""
    from ppocr_spark.functions.sampling import zorder_key

    e = _load(spark, sf_dir, "events")
    x = (F.dayofmonth("ts") - 1).cast("long")
    y = (F.col("user_id") % 256).cast("long")
    d = e.select(
        x.alias("x"), y.alias("y"), zorder_key(x, y, 8).alias("zkey")
    )
    return (
        d.groupBy(F.expr("zkey DIV 1024").cast("long").alias("prefix"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("x").cast("long").alias("xmin"),
            F.max("x").cast("long").alias("xmax"),
            F.min("y").cast("long").alias("ymin"),
            F.max("y").cast("long").alias("ymax"),
            (
                (F.max("x") - F.min("x") + 1)
                * (F.max("y") - F.min("y") + 1)
            )
            .cast("long")
            .alias("rect_area"),
        )
        .orderBy("prefix")
    )


def _zorder_sql_expr(x: str, y: str, bits: int = 8) -> str:
    """The DuckDB spelling of sampling.zorder_key's unrolled terms —
    generated from the same loop shape so the twins cannot drift."""
    terms = []
    for k in range(bits):
        terms.append(f"((({x} >> {k}) & 1) << {2 * k + 1})")
        terms.append(f"((({y} >> {k}) & 1) << {2 * k})")
    return " + ".join(terms)


_LAYOUT_ZORDER_SQL = f"""
WITH z AS (
  SELECT x, y, ({_zorder_sql_expr('x', 'y')})::BIGINT AS zkey
  FROM (
    SELECT (day(ts) - 1)::BIGINT AS x, (user_id % 256)::BIGINT AS y
    FROM events
  )
)
SELECT (zkey // 1024)::BIGINT AS prefix, count(*)::BIGINT AS n,
       min(x)::BIGINT AS xmin, max(x)::BIGINT AS xmax,
       min(y)::BIGINT AS ymin, max(y)::BIGINT AS ymax,
       ((max(x) - min(x) + 1) * (max(y) - min(y) + 1))::BIGINT AS rect_area
FROM z GROUP BY 1 ORDER BY 1
"""


def _key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnostic (library sampling.key_skew_report): top-20
    heaviest event users with exact counts and integer-ppm load shares
    — the number every skew valve (salt width, max_bucket/max_cell,
    AQE skew-join) is sized from. One map-side-combined groupBy; top-k
    via TakeOrderedAndProject; the cumulative window runs over the
    already-limited 20-row table, never the keyspace."""
    from ppocr_spark.functions.sampling import key_skew_report

    e = _load(spark, sf_dir, "events")
    return key_skew_report(e, "user_id", top=20)


_KEY_SKEW_SQL = """
WITH counts AS (
  SELECT user_id::VARCHAR AS key, count(*)::BIGINT AS n
  FROM events GROUP BY 1
), tot AS (
  SELECT sum(n)::BIGINT AS t FROM counts
), head AS (
  SELECT key, n FROM counts ORDER BY n DESC, key LIMIT 20
)
SELECT row_number() OVER (ORDER BY n DESC, key)::BIGINT AS rank,
       key, n,
       ((1000000 * n) // t)::BIGINT AS share_ppm,
       ((1000000 * sum(n) OVER (ORDER BY n DESC, key
                                ROWS UNBOUNDED PRECEDING)) // t)::BIGINT
           AS cum_share_ppm
FROM head, tot ORDER BY rank
"""


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full interleaved-document extraction on the deterministic
    corpus (driver checks rows > 0 and a stable schema)."""
    return _ocr_extract(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXPLICIT ROTATION POLICY (documented per ADVICE r4): the external
    # driver snapshots a ~50-entry window from the head of this registry,
    # while tools/check_oracles.py always verifies ALL entries locally.
    # Entries are ordered by rounds-since-last-driver-check, descending:
    #   1. any entry whose last driver row was red (fix must re-verify);
    #   2. entries with no driver row in the previous round (stalest);
    #   3. new entries added this round (never driver-checked);
    #   4. entries driver-green last round, oldest coverage first.
    # Round 5: more never-driver-checked entries exist than the window
    # holds, so tier 3 (no driver row EVER) outranks tier 2 (driver-green
    # in r3, untouched pure-SQL, local-green every session since): a
    # first-ever driver row is worth more than a third row for a query
    # that hasn't changed in four rounds. The demoted tier-2 entries are
    # listed at the bottom of this dict so the choice is auditable.
    return {
        # --- red in r4 (fixed: oracle NULL-vs-'' on fully-cut docs) ---
        "dedup_substring_rewrite": _substring_rewrite,
        # --- no driver row in r4 (last checked r3) ---
        "audio_features": _audio_features,
        "video_metadata": _video_metadata,
        "video_features": _video_features,
        "video_frame_sample": _video_frame_sample,
        "html_strip_tags": _html_strip,
        "html_main_content": _html_main,
        "table_cell_match": _table_cell_match,
        "table_html": _table_html,
        "q5_region_revenue": _q5,
        "events_percentiles": _events_percentiles,
        "events_sessionize": _events_sessionize,
        "events_attribution_asof": _events_attribution_asof,
        "events_interval_join": _events_interval_join,
        "events_funnel": _events_funnel,
        "events_retention": _events_retention,
        "events_topk_paths": _events_topk_paths,
        "vocab_topk": _vocab_topk,
        "text_ttr": _text_ttr,
        "stream_sessionize": _stream_sessionize,
        "stream_windowed_counts": _stream_windowed,
        # --- new in round 5 (never driver-checked) ---
        "sample_mix_sources": _sample_mix_sources,
        "text_dsir_weights": _text_dsir,
        "decontaminate_bloom": _decontaminate_bloom,
        "dedup_keep_best": _dedup_keep_best,
        "sample_exact_k": _sample_exact_k,
        "knn_join_fine": _knn_join_fine,
        "text_token_entropy": _text_token_entropy,
        "stream_dedup_signature": _stream_dedup_signature,
        "pack_sequences": _pack_sequences,
        "text_gopher_repetition": _gopher_repetition,
        "ann_topk_ivf_pq": _ann_ivf_pq,
        "text_bigram_logprob": _bigram_logprob,
        "chunk_cdc": _chunk_cdc,
        "bpe_merges": _bpe_merges,
        "bpe_segment_stats": _bpe_segment_stats,
        "events_anomaly_days": _events_anomaly_days,
        "dedup_cluster_sizes": _dedup_cluster_sizes,
        "ann_recall_eval": _ann_recall_eval,
        "events_json_props": _events_json_props,
        "knn_classify": _knn_classify,
        "cluster_label_purity": _cluster_label_purity,
        "source_quality_report": _source_quality_report,
        "distinct_hll": _distinct_hll,
        "freq_cms": _freq_cms,
        "stream_hll_registers": _stream_hll,
        "key_skew_report": _key_skew_report,
        "events_quantile_sketch": _events_quantile_sketch,
        "events_rolling_stats": _events_rolling_stats,
        "layout_zorder": _layout_zorder,
        "events_distinct_users_hll": _events_distinct_users_hll,
        "dedup_containment": _dedup_containment,
        "sample_priority_weighted": _sample_priority,
        "documents_profile": _documents_profile,
        "embeddings_quality_report": _embeddings_quality,
        "events_cube": _events_cube,
        "events_pivot_daily": _events_pivot,
        "dedup_pagerank": _dedup_pagerank,
        "embeddings_pca_power": _embeddings_pca_power,
        "source_overlap_minhash": _source_overlap_minhash,
        "dedup_triangles": _dedup_triangles,
        "snapshot_diff": _snapshot_diff,
        "dedup_ssjoin_prefix": _dedup_ssjoin_prefix,
        "source_token_kl": _source_token_kl,
        "text_pmi_bigrams": _text_pmi_bigrams,
        "split_leakage_embedding": _split_leakage_embedding,
        "dedup_incremental": _dedup_incremental,
        "text_inverted_index": _text_inverted_index,
        "text_readability": _text_readability,
        "dedup_source_report": _dedup_source_report,
        "events_dau_wau": _events_dau_wau,
        "dedup_communities_lpa": _dedup_communities_lpa,
        "lang_confusion_matrix": _lang_confusion,
        "embeddings_class_separation": _embeddings_class_separation,
        "text_ngram_novelty": _text_ngram_novelty,
        "events_markov_transitions": _events_markov_transitions,
        "dedup_lsh_recall_curve": _dedup_lsh_recall_curve,
        "quality_probe_calibration": _quality_probe_calibration,
        "events_seasonality": _events_seasonality,
        "token_shards_balance": _token_shards_balance,
        "simhash_bit_balance": _simhash_bit_balance,
        "pq_reconstruction_report": _pq_reconstruction,
        "dedup_impact_report": _dedup_impact_report,
        "ocr_corpus_report": _ocr_corpus_report,
        "events_ab_lift": _events_ab_lift,
        "embeddings_dim_variance": _embeddings_dim_variance,
        "events_value_outliers": _events_value_outliers,
        "ann_probe_sweep": _ann_probe_sweep,
        "source_overlap_exact": _source_overlap_exact,
        "text_charclass_profile": _text_charclass_profile,
        "sample_kfold": _sample_kfold,
        # --- driver-green in r4, single round of coverage ---
        "layout_nms": _layout_nms,
        "sample_split": _sample_split,
        "sample_stratified": _sample_stratified,
        "sample_token_budget": _sample_token_budget,
        "sample_source_cap": _sample_source_cap,
        "pii_scrub": _pii_scrub,
        "dedup_embedding_clusters": _emb_clusters,
        "quality_model_step": _quality_model_step,
        "text_unigram_logprob": _unigram_logprob,
        "text_quality_tiers": _quality_tiers,
        "stream_dedup_exact": _stream_dedup_exact,
        "chunk_documents": _chunk_documents,
        "token_shards": _token_shards,
        "text_bm25_topk": _bm25_topk,
        "embedding_kmeans": _embedding_kmeans,
        "embedding_kmeans_fine": _embedding_kmeans_fine,
        "ann_topk_ivf_fine": _ann_ivf_fine,
        "dedup_semantic": _dedup_semantic,
        "text_tfidf_terms": _tfidf_terms,
        "clean_corpus_stats": _clean_corpus_stats,
        # --- driver-green in r4 AND earlier rounds (freshest coverage) ---
        "span_explode_reassemble": _span_explode,
        "status_code_taxonomy": _status_taxonomy,
        "base64_status_taxonomy": _base64_taxonomy,
        "request_results": _request_results,
        "k1_output_filter": _k1_filter,
        "text_features": _text_features,
        "quality_gates": _quality_gates,
        "text_langid": _langid,
        "text_fingerprint": _fingerprint,
        "text_token_counts": _token_counts,
        "text_winnowing": _winnowing,
        "dedup_exact": _dedup_exact,
        "dedup_ngram_jaccard": _dedup_jaccard,
        "dedup_substring_spans": _dedup_substring,
        "decontaminate_spans": _decontaminate,
        "dedup_minhash_lsh": _dedup_minhash,
        "dedup_clusters": _dedup_clusters,
        "dedup_simhash": _dedup_simhash,
        "dedup_simhash_pairs": _dedup_simhash_pairs,
        "dedup_embedding_cosine": _emb_cosine_pairs,
        "ann_topk_bruteforce": _ann_brute,
        "ann_topk_lsh": _ann_lsh,
        "ann_topk_ivf": _ann_ivf,
        "dedup_embedding_lsh": _emb_lsh_pairs,
        "ocr_extract_spans": _ocr_extract,
        "ocr_blocks": _ocr_blocks,
        "image_metadata": _image_metadata,
        "image_features": _image_features,
        "audio_metadata": _audio_metadata,
        # --- demoted below the r5 cut (more stale/new entries than the
        # 50-entry window holds): the lowest-risk tier-2 entries — pure
        # TPC-H/window/set-op SQL, untouched since round 1, driver-green
        # in r3, local-green every session since (check_oracles still
        # value-checks every one of these each run). Documented here so
        # the choice is auditable; each slot freed went to an entry with
        # no driver row EVER (the post-freeze sketch family + this
        # session's additions above).
        "q1_pricing_summary": _q1,
        "q3_shipping_priority": _q3,
        "top_customers_window": _top_customers,
        "events_daily": _events_daily,
        "events_windowed": _events_windowed,
        "distinct_event_types": _distinct_event_types,
        "orders_case_projection": _orders_case,
        "semi_anti_join": _semi_anti_join,
        "set_ops_nations": _set_ops,
        "rollup_revenue": _rollup_revenue,
    }


def oracle_sql() -> dict[str, str]:
    # Driver correctness scale. The corpus-derived oracles (audio/video/
    # html/table/layout/ocr) embed absolute parquet paths because the
    # driver's DuckDB views cover only the ten base tables; the override
    # exists solely for tools/check_oracles.py's cross-scale stress runs
    # (the driver never sets it, so its contract stays sf0.01).
    sf_dir = os.environ.get(
        "PPOCR_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    return {
        "q1_pricing_summary": _Q1_SQL,
        "q3_shipping_priority": _Q3_SQL,
        "q5_region_revenue": _Q5_SQL,
        "top_customers_window": _TOP_CUSTOMERS_SQL,
        "events_daily": _EVENTS_DAILY_SQL,
        "events_windowed": _EVENTS_WINDOWED_SQL,
        "events_percentiles": _EVENTS_PERCENTILES_SQL,
        "distinct_event_types": _DISTINCT_EVENT_TYPES_SQL,
        "orders_case_projection": _ORDERS_CASE_SQL,
        "semi_anti_join": _SEMI_ANTI_SQL,
        "set_ops_nations": _SET_OPS_SQL,
        "rollup_revenue": _ROLLUP_SQL,
        "events_sessionize": _EVENTS_SESSIONIZE_SQL,
        "events_attribution_asof": _EVENTS_ATTRIBUTION_SQL,
        "events_interval_join": _EVENTS_INTERVAL_SQL,
        "events_funnel": _EVENTS_FUNNEL_SQL,
        "events_retention": _EVENTS_RETENTION_SQL,
        "events_topk_paths": _EVENTS_PATHS_SQL,
        "vocab_topk": _VOCAB_TOPK_SQL,
        "text_ttr": _TEXT_TTR_SQL,
        "stream_sessionize": _STREAM_SESSIONIZE_SQL,
        "stream_windowed_counts": _STREAM_WINDOWED_SQL,
        "span_explode_reassemble": _SPAN_EXPLODE_SQL,
        "status_code_taxonomy": _STATUS_TAXONOMY_SQL,
        "base64_status_taxonomy": _base64_taxonomy_sql(sf_dir),
        "request_results": _request_results_sql(sf_dir),
        "k1_output_filter": _K1_FILTER_SQL,
        "text_features": _TEXT_FEATURES_SQL,
        "quality_gates": _QUALITY_GATES_SQL,
        "text_langid": _LANGID_SQL,
        "text_fingerprint": _FINGERPRINT_SQL,
        "text_token_counts": _TOKEN_COUNTS_SQL,
        "text_winnowing": _WINNOWING_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": _DEDUP_JACCARD_SQL,
        "dedup_substring_spans": _DEDUP_SUBSTRING_SQL,
        "decontaminate_spans": _DECONTAMINATE_SQL,
        "clean_corpus_stats": _CLEAN_CORPUS_SQL,
        "dedup_minhash_lsh": _DEDUP_MINHASH_SQL,
        "dedup_clusters": _DEDUP_CLUSTERS_SQL,
        "dedup_simhash": _dedup_simhash_sql(),
        "dedup_simhash_pairs": _dedup_simhash_pairs_sql(),
        "dedup_embedding_cosine": _EMB_COSINE_SQL,
        "ann_topk_bruteforce": _ANN_BRUTE_SQL,
        "ann_topk_lsh": _ann_lsh_sql(),
        "ann_topk_ivf": _ann_ivf_sql(),
        "dedup_embedding_lsh": _emb_lsh_pairs_sql(),
        "ocr_extract_spans": _ocr_extract_sql(sf_dir),
        "ocr_corpus_report": _ocr_corpus_report_sql(sf_dir),
        "ocr_blocks": _ocr_blocks_sql(sf_dir),
        "image_metadata": _image_metadata_sql(sf_dir),
        "image_features": _image_features_sql(sf_dir),
        "audio_metadata": _audio_metadata_sql(sf_dir),
        "audio_features": _audio_features_sql(sf_dir),
        "video_metadata": _video_metadata_sql(sf_dir),
        "video_features": _video_features_sql(sf_dir),
        "video_frame_sample": _video_frame_sample_sql(sf_dir),
        "html_strip_tags": _html_strip_sql(sf_dir),
        "html_main_content": _html_main_sql(sf_dir),
        "table_cell_match": _table_cell_match_sql(sf_dir),
        "table_html": _table_html_sql(sf_dir),
        "layout_nms": _layout_nms_sql(sf_dir),
        "sample_split": _sample_split_sql(),
        "sample_stratified": _sample_stratified_sql(),
        "sample_token_budget": _sample_token_budget_sql(),
        "sample_source_cap": _sample_source_cap_sql(),
        "pii_scrub": _pii_scrub_sql(),
        "dedup_embedding_clusters": _emb_clusters_sql(),
        "quality_model_step": _quality_model_step_sql(),
        "dedup_substring_rewrite": _SUBSTRING_REWRITE_SQL,
        "text_unigram_logprob": _UNIGRAM_LOGPROB_SQL,
        "text_quality_tiers": _QUALITY_TIERS_SQL,
        "stream_dedup_exact": _STREAM_DEDUP_EXACT_SQL,
        "chunk_documents": _chunk_documents_sql(),
        "token_shards": _token_shards_sql(),
        "sample_mix_sources": _sample_mix_sources_sql(),
        "text_dsir_weights": _DSIR_SQL,
        "decontaminate_bloom": _decontaminate_bloom_sql(),
        "dedup_keep_best": _DEDUP_KEEP_BEST_SQL,
        "sample_exact_k": _SAMPLE_EXACT_K_SQL,
        "knn_join_fine": _knn_join_fine_sql(),
        "text_token_entropy": _TOKEN_ENTROPY_SQL,
        "stream_dedup_signature": _STREAM_DEDUP_SIG_SQL,
        "pack_sequences": _PACK_SEQUENCES_SQL,
        "text_gopher_repetition": _GOPHER_REPETITION_SQL,
        "text_bigram_logprob": _BIGRAM_LOGPROB_SQL,
        "chunk_cdc": _CHUNK_CDC_SQL,
        "bpe_merges": _BPE_MERGES_SQL,
        "bpe_segment_stats": _BPE_SEGMENT_SQL,
        "events_anomaly_days": _EVENTS_ANOMALY_SQL,
        "dedup_cluster_sizes": _DEDUP_CLUSTER_SIZES_SQL,
        "ann_recall_eval": _ann_recall_sql(),
        "events_json_props": _EVENTS_JSON_SQL,
        "knn_classify": _KNN_CLASSIFY_SQL,
        "cluster_label_purity": _cluster_purity_sql(),
        "ann_topk_ivf_pq": _ann_ivf_pq_sql(),
        "text_bm25_topk": _bm25_topk_sql(),
        "embedding_kmeans": _embedding_kmeans_sql(),
        "embedding_kmeans_fine": _embedding_kmeans_fine_sql(),
        "ann_topk_ivf_fine": _ann_ivf_fine_sql(),
        "dedup_semantic": _dedup_semantic_sql(),
        "text_tfidf_terms": _tfidf_terms_sql(),
        "source_quality_report": _SOURCE_QUALITY_SQL,
        "distinct_hll": _DISTINCT_HLL_SQL,
        "freq_cms": _FREQ_CMS_SQL,
        "stream_hll_registers": _STREAM_HLL_SQL,
        "key_skew_report": _KEY_SKEW_SQL,
        "events_quantile_sketch": _EVENTS_QSKETCH_SQL,
        "events_rolling_stats": _EVENTS_ROLLING_SQL,
        "layout_zorder": _LAYOUT_ZORDER_SQL,
        "events_distinct_users_hll": _EVENTS_DISTINCT_HLL_SQL,
        "dedup_containment": _DEDUP_CONTAINMENT_SQL,
        "sample_priority_weighted": _SAMPLE_PRIORITY_SQL,
        "documents_profile": _DOCUMENTS_PROFILE_SQL,
        "embeddings_quality_report": _EMBEDDINGS_QUALITY_SQL,
        "events_cube": _EVENTS_CUBE_SQL,
        "events_pivot_daily": _EVENTS_PIVOT_SQL,
        "dedup_pagerank": _DEDUP_PAGERANK_SQL,
        "embeddings_pca_power": _EMBEDDINGS_PCA_SQL,
        "source_overlap_minhash": _SOURCE_OVERLAP_SQL,
        "dedup_triangles": _DEDUP_TRIANGLES_SQL,
        "snapshot_diff": _SNAPSHOT_DIFF_SQL,
        "dedup_ssjoin_prefix": _SSJOIN_PREFIX_SQL,
        "source_token_kl": _SOURCE_TOKEN_KL_SQL,
        "text_pmi_bigrams": _PMI_BIGRAMS_SQL,
        "split_leakage_embedding": _split_leakage_embedding_sql(),
        "dedup_incremental": _DEDUP_INCREMENTAL_SQL,
        "text_inverted_index": _INVERTED_INDEX_SQL,
        "text_readability": _READABILITY_SQL,
        "dedup_source_report": _DEDUP_SOURCE_REPORT_SQL,
        "events_dau_wau": _EVENTS_DAU_WAU_SQL,
        "dedup_communities_lpa": _DEDUP_LPA_SQL,
        "lang_confusion_matrix": _LANG_CONFUSION_SQL,
        "embeddings_class_separation": _CLASS_SEPARATION_SQL,
        "text_ngram_novelty": _NGRAM_NOVELTY_SQL,
        "events_markov_transitions": _EVENTS_MARKOV_SQL,
        "dedup_lsh_recall_curve": _LSH_RECALL_SQL,
        "quality_probe_calibration": _quality_probe_calibration_sql(),
        "events_seasonality": _EVENTS_SEASONALITY_SQL,
        "token_shards_balance": _TOKEN_SHARDS_BALANCE_SQL,
        "simhash_bit_balance": _simhash_bit_balance_sql(),
        "pq_reconstruction_report": _pq_reconstruction_sql(),
        "dedup_impact_report": _dedup_impact_sql(),
        "events_ab_lift": _EVENTS_AB_LIFT_SQL,
        "embeddings_dim_variance": _EMB_DIM_VARIANCE_SQL,
        "events_value_outliers": _EVENTS_VALUE_OUTLIERS_SQL,
        "ann_probe_sweep": _ann_probe_sweep_sql(),
        "source_overlap_exact": _SOURCE_OVERLAP_EXACT_SQL,
        "text_charclass_profile": _CHARCLASS_SQL,
        "sample_kfold": _SAMPLE_KFOLD_SQL,
    }
