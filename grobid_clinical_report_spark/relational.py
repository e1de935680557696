"""Relational-operator harness (SURVEY.md §2.8).

The reference is a per-document map pipeline with no joins/windows of its own;
these queries exercise the engine shell around it — the places where
relational operators DO arise in this system (guardrail aggregation, manifest
anti-join resume, top-k ranking) — expressed over the driver's TPC-H-ish
tables so the DuckDB oracle can verify them.

Plan hygiene (checked in tests/test_plans.py): filters and column pruning
reach the parquet scan, the small dimension side is broadcast, partial
aggregation happens map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy agg with pushed-down date filter."""
    li = _t(spark, sf_dir, "lineitem")
    # money quantized per-row to integer cents/milli BEFORE summing: integer
    # addition is associative, so Spark's partial-agg ordering and DuckDB's
    # sequential sum produce bit-identical results (double sums would not)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr("cast(floor(l_quantity) as bigint)")).alias("sum_qty"),
            F.sum(
                F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)")
            ).alias("sum_base_price_cents"),
            F.sum(
                F.expr(
                    "cast(floor(l_extendedprice * (1 - l_discount) * 1000 + 0.5)"
                    " as bigint)"
                )
            ).alias("sum_disc_price_milli"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    AS sum_base_price_cents,
  CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000 + 0.5)
    AS BIGINT)) AS BIGINT) AS sum_disc_price_milli,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer — window top-k with a broadcast
    dimension join (customer is small → broadcast, no shuffle of orders)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("rk").alias("rank"),
        )
        .orderBy("o_custkey", "rank")
    )


ORACLE_TOP_ORDERS = """
WITH ranked AS (
  SELECT o_custkey, c_name, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT o_custkey, c_name, o_orderkey, o_totalprice, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3 ORDER BY o_custkey, rank
"""


def q_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the manifest-resume shape (pending = all ∖ done)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderstatus")
    )


ORACLE_ANTIJOIN = """
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders
WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>30min cumsum — the standard event-stream
    pattern (batch equivalent of session_window)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact microsecond gap (boundary-crossing datediff semantics differ
    # between engines on fractional seconds)
    us = F.expr("unix_micros(cast(ts as timestamp_ltz))")
    lag_us = F.lag(us).over(w)
    gap = F.when(us - lag_us > 1800 * 1_000_000, 1).otherwise(0)
    sess = ev.withColumn(
        "new_sess", F.when(lag_us.isNull(), F.lit(1)).otherwise(gap)
    ).withColumn("session_id", F.sum("new_sess").over(w))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
        .orderBy("user_id", "session_id")
    )


ORACLE_SESSIONIZATION = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL THEN 1
         WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  COUNT(*) AS n_events, MIN(event_id) AS first_event
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
"""

def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — multi-level aggregates in one pass (grouping sets)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy(
            F.col("source").asc_nulls_first(), F.col("lang").asc_nulls_first()
        )
    )


ORACLE_ROLLUP = """
SELECT source, lang, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY ROLLUP(source, lang)
ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
"""


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-level distinct/extent statistics (one-row summary)."""
    return _t(spark, sf_dir, "documents").agg(
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
    )


ORACLE_CORPUS_STATS = """
SELECT COUNT(DISTINCT lang) AS n_langs, COUNT(DISTINCT source) AS n_sources,
  COUNT(*) AS n_docs, MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
"""


_HIST_BIN = 64  # chars per histogram bucket


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source P50/P90/P99 document length via a MERGEABLE fixed-width
    integer histogram — the scale primitive for percentile dashboards:
    exact percentile needs a per-group sort of every row, while the
    histogram needs one bounded-key shuffle (sources × bins, never
    corpus-sized; partial agg combines map-side) plus a window over the
    per-source bin table. Quantile q = the upper edge of the smallest bin
    whose cumulative count reaches q% — deterministic integer arithmetic,
    so unlike percentile_approx/approx_quantile (different sketch
    implementations per engine) the DuckDB oracle matches bit-exactly."""
    from pyspark.sql.window import Window

    h = (
        _t(spark, sf_dir, "documents")
        .selectExpr("source", f"n_chars div {_HIST_BIN} as bin")
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = h.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("source").orderBy("bin"))
    ).withColumn("tot", F.sum("c").over(Window.partitionBy("source")))
    aggs = [
        F.min(
            F.when(F.expr(f"cum * 100 >= tot * {q}"), F.col("bin"))
        ).alias(f"b{q}")
        for q in (50, 90, 99)
    ]
    return (
        cum.groupBy("source")
        .agg(F.max("tot").alias("n_docs"), *aggs)
        .selectExpr(
            "source",
            "cast(n_docs as bigint) as n_docs",
            *[
                f"cast(b{q} * {_HIST_BIN} + {_HIST_BIN - 1} as bigint)"
                f" as p{q}_chars"
                for q in (50, 90, 99)
            ],
        )
    )


ORACLE_LENGTH_QUANTILES = f"""
WITH h AS (
  SELECT source, n_chars // {_HIST_BIN} AS bin, COUNT(*) AS c
  FROM documents GROUP BY source, bin
), cum AS (
  SELECT source, bin, c,
    SUM(c) OVER (PARTITION BY source ORDER BY bin) AS cum,
    SUM(c) OVER (PARTITION BY source) AS tot
  FROM h
)
SELECT source, CAST(MAX(tot) AS BIGINT) AS n_docs,
  CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN bin END)
    * {_HIST_BIN} + {_HIST_BIN - 1} AS BIGINT) AS p50_chars,
  CAST(MIN(CASE WHEN cum * 100 >= tot * 90 THEN bin END)
    * {_HIST_BIN} + {_HIST_BIN - 1} AS BIGINT) AS p90_chars,
  CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN bin END)
    * {_HIST_BIN} + {_HIST_BIN - 1} AS BIGINT) AS p99_chars
FROM cum GROUP BY source
"""


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation via the built-in window() function — the
    batch twin of the Structured Streaming windowed agg (readStream →
    groupBy(window(ts, '1 hour')) → agg); same shuffle key, same output.
    Milli-scaled sums keep cross-engine value hashes float-exact."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # quantize BEFORE summing: an integer sum is summation-order
            # independent, so Spark's partial aggregation and DuckDB agree
            # bit-for-bit (float sums can flip a floor() at the boundary)
            F.expr(
                "sum(cast(floor(value * 1000 + 0.5) as bigint))"
            ).alias("sum_value_milli"),
        )
        .selectExpr(
            "cast(unix_micros(cast(w.start as timestamp_ltz)) as bigint)"
            " as win_start_us",
            "event_type", "n_events", "sum_value_milli",
        )
        .orderBy("win_start_us", "event_type")
    )


ORACLE_EVENT_WINDOWS = """
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS win_start_us,
  event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
    AS sum_value_milli
FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type
"""


# ---------------------------------------------------------------------------
# as-of join (temporal point lookup) — the task brief's canonical example of
# an operator Spark LACKS: for each event, the customer's latest order at or
# before the event time. Rebuilt as the scalable union+window pattern: tag
# both sides, sort within customer by (time, tag), forward-fill the last
# order key — ONE shuffle on the join key, never a range cross-product.
# DuckDB has a native ASOF JOIN, which is exactly the oracle.
# ---------------------------------------------------------------------------


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # one order per (cust, date) — max orderkey — so the as-of pick is
    # deterministic in both engines even on date ties
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    a = orders.selectExpr(
        "o_custkey as k", "cast(o_orderdate as timestamp) as t",
        "o_orderkey", "cast(null as bigint) as event_id", "0 as tag",
    )
    b = events.selectExpr(
        "user_id as k", "ts as t",
        "cast(null as bigint) as o_orderkey", "event_id", "1 as tag",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        a.unionByName(b)
        .withColumn("asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .filter("tag = 1")
        .selectExpr(
            "event_id", "k as user_id",
            "cast(asof_orderkey as bigint) as asof_orderkey",
        )
    )


ORACLE_ASOF = """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
),
e AS (SELECT event_id, user_id, ts FROM events)
SELECT e.event_id, e.user_id,
  CAST(o.o_orderkey AS BIGINT) AS asof_orderkey
FROM e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP)
"""


# ---------------------------------------------------------------------------
# range join (the task brief's other named operator Spark lacks a native
# strategy for): for each click, count the same user's views within the
# following hour. A naive theta-join is quadratic; the scalable rebuild
# joins on (user, coarse time bucket) with each probe hitting exactly two
# buckets (its own and the next) and filters the exact range — the same
# band-bucket technique the near-dup LSH join uses, candidate set bounded
# by bucket occupancy, never by row count.
# ---------------------------------------------------------------------------

_RANGE_SEC = 3600


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "ts",
        (F.unix_timestamp("ts")).alias("sec"),
    )
    clicks = ev.filter("event_type = 'click'").select(
        "event_id", "user_id", F.col("sec").alias("c_sec")
    )
    views = ev.filter("event_type = 'view'").select(
        F.col("user_id").alias("v_user"), F.col("sec").alias("v_sec")
    )
    # each click probes its bucket and the next; views live in one bucket
    probe = clicks.selectExpr(
        "event_id", "user_id", "c_sec",
        f"explode(array(c_sec div {_RANGE_SEC},"
        f" c_sec div {_RANGE_SEC} + 1)) as b",
    )
    build = views.selectExpr(
        "v_user", "v_sec", f"v_sec div {_RANGE_SEC} as b"
    )
    # inner-join the candidates, filter the exact range, count — then left
    # join back so zero-match clicks keep their row (a view lives in ONE
    # bucket, so the two probe buckets never double-count it)
    matches = (
        probe.join(
            build,
            (probe.user_id == build.v_user) & (probe.b == build.b),
        )
        .filter(f"v_sec > c_sec and v_sec <= c_sec + {_RANGE_SEC}")
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return clicks.join(matches, "event_id", "left").selectExpr(
        "event_id", "user_id",
        "cast(coalesce(n, 0) as bigint) as n_views_1h",
    )


ORACLE_RANGE = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch(ts) AS sec FROM events
),
c AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'click'),
v AS (SELECT user_id, sec FROM e WHERE event_type = 'view')
SELECT c.event_id, c.user_id,
  CAST(COUNT(v.sec) AS BIGINT) AS n_views_1h
FROM c LEFT JOIN v
  ON v.user_id = c.user_id
 AND v.sec > c.sec AND v.sec <= c.sec + {_RANGE_SEC}
GROUP BY c.event_id, c.user_id
"""


OPS = {
    "rel_pricing_summary": q_pricing_summary,
    "rel_topk_per_group": q_top_orders_per_cust,
    "rel_resume_antijoin": q_orders_without_lineitems,
    "rel_sessionization": q_event_sessionization,
    "rel_rollup_counts": q_rollup_counts,
    "rel_corpus_stats": q_corpus_stats,
    "rel_length_quantiles": q_length_quantiles,
    "rel_event_windows": q_event_windows,
    "rel_asof_join": q_asof_join,
    "rel_range_join": q_range_join,
}
ORACLES = {
    "rel_pricing_summary": ORACLE_PRICING,
    "rel_topk_per_group": ORACLE_TOP_ORDERS,
    "rel_resume_antijoin": ORACLE_ANTIJOIN,
    "rel_sessionization": ORACLE_SESSIONIZATION,
    "rel_rollup_counts": ORACLE_ROLLUP,
    "rel_corpus_stats": ORACLE_CORPUS_STATS,
    "rel_length_quantiles": ORACLE_LENGTH_QUANTILES,
    "rel_event_windows": ORACLE_EVENT_WINDOWS,
    "rel_asof_join": ORACLE_ASOF,
    "rel_range_join": ORACLE_RANGE,
}
