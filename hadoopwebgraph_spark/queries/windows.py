"""Window-function surface — SURVEY.md §2 Tier B′ (ranking, analytic,
frames). Each window partitions by a key, so at scale the shuffle is a
single hash exchange on the partition key; no global sort is ever needed.
All orderings carry a unique tiebreaker column so ranks are deterministic
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import ORACLE_EVENT_TS, load
from ..registry import register


@register(
    "q20_window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    doc="Top-3 orders per customer via row_number (the canonical top-k-per-"
    "group; one shuffle on the partition key, rank filter prunes early).",
)
def q20_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


@register(
    "q21_window_rank",
    oracle="""
    SELECT n_nationkey, s_suppkey,
           CAST(rank()       OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           round(s_acctbal, 2) AS bal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    doc="rank + dense_rank within nation.",
)
def q21_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    w = W.partitionBy("n_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "n_nationkey",
            "s_suppkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.round("s_acctbal", 2).alias("bal"),
        )
    )


@register(
    "q22_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
    doc="Running total per customer with an explicit ROWS frame.",
)
def q22_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "q23_window_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS INTEGER) AS days_since_prev
    FROM orders
    """,
    doc="lag() analytic: days between consecutive orders per customer "
    "(NULL for the first order).",
)
def q23_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    )


@register(
    "q24_window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW), 2) AS spend_90d
    FROM orders
    """,
    doc="RANGE frame over event time: trailing-90-day spend per customer "
    "(frame bound in epoch seconds so Spark and the oracle agree exactly).",
)
def q24_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").withColumn(
        "o_epoch", F.unix_timestamp("o_orderdate")
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_epoch")
        .rangeBetween(-90 * 24 * 3600, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_90d"),
    )


@register(
    "q25_window_ntile_first_last",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER w AS INTEGER)             AS quartile,
           round(first_value(c_acctbal) OVER w, 2)      AS top_bal,
           round(last_value(c_acctbal) OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING), 2)    AS bottom_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="ntile / first_value / last_value (with full-partition frame for "
    "last_value, whose default frame would otherwise be current-row-bounded).",
)
def q25_window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.first("c_acctbal").over(w), 2).alias("top_bal"),
        F.round(F.last("c_acctbal").over(w_full), 2).alias("bottom_bal"),
    )


@register(
    "q26_window_distribution",
    oracle="""
    SELECT c_custkey,
           CAST(round(percent_rank() OVER w
                      * (count(*) OVER p - 1)) AS BIGINT) AS pct_rank_num,
           CAST(round(cume_dist() OVER w
                      * count(*) OVER p) AS BIGINT)       AS cume_num,
           count(*) OVER p                                AS n_rows,
           nth_value(c_custkey, 2) OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)  AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey),
           p AS (PARTITION BY c_nationkey)
    """,
    doc="Distribution window functions: percent_rank / cume_dist / "
    "nth_value with a full-partition frame. The ratios are emitted as "
    "their EXACT integer numerators (pct*(n-1) and cume*n round back to "
    "the integers they encode within 1 ULP) plus the partition size — "
    "round(x, 6) on the raw double tie-breaks differently across "
    "engines when digit 7 is exactly 5 (first hit at sf0.1, where a "
    "640-row nation yields cume = 41/640 = 0.0640625).",
)
def q26_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    n = F.count(F.lit(1)).over(W.partitionBy("c_nationkey"))
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w) * (n - 1)).cast("bigint").alias("pct_rank_num"),
        F.round(F.cume_dist().over(w) * n).cast("bigint").alias("cume_num"),
        n.alias("n_rows"),
        F.nth_value("c_custkey", 2).over(w_full).alias("second_richest"),
    )


@register(
    "q27_rolling_time_window",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, {ORACLE_EVENT_TS} AS ts, user_id, value FROM events
    )
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           round(sum(value) OVER w, 2)     AS sum_last_hour
    FROM ev
    WHERE user_id < 100
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    """,
    doc="Rolling event-time window: per user, count and value sum over "
    "the trailing 1 hour at every event (RANGE frame with a time "
    "interval bound — peers at the same timestamp included by both "
    "engines). One hash exchange on user_id; the frame is evaluated "
    "with a sliding two-pointer pass inside each sorted partition, "
    "never by self-joining events to events (the O(n * window) trap).",
)
def q27_rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = (
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
    )
    return e.select(
        "event_id",
        "user_id",
        F.expr(f"count(*) OVER ({w})").cast("bigint").alias("n_last_hour"),
        F.round(F.expr(f"sum(value) OVER ({w})"), 2).alias("sum_last_hour"),
    )
