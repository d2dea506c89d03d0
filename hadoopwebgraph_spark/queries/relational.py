"""Relational operator surface — SURVEY.md §2 Tier B′ (scans, filters,
joins of every flavor, aggregations, rollup/cube/grouping-sets, top-k).

The reference implements none of these: its contract ends at handing Spark
an RDD (reference README.md:17-23); here each operator is a first-class,
oracle-checked query over the driver's star schema.

Scale notes (100 TB):
- Every scan is a plain parquet read -> Catalyst pushes filters and prunes
  columns into the scan (verified via .explain in tests/test_plans.py).
- Dimension joins (region/nation/supplier) are explicitly broadcast —
  no shuffle of the fact table for those.
- Fact-fact joins (orders x lineitem) shuffle on the join key; AQE handles
  skew and coalescing. groupBy aggregations use partial (map-side) combine
  automatically.
- Floating aggregates are rounded on BOTH engine and oracle side so the
  driver's value hash is robust to summation-order ULP drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


# ---------------------------------------------------------------------------
# scans / projection / filter
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           CAST(floor(sum(l_extendedprice * (1 - l_discount)) + 0.5) AS BIGINT)
               AS sum_disc_price,
           CAST(floor(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 0.5) AS BIGINT)
               AS sum_charge,
           round(avg(l_quantity), 2)                                        AS avg_qty,
           round(avg(l_extendedprice), 2)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: the flagship scan+filter+hash-agg.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # whole-unit rounding for 4/6-decimal-quantized product sums:
            # their cent-rounding boundaries are hit ~1% of groups, whole
            # units are 1e-9-robust across engines
            F.floor(F.sum(disc_price) + 0.5).cast("bigint").alias("sum_disc_price"),
            F.floor(F.sum(disc_price * (1 + F.col("l_tax"))) + 0.5)
            .cast("bigint")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_filter_project",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
           CAST(year(o_orderdate) AS INTEGER) AS o_year
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
    """,
    doc="Projection + conjunctive filter; both predicates push to the scan.",
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("price"),
            F.year("o_orderdate").alias("o_year"),
        )
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@register(
    "q03_join_inner",
    oracle="""
    SELECT c_mktsegment,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Fact-dim equi join (shuffle or broadcast per AQE) + hash agg.",
)
def q03_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "q04_join_broadcast",
    oracle="""
    SELECT r_name,
           count(*)                  AS n_customers,
           round(avg(c_acctbal), 2)  AS avg_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Snowflake dim chain with explicit broadcast of the small dims: "
    "at 100 TB the customer table never shuffles for this join.",
)
def q04_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
    )


@register(
    "q05_join_left_histogram",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
    doc="Left outer join preserving customers with zero orders, then an "
    "order-count histogram (two-level aggregation).",
)
def q05_join_left_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q06_join_semi",
    oracle="""
    SELECT n_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY n_name
    """,
    doc="Left-semi join (EXISTS): customers that placed a 1997 order.",
)
def q06_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q07_join_anti",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders at all.",
)
def q07_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q08_join_theta",
    oracle="""
    SELECT n_name, count(*) AS n_pairs
    FROM supplier s
    JOIN customer c ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    JOIN nation ON n_nationkey = s.s_nationkey
    GROUP BY n_name
    """,
    doc="Theta join: equi key (nation) + inequality predicate on balances. "
    "The equi part keeps it a hash join; the inequality is a post-filter, "
    "so this stays shuffle-bounded instead of cartesian at scale.",
)
def q08_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q09_self_join",
    oracle="""
    SELECT count(*) AS n_pairs, count(DISTINCT l1.l_orderkey) AS n_orders
    FROM lineitem l1
    JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l1.l_linenumber < l2.l_linenumber
    """,
    doc="Self equi-join on the fact table (same-order line pairs).",
)
def q09_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    l1 = li.alias("l1")
    l2 = li.alias("l2")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_linenumber") < F.col("l2.l_linenumber")),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("l1.l_orderkey").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


@register(
    "q10_agg_stats",
    oracle="""
    SELECT l_linestatus,
           round(min(l_extendedprice), 2)         AS min_price,
           round(max(l_extendedprice), 2)         AS max_price,
           round(avg(l_extendedprice), 2)         AS avg_price,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           CAST(sum(l_linenumber) AS BIGINT)      AS sum_lines,
           count(*)                               AS n
    FROM lineitem
    GROUP BY l_linestatus
    """,
    doc="Full scalar-aggregate battery: min/max/avg/stddev/sum/count with "
    "automatic partial (map-side) aggregation.",
)
def q10_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.sum("l_linenumber").cast("bigint").alias("sum_lines"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q11_count_distinct",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           count(DISTINCT o_custkey)          AS n_active_customers,
           count(*)                           AS n_orders
    FROM orders
    GROUP BY 1
    """,
    doc="Exact distinct aggregation (expand + two-phase agg in Spark).",
)
def q11_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.countDistinct("o_custkey").alias("n_active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q12_approx_distinct",
    oracle=None,  # HLL sketch values are engine-specific -> rows-only check
    doc="approx_count_distinct (HyperLogLog++): the 100 TB-friendly distinct. "
    "No DuckDB oracle because sketch estimates are engine-specific.",
)
def q12_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"))
    )


@register(
    "q13_rollup",
    oracle="""
    SELECT r_name, n_name,
           count(*)                   AS n_customers,
           round(sum(c_acctbal), 2)   AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="Hierarchical ROLLUP (region -> nation -> grand total).",
)
def q13_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@register(
    "q14_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*)                  AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two low-cardinality dimensions (all 2^2 grouping sets).",
)
def q14_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "q15_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    doc="Explicit GROUPING SETS via the SQL surface.",
)
def q15_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "q16_topk_global",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k: Spark plans TakeOrderedAndProject — no full sort, "
    "each partition keeps k rows then the driver merges (scale-safe).",
)
def q16_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .limit(10)
    )


@register(
    "q17_having",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT o_custkey, count(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 3
    )
    GROUP BY n_orders
    """,
    doc="Aggregate + HAVING filter (post-aggregation predicate).",
)
def q17_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    per_cust = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))
