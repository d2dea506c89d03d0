"""Set operations, distinct, pivot, subqueries and the scalar-function
surface (string / date / math / array / json) — SURVEY.md §2 Tier B′.

Array functions matter doubly here: the engine's graph data model is
``(src, adj array<int>)`` (reference WebGraphInputFormat.java:16), so
explode/size/sort/slice are core operators, exercised both here on the
documents table and in queries/graph.py on the BVGraph source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def _custkeys_in_year(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # timestamp range, not year(): only the range reaches PushedFilters
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01").cast("timestamp"))
            & (
                F.col("o_orderdate")
                < F.lit(f"{year + 1}-01-01").cast("timestamp")
            )
        )
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )


@register(
    "q30_union",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    UNION
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    doc="UNION (distinct) of two filtered key sets.",
)
def q30_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _custkeys_in_year(spark, sf_dir, 1995)
    b = _custkeys_in_year(spark, sf_dir, 1996)
    return a.union(b).distinct()


@register(
    "q31_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    doc="INTERSECT: customers active in both years.",
)
def q31_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _custkeys_in_year(spark, sf_dir, 1995)
    b = _custkeys_in_year(spark, sf_dir, 1996)
    return a.intersect(b)


@register(
    "q32_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    doc="EXCEPT: customers active in 1995 that churned in 1996.",
)
def q32_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _custkeys_in_year(spark, sf_dir, 1995)
    b = _custkeys_in_year(spark, sf_dir, 1996)
    return a.exceptAll(b).distinct()


@register(
    "q33_string_fns",
    oracle="""
    SELECT c_custkey,
           upper(substr(c_name, 1, 8))                        AS name_prefix,
           lower(c_mktsegment)                                AS segment,
           CAST(length(c_name) AS INTEGER)                    AS name_len,
           concat(c_mktsegment, '/', CAST(c_nationkey AS VARCHAR)) AS seg_nat,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT)   AS parsed_id
    FROM customer
    """,
    doc="String surface: substr/upper/lower/length/concat/regexp_extract.",
)
def q33_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
        F.lower("c_mktsegment").alias("segment"),
        F.length("c_name").alias("name_len"),
        F.concat(
            F.col("c_mktsegment"), F.lit("/"), F.col("c_nationkey").cast("string")
        ).alias("seg_nat"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("bigint").alias("parsed_id"),
    )


@register(
    "q34_date_fns",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER)     AS o_year,
           CAST(month(o_orderdate) AS INTEGER)    AS o_month,
           CAST(quarter(o_orderdate) AS INTEGER)  AS o_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           count(*)                               AS n_orders,
           CAST(min(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate))
                AS INTEGER)                       AS min_days_since_epoch
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
    doc="Date surface: year/month/quarter/date_trunc/datediff.",
)
def q34_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            F.quarter("o_orderdate").alias("o_quarter"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(
                F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
            ).alias("min_days_since_epoch"),
        )
    )


@register(
    "q35_math_fns",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - l_quantity * 1000.0), 6) AS spread,
           round(ln(l_extendedprice + 1.0), 6)                  AS ln_price,
           round(log10(l_extendedprice + 1.0), 6)               AS log10_price,
           round(sqrt(l_quantity), 6)                           AS sqrt_qty,
           round(power(1.0 + l_discount, 2.0), 6)               AS disc_sq,
           l_linenumber % 3                                     AS line_mod
    FROM lineitem
    WHERE l_linenumber <= 2
    """,
    doc="Math surface: abs/ln/log10/sqrt/power/modulo, rounded for hashing.",
)
def q35_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000.0), 6).alias(
            "spread"
        ),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("ln_price"),
        F.round(F.log10(F.col("l_extendedprice") + 1.0), 6).alias("log10_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow(F.lit(1.0) + F.col("l_discount"), 2.0), 6).alias("disc_sq"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
    )


@register(
    "q36_array_fns",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER)                  AS n_tokens,
           list_contains(string_split(text, ' '), 'spark')               AS has_spark,
           array_to_string(list_sort(string_split(text, ' '))[1:3], '|') AS first3_sorted,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER)  AS n_uniq
    FROM documents
    """,
    doc="Array surface over tokenized text: split/size/contains/sort/slice/"
    "distinct — the same primitives the graph adjacency model uses.",
)
def q36_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.concat_ws("|", F.slice(F.sort_array(toks), 1, 3)).alias("first3_sorted"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
    )


@register(
    "q37_json_fns",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2) AS avg_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER))           AS max_k,
           count(*)                                                          AS n
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured surface: JSON path extraction on events.props.",
)
def q37_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 2).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q38_case_coalesce",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END                         AS bucket,
           coalesce(nullif(o_orderstatus, 'P'), 'PEND')  AS status,
           count(*)                                      AS n
    FROM orders
    GROUP BY 1, 2
    """,
    doc="Conditional expressions: CASE WHEN / nullif / coalesce.",
)
def q38_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    status = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PEND"))
    return (
        o.select(bucket.alias("bucket"), status.alias("status"))
        .groupBy("bucket", "status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q39_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Pivot (wide aggregation) with explicit value list; the oracle is "
    "the equivalent CASE-WHEN formulation.",
)
def q39_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return p


@register(
    "q40_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    doc="dropDuplicates / DISTINCT on a projection.",
)
def q40_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").dropDuplicates()


@register(
    "q41_in_subquery",
    oracle="""
    SELECT p_brand, count(*) AS n_parts
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
    )
    GROUP BY p_brand
    """,
    doc="IN-subquery (compiles to a left-semi join in Catalyst).",
)
def q41_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_parts
        FROM part
        WHERE p_partkey IN (
            SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
        )
        GROUP BY p_brand
        """
    )


@register(
    "q42_scalar_subquery",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    """,
    doc="Uncorrelated scalar subquery (broadcast single-row result).",
)
def q42_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


_Q103_SQL = """
SELECT p.p_partkey,
       s.s_name,
       round(l.l_extendedprice, 2) AS min_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size >= 40
  AND l.l_extendedprice = (
      SELECT min(l2.l_extendedprice)
      FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey)
"""


@register(
    "q103_correlated_agg_subquery",
    oracle=_Q103_SQL,
    doc="TPC-H Q2-shaped correlated aggregate subquery: for each large "
    "part, the supplier(s) selling it at its global minimum price. "
    "Catalyst decorrelates the per-part min into an aggregate + join "
    "(no per-row re-execution) — asserted in tests/test_plans.py; at "
    "100 TB the rewritten plan is two shuffles on l_partkey, not an "
    "O(parts) subquery loop.",
)
def q103_correlated_agg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("part", "lineitem", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q103_SQL)


_Q104_SQL = """
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= DATE '1995-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
GROUP BY o.o_orderpriority
"""

_Q104_DUCK = """
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= DATE '1995-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
"""


@register(
    "q104_exists_subquery",
    oracle=_Q104_DUCK,
    doc="TPC-H Q4-shaped correlated EXISTS: orders with at least one "
    "late-shipping lineitem, counted by priority. Catalyst rewrites the "
    "EXISTS into a left-semi hash join on l_orderkey with the "
    "correlated date predicate as the join condition — bounded state, "
    "no subquery loop.",
)
def q104_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q104_SQL)
