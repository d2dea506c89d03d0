"""Second tranche of relational coverage — the SURVEY §2 Tier B′ rows not
exercised by queries/relational.py: right/full/cross joins, exact
percentiles, map/JSON object functions, unpivot, in-memory scans, and a
point lookup on the BVGraph source (A6 random access)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import track
from ..catalog import load
from ..registry import register


@register(
    "q18_join_right",
    oracle="""
    SELECT n_name, count(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Right outer join preserving nations with zero suppliers.",
)
def q18_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "q19_join_full",
    oracle="""
    SELECT coalesce(a.k, b.k)  AS k,
           count(a.n_1995)     AS in_1995,
           count(b.n_1996)     AS in_1996
    FROM (SELECT o_custkey AS k, count(*) AS n_1995 FROM orders
          WHERE year(o_orderdate) = 1995 GROUP BY 1) a
    FULL JOIN (SELECT o_custkey AS k, count(*) AS n_1996 FROM orders
               WHERE year(o_orderdate) = 1996 GROUP BY 1) b
      ON a.k = b.k
    GROUP BY 1
    """,
    doc="Full outer join: customer activity union across two years, "
    "preserving either-side-only keys.",
)
def q19_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")

    def year_counts(y: int, out: str) -> DataFrame:
        # timestamp range, not year(): only the range reaches PushedFilters
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .groupBy(F.col("o_custkey").alias("k"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    a = year_counts(1995, "n_1995")
    b = year_counts(1996, "n_1996")
    return (
        a.join(b, a.k == b.k, "full")
        .select(
            F.coalesce(a.k, b.k).alias("k"),
            a.n_1995.alias("n_1995"),
            b.n_1996.alias("n_1996"),
        )
        .groupBy("k")
        .agg(
            F.count("n_1995").alias("in_1995"),
            F.count("n_1996").alias("in_1996"),
        )
    )


@register(
    "q43_join_cross",
    oracle="""
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
    doc="Explicit cross join (bounded: dims only — never on facts).",
)
def q43_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    r1 = r.alias("r1")
    r2 = r.alias("r2")
    return (
        r1.crossJoin(r2)
        .filter(F.col("r1.r_regionkey") < F.col("r2.r_regionkey"))
        .select(
            F.col("r1.r_name").alias("region_a"), F.col("r2.r_name").alias("region_b")
        )
    )


@register(
    "q44_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 2)  AS p50,
           round(quantile_cont(l_quantity, 0.95), 2) AS p95,
           round(quantile_cont(l_quantity, 0.99), 2) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact continuous percentiles (median/p95/p99) per group over the "
    "integer-valued quantity measure (interpolation is binary-exact, so "
    "both engines agree bit-for-bit); approx_percentile is the scale path "
    "(q45).",
)
def q44_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 2).alias("p95"),
        F.round(F.expr("percentile(l_quantity, 0.99)"), 2).alias("p99"),
    )


@register(
    "q45_approx_percentiles",
    oracle=None,  # sketch values are engine-specific
    doc="approx_percentile (KLL-style sketch): single-pass, mergeable — "
    "the 100 TB percentile path. Rows-only check (sketch estimates are "
    "engine-specific).",
)
def q45_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 2).alias(
            "p50_approx"
        )
    )


@register(
    "q46_map_fns",
    oracle="""
    SELECT event_type,
           count(*)                                   AS n,
           min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k
    FROM events
    WHERE len(json_keys(props)) = 1
    GROUP BY event_type
    """,
    doc="Map/JSON object surface: parse props into a map, inspect keys "
    "(from_json + map_keys on the Spark side, json_keys in the oracle).",
)
def q46_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        e.withColumn("m", m)
        .filter(F.size(F.map_keys(F.col("m"))) == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col("m").getItem("k")).alias("min_k"),
        )
    )


@register(
    "q47_unpivot",
    oracle="""
    SELECT l_returnflag, metric, round(val, 2) AS val
    FROM (
        SELECT l_returnflag,
               sum(l_quantity)      AS total_qty,
               sum(l_extendedprice) AS total_price
        FROM lineitem GROUP BY l_returnflag
    ) UNPIVOT (val FOR metric IN (total_qty, total_price))
    """,
    doc="Unpivot (wide -> long) via stack().",
)
def q47_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("total_qty"),
        F.sum("l_extendedprice").alias("total_price"),
    )
    return wide.selectExpr(
        "l_returnflag",
        "stack(2, 'total_qty', total_qty, 'total_price', total_price) AS (metric, v)",
    ).select("l_returnflag", "metric", F.round("v", 2).alias("val"))


@register(
    "q48_inmemory_scan",
    oracle="""
    SELECT t.tier, count(*) AS n_nations
    FROM nation
    JOIN (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma'), (3, 'delta'),
                 (4, 'epsilon')) AS t(r_key, tier)
      ON n_regionkey = t.r_key
    GROUP BY t.tier
    """,
    doc="In-memory createDataFrame source (driver-local literal table) "
    "broadcast-joined against a parquet table.",
)
def q48_inmemory_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    tiers = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma"), (3, "delta"), (4, "epsilon")],
        "r_key int, tier string",
    )
    return (
        n.join(F.broadcast(tiers), n.n_regionkey == tiers.r_key)
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@register(
    "g10_point_lookup",
    oracle="SELECT src, CAST(len(adj) AS INTEGER) AS outdeg, adj[1] AS first_succ "
    "FROM read_parquet('/root/repo/fixtures/small_adj.parquet') WHERE src = 1234",
    doc="Point lookup src = k on the BVGraph source (Tier A6 random-access "
    "outdegree): pushFilters prunes to the single covering partition.",
)
def g10_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import graph_df

    g = graph_df(spark)
    return g.filter(F.col("src") == 1234).select(
        "src",
        F.size("adj").alias("outdeg"),
        F.col("adj").getItem(0).alias("first_succ"),
    )


@register(
    "q49_collect_agg",
    oracle="""
    SELECT n_nationkey,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
           CAST(count(DISTINCT s_name) AS INTEGER) AS n_uniq
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    doc="Collection aggregates: collect_list -> sorted join (string_agg "
    "oracle) and collect_set cardinality.",
)
def q49_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias(
                "suppliers"
            ),
            F.size(F.collect_set("s_name")).alias("n_uniq"),
        )
    )


Q149_KEYS = "(0, 2, 4, 6, 8, 10, 12)"  # the Q22 'country code' IN-list


@register(
    "q149_global_sales_opportunity",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        FROM customer
        WHERE c_nationkey IN {Q149_KEYS}
    ),
    pos AS (SELECT * FROM base WHERE cents > 0),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(cents) AS BIGINT) AS total
        FROM pos
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(cents) AS BIGINT) AS totacctbal_cents
    FROM base, stats
    WHERE cents * cnt > total
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = base.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 (global sales opportunity) adapted to the fixture "
    "schema (c_nationkey plays the phone country code): customers from "
    "a fixed key set with above-average positive balance and NO URGENT "
    "orders (the fixture's order density makes the literal "
    "never-ordered set empty below sf0.1 — vacuous; the priority-"
    "filtered anti join keeps Q22's exact shape non-vacuously at every "
    "SF), grouped with count + balance total. The composite exercises "
    "IN-list pruning, a scalar aggregate threshold, a null-aware anti "
    "join and a final rollup in ONE query. Float discipline: balances "
    "are integer cents and the above-mean test is the cross-multiplied "
    "cents*cnt > total — no float average crosses engines, no summation-"
    "order risk. Scale: the 1-row stats table broadcast-nested-loops "
    "into the customer scan; the anti join shuffles only the key-set "
    "customers against the orders key column (Catalyst rewrites NOT "
    "EXISTS to a left-anti hash join).",
)
def q149_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    base = c.filter(
        F.col("c_nationkey").isin([0, 2, 4, 6, 8, 10, 12])
    ).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    stats = base.filter(F.col("cents") > 0).groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    return (
        base.join(F.broadcast(stats))
        .filter(F.col("cents") * F.col("cnt") > F.col("total"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT").select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum("cents").cast("bigint").alias("totacctbal_cents"),
        )
    )


LATE_DAYS = 365  # synthetic dates have no commit/receipt pair; "late" is
# shipdate lagging the order date by more than a year (p75-ish here)


@register(
    "q151_waiting_suppliers",
    oracle=f"""
    WITH l1 AS MATERIALIZED (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): late line "
    "items on finalized multi-supplier orders where the blamed supplier "
    "is the ONLY late one — an EXISTS plus a NOT EXISTS, both "
    "correlated on the order key with a supplier inequality. The late "
    "predicate is adapted to this schema (no commit/receipt dates): "
    "shipdate more than a year after the order date. Scale shape: the "
    "late set is computed once and persisted (it feeds both the probe "
    "side and the NOT-EXISTS side); the EXISTS becomes a LEFT SEMI and "
    "the NOT EXISTS a LEFT ANTI hash join, both keyed on l_orderkey "
    "with the supplier inequality as a residual — per-order fan-in is "
    "line-count bounded, so no quadratic blowup; supplier is broadcast; "
    "the top-20 is TakeOrderedAndProject. Counts are exact integers, "
    "the s_name tiebreak makes the cut deterministic.",
)
def q151_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    # the late set feeds two consumers (probe + anti side): persist, or
    # the join subtree runs twice (the q137/q142 subtree-duplication note)
    late = track(
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        # session-retained cache (contract in queries/graph._materialize;
        # released session-wide by cache.release_all)
        .persist()
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    blamed = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q152_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): left outer "
    "join so zero-order customers survive with c_count = 0, a non-key "
    "predicate folded INTO the join condition (not a post-filter — an "
    "outer-join-semantics distinction Catalyst must not flatten), then "
    "a histogram of the per-customer counts. Scale shape: the first "
    "aggregation is keyed on c_custkey (unique, skew-free, map-side "
    "partials); the second input is one row per customer and the "
    "histogram output is near-constant cardinality, so the final "
    "shuffle is trivially small. Exact integer output.",
)
def q152_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


LARGE_ORDER_QTY = 250  # sum-of-quantities cut: ~1% of orders at every SF


@register(
    "q153_large_volume_customer",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > {LARGE_ORDER_QTY}
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume customers): an IN subquery over a "
    "HAVING-filtered aggregate of the SAME fact table, joined back "
    "through orders to the customer dimension, re-aggregated per order "
    "and top-100'd by price. Scale shape: Catalyst rewrites the IN as "
    "a left-semi hash join keyed on l_orderkey, and the qualifying-key "
    "set (~1% of orders) arrives ALREADY aggregated — only (orderkey) "
    "keys shuffle into the semi, never a second copy of lineitem; both "
    "lineitem aggregations are map-side-partial on the natural "
    "l_orderkey clustering; customer is NOT broadcast-hinted (it is a "
    "fact-sized dimension at warehouse scale — AQE picks broadcast at "
    "small SF and a shuffled hash join beyond); the top-100 is "
    "TakeOrderedAndProject with "
    "an o_orderkey tiebreak so the cut is deterministic. Quantities "
    "are integral in this fixture, so sum_qty is an exact BIGINT on "
    "both engines; o_totalprice passes through untouched (same parquet "
    "bits, no float arithmetic).",
)
def q153_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > LARGE_ORDER_QTY)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Round-11 TPC-H shape completions: Q12 / Q14 / Q15 / Q17 equivalents on
# the fixture's columns (no l_shipmode/l_commitdate/partsupp here, so the
# adaptations keep each query's OPTIMIZER SHAPE — join direction,
# conditional aggregation, view+scalar-subquery, decorrelated per-group
# average — while substituting available attributes; each doc notes the
# substitution). Money arithmetic follows the q150/q157 integer contract:
# 2-decimal prices and discounts become exact int64 e4 units
# (cents x (100 - discount_cents)), so sums, shares and thresholds are
# bit-identical across engines with NO float luck.
# ---------------------------------------------------------------------------

_AMT_E4_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT) "
    "* (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def _amt_e4() -> F.Column:
    """Exact discounted line amount in 1e-4 currency units (int64):
    round(price*100) * (100 - round(disc*100)). Prices/discounts are
    2-decimal by fixture contract, so this is lossless; the int64 bound
    holds to ~8e9 rows of max-price lines per aggregate."""
    return F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        100 - F.round(F.col("l_discount") * 100).cast("bigint")
    )


@register(
    "q156_late_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE year(l_shipdate) = 1997
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape (shipping-mode priority matrix; the fixture "
    "has no l_shipmode/l_commitdate, so l_linestatus stands in as the "
    "line attribute and the ship-year as the date band — the shape "
    "under test is the FILTERED-FACT-side join plus the two-way "
    "conditional count): the l_shipdate predicate pushes to the "
    "lineitem scan BEFORE the join, orders joins only surviving lines, "
    "counts are CASE sums inside one partial-agg'd HashAggregate. "
    "Pure integer output.",
)
def q156_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # range predicate, not year(): functions over the column don't reach
    # the parquet scan; the range lands in PushedFilters (plan-pinned)
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q157_promo_revenue",
    oracle=f"""
    WITH r AS (
        SELECT {_AMT_E4_SQL} AS amt_e4, p_type
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE year(l_shipdate) = 1997
    )
    SELECT CAST((10000 * sum(CASE WHEN p_type = 'PROMO' THEN amt_e4
                                  ELSE 0 END)) // sum(amt_e4) AS BIGINT)
               AS promo_bp,
           CAST(sum(CASE WHEN p_type = 'PROMO' THEN amt_e4 ELSE 0 END)
                AS BIGINT) AS promo_e4,
           CAST(sum(amt_e4) AS BIGINT) AS total_e4
    FROM r
    """,
    doc="TPC-H Q14 shape (promotion revenue share): part broadcasts "
    "into the date-pruned lineitem scan, the share is ONE conditional "
    "aggregate. Float discipline: the discounted amount is an exact "
    "int64 in 1e-4 units (cents x (100 - disc_cents)) and the share is "
    "integer basis points via int division — sums and the ratio are "
    "bit-identical across engines and partition orders, unlike the "
    "float 100*sum/sum in the original. int64 headroom: the 1e4 x sum "
    "product overflows only past ~8e5 max-price lines per e4 unit "
    "sum ~ 9e14, i.e. ~1e9 rows at this price distribution.",
)
def q157_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    promo = F.when(F.col("p_type") == "PROMO", _amt_e4()).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).alias("_promo"),
            F.sum(_amt_e4()).alias("_total"),
        )
        .select(
            F.expr("(10000 * _promo) div _total").alias("promo_bp"),
            F.col("_promo").alias("promo_e4"),
            F.col("_total").alias("total_e4"),
        )
    )


@register(
    "q158_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, CAST(sum({_AMT_E4_SQL}) AS BIGINT) AS total_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_e4
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_e4 = (SELECT max(total_e4) FROM rev)
    """,
    doc="TPC-H Q15 shape (top supplier via the revenue view + scalar "
    "max subquery, ties kept): the quarterly revenue aggregate is "
    "computed ONCE and persisted — it feeds both the scalar max and "
    "the equality probe (the q142 shared-subtree rule; the view is one "
    "narrow row per supplier, so the cache is broadcast-sized) — then "
    "supplier (a dim) broadcasts onto the winners. Revenue is the "
    "exact int64 e4 amount, so the max-equality never hits a float "
    "tie; ties in revenue are returned, matching Q15's semantics.",
)
def q158_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = track(
        li.groupBy("l_suppkey")
        .agg(F.sum(_amt_e4()).alias("total_e4"))
        # session-retained cache (contract in queries/graph._materialize;
        # released session-wide by cache.release_all)
        .persist()
    )
    mx = rev.agg(F.max("total_e4").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_e4 == F.col("_mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_e4")
    )


@register(
    "q159_small_quantity_revenue",
    oracle=f"""
    WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
    bl AS (
        SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
               {_AMT_E4_SQL} AS amt_e4
        FROM lineitem JOIN bp ON p_partkey = l_partkey
    ),
    agg AS (
        SELECT l_partkey AS pk, CAST(sum(qty) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS cq
        FROM bl GROUP BY l_partkey
    )
    SELECT CAST(sum(amt_e4) // 7 AS BIGINT) AS avg_yearly_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM bl JOIN agg ON pk = l_partkey
    WHERE 5 * qty * cq < sq
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue: lines below 20% "
    "of their part's average quantity; fixture has no p_container, so "
    "the brand filter alone scopes the parts): the correlated "
    "avg-subquery DECORRELATES into a per-part aggregate joined back to "
    "the same filtered line set — computed once and persisted (it "
    "feeds the aggregate AND the probe). The threshold comparison is "
    "cross-multiplied to pure integers (5*qty*cnt < sum_qty), so no "
    "float average exists anywhere; the brand predicate reaches the "
    "part scan and the part keys broadcast into the lineitem scan. "
    "Output in exact e4 units, integer-divided by Q17's 7.0 constant.",
)
def q159_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    bp = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    bl = track(
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(bp), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            F.col("l_quantity").cast("bigint").alias("qty"),
            _amt_e4().alias("amt_e4"),
        )
        # session-retained cache (contract in queries/graph._materialize;
        # released session-wide by cache.release_all)
        .persist()
    )
    agg = bl.groupBy("l_partkey").agg(
        F.sum("qty").alias("sq"), F.count(F.lit(1)).alias("cq")
    )
    return (
        bl.join(agg.withColumnRenamed("l_partkey", "pk"),
                F.col("l_partkey") == F.col("pk"))
        .filter(5 * F.col("qty") * F.col("cq") < F.col("sq"))
        .agg(
            F.expr("sum(amt_e4) div 7").alias("avg_yearly_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
