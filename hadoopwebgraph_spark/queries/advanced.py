"""Advanced operator coverage: as-of join (an operator Spark lacks
natively, built scalably from union+window), classic multi-join analytics
(TPC-H Q3/Q5 shapes), and a pure non-equi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import ORACLE_EVENT_TS, load
from ..registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    right.ts <= left.ts within the same ``on`` key.

    Spark has no native ASOF JOIN; a naive range join explodes. This is
    the scalable formulation: union both sides tagged, one window per key
    ordered by (ts, side) carrying last non-null right values forward,
    then keep left rows. One shuffle on the key, no range explosion —
    at 100 TB this is the difference between a sort within partitions and
    an O(n*m) BNLJ.
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    unioned = lt.select(rt.columns).union(rt)
    # right rows sort before left rows at equal ts => "<=" semantics
    w = (
        W.partitionBy(on)
        .orderBy(ts, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side", *right_cols)


@register(
    "q55_asof_join",
    oracle=f"""
    WITH ev AS (SELECT event_id, user_id, {ORACLE_EVENT_TS} AS ts,
                       event_type, value FROM events),
    purchases AS (SELECT event_id, user_id, ts FROM ev
                  WHERE event_type = 'purchase'),
    views AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'view')
    SELECT p.event_id,
           p.user_id,
           v.ts            AS last_view_ts,
           round(v.value, 4) AS last_view_value
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    doc="As-of join: each purchase event joined to the user's most recent "
    "prior (or simultaneous) view. Spark side is the scalable union+window "
    "formulation; the oracle is DuckDB's native ASOF JOIN.",
)
def q55_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value")
    )
    joined = asof_join(
        purchases, views, on="user_id", ts="ts", right_cols=["ts", "view_value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_ts").alias("last_view_ts"),
        F.round("asof_view_value", 4).alias("last_view_value"),
    )


@register(
    "q56_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(floor(sum(l_extendedprice * (1 - l_discount)) + 0.5) AS BIGINT)
               AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way fact join, filtered, grouped, top-10 by "
    "revenue (classic shipping-priority query).",
)
def q56_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            # whole-unit rounding: join-reordered float sums can differ by
            # ~1e-9 between engines; 4-decimal-quantized sums sit on .xx5
            # round-to-cents boundaries ~1% of the time, whole units don't
            F.floor(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 0.5
            )
            .cast("bigint")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "revenue",
            # normalize NTZ parquet timestamp to session-TZ timestamp (UTC)
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        )
        .limit(10)
    )


@register(
    "q57_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(floor(sum(l_extendedprice * (1 - l_discount))) AS BIGINT) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE year(o_orderdate) BETWEEN 1996 AND 1997
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way join (two facts + four dims, broadcast "
    "where small) with the local-supplier co-nation condition.",
)
def q57_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    # timestamp range, not year(): only the range reaches PushedFilters
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.floor(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("bigint")
            .alias("revenue")
        )
    )


@register(
    "q58_pure_theta",
    oracle="""
    SELECT r_name, count(*) AS n_other_nations
    FROM region JOIN nation ON r_regionkey <> n_regionkey
    GROUP BY r_name
    """,
    doc="Pure non-equi join (no equi component -> broadcast nested loop): "
    "legitimate only between small/dim inputs; facts always get an equi "
    "key or a band bucket (see q08, SCALE.md).",
)
def q58_pure_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.join(n, r.r_regionkey != n.n_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_other_nations"))
    )


@register(
    "q59_merge_upsert",
    oracle="""
    WITH target AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ),
    changed AS (
        SELECT o_orderkey, o_custkey,
               round(o_totalprice + 1000.0, 2) AS o_totalprice
        FROM target WHERE o_orderkey % 100 = 0
    ),
    inserted AS (
        SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey, o_totalprice
        FROM target WHERE o_orderkey % 250 = 0
    ),
    ups AS (SELECT * FROM changed UNION ALL SELECT * FROM inserted)
    SELECT o_orderkey, o_custkey, o_totalprice FROM ups
    UNION ALL
    SELECT t.o_orderkey, t.o_custkey, t.o_totalprice
    FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM ups u WHERE u.o_orderkey = t.o_orderkey)
    """,
    doc="MERGE INTO / CDC upsert emulated on plain Spark (no Delta): "
    "matched keys take the update, unmatched source rows insert, "
    "untouched target rows pass through — anti-join + union, the "
    "standard lakehouse-free upsert. At scale both sides shuffle once "
    "on the merge key (or zero times with bucketed layout).",
)
def q59_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    changed = target.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") + 1000.0, 2).alias("o_totalprice"),
    )
    # price carried over unchanged: x/2 would land on exact .005 halves
    # where Spark (HALF_UP) and DuckDB (half-even) round apart
    inserted = target.filter(F.col("o_orderkey") % 250 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    )
    ups = changed.union(inserted)
    survivors = target.join(ups, "o_orderkey", "left_anti")
    return ups.union(survivors)


@register(
    "q106_scd2_history",
    oracle=f"""
    WITH ev AS (
        SELECT {ORACLE_EVENT_TS} AS ts, event_id, user_id, value
        FROM events WHERE event_type = 'signup' OR event_type = 'purchase'
    ),
    dedup AS (
        -- compress consecutive same-value rows per user (CDC echo drops)
        SELECT * FROM (
            SELECT ts, event_id, user_id, value,
                   lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_value
            FROM ev)
        WHERE prev_value IS NULL OR value <> prev_value
    )
    SELECT user_id,
           ts  AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
           round(value, 2) AS value,
           (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               IS NULL) AS is_current
    FROM dedup
    """,
    doc="SCD Type-2 history build from a CDC-style change feed: per-user "
    "value changes become validity intervals [valid_from, valid_to) via "
    "lead(), consecutive duplicate values compressed first, open-ended "
    "current row flagged. Deterministic (ts, event_id) ordering. At "
    "scale: two windows over the same (user_id, ts) sort — Catalyst "
    "computes them in one Exchange+Sort pass.",
)
def q106_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dedup = (
        e.select("ts", "event_id", "user_id", "value")
        .withColumn("prev_value", F.lag("value").over(w))
        .filter(F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value")))
    )
    nxt = F.lead("ts").over(w)
    return dedup.select(
        "user_id",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.round("value", 2).alias("value"),
        nxt.isNull().alias("is_current"),
    )


_Q110_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(round(sum(volume), 0) AS BIGINT) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(extract(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register(
    "q110_volume_shipping",
    oracle=_Q110_SQL,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by "
    "year — a five-way join where the two nation dims broadcast (their "
    "selective filters land BEFORE the fact joins) and only "
    "lineitem⋈orders⋈customer shuffle on their keys. Join-downstream "
    "revenue sums round to whole units per the oracle float discipline.",
)
def q110_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "supplier", "orders", "customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q110_SQL)


@register(
    "q111_latest_per_key",
    oracle=f"""
    SELECT user_id, event_type, ts AS latest_ts, round(value, 2) AS value
    FROM (
        SELECT user_id, event_type, {ORACLE_EVENT_TS} AS ts, value,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY {ORACLE_EVENT_TS} DESC, event_id DESC) AS rn
        FROM events)
    WHERE rn = 1
    """,
    doc="Latest-value-per-key (the CDC snapshot read / compacted-topic "
    "materialization): one row_number window ordered by (ts, event_id) "
    "desc with a unique tiebreak. At scale this is the standard "
    "changelog->table collapse; the window shuffles once on the key.",
)
def q111_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.round("value", 2).alias("value"),
        )
    )


@register(
    "q112_gap_fill_ffill",
    oracle=f"""
    WITH ev AS (
        SELECT {ORACLE_EVENT_TS} AS ts, user_id, value
        FROM events WHERE event_type = 'purchase' AND user_id < 8
    ),
    hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               round(sum(value), 2) AS v
        FROM ev GROUP BY 1, 2
    ),
    spans AS (
        SELECT user_id, min(h) AS hmin, max(h) AS hmax
        FROM hourly GROUP BY user_id
    ),
    grid AS (
        SELECT user_id,
               unnest(generate_series(hmin, hmax, INTERVAL '1 hour')) AS h
        FROM spans
    )
    SELECT g.user_id,
           CAST(g.h AS TIMESTAMP) AS hour,
           (hr.v IS NULL) AS was_gap,
           last_value(hr.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
    FROM grid g LEFT JOIN hourly hr
      ON hr.user_id = g.user_id AND hr.h = g.h
    """,
    doc="Time-series gap fill + forward fill (the resample/ffill Spark "
    "has no built-in for): per-user dense hourly grid via sequence() "
    "explode between that user's first and last purchase hour, left "
    "join of the hourly aggregate, carry-forward with "
    "last(ignoreNulls) over an unbounded-preceding row frame. At scale "
    "the grid is generated IN the engine (no driver loop) and every "
    "stage shuffles once on user_id.",
)
def q112_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") < 8))
        .select("user_id", F.date_trunc("hour", "ts").alias("h"), "value")
    )
    hourly = e.groupBy("user_id", "h").agg(F.round(F.sum("value"), 2).alias("v"))
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("hmin"), F.max("h").alias("hmax")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("hmin", "hmax", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour"),
        F.col("v").isNull().alias("was_gap"),
        F.last("v", ignorenulls=True).over(w).alias("value"),
    )


@register(
    "q113_corr_stats",
    oracle="""
    WITH mu AS (SELECT avg(l_extendedprice) AS m FROM lineitem)
    SELECT round(corr(l_extendedprice, l_quantity), 6)       AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS covar_s,
           round(covar_pop(l_extendedprice, l_quantity), 4)  AS covar_p,
           round(avg(pow(l_extendedprice - mu.m, 3))
                 / pow(avg(pow(l_extendedprice - mu.m, 2)), 1.5), 4)
                                                             AS skew_pop,
           round(kurtosis_pop(l_extendedprice), 4)           AS kurt_pop,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope
    FROM lineitem, mu
    GROUP BY mu.m
    """,
    doc="Bivariate/higher-moment aggregate battery: Pearson correlation, "
    "sample+population covariance, population skewness and excess "
    "kurtosis (Spark's definitions — the oracle uses kurtosis_pop and a "
    "two-pass moment formula since DuckDB's bare skewness/kurtosis are "
    "the bias-corrected sample versions), and a regression slope. All "
    "single-pass partial-aggregable moment sketches on the Spark side.",
)
def q113_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("covar_s"),
        F.round(F.covar_pop("l_extendedprice", "l_quantity"), 4).alias("covar_p"),
        F.round(F.skewness("l_extendedprice"), 4).alias("skew_pop"),
        F.round(F.kurtosis("l_extendedprice"), 4).alias("kurt_pop"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
    )


@register(
    "q125_market_share",
    oracle="""
    SELECT yr,
           round(sum(CASE WHEN nation = 'NATION_9' THEN volume ELSE 0.0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
        SELECT CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS yr,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    GROUP BY yr
    ORDER BY yr
    """,
    doc="TPC-H Q8 shape (national market share): 8-table star join — "
    "PROMO-part order volume shipped into ASIA customers, per order "
    "year, with the share supplied from NATION_9 (the fixture's top ASIA-PROMO supplier nation, so the conditional-sum branch is exercised with a non-zero share). All five dimension "
    "tables (part-filter aside) broadcast; only orders x lineitem "
    "shuffles. Share = ratio of two sums computed in one aggregate "
    "pass (conditional sum / total sum), rounded on both engines.",
)
def q125_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation")
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            vol.alias("volume"),
            "nation",
        )
    )
    return (
        joined.groupBy("yr")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_9", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("yr")
    )


@register(
    "q126_returned_item_reporting",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(floor(sum(l.l_extendedprice * (1 - l.l_discount)) + 0.5) AS BIGINT)
               AS lost_revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): revenue lost to "
    "returns per customer over one year, top-20. The returnflag filter "
    "pushes into the lineitem scan, the date filter into orders; nation "
    "broadcasts; one shuffle joins the two facts, one aggregates per "
    "customer; TakeOrderedAndProject caps the output.",
)
def q126_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.floor(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 0.5)
            .cast("bigint")
            .alias("lost_revenue")
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q131_disjunctive_predicate_join",
    oracle="""
    SELECT p.p_brand,
           CAST(floor(sum(l.l_extendedprice * (1 - l.l_discount)) + 0.5)
                AS BIGINT) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY p.p_brand
    """,
    doc="TPC-H Q19 shape (disjunctive pressure on the optimizer): an "
    "OR-of-ANDs predicate spanning both join sides. Catalyst must (a) "
    "extract the common per-side conjuncts from the disjunction and push "
    "them below the join — p_brand IN (...) and p_size/l_quantity range "
    "hulls reach the parquet scans as PushedFilters (plan-asserted in "
    "tests/test_plans.py) — and (b) keep the residual cross-side OR as "
    "the post-join filter. At 100 TB the pushed brand/range hulls prune "
    "row groups on BOTH scans before any shuffle.",
)
def q131_disjunctive_predicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.floor(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 0.5)
            .cast("bigint")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
