"""Event-time window semantics on the events table — SURVEY.md §2 Tier B′
"streaming" row, expressed batch-equivalently so the DuckDB oracle can
certify values. The same operators run as true Structured Streaming in
``hadoopwebgraph_spark.streaming.streams`` (tested with a memory sink);
the batch forms here define the exact semantics (window alignment,
session gap merging, watermark late-data policy) both paths share.

Alignment note: Spark's ``window()`` aligns to the epoch; DuckDB's
``time_bucket`` to 2000-01-01. Both are hour/minute aligned, so for the
divisor durations used here the buckets coincide exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import ORACLE_EVENT_TS, load
from ..registry import register

_EV = f"(SELECT {ORACLE_EVENT_TS} AS ts, user_id, event_type, value FROM events)"


@register(
    "q50_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM {_EV}
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour event-time window per event type.",
)
def q50_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "q51_sliding_window",
    oracle=f"""
    WITH cand AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, value FROM {_EV}
    ),
    expanded AS (
        SELECT b - INTERVAL '30 minutes' AS window_start, value FROM cand
        UNION ALL
        SELECT b AS window_start, value FROM cand
    )
    SELECT window_start, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM expanded
    GROUP BY 1
    """,
    doc="Sliding window (1 hour, 30-minute slide): each event lands in two "
    "overlapping windows; the oracle expands the two slide phases explicitly.",
)
def q51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "q52_session_window",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM {_EV}
    ),
    sess AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT user_id,
           min(ts)                        AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*)                       AS n_events,
           round(sum(value), 2)           AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    """,
    doc="Session windows (30-minute gap) per user via F.session_window; the "
    "oracle is the classic lag/gap/cumsum sessionization (session_end = "
    "last event + gap, matching Spark's definition).",
)
def q52_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q53_watermark_late_drop",
    oracle=f"""
    WITH ev AS (SELECT * FROM {_EV}),
    wm AS (SELECT max(ts) - INTERVAL '24 hours' AS cutoff FROM ev)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM ev, wm
    WHERE ts > wm.cutoff
    GROUP BY 1
    """,
    doc="Watermark late-data policy, batch-equivalent: events older than "
    "max(event_time) - 24h are dropped before windowing — exactly what "
    "withWatermark('ts','24 hours') admits once the stream has advanced.",
)
def q53_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cutoff = e.agg(
        (F.max("ts") - F.expr("INTERVAL 24 HOURS")).alias("cutoff")
    )
    kept = e.join(F.broadcast(cutoff)).filter(F.col("ts") > F.col("cutoff"))
    return (
        kept.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "q54_stream_dedup",
    oracle=f"""
    SELECT DISTINCT user_id, event_type FROM {_EV}
    """,
    doc="Stateful stream dedup batch form: first occurrence per "
    "(user_id, event_type) — dropDuplicatesWithinWatermark's batch "
    "equivalent on the key projection.",
)
def q54_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates()


_EVID = (
    f"(SELECT event_id, {ORACLE_EVENT_TS} AS ts, user_id, event_type, value "
    "FROM events)"
)


@register(
    "q102_stream_stream_join",
    oracle=f"""
    WITH ev AS (SELECT * FROM {_EVID}),
    v AS (SELECT user_id, ts, event_id FROM ev WHERE event_type = 'view'),
    p AS (SELECT user_id, ts, event_id, value FROM ev
          WHERE event_type = 'purchase')
    SELECT p.user_id,
           count(*)                                  AS n_pairs,
           CAST(count(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
           CAST(round(sum(p.value), 0) AS BIGINT)    AS attributed_value
    FROM p JOIN v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL '1 hour'
    GROUP BY p.user_id
    """,
    doc="Stream-stream interval join, batch-defined: purchases attributed "
    "to same-user views in the preceding hour, aggregated per user. The "
    "incremental twin (streaming/streams.py purchases_after_views) runs "
    "the identical join watermarked on both sides so per-side state is "
    "evicted as event time advances — the canonical bounded-state "
    "stream-stream join; stream==batch parity is asserted in "
    "tests/test_streaming.py. Join-downstream value sums round to whole "
    "units (both engines) per the oracle float discipline.",
)
def q102_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    pairs = purchases.join(
        views,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    return pairs.groupBy(F.col("p_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("purchase_id").alias("n_purchases"),
        F.round(F.sum("value"), 0).cast("bigint").alias("attributed_value"),
    )


@register(
    "q116_funnel_analysis",
    oracle=f"""
    WITH ev AS (SELECT * FROM {_EV}),
    steps AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup'  THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'view'    THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM ev GROUP BY user_id
    ),
    flags AS (
        SELECT user_id,
               (t_signup IS NOT NULL) AS s1,
               (t_signup IS NOT NULL AND t_view > t_signup) AS s2,
               (t_signup IS NOT NULL AND t_view > t_signup
                AND t_purchase > t_view) AS s3
        FROM steps
    )
    SELECT CAST(count(*) FILTER (WHERE s1) AS BIGINT) AS n_signup,
           CAST(count(*) FILTER (WHERE s2) AS BIGINT) AS n_then_view,
           CAST(count(*) FILTER (WHERE s3) AS BIGINT) AS n_then_purchase
    FROM flags
    """,
    doc="Ordered funnel analysis (signup -> first later view -> first "
    "later purchase, per user): one conditional-min aggregation per "
    "user then ordered-step flags — no joins, no windows, one shuffle "
    "on user_id with map-side partials. NULL comparisons make "
    "out-of-order or missing steps fall out of the funnel in both "
    "engines identically.",
)
def q116_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    steps = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_view"))
    return steps.agg(
        F.count(F.when(s1, 1)).alias("n_signup"),
        F.count(F.when(s2, 1)).alias("n_then_view"),
        F.count(F.when(s3, 1)).alias("n_then_purchase"),
    )


@register(
    "q117_retention_cohorts",
    oracle=f"""
    WITH ev AS (SELECT * FROM {_EV}),
    first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM ev GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS wk
        FROM ev e
    )
    SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_week,
           CAST(datediff('week', f.cohort, a.wk) AS INTEGER) AS week_offset,
           CAST(count(*) AS BIGINT) AS active_users
    FROM first_seen f
    JOIN activity a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    doc="Retention cohort matrix: users grouped by first-seen week, "
    "counted distinct-active per subsequent week offset. Two shuffles "
    "on user_id (first-seen agg + the cohort join — co-partitioned, so "
    "AQE plans them back-to-back without a third exchange), then one "
    "small matrix aggregation.",
)
def q117_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "q136_sessionize",
    oracle=f"""
    WITH ev AS (SELECT * FROM {_EVID}),
    flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessioned AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           CAST(count(*) AS BIGINT)    AS n_events,
           min(ts)                     AS session_start,
           max(ts)                     AS session_end,
           round(sum(value), 2)        AS total_value
    FROM sessioned
    GROUP BY user_id, session_seq
    """,
    doc="Batch sessionization (gaps-and-islands, 30-minute inactivity "
    "gap): lag over (user, time) flags session starts, a running sum "
    "numbers them, then one per-session rollup. The batch twin of "
    "q52's streaming session_window — this form also yields the "
    "session SEQUENCE NUMBER per user, which session_window does not "
    "expose. Scale: both window passes and the final rollup hash on "
    "user_id first, so Spark plans a single exchange on user_id and "
    "runs lag + running-sum + partial agg in one stage; sessions per "
    "user are bounded by the time range, so no group explodes. "
    "Ordering key (ts, event_id) is collision-free (event_id unique), "
    "making lag/running-sum deterministic on both engines.",
)
def q136_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | ((F.col("ts") - prev) > F.expr("INTERVAL '30' MINUTE")),
        F.lit(1),
    ).otherwise(F.lit(0))
    sessioned = e.withColumn(
        "session_seq",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessioned.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
