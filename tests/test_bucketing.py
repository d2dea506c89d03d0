"""Bucketing: pre-shuffled storage layout so repeated joins/aggs on the
bucket key read co-located data with NO exchange — the 100 TB answer to
'this join shuffles every day'. The plan assertion is the point."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from hadoopwebgraph_spark.catalog import load


def _exchanges(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return len([l for l in plan.splitlines() if re.match(r"^\(\d+\) Exchange", l)])


def test_bucketed_join_skips_shuffle(spark, sf_small):
    li = load(spark, sf_small, "lineitem").filter("l_linenumber <= 2")
    o = load(spark, sf_small, "orders")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    # a previously failed run may leave the managed location behind
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_b", "o_b"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_b")
    )
    (
        o.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("o_b")
    )

    # disable broadcast so the comparison isolates bucketing vs shuffle
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
        # both sides pre-bucketed on the key: zero exchanges in the join plan
        assert _exchanges(joined) == 0

        plain = li.join(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        )
        assert _exchanges(plain) >= 1  # same join without bucketing shuffles

        # results agree
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    # bucketed aggregation on the bucket key also skips the exchange
    agg = spark.table("li_b").groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert _exchanges(agg) == 0
