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


def test_bucketed_digest_antijoin_one_sided_exchange(spark, sf_small):
    """The incremental-dedup claim made in functions/dedup.py: with the
    digest snapshot stored as a table bucketed on the digest, the
    per-batch LEFT ANTI join reads the (huge) snapshot side co-located —
    only the (small) incoming batch is exchanged into the bucket layout.
    The snapshot side must show NO Exchange in the join plan."""
    import shutil

    from pyspark.sql import functions as F

    spark.sql("DROP TABLE IF EXISTS digests_b")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/digests_b", ignore_errors=True)

    docs = load(spark, sf_small, "documents")
    h = F.sha2(F.coalesce(F.col("text"), F.lit("")), 256).alias("h")
    snapshot = docs.filter(F.col("doc_id") % 2 == 0).select(h)
    (
        snapshot.write.mode("overwrite")
        .bucketBy(8, "h")
        .sortBy("h")
        .saveAsTable("digests_b")
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", h)

    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fresh = batch.join(spark.table("digests_b"), "h", "left_anti")
        plan = fresh._sc._jvm.PythonSQLUtils.explainString(
            fresh._jdf.queryExecution(), "formatted"
        )
        # exactly ONE exchange: the batch side repartitioning into the
        # snapshot's bucket layout; the snapshot scan itself is
        # exchange-free (its FileScan provides the hash distribution)
        assert _exchanges(fresh) == 1, plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan

        # semantics unchanged vs the unbucketed anti-join
        plain = batch.join(snapshot, "h", "left_anti")
        assert sorted(r["doc_id"] for r in fresh.collect()) == sorted(
            r["doc_id"] for r in plain.collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS digests_b")
