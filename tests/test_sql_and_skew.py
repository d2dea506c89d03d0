"""SQL surface + skew utilities + In-filter pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoopwebgraph_spark.bvgraph.datasource import BVGraphReader
from hadoopwebgraph_spark.catalog import load
from hadoopwebgraph_spark.functions.skew import salted_count_distinct, salted_join
from hadoopwebgraph_spark.queries.graph import SMALL_BASENAME
from hadoopwebgraph_spark.sql import run_sql


def test_run_sql_relational(spark, sf_small):
    df = run_sql(
        spark,
        sf_small,
        "SELECT c_mktsegment, count(*) n FROM customer GROUP BY 1",
    )
    assert df.count() > 0


def test_run_sql_graph_views(spark, sf_small):
    df = run_sql(
        spark,
        sf_small,
        "SELECT count(*) AS m FROM edges JOIN graph USING (src) WHERE size(adj) > 3",
    )
    assert df.collect()[0].m > 0


def test_salted_count_distinct_exact(spark, sf_small):
    o = load(spark, sf_small, "orders")
    plain = {
        r.o_custkey: r.n
        for r in o.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderkey").alias("n"))
        .collect()
    }
    salted = {
        r.o_custkey: r.n_distinct
        for r in salted_count_distinct(o, "o_custkey", "o_orderkey", 8).collect()
    }
    assert salted == plain


def test_salted_join_exact(spark, sf_small):
    o = load(spark, sf_small, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_small, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey").count()
    salted = salted_join(o, c, "o_custkey", 4).count()
    assert salted == plain


def test_in_filter_pruning():
    reader = BVGraphReader({"basename": SMALL_BASENAME, "numsplits": "50"})
    full = len(reader.partitions())
    from pyspark.sql.datasource import In

    reader2 = BVGraphReader({"basename": SMALL_BASENAME, "numsplits": "50"})
    unsupported = reader2.pushFilters([In(("src",), (5, 10, 42))])
    assert list(unsupported)  # everything reported unsupported (re-applied)
    pruned = len(reader2.partitions())
    assert pruned < full
    assert reader2.from_node == 5 and reader2.to_node_excl == 43


def test_aqe_skew_join_splits_hot_partition(spark):
    """The runtime half of the skew story (salting is the static half):
    with AQE skew-join on, a hot key whose shuffle partition dwarfs the
    median must be SPLIT at runtime — the final plan shows
    SortMergeJoin(skew=true) reading a 'skewed' AQEShuffleRead — and the
    join stays exact. Thresholds are lowered to make the 200k-row hot
    key register at test scale; at 100 TB the defaults (256 MB / 5x
    median) trigger on real hubs with no query change."""
    from pyspark.sql import functions as F

    s = spark.newSession()  # conf isolation, q118 pattern
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }.items():
        s.conf.set(k, v)
    left = s.range(0, 220000).select(
        F.when(F.col("id") < 200000, 0)
        .otherwise((F.col("id") % 200) + 1)
        .alias("k"),
        F.concat(F.lit("payloadpayloadpayload-"), F.col("id")).alias("v"),
    )
    right = s.range(0, 201).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
    j = left.join(right, "k")
    assert len(j.collect()) == 220000  # exact despite the split
    ep = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in ep, ep
    assert "AQEShuffleRead skewed" in ep, ep
