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
