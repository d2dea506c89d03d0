"""Physical-plan audits: the properties that make these queries survive a
100x scale-up must be visible in the plan, not assumed — filter pushdown
into the parquet scan, column pruning, broadcast joins for dims, top-k
without a global sort, partial aggregation, whole-stage codegen."""

from __future__ import annotations

from hadoopwebgraph_spark.queries.relational import (
    q01_pricing_summary,
    q04_join_broadcast,
    q16_topk_global,
)
from hadoopwebgraph_spark.queries.windows import q20_window_topk_per_group


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_column_pruning(spark, sf_small):
    plan = _plan(q01_pricing_summary(spark, sf_small))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: none of the unused columns appear in ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_broadcast_join_for_dims(spark, sf_small):
    plan = _plan(q04_join_broadcast(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_avoids_global_sort(spark, sf_small):
    plan = _plan(q16_topk_global(spark, sf_small))
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation(spark, sf_small):
    plan = _plan(q01_pricing_summary(spark, sf_small))
    # two HashAggregate nodes: partial (map-side) + final
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen(spark, sf_small):
    df = q01_pricing_summary(spark, sf_small)
    codegen = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen" in codegen


def test_cosine_topk_broadcasts_queries(spark, sf_small):
    from hadoopwebgraph_spark.functions.similarity import q70_sim_bruteforce_topk

    plan = _plan(q70_sim_bruteforce_topk(spark, sf_small))
    # the 10-row query side must broadcast; the corpus is never shuffled
    # into a cartesian product
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_merge_upsert_plan(spark, sf_small):
    from hadoopwebgraph_spark.queries.advanced import q59_merge_upsert

    plan = _plan(q59_merge_upsert(spark, sf_small))
    # the anti-join survives as a real join (broadcast or SMJ by size),
    # never a cartesian product
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_kmeans_assignment_plan(spark, sf_small):
    """Cell assignment must broadcast the tiny centroid table and compute
    the argmax as a partial+final aggregate (one shuffled row per vector),
    not a window over the crossed rows."""
    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.similarity import (
        N_QUERIES,
        assign_cells,
        kmeans_centroids,
    )

    e = load(spark, sf_small, "embeddings")
    corpus = e.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("embedding").alias("v")
    )
    cent = kmeans_centroids(corpus, k=4, iterations=1)
    plan = _plan(assign_cells(corpus, cent))
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Aggregate") >= 2  # partial + final
    assert "Window" not in plan


def test_window_single_shuffle(spark, sf_small):
    import re

    plan = _plan(q20_window_topk_per_group(spark, sf_small))
    exchanges = [
        line for line in plan.splitlines() if re.match(r"^\(\d+\) Exchange", line)
    ]
    # one hash exchange for the window partitioning and nothing else
    assert len(exchanges) == 1
