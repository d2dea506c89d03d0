"""ANN index lifecycle: train-once/probe-many semantics and the
two-phase top-k equivalence that makes the rankers scale."""

from __future__ import annotations

import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hadoopwebgraph_spark.functions.similarity import (
    build_ivf_index,
    build_pq_index,
    ivf_probe,
    pq_probe,
    topk_per_group,
)


def test_ivf_index_build_is_cached_and_probe_reuses(spark, sf_oracle):
    path = build_ivf_index(spark, sf_oracle)
    model = os.path.join(path, "model.json")
    assert os.path.exists(model)
    assert os.path.isdir(os.path.join(path, "invfile"))
    mtime = os.path.getmtime(model)
    # second build is a no-op (cache hit keyed on corpus fingerprint)
    assert build_ivf_index(spark, sf_oracle) == path
    assert os.path.getmtime(model) == mtime
    # probe against the prebuilt index returns the full top-k shape
    rows = ivf_probe(spark, sf_oracle, index_path=path).collect()
    assert len(rows) == 50  # 10 queries x k=5
    assert {r.rank for r in rows} == {1, 2, 3, 4, 5}


def test_pq_index_build_is_cached(spark, sf_oracle):
    path = build_pq_index(spark, sf_oracle)
    model = os.path.join(path, "model.json")
    mtime = os.path.getmtime(model)
    assert build_pq_index(spark, sf_oracle) == path
    assert os.path.getmtime(model) == mtime
    rows = pq_probe(spark, sf_oracle, index_path=path).collect()
    assert len(rows) == 50


def test_ivf_inverted_file_is_partitioned_by_cell(spark, sf_oracle):
    """The inverted file is laid out for partition pruning: one parquet
    directory per cell id, so an nprobe-cell probe reads nprobe/k of the
    bytes."""
    path = build_ivf_index(spark, sf_oracle)
    cells = [
        d for d in os.listdir(os.path.join(path, "invfile")) if d.startswith("cid=")
    ]
    assert len(cells) >= 2  # k=10 learned cells (some may be empty)


def test_two_phase_topk_matches_single_window(spark):
    """topk_per_group (per-partition rank-filter then global window) must
    return exactly the rows a single global window would."""
    df = (
        spark.range(0, 5000, 1, 16)
        .select(
            (F.col("id") % 7).alias("g"),
            F.col("id").alias("item"),
            F.round(F.sin(F.col("id").cast("double")), 6).alias("score"),
        )
    )
    order = [F.col("score").desc(), F.col("item")]
    two_phase = topk_per_group(df, ["g"], order, 5).select(
        "g", "item", "score", "rank"
    )
    w = W.partitionBy("g").orderBy(*order)
    single = (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("g", "item", "score", "rank")
    )
    assert sorted(map(tuple, two_phase.collect())) == sorted(
        map(tuple, single.collect())
    )
