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


def test_ivf_incremental_append_stream(spark, sf_oracle, tmp_path):
    """Streaming IVF maintenance: new vectors appended through the
    foreachBatch path must land in the inverted file, in the SAME cell
    the batch assigner would choose, preserving the partition layout the
    probe prunes on."""
    import shutil

    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.similarity import (
        _read_model,
        assign_cells,
        ivf_index_append_stream,
    )

    # work on a COPY of the cached index — appends must not pollute the
    # shared .ann_index used by the other tests
    src_path = build_ivf_index(spark, sf_oracle)
    path = str(tmp_path / "ivf_copy")
    shutil.copytree(src_path, path)
    before = spark.read.parquet(os.path.join(path, "invfile")).count()

    # "new" vectors: 5 existing corpus embeddings under fresh vec_ids
    new_dir = str(tmp_path / "incoming")
    donors = (
        load(spark, sf_oracle, "embeddings")
        .filter(F.col("vec_id").between(100, 104))
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    donors.write.parquet(new_dir)

    q = ivf_index_append_stream(
        spark, new_dir, path, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    inv = spark.read.parquet(os.path.join(path, "invfile"))
    assert inv.count() == before + 5
    appended = {
        r.vec_id: r.cid
        for r in inv.filter(F.col("vec_id") >= 1_000_000).collect()
    }
    # cells must match what the batch assigner computes with the model
    model = _read_model(path)
    cent = spark.createDataFrame(
        [(cid, cvec) for cid, cvec in model["centroids"]],
        "cid int, cvec array<double>",
    )
    want = {
        r.vec_id: r.cid
        for r in assign_cells(
            donors.select("vec_id", F.col("embedding").alias("v")), cent
        ).collect()
    }
    assert appended == want


def test_index_build_commit_is_atomic(tmp_path):
    """Concurrent-builder race: each builder stages privately and
    publishes with one directory rename. The loser's staging copy is
    discarded without touching the winner's live index — the pre-fix
    hazard was two mode('overwrite') parquet writers interleaving in the
    same live directory."""
    from hadoopwebgraph_spark.functions.similarity import (
        _build_dir,
        _commit_build,
    )

    path = str(tmp_path / "ivf-abc")

    # winner publishes
    tmp1 = _build_dir(path)
    os.makedirs(tmp1)
    with open(os.path.join(tmp1, "model.json"), "w") as f:
        f.write('{"who": "winner"}')
    _commit_build(tmp1, path)
    assert not os.path.exists(tmp1)
    assert os.path.exists(os.path.join(path, "model.json"))

    # loser finishes later: its commit is a no-op discard
    tmp2 = _build_dir(path)
    os.makedirs(tmp2)
    with open(os.path.join(tmp2, "model.json"), "w") as f:
        f.write('{"who": "loser"}')
    _commit_build(tmp2, path)
    assert not os.path.exists(tmp2)
    with open(os.path.join(path, "model.json")) as f:
        assert "winner" in f.read()


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


def test_probes_fall_back_to_live_index_without_mirror(
    spark, sf_small, monkeypatch, tmp_path
):
    """A corpus with NO committed mirror (any user corpus) must fall back
    to the live-built index in every probe family — point the mirror
    root at an empty dir and run all four probes end-to-end."""
    from hadoopwebgraph_spark.functions import similarity as S

    monkeypatch.setattr(S, "ANN_MIRROR_ROOT", str(tmp_path / "nope"))
    for fn in (
        lambda: S.ivf_probe(spark, sf_small, nprobe=2),
        lambda: S.pq_probe(spark, sf_small, kind="pq"),
        lambda: S.pq_probe(spark, sf_small, kind="opq"),
        lambda: S.knn_graph_probe(spark, sf_small),
    ):
        df = fn()
        assert df.columns == ["query_id", "neighbor_id", "cos", "rank"]
        assert df.count() == S.N_QUERIES * S.TOP_K
