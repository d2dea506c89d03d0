"""Round-11 additions: the incremental MinHash near-dup stream and its
stream==batch equivalence contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _doc_chunks(spark, sf_small):
    from hadoopwebgraph_spark.catalog import load

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    return (
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        docs,
    )


def _drop_chunk(df, staging: str, incoming: str, name: str) -> None:
    """Land a chunk as FLAT parquet files in the watch dir (the file
    stream lists files, not nested directories)."""
    import glob
    import shutil

    df.coalesce(1).write.mode("overwrite").parquet(staging)
    os.makedirs(incoming, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(os.path.join(staging, "*.parquet")))):
        shutil.copy(f, os.path.join(incoming, f"{name}-{i}.parquet"))


def test_incremental_neardup_stream_matches_batch(spark, sf_small, tmp_path):
    """Replay the documents table as two file-stream chunks: the UNION of
    per-batch pair outputs must equal q62's batch candidate pairs on the
    whole corpus — exactly, including pairs that STRADDLE the chunks."""
    from hadoopwebgraph_spark.functions.dedup import (
        incremental_neardup_stream,
        minhash_candidate_pairs,
    )

    c1, c2, docs = _doc_chunks(spark, sf_small)
    incoming = str(tmp_path / "in")
    _drop_chunk(c1, str(tmp_path / "stage1"), incoming, "c1")
    q = incremental_neardup_stream(
        spark,
        incoming,
        str(tmp_path / "snap"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
        _drop_chunk(c2, str(tmp_path / "stage2"), incoming, "c2")
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        (r.doc_a, r.doc_b) for r in minhash_candidate_pairs(docs).collect()
    }
    assert got == want
    assert any(a % 2 != b % 2 for a, b in got), "no straddling pair — vacuous"


def test_neardup_batch_replay_idempotent(spark, sf_small, tmp_path):
    """Replaying a batch_id (crash after the signature write) must
    REPLACE its output, not double intra-batch pairs as cross pairs."""
    from hadoopwebgraph_spark.functions.dedup import (
        _neardup_one_batch,
        minhash_candidate_pairs,
    )

    c1, c2, _ = _doc_chunks(spark, sf_small)
    sigs, out = str(tmp_path / "sigs"), str(tmp_path / "out")
    _neardup_one_batch(c1, 0, sigs, out)
    _neardup_one_batch(c2, 1, sigs, out)
    before = sorted(
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(out).select("doc_a", "doc_b").collect()
    )
    _neardup_one_batch(c2, 1, sigs, out)  # checkpoint replay
    after = sorted(
        (r.doc_a, r.doc_b)
        for r in spark.read.parquet(out).select("doc_a", "doc_b").collect()
    )
    assert after == before
    # and batch-2 output really contains no self-pairing duplicates
    assert len(after) == len(set(after))
    assert set(after) == {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(c1.union(c2)).collect()
    }


def test_neardup_stream_empty_dir_raises(spark, tmp_path):
    import os as _os

    from hadoopwebgraph_spark.functions.dedup import incremental_neardup_stream

    incoming = str(tmp_path / "in")
    _os.makedirs(incoming)
    with pytest.raises(ValueError, match="pass schema= explicitly"):
        incremental_neardup_stream(
            spark,
            incoming,
            str(tmp_path / "snap"),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
        )


def test_amt_e4_exactness_property(spark):
    """The money contract behind q157-q159: for ANY 2-decimal price and
    discount, _amt_e4 equals exact rational arithmetic — lossless, so
    engine- and partition-order-independence follows from int64 math."""
    from fractions import Fraction

    from hypothesis import given, settings, strategies as st

    @given(
        price_c=st.integers(min_value=0, max_value=20_000_000),
        disc_c=st.integers(min_value=0, max_value=99),
    )
    @settings(max_examples=300, deadline=None)
    def prop(price_c, disc_c):
        price = price_c / 100.0  # the parquet double
        disc = disc_c / 100.0
        want = Fraction(price_c) * (100 - disc_c)  # exact e4 units
        got = round(price * 100) * (100 - round(disc * 100))
        assert got == want

    prop()


def test_amt_e4_spark_matches_python(spark):
    """And the Spark expression computes the same int64 as the Python
    twin on a boundary-heavy sample (x.xx5 rounding edges included)."""
    from hadoopwebgraph_spark.queries.relational2 import _amt_e4

    rows = [
        (19.17, 0.05), (0.01, 0.99), (104998.18, 0.0), (2.675, 0.07),
        (0.0, 0.0), (999.995, 0.10), (1.005, 0.01),
    ]
    df = spark.createDataFrame(
        rows, "l_extendedprice double, l_discount double"
    )
    got = [r.amt for r in df.select(_amt_e4().alias("amt")).collect()]
    want = [
        round(p * 100) * (100 - round(d * 100)) for p, d in rows
    ]
    assert got == want


def test_export_ann_mirror_reproducible(spark, sf_small, tmp_path, monkeypatch):
    """The mirror export script must stay runnable and reproduce the
    committed artifacts from the cached index builds (same corpus, same
    cache -> byte-equal rows)."""
    import duckdb

    from hadoopwebgraph_spark.functions import similarity as S
    from scripts.export_ann_mirror import export

    committed = S.ANN_MIRROR_ROOT
    e = S.load(spark, sf_small, "embeddings")
    ck = S._corpus_key(e)
    monkeypatch.setattr(S, "ANN_MIRROR_ROOT", str(tmp_path / "ann"))
    export(spark, sf_small)
    con = duckdb.connect()
    for sub, order in [
        ("ivf_invfile", "vec_id"),
        ("pq_codes", "vec_id, sub"),
        ("knng_edges", "src, dst"),
        ("opq_rotq", "query_id"),
    ]:
        a = con.sql(
            f"SELECT * FROM read_parquet('{committed}/{sub}/ckey={ck}/*.parquet')"
            f" ORDER BY {order}"
        ).fetchall()
        b = con.sql(
            f"SELECT * FROM read_parquet('{tmp_path}/ann/{sub}/ckey={ck}/*.parquet')"
            f" ORDER BY {order}"
        ).fetchall()
        assert a == b, sub


def test_incremental_curation_stream_matches_q154(spark, sf_small, tmp_path):
    """q154 as an always-on job: replay the documents table as two
    ORDERED file-stream chunks (ids in arrival order, so keep-first ==
    keep-min-id); the union of batch manifests must equal the batch
    pipeline's output exactly."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.dedup import incremental_curation_stream
    from hadoopwebgraph_spark.functions.llmprep import q154_curation_pipeline

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    incoming = str(tmp_path / "in")
    _drop_chunk(
        docs.filter(F.col("doc_id") <= mid), str(tmp_path / "s1"), incoming, "c1"
    )
    q = incremental_curation_stream(
        spark,
        incoming,
        str(tmp_path / "snap"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    try:
        q.processAllAvailable()
        _drop_chunk(
            docs.filter(F.col("doc_id") > mid), str(tmp_path / "s2"), incoming, "c2"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.doc_id, r.split, r.n_words)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("doc_id", "split", "n_words")
        .collect()
    }
    want = {
        (r.doc_id, r.split, r.n_words)
        for r in q154_curation_pipeline(spark, sf_small).collect()
    }
    assert got == want
    assert len({s for _, s, _ in got}) == 3  # all three splits non-vacuous
