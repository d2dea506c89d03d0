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
