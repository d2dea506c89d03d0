"""Round-13 consolidation hardening (VERDICT r12 + ADVICE r12):

- the ANN mirror-resolution preamble must be O(1) when no mirror can
  match (scale hazard #1: a production corpus with no committed mirror
  paid a full embeddings scan per default probe, to learn nothing), and
  memoized per (session, corpus) when one can;
- _live_appended detects appends by file identity recorded at build
  time, not mtimes (ADVICE: coarse timestamps / rsync'ed artifacts).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


def test_no_corpus_scan_when_mirror_root_absent(
    spark, sf_small, monkeypatch, tmp_path
):
    """With no committed mirror tree at all, every default probe must
    resolve 'no mirror' from the filesystem alone — the ckey corpus
    aggregate (a full embeddings scan + collect) must never run."""
    from hadoopwebgraph_spark.functions import similarity as S

    monkeypatch.setattr(S, "ANN_MIRROR_ROOT", str(tmp_path / "nope"))

    def boom(_e):
        raise AssertionError(
            "_corpus_key ran with no mirror root present — the O(1) "
            "short-circuit regressed (VERDICT r12 hazard #1)"
        )

    monkeypatch.setattr(S, "_corpus_key", boom)
    for fn in (
        lambda: S.ivf_probe(spark, sf_small, nprobe=2),
        lambda: S.pq_probe(spark, sf_small, kind="pq"),
        lambda: S.pq_probe(spark, sf_small, kind="opq"),
        lambda: S.knn_graph_probe(spark, sf_small),
    ):
        assert fn().count() == S.N_QUERIES * S.TOP_K


def test_mirror_subdir_missing_short_circuits(
    spark, sf_small, monkeypatch, tmp_path
):
    """A mirror root that exists but lacks a REQUIRED sub (here:
    knng_edges) must short-circuit too — partial mirrors can't match."""
    import shutil

    from hadoopwebgraph_spark.functions import similarity as S

    root = str(tmp_path / "ann")
    shutil.copytree(S.ANN_MIRROR_ROOT, root)
    shutil.rmtree(os.path.join(root, "knng_edges"))
    monkeypatch.setattr(S, "ANN_MIRROR_ROOT", root)
    monkeypatch.setattr(
        S, "_corpus_key", lambda _e: pytest.fail("scan despite missing sub")
    )
    df = S.knn_graph_probe(spark, sf_small)
    assert df.count() == S.N_QUERIES * S.TOP_K


def test_ckey_memoized_per_session_corpus(spark, sf_small, monkeypatch):
    """With a matching mirror, the corpus-key aggregate runs ONCE per
    (session, corpus) across repeated probes of different families."""
    from hadoopwebgraph_spark.functions import similarity as S

    calls = []
    real = S._corpus_key

    def counting(e):
        calls.append(1)
        return real(e)

    monkeypatch.setattr(S, "_corpus_key", counting)
    monkeypatch.setattr(S, "_CKEY_MEMO", {})
    S.ivf_probe(spark, sf_small, nprobe=2).count()
    S.ivf_probe(spark, sf_small, nprobe=2).count()
    S.knn_graph_probe(spark, sf_small).count()
    assert len(calls) == 1


def test_ckey_memo_cleared_by_release_all(spark, sf_small):
    from hadoopwebgraph_spark import cache
    from hadoopwebgraph_spark.functions import similarity as S

    S._CKEY_MEMO.clear()
    S.ivf_probe(spark, sf_small, nprobe=2).count()
    assert S._CKEY_MEMO
    cache.release_all()
    assert not S._CKEY_MEMO


def test_live_appended_detects_old_mtime_appends(
    spark, sf_small, monkeypatch, tmp_path
):
    """The ADVICE r12 scenario: an appended invfile part whose mtime
    PRECEDES model.json (coarse filesystem clock, rsync -a restore). The
    old mtime heuristic missed it; the build-time file manifest must
    catch it by identity."""
    from hadoopwebgraph_spark.functions import similarity as S

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    monkeypatch.setattr(S, "INDEX_ROOT", str(tmp_path / "idx"))
    path = S.build_ivf_index(spark, sf_small)

    model = S._read_model(path)
    assert model["invfile_files"] == S._invfile_files(path)
    assert not S._live_appended(path)

    # plant an appended part stamped BEFORE the build completed
    cid_dir = os.path.join(path, "invfile", "cid=0")
    os.makedirs(cid_dir, exist_ok=True)
    planted = os.path.join(cid_dir, "part-appended-old-mtime.parquet")
    with open(planted, "wb") as f:
        f.write(b"")
    built = os.stat(os.path.join(path, "model.json")).st_mtime
    os.utime(planted, (built - 3600, built - 3600))

    assert S._live_appended(path), (
        "append with pre-build mtime went undetected — file-manifest "
        "comparison regressed to mtimes"
    )


def test_live_appended_legacy_model_falls_back_to_mtime(
    spark, sf_small, monkeypatch, tmp_path
):
    """Indexes built before the manifest field (model.json without
    invfile_files) keep the mtime behavior instead of erroring."""
    from hadoopwebgraph_spark.functions import similarity as S

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    monkeypatch.setattr(S, "INDEX_ROOT", str(tmp_path / "idx"))
    path = S.build_ivf_index(spark, sf_small)
    mpath = os.path.join(path, "model.json")
    with open(mpath) as f:
        model = json.load(f)
    del model["invfile_files"]
    with open(mpath, "w") as f:
        json.dump(model, f)

    assert not S._live_appended(path)
    # a NEWER-than-model append is still caught by the legacy path
    cid_dir = os.path.join(path, "invfile", "cid=0")
    os.makedirs(cid_dir, exist_ok=True)
    planted = os.path.join(cid_dir, "part-appended-new.parquet")
    with open(planted, "wb") as f:
        f.write(b"")
    built = os.stat(mpath).st_mtime
    os.utime(planted, (built + 3600, built + 3600))
    assert S._live_appended(path)
