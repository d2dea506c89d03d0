"""Round-12 ADVICE hardening: the ANN mirror's manifest fingerprint
assert, the live-appended-index-outranks-mirror rule, and the
release_materialized cache lever."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F


def test_mirror_manifest_fingerprint_rejects_stale_mirror(
    spark, sf_small, monkeypatch, tmp_path
):
    """A committed mirror whose ckey matches the session corpus but whose
    recorded content fingerprint does not (the ADVICE r11 scenario: a
    regenerated fixture preserving row count + first-coordinate sum) must
    raise loudly instead of silently serving stale artifacts to BOTH
    engines."""
    from hadoopwebgraph_spark.functions import similarity as S

    ck = S._corpus_key(S.load(spark, sf_small, "embeddings"))
    # clone the real mirror tree, then poison the manifest fingerprint
    root = str(tmp_path / "ann")
    shutil.copytree(S.ANN_MIRROR_ROOT, root)
    mpath = os.path.join(root, "MANIFEST.json")
    with open(mpath) as f:
        entries = json.load(f)
    entry = next(x for x in entries if x["ckey"] == ck)
    assert "rows" in entry, "export must record the strong fingerprint"
    entry["xxh"] += 1
    with open(mpath, "w") as f:
        json.dump(entries, f)

    monkeypatch.setattr(S, "ANN_MIRROR_ROOT", root)
    monkeypatch.setattr(S, "_MIRROR_VERIFIED", set())
    with pytest.raises(ValueError, match="stale"):
        S.ivf_probe(spark, sf_small, nprobe=2)


def test_mirror_manifest_fingerprint_accepts_true_corpus(spark, sf_small):
    """The committed manifest's fingerprints must match the actual
    testdata corpora — i.e. the assert is not just exercised by the
    poison test, it PASSES on the real pairing (and _verify_mirror runs
    on the default probe path: the ckey lands in the verified cache)."""
    from hadoopwebgraph_spark.functions import similarity as S

    e = S.load(spark, sf_small, "embeddings")
    ck = S._corpus_key(e)
    S._MIRROR_VERIFIED.discard(ck)
    df = S.ivf_probe(spark, sf_small, nprobe=2)
    assert df.count() == S.N_QUERIES * S.TOP_K
    assert ck in S._MIRROR_VERIFIED


def test_appended_live_index_outranks_mirror(
    spark, sf_small, monkeypatch, tmp_path
):
    """Once ivf_index_append_stream has grown the DEFAULT live index past
    its build, a default ivf_probe must read the live inverted file (the
    mirror cannot see streamed vectors — its key is corpus-derived).
    Appended vectors must therefore show up as probe candidates."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions import similarity as S

    # isolate the index cache so the append can't pollute other tests
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    monkeypatch.setattr(S, "INDEX_ROOT", str(tmp_path / "idx"))

    path = S.build_ivf_index(spark, sf_small)
    assert not S._live_appended(path)

    # clone every corpus vector under a shifted vec_id and stream it in:
    # each query's former top-1 neighbor now has an identical twin, so a
    # mirror-served probe (which can't see the twins) is detectably wrong
    new_dir = str(tmp_path / "incoming")
    donors = (
        load(spark, sf_small, "embeddings")
        .filter(F.col("vec_id") >= S.N_QUERIES)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    donors.write.parquet(new_dir)
    q = S.ivf_index_append_stream(spark, new_dir, path, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert S._live_appended(path)
    got = S.ivf_probe(spark, sf_small, nprobe=2)
    n_appended = got.filter(F.col("neighbor_id") >= 1_000_000).count()
    assert n_appended > 0, "default probe served the mirror, not the live index"


def test_release_materialized_unpersists_graph_caches(spark):
    """The retained-cache lever: after running a _materialize-backed graph
    query, release_materialized() drops every tracked cache entry and the
    query still recomputes correctly afterwards."""
    from hadoopwebgraph_spark.queries import graph as G

    G.release_materialized()  # flush whatever earlier tests left behind
    before = G.g05_two_hop(spark, "").count()
    assert len(G._MATERIALIZED) > 0
    dropped = G.release_materialized()
    assert dropped > 0 and not G._MATERIALIZED
    assert G.g05_two_hop(spark, "").count() == before
