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


def test_release_materialized_unpersists_tracked_caches(spark):
    """The retained-cache lever: after running a _materialize-backed graph
    query, release_materialized() (= cache.release_all) drops every
    tracked entry and the query still recomputes correctly afterwards.
    Repeated same-plan runs must NOT grow the registry (semanticHash
    dedup), and the lever also covers track() sites outside graph.py."""
    from hadoopwebgraph_spark import cache
    from hadoopwebgraph_spark.queries import graph as G

    cache.release_all()  # flush whatever earlier tests left behind
    before = G.g05_two_hop(spark, "").count()
    n1 = len(cache._TRACKED)
    assert n1 > 0
    G.g05_two_hop(spark, "").count()  # same plan: registry must not grow
    assert len(cache._TRACKED) == n1
    dropped = G.release_materialized()
    assert dropped == n1 and not cache._TRACKED
    assert G.g05_two_hop(spark, "").count() == before


def test_release_covers_non_graph_track_sites(spark, sf_small):
    """q160's persisted sketches register with the same session-wide
    registry, so the one lever releases them too (the r12 review found
    the graph-only list left these pinned with no API to free them)."""
    from hadoopwebgraph_spark import cache
    from hadoopwebgraph_spark.functions.sketches import (
        q160_theta_sketch_setops,
    )

    cache.release_all()
    q160_theta_sketch_setops(spark, sf_small).count()
    assert len(cache._TRACKED) >= 2  # the two sketches
    assert cache.release_all() >= 2 and not cache._TRACKED


def test_theta_sketch_exact_below_k(spark):
    """A sketch over fewer than K distinct values retains ALL of them, so
    the estimator's exact path must return the true count."""
    from hadoopwebgraph_spark.functions.sketches import K, theta_sketch

    vals = spark.range(0, 40).selectExpr("CAST(id AS STRING) AS v")
    sk = theta_sketch(vals)
    assert sk.count() == 40 < K


def test_theta_union_of_sketches_is_union_sketch(spark):
    """KMV union correctness: the K smallest hashes of A ∪ B are always
    contained in sketch(A) ∪ sketch(B) — merging sketches loses nothing
    (the property the set algebra rests on)."""
    from hadoopwebgraph_spark.functions.sketches import K, theta_sketch

    a = spark.range(0, 500).selectExpr("CAST(id AS STRING) AS v")
    b = spark.range(300, 900).selectExpr("CAST(id AS STRING) AS v")
    direct = {
        r.h for r in theta_sketch(a.union(b)).collect()
    }
    merged = (
        theta_sketch(a)
        .union(theta_sketch(b))
        .distinct()
        .orderBy("h")
        .limit(K)
    )
    assert {r.h for r in merged.collect()} == direct


def test_q160_estimates_within_error_bound(spark, sf_oracle):
    """Every q160 estimate must land within 4 standard errors of the true
    distinct count (sigma ~ truth/sqrt(K-1) for per-set estimates; the
    intersection inherits the union's absolute error, so its bound is
    scaled by the union)."""
    import math

    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.sketches import (
        K,
        q160_theta_sketch_setops,
    )

    o = load(spark, sf_oracle, "orders")

    def truth(y0, y1):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y0}-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit(f"{y1}-01-01").cast("date"))
            )
            .select("o_custkey")
            .distinct()
            .count()
        )

    ta, tb, tu = truth(1995, 1996), truth(1996, 1997), truth(1995, 1997)
    ti = ta + tb - tu
    est = {r.op: r.est for r in q160_theta_sketch_setops(spark, sf_oracle).collect()}
    s = 4.0 / math.sqrt(K - 1)
    for op, tv, bound in [
        ("est_a", ta, s * ta),
        ("est_b", tb, s * tb),
        ("est_union", tu, s * tu),
        ("est_intersect", ti, s * tu),
        ("est_a_minus_b", ta - ti, s * tu),
    ]:
        assert abs(est[op] - tv) <= bound, (op, est[op], tv)


def test_q161_gram_prune_is_lossless(spark, sf_small):
    """The gram-pruned search must return EXACTLY the brute-force
    contains() matches — the prune may never drop a true occurrence
    (every match of a >=8-char pattern shares all its 8-grams)."""
    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.search import (
        _patterns,
        q161_substring_search,
    )

    docs = load(spark, sf_small, "documents").select(
        "doc_id", "text", "n_chars"
    )
    brute = (
        _patterns(docs)
        .crossJoin(docs.select("doc_id", "text"))
        .filter(F.expr("contains(text, pat)"))
        .select("pattern_id", "doc_id")
    )
    got = {(r.pattern_id, r.doc_id) for r in q161_substring_search(spark, sf_small).collect()}
    want = {(r.pattern_id, r.doc_id) for r in brute.collect()}
    assert got == want and len(want) >= 3  # each pattern hits its source


def test_q162_model_seam_and_rank_contract(spark, sf_small):
    """The model seam rejects non-stub names loudly (a real encoder plugs
    in there); ranks are 1..<=10 per query with scores non-increasing and
    doc_id ascending within score ties."""
    import pytest as _pytest

    from hadoopwebgraph_spark.functions.search import (
        CrossEncoderStub,
        q162_crossencoder_rerank,
    )

    with _pytest.raises(NotImplementedError):
        CrossEncoderStub.load("minilm-cross-encoder")

    rows = q162_crossencoder_rerank(spark, sf_small).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(r.score > 0 for r in rs)
        for a, b in zip(rs, rs[1:]):
            assert (a.score, -a.doc_id) >= (b.score, -b.doc_id) or (
                a.score > b.score
            )
            if a.score == b.score:
                assert a.doc_id < b.doc_id


def test_q161_posting_list_branch_matches_probe_branch(
    spark, sf_small, monkeypatch
):
    """The large-workload posting-list branch (explode + equi-join) must
    return exactly what the literal-gram contains() probe returns — the
    two prune directions are interchangeable by construction."""
    from hadoopwebgraph_spark.functions import search as S

    probe = {
        (r.pattern_id, r.doc_id)
        for r in S.q161_substring_search(spark, sf_small).collect()
    }
    monkeypatch.setattr(S, "_GRAM_PROBE_MAX", 0)
    posting = {
        (r.pattern_id, r.doc_id)
        for r in S.q161_substring_search(spark, sf_small).collect()
    }
    assert probe == posting and len(probe) >= 3


# ---------------------------------------------------------------------------
# theta-sketch property tests: a pure-Python reference of the same
# 40-bit md5 hash + KMV semantics, driven by hypothesis (Spark jobs per
# example would be prohibitive); one Spark anchor test pins the two
# implementations to identical hash values.
# ---------------------------------------------------------------------------

import hashlib

from hypothesis import given, settings, strategies as st


def _ref_hash(x) -> int:
    return int(hashlib.md5(f"theta-{x}".encode()).hexdigest()[:10], 16)


def _ref_sketch(values, k=64):
    return sorted({_ref_hash(v) for v in values})[:k]


@settings(max_examples=150, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=10**6), max_size=300),
    st.sets(st.integers(min_value=0, max_value=10**6), max_size=300),
)
def test_kmv_union_merge_property(a, b):
    """sketch(A ∪ B) == k-smallest of (sketch(A) ∪ sketch(B)) for
    arbitrary sets — the losslessness the q160 union estimate rests on."""
    merged = sorted(set(_ref_sketch(a)) | set(_ref_sketch(b)))[:64]
    assert merged == _ref_sketch(a | b)


@settings(max_examples=150, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**6), max_size=63))
def test_kmv_exact_below_k(vals):
    """Below K distinct values the sketch IS the value set (hash
    collisions aside — none occur in this domain) and the exact-count
    path returns truth."""
    sk = _ref_sketch(vals)
    assert len(sk) == len({_ref_hash(v) for v in vals})
    if len(sk) < 64:
        est = len(sk)  # the n < K branch of the estimator
        assert est == len({_ref_hash(v) for v in vals})


@settings(max_examples=100, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=2000), min_size=100, max_size=400),
    st.sets(st.integers(min_value=0, max_value=2000), min_size=100, max_size=400),
)
def test_kmv_intersection_sample_is_valid(a, b):
    """Every hash the intersection estimator counts (in both sketches,
    below the min theta) must belong to a TRUE common element — the
    sample never contains false positives (md5 is collision-free on
    this domain), so the estimate is an unbiased scaled count."""
    sa, sb = _ref_sketch(a), _ref_sketch(b)
    ta = sa[-1] if len(sa) == 64 else 1 << 40
    tb = sb[-1] if len(sb) == 64 else 1 << 40
    cutoff = min(ta, tb)
    sample = {h for h in sa if h < cutoff} & set(sb)
    true_hashes = {_ref_hash(v) for v in a & b}
    assert sample <= true_hashes


def test_theta_hash_spark_matches_reference(spark):
    """Anchor: Spark's conv(substr(md5..)) 40-bit hash must equal the
    pure-Python reference on a value sample — the property tests above
    then transfer to the DataFrame implementation."""
    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.functions.sketches import theta_hash

    vals = [0, 1, 7, 123456, 999999, 2**31]
    df = spark.createDataFrame([(str(v),) for v in vals], "v string")
    got = {r.v: r.h for r in df.select("v", theta_hash(F.col("v")).alias("h")).collect()}
    for v in vals:
        assert got[str(v)] == _ref_hash(v)


def test_q161_empty_pattern_corpus_returns_empty(spark, sf_small, monkeypatch):
    """A corpus with no qualifying pattern source doc must yield an empty
    result with the contract schema (not a zero-arg array() plan)."""
    from hadoopwebgraph_spark.functions import search as S

    monkeypatch.setattr(S, "N_PATTERNS", 3)

    def no_patterns(docs):
        return docs.filter(F.lit(False)).select(
            F.col("doc_id").alias("pattern_id"),
            F.substring("text", 9, 12).alias("pat"),
        )

    monkeypatch.setattr(S, "_patterns", no_patterns)
    df = S.q161_substring_search(spark, sf_small)
    assert df.columns == ["pattern_id", "doc_id"]
    assert df.count() == 0


def test_q73_gate_stays_mirror_pinned_after_append(
    spark, sf_small, monkeypatch, tmp_path
):
    """The registered q73 gate must keep reading the committed mirror
    even after ivf_index_append_stream grows the default live index —
    its DuckDB oracle can only see the mirror, so gate truth is the
    mirror by contract (review r12: without the pin, one local append
    turned q73 parity permanently red). Production ivf_probe defaults
    still flip to the live index (covered above)."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions import similarity as S
    from hadoopwebgraph_spark.registry import all_queries

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    monkeypatch.setattr(S, "INDEX_ROOT", str(tmp_path / "idx"))
    path = S.build_ivf_index(spark, sf_small)
    donors = (
        load(spark, sf_small, "embeddings")
        .filter(F.col("vec_id") >= S.N_QUERIES)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    new_dir = str(tmp_path / "incoming")
    donors.write.parquet(new_dir)
    q = S.ivf_index_append_stream(spark, new_dir, path, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert S._live_appended(path)

    rows = all_queries()["q73_sim_ivf_kmeans_topk"].fn(spark, sf_small).collect()
    assert rows and all(r.neighbor_id < 1_000_000 for r in rows), (
        "q73 gate read the appended live index instead of the mirror"
    )


def _drop_files(df, staging: str, incoming: str, name: str) -> None:
    """Land a chunk as flat parquet files in the watch dir (file streams
    list files, not nested directories) — the round-11 helper shape."""
    import glob
    import shutil as _sh

    df.coalesce(1).write.mode("overwrite").parquet(staging)
    os.makedirs(incoming, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(os.path.join(staging, "*.parquet")))):
        _sh.copy(f, os.path.join(incoming, f"{name}-{i}.parquet"))


def test_incremental_theta_sketch_matches_batch(spark, sf_small, tmp_path):
    """Stream the orders custkeys in two chunks: the snapshot sketch must
    equal the BATCH sketch over the union corpus EXACTLY (KMV merge is
    lossless), and the estimator must return the identical int64."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.sketches import (
        incremental_theta_sketch,
        theta_estimate,
        theta_sketch,
        theta_sketch_snapshot,
    )

    keys = load(spark, sf_small, "orders").select(
        F.col("o_custkey").cast("string").alias("key")
    )
    c1 = keys.filter(F.crc32("key") % 2 == 0)
    c2 = keys.filter(F.crc32("key") % 2 == 1)
    incoming = str(tmp_path / "incoming")
    snapshot = str(tmp_path / "snap")

    _drop_files(c1, str(tmp_path / "s1"), incoming, "c1")
    q = incremental_theta_sketch(
        spark, incoming, snapshot, str(tmp_path / "ck"), "key"
    )
    try:
        q.processAllAvailable()
        _drop_files(c2, str(tmp_path / "s2"), incoming, "c2")
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {r.h for r in theta_sketch_snapshot(spark, snapshot).collect()}
    batch = {r.h for r in theta_sketch(keys).collect()}
    assert streamed == batch and len(batch) > 0
    est_s = theta_estimate(theta_sketch_snapshot(spark, snapshot)).collect()
    est_b = theta_estimate(theta_sketch(keys)).collect()
    assert est_s[0].est == est_b[0].est > 0


def test_theta_batch_replay_is_idempotent(spark, sf_small, tmp_path):
    """Re-running a batch under the same batch_id (checkpoint replay
    after a crash between snapshot write and commit) must leave the
    snapshot sketch unchanged."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.sketches import (
        _theta_one_batch,
        theta_sketch_snapshot,
    )

    keys = load(spark, sf_small, "orders").select(
        F.col("o_custkey").cast("string").alias("key")
    )
    snap = str(tmp_path / "snap")
    # deterministic subset: limit() without orderBy may pick different
    # rows across jobs (review r12) — a fake flake in disguise
    subset = keys.filter(F.crc32("key") % 3 == 0)
    _theta_one_batch(subset, 0, "key", snap)
    first = {r.h for r in theta_sketch_snapshot(spark, snap).collect()}
    assert first
    _theta_one_batch(subset, 0, "key", snap)  # replay: stage discarded
    assert {r.h for r in theta_sketch_snapshot(spark, snap).collect()} == first
    # no leftover staging dirs after the replay discard
    assert not [d for d in os.listdir(snap) if d.startswith(".stage-")]


def test_incremental_theta_raises_on_empty_watch_dir(spark, tmp_path):
    """The file-stream hardening rule: empty watch dir + no declared
    schema raises instead of silently defaulting."""
    from hadoopwebgraph_spark.functions.sketches import (
        incremental_theta_sketch,
    )

    with pytest.raises(ValueError, match="no files"):
        incremental_theta_sketch(
            spark,
            str(tmp_path / "empty"),
            str(tmp_path / "snap"),
            str(tmp_path / "ck"),
            "key",
        )


def test_theta_snapshot_k_marker_prevents_drift(spark, sf_small, tmp_path):
    """The writer records k; a later batch with a different k raises, a
    reader with a mismatched k raises, and theta_snapshot_estimate uses
    the recorded k (review r12: a saturated k=32 sketch read as k=64
    silently takes the exact branch and undercounts)."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.sketches import (
        _theta_one_batch,
        theta_estimate,
        theta_sketch,
        theta_sketch_snapshot,
        theta_snapshot_estimate,
    )

    keys = load(spark, sf_small, "orders").select(
        F.col("o_custkey").cast("string").alias("key")
    )
    snap = str(tmp_path / "snap")
    _theta_one_batch(keys, 0, "key", snap, k=32)
    with pytest.raises(ValueError, match="k=32"):
        _theta_one_batch(keys, 1, "key", snap, k=64)
    with pytest.raises(ValueError, match="k=32"):
        theta_sketch_snapshot(spark, snap, k=64)
    # the drift-proof consumer path returns the k=32 estimate exactly
    want = theta_estimate(theta_sketch(keys, 32), 32).collect()[0].est
    got = theta_snapshot_estimate(spark, snap).collect()[0].est
    assert got == want > 32  # estimator branch, not the saturated count


def test_incremental_inverted_index_matches_batch(spark, sf_small, tmp_path):
    """Stream the documents table in two chunks: the snapshot index must
    equal q137_inverted_index on the union corpus EXACTLY, column for
    column (this equivalence test IS the anti-drift gate — the twin
    deliberately does not share code with the driver-stamped q137)."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.text import (
        incremental_inverted_index,
        inverted_index_snapshot,
        q137_inverted_index,
    )

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    c1 = docs.filter(F.col("doc_id") % 2 == 0)
    c2 = docs.filter(F.col("doc_id") % 2 == 1)
    incoming = str(tmp_path / "incoming")
    snapshot = str(tmp_path / "snap")

    _drop_files(c1, str(tmp_path / "s1"), incoming, "c1")
    q = incremental_inverted_index(
        spark, incoming, snapshot, str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
        _drop_files(c2, str(tmp_path / "s2"), incoming, "c2")
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = {
        r.term: (r.df, r.total_tf, r.postings)
        for r in inverted_index_snapshot(spark, snapshot).collect()
    }
    batch = {
        r.term: (r.df, r.total_tf, r.postings)
        for r in q137_inverted_index(spark, sf_small).collect()
    }
    assert streamed == batch and len(batch) > 10


def test_inverted_index_batch_replay_is_idempotent(spark, sf_small, tmp_path):
    """Replaying a landed batch under the same batch_id (stage discarded
    against the published partition) leaves the index unchanged."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.text import (
        _tf_one_batch,
        inverted_index_snapshot,
    )

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    chunk = docs.filter(F.col("doc_id") % 3 == 0)
    snap = str(tmp_path / "snap")
    _tf_one_batch(chunk, 0, snap)
    first = {
        (r.term, r.df, r.total_tf, r.postings)
        for r in inverted_index_snapshot(spark, snap).collect()
    }
    assert first
    _tf_one_batch(chunk, 0, snap)  # replay
    assert {
        (r.term, r.df, r.total_tf, r.postings)
        for r in inverted_index_snapshot(spark, snap).collect()
    } == first
    assert not [d for d in os.listdir(snap) if d.startswith(".stage-")]


def test_incremental_priority_sample_matches_batch(spark, sf_small, tmp_path):
    """Stream the documents in two chunks: the snapshot sample must equal
    q121_weighted_sample on the union corpus EXACTLY (the top-k-by-
    priority merge is lossless under the same (priority DESC, doc_id)
    order both sides use)."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.sampling import (
        incremental_priority_sample,
        priority_sample_snapshot,
        q121_weighted_sample,
    )

    docs = load(spark, sf_small, "documents")
    c1 = docs.filter(F.col("doc_id") % 2 == 0)
    c2 = docs.filter(F.col("doc_id") % 2 == 1)
    incoming = str(tmp_path / "incoming")
    snapshot = str(tmp_path / "snap")

    _drop_files(c1, str(tmp_path / "s1"), incoming, "c1")
    q = incremental_priority_sample(
        spark, incoming, snapshot, str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
        _drop_files(c2, str(tmp_path / "s2"), incoming, "c2")
        q.processAllAvailable()
    finally:
        q.stop()

    streamed = [
        (r.doc_id, r.n_chars, r.priority)
        for r in priority_sample_snapshot(spark, snapshot).collect()
    ]
    batch = [
        (r.doc_id, r.n_chars, r.priority)
        for r in q121_weighted_sample(spark, sf_small).collect()
    ]
    assert streamed == batch and len(batch) == 50


def test_priority_sample_replay_and_k_guard(spark, sf_small, tmp_path):
    """Replay leaves the snapshot unchanged (stage discarded) and a k
    mismatch raises on both the writer and the reader."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.sampling import (
        _priority_one_batch,
        priority_sample_snapshot,
    )

    docs = load(spark, sf_small, "documents")
    chunk = docs.filter(F.col("doc_id") % 3 == 0)
    snap = str(tmp_path / "snap")
    _priority_one_batch(chunk, 0, snap, k=20)
    first = [tuple(r) for r in priority_sample_snapshot(spark, snap).collect()]
    assert len(first) == 20
    _priority_one_batch(chunk, 0, snap, k=20)  # replay
    assert [
        tuple(r) for r in priority_sample_snapshot(spark, snap).collect()
    ] == first
    with pytest.raises(ValueError, match="k=20"):
        _priority_one_batch(chunk, 1, snap, k=50)
    with pytest.raises(ValueError, match="k=20"):
        priority_sample_snapshot(spark, snap, k=50)
    assert not [d for d in os.listdir(snap) if d.startswith(".stage-")]


def test_publish_partition_reraises_non_replay_failures(spark, tmp_path):
    """A rename failure whose target is NOT a published partition must
    re-raise (review r12: swallowing it committed batches whose data
    never landed — silent permanent loss); a true replay (target dir
    exists) discards the stage; orphaned stages of the same batch are
    reclaimed on the next publish."""
    from hadoopwebgraph_spark.functions.snapshot_util import (
        publish_partition,
    )

    snap = str(tmp_path / "snap")
    df = spark.range(5).selectExpr("id AS h")
    publish_partition(df, snap, 0)
    assert os.path.isdir(os.path.join(snap, "batch_id=0"))

    # replay: succeeds silently, no stage leftovers
    publish_partition(df, snap, 0)
    assert not [d for d in os.listdir(snap) if d.startswith(".stage-")]

    # non-replay failure: the final path is occupied by a plain FILE
    with open(os.path.join(snap, "batch_id=1"), "w") as f:
        f.write("stray")
    with pytest.raises(OSError):
        publish_partition(df, snap, 1)

    # orphaned stage from a simulated crash is swept by the next publish
    os.makedirs(os.path.join(snap, ".stage-2-deadbeef"))
    publish_partition(df, snap, 2)
    assert not [d for d in os.listdir(snap) if d.startswith(".stage-2-")]
    assert os.path.isdir(os.path.join(snap, "batch_id=2"))


def test_snapshot_meta_kind_and_missing_marker_guards(spark, tmp_path):
    """Wrong-kind reads and missing-marker reads raise instead of
    guessing (a lost marker read at a default k serves wrong ranks
    silently); an explicit k is trusted only when no marker exists."""
    from hadoopwebgraph_spark.functions.snapshot_util import (
        ensure_meta,
        resolve_k,
    )

    snap = str(tmp_path / "snap")
    ensure_meta(snap, "theta_sketch", 32)
    assert resolve_k(snap, "theta_sketch", None) == 32
    with pytest.raises(ValueError, match="kind"):
        resolve_k(snap, "priority_sample", None)
    with pytest.raises(ValueError, match="kind"):
        ensure_meta(snap, "priority_sample", 32)

    bare = str(tmp_path / "bare")
    os.makedirs(bare)
    with pytest.raises(ValueError, match="no _snapshot_meta"):
        resolve_k(bare, "theta_sketch", None)
    assert resolve_k(bare, "theta_sketch", 16) == 16  # explicit override
