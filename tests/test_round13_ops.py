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


# ---------------------------------------------------------------------------
# Snapshot compaction (VERDICT r12 hazard #2) + reader staleness
# (ADVICE r12 medium) for the batch-partition streaming twins.
# ---------------------------------------------------------------------------


def _land_tf_batches(spark, sf_small, snap, splits=(0, 1, 2), mod=3):
    """Publish the documents table as ``len(splits)`` tf partials, one
    batch per doc_id residue class — together they cover the corpus, so
    the snapshot index must equal q137 on the full table."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.text import _tf_one_batch

    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    for i in splits:
        _tf_one_batch(docs.filter(F.col("doc_id") % mod == i), i, snap)


def _index_rows(spark, snap):
    from hadoopwebgraph_spark.functions.text import inverted_index_snapshot

    return {
        (r.term, r.df, r.total_tf, r.postings)
        for r in inverted_index_snapshot(spark, snap).collect()
    }


def test_inverted_index_exact_across_compaction(spark, sf_small, tmp_path):
    """streamed==q137 must hold BEFORE, AFTER, and ACROSS compactions —
    including a batch landing after the first fold and a second fold
    over (fold, new batch)."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.snapshot_util import compact_snapshot
    from hadoopwebgraph_spark.functions.text import (
        _tf_one_batch,
        q137_inverted_index,
    )

    snap = str(tmp_path / "snap")
    # r14: the newest live batch never folds (publish_partition's reset
    # guard relies on covered ids being checkpoint-committed), so three
    # batches land before the first fold and batch 2 stays live
    _land_tf_batches(spark, sf_small, snap, splits=(0, 1, 2), mod=4)
    docs = load(spark, sf_small, "documents").select("doc_id", "text")

    partial = _index_rows(spark, snap)
    out = compact_snapshot(spark, snap, target_bytes=1 << 30)
    assert out["batch_id"] == -1 and out["rows"] > 0
    assert sorted(os.listdir(snap))[0] == "batch_id=-1"
    assert _index_rows(spark, snap) == partial

    # a post-compaction batch must appear in the served index
    _tf_one_batch(docs.filter(F.col("doc_id") % 4 == 3), 3, snap)
    full = {
        (r.term, r.df, r.total_tf, r.postings)
        for r in q137_inverted_index(spark, sf_small).collect()
    }
    assert _index_rows(spark, snap) == full

    # second fold over (batch_id=-1, batch_id=2) — batch 3 stays live
    out2 = compact_snapshot(spark, snap, target_bytes=1 << 30)
    assert out2["batch_id"] == -2
    assert _index_rows(spark, snap) == full
    # converged: a third run with only (fold, newest) left is a no-op
    out3 = compact_snapshot(spark, snap, target_bytes=1 << 30)
    assert out3["batch_id"] is None


def test_compaction_crash_points_stay_exact(spark, sf_small, tmp_path):
    """Every crash point of compact_snapshot leaves reads exact:
    (a) an orphaned staging dir is invisible; (b) sources surviving a
    crashed deletion are excluded by the fold's _covers marker; (c) a
    marker-less negative dir (impossible under the atomic install —
    foreign layout or non-atomic fs) is ignored by reads and REFUSED by
    the compactor (deleting it could destroy a foreign fold)."""
    import shutil

    from hadoopwebgraph_spark.functions.snapshot_util import (
        compact_snapshot,
        live_batch_dirs,
    )

    snap = str(tmp_path / "snap")
    _land_tf_batches(spark, sf_small, snap)
    baseline = _index_rows(spark, snap)

    # (a) staging leftover
    os.makedirs(os.path.join(snap, ".compact-deadbeef", "x"), exist_ok=True)
    assert _index_rows(spark, snap) == baseline

    # (b) crashed deletion: compact, then resurrect a source partition
    saved = str(tmp_path / "saved")
    shutil.copytree(os.path.join(snap, "batch_id=1"), saved)
    out = compact_snapshot(spark, snap, target_bytes=1 << 30)
    assert out["batch_id"] == -1
    assert not os.path.isdir(os.path.join(snap, ".compact-deadbeef"))
    shutil.copytree(saved, os.path.join(snap, "batch_id=1"))
    assert os.path.basename(live_batch_dirs(snap)[0]) == "batch_id=-1"
    # the fold + the never-folded newest batch; resurrected source excluded
    assert len(live_batch_dirs(snap)) == 2
    assert _index_rows(spark, snap) == baseline
    # re-running compaction finishes the deletion and converges
    compact_snapshot(spark, snap, target_bytes=1 << 30)
    assert not os.path.isdir(os.path.join(snap, "batch_id=1"))
    assert _index_rows(spark, snap) == baseline

    # (c) marker-less negative dir: reads skip it, compaction refuses
    fresh = str(tmp_path / "snap2")
    _land_tf_batches(spark, sf_small, fresh)
    base2 = _index_rows(spark, fresh)
    bogus = os.path.join(fresh, "batch_id=-7")
    shutil.copytree(os.path.join(fresh, "batch_id=0"), bogus)
    cov = os.path.join(bogus, "_covers.json")
    if os.path.exists(cov):
        os.remove(cov)
    assert len(live_batch_dirs(fresh)) == 3
    assert _index_rows(spark, fresh) == base2
    with pytest.raises(ValueError, match="refusing to guess"):
        compact_snapshot(spark, fresh, target_bytes=1 << 30)
    # operator removes the foreign dir; compaction then folds exactly
    shutil.rmtree(bogus)
    compact_snapshot(spark, fresh, target_bytes=1 << 30)
    assert _index_rows(spark, fresh) == base2


def test_inverted_index_snapshot_not_stale_after_new_batch(
    spark, sf_small, tmp_path
):
    """ADVICE r12 (medium): a snapshot read, then a NEW batch, then a
    re-read — the second read must serve the grown index, not the
    persisted first read (cache-manager path matching served a frozen
    index before)."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.text import _tf_one_batch

    snap = str(tmp_path / "snap")
    _land_tf_batches(spark, sf_small, snap, splits=(0,), mod=2)
    first = _index_rows(spark, snap)
    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    _tf_one_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, snap)
    second = _index_rows(spark, snap)
    assert second != first
    # exact on the union, not merely different
    from hadoopwebgraph_spark.functions.text import q137_inverted_index

    assert second == {
        (r.term, r.df, r.total_tf, r.postings)
        for r in q137_inverted_index(spark, sf_small).collect()
    }


def test_tf_snapshot_memo_cleared_by_release_all(spark, sf_small, tmp_path):
    from hadoopwebgraph_spark import cache
    from hadoopwebgraph_spark.functions import text as T

    snap = str(tmp_path / "snap")
    _land_tf_batches(spark, sf_small, snap, splits=(0,), mod=2)
    _index_rows(spark, snap)
    assert T._TF_SNAPSHOT_MEMO
    cache.release_all()
    assert not T._TF_SNAPSHOT_MEMO
    assert _index_rows(spark, snap)  # recomputes fine after release


def test_theta_and_priority_snapshots_survive_compaction(
    spark, sf_small, tmp_path
):
    """compact_snapshot is row-multiset-preserving, so the other two
    twins' read-time merges are unchanged by a fold."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.sampling import (
        _priority_one_batch,
        priority_sample_snapshot,
    )
    from hadoopwebgraph_spark.functions.sketches import (
        _theta_one_batch,
        theta_sketch_snapshot,
    )
    from hadoopwebgraph_spark.functions.snapshot_util import compact_snapshot

    docs = load(spark, sf_small, "documents")
    tsnap, psnap = str(tmp_path / "theta"), str(tmp_path / "prio")
    # three batches: the newest never folds (r14), so two must fold
    for i in (0, 1, 2):
        chunk = docs.filter(F.col("doc_id") % 3 == i)
        _theta_one_batch(chunk.select("text"), i, "text", tsnap, 64)
        _priority_one_batch(chunk, i, psnap)

    theta_before = [r.h for r in theta_sketch_snapshot(spark, tsnap).collect()]
    prio_before = [tuple(r) for r in priority_sample_snapshot(spark, psnap).collect()]
    assert compact_snapshot(spark, tsnap)["batch_id"] == -1
    assert compact_snapshot(spark, psnap)["batch_id"] == -1
    assert [r.h for r in theta_sketch_snapshot(spark, tsnap).collect()] == theta_before
    assert [
        tuple(r) for r in priority_sample_snapshot(spark, psnap).collect()
    ] == prio_before


def test_sessionize_state_version_mismatch_raises():
    """VERDICT r12 #6: a state tuple written by a different layout
    version (simulating a restart from an old checkpoint) must raise a
    clear reset-the-checkpoint error at the first state read — the v1
    float total and the v2 cents long are byte-width-identical, so
    without the version field it would decode silently as garbage."""
    import pandas as pd

    from hadoopwebgraph_spark.streaming.streams import (
        SESSIONIZE_STATE_V,
        make_sessionize_update,
    )

    class StubState:
        def __init__(self, seeded=None):
            self._v, self.exists = seeded, seeded is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v, self.exists = v, True

    t0 = pd.Timestamp("2024-01-01 09:00:00")
    chunk = pd.DataFrame(
        {"ts": [t0], "event_id": [0], "value": [1.0]}
    )
    update = make_sessionize_update()

    # fresh state: runs and stores the current version as field 0
    st = StubState()
    list(update((7,), iter([chunk]), st))
    assert st.get[0] == SESSIONIZE_STATE_V

    # old-layout state (v1's leading field was last_us, an epoch-us
    # value — nothing like the small version constant)
    old = StubState(seeded=(1704096000000000, 1, 3, 1704096000000000, 450))
    with pytest.raises(ValueError, match="reset the checkpoint"):
        list(update((7,), iter([chunk]), old))


def test_tf_snapshot_memo_survives_wipe_and_republish(
    spark, sf_small, tmp_path
):
    """Review r13: a snapshot wiped and republished under the SAME batch
    ids must not serve the frozen persisted index — the memo key is the
    parquet file identity (Spark part names embed a per-job UUID), not
    the partition-name set."""
    import shutil

    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.text import _tf_one_batch

    snap = str(tmp_path / "snap")
    docs = load(spark, sf_small, "documents").select("doc_id", "text")
    _tf_one_batch(docs.filter(F.col("doc_id") % 2 == 0), 0, snap)
    first = _index_rows(spark, snap)

    shutil.rmtree(snap)
    _tf_one_batch(docs.filter(F.col("doc_id") % 2 == 1), 0, snap)
    second = _index_rows(spark, snap)
    assert second != first  # different residue class -> different corpus


def test_tf_snapshot_memo_ignores_recycled_session_id(
    spark, sf_small, tmp_path
):
    """Review r13: a memo entry whose session weakref no longer resolves
    to the calling session (id() recycled after a stopped session was
    GC'd) must be a miss, not a hit serving a dead session's DataFrame."""
    from hadoopwebgraph_spark.functions import text as T

    snap = str(tmp_path / "snap")
    _land_tf_batches(spark, sf_small, snap, splits=(0,), mod=2)
    good = _index_rows(spark, snap)

    base = (id(spark), os.path.abspath(snap))
    assert base in T._TF_SNAPSHOT_MEMO
    _ref, part_key, _tf = T._TF_SNAPSHOT_MEMO[base]
    poison = object()  # would blow up if ever used as a DataFrame
    T._TF_SNAPSHOT_MEMO[base] = (lambda: None, part_key, poison)
    assert _index_rows(spark, snap) == good
    assert T._TF_SNAPSHOT_MEMO[base][2] is not poison


def test_untrack_removes_registry_entry(spark):
    """cache.untrack drops the registry entry with the unpersist, so a
    later release_all neither re-unpersists it nor counts it."""
    from hadoopwebgraph_spark import cache

    cache.release_all()
    df = spark.range(100).persist()
    cache.track(df)
    assert len(cache._TRACKED) == 1
    cache.untrack(df)
    assert not cache._TRACKED
    assert cache.release_all() == 0


def test_compaction_randomized_interleavings_stay_exact(spark, tmp_path):
    """Seeded randomized schedules over the snapshot lifecycle: publish /
    compact / orphan-stage-drop / resurrect-a-deleted-source (the
    reachable crash states on an atomic-rename filesystem). After EVERY
    step the read must equal the multiset of all published rows — the
    exclusion contract has no window where a reader double-counts or
    under-reads."""
    import random
    import shutil

    from hadoopwebgraph_spark.functions.snapshot_util import (
        compact_snapshot,
        publish_partition,
        read_snapshot,
    )

    for seed in range(4):
        rng = random.Random(seed)
        snap = str(tmp_path / f"s{seed}")
        shadow = str(tmp_path / f"shadow{seed}")
        os.makedirs(shadow)
        expected: list[int] = []
        next_bid = 0
        published_dirs: dict[int, str] = {}  # bid -> shadow copy

        def publish():
            nonlocal next_bid
            vals = [next_bid * 1000 + i for i in range(rng.randint(1, 4))]
            df = spark.createDataFrame([(v,) for v in vals], "v long")
            publish_partition(df.coalesce(1), snap, next_bid)
            shadow_dir = os.path.join(shadow, f"batch_id={next_bid}")
            shutil.copytree(
                os.path.join(snap, f"batch_id={next_bid}"), shadow_dir
            )
            published_dirs[next_bid] = shadow_dir
            expected.extend(vals)
            next_bid += 1

        def compact():
            compact_snapshot(spark, snap, target_bytes=1 << 30)

        def orphan_stage():
            d = os.path.join(snap, f".compact-crash{rng.randint(0, 99)}")
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "junk.parquet"), "wb") as f:
                f.write(b"not parquet")

        def resurrect():
            # crashed deletion: a source dir a prior compaction folded
            # reappears (object-store eventual listing, partial rmtree)
            gone = [
                b
                for b, sd in published_dirs.items()
                if not os.path.isdir(os.path.join(snap, f"batch_id={b}"))
            ]
            if gone:
                b = rng.choice(gone)
                shutil.copytree(
                    published_dirs[b], os.path.join(snap, f"batch_id={b}")
                )

        publish()  # every schedule starts non-empty
        ops = [publish, compact, orphan_stage, resurrect]
        for _ in range(5):
            rng.choice(ops)()
            got = sorted(r.v for r in read_snapshot(spark, snap).collect())
            assert got == sorted(expected), f"seed={seed} diverged"
