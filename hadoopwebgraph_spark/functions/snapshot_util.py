"""Shared infrastructure for snapshot-partition streaming twins (r12).

The three exact streaming twins (theta sketch, inverted index, DLT
priority sample) all follow one layout: each micro-batch publishes its
own ``batch_id=<id>`` parquet partition and a read-time merge serves the
live artifact. This module holds the crash-safety-critical pieces ONCE
(review r12 found them drifting across three copies):

- typed k-marker: ``_snapshot_meta.json`` records {"kind", "k"}; writers
  assert both on every batch, readers resolve k from it and REFUSE to
  guess when it is missing (a lost marker read at a default k serves
  wrong ranks with no error) or when pointed at the wrong snapshot kind;
- atomic publish: stage into a dot-prefixed dir (invisible to Spark's
  file listing), one os.rename to publish; a rename failure is treated
  as a benign replay ONLY when the target partition actually exists —
  anything else re-raises so foreachBatch fails and the checkpoint does
  NOT commit a batch whose data was never published;
- orphan sweep: leftover ``.stage-<batch_id>-*`` dirs from a crash
  between write and rename are reclaimed on the next publish of that
  batch_id (replays are serial per stream, so the sweep races nothing);
- compaction (r13, VERDICT r12 hazard #2): a long-lived stream grows one
  partition per micro-batch forever, so the read-time merge is O(all
  batches). ``compact_snapshot`` folds every live partition into ONE
  negative-id partition. Unlike the digest snapshot's compaction
  (maintenance.compact_digest_snapshot), these partials are NOT
  superset-safe — a double-read double-counts tf / duplicates sample
  rows — so the crash contract is exclusion-based instead: the folded
  partition carries a ``_covers.json`` marker naming its source ids
  (written into the staging dir, so the atomic install publishes data
  and marker together), and readers resolve partitions through
  ``live_batch_dirs``, which skips covered sources (a crashed deletion)
  and marker-less negative dirs (a crashed install). Every reader of a
  compactable snapshot MUST therefore go through ``read_snapshot``.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_META = "_snapshot_meta.json"


def read_meta(snapshot_dir: str) -> dict | None:
    try:
        with open(os.path.join(snapshot_dir, _META)) as f:
            return json.load(f)
    except OSError:
        return None


def ensure_meta(snapshot_dir: str, kind: str, k: int) -> None:
    """Record (kind, k) on first use; raise on any later mismatch — a k
    or kind drift between writer and snapshot silently corrupts the
    served artifact, so it must fail at the write."""
    os.makedirs(snapshot_dir, exist_ok=True)
    meta = read_meta(snapshot_dir)
    if meta is None:
        tmp = os.path.join(
            snapshot_dir, f"{_META}.tmp-{uuid.uuid4().hex[:8]}"
        )
        with open(tmp, "w") as f:
            json.dump({"kind": kind, "k": k}, f)
        os.replace(tmp, os.path.join(snapshot_dir, _META))
        return
    if meta.get("kind") != kind or meta.get("k") != k:
        raise ValueError(
            f"snapshot {snapshot_dir!r} is kind={meta.get('kind')!r} "
            f"k={meta.get('k')}; got kind={kind!r} k={k} — mixed "
            "writers would silently corrupt the served artifact"
        )


def resolve_k(
    snapshot_dir: str, kind: str, k: int | None
) -> int:
    """Reader-side k resolution: the recorded value wins; an explicit k
    must match it; a MISSING marker with no explicit k raises (guessing
    a default k serves wrong ranks with no error — review r12), and a
    kind mismatch raises instead of failing later on missing columns."""
    meta = read_meta(snapshot_dir)
    if meta is None:
        if k is None:
            raise ValueError(
                f"snapshot {snapshot_dir!r} has no {_META} marker; pass "
                "k= explicitly only if you know the build parameters"
            )
        return k
    if meta.get("kind") != kind:
        raise ValueError(
            f"snapshot {snapshot_dir!r} is kind={meta.get('kind')!r}, "
            f"not {kind!r}"
        )
    mk = int(meta["k"])
    if k is not None and k != mk:
        raise ValueError(
            f"snapshot {snapshot_dir!r} was built with k={mk}, got k={k}"
        )
    return mk


def publish_partition(
    df: DataFrame, snapshot_dir: str, batch_id: int
) -> None:
    """Write ``df`` as the ``batch_id=<id>`` partition via stage +
    atomic rename. Idempotent under replay (the already-published
    partition wins and the identical stage is discarded); every OTHER
    rename failure re-raises so the streaming checkpoint does not
    commit a batch whose data never landed.

    Publishing an id that a compaction fold already covers raises: it
    means the stream's checkpoint was reset (ids restarted at 0)
    against an existing compacted snapshot, and the new batch's rows
    would be silently excluded by every reader forever (ADVICE r13).
    A legitimate crash replay can never hit this: only the NEWEST batch
    can be uncommitted (Structured Streaming commits batch N before
    starting N+1) and ``compact_snapshot`` never folds the newest live
    partition (review r14 — the first guard cut wedged exactly that
    tail-batch replay), so every covered id is checkpoint-committed."""
    os.makedirs(snapshot_dir, exist_ok=True)
    covered = _all_covered_ids(snapshot_dir)
    if batch_id in covered:
        raise ValueError(
            f"batch_id={batch_id} is named in a compaction fold's "
            f"{_COVERS} marker of snapshot {snapshot_dir!r}: the stream "
            "checkpoint was reset against a compacted snapshot, and this "
            "batch would be invisible to every reader. Point the restarted "
            "stream at a FRESH snapshot dir (or delete the snapshot "
            "together with the checkpoint)"
        )
    final = os.path.join(snapshot_dir, f"batch_id={batch_id}")
    # reclaim stages orphaned by a crash between write and rename of a
    # PRIOR attempt at this batch (replays are serial per stream)
    prefix = f".stage-{batch_id}-"
    for d in os.listdir(snapshot_dir):
        if d.startswith(prefix):
            shutil.rmtree(os.path.join(snapshot_dir, d), ignore_errors=True)
    stage = os.path.join(
        snapshot_dir, f"{prefix}{uuid.uuid4().hex[:8]}"
    )
    df.write.mode("overwrite").parquet(stage)
    try:
        os.rename(stage, final)
    except OSError:
        if os.path.isdir(final):
            # replay: identical partition already published
            shutil.rmtree(stage, ignore_errors=True)
        else:
            raise


_COVERS = "_covers.json"


def _batch_ids(snapshot_dir: str) -> dict[int, str]:
    """Every ``batch_id=<n>`` partition dir, keyed by id. Non-integer
    partition dirs raise — nothing else ever writes into a snapshot."""
    try:
        entries = os.listdir(snapshot_dir)
    except OSError:
        return {}
    out: dict[int, str] = {}
    for d in entries:
        if not d.startswith("batch_id="):
            continue
        try:
            i = int(d.split("=", 1)[1])
        except ValueError:
            raise ValueError(f"non-integer partition dir in snapshot: {d}")
        out[i] = os.path.join(snapshot_dir, d)
    return out


def _covered_ids(path: str) -> list[int] | None:
    """Source ids folded into a compacted partition, or None when the
    marker is absent (a negative-id dir without one is a crashed
    install — its data may be incomplete and its sources still live)."""
    try:
        with open(os.path.join(path, _COVERS)) as f:
            return [int(x) for x in json.load(f)["covers"]]
    except OSError:
        return None


def _all_covered_ids(snapshot_dir: str) -> set[int]:
    """Union of every completed fold's covered source ids."""
    covered: set[int] = set()
    for i, path in _batch_ids(snapshot_dir).items():
        if i < 0:
            covered.update(_covered_ids(path) or [])
    return covered


def live_batch_dirs(snapshot_dir: str, require: bool = False) -> list[str]:
    """Partition dirs a reader should scan: every published partition,
    minus (a) compacted dirs whose install never completed (negative id,
    no ``_covers.json`` — the marker is staged with the data, so its
    absence means the atomic rename never ran) and (b) source dirs named
    by a completed compaction's marker (their deletion crashed; reading
    them alongside the fold would double-count). Exactness under any
    crash point follows: either the fold is invisible and every source
    is read, or the fold is visible and every source is excluded.
    ``require=True`` raises on an empty result (the shared reader-side
    guard) instead of returning []."""
    by_id = _batch_ids(snapshot_dir)
    covered: set[int] = set()
    incomplete: set[int] = set()
    for i, path in by_id.items():
        if i >= 0:
            continue
        cov = _covered_ids(path)
        if cov is None:
            incomplete.add(i)
        else:
            covered.update(cov)
    dirs = [
        by_id[i]
        for i in sorted(by_id)
        if i not in covered and i not in incomplete
    ]
    if require and not dirs:
        raise ValueError(
            f"snapshot {snapshot_dir!r} has no published partitions"
        )
    return dirs


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Read a snapshot's live rows (data columns only). The ONE reader
    entry point for compactable snapshots — a bare
    ``spark.read.parquet(snapshot_dir)`` double-counts after a crashed
    compaction deletion and reads half-installed folds."""
    return spark.read.parquet(*live_batch_dirs(snapshot_dir, require=True))


def _parquet_stats(dirs: list[str]) -> tuple[int, int]:
    """(file count, total bytes) of the parquet parts under ``dirs`` in
    one walk."""
    files = 0
    total = 0
    for d in dirs:
        for dirpath, _dirs, fns in os.walk(d):
            for fn in fns:
                if fn.endswith(".parquet"):
                    files += 1
                    total += os.path.getsize(os.path.join(dirpath, fn))
    return files, total


def compact_snapshot(
    spark: SparkSession, snapshot_dir: str, target_bytes: int = 128 << 20
) -> dict:
    """Fold every live partition EXCEPT the newest positive batch into
    ONE negative-id partition and drop the sources — bounds the
    read-time merge and the small-file count for an always-on stream (a
    year of micro-batches is thousands of partitions otherwise). The
    newest batch stays un-folded because it is the only id a restarted
    stream can legitimately replay (crash after publish, before the
    checkpoint commit); folding it would turn that benign replay into
    publish_partition's permanent reset error (review r14). Row-multiset-preserving, so it
    is valid for ALL snapshot kinds (tf partials, theta hashes, priority
    partials) — the read-time merge is unchanged. Run it in a QUIESCED
    maintenance window (the same contract as compact_digest_snapshot):
    the writer stream stopped, one maintenance actor at a time, and no
    concurrent readers — a reader that resolved partitions before the
    fold's source deletion fails loudly (FileNotFoundException on its
    lazy scan; never silently wrong), see functions/text.py's
    snapshot-read retry note (ADVICE r13).

    Crash safety (exclusion semantics, see module docstring): the fold
    stages under a dot-prefixed dir (invisible to readers) WITH its
    ``_covers.json`` marker, publishes via one atomic rename, and only
    then deletes sources. live_batch_dirs keeps every crash point exact;
    re-running the compaction completes a crashed deletion (it sweeps
    covered leftovers and marker-less installs first) and converges.

    Returns {"files_before", "files_after", "rows", "batch_id"}.
    """
    by_id = _batch_ids(snapshot_dir)
    # sweep leftovers from a previous crashed compaction: staging dirs
    # and covered-but-undeleted sources
    for d in os.listdir(snapshot_dir) if os.path.isdir(snapshot_dir) else []:
        if d.startswith(".compact-"):
            shutil.rmtree(os.path.join(snapshot_dir, d), ignore_errors=True)
    covered: set[int] = set()
    for i, path in by_id.items():
        if i < 0 and _covered_ids(path) is None:
            # cannot occur under this module's atomic-rename install (the
            # marker is staged with the data); deleting it could destroy a
            # FOREIGN fold — e.g. compact_digest_snapshot's marker-less
            # batch_id=-1, whose sources are already gone — so refuse
            raise ValueError(
                f"snapshot partition {path!r} is negative but has no "
                f"{_COVERS} marker: either a foreign compaction layout "
                "(maintenance.compact_digest_snapshot snapshots have "
                "their own compactor) or a half-installed fold on a "
                "non-atomic filesystem; refusing to guess"
            )
    for i, path in by_id.items():
        if i < 0:
            covered.update(_covered_ids(path) or [])
    for i in sorted(covered):
        if i in by_id:
            shutil.rmtree(by_id[i], ignore_errors=True)
            del by_id[i]

    # never fold the NEWEST live batch: it is the only id Structured
    # Streaming can legitimately replay after a crash-before-commit, and
    # publish_partition's reset guard relies on every covered id being
    # checkpoint-committed (review r14 — folding the tail wedged that
    # replay into a permanent ValueError)
    fold_ids = sorted(by_id)
    positives = [i for i in fold_ids if i >= 0]
    if positives:
        fold_ids = [i for i in fold_ids if i != positives[-1]]
    live = [by_id[i] for i in fold_ids]
    files_before, bytes_before = _parquet_stats(
        [by_id[i] for i in sorted(by_id)]
    )
    if len(live) <= 1:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "rows": None,
            "batch_id": None,
        }
    new_id = min(0, *by_id) - 1
    n_out = max(1, -(-bytes_before // target_bytes))
    stage = os.path.join(snapshot_dir, f".compact-{uuid.uuid4().hex[:8]}")
    spark.read.parquet(*live).repartition(n_out).write.mode(
        "overwrite"
    ).parquet(stage)
    rows = spark.read.parquet(stage).count()
    # marker = TRANSITIVE closure (ADVICE r14): a fold that folds a prior
    # fold deletes that fold's dir below, so naming only its negative id
    # would drop the positive ids IT covered from _all_covered_ids — and
    # publish_partition's checkpoint-reset guard would silently stop
    # catching resets to those oldest ids (the reset batch would publish,
    # be read alongside the fold, and double-count partials).
    covers: set[int] = set(fold_ids)
    for i in fold_ids:
        if i < 0:
            covers.update(_covered_ids(by_id[i]) or [])
    with open(os.path.join(stage, _COVERS), "w") as f:
        json.dump({"covers": sorted(covers)}, f)
    os.rename(stage, os.path.join(snapshot_dir, f"batch_id={new_id}"))
    for path in live:
        shutil.rmtree(path, ignore_errors=True)
    files_after, _ = _parquet_stats(
        [os.path.join(snapshot_dir, f"batch_id={new_id}")]
        + ([by_id[positives[-1]]] if positives else [])
    )
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
        "batch_id": new_id,
    }


def infer_watch_schema(
    spark: SparkSession, incoming_dir: str, op_name: str, schema
):
    """The file-stream hardening rule in one place: an empty watch dir
    with no declared schema raises instead of silently defaulting."""
    if schema is not None:
        return schema
    try:
        return spark.read.parquet(incoming_dir).schema
    except Exception as exc:  # empty watch dir at stream start
        raise ValueError(
            f"{op_name}: watch directory {incoming_dir!r} has no files "
            "to infer a schema from; pass schema= explicitly for an "
            "always-on stream whose producer has not written yet"
        ) from exc
