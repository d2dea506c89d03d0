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
  batch_id (replays are serial per stream, so the sweep races nothing).
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
    commit a batch whose data never landed."""
    os.makedirs(snapshot_dir, exist_ok=True)
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
