"""Table-maintenance operators: small-file compaction (the lakehouse
OPTIMIZE job).

Streaming ingestion and fine-grained upserts leave parquet directories
with thousands of KB-sized files; at 100 TB the resulting
footer-read/task-schedule overhead dominates scan time long before the
data does. `compact_files` rewrites a directory to ~`target_bytes`
files: it sizes the output from the directory's actual on-disk bytes
(driver-side listing — one cheap FS metadata pass, no data read), then
runs ONE repartition job. With `sort_col` it uses repartitionByRange +
sortWithinPartitions so an existing clustering (including a Z-order
curve column, see layout.py) survives compaction and min/max pruning
keeps working; without it a plain round-robin repartition balances
bytes. The rewrite lands in a staging directory that replaces the
original atomically (rename), so concurrent readers see either the old
or the new layout, never a half-written mix.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _dir_parquet_bytes(path: str) -> tuple[int, int]:
    """(total_bytes, n_files) of the parquet data files under path."""
    total = 0
    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                n += 1
    return total, n


def compact_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    sort_col: str | None = None,
) -> dict:
    """Compact a parquet directory to ceil(bytes / target_bytes) files.

    Returns {"files_before", "files_after", "bytes", "rows"}. Local and
    mounted filesystems only (os.walk + os.rename); on object storage
    the same two steps are a listing and a prefix swap.
    """
    total, before = _dir_parquet_bytes(path)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(path)
    staging = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    if sort_col is not None:
        out = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(staging)
    rows = spark.read.parquet(staging).count()
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    _total2, after = _dir_parquet_bytes(path)
    return {
        "files_before": before,
        "files_after": after,
        "bytes": total,
        "rows": rows,
    }


def compact_digest_snapshot(
    spark: SparkSession, digests_dir: str, target_bytes: int = 128 << 20
) -> dict:
    """Compact the incremental-dedup digest snapshot
    (``functions/dedup.py::incremental_dedup_stream``).

    The stream appends one ``batch_id=<n>`` partition per micro-batch, so
    after weeks of ingestion the per-batch anti-join reads thousands of
    KB-sized digest files. This maintenance job folds every partition
    into ONE deduplicated partition under a fresh NEGATIVE batch id
    (-1 for the first compaction, -2 for the next, ...) and drops the
    rest. Run it while the stream is STOPPED (the standard
    maintenance-window contract, same as checkpoint cleanup).

    Crash safety, with NO rename dance: the new id is unique (one below
    the smallest existing id), so the install is a single rename of the
    fully-written staging dir onto a target that cannot exist; old
    partitions are removed only after. A crash at ANY point leaves only
    valid integer ``batch_id=<n>`` directories whose union is a digest
    SUPERSET — anti-join semantics are unchanged (a superset dedups
    identically), partition discovery still infers an integer column,
    `_dedup_one_batch`'s replay-exclusion filter (non-negative ids)
    keeps working, and re-running the compaction converges. Orphaned
    ``<dir>.compact-*`` staging dirs from a crashed write sit OUTSIDE
    the snapshot directory and are swept on the next run.

    Local / task-visible mounted filesystems only (os.walk + os.rename,
    like ``compact_files``); on object storage the same steps are a
    prefix write + a listing + prefix deletes.

    Returns {"files_before", "files_after", "digests", "batch_id"}.
    """
    total, before = _dir_parquet_bytes(digests_dir)
    # sweep staging leftovers from a previous crashed compaction
    parent, base = os.path.split(digests_dir.rstrip("/"))
    for d in os.listdir(parent or "."):
        if d.startswith(f"{base}.compact-"):
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    ids = []
    for d in os.listdir(digests_dir):
        if d.startswith("batch_id="):
            try:
                ids.append(int(d.split("=", 1)[1]))
            except ValueError:
                raise ValueError(f"non-integer partition dir in snapshot: {d}")
    new_id = min(0, *ids) - 1 if ids else -1
    # size the compacted partition from on-disk bytes, like compact_files
    # (a billion-digest snapshot must not funnel through one task)
    n_out = max(1, math.ceil(total / target_bytes))
    distinct = spark.read.parquet(digests_dir).select("h").distinct()
    staging = f"{digests_dir}.compact-{uuid.uuid4().hex[:8]}"
    distinct.repartition(n_out).write.mode("overwrite").parquet(staging)
    n_digests = spark.read.parquet(staging).count()
    os.rename(staging, os.path.join(digests_dir, f"batch_id={new_id}"))
    for i in ids:
        shutil.rmtree(os.path.join(digests_dir, f"batch_id={i}"))
    _total, after = _dir_parquet_bytes(digests_dir)
    return {
        "files_before": before,
        "files_after": after,
        "digests": n_digests,
        "batch_id": new_id,
    }
