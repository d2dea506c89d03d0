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
    into ONE deduplicated ``batch_id=-1`` partition and drops the
    per-batch directories. Run it while the stream is STOPPED (the
    standard maintenance-window contract, same as checkpoint cleanup):

    - ``-1`` can never collide with a real foreachBatch batch_id (those
      are non-negative), so `_dedup_one_batch`'s replay-exclusion filter
      ``batch_id != current`` keeps working unchanged afterwards.
    - Crash safety: the compacted partition is written FIRST (into a
      staging dir, renamed in), the old partitions removed after. A
      crash in between leaves digests duplicated between ``batch_id=-1``
      and the old partitions — harmless: the anti-join semantics of a
      digest SUPERSET are identical, and re-running the compaction
      converges.

    Returns {"files_before", "files_after", "digests"}.
    """
    import uuid as _uuid

    total, before = _dir_parquet_bytes(digests_dir)
    # size the compacted partition from on-disk bytes, like compact_files
    # (a billion-digest snapshot must not funnel through one task)
    n_out = max(1, math.ceil(total / target_bytes))
    distinct = spark.read.parquet(digests_dir).select("h").distinct()
    staging = f"{digests_dir}.compact-{_uuid.uuid4().hex[:8]}"
    distinct.repartition(n_out).write.mode("overwrite").parquet(staging)
    n_digests = spark.read.parquet(staging).count()
    # install the compacted partition, then drop the per-batch ones (a
    # batch_id=-1 left by a PREVIOUS compaction is shelved aside first so
    # the rename target is free; it is removed with the rest)
    os.rename(staging, os.path.join(digests_dir, "batch_id=-1.tmp"))
    prev = os.path.join(digests_dir, "batch_id=-1")
    if os.path.isdir(prev):
        os.rename(prev, prev + f".old-{_uuid.uuid4().hex[:8]}")
    old = [
        d
        for d in os.listdir(digests_dir)
        if d.startswith("batch_id=") and not d.endswith(".tmp")
    ]
    os.rename(os.path.join(digests_dir, "batch_id=-1.tmp"), prev)
    for d in old:
        shutil.rmtree(os.path.join(digests_dir, d))
    _total, after = _dir_parquet_bytes(digests_dir)
    return {"files_before": before, "files_after": after, "digests": n_digests}
