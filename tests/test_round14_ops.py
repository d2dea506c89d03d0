"""Round-14 additions: the checkpoint-reset publish guard (ADVICE r13),
and the two registered operators promoted from their r13-staged modules
(q163 suffix-class span dedup, q164 xor-filter semi-join)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _publish(spark, snap, batch_id, vals):
    from hadoopwebgraph_spark.functions.snapshot_util import publish_partition

    publish_partition(
        spark.createDataFrame([(v,) for v in vals], "v long"), snap, batch_id
    )


def test_checkpoint_reset_into_compacted_snapshot_raises(spark, tmp_path):
    """A stream checkpoint reset restarts batch ids at 0; publishing an
    id a compaction fold already covers would make the new batch
    silently invisible to every reader (live_batch_dirs excludes
    covered ids) — it must fail loudly at publish (ADVICE r13)."""
    from hadoopwebgraph_spark.functions.snapshot_util import (
        compact_snapshot,
        read_snapshot,
    )

    snap = str(tmp_path / "snap")
    _publish(spark, snap, 0, [1, 2])
    _publish(spark, snap, 1, [3])
    _publish(spark, snap, 2, [4])
    compact_snapshot(spark, snap)
    # replay-of-covered-id cannot legitimately happen (the newest batch
    # never folds); the only producer of this publish is a reset
    with pytest.raises(ValueError, match="checkpoint was reset"):
        _publish(spark, snap, 0, [99])
    # fresh ids beyond the covered set still publish fine
    _publish(spark, snap, 3, [5])
    got = sorted(r.v for r in read_snapshot(spark, snap).collect())
    assert got == [1, 2, 3, 4, 5]


def test_reset_guard_survives_fold_of_fold(spark, tmp_path):
    """ADVICE r14: the SECOND compaction folds the first fold's negative
    dir and deletes it — the new marker must carry the positive ids that
    fold covered (transitive closure), or a checkpoint reset to the
    OLDEST ids slips past the guard, publishes, and double-counts."""
    from hadoopwebgraph_spark.functions.snapshot_util import (
        _all_covered_ids,
        compact_snapshot,
        read_snapshot,
    )

    snap = str(tmp_path / "snap")
    for i, v in enumerate([1, 2, 3]):
        _publish(spark, snap, i, [v])
    compact_snapshot(spark, snap)  # folds 0,1 -> batch_id=-1
    _publish(spark, snap, 3, [4])
    compact_snapshot(spark, snap)  # folds -1,2 -> -2; deletes -1's dir
    assert _all_covered_ids(snap) == {-1, 0, 1, 2}
    for stale in (0, 1, 2):
        with pytest.raises(ValueError, match="checkpoint was reset"):
            _publish(spark, snap, stale, [99])
    got = sorted(r.v for r in read_snapshot(spark, snap).collect())
    assert got == [1, 2, 3, 4]


def test_tail_batch_crash_replay_survives_compaction(spark, tmp_path):
    """The legitimate replay: publish(N) landed but the checkpoint
    never committed N, the operator compacts during the downtime, the
    restarted stream replays N. The newest batch is excluded from the
    fold, so the replay takes the normal already-published path instead
    of the reset error, and reads stay exact (review r14 — the first
    guard cut wedged this stream permanently)."""
    from hadoopwebgraph_spark.functions.snapshot_util import (
        compact_snapshot,
        read_snapshot,
    )

    snap = str(tmp_path / "snap")
    _publish(spark, snap, 0, [1])
    _publish(spark, snap, 1, [2])
    _publish(spark, snap, 2, [3])  # landed; checkpoint commit crashed
    res = compact_snapshot(spark, snap)
    assert res["batch_id"] is not None
    _publish(spark, snap, 2, [3])  # restart replays the tail batch
    got = sorted(r.v for r in read_snapshot(spark, snap).collect())
    assert got == [1, 2, 3]
    # a second compaction folds the previous fold + the now-committed
    # tail (a newer batch exists), and converges
    _publish(spark, snap, 3, [4])
    compact_snapshot(spark, snap)
    got = sorted(r.v for r in read_snapshot(spark, snap).collect())
    assert got == [1, 2, 3, 4]
