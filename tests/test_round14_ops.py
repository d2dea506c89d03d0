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
    compact_snapshot(spark, snap)
    # replay-of-covered-id cannot legitimately happen post-compaction;
    # the only producer of this publish is a reset checkpoint
    with pytest.raises(ValueError, match="checkpoint was reset"):
        _publish(spark, snap, 0, [99])
    # fresh ids beyond the covered set still publish fine
    _publish(spark, snap, 2, [4])
    got = sorted(r.v for r in read_snapshot(spark, snap).collect())
    assert got == [1, 2, 3, 4]
