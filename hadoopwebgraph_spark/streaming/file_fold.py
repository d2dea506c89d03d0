"""Shared machinery for gate-shaped queries that DRIVE a real
Structured Streaming job inside the query body (the g45 pattern,
extracted in r16 so the staged incremental-index gate doesn't duplicate
the carve/workspace/foreachBatch discipline — the same reason r15
extracted ``_fold_batch`` and ``_ball_ctes``).

The shape: carve a bounded DataFrame into ``n_batches`` deterministic
micro-batches (xxhash64 on caller-chosen columns), stage them as
parquet files under a FRESH private workspace, and ingest with a
file-source ``readStream`` (``availableNow`` + ``maxFilesPerTrigger=1``)
whose ``foreachBatch`` body folds caller state. A gate built this way
is registrable with a full hash oracle ONLY when the caller can argue
rebuild identity — the fold's final state must be row-identical to a
batch build over the union of all batches, for ANY carve (see
``anf_delta_update``'s semilattice argument and the incremental-index
monotone top-k argument for the two instances).

Why files and not ``rate``/MemoryStream: the file source is the one
public source whose micro-batch contents the carve controls exactly and
deterministically, and it exercises the real checkpoint/offset-log code
path the driver's smoke checks never touch.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drive_file_stream_fold(
    df: DataFrame,
    schema_ddl: str,
    carve_cols: list[str],
    n_batches: int,
    fold: Callable[[dict, DataFrame], None],
    work_dir: str | None = None,
) -> dict:
    """Carve ``df`` into ``n_batches`` by ``xxhash64(*carve_cols)``,
    stage under a fresh private workspace, drive the stream, and return
    the caller's final state dict ({} if the carve staged no files —
    empty input never fires a micro-batch).

    Rows sharing the same carve-column values land in the SAME batch —
    carve on the entity key (e.g. ``doc_id``) when the fold needs
    entity-complete batches. The workspace is ALWAYS a fresh private
    mkdtemp (under ``work_dir`` if given) and always removed: the file
    source tracks seen files by PATH in the checkpoint, so reuse would
    silently skip overwritten files and ingest leftovers (review r15).
    The returned state must only hold localCheckpoint'ed DataFrames (or
    plain values) — workspace files are gone when this returns.
    """
    spark = df.sparkSession
    work = tempfile.mkdtemp(prefix="stream-fold-", dir=work_dir)
    inc = os.path.join(work, "incoming")
    os.makedirs(inc, exist_ok=True)
    try:
        # ONE partitioned write carves every batch (the g45 one-pass
        # carve: repartition on the carve column lands each batch value
        # on one task, so partitionBy yields one file per batch dir),
        # copied flat because file streams don't recurse.
        # maxFilesPerTrigger=1 then gives one micro-batch per file. The
        # carve column name is collision-proofed CASE-INSENSITIVELY
        # (review r16, twice: a plain 'b' would silently clobber a
        # caller column of that name, and Spark's default
        # case-insensitive resolution means withColumn replaces any
        # case-variant too).
        taken = {c.lower() for c in df.columns}
        bcol = "__carve_b"
        while bcol.lower() in taken:
            bcol += "_"
        stage = os.path.join(work, "stage")
        (
            df.withColumn(
                bcol, F.pmod(F.xxhash64(*carve_cols), F.lit(n_batches))
            )
            .repartition(bcol)
            .write.partitionBy(bcol)
            .parquet(stage)
        )
        for i in range(n_batches):
            bdir = os.path.join(stage, f"{bcol}={i}")
            if not os.path.isdir(bdir):
                continue  # an empty carve bucket writes no dir
            part = sorted(
                f for f in os.listdir(bdir) if f.endswith(".parquet")
            )
            for j, f in enumerate(part):
                shutil.copy(
                    os.path.join(bdir, f),
                    os.path.join(inc, f"b{i}-{j}.parquet"),
                )
        if not os.listdir(inc):
            # Review r16: zero staged files for a NON-empty input means
            # the carve/staging broke (e.g. a layout change moved the
            # partition dirs or file suffix out from under the copy
            # loop) — raising here keeps the callers' empty-state
            # fallback an EMPTY-INPUT rule, never a silent batch-twin
            # substitute for the streaming path the gates exist to
            # exercise. Genuinely-empty input returns {} without paying
            # the multi-second stream start/teardown for zero batches
            # (review r16, pass 2).
            if df.isEmpty():
                return {}
            raise RuntimeError(
                "drive_file_stream_fold: carve staged no files for a "
                "non-empty input"
            )

        state: dict = {}
        fired = 0

        def one_batch(batch_df: DataFrame, batch_id: int) -> None:
            nonlocal fired
            fired += 1
            fold(state, batch_df)

        q = (
            spark.readStream.schema(schema_ddl)
            .option("maxFilesPerTrigger", "1")
            .parquet(inc)
            .writeStream.foreachBatch(one_batch)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if fired == 0:
            # Files were staged but the stream fired no micro-batch —
            # the other half of the broken-staging guard (review r16,
            # pass 2: a watch-path/schema/option regression would
            # otherwise return {} and let the callers' empty fallback
            # certify the gate without the streaming path ever running).
            raise RuntimeError(
                "drive_file_stream_fold: files staged but the stream "
                "fired no micro-batch"
            )
        return state
    finally:
        shutil.rmtree(work, ignore_errors=True)
