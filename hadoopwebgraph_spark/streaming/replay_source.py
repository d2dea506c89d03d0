"""Custom Python STREAMING data source: deterministic micro-batch replay
of a parquet event log (Spark 4 ``DataSourceStreamReader`` API — the
streaming half of the same Python DataSource surface the BVGraph batch
source uses).

``spark.readStream.format("eventreplay")`` serves a parquet file as a
stream of row-range micro-batches: offsets are plain row indices,
``latestOffset`` advances by at most ``batchRows`` per trigger, and each
batch is split into ``numPartitions`` ranged slices that EXECUTORS read
via row-group-pruned pyarrow reads — the driver touches footers only,
same discipline as the BVGraph reader. Offsets are (start, end] row
ranges, so checkpoint recovery replays exactly the missed rows:
deterministic input -> exactly-once results with an idempotent sink.

This is the connector-shaped seam a real message bus plugs into when the
broker speaks neither Kafka (streams.py's config path) nor files: only
``latestOffset`` (what's new?) and ``read`` (fetch a range) change.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _read_row_range(path: str, start: int, end: int, names: list[str]):
    """Rows [start, end) of a parquet file, reading ONLY the row groups
    that intersect the range (and only the requested columns)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    out = []
    base = 0
    for g in range(pf.metadata.num_row_groups):
        n = pf.metadata.row_group(g).num_rows
        lo, hi = base, base + n
        base = hi
        if hi <= start or lo >= end:
            continue  # pruned: no byte of this group is read
        tbl = pf.read_row_group(g, columns=names)
        s = max(start - lo, 0)
        e = min(end - lo, n)
        sliced = tbl.slice(s, e - s)
        out.append(sliced)
    for tbl in out:
        cols = [tbl.column(n).to_pylist() for n in names]
        yield from zip(*cols)


class EventReplayStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.path = options["path"]
        self.batch_rows = int(options.get("batchrows", 1000))
        self.num_partitions = int(options.get("numpartitions", 4))
        self._names = [f.name for f in schema.fields]
        import pyarrow.parquet as pq

        # footer-only: total row count, no data read on the driver
        self._total = pq.ParquetFile(self.path).metadata.num_rows
        self._cursor = 0

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        # serve at most one batch of new rows per trigger; a live bus
        # would report its real end-of-log here instead
        self._cursor = min(self._cursor + self.batch_rows, self._total)
        return {"row": self._cursor}

    def partitions(self, start: dict, end: dict) -> list[_RangePartition]:
        lo, hi = start["row"], end["row"]
        if hi <= lo:
            return [_RangePartition(self.path, lo, lo)]
        n = min(self.num_partitions, hi - lo)
        step = (hi - lo + n - 1) // n
        return [
            _RangePartition(self.path, s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        if partition.end <= partition.start:
            return iter(())
        return _read_row_range(
            partition.path, partition.start, partition.end, self._names
        )

    def commit(self, end: dict) -> None:
        pass  # the log is immutable; nothing to release


class EventReplayDataSource(DataSource):
    """format("eventreplay"): options path, batchRows, numPartitions.
    Schema is supplied explicitly via .schema(...) (take it from a batch
    read of the same file, as streams.stream_events does)."""

    @classmethod
    def name(cls) -> str:
        return "eventreplay"

    def streamReader(self, schema: StructType) -> EventReplayStreamReader:
        return EventReplayStreamReader(schema, dict(self.options))


def register_replay_source(spark) -> None:
    spark.dataSource.register(EventReplayDataSource)
