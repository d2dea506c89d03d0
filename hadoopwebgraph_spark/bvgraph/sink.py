"""BVGraph sink: write an adjacency DataFrame back to the
``basename.{graph,offsets,properties}`` triple — the engine's superset of
the reference's only sink (writeOffsets, HdfsBVGraph.java:394-408; the
reference can regenerate offsets but cannot author a graph).

The BVGraph format is a single sequential gap-coded bit stream, so the
final assembly is inherently order-dependent: partitions are encoded
INDEPENDENTLY in parallel as window-isolated segments (the first
``window_size`` nodes of each segment encode with refs limited to the
segment), then the driver streams the segments into the output file in
src order. Window isolation at segment boundaries costs a little
compression but keeps the encode embarrassingly parallel — the same
trade the reference's *read* side makes by seeding windows at split
starts (HdfsBVGraph.java:221-229).

Scale design: segments arrive via ``toLocalIterator`` (one partition in
driver memory at a time, not ``collect``), bodies are re-phased to the
output bit cursor with one vectorized NumPy shift per segment (no
per-byte Python loop), and bytes are flushed to the file as they
complete — peak driver memory is O(largest segment), independent of
total graph size.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame

from .bitio import BitWriter
from .codec import BVGraphFiles, encode_graph, encode_segment
from .properties import BVGraphProperties, format_properties


def _append_deltas(out: "_BitStreamOut", values, prev: int, p) -> None:
    """Append code(values[i] - previous) for a monotone chunk — C kernel
    when available, BitWriter fallback; either way the bits land on `out`
    via vectorized re-phasing, not a per-code driver loop."""
    from . import native

    import numpy as np

    arr = np.asarray(values, dtype=np.int64)
    res = native.encode_deltas(arr, prev, p.offset_code, p.zeta_k)
    if res is None:
        w = BitWriter()
        wr = w.make_writer(p.offset_code, p.zeta_k)
        last = prev
        for v in values:
            wr(int(v) - last)
            last = int(v)
        res = w.nbits, w.to_bytes()
    nbits, body = res
    fill = nbits % 8
    out.append_body(body[: nbits // 8])
    if fill:
        out.append_bits(body[-1] >> (8 - fill), fill)


class _BitStreamOut:
    """Append bit-streams of arbitrary length to a file handle, tracking a
    sub-byte cursor. Byte bodies are re-phased with a vectorized shift."""

    __slots__ = ("fh", "cur", "fill", "nbits")

    def __init__(self, fh):
        self.fh = fh
        self.cur = 0  # low `fill` bits = next bits of the stream
        self.fill = 0
        self.nbits = 0

    def append_body(self, body: bytes) -> None:
        """Append len(body)*8 bits (the complete bytes of a segment)."""
        if not body:
            return
        k = self.fill
        if k == 0:
            self.fh.write(body)
        else:
            import numpy as np

            arr = np.frombuffer(body, dtype=np.uint8)
            x = arr.astype(np.uint16)
            prev = np.empty(len(arr), dtype=np.uint16)
            prev[0] = self.cur
            prev[1:] = x[:-1]
            out = (((prev << (8 - k)) | (x >> k)) & 0xFF).astype(np.uint8)
            self.fh.write(out.tobytes())
            self.cur = int(arr[-1]) & ((1 << k) - 1)
        self.nbits += 8 * len(body)

    def append_bits(self, val: int, nb: int) -> None:
        """Append nb (< 64) bits — a segment's trailing partial byte."""
        if nb == 0:
            return
        cur = (self.cur << nb) | (val & ((1 << nb) - 1))
        fill = self.fill + nb
        out = bytearray()
        while fill >= 8:
            fill -= 8
            out.append((cur >> fill) & 0xFF)
        if out:
            self.fh.write(bytes(out))
        self.cur = cur & ((1 << fill) - 1)
        self.fill = fill
        self.nbits += nb

    def close(self) -> None:
        if self.fill:
            self.fh.write(bytes([(self.cur << (8 - self.fill)) & 0xFF]))
            self.cur = 0
            self.fill = 0


def write_bvgraph(df: DataFrame, basename: str, **props_kw) -> BVGraphProperties:
    """Write DataFrame[src INT, adj ARRAY<INT>] (src dense 0..n-1) to a
    BVGraph triple at ``basename``.

    Parallel encode: each Spark partition encodes its contiguous node
    range into an independent bit segment; the driver streams segments to
    the output file in order (see module docstring for the memory bound).
    """
    from pyspark.sql import functions as F

    n = df.count()
    spark = df.sparkSession

    # contiguous ranges: range-partition by src so each task owns a slice
    n_parts = min(max(1, spark.sparkContext.defaultParallelism), max(1, n // 64))
    ranged = df.repartitionByRange(n_parts, F.col("src")).sortWithinPartitions("src")

    props_template = dict(props_kw)

    def encode_partition(rows):
        adj: list[list[int]] = []
        first_src = None
        arcs = 0
        for row in rows:
            if first_src is None:
                first_src = row.src
            adj.append(list(row.adj))
            arcs += len(row.adj)
        if first_src is None:
            return
        p = BVGraphProperties(nodes=len(adj), arcs=0, **props_template)
        # C kernel when available, Python spec otherwise — bit-identical
        # either way (refs stay inside this segment: window isolation)
        nbits, buf, offsets = encode_segment(adj, first_src, p)
        fill = nbits % 8
        body = buf[: nbits // 8]
        cur = (buf[-1] >> (8 - fill)) if fill else 0
        yield (first_src, arcs, body, fill, cur, offsets)

    # Stream segments through the driver in partition (= src range) order:
    # repartitionByRange assigns ascending ranges to ascending partition
    # ids, and toLocalIterator preserves partition order while holding only
    # one partition's segment in memory at a time.
    p0 = BVGraphProperties(nodes=max(n, 1), arcs=0, **props_template)

    arcs_total = 0
    expected_next = 0
    last_offset = 0
    offs_buf = io.BytesIO()
    offs_out = _BitStreamOut(offs_buf)
    _append_deltas(offs_out, [0], 0, p0)  # offsets stream entry for node 0
    with open(basename + ".graph", "wb") as fh:
        out = _BitStreamOut(fh)
        for first_src, seg_arcs, body, fill, cur, offsets in (
            ranged.rdd.mapPartitions(encode_partition).toLocalIterator()
        ):
            assert first_src == expected_next, (
                f"non-contiguous src ranges: expected {expected_next}, got {first_src}"
            )
            expected_next = first_src + len(offsets) - 1
            arcs_total += seg_arcs
            base = out.nbits
            out.append_body(body)
            if fill:
                out.append_bits(cur, fill)
            # one C-kernel (or fallback) delta-encode per segment — never a
            # per-node Python code-write loop on the driver
            abs_offsets = [base + o for o in offsets[1:]]
            if abs_offsets:
                _append_deltas(offs_out, abs_offsets, last_offset, p0)
                last_offset = abs_offsets[-1]
        assert expected_next == n, f"src not dense 0..{n - 1}"
        out.close()
    offs_out.close()

    p = BVGraphProperties(nodes=n, arcs=arcs_total, **props_template)
    with open(basename + ".offsets", "wb") as f:
        f.write(offs_buf.getvalue())
    with open(basename + ".properties", "w") as f:
        f.write(format_properties(p))
    return p


def write_bvgraph_single(adjacency: list[list[int]], basename: str, **props_kw):
    """Driver-local convenience: encode with full cross-boundary reference
    selection (best compression, single-threaded)."""
    g, o, p = encode_graph(adjacency, **props_kw)
    BVGraphFiles(basename).write(g, o, p)
    return p
