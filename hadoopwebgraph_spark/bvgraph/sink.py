"""BVGraph sink: write an adjacency DataFrame back to the
``basename.{graph,offsets,properties}`` triple — the engine's superset of
the reference's only sink (writeOffsets, HdfsBVGraph.java:394-408; the
reference can regenerate offsets but cannot author a graph).

The BVGraph format is a single sequential gap-coded bit stream, so the
final assembly is inherently order-dependent: partitions are encoded
INDEPENDENTLY in parallel as window-isolated segments (the first
``window_size`` nodes of each segment encode with refs limited to the
segment). Window isolation at segment boundaries costs a little
compression but keeps the encode embarrassingly parallel — the same
trade the reference's *read* side makes by seeding windows at split
starts (HdfsBVGraph.java:221-229).

Scale design — executor-parallel write, two jobs:

1. **Encode** (per partition): each task encodes its contiguous node
   range into a window-isolated segment and spills the raw bits + local
   bit-offsets next to the output; only (first_src, nbits, arcs) — a few
   longs per segment — return to the driver, which prefix-sums nbits
   into each segment's absolute bit base.
2. **Re-phase** (per segment): knowing its base phase (base % 8), each
   task shifts its raw bits with one vectorized NumPy pass into the
   byte-aligned *interior* of its final byte range and writes it as a
   part file, returning just the head/tail partial-byte bits. It also
   delta-encodes its own slice of the offsets stream (prev = its base).

The driver then *composes*: per segment it writes ONE boundary byte
(merging the previous tail with the next head) and splices the interior
part with ``shutil.copyfileobj`` — no per-byte Python work, and
driver-side Python object traffic is O(n_segments), independent of graph
size. On object storage the interior parts upload straight from
executors and the compose is a server-side multipart operation; the
offsets stream (~a few % of the graph bytes) is composed through the
same vectorized bit appender on the driver. Segments smaller than two
bytes (never produced by the >=64-node range planner, but handled) fall
back to inline bit appends.
"""

from __future__ import annotations

import io
import os
import shutil

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


def _rephase_interior(raw: bytes, nbits: int, k: int):
    """Shift a segment's raw bits (packed from bit 0, pad-low) to start at
    bit phase ``k`` of the output stream. Returns (head, interior_bytes,
    tail, tail_fill): ``head`` = the first (8-k)%8 bits (completing the
    boundary byte), ``interior_bytes`` = all complete output bytes, and
    ``tail``/``tail_fill`` = the trailing partial byte's bits. One
    vectorized NumPy pass, no per-byte Python loop."""
    import numpy as np

    r = np.frombuffer(raw, dtype=np.uint8)
    end = k + nbits  # relative bit extent in the output
    tail_fill = end % 8
    if k == 0:
        head = 0
        interior = raw[: nbits // 8]
    else:
        head = int(r[0]) >> k
        n_int = end // 8 - 1
        if n_int > 0:
            pad = np.concatenate([r, np.zeros(1, dtype=np.uint8)])
            x = pad.astype(np.uint16)
            out = ((x[:n_int] << (8 - k)) | (x[1 : n_int + 1] >> k)) & 0xFF
            interior = out.astype(np.uint8).tobytes()
        else:
            interior = b""
    if tail_fill:
        m = len(raw)
        v = ((int(r[m - 2]) << 8) if m >= 2 else 0) | int(r[m - 1])
        raw_fill = nbits % 8
        v >>= (8 - raw_fill) if raw_fill else 0  # drop pad-low bits
        tail = v & ((1 << tail_fill) - 1)
    else:
        tail = 0
    return head, interior, tail, tail_fill


def write_bvgraph(df: DataFrame, basename: str, **props_kw) -> BVGraphProperties:
    """Write DataFrame[src INT, adj ARRAY<INT>] (src dense 0..n-1) to a
    BVGraph triple at ``basename``.

    Executor-parallel encode AND write (module docstring): job 1 encodes
    window-isolated segments to a spill dir next to the output; job 2
    re-phases each segment to its absolute bit base and writes its
    byte-aligned interior as a part file plus its offsets-stream chunk;
    the driver composes boundary bytes and splices parts in order.
    """
    n = df.count()
    spark = df.sparkSession

    # Contiguous ranges: src is dense 0..n-1, so the range boundaries are
    # known exactly — partition by src // rows_per with an identity
    # partitioner instead of repartitionByRange, whose SAMPLED boundaries
    # made segmentation (and thus the compressed bytes) nondeterministic
    # across runs, and which costs an extra sampling job.
    n_parts = min(max(1, spark.sparkContext.defaultParallelism), max(1, n // 64))
    rows_per = -(-n // n_parts) if n else 1  # ceil(n / n_parts)
    ranged = df.rdd.map(
        lambda row: (row.src // rows_per, (row.src, list(row.adj)))
    ).partitionBy(n_parts, lambda pid: int(pid))

    props_template = dict(props_kw)
    spill = basename + ".spill"
    os.makedirs(spill, exist_ok=True)

    def encode_partition(idx, kvs):
        import numpy as np

        items = sorted(item for _, item in kvs)
        if not items:
            return
        first_src = items[0][0]
        adj = [a for _, a in items]
        arcs = sum(len(a) for a in adj)
        p = BVGraphProperties(nodes=len(adj), arcs=0, **props_template)
        # C kernel when available, Python spec otherwise — bit-identical
        # either way (refs stay inside this segment: window isolation)
        nbits, buf, offsets = encode_segment(adj, first_src, p)
        with open(os.path.join(spill, f"seg-{idx:05d}.raw"), "wb") as f:
            f.write(buf[: (nbits + 7) // 8])
        np.save(
            os.path.join(spill, f"seg-{idx:05d}.offs.npy"),
            np.asarray(offsets, dtype=np.int64),
        )
        yield (idx, first_src, len(adj), arcs, nbits)

    # Job 1: encode. Only a few longs per segment come back to the driver.
    meta = sorted(ranged.mapPartitionsWithIndex(encode_partition).collect())

    # prefix-sum the bit bases; verify src density/contiguity
    expected_next = 0
    bases: dict[int, int] = {}
    base = 0
    for idx, first_src, nodes, arcs, nbits in meta:
        assert first_src == expected_next, (
            f"non-contiguous src ranges: expected {expected_next}, got {first_src}"
        )
        expected_next = first_src + nodes
        bases[idx] = base
        base += nbits
    assert expected_next == n, f"src not dense 0..{n - 1}"
    arcs_total = sum(m[3] for m in meta)

    p0 = BVGraphProperties(nodes=max(n, 1), arcs=0, **props_template)

    def rephase_segment(task):
        import numpy as np

        idx, seg_base, nbits = task
        with open(os.path.join(spill, f"seg-{idx:05d}.raw"), "rb") as f:
            raw = f.read()
        if nbits < 16:  # degenerate micro-segment: driver appends inline
            return (idx, 0, raw, nbits, 0, 0, 0)
        head, interior, tail, tail_fill = _rephase_interior(raw, nbits, seg_base % 8)
        with open(os.path.join(spill, f"seg-{idx:05d}.part"), "wb") as f:
            f.write(interior)
        # offsets-stream chunk: this segment's absolute offsets
        # delta-encoded against prev = seg_base (= last offset of the
        # previous segment); one C-kernel call per segment
        offsets = np.load(os.path.join(spill, f"seg-{idx:05d}.offs.npy"))
        ow = io.BytesIO()
        oout = _BitStreamOut(ow)
        _append_deltas(oout, (offsets[1:] + seg_base).tolist(), seg_base, p0)
        onbits = oout.nbits
        oout.close()
        with open(os.path.join(spill, f"seg-{idx:05d}.offs.raw"), "wb") as f:
            f.write(ow.getvalue())
        return (idx, head, None, nbits, tail, tail_fill, onbits)

    # Job 2: re-phase + part write, one task per segment.
    tasks = [(idx, bases[idx], nbits) for idx, _, _, _, nbits in meta]
    seg_results = sorted(
        spark.sparkContext.parallelize(tasks, max(len(tasks), 1))
        .map(rephase_segment)
        .collect()
    )

    # Compose .graph: per segment ONE boundary byte + an OS-level splice
    # of the byte-aligned interior part. Python-side byte traffic is
    # O(n_segments); on object storage this is a server-side multipart
    # compose of executor-uploaded parts.
    with open(basename + ".graph", "wb") as fh:
        out = _BitStreamOut(fh)
        for idx, head, raw_inline, nbits, tail, tail_fill, _ in seg_results:
            if raw_inline is not None:  # micro-segment fallback
                fill = nbits % 8
                out.append_body(raw_inline[: nbits // 8])
                if fill:
                    out.append_bits(raw_inline[-1] >> (8 - fill), fill)
                continue
            k = out.fill
            if k:
                out.append_bits(head, 8 - k)  # completes the boundary byte
            assert out.fill == 0
            with open(os.path.join(spill, f"seg-{idx:05d}.part"), "rb") as pf:
                shutil.copyfileobj(pf, fh, 1 << 20)
                out.nbits += 8 * os.fstat(pf.fileno()).st_size
            out.cur, out.fill = tail, tail_fill
            out.nbits += tail_fill
        out.close()

    # Compose .offsets: node-0 entry, then each segment's pre-encoded
    # chunk re-phased through the vectorized bit appender (the offsets
    # stream is a few % of the graph bytes; the same two-job treatment
    # would apply if it ever dominated).
    with open(basename + ".offsets", "wb") as f:
        offs_out = _BitStreamOut(f)
        _append_deltas(offs_out, [0], 0, p0)  # offsets entry for node 0
        for idx, head, raw_inline, nbits, tail, tail_fill, onbits in seg_results:
            if raw_inline is not None:
                import numpy as np

                offsets = np.load(os.path.join(spill, f"seg-{idx:05d}.offs.npy"))
                seg_base = bases[idx]
                _append_deltas(
                    offs_out, (offsets[1:] + seg_base).tolist(), seg_base, p0
                )
                continue
            with open(os.path.join(spill, f"seg-{idx:05d}.offs.raw"), "rb") as cf:
                chunk = cf.read()
            fill = onbits % 8
            offs_out.append_body(chunk[: onbits // 8])
            if fill:
                offs_out.append_bits(chunk[-1] >> (8 - fill), fill)
        offs_out.close()

    shutil.rmtree(spill, ignore_errors=True)
    p = BVGraphProperties(nodes=n, arcs=arcs_total, **props_template)
    with open(basename + ".properties", "w") as f:
        f.write(format_properties(p))
    return p


def write_bvgraph_single(adjacency: list[list[int]], basename: str, **props_kw):
    """Driver-local convenience: encode with full cross-boundary reference
    selection (best compression, single-threaded)."""
    g, o, p = encode_graph(adjacency, **props_kw)
    BVGraphFiles(basename).write(g, o, p)
    return p
