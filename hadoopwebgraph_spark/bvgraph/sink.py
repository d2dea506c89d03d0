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

1. **Encode** (per partition, ``mapInArrow``): rows stay columnar from
   the scan to the C kernel — each task gathers its range group(s) with
   Arrow ``take``, hands the list column's CSR buffers (flat values +
   offsets) straight to ``encode_segment_csr``, spills the raw graph
   bits to the segment store AND delta-encodes its offsets-stream chunk
   right away (the chunk's codes are pure successive differences —
   independent of where the segment lands in the final stream — so it
   needs no base; optimization r17, guide §1.2); only (first_src,
   nbits, arcs, onbits) — a few longs per segment — return to the
   driver, which prefix-sums nbits/onbits into each segment's absolute
   bit base in both streams.
2. **Re-phase** (per segment): knowing both base phases (base % 8),
   each task shifts its raw graph bits AND its offsets-chunk bits with
   one vectorized NumPy pass each into the byte-aligned *interior* of
   their final byte ranges and stores them as part blobs, returning
   just the head/tail partial-byte bits of both streams.

The driver then *composes*: per segment it writes ONE boundary byte
(merging the previous tail with the next head) and splices the interior
part — no per-byte Python work, and driver-side Python object traffic is
O(n_segments), independent of graph size. WHERE the intermediate
artifacts live and HOW the final stream is assembled are pluggable
(``storage.SegmentStore`` / the composer objects): the default
``LocalFSStore`` + ``FileComposer`` needs a filesystem shared by tasks
and driver (local mode, NFS, mounted object storage); on plain object
storage the same plan runs with a blob-store ``SegmentStore`` and
``MultipartComposer`` — interiors are byte-aligned by construction, so
the final object is a server-side multipart concatenation. Segments
smaller than two bytes (never produced by the >=64-node range planner,
but handled) fall back to inline bit appends.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bitio import BitWriter
from .codec import BVGraphFiles, encode_graph, encode_segment_csr
from .io import write_bytes
from .properties import BVGraphProperties, format_properties
from .storage import FileComposer, SegmentStore, store_for


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


def write_bvgraph(
    df: DataFrame,
    basename: str,
    store: SegmentStore | None = None,
    n_nodes: int | None = None,
    aligned: bool = False,
    **props_kw,
) -> BVGraphProperties:
    """Write DataFrame[src INT, adj ARRAY<INT>] (src dense 0..n-1, adj
    strictly ascending — the encoder raises otherwise) to a BVGraph
    triple at ``basename``.

    Commit protocol: ``.graph`` and ``.offsets`` are composed first and
    ``.properties`` is written LAST — readers require the properties
    file, so it doubles as the commit marker: a crash mid-compose
    leaves a triple no reader will load, and a retry truncates and
    overwrites cleanly.

    Executor-parallel encode AND write (module docstring): job 1 encodes
    window-isolated segments into ``store``; job 2 re-phases each segment
    to its absolute bit base and stores its byte-aligned interior plus
    its offsets-stream chunk; the driver composes boundary bytes and
    splices parts in order.

    Topology contract: ``store`` defaults to ``storage.store_for(basename)``
    — a plain path or ``file://`` basename spills to a ``LocalFSStore``
    next to the output and therefore REQUIRES a filesystem every task and
    the driver share (local mode, NFS, FUSE-mounted object storage); an
    ``s3://`` / ``gs://`` / ``hdfs://`` basename routes spill artifacts
    and the final triple through ``pyarrow.fs``, so no shared POSIX mount
    is assumed on a real cluster. Pass ``store`` explicitly to override.

    ``n_nodes``: pass the (dense) node count when the caller already
    knows it — e.g. from the source graph's ``.properties`` — to skip
    the ``df.count()`` job, which for a graph-source input is a full
    second decode of the graph just to size the segments.

    ``aligned``: the graph→graph copy fast path. When the input is
    ALREADY partitioned into ascending contiguous src ranges — true for
    any DataFrame straight off the BVGraph source, whose split planner
    hands each partition one node range — the re-segmentation shuffle
    is pure waste: each input partition IS a valid encode segment. With
    ``aligned=True`` the sink uses ``spark_partition_id()`` as the
    segment id and encodes in place (job 1 becomes shuffle-free, a
    mapInArrow over the scan), which at 100 TB removes the single
    biggest data movement of a copy/transcode job. Misuse is safe, not
    silent: each task asserts its rows form one consecutive src run,
    and the driver's existing density check asserts the per-partition
    ranges chain to exactly 0..n-1 — a hash-partitioned input fails
    loudly before any file is composed.
    """
    n = int(n_nodes) if n_nodes is not None else df.count()
    spark = df.sparkSession

    if store is None:
        store = store_for(basename)

    props_template = dict(props_kw)

    if aligned:
        # input partitions are the segments: no shuffle, pid = partition
        ranged = df.select(
            F.col("src").cast("long").alias("src"),
            "adj",
            F.spark_partition_id().alias("pid"),
        )
    else:
        # Contiguous ranges: src is dense 0..n-1, so the range boundaries
        # are known exactly — group by pid = src // rows_per instead of
        # repartitionByRange, whose SAMPLED boundaries made segmentation
        # (and thus the compressed bytes) nondeterministic across runs,
        # and which costs an extra sampling job. Hash-partitioning on pid
        # keeps each range group whole within one task; which task gets
        # which group doesn't matter (segments are keyed by pid, ordered
        # by the driver).
        n_parts = min(
            max(1, spark.sparkContext.defaultParallelism), max(1, n // 64)
        )
        rows_per = -(-n // n_parts) if n else 1  # ceil(n / n_parts)
        ranged = df.select(
            F.col("src").cast("long").alias("src"),
            "adj",
            F.expr(f"CAST(src DIV {rows_per} AS INT)").alias("pid"),
        ).repartition(n_parts, "pid")

    def encode_batches(batches):
        import numpy as np
        import pyarrow as pa

        batches = [b for b in batches if b.num_rows]
        if not batches:
            return
        tbl = pa.Table.from_batches(batches)
        src = tbl.column("src").to_numpy()
        pids = tbl.column("pid").to_numpy()
        adj_col = tbl.column("adj").combine_chunks()
        meta = {
            k: [] for k in ("pid", "first_src", "nodes", "arcs", "nbits", "onbits")
        }
        for pid in np.unique(pids):
            idxs = np.nonzero(pids == pid)[0]
            order = idxs[np.argsort(src[idxs])]
            # columnar gather; the list column's buffers ARE the CSR the
            # C kernel takes — no per-row Python materialization
            sub = adj_col.take(pa.array(order, type=pa.int64()))
            lens = pa.compute.list_value_length(sub).to_numpy().astype(np.int64)
            list_offsets = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=list_offsets[1:])
            values = np.asarray(
                sub.flatten().to_numpy(zero_copy_only=False), dtype=np.int32
            )
            first_src = int(src[order[0]])
            # one consecutive run per segment — a violated aligned=True
            # assumption (hash-partitioned input) dies here, per task,
            # before any byte reaches the store
            seg_src = src[order]
            if not np.array_equal(
                seg_src, np.arange(first_src, first_src + len(seg_src))
            ):
                raise ValueError(
                    f"segment {int(pid)} src range not one consecutive "
                    f"run: [{first_src}..{int(seg_src[-1])}] over "
                    f"{len(seg_src)} rows"
                )
            p = BVGraphProperties(nodes=len(lens), arcs=0, **props_template)
            # C kernel when available, Python spec otherwise — bit-identical
            # either way (refs stay inside this segment: window isolation)
            nbits, buf, offsets = encode_segment_csr(
                values, list_offsets, first_src, p
            )
            store.put(f"seg-{int(pid):05d}.raw", bytes(buf[: (nbits + 7) // 8]))
            # offsets-stream chunk, encoded HERE (not in the re-phase
            # job): segment-local offsets start at 0 and the chunk's
            # codes are successive differences, so the bits are
            # base-independent — bit-identical to the old
            # prev=seg_base encode, one job earlier. offset_code and
            # zeta_k come from props_template, never from `nodes`, so
            # this per-task `p` encodes exactly as the driver's p0.
            ow = io.BytesIO()
            oout = _BitStreamOut(ow)
            _append_deltas(oout, offsets[1:], 0, p)
            onbits = oout.nbits
            oout.close()
            store.put(f"seg-{int(pid):05d}.offs.raw", ow.getvalue())
            meta["pid"].append(int(pid))
            meta["first_src"].append(first_src)
            meta["nodes"].append(len(lens))
            meta["arcs"].append(int(list_offsets[-1]))
            meta["nbits"].append(nbits)
            meta["onbits"].append(onbits)
        yield pa.RecordBatch.from_pydict(
            meta,
            schema=pa.schema(
                [
                    ("pid", pa.int32()),
                    ("first_src", pa.int64()),
                    ("nodes", pa.int64()),
                    ("arcs", pa.int64()),
                    ("nbits", pa.int64()),
                    ("onbits", pa.int64()),
                ]
            ),
        )

    # Job 1: encode (Arrow-batched end-to-end). Only a few longs per
    # segment come back to the driver.
    meta_rows = ranged.mapInArrow(
        encode_batches,
        "pid int, first_src long, nodes long, arcs long, nbits long, onbits long",
    ).collect()
    meta = sorted(
        (r.pid, r.first_src, r.nodes, r.arcs, r.nbits, r.onbits) for r in meta_rows
    )

    # prefix-sum the bit bases of BOTH streams (job 1 reports each
    # chunk's bit length, so the offsets stream no longer needs its own
    # re-phase job); verify src density/contiguity
    p0 = BVGraphProperties(nodes=max(n, 1), arcs=0, **props_template)
    entry0, n0bits = _encode_offsets_entry0(p0)
    expected_next = 0
    bases: dict[int, int] = {}
    obases: dict[int, int] = {}
    base = 0
    obase = n0bits
    for idx, first_src, nodes, arcs, nbits, onbits in meta:
        assert first_src == expected_next, (
            f"non-contiguous src ranges: expected {expected_next}, got {first_src}"
        )
        expected_next = first_src + nodes
        bases[idx] = base
        base += nbits
        obases[idx] = obase
        obase += onbits
    assert expected_next == n, f"src not dense 0..{n - 1}"
    arcs_total = sum(m[3] for m in meta)

    def rephase_segment(task):
        idx, seg_base, nbits, ob, onbits = task
        raw = store.get(f"seg-{idx:05d}.raw")
        if nbits < 16:  # degenerate micro-segment: driver appends inline
            g = (idx, 0, raw, nbits, 0, 0)
        else:
            head, interior, tail, tail_fill = _rephase_interior(
                raw, nbits, seg_base % 8
            )
            store.put(f"seg-{idx:05d}.part", interior)
            g = (idx, head, None, nbits, tail, tail_fill)
        return g, _rephase_offsets_one((idx, ob, onbits), store)

    # Job 2: re-phase + part write for BOTH streams, one task per
    # segment (jobs 2+3 merged — optimization r17, guide §1.2: the
    # offsets chunk lengths are known from job 1, so the old job 3's
    # only input, the chunk bit-base prefix sums, is available here).
    tasks = [
        (idx, bases[idx], nbits, obases[idx], onbits)
        for idx, _, _, _, nbits, onbits in meta
    ]
    merged = sorted(
        spark.sparkContext.parallelize(tasks, max(len(tasks), 1))
        .map(rephase_segment)
        .collect()
    )
    seg_results = [g for g, _o in merged]
    oseg_results = [o for _g, o in merged]

    graph_composer = FileComposer(basename + ".graph", store)
    compose_graph(seg_results, store, graph_composer)
    graph_composer.close()

    offs_composer = FileComposer(basename + ".offsets", store)
    compose_offsets(oseg_results, entry0, n0bits, store, offs_composer)
    offs_composer.close()

    store.cleanup()
    p = BVGraphProperties(nodes=n, arcs=arcs_total, **props_template)
    write_bytes(basename + ".properties", format_properties(p).encode("utf-8"))
    return p


def compose_graph(seg_results, store: SegmentStore, composer) -> None:
    """Compose .graph from re-phased segments: per segment ONE boundary
    byte + a splice of the byte-aligned interior part. Literal bytes go
    through ``composer.write`` (via the bit-phase tracker), interiors via
    ``composer.part`` — so Python-side byte traffic is O(n_segments) with
    a FileComposer, and zero part bytes with a MultipartComposer (the
    object-storage compose resolves part keys server-side)."""
    out = _BitStreamOut(composer)
    for rec in seg_results:
        # 6-tuple from the merged re-phase job (one contract — ADVICE r17)
        idx, head, raw_inline, nbits, tail, tail_fill = rec
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
        out.nbits += 8 * composer.part(f"seg-{idx:05d}.part")
        out.cur, out.fill = tail, tail_fill
        out.nbits += tail_fill
    out.close()


def _encode_offsets_entry0(p0) -> tuple[bytes, int]:
    """Driver-side encode of the offsets stream's node-0 entry (a few
    bits); its exact bit length anchors the chunk bit-base prefix sums."""
    ow = io.BytesIO()
    o = _BitStreamOut(ow)
    _append_deltas(o, [0], 0, p0)
    n0 = o.nbits
    o.close()
    return ow.getvalue(), n0


def _rephase_offsets_one(task, store: SegmentStore):
    """Executor-side re-phase of one segment's offsets chunk to its
    absolute bit base (job 3's map function; module-level so the compose
    tests run it without a Spark job)."""
    idx, obase, onbits = task
    raw = store.get(f"seg-{idx:05d}.offs.raw")
    if onbits < 16:  # micro-chunk: driver appends the literal bits inline
        return (idx, 0, raw, onbits, 0, 0)
    head, interior, tail, tail_fill = _rephase_interior(raw, onbits, obase % 8)
    store.put(f"seg-{idx:05d}.offs.part", interior)
    return (idx, head, None, onbits, tail, tail_fill)


def compose_offsets(
    oseg_results, entry0: bytes, n0bits: int, store: SegmentStore, composer
) -> None:
    """Compose .offsets exactly like compose_graph: the driver writes the
    node-0 entry bits plus ONE boundary byte per segment; the
    byte-aligned chunk interiors (re-phased executor-side by job 3) are
    spliced via ``composer.part`` — driver byte traffic is O(n_segments)
    for this stream too, instead of shifting every chunk byte through
    the driver's vectorized appender."""
    out = _BitStreamOut(composer)
    fill0 = n0bits % 8
    out.append_body(entry0[: n0bits // 8])
    if fill0:
        out.append_bits(entry0[-1] >> (8 - fill0), fill0)
    for idx, head, raw_inline, onbits, tail, tail_fill in oseg_results:
        if raw_inline is not None:  # micro-chunk fallback
            f2 = onbits % 8
            out.append_body(raw_inline[: onbits // 8])
            if f2:
                out.append_bits(raw_inline[-1] >> (8 - f2), f2)
            continue
        k = out.fill
        if k:
            out.append_bits(head, 8 - k)  # completes the boundary byte
        assert out.fill == 0
        out.nbits += 8 * composer.part(f"seg-{idx:05d}.offs.part")
        out.cur, out.fill = tail, tail_fill
        out.nbits += tail_fill
    out.close()


def copy_bvgraph(
    spark,
    src_basename: str,
    dst_basename: str,
    num_splits: int | None = None,
    **props_kw,
) -> BVGraphProperties:
    """Graph→graph copy/transcode: read ``src_basename`` through the
    BVGraph source and write it back aligned — the source's byte-balanced
    splits become the sink's encode segments directly, so the whole job
    is scan → encode → compose with ZERO shuffle (the common production
    recompress/re-window/relocate job). Node count comes from the source
    ``.properties`` (no sizing decode). ``props_kw`` (window_size,
    zeta_k, codes...) lets the copy change compression parameters."""
    from .datasource import read_bvgraph
    from .io import read_bytes
    from .properties import parse_properties

    src_props = parse_properties(
        read_bytes(src_basename + ".properties").decode("utf-8")
    )
    if num_splits is None:
        num_splits = spark.sparkContext.defaultParallelism
    df = read_bvgraph(spark, src_basename, num_splits=num_splits)
    return write_bvgraph(
        df,
        dst_basename,
        n_nodes=src_props.nodes,
        aligned=True,
        **props_kw,
    )


def write_bvgraph_single(adjacency: list[list[int]], basename: str, **props_kw):
    """Driver-local convenience: encode with full cross-boundary reference
    selection (best compression, single-threaded)."""
    g, o, p = encode_graph(adjacency, **props_kw)
    BVGraphFiles(basename).write(g, o, p)
    return p
