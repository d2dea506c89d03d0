"""BVGraph sink: write an adjacency DataFrame back to the
``basename.{graph,offsets,properties}`` triple — the engine's superset of
the reference's only sink (writeOffsets, HdfsBVGraph.java:394-408; the
reference can regenerate offsets but cannot author a graph).

The BVGraph format is a single sequential gap-coded bit stream, so the
final assembly is inherently order-dependent: partitions are encoded
INDEPENDENTLY in parallel as window-isolated segments (the first
``window_size`` nodes of each segment encode with refs limited to the
segment), then the driver concatenates segment bit-streams and rebases
offsets. Window isolation at segment boundaries costs a little
compression but keeps the encode embarrassingly parallel — the same
trade the reference's *read* side makes by seeding windows at split
starts (HdfsBVGraph.java:221-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .bitio import BitWriter
from .codec import BVGraphFiles, _encode_node, encode_graph
from .properties import BVGraphProperties


def write_bvgraph(df: DataFrame, basename: str, **props_kw) -> BVGraphProperties:
    """Write DataFrame[src INT, adj ARRAY<INT>] (src dense 0..n-1) to a
    BVGraph triple at ``basename``.

    Parallel encode: each Spark partition encodes its contiguous node
    range into an independent bit segment (mapInPandas-free — plain
    mapPartitions over rows since encoding is row-sequential anyway);
    driver concatenates and writes the offsets stream.
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
        for row in rows:
            if first_src is None:
                first_src = row.src
            adj.append(list(row.adj))
        if first_src is None:
            return
        p = BVGraphProperties(nodes=len(adj), arcs=0, **props_template)
        w = BitWriter()
        offsets = [0]
        ref_counts = [0] * (p.window_size + 1)
        for local_x, succ in enumerate(adj):
            x = first_src + local_x
            best = None
            candidates = [0]
            if p.window_size > 0:
                # refs must stay inside this segment (window isolation)
                for r in range(1, min(p.window_size, local_x) + 1):
                    if ref_counts[(local_x - r) % len(ref_counts)] + 1 <= p.max_ref_count:
                        candidates.append(r)
            for r in candidates:
                scratch = BitWriter()
                _encode_node(scratch, p, x, succ, r, adj[local_x - r] if r else None)
                if best is None or scratch.nbits < best[0]:
                    best = (scratch.nbits, r)
            r = best[1]
            ref_counts[local_x % len(ref_counts)] = (
                0 if r == 0 else ref_counts[(local_x - r) % len(ref_counts)] + 1
            )
            _encode_node(w, p, x, succ, r, adj[local_x - r] if r else None)
            offsets.append(w.nbits)
        yield (first_src, w.nbits, bytes(w.buf), w.fill, w.cur, offsets)

    segments = sorted(ranged.rdd.mapPartitions(encode_partition).collect())

    # driver-side bit-level concatenation + offset rebase
    out = BitWriter()
    all_offsets = [0]
    arcs_total = 0
    expected_next = 0
    for first_src, nbits, body, fill, cur, offsets in segments:
        assert first_src == expected_next, (
            f"non-contiguous src ranges: expected {expected_next}, got {first_src}"
        )
        expected_next = first_src + len(offsets) - 1
        base = out.nbits
        # replay the segment's bits into the output writer
        for byte in body:
            out.write_int(byte, 8)
        if fill:
            out.write_int(cur, fill)
        all_offsets.extend(base + o for o in offsets[1:])
    assert expected_next == n, f"src not dense 0..{n - 1}"

    # arcs = decodable from offsets? no — recount from df (distributed)
    arcs_total = int(
        df.select(F.sum(F.size("adj")).alias("m")).collect()[0]["m"] or 0
    )

    p = BVGraphProperties(nodes=n, arcs=arcs_total, **props_template)
    ow = BitWriter()
    wr_off = ow.make_writer(p.offset_code, p.zeta_k)
    last = 0
    for off in all_offsets:
        wr_off(off - last)
        last = off
    BVGraphFiles(basename).write(out.to_bytes(), ow.to_bytes(), p)
    return p


def write_bvgraph_single(adjacency: list[list[int]], basename: str, **props_kw):
    """Driver-local convenience: encode with full cross-boundary reference
    selection (best compression, single-threaded)."""
    g, o, p = encode_graph(adjacency, **props_kw)
    BVGraphFiles(basename).write(g, o, p)
    return p
