"""BVGraph encode/decode kernel — the irreducible custom component
(SURVEY.md §2 Tier A4/A5/A7/A9).

Decoder semantics replicate the reference's successor pipeline
(HdfsBVGraph.java:98-201): outdegree -> reference within the window ->
copy blocks (first raw, rest stored-1, alternating copy/skip starting with
copy, implicit tail when the count is even) -> intervals (first left
zigzag-offset from x, lengths stored minus min_interval_length, then
gap+1 lefts) -> residuals (zigzag first from x, then +1 gaps), merged as
sorted streams. Sequential iteration keeps a cyclic window of the last
``window_size`` lists and seeds it by random access when starting
mid-graph (HdfsBVGraph.java:203-294).

The encoder is this library's own (the reference has none — it only
re-writes offsets, HdfsBVGraph.java:394-408): per node it tries every
admissible reference candidate in the window, encodes each to a scratch
bit writer, and keeps the cheapest, honoring max_ref_count chains.
"""

from __future__ import annotations


from dataclasses import dataclass

import numpy as np

from .bitio import GAMMA, ZETA, BitReader, BitWriter, int2nat, nat2int
from .properties import BVGraphProperties


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def _runs_copy_skip(ref_list: list[int], target: set[int]) -> list[int]:
    """Alternating copy/skip run lengths over ref_list (copy first)."""
    runs: list[int] = []
    copying = True
    cur = 0
    for v in ref_list:
        is_copy = v in target
        if is_copy == copying:
            cur += 1
        else:
            runs.append(cur)
            copying = not copying
            cur = 1
    runs.append(cur)
    return runs


def _extract_intervals(extras: list[int], min_len: int) -> tuple[list[tuple[int, int]], list[int]]:
    """Split sorted extras into maximal >=min_len consecutive runs
    (intervals) and leftover residuals."""
    intervals: list[tuple[int, int]] = []
    residuals: list[int] = []
    i, m = 0, len(extras)
    while i < m:
        j = i
        while j + 1 < m and extras[j + 1] == extras[j] + 1:
            j += 1
        run = j - i + 1
        if run >= min_len:
            intervals.append((extras[i], run))
        else:
            residuals.extend(extras[i : j + 1])
        i = j + 1
    return intervals, residuals


def _check_ascending(succ, x) -> None:
    """BVGraph adjacency lists are strictly ascending successor SETS —
    both encoders (Python spec and C kernel) assume it and silently
    emit undecodable bits otherwise (gap coding goes negative). Fail
    loudly with the offending node instead."""
    if any(b <= a for a, b in zip(succ, succ[1:])):
        raise ValueError(
            f"node {x}: successor list must be strictly ascending "
            f"(sorted, duplicate-free); got {list(succ)[:20]}... "
            "— sort_array() the adj column (and dedup) before encoding"
        )


def _encode_node(
    w: BitWriter,
    p: BVGraphProperties,
    x: int,
    succ: list[int],
    ref: int,
    ref_list: list[int] | None,
) -> None:
    """Encode one node's list given a chosen reference (0 = none)."""
    wr_out = w.make_writer(p.outdegree_code, p.zeta_k)
    wr_ref = w.make_writer(p.reference_code, p.zeta_k)
    wr_bcnt = w.make_writer(p.block_count_code, p.zeta_k)
    wr_blk = w.make_writer(p.block_code, p.zeta_k)
    wr_res = w.make_writer(p.residual_code, p.zeta_k)

    d = len(succ)
    wr_out(d)
    if d == 0:
        return
    if p.window_size > 0:
        wr_ref(ref)

    extras = succ
    if ref > 0:
        assert ref_list is not None
        target = set(succ)
        runs = _runs_copy_skip(ref_list, target)
        # last run is always implicit (even count -> copy tail, odd -> skip)
        blocks = runs[:-1]
        wr_bcnt(len(blocks))
        for i, b in enumerate(blocks):
            wr_blk(b if i == 0 else b - 1)
        copied = {v for v in ref_list if v in target}
        extras = [v for v in succ if v not in copied]

    if p.min_interval_length > 0:
        if extras:
            intervals, residuals = _extract_intervals(extras, p.min_interval_length)
            w.write_gamma(len(intervals))
            prev = 0
            for i, (left, length) in enumerate(intervals):
                if i == 0:
                    w.write_gamma(int2nat(left - x))
                else:
                    w.write_gamma(left - prev - 1)
                w.write_gamma(length - p.min_interval_length)
                prev = left + length
            extras = residuals
    # residuals
    if extras:
        wr_res(int2nat(extras[0] - x))
        for i in range(1, len(extras)):
            wr_res(extras[i] - extras[i - 1] - 1)


def encode_graph(
    adjacency: list[list[int]],
    p: BVGraphProperties | None = None,
    **props_kw,
) -> tuple[bytes, bytes, BVGraphProperties]:
    """Encode an adjacency list into (.graph bytes, .offsets bytes, props).

    Reference selection: for each node try ref=0 plus every window
    candidate whose chain depth stays within max_ref_count; keep the
    encoding with the fewest bits (measured exactly on a scratch writer).
    """
    n = len(adjacency)
    arcs = sum(len(a) for a in adjacency)
    if p is None:
        p = BVGraphProperties(nodes=n, arcs=arcs, **props_kw)
    else:
        p.nodes, p.arcs = n, arcs
    p.validate()

    w = BitWriter()
    offsets = [0]
    ref_counts = [0] * max(p.window_size + 1, 1)

    for x in range(n):
        succ = adjacency[x]
        _check_ascending(succ, x)
        best: tuple[int, int, bytes] | None = None  # (bits, ref, payload)
        candidates = [0]
        if p.window_size > 0:
            for r in range(1, min(p.window_size, x) + 1):
                if ref_counts[(x - r) % len(ref_counts)] + 1 <= p.max_ref_count:
                    candidates.append(r)
        for r in candidates:
            scratch = BitWriter()
            _encode_node(
                scratch, p, x, succ, r, adjacency[x - r] if r > 0 else None
            )
            if best is None or scratch.nbits < best[0]:
                best = (scratch.nbits, r, scratch)
        assert best is not None
        _, ref, _ = best
        ref_counts[x % len(ref_counts)] = 0 if ref == 0 else ref_counts[(x - ref) % len(ref_counts)] + 1
        _encode_node(w, p, x, succ, ref, adjacency[x - ref] if ref > 0 else None)
        offsets.append(w.nbits)

    graph_bytes = w.to_bytes()

    # offsets stream: n+1 deltas, offset-coded (default gamma)
    ow = BitWriter()
    wr_off = ow.make_writer(p.offset_code, p.zeta_k)
    last = 0
    for off in offsets:
        wr_off(off - last)
        last = off
    return graph_bytes, ow.to_bytes(), p


def encode_segment_py(
    adj: list[list[int]], first_src: int, p: BVGraphProperties
) -> tuple[int, bytes, list[int]]:
    """Encode a window-isolated segment: nodes ``first_src + i`` with
    local reference selection (refs stay inside the segment) — the
    executable spec for the C encoder and the sink's fallback.

    Returns (nbits, buffer of ceil(nbits/8) bytes, n+1 bit offsets).
    """
    w = BitWriter()
    offsets = [0]
    ref_counts = [0] * max(p.window_size + 1, 1)
    for local_x, succ in enumerate(adj):
        x = first_src + local_x
        _check_ascending(succ, x)
        best: tuple[int, int] | None = None
        candidates = [0]
        if p.window_size > 0:
            for r in range(1, min(p.window_size, local_x) + 1):
                if ref_counts[(local_x - r) % len(ref_counts)] + 1 <= p.max_ref_count:
                    candidates.append(r)
        for r in candidates:
            scratch = BitWriter()
            _encode_node(
                scratch, p, x, succ, r, adj[local_x - r] if r > 0 else None
            )
            if best is None or scratch.nbits < best[0]:
                best = (scratch.nbits, r)
        r = best[1]
        ref_counts[local_x % len(ref_counts)] = (
            0 if r == 0 else ref_counts[(local_x - r) % len(ref_counts)] + 1
        )
        _encode_node(w, p, x, succ, r, adj[local_x - r] if r > 0 else None)
        offsets.append(w.nbits)
    return w.nbits, w.to_bytes(), offsets


def encode_segment(
    adj: list[list[int]], first_src: int, p: BVGraphProperties
) -> tuple[int, bytes, list[int]]:
    """Segment encode via the C kernel when available (bit-identical
    output), else the Python spec."""
    if adj:
        import numpy as np

        list_offsets = np.zeros(len(adj) + 1, dtype=np.int64)
        np.cumsum([len(a) for a in adj], out=list_offsets[1:])
        values = np.fromiter(
            (v for a in adj for v in a), dtype=np.int32, count=int(list_offsets[-1])
        )
        return encode_segment_csr(values, list_offsets, first_src, p)
    return encode_segment_py(adj, first_src, p)


def encode_segment_csr(
    values, list_offsets, first_src: int, p: BVGraphProperties
) -> tuple[int, bytes, list[int]]:
    """Segment encode from CSR adjacency (flat ``values`` int32 + n+1
    ``list_offsets`` int64) — the layout Arrow list columns already use,
    so the sink's mapInArrow path feeds the C kernel without ever
    materializing per-row Python lists. Falls back to the Python spec
    (bit-identical) when the kernel is unavailable."""
    import numpy as np

    from . import native

    # strict-ascending guard, vectorized: a non-positive gap is legal
    # only at a list boundary (see _check_ascending)
    if len(values) > 1:
        bad = np.flatnonzero(np.diff(values) <= 0) + 1
        if len(bad):
            starts = np.asarray(list_offsets[1:-1], dtype=np.int64)
            bad = np.setdiff1d(bad, starts, assume_unique=False)
            if len(bad):
                node = int(np.searchsorted(list_offsets, bad[0], side="right") - 1)
                raise ValueError(
                    f"node {first_src + node}: successor list must be "
                    "strictly ascending (sorted, duplicate-free) — "
                    "sort_array() the adj column (and dedup) before encoding"
                )
    res = native.encode_segment(values, list_offsets, first_src, p)
    if res is not None:
        nbits, buf, offsets = res
        return nbits, buf, offsets.tolist()
    adj = [
        values[list_offsets[i] : list_offsets[i + 1]].tolist()
        for i in range(len(list_offsets) - 1)
    ]
    return encode_segment_py(adj, first_src, p)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------


def load_offsets(offsets_bytes: bytes, p: BVGraphProperties) -> np.ndarray:
    """Fold the delta-coded offsets stream into an int64 bit-position array
    (n+1 entries) — the NumPy equivalent of the reference's Elias-Fano
    list (HdfsBVGraph.java:371-387,410-436). 8 bytes/node keeps 134M nodes
    in ~1 GB driver memory; EliasFanoOffsets (below the planner) compacts
    the retained copy."""
    from . import native
    from .bitio import pad as _pad

    fast = native.decode_offsets(_pad(offsets_bytes), p.nodes + 1, p.offset_code, p.zeta_k)
    if fast is not None:
        return fast
    r = BitReader(offsets_bytes)
    rd = r.make_reader(p.offset_code, p.zeta_k)
    out = np.empty(p.nodes + 1, dtype=np.int64)
    acc = 0
    for i in range(p.nodes + 1):
        acc += rd()
        out[i] = acc
    return out


class _Decoder:
    """Shared decode state over one .graph buffer."""

    def __init__(self, graph_bytes: bytes, p: BVGraphProperties, offsets: np.ndarray | None = None):
        from .bitio import pad

        self.data = pad(graph_bytes)  # padded ONCE; readers share it
        self.p = p
        self.offsets = offsets

    def _readers(self, r: BitReader):
        cached = r.readers_cache
        if cached is None:
            p = self.p
            cached = r.readers_cache = (
                r.make_reader(p.outdegree_code, p.zeta_k),
                r.make_reader(p.reference_code, p.zeta_k),
                r.make_reader(p.block_count_code, p.zeta_k),
                r.make_reader(p.block_code, p.zeta_k),
                r.make_reader(p.residual_code, p.zeta_k),
            )
        return cached

    def decode_node_random(self, x: int) -> list[int]:
        """Random-access decode of node x (offsets required); recurses into
        the reference chain like HdfsBVGraph.successors with window=None
        (HdfsBVGraph.java:189)."""
        assert self.offsets is not None, "random access requires offsets"
        r = BitReader(self.data, int(self.offsets[x]), prepadded=True)
        return self._decode_at(r, x, window=None, outd=None)

    def _decode_at(
        self,
        r: BitReader,
        x: int,
        window: list[list[int]] | None,
        outd: list[int] | None,
    ) -> list[int]:
        p = self.p
        rd_out, rd_ref, rd_bcnt, rd_blk, rd_res = self._readers(r)
        cyclic = p.window_size + 1

        d = rd_out()
        if window is not None:
            outd[x % cyclic] = d
        if d == 0:
            return []

        ref = rd_ref() if p.window_size > 0 else -1

        copied: list[int] = []
        extra_count = d
        if ref > 0:
            block_count = rd_bcnt()
            blocks = []
            for i in range(block_count):
                b = rd_blk() + (0 if i == 0 else 1)
                blocks.append(b)
            if window is not None:
                ref_list = window[(x - ref + cyclic) % cyclic][: outd[(x - ref + cyclic) % cyclic]]
            else:
                ref_list = self.decode_node_random(x - ref)
            # apply copy/skip mask
            pos = 0
            copying = True
            for b in blocks:
                if copying:
                    copied.extend(ref_list[pos : pos + b])
                pos += b
                copying = not copying
            if len(blocks) % 2 == 0:
                copied.extend(ref_list[pos:])  # implicit trailing copy run
            extra_count = d - len(copied)

        intervals: list[int] = []
        if extra_count > 0 and p.min_interval_length > 0:
            interval_count = r.read_gamma()
            prev = 0
            for i in range(interval_count):
                if i == 0:
                    left = nat2int(r.read_gamma()) + x
                else:
                    left = r.read_gamma() + prev + 1
                length = r.read_gamma() + p.min_interval_length
                intervals.extend(range(left, left + length))
                prev = left + length
                extra_count -= length

        residuals: list[int] = []
        if extra_count > 0:
            code = p.residual_code
            if code == ZETA:
                raw = r.read_zeta_run(extra_count, p.zeta_k)
            elif code == GAMMA:
                raw = r.read_gamma_run(extra_count)
            else:
                raw = [rd_res() for _ in range(extra_count)]
            v = x + nat2int(raw[0])
            residuals.append(v)
            for g in raw[1:]:
                v += g + 1
                residuals.append(v)

        if not copied and not intervals:
            return residuals
        # merge three already-sorted streams (mirrors MergedIntIterator);
        # Timsort's run detection makes concat+sort the fastest merge here
        return sorted(copied + intervals + residuals)


class NodeIterator:
    """Sequential decode over [from_node, upper_bound) with the cyclic
    reference window, seeding mid-graph starts by random access
    (HdfsBVGraph.java:221-229 equivalent)."""

    def __init__(
        self,
        graph_bytes: bytes,
        p: BVGraphProperties,
        from_node: int = 0,
        upper_bound: int | None = None,
        offsets: np.ndarray | None = None,
    ):
        self.dec = _Decoder(graph_bytes, p, offsets)
        self.p = p
        self.n = p.nodes
        self.from_node = from_node
        self.upper = min(self.n, upper_bound if upper_bound is not None else self.n)
        cyclic = p.window_size + 1
        self.window: list[list[int]] = [[] for _ in range(cyclic)]
        self.outd = [0] * cyclic
        self.reader = BitReader(self.dec.data, prepadded=True)
        if from_node > 0:
            if offsets is None:
                raise ValueError("mid-graph start requires offsets")
            for i in range(1, min(from_node + 1, cyclic)):
                pos = (from_node - i) % cyclic
                lst = self.dec.decode_node_random(from_node - i)
                self.window[pos] = lst
                self.outd[pos] = len(lst)
            self.reader.position(int(offsets[from_node]))
        self.curr = from_node - 1

    def __iter__(self):
        return self

    def __next__(self) -> tuple[int, list[int]]:
        if self.curr >= self.upper - 1:
            raise StopIteration
        self.curr += 1
        x = self.curr
        cyclic = self.p.window_size + 1
        lst = self.dec._decode_at(self.reader, x, self.window, self.outd)
        self.window[x % cyclic] = lst
        self.outd[x % cyclic] = len(lst)
        return x, lst


def decode_all(graph_bytes: bytes, p: BVGraphProperties) -> list[list[int]]:
    return [lst for _, lst in NodeIterator(graph_bytes, p)]


@dataclass
class BVGraphFiles:
    """On-disk triple basename.{graph,offsets,properties}."""

    basename: str

    def write(self, graph_bytes: bytes, offsets_bytes: bytes, p: BVGraphProperties) -> None:
        from .properties import format_properties

        with open(self.basename + ".graph", "wb") as f:
            f.write(graph_bytes)
        with open(self.basename + ".offsets", "wb") as f:
            f.write(offsets_bytes)
        with open(self.basename + ".properties", "w") as f:
            f.write(format_properties(p))

    def read(self) -> tuple[bytes, bytes, BVGraphProperties]:
        from .properties import parse_properties

        with open(self.basename + ".properties") as f:
            p = parse_properties(f.read())
        with open(self.basename + ".graph", "rb") as f:
            g = f.read()
        with open(self.basename + ".offsets", "rb") as f:
            o = f.read()
        return g, o, p


def write_offsets(graph_bytes: bytes, p: BVGraphProperties) -> bytes:
    """Regenerate the offsets stream by a full sequential decode — the
    reference's only sink (writeOffsets, HdfsBVGraph.java:394-408)."""
    from . import native
    from .bitio import pad as _pad

    res = native.decode_range(_pad(graph_bytes), p, 0, p.nodes, want_bitpos=True)
    if res is not None:
        positions = [0] + res[2].tolist()
    else:
        it = NodeIterator(graph_bytes, p)
        positions = [0]
        for _ in it:
            positions.append(it.reader.pos)
    w = BitWriter()
    wr_off = w.make_writer(p.offset_code, p.zeta_k)
    last = 0
    for pos in positions:
        wr_off(pos - last)
        last = pos
    return w.to_bytes()
