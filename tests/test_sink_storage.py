"""Sink storage seam: the compose plan must produce byte-identical
output through the local-FS path (FileComposer splicing part files) and
the object-storage path (MultipartComposer resolving part keys against a
blob store) — the cluster-topology decision must not change the bytes."""

from __future__ import annotations

import io
import random

import numpy as np
import pytest

from hadoopwebgraph_spark.bvgraph.codec import decode_all, encode_segment
from hadoopwebgraph_spark.bvgraph.properties import BVGraphProperties
from hadoopwebgraph_spark.bvgraph.sink import (
    _append_deltas,
    _BitStreamOut,
    _encode_offsets_entry0,
    _rephase_interior,
    _rephase_offsets_one,
    compose_graph,
    compose_offsets,
)
from hadoopwebgraph_spark.bvgraph.storage import (
    FileComposer,
    LocalFSStore,
    MemoryStore,
    MultipartComposer,
)


@pytest.mark.parametrize("store_cls", [LocalFSStore, MemoryStore])
def test_segment_store_roundtrip(tmp_path, store_cls):
    store = (
        store_cls(str(tmp_path / "blobs")) if store_cls is LocalFSStore
        else store_cls()
    )
    store.put("a", b"hello")
    store.put("b", b"\x00\xff" * 10)
    assert store.get("a") == b"hello"
    assert store.size("b") == 20
    with store.open_read("a") as f:
        assert f.read() == b"hello"
    store.put("a", b"overwritten")
    assert store.get("a") == b"overwritten"
    store.cleanup()
    with pytest.raises(Exception):
        store.get("a")


def _build_segments(stores, n_nodes=300, n_segs=3):
    """Run the sink's encode + re-phase steps locally (same calls the two
    Spark jobs make) and populate every store with the artifacts."""
    rng = random.Random(7)
    adj = [
        sorted(rng.sample(range(n_nodes), rng.randrange(0, 8)))
        for _ in range(n_nodes)
    ]
    per = n_nodes // n_segs
    p0 = BVGraphProperties(nodes=n_nodes, arcs=0)
    seg_results, seg_onbits, bases, base = [], [], {}, 0
    for idx in range(n_segs):
        seg_adj = adj[idx * per : (idx + 1) * per]
        ps = BVGraphProperties(nodes=len(seg_adj), arcs=0)
        nbits, buf, offsets = encode_segment(seg_adj, idx * per, ps)
        raw = bytes(buf[: (nbits + 7) // 8])
        bases[idx] = base
        head, interior, tail, tail_fill = _rephase_interior(raw, nbits, base % 8)
        offs = np.asarray(offsets, dtype=np.int64)
        ow = io.BytesIO()
        oout = _BitStreamOut(ow)
        _append_deltas(oout, (offs[1:] + base).tolist(), base, p0)
        onbits = oout.nbits
        oout.close()
        for st in stores:
            st.put(f"seg-{idx:05d}.part", interior)
            st.put(f"seg-{idx:05d}.offs", offs.tobytes())
            st.put(f"seg-{idx:05d}.offs.raw", ow.getvalue())
        seg_results.append((idx, head, None, nbits, tail, tail_fill))
        seg_onbits.append(onbits)
        base += nbits
    # job-3 equivalent: re-phase each offsets chunk to its absolute base
    entry0, n0bits = _encode_offsets_entry0(p0)
    obase = n0bits
    oseg_results = []
    for (idx, *_), onbits in zip(seg_results, seg_onbits):
        res = None
        for st in stores:  # parts must land in every store under test
            res = _rephase_offsets_one((idx, obase, onbits), st)
        oseg_results.append(res)
        obase += onbits
    return adj, p0, seg_results, bases, entry0, n0bits, oseg_results


def test_compose_multipart_matches_file(tmp_path):
    fs_store = LocalFSStore(str(tmp_path / "spill"))
    blob_store = MemoryStore()
    adj, p0, seg_results, bases, entry0, n0bits, oseg = _build_segments(
        [fs_store, blob_store]
    )

    fc = FileComposer(str(tmp_path / "out.graph"), fs_store)
    compose_graph(seg_results, fs_store, fc)
    fc.close()
    fo = FileComposer(str(tmp_path / "out.offsets"), fs_store)
    compose_offsets(oseg, entry0, n0bits, fs_store, fo)
    fo.close()

    mg = MultipartComposer(blob_store)
    compose_graph(seg_results, blob_store, mg)
    mo = MultipartComposer(blob_store)
    compose_offsets(oseg, entry0, n0bits, blob_store, mo)

    with open(tmp_path / "out.graph", "rb") as f:
        g_file = f.read()
    with open(tmp_path / "out.offsets", "rb") as f:
        o_file = f.read()
    assert mg.result() == g_file
    assert mo.result() == o_file
    # the multipart plan actually references parts by key — interiors
    # never stream through the driver as literal bytes
    assert sum(1 for kind, _ in mg.ops if kind == "part") == len(seg_results)
    # and the composed stream is a correct BVGraph: decodes to the input
    assert decode_all(g_file, p0) == adj


def test_compose_micro_segment_inline(tmp_path):
    """Degenerate micro-segments (< 16 bits) take the inline-literal path
    in both composers and still agree byte-for-byte."""
    store = MemoryStore()
    p0 = BVGraphProperties(nodes=2, arcs=0)
    # one node, empty adjacency -> a few bits only
    nbits, buf, offsets = encode_segment([[]], 0, BVGraphProperties(nodes=1, arcs=0))
    raw = bytes(buf[: (nbits + 7) // 8])
    offs = np.asarray(offsets, dtype=np.int64)
    store.put("seg-00000.offs", offs.tobytes())
    # job-2 equivalent for the micro segment: encode its offsets chunk
    ow = io.BytesIO()
    oout = _BitStreamOut(ow)
    _append_deltas(oout, (offs[1:] + 0).tolist(), 0, p0)
    onbits = oout.nbits
    oout.close()
    store.put("seg-00000.offs.raw", ow.getvalue())
    seg_results = [(0, 0, raw, nbits, 0, 0)]

    fc = FileComposer(str(tmp_path / "m.graph"), store)
    compose_graph(seg_results, store, fc)
    fc.close()
    mg = MultipartComposer(store)
    compose_graph(seg_results, store, mg)
    with open(tmp_path / "m.graph", "rb") as f:
        assert mg.result() == f.read()

    entry0, n0bits = _encode_offsets_entry0(p0)
    oseg = [_rephase_offsets_one((0, n0bits, onbits), store)]
    assert oseg[0][2] is not None  # micro-chunk takes the inline path
    fo = FileComposer(str(tmp_path / "m.offsets"), store)
    compose_offsets(oseg, entry0, n0bits, store, fo)
    fo.close()
    mo = MultipartComposer(store)
    compose_offsets(oseg, entry0, n0bits, store, mo)
    with open(tmp_path / "m.offsets", "rb") as f:
        assert mo.result() == f.read()
