"""Property-based codec tests (hypothesis): arbitrary adjacency structures
must round-trip through encode/decode under arbitrary format parameters —
the strongest guard on the decode kernel's reference-chain / interval /
residual edge cases."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from hadoopwebgraph_spark.bvgraph.bitio import BitReader, BitWriter
from hadoopwebgraph_spark.bvgraph.codec import (
    NodeIterator,
    decode_all,
    encode_graph,
    load_offsets,
)


@st.composite
def adjacency(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    adj = []
    for _ in range(n):
        succ = draw(
            st.lists(st.integers(min_value=0, max_value=max(0, n - 1)), max_size=25)
        )
        adj.append(sorted(set(succ)) if n else [])
    return adj


@st.composite
def params(draw):
    return dict(
        window_size=draw(st.integers(min_value=0, max_value=8)),
        max_ref_count=draw(st.integers(min_value=0, max_value=4)),
        min_interval_length=draw(st.sampled_from([0, 2, 3, 4, 7])),
        zeta_k=draw(st.integers(min_value=1, max_value=5)),
    )


@settings(max_examples=60, deadline=None)
@given(adjacency(), params())
def test_roundtrip_any_graph_any_params(adj, kw):
    if kw["min_interval_length"] == 0:
        kw["min_interval_length"] = 1  # 0 == NO_INTERVALS sentinel; keep >=1
    g, ob, p = encode_graph(adj, **kw)
    assert decode_all(g, p) == adj
    if adj:
        offsets = load_offsets(ob, p)
        mid = len(adj) // 2
        part = [lst for _, lst in NodeIterator(g, p, from_node=mid, offsets=offsets)]
        assert part == adj[mid:]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=50))
def test_code_roundtrip_any_values(values):
    w = BitWriter()
    for v in values:
        w.write_gamma(v)
        w.write_delta(v)
        w.write_zeta(v, 3)
        w.write_nibble(v)
    r = BitReader(w.to_bytes())
    for v in values:
        assert r.read_gamma() == v
        assert r.read_delta() == v
        assert r.read_zeta(3) == v
        assert r.read_nibble() == v
