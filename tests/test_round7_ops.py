"""Round-7 additions: driver-gated HyperBall/HyperANF entries and the
integer-scaled exact mode behind them."""

from __future__ import annotations

import math

import pytest


def _exact_harmonic(pairs, nodes):
    """Exact harmonic centrality by BFS from every node (H(v) sums 1/d(u,v)
    over in-reachable u)."""
    from collections import deque

    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
    H = {v: 0.0 for v in nodes}
    for s in nodes:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            for y in adj.get(x, ()):
                if y not in dist:
                    dist[y] = dist[x] + 1
                    dq.append(y)
        for v, d in dist.items():
            if d > 0:
                H[v] += 1.0 / d
    return H


def test_hyperball_scaled_mode_is_integer_exact(spark):
    """scale=LCM(1..max_hops) turns the harmonic accumulation into exact
    integer arithmetic: h_scaled must equal scale * H(v) exactly."""
    import random

    from hadoopwebgraph_spark.queries.graph_algos import hyperball_harmonic

    rng = random.Random(7)
    pairs = list({(rng.randrange(25), rng.randrange(25)) for _ in range(80)})
    pairs = [(s, d) for s, d in pairs if s != d]
    nodes = {v for p in pairs for v in p}
    scale = math.lcm(*range(1, 17))
    e = spark.createDataFrame(pairs, "src int, dst int")
    got = {
        r.node: r.h_scaled
        for r in hyperball_harmonic(e, max_hops=16, scale=scale).collect()
    }
    want = _exact_harmonic(pairs, nodes)
    assert set(got) == nodes
    for v in nodes:
        # the exact H(v) is a sum of 1/d terms with d <= 16, so
        # scale * H(v) is an exact integer — compare with zero tolerance
        assert got[v] == round(want[v] * scale), (v, got[v], want[v] * scale)


def test_hyperball_scale_must_divide_all_hops(spark):
    from hadoopwebgraph_spark.queries.graph_algos import hyperball_harmonic

    e = spark.createDataFrame([(0, 1)], "src int, dst int")
    # 840 = LCM(1..8): valid through hop 8, not divisible by 11/13/16
    with pytest.raises(ValueError, match="not divisible"):
        hyperball_harmonic(e, max_hops=16, scale=840)


def test_neighborhood_function_single_dip_does_not_stop(spark):
    """The fixpoint test requires TWO consecutive non-growing hops; on a
    strictly growing path the full N(t) curve must come back intact."""
    from hadoopwebgraph_spark.queries.graph_algos import neighborhood_function

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src int, dst int"
    )
    nf = neighborhood_function(path)
    # path on 7 nodes: N(t) = 7 + 6 + ... + (7 - t) cumulated
    want = []
    total = 0
    for t in range(7):
        total += 7 - t
        want.append(float(total))
    assert nf == want
