"""Bottom-k ANF with exact incremental updates (r15-staged;
functions/anf.py) — the streaming-HyperANF design finally built with
the explicit sketch representation the NOTES r13 design note demands.

Verified three ways: the sketch levels against a pure-Python bottom-k
reference (the KMV property makes truncated propagation equal the
k-smallest hashes of the TRUE ball, so the reference computes exact
balls), the delta-propagated levels row-identical to a full recompute
across randomized batch splits, and the md5 hash discipline pinned
cross-engine against DuckDB."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from hadoopwebgraph_spark.functions.anf import (
    anf_curve,
    anf_curve_from_levels,
    anf_delta_update,
    anf_over_batches,
    ball_sketches,
)


def _h(u: int) -> int:
    return int(hashlib.md5(f"anf-{u}".encode()).hexdigest()[:10], 16) + 1


def _ref_levels(edges, hops, k):
    """k smallest member hashes of the TRUE in-ball per node per level
    (equal to truncated propagation by the KMV union property)."""
    edges = {(s, d) for s, d in edges if s != d}
    nodes = {u for e in edges for u in e}
    balls = {u: {u} for u in nodes}
    out = [dict(balls)]
    for _ in range(hops):
        nxt = {v: set(b) for v, b in balls.items()}
        for s, d in edges:
            nxt[d] |= balls[s]
        balls = nxt
        out.append({v: set(b) for v, b in balls.items()})
    return [
        {v: sorted(_h(u) for u in b)[:k] for v, b in lvl.items()}
        for lvl in out
    ]


def _ref_curve(edges, hops, k):
    scale = 1 << 40
    curve = []
    for t, lvl in enumerate(_ref_levels(edges, hops, k)):
        total = 0
        for v, hs in lvl.items():
            total += len(hs) if len(hs) < k else (k - 1) * scale // hs[-1]
        curve.append((t, total))
    return curve


def _edges_df(spark, edges):
    return spark.createDataFrame(list(edges), "src long, dst long")


def _levels_as_sets(levels):
    return [
        {(r.node, r.h) for r in lvl.collect()} for lvl in levels
    ]


GRAPHS = {
    "chain+cycle": [(0, 1), (1, 2), (2, 3), (3, 0), (4, 0), (2, 4)],
    "star": [(i, 9) for i in range(9)] + [(9, 0)],
    "two-comps": [(0, 1), (1, 0), (5, 6), (6, 7), (7, 5), (8, 5)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
@pytest.mark.parametrize("k", [2, 64])
def test_ball_sketches_match_reference(spark, name, k):
    edges = GRAPHS[name]
    got = _levels_as_sets(ball_sketches(_edges_df(spark, edges), 3, k))
    ref = _ref_levels(edges, 3, k)
    want = [
        {(v, h) for v, hs in lvl.items() for h in hs} for lvl in ref
    ]
    assert got == want


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_anf_curve_matches_reference(spark, name):
    edges = GRAPHS[name]
    k = 3  # force the estimator branch on tiny balls
    got = sorted(
        (r.t, r.n_scaled)
        for r in anf_curve(_edges_df(spark, edges), 3, k).collect()
    )
    assert got == _ref_curve(edges, 3, k)


def test_hash_discipline_cross_engine(spark):
    """Spark node_hash == DuckDB _hash_sql == the Python reference, so
    the future registered gate's oracle mirrors bit-for-bit."""
    from hadoopwebgraph_spark.functions.anf import _hash_sql, node_hash

    vals = [0, 1, 7, 399, 123456]
    s = {
        r.node: r.h
        for r in spark.createDataFrame([(v,) for v in vals], "node long")
        .select("node", node_hash(F.col("node")))
        .collect()
    }
    con = duckdb.connect()
    for v in vals:
        d = con.sql(f"SELECT {_hash_sql(str(v))}").fetchone()[0]
        assert s[v] == d == _h(v)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k", [2, 64])
def test_delta_update_equals_recompute(spark, seed, k):
    """The heart of the staged operator: fold random edge batches
    through anf_delta_update and compare every level ROW-IDENTICAL to a
    full rebuild on the union graph — including the truncation-eviction
    cases the docstring's exactness argument covers."""
    import random

    rng = random.Random(seed)
    nodes = list(range(14))
    all_edges = [
        (s, d) for s in nodes for d in nodes if s != d and rng.random() < 0.2
    ]
    rng.shuffle(all_edges)
    cut1, cut2 = len(all_edges) // 3, 2 * len(all_edges) // 3
    batches = [
        all_edges[:cut1],
        all_edges[cut1:cut2],
        all_edges[cut2:] + all_edges[:2],  # replayed edges are no-ops
    ]
    got = anf_over_batches([_edges_df(spark, b) for b in batches], 3, k)
    want = ball_sketches(_edges_df(spark, all_edges), 3, k)
    assert _levels_as_sets(got) == _levels_as_sets(want)


def test_mismatched_k_raises(spark):
    """ADVICE r14: levels carry their build k (AnfLevels.k); consuming
    them at a different k would truncate at the wrong bound and produce
    WRONG levels/estimates — it must fail loudly, not approximate."""
    e = _edges_df(spark, GRAPHS["star"])
    levels = ball_sketches(e, 2, 64)
    assert levels.k == 64
    with pytest.raises(ValueError, match="built with k=64"):
        anf_delta_update(levels, e, e, k=32)
    with pytest.raises(ValueError, match="built with k=64"):
        anf_curve_from_levels(levels, k=32)
    # delta-updated levels inherit the stamp
    assert anf_delta_update(levels, e, e, k=64).k == 64
    # slices keep the stamp too (plain list slicing would strip the
    # subclass and bypass the guard — review r15)
    assert levels[:2].k == 64
    with pytest.raises(ValueError, match="built with k=64"):
        anf_curve_from_levels(levels[:2], k=32)


def test_delta_update_new_nodes_appear_mid_stream(spark):
    """Nodes first seen in a later batch get seeded and propagate —
    the changed_0 = fresh-nodes path."""
    b1 = [(0, 1), (1, 2)]
    b2 = [(3, 0), (2, 3)]  # node 3 is brand new
    got = anf_over_batches([_edges_df(spark, b) for b in [b1, b2]], 2, 64)
    want = ball_sketches(_edges_df(spark, b1 + b2), 2, 64)
    assert _levels_as_sets(got) == _levels_as_sets(want)


def test_streaming_foreachbatch_twin(spark, tmp_path):
    """Drive a REAL file-source stream whose foreachBatch body is the
    delta update; the final curve equals the batch curve over
    everything ingested (the incremental-twin contract every other
    streaming op in the repo pins)."""
    import os

    edges = GRAPHS["chain+cycle"] + [(5, 2), (4, 5), (0, 4)]
    inc = str(tmp_path / "incoming")
    os.makedirs(inc)
    batches = [edges[:3], edges[3:6], edges[6:]]
    state = {}

    def one_batch(batch_df, batch_id):
        from hadoopwebgraph_spark.functions.anf import (
            _norm_edges,
            anf_delta_update,
            ball_sketches,
        )

        nb = _norm_edges(batch_df).localCheckpoint(eager=True)
        if "levels" not in state:
            state["levels"] = ball_sketches(nb, 3, 64)
            state["acc"] = nb
        else:
            state["levels"] = anf_delta_update(
                state["levels"], state["acc"], nb, 64
            )
            state["acc"] = (
                state["acc"].union(nb).distinct().localCheckpoint(eager=True)
            )

    stream = (
        spark.readStream.schema("src long, dst long").parquet(inc)
    )
    q = (
        stream.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        for i, b in enumerate(batches):
            # file streams do not recurse: stage the batch, then drop its
            # part files flat into the watch dir (the test_round12 idiom)
            import glob
            import shutil

            stage = str(tmp_path / f"stage{i}")
            _edges_df(spark, b).write.parquet(stage)
            for j, f in enumerate(
                sorted(glob.glob(os.path.join(stage, "*.parquet")))
            ):
                shutil.copy(f, os.path.join(inc, f"b{i}-{j}.parquet"))
            q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.t, r.n_scaled)
        for r in anf_curve_from_levels(state["levels"], 64).collect()
    )
    want = sorted(
        (r.t, r.n_scaled)
        for r in anf_curve(_edges_df(spark, edges), 3, 64).collect()
    )
    assert got == want


def test_g45_staged_streaming_gate_pair(spark, sf_small):
    """Oracle pair for the g45 gate (REGISTERED in r16; staged r15):
    g45 drives a real foreachBatch stream inside the query fn and must
    hash-match the SAME recursive-CTE oracle as the batch gate g44 —
    the delta update's rebuild-identity makes micro-batch boundaries
    invisible to the result."""
    from hadoopwebgraph_spark.functions.anf import (
        _g44_oracle,
        g45_anf_stream_curve,
    )
    from tests.oracle_util import compare

    compare(
        spark, sf_small, "g45_anf_stream_curve",
        g45_anf_stream_curve, _g44_oracle(),
    )


def test_anf_streaming_curve_carve_independence(spark):
    """anf_streaming_curve at a different batch count returns the same
    rows — the carve-independence claim its docstring registers on."""
    from hadoopwebgraph_spark.functions.anf import anf_streaming_curve

    e = _edges_df(spark, GRAPHS["chain+cycle"] + [(5, 2), (0, 4)])
    got2 = sorted(map(tuple, anf_streaming_curve(e, 2, 64, 2).collect()))
    got5 = sorted(map(tuple, anf_streaming_curve(e, 2, 64, 5).collect()))
    want = sorted(map(tuple, anf_curve(e, 2, 64).collect()))
    assert got2 == want and got5 == want


def test_g46_staged_harmonic_pair(spark, sf_small):
    """Oracle pair for the g46 harmonic-centrality gate (REGISTERED in
    r16; staged r15):
    per-node truncated harmonic in-centrality off the ball-sketch
    levels, integer-exact against the recursive-CTE BFS oracle at every
    sketch regime (the HLL g26 read-out needs sparse-exact)."""
    from hadoopwebgraph_spark.functions.anf import (
        _g46_oracle,
        g46_harmonic_centrality,
    )
    from tests.oracle_util import compare

    compare(
        spark, sf_small, "g46_harmonic_centrality",
        g46_harmonic_centrality, _g46_oracle(),
    )


def test_harmonic_exact_below_k(spark):
    """With k larger than any ball, h_scaled is EXACTLY
    lcm(1..T) * Σ_{u reaches v in d<=T hops} 1/d(u,v) — checked against
    a driver-side BFS on a small graph."""
    import math

    from hadoopwebgraph_spark.functions.anf import (
        ball_sketches,
        harmonic_from_levels,
    )

    edges = GRAPHS["chain+cycle"] + [(5, 2), (0, 4)]
    hops, k = 3, 1024
    got = {
        r.node: r.h_scaled
        for r in harmonic_from_levels(
            ball_sketches(_edges_df(spark, edges), hops, k), k
        ).collect()
    }
    # driver-side truncated BFS over the reverse graph (in-centrality)
    nodes = sorted({u for e in edges for u in e})
    adj: dict[int, set[int]] = {u: set() for u in nodes}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
    lcm = math.lcm(*range(1, hops + 1))
    want = {}
    for v in nodes:
        # d(u, v) for all u via BFS from every u (graphs are tiny)
        total = 0
        for u in nodes:
            if u == v:
                continue
            frontier, seen, d = {u}, {u}, 0
            dist = None
            while frontier and d < hops:
                d += 1
                frontier = {
                    w for x in frontier for w in adj[x] if w not in seen
                }
                seen |= frontier
                if v in frontier:
                    dist = d
                    break
            if dist is not None:
                total += lcm // dist
        want[v] = total
    assert got == want


def test_anf_single_partition_parents_are_final_aggregates(spark):
    """The q77-class scale pin, done the audit script's way (the naive
    'no SinglePartition in the tree slice' assertion was vacuous —
    review r14): every SinglePartition exchange in the curve plan must
    feed a final global aggregate (one partial row per partition), never
    a corpus-scale Sort or Window."""
    import re

    df = anf_curve(_edges_df(spark, GRAPHS["chain+cycle"]), 2, 64)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    lines = plan.splitlines()
    sp_ids, cur = set(), None
    for line in lines:
        m = re.match(r"^\((\d+)\) Exchange", line)
        if m:
            cur = m.group(1)
        if cur and "Arguments: SinglePartition" in line:
            sp_ids.add(cur)
            cur = None
    tree = lines[: lines.index("")] if "" in lines else lines[:80]
    parents = []
    for i, line in enumerate(tree):
        m = re.search(r"(\w+) \((\d+)\)\s*$", line)
        if m and m.group(2) in sp_ids:
            depth = len(line) - len(line.lstrip(" +-:"))
            for j in range(i - 1, -1, -1):
                mj = re.search(r"(\w+) \((\d+)\)\s*$", tree[j])
                dj = len(tree[j]) - len(tree[j].lstrip(" +-:"))
                if mj and dj < depth:
                    parents.append(mj.group(1))
                    break
    aggs = {"HashAggregate", "ObjectHashAggregate", "SortAggregate", "Union"}
    assert all(p in aggs for p in parents), (parents, plan)


# The r14-staged dry-run pair was promoted to @register("g44_anf_curve")
# in round 15 (functions/anf.py, hops=3 to budget the gate — both
# estimator branches still exercised: max in-ball 385 > k=64). The
# registry entry is the single source of truth; the full-registry
# parity sweep and the driver's t2 loop run it.
def test_g44_registered_pair_parity(spark, sf_small):
    from hadoopwebgraph_spark.registry import all_queries

    from tests.oracle_util import compare

    q = all_queries()["g44_anf_curve"]
    assert q.oracle is not None
    compare(spark, sf_small, q.name, q.fn, q.oracle)


def test_g45_g46_registered_pair_parity(spark, sf_small):
    """The r16 registrations: the registry entries (not the module
    functions) are the single source of truth — both carry full hash
    oracles (no rows-only fallback)."""
    from hadoopwebgraph_spark.registry import all_queries

    from tests.oracle_util import compare

    qs = all_queries()
    for name in ("g45_anf_stream_curve", "g46_harmonic_centrality"):
        q = qs[name]
        assert q.oracle is not None
        compare(spark, sf_small, q.name, q.fn, q.oracle)


def test_streaming_curve_empty_edges_matches_batch_twin(spark):
    """An empty (post-normalization) edge set stages no files and fires
    no micro-batch; the streaming gate must return the batch twin's
    all-zero curve instead of raising (ADVICE r15): the rebuild-identity
    claim covers the empty-graph edge case."""
    from hadoopwebgraph_spark.functions.anf import (
        anf_curve,
        anf_streaming_curve,
    )

    # only self-loops -> empty after normalization
    e = _edges_df(spark, [(3, 3), (7, 7)])
    got = sorted(map(tuple, anf_streaming_curve(e, 2, 64, 3).collect()))
    want = sorted(map(tuple, anf_curve(e, 2, 64).collect()))
    assert got == want
    assert got == [(0, 0), (1, 0), (2, 0)]
