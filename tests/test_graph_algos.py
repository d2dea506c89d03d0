"""Iterative graph algorithms + sinks: exactness on hand-computed
fixtures, round-trip through the BVGraph sink, parquet sink round-trip."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from hadoopwebgraph_spark.bvgraph.codec import decode_all
from hadoopwebgraph_spark.bvgraph.datasource import read_bvgraph
from hadoopwebgraph_spark.bvgraph.properties import parse_properties
from hadoopwebgraph_spark.bvgraph.sink import write_bvgraph
from hadoopwebgraph_spark.queries.graph_algos import connected_components, pagerank


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


def test_connected_components_exact(spark):
    # two components: {0,1,2,3} via chain, {10,11} ; directed edges
    e = _edges_df(spark, [(0, 1), (1, 2), (3, 2), (10, 11)])
    cc = {r.node: r.component for r in connected_components(e).collect()}
    assert cc == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10}


def test_pagerank_exact_small(spark):
    # 3-cycle: symmetric -> all ranks equal 1.0 (n-normalized)
    e = _edges_df(spark, [(0, 1), (1, 2), (2, 0)])
    pr = {r.node: r.rank for r in pagerank(e, iterations=20).collect()}
    for v in pr.values():
        assert abs(v - 1.0) < 1e-6


def test_pagerank_dangling_mass_conserved(spark):
    # 0 -> 1, 1 dangling: total rank must stay == n
    e = _edges_df(spark, [(0, 1)])
    pr = pagerank(e, iterations=30)
    total = sum(r.rank for r in pr.collect())
    assert abs(total - 2.0) < 1e-6
    ranks = {r.node: r.rank for r in pr.collect()}
    assert ranks[1] > ranks[0]  # 1 receives 0's rank


def test_connected_components_long_path_pointer_jumping(spark):
    # 33-node path: plain min-label propagation needs ~32 iterations;
    # pointer jumping must converge well under the cap of 12
    e = _edges_df(spark, [(i, i + 1) for i in range(32)])
    cc = {r.node: r.component for r in connected_components(e, max_iterations=12).collect()}
    assert cc == {i: 0 for i in range(33)}


def test_connected_components_raises_at_cap(spark):
    e = _edges_df(spark, [(i, i + 1) for i in range(32)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, max_iterations=1)


def test_pagerank_isolated_nodes_get_rank(spark):
    # node 5 is isolated (no edges at all); with an explicit node set it
    # must still get the (1 - damping) base rank and total mass stays == n
    e = _edges_df(spark, [(0, 1), (1, 0)])
    nodes = spark.createDataFrame([(0,), (1,), (5,)], "node int")
    pr = {r.node: r.rank for r in pagerank(e, iterations=30, nodes=nodes).collect()}
    assert set(pr) == {0, 1, 5}
    assert abs(sum(pr.values()) - 3.0) < 1e-6
    assert pr[5] > 0


def test_bvgraph_sink_roundtrip(spark, tmp_path):
    # read small fixture -> write through the distributed sink -> decode
    # files directly and via the source; adjacency must be identical
    from hadoopwebgraph_spark.queries.graph import SMALL_BASENAME, SMALL_PARQUET

    df = read_bvgraph(spark, SMALL_BASENAME, num_splits=5)
    out_base = str(tmp_path / "rt")
    p = write_bvgraph(df, out_base)
    assert p.nodes == 2000

    twin = pq.read_table(SMALL_PARQUET)
    expected = {s: a for s, a in zip(twin["src"].to_pylist(), twin["adj"].to_pylist())}

    with open(out_base + ".properties") as f:
        p2 = parse_properties(f.read())
    with open(out_base + ".graph", "rb") as f:
        g = f.read()
    decoded = decode_all(g, p2)
    assert {i: lst for i, lst in enumerate(decoded)} == expected

    back = read_bvgraph(spark, out_base, num_splits=7)
    assert {r.src: list(r.adj) for r in back.collect()} == expected


def test_parquet_sink_roundtrip(spark, sf_small, tmp_path):
    from hadoopwebgraph_spark.catalog import load

    out = str(tmp_path / "li_out")
    li = load(spark, sf_small, "lineitem").filter("l_linenumber = 1")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert set(back.columns) == set(li.columns)


def test_graph_algo_queries_run(spark, sf_small):
    from hadoopwebgraph_spark.queries.graph_algos import (
        g11_pagerank,
        g12_connected_components,
    )

    pr = g11_pagerank(spark, sf_small).collect()
    assert len(pr) == 20
    assert all(r.rank > 0 for r in pr)
    cc = g12_connected_components(spark, sf_small).collect()
    assert sum(r.size * r.n_components for r in cc) == 2000  # every node labeled


def test_bvgraph_sink_roundtrip_100k(spark, tmp_path):
    """Streaming assembly at scale: 32 parallel segments re-phased into one
    file; checksums must survive the roundtrip (peak driver memory is one
    segment, not the graph)."""
    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.queries.graph import BENCH_BASENAME

    df = read_bvgraph(spark, BENCH_BASENAME, num_splits=32)

    def checksum(frame):
        r = frame.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("adj")).alias("m"),
            F.sum(F.col("src") * F.size("adj")).alias("w"),
            F.sum(F.expr("aggregate(adj, 0L, (a, x) -> a + x)")).alias("s"),
        ).collect()[0]
        return (r.n, r.m, r.w, r.s)

    out_base = str(tmp_path / "big_rt")
    p = write_bvgraph(df, out_base)
    assert p.nodes == 100000
    back = read_bvgraph(spark, out_base, num_splits=13)
    assert checksum(back) == checksum(df)
    # no spill leftovers once the compose completes
    assert not os.path.exists(out_base + ".spill")


def test_bvgraph_sink_degenerate_graphs(spark, tmp_path):
    """Micro-segment and empty-input paths of the executor-parallel
    writer: 1-node, 3-node (with empty adjacency rows), and 0-node
    graphs must roundtrip exactly."""
    cases = {
        "one": [(0, [0])],
        "three": [(0, []), (1, [0, 2]), (2, [])],
        "empty": [],
    }
    for name, rows in cases.items():
        df = spark.createDataFrame(rows, "src int, adj array<int>")
        base = str(tmp_path / name)
        p = write_bvgraph(df, base)
        assert p.nodes == len(rows)
        back = {r.src: list(r.adj) for r in read_bvgraph(spark, base, num_splits=2).collect()}
        assert back == {s: a for s, a in rows}, name


def test_bvgraph_sink_deterministic(spark, tmp_path):
    """The executor-parallel writer must be byte-deterministic: explicit
    src // rows_per ranges (not sampled repartitionByRange boundaries)
    mean segmentation — and therefore the compressed bytes — are a pure
    function of the input."""
    from hadoopwebgraph_spark.queries.graph import SMALL_BASENAME

    df = read_bvgraph(spark, SMALL_BASENAME, num_splits=5)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_bvgraph(df, a)
    write_bvgraph(df, b)
    for ext in (".graph", ".offsets"):
        with open(a + ext, "rb") as fa, open(b + ext, "rb") as fb:
            assert fa.read() == fb.read(), ext


def test_motif_dsl(spark):
    """Motif patterns compile to the expected bindings on a hand-built
    graph: triangle, open triad with negation, self-loop, and error
    cases."""
    from hadoopwebgraph_spark.queries.motif import find_motif, parse_pattern

    # graph: 0->1, 1->2, 0->2 (closed triangle), 2->3 (dangling), 4->4
    e = _edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (4, 4)])

    tri = find_motif(e, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
    # GraphFrames semantics: distinct names may bind the same vertex, so
    # the 4->4 self-loop matches as (4,4,4); filter a != c to exclude
    assert {tuple(r) for r in tri.collect()} == {(0, 1, 2), (4, 4, 4)}
    strict = tri.filter("a != c")
    assert [tuple(r) for r in strict.collect()] == [(0, 1, 2)]

    opens = find_motif(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    got = {tuple(r) for r in opens.collect()}
    # 2-paths: 0->1->2 (closed by 0->2), 1->2->3, 0->2->3, 4->4->4 (!4->4
    # exists so excluded)
    assert got == {(1, 2, 3), (0, 2, 3)}

    loops = find_motif(e, "(a)-[]->(a)")
    assert [r.a for r in loops.collect()] == [4]

    with pytest.raises(ValueError):
        parse_pattern("(a)-[]->(b); garbage")
    with pytest.raises(ValueError):
        parse_pattern("!(a)-[]->(b)")  # negation with unbound vertices


def test_label_propagation_exact(spark):
    """Synchronous LPA with min-label ties on a barbell: two triangles
    joined by a bridge must settle into two communities."""
    from hadoopwebgraph_spark.queries.graph_algos import label_propagation

    e = _edges_df(
        spark,
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)],
    )
    labels = {r.node: r.label for r in label_propagation(e, iterations=3).collect()}
    assert labels[0] == labels[1] == labels[2] == 0
    assert labels[10] == labels[11] == labels[12]
    assert labels[10] != 0 or labels == {n: 0 for n in labels}  # bridge may merge
    # deterministic: two runs agree exactly
    again = {r.node: r.label for r in label_propagation(e, iterations=3).collect()}
    assert labels == again


def test_bfs_distances_exact(spark):
    """Diamond + tail: hop distances are min over paths; unreachable and
    beyond-cap nodes are absent."""
    from hadoopwebgraph_spark.queries.graph_algos import bfs_distances

    # 0->1, 0->2, 1->3, 2->3, 3->4 ; 9 isolated-from-0 (edge 9->0 only:
    # reachability is directed, so 9 is NOT reachable from 0)
    e = _edges_df(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (9, 0)])
    d = {r.node: r.d for r in bfs_distances(e, source=0).collect()}
    assert d == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}
    # cap: with max_hops=2 node 4 is absent
    d2 = {r.node: r.d for r in bfs_distances(e, source=0, max_hops=2).collect()}
    assert d2 == {0: 0, 1: 1, 2: 1, 3: 2}


def test_kcore_exact(spark):
    """Triangle + pendant chain: 2-core is exactly the triangle; the
    chain peels off over successive rounds."""
    from hadoopwebgraph_spark.queries.graph_algos import kcore

    # triangle 0-1-2 (as directed edges; kcore symmetrizes), chain 2-3-4-5
    e = _edges_df(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5)])
    core = {r.node: r.core_deg for r in kcore(e, k=2, rounds=8).collect()}
    assert core == {0: 2, 1: 2, 2: 2}
    # k=3: nothing survives
    assert kcore(e, k=3, rounds=8).count() == 0


def test_kcore_self_loops_ignored(spark):
    from hadoopwebgraph_spark.queries.graph_algos import kcore

    # self-loops must not keep a pendant node alive
    e = _edges_df(spark, [(0, 1), (1, 2), (2, 0), (5, 5), (5, 0)])
    core = {r.node: r.core_deg for r in kcore(e, k=2, rounds=8).collect()}
    assert core == {0: 2, 1: 2, 2: 2}


def test_hits_exact_star(spark):
    """Star: 0->{1,2,3}. Node 0 is the only hub; 1,2,3 are equal
    authorities; scores L1-normalize to 1 on each side."""
    from hadoopwebgraph_spark.queries.graph_algos import hits

    e = _edges_df(spark, [(0, 1), (0, 2), (0, 3)])
    rows = {r.node: (r.auth, r.hub) for r in hits(e, iterations=5).collect()}
    assert abs(rows[0][1] - 1.0) < 1e-9 and abs(rows[0][0]) < 1e-9
    for n in (1, 2, 3):
        assert abs(rows[n][0] - 1.0 / 3.0) < 1e-9 and abs(rows[n][1]) < 1e-9
    assert abs(sum(a for a, _ in rows.values()) - 1.0) < 1e-9
    assert abs(sum(h for _, h in rows.values()) - 1.0) < 1e-9


def test_clustering_coefficient_exact(spark, monkeypatch, tmp_path):
    """Triangle + pendant: triangle corners have coeff 1.0 (and the
    corner attached to the pendant 2*1/(3*2)=1/3... computed by hand):
    nodes 0,1,2 form a triangle; 2-3 pendant edge."""
    from hadoopwebgraph_spark.bvgraph.codec import BVGraphFiles, encode_graph
    from hadoopwebgraph_spark.queries import graph as G

    base = str(tmp_path / "cc")
    g, o, pr = encode_graph([[1, 2], [2], [3], []])
    BVGraphFiles(base).write(g, o, pr)
    import pyarrow as pa
    import pyarrow.parquet as pq

    twin = str(tmp_path / "cc.parquet")
    pq.write_table(
        pa.table({"src": [0, 1, 2, 3], "adj": [[1, 2], [2], [3], []]}), twin
    )
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_BASENAME", base)
    got = {
        r.node: (r.degree, r.triangles, r.coeff)
        for r in G.g19_clustering_coefficient(spark, "unused").collect()
    }
    # undirected degrees: 0:2, 1:2, 2:3, 3:1; one triangle (0,1,2)
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, round(2 * 1 / (3 * 2), 4))
    assert got[3] == (1, 0, 0.0)


def _tarjan(adj: dict) -> dict:
    """Exact SCC (iterative Tarjan) -> {node: min-id-of-its-scc}."""
    idx, low, onstk, stk, sccs, ctr = {}, {}, set(), [], [], [0]
    nodes = sorted(set(adj) | {d for ds in adj.values() for d in ds})
    for v0 in nodes:
        if v0 in idx:
            continue
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                idx[v] = low[v] = ctr[0]
                ctr[0] += 1
                stk.append(v)
                onstk.add(v)
            advanced = False
            for i in range(pi, len(adj.get(v, []))):
                w = adj[v][i]
                if w not in idx:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in onstk:
                    low[v] = min(low[v], idx[w])
            if advanced:
                continue
            if low[v] == idx[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                sccs.append(comp)
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return {n: min(c) for c in sccs for n in c}


def test_scc_matches_tarjan_on_random_graphs(spark):
    """Multi-pivot FW-BW peel == exact Tarjan on several random directed
    graphs (cycles, DAG parts, isolated-ish nodes all arise at p=0.08)."""
    import random

    from hadoopwebgraph_spark.queries.graph_algos import (
        strongly_connected_components,
    )

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = 24
        edges = [
            (u, v)
            for u in range(n)
            for v in range(n)
            if u != v and rng.random() < 0.08
        ]
        if not edges:
            continue
        adj = {}
        for u, v in edges:
            adj.setdefault(u, []).append(v)
        expect = _tarjan(adj)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["scc_id"]
            for r in strongly_connected_components(df).collect()
        }
        assert got == expect, f"seed {seed}"


def test_bowtie_hand_built(spark):
    """5 -> core(0,1,2 cycle) -> 3 -> 4, plus isolated pair 6 -> 7:
    IN={5}, CORE={0,1,2}, OUT={3,4}, OTHER={6,7}."""
    from hadoopwebgraph_spark.queries.graph_algos import bowtie_decomposition

    edges = [(0, 1), (1, 2), (2, 0), (5, 0), (2, 3), (3, 4), (6, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["cls"] for r in bowtie_decomposition(df).collect()}
    assert got == {
        0: "CORE",
        1: "CORE",
        2: "CORE",
        3: "OUT",
        4: "OUT",
        5: "IN",
        6: "OTHER",
        7: "OTHER",
    }


def test_condensation_is_dag_and_exact(spark):
    """Condensation of the hand-built bow-tie graph: core {0,1,2}
    contracts to 0; arcs 5->0, 0->3, 3->4, 6->7 survive distinct."""
    from hadoopwebgraph_spark.queries.graph_algos import condensation

    edges = [(0, 1), (1, 2), (2, 0), (5, 0), (2, 3), (3, 4), (6, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["src"], r["dst"]) for r in condensation(df).collect()}
    assert got == {(5, 0), (0, 3), (3, 4), (6, 7)}


def test_sample_neighbors_deterministic_and_bounded(spark):
    """Fanout bound respected, sample is a subset of the edge set,
    identical across repartitionings, and different salts differ."""
    import random

    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.queries.graph_algos import sample_neighbors

    rng = random.Random(3)
    edges = list({(rng.randrange(30), rng.randrange(200)) for _ in range(900)})
    df = spark.createDataFrame(edges, "src long, dst long")
    s1 = {(r["src"], r["dst"]) for r in sample_neighbors(df, 5).collect()}
    s2 = {
        (r["src"], r["dst"])
        for r in sample_neighbors(df.repartition(13, "dst"), 5).collect()
    }
    assert s1 == s2
    assert s1 <= set(edges)
    counts = (
        sample_neighbors(df, 5).groupBy("src").count().collect()
    )
    assert all(r["count"] <= 5 for r in counts)
    full = df.groupBy("src").count().collect()
    expect = {r["src"]: min(r["count"], 5) for r in full}
    assert {r["src"]: r["count"] for r in counts} == expect
    s3 = {(r["src"], r["dst"]) for r in sample_neighbors(df, 5, salt="hop1").collect()}
    assert s3 != s1


def test_random_walks_properties(spark):
    """Every step follows a real edge; walks stop at sinks; corpus is
    repartition-stable; different salts differ."""
    import random

    from hadoopwebgraph_spark.queries.graph_algos import random_walks

    rng = random.Random(11)
    edges = list({(rng.randrange(15), rng.randrange(15)) for _ in range(40)})
    edges = [(u, v) for u, v in edges if u != v]
    eset = set(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    out = random_walks(df, walks_per_node=2, length=5).collect()
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    nodes = {x for p in edges for x in p}
    assert len(out) == 2 * len(nodes)
    for r in out:
        seq = [int(x) for x in r["path"].split(",")]
        assert seq[0] == r["v"]
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in eset
        # stopped early only at a sink
        if len(seq) < 6:
            assert seq[-1] not in adj
    out2 = random_walks(df.repartition(7, "dst"), walks_per_node=2, length=5).collect()
    assert {(r["v"], r["k"], r["path"]) for r in out} == {
        (r["v"], r["k"], r["path"]) for r in out2
    }
    out3 = random_walks(df, walks_per_node=2, length=5, salt="other").collect()
    assert {(r["v"], r["k"], r["path"]) for r in out3} != {
        (r["v"], r["k"], r["path"]) for r in out
    }


def test_skipgram_pairs_exact(spark):
    """Hand-checked windowed pairs from two walks, offsets signed."""
    from hadoopwebgraph_spark.queries.graph_algos import skipgram_pairs

    walks = spark.createDataFrame(
        [(0, 0, "0,5,7"), (1, 0, "1")], "v long, k long, path string"
    )
    got = {
        (r["center"], r["context"], r["offset"])
        for r in skipgram_pairs(walks, window=2).collect()
    }
    want = {
        (0, 5, 1), (0, 7, 2),
        (5, 0, -1), (5, 7, 1),
        (7, 0, -2), (7, 5, -1),
    }
    assert got == want

    # exhaustive window-1 check on a length-4 walk
    walks2 = spark.createDataFrame([(9, 0, "9,8,7,6")], "v long, k long, path string")
    got2 = {
        (r["center"], r["context"], r["offset"])
        for r in skipgram_pairs(walks2, window=1).collect()
    }
    want2 = {(9, 8, 1), (8, 9, -1), (8, 7, 1), (7, 8, -1), (7, 6, 1), (6, 7, -1)}
    assert got2 == want2


def test_ktruss_fixpoint_within_round_budget(spark):
    """g37's fixed 4-round peel must BE the 3-truss: a 5th round changes
    nothing, and the result is non-trivial (some edges survive, some
    were peeled)."""
    from hadoopwebgraph_spark.queries.graph import edges_df
    from hadoopwebgraph_spark.queries.graph_algos import ktruss

    e = edges_df(spark)
    t4 = {(r.u, r.v): r.support for r in ktruss(e, k=3, rounds=4).collect()}
    t5 = {(r.u, r.v): r.support for r in ktruss(e, k=3, rounds=5).collect()}
    assert t4 == t5
    n_und = (
        e.selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v")
        .filter("u < v")
        .distinct()
        .count()
    )
    assert 0 < len(t4) < n_und
    # truss membership implies the support bound everywhere
    assert all(s >= 1 for s in t4.values())


def test_g43_mis_converges_and_invariants(spark):
    """The fixture must converge within the fixed rounds (no undecided
    rows), and the result must be a true MIS: independent (no edge joins
    two MIS nodes) and maximal (every non-MIS node has an MIS neighbor)."""
    from hadoopwebgraph_spark.queries.graph import graph_df
    from hadoopwebgraph_spark.queries.graph_algos import (
        g43_maximal_independent_set,
    )

    rows = g43_maximal_independent_set(spark, "unused").collect()
    status = {r.node: r.status for r in rows}
    assert 0 not in status.values()  # converged inside MIS_ROUNDS
    g = graph_df(spark).collect()
    sym = set()
    for r in g:
        for d in r.adj:
            if d != r.src:
                sym.add((r.src, d))
                sym.add((d, r.src))
    mis = {n for n, s in status.items() if s == 1}
    assert not any(u in mis and v in mis for u, v in sym)  # independence
    nbrs_in_mis = {u for u, v in sym if v in mis}
    non_mis = {n for n, s in status.items() if s == 2}
    assert non_mis <= nbrs_in_mis  # maximality: removed ⇒ MIS neighbor
    assert len(status) == len(g)  # every node classified exactly once


def test_g43_mis_equals_sequential_greedy(spark):
    """Structural determinism: with FIXED priorities, the synchronous
    parallel schedule must produce exactly the MIS the sequential greedy
    computes scanning nodes in ascending priority — the classic
    fixed-priority Luby equivalence. Checked on several random digraphs
    (rounds = n guarantees convergence: each round decides at least the
    globally minimal undecided node)."""
    import hashlib
    import random

    from hadoopwebgraph_spark.queries.graph_algos import (
        maximal_independent_set,
    )

    def prio(v: int) -> str:
        return hashlib.md5(f"mis-{v}".encode()).hexdigest()

    for seed in (1, 7, 42, 99):
        rng = random.Random(seed)
        n = rng.randint(6, 12)
        arcs = [
            (u, v)
            for u in range(n)
            for v in range(n)
            if u != v and rng.random() < 0.3
        ]
        sym = set(arcs) | {(v, u) for u, v in arcs}
        expected = set()
        for v in sorted(range(n), key=prio):
            if not any((v, u) in sym for u in expected):
                expected.add(v)
        nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
        edges = (
            spark.createDataFrame(arcs, "src long, dst long")
            if arcs
            else spark.createDataFrame([], "src long, dst long")
        )
        res = maximal_independent_set(nodes, edges, rounds=n).collect()
        got = {r.node for r in res if r.status == 1}
        assert got == expected, (seed, sorted(got), sorted(expected))
        assert {r.node for r in res} == set(range(n))
