"""Round-17 staged work: the q170 incremental theta-sketch gate
(STAGED for r18 — VERDICT r16 item #7's "theta-sketch snapshot family
lifted to a gate via file_fold"). The dry-run oracle pair,
carve-independence with per-batch k-truncation exercised, and the
empty-corpus edge rule."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

_TS = datetime.datetime


def _orders_df(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )


def _batch_readout(d):
    """The q160 pipeline over an orders-shaped DataFrame (no cache —
    test scale)."""
    from hadoopwebgraph_spark.functions.sketches import (
        _theta_setops_readout,
        _year_custkeys,
        theta_sketch,
    )

    sa = theta_sketch(_year_custkeys(d, 1995))
    sb = theta_sketch(_year_custkeys(d, 1996))
    return _theta_setops_readout(sa, sb)


def test_q170_staged_stream_theta_pair(spark, sf_small):
    """Dry-run oracle pair for the STAGED q170 gate: the theta set
    algebra answered from stream-folded sketches must hash-match q160's
    oracle VERBATIM (KMV k-truncation is a bounded join-semilattice, so
    the folded sketches equal the batch build's for any carve; the
    read-out shares q160's exact expressions)."""
    from hadoopwebgraph_spark.functions.sketches import (
        q170_stream_theta_setops,
    )
    from hadoopwebgraph_spark.registry import all_queries
    from tests.oracle_util import compare

    oracle = all_queries()["q160_theta_sketch_setops"].oracle
    compare(
        spark, sf_small, "q170_stream_theta_setops",
        q170_stream_theta_setops, oracle,
    )


def test_stream_theta_carve_independence_with_truncation(spark):
    """Any batch count yields the batch operator's exact five rows —
    on a corpus whose cohorts EXCEED K=64 distinct keys, so the
    per-batch k-truncation (the semilattice step) actually fires, the
    sketches are full, and the intersect/difference estimates run
    through the retained-sample path rather than the exact-count
    fallback."""
    from hadoopwebgraph_spark.functions.sketches import stream_theta_setops

    rows = []
    ok = 0
    # 1995 cohort: custkeys 0..199; 1996 cohort: 100..299 (overlap 100);
    # 1997 noise that must not contaminate either sketch. Duplicate
    # orders per custkey exercise the distinct.
    for ck in range(200):
        for rep in range(2 if ck % 7 == 0 else 1):
            rows.append((ok := ok + 1, ck, _TS(1995, 1 + ck % 12, 3)))
    for ck in range(100, 300):
        rows.append((ok := ok + 1, ck, _TS(1996, 1 + ck % 12, 9)))
    for ck in range(50):
        rows.append((ok := ok + 1, ck, _TS(1997, 2, 1)))
    d = _orders_df(spark, rows)
    want = sorted(map(tuple, _batch_readout(d).collect()))
    got2 = sorted(map(tuple, stream_theta_setops(d, 2).collect()))
    got5 = sorted(map(tuple, stream_theta_setops(d, 5).collect()))
    assert got2 == want and got5 == want
    ests = dict(want)
    # sketches are full -> estimated regime, and the overlap is visible
    assert ests["est_intersect"] > 0 and ests["est_a_minus_b"] > 0


def test_stream_theta_empty_corpus(spark):
    from hadoopwebgraph_spark.functions.sketches import stream_theta_setops

    d = _orders_df(spark, []).filter(F.lit(False))
    out = stream_theta_setops(d, 3)
    rows = {r["op"]: r["est"] for r in out.collect()}
    assert rows == {
        "est_a": 0, "est_b": 0, "est_union": 0,
        "est_intersect": 0, "est_a_minus_b": 0,
    }


def test_q170_not_registered_yet():
    from hadoopwebgraph_spark.registry import all_queries

    assert "q170_stream_theta_setops" not in all_queries()


# ---------------------------------------------------------------------------
# g48 streaming host-graph maintenance (STAGED r18 candidate)
# ---------------------------------------------------------------------------


def _edges_df(spark, rows):
    return spark.createDataFrame(rows, "src int, dst int")


def test_g48_staged_stream_host_graph_pair(spark, sf_small):
    """Dry-run oracle pair for the STAGED g48 gate: the host graph
    maintained over a real edge stream must hash-match g25's oracle
    VERBATIM (weights are additive over the arc-disjoint carve; the
    contraction shares g25's exact expressions)."""
    from hadoopwebgraph_spark.functions.ccstream import g48_stream_host_graph
    from hadoopwebgraph_spark.registry import all_queries
    from tests.oracle_util import compare

    oracle = all_queries()["g25_host_graph"].oracle
    compare(
        spark, sf_small, "g48_stream_host_graph",
        g48_stream_host_graph, oracle,
    )


def test_stream_host_graph_carve_independence(spark):
    """Any batch count yields the batch contraction's exact weighted
    host graph — arcs of one host pair scattered across batches must
    re-merge additively (hosts here are node div 50, so arcs from
    nodes 0..49 all hit host 0)."""
    from hadoopwebgraph_spark.functions.ccstream import stream_host_graph
    from hadoopwebgraph_spark.queries.graph import host_contract

    rows = []
    # host 0 -> host 1 from many distinct arcs, plus self-loop weight
    # (intra-host arcs), plus a sparse far pair
    for s in range(0, 40):
        rows.append((s, 50 + (s % 30)))   # host 0 -> 1
        rows.append((s, (s + 1) % 50))    # host 0 -> 0 self-loop weight
    rows += [(250, 307), (251, 308), (990, 12)]
    d = _edges_df(spark, rows)
    want = sorted(map(tuple, host_contract(d).collect()))
    got2 = sorted(map(tuple, stream_host_graph(d, 2).collect()))
    got5 = sorted(map(tuple, stream_host_graph(d, 5).collect()))
    assert got2 == want and got5 == want
    w = {(a, b): c for a, b, c in want}
    assert w[(0, 1)] == 40 and w[(0, 0)] == 40 and w[(19, 0)] == 1


def test_stream_host_graph_empty(spark):
    from hadoopwebgraph_spark.functions.ccstream import stream_host_graph

    d = _edges_df(spark, []).filter(F.lit(False))
    out = stream_host_graph(d, 3)
    assert out.columns == ["host_src", "host_dst", "weight"]
    assert out.count() == 0


def test_g48_not_registered_yet():
    from hadoopwebgraph_spark.registry import all_queries

    assert "g48_stream_host_graph" not in all_queries()
