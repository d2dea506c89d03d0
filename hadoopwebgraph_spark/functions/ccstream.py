"""Incremental graph operators over edge streams: weakly-connected
components under edge additions (g47, STAGED r16) and host-graph
aggregate maintenance (g48, STAGED r17 — see its section at the end).
The rest of this docstring describes g47.

The batch operator (queries/graph_algos.py::connected_components,
g12) computes the min-label fixpoint: component(v) = min node id
reachable from v over the undirected edge closure. The incremental
form exploits a property the ANF delta could not: **the label table is
a COMPLETE connectivity summary** — two nodes are connected in the old
graph iff their labels are equal — so a new batch never needs the old
edges at all. State is the labels alone (one row per node, no
accumulated edge set), and a batch folds in three steps:

1. look up the two endpoint labels of every new edge (two joins),
   keeping only pairs with ``c_src != c_dst`` — the QUOTIENT graph on
   affected old components, bounded by the batch size and typically a
   vanishing fraction of it (most batch edges land inside one
   component);
2. solve connectivity on the quotient: below ``_QUOTIENT_CAP`` rows a
   driver-side union-find (min-id representative — the same
   limit-capped-collect pattern as the q164/q165 filter builds; the
   quotient of a micro-batch is component PAIRS, not edges, so even a
   huge batch usually contracts to a tiny quotient), above it the
   tuned distributed operator on the quotient edges — both exact;
3. relabel: one broadcast join of the (old component -> new root)
   mapping against the label table; untouched labels pass through a
   coalesce, never a re-aggregation or an iteration.

Exactness (what makes the staged gate hash-oracleable by the SAME
recursive-CTE oracle shape as g12): labels_old maps every node to the
min node id of its old component; the union graph's components are
exactly the merges the quotient connectivity describes; min-id
representatives compose (min over a merged class of min-per-class =
min over the class), so the relabeled table IS the union graph's
min-label fixpoint — which is unique, hence identical for ANY carve of
the edges into micro-batches, including however Spark's file source
groups them.

Scale shape (the 100 TB property): per batch the big table is touched
by exactly two endpoint-label joins (hash joins on node id — at scale
keep labels bucketed by node so they co-locate) and one relabel join
(broadcast below the quotient cap, a plain shuffled join on the
distributed branch); there is NO per-batch iteration over the graph,
NO accumulated edge state, and the only data-dependent loop runs on
the contracted quotient. Like the q167 index fold, the LOCAL gate's
eager localCheckpoint still MATERIALIZES the full label table per
batch (an O(|labels|) sequential rewrite, even for a no-op batch) —
a gate artifact, not the design: at scale the relabel writes as a
partitioned state-table MERGE touching only the merged components'
partitions, which is exactly what the old-component -> root mapping
shape enables. An earlier draft used a worklist flood from the batch
endpoints instead (the anf_delta_update shape); it was exact but
O(merged-region diameter) iterations per batch — the quotient
formulation replaces the flood outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# above this many quotient rows the merge runs distributed; below it a
# driver-side union-find (exact either way — the cap only picks the
# engine). Quotient rows are DISTINCT (old-component, old-component)
# pairs, already contracted.
_QUOTIENT_CAP = 1_000_000


def _norm(edges: DataFrame) -> DataFrame:
    """Cast + self-loop filter WITHOUT a distinct: cc_delta_update
    tolerates replayed edges (no-ops through the quotient), and a
    per-batch dedup shuffle is cost for nothing. The distinct variant
    is anf._norm_edges — cc_streaming_sizes reuses it (review r16)."""
    return (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def _union_find_min(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Min-id union-find over component-id pairs: returns the mapping
    old-id -> min id of its merged class, for ids whose class merged."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo
    return {c: r for c in parent if (r := find(c)) != c}


def cc_delta_update(
    labels_old: DataFrame, new_edges: DataFrame
) -> DataFrame:
    """Exact incremental min-label CC update: given the fixpoint labels
    of the old graph and a batch of new edges, return the fixpoint
    labels of the union graph. Needs NO old edges — see the module
    docstring. Returns DataFrame[node, component]."""
    spark = labels_old.sparkSession
    e = _norm(new_edges).localCheckpoint(eager=True)
    nodes_new = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    fresh = nodes_new.join(labels_old.select("node"), "node", "left_anti")
    labels = (
        labels_old.union(fresh.select("node", F.col("node").alias("component")))
        .localCheckpoint(eager=True)
    )
    # quotient graph: old-component pairs the batch actually connects
    lu = labels.select(
        F.col("node").alias("src"), F.col("component").alias("c_src")
    )
    lv = labels.select(
        F.col("node").alias("dst"), F.col("component").alias("c_dst")
    )
    qedges = (
        e.join(lu, "src")
        .join(lv, "dst")
        .filter(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # limit-capped collect: at most CAP+1 rows ever reach the driver —
    # the +1 only detects overflow, which reroutes to the distributed
    # path below (the q164/q165 filter-build discipline)
    head = qedges.limit(_QUOTIENT_CAP + 1).collect()
    if not head:
        return labels  # batch merges nothing: labels pass through
    if len(head) <= _QUOTIENT_CAP:
        mapping = _union_find_min([(r.src, r.dst) for r in head])
        map_df = F.broadcast(
            spark.createDataFrame(
                list(mapping.items()), "old_comp long, root long"
            )
        )
    else:
        # quotient too large for the driver: the tuned distributed
        # operator solves it exactly (its labels ARE min ids)
        from ..queries.graph_algos import connected_components

        map_df = (
            connected_components(qedges)
            .filter(F.col("component") != F.col("node"))
            .select(
                F.col("node").alias("old_comp"),
                F.col("component").alias("root"),
            )
        )
    return (
        labels.join(map_df, labels.component == F.col("old_comp"), "left")
        .select(
            "node",
            F.coalesce(F.col("root"), F.col("component")).alias("component"),
        )
        .localCheckpoint(eager=True)
    )


def _cc_fold_batch(state: dict, batch: DataFrame) -> None:
    """Per-micro-batch fold body (the _fold_batch shape). The first
    batch is NOT special: from an empty label table every batch node is
    fresh, the quotient is the batch's own contracted edges, and the
    union-find seeds the whole thing — no separate full-build path to
    drift from the delta (and none of the batch operator's per-
    iteration stage floors)."""
    if "labels" not in state:
        spark = batch.sparkSession
        state["labels"] = spark.createDataFrame(
            [], "node long, component long"
        )
    state["labels"] = cc_delta_update(state["labels"], batch)


def cc_over_batches(batches: list[DataFrame]) -> DataFrame:
    """Fold :func:`cc_delta_update` over edge batches; returns the union
    graph's labels, row-identical to connected_components over the
    concatenated edges (pinned in tests/test_round16_ops.py)."""
    if not batches:
        raise ValueError("cc_over_batches needs at least one batch")
    state: dict = {}
    for b in batches:
        _cc_fold_batch(state, b)
    return state["labels"]


def cc_streaming_sizes(
    edges: DataFrame, n_batches: int = 3, work_dir: str | None = None
) -> DataFrame:
    """g12's component-size histogram computed by DRIVING a file-source
    foreachBatch stream over a carve of ``edges`` (the g45 gate shape;
    machinery in streaming/file_fold.py). Returns
    DataFrame[size, n_components]."""
    from ..streaming.file_fold import drive_file_stream_fold
    from .anf import _norm_edges

    e = _norm_edges(edges).localCheckpoint(eager=True)
    state = drive_file_stream_fold(
        e, "src long, dst long", ["src", "dst"], n_batches,
        _cc_fold_batch, work_dir,
    )
    if "labels" not in state:
        # empty edge set: no files staged, no micro-batch fires — the
        # batch twin's histogram over no edges is empty (the g45 empty
        # rule; reachable only on empty input, file_fold raises
        # otherwise)
        labels = e.select(
            F.col("src").alias("node"), F.col("src").alias("component")
        )
    else:
        labels = state["labels"]
    return (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
    )


# ---------------------------------------------------------------------------
# STAGED gate (round 17 candidate): g12's histogram through the
# streaming fold, on the same <400-node fixture subgraph the ANF gates
# use (budget discipline; the full 2k-node fixture is the batch gate
# g12's job). Cost at sf0.01 on a vanilla driver-style session: ~9s
# warm / ~27s cold (three quotient folds at ~1.5s each + ~3s
# carve/stream overhead + the bvgraph decode; cold adds JVM/codegen
# warm-up the driver window amortizes). The earlier worklist draft
# measured 15-20s warm / 44s cold — the quotient rewrite removed the
# per-batch iteration entirely.
# ---------------------------------------------------------------------------

_G47_CAP = 400
_G47_BATCHES = 3


def _g47_oracle() -> str:
    from ..queries.graph import _T

    return f"""
    WITH RECURSIVE e0 AS (SELECT src, unnest(adj) AS dst FROM {_T}),
    e AS (SELECT DISTINCT src, dst FROM e0
          WHERE src < {_G47_CAP} AND dst < {_G47_CAP} AND src <> dst),
    sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    reach(node, r) AS (
        SELECT src AS node, src AS r FROM (SELECT DISTINCT src FROM sym)
        UNION
        SELECT re.node, s.dst FROM reach re JOIN sym s ON s.src = re.r
    ),
    comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
    SELECT size, count(*) AS n_components FROM (
        SELECT component, count(*) AS size FROM comp GROUP BY component
    ) GROUP BY size
    """


def g47_stream_connected_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..queries.graph import edges_df

    e = edges_df(spark).filter(
        (F.col("src") < _G47_CAP) & (F.col("dst") < _G47_CAP)
    )
    return cc_streaming_sizes(e, _G47_BATCHES)


# ---------------------------------------------------------------------------
# STAGED for round 18+ (r17; VERDICT r16 item #7's second direction):
# g48 — g25's host-graph contraction maintained INCREMENTALLY over an
# edge stream. This is incremental MATERIALIZED-VIEW maintenance of a
# quotient aggregate — the simplest state merge in the whole family
# (pure addition), included precisely because it is the everyday
# production shape: a crawl streams in, the site-level link graph
# stays current without ever re-contracting old arcs.
#
# Rebuild identity (what makes g25's oracle certify this VERBATIM):
# weight(host_src, host_dst) = count of arcs mapping to the pair, and
# counts are additive over ANY arc-disjoint carve — the (src, dst)
# carve trivially is one. No entity-completeness requirement at all,
# unlike the doc_id carves. The contraction expressions are shared
# with g25 (queries/graph.py::host_contract) so the twin cannot drift.
#
# Scale: per batch the only work is the batch's own contraction
# (map-side combine collapses duplicate host pairs before the shuffle)
# plus a merge whose width is the TOUCHED host pairs — at 1000
# executors the state lives as a table bucketed by (host_src,
# host_dst) and the merge is a partitioned MERGE touching only those
# buckets; the local gate's full-state localCheckpoint is the
# documented local artifact (SCALE.md "Incremental operators").
# ---------------------------------------------------------------------------

_G48_BATCHES = 3


def _host_fold_batch(state: dict, batch: DataFrame) -> None:
    """One maintenance step: contract the batch's arcs and ADD into the
    accumulated host-pair weights."""
    from ..queries.graph import host_contract

    hw_b = host_contract(batch)
    if "hw" not in state:
        state["hw"] = hw_b.localCheckpoint(eager=True)
    else:
        state["hw"] = (
            state["hw"]
            .union(hw_b)
            .groupBy("host_src", "host_dst")
            .agg(F.sum("weight").cast("long").alias("weight"))
            .localCheckpoint(eager=True)
        )


def stream_host_graph(
    edges: DataFrame, n_batches: int = _G48_BATCHES,
    work_dir: str | None = None,
) -> DataFrame:
    """g25's weighted host graph computed by DRIVING a file-source
    foreachBatch stream over a (src, dst) carve of ``edges`` (machinery
    in streaming/file_fold.py). Row-identical to the batch contraction
    for ANY carve — counts are additive over arc-disjoint batches."""
    from ..queries.graph import host_contract
    from ..streaming.file_fold import drive_file_stream_fold

    d = edges.select(
        F.col("src").cast("int").alias("src"),
        F.col("dst").cast("int").alias("dst"),
    ).localCheckpoint(eager=True)
    state = drive_file_stream_fold(
        d, "src int, dst int", ["src", "dst"], n_batches,
        _host_fold_batch, work_dir,
    )
    if "hw" not in state:
        # empty graph (the g45 empty rule; reachable only on empty
        # input, file_fold raises otherwise): the batch contraction of
        # the empty checkpointed input is the correctly-shaped 0-row
        # result
        return host_contract(d)
    return state["hw"]


def g48_stream_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.graph import edges_df

    return stream_host_graph(edges_df(spark))
