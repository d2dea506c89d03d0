"""Iterative graph algorithms over the BVGraph source — the GraphX
hand-off the reference documents (README.md:32-48) re-expressed as
checkpointed DataFrame join loops (no GraphX/GraphFrames dependency).

Scale notes: each iteration is one shuffle-join of ranks/labels against
the (static) edge table. The edge side should be loaded once and
persisted partitioned by the join key so every iteration reuses the same
partitioning; localCheckpoint truncates the growing lineage so plan
compilation stays O(1) per iteration. Convergence loops are driver-side
WHILE over distributed steps — no per-row driver work.

Registered as rows-only checks (iterative fixpoints aren't expressible as
one oracle SQL statement); exactness is certified by tests against
hand-computed fixtures (tests/test_graph_algos.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graph import edges_df, graph_df


def pagerank(
    edges: DataFrame,
    n_nodes: int | None = None,
    damping: float = 0.85,
    iterations: int = 10,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """PageRank with dangling-mass redistribution.

    edges: DataFrame[src, dst]. nodes: optional DataFrame[node] giving the
    full vertex set — pass the graph source's node column so fully
    isolated nodes (outdeg 0, no in-edges — representable in BVGraph) get
    rank rows too; without it the node set is derived from edges only.
    Returns DataFrame[node, rank] with sum(rank) == n (the conventional
    n-normalized form).
    """
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    nodes = nodes.persist()
    n = n_nodes if n_nodes is not None else nodes.count()

    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # static join side: contribution edges with 1/outdeg weight
    contrib_edges = edges.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    ).persist()

    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        contribs = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.node)
            .select("dst", (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        # dangling nodes (no out-edges) leak rank; redistribute uniformly —
        # the dangling mass stays a broadcast 1-row aggregate inside the
        # plan (no driver-side collect in the loop)
        dangling = ranks.join(outdeg, ranks.node == outdeg.src, "left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (
                        F.col("_dangling") / F.lit(float(n))
                        + F.coalesce(F.col("in_sum"), F.lit(0.0))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()  # truncate lineage each iteration
        )
    nodes.unpersist()
    contrib_edges.unpersist()
    return ranks


def connected_components(
    edges: DataFrame, max_iterations: int = 50, check_every: int = 2
) -> DataFrame:
    """Weakly-connected components by min-label propagation with pointer
    jumping: each node adopts the smallest label in its closed undirected
    neighborhood, then labels are compressed one pointer hop
    (label <- label-of-label) per iteration, giving O(log d) convergence on
    a path of diameter d instead of O(d) for plain propagation.

    Convergence is checked every ``check_every`` iterations (each check is
    a driver action; propagation itself stays fully distributed). Raises
    RuntimeError if the iteration cap is hit before fixpoint — silently
    returning half-merged components would poison downstream dedup
    clustering (q66).

    Returns DataFrame[node, component] (component = min node id in it).
    """
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
    )
    converged = False
    for it in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        propagated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()  # feeds both sides of the jump join below
        )
        # pointer jumping: component ids are node ids, so one self-join
        # rewrites each label to its label's label (path halving)
        lhs = propagated.alias("l")
        rhs = propagated.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        ).alias("r")
        new_labels = (
            lhs.join(rhs, F.col("l.component") == F.col("r.c_node"))
            .select("node", F.col("c_comp").alias("component"))
            .localCheckpoint()
        )
        do_check = (it + 1) % check_every == 0 or it == max_iterations - 1
        if do_check:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        else:
            labels = new_labels
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; raise max_iterations"
        )
    return labels


@register(
    "g11_pagerank",
    oracle=None,  # iterative fixpoint; certified by unit tests instead
    doc="PageRank (10 iterations, damping 0.85, dangling redistribution) "
    "as a checkpointed DataFrame join loop; top-20 nodes by rank.",
)
def g11_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = edges_df(spark)
    # node set from the source (enumerates all 0..n-1), not from edges —
    # isolated nodes get their (1 - damping) base rank row
    nodes = graph_df(spark).select(F.col("src").alias("node"))
    pr = pagerank(e, iterations=10, nodes=nodes)
    return (
        pr.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node"))
        .limit(20)
    )


@register(
    "g12_connected_components",
    oracle=None,  # iterative fixpoint; certified by unit tests instead
    doc="Weakly-connected components via min-label propagation; component "
    "size histogram.",
)
def g12_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = edges_df(spark)
    cc = connected_components(e)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
    )
