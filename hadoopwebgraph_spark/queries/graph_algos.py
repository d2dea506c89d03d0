"""Iterative graph algorithms over the BVGraph source — the GraphX
hand-off the reference documents (README.md:32-48) re-expressed as
checkpointed DataFrame join loops (no GraphX/GraphFrames dependency).

Scale notes: each iteration is one shuffle-join of ranks/labels against
the (static) edge table. The edge side should be loaded once and
persisted partitioned by the join key so every iteration reuses the same
partitioning; localCheckpoint truncates the growing lineage so plan
compilation stays O(1) per iteration. Convergence loops are driver-side
WHILE over distributed steps — no per-row driver work.

All three algorithms are oracle-checked despite being iterative: g11
PageRank against a 10-iteration unrolled-CTE fixpoint, g12 connected
components against a recursive-CTE reachability fixpoint, g15 label
propagation against an unrolled-CTE mode computation (integer-only, so
parity is exact). Exactness is additionally certified by tests against
hand-computed fixtures (tests/test_graph_algos.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graph import _T, edges_df, graph_df


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

    # persisted: the dangling anti-join touches it EVERY iteration — left
    # unpersisted it re-derives from edges (re-decoding a graph source)
    # once per iteration
    outdeg = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    )
    # static join side: contribution edges carrying the outdegree; the
    # contribution is rank/outdeg (single correctly-rounded division, so
    # a SQL oracle computing p.rank / o.outdeg matches term-for-term).
    # Hash-partitioned on src BEFORE persisting: the per-iteration join
    # requires hashpartitioning(src), so the cached partitioning is
    # reused and only the small ranks side shuffles each round. The
    # partition count is pinned explicitly — an unnumbered repartition
    # lets AQE coalesce the cached side into a few big partitions, which
    # would throttle every iteration's parallelism.
    nshuf = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    contrib_edges = (
        edges.join(outdeg, "src")
        .select("src", "dst", F.col("outdeg").cast("double").alias("od"))
        .repartition(nshuf, "src")
        .persist()
    )

    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        contribs = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("od")).alias("c"))
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
    outdeg.unpersist()
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
    # hash-partitioned on dst before persisting: the per-iteration join
    # is on sym.dst, so the big static side's cached partitioning is
    # reused every round — only the labels side shuffles. Count pinned
    # explicitly so AQE can't coalesce the cached side (see pagerank).
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(
            int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions")), "dst"
        )
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


def _pagerank_oracle_sql(twin: str, iterations: int = 10, damping: float = 0.85) -> str:
    """DuckDB oracle for g11: the Lloyd-style driver loop unrolled into
    one CTE block per iteration (SQL forbids aggregates over the
    recursive member of WITH RECURSIVE, so unrolling is the portable
    fixpoint encoding). Constants are emitted as Python float reprs so
    both engines compute with bit-identical doubles (1.0 - 0.85 !=
    literal 0.15 in binary); contributions are single divisions
    (p.rank / od) matching the Spark side term-for-term."""
    base = repr(1.0 - damping)
    d = repr(damping)
    blocks = [
        f"""
    e AS (SELECT src, unnest(adj) AS dst FROM {twin}),
    nodes AS (SELECT src AS node FROM {twin}),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY src),
    pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        blocks.append(
            f"""
    d{i} AS (SELECT coalesce(sum(p.rank), 0.0) AS dm FROM pr{i - 1} p
             WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = p.node)),
    s{i} AS (SELECT e.dst, sum(p.rank / o.od) AS in_sum
             FROM e JOIN pr{i - 1} p ON e.src = p.node
             JOIN outdeg o ON o.src = e.src
             GROUP BY e.dst),
    pr{i} AS (SELECT n.node,
                     {base} + {d} * (d{i}.dm / nn.n
                                     + coalesce(s{i}.in_sum, 0.0)) AS rank
              FROM nodes n CROSS JOIN d{i} CROSS JOIN nn
              LEFT JOIN s{i} ON s{i}.dst = n.node)"""
        )
    return (
        "WITH" + ",".join(blocks) + f"""
    SELECT node, round(rank, 6) AS rank FROM pr{iterations}
    ORDER BY round(rank, 6) DESC, node LIMIT 20
    """
    )


@register(
    "g11_pagerank",
    oracle=_pagerank_oracle_sql(_T),
    doc="PageRank (10 iterations, damping 0.85, dangling redistribution) "
    "as a checkpointed DataFrame join loop; top-20 nodes by rank. Oracle "
    "= the same fixpoint unrolled into 10 CTE blocks over the parquet "
    "twin (upgraded from a rows-only check).",
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
    oracle=f"""
    WITH RECURSIVE e AS (SELECT src, unnest(adj) AS dst FROM {_T}),
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
    """,
    doc="Weakly-connected components via min-label propagation with "
    "pointer jumping; component size histogram. Oracle = recursive-CTE "
    "reachability fixpoint (component := min reachable node), upgraded "
    "from a rows-only check.",
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


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    simultaneously adopts the most frequent label among its undirected
    neighbors, ties to the smallest label; isolated-in-round nodes keep
    their label. Deterministic (integer counts + total tie order), so the
    fixed-iteration run is exactly oracle-able, unlike the usual
    async/randomized LPA.

    Per iteration: one join + count + partially-aggregable max_by (the
    argmax shuffles one row per node). Returns DataFrame[node, label].
    """
    # hash-partitioned on dst before persisting: the per-iteration join
    # is on sym.dst, so the big static side's cached partitioning is
    # reused every round — only the labels side shuffles. Count pinned
    # explicitly so AQE can't coalesce the cached side (see pagerank).
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition(
            int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions")), "dst"
        )
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(iterations):
        counted = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        mode = (
            counted.groupBy("src")
            .agg(
                F.max_by(
                    "label",
                    F.struct(F.col("cnt"), (-F.col("label")).alias("nl")),
                ).alias("new_label")
            )
        )
        labels = (
            labels.join(mode, labels.node == mode.src, "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
    sym.unpersist()
    return labels


def _lpa_oracle_sql(twin: str, iterations: int = 3) -> str:
    """Unrolled-CTE oracle for g15: integer-only mode computation, so
    parity is exact (no float drift across engines)."""
    blocks = [
        f"""
    e AS (SELECT src, unnest(adj) AS dst FROM {twin}),
    sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym)"""
    ]
    for i in range(1, iterations + 1):
        blocks.append(
            f"""
    c{i} AS (SELECT s.src, l.label, count(*) AS cnt
             FROM sym s JOIN l{i - 1} l ON l.node = s.dst
             GROUP BY s.src, l.label),
    m{i} AS (SELECT src, label AS new_label FROM (
                 SELECT src, label,
                        row_number() OVER (PARTITION BY src
                                           ORDER BY cnt DESC, label) AS rn
                 FROM c{i}) WHERE rn = 1),
    l{i} AS (SELECT l.node, coalesce(m.new_label, l.label) AS label
             FROM l{i - 1} l LEFT JOIN m{i} m ON m.src = l.node)"""
        )
    return (
        "WITH" + ",".join(blocks)
        + f" SELECT node, label FROM l{iterations}"
    )


@register(
    "g15_label_propagation",
    oracle=_lpa_oracle_sql(_T),
    doc="Synchronous label-propagation community detection (3 rounds, "
    "most-frequent neighbor label, smallest-label ties) — deterministic "
    "integer-only LPA, oracle-checked exactly against the unrolled-CTE "
    "fixpoint per node.",
)
def g15_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = edges_df(spark)
    return label_propagation(e, iterations=3)
