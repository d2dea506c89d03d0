"""Bottom-k (KMV) approximate neighborhood function with an EXACT
incremental update under edge additions — staged in round 14 for the
round-15 registration window (the r14 window had exactly 2 slots, both
spent on q163/q164; see VERDICT r13 #9).

Streaming HyperANF was parked twice (NOTES r13 design note) because the
two obvious implementations are wrong: (a) warm-starting the hop loop
from the previous graph's sketches mixes path ages and does not compute
the new graph's N(t); (b) change detection by HLL sketch BYTE equality
is unsound — Spark/DataSketches HLL serialization is non-canonical
(sparse/set/dense modes depend on build path), so equal register
contents can serialize differently. The note's soundness condition was
an EXPLICIT sketch representation. This module satisfies it with
bottom-k sketches stored as plain rows:

- A ball sketch is the ``k`` smallest distinct member hashes, stored as
  ``(node, h)`` rows — the representation IS canonical (values, not
  bytes), so per-node change detection is an exact row anti-join.
- ``truncate_k(A ∪ B)`` is a join-semilattice: idempotent, commutative,
  associative, and MONOTONE under additions. The per-level recurrence
  S_t(v) = ⊔ over u in in(v)∪{v} of S_{t-1}(u) therefore admits exact
  delta propagation when edges are only ever ADDED (the design note's
  monotonicity argument, re-proved for truncation in
  :func:`anf_delta_update`'s docstring).
- The estimator is the repo's established exact-integer theta/KMV math
  (functions/sketches.py, q160): hashes are the md5 40-bit discipline,
  estimates are ``(k-1) * 2^40 div kth`` — bit-identical in DuckDB, so
  the future registered gate is fully hash-oracled (the HLL-based
  g26/g27 gates need the sparse-exact-regime restriction instead; this
  estimator is exact-integer at EVERY regime, and exactly |ball| when
  |ball| < k).

Scale shape: one hop is one edge join + one per-node top-k; sketches
are <= k narrow longs per node (vs 2^lg_k registers for HLL — bottom-k
trades bytes for exactness-below-k and integer algebra). The delta
update touches only new edges, changed nodes' sketches, and old edges
whose source changed — the whole point at 100 TB, where re-running the
full hop loop per micro-batch re-shuffles every sketch ever built.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register

K_DEFAULT = 64
_SCALE = 1 << 40  # md5 40-bit hash space, the q160 theta discipline


class AnfLevels(list):
    """Sketch levels ``[S_0 .. S_T]`` carrying the ``k`` they were built
    with. k is a structural parameter of the sketches, not a free query
    knob: propagating or reading levels at a different k silently
    truncates at the wrong bound and produces WRONG (not merely less
    precise) levels and estimates (ADVICE r14) — so every consumer
    validates its k argument against this attribute."""

    def __init__(self, levels, k: int):
        super().__init__(levels)
        self.k = int(k)

    def __getitem__(self, item):
        # slices keep the stamp (plain list slicing would strip the
        # subclass and silently bypass _check_k — review r15); scalar
        # indexing returns the DataFrame as usual
        out = super().__getitem__(item)
        return AnfLevels(out, self.k) if isinstance(item, slice) else out


def _check_k(levels, k: int, where: str) -> None:
    """Best-effort: a plain list (no ``k`` attribute) passes unchecked —
    the guard protects the in-repo paths, which always carry AnfLevels
    (and slices preserve the stamp); hand-built level lists are the
    caller's contract."""
    lk = getattr(levels, "k", None)
    if lk is not None and lk != k:
        raise ValueError(
            f"{where}: levels were built with k={lk}, got k={k} — a "
            "mismatched truncation bound produces wrong levels, not a "
            "coarser approximation"
        )


def node_hash(col: Column) -> Column:
    """The member hash: first 40 md5 bits of 'anf-<node>' plus one, as
    a bigint in [1, 2^40] (the +1 keeps the kth-smallest divisor
    nonzero; both engines apply it identically)."""
    hx = F.substring(
        F.md5(F.concat(F.lit("anf-"), col.cast("string"))), 1, 10
    )
    return (F.conv(hx, 16, 10).cast("long") + F.lit(1)).alias("h")


def _hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`node_hash` (the q160 mirror pattern)."""
    return (
        f"CAST('0x' || substr(md5('anf-' || CAST({expr} AS VARCHAR)), 1, 10)"
        " AS BIGINT) + 1"
    )


def _norm_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _nodes_of(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )


def seed_sketches(nodes: DataFrame) -> DataFrame:
    """S_0: every node's ball is {itself} — one (node, h) row each."""
    return nodes.select("node", node_hash(F.col("node")))


def _topk(contrib: DataFrame, k: int) -> DataFrame:
    """truncate_k: the k smallest distinct hashes per node. Per-node
    window partitions (the q20 rank class — bounded by ball size, never
    corpus-wide)."""
    w = W.partitionBy("node").orderBy("h")
    return (
        contrib.distinct()
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


def _gather(sketches: DataFrame, edges: DataFrame) -> DataFrame:
    """Flow sketch rows along edges: contributions of S(u) to each v
    with u -> v."""
    return edges.join(
        sketches.withColumnRenamed("node", "src"), "src"
    ).select(F.col("dst").alias("node"), "h")


def ball_sketches(
    edges: DataFrame, hops: int, k: int = K_DEFAULT
) -> AnfLevels:
    """Batch build: [S_0 .. S_hops], each level checkpointed (levels are
    consumed twice — by the next hop and by the curve read-out — and
    the hop loop is the repo's standard lineage-truncated iteration)."""
    e = _norm_edges(edges)
    levels = [seed_sketches(_nodes_of(e)).localCheckpoint(eager=True)]
    for _ in range(hops):
        prev = levels[-1]
        # S_t(v) = truncate_k(S_{t-1}(v) ∪ ⊔_{u->v} S_{t-1}(u))
        contrib = prev.select("node", "h").union(_gather(prev, e))
        levels.append(_topk(contrib, k).localCheckpoint(eager=True))
    return AnfLevels(levels, k)


def anf_curve_from_levels(
    levels: list[DataFrame], k: int = K_DEFAULT
) -> DataFrame:
    """(t, n_scaled): the neighborhood function N(t) = sum over nodes of
    the ball-size estimate — EXACTLY |ball| while |ball| < k, else the
    exact-integer KMV estimate (k-1)*2^40 div kth-smallest-hash. All
    arithmetic is int64 on both engines (no float ties by
    construction)."""
    _check_k(levels, k, "anf_curve_from_levels")
    outs = []
    for t, s in enumerate(levels):
        per_node = s.groupBy("node").agg(
            F.count(F.lit(1)).alias("cnt"), F.max("h").alias("kth")
        )
        est = F.when(F.col("cnt") < k, F.col("cnt")).otherwise(
            F.expr(f"({k} - 1) * {_SCALE} div kth")
        )
        outs.append(
            per_node.agg(
                F.lit(t).cast("long").alias("t"),
                F.coalesce(F.sum(est), F.lit(0)).cast("long").alias(
                    "n_scaled"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def anf_curve(
    edges: DataFrame, hops: int, k: int = K_DEFAULT
) -> DataFrame:
    """Batch ANF: build the ball sketches and read the curve."""
    return anf_curve_from_levels(ball_sketches(edges, hops, k), k)


def harmonic_from_levels(
    levels: list[DataFrame], k: int = K_DEFAULT
) -> DataFrame:
    """(node, h_scaled): truncated harmonic in-centrality off the SAME
    ball-sketch levels the ANF curve reads — H(v) = Σ_{u≠v} 1/d(u,v)
    over distances ≤ T, estimated per node as Σ_t (est_t − est_{t−1})/t
    (Boldi–Vigna's HyperBall centrality read-out, on bottom-k sketches).

    Integer-exact on both engines: the per-level estimates are the
    exact-integer KMV values (exactly |ball| below k), the level
    differences are NON-NEGATIVE because the balls are nested and the
    KMV estimate is monotone in the set (kth-smallest hash can only
    shrink as the ball grows), and 1/t is cleared by scaling every term
    with lcm(1..T) — ``h_scaled = Σ_t (est_t − est_{t−1}) · lcm/t``,
    all int64. Unlike the HLL-based g26 read-out (hash-exact only in
    the sparse-exact regime), this is hash-oracleable at EVERY sketch
    regime.

    Plan shape: one groupBy per (node, t) over the tagged level union
    (bounded by nodes × levels — every node carries its own hash at
    every level, so the table is dense), then one per-node window for
    the consecutive-level differences. No corpus-wide sort, no
    SinglePartition above partial aggregates."""
    import math

    _check_k(levels, k, "harmonic_from_levels")
    hops = len(levels) - 1
    if hops < 1:
        raise ValueError("harmonic_from_levels needs at least one hop")
    lcm = math.lcm(*range(1, hops + 1))
    tagged = None
    for t, s in enumerate(levels):
        cur = s.select(F.lit(t).cast("int").alias("t"), "node", "h")
        tagged = cur if tagged is None else tagged.union(cur)
    per = tagged.groupBy("node", "t").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("kth")
    )
    est = F.when(F.col("cnt") < k, F.col("cnt")).otherwise(
        F.expr(f"({k} - 1) * {_SCALE} div kth")
    )
    w = W.partitionBy("node").orderBy("t")
    diffs = (
        per.select("node", "t", est.cast("long").alias("e"))
        .withColumn("de", F.col("e") - F.lag("e").over(w))
        .filter(F.col("t") >= 1)
    )
    # integer weight: every t in 1..hops divides lcm(1..hops) exactly
    return diffs.groupBy("node").agg(
        F.sum(F.col("de") * F.expr(f"{lcm} div t"))
        .cast("long")
        .alias("h_scaled")
    )


def anf_delta_update(
    levels_old: list[DataFrame],
    old_edges: DataFrame,
    new_edges: DataFrame,
    k: int = K_DEFAULT,
) -> AnfLevels:
    """Exact incremental update of [S_0 .. S_T] after adding
    ``new_edges`` to ``old_edges``: returns the levels of the UNION
    graph without re-running the full hop loop.

    Per level t (changed_0 = nodes first seen in this batch)::

        cand_t(v) = S_t_old(v)
                    ∪ ⊔ over u->v in NEW edges      of S_{t-1}_new(u)
                    ∪ ⊔ over u->v in OLD edges,
                        u in changed_{t-1}           of S_{t-1}_new(u)
                    ∪ (S_{t-1}_new(v) if v in changed_{t-1})
        S_t_new(v) = truncate_k(cand_t(v))
        changed_t  = nodes with a row in S_t_new \\ S_t_old

    Exactness under truncation (the subtle part): let target =
    truncate_k of the full new-state union. Take x in target, flowing
    from source u. If the edge is new, or u changed at t-1, x is in
    cand. Otherwise S_{t-1}_new(u) = S_{t-1}_old(u), so x contributed to
    the OLD union too; suppose x missed S_t_old — then >= k old-union
    elements were smaller than x, and each is either still contributed
    by its (unchanged) source or was evicted from a changed source,
    which by truncation means that source now holds k elements smaller
    still. Either way the NEW union has >= k elements below x,
    contradicting x in target. So cand ⊇ target, and
    truncate_k(cand) = target because cand ⊆ new union.

    Change detection is exact because the representation is canonical
    rows: truncation only evicts when a smaller element arrives, so a
    changed sketch always has at least one ADDED row, and
    ``S_t_new EXCEPT S_t_old`` (an anti-join on (node, h)) finds exactly
    the changed nodes. This is the explicit-representation condition the
    streaming-HyperANF design note demands — HLL sketch bytes cannot do
    this (non-canonical serialization).

    Scale: the update shuffles new edges once per level, old edges
    SEMI-JOINED down to changed sources (the changed set is typically a
    vanishing fraction of the graph per micro-batch), and runs the
    distinct + top-k ONLY over the touched nodes' rows — untouched
    nodes' sketch rows pass through by an anti-join, never through a
    shuffle-the-world re-aggregation (review r14: the first cut unioned
    the full old level into the top-k, costing a full-state shuffle per
    level per micro-batch). A replayed edge needs no dedup against the
    old edge set: its contribution was already in the old union and the
    candidate union is idempotent, so replays are semantic no-ops
    without anti-joining the accumulated edges.

    ``old_edges`` may contain duplicates and is NEVER normalized
    wholesale (review r14: a full-history distinct() per micro-batch is
    itself a shuffle-the-world cost): it is consumed only semi-joined
    down to changed sources, where duplicate contributions are no-ops
    through the candidate union. At scale, keep the accumulated edges
    as a bucketed-by-src table so that semi-join co-locates.
    """
    _check_k(levels_old, k, "anf_delta_update")
    e_old = old_edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    e_new = _norm_edges(new_edges)
    known = levels_old[0].select("node").distinct()
    fresh = _nodes_of(e_new).join(known, "node", "left_anti")
    s0 = (
        levels_old[0]
        .union(seed_sketches(fresh))
        .localCheckpoint(eager=True)
    )
    levels_new = [s0]
    changed = fresh.localCheckpoint(eager=True)  # changed_0
    for t in range(1, len(levels_old)):
        prev_new = levels_new[-1]
        changed_sketches = prev_new.join(changed, "node")
        old_from_changed = e_old.join(
            changed.withColumnRenamed("node", "src"), "src"
        )
        # checkpointed: contribs feeds both the touched-node projection
        # and the top-k re-aggregation, and its upstream includes the
        # old-edge semi-join — re-running that per consumer would double
        # the batch's heaviest scan
        contribs = (
            _gather(prev_new, e_new)
            .union(_gather(changed_sketches, old_from_changed))
            .union(changed_sketches.select("node", "h"))
        ).localCheckpoint(eager=True)
        # only nodes receiving a contribution can change; everyone else
        # keeps their old rows verbatim
        touched = contribs.select("node").distinct()
        s_t_touched = _topk(
            levels_old[t].join(touched, "node").select("node", "h")
            .union(contribs),
            k,
        ).localCheckpoint(eager=True)
        changed = (
            s_t_touched.join(levels_old[t], ["node", "h"], "left_anti")
            .select("node")
            .distinct()
            .localCheckpoint(eager=True)
        )
        levels_new.append(
            s_t_touched.union(
                levels_old[t].join(touched, "node", "left_anti")
            ).localCheckpoint(eager=True)
        )
    return AnfLevels(levels_new, k)


def _fold_batch(
    state: dict, batch: DataFrame, hops: int, k: int
) -> None:
    """The ONE per-batch fold body (seed-on-first, else delta-update
    then accumulate without a distinct — see :func:`anf_over_batches`),
    shared by the list fold and the foreachBatch streaming gate so the
    rebuild-identity invariant lives in one place (review r15)."""
    nb = _norm_edges(batch).localCheckpoint(eager=True)
    if "levels" not in state:
        state["levels"] = ball_sketches(nb, hops, k)
        state["acc"] = nb
    else:
        state["levels"] = anf_delta_update(
            state["levels"], state["acc"], nb, k
        )
        state["acc"] = state["acc"].union(nb).localCheckpoint(eager=True)


def anf_streaming_curve(
    edges: DataFrame,
    hops: int,
    k: int = K_DEFAULT,
    n_batches: int = 3,
    work_dir: str | None = None,
) -> DataFrame:
    """The ANF curve computed by DRIVING a real Structured Streaming
    query: the edge set is carved into ``n_batches`` deterministic
    micro-batches (xxhash64 partition — any carve is correct, see
    below), staged as parquet files under a watch dir, and ingested by
    a file-source ``readStream`` whose ``foreachBatch`` body is exactly
    :func:`anf_over_batches`' fold — full build on the first batch,
    :func:`anf_delta_update` on every later one.

    Correctness does not depend on the carve or on micro-batch
    boundaries: the delta update is row-identical to a full rebuild
    over the union graph (the semilattice argument in
    :func:`anf_delta_update`), so ANY partition of the edges — however
    Spark's file source groups them — yields the same final levels.
    That is what makes this registrable as a hash-oracled gate even
    though it drives a stream: the oracle is the same recursive-CTE
    BFS the batch gate uses.

    The returned curve reads only the localCheckpoint'ed final levels,
    so it stays valid after the workspace is removed (the caller
    collects AFTER this function returns). ``work_dir`` is only the
    PARENT to allocate the private workspace under (e.g. a test's
    tmp_path); the workspace itself is always fresh and always removed
    (carve/workspace/stream discipline lives in
    :func:`..streaming.file_fold.drive_file_stream_fold`, extracted in
    r16 for the staged incremental-index gate)."""
    from ..streaming.file_fold import drive_file_stream_fold

    e = _norm_edges(edges).localCheckpoint(eager=True)
    state = drive_file_stream_fold(
        e,
        "src long, dst long",
        ["src", "dst"],
        n_batches,
        lambda st, b: _fold_batch(st, b, hops, k),
        work_dir,
    )
    if "levels" not in state:
        # An empty (post-normalization) edge set stages no files, so
        # no micro-batch ever fires. The batch twin anf_curve returns
        # a valid all-zero curve for the same input — match it
        # (ADVICE r15) instead of raising, so the rebuild-identity
        # claim covers the empty-graph edge case too. This branch is
        # REACHABLE ONLY on empty input: drive_file_stream_fold raises
        # when the carve stages nothing for a non-empty input (review
        # r16), so the streaming path cannot be silently skipped.
        return anf_curve(e, hops, k)
    return anf_curve_from_levels(state["levels"], k)


def anf_over_batches(
    batches: list[DataFrame], hops: int, k: int = K_DEFAULT
) -> AnfLevels:
    """Fold :func:`anf_delta_update` over edge batches (the streaming
    twin's per-micro-batch body): batch 0 seeds the levels with a full
    build, every later batch delta-propagates. The result levels are
    row-identical to a full :func:`ball_sketches` over the union graph
    (equivalence pinned in tests/test_anf.py)."""
    if not batches:
        raise ValueError("anf_over_batches needs at least one batch")
    # accumulation is WITHOUT a distinct: anf_delta_update tolerates
    # duplicate old edges (no-op contributions), and a full-history
    # dedup shuffle per batch is the cost this operator exists to
    # avoid (review r14)
    state: dict = {}
    for b in batches:
        _fold_batch(state, b, hops, k)
    return state["levels"]


# ---------------------------------------------------------------------------
# Registered driver gate (round 15; the pair was staged + validated as
# tests/test_anf.py's dry-run in round 14). Same <400-node fixture
# subgraph as g26/g27, but unlike those HLL gates — which are
# hash-exact only in the sparse-exact sketch regime — the bottom-k
# estimator is exact-INTEGER at every regime: exactly |ball| below k,
# else (k-1)*2^40 div kth-smallest-hash, bit-identical in DuckDB. Both
# estimator branches are exercised at hops=3 (max in-ball 385 > k=64).
# hops=3 rather than 4 budgets the gate (VERDICT r14 #2): the curve at
# 400 nodes is stage-floor-bound, ~16s cold / ~6s warm at sf0.01.
# ---------------------------------------------------------------------------

_G44_CAP = 400
_G44_HOPS = 3
_G44_K = 64


def _ball_ctes() -> str:
    """The shared recursive-CTE chain both staged/registered bottom-k
    gates read from (review r15: g44 and g46 duplicated it verbatim —
    a fix applied to one would silently desynchronize the other):
    fixture subgraph -> truncated BFS -> per-(t, v) ball members ->
    per-(t, v) count + kth-smallest member hash (``pn``). ``memb``
    dedups on (t, v, h) — the Spark sketch dedups member HASHES via
    _topk's distinct(), so a 40-bit md5 collision between two roots
    must collapse on the oracle side too for the two to agree by
    construction rather than by probability (ADVICE r15)."""
    from ..queries.graph import _T

    return f"""
    WITH RECURSIVE
    e0 AS (SELECT src, unnest(adj) AS dst FROM {_T}),
    f AS (SELECT DISTINCT src, dst FROM e0
          WHERE src < {_G44_CAP} AND dst < {_G44_CAP} AND src <> dst),
    n AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM f UNION SELECT dst FROM f)),
    reach(root, node, d) AS MATERIALIZED (
        SELECT node, node, 0 FROM n
        UNION
        SELECT r.root, f.dst, r.d + 1 FROM reach r
        JOIN f ON f.src = r.node WHERE r.d < {_G44_HOPS}
    ),
    md AS (SELECT root, node, min(d) AS d FROM reach GROUP BY root, node),
    hh AS (SELECT root, node, d, {_hash_sql('root')} AS h FROM md),
    ts AS (SELECT unnest(range(0, {_G44_HOPS + 1})) AS t),
    memb AS (SELECT DISTINCT ts.t, hh.node AS v, hh.h
             FROM hh JOIN ts ON hh.d <= ts.t),
    rk AS (SELECT t, v, h,
                  row_number() OVER (PARTITION BY t, v ORDER BY h) AS r,
                  count(*) OVER (PARTITION BY t, v) AS cnt
           FROM memb),
    pn AS (SELECT t, v, max(cnt) AS cnt,
                  max(CASE WHEN r = {_G44_K} THEN h END) AS kth
           FROM rk GROUP BY t, v)"""


def _g44_oracle() -> str:
    return f"""{_ball_ctes()}
    SELECT CAST(t AS BIGINT) AS t,
           CAST(sum(CASE WHEN cnt < {_G44_K} THEN cnt
                         ELSE ({_G44_K} - 1) * {_SCALE} // kth END)
                AS BIGINT) AS n_scaled
    FROM pn GROUP BY t
    """


@register(
    "g44_anf_curve",
    oracle=_g44_oracle(),
    doc="Bottom-k (KMV) approximate neighborhood function N(t) "
    "(Palmer-Gibbons-Faloutsos ANF 2002, bottom-k estimator per "
    "Cohen-Kaplan 2007) on the <400-node fixture subgraph: ball "
    "sketches as plain (node, h) rows — the k smallest distinct member "
    "hashes — grown one edge join + per-node top-k per hop. Exact "
    "integer estimates on BOTH engines (exactly |ball| below k, else "
    "the exact-integer KMV formula), so the gate hash-matches a "
    "recursive-CTE BFS oracle at EVERY sketch regime, unlike the HLL "
    "gates g26/g27 which need the sparse-exact restriction. The same "
    "module's anf_delta_update gives this operator an exactly- "
    "incremental streaming twin under edge additions (tests/test_anf).",
)
def g44_anf_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.graph import edges_df

    e = edges_df(spark).filter(
        (F.col("src") < _G44_CAP) & (F.col("dst") < _G44_CAP)
    )
    return anf_curve(e, _G44_HOPS, _G44_K)


# ---------------------------------------------------------------------------
# Registered round 16 (staged + dry-run-validated in r15; VERDICT r15
# item #2). g45 is g44's streaming twin as a GATE: the query fn itself
# drives a real foreachBatch stream over a temp watch dir — the first
# registered gate with that shape — yet stays fully hash-oracled
# because the delta update is row-identical to the batch rebuild, so
# the SAME recursive-CTE oracle certifies it (carve-independence pinned
# 2-vs-5 batches in tests/test_anf.py).
# ---------------------------------------------------------------------------

_G45_BATCHES = 3


@register(
    "g45_anf_stream_curve",
    oracle=_g44_oracle(),
    doc="The bottom-k ANF curve computed by DRIVING a real Structured "
    "Streaming foreachBatch job inside the query body: the <400-node "
    "fixture edges are carved into 3 deterministic micro-batches "
    "(xxhash64 partition), staged under a fresh private watch dir, and "
    "ingested by a file-source readStream (availableNow + "
    "maxFilesPerTrigger=1) whose fold is full-build-then-"
    "anf_delta_update. Hash-oracled by the SAME recursive-CTE BFS as "
    "g44 because the delta update is exactly row-identical to a batch "
    "rebuild over the union graph (semilattice argument in "
    "anf_delta_update's docstring) — micro-batch boundaries are "
    "invisible to the result.",
)
def g45_anf_stream_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.graph import edges_df

    e = edges_df(spark).filter(
        (F.col("src") < _G44_CAP) & (F.col("dst") < _G44_CAP)
    )
    return anf_streaming_curve(e, _G44_HOPS, _G44_K, _G45_BATCHES)


# ---------------------------------------------------------------------------
# Registered round 16 (staged + dry-run-validated in r15; VERDICT r15
# item #3 took g46 over q166 for the second window slot): per-node
# truncated harmonic in-centrality off the same ball-sketch levels —
# the bottom-k counterpart of the HLL-based g26 hyperball read-out,
# hash-oracleable at EVERY sketch regime where g26 needs the
# sparse-exact restriction. Registration cost (NOTES r15 note): one
# extra ball_sketches build per driver run while g44 is also
# registered — levels are not shared across gates; g44 rotates out of
# the driver window naturally (stamp 15) and neither gate is benched.
# ---------------------------------------------------------------------------


def _g46_oracle() -> str:
    import math

    lcm = math.lcm(*range(1, _G44_HOPS + 1))
    return f"""{_ball_ctes()},
    est AS (SELECT t, v,
                   CASE WHEN cnt < {_G44_K} THEN cnt
                        ELSE ({_G44_K} - 1) * {_SCALE} // kth END AS e
            FROM pn),
    dd AS (SELECT t, v, e - lag(e) OVER (PARTITION BY v ORDER BY t) AS de
           FROM est)
    SELECT v AS node,
           CAST(sum(de * ({lcm} // t)) AS BIGINT) AS h_scaled
    FROM dd WHERE t >= 1 GROUP BY v
    """


@register(
    "g46_harmonic_centrality",
    oracle=_g46_oracle(),
    doc="Per-node truncated harmonic in-centrality via the HyperBall "
    "read-out (Boldi-Vigna) on bottom-k ball sketches: h_scaled = "
    "sum_t (est_t - est_{t-1}) * lcm(1..T)/t, all int64 — the level "
    "estimates are exact-integer KMV values, nested balls make the "
    "diffs non-negative, and lcm-clearing removes the 1/t float. "
    "Shares _ball_ctes() with g44 so the two oracles cannot drift; "
    "hash-exact at every sketch regime, unlike HLL-based g26.",
)
def g46_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.graph import edges_df

    e = edges_df(spark).filter(
        (F.col("src") < _G44_CAP) & (F.col("dst") < _G44_CAP)
    )
    levels = ball_sketches(e, _G44_HOPS, _G44_K)
    return harmonic_from_levels(levels, _G44_K)
