"""Theta-sketch distinct-count set algebra (SURVEY.md §2 sketch family,
VERDICT r11 next-round candidate).

A KMV/theta sketch (Beyer et al. "On Synopses for Distinct-Value
Estimation", Dasgupta et al. "Theta Sketch Framework") summarizes a set
as its K smallest distinct hash values; unlike the HLL family (q12/g26)
the sample supports SET OPERATIONS: the K smallest values of a union are
always contained in the union of the per-set sketches, and intersections
/ differences are estimated from the retained samples below the smaller
of the two thetas. This gives distinct-count algebra (|A|, |B|, |A∪B|,
|A∩B|, |A\\B|) from two tiny synopses without re-scanning either input.

Cross-engine exactness (unlike the rows-only HLL probes, this IS fully
hash-oracled): the hash is the repo's md5 discipline — the first 10 hex
chars of md5('theta-' || key) parsed as a 40-bit BIGINT, computable
bit-identically in Spark (``conv(substr(md5(..),1,10),16,10)``) and
DuckDB (``CAST('0x' || substr(md5(..),1,10) AS BIGINT)``) — and every
estimate is pure int64 arithmetic: (K-1)*2^40 div theta, never a float.

Scale: each per-set sketch is a distinct + TakeOrderedAndProject(K) —
the map side keeps only K candidates per partition, so nothing
corpus-sized ever converges on one node; the set algebra then runs on
<= K-row inputs. At 100 TB the sketches are the only cross-stage state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import track
from .snapshot_util import (
    ensure_meta,
    infer_watch_schema,
    publish_partition,
    read_snapshot,
    resolve_k,
)
from ..catalog import load
from ..registry import register

K = 64
_SCALE = 1 << 40  # 10 hex chars of the md5 = a 40-bit hash space


def theta_hash(col: F.Column) -> F.Column:
    """40-bit integer hash, bit-identical in Spark and DuckDB (the g39/
    g43 md5 discipline; conv's decimal string casts exactly at 10 hex
    digits < 2^63)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("-", F.lit("theta"), col)), 1, 10),
        16,
        10,
    ).cast("long")


def _theta_hash_sql(expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('theta-' || {expr}), 1, 10)) AS BIGINT)"
    )


def theta_sketch(values: DataFrame, k: int = K) -> DataFrame:
    """Build a theta sketch: the k smallest DISTINCT 40-bit hashes of the
    single-column input. distinct dedupes hash collisions (so the later
    ORDER BY has no ties); orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-k then a k-row merge,
    never a global sort (the q85 idiom)."""
    col = values.columns[0]
    return (
        values.select(theta_hash(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def _stats(sketch: DataFrame, tag: str, k: int = K) -> DataFrame:
    """One-row (n, theta, est) summary. theta is the k-th smallest value
    when the sketch is full, else the whole hash space (the sketch holds
    every distinct value, so the estimate is exact = n)."""
    full = F.col(f"n{tag}") >= k
    return sketch.agg(
        F.count(F.lit(1)).alias(f"n{tag}"), F.max("h").alias(f"k{tag}")
    ).select(
        F.col(f"n{tag}"),
        F.when(full, F.col(f"k{tag}")).otherwise(F.lit(_SCALE)).alias(
            f"theta{tag}"
        ),
        F.when(
            full, F.expr(f"{(k - 1) * _SCALE} div k{tag}")
        )
        .otherwise(F.col(f"n{tag}"))
        .cast("long")
        .alias(f"est{tag}"),
    )


# module-level so the staged q170 twin shares it without importing the
# whole registry graph (review r17)
_Q160_ORACLE = f"""
    WITH da AS MATERIALIZED (
        SELECT DISTINCT {_theta_hash_sql("CAST(o_custkey AS VARCHAR)")} AS h
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01'
          AND o_orderdate <  DATE '1996-01-01'
    ),
    db AS MATERIALIZED (
        SELECT DISTINCT {_theta_hash_sql("CAST(o_custkey AS VARCHAR)")} AS h
        FROM orders
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate <  DATE '1997-01-01'
    ),
    sa AS MATERIALIZED (SELECT h FROM da ORDER BY h LIMIT {K}),
    sb AS MATERIALIZED (SELECT h FROM db ORDER BY h LIMIT {K}),
    su AS MATERIALIZED (
        SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
        ORDER BY h LIMIT {K}
    ),
    st AS MATERIALIZED (
        SELECT a.n AS na, b.n AS nb, u.n AS nu,
               CASE WHEN a.n >= {K} THEN a.kth ELSE {_SCALE} END AS ta,
               CASE WHEN b.n >= {K} THEN b.kth ELSE {_SCALE} END AS tb,
               CASE WHEN u.n >= {K} THEN u.kth ELSE {_SCALE} END AS tu
        FROM (SELECT count(*) AS n, max(h) AS kth FROM sa) a,
             (SELECT count(*) AS n, max(h) AS kth FROM sb) b,
             (SELECT count(*) AS n, max(h) AS kth FROM su) u
    ),
    cut AS MATERIALIZED (SELECT least(ta, tb) AS cutoff FROM st),
    mi AS (SELECT count(*) AS m FROM sa JOIN sb USING (h), cut
           WHERE h < cutoff),
    md AS (SELECT count(*) AS m FROM sa, cut
           WHERE h < cutoff AND h NOT IN (SELECT h FROM sb))
    SELECT op, CAST(est AS BIGINT) AS est FROM (
        SELECT 'est_a' AS op,
               CASE WHEN na >= {K} THEN {(K - 1) * _SCALE} // ta
                    ELSE na END AS est FROM st
        UNION ALL
        SELECT 'est_b',
               CASE WHEN nb >= {K} THEN {(K - 1) * _SCALE} // tb
                    ELSE nb END FROM st
        UNION ALL
        SELECT 'est_union',
               CASE WHEN nu >= {K} THEN {(K - 1) * _SCALE} // tu
                    ELSE nu END FROM st
        UNION ALL
        SELECT 'est_intersect', m * {_SCALE} // cutoff FROM mi, cut
        UNION ALL
        SELECT 'est_a_minus_b', m * {_SCALE} // cutoff FROM md, cut
    )
    """


@register(
    "q160_theta_sketch_setops",
    oracle=_Q160_ORACLE,
    doc="Theta/KMV sketch set algebra over two order-year cohorts of "
    "customers: per-set distinct-count estimates plus union / "
    "intersection / difference estimates from the merged synopses — "
    "pure int64 arithmetic, fully hash-oracled (unlike the HLL "
    "family's rows-only checks).",
)
def q160_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # session-retained cache; contract in queries/graph._materialize —
    # each <=K-row sketch feeds several consumers below, and an
    # unpersisted Python-free subtree would still re-scan orders per use
    sa = track(theta_sketch(_year_custkeys(o, 1995)).persist())
    sb = track(theta_sketch(_year_custkeys(o, 1996)).persist())
    sa.count(), sb.count()
    return _theta_setops_readout(sa, sb)


def _year_custkeys(orders: DataFrame, y: int) -> DataFrame:
    """The q160 cohort: customer keys of orders placed in year ``y``
    (extracted r17 so the staged streaming twin shares the exact
    cohort predicate and key casting)."""
    return orders.filter(
        (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("date"))
    ).select(F.col("o_custkey").cast("string").alias("key"))


def _theta_setops_readout(sa: DataFrame, sb: DataFrame) -> DataFrame:
    """q160's set algebra over two built sketches (extracted verbatim
    r17 so the staged streaming twin q170 cannot drift — hash-identity
    of the five estimate rows depends on IDENTICAL Spark expressions,
    the _bm25_rank rule)."""
    su = sa.union(sb).distinct().orderBy("h").limit(K)

    ast, bst, ust = _stats(sa, "a"), _stats(sb, "b"), _stats(su, "u")
    cut = (
        ast.crossJoin(bst)
        .select(F.least("thetaa", "thetab").alias("cutoff"))
    )
    mi = (
        sa.join(sb, "h")
        .crossJoin(F.broadcast(cut))
        .filter(F.col("h") < F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    md = (
        sa.join(sb, "h", "left_anti")
        .crossJoin(F.broadcast(cut))
        .filter(F.col("h") < F.col("cutoff"))
        .groupBy("cutoff")
        .agg(F.count(F.lit(1)).alias("m"))
    )

    def est_row(stats: DataFrame, tag: str, op: str) -> DataFrame:
        return stats.select(
            F.lit(op).alias("op"), F.col(f"est{tag}").alias("est")
        )

    def setop_row(agg: DataFrame, op: str) -> DataFrame:
        # groupBy above yields zero rows for an empty sample — re-anchor
        # on the one-row cutoff table so the op always emits a row
        return (
            cut.join(agg, "cutoff", "left")
            .select(
                F.lit(op).alias("op"),
                F.expr(f"coalesce(m, 0) * {_SCALE} div cutoff")
                .cast("long")
                .alias("est"),
            )
        )

    return (
        est_row(ast, "a", "est_a")
        .unionAll(est_row(bst, "b", "est_b"))
        .unionAll(est_row(ust, "u", "est_union"))
        .unionAll(setop_row(mi, "est_intersect"))
        .unionAll(setop_row(md, "est_a_minus_b"))
    )


# ---------------------------------------------------------------------------
# Streaming twin: always-on distinct-count maintenance.
#
# KMV merge is lossless AND idempotent (k-smallest over a union of
# per-batch sketches == k-smallest over the union corpus; re-merging a
# batch changes nothing), which makes the streaming layout trivial:
# each micro-batch overwrites its own batch_id=<id> partition with the
# batch's OWN sketch, and the live sketch is recomputed on read as the
# k smallest distinct hashes across all partitions. No partition ever
# has to read another, so replay after any crash point is a no-op
# rewrite — the q128/incremental_neardup_stream snapshot discipline
# with the merge itself moved to read time (O(batches * K) rows, tiny).
# ---------------------------------------------------------------------------


def _theta_one_batch(
    batch_df: DataFrame, batch_id: int, key_col: str, snapshot_dir: str,
    k: int = K,
) -> None:
    """One micro-batch: sketch the batch's keys and publish it as this
    batch's snapshot partition (module-level so replay semantics are
    unit-testable, the _dedup_one_batch pattern). Crash-safety — typed
    k-marker, stage + atomic rename, replay discard, orphan sweep —
    lives in snapshot_util (shared with the inverted-index and
    priority-sample twins)."""
    ensure_meta(snapshot_dir, "theta_sketch", k)
    publish_partition(
        theta_sketch(batch_df.select(key_col), k), snapshot_dir, batch_id
    )


def incremental_theta_sketch(
    spark: SparkSession,
    incoming_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    key_col: str,
    schema=None,
    k: int = K,
):
    """q160's sketch build as an always-on ingestion job: watch
    ``incoming_dir`` for new files, sketch each micro-batch's
    ``key_col``, and land it as one snapshot partition.
    theta_sketch_snapshot() then serves the live sketch — EXACTLY equal
    to the batch sketch over everything ingested (KMV union is
    lossless), so the whole q160 set algebra (union / intersect /
    difference against any other sketch) works on a stream-maintained
    synopsis with zero reprocessing. Returns the StreamingQuery.

    Scale: per batch, only <=k 8-byte hashes leave the batch's scan;
    snapshot size is batches * k rows (compact with
    maintenance.compact_files if batch count ever matters).

    ``schema``: declared schema for incoming files; an empty watch dir
    with no declared schema RAISES (the file-stream hardening rule)."""
    file_schema = infer_watch_schema(
        spark, incoming_dir, "incremental_theta_sketch", schema
    )
    stream = spark.readStream.schema(file_schema).parquet(incoming_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: _theta_one_batch(
                batch_df, batch_id, key_col, snapshot_dir, k
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def theta_sketch_snapshot(
    spark: SparkSession, snapshot_dir: str, k: int | None = None
) -> DataFrame:
    """The live sketch of everything ingested so far: k smallest
    distinct hashes across all batch partitions (the read-time KMV
    merge). ``k`` resolves from the writer's recorded marker (drift and
    wrong-kind snapshots raise; a missing marker with no explicit k
    raises rather than guessing)."""
    k = resolve_k(snapshot_dir, "theta_sketch", k)
    return (
        read_snapshot(spark, snapshot_dir)
        .select("h")
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def theta_estimate(sketch: DataFrame, k: int = K) -> DataFrame:
    """One-row distinct-count estimate for any sketch DataFrame[h] —
    q160's exact-int64 estimator exposed for snapshot consumers. ``k``
    MUST equal the k the sketch was built with (use
    theta_snapshot_estimate for stream snapshots — it reads the
    recorded k)."""
    return _stats(sketch, "", k).select(F.col("est").alias("est"))


def theta_snapshot_estimate(
    spark: SparkSession, snapshot_dir: str
) -> DataFrame:
    """Estimate straight off a stream-maintained snapshot with the k it
    was built with — the drift-proof consumer path."""
    k = resolve_k(snapshot_dir, "theta_sketch", None)
    return theta_estimate(theta_sketch_snapshot(spark, snapshot_dir, k), k)


# ---------------------------------------------------------------------------
# STAGED for round 18+ (r17; VERDICT r16 item #7): q170 — q160's theta
# set algebra answered from sketches maintained by a LIVE foreachBatch
# stream over the orders table (the g45 gate shape via file_fold).
#
# Rebuild identity (what makes q160's oracle certify this VERBATIM):
# take-k-smallest-distinct is a bounded join-semilattice — for any
# partition of a cohort into batches,
#   kmin_K(distinct(U_i H_i)) == kmin_K(distinct(U_i kmin_K(H_i)))
# because every hash in the global k-smallest is necessarily in its own
# batch's k-smallest (anything that displaced it there would also
# displace it globally), and distinct absorbs re-deliveries. So the
# fold may truncate to K rows per cohort after EVERY batch, the carve
# can be ANY row partition (o_orderkey — no entity-completeness needed,
# unlike the doc_id carves), and the folded sketches are row-identical
# to the batch build's. The read-out then runs through the SAME
# _theta_setops_readout expressions q160 uses.
#
# Scale: per batch only <=K 8-byte hashes per cohort leave the batch's
# scan (TakeOrderedAndProject, never a global sort); state is 2*K rows
# TOTAL regardless of corpus size — the cheapest state of the whole
# incremental family. This is the always-on ingestion counterpart of
# incremental_theta_sketch above with the snapshot replaced by in-fold
# truncation, plus the full q160 set-algebra read-out.
# ---------------------------------------------------------------------------

_Q170_BATCHES = 3


def _theta_fold_batch(state: dict, batch: DataFrame) -> None:
    """One ingestion step: sketch each year cohort of the batch and
    semilattice-merge (union + distinct + k-truncate) into the state."""
    for tag, year in (("sa", 1995), ("sb", 1996)):
        sk_b = theta_sketch(_year_custkeys(batch, year))
        if tag not in state:
            state[tag] = sk_b.localCheckpoint(eager=True)
        else:
            state[tag] = (
                state[tag]
                .union(sk_b)
                .distinct()
                .orderBy("h")
                .limit(K)
                .localCheckpoint(eager=True)
            )


def stream_theta_setops(
    orders: DataFrame, n_batches: int = _Q170_BATCHES,
    work_dir: str | None = None,
) -> DataFrame:
    """q160's five estimate rows computed by DRIVING a file-source
    foreachBatch stream over an o_orderkey carve of ``orders``
    (machinery in streaming/file_fold.py). Row-identical to the batch
    operator for ANY carve — the KMV semilattice argument above."""
    from ..streaming.file_fold import drive_file_stream_fold

    d = orders.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
    ).localCheckpoint(eager=True)
    state = drive_file_stream_fold(
        d,
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
        ["o_orderkey"],
        n_batches,
        _theta_fold_batch,
        work_dir,
    )
    if "sa" not in state:
        # empty corpus (the g45 empty rule; reachable only on empty
        # input, file_fold raises otherwise): the batch pipeline over
        # the empty checkpointed input yields the five zero-estimate
        # rows
        sa = theta_sketch(_year_custkeys(d, 1995))
        sb = theta_sketch(_year_custkeys(d, 1996))
        return _theta_setops_readout(sa, sb)
    return _theta_setops_readout(state["sa"], state["sb"])


def q170_stream_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_theta_setops(load(spark, sf_dir, "orders"))
