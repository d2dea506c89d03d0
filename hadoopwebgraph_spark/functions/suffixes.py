"""Suffix-class machinery: distributed prefix doubling over a document
corpus — staged in round 13 for round 14's registered operator (the r13
driver window had zero spare slots, so REGISTRATION is deliberately
deferred; see NOTES.md r13 and VERDICT r12 #9).

The exact-substring dedup the repo already ships (q119, Lee et al.)
fingerprints fixed-length grams with one md5 shuffle — the right tool
for ONE threshold L. This module builds the general structure instead:
per-position equivalence classes of the first 2^k characters, doubled
k -> k+1 rounds, from which a class for ANY window length composes in
O(1) extra shuffles (the classic suffix-array doubling/LCP trick). One
build answers every L — maximal-span queries, multi-threshold sweeps —
where the gram approach pays a full corpus shuffle per L.

Spark-first shape (no suffix-array ORDER is ever materialized):

- Classes need only EQUALITY, not rank order, so each round's class id
  is the canonical representative ``min(gpos)`` of the class — one
  groupBy + one join-back per round, never a global sort, never a
  single-partition window (the audit class). Ids stay 8-byte longs
  regardless of window length: round k shuffles (doc_id, pos, long)
  instead of 2^k-character substrings.
- Validity-by-construction: round k's table contains exactly the
  positions whose full 2^k-char window is in-bounds, because each
  doubling inner-joins position p with position p + 2^k from the SAME
  doc's valid table — out-of-range windows fall out of the join instead
  of needing sentinel ranks.
- At 100 TB: every round is two key-partitioned shuffles of narrow
  longs; rounds = ceil(log2 L) (L=64 -> 6). Characters-as-rows is the
  honest cost model for exact-substring work at scale — the same rows
  q119 already explodes, amortized across all thresholds here.

Cross-engine note: class ids are min-gpos representatives, which are
content-derived and deterministic, but an oracle should compare the
CLASSES (substring equality), not the representative values — the r14
registration contract will group on the substring itself in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

# gpos = doc_id * _DOC_STRIDE + pos must be injective; documents at any
# SF are chunk-bounded well under this (q132 chunks at 4k chars)
_DOC_STRIDE = 1 << 24


def _gpos() -> "F.Column":
    """Injective packed position. The packing assumption (doc fits the
    stride, non-negative doc_id) is asserted per DOC in ``_seed_classes``
    — an assert here would run per POSITION, ~len(text) times more
    (measured ~2s/phase at sf0.1, r14)."""
    return F.col("doc_id") * _DOC_STRIDE + F.col("pos")


def _packing_guard() -> "F.Column":
    """Per-doc execution-time assert: a violated packing assumption
    (doc longer than the stride, negative doc_id) must be an ERROR,
    never silently merged classes and wrong dedup output (review r13).
    Evaluates to doc_id on success; folded into the repartition key so
    column pruning can never drop it (it runs once per doc row).
    ``length <= stride`` implies every position < stride."""
    ok = (F.length("text") <= F.lit(_DOC_STRIDE)) & (F.col("doc_id") >= 0)
    return F.col("doc_id") + F.coalesce(
        F.assert_true(
            ok,
            F.lit(
                "suffixes: gpos packing needs doc_id >= 0 and docs under "
                f"{_DOC_STRIDE} chars — chunk long documents first (q132)"
            ),
        ).cast("long"),
        F.lit(0),
    )


def _representative(classes: DataFrame, key_cols: list[str]) -> DataFrame:
    """Replace an equality key by its canonical long id: the smallest
    gpos in the key's class. Injective by content, no ordering pass.
    The class SIZE rides along as ``cls_n`` — the aggregation computes
    it for free, and downstream dup detection then needs no second
    groupBy+join over the position table (r14: that re-shuffle was
    ~2 of the gate's shuffles). Doubling rounds drop the column in
    their explicit projections."""
    reps = classes.groupBy(*key_cols).agg(
        F.min("gpos").alias("cls"), F.count(F.lit(1)).alias("cls_n")
    )
    return classes.join(reps, key_cols).drop(*key_cols)


def _materialize_round(df: DataFrame) -> DataFrame:
    """Loop-state truncation: each round's ``_representative`` consumes
    its input TWICE (the class groupBy and the join-back), so both the
    execution AND the logical plan double per round — persist alone
    fixes only execution, while Catalyst still analyzes a 2^rounds-node
    tree (measured on the pre-r14 self-join shape: round 4 spent
    seconds in plan analysis and a small driver OOM'd stringifying the
    tree; the lead()-window rewrite did not change the double
    consumption, only the shift's shuffle count). localCheckpoint is
    the repo's established remedy for exactly this iterative loop-state
    class (pagerank/hyperanf hop loops, NOTES r11/r12)."""
    return df.localCheckpoint(eager=True)


# widest seed window: round 0 classes come from a direct substring key
# computed right after the spread-by-doc shuffle (one full-text shuffle
# to parallelize the explode; after that only the seed key and narrow
# longs ever shuffle), replacing the first SEED_POW doubling rounds.
# 16 chars is
# the sweet spot: the seed's key shuffle grows by 8 bytes/position while
# each round it replaces costs ~3 narrow-long shuffles + a checkpoint of
# the whole position table (measured r14: one round ≈ 3.5s at sf0.1).
_SEED_POW = 4


def _seed_classes(docs: DataFrame, seed_len: int) -> DataFrame:
    """Round-0 classes of the first ``seed_len`` characters, straight
    from a substring key — ``_SEED_POW`` fewer doubling rounds than
    starting from single characters. Positions come from a
    ``sequence()`` explode (never a per-character regex split), and the
    corpus is spread by doc_id FIRST: each doc fans out to ~len(text)
    rows, so the explode must parallelize even when the input arrives
    as one split (locally: one small parquet file; at scale: a handful
    of giant text files). The partition count is EXPLICIT because AQE
    sizes coalescing from the exchange's input bytes — pre-explode
    text is ~len(text)/stride smaller than what the stage produces, so
    AQE would coalesce the amplifying stage to one task (measured:
    the whole seed serialized on one core at sf0.1)."""
    n_shuffle = int(
        docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    keyed = (
        docs.filter(F.length("text") >= seed_len)
        .repartition(n_shuffle, _packing_guard())
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(0), F.length("text") - seed_len)
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            _gpos().alias("gpos"),
            F.col("text").substr(F.col("pos") + 1, F.lit(seed_len)).alias("k"),
        )
    )
    return _representative(keyed, ["k"]).withColumnRenamed("cls", "rank")


def _shifted_rank(cur: DataFrame, step: int) -> DataFrame:
    """``r2`` = the class rank at position pos+step of the same doc,
    null when out of range — computed with ``lead(rank, step)`` over a
    per-document window instead of a two-sided self-join. Sound because
    every round's valid positions are a CONTIGUOUS prefix 0..len-2^k of
    each doc (validity is pos <= len - window), so the row ``step``
    rows ahead in pos order is exactly position pos+step. One
    doc-bounded shuffle (the q119 class) replaces the join's two."""
    w = W.partitionBy("doc_id").orderBy("pos")
    return (
        cur.withColumn("r2", F.lead("rank", step).over(w))
        .filter(F.col("r2").isNotNull())
        .select("doc_id", "pos", "gpos", F.col("rank").alias("r1"), "r2")
    )


def _class_levels(
    docs: DataFrame,
    seed_pow: int,
    max_pow: int,
    keep: set[int] | None = None,
) -> dict[int, DataFrame]:
    """Power levels from ONE doubling chain seeded at ``seed_pow``,
    returning only the levels in ``keep`` (default: all). Each level is
    the checkpointed table the next round consumes anyway, so RETURNING
    a level is free — but PINNING one is not: the chain drops its
    reference to level k as soon as k+1 exists unless k is kept, so the
    ContextCleaner can release intermediate checkpoints while the build
    is still running (review r14: the single-L path was holding every
    intermediate level for the whole build — ~log2(L) corpus-sized
    checkpoint RDDs pinned at once instead of ~2)."""
    if keep is None:
        keep = set(range(seed_pow, max_pow + 1))
    out: dict[int, DataFrame] = {}
    cur = _materialize_round(_seed_classes(docs, 1 << seed_pow))
    if seed_pow in keep:
        out[seed_pow] = cur
    for k in range(seed_pow, max_pow):
        cur = _materialize_round(
            _representative(
                _shifted_rank(cur, 1 << k), ["r1", "r2"]
            ).withColumnRenamed("cls", "rank")
        )
        if k + 1 in keep:
            out[k + 1] = cur
    return out


def prefix_class_ranks(docs: DataFrame, max_pow: int) -> DataFrame:
    """Doubling rounds up to 2^max_pow: returns (doc_id, pos, gpos,
    rank) where ``rank`` identifies the equivalence class of the first
    2^max_pow characters at (doc_id, pos); only positions whose full
    window is in-bounds appear."""
    seed_pow = min(_SEED_POW, max_pow)
    return _class_levels(docs, seed_pow, max_pow, keep={max_pow})[max_pow]


def _required_pow(length: int) -> int:
    """The power level a ``length``-char class composes from: log2 L
    when L is a power of two (used directly), else the largest
    2^k < L (composed with an overlapping offset copy)."""
    max_pow = (length - 1).bit_length()  # smallest 2^K >= length
    return max_pow if (1 << max_pow) == length else max_pow - 1


def _classes_from_levels(
    levels: dict[int, DataFrame], length: int, materialize: bool = True
) -> DataFrame:
    """Classes of exact ``length``-char substrings off retained levels:
    a power-of-two length IS its level; otherwise compose the largest
    2^k < L with an offset-L-2^k copy (the O(1) LCP-compare trick) —
    one extra shuffle, never a round. ``materialize=False`` skips the
    compose checkpoint for single-consumer callers (the span paths read
    the classes exactly once now that ``cls_n`` makes dup detection a
    row-local filter)."""
    k = _required_pow(length)
    if (1 << k) == length:
        return levels[k].withColumnRenamed("rank", "cls")
    off = length - (1 << k)
    out = _representative(_shifted_rank(levels[k], off), ["r1", "r2"])
    return _materialize_round(out) if materialize else out


def substring_classes(docs: DataFrame, length: int) -> DataFrame:
    """(doc_id, pos, gpos, cls, cls_n) where ``cls`` identifies the
    exact ``length``-character substring at (doc_id, pos) — two rows
    share cls IFF their substrings are equal — and ``cls_n`` is the
    class size. Materialized: external callers may consume it more
    than once."""
    if length < 1:
        raise ValueError("length must be >= 1")
    k = _required_pow(length)
    seed_pow = min(_SEED_POW, k)
    return _classes_from_levels(_class_levels(docs, seed_pow, k), length)


def _merge_spans(cls: DataFrame, length: int) -> DataFrame:
    """Merged per-document intervals covered by corpus-duplicated
    ``length``-char windows, from a class table carrying ``cls_n``
    (the class size ``_representative`` attaches). Dup detection is a
    row-local filter — no re-aggregation of the position table.
    Interval merge is a per-document gaps-and-islands window
    (doc-bounded partitions, the q119 class)."""
    starts = cls.filter(F.col("cls_n") > 1).select("doc_id", "pos")
    doc_w = W.partitionBy("doc_id").orderBy("pos")
    run_w = doc_w.rowsBetween(W.unboundedPreceding, -1)
    islands = (
        starts.withColumn(
            "new_island",
            (
                F.col("pos")
                > F.coalesce(
                    F.max(F.col("pos") + length).over(run_w), F.lit(-1)
                )
            ).cast("int"),
        )
        .withColumn("island", F.sum("new_island").over(doc_w))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + length).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def duplicated_span_intervals(docs: DataFrame, length: int) -> DataFrame:
    """Merged per-document intervals [span_start, span_end) covered by
    some substring of ``length`` chars that occurs more than once in the
    corpus (any document, including the same one) — q119's Lee-et-al
    semantics generalized onto the class structure."""
    if length < 1:
        raise ValueError("length must be >= 1")
    k = _required_pow(length)
    levels = _class_levels(docs, min(_SEED_POW, k), k, keep={k})
    return _merge_spans(
        _classes_from_levels(levels, length, materialize=False), length
    )


def duplicated_span_intervals_multi(
    docs: DataFrame, lengths: list[int]
) -> DataFrame:
    """Duplicated spans at EVERY threshold in ``lengths`` off ONE class
    build — the structure's differentiator (staged r14 for a future
    registration): the doubling levels are retained as they are built,
    each L composes from its level with at most one extra shuffle, and
    only the per-L dup-count + island merge repeat. A gram/md5 approach
    (q119) pays a full corpus explode + shuffle PER threshold; a
    multi-threshold sweep here costs one build + per-L post-processing
    on the narrow class tables. Returns (span_len, doc_id, span_start,
    span_end)."""
    uniq = sorted(set(lengths))
    if not uniq or uniq[0] < 1:
        raise ValueError("lengths must be a non-empty list of ints >= 1")
    pows = {length: _required_pow(length) for length in uniq}
    needed = set(pows.values())
    # the doubling chain starts at the usual wide seed — a small
    # threshold must NOT drag the whole chain down to near-character
    # rounds (review r14: lengths=[2, 64] was seeding at 2 chars and
    # paying 5 rounds where the 16-char seed needs 2). Levels below the
    # chain seed are direct substring seeds themselves — one extra
    # explode+groupBy each, no extra rounds.
    chain_seed = min(_SEED_POW, max(needed))
    levels = _class_levels(
        docs,
        chain_seed,
        max(needed),
        keep={k for k in needed if k >= chain_seed},
    )
    for k in sorted(needed):
        if k < chain_seed:
            levels[k] = _materialize_round(_seed_classes(docs, 1 << k))
    out = None
    for length in uniq:
        spans = _merge_spans(
            _classes_from_levels(levels, length, materialize=False), length
        ).select(
            F.lit(length).cast("long").alias("span_len"),
            "doc_id",
            "span_start",
            "span_end",
        )
        out = spans if out is None else out.union(spans)
    return out


# registered operator (round 14; the pair below was staged + validated
# as tests/test_suffixes.py::Q163_ORACLE in round 13)
_SPAN_L = 20


def span_oracle_sql(length: int, with_len: bool = False) -> str:
    """DuckDB oracle for the duplicated-span semantics at ONE threshold
    — the single source both the registered q163 oracle and the staged
    multi-threshold pair build from (review r14: two hand-kept copies
    would silently drift). Nested-subquery form so thresholds compose
    under UNION ALL without CTE-name collisions."""
    sel_len = f"CAST({length} AS BIGINT) AS span_len, " if with_len else ""
    return f"""
    SELECT {sel_len}doc_id,
           min(pos) AS span_start, max(pos) + {length} AS span_end
    FROM (
        SELECT doc_id, pos,
               sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM (
            SELECT doc_id, pos,
                   CASE WHEN pos > coalesce(max(pos + {length}) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       -1) THEN 1 ELSE 0 END AS new_island
            FROM (
                SELECT doc_id, pos FROM (
                    SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
                           substr(text, CAST(p AS INTEGER), {length}) AS k
                    FROM (
                        SELECT doc_id, text,
                               unnest(range(1, length(text) - {length} + 2))
                                   AS p
                        FROM documents
                    )
                ) pos_l
                JOIN (
                    SELECT k FROM (
                        SELECT substr(text, CAST(p AS INTEGER), {length}) AS k
                        FROM (
                            SELECT text,
                                   unnest(range(1, length(text) - {length}
                                                + 2)) AS p
                            FROM documents
                        )
                    ) GROUP BY k HAVING count(*) > 1
                ) dup_l USING (k)
            )
        )
    )
    GROUP BY doc_id, island
    """


@register(
    "q163_suffix_span_dedup",
    oracle=span_oracle_sql(_SPAN_L),
    doc="Merged per-document spans covered by a corpus-duplicated "
    f"{_SPAN_L}-char window, computed on the prefix-doubling suffix-class "
    "structure (min-gpos representatives; equality-only, never a global "
    "sort) — q119's Lee-et-al semantics off a build that answers ANY "
    "span length, where the gram approach pays a corpus shuffle per L. "
    "The oracle groups on the substring itself (class representatives "
    "are internal).",
)
def q163_suffix_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    df = duplicated_span_intervals(docs, _SPAN_L)
    return df.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
    )
