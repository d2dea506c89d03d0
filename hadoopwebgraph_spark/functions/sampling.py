"""Deterministic sampling / splitting / shuffling — the dataset-assembly
verbs of a training-data pipeline, SURVEY.md §2 Tier C.

All three use content hashing (md5) instead of RNG state, so results are
(a) reproducible across runs and engines — the DuckDB oracle hash-matches
exactly, unlike rand()-based sampleBy whose draw depends on partitioning —
and (b) stable under re-partitioning, backfills, and incremental appends:
a document's sample/split membership never changes when the corpus grows,
which is the property a 100 TB training pipeline needs (re-runs must not
reshuffle examples between train and test).

Scale: each operator is a narrow projection + filter on a hash of the
row's own key — no shuffle at all for sampling/splitting (the predicate
pushes into the scan pipeline), one TakeOrderedAndProject for the
shuffle-order head.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

# first-hex-digit bands of md5(doc_id): 16 equiprobable buckets
SAMPLE_DIGITS = ("0", "1")  # 2/16 = 12.5% sample
VAL_DIGITS = ("c", "d")
TEST_DIGITS = ("e", "f")


def _hash_col() -> F.Column:
    return F.md5(F.col("doc_id").cast("string"))


def hash_sample(docs: DataFrame, digits=SAMPLE_DIGITS) -> DataFrame:
    """Deterministic ~len(digits)/16 sample keyed on content hash."""
    return docs.filter(F.substring(_hash_col(), 1, 1).isin(*digits))


def dataset_split(docs: DataFrame) -> DataFrame:
    """Assign train/val/test by hash band (75/12.5/12.5)."""
    d = F.substring(_hash_col(), 1, 1)
    return docs.withColumn(
        "split",
        F.when(d.isin(*VAL_DIGITS), F.lit("val"))
        .when(d.isin(*TEST_DIGITS), F.lit("test"))
        .otherwise(F.lit("train")),
    )


@register(
    "q86_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN {SAMPLE_DIGITS!r}
    """,
    doc="Deterministic 12.5% corpus sample via md5 hash bands — "
    "reproducible across engines, runs, and partitionings (unlike "
    "rand()-based sampling); membership is stable under corpus growth. "
    "The filter is a narrow per-row predicate: no shuffle, no RNG state.",
)
def q86_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return hash_sample(docs).select("doc_id", "lang", "n_chars")


@register(
    "q87_dataset_split",
    oracle=f"""
    SELECT split, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN {VAL_DIGITS!r} THEN 'val'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                      IN {TEST_DIGITS!r} THEN 'test'
                 ELSE 'train'
               END AS split,
               n_chars
        FROM documents
    )
    GROUP BY split
    """,
    doc="Train/val/test assignment by md5 hash band (75/12.5/12.5): a "
    "document's split never changes as the corpus grows — the leakage "
    "guarantee a training pipeline needs. Output: per-split counts + "
    "char volume.",
)
def q87_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        dataset_split(docs)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "q88_shuffle_order",
    oracle="""
    SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS shuffle_key
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 20
    """,
    doc="Deterministic global shuffle for training-example ordering: "
    "order by md5(key) — a reproducible permutation independent of "
    "physical layout. Plans as TakeOrderedAndProject for the head "
    "(per-partition heaps + driver merge of 20 rows, no global sort).",
)
def q88_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    h = _hash_col()
    return (
        docs.select("doc_id", F.substring(h, 1, 8).alias("shuffle_key"))
        .orderBy(h, "doc_id")
        .limit(20)
    )


PACK_BUDGET = 512  # token budget per training pack


@register(
    "q89_sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
               md5(CAST(doc_id AS VARCHAR)) AS h,
               doc_id,
               len(regexp_extract_all(text, '[a-z0-9]+')) AS n_toks
        FROM documents
    ),
    packed AS (
        SELECT shard,
               CAST((sum(n_toks) OVER (PARTITION BY shard ORDER BY h, doc_id
                                       ROWS UNBOUNDED PRECEDING) - n_toks)
                    // {PACK_BUDGET} AS INTEGER) AS pack_id,
               n_toks
        FROM t
    )
    SELECT shard, pack_id,
           count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY shard, pack_id
    """,
    doc="Sequence packing for training: documents are sharded by hash "
    f"prefix (16-way parallel), deterministically ordered within each "
    f"shard, and binned into contiguous ~{PACK_BUDGET}-token packs via a "
    "running token sum (pack = cumulative-tokens-before // budget). One "
    "window per shard — packing parallelism scales with shards, never a "
    "global single-partition window. Output: per-pack doc count + token "
    "total, hash-exact vs DuckDB.",
)
def q89_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    h = _hash_col()
    t = docs.select(
        F.substring(h, 1, 1).alias("shard"),
        h.alias("h"),
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)).alias(
            "n_toks"
        ),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = t.select(
        "shard",
        (
            (F.sum("n_toks").over(w) - F.col("n_toks"))
            .cast("long")
            / F.lit(PACK_BUDGET)
        )
        .cast("int")
        .alias("pack_id"),
        "n_toks",
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("pack_tokens"),
    )


@register(
    "q107_stratified_fixed_n",
    oracle="""
    SELECT source, doc_id, rk FROM (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
    WHERE rk <= 5
    """,
    doc="Fixed-SIZE stratified sample: exactly 5 docs per source stratum, "
    "chosen by md5 order so membership is deterministic, engine-portable "
    "and stable under repartitioning (complements q86's fixed-RATE hash "
    "sample and q101's temperature mixture). Uses the two-phase "
    "rank-filter (similarity.topk_per_group) so no single reducer sees a "
    "whole stratum — the per-stratum window fan-in is the thing that "
    "breaks at 100 TB, not the sample itself.",
)
def q107_stratified_fixed_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import topk_per_group

    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("_h")
    )
    return topk_per_group(
        docs, ["source"], [F.col("_h"), F.col("doc_id")], 5, rank_col="rk"
    ).select("source", "doc_id", "rk")


# ---------------------------------------------------------------------------
# weighted sampling (priority sampling, Duffield-Lund-Thorup)
# ---------------------------------------------------------------------------

_PRIORITY_K = 50


@register(
    "q121_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars, round(priority, 4) AS priority
    FROM (
        SELECT doc_id, n_chars, priority
        FROM (
            SELECT doc_id, n_chars,
                   n_chars / ((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                    AS BIGINT) + 0.5) / 4294967296.0) AS priority
            FROM documents
        )
        -- order/limit on the UNROUNDED priority (inner column), matching the
        -- Spark side; an outer ORDER BY priority would capture the rounded
        -- output alias and could flip the cut at the LIMIT boundary
        ORDER BY priority DESC, doc_id
        LIMIT {_PRIORITY_K}
    )
    """,
    doc="Weighted sample without replacement via PRIORITY SAMPLING "
    "(Duffield, Lund & Thorup, JACM 2007): per-row priority = weight / u "
    "with u a deterministic md5-derived uniform in (0,1); the top-k rows "
    "by priority are a weighted sample supporting unbiased subset-sum "
    "estimation. Deterministic (content-hashed u, no RNG state), "
    "engine-portable (only IEEE *, / — no ln/pow whose last-ULP varies "
    "by libm), and one TakeOrderedAndProject pass: every executor keeps "
    "a local top-k heap, the driver merges k rows per partition — no "
    "global sort at 100 TB. Weight here is n_chars (sample long docs "
    "proportionally more).",
)
def q121_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    v = F.conv(F.substring(_hash_col(), 1, 8), 16, 10).cast("double")
    u = (v + F.lit(0.5)) / F.lit(4294967296.0)
    return (
        d.select("doc_id", "n_chars", (F.col("n_chars") / u).alias("priority"))
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_PRIORITY_K)
        .withColumn("priority", F.round("priority", 4))
    )


# ---------------------------------------------------------------------------
# Streaming twin of q121: always-on weighted-sample maintenance (r12).
#
# Priority sampling composes exactly like a KMV sketch: the global top-k
# by (priority DESC, doc_id) is always contained in the union of
# per-batch top-ks under the same order, so per-batch samples land as
# idempotent snapshot partitions and the read-time merge IS the batch
# sample over everything ingested — the theta/inverted-index snapshot
# discipline applied to Duffield-Lund-Thorup sampling. Priorities are
# stored UNROUNDED (IEEE doubles round-trip parquet bit-exactly); the
# consumer applies q121's output rounding after the cut.
# ---------------------------------------------------------------------------


def _priority_one_batch(
    batch_df: DataFrame, batch_id: int, snapshot_dir: str, k: int = _PRIORITY_K
) -> None:
    """One micro-batch: the batch's own top-k priority sample, published
    as its snapshot partition (typed k-marker + stage/atomic-rename
    crash-safety shared in snapshot_util)."""
    from .snapshot_util import ensure_meta, publish_partition

    ensure_meta(snapshot_dir, "priority_sample", k)
    v = F.conv(F.substring(_hash_col(), 1, 8), 16, 10).cast("double")
    u = (v + F.lit(0.5)) / F.lit(4294967296.0)
    sample = (
        batch_df.select(
            "doc_id", "n_chars", (F.col("n_chars") / u).alias("priority")
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(k)
    )
    publish_partition(sample, snapshot_dir, batch_id)


def incremental_priority_sample(
    spark: SparkSession,
    incoming_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    schema=None,
    k: int = _PRIORITY_K,
):
    """q121's weighted sample as an always-on ingestion job: each
    micro-batch contributes its own top-k, priority_sample_snapshot()
    serves the merged sample — EXACTLY q121 over everything ingested
    (the top-k-by-priority merge loses nothing). Returns the
    StreamingQuery. Per batch only k narrow rows leave the scan."""
    from .snapshot_util import infer_watch_schema

    file_schema = infer_watch_schema(
        spark, incoming_dir, "incremental_priority_sample", schema
    )
    stream = spark.readStream.schema(file_schema).parquet(incoming_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: _priority_one_batch(
                batch_df, batch_id, snapshot_dir, k
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def priority_sample_snapshot(
    spark: SparkSession, snapshot_dir: str, k: int | None = None
) -> DataFrame:
    """The live weighted sample over everything ingested: top-k by
    (unrounded priority DESC, doc_id) across all batch partials, with
    q121's output rounding applied AFTER the cut. ``k`` resolves from
    the writer's recorded marker (drift, wrong-kind, and missing-marker
    reads all raise rather than guess)."""
    from .snapshot_util import read_snapshot, resolve_k

    k = resolve_k(snapshot_dir, "priority_sample", k)
    return (
        read_snapshot(spark, snapshot_dir)
        .select("doc_id", "n_chars", "priority")
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(k)
        .withColumn("priority", F.round("priority", 4))
    )
