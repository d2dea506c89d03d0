"""Deduplication operators for large-scale training-data pipelines —
SURVEY.md §2 Tier C: exact, MinHash-LSH, SimHash, and n-gram Jaccard.

Every operator is expressed with deterministic, engine-portable hashing
(md5 over explicit strings) so the DuckDB oracle can verify the full
pipeline value-for-value — including the LSH banding — rather than
falling back to rows-only checks.

Scale design (100 TB):
- Exact dedup is a hash groupBy (map-side partial agg, one shuffle).
- MinHash: shingle -> per-seed min-hash -> band signatures -> candidate
  pairs via an equi-join on (band, signature). The join key is the band
  bucket, so candidate generation is a bounded shuffle — never a cross
  join. Skewed buckets (boilerplate text) are handled by AQE skew split.
- SimHash: 16-bit signatures; Hamming<=2 pairs found by pigeonhole
  banding (3 bands: 6/5/5 bits) -> three equi-joins, union, exact filter.
- n-gram Jaccard verification runs only on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register
from .snapshot_util import infer_watch_schema

def _spread(docs: DataFrame) -> DataFrame:
    """The synthetic documents table arrives as one parquet file = one
    input partition; the shingle/token explosions below are CPU-bound, so
    spread rows across the cluster first.

    Keyed off the scan's actual partition count (r18, guide §2.4/§6):
    an explicit round-robin ``repartition(n)`` is never elided by AQE
    and additionally pays a local sort of its input (SPARK-23207's
    sortBeforeRepartition), so at 100 TB — where the scan already yields
    thousands of partitions — it would re-shuffle the whole corpus text
    for nothing. The exchange now exists only when the scan is narrower
    than the cluster (the small-fixture case, where it is what buys
    shingling parallelism); plan shape at the bench SFs is unchanged."""
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() >= sc.defaultParallelism:
        return docs
    return docs.repartition(sc.defaultParallelism)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


@register(
    "q60_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
    doc="Exact dedup, keep-first: one surviving doc_id per distinct text "
    "(hash groupBy; at 100 TB this is one shuffle on a 128-bit text hash).",
)
def q60_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .drop("text")
    )


@register(
    "q61_dedup_content_hash",
    oracle="""
    SELECT sha256(text) AS content_hash,
           min(doc_id)  AS keep_doc_id,
           count(*)     AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Content-hash dedup (sha256): group on the digest, never shuffling "
    "full documents.",
)
def q61_dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

N_HASHES = 8
BAND_SIZE = 2  # 4 bands of 2 hashes
SHINGLE_K = 5


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig): md5-based min-hash per seed, concatenated into
    band signatures.

    Fully row-local: shingle -> digest -> per-seed min entirely inside
    array expressions (one md5 per shingle, `array_min` over a rotated
    view per seed) — NO explode and NO shuffle before banding. The old
    formulation exploded shingles and ran a groupBy(doc_id) with 8 min
    aggregates: correct, but it shuffled one row per (doc, shingle);
    this one shuffles nothing until the (band, sig) bucket groupBy,
    whose input is one row per doc. Per-seed orderings are hex rotations
    of the digest (cheap codegen'd substr+concat instead of N_HASHES md5
    calls; slight inter-seed correlation is an accepted LSH trade-off)."""
    w = F.split("text", " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - SHINGLE_K),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, SHINGLE_K)),
        )
    )

    def rot(h, seed: int):
        if seed == 0:
            return h
        return F.concat(
            F.substring(h, 4 * seed + 1, 32 - 4 * seed), F.substring(h, 1, 4 * seed)
        )

    digests = F.transform(shingles, lambda s: F.md5(s))
    base = _spread(docs.filter(F.size(w) >= SHINGLE_K)).select(
        "doc_id", digests.alias("_d")
    )
    def seed_min(seed: int):
        # NB: a default-arg lambda (lambda d, _s=seed: ...) is wrong here —
        # pyspark passes the element INDEX to two-arg transform lambdas
        return F.array_min(F.transform(F.col("_d"), lambda d: rot(d, seed)))

    mins = base.select(
        "doc_id",
        *[seed_min(seed).alias(f"mh{seed}") for seed in range(N_HASHES)],
    )
    n_bands = N_HASHES // BAND_SIZE
    stack_args = ", ".join(
        f"{b}, concat_ws('|', {', '.join(f'mh{b * BAND_SIZE + j}' for j in range(BAND_SIZE))})"
        for b in range(n_bands)
    )
    return mins.selectExpr(
        "doc_id", f"stack({n_bands}, {stack_args}) AS (band, sig)"
    )


def minhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) MinHash-LSH candidate pairs over any documents
    DataFrame — q62's body, factored so composed pipelines (q155) share
    the exact operator and can't drift from the standalone gate.

    Join-free candidate generation: one shuffle into (band, sig)
    buckets, pairs expanded inside each bucket array — the signature
    pipeline runs once (a self-join would recompute it per side), and
    shuffle volume is O(bucket members), never O(pairs across buckets).
    """
    return _pairs_from_bands(minhash_signatures(docs))


def _pairs_from_bands(bands: DataFrame) -> DataFrame:
    """(doc_a, doc_b) pairs sharing any (band, sig) bucket, expanded
    inside each bucket array — shared by the batch operator and the
    streaming twin's intra-batch stage."""
    buckets = (
        bands.groupBy("band", "sig")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ids"), i + 2, F.size(F.col("ids")) - i - 1
                        ),
                        lambda y: F.struct(
                            x.alias("doc_a"), y.alias("doc_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select(F.col("p.doc_a"), F.col("p.doc_b")).distinct()


def _minhash_cte(src: str = "documents") -> str:
    """The DuckDB twin of minhash_candidate_pairs, CTE chain ending in
    ``cand`` — parameterized on the source relation so composed-pipeline
    oracles (q155) run it over an upstream CTE."""
    return f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM {src}
        WHERE len(string_split(text, ' ')) >= {SHINGLE_K}
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(w[i+1:i+{SHINGLE_K}], ' ') AS s
        FROM (SELECT doc_id, w, unnest(range(0, len(w) - {SHINGLE_K} + 1)) AS i
              FROM docs)
    ),
    mh AS (
        SELECT doc_id, seed,
               min(CASE WHEN seed = 0 THEN h
                        ELSE substring(h, 4 * seed + 1, 32 - 4 * seed)
                             || substring(h, 1, 4 * seed) END) AS mh
        FROM (SELECT doc_id, md5(s) AS h FROM sh)
        CROSS JOIN (SELECT unnest(range({N_HASHES})) AS seed) seeds
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, CAST(seed // {BAND_SIZE} AS INTEGER) AS band,
               string_agg(mh, '|' ORDER BY seed) AS sig
        FROM mh GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.sig = b.sig
                    AND a.doc_id < b.doc_id
    )
"""


_MINHASH_CTE = _minhash_cte()
# the full q62 oracle, shared with the staged streaming twin q168
# (hadoopwebgraph_spark/staged.py) so the two cannot drift (review r16)
_Q62_ORACLE = _MINHASH_CTE + "SELECT doc_a, doc_b FROM cand"


@register(
    "q62_dedup_minhash",
    oracle=_Q62_ORACLE,
    doc="MinHash-LSH near-dup candidates: 8 md5 min-hashes, 4 bands of 2; "
    "pairs sharing any band signature. Candidate generation is an equi-join "
    "on the band bucket (shuffle-bounded, cross-join-free).",
)
def q62_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_candidate_pairs(load(spark, sf_dir, "documents"))


_JACCARD_ORACLE = _MINHASH_CTE + """
    , grams AS (
        SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS g
        FROM (SELECT doc_id, w, unnest(range(0, len(w) - 2)) AS i
              FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                    WHERE len(string_split(text, ' ')) >= 3))
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS i
        FROM cand c
        JOIN grams ga ON ga.doc_id = c.doc_a
        JOIN grams gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
        GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           round(CAST(coalesce(i.i, 0) AS DOUBLE)
                 / (sa.n + sb.n - coalesce(i.i, 0)), 4) AS jaccard
    FROM cand c
    LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
"""


@register(
    "q63_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    doc="Exact word-trigram Jaccard over the MinHash candidate pairs — the "
    "verify stage of the LSH dedup pipeline (intersection via equi-join on "
    "gram, never materializing cross products).",
)
def q63_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    cand = q62_dedup_minhash(spark, sf_dir)

    w = F.split("text", " ")
    grams = _spread(d.filter(F.size(w) >= 3)).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - 3),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, 3)),
                )
            )
        ).alias("g"),
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ga = grams.alias("ga")
    gb = grams.alias("gb")
    inter = (
        cand.join(ga, F.col("ga.doc_id") == F.col("doc_a"))
        .join(
            gb,
            (F.col("gb.doc_id") == F.col("doc_b")) & (F.col("gb.g") == F.col("ga.g")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.coalesce(F.col("i"), F.lit(0)).cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.coalesce(F.col("i"), F.lit(0))),
                4,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_CTE = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    votes AS (
        SELECT doc_id, p,
               CASE WHEN substring(md5(t), p + 1, 1) >= '8'
                    THEN 1 ELSE -1 END AS sgn
        FROM toks CROSS JOIN (SELECT unnest(range(16)) AS p) ps
    ),
    sums AS (SELECT doc_id, p, sum(sgn) AS s FROM votes GROUP BY doc_id, p),
    sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN power(2, p) ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM sums GROUP BY doc_id
    )
"""


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """16-bit SimHash per document: per-bit +/-1 votes from the p-th hex
    digit of each token's md5 (digit >= '8' => 1), then sign. Pure
    built-ins, portable to the oracle."""
    toks = _spread(docs).select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    votes = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("p"),
        F.md5("t").alias("h"),
    ).select(
        "doc_id",
        "p",
        F.when(F.expr("substring(h, p + 1, 1)") >= "8", 1).otherwise(-1).alias("sgn"),
    )
    sums = votes.groupBy("doc_id", "p").agg(F.sum("sgn").alias("s"))
    return sums.groupBy("doc_id").agg(
        F.sum(F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("p"))).otherwise(0.0))
        .cast("bigint")
        .alias("simhash")
    )


@register(
    "q64_dedup_simhash",
    oracle=_SIMHASH_CTE + "SELECT doc_id, simhash FROM sig",
    doc="SimHash signatures (16-bit, token-md5 votes).",
)
def q64_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_signatures(load(spark, sf_dir, "documents"))


@register(
    "q65_simhash_pairs",
    oracle=_SIMHASH_CTE
    + """
    , banded AS (
        SELECT doc_id, simhash,
               simhash // 1024       AS b0,
               (simhash // 32) % 32  AS b1,
               simhash % 32          AS b2
        FROM sig
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS ha, b.simhash AS hb
        FROM banded a JOIN banded b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
        FROM banded a JOIN banded b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
        FROM banded a JOIN banded b ON a.b2 = b.b2 AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(ha, hb)) <= 2
    """,
    doc="Near-dup pairs with SimHash Hamming distance <= 2, found by "
    "pigeonhole banding (6/5/5-bit bands -> 3 equi-joins) instead of an "
    "O(n^2) cross join — the scale path for signature matching.",
)
def q65_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = simhash_signatures(load(spark, sf_dir, "documents"))
    banded = sig.select(
        "doc_id",
        "simhash",
        (F.col("simhash") / 1024).cast("bigint").alias("b0"),
        ((F.col("simhash") / 32).cast("bigint") % 32).alias("b1"),
        (F.col("simhash") % 32).alias("b2"),
    )
    pairs = None
    for b in ("b0", "b1", "b2"):
        a = banded.alias("a")
        c = banded.alias("c")
        p = a.join(
            c,
            (F.col(f"a.{b}") == F.col(f"c.{b}"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("c.simhash").alias("hb"),
        )
        pairs = p if pairs is None else pairs.union(p)
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.distinct()
        .filter(ham <= 2)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
    )


_CLUSTER_ORACLE = _MINHASH_CTE + """
    , sym AS (
        SELECT doc_a AS a, doc_b AS b FROM cand
        UNION
        SELECT doc_b, doc_a FROM cand
    ),
    reach AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    members AS (
        SELECT a AS node, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a
    )
    SELECT cluster_id   AS keep_doc_id,
           count(*)     AS n_members
    FROM members
    GROUP BY cluster_id
"""


@register(
    "q66_dedup_clusters",
    oracle="WITH RECURSIVE " + _CLUSTER_ORACLE.lstrip().removeprefix("WITH"),
    doc="Near-dup cluster resolution: connected components over the "
    "MinHash candidate-pair graph (iterative min-label propagation on "
    "Spark), keep-first representative + cluster size per component. The "
    "oracle computes the same fixpoint as a DuckDB recursive-CTE "
    "transitive closure — certifying the iterative DataFrame loop "
    "value-for-value.",
)
def q66_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.graph_algos import connected_components

    cand = q62_dedup_minhash(spark, sf_dir)
    edges = cand.select(
        F.col("doc_a").cast("long").alias("src"),
        F.col("doc_b").cast("long").alias("dst"),
    )
    cc = connected_components(edges)
    return (
        cc.groupBy(F.col("component").alias("keep_doc_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


_KEEP_BEST_ORACLE = "WITH RECURSIVE " + _MINHASH_CTE.lstrip().removeprefix("WITH") + """
    , sym AS (
        SELECT doc_a AS a, doc_b AS b FROM cand
        UNION
        SELECT doc_b, doc_a FROM cand
    ),
    reach AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    members AS (
        SELECT a AS node, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a
    ),
    labeled AS (
        SELECT d.doc_id,
               coalesce(m.cluster_id, d.doc_id) AS cluster_id,
               length(d.text) AS n_chars
        FROM documents d LEFT JOIN members m ON m.node = d.doc_id
    )
    SELECT arg_max(doc_id, (CAST(n_chars AS BIGINT) << 33) - doc_id)
               AS keep_doc_id,
           CAST(count(*) AS BIGINT)  AS n_members,
           CAST(max(n_chars) AS INTEGER) AS kept_chars
    FROM labeled GROUP BY cluster_id
"""


@register(
    "q134_dedup_keep_best",
    oracle=_KEEP_BEST_ORACLE,
    doc="Quality-aware near-dup resolution (the production corpus-dedup "
    "policy): MinHash candidate pairs -> connected components -> keep "
    "the LONGEST member of each cluster (common heuristic: the longest "
    "near-duplicate usually subsumes the others), min doc_id on ties; "
    "docs outside every cluster keep themselves. The argmax key is one "
    "BIGINT ((n_chars<<33) - doc_id, exact for n_chars < 2^30 and "
    "doc_id < 2^33) so the per-cluster pick is HashAggregate max_by in "
    "Spark and the identical integer arg_max in DuckDB — no tuple "
    "comparators, no float ties. Scale: candidates are band-bucket "
    "equi-joins (q62), components shuffle (long,long) labels (g12), "
    "the final pick is one partial-agg'd groupBy over narrow rows.",
)
def q134_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.graph_algos import connected_components

    cand = q62_dedup_minhash(spark, sf_dir)
    cc = connected_components(
        cand.select(
            F.col("doc_a").cast("long").alias("src"),
            F.col("doc_b").cast("long").alias("dst"),
        )
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    # shuffle-hash: both sides are one narrow row per doc — a sort-merge
    # join would sort the full corpus projection for nothing
    labeled = docs.join(cc.hint("shuffle_hash"), docs.doc_id == cc.node, "left").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    key = (F.col("n_chars").cast("long") * F.lit(1 << 33).cast("long")) - F.col(
        "doc_id"
    )
    return labeled.groupBy("cluster_id").agg(
        F.max_by("doc_id", key).alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.max("n_chars").alias("kept_chars"),
    ).select("keep_doc_id", "n_members", "kept_chars")


# ---------------------------------------------------------------------------
# exact substring (duplicated n-gram span) detection
# ---------------------------------------------------------------------------

_GRAM = 8  # tokens per gram; Lee et al. use 50 on BPE tokens — same machinery


@register(
    "q119_substring_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t
        FROM documents WHERE text <> ''
    ),
    sized AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= {_GRAM}),
    pos AS (SELECT doc_id, n, t, unnest(range(1, n - {_GRAM - 2})) AS p FROM sized),
    grams AS (
        SELECT doc_id, n, p,
               md5(array_to_string(t[p:p + {_GRAM - 1}], ' ')) AS g
        FROM pos
    ),
    counted AS (
        SELECT doc_id, n, count(*) OVER (PARTITION BY g) AS cnt FROM grams
    )
    SELECT doc_id,
           CAST(max(n) - {_GRAM - 1} AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
           CAST((10000 * sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END))
                // (max(n) - {_GRAM - 1}) AS BIGINT) AS dup_ratio_bp
    FROM counted
    GROUP BY doc_id
    HAVING sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) > 0
    """,
    doc="Exact duplicated-substring detection (the Lee et al. 'Deduplicating "
    "Training Data' span-dedup shape): every 8-token gram of every document, "
    "hashed; a gram occurring >= 2 times ANYWHERE in the corpus marks its "
    "position as duplicated text. Per doc: gram count, duplicated-gram "
    "count, duplicated ratio in integer basis points (integer division on "
    "both engines — no float round, so the driver hash cannot tie-break "
    "differently). One shuffle on the gram hash (window count — "
    "no self-join), one on doc_id; gram strings never shuffle, only their "
    "md5. At 100 TB this is the standard alternative to a distributed "
    "suffix array: candidate spans exact, memory bounded per partition.",
)
def q119_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _spread(load(spark, sf_dir, "documents")).filter(F.col("text") != "")
    sized = d.select(
        "doc_id", F.split("text", " ").alias("t")
    ).withColumn("n", F.size("t")).filter(F.col("n") >= _GRAM)
    pos = sized.select(
        "doc_id",
        "n",
        "t",
        F.explode(F.sequence(F.lit(1), F.col("n") - F.lit(_GRAM - 1))).alias("p"),
    )
    grams = pos.select(
        "doc_id",
        "n",
        F.md5(F.array_join(F.slice("t", F.col("p"), _GRAM), " ")).alias("g"),
    )
    counted = grams.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    dup = F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0))
    return (
        counted.groupBy("doc_id")
        .agg(
            (F.max("n") - F.lit(_GRAM - 1)).cast("bigint").alias("n_grams"),
            dup.alias("n_dup_grams"),
        )
        # integer-exact basis points: `div` is Spark's integer division,
        # `//` DuckDB's — identical results, no float rounding anywhere.
        .withColumn(
            "dup_ratio_bp",
            F.expr("CAST((10000 * n_dup_grams) div n_grams AS BIGINT)"),
        )
        .filter(F.col("n_dup_grams") > 0)
    )


# ---------------------------------------------------------------------------
# string-similarity (edit distance) join
# ---------------------------------------------------------------------------


@register(
    "q122_editdist_join",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           levenshtein(a.p_name, b.p_name) AS distance
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
      AND levenshtein(a.p_name, b.p_name) <= 2
    """,
    doc="Blocked string-similarity join: part-name pairs within edit "
    "distance 2, blocked by p_brand so the pair space is per-block "
    "bounded (never a global cross join), pre-filtered by the length-"
    "difference lower bound |len(a)-len(b)| <= d before any edit-distance "
    "work, then the exact Levenshtein filter with an early-exit threshold "
    "(Spark's 3-arg levenshtein stops once the distance exceeds d). The "
    "equi-join on the block key is one shuffle; AQE splits skewed blocks.",
)
def q122_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_brand").alias("brand"),
        F.col("p_name").alias("name_b"),
    )
    pairs = a.join(b, "brand").filter(
        (F.col("part_a") < F.col("part_b"))
        & (F.abs(F.length("name_a") - F.length("name_b")) <= 2)
    )
    # 3-arg levenshtein: returns -1 as soon as the distance exceeds the
    # threshold — O(d*min(m,n)) instead of O(m*n) per pair
    d = F.levenshtein("name_a", "name_b", 2)
    return (
        pairs.withColumn("distance", d)
        .filter(F.col("distance") >= 0)
        .select("part_a", "part_b", "distance")
    )


# ---------------------------------------------------------------------------
# incremental (snapshot-vs-batch) dedup
# ---------------------------------------------------------------------------


@register(
    "q128_incremental_dedup",
    oracle="""
    WITH prev AS (
        SELECT sha256(coalesce(text, '')) AS h FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
              IN ('0','1','2','3','4','5','6','7')
    ),
    batch AS (
        SELECT doc_id, source, sha256(coalesce(text, '')) AS h FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
              NOT IN ('0','1','2','3','4','5','6','7')
    ),
    survivors AS (
        SELECT b.doc_id, b.source FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM prev p WHERE p.h = b.h)
    )
    SELECT source,
           count(*) AS n_new,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM survivors
    GROUP BY source
    """,
    doc="Incremental corpus-refresh dedup: an incoming batch (md5 band "
    "8-f of documents, standing in for today's crawl) is deduped against "
    "the existing corpus snapshot (band 0-7) by content hash — one "
    "left-anti join on sha256(text), the recurring production shape "
    "where a full re-dedup of 100 TB per ingest would be absurd. Only "
    "the 256-bit digests shuffle, never document text; at scale the "
    "snapshot side is a bucketed digest table so the anti-join "
    "co-locates without reshuffling the corpus. Output: surviving new "
    "docs per source.",
)
def q128_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    band = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    prev_bands = list("01234567")
    # NULL text hashes as '' (identically in the oracle and the streaming
    # twin _dedup_one_batch) — no NULL join keys, defined dedup semantics
    h = F.sha2(F.coalesce(F.col("text"), F.lit("")), 256)
    prev = d.filter(band.isin(prev_bands)).select(h.alias("h"))
    batch = d.filter(~band.isin(prev_bands)).select(
        "doc_id", "source", h.alias("h")
    )
    survivors = batch.join(prev, "h", "left_anti")
    return survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_new"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


def _dedup_one_batch(
    batch_df: DataFrame,
    batch_id: int,
    digests: str,
    out_dir: str,
    project=None,
):
    """One micro-batch of the incremental dedup (module-level so replay
    semantics are unit-testable). Idempotent under batch replay: both
    writes target a ``batch_id=<id>`` partition directory with
    mode("overwrite"), so a crash between the two writes followed by a
    checkpoint replay REPLACES the partial output instead of appending a
    duplicate — the standard foreachBatch idempotency pattern. The
    snapshot read excludes the in-flight ``batch_id`` partition, so a
    replay that happens AFTER the digest write still sees exactly the
    pre-batch snapshot instead of anti-joining the batch against itself
    (which would silently erase it).

    NULL text hashes as the empty string (coalesce) so no NULL join keys
    exist: a NULL-text row dedups like an empty document instead of
    silently vanishing through a never-matching equi-join."""
    import os as _os

    b = batch_df.withColumn("h", F.sha2(F.coalesce(F.col("text"), F.lit("")), 256))
    # collapse within-batch duplicates deterministically: one row per
    # digest (keep-first doc_id); dropDuplicates also collapses exact
    # repeats of the SAME (h, doc_id) row (producer retries)
    w_first = b.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    b = b.dropDuplicates(["h", "doc_id"]).join(w_first, ["h", "doc_id"], "left_semi")
    spark_l = b.sparkSession
    # Snapshot existence is probed by ATTEMPTING the read, not by a
    # driver-local os.path check (snapshot_dir may be HDFS/S3 where the
    # local check is always False and would silently skip dedup forever).
    # Only a genuinely absent path means "first batch"; any OTHER read
    # failure (corrupt footer, transient FS error) must propagate so the
    # checkpoint retries rather than re-admitting known duplicates.
    from pyspark.errors import AnalysisException

    prev = None
    try:
        # Crash-replay safety: a crash AFTER the digest write but BEFORE
        # the batch commit replays this batch_id with its own digests
        # already in the snapshot — anti-joining against them would empty
        # the batch and the overwrite below would destroy it. Partition
        # discovery exposes batch_id; exclude the in-flight batch.
        prev = (
            spark_l.read.parquet(digests)
            .filter(F.col("batch_id") != F.lit(batch_id))
            .select("h")
        )
        prev.schema  # force analysis so a missing path raises HERE
    except AnalysisException as exc:
        get_cls = getattr(exc, "getCondition", None) or exc.getErrorClass
        cls = get_cls() or str(exc)
        if "PATH_NOT_FOUND" in cls or "UNABLE_TO_INFER_SCHEMA" in cls:
            prev = None  # first batch ever — nothing to dedup against
        else:
            raise
    fresh = b if prev is None else b.join(prev, "h", "left_anti")
    fresh.persist()
    try:
        out = fresh.drop("h") if project is None else project(fresh.drop("h"))
        out.write.mode("overwrite").parquet(
            _os.path.join(out_dir, f"batch_id={batch_id}")
        )
        fresh.select("h").write.mode("overwrite").parquet(
            _os.path.join(digests, f"batch_id={batch_id}")
        )
    finally:
        fresh.unpersist()


def incremental_dedup_stream(
    spark: SparkSession,
    incoming_dir: str,
    snapshot_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """Streaming corpus-refresh dedup (the q128 shape as an always-on
    ingestion job): watch ``incoming_dir`` for new document files; each
    micro-batch is content-hashed, left-anti joined against the persisted
    digest snapshot at ``snapshot_dir``, the survivors written to
    ``out_dir`` AND their digests to the snapshot — so later batches
    dedup against everything already accepted. Within-batch duplicates
    collapse to the first doc_id; batch replay after a crash is
    idempotent (see :func:`_dedup_one_batch` — per-batch partition
    overwrite, not blind append).

    Scale design: the snapshot holds only 32-byte digests (~0.03% of a
    text corpus), the per-batch anti-join shuffles digests, never text;
    at 100 TB the snapshot is a bucketed table so the join co-locates.
    Returns the StreamingQuery.

    ``schema``: declared schema for the incoming files; inferred from
    files already present when omitted. An empty watch dir with no
    declared schema RAISES (same round-10 hardening as
    ``layout.partitioned_ingest_stream`` — a guessed documents shape
    would silently null/drop mismatched columns on every later file)."""
    import os as _os

    file_schema = infer_watch_schema(
        spark, incoming_dir, "incremental_dedup_stream", schema
    )
    stream = spark.readStream.schema(file_schema).parquet(incoming_dir)
    digests = _os.path.join(snapshot_dir, "digests")

    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: _dedup_one_batch(
                batch_df, batch_id, digests, out_dir
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _neardup_one_batch(
    batch_df: DataFrame, batch_id: int, sigs_dir: str, out_dir: str
):
    """One micro-batch of the incremental MinHash near-dup (module-level
    so replay semantics are unit-testable). Emits every candidate pair
    the batch creates: intra-batch pairs via the shared
    :func:`_pairs_from_bands` bucket expansion, plus cross-batch pairs
    from an equi-join of the batch's signatures against the persisted
    signature snapshot. The union of all batch outputs equals
    q62_dedup_minhash on the union corpus EXACTLY: a pair's two docs fix
    the single batch that emits it (the later one), and per-batch
    distinct collapses multi-band repeats.

    Idempotent under checkpoint replay, the _dedup_one_batch pattern:
    both writes overwrite a ``batch_id=<id>`` partition, and the
    snapshot read excludes the in-flight batch_id so a replay after the
    signature write doesn't pair the batch against itself (every
    intra-batch pair would silently double as a cross pair)."""
    import os as _os

    from pyspark.errors import AnalysisException

    spark_l = batch_df.sparkSession
    new_sigs = minhash_signatures(batch_df).persist()
    try:
        prev = None
        try:
            prev = (
                spark_l.read.parquet(sigs_dir)
                .filter(F.col("batch_id") != F.lit(batch_id))
                .select("doc_id", "band", "sig")
            )
            prev.schema  # force analysis so a missing path raises HERE
        except AnalysisException as exc:
            get_cls = getattr(exc, "getCondition", None) or exc.getErrorClass
            cls = get_cls() or str(exc)
            if "PATH_NOT_FOUND" in cls or "UNABLE_TO_INFER_SCHEMA" in cls:
                prev = None  # first batch ever — no history to pair with
            else:
                raise
        pairs = _pairs_from_bands(new_sigs)
        if prev is not None:
            cross = (
                new_sigs.select(
                    F.col("doc_id").alias("nd"), "band", "sig"
                )
                .join(
                    prev.select(F.col("doc_id").alias("pd"), "band", "sig"),
                    ["band", "sig"],
                )
                .filter(F.col("pd") != F.col("nd"))
                .select(
                    F.least("pd", "nd").alias("doc_a"),
                    F.greatest("pd", "nd").alias("doc_b"),
                )
                .distinct()
            )
            pairs = pairs.union(cross).distinct()
        pairs.write.mode("overwrite").parquet(
            _os.path.join(out_dir, f"batch_id={batch_id}")
        )
        new_sigs.write.mode("overwrite").parquet(
            _os.path.join(sigs_dir, f"batch_id={batch_id}")
        )
    finally:
        new_sigs.unpersist()


def incremental_neardup_stream(
    spark: SparkSession,
    incoming_dir: str,
    snapshot_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """Streaming MinHash near-dup (q62's shape as an always-on ingestion
    job, the q128/incremental_dedup_stream pattern one level up): watch
    ``incoming_dir`` for new document files; each micro-batch computes
    band signatures with the SHARED minhash_signatures pipeline, emits
    candidate pairs within the batch and against every previously
    ingested document, and appends its signatures to the snapshot.

    Scale design: the snapshot holds (doc_id, band, sig) rows — a few
    dozen bytes per doc, never text; the cross-batch stage is an
    equi-join on (band, sig), so per-batch cost is bounded by bucket
    collisions, not corpus size. At 100 TB, bucket the snapshot by
    (band, sig) so the join co-locates. Returns the StreamingQuery.

    ``schema``: declared schema for incoming files; an empty watch dir
    with no declared schema RAISES (round-10 hardening, same as the
    other file streams)."""
    import os as _os

    file_schema = infer_watch_schema(
        spark, incoming_dir, "incremental_neardup_stream", schema
    )
    stream = spark.readStream.schema(file_schema).parquet(incoming_dir)
    sigs = _os.path.join(snapshot_dir, "sigs")

    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: _neardup_one_batch(
                batch_df, batch_id, sigs, out_dir
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def incremental_curation_stream(
    spark: SparkSession,
    incoming_dir: str,
    snapshot_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """The q154 curation pipeline as an always-on ingestion job: each
    micro-batch is exact-deduped against the persisted digest snapshot
    (the incremental_dedup_stream machinery, verbatim), then the batch's
    survivors run the SHARED quality-gate + md5-band split tail
    (llmprep._manifest_tail — the same helper q154/q155 compose), and
    the (doc_id, split, n_words) manifest lands per batch_id partition.

    Both composed stages are row-local per document (quality signals
    aggregate only within a doc; the split is a pure doc_id hash), so
    the union of batch manifests equals q154 on the union corpus
    whenever duplicate groups keep the same representative — identical
    to the arrival-order contract incremental_dedup_stream already
    documents (keep-FIRST-ARRIVAL vs the batch op's keep-min-id; equal
    when ids arrive in order, asserted in tests with ordered chunks).
    Replay-idempotent for the same reasons as _dedup_one_batch."""
    import os as _os

    from .llmprep import _manifest_tail

    file_schema = infer_watch_schema(
        spark, incoming_dir, "incremental_curation_stream", schema
    )
    stream = spark.readStream.schema(file_schema).parquet(incoming_dir)
    digests = _os.path.join(snapshot_dir, "digests")

    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: _dedup_one_batch(
                batch_df, batch_id, digests, out_dir, project=_manifest_tail
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


_LEAKAGE_SPLIT_ORACLE = (
    "WITH RECURSIVE " + _MINHASH_CTE.lstrip().removeprefix("WITH") + """
    , sym AS (
        SELECT doc_a AS a, doc_b AS b FROM cand
        UNION
        SELECT doc_b, doc_a FROM cand
    ),
    reach AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    members AS (
        SELECT a AS node, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a
    ),
    labeled AS (
        SELECT d.doc_id,
               coalesce(m.cluster_id, d.doc_id) AS cluster_id,
               d.n_chars
        FROM documents d LEFT JOIN members m ON m.node = d.doc_id
    )
    SELECT CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
                     IN ('c','d') THEN 'val'
                WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
                     IN ('e','f') THEN 'test'
                ELSE 'train' END               AS split,
           CAST(count(*) AS BIGINT)            AS n_docs,
           CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(sum(n_chars) AS BIGINT)        AS total_chars
    FROM labeled
    GROUP BY 1
"""
)


@register(
    "q139_leakage_safe_split",
    oracle=_LEAKAGE_SPLIT_ORACLE,
    doc="Leakage-safe train/val/test split: documents are assigned to "
    "splits by the md5 hash band of their NEAR-DUP CLUSTER representative "
    "(MinHash candidates -> connected components; singletons represent "
    "themselves), so two near-duplicate documents can never land in "
    "different splits — the contamination guarantee a doc-level hash "
    "split (q87) cannot give. Same 75/12.5/12.5 bands as q87 and the "
    "same corpus-growth stability (a cluster's representative is its min "
    "doc_id, which only changes if an older duplicate appears). Scale: "
    "banded candidate equi-joins (q62) + label propagation (g12) + one "
    "narrow left join and a 3-row rollup; the no-straddling invariant is "
    "unit-tested over every candidate pair.",
)
def q139_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.graph_algos import connected_components
    from .sampling import TEST_DIGITS, VAL_DIGITS

    cand = q62_dedup_minhash(spark, sf_dir)
    cc = connected_components(
        cand.select(
            F.col("doc_a").cast("long").alias("src"),
            F.col("doc_b").cast("long").alias("dst"),
        )
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = docs.join(
        cc.hint("shuffle_hash"), docs.doc_id == cc.node, "left"
    ).select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    d = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 1)
    split = (
        F.when(d.isin(*VAL_DIGITS), F.lit("val"))
        .when(d.isin(*TEST_DIGITS), F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return labeled.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# prefix-filtered set-similarity join (exact Jaccard, PPJoin-style)
# ---------------------------------------------------------------------------

JACCARD_TAU_BP = 9000  # tau = 0.90 in basis points


@register(
    "q142_prefix_jaccard_join",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text <> ''
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS i
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT da AS doc_a, db AS doc_b,
           CAST((10000 * i) // (sa.n + sb.n - i) AS BIGINT) AS jaccard_bp
    FROM inter
    JOIN sizes sa ON sa.doc_id = da
    JOIN sizes sb ON sb.doc_id = db
    WHERE (10000 * i) // (sa.n + sb.n - i) >= {JACCARD_TAU_BP}
    """,
    doc="Exact set-similarity self-join (token-set Jaccard >= 0.90) with "
    "PPJoin-style prefix filtering. Tokens are globally ordered rare-first "
    "(by document frequency, then token); each doc only indexes its first "
    "|T| - ceil(tau*|T|) + 1 tokens, and candidate pairs come from an "
    "equi-join on those prefix tokens — the classic completeness guarantee "
    "(Xiao et al., PPJoin, WWW'08): any pair with Jaccard >= tau must "
    "share a prefix token, so no true pair is lost. A size filter "
    "(tau*|A| <= |B|) prunes further before verification; verification is "
    "row-local array_intersect on the carried token arrays — no extra "
    "shuffle per pair beyond the two doc_id lookups. The ORACLE is the "
    "brute-force all-pairs join, so the hash-exact match PROVES the filter "
    "lossless on the fixture, not just plausible. Similarity is emitted in "
    "integer basis points ((10000*i) div (union)) — floor-threshold "
    "compare is exactly equivalent to J >= tau and no float crosses "
    "engines. Scale: prefix tokens are by construction the RAREST tokens "
    "of each doc, so the candidate join key distribution is anti-skewed "
    "(stopwords never become join keys); the per-doc token-set table "
    "shuffles once on doc_id for verification. At 100 TB the df ranking "
    "table is vocabulary-sized and broadcast.",
)
def q142_prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: the token-set subtree feeds the candidate prefixes AND both
    # verification sides — unpersisted, Spark re-runs the whole
    # explode+df-join+sort pipeline ~4x (Python DataFrame reuse does NOT
    # dedupe plan subtrees, the r1 minhash lesson; measured 47s -> 4.6s
    # at sf0.1). Process-lifetime cache, the q137 tf-table precedent.
    sets = _jaccard_token_sets(spark, sf_dir).persist()
    cand = _prefix_filter_candidates(sets)
    a = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("na"),
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("nb"),
    )
    i = F.size(F.array_intersect("toks_a", "toks_b")).cast("bigint")
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("i", i)
        .withColumn(
            "jaccard_bp", F.expr("CAST((10000 * i) div (na + nb - i) AS BIGINT)")
        )
        .filter(F.col("jaccard_bp") >= JACCARD_TAU_BP)
        .select("doc_a", "doc_b", "jaccard_bp")
    )


def _jaccard_token_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks, n): per-doc DISTINCT token array sorted rare-first by
    (global df, token), with n = |set|. The rare-first order is what makes
    the prefix both small AND selective."""
    d = load(spark, sf_dir, "documents").filter(F.col("text") != "")
    toks = _spread(d).select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = toks.join(F.broadcast(df), "tok")
    sets = ranked.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("tok").alias("tok")))
            ),
            lambda x: x["tok"],
        ).alias("toks")
    )
    return sets.withColumn("n", F.size("toks").cast("bigint"))


def _prefix_filter_candidates(sets: DataFrame) -> DataFrame:
    """Distinct (doc_a, doc_b) pairs sharing at least one PREFIX token,
    pre-pruned by the Jaccard size bound tau*max <= min. Prefix length
    p = n - ceil(tau*n) + 1, in pure integer arithmetic over basis
    points: ceil(tau*n) = (TAU_BP*n + 9999) div 10000 — exact for any
    TAU_BP, not just multiples of 1000."""
    p = F.expr(
        f"CAST(n - ({JACCARD_TAU_BP} * n + 9999) div 10000 + 1 AS INT)"
    )
    pref = sets.select(
        "doc_id", "n", F.explode(F.slice("toks", 1, p)).alias("tok")
    )
    a = pref.select(
        F.col("tok"), F.col("doc_id").alias("doc_a"), F.col("n").alias("na")
    )
    b = pref.select(
        F.col("tok"), F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")
    )
    return (
        a.join(b, "tok")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # J >= tau forces tau*|A| <= |B| and tau*|B| <= |A|
            & (F.col("na") * JACCARD_TAU_BP <= F.col("nb") * 10000)
            & (F.col("nb") * JACCARD_TAU_BP <= F.col("na") * 10000)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# prefix-filtered containment join (eval-in-train decontamination)
# ---------------------------------------------------------------------------

CONTAIN_TAU_BP = 9500  # containment threshold |A ∩ B| / |A| >= 0.95


@register(
    "q147_containment_decontaminate",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text <> ''
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_eval, b.doc_id AS doc_train,
               CAST(count(*) AS BIGINT) AS i
        FROM toks a JOIN toks b ON a.tok = b.tok
        WHERE a.doc_id < 50 AND b.doc_id >= 50
        GROUP BY 1, 2
    )
    SELECT doc_eval, doc_train,
           CAST((10000 * i) // sa.n AS BIGINT) AS containment_bp
    FROM inter JOIN sizes sa ON sa.doc_id = doc_eval
    WHERE (10000 * i) // sa.n >= {CONTAIN_TAU_BP}
    """,
    doc="Containment-decontamination join: flag (eval, train) pairs where "
    "the train document contains >= 95% of the eval document's token SET "
    "— the asymmetric cousin of q142's Jaccard join and the "
    "set-containment form of q98's shingle overlap (which flags ANY "
    "single shared shingle; this flags near-superset leakage with a "
    "per-pair ratio). Prefix filter for containment: if "
    "|A∩B| >= tau*|A| then A misses at most (1-tau)*|A| tokens of B, so "
    "any fixed (|A| - ceil(tau*|A|) + 1)-subset of A intersects B — "
    "probing only each eval doc's RAREST 1-3 tokens (rare-first global "
    "order, q142's ranking) against the train postings is complete; a "
    "size bound (|B| >= ceil(tau*|A|)) prunes before verification, and "
    "verification is row-local array_intersect. Integer basis points "
    "throughout. The brute-force oracle PROVES the filter lossless on "
    "the fixture. Scale: the eval prefix table is (eval docs x <=3) rows "
    "— broadcast — so the candidate join streams the train postings "
    "map-side with no shuffle of the corpus; rare-first probes keep "
    "posting fan-out minimal (stopwords are never probed).",
)
def q147_containment_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # doc_id < 50 plays the held-out eval set (llmprep.N_EVAL_DOCS).
    # persist: the subtree feeds eval prefixes, eval arrays and the train
    # side — see q142's note on plan-subtree duplication.
    sets = _jaccard_token_sets(spark, sf_dir).persist()
    ev = sets.filter(F.col("doc_id") < 50)
    tr = sets.filter(F.col("doc_id") >= 50)
    p = F.expr(f"CAST(n - ({CONTAIN_TAU_BP} * n + 9999) div 10000 + 1 AS INT)")
    ev_prefix = ev.select(
        F.col("doc_id").alias("doc_eval"),
        F.col("n").alias("na"),
        F.explode(F.slice("toks", 1, p)).alias("tok"),
    )
    tr_toks = tr.select(
        F.col("doc_id").alias("doc_train"),
        F.col("n").alias("nb"),
        F.explode("toks").alias("tok"),
    )
    cand = (
        tr_toks.join(F.broadcast(ev_prefix), "tok")
        # i <= |B| and i >= tau*|A| force |B| >= ceil(tau*|A|)
        .filter(F.col("nb") * 10000 >= F.lit(CONTAIN_TAU_BP) * F.col("na"))
        .select("doc_eval", "doc_train")
        .distinct()
    )
    a = ev.select(F.col("doc_id").alias("doc_eval"), F.col("toks").alias("ta"),
                  F.col("n").alias("na"))
    b = tr.select(F.col("doc_id").alias("doc_train"), F.col("toks").alias("tb"))
    return (
        cand.join(F.broadcast(a), "doc_eval")
        .join(b, "doc_train")
        .withColumn("containment_bp",
                    F.expr("CAST((10000 * size(array_intersect(ta, tb)))"
                           " div na AS BIGINT)"))
        .filter(F.col("containment_bp") >= CONTAIN_TAU_BP)
        .select("doc_eval", "doc_train", "containment_bp")
    )


# ---------------------------------------------------------------------------
# Registered round 17 (staged + dry-run-validated in r16; VERDICT r16
# item #3): q168 — the MinHash-LSH near-dup operator maintained
# INCREMENTALLY over a real document stream (the g45 gate shape).
# q128 already covers streaming
# EXACT dedup (content-hash anti-join); this is its near-dup
# counterpart, the recurring production shape where today's crawl must
# be deduped against the whole corpus without recomputing a single old
# signature.
#
# State is the signature store itself — the accumulated (doc_id, band,
# sig) table (N_HASHES/BAND_SIZE rows per doc, independent of text
# size) plus the pairs found so far. Per batch:
#   1. signatures for the NEW docs only (minhash_signatures — q62's
#      exact operator, shared so the twin cannot drift);
#   2. new-vs-old pairs: ONE equi-join of the batch's bands against the
#      store on (band, sig) — at scale the store is bucketed by
#      (band, sig) so the probe co-locates; shuffle volume is the
#      batch's bands, never the corpus;
#   3. new-vs-new pairs: the shared intra-batch bucket expansion
#      (_pairs_from_bands);
#   4. append the batch's bands to the store.
#
# Rebuild identity (what makes it hash-oracleable by q62's oracle
# VERBATIM): the carve is on doc_id, so a doc's full signature lands in
# one batch. For any pair (a, b) sharing a bucket, let b arrive in the
# later (or same) batch: if same batch the intra stage emits it; else
# a's bands are already ALL in the store when b's batch probes, so the
# cross join emits it. A pair is never emitted twice across batches
# (its partner is old XOR new), and never missed — so the accumulated
# set equals the batch operator's pair set exactly, for ANY carve.
# ---------------------------------------------------------------------------

_Q168_BATCHES = 3


def _minhash_fold_batch(state: dict, batch: DataFrame) -> None:
    """One incremental near-dup step: probe the signature store with the
    batch's bands, emit new pairs, append the bands."""
    bands_b = minhash_signatures(batch).localCheckpoint(eager=True)
    intra = _pairs_from_bands(bands_b)
    if "bands" not in state:
        state["bands"] = bands_b
        state["pairs"] = intra.localCheckpoint(eager=True)
        return
    old = state["bands"]
    cross = (
        bands_b.alias("n")
        .join(old.alias("o"), ["band", "sig"])
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    state["pairs"] = (
        state["pairs"]
        .union(intra.union(cross).distinct())
        .localCheckpoint(eager=True)
    )
    state["bands"] = old.union(bands_b).localCheckpoint(eager=True)


def stream_minhash_pairs(
    docs: DataFrame, n_batches: int = _Q168_BATCHES,
    work_dir: str | None = None,
) -> DataFrame:
    """q62's candidate pairs computed by DRIVING a file-source
    foreachBatch stream over a doc_id carve of ``docs`` (machinery in
    streaming/file_fold.py). Row-identical to the batch operator for
    ANY carve — see the rebuild-identity note above."""
    from ..streaming.file_fold import drive_file_stream_fold

    # NULL doc_ids are dropped up front: the batch operator silently
    # drops them too (collect_list in the bucket expansion skips
    # nulls), but the cross-stage's least/greatest would resolve a
    # null-vs-x probe hit to a bogus (x, x) self-pair and break the
    # row-identical contract (review r16, pass 4).
    d = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .filter(F.col("doc_id").isNotNull())
        .localCheckpoint(eager=True)
    )
    state = drive_file_stream_fold(
        d, "doc_id long, text string", ["doc_id"], n_batches,
        _minhash_fold_batch, work_dir,
    )
    if "pairs" not in state:
        # empty corpus: no files staged, no micro-batch fires — the
        # batch twin's (empty) pair set (the g45 empty rule; reachable
        # only on empty input, file_fold raises otherwise)
        return minhash_candidate_pairs(d)
    # cross-batch duplicates are impossible by construction (partner is
    # old xor new); the final distinct only collapses same-batch
    # multi-band hits already collapsed per stage — kept as a cheap
    # safety net on the accumulated union
    return state["pairs"].distinct()


@register(
    "q168_stream_minhash_dedup",
    oracle=_Q62_ORACLE,
    doc="MinHash-LSH near-dup detection maintained INCREMENTALLY over "
    "a real foreachBatch document stream (registered r17; staged + "
    "validated r16) — the near-dup counterpart of q128's streaming "
    "exact dedup, and the recurring production shape where today's "
    "crawl is deduped against the whole corpus without recomputing a "
    "single old signature. State is the accumulated (doc_id, band, "
    "sig) signature store (N_HASHES/BAND_SIZE rows per doc, "
    "independent of text size) plus the pairs found so far; per batch "
    "the NEW docs' signatures probe the store with ONE equi-join on "
    "(band, sig) — at scale the store is bucketed on the join key so "
    "the probe co-locates, and shuffle volume is the batch's bands, "
    "never the corpus. Hash-oracled by q62's oracle VERBATIM via "
    "rebuild identity: the doc_id carve lands a doc's full signature "
    "in one batch, a bucket-sharing pair's partner is old XOR new "
    "(cross-probe XOR intra-batch), so the accumulated pair set "
    "equals the batch operator's exactly, for ANY carve "
    "(carve-independence pinned 2-vs-5 batches in test_round16_ops).",
)
def q168_stream_minhash_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return stream_minhash_pairs(load(spark, sf_dir, "documents"))
