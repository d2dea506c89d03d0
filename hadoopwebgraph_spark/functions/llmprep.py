"""Training-corpus preparation operators — the curation verbs a large
LLM data pipeline runs after dedup and before assembly (SURVEY.md §2
Tier C extensions): eval-set decontamination, PII scrubbing, repetition
detection, and temperature-based source mixture sampling.

Scale design:
- Decontamination is the canonical n-gram overlap job: explode both
  sides to distinct shingles and equi-join on the shingle — one shuffle
  keyed on the n-gram, never a doc x doc comparison. The eval side is
  tiny in practice (benchmarks), so at 100 TB it broadcasts and the
  train side streams through map-side.
- PII scrub and repetition are narrow per-row projections / one
  aggregation over exploded tokens — embarrassingly parallel.
- Mixture sampling reuses the repo's md5-band determinism (sampling.py):
  membership is a pure function of (doc_id, source counts), so re-runs,
  repartitions and engine changes agree bit-for-bit; the only wide stage
  is the per-source count, whose result is a broadcast-size map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import track
from ..catalog import load
from ..registry import register
from .text import STOPWORDS as _STOPWORDS
from .text import _STOP_SQL

N_EVAL_DOCS = 50  # doc_id < 50 plays the held-out eval set
SHINGLE = 8  # decontamination n-gram width (words)

EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+"
PHONE_RE = r"\+1-555-[0-9]{4}"

MIX_TEMP = 2.0  # mixture temperature: rate_s = (c_min / c_s)^(1/T)


def word_shingles(docs: DataFrame, n: int = SHINGLE) -> DataFrame:
    """Distinct n-word shingles per doc (word-split on single spaces,
    matching the corpus' tokenization and the DuckDB oracle)."""
    w = F.split("text", " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.array_join(F.slice(w, i + 1, n), " "),
    )
    return (
        docs.filter(F.size(w) >= n)
        .select("doc_id", F.explode(sh).alias("sh"))
        .distinct()
    )


@register(
    "q98_decontaminate",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(w[i.i:i.i + {SHINGLE - 1}], ' ') AS sh
        FROM w, LATERAL (
            SELECT unnest(range(1, len(w) - {SHINGLE - 2})) AS i
        ) i
        WHERE len(w) >= {SHINGLE}
    ),
    eval_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id < {N_EVAL_DOCS})
    SELECT s.doc_id, CAST(count(DISTINCT s.sh) AS BIGINT) AS n_shared
    FROM sh s JOIN eval_sh e USING (sh)
    WHERE s.doc_id >= {N_EVAL_DOCS}
    GROUP BY s.doc_id
    """,
    doc="Eval-set decontamination: flag training documents sharing any "
    f"{SHINGLE}-word shingle with the held-out eval set (doc_id < "
    f"{N_EVAL_DOCS}), with the shared-shingle count per flagged doc. "
    "The n-gram overlap join every benchmark-hygiene pipeline runs "
    "(GPT-3 appendix C / PaLM style). One shuffle keyed on the shingle; "
    "the eval side broadcasts at real scale.",
)
def q98_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sh = word_shingles(docs)
    eval_sh = sh.filter(F.col("doc_id") < N_EVAL_DOCS).select("sh").distinct()
    train_sh = sh.filter(F.col("doc_id") >= N_EVAL_DOCS)
    return (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
    )


@register(
    "q99_pii_scrub",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com or call +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug_text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug_text, '{EMAIL_RE}')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(aug_text, '\\+1-555-[0-9]{{4}}')) AS INTEGER)
               AS n_phones,
           md5(regexp_replace(
                   regexp_replace(aug_text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '\\+1-555-[0-9]{{4}}', '<PHONE>', 'g')) AS scrub_md5,
           CAST(length(regexp_replace(
                   regexp_replace(aug_text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '\\+1-555-[0-9]{{4}}', '<PHONE>', 'g')) AS INTEGER)
               AS scrub_len
    FROM aug
    """,
    doc="PII scrubbing: redact emails and phone numbers with typed "
    "placeholders and count redactions per document. The corpus carries "
    "no real PII, so deterministic synthetic PII is appended per doc "
    "(same closed-form construction in the oracle) and the md5 of the "
    "scrubbed text certifies the exact redaction output, not just "
    "counts. Pure regexp projections — no shuffle.",
)
def q99_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    aug_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug_text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug_text, F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(aug_text, F.lit(PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.md5(scrubbed).alias("scrub_md5"),
        F.length(scrubbed).alias("scrub_len"),
    )


@register(
    "q100_repetition_stats",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
        SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(1.0 - count(*) / CAST(sum(c) AS DOUBLE), 4) AS dup_frac,
           round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_word_frac
    FROM wc
    GROUP BY doc_id
    """,
    doc="Repetition detection (Gopher/C4-style quality signal): per-doc "
    "duplicate-word fraction and most-frequent-word share. Degenerate "
    "machine-generated or boilerplate text scores high on both. One "
    "partial-aggregable explode + two-level groupBy.",
)
def q100_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(
            1.0 - F.count(F.lit(1)) / F.sum("c").cast("double"), 4
        ).alias("dup_frac"),
        F.round(F.max("c") / F.sum("c").cast("double"), 4).alias(
            "top_word_frac"
        ),
    )


# uniform-in-[0,256) from the first two md5 hex digits — the same
# engine-portable determinism trick as sampling.py's hash bands
_HEX = "0123456789abcdef"
_U256_SPARK = (
    f"(instr('{_HEX}', substring(md5(cast(doc_id as string)), 1, 1)) - 1) * 16"
    f" + (instr('{_HEX}', substring(md5(cast(doc_id as string)), 2, 1)) - 1)"
)
_U256_DUCK = (
    f"(instr('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    f" + (instr('{_HEX}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)


@register(
    "q101_mixture_sample",
    oracle=f"""
    WITH src AS (
        SELECT source, count(*) AS c FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source, c,
               CAST(floor(256 * pow(
                   (SELECT min(c) FROM src) / CAST(c AS DOUBLE),
                   1.0 / {MIX_TEMP})) AS BIGINT) AS thresh
        FROM src
    )
    SELECT d.source,
           CAST(max(r.c) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE {_U256_DUCK} < r.thresh) AS BIGINT)
               AS n_kept
    FROM documents d JOIN rates r USING (source)
    GROUP BY d.source
    """,
    doc="Temperature-based source mixture sampling (multilingual-corpus "
    f"style): keep rate per source = (c_min / c_source)^(1/T), T = "
    f"{MIX_TEMP} — small sources keep everything, large sources are "
    "flattened toward balance. Membership is md5-deterministic per doc "
    "(integer threshold on a 256-level hash uniform), so the sample is "
    "reproducible across engines and stable under repartitioning. The "
    "per-source count is the only wide stage; its result broadcasts.",
)
def q101_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    c_min = src.agg(F.min("c")).collect()[0][0]
    rates = src.select(
        "source",
        "c",
        F.floor(
            256
            * F.pow(F.lit(float(c_min)) / F.col("c").cast("double"), 1.0 / MIX_TEMP)
        ).alias("thresh"),
    )
    u = F.expr(_U256_SPARK)
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.max("c").alias("n_total"),
            F.count(F.when(u < F.col("thresh"), 1)).alias("n_kept"),
        )
    )


# Gopher-style composite quality gate: rule names in FIXED order so the
# reasons string is deterministic and engine-portable.
_QF_RULES_SQL = """
           CASE WHEN n_words < 15  THEN 'too_short'     END,
           CASE WHEN n_words > 120 THEN 'too_long'      END,
           CASE WHEN top_word_frac > 0.15 THEN 'repetitive'   END,
           CASE WHEN ttr < 0.5     THEN 'low_diversity' END,
           CASE WHEN n_stop < 2    THEN 'no_stopwords'  END
"""


@register(
    "q105_quality_filter",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (
        SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_words,
               round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_word_frac,
               round(count(*) / CAST(sum(c) AS DOUBLE), 4) AS ttr,
               CAST(count(*) FILTER (WHERE word IN {_STOP_SQL}) AS BIGINT)
                   AS n_stop
        FROM wc GROUP BY doc_id
    )
    SELECT doc_id, n_words,
           concat_ws(',', {_QF_RULES_SQL}) AS reasons,
           (concat_ws(',', {_QF_RULES_SQL}) = '') AS pass
    FROM sig
    """,
    doc="Gopher-style composite quality filter: word-count bounds, "
    "most-frequent-word share, type-token ratio, stopword presence — "
    "each failing rule appended to a deterministic ordered reasons "
    "string; pass = no rule fired. One explode + two-level partial-agg "
    "groupBy (same shuffle shape as q100), thresholds applied to "
    "4-decimal-rounded signals so both engines compare identical "
    "doubles.",
)
def q105_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    reasons = quality_reasons()
    return quality_signals(docs).select(
        "doc_id",
        "n_words",
        reasons.alias("reasons"),
        (reasons == "").alias("pass"),
    )


def quality_signals(docs: DataFrame) -> DataFrame:
    """Per-document quality signals shared by q105 and q154 (one Spark
    implementation so the composed pipeline can never drift from the
    standalone filter): word count, most-frequent-word share, type-token
    ratio, stopword count — ratios rounded to 4 decimals so both engines
    threshold identical doubles."""
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    wc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.round(F.max("c") / F.sum("c").cast("double"), 4).alias("top_word_frac"),
        F.round(F.count(F.lit(1)) / F.sum("c").cast("double"), 4).alias("ttr"),
        F.count(F.when(F.array_contains(stop_arr, F.col("word")), 1)).alias(
            "n_stop"
        ),
    )


def quality_reasons() -> F.Column:
    """The ordered Gopher-rule reasons string over quality_signals
    columns — the Spark twin of _QF_RULES_SQL."""
    return F.concat_ws(
        ",",
        F.when(F.col("n_words") < 15, "too_short"),
        F.when(F.col("n_words") > 120, "too_long"),
        F.when(F.col("top_word_frac") > 0.15, "repetitive"),
        F.when(F.col("ttr") < 0.5, "low_diversity"),
        F.when(F.col("n_stop") < 2, "no_stopwords"),
    )


# ---------------------------------------------------------------------------
# document chunking (RAG / training-window preprocessing)
# ---------------------------------------------------------------------------


def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 128, overlap: int = 16
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the RAG /
    context-window preprocessing staple.

    Chunks start every ``chunk_tokens - overlap`` tokens and span up to
    ``chunk_tokens`` tokens; the final chunk may be shorter. A trailing
    start position is emitted only if it contributes new tokens: a start
    ``s`` adds tokens beyond the previous chunk's span iff
    ``s < n - overlap``, so the start sequence is capped at
    ``n - overlap - 1`` — no fully-redundant tail chunk is ever emitted
    (the first chunk, start 0, always is). Chunk identity is
    (doc_id, chunk_idx) — stable under corpus growth because it derives
    only from the document itself.

    Scale design: pure array expressions (split / sequence / slice /
    array_join) inside one narrow projection + explode — no shuffle at
    all; the explode fan-out is len/stride rows per doc, each carrying
    only its own chunk text. Returns DataFrame[doc_id, chunk_idx,
    chunk_text, n_chunk_tokens].
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    w = F.split("text", " ")
    n = F.size(w)
    # cap at the last start that adds new tokens (s < n - overlap); the
    # chunk there still reaches the end: s + chunk_tokens >= n by stride
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
    )
    # built from the projected "w" column — the source "text" column is
    # gone after the first select
    chunk = F.slice(F.col("w"), F.col("start") + 1, chunk_tokens)
    return (
        docs.filter(F.col("text") != "")
        .select("doc_id", w.alias("w"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / stride).cast("int").alias("chunk_idx"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).alias("n_chunk_tokens"),
        )
    )


CHUNK_TOKENS = 16  # driver-gate chunk width (words); stride = 12
CHUNK_OVERLAP = 4


@register(
    "q132_chunk_documents",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE text <> ''
    )
    SELECT doc_id,
           CAST(i.s // {CHUNK_TOKENS - CHUNK_OVERLAP} AS INT) AS chunk_idx,
           array_to_string(w[i.s + 1:i.s + {CHUNK_TOKENS}], ' ') AS chunk_text,
           CAST(len(w[i.s + 1:i.s + {CHUNK_TOKENS}]) AS INT) AS n_chunk_tokens
    FROM d, LATERAL (
        SELECT unnest(range(0,
                            greatest(len(w) - {CHUNK_OVERLAP} - 1, 0) + 1,
                            {CHUNK_TOKENS - CHUNK_OVERLAP})) AS s
    ) i
    """,
    doc="Overlapping token-window chunking (chunk_documents, "
    f"{CHUNK_TOKENS}-token chunks, {CHUNK_OVERLAP}-token overlap) over the "
    "documents table — the RAG / context-window preprocessing staple. "
    "Chunk identity is (doc_id, chunk_idx), stable under corpus growth. "
    "Pure array expressions (split/sequence/slice/array_join) in one "
    "narrow projection + explode — zero shuffle at any scale; the "
    "explode fan-out is len/stride rows per doc, each row carrying only "
    "its own chunk text.",
)
def q132_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, CHUNK_TOKENS, CHUNK_OVERLAP)


# The graph fixture is the fixed 2000-node BVGraph triple (FIXTURES.md);
# documents map onto its node space by doc_id mod N — the structural
# stand-in for a real corpus's page-URL <-> graph-node join key.
_GRAPH_FIXTURE_NODES = 2000


def _q141_oracle() -> str:
    from ..queries.graph import _T
    from ..queries.graph_algos import _pagerank_cte

    return (
        _pagerank_cte(_T)
        + f"""
    SELECT d.doc_id,
           CAST(d.doc_id % {_GRAPH_FIXTURE_NODES} AS INTEGER) AS node,
           round(p.rank, 6) AS rank,
           d.n_chars
    FROM documents d
    JOIN pr10 p ON p.node = d.doc_id % {_GRAPH_FIXTURE_NODES}
    ORDER BY round(p.rank, 6) DESC, d.doc_id
    LIMIT 50
    """
    )


@register(
    "q141_centrality_weighted_corpus",
    oracle=_q141_oracle(),
    doc="Link-centrality-prioritized corpus selection — the web-graph x "
    "curation crossover the reference's domain exists for (crawl "
    "frontiers and corpus quality ranked by link analysis): join each "
    "document to its web-graph node (doc_id mod N on the fixture; the "
    "page-URL<->node key on a real crawl), rank by the node's PageRank "
    "(g11's exact 10-iteration fixpoint), take the top 50. Oracle "
    "embeds the identical unrolled-CTE PageRank, so the selection is "
    "certified end-to-end. Scale: the rank table is node-count-sized "
    "(broadcast), the selection a TakeOrderedAndProject — no shuffle "
    "of the corpus; ties at the 6-digit rounded rank break by doc_id "
    "on both engines.",
)
def q141_centrality_weighted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..queries.graph import edges_df, graph_df
    from ..queries.graph_algos import pagerank

    e = edges_df(spark)
    nodes = graph_df(spark).select(F.col("src").alias("node"))
    pr = pagerank(e, iterations=10, nodes=nodes)
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = docs.withColumn(
        "node", (F.col("doc_id") % _GRAPH_FIXTURE_NODES).cast("int")
    ).join(F.broadcast(pr), "node")
    return (
        joined.select(
            "doc_id", "node", F.round("rank", 6).alias("rank"), "n_chars"
        )
        .orderBy(F.col("rank").desc(), "doc_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# token-budget corpus selection (quality-greedy, no global sort)
# ---------------------------------------------------------------------------

BUDGET_BP = 2500  # select best docs until 25% of total corpus tokens


@register(
    "q146_token_budget_select",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
               CAST((1000 * len(list_distinct(string_split(text, ' '))))
                    // len(string_split(text, ' ')) AS BIGINT) AS score
        FROM documents WHERE text <> ''
    ),
    tot AS (SELECT CAST(sum(n_toks) AS BIGINT) AS n FROM t),
    r AS (
        SELECT doc_id, score, n_toks,
               sum(n_toks) OVER (ORDER BY score DESC, doc_id) AS run
        FROM t
    )
    SELECT doc_id, score, n_toks
    FROM r, tot WHERE run * 10000 <= {BUDGET_BP} * n
    """,
    doc="Greedy token-budget corpus selection: rank documents by an "
    "integer quality score (type-token ratio in milli-units) and keep "
    "them best-first, (score DESC, doc_id ASC), while the inclusive "
    f"running token count stays within {BUDGET_BP} bp of the corpus "
    "total — 'fill a 10B-token budget with the best documents', the "
    "final assembly step of every curated pretraining mix. The oracle "
    "is the textbook single global window cumsum; the Spark side "
    "computes the SAME set without ever globally sorting the corpus: "
    "per-score bucket token sums (the score is already an integer in "
    "0..1000, so the bucket table is <= 1001 rows) get a driver-scale "
    "cumulative sum, whole buckets strictly inside the budget are kept "
    "by a broadcast join, and only the ONE boundary bucket is sorted "
    "(by doc_id, within its score partition) to place the cut. "
    "Integer-only arithmetic end to end (run*10000 <= bp*total), no "
    "float crosses engines. Scale: the corpus shuffles once (hash by "
    "score) for the bucket aggregation and the boundary window touches "
    "one bucket's rows; worst case (all docs one score) degrades to "
    "the single-bucket sort and is documented, not silent.",
)
def q146_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").filter(F.col("text") != "")
    w = F.split("text", " ")
    # persist: the scored table feeds the bucket sums, the total and the
    # selection join — see q142's plan-subtree duplication note
    t = d.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_toks"),
        F.expr(
            "CAST((1000 * size(array_distinct(split(text, ' '))))"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("score"),
    ).persist()
    # <=1001-row bucket table: cumulative token mass best-score-first.
    # cum_before = tokens in strictly better buckets (score DESC, so a
    # row's cum_before plus its own bucket = cum_incl).
    buckets = t.groupBy("score").agg(F.sum("n_toks").alias("btoks"))
    bw = Window.orderBy(F.col("score").desc())
    cum = buckets.select(
        "score",
        "btoks",
        (F.sum("btoks").over(bw) - F.col("btoks")).alias("cum_before"),
        F.sum("btoks").over(bw).alias("cum_incl"),
    )
    tot = t.groupBy().agg(F.sum("n_toks").alias("n"))
    marked = cum.join(F.broadcast(tot)).select(
        "score",
        "cum_before",
        (F.col("cum_incl") * 10000 <= F.lit(BUDGET_BP) * F.col("n")).alias(
            "whole_in"
        ),
        (F.col("cum_before") * 10000 <= F.lit(BUDGET_BP) * F.col("n")).alias(
            "touches"
        ),
        F.col("n"),
    )
    td = t.join(F.broadcast(marked), "score")
    inside = td.filter(F.col("whole_in")).select("doc_id", "score", "n_toks")
    # exactly one boundary bucket: touches AND NOT whole_in; cut within it
    # by doc_id order, cumsum seeded with cum_before.
    dw = Window.partitionBy("score").orderBy("doc_id")
    boundary = (
        td.filter(F.col("touches") & ~F.col("whole_in"))
        .withColumn("run", F.col("cum_before") + F.sum("n_toks").over(dw))
        .filter(F.col("run") * 10000 <= F.lit(BUDGET_BP) * F.col("n"))
        .select("doc_id", "score", "n_toks")
    )
    return inside.union(boundary)


# ---------------------------------------------------------------------------
# q154: the composed curation pipeline (dedup -> quality -> split)
# ---------------------------------------------------------------------------


def _manifest_tail_sql(ids_cte: str) -> str:
    """Quality-gate + md5-band-split CTE tail shared by the composed
    curation pipelines (q154/q155): tokenize only the docs whose ids
    survive {ids_cte}, score them with the q105 signals, keep rule-clean
    docs and emit the (doc_id, split, n_words) manifest — the oracle
    twin of _manifest_tail, factored once so compositions can't drift."""
    from .sampling import TEST_DIGITS, VAL_DIGITS

    return f"""
    tok AS (
        SELECT d.doc_id, unnest(string_split(x.text, ' ')) AS word
        FROM {ids_cte} d JOIN documents x ON x.doc_id = d.doc_id
    ),
    wc AS (
        SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_words,
               round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_word_frac,
               round(count(*) / CAST(sum(c) AS DOUBLE), 4) AS ttr,
               CAST(count(*) FILTER (WHERE word IN {_STOP_SQL}) AS BIGINT)
                   AS n_stop
        FROM wc GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     IN {VAL_DIGITS!r} THEN 'val'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     IN {TEST_DIGITS!r} THEN 'test'
                ELSE 'train'
           END AS split,
           n_words
    FROM sig
    WHERE concat_ws(',', {_QF_RULES_SQL}) = ''
    """


def _manifest_tail(survivors: DataFrame) -> DataFrame:
    """Spark half of the shared pipeline tail: q105's signals/rules via
    the SHARED quality_signals/quality_reasons helpers, then q87's
    md5-band split; emits (doc_id, split, n_words)."""
    from .sampling import dataset_split

    sig = quality_signals(survivors)
    kept = sig.filter(quality_reasons() == "").select("doc_id", "n_words")
    return dataset_split(kept).select("doc_id", "split", "n_words")


def _curation_oracle_sql() -> str:
    return f"""
    WITH kept0 AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
    ),
    {_manifest_tail_sql('kept0')}
    """


@register(
    "q154_curation_pipeline",
    oracle=_curation_oracle_sql(),
    doc="The composed end-to-end curation pipeline a pretraining run "
    "actually executes, as ONE declarative plan: exact dedup "
    "(keep-first per sha256(text), q61's contract) -> Gopher quality "
    "filter (q105's signals and rules, via the SHARED "
    "quality_signals/quality_reasons helpers so the composition can "
    "never drift from the standalone operators) -> leakage-safe "
    "train/val/test assignment (q87's md5 hash bands). Emits the "
    "surviving corpus manifest (doc_id, split, n_words). Scale shape: "
    "dedup shuffles 32-byte digests (never full text twice), the "
    "survivor set joins back LEFT SEMI so only kept docs are tokenized, "
    "quality is the q105 two-level partial agg, and the split is a "
    "row-local hash — three shuffles total for a three-stage pipeline, "
    "each keyed to avoid skew (digest / doc_id / none). Membership is "
    "md5-stable: a document's split never changes as the corpus grows.",
)
def q154_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    kept_ids = (
        docs.groupBy(F.sha2("text", 256))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = docs.join(kept_ids, "doc_id", "left_semi")
    return _manifest_tail(survivors)


# ---------------------------------------------------------------------------
# q155: the FULL production curation shape — q154 with the near-dup stage
# (q62 candidates -> connected components -> q134 keep-best resolution)
# inserted between exact dedup and the quality gate
# ---------------------------------------------------------------------------


def _curation_neardup_oracle_sql() -> str:
    from .dedup import _minhash_cte

    mh_body = _minhash_cte("docs0").lstrip().removeprefix("WITH")
    return f"""
    WITH RECURSIVE kept0 AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
    ),
    docs0 AS (
        SELECT d.doc_id, d.text FROM documents d
        JOIN kept0 k ON k.doc_id = d.doc_id
    ),
    {mh_body},
    sym AS (
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
        FROM docs0 d LEFT JOIN members m ON m.node = d.doc_id
    ),
    reps AS (
        SELECT arg_max(doc_id, (CAST(n_chars AS BIGINT) << 33) - doc_id)
                   AS doc_id
        FROM labeled GROUP BY cluster_id
    ),
    {_manifest_tail_sql('reps')}
    """


@register(
    "q155_curation_neardup_pipeline",
    oracle=_curation_neardup_oracle_sql(),
    doc="The FULL production curation pipeline (q154 plus the near-dup "
    "stage a real pretraining corpus requires): exact dedup (keep-first "
    "per sha256(text)) -> MinHash-LSH candidate pairs over the exact "
    "survivors (the SHARED minhash_candidate_pairs — q62's operator, "
    "not a reimplementation) -> connected components -> keep the "
    "LONGEST member per cluster (q134's single-BIGINT (n_chars<<33) - "
    "doc_id argmax policy) -> Gopher quality gate -> leakage-safe "
    "md5-band split, all via the shared _manifest_tail so composition "
    "can't drift from q154/q105/q87. Emits the surviving corpus "
    "manifest (doc_id, split, n_words). Scale shape: digest groupBy + "
    "semi-join back (never full text twice), band-bucket pair expansion "
    "(one shuffle, join-free), CC shuffles (long,long) labels only, "
    "representative pick is one partial-agg'd max_by, and only "
    "surviving docs are ever tokenized for the quality gate. The "
    "survivor subtree is persisted — it feeds the signature pipeline, "
    "the length projection and the final semi-join (the q142 "
    "plan-duplication lesson).",
)
def q155_curation_neardup_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..queries.graph_algos import connected_components
    from .dedup import minhash_candidate_pairs

    docs = load(spark, sf_dir, "documents")
    kept_ids = (
        docs.groupBy(F.sha2("text", 256))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # session-retained cache (contract in queries/graph._materialize;
    # released session-wide by cache.release_all)
    survivors = track(docs.join(kept_ids, "doc_id", "left_semi").persist())
    cand = minhash_candidate_pairs(survivors)
    cc = connected_components(
        cand.select(
            F.col("doc_a").cast("long").alias("src"),
            F.col("doc_b").cast("long").alias("dst"),
        )
    )
    chars = survivors.select("doc_id", F.length("text").alias("n_chars"))
    # shuffle-hash: both sides are one narrow row per doc (q134's note)
    labeled = chars.join(
        cc.hint("shuffle_hash"), chars.doc_id == cc.node, "left"
    ).select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("cluster_id"),
        "n_chars",
    )
    key = (
        F.col("n_chars").cast("long") * F.lit(1 << 33).cast("long")
    ) - F.col("doc_id")
    reps = (
        labeled.groupBy("cluster_id")
        .agg(F.max_by("doc_id", key).alias("doc_id"))
        .select("doc_id")
    )
    finals = survivors.join(reps, "doc_id", "left_semi")
    return _manifest_tail(finals)
