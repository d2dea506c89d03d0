"""Search-side operators (SURVEY.md §2 retrieval family, VERDICT r11
next-round candidates): exact multi-pattern substring search and
cross-encoder reranking plumbing.

q161 is the distributed answer to a suffix automaton: an automaton is
inherently one-machine state, so the Spark-first shape is an inverted
q-gram prune + exact verify — any true occurrence of a pattern (length
>= the gram width) contains every one of the pattern's grams, so an
equi-join on gram hashes loses nothing (the q142 PPJoin losslessness
argument, restated for substrings; same family as q119/q144/q147).

q162 completes the q137/q150 retrieval stack with the standard two-stage
ranker: cheap candidate generation, then a batched cross-encoder rerank.
The "model" here is a deterministic stub (this container has no ML
runtime) but the Spark-side plumbing is the real thing: candidate pairs
flow through mapInPandas in Arrow batches, the model is loaded once per
task, and scoring is batch-at-a-time — swap CrossEncoderStub for a real
encoder and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register
from .similarity import topk_per_group

GRAM = 8  # pattern length (12) >= GRAM, so every match shares all grams
N_PATTERNS = 3
# probe-direction cutoff: up to this many distinct pattern grams, each
# document tests the literal grams with contains(); beyond it, the
# classic posting-list explode + equi-join wins
_GRAM_PROBE_MAX = 64


def _patterns(docs: DataFrame) -> DataFrame:
    """Deterministic search patterns: a 12-char mid-document slice of the
    first N_PATTERNS sufficiently long documents (derived from the corpus
    rather than baked literals, so they exist at every SF)."""
    return (
        docs.filter(F.col("n_chars") >= 50)
        .orderBy("doc_id")
        .limit(N_PATTERNS)
        .select(
            F.col("doc_id").alias("pattern_id"),
            F.substring("text", 9, 12).alias("pat"),
        )
    )


def _grams(col: str) -> F.Column:
    """All character GRAM-grams of a string column, duplicates included
    (dedup happens downstream: array_intersect or a candidate distinct —
    an array_distinct here is O(len^2) string compares per document and
    measured as the dominant q161 cost at sf0.1). Empty array below GRAM
    chars — sequence() must never see start > stop: Spark flips to step
    -1 there instead of returning empty."""
    return F.when(
        F.length(col) >= GRAM,
        F.expr(
            f"transform(sequence(1, length({col}) - {GRAM - 1}),"
            f" i -> substring({col}, i, {GRAM}))"
        ),
    ).otherwise(F.array().cast("array<string>"))


@register(
    "q161_substring_search",
    # the oracle is the brute-force definition; the Spark side must
    # reproduce it exactly through the gram prune (losslessness)
    oracle=f"""
    WITH pats AS MATERIALIZED (
        SELECT doc_id AS pattern_id, substr(text, 9, 12) AS pat
        FROM documents WHERE n_chars >= 50
        ORDER BY doc_id LIMIT {N_PATTERNS}
    )
    SELECT p.pattern_id, d.doc_id
    FROM pats p, documents d
    WHERE contains(d.text, p.pat)
    """,
    doc="Exact multi-pattern substring search via an inverted 8-gram "
    "prune + contains() verify — the distributed stand-in for a suffix "
    "automaton: posting lists are filtered map-side against the "
    "broadcast pattern-gram set, so only gram-sharing (doc, pattern) "
    "candidates are ever verified; provably lossless for patterns >= "
    "the gram width.",
)
def q161_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars"
    )
    pats = _patterns(docs)
    pat_grams = pats.select(
        "pattern_id", "pat", F.explode(_grams("pat")).alias("gram")
    )
    # The pattern-gram set is workload-sized (patterns x ~5 grams), so it
    # folds into a LITERAL array and the probe direction flips: instead
    # of materializing every text position as a substring (len(text)
    # string allocs per doc — measured as q161's dominant cost at sf0.1),
    # each document tests the handful of literal grams with contains()
    # (a JVM indexOf each) and explodes only the hits. Same set as an
    # array_intersect with the full gram list — a gram is among the
    # text's GRAM-grams iff it occurs as a substring. The collect is a
    # bounded scalar boundary (<= N_PATTERNS * (12 - GRAM + 1) grams).
    # Past _GRAM_PROBE_MAX grams (a large pattern workload) the probe
    # cost crosses the posting-list build and the classic inverted
    # explode + equi-join takes over.
    pgram_set = sorted({r.gram for r in pat_grams.select("gram").collect()})
    if not pgram_set:
        # no qualifying pattern source (corpus of short docs): empty
        # result with the contract schema, not a zero-arg array() plan
        return docs.select(
            F.col("doc_id").alias("pattern_id"), "doc_id"
        ).filter(F.lit(False))
    if len(pgram_set) <= _GRAM_PROBE_MAX:
        doc_grams = docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.array(*[F.lit(g) for g in pgram_set]),
                    lambda g: F.contains(F.col("text"), g),
                )
            ).alias("gram"),
        )
    else:
        doc_grams = docs.select(
            "doc_id", F.explode(_grams("text")).alias("gram")
        ).join(
            F.broadcast(
                spark.createDataFrame(
                    [(g,) for g in pgram_set], "gram string"
                )
            ),
            "gram",
        )
    # gram -> pattern mapping (a gram can belong to several patterns)
    cand = (
        doc_grams.join(F.broadcast(pat_grams), "gram")
        .select("pattern_id", "pat", "doc_id")
        .distinct()
    )
    return (
        cand.join(docs.select("doc_id", "text"), "doc_id")
        .filter(F.expr("contains(text, pat)"))
        .select("pattern_id", "doc_id")
    )


# ---------------------------------------------------------------------------
# q162: two-stage retrieval with a batched cross-encoder rerank
# ---------------------------------------------------------------------------

# fixed query strings (distinct tokens each, all in the corpus vocab);
# grep-checked unique module constants (the q150/q85 BM25_TERMS lesson)
Q162_QUERIES: tuple[tuple[int, str], ...] = (
    (0, "hash join fast"),
    (1, "stream window agg"),
    (2, "spark sort table"),
)
Q162_TOPK = 10
_TF_CAP = 3  # saturating term frequency, the stub's only hyperparameter


class CrossEncoderStub:
    """Deterministic stand-in for a cross-encoder (no ML runtime in this
    container). Scores a (query, document) pair as the integer
    sum over query tokens of min(tf_doc(token), _TF_CAP) * w, where w
    decays with the token's position in the query — enough structure to
    exercise real rerank plumbing while staying SQL-restatable for the
    oracle. A real model (e.g. a MiniLM cross-encoder) drops in behind
    load(): same batch signature, same mapInPandas plan."""

    @classmethod
    def load(cls, model_name: str = "stub") -> "CrossEncoderStub":
        if model_name != "stub":
            raise NotImplementedError(
                "only the deterministic stub ships in this environment; "
                "plug a real cross-encoder in here"
            )
        return cls()

    def score_batch(
        self, queries: pd.Series, docs: pd.Series
    ) -> pd.Series:
        out = []
        for q, d in zip(queries, docs):
            counts: dict[str, int] = {}
            for tok in d.split(" "):
                counts[tok] = counts.get(tok, 0) + 1
            qtoks = q.split(" ")
            n = len(qtoks)
            out.append(
                sum(
                    min(counts.get(t, 0), _TF_CAP) * (n - i)
                    for i, t in enumerate(qtoks)
                )
            )
        return pd.Series(out, dtype="int64")


def _rerank_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    # model loaded ONCE per task, then batch-at-a-time scoring — the
    # per-executor inference pattern (Arrow hands whole record batches
    # over; nothing is per-row Python)
    model = CrossEncoderStub.load()
    for pdf in it:
        yield pd.DataFrame(
            {
                "query_id": pdf["query_id"],
                "doc_id": pdf["doc_id"],
                "score": model.score_batch(pdf["qtext"], pdf["text"]),
            }
        )


def _q162_query_values_sql() -> str:
    rows = []
    for qid, qtext in Q162_QUERIES:
        toks = qtext.split(" ")
        n = len(toks)
        rows += [
            f"({qid}, '{tok}', {n - i})" for i, tok in enumerate(toks)
        ]
    return ", ".join(rows)


@register(
    "q162_crossencoder_rerank",
    # both engines share the literal (query_id, token, weight) table —
    # generated from the same Python constant — and the stub's scoring
    # function restates as integer SQL: no float crosses the hash
    oracle=f"""
    WITH qt(query_id, tok, w) AS (VALUES {_q162_query_values_sql()}),
    tf AS MATERIALIZED (
        SELECT doc_id, term, count(*) AS tf FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ) GROUP BY doc_id, term
    ),
    scores AS MATERIALIZED (
        SELECT qt.query_id, tf.doc_id,
               CAST(sum(least(tf.tf, {_TF_CAP}) * qt.w) AS BIGINT) AS score
        FROM qt JOIN tf ON tf.term = qt.tok
        GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
        SELECT query_id, doc_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INTEGER) AS rank
        FROM scores
    ) WHERE rank <= {Q162_TOPK}
    """,
    doc="Two-stage retrieval: token-overlap candidate generation "
    "(broadcast equi-join on the query vocabulary), then a batched "
    "cross-encoder rerank over the raw (query, document) texts via "
    "mapInPandas — model loaded once per task, Arrow batch scoring — "
    "and a two-phase top-k. The encoder is a deterministic stub; the "
    "plumbing is production-shaped.",
)
def q162_crossencoder_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    qdf = spark.createDataFrame(
        list(Q162_QUERIES), "query_id int, qtext string"
    )
    qtok = qdf.select(
        "query_id", F.explode(F.split("qtext", " ")).alias("tok")
    ).distinct()
    # stage 1: candidates = docs sharing >= 1 token with the query; the
    # tiny query vocabulary broadcasts, so candidate generation is one
    # map-side semi-join over the exploded corpus tokens
    cand = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .join(F.broadcast(qtok), F.col("term") == F.col("tok"))
        .select("query_id", "doc_id")
        .distinct()
    )
    # stage 2: rerank the candidate pairs with the (stub) cross-encoder
    pairs = cand.join(F.broadcast(qdf), "query_id").join(docs, "doc_id")
    scored = pairs.select("query_id", "doc_id", "qtext", "text").mapInPandas(
        _rerank_batches, "query_id int, doc_id long, score long"
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("score").desc(), F.col("doc_id")],
        Q162_TOPK,
    ).select("query_id", "doc_id", "score", "rank")
