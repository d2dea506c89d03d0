"""Text-analysis operators — SURVEY.md §2 Tier C: quality scoring,
language identification, token statistics, document fingerprinting, and
TF-IDF terms. Pure ``pyspark.sql.functions`` (JVM-side, codegen'd)
except the Misra-Gries pre-filter (Arrow-batched mapInPandas), each with
an exact DuckDB oracle.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..cache import register_release_hook
from ..catalog import load
from ..registry import register

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")
_STOP_SQL = "('" + "','".join(STOPWORDS) + "')"

# marker words per language for the n-gram/stopword heuristic; the fixture
# vocabulary is shared across langs, so the discriminating signal is weak —
# the point is the operator shape, which both engines compute identically.
LANG_MARKERS = {
    "en": ("the", "a", "is", "and"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "le", "shi", "he"),
}


@register(
    "q80_text_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
    SELECT doc_id,
           CAST(length(text) AS INTEGER)                          AS n_chars,
           CAST(len(w) AS INTEGER)                                AS n_words,
           round(CAST(length(text) AS DOUBLE) / len(w), 4)        AS avg_word_len,
           round(CAST(len(list_filter(w, x -> x IN {_STOP_SQL})) AS DOUBLE)
                 / len(w), 4)                                     AS stop_ratio,
           round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS ttr
    FROM t
    """,
    doc="Quality scoring: length, word count, mean word length, stopword "
    "ratio, type-token ratio — the standard pretraining quality signals.",
)
def q80_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    nw = F.size(w).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(w).alias("n_words"),
        F.round(F.length("text").cast("double") / nw, 4).alias("avg_word_len"),
        F.round(
            F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("double")
            / nw,
            4,
        ).alias("stop_ratio"),
        F.round(F.size(F.array_distinct(w)).cast("double") / nw, 4).alias("ttr"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = "('" + "','".join(LANG_MARKERS[lang]) + "')"
    return f"len(list_filter(w, x -> x IN {markers}))"


@register(
    "q81_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    scored AS (
        SELECT doc_id, lang,
               {_lang_score_sql('en')} AS s_en,
               {_lang_score_sql('es')} AS s_es,
               {_lang_score_sql('de')} AS s_de,
               {_lang_score_sql('fr')} AS s_fr,
               {_lang_score_sql('zh')} AS s_zh
        FROM t
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS pred_lang
    FROM scored
    """,
    doc="Language-ID heuristic: per-language marker-word counts, argmax "
    "with a fixed priority tie-break (deterministic on both engines).",
)
def q81_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")

    def score(lang: str):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(w, lambda x: F.array_contains(markers, x)))

    s = {lang: score(lang) for lang in ("en", "es", "de", "fr", "zh")}
    pred = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), "de")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    return d.select("doc_id", F.col("lang").alias("labeled_lang"), pred.alias("pred_lang"))


@register(
    "q82_token_stats",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, regexp_extract_all(text, '[a-z0-9]+') AS toks
        FROM documents
    )
    SELECT lang,
           CAST(sum(len(toks)) AS BIGINT)           AS total_tokens,
           round(avg(CAST(len(toks) AS DOUBLE)), 2) AS avg_tokens_per_doc,
           count(*)                                 AS n_docs
    FROM t
    GROUP BY lang
    """,
    doc="Token counting with a BPE-ish regex tokenizer, aggregated per "
    "language (corpus token-budget accounting).",
)
def q82_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)
    return (
        d.select("doc_id", "lang", F.size(toks).alias("n_toks"))
        .groupBy("lang")
        .agg(
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.round(F.avg(F.col("n_toks").cast("double")), 2).alias(
                "avg_tokens_per_doc"
            ),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


@register(
    "q83_fingerprint",
    oracle="""
    SELECT doc_id,
           min(md5(substring(text, i + 1, 8))) AS fingerprint
    FROM (SELECT doc_id, text, unnest(range(0, length(text) - 7)) AS i
          FROM documents WHERE length(text) >= 8)
    GROUP BY doc_id
    """,
    doc="Document fingerprint: min-hash over all char 8-grams (rolling-"
    "hash winnowing, w = whole doc) — robust to small edits at the ends.",
)
def q83_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    grams = F.transform(
        F.sequence(F.lit(0), F.length("text") - 8),
        lambda i: F.md5(F.col("text").substr(i + 1, F.lit(8))),
    )
    return d.select("doc_id", F.array_min(grams).alias("fingerprint"))


@register(
    "q84_tfidf_top_terms",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf
    FROM (SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
    doc="TF-IDF top-3 terms per document (explode -> tf/df aggregation -> "
    "windowed top-k; df is a broadcastable dimension at any corpus size).",
)
def q84_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


BM25_TERMS = ("data", "join", "scan")
_BM25_TERMS_SQL = "('" + "','".join(BM25_TERMS) + "')"
BM25_K1, BM25_B = 1.2, 0.75


@register(
    "q85_bm25_ranking",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    avgdl AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
    n AS (SELECT count(*) AS n_docs FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN {_BM25_TERMS_SQL} GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
           WHERE term IN {_BM25_TERMS_SQL} GROUP BY 1),
    scored AS (
        SELECT tf.doc_id,
               sum(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * ({BM25_K1} + 1))
                   / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                      + {BM25_B} * dl.dl / avgdl.avgdl))) AS s
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN avgdl CROSS JOIN n
        GROUP BY tf.doc_id
    )
    SELECT doc_id, round(s, 4) AS bm25
    FROM (SELECT doc_id, s, row_number() OVER (ORDER BY round(s, 6) DESC,
                                               doc_id) AS rn
          FROM scored)
    WHERE rn <= 20
    """,
    doc="BM25 document ranking for a fixed term query (k1=1.2, b=0.75): "
    "tokenize -> tf per (doc, term) with term pre-filter pushed into the "
    "explode, df and avg doc length as broadcastable scalars, Robertson "
    "idf, top-20. The inverted-index shape of search scoring as one "
    "DataFrame pipeline; rank key rounded so ULP drift can't flip order.",
)
def q85_bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl = dl.agg(F.avg(F.col("dl").cast("double")).alias("avgdl"))
    n_docs = d.count()
    qtoks = toks.filter(F.col("term").isin(*BM25_TERMS))
    tf = qtoks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = qtoks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (BM25_K1 + 1))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("s"))
    )
    # heap top-k (TakeOrderedAndProject), never a single-partition rank
    # window — the q150 idiom (VERDICT r10 item #8)
    return (
        scored.orderBy(F.round(F.col("s"), 6).desc(), F.col("doc_id"))
        .limit(20)
        .select("doc_id", F.round("s", 4).alias("bm25"))
    )


@register(
    "q130_ngram_counts",
    oracle="""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents WHERE text <> ''
    ),
    sized AS (SELECT t, len(t) AS n FROM toks WHERE len(t) >= 3),
    pos AS (SELECT t, unnest(range(1, n - 1)) AS p FROM sized),
    grams AS (SELECT array_to_string(t[p:p + 2], ' ') AS gram FROM pos)
    SELECT gram, count(*) AS n_occurrences
    FROM grams
    GROUP BY gram
    ORDER BY n_occurrences DESC, gram
    LIMIT 50
    """,
    doc="Corpus-wide n-gram frequency (trigrams): the language-model "
    "data-analysis staple behind contamination scans, boilerplate "
    "detection and tokenizer diagnostics. Narrow projection -> explode "
    "positions -> one partial-agg'd groupBy on the gram text, then "
    "TakeOrderedAndProject for the global top-50 (count desc, gram asc "
    "tiebreak so the cut is deterministic). One shuffle; map-side "
    "combine collapses repeated grams before they move. At 100 TB swap "
    "the gram text for its 64-bit hash in the shuffle key and join the "
    "top hashes back for display (the q119 discipline).",
)
def q130_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("text") != "")
    sized = d.select(F.split("text", " ").alias("t")).withColumn(
        "n", F.size("t")
    ).filter(F.col("n") >= 3)
    pos = sized.select(
        "t", F.explode(F.sequence(F.lit(1), F.col("n") - 2)).alias("p")
    )
    grams = pos.select(F.array_join(F.slice("t", F.col("p"), 3), " ").alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "gram")
        .limit(50)
    )


# Shared by the registered batch gate q137 AND the r17-staged streaming
# gate q167 (the g44/g45 shared-oracle pattern: the incremental index's
# rebuild identity makes it answerable by the batch oracle verbatim, and
# sharing the string means a fix to one cannot desynchronize the other).
_Q137_ORACLE = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY 1, 2
    ),
    stats AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df,
               CAST(sum(tf) AS BIGINT) AS total_tf
        FROM tf GROUP BY 1
    ),
    top AS (
        SELECT term, doc_id, tf,
               row_number() OVER (PARTITION BY term
                                  ORDER BY tf DESC, doc_id) AS rn
        FROM tf
    ),
    postings AS (
        SELECT term,
               string_agg(doc_id || ':' || tf, ','
                          ORDER BY tf DESC, doc_id) AS postings
        FROM top WHERE rn <= 5 GROUP BY term
    )
    SELECT s.term, s.df, s.total_tf, p.postings
    FROM stats s JOIN postings p USING (term)
    """


def _tf_of(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf) from (doc_id, text): whitespace tokenize +
    map-side-combining count — the index's base aggregation."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    return toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def _stats_of(tf: DataFrame) -> DataFrame:
    """(term, df, total_tf) from (term, doc_id, tf) rows — the index's
    per-term statistics (one helper so the batch gate, the incremental
    fold, and the empty fallback cannot drift — review r16)."""
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )


def _top5(tf: DataFrame) -> DataFrame:
    """The 5 highest-tf docs per term (doc_id ascending ties) — the
    bounded posting list. Per-term window partitions (never
    corpus-wide)."""
    wr = W.partitionBy("term").orderBy(F.col("tf").desc(), "doc_id")
    return (
        tf.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


def _render_postings(top: DataFrame) -> DataFrame:
    """(term, postings): render capped (term, doc_id, tf) rows as the
    hashable 'doc:tf,...' string, ordered tf desc then doc_id."""
    return top.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("tf")).alias("neg_tf"),
                            F.col("doc_id").alias("d"),
                            F.col("tf").alias("t"),
                        )
                    )
                ),
                lambda x: F.concat_ws(
                    ":", x["d"].cast("string"), x["t"].cast("string")
                ),
            ),
            ",",
        ).alias("postings")
    )


@register(
    "q137_inverted_index",
    oracle=_Q137_ORACLE,
    doc="Inverted-index construction: term -> document frequency, corpus "
    "term frequency, and a bounded posting list (top-5 docs by tf, "
    "rendered 'doc:tf,...' so the artifact is hashable cross-engine). "
    "Scale shape: the (term, doc_id) pre-aggregation absorbs hot-term "
    "skew via map-side partial aggregation BEFORE any term-only "
    "grouping sees a stopword's full row stream; the posting list is "
    "rank-capped per term (never collect_list of an unbounded group); "
    "stats and postings are both term-partitioned after their aggs, so "
    "the final join needs no extra exchange under AQE.",
)
def q137_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # tf feeds BOTH the stats and the postings branch; without persist the
    # physical plan re-scans and re-aggregates the full token stream twice
    # (Python DataFrame reuse does not dedupe subtrees). The cached (term,
    # doc_id, tf) table is counts-only — far smaller than the corpus.
    tf = _tf_of(d).persist()
    stats = _stats_of(tf)
    postings = _render_postings(_top5(tf))
    return stats.join(postings, "term").select("term", "df", "total_tf", "postings")


# ---------------------------------------------------------------------------
# STAGED for round 17 (VERDICT r15 #7: the g45 pattern applied to an
# existing index build — registration deferred so the r16 window budget
# stays at the two ANF gates). q167 maintains the q137 inverted index
# INCREMENTALLY over a real foreachBatch stream: state is the bounded
# index itself — (term, df, total_tf) stats plus the capped top-5
# posting rows per term — never the raw token history. Per-batch
# RE-AGGREGATION cost is proportional to the batch's terms (untouched
# terms pass through an anti-join, never a re-aggregation); the local
# gate's eager localCheckpoint does still MATERIALIZE the full merged
# state each batch (review r16: an O(|index|) sequential rewrite, not
# O(batch)). At 100 TB the same fold writes its passthrough/merge as a
# partitioned state-table MERGE (only changed term partitions rewrite),
# which is exactly what the touched-terms anti-join shape enables —
# the local materialization is a gate artifact, not the design.
#
# Rebuild identity (what makes it hash-oracleable by _Q137_ORACLE):
# the carve is on doc_id, so every document lands whole in exactly one
# micro-batch and the per-batch (term, doc_id, tf) tables are
# doc-disjoint. df/total_tf are additive over doc-disjoint parts, so
# the touched-term merge is exact. The top-5 posting list survives
# truncation by the monotone top-k argument (the ANF sketch argument's
# top-k instance): rows are only ever ADDED, so a (tf, doc_id) pair's
# per-term rank only degrades as batches arrive — if its final rank is
# <= 5 its rank was <= 5 at every prefix, so it was never evicted.
# Dry-run pair + carve-independence pinned in tests/test_round16_ops.py.
# ---------------------------------------------------------------------------

_Q167_BATCHES = 3


def _index_fold_batch(state: dict, batch: DataFrame) -> None:
    """One incremental index-maintenance step: merge a document batch's
    (term, doc_id, tf) rows into the bounded index state, touching only
    the batch's terms."""
    tf_b = _tf_of(batch).localCheckpoint(eager=True)
    st_b = _stats_of(tf_b)
    if "stats" not in state:
        state["stats"] = st_b.localCheckpoint(eager=True)
        state["post"] = _top5(tf_b).localCheckpoint(eager=True)
        return
    touched = tf_b.select("term").distinct()
    stats, post = state["stats"], state["post"]
    merged_stats = (
        stats.join(touched, "term")
        .unionByName(st_b)
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("total_tf").alias("total_tf"))
    )
    state["stats"] = (
        merged_stats.unionByName(stats.join(touched, "term", "left_anti"))
        .localCheckpoint(eager=True)
    )
    merged_post = _top5(
        post.join(touched, "term").select("term", "doc_id", "tf")
        .unionByName(tf_b)
    )
    state["post"] = (
        merged_post.unionByName(post.join(touched, "term", "left_anti"))
        .localCheckpoint(eager=True)
    )


def stream_inverted_index(
    docs: DataFrame, n_batches: int = _Q167_BATCHES,
    work_dir: str | None = None,
) -> DataFrame:
    """The q137 inverted index computed by DRIVING a file-source
    foreachBatch stream over a doc_id carve of ``docs`` (the g45 gate
    shape; machinery in streaming/file_fold.py). Row-identical to the
    batch build for ANY carve — see the rebuild-identity note above."""
    from ..streaming.file_fold import drive_file_stream_fold

    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).localCheckpoint(eager=True)
    state = drive_file_stream_fold(
        d, "doc_id long, text string", ["doc_id"], n_batches,
        _index_fold_batch, work_dir,
    )
    if "stats" not in state:
        # Empty corpus: no files staged, no micro-batch fires — return
        # the batch twin's (empty) result shape (the g45 empty rule).
        # Reachable ONLY on empty input: drive_file_stream_fold raises
        # when the carve stages nothing for a non-empty input.
        empty_tf = _tf_of(d)
        state = {"stats": _stats_of(empty_tf), "post": empty_tf}
    postings = _render_postings(state["post"])
    return (
        state["stats"].join(postings, "term")
        .select("term", "df", "total_tf", "postings")
    )


def q167_stream_inverted_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return stream_inverted_index(d, _Q167_BATCHES)


PMI_MIN_COUNT = 5


@register(
    "q138_pmi_cooccur",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    toks AS (
        SELECT doc_id, w[i] AS term, i
        FROM t, unnest(range(1, len(w) + 1)) AS r(i)
    ),
    pairs AS (
        SELECT least(a.term, b.term) AS term_a,
               greatest(a.term, b.term) AS term_b
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.i - a.i BETWEEN 1 AND 2
    ),
    pc AS (
        SELECT term_a, term_b, CAST(count(*) AS BIGINT) AS n_pair
        FROM pairs GROUP BY 1, 2
    ),
    uc AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
    tot AS (
        SELECT CAST((SELECT sum(n) FROM uc) AS DOUBLE) AS n_tok,
               CAST((SELECT sum(n_pair) FROM pc) AS DOUBLE) AS n_pairs_tot
    )
    SELECT pc.term_a, pc.term_b, pc.n_pair,
           round(ln((pc.n_pair / t.n_pairs_tot)
                    / ((ua.n / t.n_tok) * (ub.n / t.n_tok))), 6) AS pmi
    FROM pc
    JOIN uc ua ON ua.term = pc.term_a
    JOIN uc ub ON ub.term = pc.term_b
    CROSS JOIN tot t
    WHERE pc.n_pair >= {PMI_MIN_COUNT}
    """,
    doc="PMI token co-occurrence (window <=2, unordered pairs): the "
    "word2vec/GloVe co-occurrence-matrix preprocessing step. Pairs are "
    "generated ROW-LOCALLY with zip_with over shifted array slices — "
    "no positional self-join, zero shuffle until the pair count — then "
    "one hash aggregation on the pair key; unigram counts and totals "
    "are vocabulary-sized, broadcast into the scoring join. PMI's "
    "division tree is written identically on both engines so the "
    "doubles agree bit-for-bit before the shared round(6).",
)
def q138_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")

    def shifted_pairs(k: int):
        n = F.size(w)
        pair = lambda x, y: F.struct(
            F.least(x, y).alias("term_a"), F.greatest(x, y).alias("term_b")
        )
        return F.when(
            n > k, F.zip_with(F.slice(w, 1, n - k), F.slice(w, k + 1, n - k), pair)
        ).otherwise(F.array().cast("array<struct<term_a:string,term_b:string>>"))

    pairs = d.select(
        F.explode(F.concat(shifted_pairs(1), shifted_pairs(2))).alias("p")
    ).select("p.term_a", "p.term_b")
    # pc feeds the scored output AND the pair-total scalar; uc feeds both
    # endpoint joins AND the token-total scalar. Persist both so each
    # aggregation over the corpus runs exactly once (the plan otherwise
    # duplicates the pair-gen scan twice and the unigram scan three times).
    # Both caches are vocabulary-sized, not corpus-sized.
    pc = (
        pairs.groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .persist()
    )
    toks = d.select(F.explode(w).alias("term"))
    uc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n")).persist()
    n_tok = uc.agg(F.sum("n").cast("double").alias("n_tok"))
    n_pairs_tot = pc.agg(F.sum("n_pair").cast("double").alias("n_pairs_tot"))
    ua = uc.select(F.col("term").alias("term_a"), F.col("n").alias("na"))
    ub = uc.select(F.col("term").alias("term_b"), F.col("n").alias("nb"))
    return (
        pc.filter(F.col("n_pair") >= PMI_MIN_COUNT)
        .join(F.broadcast(ua), "term_a")
        .join(F.broadcast(ub), "term_b")
        .join(F.broadcast(n_tok))
        .join(F.broadcast(n_pairs_tot))
        .select(
            "term_a",
            "term_b",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n_pairs_tot"))
                    / ((F.col("na") / F.col("n_tok")) * (F.col("nb") / F.col("n_tok")))
                ),
                6,
            ).alias("pmi"),
        )
    )


# CCNet-style unigram LM quality threshold, in integer micro-nats of
# average per-token log-probability (fixture geometry: corpus avg ~= -3.40M)
LOGPROB_THRESH_MICRO = -3_410_000


@register(
    "q140_unigram_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    uc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS ntot FROM uc),
    lnp AS (
        SELECT term,
               CAST(floor(ln(CAST(cnt AS DOUBLE) / t.ntot) * 1000000 + 0.5)
                    AS BIGINT) AS lnp_micro
        FROM uc, tot t
    )
    SELECT toks.doc_id,
           CAST(count(*) AS BIGINT)          AS n_toks,
           CAST(sum(l.lnp_micro) AS BIGINT)  AS sum_lnp_micro,
           (sum(l.lnp_micro)
            >= {LOGPROB_THRESH_MICRO} * count(*)) AS keep
    FROM toks JOIN lnp l USING (term)
    GROUP BY toks.doc_id
    """,
    doc="Unigram language-model quality filter (the CCNet/Wikipedia-LM "
    "perplexity-filter shape, with the corpus itself as the LM): score "
    "each document by its summed token log-probability and keep docs "
    "above an average-per-token threshold. Float discipline: ln(p) is "
    "computed ONCE PER VOCABULARY TERM and immediately quantized to "
    "integer micro-nats (floor(x*1e6+0.5)), so the per-document "
    "aggregation is an integer sum — immune to float summation order — "
    "and the keep decision is an exact integer comparison "
    "(sum >= thresh * n) on both engines. Scale: the vocabulary table "
    "is broadcast; one hash aggregation on doc_id with map-side "
    "partials; no shuffle of raw text.",
)
def q140_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    uc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = uc.agg(F.sum("cnt").cast("double").alias("ntot"))
    lnp = (
        uc.join(F.broadcast(tot))
        .select(
            "term",
            F.floor(
                F.log(F.col("cnt").cast("double") / F.col("ntot")) * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lnp_micro"),
        )
    )
    return (
        toks.join(F.broadcast(lnp), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("lnp_micro").alias("sum_lnp_micro"),
        )
        .select(
            "doc_id",
            "n_toks",
            "sum_lnp_micro",
            (
                F.col("sum_lnp_micro")
                >= F.lit(LOGPROB_THRESH_MICRO) * F.col("n_toks")
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# exact frequency-threshold heavy hitters (Misra–Gries pre-filter)
# ---------------------------------------------------------------------------

HH_PHI_BP = 320  # heavy-hitter threshold: count/total >= 320/10000 (3.2%)
# Lossless-candidate bound: every token with global frequency >= phi is
# guaranteed to survive some partition's Misra–Gries summary as long as
# capacity + 1 > 1/phi (see misra_gries_candidates). 1/phi = 31.25 here.
HH_MG_CAPACITY = 32


def misra_gries_candidates(toks: DataFrame, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries summaries over column ``tok``, unioned
    and deduped — a GUARANTEED superset of every token whose global
    count exceeds ``n_p/(capacity+1)`` in at least one partition p.

    Implementation is the mergeable-summaries formulation (Agarwal,
    Cormode et al., PODS'12): each Arrow batch is counted exactly
    (``value_counts`` — an error-free MG summary of the batch), merged
    into the running summary by adding counts, then shrunk back to
    ``capacity`` entries by subtracting the (capacity+1)-th largest
    count from all and dropping the non-positives. Total decrement over
    a partition is <= n_p/(capacity+1), so any token with partition
    count above that bound ends with a positive counter — the classic
    MG guarantee, vectorized (no per-token Python loop).

    Scale: the summary is O(capacity) per partition regardless of
    vocabulary size, so the long tail of a 100 TB token stream never
    leaves its input partition; only <= partitions * capacity candidate
    rows shuffle into the distinct. The output is an INTERMEDIATE
    superset (partitioning-dependent), which is why callers must verify
    with an exact count — see q143.
    """
    def summarize(batches):
        acc = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf["tok"].value_counts()
            acc = acc.add(vc, fill_value=0)
            if len(acc) > capacity:
                kth = acc.nlargest(capacity + 1).iloc[-1]
                acc = acc - kth
                acc = acc[acc > 0]
        if len(acc):
            yield pd.DataFrame({"tok": acc.index.astype(str)})

    return toks.select("tok").mapInPandas(summarize, "tok string").distinct()


@register(
    "q143_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text <> ''
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks)
    SELECT tok, CAST(count(*) AS BIGINT) AS cnt
    FROM toks, tot
    GROUP BY tok, n
    HAVING count(*) * 10000 >= {HH_PHI_BP} * n
    """,
    doc="EXACT frequency-threshold heavy hitters (tokens with >= 3.2% of "
    "all token occurrences) with a Misra-Gries per-partition pre-filter. "
    "Two passes: (1) mapInPandas MG summaries of capacity 32 per "
    "partition, unioned+deduped into a candidate set — lossless for this "
    "threshold because capacity+1 > 1/phi and, by pigeonhole, a token "
    "with global frequency >= phi has frequency >= phi in SOME "
    "partition; (2) exact counts of the candidates only (the broadcast "
    "candidate join keeps the long tail from ever shuffling), filtered "
    "against the exact total with pure integer arithmetic "
    "(cnt*10000 >= phi_bp*n). The MG candidate set depends on the "
    "partitioning, but the verified OUTPUT is partition-independent and "
    "engine-exact — the oracle is the brute-force full groupBy. Scale: "
    "pass 1 shuffles <= partitions*capacity rows; pass 2 shuffles only "
    "true-candidate occurrences; at extreme partition counts the "
    "candidate distinct is itself a tree of MG merges away from "
    "constant size, and AQE falls back from broadcast if candidates "
    "somehow exceed the threshold.",
)
def q143_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("text") != "")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    cand = misra_gries_candidates(toks, HH_MG_CAPACITY)
    tot = toks.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cnt = (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        cnt.join(F.broadcast(tot))
        .filter(F.col("cnt") * 10000 >= F.lit(HH_PHI_BP) * F.col("n"))
        .select("tok", "cnt")
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
# ---------------------------------------------------------------------------

WINNOW_K = 4  # words per gram
WINNOW_W = 4  # grams per winnowing window


# shared oracle CTE: q144 emits it directly, q145 joins over it — keep the
# two in lockstep (the _walks_oracle_sql discipline).
_WINNOW_ORACLE_CTE = f"""
    w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
        SELECT doc_id, i.i AS pos,
               substr(md5(array_to_string(w[i.i:i.i + {WINNOW_K - 1}], ' ')),
                      1, 16) AS h
        FROM w, LATERAL (
            SELECT unnest(range(1, len(w) - {WINNOW_K - 2})) AS i
        ) i
        WHERE len(w) >= {WINNOW_K}
    ),
    win AS (
        SELECT doc_id,
               min(h || '-' || lpad(CAST(pos AS VARCHAR), 8, '0')) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
               ) AS sel,
               count(*) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING
               ) AS n
        FROM grams
    ),
    fps AS (
        SELECT DISTINCT doc_id, substr(sel, 1, 16) AS fp,
               CAST(substr(sel, 18) AS BIGINT) AS pos
        FROM win WHERE n = {WINNOW_W}
    )"""


@register(
    "q144_winnow_fingerprint",
    oracle=f"""
    WITH {_WINNOW_ORACLE_CTE}
    SELECT doc_id, fp, pos FROM fps
    """,
    doc="Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, "
    f"SIGMOD'03, the MOSS algorithm): hash every {WINNOW_K}-word gram, "
    f"slide a {WINNOW_W}-gram window, keep the window minimum "
    "(lowest-position tie-break) — the fingerprint selection behind "
    "robust substring matching and plagiarism/quote detection. The "
    "GUARANTEE: any shared word run covering a full window shares a "
    "selected fingerprint, and selection density is <= 2/(w+1) of "
    "grams. Min-selection is ONE window function over a single "
    "(hash||'-'||zero-padded-pos) sortable key — fixed-width hex+pad "
    "makes lexicographic order == (hash, pos) order in both engines, so "
    "no struct-min cross-engine gap. Scale: one exchange (hash-partition "
    "by doc_id) + an in-partition sorted window; output is density-"
    "bounded, never the full gram stream; partial trailing windows are "
    "excluded by the window count so every selection is a true "
    "w-window minimum.",
)
def q144_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints(load(spark, sf_dir, "documents"))


def winnow_fingerprints(d: DataFrame) -> DataFrame:
    """Winnowing over any (doc_id, text) frame — see q144's contract.
    Returns DataFrame[doc_id, fp, pos] of selected fingerprints."""
    w = F.split("text", " ")
    grams = (
        d.filter(F.size(w) >= WINNOW_K)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - WINNOW_K),
                    lambda i: F.array_join(F.slice(w, i + 1, WINNOW_K), " "),
                )
            ).alias("p0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("pos"),
            F.substring(F.md5("gram"), 1, 16).alias("h"),
        )
    )
    key = F.concat_ws(
        "-", F.col("h"), F.lpad(F.col("pos").cast("string"), 8, "0")
    )
    win = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, WINNOW_W - 1)
    )
    sel = grams.select(
        "doc_id",
        F.min(key).over(win).alias("sel"),
        F.count(F.lit(1)).over(win).alias("n"),
    ).filter(F.col("n") == WINNOW_W)
    return sel.select(
        "doc_id",
        F.substring("sel", 1, 16).alias("fp"),
        F.substring("sel", 18, 8).cast("bigint").alias("pos"),
    ).distinct()


@register(
    "q145_winnow_overlap_pairs",
    oracle=f"""
    WITH {_WINNOW_ORACLE_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(DISTINCT a.fp) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(DISTINCT a.fp) >= 2
    """,
    doc="Substring-overlap near-dup pairs — what winnowing is FOR (the "
    "MOSS matcher): join documents on shared selected fingerprints and "
    "keep pairs sharing >= 2 distinct fingerprints, i.e. pairs with "
    "repeated long verbatim word runs (boilerplate, quotes, mirrored "
    "passages). Composes q144's selection: only the density-bounded "
    "fingerprint stream is joined, never grams — the winnowing guarantee "
    "makes this equivalent to full-window substring overlap while the "
    "join input is <= 2/(w+1) of the corpus gram stream. Scale: one "
    "shuffle keyed on fp; corpus-wide boilerplate fingerprints are the "
    "hot keys, exactly the q98-shingle skew profile (salt or frequency-"
    "cap them upstream at extreme scale — a df-cap filter composes "
    "directly on the fps side before the join).",
)
def q145_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist: both self-join sides read the winnowing pipeline — without
    # it the gram+window selection runs twice (q142's subtree-duplication
    # note; process-lifetime cache, the q137 precedent).
    fps = (
        winnow_fingerprints(load(spark, sf_dir, "documents"))
        .select("doc_id", "fp")
        .distinct()
        .persist()
    )
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("fp").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Okapi BM25, k1 = 6/5, b = 3/4)
# ---------------------------------------------------------------------------

# Fixed literal query, alphabetical: the score is summed in this exact
# syntactic order in BOTH engines, so the float result is bit-identical.
Q150_QUERY_TERMS = ("hash", "spark", "stream", "window")
Q150_TOP_N = 20


def _bm25_oracle_sql() -> str:
    """DuckDB twin of q150. Mirrors the Spark arithmetic step for step:
    integer micro-nat idf, cross-multiplied integer tf-normalization,
    fixed-order double addition."""
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in Q150_QUERY_TERMS
    )
    any_term = " OR ".join(f"list_contains(w, '{t}')" for t in Q150_QUERY_TERMS)
    df_cols = ",\n               ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in Q150_QUERY_TERMS
    )
    idf_cols = ",\n               ".join(
        f"CAST(round(ln((n_docs - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
        f" * 1000000) AS BIGINT) AS idf_{t}"
        for t in Q150_QUERY_TERMS
    )
    contribs = "\n             + ".join(
        f"(CAST(idf_{t} * 22 * tf_{t} * n_toks AS DOUBLE)"
        f" / CAST(10 * tf_{t} * n_toks + 3 * n_toks + 9 * dl * n_docs"
        f" AS DOUBLE))"
        for t in Q150_QUERY_TERMS
    )
    n_match = " + ".join(
        f"CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END" for t in Q150_QUERY_TERMS
    )
    return f"""
    WITH d AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, w
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    tf AS (
        SELECT doc_id, dl,
               {tf_cols}
        FROM d
        WHERE {any_term}
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(dl) AS BIGINT) AS n_toks
        FROM d
    ),
    dfs AS (
        SELECT {df_cols}
        FROM tf
    ),
    consts AS (
        SELECT n_docs, n_toks,
               {idf_cols}
        FROM stats, dfs
    ),
    scored AS (
        SELECT doc_id,
               CAST({n_match} AS INTEGER) AS n_match,
               {contribs} AS score
        FROM tf, consts
    )
    SELECT doc_id, n_match, score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {Q150_TOP_N}
    """


def _bm25_base(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, w) — tokenized docs with length."""
    d = docs.select("doc_id", F.split("text", " ").alias("w"))
    return d.select("doc_id", F.size("w").cast("bigint").alias("dl"), "w")


def _bm25_tf(base: DataFrame) -> DataFrame:
    """(doc_id, dl, tf_<term>...) for candidate docs only: explode is
    filtered to the query-term IN-list before anything shuffles, so the
    aggregation input is bounded by query-term occurrences, not corpus
    token count."""
    toks = base.select(
        "doc_id", "dl", F.explode("w").alias("term")
    ).filter(F.col("term").isin(*Q150_QUERY_TERMS))
    return toks.groupBy("doc_id", "dl").agg(
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"tf_{t}")
            for t in Q150_QUERY_TERMS
        ]
    )


def _bm25_dfs_of(tf: DataFrame) -> DataFrame:
    """1-row (df_<term>...) from candidate tf rows."""
    return tf.agg(
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint"))
            .cast("bigint")
            .alias(f"df_{t}")
            for t in Q150_QUERY_TERMS
        ]
    )


def _bm25_rank(
    tf: DataFrame, stats: DataFrame, dfs: DataFrame
) -> DataFrame:
    """Shared consts + fixed-order scorer + top-k (the q150 arithmetic,
    extracted verbatim in r16 so the staged streaming twin q169 cannot
    drift — bit-identity depends on IDENTICAL Spark expressions, not
    merely the same formula). ``stats`` is 1-row (n_docs, n_toks);
    ``dfs`` is 1-row (df_<term>...)."""
    consts = stats.crossJoin(dfs).select(
        "n_docs",
        "n_toks",
        *[
            F.round(
                F.log(
                    (F.col("n_docs") - F.col(f"df_{t}") + 0.5)
                    / (F.col(f"df_{t}") + 0.5)
                    + 1.0
                )
                * 1000000
            )
            .cast("bigint")
            .alias(f"idf_{t}")
            for t in Q150_QUERY_TERMS
        ],
    )

    def contrib(t: str) -> F.Column:
        num = (
            F.col(f"idf_{t}") * 22 * F.col(f"tf_{t}") * F.col("n_toks")
        ).cast("double")
        den = (
            10 * F.col(f"tf_{t}") * F.col("n_toks")
            + 3 * F.col("n_toks")
            + 9 * F.col("dl") * F.col("n_docs")
        ).cast("double")
        return num / den

    score = contrib(Q150_QUERY_TERMS[0])
    for t in Q150_QUERY_TERMS[1:]:
        score = score + contrib(t)
    n_match = None
    for t in Q150_QUERY_TERMS:
        flag = (F.col(f"tf_{t}") > 0).cast("int")
        n_match = flag if n_match is None else n_match + flag
    return (
        tf.join(F.broadcast(consts))
        .select("doc_id", n_match.alias("n_match"), score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(Q150_TOP_N)
    )


@register(
    "q150_bm25_topk",
    oracle=_bm25_oracle_sql(),
    doc="Okapi BM25 ranked RETRIEVAL (k1=1.2, b=0.75): the global top-20 "
    "documents for a fixed multi-term query — the lexical retrieval "
    "stage of a RAG / training-data curation pipeline. Distinct from "
    "q85 (per-document BM25 scores, rounded for comparison): this is "
    "the top-k cut itself, which demands a BIT-IDENTICAL score so the "
    "ranking boundary transfers across engines with no rounding. Float discipline (the repo's cross-engine contract): idf "
    "is quantized ONCE per query term to integer micro-nats "
    "(round(ln(...)*1e6)); the tf normalization is cross-multiplied to "
    "an exact integer ratio (k1=6/5, b=3/4, avgdl=n_toks/n_docs give "
    "contrib = idf_micro*22*tf*T / (10*tf*T + 3*T + 9*dl*N)). Both "
    "sides are computed EXACTLY in int64 and cast to double with the "
    "same IEEE rounding in both engines, so the division is one "
    "correctly-rounded op on identical operands — bit-identity needs "
    "only that the int64 products never overflow: idf_micro*22*tf*T < "
    "2^63, which holds to T ~ 1e10 corpus tokens at per-doc query-term "
    "tf <= 15 and to T ~ 2e7 at tf ~ 1e3 (the fixture is orders of "
    "magnitude inside the bound). Past it, rescale idf to milli-nats "
    "or divide both ratio sides by a common power of ten — same "
    "contract, smaller operands. The per-document sum adds the "
    "per-term doubles in a fixed syntactic order, so the "
    "ranking and the hashed values both transfer exactly. Scale: tf "
    "candidates come from one explode+filter (predicate on the 4 query "
    "terms prunes the token stream before the doc_id aggregation); "
    "corpus stats and idf are a broadcast 1-row table; the top-20 is "
    "TakeOrderedAndProject (per-partition heap + driver merge), never "
    "a global sort or single-partition window.",
)
def q150_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _bm25_base(load(spark, sf_dir, "documents"))
    # tf feeds BOTH the df-statistics branch and the final scorer:
    # persist, or the explode+aggregate subtree (and its corpus scan)
    # runs twice (the q137/q142 subtree-duplication note; the cached
    # table is one narrow row per candidate document)
    tf = _bm25_tf(base).persist()
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("n_toks"),
    )
    return _bm25_rank(tf, stats, _bm25_dfs_of(tf))


# ---------------------------------------------------------------------------
# Registered round 17 (staged + dry-run-validated in r16; VERDICT r16
# item #2): q169 — q150's BM25 ranked retrieval computed over a LIVE
# index maintained by a real foreachBatch stream (the index family's
# capstone: q167 maintains the posting structure; this maintains the
# ranking statistics and answers a query from them).
#
# State per batch (all doc-disjoint, hence exactly additive):
#   - the batch's candidate tf rows (a doc's tf vector is computed
#     whole in its own batch — the doc_id carve guarantees it);
#   - ONE 1-row stats record (n_docs_b, n_toks_b, df_<term>_b...).
# The read-out aggregates the stats rows with plain sums (fully
# distributed, no driver collect) and scores the accumulated tf rows
# through the SAME _bm25_rank expressions q150 uses — bit-identity
# needs identical Spark expressions, which sharing the helper
# guarantees. Hash-oracled by q150's oracle VERBATIM.
#
# Scale: per batch the corpus is touched once (the batch's own rows);
# the ranking state is one narrow row per CANDIDATE doc plus one
# 1-row stats record per batch; answering a query is a broadcast of
# the folded consts + a TakeOrderedAndProject over the candidate rows.
# ---------------------------------------------------------------------------

_Q169_BATCHES = 3


def _bm25_fold_batch(state: dict, batch: DataFrame) -> None:
    base = _bm25_base(batch)
    tf_b = _bm25_tf(base).localCheckpoint(eager=True)
    stat_b = (
        base.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("n_toks"),
        )
        .crossJoin(_bm25_dfs_of(tf_b))
        .localCheckpoint(eager=True)
    )
    if "tf" not in state:
        state["tf"], state["stat"] = tf_b, stat_b
    else:
        state["tf"] = state["tf"].union(tf_b).localCheckpoint(eager=True)
        state["stat"] = (
            state["stat"].union(stat_b).localCheckpoint(eager=True)
        )


def stream_bm25_topk(
    docs: DataFrame, n_batches: int = _Q169_BATCHES,
    work_dir: str | None = None,
) -> DataFrame:
    """q150's top-k computed by DRIVING a file-source foreachBatch
    stream over a doc_id carve of ``docs`` (machinery in
    streaming/file_fold.py). Row-identical to the batch operator for
    ANY carve — every state component is doc-disjoint-additive and the
    read-out reuses q150's exact expressions. NULL doc_ids are kept,
    matching q150 and the shared oracle exactly (ADVICE r16): q150's
    corpus stats (n_docs, n_toks) count every row, and the carve's
    ``xxhash64(doc_id)`` sends every null row to ONE deterministic
    batch (xxhash64 skips null inputs, leaving the seed), so the null
    doc-group is batch-complete and groups into the same tf rows the
    batch build produces. (On the fixtures this is moot anyway —
    documents.doc_id is the table's PK, verified non-null.)"""
    from ..streaming.file_fold import drive_file_stream_fold

    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).localCheckpoint(eager=True)
    state = drive_file_stream_fold(
        d, "doc_id long, text string", ["doc_id"], n_batches,
        _bm25_fold_batch, work_dir,
    )
    if "tf" not in state:
        # empty corpus (the g45 empty rule): the batch pipeline over the
        # empty checkpointed input yields the correctly-shaped empty
        # top-k
        base = _bm25_base(d)
        tf = _bm25_tf(base)
        stats = base.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("n_toks"),
        )
        return _bm25_rank(tf, stats, _bm25_dfs_of(tf))
    stats = state["stat"].agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_toks"),
    )
    dfs = state["stat"].agg(
        *[
            F.sum(f"df_{t}").cast("bigint").alias(f"df_{t}")
            for t in Q150_QUERY_TERMS
        ]
    )
    return _bm25_rank(state["tf"], stats, dfs)


@register(
    "q169_stream_bm25_topk",
    oracle=_bm25_oracle_sql(),
    doc="q150's BM25 ranked retrieval answered from a LIVE index "
    "maintained by a real foreachBatch stream (registered r17; staged "
    "+ validated r16) — the index family's capstone: q167 maintains "
    "the posting structure, this maintains the ranking statistics and "
    "answers a top-k query from them. State per batch is doc-disjoint "
    "and hence exactly additive: the batch's candidate tf rows (a "
    "doc's tf vector is computed whole in its own batch — the doc_id "
    "carve guarantees it, nulls included: xxhash64 skips the null "
    "input so every null-id row lands in one deterministic batch) "
    "plus ONE 1-row stats record (n_docs, n_toks, df_<term>...). The "
    "read-out sums the stats rows distributedly and scores the "
    "accumulated tf rows through q150's EXACT shared _bm25_rank "
    "expressions — bit-identity is by construction, so q150's integer-"
    "micro-nat oracle certifies this gate VERBATIM. Scale: per batch "
    "the corpus is touched once (the batch's own rows); the ranking "
    "state is one narrow row per CANDIDATE doc plus one stats row per "
    "batch; answering is a broadcast of the folded consts + "
    "TakeOrderedAndProject over the candidates.",
)
def q169_stream_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_bm25_topk(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Streaming twin of q137: always-on inverted-index maintenance (r12).
#
# Corpus ingestion is append-only and a document's tokens live wholly in
# the batch that lands it, so the per-batch (term, doc_id, tf) partial
# tables partition the corpus tf table exactly — the read-time union IS
# the batch tf table, and stats/postings recomputed over it equal
# q137_inverted_index on the union corpus EXACTLY (pinned by the
# stream==batch equivalence test rather than a shared helper: q137 is a
# driver-stamped gate, left untouched by design).
# ---------------------------------------------------------------------------


def _tf_one_batch(
    batch_df: DataFrame, batch_id: int, snapshot_dir: str
) -> None:
    """One micro-batch: land the batch's (term, doc_id, tf) partials as
    its own snapshot partition (crash-safety — stage + atomic rename,
    replay discard, orphan sweep — shared in snapshot_util)."""
    from .snapshot_util import publish_partition

    tf = (
        batch_df.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    publish_partition(tf, snapshot_dir, batch_id)


def incremental_inverted_index(
    spark: SparkSession,
    incoming_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    schema=None,
):
    """q137's index build as an always-on ingestion job: watch
    ``incoming_dir`` for new document files; each micro-batch lands only
    its counts-only tf partials (never text). Serve the live index with
    inverted_index_snapshot(). Returns the StreamingQuery.

    Scale: per batch the expensive tokenize+aggregate touches only the
    new documents; the snapshot grows by counts rows, and index refresh
    cost is the read-time merge over partials — the standard
    segment-then-merge search-engine shape expressed as parquet
    partitions + one Spark aggregation."""
    from .snapshot_util import infer_watch_schema

    file_schema = infer_watch_schema(
        spark, incoming_dir, "incremental_inverted_index", schema
    )
    stream = spark.readStream.schema(file_schema).parquet(incoming_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: _tf_one_batch(
                batch_df, batch_id, snapshot_dir
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


_TF_SNAPSHOT_MEMO: dict[tuple, tuple] = {}


def _clear_tf_snapshot_memo() -> None:
    _TF_SNAPSHOT_MEMO.clear()


register_release_hook(_clear_tf_snapshot_memo)


def inverted_index_snapshot(
    spark: SparkSession, snapshot_dir: str
) -> DataFrame:
    """The live index over everything ingested: per-term df / total_tf
    stats plus the rank-capped rendered posting list — column-for-column
    q137_inverted_index's output on the union corpus (equivalence is
    test-pinned: tests/test_round12_ops.py).

    The snapshot resolves through live_batch_dirs, so reads stay exact
    across compact_snapshot runs and their crash points (VERDICT r12
    hazard #2 — the merge was O(every batch ever, forever)).

    Staleness (ADVICE r12): the tf persist is keyed on the CURRENT live
    parquet file identity (relpath + size per part — Spark part names
    embed a per-job UUID, so a wipe-and-republish under the same batch
    ids still changes the key), not the root path — Spark's cache
    manager matches file-source plans by path, so a root-path persist
    kept serving a frozen index after new batches landed. A key change
    untracks the stale entry and refreshes the path before re-reading;
    a weakref identity check guards against a recycled session id
    serving another session's DataFrame (review r13)."""
    import weakref

    from ..cache import track, untrack
    from .snapshot_util import live_batch_dirs

    base = (id(spark), os.path.abspath(snapshot_dir))
    # resolve dirs + file identity with one retry: a compact_snapshot's
    # source deletion may land between the listing and the stat —
    # re-resolving then picks up the installed fold, whose rows are
    # exactly the deleted sources' (review r13, second pass). This only
    # NARROWS the race: the parquet scan itself is lazy, so a compaction
    # deleting sources between this resolution and the first action (or
    # a cache re-scan after eviction) still fails loudly with a
    # FileNotFoundException — never wrong, but compact_snapshot's
    # quiesced-maintenance-window contract covers READERS too
    # (ADVICE r13: the two contracts now agree)
    for attempt in (0, 1):
        dirs = live_batch_dirs(snapshot_dir, require=True)
        try:
            part_key = tuple(
                (os.path.basename(d), fn, os.path.getsize(os.path.join(d, fn)))
                for d in dirs
                for fn in sorted(os.listdir(d))
                if fn.endswith(".parquet")
            )
            break
        except OSError:
            if attempt:
                raise
    memo = _TF_SNAPSHOT_MEMO.get(base)
    if memo is not None and memo[0]() is spark and memo[1] == part_key:
        tf = memo[2]
    else:
        if memo is not None and memo[0]() is spark:
            untrack(memo[2])
            spark.catalog.refreshByPath(snapshot_dir)
        # tf feeds BOTH branches; Python DataFrame reuse does not dedupe
        # subtrees (q137's own lesson), so without this the accumulated
        # snapshot parquet is scanned twice per read. Session-retained
        # cache; contract in queries/graph._materialize.
        tf = track(
            spark.read.parquet(*dirs)
            .select("term", "doc_id", "tf")
            .persist()
        )
        _TF_SNAPSHOT_MEMO[base] = (weakref.ref(spark), part_key, tf)
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf")
    )
    wr = W.partitionBy("term").orderBy(F.col("tf").desc(), "doc_id")
    top = tf.withColumn("rn", F.row_number().over(wr)).filter(F.col("rn") <= 5)
    postings = top.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("tf")).alias("neg_tf"),
                            F.col("doc_id").alias("d"),
                            F.col("tf").alias("t"),
                        )
                    )
                ),
                lambda x: F.concat_ws(
                    ":", x["d"].cast("string"), x["t"].cast("string")
                ),
            ),
            ",",
        ).alias("postings")
    )
    return stats.join(postings, "term").select(
        "term", "df", "total_tf", "postings"
    )
