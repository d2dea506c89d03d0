"""Distributed BPE tokenizer training — the vocabulary-learning half of
the tokenization pipeline (q82 counts tokens with a fixed regex; this
LEARNS the merge table from the corpus).

Classic byte-pair encoding over the word histogram: start from
characters, repeatedly (1) count adjacent symbol pairs weighted by word
frequency, (2) take the globally most frequent pair (ties broken
lexicographically, so training is deterministic), (3) merge that pair
everywhere. Each round is ONE distributed pair-count aggregation
(explode + map-side-combined groupBy) plus an embarrassingly parallel
Arrow-batched merge-apply; the only driver traffic per round is the
1-row argmax. At 100 TB the word histogram is tiny compared to the
corpus (Heaps' law), so rounds run on the compacted histogram, exactly
like production tokenizer trainers.

Oracle note: the merge-apply rewrites arrays iteratively, which SQL
cannot restate without procedural extensions — q115 is registered
rows-only; exactness is certified against a pure-Python reference BPE
in tests/test_extensions.py instead (same policy as the ANN indexes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def _merge_pair(tokens: list[str], a: str, b: str) -> list[str]:
    """One left-to-right merge pass of the pair (a, b) -> a+b."""
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        if i + 1 < n and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def bpe_reference(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Pure-Python reference trainer (tests pin the Spark path to this)."""
    vocab = {w: ([*w], c) for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for toks, c in vocab.values():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] = pairs.get((toks[i], toks[i + 1]), 0) + c
        if not pairs:
            break
        # deterministic: max count, then lexicographically SMALLEST pair
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        vocab = {
            w: (_merge_pair(toks, *best), c) for w, (toks, c) in vocab.items()
        }
    return merges


def bpe_train(words: DataFrame, n_merges: int = 8) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from DataFrame[word, c].

    Returns [(left, right, pair_count)] in merge order. The histogram
    stays distributed; each round is one pair-count shuffle + a 1-row
    driver argmax + an Arrow-batched merge-apply."""
    spark = words.sparkSession
    cur = words.select(
        F.split("word", "").alias("toks"), F.col("c").cast("long").alias("c")
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            cur.select(
                F.posexplode(F.slice("toks", 1, F.size("toks") - 1)).alias(
                    "i", "left"
                ),
                "toks",
                "c",
            )
            .select(
                "left",
                F.expr("toks[i + 1]").alias("right"),
                "c",
            )
            .groupBy("left", "right")
            .agg(F.sum("c").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "left", "right").limit(1).collect()
        if not top:
            break
        a, b, n = top[0].left, top[0].right, int(top[0].n)
        merges.append((a, b, n))

        def apply_merge(batches, a=a, b=b):
            for pdf in batches:
                pdf["toks"] = [
                    _merge_pair(list(t), a, b) for t in pdf["toks"]
                ]
                yield pdf

        cur = cur.mapInPandas(
            apply_merge, "toks array<string>, c long"
        ).localCheckpoint()
    return merges


@register(
    "q115_bpe_train",
    doc="Distributed BPE tokenizer training on the documents word "
    "histogram: 8 merge rounds, each one pair-count shuffle + 1-row "
    "argmax + Arrow-batched merge-apply (rows-only: the iterative "
    "array rewrite is not SQL-restatable; exactness is pinned to a "
    "pure-Python reference trainer in tests/test_extensions.py).",
)
def q115_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merges = bpe_train(words, n_merges=8)
    return spark.createDataFrame(
        [(i, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "merge_idx int, left string, right string, pair_count long",
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize ``DataFrame[doc_id, text]`` with a learned merge table:
    split to characters, apply the merges in learned order per word
    (Arrow-batched; the merge list broadcasts with the task closure).
    Returns DataFrame[doc_id, n_tokens, n_chars] — the compression the
    vocabulary buys, per document."""

    pairs = list(merges)

    def encode(batches):
        for pdf in batches:
            n_tokens, n_chars = [], []
            for text in pdf["text"]:
                total = 0
                chars = 0
                for w in str(text).split(" "):
                    if not w:
                        continue
                    toks = [*w]
                    for a, b in pairs:
                        toks = _merge_pair(toks, a, b)
                    total += len(toks)
                    chars += len(w)
                n_tokens.append(total)
                n_chars.append(chars)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                    "n_chars": pd.Series(n_chars, dtype="int64"),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        encode, "doc_id long, n_tokens long, n_chars long"
    )
