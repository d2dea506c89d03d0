"""Round-16 staged work: the q167 incremental inverted-index gate
(STAGED for r17 — VERDICT r15 #7's "g45 pattern applied to an existing
index build"). The dry-run oracle pair, carve-independence, the
fold-vs-batch rebuild identity on adversarial synthetic corpora, and
the empty-corpus edge rule."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _index_rows(df):
    return sorted(map(tuple, df.collect()))


def test_q167_staged_stream_index_pair(spark, sf_small):
    """Dry-run oracle pair for the STAGED r17 gate: the incremental
    index driven through a real foreachBatch stream must hash-match the
    SAME DuckDB oracle as the batch gate q137 (rebuild identity — the
    carve is on doc_id, stats merge additively over doc-disjoint
    batches, and the top-5 posting truncation is monotone)."""
    from hadoopwebgraph_spark.functions.text import (
        _Q137_ORACLE,
        q167_stream_inverted_index,
    )
    from tests.oracle_util import compare

    compare(
        spark, sf_small, "q167_stream_inverted_index",
        q167_stream_inverted_index, _Q137_ORACLE,
    )


def test_stream_inverted_index_carve_independence(spark):
    """Different batch counts give identical index rows — the claim the
    staged gate registers on."""
    from hadoopwebgraph_spark.functions.text import (
        q137_inverted_index,
        stream_inverted_index,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "cat cat cat dog"),
        (4, "a mat on a mat"),
        (5, "the the the the the the"),
        (6, "dog"),
        (7, "cat dog mat on sat the a"),
    ]
    d = _docs_df(spark, rows)
    got2 = _index_rows(stream_inverted_index(d, 2))
    got5 = _index_rows(stream_inverted_index(d, 5))
    # batch twin over the same rows via the shared helpers
    from hadoopwebgraph_spark.functions.text import (
        _render_postings,
        _stats_of,
        _tf_of,
        _top5,
    )

    tf = _tf_of(d)
    stats = _stats_of(tf)
    want = _index_rows(
        stats.join(_render_postings(_top5(tf)), "term")
        .select("term", "df", "total_tf", "postings")
    )
    assert got2 == want and got5 == want


def test_index_fold_matches_batch_on_tie_heavy_corpus(spark):
    """Rebuild identity where it is most fragile: many tf ties per term
    (the truncation boundary is decided by doc_id order) and >5 docs per
    term so the cap actually evicts. Fold doc batches by hand through
    _index_fold_batch and compare against the one-shot build."""
    from hadoopwebgraph_spark.functions.text import (
        _index_fold_batch,
        _render_postings,
        _stats_of,
        _tf_of,
        _top5,
    )

    # 12 docs all containing 'x' once (pure tie on tf=1 -> doc_id order
    # decides the top-5) and 'y' with tf == doc_id (strict order)
    rows = [(i, "x " + " ".join(["y"] * i)) for i in range(1, 13)]
    d = _docs_df(spark, rows)
    state: dict = {}
    for lo, hi in [(1, 5), (5, 9), (9, 13)]:
        _index_fold_batch(
            state, d.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        )
    got = _index_rows(
        state["stats"].join(_render_postings(state["post"]), "term")
        .select("term", "df", "total_tf", "postings")
    )
    tf = _tf_of(d)
    want = _index_rows(
        _stats_of(tf).join(_render_postings(_top5(tf)), "term")
        .select("term", "df", "total_tf", "postings")
    )
    assert got == want
    # the tie case: term 'x' must list doc_ids 1..5 (ascending tie-break)
    x = dict((r[0], r[3]) for r in got)["x"]
    assert x == "1:1,2:1,3:1,4:1,5:1"


def test_stream_inverted_index_empty_corpus(spark):
    """An empty corpus stages no files and fires no micro-batch; the
    gate returns the batch twin's empty result instead of raising (the
    g45 empty rule)."""
    from hadoopwebgraph_spark.functions.text import stream_inverted_index

    d = _docs_df(spark, []).filter(F.lit(False))
    out = stream_inverted_index(d, 3)
    assert out.columns == ["term", "df", "total_tf", "postings"]
    assert out.count() == 0


def test_q167_not_registered_yet():
    """q167 stays STAGED in r16 (window budget spent on g45/g46) — the
    registry must not carry it until r17 spends a slot."""
    from hadoopwebgraph_spark.registry import all_queries

    assert "q167_stream_inverted_index" not in all_queries()


def test_file_fold_preserves_caller_carve_named_columns(spark):
    """The carve helper must not clobber caller columns named like its
    internal bucket column (review r16): rows with columns 'b' and
    '__carve_b' round-trip through the staged files intact."""
    from hadoopwebgraph_spark.streaming.file_fold import (
        drive_file_stream_fold,
    )

    rows = [(i, i * 10, i * 100) for i in range(1, 9)]
    d = spark.createDataFrame(rows, "k long, b long, __carve_b long")
    seen: list = []

    def fold(state, batch):
        seen.extend(map(tuple, batch.select("k", "b", "__carve_b").collect()))

    state = drive_file_stream_fold(
        d, "k long, b long, __carve_b long", ["k"], 3, fold
    )
    assert state == {}
    assert sorted(seen) == sorted(rows)
