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


# ---------------------------------------------------------------------------
# g47 incremental connected components (STAGED r17 candidate #3)
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_g47_staged_stream_cc_pair(spark, sf_small):
    """Dry-run oracle pair for the STAGED g47 gate: component-size
    histogram through the streaming min-label fold must hash-match the
    g12-shape recursive-CTE oracle on the <400-node fixture subgraph
    (rebuild identity: the min-label fixpoint over a fixed edge set is
    unique, so any carve folds to the same labels)."""
    from hadoopwebgraph_spark.functions.ccstream import (
        _g47_oracle,
        g47_stream_connected_components,
    )
    from tests.oracle_util import compare

    compare(
        spark, sf_small, "g47_stream_connected_components",
        g47_stream_connected_components, _g47_oracle(),
    )


def test_cc_fold_matches_batch_on_chain_merge(spark):
    """The adversarial delta case: two long chains (components 0.. and
    100..) merged by ONE late edge — the quotient sees a single
    (0, 100) component pair and the relabel must rewrite every node of
    the absorbed chain WITHOUT touching old edges. Also checks a batch
    that merges nothing (replayed edges) changes nothing."""
    from hadoopwebgraph_spark.functions.ccstream import cc_over_batches
    from hadoopwebgraph_spark.queries.graph_algos import (
        connected_components,
    )

    chain_a = [(i, i + 1) for i in range(0, 12)]
    chain_b = [(100 + i, 101 + i) for i in range(0, 12)]
    bridge = [(12, 100)]
    noop = [(3, 4), (105, 106)]  # replayed edges: semantic no-ops
    batches = [chain_a + chain_b, noop, bridge]
    got = sorted(
        map(tuple, cc_over_batches([_edges(spark, b) for b in batches]).collect())
    )
    want = sorted(
        map(
            tuple,
            connected_components(
                _edges(spark, chain_a + chain_b + bridge)
            ).collect(),
        )
    )
    assert got == want
    # everything merged into the single component labeled 0
    assert set(c for _, c in got) == {0}


def test_cc_stream_carve_independence(spark):
    """Different batch counts give identical histograms."""
    from hadoopwebgraph_spark.functions.ccstream import cc_streaming_sizes

    pairs = (
        [(i, i + 1) for i in range(0, 8)]
        + [(20, 21), (21, 22), (40, 41)]
        + [(8, 20)]
    )
    e = _edges(spark, pairs)
    got2 = sorted(map(tuple, cc_streaming_sizes(e, 2).collect()))
    got5 = sorted(map(tuple, cc_streaming_sizes(e, 5).collect()))
    assert got2 == got5
    # components: {0..8,20,21,22} = 12 nodes, {40,41} size 2
    assert got2 == [(2, 1), (12, 1)]


def test_cc_stream_empty_edges(spark):
    from hadoopwebgraph_spark.functions.ccstream import cc_streaming_sizes

    e = _edges(spark, [(5, 5)])  # only a self-loop -> empty after norm
    out = cc_streaming_sizes(e, 3)
    assert out.columns == ["size", "n_components"]
    assert out.count() == 0


def test_g47_not_registered_yet():
    from hadoopwebgraph_spark.registry import all_queries

    assert "g47_stream_connected_components" not in all_queries()


def test_cc_distributed_quotient_path(spark, monkeypatch):
    """Force the over-cap branch: with _QUOTIENT_CAP=0 every merging
    batch routes through the distributed connected_components on the
    quotient instead of the driver union-find — results must be
    identical (the cap only picks the engine)."""
    import hadoopwebgraph_spark.functions.ccstream as cc
    from hadoopwebgraph_spark.queries.graph_algos import (
        connected_components,
    )

    monkeypatch.setattr(cc, "_QUOTIENT_CAP", 0)
    chain_a = [(i, i + 1) for i in range(0, 6)]
    chain_b = [(100 + i, 101 + i) for i in range(0, 6)]
    got = sorted(
        map(
            tuple,
            cc.cc_over_batches(
                [_edges(spark, chain_a + chain_b), _edges(spark, [(6, 100)])]
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            connected_components(
                _edges(spark, chain_a + chain_b + [(6, 100)])
            ).collect(),
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# q168 streaming MinHash dedup (STAGED r17+ candidate #4)
# ---------------------------------------------------------------------------


def test_q168_staged_stream_minhash_pair(spark, sf_small):
    """Dry-run oracle pair for the STAGED q168 gate: the incrementally-
    maintained MinHash-LSH pair set must hash-match q62's oracle
    VERBATIM (rebuild identity: doc-complete carve + probe-then-append
    emits every bucket-sharing pair exactly once)."""
    from hadoopwebgraph_spark.functions.dedup import (
        _Q62_ORACLE,
        q168_stream_minhash_dedup,
    )
    from tests.oracle_util import compare

    compare(
        spark, sf_small, "q168_stream_minhash_dedup",
        q168_stream_minhash_dedup, _Q62_ORACLE,
    )


def test_stream_minhash_carve_independence_and_cross_batch(spark):
    """Identical long documents forced into DIFFERENT micro-batches must
    pair via the store probe (the cross stage), and any batch count
    yields the batch operator's exact pair set."""
    from hadoopwebgraph_spark.functions.dedup import (
        minhash_candidate_pairs,
        stream_minhash_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),                      # exact dup of 1
        (3, base + " extra tail words here"),  # near dup
        (4, "completely different words with no shared shingles at all ok"),
        (5, base),                      # third copy
        (6, "another unrelated document text body with many words inside"),
    ]
    d = _docs_df(spark, rows)
    want = sorted(map(tuple, minhash_candidate_pairs(d).collect()))
    got2 = sorted(map(tuple, stream_minhash_pairs(d, 2).collect()))
    got5 = sorted(map(tuple, stream_minhash_pairs(d, 5).collect()))
    # with 5 batches the three copies of `base` are (almost surely)
    # split across batches, exercising the store probe
    assert got2 == want and got5 == want
    pairs = set(got2)
    assert {(1, 2), (1, 5), (2, 5)} <= pairs


def test_stream_minhash_empty_corpus(spark):
    from hadoopwebgraph_spark.functions.dedup import stream_minhash_pairs

    d = _docs_df(spark, []).filter(F.lit(False))
    out = stream_minhash_pairs(d, 3)
    assert out.columns == ["doc_a", "doc_b"]
    assert out.count() == 0


def test_stream_minhash_null_doc_id_matches_batch(spark):
    """A NULL doc_id must not fabricate a self-pair through the cross
    stage's least/greatest (review r16 pass 4): both the stream and the
    batch operator drop null-id docs."""
    from hadoopwebgraph_spark.functions.dedup import (
        minhash_candidate_pairs,
        stream_minhash_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = _docs_df(spark, [(None, base), (1, base), (2, base)])
    want = sorted(map(tuple, minhash_candidate_pairs(d).collect()))
    got = sorted(map(tuple, stream_minhash_pairs(d, 3).collect()))
    assert got == want == [(1, 2)]


def test_union_find_min_property():
    """_union_find_min vs a brute-force transitive closure on random
    pair lists (hypothesis): the mapping must send every merged id to
    the minimum id of its class and omit ids that are their own root."""
    from hypothesis import given, settings, strategies as st

    from hadoopwebgraph_spark.functions.ccstream import _union_find_min

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=30),
            ),
            max_size=40,
        )
    )
    def check(pairs):
        mapping = _union_find_min(pairs)
        # brute force: iterate merges to fixpoint
        comp = {}
        for a, b in pairs:
            comp.setdefault(a, a)
            comp.setdefault(b, b)
        # the pair-iteration fixpoint alone converges to min labels
        # (values only decrease and are bounded below)
        changed = True
        while changed:
            changed = False
            for a, b in pairs:
                lo = min(comp[a], comp[b])
                if comp[a] != lo or comp[b] != lo:
                    comp[a] = comp[b] = lo
                    changed = True
        want = {x: r for x, r in comp.items() if r != x}
        assert mapping == want, (pairs, mapping, want)

    check()


def test_staged_inventory_consistent():
    """The central staged inventory must (a) resolve every entry to a
    callable + non-empty oracle, and (b) contain NO name that is
    already registered — a stale entry after an r17 registration would
    double-run the gate."""
    from hadoopwebgraph_spark.registry import all_queries
    from hadoopwebgraph_spark.staged import staged_queries

    staged = staged_queries()
    assert len(staged) >= 1  # no magic count: promotions delete entries
    registered = set(all_queries())
    for name, (fn, oracle, cost) in staged.items():
        assert callable(fn) and oracle.strip() and cost
        assert name not in registered, name


def test_file_fold_single_batch_degenerate(spark):
    """n_batches=1 is the degenerate carve (one file, one micro-batch):
    the fold must fire exactly once and see every row."""
    from hadoopwebgraph_spark.streaming.file_fold import (
        drive_file_stream_fold,
    )

    rows = [(i, i * 2) for i in range(1, 7)]
    d = spark.createDataFrame(rows, "a long, c long")
    calls: list[int] = []

    def fold(state, batch):
        calls.append(batch.count())
        state["n"] = state.get("n", 0) + batch.count()

    state = drive_file_stream_fold(d, "a long, c long", ["a"], 1, fold)
    assert calls == [6] and state["n"] == 6


# ---------------------------------------------------------------------------
# q169 streaming BM25 top-k (STAGED r17+ candidate #5)
# ---------------------------------------------------------------------------


def test_q169_staged_stream_bm25_pair(spark, sf_small):
    """Dry-run oracle pair for the STAGED q169 gate: BM25 top-k over a
    live streamed index must hash-match q150's oracle VERBATIM —
    bit-identical scores via the shared _bm25_rank expressions over
    exactly-additive folded statistics."""
    from hadoopwebgraph_spark.functions.text import (
        _bm25_oracle_sql,
        q169_stream_bm25_topk,
    )
    from tests.oracle_util import compare

    compare(
        spark, sf_small, "q169_stream_bm25_topk",
        q169_stream_bm25_topk, _bm25_oracle_sql(),
    )


def test_stream_bm25_carve_independence(spark):
    """Any batch count yields the batch operator's exact ranking —
    including tie regions (docs with identical scores order by doc_id)
    and idf sensitivity to the FULL corpus stats (docs with no query
    term still change n_docs/n_toks and therefore every score)."""
    from pyspark.sql import functions as F  # noqa: F811

    from hadoopwebgraph_spark.functions.text import (
        _bm25_base,
        _bm25_dfs_of,
        _bm25_rank,
        _bm25_tf,
        stream_bm25_topk,
    )

    rows = [
        (1, "spark stream window hash join"),
        (2, "spark spark spark filler filler filler filler"),
        (3, "no query terms at all in this document body"),
        (4, "window window hash"),
        (5, "stream"),
        (6, "hash spark"),
        (7, "another term free document padding the corpus statistics"),
        (8, "hash spark"),  # same text as 6 -> same score, doc_id tie-break
    ]
    d = _docs_df(spark, rows)
    base = _bm25_base(d)
    tf = _bm25_tf(base)
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("n_toks"),
    )
    want = [tuple(r) for r in _bm25_rank(tf, stats, _bm25_dfs_of(tf)).collect()]
    got2 = [tuple(r) for r in stream_bm25_topk(d, 2).collect()]
    got5 = [tuple(r) for r in stream_bm25_topk(d, 5).collect()]
    assert got2 == want and got5 == want  # ORDERED compare: ranking too
    assert [r[0] for r in want if r[0] in (6, 8)] == [6, 8]  # tie-break


def test_stream_bm25_empty_corpus(spark):
    from hadoopwebgraph_spark.functions.text import stream_bm25_topk

    d = _docs_df(spark, []).filter(F.lit(False))
    out = stream_bm25_topk(d, 3)
    assert out.columns == ["doc_id", "n_match", "score"]
    assert out.count() == 0


def test_stream_bm25_null_doc_id_matches_batch(spark):
    """NULL doc_ids are KEPT (ADVICE r16): q150's corpus stats count
    every row and its tf grouping keys on (doc_id, dl), so null-id docs
    shift idf and can themselves rank. The carve's xxhash64(doc_id)
    skips the null input (leaving the seed), landing every null row in
    ONE deterministic batch — the null doc-group is batch-complete and
    the stream is row-identical to the batch build, including the
    merge of same-(null, dl) rows into one tf group."""
    from hadoopwebgraph_spark.functions.text import (
        _bm25_base,
        _bm25_dfs_of,
        _bm25_rank,
        _bm25_tf,
        stream_bm25_topk,
    )

    rows = [
        (None, "spark hash stream window spark"),  # null-id candidate
        (None, "no query terms at all here ok"),   # null-id, stats-only
        (None, "spark hash stream window spark"),  # same (null, dl) group
        (1, "spark stream window hash join"),
        (2, "window window hash"),
        (3, "term free document padding corpus statistics"),
    ]
    d = _docs_df(spark, rows)
    base = _bm25_base(d)
    tf = _bm25_tf(base)
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("n_toks"),
    )
    want = [tuple(r) for r in _bm25_rank(tf, stats, _bm25_dfs_of(tf)).collect()]
    got = [tuple(r) for r in stream_bm25_topk(d, 3).collect()]
    assert got == want  # ORDERED: the ranking transfers, nulls included
    assert any(r[0] is None for r in want)  # the null group actually ranks
