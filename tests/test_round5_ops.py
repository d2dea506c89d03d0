"""Unit tests for the round-5 scale-technique / graph operators beyond
their oracle parity: hand-computed fixtures, invariants (mass
conservation, partition-count independence), and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


# ---------------------------------------------------------------------------
# personalized PageRank
# ---------------------------------------------------------------------------


def test_ppr_mass_conserved(spark):
    """Teleport + dangling both restart at the seeds, so total rank mass
    stays exactly 1 every iteration."""
    from hadoopwebgraph_spark.queries.graph_algos import personalized_pagerank

    e = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])  # 3 dangles
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node int")
    seeds = spark.createDataFrame([(0,)], "node int")
    pr = personalized_pagerank(e, seeds, nodes, iterations=5)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_ppr_unreachable_nodes_get_zero(spark):
    """A node not reachable from the seed set (and not a seed) must end
    with rank exactly 0 — personalization localizes the walk."""
    from hadoopwebgraph_spark.queries.graph_algos import personalized_pagerank

    # component {0,1} and disconnected component {2,3}; seed = 0
    e = _edges(spark, [(0, 1), (1, 0), (2, 3), (3, 2)])
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node int")
    seeds = spark.createDataFrame([(0,)], "node int")
    pr = personalized_pagerank(e, seeds, nodes, iterations=4)
    by_node = {r["node"]: r["rank"] for r in pr.collect()}
    assert by_node[2] == 0.0 and by_node[3] == 0.0
    assert by_node[0] > 0.0 and by_node[1] > 0.0


# ---------------------------------------------------------------------------
# link prediction (hand-computed Jaccard)
# ---------------------------------------------------------------------------


def test_link_prediction_hand_computed(spark, monkeypatch):
    """Square 0-1-2-3-0: opposite corners share BOTH neighbors and are
    unlinked -> Jaccard 2/2 = 1.0 for (0,2) and (1,3); no other unlinked
    pair shares a neighbor."""
    import hadoopwebgraph_spark.queries.graph_algos as ga

    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    monkeypatch.setattr(ga, "edges_df", lambda s: e)
    out = ga.g22_link_prediction(spark, "unused")
    rows = {(r["a"], r["b"]): (r["common"], r["jaccard"]) for r in out.collect()}
    assert rows == {(0, 2): (2, 1.0), (1, 3): (2, 1.0)}


def test_reciprocity_hand_computed(spark, monkeypatch):
    """Arcs 0->1, 1->0, 1->2 (plus a self loop that must be ignored):
    2 of 3 arcs reciprocated."""
    import hadoopwebgraph_spark.queries.graph as gq

    e = _edges(spark, [(0, 1), (1, 0), (1, 2), (2, 2)])
    monkeypatch.setattr(gq, "edges_df", lambda s: e)
    row = gq.g23_reciprocity(spark, "unused").collect()[0]
    assert row["n_edges"] == 3
    assert row["n_reciprocal"] == 2
    assert abs(row["reciprocity"] - round(2 / 3, 6)) < 1e-12


# ---------------------------------------------------------------------------
# deterministic sampling: partition-count invariance
# ---------------------------------------------------------------------------


def test_priority_sample_partition_invariant(spark, sf_small):
    """The priority sample is a pure function of content (md5), so the
    selected set must not change with the physical partitioning."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.sampling import q121_weighted_sample

    base = {r["doc_id"] for r in q121_weighted_sample(spark, sf_small).collect()}

    docs = load(spark, sf_small, "documents").repartition(17)
    v = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    u = (v + F.lit(0.5)) / F.lit(4294967296.0)
    reparted = {
        r["doc_id"]
        for r in docs.select("doc_id", (F.col("n_chars") / u).alias("priority"))
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(50)
        .collect()
    }
    assert base == reparted


def test_substring_dedup_flags_planted_duplicate(spark, tmp_path, monkeypatch):
    """Two docs sharing an 8-token span are both flagged; a doc with no
    shared span is not."""
    import hadoopwebgraph_spark.functions.dedup as dd

    span = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"unique one {span} tail tokens here now"),
        (2, f"other head words {span} and a different ending"),
        (3, "completely different text with eight plus tokens in it ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(
        dd, "load", lambda spark, sf_dir, name: df
    )
    out = {r["doc_id"]: r["n_dup_grams"] for r in
           dd.q119_substring_dedup(spark, "unused").collect()}
    assert 1 in out and 2 in out and 3 not in out
    assert out[1] >= 1 and out[2] >= 1


# ---------------------------------------------------------------------------
# salted operators agree with unsalted under every salt count
# ---------------------------------------------------------------------------


def test_salted_count_distinct_matches_plain(spark, sf_small):
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.skew import salted_count_distinct

    ev = load(spark, sf_small, "events")
    plain = {
        (r["event_type"], r["n"]) for r in
        ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for n_salts in (1, 7, 64):
        salted = {
            (r["event_type"], r["n_distinct"]) for r in
            salted_count_distinct(ev, "event_type", "user_id", n_salts).collect()
        }
        assert salted == plain, f"n_salts={n_salts}"


def test_bloom_join_confs_do_not_leak(spark, sf_small):
    """q118 runs on an isolated newSession: the calling session's
    broadcast threshold and bloom confs stay untouched afterward."""
    from hadoopwebgraph_spark.queries.scale_ops import q118_bloom_filter_join

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    q118_bloom_filter_join(spark, sf_small).collect()
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


def test_incremental_dedup_stream(spark, tmp_path):
    """Two micro-batches through the streaming corpus-refresh dedup:
    batch 2's duplicates of batch 1 (and of the pre-seeded snapshot) are
    dropped; within-batch duplicates collapse to the first doc_id."""
    import os

    from hadoopwebgraph_spark.functions.dedup import incremental_dedup_stream

    incoming = str(tmp_path / "incoming")
    snapshot = str(tmp_path / "snap")
    out = str(tmp_path / "out")

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b1 = spark.createDataFrame(
        [
            (1, "alpha text", "en", "web", 10),
            (2, "beta text", "en", "web", 9),
            (3, "alpha text", "en", "web", 10),  # within-batch dup of 1
        ],
        schema,
    )
    # micro-batch files go directly into the watched directory (the file
    # source treats non-k=v subdirectories as opaque, not as new files)
    b1.write.mode("append").parquet(incoming)

    q = incremental_dedup_stream(
        spark, incoming, snapshot, out, str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        b2 = spark.createDataFrame(
            [
                (10, "beta text", "en", "web", 9),   # dup of accepted doc 2
                (11, "gamma text", "en", "web", 10),  # genuinely new
            ],
            schema,
        )
        b2.write.mode("append").parquet(incoming)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {1, 2, 11}
    n_digests = spark.read.parquet(os.path.join(snapshot, "digests")).count()
    assert n_digests == 3  # alpha, beta, gamma


def test_substring_dedup_matches_python_reference(spark):
    """Randomized cross-check of q119 against a pure-Python gram counter:
    tiny 3-letter vocabulary so 8-gram collisions actually occur."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import hadoopwebgraph_spark.functions.dedup as dd

    token = st.sampled_from(["a", "b", "c"])
    doc = st.lists(token, min_size=0, max_size=14).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=8)

    orig_load = dd.load

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpus)
    def check(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        dd.load = lambda spark, sf_dir, name: df
        try:
            got = {
                r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
                for r in dd.q119_substring_dedup(spark, "unused").collect()
            }
        finally:
            dd.load = orig_load
        # python reference (split(' ') keeps empty tokens, like both engines)
        gram_count = Counter()
        per_doc = {}
        for i, t in rows:
            if t == "":
                continue
            toks = t.split(" ")
            if len(toks) < 8:
                continue
            grams = [
                " ".join(toks[p : p + 8]) for p in range(len(toks) - 7)
            ]
            per_doc[i] = grams
            gram_count.update(grams)
        want = {}
        for i, grams in per_doc.items():
            dups = sum(1 for g in grams if gram_count[g] >= 2)
            if dups > 0:
                want[i] = (len(grams), dups)
        assert got == want

    check()


def test_salted_join_matches_plain(spark):
    """salted_join must equal the plain inner join row-for-row, including
    under duplicate keys on both sides."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hadoopwebgraph_spark.functions.skew import salted_join

    keys = st.integers(min_value=0, max_value=4)

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.tuples(keys, st.integers(0, 99)), min_size=0, max_size=20),
        st.lists(st.tuples(keys, st.integers(0, 99)), min_size=0, max_size=8),
    )
    def check(big_rows, small_rows):
        big = spark.createDataFrame(big_rows, "k int, v int") if big_rows else \
            spark.createDataFrame([], "k int, v int")
        small = spark.createDataFrame(small_rows, "k int, w int") if small_rows else \
            spark.createDataFrame([], "k int, w int")
        plain = sorted(tuple(r) for r in big.join(small, "k").collect())
        salted = sorted(tuple(r) for r in salted_join(big, small, "k").collect())
        assert salted == plain

    check()


def test_table_profile_counts_nulls(spark, monkeypatch):
    """q120's n/n_null/n_distinct account for NULLs the way the oracle's
    count(col)/count(*) difference does."""
    import hadoopwebgraph_spark.queries.scale_ops as so

    rows = [(1.0, 2.0, None, 0.1), (None, 2.0, None, 0.1), (3.0, None, None, 0.2)]
    df = spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double, l_discount double, l_tax double"
    )
    monkeypatch.setattr(so, "load", lambda spark, sf_dir, name: df)
    got = {
        r["column_name"]: (r["n"], r["n_null"], r["n_distinct"])
        for r in so.q120_table_profile(spark, "unused").collect()
    }
    assert got["l_quantity"] == (2, 1, 2)
    assert got["l_extendedprice"] == (2, 1, 1)
    assert got["l_discount"] == (0, 3, 0)
    assert got["l_tax"] == (3, 0, 2)


def test_chunk_documents_hand_computed(spark):
    from hadoopwebgraph_spark.functions.llmprep import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    }
    # stride 3: starts 0,3 for the 7-token doc. Start 6 is NOT emitted:
    # 6 >= n - overlap = 6, so the "g" chunk would duplicate tokens the
    # (1,1) chunk already covers without adding any new ones.
    assert out == {
        (1, 0): ("a b c d", 4),
        (1, 1): ("d e f g", 4),
        (2, 0): ("x y", 2),
    }


def test_chunk_documents_properties(spark):
    """Every token position is covered; consecutive chunks overlap by
    exactly `overlap` except at the tail; chunking is shuffle-free."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from hadoopwebgraph_spark.functions.llmprep import chunk_documents

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.integers(min_value=1, max_value=30))
    def check(n_tokens):
        text = " ".join(f"t{i}" for i in range(n_tokens))
        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        chunks = sorted(
            (r["chunk_idx"], r["chunk_text"].split(" "))
            for r in chunk_documents(docs, chunk_tokens=8, overlap=3).collect()
        )
        covered = [t for _, toks in chunks for t in toks]
        assert set(covered) == {f"t{i}" for i in range(n_tokens)}
        # every chunk contributes at least one NEW token (no redundant tail)
        seen: set[str] = set()
        for _, toks in chunks:
            assert not set(toks) <= seen
            seen |= set(toks)
        for (i1, t1), (i2, t2) in zip(chunks, chunks[1:]):
            assert i2 == i1 + 1
            if len(t1) == 8:  # full chunk: next starts stride=5 later
                assert t1[5:] == t2[: len(t1[5:])]

    check()

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
