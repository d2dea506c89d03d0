"""Physical-plan audits: the properties that make these queries survive a
100x scale-up must be visible in the plan, not assumed — filter pushdown
into the parquet scan, column pruning, broadcast joins for dims, top-k
without a global sort, partial aggregation, whole-stage codegen."""

from __future__ import annotations

import pytest

from hadoopwebgraph_spark.queries.relational import (
    q01_pricing_summary,
    q04_join_broadcast,
    q16_topk_global,
)
from hadoopwebgraph_spark.queries.windows import q20_window_topk_per_group


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_and_column_pruning(spark, sf_small):
    plan = _plan(q01_pricing_summary(spark, sf_small))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: none of the unused columns appear in ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_broadcast_join_for_dims(spark, sf_small):
    plan = _plan(q04_join_broadcast(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_avoids_global_sort(spark, sf_small):
    plan = _plan(q16_topk_global(spark, sf_small))
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation(spark, sf_small):
    plan = _plan(q01_pricing_summary(spark, sf_small))
    # two HashAggregate nodes: partial (map-side) + final
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen(spark, sf_small):
    df = q01_pricing_summary(spark, sf_small)
    codegen = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen" in codegen


def test_cosine_topk_broadcasts_queries(spark, sf_small):
    from hadoopwebgraph_spark.functions.similarity import q70_sim_bruteforce_topk

    plan = _plan(q70_sim_bruteforce_topk(spark, sf_small))
    # the 10-row query side must broadcast; the corpus is never shuffled
    # into a cartesian product
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_merge_upsert_plan(spark, sf_small):
    from hadoopwebgraph_spark.queries.advanced import q59_merge_upsert

    plan = _plan(q59_merge_upsert(spark, sf_small))
    # the anti-join survives as a real join (broadcast or SMJ by size),
    # never a cartesian product
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_kmeans_assignment_plan(spark, sf_small):
    """Cell assignment must broadcast the tiny centroid table and compute
    the argmax as a partial+final aggregate (one shuffled row per vector),
    not a window over the crossed rows."""
    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.similarity import (
        N_QUERIES,
        assign_cells,
        kmeans_centroids,
    )

    e = load(spark, sf_small, "embeddings")
    corpus = e.filter(F.col("vec_id") >= N_QUERIES).select(
        "vec_id", F.col("embedding").alias("v")
    )
    cent = kmeans_centroids(corpus, k=4, iterations=1)
    plan = _plan(assign_cells(corpus, cent))
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Aggregate") >= 2  # partial + final
    assert "Window" not in plan


def test_ivf_probe_prunes_partitions(spark, sf_small):
    """The probe must only READ the probed cells: the inverted file scan
    carries a PartitionFilters entry on cid fed by a dynamic-pruning
    subquery from the broadcast cell list — nprobe/k of the bytes, not a
    full scan plus filter."""
    from hadoopwebgraph_spark.functions.similarity import build_ivf_index, ivf_probe

    path = build_ivf_index(spark, sf_small)
    df = ivf_probe(spark, sf_small, index_path=path)
    plan = df._jdf.queryExecution().executedPlan().toString()
    invfile_scans = [
        l for l in plan.splitlines() if "invfile" in l and "FileScan" in l
    ]
    assert invfile_scans, "inverted-file scan missing from plan"
    assert all("PartitionFilters: [" in l for l in invfile_scans)
    assert "dynamicpruning" in plan.lower()


def test_two_phase_topk_plan(spark, sf_small):
    """topk_per_group must rank in two window stages: a partial one keyed
    by (_p, group) that spreads over n_partitions x n_groups reducers,
    then the global one over the pre-filtered survivors — never a single
    window funnelling everything into n_groups partitions."""
    from hadoopwebgraph_spark.functions.similarity import q70_sim_bruteforce_topk

    plan = _plan(q70_sim_bruteforce_topk(spark, sf_small))
    # two ranking stages in the plan: the pre-filter keyed by
    # (_p, query_id) and the global one keyed by query_id alone
    assert plan.count("Window") >= 2
    partial_keys = [
        l for l in plan.splitlines() if "_p" in l and "query_id" in l and "Arguments" in l
    ]
    assert partial_keys, "partial stage keyed by (_p, query_id) missing"
    # Spark 4's WindowGroupLimit additionally pushes a Partial top-k
    # filter before each exchange — assert it survived for both stages
    assert plan.count("WindowGroupLimit") >= 4  # partial+final x 2 stages


def test_hash_sample_no_shuffle(spark, sf_small):
    """Deterministic sampling/splitting must stay in the scan pipeline:
    no Exchange anywhere in the plan, and the shuffle-order head must be
    TakeOrderedAndProject (never a global sort)."""
    from hadoopwebgraph_spark.functions.sampling import (
        q86_hash_sample,
        q88_shuffle_order,
    )

    plan = _plan(q86_hash_sample(spark, sf_small))
    assert "Exchange" not in plan
    plan = _plan(q88_shuffle_order(spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort node


def test_sequence_packing_sharded_window(spark, sf_small):
    """Packing's running sum must window per shard (parallelism scales
    with shard count), never a single global window partition."""
    from hadoopwebgraph_spark.functions.sampling import q89_sequence_packing

    plan = _plan(q89_sequence_packing(spark, sf_small))
    assert "Window" in plan
    # the window's partition spec carries the shard column
    window_args = [
        l for l in plan.splitlines() if "windowspecdefinition" in l
    ]
    assert window_args and all("shard" in l for l in window_args)


def test_window_single_shuffle(spark, sf_small):
    import re

    plan = _plan(q20_window_topk_per_group(spark, sf_small))
    exchanges = [
        line for line in plan.splitlines() if re.match(r"^\(\d+\) Exchange", line)
    ]
    # one hash exchange for the window partitioning and nothing else
    assert len(exchanges) == 1


def test_decontaminate_broadcasts_eval_side(spark, sf_small):
    """q98's n-gram overlap join must broadcast the (tiny) eval shingle
    set — the train side streams map-side, never sort-merge-shuffles
    against it."""
    from hadoopwebgraph_spark.functions.llmprep import q98_decontaminate

    plan = _plan(q98_decontaminate(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_scrub_is_narrow(spark, sf_small):
    """q99 is a pure projection: no exchange anywhere in the plan."""
    from hadoopwebgraph_spark.functions.llmprep import q99_pii_scrub

    plan = _plan(q99_pii_scrub(spark, sf_small))
    assert "Exchange" not in plan


def test_mixture_sample_broadcasts_rates(spark, sf_small):
    """q101 joins each doc to its source's keep-rate: the rates map is
    O(n_sources) and must broadcast."""
    from hadoopwebgraph_spark.functions.llmprep import q101_mixture_sample

    plan = _plan(q101_mixture_sample(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_correlated_agg_subquery_decorrelates(spark, sf_small):
    """q103's per-part min must be decorrelated into an aggregate + join,
    not re-executed per outer row (no IN/EXISTS subquery node left)."""
    from hadoopwebgraph_spark.queries.setops_scalar import (
        q103_correlated_agg_subquery,
    )

    plan = _plan(q103_correlated_agg_subquery(spark, sf_small))
    assert "Subquery" not in plan  # fully rewritten into joins
    assert "HashAggregate" in plan  # the decorrelated per-part min


def test_exists_subquery_becomes_semi_join(spark, sf_small):
    from hadoopwebgraph_spark.queries.setops_scalar import q104_exists_subquery

    plan = _plan(q104_exists_subquery(spark, sf_small))
    assert "LeftSemi" in plan
    assert "Subquery" not in plan


def test_q110_broadcasts_nation_dims(spark, sf_small):
    from hadoopwebgraph_spark.queries.advanced import q110_volume_shipping

    plan = _plan(q110_volume_shipping(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "Subquery" not in plan


def test_q111_single_shuffle(spark, sf_small):
    from hadoopwebgraph_spark.queries.advanced import q111_latest_per_key

    plan = _plan(q111_latest_per_key(spark, sf_small))
    # exactly one hash exchange: the keyed window
    assert plan.count("+- Exchange") == 1
    # and Spark's rank-limit pushdown keeps a map-side partial top-1
    # ahead of the exchange (WindowGroupLimit below AND above it)
    assert plan.count("WindowGroupLimit") >= 2


def test_q107_uses_two_phase_rank_filter(spark, sf_small):
    from hadoopwebgraph_spark.functions.sampling import q107_stratified_fixed_n

    plan = _plan(q107_stratified_fixed_n(spark, sf_small))
    # phase 1 partitions by (spark_partition_id, stratum): no reducer
    # ever sees a whole stratum
    assert "SPARK_PARTITION_ID" in plan.upper()


def test_q106_windows_share_one_sort(spark, sf_small):
    """The SCD2 build's lag-compress and lead-interval windows use the
    same (user_id, ts, event_id) ordering, so Catalyst must plan ONE
    exchange and ONE sort for both."""
    from hadoopwebgraph_spark.queries.advanced import q106_scd2_history

    plan = _plan(q106_scd2_history(spark, sf_small))
    assert plan.count("+- Exchange") == 1
    assert plan.count("+- Sort") == 1


def test_q113_single_pass_partial_agg(spark, sf_small):
    """All six moment aggregates compute in one scan with map-side
    partials: one exchange, two HashAggregate levels."""
    from hadoopwebgraph_spark.queries.advanced import q113_corr_stats

    plan = _plan(q113_corr_stats(spark, sf_small))
    assert plan.count("+- Exchange") == 1
    assert plan.count("HashAggregate") >= 2


def test_q114_no_shuffle(spark, sf_small):
    """The mu-law pipeline is a pure mapInPandas chain: encode and
    decode stay in the same stage — zero exchanges."""
    from hadoopwebgraph_spark.functions.multimodal import q114_ulaw_audio_decode

    plan = _plan(q114_ulaw_audio_decode(spark, sf_small))
    assert plan.count("+- Exchange") == 0


def test_q118_injects_runtime_bloom_filter(spark, sf_small):
    """The selective orders side builds a bloom filter aggregate and
    lineitem is semi-filtered by might_contain BEFORE its shuffle — the
    InjectRuntimeFilter rewrite a 100 TB fact-fact join depends on."""
    from hadoopwebgraph_spark.queries.scale_ops import q118_bloom_filter_join

    plan = _plan(q118_bloom_filter_join(spark, sf_small))
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    # and the parent session's confs were not perturbed
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1"


def test_q120_profile_single_scan(spark, sf_small):
    """All 24 profile measures come from ONE scan of lineitem: exactly
    one FileScan node in the plan."""
    from hadoopwebgraph_spark.queries.scale_ops import q120_table_profile

    import re

    plan = _plan(q120_table_profile(spark, sf_small))
    # node-detail headers, one per physical scan (the tree line and the
    # detail section both mention the node, so count headers not substrings)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_q123_histogram_broadcasts_bounds(spark, sf_small):
    """The one-row min/max aggregate joins back via broadcast — the big
    scan never shuffles before bucketing (single exchange: the 20-key
    final agg)."""
    from hadoopwebgraph_spark.queries.scale_ops import q123_histogram

    plan = _plan(q123_histogram(spark, sf_small))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_q119_gram_count_without_self_join(spark, sf_small):
    """The corpus-wide gram count is a window over the gram hash — no
    grams-to-grams self-join; exactly the Window + two aggregates."""
    from hadoopwebgraph_spark.functions.dedup import q119_substring_dedup

    plan = _plan(q119_substring_dedup(spark, sf_small))
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_spread_keys_off_input_width(spark):
    """_spread's round-robin exchange exists only when the scan is
    narrower than the cluster (r18): a single-partition input is spread
    to defaultParallelism, an already-parallel input passes through
    untouched — at 100 TB the corpus scan is already thousands of
    partitions and must not be re-shuffled wholesale."""
    from hadoopwebgraph_spark.functions.dedup import _spread

    n = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    assert _spread(narrow).rdd.getNumPartitions() == n
    wide = spark.range(1000).repartition(n)
    assert _spread(wide) is wide


def test_g13_recursive_step_width_is_size_derived(spark, sf_small):
    """The recursive CTE's edge view is coalesced to ~100k arcs/task
    (r18): Spark 4's UnionLoop re-executes the step join once per
    iteration, so with `shuffle.partitions = cpus` a tiny frontier pays
    core-proportional scheduling every hop (driver r17 scaling: 3.93 s
    at 32 cores vs 0.98 s at 8). The width must come from the graph's
    .properties arc count, NOT the core count — at corpus scale the
    coalesce is a no-op."""
    from hadoopwebgraph_spark.queries.graph import (
        g13_reachability_recursive_cte,
    )

    df = g13_reachability_recursive_cte(spark, sf_small)
    # registering the view is part of the body; the small fixture has
    # 14,059 arcs -> one task per loop-join scan
    assert spark.table("g13_edges").rdd.getNumPartitions() == 1
    # and the loop itself still computes the exact 4-hop reachability
    assert df.count() > 0


def test_q121_priority_sample_topk(spark, sf_small):
    """Priority sampling's top-k is a TakeOrderedAndProject: per-partition
    heaps, k rows per partition to the driver — no global sort."""
    from hadoopwebgraph_spark.functions.sampling import q121_weighted_sample

    plan = _plan(q121_weighted_sample(spark, sf_small))
    assert "TakeOrderedAndProject" in plan


def test_q122_editdist_join_is_equi_blocked(spark, sf_small):
    """The pair space is an equi-join on the p_brand block key — never a
    cartesian product."""
    from hadoopwebgraph_spark.functions.dedup import q122_editdist_join

    plan = _plan(q122_editdist_join(spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q125_broadcasts_all_dims(spark, sf_small):
    """TPC-H Q8 shape: all five dimension sides broadcast; only the two
    fact tables (orders x lineitem) meet in a shuffle."""
    from hadoopwebgraph_spark.queries.advanced import q125_market_share

    plan = _plan(q125_market_share(spark, sf_small))
    assert plan.count("BroadcastHashJoin") >= 5


def test_q126_pushes_filters_into_both_facts(spark, sf_small):
    """Q10 shape: the returnflag filter reaches the lineitem scan and the
    date range reaches the orders scan."""
    from hadoopwebgraph_spark.queries.advanced import q126_returned_item_reporting

    plan = _plan(q126_returned_item_reporting(spark, sf_small))
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q128_incremental_dedup_anti_join(spark, sf_small):
    """Snapshot-vs-batch dedup is a LeftAnti join on the content digest —
    never a cartesian pairing, and the join key is the 64-char hash
    column (document text itself stays out of the join)."""
    from hadoopwebgraph_spark.functions.dedup import q128_incremental_dedup

    plan = _plan(q128_incremental_dedup(spark, sf_small))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q131_disjunction_pushes_per_side_hulls(spark, sf_small):
    """Catalyst must extract the per-side implications of the OR-of-ANDs:
    the part scan gets the brand IN-set / size hull, the lineitem scan
    the l_quantity range hull, BEFORE the join; the exact cross-side OR
    stays as a post-join (or post-scan residual) filter."""
    from hadoopwebgraph_spark.queries.advanced import (
        q131_disjunctive_predicate_join,
    )

    plan = _plan(q131_disjunctive_predicate_join(spark, sf_small))
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "p_brand" in pushed, plan         # brand disjunction hull on part
    assert "l_quantity" in pushed, plan      # quantity range hull on lineitem
    # the residual OR must still be evaluated (it's not fully pushable)
    assert "Or(" in plan or " OR " in plan, plan


def test_q130_partial_agg_and_topk(spark, sf_small):
    """Corpus n-gram counting must combine map-side (partial+final
    HashAggregate) and take the global top-50 without a global sort."""
    from hadoopwebgraph_spark.functions.text import q130_ngram_counts

    plan = _plan(q130_ngram_counts(spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2, plan


def test_g25_host_graph_single_shuffle(spark):
    """Host-graph contraction: exactly one Exchange (the host-pair
    groupBy), with map-side combine collapsing duplicate pairs first."""
    from hadoopwebgraph_spark.queries.graph import g25_host_graph

    import re

    df = g25_host_graph(spark, "unused")
    plan = _plan(df)
    # count Exchange NODES (formatted explain lists each node twice:
    # once in the tree, once as a "(n) Exchange" detail header)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan
    assert "partial_count" in plan, plan  # map-side combine before it


def test_random_walk_step_plans_hash_aggregate(spark):
    """The walk's per-step min_by must plan HashAggregate (fixed-width
    BIGINT argmin key) with a map-side partial — a var-length key in the
    AGG BUFFER regresses to SortAggregate, a full sort of the
    frontier-join output every step (the g33 r8/r9 scale-killer; see
    NOTES r10). Pin the lazy plan BEFORE the final localCheckpoint
    (which erases the step operators), by rebuilding one step inline."""
    from pyspark.sql import functions as F

    es = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    ).repartition(4, "src")
    state = spark.createDataFrame(
        [(0, 0, 0, "0")], "v long, k int, cur long, path string"
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "-", F.lit("walk"), F.col("v"), F.col("k"), F.lit(1), F.col("dst")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    step = (
        state.join(es, state.cur == es.src, "left")
        .groupBy("v", "k", "cur", "path")
        .agg(F.min_by("dst", h).alias("nxt"))
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan, plan
    assert "partial_min_by" in plan, plan  # map-side partial collapse


def test_q136_sessionize_single_exchange(spark, sf_small):
    """Both window passes and the session rollup hash on user_id first:
    exactly ONE Exchange in the whole plan."""
    from hadoopwebgraph_spark.queries.streaming_batch import q136_sessionize

    import re

    plan = _plan(q136_sessionize(spark, sf_small))
    exchanges = [
        l for l in plan.splitlines() if re.match(r"^\(\d+\) Exchange", l)
    ]
    windows = [l for l in plan.splitlines() if re.match(r"^\(\d+\) Window", l)]
    assert len(exchanges) == 1
    assert len(windows) == 2


def test_q137_inverted_index_scans_corpus_once(spark, sf_small):
    """The shared tf table is persisted: one parquet scan feeding an
    InMemoryRelation, both consumer branches read the cache; the posting
    sort is rank-capped by WindowGroupLimit before AND after its
    exchange."""
    from hadoopwebgraph_spark.functions.text import q137_inverted_index

    import re

    plan = _plan(q137_inverted_index(spark, sf_small))
    def ops(name):
        return [l for l in plan.splitlines()
                if re.match(r"^\(\d+\) " + name, l)]
    assert len(ops("Scan parquet")) == 1
    assert len(ops("InMemoryTableScan")) == 2
    assert len(ops("WindowGroupLimit")) == 2


def test_q138_pmi_generates_pairs_without_self_join(spark, sf_small):
    """Pair generation is row-local array work: no SortMergeJoin anywhere
    (endpoint/unigram joins broadcast), and each corpus aggregation runs
    once behind its cache."""
    from hadoopwebgraph_spark.functions.text import q138_pmi_cooccur

    plan = _plan(q138_pmi_cooccur(spark, sf_small))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    import re

    def ops(name):
        return [l for l in plan.splitlines()
                if re.match(r"^\(\d+\) " + name, l)]
    assert len(ops("BroadcastHashJoin")) == 2
    # pair-count cache read twice (scored output + total), unigram cache
    # read three times (two endpoints + total)
    assert len(ops("InMemoryTableScan")) == 5


def test_q140_unigram_logprob_broadcasts_vocab(spark, sf_small):
    """The micro-nat vocabulary table broadcasts; the per-doc sum is a
    partial-agg'd hash aggregation — no sort aggregate anywhere."""
    from hadoopwebgraph_spark.functions.text import q140_unigram_logprob

    plan = _plan(q140_unigram_logprob(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortAggregate" not in plan


def test_q141_rank_broadcast_and_topk_heap(spark, sf_small):
    """The node-count-sized rank table broadcasts into the corpus join and
    the top-50 plans TakeOrderedAndProject — the corpus never shuffles."""
    from hadoopwebgraph_spark.functions.llmprep import (
        q141_centrality_weighted_corpus,
    )

    plan = _plan(q141_centrality_weighted_corpus(spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    tail = plan[plan.index("TakeOrderedAndProject"):]
    assert "BroadcastHashJoin" in tail


def test_q142_prefix_join_broadcasts_df_ranks(spark, sf_small):
    """The vocabulary-sized df rank table broadcasts into the token
    ranking; candidate verification carries no extra aggregate sorts."""
    from hadoopwebgraph_spark.functions.dedup import q142_prefix_jaccard_join

    plan = _plan(q142_prefix_jaccard_join(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "SortAggregate" not in plan


def test_q143_heavy_hitters_broadcasts_candidates(spark, sf_small):
    """Both the MG candidate set and the 1-row total broadcast; every
    aggregate is a HashAggregate (map-side partials on the tail-free
    candidate count)."""
    from hadoopwebgraph_spark.functions.text import q143_heavy_hitters

    import re

    plan = _plan(q143_heavy_hitters(spark, sf_small))
    bhj = [l for l in plan.splitlines()
           if re.match(r"^\(\d+\) BroadcastHashJoin", l)]
    assert len(bhj) >= 1  # candidate set (total joins nested-loop, 1 row)
    assert "SortAggregate" not in plan


def test_q144_winnow_single_exchange_before_window(spark, sf_small):
    """Winnowing is one hash-partition on doc_id + an in-partition sorted
    window: exactly one Exchange ahead of the Window operator, and the
    distinct's exchange reuses that partitioning only if keyed the same —
    pin the total at <= 2."""
    from hadoopwebgraph_spark.functions.text import q144_winnow_fingerprint

    import re

    plan = _plan(q144_winnow_fingerprint(spark, sf_small))
    exchanges = [l for l in plan.splitlines()
                 if re.match(r"^\(\d+\) Exchange", l)]
    windows = [l for l in plan.splitlines()
               if re.match(r"^\(\d+\) Window", l)]
    assert len(windows) == 1
    assert len(exchanges) <= 2


def test_q146_no_global_corpus_sort(spark, sf_small):
    """The corpus is never globally sorted: every Window over corpus rows
    is partitioned (the boundary cut hashes by score); only the <=1001-row
    bucket table may use the unpartitioned running-sum window."""
    from hadoopwebgraph_spark.functions.llmprep import q146_token_budget_select

    import re

    plan = _plan(q146_token_budget_select(spark, sf_small))
    # single-partition exchanges feed only the tiny bucket-table window:
    # the corpus path must hash-partition on score ahead of the boundary
    # window (formatted explain puts Arguments on their own line, so
    # search the whole text, not the operator line).
    assert "hashpartitioning(score" in plan, plan
    windows = [
        l for l in plan.splitlines() if re.match(r"^\(\d+\) Window", l)
    ]
    assert windows, plan


def test_q150_bm25_pruned_explode_and_topk_heap(spark, sf_small):
    """BM25 retrieval: the candidate tf table is persisted (one explode
    feeding both the df-statistics and the scorer), the per-document
    aggregation stays HashAggregate, and the global top-20 is a heap
    (TakeOrderedAndProject), never a global sort."""
    from hadoopwebgraph_spark.functions.text import q150_bm25_topk

    import re

    plan = _plan(q150_bm25_topk(spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "SortAggregate" not in plan
    cached = [
        l for l in plan.splitlines()
        if re.match(r"^\(\d+\) InMemoryTableScan", l)
    ]
    assert len(cached) == 2, plan  # df-stats branch + scorer branch


def test_q151_semi_anti_on_orderkey(spark, sf_small):
    """Q21 shape: EXISTS plans a LeftSemi and NOT EXISTS a LeftAnti, both
    hash-keyed on the order key (supplier inequality as residual, never a
    cartesian); the persisted late set feeds both consumers; the top-20
    is TakeOrderedAndProject."""
    from hadoopwebgraph_spark.queries.relational2 import q151_waiting_suppliers

    import re

    plan = _plan(q151_waiting_suppliers(spark, sf_small))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    cached = [
        l for l in plan.splitlines()
        if re.match(r"^\(\d+\) InMemoryTableScan", l)
    ]
    assert len(cached) == 2, plan  # probe side + anti side


def test_q152_outer_join_condition_not_flattened(spark, sf_small):
    """Q13 shape: the priority predicate must stay INSIDE the outer join
    (a post-filter would drop zero-order customers); both aggregations
    are hash aggregates with map-side partials."""
    from hadoopwebgraph_spark.queries.relational2 import (
        q152_customer_distribution,
    )

    plan = _plan(q152_customer_distribution(spark, sf_small))
    assert "LeftOuter" in plan
    assert "SortAggregate" not in plan
    assert "partial_count" in plan


def test_q153_in_subquery_rewrites_to_semi(spark, sf_small):
    """Q18 shape: the IN over the HAVING aggregate becomes a LeftSemi hash
    join fed by already-aggregated keys; top-100 is a heap."""
    from hadoopwebgraph_spark.queries.relational2 import (
        q153_large_volume_customer,
    )

    plan = _plan(q153_large_volume_customer(spark, sf_small))
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q77_ring_build_no_global_corpus_window(spark, sf_small):
    """VERDICT r10 scale fix: the kNN-graph build's ring edges must never
    plan an un-partitioned Window over corpus rows. The bucket-offset
    rewrite hash-partitions the intra-bucket lead on (vec_id div 1024);
    the only single-partition window runs on the post-Aggregate per-bucket
    boundary table (n/1024 rows). Pin: the corpus-row Window is preceded
    by hashpartitioning(bucket...), and every SinglePartition exchange in
    the plan feeds a subtree that already aggregated."""
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.similarity import _ring_edges

    import re

    assigned = load(spark, sf_small, "embeddings").select("vec_id")
    plan = _plan(_ring_edges(assigned))
    assert "hashpartitioning(bucket" in plan, plan
    # exactly one unpartitioned exchange — the tiny boundary table — and
    # the plan must contain a HashAggregate between it and the scan
    single = plan.count("SinglePartition")
    assert single <= 1, plan
    if single:
        assert "HashAggregate" in plan, plan


def test_ring_edges_equal_global_lead(spark):
    """The bucket-offset ring emits exactly the globally consecutive id
    pairs — including across bucket boundaries and with sparse/absent
    buckets — matching the old global-window construction it replaced."""
    from pyspark.sql import Window, functions as F

    from hadoopwebgraph_spark.functions.similarity import _ring_edges

    # sparse, gap-heavy ids spanning several 1024-buckets, some empty
    ids = [0, 1, 5, 1023, 1024, 1025, 4096, 4097, 9999, 10240, 99999]
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    got = sorted(
        (r.vec_id, r.nxt) for r in _ring_edges(df).collect()
    )
    want = sorted(zip(sorted(ids), sorted(ids)[1:]))
    assert got == want


def test_q155_composed_pipeline_plan(spark, sf_small):
    """The full curation composition: no cartesian, hash aggregates only,
    the persisted survivor subtree feeds its three consumers as
    InMemoryTableScans (signature pipeline / length projection / final
    semi-join), and both dedup membership joins plan as LeftSemi."""
    from hadoopwebgraph_spark.functions.llmprep import (
        q155_curation_neardup_pipeline,
    )

    import re

    plan = _plan(q155_curation_neardup_pipeline(spark, sf_small))
    assert "CartesianProduct" not in plan
    assert "SortAggregate" not in plan
    assert "LeftSemi" in plan
    cached = [
        l for l in plan.splitlines()
        if re.match(r"^\(\d+\) InMemoryTableScan", l)
    ]
    assert len(cached) >= 2, plan  # length projection + final semi-join


# ---------------------------------------------------------------------------
# Plan-duplication lint (VERDICT r10 item #6): a helper DataFrame feeding
# N consumers re-runs its whole subtree N times unless persisted — the
# recurring trap caught by hand in r1/q137/q142/q151. The lint counts the
# SCAN LEAVES of a query's physical plan (parquet / Python-DataSource /
# in-memory-cache / checkpointed-RDD) and pins the expected number, so an
# accidental subtree duplication (one more raw scan than designed) fails
# fast instead of surfacing as a 16x bench regression.
# ---------------------------------------------------------------------------


def _scan_leaves(plan: str) -> dict[str, int]:
    """Count physical-plan scan leaves by kind from a formatted explain."""
    import re

    kinds: dict[str, int] = {}
    for line in plan.splitlines():
        m = re.match(
            r"^\(\d+\) (BatchScan \S+|Scan parquet|Scan ExistingRDD"
            r"|InMemoryTableScan)",
            line.strip(),
        )
        if m:
            k = m.group(1)
            kinds[k] = kinds.get(k, 0) + 1
    return kinds


# expected scan-leaf census of the most expensive oracle gates; raw-scan
# counts are the load-bearing part (InMemoryTableScan = shared subtree,
# fine; one MORE raw scan than pinned = a subtree started re-running)
_SCAN_CENSUS = {
    # one persisted decode, scanned by both join sides; the BatchScan is
    # the cache's OWN build plan shown inside the InMemoryRelation (runs
    # once at materialization, not per consumer)
    "g05_two_hop": {"BatchScan bvgraph": 1, "InMemoryTableScan": 2},
    # mirror codebooks+codes+rotq, embeddings twice (ADC queries + rerank)
    "q76_sim_opq_topk": {"Scan parquet": 5},
    "q74_sim_pq_topk": {"Scan parquet": 5},
    # the whole signature pipeline runs ONCE: a single documents scan
    "q62_dedup_minhash": {"Scan parquet": 1},
    # TPC-H Q5's six tables, each scanned once
    "q57_local_supplier_volume": {"Scan parquet": 6},
    "q71_sim_ivf_topk": {"Scan parquet": 3},
    "q56_shipping_priority": {"Scan parquet": 3},
    # one BVGraph decode feeds the sampler
    "g32_neighbor_sample": {"BatchScan bvgraph": 1},
    # persisted tf table feeds df-stats + scorer; documents scanned once
    "q137_inverted_index": {"InMemoryTableScan": 2, "Scan parquet": 1},
    # persisted token-set subtree: 4 cached consumers, 2 designed raw scans
    "q142_prefix_jaccard_join": {"InMemoryTableScan": 4, "Scan parquet": 2},
    # r12: each persisted sketch scans orders ONCE at cache build (2 raw
    # scans total); the <=K-row set algebra reads only the caches — a
    # third raw scan means a sketch subtree started re-running
    "q160_theta_sketch_setops": {"InMemoryTableScan": 16, "Scan parquet": 2},
    # patterns + posting-list build + verify join: exactly 3 scans
    "q161_substring_search": {"Scan parquet": 3},
    # corpus tokens + candidate texts; the query table is a local RDD
    "q162_crossencoder_rerank": {"Scan parquet": 2, "Scan ExistingRDD": 2},
    # r14: the doubling rounds are localCheckpoint-truncated, so the
    # final plan's only leaves are the checkpointed class table's RDD
    # scans (dup-count + membership join-back = 2); the documents
    # parquet scan lives inside the already-executed checkpoint builds,
    # never re-runs per consumer
    "q163_suffix_span_dedup": {"Scan ExistingRDD": 2},
    # r14: one fact scan + the persisted distinct-build-keys cache (its
    # own supplier scan shows once inside the InMemoryRelation build
    # plan); the verify join reads the cache, never re-scans supplier
    "q164_xor_filter_join": {"Scan parquet": 2, "InMemoryTableScan": 1},
}


@pytest.mark.parametrize("name", sorted(_SCAN_CENSUS))
def test_scan_leaf_census(spark, sf_small, name):
    from hadoopwebgraph_spark.registry import queries

    plan = _plan(queries()[name](spark, sf_small))
    assert _scan_leaves(plan) == _SCAN_CENSUS[name], plan


def test_q85_topk_is_heap(spark, sf_small):
    """q85's global top-20 must plan as TakeOrderedAndProject (the q150
    idiom), never a single-partition rank window."""
    from hadoopwebgraph_spark.functions.text import q85_bm25_ranking

    plan = _plan(q85_bm25_ranking(spark, sf_small))
    assert "TakeOrderedAndProject" in plan


def test_q156_q157_shape(spark, sf_small):
    """Q12/Q14 shapes: conditional aggregation stays HashAggregate with
    map-side partials; Q14's part side broadcasts into the date-pruned
    lineitem scan."""
    from hadoopwebgraph_spark.queries.relational2 import (
        q156_late_priority_lines,
        q157_promo_revenue,
    )

    p1 = _plan(q156_late_priority_lines(spark, sf_small))
    assert "SortAggregate" not in p1
    assert "partial_sum" in p1
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in p1
    p2 = _plan(q157_promo_revenue(spark, sf_small))
    assert "BroadcastHashJoin" in p2
    assert "CartesianProduct" not in p2


def test_q158_q159_shared_subtree_persisted(spark, sf_small):
    """Q15's revenue view and Q17's brand-filtered line set each feed two
    consumers (scalar max + probe; per-part aggregate + probe) — both
    must plan as InMemoryTableScans, never a re-run subtree."""
    import re

    from hadoopwebgraph_spark.queries.relational2 import (
        q158_top_supplier,
        q159_small_quantity_revenue,
    )

    for fn in (q158_top_supplier, q159_small_quantity_revenue):
        plan = _plan(fn(spark, sf_small))
        cached = [
            l for l in plan.splitlines()
            if re.match(r"^\(\d+\) InMemoryTableScan", l)
        ]
        assert len(cached) == 2, plan
        assert "CartesianProduct" not in plan


def test_q160_sketch_no_global_sort(spark, sf_small):
    """Theta-sketch builds must plan as TakeOrderedAndProject (per-
    partition top-K then a K-row merge), never a corpus-wide Sort, and
    the <=K-row set algebra must not introduce a cartesian product."""
    from hadoopwebgraph_spark.functions.sketches import (
        q160_theta_sketch_setops,
    )

    plan = _plan(q160_theta_sketch_setops(spark, sf_small))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # the year ranges reach the scan and only the two live columns read
    assert "GreaterThanOrEqual(o_orderdate,1995-01-01" in plan
    assert "struct<o_custkey:bigint,o_orderdate:timestamp_ntz>" in plan


def test_q161_gram_prune_is_broadcast(spark, sf_small):
    """The pattern-gram posting prune must be a broadcast hash join (the
    pattern side is tiny), discarding non-matching grams before any
    shuffle; no cartesian verify pass."""
    from hadoopwebgraph_spark.functions.search import q161_substring_search

    plan = _plan(q161_substring_search(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q162_rerank_batched_and_two_phase_topk(spark, sf_small):
    """Candidate generation broadcasts the query vocabulary; the rerank
    runs in mapInPandas Arrow batches (never row-at-a-time Python); the
    final cut is the two-phase rank filter, not a single global window
    over all scored pairs."""
    from hadoopwebgraph_spark.functions.search import (
        q162_crossencoder_rerank,
    )

    plan = _plan(q162_crossencoder_rerank(spark, sf_small))
    assert "BroadcastHashJoin" in plan
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    # two-phase top-k: a local (spark_partition_id, query_id) window
    # precedes the per-query global window
    assert "_p" in plan
