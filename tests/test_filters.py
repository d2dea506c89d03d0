"""Xor-filter semi-join pre-filter (r14-staged; functions/filters.py):
construction invariants against numpy ground truth, and join exactness
against a plain semi-join on the fixture tables."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoopwebgraph_spark.functions.filters import (
    build_xor_filter,
    xor_filter_contains,
    xor_filter_join,
)


@pytest.mark.parametrize("n", [1, 2, 7, 100, 5000, 60000])
def test_no_false_negatives(n):
    rng = np.random.default_rng(n)
    keys = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    filt = build_xor_filter(keys)
    assert bool(xor_filter_contains(filt, keys).all())


def test_false_positive_rate_and_size():
    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**62, size=50_000, dtype=np.int64)
    filt = build_xor_filter(members)
    # ~10 bits/key (Bloom at the same ~0.4% FP needs ~14.4)
    assert len(filt["table"]) * 8 <= 11 * len(np.unique(members))
    probes = rng.integers(-(2**62), -1, size=200_000, dtype=np.int64)
    fp = xor_filter_contains(filt, probes).mean()
    assert fp < 0.01, f"false-positive rate {fp:.4f} exceeds 8-bit bound"


def test_duplicate_and_empty_build():
    keys = np.array([5, 5, 5, -9, -9], dtype=np.int64)
    filt = build_xor_filter(keys)
    assert bool(xor_filter_contains(filt, np.array([5, -9])).all())
    empty = build_xor_filter([])
    assert not xor_filter_contains(empty, np.array([1, 2, 3])).any()


def test_build_side_cap_enforced():
    with pytest.raises(ValueError, match="max_build"):
        build_xor_filter(np.arange(100, dtype=np.int64), max_build=10)


def test_xor_filter_join_equals_plain_semijoin(spark, sf_small):
    from hadoopwebgraph_spark.catalog import load

    lineitem = load(spark, sf_small, "lineitem")
    supplier = load(spark, sf_small, "supplier").filter(
        F.col("s_acctbal") > 5000
    )
    got = xor_filter_join(lineitem, "l_suppkey", supplier, "s_suppkey")
    want = lineitem.join(
        supplier.select(F.col("s_suppkey").alias("k")).distinct(),
        lineitem["l_suppkey"] == F.col("k"),
        "left_semi",
    )
    assert got.count() == want.count()

    def value_hash(df):
        # pmod-bounded so the ANSI sum cannot overflow (the repo's
        # fingerprint idiom)
        return df.select(
            F.sum(F.pmod(F.xxhash64(*sorted(df.columns)), F.lit(1 << 31)))
        ).collect()

    assert value_hash(got) == value_hash(want)


def test_xor_filter_join_string_keys(spark, sf_small):
    from hadoopwebgraph_spark.catalog import load

    orders = load(spark, sf_small, "orders")
    build = orders.select("o_orderpriority").distinct().limit(2)
    got = xor_filter_join(orders, "o_orderpriority", build, "o_orderpriority")
    want = orders.join(
        build.withColumnRenamed("o_orderpriority", "k"),
        orders["o_orderpriority"] == F.col("k"),
        "left_semi",
    )
    assert got.count() == want.count() > 0


def _assert_probe_below_join(df):
    """The shared census pin for every succinct-filter join gate: the
    Arrow-batched membership probe runs directly above the fact scan,
    BELOW the verify semi-join — rows drop before any join exchange,
    which is the entire point of the op. In the formatted tree outline
    every ArrowEvalPython must render below the LeftSemi node (review
    r15: the xor and fuse pins had copy-pasted this body)."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "LeftSemi" in plan
    head = plan.split("\n\n")[0]
    join_line = next(
        i for i, l in enumerate(head.splitlines()) if "LeftSemi" in l
    )
    udf_lines = [
        i for i, l in enumerate(head.splitlines()) if "ArrowEvalPython" in l
    ]
    assert udf_lines and all(i > join_line for i in udf_lines)
    assert "SinglePartition" not in plan


def test_xor_prefilter_sits_below_the_join(spark, sf_small):
    from hadoopwebgraph_spark.catalog import load

    li = load(spark, sf_small, "lineitem")
    sup = load(spark, sf_small, "supplier").filter(F.col("s_acctbal") > 5000)
    _assert_probe_below_join(xor_filter_join(li, "l_suppkey", sup, "s_suppkey"))


def test_mixed_integral_key_types_widen(spark):
    """INT fact key vs BIGINT build key must match exactly like the
    coercing plain join — xxhash64 is type-sensitive, so un-normalized
    hashing would silently drop every true match (review r13)."""
    fact = spark.range(100).select(F.col("id").cast("int").alias("k"))
    build = spark.range(10, 20).select(F.col("id").alias("bk"))  # bigint
    got = xor_filter_join(fact, "k", build, "bk")
    assert got.count() == 10


def test_incompatible_key_types_raise(spark):
    fact = spark.range(5).select(F.col("id").cast("string").alias("k"))
    build = spark.range(5).select(F.col("id").alias("bk"))
    with pytest.raises(TypeError, match="incompatible types"):
        xor_filter_join(fact, "k", build, "bk")


# The r13-staged dry-run pair was promoted verbatim to
# @register("q164_xor_filter_join") in round 14 — the registry entry is
# the single source of truth (oracle = the PLAIN semi-join: the filter
# provably cannot change the answer); the full-registry parity sweep and
# the driver's t2 loop run it.
def test_q164_registered_pair_parity(spark, sf_small):
    from hadoopwebgraph_spark.registry import all_queries

    from tests.oracle_util import compare

    q = all_queries()["q164_xor_filter_join"]
    assert q.oracle is not None
    compare(spark, sf_small, q.name, q.fn, q.oracle)


# ---------------------------------------------------------------------------
# Binary fuse filter (r15-staged; see functions/filters.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 2, 7, 100, 5000, 60000])
def test_fuse_no_false_negatives(n):
    from hadoopwebgraph_spark.functions.filters import (
        build_fuse_filter,
        fuse_filter_contains,
    )

    rng = np.random.default_rng(n)
    keys = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    filt = build_fuse_filter(keys)
    assert bool(fuse_filter_contains(filt, keys).all())


def test_fuse_smaller_than_xor_at_scale():
    from hadoopwebgraph_spark.functions.filters import (
        build_fuse_filter,
        build_xor_filter,
        fuse_filter_contains,
    )

    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**62, size=100_000, dtype=np.int64)
    fuse = build_fuse_filter(members)
    xor = build_xor_filter(members)
    n = len(np.unique(members))
    assert len(fuse["table"]) < len(xor["table"])
    assert len(fuse["table"]) * 8 <= 9.6 * n  # ~9.1 bits/key at 100k
    probes = rng.integers(-(2**62), -1, size=200_000, dtype=np.int64)
    fp = fuse_filter_contains(fuse, probes).mean()
    assert fp < 0.01, f"false-positive rate {fp:.4f} exceeds 8-bit bound"


def test_fuse_empty_and_cap():
    from hadoopwebgraph_spark.functions.filters import (
        build_fuse_filter,
        fuse_filter_contains,
    )

    empty = build_fuse_filter([])
    assert not fuse_filter_contains(empty, np.array([1, 2, 3])).any()
    with pytest.raises(ValueError, match="max_build"):
        build_fuse_filter(np.arange(100, dtype=np.int64), max_build=10)


def test_fuse_filter_join_equals_plain_semijoin(spark, sf_small):
    from hadoopwebgraph_spark.catalog import load
    from hadoopwebgraph_spark.functions.filters import fuse_filter_join

    orders = load(spark, sf_small, "orders")
    cust = load(spark, sf_small, "customer").filter(F.col("c_acctbal") > 7000)
    got = fuse_filter_join(orders, "o_custkey", cust, "c_custkey")
    want = orders.join(
        cust.select(F.col("c_custkey").alias("k")).distinct(),
        orders["o_custkey"] == F.col("k"),
        "left_semi",
    )
    assert got.count() == want.count() > 0


# The r14-staged dry-run pair was promoted to
# @register("q165_fuse_filter_join") in round 15 — the registry entry is
# the single source of truth (oracle = the PLAIN semi-join).
def test_q165_registered_pair_parity(spark, sf_small):
    from hadoopwebgraph_spark.registry import all_queries

    from tests.oracle_util import compare

    q = all_queries()["q165_fuse_filter_join"]
    assert q.oracle is not None
    compare(spark, sf_small, q.name, q.fn, q.oracle)


def test_q165_fuse_probe_sits_below_the_join(spark, sf_small):
    """Census pin for the registered fuse gate (VERDICT r14 #4), via
    the shared succinct-filter census helper."""
    from hadoopwebgraph_spark.registry import all_queries

    df = all_queries()["q165_fuse_filter_join"].fn(spark, sf_small)
    _assert_probe_below_join(df)
