"""Z-order layout: curve correctness, codegen, and the actual pruning
benefit — z-ordered row groups must be tight rectangles in both filter
dimensions where a one-column sort leaves the second dimension
unpruned."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hadoopwebgraph_spark.catalog import load
from hadoopwebgraph_spark.functions.layout import morton_code, write_zorder


def _interleave_ref(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_bitwise_reference(spark):
    rows = [(x, y) for x in (0, 1, 2, 3, 255, 65535) for y in (0, 1, 7, 1024)]
    df = spark.createDataFrame(rows, "x int, y int").withColumn(
        "z", morton_code(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r.z == _interleave_ref(r.x, r.y), (r.x, r.y)


def test_morton_whole_stage_codegen(spark, sf_small):
    from hadoopwebgraph_spark.functions.layout import q109_zorder_curve

    df = q109_zorder_curve(spark, sf_small)
    codegen = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen" in codegen
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _rowgroup_stats(path: str, col: str) -> list[tuple[int, int]]:
    """(min, max) per row group for `col` — what a pruning reader sees."""
    spans = []
    ds = pq.ParquetDataset(path)
    for piece in ds.fragments:
        md = piece.metadata
        i = list(md.schema.names).index(col)
        for g in range(md.num_row_groups):
            s = md.row_group(g).column(i).statistics
            spans.append((s.min, s.max))
    return spans


def _hits(spans: list[tuple[int, int]], lo: int, hi: int) -> int:
    return sum(1 for mn, mx in spans if mx >= lo and mn <= hi)


def test_zorder_write_prunes_both_dimensions(spark, sf_small, tmp_path):
    li = load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    zpath = str(tmp_path / "z")
    npath = str(tmp_path / "naive")
    write_zorder(li, ("l_orderkey", "l_partkey"), zpath, num_files=16)
    # baseline: clustered on the FIRST dimension only
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(npath)
    )
    n_groups = len(_rowgroup_stats(npath, "l_orderkey"))
    z_groups = len(_rowgroup_stats(zpath, "l_orderkey"))
    assert z_groups >= 16 and n_groups >= 16

    # filters on the SECOND dimension: the one-column sort can prune
    # nothing (every group spans the whole l_partkey domain); the
    # z-order layout must skip at least half the row groups
    z_pk = _rowgroup_stats(zpath, "l_partkey")
    n_pk = _rowgroup_stats(npath, "l_partkey")
    z2 = sum(_hits(z_pk, lo, lo + 9) for lo in (0, 60, 120, 180))
    n2 = sum(_hits(n_pk, lo, lo + 9) for lo in (0, 60, 120, 180))
    assert n2 >= 0.9 * 4 * n_groups  # baseline really can't prune dim 2
    assert z2 < n2 / 2, (z2, n2)

    # filters on the FIRST dimension must still prune under z-order
    # (worse than a dedicated sort, but far better than nothing)
    z_ok = _rowgroup_stats(zpath, "l_orderkey")
    z1 = sum(_hits(z_ok, lo, lo + 74) for lo in (0, 400, 800, 1200))
    assert z1 < 0.6 * 4 * z_groups, z1

    # and the data survives the trip
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(npath).count()
        == li.count()
    )


def test_compact_files_preserves_rows_and_clustering(spark, sf_small, tmp_path):
    """64 tiny files -> a handful of target-sized ones; rows identical;
    with sort_col the per-file min/max ranges stay disjoint so pruning
    survives the rewrite."""
    from hadoopwebgraph_spark.functions.maintenance import compact_files

    li = load(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "frag")
    li.repartition(64).write.parquet(path)
    n_rows = li.count()
    stats = compact_files(spark, path, target_bytes=64 << 10, sort_col="l_orderkey")
    assert stats["files_before"] == 64
    assert stats["files_after"] < 16
    assert stats["rows"] == n_rows
    assert spark.read.parquet(path).count() == n_rows
    # clustering survived: per-file l_orderkey ranges overlap at most at
    # range boundaries (repartitionByRange gives disjoint key ranges)
    spans = sorted(_rowgroup_stats(path, "l_orderkey"))
    for (_lo0, prev_hi), (lo, _hi) in zip(spans, spans[1:]):
        assert lo >= prev_hi - 1


def test_date_partitioned_write_prunes_partitions(spark, sf_small, tmp_path):
    """A month filter on the hive-partitioned layout must (1) land in the
    scan's PartitionFilters (planning-time pruning, no data files
    opened for other months), (2) actually shrink the scanned file set
    to the one month's directory, and (3) lose no rows end-to-end."""
    from hadoopwebgraph_spark.functions.layout import write_date_partitioned

    orders = load(spark, sf_small, "orders")
    path = str(tmp_path / "orders_by_month")
    write_date_partitioned(orders, "o_orderdate", path)

    back = spark.read.parquet(path)
    assert back.count() == orders.count()  # nothing lost in the layout

    one_month = back.filter(F.col("p_month") == "1995-03")
    plan = one_month._sc._jvm.PythonSQLUtils.explainString(
        one_month._jdf.queryExecution(), "formatted"
    )
    # the month predicate must be a PARTITION filter (directory-level),
    # not a data filter evaluated per row after opening files
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "p_month" in pf[0], plan

    # executed-plan metric: only the one directory's file(s) are read
    one_month.collect()
    scan = one_month._jdf.queryExecution().executedPlan().collectLeaves().head()
    files_read = scan.metrics().apply("numFiles").value()
    total_files = len(back.inputFiles())
    assert files_read < total_files, (files_read, total_files)
    assert files_read >= 1

    # one compact file per month: no small-file spray from the write
    import os
    month_dirs = [d for d in os.listdir(path) if d.startswith("p_month=")]
    assert len(month_dirs) > 12
    for d in month_dirs:
        n = len([f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")])
        assert n == 1, (d, n)

    # row parity for the filtered month against the unpartitioned source
    expected = orders.filter(
        F.date_format("o_orderdate", "yyyy-MM") == "1995-03"
    ).count()
    assert one_month.count() == expected > 0


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_small, tmp_path):
    """Joining the date-partitioned fact to a FILTERED dimension on the
    partition column must prune the fact scan AT RUNTIME (dynamic
    partition pruning): the dim's surviving months are computed first and
    only those directories' files are read — the 100 TB star-join
    pattern where the calendar filter carries no fact-table literal.
    Asserted from the executed scan's metrics (numFiles vs
    staticFilesNum), not just the planned expression."""
    from hadoopwebgraph_spark.functions.layout import write_date_partitioned

    path = str(tmp_path / "orders_by_month")
    write_date_partitioned(load(spark, sf_small, "orders"), "o_orderdate", path)
    # dim as a real scan (a filtered in-memory LocalRelation gets
    # constant-folded and Spark drops the runtime filter as not
    # worthwhile; a parquet dim is the realistic star shape anyway)
    dimpath = str(tmp_path / "months_dim")
    spark.createDataFrame(
        [(f"1995-0{i}", "target" if i == 3 else "other") for i in range(1, 10)],
        "p_month string, tag string",
    ).write.parquet(dimpath)
    fact = spark.read.parquet(path)
    dim = spark.read.parquet(dimpath).filter(F.col("tag") == "target")
    j = fact.join(dim, "p_month").groupBy("o_orderpriority").count()

    plan = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruningexpression" in plan, plan

    j.collect()
    scans = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if "FileSourceScan" in name:
            m = node.metrics()
            it = m.toList()
            scans.append(
                {it.apply(i)._1(): it.apply(i)._2().value() for i in range(it.size())}
            )
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        sq = node.subqueries()
        for i in range(sq.size()):
            walk(sq.apply(i))

    walk(j._jdf.queryExecution().executedPlan())
    pruned = [s for s in scans if "staticFilesNum" in s]
    assert pruned, scans  # the fact scan carries DPP metrics
    m = pruned[0]
    assert m["numFiles"] < m["staticFilesNum"], m  # runtime-pruned file set
    # only the one month's rows ever left the scan
    expected = fact.filter(F.col("p_month") == "1995-03").count()
    assert m["numOutputRows"] == expected > 0, m


def test_date_partitioned_write_null_dates_survive(spark, tmp_path):
    """NULL dates must not be dropped by the partitioned layout: they
    land in the Hive default partition and read back as NULL p_month."""
    from hadoopwebgraph_spark.functions.layout import write_date_partitioned

    df = spark.createDataFrame(
        [(1, "1995-03-10"), (2, None), (3, "1995-04-01")], "k long, d string"
    ).withColumn("d", F.to_date("d"))
    p = str(tmp_path / "t")
    write_date_partitioned(df, "d", p)
    back = spark.read.parquet(p)
    assert back.count() == 3
    got = {r.k: r.p_month for r in back.collect()}
    assert got == {1: "1995-03", 2: None, 3: "1995-04"}
