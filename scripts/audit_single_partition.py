#!/usr/bin/env python
"""Scale audit: sweep EVERY registered query's physical plan for
Exchange SinglePartition nodes and classify what consumes them.

The q77-class defect (VERDICT r10) is an un-partitioned Window/Sort over
corpus-scale rows — every row funnels through one task at 100 TB. A
SinglePartition exchange is legitimate only when its parent is a final
global aggregate (one partial row per partition crosses the wire) or
when the sorted relation is a post-aggregate TINY table (g41/q146
bucket-offset tables, <= n/bucket_size rows by construction).

Round-11 sweep result (recorded in NOTES.md): 28/195 queries carry a
SinglePartition exchange; every parent is a HashAggregate /
ObjectHashAggregate except the documented tiny-table Sorts in
g41_subgraph_renumber and q146_token_budget_select and the scalar
-subquery / bloom-filter exchanges in q42/q118. Zero corpus-scale
global sorts or windows anywhere.

Usage: python scripts/audit_single_partition.py [sf_dir]
Exits non-zero if a NEW unclassified Sort/Window parent appears.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries whose SinglePartition-fed Sorts are proven tiny-table
# (post-aggregate bucket tables) — justify any addition with a comment
# in the query itself before adding it here
TINY_SORT_OK = {"g41_subgraph_renumber", "q146_token_budget_select"}
# exchanges with no operator parent in the main tree (scalar subqueries,
# runtime-filter builds)
SUBQUERY_OK = {"q42_scalar_subquery", "q118_bloom_filter_join"}
# the one intentional cross join in the registry (Tier B' coverage row)
CROSS_OK = {"q43_join_cross"}


def main() -> int:
    from pyspark.sql import SparkSession

    from hadoopwebgraph_spark.registry import all_queries

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def plan_of(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    bad = []
    for name, q in all_queries().items():
        try:
            p = plan_of(q.fn(spark, sf))
        except Exception as ex:  # noqa: BLE001 — audit must cover the rest
            print(f"{name}: PLAN ERROR {str(ex)[:80]}")
            continue
        if "CartesianProduct" in p and name not in CROSS_OK:
            bad.append((name, ["CartesianProduct"]))
            print(f"{name}: CARTESIAN PRODUCT")
            continue
        lines = p.splitlines()
        sp_ids, cur = set(), None
        for line in lines:
            m = re.match(r"^\((\d+)\) Exchange", line)
            if m:
                cur = m.group(1)
            if cur and "Arguments: SinglePartition" in line:
                sp_ids.add(cur)
                cur = None
        if not sp_ids:
            continue
        tree = lines[: lines.index("")] if "" in lines else lines[:60]
        parents = []
        for i, line in enumerate(tree):
            m = re.search(r"(\w+) \((\d+)\)\s*$", line)
            if m and m.group(2) in sp_ids:
                depth = len(line) - len(line.lstrip(" +-:"))
                for j in range(i - 1, -1, -1):
                    mj = re.search(r"(\w+) \((\d+)\)\s*$", tree[j])
                    dj = len(tree[j]) - len(tree[j].lstrip(" +-:"))
                    if mj and dj < depth:
                        parents.append(mj.group(1))
                        break
        aggs = {"HashAggregate", "ObjectHashAggregate", "SortAggregate"}
        susp = [x for x in parents if x not in aggs]
        if susp and name not in TINY_SORT_OK and name not in SUBQUERY_OK:
            bad.append((name, parents))
        print(f"{name}: {parents or 'subquery-only'}")
    if bad:
        print("\nUNCLASSIFIED single-partition consumers (fix or justify):")
        for name, parents in bad:
            print(f"  {name}: {parents}")
        return 1
    print("\nOK: no unclassified corpus-scale single-partition consumers")
    return 0


if __name__ == "__main__":
    sys.exit(main())
