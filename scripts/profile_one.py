#!/usr/bin/env python
"""Isolated best-of-N profiler for ONE bench entry — the formal
weather-arbitration protocol (VERDICT r16 item #4).

When a full-bench number looks regressed, six more full-bench attempts
cannot separate code from host weather (r16 spent 1.5h of attempts on a
contaminated window); running the ONE disputed entry alone, warm,
best-of-3 settles it in under two minutes (the gB_hyperanf adjudication
took 90s: 5.53s isolated vs 12.7-26s in contaminated full runs). Use
this for any entry the round's bench flags, then record one NOTES line:

    python scripts/profile_one.py q70_sim_bruteforce_topk
    python scripts/profile_one.py gB_hyperanf_3hop --runs 5

Protocol (matches the full bench's steady-state measurement):
- same session factory and graph-fixture env default as bench.py;
- the same generic warm-up (parquet footers, fact-table codegen,
  python worker pool) plus ONE untimed warm run of the entry itself,
  so run 1 measures steady state, not plan-shape compile;
- N timed runs (default 3), 1-min loadavg tagged BEFORE each run —
  a run taken at load > ~5 is self-identifying as contaminated;
- prints one JSON line: entry, runs, best, loads, sf.

Entries: any registered query name (timed as q.fn(spark, sf).count(),
exactly the bench loop body) or the special bench bodies
gB_hyperanf_3hop / gXL_graph_scan / gXL_degree_hist.
(The gXL sink entries are deliberately absent: their bodies manage
tempdirs and cross-check each other inside bench.py; profile them by
running bench.py — they execute at the head, before any contamination
the query loop accumulates.)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _body(name, spark, sf_dir):
    """Return the entry's run-once callable — the bench body for the
    same name."""
    if name == "gB_hyperanf_3hop":

        def run():
            from hadoopwebgraph_spark.queries.graph import edges_df
            from hadoopwebgraph_spark.queries.graph_algos import (
                neighborhood_function,
            )

            nf = neighborhood_function(edges_df(spark), max_hops=3, lg_k=11)
            assert 2 <= len(nf) <= 4 and nf[-1] > nf[0]

        return run
    if name in ("gXL_graph_scan", "gXL_degree_hist"):
        from pyspark.sql import functions as F

        from hadoopwebgraph_spark.bvgraph.benchgen import ensure_xl_fixture
        from hadoopwebgraph_spark.bvgraph.datasource import read_bvgraph

        xl = ensure_xl_fixture(spark)
        if name == "gXL_graph_scan":

            def run():
                r = (
                    read_bvgraph(spark, xl, num_splits=32)
                    .select(
                        F.sum(F.size("adj")).alias("m"),
                        F.sum(F.col("src") * F.size("adj")).alias("w"),
                    )
                    .collect()[0]
                )
                assert int(r.m) > 0

        else:

            def run():
                n = (
                    read_bvgraph(spark, xl, num_splits=32)
                    .select(F.size("adj").alias("deg"))
                    .groupBy("deg")
                    .count()
                    .count()
                )
                assert n > 0

        return run

    from hadoopwebgraph_spark.registry import all_queries

    q = all_queries().get(name)
    if q is None:
        raise SystemExit(f"unknown entry {name!r} (not a bench special, "
                         f"not a registered query)")

    def run():
        assert q.fn(spark, sf_dir).count() >= 0

    return run


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs_n = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs_n = int(a.split("=", 1)[1] if "=" in a else args.pop())
    if not args:
        raise SystemExit(__doc__)
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.environ.setdefault(
        "SPARK_GRAFT_GRAPH_BASENAME",
        os.path.join(REPO, "fixtures", "bvgraph", "bench"),
    )

    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.session import get_spark

    spark = get_spark("hwg-profile-one")
    # stdout carries exactly one JSON line; Spark's console progress and
    # log noise go to stderr, so `python scripts/profile_one.py X | tail -1`
    # is always the record
    # bench.py's generic warm-up: parquet footers + fact-table codegen +
    # python worker pool
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_linestatus")
        .agg(F.sum("l_quantity"), F.count(F.lit(1)))
        .collect()
    )
    body = _body(name, spark, sf_dir)

    body()  # untimed warm run: plan-shape codegen is not query time
    timings, loads = [], []
    for _ in range(runs_n):
        loads.append(round(os.getloadavg()[0], 1))
        t0 = time.perf_counter()
        body()
        timings.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "entry": name,
        "best_sec": min(timings),
        "runs_sec": timings,
        "loadavg_before_run": loads,
        "sf_dir": sf_dir,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
