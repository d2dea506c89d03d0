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
- hypervisor-steal fraction tagged PER RUN from /proc/stat (r17: the
  r16 steal bursts never registered in in-VM loadavg — attempts C/D
  were killed at loadavg 0.05 — so loadavg alone cannot arbitrate;
  steal_pct is the share of elapsed CPU ticks the hypervisor withheld
  during THAT run: >~5% means the wall time is not the code's);
- prints one JSON line: entry, runs, best, loads, steal_pct, sf.

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
    """Return the entry's run-once callable — THE bench body for the
    same name, imported from benchlib (review r17: shared, not copied,
    so the arbitration protocol cannot drift from what it arbitrates)."""
    from hadoopwebgraph_spark import benchlib

    if name == "gB_hyperanf_3hop":

        def run():
            benchlib.check_nf(benchlib.hyperanf_3hop(spark))

        return run
    if name in ("gXL_graph_scan", "gXL_degree_hist"):
        from hadoopwebgraph_spark.bvgraph.benchgen import ensure_xl_fixture

        xl = ensure_xl_fixture(spark)
        if name == "gXL_graph_scan":

            def run():
                m, _ = benchlib.xl_scan_agg(spark, xl, 32)
                assert m > 0

        else:

            def run():
                assert benchlib.xl_degree_hist_count(spark, xl) > 0

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
    # positional: <entry> [sf_dir]; flag: --runs N or --runs=N anywhere
    # (review r17: the first draft's args.pop() grabbed the LAST
    # positional for a space-separated --runs, misparsing every
    # flag-not-last ordering)
    args: list[str] = []
    runs_n = 3
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--runs" or a.startswith("--runs="):
            if "=" in a:
                runs_n = int(a.split("=", 1)[1])
            else:
                i += 1
                if i >= len(argv):
                    raise SystemExit("--runs needs a value")
                runs_n = int(argv[i])
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a!r}\n{__doc__}")
        else:
            args.append(a)
        i += 1
    if not args or runs_n < 1:
        raise SystemExit(__doc__)
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    os.environ.setdefault(
        "SPARK_GRAFT_GRAPH_BASENAME",
        os.path.join(REPO, "fixtures", "bvgraph", "bench"),
    )

    from hadoopwebgraph_spark.benchlib import generic_warmup, graph_ann_warmup
    from hadoopwebgraph_spark.session import get_spark

    spark = get_spark("hwg-profile-one")
    # stdout carries exactly one JSON line; Spark's console progress and
    # log noise go to stderr, so `python scripts/profile_one.py X | tail -1`
    # is always the record
    generic_warmup(spark, sf_dir)  # bench.py's exact warm-up, shared
    try:
        # the bench's graph + ANN steady-state prep runs before EVERY
        # bench measurement, so it runs here too (review r17 pass 2:
        # without the shared embeddings persist, ANN probes re-scan the
        # corpus per run and the profiler measures a different protocol
        # than the bench entry it arbitrates); best-effort like bench.py
        graph_ann_warmup(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(f"warmup skipped: {type(exc).__name__}: {exc}", file=sys.stderr)
    body = _body(name, spark, sf_dir)

    body()  # untimed warm run: plan-shape codegen is not query time
    timings, loads, steals = [], [], []
    for _ in range(runs_n):
        loads.append(round(os.getloadavg()[0], 1))
        s0 = _steal_ticks()
        t0 = time.perf_counter()
        body()
        dt = time.perf_counter() - t0
        timings.append(round(dt, 3))
        steals.append(_steal_pct(s0, dt))
    print(json.dumps({
        "entry": name,
        "best_sec": min(timings),
        "runs_sec": timings,
        "loadavg_before_run": loads,
        "steal_pct_per_run": steals,
        "sf_dir": sf_dir,
    }))
    return 0


def _steal_ticks() -> int | None:
    """Aggregate steal ticks from /proc/stat (Linux; None elsewhere)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8])  # cpu: user nice system idle iowait irq softirq steal
    except (OSError, IndexError, ValueError):
        return None


def _steal_pct(s0: int | None, elapsed_sec: float) -> float | None:
    """Steal during the run as % of total machine CPU capacity over the
    elapsed wall time (ticks are USER_HZ=100 per core per second)."""
    s1 = _steal_ticks()
    if s0 is None or s1 is None or elapsed_sec <= 0:
        return None
    capacity = elapsed_sec * 100.0 * (os.cpu_count() or 1)
    return round(100.0 * (s1 - s0) / capacity, 1)


if __name__ == "__main__":
    sys.exit(main())
