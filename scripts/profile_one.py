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
  were killed at loadavg 0.05 — so loadavg alone cannot arbitrate).
  Two views per run, both must read low for the run to be credible:
  steal_pct (share of whole-machine capacity withheld — right for
  entries that saturate the box) and steal_pct_busy (share of non-idle
  CPU withheld — right for narrow entries, where targeted steal on the
  few busy cores barely moves the machine view); >~5% on either means
  the wall time is not the code's;
- prints one JSON line: entry, runs, best, loads, steal pcts, sf.

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
    from hadoopwebgraph_spark.benchlib import (
        bench_env_defaults,
        generic_warmup,
        graph_ann_warmup,
    )

    name = args[0]
    default_sf = bench_env_defaults()  # also defaults the graph fixture
    sf_dir = args[1] if len(args) > 1 else default_sf
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
    timings, loads, steals, steals_busy = [], [], [], []
    for _ in range(runs_n):
        loads.append(round(os.getloadavg()[0], 1))
        s0 = _cpu_ticks()
        t0 = time.perf_counter()
        body()
        dt = time.perf_counter() - t0
        timings.append(round(dt, 3))
        machine, busy = _steal_pct(s0, dt)
        steals.append(machine)
        steals_busy.append(busy)
    print(json.dumps({
        "entry": name,
        "best_sec": min(timings),
        "runs_sec": timings,
        "loadavg_before_run": loads,
        "steal_pct_per_run": steals,
        "steal_pct_busy_per_run": steals_busy,
        "sf_dir": sf_dir,
    }))
    return 0


def _cpu_ticks() -> tuple[int, int] | None:
    """(steal, non-idle) aggregate ticks from /proc/stat (Linux; None
    elsewhere). non-idle = everything but idle, steal included."""
    try:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        # cpu: user nice system idle iowait irq softirq steal [guest...]
        # guest/guest_nice are already included in user/nice (ADVICE
        # r17) — summing past steal would double-count nested-guest time
        return v[7], sum(v[:8]) - v[3]
    except (OSError, IndexError, ValueError):
        return None


def _steal_pct(t0: tuple[int, int] | None, elapsed_sec: float):
    """Two views of the hypervisor steal during one run, because either
    alone can mislead (review r17): ``machine`` = steal as % of total
    machine capacity over the wall time (right for entries that
    saturate all cores — the bench's common case); ``busy`` = steal as
    % of non-idle CPU time (right for narrow entries, where a burst
    stealing the one or two busy cores barely moves the machine view).
    A run is credible only when BOTH read low. Tick rate comes from
    SC_CLK_TCK (the busy ratio is rate-free; the capacity view is not)."""
    t1 = _cpu_ticks()
    if t0 is None or t1 is None or elapsed_sec <= 0:
        return None, None
    ds, db = t1[0] - t0[0], t1[1] - t0[1]
    try:
        hz = os.sysconf("SC_CLK_TCK") or 100
    except (OSError, ValueError):
        hz = 100
    capacity = elapsed_sec * hz * (os.cpu_count() or 1)
    machine = round(100.0 * ds / capacity, 1)
    busy = round(100.0 * ds / db, 1) if db > 0 else None
    return machine, busy


if __name__ == "__main__":
    sys.exit(main())
