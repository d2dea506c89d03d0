"""Pin the bench.py stdout contract.

The driver captures only the last ~2000 characters of bench stdout and
parses the final line as JSON. Round 6's numbers were lost because the
line outgrew that capture (``BENCH_r06.json: parsed: null``). These
tests construct the worst-case payloads bench.py can emit — every
headline entry present at maximum numeric width plus the scan/sink
scalars, with and without stdout error entries — and assert the
serialized lines stay under their caps.
"""

from __future__ import annotations

import json

import bench

_NON_REGISTRY_ENTRIES = (
    "gXL_graph_scan",
    "gXL_degree_hist",
    "gXL_sink_write",
    "gXL_sink_copy",
    "gB_hyperanf_3hop",
)


def _worst_case_line(n_failed: int = 0) -> str:
    """The widest stdout line bench.py can emit: every entry timed at
    maximum numeric width (999.999 is the widest round(x, 3) value for
    any sane per-query time), the stdout scalars after the r12 headroom
    shed (loadavg_end, arc counts, the rerun bit, sink throughput and
    EXTRA_DETAIL timings/errors all live in bench_detail.json), and —
    when ``n_failed`` > 0 — that many failures modeled the way bench
    records them: the error entry (40-char stdout truncation) REPLACES
    the query's timing entry, longest names first."""
    queries = {name: 999.999 for name in bench.HEADLINE}
    for extra in _NON_REGISTRY_ENTRIES:
        queries[extra] = 999.999
    out = {
        "metric": "headline_queries_total_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "stable_block_sec": 99999.999,
        "graph_scan_arcs_per_sec": 999_999_999,
        "graph_scan_partition_invariant": False,
    }
    if n_failed:
        failed = sorted(queries, key=len, reverse=True)[:n_failed]
        out["errors"] = {name: "E" * 40 for name in failed}
        for name in failed:
            del queries[name]
    return json.dumps(out)


def test_bench_stdout_line_fits_driver_capture():
    line = _worst_case_line()
    # the 1800 cap keeps the line inside the driver's ~2000-char tail
    # capture; the tighter 1700 bar enforces the VERDICT r11 #8 headroom
    # (>= 100 chars) so one future HEADLINE entry can't silently breach
    assert len(line) < 1700, (
        f"bench stdout line would be {len(line)} chars; the driver tail "
        "capture is ~2000 and the repo keeps >= 100 chars of headroom — "
        "move fields to bench_detail.json or trim HEADLINE before adding "
        "more entries"
    )


def test_stable_block_members_are_measured_entries():
    """Every STABLE_BLOCK name must be an entry bench.py actually times
    (HEADLINE or the scan/sink scalars) — a stale member would make
    stable_block_sec permanently null, killing the cross-round anchor."""
    measured = set(bench.HEADLINE) | set(_NON_REGISTRY_ENTRIES)
    assert set(bench.STABLE_BLOCK) <= measured


def test_bench_stdout_line_with_errors_stays_parseable():
    """Headline errors DO reach stdout (40-char-truncated; EXTRA_DETAIL
    errors go to bench_detail's errors_extra, ADVICE r12). A 5-failure
    round must still fit without tripping bench.py's 1900 shed guard —
    so the error signal SURVIVES onto the parsed line when it matters
    most."""
    line = _worst_case_line(n_failed=5)
    assert len(line) < 1900, (
        f"a 5-failure bench line would be {len(line)} chars and trip the "
        "shed guard, losing the error signal — trim HEADLINE or tighten "
        "the error truncation"
    )


def test_bench_extra_detail_names_resolve():
    from hadoopwebgraph_spark.registry import all_queries

    names = set(all_queries())
    extra = bench.EXTRA_DETAIL_PRE + bench.EXTRA_DETAIL_POST
    missing = [n for n in extra if n not in names]
    assert not missing, f"EXTRA_DETAIL references unknown queries: {missing}"


def test_bench_headline_names_resolve():
    from hadoopwebgraph_spark.registry import all_queries

    names = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in names]
    assert not missing, f"HEADLINE references unknown queries: {missing}"
