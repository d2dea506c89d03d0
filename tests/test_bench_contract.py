"""Pin the bench.py stdout contract.

The driver captures only the last ~2000 characters of bench stdout and
parses the final line as JSON. Round 6's numbers were lost because the
line outgrew that capture (``BENCH_r06.json: parsed: null``). This test
constructs the worst-case payload bench.py can emit — every headline
entry present at maximum numeric width plus the scan/sink scalars — and
asserts the serialized line stays comfortably under the cap.
"""

from __future__ import annotations

import json

import bench


def _worst_case_line() -> str:
    # 999.999 is the widest value round(x, 3) produces for any sane
    # per-query time (a >1000s query would have failed the round anyway)
    queries = {name: 999.999 for name in bench.HEADLINE}
    queries["gXL_graph_scan"] = 999.999
    queries["gXL_degree_hist"] = 999.999
    queries["gXL_sink_write"] = 999.999
    queries["gXL_sink_copy"] = 999.999
    queries["gB_hyperanf_3hop"] = 999.999
    # stdout shape after the r12 headroom shed: loadavg_end, absolute
    # arc counts, the rerun bit, and sink throughput live in
    # bench_detail.json now (EXTRA_DETAIL timings never touch stdout)
    out = {
        "metric": "headline_queries_total_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "graph_scan_arcs_per_sec": 999_999_999,
        "graph_scan_partition_invariant": False,
    }
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


def test_bench_extra_detail_names_resolve():
    from hadoopwebgraph_spark.registry import all_queries

    names = set(all_queries())
    missing = [n for n in bench.EXTRA_DETAIL if n not in names]
    assert not missing, f"EXTRA_DETAIL references unknown queries: {missing}"


def test_bench_headline_names_resolve():
    from hadoopwebgraph_spark.registry import all_queries

    names = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in names]
    assert not missing, f"HEADLINE references unknown queries: {missing}"


def test_bench_stdout_line_with_errors_stays_parseable():
    """Error entries DO reach stdout (80-char-truncated, headline-only
    — EXTRA_DETAIL errors go to bench_detail's errors_extra, ADVICE
    r12) but only for queries with no timing entry. Model a 5-failure
    round at full error width and assert the line still fits the
    driver's capture without tripping bench.py's 1900 shed guard — so
    the errors actually SURVIVE onto the parsed line when they matter
    most."""
    queries = {name: 999.999 for name in bench.HEADLINE}
    for extra in (
        "gXL_graph_scan",
        "gXL_degree_hist",
        "gXL_sink_write",
        "gXL_sink_copy",
        "gB_hyperanf_3hop",
    ):
        queries[extra] = 999.999
    failed = sorted(queries, key=len, reverse=True)[:5]
    errors = {name: "E" * 40 for name in failed}  # bench's stdout truncation
    for name in failed:
        del queries[name]  # bench records an error only when no timing landed
    out = {
        "metric": "headline_queries_total_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "graph_scan_arcs_per_sec": 999_999_999,
        "graph_scan_partition_invariant": False,
        "errors": errors,
    }
    line = json.dumps(out)
    assert len(line) < 1900, (
        f"a 5-failure bench line would be {len(line)} chars and trip the "
        "shed guard, losing the error signal — trim HEADLINE or tighten "
        "the error truncation"
    )
