#!/usr/bin/env python
"""Validate every STAGED gate candidate (hadoopwebgraph_spark/staged.py)
against its DuckDB oracle at sf0.01 on the SAME vanilla non-UTC session
shape scripts/driver_sim.py applies to registered names (shared
plumbing in scripts/gate_common.py — review r16: an earlier draft
omitted the non-UTC timezone, so a timestamp-sensitive candidate could
pass staging yet mismatch once registered). Run before a round's
registration decision; exit 0 = every staged pair value-matches.

Usage: python scripts/staged_sim.py [sf_dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    from gate_common import duck_views, make_gate_session, norm

    from hadoopwebgraph_spark.staged import staged_queries

    spark = make_gate_session()
    con = duckdb.connect()
    duck_views(con, sf_dir)
    failed = []
    for name, (fn, oracle, cost) in staged_queries().items():
        t0 = time.perf_counter()
        s = fn(spark, sf_dir).toPandas()
        dt = time.perf_counter() - t0
        d = con.sql(oracle).df()
        ok = len(s) == len(d) and norm(s) == norm(d)
        print(
            f"{name} rows {len(s)} {'VALUE-MATCH' if ok else 'MISMATCH'} "
            f"({dt:.1f}s; recorded: {cost})"
        )
        if not ok:
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
