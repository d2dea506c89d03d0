#!/usr/bin/env python
"""Simulate the round driver's t1+t2 gates in one command: cold-import
__spark_entry__.py, run entry() as a smoke check on a VANILLA (non-UTC)
session, then run the first N window queries at sf0.01 against their
DuckDB oracles with the driver's order-insensitive value compare.

This is the closest local approximation of what the driver will do
first — the window head is exactly the round's never-verified names, so
a green run here means the round's new registrations will certify.

Usage: python scripts/driver_sim.py [N=9] [sf_dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gate_common import duck_views, make_gate_session, norm

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    spark = make_gate_session()
    print("entry rows:", len(mod.entry(spark).collect()))

    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    duck_views(con, sf_dir)

    bad = 0
    for name in list(qs)[:n]:
        s = qs[name](spark, sf_dir).toPandas()
        if name in osql:
            d = con.sql(osql[name]).df()
            ok = len(s) == len(d) and norm(s) == norm(d)
            print(name, "rows", len(s), "HASH-MATCH" if ok else "MISMATCH")
            bad += 0 if ok else 1
        else:
            print(name, "rows-only", len(s))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
