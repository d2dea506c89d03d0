#!/usr/bin/env python
"""Validate every STAGED gate candidate (hadoopwebgraph_spark/staged.py)
against its DuckDB oracle at sf0.01 on a vanilla driver-style session —
the same t2-shaped gate scripts/driver_sim.py applies to registered
names. Run before a round's registration decision; exit 0 = every
staged pair value-matches.

Usage: python scripts/staged_sim.py [sf_dir=/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    from hadoopwebgraph_spark.catalog import TABLES
    from hadoopwebgraph_spark.staged import staged_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed = []
    for name, (fn, oracle, cost) in staged_queries().items():
        t0 = time.perf_counter()
        s = fn(spark, sf_dir).toPandas()
        dt = time.perf_counter() - t0
        d = con.sql(oracle).df()
        cols = sorted(s.columns)
        ok = len(s) == len(d) and sorted(
            map(repr, s[cols].itertuples(index=False, name=None))
        ) == sorted(map(repr, d[cols].itertuples(index=False, name=None)))
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
