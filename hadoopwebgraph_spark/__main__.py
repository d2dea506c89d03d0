"""CLI entry point: ``python -m hadoopwebgraph_spark <command>``.

Commands:
  list  [--filter SUBSTR]          registered queries + one-line docs
  run   NAME [--sf DIR] [--limit N]  execute one query, print rows
  explain NAME [--sf DIR]          formatted physical plan
  oracle NAME                      the query's DuckDB oracle SQL
  sql   "SELECT ..." [--sf DIR]    ad-hoc SQL over the catalog tables

The same registry the driver consumes (``__spark_entry__.py``) backs
every command, so what the CLI runs is exactly what the correctness
gate certifies.
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hadoopwebgraph_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--filter", default="", help="substring filter")

    for name in ("run", "explain"):
        p = sub.add_parser(name)
        p.add_argument("name")
        p.add_argument("--sf", default=DEFAULT_SF)
        if name == "run":
            p.add_argument("--limit", type=int, default=20)

    p_oracle = sub.add_parser("oracle", help="print a query's DuckDB oracle")
    p_oracle.add_argument("name")

    p_sql = sub.add_parser("sql", help="ad-hoc SQL over the catalog tables")
    p_sql.add_argument("query")
    p_sql.add_argument("--sf", default=DEFAULT_SF)
    p_sql.add_argument("--limit", type=int, default=20)

    args = ap.parse_args(argv)

    from .registry import all_queries

    queries = all_queries()

    if args.cmd == "list":
        for name, q in sorted(queries.items()):
            if args.filter and args.filter not in name:
                continue
            doc = " ".join((q.doc or "").split())
            tag = "sql-oracle" if q.oracle else "rows-only "
            print(f"{name:34s} [{tag}] {doc[:90]}")
        return 0

    if args.cmd == "oracle":
        q = queries.get(args.name)
        if q is None:
            print(f"unknown query {args.name!r}", file=sys.stderr)
            return 2
        if q.oracle is None:
            print(f"{args.name} is rows-only (no oracle)", file=sys.stderr)
            return 1
        print(q.oracle.strip())
        return 0

    from .session import get_spark

    spark = get_spark("hwg-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "sql":
        from .sql import run_sql

        run_sql(spark, args.sf, args.query).show(args.limit, truncate=False)
        return 0

    q = queries.get(args.name)
    if q is None:
        print(f"unknown query {args.name!r}", file=sys.stderr)
        return 2
    df = q.fn(spark, args.sf)
    if args.cmd == "explain":
        print(
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
