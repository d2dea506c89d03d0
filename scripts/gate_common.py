"""Shared gate plumbing for scripts/driver_sim.py and
scripts/staged_sim.py (review r16: each carried its own copy of the
session shape, the DuckDB view bootstrap, and the order-insensitive
value compare — the two gates must not drift apart).

The session is deliberately VANILLA-but-non-UTC (the driver owns
session creation and does not run UTC; catalog.load() must self-heal
required confs), exactly as driver_sim has always built it.
"""

from __future__ import annotations


def make_gate_session(master: str = "local[8]"):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def duck_views(con, sf_dir: str) -> None:
    from hadoopwebgraph_spark.catalog import TABLES

    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )


def norm(df) -> list[str]:
    """The gates' order-insensitive value normalization: columns sorted
    by name, rows as sorted reprs."""
    cols = sorted(df.columns)
    return sorted(map(repr, df[cols].itertuples(index=False, name=None)))
