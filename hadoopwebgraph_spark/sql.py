"""User-facing SQL surface: run arbitrary ANSI SQL over the engine's
tables (star schema + the graph via the edges/adjacency views) — the
full Catalyst SQL front end is the engine's query language, exactly as
the reference delegates its algebra to Spark (README.md:32-34)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register every engine table as a temp view and run ``query``.

    Views: region nation customer supplier part orders lineitem events
    documents embeddings (events.ts normalized to microseconds), plus
    ``graph`` (src, adj) and ``edges`` (src, dst) backed by the BVGraph
    source."""
    register_views(spark, sf_dir)
    try:
        from .queries.graph import edges_df, graph_df

        graph_df(spark).createOrReplaceTempView("graph")
        edges_df(spark).createOrReplaceTempView("edges")
    except Exception:
        pass  # graph fixture unavailable: relational views still work
    return spark.sql(query)
