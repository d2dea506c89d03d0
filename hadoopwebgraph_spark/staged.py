"""Central inventory of STAGED gate candidates — validated (query fn,
oracle SQL) pairs that are NOT yet registered (each registration
spends one driver-window slot; see registry.py's rotation notes).

Kept as code, not prose, so the next round's registration is
mechanical: pick entries by the recorded cost, move the @register
decorator onto the fn (or re-point the registry), and delete the entry
here. scripts/staged_sim.py runs every entry against its oracle at
sf0.01 on a vanilla driver-style session — the same gate driver_sim
applies to registered names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def staged_queries() -> dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str, str]
]:
    """name -> (fn, oracle_sql, cost_note). Import-light: resolved
    lazily so this module never forces the whole package graph."""
    from .functions.ccstream import (
        _g47_oracle,
        g47_stream_connected_components,
        g48_stream_host_graph,
    )
    from .functions.sketches import _Q160_ORACLE, q170_stream_theta_setops
    from .functions.suffixes import span_oracle_sql
    from .functions.text import _Q137_ORACLE, q167_stream_inverted_index
    from .queries.graph import _G25_ORACLE

    def q166_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        from .catalog import load
        from .functions.suffixes import duplicated_span_intervals_multi

        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        df = duplicated_span_intervals_multi(docs, [16, 20, 33])
        return df.select(
            "span_len",
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
        )

    q166_oracle = " UNION ALL ".join(
        span_oracle_sql(L, with_len=True) for L in (16, 20, 33)
    )
    return {
        "g48_stream_host_graph": (
            g48_stream_host_graph,
            _G25_ORACLE,
            "~15.1s cold / warm in the q170 class at sf0.01 (r17 staged_sim)",
        ),
        "q170_stream_theta_setops": (
            q170_stream_theta_setops,
            _Q160_ORACLE,
            "~6.7s warm / 15.6s cold at sf0.01 (r17 staged_sim; 2*K-row "
            "state, the cheapest of the family)",
        ),
        "q167_stream_inverted_index": (
            q167_stream_inverted_index,
            _Q137_ORACLE,
            "~5s at sf0.01 (r16)",
        ),
        "q166_multi_threshold_spans": (
            q166_fn,
            q166_oracle,
            "~7.4s warm / 18.2s cold at sf0.01 (r16; 10.3s at sf0.1 r14)",
        ),
        "g47_stream_connected_components": (
            g47_stream_connected_components,
            _g47_oracle(),
            "~9s warm / 27s cold at sf0.01 (r16)",
        ),
    }
