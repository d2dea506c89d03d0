"""GraphFrames-style motif finding over the edge table — the declarative
counterpart to the reference's "hand off to GraphX" story (README.md:
32-48): a pattern of directed edges compiles to a self-join plan, with
``!``-negated terms compiled to anti-joins.

Pattern grammar (a subset of GraphFrames' ``find``):
    "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)"
Named vertices bind across terms; a negated term requires both its
vertices to be bound by positive terms. The result has one column per
named vertex, one row per binding (duplicate-free edges assumed — the
BVGraph format invariant).

Scale: each positive term is one equi-join on already-bound vertex
columns (Catalyst orders them; AQE splits celebrity-vertex skew);
negated terms are anti-joins — no cartesian products unless a term
shares no vertex with the accumulated pattern.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .graph import _T, edges_df

_TERM = re.compile(r"^(!)?\((\w+)\)-\[\]->\((\w+)\)$")


def parse_pattern(pattern: str) -> tuple[list[tuple[str, str]], list[tuple[str, str]]]:
    """-> (positive_edges, negated_edges) as (src_name, dst_name) pairs."""
    pos: list[tuple[str, str]] = []
    neg: list[tuple[str, str]] = []
    for term in filter(None, (t.strip() for t in pattern.split(";"))):
        m = _TERM.match(term)
        if not m:
            raise ValueError(f"bad motif term {term!r}")
        bang, a, b = m.groups()
        (neg if bang else pos).append((a, b))
    if not pos:
        raise ValueError("motif needs at least one positive edge term")
    bound = {v for e in pos for v in e}
    for a, b in neg:
        if a not in bound or b not in bound:
            raise ValueError(
                f"negated term !({a})-[]->({b}) uses unbound vertices"
            )
    return pos, neg


def find_motif(edges: DataFrame, pattern: str) -> DataFrame:
    """Match a motif pattern against DataFrame[src, dst]; returns one
    column per named vertex, one row per binding."""
    pos, neg = parse_pattern(pattern)

    cols: dict[str, str] = {}  # vertex name -> bound column
    df: DataFrame | None = None
    for i, (a, b) in enumerate(pos):
        ei = edges.select(
            F.col("src").alias(f"__s{i}"), F.col("dst").alias(f"__d{i}")
        )
        conds = []
        if a == b:  # self-loop term
            ei = ei.filter(F.col(f"__s{i}") == F.col(f"__d{i}"))
        for v, c in ((a, f"__s{i}"), (b, f"__d{i}")):
            if v in cols:
                conds.append(F.col(c) == F.col(cols[v]))
        if df is None:
            df = ei
        elif conds:
            df = df.join(ei, reduce(lambda x, y: x & y, conds))
        else:  # disconnected pattern component: genuine cartesian
            df = df.crossJoin(ei)
        for v, c in ((a, f"__s{i}"), (b, f"__d{i}")):
            cols.setdefault(v, c)

    for j, (a, b) in enumerate(neg):
        nj = edges.select(
            F.col("src").alias(f"__ns{j}"), F.col("dst").alias(f"__nd{j}")
        )
        df = df.join(
            nj,
            (F.col(cols[a]) == F.col(f"__ns{j}"))
            & (F.col(cols[b]) == F.col(f"__nd{j}")),
            "left_anti",
        )

    return df.select(*[F.col(c).alias(v) for v, c in sorted(cols.items())])


@register(
    "g14_motif_open_triad",
    oracle=f"""
    WITH e AS (SELECT src, unnest(adj) AS dst FROM {_T})
    SELECT count(*) AS n_open,
           count(DISTINCT (e1.src, e2.dst)) AS n_open_pairs
    FROM e e1 JOIN e e2 ON e1.dst = e2.src
    WHERE NOT EXISTS (SELECT 1 FROM e e3
                      WHERE e3.src = e1.src AND e3.dst = e2.dst)
    """,
    doc="Open feed-forward triads a->b->c with NO closing a->c edge, via "
    "the motif DSL ('(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)') — the "
    "negated term compiles to an anti-join. Complements g06 (closed "
    "triangles); open + closed = all 2-paths (g05).",
)
def g14_motif_open_triad(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = edges_df(spark).localCheckpoint()  # decode once across all terms
    m = find_motif(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    return m.agg(
        F.count(F.lit(1)).alias("n_open"),
        F.countDistinct("a", "c").alias("n_open_pairs"),
    )
