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
from .graph import _T, _materialize, _memo_key, edges_df

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
    e = _materialize(  # decode once across all terms AND calls
        edges_df(spark), key=_memo_key(spark, "edges")
    )
    m = find_motif(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
    return m.agg(
        F.count(F.lit(1)).alias("n_open"),
        F.countDistinct("a", "c").alias("n_open_pairs"),
    )


# ---------------------------------------------------------------------------
# g42: directed triad census (Holland & Leinhardt) over connected triples
# ---------------------------------------------------------------------------

# Bit layout for a sorted triple (x < y < z):
#   bit 0: x->y   bit 1: y->x   bit 2: x->z   bit 3: z->x
#   bit 4: y->z   bit 5: z->y
# The 64 -> 16 canonicalization (minimum code over the 6 vertex
# permutations) is computed ONCE here in Python and embedded as
# literals in BOTH engines — the PHASH_DCT_Q shared-literal discipline.
# Validated invariant: the 16 classes partition the 64 codes with the
# textbook multiplicities 1,6,3,(3,6,3),(6,6),(6,2),3,(3,6,3),6,1.
def _triad_canon_map() -> dict[int, int]:
    from itertools import permutations

    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]

    def code_of(edges):
        return sum(1 << i for i, p in enumerate(pairs) if p in edges)

    out = {}
    for code in range(64):
        edges = {pairs[i] for i in range(6) if code >> i & 1}
        out[code] = min(
            code_of({(p[a], p[b]) for a, b in edges})
            for p in permutations(range(3))
        )
    return out


TRIAD_CANON = _triad_canon_map()

# m-a-n label (mutual/asymmetric/null dyad counts) per canonical code
def _man_label(code: int) -> str:
    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
    edges = {pairs[i] for i in range(6) if code >> i & 1}
    m = a = n = 0
    for x, y in [(0, 1), (0, 2), (1, 2)]:
        f, b = (x, y) in edges, (y, x) in edges
        m, a, n = m + (f and b), a + ((f or b) and not (f and b)), n + (
            not f and not b
        )
    return f"{m}-{a}-{n}"


TRIAD_MAN = {c: _man_label(c) for c in sorted(set(TRIAD_CANON.values()))}

_CANON_SQL_VALUES = ", ".join(
    f"({c}, {k}, '{TRIAD_MAN[k]}')" for c, k in sorted(TRIAD_CANON.items())
)
_CANON_CASE = "CASE code " + " ".join(
    f"WHEN {c} THEN {k}" for c, k in sorted(TRIAD_CANON.items())
) + " END"


@register(
    "g42_triad_census",
    oracle=f"""
    WITH e0 AS (SELECT src, unnest(adj) AS dst FROM {_T}),
    e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
    und AS MATERIALIZED (
        SELECT least(src, dst) AS u, greatest(src, dst) AS v,
               CAST(max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS INTEGER) AS f,
               CAST(max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS INTEGER) AS b
        FROM e GROUP BY 1, 2
    ),
    ends AS (
        SELECT u AS c, v AS o FROM und UNION ALL SELECT v, u FROM und
    ),
    tri AS MATERIALIZED (
        SELECT DISTINCT
               least(a.o, least(a.c, b.o)) AS x,
               least(greatest(a.o, b.o), greatest(least(a.o, b.o), a.c)) AS y,
               greatest(a.o, greatest(a.c, b.o)) AS z
        FROM ends a JOIN ends b ON a.c = b.c AND a.o < b.o
    ),
    coded AS (
        SELECT t.x, t.y, t.z,
               coalesce(xy.f, 0) * 1 + coalesce(xy.b, 0) * 2
             + coalesce(xz.f, 0) * 4 + coalesce(xz.b, 0) * 8
             + coalesce(yz.f, 0) * 16 + coalesce(yz.b, 0) * 32 AS code
        FROM tri t
        LEFT JOIN und xy ON xy.u = t.x AND xy.v = t.y
        LEFT JOIN und xz ON xz.u = t.x AND xz.v = t.z
        LEFT JOIN und yz ON yz.u = t.y AND yz.v = t.z
    ),
    mapped AS (
        SELECT m.canon, m.man
        FROM coded c
        JOIN (VALUES {_CANON_SQL_VALUES}) AS m(code, canon, man)
          ON m.code = c.code
    )
    SELECT canon AS triad_code, man, CAST(count(*) AS BIGINT) AS n_triads
    FROM mapped GROUP BY 1, 2
    """,
    doc="Directed triad census (Holland & Leinhardt 1976) over CONNECTED "
    "triples — every unordered node triple with >= 2 connected dyads, "
    "classified into its isomorphism class by canonical 6-bit edge code "
    "(minimum over the 6 vertex permutations, precomputed in Python and "
    "shared with the oracle as literals; the 64->16 map's class "
    "multiplicities match the textbook census table). Triples are "
    "generated center-wise from the connected-pair list (each 2-dyad "
    "triple found once, 3-dyad triples deduped), so nothing is O(n^3): "
    "work is sum-of-C(conn_degree,2), the standard census-algorithm "
    "bound (Batagelj & Mrvar 2001); the three disconnected classes "
    "(0-0-3, 0-1-2, 1-0-2) are closed-form complements from dyad "
    "counts, documented rather than enumerated. Scale: one shuffle "
    "builds the dyad table, the center join fans out pairs of a "
    "center's neighbors (hub centers are the skew — AQE splits them), "
    "and classification is three broadcast-sized dyad lookups plus a "
    "literal map.",
)
def g42_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _materialize(  # one decode feeds dyads and all lookups
        edges_df(spark).filter(F.col("src") != F.col("dst")).distinct(),
        key=_memo_key(spark, "edges-noself-distinct"),
    )
    und = (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("f0"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("b0"),
        )
        .groupBy("u", "v")
        .agg(F.max("f0").alias("f"), F.max("b0").alias("b"))
    )
    und = _materialize(und, key=_memo_key(spark, "g42-dyads"))
    ends = und.select(F.col("u").alias("c"), F.col("v").alias("o")).union(
        und.select(F.col("v").alias("c"), F.col("u").alias("o"))
    )
    a = ends.alias("a")
    b = ends.alias("b")
    tri = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.o") < F.col("b.o")))
        .select(
            F.array_sort(
                F.array(F.col("a.c"), F.col("a.o"), F.col("b.o"))
            ).alias("t")
        )
        .select(
            F.col("t")[0].alias("x"), F.col("t")[1].alias("y"),
            F.col("t")[2].alias("z"),
        )
        .distinct()
    )

    def dy(alias, xc, yc):
        d = und.select(
            F.col("u").alias(f"{alias}_u"),
            F.col("v").alias(f"{alias}_v"),
            F.col("f").alias(f"{alias}_f"),
            F.col("b").alias(f"{alias}_b"),
        )
        return d, (F.col(f"{alias}_u") == F.col(xc)) & (
            F.col(f"{alias}_v") == F.col(yc)
        )

    dxy, cxy = dy("xy", "x", "y")
    dxz, cxz = dy("xz", "x", "z")
    dyz, cyz = dy("yz", "y", "z")
    code = (
        F.coalesce(F.col("xy_f"), F.lit(0)) * 1
        + F.coalesce(F.col("xy_b"), F.lit(0)) * 2
        + F.coalesce(F.col("xz_f"), F.lit(0)) * 4
        + F.coalesce(F.col("xz_b"), F.lit(0)) * 8
        + F.coalesce(F.col("yz_f"), F.lit(0)) * 16
        + F.coalesce(F.col("yz_b"), F.lit(0)) * 32
    )
    coded = (
        tri.join(dxy, cxy, "left")
        .join(dxz, cxz, "left")
        .join(dyz, cyz, "left")
        .select(code.alias("code"))
    )
    man_map = F.create_map(
        *[
            x
            for k, v in sorted(TRIAD_MAN.items())
            for x in (F.lit(k), F.lit(v))
        ]
    )
    return (
        coded.select(F.expr(_CANON_CASE).alias("triad_code"))
        .select("triad_code", man_map[F.col("triad_code")].alias("man"))
        .groupBy("triad_code", "man")
        .agg(F.count(F.lit(1)).alias("n_triads"))
    )
