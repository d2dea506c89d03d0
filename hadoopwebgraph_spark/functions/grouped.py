"""Grouped-map Pandas UDF coverage (``applyInPandas``) — the per-group
custom-compute surface. The demo operator fits a per-customer linear
trend of order value over time; the oracle is DuckDB's ``regr_slope`` /
``regr_intercept`` (the UDF computes the identical closed form)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["x"].to_numpy(dtype="float64")
    y = pdf["o_totalprice"].to_numpy(dtype="float64")
    n = len(x)
    mx, my = x.mean(), y.mean()
    varx = ((x - mx) ** 2).sum()
    if varx == 0.0:
        slope = None
        intercept = None
    else:
        slope = float(((x - mx) * (y - my)).sum() / varx)
        intercept = float(my - slope * mx)
    return pd.DataFrame(
        {
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "n_orders": [n],
            "slope": [None if slope is None else round(slope, 4)],
            "intercept": [None if intercept is None else round(intercept, 2)],
        }
    )


@register(
    "q91_grouped_map_regression",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           round(regr_slope(o_totalprice, epoch(o_orderdate) / 86400.0), 4)
               AS slope,
           round(regr_intercept(o_totalprice, epoch(o_orderdate) / 86400.0), 2)
               AS intercept
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 2
    """,
    doc="Grouped-map applyInPandas: per-customer OLS trend of order value "
    "over time (Arrow-batched, one pandas frame per group), matching "
    "DuckDB's regr_slope/regr_intercept closed form.",
)
def q91_grouped_map_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        (F.unix_timestamp("o_orderdate") / 86400.0).alias("x"),
    )
    fitted = o.groupBy("o_custkey").applyInPandas(
        _fit, "o_custkey long, n_orders long, slope double, intercept double"
    )
    return fitted.filter(F.col("n_orders") >= 2)


@register(
    "q92_udtf_tokenize",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) - 1 AS INTEGER) AS pos,
           unnest(toks) AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents
          WHERE doc_id < 50 AND length(text) > 0)
    """,
    doc="Python UDTF (table function) in a LATERAL join: positional "
    "tokenizer over documents — the row-to-many-rows UDF surface "
    "(complements scalar, pandas, grouped-map, mapInPandas, mapInArrow). "
    "Guarded to non-empty text: Python ''.split(' ') yields [''] while "
    "DuckDB string_split('', ' ') yields [].",
)
def q92_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # useArrow: batches cross the JVM<->Python boundary as Arrow instead
    # of pickled rows (guide §4.3; eval is still per-row — §4.1). Safe
    # here: return values match the declared types exactly (int, str).
    @udtf(returnType="pos int, token string", useArrow=True)
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("q92_tokenize", Tokenize)
    load(spark, sf_dir, "documents").createOrReplaceTempView("q92_docs")
    # Both predicates reference only input-side columns, but Catalyst
    # will not push a filter through a Python UDTF (r17 plan capture:
    # Filter sat ABOVE BatchEvalPythonUDTF, zero PushedFilters), so an
    # unfiltered corpus crossed the Python boundary and the filter then
    # kept 50 docs. Filtering in the subquery is semantics-identical
    # (LATERAL over a filtered relation) and makes the boundary O(50)
    # instead of O(corpus) — guide §4.2/§6 scan-side filtering.
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM (SELECT doc_id, text FROM q92_docs
              WHERE doc_id < 50 AND length(text) > 0) d,
             LATERAL q92_tokenize(d.text) t
        """
    )
