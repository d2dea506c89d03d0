"""Run every registered SQL-expressible query against the DuckDB oracle at
sf0.001 (fast) — the local mirror of the driver's t2 gate."""

from __future__ import annotations

import pytest

from hadoopwebgraph_spark.registry import all_queries

from .oracle_util import compare

_QUERIES = all_queries()
_SQL_BACKED = sorted(n for n, q in _QUERIES.items() if q.oracle is not None)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", _SQL_BACKED)
def test_oracle_parity(spark, sf_small, name):
    q = _QUERIES[name]
    compare(spark, sf_small, name, q.fn, q.oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only(spark, sf_small, name):
    q = _QUERIES[name]
    df = q.fn(spark, sf_small)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
