"""Local replica of the driver's t2 oracle loop: run a registered query on
Spark AND its DuckDB oracle SQL, then compare row count, column names and
(order-insensitively) values. Stricter than the driver in one way: floats
compare exactly — any ULP drift shows up here first, prompting rounding in
the query itself rather than test-side tolerance."""

from __future__ import annotations

import math

import duckdb

from hadoopwebgraph_spark.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and integral floats
        if v == 0.0:
            return 0.0
        return v
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_norm_cell(row[i]) for i in order))
    return sorted(out, key=repr)


_TYPE_CLASS = {
    # spark simpleString / duckdb type id -> comparable class
    "tinyint": "int", "smallint": "int", "int": "int", "integer": "int",
    "bigint": "int", "hugeint": "int",
    "float": "float", "double": "float", "real": "float",
    "string": "str", "varchar": "str",
    "boolean": "bool",
    "timestamp": "ts", "timestamp_ns": "ts", "timestamp_ntz": "ts",
    "timestamp with time zone": "ts",
    "date": "date",
}


def _type_class(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "float"
    return _TYPE_CLASS.get(t, t)


def compare(spark, sf_dir: str, name: str, query_fn, sql: str) -> None:
    sdf = query_fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = [c.lower() for c in sdf.columns]
    s_types = {
        c.lower(): _type_class(f.dataType.simpleString()) for c, f in
        zip(sdf.columns, sdf.schema.fields)
    }

    con = duck_con(sf_dir)
    d_res = con.sql(sql)
    d_cols = [c.lower() for c in d_res.columns]
    d_types = {
        c.lower(): _type_class(str(t)) for c, t in zip(d_res.columns, d_res.types)
    }
    d_rows = d_res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    type_mismatch = {
        c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types[c]
    }
    assert not type_mismatch, f"{name}: dtype class mismatch {type_mismatch}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"
