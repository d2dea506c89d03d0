"""Degenerate inputs through the full Spark path: empty graphs, all-empty
adjacency, single node — mirroring the reference's own degenerate split
handling (WebGraphInputFormat.java:92-95)."""

from __future__ import annotations

from hadoopwebgraph_spark.bvgraph.codec import BVGraphFiles, encode_graph
from hadoopwebgraph_spark.bvgraph.datasource import read_bvgraph


def _write(tmp_path, name, adj):
    g, o, p = encode_graph(adj)
    base = str(tmp_path / name)
    BVGraphFiles(base).write(g, o, p)
    return base


def test_empty_graph(spark, tmp_path):
    base = _write(tmp_path, "empty", [])
    df = read_bvgraph(spark, base, num_splits=10)
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<src:int,adj:array<int>>"


def test_all_isolated_nodes(spark, tmp_path):
    base = _write(tmp_path, "isolated", [[] for _ in range(10)])
    rows = read_bvgraph(spark, base, num_splits=3).orderBy("src").collect()
    assert [r.src for r in rows] == list(range(10))
    assert all(list(r.adj) == [] for r in rows)


def test_single_node_self_loop(spark, tmp_path):
    base = _write(tmp_path, "one", [[0]])
    rows = read_bvgraph(spark, base, num_splits=5).collect()
    assert len(rows) == 1 and rows[0].src == 0 and list(rows[0].adj) == [0]


def test_file_uri_access(spark, tmp_path):
    """URI-based access path (pyarrow.fs): same source code serves
    file:// locally and s3://, gs://, hdfs:// in production."""
    base = _write(tmp_path, "uri", [[1], [0], []])
    rows = read_bvgraph(spark, "file://" + base, num_splits=2).orderBy("src").collect()
    assert [(r.src, list(r.adj)) for r in rows] == [(0, [1]), (1, [0]), (2, [])]
