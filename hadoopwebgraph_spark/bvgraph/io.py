"""File access for the BVGraph triple — the engine's counterpart of the
reference's seekable HDFS adapter (HdfsRepositionableStream.java:9-70).

Plain paths use local ``open``; URIs (``file://``, ``s3://``, ``gs://``,
``hdfs://``) route through ``pyarrow.fs.FileSystem.from_uri``, so the
same DataSource reads object storage unchanged. Unlike the reference's
unbuffered graph streams (HdfsBVGraph.java:46,217,389 — a known perf
hazard), we read each partition's byte range in one request and decode
from memory."""

from __future__ import annotations


def read_bytes(path: str) -> bytes:
    """Read a whole file, local path or filesystem URI."""
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, fs_path = pafs.FileSystem.from_uri(path)
        with filesystem.open_input_stream(fs_path) as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def read_text(path: str) -> str:
    return read_bytes(path).decode("utf-8")
