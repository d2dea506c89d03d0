#!/usr/bin/env python
"""Export the ANN index artifacts as committed oracle mirrors
(fixtures/ann/, VERDICT r10 item #3).

For each given sf_dir this builds the IVF / PQ / OPQ / kNN-graph indexes
with the normal train-once builders, then exports the PROBE-relevant
artifacts — centroids, inverted file, codebooks, code tables, the OPQ
pre-rotated query vectors, and the kNN-graph edge list — as single-file
parquet under ``fixtures/ann/<artifact>/ckey=<corpus_key>/``. The corpus
key is a content-derived int64 (see similarity._corpus_key) computable
bit-identically in Spark and DuckDB, so one static oracle SQL string
selects the right mirror for whatever sf the harness runs at.

Deterministic given the driver's seeded testdata; outputs are committed,
so this runs once per corpus (re-run only if testdata content changes —
a changed ckey simply adds a new partition and orphans the old one).

Usage: python scripts/export_ann_mirror.py /root/testdata/sf0.001 [...]
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from hadoopwebgraph_spark.functions import similarity as S  # noqa: E402


def _write(sub: str, ckey: int, table: pa.Table) -> None:
    d = os.path.join(S.ANN_MIRROR_ROOT, sub, f"ckey={ckey}")
    os.makedirs(d, exist_ok=True)
    for f in glob.glob(os.path.join(d, "*.parquet")):
        os.remove(f)
    papq.write_table(table, os.path.join(d, "data.parquet"))
    print(f"  {sub}/ckey={ckey}: {table.num_rows} rows")


def _read_sorted(path_glob: str, order: list[str], cols: list[str]) -> pa.Table:
    import duckdb

    return duckdb.sql(
        f"SELECT {', '.join(cols)} FROM read_parquet('{path_glob}', "
        f"hive_partitioning = 1) ORDER BY {', '.join(order)}"
    ).arrow()


def export(spark: SparkSession, sf_dir: str) -> None:
    e = S.load(spark, sf_dir, "embeddings")
    ck = S._corpus_key(e)
    print(f"{sf_dir}: corpus_key={ck}")

    ivf = S.build_ivf_index(spark, sf_dir)
    cent = S._read_model(ivf)["centroids"]
    _write(
        "ivf_centroids",
        ck,
        pa.table(
            {
                "cid": pa.array([int(c) for c, _ in cent], pa.int32()),
                "cvec": pa.array(
                    [[float(x) for x in v] for _, v in cent],
                    pa.list_(pa.float64()),
                ),
            }
        ),
    )
    _write(
        "ivf_invfile",
        ck,
        _read_sorted(
            os.path.join(ivf, "invfile", "*", "*.parquet"),
            ["vec_id"],
            ["vec_id", "CAST(cid AS INTEGER) AS cid"],
        ),
    )

    for kind, build in (("pq", S.build_pq_index), ("opq", S.build_opq_index)):
        path = build(spark, sf_dir)
        model = S._read_model(path)
        cb = model["codebooks"]
        _write(
            f"{kind}_codebooks",
            ck,
            pa.table(
                {
                    "sub": pa.array([int(s) for s, _, _ in cb], pa.int32()),
                    "code": pa.array([int(c) for _, c, _ in cb], pa.int32()),
                    "cvec": pa.array(
                        [[float(x) for x in v] for _, _, v in cb],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
        )
        _write(
            f"{kind}_codes",
            ck,
            _read_sorted(
                os.path.join(path, "codes", "*.parquet"),
                ["vec_id", "sub"],
                ["vec_id", "CAST(sub AS INTEGER) AS sub",
                 "CAST(code AS INTEGER) AS code"],
            ),
        )
        if kind == "opq":
            R = np.asarray(model["rotation"], dtype=np.float64)
            qrows = sorted(
                e.filter(f"vec_id < {S.N_QUERIES}")
                .select("vec_id", "embedding")
                .collect(),
                key=lambda r: r.vec_id,
            )
            V = np.array([r.embedding for r in qrows], dtype=np.float64) @ R
            _write(
                "opq_rotq",
                ck,
                pa.table(
                    {
                        "query_id": pa.array(
                            [int(r.vec_id) for r in qrows], pa.int64()
                        ),
                        "qv": pa.array(
                            [list(map(float, row)) for row in V],
                            pa.list_(pa.float64()),
                        ),
                    }
                ),
            )

    knng = S.build_knn_graph_index(spark, sf_dir)
    _write(
        "knng_edges",
        ck,
        _read_sorted(
            os.path.join(knng, "edges", "*.parquet"),
            ["src", "dst"],
            ["src", "dst"],
        ),
    )
    update_manifest(spark, sf_dir)


def update_manifest(spark: SparkSession, sf_dir: str) -> None:
    """Record the corpus's ckey AND its strong content fingerprint
    (rows + full-vector xxhash64 sum, see similarity._corpus_fingerprint)
    in MANIFEST.json; probes assert the fingerprint before serving a
    mirror (ADVICE r11: the ckey alone is a weak locator — count plus a
    first-coordinate sum — and both engines read the same mirror, so a
    ckey collision with stale artifacts would be oracle-invisible)."""
    e = S.load(spark, sf_dir, "embeddings")
    ck = S._corpus_key(e)
    rows, xxh = S._corpus_fingerprint(e)
    manifest = os.path.join(S.ANN_MIRROR_ROOT, "MANIFEST.json")
    entry = {
        "sf_dir": os.path.realpath(sf_dir),
        "ckey": ck,
        "rows": rows,
        "xxh": xxh,
    }
    entries = []
    if os.path.exists(manifest):
        with open(manifest) as f:
            entries = [x for x in json.load(f) if x["ckey"] != ck]
    entries.append(entry)
    with open(manifest, "w") as f:
        json.dump(sorted(entries, key=lambda x: x["ckey"]), f, indent=1)
    print(f"  MANIFEST ckey={ck}: rows={rows} xxh={xxh}")


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    args = sys.argv[1:]
    manifest_only = "--manifest-only" in args
    for sf_dir in (a for a in args if not a.startswith("--")):
        if manifest_only:
            # refresh the fingerprint record for already-committed
            # artifacts without retraining anything
            update_manifest(spark, sf_dir)
        else:
            export(spark, sf_dir)


if __name__ == "__main__":
    main()
