#!/usr/bin/env python
"""Generate the committed BVGraph fixtures (FIXTURES.md §B): a seeded
power-law + locality-biased adjacency (exercises interval, reference and
residual coding paths), encoded with our BVGraph encoder, plus the same
adjacency as parquet for the DuckDB oracle side.

Deterministic (seed fixed); outputs are committed, so this runs once.
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoopwebgraph_spark.bvgraph.codec import BVGraphFiles, encode_graph

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gen_adjacency(n: int, seed: int, avg_deg: float = 8.0) -> list[list[int]]:
    rng = random.Random(seed)
    adj: list[list[int]] = []
    for x in range(n):
        d = min(int(rng.paretovariate(1.35) * avg_deg / 3.8), 400)
        s: set[int] = set()
        # locality: consecutive runs near x (interval coding) + copies of
        # the previous node's list (reference coding) + random residuals
        if d >= 6 and rng.random() < 0.5:
            start = max(0, min(n - d, x + rng.randint(-8, 8)))
            run = rng.randint(4, min(d, 12))
            s.update(range(start, start + run))
        if x > 0 and adj[x - 1] and rng.random() < 0.4:
            prev = adj[x - 1]
            s.update(rng.sample(prev, k=max(1, len(prev) // 2)))
        while len(s) < d:
            if rng.random() < 0.6:
                s.add(min(n - 1, max(0, x + rng.randint(-50, 50))))
            else:
                s.add(rng.randrange(n))
        adj.append(sorted(s))
    return adj


def write_fixture(name: str, n: int, seed: int) -> None:
    adj = gen_adjacency(n, seed)
    g, o, p = encode_graph(adj)
    base = os.path.join(REPO, "fixtures", "bvgraph", name)
    os.makedirs(os.path.dirname(base), exist_ok=True)
    BVGraphFiles(base).write(g, o, p)

    src = pa.array(range(n), type=pa.int32())
    adj_arr = pa.array(adj, type=pa.list_(pa.int32()))
    table = pa.table({"src": src, "adj": adj_arr})
    pq.write_table(table, os.path.join(REPO, "fixtures", f"{name}_adj.parquet"))
    bits_per_arc = len(g) * 8 / max(1, p.arcs)
    print(f"{name}: n={n} arcs={p.arcs} graph={len(g)}B ({bits_per_arc:.2f} bits/arc)")


if __name__ == "__main__":
    write_fixture("small", n=2000, seed=42)
    write_fixture("bench", n=100_000, seed=1337)
