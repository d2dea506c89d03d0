"""Skew-handling utilities for hot keys at 100 TB.

Spark's partial (map-side) aggregation already collapses most skew for
algebraic aggregates, and AQE splits skewed join partitions. The two
cases those don't cover:

1. **Exact count-distinct under a hot key**: the expand+shuffle routes
   every distinct (key, value) pair of the hot key to one reducer.
   ``salted_count_distinct`` shards by hash(value) so each reducer sees a
   disjoint slice of the value space — exact, and the hot key's work
   spreads over ``n_salts`` reducers.
2. **Hot-key joins where AQE is unavailable** (e.g., streaming):
   ``salted_join`` replicates the small side per salt and salts the big
   side's key, spreading one hot key over ``n_salts`` partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value), skew-resistant.

    Salting by ``hash(value) % n_salts`` keeps each salt's distinct set
    disjoint, so per-salt exact distinct counts SUM to the true count —
    no overlap correction needed. Returns DataFrame[key, n_distinct]."""
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(key, value, salt)
        .groupBy(key, "_salt")
        .agg(F.countDistinct(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n_distinct"))


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Inner equi-join resilient to hot keys on the big side: the big side
    gets a random-but-deterministic salt, the small side is replicated
    once per salt, and the join key becomes (key, salt)."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated_small, [key, "_salt"]).drop("_salt")
