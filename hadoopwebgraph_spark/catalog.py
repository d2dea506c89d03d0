"""Table loading for the driver's synthetic star schema (TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst performs column
pruning + predicate pushdown into the scan; at 100 TB these tables would be
partitioned/bucketed parquet on object storage and the same code applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# DuckDB-side expression equivalent to events.ts after load(): the parquet
# column is TIMESTAMP(NANOS); both engines are normalized to microseconds.
ORACLE_EVENT_TS = "make_timestamp(epoch_ns(ts) // 1000)"


def _ensure_session_confs(spark: SparkSession) -> None:
    """Queries may run on a caller-provided session (the driver's harness);
    pin the two confs our oracle-exact semantics depend on. Both are
    runtime-settable."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives as raw nanos (spark.sql.legacy.parquet.nanosAsLong);
        # truncate to whole microseconds so Spark and DuckDB agree exactly.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-flavored queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
