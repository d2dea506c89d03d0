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


# DuckDB-side expression equivalent to events.ts after load(). Works for
# either physical encoding of the parquet column (TIMESTAMP(NANOS) or
# TIMESTAMP(MICROS)): epoch_ns gives nanos either way, and truncating to
# whole microseconds is an identity on micros data.
ORACLE_EVENT_TS = "make_timestamp(epoch_ns(ts) // 1000)"

# Canonical events schema (current testdata encoding: TIMESTAMP(MICROS)
# read as timestamp_ntz). Used as the streaming-source fallback when the
# watched directory is empty at stream start — a batch footer read can't
# infer a schema from zero files, but a stream legitimately starts before
# its first file arrives.
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Queries may run on a caller-provided session (the driver's harness);
    pin the two confs our oracle-exact semantics depend on. Both are
    runtime-settable."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a session-tz TimestampType at whole-microsecond
    precision regardless of how the file physically encodes it.

    The testdata has shipped two encodings across rounds: TIMESTAMP(NANOS)
    (read as raw nano longs under spark.sql.legacy.parquet.nanosAsLong) and
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). A real engine reads the type
    it is given, so branch on the loaded dtype instead of assuming one.
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # raw nanos -> truncate to whole microseconds (matches the DuckDB
        # oracle's epoch_ns(ts) // 1000).
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dtype == "timestamp_ntz":
        # already micros; cast NTZ -> session-tz timestamp (identity on the
        # underlying micros value with the UTC session tz we pin).
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df  # already TimestampType


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-flavored queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
