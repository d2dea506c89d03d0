"""Source/sink breadth: CSV and JSON round-trips with explicit schemas
(never inferSchema in production paths), and an exactly-once-style
foreachBatch streaming sink."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from hadoopwebgraph_spark.catalog import load


def test_csv_roundtrip(spark, sf_small, tmp_path):
    out = str(tmp_path / "nation_csv")
    n = load(spark, sf_small, "nation")
    n.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", True)
        .csv(out)
    )
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in n.collect()
    )


def test_json_roundtrip(spark, sf_small, tmp_path):
    out = str(tmp_path / "region_json")
    r = load(spark, sf_small, "region")
    r.write.mode("overwrite").json(out)
    back = spark.read.schema("r_regionkey int, r_name string").json(out)
    assert {x.r_name for x in back.collect()} == {x.r_name for x in r.collect()}


def test_foreachbatch_parquet_sink(spark, sf_small, tmp_path):
    """Streaming -> foreachBatch -> partitioned parquet: the exactly-once
    pattern for arbitrary sinks (batch id available for idempotence)."""
    from hadoopwebgraph_spark.streaming import streams

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(f"{sf_small}/events.parquet", src / "p0.parquet")
    out = str(tmp_path / "out")

    ev = streams.stream_events(spark, str(src))
    agg = (
        ev.withWatermark("ts", "24 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
    )

    def write_batch(batch_df, batch_id: int):
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    result = spark.read.parquet(out)
    batch = (
        load(spark, sf_small, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )
    assert result.count() == batch


def test_partitioned_layout_prunes_partitions(spark, sf_small, tmp_path):
    """Hive-partitioned writes must yield plan-time partition pruning:
    a filter on the partition column appears as PartitionFilters in the
    scan and non-matching directories are never read."""
    from pyspark.sql import functions as F

    from hadoopwebgraph_spark.catalog import load

    out = str(tmp_path / "li_part")
    li = load(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)

    df = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    part_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_lines and "l_returnflag" in part_lines[0]
    assert df.count() == li.filter("l_returnflag = 'R'").count()


def test_binaryfile_source_reads_media_payloads(spark, tmp_path):
    """`spark.read.format("binaryFile")` — the ingestion path for real
    media directories (SURVEY §2 Tier C): whole-file binary rows with
    path/length metadata, filterable by glob, content byte-exact."""
    import numpy as np

    from hadoopwebgraph_spark.functions.codecs import gif_encode, png_encode

    rng = np.random.default_rng(9)
    blobs = {}
    for i in range(3):
        img = rng.integers(0, 256, (8, 8)).astype(np.uint8)
        blob = png_encode(img)
        (tmp_path / f"img{i}.png").write_bytes(blob)
        blobs[f"img{i}.png"] = blob
    (tmp_path / "anim.gif").write_bytes(
        gif_encode([rng.integers(0, 256, (8, 8)).astype(np.uint8)])
    )
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(str(tmp_path))
    )
    rows = {r.path.split("/")[-1]: bytes(r.content) for r in df.collect()}
    assert rows == blobs  # glob excluded the gif; bytes exact
    assert {f.name for f in df.schema.fields} == {
        "path",
        "modificationTime",
        "length",
        "content",
    }
