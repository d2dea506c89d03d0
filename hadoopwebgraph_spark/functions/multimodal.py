"""Multimodal column plumbing — SURVEY.md §2 Tier C.

Media (image/audio/video) is modeled as opaque ``binary`` payloads with a
typed metadata struct; decode / feature-extraction run as Arrow-batched
Pandas UDFs over ``mapInPandas``. The container has no media codecs, so
the decode step is STUBBED: ``decode_image`` raises NotImplementedError
unless a known magic prefix maps to the deterministic fake decoder used
in tests. Everything Spark-side — schema, binary handling, batch
iteration, UDF signatures — is real and oracle-checked where the value is
engine-portable (payload lengths, header bytes).

Scale: binary payloads ride in parquet/Arrow pages untouched until the
mapInPandas stage; per-batch processing keeps peak memory to one Arrow
batch per core, and column pruning drops payloads for metadata-only
queries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register

FAKE_MAGIC = b"FAKEIMG0"


def decode_image(payload: bytes) -> tuple[int, int]:
    """STUB image decode -> (width, height).

    Real deployments plug a codec (Pillow/ffmpeg) in here; the container
    has none, so only the deterministic fake format is supported.
    """
    if payload[:8] == FAKE_MAGIC:
        return (
            int.from_bytes(payload[8:10], "big"),
            int.from_bytes(payload[10:12], "big"),
        )
    raise NotImplementedError(
        "no media codecs in this environment; payload is not FAKEIMG0"
    )


def media_table(docs: DataFrame) -> DataFrame:
    """documents -> synthetic media table: binary payload (utf-8 text
    bytes behind a FAKEIMG0 header with deterministic dims) + metadata
    struct. Stands in for a real (path, bytes, metadata) ingest."""
    w = (F.length("text") % 640 + 1).cast("int")
    h = (F.length("text") % 480 + 1).cast("int")
    header = F.concat(
        F.lit(FAKE_MAGIC),
        F.unhex(F.lpad(F.hex(w), 4, "0")),
        F.unhex(F.lpad(F.hex(h), 4, "0")),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, F.encode("text", "utf-8")).alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.lit("image/fake").alias("mime"),
            F.col("n_chars").alias("raw_len"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column: decode the
    (fake) header per batch in pandas, emit typed features."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            widths, heights = [], []
            for b in payloads:
                wd, ht = decode_image(bytes(b))
                widths.append(wd)
                heights.append(ht)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "n_bytes": payloads.map(len).astype("int64"),
                }
            )

    return media.mapInPandas(
        per_batch, "media_id long, width int, height int, n_bytes long"
    )


@register(
    "q90_multimodal_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) + 12 AS BIGINT) AS n_bytes,
           CAST(length(text) % 640 + 1 AS INTEGER)         AS width,
           CAST(length(text) % 480 + 1 AS INTEGER)         AS height,
           source                                          AS origin
    FROM documents
    """,
    doc="Multimodal metadata pipeline: binary payload construction, typed "
    "metadata struct, and mapInPandas feature extraction (stubbed decode); "
    "the oracle certifies payload sizes and decoded header dims.",
)
def q90_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(load(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.join(
        media.select("media_id", F.col("meta.origin").alias("origin")), "media_id"
    ).select("media_id", "n_bytes", "width", "height", "origin")
