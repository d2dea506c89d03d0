"""Multimodal column plumbing — SURVEY.md §2 Tier C.

Media (image/audio/video) is modeled as opaque ``binary`` payloads with a
typed metadata struct; decode / feature-extraction run as Arrow-batched
Pandas UDFs over ``mapInPandas``. PNG, baseline JPEG and PCM16 WAV
decode are REAL (pure-stdlib/numpy codecs in functions/codecs.py,
oracle-certified pixel/sample features in q93/q94/q97); formats that
need external codecs (MP3, video containers, progressive/subsampled
JPEG) raise NotImplementedError at the leaf decode function — real
deployments swap in Pillow/ffmpeg there while all Spark-side plumbing
(schemas, binary handling, batch iteration, UDF signatures) is shared
and tested here.

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
    """Image decode -> (width, height).

    PNG and baseline JPEG are decoded for real (pure-stdlib codecs,
    functions/codecs.py); the deterministic FAKEIMG0 header remains for
    format-agnostic plumbing tests. Other formats need an external
    codec — real deployments plug Pillow/ffmpeg into this leaf function.
    """
    from .codecs import JPEG_SOI, PNG_MAGIC, jpeg_dims, png_dims

    if payload[:8] == FAKE_MAGIC:
        return (
            int.from_bytes(payload[8:10], "big"),
            int.from_bytes(payload[10:12], "big"),
        )
    if payload[:8] == PNG_MAGIC:
        return png_dims(payload)
    if payload[:2] == JPEG_SOI:
        return jpeg_dims(payload)
    raise NotImplementedError(
        "unsupported image format (PNG + baseline JPEG + FAKEIMG0 available "
        "here; plug an external codec for others)"
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


# ---------------------------------------------------------------------------
# Real-codec pipelines: PNG pixels and WAV audio, pure-stdlib codecs
# (functions/codecs.py). The payloads are synthesized deterministically
# from doc_id, so the DuckDB oracle can state the expected features in
# closed form — a hash match certifies encode -> decode -> featurize
# end-to-end, not just metadata plumbing.
# ---------------------------------------------------------------------------

IMG_SIDE = 16  # synthetic image is IMG_SIDE x IMG_SIDE grey
N_MEDIA_DOCS = 200
WAV_RATE = 8000


def png_media_table(docs: DataFrame) -> DataFrame:
    """Per-doc deterministic greyscale PNG: pixel(y,x) =
    (doc_id*31 + y*IMG_SIDE + x) % 256, PNG-encoded in an Arrow-batched
    stage."""
    import numpy as np

    from .codecs import png_encode

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(IMG_SIDE * IMG_SIDE, dtype=np.int64).reshape(
            IMG_SIDE, IMG_SIDE
        )
        for pdf in batches:
            payloads = [
                png_encode(((int(did) * 31 + base) % 256).astype(np.uint8))
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.filter(F.col("doc_id") < N_MEDIA_DOCS).select("doc_id").mapInPandas(
        encode_batch, "media_id long, payload binary"
    )


def png_features(media: DataFrame) -> DataFrame:
    """Decode PNG payloads and emit (width, height, mean pixel value)."""
    import numpy as np

    from .codecs import png_decode

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, means = [], [], []
            for b in pdf["payload"]:
                img = png_decode(bytes(b))
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                means.append(round(float(np.mean(img.astype(np.float64))), 4))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "mean_px": means,
                }
            )

    return media.mapInPandas(
        decode_batch, "media_id long, width int, height int, mean_px double"
    )


@register(
    "q93_image_decode",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST({IMG_SIDE} AS INTEGER) AS width,
           CAST({IMG_SIDE} AS INTEGER) AS height,
           round(avg(CAST((d.doc_id * 31 + y.i * {IMG_SIDE} + x.i) % 256
                          AS DOUBLE)), 4) AS mean_px
    FROM (SELECT doc_id FROM documents WHERE doc_id < {N_MEDIA_DOCS}) d
    CROSS JOIN (SELECT unnest(range({IMG_SIDE})) AS i) y
    CROSS JOIN (SELECT unnest(range({IMG_SIDE})) AS i) x
    GROUP BY d.doc_id
    """,
    doc="REAL image decode pipeline: deterministic greyscale images are "
    "PNG-encoded and decoded with the pure-stdlib codec inside "
    "mapInPandas stages; the oracle states each image's mean pixel in "
    "closed form, so the hash certifies the full encode->decode path.",
)
def q93_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = png_media_table(load(spark, sf_dir, "documents"))
    return png_features(media)


def jpeg_media_table(docs: DataFrame) -> DataFrame:
    """Per-doc deterministic greyscale JPEG: a 16x16 image of four
    constant 8x8 blocks with block k's value = (doc_id*31 + k*67) % 256.
    Constant blocks have an exactly-representable DC and zero ACs, so the
    all-ones-quant baseline encode -> decode roundtrip is bit-exact and
    the oracle can state the decoded pixels in closed form."""
    import numpy as np

    from .codecs import jpeg_encode_gray

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                img = np.empty((16, 16), dtype=np.uint8)
                for k, (y, x) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
                    img[y : y + 8, x : x + 8] = (did * 31 + k * 67) % 256
                payloads.append(jpeg_encode_gray(img))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.filter(F.col("doc_id") < N_MEDIA_DOCS).select("doc_id").mapInPandas(
        encode_batch, "media_id long, payload binary"
    )


def jpeg_features(media: DataFrame) -> DataFrame:
    """Decode JPEG payloads and emit (width, height, mean pixel value)."""
    import numpy as np

    from .codecs import jpeg_decode

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, means = [], [], []
            for b in pdf["payload"]:
                img = jpeg_decode(bytes(b))
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                means.append(round(float(np.mean(img.astype(np.float64))), 4))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "mean_px": means,
                }
            )

    return media.mapInPandas(
        decode_batch, "media_id long, width int, height int, mean_px double"
    )


@register(
    "q97_jpeg_decode",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           round(avg(CAST((d.doc_id * 31 + k.i * 67) % 256 AS DOUBLE)), 4)
               AS mean_px
    FROM (SELECT doc_id FROM documents WHERE doc_id < {N_MEDIA_DOCS}) d
    CROSS JOIN (SELECT unnest(range(4)) AS i) k
    GROUP BY d.doc_id
    """,
    doc="REAL JPEG decode pipeline: baseline JFIF images (numpy DCT + "
    "Annex-K Huffman entropy coding, functions/codecs.py) are encoded and "
    "decoded inside mapInPandas stages. The images are constant per 8x8 "
    "block, so the lossy format roundtrips bit-exactly and the oracle "
    "states each image's mean pixel in closed form — the hash certifies "
    "the full Huffman+DCT encode -> decode path, not just metadata.",
)
def q97_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = jpeg_media_table(load(spark, sf_dir, "documents"))
    return jpeg_features(media)


def wav_media_table(docs: DataFrame) -> DataFrame:
    """Per-doc deterministic PCM16 WAV: n = 64 + doc_id % 32 samples of
    s[i] = (doc_id*7 + i*13) % 2048 - 1024 at {WAV_RATE} Hz."""
    import numpy as np

    from .codecs import wav_encode

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 64 + did % 32
                i = np.arange(n, dtype=np.int64)
                samples = ((did * 7 + i * 13) % 2048 - 1024).astype(np.int16)
                payloads.append(wav_encode(samples, WAV_RATE))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.filter(F.col("doc_id") < N_MEDIA_DOCS).select("doc_id").mapInPandas(
        encode_batch, "media_id long, payload binary"
    )


def wav_features(media: DataFrame) -> DataFrame:
    """Decode WAV payloads: sample count, rate, exact duration, energy."""
    import numpy as np

    from .codecs import wav_decode

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, rates, durs, energies = [], [], [], []
            for b in pdf["payload"]:
                rate, _ch, samples = wav_decode(bytes(b))
                n = len(samples)
                ns.append(n)
                rates.append(rate)
                durs.append(n * 1_000_000 // rate)
                energies.append(int(np.sum(samples.astype(np.int64) ** 2)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "duration_us": pd.Series(durs, dtype="int64"),
                    "sum_sq": pd.Series(energies, dtype="int64"),
                }
            )

    return media.mapInPandas(
        decode_batch,
        "media_id long, n_samples long, sample_rate int, duration_us long, "
        "sum_sq long",
    )


@register(
    "q94_audio_decode",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST(64 + d.doc_id % 32 AS BIGINT) AS n_samples,
           CAST({WAV_RATE} AS INTEGER) AS sample_rate,
           CAST((64 + d.doc_id % 32) * 1000000 // {WAV_RATE} AS BIGINT)
               AS duration_us,
           CAST(SUM(((d.doc_id * 7 + s.i * 13) % 2048 - 1024)
                    * ((d.doc_id * 7 + s.i * 13) % 2048 - 1024)) AS BIGINT)
               AS sum_sq
    FROM (SELECT doc_id FROM documents WHERE doc_id < {N_MEDIA_DOCS}) d
    JOIN (SELECT unnest(range(96)) AS i) s ON s.i < 64 + d.doc_id % 32
    GROUP BY d.doc_id
    """,
    doc="REAL audio decode pipeline: deterministic PCM16 WAVs are written "
    "and read back with the stdlib wave codec inside mapInPandas stages; "
    "the oracle states sample counts, exact microsecond durations, and "
    "integer energy (sum of squares) in closed form.",
)
def q94_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = wav_media_table(load(spark, sf_dir, "documents"))
    return wav_features(media)


# ---------------------------------------------------------------------------
# Resize + video frame sampling — the remaining multimodal verbs of the
# training-data pipeline. Resize is a real nearest-neighbor kernel over
# the decoded pixel array, re-encoded and re-decoded through the PNG
# codec so the hash certifies decode -> resize -> encode -> decode.
# Video is modeled as a FAKEVID0 container of length-prefixed PNG frames
# (real containers need ffmpeg — same stub policy as JPEG/MP3); frame
# sampling parses the container and decodes only every `stride`-th
# frame, never the skipped ones.
# ---------------------------------------------------------------------------

RESIZE_TO = 8  # q95 downsamples IMG_SIDE x IMG_SIDE -> RESIZE_TO x RESIZE_TO
FAKEVID_MAGIC = b"FAKEVID0"
VID_FRAME_STRIDE = 2


def resize_nearest(img, out_h: int, out_w: int):
    """Nearest-neighbor resize of a 2-D uint8 array (pure NumPy index
    map — the same gather a real image library performs)."""
    import numpy as np

    in_h, in_w = img.shape
    ys = (np.arange(out_h) * in_h) // out_h
    xs = (np.arange(out_w) * in_w) // out_w
    return img[np.ix_(ys, xs)]


def png_resize(media: DataFrame, out_h: int = RESIZE_TO, out_w: int = RESIZE_TO) -> DataFrame:
    """Arrow-batched resize stage: PNG decode -> nearest-neighbor resize
    -> PNG re-encode. Emits (media_id, payload) of resized images."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import png_decode, png_encode

        for pdf in batches:
            payloads = [
                png_encode(resize_nearest(png_decode(bytes(b)), out_h, out_w))
                for b in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    return media.mapInPandas(per_batch, "media_id long, payload binary")


@register(
    "q95_image_resize",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST({RESIZE_TO} AS INTEGER) AS width,
           CAST({RESIZE_TO} AS INTEGER) AS height,
           round(avg(CAST((d.doc_id * 31
                           + (y.i * {IMG_SIDE} // {RESIZE_TO}) * {IMG_SIDE}
                           + (x.i * {IMG_SIDE} // {RESIZE_TO})) % 256
                          AS DOUBLE)), 4) AS mean_px
    FROM (SELECT doc_id FROM documents WHERE doc_id < {N_MEDIA_DOCS}) d
    CROSS JOIN (SELECT unnest(range({RESIZE_TO})) AS i) y
    CROSS JOIN (SELECT unnest(range({RESIZE_TO})) AS i) x
    GROUP BY d.doc_id
    """,
    doc="REAL image resize pipeline: decode PNG, nearest-neighbor resize "
    f"{IMG_SIDE}x{IMG_SIDE} -> {RESIZE_TO}x{RESIZE_TO}, re-encode PNG, "
    "decode again for features — the oracle states each resized image's "
    "mean pixel in closed form (the sampled source pixels), so the hash "
    "certifies the full decode->resize->encode->decode chain.",
)
def q95_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = png_media_table(load(spark, sf_dir, "documents"))
    return png_features(png_resize(media))


def video_media_table(docs: DataFrame) -> DataFrame:
    """Per-doc deterministic 'video': FAKEVID0 container of n_frames =
    3 + doc_id % 5 length-prefixed PNG frames; frame f's pixel(y,x) =
    (doc_id*31 + f*7 + y*IMG_SIDE + x) % 256."""
    import numpy as np

    from .codecs import png_encode

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(IMG_SIDE * IMG_SIDE, dtype=np.int64).reshape(
            IMG_SIDE, IMG_SIDE
        )
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n_frames = 3 + did % 5
                parts = [FAKEVID_MAGIC, n_frames.to_bytes(2, "big")]
                for f in range(n_frames):
                    frame = png_encode(((did * 31 + f * 7 + base) % 256).astype(np.uint8))
                    parts.append(len(frame).to_bytes(4, "big"))
                    parts.append(frame)
                payloads.append(b"".join(parts))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.filter(F.col("doc_id") < N_MEDIA_DOCS).select("doc_id").mapInPandas(
        encode_batch, "media_id long, payload binary"
    )


def _fakevid_sample(blob: bytes, stride: int) -> list[tuple[int, bytes]]:
    """FAKEVID0 demux: seek over skipped frames by length prefix."""
    n_frames = int.from_bytes(blob[8:10], "big")
    pos, out = 10, []
    for f in range(n_frames):
        flen = int.from_bytes(blob[pos : pos + 4], "big")
        pos += 4
        if f % stride == 0:
            out.append((f, blob[pos : pos + flen]))
        pos += flen
    return out


def sample_frames(media: DataFrame, stride: int = VID_FRAME_STRIDE) -> DataFrame:
    """Frame-sampling stage: parse the container (FAKEVID0 or real
    ISO-BMFF mp4 — see functions/isobmff.py), decode ONLY every
    `stride`-th frame (skipped frames are seeked over, exactly like
    keyframe sampling in a real demuxer), emit one row per sampled
    frame."""
    import numpy as np

    from .codecs import png_decode

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media_ids, frame_idxs, means = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                blob = bytes(b)
                if blob[:8] == FAKEVID_MAGIC:
                    sampled = _fakevid_sample(blob, stride)
                elif blob[4:8] == b"ftyp":
                    # REAL ISO-BMFF (mp4): per-sample byte ranges resolved
                    # from the genuine stts/stsc/stsz/stco tables; only the
                    # sampled frames' bytes are touched (isobmff.py)
                    from .isobmff import sample_frames as mp4_sample

                    sampled = mp4_sample(blob, stride)
                else:
                    raise NotImplementedError(
                        "unsupported video container (FAKEVID0 and ISO-BMFF "
                        "mp4 demux available here; codec payloads beyond "
                        "PNG frames need ffmpeg)"
                    )
                for f, frame_bytes in sampled:
                    img = png_decode(frame_bytes)
                    media_ids.append(int(mid))
                    frame_idxs.append(f)
                    means.append(round(float(np.mean(img.astype(np.float64))), 4))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(media_ids, dtype="int64"),
                    "frame_idx": pd.Series(frame_idxs, dtype="int32"),
                    "mean_px": means,
                }
            )

    return media.mapInPandas(
        per_batch, "media_id long, frame_idx int, mean_px double"
    )


@register(
    "q96_video_frame_sample",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST(f.frame_idx AS INTEGER) AS frame_idx,
           round(avg(CAST((d.doc_id * 31 + f.frame_idx * 7
                           + y.i * {IMG_SIDE} + x.i) % 256 AS DOUBLE)), 4)
               AS mean_px
    FROM (SELECT doc_id, 3 + doc_id % 5 AS nf FROM documents
          WHERE doc_id < {N_MEDIA_DOCS}) d
    CROSS JOIN (SELECT unnest(range(7)) AS frame_idx) f
    CROSS JOIN (SELECT unnest(range({IMG_SIDE})) AS i) y
    CROSS JOIN (SELECT unnest(range({IMG_SIDE})) AS i) x
    WHERE f.frame_idx < d.nf AND f.frame_idx % {VID_FRAME_STRIDE} = 0
    GROUP BY d.doc_id, f.frame_idx
    """,
    doc="Video frame sampling: FAKEVID0 containers of length-prefixed PNG "
    "frames are demuxed in mapInPandas, every 2nd frame decoded (skipped "
    "frames seeked over by length prefix), one row per sampled frame. "
    "The same stage also demuxes REAL ISO-BMFF (mp4) containers via the "
    "genuine stts/stsc/stsz/stco sample tables (functions/isobmff.py, "
    "unit + Spark-side tested); only codec payloads beyond PNG remain "
    "stubbed. Oracle states each sampled frame's mean pixel in closed "
    "form.",
)
def q96_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = video_media_table(load(spark, sf_dir, "documents"))
    return sample_frames(media)


def gif_media_table(docs: DataFrame) -> DataFrame:
    """Per-doc deterministic animated GIF (a REAL container, unlike
    FAKEVID0): n_frames = 3 + doc_id % 5 greyscale frames, frame f's
    pixel(y,x) = (doc_id*31 + f*7 + y*IMG_SIDE + x) % 256 — the same
    closed form as the FAKEVID frames, so the oracle shape is shared."""
    import numpy as np

    from .codecs import gif_encode

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = np.arange(IMG_SIDE * IMG_SIDE, dtype=np.int64).reshape(
            IMG_SIDE, IMG_SIDE
        )
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                frames = [
                    ((did * 31 + f * 7 + base) % 256).astype(np.uint8)
                    for f in range(3 + did % 5)
                ]
                payloads.append(gif_encode(frames))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.filter(F.col("doc_id") < N_MEDIA_DOCS).select("doc_id").mapInPandas(
        encode_batch, "media_id long, payload binary"
    )


def sample_gif_frames(media: DataFrame, stride: int = VID_FRAME_STRIDE) -> DataFrame:
    """GIF frame sampling: walk image blocks by sub-block length hops
    (no LZW work for skipped frames), LZW-decode only every `stride`-th
    frame, emit one row per sampled frame."""
    import numpy as np

    from .codecs import gif_decode_frame, gif_frame_blocks

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media_ids, frame_idxs, means = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                for f, fw, fh, mcs, lzw, pal in gif_frame_blocks(bytes(b)):
                    if f % stride != 0:
                        continue  # skipped: never decompressed
                    img = gif_decode_frame(fw, fh, mcs, lzw, pal)
                    media_ids.append(int(mid))
                    frame_idxs.append(f)
                    means.append(round(float(np.mean(img.astype(np.float64))), 4))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(media_ids, dtype="int64"),
                    "frame_idx": pd.Series(frame_idxs, dtype="int32"),
                    "mean_px": means,
                }
            )

    return media.mapInPandas(
        per_batch, "media_id long, frame_idx int, mean_px double"
    )


@register(
    "q108_gif_frame_sample",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST(f.frame_idx AS INTEGER) AS frame_idx,
           round(avg(CAST((d.doc_id * 31 + f.frame_idx * 7
                           + y.i * {IMG_SIDE} + x.i) % 256 AS DOUBLE)), 4)
               AS mean_px
    FROM (SELECT doc_id, 3 + doc_id % 5 AS nf FROM documents
          WHERE doc_id < {N_MEDIA_DOCS}) d
    CROSS JOIN (SELECT unnest(range(7)) AS frame_idx) f
    CROSS JOIN (SELECT unnest(range({IMG_SIDE})) AS i) y
    CROSS JOIN (SELECT unnest(range({IMG_SIDE})) AS i) x
    WHERE f.frame_idx < d.nf AND f.frame_idx % {VID_FRAME_STRIDE} = 0
    GROUP BY d.doc_id, f.frame_idx
    """,
    doc="REAL animated-GIF frame sampling: GIF89a containers (real "
    "variable-width LZW — the decoder also reads Tcl/Tk-encoded GIFs "
    "exactly) demuxed by sub-block length hops, every 2nd frame "
    "LZW-decoded, one row per sampled frame; oracle states each sampled "
    "frame's mean pixel in closed form. Upgrades the q96 FAKEVID0 path "
    "to a genuine interchange format.",
)
def q108_gif_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = gif_media_table(load(spark, sf_dir, "documents"))
    return sample_gif_frames(media)


def ulaw_media_table(docs: DataFrame) -> DataFrame:
    """Per-doc deterministic G.711 mu-law WAV (format code 7): n = 100 +
    doc_id % 50 samples of s[i] = (doc_id*7 + i*13) % 64000 - 32000."""
    import numpy as np

    from .codecs import wav_encode_ulaw

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 100 + did % 50
                i = np.arange(n, dtype=np.int64)
                samples = ((did * 7 + i * 13) % 64000 - 32000).astype(np.int16)
                payloads.append(wav_encode_ulaw(samples, WAV_RATE))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.filter(F.col("doc_id") < N_MEDIA_DOCS).select("doc_id").mapInPandas(
        encode_batch, "media_id long, payload binary"
    )


def ulaw_features(media: DataFrame) -> DataFrame:
    """Decode mu-law WAVs and aggregate the reconstructed samples."""
    import numpy as np

    from .codecs import wav_decode_ulaw

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, sums = [], []
            for b in pdf["payload"]:
                _rate, samples = wav_decode_ulaw(bytes(b))
                ns.append(len(samples))
                sums.append(int(np.abs(samples.astype(np.int64)).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sum_abs": pd.Series(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(
        decode_batch, "media_id long, n_samples long, sum_abs long"
    )


# the G.711 companding pipeline in closed form: what decode(encode(x))
# reconstructs, stated entirely in SQL over the synthesis formula
_ULAW_SQL = """
    SELECT d.doc_id, d.i,
           ((((mag >> (ex + 3)) & 15) * 8 + 132) << ex) - 132 AS rec_mag,
           sgn
    FROM (
        SELECT d.doc_id, d.i,
               CASE WHEN raw < 0 THEN -1 ELSE 1 END AS sgn,
               least(abs(raw), 32635) + 132 AS mag
        FROM (
            SELECT d.doc_id, s.i,
                   (d.doc_id * 7 + s.i * 13) % 64000 - 32000 AS raw
            FROM (SELECT doc_id FROM documents WHERE doc_id < {n_docs}) d
            JOIN (SELECT unnest(range(150)) AS i) s
              ON s.i < 100 + d.doc_id % 50
        ) d
    ) d,
    LATERAL (SELECT CAST(least(greatest(floor(log2(mag)) - 7, 0), 7) AS INTEGER) AS ex) e
"""


@register(
    "q114_ulaw_audio_decode",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(sgn * rec_mag)) AS BIGINT) AS sum_abs
    FROM ({_ULAW_SQL.format(n_docs=N_MEDIA_DOCS)})
    GROUP BY doc_id
    """,
    doc="REAL compressed-audio pipeline: G.711 mu-law WAVs (format code "
    "7, hand-rolled RIFF container — stdlib wave is PCM-only) are "
    "companded, written, re-read and expanded by the vectorized codec "
    "inside mapInPandas; the oracle restates the full ITU-T companding "
    "transfer function (bias, segment exponent, mantissa quantization) "
    "in closed-form SQL, so the hash certifies the lossy codec "
    "bit-for-bit.",
)
def q114_ulaw_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = ulaw_media_table(load(spark, sf_dir, "documents"))
    return ulaw_features(media)


# ---------------------------------------------------------------------------
# q133: image perceptual-hash near-dup (multimodal x dedup)
# ---------------------------------------------------------------------------

# Quantized 8-point DCT-II basis, round(1000 * cos((2y+1) u pi / 16)).
# Computed ONCE here in Python and embedded as integer literals in the
# DuckDB oracle, so the whole pHash is exact int64 arithmetic in BOTH
# engines — no cross-engine libm/float-tie risk anywhere (the repo's
# integer-exact oracle discipline; real pHash implementations quantize
# their basis the same way).
import math as _math

PHASH_DCT_Q = [
    [round(1000 * _math.cos((2 * y + 1) * u * _math.pi / 16)) for y in range(8)]
    for u in range(8)
]
PHASH_DELTA = 24  # per-member perturbation added to m grid cells
PHASH_HAMMING_MAX = 6  # <= 6 differing bits => near-duplicate
PHASH_BANDS = 7  # 7 bands x 9 bits; pigeonhole catches every ham<=6 pair


def _phash_grid(doc_id: int):
    """Deterministic 8x8 grey grid for a doc: cluster base pattern
    (c = doc_id//4, nonlinear in c*i so distinct clusters don't share
    AC sign structure) plus a small perturbation on m = doc_id%4 cells
    — members of a cluster are near-duplicates by construction."""
    import numpy as np

    c, m = doc_id // 4, doc_id % 4
    i = np.arange(64, dtype=np.int64)
    g = (c * 37 + i * 53 + c * i * 11) % 256
    for j in range(m):
        g[(c + j * 7) % 64] = (g[(c + j * 7) % 64] + PHASH_DELTA) % 256
    return g


def phash_media_table(docs: DataFrame) -> DataFrame:
    """Per-doc deterministic 16x16 grey PNG whose 2x2 pixel blocks hold
    the 8x8 pHash grid (so the block-mean downscale in
    :func:`phash_signatures` is integer-exact)."""
    import numpy as np

    from .codecs import png_encode

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                g = _phash_grid(int(did)).reshape(8, 8).astype(np.uint8)
                img = np.kron(g, np.ones((2, 2), dtype=np.uint8))
                payloads.append(png_encode(img))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    return docs.filter(F.col("doc_id") < N_MEDIA_DOCS).select("doc_id").mapInPandas(
        encode_batch, "media_id long, payload binary"
    )


def phash_signatures(media: DataFrame) -> DataFrame:
    """REAL pHash pipeline over encoded images: PNG-decode, block-mean
    downscale to 8x8, quantized 2D DCT (int64 matmul with PHASH_DCT_Q),
    then 63 sign bits (DC dropped — it only encodes brightness) packed
    into one BIGINT. Arrow-batched; payloads never leave the stage."""
    import numpy as np

    from .codecs import png_decode

    cq = None

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nonlocal cq
        if cq is None:
            cq = np.array(PHASH_DCT_Q, dtype=np.int64)
        weights = (np.int64(1) << np.arange(63, dtype=np.int64))
        for pdf in batches:
            hashes = []
            for b in pdf["payload"]:
                img = png_decode(bytes(b)).astype(np.int64)
                side = img.shape[0] // 8
                g = img.reshape(8, side, 8, side).mean(axis=(1, 3)).astype(np.int64)
                t = cq @ g @ cq.T
                bits = (t > 0).reshape(-1)[1:].astype(np.int64)
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(decode_batch, "media_id long, phash long")


def phash_neardup_pairs(
    sig: DataFrame,
    hamming_max: int = PHASH_HAMMING_MAX,
    bands: int = PHASH_BANDS,
) -> DataFrame:
    """Near-dup pairs with pHash Hamming distance <= hamming_max, found
    by pigeonhole banding (``bands`` equi-joins on 9-bit slices of the
    63-bit hash) — never an all-pairs cross join. With bands >
    hamming_max every qualifying pair shares at least one untouched
    band, so recall is exact; the q65 SimHash machinery at image scale.

    The signature stage is localCheckpoint'ed first: the band joins
    reference ``sig`` 2*bands times and Python mapInPandas stages do NOT
    dedupe across join sites (the g33 ReusedExchange lesson, NOTES r10)
    — without it the PNG-decode+DCT stage re-executes per branch. The
    checkpoint holds one (media_id, phash) row per image — two longs —
    so it stays tiny at any corpus size."""
    if bands <= hamming_max:
        raise ValueError(
            f"bands={bands} must exceed hamming_max={hamming_max}: the "
            "pigeonhole recall guarantee needs at least one band no "
            "qualifying pair can disturb"
        )
    sig = sig.localCheckpoint()
    banded = sig.select(
        "media_id",
        "phash",
        *[
            F.shiftrightunsigned(F.col("phash"), 9 * j)
            .bitwiseAND(F.lit(511))
            .alias(f"b{j}")
            for j in range(bands)
        ],
    )
    pairs = None
    for j in range(bands):
        a = banded.alias("a")
        c = banded.alias("c")
        p = a.join(
            c,
            (F.col(f"a.b{j}") == F.col(f"c.b{j}"))
            & (F.col("a.media_id") < F.col("c.media_id")),
        ).select(
            F.col("a.media_id").alias("doc_a"),
            F.col("c.media_id").alias("doc_b"),
            F.col("a.phash").alias("ha"),
            F.col("c.phash").alias("hb"),
        )
        pairs = p if pairs is None else pairs.union(p)
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        pairs.distinct()
        .filter(ham <= hamming_max)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
    )


def _phash_oracle_sql() -> str:
    """Closed-form pixel oracle: rebuild the 8x8 grid, the quantized
    DCT (the PHASH_DCT_Q literals), the 63-bit sign hash and the
    <=hamming_max pairs entirely in SQL. The oracle may go all-pairs
    (it is a 200-doc gate, not the scale path)."""
    ct = ",".join(
        f"({u},{y},{PHASH_DCT_Q[u][y]})" for u in range(8) for y in range(8)
    )
    return f"""
    WITH ct(u, y, c) AS (VALUES {ct}),
    docs AS (SELECT doc_id, doc_id // 4 AS cl, doc_id % 4 AS m
             FROM documents WHERE doc_id < {N_MEDIA_DOCS}),
    cells AS (SELECT unnest(range(64)) AS i),
    grid AS (
        SELECT d.doc_id,
               cells.i,
               ((d.cl * 37 + cells.i * 53 + d.cl * cells.i * 11) % 256
                + CASE WHEN EXISTS (
                      SELECT 1 FROM range(3) j(j)
                      WHERE j.j < d.m AND (d.cl + j.j * 7) % 64 = cells.i
                  ) THEN {PHASH_DELTA} ELSE 0 END) % 256 AS g
        FROM docs d CROSS JOIN cells
    ),
    dct AS (
        SELECT grid.doc_id, a.u AS u, b.u AS v,
               CAST(sum(grid.g * a.c * b.c) AS BIGINT) AS t
        FROM grid
        JOIN ct a ON a.y = grid.i // 8
        JOIN ct b ON b.y = grid.i % 8
        GROUP BY grid.doc_id, a.u, b.u
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN t > 0
                             THEN 1::BIGINT << (8 * u + v - 1)
                             ELSE 0 END) AS BIGINT) AS phash
        FROM dct WHERE NOT (u = 0 AND v = 0)
        GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_HAMMING_MAX}
    """


@register(
    "q133_phash_neardup",
    oracle=_phash_oracle_sql(),
    doc="Image perceptual-hash near-duplicate pairs (multimodal x dedup, "
    "the last uncovered LLM-pipeline modality): deterministic 16x16 grey "
    "PNGs are encoded and REALLY decoded (functions/codecs.py), "
    "block-mean downscaled to 8x8, quantized-DCT sign-hashed to 63 bits "
    "(PHASH_DCT_Q int literals shared with the oracle — exact int64 "
    "arithmetic in both engines, zero float-tie risk), then paired by "
    "7x9-bit pigeonhole banding with Hamming <= 6 (exact recall, never "
    "all-pairs). Hash-exact vs the closed-form pixel oracle.",
)
def q133_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = phash_media_table(load(spark, sf_dir, "documents"))
    return phash_neardup_pairs(phash_signatures(media))


# ---------------------------------------------------------------------------
# q148: audio energy-delta fingerprint (multimodal x dedup)
# ---------------------------------------------------------------------------

AUDIO_FP_FRAMES = 8  # frames per clip; fingerprint = 7 energy-delta bits


def audio_fingerprints(media: DataFrame) -> DataFrame:
    """Decode mu-law WAV payloads and fingerprint each clip with the
    energy-delta sign hash (the Haitsma-Kalker robust-audio-hash shape,
    reduced to one band): samples are split into AUDIO_FP_FRAMES
    near-equal frames by integer framing (frame = (F*i) div n), frame
    energy is the exact int64 sum of |sample|, and bit k of the
    fingerprint is set iff energy[k] > energy[k+1]. All-integer, so the
    fingerprint is bit-identical across engines and re-runs."""
    import numpy as np

    from .codecs import wav_decode_ulaw

    def fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                _rate, samples = wav_decode_ulaw(bytes(b))
                n = len(samples)
                frames = (AUDIO_FP_FRAMES * np.arange(n)) // n
                a = np.abs(samples.astype(np.int64))
                e = [int(a[frames == k].sum()) for k in range(AUDIO_FP_FRAMES)]
                fp = sum(
                    1 << k
                    for k in range(AUDIO_FP_FRAMES - 1)
                    if e[k] > e[k + 1]
                )
                ids.append(int(mid))
                fps.append(fp)
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "fp": pd.Series(fps, dtype="int64")}
            )

    return media.mapInPandas(fp_batch, "media_id long, fp long")


@register(
    "q148_audio_fingerprint",
    oracle=f"""
    WITH rec AS ({_ULAW_SQL.format(n_docs=N_MEDIA_DOCS)}),
    n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM rec GROUP BY 1),
    fr AS (
        SELECT r.doc_id,
               CAST(({AUDIO_FP_FRAMES} * r.i) // n.n AS BIGINT) AS frame,
               CAST(sum(abs(r.sgn * r.rec_mag)) AS BIGINT) AS e
        FROM rec r JOIN n ON n.doc_id = r.doc_id
        GROUP BY 1, 2
    )
    SELECT a.doc_id AS media_id,
           CAST(sum(CASE WHEN a.e > b.e THEN (1 << a.frame) ELSE 0 END)
                AS BIGINT) AS fp
    FROM fr a JOIN fr b ON b.doc_id = a.doc_id AND b.frame = a.frame + 1
    GROUP BY 1
    """,
    doc="Audio fingerprinting over REAL compressed audio (multimodal x "
    "dedup): the G.711 mu-law WAVs are decoded by the stdlib codec "
    "inside mapInPandas, framed into 8 near-equal integer frames, and "
    "hashed by the 7 energy-delta sign bits (Haitsma-Kalker robust-hash "
    "shape) — exact int64 end to end. The oracle replays the companding "
    "transfer function in closed-form SQL (q114's _ULAW_SQL, now "
    "carrying the sample index) and re-derives the identical bits, so "
    "the hash certifies decode + framing + fingerprint bit-for-bit. "
    "Scale: one narrow (media_id, fp) row per clip out of the Arrow "
    "batches; identical-fp grouping downstream is a plain hash groupBy.",
)
def q148_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = ulaw_media_table(load(spark, sf_dir, "documents"))
    return audio_fingerprints(media)
