"""ISO-BMFF (MP4) container: writer/parser roundtrips, multi-chunk stsc
resolution, stride sampling byte-ranges, malformed-input rejection."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoopwebgraph_spark.functions.isobmff import (
    sample_frames,
    sample_table,
    write_mp4,
)


def test_roundtrip_single_chunk():
    frames = [b"frame-%d" % i * (i + 1) for i in range(5)]
    data = write_mp4(frames, chunk_size=10)  # all in one chunk
    t = sample_table(data)
    assert t.timescale == 1000
    assert t.sizes == [len(f) for f in frames]
    got = [data[o : o + s] for o, s in zip(t.offsets, t.sizes)]
    assert got == frames
    assert t.durations == [40] * 5


def test_roundtrip_multi_chunk_with_short_tail():
    # 7 samples in chunks of 3 -> chunks of 3,3,1: two stsc runs
    frames = [bytes([i]) * (3 + i) for i in range(7)]
    data = write_mp4(frames, chunk_size=3)
    t = sample_table(data)
    got = [data[o : o + s] for o, s in zip(t.offsets, t.sizes)]
    assert got == frames


def test_stride_sampling_reads_only_selected():
    frames = [b"F%02d" % i + bytes(10 + i) for i in range(10)]
    data = write_mp4(frames, chunk_size=4)
    picked = sample_frames(data, stride=3)
    assert [i for i, _ in picked] == [0, 3, 6, 9]
    assert all(payload == frames[i] for i, payload in picked)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=5),
)
def test_roundtrip_property(frames, chunk_size):
    data = write_mp4(frames, chunk_size=chunk_size)
    t = sample_table(data)
    assert [data[o : o + s] for o, s in zip(t.offsets, t.sizes)] == frames


def test_malformed_rejected():
    frames = [b"x" * 8]
    data = write_mp4(frames)
    with pytest.raises(ValueError):
        sample_table(data[: len(data) - 6])  # truncated moov
    with pytest.raises(ValueError):
        sample_table(b"\x00\x00\x00\x09abcd")  # box overruns buffer
    # no moov at all
    with pytest.raises(ValueError):
        sample_table(struct.pack(">I", 8) + b"free")


def test_empty_rejected():
    with pytest.raises(ValueError):
        write_mp4([])


def test_spark_frame_sampling_over_mp4(spark):
    """End-to-end Spark stage over REAL mp4 payloads: the same
    sample_frames pipeline that handles FAKEVID0 demuxes ISO-BMFF via
    its sample tables and decodes only the sampled PNG frames."""
    import numpy as np
    import pandas as pd

    from hadoopwebgraph_spark.functions.codecs import png_encode
    from hadoopwebgraph_spark.functions.multimodal import (
        IMG_SIDE,
        sample_frames as spark_sample_frames,
    )

    base = np.arange(IMG_SIDE * IMG_SIDE, dtype=np.int64).reshape(IMG_SIDE, IMG_SIDE)
    rows = []
    for did in range(4):
        frames = [
            png_encode(((did * 31 + f * 7 + base) % 256).astype(np.uint8))
            for f in range(3 + did % 5)
        ]
        rows.append((did, write_mp4(frames, chunk_size=2)))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        "media_id long, payload binary",
    )
    got = {
        (r["media_id"], r["frame_idx"]): r["mean_px"]
        for r in spark_sample_frames(media, stride=2).collect()
    }
    want = {}
    for did in range(4):
        for f in range(0, 3 + did % 5, 2):
            px = (did * 31 + f * 7 + base) % 256
            want[(did, f)] = round(float(np.mean(px.astype(np.float64))), 4)
    assert got == want


def test_video_track_selected_over_leading_audio_trak():
    """A decoy audio trak BEFORE the video trak (the typical phone-file
    layout) must not be demuxed: handler-based selection picks 'vide'."""
    frames = [b"video-frame-%d" % i for i in range(4)]
    data = write_mp4(frames, chunk_size=2, audio_decoy=True)
    t = sample_table(data)
    assert [data[o : o + s] for o, s in zip(t.offsets, t.sizes)] == frames
