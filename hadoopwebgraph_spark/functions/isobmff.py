"""Minimal-but-real ISO-BMFF (MP4) container support, pure stdlib.

Closes the "real mp4" half of the multimodal story the same way GIF/PNG/
WAV/JPEG did for their formats: the CONTAINER layer is real — an actual
box tree with the genuine sample tables (`stts`/`stsc`/`stsz`/`stco`/
`co64`) that every MP4 demuxer uses — while the codec payload inside
each sample stays opaque bytes (H.264 decode is out of scope for a
stdlib container; the reference has no media surface at all, so there is
no reference file:line for this module).

Why the sample tables matter at 100 TB: frame sampling over a video
corpus must NOT read whole files. `sample_table()` gives per-sample
byte ranges from the (tiny) `moov` box, so a stride sampler seeks
straight to the frames it keeps — the same access pattern the bvgraph
source uses for node ranges, applied to media. `sample_frames()` below
demonstrates it over an in-memory payload; on object storage the same
offsets drive ranged GETs.

Writer notes: `write_mp4` produces a valid self-contained
video-track file (ftyp + mdat + moov) with version-0 boxes, one
`trak`, and samples split into chunks of `chunk_size` — multi-chunk
files exercise the full `stsc` chunk-run logic a single-chunk writer
would leave untested.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")


def _box(btype: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def write_mp4(
    frames: list[bytes],
    timescale: int = 1000,
    frame_duration: int = 40,
    chunk_size: int = 3,
    audio_decoy: bool = False,
) -> bytes:
    """Serialize opaque frame payloads as a one-track ISO-BMFF file.

    Samples are grouped into chunks of ``chunk_size`` (the last chunk may
    be short) so ``stsc`` has a real chunk-run table; ``stco`` stores one
    file-absolute offset per chunk. ``audio_decoy`` prepends a minimal
    empty audio (`hdlr` = soun) trak BEFORE the video trak — the layout
    of a typical phone recording — to exercise the parser's
    handler-based track selection.
    """
    if not frames:
        raise ValueError("mp4 needs at least one sample")
    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0x200) + b"isom" + b"iso2")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    mdat_data_start = len(ftyp) + 8  # first sample byte, file-absolute

    n = len(frames)
    duration = n * frame_duration

    # chunking: offsets of each chunk's first sample within mdat payload
    chunk_offsets, pos = [], 0
    for i in range(0, n, chunk_size):
        chunk_offsets.append(mdat_data_start + pos)
        pos += sum(len(f) for f in frames[i : i + chunk_size])
    n_chunks = len(chunk_offsets)
    last_chunk_samples = n - chunk_size * (n_chunks - 1)

    stsd = _full(
        b"stsd",
        0,
        0,
        _U32.pack(1)
        # opaque sample entry: real mp4v layout (6 reserved + data_ref_index,
        # then video-sample fields), payload never interpreted here
        + _box(
            b"mp4v",
            bytes(6)
            + struct.pack(">H", 1)
            + bytes(16)
            + struct.pack(">HH", 16, 16)  # width, height (nominal)
            + _U32.pack(0x00480000) * 2  # 72 dpi h/v
            + _U32.pack(0)
            + struct.pack(">H", 1)  # frame count
            + bytes(32)  # compressor name
            + struct.pack(">Hh", 24, -1),  # depth, color table id
        ),
    )
    stts = _full(b"stts", 0, 0, _U32.pack(1) + _U32.pack(n) + _U32.pack(frame_duration))
    # chunk runs: chunks 1..n_chunks-1 hold chunk_size samples, the last
    # holds the remainder (only emitted as a second run when it differs)
    runs = [(1, min(chunk_size, n))]
    if n_chunks > 1 and last_chunk_samples != chunk_size:
        runs.append((n_chunks, last_chunk_samples))
    stsc = _full(
        b"stsc",
        0,
        0,
        _U32.pack(len(runs))
        + b"".join(
            _U32.pack(first) + _U32.pack(count) + _U32.pack(1) for first, count in runs
        ),
    )
    stsz = _full(
        b"stsz",
        0,
        0,
        _U32.pack(0) + _U32.pack(n) + b"".join(_U32.pack(len(f)) for f in frames),
    )
    stco = _full(
        b"stco",
        0,
        0,
        _U32.pack(n_chunks) + b"".join(_U32.pack(o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url_ = _full(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full(b"dref", 0, 0, _U32.pack(1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(
        b"mdhd",
        0,
        0,
        _U32.pack(0) * 2 + _U32.pack(timescale) + _U32.pack(duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(b"hdlr", 0, 0, _U32.pack(0) + b"vide" + bytes(12) + b"video\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd",
        0,
        7,
        _U32.pack(0) * 2
        + _U32.pack(1)  # track id
        + _U32.pack(0)
        + _U32.pack(duration)
        + bytes(8)
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + _unity_matrix()
        + _U32.pack(16 << 16)
        + _U32.pack(16 << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd",
        0,
        0,
        _U32.pack(0) * 2
        + _U32.pack(timescale)
        + _U32.pack(duration)
        + _U32.pack(0x00010000)
        + struct.pack(">H", 0x0100)
        + bytes(10)
        + _unity_matrix()
        + bytes(24)
        + _U32.pack(2),  # next track id
    )
    traks = (_audio_decoy_trak(timescale) if audio_decoy else b"") + trak
    moov = _box(b"moov", mvhd + traks)
    return ftyp + mdat + moov


def _audio_decoy_trak(timescale: int) -> bytes:
    """A structurally valid zero-sample audio trak (hdlr 'soun')."""
    empty32 = _U32.pack(0)
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, empty32)
        + _full(b"stts", 0, 0, empty32)
        + _full(b"stsc", 0, 0, empty32)
        + _full(b"stsz", 0, 0, empty32 * 2)
        + _full(b"stco", 0, 0, empty32),
    )
    url_ = _full(b"url ", 0, 1, b"")
    dinf = _box(b"dinf", _full(b"dref", 0, 0, _U32.pack(1) + url_))
    smhd = _full(b"smhd", 0, 0, _U32.pack(0))
    minf = _box(b"minf", smhd + dinf + stbl)
    mdhd = _full(
        b"mdhd",
        0,
        0,
        empty32 * 2 + _U32.pack(timescale) + empty32 + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, 0, empty32 + b"soun" + bytes(12) + b"audio\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        7,
        empty32 * 2
        + _U32.pack(9)  # decoy track id
        + empty32 * 2
        + bytes(8)
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + _unity_matrix()
        + empty32 * 2,
    )
    return _box(b"trak", tkhd + mdia)


def _unity_matrix() -> bytes:
    return b"".join(
        _U32.pack(v)
        for v in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    )


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end); handles 64-bit largesize."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = _U32.unpack_from(data, pos)[0]
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = _U64.unpack_from(data, pos + 8)[0]
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes) -> tuple[int, int]:
    for btype, ps, pe in _iter_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return ps, pe
            return _find(data, ps, pe, *path[1:])
    raise ValueError(f"box {path[0]!r} not found")


@dataclass
class SampleTable:
    timescale: int
    offsets: list[int]  # file-absolute byte offset per sample
    sizes: list[int]
    durations: list[int]  # in timescale units


def _video_trak(data: bytes, moov_s: int, moov_e: int) -> tuple[int, int]:
    """First trak whose mdia/hdlr handler is 'vide' (a typical phone
    file puts the audio trak first — blindly taking trak #1 would demux
    AAC packets as frames); falls back to the first trak when no
    handler says video."""
    first = None
    for btype, ps, pe in _iter_boxes(data, moov_s, moov_e):
        if btype != b"trak":
            continue
        if first is None:
            first = (ps, pe)
        try:
            h_s, h_e = _find(data, ps, pe, b"mdia", b"hdlr")
        except ValueError:
            continue
        # full-box payload: version/flags(4) + pre_defined(4) + handler(4)
        if data[h_s + 8 : h_s + 12] == b"vide":
            return ps, pe
    if first is None:
        raise ValueError("no trak box in moov")
    return first


def sample_table(data: bytes) -> SampleTable:
    """Resolve the per-sample byte ranges from the real sample tables —
    the demux step every MP4 reader performs; no codec work."""
    moov_s, moov_e = _find(data, 0, len(data), b"moov")
    trak_s, trak_e = _video_trak(data, moov_s, moov_e)
    stbl_s, stbl_e = _find(data, trak_s, trak_e, b"mdia", b"minf", b"stbl")
    mdhd_s, _ = _find(data, trak_s, trak_e, b"mdia", b"mdhd")
    version = data[mdhd_s]
    timescale = _U32.unpack_from(data, mdhd_s + (20 if version == 1 else 12))[0]

    def full_payload(btype: bytes) -> tuple[int, int]:
        s, e = _find(data, stbl_s, stbl_e, btype)
        return s + 4, e  # skip version+flags

    # stsz: sizes
    s, e = full_payload(b"stsz")
    fixed, count = _U32.unpack_from(data, s)[0], _U32.unpack_from(data, s + 4)[0]
    if fixed:
        sizes = [fixed] * count
    else:
        sizes = [_U32.unpack_from(data, s + 8 + 4 * i)[0] for i in range(count)]

    # stco / co64: chunk offsets
    try:
        s, e = full_payload(b"stco")
        n_chunks = _U32.unpack_from(data, s)[0]
        chunk_offsets = [
            _U32.unpack_from(data, s + 4 + 4 * i)[0] for i in range(n_chunks)
        ]
    except ValueError:
        s, e = full_payload(b"co64")
        n_chunks = _U32.unpack_from(data, s)[0]
        chunk_offsets = [
            _U64.unpack_from(data, s + 4 + 8 * i)[0] for i in range(n_chunks)
        ]

    # stsc: chunk -> samples-per-chunk runs
    s, e = full_payload(b"stsc")
    n_runs = _U32.unpack_from(data, s)[0]
    runs = [
        tuple(
            _U32.unpack_from(data, s + 4 + 12 * i + 4 * j)[0] for j in range(3)
        )
        for i in range(n_runs)
    ]
    samples_per_chunk = []
    for i, (first, per, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        samples_per_chunk += [per] * (last - first + 1)

    # stts: duration runs
    s, e = full_payload(b"stts")
    n_runs = _U32.unpack_from(data, s)[0]
    durations: list[int] = []
    for i in range(n_runs):
        cnt = _U32.unpack_from(data, s + 4 + 8 * i)[0]
        delta = _U32.unpack_from(data, s + 8 + 8 * i)[0]
        durations += [delta] * cnt

    offsets: list[int] = []
    si = 0
    for ci, per in enumerate(samples_per_chunk):
        pos = chunk_offsets[ci]
        for _ in range(per):
            if si >= len(sizes):
                break
            offsets.append(pos)
            pos += sizes[si]
            si += 1
    if len(offsets) != len(sizes):
        raise ValueError("stsc/stco cover fewer samples than stsz declares")
    return SampleTable(timescale, offsets, sizes, durations)


def sample_frames(data: bytes, stride: int) -> list[tuple[int, bytes]]:
    """Every ``stride``-th frame's payload, reading ONLY those byte
    ranges (the skipped frames' bytes are never touched — on object
    storage these become ranged GETs driven by the moov tables)."""
    st = sample_table(data)
    return [
        (i, data[st.offsets[i] : st.offsets[i] + st.sizes[i]])
        for i in range(0, len(st.sizes), stride)
    ]
