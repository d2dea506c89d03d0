"""Pure-stdlib media codecs for the multimodal tier: PNG (zlib + struct),
baseline JPEG (numpy DCT + Annex-K Huffman), and WAV PCM (wave) — real
decode paths that need no external libraries, so the engine's multimodal
pipeline is exercised end-to-end instead of stubbed. Formats outside
these (MP3, video containers) still raise NotImplementedError at the
leaf decode function — plugging Pillow/ffmpeg in a real deployment
replaces only these leaf functions; all Spark-side plumbing (schemas,
mapInPandas batching, feature extraction) is shared.

PNG support: 8-bit greyscale / RGB / RGBA, non-interlaced, all five
scanline filters (None/Sub/Up/Average/Paeth). The encoder emits filter-0
scanlines; the decoder handles any filter, unit-tested per type.

JPEG support: baseline sequential DCT (SOF0), 8-bit. The decoder handles
greyscale and 3-component 4:4:4 (YCbCr), multiple DQT/DHT segments, and
restart markers; progressive (SOF2) and chroma subsampling raise
NotImplementedError. The encoder writes greyscale JFIF with the spec's
Annex-K luminance Huffman tables and a caller-supplied quantization
table (default all-ones — near-lossless, roundtrip error <= 2 LSB from
coefficient rounding alone; constant 8x8 blocks roundtrip exactly, which
is what the closed-form oracle query exploits).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def png_encode(img: np.ndarray) -> bytes:
    """Encode an 8-bit image array to PNG. Shape (h, w) => greyscale,
    (h, w, 3) => RGB, (h, w, 4) => RGBA. Filter 0 scanlines."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type = 0
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type = 2
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[0], img.shape[1]
    raw = img.reshape(h, -1)
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw], axis=1
    ).tobytes()  # filter byte 0 per row

    def chunk(tag: bytes, data: bytes) -> bytes:
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def png_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR without decompressing pixel data."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    if payload[12:16] != b"IHDR":
        raise ValueError("corrupt PNG: IHDR not first chunk")
    w, h = struct.unpack(">II", payload[16:24])
    return w, h


def _unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. data: (h, 1+stride) uint8 rows with
    the leading filter byte; returns (h, stride) raw bytes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(data[y, 0])
        line = data[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a PNG to an 8-bit array: (h, w) grey or (h, w, c) RGB/RGBA.
    Supports bit depth 8, color types 0/2/6, non-interlaced."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("corrupt PNG: no IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}): 8-bit grey/RGB/RGBA non-interlaced only"
        )
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG: pixel data length mismatch")
    img = _unfilter(raw.reshape(h, stride + 1), h, stride, ch)
    return img.reshape(h, w) if ch == 1 else img.reshape(h, w, ch)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w[, c]) array."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


# ---- JPEG (baseline sequential DCT) ----
#
# Coding constants from the public JPEG spec (ITU-T T.81): the zig-zag
# scan order and the Annex-K "typical" luminance Huffman tables.

JPEG_SOI = b"\xff\xd8"

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3.1: luminance DC — BITS (count of codes per length 1..16), HUFFVAL
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
# Annex K.3.2: luminance AC
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): value -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    T[0, :] /= np.sqrt(2)
    return T


_DCT_T = _dct_matrix()


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-bits pad (spec F.1.2.3)
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw, blk, q, prev_dc, dc_codes, ac_codes) -> int:
    """DCT + quantize + entropy-code one 8x8 block; returns its DC."""
    coeff = _DCT_T @ (blk - 128.0) @ _DCT_T.T
    quant = np.round(coeff / q).astype(np.int64)
    zz = quant.ravel()[_ZIGZAG]
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _jpeg_assemble(planes: list[np.ndarray], h: int, w: int, q: np.ndarray) -> bytes:
    """Entropy-code 4:4:4 interleaved MCUs for 1 or 3 planes and wrap in
    JFIF segments (one shared quant table + Annex-K luminance Huffman
    tables for every component — valid, if not size-optimal, JPEG)."""
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    dc_codes = _huff_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _huff_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    bw = _JpegBitWriter()
    prev_dc = [0] * len(planes)
    padded = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
        for p in planes
    ]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, plane in enumerate(padded):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                prev_dc[ci] = _encode_block(
                    bw, blk, q, prev_dc[ci], dc_codes, ac_codes
                )
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    n = len(planes)
    qzz = q.ravel()[_ZIGZAG].astype(np.uint8)
    sof_comps = b"".join(bytes([c + 1, 0x11, 0]) for c in range(n))
    sos_comps = b"".join(bytes([c + 1, 0x00]) for c in range(n))
    dht_dc = bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
    dht_ac = bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS)
    return (
        JPEG_SOI
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes([0x00]) + qzz.tobytes())
        + seg(0xC0, struct.pack(">BHHB", 8, h, w, n) + sof_comps)
        + seg(0xC4, dht_dc)
        + seg(0xC4, dht_ac)
        + seg(0xDA, struct.pack(">B", n) + sos_comps + bytes([0, 63, 0]))
        + scan
        + b"\xff\xd9"
    )


def jpeg_encode_gray(img: np.ndarray, qtable: np.ndarray | None = None) -> bytes:
    """Baseline JFIF greyscale encode of an (h, w) uint8 array. ``qtable``
    is an 8x8 quantization table in natural order (default all-ones:
    near-lossless). Dimensions are padded to 8 by edge replication; the
    SOF records the true dims, as the format prescribes."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    q = (
        np.ones((8, 8), dtype=np.int64)
        if qtable is None
        else np.asarray(qtable, dtype=np.int64)
    )
    return _jpeg_assemble([img], h, w, q)


def jpeg_encode_rgb(img: np.ndarray, qtable: np.ndarray | None = None) -> bytes:
    """Baseline JFIF 4:4:4 color encode of an (h, w, 3) uint8 RGB array
    (forward YCbCr per the JFIF convention)."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape[0], img.shape[1]
    q = (
        np.ones((8, 8), dtype=np.int64)
        if qtable is None
        else np.asarray(qtable, dtype=np.int64)
    )
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return _jpeg_assemble([y, cb, cr], h, w, q)


class _JpegBitReader:
    """MSB-first reader over entropy-coded data; un-stuffs 0xFF00 and
    stops at any other marker (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _HuffTable:
    """Canonical Huffman decoder: walk code lengths with (code, length)
    lookups against the per-length first-code/offset arrays."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.maxcode = [-1] * 17
        self.mincode = [0] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1
        self.vals = vals

    def decode(self, br: _JpegBitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.maxcode[length] >= 0 and code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the SOF header without entropy decoding."""
    if payload[:2] != JPEG_SOI:
        raise ValueError("not a JPEG")
    pos = 2
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2):
            h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return w, h
        pos += 2 + length
    raise ValueError("corrupt JPEG: no SOF")


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG: (h, w) grey for 1 component, or
    (h, w, 3) RGB for 3-component 4:4:4 YCbCr. Progressive encoding and
    chroma subsampling raise NotImplementedError (external-codec
    plug-points, same policy as MP3/video)."""
    if payload[:2] != JPEG_SOI:
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    h = w = None
    restart_interval = 0
    scan_pos = None
    scan_comps: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZIGZAG] = zz
                qtables[tid] = nat.reshape(8, 8)
                b += 65
        elif marker in (0xC0, 0xC1):  # baseline SOF
            _, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, samp, tq))
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG unsupported (SOF0 only)")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nval = sum(bits)
                vals = list(body[b + 17 : b + 17 + nval])
                huff[(tc, th)] = _HuffTable(bits, vals)
                b += 17 + nval
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(i for i, (ci, _, _) in enumerate(comps) if ci == cid)
                scan_comps.append((idx, tabs >> 4, tabs & 0xF))
            scan_pos = pos + 2 + length
            break
        pos += 2 + length
    if h is None or scan_pos is None:
        raise ValueError("corrupt JPEG: missing SOF or SOS")

    n_comp = len(comps)
    bh, bw_ = -(-h // 8), -(-w // 8)
    planes = np.zeros((n_comp, bh * 8, bw_ * 8), dtype=np.float64)
    br = _JpegBitReader(payload, scan_pos)
    prev_dc = [0] * n_comp
    mcu = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align()
                m = payload[br.pos : br.pos + 2]
                if len(m) == 2 and m[0] == 0xFF and 0xD0 <= m[1] <= 0xD7:
                    br.pos += 2
                prev_dc = [0] * n_comp
            mcu += 1
            for ci, tdc, tac in scan_comps:
                zz = np.zeros(64, dtype=np.int64)
                try:
                    s = huff[(0, tdc)].decode(br)
                    diff = _extend(br.read_bits(s), s) if s else 0
                    prev_dc[ci] += diff
                    zz[0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        rs = huff[(1, tac)].decode(br)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        zz[k] = _extend(br.read_bits(s), s)
                        k += 1
                except _MarkerHit as mh:
                    if not (0xD0 <= mh.marker <= 0xD9):
                        raise ValueError(
                            f"corrupt JPEG: unexpected marker {mh.marker:#x}"
                        ) from None
                    # truncated final blocks: leave zeros
                coeff = np.zeros(64, dtype=np.float64)
                coeff[_ZIGZAG] = zz * qtables[comps[ci][2]].ravel()[_ZIGZAG]
                blk = _DCT_T.T @ coeff.reshape(8, 8) @ _DCT_T
                planes[ci, by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
    planes = np.clip(np.round(planes + 128.0), 0, 255)[:, :h, :w]
    if n_comp == 1:
        return planes[0].astype(np.uint8)
    if n_comp == 3:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        return np.clip(
            np.round(np.stack([r, g, b], axis=-1)), 0, 255
        ).astype(np.uint8)
    raise NotImplementedError(f"{n_comp}-component JPEG unsupported")


# ---- WAV (PCM) ----


def wav_encode(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """PCM16 WAV bytes from an int16 sample array."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(rate, channels, int16 samples) from PCM16 WAV bytes."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("PCM16 WAV only")
        rate = f.getframerate()
        channels = f.getnchannels()
        samples = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
    return rate, channels, samples


# ---- GIF89a (LZW) ----
#
# Real animated-GIF support per the public GIF89a specification: a
# greyscale 256-entry global color table, one image block per frame
# (preceded by a Graphic Control Extension carrying the frame delay),
# and genuine variable-width LZW in both directions — the encoder builds
# the dictionary and resets on overflow with a CLEAR code; the decoder
# implements the standard table-rebuild including the KwKwK case, so it
# reads GIFs from any conformant encoder, not just ours.

GIF_MAGIC = b"GIF89a"
_GIF_MAX_CODE = 4096


def _lzw_compress(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    out = bytearray()
    cur = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # GIF grows the code width when the next code to assign no
        # longer fits; at 4096 the dictionary resets via CLEAR
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= _GIF_MAX_CODE:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int = 8) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    nbits = 0
    pos = 0

    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while True:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out)  # missing EOI: tolerate, like real readers
            cur |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = cur & ((1 << code_size) - 1)
        cur >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} out of range")
        out += entry
        if prev is not None and len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    raise AssertionError("unreachable")


def _sub_blocks(data: bytes) -> bytes:
    """Chunk a byte stream into GIF <=255-byte sub-blocks + terminator."""
    parts = []
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        parts.append(bytes([len(chunk)]) + chunk)
    parts.append(b"\x00")
    return b"".join(parts)


def gif_encode(frames: list[np.ndarray], delay_cs: int = 4) -> bytes:
    """Animated greyscale GIF89a from a list of 2-D uint8 frames (equal
    shapes). Global 256-entry grey color table; pixel value == palette
    index, so decode returns the original array exactly (GIF is
    lossless)."""
    if not frames:
        raise ValueError("at least one frame required")
    h, w = frames[0].shape
    out = [GIF_MAGIC, struct.pack("<HH", w, h), bytes([0xF7, 0, 0])]
    out.append(bytes(bytearray(v for i in range(256) for v in (i, i, i))))
    for frame in frames:
        if frame.shape != (h, w):
            raise ValueError("all frames must share one shape")
        # Graphic Control Extension: delay, no transparency
        out.append(b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00")
        # Image descriptor at (0,0), no local table, no interlace
        out.append(b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00")
        out.append(bytes([8]))  # LZW minimum code size
        payload = _lzw_compress(
            np.ascontiguousarray(frame, dtype=np.uint8).tobytes()
        )
        out.append(_sub_blocks(payload))
    out.append(b"\x3b")
    return b"".join(out)


def gif_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor (header only)."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", payload, 6)
    return w, h


def gif_frame_blocks(payload: bytes):
    """Yield (frame_idx, fw, fh, min_code_size, lzw_bytes, palette) per
    image block WITHOUT LZW-decoding anything — a frame sampler walks the
    sub-block structure (cheap length hops) and pays decompression only
    for the frames it keeps, the demuxer seek behavior q96/q108 model."""
    if payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    packed, _bg, _aspect = struct.unpack_from("<BBB", payload, 10)
    pos = 13
    global_palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
        global_palette = raw.reshape(n, 3)
        pos += 3 * n
    idx = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
        pos += 8
        ipacked = payload[pos]
        pos += 1
        palette = global_palette
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            raw = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
            palette = raw.reshape(n, 3)
            pos += 3 * n
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        if palette is None:
            raise ValueError("GIF image block without a color table")
        min_code_size = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            n = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + n])
            pos += 1 + n
        pos += 1
        yield idx, fw, fh, min_code_size, b"".join(chunks), palette
        idx += 1


def gif_decode_frame(
    fw: int, fh: int, min_code_size: int, lzw: bytes, palette: np.ndarray
) -> np.ndarray:
    """One frame's 2-D uint8 grey array from a gif_frame_blocks record
    (the palette's red channel — exact for grey palettes; color GIFs
    raise NotImplementedError)."""
    if not (palette[:, 0] == palette[:, 1]).all() or not (
        palette[:, 1] == palette[:, 2]
    ).all():
        raise NotImplementedError(
            "color GIF unsupported (greyscale palettes only)"
        )
    indices = np.frombuffer(_lzw_decompress(lzw, min_code_size), dtype=np.uint8)
    if indices.size != fw * fh:
        raise ValueError(f"GIF frame pixel count {indices.size} != {fw}x{fh}")
    return palette[indices, 0].reshape(fh, fw)


def gif_decode(payload: bytes) -> list[np.ndarray]:
    """All frames of a (possibly animated) GIF as 2-D uint8 arrays."""
    return [
        gif_decode_frame(fw, fh, mcs, lzw, pal)
        for _i, fw, fh, mcs, lzw, pal in gif_frame_blocks(payload)
    ]


# ---- WAV (G.711 mu-law, format code 7) ----
#
# Real compressed telephony audio per ITU-T G.711: 8-bit logarithmic
# samples, 2x smaller than PCM16. Python's `wave` module only handles
# WAVE_FORMAT_PCM, so the mu-law container is a hand-rolled minimal RIFF
# (fmt + data chunks) — which also documents the WAV layout the PCM path
# relies on. Vectorized NumPy companding in both directions.

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def ulaw_compress(samples: np.ndarray) -> np.ndarray:
    """int16 -> uint8 G.711 mu-law codes (vectorized)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = (x < 0).astype(np.uint8) * 0x80
    mag = np.clip(np.abs(x), 0, _ULAW_CLIP) + _ULAW_BIAS
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0xF
    return (~(sign | (exp.astype(np.uint8) << 4) | mant.astype(np.uint8))) & 0xFF


def ulaw_expand(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 mu-law codes -> int16 samples (vectorized)."""
    c = (~np.asarray(codes, dtype=np.uint8)) & 0xFF
    sign = c & 0x80
    exp = (c >> 4) & 7
    mant = c & 0xF
    mag = (((mant.astype(np.int32) << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


def wav_encode_ulaw(samples: np.ndarray, rate: int) -> bytes:
    """Mono mu-law WAV bytes (format code 7) from int16 samples."""
    data = ulaw_compress(samples).astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 7, 1, rate, rate, 1, 8)
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_decode_ulaw(payload: bytes) -> tuple[int, np.ndarray]:
    """(rate, int16 samples) from a mono mu-law WAV (format code 7)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            code, channels, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if code != 7 or bits != 8 or channels != 1:
                raise NotImplementedError(
                    "wav_decode_ulaw handles mono 8-bit mu-law (format 7) only"
                )
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, ulaw_expand(np.frombuffer(data, dtype=np.uint8))
