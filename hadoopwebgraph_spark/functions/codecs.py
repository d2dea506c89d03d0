"""Pure-stdlib media codecs for the multimodal tier: PNG (zlib + struct)
and WAV PCM (wave) — real decode paths that need no external libraries,
so the engine's multimodal pipeline is exercised end-to-end instead of
stubbed. Formats outside these (JPEG, MP3, video) still raise
NotImplementedError in decode_image/decode_audio — plugging Pillow/ffmpeg
in a real deployment replaces only these leaf functions; all Spark-side
plumbing (schemas, mapInPandas batching, feature extraction) is shared.

PNG support: 8-bit greyscale / RGB / RGBA, non-interlaced, all five
scanline filters (None/Sub/Up/Average/Paeth). The encoder emits filter-0
scanlines; the decoder handles any filter, unit-tested per type.
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
