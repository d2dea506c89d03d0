"""Pure-stdlib media codecs: PNG round-trips over every shape class and
all five scanline filter types, nearest-neighbor resize, WAV PCM16
round-trip."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hadoopwebgraph_spark.functions.codecs import (
    PNG_MAGIC,
    png_decode,
    png_dims,
    png_encode,
    resize_nearest,
    wav_decode,
    wav_encode,
)


@pytest.mark.parametrize("shape", [(1, 1), (7, 13), (16, 16), (9, 4, 3), (5, 6, 4)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    p = png_encode(img)
    assert png_dims(p) == (shape[1], shape[0])
    assert np.array_equal(png_decode(p), img)


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a greyscale PNG using the given filter type per row —
    exercises decode paths the (filter-0) encoder never emits."""
    h, w = img.shape
    bpp = 1
    rows = []
    prev = np.zeros(w, np.int32)
    for y, ft in zip(range(h), ftypes):
        line = img[y].astype(np.int32)
        if ft == 0:
            enc = line
        elif ft == 2:
            enc = (line - prev) & 0xFF
        elif ft == 1:
            enc = line.copy()
            enc[bpp:] = (line[bpp:] - line[:-bpp]) & 0xFF
        elif ft == 3:
            a = np.zeros(w, np.int32)
            a[bpp:] = line[:-bpp]
            enc = (line - ((a + prev) >> 1)) & 0xFF
        else:  # Paeth
            enc = np.empty(w, np.int32)
            for x in range(w):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                pv = a + b - c
                pa, pb, pc = abs(pv - a), abs(pv - b), abs(pv - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (int(line[x]) - pred) & 0xFF
        rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
        prev = line

    def chunk(tag, data):
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize(
    "ftypes",
    [[0] * 10, [1] * 10, [2] * 10, [3] * 10, [4] * 10, [0, 1, 2, 3, 4] * 2],
)
def test_png_all_filter_types(ftypes):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 12)).astype(np.uint8)
    assert np.array_equal(png_decode(_png_with_filters(img, ftypes)), img)


def test_png_rejects_unsupported_variants():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    # 16-bit depth: unsupported, must fail loudly not decode garbage
    def chunk(tag, data):
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    p = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"\0" * 10))
    with pytest.raises(NotImplementedError):
        png_decode(p)


def test_resize_nearest():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    up = resize_nearest(img, 12, 8)
    assert up.shape == (8, 12)
    down = resize_nearest(img, 3, 2)
    assert down.shape == (2, 3)
    assert np.array_equal(down, img[[0, 2]][:, [0, 2, 4]])


def test_wav_roundtrip():
    s = ((np.arange(100) * 13) % 2048 - 1024).astype(np.int16)
    rate, ch, back = wav_decode(wav_encode(s, 8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(back, s)


# ---- JPEG ----


def test_jpeg_constant_blocks_roundtrip_exact():
    """Constant 8x8 blocks have an integer DC and zero ACs, so the
    all-ones-quant baseline roundtrip is bit-exact — the property the
    q97 oracle relies on."""
    from hadoopwebgraph_spark.functions.codecs import (
        jpeg_decode,
        jpeg_dims,
        jpeg_encode_gray,
    )

    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 0, 255, 99, 181
    enc = jpeg_encode_gray(img)
    assert jpeg_dims(enc) == (16, 16)
    assert np.array_equal(jpeg_decode(enc), img)


@pytest.mark.parametrize("shape", [(8, 8), (16, 24), (13, 21), (1, 1), (40, 7)])
def test_jpeg_gray_near_lossless(shape):
    from hadoopwebgraph_spark.functions.codecs import jpeg_decode, jpeg_encode_gray

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode_gray(img))
    assert dec.shape == shape
    # all-ones quant: error bounded by coefficient rounding alone
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_rgb_roundtrip():
    from hadoopwebgraph_spark.functions.codecs import (
        jpeg_decode,
        jpeg_dims,
        jpeg_encode_rgb,
    )

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    enc = jpeg_encode_rgb(img)
    assert jpeg_dims(enc) == (24, 16)
    dec = jpeg_decode(enc)
    assert dec.shape == (16, 24, 3)
    # YCbCr forward/backward adds rounding on top of coefficient rounding
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 4


def test_jpeg_lossy_quant_decodes():
    from hadoopwebgraph_spark.functions.codecs import jpeg_decode, jpeg_encode_gray

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode_gray(img, qtable=np.full((8, 8), 16)))
    assert dec.shape == (24, 24)
    # heavier quantization: still close on average
    assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 16


def test_jpeg_rejects_progressive_and_non_jpeg():
    from hadoopwebgraph_spark.functions.codecs import jpeg_decode, jpeg_encode_gray

    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(jpeg_encode_gray(img))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2  # rewrite marker: SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(enc))
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01not a jpeg")


# ---- GIF ----


def test_gif_roundtrip_animated():
    import numpy as np

    from hadoopwebgraph_spark.functions.codecs import gif_decode, gif_dims, gif_encode

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, (16, 16)).astype(np.uint8) for _ in range(5)]
    blob = gif_encode(frames)
    assert blob[:6] == b"GIF89a"
    assert gif_dims(blob) == (16, 16)
    out = gif_decode(blob)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_gif_lzw_overflow_and_kwkwk():
    from hadoopwebgraph_spark.functions.codecs import _lzw_compress, _lzw_decompress
    import numpy as np

    # KwKwK: long single-symbol runs force the code==len(table) branch
    run = b"a" * 5000
    assert _lzw_decompress(_lzw_compress(run)) == run
    # dictionary overflow past 4096 forces a mid-stream CLEAR
    rng = np.random.default_rng(5)
    noise = bytes(rng.integers(0, 256, 120_000).astype(np.uint8))
    assert _lzw_decompress(_lzw_compress(noise)) == noise


def test_gif_decoder_reads_foreign_encoder_output():
    """Interop: LZW streams produced by a REAL third-party encoder
    (Tcl/Tk's, shipped with CPython's idlelib) must decode to exactly
    width*height pixels — certifies the variable-width growth timing
    against an implementation we didn't write. Skipped when no such
    file exists on the machine."""
    import glob
    import struct as _struct

    import pytest

    from hadoopwebgraph_spark.functions.codecs import _lzw_decompress, gif_dims

    candidates = glob.glob("/usr/lib/python3*/idlelib/Icons/*.gif") + glob.glob(
        "/*/sandboxing/**/idlelib/Icons/*.gif", recursive=True
    ) + glob.glob("/root/.pyenv/versions/*/lib/python3*/idlelib/Icons/*.gif")
    if not candidates:
        pytest.skip("no third-party GIF available")
    checked = 0
    for p in candidates[:3]:
        payload = open(p, "rb").read()
        w, h = gif_dims(payload)
        packed = payload[10]
        pos = 13
        if packed & 0x80:
            pos += 3 * (2 << (packed & 7))
        while pos < len(payload):
            b = payload[pos]
            pos += 1
            if b == 0x21:
                pos += 1
                while payload[pos]:
                    pos += 1 + payload[pos]
                pos += 1
            elif b == 0x2C:
                _l, _t, fw, fh = _struct.unpack_from("<HHHH", payload, pos)
                pos += 8
                ip = payload[pos]
                pos += 1
                if ip & 0x80:
                    pos += 3 * (2 << (ip & 7))
                mcs = payload[pos]
                pos += 1
                chunks = []
                while payload[pos]:
                    n = payload[pos]
                    chunks.append(payload[pos + 1 : pos + 1 + n])
                    pos += 1 + n
                pos += 1
                data = _lzw_decompress(b"".join(chunks), mcs)
                assert len(data) == fw * fh, p
                checked += 1
                break
            else:
                raise AssertionError(f"unexpected block 0x{b:02x} in {p}")
    assert checked > 0


# ---- G.711 mu-law ----


def test_ulaw_g711_anchors_and_fixpoints():
    import numpy as np

    from hadoopwebgraph_spark.functions.codecs import ulaw_compress, ulaw_expand

    # ITU-T G.711 anchor codes
    assert ulaw_compress(np.array([0]))[0] == 0xFF
    assert ulaw_compress(np.array([32124]))[0] == 0x80
    assert ulaw_compress(np.array([-32124]))[0] == 0x00
    # every code is a fixpoint of compress∘expand (0x7F = negative zero
    # canonicalizes to 0xFF)
    codes = np.arange(256, dtype=np.uint8)
    rt = ulaw_compress(ulaw_expand(codes))
    for c, r in zip(codes, rt):
        assert c == r or (c == 0x7F and r == 0xFF), (hex(c), hex(r))


def test_ulaw_wav_container_roundtrip():
    import numpy as np

    from hadoopwebgraph_spark.functions.codecs import (
        ulaw_expand,
        ulaw_compress,
        wav_decode_ulaw,
        wav_encode_ulaw,
    )

    rng = np.random.default_rng(4)
    s = rng.integers(-32000, 32000, 3001).astype(np.int16)
    rate, out = wav_decode_ulaw(wav_encode_ulaw(s, 8000))
    assert rate == 8000 and len(out) == 3001
    # container is transparent: decoded samples == expand(compress(s))
    assert (out == ulaw_expand(ulaw_compress(s))).all()
    # odd-sized data chunk exercised the RIFF 2-byte alignment path
