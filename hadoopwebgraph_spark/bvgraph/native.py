"""ctypes loader for the C decode kernel (_kernel.c) — the fast path for
the BVGraph source's per-partition decode and the driver's offsets fold.

The pure-Python decoder in codec.py remains the executable spec and the
always-available fallback: anything here failing (no C compiler, load
error, kernel error return) falls back silently. Both implementations are
pinned to identical outputs by the hypothesis round-trip suite
(tests/test_codec_properties.py) and an explicit native-vs-python
equality test.

Compilation happens at most once per source hash: ``cc -O3 -shared
-fPIC`` into ``_build/kernel-<hash>.so`` next to this file, with an
atomic rename so concurrently-forked Spark Python workers never observe a
half-written .so (losers of the race just overwrite with identical
bytes). Set ``SPARK_GRAFT_NO_NATIVE=1`` to force the Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_kernel.c")
_BUILD_DIR = os.path.join(_HERE, "_build")

_i8p = ctypes.POINTER(ctypes.c_uint8)
_i32 = ctypes.c_int32
_i64 = ctypes.c_int64
_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)


def _compile_and_load():
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_BUILD_DIR, f"kernel-{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        fd, tmp_path = tempfile.mkstemp(dir=_BUILD_DIR, suffix=".so.tmp")
        os.close(fd)
        try:
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", tmp_path, _SRC],
                check=True,
                capture_output=True,
            )
            os.replace(tmp_path, so_path)  # atomic: racers converge
        finally:
            if os.path.exists(tmp_path):
                os.unlink(tmp_path)
    lib = ctypes.CDLL(so_path)
    lib.bvg_decode_range.restype = _i64
    lib.bvg_decode_range.argtypes = [
        _i8p, _i64,  # data, data_bytes
        _i32, _i32, _i32, _i32,  # window_size, max_ref_count, min_ivl, zeta_k
        _i32, _i32, _i32, _i32, _i32,  # out/ref/bcnt/blk/res codes
        _i64, _i64,  # from_node, up_to
        _i64p, _i64, _i64,  # seed_offsets, seed_base, start_bit
        _i32p, _i64,  # out_values, out_cap
        _i64p,  # out_list_offsets
        _i64p,  # out_bitpos (nullable)
    ]
    lib.bvg_decode_offsets.restype = _i64
    lib.bvg_decode_offsets.argtypes = [_i8p, _i64, _i64, _i32, _i32, _i64p]
    lib.bvg_encode_deltas.restype = _i64
    lib.bvg_encode_deltas.argtypes = [_i64p, _i64, _i64, _i32, _i32, _i8p, _i64]
    lib.bvg_encode_segment.restype = _i64
    lib.bvg_encode_segment.argtypes = [
        _i32p, _i64p, _i64, _i64,  # values, list_offsets, n_nodes, first_src
        _i32, _i32, _i32, _i32,  # window_size, max_ref_count, min_ivl, zeta_k
        _i32, _i32, _i32, _i32, _i32,  # out/ref/bcnt/blk/res codes
        _i8p, _i64,  # out_buf, out_cap (bytes)
        _i64p,  # out_offsets
    ]
    return lib


_LIB = None
_TRIED = False


def get_lib():
    """The loaded kernel, or None (no compiler / load failure / opt-out)."""
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("SPARK_GRAFT_NO_NATIVE") != "1":
            try:
                _LIB = _compile_and_load()
            except Exception:
                _LIB = None
    return _LIB


def _borrow_u8p(buf: bytes) -> _i8p:
    """Zero-copy pointer into a bytes object (caller must keep it alive
    for the duration of the C call)."""
    return ctypes.cast(ctypes.c_char_p(buf), _i8p)


def decode_range(
    padded: bytes,
    p,
    from_node: int,
    up_to: int,
    seed_offsets: np.ndarray | None = None,
    seed_base: int = 0,
    start_bit: int = 0,
    want_bitpos: bool = False,
):
    """Decode nodes [from_node, up_to) from a bitio.pad()-padded buffer.

    Returns (values int32[], list_offsets int64[n+1], bitpos int64[n]|None)
    or None if the kernel is unavailable or errored (caller falls back to
    the Python decoder)."""
    lib = get_lib()
    if lib is None:
        return None
    n = up_to - from_node
    if n <= 0:
        return (
            np.empty(0, np.int32),
            np.zeros(1, np.int64),
            np.empty(0, np.int64) if want_bitpos else None,
        )

    data = _borrow_u8p(padded)
    data_bytes = len(padded) - 16  # bitio._PAD length

    if seed_offsets is not None:
        seeds = np.ascontiguousarray(seed_offsets, dtype=np.int64)
        seeds_p = seeds.ctypes.data_as(_i64p)
    else:
        seeds = None
        seeds_p = None

    list_offsets = np.empty(n + 1, dtype=np.int64)
    bitpos = np.empty(n, dtype=np.int64) if want_bitpos else None

    cap = max(4 * data_bytes + 1024, 4096)
    for _ in range(8):  # overflow retries (first retry is exact-sized)
        values = np.empty(cap, dtype=np.int32)
        rc = lib.bvg_decode_range(
            data,
            data_bytes,
            p.window_size,
            p.max_ref_count,
            p.min_interval_length,
            p.zeta_k,
            p.outdegree_code,
            p.reference_code,
            p.block_count_code,
            p.block_code,
            p.residual_code,
            from_node,
            up_to,
            seeds_p,
            seed_base,
            start_bit,
            values.ctypes.data_as(_i32p),
            cap,
            list_offsets.ctypes.data_as(_i64p),
            bitpos.ctypes.data_as(_i64p) if want_bitpos else None,
        )
        if rc >= 0:
            return values[:rc], list_offsets, bitpos
        if rc < -8:  # buffer too small; kernel reports the exact need
            cap = -rc
            continue
        return None  # kernel error: fall back to the Python decoder
    return None


def encode_segment(
    values: np.ndarray, list_offsets: np.ndarray, first_src: int, p
):
    """Encode a window-isolated segment (CSR adjacency) with the C kernel.

    Returns (nbits, buf bytes of ceil(nbits/8), offsets int64[n+1]) or
    None if the kernel is unavailable/errored (caller falls back to the
    Python encoder). Output bytes are bit-identical to the Python path
    (same candidate order and strict-less tie-break)."""
    lib = get_lib()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.int32)
    list_offsets = np.ascontiguousarray(list_offsets, dtype=np.int64)
    n = len(list_offsets) - 1
    out_offsets = np.empty(n + 1, dtype=np.int64)
    cap = max(2 * values.nbytes + 8 * n + 1024, 4096)
    for _ in range(4):
        buf = np.zeros(cap, dtype=np.uint8)
        rc = lib.bvg_encode_segment(
            values.ctypes.data_as(_i32p),
            list_offsets.ctypes.data_as(_i64p),
            n,
            first_src,
            p.window_size,
            p.max_ref_count,
            p.min_interval_length,
            p.zeta_k,
            p.outdegree_code,
            p.reference_code,
            p.block_count_code,
            p.block_code,
            p.residual_code,
            buf.ctypes.data_as(_i8p),
            cap,
            out_offsets.ctypes.data_as(_i64p),
        )
        if rc >= 0:
            nbytes = (int(rc) + 7) // 8
            return int(rc), buf[:nbytes].tobytes(), out_offsets
        if rc < -8:
            cap = -rc
            continue
        return None
    return None


def encode_deltas(values: np.ndarray, prev: int, code: int, zeta_k: int):
    """Delta-encode a monotone int64 sequence (offsets stream chunk).
    Returns (nbits, bytes of ceil(nbits/8)) or None on unavailability."""
    lib = get_lib()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.int64)
    cap = max(4 * len(values) + 64, 1024)
    for _ in range(4):
        buf = np.zeros(cap, dtype=np.uint8)
        rc = lib.bvg_encode_deltas(
            values.ctypes.data_as(_i64p),
            len(values),
            prev,
            code,
            zeta_k,
            buf.ctypes.data_as(_i8p),
            cap,
        )
        if rc >= 0:
            return int(rc), buf[: (int(rc) + 7) // 8].tobytes()
        if rc < -8:
            cap = -rc
            continue
        return None
    return None


def decode_offsets(offsets_bytes_padded: bytes, count: int, code: int, zeta_k: int):
    """Cumulative-sum fold of a delta-coded offsets stream.

    Returns the offsets array, or None ONLY when the kernel is
    unavailable (caller falls back to the pure-Python reader). Kernel-
    DETECTED corruption raises: falling back would let the Python path
    silently decode zero-padding past a truncated stream into garbage
    offsets, defeating the detection."""
    lib = get_lib()
    if lib is None:
        return None
    data = _borrow_u8p(offsets_bytes_padded)
    data_bytes = len(offsets_bytes_padded) - 16  # bitio._PAD length
    out = np.empty(count, dtype=np.int64)
    rc = lib.bvg_decode_offsets(
        data, data_bytes, count, code, zeta_k, out.ctypes.data_as(_i64p)
    )
    if rc != 0:
        raise ValueError(
            f"corrupt or truncated .offsets stream (kernel rc={rc}: "
            f"{'bad code' if rc == -2 else 'cursor past data extent'})"
        )
    return out
