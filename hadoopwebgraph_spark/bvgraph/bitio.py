"""Bit-level I/O for the BVGraph format: MSB-first bit streams and the
instantaneous codes the format uses (unary, Elias gamma/delta,
Boldi-Vigna zeta-k, nibble).

Semantics follow the published WebGraph format (Boldi & Vigna, "The
WebGraph Framework I: Compression Techniques", WWW 2004) as exercised by
the reference's decoder (/root/reference/.../HdfsBVGraph.java:98-201 reads
these codes via readOutdegree/readReference/readBlock/readResidual). This
is an independent implementation: pure Python over bytes/bytearray, MSB
first within each byte, matching the dsiutils InputBitStream bit order the
reference relies on.

Code ids match the BVGraph compressionflags nibble values
(HdfsBVGraph.java:307-315 unpacks one 4-bit code id per field):
DELTA=1 GAMMA=2 UNARY=7 ZETA=8 NIBBLE=9 (GOLOMB/ARITH/INTERP unsupported,
as in the reference's own BVGraph decode path).
"""

from __future__ import annotations

DELTA = 1
GAMMA = 2
UNARY = 7
ZETA = 8
NIBBLE = 9

CODE_NAMES = {
    "DELTA": DELTA,
    "GAMMA": GAMMA,
    "UNARY": UNARY,
    "ZETA": ZETA,
    "NIBBLE": NIBBLE,
}


def int2nat(x: int) -> int:
    """Zigzag: 0,-1,1,-2,2… -> 0,1,2,3,4… (Fast.int2nat equivalent)."""
    return 2 * x if x >= 0 else -2 * x - 1


def nat2int(x: int) -> int:
    """Inverse zigzag (Fast.nat2int equivalent)."""
    return x >> 1 if (x & 1) == 0 else -((x >> 1) + 1)


_PAD = b"\x00" * 16  # window guard: codes may peek up to 96 bits ahead


def pad(data: bytes) -> bytes:
    """Pre-pad a buffer once for use with ``BitReader(..., prepadded=True)``."""
    return data + _PAD


class BitReader:
    """MSB-first bit reader over a bytes-like buffer.

    The gamma/delta/zeta hot paths decode from a single 64-bit window
    fetched with one ``int.from_bytes`` (the buffer is zero-padded at
    construction so the peek never over-runs)."""

    __slots__ = ("data", "pos", "readers_cache")

    def __init__(self, data: bytes, pos_bits: int = 0, prepadded: bool = False):
        # pass prepadded=True (with data ending in bitio.pad()) to share one
        # padded buffer across many readers instead of copying per reader
        self.data = data if prepadded else data + _PAD
        self.pos = pos_bits
        self.readers_cache = None  # decode-kernel per-reader dispatch cache

    def position(self, pos_bits: int) -> None:
        self.pos = pos_bits

    def read_bit(self) -> int:
        p = self.pos
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def read_int(self, k: int) -> int:
        """Read k bits as an unsigned big-endian integer."""
        if k == 0:
            return 0
        p = self.pos
        end = p + k
        self.pos = end
        first = p >> 3
        last = (end - 1) >> 3
        chunk = int.from_bytes(self.data[first : last + 1], "big")
        return (chunk >> (((last + 1) << 3) - end)) & ((1 << k) - 1)

    def read_unary(self) -> int:
        """Count 0-bits until the terminating 1-bit (byte loop beats the
        64-bit window fetch here: typical unary values are 0-2 bits)."""
        data = self.data
        p = self.pos
        n = 0
        # finish the current byte, then whole bytes, bit-by-bit is fine for
        # the short runs unary produces in practice
        while True:
            byte = data[p >> 3]
            rem = 8 - (p & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                n += rem
                p += rem
                continue
            lead = rem - window.bit_length()
            n += lead
            p += lead + 1
            self.pos = p
            return n

    def _window64(self) -> int:
        """64 bits starting at the cursor (zero-padded past the end)."""
        p = self.pos
        i = p >> 3
        chunk = int.from_bytes(self.data[i : i + 9], "big")  # 72 bits
        return (chunk >> (8 - (p & 7))) & 0xFFFFFFFFFFFFFFFF

    def read_gamma(self) -> int:
        # gamma(x) = msb zeros, 1, then the msb low bits of x+1: the top
        # 2*msb+1 bits of the window ARE x+1
        w = self._window64()
        if w == 0:  # long unary run (> 32 zeros); fall back
            msb = self.read_unary()
            return ((1 << msb) | self.read_int(msb)) - 1
        lz = 64 - w.bit_length()
        self.pos += 2 * lz + 1
        return (w >> (63 - 2 * lz)) - 1

    def read_delta(self) -> int:
        msb = self.read_gamma()
        if msb == 0:
            return 0
        return ((1 << msb) | self.read_int(msb)) - 1

    def read_zeta(self, k: int) -> int:
        w = self._window64()
        if w == 0:
            h = self.read_unary()
            left = 1 << (h * k)
            m = self.read_int(h * k + k - 1)
            if m < left:
                return m + left - 1
            return (m << 1) + self.read_bit() - 1
        h = 64 - w.bit_length()
        hk = h * k
        need = h + 1 + hk + k - 1
        if need <= 64:
            left = 1 << hk
            m = (w >> (64 - need)) & ((1 << (hk + k - 1)) - 1)
            if m < left:
                self.pos += need
                return m + left - 1
            extra = (w >> (63 - need)) & 1
            self.pos += need + 1
            return (m << 1) + extra - 1
        # rare huge value: slow path
        self.pos += h + 1
        left = 1 << hk
        m = self.read_int(hk + k - 1)
        if m < left:
            return m + left - 1
        return (m << 1) + self.read_bit() - 1

    def read_zeta_run(self, n: int, k: int) -> list[int]:
        """Decode n consecutive zeta-k codes with all state in locals —
        the residual-stream hot loop (values < 2^32 always fit one
        64-bit window: h <= 31/k, so h+1 + h*k+k <= 64)."""
        data = self.data
        p = self.pos
        out = []
        append = out.append
        for _ in range(n):
            i = p >> 3
            w = (
                int.from_bytes(data[i : i + 9], "big") >> (8 - (p & 7))
            ) & 0xFFFFFFFFFFFFFFFF
            if w == 0:  # degenerate long-zero run; defer to slow path
                self.pos = p
                append(self.read_zeta(k))
                p = self.pos
                continue
            h = 64 - w.bit_length()
            hk = h * k
            need = h + hk + k  # h+1 + hk+k-1
            left = 1 << hk
            m = (w >> (64 - need)) & ((1 << (hk + k - 1)) - 1)
            if m < left:
                p += need
                append(m + left - 1)
            else:
                append((m << 1) + ((w >> (63 - need)) & 1) - 1)
                p += need + 1
        self.pos = p
        return out

    def read_gamma_run(self, n: int) -> list[int]:
        """Decode n consecutive gamma codes with state in locals."""
        data = self.data
        p = self.pos
        out = []
        append = out.append
        for _ in range(n):
            i = p >> 3
            w = (
                int.from_bytes(data[i : i + 9], "big") >> (8 - (p & 7))
            ) & 0xFFFFFFFFFFFFFFFF
            if w == 0:
                self.pos = p
                append(self.read_gamma())
                p = self.pos
                continue
            lz = 64 - w.bit_length()
            p += 2 * lz + 1
            append((w >> (63 - 2 * lz)) - 1)
        self.pos = p
        return out

    def read_nibble(self) -> int:
        x = 0
        while True:
            x <<= 3
            stop = self.read_bit()
            x |= self.read_int(3)
            if stop:
                return x

    def make_reader(self, code: int, zeta_k: int = 3):
        """Bind a code id to a zero-arg read callable."""
        if code == GAMMA:
            return self.read_gamma
        if code == DELTA:
            return self.read_delta
        if code == UNARY:
            return self.read_unary
        if code == ZETA:
            return lambda: self.read_zeta(zeta_k)
        if code == NIBBLE:
            return self.read_nibble
        raise ValueError(f"unsupported code id {code}")


class BitWriter:
    """MSB-first bit writer accumulating into a bytearray."""

    __slots__ = ("buf", "cur", "fill", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0  # partial byte
        self.fill = 0  # bits used in cur
        self.nbits = 0

    def write_bit(self, b: int) -> None:
        self.cur = (self.cur << 1) | (b & 1)
        self.fill += 1
        self.nbits += 1
        if self.fill == 8:
            self.buf.append(self.cur)
            self.cur = 0
            self.fill = 0

    def write_int(self, x: int, k: int) -> None:
        """Write the k low bits of x, MSB first."""
        if k == 0:
            return
        self.nbits += k
        fill = self.fill
        cur = (self.cur << k) | (x & ((1 << k) - 1))
        fill += k
        while fill >= 8:
            fill -= 8
            self.buf.append((cur >> fill) & 0xFF)
        self.cur = cur & ((1 << fill) - 1)
        self.fill = fill

    def write_unary(self, x: int) -> None:
        while x >= 32:
            self.write_int(0, 32)
            x -= 32
        self.write_int(1, x + 1)

    def write_gamma(self, x: int) -> None:
        v = x + 1
        msb = v.bit_length() - 1
        self.write_unary(msb)
        self.write_int(v, msb)  # low msb bits (implicit leading 1 dropped)

    def write_delta(self, x: int) -> None:
        v = x + 1
        msb = v.bit_length() - 1
        self.write_gamma(msb)
        self.write_int(v, msb)

    def write_zeta(self, x: int, k: int) -> None:
        v = x + 1
        h = (v.bit_length() - 1) // k
        self.write_unary(h)
        left = 1 << (h * k)
        if v - left < left:
            self.write_int(v - left, h * k + k - 1)
        else:
            self.write_int(v, h * k + k)

    def write_nibble(self, x: int) -> None:
        groups = []
        while True:
            groups.append(x & 0x7)
            x >>= 3
            if x == 0:
                break
        for i in range(len(groups) - 1, -1, -1):
            self.write_bit(1 if i == 0 else 0)
            self.write_int(groups[i], 3)

    def make_writer(self, code: int, zeta_k: int = 3):
        if code == GAMMA:
            return self.write_gamma
        if code == DELTA:
            return self.write_delta
        if code == UNARY:
            return self.write_unary
        if code == ZETA:
            return lambda x: self.write_zeta(x, zeta_k)
        if code == NIBBLE:
            return self.write_nibble
        raise ValueError(f"unsupported code id {code}")

    def to_bytes(self) -> bytes:
        out = bytes(self.buf)
        if self.fill:
            out += bytes([(self.cur << (8 - self.fill)) & 0xFF])
        return out
