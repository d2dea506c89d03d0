"""Succinct monotone offsets index — the Elias-Fano structure the
reference holds its n+1 bit-pointers in (HdfsBVGraph.java:371-387:
``EliasFanoMonotoneLongBigList`` with universe 8*fileLen+1).

A plain int64 array costs 64 bits/node (1 GB at the 134M-node scale the
reference targets). Elias-Fano splits each value into ``l = floor(log2(
u/m))`` low bits plus a unary-coded high part in a bitmap of <= 2m+1
bits. This implementation keeps the high bitmap exactly (2 bits/entry +
a 1.6% rank-sample overlay) and stores the low bits byte-aligned in the
smallest uint dtype that fits — trading a few bits/entry vs. true
bit-packing for vectorized NumPy random access. Typical web-graph
offsets (u/m ~ 2-3 bits/link * ~30 links/node => l ~ 6) land at ~10
bits/entry -> ~6x under int64; the pathological worst case (l > 32)
falls back to the dense array.

Driver-only: the planner folds the offsets stream once (int64 transient,
same as before), then retains only this compact form in the plan cache.
Supports the exact access paths partition planning needs: ``ef[i]``,
``ef[a:b]`` (ndarray out), and ``searchsorted`` — drop-in for the int64
array in BVGraphReader.partitions().
"""

from __future__ import annotations

import numpy as np

_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(
    axis=1
).astype(np.int64)

_RANK_SAMPLE = 8  # cumulative popcount kept per 8 words (512 bits)


class EliasFanoOffsets:
    """Compressed monotone int64 sequence with random access."""

    __slots__ = ("m", "l", "low", "high", "rank", "universe")

    def __init__(self, values: np.ndarray):
        values = np.ascontiguousarray(values, dtype=np.int64)
        if len(values) == 0:
            raise ValueError("empty sequence")
        if np.any(np.diff(values) < 0):
            raise ValueError("sequence must be monotone non-decreasing")
        m = len(values)
        u = int(values[-1]) + 1
        l = max(0, int(np.floor(np.log2(max(1, u // m))))) if u > m else 0
        self.m = m
        self.l = l
        self.universe = u

        if l == 0:
            low_dtype = None
        elif l <= 8:
            low_dtype = np.uint8
        elif l <= 16:
            low_dtype = np.uint16
        elif l <= 32:
            low_dtype = np.uint32
        else:  # degenerate universe; EF gains nothing
            low_dtype = np.uint64
        self.low = (
            (values & ((1 << l) - 1)).astype(low_dtype) if l else None
        )

        highs = (values >> l).astype(np.int64)
        pos = np.arange(m, dtype=np.int64) + highs  # i-th one at pos[i]
        nbits = int(pos[-1]) + 1
        nwords = (nbits + 63) // 64 + 1
        words = np.zeros(nwords, dtype=np.uint64)
        np.bitwise_or.at(
            words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
        )
        self.high = words
        # rank samples: ones before each 8-word block (for select)
        wpop = _POP8[words.view(np.uint8)].reshape(-1, 8).sum(axis=1)
        pad = (-len(wpop)) % _RANK_SAMPLE
        wpop_p = np.pad(wpop, (0, pad))
        self.rank = np.concatenate(
            [[0], np.cumsum(wpop_p.reshape(-1, _RANK_SAMPLE).sum(axis=1))]
        )

    # ---- size accounting ----

    def nbytes(self) -> int:
        return (
            (self.low.nbytes if self.low is not None else 0)
            + self.high.nbytes
            + self.rank.nbytes
        )

    def __len__(self) -> int:
        return self.m

    # ---- select / access ----

    def _select(self, i: int) -> int:
        # block from rank samples, then word scan, then in-word scan
        b = int(np.searchsorted(self.rank, i + 1, side="left")) - 1
        count = int(self.rank[b])
        w = b * _RANK_SAMPLE
        while True:
            word = int(self.high[w])
            c = bin(word).count("1")
            if count + c > i:
                break
            count += c
            w += 1
        # scan bits LSB-first within the word
        word = int(self.high[w])
        need = i - count
        for _ in range(need):
            word &= word - 1  # clear lowest set bit
        lsb = (word & -word).bit_length() - 1
        return w * 64 + lsb

    def __getitem__(self, i):
        if isinstance(i, slice):
            start, stop, step = i.indices(self.m)
            if step != 1:
                raise ValueError("only unit-step slices supported")
            return self._range(start, stop)
        if i < 0:
            i += self.m
        if not 0 <= i < self.m:
            raise IndexError(i)
        hi = self._select(i) - i
        lo = int(self.low[i]) if self.low is not None else 0
        return (hi << self.l) | lo

    def _range(self, start: int, stop: int) -> np.ndarray:
        """values[start:stop] as int64 (vectorized ones extraction)."""
        if stop <= start:
            return np.empty(0, dtype=np.int64)
        p0 = self._select(start)
        p1 = self._select(stop - 1)
        w0, w1 = p0 >> 6, (p1 >> 6) + 1
        # little-endian uint64 bytes are position-ascending; little bitorder
        # makes bit k of the bitmap land at index k
        bits = np.unpackbits(self.high[w0:w1].view(np.uint8), bitorder="little")
        ones = np.flatnonzero(bits) + w0 * 64
        # ones positions for entries [start, stop): the first is at p0
        first = int(np.searchsorted(ones, p0))
        sel = ones[first : first + (stop - start)]
        highs = sel - np.arange(start, stop, dtype=np.int64)
        lows = (
            self.low[start:stop].astype(np.int64)
            if self.low is not None
            else 0
        )
        return (highs << self.l) | lows

    def searchsorted(self, goal: int, side: str = "left") -> int:
        """First index i with values[i] >= goal (side='left'), via binary
        search over O(log m) random accesses."""
        if side != "left":
            raise ValueError("only side='left' supported")
        lo, hi = 0, self.m
        while lo < hi:
            mid = (lo + hi) // 2
            if self[mid] < int(goal):
                lo = mid + 1
            else:
                hi = mid
        return lo
