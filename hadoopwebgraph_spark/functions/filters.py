"""Xor-filter semi-join pre-filtering — staged in round 13 for round
14's registered operator (r13 window had zero spare slots; registration
deferred, see NOTES.md r13 / VERDICT r12 #9).

The repo's q118 uses Spark's built-in Bloom filter for the classic
filter-pushdown join. The xor filter (Graf & Lemire, "Xor Filters:
Faster and Smaller Than Bloom and Cuckoo Filters", JEA 2020) is the
succinct successor from the ribbon/fuse family: ~9.84 bits/key at an
~0.39% false-positive rate (a Bloom filter needs ~14.4 bits/key for
that), and membership costs exactly three XORs. The join shape is the
standard two-phase bloom-join: broadcast the tiny filter, drop the vast
majority of non-matching fact rows BEFORE the shuffle, then an exact
semi-join on the survivors removes the false positives — the filter can
therefore never change the answer, only the shuffled volume.

Spark-first decomposition:

- Keys are normalized to int64 JVM-side with ``F.xxhash64`` (no Python
  in the key-normalization path); the filter itself is built
  driver-side from the collected build-side key hashes — the same
  bounded-build-side contract as every broadcast join (the build side
  of a filter-pushdown join is small by definition; ``max_build``
  guards the collect like the repo's other bounded-collect sites).
- The probe is an Arrow-batched pandas UDF over the int64 hash column:
  three vectorized splitmix64 mixes + three table gathers + XOR per
  batch, numpy end-to-end. The filter bytes ride the closure broadcast.
- At 100 TB: the fact side is scanned once, the filter drops
  non-matching rows at the scan site (no shuffle for dropped rows), and
  the exact semi-join shuffles only survivors — build-side size and
  filter bytes are independent of fact-side size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load
from ..registry import register

# bounded-collect guard for the build side (same contract as broadcast)
MAX_BUILD_KEYS = 5_000_000

_SEG_FACTOR = 1.23  # capacity = 3 segments of ceil(1.23 * n / 3) slots


def _splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 — the shared mixer of
    build and probe (both sides run THIS function, so there is no
    cross-implementation hash contract to drift)."""
    z = (x + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _slots(h: np.ndarray, seg_len: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Three slot indexes, one per segment, derived from one mixed hash."""
    s0 = (h % np.uint64(seg_len)).astype(np.int64)
    s1 = ((h >> np.uint64(21)) % np.uint64(seg_len)).astype(np.int64) + seg_len
    s2 = ((h >> np.uint64(42)) % np.uint64(seg_len)).astype(np.int64) + 2 * seg_len
    return s0, s1, s2


def _fingerprints(h: np.ndarray) -> np.ndarray:
    fp = (h >> np.uint64(7)).astype(np.uint8)
    return np.where(fp == 0, np.uint8(1), fp)  # 0 is the empty-slot value


def _peel(slots: np.ndarray, n_slots: int):
    """Vectorized frontier peel of a 3-uniform hypergraph: repeatedly
    remove keys that own a slot no other alive key uses. Whole sweeps
    vectorize because a count-1 slot is owned by exactly ONE alive key —
    candidates within a sweep can never contend for a slot or strip
    each other's uniqueness, so the whole frontier removes in bulk
    (per-key Python loop was the r13 ADVICE scale item: minutes at the
    5M-key cap). A key can only BECOME peelable when one of its slots'
    counts drops, so after the first sweep only keys sharing a slot
    with just-removed keys are rescanned (CSR slot->keys index) —
    total work O(n) regardless of sweep count. That matters for the
    fuse layout, whose peel wave crosses segments left-to-right:
    measured 1097 sweeps at 1M keys, 348x n total work under the naive
    all-alive rescan (review r14). Returns (sweeps_keys, sweeps_slots)
    in peel order, or None when the graph has a 2-core (caller retries
    with a new seed). Shared by the xor and binary-fuse builds — only
    the slot LAYOUT differs between them, never the peel invariants."""
    n = len(slots)
    flat = slots.ravel()
    counts = np.bincount(flat, minlength=n_slots)
    # CSR inverse index: key_of[starts[s]:starts[s+1]] = keys using slot s
    order = np.argsort(flat, kind="stable")
    key_of = (order // 3).astype(np.int32)  # n <= MAX_BUILD_KEYS < 2^31
    del order
    starts = np.zeros(n_slots + 1, np.int64)
    np.cumsum(counts, out=starts[1:])  # counts unmutated until the loop
    alive = np.ones(n, bool)
    sweeps_keys: list[np.ndarray] = []
    sweeps_slots: list[np.ndarray] = []
    frontier = np.arange(n)
    while len(frontier):
        act = frontier[alive[frontier]]
        if len(act) == 0:
            break
        own = counts[slots[act]] == 1  # |act| x 3
        hit = own.any(axis=1)
        cand = act[hit]
        if len(cand) == 0:
            break
        # first uniquely-owned slot per candidate
        chosen = slots[cand, own[hit].argmax(axis=1)]
        sweeps_keys.append(cand)
        sweeps_slots.append(chosen)
        alive[cand] = False
        dirty = slots[cand].ravel()
        np.subtract.at(counts, dirty, 1)
        # next frontier: every key sharing a just-decremented slot
        # (total >= 1 always — each dirty slot's CSR range contains at
        # least the peeled key itself)
        du = np.unique(dirty)
        lens = starts[du + 1] - starts[du]
        total = int(lens.sum())
        # CSR multi-range expand: positions lo_i..lo_i+len_i per slot
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        frontier = np.unique(key_of[np.repeat(starts[du], lens) + within])
    if alive.any():
        return None
    return sweeps_keys, sweeps_slots


def _assign(
    slots: np.ndarray, fps: np.ndarray, n_slots: int, peel
) -> np.ndarray:
    """Fill the table in reverse peel order. A key's slots are never
    written by any key peeled before it (else that slot couldn't have
    been count-1 at its own peel), and same-sweep keys share no written
    slots — so each reversed sweep assigns in bulk against the
    pre-sweep table: the gather at the key's own (still-zero) slot xors
    in 0, making fp == t[s0]^t[s1]^t[s2] hold for every key."""
    sweeps_keys, sweeps_slots = peel
    table = np.zeros(n_slots, np.uint8)
    for cand, chosen in zip(reversed(sweeps_keys), reversed(sweeps_slots)):
        table[chosen] = (
            fps[cand]
            ^ table[slots[cand, 0]]
            ^ table[slots[cand, 1]]
            ^ table[slots[cand, 2]]
        )
    return table


def build_xor_filter(keys, max_build: int = MAX_BUILD_KEYS) -> dict:
    """Construct an 8-bit xor filter over int64 keys via the standard
    peeling algorithm; retries with a fresh seed on the rare peel
    failure (probability ~ O(1/n) at capacity 1.23n). Returns
    {"seed", "seg_len", "table": np.uint8 array} — ~10 bits/key."""
    arr = np.unique(np.asarray(list(keys), dtype=np.int64).view(np.uint64))
    n = len(arr)
    if n > max_build:
        raise ValueError(
            f"xor-filter build side has {n} keys > max_build={max_build}; "
            "a filter-pushdown join needs a bounded build side — raise "
            "max_build only if the collected keys genuinely fit the driver"
        )
    if n == 0:
        return {"seed": 0, "seg_len": 1, "table": np.zeros(3, np.uint8)}
    seg_len = max(1, int(_SEG_FACTOR * n / 3) + 11)
    for seed in range(1, 64):
        h = _splitmix64(arr, seed)
        s0, s1, s2 = _slots(h, seg_len)
        slots = np.stack([s0, s1, s2], axis=1)  # n x 3
        peel = _peel(slots, 3 * seg_len)
        if peel is not None:
            break
    else:
        raise RuntimeError("xor-filter peeling failed for 63 seeds")
    table = _assign(slots, _fingerprints(h), 3 * seg_len, peel)
    return {"seed": seed, "seg_len": seg_len, "table": table}


def xor_filter_contains(filt: dict, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership: no false negatives, FP ~ 2^-8 per probe."""
    arr = np.asarray(keys, dtype=np.int64).view(np.uint64)
    h = _splitmix64(arr, filt["seed"])
    s0, s1, s2 = _slots(h, filt["seg_len"])
    t = filt["table"]
    return (t[s0] ^ t[s1] ^ t[s2]) == _fingerprints(h)


# ---------------------------------------------------------------------------
# Binary fuse filter (staged in round 14 for round 15's registration;
# same contract as the xor filter above, smaller table).
#
# Graf & Lemire, "Binary Fuse Filters: Fast and Smaller Than Xor
# Filters" (JEA 2022): same three-slot XOR membership equation, but the
# three slots land in three CONSECUTIVE segments of a segmented array
# chosen from the key's hash, which makes the random 3-uniform
# hypergraph "fuse-shaped" and peelable at a ~0.879 load factor —
# ~9.1 bits/key at 100k keys (size factor shrinks toward 1.125 as n
# grows) vs the plain xor filter's ~9.84+, at the same ~0.39% FP.
# Parameters follow the paper's reference implementation
# (binaryfusefilter.h): segment_length = 2^floor(log3.33(n) + 2.25)
# capped at 2^18, size_factor = max(1.125, 0.875 + 0.25*ln(1e6)/ln(n)).
# ---------------------------------------------------------------------------


def _fuse_params(n: int) -> tuple[int, int, int]:
    """(segment_length, segment_count, array_length) for ``n`` keys."""
    import math

    if n <= 1:
        return 4, 1, 12
    seg_len = 1 << int(math.floor(math.log(n) / math.log(3.33) + 2.25))
    seg_len = max(4, min(seg_len, 1 << 18))
    size_factor = max(1.125, 0.875 + 0.25 * math.log(1e6) / math.log(n))
    capacity = int(round(n * size_factor))
    init_segment_count = -(-capacity // seg_len) - 2
    array_length = (init_segment_count + 2) * seg_len
    segment_count = max(1, -(-array_length // seg_len) - 2)
    array_length = (segment_count + 2) * seg_len
    return seg_len, segment_count, array_length


def _fuse_slots(
    h: np.ndarray, seg_len: int, segment_count: int
) -> np.ndarray:
    """n x 3 slot indexes: a start segment from the high bits, then one
    slot in each of three consecutive segments (the paper's layout)."""
    seg_count_len = np.uint64(segment_count * seg_len)
    # multiply-shift range reduction: high 64 bits of h * seg_count_len
    lo = (h & np.uint64(0xFFFFFFFF)) * seg_count_len
    hi = (h >> np.uint64(32)) * seg_count_len
    h0 = ((hi + (lo >> np.uint64(32))) >> np.uint64(32)).astype(np.int64)
    mask = np.int64(seg_len - 1)  # seg_len is a power of two
    # the within-segment offset is XORed, not added: xor only flips bits
    # below the segment size, so each slot stays inside its seg_len-
    # aligned block and h2 < (segment_count + 2) * seg_len always
    h1 = (h0 + seg_len) ^ ((h >> np.uint64(18)).astype(np.int64) & mask)
    h2 = (h0 + 2 * seg_len) ^ (h.astype(np.int64) & mask)
    return np.stack([h0, h1, h2], axis=1)


def build_fuse_filter(keys, max_build: int = MAX_BUILD_KEYS) -> dict:
    """8-bit 3-wise binary fuse filter via the same vectorized sweep
    peel as :func:`build_xor_filter` (fuse graphs are peelable by
    construction at these parameters; a rare failure retries with a
    fresh seed). Returns {"kind", "seed", "seg_len", "segment_count",
    "table"}."""
    arr = np.unique(np.asarray(list(keys), dtype=np.int64).view(np.uint64))
    n = len(arr)
    if n > max_build:
        raise ValueError(
            f"fuse-filter build side has {n} keys > max_build={max_build}; "
            "a filter-pushdown join needs a bounded build side"
        )
    seg_len, segment_count, array_length = _fuse_params(n)
    if n == 0:
        return {
            "kind": "fuse8",
            "seed": 0,
            "seg_len": seg_len,
            "segment_count": segment_count,
            "table": np.zeros(array_length, np.uint8),
        }
    for seed in range(1, 64):
        h = _splitmix64(arr, seed)
        slots = _fuse_slots(h, seg_len, segment_count)
        peel = _peel(slots, array_length)
        if peel is not None:
            break
    else:
        raise RuntimeError("fuse-filter peeling failed for 63 seeds")
    table = _assign(slots, _fingerprints(h), array_length, peel)
    return {
        "kind": "fuse8",
        "seed": seed,
        "seg_len": seg_len,
        "segment_count": segment_count,
        "table": table,
    }


def fuse_filter_contains(filt: dict, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership: no false negatives, FP ~ 2^-8 per probe."""
    arr = np.asarray(keys, dtype=np.int64).view(np.uint64)
    h = _splitmix64(arr, filt["seed"])
    slots = _fuse_slots(h, filt["seg_len"], filt["segment_count"])
    t = filt["table"]
    return (
        t[slots[:, 0]] ^ t[slots[:, 1]] ^ t[slots[:, 2]]
    ) == _fingerprints(h)


_INTEGRALS = {"tinyint", "smallint", "int", "bigint"}


def _hash_type(
    fact: DataFrame,
    fact_key: str,
    build: DataFrame,
    build_key: str,
    family: str,
) -> str:
    """The type both key columns are cast to BEFORE hashing. xxhash64 is
    type-sensitive (it hashes 4 bytes for an INT, 8 for a BIGINT), so
    hashing un-normalized keys makes the pre-filter silently drop true
    matches that the coercing verify join would keep (review r13, third
    pass). Identical types hash as-is; integral widths widen to bigint
    (lossless, matches join coercion); any other mixed pair raises —
    the caller must cast explicitly rather than get quiet emptiness."""
    ft = fact.schema[fact_key].dataType.simpleString()
    bt = build.schema[build_key].dataType.simpleString()
    if ft == bt:
        return ft
    if ft in _INTEGRALS and bt in _INTEGRALS:
        return "bigint"
    raise TypeError(
        f"{family} join keys have incompatible types ({fact_key}: {ft}, "
        f"{build_key}: {bt}); cast them to a common type explicitly"
    )


def _filtered_semi_join(
    fact: DataFrame,
    fact_key: str,
    build: DataFrame,
    build_key: str,
    build_filter,
    contains,
    max_build: int,
    family: str,
) -> DataFrame:
    """Shared two-phase filter-pushdown semi-join: collect the build
    side's distinct key hashes (bounded), build a succinct broadcast
    filter driver-side, drop non-matching fact rows at the scan site
    with an Arrow-batched numpy probe, then remove the ~0.4% false
    positives with an exact semi-join — the filter can never change the
    answer, only the shuffled volume."""
    import uuid

    from ..cache import track

    key_t = _hash_type(fact, fact_key, build, build_key, family)
    tag = uuid.uuid4().hex[:8]  # collision-proof internal column names
    hcol, bcol = f"__xh_{tag}", f"__bk_{tag}"
    # ONE distinct build-key projection feeds both the driver-side
    # filter build and the verify join (persisted: it is bounded by
    # max_build and would otherwise scan+shuffle the build side twice)
    bkeys_df = track(
        build.select(F.col(build_key).cast(key_t).alias(bcol))
        .distinct()
        .persist()
    )
    # bound the collect itself — a guard AFTER a full collect cannot
    # prevent the driver OOM it exists for
    hashes = bkeys_df.select(F.xxhash64(bcol)).limit(max_build + 1).collect()
    if len(hashes) > max_build:
        raise ValueError(
            f"{family} build side exceeds max_build={max_build} distinct "
            "keys; a filter-pushdown join needs a bounded build side"
        )
    filt = build_filter([r[0] for r in hashes], max_build=max_build)

    @pandas_udf("boolean")
    def maybe_member(h: pd.Series) -> pd.Series:
        return pd.Series(contains(filt, h.to_numpy(dtype=np.int64)))

    pre = (
        fact.withColumn(hcol, F.xxhash64(F.col(fact_key).cast(key_t)))
        .filter(maybe_member(F.col(hcol)))
        .drop(hcol)
    )
    # exact verify: false positives (~0.4%) fall out here; the filter
    # can only ever REDUCE the rows entering this shuffle
    return pre.join(
        bkeys_df,
        pre[fact_key].cast(key_t) == F.col(bcol),
        "left_semi",
    )


def xor_filter_join(
    fact: DataFrame,
    fact_key: str,
    build: DataFrame,
    build_key: str,
    max_build: int = MAX_BUILD_KEYS,
) -> DataFrame:
    """Semi-join ``fact`` to ``build`` with an xor-filter pre-filter:
    exact result (identical to fact.join(build, ..., "left_semi")), but
    non-matching fact rows drop at the scan site before the shuffle."""
    return _filtered_semi_join(
        fact,
        fact_key,
        build,
        build_key,
        build_xor_filter,
        xor_filter_contains,
        max_build,
        "xor-filter",
    )


def fuse_filter_join(
    fact: DataFrame,
    fact_key: str,
    build: DataFrame,
    build_key: str,
    max_build: int = MAX_BUILD_KEYS,
) -> DataFrame:
    """:func:`xor_filter_join` with the smaller binary fuse filter —
    identical exactness contract (the verify semi-join removes every
    false positive), ~0.7 fewer bits/key broadcast."""
    return _filtered_semi_join(
        fact,
        fact_key,
        build,
        build_key,
        build_fuse_filter,
        fuse_filter_contains,
        max_build,
        "fuse-filter",
    )


# registered operator (round 14; the pair below was staged + validated
# as tests/test_filters.py::Q164_ORACLE in round 13). The oracle is the
# PLAIN semi-join: the xor filter provably cannot change the answer —
# only the volume entering the verify join's shuffle.
@register(
    "q164_xor_filter_join",
    oracle="""
    SELECT * FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000
    )
    """,
    doc="Semi-join of lineitem to high-balance suppliers through a "
    "broadcast 8-bit xor filter (Graf-Lemire; ~9.84 bits/key at ~0.39% "
    "FP vs Bloom's ~14.4): non-matching fact rows drop at the scan site "
    "via an Arrow-batched numpy probe BEFORE the shuffle, then the "
    "exact semi-join removes false positives on the survivors.",
)
def q164_xor_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    return xor_filter_join(li, "l_suppkey", sup, "s_suppkey")


# registered operator (round 15; the pair below was staged + validated
# as tests/test_filters.py::Q165_ORACLE in round 14). Same contract as
# q164 — oracle = the PLAIN semi-join — on a different fact/build pair
# so the two succinct-filter gates don't share a cached scan.
@register(
    "q165_fuse_filter_join",
    oracle="""
    SELECT * FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_acctbal > 7000
    )
    """,
    doc="Semi-join of orders to high-balance customers through a "
    "broadcast 8-bit binary fuse filter (Graf-Lemire JEA 2022; ~9.1 "
    "bits/key at 100k keys vs the xor filter's ~9.84+, same ~0.39% FP "
    "and the same three-XOR membership probe): non-matching fact rows "
    "drop at the scan site via an Arrow-batched numpy probe BEFORE the "
    "shuffle, then the exact semi-join removes false positives on the "
    "survivors — the filter can never change the answer.",
)
def q165_fuse_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7000)
    return fuse_filter_join(o, "o_custkey", c, "c_custkey")
