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
        # peel: repeatedly remove keys that own a slot no other key uses.
        # Whole sweeps vectorize because a count-1 slot is owned by
        # exactly ONE alive key — candidates within a sweep can never
        # contend for a slot or strip each other's uniqueness, so the
        # whole frontier removes in bulk (per-key Python loop was the
        # r13 ADVICE scale item: minutes at the 5M-key cap).
        counts = np.bincount(slots.ravel(), minlength=3 * seg_len)
        act = np.arange(n)  # alive key indexes
        sweeps_keys: list[np.ndarray] = []
        sweeps_slots: list[np.ndarray] = []
        while len(act):
            own = counts[slots[act]] == 1  # |act| x 3
            hit = own.any(axis=1)
            if not hit.any():
                break
            cand = act[hit]
            # first uniquely-owned slot per candidate
            chosen = slots[cand, own[hit].argmax(axis=1)]
            sweeps_keys.append(cand)
            sweeps_slots.append(chosen)
            np.subtract.at(counts, slots[cand].ravel(), 1)
            act = act[~hit]
        if len(act) == 0:
            break
    else:
        raise RuntimeError("xor-filter peeling failed for 63 seeds")
    table = np.zeros(3 * seg_len, np.uint8)
    fps = _fingerprints(h)
    # assign in reverse peel order. A key's slots are never written by
    # any key peeled before it (else that slot couldn't have been
    # count-1 at its own peel), and same-sweep keys share no written
    # slots — so each reversed sweep assigns in bulk against the
    # pre-sweep table: the gather at the key's own (still-zero) slot
    # xors in 0, making fp == t[s0]^t[s1]^t[s2] hold for every key.
    for cand, chosen in zip(reversed(sweeps_keys), reversed(sweeps_slots)):
        table[chosen] = (
            fps[cand]
            ^ table[slots[cand, 0]]
            ^ table[slots[cand, 1]]
            ^ table[slots[cand, 2]]
        )
    return {"seed": seed, "seg_len": seg_len, "table": table}


def xor_filter_contains(filt: dict, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership: no false negatives, FP ~ 2^-8 per probe."""
    arr = np.asarray(keys, dtype=np.int64).view(np.uint64)
    h = _splitmix64(arr, filt["seed"])
    s0, s1, s2 = _slots(h, filt["seg_len"])
    t = filt["table"]
    return (t[s0] ^ t[s1] ^ t[s2]) == _fingerprints(h)


_INTEGRALS = {"tinyint", "smallint", "int", "bigint"}


def _hash_type(fact: DataFrame, fact_key: str, build: DataFrame, build_key: str) -> str:
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
        f"xor_filter_join keys have incompatible types ({fact_key}: {ft}, "
        f"{build_key}: {bt}); cast them to a common type explicitly"
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
    import uuid

    from ..cache import track

    key_t = _hash_type(fact, fact_key, build, build_key)
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
            f"xor-filter build side exceeds max_build={max_build} distinct "
            "keys; a filter-pushdown join needs a bounded build side"
        )
    filt = build_xor_filter([r[0] for r in hashes], max_build=max_build)

    @pandas_udf("boolean")
    def maybe_member(h: pd.Series) -> pd.Series:
        return pd.Series(
            xor_filter_contains(filt, h.to_numpy(dtype=np.int64))
        )

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
