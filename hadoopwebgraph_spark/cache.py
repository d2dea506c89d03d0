"""Session-retained cache registry (the _materialize contract, r12).

Several operators persist a shared subtree that multiple consumers of
the RETURNED DataFrame still reference — releasing it on function exit
would defeat the point, so the persists deliberately outlive the call
(bounded inputs; MEMORY_AND_DISK evicts under pressure). This module
gives every such site one lever: ``track()`` at the persist site,
``release_all()`` when a long-lived session is done with the operators.

Tracking is deduplicated by (session, ``DataFrame.semanticHash()``) —
Spark's cache manager already keys entries by logical plan, so re-running
the same query must not grow the registry (a prior version appended per
call). The session id is part of the key (review r13, second pass):
semanticHash canonicalizes across sessions, so a dead session's entry
would otherwise SHADOW a new session's identical-plan persist — the new
cache would then never be tracked, and release_all would unpersist only
the dead one. The id is stable for as long as the entry exists because
the tracked DataFrame itself pins its session."""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: dict[tuple, DataFrame] = {}
_RELEASE_HOOKS: list = []


def _key(df: DataFrame) -> tuple:
    return (id(df.sparkSession), df.semanticHash())


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for session-level release;
    returns it unchanged. Same-plan same-session re-registrations are
    no-ops — BUT note Python-DataSource plans never compare equal (each
    read creates a fresh plan identity; measured r12: two identical
    bvgraph reads = two semanticHashes AND two cache-manager entries),
    so DS-rooted shares must be memoized by the caller
    (queries/graph._materialize's key=) rather than relying on this
    dedup."""
    _TRACKED.setdefault(_key(df), df)
    return df


def untrack(df: DataFrame, blocking: bool = False) -> None:
    """Unpersist a tracked DataFrame AND drop its registry entry — the
    pair must move together (review r13): a bare unpersist leaves the
    entry behind, so a later release_all re-unpersists the dead entry
    and counts it as a drop, re-inflating the count the ADVICE r12 fix
    made accurate. Non-blocking by default: callers sit on read hot
    paths (the snapshot refresh) where waiting for block eviction buys
    nothing."""
    _TRACKED.pop(_key(df), None)
    df.unpersist(blocking=blocking)


def register_release_hook(fn) -> None:
    """Run ``fn()`` after every release_all — for caller-side memo maps
    that hold references to the unpersisted DataFrames."""
    _RELEASE_HOOKS.append(fn)


def release_all(blocking: bool = True) -> int:
    """Unpersist every tracked subtree; returns how many were dropped.
    DataFrames previously returned by the operators remain valid — they
    recompute instead of hitting the cache.

    Exception-safe by construction (review r12): a failing unpersist
    (e.g. an entry whose SparkSession is already stopped — _TRACKED is
    module-level and outlives sessions) is swallowed, the remaining
    entries still release, and the hooks ALWAYS run — otherwise
    graph._MEMO would keep serving DataFrames whose caches were just
    dropped, silently re-decoding per consumer forever after. The
    return value counts only SUCCESSFUL unpersists (ADVICE r12: a
    swallowed failure must not inflate the count)."""
    n = 0
    try:
        while _TRACKED:
            _, df = _TRACKED.popitem()
            try:
                df.unpersist(blocking=blocking)
                n += 1
            except Exception:  # noqa: BLE001 — dead session/context
                pass
    finally:
        for fn in _RELEASE_HOOKS:
            fn()
    return n
