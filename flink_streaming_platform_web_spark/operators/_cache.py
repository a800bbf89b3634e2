"""Shared-upstream memoization for the operator inventory.

Several inventory entries are stages of one pipeline (dd02 pairs feed
dd06 clustering; dd05 signatures feed dd08 banding; the IVF centroids
feed ann04/ann05/dd07). Run standalone, each entry would recompute its
upstream from the raw corpus — at scale that is re-reading 100 TB per
derived product. The production shape is compute-once-reuse (a
persisted DataFrame within a session; a materialized table across
jobs), which this memo implements for the in-session case: first
caller builds + persists, later callers reuse the same lineage.

Keyed by (session id, sf_dir, product name); `clear` drops the cache
(tests use it to measure cold paths).
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from itertools import count as _count
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

_DF_CACHE: dict[tuple, DataFrame] = {}
_OBJ_CACHE: dict[tuple, Any] = {}
#: id(spark) → weakref to the session, so eviction can tell a live
#: clone from a session object that has been garbage-collected
_SESSION_REFS: dict[int, weakref.ref] = {}
#: id(spark) → last-touch tick; bounds same-app session churn
_SESSION_LRU: dict[int, int] = {}
_TICK = _count()
#: max distinct same-app sessions allowed to hold memo entries. A
#: driver that cycles spark.newSession() within one long-lived
#: SparkContext never triggers the app-id sweep, and the cached
#: DataFrames themselves strongly pin their (dead-to-the-user)
#: session objects, so GC/weakref alone can't reclaim them — the LRU
#: cap is the hard bound (ADVICE r04). Evicting a still-live clone
#: is safe: the memo just rebuilds on next use.
_MAX_SESSIONS = 4


def _session_key(spark: SparkSession) -> tuple:
    """id(spark) alone can be REUSED by a new session after the old
    one is garbage-collected (CPython recycles addresses), which would
    serve persisted DataFrames bound to a dead SparkContext; the
    applicationId pins the key to the live context."""
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # stopped context: never match a cache entry
        app_id = object()
    try:
        _SESSION_REFS[id(spark)] = weakref.ref(spark)
    except TypeError:
        pass
    _SESSION_LRU[id(spark)] = next(_TICK)
    return (id(spark), app_id)


def _evict_dead_sessions(live: tuple) -> None:
    """Stale keys never MATCH (the app-id pins them to a dead
    context) but without eviction they'd accumulate forever in a
    driver that cycles SparkSessions — each one holding plan objects
    and centroid matrices for a context that is gone. Sweep on insert:
    evict only keys whose APP id differs from the live context —
    cloned sessions (spark.newSession()) share the app under a
    different id(spark), and evicting on the session id made two live
    clones unpersist each other's memoized upstreams on every insert
    (ADVICE r03). The id(spark) component stays in the KEY only to
    keep per-session entries distinct."""
    def _drop(cache: dict, keys: list) -> None:
        for key in keys:
            val = cache.pop(key)
            if isinstance(val, DataFrame):
                try:
                    val.unpersist()
                except Exception:
                    pass

    for cache in (_DF_CACHE, _OBJ_CACHE):
        _drop(cache, [k for k in cache if k[1] != live[1]])
        # same-app keys whose session object is gone (weakref dead —
        # catches _OBJ_CACHE entries and any DF already unpersisted)
        _drop(
            cache,
            [
                k
                for k in cache
                if k[0] != live[0]
                and (r := _SESSION_REFS.get(k[0])) is not None
                and r() is None
            ],
        )
    # cached DataFrames strongly pin their session, so a cycled
    # session's weakref may never die — enforce the LRU cap on
    # distinct same-app session ids as the hard bound
    sids = {k[0] for c in (_DF_CACHE, _OBJ_CACHE) for k in c}
    # prune bookkeeping for sessions with no cache entries left (the
    # app-id / weakref sweeps above drop keys without touching these
    # dicts — they'd grow forever in a session-churning driver,
    # code-review r5)
    for sid in list(_SESSION_REFS):
        if sid not in sids and sid != live[0]:
            _SESSION_REFS.pop(sid, None)
            _SESSION_LRU.pop(sid, None)
    sids.discard(live[0])
    if len(sids) + 1 > _MAX_SESSIONS:
        stale = sorted(sids, key=lambda s: _SESSION_LRU.get(s, -1))
        for sid in stale[: len(sids) + 1 - _MAX_SESSIONS]:
            for cache in (_DF_CACHE, _OBJ_CACHE):
                _drop(cache, [k for k in cache if k[0] == sid])
            _SESSION_REFS.pop(sid, None)
            _SESSION_LRU.pop(sid, None)


def memo_df(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder: Callable[[], DataFrame],
) -> DataFrame:
    """Build-once persisted DataFrame per (session, sf_dir, name)."""
    live = _session_key(spark)
    key = (*live, sf_dir, name)
    if key not in _DF_CACHE:
        _evict_dead_sessions(live)
        _DF_CACHE[key] = builder().persist(StorageLevel.MEMORY_AND_DISK)
    return _DF_CACHE[key]


def memo_obj(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder: Callable[[], Any],
) -> Any:
    """Build-once driver-side object (e.g. the tiny centroid matrix)."""
    live = _session_key(spark)
    key = (*live, sf_dir, name)
    if key not in _OBJ_CACHE:
        _evict_dead_sessions(live)
        _OBJ_CACHE[key] = builder()
    return _OBJ_CACHE[key]


def clear() -> None:
    for df in _DF_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _DF_CACHE.clear()
    _OBJ_CACHE.clear()
    _SESSION_REFS.clear()
    _SESSION_LRU.clear()
