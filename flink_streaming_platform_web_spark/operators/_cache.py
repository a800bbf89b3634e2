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

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

_DF_CACHE: dict[tuple, DataFrame] = {}
_OBJ_CACHE: dict[tuple, Any] = {}


def _session_key(spark: SparkSession) -> tuple:
    """id(spark) alone can be REUSED by a new session after the old
    one is garbage-collected (CPython recycles addresses), which would
    serve persisted DataFrames bound to a dead SparkContext; the
    applicationId pins the key to the live context."""
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # stopped context: never match a cache entry
        app_id = object()
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
    for cache in (_DF_CACHE, _OBJ_CACHE):
        for key in [k for k in cache if k[1] != live[1]]:
            val = cache.pop(key)
            if isinstance(val, DataFrame):
                try:
                    val.unpersist()
                except Exception:
                    pass


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
