"""Lifecycle for query-private caches.

Several operators persist an intermediate frame that feeds two branches
of the SAME query plan (a tokenize scan reused by counts + scoring, an
LSH index reused by bands, a top-V cut reused by join + tail mass).
``DataFrame.persist`` has no scope: once the query is collected the
cache sits in executor memory until the session dies.  Harmless for a
one-shot job, but a long-lived session running many queries (the bench
loop, a notebook, a query service) accumulates dead caches until
eviction pressure hurts real workloads.

``persist_tracked`` is a drop-in ``persist()`` that records the frame in
a session-wide weak registry; ``release_caches()`` unpersists everything
still tracked — call it between queries (bench.py and
tests/oracle_harness.py do).  Weak references keep the registry from
pinning frames the caller has already dropped.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

_TRACKED: "weakref.WeakSet[DataFrame]" = weakref.WeakSet()


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` plus registration for bulk release."""
    df.persist()
    _TRACKED.add(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame (non-blocking); returns the count.
    Safe to call at any time — a released cache only costs recomputation
    if the same plan object is executed again."""
    n = 0
    for df in list(_TRACKED):
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return n
