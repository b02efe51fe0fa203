"""Tracked persist: bounded cache lifetimes for self-join operators.

Several operators persist an intermediate that feeds both sides of a
self-join (`semantic_dedup`'s cell-assigned corpus, `dedup_funnel`'s
shared shingle index, ...). The persist is load-bearing — without it
the corpus is re-scanned and re-Arrow-staged once per consumer — but
the returned DataFrame is lazy, so the operator itself cannot
unpersist without losing the benefit. Left alone, a long-lived
session pins one cached corpus per invocation (r09 advice).

Contract: operators register such frames via :func:`tracked_persist`;
callers call :func:`release_tracked` once the result is materialized
(or before building the next query — the registry's ``queries()``
accessor does this automatically, so a driver window holds at most
one query's caches). Releasing early is always safe: unpersist only
drops the cache, the lazy plan recomputes if re-collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_tracked`."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame; returns how many were released.
    Safe to call at any time (lazy plans recompute if re-collected)."""
    n = len(_TRACKED)
    for df in _TRACKED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return n
