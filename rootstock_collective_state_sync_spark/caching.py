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

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_EAGER_ENABLED: bool = True


@contextmanager
def plan_only_builds() -> Iterator[None]:
    """Suppress eager materialization for the duration of the block.

    Query CONSTRUCTION normally runs the eager count() barrier for
    every multi-consumer persist (see :func:`tracked_persist`), so
    building a query is no longer side-effect-free. Plan inspection
    tooling (``tools/plan_audit.py``) builds all ~260 registry queries
    only to ``explain()`` them — under this context the persists are
    registered but NOT materialized, so builds run zero Spark jobs.
    Never use this around a build whose result will be executed: a
    lazy multi-consumer persist is the cache race this module exists
    to prevent."""
    global _EAGER_ENABLED
    prev = _EAGER_ENABLED
    _EAGER_ENABLED = False
    try:
        yield
    finally:
        _EAGER_ENABLED = prev


def tracked_persist(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist ``df`` and register it for :func:`release_tracked`.

    ``eager`` (default) MATERIALIZES the cache with a ``count()``
    before returning. A lazy persist consumed by MULTIPLE subtrees of
    the same action is a cache race: each subtree compiles against
    the not-yet-materialized relation and recomputes the full child
    chain (plus the cache fill). Invisible at sf0.1 (~0.3 s of
    duplicated work), dominant at sf1 — the r16 sweep measured the
    MinHash-LSH candidate stage at 36 s cold vs 11 s with the shared
    index materialized first (capped-index chain recomputed once per
    consumer), and the celled-graph / assoc_rules seats carried the
    same signature. At 100 TB "build the shared intermediate once,
    then fan out" is the only viable shape; the eager count IS that
    barrier. Pass ``eager=False`` only for a frame consumed by a
    single downstream action, where the extra job is pure overhead.

    The frame is registered BEFORE the materializing count so a
    failed count (OOM, bad input) still leaves the persist releasable
    by :func:`release_tracked` (r16 advice)."""
    df.persist()
    _TRACKED.append(df)
    if eager and _EAGER_ENABLED:
        df.count()
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
