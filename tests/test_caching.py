"""Bounded persist lifetimes (r09 advice) + eager materialization
barrier (r16): operators that persist a multi-consumer intermediate
register it with ``caching.tracked_persist``, which MATERIALIZES the
cache at build time (the build-once-then-fan-out barrier that killed
the sf1 multi-consumer cache race). ``release_tracked()`` drops every
pinned block, and the registry's ``queries()`` accessor auto-releases
the previous query's caches — a long-lived session never accumulates
cached corpora.

Because builds are now eager, constructing the NEXT query pins ITS
persists before any action, so cache-release is asserted by frame
IDENTITY (the previous query's tracked frames are unpersisted), not
by a cross-query ``getPersistentRDDs()`` count — that count is not
monotone across builds (r16 verdict item 1).
"""

from __future__ import annotations

import pytest

from rootstock_collective_state_sync_spark.caching import (
    _TRACKED,
    plan_only_builds,
    release_tracked,
    tracked_persist,
)

SF = "/root/testdata/sf0.001"


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _storage_infos(spark):
    """(cached_partitions, total_partitions) per persisted RDD that has
    any cached data; persisted-but-never-filled RDDs report 0 cached."""
    return [
        (i.numCachedPartitions(), i.numPartitions())
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]


def test_release_tracked_unpins_semantic_dedup(spark):
    from rootstock_collective_state_sync_spark.plans.registry import SPECS

    spark.catalog.clearCache()
    release_tracked()
    assert _n_persistent_rdds(spark) == 0
    SPECS["semantic_dedup"].fn(spark, SF).count()
    assert len(_TRACKED) > 0
    assert _n_persistent_rdds(spark) > 0
    assert release_tracked() > 0
    assert len(_TRACKED) == 0
    assert _n_persistent_rdds(spark) == 0


def test_queries_accessor_releases_previous_caches(spark):
    from rootstock_collective_state_sync_spark.plans.registry import queries

    spark.catalog.clearCache()
    release_tracked()
    qs = queries()
    qs["semantic_dedup"](spark, SF).count()
    prev = list(_TRACKED)
    assert prev and all(f.is_cached for f in prev)
    # building the NEXT query releases the PREVIOUS query's frames —
    # by identity: every previously tracked frame is unpersisted and
    # no longer tracked (the new query's own eager persists are pinned
    # at build time, so RDD counts may legitimately grow here)
    df = qs["dedup_funnel"](spark, SF)
    assert all(not f.is_cached for f in prev)
    assert not any(f is t for f in prev for t in _TRACKED)
    df.count()
    qs["camel_case"](spark, SF).count()  # no persists of its own
    assert _n_persistent_rdds(spark) == 0
    release_tracked()


def test_eager_build_materializes_persists_at_build_time(spark):
    """Constructing a multi-consumer query runs the count() barrier:
    every tracked persist is FULLY cached before the first consuming
    action, so N downstream subtrees hit the cache instead of each
    recomputing the child chain (the r16 sf1 root cause)."""
    from rootstock_collective_state_sync_spark.plans.registry import queries

    spark.catalog.clearCache()
    release_tracked()
    qs = queries()
    df = qs["dedup_funnel"](spark, SF)  # build only — no action yet
    assert len(_TRACKED) > 0
    filled = [s for s in _storage_infos(spark) if s[0] > 0]
    assert len(filled) >= len(_TRACKED)
    assert all(cached == total for cached, total in filled)
    df.count()  # consumers read the prefilled cache
    release_tracked()
    assert _n_persistent_rdds(spark) == 0


def test_plan_only_builds_skips_materialization(spark):
    """Plan-inspection builds (tools/plan_audit.py) must stay
    side-effect-light: under ``plan_only_builds()`` the persists are
    registered but never filled — no eager count() jobs."""
    from rootstock_collective_state_sync_spark.plans.registry import SPECS

    spark.catalog.clearCache()
    release_tracked()
    with plan_only_builds():
        df = SPECS["dedup_funnel"].fn(spark, SF)
        df.explain()  # the plan-audit use case
    assert len(_TRACKED) > 0  # registered, releasable ...
    assert all(c == 0 for c, _ in _storage_infos(spark))  # ... not filled
    release_tracked()
    assert _n_persistent_rdds(spark) == 0


def test_failed_materialization_still_released(spark):
    """A count() that raises must not leak the persist: the frame is
    registered BEFORE the eager count, so release_tracked() still
    drops it (r16 advice)."""
    from pyspark.sql import functions as F

    spark.catalog.clearCache()
    release_tracked()
    bad = spark.range(2).select(F.raise_error(F.lit("boom")).alias("x"))
    with pytest.raises(Exception, match="boom"):
        tracked_persist(bad)
    assert len(_TRACKED) == 1  # registered despite the failed fill
    assert release_tracked() == 1
    assert _n_persistent_rdds(spark) == 0
