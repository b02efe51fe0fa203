"""Bounded persist lifetimes (r09 advice): operators that persist a
self-join intermediate register it with ``caching.tracked_persist``;
``release_tracked()`` drops every pinned block, and the registry's
``queries()`` accessor auto-releases the previous query's caches —
a long-lived session never accumulates cached corpora."""

from __future__ import annotations

from rootstock_collective_state_sync_spark.caching import (
    _TRACKED,
    release_tracked,
)

SF = "/root/testdata/sf0.001"


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


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
    pinned_after_first = _n_persistent_rdds(spark)
    assert pinned_after_first > 0
    # building the NEXT query releases the previous one's caches
    df = qs["dedup_funnel"](spark, SF)
    assert _n_persistent_rdds(spark) <= pinned_after_first
    before = _n_persistent_rdds(spark)
    df.count()
    qs["camel_case"](spark, SF).count()  # no persists of its own
    assert _n_persistent_rdds(spark) == 0
    release_tracked()
    assert before is not None  # silence lint; invariants asserted above
