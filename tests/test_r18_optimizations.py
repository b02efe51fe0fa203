"""Focused equivalence tests for the r18 optimization internals.

Each test pins a rewrite this round relies on: the dedup-inside-
bottom-k path (kmv_overlap's production shape), the bottom-k
pre-truncation law the kmv_distinct docstring offers as the skew
escape hatch, the sketch-derived group spine, and the byte-suffix
conf parse for the store-read coalesce.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


@pytest.fixture(scope="module")
def hashes(spark):
    """A skewed multiset of (grp, value) rows: duplicates within and
    across partitions, a null value, one group with < k values."""
    vals = (
        [("a", f"v{i % 37}") for i in range(400)]
        + [("b", f"w{i % 211}") for i in range(400)]
        + [("b", None)] * 3
        + [("c", "only")] * 5
    )
    return spark.createDataFrame(vals, "grp string, v string").repartition(7)


def test_bottom_k_dedup_equals_distinct_then_bottom_k(spark, hashes):
    from rootstock_collective_state_sync_spark.operators.sketches import (
        kmv_bottom_k,
        kmv_hashes,
    )

    raw = kmv_hashes(hashes, "grp", "v", distinct=False)
    dedup = kmv_bottom_k(raw, 16, dedup=True)
    classic = kmv_bottom_k(kmv_hashes(hashes, "grp", "v"), 16)
    assert _rows(dedup) == _rows(classic)
    # exactly one row may survive a null-hash run
    nulls = dedup.filter(F.col("h").isNull()).groupBy("grp").count()
    assert _rows(nulls) == [("b", 1)]


def test_bottom_k_pretruncation_preserves_estimate(spark, hashes):
    """The KMV merge law the kmv_distinct docstring cites: estimating
    from the bottom-k-truncated table equals estimating from the full
    distinct-hash table (the skew escape hatch is value-neutral)."""
    from rootstock_collective_state_sync_spark.operators.sketches import (
        kmv_bottom_k,
        kmv_estimate,
        kmv_hashes,
    )

    h = kmv_hashes(hashes, "grp", "v")
    full = kmv_estimate(h, 16).select("grp", "kmv_est")
    trunc = kmv_estimate(kmv_bottom_k(h, 16), 16).select("grp", "kmv_est")
    assert _rows(full) == _rows(trunc)


def test_kmv_overlap_group_spine_complete(spark, hashes):
    """The group spine now comes from the persisted sketch: every
    input group (including the all-dup and below-k ones) must still
    appear in the pair census."""
    from rootstock_collective_state_sync_spark.caching import release_tracked
    from rootstock_collective_state_sync_spark.operators.sketches import (
        kmv_overlap,
    )

    try:
        out = kmv_overlap(hashes, "grp", "v", k=16)
        pairs = {(r[0], r[1]) for r in out.collect()}
        assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}
    finally:
        release_tracked()


def test_parse_bytes_conf_suffixes():
    from rootstock_collective_state_sync_spark.sinks.table import (
        _parse_bytes_conf,
    )

    assert _parse_bytes_conf("134217728") == 134217728
    assert _parse_bytes_conf("128m") == 128 * 1024**2
    assert _parse_bytes_conf("128mb") == 128 * 1024**2
    assert _parse_bytes_conf("1g") == 1024**3
    assert _parse_bytes_conf("64k") == 64 * 1024
    assert _parse_bytes_conf(" 2G ") == 2 * 1024**3


def test_assortativity_pinned_edges_value_identical(spark):
    """_assortativity_over pins its edge input; the census over a
    pinned frame must equal the census over the raw frame."""
    from rootstock_collective_state_sync_spark.caching import release_tracked
    from rootstock_collective_state_sync_spark.plans.quality import (
        _assortativity_over,
    )

    edges = [(i, (i * 7 + 3) % 23) for i in range(200) if i != (i * 7 + 3) % 23]
    sym = edges + [(d, s) for s, d in edges]
    e = spark.createDataFrame(sorted(set(sym)), "src long, dst long")
    try:
        out = _rows(_assortativity_over(e))
    finally:
        release_tracked()
    # recompute the statistic naively in python
    from collections import Counter

    es = sorted(set(sym))
    deg = Counter(s for s, _ in es)
    m = len(es)
    a = sum(deg[s] * deg[d] for s, d in es)
    b = sum(deg[s] + deg[d] for s, d in es)
    c = sum(deg[s] ** 2 + deg[d] ** 2 for s, d in es)
    num = 4 * m * a - b * b
    den = 2 * m * c - b * b
    r_e6 = 0 if den == 0 else (1 if num >= 0 else -1) * (abs(num) * 10**6 // den)
    (row,) = out
    assert row[0] == len(deg)  # n_nodes
    assert row[1] == m // 2  # n_edges
    assert row[-1] == r_e6
