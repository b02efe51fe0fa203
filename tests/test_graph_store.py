"""X-G9 graph edge store: build-once semantics, crash fallbacks,
staleness keying (r13 verdict item 1).

Value identity of the ``*_from_edges`` twins vs their rebuild
originals is covered by the shared DuckDB oracles in
``tests/test_conformance.py`` (the twins register the ORIGINALS'
composed replays verbatim); this module pins the store mechanics the
oracles cannot see.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(autouse=True)
def _fresh_store(monkeypatch, tmp_path):
    from rootstock_collective_state_sync_spark.plans import graph_store

    monkeypatch.setenv("SPARK_GRAFT_WORKDIR", str(tmp_path / "work"))
    graph_store.reset_cache()
    yield
    graph_store.reset_cache()


def _store_dirs(tmp_path) -> list[Path]:
    root = tmp_path / "work" / "graph_edges"
    return sorted(p for p in root.iterdir() if p.is_dir()) if root.exists() else []


def test_build_once_then_read(spark, tmp_path, monkeypatch):
    """The edge build runs exactly once per (corpus, k, nprobe):
    repeat calls — including from a fresh process (simulated by
    clearing the handle cache) — read the committed snapshot."""
    from rootstock_collective_state_sync_spark.operators import graph as G
    from rootstock_collective_state_sync_spark.plans import graph_store

    calls = {"n": 0}
    real = G.knn_edges_celled

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(G, "knn_edges_celled", counting)

    e1 = graph_store.graph_edges(spark, SF_SMOKE, k=3, nprobe=4)
    n1 = e1.count()
    assert calls["n"] == 1
    assert n1 > 0

    # same process: handle cache, no rebuild
    e2 = graph_store.graph_edges(spark, SF_SMOKE, k=3, nprobe=4)
    assert e2.count() == n1
    assert calls["n"] == 1

    # "new process": handle cache cleared, store on disk answers
    graph_store.reset_cache()
    e3 = graph_store.graph_edges(spark, SF_SMOKE, k=3, nprobe=4)
    assert e3.count() == n1
    assert calls["n"] == 1

    dirs = _store_dirs(tmp_path)
    assert len(dirs) == 1
    from rootstock_collective_state_sync_spark.sinks.table import VersionedTable

    t = VersionedTable(spark, dirs[0])
    assert t.current_version() == 2  # create (v1) + one data commit (v2)
    assert t.manifest().meta["k"] == 3
    assert sorted(map(tuple, e1.collect())) == sorted(map(tuple, e3.collect()))


def test_stored_edges_equal_fresh_build(spark):
    from rootstock_collective_state_sync_spark.operators import graph as G
    from rootstock_collective_state_sync_spark.plans import graph_store
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    stored = graph_store.graph_edges(spark, SF_SMOKE, k=3, nprobe=4)
    fresh = G.knn_edges_celled(
        load_table(spark, SF_SMOKE, "embeddings"), k=3, num_cells="auto", nprobe=4
    )
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_distinct_geometry_keys_distinct_tables(spark, tmp_path):
    """k / nprobe are part of the table key: different geometry can
    never read another build's edges (the staleness-by-construction
    contract; a regenerated corpus moves mtime and re-keys the same
    way)."""
    from rootstock_collective_state_sync_spark.plans import graph_store

    e3 = graph_store.graph_edges(spark, SF_SMOKE, k=3, nprobe=4)
    e2 = graph_store.graph_edges(spark, SF_SMOKE, k=2, nprobe=4)
    assert len(_store_dirs(tmp_path)) == 2
    # k=2 graph is strictly sparser than k=3 on this corpus
    assert e2.count() < e3.count()


def test_storage_failure_falls_back_to_fresh_build(spark, monkeypatch):
    """An unwritable store root degrades to the per-query build —
    the cache is an optimization, never a correctness dependency."""
    from rootstock_collective_state_sync_spark.operators import graph as G
    from rootstock_collective_state_sync_spark.plans import graph_store
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    def boom():
        raise OSError("store root unavailable")

    monkeypatch.setattr(graph_store, "store_root", boom)
    e = graph_store.graph_edges(spark, SF_SMOKE, k=3, nprobe=4)
    fresh = G.knn_edges_celled(
        load_table(spark, SF_SMOKE, "embeddings"), k=3, num_cells="auto", nprobe=4
    )
    assert sorted(map(tuple, e.collect())) == sorted(map(tuple, fresh.collect()))


def test_crash_between_create_and_commit_recovers(spark, tmp_path):
    """A table left at empty v1 (creator crashed before the data
    commit) is detected and the data commit is re-run — readers never
    see the empty snapshot as the answer."""
    from rootstock_collective_state_sync_spark.plans import graph_store
    from rootstock_collective_state_sync_spark.sinks.table import VersionedTable

    # simulate the crash: create the table shell at the exact digest
    # path, commit nothing
    digest = graph_store._corpus_key(SF_SMOKE, 3, 4)
    path = graph_store.store_root() / digest
    VersionedTable(spark, path).create(
        graph_store._EDGE_SCHEMA, merge_keys=["src", "dst"], num_buckets=16
    )
    e = graph_store.graph_edges(spark, SF_SMOKE, k=3, nprobe=4)
    assert e.count() > 0
    assert VersionedTable(spark, path).current_version() == 2


def test_build_errors_propagate_not_swallowed(spark, monkeypatch, tmp_path):
    """r14 advisor item: a failure in the edge BUILD itself must
    raise — the old whole-function try/except silently re-ran the
    full build (doubling the dominant cost) and hid genuine bugs."""
    import pytest

    from rootstock_collective_state_sync_spark.plans import graph_store

    graph_store.reset_cache()
    monkeypatch.setenv("SPARK_GRAFT_WORKDIR", str(tmp_path))

    def broken_loader(*a, **k):
        raise RuntimeError("operator bug, not a cache miss")

    monkeypatch.setattr(
        "rootstock_collective_state_sync_spark.plans.tables.load_table", broken_loader
    )
    with pytest.raises(RuntimeError, match="operator bug"):
        graph_store.graph_edges(spark, SF_SMOKE, k=3, nprobe=4)


def test_commit_failure_returns_fresh_build(spark, monkeypatch, tmp_path):
    """A commit failure AFTER a successful build hands back the
    already-built edges (scoped storage try — no rebuild, no raise)."""
    from rootstock_collective_state_sync_spark.operators import graph as G
    from rootstock_collective_state_sync_spark.plans import graph_store
    from rootstock_collective_state_sync_spark.plans.tables import load_table
    from rootstock_collective_state_sync_spark.sinks import table as table_mod

    graph_store.reset_cache()
    monkeypatch.setenv("SPARK_GRAFT_WORKDIR", str(tmp_path))

    def no_commit(self, *a, **k):
        raise OSError("quota exceeded at commit time")

    monkeypatch.setattr(table_mod.VersionedTable, "overwrite", no_commit)
    e = graph_store.graph_edges(spark, SF_SMOKE, k=3, nprobe=4)
    fresh = G.knn_edges_celled(
        load_table(spark, SF_SMOKE, "embeddings"),
        k=3, num_cells="auto", nprobe=4,
    )
    assert sorted(map(tuple, e.collect())) == sorted(
        map(tuple, fresh.collect())
    )
