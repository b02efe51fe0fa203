"""X-E9: append-only commits + per-file column statistics + stats-
pruned reads on the VersionedTable (Delta-style data skipping).

The scale claim under test: on append-mostly, time-correlated tables
(block numbers, timestamps) a "recent window" read touches only the
tail files — asserted via ``df.inputFiles()``, not trusted from the
manifest math — while the result always equals a full-scan filter
(stats are a pruning hint, never a semantics change)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from rootstock_collective_state_sync_spark.sinks.table import VersionedTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("bn", T.LongType(), True),
        T.StructField("val", T.StringType(), True),
    ]
)


def _batch(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i, f"v{i}") for i in range(lo, hi)], SCHEMA
    )


def _make(spark, path, stats=True):
    t = VersionedTable(spark, path)
    t.create(
        SCHEMA,
        merge_keys=["id"],
        num_buckets=4,
        meta={"stats_cols": ["bn"]} if stats else None,
    )
    return t


def test_append_accumulates_and_prunes_tail(spark, tmp_path):
    t = _make(spark, tmp_path / "t")
    t.append(_batch(spark, 0, 100))
    t.append(_batch(spark, 100, 200))
    t.append(_batch(spark, 200, 300))
    assert t.read().count() == 300

    full = sorted(
        tuple(r) for r in t.read().filter("bn >= 250").collect()
    )
    pruned_df = t.read(where=[("bn", ">=", 250)])
    assert sorted(tuple(r) for r in pruned_df.collect()) == full
    # only the LAST append's files (<= num_buckets of 12 total) scan
    all_files = t.read().inputFiles()
    tail_files = pruned_df.inputFiles()
    assert len(all_files) == 12  # 3 appends x 4 buckets
    assert 0 < len(tail_files) <= 4

    head_df = t.read(where=[("bn", "<", 50)])
    assert head_df.count() == 50
    assert 0 < len(head_df.inputFiles()) <= 4

    # an equality probe outside every range scans NOTHING
    assert t.read(where=[("bn", "=", 999)]).count() == 0
    assert len(t.read(where=[("bn", "=", 999)]).inputFiles()) == 0

    # conjunction: middle window touches only the middle batch
    mid = t.read(where=[("bn", ">=", 120), ("bn", "<=", 180)])
    assert mid.count() == 61
    assert 0 < len(mid.inputFiles()) <= 4


def test_where_semantics_equal_full_scan_filter(spark, tmp_path):
    t = _make(spark, tmp_path / "t")
    t.append(_batch(spark, 0, 100))
    # NULL bn rows never satisfy the predicates and never break skips
    nulls = spark.createDataFrame([(1000, None, "x")], SCHEMA)
    t.append(nulls)
    for where, sql in (
        ([("bn", ">=", 90)], "bn >= 90"),
        ([("bn", "<", 10)], "bn < 10"),
        ([("bn", "=", 42)], "bn = 42"),
        ([("bn", ">", 99)], "bn > 99"),
        ([("bn", "<=", 0)], "bn <= 0"),
    ):
        got = sorted(tuple(r) for r in t.read(where=where).collect())
        want = sorted(
            tuple(r) for r in t.read().filter(sql).collect()
        )
        assert got == want, where


def test_analyze_backfills_stats(spark, tmp_path):
    t = _make(spark, tmp_path / "t", stats=False)
    t.overwrite(_batch(spark, 0, 100))
    # no stats -> conservative: predicate reads every file
    assert len(t.read(where=[("bn", "=", 999)]).inputFiles()) == 4
    v = t.analyze(["bn"])
    assert t.current_version() == v
    assert len(t.read(where=[("bn", "=", 999)]).inputFiles()) == 0
    # metadata-only: same data files, same rows
    assert t.read().count() == 100


def test_overwrite_recomputes_stats(spark, tmp_path):
    t = _make(spark, tmp_path / "t")
    t.append(_batch(spark, 0, 100))
    t.overwrite(_batch(spark, 500, 600))
    stats = t.manifest().meta["file_stats"]
    # only the live snapshot's files carry stats entries
    live = {f for fs in t.manifest().buckets.values() for f in fs}
    assert set(stats) == live
    assert t.read(where=[("bn", ">=", 550)]).count() == 50
    assert t.read(where=[("bn", "<", 500)]).count() == 0


def test_stats_reject_unsafe_columns(spark, tmp_path):
    import pytest

    t = _make(spark, tmp_path / "t", stats=False)
    t.overwrite(_batch(spark, 0, 10))
    with pytest.raises(ValueError):
        t.analyze(["nope"])
    schema2 = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    t2 = VersionedTable(spark, tmp_path / "t2")
    t2.create(schema2, merge_keys=["id"], num_buckets=2)
    t2.overwrite(
        spark.createDataFrame([], schema2)
    )
    with pytest.raises(ValueError):
        t2.analyze(["ts"])


def test_stats_survive_url_encoded_table_paths(spark, tmp_path):
    """input_file_name() returns a percent-encoded URI; the r14
    advisor fix replaced the bare uri.endswith(rel) suffix test with
    a root-anchored decoded-path lookup. A table root containing a
    space is the regression probe: the old suffix test never matched
    'with%20space' against 'with space', silently dropping every
    file's stats entry (and with it all data skipping)."""
    t = VersionedTable(spark, tmp_path / "with space" / "t")
    t.create(SCHEMA, merge_keys=["id"], num_buckets=4,
             meta={"stats_cols": ["bn"]})
    t.append(_batch(spark, 0, 100))
    stats = t.manifest().meta["file_stats"]
    live = {f for fs in t.manifest().buckets.values() for f in fs}
    assert set(stats) == live and live
    assert len(t.read(where=[("bn", "=", 999)]).inputFiles()) == 0
