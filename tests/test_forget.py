"""Targeted deletion e2e: forget_keys rewrites ONLY the buckets
holding the doomed keys (unaffected buckets keep their exact files),
older versions still time-travel until purge_history deletes their
manifests and orphaned files — after which no parquet file on disk
contains a forgotten row."""

from __future__ import annotations

import glob

import pandas as pd
from pyspark.sql import types as T

from rootstock_collective_state_sync_spark.sinks.forget import (
    forget_keys,
    purge_history,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("payload", T.StringType(), False),
    ]
)


def _mk(spark, tmp_path, n=40, buckets=8):
    t = VersionedTable(spark, tmp_path / "t")
    t.create(SCHEMA, ["user_id"], num_buckets=buckets)
    df = spark.createDataFrame(
        [(i, f"data-{i}") for i in range(n)], SCHEMA
    )
    t.overwrite(df)
    return t


def test_forget_rewrites_only_affected_buckets(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = t.manifest()
    doomed = spark.createDataFrame([(3,), (17,)], "user_id long")
    v = forget_keys(t, doomed)
    after = t.manifest(v)

    got = {r["user_id"] for r in t.read().collect()}
    assert got == set(range(40)) - {3, 17}

    from rootstock_collective_state_sync_spark.sinks.table import bucket_expr

    affected = {
        str(r["b"])
        for r in doomed.select(bucket_expr(["user_id"], 8).alias("b"))
        .distinct()
        .collect()
    }
    for b, files in before.buckets.items():
        if b not in affected:
            assert after.buckets[b] == files, f"bucket {b} was rewritten"
        else:
            assert after.buckets.get(b) != files, f"bucket {b} untouched"

    # pre-purge: the old version still time-travels to the doomed rows
    old = {r["user_id"] for r in t.read(version=before.version).collect()}
    assert {3, 17} <= old


def test_purge_history_makes_deletion_real(spark, tmp_path):
    t = _mk(spark, tmp_path)
    doomed = spark.createDataFrame([(3,), (17,)], "user_id long")
    forget_keys(t, doomed)
    stats = purge_history(t)
    assert stats["versions_removed"] >= 2  # create + first overwrite
    assert stats["files_removed"] > 0

    # no retained manifest older than current
    assert len(list(t._versions_dir.glob("v*.json"))) == 1
    # every parquet file on disk is referenced and free of doomed rows
    files = glob.glob(str(t.path / "data" / "**" / "*.parquet"), recursive=True)
    assert files
    seen = pd.concat([pd.read_parquet(f) for f in files])
    assert not set(seen["user_id"]) & {3, 17}
    # table still reads correctly after the purge
    assert t.read().count() == 38


def test_forget_noop_when_keys_absent(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10)
    v0 = t.current_version()
    doomed = spark.createDataFrame([(999,)], "user_id long")
    v = forget_keys(t, doomed)
    # absent keys may still hash to an existing bucket; rows must be
    # unchanged either way and version advances at most once
    assert v in (v0, v0 + 1)
    assert t.read().count() == 10
