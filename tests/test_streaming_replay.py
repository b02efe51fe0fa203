"""foreachBatch replay idempotency (r09 advice): Structured Streaming
is at-least-once around ``foreachBatch``, so every incremental-store
leg must tolerate (a) a replay of a FULLY-committed batch — store
merge and scores write both no-op — and (b) a replay after the scores
write but BEFORE the store commit — the batch-keyed overwrite replaces
the partial output instead of appending duplicates.

Driven against the step functions directly (the e2e stream harnesses
live in ``test_streaming_{dsir,cdc,novelty}.py``); a real replay is
just the same ``(batch_df, batch_id)`` call repeated.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.cdc import cdc_foreach_batch
from rootstock_collective_state_sync_spark.streaming.dsir import dsir_foreach_batch
from rootstock_collective_state_sync_spark.streaming.novelty import (
    novelty_foreach_batch,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("is_target", T.BooleanType(), True),
    ]
)

BATCH1 = [
    (1, "clean prose about science and careful reasoning today", True),
    (2, "the quick brown fox jumps over the lazy dog again", False),
]
BATCH2 = [
    (3, "clean prose about careful science writing for the win", False),
    (4, "zzz qqq spam spam buy now zzz qqq and more spam here", False),
]


def _legs(spark, tmp_path):
    """(name, step_fn, store, scores_path) for each streaming leg."""
    out = []
    for name, factory in [
        (
            "dsir",
            lambda st, sp: dsir_foreach_batch(st, sp, num_buckets=64),
        ),
        ("cdc", lambda st, sp: cdc_foreach_batch(st, sp, window=4, modulus=4)),
        ("novelty", lambda st, sp: novelty_foreach_batch(st, sp)),
    ]:
        store = VersionedTable(spark, tmp_path / f"{name}_store")
        scores_path = str(tmp_path / f"{name}_scores")
        out.append((name, factory(store, scores_path), store, scores_path))
    return out


def _snapshot(spark, store, scores_path):
    rows = sorted(map(tuple, store.read().collect()))
    scores = sorted(map(tuple, spark.read.parquet(scores_path).collect()))
    return store.current_version(), rows, scores


def test_replay_of_committed_batch_is_noop(spark, tmp_path):
    for name, step, store, scores_path in _legs(spark, tmp_path):
        b1 = spark.createDataFrame(BATCH1, DOC_SCHEMA)
        b2 = spark.createDataFrame(BATCH2, DOC_SCHEMA)
        step(b1, 0)
        step(b2, 1)
        before = _snapshot(spark, store, scores_path)
        step(b2, 1)  # offset-commit crash -> same batch replayed
        after = _snapshot(spark, store, scores_path)
        assert after == before, f"{name}: committed replay must be a no-op"


def test_replay_after_partial_scores_write_overwrites(spark, tmp_path):
    """Crash between the scores write and the store commit: the replay
    recomputes from the last COMMITTED store and overwrites the
    partial batch directory — no duplicate or stale rows survive."""
    for name, step, store, scores_path in _legs(spark, tmp_path):
        b1 = spark.createDataFrame(BATCH1, DOC_SCHEMA)
        b2 = spark.createDataFrame(BATCH2, DOC_SCHEMA)
        step(b1, 0)
        want_version = store.current_version()
        # simulate the crashed first attempt at batch 1: its scores
        # landed (with garbage from a torn write), the store did not
        spark.range(3).withColumnRenamed("id", "doc_id").write.mode(
            "overwrite"
        ).parquet(f"{scores_path}/batch=1")
        step(b2, 1)  # the replay
        scores = spark.read.parquet(scores_path)
        per_batch = {
            r["batch"]: r["n"]
            for r in scores.groupBy("batch").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert per_batch == {0: 2, 1: 2}, f"{name}: {per_batch}"
        assert store.current_version() == want_version + 1
        assert store.manifest().meta["batch_id"] == 1


def test_dsir_store_sum_not_doubled(spark, tmp_path):
    """The DSIR-specific hazard: its merge is a SUM, so a double-apply
    would inflate counts. Compare the replayed store to a clean run."""
    clean = VersionedTable(spark, tmp_path / "clean_store")
    replayed = VersionedTable(spark, tmp_path / "replay_store")
    b1 = spark.createDataFrame(BATCH1, DOC_SCHEMA)
    b2 = spark.createDataFrame(BATCH2, DOC_SCHEMA)
    step_clean = dsir_foreach_batch(
        clean, str(tmp_path / "clean_scores"), num_buckets=64
    )
    step_replay = dsir_foreach_batch(
        replayed, str(tmp_path / "replay_scores"), num_buckets=64
    )
    step_clean(b1, 0)
    step_clean(b2, 1)
    step_replay(b1, 0)
    step_replay(b2, 1)
    step_replay(b2, 1)
    step_replay(b2, 1)
    want = sorted(map(tuple, clean.read().collect()))
    got = sorted(map(tuple, replayed.read().collect()))
    assert got == want
