"""Streaming KMV e2e: foreachBatch over real micro-batches (file
source, one file per trigger) maintains a bottom-k store whose final
estimate equals the at-rest KMV over the full stream — the merge-law
equivalence that makes the sketch mergeable — and replays are no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from rootstock_collective_state_sync_spark.operators.sketches import (
    kmv_bottom_k,
    kmv_estimate,
    kmv_hashes,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.kmv import kmv_foreach_batch

SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("tokn", T.StringType(), True),
    ]
)

K = 16


def _rows(lo: int, hi: int):
    # two sources: 'a' sees every value, 'b' only the evens
    out = [("a", f"v{i}") for i in range(lo, hi)]
    out += [("b", f"v{i}") for i in range(lo, hi) if i % 2 == 0]
    return out


def test_streaming_kmv_matches_at_rest(spark, tmp_path):
    d = tmp_path / "kmv_stream"
    d.mkdir()
    spark.createDataFrame(_rows(0, 40), SCHEMA).coalesce(1).write.parquet(
        str(d / "a_b1")
    )
    spark.createDataFrame(_rows(30, 90), SCHEMA).coalesce(1).write.parquet(
        str(d / "b_b2")
    )
    store = VersionedTable(spark, tmp_path / "kmv_store")
    scores_path = str(tmp_path / "kmv_scores")

    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        ev.writeStream.foreachBatch(
            kmv_foreach_batch(store, scores_path, k=K)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    full = spark.createDataFrame(_rows(0, 40) + _rows(30, 90), SCHEMA)
    # (grp, kmv_est) — n_hashes from a truncated store is min(true, k)
    # by design; the ESTIMATE is what the merge law preserves
    want = {
        (r["grp"], r["kmv_est"])
        for r in kmv_estimate(
            kmv_hashes(full, "source", "tokn"), K
        ).collect()
    }

    # 1. store == at-rest bottom-k, exactly
    got_store = {(r["grp"], r["h"]) for r in store.read().collect()}
    want_store = {
        (r["grp"], r["h"])
        for r in kmv_bottom_k(kmv_hashes(full, "source", "tokn"), K).collect()
    }
    assert got_store == want_store
    assert len(got_store) <= 2 * K  # bounded state

    # 2. last batch's scores == at-rest estimate over the full stream
    scores = spark.read.parquet(scores_path)
    last_batch = scores.agg(F.max("batch")).collect()[0][0]
    got = {
        (r["grp"], r["kmv_est"])
        for r in scores.filter(F.col("batch") == last_batch).collect()
    }
    assert got == want

    # 3. replaying the final batch is a no-op
    step = kmv_foreach_batch(store, scores_path, k=K)
    v = store.current_version()
    step(spark.createDataFrame(_rows(30, 90), SCHEMA), last_batch)
    assert store.current_version() == v
