"""Streaming skyline e2e: foreachBatch over micro-batches keeps the
Pareto frontier equal to the at-rest skyline of the full stream —
the skyline merge law (dominated rows can never dominate) makes the
incremental store lossless under ANY batch split — and replays are
no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from rootstock_collective_state_sync_spark.operators.skyline import skyline_2d
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.skyline import (
    skyline_foreach_batch,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("y", T.LongType(), True),
    ]
)


def _pts(lo: int, hi: int):
    # deterministic scatter with duplicates-on-the-frontier and a
    # second batch that DOMINATES part of the first frontier (the
    # interesting case: the store must evict previously-optimal rows)
    rows = []
    for i in range(lo, hi):
        rows.append((i, float(100 + (i * 37) % 900 + (i % 7) / 10.0), (i * 53) % 50))
    return rows


def test_streaming_skyline_matches_at_rest(spark, tmp_path):
    d = tmp_path / "sky_stream"
    d.mkdir()
    b1, b2 = _pts(0, 120), _pts(120, 300) + [(9001, 100.0, 49), (9002, 100.0, 49)]
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(d / "b2"))
    store = VersionedTable(spark, tmp_path / "sky_store")
    scores_path = str(tmp_path / "sky_scores")
    step = skyline_foreach_batch(store, scores_path)

    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        ev.writeStream.foreachBatch(step)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    full = spark.createDataFrame(b1 + b2, SCHEMA)
    want = sorted(
        (r["id"], r["x"], r["y"])
        for r in skyline_2d(
            full, minimize="x", maximize="y",
            bucket=F.expr("CAST(x AS BIGINT) div 100"),
        ).collect()
    )
    got = sorted((r["id"], r["x"], r["y"]) for r in store.read().collect())
    assert got == want
    # the dominating batch-2 duplicates made it in (both: incomparable)
    assert (9001, 100.0, 49) in got and (9002, 100.0, 49) in got
    # and something from batch 1 was evicted by batch 2's dominators
    b1_ids = {i for i, _, _ in b1}
    sky_b1 = {
        r["id"]
        for r in skyline_2d(
            spark.createDataFrame(b1, SCHEMA), minimize="x", maximize="y",
            bucket=F.expr("CAST(x AS BIGINT) div 100"),
        ).collect()
    }
    final_b1 = {i for i, _, _ in got if i in b1_ids}
    assert final_b1 < sky_b1  # strict subset: eviction happened

    # replay no-op
    last_id = int(store.manifest().meta["batch_id"])
    step(spark.createDataFrame(b2, SCHEMA), last_id)
    assert sorted(
        (r["id"], r["x"], r["y"]) for r in store.read().collect()
    ) == want
