"""Streaming OHLC e2e: foreachBatch over real micro-batches merges
partial bars into a VersionedTable store; the final rendered bars
equal the at-rest ohlc_bars over the full stream even when a bucket's
events straddle batches (open in batch 1, close in batch 2), and
replays are no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from rootstock_collective_state_sync_spark.operators.temporal import ohlc_bars
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.ohlc import (
    ohlc_foreach_batch,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

B1 = [
    (1, "x", "2024-01-01 10:05:00", 2.00),
    (2, "x", "2024-01-01 10:10:00", 9.00),
    (3, "y", "2024-01-01 10:30:00", 5.00),
]
B2 = [
    # same 10:00 'x' bucket continues in batch 2: close must move,
    # open must NOT
    (4, "x", "2024-01-01 10:20:00", 1.00),
    (5, "x", "2024-01-01 10:50:00", 4.00),
    (6, "y", "2024-01-01 11:01:00", 7.00),
]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, t, ts, v) for i, t, ts, v in rows],
        "event_id long, event_type string, ts string, value double",
    ).selectExpr(
        "event_id", "event_type", "cast(ts as timestamp_ntz) ts", "value"
    )


def test_streaming_ohlc_matches_at_rest(spark, tmp_path):
    d = tmp_path / "ohlc_stream"
    d.mkdir()
    _df(spark, B1).coalesce(1).write.parquet(str(d / "a_b1"))
    _df(spark, B2).coalesce(1).write.parquet(str(d / "b_b2"))
    store = VersionedTable(spark, tmp_path / "ohlc_store")
    scores_path = str(tmp_path / "ohlc_scores")

    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        ev.writeStream.foreachBatch(ohlc_foreach_batch(store, scores_path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    full = _df(spark, B1 + B2)
    want = {
        (r["event_type"], str(r["bar_ts"])): (
            r["open_c"], r["high_c"], r["low_c"], r["close_c"],
            r["n_events"], r["volume_c"],
        )
        for r in ohlc_bars(
            full, "event_type", "ts", "value", "event_id"
        ).collect()
    }

    # the straddling bucket merged exactly: open from batch 1 (2.00),
    # close from batch 2 (4.00)
    assert want[("x", "2024-01-01 10:00:00")] == (200, 900, 100, 400, 4, 1600)

    scores = spark.read.parquet(scores_path)
    last_batch = scores.agg(F.max("batch")).collect()[0][0]
    got = {
        (r["event_type"], str(r["bar_ts"])): (
            r["open_c"], r["high_c"], r["low_c"], r["close_c"],
            r["n_events"], r["volume_c"],
        )
        for r in scores.filter(F.col("batch") == last_batch).collect()
    }
    assert got == want

    # replaying the final batch is a no-op (sums would double)
    step = ohlc_foreach_batch(store, scores_path)
    v = store.current_version()
    step(_df(spark, B2), last_batch)
    assert store.current_version() == v
    n_store = store.read().count()
    assert n_store == len(want)  # keys x buckets bounded state
