"""Streaming TWAP e2e: foreachBatch under the monotone-arrival
contract merges per-group partials with bridge segments; the final
rendered store equals the at-rest time_weighted_mean over the full
stream bit-for-bit (including groups whose events straddle batches
and a group that only becomes multi-event in batch 2), and replays
are no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from rootstock_collective_state_sync_spark.operators.temporal import (
    time_weighted_mean,
    twap_merge2,
    twap_partial,
    twap_render,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.twap import (
    twap_foreach_batch,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

B1 = [
    (1, 1, "2024-01-01 00:00:00.000000", 1.00),
    (2, 1, "2024-01-01 00:00:00.000010", 3.00),
    (3, 2, "2024-01-01 00:00:00.000005", 5.00),  # single event in b1
]
B2 = [
    # user 1 continues: bridge from b1's last (3.00) over 30us
    (4, 1, "2024-01-01 00:00:00.000040", 9.00),
    # user 2's second event arrives: its only segment IS the bridge
    (5, 2, "2024-01-01 00:00:00.000025", 7.00),
    # user 3 born in b2
    (6, 3, "2024-01-01 00:00:00.000050", 2.00),
    (7, 3, "2024-01-01 00:00:00.000060", 4.00),
]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).selectExpr(
        "event_id", "user_id", "cast(ts as timestamp_ntz) ts", "value"
    )


def test_streaming_twap_matches_at_rest(spark, tmp_path):
    d = tmp_path / "twap_stream"
    d.mkdir()
    _df(spark, B1).coalesce(1).write.parquet(str(d / "a_b1"))
    _df(spark, B2).coalesce(1).write.parquet(str(d / "b_b2"))
    store = VersionedTable(spark, tmp_path / "twap_store")
    scores_path = str(tmp_path / "twap_scores")

    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        ev.writeStream.foreachBatch(twap_foreach_batch(store, scores_path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    full = _df(spark, B1 + B2)
    want = {
        r["user_id"]: (r["n_segments"], r["span_us"], r["twap_c"])
        for r in time_weighted_mean(
            full, "user_id", "ts", "value", "event_id"
        ).collect()
    }
    # hand check user 2: its ONLY segment is the cross-batch bridge
    # (5.00c for 20us) -> twap 500
    assert want[2] == (1, 20, 500)

    scores = spark.read.parquet(scores_path)
    last_batch = scores.agg(F.max("batch")).collect()[0][0]
    got = {
        r["user_id"]: (r["n_segments"], r["span_us"], r["twap_c"])
        for r in scores.filter(F.col("batch") == last_batch).collect()
    }
    assert got == want

    # replay no-op + one store row per group
    step = twap_foreach_batch(store, scores_path)
    v = store.current_version()
    step(_df(spark, B2), last_batch)
    assert store.current_version() == v
    assert store.read().count() == 3


def test_twap_merge2_equals_at_rest_for_any_time_split(spark):
    """Merge law under the monotone contract: split the event stream
    at ANY time boundary, merge the two partials — rendered result
    equals the at-rest operator."""
    rows = B1 + B2
    full = _df(spark, rows)
    want = sorted(
        map(
            tuple,
            time_weighted_mean(
                full, "user_id", "ts", "value", "event_id"
            ).collect(),
        )
    )
    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    for cut in range(1, len(ordered)):
        a = twap_partial(
            _df(spark, ordered[:cut]), "user_id", "ts", "value", "event_id"
        )
        b = twap_partial(
            _df(spark, ordered[cut:]), "user_id", "ts", "value", "event_id"
        )
        got = sorted(
            map(tuple, twap_render(twap_merge2(a, b, "user_id"), "user_id").collect())
        )
        assert got == want, f"cut={cut}"
