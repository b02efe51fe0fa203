"""Watermark-bounded late-data twins (r10 verdict item 4): shuffled
arrival within the watermark == at-rest; beyond-watermark events are
dropped AND logged, never silently merged; finality is monotone."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators.temporal import (
    ohlc_bars,
    time_weighted_mean,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.latebars import (
    twap_late_foreach_batch,
)
from rootstock_collective_state_sync_spark.streaming.ohlc import (
    ohlc_foreach_batch,
)

MS = 1_000_000  # us per second


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).selectExpr(
        "event_id", "user_id", "cast(ts as timestamp_ntz) ts", "value"
    )


def _typed(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, ts string, value double"
    ).selectExpr(
        "event_id", "event_type", "cast(ts as timestamp_ntz) ts", "value"
    )


# ---------------------------------------------------------------------------
# OHLC: order-freedom (no contract) + watermark finality
# ---------------------------------------------------------------------------


def test_ohlc_shuffled_batch_order_still_equals_at_rest(spark, tmp_path):
    """OHLC needs NO arrival contract: every accumulator is
    associative+commutative, so even batches arriving out of time
    order merge to the at-rest bars bit-for-bit (this is why the
    r11 contract enforcement covers twap/basket but not ohlc)."""
    rows = [
        (1, "x", "2024-01-01 10:05:00", 2.0),
        (2, "x", "2024-01-01 10:50:00", 9.0),
        (3, "x", "2024-01-01 11:10:00", 5.0),
        (4, "x", "2024-01-01 10:20:00", 1.0),
        (5, "y", "2024-01-01 10:30:00", 7.0),
    ]
    store = VersionedTable(spark, tmp_path / "store")
    scores = str(tmp_path / "scores")
    step = ohlc_foreach_batch(store, scores)
    # batches deliberately shuffled in time: late bucket-reopen included
    step(_typed(spark, [rows[2]]), 0)
    step(_typed(spark, [rows[0], rows[4]]), 1)
    step(_typed(spark, [rows[3], rows[1]]), 2)

    want = sorted(
        map(
            tuple,
            ohlc_bars(
                _typed(spark, rows), "event_type", "ts", "value", "event_id"
            ).collect(),
        )
    )
    last = spark.read.parquet(scores).filter(F.col("batch") == 2)
    got = sorted(tuple(r)[:-1] for r in last.collect())  # drop batch col
    assert got == want


def test_ohlc_watermark_finalizes_and_drops_late(spark, tmp_path):
    store = VersionedTable(spark, tmp_path / "store")
    scores = str(tmp_path / "scores")
    late = str(tmp_path / "late")
    step = ohlc_foreach_batch(
        store,
        scores,
        allowed_lateness_us=30 * 60 * MS,  # 30 min lateness
        late_path=late,
    )
    step(_typed(spark, [(1, "x", "2024-01-01 10:05:00", 2.0),
                        (2, "x", "2024-01-01 10:55:00", 9.0)]), 0)
    # max_t 10:55, wm 10:25 -> 10:00 bar (ends 11:00) NOT final yet
    b0 = spark.read.parquet(scores).filter(F.col("batch") == 0)
    assert [r["is_final"] for r in b0.collect()] == [False]

    # within-lateness reopen of the 10:00 bar is accepted and exact
    step(_typed(spark, [(3, "x", "2024-01-01 10:30:00", 1.0),
                        (4, "x", "2024-01-01 12:10:00", 4.0)]), 1)
    # max_t 12:10, wm 11:40 -> the 10:00 bar is now FINAL
    b1 = {
        str(r["bar_ts"]): r
        for r in spark.read.parquet(scores).filter(F.col("batch") == 1).collect()
    }
    assert b1["2024-01-01 10:00:00"]["is_final"] is True
    assert b1["2024-01-01 10:00:00"]["low_c"] == 100  # reopen landed
    assert b1["2024-01-01 12:00:00"]["is_final"] is False

    # an event for the finalized 10:00 bar is dropped + logged,
    # and the final bar does NOT change
    step(_typed(spark, [(5, "x", "2024-01-01 10:59:00", 0.5)]), 2)
    logged = spark.read.parquet(late)
    assert [r["event_id"] for r in logged.collect()] == [5]
    b2 = {
        str(r["bar_ts"]): r
        for r in spark.read.parquet(scores).filter(F.col("batch") == 2).collect()
    }
    assert (
        b2["2024-01-01 10:00:00"]["low_c"],
        b2["2024-01-01 10:00:00"]["n_events"],
    ) == (100, 3)


# ---------------------------------------------------------------------------
# TWAP: watermark-bounded twin
# ---------------------------------------------------------------------------

ROWS = [
    (1, 1, "2024-01-01 00:00:01", 1.0),
    (2, 1, "2024-01-01 00:00:03", 3.0),
    (3, 1, "2024-01-01 00:00:02", 5.0),   # out of order within lateness
    (4, 1, "2024-01-01 00:00:07", 9.0),
    (5, 2, "2024-01-01 00:00:04", 2.0),
    (6, 2, "2024-01-01 00:00:05", 4.0),
    (7, 1, "2024-01-01 00:00:08", 7.0),
]


def test_twap_late_shuffled_arrival_matches_at_rest(spark, tmp_path):
    """Events arrive shuffled across batches; within the lateness
    horizon the rendered TWAP equals the at-rest operator over every
    (non-dropped) event — here nothing is dropped."""
    store = VersionedTable(spark, tmp_path / "store")
    scores, late = str(tmp_path / "scores"), str(tmp_path / "late")
    step = twap_late_foreach_batch(
        store, scores, late, allowed_lateness_us=5 * MS
    )
    step(_events(spark, [ROWS[0], ROWS[1]]), 0)
    step(_events(spark, [ROWS[2], ROWS[4]]), 1)  # id 3 out of order
    step(_events(spark, [ROWS[3], ROWS[5], ROWS[6]]), 2)

    want = sorted(
        map(
            tuple,
            time_weighted_mean(
                _events(spark, ROWS), "user_id", "ts", "value", "event_id"
            ).collect(),
        )
    )
    last = spark.read.parquet(scores).filter(F.col("batch") == 2)
    got = sorted(tuple(r)[:-1] for r in last.collect())
    assert got == want
    assert spark.read.parquet(late).count() == 0
    # watermark bound holds: only events above wm stay pending
    pend = store.read().filter(F.col("kind") == "E")
    wm = store.manifest().meta["max_t_us"] - 5 * MS
    assert all(r["t"] > wm for r in pend.collect())


def test_twap_late_beyond_watermark_drops_and_logs(spark, tmp_path):
    store = VersionedTable(spark, tmp_path / "store")
    scores, late = str(tmp_path / "scores"), str(tmp_path / "late")
    step = twap_late_foreach_batch(
        store, scores, late, allowed_lateness_us=1 * MS
    )
    step(_events(spark, [(1, 1, "2024-01-01 00:00:01", 1.0),
                         (2, 1, "2024-01-01 00:00:10", 3.0)]), 0)
    # wm = 00:00:09 -> user 1's finalized span now ends at its last
    # event at/below the watermark (00:00:01). An event BEFORE that
    # boundary can no longer be woven into the served prefix -> drop
    # + log. (An event between 00:00:01 and the watermark would still
    # be weavable — the drop rule is span-based, strictly less lossy
    # than clock-based dropping.)
    step(_events(spark, [(3, 1, "2024-01-01 00:00:00.500000", 99.0),
                         (4, 1, "2024-01-01 00:00:11", 5.0)]), 1)
    logged = spark.read.parquet(late)
    assert [r["id_"] for r in logged.collect()] == [3]
    # rendered equals at-rest over the NON-DROPPED events
    want = sorted(
        map(
            tuple,
            time_weighted_mean(
                _events(
                    spark,
                    [
                        (1, 1, "2024-01-01 00:00:01", 1.0),
                        (2, 1, "2024-01-01 00:00:10", 3.0),
                        (4, 1, "2024-01-01 00:00:11", 5.0),
                    ],
                ),
                "user_id", "ts", "value", "event_id",
            ).collect(),
        )
    )
    last = spark.read.parquet(scores).filter(F.col("batch") == 1)
    got = sorted(tuple(r)[:-1] for r in last.collect())
    assert got == want


def test_twap_late_replay_is_noop_and_state_rebuild_identical(
    spark, tmp_path
):
    store = VersionedTable(spark, tmp_path / "store")
    scores, late = str(tmp_path / "scores"), str(tmp_path / "late")
    step = twap_late_foreach_batch(
        store, scores, late, allowed_lateness_us=5 * MS
    )
    step(_events(spark, [ROWS[0], ROWS[1]]), 0)
    step(_events(spark, [ROWS[2], ROWS[4]]), 1)
    v = store.current_version()
    want = sorted(map(tuple, store.read().collect()))
    # fully-applied replay: guarded no-op
    step(_events(spark, [ROWS[2], ROWS[4]]), 1)
    assert store.current_version() == v
    assert sorted(map(tuple, store.read().collect())) == want
