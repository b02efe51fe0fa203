"""Edge cases for the as-of and range join operators: tie timestamps,
no-match NULLs, intervals spanning multiple buckets, overlap."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators.temporal import (
    asof_join,
    range_join,
)


def _t(mm: int, ss: int = 0) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1, 12, mm, ss)


def test_asof_tie_and_null(spark):
    left = spark.createDataFrame(
        [(1, 100, _t(0)), (1, 101, _t(5)), (2, 200, _t(3))],
        "user_id bigint, event_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _t(0), 10), (1, _t(4), 20)],
        "user_id bigint, ts timestamp, v bigint",
    )
    got = {
        r.event_id: r.asof_v
        for r in asof_join(left, right, key="user_id", value_cols=["v"]).collect()
    }
    assert got[100] == 10  # equal ts matches (backward <= semantics)
    assert got[101] == 20  # latest at-or-before wins
    assert got[200] is None  # no right rows for the key -> NULL


def test_asof_left_value_column_preserved(spark):
    """A column name shared by both sides: left's survives untouched,
    the right's arrives under the asof_ prefix."""
    left = spark.createDataFrame(
        [(1, _t(5), 99)], "user_id bigint, ts timestamp, v bigint"
    )
    right = spark.createDataFrame(
        [(1, _t(1), 7)], "user_id bigint, ts timestamp, v bigint"
    )
    row = asof_join(left, right, key="user_id", value_cols=["v"]).collect()[0]
    assert row.v == 99 and row.asof_v == 7


def test_range_join_multi_bucket_and_overlap(spark):
    points = spark.createDataFrame(
        [(1, _t(10)), (2, _t(59, 59))], "pid bigint, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            ("long", _t(0), datetime.datetime(2026, 1, 1, 14, 0)),  # spans 3 buckets
            ("short", _t(9), _t(11)),
            ("empty", _t(30), _t(31)),
        ],
        "iid string, start timestamp, end timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(points, intervals, bucket_seconds=3600).collect()
    )
    # point 1 in both overlapping intervals, exactly once each (no
    # duplicate from the interval's multi-bucket explode); point 2
    # matched by the long interval even at the bucket boundary
    assert got == [(1, "long"), (1, "short"), (2, "long")]


def test_range_join_end_exclusive(spark):
    points = spark.createDataFrame([(1, _t(11))], "pid bigint, ts timestamp")
    intervals = spark.createDataFrame(
        [("i", _t(9), _t(11))], "iid string, start timestamp, end timestamp"
    )
    assert range_join(points, intervals).count() == 0


def test_time_decayed_score_exact_fixed_point(spark):
    from datetime import datetime
    from rootstock_collective_state_sync_spark.operators.temporal import (
        time_decayed_score,
    )

    rows = [
        (1, datetime(2024, 1, 1, 0), "u", 10.0),
        (2, datetime(2024, 1, 1, 1), "u", 20.0),
        (3, datetime(2024, 1, 1, 2), "u", 40.0),
        (9, datetime(2024, 1, 1, 0), "v", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, value double"
    )
    out = {
        r["event_id"]: r["score_e6"]
        for r in time_decayed_score(df).collect()
    }
    # event 2: 20e6 + 10e6*9//10 ; event 3: 40e6 + 20e6*9//10 + 10e6*81//100
    assert out[1] == 10_000_000
    assert out[2] == 20_000_000 + 9_000_000
    assert out[3] == 40_000_000 + 18_000_000 + 8_100_000
    assert out[9] == 5_000_000  # keys independent
