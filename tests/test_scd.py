"""Unit tests for SCD2 interval reconstruction: duplicate-state
collapse, open last interval, multi-column state, point-in-time
snapshot."""

from __future__ import annotations

from datetime import datetime

from rootstock_collective_state_sync_spark.operators.scd import (
    scd2_intervals,
    snapshot_asof,
)

SCHEMA = "event_id long, ts timestamp, user_id long, status string, tier string"


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _events(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 7, "active", "free"),
        (2, _ts("2024-01-02T00:00:00"), 7, "active", "free"),  # no change
        (3, _ts("2024-01-03T00:00:00"), 7, "active", "paid"),  # tier change
        (4, _ts("2024-01-04T00:00:00"), 7, "churned", "paid"),
        (5, _ts("2024-01-01T12:00:00"), 8, "active", "free"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_collapse_and_open_interval(spark):
    out = scd2_intervals(
        _events(spark), "user_id", "ts", ["status", "tier"], order_col="event_id"
    ).collect()
    u7 = sorted(
        [r for r in out if r["user_id"] == 7], key=lambda r: r["valid_from"]
    )
    # event 2 collapsed: 3 versions, not 4
    assert len(u7) == 3
    assert (u7[0]["status"], u7[0]["tier"]) == ("active", "free")
    assert u7[0]["valid_to"] == _ts("2024-01-03T00:00:00")
    assert u7[0]["is_current"] == 0
    assert u7[2]["status"] == "churned"
    assert u7[2]["valid_to"] is None and u7[2]["is_current"] == 1
    u8 = [r for r in out if r["user_id"] == 8]
    assert len(u8) == 1 and u8[0]["is_current"] == 1


def test_snapshot_asof_picks_covering_interval(spark):
    iv = scd2_intervals(
        _events(spark), "user_id", "ts", ["status", "tier"], order_col="event_id"
    )
    snap = {
        r["user_id"]: r
        for r in snapshot_asof(iv, "2024-01-03T06:00:00").collect()
    }
    assert (snap[7]["status"], snap[7]["tier"]) == ("active", "paid")
    assert snap[8]["status"] == "active"
    # boundary: a version starting exactly at ts is included
    snap2 = {
        r["user_id"]: r
        for r in snapshot_asof(iv, "2024-01-04T00:00:00").collect()
    }
    assert snap2[7]["status"] == "churned"
