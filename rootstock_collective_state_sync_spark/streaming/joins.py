"""Stream-stream interval joins under real Structured Streaming.

Correlating two live event streams — "purchase within an hour of
signup", "fill within N blocks of quote" — is the one join shape the
batch engine can't fake with a broadcast: both sides grow forever, so
the join is only computable with bounded state. Spark's stream-stream
inner join does exactly that when BOTH sides carry watermarks and the
join predicate bounds event time on both sides: each side buffers
only rows inside the watermark horizon and state is evicted as the
watermark advances.

Scale design: state per side is O(rate x window), independent of
stream age; the join key is hash-partitioned so state shards across
executors; no driver-side buffering. The same plan runs as a batch
interval join (``operators/temporal.range_join`` is the at-rest
twin) — tested equal in ``tests/test_streaming_joins.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join two (streaming or batch) event frames on ``key``
    where the right event lands in ``(left_ts, left_ts + within]`` —
    strictly after, at most ``within`` later.

    Both inputs must expose distinct column names (prefix them before
    calling); on streaming inputs a watermark is applied to each side
    (required for state eviction) and on batch inputs the same
    expression is a no-op semantically, so batch == stream on shared
    data modulo watermark-late rows.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    cond = (
        (lw[key] == rw[f"r_{key}"])
        & (F.col(right_ts) > F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {within}")
        )
    )
    return lw.join(rw, cond, "inner")


def followup_events(
    events: DataFrame,
    first_type: str = "signup",
    then_type: str = "purchase",
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Funnel correlation over one event stream: every ``then_type``
    event within ``within`` after a ``first_type`` event by the same
    key. Splits the stream into two filtered sides and interval-joins
    them — the canonical stream-stream join exercise."""
    left = events.filter(F.col("event_type") == first_type).select(
        F.col(key),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    right = events.filter(F.col("event_type") == then_type).select(
        F.col(key).alias(f"r_{key}"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    j = interval_join(
        left, right, key=key, within=within, watermark=watermark
    )
    return j.select(
        key, "l_event_id", "l_ts", "r_event_id", "r_ts", "r_value"
    )
