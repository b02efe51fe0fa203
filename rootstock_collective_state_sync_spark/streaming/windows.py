"""Event-time windowing under real Structured Streaming.

The batch-checkable window plans live in ``plans/windows.py``; these
helpers run the SAME expressions as streaming queries with watermarks
— tumbling/sliding/session aggregation and within-watermark dedup over
any event stream (SURVEY §2.10 extension scope: the reference never
needed event-time windows because block numbers are monotone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_events_parquet(spark, sf_dir: str) -> DataFrame:
    """Stream the driver's events table through the file source (one
    micro-batch per trigger; in production this is a Kafka/blockstream
    reader — the downstream plan is identical)."""
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    batch_schema = load_table(spark, sf_dir, "events").schema  # post ts-conversion
    raw_schema = batch_schema  # ts already TimestampType after conversion? no:
    # the raw file carries TIMESTAMP(NANOS) -> LongType under
    # nanosAsLong; stream with the raw schema and convert here.
    from pyspark.sql import types as T

    raw_fields = [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
    stream = (
        spark.readStream.schema(T.StructType(raw_fields))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def tumbling_counts(events: DataFrame, size: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )


def session_counts(events: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, keys: list[str], watermark: str = "2 hours") -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state older than the horizon is
    evicted (the scale-safe form of dropDuplicates)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
