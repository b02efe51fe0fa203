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
    reader — the downstream plan is identical).

    ``ts`` encoding is probed from the file rather than assumed: a
    TIMESTAMP(NANOS) file surfaces as LongType under ``nanosAsLong``
    and gets the same floor-to-micros conversion as the batch path
    (``plans/tables.py``); a TIMESTAMP(MICROS) file streams as a
    native timestamp untouched — the two generations of driver
    testdata differ here, and hardcoding either breaks the other."""
    from pyspark.sql import types as T

    # probe under nanosAsLong, then restore the session conf so the
    # setting doesn't leak to unrelated reads on a shared session —
    # UNLESS the file really is TIMESTAMP(NANOS): then the streaming
    # scans themselves need the legacy conf for the lifetime of the
    # query, so it must stay set (it already is in get_spark sessions).
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        raw_schema = (
            spark.read.option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .schema
        )
    except Exception:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
        raise
    if not isinstance(raw_schema["ts"].dataType, T.LongType):
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(raw_schema["ts"].dataType, T.LongType):
        # integral `div`, not `/`: nanos exceed 2^53 (see load_table)
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(raw_schema["ts"].dataType, T.TimestampNTZType):
        # withWatermark requires TIMESTAMP (ltz); session tz is pinned
        # to UTC in get_spark, so the cast is value-preserving
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


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
