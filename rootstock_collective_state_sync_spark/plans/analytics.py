"""Event-log analytics conformance queries: semi-structured (JSON)
extraction, running windows, exact order statistics.

These extend the engine's analytics surface over the ``events``
stream table beyond the event-time windows in :mod:`.windows` — the
shapes a consumer points at the synced tables (SURVEY §6 "serving"
note). All outputs are type-canonical (BIGINT counts/sums, element-
exact order stats) so the driver hash matches DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rootstock_collective_state_sync_spark.plans.tables import load_table


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


def q_events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + aggregation: ``props`` is an opaque
    JSON string; ``get_json_object`` stays JVM-side (no UDF). Sums are
    of BIGINTs, so both engines are exact."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(k).alias("n_with_k"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


# DuckDB: regexp keeps the oracle independent of the json extension;
# TRY_CAST mirrors Spark's null-on-miss cast.
Q_EVENTS_JSON_ORACLE = r"""
WITH k AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM k GROUP BY 1 ORDER BY 1
"""


def q_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total over event time — the batch form of a
    stateful streaming accumulator. Decimal sum keeps the prefix sums
    exact; one shuffle on ``user_id``, sort within partitions only."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum(_dec("value")).over(w).cast("double").alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


Q_RUNNING_USER_VALUE_ORACLE = """
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,2)))
              OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
FROM events ORDER BY user_id, event_id
"""


def q_median_value_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median per event type — picks a concrete element
    (row_number vs count), no interpolation arithmetic, so the result
    is a raw stored double identical on any engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        ev.select(
            "event_type",
            F.col("value"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("event_type", F.col("value").alias("median_lo"))
        .orderBy("event_type")
    )


Q_MEDIAN_ORACLE = """
SELECT event_type, value AS median_lo FROM (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
) WHERE rn = (n + 1) // 2 ORDER BY event_type
"""
