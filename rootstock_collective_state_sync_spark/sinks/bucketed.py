"""Native Spark bucketed tables for shuffle-free co-located joins.

The versioned store (:mod:`.table`) buckets rows at MERGE time so
upserts touch one bucket-file per task; Spark's scan, however, can't
know that layout, so a join between two such tables still shuffles.
For read-heavy serving tables the fix is Spark-native bucketing:
``bucketBy(n, keys).sortBy(keys).saveAsTable`` records the hash
partitioning in the catalog, and a join of two tables bucketed the
same way plans as a SortMergeJoin with NO Exchange on either side —
the single biggest shuffle eliminator for repeated big-big joins at
100 TB (pay one layout write, save the shuffle on every subsequent
join/agg on those keys).

Requires a session catalog (the default in-memory catalog + a
warehouse dir works; no Hive needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    num_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed AND sorted by
    ``keys`` — co-located and pre-sorted for merge joins."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
    force_merge: bool = True,
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket
    keys. With matching bucket specs the optimizer drops both
    Exchanges (verify with ``.explain``: SortMergeJoin directly over
    the scans). ``force_merge`` pins the merge strategy so a
    small-side broadcast doesn't mask the co-location (at real scale
    neither side broadcasts anyway)."""
    left = spark.table(left_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on, how)
