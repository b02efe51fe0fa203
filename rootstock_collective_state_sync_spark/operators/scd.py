"""SCD2 state-interval reconstruction from event logs.

The batch form of what the sync engine does continuously: turn a
keyed change stream into per-key validity intervals (slowly-changing-
dimension type 2). Consecutive events that don't change the tracked
state are collapsed first (an upsert that writes the same value is
not a new version — mirrors the keyed diff-update semantics of
``sinks/upsert.py``), then each surviving change opens an interval
``[valid_from, valid_to)`` closed by the next change; the last
interval per key stays open (``valid_to IS NULL``, ``is_current=1``).

Scale design: two window passes over the SAME partitioning (one
shuffle on the key — Catalyst reuses the exchange for both windows),
no joins, no UDFs. At 100 TB this is a single keyed sort; skewed keys
are bounded by per-key event counts, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_cols: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Per-key validity intervals over the tracked ``state_cols``.

    Returns (key, *state_cols, valid_from, valid_to, is_current):
    one row per state CHANGE (consecutive duplicate states collapse
    into the earlier interval), ordered within key by ``ts_col`` with
    ``order_col`` as the deterministic tie-break.
    """
    order = [F.col(ts_col).asc()]
    if order_col is not None:
        order.append(F.col(order_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    state = F.struct(*[F.col(c) for c in state_cols])
    # null-safe: the first row per key has lag NULL -> eqNullSafe is
    # False -> a change; identical consecutive states (incl. NULL
    # fields) compare equal and collapse
    changes = df.withColumn(
        "__chg", ~F.lag(state).over(w).eqNullSafe(state)
    ).filter(F.col("__chg"))
    return changes.select(
        F.col(key_col),
        *[F.col(c) for c in state_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().cast("int").alias("is_current"),
    )


def snapshot_asof(
    intervals: DataFrame, ts, ts_type: str = "timestamp"
) -> DataFrame:
    """Point-in-time state: the rows of an :func:`scd2_intervals`
    result whose interval covers ``ts`` — a scan + filter (partition-
    prunable when the intervals table is stored range-clustered on
    ``valid_from``), no shuffle."""
    t = F.lit(ts).cast(ts_type)
    return intervals.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
