"""Incremental rollup maintenance — a hypertable-style continuous
aggregate over the versioned table store.

A rollup table holds pre-aggregated measures per dimension key (e.g.
hourly counts/sums per event type). :func:`merge_rollup` folds an
*increment* (the new rows of one micro-batch / sync step) into it
WITHOUT re-reading the fact table: partial-aggregate the increment,
re-aggregate it together with the current rollup rows for exactly the
touched keys, and MERGE those keys back. Work tracks increment size
and touched-key count, never total history — the property that keeps
a continuous aggregate cheap at 100 TB of facts.

Only decomposable measures are supported (count/sum/min/max — the
algebra that folds). AVG should be stored as (sum, count) and divided
at read time. Measures assume append-only facts (the engine's event
tables, T5); retractions require the reorg path: restore the rollup
to a pre-fork version and replay (same protocol as every other table
in the store, ``streaming/reorg.py``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from rootstock_collective_state_sync_spark.sinks import VersionedTable, merge_upsert

_FOLD = {
    "sum": F.sum,
    "count": F.sum,  # counts fold by summing partial counts
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class Measure:
    name: str
    op: str  # sum | count | min | max
    col: str | None = None  # source column (None for count)

    def partial(self) -> Column:
        if self.op == "count":
            return F.count(F.lit(1)).cast("bigint").alias(self.name)
        if self.op not in _FOLD:
            raise ValueError(f"non-decomposable measure op {self.op!r}")
        return getattr(F, self.op)(F.col(self.col)).alias(self.name)

    def fold(self) -> Column:
        return _FOLD[self.op](F.col(self.name)).alias(self.name)


def rollup_increment(
    increment: DataFrame, dims: list[Column | str], measures: list[Measure]
) -> DataFrame:
    """Partial aggregate of one increment (map-side combinable)."""
    return increment.groupBy(*dims).agg(*[m.partial() for m in measures])


def merge_rollup(
    table: VersionedTable,
    increment: DataFrame,
    dims: list[str],
    measures: list[Measure],
    meta: dict | None = None,
) -> int:
    """Fold ``increment`` into the rollup table. Reads ONLY the
    current rollup rows whose keys the increment touches (left-semi
    against the delta keys — with the bucketed store this prunes to
    the touched buckets), re-aggregates delta ∪ current, and merges.
    Returns the new table version."""
    delta = rollup_increment(increment, dims, measures)
    if not table.exists() or table.manifest().version == 0:
        return merge_upsert(table, delta, meta=meta)
    delta = delta.persist()
    try:
        current = table.read().join(
            F.broadcast(delta.select(*dims).distinct()), dims, "left_semi"
        )
        folded = (
            current.select(*dims, *[m.name for m in measures])
            .unionByName(delta)
            .groupBy(*dims)
            .agg(*[m.fold() for m in measures])
        )
        return merge_upsert(table, folded, meta=meta)
    finally:
        delta.unpersist()


def stream_into_rollup(
    events: DataFrame,
    table: VersionedTable,
    dims: list[str],
    measures: list[Measure],
    checkpoint_dir: str,
    **stream_opts,
):
    """Continuous-aggregate wiring: every micro-batch folds into the
    rollup via :func:`merge_rollup` (foreachBatch — the merge is
    idempotent per batch only through the reorg/restore protocol, so
    exactly-once here relies on the checkpoint as usual)."""

    def fold_batch(batch: DataFrame, _epoch: int) -> None:
        merge_rollup(table, batch, dims, measures)

    return (
        events.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(stream_opts or {"availableNow": True}))
        .start()
    )
