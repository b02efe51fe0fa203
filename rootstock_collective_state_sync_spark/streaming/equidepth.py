"""Incremental equi-depth histogram: the streaming twin of
:func:`..operators.profile.equidepth_histogram` (X-ST18; r12 verdict
item 6 — the prefix-sum family's first incremental leg).

The histogram itself is NOT mergeable (boundaries move with data),
but its sufficient statistic is: the per-VALUE count table ``(v, c)``
adds exactly over disjoint row sets — the same merge law as the
Count-Min cells (:mod:`.cm`) and the Benford digit census
(:mod:`.benford`). So the store holds the count table
(:class:`..sinks.table.VersionedTable`, hash-bucketed by value — an
upsert touches only the buckets its batch values hash into) and the
report after any stream prefix renders via
:func:`..operators.profile.equidepth_from_counts`, bit-for-bit equal
to the at-rest histogram over the same rows
(``tests/test_streaming_equidepth.py``). Order-invariant (a pure bag
aggregate) — no arrival contract needed, unlike the TWAP/basket legs.

Replay safety: merging is not idempotent (counts would double), so
the :mod:`.replay` batch_id guard gates each batch; per-batch rendered
reports land under batch-keyed score paths.

Scale shape: per micro-batch one map-side-combined per-value count;
store state is |distinct values| rows — the same cardinality the
at-rest operator's first shuffle produces, kept hash-bucketed so
merge cost tracks batch size, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from rootstock_collective_state_sync_spark.operators.profile import (
    equidepth_from_counts,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.replay import (
    batch_already_applied,
    require_integer_cols,
    write_batch_scores,
)

STORE_SCHEMA = T.StructType(
    [
        T.StructField("v", T.LongType(), False),
        T.StructField("c", T.LongType(), False),
    ]
)


def equidepth_foreach_batch(
    store: VersionedTable,
    scores_path: str,
    value_col: str,
    buckets: int = 8,
):
    """Return the ``foreachBatch`` function merging each batch's
    per-value counts into ``store`` and writing the post-merge
    rendered histogram under ``scores_path``. ``value_col`` must be
    integer-typed (snap monetary values to cents upstream — the
    package fixed-point policy)."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        require_integer_cols(batch_df, [value_col], "equidepth_foreach_batch")
        if batch_df.isEmpty():
            return
        created = store.create_if_not_exists(
            STORE_SCHEMA, merge_keys=["v"], num_buckets=8
        )
        if not created and batch_already_applied(store, batch_id):
            return
        batch_counts = (
            batch_df.select(F.col(value_col).cast("long").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        merged = (
            store.read()
            .select("v", "c")
            .unionByName(batch_counts)
            .groupBy("v")
            .agg(F.sum("c").cast("long").alias("c"))
        )
        write_batch_scores(
            equidepth_from_counts(merged, buckets), scores_path, batch_id
        )
        store.overwrite(merged, meta={"batch_id": int(batch_id)})

    return step
