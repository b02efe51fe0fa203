"""Incremental Gini / Lorenz census (X-ST22): the streaming twin of
:func:`..operators.profile.gini_index` (X-A26) and the Lorenz decile
table (X-A35) — ONE store, TWO reports, the X-ST21 pattern.

Neither report is mergeable (ranks and decile boundaries move with
data), but both are pure functions of the same sufficient statistic
the equi-depth (X-ST18) and rank-test (X-ST21) legs already use: the
per-VALUE count table ``(v, c)``, which adds exactly over disjoint
row sets. The store holds that table (hash-bucketed by value); after
each merged batch the step renders BOTH the one-row Gini index
(:func:`..operators.profile.gini_from_counts`) and the decile Lorenz
table (:func:`..operators.profile.lorenz_from_counts`), each
bit-equal to its at-rest raw-row operator over the same rows
(``tests/test_streaming_gini.py``). Order-invariant bag aggregate —
no arrival contract.

Replay safety: count merges double on replay, so the :mod:`.replay`
batch_id guard gates each batch; both rendered reports land under
batch-keyed score paths (scores-then-store ordering).

Scale shape: per micro-batch one map-side-combined per-value count +
a keyed merge proportional to the batch's distinct values; store
state is |distinct values| rows — the same cardinality the at-rest
operators' first shuffle produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from rootstock_collective_state_sync_spark.operators.profile import (
    gini_from_counts,
    lorenz_from_counts,
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


def gini_lorenz_foreach_batch(
    store: VersionedTable,
    scores_path: str,
    value_col: str,
    buckets: int = 10,
):
    """Return the ``foreachBatch`` function merging each batch's
    per-value counts into ``store`` and writing the post-merge Gini
    row under ``<scores_path>/gini`` and the Lorenz decile table
    under ``<scores_path>/lorenz``. ``value_col`` must be
    integer-typed (snap monetary values to cents upstream — the
    package fixed-point policy) and nonnegative (the Gini domain)."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        require_integer_cols(batch_df, [value_col], "gini_lorenz_foreach_batch")
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
        merged = merged.localCheckpoint(eager=True)  # render twice, scan once
        write_batch_scores(
            gini_from_counts(merged), f"{scores_path}/gini", batch_id
        )
        write_batch_scores(
            lorenz_from_counts(merged, buckets), f"{scores_path}/lorenz", batch_id
        )
        store.overwrite(merged, meta={"batch_id": int(batch_id)})

    return step
