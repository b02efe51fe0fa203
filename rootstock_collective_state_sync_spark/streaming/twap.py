"""Streaming TWAP maintenance: the mergeable
:func:`..operators.temporal.twap_partial` aggregate driven by
Structured Streaming ``foreachBatch``, with one partial row per group
kept in the engine's own :class:`..sinks.table.VersionedTable`.

Contract: MONOTONE ARRIVAL — every event in batch N+1 follows every
batch-N event of the same group in the (ts, id) total order (the
append-log ingest order; the same contract as the novelty/CDC
monotone-id stores). Under it, :func:`..operators.temporal.twap_merge2`
bridges the store's last observation to the batch's first with
exactly the segment the at-rest :func:`time_weighted_mean` would
build, so the rendered store equals the batch operator bit-for-bit
(pinned by ``tests/test_streaming_twap.py``). Out-of-order arrival
violates the contract and mis-weights the bridge — since round 11
the step ENFORCES it: a violating batch raises
:class:`.contracts.ArrivalContractError` before any store mutation
(use the batch operator over the at-rest table for late-data
corrections, or the watermark-bounded :mod:`.latebars` twin when
the source genuinely delivers out of order).

The merge's sums are NOT idempotent, so fully-applied replays are
skipped via the :mod:`.replay` batch_id guard; per-batch rendered
TWAPs land under batch-keyed score paths.

Scale shape: per micro-batch cost is one batch-sized window pass +
a groups-bounded full-outer merge; store state is ONE row per group
— control-plane, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T

from rootstock_collective_state_sync_spark.operators.temporal import (
    twap_merge2,
    twap_partial,
    twap_render,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.contracts import (
    check_monotone_groups,
)
from rootstock_collective_state_sync_spark.streaming.replay import (
    batch_already_applied,
    write_batch_scores,
)


def store_schema(group_col: str = "user_id") -> T.StructType:
    return T.StructType(
        [
            T.StructField(group_col, T.LongType(), False),
            T.StructField("first_t", T.LongType(), False),
            T.StructField("first_id", T.LongType(), False),
            T.StructField("first_vc", T.LongType(), False),
            T.StructField("last_t", T.LongType(), False),
            T.StructField("last_id", T.LongType(), False),
            T.StructField("last_vc", T.LongType(), False),
            T.StructField("n_events", T.LongType(), False),
            T.StructField("span_us", T.LongType(), False),
            T.StructField("vdt", T.DecimalType(38, 0), False),
        ]
    )


def twap_foreach_batch(
    store: VersionedTable,
    scores_path: str,
    group_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
):
    """Return the ``foreachBatch`` function maintaining the per-group
    TWAP partial ``store`` and writing each batch's post-merge
    rendered TWAPs under ``scores_path``."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        created = store.create_if_not_exists(
            store_schema(group_col), merge_keys=[group_col], num_buckets=4
        )
        if not created and batch_already_applied(store, batch_id):
            return
        new_p = twap_partial(batch_df, group_col, ts_col, value_col, id_col)
        prev = store.read().select(*[f.name for f in store_schema(group_col)])
        if not created:
            # loud-fail BEFORE mutating: an out-of-order batch would
            # mis-weight the bridge segment (contract enforcement,
            # groups-bounded join — control-plane)
            check_monotone_groups(prev, new_p, group_col, "twap")
        merged = twap_merge2(prev, new_p, group_col)
        write_batch_scores(twap_render(merged, group_col), scores_path, batch_id)
        store.overwrite(merged, meta={"batch_id": int(batch_id)})

    return step
