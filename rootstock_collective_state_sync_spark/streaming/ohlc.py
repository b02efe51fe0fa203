"""Streaming OHLC bar maintenance: the mergeable
:func:`..operators.temporal.ohlc_partial` aggregate driven by
Structured Streaming ``foreachBatch``, with the per-(key, bucket)
partial bars kept in the engine's own
:class:`..sinks.table.VersionedTable` (the :mod:`.novelty`
store/commit/replay contract).

Every OHLC accumulator is associative and commutative — struct-min /
struct-max on the (ts, id)-coordinated open/close picks, min/max on
high/low, sums on count/volume — so merging each micro-batch's
partials into the store with :func:`..operators.temporal.ohlc_merge`
reproduces the at-rest bars EXACTLY, regardless of how events split
across batches (pinned by ``tests/test_streaming_ohlc.py``). The
count/volume sums are NOT idempotent, so fully-applied replays are
skipped via the :mod:`.replay` batch_id guard; per-batch rendered
bars land under batch-keyed score paths.

Scale shape: per micro-batch cost is one map-side-combined batch
aggregation + a merge bounded by the store (keys x buckets rows —
control-plane); raw events are never retained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T

from rootstock_collective_state_sync_spark.operators.temporal import (
    ohlc_merge,
    ohlc_partial,
    ohlc_render,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.replay import (
    batch_already_applied,
    write_batch_scores,
)


def store_schema(key_col: str = "event_type") -> T.StructType:
    return T.StructType(
        [
            T.StructField(key_col, T.StringType(), False),
            T.StructField("bar_ts", T.TimestampNTZType(), False),
            T.StructField("o_t", T.LongType(), False),
            T.StructField("o_id", T.LongType(), False),
            T.StructField("open_c", T.LongType(), False),
            T.StructField("c_t", T.LongType(), False),
            T.StructField("c_id", T.LongType(), False),
            T.StructField("close_c", T.LongType(), False),
            T.StructField("high_c", T.LongType(), False),
            T.StructField("low_c", T.LongType(), False),
            T.StructField("n_events", T.LongType(), False),
            T.StructField("volume_c", T.LongType(), False),
        ]
    )


def ohlc_foreach_batch(
    store: VersionedTable,
    scores_path: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bar: str = "hour",
):
    """Return the ``foreachBatch`` function maintaining the partial-bar
    ``store`` and writing each batch's post-merge rendered bars under
    ``scores_path``."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        created = store.create_if_not_exists(
            store_schema(key_col), merge_keys=[key_col, "bar_ts"], num_buckets=4
        )
        # count/volume sums double under replay — skip applied batches
        if not created and batch_already_applied(store, batch_id):
            return
        new_p = ohlc_partial(batch_df, key_col, ts_col, value_col, id_col, bar)
        prev = store.read().select(*[f.name for f in store_schema(key_col)])
        merged = ohlc_merge(prev.unionByName(new_p), key_col)
        write_batch_scores(ohlc_render(merged), scores_path, batch_id)
        store.overwrite(merged, meta={"batch_id": int(batch_id)})

    return step
