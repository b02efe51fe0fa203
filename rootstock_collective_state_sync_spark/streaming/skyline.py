"""Streaming 2-D skyline maintenance: the Pareto front of
:mod:`..operators.skyline` kept current over a stream via
``foreachBatch``, with the frontier itself as the store state
(same store/commit/replay contract as :mod:`.kmv`).

The skyline merge law makes this lossless AND idempotent:
``skyline(A ∪ B) == skyline(skyline(A) ∪ B)`` — dominated rows can
never dominate anything, so dropping them early loses nothing; and
re-merging an already-applied batch is a no-op set-wise (the replay
guard still gates it, by convention, so replays skip even the wasted
work). After any number of micro-batches the store EQUALS the at-rest
:func:`..operators.skyline.skyline_2d` over the full stream
(pinned by ``tests/test_streaming_skyline.py``).

Scale shape: per micro-batch cost is one batch-sized local skyline +
a merge over (store ∪ batch-skyline) — both bounded by the frontier
size, which is the number of distinct Pareto-optimal trade-off
points, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from rootstock_collective_state_sync_spark.operators.skyline import skyline_2d
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.replay import (
    batch_already_applied,
    write_batch_scores,
)

STORE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.LongType(), False),
    ]
)


def skyline_foreach_batch(
    store: VersionedTable,
    scores_path: str,
    bucket_width: int = 100,
):
    """Return the ``foreachBatch`` function maintaining the Pareto
    frontier (minimize ``x``, maximize ``y``) of everything streamed
    so far. Batch rows: ``(id, x, y)``. The post-merge frontier is
    both the store state and the per-batch score snapshot."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        created = store.create_if_not_exists(
            STORE_SCHEMA, merge_keys=["id"], num_buckets=4
        )
        if not created and batch_already_applied(store, batch_id):
            return
        merged = skyline_2d(
            store.read()
            .select("id", "x", "y")
            .unionByName(batch_df.select("id", "x", "y")),
            minimize="x",
            maximize="y",
            bucket=F.expr(f"CAST(x AS BIGINT) div {bucket_width}"),
        ).select("id", "x", "y")
        write_batch_scores(merged, scores_path, batch_id)
        store.overwrite(merged, meta={"batch_id": int(batch_id)})

    return step
