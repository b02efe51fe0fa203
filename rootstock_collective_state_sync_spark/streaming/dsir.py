"""Streaming DSIR scoring: the incremental
:func:`..operators.text.dsir_increment` driven by Structured Streaming
``foreachBatch``, with the hashed-n-gram model counts kept in the
engine's own :class:`..sinks.table.VersionedTable` (same recovery
contract as :mod:`.novelty`: reads see the previous committed version,
the atomic pointer swing makes a mid-batch crash recoverable, and the
count merge is a plain sum — re-running a replayed batch against the
last COMMITTED store converges to the same state).

Scoring is prequential (progressive validation): each micro-batch is
scored by the model as of its own arrival (post-merge), so early docs
carry early-model scores — the online analog of the paper's static
weights. The final store equals the at-rest model exactly; re-scoring
any corpus against it reproduces the batch operator bit-for-bit
(``tests/test_streaming_dsir.py``).

Scale shape: per micro-batch cost is batch-sized + one ≤ B-row store
merge; the corpus is never re-scanned and the store never exceeds
``num_buckets`` rows — a control-plane table no matter how much data
has streamed through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T

from rootstock_collective_state_sync_spark.operators.text import dsir_increment
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable

STORE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("c_raw", T.LongType(), False),
        T.StructField("c_tgt", T.LongType(), False),
    ]
)


def dsir_foreach_batch(
    store: VersionedTable,
    scores_path: str,
    target_col: str = "is_target",
    num_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Return the ``foreachBatch`` function maintaining the bucket
    count ``store`` and appending per-batch DSIR scores to
    ``scores_path``."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        created = store.create_if_not_exists(
            STORE_SCHEMA, merge_keys=["bucket"], num_buckets=4
        )
        prev = None if created else store.read().select(
            "bucket", "c_raw", "c_tgt"
        )
        if prev is not None and prev.isEmpty():
            prev = None
        updated, scores = dsir_increment(
            batch_df,
            prev,
            target_col=target_col,
            num_buckets=num_buckets,
            id_col=id_col,
            text_col=text_col,
        )
        # Materialize scores BEFORE the store advances: they are
        # defined against the post-merge model of THIS batch, computed
        # from the last COMMITTED prev — idempotent under replay.
        scores.write.mode("append").parquet(scores_path)
        store.overwrite(updated, meta={"batch_id": int(batch_id)})

    return step
