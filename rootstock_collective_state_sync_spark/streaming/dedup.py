"""Streaming exact deduplication: suppress duplicate documents across
micro-batches with bounded state.

The batch dedup family (:mod:`..operators.dedup`) assumes the corpus
is at rest; a training-data INGEST pipeline sees the stream as it
lands and must drop re-deliveries / re-crawls on the fly. Spark's
``dropDuplicatesWithinWatermark`` holds each key only until the
watermark passes it, so state is bounded by the duplicate-arrival
horizon instead of growing with all-time corpus size — the property
that keeps this viable on an unbounded 100 TB feed. Duplicates
farther apart than the horizon are left for the at-rest batch pass
(`operators.dedup.exact_groups`) — the standard two-tier design.

The dedup key is the same normalized-content hash the batch pass uses
(lower + whitespace-collapse + md5), so the two tiers agree on what
"duplicate" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: normalized content hash — identical expression to
#: operators.dedup.exact_groups (one definition of "same document")
def content_hash(text_col) -> "F.Column":
    from rootstock_collective_state_sync_spark.operators.dedup import (
        normalized_hash,
    )

    return normalized_hash(text_col)


def dedup_stream(
    stream: DataFrame,
    time_col: str = "event_time",
    text_col: str = "text",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop exact-duplicate documents arriving within ``horizon`` of
    the original. Event-time watermark bounds the per-key state; the
    first arrival (by stream order) wins, matching the batch keeper
    rule only when ingest order is id order — at-rest reconciliation
    stays authoritative for keeper choice.
    """
    return (
        stream.withColumn("content_hash", content_hash(F.col(text_col)))
        .withWatermark(time_col, horizon)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
