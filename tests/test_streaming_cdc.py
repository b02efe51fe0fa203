"""Streaming chunk-dup e2e: the foreachBatch incremental CDC path
over REAL micro-batches (file source, one file per trigger) produces
the same per-document dup census as the at-rest batch pass over the
full corpus, and the versioned chunk-owner store equals the at-rest
owner table."""

from __future__ import annotations

from pyspark.sql import types as T

from rootstock_collective_state_sync_spark.operators.text import (
    cdc_chunks,
    cdc_dup_stats,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.cdc import cdc_foreach_batch

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "on and the river runs through the quiet valley toward the sea"
)
DOCS = [
    (1, BASE),
    (2, "completely different content about spacecraft telemetry and orbits"),
    (3, "EDITED " + BASE),  # near-copy arriving in a later batch
    (4, BASE),  # exact re-crawl, later batch
]


def test_streaming_cdc_matches_batch(spark, tmp_path):
    d = tmp_path / "cdc_stream"
    d.mkdir()
    spark.createDataFrame(DOCS[:2], SCHEMA).coalesce(1).write.parquet(
        str(d / "a_batch1")
    )
    spark.createDataFrame(DOCS[2:], SCHEMA).coalesce(1).write.parquet(
        str(d / "b_batch2")
    )

    store = VersionedTable(spark, tmp_path / "cdc_store")
    scores_path = str(tmp_path / "cdc_scores")
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
        .writeStream.foreachBatch(cdc_foreach_batch(store, scores_path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    cols = (
        "n_chunks",
        "n_dup_chunks",
        "dup_chars",
        "total_chars",
        "dup_char_ratio",
    )
    got = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in spark.read.parquet(scores_path).collect()
    }
    batch_df = spark.createDataFrame(DOCS, SCHEMA)
    want = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in cdc_dup_stats(batch_df).collect()
    }
    assert got == want
    assert want[4][4] == 1.0  # the exact re-crawl is 100% duplicated
    assert want[3][4] > 0.5  # the edited near-copy re-aligns

    # store state == at-rest min-owner table over the full corpus
    at_rest = {
        (r["chunk_hash"], r["first_id"])
        for r in cdc_chunks(batch_df)
        .groupBy("chunk_hash")
        .agg({"doc_id": "min"})
        .withColumnRenamed("min(doc_id)", "first_id")
        .collect()
    }
    streamed = {
        (r["chunk_hash"], r["first_id"])
        for r in store.read().select("chunk_hash", "first_id").collect()
    }
    assert streamed == at_rest
    assert store.current_version() >= 3  # create + 2 batch commits
