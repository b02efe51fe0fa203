"""Streaming novelty e2e: the foreachBatch incremental path over REAL
micro-batches (file source, one file per trigger) produces the same
per-document scores as the at-rest batch pass over the full corpus,
and the versioned gram-owner store advances one committed version per
batch."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rootstock_collective_state_sync_spark.operators.dedup import ngram_novelty
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.novelty import (
    novelty_foreach_batch,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

BASE = "the quick brown fox jumps over the lazy dog"
DOCS = [
    (1, BASE),
    (2, "completely different words entirely here today friends"),
    (3, BASE),  # exact re-scrape of doc 1, later batch
    (4, BASE + " and runs far away"),
]


@pytest.fixture()
def stream_dir(spark, tmp_path):
    d = tmp_path / "novelty_stream"
    d.mkdir()
    b1 = spark.createDataFrame(DOCS[:2], SCHEMA)
    b2 = spark.createDataFrame(DOCS[2:], SCHEMA)
    b1.coalesce(1).write.parquet(str(d / "a_batch1"))
    b2.coalesce(1).write.parquet(str(d / "b_batch2"))
    return d


def test_streaming_novelty_matches_batch(spark, stream_dir, tmp_path):
    store = VersionedTable(spark, tmp_path / "novelty_store")
    scores_path = str(tmp_path / "novelty_scores")

    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*")
    )
    q = (
        ev.writeStream.foreachBatch(
            novelty_foreach_batch(store, scores_path)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: (r["n_grams"], r["n_first"], r["novelty_e6"])
        for r in spark.read.parquet(scores_path).collect()
    }
    batch_df = spark.createDataFrame(DOCS, SCHEMA)
    want = {
        r["doc_id"]: (r["n_grams"], r["n_first"], r["novelty_e6"])
        for r in ngram_novelty(batch_df).collect()
    }
    assert got == want
    assert want[3][2] == 0  # the re-scrape is flagged dead-zero novelty

    # store state == at-rest store over the full corpus, and the
    # version history shows one committed version per non-empty batch
    from rootstock_collective_state_sync_spark.operators.dedup import (
        novelty_store,
    )

    at_rest = {
        (r["gram_hash"], r["first_id"])
        for r in novelty_store(batch_df).collect()
    }
    streamed = {
        (r["gram_hash"], r["first_id"])
        for r in store.read().select("gram_hash", "first_id").collect()
    }
    assert streamed == at_rest
    assert store.current_version() >= 3  # create + 2 batch commits
