"""Streaming DSIR e2e: the foreachBatch incremental path over real
micro-batches (file source, one file per trigger) maintains a model
store that equals the at-rest bucket counts exactly, scores each batch
prequentially (batch 1 == at-rest DSIR on batch 1 alone), and
re-scoring the full corpus against the final store reproduces the
batch operator bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from rootstock_collective_state_sync_spark.operators.text import (
    _dsir_bucket_counts,
    _dsir_doc_scores,
    _dsir_gram_buckets,
    _dsir_weights,
    dsir_log_ratio,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.dsir import (
    dsir_foreach_batch,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("is_target", T.BooleanType(), True),
    ]
)

DOCS = [
    (1, "clean prose about science and careful reasoning", True),
    (2, "the quick brown fox jumps over the lazy dog", False),
    (3, "clean prose about careful science writing", False),
    (4, "zzz qqq spam spam buy now zzz qqq", False),
]
B = 64


@pytest.fixture()
def stream_dir(spark, tmp_path):
    d = tmp_path / "dsir_stream"
    d.mkdir()
    spark.createDataFrame(DOCS[:2], SCHEMA).coalesce(1).write.parquet(
        str(d / "a_batch1")
    )
    spark.createDataFrame(DOCS[2:], SCHEMA).coalesce(1).write.parquet(
        str(d / "b_batch2")
    )
    return d


def test_streaming_dsir_store_and_scores(spark, stream_dir, tmp_path):
    store = VersionedTable(spark, tmp_path / "dsir_store")
    scores_path = str(tmp_path / "dsir_scores")

    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*")
    )
    q = (
        ev.writeStream.foreachBatch(
            dsir_foreach_batch(store, scores_path, num_buckets=B)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    full = spark.createDataFrame(DOCS, SCHEMA)
    bkt_full = _dsir_gram_buckets(full, "is_target", B, "doc_id", "text")

    # 1. final store == at-rest model counts, exactly
    got_store = {
        r["bucket"]: (r["c_raw"], r["c_tgt"])
        for r in store.read().collect()
    }
    want_store = {
        r["bucket"]: (r["c_raw"], r["c_tgt"])
        for r in _dsir_bucket_counts(bkt_full).collect()
    }
    assert got_store == want_store

    # 2. re-scoring the full corpus against the final store == the
    # at-rest operator, bit-for-bit
    rescored = {
        r["doc_id"]: (r["n_grams"], r["lr_e6"], r["mean_lr"])
        for r in _dsir_doc_scores(
            full, bkt_full, _dsir_weights(store.read(), B), "doc_id"
        ).collect()
    }
    at_rest = {
        r["doc_id"]: (r["n_grams"], r["lr_e6"], r["mean_lr"])
        for r in dsir_log_ratio(full, num_buckets=B).collect()
    }
    assert rescored == at_rest

    # 3. prequential: batch-1 scores == at-rest DSIR on batch 1 alone
    streamed = {
        r["doc_id"]: (r["n_grams"], r["lr_e6"], r["mean_lr"])
        for r in spark.read.parquet(scores_path).collect()
    }
    assert set(streamed) == {1, 2, 3, 4}
    b1 = spark.createDataFrame(DOCS[:2], SCHEMA)
    b1_at_rest = {
        r["doc_id"]: (r["n_grams"], r["lr_e6"], r["mean_lr"])
        for r in dsir_log_ratio(b1, num_buckets=B).collect()
    }
    assert streamed[1] == b1_at_rest[1] and streamed[2] == b1_at_rest[2]

    # 4. one committed store version per non-empty batch, plus the
    # empty create commit
    assert store.current_version() == 3
