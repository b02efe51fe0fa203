"""Streaming exact-dedup e2e: duplicate documents suppressed across
REAL micro-batches (file source, one file per batch, availableNow),
with watermark-bounded state."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from rootstock_collective_state_sync_spark.streaming.dedup import dedup_stream

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def _t(hh: int, mm: int = 0) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1, hh, mm)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    """batch 1: doc 1, doc 2 (an in-batch re-delivery of doc 1 with
    different casing/whitespace), doc 3.
    batch 2: doc 4 (cross-batch re-delivery of doc 1, inside the
    horizon), doc 5 (new content).
    """
    d = tmp_path / "docs_stream"
    d.mkdir()
    b1 = spark.createDataFrame(
        [
            (1, _t(10, 0), "the quick brown fox"),
            (2, _t(10, 1), "THE  Quick   Brown FOX"),
            (3, _t(10, 2), "something else entirely"),
        ],
        SCHEMA,
    )
    b2 = spark.createDataFrame(
        [
            (4, _t(10, 5), "the QUICK brown fox"),
            (5, _t(10, 6), "genuinely novel content"),
        ],
        SCHEMA,
    )
    b1.coalesce(1).write.parquet(str(d / "a_batch1"))
    b2.coalesce(1).write.parquet(str(d / "b_batch2"))
    return d


def test_streaming_dedup_suppresses_within_and_across_batches(spark, stream_dir):
    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*")
    )
    q = (
        dedup_stream(ev, horizon="10 minutes")
        .writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT doc_id FROM t_dedup_stream ORDER BY doc_id").collect()
    # doc 2 (in-batch dup) and doc 4 (cross-batch dup within horizon)
    # are suppressed; 1, 3, 5 survive
    assert [r.doc_id for r in rows] == [1, 3, 5]


def test_streaming_dedup_key_matches_batch_pass(spark):
    """The streaming tier uses the identical content identity as the
    at-rest batch pass — same md5 over the same normalization."""
    from pyspark.sql import functions as F

    from rootstock_collective_state_sync_spark.operators.dedup import (
        exact_groups,
        normalized_hash,
    )

    df = spark.createDataFrame(
        [(1, "A  b\tC"), (2, "a b c")], ["doc_id", "text"]
    )
    hashes = {
        r.h
        for r in df.select(normalized_hash(F.col("text")).alias("h")).collect()
    }
    assert len(hashes) == 1
    batch = exact_groups(df).collect()
    assert batch[0].content_hash in hashes


def test_incremental_near_dups_matches_at_rest(spark):
    """Feeding the corpus in two batches through the incremental path
    must find exactly the pairs the at-rest full pass finds (cap set
    high so no shingle crosses it between batches — the documented
    exact-equivalence regime)."""
    from pyspark.sql import functions as F

    from rootstock_collective_state_sync_spark.operators import dedup as D
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    cap = 10_000
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()
        # at-rest uses cap 100; rerun uncapped for the comparison
    }
    want_uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in D._verified_jaccard(
            D._hashed(D._capped_index(D.shingle_index(docs), cap)),
            D.lsh_candidates(
                D.minhash_signatures(
                    docs, _index=D._capped_index(D.shingle_index(docs), cap)
                )
            ),
            0.5,
        ).collect()
    }
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    empty_sh = spark.createDataFrame([], "id long, s string")
    empty_bd = spark.createDataFrame([], "id long, band int, bh string")
    p1, sh, bd = D.incremental_near_dups(
        b1, empty_sh, empty_bd, threshold=0.5, max_docs_per_shingle=cap
    )
    p2, sh, bd = D.incremental_near_dups(
        b2, sh, bd, threshold=0.5, max_docs_per_shingle=cap
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in p1.collect()}
    got.update({(r.id_a, r.id_b): r.jaccard for r in p2.collect()})
    assert got == want_uncapped
    # sanity: the capped at-rest pass is a subset of the uncapped one
    assert set(want) <= set(want_uncapped)
