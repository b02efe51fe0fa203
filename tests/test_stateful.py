"""applyInPandasWithState e2e: exact accumulation across micro-batches
and event-time state eviction, under a REAL streaming query (file
source, one file per micro-batch, availableNow)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from rootstock_collective_state_sync_spark.streaming.stateful import (
    user_running_totals,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _t(hh: int, mm: int = 0) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1, hh, mm)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    """Two files -> two micro-batches (file order by name with
    maxFilesPerTrigger=1).

    batch 1: user 1 @ 13:00 (2.50), user 2 @ 10:00 (1.00)
    batch 2: user 1 @ 13:30 (0.25)

    After batch 1 the watermark advances to 12:00 (max 13:00 − 1 h);
    user 2's timeout (10:10) is already behind it, so batch 2 both
    accumulates user 1 AND evicts user 2 with a terminal row.
    """
    d = tmp_path / "stream"
    d.mkdir()
    b1 = spark.createDataFrame(
        [(1, _t(13), 2.50), (2, _t(10), 1.00)], SCHEMA
    )
    b2 = spark.createDataFrame([(1, _t(13, 30), 0.25)], SCHEMA)
    b1.coalesce(1).write.parquet(str(d / "a_batch1"))
    b2.coalesce(1).write.parquet(str(d / "b_batch2"))
    return d


def test_stateful_accumulation_and_eviction(spark, stream_dir):
    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*")
    )
    q = (
        user_running_totals(ev, watermark="1 hour", idle_minutes=10)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM t_stateful ORDER BY user_id, n_events"
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (r.total_cents, r.n_events, r.finalized)
        )
    # user 1: emitted after each batch, exact cents, never finalized
    assert by_user[1] == [(250, 1, False), (275, 2, False)]
    # user 2: one live emission, then the eviction terminal row
    assert by_user[2] == [(100, 1, False), (100, 1, True)]


def test_stateful_state_not_resurrected(spark, stream_dir, tmp_path):
    """After eviction, a returning user starts from zero — proof the
    state really was removed, not kept warm."""
    d = stream_dir
    b3 = spark.createDataFrame([(2, _t(14), 5.00)], SCHEMA)
    b3.coalesce(1).write.parquet(str(d / "c_batch3"))
    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        user_running_totals(ev, watermark="1 hour", idle_minutes=10)
        .writeStream.format("memory")
        .queryName("t_stateful2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT * FROM t_stateful2 WHERE user_id = 2 ORDER BY n_events, finalized"
    ).collect()
    seq = [(r.total_cents, r.n_events, r.finalized) for r in rows]
    # live @10:00, terminal eviction, then a FRESH accumulation @14:00
    assert (100, 1, True) in seq
    assert (500, 1, False) in seq


# ---------------------------------------------------------------------------
# transformWithStateInPandas: batch==stream equivalence for decay scores
# ---------------------------------------------------------------------------

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


@pytest.fixture()
def decay_stream_dir(spark, tmp_path):
    """Two time-split micro-batches (no key timeline interleave):
    batch 1 = events before 12:00, batch 2 = the rest."""
    rows = [
        (1, _t(10, 0), 7, 10.0),
        (2, _t(10, 30), 7, 20.0),
        (3, _t(11, 0), 8, 5.0),
        (4, _t(13, 0), 7, 40.0),
        (5, _t(13, 30), 8, 2.5),
        (6, _t(14, 0), 7, 1.0),
    ]
    d = tmp_path / "decay_stream"
    d.mkdir()
    b1 = spark.createDataFrame([r for r in rows if r[1] < _t(12)], EV_SCHEMA)
    b2 = spark.createDataFrame([r for r in rows if r[1] >= _t(12)], EV_SCHEMA)
    b1.coalesce(1).write.parquet(str(d / "a_batch1"))
    b2.coalesce(1).write.parquet(str(d / "b_batch2"))
    return d, rows


def test_stream_decayed_scores_match_batch(spark, decay_stream_dir):
    from rootstock_collective_state_sync_spark.operators.temporal import (
        time_decayed_score,
    )
    from rootstock_collective_state_sync_spark.streaming.stateful import (
        stream_decayed_scores,
    )

    d, rows = decay_stream_dir
    ev = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        stream_decayed_scores(ev)
        .writeStream.format("memory")
        .queryName("decay_scores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: r["score_e6"]
        for r in spark.sql("select * from decay_scores").collect()
    }
    batch_df = spark.createDataFrame(rows, EV_SCHEMA)
    want = {
        r["event_id"]: r["score_e6"]
        for r in time_decayed_score(batch_df).collect()
    }
    assert got == want and len(got) == 6


def test_stream_transitions_match_batch_lag(spark, tmp_path):
    from collections import Counter

    from pyspark.sql import Window, functions as F

    from rootstock_collective_state_sync_spark.streaming.stateful import (
        stream_event_transitions,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
        ]
    )
    rows = [
        (1, _t(9), 7, "view"),
        (2, _t(10), 7, "cart"),
        (3, _t(10, 30), 8, "view"),
        (4, _t(13), 7, "buy"),
        (5, _t(13, 30), 8, "view"),
        (6, _t(14), 8, "buy"),
    ]
    d = tmp_path / "tx_stream"
    d.mkdir()
    spark.createDataFrame(
        [r for r in rows if r[1] < _t(12)], schema
    ).coalesce(1).write.parquet(str(d / "a_b1"))
    spark.createDataFrame(
        [r for r in rows if r[1] >= _t(12)], schema
    ).coalesce(1).write.parquet(str(d / "b_b2"))
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        stream_event_transitions(ev)
        .writeStream.format("memory")
        .queryName("tx_steps")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = Counter(
        (r["user_id"], r["prev_type"], r["next_type"])
        for r in spark.sql("select * from tx_steps").collect()
    )
    batch = spark.createDataFrame(rows, schema)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = Counter(
        (r["user_id"], r["prev_type"], r["next_type"])
        for r in batch.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .collect()
    )
    assert got == want and sum(got.values()) == 4


def test_stream_session_paths_match_batch(spark, tmp_path):
    """batch==stream for trigram path mining, including a session gap
    that must RESET the trigram buffer (no path spans the border)."""
    from collections import Counter

    from rootstock_collective_state_sync_spark.streaming.stateful import (
        stream_session_paths,
    )

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
        ]
    )
    rows = [
        # user 7 session 1: view > cart > buy (one trigram)
        (1, _t(9, 0), 7, "view"),
        (2, _t(9, 3), 7, "cart"),
        (3, _t(9, 6), 7, "buy"),
        # >10 min gap: new session — view > view > buy only
        (4, _t(13, 0), 7, "view"),
        (5, _t(13, 2), 7, "view"),
        (6, _t(13, 4), 7, "buy"),
        # user 8: 4 events in one session -> two trigrams
        (7, _t(9, 0), 8, "view"),
        (8, _t(9, 1), 8, "view"),
        (9, _t(13, 1), 8, "cart"),   # crosses micro-batch, NOT a gap
        (10, _t(13, 2), 8, "buy"),
    ]
    # batch 2 events must stay in-session for user 8: gap 13:01-9:01 is
    # > 10 min, so adjust: keep user 8 events close together
    rows = [r for r in rows if r[0] < 7] + [
        (7, _t(12, 55), 8, "view"),
        (8, _t(12, 58), 8, "view"),
        (9, _t(13, 1), 8, "cart"),
        (10, _t(13, 2), 8, "buy"),
    ]
    d = tmp_path / "paths_stream"
    d.mkdir()
    spark.createDataFrame(
        [r for r in rows if r[1] < _t(12)], schema
    ).coalesce(1).write.parquet(str(d / "a_b1"))
    spark.createDataFrame(
        [r for r in rows if r[1] >= _t(12)], schema
    ).coalesce(1).write.parquet(str(d / "b_b2"))
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        stream_session_paths(ev)
        .writeStream.format("memory")
        .queryName("sess_paths")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = Counter(
        (r["user_id"], r["path"])
        for r in spark.sql("select * from sess_paths").collect()
    )
    assert got == Counter(
        {
            (7, "view>cart>buy"): 1,
            (7, "view>view>buy"): 1,
            (8, "view>view>cart"): 1,
            (8, "view>cart>buy"): 1,
        }
    )

    # multiset equality with the BATCH session_paths trigram stream
    from rootstock_collective_state_sync_spark.plans.analytics import (
        q_session_paths,
    )

    bdir = tmp_path / "paths_batch"
    spark.createDataFrame(rows, schema).write.parquet(str(bdir / "events.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        pass  # q_session_paths loads only `events`
    batch = {
        (r["path"], r["n_occurrences"])
        for r in q_session_paths(spark, str(bdir)).collect()
    }
    stream_counts = Counter(p for _, p in got.elements())
    assert batch == {(p, n) for p, n in stream_counts.items()}
