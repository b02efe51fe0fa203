"""Streaming Misra-Gries e2e: foreachBatch over real micro-batches
maintains an m-counter store whose bounds contract
(``est <= true <= est + delta``, no false negatives above
``N/(m+1)``) holds after every merge/compaction — and replays are
no-ops (the non-idempotent count merge is gated by the fully-applied
guard)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import types as T

from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.mg import mg_foreach_batch

SCHEMA = T.StructType([T.StructField("tokn", T.StringType(), True)])

M = 8


def _batch1():
    # heavy: x (30), y (20); tail: 40 singletons
    return [("x",)] * 30 + [("y",)] * 20 + [(f"t{i}",) for i in range(40)]


def _batch2():
    # heavy: x (+25), z (35); tail: 30 fresh singletons
    return [("x",)] * 25 + [("z",)] * 35 + [(f"u{i}",) for i in range(30)]


def test_streaming_mg_bounds_and_replay(spark, tmp_path):
    d = tmp_path / "mg_stream"
    d.mkdir()
    spark.createDataFrame(_batch1(), SCHEMA).coalesce(1).write.parquet(
        str(d / "b1")
    )
    spark.createDataFrame(_batch2(), SCHEMA).coalesce(1).write.parquet(
        str(d / "b2")
    )
    store = VersionedTable(spark, tmp_path / "mg_store")
    scores_path = str(tmp_path / "mg_scores")
    step = mg_foreach_batch(store, scores_path, value_col="tokn", m=M)

    ev = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    q = (
        ev.writeStream.foreachBatch(step)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    true = Counter(t for (t,) in _batch1() + _batch2())
    n = sum(true.values())
    got = {r["item"]: r["est"] for r in store.read().collect()}
    delta = int(store.manifest().meta.get("delta", 0))

    # bounded state
    assert len(got) <= M
    # est <= true <= est + delta for every surviving counter
    for item, est in got.items():
        assert est <= true[item] <= est + delta
    # no false negatives: anything with freq > N/(m+1) must survive
    for item, cnt in true.items():
        if cnt > n / (M + 1):
            assert item in got, (item, cnt, n)
    # the two clear heavy hitters lead the summary
    top2 = sorted(got, key=lambda it: -got[it])[:2]
    assert set(top2) == {"x", "z"}

    # replay the LAST batch id by hand: store must be unchanged
    before = sorted(got.items())
    last_id = int(store.manifest().meta["batch_id"])
    step(spark.createDataFrame(_batch2(), SCHEMA), last_id)
    after = sorted(
        (r["item"], r["est"]) for r in store.read().collect()
    )
    assert after == before
    assert int(store.manifest().meta.get("delta", 0)) == delta
