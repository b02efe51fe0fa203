"""Streaming market-basket e2e: foreachBatch over basket-aligned
micro-batches maintains a count store whose rendered rules equal the
at-rest operator over the full stream BIT-FOR-BIT (counts over
disjoint basket sets add exactly), and replays are no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from rootstock_collective_state_sync_spark.operators.basket import (
    assoc_rules_from_counts,
    basket_item_counts,
    basket_pair_counts,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.basket import (
    basket_foreach_batch,
    render_rules,
)

SCHEMA = T.StructType(
    [
        T.StructField("bk", T.LongType(), True),
        T.StructField("item", T.StringType(), True),
    ]
)

SUP, CONF = 100_000, 200_000  # 10% support, 20% confidence


def _baskets(lo: int, hi: int):
    # deterministic synthetic baskets: x in every 2nd, y in every 3rd,
    # z rides with x in every 4th — enough structure for stable rules
    rows = []
    for b in range(lo, hi):
        rows.append((b, f"solo{b % 7}"))
        if b % 2 == 0:
            rows.append((b, "x"))
        if b % 3 == 0:
            rows.append((b, "y"))
        if b % 4 == 0:
            rows.append((b, "x"))
            rows.append((b, "z"))
    return rows


def test_streaming_basket_rules_match_at_rest(spark, tmp_path):
    d = tmp_path / "basket_stream"
    d.mkdir()
    # basket-aligned split: baskets [0,30) then [30,75)
    spark.createDataFrame(_baskets(0, 30), SCHEMA).coalesce(1).write.parquet(
        str(d / "b1")
    )
    spark.createDataFrame(_baskets(30, 75), SCHEMA).coalesce(1).write.parquet(
        str(d / "b2")
    )
    store = VersionedTable(spark, tmp_path / "basket_store")
    scores_path = str(tmp_path / "basket_scores")
    step = basket_foreach_batch(store, scores_path, SUP, CONF)

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

    # at-rest rules over the full stream
    full = spark.createDataFrame(_baskets(0, 75), SCHEMA).distinct()
    n = full.select("bk").distinct().count()
    want = sorted(
        tuple(r)
        for r in assoc_rules_from_counts(
            n,
            basket_item_counts(full),
            basket_pair_counts(full),
            SUP,
            CONF,
        ).collect()
    )
    assert want, "fixture must yield at least one rule"

    got = sorted(tuple(r) for r in render_rules(store, SUP, CONF).collect())
    assert got == want

    # the last batch's rendered scores equal the final render too
    latest = (
        spark.read.parquet(scores_path)
        .filter(F.col("batch") == F.lit(1))
        .drop("batch")
    )
    assert sorted(tuple(r) for r in latest.collect()) == want

    # replay no-op: re-run the last applied batch id
    before = sorted(tuple(r) for r in store.read().collect())
    last_id = int(store.manifest().meta["batch_id"])
    step(spark.createDataFrame(_baskets(30, 75), SCHEMA), last_id)
    assert sorted(tuple(r) for r in store.read().collect()) == before
