"""Watermark-bounded streaming basket e2e (X-ST13 treatment for the
basket leg): shuffled arrival WITHIN the lateness horizon equals the
at-rest pipeline bit-for-bit once the watermark passes; fragments of
already-finalized baskets are dropped to the late log, never merged;
replays are no-ops."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F, types as T

from rootstock_collective_state_sync_spark.operators.basket import (
    assoc_rules_from_counts,
    basket_item_counts,
    basket_pair_counts,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.basket_late import (
    _rules,
    basket_late_foreach_batch,
)
from tests.test_streaming_basket import SCHEMA, SUP, CONF, _baskets


def _at_rest(spark, lo, hi):
    full = spark.createDataFrame(_baskets(lo, hi), SCHEMA).distinct()
    n = full.select("bk").distinct().count()
    return sorted(
        tuple(r)
        for r in assoc_rules_from_counts(
            n,
            basket_item_counts(full),
            basket_pair_counts(full),
            SUP,
            CONF,
        ).collect()
    )


def test_shuffled_arrival_within_horizon_matches_at_rest(spark, tmp_path):
    """Basket fragments straddle batch boundaries IN BOTH DIRECTIONS
    (rows of basket b arrive across two batches, later batch carries
    earlier keys) — the strict leg would raise on every batch after
    the first; the late leg absorbs it within the horizon and the
    final render equals at-rest exactly."""
    rows = _baskets(0, 60)
    # interleave: batch 1 gets even-indexed rows of baskets [0,40),
    # batch 2 gets the odd-indexed remainder PLUS baskets [40,60) —
    # every shared basket straddles the boundary
    b1 = [r for i, r in enumerate(rows) if r[0] < 40 and i % 2 == 0]
    b2 = [r for i, r in enumerate(rows) if r[0] < 40 and i % 2 == 1]
    b2 += [r for r in rows if r[0] >= 40]
    store = VersionedTable(spark, tmp_path / "store")
    step = basket_late_foreach_batch(
        store,
        str(tmp_path / "scores"),
        str(tmp_path / "late"),
        allowed_lateness_bk=50,
        min_sup_e6=SUP,
        min_conf_e6=CONF,
    )
    step(spark.createDataFrame(b1, SCHEMA), 0)
    step(spark.createDataFrame(b2, SCHEMA), 1)
    # flush: one fresh basket far ahead pushes the watermark past 60
    step(spark.createDataFrame([(200, "x"), (200, "z")], SCHEMA), 2)

    want = _at_rest(spark, 0, 60)
    assert want, "fixture must yield rules"
    # rendered scores of the flush batch = finalized ⊕ pending =
    # every non-dropped row; nothing was beyond-horizon here
    got_all = sorted(
        tuple(r)
        for r in spark.read.parquet(
            str(tmp_path / "scores" / "batch=2")
        ).collect()
    )
    want_all = _at_rest_with(spark, rows + [(200, "x"), (200, "z")])
    assert got_all == want_all
    # the late log is empty across all batches
    late_files = glob.glob(str(tmp_path / "late" / "batch=*"))
    total_late = sum(
        spark.read.parquet(p).count() for p in late_files if _has_data(p)
    )
    assert total_late == 0
    # finalized counts alone (store, kinds N/I/P) cover baskets <= wm
    # = 200 - 50: exactly [0,60) ∪ nothing pending from them
    fin = store.read().filter(F.col("kind") != "E")
    got_fin = sorted(tuple(r) for r in _rules(fin, SUP, CONF).collect())
    assert got_fin == want


def _at_rest_with(spark, rows):
    full = spark.createDataFrame(rows, SCHEMA).distinct()
    n = full.select("bk").distinct().count()
    return sorted(
        tuple(r)
        for r in assoc_rules_from_counts(
            n,
            basket_item_counts(full),
            basket_pair_counts(full),
            SUP,
            CONF,
        ).collect()
    )


def _has_data(path):
    return bool(glob.glob(f"{path}/*.parquet"))


def test_beyond_horizon_fragment_dropped_and_logged(spark, tmp_path):
    """A fragment of a basket at or below the finalize boundary is
    logged to late/, never merged (merging would double-count), and
    the counts equal at-rest over the non-dropped rows only."""
    store = VersionedTable(spark, tmp_path / "store")
    step = basket_late_foreach_batch(
        store,
        str(tmp_path / "scores"),
        str(tmp_path / "late"),
        allowed_lateness_bk=5,
        min_sup_e6=SUP,
        min_conf_e6=CONF,
    )
    step(spark.createDataFrame(_baskets(0, 40), SCHEMA), 0)  # wm = 34
    # basket 2 was finalized in batch 0: this fragment must drop
    step(
        spark.createDataFrame([(2, "LATE-ITEM"), (41, "x")], SCHEMA), 1
    )
    late = spark.read.parquet(str(tmp_path / "late" / "batch=1"))
    assert [tuple(r) for r in late.collect()] == [(2, "LATE-ITEM")]
    assert store.read().filter(F.col("a") == "LATE-ITEM").count() == 0


def test_replayed_batch_is_noop(spark, tmp_path):
    store = VersionedTable(spark, tmp_path / "store")
    step = basket_late_foreach_batch(
        store,
        str(tmp_path / "scores"),
        str(tmp_path / "late"),
        allowed_lateness_bk=10,
        min_sup_e6=SUP,
        min_conf_e6=CONF,
    )
    step(spark.createDataFrame(_baskets(0, 30), SCHEMA), 0)
    before = sorted(tuple(r) for r in store.read().collect())
    step(spark.createDataFrame(_baskets(0, 30), SCHEMA), 0)  # replay
    after = sorted(tuple(r) for r in store.read().collect())
    assert before == after
