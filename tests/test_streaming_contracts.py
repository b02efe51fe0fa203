"""Arrival-contract enforcement (r10 verdict item 3): an out-of-order
micro-batch now raises ArrivalContractError BEFORE any store mutation
instead of silently mis-merging — TWAP's monotone-arrival contract and
basket's basket-aligned-batch contract each get a loud runtime check,
and the store provably keeps its last consistent version."""

from __future__ import annotations

import pytest

from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.basket import (
    basket_foreach_batch,
)
from rootstock_collective_state_sync_spark.streaming.contracts import (
    ArrivalContractError,
)
from rootstock_collective_state_sync_spark.streaming.twap import (
    twap_foreach_batch,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).selectExpr(
        "event_id", "user_id", "cast(ts as timestamp_ntz) ts", "value"
    )


def test_twap_out_of_order_batch_raises_and_store_unchanged(spark, tmp_path):
    store = VersionedTable(spark, tmp_path / "store")
    step = twap_foreach_batch(store, str(tmp_path / "scores"))
    step(
        _events(
            spark,
            [
                (1, 1, "2024-01-01 00:00:00.000000", 1.0),
                (2, 1, "2024-01-01 00:00:00.000050", 3.0),
            ],
        ),
        0,
    )
    v = store.current_version()
    want = sorted(map(tuple, store.read().collect()))
    # batch 1 starts BEFORE batch 0's last observation for user 1
    with pytest.raises(ArrivalContractError, match="monotone-arrival"):
        step(
            _events(spark, [(3, 1, "2024-01-01 00:00:00.000020", 9.0)]), 1
        )
    assert store.current_version() == v
    assert sorted(map(tuple, store.read().collect())) == want


def test_twap_equal_ts_tie_is_ordered_by_id(spark, tmp_path):
    """The contract is the (ts, id) TOTAL order: same-timestamp events
    are fine when the id advances, a violation when it does not."""
    store = VersionedTable(spark, tmp_path / "store")
    step = twap_foreach_batch(store, str(tmp_path / "scores"))
    step(_events(spark, [(5, 1, "2024-01-01 00:00:00.000010", 1.0),
                         (6, 1, "2024-01-01 00:00:00.000020", 2.0)]), 0)
    # same ts as the store's last, LOWER id -> violates the total order
    with pytest.raises(ArrivalContractError):
        step(_events(spark, [(4, 1, "2024-01-01 00:00:00.000020", 3.0)]), 1)
    # same ts, HIGHER id -> legal successor
    step(_events(spark, [(7, 1, "2024-01-01 00:00:00.000020", 4.0)]), 2)


def test_twap_new_group_in_later_batch_is_not_a_violation(spark, tmp_path):
    store = VersionedTable(spark, tmp_path / "store")
    step = twap_foreach_batch(store, str(tmp_path / "scores"))
    step(_events(spark, [(1, 1, "2024-01-01 00:00:01", 1.0)]), 0)
    # user 2's history starts earlier in wall time — but it shares no
    # group with the store, so there is nothing to mis-bridge
    step(_events(spark, [(2, 2, "2024-01-01 00:00:00", 5.0)]), 1)
    assert store.read().count() == 2


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "bk long, item string")


def test_basket_straddling_fragment_raises_and_store_unchanged(
    spark, tmp_path
):
    store = VersionedTable(spark, tmp_path / "store")
    step = basket_foreach_batch(store, str(tmp_path / "scores"), 1, 1)
    step(_baskets(spark, [(1, "x"), (1, "y"), (2, "x")]), 0)
    v = store.current_version()
    # basket 2 continues in the next batch -> its items would
    # double-count (2 was already counted as a basket)
    with pytest.raises(ArrivalContractError, match="basket-aligned"):
        step(_baskets(spark, [(2, "z"), (3, "x")]), 1)
    assert store.current_version() == v
    # strictly increasing keys pass
    step(_baskets(spark, [(3, "x"), (4, "y")]), 2)
