"""Incremental Benford census e2e: stream == at-rest bit-for-bit at
every prefix (the census is an order-invariant mergeable bag
aggregate), shuffled batch split irrelevant, replay no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators.profile import (
    benford_audit,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.benford import (
    benford_foreach_batch,
)
from tests.conftest import SF_SMOKE


def _orders(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    return load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice"
    )


def test_stream_equals_at_rest_at_every_prefix(spark, tmp_path):
    orders = _orders(spark).cache()
    b1 = orders.filter(F.col("o_orderkey") % 3 != 0)
    b2 = orders.filter(F.col("o_orderkey") % 3 == 0)
    store = VersionedTable(spark, tmp_path / "store")
    step = benford_foreach_batch(
        store, str(tmp_path / "scores"), "o_totalprice", cents=True
    )
    step(b1, 0)
    got1 = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/batch=0")).collect()
    )
    want1 = sorted(tuple(r) for r in benford_audit(b1, "o_totalprice").collect())
    assert got1 == want1
    step(b2, 1)
    got2 = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/batch=1")).collect()
    )
    want2 = sorted(
        tuple(r) for r in benford_audit(orders, "o_totalprice").collect()
    )
    assert got2 == want2
    # replay no-op
    before = sorted(tuple(r) for r in store.read().collect())
    step(b2, 1)
    assert sorted(tuple(r) for r in store.read().collect()) == before
    orders.unpersist()
