"""Incremental equi-depth histogram e2e (X-ST18): stream == at-rest
bit-for-bit at every prefix and under ANY batch split (the per-value
count store is an order-invariant mergeable bag aggregate), replay
no-op, and the counts→report renderer equals the raw-row operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators.profile import (
    equidepth_from_counts,
    equidepth_histogram,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.equidepth import (
    equidepth_foreach_batch,
)
from tests.conftest import SF_SMOKE


def _orders(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    return load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("vc"),
    )


def _at_rest(df, buckets=8):
    return sorted(
        tuple(r)
        for r in equidepth_histogram(
            df, "vc", "o_orderkey", buckets=buckets
        ).collect()
    )


def test_from_counts_equals_raw_row_operator(spark):
    """The renderer is the at-rest operator's value-twin: the id
    tie-split never moves a bucket's size or value extent."""
    orders = _orders(spark)
    per_v = orders.groupBy(F.col("vc").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    for b in (4, 8, 13):
        got = sorted(
            tuple(r) for r in equidepth_from_counts(per_v, b).collect()
        )
        assert got == _at_rest(orders, b), b


def test_stream_equals_at_rest_at_every_prefix(spark, tmp_path):
    orders = _orders(spark).cache()
    b1 = orders.filter(F.col("o_orderkey") % 3 != 0)
    b2 = orders.filter(F.col("o_orderkey") % 3 == 0)
    store = VersionedTable(spark, tmp_path / "store")
    step = equidepth_foreach_batch(
        store, str(tmp_path / "scores"), "vc", buckets=8
    )
    step(b1, 0)
    got1 = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/batch=0")).collect()
    )
    assert got1 == _at_rest(b1)
    step(b2, 1)
    got2 = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/batch=1")).collect()
    )
    assert got2 == _at_rest(orders)
    # replay no-op
    before = sorted(tuple(r) for r in store.read().collect())
    step(b2, 1)
    assert sorted(tuple(r) for r in store.read().collect()) == before
    orders.unpersist()


def test_batch_split_invariance(spark, tmp_path):
    """Different split of the same rows → identical final store and
    identical final report (merge law, like the Count-Min cells)."""
    orders = _orders(spark).cache()
    splits = [
        [orders.filter(F.col("o_orderkey") % 2 == i) for i in range(2)],
        [orders.filter(F.col("o_orderkey") % 4 == i) for i in range(4)],
    ]
    finals = []
    for si, batches in enumerate(splits):
        store = VersionedTable(spark, tmp_path / f"store{si}")
        step = equidepth_foreach_batch(
            store, str(tmp_path / f"scores{si}"), "vc", buckets=8
        )
        for i, b in enumerate(batches):
            step(b, i)
        last = len(batches) - 1
        finals.append(
            sorted(
                tuple(r)
                for r in spark.read.parquet(
                    str(tmp_path / f"scores{si}/batch={last}")
                ).collect()
            )
        )
    assert finals[0] == finals[1] == _at_rest(orders)
    orders.unpersist()
