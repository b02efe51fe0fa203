"""Incremental Gini / Lorenz e2e (X-ST22; r13 verdict item 5):
one (v, c) store renders BOTH reports bit-equal to their at-rest
raw-row operators at every stream prefix, under any batch split, and
replay is a no-op. Plus the renderer-vs-raw property pins."""

from __future__ import annotations

from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rootstock_collective_state_sync_spark.operators.profile import (
    gini_from_counts,
    gini_index,
    lorenz_from_counts,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.gini import (
    gini_lorenz_foreach_batch,
)
from tests.conftest import SF_SMOKE


def _orders(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    return load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("vc"),
    )


def _gini_at_rest(df):
    return sorted(
        tuple(r) for r in gini_index(df, [], "vc", "o_orderkey").collect()
    )


def _lorenz_at_rest(spark, df):
    """The raw-row Lorenz renderer — q_lorenz_curve's exact shape,
    parameterized by input rows instead of the sf table."""
    from pyspark.sql import Window
    from rootstock_collective_state_sync_spark.operators.profile import (
        ntile_assign,
    )

    assigned = ntile_assign(df, "vc", "o_orderkey", 10)
    per = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sv"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("_n"),
        F.sum("sv").cast("long").alias("_s"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        per.crossJoin(F.broadcast(tot))
        .withColumn("cn", F.sum("n").over(w))
        .withColumn("cs", F.sum("sv").over(w))
        .select(
            "bucket",
            "n",
            F.expr("sv * 1000000 div _s").cast("long").alias("share_e6"),
            F.expr("cn * 1000000 div _n").cast("long").alias("cum_pop_e6"),
            F.expr("cs * 1000000 div _s").cast("long").alias("cum_value_e6"),
        )
    )
    return sorted(tuple(r) for r in out.collect())


def _per_v(df):
    return df.groupBy(F.col("vc").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def test_renderers_equal_raw_row_operators(spark):
    orders = _orders(spark).cache()
    per_v = _per_v(orders)
    assert sorted(
        tuple(r) for r in gini_from_counts(per_v).collect()
    ) == _gini_at_rest(orders)
    assert sorted(
        tuple(r) for r in lorenz_from_counts(per_v, 10).collect()
    ) == _lorenz_at_rest(spark, orders)
    orders.unpersist()


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.dictionaries(
        st.integers(min_value=0, max_value=400),  # value (Gini domain >= 0)
        st.integers(min_value=1, max_value=5),  # multiplicity
        min_size=2,
        max_size=25,
    )
)
def test_gini_lorenz_from_counts_property(spark, counts):
    """Any tie mix: both renderers equal the raw-row operators (the
    id tie-split never moves a decile's size or value sum)."""
    if sum(v * c for v, c in counts.items()) == 0:
        counts[401] = 1  # all-zero values: n·s = 0 — Gini undefined
    rows, rid = [], 0
    for v, c in sorted(counts.items()):
        for _ in range(c):
            rows.append((rid, v))
            rid += 1
    df = spark.createDataFrame(rows, "o_orderkey long, vc long")
    per_v = spark.createDataFrame(
        sorted(counts.items()), "v long, c long"
    )
    assert sorted(
        tuple(r) for r in gini_from_counts(per_v).collect()
    ) == _gini_at_rest(df)
    assert sorted(
        tuple(r) for r in lorenz_from_counts(per_v, 10).collect()
    ) == _lorenz_at_rest(spark, df)


def test_stream_equals_at_rest_at_every_prefix(spark, tmp_path):
    orders = _orders(spark).cache()
    b1 = orders.filter(F.col("o_orderkey") % 3 != 0)
    b2 = orders.filter(F.col("o_orderkey") % 3 == 0)
    store = VersionedTable(spark, tmp_path / "store")
    step = gini_lorenz_foreach_batch(
        store, str(tmp_path / "scores"), "vc", buckets=10
    )
    step(b1, 0)
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(
            str(tmp_path / "scores/gini/batch=0")
        ).collect()
    ) == _gini_at_rest(b1)
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(
            str(tmp_path / "scores/lorenz/batch=0")
        ).collect()
    ) == _lorenz_at_rest(spark, b1)
    step(b2, 1)
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(
            str(tmp_path / "scores/gini/batch=1")
        ).collect()
    ) == _gini_at_rest(orders)
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(
            str(tmp_path / "scores/lorenz/batch=1")
        ).collect()
    ) == _lorenz_at_rest(spark, orders)
    # replay no-op
    before = sorted(tuple(r) for r in store.read().collect())
    step(b2, 1)
    assert sorted(tuple(r) for r in store.read().collect()) == before
    orders.unpersist()


def test_batch_split_invariance(spark, tmp_path):
    orders = _orders(spark).cache()
    want_g, want_l = _gini_at_rest(orders), _lorenz_at_rest(spark, orders)
    splits = [
        [orders.filter(F.col("o_orderkey") % 2 == i) for i in range(2)],
        [orders.filter(F.col("o_orderkey") % 4 == i) for i in range(4)],
    ]
    for si, batches in enumerate(splits):
        store = VersionedTable(spark, tmp_path / f"store{si}")
        step = gini_lorenz_foreach_batch(
            store, str(tmp_path / f"scores{si}"), "vc", buckets=10
        )
        for i, b in enumerate(batches):
            step(b, i)
        last = len(batches) - 1
        assert sorted(
            tuple(r)
            for r in spark.read.parquet(
                str(tmp_path / f"scores{si}/gini/batch={last}")
            ).collect()
        ) == want_g, si
        assert sorted(
            tuple(r)
            for r in spark.read.parquet(
                str(tmp_path / f"scores{si}/lorenz/batch={last}")
            ).collect()
        ) == want_l, si
    orders.unpersist()
