"""Incremental rank-correlation e2e (X-ST23): one (x, y, n_xy) pair
store renders BOTH Spearman and Kendall bit-equal to the at-rest
raw-row operators at every stream prefix, under any batch split, and
replay is a no-op. Plus the from_pairs-vs-raw property pin."""

from __future__ import annotations

from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rootstock_collective_state_sync_spark.operators.profile import (
    kendall_tau,
    kendall_tau_from_pairs,
    spearman_rho,
    spearman_rho_from_pairs,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.rankcorr import (
    rankcorr_foreach_batch,
)
from tests.conftest import SF_SMOKE


def _lineitems(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    return load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey",
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc"),
    )


def _at_rest(df):
    sp = sorted(
        tuple(r) for r in spearman_rho(df, "q", "disc").collect()
    )
    kd = sorted(tuple(r) for r in kendall_tau(df, "q", "disc").collect())
    return sp, kd


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-4, max_value=4),
            st.integers(min_value=-3, max_value=3),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_from_pairs_equals_raw_row_operators(spark, rows):
    df = spark.createDataFrame(rows, "x long, y long")
    pairs = df.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n_xy")
    )
    assert sorted(
        tuple(r) for r in spearman_rho_from_pairs(pairs).collect()
    ) == sorted(tuple(r) for r in spearman_rho(df, "x", "y").collect())
    assert sorted(
        tuple(r) for r in kendall_tau_from_pairs(pairs).collect()
    ) == sorted(tuple(r) for r in kendall_tau(df, "x", "y").collect())


def test_stream_equals_at_rest_at_every_prefix(spark, tmp_path):
    li = _lineitems(spark).cache()
    b1 = li.filter(F.col("l_orderkey") % 3 != 0).drop("l_orderkey")
    b2 = li.filter(F.col("l_orderkey") % 3 == 0).drop("l_orderkey")
    full = li.drop("l_orderkey")
    store = VersionedTable(spark, tmp_path / "store")
    step = rankcorr_foreach_batch(store, str(tmp_path / "scores"), "q", "disc")
    step(b1, 0)
    sp1, kd1 = _at_rest(b1.withColumnRenamed("q", "q"))
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/spearman/batch=0"))
        .drop("batch")
        .collect()
    ) == sp1
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/kendall/batch=0"))
        .drop("batch")
        .collect()
    ) == kd1
    step(b2, 1)
    spf, kdf = _at_rest(full)
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/spearman/batch=1"))
        .drop("batch")
        .collect()
    ) == spf
    assert sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/kendall/batch=1"))
        .drop("batch")
        .collect()
    ) == kdf
    # replay no-op
    v = store.current_version()
    step(b2, 1)
    assert store.current_version() == v
    li.unpersist()


def test_batch_split_invariance_and_null_policy(spark, tmp_path):
    li = _lineitems(spark).cache()
    full = li.drop("l_orderkey")
    want_sp, want_kd = _at_rest(full)
    # split 1: by orderkey parity; split 2: thirds, with NULL rows
    # injected into one batch — ingest must drop them like at-rest
    nulls = spark.createDataFrame(
        [(None, 3), (5, None), (None, None)], "q long, disc long"
    )
    splits = [
        [full.filter(F.col("q") % 2 == i) for i in range(2)],
        [
            full.filter(F.col("q") % 3 == 0).unionByName(nulls),
            full.filter(F.col("q") % 3 == 1),
            full.filter(F.col("q") % 3 == 2),
        ],
    ]
    for si, batches in enumerate(splits):
        store = VersionedTable(spark, tmp_path / f"store{si}")
        step = rankcorr_foreach_batch(
            store, str(tmp_path / f"scores{si}"), "q", "disc"
        )
        for i, b in enumerate(batches):
            step(b, i)
        last = len(batches) - 1
        assert sorted(
            tuple(r)
            for r in spark.read.parquet(
                str(tmp_path / f"scores{si}/spearman/batch={last}")
            )
            .drop("batch")
            .collect()
        ) == want_sp, si
        assert sorted(
            tuple(r)
            for r in spark.read.parquet(
                str(tmp_path / f"scores{si}/kendall/batch={last}")
            )
            .drop("batch")
            .collect()
        ) == want_kd, si
    li.unpersist()
