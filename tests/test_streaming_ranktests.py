"""Incremental rank tests e2e (X-ST21): one (v, c, ca) count store
renders Mann-Whitney U, the two-sample KS distance, AND (r14, X-A44)
the exact Wasserstein-1 transport distance at every stream prefix,
bit-for-bit equal to the at-rest operators over the same rows;
split-invariant; replay no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators.profile import (
    cliffs_delta,
    hellinger_distance,
    energy_distance,
    population_stability,
    ks_two_sample,
    mann_whitney_u,
    wasserstein_1d,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.ranktests import (
    ranktests_foreach_batch,
)
from tests.conftest import SF_SMOKE

GROUP = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


def _orders(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    return load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("vc"),
    )


def _at_rest(df):
    mwu = sorted(tuple(r) for r in mann_whitney_u(df, "vc", GROUP).collect())
    ks = sorted(tuple(r) for r in ks_two_sample(df, "vc", GROUP).collect())
    w1 = sorted(tuple(r) for r in wasserstein_1d(df, "vc", GROUP).collect())
    en = sorted(tuple(r) for r in energy_distance(df, "vc", GROUP).collect())
    ps = sorted(
        tuple(r) for r in population_stability(df, "vc", GROUP).collect()
    )
    cd = sorted(tuple(r) for r in cliffs_delta(df, "vc", GROUP).collect())
    he = sorted(
        tuple(r) for r in hellinger_distance(df, "vc", GROUP).collect()
    )
    return mwu, ks, w1, en, ps, cd, he


def _read(spark, path, batch_id):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/batch={batch_id}")
        .drop("batch")
        .collect()
    )


def test_stream_equals_at_rest_at_every_prefix(spark, tmp_path):
    orders = _orders(spark).cache()
    b1 = orders.filter(F.col("o_orderkey") % 3 != 0)
    b2 = orders.filter(F.col("o_orderkey") % 3 == 0)
    store = VersionedTable(spark, tmp_path / "store")
    step = ranktests_foreach_batch(
        store, str(tmp_path / "scores"), "vc", GROUP
    )
    step(b1, 0)
    mwu1, ks1, w11, en1, ps1, cd1, he1 = _at_rest(b1)
    assert _read(spark, str(tmp_path / "scores/mwu"), 0) == mwu1
    assert _read(spark, str(tmp_path / "scores/ks"), 0) == ks1
    assert _read(spark, str(tmp_path / "scores/w1"), 0) == w11
    assert _read(spark, str(tmp_path / "scores/energy"), 0) == en1
    assert _read(spark, str(tmp_path / "scores/psi"), 0) == ps1
    assert _read(spark, str(tmp_path / "scores/cliffs"), 0) == cd1
    assert _read(spark, str(tmp_path / "scores/hellinger"), 0) == he1
    step(b2, 1)
    mwu2, ks2, w12, en2, ps2, cd2, he2 = _at_rest(orders)
    assert _read(spark, str(tmp_path / "scores/mwu"), 1) == mwu2
    assert _read(spark, str(tmp_path / "scores/ks"), 1) == ks2
    assert _read(spark, str(tmp_path / "scores/w1"), 1) == w12
    assert _read(spark, str(tmp_path / "scores/energy"), 1) == en2
    assert _read(spark, str(tmp_path / "scores/psi"), 1) == ps2
    assert _read(spark, str(tmp_path / "scores/cliffs"), 1) == cd2
    assert _read(spark, str(tmp_path / "scores/hellinger"), 1) == he2
    # the prefix really moved the statistics (else the e2e is vacuous)
    assert mwu1 != mwu2
    # replay no-op
    v = store.current_version()
    step(b2, 1)
    assert store.current_version() == v
    orders.unpersist()


def test_batch_split_invariance(spark, tmp_path):
    orders = _orders(spark).cache()
    (want_mwu, want_ks, want_w1, want_en, want_ps, want_cd,
     want_he) = _at_rest(orders)
    for si, k in enumerate((2, 4)):
        store = VersionedTable(spark, tmp_path / f"store{si}")
        step = ranktests_foreach_batch(
            store, str(tmp_path / f"s{si}"), "vc", GROUP
        )
        for i in range(k):
            step(orders.filter(F.col("o_orderkey") % k == i), i)
        assert _read(spark, str(tmp_path / f"s{si}/mwu"), k - 1) == want_mwu
        assert _read(spark, str(tmp_path / f"s{si}/ks"), k - 1) == want_ks
        assert _read(spark, str(tmp_path / f"s{si}/w1"), k - 1) == want_w1
        assert _read(spark, str(tmp_path / f"s{si}/energy"), k - 1) == want_en
        assert _read(spark, str(tmp_path / f"s{si}/psi"), k - 1) == want_ps
        assert _read(spark, str(tmp_path / f"s{si}/cliffs"), k - 1) == want_cd
        assert (
            _read(spark, str(tmp_path / f"s{si}/hellinger"), k - 1)
            == want_he
        )
    orders.unpersist()
