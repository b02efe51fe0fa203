"""Incremental ANOVA / Welch e2e (X-ST24): one (g, n, s, q) moment
store renders BOTH reports bit-equal to the at-rest operators at
every stream prefix, under any batch split, and replay is a no-op.
Plus the statistic-vs-python-reference property pin (exact moments,
one documented double reduction)."""

from __future__ import annotations

from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rootstock_collective_state_sync_spark.operators.profile import (
    anova_oneway,
    effect_size,
    welch_t,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.moments import (
    moments_foreach_batch,
)
from tests.conftest import SF_SMOKE

A_GROUPS = ["1-URGENT", "2-HIGH"]


def _orders(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    return load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("vc"),
    )


def _at_rest(df):
    an = sorted(
        tuple(r) for r in anova_oneway(df, "vc", "o_orderpriority").collect()
    )
    we = sorted(
        tuple(r)
        for r in welch_t(df, "vc", "o_orderpriority", A_GROUPS).collect()
    )
    cd = sorted(
        tuple(r)
        for r in effect_size(df, "vc", "o_orderpriority", A_GROUPS).collect()
    )
    return an, we, cd


def _read(spark, path, batch_id):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/batch={batch_id}")
        .drop("batch")
        .collect()
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # value
            st.integers(min_value=0, max_value=3),  # group id
        ),
        min_size=2,
        max_size=50,
    )
)
def test_anova_welch_match_python_reference(spark, rows):
    """X-A45 against a pure-Python reference computed the same way
    (exact integer moments, double only at the same final
    expressions): f/eta²/t/df within 1 e6-ulp; degenerate inputs
    (k<2, zero variance, empty side, n<2 per side) go NULL."""
    import math

    df = spark.createDataFrame(
        [(v, f"g{g}") for v, g in rows], "vc long, o_orderpriority string"
    )
    got_a = anova_oneway(df, "vc", "o_orderpriority").collect()[0]
    got_w = welch_t(df, "vc", "o_orderpriority", ["g0", "g1"]).collect()[0]

    by_g: dict[str, list[int]] = {}
    for v, g in rows:
        by_g.setdefault(f"g{g}", []).append(v)
    n = len(rows)
    k = len(by_g)
    s = sum(v for v, _ in rows)
    q = sum(v * v for v, _ in rows)
    # the reference's one double reduction folds in sorted-g order —
    # the SAME fixed order the operator and oracle use (r14 advisor
    # fix: the reduction must not be partition-order-dependent)
    s2n = sum(
        float(sum(vs)) ** 2 / len(vs) for _, vs in sorted(by_g.items())
    )
    grand = float(s) ** 2 / n
    ssb, sst = s2n - grand, float(q) - grand
    ssw = sst - ssb
    assert got_a["n"] == n and got_a["k"] == k
    if k > 1 and n > k and ssw > 0:
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert abs(got_a["f_e6"] - round(f * 1e6)) <= 1
    else:
        assert got_a["f_e6"] is None
    if sst > 0:
        assert abs(got_a["eta2_e6"] - round(ssb / sst * 1e6)) <= 1
    else:
        assert got_a["eta2_e6"] is None

    a_vals = [v for v, g in rows if f"g{g}" in ("g0", "g1")]
    b_vals = [v for v, g in rows if f"g{g}" not in ("g0", "g1")]
    assert got_w["n_a"] == len(a_vals) and got_w["n_b"] == len(b_vals)
    if len(a_vals) > 1 and len(b_vals) > 1:
        va_n = (
            (sum(v * v for v in a_vals) - float(sum(a_vals)) ** 2 / len(a_vals))
            / (len(a_vals) - 1) / len(a_vals)
        )
        vb_n = (
            (sum(v * v for v in b_vals) - float(sum(b_vals)) ** 2 / len(b_vals))
            / (len(b_vals) - 1) / len(b_vals)
        )
        se2 = va_n + vb_n
        if se2 > 0:
            t = (
                sum(a_vals) / len(a_vals) - sum(b_vals) / len(b_vals)
            ) / math.sqrt(se2)
            assert abs(got_w["t_e6"] - round(t * 1e6)) <= 1
        else:
            assert got_w["t_e6"] is None
    else:
        assert got_w["t_e6"] is None


def test_stream_equals_at_rest_at_every_prefix(spark, tmp_path):
    orders = _orders(spark).cache()
    b1 = orders.filter(F.col("o_orderkey") % 3 != 0)
    b2 = orders.filter(F.col("o_orderkey") % 3 == 0)
    store = VersionedTable(spark, tmp_path / "store")
    step = moments_foreach_batch(
        store, str(tmp_path / "scores"), "vc", "o_orderpriority", A_GROUPS
    )
    step(b1, 0)
    an1, we1, cd1 = _at_rest(b1)
    assert _read(spark, str(tmp_path / "scores/anova"), 0) == an1
    assert _read(spark, str(tmp_path / "scores/welch"), 0) == we1
    assert _read(spark, str(tmp_path / "scores/cohend"), 0) == cd1
    step(b2, 1)
    an2, we2, cd2 = _at_rest(orders)
    assert _read(spark, str(tmp_path / "scores/anova"), 1) == an2
    assert _read(spark, str(tmp_path / "scores/welch"), 1) == we2
    assert _read(spark, str(tmp_path / "scores/cohend"), 1) == cd2
    assert an1 != an2  # the prefix moved the statistic
    # replay no-op
    v = store.current_version()
    step(b2, 1)
    assert store.current_version() == v
    orders.unpersist()


def test_batch_split_invariance(spark, tmp_path):
    orders = _orders(spark).cache()
    want_an, want_we, want_cd = _at_rest(orders)
    for si, k in enumerate((2, 4)):
        store = VersionedTable(spark, tmp_path / f"store{si}")
        step = moments_foreach_batch(
            store, str(tmp_path / f"s{si}"), "vc", "o_orderpriority", A_GROUPS
        )
        for i in range(k):
            step(orders.filter(F.col("o_orderkey") % k == i), i)
        assert _read(spark, str(tmp_path / f"s{si}/anova"), k - 1) == want_an
        assert _read(spark, str(tmp_path / f"s{si}/welch"), k - 1) == want_we
        assert _read(spark, str(tmp_path / f"s{si}/cohend"), k - 1) == want_cd
    orders.unpersist()

def test_anova_partition_order_invariance(spark):
    """The r14 advisor's flake class: the per-group s²/n reduction
    must not depend on partition count / merge order. With the
    fixed-order left fold over the g-sorted term array the statistic
    is bit-identical across repartitionings (a plain double F.sum was
    not guaranteed to be)."""
    orders = _orders(spark)
    want = None
    for parts in (1, 7, 32):
        got = tuple(
            anova_oneway(
                orders.repartition(parts), "vc", "o_orderpriority"
            ).collect()[0]
        )
        if want is None:
            want = got
        assert got == want, parts


def test_streaming_twins_reject_fractional_values(spark, tmp_path):
    """r14 advisor item: the incremental twins must FAIL FAST on a
    double-typed stream column (the at-rest operators raise on
    FractionalType; the streaming side silently cast('long')-truncated
    — diverging from the bit-equal-twin contract instead of erroring)."""
    import pytest

    from rootstock_collective_state_sync_spark.streaming.equidepth import (
        equidepth_foreach_batch,
    )
    from rootstock_collective_state_sync_spark.streaming.gini import (
        gini_lorenz_foreach_batch,
    )
    from rootstock_collective_state_sync_spark.streaming.rankcorr import (
        rankcorr_foreach_batch,
    )
    from rootstock_collective_state_sync_spark.streaming.ranktests import (
        ranktests_foreach_batch,
    )

    frac = spark.createDataFrame(
        [(1.5, "g0", 2.5)], "v double, g string, y double"
    )
    cases = [
        moments_foreach_batch(
            VersionedTable(spark, tmp_path / "m"),
            str(tmp_path / "ms"), "v", "g", ["g0"],
        ),
        gini_lorenz_foreach_batch(
            VersionedTable(spark, tmp_path / "g"), str(tmp_path / "gs"), "v"
        ),
        rankcorr_foreach_batch(
            VersionedTable(spark, tmp_path / "r"),
            str(tmp_path / "rs"), "v", "y",
        ),
        ranktests_foreach_batch(
            VersionedTable(spark, tmp_path / "t"),
            str(tmp_path / "ts"), "v", "g = 'g0'",
        ),
        equidepth_foreach_batch(
            VersionedTable(spark, tmp_path / "e"), str(tmp_path / "es"), "v"
        ),
    ]
    for step in cases:
        with pytest.raises(ValueError, match="integer-typed"):
            step(frac, 0)
