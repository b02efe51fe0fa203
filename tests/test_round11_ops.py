"""Round-11 additions: corpus-derived cell geometry for the celled
ANN/graph family (the r10 verdict's one `weak` — fixed 16 cells made
in-cell pairs grow n² per decade), the kmv_overlap production-default
flip, and this round's new operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators import graph as G
from rootstock_collective_state_sync_spark.operators import similarity as S
from rootstock_collective_state_sync_spark.plans.tables import load_table

from tests.conftest import SF_SMOKE


def test_auto_num_cells_sizing():
    """The IVF sizing rule: hold cell_size ~constant, grow num_cells
    with n. The constants are chosen so every driver SF stays at the
    oracle-tractable 16 cells (500 vecs at sf0.001/0.01, 2000 at
    sf0.1) while the sf1 constructed decade (20 000) gets ~157 —
    the geometry SCALING.md measured back on the linear asymptote
    (17-35 s vs 86 s at 16 pinned cells)."""
    assert S.AUTO_CELL_TARGET == 128
    assert S.auto_num_cells(500) == 16
    assert S.auto_num_cells(2000) == 16
    assert S.auto_num_cells(2049) == 17  # ceil, not floor
    assert S.auto_num_cells(20_000) == 157
    assert S.auto_num_cells(0) == 16  # floor holds on empty corpora
    # 10x the data -> ~10x the cells -> cell_size (hence in-cell pair
    # work per row) stays flat: the linear-per-decade property itself
    for n in (10_000, 100_000, 1_000_000):
        ratio = S.auto_num_cells(10 * n) / S.auto_num_cells(n)
        assert 9.8 < ratio < 10.2


def test_resolve_num_cells_passthrough_and_auto(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    assert S.resolve_num_cells(emb, 42) == 42
    assert S.resolve_num_cells(emb, "auto") == 16  # 500 vecs -> floor


def test_knn_edges_celled_auto_matches_pinned_at_small_n(spark):
    """At corpus sizes where auto resolves to 16, the auto-geometry
    build is bit-identical to the pinned build — which is exactly why
    the registry's celled seats could switch to `"auto"` without
    touching their unrolled-k-means DuckDB oracles (they replay 16
    cells, valid wherever auto == 16, i.e. every driver SF)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    auto = {
        tuple(r)
        for r in G.knn_edges_celled(emb, k=3, num_cells="auto").collect()
    }
    pinned = {
        tuple(r) for r in G.knn_edges_celled(emb, k=3, num_cells=16).collect()
    }
    assert auto == pinned and len(auto) > 0


def test_knn_edges_celled_auto_geometry_scales_cell_count(spark):
    """Above the floor the geometry actually moves with the corpus:
    the 500-vector smoke corpus at target_cell_size=16 resolves to 32
    cells (ceil, above the 16 floor) via the rule the celled family
    inherits through resolve_num_cells."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    n = emb.count()
    assert S.auto_num_cells(n, target_cell_size=16) == -(-n // 16) == 32


def test_k_anonymity_generalize_ladder_proof(spark):
    """The Sweeney ladder's two proof obligations (r10 verdict item
    10): every kept class has k >= 5 (min_k), and generalization
    suppresses STRICTLY fewer rows than suppression-only on the same
    input; plus the row-accounting identity."""
    from rootstock_collective_state_sync_spark.plans.registry import SPECS

    r = (
        SPECS["k_anonymity_generalize"].fn(spark, SF_SMOKE).collect()[0]
    )
    assert r["min_k"] >= 5 and r["min_l"] >= 1
    assert r["n_suppressed"] < r["n_suppressed_suppression_only"]
    assert (
        r["n_rows"]
        == r["n_level0"] + r["n_generalized"] + r["n_suppressed"]
    )


def test_k_anonymity_generalize_local_recoding(spark):
    """Local recoding semantics on a hand-built frame: safe
    full-precision classes stay at level 0; failing rows that
    consolidate at the coarse key are generalized; a failing row with
    no coarse companion is suppressed."""
    from pyspark.sql import functions as F

    from rootstock_collective_state_sync_spark.operators.profile import (
        k_anonymity_generalize_census,
    )

    rows = (
        # class A/day1: k=3 -> safe at level 0 (k=3 >= k=3)
        [("A", f"2024-01-0{d}", i) for i, d in enumerate([1, 1, 1])]
        # class A/day2 + A/day3: k=1 each -> fail, consolidate at month
        + [("A", "2024-01-02", 10), ("A", "2024-01-03", 11),
           ("A", "2024-01-04", 12)]
        # class B/day9: k=1, alone in its month -> suppressed
        + [("B", "2024-03-09", 20)]
    )
    df = (
        spark.createDataFrame(rows, "grp string, day string, cust long")
        .withColumn("day", F.to_date("day"))
        .withColumn("month", F.trunc("day", "month"))
    )
    r = k_anonymity_generalize_census(
        df, qi_cols=["grp", "day"], fine_col="day", coarse_col="month",
        sensitive_col="cust", k=3,
    ).collect()[0]
    assert (r["n_level0"], r["n_generalized"], r["n_suppressed"]) == (3, 3, 1)
    assert r["min_k"] == 3 and r["n_groups"] == 2
