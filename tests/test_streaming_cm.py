"""Incremental Count-Min e2e: cell tables merge by exact addition
under any batch split AND any batch order (same salted hash rows
everywhere), so the stored sketch equals the at-rest one cell-wise;
replays are guarded no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators.sketches import count_min
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.cm import (
    cm_foreach_batch,
    render_estimates,
)

ROWS = (
    [("alpha",)] * 120 + [("beta",)] * 40 + [("gamma",)] * 7 + [("delta",)] * 1
)
WATCH = ["alpha", "beta", "gamma", "delta", "absent"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "tok string")


def test_streaming_cm_matches_at_rest_any_order(spark, tmp_path):
    store = VersionedTable(spark, tmp_path / "cm_store")
    scores = str(tmp_path / "cm_scores")
    step = cm_foreach_batch(store, scores, "tok", WATCH, depth=4, width=64)
    # shuffled batch order: later-stream rows arrive first
    step(_df(spark, ROWS[100:]), 0)
    step(_df(spark, ROWS[:60]), 1)
    step(_df(spark, ROWS[60:100]), 2)

    at_rest = count_min(spark, _df(spark, ROWS), "tok", depth=4, width=64)
    got = dict(render_estimates(store, WATCH, depth=4, width=64))
    for v in WATCH:
        assert got[v] == at_rest.estimate(v), v
    # CM's one-sided guarantee carried through the incremental path
    true = {"alpha": 120, "beta": 40, "gamma": 7, "delta": 1, "absent": 0}
    for v, t in true.items():
        assert got[v] >= t

    # per-batch scores land batch-keyed; last batch equals final state
    last = {
        r["item"]: r["est"]
        for r in spark.read.parquet(scores).filter(F.col("batch") == 2).collect()
    }
    assert last == got

    # replay of the final batch is a guarded no-op (sums would double)
    v0 = store.current_version()
    step(_df(spark, ROWS[60:100]), 2)
    assert store.current_version() == v0
