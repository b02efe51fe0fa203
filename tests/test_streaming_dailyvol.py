"""Incremental daily-volume censuses e2e (X-ST25): one (type, day, n)
count store renders BOTH the Pettitt changepoint and the CUSUM top-3
census at every stream prefix, bit-equal to the at-rest operators
over the same rows, under any batch split; replay is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.plans.analytics import (
    cusum_from_daily,
    pettitt_from_daily,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.dailyvol import (
    dailyvol_foreach_batch,
)
from tests.conftest import SF_SMOKE


def _events(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    return load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "ts"
    )


def _daily(df):
    return df.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def _at_rest(df):
    d = _daily(df)
    pe = sorted(tuple(r) for r in pettitt_from_daily(d).collect())
    cu = sorted(tuple(r) for r in cusum_from_daily(d).collect())
    return pe, cu


def _read(spark, path, batch_id):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(f"{path}/batch={batch_id}")
        .drop("batch")
        .collect()
    )


def test_stream_equals_at_rest_at_every_prefix(spark, tmp_path):
    ev = _events(spark).cache()
    b1 = ev.filter(F.col("event_id") % 3 != 0)
    b2 = ev.filter(F.col("event_id") % 3 == 0)
    store = VersionedTable(spark, tmp_path / "store")
    step = dailyvol_foreach_batch(store, str(tmp_path / "scores"))
    step(b1, 0)
    pe1, cu1 = _at_rest(b1)
    assert _read(spark, str(tmp_path / "scores/pettitt"), 0) == pe1
    assert _read(spark, str(tmp_path / "scores/cusum"), 0) == cu1
    step(b2, 1)
    pe2, cu2 = _at_rest(ev)
    assert _read(spark, str(tmp_path / "scores/pettitt"), 1) == pe2
    assert _read(spark, str(tmp_path / "scores/cusum"), 1) == cu2
    assert cu1 != cu2  # the prefix moved the census
    # replay no-op
    v = store.current_version()
    step(b2, 1)
    assert store.current_version() == v
    ev.unpersist()


def test_batch_split_invariance(spark, tmp_path):
    ev = _events(spark).cache()
    want_pe, want_cu = _at_rest(ev)
    for si, k in enumerate((2, 4)):
        store = VersionedTable(spark, tmp_path / f"store{si}")
        step = dailyvol_foreach_batch(store, str(tmp_path / f"s{si}"))
        for i in range(k):
            step(ev.filter(F.col("event_id") % k == i), i)
        assert (
            _read(spark, str(tmp_path / f"s{si}/pettitt"), k - 1) == want_pe
        )
        assert _read(spark, str(tmp_path / f"s{si}/cusum"), k - 1) == want_cu
    ev.unpersist()


def test_ltz_typed_stream_column(spark, tmp_path):
    """A TIMESTAMP_LTZ ts column (Spark's parquet default) must merge
    into the TimestampNTZ store without a union/overwrite type error
    (r15 advisor: the cast precedent from ohlc applies here too)."""
    ev = _events(spark).withColumn("ts", F.col("ts").cast("timestamp"))
    assert dict(ev.dtypes)["ts"] == "timestamp"
    store = VersionedTable(spark, tmp_path / "store")
    step = dailyvol_foreach_batch(store, str(tmp_path / "scores"))
    step(ev, 0)
    want_pe, want_cu = _at_rest(ev.withColumn("ts", F.col("ts").cast("timestamp_ntz")))
    assert _read(spark, str(tmp_path / "scores/pettitt"), 0) == want_pe
    assert _read(spark, str(tmp_path / "scores/cusum"), 0) == want_cu
