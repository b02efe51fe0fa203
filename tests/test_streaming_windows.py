"""Event-time windows under REAL Structured Streaming (file source +
watermark + availableNow), cross-checked against the batch plans that
the DuckDB oracle already verifies — closing the loop batch == stream.
Plus observability: observe() metrics and the progress ring listener.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.functions.metrics import (
    ProgressRingListener,
    observed,
)
from rootstock_collective_state_sync_spark.plans import windows as batch_w
from rootstock_collective_state_sync_spark.streaming import windows as sw

from tests.conftest import SF_SMOKE


def run_stream(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}")


def _emission_cutoff(spark, hours: float = 3.0):
    """Append mode only emits windows whose END is past the final
    watermark (max event time - 2h delay); windows newer than that
    stay in state when the query stops. Compare below the horizon."""
    import datetime

    from rootstock_collective_state_sync_spark.plans.tables import load_table

    max_ts = (
        load_table(spark, SF_SMOKE, "events").agg(F.max("ts").alias("m")).collect()[0].m
    )
    return max_ts - datetime.timedelta(hours=hours)


def test_streaming_tumbling_equals_batch(spark):
    ev = sw.stream_events_parquet(spark, SF_SMOKE)
    cutoff = _emission_cutoff(spark)
    got = {
        (r.win_start, r.event_type): r.n
        for r in run_stream(spark, sw.tumbling_counts(ev), "t_tumbling").collect()
    }
    want = {
        (r.win_start, r.event_type): r.n
        for r in batch_w.q_window_tumbling(spark, SF_SMOKE).collect()
    }
    assert got.items() <= want.items()  # nothing wrong or extra emitted
    missing = {k for k in want if k not in got and k[0] < cutoff}
    assert not missing, f"windows past the horizon not emitted: {sorted(missing)[:3]}"


def test_streaming_session_equals_batch(spark):
    ev = sw.stream_events_parquet(spark, SF_SMOKE)
    cutoff = _emission_cutoff(spark)
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in run_stream(spark, sw.session_counts(ev), "t_session").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in batch_w.q_window_session(spark, SF_SMOKE).collect()
    }
    assert got.items() <= want.items()
    missing = {k for k in want if k not in got and want[k][0] < cutoff}
    assert not missing


def test_streaming_dedup_within_watermark(spark):
    ev = sw.stream_events_parquet(spark, SF_SMOKE)
    out = run_stream(
        spark,
        sw.dedup_within_watermark(ev, ["user_id", "event_type"]),
        "t_dedup",
    )
    per_key = (
        out.groupBy("user_id", "event_type").count().filter(F.col("count") > 1)
    )
    # within one availableNow batch the horizon covers everything:
    # exactly one row per key survives
    assert per_key.count() == 0
    assert out.count() > 0


def test_observe_and_listener(spark):
    listener = ProgressRingListener(capacity=10)
    spark.streams.addListener(listener)
    try:
        ev = observed(sw.stream_events_parquet(spark, SF_SMOKE), "ingest")
        out = run_stream(spark, sw.tumbling_counts(ev), "t_observe")
        assert out.count() > 0
        totals = listener.totals()
        assert totals["batches"] >= 1
        assert totals["rows"] == 1000  # sf0.001 events
        obs = [
            h["observedMetrics"].get("ingest")
            for h in listener.history
            if h["observedMetrics"].get("ingest")
        ]
        assert obs and obs[0]["rows"] == 1000
    finally:
        spark.streams.removeListener(listener)
