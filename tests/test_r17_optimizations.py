"""Focused tests for the r17 optimization-round internals.

Each optimization that changed an operator's internals gets a direct
contract test here: Arrow-backed literal frames (`localrel.local_df`),
size-adaptive versioned-table read compaction, the per-session parquet
schema cache, and the in-row rule explode in
`assoc_rules_from_counts`.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F, types as T

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# localrel.local_df — value/schema equivalence with plain createDataFrame
# ---------------------------------------------------------------------------


def test_local_df_matches_plain_createdataframe(spark):
    from rootstock_collective_state_sync_spark.localrel import local_df

    rows = [
        (1, [0.125, -0.5], [[1.5, 2.5], [3.0, 4.0]], "abc", None),
        (None, None, None, None, 7),
        (2, [], [[], [0.1 + 0.2]], "", 0),
    ]
    sch = (
        "a bigint, v array<float>, luts array<array<double>>, "
        "s string, z long"
    )
    got = local_df(spark, rows, sch)
    want = spark.createDataFrame(rows, sch)
    assert got.schema == want.schema
    assert got.collect() == want.collect()


def test_local_df_float_bits_exact(spark):
    from rootstock_collective_state_sync_spark.localrel import local_df

    vals = [(0.1 + 0.2,), (1e-308,), (-0.0,), (2.0**53 + 1.0,)]
    a = [r.x for r in local_df(spark, vals, "x double").collect()]
    b = [r.x for r in spark.createDataFrame(vals, "x double").collect()]
    assert all(
        math.copysign(1, x) == math.copysign(1, y) and x == y
        for x, y in zip(a, b)
    )


def test_local_df_nan_falls_back_to_exact_path(spark):
    from rootstock_collective_state_sync_spark.localrel import local_df

    rows = [(float("nan"),), (1.5,)]
    got = [r.x for r in local_df(spark, rows, "x double").collect()]
    assert math.isnan(got[0]) and got[1] == 1.5  # NOT nulled by Arrow


def test_local_df_empty_rows(spark):
    from rootstock_collective_state_sync_spark.localrel import local_df

    df = local_df(spark, [], "a bigint, b string")
    assert df.count() == 0 and df.schema == T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )


# ---------------------------------------------------------------------------
# VersionedTable.read — size-adaptive coalesce
# ---------------------------------------------------------------------------


def test_versioned_read_coalesces_tiny_snapshot(spark, tmp_path):
    from rootstock_collective_state_sync_spark.sinks.table import (
        VersionedTable,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    t = VersionedTable(spark, tmp_path / "t").create(
        schema, merge_keys=["k"], num_buckets=16
    )
    rows = spark.range(500).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )
    t.overwrite(rows)
    df = t.read()
    # a KB-scale 16-bucket snapshot must NOT read as 16 near-empty
    # partitions
    assert df.rdd.getNumPartitions() <= 2
    # and the rows are exactly what was written
    assert sorted((r.k, r.v) for r in df.collect()) == [
        (i, str(i)) for i in range(500)
    ]


# ---------------------------------------------------------------------------
# plans.tables schema cache — same schema, no footer inference on reuse
# ---------------------------------------------------------------------------


def test_load_table_schema_cache_consistent(spark):
    from rootstock_collective_state_sync_spark.plans import tables

    tables._SCHEMAS.pop((id(spark), SF_SMOKE, "events"), None)
    first = tables.load_table(spark, SF_SMOKE, "events")
    assert (id(spark), SF_SMOKE, "events") in tables._SCHEMAS
    second = tables.load_table(spark, SF_SMOKE, "events")
    assert first.schema == second.schema
    # the ts column must be a (possibly NTZ) timestamp on BOTH paths —
    # the nanos->micros conversion (when the file carries long nanos)
    # must survive the cached-schema read identically
    assert isinstance(
        second.schema["ts"].dataType,
        (T.TimestampType, T.TimestampNTZType),
    )
    assert first.count() == second.count()
    assert first.agg(F.max("ts")).first()[0] == second.agg(F.max("ts")).first()[0]


# ---------------------------------------------------------------------------
# assoc_rules_from_counts — one explode emits both rule directions
# ---------------------------------------------------------------------------


def test_assoc_rules_from_counts_directions_and_plan(spark):
    from rootstock_collective_state_sync_spark.operators.basket import (
        assoc_rules_from_counts,
    )

    item_cnt = spark.createDataFrame(
        [("a", 6), ("b", 5), ("c", 4)], "item string, cnt long"
    )
    pair_cnt = spark.createDataFrame(
        [("a", "b", 4), ("b", "c", 1)], "item_a string, item_b string, pair_cnt long"
    )
    out = assoc_rules_from_counts(
        10, item_cnt, pair_cnt, min_sup_e6=200_000, min_conf_e6=500_000
    ).collect()
    # pair (a,b): cnt 4 >= minsup 2; conf a->b = 4/6 -> 666666 e6,
    # conf b->a = 4/5 -> 800000; both directions present exactly once.
    # pair (b,c): below min support - absent.
    got = {(r.antecedent, r.consequent): r.confidence_e6 for r in out}
    assert got == {("a", "b"): 666666, ("b", "a"): 800000}
    # the plan must hold ONE copy of the pair source (no self-union):
    plan = assoc_rules_from_counts(
        10, item_cnt, pair_cnt, 200_000, 500_000
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan
