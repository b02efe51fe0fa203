"""Bucketed co-located join: the physical plan must contain NO
Exchange when both sides share the bucket spec — the property that
makes repeated big-big joins affordable at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.sinks.bucketed import (
    colocated_join,
    save_bucketed,
)

from tests.conftest import SF_SMOKE
from tests.test_plans import plan


@pytest.fixture()
def bucketed_tables(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    l = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    save_bucketed(l, "b_lineitem", ["l_orderkey"], num_buckets=8)
    save_bucketed(o, "b_orders", ["l_orderkey"], num_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, ["l_orderkey"])
    p = plan(spark, joined, "simple")
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, f"bucketed join still shuffles:\n{p}"
    # and it computes the right thing
    expected = (
        spark.table(lt).join(spark.table(rt).hint("shuffle_hash"), "l_orderkey").count()
    )
    assert joined.count() == expected


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join without bucketing metadata exchanges on
    both sides — proving the bucketed plan's win is real."""
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    l = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    p = plan(spark, l.hint("merge").join(o, "l_orderkey"), "simple")
    assert "Exchange" in p
