"""Streaming market-basket maintenance: the mergeable count stages of
:mod:`..operators.basket` driven by Structured Streaming
``foreachBatch``, with item counts, pair counts, and the basket total
kept in one :class:`..sinks.table.VersionedTable` (same
store/commit/replay contract as :mod:`.kmv` / :mod:`.twap`).

Contract: BASKET-ALIGNED BATCHES — a basket's rows never straddle a
micro-batch boundary (the order-keyed append-log ingest; the same
family of arrival contract as TWAP's monotone arrival). Under it,
counts over disjoint basket sets ADD EXACTLY, so rendering rules from
the store equals the at-rest :func:`..operators.basket` pipeline over
the full stream bit-for-bit (pinned by ``tests/test_streaming_basket.py``).
A basket split across batches would double-count its items — since
round 11 the step ENFORCES the contract: basket keys are monotone
under the order-keyed ingest, so a batch whose min key does not
strictly exceed the store's high-water key raises
:class:`.contracts.ArrivalContractError` before any store mutation
(route late basket fragments through a batch recompute instead).

The sums are NOT idempotent, so fully-applied replays are skipped via
the :mod:`.replay` batch_id guard; per-batch rendered rules land
under batch-keyed score paths.

Scale shape: per micro-batch cost is one basket-keyed batch
aggregation; store state is one row per item + one per co-occurring
pair + one total — #items² bounded (categorical alphabets), never
data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from rootstock_collective_state_sync_spark.operators.basket import (
    assoc_rules_from_counts,
    basket_item_counts,
    basket_pair_counts,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.contracts import (
    check_basket_alignment,
)
from rootstock_collective_state_sync_spark.streaming.replay import (
    batch_already_applied,
    write_batch_scores,
)

# one unified count store: kind 'N' (total baskets), 'I' (item), 'P' (pair)
STORE_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("a", T.StringType(), False),
        T.StructField("b", T.StringType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)


def _batch_counts(baskets: DataFrame) -> DataFrame:
    n = baskets.select("bk").distinct().count()
    items = basket_item_counts(baskets).select(
        F.lit("I").alias("kind"),
        F.col("item").alias("a"),
        F.lit("").alias("b"),
        F.col("cnt"),
    )
    pairs = basket_pair_counts(baskets).select(
        F.lit("P").alias("kind"),
        F.col("item_a").alias("a"),
        F.col("item_b").alias("b"),
        F.col("pair_cnt").alias("cnt"),
    )
    spark = baskets.sparkSession
    total = spark.createDataFrame([("N", "", "", n)], STORE_SCHEMA)
    return items.unionByName(pairs).unionByName(total)


def render_rules(
    store: VersionedTable, min_sup_e6: int, min_conf_e6: int
) -> DataFrame:
    """Rules from the store's current counts — identical to the
    at-rest operator over every basket streamed so far."""
    s = store.read()
    n = int(s.filter(F.col("kind") == "N").agg(F.sum("cnt")).collect()[0][0])
    item_cnt = s.filter(F.col("kind") == "I").select(
        F.col("a").alias("item"), "cnt"
    )
    pair_cnt = s.filter(F.col("kind") == "P").select(
        F.col("a").alias("item_a"),
        F.col("b").alias("item_b"),
        F.col("cnt").alias("pair_cnt"),
    )
    return assoc_rules_from_counts(
        n, item_cnt, pair_cnt, min_sup_e6, min_conf_e6
    )


def basket_foreach_batch(
    store: VersionedTable,
    scores_path: str,
    min_sup_e6: int,
    min_conf_e6: int,
):
    """Return the ``foreachBatch`` function merging each batch's
    counts into ``store`` (exact sums) and writing the post-merge
    rendered rules under ``scores_path``. Batch rows must be distinct
    ``(bk, item)`` pairs of whole baskets."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        created = store.create_if_not_exists(
            STORE_SCHEMA, merge_keys=["kind", "a", "b"], num_buckets=4
        )
        if not created and batch_already_applied(store, batch_id):
            return
        baskets = batch_df.select("bk", "item").distinct()
        lo, hi = baskets.agg(F.min("bk"), F.max("bk")).collect()[0]
        if not created:
            # loud-fail BEFORE mutating: a straddling basket fragment
            # would double-count its items (two scalars vs one
            # manifest integer — control-plane)
            check_basket_alignment(
                store.manifest().meta.get("max_bk"), lo, hi, "basket"
            )
        prev = store.read().select("kind", "a", "b", "cnt")
        merged = (
            prev.unionByName(_batch_counts(baskets))
            .groupBy("kind", "a", "b")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
        # render from the merged frame (not a store re-read) so the
        # scores write precedes the commit, per the replay contract
        n = int(
            merged.filter(F.col("kind") == "N").agg(F.sum("cnt")).collect()[0][0]
        )
        item_cnt = merged.filter(F.col("kind") == "I").select(
            F.col("a").alias("item"), "cnt"
        )
        pair_cnt = merged.filter(F.col("kind") == "P").select(
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("cnt").alias("pair_cnt"),
        )
        rules = assoc_rules_from_counts(
            n, item_cnt, pair_cnt, min_sup_e6, min_conf_e6
        )
        write_batch_scores(rules, scores_path, batch_id)
        store.overwrite(
            merged, meta={"batch_id": int(batch_id), "max_bk": int(hi)}
        )

    return step
