"""Runtime enforcement of the incremental stores' arrival contracts.

The mergeable ``foreachBatch`` legs each document an arrival contract
(streaming/twap.py: MONOTONE ARRIVAL; streaming/basket.py:
BASKET-ALIGNED BATCHES). Before round 11 nothing enforced them at
runtime — an out-of-order batch silently merged WRONG (TWAP's bridge
segment mis-weights; a straddling basket double-counts its items)
instead of failing loudly. These checks make the violation loud: the
step raises :class:`ArrivalContractError` BEFORE any store mutation,
so the store keeps its last consistent version and the operator can
route the correction through a batch recompute (or the
reorg/rebuild path, streaming/reorg.py) instead of serving silently
wrong state.

Cost: both checks are control-plane — the TWAP check is a
groups-bounded join of two one-row-per-group partial tables; the
basket check is two scalars (the batch's min/max basket key) against
one integer carried in the store manifest meta.

(The OHLC leg needs NO arrival contract: every one of its
accumulators — struct-min/max on the (t, id)-coordinated open/close
picks, min/max on high/low, sums on count/volume — is associative
AND commutative, so any batch order merges to the at-rest bars
bit-for-bit; pinned by the shuffled-arrival e2e in
tests/test_streaming_ohlc.py. What OHLC consumers may need instead
is bar FINALITY, which is the watermark-bounded variant's job —
see :func:`..streaming.ohlc.ohlc_foreach_batch`'s
``allowed_lateness`` knob.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ArrivalContractError(RuntimeError):
    """A micro-batch violated its store's documented arrival contract.

    Raised BEFORE any store mutation: the store still holds its last
    consistent version. Recover by routing the offending data through
    the at-rest batch operator (or a reorg-style shadow rebuild), not
    by retrying the stream."""


def check_monotone_groups(
    prev_partial: DataFrame,
    new_partial: DataFrame,
    group_col: str,
    store_name: str,
) -> None:
    """Enforce MONOTONE ARRIVAL: for every group present in both the
    store and the batch, the batch's first observation must strictly
    follow the store's last under the ``(t, id)`` total order —
    ``assert min(batch.(t,id)) > store.max(t,id)`` per group, the
    cheap runtime check the merge law's correctness proof assumes.

    Both sides are one-row-per-group partials, so the join is
    groups-bounded (control-plane), never data-sized."""
    viol = (
        prev_partial.select(
            F.col(group_col).alias("g"),
            F.col("last_t").alias("p_t"),
            F.col("last_id").alias("p_id"),
        )
        .join(
            new_partial.select(
                F.col(group_col).alias("g"),
                F.col("first_t").alias("b_t"),
                F.col("first_id").alias("b_id"),
            ),
            "g",
        )
        .filter(
            (F.col("b_t") < F.col("p_t"))
            | ((F.col("b_t") == F.col("p_t")) & (F.col("b_id") <= F.col("p_id")))
        )
    )
    sample = viol.limit(5).collect()
    if sample:
        detail = ", ".join(
            f"{r['g']}: batch first (t={r['b_t']}, id={r['b_id']}) <= "
            f"store last (t={r['p_t']}, id={r['p_id']})"
            for r in sample
        )
        raise ArrivalContractError(
            f"{store_name}: monotone-arrival contract violated for "
            f"{viol.count()} group(s) — out-of-order micro-batch would "
            f"mis-weight the bridge segment. Offenders (first 5): "
            f"{detail}. Store unchanged; recompute late data with the "
            f"at-rest batch operator."
        )


def check_basket_alignment(
    prev_max_bk: "int | None", batch_min_bk: int, batch_max_bk: int,
    store_name: str,
) -> None:
    """Enforce BASKET-ALIGNED BATCHES under the order-keyed append-log
    ingest the contract documents: basket keys are monotone across
    batches, so a batch whose smallest key does not strictly exceed
    the largest key ever ingested either re-sends a basket (fragment
    straddling a boundary -> its items double-count) or arrives out
    of order. Two scalars against one manifest integer."""
    if prev_max_bk is not None and batch_min_bk <= prev_max_bk:
        raise ArrivalContractError(
            f"{store_name}: basket-aligned-batch contract violated — "
            f"batch keys span [{batch_min_bk}, {batch_max_bk}] but the "
            f"store has already ingested baskets through {prev_max_bk}; "
            f"a straddling/replayed basket fragment would double-count "
            f"its items. Store unchanged; route late basket fragments "
            f"through a batch recompute."
        )
