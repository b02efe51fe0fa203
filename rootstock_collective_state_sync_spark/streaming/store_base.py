"""Shared lifecycle for the "one store, N reports" streaming family
(r15 verdict item 5).

Seven legs (equidepth, rank tests, vocabulary, Gini/Lorenz, rank
correlation, moments, daily volume) follow the same design: the
report is NOT mergeable, but a keyed SUFFICIENT-STATISTIC table adds
exactly over disjoint row sets, so each micro-batch (a) reduces the
batch to that table, (b) keyed-sums it into a
:class:`..sinks.table.VersionedTable`, and (c) re-renders every
report from the merged store — bit-equal to the at-rest operator over
the same rows. The r15 integer-guard fix had to be applied to five
modules separately, which is the tell that the lifecycle (schema,
input guard, replay guard, merge law, checkpoint-before-fan-out,
scores-then-store ordering) belonged in ONE place; each leg is now a
declaration of (schema, merge keys, batch extractor, renderers).

Invariants enforced here, once:

- ``require_integer_cols`` on declared value columns (fixed-point
  policy — a silently fractional stream column truncates on the
  ``cast('long')`` and corrupts the store forever);
- empty batches are no-ops;
- the :mod:`.replay` ``batch_id`` guard (merges are not idempotent;
  a replayed batch must be a no-op);
- the merge law is a keyed sum of every non-key column, each sum
  cast back to the column's DECLARED store type (longs stay longs,
  Decimal(38,0) moments stay exact);
- with more than one renderer the merged table is locally
  checkpointed so N renders cost one scan;
- scores are written BEFORE the store version commits (a crash
  between the two re-runs the batch; the replay guard then skips the
  double-merge while the score write is idempotent per batch key).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, functions as F, types as T

from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.replay import (
    batch_already_applied,
    require_integer_cols,
    write_batch_scores,
)

Renderer = tuple[Callable[[DataFrame], DataFrame], str]


def sufficient_stat_step(
    store: VersionedTable,
    schema: T.StructType,
    merge_keys: Sequence[str],
    extract: Callable[[DataFrame], DataFrame],
    renderers: Sequence[Renderer],
    *,
    op_name: str,
    integer_cols: Sequence[str] = (),
    num_buckets: int = 8,
):
    """Build the ``foreachBatch`` step for one sufficient-statistic
    store. ``extract`` reduces a batch to the store's schema;
    ``renderers`` is a list of ``(render_fn, score_path)`` pairs, each
    rendered from the merged store per batch."""
    all_cols = [f.name for f in schema.fields]
    sum_cols = [c for c in all_cols if c not in merge_keys]
    col_type = {f.name: f.dataType.simpleString() for f in schema.fields}

    def step(batch_df: DataFrame, batch_id: int) -> None:
        if integer_cols:
            require_integer_cols(batch_df, list(integer_cols), op_name)
        if batch_df.isEmpty():
            return
        created = store.create_if_not_exists(
            schema, merge_keys=list(merge_keys), num_buckets=num_buckets
        )
        if not created and batch_already_applied(store, batch_id):
            return
        merged = (
            store.read()
            .select(*all_cols)
            .unionByName(extract(batch_df))
            .groupBy(*merge_keys)
            .agg(*[F.sum(c).cast(col_type[c]).alias(c) for c in sum_cols])
        )
        if len(renderers) > 1:
            merged = merged.localCheckpoint(eager=True)  # N renders, 1 scan
        for render, path in renderers:
            write_batch_scores(render(merged), path, batch_id)
        store.overwrite(merged, meta={"batch_id": int(batch_id)})

    return step
