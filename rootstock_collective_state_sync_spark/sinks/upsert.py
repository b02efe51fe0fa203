"""Keyed idempotent upsert (MERGE) into a :class:`VersionedTable`.

Semantics (parity with the reference's ``executeUpsert``,
``src/handlers/dbUpsert.ts:50-85``):

- match on the entity's declared primary key (``dbUpsert.ts:78-79``);
- matched rows are fully updated, unmatched inserted (``ON CONFLICT …
  DO UPDATE`` with every non-key column in the update set);
- within one batch, the **last** occurrence of a key wins (Postgres
  applies multi-row inserts in order);
- undeclared keys are dropped and nested FK objects ``{id: …}`` are
  flattened to their id before writing (``filterReferenceFields``,
  ``dbUpsert.ts:13-21``);
- re-applying the same batch is a no-op on table content (idempotent);
- commit races retry with exponential backoff (``dbUpsert.ts:25-48``).

Spark-first physical plan: the batch is hashed into the table's fixed
buckets; ONLY the affected buckets are read back, anti-joined-by-merge
(window latest-wins), and rewritten. No full-table rewrite, no
driver-side loops — merge cost scales with batch size, not table size.
The reference's ``batchSize`` chunking (10 000 rows/statement) has no
analog: Spark writes all buckets in parallel in one job.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window, functions as F, types as T

from rootstock_collective_state_sync_spark.sinks.table import (
    BUCKET_COL,
    CommitConflict,
    VersionedTable,
    bucket_expr,
    with_retry,
)

_SEQ = "__seq"
_SRC = "__is_batch"


def prepare_batch(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project an incoming batch onto the declared schema.

    - drops undeclared columns (``dbUpsert.ts:7-11``);
    - flattens nested FK structs ``{id: …}`` to the id value
      (``dbUpsert.ts:13-21``);
    - casts to declared types (overflow raises — uint256 policy);
    - raises when a declared NOT NULL column is missing or null
      (Spark does not enforce nullability on write; the reference
      delegated this to Postgres constraints).
    """
    in_fields = {f.name: f for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name not in in_fields:
            if not f.nullable:
                raise ValueError(f"batch missing NOT NULL column {f.name!r}")
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src = in_fields[f.name]
        c = F.col(f.name)
        if isinstance(src.dataType, T.StructType) and "id" in src.dataType.names:
            c = c.getField("id")  # FK object -> scalar id
        cols.append(c.cast(f.dataType).alias(f.name))
    out = df.select(*cols)
    required = [f.name for f in schema.fields if not f.nullable]
    if required:
        # engine-side NOT NULL enforcement, one distributed pass
        bad = out.filter(
            " OR ".join(f"`{c}` IS NULL" for c in required)
        ).limit(1).count()
        if bad:
            raise ValueError(f"NOT NULL violation in batch for one of {required}")
    return out


def merge_upsert(
    table: VersionedTable,
    batch: DataFrame,
    meta: dict[str, Any] | None = None,
    max_retries: int = 3,
    initial_delay: float = 0.1,
    when_matched_condition: str | None = None,
) -> int:
    """MERGE ``batch`` INTO ``table`` ON its merge keys; returns the new
    table version (or the current one for an empty batch).

    ``when_matched_condition``: optional SQL boolean over ``src``/``tgt``
    aliases, e.g. ``"src.rawState <> tgt.rawState"`` — matched target
    rows are replaced only when it holds (the reference's diff-update,
    ``blockProposalStateStrategy.ts:116-131``, set-based).
    """
    m0 = table.manifest()
    schema, keys, nb = m0.schema, m0.merge_keys, m0.num_buckets
    src = prepare_batch(batch, schema)
    if not src.take(1):
        return m0.version

    # last occurrence of a key in the batch wins: tag arrival order
    # BEFORE any shuffle moves rows around.
    src = src.withColumn(_SEQ, F.monotonically_increasing_id())
    src = src.withColumn(BUCKET_COL, bucket_expr(keys, nb)).cache()
    try:
        affected = [r[0] for r in src.select(BUCKET_COL).distinct().collect()]

        def attempt() -> int:
            prev = table.manifest()
            tgt = (
                table.read(buckets=affected)
                .withColumn(_SEQ, F.lit(-1).cast("long"))
                .withColumn(BUCKET_COL, bucket_expr(keys, nb))
            )
            s = src.withColumn(_SRC, F.lit(True))
            t = tgt.withColumn(_SRC, F.lit(False))

            if when_matched_condition is not None:
                # drop source rows whose matched target row fails the
                # condition (target kept unchanged); unmatched source
                # rows always insert.
                s_pref = s.select([F.col(c).alias(f"s_{c}") for c in s.columns])
                t_pref = t.select([F.col(c).alias(f"t_{c}") for c in t.columns])
                joined = s_pref.join(
                    t_pref,
                    [F.col(f"s_{k}") == F.col(f"t_{k}") for k in keys],
                    "left",
                )
                cond = F.expr(
                    when_matched_condition.replace("src.", "s_").replace("tgt.", "t_")
                )
                blocked_keys = (
                    joined.filter(
                        F.col(f"t_{keys[0]}").isNotNull()
                        & ~F.coalesce(cond, F.lit(False))
                    )
                    .select(*[F.col(f"s_{k}").alias(k) for k in keys])
                    .distinct()
                )
                s = s.join(blocked_keys, keys, "left_anti")

            unioned = t.unionByName(s)
            w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
                F.col(_SEQ).desc()
            )
            merged = (
                unioned.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select(*schema.names)
            )
            # merged covers exactly the affected buckets (src and tgt
            # were both restricted to them); empty list drops a bucket.
            new_files = table._write_tx(merged, nb, keys)
            replaced = {str(b): new_files.get(str(b), []) for b in affected}
            return table.commit_buckets(replaced, prev.version, meta=meta)

        return with_retry(attempt, max_retries=max_retries, initial_delay=initial_delay)
    finally:
        src.unpersist()
