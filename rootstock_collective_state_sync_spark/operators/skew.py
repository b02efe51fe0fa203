"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in :mod:`..session`);
these explicit rewrites cover what AQE cannot: a single hot GROUP BY
key (one reducer gets the world) and skewed joins against a dimension
too large to broadcast.

- :func:`salted_agg` — two-phase aggregation: partial agg on
  (key, salt) spreads a hot key over ``salt_buckets`` reducers, final
  agg re-combines. Only decomposable aggregates (sum/count/min/max)
  qualify; avg = sum/count at the end.
- :func:`salted_join` — the big side gets a deterministic salt in
  [0, k); the dimension is replicated k times (one copy per salt);
  the join key becomes (key, salt), so one hot key spreads over k
  tasks while every row still meets exactly one dim replica.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_alias: str | None = "n",
    salt_buckets: int = 16,
) -> DataFrame:
    """GROUP BY ``keys`` with hot-key-safe two-phase execution.

    ``sums`` maps input column -> output alias (SUM semantics);
    ``count_alias`` adds a row count. The salt derives from the whole
    row's hash — deterministic, no RNG state."""
    sums = sums or {}
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial_aggs = [F.sum(c).alias(f"__p_{a}") for c, a in sums.items()]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("__p_n"))
    partial = salted.groupBy(*keys, SALT).agg(*partial_aggs)

    final_aggs = [F.sum(f"__p_{a}").alias(a) for a in sums.values()]
    if count_alias:
        final_aggs.append(F.sum("__p_n").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where ``big[on]`` is skewed and ``dim`` is too large
    to broadcast: spread each key over ``salt_buckets`` tasks."""
    big_salted = big.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)),
    )
    dim_replicated = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_salted.join(dim_replicated, [on, SALT], how).drop(SALT)


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
) -> DataFrame:
    """Join/agg-key skew diagnostic: the top-``top_k`` heaviest keys
    with their row share and a skew factor (key count / mean key
    count). This is the report you run BEFORE picking a shuffle key
    at 100 TB — a skew factor over ~20 on the planned join key means
    :func:`salted_join` / AQE skew handling, not a plain hash join.

    Plan: one map-side-combined count shuffle on the key, a 2-row
    global aggregate for totals, and a top-k window cut — the raw
    table is touched once.

    Returns ``(key, n_rows, row_share, skew_factor, rk)`` ordered by
    weight, ties broken by key ascending for determinism.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_keys")
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= top_k)
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("row_share"),
            F.round(
                F.col("n_rows") * F.col("_keys") / F.col("_total"), 6
            ).alias("skew_factor"),
            "rk",
        )
    )
