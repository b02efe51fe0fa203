"""2-D skyline (Pareto front) operator.

Skyline queries (Börzsönyi et al. 2001, "The Skyline Operator") have
no native Spark/DuckDB operator; this is the classic distributed
decomposition — local skyline per partition cell, merge, exact final
verify — expressed entirely in DataFrame ops (no UDF):

1. LOCAL per-bucket skyline: a parallel per-(bucket, x) max + an
   intra-bucket running-max window sweep. Output per bucket is
   bounded by the number of distinct y values in it.
2. CROSS-BUCKET prune: the running max of y over strictly-cheaper
   buckets (a #buckets-row control-plane frame, broadcast back).
   Sound: anything it removes is dominated by a strictly-better-x
   point with >= y.
3. EXACT dominance anti-join on the surviving candidate set. Because
   every pruned row provably has a SKYLINE dominator (domination
   chains end at the skyline, and the prunes never remove skyline
   rows), checking survivors against survivors is complete — the
   result is the exact skyline, while the quadratic check never sees
   more than ~#buckets x #distinct-y rows.

At 100 TB: one bucket-keyed aggregation + one broadcast-filter scan
are the only corpus-sized operations; the windows run over per-bucket
distinct-x tables (parallel) and the #buckets frame (control-plane).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    bucket: Column,
) -> DataFrame:
    """Rows of ``df`` not dominated on (minimize ``minimize``,
    maximize ``maximize``); ``d`` dominates ``s`` iff ``d`` is <= on
    the minimized axis, >= on the maximized axis, and strictly
    better on at least one. Ties on both axes are incomparable, so
    exact duplicates of a skyline point all survive. ``bucket`` must
    be monotone non-decreasing in ``minimize`` (e.g. a fixed-width
    integer bucketing of it)."""
    b = df.withColumn("_bk", bucket)

    pp = b.groupBy("_bk", minimize).agg(F.max(maximize).alias("_pmax"))
    wloc = (
        Window.partitionBy("_bk")
        .orderBy(minimize)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = pp.withColumn("_mstrict", F.max("_pmax").over(wloc))
    local_sky = (
        b.join(loc, ["_bk", minimize])
        .filter(
            (
                F.col("_mstrict").isNull()
                | (F.col(maximize) > F.col("_mstrict"))
            )
            & (F.col(maximize) >= F.col("_pmax"))
        )
        .drop("_pmax", "_mstrict")
    )

    bmax = b.groupBy("_bk").agg(F.max(maximize).alias("_bmax"))
    wb = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    pre = bmax.withColumn("_pre", F.max("_bmax").over(wb)).select("_bk", "_pre")
    surv = local_sky.join(F.broadcast(pre), "_bk").filter(
        F.col("_pre").isNull() | (F.col(maximize) > F.col("_pre"))
    )

    d = surv.select(
        F.col(minimize).alias("_dx"), F.col(maximize).alias("_dy")
    )
    return (
        surv.alias("s")
        .join(
            F.broadcast(d).alias("d"),
            (F.col("d._dx") <= F.col(f"s.{minimize}"))
            & (F.col("d._dy") >= F.col(f"s.{maximize}"))
            & (
                (F.col("d._dx") < F.col(f"s.{minimize}"))
                | (F.col("d._dy") > F.col(f"s.{maximize}"))
            ),
            "left_anti",
        )
        .drop("_bk", "_pre")
    )
