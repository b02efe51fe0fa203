"""Salted aggregation/join: result-equivalence with the unsalted plan
and physical evidence that the shuffle key includes the salt."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators import skew


def skewed_df(spark):
    # 10k rows on one hot key + a long tail
    hot = spark.range(10_000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).alias("v")
    )
    tail = spark.range(500).select(
        F.concat(F.lit("t"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_plain(spark):
    df = skewed_df(spark)
    plain = {
        (r.k): (r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n)
        for r in skew.salted_agg(df, ["k"], sums={"v": "s"}).collect()
    }
    assert salted == plain
    assert salted["HOT"][1] == 10_000


def test_salted_agg_spreads_hot_key(spark):
    df = skewed_df(spark)
    partial = df.withColumn(
        skew.SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(16)),
    ).groupBy("k", skew.SALT).count()
    hot_buckets = partial.filter(F.col("k") == "HOT").count()
    assert hot_buckets > 8  # the hot key really lands in many buckets


def test_salted_join_equals_plain(spark):
    big = skewed_df(spark)
    dim = spark.createDataFrame(
        [("HOT", "hotdim")] + [(f"t{i}", f"d{i}") for i in range(500)],
        ["k", "label"],
    )
    plain = sorted(
        (r.k, r.v, r.label) for r in big.join(dim, "k", "inner").collect()
    )
    salted = sorted(
        (r.k, r.v, r.label)
        for r in skew.salted_join(big, dim, on="k", how="inner").collect()
    )
    assert salted == plain
    # left join keeps unmatched big-side rows exactly once
    big2 = big.unionByName(
        spark.createDataFrame([("orphan", 1)], ["k", "v"])
    )
    left = skew.salted_join(big2, dim, on="k", how="left")
    assert left.filter(F.col("k") == "orphan").count() == 1
