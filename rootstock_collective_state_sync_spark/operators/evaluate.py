"""Exact model-evaluation primitives over integer scores.

``binary_auc``: ROC-AUC of an integer score predicting a boolean
label, computed as the Mann-Whitney U statistic with proper tie
handling — the standard check before trusting a quality/domain
classifier's threshold at corpus scale.

Exactness contract: scores are integers (the package's e7 fixed-point
quality scores), so per-distinct-score positive/negative counts, the
cumulative sums, and the doubled U statistic
``U2 = Σ_s pos_s · (2·neg_below_s + neg_s)`` are EXACT integer
arithmetic; the only float is the final division, identical on any
engine (AUC = U2 / (2·n_pos·n_neg)).

Scale shape: one (score)-keyed count shuffle reduces the corpus to
distinct-score rows; the cumulative sum is a single small window over
that frame (bounded by the score domain, not the corpus); the corpus
itself is scanned once and never sorted globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def binary_auc(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """One-row result: ``(n_pos, n_neg, u2, auc)`` where ``auc`` is
    the probability a random positive outscores a random negative
    (ties count half). Degenerate inputs (no positives or no
    negatives) yield auc = 0.5 by convention."""
    per_score = (
        df.groupBy(F.col(score_col).alias("s"))
        .agg(
            F.sum(F.col(label_col).cast("long")).alias("pos"),
            F.sum(1 - F.col(label_col).cast("long")).alias("neg"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    scored = per_score.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    agg = scored.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))
        )
        .cast("long")
        .alias("u2"),
    )
    denom = 2.0 * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        "n_pos",
        "n_neg",
        "u2",
        F.round(
            F.when(denom > 0, F.col("u2") / denom).otherwise(F.lit(0.5)), 6
        ).alias("auc"),
    )
