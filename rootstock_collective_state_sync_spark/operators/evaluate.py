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


def cohens_kappa(
    df: DataFrame, true_col: str, pred_col: str
) -> DataFrame:
    """Chance-corrected agreement between two label columns (Cohen
    1960): one governance row ``(n_docs, n_agree, po_e6, pe_e6,
    kappa_e6)`` in exact e6 fixed-point — ``po`` the observed
    agreement, ``pe`` the chance agreement from the marginals,
    ``kappa = (po - pe) / (1 - pe)``. Kappa may be negative
    (worse-than-chance); the sign is factored out so both engines
    truncate an absolute value and agree bit-for-bit.

    Scale shape: two label-keyed aggregations (map-side combined; the
    label alphabet is tiny) and a labels-sized marginal join — after
    the first exchange only control-plane rows move. The raw table is
    scanned once.
    """
    pair = df.select(
        F.col(true_col).alias("t"), F.col(pred_col).alias("p")
    )
    base = pair.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("t") == F.col("p"), 1).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    rowm = pair.groupBy("t").agg(F.count(F.lit(1)).alias("r"))
    colm = pair.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    pe_num = (
        rowm.join(colm, rowm.t == colm.p)
        .agg(F.coalesce(F.sum(F.col("r") * F.col("c")), F.lit(0)).alias("rc"))
    )
    out = base.crossJoin(pe_num).select(  # 1-row x 1-row
        "n_docs",
        "n_agree",
        F.expr("n_agree * 1000000 div n_docs").cast("long").alias("po_e6"),
        F.expr("rc * 1000000 div (n_docs * n_docs)")
        .cast("long")
        .alias("pe_e6"),
    )
    num = F.col("po_e6") - F.col("pe_e6")
    den = F.lit(1000000) - F.col("pe_e6")
    kappa = F.when(den == 0, F.lit(0)).otherwise(
        F.signum(num).cast("long")
        * F.expr("abs(po_e6 - pe_e6) * 1000000 div (1000000 - pe_e6)")
    )
    return out.select(
        "n_docs", "n_agree", "po_e6", "pe_e6",
        kappa.cast("long").alias("kappa_e6"),
    )
