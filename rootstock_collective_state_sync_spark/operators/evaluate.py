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
    from rootstock_collective_state_sync_spark.operators.profile import (
        _distributed_prefix_sum,
    )

    per_score = (
        df.groupBy(F.col(score_col).alias("s"))
        .agg(
            F.sum(F.col(label_col).cast("long")).alias("pos"),
            F.sum(1 - F.col(label_col).cast("long")).alias("neg"),
        )
    )
    # scores are often near-unique, so the cumulative runs on the
    # distributed prefix sum, not a global single-partition window
    # (r12 — the same fix as the equi-depth offset stage)
    scored = _distributed_prefix_sum(per_score, "s", "neg", "neg_below")
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


def average_precision(
    df: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """Exact tie-aware average precision (the PR-curve summary beside
    :func:`binary_auc`'s ROC view — the metric that matters under
    class imbalance, where ROC-AUC flatters): thresholds at distinct
    scores descending, ``AP = Σ_g (pos_g / P) · precision_at(g)``
    with the whole tie group admitted at its threshold (the
    sklearn/step-wise convention). Each term is e9-snapped from exact
    integer counts — the one double division per score group — and
    the cumulative-from-the-top counts come from the DISTRIBUTED
    prefix sum (``cum_desc = total − cum_asc_exclusive``), never a
    global score-ordered window. One row: ``(n_pos, n_neg, ap_e9)``;
    no positives yields ap_e9 = 0 by convention."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        _distributed_prefix_sum,
    )

    per = df.groupBy(F.col(score_col).alias("s")).agg(
        F.sum(F.col(label_col).cast("long")).alias("pos"),
        F.count(F.lit(1)).cast("long").alias("tot"),
    )
    # both cumulatives in ONE prefix pass (shared boundary probe +
    # window tower; the columns co-exist on the input rows)
    t = _distributed_prefix_sum(
        per, "s", ["pos", "tot"], ["pref_pos", "pref_tot"]
    )
    totals = per.agg(
        F.sum("pos").cast("long").alias("p_all"),
        F.sum("tot").cast("long").alias("t_all"),
    )
    terms = t.crossJoin(F.broadcast(totals)).select(
        "pos",
        F.when(
            (F.col("p_all") > 0) & (F.col("pos") > 0),
            F.round(
                F.col("pos").cast("double")
                * (F.col("p_all") - F.col("pref_pos")).cast("double")
                * 1e9
                / (
                    (F.col("t_all") - F.col("pref_tot")).cast("double")
                    * F.col("p_all").cast("double")
                ),
                0,
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("term_e9"),
        "p_all",
        "t_all",
    )
    return terms.agg(
        F.max("p_all").cast("long").alias("n_pos"),
        (F.max("t_all") - F.max("p_all")).cast("long").alias("n_neg"),
        F.sum("term_e9").cast("long").alias("ap_e9"),
    )


def brier_decomposition(
    df: DataFrame, prob_col: str, label_col: str, bins: int = 10
) -> DataFrame:
    """Murphy (1973) decomposition of the binned Brier score:
    ``BS = reliability − resolution + uncertainty`` over ``bins``
    probability bins — reliability is the calibration penalty
    (forecast vs empirical rate per bin), resolution the reward for
    bins that DEVIATE from the base rate, uncertainty the base rate's
    own variance. Probabilities snap to e6 integers BEFORE any sum
    (float summation order never enters), each bin term is one
    e9-snapped double product of exact integer rationals. One row:
    ``(n, n_pos, rel_e9, res_e9, unc_e9, brier_e9)`` with
    ``brier_e9 = rel − res + unc`` by construction.

    Scale shape: one bins-bounded map-side-combined aggregate plus a
    broadcast totals row."""
    p6 = F.round(F.col(prob_col) * 1e6, 0).cast("long")
    bin_ = F.least(
        F.floor(F.col(prob_col) * bins).cast("int"), F.lit(bins - 1)
    )
    per = df.select(
        bin_.alias("bin"), p6.alias("p6"),
        F.col(label_col).cast("long").alias("y"),
    ).groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum("p6").cast("long").alias("sp6"),
        F.sum("y").cast("long").alias("yk"),
    )
    tot = per.agg(
        F.sum("nk").cast("long").alias("n"),
        F.sum("yk").cast("long").alias("n_pos"),
    )
    j = per.crossJoin(F.broadcast(tot))
    pbar = F.col("sp6").cast("double") / (F.col("nk") * 1e6)
    ybar_k = F.col("yk").cast("double") / F.col("nk").cast("double")
    ybar = F.col("n_pos").cast("double") / F.col("n").cast("double")
    rel_t = F.col("nk").cast("double") * (pbar - ybar_k) * (pbar - ybar_k)
    res_t = F.col("nk").cast("double") * (ybar_k - ybar) * (ybar_k - ybar)
    agg = j.select(
        "n",
        "n_pos",
        F.round(rel_t / F.col("n").cast("double") * 1e9, 0)
        .cast("long")
        .alias("rel_t"),
        F.round(res_t / F.col("n").cast("double") * 1e9, 0)
        .cast("long")
        .alias("res_t"),
    ).groupBy("n", "n_pos").agg(
        F.sum("rel_t").cast("long").alias("rel_e9"),
        F.sum("res_t").cast("long").alias("res_e9"),
    )
    unc = F.round(
        F.col("n_pos").cast("double")
        * (F.col("n") - F.col("n_pos")).cast("double")
        / (F.col("n").cast("double") * F.col("n").cast("double"))
        * 1e9,
        0,
    ).cast("long")
    return agg.select(
        "n",
        "n_pos",
        "rel_e9",
        "res_e9",
        unc.alias("unc_e9"),
        (F.col("rel_e9") - F.col("res_e9") + unc).cast("long").alias(
            "brier_e9"
        ),
    )


def adjusted_rand_index(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Exact Adjusted Rand Index (Hubert & Arabie 1985) between two
    partitions of the same rows (X-S22): chance-corrected pair-level
    agreement between labelings ``a_col`` and ``b_col`` — THE
    clustering-vs-truth agreement number (1 = identical partitions,
    ~0 = chance), used to grade an unsupervised assignment (IVF
    cells, LSH buckets, dedup clusters) against labels without any
    name alignment between the two sides.

    Exact integers until one final division: working with DOUBLED
    pair counts ``x·(x−1)`` removes every ``C(x,2)/2``, and clearing
    the expected-index denominator gives

        ``ARI = (2·T2·S2 − 2·A2·B2) / (T2·(A2+B2) − 2·A2·B2)``

    with ``S2 = Σ_ij n_ij(n_ij−1)`` over the contingency table,
    ``A2``/``B2`` its row/column marginal versions and ``T2 =
    N(N−1)`` — all exactly-additive integer sums in DECIMAL(38,0)
    (products reach N⁴-scale), one fixed-operand-order double
    division, e6-snapped. NULL when the denominator is 0 (both
    partitions trivial — agreement is undefined, not 1). Rows where
    either label is NULL are dropped (complete-case, the
    `pearson_matrix` contract).

    Scale shape: one (a, b)-keyed map-side-combined count shuffle to
    the contingency table — #cells × #labels rows, control-plane
    sized — then bounded marginal aggregates; the corpus is scanned
    once."""
    dec = "decimal(38,0)"
    x = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    ct = x.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ra = ct.groupBy("a").agg(F.sum("c").cast("long").alias("ca"))
    rb = ct.groupBy("b").agg(F.sum("c").cast("long").alias("cb"))
    s = ct.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast(dec) * (F.col("c") - 1)).alias("s2"),
    )
    a = ra.agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.sum(F.col("ca").cast(dec) * (F.col("ca") - 1)).alias("a2"),
    )
    b = rb.agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum(F.col("cb").cast(dec) * (F.col("cb") - 1)).alias("b2"),
    )
    j = s.crossJoin(F.broadcast(a)).crossJoin(F.broadcast(b))
    t2 = F.col("n").cast(dec) * (F.col("n") - 1)
    num = (
        F.lit(2).cast(dec) * t2 * F.col("s2")
        - F.lit(2).cast(dec) * F.col("a2") * F.col("b2")
    )
    den = t2 * (F.col("a2") + F.col("b2")) - F.lit(2).cast(dec) * F.col(
        "a2"
    ) * F.col("b2")
    return j.select(
        "n",
        "n_a",
        "n_b",
        F.when(
            den != 0,
            F.round(num.cast("double") / den.cast("double") * 1e6, 0).cast(
                "long"
            ),
        ).alias("ari_e6"),
    )
