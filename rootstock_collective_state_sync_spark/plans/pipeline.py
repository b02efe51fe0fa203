"""Declarative curation pipelines: a list-of-stages spec compiled
into one lazy DataFrame chain.

The reference engine is config-driven (entities + strategies from
YAML); this is the same stance applied to corpus curation — a
pipeline is DATA (a list of ``{"stage": ..., params}`` dicts, JSON/
YAML-serializable, diffable, reviewable), not code. Every stage maps
onto an already-oracled operator, so a spec inherits the conformance
guarantees of its parts.

Compilation is lazy: the whole spec becomes ONE logical plan and
Catalyst optimizes across stage boundaries (filter stages merge into
the scan; nothing materializes between stages). ``audit=True`` trades
that laziness for per-stage row counts — the kill-rate report every
curation run wants — by counting each prefix (cheap at audit time:
prefixes share the scan via cache).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, Window, functions as F

from rootstock_collective_state_sync_spark.operators import dedup as D
from rootstock_collective_state_sync_spark.operators import rules as RL
from rootstock_collective_state_sync_spark.operators import sampling as SA
from rootstock_collective_state_sync_spark.operators.text import (
    quality_score_e7,
    token_count,
)


def _stage_gopher_filter(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    flags = RL.gopher_quality(df, **{k: v for k, v in p.items() if k != "stage"})
    return df.join(
        flags.filter(F.col("gopher_keep")).select(F.col("doc_id")),
        "doc_id",
        "left_semi",
    )


def _stage_exact_dedup(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    keepers = D.exact_groups(df).select(F.col("keeper_id").alias("doc_id"))
    return df.join(keepers, "doc_id", "left_semi")


def _stage_near_dedup(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    pairs = D.minhash_lsh_pairs(
        df, threshold=p.get("threshold", 0.5)
    ).select("id_a", "id_b")
    comp = D.connected_components(pairs, df.select("doc_id"))
    w = Window.partitionBy("component").orderBy(F.col("id").asc())
    keepers = (
        comp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("id").alias("doc_id"))
    )
    return df.join(keepers, "doc_id", "left_semi")


def _stage_quality_floor(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    return df.filter(quality_score_e7(F.col("text")) >= int(p["min_e7"]))


def _stage_token_cap(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    return df.filter(token_count(F.col("text")) <= int(p["max_tokens"]))


def _stage_sample(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    return SA.stratified_sample(
        df,
        key_col=p.get("key_col", "doc_id"),
        strata_col=p.get("strata_col", "source"),
        rates=dict(p.get("rates", {})),
        default_rate=float(p.get("default_rate", 0.0)),
    )


def _stage_repetition_filter(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    flags = RL.repetition_signals(
        df, **{k: v for k, v in p.items() if k != "stage"}
    )
    return df.join(
        flags.filter(F.col("rep_keep")).select("doc_id"), "doc_id", "left_semi"
    )


def _stage_line_dedup(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Transform stage (rewrites text, keeps every row): strip lines
    shared by >= min_docs documents, then drop docs left empty if
    drop_empty."""
    cleaned = D.strip_boilerplate_lines(
        df, min_docs=int(p.get("min_docs", 3))
    ).select("doc_id", "text")
    out = df.drop("text").join(cleaned, "doc_id")
    if p.get("drop_empty", True):
        out = out.filter(F.length("text") > 0)
    return out


def _stage_containment_dedup(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Drop documents CONTAINED in a bigger one (keep the superset)."""
    pairs = D.containment_pairs(df, threshold=float(p.get("threshold", 0.8)))
    return df.join(
        pairs.select(F.col("id_small").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )


def _stage_pii_card_filter(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Quarantine documents carrying Luhn-VALID card-number runs
    (plausible real PII); random digit runs pass through."""
    from rootstock_collective_state_sync_spark.operators.text import luhn_audit

    bad = (
        luhn_audit(df)
        .filter(F.col("n_luhn_valid") >= int(p.get("max_valid", 1)))
        .select("doc_id")
    )
    return df.join(bad, "doc_id", "left_anti")


def _stage_novelty_floor(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Drop documents whose n-gram novelty is below the floor — the
    're-scraped content' cut of an incremental crawl."""
    from rootstock_collective_state_sync_spark.operators.dedup import (
        ngram_novelty,
    )

    keep = (
        ngram_novelty(df, n=int(p.get("n", 3)))
        .filter(F.col("novelty_e6") >= int(p["min_e6"]))
        .select("doc_id")
    )
    return df.join(keep, "doc_id", "left_semi")


def _stage_entropy_floor(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Drop gibberish/template docs below the Shannon-entropy floors
    (token- and/or char-level; either floor may be omitted)."""
    from rootstock_collective_state_sync_spark.operators.text import entropy_scores

    sc = entropy_scores(df)
    cond = F.lit(True)
    if "min_token_entropy" in p:
        cond = cond & (F.col("token_entropy") >= float(p["min_token_entropy"]))
    if "min_char_entropy" in p:
        cond = cond & (F.col("char_entropy") >= float(p["min_char_entropy"]))
    if "max_char_entropy" in p:  # binary/garbled payload ceiling
        cond = cond & (F.col("char_entropy") <= float(p["max_char_entropy"]))
    return df.join(
        sc.filter(cond).select("doc_id"), "doc_id", "left_semi"
    )


def _stage_script_filter(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Keep only docs whose dominant character script is allowed —
    the homoglyph/spam screen upstream of lang-id."""
    from rootstock_collective_state_sync_spark.operators.text import script_census

    allowed = [s.lower() for s in p.get("scripts", ["latin"])]
    keep = (
        script_census(df)
        .filter(F.col("main_script").isin(*allowed))
        .select("doc_id")
    )
    return df.join(keep, "doc_id", "left_semi")


def _stage_c4_filter(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) as a keep-filter."""
    flags = RL.c4_quality(
        df,
        min_line_words=int(p.get("min_line_words", 5)),
        min_sentences=int(p.get("min_sentences", 3)),
    )
    return df.join(
        flags.filter(F.col("c4_keep") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    )


def _stage_readability_band(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Keep docs inside a Flesch reading-ease band (e3-snapped ints;
    both too-hard and suspiciously-easy text can be cut)."""
    from rootstock_collective_state_sync_spark.operators.text import (
        readability_scores,
    )

    keep = (
        readability_scores(df)
        .filter(
            (F.col("flesch_e3") >= int(p.get("min_e3", 0)))
            & (F.col("flesch_e3") <= int(p.get("max_e3", 206_835)))
        )
        .select(F.col("id").alias("doc_id"))
    )
    return df.join(keep, "doc_id", "left_semi")


def _stage_dsir_floor(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Keep docs whose DSIR mean log-likelihood ratio against the
    target subcorpus clears the floor (``target_sources`` marks the
    target slice; the raw side is the whole pool, per the paper)."""
    from rootstock_collective_state_sync_spark.operators.text import dsir_log_ratio

    marked = df.withColumn(
        "is_target", F.col(p.get("source_col", "source")).isin(
            *p["target_sources"]
        )
    )
    keep = (
        dsir_log_ratio(marked, num_buckets=int(p.get("num_buckets", 4096)))
        .filter(F.col("mean_lr") >= float(p["min_mean_lr"]))
        .select("doc_id")
    )
    return df.join(keep, "doc_id", "left_semi")


def _audit_benford(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Benford first-digit census of a numeric column (report rows:
    one per digit) — the fabricated-numbers screen run IN the
    pipeline so a curation run's audit trail carries it."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        benford_audit,
    )

    return benford_audit(
        df, p["value_col"], cents=bool(p.get("cents", True))
    )


def _audit_gini(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Per-group Gini concentration of a numeric column (one report
    row per group) — the dominance screen (is one source/shard
    hogging the value mass?)."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        gini_index,
    )

    return gini_index(
        df, list(p["group_cols"]), p["value_col"], p["id_col"]
    )


def _audit_equidepth(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Equi-depth histogram of a numeric column (one report row per
    bucket) — the optimizer-stats boundary report, distributed
    prefix-sum build."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        equidepth_histogram,
    )

    return equidepth_histogram(
        df, p["value_col"], p["id_col"], buckets=int(p.get("buckets", 8))
    )


def _audit_woe_iv(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """WOE/IV feature-binning screen (one report row per bin): does a
    numeric column (length, quality score) PREDICT a boolean slice of
    the corpus (``target_expr``, a SQL boolean — e.g. ``lang = 'en'``)?
    High IV on a supposedly-neutral feature is a selection-bias smell
    a curation run wants in its trail before training sees the data."""
    from rootstock_collective_state_sync_spark.operators.profile import woe_iv

    marked = df.withColumn(
        "_target", F.expr(p["target_expr"]).cast("int")
    )
    return woe_iv(
        marked,
        p["value_col"],
        p.get("id_col", "doc_id"),
        "_target",
        bins=int(p.get("bins", 10)),
    )


def _audit_cusum(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """One-sided CUSUM drift screen over INGEST ORDER (one report row
    per flagged-or-top sequence bucket): bucket the corpus by
    ``seq_col div bucket_size`` (ingest sequence), track the bucketed
    mean of ``value_col`` with Page's running-min identity (same
    window-expressible form as ``q_cusum_changepoints``,
    `plans/analytics.py`), and report the top-3 CUSUM buckets with
    their flag — "did document length/quality shift mid-corpus?" in
    the audit trail."""
    seq = p.get("seq_col", "doc_id")
    size = int(p.get("bucket_size", 1000))
    # exact integer `div` (the documented semantics), not
    # double-divide-then-cast: doubles lose exactness past 2^53
    per = df.groupBy(
        F.expr(f"cast({seq} as bigint) div {size}").alias("seq_bucket")
    ).agg(
        F.expr(f"sum({p['value_col']}) * 1000000 div count(1)")
        .cast("long")
        .alias("v_e6")
    )
    mean = per.agg(
        F.expr("sum(v_e6) div count(1)").cast("long").alias("mean_e6")
    )
    w_cum = (
        Window.orderBy("seq_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = per.crossJoin(F.broadcast(mean)).withColumn(
        "x_e6",
        (F.col("v_e6") - F.col("mean_e6")) - F.expr("abs(mean_e6) div 4"),
    )
    s = x.withColumn("s_e6", F.sum("x_e6").over(w_cum)).withColumn(
        "cusum_e6",
        F.col("s_e6")
        - F.least(F.min("s_e6").over(w_cum), F.lit(0).cast("long")),
    )
    # the seq-bucket table is ingest-sequence-sized (rows/bucket_size),
    # a control-plane frame — the ordered window is bounded by spec
    return (
        s.orderBy(F.col("cusum_e6").desc(), F.col("seq_bucket").asc())
        .limit(3)
        .select(
            "seq_bucket",
            "v_e6",
            "cusum_e6",
            (F.col("cusum_e6") > 2 * F.abs(F.col("mean_e6")))
            .cast("int")
            .alias("flagged"),
        )
    )


def _audit_avg_precision(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Model-gate screen (ONE report row): exact tie-aware average
    precision of ``score_col`` against the ``target_expr`` slice —
    the PR-summary a curation run checks before trusting a
    model-based quality filter (pair with a min ap_e9 in review)."""
    from rootstock_collective_state_sync_spark.operators.evaluate import (
        average_precision,
    )

    marked = df.withColumn("_y", F.expr(p["target_expr"]).cast("int"))
    return average_precision(marked, p["score_col"], "_y")


def _audit_brier(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Calibration gate (ONE report row): Murphy decomposition of the
    binned Brier score for a probability column against the
    ``target_expr`` slice — reliability/resolution/uncertainty in the
    trail, so a drifting classifier fails review before it filters."""
    from rootstock_collective_state_sync_spark.operators.evaluate import (
        brier_decomposition,
    )

    marked = df.withColumn("_y", F.expr(p["target_expr"]).cast("int"))
    return brier_decomposition(
        marked, p["prob_col"], "_y", bins=int(p.get("bins", 10))
    )


def _audit_ks(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Distribution-drift gate (ONE report row): exact two-sample KS
    distance of ``value_col`` between the ``group_expr`` slice and
    its complement — "does the flagged slice's length/quality
    distribution differ in SHAPE?" (a mean comparison misses tail
    moves)."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        ks_two_sample,
    )

    return ks_two_sample(df, p["value_col"], p["group_expr"])


def _audit_w1(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Drift-MAGNITUDE gate (ONE report row): exact Wasserstein-1 of
    ``value_col``, ``group_expr`` slice vs complement — how much
    mass moved, the quantitative partner to the KS gate's worst-point
    answer (pair both in review: KS for shape alarms, W1 for a
    budgetable drift number)."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        wasserstein_1d,
    )

    return wasserstein_1d(df, p["value_col"], p["group_expr"])


def _audit_anova(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Mean-shift gate across a categorical column (ONE report row):
    one-way ANOVA F + eta² of ``value_col`` across ``group_col`` —
    "do the sources/languages differ in mean length/quality?" with
    the variance share (eta²) as the practical-significance number."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        anova_oneway,
    )

    return anova_oneway(df, p["value_col"], p["group_col"])


def _audit_mwu(df: DataFrame, p: dict[str, Any]) -> DataFrame:
    """Rank-shift gate (ONE report row): exact tie-corrected
    Mann-Whitney U of ``value_col``, ``group_expr`` slice vs
    complement — the nonparametric A/B screen for heavy-tailed
    pipeline metrics."""
    from rootstock_collective_state_sync_spark.operators.profile import (
        mann_whitney_u,
    )

    return mann_whitney_u(df, p["value_col"], p["group_expr"])


#: AUDIT stages: pass-through for the data plan (compile_pipeline
#: treats them as identity — the curated output is unchanged), but in
#: ``run_pipeline(audit=True)`` their bounded report rows are embedded
#: in the trail entry. This is how the r11 table screens (Benford /
#: Gini / equi-depth) ride in a declarative curation run without
#: becoming row filters.
AUDIT_STAGES: dict[str, Callable[[DataFrame, dict[str, Any]], DataFrame]] = {
    "benford_audit": _audit_benford,
    "gini_audit": _audit_gini,
    "equidepth_audit": _audit_equidepth,
    # r13 (r12 verdict item 5): the r12 analytics a curation run
    # actually gates on, as trail-borne screens
    "woe_iv_audit": _audit_woe_iv,
    "cusum_audit": _audit_cusum,
    "avg_precision_audit": _audit_avg_precision,
    "brier_audit": _audit_brier,
    "ks_audit": _audit_ks,
    "mwu_audit": _audit_mwu,
    # r14: the drift-magnitude and mean-shift companions
    "w1_audit": _audit_w1,
    "anova_audit": _audit_anova,
}

#: hard cap on embedded report rows — an audit trail is a control-
#: plane artifact, never a data sink
MAX_AUDIT_REPORT_ROWS = 100

STAGES: dict[str, Callable[[DataFrame, dict[str, Any]], DataFrame]] = {
    "gopher_filter": _stage_gopher_filter,
    "exact_dedup": _stage_exact_dedup,
    "near_dedup": _stage_near_dedup,
    "quality_floor": _stage_quality_floor,
    "token_cap": _stage_token_cap,
    "sample": _stage_sample,
    "repetition_filter": _stage_repetition_filter,
    "line_dedup": _stage_line_dedup,
    "containment_dedup": _stage_containment_dedup,
    "pii_card_filter": _stage_pii_card_filter,
    "novelty_floor": _stage_novelty_floor,
    # r11: the round-9/10 quality screens as declarative stages
    "entropy_floor": _stage_entropy_floor,
    "script_filter": _stage_script_filter,
    "c4_filter": _stage_c4_filter,
    "readability_band": _stage_readability_band,
    "dsir_floor": _stage_dsir_floor,
}


def compile_pipeline(df: DataFrame, spec: list[dict[str, Any]]) -> DataFrame:
    """Fold the spec into one lazy plan (audit stages are identity —
    their reports only exist in ``run_pipeline(audit=True)``'s trail).
    Unknown stages fail loudly at compile time, not mid-job."""
    unknown = [
        s.get("stage")
        for s in spec
        if s.get("stage") not in STAGES and s.get("stage") not in AUDIT_STAGES
    ]
    if unknown:
        raise ValueError(
            f"unknown pipeline stages {unknown}; "
            f"known: {sorted(STAGES) + sorted(AUDIT_STAGES)}"
        )
    out = df
    for s in spec:
        if s["stage"] in STAGES:
            out = STAGES[s["stage"]](out, s)
    return out


def run_pipeline(
    df: DataFrame, spec: list[dict[str, Any]], audit: bool = False
) -> tuple[DataFrame, list[dict[str, Any]]]:
    """Compile and (optionally) audit: with ``audit=True`` each
    filter stage's surviving row count is measured (the kill-rate
    report) and each AUDIT stage's bounded report rows are embedded
    at their position in the trail (capped at
    ``MAX_AUDIT_REPORT_ROWS`` — trails are control-plane artifacts);
    the input is cached for the prefix counts and released after."""
    out = compile_pipeline(df, spec)
    trail: list[dict[str, Any]] = []
    if audit:
        cached = df.persist()
        try:
            prev = cached.count()
            trail.append({"stage": "input", "rows": prev})
            cur = cached
            for s in spec:
                if s["stage"] in AUDIT_STAGES:
                    rep = (
                        AUDIT_STAGES[s["stage"]](cur, s)
                        .limit(MAX_AUDIT_REPORT_ROWS)
                        .collect()
                    )
                    trail.append(
                        {
                            "stage": s["stage"],
                            "rows": prev,
                            "killed": 0,
                            "report": [r.asDict() for r in rep],
                        }
                    )
                    continue
                cur = STAGES[s["stage"]](cur, s)
                n = cur.count()
                trail.append(
                    {"stage": s["stage"], "rows": n, "killed": prev - n}
                )
                prev = n
        finally:
            cached.unpersist()
    return out, trail
