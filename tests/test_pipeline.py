"""Declarative curation pipeline: compile-time stage validation,
end-to-end run over real testdata, audit kill-rate trail, and
determinism of the composed plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.plans.pipeline import (
    compile_pipeline,
    run_pipeline,
)
from rootstock_collective_state_sync_spark.plans.tables import load_table

from tests.conftest import SF_SMOKE

SPEC = [
    {"stage": "token_cap", "max_tokens": 80},
    {"stage": "quality_floor", "min_e7": 4_000_000},
    {"stage": "exact_dedup"},
    {"stage": "near_dedup", "threshold": 0.5},
    {
        "stage": "sample",
        "rates": {"src0": 1.0, "src1": 1.0},
        "default_rate": 0.5,
    },
]


def test_unknown_stage_fails_at_compile_time(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError, match="unknown pipeline stages"):
        compile_pipeline(docs, [{"stage": "typo_dedup"}])


def test_pipeline_end_to_end_with_audit(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out, trail = run_pipeline(docs, SPEC, audit=True)
    assert trail[0]["stage"] == "input" and trail[0]["rows"] == 500
    # monotone: every stage only removes rows
    rows = [t["rows"] for t in trail]
    assert all(a >= b for a, b in zip(rows, rows[1:]))
    # every stage reports, and killed adds up
    assert [t["stage"] for t in trail[1:]] == [s["stage"] for s in SPEC]
    assert all(t["killed"] == p - t["rows"] for t, p in zip(trail[1:], rows))
    # the lazy compiled plan agrees with the audited chain
    assert out.count() == trail[-1]["rows"]
    # stages actually filtered something on this corpus
    assert 0 < trail[-1]["rows"] < 500


def test_pipeline_is_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = {r["doc_id"] for r in compile_pipeline(docs, SPEC).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in compile_pipeline(docs.repartition(13), SPEC)
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_new_stages_compose_with_audit(spark):
    from rootstock_collective_state_sync_spark.plans.pipeline import (
        run_pipeline,
    )
    from rootstock_collective_state_sync_spark.plans.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    spec = [
        {"stage": "line_dedup", "min_docs": 3},
        {"stage": "repetition_filter"},
        {"stage": "containment_dedup", "threshold": 0.8},
        {"stage": "exact_dedup"},
    ]
    out, trail = run_pipeline(docs, spec, audit=True)
    rows = out.count()
    assert rows > 0
    stages = [t["stage"] for t in trail]
    assert stages == ["input", "line_dedup", "repetition_filter",
                      "containment_dedup", "exact_dedup"]
    # monotone survivors, and the trail is consistent
    counts = [t["rows"] for t in trail]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] == rows
    assert all(t.get("killed", 0) >= 0 for t in trail[1:])
    # text column survives the line_dedup rewrite
    assert "text" in out.columns


def test_pii_and_novelty_stages(spark):
    from rootstock_collective_state_sync_spark.plans.pipeline import (
        run_pipeline,
    )

    base = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # zero-novelty re-scrape
            (3, "pay with card 4539 1488 0343 6467 now please " + base),
            (4, "random digits 4539 1488 0343 6468 here " + base),
        ],
        "doc_id long, text string",
    )
    out, trail = run_pipeline(
        docs,
        [
            {"stage": "pii_card_filter"},
            {"stage": "novelty_floor", "min_e6": 100_000},
        ],
        audit=True,
    )
    ids = {r["doc_id"] for r in out.collect()}
    # 3 quarantined (Luhn-valid card), 2 cut as zero-novelty re-scrape;
    # 4's digit run fails the checksum so it survives the PII stage
    assert ids == {1, 4}
    assert [t["stage"] for t in trail] == [
        "input", "pii_card_filter", "novelty_floor"
    ]


def test_r11_quality_screen_stages(spark):
    """The round-9/10 screens as declarative stages (r10 verdict item
    8): entropy floor, script filter, C4 rules, readability band, and
    the DSIR weight floor compose into one auditable spec over the
    real documents table."""
    docs = load_table(spark, SF_SMOKE, "documents")
    # the testdata docs carry no terminal punctuation, so the c4 stage
    # is exercised on the synthetic corpus below instead
    spec = [
        {"stage": "script_filter", "scripts": ["latin"]},
        {"stage": "entropy_floor", "min_char_entropy": 0.5},
        {"stage": "readability_band", "min_e3": 0, "max_e3": 206_835},
        {
            "stage": "dsir_floor",
            "target_sources": ["src0", "src1"],
            "min_mean_lr": -10.0,
        },
    ]
    out, trail = run_pipeline(docs, spec, audit=True)
    assert [t["stage"] for t in trail] == [
        "input", "script_filter", "entropy_floor",
        "readability_band", "dsir_floor",
    ]
    counts = [t["rows"] for t in trail]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] == 500 and out.count() == counts[-1] > 0
    # the stages actually bite on synthetic junk rows
    good = (
        "The quick brown fox jumps over the lazy dog today. "
        "It was a bright cold day in April and the clocks struck."
    )
    corpus = spark.createDataFrame(
        [(1, good),
         (2, "aaaa aaaa aaaa aaaa."),                       # low entropy
         (3, "Добрый день всем сегодня."),                  # cyrillic
         (4, "no terminal punctuation here at all")],       # c4 kill
        "doc_id long, text string",
    ).withColumn("source", F.lit("srcX"))
    out2, _ = run_pipeline(
        corpus,
        [
            {"stage": "script_filter", "scripts": ["latin"]},
            {"stage": "entropy_floor", "min_char_entropy": 2.0},
            {"stage": "c4_filter", "min_line_words": 2, "min_sentences": 1},
        ],
        audit=False,
    )
    ids2 = {r["doc_id"] for r in out2.select("doc_id").collect()}
    assert ids2 == {1}


def test_audit_stages_embed_reports_without_filtering(spark):
    """r11 verdict item 10: the table screens (Benford / Gini /
    equi-depth) ride in a pipeline as AUDIT stages — identity for the
    data plan, bounded report rows embedded at their trail position."""
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("vc"),
        )
    )
    spec = [
        {"stage": "benford_audit", "value_col": "vc", "cents": False},
        {"stage": "gini_audit", "group_cols": ["o_orderpriority"],
         "value_col": "vc", "id_col": "o_orderkey"},
        {"stage": "equidepth_audit", "value_col": "vc",
         "id_col": "o_orderkey", "buckets": 4},
    ]
    n_in = orders.count()
    out, trail = run_pipeline(orders, spec, audit=True)
    # identity for the data plan — audit stages never filter
    assert out.count() == n_in
    assert [t["stage"] for t in trail] == [
        "input", "benford_audit", "gini_audit", "equidepth_audit"
    ]
    assert all(t.get("killed", 0) == 0 for t in trail[1:])
    benford, gini, eqd = (t["report"] for t in trail[1:])
    assert len(benford) == 9 and {r["digit"] for r in benford} == set(
        range(1, 10)
    )
    assert sum(r["n"] for r in benford) == n_in
    assert len(gini) == 5  # one row per order priority
    assert all(0 <= r["gini_e6"] <= 1_000_000 for r in gini)
    assert len(eqd) == 4 and sum(r["n"] for r in eqd) == n_in
    # depth balance: buckets within one row of each other
    depths = [r["n"] for r in eqd]
    assert max(depths) - min(depths) <= 1
    # boundaries contiguous + monotone
    assert all(
        eqd[i]["hi"] <= eqd[i + 1]["lo"] for i in range(len(eqd) - 1)
    )
    # composition with a filter stage: the audit runs at its position
    spec2 = [
        {"stage": "benford_audit", "value_col": "vc", "cents": False},
    ]
    out2, trail2 = run_pipeline(orders, spec2, audit=False)
    assert trail2 == [] and out2.count() == n_in


def test_r12_analytics_audit_stages(spark):
    """r12 verdict item 5: WOE/IV binning, CUSUM ingest-drift,
    average-precision and Brier model gates ride a curation run as
    AUDIT stages — identity for the data plan, bounded report rows in
    the trail, composed WITH a live filter stage so positions and
    kill-rates interleave correctly."""
    docs = load_table(spark, SF_SMOKE, "documents").withColumn(
        # a fake classifier probability derived deterministically from
        # the text: long docs score high — so AP/Brier have signal
        "p_long",
        F.least(F.col("n_chars").cast("double") / 600.0, F.lit(1.0)),
    )
    spec = [
        {"stage": "woe_iv_audit", "value_col": "n_chars",
         "target_expr": "lang = 'en'", "bins": 5},
        {"stage": "token_cap", "max_tokens": 5000},
        {"stage": "cusum_audit", "value_col": "n_chars",
         "bucket_size": 50},
        {"stage": "avg_precision_audit", "score_col": "p_long",
         "target_expr": "n_chars >= 300"},
        {"stage": "brier_audit", "prob_col": "p_long",
         "target_expr": "n_chars >= 300", "bins": 5},
    ]
    n_in = docs.count()
    out, trail = run_pipeline(docs, spec, audit=True)
    assert [t["stage"] for t in trail] == [
        "input", "woe_iv_audit", "token_cap", "cusum_audit",
        "avg_precision_audit", "brier_audit",
    ]
    # audit stages never filter; the one live filter stage may
    n_after_cap = trail[2]["rows"]
    assert out.count() == n_after_cap
    assert trail[1]["rows"] == n_in and trail[1]["killed"] == 0

    woe = trail[1]["report"]
    assert 1 <= len(woe) <= 5
    assert sum(r["n"] for r in woe) == n_in
    # counts are exact partitions of the corpus
    assert all(r["n_pos"] + r["n_neg"] == r["n"] for r in woe)

    cusum = trail[3]["report"]
    assert 1 <= len(cusum) <= 3
    assert all(r["cusum_e6"] >= 0 for r in cusum)
    assert all(r["flagged"] in (0, 1) for r in cusum)
    # CUSUM ran on the POST-cap frame at its trail position
    assert trail[3]["rows"] == n_after_cap

    (ap,) = trail[4]["report"]
    assert ap["n_pos"] > 0 and ap["n_neg"] > 0
    # p_long is monotone in n_chars, so AP must beat the base rate
    base_e9 = round(ap["n_pos"] / (ap["n_pos"] + ap["n_neg"]) * 1e9)
    assert ap["ap_e9"] > base_e9

    (brier,) = trail[5]["report"]
    assert brier["brier_e9"] == (
        brier["rel_e9"] - brier["res_e9"] + brier["unc_e9"]
    )
    assert 0 <= brier["brier_e9"] <= 1_000_000_000


def test_ks_and_mwu_audit_stages(spark):
    """The r13 rank-statistics screens as trail stages: one report
    row each, identity for the data plan, exact integer internals."""
    docs = load_table(spark, SF_SMOKE, "documents").withColumn(
        "n_chars_l", F.col("n_chars").cast("long")
    )
    spec = [
        {"stage": "ks_audit", "value_col": "n_chars_l",
         "group_expr": "lang = 'en'"},
        {"stage": "mwu_audit", "value_col": "n_chars_l",
         "group_expr": "lang = 'en'"},
        {"stage": "w1_audit", "value_col": "n_chars_l",
         "group_expr": "lang = 'en'"},
        {"stage": "anova_audit", "value_col": "n_chars_l",
         "group_col": "source"},
    ]
    n_in = docs.count()
    out, trail = run_pipeline(docs, spec, audit=True)
    assert out.count() == n_in
    (ks,) = trail[1]["report"]
    assert ks["n_a"] + ks["n_b"] == n_in
    assert 0 <= ks["d_e9"] <= 1_000_000_000
    (mwu,) = trail[2]["report"]
    assert mwu["n_a"] == ks["n_a"] and mwu["n_b"] == ks["n_b"]
    # doubled rank sum bounds: n_a*(n_a+1) <= r2_a <= n_a*2n
    n = n_in
    assert mwu["n_a"] * (mwu["n_a"] + 1) <= mwu["r2_a"] <= mwu["n_a"] * 2 * n
    assert 0 <= mwu["u2_a"] <= 2 * mwu["n_a"] * mwu["n_b"]
    # r14 companions: W1 magnitude >= 0 on the same slice; ANOVA
    # variance share in [0, 1]
    (w1,) = trail[3]["report"]
    assert w1["n_a"] == ks["n_a"] and w1["n_b"] == ks["n_b"]
    assert w1["w1_e6"] >= 0
    (an,) = trail[4]["report"]
    assert an["n"] == n_in and an["k"] > 1
    assert 0 <= an["eta2_e6"] <= 1_000_000
    assert an["f_e6"] is None or an["f_e6"] >= 0
