"""Hand-computed contracts for the round-10 operators (oracle parity
is covered by test_conformance; these pin the semantics on edge cases
the synthetic corpus may not exercise)."""

from __future__ import annotations

from rootstock_collective_state_sync_spark.operators.evaluate import cohens_kappa
from rootstock_collective_state_sync_spark.operators.profile import weighted_median
from rootstock_collective_state_sync_spark.operators.rules import c4_quality
from rootstock_collective_state_sync_spark.operators.text import script_census


def test_c4_quality_line_rules(spark):
    docs = spark.createDataFrame(
        [
            # 2 kept lines (terminal punct + >=5 words), 1 too short,
            # 1 without terminal punctuation
            (
                1,
                "this line has five good words.\nshort line.\n"
                "another line with enough words here!\nno terminal punct here",
            ),
            # killed by every page rule
            (2, 'lorem ipsum { var x = 1; } javascript line."'),
            # quote-terminated counts as terminal
            (3, 'he said the words were truly "fine."\nSecond one. Third.'),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in c4_quality(docs).collect()}
    assert rows[1]["n_lines"] == 4 and rows[1]["n_kept_lines"] == 2
    assert rows[1]["frac_kept_e6"] == 500000
    assert rows[1]["rule_no_javascript"] == 1
    assert rows[2]["has_lorem"] == 1 and rows[2]["has_brace"] == 1
    assert rows[2]["n_js_lines"] == 1 and rows[2]["c4_keep"] == 0
    assert rows[3]["n_kept_lines"] >= 1 and rows[3]["rule_min_sentences"] == 1


def test_script_census_mixed_scripts(spark):
    docs = spark.createDataFrame(
        [(1, "abc МИР 中文 123! x")],  # latin 4, cyrillic 3, cjk 2, digit 3
        "doc_id long, text string",
    )
    r = script_census(docs).collect()[0].asDict()
    assert r["n_latin"] == 4 and r["n_cyrillic"] == 3 and r["n_cjk"] == 2
    assert r["n_digit"] == 3 and r["n_punct_ascii"] == 1
    assert r["main_script"] == "latin"
    assert r["n_chars"] == (
        r["n_latin"] + r["n_cyrillic"] + r["n_cjk"] + r["n_digit"]
        + r["n_space"] + r["n_punct_ascii"] + r["n_other"]
    )


def test_script_census_tie_breaks_ascending(spark):
    docs = spark.createDataFrame(
        [(1, "ab 中文"), (2, "!!!")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["main_script"] for r in script_census(docs).collect()}
    assert got[1] == "cjk"  # tie 2-2 -> 'cjk' < 'latin'
    assert got[2] == "none"  # no script character at all


def test_cohens_kappa_hand_case(spark):
    # classic 2x2: n=100, agree=70, marginals t:(50,50) p:(60,40)
    rows = (
        [("a", "a")] * 40 + [("a", "b")] * 10
        + [("b", "a")] * 20 + [("b", "b")] * 30
    )
    df = spark.createDataFrame(rows, "t string, p string")
    r = cohens_kappa(df, "t", "p").collect()[0].asDict()
    assert r["n_docs"] == 100 and r["n_agree"] == 70
    assert r["po_e6"] == 700000
    # pe = (50*60 + 50*40) / 100^2 = 0.5
    assert r["pe_e6"] == 500000
    # kappa = (0.7 - 0.5) / 0.5 = 0.4
    assert r["kappa_e6"] == 400000


def test_cohens_kappa_negative(spark):
    # total disagreement on a balanced 2-label set: kappa = -1
    rows = [("a", "b")] * 50 + [("b", "a")] * 50
    df = spark.createDataFrame(rows, "t string, p string")
    r = cohens_kappa(df, "t", "p").collect()[0].asDict()
    assert r["kappa_e6"] == -1000000


def test_weighted_median_hand_case(spark):
    df = spark.createDataFrame(
        [
            # group g: values 1(w3), 2(w1), 3(w1): total 5, half 2.5 ->
            # cum at v=1 is 3 >= 2.5 -> median 1
            ("g", 1, 3), ("g", 2, 1), ("g", 3, 1),
            # group h: tie weights across equal values — RANGE frame
            # pools peers: v=5 cum=2(<3), v=7 cum 4*2>=6 -> 7
            ("h", 5, 1), ("h", 5, 1), ("h", 7, 1), ("h", 9, 3),
        ],
        "grp string, v long, w long",
    )
    got = {
        r["grp"]: (r["wmedian"], r["total_weight"])
        for r in weighted_median(df, ["grp"], "v", "w").collect()
    }
    assert got["g"] == (1, 5)
    assert got["h"] == (7, 6)


def test_kmv_exact_below_k_and_bounded_error(spark):
    from rootstock_collective_state_sync_spark.operators.sketches import (
        kmv_distinct,
    )

    # group 'small': 100 distinct values < k=256 -> sketch is exact
    # group 'big': 20000 distinct -> k=256 gives rse ~ 1/sqrt(254),
    # assert within 20% (>3 sigma)
    rows = [("small", f"s{i}") for i in range(100)] + [
        ("big", f"b{i % 20000}") for i in range(40000)
    ]
    df = spark.createDataFrame(rows, "grp string, v string")
    got = {
        r["grp"]: r.asDict()
        for r in kmv_distinct(df, "grp", "v", k=256).collect()
    }
    assert got["small"]["n_exact"] == 100
    assert got["small"]["kmv_est"] == 100 and got["small"]["err_e6"] == 0
    assert got["big"]["n_exact"] == 20000
    assert abs(got["big"]["kmv_est"] - 20000) / 20000 < 0.20


def test_triangle_counts_hand_graph(spark):
    from rootstock_collective_state_sync_spark.operators.graph import (
        triangle_counts,
    )

    # K4 minus edge (3,4) plus pendant 5: triangles (1,2,3), (1,2,4)
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (1, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        r["id"]: (r["degree"], r["n_triangles"], r["cc_e6"])
        for r in triangle_counts(edges).collect()
    }
    assert got[1] == (4, 2, 333333)  # 2*2*1e6 div (4*3)
    assert got[2] == (3, 2, 666666)
    assert got[3] == (2, 1, 1000000)
    assert got[4] == (2, 1, 1000000)
    assert got[5] == (1, 0, 0)


def test_time_weighted_mean_hand_case(spark):
    from rootstock_collective_state_sync_spark.operators.temporal import (
        time_weighted_mean,
    )

    df = spark.createDataFrame(
        [
            # user 1: v=100c for 10us then 300c for 30us -> twap =
            # (100*10 + 300*30) / 40 = 250c; last event is a point mass
            (1, 1, "2024-01-01 00:00:00.000000", 1.00),
            (2, 1, "2024-01-01 00:00:00.000010", 3.00),
            (3, 1, "2024-01-01 00:00:00.000040", 9.99),
            # user 2: single event -> no segments, no row
            (4, 2, "2024-01-01 00:00:00", 5.00),
        ],
        "event_id long, user_id long, ts string, value double",
    ).selectExpr(
        "event_id", "user_id", "cast(ts as timestamp_ntz) ts", "value"
    )
    got = {
        r["user_id"]: (r["n_segments"], r["span_us"], r["twap_c"])
        for r in time_weighted_mean(
            df, "user_id", "ts", "value", "event_id"
        ).collect()
    }
    assert got == {1: (2, 40, 250)}


def test_ohlc_bars_hand_case(spark):
    from rootstock_collective_state_sync_spark.operators.temporal import (
        ohlc_bars,
    )

    df = spark.createDataFrame(
        [
            (1, "x", "2024-01-01 10:05:00", 2.00),
            (2, "x", "2024-01-01 10:10:00", 9.00),
            (3, "x", "2024-01-01 10:20:00", 1.00),
            (4, "x", "2024-01-01 10:50:00", 4.00),
            (5, "x", "2024-01-01 11:01:00", 7.00),
        ],
        "event_id long, event_type string, ts string, value double",
    ).selectExpr(
        "event_id", "event_type", "cast(ts as timestamp_ntz) ts", "value"
    )
    got = {
        str(r["bar_ts"]): (
            r["open_c"], r["high_c"], r["low_c"], r["close_c"],
            r["n_events"], r["volume_c"],
        )
        for r in ohlc_bars(
            df, "event_type", "ts", "value", "event_id"
        ).collect()
    }
    assert got["2024-01-01 10:00:00"] == (200, 900, 100, 400, 4, 1600)
    assert got["2024-01-01 11:00:00"] == (700, 700, 700, 700, 1, 700)
