"""Unit tests for the Gopher-style heuristic rule filter (planted
documents exercising each rule, including the line-level rules the
synthetic corpus can't reach — it has no newlines or bullets)."""

from __future__ import annotations

from rootstock_collective_state_sync_spark.operators import rules as RL

GOOD = (
    "the quick brown fox jumps over a lazy dog and then runs to the "
    "river for water because it is thirsty " * 3
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in RL.gopher_quality(df).collect()}


def test_good_document_keeps(spark):
    out = _run(spark, [(1, GOOD)])
    assert out[1]["gopher_keep"] is True
    assert out[1]["n_words"] >= 50
    assert out[1]["n_stop_hits"] >= 2


def test_short_document_fails_word_count(spark):
    out = _run(spark, [(1, "too short to keep")])
    assert out[1]["rule_word_count"] is False
    assert out[1]["gopher_keep"] is False


def test_bullet_lines_fraction(spark):
    text = "\n".join(["- bullet line here"] * 9 + ["a normal line"])
    out = _run(spark, [(1, text)])
    assert abs(out[1]["frac_bullet_lines"] - 0.9) < 1e-9
    assert out[1]["rule_bullet_lines"] is True  # <= 0.9 inclusive
    text2 = "\n".join(["* bullet"] * 10)
    out2 = _run(spark, [(1, text2)])
    assert out2[1]["frac_bullet_lines"] == 1.0
    assert out2[1]["rule_bullet_lines"] is False


def test_ellipsis_and_symbol_rules(spark):
    text = "\n".join(["this line trails off..."] * 2 + ["plain line"] * 2)
    out = _run(spark, [(1, text)])
    assert abs(out[1]["frac_ellipsis_lines"] - 0.5) < 1e-9
    assert out[1]["rule_ellipsis_lines"] is False  # > 0.3
    hashy = "# " * 30 + "word " * 30
    out2 = _run(spark, [(1, hashy)])
    assert out2[1]["symbol_word_ratio"] > 0.1
    assert out2[1]["rule_symbol_ratio"] is False


def test_alpha_fraction_rule(spark):
    text = " ".join(["12345"] * 8 + ["word"] * 2)
    out = _run(spark, [(1, text)])
    assert abs(out[1]["frac_alpha_words"] - 0.2) < 1e-9
    assert out[1]["rule_alpha_words"] is False
