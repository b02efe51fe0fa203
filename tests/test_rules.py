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


def _rep(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict() for r in RL.repetition_signals(df).collect()
    }


def test_repetition_clean_doc_keeps(spark):
    out = _rep(spark, [(1, "alpha beta gamma\ndelta epsilon zeta\neta theta")])
    r = out[1]
    assert r["frac_dup_lines"] == 0.0
    assert r["dup_trigram_char_frac"] == 0.0
    assert r["rep_keep"] is True


def test_repetition_duplicate_lines_flagged(spark):
    # 4 lines, 3 of them the same 10-char line -> 2/4 dup occurrences
    text = "same line!\nsame line!\nsame line!\nunique tail"
    r = _rep(spark, [(1, text)])[1]
    assert r["n_lines"] == 4
    assert r["frac_dup_lines"] == 0.5
    # dup chars = 2*10 / (3*10 + 11)
    assert r["frac_dup_line_chars"] == round(20 / 41, 6)
    assert r["rule_dup_lines"] is False
    assert r["rep_keep"] is False


def test_repetition_top_bigram_dominates(spark):
    # "ha ha" repeated: bigram (ha, ha) covers most token chars
    r = _rep(spark, [(1, "ha ha ha ha ha ha ha ha one two")])[1]
    # tokens: 8x'ha' + 'one' 'two' = 16 + 6 = 22 chars; bigram 'ha ha'
    # occurs 7 times, charlen 4 -> 28/22 capped? no cap: ratio > 0.2
    assert r["token_chars"] == 22
    assert r["top_bigram_char_frac"] == round(28 / 22, 6)
    assert r["rule_top_bigram"] is False


def test_repetition_empty_and_tokenless_docs(spark):
    out = _rep(spark, [(1, ""), (2, "!!! ??? ---")])
    assert out[1]["frac_dup_lines"] == 0.0
    assert out[1]["rep_keep"] is True
    assert out[2]["token_chars"] == 0
    assert out[2]["top_bigram_char_frac"] == 0.0
