"""Heuristic document-quality rule filters (Gopher-style).

Implements the repetition-free heuristic rule family popularized by
Gopher (Rae et al. 2021, §A1.1) and reused by MassiveText / RefinedWeb
/ Dolma-class curation pipelines: word-count bounds, mean word length,
symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic-word
fraction, and a minimum stop-word hit count. Every rule is a pure JVM
column expression (codegen, zero shuffle, zero UDF) so the filter runs
at scan speed on a 100 TB corpus — the scan stays in one
WholeStageCodegen span and Parquet column pruning still applies
(only ``text`` + the id column are read).

Each rule is exposed as its own column (training-data pipelines audit
per-rule kill rates before committing to a filter config); the
aggregate ``gopher_keep`` flag is the conjunction. Thresholds are the
published Gopher defaults, overridable per call.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rootstock_collective_state_sync_spark.operators.text import STOPWORDS, tokens

#: bullet glyphs a line may start with (Gopher counts bulleted lines)
BULLET_PREFIXES = ("-", "*", "•")


def _raw_words(col: Column) -> Column:
    """Whitespace-delimited words of the raw text (symbols kept —
    unlike :func:`..text.tokens` these preserve '#', '...', etc.,
    which the symbol-ratio rule needs)."""
    return F.filter(F.split(col, "[ \\t\\n\\r]+"), lambda w: w != "")


def _frac(num: Column, den: Column) -> Column:
    return F.round(num.cast("double") / F.greatest(den, F.lit(1)).cast("double"), 6)


def gopher_features(text_col: Column) -> dict[str, Column]:
    """The rule-input feature columns, all JVM built-ins."""
    words = _raw_words(text_col)
    n_words = F.size(words).cast("bigint")
    lns = F.split(text_col, "\n")
    n_lines = F.size(lns).cast("bigint")
    n_hash = F.length(F.regexp_replace(text_col, "[^#]", "")).cast("bigint")
    n_ellipsis = F.size(
        F.regexp_extract_all(text_col, F.lit("\\.\\.\\."), 0)
    ).cast("bigint")
    bullet_lines = F.size(
        F.filter(
            lns,
            lambda l: F.trim(l).rlike("^[-*•]"),
        )
    ).cast("bigint")
    ellipsis_lines = F.size(
        F.filter(lns, lambda l: F.trim(l).rlike("\\.\\.\\.$"))
    ).cast("bigint")
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    ).cast("bigint")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tokens(text_col)),
            F.array(*[F.lit(s) for s in STOPWORDS["en"]]),
        )
    ).cast("bigint")
    return {
        "n_words": n_words,
        "mean_word_len": F.round(
            F.aggregate(
                words, F.lit(0.0), lambda acc, w: acc + F.length(w).cast("double")
            )
            / F.greatest(n_words, F.lit(1)).cast("double"),
            6,
        ),
        "symbol_word_ratio": _frac(n_hash + n_ellipsis, n_words),
        "frac_bullet_lines": _frac(bullet_lines, n_lines),
        "frac_ellipsis_lines": _frac(ellipsis_lines, n_lines),
        "frac_alpha_words": _frac(alpha_words, n_words),
        "n_stop_hits": stop_hits,
    }


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher rule columns + the aggregate keep flag.

    Returns one row per input row: the id, every feature, every
    per-rule boolean (``rule_*``), and ``gopher_keep`` — their
    conjunction. Emitting per-rule booleans instead of filtering
    in-place is deliberate: at corpus scale the kill-rate audit
    (``GROUP BY`` over the rule columns) is how a filter config is
    tuned before anything is deleted.

    Plan shape: one projection over the scan — no shuffle, no UDF;
    at 100 TB this runs at parquet-read speed with only (id, text)
    columns materialized.
    """
    feats = gopher_features(F.col(text_col))
    rules = {
        "rule_word_count": (feats["n_words"] >= min_words)
        & (feats["n_words"] <= max_words),
        "rule_mean_word_len": (feats["mean_word_len"] >= min_mean_word_len)
        & (feats["mean_word_len"] <= max_mean_word_len),
        "rule_symbol_ratio": feats["symbol_word_ratio"] <= max_symbol_word_ratio,
        "rule_bullet_lines": feats["frac_bullet_lines"] <= max_bullet_frac,
        "rule_ellipsis_lines": feats["frac_ellipsis_lines"] <= max_ellipsis_frac,
        "rule_alpha_words": feats["frac_alpha_words"] >= min_alpha_frac,
        "rule_stopwords": feats["n_stop_hits"] >= min_stop_hits,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        F.col(id_col),
        *[c.alias(n) for n, c in feats.items()],
        *[c.alias(n) for n, c in rules.items()],
        keep.alias("gopher_keep"),
    )
