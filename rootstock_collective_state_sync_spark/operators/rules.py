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


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_bigram_char_frac: float = 0.20,
    max_dup_trigram_char_frac: float = 0.18,
) -> DataFrame:
    """Gopher §A1.1 *repetition* signal family (the half of the Gopher
    table :func:`gopher_quality` doesn't cover): per document,

    - ``frac_dup_lines``      — duplicate line occurrences / lines
      (a line counts as duplicate on its 2nd+ occurrence),
    - ``frac_dup_line_chars`` — characters inside those duplicate
      occurrences / all line characters,
    - ``top_bigram_char_frac``   — characters covered by the most
      frequent *repeated* word 2-gram (count ≥ 2; a once-occurring
      bigram is coverage, not repetition) / total token characters,
    - ``dup_trigram_char_frac``  — characters inside word 3-grams that
      occur more than once / all 3-gram characters (every occurrence
      of a duplicated 3-gram counts — a documented simplification of
      Gopher's overlap-deduped span accounting),

    plus per-rule flags and the conjunction ``rep_keep`` (default
    thresholds are the published Gopher cut-offs for the matching
    rows of their table).

    Plan shape / 100 TB: one explode of (line | 2-gram | 3-gram)
    occurrences tagged by kind, ONE partial-aggregated shuffle on
    ``(id, kind, gram)`` to count occurrences, one per-doc rollup, and
    a doc-keyed join back to the per-doc denominators — every shuffle
    row is a (doc_id, short gram) pair, linear in corpus token count,
    never quadratic. The top-bigram argmax is a ``max(struct(count,
    charlen, gram))`` — deterministic under any partitioning, and
    exactly replayable in SQL (the oracle uses the same struct-max).
    """
    lns = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"), lns.alias("lns"), toks.alias("toks")
    )
    meta = base.select(
        "id",
        F.size("lns").cast("bigint").alias("n_lines"),
        F.aggregate(
            "toks", F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
        ).alias("token_chars"),
    )

    def _grams(n: int) -> Column:
        return F.when(
            F.size("toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("toks", i + j + 1) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    occ = (
        base.select("id", F.lit("L").alias("kind"), F.explode("lns").alias("g"))
        .unionAll(
            base.select("id", F.lit("B").alias("kind"), F.explode(_grams(2)).alias("g"))
        )
        .unionAll(
            base.select("id", F.lit("T").alias("kind"), F.explode(_grams(3)).alias("g"))
        )
    )
    cnt = occ.groupBy("id", "kind", "g").agg(F.count("*").alias("c"))
    is_l, is_b, is_t = (F.col("kind") == k for k in ("L", "B", "T"))
    glen = F.length("g")
    sig = cnt.groupBy("id").agg(
        F.sum(F.when(is_l, F.col("c"))).alias("line_occ"),
        F.sum(F.when(is_l, F.col("c") - 1)).alias("dup_line_occ"),
        F.sum(F.when(is_l, F.col("c") * glen)).alias("line_chars"),
        F.sum(F.when(is_l, (F.col("c") - 1) * glen)).alias("dup_line_chars"),
        F.max(
            F.when(
                is_b & (F.col("c") > 1),
                F.struct(F.col("c"), (glen - 1).alias("l"), F.col("g")),
            )
        ).alias("topb"),
        F.sum(F.when(is_t, F.col("c") * (glen - 2))).alias("tri_chars"),
        F.sum(F.when(is_t & (F.col("c") > 1), F.col("c") * (glen - 2))).alias(
            "dup_tri_chars"
        ),
    )
    j = meta.join(sig, "id", "left")
    z = F.lit(0).cast("bigint")
    fracs = {
        "frac_dup_lines": _frac(
            F.coalesce("dup_line_occ", z), F.coalesce("line_occ", z)
        ),
        "frac_dup_line_chars": _frac(
            F.coalesce("dup_line_chars", z), F.coalesce("line_chars", z)
        ),
        "top_bigram_char_frac": _frac(
            F.coalesce(F.col("topb.c") * F.col("topb.l"), z), F.col("token_chars")
        ),
        "dup_trigram_char_frac": _frac(
            F.coalesce("dup_tri_chars", z), F.coalesce("tri_chars", z)
        ),
    }
    rules = {
        "rule_dup_lines": fracs["frac_dup_lines"] <= max_dup_line_frac,
        "rule_dup_line_chars": fracs["frac_dup_line_chars"]
        <= max_dup_line_char_frac,
        "rule_top_bigram": fracs["top_bigram_char_frac"]
        <= max_top_bigram_char_frac,
        "rule_dup_trigram": fracs["dup_trigram_char_frac"]
        <= max_dup_trigram_char_frac,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return j.select(
        F.col("id").alias(id_col),
        "n_lines",
        "token_chars",
        *[c.alias(n) for n, c in fracs.items()],
        *[c.alias(n) for n, c in rules.items()],
        keep.alias("rep_keep"),
    )


def c4_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Per-document C4 cleaning-rule audit (Raffel et al. 2020 §2.2 —
    the heuristics behind the C4 corpus), the companion to
    :func:`gopher_quality`'s Gopher table. Per line: a line is KEPT
    when it ends in terminal punctuation (``. ! ? "``) and carries at
    least ``min_line_words`` whitespace words. Per page: flags for the
    "lorem ipsum" placeholder, a curly brace (code/templating), any
    ``javascript`` line, and the >= ``min_sentences`` sentence floor
    (``[.!?]+`` runs, as :func:`..text.readability_scores`). Emits
    counts + per-rule booleans + the conjunction ``c4_keep`` so the
    kill-rate audit can be GROUPed before anything is deleted.

    Fractions are e6-snapped integer divisions (identical truncation
    on both engines). Plan shape: one all-JVM HOF projection over the
    scan — no shuffle, no UDF; parquet-read speed at 100 TB.
    """
    c = F.col(text_col)
    lns = F.split(c, "\n")
    kept = F.filter(
        lns,
        lambda l: (F.rtrim(l).rlike('[.!?"]$'))
        & (
            F.size(F.filter(F.split(l, "[ \t\r]+"), lambda w: w != ""))
            >= min_line_words
        ),
    )
    js = F.filter(lns, lambda l: F.lower(l).contains("javascript"))
    n_lines = F.size(lns).cast("long")
    n_kept = F.size(kept).cast("long")
    n_sent = F.size(F.regexp_extract_all(c, F.lit("[.!?]+"), 0)).cast("long")
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{")
    n_js = F.size(js).cast("long")
    rules = {
        "rule_min_sentences": n_sent >= min_sentences,
        "rule_no_lorem": ~has_lorem,
        "rule_no_brace": ~has_brace,
        "rule_no_javascript": n_js == 0,
        "rule_any_kept_line": n_kept >= 1,
    }
    keep = None
    for r in rules.values():
        keep = r if keep is None else (keep & r)
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        (n_kept * 1000000).cast("long").alias("_knum"),
        F.greatest(n_lines, F.lit(1)).alias("_den"),
        n_sent.alias("n_sentences"),
        n_js.alias("n_js_lines"),
        has_lorem.cast("int").alias("has_lorem"),
        has_brace.cast("int").alias("has_brace"),
        *[v.cast("int").alias(k) for k, v in rules.items()],
        keep.cast("int").alias("c4_keep"),
    ).select(
        id_col,
        "n_lines",
        "n_kept_lines",
        F.expr("_knum div _den").cast("long").alias("frac_kept_e6"),
        "n_sentences",
        "n_js_lines",
        "has_lorem",
        "has_brace",
        *rules.keys(),
        "c4_keep",
    )
