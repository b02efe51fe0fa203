"""In-engine BPE merge induction (tokenizer training, distilled).

Byte-pair encoding (Sennrich et al. 2016): starting from characters,
repeatedly merge the most frequent adjacent symbol pair. Real tokenizer
trainers (SentencePiece, HF tokenizers) run exactly this loop — and,
like them, this implementation trains on the WORD-FREQUENCY TABLE, not
the corpus: the corpus is scanned once to count distinct words, and
every merge round then runs over that vocabulary-sized frame. At
100 TB that's the whole trick — a 10^11-token corpus has ~10^7 distinct
(lower-alnum) words, so the iteration state is ~10^7 rows regardless of
corpus size, partitioned and shuffled only on (pair) for the weighted
count.

Determinism contract: the winning pair each round is
``max by (count, then pair-string ascending)`` — no RNG, no order
dependence; the merge application is a leftmost non-overlapping
string replace over a bracket-delimited symbol encoding
(``[a][b][c]``), identical semantics in Spark's ``replace`` and
DuckDB's ``replace`` (symbols are lower-alnum so brackets can't occur
inside them). The conformance oracle replays every round unrolled.

Variant notes (documented deviations from the paper):

- no ``</w>`` end-of-word marker — merges never cross word
  boundaries anyway because each word is its own symbol string;
- pair counts weight by word frequency and count overlapping
  positions left-to-right non-overlapping after each merge, exactly
  like the reference implementation's greedy re-segmentation.

Control-plane contract: one ``collect()`` of a single winning row per
round (``num_merges`` total) — same bounded-driver-state policy as the
IVF centroid loop (`similarity.py`) and the CC convergence probe
(`dedup.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, functions as F

from rootstock_collective_state_sync_spark.localrel import local_df

from rootstock_collective_state_sync_spark.operators.text import tokens


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_syms(words: DataFrame) -> DataFrame:
    sym = F.concat(
        F.lit("["), F.array_join(F.split("w", ""), "]["), F.lit("]")
    )
    return words.select("w", sym.alias("sym"), "cnt")


def _pair_counts(words: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the current segmentation."""
    syms = F.split(F.expr("substring(sym, 2, length(sym) - 2)"), "\\]\\[")
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(syms) - 2),
            lambda i: F.struct(
                F.element_at(syms, i + 1).alias("l"),
                F.element_at(syms, i + 2).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        words.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("n"))
    )


def _learn_merges_local(rows, num_merges: int) -> list[Row]:
    """Driver-side merge loop over a collected word-frequency table —
    byte-identical semantics to the distributed loop (weighted pair
    counts, winner = max by (count, l asc, r asc), leftmost
    non-overlapping application), asserted by
    ``tests/test_operators.py::test_bpe_local_matches_distributed``."""
    syms: list[tuple[list[str], int]] = [
        (list(r["w"]), int(r["cnt"])) for r in rows
    ]
    out: list[Row] = []
    for rnd in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for sym, cnt in syms:
            for l, r in zip(sym, sym[1:]):
                counts[(l, r)] = counts.get((l, r), 0) + cnt
        if not counts:
            break
        (l, r), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append(Row(round=rnd, left=l, right=r, n=int(n)))
        nxt: list[tuple[list[str], int]] = []
        for sym, cnt in syms:
            res: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            nxt.append((res, cnt))
        syms = nxt
    return out


def learn_bpe_merges(
    df: DataFrame,
    num_merges: int = 6,
    text_col: str = "text",
    driver_vocab_limit: int = 1_000_000,
) -> list[Row]:
    """Run ``num_merges`` BPE rounds; returns the merge table as a
    list of Rows ``(round, left, right, n)`` (1-indexed rounds).
    Stops early if no adjacent pair remains.

    Execution strategy: when the vocabulary fits the driver budget
    (``driver_vocab_limit`` distinct words — BPE state is vocab-sized
    by definition, and 10^6 rows is a few tens of MB), the corpus is
    reduced ONCE to the word-frequency table and the merge loop runs
    driver-side (what SentencePiece/HF trainers do) — one Spark job
    instead of 2 jobs × rounds. A larger vocabulary falls back to the
    distributed per-round loop automatically, preserving the bounded-
    driver-state contract. Both paths are result-identical (tested).
    """
    vocab = _word_freqs(df, text_col)
    probe = vocab.limit(driver_vocab_limit + 1).collect()
    if len(probe) <= driver_vocab_limit:
        return _learn_merges_local(probe, num_merges)
    return _learn_merges_distributed(vocab, num_merges)


def _learn_merges_distributed(
    vocab: DataFrame, num_merges: int
) -> list[Row]:
    """Per-round distributed loop (the >driver-budget path): pair-count
    aggregation over the vocabulary-sized frame + one 1-row collect per
    round, persist/materialize/unpersist for O(1) lineage."""
    words = _init_syms(vocab).persist()
    out: list[Row] = []
    for rnd in range(1, num_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        out.append(
            Row(round=rnd, left=b["l"], right=b["r"], n=int(b["n"]))
        )
        merged = words.select(
            "w",
            F.replace(
                F.col("sym"),
                F.lit(f"[{b['l']}][{b['r']}]"),
                F.lit(f"[{b['l']}{b['r']}]"),
            ).alias("sym"),
            "cnt",
        ).persist()
        merged.count()  # materialize before dropping the parent (O(1) lineage)
        words.unpersist()
        words = merged
    words.unpersist()
    return out


def bpe_merge_table(
    spark, df: DataFrame, num_merges: int = 6, text_col: str = "text"
) -> DataFrame:
    """The merge table as a DataFrame (round int, left, right, n)."""
    rows = learn_bpe_merges(df, num_merges=num_merges, text_col=text_col)
    return local_df(
        spark, rows, "round int, left string, right string, n bigint"
    )


def bpe_encode(
    df: DataFrame,
    merges: list[Row] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge table to the corpus: segment every word
    with the merges IN LEARNED ORDER (each is a leftmost
    non-overlapping replace over the bracket encoding — identical to
    the trainer's application step, so train→encode round-trips).

    Returns one row per document: ``(id, n_words, n_tokens,
    fertility)`` where ``n_tokens`` is the subword count after
    segmentation and fertility = tokens per word — THE tokenizer
    health metric (a fertility jump on a new corpus slice means the
    vocabulary doesn't fit it).

    Plan shape / 100 TB: pure per-row projection — the merge table is
    a handful of literals baked into the expression (no join, no
    shuffle, no UDF); ``num_merges`` chained ``replace`` calls stay
    inside one WholeStageCodegen span at scan speed.
    """
    pairs = [
        (m["left"], m["right"]) if isinstance(m, Row) else m for m in merges
    ]
    toks = tokens(F.col(text_col))
    sym = F.array_join(
        F.transform(
            toks,
            lambda w: F.concat(
                F.lit("["),
                F.array_join(F.split(w, ""), "]["),
                F.lit("]"),
            ),
        ),
        " ",
    )
    # NB: per-word encodings are joined with a space, so a merge
    # pattern '[a][b]' can never span a word boundary.
    enc = sym
    for l, r in pairs:
        enc = F.replace(enc, F.lit(f"[{l}][{r}]"), F.lit(f"[{l}{r}]"))
    n_words = F.size(toks).cast("bigint")
    # token count = bracket-open count over the encoded string
    n_tokens = (
        F.length(enc) - F.length(F.replace(enc, F.lit("["), F.lit("")))
    ).cast("bigint")
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.when(n_words > 0, n_tokens).otherwise(F.lit(0)).alias("n_tokens"),
        F.round(
            F.when(
                n_words > 0, n_tokens.cast("double") / n_words.cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("fertility"),
    )
