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


def learn_bpe_merges(
    df: DataFrame,
    num_merges: int = 6,
    text_col: str = "text",
) -> list[Row]:
    """Run ``num_merges`` BPE rounds; returns the merge table as a
    list of Rows ``(round, left, right, n)`` (1-indexed rounds).
    Stops early if no adjacent pair remains."""
    words = _init_syms(_word_freqs(df, text_col)).persist()
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
    return spark.createDataFrame(
        rows, "round int, left string, right string, n bigint"
    )
