"""Incremental vocabulary census e2e (X-ST20): stream == at-rest
bit-for-bit at every prefix — in particular the NON-mergeable outputs
(hapax counts, ratios) come out right because the store holds the
mergeable (source, term, n) sufficient statistic, not the census;
split-invariant; replay no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators.text import vocab_census
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.vocab import (
    vocab_foreach_batch,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    return load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "source"
    )


def _at_rest(df):
    return sorted(tuple(r) for r in vocab_census(df).collect())


def test_stream_equals_at_rest_and_hapax_merges_right(spark, tmp_path):
    docs = _docs(spark).cache()
    b1 = docs.filter(F.col("doc_id") % 3 != 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 0)
    store = VersionedTable(spark, tmp_path / "store")
    step = vocab_foreach_batch(store, str(tmp_path / "scores"))

    step(b1, 0)
    got1 = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/batch=0"))
        .drop("batch")
        .collect()
    )
    assert got1 == _at_rest(b1)

    step(b2, 1)
    got2 = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/batch=1"))
        .drop("batch")
        .collect()
    )
    want = _at_rest(docs)
    assert got2 == want
    # the non-mergeable part really was exercised: some term hapax in
    # one batch alone is non-hapax in the union (else this e2e proves
    # nothing beyond the count merge)
    h1 = {r[0]: r[3] for r in got1}
    hu = {r[0]: r[3] for r in got2}
    assert any(h1.get(g, 0) != hu[g] for g in hu)

    # replay no-op
    v = store.current_version()
    step(b2, 1)
    assert store.current_version() == v
    docs.unpersist()


def test_batch_split_invariance(spark, tmp_path):
    docs = _docs(spark).cache()
    want = _at_rest(docs)
    for si, k in enumerate((2, 5)):
        store = VersionedTable(spark, tmp_path / f"store{si}")
        step = vocab_foreach_batch(store, str(tmp_path / f"scores{si}"))
        for i in range(k):
            step(docs.filter(F.col("doc_id") % k == i), i)
        got = sorted(
            tuple(r)
            for r in spark.read.parquet(
                str(tmp_path / f"scores{si}/batch={k - 1}")
            )
            .drop("batch")
            .collect()
        )
        assert got == want
    docs.unpersist()


def test_streamed_overlap_matrix_equals_at_rest_at_every_prefix(
    spark, tmp_path
):
    """r13 verdict item 6: the SAME (source, term, n) store renders
    the X-T30 overlap matrix (its rows are the incidence) — streamed
    == at-rest `vocab_overlap_matrix` at every prefix, and the
    jaccard/containment ratios really move between prefixes (else the
    pin proves only the trivial first batch)."""
    from rootstock_collective_state_sync_spark.operators.text import (
        vocab_overlap_matrix,
    )

    docs = _docs(spark).cache()
    b1 = docs.filter(F.col("doc_id") % 3 != 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 0)
    store = VersionedTable(spark, tmp_path / "store")
    step = vocab_foreach_batch(
        store,
        str(tmp_path / "scores"),
        overlap_scores_path=str(tmp_path / "overlap"),
    )
    step(b1, 0)
    got1 = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "overlap/batch=0"))
        .drop("batch")
        .collect()
    )
    want1 = sorted(tuple(r) for r in vocab_overlap_matrix(b1).collect())
    assert got1 == want1
    step(b2, 1)
    got2 = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "overlap/batch=1"))
        .drop("batch")
        .collect()
    )
    want2 = sorted(tuple(r) for r in vocab_overlap_matrix(docs).collect())
    assert got2 == want2
    assert got1 != got2  # the matrix moved between prefixes
    docs.unpersist()
