"""Incremental decontamination e2e (X-ST19): each ingest batch is
checked against the FIXED eval-set shingle index; the flagged-docs
store after any prefix equals the at-rest benchmark_contamination
over exactly the rows ingested so far, under any batch split; replay
is a structural no-op (including clean batches); the at-rest operator
is reused, not reimplemented."""

from __future__ import annotations

from pyspark.sql import functions as F

from rootstock_collective_state_sync_spark.operators.dedup import (
    benchmark_contamination,
)
from rootstock_collective_state_sync_spark.sinks.table import VersionedTable
from rootstock_collective_state_sync_spark.streaming.contamination import (
    build_eval_index,
    contamination_foreach_batch,
)
from tests.conftest import SF_SMOKE


def _docs(spark):
    from rootstock_collective_state_sync_spark.plans.tables import load_table

    return load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "source"
    )


def _at_rest(train, bench):
    return sorted(
        tuple(r)
        for r in benchmark_contamination(
            train, bench, n=3, min_shared=1
        ).collect()
    )


def test_stream_equals_at_rest_at_every_prefix(spark, tmp_path):
    docs = _docs(spark).cache()
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    b1 = train.filter(F.col("doc_id") % 3 != 0)
    b2 = train.filter(F.col("doc_id") % 3 == 0)

    eval_store = VersionedTable(spark, tmp_path / "eval_idx")
    build_eval_index(eval_store, bench, n=3)
    flag_store = VersionedTable(spark, tmp_path / "flags")
    step = contamination_foreach_batch(
        flag_store, eval_store, str(tmp_path / "scores")
    )

    step(b1, 0)
    tip1 = sorted(tuple(r) for r in flag_store.read().collect())
    assert tip1 == _at_rest(b1, bench)
    # per-batch score partition carries exactly this batch's report
    got1 = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "scores/batch=0"))
        .drop("batch")
        .collect()
    )
    assert got1 == _at_rest(b1, bench)

    step(b2, 1)
    tip2 = sorted(tuple(r) for r in flag_store.read().collect())
    assert tip2 == _at_rest(train, bench)

    # replay no-op: same version, same rows
    v = flag_store.current_version()
    step(b2, 1)
    assert flag_store.current_version() == v
    assert sorted(tuple(r) for r in flag_store.read().collect()) == tip2
    docs.unpersist()


def test_batch_split_invariance_and_clean_batch(spark, tmp_path):
    docs = _docs(spark).cache()
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")

    eval_store = VersionedTable(spark, tmp_path / "eval_idx")
    build_eval_index(eval_store, bench, n=3)

    want = _at_rest(train, bench)
    for si, k in enumerate((2, 4)):
        flag_store = VersionedTable(spark, tmp_path / f"flags{si}")
        step = contamination_foreach_batch(
            flag_store, eval_store, str(tmp_path / f"scores{si}")
        )
        for i in range(k):
            step(train.filter(F.col("doc_id") % k == i), i)
        assert sorted(tuple(r) for r in flag_store.read().collect()) == want

    # a CLEAN batch (no shared shingles) still advances the replay
    # guard: replaying it does not re-run the merge
    flag_store = VersionedTable(spark, tmp_path / "flags_clean")
    step = contamination_foreach_batch(
        flag_store, eval_store, str(tmp_path / "scores_clean")
    )
    clean = spark.createDataFrame(
        [(10_001, "zq glarble frimp vonk xylo prand quib")],
        "doc_id long, text string",
    )
    step(clean, 0)
    assert flag_store.read().count() == 0
    v = flag_store.current_version()
    step(clean, 0)  # replay: guard hits, no new version
    assert flag_store.current_version() == v
    docs.unpersist()
