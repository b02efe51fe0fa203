"""Versioned-table + merge-upsert tests.

Coverage model: the reference's upsert suite (``dbUpsert.test.ts:62-240``)
— empty batch, undeclared-key dropping, FK flattening, duplicate-PK
latest-wins, idempotence — plus versioning/restore and the
changed-rows-only merge (FIXTURES.md F8).
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Row, functions as F, types as T

from rootstock_collective_state_sync_spark.sinks import (
    TableCatalog,
    merge_upsert,
    prepare_batch,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("amount", T.DecimalType(38, 0), False),
        T.StructField("note", T.StringType(), True),
    ]
)


@pytest.fixture()
def table(spark, tmp_table_dir):
    cat = TableCatalog(spark, tmp_table_dir)
    return cat.table("t").create(SCHEMA, ["id"], num_buckets=4)


def rows(table):
    return {r.id: (r.amount, r.note) for r in table.read().collect()}


def make(spark, data):
    return spark.createDataFrame(data, SCHEMA)


def test_insert_then_read(spark, table):
    v = merge_upsert(table, make(spark, [("a", Decimal(1), "x"), ("b", Decimal(2), None)]))
    assert v == 2
    assert rows(table) == {"a": (Decimal(1), "x"), "b": (Decimal(2), None)}


def test_update_and_insert(spark, table):
    merge_upsert(table, make(spark, [("a", Decimal(1), "x")]))
    merge_upsert(table, make(spark, [("a", Decimal(10), "y"), ("c", Decimal(3), None)]))
    assert rows(table) == {"a": (Decimal(10), "y"), "c": (Decimal(3), None)}


def test_empty_batch_noop(spark, table):
    v0 = table.current_version()
    v = merge_upsert(table, spark.createDataFrame([], SCHEMA))
    assert v == v0


def test_duplicate_pk_last_wins(spark, table):
    merge_upsert(
        table,
        make(spark, [("a", Decimal(1), "first"), ("a", Decimal(2), "last")]),
    )
    assert rows(table) == {"a": (Decimal(2), "last")}


def test_idempotent_reapply(spark, table):
    batch = make(spark, [("a", Decimal(1), "x"), ("b", Decimal(2), "y")])
    merge_upsert(table, batch)
    before = rows(table)
    merge_upsert(table, batch)
    assert rows(table) == before


def test_undeclared_columns_dropped(spark, table):
    df = spark.createDataFrame(
        [Row(id="a", amount=Decimal(1), note="n", extra="DROP ME", junk=7)]
    )
    merge_upsert(table, df)
    assert rows(table) == {"a": (Decimal(1), "n")}


def test_fk_object_flattened(spark, table):
    df = spark.createDataFrame(
        [Row(id=Row(id="a"), amount=Decimal(5), note=None)],
        schema=T.StructType(
            [
                T.StructField(
                    "id",
                    T.StructType([T.StructField("id", T.StringType())]),
                ),
                T.StructField("amount", T.DecimalType(38, 0)),
                T.StructField("note", T.StringType()),
            ]
        ),
    )
    merge_upsert(table, df)
    assert rows(table) == {"a": (Decimal(5), None)}


def test_not_null_violation_raises(spark, table):
    df = spark.createDataFrame(
        [("a", None, "x")],
        T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("amount", T.DecimalType(38, 0)),
                T.StructField("note", T.StringType()),
            ]
        ),
    )
    with pytest.raises(ValueError, match="NOT NULL"):
        merge_upsert(table, df)


def test_missing_not_null_column_raises(spark, table):
    df = spark.createDataFrame([("a",)], ["id"])
    with pytest.raises(ValueError, match="missing NOT NULL"):
        prepare_batch(df, SCHEMA)


def test_when_matched_condition(spark, table):
    """J1/K2 parity: update only when the incoming state differs."""
    merge_upsert(table, make(spark, [("a", Decimal(1), "keep"), ("b", Decimal(2), "old")]))
    merge_upsert(
        table,
        make(spark, [("a", Decimal(1), "CLOBBERED"), ("b", Decimal(99), "new"), ("c", Decimal(3), "ins")]),
        when_matched_condition="src.amount <> tgt.amount",
    )
    assert rows(table) == {
        "a": (Decimal(1), "keep"),      # matched, amount equal -> untouched
        "b": (Decimal(99), "new"),      # matched, differs -> updated
        "c": (Decimal(3), "ins"),       # unmatched -> inserted
    }


def test_restore_version(spark, table):
    merge_upsert(table, make(spark, [("a", Decimal(1), "v2")]))
    v2 = table.current_version()
    merge_upsert(table, make(spark, [("a", Decimal(2), "v3")]))
    assert rows(table)["a"] == (Decimal(2), "v3")
    table.restore(v2)
    assert rows(table)["a"] == (Decimal(1), "v2")
    hist = table.history()
    assert hist[-1]["meta"]["restoredFrom"] == v2


def test_overwrite_blue_green(spark, table):
    merge_upsert(table, make(spark, [("a", Decimal(1), "old"), ("b", Decimal(2), "old")]))
    table.overwrite(make(spark, [("z", Decimal(9), "new")]))
    assert rows(table) == {"z": (Decimal(9), "new")}


def test_merge_only_rewrites_affected_buckets(spark, table):
    """Scale property: a 1-row batch must not rewrite untouched buckets."""
    big = spark.range(200).select(
        F.concat(F.lit("k"), F.col("id")).alias("id"),
        F.col("id").cast("decimal(38,0)").alias("amount"),
        F.lit(None).cast("string").alias("note"),
    )
    merge_upsert(table, big)
    before = table.manifest().buckets
    merge_upsert(table, make(spark, [("k1", Decimal(999), "touched")]))
    after = table.manifest().buckets
    changed = [b for b in before if before[b] != after.get(b)]
    assert len(changed) == 1  # exactly the bucket k1 hashes into
    assert rows(table)["k1"] == (Decimal(999), "touched")
    assert sum(1 for _ in table.read().collect()) == 200


def test_catalog_create_all_and_list(spark, tmp_table_dir):
    cat = TableCatalog(spark, tmp_table_dir)
    created = cat.create_all(
        {"A": SCHEMA, "B": SCHEMA}, {"A": ["id"], "B": ["id"]}
    )
    assert created == ["A", "B"]
    assert cat.list_tables() == ["A", "B"]
    # create-missing-only on re-run
    assert cat.create_all({"A": SCHEMA, "B": SCHEMA}, {"A": ["id"], "B": ["id"]}) == []


def test_version_diff_change_feed(spark, table):
    """diff(v_old, v_new) = exact row-level CDC between snapshots:
    inserts, updates, deletes, unchanged rows absent — and unchanged
    BUCKETS pruned before any scan (manifest-level comparison)."""
    v1 = merge_upsert(
        table,
        make(spark, [("a", Decimal(1), "x"), ("b", Decimal(2), "y"),
                     ("c", Decimal(3), "z")]),
    )
    # update a, delete b (via overwrite), insert d, keep c unchanged
    v2 = table.overwrite(
        make(spark, [("a", Decimal(10), "x"), ("c", Decimal(3), "z"),
                     ("d", Decimal(4), "w")])
    )
    got = {
        (r["op"], r["id"]): (r["amount"], r["note"])
        for r in table.diff(v1, v2).collect()
    }
    assert got == {
        ("update", "a"): (Decimal(10), "x"),
        ("delete", "b"): (Decimal(2), "y"),
        ("insert", "d"): (Decimal(4), "w"),
    }
    # no-change diff is empty
    assert table.diff(v2, v2).count() == 0
    # null-safe value compare: note NULL <-> NULL is not an update
    v3 = table.overwrite(
        make(spark, [("a", Decimal(10), None), ("c", Decimal(3), "z"),
                     ("d", Decimal(4), "w")])
    )
    got3 = {(r["op"], r["id"]) for r in table.diff(v2, v3).collect()}
    assert got3 == {("update", "a")}
    assert table.diff(v3, v3).count() == 0
