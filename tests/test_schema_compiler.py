"""Entity registry + StructType compiler tests (no Spark session needed).

Mirrors the reference's DDL/type-system unit coverage
(``dbCreator.test.ts``, ``types.test.ts``) plus the validation rules at
``dbCreator.ts:75-83``.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from pyspark.sql import types as T

from rootstock_collective_state_sync_spark.config import (
    Column,
    Entity,
    SchemaContext,
    SchemaError,
    compile_entity,
    compile_schema,
    load_entities,
    merge_key_columns,
)

FIXTURE = Path(__file__).parent / "fixtures" / "entities.yml"


@pytest.fixture(scope="module")
def ctx() -> SchemaContext:
    return load_entities(FIXTURE)


def test_loads_all_entities(ctx):
    assert set(ctx.entities) == {
        "LastProcessedBlock",
        "BlockChangeLog",
        "Account",
        "Proposal",
        "VoteCast",
        "ClaimedRewardsHistory",
        "EpochSlot",
        "SlotRef",
    }


def test_primitive_mapping(ctx):
    st = compile_entity(ctx, ctx["LastProcessedBlock"])
    assert st["id"].dataType == T.BooleanType()
    assert st["number"].dataType == T.DecimalType(38, 0)
    assert st["hash"].dataType == T.BinaryType()
    # default NOT NULL
    assert all(not f.nullable for f in st.fields)


def test_array_type(ctx):
    st = compile_entity(ctx, ctx["BlockChangeLog"])
    assert st["updatedEntities"].dataType == T.ArrayType(T.StringType(), True)


def test_array_of_bigint(ctx):
    st = compile_entity(ctx, ctx["Proposal"])
    assert st["values"].dataType == T.ArrayType(T.DecimalType(38, 0), True)
    assert st["targets"].dataType == T.ArrayType(T.BinaryType(), True)


def test_fk_flattened_to_referenced_pk_type(ctx):
    st = compile_entity(ctx, ctx["VoteCast"])
    # voter -> Account.id (Bytes), proposal -> Proposal.id (Bytes)
    assert st["voter"].dataType == T.BinaryType()
    assert st["proposal"].dataType == T.BinaryType()
    # no nested struct columns survive compilation
    assert not any(isinstance(f.dataType, T.StructType) for f in st.fields)


def test_composite_fk_name_mangling(ctx):
    st = compile_entity(ctx, ctx["SlotRef"])
    names = [f.name for f in st.fields]
    assert names == ["id", "target_epoch", "target_slot"]
    assert st["target_epoch"].dataType == T.DecimalType(38, 0)
    assert st["target_slot"].dataType == T.IntegerType()


def test_merge_keys_simple_and_composite(ctx):
    assert merge_key_columns(ctx, ctx["VoteCast"]) == ["id"]
    assert merge_key_columns(ctx, ctx["EpochSlot"]) == ["epoch", "slot"]


def test_nullable_optin(ctx):
    st = compile_entity(ctx, ctx["ClaimedRewardsHistory"])
    assert st["backer"].nullable is True
    assert st["id"].nullable is False


def test_nullable_pk_rejected():
    e = Entity(
        name="Bad",
        columns=(Column("id", "Bytes", nullable=True),),
        primary_key=("id",),
    )
    ctx = SchemaContext.from_entities([e])
    with pytest.raises(SchemaError, match="nullable"):
        ctx.validate()


def test_unknown_type_rejected():
    e = Entity(
        name="Bad", columns=(Column("id", "Bytes"), Column("x", "Nope")),
        primary_key=("id",),
    )
    with pytest.raises(SchemaError, match="unknown type"):
        SchemaContext.from_entities([e]).validate()


def test_missing_pk_column_rejected():
    e = Entity(name="Bad", columns=(Column("id", "Bytes"),), primary_key=("nope",))
    with pytest.raises(SchemaError, match="no column"):
        SchemaContext.from_entities([e]).validate()


def test_array_of_reference_rejected():
    a = Entity(name="A", columns=(Column("id", "Bytes"),), primary_key=("id",))
    b = Entity(
        name="B",
        columns=(Column("id", "Bytes"), Column("refs", "A", is_array=True)),
        primary_key=("id",),
    )
    with pytest.raises(SchemaError, match="arrays of entity references"):
        SchemaContext.from_entities([a, b]).validate()


@pytest.mark.skipif(
    not os.path.exists("/root/reference/config/default.yml"),
    reason="reference checkout not present",
)
def test_compat_reference_production_config():
    """The compiler must accept the reference's full production schema
    (26 entities, config/default.yml:23-460) unchanged."""
    ctx = load_entities("/root/reference/config/default.yml")
    assert len(ctx.entities) >= 20
    schemas = compile_schema(ctx)
    assert set(schemas) == set(ctx.entities)
    # exactly one nullable column in production (SURVEY §1.2)
    nullable = [
        (e, f.name)
        for e, st in schemas.items()
        for f in st.fields
        if f.nullable
    ]
    assert nullable == [("ClaimedRewardsHistory", "backer")]
