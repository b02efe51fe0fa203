"""Entity / Column model and the five-primitive type system.

Parity: the reference declares entities as
``{ name, columns[], primaryKey[], subgraphProvider }`` with columns
``{ name, type, nullable? }`` (reference ``src/config/types.ts:46-57``)
and supports exactly five primitive column types plus single-level
arrays (``src/handlers/types.ts:4-5``). A column whose type names
another entity is a foreign-key reference (``dbCreator.ts:89-127``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# The five primitives (reference src/handlers/types.ts:4-5).
PRIMITIVE_TYPES = ("Boolean", "BigInt", "Bytes", "String", "Integer")


class SchemaError(ValueError):
    """Raised for invalid entity declarations (nullable PK, unknown
    referenced entity, missing PK column...). Mirrors the reference's
    table-creation validation (``dbCreator.ts:75-83``)."""


@dataclass(frozen=True)
class Column:
    """One declared column.

    ``type`` is either a primitive name, ``[Primitive]`` for a
    single-level array (list with one element in YAML), or the name of
    another entity (FK reference).
    """

    name: str
    type: str
    is_array: bool = False
    nullable: bool = False

    @property
    def is_primitive(self) -> bool:
        return self.type in PRIMITIVE_TYPES


@dataclass(frozen=True)
class Entity:
    """One declared entity (= one engine-managed table)."""

    name: str
    columns: tuple[Column, ...]
    primary_key: tuple[str, ...]
    subgraph_provider: str = ""

    def column(self, name: str) -> Column:
        for c in self.columns:
            if c.name == name:
                return c
        raise SchemaError(f"entity {self.name} has no column {name!r}")

    @property
    def column_names(self) -> tuple[str, ...]:
        return tuple(c.name for c in self.columns)


@dataclass
class SchemaContext:
    """Registry of all declared entities, keyed by name.

    Parity: the reference indexes entities into a
    ``Map<string, Entity>`` (``src/context/schema.ts:3-13``).
    """

    entities: dict[str, Entity] = field(default_factory=dict)

    @classmethod
    def from_entities(cls, entities: list[Entity]) -> "SchemaContext":
        return cls(entities={e.name: e for e in entities})

    def __contains__(self, name: str) -> bool:
        return name in self.entities

    def __getitem__(self, name: str) -> Entity:
        if name not in self.entities:
            raise SchemaError(f"unknown entity {name!r}")
        return self.entities[name]

    def is_reference(self, col: Column) -> bool:
        """True when ``col`` points at another entity (FK reference).

        Parity: ``schema.entities.has(column.type)`` checks in
        ``subgraphQueryBuilder.ts:116-126`` / ``dbCreator.ts:89-127``.
        """
        return (not col.is_primitive) and col.type in self.entities

    def validate(self) -> None:
        """Static validation of the whole registry.

        - PK columns must exist and be non-nullable
          (reference ``dbCreator.ts:75-83`` rejects nullable PKs).
        - Non-primitive column types must name a declared entity
          (unknown types are a hard error here, where the reference
          merely warns & skips, ``dbCreator.ts:166-170`` — skipping
          columns silently is a data-loss hazard at scale).
        - Array element types must be primitive (single-level arrays
          only, ``src/handlers/types.ts:38-43``).
        """
        for e in self.entities.values():
            if not e.primary_key:
                raise SchemaError(f"entity {e.name}: empty primaryKey")
            for pk in e.primary_key:
                col = e.column(pk)  # raises if missing
                if col.nullable:
                    raise SchemaError(
                        f"entity {e.name}: primary key column {pk!r} cannot be nullable"
                    )
            for c in e.columns:
                if c.is_array and not c.is_primitive:
                    raise SchemaError(
                        f"entity {e.name}.{c.name}: arrays of entity references "
                        f"are not supported (single-level primitive arrays only)"
                    )
                if not c.is_primitive and c.type not in self.entities:
                    raise SchemaError(
                        f"entity {e.name}.{c.name}: unknown type {c.type!r}"
                    )
