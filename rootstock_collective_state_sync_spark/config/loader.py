"""YAML config loader.

Accepts the reference's config file format verbatim
(``config/default.yml``): an ``entities:`` list where each item is
``{name, columns: [{name, type, nullable?}], primaryKey: [..],
subgraphProvider}``. Array types appear in YAML as a single-element
list (``type: [String]``), matching the reference's
``isArrayColumnType`` guard (``src/handlers/types.ts:38-43``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import yaml

from rootstock_collective_state_sync_spark.config.types import (
    Column,
    Entity,
    SchemaContext,
    SchemaError,
)


def _parse_column(raw: dict[str, Any], entity_name: str) -> Column:
    name = raw.get("name")
    if not name:
        raise SchemaError(f"entity {entity_name}: column without a name: {raw!r}")
    t = raw.get("type")
    is_array = False
    if isinstance(t, list):
        if len(t) != 1 or not isinstance(t[0], str):
            raise SchemaError(
                f"entity {entity_name}.{name}: array type must be a "
                f"single-element list, got {t!r}"
            )
        t, is_array = t[0], True
    if not isinstance(t, str):
        raise SchemaError(f"entity {entity_name}.{name}: bad type {t!r}")
    return Column(
        name=name, type=t, is_array=is_array, nullable=bool(raw.get("nullable", False))
    )


def _parse_entity(raw: dict[str, Any]) -> Entity:
    name = raw.get("name")
    if not name:
        raise SchemaError(f"entity without a name: {raw!r}")
    columns = tuple(_parse_column(c, name) for c in raw.get("columns", []))
    pk_raw = raw.get("primaryKey", [])
    pk = tuple(pk_raw) if isinstance(pk_raw, list) else (pk_raw,)
    return Entity(
        name=name,
        columns=columns,
        primary_key=pk,
        subgraph_provider=raw.get("subgraphProvider", ""),
    )


def load_entities(path: str | Path) -> SchemaContext:
    """Load + validate the entity registry from a reference-format YAML."""
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    entities = [_parse_entity(e) for e in doc.get("entities", [])]
    ctx = SchemaContext.from_entities(entities)
    ctx.validate()
    return ctx


def load_config(path: str | Path) -> dict[str, Any]:
    """Load the full config doc (app/database/blockchain/providers/entities).

    Returns the raw dict plus a validated ``SchemaContext`` under key
    ``"schema"`` — the engine analog of the reference's
    ``getConfig()`` + ``createContexts`` bootstrap
    (``src/config/config.ts:4-12``, ``src/context/create.ts:9-23``).
    """
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    entities = [_parse_entity(e) for e in doc.get("entities", [])]
    ctx = SchemaContext.from_entities(entities)
    ctx.validate()
    doc["schema"] = ctx
    return doc
