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


def _overlay_env_map(
    doc: dict[str, Any], mapping: dict[str, Any], env: dict[str, str]
) -> None:
    """Recursively apply a reference-format env-var mapping: each leaf
    of ``mapping`` names an environment variable; when that variable is
    set, its value replaces the config value at the same path (env wins
    over YAML). Values are coerced to the YAML value's type when the
    existing value is an int/float/bool so numeric knobs stay numeric."""
    for key, val in mapping.items():
        if isinstance(val, dict):
            sub = doc.setdefault(key, {})
            if isinstance(sub, dict):
                _overlay_env_map(sub, val, env)
        elif isinstance(val, str) and val in env:
            doc[key] = _coerce_like(doc.get(key), env[val])


def _coerce_like(existing: Any, raw: str) -> Any:
    if isinstance(existing, bool):
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(existing, int):
        try:
            return int(raw)
        except ValueError:
            return raw
    if isinstance(existing, float):
        try:
            return float(raw)
        except ValueError:
            return raw
    return raw


#: Well-known override variables applied even without a mapping file —
#: the engine's analog of the reference's custom-environment-variables
#: layer (``config/custom-environment-variables.yml:1-9``): secrets and
#: deploy-specific endpoints come from the environment, never YAML.
_DB_ENV_KEYS = ("connectionString", "host", "port", "user", "password", "database")


def _builtin_env_overrides(doc: dict[str, Any], env: dict[str, str]) -> None:
    db = doc.setdefault("database", {})
    if isinstance(db, dict):
        for key in _DB_ENV_KEYS:
            var = "SPARK_GRAFT_DB_" + _snake_upper(key)
            if var in env:
                db[key] = _coerce_like(db.get(key), env[var])
    providers = doc.get("subgraphProviders")
    if isinstance(providers, dict):
        for name, cfg in providers.items():
            if not isinstance(cfg, dict):
                continue
            var = "SPARK_GRAFT_API_KEY_" + _snake_upper(name)
            if var in env:
                cfg["apiKey"] = env[var]


def _snake_upper(name: str) -> str:
    out = []
    for ch in name:
        if ch.isupper():
            out.append("_")
        out.append("_" if ch == "-" else ch)
    return "".join(out).upper()


def load_config(
    path: str | Path,
    env_map_path: str | Path | None = None,
    env: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Load the full config doc (app/database/blockchain/providers/entities).

    Returns the raw dict plus a validated ``SchemaContext`` under key
    ``"schema"`` — the engine analog of the reference's
    ``getConfig()`` + ``createContexts`` bootstrap
    (``src/config/config.ts:4-12``, ``src/context/create.ts:9-23``).

    Environment overrides are layered over the YAML *before* schema
    validation, mirroring the reference's
    ``config/custom-environment-variables.yml:1-9``: pass
    ``env_map_path`` pointing at a reference-format mapping file
    (leaves name env vars), and/or rely on the built-in
    ``SPARK_GRAFT_DB_*`` / ``SPARK_GRAFT_API_KEY_<PROVIDER>``
    conventions. Environment always wins over YAML, so secrets
    (connection strings, API keys) never have to live in config files
    — which is what makes the client-side key masking
    (``sources/graphql.py``) matter in practice.
    """
    import os

    if env is None:
        env = dict(os.environ)
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    if env_map_path is not None:
        with open(env_map_path) as f:
            mapping = yaml.safe_load(f) or {}
        _overlay_env_map(doc, mapping, env)
    _builtin_env_overrides(doc, env)
    entities = [_parse_entity(e) for e in doc.get("entities", [])]
    ctx = SchemaContext.from_entities(entities)
    ctx.validate()
    doc["schema"] = ctx
    return doc
