"""Entity registry: YAML-declared entities -> Spark schemas.

Parity target: the reference's config-driven data model
(``src/config/types.ts:46-57``, ``config/default.yml:23-460``) and its
DDL compiler (``src/handlers/dbCreator.ts``).
"""

from rootstock_collective_state_sync_spark.config.types import (
    Column,
    Entity,
    PRIMITIVE_TYPES,
    SchemaContext,
    SchemaError,
)
from rootstock_collective_state_sync_spark.config.loader import load_entities, load_config
from rootstock_collective_state_sync_spark.config.schema_compiler import (
    compile_entity,
    compile_schema,
    merge_key_columns,
)

__all__ = [
    "Column",
    "Entity",
    "PRIMITIVE_TYPES",
    "SchemaContext",
    "SchemaError",
    "load_entities",
    "load_config",
    "compile_entity",
    "compile_schema",
    "merge_key_columns",
]
