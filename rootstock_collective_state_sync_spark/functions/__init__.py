"""Scalar/naming helpers (SURVEY §2.9)."""

from rootstock_collective_state_sync_spark.functions.naming import (
    pluralize_entity_name,
    to_camel_case,
)

__all__ = ["pluralize_entity_name", "to_camel_case"]
