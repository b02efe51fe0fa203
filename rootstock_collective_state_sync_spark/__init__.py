"""PySpark-native analytics / state-sync engine.

A brand-new engine with the query and data-processing capabilities of
``RootstockCollective/rootstock-collective-state-sync`` (a TypeScript
blockchain->Postgres ETL service), re-expressed Spark-first:

- entity registry (YAML) -> ``StructType`` schema compiler
  (:mod:`.config`), parity with the reference's config-driven model
  (reference: ``src/config/types.ts:46-57``).
- relational query surface over DataFrames (:mod:`.plans`),
- keyed idempotent upsert sink over Parquet tables (:mod:`.sinks`),
- GraphQL-subgraph & block-stream connectors (:mod:`.sources`),
- changelog-driven incremental sync + reorg protocol (:mod:`.streaming`),
- large-scale dedup / similarity / text operators (:mod:`.operators`).

Everything is DataFrame/SQL first; Catalyst + AQE do the physical
planning. Custom code is confined to connectors, the merge sink, the
reorg protocol, and the extended operators.
"""

from rootstock_collective_state_sync_spark.session import get_spark

__all__ = ["get_spark"]

__version__ = "0.1.0"
