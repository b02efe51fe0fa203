"""Source connectors: GraphQL subgraph (batch) and block stream.

Parity targets: the reference's GraphQL generator/executor
(``src/handlers/subgraphQueryBuilder.ts``,
``src/context/subgraphProvider.ts``) and block watcher
(``src/watchers/blockWatcher.ts``).
"""

from rootstock_collective_state_sync_spark.sources.graphql import (
    GraphQLRequest,
    QueryOptions,
    SubgraphClient,
    build_batch_query,
    create_entity_queries,
    create_entity_query,
)

__all__ = [
    "GraphQLRequest",
    "QueryOptions",
    "SubgraphClient",
    "build_batch_query",
    "create_entity_queries",
    "create_entity_query",
]
