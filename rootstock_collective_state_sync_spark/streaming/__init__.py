"""Streaming shell: block-driven incremental sync + reorg recovery.

Parity targets: the reference's block watcher / strategy pipeline
(``src/watchers/blockWatcher.ts``, ``src/watchers/strategies/*``) and
reorg cleanup (``reorgCleanupStrategy.ts``).
"""

from rootstock_collective_state_sync_spark.streaming.chain import (
    CHAINS,
    Block,
    ChainClient,
    ChainRpcError,
    ChainSpec,
    HttpChain,
    StaticChain,
)
from rootstock_collective_state_sync_spark.streaming.sync import SyncEngine
from rootstock_collective_state_sync_spark.streaming.reorg import ReorgManager

__all__ = [
    "Block",
    "CHAINS",
    "ChainClient",
    "ChainRpcError",
    "ChainSpec",
    "HttpChain",
    "StaticChain",
    "SyncEngine",
    "ReorgManager",
]
