"""Chain client abstraction (the engine's view of JSON-RPC).

The reference talks to the chain through viem (``watchBlocks`` +
``getBlock``, ``src/watchers/blockWatcher.ts:162-174``,
``reorgCleanupStrategy.ts:33-36``); the engine needs exactly two
control-plane reads: the head block and a block header by number.
Implementations: an RPC-backed client in production (driver-side HTTP;
header reads are control plane, never a DataFrame op) and
deterministic in-memory / file-backed chains for tests.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Protocol


@dataclass(frozen=True)
class Block:
    number: int
    hash: str  # 0x… hex
    timestamp: int
    parent_hash: str = ""


class ChainClient(Protocol):
    def head_block(self) -> Block: ...

    def get_block(self, number: int) -> Block | None: ...


class StaticChain:
    """In-memory chain for tests and batch replays."""

    def __init__(self, blocks: list[Block]):
        self._by_number = {b.number: b for b in blocks}
        self._head = max(self._by_number) if blocks else 0

    def head_block(self) -> Block:
        return self._by_number[self._head]

    def get_block(self, number: int) -> Block | None:
        return self._by_number.get(number)


class FileChain:
    """File-backed chain: a JSON array of blocks. Picklable by path,
    so Spark executor workers (streaming source partitions) can read
    it; tests append/replace blocks to simulate growth and reorgs."""

    def __init__(self, path: str | Path):
        self.path = str(path)

    def _blocks(self) -> dict[int, Block]:
        raw = json.loads(Path(self.path).read_text())
        return {
            int(b["number"]): Block(
                number=int(b["number"]),
                hash=b["hash"],
                timestamp=int(b.get("timestamp", 0)),
                parent_hash=b.get("parentHash", ""),
            )
            for b in raw
        }

    def head_block(self) -> Block:
        blocks = self._blocks()
        return blocks[max(blocks)]

    def get_block(self, number: int) -> Block | None:
        return self._blocks().get(number)


def synthetic_blocks(
    start: int, count: int, fork_tag: str = "a", start_ts: int = 1_700_000_000
) -> list[Block]:
    """Deterministic block headers; ``fork_tag`` yields a different
    hash lineage (reorg fixtures, FIXTURES.md F9)."""
    import hashlib

    out = []
    parent = ""
    for n in range(start, start + count):
        h = "0x" + hashlib.md5(f"{fork_tag}:{n}".encode()).hexdigest()
        out.append(
            Block(number=n, hash=h, timestamp=start_ts + 30 * n, parent_hash=parent)
        )
        parent = h
    return out
