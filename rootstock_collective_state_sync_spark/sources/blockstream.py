"""Structured Streaming source for block headers.

Parity: the reference polls the chain every second and emits missed
blocks (``watchBlocks({pollingInterval: 1000, emitMissed: true})``,
``src/watchers/blockWatcher.ts:162-174``). A micro-batch stream with
block-number offsets gives the same semantics exactly: ``latestOffset``
is the chain head, each batch covers ``(start, end]``, and replay of an
offset range IS ``emitMissed``. Checkpointing the offset replaces the
reference's in-memory watermark.

Usage::

    spark.dataSource.register(BlockStreamDataSource)
    blocks = (spark.readStream.format("blockstream")
              .option("chain_path", "/path/to/chain.json")  # FileChain
              .option("start_block", 100)
              .load())
    q = blocks.writeStream.foreachBatch(handle).trigger(availableNow=True).start()

Schema: (number long, hash string, timestamp long, parent_hash string).
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from rootstock_collective_state_sync_spark.streaming.chain import FileChain

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("number", T.LongType(), False),
        T.StructField("hash", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("parent_hash", T.StringType(), True),
    ]
)


class BlockRangePartition(InputPartition):
    def __init__(self, start: int, end: int, chain_path: str):
        self.start = start  # exclusive
        self.end = end  # inclusive
        self.chain_path = chain_path


class BlockStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.chain_path = options["chain_path"]
        self.start_block = int(options.get("start_block", 0))
        self.blocks_per_partition = int(options.get("blocks_per_partition", 1000))

    def initialOffset(self) -> dict:
        return {"block": self.start_block}

    def latestOffset(self) -> dict:
        head = FileChain(self.chain_path).head_block()
        return {"block": head.number}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["block"]), int(end["block"])
        parts = []
        s = lo
        while s < hi:
            e = min(s + self.blocks_per_partition, hi)
            parts.append(BlockRangePartition(s, e, self.chain_path))
            s = e
        return parts or [BlockRangePartition(lo, lo, self.chain_path)]

    def read(self, partition: BlockRangePartition) -> Iterator[tuple]:
        chain = FileChain(partition.chain_path)
        for n in range(partition.start + 1, partition.end + 1):
            b = chain.get_block(n)
            if b is not None:
                yield (b.number, b.hash, b.timestamp, b.parent_hash)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing source-side


class BlockStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "blockstream"

    def schema(self) -> T.StructType:
        return BLOCK_SCHEMA

    def streamReader(self, schema: T.StructType) -> BlockStreamReader:
        return BlockStreamReader(self.options)
