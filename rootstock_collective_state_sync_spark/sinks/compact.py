"""Small-file compaction: rewrite a parquet dataset into
size-targeted files.

Continuous incremental sync (micro-batch upserts, streaming sinks)
accretes thousands of KB-sized files; at 100 TB the resulting task
explosion and NameNode/listing pressure dominate query latency long
before CPU does. Compaction is the standing maintenance job: read,
re-balance to ``ceil(total_bytes / target_file_bytes)`` outputs,
write once.

Scale notes: input size comes from the files the scan actually
selected (``df.inputFiles()`` + filesystem stat — a control-plane
listing, not a data read); output uses ``repartitionByRange`` when
sort columns are given (range-clustered files -> min/max pruning
works downstream, same motivation as
:func:`..operators.layout.write_zordered`) and round-robin
``repartition`` otherwise. The write is all-or-nothing into a fresh
directory — compaction must never destroy its input; atomic swap is
:class:`.table.VersionedTable`'s job.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(df: DataFrame) -> int:
    """Total on-disk bytes of the files backing ``df``'s scan —
    driver-side stat of the scan's file list (local paths; swap in
    the Hadoop FileSystem API off-box)."""
    total = 0
    for f in df.inputFiles():
        p = urlparse(f)
        path = p.path if p.scheme in ("file", "") else None
        if path and os.path.exists(path):
            total += os.path.getsize(path)
    return total


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Compact the parquet dataset at ``src`` into ``dst`` with
    ~``target_file_bytes`` files. Returns audit stats
    (in_files, in_bytes, out_files, rows)."""
    df = spark.read.parquet(src)
    in_files = len(df.inputFiles())
    in_bytes = dataset_bytes(df)
    n_out = max(1, math.ceil(in_bytes / target_file_bytes))
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("error").parquet(dst)
    written = [
        f
        for f in os.listdir(dst)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    return {
        "in_files": in_files,
        "in_bytes": in_bytes,
        "out_files": len(written),
        "rows": spark.read.parquet(dst).count(),
    }
