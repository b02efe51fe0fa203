"""Mergeable bounded-memory sketches beyond Spark's built-ins.

Misra-Gries heavy hitters (Misra & Gries 1982; the SpaceSaving
family): find every item whose frequency exceeds N/(m+1) using m
counters per partition, regardless of stream size. At 100 TB this is
the only way to ask "what are the heavy join keys / top tokens /
dominant event types" without a full (item)-keyed shuffle: each
executor keeps m counters over its partition, the per-partition
summaries (m rows each) are tiny, and the merge is associative.

Guarantees carried to the output (and pinned by
``tests/test_sketches.py``):

- NO FALSE NEGATIVES above threshold: any item with true count
  > N/(m+1) appears in the summary.
- BOUNDED ESTIMATE ERROR: ``est <= true <= est + delta`` where
  ``delta`` is the summary's accumulated decrement total (reported
  alongside, per partition and merged).

Like the HLL / GK quantile entries, results depend on partition
layout (the decrement schedule differs), so the registry query is a
rows-only entry by design; the ACCURACY contract, not the exact
values, is what tests assert.

Implementation: ``mapInPandas`` (one Arrow pass per partition, plain
dict counters — no per-row Python UDF overhead beyond the single
batch iteration) followed by a driver-side merge of the
#partitions × m summary rows — a bounded control-plane collect, same
policy as the IVF centroid trainer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _mg_partition(
    batches: Iterator[pd.DataFrame], col: str, m: int
) -> Iterator[pd.DataFrame]:
    counters: dict[str, int] = {}
    delta = 0
    for pdf in batches:
        for v in pdf[col].astype(str):
            if v in counters:
                counters[v] += 1
            elif len(counters) < m:
                counters[v] = 1
            else:
                # decrement-all step: every counter loses 1
                delta += 1
                dead = []
                for k in counters:
                    counters[k] -= 1
                    if counters[k] == 0:
                        dead.append(k)
                for k in dead:
                    del counters[k]
    yield pd.DataFrame(
        {
            "item": list(counters.keys()) + ["\x00delta"],
            "est": list(counters.values()) + [delta],
        }
    )


def heavy_hitters(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    m: int = 16,
    top_k: int = 10,
) -> DataFrame:
    """Approximate top-``top_k`` of ``col`` with Misra-Gries(m) per
    partition + associative merge. Returns
    ``(item, est, est_upper, rk)``: ``est <= true <= est_upper``."""
    from pyspark.sql import functions as F

    summaries = df.select(F.col(col).cast("string").alias("v")).mapInPandas(
        lambda it: _mg_partition(it, "v", m), "item string, est long"
    )
    rows = summaries.collect()  # bounded: (#partitions x (m+1)) rows
    merged: dict[str, int] = {}
    delta = 0
    for r in rows:
        if r["item"] == "\x00delta":
            delta += int(r["est"])
        else:
            merged[r["item"]] = merged.get(r["item"], 0) + int(r["est"])
    # merge-side compaction back to m counters (keeps the bound tight
    # and the state size m regardless of partition count)
    if len(merged) > m:
        cut = sorted(merged.values(), reverse=True)[m]
        delta += cut
        merged = {k: v - cut for k, v in merged.items() if v > cut}
    top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    out = [
        (item, est, est + delta, i + 1) for i, (item, est) in enumerate(top)
    ]
    return spark.createDataFrame(
        out, "item string, est long, est_upper long, rk int"
    )
