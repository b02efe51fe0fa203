"""Extended large-scale operators: dedup, similarity search, text
analysis, multimodal plumbing.

These go beyond the reference's own operator set (SURVEY.md §2.11 /
§7 step 8): the operations a 100 TB training-data pipeline needs.
Everything is expressed over DataFrame built-ins (JVM-side, codegen)
— hashing is md5-based so every operator is reproducible in ANSI SQL
for oracle checking; no Python UDF appears in any hot path except the
explicitly-stubbed multimodal decoders.
"""

from rootstock_collective_state_sync_spark.operators import (
    dedup,
    graph,
    layout,
    multimodal,
    rollup,
    rules,
    sampling,
    scd,
    similarity,
    skew,
    temporal,
    text,
)

__all__ = [
    "dedup",
    "graph",
    "layout",
    "multimodal",
    "rollup",
    "rules",
    "sampling",
    "scd",
    "similarity",
    "skew",
    "temporal",
    "text",
]
