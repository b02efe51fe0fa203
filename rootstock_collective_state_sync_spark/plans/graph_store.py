"""Materialized similarity-graph edge store (X-G9, r13 verdict item 1).

Five celled graph censuses (`similarity_pagerank_celled`,
`knn_triangles_celled`, `label_propagation_celled`,
`graph_assortativity`, `kcore_celled`) compose the SAME cell-confined
kNN edge build — `operators/graph.py::knn_edges_celled` — and before
this module each of them REBUILT it per query (~4.7 s of the 6.5 s
`kcore_celled` bench seat at sf0.1). At 100 TB you build the
similarity graph ONCE, commit it, and run every census against the
stored edges: this module materializes the edge set into a
manifest-committed :class:`..sinks.table.VersionedTable` (the same
blue/green snapshot store the export/governance sinks use, reference
``schema.ts:10-49`` swap semantics) keyed by the corpus fingerprint
and build parameters, and the ``*_from_edges`` registry twins read it.

Correctness contract: `knn_edges_celled` is fully deterministic
(deterministic IVF quantizer, integer tie-breaks), so stored edges ==
freshly-built edges row-for-row and the `*_from_edges` twins share
the original composed k-means DuckDB oracles UNCHANGED — the driver's
hash-compare proves build-once == build-per-query end to end.

Staleness safety: the store directory name hashes (corpus file size,
mtime, build params, store format version), so a regenerated corpus
or changed geometry can never read a stale edge set — it simply keys
a different table. Storage is best-effort: any storage-layer failure
falls back to returning the freshly built edges (correctness never
depends on the cache; only amortization does).

Location: ``$SPARK_GRAFT_WORKDIR`` when set (a cluster would point
this at shared storage), else a per-user directory under the system
temp root — never inside the read-only testdata tree.
"""

from __future__ import annotations

import getpass
import hashlib
import logging
import os
import tempfile
from pathlib import Path

_LOG = logging.getLogger(__name__)

from pyspark.sql import DataFrame, SparkSession, types as T

_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), True),
        T.StructField("dst", T.LongType(), True),
    ]
)

_STORE_FORMAT = 1  # bump to invalidate every cached edge table

# process-level handle cache: (digest) -> VersionedTable, so repeat
# queries in one session skip even the manifest read
_TABLES: dict[str, "object"] = {}


def store_root() -> Path:
    root = os.environ.get("SPARK_GRAFT_WORKDIR")
    if root:
        return Path(root) / "graph_edges"
    user = getpass.getuser() or "anon"
    return Path(tempfile.gettempdir()) / f"rootstock-collective-state-sync-spark-{user}" / "graph_edges"


def _corpus_key(sf_dir: str, k: int, nprobe: int) -> str:
    """Digest of (corpus identity, build geometry): the embeddings
    file's absolute path + size + mtime_ns stands in for content —
    the driver regenerates testdata in place, so mtime moves whenever
    rows could have."""
    p = Path(sf_dir) / "embeddings.parquet"
    st = p.stat()
    raw = f"v{_STORE_FORMAT}|{p.resolve()}|{st.st_size}|{st.st_mtime_ns}|k={k}|nprobe={nprobe}"
    return hashlib.sha256(raw.encode()).hexdigest()[:20]


def graph_edges(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    nprobe: int = 4,
) -> DataFrame:
    """The shared celled kNN edge set for ``sf_dir``'s embeddings —
    read from the committed store when present, else built once via
    :func:`..operators.graph.knn_edges_celled` (``num_cells="auto"``)
    and committed. Row-identical to a fresh build by determinism of
    the whole build chain."""
    from rootstock_collective_state_sync_spark.operators.graph import (
        knn_edges_celled,
    )
    from rootstock_collective_state_sync_spark.plans.tables import load_table
    from rootstock_collective_state_sync_spark.sinks.table import VersionedTable

    digest = _corpus_key(sf_dir, k, nprobe)
    t = _TABLES.get(digest)
    if t is not None:
        return t.read()

    # Storage probe — SCOPED try: storage (shared tmp dir permissions,
    # concurrent create/commit races, quota) must never fail the QUERY,
    # but a failure in the edge BUILD itself is a genuine bug and must
    # propagate, not silently re-run the dominant-cost build a second
    # time (r14 advisor item).
    path = None
    try:
        path = store_root() / digest
        t = VersionedTable(spark, path)
        if t.exists():
            if t.current_version() >= 2:
                _TABLES[digest] = t
                return t.read()
            # crash leftover: table created (empty v1) but the data
            # commit never landed — fall through and write it now
        else:
            t.create(
                _EDGE_SCHEMA,
                merge_keys=["src", "dst"],
                num_buckets=16,
                meta={
                    "builder": "knn_edges_celled",
                    "k": k,
                    "nprobe": nprobe,
                    "num_cells": "auto",
                    "sf_dir": str(sf_dir),
                },
            )
    except Exception:
        _LOG.warning(
            "graph_edges store unavailable at %s; building fresh "
            "edges without caching",
            path if path is not None else f"<unresolved root>/{digest}",
            exc_info=True,
        )
        t = None

    # Build OUTSIDE any except-swallowing scope: exceptions here are
    # operator bugs, never a cache-miss condition.
    emb = load_table(spark, sf_dir, "embeddings")
    edges = knn_edges_celled(emb, k=k, num_cells="auto", nprobe=nprobe)
    if t is None:
        return edges
    try:
        t.overwrite(edges, meta={"rows_source": "embeddings"})
        _TABLES[digest] = t
        return t.read()
    except Exception:
        # commit failed after a successful build: hand back the
        # already-constructed plan — NO rebuild, no silent swallow
        _LOG.warning(
            "graph_edges commit failed at %s; returning the fresh "
            "build uncached",
            path,
            exc_info=True,
        )
        return edges


def reset_cache() -> None:
    """Drop the process-level handle cache (tests)."""
    _TABLES.clear()
