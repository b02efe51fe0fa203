"""Construct an sf1 scale point (10x the driver's sf0.1 parquet) for
the SCALING.md sweep — the driver ships sf0.001/0.01/0.1 only.

Replication is deterministic and DUP-DENSITY-PRESERVING, because naive
row copying would make every document an exact 10-way duplicate and
the "scaling" measurement would instead measure duplicate density:

- ``documents``: replica k > 0 prefixes every word with ``r{k}`` — an
  injective token rename, so within a replica every pairwise Jaccard,
  shingle-set size, and stop-shingle document frequency is IDENTICAL
  to sf0.1, while shingle universes across replicas are disjoint.
  Consequence (used as the sf1 correctness check): the exact n-gram
  dedup / novelty results at sf1 are precisely 10 id-offset copies of
  the sf0.1 results.
- ``embeddings``: replica k rotates the vector left by k positions —
  norm- and distribution-preserving, decorrelates replicas.
- ``lineitem``: replica k offsets ``l_orderkey`` (group-by measures
  scale 10x exactly; the q1 oracle re-runs cheaply at sf1).

Row groups are kept small (2 000 docs/vectors, 200 000 lineitems) so
Spark gets real scan parallelism — a single-row-group file caps every
downstream map stage at one task regardless of cluster size, which is
a file-layout artifact, not a plan property (at 100 TB inputs arrive
as thousands of files). ids offset by k * (max_id + 1). Output goes under a caller-supplied
writable directory (default /tmp/spark_graft_sf1), never /root/testdata.

Usage: PYTHONPATH=/root/repo python tools/scale_data.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def build(out_dir: str = "/tmp/spark_graft_sf1") -> str:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW range_k AS SELECT unnest(range({REPLICAS})) AS k")

    off = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    con.execute(
        rf"""
        COPY (
          SELECT doc_id + k * {off} AS doc_id,
                 CASE WHEN k = 0 THEN text
                      ELSE regexp_replace(text, '([A-Za-z0-9]+)',
                                          'r' || k || '\1', 'g')
                 END AS text,
                 lang, source, n_chars
          FROM '{SRC}/documents.parquet', range_k
          ORDER BY doc_id
        ) TO '{out_dir}/documents.parquet' (FORMAT parquet, ROW_GROUP_SIZE 2000)
        """
    )

    voff = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT vec_id + k * {voff} AS vec_id,
                 CASE WHEN k = 0 THEN embedding
                      ELSE (embedding[k + 1:] || embedding[1:k])::FLOAT[]
                 END AS embedding,
                 label
          FROM '{SRC}/embeddings.parquet', range_k
          ORDER BY vec_id
        ) TO '{out_dir}/embeddings.parquet' (FORMAT parquet, ROW_GROUP_SIZE 2000)
        """
    )

    loff = con.execute(
        f"SELECT max(l_orderkey) + 1 FROM '{SRC}/lineitem.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT l_orderkey + k * {loff} AS l_orderkey,
                 l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus, l_shipdate
          FROM '{SRC}/lineitem.parquet', range_k
        ) TO '{out_dir}/lineitem.parquet' (FORMAT parquet, ROW_GROUP_SIZE 200000)
        """
    )
    return out_dir


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1")
    con = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem"):
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)
