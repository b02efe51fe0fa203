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
- ``lineitem`` + ``orders``: replica k offsets the SHARED order-key
  space (one offset for both tables, so orderkey joins keep working
  at sf1); customer keys are kept, so each customer carries 10x
  orders — the realistic decade shape for the TPC-H join queries.
- ``events``: replica k offsets ``event_id``; user/type/ts/value kept,
  so per-key and per-bucket event volumes scale 10x exactly (the bar /
  session / basket families measure a real data-term decade).
- dimension tables (``region nation customer supplier part``) are
  copied verbatim — dims grow slower than facts; keeping them fixed
  preserves broadcast-side sizes, which is what the plans assume.

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

    okey_off = con.execute(
        f"""SELECT greatest(
              (SELECT max(l_orderkey) FROM '{SRC}/lineitem.parquet'),
              (SELECT max(o_orderkey) FROM '{SRC}/orders.parquet')) + 1"""
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT l_orderkey + k * {okey_off} AS l_orderkey,
                 l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus, l_shipdate
          FROM '{SRC}/lineitem.parquet', range_k
        ) TO '{out_dir}/lineitem.parquet' (FORMAT parquet, ROW_GROUP_SIZE 200000)
        """
    )
    ocols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/orders.parquet'"
        ).fetchall()
    ]
    rest = ", ".join(c for c in ocols if c != "o_orderkey")
    con.execute(
        f"""
        COPY (
          SELECT o_orderkey + k * {okey_off} AS o_orderkey, {rest}
          FROM '{SRC}/orders.parquet', range_k
        ) TO '{out_dir}/orders.parquet' (FORMAT parquet, ROW_GROUP_SIZE 200000)
        """
    )

    eoff = con.execute(
        f"SELECT max(event_id) + 1 FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    ecols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/events.parquet'"
        ).fetchall()
    ]
    erest = ", ".join(c for c in ecols if c != "event_id")
    con.execute(
        f"""
        COPY (
          SELECT event_id + k * {eoff} AS event_id, {erest}
          FROM '{SRC}/events.parquet', range_k
        ) TO '{out_dir}/events.parquet' (FORMAT parquet, ROW_GROUP_SIZE 200000)
        """
    )

    for dim in ("region", "nation", "customer", "supplier", "part"):
        con.execute(
            f"""COPY (SELECT * FROM '{SRC}/{dim}.parquet')
                TO '{out_dir}/{dim}.parquet' (FORMAT parquet)"""
        )
    return out_dir


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1")
    con = duckdb.connect()
    for t in ("documents", "embeddings", "lineitem"):
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)
