"""Local DuckDB-oracle comparison harness — mirrors the driver's
correctness gate: run the Spark plan and the oracle SQL on the same
parquet tables, compare row count, column names, and
order-insensitive values."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from rootstock_collective_state_sync_spark.plans.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonical(cols, rows):
    """Column-name-sorted, order-insensitive canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    problems = []
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    _, s_can = canonical(s_cols, s_rows)
    _, o_can = canonical(o_cols, o_rows)
    if s_can != o_can:
        diff_s = [r for r in s_can if r not in set(map(tuple, o_can))][:3]
        diff_o = [r for r in o_can if r not in set(map(tuple, s_can))][:3]
        problems.append(
            f"values differ; spark-only(first3)={diff_s} oracle-only(first3)={diff_o}"
        )
    problems += _driver_hash_guard(s_rows, oracle_sql, sf_dir)
    return problems


def _driver_hash_guard(s_rows, oracle_sql: str, sf_dir: str) -> list[str]:
    """Mirror the driver's hash pipeline (verified against r01: the
    oracle side goes through pandas, turning DECIMAL into float64,
    while the Spark side keeps Decimal objects and compares by
    string). Flag any Spark decimal value whose fixed-scale string
    differs from its float string — e.g. Decimal('529.00') vs
    '529.0' — because that is exactly what flipped 9 value-correct
    queries to hash_match:false in round 1."""
    bad = []
    for r in s_rows:
        for v in r:
            if isinstance(v, Decimal) and str(v) != str(float(v)):
                bad.append(v)
                if len(bad) >= 3:
                    break
        if len(bad) >= 3:
            break
    if bad:
        return [
            "driver-hash hazard: Spark emits fixed-scale Decimals whose str "
            f"differs from float str (first: {bad}); cast the final output "
            "column to DOUBLE (or BIGINT if integral) in plan AND oracle"
        ]
    return []
