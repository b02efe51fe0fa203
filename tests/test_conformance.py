"""Conformance: every registered query with an oracle must match
DuckDB on the same parquet data (the driver's t2 gate, run locally at
sf0.001 for speed — set SPARK_GRAFT_TESTDATA_SF=sf0.01 to mirror the
driver exactly)."""

from __future__ import annotations

import os

import pytest

from rootstock_collective_state_sync_spark.plans.registry import SPECS

from tests.oracle import compare

SF_DIR = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"),
    os.environ.get("SPARK_GRAFT_TESTDATA_SF", "sf0.001"),
)


@pytest.mark.parametrize("name", [n for n, s in SPECS.items() if s.oracle])
def test_query_matches_oracle(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    problems = compare(df, spec.oracle, SF_DIR)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", [n for n, s in SPECS.items() if not s.oracle])
def test_query_runs_rows_only(spark, name):
    df = SPECS[name].fn(spark, SF_DIR)
    assert df.count() >= 0
