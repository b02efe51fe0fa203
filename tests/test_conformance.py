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


@pytest.mark.parametrize("name", list(SPECS))
def test_final_schema_is_scalar_only(spark, name):
    """Registry lint: the driver's canonicalizer sorts raw pandas cells
    (r07: list cells crash it with ``unhashable type: 'list'``), so no
    registry query may expose array/map/struct columns in its FINAL
    schema. Operator functions may return arrays — registry wrappers
    must render them (``plans.tables.array_as_string``)."""
    from pyspark.sql import types as T

    df = SPECS[name].fn(spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: non-scalar final columns {bad} would crash the driver "
        "canonicalizer; render with plans.tables.array_as_string"
    )
