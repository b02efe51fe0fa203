from __future__ import annotations

import os
from pathlib import Path

import pytest

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = str(Path(TESTDATA_ROOT) / "sf0.001")
SF_CORRECTNESS = str(Path(TESTDATA_ROOT) / "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from rootstock_collective_state_sync_spark.session import get_spark

    spark = get_spark(
        app_name="tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture()
def tmp_table_dir(tmp_path) -> str:
    return str(tmp_path / "tables")
