"""Shared fixtures: one SparkSession per test session, DuckDB oracles."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"
SF_BENCH = "/root/testdata/sf0.1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: bench-scale (sf0.1) regression tests"
    )

from glamira_batch_processing_spark.plans.registry import TABLES


@pytest.fixture(scope="session")
def spark():
    from glamira_batch_processing_spark import get_spark

    s = get_spark("glamira-tests")
    yield s


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the synthetic tables as views, as the driver does."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck_small():
    return make_duck(SF_SMALL)


@pytest.fixture(scope="session")
def duck_medium():
    return make_duck(SF_MEDIUM)


@pytest.fixture(scope="session")
def duck_bench():
    return make_duck(SF_BENCH)
