"""Bench-scale regression gate for the flagship whole-warehouse query.

The driver oracle-checks ``glamira_pipeline_e2e`` at sf0.01; the
benchmark runs it at sf0.1. This test closes the gap (round-2 verdict
ask #5): the full staging -> SCD -> marts DAG is value-checked against
its complete DuckDB replication AT BENCH SCALE, so a perf-motivated
plan change that subtly breaks results at the 10x volume cannot land
green.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from tests.conftest import SF_BENCH
from tests.oracle_diff import run_query_pair


@pytest.mark.slow
@pytest.mark.parametrize("flagship", ["glamira_pipeline_e2e", "datapipe_e2e"])
def test_flagships_match_oracle_at_bench_scale(spark, duck_bench, flagship):
    qs = contract.queries()
    oracles = contract.oracle_sql()
    problems = run_query_pair(
        spark,
        duck_bench,
        qs[flagship],
        oracles[flagship],
        SF_BENCH,
        f"{flagship}@sf0.1",
    )
    assert not problems, "\n".join(problems)
