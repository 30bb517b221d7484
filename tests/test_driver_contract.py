"""The local mirror of the driver's correctness gate.

Every registered query with an oracle is executed on Spark and on DuckDB
at sf0.001 (fast inner loop) and compared order-insensitively at full
value precision. Queries without an oracle get a rows>=0 smoke check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from tests.conftest import SF_SMALL
from tests.oracle_diff import run_query_pair

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, duck_small, name):
    fn = QUERIES[name]
    if name in ORACLES:
        problems = run_query_pair(spark, duck_small, fn, ORACLES[name], SF_SMALL, name)
        assert not problems, "\n".join(problems)
    else:
        # non-SQL-expressible: weaker rows-only check, like the driver
        df = fn(spark, SF_SMALL)
        assert df.count() >= 0
