"""Pushdown-friendly date predicates == their to_date() formulations.

The registry's date_ge/date_lt/date_gt/date_le/date_between helpers
rewrite ``to_date(ts) <op> DATE 'D'`` as direct timestamp comparisons
(which reach the parquet scan as PushedFilters). These tests pin the
truncation algebra on the hostile boundary cases: exact midnights,
1 microsecond either side, month/year/leap-day edges, and NULLs.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from glamira_batch_processing_spark.plans.registry import (
    date_between,
    date_ge,
    date_gt,
    date_le,
    date_lt,
)

# Timestamps chosen to sit exactly on, just before, and just after the
# midnights that decide each predicate — plus leap-day and year edges.
_TS = [
    "1996-12-31 23:59:59.999999",
    "1997-01-01 00:00:00",
    "1997-01-01 00:00:00.000001",
    "1997-01-01 12:34:56.789",
    "1997-01-02 00:00:00",
    "1997-02-28 23:59:59.999999",
    "1997-03-01 00:00:00",
    "2000-02-28 23:59:59.999999",
    "2000-02-29 00:00:00",  # leap day
    "2000-02-29 23:59:59.999999",
    "2000-03-01 00:00:00",
    "1999-12-31 23:59:59.999999",
    "2000-01-01 00:00:00",
    None,
]

_DATES = ["1996-12-31", "1997-01-01", "1997-02-28", "2000-02-29", "2000-02-28"]


@pytest.fixture(scope="module")
def ts_df(spark):
    rows = [(i, t) for i, t in enumerate(_TS)]
    df = spark.createDataFrame(rows, "i int, s string").select(
        "i", F.col("s").cast("timestamp_ntz").alias("ts")
    )
    return df.cache()


def _ids(df, pred):
    return sorted(r.i for r in df.filter(pred).collect())


@pytest.mark.parametrize("d", _DATES)
def test_helpers_match_to_date_forms(ts_df, d):
    lit_d = F.lit(d).cast("date")
    td = F.to_date("ts")
    assert _ids(ts_df, date_ge("ts", d)) == _ids(ts_df, td >= lit_d)
    assert _ids(ts_df, date_lt("ts", d)) == _ids(ts_df, td < lit_d)
    assert _ids(ts_df, date_gt("ts", d)) == _ids(ts_df, td > lit_d)
    assert _ids(ts_df, date_le("ts", d)) == _ids(ts_df, td <= lit_d)


def test_between_matches_to_date_between(ts_df):
    got = _ids(ts_df, date_between("ts", "1997-01-01", "2000-02-29"))
    want = _ids(
        ts_df,
        F.to_date("ts").between(
            F.lit("1997-01-01").cast("date"), F.lit("2000-02-29").cast("date")
        ),
    )
    assert got == want


def test_null_timestamps_never_match(ts_df):
    null_i = _TS.index(None)
    for pred in [
        date_ge("ts", "1900-01-01"),
        date_lt("ts", "2100-01-01"),
        date_between("ts", "1900-01-01", "2100-01-01"),
    ]:
        assert null_i not in _ids(ts_df, pred)
