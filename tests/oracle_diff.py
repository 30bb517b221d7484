"""Differential comparison: Spark query result vs DuckDB oracle result.

Mimics the driver's gate: row count + schema (column names) +
order-insensitive value comparison. Values are normalized to strings at
full precision — a stricter check than any tolerance-based compare, so
passing here implies passing the driver's value-hash.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import pandas as pd


def _norm_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    return str(v)


def _normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(_norm_value(v) for v in rec))
    rows.sort()
    return cols, rows


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of human-readable mismatches (empty = pass)."""
    problems: list[str] = []
    s_cols, s_rows = _normalize(spark_pdf)
    d_cols, d_rows = _normalize(duck_pdf)
    if s_cols != d_cols:
        problems.append(f"{name}: schema mismatch spark={s_cols} duck={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(
            f"{name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
        )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    if mismatches:
        i, a, b = mismatches[0]
        problems.append(
            f"{name}: {len(mismatches)} differing rows (sorted); first at {i}:"
            f"\n  cols : {s_cols}\n  spark: {a}\n  duck : {b}"
        )
    return problems


def run_query_pair(spark, duck, query_fn, oracle: str, sf_dir: str, name: str) -> list[str]:
    sdf = query_fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.sql(oracle).df()
    return compare_frames(spark_pdf, duck_pdf, name)
