"""Deterministic cardinality sketch: K-Minimum-Values (KMV).

A distinct-count estimator whose state is the k smallest hash values of
the distinct items: estimate = (k-1) / kth_min_fraction. Unlike
HyperLogLog (whose register layout is engine-specific), KMV over md5
hex strings is exactly reproducible in any SQL engine — so the sketch
itself can be oracle-checked, not just its error bound.

Scale path: the min-k state is tiny (k hashes), merges by union+min-k
(associative), and computes with one TakeOrdered — no full shuffle of
the distinct set when k << distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_32 = 4294967296.0


def kmv_sketch(df: DataFrame, col: Column, k: int = 64) -> DataFrame:
    """The k lexicographically-smallest md5 hashes of distinct values —
    the sketch state (mergeable by union + re-min-k)."""
    return (
        df.select(F.md5(col.cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(df: DataFrame, col: Column, k: int = 64) -> DataFrame:
    """One row: (k_used, kth_min_frac, estimated_distinct).

    The hash is mapped to a fraction in [0,1) via its first 8 hex chars
    (monotone with the full-string ordering, so min-k by string = min-k
    by fraction).
    """
    mins = kmv_sketch(df, col, k)
    frac = (
        F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint").cast("double")
        / F.lit(TWO_32)
    )
    return mins.select(frac.alias("f")).agg(
        F.count("*").alias("k_used"),
        F.max("f").alias("kth_min_frac"),
        ((F.count("*") - 1) / F.max("f")).alias("estimated_distinct"),
    )


def sql_kmv_estimate(source: str, col_sql: str, k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_estimate` (bit-identical output)."""
    return f"""
    WITH hashes AS (
      SELECT DISTINCT md5(CAST({col_sql} AS VARCHAR)) AS h FROM {source}
    ),
    mins AS (SELECT h FROM hashes ORDER BY h LIMIT {k}),
    fr AS (
      SELECT CAST(CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) AS DOUBLE) / {TWO_32!r} AS f
      FROM mins
    )
    SELECT COUNT(*) AS k_used,
           max(f) AS kth_min_frac,
           (COUNT(*) - 1) / max(f) AS estimated_distinct
    FROM fr
    """
