"""Schema-reconciling parquet reader (drift repair).

ref: ETL/normalize_parquet_run.py:73-168 — the reference samples part
files, detects per-column type drift across parts, and force-casts
drifted columns to STRING before warehouse load. Spark equivalent: read
per-file-schema groups, cast conflicting columns to string, union.

This is driver-side metadata work (parquet footers only) + one casted
scan per schema group — no data is read twice.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def detect_drift(spark: SparkSession, paths: list[str], sample_size: int = 300) -> dict[str, set[str]]:
    """column -> set of simpleString types seen across sampled files.

    The 300-file sample default mirrors the reference
    (normalize_parquet_run.py:112).
    """
    seen: dict[str, set[str]] = defaultdict(set)
    for path in sorted(paths)[:sample_size]:
        schema = spark.read.parquet(path).schema
        for f in schema.fields:
            seen[f.name].add(f.dataType.simpleString())
    return dict(seen)


def reconcile_read(
    spark: SparkSession,
    paths: list[str],
    sample_size: int = 300,
    force_string: list[str] | None = None,
) -> DataFrame:
    """Read drifting parquet parts into one DataFrame.

    Columns whose type differs across parts (or listed in
    ``force_string`` — the reference's forced/suspicious-name list) are
    cast to string; all parts are unioned by name with missing columns
    filled as NULL.
    """
    drift = detect_drift(spark, paths, sample_size)
    drifted = {c for c, types in drift.items() if len(types) > 1}
    drifted.update(force_string or [])
    all_cols = sorted(drift)

    frames: list[DataFrame] = []
    for path in sorted(paths):
        df = spark.read.parquet(path)
        cols = []
        have = {f.name for f in df.schema.fields}
        for c in all_cols:
            if c not in have:
                cols.append(F.lit(None).cast("string").alias(c))
            elif c in drifted and not isinstance(
                df.schema[c].dataType, StringType
            ):
                cols.append(F.col(c).cast("string").alias(c))
            elif c in drifted:
                cols.append(F.col(c).alias(c))
            else:
                cols.append(F.col(c).alias(c))
        frames.append(df.select(*cols))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
