"""Warehouse-layout writers.

ref: ETL/load_to_bigquery.py:37-94 — day partitioning + clustering on
the warehouse table (S7); Source/*.py CSV sinks (S8); manifest JSON
docs (S10). Spark-native: partitionBy for pruning,
sortWithinPartitions for clustering-like locality (row-group skipping),
atomic output committer replaces the hand-rolled retry/resume logic.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "date",
    cluster_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Day-partitioned, cluster-sorted parquet table (S7).

    partitionBy gives partition pruning on the incremental lookback
    filter; sortWithinPartitions gives parquet row-group min/max
    locality on the cluster keys (BigQuery clustering analog).
    """
    out = df
    if cluster_cols:
        out = out.repartition(F.col(partition_col)).sortWithinPartitions(*cluster_cols)
    out.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Header-once CSV sink (S8). Task-level atomicity replaces the
    reference's append+fsync crash-safety."""
    df.write.mode(mode).option("header", True).csv(path)


def write_manifest(path: str, manifest: dict) -> None:
    """Run-manifest JSON document (S10) — control-plane metadata."""
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True, default=str)
