"""Incremental merge (upsert) without a transactional table format.

ref: Modelling/Incremental_load_template.sql:1-30 — dbt incremental
with ``merge`` strategy on a composite key, after a W4 rank-dedupe of
the 3-day lookback window.

Spark-first design: Delta/Iceberg MERGE INTO is the scale path when a
table format is available; the format-free equivalent below is
union + priority window, which AQE executes as one shuffle on the key.
At 100 TB, combine with ``partitionBy(date)`` writes so the union only
reads the lookback partitions (partition pruning does the rest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Rows from ``source`` win over ``target`` on key collision.

    ``order_by`` optionally dedupes within source first (W4 semantics);
    it must be a deterministic total order.
    """
    if order_by is not None:
        w = Window.partitionBy(*keys).orderBy(*order_by)
        source = (
            source.withColumn("__rnk", F.rank().over(w))
            .filter(F.col("__rnk") == 1)
            .drop("__rnk")
        )
    tgt = target.withColumn("__pri", F.lit(0))
    src = source.withColumn("__pri", F.lit(1))
    u = tgt.unionByName(src)
    w = Window.partitionBy(*keys).orderBy(F.desc("__pri"))
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__pri")
    )
