"""Skew mitigation: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (a bot IP, a default store_id, the
empty-email group) can pin one reducer for hours. Two mitigations:

- AQE skew-join splitting is enabled session-wide (session.py) and
  handles join-side skew at runtime.
- For aggregations, pre-split hot groups with a deterministic salt,
  aggregate partially per (key, salt), then merge the partials — two
  small shuffles instead of one unbounded reducer.

Salting works for any algebraic aggregate (sum/count/min/max);
``salted_agg`` takes the partial and final expressions explicitly so
the caller controls the algebra (e.g. count -> sum of partial counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "__salt") -> DataFrame:
    """Deterministic per-row salt in [0, buckets) — no RNG, so plans
    stay reproducible and retries don't reshuffle rows."""
    h = F.abs(F.xxhash64(*[F.col(c) for c in df.columns]))
    return df.withColumn(col_name, (h % buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over skewed keys.

    Phase 1 groups by (keys + salt) — hot keys split across ``buckets``
    reducers; phase 2 merges the per-salt partials by key. Example::

        salted_agg(df, ["ip"],
                   [F.count("*").alias("n"), F.sum("v").alias("s")],
                   [F.sum("n").alias("n"), F.sum("s").alias("s")])
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
