"""Sessionization + cardinality-sketch contract queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import kmv_estimate, sql_kmv_estimate
from ..streaming.sessionize import sessionize_batch
from .registry import query, table


@query(
    "sessionize_gap30m",
    oracle="""
    WITH s AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    seq AS (
      SELECT *, CAST(SUM(is_start) OVER (
        PARTITION BY user_id ORDER BY ts_us, event_id
        ROWS UNBOUNDED PRECEDING
      ) AS BIGINT) AS session_seq
      FROM s
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           min(ts_us) AS session_start_us,
           max(ts_us) AS session_end_us
    FROM seq
    GROUP BY user_id, session_seq
    """,
)
def sessionize_gap30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min): lag -> start flag -> running
    sum -> per-session rollup. The streaming twin is the
    applyInPandasWithState operator in streaming/sessionize.py."""
    e = table(spark, sf_dir, "events")
    s = sessionize_batch(e)
    return (
        s.withColumn("ts_us", F.unix_micros("ts"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
        )
    )


@query(
    "sketch_kmv_distinct",
    oracle=sql_kmv_estimate("events", "user_id", k=64),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch over events.user_id — a deterministic,
    engine-portable cardinality estimator (oracle checks the sketch
    itself, not just its error)."""
    e = table(spark, sf_dir, "events")
    return kmv_estimate(e, F.col("user_id"), k=64)
