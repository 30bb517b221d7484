"""Event-time window contract queries: tumbling-window rollup and the
stream-stream interval join, both written as the streaming plans
(watermark + event-time bounds) and oracle-checked in batch — Spark
runs the identical plan in either mode, which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.joins import interval_join
from .core_queries import cents
from .registry import query, table

_SIX_HOURS_US = 6 * 3600 * 1_000_000


@query(
    "tumbling_window_revenue",
    oracle=f"""
    SELECT (epoch_us(ts) // {_SIX_HOURS_US}) * {_SIX_HOURS_US} AS window_start_us,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window rollup (6 h x event_type): the batch
    face of ``streaming.ingest.windowed_event_counts`` — same
    window()+watermark plan a readStream source would run, where the
    watermark bounds (window, key) state (SURVEY §2.9 extension).

    Value sums ride on integer cents in split-BIGINT aggregate state
    (core_queries.split_sum — order-insensitive, bit-exact vs the
    oracle, codegen'd where a decimal(38,0) accumulator is interpreted).
    Tumbling windows align to the unix epoch in both engines,
    so the oracle is a plain floor-div bucket."""
    from .core_queries import split_sum, split_total

    e = table(spark, sf_dir, "events")
    return (
        e.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            *split_sum(cents(F.col("value")), "v"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .withColumn("sum_value", split_total("v").cast("double") / 100)
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


@query(
    "interval_join_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           v.event_id AS view_id,
           epoch_us(v.ts) AS view_ts_us
    FROM events p
    JOIN events v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts
     AND v.ts >= p.ts - INTERVAL '15 minutes'
    WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    """,
)
def interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase attribution: every view by the same user within the 15
    minutes before a purchase (``streaming.joins.interval_join``). As a
    stream-stream join the two watermarks plus the two-sided time bound
    keep both state stores bounded; in batch Catalyst plans the same
    condition as one equi-shuffle on user_id with the range predicate
    applied as a join filter — no extra pass."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    j = interval_join(
        purchases, views, key="user_id", lower="0 seconds", upper="15 minutes"
    )
    return j.select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
        F.unix_micros("l.ts").alias("purchase_ts_us"),
        F.col("r.event_id").alias("view_id"),
        F.unix_micros("r.ts").alias("view_ts_us"),
    )
