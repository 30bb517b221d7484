"""Time-series resampling over the events stream: OHLC downsampling
and spine gap-fill with forward-fill.

The densification/downsampling passes every time-series warehouse runs
before charting or feature-extraction. Engine-exactness discipline:
bar values are SELECTED input elements (min_by / ordered-first over a
unique (ts, event_id) ordering key — no interpolation), counts are
integers,
and the only floats emitted are raw input values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, table


@query(
    "ohlc_hourly_bars",
    oracle="""
    SELECT event_type,
           epoch_us(date_trunc('hour', ts)) AS hour_us,
           first(value ORDER BY ts, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           first(value ORDER BY ts DESC, event_id DESC) AS close,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsampling per event type: open/close are the
    value at the min/max (ts, event_id) ordering key — a unique key, so
    first/last is deterministic on both engines WITHOUT any window sort
    (min_by/max_by are map-side-combinable aggregates). One exchange
    on (type, hour) at any scale; high/low/count ride the same agg."""
    e = table(spark, sf_dir, "events")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy(
            "event_type",
            F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"),
        )
        .agg(
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "gapfill_forward_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS t0,
             date_trunc('hour', MAX(ts)) AS t1
      FROM events WHERE event_type = 'purchase'
    ),
    spine AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_ts
      FROM bounds
    ),
    hourly AS (
      SELECT date_trunc('hour', ts) AS hour_ts,
             COUNT(*) AS n,
             first(value ORDER BY ts DESC, event_id DESC) AS last_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    ),
    joined AS (
      SELECT s.hour_ts, COALESCE(h.n, 0) AS n_events, h.last_value
      FROM spine s LEFT JOIN hourly h USING (hour_ts)
    )
    SELECT epoch_us(hour_ts) AS hour_us,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_events = 0 AS INTEGER) AS is_gap,
           last_value(last_value IGNORE NULLS) OVER (
             ORDER BY hour_ts ROWS UNBOUNDED PRECEDING
           ) AS filled_last
    FROM joined
    """,
)
def gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify the hourly purchase series onto a complete hour spine
    (sequence + explode), flag gaps, and forward-fill the last observed
    value (last(ignorenulls) running window).

    Scale note: the global ordered window runs over the SPINE, whose
    row count is the time range at bar granularity — bounded by
    calendar, not corpus size (a decade of hours is <90k rows). The
    corpus-sized work — the hourly agg — is map-side-combinable with
    one exchange; the spine join is a broadcast of the tiny spine.
    Per-key gap-fill would partition the same window by key."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    okey = F.struct(F.col("ts"), F.col("event_id"))
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(
            F.count("*").alias("n"),
            F.max_by("value", okey).alias("last_value"),
        )
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("hour_ts")
    )
    joined = spine.join(hourly, "hour_ts", "left")
    w = Window.orderBy("hour_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        F.unix_micros("hour_ts").alias("hour_us"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        (F.coalesce(F.col("n"), F.lit(0)) == 0).cast("int").alias("is_gap"),
        F.last("last_value", ignorenulls=True).over(w).alias("filled_last"),
    )


@query(
    "rolling_7d_active_users",
    oracle="""
    WITH contrib AS (
      SELECT DISTINCT
        CAST(ts AS DATE) + CAST(7 - 1 - d.off AS INTEGER) AS as_of_day,
        user_id
      FROM events,
           UNNEST(generate_series(0, 6)) AS d(off)
    ),
    bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
      FROM events
    )
    SELECT strftime(as_of_day, '%Y-%m-%d') AS as_of_day,
           COUNT(DISTINCT user_id) AS active_users_7d
    FROM contrib CROSS JOIN bounds
    WHERE as_of_day BETWEEN d0 AND d1
    GROUP BY 1
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day.

    COUNT(DISTINCT) over a sliding RANGE frame has no native windowed
    form in either engine; the scale-correct pattern is to explode each
    event into the <=7 as-of days it contributes to, then run ONE
    map-side-combinable distinct-count per day — a bounded x7 row
    amplification instead of a per-day self-join over the corpus. Days
    past the observed range are trimmed so every emitted day has a full
    (or left-truncated) window."""
    e = table(spark, sf_dir, "events")
    days = e.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        F.to_date("ts").alias("day"),
        "user_id",
    ).select(
        F.date_add(F.col("day"), 6 - F.col("off")).alias("as_of_day"),
        "user_id",
    )
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    return (
        days.crossJoin(F.broadcast(bounds))
        .filter(F.col("as_of_day").between(F.col("d0"), F.col("d1")))
        .groupBy(F.date_format("as_of_day", "yyyy-MM-dd").alias("as_of_day"))
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
    )
