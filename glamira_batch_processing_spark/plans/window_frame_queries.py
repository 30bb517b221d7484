"""Window frames, grouping sets, and date/time arithmetic queries.

The reference only uses ranking windows over default frames (SURVEY
§2.5) and simple interval arithmetic (§1.2); these expose the rest of
the family the engine gets for free — with exact-decimal running sums
so frames stay oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .core_queries import cents
from .registry import query, table


@query(
    "w5_running_totals",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS UNBOUNDED PRECEDING
      ) AS DOUBLE) AS running_total,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS moving_total_3,
      CAST(first_value(o_orderkey) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS UNBOUNDED PRECEDING
      ) AS BIGINT) AS first_orderkey,
      CAST(COUNT(*) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS UNBOUNDED PRECEDING
      ) AS BIGINT) AS order_seq
    FROM orders
    """,
)
def w5_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/moving aggregates over explicit row frames (beyond the
    reference's ranking-only windows). Sums are exact decimal inside the
    frame, cast to double at the edge."""
    o = table(spark, sf_dir, "orders")
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_run = Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_mov = Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, 0)
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(price_dec).over(w_run).cast("double").alias("running_total"),
        F.sum(price_dec).over(w_mov).cast("double").alias("moving_total_3"),
        F.first("o_orderkey").over(w_run).alias("first_orderkey"),
        F.count("*").over(w_run).alias("order_seq"),
    )


@query(
    "grouping_sets_priority_status",
    oracle="""
    SELECT
      coalesce(o_orderpriority, 'ALL') AS priority,
      coalesce(o_orderstatus, 'ALL') AS status,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by priority, by status, grand total) —
    one pass, Catalyst expands the sets."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT
          coalesce(o_orderpriority, 'ALL') AS priority,
          coalesce(o_orderstatus, 'ALL') AS status,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "f6_time_arithmetic",
    oracle="""
    SELECT
      event_id,
      epoch_us(ts) AS ts_us,
      epoch_us(ts + INTERVAL 1 DAY) AS ts_plus_day_us,
      epoch_us(date_trunc('hour', ts)) AS ts_hour_us,
      strftime(CAST(date_trunc('month', ts) AS DATE), '%Y-%m-%d') AS month_start,
      CAST(year(ts) AS INTEGER) AS y,
      CAST(dayofweek(ts) AS INTEGER) AS dow,
      (ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00') AS in_window
    FROM events
    """,
)
def f6_time_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic, truncation, field extraction, BETWEEN range
    checks (ref: int_order_qa.sql:59-60 TIMESTAMP_ADD/BETWEEN,
    mart_fact_order.sql:164-168, mart_dim_date.sql:10-11 — F6).
    DuckDB dayofweek is 0=Sunday; Spark's dayofweek is 1=Sunday, so we
    emit Spark's value minus 1."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros(F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts_plus_day_us"),
        F.unix_micros(F.date_trunc("hour", "ts")).alias("ts_hour_us"),
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM-dd").alias("month_start"),
        F.year("ts").alias("y"),
        (F.dayofweek("ts") - 1).alias("dow"),
        F.col("ts")
        .between(
            F.lit("2024-01-10 00:00:00").cast("timestamp"),
            F.lit("2024-01-20 00:00:00").cast("timestamp"),
        )
        .alias("in_window"),
    )


@query(
    "w6_ntile_percent_rank",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ntile(4) OVER w AS price_quartile,
           percent_rank() OVER w AS price_pct_rank,
           cume_dist() OVER w AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def w6_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family: quartile bucketing (ntile),
    percent_rank and cume_dist per priority class. The window ordering
    key appends o_orderkey so ranks are total-ordered and deterministic;
    percent_rank/cume_dist are single IEEE divisions of exact integer
    ranks — engine-bit-exact. One exchange on the partition key."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


@query(
    "w7_range_interval_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY epoch(CAST(o_orderdate AS TIMESTAMP))
             RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_3d_cents
    FROM orders
    WHERE o_custkey % 50 = 0 AND o_orderdate IS NOT NULL
    """,
)
def w7_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per customer,
    the trailing-3-day sum of order value — rows whose order dates tie
    are frame PEERS and both include each other, which no ROWS frame
    can express. Completes the frame family next to w5's
    rowsBetween running/moving sums.

    Scale shape: one exchange on the customer key, per-partition sort
    by the numeric epoch, and the RANGE bound is evaluated by frame
    pointer advance (no self-join, no explode-into-days); the
    sampling filter pushes to the scan. Sums are exact integer cents.
    Null order dates are excluded on BOTH engines — engines disagree
    on how a null ordering key joins a RANGE frame's peer group, so a
    null-dated order must never reach the frame."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_custkey") % 50 == 0) & F.col("o_orderdate").isNotNull()
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate")))
        .rangeBetween(-259200, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(cents(F.col("o_totalprice"))).over(w).alias("trailing_3d_cents"),
    )
