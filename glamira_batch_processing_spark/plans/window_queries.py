"""Window / ordering / incremental contract queries (SURVEY §2.5-§2.6,
W2/W3/O4 + J11 merge)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import merge_upsert
from ..operators.windows import dedupe_latest, scd2_from_history
from .registry import query, table


# ---------------------------------------------------------------------------
# W2: canonical row per group (ascending order variant).
# ---------------------------------------------------------------------------
@query(
    "w2_canonical_per_group",
    oracle="""
    SELECT s_nationkey, s_suppkey AS canonical_suppkey, s_name AS canonical_name
    FROM (
      SELECT *, row_number() OVER (PARTITION BY s_nationkey ORDER BY s_name, s_suppkey) AS rn
      FROM supplier
    )
    WHERE rn = 1
    """,
)
def w2_canonical_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical representative per key, ascending order (ref:
    mart_dim_location.sql:3-25 — W2)."""
    s = table(spark, sf_dir, "supplier")
    return dedupe_latest(
        s, ["s_nationkey"], [F.col("s_name"), F.col("s_suppkey")]
    ).select(
        "s_nationkey",
        F.col("s_suppkey").alias("canonical_suppkey"),
        F.col("s_name").alias("canonical_name"),
    )


# ---------------------------------------------------------------------------
# W3 + SCD2: validity windows from append-only history.
# ---------------------------------------------------------------------------
@query(
    "w3_scd2_history",
    oracle="""
    SELECT
      user_id,
      event_id,
      epoch_us(ts) AS valid_from_us,
      epoch_us(lead(ts) OVER w) AS valid_to_us,
      (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w3_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity derivation (ref: snapshots/customer_email_scd
    .sql:36-41 current-record marker W3 + the dbt timestamp-strategy
    snapshot semantics). valid_to = next version's ts; NULL = current."""
    e = table(spark, sf_dir, "events")
    out = scd2_from_history(
        e, "user_id", F.col("ts"), F.col("event_id")
    )
    return out.select(
        "user_id",
        "event_id",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# O4: top-k under composite custom ordering.
# ---------------------------------------------------------------------------
@query(
    "o4_topk_composite_order",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def o4_topk_composite_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic composite tiebreak (ref:
    step1_collect_product_urls.py:57-89 driver-side min-by-key — O4).
    Spark executes this as TakeOrderedAndProject: per-partition top-k,
    then a k-row merge on the driver — no global sort at any scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# J11: incremental dedupe-then-merge upsert (format-free MERGE INTO).
# ---------------------------------------------------------------------------
@query(
    "j11_incremental_merge",
    oracle="""
    WITH tgt AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, 0 AS from_source
      FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
    ),
    src AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, 1 AS from_source
      FROM orders WHERE o_orderdate >= TIMESTAMP '1999-10-01'
    ),
    unioned AS (
      SELECT * FROM tgt UNION ALL SELECT * FROM src
    )
    SELECT o_orderkey, o_custkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           o_totalprice, from_source
    FROM (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY from_source DESC) AS rn
      FROM unioned
    )
    WHERE rn = 1
    """,
)
def j11_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental merge with lookback overlap (ref:
    Incremental_load_template.sql:1-30 — J11 + the 3-day lookback
    pattern). Target = history to 2000-01-01; source = 3-month lookback
    re-extract; source wins on key collision via operators.incremental
    .merge_upsert."""
    o = table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    tgt = o.filter(F.col("o_orderdate") < "2000-01-01").select(cols).withColumn(
        "from_source", F.lit(0)
    )
    src = o.filter(F.col("o_orderdate") >= "1999-10-01").select(cols).withColumn(
        "from_source", F.lit(1)
    )
    merged = merge_upsert(tgt, src, ["o_orderkey"])
    return merged.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_totalprice",
        "from_source",
    )
