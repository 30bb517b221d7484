"""Window-function operators: dedupe, canonical-row, SCD2 history.

ref: mart_dim_customer.sql:24-40 (W1), mart_dim_location.sql:3-25 (W2),
customer_email_scd.sql:36-41 (W3), Incremental_load_template.sql:18-30
(W4) — SURVEY.md §2.5.

Scale note: all of these shuffle once on the partition keys. At 100 TB
the partition key must be high-cardinality (user id, email, composite
business key) — these are, so the sort within each key group is tiny.
No global sort is ever required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedupe_latest(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Keep one row per key, first under ``order_by`` (W1/W2 pattern).

    Callers pass a deterministic total order (include a unique tiebreak
    column) so results are stable across runs and engines.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def rank_dedupe(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """RANK()=1 dedupe (W4) — keeps ties unless order is total."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rnk", F.rank().over(w))
        .filter(F.col("__rnk") == 1)
        .drop("__rnk")
    )


def scd2_from_history(
    df: DataFrame,
    key: str,
    ts: Column,
    tiebreak: Column,
) -> DataFrame:
    """Derive SCD Type-2 validity windows from an append-only history.

    The reference materializes SCD2 via dbt's snapshot MERGE
    (customer_email_scd.sql:1-12); without a transactional table format
    the equivalent is window-derived: valid_from = the event ts,
    valid_to = the next event's ts for the same key (NULL = current),
    is_current = no later event exists.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    nxt = F.lead(ts).over(w)
    return df.withColumn("valid_from", ts).withColumn("valid_to", nxt).withColumn(
        "is_current", nxt.isNull()
    )


def scd2_apply(
    history: DataFrame,
    new_events: DataFrame,
    key: str,
    ts: Column,
    tiebreak: Column,
) -> DataFrame:
    """Incrementally apply a batch of new events to an SCD2 history.

    Only partitions whose key appears in the batch are recomputed
    (semi-join select + window rebuild); untouched keys pass through
    as-is. At 100 TB this is the difference between rewriting the whole
    history and rewriting the few % of keys that changed — combine with
    a key-partitioned table layout to turn the anti-join into partition
    pruning. Result is identical to a full scd2_from_history rebuild.
    """
    affected_keys = new_events.select(key).distinct()
    untouched = history.join(affected_keys, key, "left_anti")
    base_cols = [c for c in history.columns if c not in ("valid_from", "valid_to", "is_current")]
    affected_hist = history.join(affected_keys, key, "left_semi").select(base_cols)
    rebuilt = scd2_from_history(
        affected_hist.unionByName(new_events.select(base_cols)), key, ts, tiebreak
    )
    return untouched.unionByName(rebuilt)
