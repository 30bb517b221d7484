"""Per-key time-series densification: spine gap-fill + forward fill.

Generalizes the global gapfill_forward_fill contract query
(plans/timeseries_queries.py) to one spine PER KEY: each key gets every
bar between ITS first and last observation, missing bars are flagged,
and a chosen value column forward-fills.

Scale: the per-key bounds and per-bar aggregates are map-side
combinable; the spine explode amplifies by bars-per-key (calendar-
bounded, not corpus-bounded); the forward-fill window partitions by key
— no global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_by_key(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Densify ``df`` onto per-key bar spines and forward-fill
    ``value_col``.

    Returns one row per (key, bar) between each key's first and last
    observed bar: ``bar_ts``, ``n_events`` (0 on gaps), ``is_gap``, and
    ``filled_<value_col>`` (last observed value at-or-before the bar;
    within a bar the observation with the greatest (ts, tiebreak) wins,
    where the tiebreak is a deterministic xxhash64 of the row so ties
    resolve identically on every run).
    """
    bar = F.date_trunc(trunc_unit, F.col(ts_col))
    okey = F.struct(
        F.col(ts_col), F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
    )
    per_bar = df.groupBy(*key_cols, bar.alias("bar_ts")).agg(
        F.count("*").alias("n_events"),
        F.max_by(F.col(value_col), okey).alias("__last"),
    )
    bounds = df.groupBy(*key_cols).agg(
        F.date_trunc(trunc_unit, F.min(ts_col)).alias("__t0"),
        F.date_trunc(trunc_unit, F.max(ts_col)).alias("__t1"),
    )
    spine = bounds.select(
        *key_cols,
        F.explode(F.expr(f"sequence(__t0, __t1, interval {step})")).alias("bar_ts"),
    )
    joined = spine.join(per_bar, [*key_cols, "bar_ts"], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bar_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *key_cols,
        "bar_ts",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        (F.coalesce(F.col("n_events"), F.lit(0)) == 0).cast("int").alias("is_gap"),
        F.last("__last", ignorenulls=True).over(w).alias(f"filled_{value_col}"),
    )
