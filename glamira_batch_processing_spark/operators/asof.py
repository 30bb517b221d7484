"""As-of (most-recent-at-or-before) join.

Not in the reference (SURVEY §2.3: all joins are equi-joins) — an
extension the engine needs for time-series enrichment at scale.

Spark-first design: NOT a range join (which explodes to |L| x |R| per
key before filtering). Instead union both sides tagged, sort once per
key by (ts, right-before-left), and carry the last seen right value
forward with last(ignorenulls) over a running frame. One shuffle on the
key, linear scan within each key group — survives 100 TB where a
windowed range join would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    left_tiebreak: str,
) -> DataFrame:
    """For every left row: the ``value_cols`` of the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same key (NULL if none).

    ``right`` must be unique per (key, right_ts) — pre-aggregate if not;
    ``left_tiebreak`` makes the within-key order total.
    """
    l_tagged = left.withColumn("__side", F.lit(0)).withColumn(
        "__ts", F.col(left_ts)
    )
    pad = [F.lit(None).alias(c) for c in value_cols]
    l_tagged = l_tagged.select("*", *pad)
    r_tagged = (
        right.select(
            key,
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in value_cols],
        )
        .withColumn("__side", F.lit(1))
    )
    l_cols = [c for c in l_tagged.columns if c not in r_tagged.columns]
    for c in l_cols:
        r_tagged = r_tagged.withColumn(c, F.lit(None))
    u = l_tagged.unionByName(r_tagged)
    # Right rows sort BEFORE left rows at equal ts (asof is <=).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.desc("__side"), F.col(left_tiebreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(F.when(F.col("__side") == 1, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("__side") == 0).drop("__side", "__ts", *value_cols)
    for c in value_cols:
        out = out.withColumnRenamed(f"__asof_{c}", c)
    return out
