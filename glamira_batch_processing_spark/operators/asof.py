"""As-of (most-recent-at-or-before) join.

Not in the reference (SURVEY §2.3: all joins are equi-joins) — an
extension the engine needs for time-series enrichment at scale.

Spark-first design: NOT a range join (which explodes to |L| x |R| per
key before filtering). Instead union both sides tagged, sort once per
key by (ts, right-before-left), and carry the last seen right row
forward with last(ignorenulls) over a running frame. One shuffle on the
key, linear scan within each key group — survives 100 TB where a
windowed range join would not.

Memory shape: only (key, ts, row-id) from the left participates in the
union+window — wide left schemas never pad onto right rows and never
shuffle twice. Left payload columns are re-attached afterwards by an
equi-join on a synthetic row id.

Null correctness: the right side's value columns travel as ONE struct
through last(ignorenulls), so every value column comes from the same
(most recent) right row and a legitimately-NULL value column inside
that row stays NULL instead of leaking an older row's value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Unit separator: cannot appear in numeric/timestamp key renderings,
# so the synthetic row id is collision-free for the documented contract.
_SEP = chr(31)


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
    # Narrow left projection: the window stage shuffles only
    # (key, ts, tiebreak, row_id), not the full left schema.
    lid = F.concat_ws(
        _SEP, F.col(key).cast("string"), F.col(left_ts).cast("string"),
        F.col(left_tiebreak).cast("string"),
    )
    # One struct per right row: all value columns stay together, so the
    # filled values all come from the SAME most-recent right row.
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(None).cast("string").alias("__tb"),
        F.lit(None).cast("string").alias("__row_id"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rv"),
    )
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.col(left_tiebreak).cast("string").alias("__tb"),
        lid.alias("__row_id"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__rv"].dataType).alias("__rv"),
    )
    u = l_tagged.unionByName(r_tagged)
    # Right rows sort BEFORE left rows at equal ts (asof is <=).
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.desc("__side"), F.col("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "__asof_rv",
        F.last(F.when(F.col("__side") == 1, F.col("__rv")), ignorenulls=True).over(w),
    )
    matched = filled.filter(F.col("__side") == 0).select(
        "__row_id",
        *[F.col("__asof_rv").getField(c).alias(c) for c in value_cols],
    )
    # Re-attach the full left payload by row id (equi-join, same key
    # distribution — AQE/bucketing co-locates it with the window output).
    l_keyed = left.withColumn(
        "__row_id",
        F.concat_ws(
            _SEP, F.col(key).cast("string"), F.col(left_ts).cast("string"),
            F.col(left_tiebreak).cast("string"),
        ),
    )
    return l_keyed.join(matched, "__row_id").drop("__row_id")
