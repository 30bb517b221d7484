"""Incremental merge (upsert) without a transactional table format.

ref: Modelling/Incremental_load_template.sql:1-30 — dbt incremental
with ``merge`` strategy on a composite key, after a W4 rank-dedupe of
the 3-day lookback window.

Spark-first design: Delta/Iceberg MERGE INTO is the scale path when a
table format is available; the format-free equivalent below is
union + priority window, which AQE executes as one shuffle on the key.
At 100 TB, combine with ``partitionBy(date)`` writes so the union only
reads the lookback partitions (partition pruning does the rest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _content_tiebreak(df: DataFrame) -> Column:
    """Deterministic last-resort ordering: xxhash64 over every hashable
    column. Rows that tie on it are either byte-identical (any pick is
    the same row) or a 2^-64 hash collision. MapType columns are
    excluded (Spark forbids hashing maps); rows differing ONLY in a
    map column therefore still pick one representative, but always the
    same one for identical non-map content."""
    cols = [f.name for f in df.schema.fields if not isinstance(f.dataType, T.MapType)]
    return F.xxhash64(*[F.col(c) for c in cols]) if cols else F.lit(0)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Rows from ``source`` win over ``target`` on key collision;
    exactly ONE row survives per key, deterministically.

    ``order_by`` optionally dedupes within source first (W4 semantics).
    It does NOT need to be a total order: a stable content-hash
    tiebreaker is appended, so rows tied on (keys, order_by) resolve to
    the same survivor on every run and partitioning (a rank() here
    would let both tied rows survive and the union window would then
    pick one arbitrarily — the nondeterminism flagged in round-3
    ADVICE on VersionedTable.merge idempotency). The same tiebreaker
    orders the union window beneath the source-wins priority, so
    duplicate keys WITHIN target also resolve deterministically.
    """
    if order_by is not None:
        w = Window.partitionBy(*keys).orderBy(*order_by, _content_tiebreak(source))
        source = (
            source.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    tgt = target.withColumn("__pri", F.lit(0))
    src = source.withColumn("__pri", F.lit(1))
    u = tgt.unionByName(src)
    w = Window.partitionBy(*keys).orderBy(F.desc("__pri"), _content_tiebreak(target))
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__pri")
    )
