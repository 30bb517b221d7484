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


def maintain_sum_agg(
    mat: DataFrame,
    cdc: DataFrame,
    group_keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental view maintenance for a sum/count rollup.

    ``mat`` is the current materialized aggregate (``group_keys`` +
    one exact-typed sum per ``sum_cols`` + ``count_col``); ``cdc`` is
    ``VersionedTable.diff(..., with_old=True)`` at the fact grain with
    the group keys present as columns. Returns the aggregate of the
    NEW snapshot without rescanning it: per-group deltas (+new for
    inserts, new-old for updates, -old for deletes) merge into ``mat``
    via a full-outer key join; groups whose row count reaches zero drop
    out entirely.

    Exactness requires integer/decimal sum columns (double sums would
    re-associate); cost is one map-side-combinable agg over the CHANGED
    rows plus a join on the (usually tiny) group-key space — the
    materialized-view refresh a warehouse runs per micro-batch instead
    of a full rescan.

    Group-moving updates are handled correctly: every change explodes
    into a "+new contribution under the NEW group keys" row and a
    "-old contribution under the OLD group keys" row (diff emits
    ``old_<col>`` for updated value columns; a group key that is also a
    merge key cannot change, so its old value is itself). When a row
    stays in its group the two sides land in the same group and net.
    """
    ct = F.col("change_type")

    def old_key(k: str) -> F.Column:
        if f"old_{k}" in cdc.columns:
            # delete rows carry the old value in the column itself
            return F.when(ct == "delete", F.col(k)).otherwise(F.col(f"old_{k}"))
        return F.col(k)

    def old_val(c: str) -> F.Column:
        return F.when(ct == "delete", F.col(c)).otherwise(F.col(f"old_{c}"))

    plus = cdc.filter(ct != "delete").select(
        *[F.col(k).alias(k) for k in group_keys],
        *[F.col(c).alias(f"__c_{c}") for c in sum_cols],
        F.lit(1).alias("__c_n"),
    )
    minus = cdc.filter(ct != "insert").select(
        *[old_key(k).alias(k) for k in group_keys],
        *[(-old_val(c)).alias(f"__c_{c}") for c in sum_cols],
        F.lit(-1).alias("__c_n"),
    )
    deltas = (
        plus.unionByName(minus)
        .groupBy(*group_keys)
        .agg(
            *[F.sum(f"__c_{c}").alias(f"__d_{c}") for c in sum_cols],
            F.sum("__c_n").alias("__d_n"),
        )
    )
    joined = mat.join(deltas, group_keys, "full_outer")
    zero = F.lit(0)
    merged = joined.select(
        *group_keys,
        *[
            (F.coalesce(F.col(c), zero) + F.coalesce(F.col(f"__d_{c}"), zero)).alias(c)
            for c in sum_cols
        ],
        (
            F.coalesce(F.col(count_col), zero) + F.coalesce(F.col("__d_n"), zero)
        ).alias(count_col),
    )
    return merged.filter(F.col(count_col) > 0)
