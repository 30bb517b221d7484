"""Point-in-range lookup join (the IP -> geolocation pattern).

ref: Source/connection_to_mongodb.py:87-121 — the reference resolves
each IP against an IP2Location BIN file (a sorted range table:
[range_start, range_end] -> location) row-by-row on the driver. SURVEY
§2.10 maps this to a join against the range table; the naive Spark plan
for ``p BETWEEN start AND end`` is a BroadcastNestedLoopJoin —
O(|points| x |ranges|) work, a scale-killer when the range table
outgrows trivial.

Spark-first rebuild: quantize the number line into fixed-width buckets.
Each range explodes into the buckets it overlaps (short ranges -> ~1-2
rows); each point maps to exactly one bucket. The lookup is then a hash
EQUI-join on bucket followed by the exact BETWEEN filter within the
bucket — shuffle-partitionable, AQE-skew-splittable, no nested loop
anywhere. Work is O(|points| + |ranges| x avg_buckets_per_range +
|matches|).

Pick ``bucket_width`` near the typical range length: too small explodes
the range side, too large piles many ranges into one bucket (the
per-bucket mini nested loop the filter performs). Both degradations are
linear and observable; the default suits short, IP2Location-like
ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_lookup_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 256,
) -> DataFrame:
    """Inner-join each point row to the range rows containing it.

    Ranges are inclusive on both ends; ranges may overlap (a point
    matches every containing range). Output columns = points' +
    ranges'. Null points/bounds never match.
    """
    w = F.lit(bucket_width)
    # Drop malformed rows up front: an inverted range (start > end)
    # matches nothing under BETWEEN anyway, but if passed to sequence()
    # Spark would generate a DESCENDING bucket list (wasted shuffle), and
    # a corrupt huge-span row would blow the sequence() array limit and
    # kill the whole job. Null bounds likewise cannot match.
    valid = ranges.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(start_col) <= F.col(end_col))
    )
    r_exp = valid.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / w).cast("long"))
    return (
        p.join(r_exp, "__bucket")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bucket")
    )
