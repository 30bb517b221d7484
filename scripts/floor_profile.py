"""Stage-latency floor profile for q1_pricing_summary (VERDICT r6 #3/#4).

q1 is TPC-H Q1: one full lineitem scan + an 8-aggregate groupBy onto 6
groups. Its DuckDB ratio stays >2x at sf0.1 AND sf1 while its scaling
exponent is ~+0.1 — the signature of a CONSTANT floor, not a scale
defect. This script decomposes the floor so the claim is measured, not
argued: it times, in one warmed session at each scale,

  a) an empty job            (scheduler + task-launch floor)
  b) count(*) over lineitem  (+ parquet scan)
  c) sum(one bigint column)  (+ single-column agg exchange)
  d) q1 itself               (+ the 8 aggregate expressions)

If (d) - (c) is small relative to (d), the q1 gap vs DuckDB is the
Spark job floor + scan cost, which amortizes with volume (the exponent
already shows it), not the query's expressions.

Usage: python scripts/floor_profile.py   # appends nothing; prints rows
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as contract
from glamira_batch_processing_spark import get_spark

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", str(Path(".scale/sf1").resolve())),
]
REPS = 5


def t(fn) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    spark = get_spark("glamira-floor-profile")
    q1 = contract.queries()["q1_pricing_summary"]
    print("| scale | empty job | count(*) lineitem | sum(1 col) | q1 full |")
    print("|---|---|---|---|---|")
    for label, sf in SCALES:
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        # warm: JIT + file listing + codegen caches, like the bench does
        q1(spark, sf).collect()
        a = t(lambda: spark.range(1).count())
        b = t(lambda: li.count())
        c = t(lambda: li.groupBy().sum("l_quantity").collect())
        d = t(lambda: q1(spark, sf).collect())
        print(
            f"| {label} | {a:.3f} | {b:.3f} | {c:.3f} | {d:.3f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
