"""Measure the q1_pricing_summary accepted-constant CROSSING point.

SCALE.md's floor decomposition predicts the Spark-vs-DuckDB ratio for
q1 falls under 2x near sf4 because Spark's ~0.4 s session constant
amortizes while DuckDB grows linearly. VERDICT r7 ask #2: measure it,
don't extrapolate it. This script

1. builds lineitem-only scaled directories (.scale/sf4, .scale/sf10)
   by key-shifted replication of .scale/sf1's lineitem (q1 touches no
   other table, so the other tables are not materialized), and
2. times Spark q1 vs the DuckDB oracle SQL interleaved (min of N, same
   estimator rationale as scripts/bench_compare.py) at sf0.1 / sf1 /
   sf4 / sf10, printing a markdown row per scale for SCALE.md.

Usage: python scripts/q1_crossing.py [runs=5]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
import __spark_entry__ as contract

SF1 = Path(".scale/sf1").resolve()
ROWS_NOTE = "lineitem-only (q1 reads nothing else)"


def build_scaled_lineitem(spark, factor: int, out: Path) -> None:
    """factor x sf1 lineitem via key-shifted replicas (same recipe as
    make_scaled_sf: offsets = exact key-domain size, so replicas never
    collide; every non-key column keeps its distribution)."""
    from pyspark.sql import functions as F

    if (out / "lineitem.parquet" / "_SUCCESS").exists():
        return
    src = spark.read.parquet(str(SF1 / "lineitem.parquet"))
    domain = src.agg(F.max("l_orderkey")).collect()[0][0] + 1
    reps = None
    for r in range(factor):
        rep = src.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * domain))
        reps = rep if reps is None else reps.unionByName(rep)
    out.mkdir(parents=True, exist_ok=True)
    reps.write.mode("overwrite").parquet(str(out / "lineitem.parquet"))


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from glamira_batch_processing_spark import get_spark

    spark = get_spark("q1-crossing")
    build_scaled_lineitem(spark, 4, Path(".scale/sf4"))
    build_scaled_lineitem(spark, 10, Path(".scale/sf10"))

    q1 = contract.queries()["q1_pricing_summary"]
    osql = contract.oracle_sql()["q1_pricing_summary"]

    print("| scale | rows | spark s | duck s | ratio |")
    print("|---|---|---|---|---|")
    for label, sf_dir in [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", str(SF1)),
        ("sf4", str(Path(".scale/sf4").resolve())),
        ("sf10", str(Path(".scale/sf10").resolve())),
    ]:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet/*.parquet'"
            if Path(f"{sf_dir}/lineitem.parquet").is_dir()
            else f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
        )
        n_rows = con.sql("SELECT COUNT(*) FROM lineitem").fetchone()[0]
        # symmetric warm-up at the target scale (codegen + page cache)
        bench.force(q1(spark, sf_dir))
        con.sql(osql).fetchall()
        ts, td = [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            bench.force(q1(spark, sf_dir))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.sql(osql).fetchall()
            td.append(time.perf_counter() - t0)
        s, d = min(ts), min(td)
        print(f"| {label} | {n_rows:,} | {s:.3f} | {d:.3f} | {s / d:.2f}x |")
        con.close()


if __name__ == "__main__":
    main()
