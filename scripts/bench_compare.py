"""Spark vs DuckDB single-node throughput comparison.

The reference publishes no benchmark numbers (BASELINE.md), so the
closest single-node baseline is DuckDB executing the oracle SQL for the
same queries over the same parquet. This script times both engines on
the bench headline set and prints a JSON report with per-query ratios.

Usage: python scripts/bench_compare.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
import __spark_entry__ as contract
from glamira_batch_processing_spark.plans.registry import TABLES


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from glamira_batch_processing_spark import get_spark

    spark = get_spark("bench-compare")
    qs, osql = contract.queries(), contract.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    # warm both engines
    spark.read.parquet(f"{sf}/region.parquet").count()
    for name in bench.HEADLINE:
        if name in qs:
            try:
                bench.force(qs[name](spark, "/root/testdata/sf0.001"))
            except Exception:
                pass

    report = {}
    for name in bench.HEADLINE:
        if name not in qs or name not in osql:
            continue
        # Symmetric forcing: Spark materializes every row+column into the
        # noop sink; DuckDB materializes every row via fetchall().
        t0 = time.perf_counter()
        bench.force(qs[name](spark, sf))
        t_spark = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.sql(osql[name]).fetchall()
        t_duck = time.perf_counter() - t0
        report[name] = {
            "spark_sec": round(t_spark, 3),
            "duckdb_sec": round(t_duck, 3),
            "ratio_spark_over_duckdb": round(t_spark / t_duck, 2) if t_duck > 0 else None,
        }

    total_s = sum(v["spark_sec"] for v in report.values())
    total_d = sum(v["duckdb_sec"] for v in report.values())
    print(
        json.dumps(
            {
                "sf_dir": sf,
                "spark_total_sec": round(total_s, 3),
                "duckdb_total_sec": round(total_d, 3),
                "ratio": round(total_s / total_d, 2),
                "queries": report,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
