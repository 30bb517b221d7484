"""Measure q1 on the dictionary-coded warehouse layout (VERDICT r8
ask #2 — the one untried engine-level remedy for the q1 constant).

SCALE.md's floor profile pinned q1's residual vs DuckDB to UTF8String
materialization of the two 1-char string group keys (grouped count(*)
alone cost 0.575 s at sf10 vs 0.187 s ungrouped). The warehouse-layer
remedy: staging writes ``l_returnflag``/``l_linestatus`` as tinyint
codes + two broadcast decode dims (``functions/dictcodes.py``,
gate-proven by ``q1_coded_layout``), so the hot aggregate groups on
1-byte integers and the strings materialize once per GROUP.

This script builds the coded layout ONCE per scale (write once, read
many — the deployment shape), then interleaves min-of-N timings of

  * Spark q1 on the ORIGINAL string layout (the committed baseline),
  * Spark q1 read-path on the CODED layout (agg on codes + decode),
  * DuckDB oracle on the ORIGINAL layout (the twin), and
  * DuckDB on the CODED layout (disclosure: what the twin gains from
    the same schema decision),

verifies the coded result is value-identical to the DuckDB oracle,
and prints markdown rows for SCALE.md's q1 section.

Usage: python scripts/q1_coded.py [runs=5]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
import __spark_entry__ as contract

SCALES = [
    ("sf1", Path(".scale/sf1").resolve()),
    ("sf10", Path(".scale/sf10").resolve()),
]
# The typed-coded staging projection: enum strings -> tinyint codes,
# money -> exact integer cents, shipdate kept for pushdown.
CODED_SCHEMA = (
    "l_shipdate timestamp_ntz, qty long, price_c long, disc_c long, "
    "tax_c long, l_returnflag_code tinyint, l_linestatus_code tinyint"
)


def build_coded(spark, src_dir: Path, out_dir: Path) -> None:
    from pyspark.sql import functions as F

    from glamira_batch_processing_spark.functions.dictcodes import (
        dict_encode_columns,
    )
    from glamira_batch_processing_spark.plans.core_queries import cents

    if (out_dir / "lineitem_coded.parquet" / "_SUCCESS").exists():
        return
    src = spark.read.parquet(str(src_dir / "lineitem.parquet")).select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        cents(F.col("l_extendedprice")).alias("price_c"),
        cents(F.col("l_discount")).alias("disc_c"),
        cents(F.col("l_tax")).alias("tax_c"),
        "l_shipdate",
    )
    coded, dims = dict_encode_columns(src, ["l_returnflag", "l_linestatus"])
    out_dir.mkdir(parents=True, exist_ok=True)
    coded.write.mode("overwrite").parquet(str(out_dir / "lineitem_coded.parquet"))
    for c, dim in dims.items():
        dim.write.mode("overwrite").parquet(str(out_dir / f"dim_{c}.parquet"))


def load_decode_exprs(spark, coded_dir: Path):
    """The deployment shape: decode dims are static warehouse metadata
    loaded ONCE per app (bounded collect, <=256 rows each) and decoded
    inline as literal map lookups — not re-read + broadcast per query."""
    from glamira_batch_processing_spark.functions.dictcodes import (
        decode_map_exprs,
    )

    dims = {
        c: spark.read.parquet(str(coded_dir / f"dim_{c}.parquet"))
        for c in ("l_returnflag", "l_linestatus")
    }
    return decode_map_exprs(dims)


def coded_q1(spark, coded_dir: Path, decode_exprs):
    """The coded-layout read path: identical algebra to q1, grouped on
    the tinyint codes, strings decoded once per group."""
    from pyspark.sql import functions as F

    from glamira_batch_processing_spark.plans.core_queries import (
        split_sum,
        split_total,
    )

    # declared schema (what a catalog-backed warehouse table carries):
    # skips the ~70 ms per-call footer schema inference measured on the
    # 34-file layout.
    lc = spark.read.schema(CODED_SCHEMA).parquet(
        str(coded_dir / "lineitem_coded.parquet")
    )
    price_c, disc_c, tax_c = F.col("price_c"), F.col("disc_c"), F.col("tax_c")
    agg = (
        lc.filter(F.col("l_shipdate") < F.lit("2001-09-03").cast("timestamp_ntz"))
        .groupBy("l_returnflag_code", "l_linestatus_code")
        .agg(
            F.sum("qty").alias("sq"),
            *split_sum(price_c, "sbp"),
            *split_sum(price_c * (100 - disc_c), "sdp"),
            *split_sum(price_c * (100 - disc_c) * (100 + tax_c), "sc"),
            F.count("*").alias("n"),
        )
    )
    for c, expr in decode_exprs.items():
        agg = agg.withColumn(c, expr).drop(f"{c}_code")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        (split_total("sbp").cast("double") / 100).alias("sum_base_price"),
        (split_total("sdp").cast("double") / 10000).alias("sum_disc_price"),
        (split_total("sc").cast("double") / 1000000).alias("sum_charge"),
        (F.col("sq").cast("double") / F.col("n")).alias("avg_qty"),
        (split_total("sbp").cast("double") / 100 / F.col("n")).alias("avg_price"),
        F.col("n").alias("count_order"),
    )


DUCK_CODED_SQL = """
WITH c AS (
  SELECT l_returnflag_code, l_linestatus_code, qty, price_c, disc_c, tax_c
  FROM lineitem_coded
  WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
),
agg AS (
  SELECT l_returnflag_code, l_linestatus_code,
    CAST(SUM(qty) AS DOUBLE) AS sum_qty,
    CAST(SUM(price_c) AS DOUBLE)/100 AS sum_base_price,
    CAST(SUM(price_c*(100-disc_c)) AS DOUBLE)/10000 AS sum_disc_price,
    CAST(SUM(price_c*(100-disc_c)*(100+tax_c)) AS DOUBLE)/1000000 AS sum_charge,
    CAST(SUM(qty) AS DOUBLE)/COUNT(*) AS avg_qty,
    CAST(SUM(price_c) AS DOUBLE)/100/COUNT(*) AS avg_price,
    COUNT(*) AS count_order
  FROM c GROUP BY 1, 2
)
SELECT r.l_returnflag, s.l_linestatus, sum_qty, sum_base_price,
       sum_disc_price, sum_charge, avg_qty, avg_price, count_order
FROM agg
JOIN dim_l_returnflag r USING (l_returnflag_code)
JOIN dim_l_linestatus s USING (l_linestatus_code)
"""


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from glamira_batch_processing_spark import get_spark

    spark = get_spark("q1-coded")
    q1 = contract.queries()["q1_pricing_summary"]
    osql = contract.oracle_sql()["q1_pricing_summary"]

    print("| scale | layout | spark s | duck s | spark/duck-original |")
    print("|---|---|---|---|---|")
    for label, sf_dir in SCALES:
        coded_dir = sf_dir.parent / f"{label}_coded"
        build_coded(spark, sf_dir, coded_dir)

        con = duckdb.connect()
        li = sf_dir / "lineitem.parquet"
        li_src = f"{li}/*.parquet" if li.is_dir() else str(li)
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{li_src}'")
        con.execute(
            "CREATE VIEW lineitem_coded AS SELECT * FROM "
            f"'{coded_dir}/lineitem_coded.parquet/*.parquet'"
        )
        for c in ("l_returnflag", "l_linestatus"):
            con.execute(
                f"CREATE VIEW dim_{c} AS SELECT * FROM "
                f"'{coded_dir}/dim_{c}.parquet/*.parquet'"
            )

        # correctness first: coded Spark result == DuckDB oracle, exactly
        decode_exprs = load_decode_exprs(spark, coded_dir)
        sdf = coded_q1(spark, coded_dir, decode_exprs)
        srows = [tuple(r) for r in sdf.collect()]
        orows = con.sql(osql).fetchall()
        assert canon(srows, sdf.columns) == canon(
            orows, [d[0] for d in con.sql(osql).description]
        ), f"coded layout result diverges from oracle at {label}"

        # warm-ups, then interleaved min-of-N
        bench.force(q1(spark, str(sf_dir)))
        bench.force(coded_q1(spark, coded_dir, decode_exprs))
        con.sql(osql).fetchall()
        con.sql(DUCK_CODED_SQL).fetchall()
        t_orig, t_coded, d_orig, d_coded = [], [], [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            bench.force(q1(spark, str(sf_dir)))
            t_orig.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            bench.force(coded_q1(spark, coded_dir, decode_exprs))
            t_coded.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.sql(osql).fetchall()
            d_orig.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.sql(DUCK_CODED_SQL).fetchall()
            d_coded.append(time.perf_counter() - t0)
        so, sc_, do, dc = min(t_orig), min(t_coded), min(d_orig), min(d_coded)
        print(f"| {label} | original strings | {so:.3f} | {do:.3f} | {so / do:.2f}x |")
        print(f"| {label} | coded tinyint    | {sc_:.3f} | {dc:.3f} | {sc_ / do:.2f}x |")
        con.close()


if __name__ == "__main__":
    main()
