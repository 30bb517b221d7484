"""Simulate the external driver's correctness gate.

Usage: python scripts/driver_sim.py [sf_dir] [--only name1,name2,...]
                                    [--json DRIVERSIM_rN.json]
Runs entry() smoke + every queries() entry vs its oracle_sql() via
DuckDB, order-insensitive full-precision comparison. Exit 1 on any
mismatch. --only restricts to a comma-separated subset (skips the
entry smoke) for fast iteration on specific queries.

--json PATH (VERDICT r11 ask #5) writes/merges a machine-checkable
per-round artifact: per-query status at each scale the battery ran,
so the "ALL MATCH at N scales" claim is a committed JSON record
instead of SCALE.md prose. One run appends one scale entry (keyed by
the sf dir); re-running the same scale overwrites that entry.
"""

from __future__ import annotations

import datetime
import json
import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as contract
from glamira_batch_processing_spark.plans.registry import TABLES


def norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if math.isnan(v) else repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def main() -> int:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    json_path: Path | None = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = Path(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        # The default 1g driver heap OOMs on the 10x (.scale/sf1)
        # cross-scale runs; the driver's own harness uses a larger
        # heap too, so match session.py's sizing.
        .config("spark.driver.memory", "8g")
        .appName("driver-sim")
        .getOrCreate()
    )
    if only is None:
        rows = contract.entry(spark).collect()
        print(f"ENTRY smoke: rows={len(rows)}")
        assert len(rows) > 0

    qs, osql = contract.queries(), contract.oracle_sql()
    if only is not None:
        unknown = only - set(qs)
        assert not unknown, f"--only names not registered: {sorted(unknown)}"
        qs = {n: f for n, f in qs.items() if n in only}
    con = duckdb.connect()
    for t in TABLES:
        # Driver testdata is one file per table; Spark-written sets
        # (.scale/sf1) are a directory of part files.
        p = Path(sf) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    fails = []
    record: dict[str, dict] = {}
    for name, fn in sorted(qs.items()):
        if name not in osql:
            n = fn(spark, sf).count()
            print(f"ROWS-ONLY {name}: rows={n}")
            record[name] = {"status": "rows_only", "rows": n}
            continue
        spdf = fn(spark, sf).toPandas()
        dkdf = con.sql(osql[name]).df()
        sc, dc = sorted(spdf.columns), sorted(dkdf.columns)
        srows = sorted(
            tuple(norm(v) for v in r)
            for r in spdf[sc].itertuples(index=False, name=None)
        )
        drows = sorted(
            tuple(norm(v) for v in r)
            for r in dkdf[dc].itertuples(index=False, name=None)
        )
        ok = sc == dc and srows == drows
        print(f"{'PASS' if ok else 'FAIL'} {name}: rows={len(srows)}/{len(drows)}")
        record[name] = {
            "status": "pass" if ok else "FAIL",
            "rows": len(srows),
            "oracle_rows": len(drows),
        }
        if not ok:
            fails.append(name)
            if sc != dc:
                print(f"  cols spark={sc}\n  cols duck ={dc}")
            else:
                for i, (a, b) in enumerate(zip(srows, drows)):
                    if a != b:
                        print(f"  first diff row {i}:\n   spark={a}\n   duck ={b}")
                        break
    print("RESULT:", "ALL MATCH" if not fails else f"MISMATCH: {fails}")
    if json_path is not None:
        doc: dict = {"scales": {}}
        if json_path.exists():
            doc = json.loads(json_path.read_text())
        existing = doc.get("scales", {}).get(sf)
        if (
            only is not None
            and isinstance(existing, dict)
            and existing.get("only_subset") is None
        ):
            # ADVICE r12: a --only subset run must never clobber a
            # recorded FULL-battery entry for the same scale — an
            # "ALL MATCH" over 1 query silently replacing an
            # "ALL MATCH" over 185. Use a separate --json path for
            # subset evidence (the committed addendum-file pattern) or
            # rerun the full battery.
            print(
                f"REFUSING to overwrite full-battery entry for {sf} "
                f"with a --only subset run; artifact unchanged "
                f"(write subsets to an addendum file instead)"
            )
            return 1 if fails else 0
        n_pass = sum(1 for r in record.values() if r["status"] == "pass")
        n_rows = sum(1 for r in record.values() if r["status"] == "rows_only")
        doc["scales"][sf] = {
            "result": "ALL MATCH" if not fails else f"MISMATCH: {fails}",
            "n_queries": len(record),
            "n_oracle_pass": n_pass,
            "n_rows_only": n_rows,
            "n_fail": len(fails),
            "only_subset": sorted(only) if only is not None else None,
            "queries": record,
        }
        json_path.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
        print(f"wrote {json_path} [{sf}]")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
