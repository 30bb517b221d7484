"""Time one or more queries exactly as bench.py does (untimed warm-up
at the target SF, then median of N noop-sink reps), in a fresh session.

Usage: python scripts/time_query.py name1 [name2 ...] [--reps N]
       [--sf DIR] [--explain OUTDIR]

Prints one line per query: name, median, all reps, 1-min loadavg.
--explain additionally writes <OUTDIR>/<name>.txt with the
.explain("formatted") output of the query's final DataFrame.
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as contract
from glamira_batch_processing_spark import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    explain_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf = args[i + 1]; i += 2
        elif args[i] == "--explain":
            explain_dir = Path(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    spark = get_spark("glamira-time-query")
    qs = contract.queries()
    spark.read.parquet(f"{sf}/region.parquet").count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        spark.sparkContext.setJobDescription(f"time_query: {name}")
        try:
            force(qs[name](spark, sf))  # warm-up, untimed
        except Exception as e:  # noqa: BLE001
            print(f"{name}: WARMUP FAILED: {e}")
            continue
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(qs[name](spark, sf))
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        print(
            f"{name}: median={med:.3f}s reps={[round(t, 3) for t in ts]} "
            f"load={os.getloadavg()[0]:.2f}"
        )
        if explain_dir is not None:
            explain_dir.mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, sf)
            out = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            explain_dir.joinpath(f"{name}.txt").write_text(out)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
