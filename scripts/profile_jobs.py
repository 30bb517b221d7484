"""Per-job profile of one query: run it once (noop sink) in a session
with the UI enabled, then dump every Spark job's duration, stage count,
and task count from the REST status API.

Usage: python scripts/profile_jobs.py <query_name> [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as contract
from glamira_batch_processing_spark import get_spark


def main() -> None:
    name = sys.argv[1]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark("glamira-profile", **{"spark.ui.enabled": "true"})
    qs = contract.queries()
    spark.read.parquet(f"{sf}/region.parquet").count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up
    force(qs[name](spark, sf))
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    jobs0 = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    first_new = max((j["jobId"] for j in jobs0), default=-1) + 1
    t0 = time.perf_counter()
    force(qs[name](spark, sf))
    wall = time.perf_counter() - t0
    jobs = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
    )
    stages = {
        s["stageId"]: s
        for s in json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            )
        )
    }
    timed = [j for j in jobs if j["jobId"] >= first_new]
    timed.sort(key=lambda j: j["jobId"])
    print(f"{name}: wall={wall:.3f}s jobs={len(timed)} load={os.getloadavg()[0]:.2f}")
    fmt = "%Y-%m-%dT%H:%M:%S.%f"
    prev_end = None
    for j in timed:
        sub = time.mktime(time.strptime(j["submissionTime"][:-3], fmt)) + float(
            "0." + j["submissionTime"][-6:-3]
        )
        comp = time.mktime(time.strptime(j["completionTime"][:-3], fmt)) + float(
            "0." + j["completionTime"][-6:-3]
        )
        gap = f" gap={sub - prev_end:6.3f}s" if prev_end is not None else ""
        prev_end = comp
        st = [stages[s] for s in j["stageIds"] if s in stages]
        stask = sum(s["numCompleteTasks"] for s in st)
        sdesc = "; ".join(
            f"st{s['stageId']}:{s['numCompleteTasks']}t/{(s.get('executorRunTime') or 0)/1000:.2f}s"
            for s in sorted(st, key=lambda x: -(x.get("executorRunTime") or 0))[:3]
        )
        print(
            f"  job{j['jobId']:4d} {comp - sub:7.3f}s{gap} tasks={stask:4d} "
            f"[{sdesc}]"
        )


if __name__ == "__main__":
    main()
