"""Flagship scale evidence at sf10 (100x the driver's sf0.1 set).

VERDICT r10 ask #7: the two flagships — ``glamira_pipeline_e2e`` (the
whole-warehouse DAG) and ``datapipe_e2e`` (the whole-training-data
pipeline) — are the queries a user actually runs, and their committed
scale evidence stopped at sf1. This runs both at sf0.1, sf1 (.scale/sf1)
and sf10 (.scale/sf10), recording wall time (median of RUNS) and plan
shape stability, q1-crossing style.

Usage:
  python scripts/make_scaled_sf.py 10  .scale/sf1    # once
  python scripts/make_scaled_sf.py 100 .scale/sf10   # once (~GBs)
  python scripts/flagship_sf10.py [--json FLAGSHIP_SCALE.json]

Prints a markdown table for SCALE.md. With --json (VERDICT r11 ask #8)
also writes a committed machine-diffable record (query, per-scale
median seconds, plan-stability booleans, loadavg) so cross-round
flagship trends diff the way BENCH_COMPARE does.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
import __spark_entry__ as contract
from scripts.scale_bench import plan_signature

SCALES = (
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", str(Path(".scale/sf1").resolve())),
    ("sf10", str(Path(".scale/sf10").resolve())),
)
FLAGSHIPS = ("glamira_pipeline_e2e", "datapipe_e2e")
RUNS = 3


def main() -> None:
    from glamira_batch_processing_spark import get_spark

    spark = get_spark("flagship-sf10")
    qs = contract.queries()

    # Warm code paths on the tiny SF (AQE recompiles per input size,
    # but the Python-side plan construction and JVM classes warm here).
    for n in FLAGSHIPS:
        bench.force(qs[n](spark, "/root/testdata/sf0.001"))

    rows = []
    for name in FLAGSHIPS:
        times: dict[str, float] = {}
        sigs: dict[str, tuple] = {}
        for label, sf_dir in SCALES:
            if not Path(sf_dir).exists():
                print(f"SKIP {label}: {sf_dir} missing", file=sys.stderr)
                continue
            bench.force(qs[name](spark, sf_dir))  # warm at target SF
            reps = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                bench.force(qs[name](spark, sf_dir))
                reps.append(time.perf_counter() - t0)
            times[label] = statistics.median(reps)
            sigs[label] = plan_signature(qs[name](spark, sf_dir))
        same_01_1 = "same" if sigs.get("sf0.1") == sigs.get("sf1") else "DIFF"
        same_1_10 = "same" if sigs.get("sf1") == sigs.get("sf10") else "DIFF"
        rows.append((name, times, same_01_1, same_1_10, sigs))

    json_path = None
    if "--json" in sys.argv:
        json_path = Path(sys.argv[sys.argv.index("--json") + 1])
        doc = {
            "runs": RUNS,
            "loadavg_1m": round(os.getloadavg()[0], 2),
            "flagships": {
                name: {
                    "median_sec": {k: round(v, 2) for k, v in t.items()},
                    "plan_stable_sf01_to_sf1": s01 == "same",
                    "plan_stable_sf1_to_sf10": s110 == "same",
                }
                for name, t, s01, s110, _ in rows
            },
        }
        json_path.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
        print(f"wrote {json_path}", file=sys.stderr)

    print(f"loadavg_1m={os.getloadavg()[0]:.2f} runs={RUNS}")
    print("| query | sf0.1 | sf1 | sf10 | plan sf0.1->sf1 | plan sf1->sf10 |")
    print("|---|---|---|---|---|---|")
    for name, t, s01, s110, _ in rows:
        print(
            f"| {name} | {t.get('sf0.1', float('nan')):.2f} "
            f"| {t.get('sf1', float('nan')):.2f} "
            f"| {t.get('sf10', float('nan')):.2f} | {s01} | {s110} |"
        )
    for name, _, _, s110, sigs in rows:
        if s110 == "DIFF" and "sf1" in sigs and "sf10" in sigs:
            a, b = dict(sigs["sf1"]), dict(sigs["sf10"])
            delta = {
                k: (a.get(k, 0), b.get(k, 0))
                for k in set(a) | set(b)
                if a.get(k, 0) != b.get(k, 0)
            }
            print(f"# {name} sf1->sf10 plan delta: {delta}")


if __name__ == "__main__":
    main()
