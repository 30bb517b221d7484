"""10x streaming-replay scale evidence (VERDICT r9 ask #5).

Runs the three stateful-streaming gate queries once at the 10x scaled
set (.scale/sf1, built by scripts/make_scaled_sf.py), verifies each
against its DuckDB oracle (the same order-insensitive full-precision
compare driver_sim uses), and reports per gate: input rows, emitted
rows, the number of micro-batches the GroupState crossed (distinct
batch_id in the replay sink), and wall time. Prints one JSON line for
the SCALE.md streaming section.

Usage: python scripts/streaming_scale.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as contract
from glamira_batch_processing_spark.plans.registry import TABLES
from scripts.driver_sim import norm

GATES = [
    "sessionize_streaming_gate",
    "funnel_streaming_gate",
    "alerts_streaming_gate",
    # round 12: incremental LSH dedup-at-ingest replay (persistent
    # VersionedTable signature state instead of GroupState — the
    # batch_id column in its replay sink counts micro-batches the
    # same way)
    "dedup_streaming_ingest_gate",
    # round 13: watermarked tumbling-window aggregation in append mode
    # with displaced-straggler late data (windowed agg state instead
    # of GroupState; batch_id in the sink counts micro-batches)
    "watermark_late_data_gate",
    # round 13: stream-stream interval join (two file sources, view
    # side delivered one chunk late so matches require cross-batch
    # join state)
    "interval_join_streaming_gate",
]


def scratch_root(name: str, sf_dir: str) -> Path:
    """The gate query's per-(query, sf, pid) scratch dir — recomputed
    here (same pid) so the replay sink's batch_ids can be inspected
    after the query returns. Mirrors plans/lifecycle_queries._scratch."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return (
        Path(tempfile.gettempdir())
        / "spark_graft_scratch"
        / f"{name}-{tag}-{os.getpid()}"
    )


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else str(Path(".scale/sf1").resolve())
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("streaming-scale")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    n_events = con.sql("SELECT COUNT(*) FROM events").fetchone()[0]
    # ADVICE r12: the dedup gate streams corpus() = documents PLUS the
    # injected near/exact duplicate rows (~+24.7%), so the replay
    # throughput denominator must count the corpus CTE, not the raw
    # documents table.
    from glamira_batch_processing_spark.plans.datapipe_queries import corpus_cte

    n_corpus = con.sql(
        f"WITH {corpus_cte()} SELECT COUNT(*) FROM corpus"
    ).fetchone()[0]
    # the stream-stream join gate streams only the view + purchase
    # subsets (two file sources) — count what is actually staged.
    n_join_sides = con.sql(
        "SELECT COUNT(*) FROM events WHERE event_type IN ('view', 'purchase')"
    ).fetchone()[0]

    qs, osql = contract.queries(), contract.oracle_sql()
    report: dict[str, dict] = {}
    fails: list[str] = []
    for name in GATES:
        t0 = time.monotonic()
        spdf = qs[name](spark, sf).toPandas()
        wall = time.monotonic() - t0
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
        if not ok:
            fails.append(name)
        sink = scratch_root(name, sf) / "out"
        batches = (
            spark.read.parquet(str(sink))
            .select("batch_id")
            .distinct()
            .count()
        )
        report[name] = {
            "oracle_match": ok,
            # the dedup gate streams the documents-derived corpus
            # (incl. injected duplicates); the join gate streams the
            # view+purchase subsets; the event gates stream the events
            # table
            "input_rows": (
                n_corpus
                if name.startswith("dedup_")
                else n_join_sides
                if name.startswith("interval_join")
                else n_events
            ),
            "result_rows": len(srows),
            "state_crossing_batches": batches,
            "replay_wall_sec": round(wall, 2),
        }
        print(
            f"{'PASS' if ok else 'FAIL'} {name}: rows={len(srows)}/{len(drows)} "
            f"batches={batches} wall={wall:.1f}s",
            file=sys.stderr,
        )
    print(json.dumps({"sf_dir": sf, "events_rows": n_events, "gates": report}))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
