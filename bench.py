"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>, ...}

Two tiers (round-6 bench hygiene — VERDICT r5 ask #4):

* ``HEADLINE_PINNED`` — the exact 20-query set benched since round 3.
  Its total (``headline_pinned_total``) is comparable across rounds; new
  operators must NOT be added here, or cross-round comparisons break.
* ``EXTENDED`` — every operator added to the headline after round 3.
  Its total grows as coverage grows and is reported separately
  (``extended_total``) so coverage growth cannot read as a regression.

``value`` remains the grand total over both tiers (the shape rounds 1-5
reported) so the driver's single-number trend stays continuous.

Each query is timed end-to-end (plan + execute + full materialization
via a noop-format write, so Catalyst cannot prune projected expressions
the way it can under ``count()``) after an untimed warm-up pass of the
SAME query at the TARGET SF (round 7: AQE plan shapes differ by input
size, so only a target-SF pass compiles the measured codegen shapes).
Per-query times are the MEDIAN of ``SPARK_GRAFT_BENCH_REPS`` (default 3)
back-to-back reps, with the sample standard deviation reported in
``stddev`` — the round-5 driver artifact carried contention noise the
single-shot timing could not distinguish from regression (VERDICT r5
ask #2); error bars make the artifact self-diagnosing.
Run: python bench.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

# PINNED: the round-3 headline, frozen. Do not add entries (new
# operators go in EXTENDED); totals over this list are comparable to
# BENCH_r03.json and every later round.
HEADLINE_PINNED = [
    "q1_pricing_summary",
    "j2_revenue_by_nation",
    "w1_latest_order_per_customer",
    "w4_rank_dedupe_merge",
    "f3_parse_localized_prices",
    "glamira_e2e_order_flatten",
    "glamira_e2e_revenue_rollup",
    "glamira_pipeline_e2e",
    "datapipe_e2e",
    "sessionize_gap30m",
    "asof_join_last_purchase",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "ann_cosine_topk_np",
    "ann_ivf_bucketed",
    "ann_ivf_bucketed_np",
    "text_quality_score",
    "pii_redact",
    "chunk_token_windows",
]

# EXTENDED: operators that joined the headline after round 3. Reported
# as a separate total so coverage growth never reads as a slowdown.
EXTENDED = [
    "dedup_minhash_lsh_fast",
    "dedup_substring_spans",
    "text_winnow_fingerprints",
    "boilerplate_strip_lines",
    "quality_bigram_familiarity",
    "ann_pq_adc_topk",
    "bpe_encode_stats",
    "text_tfidf_topterms",
    "funnel_view_click_purchase",
    "q3_shipping_priority",
    "ohlc_hourly_bars",
    "rolling_7d_active_users",
    "mix_resample_sources",
    "search_bm25_topk",
    "graph_pagerank_parts",
    "quality_gopher_filter",
    "mix_importance_weights",
    # round 7: the four TPC-H shapes completing the 22-query suite
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_parts_supplier",
    "q20_potential_promotion",
    # round 7: SQ8 quantized ANN, theta-sketch set algebra, drift audit
    "ann_sq8_topk",
    "sketch_theta_overlap",
    "qa_snapshot_drift",
    # round 7: AVI/MJPEG sampled-frame pixel decode
    "multimodal_video_frames",
    # round 8: write-surface lifecycles (chunked-export roundtrip,
    # VersionedTable DML), trained quality classifier + held-out eval,
    # dedup survivor policy
    "s1_chunked_export_roundtrip",
    "s11_versioned_lifecycle",
    "quality_classifier_trained",
    "quality_classifier_eval",
    "dedup_keep_best",
    # round 10: mirror the gate-window rotation (VERDICT r9 ask #8) —
    # the batch queries that joined the gate join the extended bench so
    # BENCH_r10 covers what the gate covers. The three streaming replay
    # gates stay OUT by design: they are gate harnesses (scratch writes
    # + availableNow replays), not engine throughput.
    "q1_coded_layout",
    "q8_market_share",
    "s11_cdc_diff",
    "s11_incremental_view",
    "asof_forward_next_purchase",
    "multimodal_video_meta",
    "ann_ivfpq_residual_topk",
    "sketch_countmin_tokens",
    # round 11: mirror the gate-window rotation — the round-11 swap-ins
    # not already benched join here (same policy as round 10; the
    # streaming replay gates stay out by design).
    "unigram_encode_stats",
    "gapfill_forward_fill",
    "f14_json_retype",
    "dedup_lsh_recall_eval",
    "cluster_label_purity",
    "ann_index_persist",
    "multimodal_video_routing",
    "split_leakage_safe",
    "sample_weighted_by_length",
]

HEADLINE = HEADLINE_PINNED + EXTENDED


def force(df) -> None:
    """Execute every operator in the plan and materialize all columns.

    ``count()`` lets Catalyst drop unreferenced projections (a
    projection-only query would time the bare scan); the noop sink
    consumes every row and column without writing bytes anywhere.
    """
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from glamira_batch_processing_spark import get_spark
    from __spark_entry__ import queries

    spark = get_spark("glamira-bench")
    qs = queries()
    # Warm up JIT/codegen per query AT THE TARGET SF, immediately before
    # its timed reps. The old tiny-SF warm-up compiled the WRONG plan
    # shapes for AQE-heavy queries (plans differ by input size), so the
    # first sf0.1 execution of the warehouse DAG still paid 15-30 s of
    # whole-stage-codegen class compilation + JIT — a constant that is
    # irrelevant at 100 TB but, bleeding into the 3-rep median, made
    # `glamira_pipeline_e2e` read bimodally as 6 s or 17 s across
    # otherwise-identical quiet runs (round-7 diagnosis). One untimed
    # pass at SF_DIR per query compiles exactly the measured shapes.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    stddevs: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        try:
            force(qs[name](spark, SF_DIR))
        except Exception:
            pass
        reps: list[float] = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            force(qs[name](spark, SF_DIR))
            reps.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(reps), 4)
        stddevs[name] = round(statistics.stdev(reps), 4) if len(reps) > 1 else 0.0

    pinned_total = sum(t for n, t in timings.items() if n in HEADLINE_PINNED)
    extended_total = sum(t for n, t in timings.items() if n in EXTENDED)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Totals-first compact stdout line, kept under ~2 KB (round-7 bench
    # hygiene — the r6 driver artifact lost its per-query head to tail
    # truncation): scalars lead so a truncated capture still carries
    # them, per-query medians are compacted to ms precision, and the
    # stddev map lives only in BENCH_SUMMARY.json (written next to this
    # script and committed), which holds the full-precision record.
    summary = {
        "metric": "headline_queries_total",
        "value": round(pinned_total + extended_total, 4),
        "unit": "sec",
        "headline_pinned_total": round(pinned_total, 4),
        "extended_total": round(extended_total, 4),
        "reps": REPS,
        # Co-tenant adjudication from the artifact alone (VERDICT r10
        # ask #5): the box's 1-minute load average at measurement end.
        # Round 9 vs 10 showed a uniform ~21% same-set inflation that
        # took a prose investigation to attribute to box load; with the
        # loadavg stamped, the next judge reads it off BENCH_r*.json.
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # 2-decimal stdout precision: 58+ queries at 3 decimals ran the
        # line to within ~80 bytes of its 2 KB budget (round 10); the
        # full-precision record lives in BENCH_SUMMARY.json.
        "queries": {n: round(t, 2) for n, t in timings.items()},
    }
    # Like-for-like line (round-10 bench hygiene): when the headline
    # grows with a gate-window rotation, the raw total reads as a
    # slowdown. Compare against the latest committed BENCH_r*.json
    # over the INTERSECTION of query names so round-over-round deltas
    # are same-set by construction; adds/drops are the name diff.
    prior = sorted(Path(__file__).resolve().parent.glob("BENCH_r*.json"))
    name_diff: dict[str, list[str]] = {}
    if prior:
        try:
            prev = json.loads(prior[-1].read_text())
            # driver artifacts wrap the bench stdout line in "parsed";
            # a non-dict artifact (e.g. a bare JSON list) falls through
            # to the except arm rather than raising AttributeError
            if not isinstance(prev, dict):
                raise TypeError("prior bench artifact is not a JSON object")
            prev = prev.get("parsed", prev)
            if not isinstance(prev, dict):
                raise TypeError("prior bench 'parsed' is not a JSON object")
            pq = prev.get("queries", {})
            # The artifact's per-query values are 2-decimal stdout
            # rounding (the 2 KB line budget). The committed
            # BENCH_SUMMARY.json from the SAME run holds them at full
            # precision — use it when it provably matches the artifact
            # (same headline total and same name set), so the same-set
            # delta isn't polluted by ~±5 ms/query rounding noise.
            try:
                s = json.loads(
                    Path(__file__)
                    .resolve()
                    .parent.joinpath("BENCH_SUMMARY.json")
                    .read_text()
                )
                if (
                    isinstance(s, dict)
                    and s.get("value") == prev.get("value")
                    and set(s.get("queries", {})) == set(pq)
                ):
                    pq = s["queries"]
                    summary["sameset_prev_precision"] = "full"
            except (OSError, ValueError):
                pass
            shared = [n for n in timings if n in pq]
            summary["sameset_vs"] = prior[-1].name
            summary["sameset_n"] = len(shared)
            summary["sameset_total"] = round(sum(timings[n] for n in shared), 3)
            summary["sameset_prev_total"] = round(
                sum(float(pq[n]) for n in shared), 3
            )
            # full add/drop name lists go to BENCH_SUMMARY.json only
            # (the stdout line stays under its 2 KB budget)
            name_diff = {
                "added": sorted(set(timings) - set(pq)),
                "dropped": sorted(set(pq) - set(timings)),
            }
        except (ValueError, KeyError, TypeError, AttributeError):
            pass  # a malformed prior artifact never blocks the bench
    Path(__file__).resolve().parent.joinpath("BENCH_SUMMARY.json").write_text(
        json.dumps(
            {**summary, **name_diff, "queries": timings, "stddev": stddevs},
            indent=1
        )
        + "\n"
    )
    line = json.dumps(summary, separators=(",", ":"))
    assert len(line) < 2000, f"bench stdout line grew to {len(line)} bytes"
    print(line)


if __name__ == "__main__":
    main()
