"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is timed end-to-end (plan + execute + full materialization
via a noop-format write, so Catalyst cannot prune projected expressions
the way it can under ``count()``) after a warm-up pass of the session.
Run: python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship agg, the join chain, window dedupe, the
# scalar-heavy parse, plus the scale-path data-pipeline operators as
# they land. Keep this list in sync with the heaviest QUERIES entries.
HEADLINE = [
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
    "dedup_minhash_lsh_fast",
    "dedup_substring_spans",
    "dedup_cluster_components",
    "ann_cosine_topk_np",
    "ann_ivf_bucketed",
    "ann_ivf_bucketed_np",
    "text_quality_score",
    "pii_redact",
    "chunk_token_windows",
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
]


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
    # Warm up JIT/codegen per query shape on the tiny SF first, so the
    # timed run measures steady-state execution, not first-compile.
    warm_sf = "/root/testdata/sf0.001"
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    for name in HEADLINE:
        if name in qs:
            try:
                force(qs[name](spark, warm_sf))
            except Exception:
                pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        force(qs[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
