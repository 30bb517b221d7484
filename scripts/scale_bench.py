"""Scale-evidence runner: sf0.1 vs the 10x scaled set (.scale/sf1).

Usage: python scripts/make_scaled_sf.py   # once, builds .scale/sf1
       python scripts/scale_bench.py      # writes SCALE.md

For each measured query: median-of-3 wall time at both scales, the
scaling exponent  log(T_sf1/T_sf0.1) / log(10)  (1.0 = perfectly
linear, <1 = sublinear because fixed per-stage overhead amortizes,
>1 = super-linear growth — the thing this report exists to rule out),
and whether the physical plan KEPT ITS SHAPE at 10x (same multiset of
plan operators; e.g. a broadcast join silently degrading to a
sort-merge join at scale would show here).

ANN is measured through the production operators over the FULL
embeddings table of each scale with a FIXED 20-query probe set (the
registered contract queries use a fixed corpus bound, by design — they
check correctness, not scaling).
"""

from __future__ import annotations

import re
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
import __spark_entry__ as contract

SF01 = "/root/testdata/sf0.1"
SF1 = str(Path(".scale/sf1").resolve())
RUNS = 3

MEASURED = [
    "q1_pricing_summary",
    "j2_revenue_by_nation",
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
    "dedup_cluster_components",
    "dedup_substring_spans",
    "text_winnow_fingerprints",
    "boilerplate_strip_lines",
    "quality_bigram_familiarity",
    "ann_pq_adc_topk",
    "sessionize_builtin_window",
    "bpe_encode_stats",
    "pii_luhn_validate",
    "url_canonicalize_dedup",
    "pii_redact",
    "chunk_token_windows",
    "heavy_hitters_by_lang",
    "text_langid",
    "text_tfidf_topterms",
    "funnel_view_click_purchase",
    "search_bm25_topk",
    "graph_pagerank_parts",
    "quality_gopher_filter",
    "mix_importance_weights",
    "skew_salted_agg",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "multimodal_pixel_digest",
    # round-6 additions
    "q9_product_profit",
    "q18_large_volume_customer",
    "search_hybrid_rrf",
    "corpus_shuffle_deterministic",
    # round-6 TPC-H batch (q4/q6/.../q22 scan the scaled facts
    # directly; the bounded-corpus ANN queries get full-corpus
    # builders in _ann_frames instead)
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q22_dormant_customers",
    "q21_waiting_supplier",
    "q12_latency_priority_classes",
    "w7_range_interval_frame",
    "mix_temperature_sampling",
    "dedup_lsh_recall_eval",
    # round-7 additions: the remaining TPC-H shapes + variant routing
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_parts_supplier",
    "q20_potential_promotion",
    "multimodal_variant_routing",
    "multimodal_video_frames",
    # ann_sq8_topk is measured as ann_sq8_full below: the contract
    # query's probe set (vec_id % 100) grows WITH the corpus, so its
    # raw 10x timing reports designed-in quadratic pair growth (round-7
    # measured exponent +0.87), not the operator's scaling. The fixed
    # 20-probe form is the deployment shape.
    "sketch_theta_overlap",
    "qa_snapshot_drift",
    # round-8 additions: write-surface lifecycles, trained classifier
    # + eval, dedup survivor policy
    "s1_chunked_export_roundtrip",
    "s11_versioned_lifecycle",
    "quality_classifier_trained",
    "quality_classifier_eval",
    "dedup_keep_best",
    # round-10 additions: the remaining rotated-in gate queries without
    # a row here (the three streaming replay gates have their own
    # measured 10x section in SCALE.md; ann_ivfpq is measured as
    # ann_ivfpq_residual_full in _ann_frames; q1_coded_layout rides
    # along for table completeness next to its sf10 disposition)
    "q1_coded_layout",
    "s11_cdc_diff",
    "s11_incremental_view",
    "multimodal_video_meta",
    "sketch_countmin_tokens",
    "asof_forward_next_purchase",
    # round-10 new operators: the persisted-IVF index lifecycle and the
    # cluster-atomic split (shares the components substrate; the row
    # shows the split policy adds no super-linear term on top of it)
    "ann_index_persist",
    "split_leakage_safe",
    # round-11 additions: the rotated-in gate queries without a row
    # here (the rest of the round-11 window already had rows)
    "unigram_encode_stats",
    "gapfill_forward_fill",
    "rolling_7d_active_users",
    "sample_weighted_by_length",
    "cluster_label_purity",
    "multimodal_video_routing",
    "f14_json_retype",
    # round-11 new operator: the Count-Min estimate leg (broadcast
    # sketch probe beside exact counts)
    "sketch_countmin_estimate",
    # round-12 additions: the rotated-in gate queries without a row
    # here (ann_ivf_trained / ann_recall_eval are contract-bounded ANN
    # shapes — their full-corpus scaling twins live in _ann_frames —
    # but they get rows so the table covers the gate window verbatim)
    "drift_split_lang_cells",
    "winsorize_outlier_counts",
    "event_transition_matrix",
    "f13_collated_group",
    "f10_array_lambda_stats",
    "ann_ivf_trained",
    "ann_recall_eval",
    # round-12 new operators: the HLL estimate leg, Bloom membership,
    # and the two-phase token-budget selection (its oracle is the
    # naive global window; the measured Spark side is the bucket form)
    "sketch_hll_estimate",
    "sketch_bloom_membership",
    "budget_quality_select",
    # round-13 additions: the rotated-in gate queries without a row
    # here (dedup_streaming_ingest_gate has its 10x row in the
    # streaming section via scripts/streaming_scale.py; the
    # ann_cosine_topk_np ids projection rides the same bounded contract
    # shape as the np kernel, whose full-corpus twin is in _ann_frames)
    "sketch_quantile_sample",
    "anomaly_error_spike",
    "ann_recall_multiprobe",
    "ann_sq8_recall_eval",
    "ann_cosine_topk_np_ids",
    # round-13 new operators: time travel / restore (manifest-only
    # lifecycle) — the watermark gate is a streaming replay, measured
    # in the streaming section
    "s11_time_travel_restore",
]

# Round-6 (VERDICT r5 ask #3): the five queries flagged perf-weak at
# sf0.1 (>1 s absolute AND >2x their DuckDB twin). Their DuckDB oracle
# is ALSO timed at both scales: DuckDB's single-node time grows
# ~linearly while Spark's per-stage floor amortizes, so the sf1 ratio
# is the externally checkable version of the "stage-latency floor"
# argument.
WEAK_VS_DUCK = [
    "graph_pagerank_parts",
    "dedup_cluster_components",
    "glamira_e2e_revenue_rollup",
    "ann_pq_adc_topk",
    "w4_rank_dedupe_merge",
    # Round-7 (VERDICT r6 ask #4): the two queries whose sf0.1 crossing
    # lacked committed sf1 twin evidence.
    "datapipe_e2e",
    "q1_pricing_summary",
    # Round-9 (VERDICT r8 ask #3): bench-flagged at sf0.1 (2.43x, >1 s)
    # and previously missing from this table — measure, don't infer.
    "dedup_keep_best",
    # Round-11: the two new equal-work bench-flag hits from the
    # regenerated BENCH_COMPARE (dedup_lsh_recall_eval 4.28x at 1.01 s,
    # split_leakage_safe 2.22x at 3.40 s) get twin-at-10x rows.
    "dedup_lsh_recall_eval",
    "split_leakage_safe",
    # Round-12: the two new equal-work bench-flag hits from the
    # regenerated BENCH_COMPARE (ann_ivf_trained 2.78x at 4.13 s,
    # ann_recall_eval 5.32x at 1.01 s) get twin-at-10x rows.
    "ann_ivf_trained",
    "ann_recall_eval",
    # Round-13: the two new equal-work bench-flag hits from the
    # regenerated BENCH_COMPARE (ann_recall_multiprobe 4.97x at 1.88 s,
    # ann_sq8_recall_eval 6.42x at 1.04 s — the recall-eval class,
    # same stage-floor shape as ann_recall_eval) get twin-at-10x rows.
    "ann_recall_multiprobe",
    "ann_sq8_recall_eval",
]


def plan_signature(df) -> tuple[tuple[str, int], ...]:
    """Multiset of physical operator names, stripped of ids/paths."""
    text = df._jdf.queryExecution().executedPlan().toString()
    ops: dict[str, int] = {}
    for line in text.splitlines():
        m = re.match(r"^[\s:+*-]*\(?(\d+\))?\s*([A-Za-z]+[A-Za-z0-9]*)", line)
        if m:
            name = m.group(2)
            if name in {"Exchange", "BroadcastExchange", "BroadcastHashJoin",
                        "SortMergeJoin", "ShuffledHashJoin", "HashAggregate",
                        "ObjectHashAggregate", "SortAggregate", "Window",
                        "WindowGroupLimit", "TakeOrderedAndProject", "Sort",
                        "CartesianProduct", "BroadcastNestedLoopJoin",
                        "Generate", "Expand", "MapInPandas"}:
                ops[name] = ops.get(name, 0) + 1
    return tuple(sorted(ops.items()))


def _ann_frames(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from glamira_batch_processing_spark.operators.clustering import seed_centroids
    from glamira_batch_processing_spark.operators.similarity import (
        cosine_topk_np,
        ivf_search_np,
    )
    from glamira_batch_processing_spark.plans.registry import table

    vecs = table(spark, sf_dir, "embeddings")
    # FIXED probe set: the 20 replica-0 vectors present at every scale.
    qrows = (
        vecs.filter((F.col("vec_id") < 2000) & (F.col("vec_id") % 100 == 0))
        .select("vec_id", "embedding")
        .collect()
    )
    qpdf = pd.DataFrame(
        {"query_id": [r.vec_id for r in qrows], "qvec": [list(r.embedding) for r in qrows]}
    )
    cents = seed_centroids(64, 8)
    cpdf = pd.DataFrame({"centroid_id": range(len(cents)), "cvec": cents})
    from glamira_batch_processing_spark.operators.pq import (
        ivfpq_adc_topk,
        pq_codebooks,
    )
    probe = (F.col("vec_id") < 2000) & (F.col("vec_id") % 100 == 0)
    return {
        "ann_cosine_topk_np_full": cosine_topk_np(qpdf, vecs, k=10),
        "ann_ivf_np_full": ivf_search_np(vecs, cpdf, probe, k=10),
        # Full-corpus forms of the two bounded contract queries: the
        # corpus (and so the per-cell candidate sets / cluster
        # populations) scales with sf, the probe set stays fixed.
        "ann_ivfpq_residual_full": ivfpq_adc_topk(
            vecs, cents, pq_codebooks(64, 8, 16), query_pred=probe, k=5
        ),
        "ann_sq8_full": _sq8_full(vecs, probe),
        # round 12: fixed-probe form of ann_ivf_trained — the contract
        # query probes every 100th vector, so its raw 10x timing
        # reports designed-in N^2/(100K) pair growth (ann_sq8's note);
        # this is the deployment shape (train scales with the corpus,
        # the probe set doesn't).
        "ann_ivf_trained_full": _ivf_trained_full(spark, sf_dir, probe),
        # semdedup_prune is NOT measured full-corpus: with the fixed
        # 8-centroid quantizer its pairwise term grows as N^2/k by
        # construction — the deployment answer is k ~ N/target_size
        # (constant cluster population => linear pairwise; SCALE.md),
        # so a fixed-k 10x timing would report a designed-out N^2.
    }


def _ivf_trained_full(spark, sf_dir, probe):
    from glamira_batch_processing_spark.plans.retrieval_queries import (
        ivf_trained_topk,
    )

    return ivf_trained_topk(spark, sf_dir, probe)


def _sq8_full(vecs, probe):
    from pyspark.sql import functions as F

    from glamira_batch_processing_spark.operators.sq import sq8_params, sq8_topk

    params = sq8_params(vecs)
    queries_df = vecs.filter(probe).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return sq8_topk(vecs, queries_df, params, k=10)


def main() -> None:
    from glamira_batch_processing_spark import get_spark

    spark = get_spark("scale-bench")
    qs = contract.queries()

    # Builders, NOT pre-built frames: operators with eager
    # localCheckpoint (connected components) do their real work at
    # DataFrame CONSTRUCTION, so construction must sit inside the
    # timed region (bench.py does the same). Measured: pre-building
    # frames made dedup_cluster_components read as 0.05 s.
    builders: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        builders[sf_label] = {
            n: (lambda n=n, d=sf_dir: qs[n](spark, d)) for n in MEASURED
        }
        builders[sf_label].update(
            {n: (lambda n=n, d=sf_dir: _ann_frames(spark, d)[n])
             for n in ("ann_cosine_topk_np_full", "ann_ivf_np_full",
                       "ann_ivfpq_residual_full", "ann_sq8_full")}
        )

    # Warm code paths on the tiny SF.
    for n in MEASURED:
        bench.force(qs[n](spark, "/root/testdata/sf0.001"))

    results: dict[str, dict] = {}
    for name in builders["sf0.1"]:
        row: dict = {}
        for sf_label in ("sf0.1", "sf1"):
            # A query that persists internally (datapipe_e2e) must not
            # serve cached fragments to later queries or later runs.
            spark.catalog.clearCache()
            ts = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                bench.force(builders[sf_label][name]())
                ts.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            # Error-bar discipline (VERDICT r5 ask #8): a cell whose
            # spread exceeds half its median is re-measured with extra
            # reps so the exponent table stays load-bearing.
            while (
                statistics.stdev(ts) > statistics.median(ts) / 2
                and len(ts) < RUNS + 4
            ):
                t0 = time.perf_counter()
                bench.force(builders[sf_label][name]())
                ts.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            # MIN across reps (round-7, same rationale as
            # bench_compare.py): this box's co-tenant load is strictly
            # additive noise and can quadruple a cell (a 1.5 s query
            # measured 7.0 s mid-run); the minimum is the consistent
            # estimator of uncontended runtime, and exponents are only
            # meaningful on uncontended numbers. The spread still rides
            # along so contended cells stay self-diagnosing.
            row[sf_label] = min(ts)
            row[f"{sf_label}_stdev"] = statistics.stdev(ts)
        import math

        row["exponent"] = math.log(row["sf1"] / row["sf0.1"]) / math.log(10)
        row["plan_same"] = plan_signature(builders["sf0.1"][name]()) == plan_signature(
            builders["sf1"][name]()
        )
        results[name] = row
        print(
            f"{name:32s} sf0.1 {row['sf0.1']:7.2f}s  sf1 {row['sf1']:8.2f}s  "
            f"exp {row['exponent']:+.2f}  plan_same={row['plan_same']}"
        )

    import os

    load1, load5, load15 = os.getloadavg()
    lines = [
        "## Measured: sf0.1 vs sf1 (10x) scaling evidence",
        "",
        f"Run-end ambient load (co-tenant box, 32 cores): "
        f"{load1:.1f} / {load5:.1f} / {load15:.1f} (1/5/15 min). "
        "This machine carries variable co-tenant CPU load; cells whose "
        "stddev rivals their median were measured under contention — "
        "cross-check the committed history before reading a slow cell "
        "as a regression.",
        "",
        "Generated by `scripts/scale_bench.py` over `.scale/sf1` "
        "(10x key-shifted replicas of the driver's sf0.1, built by "
        "`scripts/make_scaled_sf.py`; facts scale, dims don't; replica "
        "texts are stopword-preserving word-mutated so dedup structure "
        "scales linearly; embeddings are rotation-decorrelated).",
        "",
        f"Min of {RUNS}+ runs per cell (the box's co-tenant load is additive noise; stdev reported). Exponent = log10(T_sf1/T_sf0.1): "
        "1.0 = linear, <1 = sublinear (fixed overhead amortizing), "
        ">1 = super-linear (a scale problem). `plan same` = the physical "
        "operator multiset is identical at both scales (no silent "
        "broadcast->shuffle degradation).",
        "",
        "| query | sf0.1 (s) | sf1 (s) | exponent | plan same |",
        "|---|---|---|---|---|",
    ]
    for name, row in sorted(results.items(), key=lambda kv: -kv[1]["exponent"]):
        lines.append(
            f"| {name} | {row['sf0.1']:.2f} ±{row['sf0.1_stdev']:.2f} "
            f"| {row['sf1']:.2f} ±{row['sf1_stdev']:.2f} "
            f"| {row['exponent']:+.2f} | {'yes' if row['plan_same'] else 'NO'} |"
        )
    # -- weak-query DuckDB twin ratios at both scales ---------------------
    import duckdb

    osql = contract.oracle_sql()
    duck_rows = []
    for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        con = duckdb.connect()
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            p = Path(sf_dir) / f"{t}.parquet"
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        for name in WEAK_VS_DUCK:
            ts = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.sql(osql[name]).fetchall()
                ts.append(time.perf_counter() - t0)
            results[name][f"duck_{sf_label}"] = min(ts)  # symmetric min
        con.close()
    for name in WEAK_VS_DUCK:
        r = results[name]
        duck_rows.append(
            f"| {name} | {r['sf0.1']:.2f} | {r['duck_sf0.1']:.2f} "
            f"| {r['sf0.1'] / r['duck_sf0.1']:.2f}x "
            f"| {r['sf1']:.2f} | {r['duck_sf1']:.2f} "
            f"| {r['sf1'] / r['duck_sf1']:.2f}x |"
        )

    worst = max(results.values(), key=lambda r: r["exponent"])["exponent"]
    lines += [
        "",
        f"Worst exponent this run: {worst:+.2f}. "
        "Anything materially above 1.0 is a scale bug; sub-1.0 values "
        "mean Spark's per-stage overhead dominated the sf0.1 number "
        "(and the driver's sf0.1 tables are single parquet files, so "
        "several queries are scan-parallelism-bound there; the 10x set "
        "is multi-file and can even run FASTER).",
        "",
        "Interpreting `plan same = NO`: a row flips when Catalyst's "
        "size-based join strategy changes between scales. For the LSH rows (dedup_minhash_lsh, its fast twin, and dedup_lsh_recall_eval — the candidate-pair side grows with the corpus), pagerank (final mass-table re-attach outgrows broadcast -> SMJ), q18 (the HAVING-survivor semi-join side outgrows broadcast), q4/q12 (the EXISTS/delay-class semi-join sides are fact-derived; verified round 10) "
        "queries and the order-flatten carts join this is the CORRECT "
        "choice, not degradation — the build side is a self-join/fact "
        "aggregate that grows with the data, so it outgrows the "
        "broadcast threshold and must sort-merge at scale (verified: "
        "sf0.1 BroadcastHashJoin -> sf1 SortMergeJoin, identical "
        "Generate/Aggregate structure otherwise). The check exists to "
        "catch the opposite: a bounded DIMENSION silently degrading "
        "off its broadcast path — no dim join does.",
        "",
        "### Perf-weak queries vs their DuckDB twin at 10x",
        "",
        "Every query ever flagged perf-weak at sf0.1 (>1 s AND >2x DuckDB, accumulated across rounds) re-timed "
        "against the SAME DuckDB oracle SQL at both scales (min of "
        f"{RUNS}). Spark's per-stage floor amortizes with data volume "
        "while DuckDB grows ~linearly, so the sf1 ratio is the "
        "externally checkable form of the floor argument: a ratio that "
        "falls toward (or under) 2x at 10x volume confirms the sf0.1 "
        "flag was a toy-scale artifact, not a scale defect.",
        "",
        "| query | spark sf0.1 | duck sf0.1 | ratio sf0.1 "
        "| spark sf1 | duck sf1 | ratio sf1 |",
        "|---|---|---|---|---|---|---|",
        *duck_rows,
        "",
    ]
    # SCALE.md's head and tail are hand-written; this script owns ONLY
    # the region between the scale-bench markers (the tail carries the
    # hand-written q1 crossing/profile notes and the shuffle-audit
    # section, which a naive truncate-at-marker rewrite used to eat).
    begin = "<!-- scale-bench:begin -->"
    end = "<!-- scale-bench:end -->"
    doc = Path("SCALE.md").read_text()
    if begin not in doc or end not in doc:
        raise SystemExit("SCALE.md scale-bench markers missing; refusing to rewrite")
    head, rest = doc.split(begin, 1)
    _, tail = rest.split(end, 1)
    Path("SCALE.md").write_text(
        head + begin + "\n" + "\n".join(lines).rstrip() + "\n\n" + end + tail
    )
    print("updated SCALE.md measurement section")


if __name__ == "__main__":
    main()
