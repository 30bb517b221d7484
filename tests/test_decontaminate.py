"""Benchmark decontamination: semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from glamira_batch_processing_spark.operators.decontaminate import (
    benchmark_shingles,
    contamination_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_leak_flagged(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # exact leak
            (2, "completely different words about spark plans here"),
            (3, "the quick brown fox sat still all day long today"),  # partial
        ],
    )
    out = {
        r["doc_id"]: r
        for r in contamination_stats(train, bench, n=3, threshold=0.5).collect()
    }
    assert out[1]["is_contaminated"] and out[1]["contamination_ratio"] == 1.0
    assert not out[2]["is_contaminated"] and out[2]["n_overlap"] == 0
    # doc 3 shares only the leading 2 shingles of 7 -> below threshold
    assert not out[3]["is_contaminated"]
    assert 0 < out[3]["n_overlap"] < out[3]["n_shingles"]


def test_short_docs_have_no_row(spark):
    bench = _docs(spark, [(100, "a b c d")])
    train = _docs(spark, [(1, "a b"), (2, "a b c d")])
    got = contamination_stats(train, bench, n=3).collect()
    assert [r["doc_id"] for r in got] == [2]  # doc 1: < n words, no shingles


def test_overlap_counts_distinct_shingles(spark):
    # repeated phrase in the training doc must count once
    bench = _docs(spark, [(100, "x y z")])
    train = _docs(spark, [(1, "x y z x y z x y z")])
    row = contamination_stats(train, bench, n=3).collect()[0]
    # shingles of doc 1: {x y z, y z x, z x y} -> overlap only "x y z"
    assert row["n_shingles"] == 3 and row["n_overlap"] == 1


def test_probe_is_broadcast_no_nested_loop(spark):
    """The benchmark probe must be a broadcast hash join on the shingle
    key — never a shuffle of the corpus side, never pairwise."""
    bench = _docs(spark, [(100, "a b c d e f")])
    train = _docs(spark, [(i, f"w{i} a b c d") for i in range(50)])
    df = contamination_stats(train, bench)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_benchmark_shingles_distinct(spark):
    bench = _docs(spark, [(1, "a b c d"), (2, "a b c")])
    got = {r["shingle"] for r in benchmark_shingles(bench, n=3).collect()}
    assert got == {"a b c", "b c d"}
