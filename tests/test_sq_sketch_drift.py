"""Round-7 additions: SQ8 scalar quantization, theta-sketch set
algebra, and the snapshot-drift audit."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from glamira_batch_processing_spark.operators.sq import (
    sq8_encode,
    sq8_params,
    sq8_topk,
)
from glamira_batch_processing_spark.operators.sketches import kmv_theta_ops


def _vec_df(spark, rng, n=40, d=8):
    rows = [
        (i, [float(x) for x in rng.uniform(-2, 3, d)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_sq8_codes_bounded_and_reconstruction_tight(spark):
    """Codes live in [0,255]; dequantization error per dimension is at
    most half a quantization step of that dimension's range."""
    rng = np.random.default_rng(7)
    df, rows = _vec_df(spark, rng)
    params = sq8_params(df, "embedding")
    got = sq8_encode(df, params).collect()
    V32 = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    mns, mxs = V32.min(axis=0), V32.max(axis=0)
    by_id = {r[0]: V32[i] for i, r in enumerate(rows)}
    for row in got:
        codes = np.array(row.codes, dtype=np.float64)
        assert codes.min() >= 0 and codes.max() <= 255
        deq = mns + codes * (mxs - mns) / 255.0
        step = (mxs - mns) / 255.0
        assert np.all(np.abs(deq - by_id[row.vec_id]) <= step / 2 + 1e-9)


def test_sq8_topk_matches_numpy_brute_force(spark):
    """Top-k over SQ8 codes == numpy brute force over the SAME
    dequantized vectors (ranking in exact micro-units, ties by id)."""
    rng = np.random.default_rng(11)
    df, rows = _vec_df(spark, rng, n=60, d=8)
    params = sq8_params(df, "embedding")
    queries = df.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = sq8_topk(df, queries, params, k=5).collect()

    # the Spark column is array<float>: truncate to float32 first, then
    # do the arithmetic in float64 exactly as the operator does
    V = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    mns, mxs = V.min(axis=0), V.max(axis=0)
    codes = np.clip(np.floor((V - mns) * 255.0 / (mxs - mns) + 0.5), 0, 255)
    deq = mns + codes * (mxs - mns) / 255.0
    def left_fold_sq_l2(q, v):
        # the operator folds left-to-right (numpy .sum() is pairwise —
        # off by an ulp, which the micro-unit floor would expose)
        acc = 0.0
        for a, b in zip(q, v):
            acc += (a - b) * (a - b)
        return acc

    expect = {}
    for qid in (0, 20, 40):
        d2 = [
            int(np.floor(left_fold_sq_l2(V[qid], deq[j]) * 1e6 + 0.5))
            for j in range(len(rows))
        ]
        order = sorted((d2[j], j) for j in range(len(rows)) if j != qid)[:5]
        expect[qid] = [(j, r + 1, d) for r, (d, j) in enumerate(order)]
    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.rank, r.adc_q1e6))
    for qid, exp in expect.items():
        assert sorted(got_by_q[qid], key=lambda t: t[1]) == exp


def test_kmv_theta_ops_exact_when_k_covers_sets(spark):
    """With k >= |A union B| the sketch IS the set: n_common and
    jaccard_k reduce to exact values."""
    a = spark.createDataFrame([(i,) for i in range(30)], "v long")
    b = spark.createDataFrame([(i,) for i in range(20, 50)], "v long")
    row = kmv_theta_ops(a, F.col("v"), b, F.col("v"), k=64).collect()[0]
    # |A|=30, |B|=30, |A∩B|=10, |A∪B|=50
    assert row.k_used == 50
    assert row.n_common == 10
    assert row.jaccard_k == pytest.approx(10 / 50)
    # estimates are deterministic functions of the state
    assert row.est_union == pytest.approx((50 - 1) / row.theta)
    assert row.est_intersect == pytest.approx(10 / row.theta)


def test_kmv_theta_ops_estimates_reasonable(spark):
    """With k << distinct the Jaccard estimate lands near truth
    (deterministic hash, so this is a fixed assertion, not flaky)."""
    a = spark.createDataFrame([(i,) for i in range(1000)], "v long")
    b = spark.createDataFrame([(i,) for i in range(500, 1500)], "v long")
    row = kmv_theta_ops(a, F.col("v"), b, F.col("v"), k=128).collect()[0]
    # true Jaccard = 500/1500 = 0.333
    assert 0.15 < row.jaccard_k < 0.55
    assert 800 < row.est_union < 2300


def test_qa_snapshot_drift_invariants(spark):
    from glamira_batch_processing_spark.plans.audit_qa_queries import (
        qa_snapshot_drift,
    )

    rows = qa_snapshot_drift(spark, "/root/testdata/sf0.001").collect()
    assert rows, "bucket grid must be non-empty"
    t_old = sum(r.n_old for r in rows)
    t_new = sum(r.n_new for r in rows)
    assert t_old > 0 and t_new > 0
    last = max(rows, key=lambda r: r.bucket)
    # CDFs meet at the top bucket: exact-integer KS gap is 0 there
    assert last.ks_scaled == 0
    for r in rows:
        assert r.ks_scaled >= 0
        assert r.chi2_term_q1e6 is None or r.chi2_term_q1e6 >= 0
        if r.n_old:
            assert r.share_old_ppm == r.n_old * 1000000 // t_old
