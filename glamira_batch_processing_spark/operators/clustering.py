"""Distributed k-means (Lloyd's algorithm) over embedding columns.

Not in the reference (its only "clustering" is BigQuery table
clustering); this is the training step the IVF ANN index
(operators/similarity.py) needs for real centroids instead of seeded
ones.

Spark-first iterative shape (same discipline as
operators/components.py): per round one distributed pass computes
per-cluster (count, component-sums) PARTIALS inside an Arrow/numpy
mapInPandas kernel — k rows per partition, never row data — and the
driver reduces those k x partitions tiny rows and updates the k x dim
centroid array. Centroids travel to executors in the task closure
(broadcast analog). Rounds are driver control flow only; the corpus is
scanned once per round with no shuffle at all (the partial reduce is a
collect of control-plane-sized data, deliberately NOT a groupBy — k
and dim are tiny, a shuffle would cost more than it saves).

The oracle-facing single step (``lloyd_assign_quantized`` +
``sql_lloyd_step``) instead uses ordered-fold Column expressions with
literal centroids and integer-quantized component sums, so DuckDB
reproduces the assignment and the aggregation bit-for-bit (the same
floor(x*1e6 + 0.5) money-math trick the warehouse queries use —
float->decimal casts would diverge by 1 ulp between engines, quantized
bigint sums cannot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seed_centroids(dim: int, k: int = 8) -> list[list[float]]:
    """Deterministic md5-derived centroids (same construction as the
    hyperplane LSH planes) — embeddable as literals in any engine."""
    import hashlib

    cents = []
    for j in range(k):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"kmeans_{j}_{i}".encode()).hexdigest()
            row.append(int(h[:8], 16) / 4294967296.0 - 0.5)
        cents.append(row)
    return cents


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Ordered-fold squared L2 distance to a literal centroid —
    bit-identical in Spark and DuckDB (sequential double fold).

    Deliberately the zip_with/aggregate fold, NOT an unrolled
    per-element sum: unrolling k x dim GetArrayItem trees was measured
    (round 14) to overflow whole-stage codegen (Janino method-size
    failure -> interpreted giant tree), losing 2-4x vs this compact
    interpreted fold at dim=64."""
    c = F.array(*[F.lit(x) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lloyd_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id (ties -> lower id) as a Column expression.

    Argmin is array_min over (dist, id) structs — each distance subtree
    appears ONCE, keeping the tree linear in k (round 14; same shape as
    pq_encode_expr). The round-13 chained when() duplicated the running
    best per step (~3^k nodes of interpreted fold — the dominant cost
    of every lloyd_assign caller at bench scale). Struct ordering is
    (d, id) lexicographic, so ties break to the lower id exactly like
    the strict-< chain; an all-NULL distance row (NULL vec) compares
    by id and returns 0, the chain's behavior too.

    The coalesce is a NO-OP by construction (the struct array is a
    non-empty literal-length array of non-null structs whose id field
    is a literal int, so array_min(...).c is never null) — it exists to
    teach Catalyst that non-nullability (round 15): a join/filter on
    the assigned cell pushes an isnotnull(<this expression>) predicate
    below the consumer's exchange, where it re-evaluated the ENTIRE
    k x dim interpreted distance fold once more per row (measured in
    ann_ivfpq_residual_topk's plan: the full array_min tree duplicated
    into a pre-exchange Filter). With the provably-non-null coalesce,
    NullPropagation folds that isnotnull to true and the fold runs
    once."""
    pairs = F.array(
        *[
            F.struct(_sq_dist(vec, cent).alias("d"), F.lit(j).alias("c"))
            for j, cent in enumerate(centroids)
        ]
    )
    return F.coalesce(F.array_min(pairs).getField("c"), F.lit(0))


def lloyd_step_quantized(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    n_components: int = 4,
    scale: int = 1_000_000,
) -> DataFrame:
    """One oracle-exact Lloyd step: assign every vector to its nearest
    literal centroid, then aggregate per cluster — member count plus
    integer-quantized sums of the first ``n_components`` components
    (floor(x * scale + 0.5) as bigint: order-independent, engine-exact).
    The quantized sums pin both the assignment AND the aggregation."""
    assigned = vectors.withColumn("cluster_id", lloyd_assign(F.col(vec_col), centroids))
    aggs = [F.count("*").alias("n_members")] + [
        F.sum(
            F.floor(F.col(vec_col)[i].cast("double") * scale + F.lit(0.5)).cast("long")
        ).alias(f"qsum_{i}")
        for i in range(n_components)
    ]
    return assigned.groupBy("cluster_id").agg(*aggs)


def sql_lloyd_assign_parts(
    centroids: list[list[float]],
    vec_sql: str = "embedding",
) -> tuple[str, str]:
    """(dists-select-list, argmin-CASE) SQL fragments of
    :func:`lloyd_assign` — the assignment half of the Lloyd twin,
    reusable by any oracle that needs the engine-exact cluster id
    (ties -> lower id via strict <, same fold order as the Column
    expression)."""

    def sq_dist(cent: list[float]) -> str:
        lit = "[" + ", ".join(repr(x) for x in cent) + "]"
        return (
            f"list_reduce(list_transform(range(1, len({vec_sql}) + 1), "
            f"i -> (CAST({vec_sql}[i] AS DOUBLE) - ({lit})[i]) "
            f"* (CAST({vec_sql}[i] AS DOUBLE) - ({lit})[i])), (x, y) -> x + y)"
        )

    dists = ",\n        ".join(
        f"{sq_dist(c)} AS d{j}" for j, c in enumerate(centroids)
    )
    assign = "CASE"
    for j in range(len(centroids)):
        others = " AND ".join(
            f"d{j} <= d{m}" if m > j else f"d{j} < d{m}"
            for m in range(len(centroids))
            if m != j
        )
        assign += f" WHEN {others} THEN {j}"
    assign += " END"
    return dists, assign


def sql_lloyd_step(
    table_sql: str,
    centroids: list[list[float]],
    vec_sql: str = "embedding",
    id_sql: str = "vec_id",
    n_components: int = 4,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`lloyd_step_quantized` (same literal
    centroids, same fold order, same quantization)."""
    dists, assign = sql_lloyd_assign_parts(centroids, vec_sql)
    # outer CAST: DuckDB's SUM(BIGINT) widens to HUGEINT, which its
    # pandas bridge renders as float — pin back to BIGINT
    qsums = ",\n      ".join(
        f"CAST(SUM(CAST(FLOOR(CAST({vec_sql}[{i + 1}] AS DOUBLE) * {scale} + 0.5) AS BIGINT)) AS BIGINT)"
        f" AS qsum_{i}"
        for i in range(n_components)
    )
    return f"""
    WITH dists AS (
      SELECT {id_sql}, {vec_sql},
        {dists}
      FROM {table_sql}
    )
    SELECT {assign} AS cluster_id,
      COUNT(*) AS n_members,
      {qsums}
    FROM dists
    GROUP BY 1
    """


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 10,
    vec_col: str = "embedding",
    tol: float = 1e-6,
):
    """Production Lloyd's: Arrow/numpy assignment kernel, driver-side
    centroid update. Returns (centroids ndarray [k, dim], inertia float,
    rounds run).

    Initialization is deterministic (md5-seeded) so runs are
    reproducible without RNG state. Each round scans the corpus once
    with ZERO shuffles; executors emit k (count, sum-vector, inertia)
    partials per partition and the driver reduces them — at 100 TB the
    collected partials are k x partitions x dim doubles, control-plane
    sized, while the corpus never moves.
    """
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    # NULL embeddings would crash the numpy kernel (np.vstack on a 0-d
    # nan array); drop them — matching "skip unparseable rows" semantics
    # of the other production kernels — before anything else.
    vectors = vectors.filter(F.col(vec_col).isNotNull())
    first = vectors.select(vec_col).first()
    if first is None:
        raise ValueError("kmeans_fit: empty input")
    dim = len(first[0])
    cents = np.array(seed_centroids(dim, k), dtype=np.float64)

    partial_schema = StructType(
        [
            StructField("cluster_id", IntegerType()),
            StructField("n", LongType()),
            StructField("vec_sum", ArrayType(DoubleType())),
            StructField("inertia", DoubleType()),
        ]
    )

    inertia = float("inf")
    rounds = 0
    for _ in range(n_iter):
        C = cents.copy()  # closure-shipped snapshot for this round

        def partials(batches):
            import pandas as pd

            sums = np.zeros((k, C.shape[1]))
            counts = np.zeros(k, dtype=np.int64)
            sse = 0.0
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2
                d2 = (
                    (V * V).sum(axis=1, keepdims=True)
                    - 2.0 * (V @ C.T)
                    + (C * C).sum(axis=1)
                )
                lab = np.argmin(d2, axis=1)
                sse += float(d2[np.arange(len(lab)), lab].sum())
                for j in range(k):
                    m = lab == j
                    counts[j] += int(m.sum())
                    if m.any():
                        sums[j] += V[m].sum(axis=0)
            yield pd.DataFrame(
                {
                    "cluster_id": np.arange(k, dtype=np.int32),
                    "n": counts,
                    "vec_sum": list(sums),
                    "inertia": np.full(k, sse / k),
                }
            )

        rows = vectors.select(vec_col).mapInPandas(partials, partial_schema).collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        new_inertia = 0.0
        for r in rows:
            counts[r.cluster_id] += r.n
            sums[r.cluster_id] += np.asarray(r.vec_sum)
            new_inertia += r.inertia
        new_cents = cents.copy()
        nonempty = counts > 0
        new_cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        shift = float(np.abs(new_cents - cents).max())
        cents = new_cents
        rounds += 1
        if inertia - new_inertia <= tol and shift <= tol:
            inertia = new_inertia
            break
        inertia = new_inertia
    return cents, inertia, rounds
