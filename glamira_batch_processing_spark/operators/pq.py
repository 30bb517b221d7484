"""Product quantization (PQ) for approximate nearest neighbor search.

The third ANN tier next to brute-force cosine and IVF
(``operators/similarity.py``): compress each d-dim vector into m
small codes (one per d/m-dim subspace, nearest of ks codebook
centroids), then score queries against CODES via asymmetric distance
computation (ADC): the query precomputes a ks-entry distance table per
subspace and a candidate's distance is the sum of m table lookups
(Jegou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011). At 100 TB this is the memory-resident path: m bytes per
vector instead of d floats (64x smaller at d=64/m=8), so the scored
index fits executor memory where raw vectors cannot.

Engine-exact determinism (the repo's standard tricks):
- codebooks are md5-derived literals (``pq_codebooks``) — embeddable
  in any engine; swap in kmeans_fit-trained codebooks per subspace for
  production recall, the algebra is unchanged;
- every subspace distance is an ordered double fold QUANTIZED to
  integer micros (floor(x*1e6 + 0.5)) before any comparison or sum, so
  argmin ties, ADC sums, and rankings are bit-identical in DuckDB
  (float sums reorder across partitions; bigint sums cannot);
- encode and oracle share ONE relational formulation (broadcast
  centroids x quantized arg-min with lower-code tie-break);
  ``pq_encode_expr`` is the equivalent scan-fused expression form,
  kept for composition into projections — equivalence is pinned by the
  numpy-reference test. (The expression form's m*ks distance subtrees
  exceed the whole-stage-codegen method limit and run interpreted, so
  the join form is also the faster one.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUANT = 1_000_000  # micro-quantization, same as the warehouse money math


def pq_codebooks(dim: int, m: int = 8, ks: int = 16) -> list[list[list[float]]]:
    """[m][ks][dim/m] deterministic md5-derived codebook centroids
    (same construction as seed_centroids / the hyperplane planes)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    books = []
    for s in range(m):
        book = []
        for c in range(ks):
            row = []
            for i in range(ds):
                h = hashlib.md5(f"pq_{s}_{c}_{i}".encode()).hexdigest()
                row.append(int(h[:8], 16) / 4294967296.0 - 0.5)
            book.append(row)
        books.append(book)
    return books


def subspace_fold_q(term, ds: int) -> Column:
    """THE engine-exactness-critical fold, defined once: left-assoc sum
    of ``term(i)`` for i in [0, ds) — ((t0+t1)+t2)... matching DuckDB's
    list_reduce — micro-quantized floor(x*1e6 + 0.5) as bigint. Every
    PQ/IVFADC code path builds its subspace distance through this
    helper so the cross-engine bit-for-bit contract has a single
    definition to keep correct."""
    total: Column | None = None
    for i in range(ds):
        t = term(i)
        total = t if total is None else total + t
    return F.floor(total * QUANT + F.lit(0.5)).cast("long")


def _subdist_q(vec: Column, s: int, centroid: list[float]) -> Column:
    """Quantized squared L2 between subspace s of ``vec`` and a literal
    centroid: left-associated term sum -> floor(x*1e6 + 0.5) bigint.

    UNROLLED element_at arithmetic, not aggregate()/zip_with():
    higher-order array functions evaluate their lambda interpreted,
    per element — with 128 centroid distances per row that measured
    ~6x slower than the codegen'd explicit sum. The left-assoc order
    ((t1+t2)+t3)... matches DuckDB's list_reduce fold exactly."""
    ds = len(centroid)

    def term(i: int) -> Column:
        x = F.element_at(vec, s * ds + i + 1).cast("double") - F.lit(centroid[i])
        return x * x

    return subspace_fold_q(term, ds)


def pq_encode_expr(vec: Column, codebooks: list[list[list[float]]]) -> list[Column]:
    """m code Columns (nearest centroid per subspace, quantized-distance
    argmin, ties -> lower code) — a pure expression tree that fuses
    into the scan: encoding 100 TB is a zero-shuffle projection.

    The argmin is array_min over (dist, code) structs — each distance
    subtree appears ONCE, keeping the plan linear in ks (a chained
    when()-argmin duplicates the running best per step: 2^ks nodes,
    which OOMs the driver at ks=16)."""
    codes = []
    for s, book in enumerate(codebooks):
        pairs = F.array(
            *[
                F.struct(
                    _subdist_q(vec, s, cent).alias("d"), F.lit(c).alias("c")
                )
                for c, cent in enumerate(book)
            ]
        )
        codes.append(F.array_min(pairs).getField("c").alias(f"code{s}"))
    return codes


def pq_centroids_df(spark: SparkSession, codebooks: list[list[list[float]]]) -> DataFrame:
    """(s, c, cent) rows — m*ks tiny rows for the relational/ADC side."""
    rows = [
        (s, c, cent)
        for s, book in enumerate(codebooks)
        for c, cent in enumerate(book)
    ]
    return spark.createDataFrame(rows, "s int, c int, cent array<double>")


def sql_pq_centroid_values(codebooks: list[list[list[float]]]) -> str:
    """DuckDB VALUES list matching :func:`pq_centroids_df` exactly."""
    rows = []
    for s, book in enumerate(codebooks):
        for c, cent in enumerate(book):
            lst = ", ".join(repr(x) for x in cent)
            rows.append(f"({s}, {c}, [{lst}])")
    return "(VALUES " + ", ".join(rows) + ") AS cents(s, c, cent)"


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, rank, adc_q1e6): top-k candidates per
    query by ADC distance over PQ codes.

    ``queries`` must have (query_id, qvec). The corpus side never
    touches raw query vectors: candidates are scored by joining their
    (s, code) rows to the query's broadcast distance table (m*ks rows
    per query) and summing m exact bigint partials. Shuffle budget:
    one exchange for the (query, candidate) partial sum, one for the
    per-query top-k window — independent of dim.

    ``exclude_self`` drops candidates whose id equals the query_id —
    correct ONLY when queries are drawn from the corpus id space; set
    False for external query sets, where an id coincidence would
    silently exclude a legitimate neighbor.
    """
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    ds = len(codebooks[0][0])
    ks = len(codebooks[0])

    # Relational encode: corpus x broadcast centroids (m*ks tiny rows),
    # one quantized subspace distance per joined row, then a map-side-
    # combinable min-agg on (vector, subspace). The expression-tree
    # encode (pq_encode_expr) is semantically identical but its m*ks
    # distance subtrees overflow the whole-stage-codegen method limit
    # and fall back to interpreted eval — measured ~5x slower than this
    # join at sf0.1. Shuffle volume here is m compact rows per vector
    # (the size of the codes themselves).
    cents = pq_centroids_df(spark, codebooks)

    def rel_term(vec_name: str):
        def term(i: int) -> Column:
            x = F.element_at(F.col(vec_name), F.col("s") * ds + i + 1).cast(
                "double"
            ) - F.element_at(F.col("cent"), i + 1)
            return x * x

        return term

    dist_q = subspace_fold_q(rel_term(vec_col), ds)
    codes = (
        embeddings.crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col).alias("neighbor_id"),
            "s",
            (dist_q * ks + F.col("c")).alias("key"),
        )
        .groupBy("neighbor_id", "s")
        .agg((F.min("key") % ks).cast("int").alias("code"))
    )
    qtab = queries.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "s",
        F.col("c").alias("code"),
        subspace_fold_q(rel_term("qvec"), ds).alias("partial_q"),
    )

    scored = codes.join(F.broadcast(qtab), ["s", "code"])
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.groupBy("query_id", "neighbor_id").agg(
        F.sum("partial_q").alias("adc_q1e6")
    )
    w = Window.partitionBy("query_id").orderBy("adc_q1e6", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_q1e6")
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    ks: int = 16,
    n_iter: int = 8,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks: an independent k-means (``kmeans_fit``,
    zero-shuffle Lloyd rounds) per d/m-dim SUBSPACE — the training half
    of Jegou et al. 2011 that the md5-seeded ``pq_codebooks`` stand in
    for in the engine-exact contract queries. Returns the same
    ``[m][ks][d/m]`` shape, so trained codebooks drop straight into
    ``pq_adc_topk`` / ``pq_encode_expr``.

    Scale shape: m sequential fits, each scanning only its slice
    projection of the corpus (slice() fuses into the scan); every
    Lloyd round is shuffle-free (k x partitions control-plane partials)
    — training cost is m x n_iter corpus scans and nothing ever
    shuffles. Deterministic md5-seeded init, no RNG.
    """
    from .clustering import kmeans_fit

    head = embeddings.select(vec_col).first()
    if head is None:
        raise ValueError("pq_train: empty embeddings DataFrame")
    dim = len(head[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    books = []
    for s in range(m):
        sliced = embeddings.select(
            F.slice(F.col(vec_col), s * ds + 1, ds).alias("embedding")
        )
        centroids, _inertia, _rounds = kmeans_fit(
            sliced, k=ks, n_iter=n_iter, vec_col="embedding"
        )
        books.append([[float(v) for v in row] for row in centroids])
    return books


def pq_quantization_mse(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error of the PQ code assignment —
    the metric that compares codebook qualities (trained vs seeded).
    Computed as one map-side-combinable aggregate over the same
    broadcast-centroid argmin join the encoder uses."""
    spark = embeddings.sparkSession
    ds = len(codebooks[0][0])
    cents = pq_centroids_df(spark, codebooks)
    # Intentionally NOT subspace_fold_q: MSE is a quality metric
    # compared by inequality (trained < seeded), not an oracle-bitwise
    # value, so it keeps full double precision instead of the 1e-6
    # quantization.
    fold: Column | None = None
    for i in range(ds):
        x = F.element_at(F.col(vec_col), F.col("s") * ds + i + 1).cast(
            "double"
        ) - F.element_at(F.col("cent"), i + 1)
        t = x * x
        fold = t if fold is None else fold + t
    per_sub = (
        embeddings.withColumn("__rid", F.monotonically_increasing_id())
        .crossJoin(F.broadcast(cents))
        .groupBy("__rid", "s")
        .agg(F.min(fold).alias("min_d2"))
    )
    row = per_sub.agg(
        (F.sum("min_d2") / F.count("*")).alias("mse_per_subspace")
    ).first()
    return float(row["mse_per_subspace"])


def ivfpq_adc_topk(
    embeddings: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: Column | None = None,
    k: int = 5,
    exclude_self: bool = True,
    fan_out_partitions: int | None = None,
) -> DataFrame:
    """IVF + PQ with RESIDUAL encoding (Jegou et al. 2011 §IV — the
    composition FAISS calls IVFADC): assign every vector to its
    nearest coarse centroid (literal-centroid fold, scan-fused), PQ-
    encode the residual ``x - coarse[cell]``, and answer a query by
    scanning ONLY its own cell (nprobe=1), scoring candidates with an
    m-lookup asymmetric distance against the query's residual table.

    This is the true 100 TB ANN layout: the index stores m bytes per
    vector, the coarse cells bound the scan to ~N/K candidates, and
    residual encoding recovers most of the accuracy plain PQ loses to
    coarse displacement. All distances are micro-quantized bigints
    (floor(d*1e6 + 0.5)) from left-associated double folds, so cell
    assignment, code assignment, and ranking are reproducible across
    engines.

    Shuffle budget: one exchange for the per-(vector, subspace) code
    min-agg, one for the (query, candidate) partial sum, one for the
    per-query top-k window — none touch raw vectors.

    ``query_pred`` should select a PROBE-sized set: the per-query
    distance table (m*ks rows each) broadcasts, so all-vectors-as-
    queries (query_pred=None) is only sane on small corpora — exactly
    like handing a full table to any broadcast side. ``exclude_self``
    as in :func:`pq_adc_topk` (queries here ARE corpus rows, so the
    default True is right for this entry point).
    """
    from pyspark.sql import Window

    from .clustering import lloyd_assign

    spark = embeddings.sparkSession
    ds = len(codebooks[0][0])
    ks = len(codebooks[0])

    coarse_arr = F.array(
        *[F.array(*[F.lit(x) for x in cent]) for cent in coarse_centroids]
    )
    base = embeddings.select(
        F.col(id_col),
        F.col(vec_col).alias("vec"),
        lloyd_assign(F.col(vec_col), coarse_centroids).alias("cell"),
    )
    if (
        fan_out_partitions
        and base.rdd.getNumPartitions() < fan_out_partitions
    ):
        # Fan out AFTER the cell projection, not before it (round 15):
        # when the caller repartitioned the raw scan instead, the ADC
        # join's pushed-down isnotnull(cell) landed BELOW that exchange
        # while the projection stayed above it, so the 8x64-dim coarse
        # argmin fold (CodegenFallback zip_with — interpreted) ran
        # TWICE per corpus row. With the projection below the exchange
        # the pushed filter is a cheap column test and the fold runs
        # once. No-op when the scan is already at least this parallel
        # (production multi-row-group files).
        base = base.repartition(fan_out_partitions, F.col(id_col))
    base = base.withColumn("ccent", F.element_at(coarse_arr, F.col("cell") + 1))

    cents = pq_centroids_df(spark, codebooks)

    def resid_subdist(vec: str) -> Column:
        # ((x_i - coarse_i) - cent_i)^2 through the shared exact fold.
        def term(i: int) -> Column:
            idx = F.col("s") * ds + i + 1
            x = (
                F.element_at(F.col(vec), idx).cast("double")
                - F.element_at(F.col("ccent"), idx)
                - F.element_at(F.col("cent"), i + 1)
            )
            return x * x

        return subspace_fold_q(term, ds)

    codes = (
        base.crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col).alias("neighbor_id"),
            "cell",
            "s",
            (resid_subdist("vec") * ks + F.col("c")).alias("key"),
        )
        .groupBy("neighbor_id", "cell", "s")
        .agg((F.min("key") % ks).cast("int").alias("code"))
    )

    queries = base if query_pred is None else base.filter(query_pred)
    qtab = queries.crossJoin(F.broadcast(cents)).select(
        F.col(id_col).alias("query_id"),
        F.col("cell").alias("qcell"),
        "s",
        F.col("c").alias("code"),
        resid_subdist("vec").alias("partial_q"),
    )

    scored = codes.join(
        F.broadcast(qtab),
        (codes.s == qtab.s)
        & (codes.code == qtab.code)
        & (codes.cell == qtab.qcell),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.groupBy("query_id", "neighbor_id").agg(
        F.sum("partial_q").alias("adc_q1e6")
    )
    w = Window.partitionBy("query_id").orderBy("adc_q1e6", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_q1e6")
    )
