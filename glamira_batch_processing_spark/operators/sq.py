"""SQ8 scalar quantization: int8-per-dimension embedding compression.

The fourth member of the quantization family (IVF cells, PQ codes,
residual IVF+PQ — see ``operators/pq.py`` / ``operators/similarity.py``):
each dimension is affinely mapped onto 0..255 using the corpus
per-dimension [min, max] range, so a d-dim float vector becomes d bytes
(4x smaller than float32, with none of PQ's codebook training). This is
the standard "SQ8" tier of FAISS-style index menus (Jegou et al. 2011
discuss the scalar-vs-product trade-off): cheaper encode, higher recall
than PQ at the same byte budget for low-d embeddings, and the natural
format for a warm tier that rescores PQ candidates.

Everything is deterministic and engine-portable, matching the repo's
oracle discipline:

* train = per-dimension float min/max (exact, order-free),
* encode = ``clamp(floor((v - mn) * 255 / (mx - mn) + 0.5), 0, 255)``
  computed in IEEE doubles (every op correctly rounded, so Spark and
  DuckDB produce bit-identical codes; ``floor(x + 0.5)`` instead of
  ``round`` — the repo-wide round-portability rule),
* distance = ordered-fold squared L2 between the float query and the
  DEQUANTIZED candidate, quantized once to micro-units
  (``floor(d * 1e6 + 0.5)`` BIGINT) for exact cross-engine ranking.

Scale design (100 TB): training is one explode + groupBy(dim) whose key
space is d constants (map-side combine does nearly all the work); the
trained ranges are a 1-row table broadcast into the encode scan (zero
shuffle); search broadcasts the bounded query set and keeps the corpus
side embarrassingly parallel — the only wide op is the per-query top-k
(TakeOrdered-shaped window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sq8_params(df: DataFrame, col: str = "embedding") -> DataFrame:
    """One row ``(mns: array<double>, mxs: array<double>)`` — the
    per-dimension training state.

    One posexplode + groupBy(dim) min/max: shuffle key space = d
    constants regardless of corpus size, then a single d-row sort into
    the array form the encoder broadcasts.
    """
    dims = (
        df.select(F.posexplode(col).alias("i", "v"))
        .groupBy("i")
        .agg(
            F.min(F.col("v").cast("double")).alias("mn"),
            F.max(F.col("v").cast("double")).alias("mx"),
        )
    )
    return dims.agg(
        F.array_sort(
            F.collect_list(F.struct("i", "mn"))
        ).alias("_a"),
        F.array_sort(
            F.collect_list(F.struct("i", "mx"))
        ).alias("_b"),
    ).select(
        F.transform("_a", lambda s: s["mn"]).alias("mns"),
        F.transform("_b", lambda s: s["mx"]).alias("mxs"),
    )


def _code(v: Column, mn: Column, mx: Column) -> Column:
    """One dimension's SQ8 code, IEEE-exact and clamp-guarded.

    The divisor is substituted with 1.0 on degenerate (mx == mn)
    dimensions so no expression path ever divides by zero — the WHEN
    guard alone is not enough, because the untaken arm's floor/cast
    still evaluates and ANSI mode would turn the Infinity into a
    runtime cast error on constant dimensions.
    ``(v - mn) * (255 / (mx - mn))`` would be one fewer op but rounds
    differently from the oracle's ``(v - mn) * 255 / (mx - mn)``; the
    expression below keeps the exact op order with the division made
    safe by substituting a 1.0 divisor in the degenerate case.
    """
    safe_div = F.when(mx == mn, F.lit(1.0)).otherwise(mx - mn)
    raw = F.floor((v.cast("double") - mn) * F.lit(255.0) / safe_div + F.lit(0.5))
    clamped = F.least(
        F.lit(255).cast("bigint"),
        F.greatest(F.lit(0).cast("bigint"), raw.cast("bigint")),
    )
    return F.when(mx == mn, F.lit(0).cast("bigint")).otherwise(clamped)


def sq8_encode(df: DataFrame, params: DataFrame, col: str = "embedding") -> DataFrame:
    """Append ``codes: array<bigint>`` (values 0..255 — int8 payload).

    ``params`` is the 1-row output of :func:`sq8_params`; it joins in as
    a broadcast nested-loop of one row, so encoding stays a zero-shuffle
    projection over the corpus scan.
    """
    with_p = df.crossJoin(F.broadcast(params))
    codes = F.transform(
        F.col(col),
        lambda v, i: _code(v, F.element_at("mns", i + 1), F.element_at("mxs", i + 1)),
    )
    return with_p.withColumn("codes", codes).drop("mns", "mxs")


def sq8_dequantize(codes: Column, mns: Column, mxs: Column) -> Column:
    """array<double> reconstruction: ``mn + code * (mx - mn) / 255``."""
    return F.transform(
        codes,
        lambda c, i: F.when(
            F.element_at(mxs, i + 1) == F.element_at(mns, i + 1),
            F.element_at(mns, i + 1),
        ).otherwise(
            F.element_at(mns, i + 1)
            + c.cast("double")
            * (F.element_at(mxs, i + 1) - F.element_at(mns, i + 1))
            / F.lit(255.0)
        ),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    params: DataFrame,
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact-integer ADC top-k over SQ8 codes.

    ``queries`` carries (query_id, qvec); it is broadcast (bounded by
    contract), the corpus side is the encoded scan, and ranking uses the
    micro-unit integer distance so ties and order are engine-exact.
    """
    encoded = sq8_encode(corpus, params).crossJoin(F.broadcast(params))
    deq = sq8_dequantize(F.col("codes"), F.col("mns"), F.col("mxs"))
    cand = encoded.select(F.col(id_col).alias("neighbor_id"), deq.alias("deq"))
    pairs = cand.join(F.broadcast(queries), F.col("query_id") != F.col("neighbor_id"))
    sq_l2 = F.aggregate(
        F.zip_with(
            F.col("qvec"),
            F.col("deq"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.floor(sq_l2 * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("adc_q1e6"),
    )
    w = Window.partitionBy("query_id").orderBy("adc_q1e6", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_q1e6")
    )


# ---------------------------------------------------------------------------
# DuckDB twins (oracle SQL fragments).
# ---------------------------------------------------------------------------


def sql_sq8_params_cte(source: str, col: str, dim: int) -> str:
    """CTE body computing the same (mns, mxs) arrays in DuckDB."""
    return f"""
    sqdims AS (
      SELECT i,
             min(CAST({col}[i] AS DOUBLE)) AS mn,
             max(CAST({col}[i] AS DOUBLE)) AS mx
      FROM {source}, range(1, {dim + 1}) t(i)
      GROUP BY i
    ),
    sqparams AS (
      SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
      FROM sqdims
    )"""


def sql_sq8_codes(vec: str, dim: int) -> str:
    """list<BIGINT> of SQ8 codes for ``vec`` given sqparams in scope."""
    return (
        f"list_transform(range(1, {dim + 1}), i -> CASE "
        f"WHEN mxs[i] = mns[i] THEN CAST(0 AS BIGINT) "
        f"ELSE least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT), "
        f"CAST(floor((CAST({vec}[i] AS DOUBLE) - mns[i]) * 255.0 / (mxs[i] - mns[i]) + 0.5) AS BIGINT))) "
        f"END)"
    )


def sql_sq8_dequant(codes: str, dim: int) -> str:
    """list<DOUBLE> reconstruction for ``codes`` given sqparams in scope."""
    return (
        f"list_transform(range(1, {dim + 1}), i -> CASE "
        f"WHEN mxs[i] = mns[i] THEN mns[i] "
        f"ELSE mns[i] + CAST({codes}[i] AS DOUBLE) * (mxs[i] - mns[i]) / 255.0 END)"
    )
