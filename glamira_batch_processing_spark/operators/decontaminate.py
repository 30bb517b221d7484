"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by shared word n-grams.

The standard LLM-training hygiene step (beyond the reference's surface,
like the rest of the data-pipeline family): a training doc is
"contaminated" when a sufficient fraction of its n-gram shingles also
appear anywhere in the benchmark corpus.

Scale design: the benchmark side (eval suites) is tiny — megabytes
against 100 TB of training text — so its distinct shingle set is
BROADCAST and the overlap probe is a map-side hash-semi-join on the
training shingles: the corpus is never shuffled for the probe, only the
per-doc overlap counts aggregate (map-side combinable, one narrow
shuffle keyed on doc_id). A benchmark too big to broadcast degrades
gracefully to a shuffled equi-join on the shingle key — same plan
shape as the minhash bucket join (`dedup.py`), never pairwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import doc_shingles


def benchmark_shingles(
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Distinct shingle set of the whole benchmark corpus (one column)."""
    return (
        doc_shingles(benchmark, text_col, id_col, n=n, distinct=False)
        .select("shingle")
        .distinct()
    )


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.25,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per training doc: shingle count, benchmark-overlap count/ratio,
    and the contamination flag (ratio >= threshold).

    Docs with fewer than ``n`` words have no shingles and are not
    emitted (nothing to test). Counts are over DISTINCT shingles on
    both sides, so repeated phrases don't inflate the ratio.
    """
    sh = doc_shingles(docs, text_col, id_col, n=n, distinct=False)
    return contamination_stats_on_shingles(
        sh,
        benchmark,
        text_col=text_col,
        id_col=id_col,
        n=n,
        threshold=threshold,
        broadcast_benchmark=broadcast_benchmark,
    )


def contamination_stats_on_shingles(
    shingled: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.25,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """:func:`contamination_stats` from an EXISTING (id, shingle) frame
    (non-distinct is fine — the dedup happens here). Split out (round
    15) so a pipeline that already exploded the corpus for minhash-LSH
    can materialize ONE shingle pass and feed both the dedup and the
    decontamination legs (guide §2.4); ``benchmark`` is still raw docs
    (the eval side is tiny, its shingle pass is immaterial)."""
    sh = shingled.distinct()
    bench = benchmark_shingles(benchmark, text_col, id_col, n=n)
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    overlap = (
        sh.join(bench, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    ratio = F.col("n_overlap") / F.col("n_shingles")
    return (
        sizes.join(overlap, id_col, "left")
        .withColumn("n_overlap", F.coalesce("n_overlap", F.lit(0)))
        .select(
            id_col,
            "n_shingles",
            "n_overlap",
            ratio.alias("contamination_ratio"),
            (ratio >= threshold).alias("is_contaminated"),
        )
    )
