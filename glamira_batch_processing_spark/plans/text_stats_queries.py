"""Corpus-statistics contract queries: benchmark decontamination and
per-language heavy hitters — training-data hygiene beyond the
reference's own surface (same family as ``datapipe_queries``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.decontaminate import contamination_stats
from ..operators.dedup import sql_shingles_cte
from ..operators.text import words
from .registry import query, table

# Deterministic synthetic leak: docs with doc_id % 19 == 0 form the
# "benchmark" (eval) set; the training corpus is the rest PLUS exact
# copies of the benchmark (+300000) and tail-padded near-copies
# (+400000) — the contamination the operator must catch.
_DECON_SQL = """
    bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 19 = 0),
    train AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 19 <> 0
      UNION ALL
      SELECT doc_id + 300000 AS doc_id, text FROM bench
      UNION ALL
      SELECT doc_id + 400000 AS doc_id,
             text || ' wholly unrelated closing sentence appended' AS text
      FROM bench WHERE doc_id % 2 = 0
    )
"""


@query(
    "decontaminate_benchmark_overlap",
    oracle=f"""
    WITH {_DECON_SQL},
    tsh AS ({sql_shingles_cte("train")}),
    bsh AS (SELECT DISTINCT shingle FROM ({sql_shingles_cte("bench")})),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tsh GROUP BY doc_id),
    overlap AS (
      SELECT doc_id, COUNT(*) AS n_overlap
      FROM tsh JOIN bsh USING (shingle)
      GROUP BY doc_id
    )
    SELECT s.doc_id,
           s.n_shingles,
           COALESCE(o.n_overlap, 0) AS n_overlap,
           COALESCE(o.n_overlap, 0) / s.n_shingles AS contamination_ratio,
           COALESCE(o.n_overlap, 0) / s.n_shingles >= 0.5 AS is_contaminated
    FROM sizes s LEFT JOIN overlap o ON s.doc_id = o.doc_id
    """,
)
def decontaminate_benchmark_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (``operators/decontaminate.py``): flag
    training docs whose word-3-gram shingles overlap the eval set by
    >= 50%. The benchmark shingle set is broadcast, so the probe is
    map-side against the training shingles; only narrow per-doc counts
    shuffle — the 100 TB shape (eval suites are MBs)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 19 == 0)
    leaked_exact = bench.select((F.col("doc_id") + 300000).alias("doc_id"), "text")
    leaked_near = bench.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" wholly unrelated closing sentence appended")
        ).alias("text"),
    )
    train = (
        d.filter(F.col("doc_id") % 19 != 0)
        .unionByName(leaked_exact)
        .unionByName(leaked_near)
    )
    return contamination_stats(train, bench, n=3, threshold=0.5)


@query(
    "heavy_hitters_by_lang",
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(str_split(lower(text), ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT lang, token, COUNT(*) AS cnt
      FROM tok WHERE token <> ''
      GROUP BY lang, token
    ),
    ranked AS (
      SELECT lang, token, cnt,
             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rnk
      FROM counts
    )
    SELECT lang, token, cnt, rnk FROM ranked WHERE rnk <= 10
    """,
)
def heavy_hitters_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 tokens per language: explode -> map-side-combinable
    count on (lang, token) -> per-lang window top-k, where Spark pushes
    a WindowGroupLimit so only each partition's running top-10 survives
    to the final sort — the exact-heavy-hitters plan that scales (the
    approximate alternative at extreme cardinality is countmin/freqItems,
    but token vocabularies fit the exact path comfortably)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(words(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    counts = tok.groupBy("lang", "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("token"))
    return counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 10
    )


from ..operators.text import sql_word_ngrams, word_ngrams  # noqa: E402


@query(
    "text_repetition_stats",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, unnest({sql_word_ngrams("text", 2)}) AS gram FROM documents
    ),
    c AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram)
    SELECT doc_id,
      CAST(SUM(cnt) AS BIGINT) AS n_grams,
      CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
      CAST(MAX(cnt) AS BIGINT) AS top_gram_n,
      1.0 - COUNT(*) / SUM(cnt) AS dup_fraction,
      MAX(cnt) / SUM(cnt) AS top_fraction
    FROM c GROUP BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (the published Gopher-rule family):
    per-document duplicate-2-gram fraction and most-frequent-2-gram
    share. High values flag boilerplate/spam for corpus filtering.
    Shape: 2-gram explode -> (doc, gram) count with map-side combine ->
    per-doc rollup; single-word docs have no 2-grams and drop out, like
    the oracle."""
    d = table(spark, sf_dir, "documents")
    g = d.select("doc_id", F.explode(word_ngrams(F.col("text"), 2)).alias("gram"))
    c = g.groupBy("doc_id", "gram").agg(F.count("*").alias("cnt"))
    return c.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.count("*").alias("n_distinct_grams"),
        F.max("cnt").alias("top_gram_n"),
        (F.lit(1.0) - F.count("*") / F.sum("cnt")).alias("dup_fraction"),
        (F.max("cnt") / F.sum("cnt")).alias("top_fraction"),
    )


from ..operators.sketches import cms_estimate, cms_sketch, sql_cms_sketch  # noqa: E402


@query(
    "sketch_countmin_tokens",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(str_split(lower(text), ' ')) AS token FROM documents
    ),
    filtered AS (SELECT token FROM tok WHERE token <> '')
    {sql_cms_sketch("filtered", "token", depth=4, width=256)}
    """,
)
def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch over the token stream: the full
    4x256 counter matrix, value-checked cell-by-cell against DuckDB
    computing the identical md5-derived buckets.

    The frequency twin of sketch_kmv_distinct: state is d*w counters
    REGARDLESS of vocabulary size, merges across corpus shards by
    element-wise addition, and the build is one groupBy over a
    constant key space with map-side combine — at 100 TB the exact
    (lang, token) count table behind heavy_hitters_by_lang keeps
    vocabulary-sized state, while this keeps 1 KB-scale state with a
    provable overestimate bound of eps*N (eps = e/width) at
    probability 1 - exp(-depth).

    Round 11 (VERDICT r10 perf flag): count-then-sketch. The sketch is
    linear, so equal tokens pre-combine into one weighted increment: a
    vocabulary-keyed groupBy count (map-side combine does nearly all of
    it) runs BEFORE the md5 + d-way cell explode, cutting the digest
    work and the exploded volume from corpus-sized to vocabulary-sized
    (corpus/vocab here is ~10^4x). The DuckDB twin uses the identical
    shape, so the bench comparison stays equal-work."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(words(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    counts = tok.groupBy("token").agg(F.count("*").alias("occ"))
    return cms_sketch(
        counts, F.col("token"), depth=4, width=256, weight=F.col("occ")
    )


_CMS_PROBE_ABSENT = ("zzzabsenttoken", "qqqmissingword")


@query(
    "sketch_countmin_estimate",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(str_split(lower(text), ' ')) AS token FROM documents
    ),
    filtered AS (SELECT token FROM tok WHERE token <> ''),
    exact AS (SELECT token, COUNT(*) AS occ FROM filtered GROUP BY 1),
    sketch AS (
      {sql_cms_sketch("filtered", "token", depth=4, width=256)}
    ),
    probes AS (
      SELECT token FROM exact
      UNION ALL
      SELECT * FROM (VALUES ('{_CMS_PROBE_ABSENT[0]}'),
                            ('{_CMS_PROBE_ABSENT[1]}')) v(token)
    ),
    cells AS (
      SELECT p.token,
             CAST(u.range AS INTEGER) AS depth,
             CAST((hp.h1 + u.range * hp.h2) % 256 AS INTEGER) AS bucket
      FROM (
        SELECT token,
               CAST(concat('0x', substr(dig, 1, 8)) AS BIGINT) AS h1,
               CAST(concat('0x', substr(dig, 9, 8)) AS BIGINT) AS h2
        FROM (SELECT token, md5(token || 'cms-v1') AS dig FROM probes)
      ) hp
      JOIN probes p USING (token)
      CROSS JOIN range(4) u
    )
    SELECT c.token,
           CAST(MIN(COALESCE(s.n, 0)) AS BIGINT) AS est_count,
           CAST(COALESCE(ANY_VALUE(e.occ), 0) AS BIGINT) AS exact_count
    FROM cells c
    LEFT JOIN sketch s ON s.depth = c.depth AND s.bucket = c.bucket
    LEFT JOIN exact e ON e.token = c.token
    GROUP BY c.token
    """,
)
def sketch_countmin_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min ESTIMATE leg (the probe side the sketch exists
    for): every vocabulary token plus two known-absent probes is
    estimated as min-over-depths of its bucket counters against the
    count-then-sketch matrix, emitted beside the exact count — so the
    oracle pins the full eps*N overestimate contract cell-for-cell
    (est_count >= exact_count by construction on every row, bit-exact
    across engines because both derive buckets from the same single
    salted md5, Kirsch-Mitzenmacher 2006).

    Scale shape: the d*w counter matrix is ~KB-scale and BROADCAST to
    the probes (cms_estimate), so estimation never shuffles the probed
    stream — at 100 TB the probe side is a scan + broadcast join + one
    map-side-combinable min per probe. Exact counts ride the same
    vocabulary-keyed groupBy the sketch build already runs."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(words(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    counts = tok.groupBy("token").agg(F.count("*").alias("occ"))
    sketch = cms_sketch(
        counts, F.col("token"), depth=4, width=256, weight=F.col("occ")
    )
    absent = spark.createDataFrame(
        [(t,) for t in _CMS_PROBE_ABSENT], "token string"
    )
    probes = counts.select("token").unionByName(absent)
    est = cms_estimate(sketch, probes, "token", depth=4, width=256)
    return est.join(counts, "token", "left").select(
        "token",
        F.col("est_count").cast("long").alias("est_count"),
        F.coalesce(F.col("occ"), F.lit(0)).cast("long").alias("exact_count"),
    )
