"""Corpus-hygiene contract queries: sub-document span dedup, winnowing
fingerprints, URL canonicalization, checksum-validated PII, and real
BPE tokenization — the web-pipeline operators whole-document dedup and
regex PII miss.

Same family as ``datapipe_queries`` / ``mlprep_queries``; each query is
oracle-checked against DuckDB except BPE (no SQL form — pinned by
pytest parity + partition invariance instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bpe import bpe_encode_stats, bpe_train
from ..operators.spans import (
    duplicated_span_stats,
    sql_word_windows_cte,
    strip_boilerplate_lines,
    winnow_fingerprints,
)
from .registry import query, table

# ---------------------------------------------------------------------------
# Exact duplicated-span detection (sub-document dedup).
# ---------------------------------------------------------------------------

_SPAN_W = 8


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH spans AS ({sql_word_windows_cte("documents", _SPAN_W)}),
    dup AS (
      SELECT whash FROM spans
      GROUP BY whash HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_windows FROM spans GROUP BY doc_id
    ),
    dupd AS (
      SELECT doc_id, COUNT(*) AS n_dup_windows
      FROM spans WHERE whash IN (SELECT whash FROM dup)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_windows, 0) AS n_windows,
           COALESCE(x.n_dup_windows, 0) AS n_dup_windows,
           CASE WHEN COALESCE(p.n_windows, 0) > 0
                THEN CAST(COALESCE(x.n_dup_windows, 0) AS DOUBLE)
                     / CAST(p.n_windows AS DOUBLE)
           END AS dup_ratio
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN dupd x USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicated-SPAN stats (``operators/spans.py``): hash
    every 8-word sliding window; a hash in >= 2 distinct docs marks a
    verbatim shared span (boilerplate, quoted blocks) that whole-doc
    dedup cannot see. The distributed analog of suffix-array ExactSubstr
    dedup (Lee et al. 2021): window construction fuses into the scan,
    then one groupBy shuffle on the uniform hash + one semi-join back —
    no pairwise work, linear at 100 TB.

    The local corpus is a single parquet file (one scan task), so the
    raw docs repartition before the window-hash explode to spread the
    md5 work across all cores — a no-op cost on real multi-file input
    (same precedent as dedup_minhash_lsh)."""
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    )
    return duplicated_span_stats(d, "text", "doc_id", _SPAN_W)


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS).
# ---------------------------------------------------------------------------

_WIN_K = 4
_WIN_T = 5


@query(
    "text_winnow_fingerprints",
    oracle=f"""
    WITH kg AS ({sql_word_windows_cte("documents", _WIN_K)}),
    sel AS (
      SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id, pos,
               min(whash) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN {_WIN_T - 1} PRECEDING AND CURRENT ROW
               ) AS fp
        FROM kg
      ) WHERE pos >= {_WIN_T}
    ),
    fps AS (
      SELECT doc_id, COUNT(*) AS n_fingerprints,
             md5(string_agg(CAST(fp AS VARCHAR), ',' ORDER BY fp)) AS fp_digest
      FROM sel GROUP BY doc_id
    ),
    nk AS (SELECT doc_id, COUNT(*) AS n_kgrams FROM kg GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(nk.n_kgrams, 0) AS n_kgrams,
           COALESCE(fps.n_fingerprints, 0) AS n_fingerprints,
           fps.fp_digest
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN nk USING (doc_id)
    LEFT JOIN fps USING (doc_id)
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed document fingerprints (Schleimer et al., SIGMOD 2003):
    min-hash of each sliding window of {t} consecutive {k}-gram hashes,
    deduped — the compact signature MOSS uses for plagiarism detection.
    Guarantees a fingerprint in every t+k-1 word stretch with O(1/t) of
    the k-gram volume retained. One partition-local window sort on
    doc_id, no global sort; output is a bounded per-doc signature, so
    downstream signature joins scale like LSH bucket joins.

    The raw docs repartition BY doc_id before the k-gram explode: it
    parallelizes the single-file local scan AND pre-satisfies the
    winnow window's hash distribution, so the per-doc min-selection
    runs with no further Exchange."""
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    )
    return winnow_fingerprints(d, "text", "doc_id", _WIN_K, _WIN_T)


# ---------------------------------------------------------------------------
# URL canonicalization + dedup.
# ---------------------------------------------------------------------------

# The documents table carries no URL column, so the contract query
# constructs deterministic messy URLs (scheme/WWW case, default port,
# utm params, fragments, trailing slashes all varying by doc_id) and
# the canonicalizer must collapse them to their canonical groups.
_URL_SQL = """
      SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
        || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
        || source || '.Example.COM'
        || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
        || '/Products/item-' || CAST(doc_id % 40 AS VARCHAR)
        || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
        || (CASE WHEN doc_id % 2 = 0
              THEN '?utm_source=news&utm_campaign=c'
                   || CAST(doc_id % 3 AS VARCHAR) || '&ref=kept'
              WHEN doc_id % 7 = 0 THEN '?ref=kept&utm_medium=mail'
              ELSE '?ref=kept' END)
        || (CASE WHEN doc_id % 4 = 1 THEN '#section-2' ELSE '' END)
        AS url
      FROM documents
"""


def _raw_urls(d: DataFrame) -> DataFrame:
    i = F.col("doc_id")
    url = F.concat(
        F.when(i % 2 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(i % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Example.COM"),
        F.when(i % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Products/item-"),
        (i % 40).cast("string"),
        F.when(i % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            i % 2 == 0,
            F.concat(
                F.lit("?utm_source=news&utm_campaign=c"),
                (i % 3).cast("string"),
                F.lit("&ref=kept"),
            ),
        )
        .when(i % 7 == 0, F.lit("?ref=kept&utm_medium=mail"))
        .otherwise(F.lit("?ref=kept")),
        F.when(i % 4 == 1, F.lit("#section-2")).otherwise(F.lit("")),
    )
    return d.select("doc_id", url.alias("url"))


def canonical_url(url: F.Column) -> F.Column:
    """Canonical form: lowercase scheme+host, strip www./default port/
    fragment/utm_* params/trailing slashes, '/' for an empty path.

    Pure regexp-chain Column algebra (JVM-side, fuses into the scan
    projection); every pattern parses identically under Java regex and
    RE2, so the DuckDB twin is byte-identical."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r":(443|80)$", ""), r"^www\.", ""
    )
    rest = F.regexp_replace(url, r"^[A-Za-z]+://[^/?#]+", "")
    rest = F.regexp_replace(rest, r"#.*", "")
    rest = F.regexp_replace(rest, r"([?&])utm_[A-Za-z0-9_]+=[^&#]*", r"$1")
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+\?", "?")
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(rest == "", F.lit("/")).otherwise(rest),
    )


_CANON_SQL = """
      scheme || '://' || host
        || CASE WHEN rest = '' THEN '/' ELSE rest END
"""


@query(
    "url_canonicalize_dedup",
    oracle=f"""
    WITH raw AS ({_URL_SQL}),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        regexp_replace(
          regexp_replace(
            lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
            ':(443|80)$', ''),
          '^www\\.', '') AS host,
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(url, '^[A-Za-z]+://[^/?#]+', ''),
                      '#.*', '', 'g'),
                    '([?&])utm_[A-Za-z0-9_]+=[^&#]*', '\\1', 'g'),
                  '\\?&+', '?', 'g'),
                '&&+', '&', 'g'),
              '[?&]+$', '', 'g'),
            '/+\\?', '?', 'g'),
          '/+$', '', 'g') AS rest
      FROM raw
    ),
    canon AS (
      SELECT doc_id, url, {_CANON_SQL} AS canonical_url FROM parts
    )
    SELECT canonical_url,
           COUNT(*) AS n_urls,
           COUNT(DISTINCT url) AS n_raw_variants,
           MIN(doc_id) AS canonical_doc_id
    FROM canon
    GROUP BY canonical_url
    """,
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-crawl URL dedup: canonicalize (scheme/host case, www, default
    port, fragment, utm tracking params, trailing slash) then group.
    The regexp chain is one fused scan projection; the group-by is a
    single shuffle on the canonical string — the linear 100 TB shape
    used before fetch-dedup in crawl pipelines."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    raw = _raw_urls(d)
    c = raw.select("doc_id", "url", canonical_url(F.col("url")).alias("canonical_url"))
    return c.groupBy("canonical_url").agg(
        F.count("*").alias("n_urls"),
        F.count_distinct("url").alias("n_raw_variants"),
        F.min("doc_id").alias("canonical_doc_id"),
    )


# ---------------------------------------------------------------------------
# Checksum-validated PII: credit-card numbers with Luhn.
# ---------------------------------------------------------------------------

# Plant one 16-digit card-like number per doc: a doc_id-derived 15-digit
# payload plus a check digit that satisfies Luhn for even doc_ids and
# violates it for odd ones — so the validator must actually compute the
# checksum, not pattern-match.
#
# Luhn over the final 16-digit string (check digit at position 16):
# digits at odd 1-based positions from the LEFT are doubled (position
# from the right = 17-i, doubled when even <=> i odd).

_LUHN15_SPARK = (
    "aggregate(transform(sequence(1, 15), i -> CASE WHEN i % 2 = 1 THEN "
    "IF(2 * CAST(substring(base15, i, 1) AS INT) > 9, "
    "2 * CAST(substring(base15, i, 1) AS INT) - 9, "
    "2 * CAST(substring(base15, i, 1) AS INT)) "
    "ELSE CAST(substring(base15, i, 1) AS INT) END), 0, (acc, x) -> acc + x)"
)

_LUHN16_SPARK = (
    "aggregate(transform(sequence(1, 16), i -> CASE WHEN i % 2 = 1 THEN "
    "IF(2 * CAST(substring(num, i, 1) AS INT) > 9, "
    "2 * CAST(substring(num, i, 1) AS INT) - 9, "
    "2 * CAST(substring(num, i, 1) AS INT)) "
    "ELSE CAST(substring(num, i, 1) AS INT) END), 0, (acc, x) -> acc + x)"
)

_LUHN15_DUCK = (
    "list_sum(list_transform(range(1, 16), i -> CASE WHEN i % 2 = 1 THEN "
    "CASE WHEN 2 * CAST(base15[i] AS INT) > 9 "
    "THEN 2 * CAST(base15[i] AS INT) - 9 "
    "ELSE 2 * CAST(base15[i] AS INT) END "
    "ELSE CAST(base15[i] AS INT) END))"
)

_LUHN16_DUCK = (
    "list_sum(list_transform(range(1, 17), i -> CASE WHEN i % 2 = 1 THEN "
    "CASE WHEN 2 * CAST(num[i] AS INT) > 9 "
    "THEN 2 * CAST(num[i] AS INT) - 9 "
    "ELSE 2 * CAST(num[i] AS INT) END "
    "ELSE CAST(num[i] AS INT) END))"
)


@query(
    "pii_luhn_validate",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id, text,
             '4' || lpad(CAST(doc_id * 7919 % 100000000000000 AS VARCHAR),
                         14, '0') AS base15
      FROM documents
    ),
    planted AS (
      SELECT doc_id,
             text || ' card '
                  || base15
                  || CAST(CASE WHEN doc_id % 2 = 0
                       THEN (10 - {_LUHN15_DUCK} % 10) % 10
                       ELSE ((10 - {_LUHN15_DUCK} % 10) % 10 + 5) % 10
                     END AS VARCHAR)
                  || ' exp 11/28' AS text
      FROM seeded
    ),
    extracted AS (
      SELECT doc_id,
             regexp_extract_all(text, '[0-9]{{16}}') AS cands
      FROM planted
    ),
    checked AS (
      SELECT doc_id,
             len(cands) AS n_candidates,
             cands[1] AS num
      FROM extracted
    )
    SELECT doc_id,
           CAST(n_candidates AS INTEGER) AS n_candidates,
           '************' || substring(num, 13, 4) AS card_masked,
           CAST({_LUHN16_DUCK} AS INTEGER) AS luhn_total,
           {_LUHN16_DUCK} % 10 = 0 AS is_valid_luhn
    FROM checked
    """,
)
def pii_luhn_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit-card PII detection with Luhn checksum validation — regex
    alone over-redacts (order ids, tracking numbers are 16 digits too);
    the checksum separates real card numbers. The Luhn sum is a pure
    higher-order Column expression (transform + aggregate over digit
    positions): JVM-side, codegen'd, zero UDFs, zero shuffles — at
    100 TB this is scan-speed. Raw numbers never leave the operator:
    output is masked last-4 only."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = d.withColumn(
        "base15",
        F.concat(
            F.lit("4"),
            F.lpad((F.col("doc_id") * 7919 % 100000000000000).cast("string"), 14, "0"),
        ),
    )
    luhn15 = F.expr(_LUHN15_SPARK)
    check = F.when(F.col("doc_id") % 2 == 0, (10 - luhn15 % 10) % 10).otherwise(
        ((10 - luhn15 % 10) % 10 + 5) % 10
    )
    planted = seeded.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" card "),
            F.col("base15"),
            check.cast("string"),
            F.lit(" exp 11/28"),
        ).alias("text"),
    )
    extracted = planted.select(
        "doc_id",
        # Spark's regexp_extract_all needs a capture group (idx 1);
        # DuckDB's returns full matches — same result for this pattern.
        F.regexp_extract_all(F.col("text"), F.lit("([0-9]{16})")).alias("cands"),
    )
    checked = extracted.select(
        "doc_id",
        F.size("cands").alias("n_candidates"),
        F.element_at("cands", 1).alias("num"),
    )
    luhn16 = F.expr(_LUHN16_SPARK)
    return checked.select(
        "doc_id",
        F.col("n_candidates").cast("int").alias("n_candidates"),
        F.concat(F.lit("************"), F.substring("num", 13, 4)).alias("card_masked"),
        luhn16.cast("int").alias("luhn_total"),
        (luhn16 % 10 == 0).alias("is_valid_luhn"),
    )


# ---------------------------------------------------------------------------
# Boilerplate line stripping (CCNet-style).
# ---------------------------------------------------------------------------

# The flat synthetic texts carry no page chrome, so the contract query
# builds a deterministic "page" per doc: the real text plus a per-source
# footer and a universal cookie line, joined by an explicit separator.
# The stripper must remove exactly the lines shared across >= 30 docs.
_PAGE_SUFFIX_SQL = (
    "' <br> footer ' || source || ' all rights reserved subscribe now"
    " <br> cookie notice please accept to continue'"
)
_BOILER_MIN_DOCS = 30


@query(
    "boilerplate_strip_lines",
    oracle=f"""
    WITH pages AS (
      SELECT doc_id,
             text || {_PAGE_SUFFIX_SQL} AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id, (u).p AS pos, (u).l AS line,
             CAST(concat('0x', substr(md5((u).l), 1, 15)) AS BIGINT) AS lhash
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ls) + 1),
                                     i -> {{'p': i, 'l': ls[i]}})) AS u
        FROM (SELECT doc_id, str_split(text, ' <br> ') AS ls FROM pages)
      )
    ),
    boiler AS (
      SELECT lhash FROM lines
      GROUP BY lhash HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
    ),
    kept AS (
      SELECT * FROM lines WHERE lhash NOT IN (SELECT lhash FROM boiler)
    ),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             md5(string_agg(line, ' <br> ' ORDER BY pos)) AS cleaned_md5
      FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
    SELECT t.doc_id, t.n_lines,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.cleaned_md5, md5('')) AS cleaned_md5
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def boilerplate_strip_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal (``operators/spans.py::
    strip_boilerplate_lines``): lines occurring in >= 30 distinct docs
    (footers, cookie banners) are dropped and each doc reassembled in
    line order. The detect side is the spans shape (one groupBy on the
    60-bit line hash); the strip side is an anti-join against the
    tiny-by-definition boilerplate hash set — broadcastable at any
    scale. cleaned_md5 pins the exact reconstruction, separators and
    order included."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" <br> footer "),
            F.col("source"),
            F.lit(" all rights reserved subscribe now"),
            F.lit(" <br> cookie notice please accept to continue"),
        ).alias("text"),
    )
    return strip_boilerplate_lines(d, min_docs=_BOILER_MIN_DOCS)


# ---------------------------------------------------------------------------
# Bigram familiarity (n-gram-LM quality proxy).
# ---------------------------------------------------------------------------


@query(
    "quality_bigram_familiarity",
    oracle=f"""
    WITH bg AS ({sql_word_windows_cte("documents", 2)}),
    cc AS (SELECT whash, COUNT(*) AS cnt FROM bg GROUP BY whash),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(cnt) AS BIGINT) AS sum_bigram_count
      FROM bg JOIN cc USING (whash)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_bigrams, 0) AS n_bigrams,
           COALESCE(s.sum_bigram_count, 0) AS sum_bigram_count,
           CASE WHEN s.n_bigrams > 0
                THEN CAST(s.sum_bigram_count AS DOUBLE) / s.n_bigrams
           END AS familiarity
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN scored s USING (doc_id)
    """,
)
def quality_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality proxy (the engine-exact analog of a KenLM
    perplexity filter, CCNet): score each doc by the mean corpus
    frequency of its word bigrams — gibberish and boilerplate-free
    machine text sit far below fluent text. Two shuffles (corpus bigram
    count, then an equi-join of doc bigrams to those counts) — the
    count table grows with the corpus so it is NOT broadcast, exactly
    the 100 TB shape. All accumulation is exact integer; the only
    float op is one final division, so the score is bit-identical
    across engines (a log-prob variant would be the production scorer
    but ln() is not cross-engine ulp-stable).

    Single-file local scan repartitions before the bigram explode
    (dedup_minhash_lsh precedent)."""
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    )
    from ..operators.spans import word_windows

    bg = word_windows(d, "text", "doc_id", 2)
    cc = bg.groupBy("whash").agg(F.count("*").alias("cnt"))
    scored = (
        bg.join(cc, "whash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("cnt").alias("sum_bigram_count"),
        )
    )
    base = d.select("doc_id").distinct()
    return base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("sum_bigram_count", F.lit(0)).alias("sum_bigram_count"),
        F.when(
            F.col("n_bigrams") > 0,
            F.col("sum_bigram_count").cast("double") / F.col("n_bigrams"),
        ).alias("familiarity"),
    )


# ---------------------------------------------------------------------------
# BPE tokenization (no SQL form — pytest parity + partition invariance).
# ---------------------------------------------------------------------------


@query("bpe_train_merges")
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING on the corpus (``operators/bpe.py::bpe_train``):
    8 rounds, each = one Arrow-batched partial pair-count pass + one
    sum-and-argmax, returning the learned merge table as (rank, a, b)
    rows. Deterministic (exact counts, total tie order) and
    partition-invariant — pinned by pytest; rows-only driver check (an
    iterative trainer has no single SQL form)."""
    d = table(spark, sf_dir, "documents").select("text")
    merges = bpe_train(d, n_merges=8)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)], "rank int, a string, b string"
    )


@query("bpe_encode_stats")
def bpe_encode_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BPE tokenization (``operators/bpe.py``): the greedy
    rank-ordered merge loop over a fixed merge table, run in Arrow
    batches via mapInPandas with a per-batch word cache. No DuckDB
    oracle exists for an iterative merge loop; correctness is pinned by
    pytest (hand-computed segmentations, cache on/off parity,
    partition invariance) and the driver's rows-only check."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe_encode_stats(d, "text", "doc_id")


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style; no SQL form — pytest
# parity + partition invariance, rows-only driver check).
# ---------------------------------------------------------------------------

from ..operators.unigram import unigram_encode_stats, unigram_train  # noqa: E402


@query("unigram_train_pieces")
def unigram_train_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer TRAINING on the corpus
    (``operators/unigram.py::unigram_train``, Kudo 2018): over-complete
    substring seed -> 2 Viterbi-EM rounds (exact integer counts, piece
    scores computed once on the driver) -> count-ranked prune, single
    characters immortal. Returns the learned vocabulary as
    (rank, piece, count) rows. Deterministic and partition-invariant —
    pinned by pytest; rows-only driver check (an iterative EM trainer
    has no single SQL form)."""
    d = table(spark, sf_dir, "documents").select("text")
    vocab = unigram_train(
        d, vocab_size=48, n_iters=2, max_piece_len=4, seed_size=256
    )
    return spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(vocab)],
        "rank int, piece string, count long",
    )


@query("unigram_encode_stats")
def unigram_encode_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real unigram-LM tokenization with a vocabulary TRAINED in the
    same plan (the trained-path proof, like ``text_langid_trained``):
    per-doc Viterbi token counts and a segmentation digest via Arrow
    mapInPandas with a per-batch word cache. Rows-only driver check;
    hand-computed segmentations, tie determinism and partition
    invariance are pinned in pytest."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = unigram_train(
        d.select("text"), vocab_size=48, n_iters=2, max_piece_len=4, seed_size=256
    )
    return unigram_encode_stats(d, vocab, "text", "doc_id", max_piece_len=4)


# ---------------------------------------------------------------------------
# Trained quality classifier (likelihood-ratio Naive-Bayes form).
# ---------------------------------------------------------------------------


@query(
    "quality_classifier_trained",
    oracle="""
    WITH labeled AS (
      SELECT doc_id, lower(text) AS text,
             CASE WHEN lang = 'en' AND n_chars >= 300 THEN 1 ELSE 0 END AS label_pos
      FROM documents
    ),
    tok AS (
      SELECT doc_id, label_pos, tok
      FROM (SELECT doc_id, label_pos,
                   unnest(str_split(text, ' ')) AS tok
            FROM labeled)
      WHERE tok <> ''
    ),
    weights AS (
      SELECT tok,
             CAST(((SUM(label_pos) + 1) * 1000000)
                  // (SUM(1 - label_pos) + 1) AS BIGINT) AS w_ppm
      FROM tok GROUP BY tok
    ),
    prior AS (
      SELECT CAST(((SUM(label_pos) + 1) * 1000000)
                  // (SUM(1 - label_pos) + 1) AS BIGINT) AS prior_ppm
      FROM tok
    ),
    scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(w.w_ppm) AS BIGINT) AS score_sum
      FROM tok t JOIN weights w USING (tok)
      GROUP BY t.doc_id
    )
    SELECT l.doc_id, l.label_pos,
           COALESCE(s.n_tokens, 0) AS n_tokens,
           COALESCE(s.score_sum, 0) AS score_sum,
           CASE WHEN s.n_tokens > 0
                THEN CAST(s.score_sum AS DOUBLE) / s.n_tokens END AS mean_ratio_ppm,
           CASE WHEN s.n_tokens > 0
                 AND CAST(s.score_sum AS DOUBLE) / s.n_tokens
                     >= CAST((SELECT prior_ppm FROM prior) AS DOUBLE)
                THEN 1 ELSE 0 END AS quality_flag
    FROM (SELECT DISTINCT doc_id, label_pos FROM labeled) l
    LEFT JOIN scored s USING (doc_id)
    """,
)
def quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED quality classifier over the corpus — the fastText /
    Naive-Bayes bootstrap every large pretraining pipeline runs
    (GPT-3/LLaMA 'wiki-like' filters): seed labels from a cheap
    heuristic (here: English docs of substantial length), learn
    per-token class evidence from the labeled corpus, then score EVERY
    document with the learned model so the classifier generalizes past
    the seed rule.

    Engine-exact formulation: instead of summed log-odds (ln() is not
    cross-engine ulp-stable), each token carries an add-one-smoothed
    POSITIVE/NEGATIVE likelihood ratio quantized to integer ppm via
    pure integer arithmetic — (pos_c+1)*1e6 DIV (neg_c+1) — and a doc's
    score is the exact BIGINT sum of its tokens' ratios (the linear
    form of the NB decision rule; monotone-equivalent per token). The
    only float ops are one final correctly-rounded division per doc
    and its threshold compare, so Spark and DuckDB agree bit-for-bit.
    The decision threshold is the class prior in the same units (the
    textbook NB rule); on the driver's synthetic corpus every language
    shares one vocabulary, so token evidence is intentionally weak and
    the gate proves the TRAINING + INFERENCE ALGEBRA and threshold
    mechanics — on real corpora the same plan learns real weights.
    Overflow headroom: weights form on the aggregated token table,
    (pos_c+1)*1e6 stays inside int64 until a single token exceeds ~9e12
    positive occurrences (~petatoken corpora — switch the weight column
    to decimal(38,0) there).

    Scale shape: token counts and doc scores are two groupBys that
    pipeline with the explode; the learned weight table grows with
    VOCABULARY (not corpus rows) but is still joined via shuffle, never
    broadcast, exactly the 100 TB-safe shape. Training and inference
    are one pass each over the same exploded tokens (Spark reuses the
    cached exchange across the two aggregations).

    Single-file local scan repartitions before the explode
    (dedup_minhash_lsh precedent)."""
    d = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.lower("text").alias("text"),
            F.when(
                (F.col("lang") == "en") & (F.col("n_chars") >= 300), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("label_pos"),
        )
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    )
    tok = d.select(
        "doc_id",
        "label_pos",
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    weights = tok.groupBy("tok").agg(
        F.expr(
            "CAST((SUM(label_pos) + 1) * 1000000L DIV (SUM(1 - label_pos) + 1)"
            " AS BIGINT)"
        ).alias("w_ppm")
    )
    # NB decision threshold = the class PRIOR in the same ppm units (a
    # class-neutral token's ratio equals the prior, so "above prior
    # mean" = positive-leaning evidence). One tiny row, broadcast.
    prior = tok.agg(
        F.expr(
            "CAST((SUM(label_pos) + 1) * 1000000L DIV (SUM(1 - label_pos) + 1)"
            " AS BIGINT)"
        ).alias("prior_ppm")
    )
    scored = (
        tok.join(weights, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("w_ppm").alias("score_sum"),
        )
    )
    base = d.select("doc_id", "label_pos").distinct()
    mean = F.col("score_sum").cast("double") / F.col("n_tokens")
    return (
        base.join(scored, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            "label_pos",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("score_sum", F.lit(0)).alias("score_sum"),
            F.when(F.col("n_tokens") > 0, mean).alias("mean_ratio_ppm"),
            F.when(
                (F.col("n_tokens") > 0)
                & (mean >= F.col("prior_ppm").cast("double")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("quality_flag"),
        )
    )


@query(
    "quality_classifier_eval",
    oracle="""
    WITH labeled AS (
      SELECT doc_id, lower(text) AS text,
             CASE WHEN lang = 'en' AND n_chars >= 300 THEN 1 ELSE 0 END AS label_pos,
             CASE WHEN doc_id % 5 = 4 THEN 1 ELSE 0 END AS is_eval
      FROM documents
    ),
    tok AS (
      SELECT doc_id, label_pos, is_eval, tok
      FROM (SELECT doc_id, label_pos, is_eval,
                   unnest(str_split(text, ' ')) AS tok
            FROM labeled)
      WHERE tok <> ''
    ),
    weights AS (
      SELECT tok,
             CAST(((SUM(label_pos) + 1) * 1000000)
                  // (SUM(1 - label_pos) + 1) AS BIGINT) AS w_ppm
      FROM tok WHERE is_eval = 0 GROUP BY tok
    ),
    prior AS (
      SELECT CAST(((SUM(label_pos) + 1) * 1000000)
                  // (SUM(1 - label_pos) + 1) AS BIGINT) AS prior_ppm
      FROM tok WHERE is_eval = 0
    ),
    scored AS (
      -- unseen eval tokens drop out of the inner join: inference uses
      -- only evidence the training half actually learned
      SELECT t.doc_id, MIN(t.label_pos) AS label_pos,
             COUNT(*) AS n_tokens,
             CAST(SUM(w.w_ppm) AS BIGINT) AS score_sum
      FROM tok t JOIN weights w USING (tok)
      WHERE t.is_eval = 1
      GROUP BY t.doc_id
    ),
    judged AS (
      SELECT label_pos,
             CASE WHEN CAST(score_sum AS DOUBLE) / n_tokens
                       >= CAST((SELECT prior_ppm FROM prior) AS DOUBLE)
                  THEN 1 ELSE 0 END AS pred
      FROM scored WHERE n_tokens > 0
    )
    SELECT
      CAST(SUM(label_pos * pred) AS BIGINT) AS tp,
      CAST(SUM((1 - label_pos) * pred) AS BIGINT) AS fp,
      CAST(SUM(label_pos * (1 - pred)) AS BIGINT) AS fn,
      CAST(SUM((1 - label_pos) * (1 - pred)) AS BIGINT) AS tn,
      CAST(SUM(label_pos * pred) AS DOUBLE)
        / NULLIF(SUM(pred), 0) AS precision_,
      CAST(SUM(label_pos * pred) AS DOUBLE)
        / NULLIF(SUM(label_pos), 0) AS recall_
    FROM judged
    """,
)
def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of the trained quality classifier: hash-split
    the corpus (doc_id % 5 — the same leakage-free stateless split the
    split_train_val_test operator uses), learn token weights and the
    prior ONLY from the train half, score the eval half with an INNER
    join (tokens never seen in training contribute nothing, exactly how
    a deployed vocabulary behaves), and reduce to the confusion matrix
    + precision/recall. The numbers are honest ML hygiene — the eval
    half contributes zero training evidence — and every cell is an
    exact BIGINT with two final correctly-rounded divisions, so the
    DuckDB twin matches bit-for-bit.

    Scale shape: identical to quality_classifier_trained (two groupBys
    pipelining with the explode, vocabulary-sized weight table
    shuffle-joined) plus a 4-row final reduce."""
    d = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.lower("text").alias("text"),
            F.when(
                (F.col("lang") == "en") & (F.col("n_chars") >= 300), F.lit(1)
            )
            .otherwise(F.lit(0))
            .alias("label_pos"),
            F.when(F.col("doc_id") % 5 == 4, F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_eval"),
        )
        .repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    )
    tok = d.select(
        "doc_id",
        "label_pos",
        "is_eval",
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    train = tok.filter(F.col("is_eval") == 0)
    weights = train.groupBy("tok").agg(
        F.expr(
            "CAST((SUM(label_pos) + 1) * 1000000L DIV (SUM(1 - label_pos) + 1)"
            " AS BIGINT)"
        ).alias("w_ppm")
    )
    prior = train.agg(
        F.expr(
            "CAST((SUM(label_pos) + 1) * 1000000L DIV (SUM(1 - label_pos) + 1)"
            " AS BIGINT)"
        ).alias("prior_ppm")
    )
    scored = (
        tok.filter(F.col("is_eval") == 1)
        .join(weights, "tok")
        .groupBy("doc_id")
        .agg(
            F.min("label_pos").alias("label_pos"),
            F.count("*").alias("n_tokens"),
            F.sum("w_ppm").alias("score_sum"),
        )
    )
    judged = (
        scored.filter(F.col("n_tokens") > 0)
        .crossJoin(F.broadcast(prior))
        .select(
            "label_pos",
            F.when(
                F.col("score_sum").cast("double") / F.col("n_tokens")
                >= F.col("prior_ppm").cast("double"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("pred"),
        )
    )
    tp = F.sum(F.col("label_pos") * F.col("pred"))
    fp = F.sum((1 - F.col("label_pos")) * F.col("pred"))
    fn = F.sum(F.col("label_pos") * (1 - F.col("pred")))
    tn = F.sum((1 - F.col("label_pos")) * (1 - F.col("pred")))
    return judged.agg(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        (
            tp.cast("double")
            / F.nullif(F.sum("pred"), F.lit(0))
        ).alias("precision_"),
        (
            tp.cast("double")
            / F.nullif(F.sum("label_pos"), F.lit(0))
        ).alias("recall_"),
    )
