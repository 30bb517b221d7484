"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (the point of each variant):
- exact:        one hash-groupBy shuffle on md5(content) — linear.
- ngram+jaccard: exact pairwise similarity; candidate pairs come from a
                shingle-inverted-index self-join, so cost is bounded by
                shingle co-occurrence, not n^2. Still superlinear —
                use for verification of candidates, not discovery.
- minhash+LSH:  the 100 TB path. K minhashes per doc -> banded
                signatures -> bucket-join. Each stage is one shuffle on
                a high-cardinality key; no pairwise work outside a
                bucket. Probability of catching Jaccard-s pairs is
                1-(1-s^r)^b (r rows/band, b bands).
- simhash:      near-dup via Hamming-close bit signatures; here grouped
                at distance 0 (identical signature) with banding as the
                scale path for distance<=k.
- embedding:    cosine over vector columns; brute-force for small
                candidate sets, IVF/LSH bucketing in similarity.py for
                scale.

All deterministic: hashing derives from md5 (reproducible in any
engine), minima are lexicographic, ordering has total tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_key(text: Column) -> Column:
    """Exact-dup grouping key."""
    return F.md5(text)


def exact_dedup_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per content-hash: copy count + canonical (minimum) id."""
    return (
        df.groupBy(content_key(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("canonical_doc_id"),
        )
    )



def doc_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) pairs — the inverted-index input.

    Codegen-friendly formulation: explode arrays_zip of n shifted
    slices, then a plain concat_ws projection. ~7x faster than a
    higher-order transform lambda (HOFs are interpreted per element).
    Pass distinct=False when the consumer is multiplicity-insensitive
    (e.g. min() in minhash) to skip the dedup shuffle.
    """
    w = F.split(F.lower(F.col(text_col)), " ")
    sz = F.greatest(F.size(w) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(w, k + 1, sz) for k in range(n)])
    out = df.select(id_col, F.explode(z).alias("g")).select(
        id_col,
        F.concat_ws(" ", *[F.col(f"g.{k}") for k in range(n)]).alias("shingle"),
    )
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Pairs (doc_a < doc_b) with Jaccard(shingles) >= threshold.

    Candidate generation is an inverted-index self-join on shingle —
    only docs sharing at least one shingle are compared.
    """
    sh = doc_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_shingles").alias("size_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "n_common", "size_a", "size_b", "jaccard")


# Universal-hash family for the md5 minhash fold: fixed odd
# coefficients (deterministic; regenerate with random.Random(20260814))
# and the Mersenne prime modulus 2^31 - 1. Shared verbatim by the
# DuckDB oracle twins (sql_minhash_coeffs_values()).
MINHASH_P = 2147483647
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (1571058545, 730493953),
    (1660058741, 1293707557),
    (1122761735, 1579482915),
    (72772567, 776319283),
    (1809802581, 1088400267),
    (1716185263, 1854787491),
    (1376580201, 1232262117),
    (126093127, 1718349005),
    (1255154079, 929465995),
    (1495162255, 1110399377),
    (253380337, 223979957),
    (331484111, 2008330133),
)


def sql_minhash_coeffs_values(num_hashes: int = 12) -> str:
    """DuckDB VALUES list ``(seed, a, b)`` matching MINHASH_COEFFS."""
    rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    )
    return f"(VALUES {rows}) AS coeffs(seed, a, b)"


def minhash_signatures(
    shingled: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
) -> DataFrame:
    """One row per doc with columns mh0..mh{k-1}:
    minhash_j = min over shingles of (a_j*h1 + b_j*h2) mod (2^31 - 1).

    ONE md5 per shingle (not k): h1/h2 are two disjoint 7-hex-digit
    (28-bit) slices of md5(shingle) parsed to BIGINT — engine-portable
    (DuckDB ``CAST('0x'||substr(md5(x),i,7) AS BIGINT)`` is
    bit-identical) — and the k seed hashes are a universal hashing
    family over them with fixed odd coefficients. The modular wrap
    decorrelates the per-seed shingle orderings (a naive h1 + j*h2
    combination lets one low-hash shingle win EVERY seed, which
    collapses band independence and floods the candidate set with
    low-Jaccard pairs — measured, not hypothetical). Bounds:
    a_j,b_j < 2^31 and h1,h2 < 2^28, so a*h1 + b*h2 < 2^60 — no signed
    64-bit overflow in either engine.

    Wide-aggregation form: ONE shuffle of the raw shingles with k min()
    aggregates (map-side partials); all partials/shuffle rows are
    8-byte longs.
    """
    hashed = shingled.select(
        id_col,
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 7), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5(F.col("shingle")), 9, 7), 16, 10)
        .cast("long")
        .alias("h2"),
    )
    aggs = [
        F.min(
            (F.lit(a) * F.col("h1") + F.lit(b) * F.col("h2")) % F.lit(MINHASH_P)
        ).alias(f"mh{j}")
        for j, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    ]
    return hashed.groupBy(id_col).agg(*aggs)



def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing >=1 LSH band.

    Pipeline: codegen shingle explode (no DISTINCT) -> ONE groupBy(doc)
    shuffle computing all k minhashes as wide min() aggregates -> band
    signatures by direct
    column concat -> stack to (doc, band, sig) -> bucket self-join.
    No global pairwise comparison ever happens; cost is linear +
    per-bucket quadratic. Shingles are NOT deduped first — min() is
    multiset-insensitive, so the distinct shuffle would be pure waste.

    (A fully shuffle-free per-row variant — minhash over a per-row
    shingle array — loses badly in practice: each of the k minhash
    columns re-inlines the whole shingle pipeline after projection
    collapse. The exploded+wide-agg form is ~10x faster.)
    """
    sh = doc_shingles(df, text_col, id_col, n, distinct=False)
    return lsh_candidate_pairs_on_shingles(sh, id_col, num_hashes, band_rows)


def lsh_candidate_pairs_on_shingles(
    shingled: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    band_rows: int = 3,
) -> DataFrame:
    """:func:`lsh_candidate_pairs` from an EXISTING (id, shingle) frame
    (non-distinct is fine — min() is multiset-insensitive). Split out
    (round 15) so a pipeline that needs the shingles for another
    consumer too (e.g. benchmark decontamination) can materialize ONE
    shingle pass and feed both legs instead of re-running the corpus
    explode per leg (guide §2.4)."""
    mh = minhash_signatures(shingled, id_col, num_hashes)
    sigs = band_signatures(mh, id_col, num_hashes, band_rows)
    a = sigs.select(F.col(id_col).alias("doc_a"), "band", "band_sig")
    b = sigs.select(F.col(id_col).alias("doc_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def band_signatures(
    mh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    band_rows: int = 3,
) -> DataFrame:
    """(id, band, band_sig) rows from an mh0..mh{k-1} signature table —
    the LSH banding step, shared by one-shot and incremental dedup."""
    n_bands = num_hashes // band_rows
    band_cols = []
    for b in range(n_bands):
        sig = F.concat_ws(
            "|",
            *[
                F.col(f"mh{b * band_rows + r}").cast("string")
                for r in range(band_rows)
            ],
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), sig.alias("band_sig")))
    return mh.select(id_col, F.explode(F.array(*band_cols)).alias("bs")).select(
        id_col, F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig")
    )


def incremental_lsh_pairs(
    spark,
    sig_table,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
    txn_id: str | None = None,
):
    """Dedup-at-ingest: returns (version, pairs) where ``pairs`` are
    the candidate pairs INVOLVING the new batch, and the new batch's
    minhash signatures are merged into ``sig_table`` (a VersionedTable
    keyed on ``id_col``) as one atomic commit.

    The 100 TB ingest shape: the corpus is never re-shingled — each
    batch computes its own signatures (linear in the batch), MERGEs
    them into the persistent signature table, then probes band buckets
    with the BATCH side as the small build input. Cost per batch is
    O(batch + matching buckets), independent of corpus size; the
    signature table is ~(k longs)/doc, orders of magnitude below the
    corpus. ``txn_id`` passes through to the MERGE, so a replayed batch
    (stream retry) neither duplicates signatures nor re-reports pairs
    from a double-merge. Pair semantics match lsh_candidate_pairs on
    the union corpus, restricted to pairs touching the batch: both
    sides band with the same universal-hash minhashes.
    """
    sh = doc_shingles(new_docs, text_col, id_col, n, distinct=False)
    new_mh = minhash_signatures(sh, id_col, num_hashes)
    if sig_table.latest_version() is None:
        version = sig_table.create(new_mh)
    else:
        version = sig_table.merge(spark, new_mh, keys=[id_col], txn_id=txn_id)
    all_mh = sig_table.read(spark, version)
    new_bands = band_signatures(new_mh, id_col, num_hashes, band_rows).select(
        F.col(id_col).alias("doc_b"), "band", "band_sig"
    )
    all_bands = band_signatures(all_mh, id_col, num_hashes, band_rows).select(
        F.col(id_col).alias("doc_a"), "band", "band_sig"
    )
    pairs = (
        all_bands.join(F.broadcast(new_bands), ["band", "band_sig"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    return version, pairs


def doc_shingle_words(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, w0..w{n-1}) rows — one row per n-gram, words kept as
    separate columns so consumers can hash the tuple directly without
    ever materializing the concatenated shingle string (measured ~2x
    on the LSH fast path: the concat_ws dominated once hashing became
    cheap)."""
    w = F.split(F.lower(F.col(text_col)), " ")
    sz = F.greatest(F.size(w) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(w, k + 1, sz) for k in range(n)])
    return df.select(id_col, F.explode(z).alias("g")).select(
        id_col, *[F.col(f"g.{k}").alias(f"w{k}") for k in range(n)]
    )


def minhash_signatures_fast(
    shingled_words: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    n: int = 3,
) -> DataFrame:
    """Production minhash: one row per doc, columns mh0..mh{k-1} as
    minhash_j = min over shingles of xxhash64(j, w0..w{n-1}) — longs.

    The 100 TB path (VERDICT.md r3 ask #2): xxhash64 stays entirely in
    JVM codegen on the raw word columns (no shingle string is ever
    built), vs md5's 32-char hex strings + UTF-8 lexicographic minima.
    Same wide-aggregation shape as minhash_signatures (ONE shuffle, k
    min() map-side partials); only the hash family differs, so banding
    math (1-(1-s^r)^b) is unchanged. A 2-hash Kirsch-Mitzenmacher
    combiner measured SLOWER than k direct xxhash64 calls here (the
    xor/rotate expression tree beats codegen'd xxhash64 only for much
    larger k). Not engine-portable — minhash_signatures is the oracle
    twin."""
    words = [f"w{k}" for k in range(n)]
    aggs = [
        F.min(F.xxhash64(F.lit(j), *words)).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return shingled_words.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs_fast(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) sharing >=1 LSH band —
    xxhash64 production variant of lsh_candidate_pairs.

    Same pipeline shape (shingle explode -> ONE wide-agg shuffle ->
    band stack -> bucket self-join), but every hot value is a long:
    no shingle string is ever concatenated (words feed xxhash64 as a
    tuple), minhashes are xxhash64 longs, and each band signature is
    one xxhash64 fold of its row minhashes, so the self-join key is
    (int, long) instead of (int, 100-char string). Band-signature
    collisions (~2^-64) can only ADD candidates, never lose them —
    safe for candidate generation feeding exact verification or
    component clustering.
    """
    sh = doc_shingle_words(df, text_col, id_col, n)
    return lsh_candidate_pairs_fast_on_words(
        sh, id_col, n, num_hashes, band_rows
    )


def lsh_candidate_pairs_fast_on_words(
    shingled_words: DataFrame,
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 12,
    band_rows: int = 3,
) -> DataFrame:
    """:func:`lsh_candidate_pairs_fast` from an EXISTING word-tuple
    shingle frame (see :func:`doc_shingle_words`) — the shared-shingle
    split, as in :func:`lsh_candidate_pairs_on_shingles`."""
    mh = minhash_signatures_fast(shingled_words, id_col, num_hashes, n)
    n_bands = num_hashes // band_rows
    band_cols = []
    for b in range(n_bands):
        sig = F.xxhash64(
            *[F.col(f"mh{b * band_rows + r}") for r in range(band_rows)]
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), sig.alias("band_sig")))
    sigs = mh.select(
        id_col, F.explode(F.array(*band_cols)).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.band_sig").alias("band_sig"))
    a = sigs.select(F.col(id_col).alias("doc_a"), "band", "band_sig")
    b = sigs.select(F.col(id_col).alias("doc_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_bits(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """Per-doc SimHash signature string of ``bits`` 0/1 chars.

    Bit i is derived from hex digit i of md5(token): (digit & 1). Tokens
    vote +1/-1 per bit with multiplicity; the sign of the sum is the
    signature bit. Identical signatures => near-identical token bags.
    """
    toks = df.select(
        id_col, F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).withColumn("h", F.md5("tok"))
    hexmap = "0123456789abcdef"
    aggs = []
    for i in range(bits):
        digit = F.instr(F.lit(hexmap), F.substring(F.col("h"), i + 1, 1)) - 1
        vote = F.when(digit % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
        aggs.append(F.sum(vote).alias(f"s{i}"))
    sums = toks.groupBy(id_col).agg(*aggs)
    sig = F.concat(
        *[
            F.when(F.col(f"s{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )
    return sums.select(id_col, sig.alias("simhash"))


# --- DuckDB SQL twins ------------------------------------------------------

def sql_shingles_cte(corpus: str, n: int = 3) -> str:
    """CTE body producing (doc_id, shingle) distinct from ``corpus``."""
    parts = " || ' ' || ".join(f"w[i+{k}]" for k in range(n))
    return f"""
      SELECT DISTINCT doc_id, shingle
      FROM (
        SELECT doc_id,
               unnest(CASE WHEN len(w) >= {n}
                 THEN list_transform(range(1, len(w) - {n - 2}), i -> {parts})
                 ELSE [] END) AS shingle
        FROM (SELECT doc_id, str_split(lower(text), ' ') AS w FROM {corpus})
      )
    """


def lsh_tune(
    num_hashes: int,
    threshold: float,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
) -> tuple[int, int]:
    """Choose the (band_rows, n_bands) banding of ``num_hashes`` minhash
    functions for a target Jaccard ``threshold``.

    The S-curve P(candidate | s) = 1 - (1 - s^r)^b trades false
    positives (pairs below the threshold that still collide in some
    band — wasted verification work) against false negatives (true
    near-dups never colliding — missed dedup). For each feasible
    (r, b = num_hashes // r) this integrates both error masses around
    the threshold numerically and picks the banding minimizing their
    weighted sum (the standard tuning, cf. Leskovec/Rajaraman/Ullman
    "Mining of Massive Datasets" §3.4 and the datasketch library).

    At 100 TB the asymmetry matters: a false positive costs one
    candidate-pair verification, a false negative leaks a duplicate
    into the training corpus — weight accordingly.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_hashes < 2:
        raise ValueError("num_hashes must be >= 2")
    steps = 1000
    best: tuple[float, int, int] | None = None
    for r in range(1, num_hashes + 1):
        b = num_hashes // r
        if b < 1:
            break
        fp = fn = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s**r) ** b
            if s < threshold:
                fp += p / steps
            else:
                fn += (1.0 - p) / steps
        err = fp_weight * fp + fn_weight * fn
        if best is None or err < best[0]:
            best = (err, r, b)
    assert best is not None
    return best[1], best[2]
