"""Deterministic sketches: K-Minimum-Values + HyperLogLog (distinct
count) and Count-Min (frequency).

KMV: a distinct-count estimator whose state is the k smallest hash
values of the distinct items: estimate = (k-1) / kth_min_fraction.
KMV over md5 hex strings is exactly reproducible in any SQL engine —
so the sketch itself can be oracle-checked, not just its error bound.

HLL: the classic register sketch, made engine-portable the same way —
register index and rho both derive from md5 bits via integer/string
ops both engines evaluate identically (see hll_sketch), so the full
register state is cell-exact under a SQL oracle. Constant state (m
registers), max-semilattice merge: the right distinct-counter when
streams/shards must merge without rescanning (KMV merges too, but HLL
registers are idempotent under replay).

Count-Min: a fixed-size d x w counter matrix; item frequency is
over-estimated as min over d rows of counter[row][hash_row(item)].
The state is deterministic (md5-derived buckets), mergeable by
element-wise addition (associative — partial sketches from map-side
combine or separate corpus shards just add), and computes with ONE
shuffle of (depth, bucket) partial counts whose cardinality is d*w —
constants — regardless of corpus size. The 100 TB story: frequency
estimates for EVERY token at a fixed memory budget, where the exact
heavy-hitters count keeps full (lang, token) cardinality state.

Scale path (KMV): the min-k state is tiny (k hashes), merges by
union+min-k (associative), and computes with one TakeOrdered — no full
shuffle of the distinct set when k << distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_32 = 4294967296.0


def kmv_sketch(df: DataFrame, col: Column, k: int = 64) -> DataFrame:
    """The k lexicographically-smallest md5 hashes of distinct values —
    the sketch state (mergeable by union + re-min-k)."""
    return (
        df.select(F.md5(col.cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_estimate(df: DataFrame, col: Column, k: int = 64) -> DataFrame:
    """One row: (k_used, kth_min_frac, estimated_distinct).

    The hash is mapped to a fraction in [0,1) via its first 8 hex chars
    (monotone with the full-string ordering, so min-k by string = min-k
    by fraction).
    """
    mins = kmv_sketch(df, col, k)
    frac = (
        F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint").cast("double")
        / F.lit(TWO_32)
    )
    return mins.select(frac.alias("f")).agg(
        F.count("*").alias("k_used"),
        F.max("f").alias("kth_min_frac"),
        ((F.count("*") - 1) / F.max("f")).alias("estimated_distinct"),
    )


def _cms_halves(col: Column, salt: str) -> tuple[Column, Column]:
    """(h1, h2): the first/second 32 bits of ONE salted md5 of the
    value, as longs. Kirsch–Mitzenmacher double hashing (ASA 2006,
    "Less hashing, same performance") derives all d Count-Min bucket
    functions as bucket_d = (h1 + d*h2) mod width from this single
    digest — same eps*N overestimate bound, one hash per token instead
    of d. The digest arithmetic is engine-portable (DuckDB spells it
    in :func:`sql_cms_sketch`), and h1 + 3*h2 < 2^34 fits BIGINT on
    both engines.

    Callers must materialize these in their OWN projection (a separate
    select) before fanning out the d buckets: md5/conv subtrees are
    not common-subexpression-eliminated across array/struct fields, so
    inlining them d times re-hashes d times (measured 1.7x slower).
    CollapseProject keeps the split because the halves are non-cheap
    and multiply referenced.
    """
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return h1, h2


def _cms_cells_from_halves(depth: int, width: int) -> Column:
    """The d (depth, bucket) structs from pre-projected __h1/__h2."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                ((F.col("__h1") + F.lit(d) * F.col("__h2")) % width)
                .cast("int")
                .alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    col: Column,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms-v1",
    weight: Column | None = None,
) -> DataFrame:
    """Count-Min state: (depth, bucket, n) rows — the d x w matrix.

    Each input row increments one bucket per depth; the d bucket
    functions derive from ONE salted md5 via double hashing
    (:func:`_cms_bucket_cells` — one digest per token, not d). Built
    as a per-row explode of d (depth, bucket) structs -> ONE groupBy
    shuffle whose key space is d*w constants, with map-side partial
    aggregation doing almost all the work. Merging shards = unionByName
    + re-groupBy sum (element-wise matrix addition).

    ``weight`` turns each row into that many increments (the sketch is
    linear, so count-then-sketch is exactness-preserving): pre-combine
    equal keys upstream with a groupBy count and pass the count here —
    the hash + d-way explode then run over the DISTINCT key set instead
    of every occurrence, cutting both the digest work and the exploded
    volume by the corpus/vocabulary ratio.
    """
    h1, h2 = _cms_halves(col, salt)
    w_expr = F.lit(1).cast("long") if weight is None else weight.cast("long")
    return (
        df.select(h1.alias("__h1"), h2.alias("__h2"), w_expr.alias("__w"))
        .select(
            F.col("__w"),
            F.explode(_cms_cells_from_halves(depth, width)).alias("c"),
        )
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("n"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms-v1",
) -> DataFrame:
    """(probe, est_count) per probe row: min over depths of the probe's
    bucket counter. The sketch matrix is tiny (d*w rows) — broadcast —
    so estimation is a map-side join per depth + one groupBy(probe)
    min, never a shuffle of the probed corpus. An absent (depth,
    bucket) cell means 0 — the estimate is then exactly 0.
    """
    h1, h2 = _cms_halves(F.col(probe_col), salt)
    probed = (
        probes.select(probe_col, h1.alias("__h1"), h2.alias("__h2"))
        .select(
            probe_col, F.explode(_cms_cells_from_halves(depth, width)).alias("c")
        )
        .select(
            probe_col,
            F.col("c.depth").alias("depth"),
            F.col("c.bucket").alias("bucket"),
        )
    )
    joined = probed.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return joined.groupBy(probe_col).agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count")
    )


def sql_cms_sketch(
    source_tokens: str,
    tok_sql: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms-v1",
) -> str:
    """DuckDB twin of :func:`cms_sketch` (bit-identical matrix): the
    same single-md5 double-hashing bucket derivation, spelled in SQL.
    Emits a plain SELECT (no WITH) so callers can splice it after
    their own CTE chain. Mirrors the Spark side's count-then-sketch
    shape (equal work under scripts/bench_compare.py): equal keys are
    pre-combined with a GROUP BY count, so both engines hash each
    DISTINCT token once and weight the increments."""
    return f"""
    SELECT CAST(u.range AS INTEGER) AS depth,
           CAST((hp.h1 + u.range * hp.h2) % {width} AS INTEGER) AS bucket,
           CAST(SUM(hp.occ) AS BIGINT) AS n
    FROM (
      SELECT CAST(concat('0x', substr(dig, 1, 8)) AS BIGINT) AS h1,
             CAST(concat('0x', substr(dig, 9, 8)) AS BIGINT) AS h2,
             occ
      FROM (
        SELECT md5(t || '{salt}') AS dig, occ
        FROM (
          SELECT CAST({tok_sql} AS VARCHAR) AS t, COUNT(*) AS occ
          FROM {source_tokens} GROUP BY 1
        )
      )
    ) hp
    CROSS JOIN range({depth}) u
    GROUP BY 1, 2
    """


def sql_kmv_estimate(source: str, col_sql: str, k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_estimate` (bit-identical output)."""
    return f"""
    WITH hashes AS (
      SELECT DISTINCT md5(CAST({col_sql} AS VARCHAR)) AS h FROM {source}
    ),
    mins AS (SELECT h FROM hashes ORDER BY h LIMIT {k}),
    fr AS (
      SELECT CAST(CAST(concat('0x', substr(h, 1, 8)) AS BIGINT) AS DOUBLE) / {TWO_32!r} AS f
      FROM mins
    )
    SELECT COUNT(*) AS k_used,
           max(f) AS kth_min_frac,
           (COUNT(*) - 1) / max(f) AS estimated_distinct
    FROM fr
    """


# ---------------------------------------------------------------------------
# HyperLogLog registers (cell-exact, engine-portable).
# ---------------------------------------------------------------------------


def hll_sketch(
    df: DataFrame,
    col: Column,
    m: int = 64,
    salt: str = "hll-v1",
) -> DataFrame:
    """HyperLogLog register state: (register, max_rho) rows.

    Register index = 16 md5 bits mod m (exact-uniform when m divides
    2^16); rho = leading-zero count of the next 48 md5 bits + 1,
    computed as ``49 - length(bin(x))`` — both engines render bin()
    without leading zeros, so the register state is cell-exact across
    Spark and DuckDB with no float anywhere. One groupBy shuffle whose
    key space is m constants (map-side combine does almost all work);
    merging shards or streaming micro-batches = unionByName +
    re-groupBy max (registers are a max-semilattice, so the merge is
    associative, commutative, idempotent — retry/speculation safe).
    """
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    idx = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m).cast("int")
    x = F.conv(F.substring(h, 5, 12), 16, 10).cast("long")
    rho = F.when(x == 0, F.lit(49)).otherwise(49 - F.length(F.bin(x))).cast("int")
    return (
        df.select(idx.alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def sql_hll_sketch(source: str, col_sql: str, m: int = 64, salt: str = "hll-v1") -> str:
    """DuckDB rendering of :func:`hll_sketch` (for oracle SQL)."""
    h = f"md5(CAST({col_sql} AS VARCHAR) || '{salt}')"
    idx = f"CAST(CAST('0x' || substr({h}, 1, 4) AS BIGINT) % {m} AS INTEGER)"
    x = f"CAST('0x' || substr({h}, 5, 12) AS BIGINT)"
    rho = f"CAST(CASE WHEN {x} = 0 THEN 49 ELSE 49 - length(bin({x})) END AS INTEGER)"
    return f"""
    SELECT {idx} AS register, MAX({rho}) AS max_rho
    FROM {source}
    GROUP BY 1
    """


def hll_estimate(registers: list[tuple[int, int]], m: int = 64) -> float:
    """Driver-side estimate from collected (register, max_rho) rows.

    Raw HLL: alpha_m * m^2 / sum(2^-M_j), with the standard small-range
    linear-counting correction. The denominator is computed as the
    EXACT integer sum of 2^(49 - M_j) scaled by 2^-49, so the estimate
    is a deterministic function of the register state.
    """
    filled = dict(registers)
    zeros = m - len(filled)
    denom_int = sum(1 << (49 - rho) for rho in filled.values()) + zeros * (1 << 49)
    alpha = 0.709 if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / (denom_int * 2.0 ** -49)
    if raw <= 2.5 * m and zeros > 0:
        import math

        return m * math.log(m / zeros)
    return raw


# ---------------------------------------------------------------------------
# Theta-sketch set algebra over KMV states (union / intersection /
# Jaccard without joining the underlying corpora).
# ---------------------------------------------------------------------------


def _kmv_frac(h: Column) -> Column:
    """Hash-fraction in [0, 1) from the first 8 md5 hex chars (monotone
    with the full-string ordering — same mapping as kmv_estimate)."""
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint").cast("double")
        / F.lit(TWO_32)
    )


def kmv_theta_ops(
    df_a: DataFrame,
    col_a: Column,
    df_b: DataFrame,
    col_b: Column,
    k: int = 64,
) -> DataFrame:
    """One row of theta-sketch set estimates from two KMV sketches.

    The classic theta-sketch trick (Dasgupta et al., "Theta Sketch
    Framework"): form the UNION sketch as the k smallest hashes of
    A's-sketch union B's-sketch, take theta = its kth-min fraction, and
    count, among those k retained hashes, how many are present in BOTH
    input sketches (each retained hash is below both inputs' thresholds,
    so membership in the input sketch state decides true membership in
    the input SET for exactly these survivors). Then

      est_union       = (k_used - 1) / theta          (KMV estimator)
      est_intersect   = n_common / theta
      jaccard_k       = n_common / k_used

    Everything is a deterministic function of md5, so the whole output
    row is oracle-exact cross-engine — the sketch algebra itself is
    under test, not just its error bound.

    Scale design: each input sketch is one TakeOrdered over a map-side
    distinct (state = k hashes, no full shuffle of the distinct sets);
    the algebra then runs on two k-row relations — broadcast territory
    no matter the corpus size. At 100 TB this estimates cross-corpus
    overlap (e.g. train-vs-eval user contamination rate) for the cost
    of two scans and zero joins of the raw data.
    """
    sa = kmv_sketch(df_a, col_a, k).withColumn("in_a", F.lit(1))
    sb = kmv_sketch(df_b, col_b, k).withColumn("in_b", F.lit(1))
    u = (
        sa.select("h")
        .union(sb.select("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    flagged = (
        u.join(F.broadcast(sa), "h", "left")
        .join(F.broadcast(sb), "h", "left")
        .select(
            _kmv_frac(F.col("h")).alias("f"),
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
    )
    return flagged.agg(
        F.count("*").cast("bigint").alias("k_used"),
        F.max("f").alias("theta"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_common"),
        ((F.count("*") - 1) / F.max("f")).alias("est_union"),
        (F.sum(F.col("in_a") * F.col("in_b")) / F.max("f")).alias("est_intersect"),
        (F.sum(F.col("in_a") * F.col("in_b")) / F.count("*")).alias("jaccard_k"),
    )


def sql_kmv_theta_ops(
    source_a: str,
    col_a_sql: str,
    source_b: str,
    col_b_sql: str,
    k: int = 64,
) -> str:
    """DuckDB twin of :func:`kmv_theta_ops` (bit-identical output row)."""
    return f"""
    WITH ska AS (
      SELECT h FROM (
        SELECT DISTINCT md5(CAST({col_a_sql} AS VARCHAR)) AS h FROM {source_a}
      ) ORDER BY h LIMIT {k}
    ),
    skb AS (
      SELECT h FROM (
        SELECT DISTINCT md5(CAST({col_b_sql} AS VARCHAR)) AS h FROM {source_b}
      ) ORDER BY h LIMIT {k}
    ),
    u AS (
      SELECT h FROM (
        SELECT h FROM ska UNION SELECT h FROM skb
      ) ORDER BY h LIMIT {k}
    ),
    flagged AS (
      SELECT
        CAST(CAST(concat('0x', substr(u.h, 1, 8)) AS BIGINT) AS DOUBLE) / {TWO_32!r} AS f,
        CASE WHEN u.h IN (SELECT h FROM ska) THEN 1 ELSE 0 END AS in_a,
        CASE WHEN u.h IN (SELECT h FROM skb) THEN 1 ELSE 0 END AS in_b
      FROM u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
           max(f) AS theta,
           CAST(SUM(in_a * in_b) AS BIGINT) AS n_common,
           (COUNT(*) - 1) / max(f) AS est_union,
           SUM(in_a * in_b) / max(f) AS est_intersect,
           SUM(in_a * in_b) / CAST(COUNT(*) AS DOUBLE) AS jaccard_k
    FROM flagged
    """


# ---------------------------------------------------------------------------
# Bloom-filter membership (cell-exact, engine-portable).
# ---------------------------------------------------------------------------

_BLOOM_BITS_PER_WORD = 63  # stay clear of the BIGINT sign bit


def _bloom_positions(col: Column, m_bits: int, k: int, salt: str) -> Column:
    """Array of k deterministic bit positions in [0, m_bits) for a key:
    k disjoint 24-bit slices of ONE md5, each reduced mod m_bits —
    integer/string ops both engines evaluate identically (the same
    portability recipe as hll_sketch / cms_sketch)."""
    h = F.md5(F.concat(col.cast("string"), F.lit(salt)))
    return F.array(
        *[
            (
                F.conv(F.substring(h, 1 + 6 * i, 6), 16, 10).cast("long")
                % m_bits
            ).cast("int")
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    col: Column,
    m_words: int = 8,
    k: int = 3,
    salt: str = "bloom-v1",
) -> DataFrame:
    """Build an m_words x 63-bit Bloom filter as (word, mask) rows.

    The filter is a bit-OR semilattice, so the build is one map-side-
    combinable groupBy onto m_words rows — mergeable across shards or
    streaming micro-batches by element-wise OR (associative,
    commutative, idempotent: retry/speculation safe), the same merge
    law as the HLL registers' max. State is m_words longs no matter
    how many keys were inserted."""
    m_bits = m_words * _BLOOM_BITS_PER_WORD
    pos = df.select(
        F.explode(_bloom_positions(col, m_bits, k, salt)).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / _BLOOM_BITS_PER_WORD).cast("int").alias("word"),
            F.pmod(F.col("pos"), F.lit(_BLOOM_BITS_PER_WORD)).alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), bit))").alias("mask")
        )
    )


def bloom_probe(
    df: DataFrame,
    col: Column,
    words: DataFrame,
    m_words: int = 8,
    k: int = 3,
    salt: str = "bloom-v1",
    out: str = "maybe_present",
) -> DataFrame:
    """Probe: append ``out`` = 1 iff ALL k bits are set (no false
    negatives by construction; false positives at the standard
    (1-e^(-kn/m))^k rate, deterministic here because the hash family
    is fixed). The filter is m_words rows — broadcast; the probe side
    never shuffles."""
    m_bits = m_words * _BLOOM_BITS_PER_WORD
    probe = df.withColumn(
        "__pos", F.explode(_bloom_positions(col, m_bits, k, salt))
    ).select(
        *df.columns,
        (F.col("__pos") / _BLOOM_BITS_PER_WORD).cast("int").alias("word"),
        F.pmod(F.col("__pos"), F.lit(_BLOOM_BITS_PER_WORD)).alias("bit"),
    )
    hit = probe.join(F.broadcast(words), "word", "left").withColumn(
        "__bit_set",
        F.expr("shiftright(coalesce(mask, CAST(0 AS BIGINT)), bit) & 1"),
    )
    return (
        hit.groupBy(*df.columns)
        .agg(F.min("__bit_set").cast("int").alias(out))
    )


def sql_bloom_words_cte(
    source: str, col_sql: str, m_words: int = 8, k: int = 3,
    salt: str = "bloom-v1",
) -> str:
    """DuckDB rendering of :func:`bloom_build` as a CTE body."""
    m_bits = m_words * _BLOOM_BITS_PER_WORD
    h = f"md5(CAST({col_sql} AS VARCHAR) || '{salt}')"
    slices = ", ".join(
        f"CAST(CAST('0x' || substr({h}, {1 + 6 * i}, 6) AS BIGINT)"
        f" % {m_bits} AS INTEGER)"
        for i in range(k)
    )
    return f"""
      SELECT CAST(pos // {_BLOOM_BITS_PER_WORD} AS INTEGER) AS word,
             bit_or(CAST(1 AS BIGINT) << (pos % {_BLOOM_BITS_PER_WORD}))
               AS mask
      FROM (SELECT unnest([{slices}]) AS pos FROM {source})
      GROUP BY 1
    """
