"""Training-data preparation operators.

Beyond the reference's surface (its pipeline ends at warehouse marts):
the operations a large-scale LLM training-data pipeline runs between
"deduped corpus" and "tokenizer input". Everything here is pure Column
expressions — JVM-side, whole-stage-codegen, zero UDFs — and every
randomized-looking decision is a deterministic md5 hash, so results are
reproducible run-over-run AND bit-identical across engines (the DuckDB
oracles compute the same md5 buckets).

Scale notes (per operator):
- hash_split / stratified_sample: stateless per-row map — no shuffle,
  no coordination, trivially correct under any partitioning. This is
  the only split/sample design that survives 100 TB: a global
  orderBy-then-slice or a driver-side sampling pass would not.
- redact_pii: per-row regexp chain, fused into the scan projection.
- chunk_token_windows: explode multiplies rows by ~n_tokens/stride;
  output partitioning inherits the input, so no shuffle is introduced.
- pack_sequences: one shuffle (window over the stream key). The pack
  assignment is a running-sum formula, NOT a driver-side bin packer —
  first-fit packing is inherently sequential, so we trade a little
  packing density for a fully parallel, deterministic assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Deterministic hash bucketing.
# ---------------------------------------------------------------------------


def hash_bucket(key: Column, n_buckets: int, salt: str = "") -> Column:
    """Uniform bucket in [0, n_buckets) from md5 of the key (+ salt).

    Engine-portable: first 8 md5 hex digits parsed as a base-16 int —
    DuckDB spells it ``CAST('0x' || substr(md5(k), 1, 8) AS BIGINT)``.
    md5's avalanche makes buckets independent of any structure in the
    key, unlike modulo on a sequential id.
    """
    h = F.conv(F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8), 16, 10)
    return (h.cast("long") % n_buckets).cast("int")


def hash_bucket_sql(key_sql: str, n_buckets: int, salt: str = "") -> str:
    """The DuckDB rendering of :func:`hash_bucket` (for oracle SQL)."""
    salted = f"CAST({key_sql} AS VARCHAR) || '{salt}'" if salt else f"CAST({key_sql} AS VARCHAR)"
    return (
        f"CAST(CAST(concat('0x', substr(md5({salted}), 1, 8)) AS BIGINT)"
        f" % {n_buckets} AS INTEGER)"
    )


def hash_split(
    df: DataFrame,
    key: Column,
    splits: dict[str, int],
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by deterministic hash.

    ``splits`` maps name -> percentage; values must sum to 100. A row's
    split is stable under re-runs, insertions, deletions, and
    repartitioning — the property a train/val/test split must have so
    that growing the corpus never moves an old document across the
    train/eval boundary (leakage).
    """
    total = sum(splits.values())
    if total != 100:
        raise ValueError(f"split percentages must sum to 100, got {total}")
    bucket = hash_bucket(key, 100, salt)
    expr = F.when(F.lit(False), F.lit(None))
    lo = 0
    for name, pct in splits.items():
        expr = expr.when(bucket < lo + pct, F.lit(name))
        lo += pct
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    key: Column,
    stratum: Column,
    fractions: dict[str, float],
    default_fraction: float,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling.

    Keeps a row iff hash_bucket(key) / 10000 < fraction(stratum) — the
    standard recipe for rebalancing a corpus (e.g. downweight English,
    keep all low-resource languages) without a shuffle or a count pass.
    """
    bucket = hash_bucket(key, 10000, salt)
    frac = F.when(F.lit(False), F.lit(None))
    for name, f in fractions.items():
        frac = frac.when(stratum == name, F.lit(int(f * 10000)))
    frac = frac.otherwise(F.lit(int(default_fraction * 10000)))
    return df.filter(bucket < frac)


_ES_GRID = 1 << 30


def es_key(key: Column, weight: Column, salt: str = "wsample-v1") -> Column:
    """Efraimidis-Spirakis sampling key: -ln(u)/w with a deterministic
    md5 uniform u. The k smallest keys across the dataset form an EXACT
    weighted sample without replacement (each row's key is exponential
    with rate w; the order statistics realize the sequential weighted
    draw). u comes from the same engine-portable md5 grid hash_bucket
    uses, so the DuckDB oracle reproduces the identical sample."""
    u = (hash_bucket(key, _ES_GRID, salt).cast("double") + 0.5) / float(_ES_GRID)
    return -F.log(u) / weight


def weighted_sample(
    df: DataFrame,
    key: Column,
    weight: Column,
    k: int,
    tiebreak: Column,
    salt: str = "wsample-v1",
) -> DataFrame:
    """Exactly-k weighted sample without replacement (A-ES).

    Inclusion probability tracks ``weight`` (rows with non-positive or
    NULL weight are excluded — they have no well-defined draw). Plans
    as TakeOrderedAndProject: per-partition top-k heaps + a k-row
    driver merge — no global sort, no count pass, and the top-k merge
    is associative, so the sample is identical under any partitioning
    and any cluster size. ``tiebreak`` (a unique column) pins the
    order if two keys ever collide exactly.

    The es_key itself is intentionally NOT emitted: it involves ln(),
    whose last-ulp differs across engines' libm — selection is robust
    to that (keys are continuous, boundary ties measure-zero) but
    value-hash comparison of the key would not be.
    """
    keyed = df.filter(weight > 0).withColumn(
        "__es", es_key(key, weight, salt)
    )
    return keyed.orderBy(F.col("__es"), tiebreak).limit(k).drop("__es")


# ---------------------------------------------------------------------------
# PII redaction.
# ---------------------------------------------------------------------------

# Conservative patterns that parse identically under Java regex (Spark)
# and RE2 (DuckDB): no lookaround, no backrefs, no \d shorthand-class
# surprises inside character classes.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
}


def redact_pii(
    df: DataFrame, text_col: str, out_col: str = "text_redacted"
) -> DataFrame:
    """Replace emails / IPv4s / phone-shaped tokens with typed tags and
    count each kind (columns n_email / n_ipv4 / n_phone).

    Order matters: emails first (an email can contain digits-and-dots
    that the ipv4 pattern would half-match), then ipv4, then phone.
    Pure regexp_replace chain — fuses into the scan projection.
    """
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.coalesce(F.regexp_count(F.col(text_col), F.lit(pat)), F.lit(0)),
        )
    redacted = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return out.withColumn(out_col, redacted)


# ---------------------------------------------------------------------------
# Token-window chunking.
# ---------------------------------------------------------------------------


def chunk_token_windows(
    df: DataFrame,
    text_col: str,
    id_cols: list[str],
    window: int,
    stride: int,
    token_sep: str = " ",
) -> DataFrame:
    """Split each document into overlapping token windows.

    ``window`` tokens per chunk, advancing ``stride`` tokens (so
    consecutive chunks overlap by ``window - stride``); the standard
    context-window preparation for LLM pretraining. Every document
    yields at least one chunk; the final chunk is short rather than
    padded. Output: id_cols + chunk_idx + chunk_text + n_tokens.

    Pure explode over a ``sequence()`` — row growth is the only cost,
    and the explode pipelines with the scan (no shuffle).
    """
    toks = F.split(F.col(text_col), token_sep)
    n = F.size(toks)
    # number of stride steps fully covering the doc: ceil(max(n-window,0)/stride)+1
    n_chunks = (
        F.ceil((F.greatest(n - F.lit(window), F.lit(0))) / F.lit(stride)).cast("int")
        + F.lit(1)
    )
    out = df.select(
        *id_cols,
        toks.alias("__toks"),
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride  # 0-based
    n_in_chunk = F.least(F.lit(window), F.col("__n") - start)
    return out.select(
        *id_cols,
        "chunk_idx",
        F.array_join(F.slice(F.col("__toks"), start + 1, F.lit(window)), token_sep).alias(
            "chunk_text"
        ),
        n_in_chunk.cast("int").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Sequence packing.
# ---------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    stream_col: str,
    order_col: str,
    n_tokens_col: str,
    budget: int,
    out_col: str = "pack_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs, streaming in
    ``order_col`` order within each ``stream_col``.

    pack_id = floor(cumulative_tokens_before_this_doc / budget): a doc
    goes in the pack its stream offset lands in. Packs can overflow by
    at most one document (the straddler) — the deterministic, windowed
    approximation of first-fit packing. One shuffle (the window on
    stream_col); no driver-side sequential pass, which is what makes it
    usable at 100 TB where true first-fit is not parallelizable.
    """
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(n_tokens_col)).over(w)
    before = running - F.col(n_tokens_col)
    return df.withColumn(out_col, F.floor(before / budget).cast("long"))
