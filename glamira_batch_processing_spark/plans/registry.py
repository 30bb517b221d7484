"""Driver-contract query registry.

Every operator family from SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible)
a DuckDB oracle SQL string computing the identical result over the same
parquet tables. ``__spark_entry__.py`` re-exports the two dicts.

Output-type convention (keeps the driver's order-insensitive value-hash
stable across Spark and DuckDB):
- no raw DecimalType or TimestampType in outputs — aggregate exactly in
  decimal, then cast to double; emit dates as DateType or timestamps as
  epoch micros (bigint);
- every computed column is aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# DataFrame handles per (session, path): skips re-listing parquet
# footers when the driver runs all ~60 queries back-to-back. Plans are
# immutable, so sharing the lazy handle is safe. Keyed on the Spark
# applicationId (stable and unique per session, unlike id(spark) which
# the allocator can reuse after a stopped session is collected) and
# bounded: a new applicationId evicts every dead session's entries.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def query(name: str, oracle: str | None = None):
    """Register a contract query (and optionally its DuckDB oracle SQL).

    Raises on duplicate registration: a bare ``@query(...)`` block
    inserted above an existing decorated function silently re-registers
    the WRONG callable (two stacked decorators, one function) — exactly
    the misplacement commit c737257 had to repair after a driver_sim
    failure. Raising turns that class of silent mis-registration into
    an import error; tests/test_registry_audit.py additionally asserts
    each registered callable's ``__name__`` matches its key."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} already maps to "
                f"{QUERIES[name].__name__!r}; refusing to overwrite with "
                f"{fn.__name__!r} (stacked/misplaced @query decorator?)"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; column pruning/pushdown flow to the scan.

    ``events.ts`` has shipped in two physical encodings across driver
    testdata generations: parquet INT64 TIMESTAMP(NANOS) (which Spark's
    vectorized reader rejects — read nanos as long and floor-divide to
    micros, exactly how DuckDB coerces ns -> its microsecond TIMESTAMP)
    and plain ``timestamp[us]`` without timezone (which Spark reads as
    TIMESTAMP_NTZ — cast to session-TZ TIMESTAMP under UTC so epoch
    arithmetic matches DuckDB's tz-less TIMESTAMP). Both normalize to
    the identical instant; every query sees one ``ts: timestamp``.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    app_id = spark.sparkContext.applicationId
    key = (app_id, f"{sf_dir}/{name}")
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    if any(k[0] != app_id for k in _TABLE_CACHE):
        # A different (necessarily dead — local mode is one-at-a-time)
        # session's handles are unusable; drop them so the cache stays
        # bounded across session restarts and sf_dirs.
        stale = [k for k in _TABLE_CACHE if k[0] != app_id]
        for k in stale:
            del _TABLE_CACHE[k]
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Wall-clock micros; under the UTC session TZ pinned above the
            # cast re-labels the same instant. Explicit type object so a
            # spark.sql.timestampType=TIMESTAMP_NTZ session conf can't turn
            # this into a no-op.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        elif not isinstance(ts_type, T.TimestampType):
            raise TypeError(
                f"events.ts: unexpected parquet encoding {ts_type}; "
                "expected TIMESTAMP(NANOS)-as-long, timestamp_ntz, or timestamp"
            )
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _TABLE_CACHE[key] = df
    return df


def fan_out(df: DataFrame, *keys: str) -> DataFrame:
    """Scale-adaptive compute fan-out (round 14, guide §2.5 input skew /
    §8 "shuffle the light proxy, compute heavy bytes after").

    Expression-heavy projections (nested to_json/from_json, regex
    batteries, Arrow-batched kernels) inherit the SCAN's parallelism.
    The bench parquet inputs are single-row-group files, so every scan
    is ONE task and pre-shuffle per-row work runs on one core of 32 —
    byte-range splitting cannot help (a row group is indivisible).
    This helper hash-repartitions a NARROW input (call it on the
    projected key columns, before attaching heavy expressions) up to
    cluster parallelism, but ONLY when the input's planned partitioning
    is actually below it: on a production cluster reading well-sized
    multi-row-group files the scan is already parallel and this is a
    no-op — the repartition is derived from input shape, not a local
    constant. The exchange it may add carries only the projected
    columns (e.g. one 8-byte key), per guide §8.

    Two deliberate choices (ADVICE r14, round-15 disposition):
    - The partition COUNT is pinned (``repartition(n, keys)``), not
      left to AQE: fan-out exists precisely because the downstream
      per-row work is heavy while the DATA is small, and AQE's
      coalescing (advisory partition size >= 64 MB) would merge the
      deliberately-small partitions straight back to one, undoing the
      fan-out. Pinning is the point, not an oversight.
    - The ``df.rdd.getNumPartitions()`` probe compiles a physical plan
      per call site at query-build time (driver-side, milliseconds
      here) and is unsupported under Spark Connect; this engine
      targets classic Spark and builds each query once per run, so the
      probe's cost is immaterial and the committed plan artifacts are
      generated on this environment's parallelism (plans ARE
      environment-dependent by design — the guard makes the exchange
      vanish on parallel scans).
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    if keys:
        from pyspark.sql import functions as F

        return df.repartition(n, *[F.col(k) for k in keys])
    return df.repartition(n)


def _next_day(date_str: str) -> str:
    import datetime

    d = datetime.date.fromisoformat(date_str) + datetime.timedelta(days=1)
    return d.isoformat()


# Pushdown-friendly date predicates over timestamp columns. The naive
# form ``to_date(ts) <op> DATE 'D'`` wraps the column in a conversion,
# which (a) blocks parquet predicate pushdown and (b) costs a per-row
# date extraction; the equivalent direct timestamp comparison reaches
# the scan as a PushedFilter (round-8 q1 profiling: -15% end-to-end).
# Standard date-truncation algebra — exact for ANY time-of-day
# component, any timestamp flavor (string literals let Spark coerce to
# the column's own type):
#   to_date(ts) >= D  <=>  ts >= D 00:00
#   to_date(ts) <  D  <=>  ts <  D 00:00
#   to_date(ts) >  D  <=>  ts >= (D+1) 00:00
#   to_date(ts) <= D  <=>  ts <  (D+1) 00:00
def date_ge(col: str, date_str: str):
    from pyspark.sql import functions as F

    return F.col(col) >= F.lit(date_str)


def date_lt(col: str, date_str: str):
    from pyspark.sql import functions as F

    return F.col(col) < F.lit(date_str)


def date_gt(col: str, date_str: str):
    from pyspark.sql import functions as F

    return F.col(col) >= F.lit(_next_day(date_str))


def date_le(col: str, date_str: str):
    from pyspark.sql import functions as F

    return F.col(col) < F.lit(_next_day(date_str))


def date_between(col: str, lo: str, hi: str):
    """to_date(col) BETWEEN lo AND hi, pushdown-friendly (inclusive)."""
    return date_ge(col, lo) & date_le(col, hi)
