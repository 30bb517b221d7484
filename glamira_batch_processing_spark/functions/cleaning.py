"""String/number cleaning helpers.

Spark-first re-expression of the reference's inline cleaning SQL:
- fake-null vocabulary            (ref: models/staging/stg_customer.sql:5-13)
- localized decimal parsing       (ref: models/staging/stg_order.sql:37-61)
- email normalization             (ref: models/marts/mart_dim_customer.sql:8)
- SAFE_DIVIDE                     (ref: models/audit/audit_null_rates_stg_order.sql:22-29)

All helpers are pure Column expressions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Values treated as null even though they are non-empty strings.
#: ref: models/staging/stg_customer.sql:9
FAKE_NULL_VOCAB = ("null", "n/a", "na", "none", "undefined")


def is_blank(c: Column) -> Column:
    """True when the value is NULL or trims to the empty string."""
    return c.isNull() | (F.trim(c) == F.lit(""))


def is_fake_null(c: Column) -> Column:
    """True when the value is one of the fake-null placeholder strings."""
    return F.lower(F.trim(c)).isin(*FAKE_NULL_VOCAB)


def clean_string(c: Column) -> Column:
    """Trim and nullify blanks / fake nulls. Returns NULL or trimmed value."""
    t = F.trim(c)
    return F.when(is_blank(c) | is_fake_null(c), F.lit(None)).otherwise(t)


def user_id_status(c: Column) -> Column:
    """Classify an id-ish string: NULL / EMPTY / FAKE_NULL / VALID.

    ref: models/staging/stg_customer.sql:5-13 (the ``user_check`` CTE).
    """
    s = c.cast("string")
    return (
        F.when(c.isNull(), F.lit("NULL"))
        .when(F.trim(s) == "", F.lit("EMPTY"))
        .when(F.lower(F.trim(s)).isin(*FAKE_NULL_VOCAB), F.lit("FAKE_NULL"))
        .otherwise(F.lit("VALID"))
    )


def normalize_email(c: Column) -> Column:
    """lower(trim(email)) — the canonical email form used by every join."""
    return F.lower(F.trim(c.cast("string")))


def parse_localized_number(c: Column, precision: int = 38, scale: int = 9) -> Column:
    """Parse a price string with unknown locale into a decimal.

    Exact re-expression of the reference's hairiest scalar expression
    (ref: models/staging/stg_order.sql:37-61):

    1. Normalize the Arabic decimal separator ``٫`` to ``.``.
    2. If the string contains BOTH ``,`` and ``.``:
       - ``,`` before ``.``  -> comma is a thousands separator: drop commas
         (``1,234.56`` -> ``1234.56``).
       - ``.`` before ``,``  -> European format: drop periods, then comma
         becomes the decimal point (``1.234,56`` -> ``1234.56``).
    3. If only ``,`` present -> comma is the decimal point.
    4. Strip spaces; lenient cast (NULL on garbage) like SAFE.PARSE_NUMERIC.

    Note the reference compares the FIRST occurrence of each separator
    (STRPOS), so pathological strings like ``1,2.3,4`` resolve the same
    way here.
    """
    # All replacements are literal, so use replace() (plain substring
    # scan) rather than regexp_replace() — keeps the regex engine out
    # of the hot path (same measured time on short price strings, but
    # no pattern-compilation or regex-state cost as strings grow).
    p = F.replace(c.cast("string"), F.lit("٫"), F.lit("."))
    has_comma = F.instr(p, ",") > 0
    has_period = F.instr(p, ".") > 0
    comma_first = F.instr(p, ",") < F.instr(p, ".")
    normalized = (
        F.when(
            has_comma & has_period,
            F.when(comma_first, F.replace(p, F.lit(","), F.lit(""))).otherwise(
                F.replace(F.replace(p, F.lit("."), F.lit("")), F.lit(","), F.lit("."))
            ),
        )
        .when(has_comma, F.replace(p, F.lit(","), F.lit(".")))
        .otherwise(p)
    )
    cleaned = F.trim(F.replace(normalized, F.lit(" "), F.lit("")))
    return cleaned.try_cast(f"decimal({precision},{scale})")


def parse_localized_number_sql(col_sql: str, precision: int = 38, scale: int = 9) -> str:
    """ANSI-SQL (DuckDB-compatible) rendering of :func:`parse_localized_number`.

    Used by oracle_sql() so the oracle replicates the identical parse.
    """
    p = f"replace(CAST({col_sql} AS VARCHAR), '٫', '.')"
    return f"""
      TRY_CAST(
        trim(replace(
          CASE
            WHEN strpos({p}, ',') > 0 AND strpos({p}, '.') > 0 THEN
              CASE WHEN strpos({p}, ',') < strpos({p}, '.')
                   THEN replace({p}, ',', '')
                   ELSE replace(replace({p}, '.', ''), ',', '.')
              END
            WHEN strpos({p}, ',') > 0 THEN replace({p}, ',', '.')
            ELSE {p}
          END, ' ', ''))
        AS DECIMAL({precision},{scale}))
    """.strip()


def safe_divide(num: Column, denom: Column) -> Column:
    """NULL instead of error/inf on zero denominator (BigQuery SAFE_DIVIDE)."""
    return F.when(denom == 0, F.lit(None)).otherwise(num / denom)
