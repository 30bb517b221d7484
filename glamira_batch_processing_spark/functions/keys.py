"""Deterministic surrogate keys.

The reference derives BIGINT surrogate keys with
``ABS(FARM_FINGERPRINT(concat(natural key parts, '|')))``
(ref: models/staging/stg_order.sql:88-102, stg_location.sql:4-12,
stg_product.sql:40-41, marts/mart_dim_customer.sql:67).

We keep the same contract — deterministic signed-64-bit hash of a
``'|'``-joined natural key, collision-stable across runs — but use
Spark's native ``xxhash64`` (JVM-side, codegen'd). Hash VALUES therefore
differ from FARM_FINGERPRINT; key-equality semantics are identical.
Oracle comparisons are done on the pre-hash natural-key string (exposed
by :func:`key_input`), per FIXTURES.md guidance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def key_input(*parts: Column) -> Column:
    """The '|'-joined, null-coalesced natural-key string fed to the hash."""
    coalesced = [F.coalesce(p.cast("string"), F.lit("")) for p in parts]
    return F.concat_ws("|", *coalesced)


def surrogate_key(*parts: Column) -> Column:
    """abs(xxhash64(...)) as string — same shape the reference emits."""
    return F.abs(F.xxhash64(key_input(*parts))).cast("string")


def item_key(
    order_id: Column,
    product_id: Column,
    option_id: Column,
    cp_offset: Column,
    opt_offset: Column,
    time_stamp: Column,
) -> Column:
    """Line-item grain key: order x product x option x positions x ts.

    ref: models/staging/stg_order.sql:88-102 (offsets default to -1 when
    the explode produced a null position — NULL cart rows survive).
    """
    return surrogate_key(
        F.coalesce(order_id.cast("string"), F.lit("")),
        F.coalesce(product_id.cast("string"), F.lit("")),
        F.coalesce(option_id.cast("string"), F.lit("")),
        F.coalesce(cp_offset, F.lit(-1)).cast("string"),
        F.coalesce(opt_offset, F.lit(-1)).cast("string"),
        F.coalesce(time_stamp, F.lit(-1)).cast("string"),
    )


def location_key(country_code: Column, region: Column, city: Column) -> Column:
    """Geo dedupe key from lower(trim(country|region|city)).

    ref: models/staging/stg_location.sql:4-12.
    """
    return surrogate_key(
        F.lower(F.trim(country_code.cast("string"))),
        F.lower(F.trim(region.cast("string"))),
        F.lower(F.trim(city.cast("string"))),
    )
