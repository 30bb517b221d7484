"""Deterministic synthetic Glamira-shaped raw tables.

Reproduces the messiness the reference pipeline has to clean
(FIXTURES.md A1-A4): localized prices, raw currency labels, fake nulls,
placeholder/private/orphan IPs, shared emails, nested
cart_products[].option[] arrays with NULLs, JSON-ish product records
with a varying id key, duplicate locations per geo key.

Everything is derived from ``spark.range`` with modular arithmetic —
no RNG, so any SQL engine reading the written parquet can re-derive
expectations exactly.

Schema source of truth: ETL/summary_schema.json (events),
Source/step2_crawl_product_names.py:46-67 (product),
Source/connection_to_mongodb.py:103-121 (ip_location),
seeds/fx_to_usd_22_01_26.csv (fx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = [
    "view_product_detail",
    "select_product_option",
    "add_to_cart_action",
    "product_view_all_recommend_clicked",
    "checkout_success",  # selected by a separate ~1-in-5 branch below
]

TLDS = ["de", "co.uk", "fr", "se", "com", "dk", "it", "vn"]

CURRENCY_LABELS = ["USD $", "€", "£", "kr", "$", "zł", "Kč", "лв.", "din.", "R$", "", "د.ك.‏"]

#: 2015-01-01 UTC — the QA lower bound for event timestamps.
TS_BASE = 1420070400


def _ip(i):
    """IP drawn from a pool of 1000; index 0 maps to orphans/specials."""
    m = i % 1000
    return (
        F.when(i % 53 == 0, F.lit("0.0.0.0"))
        .when(i % 53 == 1, F.lit("127.0.0.1"))
        .when(i % 53 == 2, F.concat(F.lit("10.0.0."), (i % 250).cast("string")))
        .when(i % 53 == 3, F.concat(F.lit("192.168.1."), (i % 250).cast("string")))
        .when(i % 53 == 4, F.concat(F.lit("172.17.0."), (i % 250).cast("string")))
        .when(i % 53 == 5, F.lit("badly-formed"))
        .otherwise(
            F.concat(
                F.lit("203.0."),
                (m / 250).cast("int").cast("string"),
                F.lit("."),
                (m % 250).cast("string"),
            )
        )
    )


def raw_events(spark: SparkSession, n: int = 20000) -> DataFrame:
    """The countly_summary-shaped event table (nested cart_products)."""
    df = spark.range(n)
    i = F.col("id")
    is_checkout = i % 5 == 0

    collection = F.when(is_checkout, F.lit("checkout_success")).otherwise(
        F.element_at(F.array(*[F.lit(t) for t in EVENT_TYPES[:4]]), (i % 4 + 1).cast("int"))
    )
    ts = F.when(i % 97 == 0, F.lit(100000)).otherwise(
        F.lit(TS_BASE) + (i * 37) % (5 * 365 * 86400)
    )
    user_raw = (
        F.when(i % 41 == 0, F.lit(None))
        .when(i % 41 == 1, F.lit(""))
        .when(i % 41 == 2, F.lit("null"))
        .when(i % 41 == 3, F.lit("n/a"))
        .when(i % 41 == 4, F.lit("undefined"))
        .otherwise((i % 500).cast("string"))
    )
    email_base = F.concat(F.lit("user"), (i % 400).cast("string"), F.lit("@example.com"))
    email = (
        F.when(i % 37 == 0, F.lit(None))
        .when(i % 37 == 1, F.lit("  "))
        .when(i % 37 == 2, F.concat(F.lit("user"), (i % 400).cast("string"), F.lit("example.com")))
        .when(i % 31 == 0, F.upper(email_base))
        .otherwise(email_base)
    )
    tld = F.element_at(F.array(*[F.lit(t) for t in TLDS]), (i % 8 + 1).cast("int"))
    current_url = F.concat(
        F.when(i % 89 == 0, F.lit("view-source:https://www.glamira.")).otherwise(
            F.lit("https://www.glamira.")
        ),
        tld,
        F.when(is_checkout & (i % 23 != 0), F.lit("/checkout/onepage/success")).otherwise(
            F.concat(F.lit("/product/"), (i % 200).cast("string"))
        ),
    )

    # cart item j for this row: ids/prices/currencies all modular.
    def cart_item(j: int):
        pid = ((i * 7 + j * 13) % 204).cast("string")  # ids 200..203 = orphans
        qty = F.when(i % 61 == j, F.lit(0)).otherwise(1 + (i + j) % 5)
        base_price = F.concat(
            ((100 + (i * 31 + j * 17) % 2000)).cast("string"),
            F.lit("."),
            F.lpad(((i * 13 + j) % 100).cast("string"), 2, "0"),
        )
        price = (
            F.when((i + j) % 11 == 0, F.regexp_replace(base_price, "\\.", ","))
            .when((i + j) % 11 == 1, F.concat(F.lit("1."), F.regexp_replace(base_price, "\\.", ",")))
            .when((i + j) % 11 == 2, F.concat(F.lit("1,"), base_price))
            .when((i + j) % 11 == 3, F.regexp_replace(base_price, "\\.", "٫"))
            .when((i + j) % 11 == 4, F.concat(F.lit(" "), base_price, F.lit(" ")))
            .when((i + j) % 43 == 5, F.lit("N/A"))
            .otherwise(base_price)
        )
        currency = F.element_at(
            F.array(*[F.lit(c) for c in CURRENCY_LABELS]), ((i + j) % 12 + 1).cast("int")
        )
        option = F.when(
            (i + j) % 3 == 0,
            F.array(
                F.struct(
                    F.concat(F.lit("opt"), ((i + j) % 9).cast("string")).alias("option_id"),
                    F.lit("stone").alias("option_label"),
                    ((i + j) % 4).cast("string").alias("value_id"),
                    F.lit("ruby").alias("value_label"),
                ),
                F.struct(
                    F.concat(F.lit("opt"), ((i + j + 1) % 9).cast("string")).alias("option_id"),
                    F.lit("metal").alias("option_label"),
                    ((i + j + 1) % 4).cast("string").alias("value_id"),
                    F.lit("gold").alias("value_label"),
                ),
            ),
        ).when((i + j) % 3 == 1, F.array().cast(
            "array<struct<option_id:string,option_label:string,value_id:string,value_label:string>>"
        )).otherwise(F.lit(None).cast(
            "array<struct<option_id:string,option_label:string,value_id:string,value_label:string>>"
        ))
        return F.struct(
            pid.alias("product_id"),
            qty.cast("long").alias("amount"),
            price.alias("price"),
            currency.alias("currency"),
            option.alias("option"),
        )

    cart_full = F.array(cart_item(0), cart_item(1), cart_item(2))
    # Non-checkout rows get a NULL cart (the when() without otherwise) —
    # stg_order's posexplode_outer must preserve those rows.
    out = df.select(
        F.when(is_checkout, F.concat(F.lit("ORD"), (i / 5).cast("long").cast("string")))
        .otherwise(F.lit(None))
        .alias("order_id"),
        ts.cast("long").alias("time_stamp"),
        F.date_format(F.timestamp_seconds(ts), "yyyy-MM-dd HH:mm:ss").alias("local_time"),
        collection.alias("collection"),
        _ip(i).alias("ip"),
        F.lit("Mozilla/5.0 (synthetic)").alias("user_agent"),
        F.lit("1920x1080").alias("resolution"),
        user_raw.alias("user_id_db"),
        F.concat(F.lit("dev-"), (i % 977).cast("string")).alias("device_id"),
        F.lit("1.0").alias("api_version"),
        (1 + i % 7).cast("string").alias("store_id"),
        F.when(i % 2 == 0, F.lit("true")).otherwise(F.lit("false")).alias("show_recommendation"),
        current_url.alias("current_url"),
        F.when(i % 3 == 0, F.concat(F.lit("https://www.google."), tld)).otherwise(
            F.lit("junk-ref")
        ).alias("referrer_url"),
        email.alias("email_address"),
        F.when(is_checkout, F.slice(cart_full, 1, (1 + i % 3).cast("int"))).alias("cart_products"),
    )
    return out


def raw_product(spark: SparkSession, n: int = 220) -> DataFrame:
    """Product table: one nested 'product' record; id key name varies
    across rows (product_id/productId/id/_id) to exercise the JSON
    fallback chain; a few null/blank/'null' ids to be filtered."""
    df = spark.range(n)
    i = F.col("id")
    pid = i.cast("string")
    bad = i >= 204  # ids beyond the cart pool: also inject invalid ids
    id_variant = i % 4
    mk = lambda cond, v: F.when(cond, v).otherwise(F.lit(None))  # noqa: E731
    pid_final = F.when(i % 67 == 66, F.lit("null")).when(i % 71 == 70, F.lit(" ")).otherwise(pid)
    product = F.struct(
        mk(id_variant == 0, pid_final).alias("product_id"),
        mk(id_variant == 1, pid_final).alias("productId"),
        mk(id_variant == 2, pid_final).alias("id"),
        mk(id_variant == 3, pid_final).alias("_id"),
        F.concat(F.lit("Ring Model "), pid).alias("name"),
        F.concat(F.lit("SKU-"), F.lpad(pid, 5, "0")).alias("sku"),
        F.when(i % 2 == 0, F.lit("women")).otherwise(F.lit("men")).alias("gender"),
        F.lit("rings").alias("category_name"),
        F.lit("jewelry").alias("category"),
        F.lit("ring").alias("product_type"),
        (i % 7).cast("string").alias("store_code"),
        F.lit("default").alias("attribute_set"),
        F.lit("classic").alias("material_design"),
        F.when(i % 13 == 0, F.lit("not-a-number")).otherwise(
            ((i % 50) / 10.0).cast("string")
        ).alias("gold_weight"),
        ((i % 30) / 10.0).cast("string").alias("none_metal_weight"),
        F.when(i % 17 == 0, F.lit("")).otherwise(((i % 20) / 10.0).cast("string")).alias(
            "fixed_silver_weight"
        ),
    )
    return df.select(product.alias("product")).filter(~bad | (i % 3 == 0))


def raw_ip_locations(spark: SparkSession, n: int = 980) -> DataFrame:
    """IP -> geo lookup covering the event IP pool minus ~2% (orphans).

    Several IPs share a (country, region, city) so the W2 location-key
    dedupe has real work.
    """
    df = spark.range(n)  # pool indexes 20..999 exist; 0..19 = orphan ips
    m = F.col("id") + 20
    geo = m % 60  # 60 distinct geos -> ~16 ips per geo
    countries = ["US", "DE", "FR", "GB", "SE", "DK", "IT", "VN", "BR", "AU"]
    country = F.element_at(F.array(*[F.lit(c) for c in countries]), (geo % 10 + 1).cast("int"))
    return df.select(
        F.concat(
            F.lit("203.0."), (m / 250).cast("int").cast("string"), F.lit("."), (m % 250).cast("string")
        ).alias("ip"),
        country.alias("country_code"),
        F.concat(F.lit("Country-"), country).alias("country_name"),
        F.concat(F.lit("Region-"), (geo / 10).cast("int").cast("string")).alias("region"),
        F.concat(F.lit("City-"), geo.cast("string")).alias("city"),
        F.concat(F.lit("ISP-"), (m % 5).cast("string")).alias("isp"),
    )


def write_raw_tables(spark: SparkSession, out_dir: str, n_events: int = 20000) -> dict[str, str]:
    """Materialize all raw tables as parquet; returns name -> path."""
    paths = {}
    for name, df in {
        "raw_events": raw_events(spark, n_events),
        "raw_product": raw_product(spark),
        "raw_ip_locations": raw_ip_locations(spark),
    }.items():
        path = f"{out_dir}/{name}.parquet"
        df.write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths
