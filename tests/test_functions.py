"""Unit tests for the Column-expression function layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glamira_batch_processing_spark.functions.cleaning import (
    clean_string,
    parse_localized_number,
    user_id_status,
)
from glamira_batch_processing_spark.functions.currency import (
    currency_code_expr,
    currency_status_expr,
    fx_rates,
    infer_currency_from_tld,
)


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1234.56", "1234.560000000"),
        ("1.234,56", "1234.560000000"),   # European
        ("1,234.56", "1234.560000000"),   # US thousands
        ("1234,56", "1234.560000000"),    # decimal comma
        # NOTE: Spark's cast parses Arabic-Indic digits (DuckDB/BigQuery
        # would not) — oracle queries therefore only ever use the '٫'
        # separator with ASCII digits.
        ("١٢٣٤٫56", "1234.560000000"),
        ("1234٫56", "1234.560000000"),    # arabic decimal separator
        (" 1 234,56 ", "1234.560000000"), # embedded spaces
        ("N/A", None),
        ("", None),
        (None, None),
        ("1,2.3,4", "12.340000000"),      # pathological: comma seen first
                                          # -> thousands sep, all removed
    ],
)
def test_parse_localized_number(spark, raw, expected):
    """Port parity of stg_order.sql:37-61 (ref behavior, incl. the
    STRPOS first-occurrence disambiguation)."""
    df = spark.createDataFrame([(raw,)], "price string")
    got = df.select(parse_localized_number(F.col("price"), 38, 9).alias("p")).collect()[0].p
    assert (str(got) if got is not None else None) == expected


def test_user_id_status(spark):
    rows = [(None,), ("",), (" "," "), ("null",), ("N/A",), ("undefined",), ("123",)]
    df = spark.createDataFrame([(r[0],) for r in rows], "u string")
    got = [r.s for r in df.select(user_id_status(F.col("u")).alias("s")).collect()]
    assert got == ["NULL", "EMPTY", "EMPTY", "FAKE_NULL", "FAKE_NULL", "FAKE_NULL", "VALID"]


def test_clean_string(spark):
    df = spark.createDataFrame(
        [("  x  ",), ("null",), ("",), (None,), ("ok",)], "v string"
    )
    got = [r.c for r in df.select(clean_string(F.col("v")).alias("c")).collect()]
    assert got == ["x", None, None, None, "ok"]


def test_currency_mapping(spark):
    df = spark.createDataFrame(
        [("USD $", "https://www.glamira.com/x"),
         ("€", "https://www.glamira.de/x"),
         ("$", "https://www.glamira.de/x"),
         ("kr", "https://www.glamira.se/x"),
         ("$", "https://www.glamira.co.uk/x"),
         ("???", "https://www.glamira.fr/x"),
         ("", "https://www.glamira.fr/x")],
        "cur string, url string",
    )
    out = df.select(
        currency_code_expr(F.col("cur")).alias("code"),
        currency_status_expr(F.col("cur")).alias("status"),
        infer_currency_from_tld(
            currency_status_expr(F.col("cur")), F.col("url")
        ).alias("inferred"),
    ).collect()
    assert (out[0].code, out[0].status) == ("USD", "CLEAN")
    assert (out[1].code, out[1].status) == ("EUR", "CLEAN")
    assert (out[2].code, out[2].status, out[2].inferred) == (None, "AMBIGUOUS", "EUR")
    assert (out[3].code, out[3].status, out[3].inferred) == (None, "AMBIGUOUS", "SEK")
    assert (out[4].inferred) == "GBP"  # co.uk host special case
    assert (out[5].code, out[5].status) == (None, "UNKNOWN")
    assert (out[6].status) == "UNKNOWN"


def test_fx_seed_csv(spark):
    """S9: typed CSV seed load — 34 rows, USD rate exactly 1.0."""
    fx = fx_rates(spark)
    assert fx.count() == 34
    assert dict(fx.dtypes) == {
        "fx_date": "date", "base_code": "string",
        "currency_code": "string", "usd_to_ccy": "double",
    }
    usd = fx.filter(F.col("currency_code") == "USD").collect()[0]
    assert usd.usd_to_ccy == 1.0


def test_text_predict_lang_tiebreak(spark):
    """Equal stopword scores resolve in en>de>fr>es declaration order."""
    from glamira_batch_processing_spark.operators.text import predict_lang

    df = spark.createDataFrame(
        [("the der le el",),    # 1 hit each -> tie -> 'en'
         ("der die das und",),  # de wins
         ("xyzzy qwerty",)],    # zero everywhere -> tie at 0 -> 'en'
        "text string",
    )
    got = [r.p for r in df.select(predict_lang(F.col("text")).alias("p")).collect()]
    assert got == ["en", "de", "en"]


def test_text_fingerprint_normalization(spark):
    """Case, punctuation, and whitespace variants share a fingerprint."""
    from glamira_batch_processing_spark.operators.text import fingerprint

    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "HELLO ... WORLD"),
         (4, "different text")],
        "id long, text string",
    )
    got = {r.id: r.fp for r in df.select("id", fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] != got[1]


def test_f14_json_retype_drift_rows_and_plan(spark):
    """The from_json repair (f14): malformed and NULL JSON rows both
    land as a preserved parent row with NULL item fields (PERMISSIVE
    from_json -> NULL array -> posexplode_outer), option-less items
    keep one row with NULL option fields, and the pipeline stays
    zero-Python. Round 14: the plan carries AT MOST ONE Exchange — the
    deliberate fan_out of the 8-byte key column that parallelizes the
    JSON round-trip (measured 2.8 s single-task without it at sf0.1);
    the heavy to_json/from_json projection must sit ABOVE it."""
    import __spark_entry__ as contract
    from tests.conftest import SF_SMALL

    df = contract.queries()["f14_json_retype"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = plan.count("Exchange")
    assert exchanges <= 1, plan
    if exchanges:
        # the exchange carries only the key, never the built JSON
        ex_line = [ln for ln in plan.splitlines() if "Exchange" in ln][0]
        assert "o_orderkey" in ex_line and "cart" not in ex_line, ex_line
    assert "Python" not in plan and "ArrowEval" not in plan, plan

    # o_orderkey % 37 == 0 is the malformed row, == 1 the NULL row:
    # both must survive as exactly one row of NULL item fields.
    drift = df.filter((F.col("o_orderkey") % 37).isin(0, 1)).collect()
    assert drift, "no drift rows at this sf"
    by_key: dict[int, list] = {}
    for r in drift:
        by_key.setdefault(r.o_orderkey, []).append(r)
    for key, rows in by_key.items():
        assert len(rows) == 1, (key, rows)
        assert rows[0].cart_pos is None and rows[0].product_id is None
    # a typed row: amount came back as a BIGINT through the JSON text
    typed = df.filter(F.col("product_id").isNotNull()).first()
    assert isinstance(typed.amount, int)
    # 'N/A' price strings re-type to NULL, numeric ones to double
    na = df.filter(F.col("price_raw") == "N/A").first()
    assert na is not None and na.price_num is None
    num = df.filter(F.col("price_raw") != "N/A").first()
    assert isinstance(num.price_num, float)
