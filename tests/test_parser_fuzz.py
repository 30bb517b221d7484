"""Seeded fuzz differential for the localized number parser.

SURVEY §7 hard part (a): the comma/period-order logic must match the
reference semantics exactly. We generate 1200 adversarial price strings
(deterministic seed), run the Spark Column expression and the DuckDB
SQL twin over the same batch, and require byte-identical parses —
including agreement on which inputs are NULL (unparsable).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from glamira_batch_processing_spark.functions.cleaning import (
    parse_localized_number,
    parse_localized_number_sql,
)

PIECES = ["1", "23", "456", "7890", "0", "007"]
SEPS = [",", ".", "٫", " ", ""]
GARBAGE = ["N/A", "", " ", "abc", "1.2.3", ",,", "12,,34", ".5", ",5", "5.", "5,",
           "--3", "+4,2", "1 2 3", "١٢٣", "12٫", "٫5"]


def gen_strings(n: int = 1200) -> list[str]:
    rng = random.Random(20260813)
    out = list(GARBAGE)
    while len(out) < n:
        k = rng.randint(1, 4)
        s = ""
        for i in range(k):
            s += rng.choice(PIECES)
            if i < k - 1:
                s += rng.choice(SEPS)
        if rng.random() < 0.3:
            s = " " + s + " "
        out.append(s)
    return out


def test_parser_differential_fuzz(spark):
    strings = gen_strings()
    # ASCII-digit subset for the cross-engine check: Spark's cast accepts
    # Arabic-Indic DIGITS where DuckDB doesn't (documented divergence);
    # the '٫' SEPARATOR itself is in scope.
    cross = [s for s in strings if not any(ch in "١٢٣٤٥٦٧٨٩٠" for ch in s)]

    df = spark.createDataFrame([(s,) for s in cross], "price string")
    got_spark = [
        (r.price, str(r.p) if r.p is not None else None)
        for r in df.select(
            "price", parse_localized_number(F.col("price"), 18, 6).alias("p")
        ).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(price VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in cross])
    duck_rows = con.sql(
        f"SELECT price, {parse_localized_number_sql('price', 18, 6)} AS p FROM t"
    ).fetchall()
    got_duck = [(p, str(v) if v is not None else None) for p, v in duck_rows]

    assert sorted(got_spark) == sorted(got_duck), (
        "parser divergence:\n"
        + "\n".join(
            f"  {a!r} vs {b!r}"
            for a, b in zip(sorted(got_spark), sorted(got_duck))
            if a != b
        )[:2000]
    )
    # sanity: a healthy fraction must actually parse
    parsed = sum(1 for _, v in got_spark if v is not None)
    assert parsed > len(cross) * 0.5
