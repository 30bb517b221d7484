"""Randomized relational-query differential fuzz: Spark vs DuckDB.

Hypothesis draws small query ASTs — conjunctive filters, a group-by
subset, an aggregate list — renders each AST BOTH as DataFrame
operations and as DuckDB SQL over the same parquet, and requires
identical result multisets. All output values are integers or strings
(quantities are integral doubles cast to bigint, prices go through
exact integer cents), so comparison is exact with no float tolerance.

This is the sqllogictest-style layer the per-query oracles don't give:
the per-query gate proves ~150 hand-picked plans; the fuzz proves the
COMPOSITION rules (filter pushdown through casts, group-by on derived
columns, agg over empty groups, IN lists, negations) on queries nobody
hand-picked.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

SPARK = None


@pytest.fixture(scope="module", autouse=True)
def _bind(spark):
    global SPARK
    SPARK = spark
    yield


NUM_COLS = {
    # name -> (spark expr builder, sql expr)
    "qty": (lambda: F.col("l_quantity").cast("bigint"),
            "CAST(l_quantity AS BIGINT)"),
    "price_c": (lambda: F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint"),
                "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)"),
    "supp_bucket": (lambda: F.col("l_suppkey") % 7,
                    "l_suppkey % 7"),
}
STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
NUM_OPS = ["<", "<=", "=", ">", ">=", "!="]

num_filter = st.tuples(
    st.sampled_from(sorted(NUM_COLS)),
    st.sampled_from(NUM_OPS),
    st.integers(min_value=0, max_value=60),
)
str_filter = st.tuples(
    st.sampled_from(sorted(STR_COLS)),
    st.sampled_from(["=", "!=", "in"]),
    st.sets(st.sampled_from(["A", "N", "R", "F", "O"]), min_size=1, max_size=2),
)
query_ast = st.fixed_dictionaries(
    {
        "num_filters": st.lists(num_filter, max_size=2),
        "str_filters": st.lists(str_filter, max_size=1),
        "group": st.sets(
            st.sampled_from(["l_returnflag", "l_linestatus", "supp_bucket"]),
            max_size=2,
        ),
        "aggs": st.sets(
            st.sampled_from(["n", "sum_qty", "min_price", "max_price"]),
            min_size=1,
            max_size=3,
        ),
    }
)


def _spark_query(ast):
    df = SPARK.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    for name, (build, _) in NUM_COLS.items():
        df = df.withColumn(name, build())
    for col, op, const in ast["num_filters"]:
        c = F.col(col)
        df = df.filter(
            {"<": c < const, "<=": c <= const, "=": c == const,
             ">": c > const, ">=": c >= const, "!=": c != const}[op]
        )
    for col, op, vals in ast["str_filters"]:
        vs = sorted(vals)
        c = F.col(col)
        if op == "in":
            df = df.filter(c.isin(vs))
        elif op == "=":
            df = df.filter(c == vs[0])
        else:
            df = df.filter(c != vs[0])
    aggs = []
    if "n" in ast["aggs"]:
        aggs.append(F.count("*").alias("n"))
    if "sum_qty" in ast["aggs"]:
        aggs.append(F.sum("qty").cast("bigint").alias("sum_qty"))
    if "min_price" in ast["aggs"]:
        aggs.append(F.min("price_c").alias("min_price"))
    if "max_price" in ast["aggs"]:
        aggs.append(F.max("price_c").alias("max_price"))
    group = sorted(ast["group"])
    return (df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)).select(
        *(group + sorted(ast["aggs"]))
    )


def _sql_query(ast) -> str:
    derived = ", ".join(f"{sql} AS {name}" for name, (_, sql) in NUM_COLS.items())
    where = ["TRUE"]
    for col, op, const in ast["num_filters"]:
        sql_op = "<>" if op == "!=" else op
        where.append(f"{col} {sql_op} {const}")
    for col, op, vals in ast["str_filters"]:
        vs = sorted(vals)
        if op == "in":
            lst = ", ".join(f"'{v}'" for v in vs)
            where.append(f"{col} IN ({lst})")
        elif op == "=":
            where.append(f"{col} = '{vs[0]}'")
        else:
            where.append(f"{col} <> '{vs[0]}'")
    sel_agg = {
        "n": "count(*) AS n",
        "sum_qty": "CAST(SUM(qty) AS BIGINT) AS sum_qty",
        "min_price": "MIN(price_c) AS min_price",
        "max_price": "MAX(price_c) AS max_price",
    }
    group = sorted(ast["group"])
    aggs = ", ".join(sel_agg[a] for a in sorted(ast["aggs"]))
    sel = ", ".join(group + [aggs]) if group else aggs
    gb = f"GROUP BY {', '.join(group)}" if group else ""
    return f"""
    SELECT {sel} FROM (
      SELECT *, {derived} FROM lineitem
    ) WHERE {" AND ".join(where)} {gb}
    """


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple("NULL" if v is None else str(v) for v in r))
    return sorted(out)


@given(ast=query_ast)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_query_matches_duckdb(ast):
    import tests.conftest as c

    con = c.make_duck(SF_SMALL)
    got = _norm([tuple(r) for r in _spark_query(ast).collect()])
    want = _norm(con.sql(_sql_query(ast)).fetchall())
    assert got == want, (ast, got[:3], want[:3])
