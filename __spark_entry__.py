"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``glamira_batch_processing_spark.plans``; each
operator family from SURVEY.md §2 registers one named query + oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

# Importing the query modules populates the registry.
from glamira_batch_processing_spark.plans import (  # noqa: F401
    audit_qa_queries,
    core_queries,
    datapipe_queries,
    e2e_queries,
    event_window_queries,
    misc_queries,
    mlprep_queries,
    pipeline_e2e,
    scalar_queries,
    session_queries,
    text_stats_queries,
    window_frame_queries,
    window_queries,
)
from glamira_batch_processing_spark.plans.registry import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the whole-warehouse run: the full Glamira DAG
    (staging -> SCD -> marts) executing over constructed raw inputs,
    rolled up to USD revenue by resolved currency.
    """
    return QUERIES["glamira_pipeline_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(ORACLE)
