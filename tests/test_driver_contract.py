"""The local mirror of the driver's correctness gate.

Every registered query with an oracle is executed on Spark and on DuckDB
at sf0.001 (fast inner loop) and compared order-insensitively at full
value precision. Queries without an oracle get a rows>=0 smoke check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as contract
from tests.conftest import SF_SMALL
from tests.oracle_diff import run_query_pair

QUERIES = contract.queries()
ORACLES = contract.oracle_sql()


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_every_query_has_callable():
    assert QUERIES, "no queries registered"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_priority_order_covers_gate_window():
    """The driver's CORRECTNESS gate samples the first 50 queries() entries.

    Guard the curated order: exactly 50 priority names, all registered, all
    oracle-checked, emitted first; every registered query still present.
    """
    names = list(QUERIES)
    prio = contract._PRIORITY
    assert len(prio) == 50
    assert len(set(prio)) == 50
    assert names[:50] == prio
    missing_oracle = [n for n in prio if n not in ORACLES]
    assert not missing_oracle, f"priority queries without oracle: {missing_oracle}"
    from glamira_batch_processing_spark.plans.registry import QUERIES as REG

    assert set(names) == set(REG)
    # Flagship + every never-previously-rowed operator family must be inside
    # the gate window (see VERDICT.md round 2, finding #1).
    for required in (
        "glamira_pipeline_e2e",
        "datapipe_e2e",
        "multimodal_image_meta",
        "w2_canonical_per_group",
        "w3_scd2_history",
        "o4_topk_composite_order",
        "j11_incremental_merge",
        "f1_string_normalize",
        "f4_currency_resolution",
        "f5_surrogate_key_inputs",
        "f6_date_dimension",
        "f8_json_extract",
        "dedup_cluster_components",
        "decontaminate_benchmark_overlap",
        "heavy_hitters_by_lang",
        "asof_join_last_purchase",
        "sample_stratified_lang",
        "sketch_kmv_distinct",
    ):
        assert required in prio, required


def test_bench_compare_not_stale():
    """BENCH_COMPARE.json must reflect the CURRENT bench headline set
    (round-2 verdict: the committed file had gone stale after HEADLINE
    changed). Regenerate with scripts/bench_compare.py when this fails."""
    import json
    from pathlib import Path

    import bench

    path = Path(__file__).resolve().parent.parent / "BENCH_COMPARE.json"
    report = json.loads(path.read_text())
    expected = {n for n in bench.HEADLINE if n in ORACLES}
    assert set(report["queries"]) == expected, (
        "BENCH_COMPARE.json is stale — rerun: "
        "python scripts/bench_compare.py > BENCH_COMPARE.json"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, duck_small, name):
    fn = QUERIES[name]
    if name in ORACLES:
        problems = run_query_pair(spark, duck_small, fn, ORACLES[name], SF_SMALL, name)
        assert not problems, "\n".join(problems)
    else:
        # non-SQL-expressible: weaker rows-only check, like the driver
        df = fn(spark, SF_SMALL)
        assert df.count() >= 0
