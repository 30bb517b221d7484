"""Regenerate PLANS.md: formatted physical plans of the bench headline
queries (tree section only) at sf0.01.

Usage: python scripts/gen_plans.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
import __spark_entry__ as contract

# Every gate-window query gets a committed plan (round 9: the window
# rotates, so derive the list instead of pinning names), plus legacy
# extras and the coded-layout lifecycle.
EXTRA = [
    n for n in contract._PRIORITY if n not in bench.HEADLINE
] + [
    n
    for n in (
        "dedup_cluster_components",
        "pii_redact",
        "chunk_token_windows",
        "q1_coded_layout",  # joined bench.HEADLINE in round 10
        "ann_index_persist",  # round-10 operators outside the window
        "split_leakage_safe",
    )
    if n not in bench.HEADLINE
]
SF = "/root/testdata/sf0.01"


def plan_tree(df) -> str:
    """The tree section of .explain('formatted') (drop the node details)."""
    full = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return full.split("\n\n")[0]


def main() -> None:
    from glamira_batch_processing_spark import get_spark

    spark = get_spark("gen-plans")
    qs = contract.queries()
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        "Auto-generated (`python scripts/gen_plans.py`, tree section of",
        "`.explain('formatted')` at sf0.01) so plan shape is reviewable",
        "without running Spark. The properties asserted in",
        "`tests/test_plan_quality.py` (pushdown, broadcasts, TakeOrdered,",
        "shuffle budget) are visible here.",
        "",
    ]
    for name in bench.HEADLINE + EXTRA:
        if name not in qs:
            continue
        out.append(f"## {name}\n")
        out.append("```")
        out.append(plan_tree(qs[name](spark, SF)))
        out.append("```\n")
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    print(f"wrote PLANS.md ({len(bench.HEADLINE + EXTRA)} queries)")


if __name__ == "__main__":
    main()
