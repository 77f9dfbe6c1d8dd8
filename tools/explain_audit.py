"""Physical-plan audit: for every registry query, summarize the executed
plan — number of Exchanges (shuffles), broadcast joins, parquet pushdown,
Python eval stages — and flag shapes that would not survive scale-up.

Usage: python tools/explain_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(sf_dir: str) -> None:
    from openseizuredatabase_spark.plans.registry import QUERIES
    from openseizuredatabase_spark.session import get_spark

    spark = get_spark("explain_audit")
    print(f"# Physical plan audit ({sf_dir})\n")
    print(
        "Counts come from the pre-execution plan, so shared subtrees are\n"
        "counted once per appearance: at runtime AQE's ReuseExchange\n"
        "collapses identical exchange subplans (verified on t5 — the\n"
        "executed adaptive plan shows ReusedExchange nodes where this\n"
        "table over-reports scans/shuffles). Treat the shuffle column as\n"
        "an upper bound.\n"
    )
    print("| query | shuffles | bcast joins | SMJ | pushdown | python stages | WSCG spans |")
    print("|---|---|---|---|---|---|---|")
    for name, spec in QUERIES.items():
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchange = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))
        n_bhj = plan.count("BroadcastHashJoin")
        n_smj = plan.count("SortMergeJoin")
        pushed = "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "-"
        n_py = plan.count("EvalPython") + plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas")
        n_wscg = len(set(re.findall(r"\*\((\d+)\)", plan)))
        print(f"| {name} | {n_exchange} | {n_bhj} | {n_smj} | {pushed} | {n_py} | {n_wscg} |")


if __name__ == "__main__":
    audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
