"""Physical-plan audit for gate queries — the .explain() discipline as a
tool: for each named ``queries()`` entry, summarize what reached the scans
(pushed filters, pruned read schemas) and how the plan is shaped
(exchanges, whole-stage-codegen spans, broadcast vs shuffle joins, any
single-partition windows), so plan regressions are visible without
eyeballing full explain output.

Under AQE the pre-execution plan hides WholeStageCodegen markers (they
materialize per query stage at runtime), so ``wscg`` is best-effort; the
pushdown/schema/exchange/join columns are exact.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pagerank_spark.session import get_spark


def audit(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: ([^\n]*)", plan)
    return {
        "exchanges": plan.count("Exchange"),
        "wscg_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\*\((\d+)\)", plan))
        ),
        "bhj": plan.count("BroadcastHashJoin"),
        "shj": plan.count("ShuffledHashJoin") + plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "global_windows": len(
            re.findall(r"Window .*\n.*SinglePartition", plan)
        ),
        "scans": len(scans),
        "pushed": pushed,
        "schemas": [s.strip() for s in schemas],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark("plan-audit")
    qs = entrymod.queries()
    names = only or sorted(qs)
    for name in names:
        if name not in qs:
            print(f"{name:32s} UNKNOWN")
            continue
        try:
            a = audit(qs[name](spark, sf_dir))
        except Exception as e:  # iterative gates may act during build
            print(f"{name:32s} (plan built with actions: {type(e).__name__})")
            continue
        flags = []
        if a["bnlj"]:
            flags.append(f"BNLJ x{a['bnlj']}")
        if a["global_windows"]:
            flags.append(f"GLOBAL-WINDOW x{a['global_windows']}")
        print(
            f"{name:32s} exch={a['exchanges']:2d} wscg={a['wscg_spans']:2d}"
            f" bhj={a['bhj']} shj={a['shj']} scans={a['scans']}"
            + (" " + " ".join(f"[{f}]" for f in flags) if flags else "")
        )
        for p, sch in zip(a["pushed"], a["schemas"]):
            tag = "pushed" if p else "NO-PUSHDOWN"
            print(f"    scan {tag}: {p or '-'} | {sch[:100]}")


if __name__ == "__main__":
    main()
