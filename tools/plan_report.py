"""Dump physical-plan summaries for the headline queries.

Usage: python tools/plan_report.py [sf_dir] [query ...]

For each entry in ``__spark_entry__.queries()`` (or the named subset),
prints a one-block summary of the executed plan: scan pushdown
(PushedFilters / PartitionFilters / ReadSchema), join strategies,
exchanges, window limits, and any Python nodes — the properties
``tests/test_plans.py`` pins. Use it to eyeball a new operator's plan
before writing its contract.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERESTING = re.compile(
    r"PushedFilters: \[[^\]]*\]|PartitionFilters: \[[^\]]*\]"
    r"|ReadSchema: \S+"
    r"|\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct"
    r"|BroadcastNestedLoopJoin|TakeOrderedAndProject|WindowGroupLimit"
    r"|Exchange hashpartitioning|Exchange SinglePartition|HashAggregate"
    r"|ObjectHashAggregate|SortAggregate|BatchEvalPython|ArrowEvalPython"
    r"|MapInPandas|FlatMapGroupsInPandas|Generate|Expand)\b"
)


def summarize(plan: str) -> list[str]:
    counts: dict[str, int] = {}
    details: list[str] = []
    for m in INTERESTING.finditer(plan):
        tok = m.group(0)
        if tok.startswith(("PushedFilters", "PartitionFilters", "ReadSchema")):
            if tok not in details:
                details.append(tok)
        else:
            counts[tok] = counts.get(tok, 0) + 1
    lines = [f"  {k} x{v}" for k, v in sorted(counts.items())]
    lines += [f"  {d[:140]}" for d in details[:6]]
    return lines


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from mindb_spark.session import get_spark

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, keep going
            print(f"\n## {name}\n  ERROR: {type(e).__name__}: {e}")
            continue
        print(f"\n## {name}")
        for line in summarize(plan):
            print(line)


if __name__ == "__main__":
    main()
