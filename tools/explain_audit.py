"""Plan-quality audit: prints shuffle / broadcast / sort-merge / pushdown
summary for every gated query so plan regressions are visible round over
round.

Usage: python tools/explain_audit.py [sf_dir] [query ...]

Red flags to look for in the output:
- a query whose scans show no PushedFilters despite having predicates
- SortMergeJoin where a dim table should broadcast
- shuffle (Exchange) counts growing without a semantic change
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from incubator_pulsar_spark.session import get_spark
from incubator_pulsar_spark.plans.queries import ALL_QUERIES


def audit(spark, name, build, sf_dir) -> dict | None:
    try:
        df = build(spark, sf_dir)
        df.count()  # run so AQE finalizes — audit the EXECUTED plan
    except Exception as e:  # pragma: no cover - defensive
        return {"name": name, "error": str(e)[:80]}
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    return {
        "name": name,
        "shuffles": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "reused": len(re.findall(r"ReusedExchange", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "pushed": len([p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p]),
        "python_stages": len(re.findall(r"(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    hdr = (f"{'query':32} {'shfl':>4} {'reuse':>5} {'bcast':>5} {'smj':>4} "
           f"{'scan':>4} {'push':>4} {'py':>3} {'cg':>3}")
    print(hdr)
    print("-" * len(hdr))
    for name, q in ALL_QUERIES.items():
        if only and name not in only:
            continue
        r = audit(spark, name, q.build, sf_dir)
        if r is None:
            continue
        if "error" in r:
            print(f"{name:32} ERROR {r['error']}")
            continue
        print(f"{r['name']:32} {r['shuffles']:>4} {r['reused']:>5} "
              f"{r['broadcast_joins']:>5} {r['sortmerge_joins']:>4} {r['scans']:>4} "
              f"{r['pushed']:>4} {r['python_stages']:>3} {r['codegen_spans']:>3}")


if __name__ == "__main__":
    main()
