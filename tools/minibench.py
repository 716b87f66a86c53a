"""Sentinel-bracketed minibench for arbitrary gated queries.

The container-noise protocol (OPTIMIZATION_r13.md): host-steal windows
move every row ×1.5-6 with ~0 in-VM pressure, so raw A/B timings of
sub-2s rows are meaningless. This tool interleaves each target row
with the fixed sentinel (``q5_region_revenue``) and reports the
sentinel-normalized ratio next to the raw numbers — a real change
moves ``norm``; container noise does not.

Usage:
    python tools/minibench.py [sf_dir] query [query ...]
    SPARK_GRAFT_MB_PASSES=5 python tools/minibench.py ... # default 5

Output: one markdown table on stdout + one JSON line on stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from incubator_pulsar_spark.plans.queries import ALL_QUERIES
from incubator_pulsar_spark.session import get_spark

SENTINEL = "q5_region_revenue"


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    passes = int(os.environ.get("SPARK_GRAFT_MB_PASSES", "5"))
    spark = get_spark("minibench")
    spark.sparkContext.setLogLevel("ERROR")
    sent = ALL_QUERIES[SENTINEL]
    sent.build(spark, sf_dir).count()  # warm codegen for the sentinel

    out: dict[str, dict[str, float]] = {}
    for name in args:
        q = ALL_QUERIES[name]
        spark.sparkContext.setJobDescription(f"minibench warm {name}")
        q.build(spark, sf_dir).count()  # warm this row's plan shapes
        runs, sents = [], []
        for i in range(passes):
            spark.sparkContext.setJobDescription(f"minibench sentinel {i}")
            t0 = time.time()
            sent.build(spark, sf_dir).count()
            sents.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"minibench {name} {i}")
            t0 = time.time()
            q.build(spark, sf_dir).count()
            runs.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        med = statistics.median(runs)
        smed = statistics.median(sents)
        out[name] = {
            "min": round(min(runs), 3),
            "med": round(med, 3),
            "sentinel": round(smed, 3),
            "norm": round(med / smed, 3),
        }
    print(f"| query | min | med | sentinel | norm |")
    print(f"|---|---|---|---|---|")
    for name, r in out.items():
        print(f"| {name} | {r['min']} | {r['med']} | {r['sentinel']} "
              f"| {r['norm']} |")
    print(json.dumps({"sf_dir": sf_dir, "passes": passes, "rows": out}),
          file=sys.stderr)


if __name__ == "__main__":
    main()
