"""Sentinel-normalized drift ledger for the index-lifecycle bench rows
(VERDICT r11 #1: two rounds of same-direction PQ-family drift needed a
measurement protocol, not an argument).

Protocol: for each lifecycle row, run 7 passes INTERLEAVED with a fixed
sentinel query (``q5_region_revenue`` — a stable broadcast-join shape
with no index I/O). Report per row:

- ``med``        median of the 7 composite (build+probe) timings
- ``sentinel``   median of the 7 interleaved sentinel timings
- ``norm``       med / sentinel — container state (CPU contention, page
                 cache, JIT pressure) moves BOTH numbers, so the ratio
                 is the drift signal: a real regression moves ``norm``,
                 container noise does not
- ``probe_med``  median of 7 probe-only passes (the production-
                 recurring number, separated from build I/O jitter)

Usage:
    python tools/drift_ledger.py [sf_dir] [row ...]   # default: all 14

Output: one markdown table on stdout (paste into SCALING.md's drift
ledger) + one JSON line on stderr for archival diffing.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from incubator_pulsar_spark.plans.queries import ALL_QUERIES, LIFECYCLES
from incubator_pulsar_spark.session import get_spark

SENTINEL = "q5_region_revenue"
PASSES = 7


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rows = sys.argv[2:] or list(LIFECYCLES)
    spark = get_spark("drift-ledger")
    spark.sparkContext.setLogLevel("ERROR")
    sent = ALL_QUERIES[SENTINEL]

    # warm both shapes once so pass 1 isn't a codegen-compilation outlier
    sent.build(spark, sf_dir).count()

    out: dict[str, dict[str, float]] = {}
    for name in rows:
        q = ALL_QUERIES[name]
        build, probe = LIFECYCLES[name]
        q.build(spark, sf_dir).count()  # warm this row's plan shapes
        comp, sentinel, probes = [], [], []
        for _ in range(PASSES):
            t0 = time.time()
            sent.build(spark, sf_dir).count()
            sentinel.append(time.time() - t0)
            t0 = time.time()
            q.build(spark, sf_dir).count()
            comp.append(time.time() - t0)
            t0 = time.time()
            probe(spark, sf_dir).count()
            probes.append(time.time() - t0)
        med = statistics.median(comp)
        sen = statistics.median(sentinel)
        out[name] = {
            "med": round(med, 3),
            "sentinel": round(sen, 3),
            "norm": round(med / sen, 2),
            "probe_med": round(statistics.median(probes), 3),
        }
        print(f"# {name}: med={med:.2f}s sentinel={sen:.2f}s "
              f"norm={med / sen:.2f} probe={out[name]['probe_med']:.2f}s",
              file=sys.stderr)

    print("| row | med (s) | sentinel (s) | norm (x sentinel) | "
          "probe med (s) |")
    print("|---|---|---|---|---|")
    for name, r in out.items():
        print(f"| {name} | {r['med']} | {r['sentinel']} | {r['norm']} "
              f"| {r['probe_med']} |")
    print(json.dumps({"sf_dir": sf_dir, "passes": PASSES,
                      "sentinel": SENTINEL, "rows": out},
                     separators=(",", ":")), file=sys.stderr)


if __name__ == "__main__":
    main()
