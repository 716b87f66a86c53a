"""Two/three-point scaling curve: time each gated query at several SF
dirs and print a JSON mapping for SCALING.md.

TPC-H-shape queries run at every full testdata dir they're given; the
documents/embeddings-only queries additionally run at the generated
.fixtures/sf1 point (tools/gen_scale_fixture.py), which has no TPC-H
tables. A query whose input tables are missing in a dir is skipped for
that dir.

Usage:
  python tools/scaling_curve.py out.json dir1 dir2 [dir3 ...] \
      [--skip label:query ...]

--skip excludes a query at one labeled dir (label = dir basename):
known-superlinear combinations — e.g. exact all-pairs Jaccard verify
on a low-shingle-diversity corpus at 50k docs, where the candidate set
approaches N² — are skipped EXPLICITLY and documented in SCALING.md,
never silently.

Timings are steady-state (second run of two, same protocol as
bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_pulsar_spark.plans.queries import ALL_QUERIES  # noqa: E402
from incubator_pulsar_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    dirs: list[str] = []
    skips: set[tuple[str, str]] = set()
    only: set[str] = set()
    args = iter(sys.argv[2:])
    for a in args:
        if a == "--skip":
            label, _, qname = next(args).partition(":")
            skips.add((label, qname))
        elif a == "--only":
            only.add(next(args))
        else:
            dirs.append(a)
    spark = get_spark("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {}
    for d in dirs:
        label = os.path.basename(d.rstrip("/"))
        for name, q in ALL_QUERIES.items():
            if only and name not in only:
                continue
            if (label, name) in skips:
                print(f"# skip {name} @ {label}: --skip", file=sys.stderr)
                continue
            try:
                q.build(spark, d).count()  # cold: codegen + listings
                t0 = time.monotonic()
                q.build(spark, d).count()
                dt = time.monotonic() - t0
            except Exception as exc:  # missing table in this dir, etc.
                print(f"# skip {name} @ {label}: {type(exc).__name__}",
                      file=sys.stderr)
                continue
            results.setdefault(name, {})[label] = round(dt, 3)
            print(f"# {name} @ {label}: {dt:.2f}s", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(out_path)


if __name__ == "__main__":
    main()
