"""Regenerate tests/slow_tests.json (the default-fast pytest profile).

Input: a full-suite log produced by
``SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/ -q --durations=0``.
Rule: skip tests whose call duration exceeds the threshold (default
10 s), EXCEPT the fastest test of every class / module-level group —
so each operator keeps at least one default-profile test.

Usage: python tools/gen_slow_manifest.py <durations_log> [threshold_s]
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys


def main() -> None:
    log = sys.argv[1]
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    durs: dict[str, float] = {}
    for line in open(log):
        m = re.match(r"\s*([0-9.]+)s (call)\s+(\S+)", line)
        if m:
            durs[m.group(3)] = float(m.group(1))
    if not durs:
        sys.exit("no '--durations=0' call lines found in the log")

    def gkey(t: str) -> str:
        parts = t.split("::")
        return "::".join(parts[:2]) if len(parts) == 3 else parts[0]

    groups = collections.defaultdict(list)
    for t, d in durs.items():
        groups[gkey(t)].append((d, t))
    skip = set()
    for members in groups.values():
        members.sort()
        fastest = members[0][1]
        skip.update(t for d, t in members if d > thresh and t != fastest)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "slow_tests.json")
    with open(out, "w") as f:
        json.dump(sorted(skip), f, indent=0)
    total = sum(durs.values())
    rem = total - sum(durs[t] for t in skip)
    print(f"wrote {out}: skip {len(skip)}/{len(durs)} tests; "
          f"default profile ~{rem:.0f}s of calls vs full {total:.0f}s")


if __name__ == "__main__":
    main()
