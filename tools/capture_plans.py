"""Capture .explain("formatted") for gated queries (round-13 plan
evidence): runs each gate's build (lifecycle gates execute their
side-effect builds), then writes the returned frame's formatted plan.

Usage: python tools/capture_plans.py <sf_dir> <outdir> <suffix> q1 q2 ...
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_pulsar_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    from incubator_pulsar_spark.plans.queries import ALL_QUERIES

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        q = ALL_QUERIES[name]
        df = q.build(spark, sf_dir)
        df.count()  # run once so AQE/lifecycle state is realistic
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
            .fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        with io.open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()
