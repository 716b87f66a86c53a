"""Step-level profiler for the round-13 optimization pass.

Times the sub-steps of the heaviest bench families (ANN lifecycle
builds, streaming lifecycle gates, iterative graph) so optimization
targets the measured cost, not the guessed one (guide §1). Wall-clock
timers around each step; run on a quiet machine.

Usage: python tools/profile_r13.py [ivffold|twap|scd2|cc|probe] ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_pulsar_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_marks: list[tuple[str, float]] = []


def t(label: str, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    _marks.append((label, dt))
    print(f"  {label:<42s} {dt:7.3f}s", flush=True)
    return out


def profile_ivffold(spark):
    import shutil as _sh

    from pyspark.sql import functions as F

    from incubator_pulsar_spark.functions import similarity
    from incubator_pulsar_spark.plans.queries import _probe_queries, _scratch, _t
    from incubator_pulsar_spark.streaming.ann import (ivfpq_fold_stream,
                                                      ivfpq_ingest_batch)

    print("== ivfpq_fold build steps ==")
    emb = _t(spark, SF_DIR, "embeddings")
    d = _scratch("ivffold", SF_DIR)
    _sh.rmtree(d, ignore_errors=True)
    _sh.rmtree(d + "_out", ignore_errors=True)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    t("write_index (train+encode+write)",
      lambda: similarity.ivfpq_write_index(even, d, dim=64, m=4, ksub=16,
                                           n_cells=8))
    t("ingest_batch 0",
      lambda: ivfpq_ingest_batch(emb.filter(F.col("vec_id") % 4 == 1), 0,
                                 index_path=d, out_path=d + "_out", k=5,
                                 nprobe=3))
    t("ingest_batch 1",
      lambda: ivfpq_ingest_batch(emb.filter(F.col("vec_id") % 4 == 3), 1,
                                 index_path=d, out_path=d + "_out", k=5,
                                 nprobe=3))
    t("fold_stream", lambda: ivfpq_fold_stream(spark, d))
    t("probe (search_index.count)",
      lambda: similarity.ivfpq_search_index(
          spark, d, _probe_queries(emb), k=10, nprobe=3, refine=100,
          vectors=emb).count())
    nfiles = sum(len(fs) for _, _, fs in os.walk(d))
    print(f"  index files under {d}: {nfiles}")


def profile_ivfwrite(spark):
    """Break ivfpq_write_index into train vs encode vs write."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from incubator_pulsar_spark.functions import similarity as S
    from incubator_pulsar_spark.plans.queries import _scratch, _t

    print("== ivfpq_write_index sub-steps ==")
    emb = _t(spark, SF_DIR, "embeddings")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    d = _scratch("profwr", SF_DIR)
    _sh.rmtree(d, ignore_errors=True)
    cents = t("seed centroids (driver pool)",
              lambda: S._seed_centroids(even, n_cells=8))
    books = t("pq_train_codebooks",
              lambda: S.pq_train_codebooks(even, m=4, ksub=16, dim=64))
    enc = t("encode plan build",
            lambda: S._ivfpq_encode(even, cents, books, residual=False))
    t("encode+write parquet",
      lambda: enc.write.partitionBy("cell").mode("overwrite")
      .parquet(os.path.join(d, "base")))
    nfiles = sum(len(fs) for _, _, fs in os.walk(d))
    print(f"  files written: {nfiles}")


def profile_stream(spark, which: str):
    from incubator_pulsar_spark.plans import queries as Q

    name = {"twap": "twap_stream_events", "scd2": "scd2_stream_events",
            "entropy": "entropy_stream_events",
            "markov": "markov_stream_events",
            "retention": "retention_stream_events",
            "interval": "interval_stream_events"}[which]
    print(f"== {name} end-to-end ==")
    fn = getattr(Q, name)
    t("full gate (count)", lambda: fn(spark, SF_DIR).count())


def profile_graph(spark):
    from incubator_pulsar_spark.plans import queries as Q

    for name in ("connected_components_nations", "hits_nations",
                 "kcore_nations"):
        fn = getattr(Q, name)
        t(f"{name} (count)", lambda: fn(spark, SF_DIR).count())


def main():
    spark = get_spark("profile_r13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    which = sys.argv[1:] or ["ivffold"]
    for w in which:
        if w == "ivffold":
            profile_ivffold(spark)
        elif w == "ivfwrite":
            profile_ivfwrite(spark)
        elif w in ("twap", "scd2", "entropy", "markov", "retention",
                   "interval"):
            profile_stream(spark, w)
        elif w == "graph":
            profile_graph(spark)
        else:
            print(f"unknown target {w}")
    print("== summary ==")
    for k, v in _marks:
        print(f"  {k:<42s} {v:7.3f}s")


if __name__ == "__main__":
    main()
