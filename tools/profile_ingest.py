"""Fine-grained profile of ivfpq ingest batch internals (round 13).

Replicates ivfpq_ingest_batch's three actions with timers, run twice
(cold + steady) so codegen-compile cost is separable.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from incubator_pulsar_spark.functions import similarity as S  # noqa: E402
from incubator_pulsar_spark.plans.queries import _scratch, _t  # noqa: E402
from incubator_pulsar_spark.session import get_spark  # noqa: E402
from incubator_pulsar_spark.streaming.ann import ivfpq_fold_stream  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label:<46s} {time.time()-t0:7.3f}s", flush=True)
    return out


def one_pass(spark, emb, d, tag):
    print(f"-- pass {tag} --")
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(d + "_out", ignore_errors=True)
    even = emb.filter(F.col("vec_id") % 2 == 0)
    cents = t("train: seed centroids", lambda: S._seed_centroids(even, n_cells=8, id_col="vec_id", vec_col="embedding"))
    books = t("train: pq codebooks",
              lambda: S.pq_train_codebooks(even, m=4, ksub=16, dim=64))
    enc = S._ivfpq_encode(even, cents, books, residual=False)
    t("base encode+write",
      lambda: enc.write.partitionBy("cell").mode("overwrite")
      .parquet(os.path.join(d, "base")))
    with open(os.path.join(d, "_ivfpq.json"), "w") as f:
        json.dump({"centroids": cents, "books": books, "residual": False}, f)

    for bid, mod in ((0, 1), (1, 3)):
        batch_df = emb.filter(F.col("vec_id") % 4 == mod)
        enc_prior = S._ivfpq_read_codes(spark, d, max_stream_batch=bid)
        q = batch_df.select(F.col("vec_id").alias("query_id"),
                            S.as_double_array(F.col("embedding")).alias("qv"))
        # replicate _ivfpq_probe with timers
        qc = (S._attach_centroids(q, cents)
              .withColumn("_scores", S._cell_scores(F.col("qv"))))
        idx = F.sequence(F.lit(0), F.lit(len(cents) - 1))
        pairs = F.zip_with(qc["_scores"], idx,
                           lambda s, i: F.struct(s.alias("s"), i.alias("i")))
        probes = F.slice(F.reverse(F.array_sort(pairs)), 1, 3)
        qe = (qc.withColumn("cell",
                            F.explode(F.transform(probes, lambda p: p["i"])))
              .withColumn("cell", F.col("cell").cast("int")).drop("_scores"))
        qe = qe.drop("_cents")
        probe_cells = t(f"b{bid}: distinct-cells collect",
                        lambda: sorted({r["cell"] for r in
                                        qe.select("cell").distinct().collect()}))
        encp = enc_prior.filter(F.col("cell").isin(probe_cells))
        qt = S._pq_query_table(qe, books, extra=("cell",))
        scored = (encp.join(F.broadcast(qt), "cell")
                  .select("query_id", "vec_id",
                          F.round(S._pq_adc_expr(), 6).alias("adc_d2")))
        hits = S._pq_rank_tail(scored, q, 5, refine=None, vecs=None)
        t(f"b{bid}: hits write",
          lambda: hits.write.mode("overwrite").parquet(
              os.path.join(d + "_out", f"_batch_id={bid}")))
        own = S._ivfpq_encode(batch_df, cents, books, residual=False)
        t(f"b{bid}: own codes write",
          lambda: own.write.mode("overwrite").partitionBy("cell").parquet(
              os.path.join(d, "stream", f"_batch_id={bid}")))
    t("fold", lambda: ivfpq_fold_stream(spark, d))


def main():
    spark = get_spark("profile_ingest")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    emb = _t(spark, SF_DIR, "embeddings")
    d = _scratch("profing", SF_DIR)
    one_pass(spark, emb, d, "cold")
    one_pass(spark, emb, d, "steady")
    one_pass(spark, emb, d, "steady2")


if __name__ == "__main__":
    main()
