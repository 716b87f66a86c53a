"""End-to-end corpus-curation pipeline: the round-5 proof that the
training-data operators COMPOSE — quality filter → exact dedup →
language mixture → per-language token budget → sequence packing →
shuffle shards → versioned snapshot, one flowing DataFrame program
over the real documents fixture, each stage's contract asserted.

This is the pipeline a 100 TB pretraining-data run actually executes;
at gate scale every intermediate is also independently verified by the
per-operator oracles, so this test checks the SEAMS (column contracts,
determinism of the composition, end-state invariants), not re-proving
each operator."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from incubator_pulsar_spark.functions import fuzzy, sampling, text
from incubator_pulsar_spark.operators import snapshots as snap


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_curation_pipeline_end_to_end(spark, docs, tmp_path):
    # 1. quality filter (Gopher-lite score)
    scored = docs.withColumn("q", text.quality_score(F.col("text")))
    kept = scored.filter(F.col("q") >= 0.45)  # ~p20 on this fixture
    n0, n1 = docs.count(), kept.count()
    assert 0 < n1 < n0  # threshold bites but doesn't wipe the corpus

    # 2. exact dedup (the synthetic corpus has real dup texts)
    deduped = fuzzy.exact_dedup_docs(kept)
    n2 = deduped.count()
    assert n2 <= n1
    assert deduped.select("doc_id").distinct().count() == n2

    # 3. language mixture: rebalance what survived toward en/de/zh
    present = {r["lang"] for r in deduped.select("lang").distinct().collect()}
    targets = {d: w for d, w in [("en", 0.6), ("de", 0.2), ("zh", 0.2)]
               if d in present}
    mixed = sampling.mixture_sample(deduped, targets, domain_col="lang",
                                    id_col="doc_id", max_epochs=2.0)
    langs = {r["lang"] for r in mixed.select("lang").distinct().collect()}
    assert langs <= set(targets)  # non-target languages dropped

    # 4. per-language token budget on the mixed corpus (epoch 1 rows
    #    carry the budget; dedup by doc for selection)
    base = mixed.filter(F.col("epoch") == 1).withColumn(
        "toks", text.token_count(F.col("text")))
    budgeted = sampling.token_budget_select(
        base, 3000, quality_col="q", token_col="toks", id_col="doc_id",
        domain_col="lang", n_buckets=32)
    per_lang = {r["lang"]: r["s"] for r in budgeted.groupBy("lang")
                .agg(F.sum("n_tokens_sel").alias("s")).collect()}
    assert per_lang and all(s <= 3000 for s in per_lang.values())

    # 5. pack into 512-token training rows
    packed = sampling.pack_sequences(
        budgeted.select("doc_id", "text"), 512, id_col="doc_id")
    fill = packed.groupBy("shard", "bin_id").agg(
        F.sum("n_tokens").alias("fill"), F.max("n_tokens").alias("mx"))
    # contiguous-spillover contract: fill <= capacity + (max doc - 1)
    bad = fill.filter(F.col("fill") > 512 + F.col("mx") - 1).count()
    assert bad == 0

    # 6. global shuffle into 4 shards, written + snapshotted
    out = str(tmp_path / "corpus")
    final = budgeted.select("doc_id", "lang", "text")
    sampling.write_shuffle_shards(final, out, 4, id_col="doc_id")
    v = snap.snapshot_topic(out)
    back = snap.read_topic_asof(spark, out, v)
    assert back.count() == final.count()
    assert sorted(r.doc_id for r in back.collect()) == \
        sorted(r.doc_id for r in final.collect())

    # 7. whole pipeline is deterministic: re-run == first run
    mixed2 = sampling.mixture_sample(deduped, targets, domain_col="lang",
                                     id_col="doc_id", max_epochs=2.0)
    b2 = sampling.token_budget_select(
        mixed2.filter(F.col("epoch") == 1).withColumn(
            "toks", text.token_count(F.col("text"))),
        3000, quality_col="q", token_col="toks", id_col="doc_id",
        domain_col="lang", n_buckets=32)
    assert sorted(r.doc_id for r in b2.collect()) == \
        sorted(r.doc_id for r in budgeted.collect())


def test_quality_dedup_and_monitoring_pipeline(spark, docs):
    """Session-2 composition: the keep-BEST near-dup resolution feeding
    a winsorized quality distribution and an HLL cardinality monitor —
    the dedup-then-calibrate-then-count seams of a curation run.

    1. near-dup clusters keep their longest member (not lowest-id);
    2. the survivors' length distribution is winsorized at [p1, p99]
       per language (robust normalization before any scoring model);
    3. an HLL sketch monitors surviving-doc cardinality per source —
       estimate within the documented error band of the exact count.
    """
    from incubator_pulsar_spark.functions import sketches
    from incubator_pulsar_spark.functions.quantiles import winsorize

    # 1. keep-best dedup
    pairs = fuzzy.jaccard_pairs(docs, k=5, threshold=0.4)
    resolved = fuzzy.neardup_keep_best(docs, pairs, "n_chars")
    survivors = (resolved.filter(F.col("keep"))
                 .join(docs, on="doc_id"))
    n_clusters = resolved.select("cluster_id").distinct().count()
    assert survivors.count() == n_clusters  # exactly one per cluster
    # keep-best means every survivor is >= its cluster peers by n_chars
    peers = resolved.join(
        survivors.select(F.col("cluster_id"),
                         F.col("score").alias("_best")), on="cluster_id")
    assert peers.filter(F.col("score") > F.col("_best")).count() == 0

    # 2. winsorized length distribution per language
    w = winsorize(survivors, ["lang"], "n_chars")
    assert w.count() == survivors.count()
    stats = w.groupBy("lang").agg(
        F.sum(F.col("_clamped").cast("int")).alias("nc"),
        F.count(F.lit(1)).alias("n")).collect()
    for r in stats:
        assert r.nc <= max(2 * (r.n // 100 + 1), 2)  # ~2% tails clamp

    # 3. HLL cardinality monitor per source
    est = {r.source: r.est_micro / 1e6
           for r in sketches.hll_distinct(
               survivors, "doc_id", group_cols=["source"],
               corrected=True).withColumn(
                   "est_micro",
                   (F.col("estimate") * 1e6).cast("long")).collect()}
    exact = {r.source: r.n for r in survivors.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    for src, n in exact.items():
        assert abs(est[src] - n) / max(n, 1) < 0.25, (src, est[src], n)
