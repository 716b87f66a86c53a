"""Round-5 additions: target-proportion mixture sampling, two-phase
token-budget selection, deterministic shuffle shards.

Reference framing: these are training-data-pipeline operators with no
Pulsar analogue (the reference moves messages; a pretraining pipeline
built on it still needs mixing/selection/shuffling downstream). All
randomness is md5-derived, so every test can check exact equality
against an independent python model.
"""

from __future__ import annotations

import hashlib
import os

import pytest

from pyspark.sql import functions as F

from incubator_pulsar_spark.functions import sampling


def _u(salt: str, ident) -> float:
    h = hashlib.md5(f"{salt}:{ident}".encode()).hexdigest()
    return int(h[:8], 16) / 2 ** 32


def _h(salt: str, ident) -> str:
    return hashlib.md5(f"{salt}:{ident}".encode()).hexdigest()


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 domains with very different sizes; deterministic token counts
    rows = []
    for i in range(600):
        dom = "web" if i % 6 < 4 else ("code" if i % 6 == 4 else "books")
        rows.append((i, dom, 10 + (i * 7) % 90))
    return spark.createDataFrame(rows, "doc_id long, domain string, toks long")


# ---------------------------------------------------------------- mixture

def test_mixture_rates_epoch_cap(corpus):
    # web=400, code=100, books=100 rows
    targets = {"web": 0.5, "books": 0.5}
    rates = sampling.mixture_rates(corpus, targets, domain_col="domain",
                                   max_epochs=2.0)
    # books is binding: S = min(2*400/.5, 2*100/.5) = 400
    assert rates["books"] == pytest.approx(2.0)
    assert rates["web"] == pytest.approx(0.5 * 400 / 400)
    # explicit total overrides the cap
    rates_t = sampling.mixture_rates(corpus, targets, domain_col="domain",
                                     total=200)
    assert rates_t["books"] == pytest.approx(1.0)
    assert rates_t["web"] == pytest.approx(0.25)


def test_mixture_rates_weight_col_and_missing(corpus):
    rates = sampling.mixture_rates(corpus, {"web": 0.9, "code": 0.1},
                                   domain_col="domain", weight_col="toks")
    w = {r["domain"]: r["s"] for r in corpus.groupBy("domain")
         .agg(F.sum("toks").alias("s")).collect()}
    s = min(1.0 * w["web"] / 0.9, 1.0 * w["code"] / 0.1)
    assert rates["web"] == pytest.approx(0.9 * s / w["web"])
    with pytest.raises(ValueError):
        sampling.mixture_rates(corpus, {"nope": 1.0}, domain_col="domain")


def test_mixture_sample_matches_python_model(corpus):
    targets = {"web": 0.4, "books": 0.6}
    out = sampling.mixture_sample(corpus, targets, domain_col="domain",
                                  id_col="doc_id", max_epochs=3.0,
                                  salt="mx").collect()
    rates = sampling.mixture_rates(corpus, targets, domain_col="domain",
                                   max_epochs=3.0)
    model = {}
    for r in corpus.collect():
        rate = rates.get(r["domain"], 0.0)
        n = int(rate) + (1 if _u("mx", r["doc_id"]) < rate - int(rate) else 0)
        if n:
            model[r["doc_id"]] = n
    got = {}
    for r in out:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
        assert 1 <= r["epoch"] <= got[r["doc_id"]] + 3
    assert got == model
    # code domain absent from targets -> fully dropped
    assert all(r["domain"] != "code" for r in out)
    # books upsampled: some rows must appear more than once
    assert max(got[r["doc_id"]] for r in out if r["domain"] == "books") >= 2
    # epoch values are exactly 1..n per doc
    for r in out:
        pass  # counted above
    per_doc_epochs = {}
    for r in out:
        per_doc_epochs.setdefault(r["doc_id"], []).append(r["epoch"])
    for d, es in per_doc_epochs.items():
        assert sorted(es) == list(range(1, model[d] + 1))


def test_mixture_sample_map_only_plan(corpus):
    out = sampling.mixture_sample(corpus, {"web": 1.0}, domain_col="domain",
                                  id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only after the rates agg


# ------------------------------------------------------- token budget

def _naive_budget(rows, budget, salt="budget"):
    """Python model of the prefix cut: rank by (q desc, md5, id)."""
    kept = {}
    by_dom = {}
    for r in rows:
        if r["q"] is None:
            continue
        by_dom.setdefault(r["domain"], []).append(r)
    for dom, rs in by_dom.items():
        rs.sort(key=lambda r: (-r["q"], _h(salt, r["doc_id"]), r["doc_id"]))
        cum = 0
        for r in rs:
            cum += r["toks"]
            if cum <= budget:
                kept[r["doc_id"]] = r["toks"]
    return kept


@pytest.mark.parametrize("budget", [0, 35, 500, 10 ** 9])
def test_token_budget_select_matches_naive(spark, budget):
    rows = []
    for i in range(300):
        dom = "a" if i % 3 else "b"
        q = float((i * 13) % 7)  # heavy ties -> md5 tiebreak exercised
        rows.append((i, dom, 5 + (i * 11) % 40, q))
    rows.append((9000, "a", 10, None))  # NULL quality excluded
    df = spark.createDataFrame(rows,
                               "doc_id long, domain string, toks long, q double")
    out = sampling.token_budget_select(
        df, budget, quality_col="q", token_col="toks", id_col="doc_id",
        domain_col="domain", n_buckets=8).collect()
    model = _naive_budget([r.asDict() for r in df.collect()], budget)
    got = {r["doc_id"]: r["n_tokens_sel"] for r in out}
    assert got == model


def test_token_budget_select_global_no_domain(spark):
    df = spark.createDataFrame(
        [(i, 10 + i, float(i % 5)) for i in range(100)],
        "doc_id long, toks long, q double")
    out = sampling.token_budget_select(
        df, 800, quality_col="q", token_col="toks", id_col="doc_id",
        n_buckets=4).collect()
    rows = [dict(r.asDict(), domain="__all__") for r in df.collect()]
    model = _naive_budget(rows, 800)
    assert {r["doc_id"] for r in out} == set(model)
    assert sum(r["n_tokens_sel"] for r in out) <= 800


# ----------------------------------------------------- shuffle shards

def test_shuffle_shards_model(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = sampling.shuffle_shards(df, 8, id_col="doc_id").collect()
    model = {}
    for i in range(500):
        h = _h("shuffle", i)
        model.setdefault(int(h[:8], 16) % 8, []).append((h, i))
    for s in model:
        model[s] = {i: p + 1 for p, (_, i) in enumerate(sorted(model[s]))}
    assert len(out) == 500
    for r in out:
        assert model[r["shard"]][r["doc_id"]] == r["pos"]
    # balanced-ish: no shard more than 2x the mean
    from collections import Counter
    c = Counter(r["shard"] for r in out)
    assert max(c.values()) < 2 * (500 / 8)


def test_write_shuffle_shards_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(200)], "doc_id long, text string")
    path = str(tmp_path / "shards")
    sampling.write_shuffle_shards(df, path, 4, id_col="doc_id")
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    back = spark.read.parquet(path)
    assert back.count() == 200
    # every shard dir holds exactly one data file (one task per shard)
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1
    # within-file order is the md5 order
    sh0 = spark.read.parquet(os.path.join(path, "shard=0")).collect()
    hs = [_h("shuffle", r["doc_id"]) for r in sh0]
    assert hs == sorted(hs)


# ------------------------------------------------------ snapshots

def test_snapshot_time_travel_append_only(spark, tmp_path):
    from incubator_pulsar_spark.operators import snapshots as snap

    d = str(tmp_path / "topic")
    spark.createDataFrame([(i, "a") for i in range(10)],
                          "id long, v string").write.parquet(d)
    v1 = snap.snapshot_topic(d)
    spark.createDataFrame([(i, "b") for i in range(10, 25)],
                          "id long, v string").write.mode("append").parquet(d)
    v2 = snap.snapshot_topic(d)
    assert (v1, v2) == (1, 2)
    assert snap.read_topic_asof(spark, d, v1).count() == 10
    assert snap.read_topic_asof(spark, d, v2).count() == 25
    assert snap.read_topic_asof(spark, d).count() == 25  # latest default
    diff = snap.diff_snapshots(d, v1, v2)
    assert diff["removed"] == [] and len(diff["added"]) > 0
    # vacuum on append-only: expires v1's manifest, deletes NO data
    # (every v1 file is still live in v2)
    res = snap.vacuum_topic(d, keep_last=1)
    assert res["expired"] == [1] and res["deleted"] == []
    assert snap.read_topic_asof(spark, d).count() == 25
    with pytest.raises(ValueError, match="not found"):
        snap.read_topic_asof(spark, d, v1)


def test_snapshot_cow_rewrite_and_vacuum(spark, tmp_path):
    from incubator_pulsar_spark.operators import snapshots as snap

    d = str(tmp_path / "topic")
    # many small files: one per row
    spark.createDataFrame([(i,) for i in range(20)], "id long") \
        .repartition(20).write.parquet(d)
    v1 = snap.snapshot_topic(d)
    n_before = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_before > 2  # AQE may coalesce, but it's still many files
    v2 = snap.rewrite_compact(spark, d, n_files=2)
    # old snapshot still reads (COW: originals untouched)
    assert snap.read_topic_asof(spark, d, v1).count() == 20
    got = snap.read_topic_asof(spark, d, v2)
    assert sorted(r.id for r in got.collect()) == list(range(20))
    # a later append + snapshot must NOT resurrect the stranded files
    spark.createDataFrame([(99,)], "id long").write.mode("append").parquet(d)
    v3 = snap.snapshot_topic(d)
    assert snap.read_topic_asof(spark, d, v3).count() == 21
    # vacuum to the last two snapshots: v1 expires, its 20 originals
    # (referenced by nothing retained) are deleted
    res = snap.vacuum_topic(d, keep_last=2)
    assert res["expired"] == [v1]
    assert len(res["deleted"]) == n_before  # every stranded original
    assert snap.read_topic_asof(spark, d, v3).count() == 21
    assert snap.read_topic_asof(spark, d, v2).count() == 20
    # full history: v1 unreadable now
    with pytest.raises(ValueError):
        snap.read_topic_asof(spark, d, v1)


def test_snapshot_append_and_snapshot_sink(spark, tmp_path):
    from incubator_pulsar_spark.operators import snapshots as snap

    d = str(tmp_path / "topic")
    os.makedirs(d)
    for batch in range(3):
        v = snap.append_and_snapshot(
            spark.createDataFrame([(batch,)], "id long"), d)
        assert v == batch + 1
    assert [s["version"] for s in snap.list_snapshots(d)] == [1, 2, 3]
    assert snap.read_topic_asof(spark, d, 2).count() == 2


def test_snapshot_incremental_read(spark, tmp_path):
    from incubator_pulsar_spark.operators import snapshots as snap

    d = str(tmp_path / "topic")
    spark.createDataFrame([(i,) for i in range(5)], "id long") \
        .write.parquet(d)
    v1 = snap.snapshot_topic(d)
    spark.createDataFrame([(i,) for i in range(5, 12)], "id long") \
        .write.mode("append").parquet(d)
    v2 = snap.snapshot_topic(d)
    inc = snap.read_topic_incremental(spark, d, v1, v2)
    assert sorted(r.id for r in inc.collect()) == list(range(5, 12))
    # empty range -> zero rows, same schema
    assert snap.read_topic_incremental(spark, d, v2, v2).count() == 0
    # a COW rewrite breaks file-level increments across it — explicit
    v3 = snap.rewrite_compact(spark, d)
    with pytest.raises(ValueError, match="rewrite"):
        snap.read_topic_incremental(spark, d, v1, v3)


def test_snapshot_sink_streaming_exactly_once(spark, tmp_path):
    """foreachBatch snapshot sink: per-batch versions, time travel
    across batches, and a checkpoint-restart replay that converges
    without duplicates (batch_id=N overwrite idempotence)."""
    from incubator_pulsar_spark.operators import snapshots as snap

    src = str(tmp_path / "src")
    topic = str(tmp_path / "topic")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([(i,) for i in range(6)], "id long") \
        .write.parquet(src)

    def run():
        q = (spark.readStream.schema("id long").parquet(src)
             .writeStream.foreachBatch(snap.snapshot_sink(topic))
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        assert q.awaitTermination(120)

    run()
    v_after_1 = snap.list_snapshots(topic)[-1]["version"]
    assert snap.read_topic_asof(spark, topic).count() == 6
    # second batch of data, resumed stream
    spark.createDataFrame([(i,) for i in range(6, 10)], "id long") \
        .write.mode("append").parquet(src)
    run()
    got = snap.read_topic_asof(spark, topic)
    assert sorted(r.id for r in got.collect()) == list(range(10))
    # time travel to the first batch's snapshot still works
    assert snap.read_topic_asof(spark, topic, v_after_1).count() == 6
    # incremental read between the two = exactly the new rows
    v_latest = snap.list_snapshots(topic)[-1]["version"]
    inc = snap.read_topic_incremental(spark, topic, v_after_1, v_latest)
    assert sorted(r.id for r in inc.collect()) == list(range(6, 10))
    # replaying batch 0 by hand (same df, same batch_id) converges:
    # same row multiset, no duplicates
    snap.snapshot_sink(topic)(spark.read.parquet(src).filter("id < 6"), 0)
    assert snap.read_topic_asof(spark, topic).count() == 10


def test_mixture_apply_streaming(spark, tmp_path):
    """Frozen rates from a batch corpus applied to a stream — the
    map-only contract means the same expressions run under
    readStream unchanged."""
    from incubator_pulsar_spark.functions import sampling

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    batch = spark.createDataFrame(
        [(i, "web" if i % 2 else "code") for i in range(100)],
        "doc_id long, domain string")
    batch.write.parquet(src)
    rates = sampling.mixture_rates(batch, {"web": 0.5, "code": 0.5},
                                   domain_col="domain", max_epochs=2.0)
    stream = spark.readStream.schema("doc_id long, domain string") \
        .parquet(src)
    q = (sampling.mixture_apply(stream, rates, domain_col="domain",
                                id_col="doc_id")
         .writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    want = sampling.mixture_apply(batch, rates, domain_col="domain",
                                  id_col="doc_id").collect()
    assert sorted((r.doc_id, r.epoch) for r in got) == \
        sorted((r.doc_id, r.epoch) for r in want)


# ---------------------------------------------------------- kmeans

def test_kmeans_matches_numpy_lloyd(spark):
    """Spherical k-means vs a pure-numpy Lloyd model with the same
    snapping rules (round-9 assignment cosines, round-6 decimal-mean
    centroids, ties to lowest cluster, empty cluster keeps centroid)."""
    import numpy as np

    from incubator_pulsar_spark.functions import similarity

    rng_rows = []
    # 3 well-separated deterministic blobs in 8-d
    for i in range(90):
        blob = i % 3
        base = np.zeros(8)
        base[blob] = 10.0
        off = np.array([((i * 7 + d * 3) % 5) * 0.1 for d in range(8)])
        rng_rows.append((i, (base + off).tolist()))
    df = spark.createDataFrame(rng_rows, "vec_id long, embedding array<double>")

    k, n_iter = 3, 2
    got = {r.vec_id: (r.cluster, r.cosine_sim)
           for r in similarity.kmeans_embeddings(
               df, k=k, n_iter=n_iter).collect()}

    # python model
    vs = {i: np.array(v) for i, v in rng_rows}

    def cos(a, b, nd):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 0.0
        return round(float(np.dot(a, b) / (na * nb)), nd)

    # farthest-point seeding over the (full) pool, round-9
    ids = sorted(vs)
    unit = {i: vs[i] / (np.linalg.norm(vs[i]) or 1.0) for i in ids}
    chosen = [ids[0]]
    sims = {i: round(float(np.dot(unit[i], unit[chosen[0]])), 9) for i in ids}
    for _ in range(1, k):
        nxt = min(ids, key=lambda i: (sims[i], i))
        chosen.append(nxt)
        for i in ids:
            sims[i] = max(sims[i], round(float(np.dot(unit[i], unit[nxt])), 9))
    cents = [vs[j].copy() for j in chosen]

    def assign(cents):
        out = {}
        for i in ids:
            scores = [cos(vs[i], c, 9) for c in cents]
            out[i] = int(np.argmax(scores))  # first max = lowest cluster
        return out

    for _ in range(n_iter):
        a = assign(cents)
        for c in range(k):
            members = [vs[i] for i in ids if a[i] == c]
            if members:
                cents[c] = np.array([
                    round(float(sum(m[d] for m in members)) / len(members), 6)
                    for d in range(8)])
    final = assign(cents)
    for i in ids:
        assert got[i][0] == final[i], i
        assert got[i][1] == cos(vs[i], cents[final[i]], 6), i
