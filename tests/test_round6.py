"""Round-6: crash-safety fixes to versioned snapshots (ADVICE r5).

Four failure modes the round-5 module had, each now regression-locked:

1. vacuum after an in-place partition rewrite (merge_into_topic) must
   NOT delete live files in partitions the rewrite never touched, even
   with keep_last=0 and even if the caller vacuums BEFORE re-snapshot.
2. a rewrite_compact crash between the cow-file renames and the
   manifest write must not duplicate rows in the next snapshot; the
   orphan cow files are ignored by snapshot/vacuum and deleted by the
   next rewrite run.
3. read_topic_asof on an empty-file-list manifest returns the TOPIC's
   schema (derived from a non-empty snapshot or disk), not a
   fabricated one.
4. append_and_snapshot / snapshot_sink docstrings state the real
   replay semantics (behavioral part covered by existing streaming
   test; here we lock the strand-on-replay posture).
"""

from __future__ import annotations

import os

import pytest

from incubator_pulsar_spark.operators import snapshots as snap


def _write(spark, d, lo, hi, sub=None):
    df = spark.range(lo, hi).selectExpr("id", "id * 2 AS v")
    path = os.path.join(d, sub) if sub else d
    df.write.mode("append").parquet(path)


# ---------------------------------------------------- ADVICE high #1

def test_vacuum_never_deletes_current_live_set(spark, tmp_path):
    """In-place rewrite of ONE partition, then the formerly-documented
    (wrong) recovery order — vacuum keep_last=0 BEFORE re-snapshot —
    must still preserve every row of the untouched partition."""
    d = str(tmp_path / "topic")
    spark.range(0, 10).selectExpr("id", "'a' AS part") \
        .write.partitionBy("part").mode("append").parquet(d)
    spark.range(100, 110).selectExpr("id", "'b' AS part") \
        .write.partitionBy("part").mode("append").parquet(d)
    snap.snapshot_topic(d)
    # simulate merge_into_topic on partition b only: replace its files
    pb = os.path.join(d, "part=b")
    for f in os.listdir(pb):
        if f.endswith(".parquet"):
            os.remove(os.path.join(pb, f))
    spark.range(200, 215).selectExpr("id") \
        .write.mode("append").parquet(pb)
    # WRONG ORDER on purpose: vacuum everything, then snapshot
    res = snap.vacuum_topic(d, keep_last=0)
    # partition a's files were referenced only by the (now expired)
    # manifest, but they are in the current live set — not deleted
    assert res["deleted"] == []
    v = snap.snapshot_topic(d)
    got = snap.read_topic_asof(spark, d, v)
    assert got.count() == 25  # 10 from part=a + 15 rewritten in part=b
    assert got.filter("part = 'a'").count() == 10


def test_vacuum_snapshot_first_recovery_reclaims_space(spark, tmp_path):
    """The documented recipe (snapshot first, then vacuum) still
    reclaims truly-dead files: COW rewrite leaves originals stranded,
    vacuum after re-snapshot removes them."""
    d = str(tmp_path / "topic")
    _write(spark, d, 0, 20)
    v1 = snap.snapshot_topic(d)
    v2 = snap.rewrite_compact(spark, d, n_files=1)
    res = snap.vacuum_topic(d, keep_last=1)
    assert v1 in res["expired"]
    assert len(res["deleted"]) > 0  # the pre-compaction originals
    assert snap.read_topic_asof(spark, d, v2).count() == 20


# ---------------------------------------------------- ADVICE high #2

def test_orphan_cow_files_never_duplicate_rows(spark, tmp_path):
    """Simulate a rewrite_compact crash AFTER the cow renames, BEFORE
    the manifest write: hand-place cow-prefixed files holding copies
    of the live rows. snapshot_topic must ignore them; counts stay
    exact; the next rewrite_compact deletes the orphans."""
    d = str(tmp_path / "topic")
    _write(spark, d, 0, 20)
    snap.snapshot_topic(d)
    # the "crash": cow files exist on disk, no manifest references them
    cow_src = str(tmp_path / "cowsrc")
    spark.read.parquet(d).coalesce(1).write.parquet(cow_src)
    n_orphans = 0
    for f in sorted(os.listdir(cow_src)):
        if f.endswith(".parquet"):
            os.rename(os.path.join(cow_src, f),
                      os.path.join(d, f"cow00000002-{f}"))
            n_orphans += 1
    assert n_orphans >= 1
    v = snap.snapshot_topic(d)
    assert snap.read_topic_asof(spark, d, v).count() == 20  # not 40
    # vacuum doesn't treat orphans as live (they're in no manifest,
    # so untouched by the never-delete-unreferenced rule either way)
    snap.vacuum_topic(d, keep_last=1)
    assert snap.read_topic_asof(spark, d).count() == 20
    # re-running the rewrite heals: orphans deleted, result exact
    v3 = snap.rewrite_compact(spark, d, n_files=1)
    assert snap.read_topic_asof(spark, d, v3).count() == 20
    leftover = [f for f in os.listdir(d)
                if f.startswith("cow00000002-")]
    assert leftover == []


# ----------------------------------------------------- ADVICE low #5

def test_empty_snapshot_keeps_topic_schema(spark, tmp_path):
    d = str(tmp_path / "topic")
    os.makedirs(d)
    v1 = snap.snapshot_topic(d)          # empty manifest
    _write(spark, d, 0, 5)
    v2 = snap.snapshot_topic(d)
    empty = snap.read_topic_asof(spark, d, v1)
    full = snap.read_topic_asof(spark, d, v2)
    assert empty.count() == 0
    assert empty.schema == full.schema
    # the exact caller pattern the fabricated schema used to break
    assert empty.select("id", "v").unionByName(full).count() == 5


def test_empty_snapshot_no_schema_source_raises(spark, tmp_path):
    d = str(tmp_path / "topic")
    os.makedirs(d)
    v1 = snap.snapshot_topic(d)
    with pytest.raises(ValueError, match="derive"):
        snap.read_topic_asof(spark, d, v1)


# ----------------------------------------------------- ADVICE low #4

def test_snapshot_sink_replay_strands_midpoint_manifest(spark, tmp_path):
    """Replaying a batch rewrites the same rows under NEW file names:
    latest state is exact, the manifest taken between first write and
    replay strands, and incrementals across the boundary raise."""
    d = str(tmp_path / "topic")
    sink = snap.snapshot_sink(d)
    sink(spark.range(0, 6).selectExpr("id", "id AS v"), 0)
    v_first = snap.list_snapshots(d)[-1]["version"]
    sink(spark.range(0, 6).selectExpr("id", "id AS v"), 0)  # replay
    v_replay = snap.list_snapshots(d)[-1]["version"]
    assert snap.read_topic_asof(spark, d, v_replay).count() == 6
    with pytest.raises(ValueError, match="missing"):
        snap.read_topic_asof(spark, d, v_first)
    with pytest.raises(ValueError):
        snap.read_topic_incremental(spark, d, v_first, v_replay)


# ------------------------------------------- r6 curation operators

def test_remove_boilerplate_semantics(spark):
    """Crafted corpus: a repeated 3-word 'cookie banner' appears in 3
    docs (boilerplate, removed); unique content survives in order."""
    from incubator_pulsar_spark.functions import text

    banner = "accept all cookies"
    rows = [
        (1, f"{banner} alpha beta gamma delta eps zeta"),
        (2, f"unique opening words {banner} tail words here"),
        (3, f"{banner} totally different content again here"),
        (4, "no banner in this document at all ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.remove_boilerplate(docs, window=3, min_df=3).collect()}
    # the banner occupies segment 0 of docs 1 and 3 and segment 1 of
    # doc 2 (segments are non-overlapping 3-word windows) -> df=3
    assert out[1]["clean_text"] == "alpha beta gamma delta eps zeta"
    assert out[1]["n_removed"] == 1
    assert out[2]["clean_text"] == "unique opening words tail words here"
    assert out[3]["clean_text"] == "totally different content again here"
    assert out[4]["n_removed"] == 0
    assert out[4]["clean_text"] == "no banner in this document at all ok"


def test_remove_boilerplate_empty_and_total_removal(spark):
    from incubator_pulsar_spark.functions import text

    rows = [(1, "spam spam spam"), (2, "spam spam spam"),
            (3, "spam spam spam"), (4, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.remove_boilerplate(docs, window=3, min_df=3).collect()}
    for d in (1, 2, 3):
        assert out[d]["clean_text"] == "" and out[d]["n_kept"] == 0 \
            and out[d]["n_removed"] == 1
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 0
    assert len(out) == 4  # every input doc present


def test_quality_classifier_matches_python_model(spark):
    import hashlib
    import re

    from incubator_pulsar_spark.functions import text

    rows = [(i, t) for i, t in enumerate(
        ["the quick brown fox", "lorem ipsum dolor sit amet",
         "spark spark spark table merge", ""])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           text.quality_classifier_scores(docs, n_buckets=64).collect()}

    def w_of(b):
        return int(hashlib.md5(f"qw:{b}".encode()).hexdigest()[:8],
                   16) / 2.0 ** 31 - 1.0

    for doc_id, t in rows:
        toks = re.findall(r"[a-z]+", t.lower())
        ws = [w_of(int(hashlib.md5(f"qb:{tok}".encode())
                       .hexdigest()[:8], 16) % 64) for tok in toks]
        exp = round(sum(ws) / len(ws), 6) if ws else 0.0
        assert got[doc_id]["n_tokens"] == len(toks)
        assert abs(got[doc_id]["quality_score"] - exp) < 1e-9
        assert got[doc_id]["keep"] == (exp >= 0)


def test_quality_classifier_custom_weights(spark):
    from incubator_pulsar_spark.functions import text

    docs = spark.createDataFrame([(1, "good good bad")],
                                 "doc_id long, text string")
    # all-positive weights -> every doc keeps
    out = text.quality_classifier_scores(
        docs, n_buckets=4, weights=[1.0, 1.0, 1.0, 1.0]).collect()[0]
    assert out["quality_score"] == 1.0 and out["keep"]
    with pytest.raises(ValueError):
        text.quality_classifier_scores(docs, n_buckets=4, weights=[1.0])


def test_kcenter_coreset_properties(spark):
    """k tight clusters -> k centers land one per cluster: every
    vector's coverage cosine is high, counts sum to N."""
    from incubator_pulsar_spark.functions import similarity

    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(4, 16)
    rows = []
    for i in range(200):
        c = i % 4
        v = base[c] + 0.01 * rng.randn(16)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.kcenter_coreset(emb, k=4).collect()
    assert len(out) == 4
    assert sum(r["n_covered"] for r in out) == 200
    assert min(r["coverage_cos"] for r in out) > 0.99


def test_rrf_fuse_hand_model(spark):
    from incubator_pulsar_spark.functions import similarity

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)],
                              "doc_id long, rank int")
    got = {r["doc_id"]: r for r in similarity.rrf_fuse(a, b).collect()}
    assert abs(got[20]["rrf_score"]
               - round(1 / 62 + 1 / 61, 6)) < 1e-12
    assert abs(got[10]["rrf_score"] - round(1 / 61, 6)) < 1e-12
    assert got[40]["rank_a"] == 0 and got[40]["rank_b"] == 2
    # fused order: 20 (both lists) first, then 10, 40, 30
    order = sorted(got.values(), key=lambda r: r["fused_rank"])
    assert [r["doc_id"] for r in order] == [20, 10, 40, 30]
