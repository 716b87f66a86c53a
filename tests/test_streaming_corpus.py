"""Streaming corpus-cleanup tests: stateful cross-batch dedup."""

from __future__ import annotations

from pyspark.sql import Row

BASE = ("the data " * 40).strip()


def _write_docs(spark, path, rows, mode="append"):
    spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING") \
        .write.mode(mode).parquet(path)


def _run(spark, src, out, ckpt):
    from incubator_pulsar_spark.streaming.corpus import start_clean_corpus_stream

    schema = spark.read.parquet(src).schema
    q = start_clean_corpus_stream(
        spark.readStream.schema(schema).parquet(src),
        out_path=out, checkpoint_path=ckpt,
        min_ttr=0.02, available_now=True)
    q.awaitTermination(120)


def test_dedup_state_survives_across_batches(spark, tmp_path):
    """A document re-arriving in a LATER stream run (same normalized
    text, new id) is dropped by the persisted dedup state; quality
    filters and split assignment apply per row."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(spark, src, [
        Row(doc_id=1, text=BASE + " alpha", source="s"),
        Row(doc_id=2, text="too short", source="s"),       # quality-dropped
    ])
    _run(spark, src, out, ckpt)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1}

    # second run, same checkpoint: duplicate content + one new doc
    _write_docs(spark, src, [
        Row(doc_id=7, text=BASE + " alpha", source="s"),   # dup of doc 1
        Row(doc_id=8, text=BASE + " beta", source="s"),    # genuinely new
    ])
    _run(spark, src, out, ckpt)
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 8}
    assert rows[8].split in ("train", "val", "test")
    assert rows[8].fingerprint and rows[8].n_words == 81


def test_dedup_within_requires_event_time(spark, tmp_path):
    import pytest

    from incubator_pulsar_spark.streaming.corpus import clean_corpus_stream

    src = str(tmp_path / "src")
    _write_docs(spark, src, [Row(doc_id=1, text=BASE, source="s")])
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ValueError, match="event_time_col"):
        clean_corpus_stream(stream, dedup_within="1 hour")


def test_neardup_candidates_stream_matches_batch_probe(spark, tmp_path, sf_dir):
    """Two availableNow passes: pass-2 docs' candidates against
    pass-1-indexed docs equal the batch probe_minhash_index result;
    replaying a pass rewrites the same directories (idempotent)."""
    from pyspark.sql import functions as F

    from incubator_pulsar_spark.functions.fuzzy import (
        probe_minhash_index, write_minhash_index)
    from incubator_pulsar_spark.streaming.corpus import (
        start_neardup_candidates_stream)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "docs_topic")
    a.write.parquet(src)

    idx = str(tmp_path / "stream_idx")
    out = str(tmp_path / "cands")
    ck = str(tmp_path / "ck")

    def run_pass():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = start_neardup_candidates_stream(
            stream, index_path=idx, out_path=out, checkpoint_path=ck,
            available_now=True)
        q.awaitTermination(180)

    run_pass()
    b.write.mode("append").parquet(src)
    run_pass()

    got = {(r["probe_id"], r["indexed_id"])
           for r in spark.read.parquet(out).collect()
           if r["indexed_id"] % 2 == 0 and r["probe_id"] % 2 == 1}

    # batch reference: index A, probe B
    ref_idx = str(tmp_path / "batch_idx")
    write_minhash_index(a, ref_idx)
    want = {(r["probe_id"], r["indexed_id"])
            for r in probe_minhash_index(spark, b, ref_idx).collect()}
    assert got == want and len(want) > 0


def test_compacted_index_still_probes_identically(spark, tmp_path, sf_dir):
    """Pass 1 indexes corpus A; compacting its batch dirs into
    _batch_id=-1 must leave pass 2's candidates identical to the batch
    probe of an A-index — the strictly-earlier probe rule keeps seeing
    compacted rows."""
    from pyspark.sql import functions as F

    from incubator_pulsar_spark.functions.fuzzy import (
        compact_minhash_index, probe_minhash_index, write_minhash_index)
    from incubator_pulsar_spark.streaming.corpus import (
        start_neardup_candidates_stream)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "docs_topic")
    a.write.parquet(src)
    idx, out, ck = (str(tmp_path / "sidx"), str(tmp_path / "cands"),
                    str(tmp_path / "ck"))

    def run_pass():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = start_neardup_candidates_stream(
            stream, index_path=idx, out_path=out, checkpoint_path=ck,
            available_now=True)
        q.awaitTermination(180)

    run_pass()
    # one batch dir is already compact — explicitly a no-op
    assert compact_minhash_index(spark, idx) == 0

    b.write.mode("append").parquet(src)
    run_pass()
    n2 = compact_minhash_index(spark, idx)
    assert n2 == 2  # both batch dirs folded into _batch_id=-1
    import os as _os
    dirs = [d for d in _os.listdir(f"{idx}/batches")
            if d.startswith("_batch_id=")]
    assert dirs == ["_batch_id=-1"]

    # candidates collected during the passes == batch reference
    got = {(r["probe_id"], r["indexed_id"])
           for r in spark.read.parquet(out).collect()
           if r["indexed_id"] % 2 == 0 and r["probe_id"] % 2 == 1}
    ref_idx = str(tmp_path / "batch_idx")
    write_minhash_index(a, ref_idx)
    want = {(r["probe_id"], r["indexed_id"])
            for r in probe_minhash_index(spark, b, ref_idx).collect()}
    assert got == want and len(want) > 0

    # and a THIRD pass probing the compacted index still works: new
    # docs (a shifted copy of b) must see candidates from -1 rows
    c = b.withColumn("doc_id", F.col("doc_id") + 100000)
    c.write.mode("append").parquet(src)
    run_pass()
    got3 = {(r["probe_id"], r["indexed_id"])
            for r in spark.read.parquet(out).collect()
            if r["probe_id"] > 100000}
    assert any(i % 2 == 0 for _, i in got3)  # hits against compacted A rows


def test_quality_monitor_stream_matches_batch_and_replays_idempotently(
        spark, tmp_path, sf_dir):
    """Per-micro-batch quality monitor (round 7, VERDICT r6 #8): run
    two availableNow passes over the fixture docs; every batch_id row
    must equal quality_batch_summary() computed in BATCH mode on that
    batch's exact rows, and replaying a pass must rewrite (not
    duplicate) its rows."""
    from pyspark.sql import functions as F

    from incubator_pulsar_spark.functions.text import quality_classifier_scores
    from incubator_pulsar_spark.streaming.corpus import (
        quality_batch_summary, start_quality_monitor_stream)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = start_quality_monitor_stream(
            stream, out_path=out, checkpoint_path=ckpt,
            n_buckets=256, available_now=True)
        q.awaitTermination(120)

    a.write.mode("append").parquet(src)
    run()
    b.write.mode("append").parquet(src)
    run()

    report = spark.read.parquet(out)
    rows = report.collect()
    assert {r.batch_id for r in rows} == {0, 1}
    assert all(r.n_docs > 0 for r in rows)

    # batch parity: the union of per-batch summaries must be exactly
    # the summaries of the two halves (order unknown -> compare as set)
    def batch_row(side):
        scored = quality_classifier_scores(side, n_buckets=256)
        return quality_batch_summary(scored).collect()[0]

    want = {tuple(batch_row(s)) for s in (a, b)}
    got = {tuple(r)[:-1] for r in rows}  # drop batch_id partition col
    assert got == want

    # replay idempotency: re-execute a batch body directly with the
    # same (rows, batch_id) — the crash-replay path. It must OVERWRITE
    # its own batch_id dir, leaving the report at 2 rows, same values.
    from incubator_pulsar_spark.streaming.corpus import quality_monitor_batch
    for _ in range(2):
        quality_monitor_batch(a, 0, out_path=out, n_buckets=256)
    report2 = spark.read.parquet(out)
    assert report2.count() == 2
    assert {tuple(r)[:-1] for r in report2.collect()} == want


def test_quality_monitor_empty_batch_writes_zero_row_not_nulls(
        spark, tmp_path):
    """An EMPTY micro-batch (possible under availableNow replays or a
    filter-everything upstream) must land a report row of explicit
    zeros, never NULL aggregates — an alerting layer thresholding
    keep_rate/mean_score reads 0.0 with n_docs=0, not NULL (ADVICE r7
    #2)."""
    from incubator_pulsar_spark.streaming.corpus import quality_monitor_batch

    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    out = str(tmp_path / "out")
    quality_monitor_batch(empty, 0, out_path=out, n_buckets=256)
    row = spark.read.parquet(out).collect()[0]
    assert row.n_docs == 0
    assert (row.n_keep, row.keep_rate, row.mean_score, row.min_score,
            row.max_score, row.n_tokens) == (0, 0.0, 0.0, 0.0, 0.0, 0)
