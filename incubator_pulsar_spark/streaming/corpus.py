"""Streaming corpus cleanup: the training-data pipeline as a
continuously-running ingest.

Batch form: ``functions.corpus.clean_corpus``. This continuous form
handles the case where documents ARRIVE as a stream (crawl output, log
tail) and the cleaned corpus must stay deduplicated ACROSS micro-batches
forever: redaction / quality filters / split assignment are stateless
map stages (identical to batch), while exact dedup becomes Spark's
stateful streaming ``dropDuplicates`` on the normalized-text
fingerprint — the state store keeps one 16-byte md5 per distinct
document ever seen, so a re-crawled page is dropped even if its first
copy arrived weeks earlier.

State sizing at scale: the dedup state is fingerprint-only (payloads
never enter the store), i.e. ~48 bytes/doc with store overhead — 1 B
docs ≈ 50 GB spread across the cluster's state stores, checkpointed
incrementally. If unbounded history is not needed, pass
``dedup_within`` to use ``dropDuplicatesWithinWatermark`` instead and
the store stays bounded by the watermark horizon.

Near-dup CANDIDATE GENERATION is continuous too since round 4c:
``start_neardup_candidates_stream`` probes and grows the persisted
LSH band index per micro-batch (O(batch), corpus never rescanned).
Exact verification + connected-components clustering over the
candidate log remain a periodic batch job — the same split the
reference makes between its data plane (continuous) and compaction
(periodic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text
from ..functions.corpus import quality_flags, split_assignment


def clean_corpus_stream(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    event_time_col: str | None = None, dedup_within: str | None = None,
    min_words: int = 30, min_ttr: float = 0.35,
    min_stopword_ratio: float = 0.01, max_pattern_density: float = 5.0,
) -> DataFrame:
    """Transform a streaming documents DataFrame into the cleaned,
    deduplicated, split-assigned stream. Pure transformation — attach
    your own sink/trigger.

    ``dedup_within`` (e.g. ``"7 days"``) bounds dedup state with
    ``dropDuplicatesWithinWatermark`` on ``event_time_col``; default is
    exact forever-dedup on the fingerprint.
    """
    redacted = docs.withColumn(text_col, text.redact_pii(F.col(text_col)))
    flagged = quality_flags(
        redacted, text_col=text_col, min_words=min_words, min_ttr=min_ttr,
        min_stopword_ratio=min_stopword_ratio,
        max_pattern_density=max_pattern_density)
    kept = flagged.filter(F.col("quality_ok")).drop("quality_ok")
    kept = kept.withColumn("fingerprint", text.fingerprint(F.col(text_col)))
    if dedup_within is not None:
        if event_time_col is None:
            raise ValueError("dedup_within requires event_time_col")
        kept = kept.withWatermark(event_time_col, dedup_within) \
            .dropDuplicatesWithinWatermark(["fingerprint"])
    else:
        kept = kept.dropDuplicates(["fingerprint"])
    return kept.withColumn("split", split_assignment(id_col))


def start_clean_corpus_stream(
    docs: DataFrame, *, out_path: str, checkpoint_path: str,
    available_now: bool = False, **clean_kwargs,
):
    """Run the cleanup to a parquet sink (returns StreamingQuery)."""
    cleaned = clean_corpus_stream(docs, **clean_kwargs)
    writer = (cleaned.writeStream.format("parquet")
              .option("path", out_path)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_quality_monitor_stream(
    docs: DataFrame, *, out_path: str, checkpoint_path: str,
    n_buckets: int = 1024, weights: list[float] | None = None,
    id_col: str = "doc_id", text_col: str = "text",
    available_now: bool = False,
):
    """Continuous corpus-quality monitoring: score every micro-batch
    with the hashing-trick quality classifier
    (``functions.text.quality_classifier_scores`` — map-only, no vocab
    state, weight table broadcast once per batch) and append ONE
    summary row (batch_id, n_docs, n_keep, keep_rate, mean_score,
    min_score, max_score, n_tokens) to a parquet report topic — the
    quality time series an ingest-alerting layer thresholds on (e.g.
    "crawl batch mean quality dropped 2σ").

    Mirrors ``functions.checks.start_checks_stream``: each batch's row
    overwrites its own ``batch_id=N`` directory, so a replayed batch
    rewrites itself idempotently instead of duplicating rows (the
    late.py pattern). The per-batch aggregate folds the round-6 scores
    through decimal(38,6), so the report is deterministic under any
    partitioning — stream and batch runs of the same rows produce
    byte-identical summaries (locked by the parity pytest).

    Returns the StreamingQuery.
    """
    def process(batch_df, batch_id: int) -> None:
        quality_monitor_batch(
            batch_df, batch_id, out_path=out_path, n_buckets=n_buckets,
            weights=weights, id_col=id_col, text_col=text_col)

    writer = (docs.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def quality_monitor_batch(batch_df: DataFrame, batch_id: int, *,
                          out_path: str, n_buckets: int = 1024,
                          weights: list[float] | None = None,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> None:
    """The monitor's per-micro-batch body, public so a crash REPLAY of
    a batch is directly testable: score, summarize, overwrite this
    batch's own ``batch_id=N`` directory (idempotent — a re-run of the
    same batch rewrites the same row)."""
    scored = text.quality_classifier_scores(
        batch_df, n_buckets=n_buckets, weights=weights,
        id_col=id_col, text_col=text_col)
    (quality_batch_summary(scored).write.mode("overwrite")
     .parquet(os.path.join(out_path, f"batch_id={batch_id}")))


def quality_batch_summary(scored: DataFrame) -> DataFrame:
    """One-row summary of a scored batch (shared by the streaming
    monitor and its batch-parity form): decimal-folded mean keeps the
    result independent of partitioning/arrival order.

    An EMPTY micro-batch still yields one row, with every aggregate
    coalesced to an explicit zero instead of SQL's sum/min/max-over-
    nothing NULLs — a downstream alerting layer thresholding
    keep_rate or mean_score must read 0.0, never NULL (and n_docs=0
    marks the row as vacuous for consumers that want to skip it)."""
    dec = F.col("quality_score").cast("decimal(38,6)")
    n = F.count(F.lit(1)).cast("long")
    return scored.agg(
        n.alias("n_docs"),
        F.coalesce(F.sum(F.col("keep").cast("long")).cast("long"),
                   F.lit(0).cast("long")).alias("n_keep"),
        F.coalesce(
            F.round(F.sum(F.col("keep").cast("long")) / F.count(F.lit(1)), 6),
            F.lit(0.0)).alias("keep_rate"),
        F.coalesce(
            F.round((F.sum(dec) / F.count(F.lit(1))).cast("double"), 6),
            F.lit(0.0)).alias("mean_score"),
        F.coalesce(F.min("quality_score"), F.lit(0.0)).alias("min_score"),
        F.coalesce(F.max("quality_score"), F.lit(0.0)).alias("max_score"),
        F.coalesce(F.sum("n_tokens").cast("long"),
                   F.lit(0).cast("long")).alias("n_tokens"))


def start_neardup_candidates_stream(
    docs: DataFrame, *, index_path: str, out_path: str,
    checkpoint_path: str, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, num_hashes: int = 16, bands: int = 4,
    available_now: bool = False,
):
    """Continuous near-dup detection against everything ever ingested —
    the incremental-index form that retires this module's old
    "near-dup is batch-only" caveat for CANDIDATE GENERATION: each
    micro-batch (1) bands itself map-side, (2) probes the persisted
    band table for collisions with every earlier document, (3) appends
    its own bands. Per-batch cost is O(batch + collisions); the corpus
    is never rescanned (functions.fuzzy.write_minhash_index rationale).

    Replay safety: both the candidate output and the index appends
    land under explicit ``_batch_id=N`` directories with
    mode('overwrite') — a replayed batch rewrites its own directories
    idempotently instead of duplicating rows (the late.py pattern).
    Exact verification / clustering over the candidate log remains a
    periodic batch job, as before.

    Returns the StreamingQuery.
    """
    from ..functions.fuzzy import band_table

    bands_root = os.path.join(index_path, "batches")

    def process(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        banded = band_table(batch_df, id_col=id_col, text_col=text_col,
                            k=k, num_hashes=num_hashes, bands=bands)
        banded = banded.persist()
        try:
            if os.path.isdir(bands_root):
                # probe strictly-earlier batches only: on a REPLAY this
                # batch's own bands are already on disk, and including
                # them would change the candidate set vs the first run
                idx = (spark.read.parquet(bands_root)
                       .filter(F.col("_batch_id") < batch_id)
                       .select(F.col("doc_id").alias("indexed_id"),
                               "band_id", "band_hash"))
                cands = (banded.select(F.col("doc_id").alias("probe_id"),
                                       "band_id", "band_hash")
                         .join(idx, ["band_id", "band_hash"])
                         .filter(F.col("probe_id") != F.col("indexed_id"))
                         .select("probe_id", "indexed_id").distinct())
            else:
                cands = spark.createDataFrame(
                    [], "probe_id long, indexed_id long")
            cands.write.mode("overwrite").parquet(
                os.path.join(out_path, f"_batch_id={batch_id}"))
            banded.write.mode("overwrite").parquet(
                os.path.join(bands_root, f"_batch_id={batch_id}"))
        finally:
            banded.unpersist()

    writer = (docs.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
