"""Continuous-ingest similarity search: per-micro-batch ANN probe +
index maintenance over a persisted PQ index.

The batch PQ family (``functions.similarity.pq_write_index`` /
``pq_append_index`` / ``pq_search_index``) covers build-time and
periodic maintenance; this module covers the case where embeddings
ARRIVE as a stream (fresh crawl vectors, embedding-service output) and
each batch must (1) find its nearest neighbors among EVERYTHING
ingested earlier and (2) join the index itself — the similarity-search
twin of ``streaming.corpus.start_neardup_candidates_stream``, under
the same replay discipline:

- probe strictly-earlier state only (``_batch_id < batch_id``): on a
  crash REPLAY this batch's own codes are already on disk, and
  including them would change the candidate set vs the first run
  (every vector would match itself at distance 0);
- both the probe output and the index append land under explicit
  ``_batch_id=N`` directories with mode("overwrite") — a replayed
  batch rewrites its own directories idempotently (the late.py
  pattern, shared with the quality monitor and neardup streams).

The streaming probe is the raw ADC scan (codes only — dim·8
bytes/vector never move). EXACT re-ranking of the accumulated
candidate log is a periodic batch job (``pq_search_index`` with
``refine=`` against the corpus table) — the same continuous/periodic
split the neardup stream makes between candidate generation and
exact verification, and the reference makes between its data plane
and compaction.

Per-batch cost is O(batch · index-codes): the scan reads only the
compressed code table (m bytes/vector at ksub=256), the codebooks
broadcast once, and the only shuffle is the per-query top-k window.
The corpus's raw vectors are never rescanned.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import (_ivfpq_encode, _ivfpq_probe,
                                    _ivfpq_read_codes, _pq_adc_rank,
                                    _pq_read_codes, as_double_array,
                                    pq_encode)


def pq_ingest_batch(batch_df: DataFrame, batch_id: int, *,
                    index_path: str, out_path: str, k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> None:
    """One micro-batch of the ingest stream, public so a crash REPLAY
    is directly testable: probe the index as it stood BEFORE this
    batch (base + stream batches < batch_id), write this batch's ADC
    top-k under ``out/_batch_id=N``, then append this batch's codes
    under ``index/stream/_batch_id=N`` — both overwrites, so a re-run
    of the same (rows, batch_id) rewrites itself byte-for-byte."""
    spark = batch_df.sparkSession
    with open(os.path.join(index_path, "_codebooks.json")) as f:
        books = json.load(f)

    enc_prior = _pq_read_codes(spark, index_path,
                               max_stream_batch=batch_id)
    q = batch_df.select(F.col(id_col).alias("query_id"),
                        as_double_array(F.col(vec_col)).alias("qv"))
    hits = _pq_adc_rank(enc_prior, q, books, k, refine=None, vecs=None)
    hits.write.mode("overwrite").parquet(
        os.path.join(out_path, f"_batch_id={batch_id}"))

    enc_own = pq_encode(batch_df, books, id_col=id_col, vec_col=vec_col)
    enc_own.write.mode("overwrite").parquet(
        os.path.join(index_path, "stream", f"_batch_id={batch_id}"))


def start_pq_ingest_stream(
    embeddings: DataFrame, *, index_path: str, out_path: str,
    checkpoint_path: str, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    available_now: bool = False,
):
    """Continuous PQ ingest over a stream of embedding rows. The index
    at ``index_path`` must exist (``pq_write_index`` — the codebooks
    are frozen there; stream batches encode with them, never retrain,
    the standard PQ contract). Returns the StreamingQuery."""
    def process(batch_df, batch_id: int) -> None:
        pq_ingest_batch(batch_df, batch_id, index_path=index_path,
                        out_path=out_path, k=k,
                        id_col=id_col, vec_col=vec_col)

    writer = (embeddings.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivfpq_ingest_batch(batch_df: DataFrame, batch_id: int, *,
                       index_path: str, out_path: str, k: int = 10,
                       nprobe: int = 4, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> None:
    """``pq_ingest_batch`` for the cell-partitioned IVFADC index: the
    probe additionally prunes to nprobe cells per query (the whole
    point of the coarse quantizer under continuous ingest — each
    batch's neighbor search reads nprobe/n_cells of the accumulated
    codes, not all of them), and the batch's own appends land under
    ``stream/_batch_id=N/cell=C`` so later probes keep directory-level
    pruning over streamed rows too. Same replay discipline: probe
    strictly-earlier state, overwrite exactly your own directories."""
    spark = batch_df.sparkSession
    with open(os.path.join(index_path, "_ivfpq.json")) as f:
        side = json.load(f)
    cents, books = side["centroids"], side["books"]
    residual = side.get("residual", False)

    enc_prior = _ivfpq_read_codes(spark, index_path,
                                  max_stream_batch=batch_id)
    q = batch_df.select(F.col(id_col).alias("query_id"),
                        as_double_array(F.col(vec_col)).alias("qv"))
    hits = _ivfpq_probe(enc_prior, q, cents, books, k,
                        nprobe=nprobe, refine=None, vecs=None,
                        residual=residual)
    hits.write.mode("overwrite").parquet(
        os.path.join(out_path, f"_batch_id={batch_id}"))

    own = _ivfpq_encode(batch_df, cents, books, residual=residual,
                        id_col=id_col, vec_col=vec_col)
    own.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(index_path, "stream", f"_batch_id={batch_id}"))


def start_ivfpq_ingest_stream(
    embeddings: DataFrame, *, index_path: str, out_path: str,
    checkpoint_path: str, k: int = 10, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    available_now: bool = False,
):
    """Continuous IVFADC ingest (``ivfpq_write_index`` must have built
    the index — centroids AND codebooks are frozen there; stream
    batches quantize with them, never retrain). Returns the
    StreamingQuery."""
    def process(batch_df, batch_id: int) -> None:
        ivfpq_ingest_batch(batch_df, batch_id, index_path=index_path,
                           out_path=out_path, k=k, nprobe=nprobe,
                           id_col=id_col, vec_col=vec_col)

    writer = (embeddings.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
