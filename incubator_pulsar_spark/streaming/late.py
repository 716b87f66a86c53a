"""Streaming late-data side output (the lateDataTopic route).

Reference: ``WindowFunctionExecutor.java:296-308`` — an event whose
timestamp is ≤ the watermark in force when it ARRIVES is not windowed;
it is published to ``WindowConfig.lateDataTopic`` (or dropped with a
log). The watermark is max-seen-ts − maxLag, re-emitted every
``watermarkEmitIntervalMs`` (``WaterMarkEventGenerator.java:84-122``).

Spark's built-in ``withWatermark`` silently DROPS late rows — there is
no per-row late flag — so the side output needs a custom route.
Spark-first continuous form: a ``foreachBatch`` router that persists the
high-water mark (max event time seen by all previous batches) in a
1-row parquet state table. Each micro-batch:

    watermark = persisted_max − max_lag        (undefined on batch 0)
    late      = rows with ts ≤ watermark       → late sink
    on-time   = the rest                       → main sink
    persisted_max = max(persisted_max, batch max)

The watermark advances BETWEEN batches, exactly like the reference's
periodic watermark emission — the trigger interval plays the role of
``watermarkEmitIntervalMs``. Within a batch no row is late relative to
another row of the same batch (same semantics: events between watermark
emissions are judged against the last emitted watermark).

Scale: per batch the state read/write is one tiny file; the data path is
two predicate filters + writes — no shuffle, no collect of data rows.
Idempotent under micro-batch replay TWO ways (both needed): routed
output lands under ``batch_id=N`` directories with mode('overwrite') so
a batch replayed after a crash-between-write-and-state-commit REWRITES
its own files instead of appending duplicates; and the state table
records the last fully-routed batch_id so an already-committed batch is
not re-routed against a watermark that has since advanced.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_state(spark: SparkSession, state_path: str):
    """(max_ts, last_batch_id) or (None, -1) before the first batch.

    Only a MISSING state path means "first batch"; any other read error
    (corrupt file, transient FS failure) must propagate — swallowing it
    would silently reset the watermark and re-route committed batches.
    """
    try:
        rows = spark.read.parquet(state_path).collect()
    except AnalysisException:
        return None, -1
    if not rows:
        return None, -1
    r = rows[0]
    return r["max_ts"], r["last_batch_id"]


def route_late_batch(
    batch: DataFrame, batch_id: int, *, ts_col: str, max_lag: str,
    on_time_path: str, late_path: str, state_path: str,
) -> None:
    """Route one micro-batch; usable directly under ``foreachBatch``."""
    spark = batch.sparkSession
    max_ts, last_batch = _read_state(spark, state_path)
    if batch_id <= last_batch:  # replayed batch — already routed
        return
    lag = F.expr(f"INTERVAL {max_lag}")
    if max_ts is None:
        on_time = batch
        late = batch.limit(0)
    else:
        wm = F.lit(max_ts) - lag
        is_late = F.col(ts_col).isNotNull() & (F.col(ts_col) <= wm)
        late = batch.filter(is_late)
        on_time = batch.filter(~is_late | F.col(ts_col).isNull())
    # overwrite-by-batchId: replay after a crash between these writes and
    # the state commit below rewrites the same directories (no dup rows)
    on_time.write.mode("overwrite").parquet(
        os.path.join(on_time_path, f"batch_id={batch_id}"))
    late.write.mode("overwrite").parquet(
        os.path.join(late_path, f"batch_id={batch_id}"))
    new_max_row = batch.agg(F.max(ts_col).alias("m")).collect()[0]
    new_max = new_max_row["m"]
    if max_ts is not None and (new_max is None or new_max < max_ts):
        new_max = max_ts
    tmp = state_path + "_tmp"
    spark.createDataFrame(
        [(new_max, batch_id)], "max_ts timestamp, last_batch_id long"
    ).coalesce(1).write.mode("overwrite").parquet(tmp)
    # atomic-enough swap: state is 1 row; readers see old or new, never half
    spark.read.parquet(tmp).coalesce(1).write.mode("overwrite").parquet(state_path)


def route_late_stream(
    stream: DataFrame, *, ts_col: str = "event_time", max_lag: str = "10 minutes",
    on_time_path: str, late_path: str, checkpoint_path: str, state_path: str,
    available_now: bool = False,
):
    """Start the router as a streaming query (returns StreamingQuery)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        route_late_batch(
            batch, batch_id, ts_col=ts_col, max_lag=max_lag,
            on_time_path=on_time_path, late_path=late_path,
            state_path=state_path,
        )

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
