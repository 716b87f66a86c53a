"""Streaming as-of enrichment: join a live event stream against the
most recent state of a topic, point-in-time correct per event.

Reference analogue: a Pulsar consumer that keeps a TableView of a state
topic (``TableViewImpl.java:206-239`` — key → latest value) and enriches
each incoming message with the state AS OF the message's event time.
The batch form (``operators.asof.asof_join``) gives exact per-event
semantics; this continuous form runs it per micro-batch under
``foreachBatch``.

Semantics per micro-batch N:

    left rows of batch N  ⟕asof  ALL right rows published so far

i.e. an event is matched against every state row with
``state.ts <= event.ts`` that had been WRITTEN to the right topic by
the time batch N fires — the same visibility a TableView consumer has
(state published after the event is processed is not seen, even if its
event time is earlier). That trade-off is inherent to any streaming
point-in-time join and is the reference's too: a TableView lags the
state topic's tail.

Scale: the right topic is re-read per batch, but the read is a parquet
scan with column pruning + the asof union shuffle keyed like every
other keyed stage. For a slowly-changing state topic (the normal case)
the right side is compact — and a compaction pass
(``operators.compaction.compact``) can bound it to one row per key
whenever "latest value per key" rather than full history is enough.
Output lands under batch_id directories with overwrite, so micro-batch
replay rewrites instead of duplicating (same pattern as
``streaming/late.py``).
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

from ..operators.asof import asof_join


def enrich_batch(
    batch: DataFrame, batch_id: int, *, right_topic_path: str, out_path: str,
    on: str, left_ts: str, right_ts: str, how: str = "left",
    tie_col: str | None = None, suffix: str = "",
) -> None:
    """Enrich one left micro-batch; usable directly under foreachBatch."""
    spark: SparkSession = batch.sparkSession
    try:
        right = spark.read.parquet(right_topic_path)
    except AnalysisException as e:
        # an absent state topic would make the output schema flap between
        # batches (no payload columns to carry) — require it up front
        raise ValueError(
            f"right topic {right_topic_path!r} must exist before the as-of "
            "enrichment starts (write it, or seed an empty topic with the "
            "state schema)") from e
    out = asof_join(batch, right, on=on, left_ts=left_ts,
                    right_ts=right_ts, how=how, tie_col=tie_col,
                    suffix=suffix)
    out.write.mode("overwrite").parquet(
        os.path.join(out_path, f"batch_id={batch_id}"))


def start_asof_enrich(
    left_stream: DataFrame, *, right_topic_path: str, out_path: str,
    checkpoint_path: str, on: str, left_ts: str, right_ts: str,
    how: str = "left", tie_col: str | None = None, suffix: str = "",
    available_now: bool = False,
):
    """Start the continuous as-of enrichment (returns StreamingQuery)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        enrich_batch(
            batch, batch_id, right_topic_path=right_topic_path,
            out_path=out_path, on=on, left_ts=left_ts, right_ts=right_ts,
            how=how, tie_col=tie_col, suffix=suffix,
        )

    writer = (left_stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
