"""Streaming retry/DLQ router + geo-replication (foreachBatch sinks).

Reference:
- reconsumeLater / DeadLetterPolicy routing (``RetryMessageUtil.java:
  23-40``, ``DeadLetterPolicy.java:46-64``) — see operators/retry.py for
  the batch split semantics reused here.
- Geo-replication (``GeoPersistentReplicator.java:84`` replicateEntries):
  every persisted entry is asynchronously re-published to remote
  clusters. Spark-first: one source, N sinks — the replicator is just a
  second writeStream (or one foreachBatch writing N destinations with
  the same batchId for idempotent replay).

Exactly-once posture: foreachBatch + overwrite-by-batchId gives
idempotent sinks, so checkpoint replay after failure re-writes the same
files — effectively-once end-to-end (the strongest of the reference's
three guarantees, ``FunctionConfig.processingGuarantees``).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.retry import route_failures


def start_retry_router(
    stream: DataFrame,
    failed: Column,
    *,
    base_path: str,
    checkpoint: str,
    subscription: str = "sub",
    max_redeliver_count: int = 16,
    delay_seconds: int = 60,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Route each micro-batch into ok/ -RETRY / -DLQ parquet topics.

    Idempotent: every output partition directory is keyed by batch_id, so
    a replayed batch overwrites itself instead of duplicating
    (exactly-once to the sink).
    """

    def route(batch: DataFrame, batch_id: int) -> None:
        routed = route_failures(
            batch, failed, subscription=subscription,
            max_redeliver_count=max_redeliver_count,
            delay_seconds=delay_seconds,
        )
        for name, df in (("ok", routed.ok), ("retry", routed.retry),
                         ("dlq", routed.dlq)):
            (df.write.mode("overwrite")
             .parquet(os.path.join(base_path, name, f"batch_id={batch_id}")))

    w = (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def geo_replicate(
    stream: DataFrame,
    *,
    cluster_paths: dict[str, str],
    checkpoint_root: str,
    trigger_available_now: bool = False,
) -> dict[str, StreamingQuery]:
    """Replicate one topic stream to N remote "clusters" (paths/buckets).

    Independent queries per destination — one slow/partitioned remote
    never blocks the others, matching the reference's per-remote-cluster
    replicator with its own cursor. Each query has its own checkpoint
    (its own replication cursor).
    """
    out = {}
    for cluster, path in cluster_paths.items():
        w = (
            stream.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", os.path.join(checkpoint_root, cluster))
            .outputMode("append")
        )
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        out[cluster] = w.start()
    return out
