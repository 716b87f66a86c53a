"""Streaming TableView: continuously-updated latest-value-per-key map.

Reference: ``TableView.java:28-105`` — a client-side reader tails the
topic and maintains key → latest value; a null value removes the key
(``TableViewImpl.java:206,237-239``).

Spark-first: a streaming aggregation ``groupBy(key).agg(max_by(row,
sequence))`` in *update* mode. The state store holds exactly one row per
key (the winner), which is the same memory profile as the reference's
ConcurrentHashMap, but checkpointed and shardable across executors —
per-key state shuffles by key hash, so a 100 TB key space spreads over
the cluster instead of one client heap.

Tombstones: a null ``value`` means "remove". The winning row per key may
be a tombstone; readers filter them. We keep tombstones IN the streaming
state (they must suppress earlier values) and filter at read time —
identical to the reference, which deletes the map entry on null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def table_view_updates(
    stream: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
    sequence_col: str = "sequence",
) -> DataFrame:
    """Per-key latest row as a streaming aggregation (update mode).

    One stateful hash aggregation: state = one (value, sequence) struct
    per key. No sort anywhere — ``max_by`` keeps the running winner.
    """
    winner = F.max_by(F.struct(F.col(value_col).alias("value"),
                               F.col(sequence_col).alias("sequence")),
                      F.col(sequence_col))
    return (
        stream.groupBy(F.col(key_col).alias("key"))
        .agg(winner.alias("_w"))
        .select("key", F.col("_w.value").alias("value"),
                F.col("_w.sequence").alias("sequence"))
    )


def start_table_view(
    stream: DataFrame,
    *,
    name: str,
    checkpoint: str,
    key_col: str = "key",
    value_col: str = "value",
    sequence_col: str = "sequence",
    drop_tombstones: bool = True,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Materialize the view into an in-memory queryable table (the
    ``TableView.entrySet``/``get`` read surface).

    ``complete`` output keeps the whole map queryable via
    ``spark.sql(f"SELECT * FROM {name}")`` — the exact TableView read
    API. For production-size key spaces sink to Delta/parquet with
    foreachBatch MERGE instead; memory sink is the test/dev surface.
    """
    view = table_view_updates(stream, key_col=key_col, value_col=value_col,
                              sequence_col=sequence_col)
    if drop_tombstones:
        view = view.filter(F.col("value").isNotNull())
    w = (
        view.writeStream.queryName(name)
        .outputMode("complete")
        .format("memory")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def start_table_view_listener(
    stream: DataFrame,
    listener,
    *,
    checkpoint: str,
    key_col: str = "key",
    value_col: str = "value",
    sequence_col: str = "sequence",
    trigger_available_now: bool = False,
    mode: str = "driver",
) -> StreamingQuery:
    """``TableView.listen``/``forEach`` (TableView.java:89,97): invoke
    ``listener(key, value)`` for every key whose value CHANGED in the
    micro-batch. A tombstone is delivered as ``value=None`` — the
    removal notification (TableViewImpl.java:237-239 fires listeners on
    remove too).

    Update-mode aggregation means each micro-batch's output is exactly
    the changed keys — the listen contract. Two delivery modes:

    - ``mode="driver"`` (default): per-batch ``collect`` then local
      callbacks — the reference's own shape (its TableView is a
      client-side map fed by one reader thread), correct for
      control-topic-sized views. The bound is explicit: every changed
      row of every micro-batch is copied to the driver, so a hot
      million-key topic makes each trigger a driver-sized transfer.
    - ``mode="partitions"``: ``foreachPartition`` delivery — the
      listener is pickled to the EXECUTORS and runs against each
      partition's rows where they already live; nothing is
      materialized on the driver. Required for large/hot key spaces;
      the listener must be serializable and side-effect through
      shared storage or a service, not driver state.
    """
    if mode not in ("driver", "partitions"):
        raise ValueError(f"mode must be 'driver' or 'partitions': {mode!r}")
    view = table_view_updates(stream, key_col=key_col, value_col=value_col,
                              sequence_col=sequence_col)

    if mode == "driver":
        def deliver(batch: DataFrame, batch_id: int) -> None:
            for r in batch.collect():
                listener(r["key"], r["value"])
    else:
        def deliver(batch: DataFrame, batch_id: int) -> None:
            def run(rows) -> None:
                for r in rows:
                    listener(r["key"], r["value"])
            batch.foreachPartition(run)

    w = (
        view.writeStream.outputMode("update")
        .foreachBatch(deliver)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
