"""Subscription semantics: modes, seek, batch-receive, ack cursors.

Reference:
- ``SubscriptionType.java:33-61``: Exclusive / Shared / Failover /
  Key_Shared.
- ``Consumer.seek`` (Consumer.java:513-544) by MessageId / timestamp /
  function; broker ``PersistentMessageFinder.findMessages:63``.
- ``BatchReceivePolicy.java:66-69``: maxNumMessages / maxNumBytes /
  timeout.
- ``MessageAcknowledger.java:55-92``: individual / cumulative / list.

Spark-first mapping:
- Exclusive/Failover → one streaming query per subscription (the
  checkpoint is the cursor; failover is query restart — same contract).
- Shared → unordered competing consumers == Spark tasks over the same
  source; no user-visible operator needed.
- Key_Shared → operators/routing.key_shared (shuffle by key + in-
  partition order).
- seek → a filter on (sequence | publish_time) that parquet min/max
  stats prune to the relevant files (the reference binary-searches
  ledger boundaries for the same effect).
- ack → cursor advance; individual-ack holes have no Spark analogue
  (SURVEY §7): the model is cumulative cursor + replay, asserted as
  at-least-once + idempotent sink = effectively-once.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SubscriptionType(Enum):
    """SubscriptionType.java:33-61."""
    EXCLUSIVE = "Exclusive"
    SHARED = "Shared"
    FAILOVER = "Failover"
    KEY_SHARED = "Key_Shared"


def seek_sequence(df: DataFrame, sequence: int, *,
                  sequence_col: str = "sequence", inclusive: bool = True) -> DataFrame:
    """Reader.seek(MessageId): resume from a position. Parquet min/max
    stats on the sequence column prune files below the seek point."""
    c = F.col(sequence_col)
    return df.filter(c >= sequence if inclusive else c > sequence)


def seek_timestamp(df: DataFrame, ts, *, publish_time_col: str = "publish_time") -> DataFrame:
    """Reader.seek(timestamp) (PersistentMessageFinder.findMessages).

    On a date-partitioned topic (``write_topic(partition_by_date=True)``)
    the implied ``publish_date >= date(ts)`` bound is added too — Spark
    cannot infer it from the row filter, and it is what turns the seek
    into directory pruning (PartitionFilters) instead of a full scan:
    the storage analogue of the reference's ledger-boundary search.
    """
    out = df.filter(F.col(publish_time_col) >= ts)
    if "publish_date" in df.columns:
        out = out.filter(F.col("publish_date") >= F.to_date(F.lit(ts)))
    return out


def seek_by(df: DataFrame, resolver, *, topic_col: str = "topic",
            sequence_col: str = "sequence",
            publish_time_col: str = "publish_time") -> DataFrame:
    """Consumer.seek(Function<String, Object>) (Consumer.java:544): the
    resolver maps each topic name to its own seek position — an ``int``
    (sequence / MessageId position), a ``datetime`` (seek-by-time), or
    ``None`` (leave that topic unseeked). Used to reposition a
    multi-topic consumer per topic in one call.

    The topic list is collected driver-side — topics are control-plane
    metadata (a handful of names), never data rows. The per-topic
    positions broadcast-join back onto the stream, so the data path is
    one map-side filter that parquet min/max stats can prune on.
    """
    import datetime as _dt

    spark = df.sparkSession
    # NULL-topic rows pass through the left join unseeked; a None here
    # would make sorted() raise and resolver(None) is not a topic.
    topics = [r[0] for r in df.select(topic_col).distinct().collect()
              if r[0] is not None]
    rows = []
    for t in sorted(topics):
        pos = resolver(t)
        seq, ts = None, None
        if pos is None:
            pass
        elif isinstance(pos, _dt.datetime):
            ts = pos
        elif isinstance(pos, int):
            seq = pos
        else:
            raise TypeError(f"seek position for {t!r} must be int | datetime "
                            f"| None, got {type(pos).__name__}")
        rows.append((t, seq, ts))
    pos_df = spark.createDataFrame(
        rows, f"{topic_col} string, _seek_seq long, _seek_ts timestamp")
    keep = ((F.col("_seek_seq").isNull()
             | (F.col(sequence_col) >= F.col("_seek_seq")))
            & (F.col("_seek_ts").isNull()
               | (F.col(publish_time_col) >= F.col("_seek_ts"))))
    return (df.join(F.broadcast(pos_df), on=topic_col, how="left")
            .filter(keep).drop("_seek_seq", "_seek_ts"))


def elect_active_consumer(consumers: list[tuple[str, int]]) -> str:
    """Failover active-consumer election for partitioned topics
    (ConsumerBuilder.priorityLevel javadoc): highest priority wins
    (LOWEST level number), ties broken by lexicographic consumer name.
    """
    if not consumers:
        raise ValueError("no consumers connected")
    return min(consumers, key=lambda c: (c[1], c[0]))[0]


def priority_dispatch_order(consumers: list[tuple[str, int, int]]) -> list[str]:
    """Shared-subscription dispatch order under priority levels
    (ConsumerBuilder.priorityLevel javadoc example): the broker
    round-robins one permit at a time across the highest-priority
    consumers with permits remaining, then falls to the next level —
    e.g. C1(p0,2) C2(p0,1) C3(p0,1) C4(p1,2) C5(p1,1) dispatches as
    C1 C2 C3 C1 C4 C5 C4.

    ``consumers`` is [(name, priority_level, permits)]; returns the full
    dispatch sequence until all permits drain. Control-plane helper (a
    handful of consumers) — the data path equivalent is the Spark
    scheduler, which this models for parity tests and routing tables.
    """
    order: list[str] = []
    remaining = {name: permits for name, _, permits in consumers}
    by_level: dict[int, list[str]] = {}
    for name, level, _ in consumers:
        by_level.setdefault(level, []).append(name)
    for level in sorted(by_level):
        names = by_level[level]
        while any(remaining[n] > 0 for n in names):
            for n in names:
                if remaining[n] > 0:
                    order.append(n)
                    remaining[n] -= 1
    return order


def assign_partitions_by_priority(
    partitions: list[int], consumers: list[tuple[str, int]],
) -> dict[int, str]:
    """Partitioned-topic failover assignment: partitions spread evenly
    (round-robin) over the HIGHEST-priority consumer group only, names
    sorted lexicographically (ConsumerBuilder.priorityLevel javadoc)."""
    if not consumers:
        raise ValueError("no consumers connected")
    top = min(level for _, level in consumers)
    names = sorted(n for n, level in consumers if level == top)
    return {p: names[i % len(names)] for i, p in enumerate(sorted(partitions))}


def batch_receive(df: DataFrame, *, max_messages: int | None = None,
                  max_bytes: int | None = None, value_col: str = "value",
                  sequence_col: str = "sequence") -> DataFrame:
    """BatchReceivePolicy: cap one receive() batch by message count
    and/or cumulative payload bytes, in publish order.

    Batch form of the consumer's receiver queue drain. The byte cap is a
    running sum over publish order — window function, single partition
    of the already-small candidate batch (receive batches are bounded by
    construction; this is not a full-table operator).
    """
    from pyspark.sql import Window

    out = df
    w = Window.orderBy(F.col(sequence_col)).rowsBetween(Window.unboundedPreceding, 0)
    if max_bytes is not None:
        out = out.withColumn("_cum_bytes",
                             F.sum(F.length(F.col(value_col).cast("binary"))).over(w))
        out = out.filter(F.col("_cum_bytes") <= max_bytes).drop("_cum_bytes")
    if max_messages is not None:
        out = out.withColumn("_rn", F.row_number().over(w))
        out = out.filter(F.col("_rn") <= max_messages).drop("_rn")
    return out


@dataclass
class SubscriptionCursor:
    """Cumulative-ack cursor over a topic partition set.

    ``mark_delete`` position per partition: everything ≤ it is acked
    (MessageAcknowledger cumulative ack). Individual acks are recorded
    but only compact into the cursor when contiguous — mirroring the
    broker's ack-hole tracking, with the simplification that unacked
    holes are replayed (at-least-once; see module docstring).
    """

    mark_delete: dict[int, int]

    @classmethod
    def fresh(cls) -> "SubscriptionCursor":
        return cls(mark_delete={})

    def ack_cumulative(self, partition: int, sequence: int) -> None:
        cur = self.mark_delete.get(partition, -1)
        self.mark_delete[partition] = max(cur, sequence)

    def unacked(self, df: DataFrame, *, partition_col: str = "partition",
                sequence_col: str = "sequence") -> DataFrame:
        """Backlog: rows past the cursor (what redelivery would replay)."""
        if not self.mark_delete:
            return df
        cond = None
        for part, seq in self.mark_delete.items():
            c = (F.col(partition_col) == part) & (F.col(sequence_col) <= seq)
            cond = c if cond is None else (cond | c)
        return df.filter(~cond)

    def backlog_count(self, df: DataFrame, **kw) -> int:
        return self.unacked(df, **kw).count()


def subscription_backlog(
    msgs: DataFrame, cursors: DataFrame, *, ts_col: str = "publish_time",
) -> DataFrame:
    """Admin-API backlog stats per subscription (the
    ``SubscriptionStatsImpl.msgBacklog`` / ``getEarliestMsgPublishTimeOfOldestBacklog``
    surface of the reference's PersistentSubscription): given a cursor
    table (subscription, ack_through) — the time-based
    markDeletePosition — report how much each subscription is behind.

    Scale shape: the cursor table is operator-config-sized and
    broadcasts; backlog classification is a scan-side predicate per
    subscription and one keyed agg — computing lag over a 100 TB topic
    is one scan regardless of subscription count. Subscriptions with an
    empty backlog still emit a row (n_backlog = 0).

    Output: subscription, n_backlog, oldest_unacked (string),
    newest_unacked (string), backlog_hours (span of the pending
    window, integer-microsecond arithmetic).
    """
    pending = (
        msgs.crossJoin(F.broadcast(cursors))
        .filter(F.col(ts_col) > F.col("ack_through"))
    )
    span_us = (F.unix_micros(F.max(ts_col).cast("timestamp"))
               - F.unix_micros(F.min(ts_col).cast("timestamp")))
    agg = pending.groupBy("subscription").agg(
        F.count(F.lit(1)).cast("long").alias("n_backlog"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss")
        .alias("oldest_unacked"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss")
        .alias("newest_unacked"),
        F.round(span_us.cast("double") / 3600000000.0, 6)
        .alias("backlog_hours"),
    )
    return (
        cursors.select("subscription").join(agg, "subscription", "left")
        .select("subscription",
                F.coalesce(F.col("n_backlog"), F.lit(0)).cast("long")
                .alias("n_backlog"),
                "oldest_unacked", "newest_unacked",
                F.coalesce(F.col("backlog_hours"), F.lit(0.0))
                .alias("backlog_hours"))
    )
