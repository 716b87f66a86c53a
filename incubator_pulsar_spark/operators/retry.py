"""Retry-topic / dead-letter routing and negative acknowledgement.

Reference:
- ``Consumer.reconsumeLater`` (Consumer.java:296) copies the message to
  ``<topic>-<sub>-RETRY`` with RECONSUMETIMES/DELAY_TIME properties;
  after MAX_RECONSUMETIMES (16, RetryMessageUtil.java:31) it goes to
  ``<topic>-<sub>-DLQ`` (suffixes :32-33).
- DeadLetterPolicy.java:46-64: maxRedeliverCount exceeded →
  deadLetterTopic.
- Negative ack backoff: ``NegativeAcksTracker`` + ``RedeliveryBackoff``.

Spark-first: routing failed rows is a three-way split of a DataFrame on
(succeeded, retry, dlq) predicates — no shuffle at all, three filter
branches over one scan (Spark reuses the exchange/scan under AQE). The
streaming driver loop (streaming/retry_stream.py) feeds the retry branch
back through the processing fn with exponential-backoff deliver_at.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_RECONSUME_TIMES = 16  # RetryMessageUtil.java:31
RETRY_SUFFIX = "-RETRY"   # RetryMessageUtil.java:32
DLQ_SUFFIX = "-DLQ"       # RetryMessageUtil.java:33

PROP_RECONSUME_TIMES = "RECONSUMETIMES"
PROP_DELAY_TIME = "DELAY_TIME"
PROP_REAL_TOPIC = "REAL_TOPIC"
PROP_ORIGIN_MESSAGE_ID = "ORIGIN_MESSAGE_ID"


def _set_props(existing: Column, overwrite: Column, if_absent: Column) -> Column:
    """Merge properties the way the reference does on a retry hop:

    - ``overwrite`` keys (RECONSUMETIMES/DELAY_TIME) replace any existing
      value — the counter is re-stamped every hop (map_concat alone would
      crash on the duplicate key).
    - ``if_absent`` keys (REAL_TOPIC/ORIGIN_MESSAGE_ID) follow
      ``propertiesMap.putIfAbsent`` (ConsumerImpl.java:799): provenance
      is set once on the FIRST hop and preserved forever after.
    """
    base = F.coalesce(existing, F.create_map().cast("map<string,string>"))
    cleaned = F.map_filter(
        base, lambda k, _: ~k.isin(PROP_RECONSUME_TIMES, PROP_DELAY_TIME)
    )
    absent_only = F.map_filter(
        if_absent, lambda k, _: F.isnull(F.try_element_at(base, k))
    )
    return F.map_concat(cleaned, overwrite, absent_only)


def _origin_topic(topic_col: str) -> Column:
    """The topic retry/DLQ names derive from: REAL_TOPIC provenance when
    the row already hopped through a retry topic, else the current topic
    (RetryMessageUtil.getRetryTopic derives from the ORIGINAL topic, so a
    second hop re-routes to the same '<orig>-<sub>-RETRY', never
    '<orig>-<sub>-RETRY-<sub>-RETRY')."""
    return F.coalesce(
        F.try_element_at(F.col("properties"), F.lit(PROP_REAL_TOPIC)),
        F.col(topic_col),
    )


def retry_topic_name(topic: str, subscription: str) -> str:
    return f"{topic}-{subscription}{RETRY_SUFFIX}"


def dlq_topic_name(topic: str, subscription: str) -> str:
    return f"{topic}-{subscription}{DLQ_SUFFIX}"


@dataclass
class RoutedBatch:
    ok: DataFrame
    retry: DataFrame
    dlq: DataFrame


def route_failures(
    df: DataFrame,
    failed: Column,
    *,
    subscription: str = "sub",
    max_redeliver_count: int = MAX_RECONSUME_TIMES,
    delay_seconds: int = 60,
    redelivery_count_col: str = "redelivery_count",
    topic_col: str = "topic",
    now: Column | None = None,
) -> RoutedBatch:
    """Split one processed batch into ok / retry / DLQ streams.

    Failed rows with redelivery_count < max go to the retry topic with
    the counter bumped and deliver_at pushed out (reconsumeLater);
    at/over the cap they land in the DLQ with provenance properties
    (DeadLetterPolicy.java:46-64).

    ``deliver_at`` is relative to ``now`` — processing time, matching
    reconsumeLater's now+delay scheduling — defaulting to
    ``current_timestamp()``. Pass a fixed literal for deterministic
    replays/tests. Retry/DLQ topic names derive from the ORIGINAL topic
    (REAL_TOPIC when present), so multi-hop rows re-route to the same
    '<orig>-<sub>-RETRY' and the DLQ is '<orig>-<sub>-DLQ' exactly as
    RetryMessageUtil.getRetryTopic/getDLQTopic produce.
    """
    rc = F.col(redelivery_count_col)
    if now is None:
        now = F.current_timestamp()
    ok = df.filter(~failed)
    retriable = df.filter(failed & (rc < F.lit(max_redeliver_count)))
    exhausted = df.filter(failed & (rc >= F.lit(max_redeliver_count)))
    orig = _origin_topic(topic_col)
    delay = F.lit(delay_seconds) * (rc + 1)

    retry = (
        retriable.withColumn(
            "properties",
            _set_props(
                F.col("properties"),
                F.create_map(
                    F.lit(PROP_RECONSUME_TIMES), (rc + 1).cast("string"),
                    F.lit(PROP_DELAY_TIME), (delay * 1000).cast("long").cast("string"),
                ),
                F.create_map(
                    F.lit(PROP_REAL_TOPIC), F.col(topic_col),
                    F.lit(PROP_ORIGIN_MESSAGE_ID), F.col("sequence").cast("string"),
                ),
            ),
        )
        .withColumn(topic_col, F.concat(orig, F.lit(f"-{subscription}{RETRY_SUFFIX}")))
        .withColumn("deliver_at", now + F.make_interval(secs=delay))
        .withColumn(redelivery_count_col, (rc + 1).cast("int"))
    )
    dlq = (
        exhausted.withColumn(
            "properties",
            _set_props(
                F.col("properties"),
                F.create_map().cast("map<string,string>"),
                F.create_map(
                    F.lit(PROP_REAL_TOPIC), F.col(topic_col),
                    F.lit(PROP_ORIGIN_MESSAGE_ID), F.col("sequence").cast("string"),
                ),
            ),
        )
        .withColumn(topic_col, F.concat(orig, F.lit(f"-{subscription}{DLQ_SUFFIX}")))
    )
    return RoutedBatch(ok=ok, retry=retry, dlq=dlq)


def nack_backoff_seconds(redelivery_count: Column, *, base: float = 1.0,
                         multiplier: float = 2.0, max_seconds: float = 600.0) -> Column:
    """Exponential redelivery backoff (MultiplierRedeliveryBackoff semantics)."""
    return F.least(
        F.lit(base) * F.pow(F.lit(multiplier), redelivery_count.cast("double")),
        F.lit(max_seconds),
    )
