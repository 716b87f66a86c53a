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


def _set_props(existing: Column, new_map: Column) -> Column:
    """Overwrite-merge properties: keys being set replace any existing
    value (a message on its Nth retry hop already carries RECONSUMETIMES;
    map_concat alone would crash on the duplicate key)."""
    cleaned = F.map_filter(
        F.coalesce(existing, F.create_map().cast("map<string,string>")),
        lambda k, _: ~k.isin(PROP_RECONSUME_TIMES, PROP_DELAY_TIME,
                             PROP_REAL_TOPIC, PROP_ORIGIN_MESSAGE_ID),
    )
    return F.map_concat(cleaned, new_map)


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
    publish_time_col: str = "publish_time",
) -> RoutedBatch:
    """Split one processed batch into ok / retry / DLQ streams.

    Failed rows with redelivery_count < max go to the retry topic with
    the counter bumped and deliver_at pushed out (reconsumeLater);
    at/over the cap they land in the DLQ with provenance properties
    (DeadLetterPolicy.java:46-64).
    """
    rc = F.col(redelivery_count_col)
    ok = df.filter(~failed)
    retriable = df.filter(failed & (rc < F.lit(max_redeliver_count)))
    exhausted = df.filter(failed & (rc >= F.lit(max_redeliver_count)))

    retry = (
        retriable.withColumn(redelivery_count_col, (rc + 1).cast("int"))
        .withColumn(
            "deliver_at",
            F.col(publish_time_col) + F.make_interval(secs=F.lit(delay_seconds) * (rc + 1)),
        )
        .withColumn(
            "properties",
            _set_props(
                F.col("properties"),
                F.create_map(
                    F.lit(PROP_RECONSUME_TIMES), (rc + 1).cast("string"),
                    F.lit(PROP_REAL_TOPIC), F.col(topic_col),
                ),
            ),
        )
        .withColumn(topic_col, F.concat(F.col(topic_col), F.lit(f"-{subscription}{RETRY_SUFFIX}")))
    )
    dlq = (
        exhausted.withColumn(
            "properties",
            _set_props(
                F.col("properties"),
                F.create_map(
                    F.lit(PROP_REAL_TOPIC), F.col(topic_col),
                    F.lit(PROP_ORIGIN_MESSAGE_ID), F.col("sequence").cast("string"),
                ),
            ),
        )
        .withColumn(topic_col, F.concat(F.col(topic_col), F.lit(f"-{subscription}{DLQ_SUFFIX}")))
    )
    return RoutedBatch(ok=ok, retry=retry, dlq=dlq)


def nack_backoff_seconds(redelivery_count: Column, *, base: float = 1.0,
                         multiplier: float = 2.0, max_seconds: float = 600.0) -> Column:
    """Exponential redelivery backoff (MultiplierRedeliveryBackoff semantics)."""
    return F.least(
        F.lit(base) * F.pow(F.lit(multiplier), redelivery_count.cast("double")),
        F.lit(max_seconds),
    )
