"""Delayed delivery (deliver_at_time).

Reference: producer sets ``deliverAt``/``deliverAfter``
(``TypedMessageBuilder.java:199,214``; proto ``deliver_at_time``
PulsarApi.proto:143); per-subscription tracker withholds entries until
due — priority queue of (ledger, entry, deliverAt)
(``InMemoryDelayedDeliveryTracker.java:42,117,170``), bucketed/persistent
variant under ``broker/delayed/bucket/``; the dispatcher consults the
tracker before dispatch (``PersistentDispatcherMultipleConsumers.java:448``).

Spark-first batch form: delivery at time T is a filter
``deliver_at <= T`` (null deliver_at ⇒ immediate). The streaming form
(streaming/delay_stream.py) carries not-yet-due rows in state and
re-emits on timer — release granularity is the trigger interval, a
documented semantic difference (the reference's tick is also coarse:
``tickTimeMillis``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def due_messages(df: DataFrame, as_of: Column | str, *,
                 deliver_at_col: str = "deliver_at") -> DataFrame:
    """Messages deliverable at ``as_of``: deliver_at is null or has passed.

    InMemoryDelayedDeliveryTracker.getScheduledMessages — pops entries
    with deliverAt <= now.
    """
    t = as_of if isinstance(as_of, Column) else F.lit(as_of).cast("timestamp")
    c = F.col(deliver_at_col)
    return df.filter(c.isNull() | (c <= t))


def withheld_messages(df: DataFrame, as_of: Column | str, *,
                      deliver_at_col: str = "deliver_at") -> DataFrame:
    """Complement of due_messages: still sitting in the delay tracker."""
    t = as_of if isinstance(as_of, Column) else F.lit(as_of).cast("timestamp")
    c = F.col(deliver_at_col)
    return df.filter(c.isNotNull() & (c > t))


def with_deliver_after(df: DataFrame, delay_seconds: Column, *,
                       publish_time_col: str = "publish_time") -> DataFrame:
    """TypedMessageBuilder.deliverAfter: deliver_at = publish_time + delay."""
    return df.withColumn(
        "deliver_at",
        F.col(publish_time_col)
        + F.make_interval(secs=delay_seconds.cast("double")),
    )
