"""Negative-acknowledgement redelivery loop.

Reference: ``Consumer.negativeAcknowledge`` (Consumer.java:213-263) →
``NegativeAcksTracker`` — a nacked message id is recorded with a
redelivery time = now + backoff(redeliveryCount)
(``RedeliveryBackoff.java`` / MultiplierRedeliveryBackoff) and the
tracker's timer redelivers it when due; the broker's
``MessageRedeliveryController`` replays it to a consumer.

Spark-first this is pure composition, not new machinery: a nack is a
row predicate; "redeliver after backoff" is exactly the
delayed-delivery operator with ``deliver_at = processing_time +
nack_backoff_seconds(redelivery_count)``. The stateful withhold/release
(``streaming/delay.delayed_delivery_stream``) keeps per-key arrival
order for the redelivered rows — the same per-key ordering contract the
reference's tracker gives a Key_Shared consumer.

Scale: state is only the nacked rows (ids + timestamps), RocksDB-backed
spill for free; delivered rows pass through with zero state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.retry import nack_backoff_seconds
from .delay import delayed_delivery_stream


def nack_redelivery_stream(
    stream: DataFrame,
    nacked: Column,
    *,
    key_col: str = "key",
    sequence_col: str = "sequence",
    redelivery_count_col: str = "redelivery_count",
    base: float = 1.0,
    multiplier: float = 2.0,
    max_seconds: float = 600.0,
    now: Column | None = None,
    now_fn=None,
) -> tuple[DataFrame, DataFrame]:
    """Split a consumed stream into (delivered, redelivered).

    ``delivered`` — rows the consumer acked (``~nacked``), untouched.
    ``redelivered`` — nacked rows re-emitted once their exponential
    backoff elapses (NegativeAcksTracker semantics), with the
    redelivery counter bumped; per-key order preserved by the stateful
    delay operator. Feed ``redelivered`` back into the processing
    function (or into the retry/DLQ router once the counter exceeds the
    dead-letter policy).

    ``now`` is the nack timestamp base (default ``current_timestamp()``;
    pass a literal for deterministic tests), ``now_fn`` the release
    clock injected into the delay operator.
    """
    rc = F.col(redelivery_count_col)
    if now is None:
        now = F.current_timestamp()
    delivered = stream.filter(~nacked)
    backoff = nack_backoff_seconds(rc, base=base, multiplier=multiplier,
                                   max_seconds=max_seconds)
    pending = (
        stream.filter(nacked)
        .withColumn("deliver_at", now + F.make_interval(secs=backoff))
        .withColumn(redelivery_count_col, (rc + 1).cast("int"))
    )
    redelivered = delayed_delivery_stream(
        pending, key_col=key_col, sequence_col=sequence_col, now_fn=now_fn)
    return delivered, redelivered
