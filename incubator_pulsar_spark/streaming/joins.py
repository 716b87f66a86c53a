"""Watermarked stream-stream join: the click-attribution shape.

The reference's data plane has no stream-stream join (consumers join
streams application-side); Structured Streaming has it natively, and
the ONLY scale-safe form is the one this wrapper enforces: both sides
watermarked AND an event-time range bound in the join condition. Those
two together are what let Spark evict buffered rows — a stream-stream
join without them accumulates state forever (the join works in a demo
and dies in production week two).

``attribute_stream`` joins a trigger stream (views/impressions) with a
response stream (clicks/conversions) per key, keeping responses that
land inside ``(trigger_ts, trigger_ts + max_delay]``. State per key is
bounded by watermark + max_delay: a view older than
watermark + max_delay can never match a future click and is dropped.

Batch parity: on finite inputs the streamed result equals the same
join expressed in batch (pytest-proven through availableNow) — the
wrapper adds semantics, not new algebra, which is exactly why it
composes with checkpoint/replay like every built-in operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_stream(
    triggers: DataFrame,
    responses: DataFrame,
    *,
    key_col: str,
    trigger_ts: str,
    response_ts: str,
    max_delay_seconds: int = 3600,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join each response to the trigger(s) it answers within
    ``max_delay_seconds``. Column names must be disjoint apart from
    ``key_col`` (rename upstream). ``how='leftOuter'`` emits unmatched
    TRIGGERS with null response columns once the watermark passes —
    the "view that never converted" row, only correct to emit when no
    late click can still arrive. ``how='rightOuter'`` is the mirror:
    unmatched RESPONSES (a click with no prior view — broken tracking)
    emit null-padded once no matching trigger can still arrive.
    ``how='fullOuter'`` emits both kinds of unmatched rows; its output
    ``key_col`` is the coalesce of the two sides (whichever side is
    present carries the key).

    Outer-null timing (all three outer modes): "no match arrived" is
    only decidable once the GLOBAL watermark — the MIN across BOTH
    input streams (default multipleWatermarkPolicy) — passes the row's
    join window, so null-padded rows emit a batch after both streams'
    event time has moved on. A match arriving later than that (more
    than watermark + max_delay behind the stream head) is dropped by
    watermark eviction; its partner has already been finalized as
    unmatched — the documented at-most-once contract for late data,
    identical to every watermarked operator."""
    if max_delay_seconds <= 0:
        raise ValueError("max_delay_seconds must be positive")
    if how not in ("inner", "leftOuter", "rightOuter", "fullOuter"):
        raise ValueError(
            "how must be 'inner', 'leftOuter', 'rightOuter' or 'fullOuter'")
    t = triggers.withWatermark(trigger_ts, watermark)
    r = responses.withWatermark(response_ts, watermark)
    cond = (
        (t[key_col] == r[key_col])
        & (r[response_ts] > t[trigger_ts])
        & (r[response_ts]
           <= t[trigger_ts] + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS"))
    )
    joined = t.join(r, cond, how)
    if how == "fullOuter":
        # either side may be null-padded: surface ONE key column
        return (joined
                .withColumn("_k", F.coalesce(t[key_col], r[key_col]))
                .drop(t[key_col]).drop(r[key_col])
                .withColumnRenamed("_k", key_col))
    # keep the side of the join that is never null-padded: the trigger
    # key for inner/leftOuter, the response key for rightOuter (orphan
    # responses have every trigger column null)
    return (joined.drop(t[key_col]) if how == "rightOuter"
            else joined.drop(r[key_col]))
