"""Streaming delayed delivery: withhold messages until ``deliver_at``.

Reference: ``broker/delayed/InMemoryDelayedDeliveryTracker.java:42,117,
170`` — the dispatcher checks a (deliverAt → position) priority queue and
withholds entries whose time hasn't come; a timer re-checks. The bucketed
variant (``broker/delayed/bucket/*``) spills the index to a ledger.

Spark-first: ``applyInPandasWithState`` with a processing-time timeout.
State per key = the pending rows (deliver_at still in the future). Each
invocation — new data OR timer — releases everything due, keeps the
rest, and re-arms the timeout for the earliest pending deliver_at. The
state store is the "bucket" (RocksDB-backed spill for free).

REPLAY DETERMINISM (the r10 full-suite run caught this live): "now"
must be the BATCH PROCESSING TIMESTAMP
(``GroupState.getCurrentProcessingTimeMs()``), never a per-invocation
wall clock. The batch timestamp is persisted in the offset log, so a
crash-REPLAYED batch re-evaluates with the ORIGINAL timestamp and
re-emits byte-identical output — an exactly-once sink that already
committed that batch skips it harmlessly. With a wall clock, the
replay runs later, rows that were "pending" in the original execution
come due inside the replayed batch, the sink DROPS the re-emitted
batch as already committed, and those releases are lost permanently
(observed: file sink committed batch N, checkpoint commit for N
missing after stop(), restart replayed N with an advanced clock →
20k rows released into a skipped batch, stream idle forever at 0
releases). The same discipline the reference's dispatcher gets from
re-reading the ledger — and that the tws variant already had via
``timerValues.getCurrentProcessingTimeInMs()``.

Release granularity is the micro-batch trigger interval, not
milliseconds — documented semantics difference (SURVEY §7 watch list).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def delayed_delivery_stream(
    stream: DataFrame,
    *,
    key_col: str = "key",
    sequence_col: str = "sequence",
    deliver_at_col: str = "deliver_at",
    now_fn=None,
) -> DataFrame:
    """Emit rows once ``deliver_at`` ≤ processing time; buffer the rest.

    Output: (key, sequence, deliver_at, released_at). ``now_fn`` is
    injectable for deterministic tests; by default "now" is the BATCH
    processing timestamp (replay-stable — see module header). A
    one-argument ``now_fn(batch_ts_ms)`` is the replay-safe injectable
    form: as long as it is a pure function of the batch timestamp, a
    replayed batch computes the same virtual time. A zero-argument
    ``now_fn()`` is accepted for convenience but makes REPLAYED output
    depend on when the replay runs — test-only."""
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("sequence", T.LongType()),
        T.StructField("deliver_at", T.TimestampType()),
        T.StructField("released_at", T.TimestampType()),
    ])
    state_schema = T.StructType([
        T.StructField("pending_seq", T.ArrayType(T.LongType())),
        T.StructField("pending_at", T.ArrayType(T.TimestampType())),
    ])
    import inspect as _inspect

    clock_takes_ts = (now_fn is not None and
                      len(_inspect.signature(now_fn).parameters) >= 1)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        pend_seq, pend_at = ([], [])
        if state.exists:
            s = state.get
            pend_seq = list(s[0] or [])
            pend_at = [pd.Timestamp(t) for t in (s[1] or [])]
        for pdf in pdfs:
            for seq, at in zip(pdf[sequence_col], pdf[deliver_at_col]):
                pend_seq.append(int(seq))
                pend_at.append(pd.Timestamp(at))
        # priority-queue order, like the reference tracker: earliest
        # deliver_at first, sequence as the deterministic tiebreak
        # (InMemoryDelayedDeliveryTracker's queue is keyed on deliverAt)
        if pend_seq:
            pairs = sorted(zip(pend_seq, pend_at), key=lambda p: (p[1], p[0]))
            pend_seq, pend_at = [list(t) for t in zip(*pairs)]

        # "now" = batch processing timestamp (replay-stable; module
        # header) unless a test injects its own mapping
        batch_ts_ms = state.getCurrentProcessingTimeMs()
        if now_fn is None:
            raw_now = _dt.datetime.fromtimestamp(batch_ts_ms / 1000.0,
                                                 _dt.timezone.utc)
        elif clock_takes_ts:
            raw_now = now_fn(batch_ts_ms)
        else:
            raw_now = now_fn()
        now = pd.Timestamp(raw_now)
        if now.tzinfo:
            now = now.tz_localize(None)
        due, keep_seq, keep_at = [], [], []
        for seq, at in zip(pend_seq, pend_at):
            at_naive = at.tz_localize(None) if at.tzinfo else at
            if at_naive <= now:
                due.append((key[0], seq, at_naive, now))
            else:
                keep_seq.append(seq)
                keep_at.append(at_naive)

        if keep_seq:
            state.update((keep_seq, keep_at))
            # re-check at the earliest pending deliver_at (min 1s)
            wait_ms = max(int((min(keep_at) - now).total_seconds() * 1000), 1000)
            state.setTimeoutDuration(wait_ms)
        elif state.exists:
            state.remove()

        if due:
            yield pd.DataFrame(due, columns=["key", "sequence", "deliver_at",
                                             "released_at"])

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(sequence_col).cast("long").alias(sequence_col),
        F.col(deliver_at_col).cast("timestamp").alias(deliver_at_col),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", "ProcessingTimeTimeout"
    )
