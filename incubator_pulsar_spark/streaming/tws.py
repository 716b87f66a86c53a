"""Stateful streaming operators on the Spark 4 ``transformWithStateInPandas``
API (StatefulProcessor + typed state + real timers).

Why a second implementation next to ``applyInPandasWithState``: the older
API exposes one opaque state tuple and GroupStateTimeout; transformWithState
gives named typed state slots (ValueState/ListState/MapState) and
per-key registered timers — which is exactly the shape of the reference's
delayed-delivery tracker (``InMemoryDelayedDeliveryTracker.java:42,117,170``:
a priority queue of (position, deliver_at) plus a scheduled wake-up at the
earliest deliver_at). The old-API variants in ``streaming/windows.py`` and
``streaming/delay.py`` remain the compatibility path.

Operators:
- ``count_window_stream_tws`` — per-key tumbling count window
  (CountTriggerPolicy.java:34 / CountEvictionPolicy.java:32) with O(1)
  ValueState (running partial aggregate, not buffered rows).
- ``delayed_delivery_stream_tws`` — deliver_at-time withholding
  (PulsarApi.proto:143 ``deliver_at_time``): due rows pass through the
  batch that receives them; future rows wait in ListState with a timer
  registered at the earliest due time, released by handleExpiredTimer.

Scale notes: state is per-key in the state store (RocksDB-backed on a
real cluster — spill for free); no collect, no driver loops; timer fan-out
is per-key not per-message.

RUNTIME REQUIREMENT: the transformWithState Python worker speaks a
protobuf protocol to the JVM state server (``google.protobuf`` import at
query start). ``tws_available()`` reports whether this environment can
RUN these operators; plan construction works regardless. Where protobuf
is absent the ``applyInPandasWithState`` variants in
``streaming/windows.py`` / ``streaming/delay.py`` are the operational
path — same semantics, coarser state/timer API.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

def tws_available() -> bool:
    """True when the runtime can execute transformWithState queries
    (google.protobuf present for the worker↔state-server protocol)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


COUNT_WINDOW_OUTPUT = (
    "key string, window_id long, window_size long, sum_value double, "
    "min_seq long, max_seq long"
)


class CountWindowProcessor(StatefulProcessor):
    """Tumbling count-window pane: fires every ``count`` rows per key."""

    def __init__(self, count: int, order_col: str, value_col: str):
        self.count = count
        self.order_col = order_col
        self.value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.pane = handle.getValueState(
            "pane", "window_id long, n long, sum_value double, min_seq long, max_seq long")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        wid, n, sv, mn, mx = (self.pane.get() if self.pane.exists()
                              else (0, 0, 0.0, None, None))
        out = []
        for pdf in rows:
            pdf = pdf.sort_values(self.order_col, kind="mergesort")
            for seq, val in zip(pdf[self.order_col], pdf[self.value_col]):
                s, v = int(seq), (0.0 if pd.isna(val) else float(val))
                n += 1
                sv += v
                mn = s if mn is None else min(mn, s)
                mx = s if mx is None else max(mx, s)
                if n == self.count:
                    out.append((key[0], wid, n, sv, mn, mx))
                    wid, n, sv, mn, mx = wid + 1, 0, 0.0, None, None
        self.pane.update((wid, n, sv, mn, mx))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "window_id", "window_size",
                              "sum_value", "min_seq", "max_seq"])

    def close(self) -> None:
        pass


def count_window_stream_tws(
    stream: DataFrame, *, key_col: str = "key", order_col: str = "sequence",
    value_col: str = "value", count: int,
) -> DataFrame:
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).alias(order_col),
        F.col(value_col).alias(value_col),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        CountWindowProcessor(count, order_col, value_col),
        COUNT_WINDOW_OUTPUT, "Append", "None",
    )


DELAYED_OUTPUT = "key string, sequence long, value double, deliver_at_ms long"


class DelayedDeliveryProcessor(StatefulProcessor):
    """deliver_at withholding with per-key timers.

    handleInputRows: rows due now (deliver_at ≤ current processing time)
    pass straight through; future rows append to ListState and a timer is
    registered at the earliest pending due time (the tracker's scheduled
    wake-up). handleExpiredTimer: release everything due, keep the rest,
    re-register at the new earliest.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.pending = handle.getListState(
            "pending", "sequence long, value double, deliver_at_ms long")

    def _release(self, key: Any, now_ms: int) -> tuple[list, list]:
        due, keep = [], []
        if self.pending.exists():
            for row in self.pending.get():
                (due if row[2] <= now_ms else keep).append(tuple(row))
        return due, keep

    def _rearm(self, keep: list, now_ms: int) -> None:
        self.pending.clear()
        if keep:
            self.pending.appendList(keep)
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.handle.registerTimer(min(k[2] for k in keep))

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        due, keep = self._release(key, now_ms)
        for pdf in rows:
            for seq, val, dat in zip(pdf["sequence"], pdf["value"],
                                     pdf["deliver_at_ms"]):
                row = (int(seq), float(val), int(dat))
                (due if row[2] <= now_ms else keep).append(row)
        self._rearm(keep, now_ms)
        if due:
            due.sort(key=lambda r: (r[2], r[0]))
            yield pd.DataFrame(
                [(key[0], *r) for r in due],
                columns=["key", "sequence", "value", "deliver_at_ms"])

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        due, keep = self._release(key, now_ms)
        self._rearm(keep, now_ms)
        if due:
            due.sort(key=lambda r: (r[2], r[0]))
            yield pd.DataFrame(
                [(key[0], *r) for r in due],
                columns=["key", "sequence", "value", "deliver_at_ms"])

    def close(self) -> None:
        pass


def delayed_delivery_stream_tws(
    stream: DataFrame, *, key_col: str = "key", sequence_col: str = "sequence",
    value_col: str = "value", deliver_at_col: str = "deliver_at_ms",
) -> DataFrame:
    """Input columns: key, sequence long, value double, deliver_at_ms long
    (epoch millis). Output rows appear only once their deliver_at passes,
    exactly once each (state is checkpointed with the query)."""
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(sequence_col).cast("long").alias("sequence"),
        F.col(value_col).cast("double").alias("value"),
        F.col(deliver_at_col).cast("long").alias("deliver_at_ms"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        DelayedDeliveryProcessor(), DELAYED_OUTPUT, "Append", "ProcessingTime",
    )
