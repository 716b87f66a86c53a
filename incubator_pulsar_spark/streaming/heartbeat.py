"""Tunable-cadence liveness ticker: a Python streaming data source
whose OFFSET advances only once per ``interval`` seconds.

Why the built-in ``rate`` source can't do this: its offset unit is
elapsed SECONDS regardless of ``rowsPerSecond`` (that option scales
rows-per-offset-unit, not offset cadence), so a rate-keepalive stream
constructs ~1 micro-batch per second forever even when idle. For a
rarely-delayed topic that is correct but chatty (VERDICT r11 #6). Batch
construction is driven by offset ADVANCEMENT, so the only real cadence
lever is a source whose latest offset moves at the desired period —
this one (Spark 4 Python data source API,
``pyspark.sql.datasource.SimpleDataSourceStreamReader``).

Replay discipline: offsets carry (anchor_ms, tick count n); ticks are
numbered, so ``readBetweenOffsets(start, end)`` regenerates the exact
rows of any replayed batch from the offsets alone — deterministic
recovery with no state. Consumers that union this into a keyed stream
(``streaming/delay.py``) drop tick rows before state anyway
(NULL-sequence rule), so replay is doubly inert.

Source contract caveat (same as toggling ``keepalive``): a checkpoint
records the source TYPE — restarting an existing rate-keepalive
checkpoint with a heartbeat keepalive (or vice versa) is incompatible;
pick the cadence before first start or start a fresh checkpoint.
"""

from __future__ import annotations

import time
from collections.abc import Iterator


def _now_ms() -> int:
    return int(time.time() * 1000)


class HeartbeatStreamReader:
    """SimpleDataSourceStreamReader emitting one (tick, ts_ms) row per
    ``interval`` seconds. Offset = {"anchor_ms": stream start,
    "n": ticks emitted so far} — pure offset math, unit-testable
    without Spark (``_advance``)."""

    def __init__(self, interval_s: float):
        self.interval_ms = max(int(interval_s * 1000), 1)

    def initialOffset(self) -> dict:
        return {"anchor_ms": _now_ms(), "n": 0}

    @staticmethod
    def _rows(anchor_ms: int, lo_n: int, hi_n: int,
              interval_ms: int) -> Iterator[tuple]:
        # tick k (1-based) is stamped at its SCHEDULED time — a pure
        # function of the offsets, so replay regenerates identical rows.
        # LIST iterator, not a generator: Spark's prefetch cache
        # copy.copy()'s the iterator and generators aren't copyable
        return iter([(k, anchor_ms + k * interval_ms)
                     for k in range(lo_n + 1, hi_n + 1)])

    def _advance(self, start: dict, now_ms: int) -> dict:
        due = max((now_ms - start["anchor_ms"]) // self.interval_ms, 0)
        if due <= start["n"]:
            return start
        return {"anchor_ms": start["anchor_ms"], "n": due}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        end = self._advance(start, _now_ms())
        return (self._rows(start["anchor_ms"], start["n"], end["n"],
                           self.interval_ms), end)

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(start["anchor_ms"], start["n"], end["n"],
                          self.interval_ms)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — rows derive from offsets


def _make_datasource_class():
    """Build the DataSource subclass lazily (pyspark.sql.datasource
    import stays off the module-import path for non-streaming users)."""
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class _Reader(HeartbeatStreamReader, SimpleDataSourceStreamReader):
        pass

    class HeartbeatDataSource(DataSource):
        """``spark.readStream.format("heartbeat")
        .option("interval", "30").load()`` → one (tick BIGINT,
        ts_ms BIGINT) row every ``interval`` seconds, offset-silent in
        between (no micro-batch constructed on an otherwise-idle
        query)."""

        @classmethod
        def name(cls) -> str:
            return "heartbeat"

        def schema(self) -> str:
            return "tick bigint, ts_ms bigint"

        def simpleStreamReader(self, schema):  # noqa: ARG002
            return _Reader(float(self.options.get("interval", "1")))

    return HeartbeatDataSource


_REGISTERED: set[int] = set()


def register_heartbeat_source(spark) -> None:
    """Idempotently register the ``heartbeat`` format on this session."""
    key = id(spark)
    if key in _REGISTERED:
        return
    spark.dataSource.register(_make_datasource_class())
    _REGISTERED.add(key)


def heartbeat_stream(spark, interval_s: float = 1.0):
    """Streaming DataFrame of liveness ticks at the given period."""
    register_heartbeat_source(spark)
    return (spark.readStream.format("heartbeat")
            .option("interval", str(interval_s)).load())
