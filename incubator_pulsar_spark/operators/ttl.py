"""Message TTL / retention / seek.

Reference:
- TTL expiry: ``PersistentMessageExpiryMonitor.java:47`` advances the
  cursor past messages older than the namespace TTL, using
  find-by-timestamp (``PersistentMessageFinder.java:41,63`` — binary
  search over ledger boundaries).
- Seek: ``Consumer.seek`` by MessageId or timestamp
  (``Consumer.java:513,525``; broker ``ServerCnx.handleSeek:2093``).
- Reader: scan from a position (``Reader.java:49-174``).

Spark-first: all three are filters on ``publish_time`` / ``sequence``.
Parquet min/max footer stats + partition pruning make them O(touched
files), the same asymptotics as the reference's ledger-boundary search —
`.explain()` must show PushedFilters on these columns.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expire_ttl(df: DataFrame, ttl_seconds: int, *, now: Column | datetime | None = None,
               publish_time_col: str = "publish_time") -> DataFrame:
    """Keep only messages younger than the TTL.

    ``now`` defaults to current_timestamp(); pass a literal for
    deterministic tests (the expiry monitor runs against wall clock).
    """
    now_c = now if isinstance(now, Column) else (
        F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    )
    cutoff = now_c - F.make_interval(secs=F.lit(ttl_seconds))
    return df.filter(F.col(publish_time_col) >= cutoff)


def seek_timestamp(df: DataFrame, ts, *, publish_time_col: str = "publish_time") -> DataFrame:
    """Reposition to the first message published at/after ``ts``.

    PersistentMessageFinder.findMessages — earliest entry with
    publish_time >= ts; everything from there onward is delivered.
    """
    ts_c = ts if isinstance(ts, Column) else F.lit(ts).cast("timestamp")
    return df.filter(F.col(publish_time_col) >= ts_c)


def seek_sequence(df: DataFrame, sequence: int, *, inclusive: bool = True,
                  sequence_col: str = "sequence") -> DataFrame:
    """Seek by message-id (ledger/entry collapses to sequence)."""
    c = F.col(sequence_col)
    return df.filter(c >= sequence if inclusive else c > sequence)


def reader_range(df: DataFrame, *, start_sequence: int | None = None,
                 end_sequence: int | None = None,
                 sequence_col: str = "sequence") -> DataFrame:
    """Reader.readNext over [start, end) — a bounded scan of the log."""
    out = df
    if start_sequence is not None:
        out = out.filter(F.col(sequence_col) >= start_sequence)
    if end_sequence is not None:
        out = out.filter(F.col(sequence_col) < end_sequence)
    return out
