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
    out = df.filter(F.col(publish_time_col) >= cutoff)
    if "publish_date" in df.columns:  # date-partitioned topic → prune dirs
        out = out.filter(F.col("publish_date") >= F.to_date(cutoff))
    return out


def seek_timestamp(df: DataFrame, ts, *, publish_time_col: str = "publish_time") -> DataFrame:
    """Reposition to the first message published at/after ``ts``.

    PersistentMessageFinder.findMessages — earliest entry with
    publish_time >= ts; everything from there onward is delivered.
    """
    ts_c = ts if isinstance(ts, Column) else F.lit(ts).cast("timestamp")
    out = df.filter(F.col(publish_time_col) >= ts_c)
    if "publish_date" in df.columns:  # date-partitioned topic → prune dirs
        out = out.filter(F.col("publish_date") >= F.to_date(ts_c))
    return out


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


def trim_topic_by_date(topic_path: str, older_than, *, dry_run: bool = False) -> list[str]:
    """Storage-maintenance retention for date-partitioned topics
    (``write_topic(partition_by_date=True)``): DELETE whole
    ``publish_date=`` day directories older than the cutoff — the
    ledger-deletion analogue (RetentionPolicies / ledger trimming), run
    as a scheduled job, never in the query path.

    O(days trimmed): no data is read, directories are removed. Returns
    the (relative) directory names removed; ``dry_run`` lists without
    deleting.
    """
    import datetime as _dt
    import os as _os
    import shutil as _shutil

    cutoff = older_than.date() if isinstance(older_than, _dt.datetime) else older_than
    removed: list[str] = []
    for name in sorted(_os.listdir(topic_path)):
        if not name.startswith("publish_date="):
            continue
        try:
            day = _dt.date.fromisoformat(name.split("=", 1)[1])
        except ValueError:
            # e.g. publish_date=__HIVE_DEFAULT_PARTITION__ (NULL publish
            # times) — age unknowable, so retention must skip it, not
            # abort the whole trim.
            continue
        if day < cutoff:
            if not dry_run:
                _shutil.rmtree(_os.path.join(topic_path, name))
            removed.append(name)
    return removed


def apply_retention(
    df: DataFrame,
    *,
    time_seconds: int | None = None,
    size_bytes: int | None = None,
    now: Column | datetime | None = None,
    publish_time_col: str = "publish_time",
    partition_col: str = "partition",
    sequence_col: str = "sequence",
    value_col: str = "value",
) -> DataFrame:
    """Retention policy (RetentionPolicies.java / BacklogQuotaManager):
    what STORAGE keeps after acknowledgement — a time limit and/or a
    per-partition size budget, newest-first (the newest data survives a
    size squeeze, oldest is trimmed — ledger deletion order).

    TTL (``expire_ttl``) drops messages for *consumers*; retention trims
    the *log*. The size budget is a running payload-byte sum walking the
    partition newest→oldest: rows past the budget are trimmed. One
    shuffle by partition; the running sum is the only windowed pass —
    at 100 TB this runs as the storage-maintenance job (VACUUM analogue),
    not in the query path.
    """
    from pyspark.sql import Window

    out = df
    if time_seconds is not None:
        now_c = now if isinstance(now, Column) else (
            F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
        )
        cutoff = now_c - F.make_interval(secs=F.lit(time_seconds))
        out = out.filter(F.col(publish_time_col) >= cutoff)
    if size_bytes is not None:
        w = (Window.partitionBy(partition_col)
             .orderBy(F.col(sequence_col).desc())
             .rowsBetween(Window.unboundedPreceding, 0))
        out = (
            out.withColumn("_cum", F.sum(
                F.coalesce(F.length(F.col(value_col).cast("binary")), F.lit(0))
            ).over(w))
            .filter(F.col("_cum") <= size_bytes)
            .drop("_cum")
        )
    return out
