"""Topic-storage maintenance: small-file compaction.

The reference's storage layer rolls over and trims ledgers
(``ManagedLedgerImpl.rollCurrentLedgerIfFull``, retention trimming in
``internalTrimLedgers`` — /root/reference/managed-ledger/src/main/java/
org/apache/bookkeeper/mledger/impl/ManagedLedgerImpl.java) so a topic
never accumulates unbounded tiny segments. The parquet-topic analogue
is the classic small-files problem: every micro-batch append writes
``spark.sql.shuffle.partitions`` files, and after a day of 1-minute
batches a topic directory holds tens of thousands of KB-sized files —
scan planning, footer reads, and NameNode/object-store listing all
degrade long before the data itself is big.

``compact_parquet_dir`` rewrites a topic directory (flat, or one level
of ``col=`` hive partitions, compacted per partition so pruning
survives) into ``ceil(bytes / target_file_bytes)`` files. Rewrite is
read → repartition(n) → write-to-temp → swap, so:

- the swap is two directory renames (old → ``.pre-compact``, tmp →
  live); a crash before the first rename leaves the original intact, a
  crash between them is recovered by re-running (the leftover
  ``.pre-compact`` is detected and removed once the live dir exists);
- readers concurrent with the swap follow the same at-least-once +
  idempotent-consumer contract as redelivery (same posture as
  ``offload_topic_by_date``);
- re-running is a no-op once file counts meet the target
  (``files <= n_target`` leaves the leaf untouched).

``sort_by`` optionally clusters rows during the rewrite
(sortWithinPartitions) so min/max row-group stats become selective —
the cheap half of a Z-order pass, worth it when one predicate column
dominates reads.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

_TMP_SUFFIX = ".compact-tmp"
_OLD_SUFFIX = ".pre-compact"


def _recover(leaf: str) -> None:
    """Heal a leaf that crashed mid-swap on a previous run: if the
    ``.pre-compact`` dir exists and the live leaf does not, the first
    rename happened but the second didn't — roll back; if both exist,
    the swap completed — finish the cleanup."""
    old = leaf + _OLD_SUFFIX
    if os.path.exists(old):               # crashed mid-swap last time
        if os.path.exists(leaf):
            shutil.rmtree(old)            # swap had completed; finish cleanup
        else:
            os.rename(old, leaf)          # swap never happened; roll back


def _leaf_dirs(path: str) -> list[str]:
    """The directories actually holding parquet files: the path itself,
    or its one level of hive ``col=`` partition children."""
    parts = [os.path.join(path, n) for n in sorted(os.listdir(path))
             if "=" in n and os.path.isdir(os.path.join(path, n))]
    return parts if parts else [path]


def _parquet_bytes(leaf: str) -> tuple[int, int]:
    files = [n for n in os.listdir(leaf)
             if n.endswith(".parquet") and not n.startswith(".")]
    return sum(os.path.getsize(os.path.join(leaf, n)) for n in files), len(files)


def compact_parquet_dir(
    spark: SparkSession, path: str, *,
    target_file_bytes: int = 128 << 20,
    sort_by: list[str] | None = None,
) -> dict[str, tuple[int, int]]:
    """Compact every leaf under ``path``; returns
    {leaf: (files_before, files_after)} for leaves rewritten."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")

    _recover(path)                        # the topic dir itself may be mid-swap
    out: dict[str, tuple[int, int]] = {}
    for leaf in _leaf_dirs(path):
        _recover(leaf)
        nbytes, nfiles = _parquet_bytes(leaf)
        if nfiles == 0:
            continue
        n_target = max(1, math.ceil(nbytes / target_file_bytes))
        if nfiles <= n_target:
            continue
        df = spark.read.parquet(leaf)
        tmp = leaf + _TMP_SUFFIX
        writer = df.repartition(n_target)
        if sort_by:
            writer = writer.sortWithinPartitions(*sort_by)
        writer.write.mode("overwrite").parquet(tmp)
        old = leaf + _OLD_SUFFIX
        os.rename(leaf, old)
        os.rename(tmp, leaf)
        shutil.rmtree(old)
        out[leaf] = (nfiles, _parquet_bytes(leaf)[1])
    return out


def merge_into_topic(
    spark: SparkSession, updates, path: str, *,
    key_cols: list[str], order_col: str,
    partition_col: str = "publish_date",
) -> list[str]:
    """Partition-scoped MERGE (upsert) into a hive-partitioned parquet
    topic: for every partition the updates touch, read that partition,
    union the updates, keep the winning row per key (max ``order_col``,
    ties to the update side), and rewrite ONLY those partitions with
    the same two-rename atomic swap as ``compact_parquet_dir``.
    Untouched partitions are never read or written — the rewrite cost
    is O(affected days), not O(topic), which is what makes upserts
    viable on a 100 TB topic.

    This is the storage-side analogue of the reference's compacted-
    topic semantics (latest value per key wins —
    TwoPhaseCompactor, /root/reference/pulsar-broker/src/main/java/org/
    apache/pulsar/compaction/TwoPhaseCompactor.java) applied as a
    lakehouse MERGE INTO. Returns the partition directory names
    rewritten.

    ``updates`` must contain ``partition_col`` (the day it lands in),
    the key columns, and ``order_col``. Cross-partition key moves are
    out of scope by design — a key lives in its partition (same
    contract as the reference's per-topic compaction).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    days = [r[0] for r in updates.select(partition_col).distinct().collect()]
    # NULL-day updates have no home partition — skipped, same rule as
    # trim_topic_by_date / offload for __HIVE_DEFAULT_PARTITION__
    rewritten: list[str] = []
    for day in sorted(str(d) for d in days if d is not None):
        leaf = os.path.join(path, f"{partition_col}={day}")
        # Heal a crash from a previous merge on this partition BEFORE
        # testing existence: a crash between os.rename(leaf, old) and
        # os.rename(tmp, leaf) leaves the live dir missing — without
        # recovery the merge below would rebuild the partition from the
        # updates alone and rmtree the .pre-compact dir holding every
        # pre-existing row.
        _recover(leaf)
        _day_updates = updates.filter(
            F.col(partition_col).cast("string") == day).drop(partition_col)
        if os.path.exists(leaf):
            current = spark.read.parquet(leaf).withColumn("_src", F.lit(0))
        else:
            current = None
        merged = _day_updates.withColumn("_src", F.lit(1))
        if current is not None:
            merged = current.unionByName(merged)
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(order_col).desc(), F.col("_src").desc())
        winner = (merged.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn", "_src"))
        tmp = leaf + _TMP_SUFFIX
        winner.write.mode("overwrite").parquet(tmp)
        old = leaf + _OLD_SUFFIX
        if os.path.exists(leaf):
            os.rename(leaf, old)
        os.rename(tmp, leaf)
        if os.path.exists(old):
            shutil.rmtree(old)
        rewritten.append(os.path.basename(leaf))
    return rewritten
