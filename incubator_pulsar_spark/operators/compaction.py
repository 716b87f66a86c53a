"""Topic compaction: latest value per key.

Reference: two-phase compactor
(``pulsar-broker/.../compaction/AbstractTwoPhaseCompactor.java:60,88-99`` —
phase one scans building key→latest MessageId holding ids only to bound
memory; phase two rewrites the compacted ledger), with publish-order
(``PublishingOrderCompactor.java``) and event-time-order
(``EventTimeOrderCompactor.java:62-76``) variants, and pluggable
keep-strategy (``StrategicTwoPhaseCompactor.java``). Null value is a
tombstone (key disappears); null-key retention is configurable.

Spark-first design: compaction is exactly ``max_by(struct(*), order)``
per key — a single hash aggregation. Spark's partial (map-side)
aggregation keeps only the winning row per key per task, which is the
same memory-bounding trick phase one performs, but in one pass instead
of two. No window function, no sort, one shuffle on ``key``.

Scale: at 100 TB the only shuffle is by ``key``; skewed hot keys are
handled by AQE skew-split (partial agg already collapses them map-side,
so the reduce side sees ≤ #tasks rows per key). If the topic is stored
bucketed by ``key``, the shuffle disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PUBLISH_ORDER = "publish_order"
EVENT_TIME_ORDER = "event_time_order"


def _order_col(df: DataFrame, mode: str | Column, sequence_col: str, event_time_col: str) -> Column:
    if isinstance(mode, Column):
        return mode
    if mode == PUBLISH_ORDER:
        return F.col(sequence_col)
    if mode == EVENT_TIME_ORDER:
        # EventTimeOrderCompactor.java:62-76 — keep max event_time per key,
        # broken by publish order (sequence) for equal timestamps.
        return F.struct(F.col(event_time_col), F.col(sequence_col))
    raise ValueError(f"unknown compaction mode: {mode}")


def compact(
    df: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
    sequence_col: str = "sequence",
    event_time_col: str = "event_time",
    mode: str | Column = PUBLISH_ORDER,
    retain_null_key: bool = False,
    drop_tombstones: bool = True,
) -> DataFrame:
    """Compact a topic DataFrame to latest-row-per-key.

    Returns full winning rows (all columns preserved), mirroring the
    compacted ledger containing whole messages. ``mode`` may be a custom
    Column for the strategic compactor's pluggable ordering.
    """
    order = _order_col(df, mode, sequence_col, event_time_col)
    keyed = df if retain_null_key else df.filter(F.col(key_col).isNotNull())

    row = F.struct(*[F.col(c) for c in df.columns])
    compacted = (
        keyed.groupBy(key_col)
        .agg(F.max_by(row, order).alias("_row"))
        .select("_row.*")
    )
    if drop_tombstones:
        compacted = compacted.filter(F.col(value_col).isNotNull())
    return compacted


def compacted_read(
    df: DataFrame,
    *,
    horizon: int,
    key_col: str = "key",
    value_col: str = "value",
    sequence_col: str = "sequence",
    mode: str | Column = PUBLISH_ORDER,
    event_time_col: str = "event_time",
) -> DataFrame:
    """Compacted read path (``CompactedTopicImpl`` / ``CompactedTopicUtils``,
    ``PulsarCompactorSubscription``): a subscription positioned before the
    compaction horizon reads the compacted snapshot up to the horizon,
    then the raw live tail after it.

    ``horizon`` is the last sequence covered by compaction (the
    compactedTopicHorizon ledger mark). Output = compact(log ≤ horizon)
    ∪ log > horizon — one aggregation over the pruned head (sequence
    min/max stats skip tail files) plus a filter scan of the tail.
    """
    head = df.filter(F.col(sequence_col) <= horizon)
    tail = df.filter(F.col(sequence_col) > horizon)
    snapshot = compact(
        head, key_col=key_col, value_col=value_col, sequence_col=sequence_col,
        event_time_col=event_time_col, mode=mode,
    )
    return snapshot.unionByName(tail)


def scd2_history(
    df: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
    order_col: str = "sequence",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) change history: collapse a
    keyed update log into one row per VALUE RUN with its validity
    interval — the full-history complement of ``compact`` (which keeps
    only the latest run's value; `AbstractTwoPhaseCompactor` discards
    history by design, while warehouse dimension tables must keep it).

    Classic windowed derivation, all JVM-side: LAG detects run starts
    (null-safe — a NULL value is a run like any other, and
    NULL-after-NULL is NOT a change), LEAD over the run starts closes
    each interval at the NEXT run's start. ``valid_to`` is NULL for
    each key's current run (the open interval). ``version`` numbers a
    key's runs from 1.

    Scale: two window passes over the same (key × order) sort — ONE
    shuffle (Catalyst reuses the sort for same-spec windows); no
    driver state. Ties on ``order_col`` break by ``tiebreak_col``
    (default: the order column alone must be unique per key).

    Output: (key, value, valid_from, valid_to, version) with
    valid_from/valid_to in ``order_col``'s type.
    """
    order = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(value_col)).over(w)
    is_start = (F.row_number().over(w) == 1) | \
        ~F.col(value_col).eqNullSafe(prev)
    starts = (df.select(key_col, value_col, order_col,
                        *([tiebreak_col] if tiebreak_col else []))
              .withColumn("_st", is_start)
              .filter(F.col("_st"))
              .drop("_st"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (starts
            .withColumn("valid_from", F.col(order_col))
            .withColumn("valid_to", F.lead(F.col(order_col)).over(w2))
            .withColumn("version",
                        F.row_number().over(w2).cast("int"))
            .select(key_col, value_col, "valid_from", "valid_to",
                    "version"))
