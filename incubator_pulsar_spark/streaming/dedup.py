"""Streaming per-producer sequence-id deduplication.

Reference: ``broker/service/persistent/MessageDeduplication.java`` — the
broker keeps ``highestSequencedPushed`` per producer (:110-115) and drops
any message whose sequence_id ≤ that high-water mark (:186-187). The map
is snapshotted every N entries (:142) so recovery replays only the tail.

Spark-first: ``applyInPandasWithState`` keyed by producer. State = one
LONG (the high-water mark) per producer — identical memory profile to
the reference's map; the state-store checkpoint IS the snapshot
mechanism (no custom snapshot cursor needed). Arrival order within a
micro-batch follows the ``arrival_col`` sort, mirroring publish order.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([T.StructField("highest_seq", T.LongType())])


def dedup_stream(
    stream: DataFrame,
    *,
    producer_col: str = "producer_name",
    sequence_id_col: str = "sequence_id",
    arrival_col: str = "sequence",
) -> DataFrame:
    """Rows whose sequence_id regressed for their producer are dropped;
    the surviving high-water mark persists across micro-batches in the
    state store.

    Output schema == input schema. One shuffle by producer per batch
    (bounded cardinality — producers, not message keys).
    """
    out_schema = stream.schema

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (highest,) = state.get if state.exists else (None,)
        for pdf in pdfs:
            pdf = pdf.sort_values(arrival_col, kind="mergesort")
            keep = []
            for i, seq in zip(pdf.index, pdf[sequence_id_col]):
                s = None if pd.isna(seq) else int(seq)
                if s is None or highest is None or s > highest:
                    keep.append(i)
                    if s is not None:
                        highest = s
            if keep:
                yield pdf.loc[keep]
        if highest is not None:
            state.update((highest,))

    return (
        stream.groupBy(producer_col)
        .applyInPandasWithState(fn, out_schema, STATE_SCHEMA, "append",
                                "NoTimeout")
    )


def dedup_within_watermark(
    stream: DataFrame,
    *,
    producer_col: str = "producer_name",
    sequence_id_col: str = "sequence_id",
    event_time_col: str = "publish_time",
    delay: str = "10 minutes",
) -> DataFrame:
    """Built-in alternative: exact-duplicate drop on (producer, seq id)
    within a watermark horizon — ``dropDuplicatesWithinWatermark``.

    Weaker than the broker's monotonic high-water-mark rule (it only
    suppresses EQUAL ids seen within the horizon, not regressions), but
    needs bounded state regardless of producer count. Use for at-least-
    once producer retries (the common case the reference's dedup exists
    for); use ``dedup_stream`` for strict monotonic enforcement.
    """
    return (
        stream.withWatermark(event_time_col, delay)
        .dropDuplicatesWithinWatermark([producer_col, sequence_id_col])
    )
