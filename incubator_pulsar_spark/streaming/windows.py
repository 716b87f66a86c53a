"""Streaming windowed aggregation (the Pulsar Functions window runtime,
continuous form).

Reference: ``WindowFunctionExecutor.java:48-323`` — tumbling/sliding ×
count/time, event-time via TimestampExtractor + watermarks
(``WaterMarkEventGenerator.java:84-122``: watermark = min across inputs
of max-seen-ts − maxLag), late data to a side topic (:296-308).

Spark-first:
- time windows: ``withWatermark`` + ``F.window`` — Spark's watermark is
  computed as min across partitions of max event time − delay, the SAME
  formula the reference uses across input topics.
- count windows: no Spark primitive; ``applyInPandasWithState`` buffers
  per key and emits one output row per full pane of N. Per-key counting
  only (global count windows serialize; SURVEY §7 watch list).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tumbling_stream(
    stream: DataFrame, *, ts_col: str = "event_time", length: str = "1 hour",
    watermark_delay: str = "10 minutes", group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Watermarked tumbling window; emit in append mode once the
    watermark passes window end (the reference's event-time trigger)."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), length), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_stream(
    stream: DataFrame, *, ts_col: str = "event_time", length: str = "1 hour",
    slide: str = "30 minutes", watermark_delay: str = "10 minutes",
    group_by: Sequence[str] = (), aggs: Sequence[Column] = (),
) -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), length, slide), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_stream(
    stream: DataFrame, *, ts_col: str = "event_time", gap: str = "10 minutes",
    watermark_delay: str = "10 minutes", group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Streaming session windows (absent from the reference; free here)."""
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("session_window.start"))
        .withColumn("window_end", F.col("session_window.end"))
        .drop("session_window")
    )


def count_window_stream(
    stream: DataFrame,
    *,
    key_col: str = "key",
    order_col: str = "sequence",
    value_col: str = "value",
    count: int,
) -> DataFrame:
    """Per-key tumbling COUNT window over a stream
    (CountTriggerPolicy.java:34 / CountEvictionPolicy.java:32).

    State per key: window ordinal + rows buffered so far (< count of
    them). When the buffer reaches ``count`` the pane fires: one output
    row (key, window_id, window_size, sum_value, min_seq, max_seq).
    Partial panes stay buffered across micro-batches — exactly
    WindowManager's pane deque, checkpointed.

    Output aggregate is a fixed sum/min/max set; for arbitrary UDAFs
    feed the emitted pane ids back through ``applyInPandas``.
    """
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("window_id", T.LongType()),
        T.StructField("window_size", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("min_seq", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ])
    # buffered pane: running aggregates only — O(1) state per key, not
    # O(count) rows (partial agg like the reference's incremental panes)
    state_schema = T.StructType([
        T.StructField("window_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("min_seq", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        wid, n, sv, mn, mx = state.get if state.exists else (0, 0, 0.0, None, None)
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            for seq, val in zip(pdf[order_col], pdf[value_col]):
                s, v = int(seq), (0.0 if pd.isna(val) else float(val))
                n += 1
                sv += v
                mn = s if mn is None else min(mn, s)
                mx = s if mx is None else max(mx, s)
                if n == count:
                    out_rows.append((key[0], wid, n, sv, mn, mx))
                    wid, n, sv, mn, mx = wid + 1, 0, 0.0, None, None
        state.update((wid, n, sv, mn, mx))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).alias(order_col),
        F.col(value_col).alias(value_col),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )


def sliding_count_window_stream(
    stream: DataFrame,
    *,
    key_col: str = "key",
    order_col: str = "sequence",
    value_col: str = "value",
    length: int,
    slide: int,
) -> DataFrame:
    """Per-key SLIDING count window over a stream: a pane of the trailing
    ``length`` records fires every ``slide`` records
    (CountTriggerPolicy + CountEvictionPolicy with length > slide).

    State per key = the last ``length-1`` (seq, value) pairs plus the
    total record count — the same deque WindowManager keeps, bounded at
    O(length) per key. Each arrival increments the count; when count is
    a multiple of ``slide`` the pane (trailing ≤length rows) fires as
    one output row.
    """
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("window_end_pos", T.LongType()),
        T.StructField("window_size", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("min_seq", T.LongType()),
        T.StructField("max_seq", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("n_seen", T.LongType()),
        T.StructField("buf_seq", T.ArrayType(T.LongType())),
        T.StructField("buf_val", T.ArrayType(T.DoubleType())),
    ])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n_seen, buf_seq, buf_val = (0, [], [])
        if state.exists:
            s = state.get
            n_seen, buf_seq, buf_val = int(s[0]), list(s[1] or []), list(s[2] or [])
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            for seq, val in zip(pdf[order_col], pdf[value_col]):
                buf_seq.append(int(seq))
                buf_val.append(0.0 if pd.isna(val) else float(val))
                if len(buf_seq) > length:
                    buf_seq.pop(0)
                    buf_val.pop(0)
                n_seen += 1
                if n_seen % slide == 0:
                    out_rows.append((key[0], n_seen, len(buf_seq), sum(buf_val),
                                     min(buf_seq), max(buf_seq)))
        state.update((n_seen, buf_seq, buf_val))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).alias(order_col),
        F.col(value_col).alias(value_col),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )


def pane_deltas_stream(
    stream: DataFrame,
    *,
    key_col: str = "key",
    order_col: str = "sequence",
    length: int,
    slide: int,
) -> DataFrame:
    """Streaming pane lifecycle views — the actual WindowFunctionExecutor
    runtime shape: per key, a trigger fires every ``slide``-th record
    and emits the pane contents tagged new/carried plus the rows evicted
    since the previous firing (WindowImpl.get/getNew/getExpired consumed
    at WindowFunctionExecutor.java:222-229).

    State per key = WindowManager's pane deque, bounded: the last
    ``length`` sequences + at most ``slide`` pending evictions + the
    arrival counter — O(length) state, checkpointed, identical output
    to the batch ``operators.windows.pane_deltas`` on the same data
    (asserted in tests).
    """
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("window_end_pos", T.LongType()),
        T.StructField(order_col, T.LongType()),
        T.StructField("delta", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("p", T.LongType()),
        T.StructField("deque", T.ArrayType(T.LongType())),
        T.StructField("evicted", T.ArrayType(T.LongType())),
    ])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        p, deque, evicted = (state.get if state.exists else (0, [], []))
        p, deque, evicted = int(p), list(deque or []), list(evicted or [])
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            for seq in pdf[order_col]:
                s = int(seq)
                p += 1
                deque.append(s)
                if len(deque) > length:
                    evicted.append(deque.pop(0))
                if p % slide == 0:
                    base = p - len(deque)
                    for i, ds in enumerate(deque):
                        pos = base + 1 + i
                        delta = "new" if pos > p - slide else "carried"
                        out.append((key[0], p, ds, delta))
                    for es in evicted:
                        out.append((key[0], p, es, "expired"))
                    evicted = []
        state.update((p, deque, evicted))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(order_col).cast("long").alias(order_col),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )
