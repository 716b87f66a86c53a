"""Streaming SCD2: the change-history operator as a keyed stateful
stream (the streaming twin of operators/compaction.scd2_history)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCD2_STATE_SCHEMA = T.StructType([
    T.StructField("cur_value", T.StringType()),
    T.StructField("cur_from", T.LongType()),
    T.StructField("version", T.IntegerType()),
    T.StructField("has_null_value", T.BooleanType()),
])


def scd2_stream(
    stream: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
    order_col: str = "sequence",
) -> DataFrame:
    """Keyed streaming SCD2 (type-2 change history): per key, maintain
    the OPEN value run in state; when a batch's rows (sorted by
    ``order_col``) show a value change, emit the CLOSED run with its
    [valid_from, valid_to) interval and bump the version. The final
    open run per key is emitted each batch it changes with valid_to
    NULL. The operator declares APPEND output (file sinks demand it —
    the delay.py precedent), so an extended open run APPENDS a fresh
    (key, version) row each batch it changes: downstream consumers
    upsert by (key, version), closed row (valid_to NOT NULL) winning —
    the standard CDC-log compaction read.

    Contract: per-key ``order_col`` must be non-decreasing ACROSS
    batches (publish-order arrival — the same contract as the count
    windows and the reference's per-key sequence discipline); rows
    older than the open run's start are dropped as late data. Values
    compare null-safely (a NULL value is a run; NULL-after-NULL is not
    a change) — the exact batch semantics, so the pytest parity gate
    asserts stream output == ``scd2_history`` on the same rows.

    Output: (key, value, valid_from, valid_to, version) with
    valid_from/valid_to as LONG order values.
    """
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("valid_from", T.LongType()),
        T.StructField("valid_to", T.LongType()),
        T.StructField("version", T.IntegerType()),
    ])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_value, cur_from, version, has_null = state.get
            if has_null:
                cur_value = None
        else:
            cur_value, cur_from, version = None, None, 0
        rows = []
        for pdf in pdfs:
            for v, o in zip(pdf[value_col], pdf[order_col]):
                rows.append((int(o), None if pd.isna(v) else str(v)))
        rows.sort(key=lambda r: r[0])
        out = []
        for o, v in rows:
            if version == 0:
                cur_value, cur_from, version = v, o, 1
                continue
            if o < cur_from:
                continue  # late arrival older than the open run: drop
            if v != cur_value:
                out.append((key[0], cur_value, cur_from, o, version))
                cur_value, cur_from, version = v, o, version + 1
        if version > 0:
            state.update((cur_value if cur_value is not None else None,
                          cur_from, version, cur_value is None))
            # the (possibly extended) open run — valid_to NULL
            out.append((key[0], cur_value, cur_from, None, version))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "value", "valid_from", "valid_to",
                              "version"])

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias(value_col),
        F.col(order_col).cast("long").alias(order_col))
    return keyed.groupBy("key").applyInPandasWithState(
        fn, out_schema, SCD2_STATE_SCHEMA, "append", "NoTimeout")
