"""Streaming KMV distinct-count sketch: a running per-group cardinality
estimate across micro-batches.

The batch operator (functions/sketches.py) proves merge == global via
the DuckDB oracle; this is the same merge run incrementally —
``applyInPandasWithState`` keyed by group, state = the k smallest
distinct 48-bit md5 uniforms seen so far (k·8 bytes per group, the
whole point of the sketch: a running COUNT(DISTINCT) would need
unbounded distinct-value state). Each micro-batch folds its values
into the k-minimums and emits the refreshed estimate, so after ANY
sequence of batches the streaming estimate equals the batch sketch of
the union — replay-safe by construction (hashes are deterministic,
min-merge is idempotent and commutative).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.sketches import kmv_uniform

STATE_SCHEMA = T.StructType([
    T.StructField("mins", T.ArrayType(T.DoubleType())),
])


def kmv_distinct_stream(
    stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group running distinct estimate. Output (update mode): one
    row per group per micro-batch — group_cols + (n_kept,
    kmv_estimate), where the estimate is (k−1)/u_k once ≥ k distinct
    values have been seen and the exact running distinct count below
    that."""
    pre = stream.select(
        *group_cols, kmv_uniform(stream[value_col], salt).alias("_u"))
    out_schema = T.StructType(
        [f for f in pre.schema.fields if f.name != "_u"]
        + [T.StructField("n_kept", T.LongType()),
           T.StructField("kmv_estimate", T.DoubleType())])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        import numpy as np

        (mins,) = state.get if state.exists else ([],)
        pool = np.asarray(mins, dtype="float64")
        for pdf in pdfs:
            pool = np.unique(np.concatenate([pool, pdf["_u"].to_numpy()]))[:k]
        state.update((pool.tolist(),))
        n_kept = len(pool)
        est = (k - 1) / pool[-1] if n_kept >= k else float(n_kept)
        row = {c: [v] for c, v in zip(group_cols, key)}
        row["n_kept"] = [n_kept]
        row["kmv_estimate"] = [round(float(est), 6)]
        yield pd.DataFrame(row)

    return (
        pre.groupBy(*group_cols)
        .applyInPandasWithState(fn, out_schema, STATE_SCHEMA, "update",
                                "NoTimeout")
    )
