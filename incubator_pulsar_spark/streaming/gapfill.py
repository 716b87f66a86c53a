"""Streaming time-grid gap-fill: the continuous form of
operators/gapfill.py — every micro-batch emits the DENSE slot rows that
have become final since the last batch, carrying the last observed
per-slot mean across empty slots.

State per key is three scalars (last emitted slot, carried value,
carried-flag) — slot-bounded, never event-bounded — via
``applyInPandasWithState``. Ordering contract: slots at or before the
last emitted slot are dropped (the same finality a watermark gives a
windowed aggregate; replaying an availableNow pass over an unchanged
checkpoint emits nothing twice). Batch/stream parity is pytest-proven:
after any sequence of batches, the emitted grid equals the batch
``gapfill_locf`` of the union restricted to each key's observed range.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([
    T.StructField("last_slot", T.LongType()),
    T.StructField("carry", T.DoubleType()),
    T.StructField("has_carry", T.BooleanType()),
])


def gapfill_stream(
    stream: DataFrame, *, key_cols: list[str], ts_col: str, value_col: str,
    slot_seconds: int,
) -> DataFrame:
    """Per-key dense slot emission (append mode): key_cols + (slot,
    n_events, value_locf, filled), one row per newly-final slot per
    micro-batch."""
    pre = stream.select(
        *key_cols,
        (F.floor(F.unix_timestamp(F.col(ts_col)) / slot_seconds)
         .cast("long").alias("slot")),
        F.col(value_col).cast("double").alias("_v"),
    )
    out_schema = T.StructType(
        [f for f in pre.schema.fields if f.name not in ("slot", "_v")]
        + [T.StructField("slot", T.LongType()),
           T.StructField("n_events", T.LongType()),
           T.StructField("value_locf", T.DoubleType()),
           T.StructField("filled", T.BooleanType())])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        last_slot, carry, has_carry = (
            state.get if state.exists else (None, None, False))
        # (n_rows, n_nonnull, sum_nonnull) per slot — mean derived once
        # at emit so multi-chunk batches merge exactly
        per_slot: dict[int, list] = {}
        for pdf in pdfs:
            for slot, sub in pdf.groupby("slot", sort=False):
                vals = sub["_v"].dropna()
                acc = per_slot.setdefault(int(slot), [0, 0, 0.0])
                acc[0] += len(sub)
                acc[1] += len(vals)
                acc[2] += float(vals.sum())

        rows: dict[str, list] = {c: [] for c in
                                 [*key_cols, "slot", "n_events",
                                  "value_locf", "filled"]}
        if per_slot:
            lo = min(per_slot) if last_slot is None else last_slot + 1
            hi = max(per_slot)
            for slot in range(lo, hi + 1):
                n, nn, s = per_slot.get(slot, (0, 0, 0.0))
                obs = (s / nn) if nn else None
                if obs is not None:
                    carry, has_carry = obs, True
                for c, kv in zip(key_cols, key):
                    rows[c].append(kv)
                rows["slot"].append(slot)
                rows["n_events"].append(n)
                rows["value_locf"].append(carry if has_carry else None)
                rows["filled"].append(n == 0)
            state.update((hi, carry, has_carry))
        yield pd.DataFrame(rows)

    return (
        pre.groupBy(*key_cols)
        .applyInPandasWithState(fn, out_schema, STATE_SCHEMA, "append",
                                "NoTimeout")
    )
