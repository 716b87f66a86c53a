"""Time-grid gap-fill with last-observation-carried-forward (LOCF).

Timeseries rollups over message topics need a DENSE grid — a slot with
no traffic must still emit a row (dashboards, rate alerting, downstream
joins on slot). The reference exposes per-interval stats only where
entries exist (topic stats are sampled counters, see
``org.apache.pulsar.common.policies.data.stats.TopicStatsImpl``); the
engine-side operator is the TimescaleDB-style ``time_bucket_gapfill`` +
``locf``: bucket events into fixed slots, outer-join against the full
slot grid per key, and carry the last observed value forward across
empty slots.

Scale shape:
- Bucketing and the per-(key, slot) aggregate are one keyed shuffle with
  map-side partial aggregation — the grid never touches raw events.
- The grid itself is ``|keys| × n_slots`` rows built from ``sequence()``
  + ``explode`` (generated, not scanned) against broadcast bounds.
- LOCF is one window per key ordered by slot over the AGGREGATED grid
  (n_slots rows per key, not n_events) — state is one value per key.
- A hot key serializes its own grid partition only; grids are
  slot-bounded so this is n_slots rows, not data-mass. (For hot-KEY
  *data* skew the aggregate before it already partial-aggregates
  map-side; the salting pattern in ``operators/asof.py`` applies if a
  single key's grid itself becomes the bottleneck.)

Determinism: slot = floor(epoch/slot_seconds) in integer arithmetic;
per-slot means go through the exact DECIMAL(18,4) sum over an exact
count, so the carried value is bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame, *, key_cols: list[str], ts_col: str, value_col: str,
    slot_seconds: int,
) -> DataFrame:
    """Dense per-key slot grid with LOCF-filled mean values.

    Output: key_cols + (slot BIGINT, n_events BIGINT, value_locf DOUBLE,
    filled BOOLEAN). ``value_locf`` is NULL for leading slots before a
    key's first observation (nothing to carry); ``filled`` marks slots
    whose value was carried rather than observed.
    """
    slotted = df.select(
        *key_cols,
        (F.floor(F.unix_timestamp(F.col(ts_col)) / slot_seconds)
         .cast("long").alias("slot")),
        F.col(value_col).alias("_v"),
    )
    per_slot = slotted.groupBy(*key_cols, "slot").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("_v").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)), 6).alias("_obs"),
    )
    bounds = slotted.agg(F.min("slot").alias("_mn"), F.max("slot").alias("_mx"))
    keys = slotted.select(*key_cols).dropDuplicates(key_cols)
    grid = (
        keys.crossJoin(F.broadcast(bounds))
        .select(*key_cols,
                F.explode(F.sequence(F.col("_mn"), F.col("_mx"))).alias("slot"))
    )
    joined = grid.join(per_slot, [*key_cols, "slot"], "left")
    w = (Window.partitionBy(*key_cols).orderBy("slot")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        *key_cols,
        "slot",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.last("_obs", ignorenulls=True).over(w).alias("value_locf"),
        # "filled" = the grid invented this slot (no events at all). A
        # slot whose events all carry NULL values is NOT filled — it was
        # observed, its mean is just NULL (and LOCF carries past it).
        (F.coalesce(F.col("n_events"), F.lit(0)) == 0).alias("filled"),
    )
