"""Deterministic, mergeable sketches for cardinality at scale.

Exact COUNT(DISTINCT) shuffles every distinct value; at 100 TB the
shuffle IS the cost. A KMV (k-minimum-values) sketch keeps only the k
smallest hash values per group — fixed k·8 bytes of state, mergeable
by "union then keep k smallest", estimate (k−1)/u_k with relative
error ~1/sqrt(k) (Bar-Yossef et al., "Counting distinct elements in a
data stream", RANDOM 2002; the same estimator DataSketches' theta
sketch uses).

Two properties make this implementation gate-able under an EXACT
DuckDB oracle, not just a tolerance check:

- The hash is md5-derived (48-bit → exact in doubles AND bigints), so
  both engines see bit-identical uniforms — no RNG, no seed drift.
- Partial-then-merge equals global: the k smallest of a union is the
  k smallest of the per-partition k-smallests. The oracle computes the
  GLOBAL k-minimums directly; the Spark side does the two-phase
  map-side reduction — oracle equality IS the mergeability proof.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_U48 = float(2 ** 48)


def kmv_uniform(col, salt: str = "kmv"):
    """48-bit md5 uniform in [0, 1): exact in IEEE doubles (< 2^53) and
    in BIGINTs, so DuckDB replays it bit-for-bit."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), col)), 1, 12),
               16, 10).cast("long")
    return h / F.lit(_U48)


def kmv_distinct(df: DataFrame, group_cols: list[str], value_col: str, *,
                 k: int = 256, salt: str = "kmv") -> DataFrame:
    """Per-group distinct-count estimate via a two-phase KMV sketch.

    Phase 1 (map-side, mapInPandas): each PARTITION reduces to at most
    k smallest distinct uniforms per group — the shuffle then carries
    ≤ partitions·k rows per group instead of every distinct value.
    Phase 2: global k smallest of the union (window rank), then
    estimate = (k−1)/u_k when ≥ k distincts survive, else the exact
    count (fewer than k distinct values means the sketch IS exact).

    Output: group_cols + (n_kept, kmv_estimate).
    """
    pre = df.select(*group_cols, kmv_uniform(F.col(value_col), salt).alias("_u"))
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pre.schema.fields)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        state: dict[tuple, "np.ndarray"] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                vals = sub["_u"].to_numpy()
                prev = state.get(key)
                pool = np.concatenate([prev, vals]) if prev is not None else vals
                pool = np.unique(pool)  # sorted distinct
                state[key] = pool[:k]
        rows = {c: [] for c in group_cols}
        rows["_u"] = []
        for key, pool in state.items():
            key = key if isinstance(key, tuple) else (key,)
            for u in pool:
                for c, kv in zip(group_cols, key):
                    rows[c].append(kv)
                rows["_u"].append(float(u))
        yield pd.DataFrame(rows)

    red = pre.mapInPandas(partial, out_fields)
    w = Window.partitionBy(*group_cols).orderBy("_u")
    kept = (red.dropDuplicates([*group_cols, "_u"])
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k))
    return (
        kept.groupBy(*group_cols)
        .agg(F.max("_rn").alias("n_kept"), F.max("_u").alias("_uk"))
        .select(
            *group_cols,
            F.col("n_kept").cast("long").alias("n_kept"),
            F.when(F.col("n_kept") >= k,
                   F.round(F.lit(float(k - 1)) / F.col("_uk"), 6))
            .otherwise(F.col("n_kept").cast("double")).alias("kmv_estimate"),
        )
    )
