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
from pyspark.sql import functions as F
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


MG_STATE_SCHEMA = T.StructType([
    T.StructField("keys", T.ArrayType(T.StringType())),
    T.StructField("counts", T.ArrayType(T.LongType())),
    T.StructField("total", T.LongType()),
])


def misra_gries_stream(
    stream: DataFrame, key_col: str, *, k: int = 64, n_shards: int = 8,
    salt: str = "mg",
) -> DataFrame:
    """Running heavy-hitter candidates over a stream: per-shard
    Misra-Gries counters maintained across micro-batches.

    Keys shard by md5 (every occurrence of a key lands in ONE shard),
    so each shard's MG summary carries the standard guarantee over its
    own substream: any key with shard count > shard_total/(k+1)
    survives — and since a shard holds ALL of a key's occurrences, any
    key with GLOBAL count > total/(k+1) survives its shard. State is
    2·k values per shard, fixed forever; a running exact count per key
    would grow with the key domain.

    Output (update mode), one row per surviving key per batch:
    (shard, key_col, mg_count, shard_total). ``mg_count`` is the MG
    lower bound (true_count − mg_count ≤ shard_total/(k+1)); exact when
    the shard has seen ≤ k distinct keys. Downstream exact recount —
    the second pass of ``functions.sketches.heavy_hitters`` — applies
    unchanged when exactness is needed.
    """
    from pyspark.sql import functions as F

    pre = stream.select(
        (F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                              F.col(key_col))), 1, 12),
                16, 10).cast("long") % n_shards).alias("shard"),
        F.col(key_col).cast("string").alias("_key"),
    )
    out_schema = T.StructType([
        T.StructField("shard", T.LongType()),
        T.StructField(key_col, T.StringType()),
        T.StructField("mg_count", T.LongType()),
        T.StructField("shard_total", T.LongType()),
    ])

    def fn(key, pdfs, state):
        keys, counts, total = (state.get if state.exists else ([], [], 0))
        counters = dict(zip(keys, counts))
        for pdf in pdfs:
            vc = pdf["_key"].value_counts(dropna=True)
            total += int(vc.sum())
            for kk, cnt in vc.items():
                counters[kk] = counters.get(kk, 0) + int(cnt)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {c: n - cut for c, n in counters.items() if n > cut}
        state.update((list(counters.keys()), list(counters.values()), total))
        (shard,) = key
        yield pd.DataFrame({
            "shard": [shard] * len(counters),
            key_col: list(counters.keys()),
            "mg_count": list(counters.values()),
            "shard_total": [total] * len(counters),
        })

    return (
        pre.groupBy("shard")
        .applyInPandasWithState(fn, out_schema, MG_STATE_SCHEMA, "update",
                                "NoTimeout")
    )


QSK_STATE_SCHEMA = T.StructType([
    T.StructField("us", T.ArrayType(T.DoubleType())),
    T.StructField("ids", T.ArrayType(T.LongType())),
    T.StructField("vals", T.ArrayType(T.DoubleType())),
])


def sample_quantiles_stream(
    stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    *,
    k: int = 512,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    salt: str = "qsk",
) -> DataFrame:
    """Running per-group quantile estimates across micro-batches: the
    streaming form of ``functions.sketches.sample_quantiles``. State is
    the k smallest-(u, id) rows seen so far (3·k scalars per group,
    fixed forever); each batch folds in and re-emits the refreshed
    type-1 sample quantiles, so after ANY batch sequence the streaming
    estimate equals the batch sketch of the union — same
    min-merge-is-idempotent replay safety as ``kmv_distinct_stream``.

    Output (update mode): group_cols + (sample_n, est_q<p>...).
    """
    from ..functions.sketches import _id_order_key

    pre = stream.select(
        *group_cols,
        kmv_uniform(stream[id_col], salt).alias("_u"),
        _id_order_key(stream, id_col).alias("_id"),
        stream[value_col].cast("double").alias("_v"))
    base = [f for f in pre.schema.fields if f.name in group_cols]
    out_schema = T.StructType(
        base + [T.StructField("sample_n", T.LongType())]
        + [T.StructField(f"est_q{int(p * 100)}", T.DoubleType())
           for p in probs])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        import numpy as np

        us, ids, vals = (state.get if state.exists else ([], [], []))
        u = np.asarray(us, dtype="float64")
        i = np.asarray(ids, dtype="int64")
        v = np.asarray(vals, dtype="float64")
        for pdf in pdfs:
            u = np.concatenate([u, pdf["_u"].to_numpy()])
            i = np.concatenate([i, pdf["_id"].to_numpy()])
            v = np.concatenate([v, pdf["_v"].to_numpy()])
            order = np.lexsort((i, u))[:k]
            u, i, v = u[order], i[order], v[order]
        state.update((u.tolist(), i.tolist(), v.tolist()))
        m = len(v)
        sv = np.sort(v)
        row = {c: [kv] for c, kv in zip(group_cols, key)}
        row["sample_n"] = [m]
        for p in probs:
            rank = max(int(np.ceil(p * m)), 1)
            row[f"est_q{int(p * 100)}"] = [float(sv[rank - 1]) if m else None]
        yield pd.DataFrame(row)

    return (
        pre.groupBy(*group_cols)
        .applyInPandasWithState(fn, out_schema, QSK_STATE_SCHEMA, "update",
                                "NoTimeout")
    )


def cms_stream(stream: DataFrame, key_col: str, *, d: int = 4,
               w: int = 1024, salt: str = "cms") -> DataFrame:
    """Running Count-Min counter table over a stream. CMS counters are
    SUMS, so the streaming form needs no custom state at all — it IS a
    built-in streaming aggregation over the exploded (row, bucket)
    cells (update mode), and Spark's state store holds exactly the d·w
    counters. After any batch sequence the counters equal
    ``functions.sketches.cms_table`` of the union (sum-merge is the
    same property the batch pytest proves cell-wise).

    Probe with ``functions.sketches.cms_estimate`` against any emitted
    snapshot."""
    from pyspark.sql import functions as F

    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row_i"),
            (F.conv(F.substring(
                F.md5(F.concat_ws(":", F.lit(f"{salt}{i}"), F.col(key_col))),
                1, 12), 16, 10).cast("long") % w).alias("bucket"))
        for i in range(d)
    ])
    return (
        stream.select(F.explode(cells).alias("c"))
        .select("c.row_i", "c.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


HLL_STATE_SCHEMA = T.StructType([
    T.StructField("regs", T.ArrayType(T.IntegerType())),
])


def hll_distinct_stream(
    stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    salt: str = "hll",
) -> DataFrame:
    """Streaming HyperLogLog: per-group running distinct estimate.

    The (bucket, rho) derivation runs as JVM column exprs BEFORE the
    stateful op (functions/sketches.hll_bucket_rho — same hash as the
    batch sketch, bit-for-bit); state = the dense 256-int register
    array per group; each micro-batch folds a numpy groupby-max into
    it. Register merge is MAX — idempotent and commutative — so after
    ANY batch sequence (including crash replays) the streaming
    registers equal the batch sketch of the union; the pytest parity
    gate asserts exactly that, plus est_micro equality against
    ``hll_estimate``.

    Output per group per batch: group_cols + (n_zero, est_micro).
    """
    from ..functions.sketches import HLL_EST_CONST, _HLL_M, hll_bucket_rho

    # NULL values never reach the hash: concat_ws would collapse them to
    # md5('hll') — one phantom distinct element (the batch sketch filters
    # identically, so stream/batch register parity holds under NULLs)
    stream = stream.filter(F.col(value_col).isNotNull())
    bucket, rho = hll_bucket_rho(stream[value_col], salt)
    pre = stream.select(*group_cols, bucket.alias("_b"), rho.alias("_r"))
    out_schema = T.StructType(
        [f for f in pre.schema.fields if f.name not in ("_b", "_r")]
        + [T.StructField("n_zero", T.LongType()),
           T.StructField("est_micro", T.LongType())])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        import numpy as np

        (regs,) = state.get if state.exists else ([0] * _HLL_M,)
        regs = np.asarray(regs, dtype="int64")
        for pdf in pdfs:
            mx = pdf.groupby("_b")["_r"].max()
            idx = mx.index.to_numpy(dtype="int64")
            regs[idx] = np.maximum(regs[idx], mx.to_numpy(dtype="int64"))
        state.update((regs.astype("int32").tolist(),))
        n_zero = int((regs == 0).sum())
        # exact-integer harmonic sum, scaled by 2^57 (python ints are
        # arbitrary-precision — same value the batch DECIMAL(38,0) holds)
        z_scaled = sum(1 << (57 - int(r)) for r in regs)
        import math

        est_micro = math.floor(HLL_EST_CONST / float(z_scaled) * 1000000.0)
        row = {c: [v] for c, v in zip(group_cols, key)}
        row["n_zero"] = [n_zero]
        row["est_micro"] = [est_micro]
        yield pd.DataFrame(row)

    return (
        pre.groupBy(*group_cols)
        .applyInPandasWithState(fn, out_schema, HLL_STATE_SCHEMA, "update",
                                "NoTimeout")
    )


def hll_windowed_stream(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    salt: str = "hll",
) -> DataFrame:
    """Event-time windowed HyperLogLog registers as a PLAIN streaming
    aggregation — the uniques-per-window shape of a 100 TB metrics
    pipeline, with no custom state function at all: (bucket, rho)
    derive as JVM column exprs (same md5 family as the batch sketch,
    bit-for-bit) and the register table is just
    ``groupBy(window, bucket).agg(max(rho))`` — MAX is Spark's own
    streaming-agg merge, so state is ≤ 2^8 rows per open window,
    late data folds in until the watermark closes the window, and
    replay is idempotent by the aggregation contract (nothing bespoke
    to get wrong). ``slide=`` makes the windows SLIDING (each event
    lands in window/slide overlapping sketches — Spark's window()
    fan-out; state stays ≤ 2^8 rows per OPEN window either way).

    Output (update mode): group_cols + (window_start, window_end,
    bucket, rho). Feed a completed window's rows to
    ``functions.sketches.hll_estimate`` for the estimate — registers
    are the mergeable artifact worth persisting (estimates can't
    merge; registers can).
    """
    from ..functions.sketches import hll_bucket_rho

    group_cols = group_cols or []
    # same NULL-value discipline as hll_register_table / the keyed stream
    stream = stream.filter(F.col(value_col).isNotNull())
    bucket, rho = hll_bucket_rho(stream[value_col], salt)
    pre = (stream
           # parquet timestamps read as TIMESTAMP_NTZ; watermarks demand
           # TIMESTAMP (session tz is UTC, so the cast is a pure
           # reinterpretation — the r4c gotcha)
           .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
           .withWatermark(ts_col, watermark)
           .select(F.window(F.col(ts_col), window,
                            slide if slide else window).alias("_w"),
                   *group_cols, bucket.alias("bucket"), rho.alias("_r")))
    return (pre.groupBy("_w", *group_cols, "bucket")
            .agg(F.max("_r").alias("rho"))
            .select(F.col("_w.start").alias("window_start"),
                    F.col("_w.end").alias("window_end"),
                    *group_cols, "bucket", "rho"))
