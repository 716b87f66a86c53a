"""Pulsar-Functions runtime surface: per-record UDFs, SerDe, entry
filters, interceptors, side outputs, metrics, chunking.

Reference:
- ``Function<X,T>.process`` (``pulsar-functions/api-java/.../Function.java:34``)
  — per-record map; returning null drops the record.
- ``SerDe`` (``api-java/.../SerDe.java``) — byte ↔ object codec.
- ``EntryFilter`` (``broker/.../plugin/EntryFilter.java:23-55``) —
  broker-side ACCEPT / REJECT / RESCHEDULE per entry, applied in
  ``AbstractBaseDispatcher.filterEntriesForConsumer:125,161-173``.
- Interceptors (``ProducerInterceptor`` / ``ConsumerInterceptor``) —
  beforeSend/beforeConsume transform hooks.
- ``Context`` (``BaseContext.java:89-187``) — user config, side-topic
  publish, counters, ``recordMetric``.
- Chunking (``PulsarApi.proto:159-162`` uuid/num_chunks/chunk_id;
  ``ConsumerBuilder.maxPendingChunkedMessage:786``) — big payload split
  and consumer-side reassembly.

Spark-first: the hot path stays in JVM expressions wherever the
"function" is expressible as columns; arbitrary Python goes through
Arrow-batched ``mapInPandas`` (never row-at-a-time UDFs in the hot
path). Null-return drop == filter(isNotNull), the same contract.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from enum import Enum

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ------------------------------------------------------------ per-record fn

def apply_function(
    df: DataFrame,
    fn: Callable[[pd.Series], pd.Series],
    *,
    input_col: str = "value",
    output_col: str = "result",
    output_type: T.DataType = T.StringType(),
    drop_nulls: bool = True,
) -> DataFrame:
    """``Function<X,T>.process`` over a column: vectorized (Arrow) UDF;
    null result ⇒ record dropped (Function.java:40 contract).
    """
    pudf = F.pandas_udf(fn, returnType=output_type)
    out = df.withColumn(output_col, pudf(F.col(input_col)))
    if drop_nulls:
        out = out.filter(F.col(output_col).isNotNull())
    return out


def apply_flatmap(
    df: DataFrame,
    fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    output_schema: T.StructType,
) -> DataFrame:
    """Record → 0..N records (the flatMap shape of Function + Context.publish
    loops): ``mapInPandas`` — Arrow batches, not rows."""
    return df.mapInPandas(fn, output_schema)


def window_function(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    output_schema: T.StructType,
    *,
    group_by: list[str],
) -> DataFrame:
    """``WindowFunction<X,T>`` (WindowFunction.java:32): an arbitrary
    Python aggregation over each window pane.

    Pair with a window-id grouping column (time bucket from
    operators/windows.py or window_id from count windows): each group IS
    one pane, delivered to ``fn`` as a pandas DataFrame via Arrow. One
    shuffle on the pane key; pane contents never pass through the driver.

    NOT ``groupBy().applyInPandas``: grouped-map ships each pane as its
    OWN Arrow RecordBatch, and with the many-tiny-panes shape windowed
    UDAFs actually have (hourly × key ⇒ thousands of 3-row panes) the
    per-batch machinery dominates — measured ~3 ms/pane, 8.5 s for a
    TRIVIAL fn over 3,385 panes at sf0.01. Instead: hash-repartition on
    the pane key, sort within partitions, and stream ``mapInPandas``
    with a group-boundary carry across Arrow batches — batches stay at
    the default ~10k rows regardless of pane size (same trivial-fn run:
    0.5 s), while ``fn`` still receives exactly one pane per call.
    Memory bound is max(arrow batch + one pane) — the same largest-pane
    bound grouped-map has, NOT whole-partition.

    Pane-boundary detection must be DTYPE-EXACT: pandas' shift() on an
    int64 key upcasts to float64, where adjacent distinct keys above
    2^53 (snowflake ids, ns-resolution buckets) compare equal and two
    panes silently merge; and a double key's NULL and NaN both arrive
    as NaN, though Spark's groupBy keeps them distinct groups. Each
    key type therefore compares through a representation that stays
    exact at any magnitude, with NO float upcast in the comparison:

    - string / binary / decimal / date / bool keys arrive as exact
      Python objects; timestamps as datetime64[ns] (NaT is a
      sentinel, not a rounding) — compared directly, no extra column;
    - byte/short/int keys compare directly too: a null-bearing batch
      upcasts them to float64, but every 32-bit integer is exactly
      representable there;
    - LONG keys get two hidden JVM-side columns (key >> 32 and
      key & 0xFFFFFFFF) — each half is < 2^32, so adjacent distinct
      keys stay distinct even through the float64 null-upcast (the
      prior canonical-string column cost ~50% on the sf0.1 median
      bench row; two small ints compare as vectorized numpy);
    - float/double keys keep the hidden CANONICAL STRING column
      (NULL stays None ≠ the "NaN" string; ±0.0 pre-normalized to
      match groupBy's merge of the two zeros);
    - nested (array/map/struct) keys compare via to_json with every
      nested float field pre-normalized (-0.0 → 0.0, recursively) so
      JSON text equality matches groupBy's nested-key equality; all
      NaNs serialize as the one "NaN" token, matching groupBy's
      NaN-merge.

    The boundary mask ORs per-key-column adjacent-inequality (with
    null==null never splitting — groupBy's one-null-group rule), and
    hidden columns are stripped before ``fn`` sees the pane. The
    halves also REPAIR the pane's values: when a null-bearing batch
    upcasts a long key column to float64 (losing exactness past 2^53),
    each non-null pane's key column is rebuilt as exact int64 from its
    halves before ``fn`` sees it — same dtype grouped-map hands a
    non-null group, at any key magnitude.
    """
    from pyspark.sql import types as T

    cmp_cols: list[str] = []          # names whose positions we compare
    hidden: list[str] = []
    long_halves: list[tuple[str, str, str]] = []  # (key, hi, lo)
    aug = df

    def add_hidden(expr) -> str:
        name = f"__pane_cmp_{len(hidden)}"
        hidden.append(name)
        cmp_cols.append(name)
        nonlocal aug
        aug = aug.withColumn(name, expr)
        return name

    for c in group_by:
        dt = df.schema[c].dataType
        col = F.col(c)
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            # groupBy merges -0.0 with 0.0; == is false for NaN/null
            norm = F.when(col == 0.0, F.lit(0.0).cast(dt)).otherwise(col)
            add_hidden(norm.cast("string"))  # NaN -> "NaN", null -> None
        elif isinstance(dt, T.LongType):
            hi = add_hidden(F.shiftright(col, 32))
            lo = add_hidden(col.bitwiseAND(F.lit(0xFFFFFFFF)))
            long_halves.append((c, hi, lo))
        elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            add_hidden(F.to_json(F.struct(
                _normalize_key_floats(col, dt).alias("k"))))
        elif isinstance(dt, (T.StringType, T.BinaryType, T.BooleanType,
                             T.ByteType, T.ShortType, T.IntegerType,
                             T.DecimalType, T.DateType, T.TimestampType,
                             T.TimestampNTZType)):
            cmp_cols.append(c)        # exact in pandas as-is
        else:                         # intervals/exotics: exact string
            add_hidden(col.cast("string"))
    cmp_idx = [len(df.columns) + hidden.index(c)
               if c in hidden else df.columns.index(c)
               for c in cmp_cols]

    def apply_partition(batches):
        import numpy as np
        import pandas as pd

        carry: pd.DataFrame | None = None
        # buffer per-pane outputs and emit them as BIG return batches —
        # yielding each pane's (typically 1-row) result individually
        # would pay the same per-RecordBatch tax on the way back out
        out_buf: list[pd.DataFrame] = []
        out_rows = 0

        def run(g: pd.DataFrame) -> None:
            nonlocal out_rows
            if hidden:
                fixups = [(c, g[hi].to_numpy(), g[lo].to_numpy())
                          for c, hi, lo in long_halves
                          if g[c].dtype.kind == "f"]   # null-upcast batch
                g = g.drop(columns=hidden)
                for c, h, lo_vals in fixups:
                    if not len(h) or pd.isna(h[0]):
                        continue       # the null-key pane stays null
                    g[c] = (h.astype("int64") << 32) + \
                        lo_vals.astype("int64")
            out = fn(g.reset_index(drop=True))
            if out is not None and len(out):
                out_buf.append(out)
                out_rows += len(out)

        def drain():
            nonlocal out_rows
            if out_buf:
                merged = pd.concat(out_buf, ignore_index=True)
                out_buf.clear()
                out_rows = 0
                yield merged

        def boundaries(pdf: pd.DataFrame) -> np.ndarray:
            """Adjacent-row inequality OR-ed across the key columns on
            their NATIVE dtypes (no shift(), no astype(object) frame):
            numpy slice comparison is exact for every representation
            chosen above, and null==null never splits (groupBy's
            one-null-group rule; sort collates nulls together)."""
            neq = np.zeros(len(pdf) - 1, dtype=bool)
            for i in cmp_idx:
                a = pdf.iloc[:, i].to_numpy()
                ne = a[1:] != a[:-1]       # NaN/NaT/None-vs-value: True
                if ne.dtype != bool:
                    ne = ne.astype(bool)
                na = pd.isna(a)
                if na.any():
                    ne &= ~(na[1:] & na[:-1])
                neq |= ne
            return neq

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # pane start offsets -> contiguous iloc slices (panes are
            # sorted-adjacent, so slicing beats a pandas groupby)
            cuts = np.flatnonzero(boundaries(pdf)) + 1
            starts = np.concatenate(([0], cuts))
            # the final run may continue into the next batch — carry it
            carry = pdf.iloc[starts[-1]:]
            for j in range(len(starts) - 1):
                run(pdf.iloc[starts[j]:starts[j + 1]])
            if out_rows >= 4096:
                yield from drain()
        if carry is not None and len(carry):
            run(carry)
        yield from drain()

    return (aug.repartition(*[F.col(c) for c in group_by])
            .sortWithinPartitions(*group_by)
            .mapInPandas(apply_partition, output_schema))


def _key_has_float(dt) -> bool:
    from pyspark.sql import types as T

    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _key_has_float(dt.elementType)
    if isinstance(dt, T.MapType):
        return _key_has_float(dt.keyType) or _key_has_float(dt.valueType)
    if isinstance(dt, T.StructType):
        return any(_key_has_float(f.dataType) for f in dt.fields)
    return False


def _normalize_key_floats(col: Column, dt):
    """Rewrite every float/double inside a (possibly nested) group-key
    value with -0.0 normalized to 0.0, so the to_json comparison text
    matches Spark groupBy's float normalization for nested keys — a
    struct key containing -0.0 must land in the same pane as its +0.0
    twin (they are one group), though they serialize differently.
    NaN needs no rewrite: every NaN prints as the one "NaN" token."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return F.when(col == 0.0, F.lit(0.0).cast(dt)).otherwise(col)
    if isinstance(dt, T.ArrayType):
        if not _key_has_float(dt.elementType):
            return col
        return F.transform(
            col, lambda x: _normalize_key_floats(x, dt.elementType))
    if isinstance(dt, T.MapType):
        out = col
        if _key_has_float(dt.keyType):
            out = F.transform_keys(
                out, lambda k, v: _normalize_key_floats(k, dt.keyType))
        if _key_has_float(dt.valueType):
            out = F.transform_values(
                out, lambda k, v: _normalize_key_floats(v, dt.valueType))
        return out
    if isinstance(dt, T.StructType):
        if not any(_key_has_float(f.dataType) for f in dt.fields):
            return col
        rebuilt = F.struct(*[
            _normalize_key_floats(col[f.name], f.dataType).alias(f.name)
            for f in dt.fields])
        # struct() of extracted fields turns a NULL struct into a
        # struct of nulls — a DIFFERENT group; keep NULL null
        return F.when(col.isNull(), col).otherwise(rebuilt)
    return col


def identity_function(df: DataFrame) -> DataFrame:
    """IdentityFunction (api-java/.../utils/IdentityFunction.java) — the
    connector-glue no-op."""
    return df


# -------------------------------------------------------------------- serde

def json_serialize(col: Column) -> Column:
    """Struct → JSON bytes (SerDe.serialize)."""
    return F.to_json(col).cast("binary")


def json_deserialize(col: Column, schema: T.StructType | str) -> Column:
    """JSON bytes → struct (SerDe.deserialize)."""
    return F.from_json(col.cast("string"), schema)


# ------------------------------------------------------------- entry filter

class FilterResult(Enum):
    """EntryFilter.FilterResult (EntryFilter.java:30-49)."""
    ACCEPT = "ACCEPT"
    REJECT = "REJECT"
    RESCHEDULE = "RESCHEDULE"


@dataclass
class FilteredEntries:
    accepted: DataFrame
    rejected: DataFrame
    rescheduled: DataFrame


def entry_filter(df: DataFrame, decision: Column) -> FilteredEntries:
    """Three-way split on a decision expression evaluating to
    'ACCEPT'/'REJECT'/'RESCHEDULE' (AbstractBaseDispatcher.
    filterEntriesForConsumer:161-173). Three filters over one scan —
    Spark reuses the exchange; no shuffle introduced.

    RESCHEDULE rows are the delayed-redelivery branch: feed them to
    operators/delay.py with a backoff deliver_at.
    """
    d = decision.cast("string")
    return FilteredEntries(
        accepted=df.filter(d == FilterResult.ACCEPT.value),
        rejected=df.filter(d == FilterResult.REJECT.value),
        rescheduled=df.filter(d == FilterResult.RESCHEDULE.value),
    )


# ------------------------------------------------------------- interceptors

def intercept(df: DataFrame, *stages: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Compose beforeSend/beforeConsume hooks (ProducerInterceptor /
    ConsumerInterceptor): plain DataFrame → DataFrame stages, applied in
    order. Catalyst fuses adjacent projections, so N interceptors cost
    one projection."""
    for stage in stages:
        df = stage(df)
    return df


# ------------------------------------------------------------------ context

@dataclass
class FunctionContext:
    """The subset of ``Context`` that maps to batch/stream processing:
    user config (broadcast-style read-only dict), output-topic routing,
    and named metric expressions surfaced via ``df.observe``.

    Counters/state (BaseContext:115-187) live in the state store —
    see streaming/windows.py and streaming/dedup.py for the keyed-state
    pattern; batch counters are just aggregations.
    """

    user_config: dict[str, str] = field(default_factory=dict)
    output_topic: str | None = None
    _metrics: list[tuple[str, Column]] = field(default_factory=list)

    def get_user_config_value(self, key: str, default: str | None = None) -> str | None:
        return self.user_config.get(key, default)

    def record_metric(self, name: str, expr: Column) -> None:
        """recordMetric → accumulate observe() expressions."""
        self._metrics.append((name, expr))

    def attach_metrics(self, df: DataFrame, observation_name: str = "fn-metrics") -> DataFrame:
        if not self._metrics:
            return df
        return df.observe(observation_name,
                          *[e.alias(n) for n, e in self._metrics])


def publish_side_outputs(df: DataFrame, routes: dict[str, Column],
                         base_path: str) -> dict[str, int]:
    """Context.publish to N topics from one batch (side outputs): one
    filtered write per route. Returns rows written per topic."""
    import os

    counts = {}
    for topic, predicate in routes.items():
        out = df.filter(predicate)
        out.write.mode("append").parquet(os.path.join(base_path, topic))
        counts[topic] = out.count()
    return counts


# ----------------------------------------------------------------- chunking

def chunk_payloads(df: DataFrame, *, value_col: str = "value",
                   sequence_col: str = "sequence",
                   chunk_bytes: int = 64) -> DataFrame:
    """Producer-side chunking (proto uuid/num_chunks/chunk_id fields):
    split payloads over ``chunk_bytes`` into ordered chunk rows.

    Spark has no payload cap so this exists for wire-compat fixtures;
    explode is map-side (no shuffle).
    """
    v = F.col(value_col).cast("binary")
    n_chunks = F.ceil(F.length(v) / F.lit(chunk_bytes)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    return (
        df.withColumn("uuid", F.concat(F.lit("chunk-"), F.col(sequence_col).cast("string")))
        .withColumn("num_chunks", n_chunks)
        .withColumn("chunk_id", F.explode(idx))
        .withColumn(
            value_col,
            F.substring(v, F.col("chunk_id") * chunk_bytes + 1, chunk_bytes).cast("binary"),
        )
    )


def reassemble_chunks(df: DataFrame, *, value_col: str = "value") -> DataFrame:
    """Consumer-side reassembly: group by uuid, concat chunks in order
    (ChunkedMessageCtx semantics). One shuffle by uuid; chunks of one
    message co-locate, ``array_sort`` orders by chunk_id without a sort
    exchange."""
    pieces = F.array_agg(F.struct(F.col("chunk_id"), F.col(value_col).alias("piece")))
    ordered = F.transform(F.array_sort(pieces), lambda s: s["piece"])
    other_cols = [c for c in df.columns
                  if c not in (value_col, "chunk_id", "num_chunks", "uuid")]
    firsts = [F.min_by(F.col(c), F.col("chunk_id")).alias(c) for c in other_cols]
    return (
        df.groupBy("uuid")
        .agg(*firsts,
             F.count(F.lit(1)).alias("_got"),
             F.first("num_chunks").alias("_want"),
             ordered.alias("_pieces"))
        .filter(F.col("_got") == F.col("_want"))  # incomplete → held back
        .withColumn(value_col,
                    F.aggregate(F.col("_pieces"), F.lit(b"").cast("binary"),
                                lambda acc, p: F.concat(acc, p)))
        .drop("_got", "_want", "_pieces")
    )
