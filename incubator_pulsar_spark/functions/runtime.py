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
    as NaN, though Spark's groupBy keeps them distinct groups. So each
    key column gets a hidden JVM-side CANONICAL STRING comparison
    column (exact decimal/`Double.toString` reprs — distinct values
    stay distinct at any magnitude; NULL stays None, ≠ the "NaN"
    string; ±0.0 pre-normalized to match groupBy's merge of the two
    zeros; binary via hex, nested types via to_json). The boundary
    mask compares ONLY those object-dtype columns — no float upcast
    anywhere — and the hidden columns are stripped before ``fn`` sees
    the pane. One residual caveat: a NULLABLE int key whose batch
    contains nulls reaches pandas as float64, so the pane's VALUES
    (not the boundaries — those use the string columns) lose exactness
    past 2^53; boundaries stay correct.
    """
    from pyspark.sql import types as T

    cmp_cols: list[str] = []
    aug = df
    for i, c in enumerate(group_by):
        dt = df.schema[c].dataType
        name = f"__pane_cmp_{i}"
        col = F.col(c)
        if isinstance(dt, T.StringType):
            cmp_cols.append(c)        # already exact object dtype
            continue
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            # groupBy merges -0.0 with 0.0; == is false for NaN/null
            col = F.when(col == 0.0, F.lit(0.0).cast(dt)).otherwise(col)
            expr = col.cast("string")  # NaN -> "NaN", null -> None
        elif isinstance(dt, T.BinaryType):
            expr = F.hex(col)
        elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            expr = F.to_json(F.struct(col.alias("k")))
        else:                          # int/decimal/bool/date/timestamp
            expr = col.cast("string")
        aug = aug.withColumn(name, expr)
        cmp_cols.append(name)
    hidden = [c for c in cmp_cols if c.startswith("__pane_cmp_")]
    cmp_idx = [len(df.columns) + hidden.index(c)
               if c in hidden else df.columns.index(c)
               for c in cmp_cols]

    def apply_partition(batches):
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
                g = g.drop(columns=hidden)
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

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # object-dtype canonical strings: shift() cannot upcast, so
            # the comparison is exact at any key magnitude; None==None
            # must NOT split (groupBy treats nulls as one group, and
            # sort collates them together)
            keys = pdf.iloc[:, cmp_idx].astype(object)
            prev = keys.shift()
            neq = (keys.ne(prev) & ~(keys.isna() & prev.isna())).any(axis=1)
            gid = neq.cumsum()
            last = gid.iloc[-1]
            # the final run may continue into the next batch — carry it
            carry = pdf[gid == last]
            done = pdf[gid != last]
            if len(done):
                for _, g in done.groupby(gid[gid != last], sort=False):
                    run(g)
            if out_rows >= 4096:
                yield from drain()
        if carry is not None and len(carry):
            run(carry)
        yield from drain()

    return (aug.repartition(*[F.col(c) for c in group_by])
            .sortWithinPartitions(*group_by)
            .mapInPandas(apply_partition, output_schema))


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
