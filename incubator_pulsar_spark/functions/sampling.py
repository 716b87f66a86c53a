"""Deterministic sampling and sequence packing for training-data
pipelines.

A 100 TB corpus run needs sampling that is (a) reproducible across
reruns and engines — no RNG, no seed-per-partition drift — and
(b) map-only wherever possible. Every sampler here derives its
randomness from md5 of the row id, the same public trick the minhash
and LSH operators use, so DuckDB replays it bit-for-bit in the
correctness gate:

- ``hash_sample``: Bernoulli(p) via md5-uniform — pure map, no shuffle.
- ``stratified_sample``: per-stratum rates (e.g. upsample low-resource
  languages, downsample crawl dumps) — still map-only; the rate lookup
  is a broadcast-free literal map.
- ``stratified_fixed``: exactly n per stratum by hash order — one
  shuffle (window per stratum); the stratum sort makes this the
  small-strata tool, rate-based sampling is the scale path.
- ``pack_sequences``: assign documents to fixed-token-budget training
  rows ("packing"): shard by hash (keeps every partition independent
  and the hot path one window per shard), order docs pseudo-randomly
  within shard, running token cumsum → bin id. Contiguous-spillover
  packing: each bin's token sum ≤ capacity + (max doc tokens − 1),
  with zero cross-shard coordination — the shape that survives 1000
  executors. (True first-fit greedy needs a sequential scan; its gain
  over spillover packing is bounded by one document per bin.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count

_U32 = 2 ** 32


def hash_uniform(id_col: Column, salt: str = "sample") -> Column:
    """Deterministic uniform in [0, 1): first 8 md5 hex chars of
    'salt:id' scaled by 2^32. Identical in DuckDB:
    conv-free via substr(md5(...), 1, 8)::int parsing."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), id_col)), 1, 8),
               16, 10).cast("long")
    return h / F.lit(float(_U32))


def hash_sample(df: DataFrame, fraction: float, *, id_col: str,
                salt: str = "sample") -> DataFrame:
    """Keep each row iff its md5-uniform < fraction — reproducible
    Bernoulli sampling, map-only (no shuffle, no RNG state)."""
    return df.filter(hash_uniform(F.col(id_col), salt) < F.lit(fraction))


def stratified_sample(df: DataFrame, rates: dict[str, float], *,
                      strata_col: str, id_col: str,
                      default_rate: float = 0.0,
                      salt: str = "sample") -> DataFrame:
    """Per-stratum Bernoulli rates (dataset mixing by sampling): a row
    in stratum s survives iff md5-uniform < rates.get(s, default).
    Map-only; the rate table is a literal CASE chain (strata counts are
    config-sized by contract)."""
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(hash_uniform(F.col(id_col), salt) < rate)


def stratified_fixed(df: DataFrame, n_per_stratum: int, *,
                     strata_col: str, id_col: str,
                     salt: str = "sample") -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by hash order
    (a deterministic 'reservoir'). One shuffle; each stratum sorts in
    one task, so use for bounded strata (languages, sources) — for
    unbounded strata use rate-based sampling instead."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_uniform(F.col(id_col), salt), F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_stratum).drop("__rn"))


def pack_sequences(df: DataFrame, capacity: int, *, id_col: str,
                   text_col: str = "text", n_shards: int = 64,
                   salt: str = "pack") -> DataFrame:
    """Pack documents into fixed-token-budget bins.

    Each doc gets (shard, bin_id, n_tokens): shard = md5(id) mod
    n_shards (so packing parallelizes with NO global sort — one window
    per shard), docs are hash-shuffled within their shard, and bin_id =
    floor(exclusive-prefix-token-sum / capacity). A doc straddling a
    boundary belongs to the bin its first token falls in, so a bin can
    exceed capacity by at most one doc's tokens — the documented
    contiguous-spillover contract.
    """
    tok = token_count(F.col(text_col))
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col))),
                           1, 8), 16, 10).cast("long"),
        F.lit(n_shards)).cast("int")
    order_key = F.md5(F.concat_ws(":", F.lit(salt + "-o"), F.col(id_col)))
    out = df.withColumn("__tok", tok).withColumn("__shard", shard)
    w = (Window.partitionBy("__shard")
         .orderBy(order_key, F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("__tok").over(w)
    return (
        out.withColumn("__bin", F.floor((cum - F.col("__tok")) / F.lit(capacity))
                       .cast("long"))
        .select(F.col(id_col), F.col("__shard").alias("shard"),
                F.col("__bin").alias("bin_id"), F.col("__tok").alias("n_tokens"))
    )


def weighted_sample_fixed(df: DataFrame, n: int, *, id_col: str,
                          weight_col: str, salt: str = "wsample") -> DataFrame:
    """Weighted sampling without replacement: top-n by the
    Efraimidis-Spirakis A-ES key (u^(1/w), computed as ln(u)/w — the
    same ordering, no pow underflow), u the deterministic md5-uniform.
    Inclusion probability is proportional to weight; reruns and other
    engines reproduce the identical sample (no RNG).

    Rows with weight ≤ 0 or NULL are excluded (zero-weight items are
    unsampleable by definition). Scale shape: map-side key computation
    + distributed top-n (TakeOrdered — no global sort materializes).
    """
    u = hash_uniform(F.col(id_col), salt)
    key = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__es_key", key)
        .orderBy(F.col("__es_key").desc(), F.col(id_col))
        .limit(n)
        .drop("__es_key")
    )
