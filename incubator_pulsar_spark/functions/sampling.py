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


def mixture_rates(df: DataFrame, targets: dict[str, float], *,
                  domain_col: str, weight_col: str | None = None,
                  total: float | None = None,
                  max_epochs: float = 1.0) -> dict[str, float]:
    """Per-domain sampling/repetition rates that turn the corpus into
    the target mixture (training-mix recipes a la The Pile / DoReMi:
    "30% web, 20% code, ..." BY WEIGHT, where weight is rows or
    tokens).

    Given observed domain weights w_d (SUM(weight_col), or row counts)
    and target shares t_d, the output rate_d = t_d * S / w_d where S is
    the mixture size: the caller's ``total``, or else the largest S
    with every rate_d <= max_epochs (epoch cap — no domain repeats
    more than max_epochs times). rate_d > 1 means upsampling: the
    domain is repeated ceil(rate) times with the fractional epoch kept
    Bernoulli(frac) per row. Domains absent from ``targets`` get rate
    0 (dropped).

    Scale shape: ONE aggregate over the corpus collects #domains rows
    to the driver (domains are config-sized by contract — languages /
    sources / crawl snapshots); everything downstream is map-only.
    """
    wcol = F.col(weight_col).cast("double") if weight_col \
        else F.lit(1.0)
    stats = {r["d"]: r["w"] for r in
             df.groupBy(F.col(domain_col).alias("d"))
               .agg(F.sum(wcol).alias("w")).collect()}
    missing = [d for d in targets if d not in stats or not stats[d]]
    if missing:
        raise ValueError(f"target domains absent from corpus: {missing}")
    if total is not None:
        s = float(total)
    else:
        s = min(max_epochs * stats[d] / targets[d]
                for d in targets if targets[d] > 0)
    return {d: targets[d] * s / stats[d] for d in targets}


def mixture_sample(df: DataFrame, targets: dict[str, float], *,
                   domain_col: str, id_col: str,
                   weight_col: str | None = None,
                   total: float | None = None, max_epochs: float = 1.0,
                   salt: str = "mix") -> DataFrame:
    """Materialize the target mixture: each row appears ``epoch`` times
    where E[epochs] = rate_d from :func:`mixture_rates` — floor(rate)
    guaranteed copies plus one more iff md5-uniform < frac(rate). Rows
    gain an ``epoch`` column (1-based); downsampled domains (rate < 1)
    keep a Bernoulli subset, upsampled ones (rate > 1, low-resource
    languages) genuinely repeat — the epoch column lets the training
    writer interleave repeats instead of emitting them back-to-back.

    Map-only after the one rate-computing aggregate: the rate lookup is
    a literal CASE chain, copies come from an explode of a bounded
    sequence (<= ceil(max_epochs)), nothing shuffles. Deterministic:
    reruns and other engines reproduce the identical multiset.
    """
    rates = mixture_rates(df, targets, domain_col=domain_col,
                          weight_col=weight_col, total=total,
                          max_epochs=max_epochs)
    return mixture_apply(df, rates, domain_col=domain_col, id_col=id_col,
                         salt=salt)


def mixture_apply(df: DataFrame, rates: dict[str, float], *,
                  domain_col: str, id_col: str,
                  salt: str = "mix") -> DataFrame:
    """Apply FROZEN per-domain rates (from :func:`mixture_rates` on a
    reference corpus) — pure map-only column expressions, so this also
    works on a STREAMING DataFrame: compute rates from yesterday's
    corpus stats in batch, then mix the live stream with them."""
    rate = F.lit(0.0)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(domain_col) == k, F.lit(float(v))).otherwise(rate)
    u = hash_uniform(F.col(id_col), salt)
    n_copies = (F.floor(rate).cast("long")
                + (u < rate - F.floor(rate)).cast("long"))
    return (df.withColumn("__n", n_copies)
            .filter(F.col("__n") >= 1)
            .withColumn("epoch",
                        F.explode(F.sequence(F.lit(1),
                                             F.col("__n").cast("int"))))
            .drop("__n"))


def token_budget_select(df: DataFrame, budget: int, *, quality_col: str,
                        token_col: str, id_col: str,
                        domain_col: str | None = None,
                        n_buckets: int = 1024,
                        salt: str = "budget") -> DataFrame:
    """Select the highest-quality documents until the token budget is
    spent (per domain if ``domain_col`` given): rank by (quality DESC,
    md5 tiebreak) and keep every row whose inclusive running token sum
    is <= budget — a pure prefix cut, the "take the best N tokens"
    selection every curated-pretraining recipe ends with.

    The naive form is one window over the whole domain — a single task
    sorting the domain's entire corpus, dead at 100 TB. This runs
    two-phase instead: (1) one aggregate builds a (domain, quality-
    bucket) token histogram (<= domains x n_buckets rows to the
    driver), from which the boundary bucket b* and the tokens already
    consumed by strictly-better buckets are computed; (2) rows in
    buckets above b* are kept outright MAP-SIDE (broadcast of the tiny
    per-domain plan), rows below dropped map-side, and only the
    boundary bucket — ~1/n_buckets of the data — pays the exact
    (quality DESC, md5) window. Output is identical to the naive
    window because bucketing is monotone in quality.

    NULL quality rows are excluded (unrankable). Ties in quality are
    totally ordered by md5(salt:id) then id, so the cut is
    deterministic and engine-independent.
    """
    dom = F.col(domain_col).cast("string") if domain_col \
        else F.lit("__all__")
    q = F.col(quality_col).cast("double")
    base = (df.filter(q.isNotNull())
            .withColumn("__dom", dom)
            .withColumn("__q", q)
            .withColumn("__tok", F.col(token_col).cast("long")))
    mm = base.groupBy("__dom").agg(F.min("__q").alias("lo"),
                                   F.max("__q").alias("hi"))
    rng = {r["__dom"]: (r["lo"], r["hi"]) for r in mm.collect()}
    lo = F.lit(0.0)
    span = F.lit(1.0)
    for d, (l, h) in sorted(rng.items()):
        lo = F.when(F.col("__dom") == d, F.lit(float(l))).otherwise(lo)
        span = F.when(F.col("__dom") == d,
                      F.lit(float(h - l) if h > l else 1.0)).otherwise(span)
    bucket = F.least(
        F.floor((F.col("__q") - lo) / span * n_buckets).cast("int"),
        F.lit(n_buckets - 1))
    base = base.withColumn("__bkt", bucket)
    hist = (base.groupBy("__dom", "__bkt")
            .agg(F.sum("__tok").alias("t")).collect())
    per_dom: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        per_dom.setdefault(r["__dom"], []).append((r["__bkt"], r["t"]))
    plan: list[tuple[str, int, int]] = []  # (dom, b_star, offset)
    for d, rows in per_dom.items():
        cum = 0
        b_star, offset = -1, 0
        for b, t in sorted(rows, reverse=True):
            if cum + t > budget:
                b_star, offset = b, cum
                break
            cum += t
        plan.append((d, b_star, offset))
    spark = df.sparkSession
    plan_df = F.broadcast(spark.createDataFrame(
        plan, "__dom_p string, b_star int, offset long"))
    joined = base.join(plan_df, base["__dom"] == plan_df["__dom_p"], "left")
    keep_cols = [F.col(c) for c in df.columns] + \
        [F.col("__dom"), F.col("__q"), F.col("__tok")]
    full_keep = joined.filter(
        F.col("b_star").isNull() | (F.col("__bkt") > F.col("b_star"))
    ).select(*keep_cols)
    order_key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col)))
    w = (Window.partitionBy("__dom")
         .orderBy(F.col("__q").desc(), order_key, F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    boundary = (joined.filter(F.col("__bkt") == F.col("b_star"))
                .select(*keep_cols, F.col("offset"))
                .withColumn("__cum", F.col("offset") + F.sum("__tok").over(w))
                .filter(F.col("__cum") <= budget)
                .drop("offset", "__cum"))
    out = full_keep.unionByName(boundary)
    out = out.select(*[F.col(c) for c in df.columns],
                     F.col("__tok").alias("n_tokens_sel"))
    return out


def shuffle_shards(df: DataFrame, n_shards: int, *, id_col: str,
                   salt: str = "shuffle") -> DataFrame:
    """Deterministic global shuffle into training shards: shard =
    md5(salt:id) mod n_shards, position = rank of the full md5 within
    the shard. The standard pre-training "global shuffle" without a
    global sort: one hash-partition shuffle, a per-shard local sort,
    every shard an independent task — the only shape that survives
    100 TB (a true ORDER BY rand() is a single total-order sort AND
    nondeterministic on retry; this is neither).

    Adds (shard int, pos long). Writers should
    ``repartition(n_shards, shard).sortWithinPartitions(...)`` — see
    :func:`write_shuffle_shards`.
    """
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col)))
    shard = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                   F.lit(n_shards)).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (df.withColumn("__h", h).withColumn("shard", shard)
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("__h"))


def write_shuffle_shards(df: DataFrame, path: str, n_shards: int, *,
                         id_col: str, salt: str = "shuffle") -> None:
    """Write the shuffled corpus as one parquet dir per shard
    (shard=K subdirs), rows within a shard in their pseudo-random
    order. Exactly one output task per shard (repartition on the shard
    key), so file counts stay bounded and replays are byte-stable."""
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col)))
    shard = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"),
                   F.lit(n_shards)).cast("int")
    # shard leads the sort so the writer's required partition-column
    # ordering is already satisfied — otherwise FileFormatWriter
    # inserts its own (unstable) sort by `shard` and destroys the
    # pseudo-random __h order inside each file.
    (df.withColumn("shard", shard).withColumn("__h", h)
     .repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "__h", id_col)
     .drop("__h")
     .write.mode("overwrite").partitionBy("shard").parquet(path))


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
