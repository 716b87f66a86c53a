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


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries → distinct candidate keys.

    Each partition keeps at most ``k`` counters (Misra & Gries, "Finding
    repeated elements", Sci. Comput. Program. 1982); when a batch merge
    overflows the budget, the (k+1)-th largest count is subtracted from
    every counter and non-positive ones are dropped (the mergeable-
    summaries combine step of Agarwal et al., PODS 2012). Guarantee:
    any key whose PARTITION count exceeds n_p/(k+1) survives that
    partition's summary, so — by pigeonhole over partitions — any key
    with GLOBAL count > N/(k+1) appears in the union of candidates.

    At 100 TB this is the point: the shuffle carries ≤ partitions·k
    candidate keys instead of every distinct key the partial-agg
    hashmaps spill (frequent-term mining over a 10⁹-word vocabulary
    moves kilobytes, not the vocabulary).
    """
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts(dropna=True).items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > k:
                # subtract the (k+1)-th largest count, keep positives
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {c: n - cut for c, n in counters.items() if n > cut}
        yield pd.DataFrame({key_col: list(counters.keys())})

    field = next(f for f in df.schema.fields if f.name == key_col)
    out = df.select(key_col).mapInPandas(
        summarize, f"{key_col} {field.dataType.simpleString()}")
    return out.dropDuplicates([key_col])


def heavy_hitters(df: DataFrame, key_col: str, *, phi_num: int, phi_den: int,
                  k: int | None = None) -> DataFrame:
    """EXACT heavy hitters (count ≥ N·phi_num/phi_den) in two passes.

    Pass 1: Misra-Gries candidates (superset of every true heavy hitter
    when k ≥ phi_den/phi_num − 1; see misra_gries_candidates). Pass 2:
    broadcast-semi-join the fact to the candidate set and exact-count
    ONLY candidates — the MG summary's order-dependence cannot leak
    into the output because every candidate is re-counted exactly and
    the threshold test uses integer arithmetic (cnt·phi_den ≥ N·phi_num,
    no float rounding on either engine).

    Output: key_col, cnt (exact), share = round(cnt/N, 6).
    """
    if k is None:
        k = max(1, (phi_den + phi_num - 1) // phi_num)
    cands = misra_gries_candidates(df, key_col, k)
    total = df.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    counted = (
        df.join(F.broadcast(cands), key_col)
        .groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * phi_den >= F.col("_n") * phi_num)
        .select(key_col, F.col("cnt").cast("long").alias("cnt"),
                F.round(F.col("cnt") / F.col("_n"), 6).alias("share"))
    )


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


def _id_order_key(df: DataFrame, id_col: str):
    """Total-order key over ``id_col`` for (u, id) tie-breaks: the id
    itself when integral; otherwise a 60-bit md5-derived long (same
    portable construction as ``kmv_uniform``, different salt so it is
    independent of u). Distinct non-integral ids collide only if both
    the 48-bit u AND this 60-bit key collide (~2^-108) — order stays
    effectively total and identical on any engine that replays md5."""
    from pyspark.sql.types import IntegralType

    c = df.schema[id_col].dataType
    if isinstance(c, IntegralType):
        return F.col(id_col).cast("long")
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit("tb"), F.col(id_col))),
                    1, 15), 16, 10).cast("long")


def sample_quantiles(df: DataFrame, group_cols: list[str], value_col: str,
                     id_col: str, *, k: int = 512,
                     probs: tuple[float, ...] = (0.5, 0.9, 0.99),
                     salt: str = "qsk") -> DataFrame:
    """Per-group quantile ESTIMATES from a mergeable bottom-k uniform
    sample — the fixed-state companion to ``quantiles.exact_quantiles``
    (which must shuffle every value): each row gets a deterministic
    md5 uniform keyed on its unique ``id_col``; the k smallest-u rows
    per group are a uniform without-replacement sample of size k, and
    bottom-k-by-u is mergeable the same way KMV is (the global bottom-k
    of a union is the bottom-k of the parts' bottom-ks).

    Phase 1 (mapInPandas): each partition reduces to its k smallest
    (u, id) rows per group — the shuffle carries ≤ partitions·k rows
    per group, never the full multiset. Phase 2: global bottom-k by
    window rank, then the type-1 sample quantile (value at rank
    ⌈p·m⌉) per requested p.

    Exactly as with ``kmv_distinct``, the oracle computes the GLOBAL
    bottom-k directly in SQL; equality under the exact-value gate IS
    the mergeability proof. All tie-breaks are total orders shared by
    both engines: (u, id) for sample membership, plain value for rank
    selection (equal values yield the same selected value regardless
    of order within the tie).

    Output: group_cols + (sample_n, est_q<p> per prob). Groups smaller
    than k are sampled in full, so their estimates are exact.

    ``id_col`` may be any type: integral ids are used directly as the
    (u, id) tie-break; non-integral ids (string doc ids, …) are mapped
    through a 60-bit md5 hash so the order stays total and engine-
    portable — a plain cast("long") would silently turn them into
    NULL/NaN and break the lexsort contract.
    """
    import numpy as np

    pre = df.select(
        *group_cols, F.col(value_col).alias("_v"),
        kmv_uniform(F.col(id_col), salt).alias("_u"),
        _id_order_key(df, id_col).alias("_id"))
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pre.schema.fields)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[tuple, pd.DataFrame] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                pool = sub if key not in state else pd.concat(
                    [state[key], sub], ignore_index=True)
                order = np.lexsort((pool["_id"].to_numpy(),
                                    pool["_u"].to_numpy()))
                state[key] = pool.iloc[order[:k]]
        if state:
            yield pd.concat(state.values(), ignore_index=True)

    red = pre.mapInPandas(partial, out_fields)
    w = Window.partitionBy(*group_cols).orderBy("_u", "_id")
    kept = red.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    wv = Window.partitionBy(*group_cols).orderBy("_v", "_id")
    wm = Window.partitionBy(*group_cols)
    ranked = (kept.withColumn("_vr", F.row_number().over(wv))
              .withColumn("_m", F.count(F.lit(1)).over(wm)))
    aggs = [F.max("_m").cast("long").alias("sample_n")]
    for p in probs:
        rank = F.greatest(F.ceil(F.lit(p) * F.col("_m")), F.lit(1))
        aggs.append(F.max(F.when(F.col("_vr") == rank, F.col("_v")))
                    .alias(f"est_q{int(p * 100)}"))
    return ranked.groupBy(*group_cols).agg(*aggs)


def cms_table(df: DataFrame, key_col: str, *, d: int = 4, w: int = 1024,
              salt: str = "cms") -> DataFrame:
    """Count-Min sketch counter table: d hash rows × w buckets of
    COUNTs — fixed d·w integers no matter how many keys flow through
    (point-frequency estimation where an exact per-key count table
    would grow with the key domain).

    Pure column algebra: each record explodes to its d (row, bucket)
    cells (md5-derived buckets, engine-portable like every hash in this
    module), then ONE keyed agg builds the counters — partial
    aggregation bounds the shuffle at partitions·d·w rows. Counters
    are sums, so sketches merge by addition (unions/windows for free).

    Output: (row_i, bucket, cnt).
    """
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row_i"),
            (F.conv(F.substring(
                F.md5(F.concat_ws(":", F.lit(f"{salt}{i}"), F.col(key_col))),
                1, 12), 16, 10).cast("long") % w).alias("bucket"))
        for i in range(d)
    ])
    return (
        df.select(F.explode(cells).alias("c"))
        .select("c.row_i", "c.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(probes: DataFrame, counters: DataFrame, key_col: str, *,
                 d: int = 4, w: int = 1024, salt: str = "cms") -> DataFrame:
    """Point-frequency estimates for a probe set: min over the d
    counter cells each probe hashes to (the CMS guarantee: estimate ≥
    true count, over-counting bounded by collisions ~N/w per row).
    Missing cells read as 0. Output: (key, cms_estimate)."""
    p = probes.select(F.col(key_col).alias("_k")).distinct()
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row_i"),
            (F.conv(F.substring(
                F.md5(F.concat_ws(":", F.lit(f"{salt}{i}"), F.col("_k"))),
                1, 12), 16, 10).cast("long") % w).alias("bucket"))
        for i in range(d)
    ])
    exploded = p.select("_k", F.explode(cells).alias("c")) \
        .select("_k", "c.row_i", "c.bucket")
    joined = exploded.join(F.broadcast(counters), ["row_i", "bucket"], "left")
    return (
        joined.groupBy("_k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long")
             .alias("cms_estimate"))
        .select(F.col("_k").alias(key_col), "cms_estimate")
    )


# --------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007): the industry-standard mergeable
# distinct sketch — fixed 2^p registers per group regardless of
# cardinality (vs KMV's k hashes). Register update is a map-side
# combinable MAX, so the shuffle carries ≤ partitions · 2^p rows per
# group and merging sketches IS the same MAX — the property that makes
# it work across 1000 executors and across micro-batches.
#
# Determinism discipline (the oracle gate runs this bit-for-bit in
# DuckDB): the hash is md5 (64 bits used), rho comes from the binary
# STRING length of the 56-bit suffix (both engines' bin() render
# minimal binary — no float log2), and the harmonic sum is kept as an
# exact integer, scaled by 2^57 into DECIMAL(38,0):
#   Z_scaled = Σ_buckets 2^(57 − M_b)   (M_b = 0 for an empty bucket)
# The raw estimate α·m²/Z = HLL_EST_CONST / Z_scaled needs exactly one
# float division, identical IEEE on both engines. The small-range
# (linear-counting) correction needs ln(), which is NOT bit-portable
# across libm implementations — it lives behind ``corrected=True`` and
# is accuracy-tested in pytest instead of the exact oracle.

_HLL_P = 8          # 256 registers; bucket = low 2 hex chars (nibble-aligned)
_HLL_M = 1 << _HLL_P
# α_m · m² · 2^57 for m=256, precomputed so both engines inline the SAME
# double literal: 0.7213/(1+1.079/256) · 65536 · 2^57
HLL_EST_CONST = 6.783892839851034e+21


def hll_bucket_rho(col, salt: str = "hll") -> tuple[Column, Column]:
    """(bucket, rho) for one value: bucket = low 8 bits of the 64-bit
    md5 prefix, rho = 1 + leading zeros of the remaining 56 bits
    (all-zero suffix → 57). Pure column exprs."""
    h = F.md5(F.concat_ws(":", F.lit(salt), col))
    bucket = F.conv(F.substring(h, 15, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 1, 14), 16, 10).cast("long")
    rho = (F.when(w == 0, F.lit(57))
           .otherwise(F.lit(57) - F.length(F.bin(w)))).cast("int")
    return bucket, rho


def hll_register_table(df: DataFrame, value_col: str, *,
                       group_cols: list[str] | None = None,
                       salt: str = "hll") -> DataFrame:
    """Dense register table: (group_cols..., bucket, rho) with ALL 2^p
    buckets present per group (empty buckets at rho=0 — the estimator
    needs them in the harmonic sum). One map-side-combinable MAX agg;
    the zero-fill joins a 256-row range per group.

    Group values must be non-NULL: the zero-fill join is a plain
    equality join, so a NULL group would silently zero its registers —
    NULL-group rows are dropped here (filter upstream or coalesce a
    sentinel if NULL is a real group). NULL *values* are likewise
    dropped before hashing — concat_ws would silently collapse them to
    md5('hll') (one phantom distinct element), diverging from
    countDistinct / approx_count_distinct / the DuckDB oracle, all of
    which ignore NULLs."""
    group_cols = group_cols or []
    for g in group_cols:
        df = df.filter(F.col(g).isNotNull())
    df = df.filter(F.col(value_col).isNotNull())
    bucket, rho = hll_bucket_rho(F.col(value_col), salt)
    regs = (df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
            .groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho")))
    buckets = df.sparkSession.range(_HLL_M).select(
        F.col("id").cast("int").alias("bucket"))
    if group_cols:
        full = df.select(*group_cols).distinct().crossJoin(F.broadcast(buckets))
    else:
        full = buckets
    return (full.join(regs, on=[*group_cols, "bucket"], how="left")
            .select(*group_cols, "bucket",
                    F.coalesce(F.col("rho"), F.lit(0)).cast("int").alias("rho")))


def hll_estimate(registers: DataFrame, *,
                 group_cols: list[str] | None = None) -> DataFrame:
    """Raw HLL estimate from a dense register table. Output:
    group_cols + (n_zero, z_scaled DOUBLE, est_micro BIGINT) where
    est_micro = floor(raw_estimate · 1e6) — integer-rendered so the
    value hash is portable (floor, never round: HALF modes differ
    across engines)."""
    group_cols = group_cols or []
    term = F.call_function(
        "shiftleft", F.lit(1).cast("long"),
        F.lit(57) - F.col("rho")).cast("decimal(38,0)")
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).cast("long")
        .alias("n_zero"),
        F.sum(term).alias("_z"))
    return agg.select(
        *group_cols, "n_zero",
        F.col("_z").cast("double").alias("z_scaled"),
        F.floor(F.lit(HLL_EST_CONST) / F.col("_z").cast("double")
                * F.lit(1000000.0)).cast("long").alias("est_micro"))


def hll_distinct(df: DataFrame, value_col: str, *,
                 group_cols: list[str] | None = None, salt: str = "hll",
                 corrected: bool = False) -> DataFrame:
    """Distinct-count estimate: register table → raw estimate. With
    ``corrected=True`` the standard small-range fix applies (linear
    counting m·ln(m/V) when est ≤ 2.5m and empty buckets exist) —
    ln() is libm-specific, so this form is pytest-accuracy-gated,
    not oracle-gated."""
    regs = hll_register_table(df, value_col, group_cols=group_cols, salt=salt)
    est = hll_estimate(regs, group_cols=group_cols)
    if not corrected:
        return est
    raw = F.col("est_micro") / F.lit(1000000.0)
    lc = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("n_zero"))
    return est.withColumn(
        "estimate",
        F.when((raw <= F.lit(2.5 * _HLL_M)) & (F.col("n_zero") > 0), lc)
        .otherwise(raw))


def hll_union(regs_a: DataFrame, regs_b: DataFrame, *,
              group_cols: list[str] | None = None) -> DataFrame:
    """Union of two HLL sketches = element-wise register MAX — the
    algebra that makes HLL the distributed-counting workhorse: sketches
    built on different machines / days / tables merge losslessly into
    the sketch of the union (|A∪B| comes for free; with
    inclusion–exclusion, |A∩B| ≈ est(A) + est(B) − est(A∪B) — an
    ESTIMATE whose error compounds, kept honest by the gate's exact
    comparison column). Inputs are dense register tables
    (``hll_register_table``); output is the same shape."""
    group_cols = group_cols or []
    a = regs_a.select(*group_cols, "bucket", F.col("rho").alias("_ra"))
    b = regs_b.select(*group_cols, "bucket", F.col("rho").alias("_rb"))
    return (a.join(b, on=[*group_cols, "bucket"], how="full")
            .select(*group_cols, "bucket",
                    F.greatest(F.coalesce(F.col("_ra"), F.lit(0)),
                               F.coalesce(F.col("_rb"), F.lit(0)))
                    .cast("int").alias("rho")))
