"""Exact per-group quantiles, gate-able cross-engine.

``approx_percentile`` (Spark) and ``quantile_cont`` (DuckDB) disagree by
construction — different sketches / interpolation rules — so neither can
sit under a value-hash gate. This module computes DISCRETE quantiles
(percentile_disc semantics) with pure integer rank math that any engine
replays bit-for-bit: the q-quantile of n ordered values is the value at
rank ceil(n·num/den), computed as floor((n·num + den − 1)/den) — no
float in the rank, no interpolation between values, output values are
untouched input values.

Two implementations, same output by construction:

- ``exact_quantiles``: one window per group (row_number + count over the
  group partition — ONE shuffle). The group's values are sorted in one
  partition: right up to ~10⁸ rows per group, and the 100 TB shape when
  groups are plentiful (per-group data ≪ executor memory).
- ``exact_quantiles_bucketed``: the giant-group path. Pass 1 buckets
  values by a coarse deterministic key and aggregates counts (map-side
  partial agg, tiny result); the driver walks the cumulative histogram
  to find each target rank's bucket; pass 2 sorts ONLY the rows of the
  needed buckets (filter pushed to the scan) and picks the in-bucket
  rank. Nothing ever globally sorts: the full sort is replaced by a
  |buckets|-row aggregate plus a sort of n/|buckets| rows. This is the
  classic two-pass selection refinement (Munro-Paterson style pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank_target(n_col, num: int, den: int):
    # ceil(n*num/den) in pure integer math
    return F.floor((n_col * num + den - 1) / den).cast("long")


def exact_quantiles(
    df: DataFrame, group_cols: list[str], value_col: str,
    qs: list[tuple[int, int, str]],
) -> DataFrame:
    """Per-group discrete quantiles; ``qs`` = [(num, den, alias), ...]
    e.g. [(1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99")].

    Output: group_cols + (n BIGINT) + one column per alias, each an
    untouched value from the group (deterministic even under value
    ties — position k of the sorted multiset is a fixed value).

    NULL values are ignored (SQL percentile semantics — DuckDB's
    quantile_disc and Spark's percentile both skip NULLs); without the
    filter NULLs would sort first under row_number and shift every
    rank position. ``n`` is therefore the NON-NULL count, and an
    all-NULL group disappears from the output.
    """
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wn = Window.partitionBy(*group_cols)
    ranked = df.select(*group_cols, value_col) \
        .filter(F.col(value_col).isNotNull()) \
        .withColumn("_rn", F.row_number().over(w)) \
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    aggs = [F.max("_n").cast("long").alias("n")]
    for num, den, alias in qs:
        aggs.append(
            F.max(F.when(F.col("_rn") == _rank_target(F.col("_n"), num, den),
                         F.col(value_col))).alias(alias))
    return ranked.groupBy(*group_cols).agg(*aggs)


def exact_quantiles_bucketed(
    df: DataFrame, group_cols: list[str], value_col: str,
    qs: list[tuple[int, int, str]], *, n_buckets: int = 1024,
    lo: float, hi: float,
) -> DataFrame:
    """Giant-group variant: identical output to ``exact_quantiles``
    without ever sorting a whole group.

    ``lo``/``hi`` bound the value domain (rows outside are clamped into
    the edge buckets, which stays exact — bucketing only PRUNES, the
    in-bucket selection reads true values). The histogram collect is
    bounded at |groups|·n_buckets rows of counts.
    """
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - lo) / width))
    ).cast("int")
    based = df.select(*group_cols, F.col(value_col), bucket.alias("_b"))
    hist = (based.groupBy(*group_cols, "_b")
            .agg(F.count(F.lit(1)).alias("_c"))
            .collect())

    # driver-side: cumulative walk per group → (group, q) → bucket + rank
    from collections import defaultdict

    counts: dict = defaultdict(dict)
    for r in hist:
        g = tuple(r[c] for c in group_cols)
        counts[g][r["_b"]] = r["_c"]
    needed: dict = defaultdict(list)  # (group, bucket) -> [(alias, in-bucket rank)]
    totals: dict = {}
    for g, bs in counts.items():
        n = sum(bs.values())
        totals[g] = n
        for num, den, alias in qs:
            target = (n * num + den - 1) // den
            cum = 0
            for b in sorted(bs):
                if cum + bs[b] >= target:
                    needed[(g, b)].append((alias, target - cum))
                    break
                cum += bs[b]

    spark = df.sparkSession
    need_rows = [(*g, b, alias, rank)
                 for (g, b), specs in needed.items()
                 for alias, rank in specs]
    schema = ", ".join(
        [f"{c} {t.dataType.simpleString()}"
         for c, t in zip(group_cols,
                         [f for f in based.schema.fields
                          if f.name in group_cols])]
        + ["_b int", "_alias string", "_target long"])
    need_df = spark.createDataFrame(need_rows, schema)

    # pass 2: sort ONLY the rows of needed (group, bucket) pairs
    w = Window.partitionBy(*group_cols, "_b").orderBy(value_col)
    picked = (
        based.join(F.broadcast(need_df.select(*group_cols, "_b").distinct()),
                   [*group_cols, "_b"])
        .withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(need_df),
              [*group_cols, "_b"], "inner")
        .filter(F.col("_rn") == F.col("_target"))
        .select(*group_cols, "_alias", F.col(value_col).alias("_v"))
    )
    out = picked.groupBy(*group_cols).pivot(
        "_alias", [alias for _, _, alias in qs]).agg(F.first("_v"))
    n_df = spark.createDataFrame(
        [(*g, n) for g, n in totals.items()],
        ", ".join([f.split(" ")[0] + " " + f.split(" ")[1]
                   for f in schema.split(", ")[:len(group_cols)]]
                  + ["n long"]))
    return out.join(F.broadcast(n_df), group_cols) \
        .select(*group_cols, "n", *[a for _, _, a in qs])


def mad_outliers(df: DataFrame, group_cols: list[str], value_col: str, *,
                 k_num: int = 3, k_den: int = 1) -> DataFrame:
    """Robust per-group outlier detection: median absolute deviation.

    Outlier ⇔ |x − median| · k_den > MAD · k_num (the robust z-score
    test with the default k = 3; the rational k and the
    multiply-instead-of-divide form keep the comparison exact —
    MAD = 0 groups flag every off-median value, the standard MAD
    degeneracy, rather than dividing by zero).

    Both medians are TYPE-1 discrete quantiles (``exact_quantiles``
    rank math — position ⌈n/2⌉ of the sorted multiset), so every
    intermediate is an untouched data value or an exact IEEE
    difference: the whole test is value-hash portable, unlike
    mean/σ z-scores (float-fold order). Two window passes + one
    aggregate; the deviations never leave the executors.

    Output: group_cols + (n, median_value, mad, n_outliers).

    NULL values are dropped up front (same semantics as
    ``exact_quantiles``): a NULL can be neither the median nor an
    outlier, so ``n`` is the non-NULL count.
    """
    df = df.filter(F.col(value_col).isNotNull())
    med = exact_quantiles(df, group_cols, value_col,
                          [(1, 2, "median_value")])
    dev = (df.join(med.select(*group_cols, "median_value"), on=group_cols)
           .withColumn("_dev", F.abs(F.col(value_col)
                                     - F.col("median_value"))))
    mad = exact_quantiles(dev, group_cols, "_dev", [(1, 2, "mad")]) \
        .select(*group_cols, "mad")
    flagged = dev.join(mad, on=group_cols)
    return (flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("median_value").alias("median_value"),
        F.max("mad").alias("mad"),
        F.sum(F.when(F.col("_dev") * k_den > F.col("mad") * k_num, 1)
              .otherwise(0)).cast("long").alias("n_outliers")))


def winsorize(df: DataFrame, group_cols: list[str], value_col: str, *,
              lo: tuple[int, int] = (1, 100), hi: tuple[int, int] = (99, 100),
              out_col: str | None = None) -> DataFrame:
    """Per-group winsorization: clamp values outside the [lo, hi]
    type-1 quantile band to the band edges — the standard robust
    pre-normalization step (cap reward/score/latency outliers before
    training statistics), exact by the same rank-math discipline as
    ``exact_quantiles`` (the clamp bounds are untouched data values,
    so the output is value-hash portable).

    Returns the input rows + ``{value_col}_w`` (or ``out_col``) with
    the clamped value and a ``_clamped`` flag. One window pass for the
    bounds + one broadcast-friendly join.

    NULL values pass through unchanged (``_clamped`` = false): without
    the guard F.greatest/F.least skip NULL operands, which would
    FABRICATE ``_qlo`` as the output for a NULL input — a winsorizer
    must never invent data. The band itself is computed over non-NULL
    values only (``exact_quantiles`` semantics).
    """
    out_col = out_col or f"{value_col}_w"
    bounds = exact_quantiles(
        df, group_cols, value_col,
        [(lo[0], lo[1], "_qlo"), (hi[0], hi[1], "_qhi")]) \
        .select(*group_cols, "_qlo", "_qhi")
    v = F.col(value_col)
    clamped = F.when(v.isNull(), v) \
        .otherwise(F.least(F.greatest(v, F.col("_qlo")), F.col("_qhi")))
    # left join: a group whose values are ALL NULL has no bounds row —
    # its rows still pass through (F.least/greatest skip NULL bounds)
    return (df.join(bounds, on=group_cols, how="left")
            .withColumn(out_col, clamped)
            .withColumn("_clamped",
                        F.when(v.isNull(), F.lit(False))
                        .otherwise(v != clamped))
            .drop("_qlo", "_qhi"))


def spearman(df: DataFrame, group_cols: list[str], x_col: str, y_col: str,
             *, tiebreak_col: str | None = None) -> DataFrame:
    """Per-group Spearman rank correlation — the monotone-association
    signal robust to outliers and nonlinearity (Pearson needs float
    moment folds that can never sit under a value-hash gate; rank math
    can).

    Deterministic-rank variant: both variables rank by row_number over
    (value, tiebreak) — EXACT integer ranks, so

        rho = 1 − 6·Σd² / (n·(n²−1)),   d = rank_x − rank_y

    is a ratio of exact BIGINTs, rounded once to 6 decimals. (The
    textbook tie handling assigns AVERAGE ranks — fractional and
    fold-order-ambiguous; under heavy ties prefer the windowed
    mid-rank off-gate. With a unique tiebreak the two agree whenever
    values are distinct.) Rows where either value is NULL are dropped
    (rank semantics); single-row groups emit rho NULL (the n(n²−1)=0
    degeneracy).

    One shuffle: both rank windows share the group partition. Output:
    group_cols + (n, sum_d2, rho).
    """
    tie = [F.col(tiebreak_col)] if tiebreak_col else []
    base = df.select(*group_cols, x_col, y_col,
                     *([tiebreak_col] if tiebreak_col else [])) \
        .filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    wx = Window.partitionBy(*group_cols).orderBy(F.col(x_col), *tie)
    wy = Window.partitionBy(*group_cols).orderBy(F.col(y_col), *tie)
    ranked = base.select(
        *group_cols,
        F.row_number().over(wx).cast("long").alias("_rx"),
        F.row_number().over(wy).cast("long").alias("_ry"))
    d2 = (F.col("_rx") - F.col("_ry")) * (F.col("_rx") - F.col("_ry"))
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d2).cast("long").alias("sum_d2"))
    den = F.col("n") * (F.col("n") * F.col("n") - 1)
    return agg.select(
        *group_cols, "n", "sum_d2",
        F.when(den > 0,
               F.round(1.0 - (6.0 * F.col("sum_d2")) / den, 6))
        .alias("rho"))


def ntile_histogram(df: DataFrame, group_cols: list[str], value_col: str,
                    *, buckets: int = 10,
                    tiebreak_col: str | None = None) -> DataFrame:
    """Per-group equi-depth histogram via NTILE — the rank-math
    histogram whose bucket boundaries are DATA VALUES (equi-WIDTH
    histograms need a domain guess; equi-depth adapts to the
    distribution, the form optimizers and drift monitors want).

    NTILE(b) over (value, tiebreak) splits each group into b
    near-equal runs (first ``n mod b`` buckets one row larger — the
    ANSI rule both engines implement identically), then one aggregate
    per (group, bucket) reports count + [lo, hi] — every output cell
    an untouched input value or an exact count. NULL values are
    dropped (rank semantics, as everywhere in this module).

    One shuffle (the group-partition sort). Output: group_cols +
    (bucket 1-based, n_rows, lo, hi).
    """
    tie = [F.col(tiebreak_col)] if tiebreak_col else []
    base = df.select(*group_cols, value_col,
                     *([tiebreak_col] if tiebreak_col else [])) \
        .filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col), *tie)
    return (base.withColumn("bucket", F.ntile(buckets).over(w))
            .groupBy(*group_cols, "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min(value_col).alias("lo"),
                 F.max(value_col).alias("hi"))
            .select(*group_cols, F.col("bucket").cast("int").alias("bucket"),
                    "n_rows", "lo", "hi"))
