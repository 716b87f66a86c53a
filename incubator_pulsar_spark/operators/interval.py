"""Point-in-interval join without a nested-loop: time-bucket blocking.

Semantics: every (point, interval) pair with
``start <= point_ts <= end`` (closed on both ends) — what SQL writes as
an inequality join ``p JOIN i ON p.ts BETWEEN i.start AND i.end``.
Catalyst plans that raw form as BroadcastNestedLoopJoin (points ×
intervals work); this operator turns it into an EQUI-join:

1. intervals explode to the fixed-width time buckets they cover
   (``sequence`` over bucket indices — explode factor is
   span/bucket_width, bounded by contract);
2. points compute their single bucket map-side;
3. hash-join on the bucket index, refine with the exact range predicate.

Each point's bucket intersects a covering interval exactly once, so the
join emits each qualifying pair exactly once — no dedup pass.

Scale: the only shuffle is the bucket hash-join (broadcast when the
interval side is small); explode factor = ceil(span / bucket_width) + 1
per interval, a knob the caller sets to the data's span scale. Hot
buckets (bursty hours) are ordinary join skew — AQE skew-join splits
them. This is the standard public recipe for range joins on engines
without a native range-join optimizer (e.g. the binning approach in
Spark SQL range-join literature); the reference has no interval
operator, so this extends the family `asof.py` started
(point-to-LATEST) with point-to-CONTAINING-interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__ij_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner-join points to every interval containing them.

    Output columns: all interval columns + all point columns (caller
    disambiguates name collisions before the call). ``bucket_seconds``
    trades explode factor (long intervals → more bucket rows) against
    join selectivity (coarse buckets → more refine-filter misses);
    set it near the median interval span.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    width = F.lit(int(bucket_seconds) * 1_000_000)

    def _mic(c):  # NTZ-safe epoch micros (session tz is UTC)
        return F.unix_micros(F.col(c).cast("timestamp"))

    iv = intervals.withColumn(
        _BKT,
        F.explode(F.sequence(
            (_mic(start_col) / width).cast("long"),
            (_mic(end_col) / width).cast("long"))),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pt = points.withColumn(
        _BKT, (_mic(point_ts) / width).cast("long"))
    cond = (
        (pt[_BKT] == iv[_BKT])
        & (pt[point_ts] >= iv[start_col])
        & (pt[point_ts] <= iv[end_col])
    )
    return pt.join(iv, cond).drop(_BKT)


def interval_coverage(df: DataFrame, group_cols: list[str], *,
                      start_col: str, end_col: str) -> DataFrame:
    """Sweep-line interval aggregation per group: union length and
    peak concurrency over HALF-OPEN intervals [start, end) — the
    "how much wall-clock was covered, and how hot did it get"
    statistics (SLA uptime, concurrent-session peaks, overlapping-job
    capacity) that a raw sum of durations double-counts.

    The classic ±1 sweep: each interval emits (+1 at start, −1 at
    end); per group the events sort by (time, delta) — delta
    ASCENDING puts the −1 first at shared timestamps, which IS the
    half-open semantics (an interval ending at t and one starting at
    t never overlap; sorting +1 first would report a phantom peak of
    2 there). The running sum is the concurrency; gaps between
    consecutive event times accumulate into covered time while it is
    > 0; its max is the peak. Ties beyond (time, delta) need no
    tiebreak: permuting identical deltas at one timestamp walks the
    same arithmetic sequence of prefix values (same max), and
    intermediate rows see a zero gap (same coverage) — deterministic
    on any engine.

    Start/end are integer units (epoch ms by convention). Rows with
    NULL endpoints or end ≤ start drop (a zero-length half-open
    interval is the empty set). One shuffle (the group sort window;
    the agg reuses its partitioning); the event stream is 2 rows per
    interval — map-side, no join.

    Output: group_cols + (n_intervals BIGINT, total_ms BIGINT — Σ
    durations WITH double-counting, covered_ms BIGINT — the union,
    peak_concurrency BIGINT). total_ms/covered_ms > 1 quantifies
    overlap.
    """
    iv = (df.select(*group_cols,
                    F.col(start_col).cast("long").alias("_s"),
                    F.col(end_col).cast("long").alias("_e"))
          .filter(F.col("_s").isNotNull() & F.col("_e").isNotNull()
                  & (F.col("_e") > F.col("_s"))))
    ev = (iv.select(*group_cols, F.col("_s").alias("_t"),
                    F.lit(1).alias("_d"), (F.col("_e") - F.col("_s"))
                    .alias("_dur"))
          .unionByName(
              iv.select(*group_cols, F.col("_e").alias("_t"),
                        F.lit(-1).alias("_d"),
                        F.lit(0).cast("long").alias("_dur"))))
    w = Window.partitionBy(*group_cols).orderBy("_t", "_d")
    swept = (ev
             .withColumn("_run", F.sum("_d").over(
                 w.rowsBetween(Window.unboundedPreceding, 0)))
             .withColumn("_nxt", F.lead("_t").over(w)))
    gap = F.when((F.col("_run") > 0) & F.col("_nxt").isNotNull(),
                 F.col("_nxt") - F.col("_t")).otherwise(F.lit(0))
    return (swept.groupBy(*group_cols).agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        F.sum("_dur").cast("long").alias("total_ms"),
        F.sum(gap).cast("long").alias("covered_ms"),
        F.max("_run").cast("long").alias("peak_concurrency")))
