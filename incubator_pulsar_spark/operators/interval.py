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

from pyspark.sql import DataFrame
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
