"""As-of join: match each left row to the most recent right row at or
before the left row's timestamp, per key.

The reference engine has no join operator of any kind (SURVEY §2.3 —
its key machinery is routing, not relational); this operator is part of
the "operators Spark lacks" extension family (as-of / point-in-time
lookup), the join a feature-store or session-attribution pipeline needs:
"the latest state/click/quote as of this event's time".

Spark-first plan — NO range join, NO per-row subquery, NO interval
explosion:

1. Reduce the right side to one row per (key, ts) (``max_by`` on a
   caller-supplied tie column when duplicates are possible).
2. Tag both sides (right=0, left=1), union on (key, ts, side).
3. One window pass per key: ``last(right_payload, ignorenulls=True)``
   over ``rowsBetween(unboundedPreceding, currentRow)`` with rows
   ordered by (ts, side) — a right row at exactly left.ts sorts first,
   so the match is inclusive (ts_right <= ts_left).
4. Keep left rows; explode the carried payload struct back to columns.

Cost at 100 TB: ONE shuffle of left+right combined (the window's
partitionBy) — the same exchange a groupBy over the key would pay, and
strictly cheaper than any range-condition join Catalyst would plan
(BroadcastNestedLoop or a per-bucket explosion). Per-key state in the
window is O(1) (one carried struct), so a hot key degrades to a sort,
never to memory pressure — and with ``salt_interval`` set it does not
even degrade to one task: the window partitions by (key, time-bucket),
and a boundary pre-pass over the per-bucket SUMMARIES (one row per
key-bucket, data-mass-free) carries the last right row of earlier
buckets forward as a synthetic seed row at each bucket start. Identical
output to the unsalted path; the hot key's sort splits into one task
per bucket.

Semantics cross-checked against DuckDB's ASOF JOIN in the correctness
gate (``asof_join_events``): identical matches, including NULL matches
for left rows with no prior right row (how='left').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_LEFT = "__asof_left"
_RIGHT = "__asof_right"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    how: str = "left",
    tie_col: str | None = None,
    suffix: str = "",
    salt_interval: str | None = None,
) -> DataFrame:
    """As-of join ``left`` to ``right`` on ``on`` with
    ``right[right_ts] <= left[left_ts]`` (latest such right row wins).

    Every right column except ``on``/``right_ts`` is carried to the
    output (renamed with ``suffix`` on collision with a left column,
    plus ``right_ts`` itself as ``{right_ts}{suffix or '_right'}``).
    ``how`` is ``'left'`` (unmatched left rows keep NULL payloads) or
    ``'inner'`` (unmatched left rows dropped).

    If the right side can hold several rows per (key, ts), pass
    ``tie_col``: the row with the greatest tie value wins, keeping the
    result deterministic. Without it, (key, ts) uniqueness is assumed.

    ``salt_interval`` (e.g. ``"1 hour"``) splits a hot key across time
    buckets: the window partitions by (key, bucket) and a boundary
    pre-pass over per-bucket summaries seeds each bucket with the last
    right row of all earlier buckets. Output is identical to the
    unsalted path; pick an interval that gives the hot key tens-to-
    hundreds of buckets at your data density.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")

    payload_cols = [c for c in right.columns if c not in (on, right_ts)]

    def _payload_name(c: str) -> str:
        return c + (suffix or "_right") if c in left.columns else c

    ts_out = _payload_name(right_ts)

    # one row per (key, ts) on the right — keeps the window deterministic.
    # NULL-ts right rows are dropped: "at or before" is undefined for
    # them (a NULL would sort first and get carried into every match,
    # where SQL ASOF semantics never match it). NULL-ts LEFT rows match
    # nothing, for the same ordering reason.
    r_struct = F.struct(
        F.col(right_ts).alias(ts_out),
        *[F.col(c).alias(_payload_name(c)) for c in payload_cols],
    )
    r = (right.filter(F.col(right_ts).isNotNull())
         .select(F.col(on), F.col(right_ts).alias(_TS), r_struct.alias(_RIGHT)))
    if tie_col is not None:
        r = r.groupBy(on, _TS).agg(F.max_by(_RIGHT, F.col(f"{_RIGHT}.{_payload_name(tie_col)}")).alias(_RIGHT))

    l = left.select(
        F.col(on),
        F.col(left_ts).alias(_TS),
        F.struct(*[F.col(c) for c in left.columns]).alias(_LEFT),
    )

    unioned = (
        r.select(on, _TS, F.lit(0).alias(_SIDE), F.lit(None).cast(l.schema[_LEFT].dataType).alias(_LEFT), _RIGHT)
        .unionByName(
            l.select(on, _TS, F.lit(1).alias(_SIDE), _LEFT, F.lit(None).cast(r.schema[_RIGHT].dataType).alias(_RIGHT))
        )
    )

    if salt_interval is None:
        part_cols = [on]
    else:
        # hot-key salting: bucket the timeline, seed each (key, bucket)
        # with the last right row carried from earlier buckets, then
        # window per (key, bucket) — the hot key's sort becomes one
        # task per bucket instead of one task total.
        bkt = "__asof_bucket"
        unioned = unioned.withColumn(
            bkt, F.window(F.col(_TS), salt_interval)["start"])

        # per-bucket summary: the last right row of each (key, bucket) —
        # one row per key-bucket, no data mass
        r_b = r.withColumn(bkt, F.window(F.col(_TS), salt_interval)["start"])
        summaries = r_b.groupBy(on, bkt).agg(
            F.max_by(_RIGHT, _TS).alias(_RIGHT))

        # spine = every (key, bucket) either side touches, so buckets
        # with left rows but no right rows still receive the carry
        spine = unioned.select(on, bkt).distinct()
        w_carry = (Window.partitionBy(on).orderBy(bkt)
                   .rowsBetween(Window.unboundedPreceding, -1))
        seeds = (
            spine.join(summaries, [on, bkt], "left")
            .withColumn(_MATCH, F.last(_RIGHT, ignorenulls=True).over(w_carry))
            .filter(F.col(_MATCH).isNotNull())
            .select(
                on,
                F.col(bkt).cast(unioned.schema[_TS].dataType).alias(_TS),
                F.lit(-1).alias(_SIDE),
                F.lit(None).cast(l.schema[_LEFT].dataType).alias(_LEFT),
                F.col(_MATCH).alias(_RIGHT),
                bkt,
            )
        )
        unioned = unioned.unionByName(seeds)
        part_cols = [on, bkt]

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col(_TS), F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn(_MATCH, F.last(_RIGHT, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col(_MATCH).isNotNull())

    out_cols: list[Column] = [F.col(f"{_LEFT}.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"{_MATCH}.{ts_out}").alias(ts_out))
    out_cols += [
        F.col(f"{_MATCH}.{_payload_name(c)}").alias(_payload_name(c))
        for c in payload_cols
    ]
    return matched.select(*out_cols)
