"""Windowed aggregation (the Pulsar Functions windowing runtime).

Reference: ``WindowFunctionExecutor.java:48-323`` + ``WindowManager.java``
+ trigger/eviction policies — tumbling/sliding × count/time ×
processing/event time, watermarks (``WaterMarkEventGenerator.java:84-122``
— min max-seen-ts across inputs − maxLag), late data routed to a side
topic (``WindowFunctionExecutor.java:296-308``), configured by
``WindowConfig.java:33-51``.

Spark-first batch forms (streaming variants live in streaming/):
- time windows   → ``F.window(ts, length, slide)`` (built-in, codegen'd)
- session window → ``F.session_window`` (the reference lacks these; free)
- count windows  → row_number per key then integer-divide — one shuffle
  by key, sort within partitions only (no Spark primitive exists; the
  reference's CountTriggerPolicy/CountEvictionPolicy define the
  semantics: fire every N records per key, evict the pane).

Scale: time windows are hash aggregations (partial agg map-side); count
windows need per-key ordering — shuffle by key, in-partition sort, no
global sort. Sliding windows multiply rows by length/slide; keep that
ratio small or pre-aggregate to the slide granularity first
(``pre_aggregate_slide``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_time_window(
    df: DataFrame, *, ts_col: str = "event_time", length: str = "1 hour",
    group_by: Sequence[str] = (), aggs: Sequence[Column] = (),
) -> DataFrame:
    """Tumbling time window: slide defaults to length
    (WindowConfig.java — slidingInterval defaults to windowLength)."""
    return (
        df.groupBy(F.window(F.col(ts_col), length), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_time_window(
    df: DataFrame, *, ts_col: str = "event_time", length: str = "1 hour",
    slide: str = "30 minutes", group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Sliding time window (length > slide): each row lands in
    length/slide panes (TimeTriggerPolicy.java:44 + TimeEvictionPolicy)."""
    return (
        df.groupBy(F.window(F.col(ts_col), length, slide), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_window(
    df: DataFrame, *, ts_col: str = "event_time", gap: str = "10 minutes",
    group_by: Sequence[str] = (), aggs: Sequence[Column] = (),
) -> DataFrame:
    """Session window — absent from the reference (SURVEY §2.5), exposed
    because Spark gives it free and the windowing surface should be total."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap), *group_by)
        .agg(*aggs)
        .withColumn("window_start", F.col("session_window.start"))
        .withColumn("window_end", F.col("session_window.end"))
        .drop("session_window")
    )


def tumbling_count_window(
    df: DataFrame, *, key_col: str = "key", order_col: str = "sequence",
    count: int, aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-key tumbling count window: fire every `count` records
    (CountTriggerPolicy.java:34 / CountEvictionPolicy.java:32).

    window_id = floor(rank_in_key / count). Per-key (not global) counting
    is the supported mode — global count windows serialize and cannot
    scale (SURVEY §7 watch list).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w) - F.lit(1))
        .withColumn("window_id", F.floor(F.col("_rn") / count).cast("long"))
        .groupBy(key_col, "window_id")
        .agg(*aggs, F.count(F.lit(1)).alias("window_size"))
    )


def sliding_count_window(
    df: DataFrame, *, key_col: str = "key", order_col: str = "sequence",
    length: int, slide: int, aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-key sliding count window: pane of `length` records firing every
    `slide` records. A row at in-key position p belongs to every window
    whose trigger position t satisfies t-length < p <= t, t ≡ 0 mod slide.

    Implemented by replicating each row into its ceil(length/slide)
    candidate windows (explode) then aggregating — the same row-sharing
    WindowManager keeps in its pane deque, expressed as a shuffle-free
    explode + one hash agg.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(order_col))
    n_copies = (length + slide - 1) // slide
    df2 = (
        df.withColumn("_p", F.row_number().over(w))  # 1-based in-key position
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(key_col)))
        # a row at position p is in the pane fired at trigger t iff
        # t-length < p <= t; triggers are the multiples of slide that have
        # actually fired (t <= n). First covering trigger: ceil(p/slide)*slide.
        .withColumn("_t0", F.ceil(F.col("_p") / F.lit(slide)) * F.lit(slide))
        .withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit(n_copies - 1))))
        .withColumn("window_end_pos", F.col("_t0") + F.col("_k") * F.lit(slide))
        .filter(
            (F.col("_p") > F.col("window_end_pos") - F.lit(length))
            & (F.col("window_end_pos") <= F.col("_n"))
        )
    )
    return (
        df2.groupBy(key_col, "window_end_pos")
        .agg(*aggs, F.count(F.lit(1)).alias("window_size"))
    )


def pane_deltas(
    df: DataFrame, *, key_col: str = "key", order_col: str = "sequence",
    length: int, slide: int,
) -> DataFrame:
    """Window pane contents WITH the incremental views: ``WindowImpl``'s
    ``get()/getNew()/getExpired()`` (WindowImpl.java, consumed by
    ``WindowFunctionExecutor.java:222-229``).

    Per key, a trigger fires at every ``slide``-th record (position t =
    multiples of slide that have arrived). Output: one row per
    (key, window_end_pos, member-or-evicted row) with ``delta``:

    - ``new``      — entered the pane since the previous firing
      (position in (t-slide, t])
    - ``carried``  — still in the pane from an earlier firing
    - ``expired``  — evicted since the previous firing
      (position in (t-length-slide, t-length])

    Each element is ``new`` exactly once (first trigger ≥ p) and
    ``expired`` exactly once (first trigger ≥ p+length) — the same
    lifecycle WindowManager's pane deque gives each tuple. Tumbling
    panes are slide == length (every member is new, the whole previous
    pane expires).

    Scale: one shuffle by key for the position numbers, then a map-side
    explode of ceil(length/slide)+1 copies per row — same cost shape as
    ``sliding_count_window``.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(order_col))
    n_copies = (length + slide - 1) // slide
    df2 = (
        df.withColumn("_p", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(key_col)))
    )
    # ONE explode emits every lifecycle event of a row: its n_copies
    # member panes (first = 'new', rest = 'carried') plus its single
    # eviction pane — a union of two branches would rescan + reshuffle
    # the input twice (measured: 2 shuffles/4 scans vs 1/1 here).
    first_member = (F.ceil(F.col("_p") / F.lit(slide)) * slide).cast("long")
    expire_at = (F.ceil((F.col("_p") + F.lit(length)) / F.lit(slide)) * slide).cast("long")
    member = F.transform(
        F.sequence(F.lit(0), F.lit(n_copies - 1)),
        lambda k: F.struct(
            (first_member + k * slide).alias("t"),
            F.when(k == 0, F.lit("new")).otherwise(F.lit("carried")).alias("d"),
        ),
    )
    events = F.concat(
        member, F.array(F.struct(expire_at.alias("t"), F.lit("expired").alias("d")))
    )
    return (
        df2.withColumn("_e", F.explode(events))
        .withColumn("window_end_pos", F.col("_e.t"))
        .withColumn("delta", F.col("_e.d"))
        .filter(
            (F.col("window_end_pos") <= F.col("_n"))
            & ((F.col("delta") == "expired")
               | (F.col("_p") > F.col("window_end_pos") - F.lit(length)))
        )
        .drop("_e", "_p", "_n")
    )


def pane_deltas_time(
    df: DataFrame, *, key_col: str = "key", ts_col: str = "event_time",
    length_seconds: int, slide_seconds: int,
) -> DataFrame:
    """Time-based pane lifecycle views — the TimeTriggerPolicy companion
    of ``pane_deltas`` (count). Triggers fire at wall-aligned multiples
    of ``slide_seconds``; a row with timestamp ts is:

    - ``new`` at the first trigger ≥ ts,
    - ``carried`` at later triggers while ts > t − length,
    - ``expired`` at the first trigger ≥ ts + length,

    exactly WindowImpl's per-element enter-once/expire-once lifecycle
    under TimeTriggerPolicy.java:44 + TimeEvictionPolicy.java:30.
    Triggers beyond the key's max timestamp have not fired and emit
    nothing. Same single-explode plan shape as the count form: one
    keyed shuffle (for the per-key max), map-side explode.
    """
    if length_seconds % slide_seconds != 0:
        # keep the trigger arithmetic exact (sequence step below)
        raise ValueError("length_seconds must be a multiple of slide_seconds")
    n_copies = length_seconds // slide_seconds
    epoch = F.unix_timestamp(F.col(ts_col))
    first_t = (F.ceil(epoch / F.lit(slide_seconds)) * slide_seconds).cast("long")
    expire_t = (F.ceil((epoch + F.lit(length_seconds)) / F.lit(slide_seconds))
                * slide_seconds).cast("long")
    max_t = F.max(epoch).over(Window.partitionBy(key_col))
    member = F.transform(
        F.sequence(F.lit(0), F.lit(n_copies - 1)),
        lambda k: F.struct(
            (first_t + k * slide_seconds).alias("t"),
            F.when(k == 0, F.lit("new")).otherwise(F.lit("carried")).alias("d"),
        ),
    )
    events = F.concat(
        member, F.array(F.struct(expire_t.alias("t"), F.lit("expired").alias("d")))
    )
    return (
        df.withColumn("_maxt", max_t)
        .withColumn("_e", F.explode(events))
        .withColumn("window_end_ts", F.to_timestamp(F.col("_e.t")))
        .withColumn("delta", F.col("_e.d"))
        .filter(F.col("_e.t") <= F.col("_maxt"))
        .drop("_e", "_maxt")
    )


def split_late(
    df: DataFrame, *, ts_col: str = "event_time", arrival_col: str = "sequence",
    max_lag: str = "0 seconds", key_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Event-time watermarking with a late-data side output (batch form).

    Watermark after each arrival = max(event_time seen so far) − maxLag
    (WaterMarkEventGenerator.computeWaterMarkTs, :113-122). A row is LATE
    if its event_time ≤ the watermark in force when it arrived; late rows
    go to the lateDataTopic instead of the pane
    (WindowFunctionExecutor.java:296-308).

    Returns (on_time, late). Pass ``key_col`` for keyed topics: the
    running max partitions by key, so the plan is a normal hash shuffle
    that scales with the cluster (per-key watermarks, slightly LESS
    eager to call rows late than a global watermark — a key only sees
    its own max). Without ``key_col`` the whole input is one ordering —
    a single-partition window, correct only for bounded per-topic
    replays, never a 100 TB scan. The streaming form
    (streaming/late.py) has no such bottleneck either way.
    """
    base = (Window.partitionBy(key_col) if key_col is not None
            else Window.partitionBy())
    w = base.orderBy(F.col(arrival_col)).rowsBetween(Window.unboundedPreceding, -1)
    lag = F.expr(f"INTERVAL {max_lag}")
    wm = F.max(F.col(ts_col)).over(w) - lag
    flagged = df.withColumn("_wm", wm).withColumn(
        "is_late", F.col("_wm").isNotNull() & (F.col(ts_col) <= F.col("_wm"))
    )
    on_time = flagged.filter(~F.col("is_late")).drop("_wm", "is_late")
    late = flagged.filter(F.col("is_late")).drop("_wm", "is_late")
    return on_time, late
