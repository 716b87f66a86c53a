"""Streaming delayed delivery: withhold messages until ``deliver_at``.

Reference: ``broker/delayed/InMemoryDelayedDeliveryTracker.java:42,117,
170`` — the dispatcher checks a (deliverAt → position) priority queue and
withholds entries whose time hasn't come; a timer re-checks. The bucketed
variant (``broker/delayed/bucket/*``) spills the index to a ledger.

Spark-first: ``applyInPandasWithState`` with a processing-time timeout.
State per key = the pending rows (deliver_at still in the future). Each
invocation — new data OR timer — releases everything due, keeps the
rest, and re-arms the timeout for the earliest pending deliver_at. The
state store is the "bucket" (RocksDB-backed spill for free).

REPLAY DETERMINISM (the r10 full-suite run caught this live): "now"
must be the BATCH PROCESSING TIMESTAMP
(``GroupState.getCurrentProcessingTimeMs()``), never a per-invocation
wall clock. The batch timestamp is persisted in the offset log, so a
crash-REPLAYED batch re-evaluates with the ORIGINAL timestamp and
re-emits byte-identical output — an exactly-once sink that already
committed that batch skips it harmlessly. With a wall clock, the
replay runs later, rows that were "pending" in the original execution
come due inside the replayed batch, the sink DROPS the re-emitted
batch as already committed, and those releases are lost permanently.

RESTART LIVENESS (root-caused r11; this was the residual 2-of-6 stall
the r10 clock fix did NOT close): Spark only processes expired
processing-time timers inside a MICRO-BATCH, and after a restart from
a checkpoint whose last planned batch was cleanly COMMITTED
(``offsets/`` == ``commits/``), ``MicroBatchExecution`` has
``lastExecution == null`` — so ``lastExecutionRequiresAnotherBatch``
is false and, with no new source data, NO batch is ever constructed.
``FlatMapGroupsWithStateExecBase.shouldRunAnotherBatch`` returns true
unconditionally for ProcessingTimeTimeout (verified against the Spark
4.1.2 bytecode), but it is only consulted on the PREVIOUS execution —
which a fresh restart doesn't have. Expired timers then sit in the
state store forever: batchId frozen, status "Waiting for next
trigger", releases 0 (deterministic repro:
``tools/delay_stall_probe.py clean``). When the shutdown instead
landed mid-batch, the restart REPLAYS the uncommitted batch, that
replay populates ``lastExecution``, and no-data batches resume — which
is why the stall was intermittent (stop-timing luck), ~1-in-3.

Fix (structural, not a budget tune): a 1-row/sec ``rate``-source
keepalive is unioned into the keyed stream (``keepalive=True``,
default). Every trigger then has new data, so a batch is ALWAYS
constructed and any expired timer fires within one trigger of a
restart — the Spark analogue of the reference dispatcher's dedicated
timer thread. Tick rows carry a NULL sequence and are dropped inside
the state function before they touch state or output, so they are
replay-inert (a replayed batch re-drops them identically) and collide
with no user key's semantics. Restarting a checkpoint written BEFORE
this change needs ``keepalive=False`` (the source count is part of the
checkpoint contract).

Release granularity is the micro-batch trigger interval, not
milliseconds — documented semantics difference (SURVEY §7 watch list).
"""

from __future__ import annotations

import datetime as _dt
import warnings
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def checkpoint_source_count(checkpoint_location: str) -> int | None:
    """Number of sources recorded in a streaming checkpoint's latest
    offsets file, or None for a fresh/empty checkpoint.

    The offsets file format is one line ``v1``, one metadata JSON
    line, then ONE LINE PER SOURCE — so a pre-keepalive
    delayed-delivery checkpoint shows 1 source and a keepalive one
    shows 2. Spark hard-fails a restart whose source count differs
    from the checkpoint ("There are [N] sources in the checkpoint
    offsets and now there are [M]"), so this is the exact signal
    ``delayed_delivery_stream`` needs to pick ``keepalive``
    automatically (VERDICT r11 #5)."""
    import os

    lines = _latest_offsets_lines(checkpoint_location)
    if lines is None:
        return None
    return max(len(lines) - 2, 0)


def _latest_offsets_lines(checkpoint_location: str) -> list[str] | None:
    import os

    offsets_dir = os.path.join(checkpoint_location, "offsets")
    if not os.path.isdir(offsets_dir):
        return None
    batches = [f for f in os.listdir(offsets_dir) if f.isdigit()]
    if not batches:
        return None
    latest = os.path.join(offsets_dir, max(batches, key=int))
    with open(latest) as f:
        return [ln for ln in f.read().splitlines() if ln.strip()]


def checkpoint_ticker_type(checkpoint_location: str) -> str | None:
    """Which keepalive ticker a checkpoint was written with: ``"rate"``,
    ``"heartbeat"``, or None (fresh checkpoint / no second source).

    The source TYPE is part of the checkpoint contract but Spark only
    reports a mismatch as an opaque offset-deserialization error at
    start(). The offsets log itself disambiguates (ADVICE r12): the
    ticker is the SECOND source line (union order), and the two
    tickers serialize differently — ``rate`` writes a bare long
    (LongOffset), the ``heartbeat`` Python source writes its offset
    dict ``{"anchor_ms": ..., "n": ...}``."""
    import json

    lines = _latest_offsets_lines(checkpoint_location)
    if lines is None or len(lines) < 4:  # v1 + metadata + >=2 sources
        return None
    try:
        off = json.loads(lines[3])
        if isinstance(off, str):  # python-source offsets double-encode
            off = json.loads(off)
    except (ValueError, TypeError):
        return None
    if isinstance(off, dict) and "anchor_ms" in off:
        return "heartbeat"
    if isinstance(off, (int, float)):
        return "rate"
    return None


def delayed_delivery_stream(
    stream: DataFrame,
    *,
    key_col: str = "key",
    sequence_col: str = "sequence",
    deliver_at_col: str = "deliver_at",
    now_fn=None,
    keepalive: bool | None = None,
    keepalive_interval: float = 1.0,
    checkpoint_location: str | None = None,
) -> DataFrame:
    """Emit rows once ``deliver_at`` ≤ processing time; buffer the rest.

    Output: (key, sequence, deliver_at, released_at). ``now_fn`` is
    injectable for deterministic tests; by default "now" is the BATCH
    processing timestamp (replay-stable — see module header). A
    one-argument ``now_fn(batch_ts_ms)`` is the replay-safe injectable
    form: as long as it is a pure function of the batch timestamp, a
    replayed batch computes the same virtual time. A zero-argument
    ``now_fn()`` is accepted for convenience but makes REPLAYED output
    depend on when the replay runs — test-only, and warned about.

    ``keepalive`` (default None = auto, resolving to True) unions a
    liveness ticker into the stream so pending releases survive an
    idle-source restart (module header: RESTART LIVENESS). Rows with a
    NULL ``sequence`` are treated as ticks and dropped; rows with a
    real sequence but NULL ``deliver_at`` are released immediately (a
    message without a deliver-at is not delayed —
    MessageImpl.getDeliverAtTime() == 0).

    ``checkpoint_location`` — pass the SAME path you will give
    writeStream and restarts cannot strand: the helper reads the
    checkpoint's source count and (a) auto-selects the matching
    ``keepalive`` when you left it at None (a pre-keepalive 1-source
    checkpoint restarts tick-free, with a stall-risk warning), or
    (b) raises with the exact fix when your explicit ``keepalive``
    contradicts the checkpoint — instead of Spark's opaque
    source-count assertion at start().

    ``keepalive_interval`` (seconds, default 1.0) tunes idle batch
    cadence. 1.0 keeps the built-in ``rate`` ticker (checkpoint-
    compatible with all prior keepalive checkpoints). Other values use
    the ``heartbeat`` Python source (``streaming/heartbeat.py``) whose
    OFFSET only advances each interval — a rarely-delayed topic then
    constructs one micro-batch per interval instead of one per second.
    The interval's source TYPE is part of the checkpoint contract:
    changing 1.0 ↔ non-1.0 on an existing checkpoint is incompatible
    (start a fresh checkpoint) — with ``checkpoint_location`` passed,
    the helper sniffs the recorded ticker type from the offsets log
    (``checkpoint_ticker_type``) and raises the instructive error here
    instead of Spark's opaque offset-format failure at start().
    Release latency ≈ the interval — pick it at or below your delay
    tolerance."""
    if checkpoint_location is not None:
        n_src = checkpoint_source_count(checkpoint_location)
        if n_src is not None:
            required = n_src >= 2
            if keepalive is None:
                keepalive = required
                if not required:
                    warnings.warn(
                        "checkpoint at %r predates the keepalive ticker "
                        "(1 source): restarting WITHOUT keepalive so the "
                        "source count matches. An idle restart of this "
                        "stream can strand pending releases (module "
                        "header: RESTART LIVENESS) — to migrate, drain "
                        "the pending messages, then restart with a FRESH "
                        "checkpoint (keepalive on)." % checkpoint_location,
                        stacklevel=2)
            elif keepalive != required:
                shape = ("a keepalive ticker (2 sources)" if required
                         else "no keepalive ticker (1 source)")
                raise ValueError(
                    f"checkpoint at {checkpoint_location!r} was written "
                    f"with {shape} but keepalive={keepalive} was "
                    f"requested — Spark would fail the restart on the "
                    f"source-count mismatch. Pass keepalive={required} "
                    f"(or keepalive=None to auto-detect), or start a "
                    f"fresh checkpoint to change the setting.")
            if keepalive and required:
                # the source TYPE is checkpoint contract too (ADVICE
                # r12): a rate↔heartbeat swap passes the source-count
                # check yet dies at start() with Spark's opaque
                # offset-format error — sniff the offsets log and give
                # the instructive error here instead
                recorded = checkpoint_ticker_type(checkpoint_location)
                chosen = ("rate" if keepalive_interval == 1.0
                          else "heartbeat")
                if recorded is not None and recorded != chosen:
                    fix = ("keepalive_interval=1.0"
                           if recorded == "rate"
                           else "a non-1.0 keepalive_interval (e.g. the "
                                "interval the checkpoint was started "
                                "with)")
                    raise ValueError(
                        f"checkpoint at {checkpoint_location!r} was "
                        f"written with the {recorded!r} keepalive ticker "
                        f"but keepalive_interval={keepalive_interval} "
                        f"selects the {chosen!r} ticker — Spark would "
                        f"fail the restart on the offset-format "
                        f"mismatch. Pass {fix}, or start a fresh "
                        f"checkpoint to change the cadence.")
    if keepalive is None:
        keepalive = True
    out_schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("sequence", T.LongType()),
        T.StructField("deliver_at", T.TimestampType()),
        T.StructField("released_at", T.TimestampType()),
    ])
    state_schema = T.StructType([
        T.StructField("pending_seq", T.ArrayType(T.LongType())),
        T.StructField("pending_at", T.ArrayType(T.TimestampType())),
    ])
    import inspect as _inspect

    if now_fn is None:
        clock_takes_ts = False
    else:
        try:
            clock_takes_ts = len(_inspect.signature(now_fn).parameters) >= 1
        except (TypeError, ValueError):
            # C callables (time.time) expose no signature metadata —
            # treat as the zero-arg form rather than failing stream
            # construction (ADVICE r10)
            clock_takes_ts = False
        if not clock_takes_ts:
            warnings.warn(
                "zero-arg now_fn: replayed batches will evaluate with "
                "whatever the clock returns AT REPLAY TIME, breaking "
                "exactly-once release on crash recovery; prefer the "
                "replay-safe now_fn(batch_ts_ms) form", stacklevel=2)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        pend_seq, pend_at = ([], [])
        if state.exists:
            s = state.get
            pend_seq = list(s[0] or [])
            pend_at = [pd.Timestamp(t) for t in (s[1] or [])]
        for pdf in pdfs:
            for seq, at in zip(pdf[sequence_col], pdf[deliver_at_col]):
                if pd.isna(seq):
                    continue  # keepalive tick: never buffered, never emitted
                pend_seq.append(int(seq))
                pend_at.append(pd.Timestamp(at))
        # priority-queue order, like the reference tracker: earliest
        # deliver_at first, sequence as the deterministic tiebreak
        # (InMemoryDelayedDeliveryTracker's queue is keyed on deliverAt);
        # NULL deliver_at = "not delayed" sorts first
        if pend_seq:
            pairs = sorted(
                zip(pend_seq, pend_at),
                key=lambda p: (pd.Timestamp.min if pd.isna(p[1]) else p[1],
                               p[0]))
            pend_seq, pend_at = [list(t) for t in zip(*pairs)]

        # "now" = batch processing timestamp (replay-stable; module
        # header) unless a test injects its own mapping
        batch_ts_ms = state.getCurrentProcessingTimeMs()
        if now_fn is None:
            raw_now = _dt.datetime.fromtimestamp(batch_ts_ms / 1000.0,
                                                 _dt.timezone.utc)
        elif clock_takes_ts:
            raw_now = now_fn(batch_ts_ms)
        else:
            raw_now = now_fn()
        now = pd.Timestamp(raw_now)
        if now.tzinfo:
            now = now.tz_localize(None)
        due, keep_seq, keep_at = [], [], []
        for seq, at in zip(pend_seq, pend_at):
            if pd.isna(at):
                due.append((key[0], seq, None, now))
                continue
            at_naive = at.tz_localize(None) if at.tzinfo else at
            if at_naive <= now:
                due.append((key[0], seq, at_naive, now))
            else:
                keep_seq.append(seq)
                keep_at.append(at_naive)

        if keep_seq:
            state.update((keep_seq, keep_at))
            # re-check at the earliest pending deliver_at (min 1s)
            wait_ms = max(int((min(keep_at) - now).total_seconds() * 1000), 1000)
            state.setTimeoutDuration(wait_ms)
        elif state.exists:
            state.remove()

        if due:
            yield pd.DataFrame(due, columns=["key", "sequence", "deliver_at",
                                             "released_at"])

    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(sequence_col).cast("long").alias(sequence_col),
        F.col(deliver_at_col).cast("timestamp").alias(deliver_at_col),
    )
    if keepalive:
        # liveness ticker (module header: RESTART LIVENESS) — guarantees
        # batch construction after restart so expired timers fire; rows
        # are dropped in fn via the NULL-sequence rule. interval==1 keeps
        # the rate source (checkpoint-compatible with prior keepalive
        # checkpoints); other intervals use the offset-cadenced
        # heartbeat source so an idle stream batches once per interval
        if keepalive_interval == 1.0:
            raw_ticks = (stream.sparkSession.readStream.format("rate")
                         .option("rowsPerSecond", "1").load())
        else:
            from .heartbeat import heartbeat_stream

            raw_ticks = heartbeat_stream(stream.sparkSession,
                                         keepalive_interval)
        ticks = raw_ticks.select(
            F.lit("\x00__keepalive__").alias("key"),
            F.lit(None).cast("long").alias(sequence_col),
            F.lit(None).cast("timestamp").alias(deliver_at_col),
        )
        keyed = keyed.unionByName(ticks)
    return keyed.groupBy("key").applyInPandasWithState(
        fn, out_schema, state_schema, "append", "ProcessingTimeTimeout"
    )
