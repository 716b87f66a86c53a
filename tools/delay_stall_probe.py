"""Root-cause probe for the delayed-delivery pass-2 restart stall.

CONFIRMED (r11): pre-fix, `clean` mode reproduced the exact suite-run
stall signature deterministically (one recovery batch, then batchId
frozen, 'Waiting for next trigger', 0 releases for the full budget)
while `replay` mode released everything; post-fix (rate-source
keepalive in delay.py), BOTH modes release everything.

Hypothesis (VERDICT r10 #1): the stall is NOT in our re-arm math but in
Spark's restart flow — after a restart where the checkpoint's last
planned batch was cleanly COMMITTED (offsets/ == commits/),
MicroBatchExecution has `lastExecution == null`, so
`lastExecutionRequiresAnotherBatch` is false and, with no new source
data, NO batch is ever constructed — processing-time timers never fire
(the SPARK-38320 family). When the stop lands mid-batch instead, the
restart REPLAYS the uncommitted batch, `lastExecution` becomes non-null,
no-data batches resume, timers fire, releases happen. 4-of-6 green runs
= the stop usually landing mid-batch.

This probe manufactures BOTH checkpoint states deterministically:
  clean:  truncate offsets/ down to commits/ after pass-1 stop
  replay: append state so offsets/ has one more entry than commits/
          (achieved by deleting the newest commit file if needed)
then restarts with the far clock and reports whether any batch runs /
any row releases within the budget.

Run: python tools/delay_stall_probe.py [clean|replay]
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from incubator_pulsar_spark.session import get_spark
from incubator_pulsar_spark.streaming import delay as sdelay

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
N, N_KEYS = 500, 20


def _numbered(d):
    if not os.path.isdir(d):
        return []
    return sorted(int(f) for f in os.listdir(d) if f.isdigit())


def main(mode: str) -> None:
    spark = get_spark("delay-probe", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix=f"delayprobe-{mode}-")
    path, ck, rel = f"{tmp}/t", f"{tmp}/c", f"{tmp}/rel"

    rows = spark.range(N).select(
        (F.col("id") % N_KEYS).cast("string").alias("key"),
        F.col("id").alias("sequence"),
        (F.lit(T0) + F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0),
            (F.lit(5) + F.col("id") % 10).cast("double"))).alias("deliver_at"))
    rows.write.parquet(path)

    def start(now_fn):
        schema = spark.read.parquet(path).schema
        st = spark.readStream.schema(schema).parquet(path)
        out = sdelay.delayed_delivery_stream(st, now_fn=now_fn)
        return (out.writeStream.format("parquet").option("path", rel)
                .option("checkpointLocation", ck)
                .trigger(processingTime="1 second").start())

    def released():
        if not glob.glob(f"{rel}/*.parquet"):
            return 0
        return spark.read.parquet(rel).count()

    # ---- pass 1: pinned clock, a few timer batches, stop ----
    q = start(lambda ts: T0)
    deadline = time.time() + 60
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 2:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(120)
    t_dereg = time.time() + 120
    while spark.streams.active and time.time() < t_dereg:
        time.sleep(0.5)
    offs, comms = _numbered(f"{ck}/offsets"), _numbered(f"{ck}/commits")
    print(f"after pass1 stop: offsets={offs} commits={comms}", flush=True)

    # ---- manufacture the target checkpoint state ----
    if mode == "clean":
        for b in offs:
            if b not in comms:
                os.remove(f"{ck}/offsets/{b}")
                for crc in glob.glob(f"{ck}/offsets/.{b}.crc"):
                    os.remove(crc)
                print(f"removed dangling offset {b} -> CLEAN shutdown state",
                      flush=True)
    else:  # replay
        if offs == comms and comms:
            os.remove(f"{ck}/commits/{comms[-1]}")
            for crc in glob.glob(f"{ck}/commits/.{comms[-1]}.crc"):
                os.remove(crc)
            print(f"removed commit {comms[-1]} -> forced REPLAY state",
                  flush=True)
    offs, comms = _numbered(f"{ck}/offsets"), _numbered(f"{ck}/commits")
    print(f"restart with: offsets={offs} commits={comms}", flush=True)

    # ---- pass 2: far clock, watch for 75s ----
    cut_ms = int(time.time() * 1000)
    far = T0 + dt.timedelta(hours=10)
    q2 = start(lambda ts: T0 if ts <= cut_ms else far)
    t_end = time.time() + 75
    last = None
    while time.time() < t_end:
        if q2.exception() is not None:
            print(f"pass2 DIED: {q2.exception()}", flush=True)
            break
        p = q2.lastProgress
        b = p["batchId"] if p else -1
        r = released()
        if (b, r) != last:
            print(f"t={time.time() % 1000:.1f} batchId={b} released={r} "
                  f"status={q2.status['message']!r}", flush=True)
            last = (b, r)
        if r >= N:
            print("ALL RELEASED — no stall in this mode", flush=True)
            break
    else:
        print(f"TIMEOUT after 75s: batchId={last[0] if last else -1} "
              f"released={last[1] if last else 0}/{N} "
              f"status={q2.status}", flush=True)
    q2.stop()
    q2.awaitTermination(120)
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "clean")
