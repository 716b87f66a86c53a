"""Function pipeline assembly: the FunctionConfig-driven runtime.

Reference: ``FunctionConfig.java:59-138`` — a function deployment is
(inputs :65, output :77, processingGuarantees :91, retainOrdering :94,
deadLetterTopic :112, parallelism :114, windowConfig :117, user config)
— and the instance loop ``JavaInstanceRunnable.run`` (:313):
readInput → handleMessage → handleResult → sendOutputMessage, with
window functions wrapped by WindowFunctionExecutor.

Spark-first: one ``readStream → transform → writeStream`` query per
function. Parallelism is the cluster scheduler's job; guarantees map to
checkpoint + sink idempotence (EFFECTIVELY_ONCE is the default and the
strongest); retainOrdering maps to per-key ordering via Key_Shared
repartition (global ordering does not scale and is refused, matching
the reference where retainOrdering forces one instance).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..envelope import MESSAGE_SCHEMA


class ProcessingGuarantees(Enum):
    """FunctionConfig.ProcessingGuarantees — all three collapse to
    checkpointed micro-batches; EFFECTIVELY_ONCE additionally requires
    the idempotent (overwrite-by-batchId) sink used below."""
    ATLEAST_ONCE = "ATLEAST_ONCE"
    ATMOST_ONCE = "ATMOST_ONCE"
    EFFECTIVELY_ONCE = "EFFECTIVELY_ONCE"


@dataclass
class FunctionConfig:
    """Declarative function deployment (FunctionConfig.java:59-138)."""

    inputs: Sequence[str]                       # topic paths
    output: str                                 # output topic path
    transform: Callable[[DataFrame], DataFrame] = lambda df: df
    dead_letter_topic: str | None = None        # :112
    failed: Column | None = None                # failure predicate for DLQ
    guarantees: ProcessingGuarantees = ProcessingGuarantees.EFFECTIVELY_ONCE
    retain_ordering: bool = False               # :94 — per-key order
    key_col: str = "key"
    user_config: dict[str, str] = field(default_factory=dict)
    checkpoint: str | None = None


def build_input_stream(spark: SparkSession, config: FunctionConfig) -> DataFrame:
    """MultiConsumerPulsarSource: union of the input topic streams with a
    ``topic`` discriminator (JavaInstanceRunnable.readInput:522)."""
    streams = []
    for path in config.inputs:
        s = (spark.readStream.schema(MESSAGE_SCHEMA).parquet(path)
             .withColumn("topic", F.lit(path)))
        streams.append(s)
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out


def run_function(spark: SparkSession, config: FunctionConfig, *,
                 trigger_available_now: bool = False) -> StreamingQuery:
    """Deploy the function: the JavaInstanceRunnable loop as one
    Structured Streaming query.

    Each micro-batch: apply the transform; rows matching ``failed`` go to
    the dead-letter topic (PulsarSinkEffectivelyOnceProcessor analogue:
    both sinks written idempotently per batchId, so checkpoint replay
    cannot duplicate)."""
    stream = build_input_stream(spark, config)
    checkpoint = config.checkpoint or (config.output.rstrip("/") + "_checkpoint")

    def process(batch: DataFrame, batch_id: int) -> None:
        if config.retain_ordering:
            # Key_Shared contract per micro-batch: same key → same task,
            # publish order within. (Streaming plans refuse sorts, so the
            # shuffle+sort lives here on the batch DataFrame — which is
            # also where the reference applies it: per dispatch batch.)
            batch = batch.repartition(F.col(config.key_col)) \
                         .sortWithinPartitions(config.key_col, "sequence")
        result = config.transform(batch)
        ok, dead = result, None
        if config.failed is not None:
            ok = result.filter(~config.failed)
            dead = result.filter(config.failed)
        ok.write.mode("overwrite").parquet(
            os.path.join(config.output, f"batch_id={batch_id}"))
        if dead is not None and config.dead_letter_topic is not None:
            dead.write.mode("overwrite").parquet(
                os.path.join(config.dead_letter_topic, f"batch_id={batch_id}"))

    w = (stream.writeStream.foreachBatch(process)
         .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_output_topic(spark: SparkSession, path: str) -> DataFrame:
    """Read a function's output topic (batch_id partition dirs)."""
    return spark.read.option("basePath", path).parquet(path)
