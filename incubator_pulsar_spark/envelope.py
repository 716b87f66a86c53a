"""Message-envelope data model (SURVEY §1.1).

The reference's unit of data is a *message* on a *topic* — an append-only
partitioned log. Envelope fields mirror the public client API
(``pulsar-client-api/.../Message.java:41-209`` and the wire metadata
``pulsar-common/src/main/proto/PulsarApi.proto:106-166``):

properties, payload, message-id (ledger/entry/partition/batch), publish
time, event time, sequence id, producer name, partition key, ordering
key, redelivery count, deliver-at time (delayed delivery).

Spark mapping: one DataFrame per topic, one row per message. The
(ledger_id, entry_id) total order collapses to a single ``sequence``
LONG per (topic, partition) — Kafka-style offsets, which is also what
Spark's own source-offset model expects.

Scale note: a topic at 100 TB is parquet partitioned by
``partition_date(publish_time)`` and bucketed-or-sorted by ``key`` where
compaction will run; min/max stats on ``publish_time`` give
seek-by-timestamp for free (the reference needs a binary search over
ledger boundaries — ``PersistentMessageFinder.java:63`` — Spark gets it
from parquet footer pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Envelope schema — Message.java:41-209 / PulsarApi.proto:106-166.
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("sequence", T.LongType(), False),  # (ledger,entry) order
        T.StructField("key", T.StringType(), True),  # partition key
        T.StructField("value", T.BinaryType(), True),  # raw payload; null=tombstone
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("publish_time", T.TimestampType(), False),
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("producer_name", T.StringType(), True),
        T.StructField("sequence_id", T.LongType(), True),  # per-producer, dedup
        T.StructField("ordering_key", T.BinaryType(), True),
        T.StructField("deliver_at", T.TimestampType(), True),  # delayed delivery
        T.StructField("redelivery_count", T.IntegerType(), False),
    ]
)

ENVELOPE_COLUMNS = [f.name for f in MESSAGE_SCHEMA.fields]


def topic_name(tenant: str = "public", namespace: str = "default", name: str = "topic",
               persistent: bool = True) -> str:
    """Fully-qualified topic name: {persistent|non-persistent}://tenant/ns/name."""
    scheme = "persistent" if persistent else "non-persistent"
    return f"{scheme}://{tenant}/{namespace}/{name}"


def build_envelope(
    df: DataFrame,
    *,
    topic: str,
    key: Column | str | None = None,
    value: Column | str | None = None,
    event_time: Column | str | None = None,
    publish_time: Column | str | None = None,
    sequence: Column | str | None = None,
    producer_name: Column | str | None = None,
    sequence_id: Column | str | None = None,
    properties: Column | str | None = None,
    deliver_at: Column | str | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """Wrap arbitrary rows into the message envelope (TypedMessageBuilder,
    ``TypedMessageBuilder.java:114-214``).

    ``partition`` is assigned by the default router: hash(key) % n for
    keyed rows (RoundRobinPartitionMessageRouterImpl.java:74-77), a
    stable spread for unkeyed rows. Pure column expressions — stays in
    whole-stage codegen, no shuffle until the caller asks for one.
    """
    def _c(x, default=None):
        if x is None:
            return default
        return F.col(x) if isinstance(x, str) else x

    key_c = _c(key, F.lit(None).cast("string")).cast("string")
    seq_c = _c(sequence)
    if seq_c is None:
        seq_c = F.monotonically_increasing_id()
    pub_c = _c(publish_time, F.current_timestamp())
    part_c = F.when(
        key_c.isNotNull(), F.pmod(F.hash(key_c), F.lit(num_partitions))
    ).otherwise(F.pmod(F.xxhash64(seq_c), F.lit(num_partitions))).cast("int")

    val_c = _c(value, F.lit(None).cast("binary"))
    val_c = val_c.cast("binary") if value is not None else val_c

    return df.select(
        F.lit(topic).alias("topic"),
        part_c.alias("partition"),
        seq_c.cast("long").alias("sequence"),
        key_c.alias("key"),
        val_c.alias("value"),
        _c(properties, F.lit(None).cast("map<string,string>")).alias("properties"),
        pub_c.cast("timestamp").alias("publish_time"),
        _c(event_time, F.lit(None).cast("timestamp")).cast("timestamp").alias("event_time"),
        _c(producer_name, F.lit(None).cast("string")).alias("producer_name"),
        _c(sequence_id, seq_c).cast("long").alias("sequence_id"),
        F.lit(None).cast("binary").alias("ordering_key"),
        _c(deliver_at, F.lit(None).cast("timestamp")).cast("timestamp").alias("deliver_at"),
        F.lit(0).alias("redelivery_count"),
    )


def events_as_messages(spark: SparkSession, sf_dir: str, num_partitions: int = 32) -> DataFrame:
    """The driver's ``events`` table viewed as a topic of messages.

    key = user_id, sequence = event_id (publish order), event_time = ts,
    payload = JSON of the business fields. This is the fixture every
    Pulsar-semantics operator test runs against.
    """
    from .session import read_table

    ev = read_table(spark, sf_dir, "events")  # handles TIMESTAMP(NANOS) files
    payload = F.to_json(F.struct("event_type", "value", "props"))
    return build_envelope(
        ev,
        topic=topic_name(name="events"),
        key=F.col("user_id").cast("string"),
        value=payload,
        event_time="ts",
        publish_time="ts",
        sequence="event_id",
        producer_name=F.concat(F.lit("producer-"), (F.col("user_id") % 8).cast("string")),
        sequence_id="event_id",
        num_partitions=num_partitions,
    )


def read_topic(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read a topic stored as parquet (the Reader API, Reader.java:49)."""
    return spark.read.parquet(path)


# CompressionType.java:31-43 (NONE/LZ4/ZLIB/ZSTD/SNAPPY) → parquet codec.
# Per-message compression collapses to per-file codec here: the payload
# column is compressed inside the parquet pages, which is the columnar
# analogue (and strictly better — dictionary+page compression sees across
# messages). ZLIB maps to gzip (same DEFLATE family).
COMPRESSION_CODECS = {
    "NONE": "uncompressed",
    "LZ4": "lz4",
    "ZLIB": "gzip",
    "ZSTD": "zstd",
    "SNAPPY": "snappy",
}


def write_topic(df: DataFrame, path: str, mode: str = "append",
                compression: str | None = None,
                partition_by_date: bool = False) -> None:
    """Producer.send for a whole DataFrame: append to the topic log.

    Partitioned by ``partition`` so per-partition order (sequence) maps
    to file order within a partition directory. ``compression`` takes a
    reference CompressionType name (LZ4/ZLIB/ZSTD/SNAPPY/NONE) and maps
    it to the parquet codec; default leaves the session codec in force.

    ``partition_by_date=True`` adds a ``publish_date`` directory level
    derived from ``publish_time`` — the ledger-rollover analogue. At
    100 TB this is what makes seek-by-timestamp, TTL expiry and
    retention O(touched days) instead of O(topic):
    ``subscriptions.seek_timestamp`` adds the implied
    ``publish_date >= date(X)`` bound (Spark cannot derive it from the
    row filter), which becomes a PartitionFilter that never lists the
    pruned directories; retention is a directory delete (the reference
    gets the same effect from ledger boundaries,
    PersistentMessageFinder.java:63).
    """
    cols = ["partition"]
    if partition_by_date:
        df = df.withColumn("publish_date", F.to_date(F.col("publish_time")))
        cols = ["publish_date", "partition"]
    w = df.write.mode(mode).partitionBy(*cols)
    if compression is not None:
        w = w.option("compression", COMPRESSION_CODECS[compression.upper()])
    w.parquet(path)


def write_topic_bucketed(
    df: DataFrame, table: str, *, num_buckets: int = 32,
    bucket_col: str = "key", sort_col: str = "sequence",
    mode: str = "overwrite",
) -> None:
    """Key-bucketed topic layout: pre-pay the key shuffle once at write.

    Every per-key operator — compaction (``groupBy(key)``), TableView,
    Key_Shared dispatch, key-joins between topics — shuffles on ``key``.
    Bucketing the stored topic by key (``bucketBy`` + in-bucket
    ``sortBy(sequence)``) makes all of those Exchange-free for any
    reader using the same bucket spec: two topics bucketed the same way
    join with ZERO shuffle (see tests/test_plans.py bucketed-join lock).
    At 100 TB this is the difference between re-shuffling the corpus
    per query and reading co-located buckets; the in-bucket sequence
    sort also gives compaction its publish-order scan without a sort
    step. This is the Spark analogue of the broker's stable
    key→partition routing (RoundRobinPartitionMessageRouterImpl) made
    durable in storage.
    """
    (df.write.mode(mode).format("parquet")
       .bucketBy(num_buckets, bucket_col).sortBy(sort_col)
       .saveAsTable(table))


def read_topic_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed topic table (bucket metadata flows into the plan —
    joins/aggs on the bucket column skip their Exchange)."""
    return spark.table(table)


def read_topic_stream(
    spark: SparkSession, path: str, schema=MESSAGE_SCHEMA, *,
    starting_sequence: int | None = None,
    starting_timestamp=None,
) -> DataFrame:
    """Streaming tail of a topic directory (Consumer.receive loop).

    File-source streaming: each new parquet file is a micro-batch of
    messages — the analogue of the broker dispatcher pushing entries
    (``PersistentDispatcherMultipleConsumers.readMoreEntries``).

    ``starting_sequence`` / ``starting_timestamp`` are the streaming
    forms of ``Consumer.seek`` (Consumer.java:513,525): expressed as
    filters, which parquet row-group stats prune before read — the
    analogue of restarting a Kafka-style stream from an offset.
    """
    s = spark.readStream.schema(schema).parquet(path)
    if starting_sequence is not None:
        s = s.filter(F.col("sequence") >= starting_sequence)
    if starting_timestamp is not None:
        s = s.filter(F.col("publish_time") >= starting_timestamp)
    return s
