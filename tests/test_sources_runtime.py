"""Tests for sources/connectors.py and functions/runtime.py."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_pulsar_spark.functions import runtime as rt
from incubator_pulsar_spark.sources import connectors as con


# ----------------------------------------------------------------- sources

def test_data_generator_deterministic(spark):
    a = con.data_generator(spark, 10).collect()
    b = con.data_generator(spark, 10).collect()
    assert a == b
    assert a[0].name and 18 <= a[0].age < 78


def test_batch_file_source_lifecycle(spark, tmp_path):
    for i in range(3):
        spark.range(5).withColumn("f", F.lit(i)).write.parquet(str(tmp_path / f"f{i}.pq"))
    src = con.BatchFileSource(spark, str(tmp_path / "*.pq"))
    assert len(src.discover()) == 3
    assert src.discover() == []  # already seen
    dfs = list(src.read_all())
    assert len(dfs) == 3
    assert sum(d.count() for d in dfs) == 15
    # new file lands → next discover picks only it
    spark.range(2).withColumn("f", F.lit(9)).write.parquet(str(tmp_path / "f9.pq"))
    assert len(src.discover()) == 1
    assert src.read_next().count() == 2


def test_multi_topic_union_and_pattern(spark, tmp_path):
    base = tmp_path / "topics"
    for name, n in [("orders-a", 3), ("orders-b", 4), ("audit", 2)]:
        spark.range(n).write.parquet(str(base / name))
    df = con.subscribe_pattern(spark, str(base), r"orders-.*")
    assert df.count() == 7
    assert set(r.topic for r in df.select("topic").distinct().collect()) == \
        {"orders-a", "orders-b"}
    with pytest.raises(ValueError):
        con.subscribe_pattern(spark, str(base), r"nope-.*")


def test_file_source_stream_rate_limited(spark, tmp_path):
    src_dir = tmp_path / "in"
    os.makedirs(src_dir)
    for i in range(4):
        spark.range(3).write.parquet(str(src_dir / f"b{i}.pq"))
    schema = T.StructType([T.StructField("id", T.LongType())])
    stream = con.file_source_stream(spark, str(src_dir / "*"), fmt="parquet",
                                    schema=schema, max_files_per_trigger=1)
    q = con.file_sink(stream, str(tmp_path / "out"), checkpoint=str(tmp_path / "ck"),
                      trigger_available_now=True)
    q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 12


# ----------------------------------------------------------------- runtime

def test_apply_function_null_drop(spark):
    df = spark.createDataFrame([Row(value="a"), Row(value="skip"), Row(value="b")])

    def upper_or_none(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v == "skip" else v.upper())

    out = rt.apply_function(df, upper_or_none)
    assert sorted(r.result for r in out.collect()) == ["A", "B"]


def test_apply_flatmap(spark):
    df = spark.createDataFrame([Row(n=2), Row(n=3)])
    schema = T.StructType([T.StructField("n", T.LongType()),
                           T.StructField("i", T.LongType())])

    def expand(batches):
        for pdf in batches:
            yield pd.DataFrame([(int(n), int(i)) for n in pdf["n"] for i in range(n)],
                               columns=["n", "i"])

    out = rt.apply_flatmap(df, expand, schema)
    assert out.count() == 5  # 2 + 3


def test_serde_roundtrip(spark):
    df = spark.createDataFrame([Row(a=1, b="x")]).select(F.struct("a", "b").alias("s"))
    schema = "a INT, b STRING"
    back = df.select(rt.json_deserialize(rt.json_serialize(F.col("s")), schema).alias("s"))
    assert back.select("s.a", "s.b").collect() == [Row(a=1, b="x")]


def test_entry_filter_three_way(spark):
    df = spark.createDataFrame([Row(v=i) for i in range(10)])
    decision = (
        F.when(F.col("v") % 3 == 0, "ACCEPT")
        .when(F.col("v") % 3 == 1, "REJECT")
        .otherwise("RESCHEDULE")
    )
    split = rt.entry_filter(df, decision)
    assert split.accepted.count() == 4   # 0 3 6 9
    assert split.rejected.count() == 3   # 1 4 7
    assert split.rescheduled.count() == 3  # 2 5 8


def test_interceptors_compose(spark):
    df = spark.createDataFrame([Row(v=1)])
    out = rt.intercept(
        df,
        lambda d: d.withColumn("v", F.col("v") + 1),
        lambda d: d.withColumn("v", F.col("v") * 10),
    )
    assert out.collect() == [Row(v=20)]


def test_context_metrics_observe(spark):
    ctx = rt.FunctionContext(user_config={"k": "v"})
    assert ctx.get_user_config_value("k") == "v"
    assert ctx.get_user_config_value("missing", "d") == "d"
    ctx.record_metric("n_rows", F.count(F.lit(1)))
    df = ctx.attach_metrics(spark.range(7))
    df.collect()  # observation fires on action


def test_chunk_reassemble_roundtrip(spark):
    payload = b"x" * 150 + b"END"
    df = spark.createDataFrame([Row(sequence=1, value=bytearray(payload)),
                                Row(sequence=2, value=bytearray(b"tiny"))])
    chunked = rt.chunk_payloads(df, chunk_bytes=64)
    # 153 bytes → 3 chunks; 4 bytes → 1 chunk
    assert chunked.count() == 4
    back = rt.reassemble_chunks(chunked)
    got = {r.sequence: bytes(r.value) for r in back.collect()}
    assert got == {1: payload, 2: b"tiny"}


def test_reassemble_holds_incomplete(spark):
    df = spark.createDataFrame([Row(sequence=1, value=bytearray(b"x" * 150))])
    chunked = rt.chunk_payloads(df, chunk_bytes=64)
    partial = chunked.filter(F.col("chunk_id") != 1)  # drop middle chunk
    assert rt.reassemble_chunks(partial).count() == 0


def test_side_outputs(spark, tmp_path):
    df = spark.createDataFrame([Row(v=i) for i in range(6)])
    counts = rt.publish_side_outputs(
        df, {"even": F.col("v") % 2 == 0, "big": F.col("v") > 3}, str(tmp_path))
    assert counts == {"even": 3, "big": 2}
    assert spark.read.parquet(str(tmp_path / "even")).count() == 3


def test_kafka_source_requires_target(spark):
    with pytest.raises(ValueError):
        con.kafka_source_stream(spark, bootstrap_servers="b:9092")


# ----------------------------------------------------- jdbc upsert/delete

def _sqlite_factory(db_path):
    def factory():
        import sqlite3

        return sqlite3.connect(db_path)
    return factory


def _sqlite_rows(db_path):
    import sqlite3

    with sqlite3.connect(db_path) as c:
        return sorted(c.execute("SELECT k, v FROM kv").fetchall())


def test_jdbc_merge_sink_upsert_delete(spark, tmp_path):
    """BaseJdbcAutoSchemaSink semantics end-to-end against a real SQL
    engine (sqlite is DBAPI + ON CONFLICT — the dialect family the
    reference's sqlite/postgres/clickhouse sinks target)."""
    import sqlite3

    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT)")

    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").coalesce(1)
    con.jdbc_merge_sink_batch(b1, table="kv", key_cols=["k"],
                              connection_factory=_sqlite_factory(db))
    assert _sqlite_rows(db) == [(1, "a"), (2, "b")]

    # second batch: per-row ACTION property (reference's message ACTION):
    # update k=2, insert k=3, delete k=1
    b2 = spark.createDataFrame(
        [(2, "B", "UPSERT"), (3, "c", "INSERT"), (1, None, "DELETE")],
        "k int, v string, action string").coalesce(1)
    con.jdbc_merge_sink_batch(b2, table="kv", key_cols=["k"],
                              connection_factory=_sqlite_factory(db),
                              action_col="action")
    assert _sqlite_rows(db) == [(2, "B"), (3, "c")]

    # upsert replay is idempotent (at-least-once → converged state)
    con.jdbc_merge_sink_batch(
        b2.filter(F.col("action") == "UPSERT"), table="kv", key_cols=["k"],
        connection_factory=_sqlite_factory(db), action_col="action")
    assert _sqlite_rows(db) == [(2, "B"), (3, "c")]


def test_jdbc_merge_sink_stream(spark, tmp_path):
    import sqlite3

    db = str(tmp_path / "s.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT)")
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a"), (2, "b"), (2, "b2")],
                          "k int, v string").coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = con.jdbc_merge_sink_stream(
        stream.coalesce(1), table="kv", key_cols=["k"],
        connection_factory=_sqlite_factory(db),
        checkpoint=str(tmp_path / "ck"), trigger_available_now=True)
    q.awaitTermination(120)
    got = dict(_sqlite_rows(db))
    assert got[1] == "a" and got[2] in ("b", "b2")  # last-writer per key


def test_jdbc_sql_builders():
    assert con.jdbc_insert_sql("t", ["a", "b"]) == \
        "INSERT INTO t (a, b) VALUES (?, ?)"
    up = con.jdbc_upsert_sql("t", ["a", "b"], ["a"])
    assert "ON CONFLICT(a) DO UPDATE SET b=excluded.b" in up
    assert con.jdbc_delete_sql("t", ["a", "b"]) == \
        "DELETE FROM t WHERE a = ? AND b = ?"


def test_kafka_record_translation_round_trip(spark):
    """KafkaRecord -> envelope -> kafka writer projection, with no
    kafka package: the translations are pure column expressions over
    the well-known schemas."""
    import datetime as dt

    from incubator_pulsar_spark.sources.connectors import (
        kafka_records_to_messages, messages_to_kafka_records)
    from pyspark.sql import Row

    t0 = dt.datetime(2024, 1, 1)
    records = spark.createDataFrame(
        [Row(key=b"k1", value=b"v1", topic="src", partition=0, offset=100,
             timestamp=t0),
         Row(key=None, value=b"v2", topic="src", partition=1, offset=101,
             timestamp=t0 + dt.timedelta(seconds=1))],
        "key BINARY, value BINARY, topic STRING, partition INT, "
        "offset LONG, timestamp TIMESTAMP")
    msgs = kafka_records_to_messages(records)
    by_seq = {r.sequence: r for r in msgs.collect()}
    assert by_seq[100].key == "k1" and bytes(by_seq[100].value) == b"v1"
    assert by_seq[100].producer_name == "kafka-src-0"
    assert by_seq[100].event_time == t0
    assert by_seq[101].key is None  # unkeyed records stay unkeyed

    out = messages_to_kafka_records(msgs, topic="dst").collect()
    got = {bytes(r.value): r for r in out}
    assert bytes(got[b"v1"].key) == b"k1" and got[b"v1"].topic == "dst"
    assert got[b"v2"].key is None
