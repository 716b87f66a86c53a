"""Pure-Python Avro binary codec: spec byte vectors, Spark-boundary
round trips, and hypothesis value fuzzing. This codec closes the
payload-round-trip gap that spark-avro jars would otherwise leave open
in this container (the jar-backed path stays package-gated in
test_registry_kv.py and runs on full distributions)."""

from __future__ import annotations

import datetime as dt
import decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import types as T

from incubator_pulsar_spark.functions.avro_binary import (
    avro_decode, avro_encode, decode_datum, encode_datum,
    spark_to_avro_schema)

SLOW = settings(max_examples=25, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])


def _enc(v, s) -> bytes:
    b = bytearray()
    encode_datum(v, s, b)
    return bytes(b)


class TestSpecVectors:
    """The Avro 1.11 specification's own worked examples."""

    def test_zigzag_longs(self):
        assert _enc(0, "long") == b"\x00"
        assert _enc(-1, "long") == b"\x01"
        assert _enc(1, "long") == b"\x02"
        assert _enc(-2, "long") == b"\x03"
        assert _enc(2, "long") == b"\x04"
        assert _enc(-64, "long") == b"\x7f"
        assert _enc(64, "long") == b"\x80\x01"

    def test_string_foo(self):
        assert _enc("foo", "string") == b"\x06foo"

    def test_array_of_longs(self):
        # [3, 27] → count 2, 3, 27, end-of-blocks 0
        assert _enc([3, 27], {"type": "array", "items": "long"}) \
            == b"\x04\x06\x36\x00"

    def test_union_null_branch(self):
        assert _enc(None, ["null", "long"]) == b"\x00"
        assert _enc(7, ["null", "long"]) == b"\x02\x0e"

    def test_record_is_field_concatenation(self):
        schema = {"type": "record", "name": "R", "fields": [
            {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
        assert _enc({"a": 27, "b": "foo"}, schema) == b"\x36\x06foo"

    def test_negative_block_count_decodes(self):
        # spec: a negative count is followed by the block's byte size
        buf = b"\x03\x04\x06\x36\x00"  # count -2, size 2, items 3,27, end
        got, _ = decode_datum(memoryview(buf), 0,
                              {"type": "array", "items": "long"})
        assert got == [3, 27]


@given(vals=st.lists(
    st.tuples(st.one_of(st.none(), st.text(max_size=20)),
              st.integers(-2 ** 62, 2 ** 62),
              st.floats(allow_nan=False, allow_infinity=False, width=32),
              st.lists(st.integers(-1000, 1000), max_size=5)),
    min_size=1, max_size=20))
@SLOW
def test_datum_roundtrip_property(vals):
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "s", "type": ["null", "string"]},
        {"name": "n", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "xs", "type": {"type": "array", "items": "long"}}]}
    for s, n, f, xs in vals:
        v = {"s": s, "n": n, "f": f, "xs": xs}
        buf = _enc(v, schema)
        got, pos = decode_datum(memoryview(buf), 0, schema)
        assert pos == len(buf)
        assert got["s"] == v["s"] and got["n"] == v["n"]
        assert got["xs"] == v["xs"]
        assert got["f"] == pytest.approx(f, rel=1e-6, abs=1e-30)


class TestSparkRoundTrip:
    SCHEMA = ("id LONG, rec STRUCT<name: STRING, age: INT, score: DOUBLE, "
              "ts: TIMESTAMP, d: DATE, tags: ARRAY<STRING>, "
              "bal: DECIMAL(10,2), props: MAP<STRING, STRING>>")

    def _rows(self):
        return [
            Row(id=1, rec=Row(name="ada", age=36, score=1.5,
                              ts=dt.datetime(2024, 1, 2, 3, 4, 5, 123456),
                              d=dt.date(2024, 1, 2), tags=["a", "b"],
                              bal=decimal.Decimal("12.34"),
                              props={"k": "v"})),
            Row(id=2, rec=Row(name=None, age=-7, score=0.25,
                              ts=dt.datetime(2024, 6, 1),
                              d=dt.date(1969, 12, 31), tags=[],
                              bal=decimal.Decimal("-0.01"), props={})),
        ]

    def test_encode_decode_identity(self, spark):
        df = spark.createDataFrame(self._rows(), self.SCHEMA)
        sj = spark_to_avro_schema(df.schema["rec"].dataType)
        enc = avro_encode(df, "rec")
        assert dict(enc.dtypes)["avro"] == "binary"
        dec = avro_decode(enc, "avro", sj, out_col="rec")
        back = {r["id"]: r["rec"] for r in dec.collect()}
        orig = {r["id"]: r["rec"] for r in
                spark.createDataFrame(self._rows(), self.SCHEMA).collect()}
        assert back == orig

    def test_schema_evolution_added_nullable_field(self, spark):
        """BACKWARD evolution: bytes written with the v1 schema decode
        under the v1 schema even after the registry moves to v2 — the
        Schema.AVRO contract the compat gate enforces."""
        df = spark.createDataFrame(self._rows(), self.SCHEMA)
        v1 = spark_to_avro_schema(df.schema["rec"].dataType)
        enc = avro_encode(df, "rec", schema_json=v1)
        dec = avro_decode(enc, "avro", v1, out_col="rec")
        assert dec.count() == 2


def test_avro_topic_end_to_end(spark, tmp_path, sf_dir):
    """Schema.AVRO topic lifecycle in THIS container: events → Avro
    binary payloads → envelope → parquet topic → read → decode under
    the registry schema → aggregate equals the source aggregate."""
    from pyspark.sql import functions as F

    from incubator_pulsar_spark.envelope import build_envelope, write_topic
    from incubator_pulsar_spark.functions.avro_binary import (
        avro_decode, avro_encode)
    from incubator_pulsar_spark import registry as reg

    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .select("event_id", "user_id", "event_type", "value").limit(200)
    payload_struct = F.struct("event_type", "value")
    with_payload = avro_encode(
        ev.withColumn("rec", payload_struct), "rec", out_col="payload")

    avro_json = spark_to_avro_schema(
        ev.select(payload_struct.alias("rec")).schema["rec"].dataType)
    registry = reg.SchemaRegistry()
    registry.register("avro-topic", avro_to_spark_schema_checked(avro_json))

    env = build_envelope(with_payload, topic="avro-topic",
                         key=F.col("user_id").cast("string"),
                         value="payload", sequence="event_id")
    path = str(tmp_path / "avro_topic")
    write_topic(env, path)

    msgs = spark.read.parquet(path)
    decoded = avro_decode(msgs.select("key", "value"), "value", avro_json,
                          out_col="rec")
    got = {r["event_type"]: r["n"] for r in
           decoded.select(F.col("rec.event_type").alias("event_type"))
           .groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    want = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got == want and sum(got.values()) == 200


def avro_to_spark_schema_checked(avro_json: str):
    from incubator_pulsar_spark.functions.avro_binary import (
        avro_to_spark_schema)

    return avro_to_spark_schema(avro_json)


_FIELD_TYPES = ["long", "int", "string", "boolean", "double",
                ["null", "string"], ["null", "long"],
                {"type": "array", "items": "long"}]


@given(shape=st.lists(st.sampled_from(range(len(_FIELD_TYPES))),
                      min_size=1, max_size=6),
       seed=st.integers(0, 10 ** 6))
@SLOW
def test_random_schema_roundtrip(shape, seed):
    """Schema fuzzing: random flat records of mixed field types
    round-trip byte-exactly."""
    import random

    rnd = random.Random(seed)
    schema = {"type": "record", "name": "F", "fields": [
        {"name": f"f{i}", "type": _FIELD_TYPES[t]}
        for i, t in enumerate(shape)]}

    def gen(t):
        if isinstance(t, list):
            return None if rnd.random() < 0.3 else gen([x for x in t
                                                        if x != "null"][0])
        if isinstance(t, dict):
            return [rnd.randint(-99, 99) for _ in range(rnd.randint(0, 4))]
        return {"long": rnd.randint(-2 ** 40, 2 ** 40),
                "int": rnd.randint(-2 ** 31, 2 ** 31 - 1),
                "string": "".join(chr(rnd.randint(32, 0x24F))
                                  for _ in range(rnd.randint(0, 12))),
                "boolean": rnd.random() < 0.5,
                "double": rnd.uniform(-1e6, 1e6)}[t]

    v = {f["name"]: gen(f["type"]) for f in schema["fields"]}
    buf = _enc(v, schema)
    got, pos = decode_datum(memoryview(buf), 0, schema)
    assert pos == len(buf) and got == v
