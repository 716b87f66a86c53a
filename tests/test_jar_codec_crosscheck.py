"""Jar-backed wire-codec cross-checks (VERDICT r7 #6, carried since r5).

The container has no spark-avro / spark-protobuf CONNECTOR jars (that
gate stays documented in PARITY.md), but it ships the exact runtimes
those connectors delegate to, already on the session JVM's classpath:

- ``avro-1.12.1.jar`` — org.apache.avro's GenericDatumWriter/Reader,
  the engine spark-avro's to_avro/from_avro call into;
- Spark's RELOCATED protobuf-java
  (``org.sparkproject.spark_core.protobuf`` inside spark-core), the
  same CodedOutputStream byte layout protobuf-java produces.

Encoding the fixture shapes with THOSE through py4j and asserting
byte-for-byte equality against the pure-Python codecs is the
same-engine cross-check the connector tests would have run — the
connector layers add no bytes of their own on the wire.
"""

from __future__ import annotations

import json

import pytest

from incubator_pulsar_spark.functions.avro_binary import (
    decode_datum, encode_datum)
from incubator_pulsar_spark.functions.proto_binary import (
    decode_message, encode_message, proto_wire_descriptor)


def _jvm_or_skip(spark, probe):
    jvm = spark._jvm
    try:
        probe(jvm)
    except Exception:  # class not on this distribution's classpath
        pytest.skip("jar runtime absent in this container")
    return jvm


# ------------------------------------------------------------------ Avro

AVRO_SCHEMA = {
    "type": "record", "name": "Env", "fields": [
        {"name": "n", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        # union branch is "int" (same zigzag-varint wire bytes as
        # "long"): py4j auto-unboxes java.lang.Long back to a Python
        # int, so the datum reaches Avro's STRICT union resolver as an
        # Integer — non-union long fields are fine (Number.longValue())
        {"name": "opt", "type": ["null", "int"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "counts", "type": {"type": "map", "values": "long"}},
        {"name": "p", "type": {"type": "record", "name": "P", "fields": [
            {"name": "x", "type": "long"},
            {"name": "y", "type": "string"}]}},
    ],
}

PY_VAL = {"n": -42, "s": "héllo ✓", "d": 2.5, "b": True,
          "raw": b"\x00\xff\x01", "opt": None, "xs": [1, -2, 300],
          "counts": {"a": 1, "bb": -7}, "p": {"x": -3, "y": "inner"}}


def _java_avro_bytes(jvm, opt_value):
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(AVRO_SCHEMA))
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    rec.put("n", -42)
    rec.put("s", "héllo ✓")
    rec.put("d", 2.5)
    rec.put("b", True)
    rec.put("raw", jvm.java.nio.ByteBuffer.wrap(b"\x00\xff\x01"))
    rec.put("opt", opt_value)
    xs = jvm.java.util.ArrayList()
    for v in (1, -2, 300):
        xs.add(v)
    rec.put("xs", xs)
    counts = jvm.java.util.LinkedHashMap()  # same order as the dict
    counts.put("a", 1)
    counts.put("bb", -7)
    rec.put("counts", counts)
    # the nested record's schema sits under the field
    psch = schema.getField("p").schema()
    p = jvm.org.apache.avro.generic.GenericData.Record(psch)
    p.put("x", -3)
    p.put("y", "inner")
    rec.put("p", p)

    baos = jvm.java.io.ByteArrayOutputStream()
    enc = jvm.org.apache.avro.io.EncoderFactory.get() \
        .binaryEncoder(baos, None)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    writer.write(rec, enc)
    enc.flush()
    return bytes(baos.toByteArray())


@pytest.mark.parametrize("opt", [None, 99])
def test_avro_bytes_equal_java_runtime(spark, opt):
    """Every branch of the fixture record — zigzag longs, UTF-8
    strings, IEEE doubles, bytes, both union branches, blocked arrays
    and maps, nested records — must serialize byte-identically to
    org.apache.avro's GenericDatumWriter."""
    jvm = _jvm_or_skip(
        spark, lambda j: j.org.apache.avro.Schema.Parser())
    want = _java_avro_bytes(jvm, opt)
    out = bytearray()
    encode_datum({**PY_VAL, "opt": opt}, AVRO_SCHEMA, out)
    assert bytes(out) == want
    # and our decoder reads the JAVA bytes back to the source value
    got, pos = decode_datum(want, 0, AVRO_SCHEMA)
    assert pos == len(want)
    assert got == {**PY_VAL, "opt": opt}


# -------------------------------------------------------------- Protobuf

PROTO = """
syntax = "proto3";
message Point { sint32 x = 1; sint32 y = 2; }
message J {
  string name = 1;
  int64 n = 2;
  sint64 sn = 3;
  double score = 4;
  bool flag = 5;
  bytes blob = 6;
  Point p = 7;
  int32 neg = 8;
  repeated int32 xs = 9;
}
"""

J_VAL = {"name": "héllo ✓", "n": 1234567890123, "sn": -987654321,
         "score": 2.5, "flag": True, "blob": b"\x00\xff\x01",
         "p": {"x": -3, "y": 4}, "neg": -5, "xs": [3, 270, 86942]}


def _java_proto_bytes(jvm):
    P = jvm.org.sparkproject.spark_core.protobuf

    def cos_pair():
        baos = jvm.java.io.ByteArrayOutputStream()
        return baos, P.CodedOutputStream.newInstance(baos)

    # nested Point and the packed-repeated body are LEN-framed bodies
    ib, ic = cos_pair()
    ic.writeSInt32(1, -3)
    ic.writeSInt32(2, 4)
    ic.flush()
    inner = bytes(ib.toByteArray())
    pb, pc = cos_pair()
    for v in (3, 270, 86942):
        pc.writeInt32NoTag(v)
    pc.flush()
    packed = bytes(pb.toByteArray())

    baos, cos = cos_pair()
    cos.writeString(1, "héllo ✓")
    cos.writeInt64(2, 1234567890123)
    cos.writeSInt64(3, -987654321)
    cos.writeDouble(4, 2.5)
    cos.writeBool(5, True)
    cos.writeByteArray(6, b"\x00\xff\x01")
    cos.writeByteArray(7, inner)   # identical framing to writeMessage
    cos.writeInt32(8, -5)          # 10-byte sign-extended varint
    cos.writeByteArray(9, packed)  # packed repeated = LEN-framed body
    cos.flush()
    return bytes(baos.toByteArray())


def test_proto_bytes_equal_java_runtime(spark):
    """Tags, varints (incl. the 10-byte negative-int32 case), zigzag
    sints, IEEE doubles, UTF-8 strings, LEN framing for bytes / nested
    messages / packed repeateds — byte-identical to protobuf-java's
    CodedOutputStream (Spark's relocated copy)."""
    jvm = _jvm_or_skip(
        spark,
        lambda j: j.org.sparkproject.spark_core.protobuf.CodedOutputStream)
    want = _java_proto_bytes(jvm)
    desc = proto_wire_descriptor(PROTO, "J")
    assert encode_message(J_VAL, desc) == want
    assert decode_message(want, desc) == J_VAL
