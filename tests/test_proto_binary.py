"""Pure-Python protobuf wire codec: the encoding docs' own byte
vectors, proto3 presence semantics, and Spark-boundary round trips —
Schema.PROTOBUF_NATIVE payloads without google.protobuf/spark-protobuf
(those jar paths stay package-gated for full distributions)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from incubator_pulsar_spark.functions.proto_binary import (
    decode_message, encode_message, proto_decode, proto_encode,
    proto_wire_descriptor)

PROTO = """
syntax = "proto3";
message Point { sint32 x = 1; sint32 y = 2; }
message Event {
  string name = 1;
  int64 n = 2;
  double score = 3;
  bool flag = 4;
  repeated int32 xs = 5;
  repeated string tags = 6;
  Point p = 7;
  map<string, int64> counts = 8;
  bytes blob = 9;
}
"""

SLOW = settings(max_examples=25, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])


class TestWireVectors:
    """protobuf.dev encoding guide's worked examples."""

    def test_varint_150(self):
        d = proto_wire_descriptor("message T { int32 a = 1; }", "T")
        assert encode_message({"a": 150}, d) == bytes.fromhex("089601")

    def test_string_testing(self):
        d = proto_wire_descriptor("message T { string b = 2; }", "T")
        assert encode_message({"b": "testing"}, d) \
            == bytes.fromhex("120774657374696e67")

    def test_nested_message(self):
        d = proto_wire_descriptor(
            "message T1 { int32 a = 1; } message T3 { T1 c = 3; }", "T3")
        assert encode_message({"c": {"a": 150}}, d) \
            == bytes.fromhex("1a03089601")

    def test_packed_repeated(self):
        d = proto_wire_descriptor("message T { repeated int32 d = 4; }", "T")
        assert encode_message({"d": [3, 270, 86942]}, d) \
            == bytes.fromhex("2206038e029ea705")

    def test_zigzag_sint(self):
        d = proto_wire_descriptor("message T { sint32 s = 1; }", "T")
        assert encode_message({"s": -1}, d) == bytes.fromhex("0801")
        assert encode_message({"s": 1}, d) == bytes.fromhex("0802")

    def test_proto3_presence(self):
        d = proto_wire_descriptor(PROTO, "Event")
        # all-defaults message serializes to NOTHING
        empty = {"name": "", "n": 0, "score": 0.0, "flag": False, "xs": [],
                 "tags": [], "p": None, "counts": {}, "blob": b""}
        assert encode_message(empty, d) == b""
        back = decode_message(b"", d)
        assert back["name"] == "" and back["n"] == 0 and back["p"] is None
        assert back["xs"] == [] and back["counts"] == {}

    def test_unknown_fields_skipped(self):
        full = proto_wire_descriptor(PROTO, "Event")
        v1 = proto_wire_descriptor("message Event { string name = 1; }",
                                   "Event")
        payload = encode_message(
            {"name": "a", "n": 9, "score": 1.5, "flag": True,
             "xs": [1], "tags": ["t"], "p": {"x": -3, "y": 4},
             "counts": {"k": 2}, "blob": b"\x00\x01"}, full)
        assert decode_message(payload, v1) == {"name": "a"}


@given(n=st.integers(-2 ** 63, 2 ** 63 - 1),
       x=st.integers(-2 ** 31, 2 ** 31 - 1),
       name=st.text(max_size=30),
       xs=st.lists(st.integers(-2 ** 31, 2 ** 31 - 1), max_size=8),
       score=st.floats(allow_nan=False, allow_infinity=False))
@SLOW
def test_roundtrip_property(n, x, name, xs, score):
    d = proto_wire_descriptor(PROTO, "Event")
    v = {"name": name, "n": n, "score": score, "flag": True, "xs": xs,
         "tags": ["a", "", "b"], "p": {"x": x, "y": -x if x else 1},
         "counts": {"c": n % 1000}, "blob": b"\x01\x02"}
    back = decode_message(encode_message(v, d), d)
    assert back == v


class TestSparkRoundTrip:
    def test_encode_decode_identity(self, spark):
        rows = [
            Row(id=1, rec=Row(name="ada", n=-42, score=1.5, flag=True,
                              xs=[1, -2, 3], tags=["x"], p=Row(x=-7, y=7),
                              counts={"a": 10}, blob=b"\xde\xad")),
            Row(id=2, rec=Row(name="", n=0, score=0.0, flag=False,
                              xs=[], tags=[], p=None, counts={}, blob=b"")),
        ]
        schema = ("id LONG, rec STRUCT<name: STRING, n: LONG, score: DOUBLE, "
                  "flag: BOOLEAN, xs: ARRAY<INT>, tags: ARRAY<STRING>, "
                  "p: STRUCT<x: INT, y: INT>, counts: MAP<STRING, LONG>, "
                  "blob: BINARY>")
        df = spark.createDataFrame(rows, schema)
        enc = proto_encode(df, "rec", PROTO, "Event")
        dec = proto_decode(enc, "proto", PROTO, "Event", out_col="rec")
        back = {r["id"]: r["rec"] for r in dec.collect()}
        assert back[1].name == "ada" and back[1].n == -42
        assert back[1].p == Row(x=-7, y=7) and back[1].counts == {"a": 10}
        assert bytes(back[1].blob) == b"\xde\xad"
        # proto3 presence: defaults round-trip as defaults, absent
        # message as NULL
        assert back[2].name == "" and back[2].p is None and back[2].xs == []

    def test_enum_fields_rejected_with_clear_error(self):
        with pytest.raises(ValueError, match="enum field"):
            proto_wire_descriptor(
                "enum E { A = 0; } message M { E e = 1; }", "M")
