"""Pure-Python Avro BINARY codec — payload round-trip without jars.

The reference's ``Schema.AVRO`` (pulsar-client-api Schema.java:286-330)
serializes each message payload as Avro *binary datum* bytes (no file
container; the schema travels through the registry). Spark's
``to_avro``/``from_avro`` need the spark-avro jars, absent from pip
pyspark — so this module implements the Avro 1.11 binary encoding
(specification §"Binary Encoding": zigzag-varint longs, little-endian
IEEE floats, length-prefixed bytes/strings, block-encoded arrays/maps,
varint-indexed unions) directly, for the schema subset
``spark_to_avro_schema`` emits: primitives, record, array, map,
``[null, T]`` unions, and the date / timestamp-micros / decimal
logical types.

Correctness anchors (tests/test_round4b.py): the spec's own worked
byte vectors (zigzag 0→00, -1→01, 1→02; "foo"→06 66 6f 6f; array
[3,27]→04 06 36 00), plus hypothesis round-trip properties through the
Spark Arrow boundary.

Scale shape: encode/decode run as ``mapInPandas`` Arrow kernels —
payloads stream through executors batch-wise, nothing touches the
driver. Python-per-byte cost is the price of jar-freedom; on a full
distribution ``codecs.avro_serialize`` (JVM) is the hot path and this
module is the verification twin + fallback.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import struct as _struct
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .codecs import avro_to_spark_schema, spark_to_avro_schema

__all__ = ["encode_datum", "decode_datum", "avro_encode", "avro_decode",
           "spark_to_avro_schema", "avro_to_spark_schema"]

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH = _dt.datetime(1970, 1, 1)


# ------------------------------------------------------------- primitives

def _write_long(out: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63) if n >= -(1 << 63) else 0
    z &= (1 << 64) - 1
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _norm_type(schema: Any) -> Any:
    # {"type": "string"} wrapper form → "string"; logical types keep dict
    if isinstance(schema, dict) and isinstance(schema.get("type"), str) \
            and schema["type"] not in ("record", "array", "map", "enum",
                                       "fixed") \
            and "logicalType" not in schema:
        return schema["type"]
    return schema


# ---------------------------------------------------------------- encoder

def encode_datum(value: Any, schema: Any, out: bytearray) -> None:
    schema = _norm_type(schema)
    if isinstance(schema, list):  # [null, T] union
        non_null = [s for s in schema if s != "null"]
        if value is None:
            _write_long(out, schema.index("null"))
            return
        branch = schema.index(non_null[0])
        _write_long(out, branch)
        encode_datum(value, non_null[0], out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if value else 0)
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out.extend(_struct.pack("<f", float(value)))
        return
    if schema == "double":
        out.extend(_struct.pack("<d", float(value)))
        return
    if schema == "string":
        raw = str(value).encode("utf-8")
        _write_long(out, len(raw))
        out.extend(raw)
        return
    if schema == "bytes":
        raw = bytes(value)
        _write_long(out, len(raw))
        out.extend(raw)
        return
    assert isinstance(schema, dict), f"unsupported Avro type {schema!r}"
    logical = schema.get("logicalType")
    if logical == "date":
        d = value.date() if isinstance(value, _dt.datetime) else value
        _write_long(out, (d - _EPOCH_DATE).days)
        return
    if logical in ("timestamp-micros", "timestamp-millis"):
        if hasattr(value, "to_pydatetime"):  # pd.Timestamp
            value = value.to_pydatetime()
        micros = round((value - _EPOCH).total_seconds() * 1e6)
        _write_long(out, micros if logical == "timestamp-micros"
                    else micros // 1000)
        return
    if logical == "decimal":
        unscaled = int(_decimal.Decimal(value).scaleb(schema["scale"])
                       .to_integral_value())
        length = max(1, (unscaled.bit_length() + 8) // 8)
        raw = unscaled.to_bytes(length, "big", signed=True)
        _write_long(out, len(raw))
        out.extend(raw)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            encode_datum(None if value is None else value.get(f["name"]),
                         f["type"], out)
        return
    if t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for it in items:
                encode_datum(it, schema["items"], out)
        _write_long(out, 0)
        return
    if t == "map":
        entries = (list(value.items()) if isinstance(value, dict)
                   else [tuple(e) for e in value])  # Arrow maps → pair list
        if entries:
            _write_long(out, len(entries))
            for k, v in entries:
                encode_datum(k, "string", out)
                encode_datum(v, schema["values"], out)
        _write_long(out, 0)
        return
    raise ValueError(f"unsupported Avro type {schema!r}")


# ---------------------------------------------------------------- decoder

def decode_datum(buf, pos: int, schema: Any) -> tuple[Any, int]:
    schema = _norm_type(schema)
    if isinstance(schema, list):
        idx, pos = _read_long(buf, pos)
        branch = schema[idx]
        if branch == "null":
            return None, pos
        return decode_datum(buf, pos, branch)
    if schema == "null":
        return None, pos
    if schema == "boolean":
        return buf[pos] == 1, pos + 1
    if schema in ("int", "long"):
        return _read_long(buf, pos)
    if schema == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if schema == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if schema == "string":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos:pos + n]).decode("utf-8"), pos + n
    if schema == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos:pos + n]), pos + n
    assert isinstance(schema, dict), f"unsupported Avro type {schema!r}"
    logical = schema.get("logicalType")
    if logical == "date":
        days, pos = _read_long(buf, pos)
        return _EPOCH_DATE + _dt.timedelta(days=days), pos
    if logical in ("timestamp-micros", "timestamp-millis"):
        n, pos = _read_long(buf, pos)
        micros = n if logical == "timestamp-micros" else n * 1000
        return _EPOCH + _dt.timedelta(microseconds=micros), pos
    if logical == "decimal":
        n, pos = _read_long(buf, pos)
        unscaled = int.from_bytes(bytes(buf[pos:pos + n]), "big", signed=True)
        return (_decimal.Decimal(unscaled).scaleb(-schema["scale"]),
                pos + n)
    t = schema["type"]
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = decode_datum(buf, pos, f["type"])
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with byte-size prefix (spec-legal)
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = decode_datum(buf, pos, schema["items"])
                items.append(v)
    if t == "map":
        entries = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return entries, pos
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = decode_datum(buf, pos, "string")
                entries[k], pos = decode_datum(buf, pos, schema["values"])
    raise ValueError(f"unsupported Avro type {schema!r}")


# ---------------------------------------------------- Spark integration

def avro_encode(df: DataFrame, struct_col: str,
                schema_json: str | None = None,
                out_col: str = "avro") -> DataFrame:
    """Struct column → Avro binary datum column (other columns pass
    through). ``schema_json`` defaults to the schema generated from the
    column's own StructType (Schema.AVRO's AvroSchema.of path)."""
    struct_type = df.schema[struct_col].dataType
    if not isinstance(struct_type, T.StructType):
        raise ValueError(f"{struct_col} must be a struct column")
    schema = json.loads(schema_json or spark_to_avro_schema(struct_type))
    others = [f for f in df.schema.fields if f.name != struct_col]
    out_schema = T.StructType(others + [T.StructField(out_col, T.BinaryType())])

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = []
            for cell in pdf[struct_col]:
                buf = bytearray()
                encode_datum(cell, schema, buf)
                payloads.append(bytes(buf))
            res = pdf.drop(columns=[struct_col])
            res[out_col] = payloads
            yield res

    return df.mapInPandas(kernel, out_schema)


def avro_decode(df: DataFrame, bin_col: str, schema_json: str,
                out_col: str = "record") -> DataFrame:
    """Avro binary datum column → struct column typed from the reader
    schema (the registry's AUTO_CONSUME direction)."""
    schema = json.loads(schema_json)
    struct_type = avro_to_spark_schema(schema_json)
    others = [f for f in df.schema.fields if f.name != bin_col]
    out_schema = T.StructType(others + [T.StructField(out_col, struct_type)])

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            recs = []
            for cell in pdf[bin_col]:
                val, _ = decode_datum(memoryview(bytes(cell)), 0, schema)
                recs.append(val)
            res = pdf.drop(columns=[bin_col])
            res[out_col] = recs
            yield res

    return df.mapInPandas(kernel, out_schema)
