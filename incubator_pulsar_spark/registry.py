"""Schema registry + compatibility checking (SURVEY §1.2).

Reference: per-topic versioned schemas enforced at the broker
(``SchemaType.java:41-170``; compatibility strategies
``SchemaCompatibilityStrategy.java:29-66`` — ALWAYS_COMPATIBLE /
ALWAYS_INCOMPATIBLE / BACKWARD / FORWARD / FULL and *_TRANSITIVE).

Spark-first: schemas are ``StructType``s; the registry is a small
in-memory (JSON-serializable) dict of topic → [versions]; compatibility
is structural comparison. Semantics follow Avro resolution rules:

- BACKWARD: new schema can read data written with the previous schema —
  fields removed are fine; fields added must have defaults (here:
  nullable).
- FORWARD: old schema can read new data — fields added are fine; fields
  removed must have been nullable.
- FULL: both. *_TRANSITIVE: against every prior version, not just last.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T


class SchemaType(Enum):
    """Public schema kinds (SchemaType.java:41-170).

    Values are the member names: sharing Spark-type strings as values
    made Python's Enum ALIAS members together (SchemaType.AVRO was
    SchemaType.JSON was SchemaType.PROTOBUF — any dispatch on kind was
    silently wrong, and TIME aliased INT64). The Spark mapping lives in
    ``spark_type_for`` instead."""
    NONE = "NONE"
    BYTES = "BYTES"
    STRING = "STRING"
    BOOLEAN = "BOOLEAN"
    INT8 = "INT8"
    INT16 = "INT16"
    INT32 = "INT32"
    INT64 = "INT64"
    FLOAT = "FLOAT"
    DOUBLE = "DOUBLE"
    DATE = "DATE"
    TIME = "TIME"
    TIMESTAMP = "TIMESTAMP"
    INSTANT = "INSTANT"
    LOCAL_DATE = "LOCAL_DATE"
    LOCAL_TIME = "LOCAL_TIME"
    LOCAL_DATE_TIME = "LOCAL_DATE_TIME"
    JSON = "JSON"
    AVRO = "AVRO"
    PROTOBUF = "PROTOBUF"
    KEY_VALUE = "KEY_VALUE"


_SIMPLE_SPARK_TYPES: dict[SchemaType, T.DataType] = {
    SchemaType.NONE: T.BinaryType(),
    SchemaType.BYTES: T.BinaryType(),
    SchemaType.STRING: T.StringType(),
    SchemaType.BOOLEAN: T.BooleanType(),
    SchemaType.INT8: T.ByteType(),
    SchemaType.INT16: T.ShortType(),
    SchemaType.INT32: T.IntegerType(),
    SchemaType.INT64: T.LongType(),
    SchemaType.FLOAT: T.FloatType(),
    SchemaType.DOUBLE: T.DoubleType(),
    SchemaType.DATE: T.DateType(),
    SchemaType.TIME: T.LongType(),   # ms-of-day; Spark has no TimeType
    SchemaType.TIMESTAMP: T.TimestampType(),
    SchemaType.INSTANT: T.TimestampType(),
    SchemaType.LOCAL_DATE: T.DateType(),
    SchemaType.LOCAL_TIME: T.LongType(),
    SchemaType.LOCAL_DATE_TIME: T.TimestampType(),
}


def spark_type_for(schema_type: SchemaType) -> T.DataType:
    if schema_type in _SIMPLE_SPARK_TYPES:
        return _SIMPLE_SPARK_TYPES[schema_type]
    raise ValueError(f"{schema_type} requires an explicit StructType")


class Compatibility(Enum):
    ALWAYS_INCOMPATIBLE = "ALWAYS_INCOMPATIBLE"
    ALWAYS_COMPATIBLE = "ALWAYS_COMPATIBLE"
    BACKWARD = "BACKWARD"
    FORWARD = "FORWARD"
    FULL = "FULL"
    BACKWARD_TRANSITIVE = "BACKWARD_TRANSITIVE"
    FORWARD_TRANSITIVE = "FORWARD_TRANSITIVE"
    FULL_TRANSITIVE = "FULL_TRANSITIVE"


def _can_read(reader: T.StructType, writer: T.StructType) -> bool:
    """Avro-style resolution: can ``reader`` decode data written as
    ``writer``? Missing-in-writer reader fields need a default (nullable);
    common fields need identical types (no promotion — conservative)."""
    writer_fields = {f.name: f for f in writer.fields}
    for rf in reader.fields:
        wf = writer_fields.get(rf.name)
        if wf is None:
            if not rf.nullable:
                return False
        elif wf.dataType != rf.dataType:
            if isinstance(wf.dataType, T.StructType) and isinstance(rf.dataType, T.StructType):
                if not _can_read(rf.dataType, wf.dataType):
                    return False
            else:
                return False
    return True


def is_compatible(new: T.StructType, olds: list[T.StructType],
                  strategy: Compatibility) -> bool:
    if strategy is Compatibility.ALWAYS_COMPATIBLE:
        return True
    if strategy is Compatibility.ALWAYS_INCOMPATIBLE:
        return False
    transitive = strategy in (Compatibility.BACKWARD_TRANSITIVE,
                              Compatibility.FORWARD_TRANSITIVE,
                              Compatibility.FULL_TRANSITIVE)
    against = olds if transitive else olds[-1:]
    for old in against:
        backward = _can_read(new, old)
        forward = _can_read(old, new)
        if strategy in (Compatibility.BACKWARD, Compatibility.BACKWARD_TRANSITIVE) and not backward:
            return False
        if strategy in (Compatibility.FORWARD, Compatibility.FORWARD_TRANSITIVE) and not forward:
            return False
        if strategy in (Compatibility.FULL, Compatibility.FULL_TRANSITIVE) and not (backward and forward):
            return False
    return True


class KeyValueEncodingType(Enum):
    """KeyValueEncodingType.java:33-38: INLINE packs key+value in the
    payload; SEPARATED carries the key in the message key field. Both
    collapse to one struct column in Spark."""
    INLINE = "INLINE"
    SEPARATED = "SEPARATED"


def key_value_schema(key: T.DataType, value: T.DataType) -> T.StructType:
    """Schema.KeyValue (Schema.java:368-398) → STRUCT<key, value>."""
    return T.StructType([
        T.StructField("key", key, True),
        T.StructField("value", value, True),
    ])


def encode_key_value(df, *, key_col: str = "key", value_col: str = "value",
                     encoding: KeyValueEncodingType = KeyValueEncodingType.INLINE):
    """Producer-side KeyValue: INLINE serializes {key,value} JSON into the
    payload (envelope key column left for routing); SEPARATED keeps the
    key in the envelope key field and only the value in the payload."""
    from pyspark.sql import functions as F

    if encoding is KeyValueEncodingType.INLINE:
        payload = F.to_json(F.struct(F.col(key_col).alias("key"),
                                     F.col(value_col).alias("value")))
    else:
        payload = F.to_json(F.struct(F.col(value_col).alias("value")))
    return df.withColumn("_kv_payload", payload.cast("binary"))


def decode_key_value(df, schema: T.StructType, *,
                     payload_col: str = "_kv_payload",
                     key_col: str = "key",
                     encoding: KeyValueEncodingType = KeyValueEncodingType.INLINE):
    """Consumer-side KeyValue → one struct column ``kv`` (both encodings
    produce the identical struct, as the client API does)."""
    from pyspark.sql import functions as F

    decoded = F.from_json(F.col(payload_col).cast("string"), schema)
    if encoding is KeyValueEncodingType.INLINE:
        kv = decoded
    else:
        key_type = schema["key"].dataType
        kv = F.struct(F.col(key_col).cast(key_type).alias("key"),
                      decoded["value"].alias("value"))
    return df.withColumn("kv", kv)


def validate_produce(df, registry: "SchemaRegistry", topic: str):
    """AUTO_PRODUCE_BYTES (SchemaType.java:170 / Schema.AUTO_PRODUCE_BYTES
    :432): a producer of raw bytes is validated against the topic's
    declared schema at publish time. Spark-first: assert the DataFrame's
    schema can be read by the topic's latest registered schema; raises
    before any write happens. Returns df unchanged for chaining."""
    declared = registry.latest(topic)
    if declared is None:
        raise ValueError(f"no schema registered for {topic}")
    if not _can_read(declared, df.schema):
        raise ValueError(
            f"DataFrame schema {df.schema.simpleString()} is not readable as "
            f"{topic}'s declared schema {declared.simpleString()}"
        )
    return df


def infer_schema(spark, df, *, value_col: str = "value",
                 sample_limit: int = 1000) -> T.StructType:
    """AUTO_CONSUME (SchemaType.java:165): derive the value schema from
    the data itself — JSON payload inference over a bounded sample, the
    GenericRecord path without a registry lookup.

    Sampling is bounded (LIMIT pushes into the scan) so inference cost
    is independent of topic size; at 100 TB the sample reads one or two
    files.
    """
    from pyspark.sql import functions as F

    sample = (df.select(F.col(value_col).cast("string").alias("json"))
              .filter(F.col("json").isNotNull())
              .limit(sample_limit))
    return spark.read.json(sample.rdd.map(lambda r: r.json)).schema


@dataclass
class SchemaRegistry:
    """Topic → ordered schema versions, broker-style enforcement."""
    strategy: Compatibility = Compatibility.FULL
    _versions: dict[str, list[T.StructType]] = field(default_factory=dict)

    def register(self, topic: str, schema: T.StructType) -> int:
        olds = self._versions.get(topic, [])
        if olds:
            if schema == olds[-1]:
                return len(olds) - 1  # idempotent re-register
            if not is_compatible(schema, olds, self.strategy):
                raise ValueError(
                    f"schema for {topic} is {self.strategy.value}-incompatible"
                )
        self._versions.setdefault(topic, []).append(schema)
        return len(self._versions[topic]) - 1

    def latest(self, topic: str) -> T.StructType | None:
        v = self._versions.get(topic)
        return v[-1] if v else None

    def version(self, topic: str, n: int) -> T.StructType:
        return self._versions[topic][n]

    def versions(self, topic: str) -> int:
        return len(self._versions.get(topic, []))

    # -- durability (the broker persists schemas in its metadata store;
    #    SchemaRegistryServiceImpl backs onto BookKeeper — here, a JSON
    #    file of StructType.jsonValue() per version, atomic replace)

    def save(self, path: str) -> None:
        import json
        import os

        payload = {
            "strategy": self.strategy.value,
            "versions": {t: [s.jsonValue() for s in vs]
                         for t, vs in self._versions.items()},
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "SchemaRegistry":
        import json

        with open(path) as f:
            payload = json.load(f)
        reg = cls(strategy=Compatibility(payload["strategy"]))
        reg._versions = {
            t: [T.StructType.fromJson(j) for j in vs]
            for t, vs in payload["versions"].items()
        }
        return reg


def kv_inline_encode(df, *, key_col: str = "k", value_col: str = "v",
                     out_col: str = "payload"):
    """The reference's BYTE-EXACT INLINE KeyValue framing
    (KeyValueSchemaImpl.encode): ``[int32 key-len][key bytes]
    [int32 value-len][value bytes]``, big-endian, length −1 for a NULL
    side. Key/value arrive as BINARY columns already serialized by
    their own payload codecs (JSON/Avro/Protobuf — see
    ``codecs.payload_codec``), so any schema combination frames the
    same way. Arrow-batched kernel; other columns pass through."""
    import struct as _struct
    from pyspark.sql import types as _T

    others = [f for f in df.schema.fields
              if f.name not in (key_col, value_col)]
    out_schema = _T.StructType(others + [_T.StructField(out_col,
                                                        _T.BinaryType())])

    def kernel(batches):
        for pdf in batches:
            payloads = []
            for k, v in zip(pdf[key_col], pdf[value_col]):
                buf = bytearray()
                for part in (k, v):
                    if part is None:
                        buf.extend(_struct.pack(">i", -1))
                    else:
                        raw = bytes(part)
                        buf.extend(_struct.pack(">i", len(raw)))
                        buf.extend(raw)
                payloads.append(bytes(buf))
            res = pdf.drop(columns=[key_col, value_col])
            res[out_col] = payloads
            yield res

    return df.mapInPandas(kernel, out_schema)


def kv_inline_decode(df, *, payload_col: str = "payload",
                     key_col: str = "k", value_col: str = "v"):
    """Inverse framing: payload → (key BINARY, value BINARY), NULL for
    −1 lengths."""
    import struct as _struct
    from pyspark.sql import types as _T

    others = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = _T.StructType(others + [
        _T.StructField(key_col, _T.BinaryType()),
        _T.StructField(value_col, _T.BinaryType())])

    def kernel(batches):
        for pdf in batches:
            ks, vs = [], []
            for cell in pdf[payload_col]:
                raw = bytes(cell)
                pos = 0
                parts = []
                for _ in range(2):
                    (n,) = _struct.unpack_from(">i", raw, pos)
                    pos += 4
                    if n < 0:
                        parts.append(None)
                    else:
                        parts.append(raw[pos:pos + n])
                        pos += n
                ks.append(parts[0])
                vs.append(parts[1])
            res = pdf.drop(columns=[payload_col])
            res[key_col] = ks
            res[value_col] = vs
            yield res

    return df.mapInPandas(kernel, out_schema)
