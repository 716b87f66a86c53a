"""Avro / Protobuf schema codecs (Schema.AVRO / Schema.PROTOBUF surface).

Reference: ``pulsar-client-api/src/main/java/org/apache/pulsar/client/
api/Schema.java:286-456`` — PROTOBUF (:286), AVRO (:329), JSON (:350),
NATIVE_AVRO (:456). A schema'd topic stores the writer schema in the
registry; clients encode/decode payload bytes against a (possibly
older/newer) reader schema under the namespace compatibility strategy.

Spark-first split of responsibilities:

- **Schema translation** (StructType ↔ Avro record schema JSON) is pure
  Python — always available, fully tested. The registry keeps
  StructTypes, so Avro-declared topics join the same
  BACKWARD/FORWARD/FULL compat machinery as JSON topics
  (``registry.is_compatible``).
- **Payload encode/decode** wraps Spark's built-in ``from_avro/to_avro``
  (org.apache.spark.sql.avro) and ``from_protobuf/to_protobuf``
  (spark-protobuf). Those modules ship with a full Spark distribution
  but not with the pip pyspark used here, so the wrappers are
  package-gated exactly like ``streaming/tws.py`` gates protobuf: probe
  once, raise a clear error naming the missing package, and let tests
  ``skipif`` on the probe.

At scale both codecs run JVM-side per column batch (no Python
boundary); the schema JSON is a literal in the plan.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, SparkSession
from pyspark.sql import types as T

from ..registry import SchemaRegistry

# ---------------------------------------------------------- schema mapping

_SPARK_TO_AVRO: dict[type, str] = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",       # Avro has no 16-bit type
    T.ByteType: "int",        # nor 8-bit
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}

_AVRO_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}


def _avro_type(dt: T.DataType, name: str) -> object:
    if type(dt) in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[type(dt)]
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DecimalType):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": dt.precision, "scale": dt.scale}
    if isinstance(dt, T.ArrayType):
        items = _avro_type(dt.elementType, f"{name}_item")
        if dt.containsNull:
            items = ["null", items]
        return {"type": "array", "items": items}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        values = _avro_type(dt.valueType, f"{name}_value")
        if dt.valueContainsNull:
            values = ["null", values]
        return {"type": "map", "values": values}
    if isinstance(dt, T.StructType):
        return _record(dt, name)
    raise ValueError(f"no Avro mapping for Spark type {dt}")


def _record(struct: T.StructType, name: str) -> dict:
    fields = []
    for f in struct.fields:
        ft = _avro_type(f.dataType, f"{name}_{f.name}")
        entry: dict = {"name": f.name, "type": ["null", ft] if f.nullable else ft}
        if f.nullable:
            entry["default"] = None
        fields.append(entry)
    return {"type": "record", "name": name, "fields": fields}


def spark_to_avro_schema(struct: T.StructType, *, name: str = "Record",
                         namespace: str | None = None) -> str:
    """StructType → Avro record schema JSON (Schema.AVRO's generated
    schema, AvroSchema.of(pojo)). Nullable fields become
    ``["null", T]`` unions with a null default — exactly what Avro
    schema evolution needs for BACKWARD-compatible added fields."""
    rec = _record(struct, name)
    if namespace:
        rec["namespace"] = namespace
    return json.dumps(rec)


def _spark_type(avro: object) -> tuple[T.DataType, bool]:
    """(spark type, nullable) for one Avro type node."""
    if isinstance(avro, str):
        return _AVRO_TO_SPARK[avro], False
    if isinstance(avro, list):  # union — only [null, T] / [T, null] supported
        non_null = [a for a in avro if a != "null"]
        if len(non_null) != 1:
            raise ValueError(f"unsupported Avro union {avro}")
        dt, _ = _spark_type(non_null[0])
        return dt, True
    assert isinstance(avro, dict)
    t = avro["type"]
    logical = avro.get("logicalType")
    if logical == "date":
        return T.DateType(), False
    if logical in ("timestamp-micros", "timestamp-millis"):
        return T.TimestampType(), False
    if logical == "decimal":
        return T.DecimalType(avro["precision"], avro["scale"]), False
    if t == "array":
        dt, nullable = _spark_type(avro["items"])
        return T.ArrayType(dt, nullable), False
    if t == "map":
        dt, nullable = _spark_type(avro["values"])
        return T.MapType(T.StringType(), dt, nullable), False
    if t == "record":
        fields = []
        for f in avro["fields"]:
            dt, nullable = _spark_type(f["type"])
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields), False
    if t == "enum":
        return T.StringType(), False
    if t == "fixed":
        return T.BinaryType(), False
    return _spark_type(t)  # {"type": "string"} wrapper form


def avro_to_spark_schema(avro_json: str) -> T.StructType:
    """Avro record schema JSON → StructType (the AUTO_CONSUME direction
    for an Avro-schema'd topic)."""
    schema = json.loads(avro_json)
    dt, _ = _spark_type(schema)
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level Avro schema must be a record")
    return dt


def register_avro(registry: SchemaRegistry, topic: str, avro_json: str) -> int:
    """Register an Avro-declared topic schema: translate to StructType and
    run it through the same compatibility gate as every other schema
    (SchemaRegistry.register → is_compatible)."""
    return registry.register(topic, avro_to_spark_schema(avro_json))


# ------------------------------------------------------- gated payload codecs

def avro_functions_available(spark: SparkSession) -> bool:
    """True when org.apache.spark.sql.avro is on the classpath (full
    Spark distributions; absent from pip pyspark)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst")
        return True
    except Exception:
        return False


def avro_serialize(data: Column) -> Column:
    """Struct column → Avro binary (SerDe.serialize for Schema.AVRO)."""
    from pyspark.sql.avro.functions import to_avro

    return to_avro(data)


def avro_deserialize(data: Column, avro_json: str,
                     options: dict[str, str] | None = None) -> Column:
    """Avro binary → struct under the registry's reader schema."""
    from pyspark.sql.avro.functions import from_avro

    return from_avro(data, avro_json, options or {})


def protobuf_functions_available() -> bool:
    """True when both spark-protobuf (JVM) and google.protobuf (Python
    descriptor tooling) are importable."""
    try:
        import google.protobuf  # noqa: F401
        from pyspark.sql.protobuf import functions as _  # noqa: F401
        return True
    except Exception:
        return False


def protobuf_serialize(data: Column, message_name: str,
                       desc_file_path: str) -> Column:
    """Struct → protobuf bytes (Schema.PROTOBUF_NATIVE, Schema.java:145)."""
    from pyspark.sql.protobuf.functions import to_protobuf

    return to_protobuf(data, message_name, desc_file_path)


def protobuf_deserialize(data: Column, message_name: str,
                         desc_file_path: str) -> Column:
    """Protobuf bytes → struct."""
    from pyspark.sql.protobuf.functions import from_protobuf

    return from_protobuf(data, message_name, desc_file_path)
