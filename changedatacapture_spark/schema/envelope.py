"""Debezium change-event envelope schemas and type mapping.

Re-expresses the reference's dynamic schema machinery
(``spark_client/src/cdc_stream.py:162-262``) as pure, unit-testable
functions. The envelope is::

    {schema: {...}, payload: {before, after, source, op, ts_ms, transaction}}

with ``op ∈ {c, u, d, r}`` (create / update / delete / snapshot-read,
README.md:361-369). ``before``/``after`` are full row images.

The new engine declares the envelope as a typed ``StructType`` and
parses each Kafka/file value exactly once with ``from_json`` — the
reference's MongoDB path re-scans the JSON four times with
``get_json_object`` (cdc_stream.py:748-753); here the parse is a single
columnar pass that Catalyst can prune to only the fields a query uses.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Debezium field type -> Spark type (parity: cdc_stream.py:162-182).
DEBEZIUM_TO_SPARK: dict[str, T.DataType] = {
    "int8": T.IntegerType(),
    "int16": T.IntegerType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float": T.FloatType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "decimal": T.DecimalType(38, 18),
}


def debezium_type_to_spark(debezium_type: str) -> T.DataType:
    """Map a Debezium logical type name to a Spark type.

    Unknown types fall back to ``StringType`` (parity:
    cdc_stream.py:182).
    """
    return DEBEZIUM_TO_SPARK.get(debezium_type, T.StringType())


def record_schema_from_field_info(field_info: list[dict]) -> T.StructType:
    """Build the row-image StructType from a Debezium field list.

    ``field_info`` entries look like
    ``{"field": "customerId", "type": "int64", "optional": false}``
    (parity: cdc_stream.py:216-230, spark_client/src/field_info.json).
    """
    return T.StructType(
        [
            T.StructField(
                f["field"],
                debezium_type_to_spark(f.get("type", "string")),
                bool(f.get("optional", True)),
            )
            for f in field_info
        ]
    )


def debezium_envelope_schema(record_schema: T.StructType) -> T.StructType:
    """Full envelope StructType for a given row-image schema.

    Parity: cdc_stream.py:251-261. ``ts_ms`` stays epoch-millis
    ``LongType`` for reference parity; callers derive a
    ``TimestampType`` event time via ``F.timestamp_millis`` when they
    need watermarks.
    """
    source = T.StructType(
        [
            T.StructField("version", T.StringType(), True),
            T.StructField("connector", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("db", T.StringType(), True),
            T.StructField("schema", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
        ]
    )
    payload = T.StructType(
        [
            T.StructField("before", record_schema, True),
            T.StructField("after", record_schema, True),
            T.StructField("source", source, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )
    return T.StructType([T.StructField("payload", payload, True)])
