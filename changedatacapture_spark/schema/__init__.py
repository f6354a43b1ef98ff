from changedatacapture_spark.schema.envelope import (
    debezium_envelope_schema,
    debezium_type_to_spark,
    record_schema_from_field_info,
)

__all__ = [
    "debezium_envelope_schema",
    "debezium_type_to_spark",
    "record_schema_from_field_info",
]
