"""BSON extended-JSON normalization as column expressions.

The reference handles MongoDB documents with a row-at-a-time Python UDF
(``process_document_udf``, cdc_stream.py:728-739 wrapping :427-497):
parse the document JSON, walk it in Python, and replace wrapper objects
like ``{"$oid": "..."}`` / ``{"$numberLong": "42"}`` with their scalar
values, stringifying everything into ``MapType(String, String)``.

This engine does the same normalization **entirely JVM-side**: the
document parses once into a string→string map (nested wrapper objects
surface as JSON strings), and ``transform_values`` + ``get_json_object``
unwrap the extended-JSON scalars. No Python worker is involved —
at scale this is the difference between a codegen'd columnar pass and
a per-row pickle round-trip (SURVEY §2.11: "Priority-1 replacement").

Parity map (cdc_stream.py:427-464):
``$oid``→string, ``$numberLong``/``$numberInt``→numeric string,
``$numberDouble``→numeric string, ``$numberDecimal``→numeric string
(reference converts to float, explicitly lossy), ``$date``→epoch millis
string. Unrecognized objects stay as their JSON text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Extended-JSON wrapper keys handled, in coalesce priority order.
EXTENDED_JSON_KEYS = (
    "$oid",
    "$numberLong",
    "$numberInt",
    "$numberDouble",
    "$numberDecimal",
    "$date",
)


def normalize_bson_value(v: Column) -> Column:
    """Unwrap one map value: extended-JSON wrapper object → scalar string.

    Plain scalars pass through unchanged; ``{"$date": {"$numberLong":
    "..."}}`` (Debezium's nested form) resolves through the inner
    wrapper too.
    """
    # nested $date -> $numberLong form must outrank the plain $date
    # extraction, or coalesce stops at the unparsed inner object.
    candidates = [F.get_json_object(v, "$['$date']['$numberLong']")]
    candidates += [F.get_json_object(v, f"$['{k}']") for k in EXTENDED_JSON_KEYS]
    return F.coalesce(*candidates, v)


def document_to_map(doc_json: Column) -> Column:
    """Mongo document JSON string → normalized map<string,string>.

    One ``from_json`` parse; nested objects/arrays surface as JSON
    strings (the reference stringifies them the same way,
    cdc_stream.py:466-497); wrapper scalars are unwrapped in place.
    """
    raw = F.from_json(doc_json, T.MapType(T.StringType(), T.StringType()))
    return F.transform_values(raw, lambda _k, v: normalize_bson_value(v))


def mongo_changes(
    raw: DataFrame,
    value_col: str = "value",
    key_field: str = "_id",
) -> DataFrame:
    """Mongo CDC envelope (JSON-string before/after) → typed change rows.

    Output: ``key_value string, op string, ts_ms long, before_doc map,
    after_doc map`` — the reference's stage after
    cdc_stream.py:743-768, with the four ``get_json_object`` scans and
    the Python UDF replaced by one ``from_json`` + expressions.
    """
    env_schema = T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("before", T.StringType()),
                        T.StructField("after", T.StringType()),
                        T.StructField("op", T.StringType()),
                        T.StructField("ts_ms", T.LongType()),
                    ]
                ),
            )
        ]
    )
    # pass the source-order column through (Kafka offset / file seq):
    # downstream compaction tie-breaks on it, and it must be assigned
    # BEFORE any repartition to stay stable across replays
    extra = [c for c in raw.columns if c == "seq"]
    parsed = raw.select(F.from_json(F.col(value_col), env_schema).alias("e"), *extra)
    before_doc = document_to_map(F.col("e.payload.before"))
    after_doc = document_to_map(F.col("e.payload.after"))
    out = parsed.select(
        F.col("e.payload.op").alias("op"),
        F.col("e.payload.ts_ms").alias("ts_ms"),
        before_doc.alias("before_doc"),
        after_doc.alias("after_doc"),
        *extra,
    )
    key = F.when(
        F.col("op") == "d", F.element_at(F.col("before_doc"), key_field)
    ).otherwise(F.element_at(F.col("after_doc"), key_field))
    return out.select(
        key.alias("key_value"), "op", "ts_ms", "before_doc", "after_doc", *extra
    )


def project_map_fields(
    df: DataFrame, doc_col: str, fields: list[str]
) -> DataFrame:
    """Map column → one typed string column per field (P10,
    cdc_stream.py:829-834), key columns preserved by the caller."""
    return df.select(
        *df.columns,
        *[
            F.element_at(F.col(doc_col), f).alias(f)
            for f in fields
            if f not in df.columns
        ],
    )
