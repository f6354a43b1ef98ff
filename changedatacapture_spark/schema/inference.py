"""Schema inference & registry: the reference's dynamic-schema machinery.

The reference extracts the row-image schema from the first event's
embedded Debezium ``schema`` section (cdc_stream.py:184-214), converts
it to a StructType (:216-230), caches it to local JSON files
(:501-541), and freezes it. An archived draft instead inferred with
``schema_of_json`` per batch (archive/streaming_from_kafka_to_minio
copy.py:29-32).

This module keeps both capabilities as pure functions plus an explicit
:class:`SchemaRegistry` — but the cache is advisory: the materialized
table's own metadata is the schema of record (a driver-local JSON file
breaks on multi-driver deployments, SURVEY §7.5).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from changedatacapture_spark.schema.envelope import (
    record_schema_from_field_info,
)


def field_info_from_envelope(envelope_json: str) -> list[dict]:
    """Extract the Debezium field list from one raw envelope value.

    Walks ``schema.fields`` to the ``after`` (fallback ``before``)
    struct and returns its field dicts — parity with
    cdc_stream.py:184-214, including the nested-struct walk.
    """
    doc = json.loads(envelope_json)
    schema = doc.get("schema") or {}
    for want in ("after", "before"):
        for f in schema.get("fields", []):
            if f.get("field") == want and f.get("fields"):
                return [
                    {
                        "field": sub["field"],
                        "type": sub.get("type", "string"),
                        "optional": sub.get("optional", True),
                    }
                    for sub in f["fields"]
                ]
    raise ValueError("envelope has no schema.fields.(after|before) section")


def record_schema_from_envelope(envelope_json: str) -> T.StructType:
    """First-event schema inference (the reference's primary path)."""
    return record_schema_from_field_info(field_info_from_envelope(envelope_json))


def record_schema_from_sample(spark, sample_values: list[str]) -> T.StructType:
    """Data-driven inference (P4): union-infer the ``payload.after``
    image schema from sample envelope values via ``spark.read.json``.

    Used when envelopes arrive without an embedded ``schema`` section
    (Debezium with ``schemas.enable=false``)."""
    df = spark.read.json(spark.sparkContext.parallelize(sample_values))
    payload = df.schema["payload"].dataType
    for name in ("after", "before"):
        try:
            sub = payload[name].dataType
        except KeyError:
            continue
        if isinstance(sub, T.StructType):
            return sub
    raise ValueError("samples have no payload.after/payload.before struct")


class SchemaRegistry:
    """Versioned on-disk record-schema cache (advisory).

    Parity surface: save/load/exists of cdc_stream.py:501-541, plus a
    monotonically-versioned history so evolution is observable instead
    of silent.
    """

    def __init__(self, path: str) -> None:
        self.path = path.rstrip("/")

    def _file(self) -> str:
        return f"{self.path}/schema.json"

    def exists(self) -> bool:
        return os.path.exists(self._file())

    def load(self) -> T.StructType:
        with open(self._file()) as f:
            doc = json.load(f)
        return T.StructType.fromJson(doc["schema"])

    @property
    def version(self) -> int:
        if not self.exists():
            return -1
        with open(self._file()) as f:
            return json.load(f)["version"]

    def save(self, schema: T.StructType) -> int:
        """Persist; bumps the version only when the schema changed."""
        os.makedirs(self.path, exist_ok=True)
        new = schema.jsonValue()
        version = 0
        if self.exists():
            with open(self._file()) as f:
                cur = json.load(f)
            if cur["schema"] == new:
                return cur["version"]
            version = cur["version"] + 1
        tmp = f"{self._file()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "schema": new}, f)
        os.replace(tmp, self._file())
        return version

    def merge(self, incoming: T.StructType) -> T.StructType:
        """Widen the cached schema with new fields (evolution policy:
        add-only — removed source fields stay, becoming null; parity
        intent of Delta ``mergeSchema``, fixing the reference's silent
        drop of new Mongo fields, cdc_stream.py:852-861)."""
        if not self.exists():
            self.save(incoming)
            return incoming
        current = self.load()
        have = {f.name for f in current.fields}
        merged = T.StructType(
            list(current.fields)
            + [f for f in incoming.fields if f.name not in have]
        )
        self.save(merged)
        return merged
