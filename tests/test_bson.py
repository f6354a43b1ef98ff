"""BSON extended-JSON normalization tests (Mongo path).

Covers the reference's heterogeneous-document cases (docs/command.txt:
items with and without ``unique_id``; ``$numberLong`` keys) plus the
wrapper scalars from cdc_stream.py:427-464 — all without a Python UDF.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from changedatacapture_spark.schema.bson import (
    document_to_map,
    mongo_changes,
    project_map_fields,
)


def test_document_to_map_unwraps_extended_json(spark):
    doc = json.dumps(
        {
            "_id": {"$oid": "65f1c0ffee"},
            "n_long": {"$numberLong": "9007199254740993"},
            "n_int": {"$numberInt": "42"},
            "n_double": {"$numberDouble": "1.5"},
            "n_dec": {"$numberDecimal": "3.14159"},
            "when": {"$date": 1710000000000},
            "plain": "hello",
            "nested_date": {"$date": {"$numberLong": "1710000000001"}},
        }
    )
    df = spark.createDataFrame([(doc,)], "doc string")
    m = df.select(document_to_map(F.col("doc")).alias("m")).collect()[0].m
    assert m["_id"] == "65f1c0ffee"
    assert m["n_long"] == "9007199254740993"
    assert m["n_int"] == "42"
    assert m["n_double"] == "1.5"
    assert m["n_dec"] == "3.14159"
    assert m["when"] == "1710000000000"
    assert m["plain"] == "hello"
    assert m["nested_date"] == "1710000000001"


def test_mongo_changes_heterogeneous_docs(spark):
    def env(op, before, after, ts):
        return json.dumps(
            {
                "payload": {
                    "before": json.dumps(before) if before else None,
                    "after": json.dumps(after) if after else None,
                    "op": op,
                    "ts_ms": ts,
                }
            }
        )

    rows = [
        (env("c", None, {"_id": {"$numberLong": "1006"}, "first_name": "ada",
                         "unique_id": "u-1"}, 1000),),
        # second doc lacks unique_id (heterogeneous)
        (env("c", None, {"_id": {"$numberLong": "1007"}, "first_name": "alan"}, 1001),),
        (env("d", {"_id": {"$numberLong": "1006"}, "first_name": "ada"}, None, 1002),),
    ]
    raw = spark.createDataFrame(rows, "value string")
    out = mongo_changes(raw).orderBy("ts_ms").collect()
    assert [r.key_value for r in out] == ["1006", "1007", "1006"]
    assert out[0].after_doc["unique_id"] == "u-1"
    assert "unique_id" not in out[1].after_doc
    assert out[2].op == "d" and out[2].before_doc["first_name"] == "ada"


def test_project_map_fields(spark):
    raw = spark.createDataFrame(
        [("k1", {"a": "1", "b": "x"})], "key_value string, after_doc map<string,string>"
    )
    out = project_map_fields(raw, "after_doc", ["a", "b", "missing"]).collect()[0]
    assert out.a == "1" and out.b == "x" and out.missing is None
