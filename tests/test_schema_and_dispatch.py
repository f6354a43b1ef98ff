"""Tests: schema inference/registry/evolution, per-source dispatch,
Mongo streaming pipeline, bronze + audit sinks, watermarked windows."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from changedatacapture_spark.schema.inference import (
    SchemaRegistry,
    field_info_from_envelope,
    record_schema_from_envelope,
    record_schema_from_sample,
)

RECORD = T.StructType(
    [
        T.StructField("customerId", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
    ]
)


def _dbz_envelope_with_schema():
    return json.dumps(
        {
            "schema": {
                "type": "struct",
                "fields": [
                    {
                        "field": "after",
                        "fields": [
                            {"field": "customerId", "type": "int64", "optional": False},
                            {"field": "name", "type": "string", "optional": True},
                            {"field": "zip", "type": "int32", "optional": True},
                        ],
                    }
                ],
            },
            "payload": {
                "before": None,
                "after": {"customerId": 1, "name": "ada", "zip": 7},
                "op": "c",
                "ts_ms": 1000,
            },
        }
    )


def test_schema_from_envelope_schema_section():
    schema = record_schema_from_envelope(_dbz_envelope_with_schema())
    assert [f.name for f in schema.fields] == ["customerId", "name", "zip"]
    assert isinstance(schema["customerId"].dataType, T.LongType)
    assert isinstance(schema["zip"].dataType, T.IntegerType)
    assert schema["customerId"].nullable is False


def test_field_info_requires_schema_section():
    with pytest.raises(ValueError):
        field_info_from_envelope(json.dumps({"payload": {"op": "c"}}))


def test_schema_from_sample_values(spark):
    samples = [
        json.dumps({"payload": {"after": {"id": 1, "name": "a"}, "op": "c"}}),
        json.dumps({"payload": {"after": {"id": 2, "extra": 1.5}, "op": "c"}}),
    ]
    schema = record_schema_from_sample(spark, samples)
    names = {f.name for f in schema.fields}
    assert {"id", "name", "extra"} <= names  # union over samples


def test_schema_registry_versions_and_merge(tmp_path):
    reg = SchemaRegistry(str(tmp_path))
    assert not reg.exists() and reg.version == -1
    s1 = T.StructType([T.StructField("a", T.LongType())])
    assert reg.save(s1) == 0
    assert reg.save(s1) == 0  # unchanged -> same version
    s2 = T.StructType([T.StructField("b", T.StringType())])
    merged = reg.merge(s2)
    assert [f.name for f in merged.fields] == ["a", "b"]
    assert reg.version == 1
    assert [f.name for f in reg.load().fields] == ["a", "b"]


def test_snapshot_schema_evolution(spark, tmp_path):
    from changedatacapture_spark.streaming.sink import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"), key_cols=["k"], n_buckets=2)
    b0 = spark.createDataFrame([(1, "x", "c"), (2, "y", "c")], "k long, a string, op string")
    t.merge(b0, batch_id=0)
    # batch 1 adds column b, omits column a
    b1 = spark.createDataFrame([(3, 7.5, "c")], "k long, b double, op string")
    t.merge(b1, batch_id=1)
    rows = {r.k: (r.a, r.b) for r in t.read().collect()}
    assert rows == {1: ("x", None), 2: ("y", None), 3: (None, 7.5)}
    with pytest.raises(ValueError):
        t.merge(
            spark.createDataFrame([(4, True, "c")], "k long, c boolean, op string"),
            batch_id=2,
            evolve_schema=False,
        )


def test_dispatch_registry(spark):
    from changedatacapture_spark.streaming.dispatch import (
        build_pipeline,
        connector_types,
    )

    assert connector_types() == ["mongodb", "postgres"]
    with pytest.raises(ValueError, match="unsupported database_type"):
        build_pipeline(spark, {"database_config": {"database_type": "oracle"}})
    p = build_pipeline(
        spark,
        {
            "database_config": {"database_type": "postgres"},
            "processing_config": {"key_column": "customerId",
                                  "record_ddl": "customerId long, name string"},
            "delta_config": {"table_path": "/tmp/x"},
        },
    )
    assert p.key_col == "customerId"


def test_mongo_pipeline_e2e(spark, tmp_path):
    from changedatacapture_spark.streaming.dispatch import MongoCdcPipeline
    from changedatacapture_spark.streaming.sink import SnapshotTable

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
        (env("c", None, {"_id": {"$numberLong": "1"}, "name": "ada", "uid": "u1"}, 1000),),
        (env("c", None, {"_id": {"$numberLong": "2"}, "name": "bob"}, 1001),),
        (env("u", None, {"_id": {"$numberLong": "1"}, "name": "ada2", "uid": "u1"}, 1002),),
        (env("d", {"_id": {"$numberLong": "2"}, "name": "bob"}, None, 1003),),
    ]
    raw = spark.createDataFrame(rows, "value string")
    table = SnapshotTable(spark, str(tmp_path / "mt"), key_cols=["_id"], n_buckets=2)
    pipe = MongoCdcPipeline(spark, table, fields=["name", "uid"])
    pipe.process_batch(raw, batch_id=0)
    got = {(r._id, r.name, r.uid) for r in table.read().select("_id", "name", "uid").collect()}
    assert got == {("1", "ada2", "u1")}


def test_bronze_and_audit_sinks(spark, tmp_path):
    from changedatacapture_spark.sources.envelope_gen import write_envelope_jsonl
    from changedatacapture_spark.streaming.pipeline import (
        CdcPipeline,
        file_envelope_stream,
    )
    from changedatacapture_spark.streaming.sink import SnapshotTable

    src = str(tmp_path / "env")
    write_envelope_jsonl(
        src,
        [
            ("c", None, {"customerId": 1, "name": "a'b", "city": "x"}, 1000),
            ("u", None, {"customerId": 1, "name": "c", "city": None}, 1001),
            ("d", {"customerId": 1, "name": "c", "city": None}, None, 1002),
        ],
    )
    table = SnapshotTable(spark, str(tmp_path / "t"), key_cols=["customerId"])
    pipe = CdcPipeline(spark, RECORD, table, key_col="customerId")

    qb = pipe.start_bronze(
        file_envelope_stream(spark, src),
        path=str(tmp_path / "bronze"),
        checkpoint_dir=str(tmp_path / "ckpt_b"),
        available_now=True,
    )
    qb.awaitTermination(120)
    bronze = spark.read.parquet(str(tmp_path / "bronze"))
    assert bronze.count() == 3
    assert set(bronze.columns) >= {"customerId", "op", "ts_ms", "seq", "name", "city"}

    qa = pipe.start_audit(
        file_envelope_stream(spark, src),
        path=str(tmp_path / "audit"),
        checkpoint_dir=str(tmp_path / "ckpt_a"),
        table_name="customers",
        available_now=True,
    )
    qa.awaitTermination(120)
    stmts = {r.seq: r.stmt for r in spark.read.parquet(str(tmp_path / "audit")).collect()}
    assert stmts[0] == (
        "INSERT INTO customers (customerId, name, city) VALUES (1, 'a''b', 'x')"
    )
    assert stmts[1] == "UPDATE customers SET name = 'c', city = NULL WHERE customerId = 1"
    assert stmts[2] == "DELETE FROM customers WHERE customerId = 1"


def test_windowed_compact_stream_with_watermark(spark, tmp_path):
    from changedatacapture_spark.sources.envelope_gen import write_envelope_jsonl
    from changedatacapture_spark.streaming.pipeline import (
        CdcPipeline,
        file_envelope_stream,
    )
    from changedatacapture_spark.streaming.sink import SnapshotTable

    src = str(tmp_path / "env")
    minute = 60_000
    # three files -> three micro-batches: the watermark advances only
    # between batches, and append-mode windows flush one batch after
    # the watermark passes their end
    n = write_envelope_jsonl(
        src,
        [
            ("c", None, {"customerId": 1, "name": "a", "city": "w0"}, 10 * minute),
            ("u", None, {"customerId": 1, "name": "a", "city": "w0-late"}, 10 * minute + 30_000),
            ("u", None, {"customerId": 1, "name": "a", "city": "w1"}, 11 * minute),
            ("c", None, {"customerId": 2, "name": "b", "city": "w1"}, 11 * minute + 1),
        ],
        file_name="f0.jsonl",
    )
    n = write_envelope_jsonl(
        src,
        [("c", None, {"customerId": 9, "name": "z", "city": "adv"}, 15 * minute)],
        start_seq=n,
        file_name="f1.jsonl",
    )
    write_envelope_jsonl(
        src,
        [("c", None, {"customerId": 9, "name": "z", "city": "adv2"}, 16 * minute)],
        start_seq=n,
        file_name="f2.jsonl",
    )
    table = SnapshotTable(spark, str(tmp_path / "t"), key_cols=["customerId"])
    pipe = CdcPipeline(spark, RECORD, table, key_col="customerId")
    out = pipe.windowed_compact_stream(
        file_envelope_stream(spark, src, max_files_per_trigger=1),
        window_duration="1 minute",
        watermark_delay="2 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("win_compact")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.customerId, r.window_start.minute, r.city)
        for r in spark.sql("SELECT * FROM win_compact").collect()
    }
    # window 10: latest for key 1 is the ts 10:30 update
    assert (1, 10, "w0-late") in rows


def test_kafka_reader_option_contract():
    """S1/S2 surface pinned without a broker (the sandbox can never
    .load() Kafka): format keys, rate limit, data-loss stance — the
    options the reference wires at cdc_stream.py:945-952."""
    from changedatacapture_spark.streaming.pipeline import (
        KAFKA_VALUE_PROJECTION,
        kafka_reader_options,
    )

    opts = kafka_reader_options("broker:9092", "dbserver2.public.links")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "dbserver2.public.links",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "10000",
    }
    strict = kafka_reader_options(
        "b:9092", "t", max_offsets_per_trigger=None, fail_on_data_loss=True
    )
    assert strict["failOnDataLoss"] == "true"
    assert "maxOffsetsPerTrigger" not in strict
    # the projection exposes the raw-envelope contract downstream of load()
    assert KAFKA_VALUE_PROJECTION[0] == "CAST(value AS STRING) AS value"
    assert "offset AS seq" in KAFKA_VALUE_PROJECTION
