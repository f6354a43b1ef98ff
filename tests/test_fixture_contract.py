"""Fixture contract: the loaded events.ts column is always TimestampType.

Round-5 postmortem: the driver regenerated events.parquet with ts as
parquet timestamp[us] without the UTC flag, which Spark 4 infers as
TIMESTAMP_NTZ; unix_millis/unix_micros reject NTZ input and nine driver
queries failed at analysis time with zero test-suite signal. This test
makes any future physical-type drift a one-line diagnosis.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from changedatacapture_spark.sources.tables import load_table

ALL_SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("d", ALL_SF_DIRS)
def test_events_ts_loads_as_timestamp(spark, d):
    ev = load_table(spark, "events", d)
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType), (
        f"events.ts must normalize to TimestampType, got {ev.schema['ts'].dataType} in {d}"
    )
    # The whole point: epoch extraction must analyze and execute.
    row = ev.agg(
        F.min(F.unix_millis("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).collect()[0]
    assert row["lo"] is not None and row["hi"] is not None


def test_events_ts_epoch_matches_duckdb(spark, sf_dir):
    """Value parity with the oracle engine: epoch millis agree bit-for-bit."""
    duckdb = pytest.importorskip("duckdb")
    ev = load_table(spark, "events", sf_dir)
    spark_rows = {
        r["event_id"]: r["ms"]
        for r in ev.select("event_id", F.unix_millis("ts").alias("ms"))
        .orderBy("event_id")
        .limit(100)
        .collect()
    }
    oracle = duckdb.sql(
        "SELECT event_id, epoch_ms(ts) AS ms FROM "
        f"read_parquet('{sf_dir}/events.parquet') ORDER BY event_id LIMIT 100"
    ).fetchall()
    assert {eid: ms for eid, ms in oracle} == spark_rows


def test_unrecognized_ts_type_raises(spark, tmp_path):
    """A future fixture drift to e.g. string ts must fail loudly, not downstream."""
    p = str(tmp_path / "badts")
    spark.createDataFrame(
        [(1, "2026-01-01T00:00:00")], "event_id bigint, ts string"
    ).write.parquet(f"{p}/events.parquet")
    with pytest.raises(TypeError, match="unrecognized type"):
        load_table(spark, "events", p)
