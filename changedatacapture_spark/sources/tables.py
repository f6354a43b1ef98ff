"""Parquet batch sources for the driver's synthetic tables (TESTDATA.md).

Mirror of the reference's batch reads (S3-S5, SURVEY §2.1) on the
engine's test corpus. Parquet scans get predicate pushdown and column
pruning from Catalyst for free — operators downstream must keep their
plans declarative so those reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one synthetic table as a DataFrame.

    The fixture's ``events.ts`` column has shipped in several physical
    shapes across driver regenerations; all are normalized here to a
    session-zone ``TimestampType`` so every downstream operator sees one
    contract:

    - TIMESTAMP(NANOS) → nano-epoch longs under
      ``spark.sql.legacy.parquet.nanosAsLong`` → truncated to micros
      (the same conversion DuckDB/Arrow apply).
    - ``timestamp[us]`` without a UTC flag → Spark 4 infers
      TIMESTAMP_NTZ (``spark.sql.parquet.inferTimestampNTZ.enabled``
      defaults true) and ``unix_millis``/``unix_micros`` reject it →
      cast to TIMESTAMP. The session time zone is UTC (session.py), so
      the epoch values are bit-identical to the DuckDB oracle's.

    Any other physical type raises immediately with the observed type,
    so a future fixture change is a one-line diagnosis instead of a
    silent analysis failure in nine queries.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    d = sf_dir or DEFAULT_SF_DIR
    # These confs are runtime-settable, and foreign sessions (test
    # harnesses, notebooks) won't have them: set them here so
    # events.parquet's ts column reads the same regardless of who built
    # the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{d}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        elif not isinstance(ts_type, T.TimestampType):
            raise TypeError(
                f"events.ts arrived as unrecognized type {ts_type}; expected "
                "TIMESTAMP, TIMESTAMP_NTZ, or nano-epoch LONG (fixture "
                "contract — see sources/tables.py docstring)"
            )
    return df
