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

    TIMESTAMP(NANOS) parquet columns (which Spark reads as nano-epoch
    longs under ``spark.sql.legacy.parquet.nanosAsLong``) are converted
    to micro-precision timestamps by truncation — the same conversion
    DuckDB/Arrow apply — so cross-engine results agree.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    d = sf_dir or DEFAULT_SF_DIR
    # The conf is runtime-settable, and foreign sessions (test harnesses,
    # notebooks) won't have it: set it here so events.parquet's
    # TIMESTAMP(NANOS) column is readable regardless of who built the session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{d}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
