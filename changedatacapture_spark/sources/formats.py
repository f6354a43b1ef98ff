"""Columnar/row batch sources beyond parquet+CSV: ORC and JSONL.

The reference's batch surface is CSV-seed + parquet/Delta read
(dataframe_to_postgresql.py:62-79; cdc_stream.py:664-689), but a lake
engine meets data in whatever format the producer chose. Both formats
here ship inside Spark itself (no extra jars):

- **ORC**: the other splittable columnar lake format; Spark's reader
  gives predicate pushdown + column pruning exactly as parquet
  (``spark.sql.orc.filterPushdown`` defaults true in Spark 4).
- **JSONL**: one JSON object per line — the lingua franca of raw
  event dumps and LLM training corpora. Schema should be passed at
  scale: inference costs a full extra pass and is non-deterministic on
  heterogeneous lines (same rule as the CSV source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def load_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read an ORC file/directory; explicit schema skips footer merges."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Write a DataFrame as ORC (overwrite), snappy-compressed."""
    df.write.mode("overwrite").option("compression", "snappy").orc(path)


def load_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read JSON-lines; with ``schema`` the scan is a single pass and
    corrupt lines land in ``_corrupt_record`` (PERMISSIVE default)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a DataFrame as JSON-lines (overwrite)."""
    df.write.mode("overwrite").json(path)
