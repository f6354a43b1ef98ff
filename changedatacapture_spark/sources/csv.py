"""CSV batch source (S4, SURVEY §2.1).

The reference seeds its target tables from CSV files
(dataframe_to_postgresql.py:62-79 reads ``hotel_bookings.csv`` with
header + inferSchema; simple_submit.py:31-32 the same) — this is a
real user's first touch of the engine. Spark's CSV reader gives the
same surface declaratively; with an explicit schema the scan is a
single pass (``inferSchema`` costs one extra pass over the file and is
non-deterministic on messy data — prefer passing the schema at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def load_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    infer_schema: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """Read a CSV file/directory as a DataFrame.

    ``schema`` (StructType or DDL string) wins over inference; with
    neither, all columns arrive as strings (cheapest, schema-on-use).
    Quoted fields with embedded delimiters are handled by the standard
    CSV dialect (``quote='"'``, doubled-quote escape).

    ``multiline`` is OFF by default: multiLine parsing makes every file
    unsplittable (one task per file, no parallel input splits) — a
    scale-killer on large seed loads. Opt in only for data with quoted
    embedded newlines.
    """
    reader = spark.read.option("header", str(header).lower()).option(
        "sep", delimiter
    )
    if multiline:
        reader = reader.option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, delimiter: str = ","
) -> None:
    """Write a DataFrame as CSV (overwrite) — the seed-file twin."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .csv(path)
    )
