"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``changedatacapture_spark.queries`` — the engine's
query registry, where every implemented operator from SURVEY.md §2 is
registered as a (Spark callable, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Q-APPLY — materialize the final table state from
    the CDC change log (the reference system's core capability)."""
    from changedatacapture_spark.queries import SPARK_QUERIES

    return SPARK_QUERIES["cdc_apply"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from changedatacapture_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from changedatacapture_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
