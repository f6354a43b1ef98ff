"""Deterministic CDC change log derived from the ``events`` table.

The driver's synthetic corpus has no Debezium topic, so the engine's
correctness queries derive one from ``events``
(``event_id, ts, user_id, event_type, value, props``): each event
becomes one change-log entry for a per-user row keyed by ``user_id``.

The mapping is a fixed, oracle-reproducible rule (both the Spark
expression here and the equivalent ANSI SQL in
``__spark_entry__.oracle_sql`` implement it):

- ``event_type = 'signup'``  → ``op = 'c'`` (insert)
- ``event_type = 'error'``   → ``op = 'd'`` (delete)
- anything else              → ``op = 'u'`` (update)

``ts_ms`` is the epoch-millis of ``ts`` (the reference's envelope unit,
cdc_stream.py:258); ``event_id`` is the total-order sequence (the
Kafka-offset stand-in used for deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: SQL fragment (ANSI, runs in both Spark and DuckDB) used by oracles.
CHANGELOG_SQL = """
SELECT
  event_id AS seq,
  user_id  AS key_id,
  CASE WHEN event_type = 'signup' THEN 'c'
       WHEN event_type = 'error'  THEN 'd'
       ELSE 'u' END AS op,
  ts,
  value,
  props
FROM events
"""


def events_as_changelog(events: DataFrame) -> DataFrame:
    """Spark-side twin of :data:`CHANGELOG_SQL`."""
    return events.select(
        F.col("event_id").alias("seq"),
        F.col("user_id").alias("key_id"),
        F.when(F.col("event_type") == "signup", F.lit("c"))
        .when(F.col("event_type") == "error", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        F.col("ts"),
        F.col("value"),
        F.col("props"),
    )
