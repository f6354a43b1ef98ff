"""changedatacapture_spark — a PySpark-native change-data-capture &
analytics engine.

A from-scratch re-architecture of the capabilities of
``buituandev/ChangeDataCapture`` (reference, read-only at
``/root/reference``): Debezium-style change-event streams are parsed,
compacted to the net effect per key, and applied to a materialized
columnar table; the materialized tables are then queryable with ordinary
Spark SQL, and a layer of large-scale data-pipeline operators
(deduplication, similarity search, text analysis, multimodal columns)
runs on top.

Design principles (vs. the reference, see SURVEY.md):

- DataFrame/SQL declarative plans everywhere; Catalyst + AQE pick the
  physical strategy. No driver-side ``collect()`` loops in operators.
- The core compaction (latest event per key) is an aggregation
  (``max_by`` over a packed struct) so it benefits from map-side
  partial aggregation — it scales to 1000 executors, unlike a
  global-sort formulation.
- Deterministic ordering: every "latest" is ordered by
  ``(ts, sequence)`` — the reference's ``max_by(ts_ms)`` tie-break
  nondeterminism (cdc_stream.py:599) is fixed by construction.
- State lives in the table (merge target), not in driver globals.
"""

__version__ = "0.1.0"
