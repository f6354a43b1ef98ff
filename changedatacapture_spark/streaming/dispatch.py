"""Per-source pipeline dispatch (T6) + the MongoDB pipeline.

The reference selects its Postgres or MongoDB pipeline from
``database_config.database_type`` and raises on anything else
(cdc_stream.py:1095-1108). Here the mapping is an extensible registry:
connector strategies register themselves under a type name, and
``build_pipeline`` resolves config → pipeline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from changedatacapture_spark.streaming.pipeline import CdcPipeline
from changedatacapture_spark.streaming.sink import SnapshotTable


class MongoCdcPipeline:
    """MongoDB path: extended-JSON documents → normalized map columns
    → compact → merge (reference: process_mongodb_batch,
    cdc_stream.py:710-904) — with the Python UDF and the 4×
    ``get_json_object`` scans replaced by one ``from_json`` and pure
    column expressions (schema/bson.py).

    Documents stay ``map<string,string>`` through compaction (the
    reference's model); ``fields`` projects them to typed-ish string
    columns on merge, key always retained.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: SnapshotTable,
        fields: list[str],
        key_field: str = "_id",
    ) -> None:
        self.spark = spark
        self.table = table
        self.fields = fields
        self.key_field = key_field

    def process_batch(self, raw: DataFrame, batch_id: int | None = None) -> None:
        from changedatacapture_spark.operators.cdc import compact_latest
        from changedatacapture_spark.schema.bson import mongo_changes

        # stable tie-break: use the source's order column (Kafka offset)
        # when present; otherwise derive an arrival-order id BEFORE the
        # repartition — after a round-robin shuffle the id is neither
        # arrival-ordered nor stable across replays, so same-ts events
        # could pick a different winner nondeterministically
        if "seq" not in raw.columns:
            raw = raw.withColumn("seq", F.monotonically_increasing_id())
        from changedatacapture_spark.streaming.pipeline import fan_out

        raw = fan_out(raw, self.spark)
        changes = mongo_changes(raw, key_field=self.key_field)
        # heterogeneous documents: compaction runs on the map form so
        # no field set is imposed before the winning event is chosen
        compacted = compact_latest(changes, ["key_value"], ["ts_ms", "seq"])
        projected = compacted.select(
            F.col("key_value").alias(self.key_field),
            "op",
            "ts_ms",
            *[
                F.element_at("after_doc", f).alias(f)
                for f in self.fields
                if f != self.key_field
            ],
        )
        self.table.merge(projected, batch_id=batch_id)

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        writer = stream.writeStream.foreachBatch(
            lambda df, bid: self.process_batch(df, bid)
        ).option("checkpointLocation", checkpoint_dir)
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()


PipelineFactory = Callable[[SparkSession, dict], object]

_REGISTRY: dict[str, PipelineFactory] = {}


def register_connector(name: str) -> Callable[[PipelineFactory], PipelineFactory]:
    def deco(fn: PipelineFactory) -> PipelineFactory:
        _REGISTRY[name] = fn
        return fn

    return deco


def connector_types() -> list[str]:
    return sorted(_REGISTRY)


def build_pipeline(spark: SparkSession, config: dict):
    """Resolve ``database_config.database_type`` → pipeline instance.

    Raises ``ValueError`` on unknown types (parity:
    cdc_stream.py:1104-1108 raises on anything but postgres/mongodb).
    """
    db_type = (config.get("database_config") or {}).get("database_type", "postgres")
    if db_type not in _REGISTRY:
        raise ValueError(
            f"unsupported database_type {db_type!r}; known: {connector_types()}"
        )
    return _REGISTRY[db_type](spark, config)


@register_connector("postgres")
def _postgres(spark: SparkSession, config: dict) -> CdcPipeline:
    from pyspark.sql.types import StructType

    from changedatacapture_spark.schema.envelope import (
        record_schema_from_field_info,
    )

    proc = config.get("processing_config") or {}
    delta = config.get("delta_config") or {}
    field_info = config.get("field_info") or []
    schema = (
        record_schema_from_field_info(field_info)
        if field_info
        else StructType.fromDDL(proc.get("record_ddl", "id long"))
    )
    table = SnapshotTable(
        spark,
        delta.get("table_path", "/tmp/cdc_table"),
        key_cols=[proc.get("key_column", "id")],
        n_buckets=int(proc.get("n_buckets", 16)),
    )
    return CdcPipeline(
        spark, schema, table, key_col=proc.get("key_column", "id"),
        dlq_path=proc.get("dlq_path"),
    )


@register_connector("mongodb")
def _mongodb(spark: SparkSession, config: dict) -> MongoCdcPipeline:
    proc = config.get("processing_config") or {}
    delta = config.get("delta_config") or {}
    return MongoCdcPipeline(
        spark,
        SnapshotTable(
            spark,
            delta.get("table_path", "/tmp/cdc_table"),
            key_cols=[proc.get("key_column", "_id")],
            n_buckets=int(proc.get("n_buckets", 16)),
        ),
        fields=proc.get("columns_to_save", []),
        key_field=proc.get("key_column", "_id"),
    )
