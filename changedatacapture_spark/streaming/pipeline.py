"""Structured-Streaming orchestration: source → compact → merge.

Re-architecture of the reference's ``run_stream`` / ``process_batch``
(cdc_stream.py:909-1006, :545-708):

- the per-batch function is the *same* batch operator pipeline used in
  batch mode (compact → merge), wrapped in ``foreachBatch`` — exactly
  the structural split the reference uses, minus its driver-side
  schema cache, per-batch ``count()`` actions, and global flags;
- checkpointing is Spark's (Kafka offsets + batch id), and the sink's
  ``batch_id`` idempotence makes replays safe (exactly-once effect);
- the Kafka source is configuration; tests drive the identical code
  path with a file (or rate) source.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from changedatacapture_spark.operators.cdc import compact_latest
from changedatacapture_spark.schema.envelope import debezium_envelope_schema
from changedatacapture_spark.streaming.sink import SnapshotTable


def kafka_envelope_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int | None = 10000,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka source (S1/S2): one topic of Debezium JSON envelope values."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load().selectExpr(
        "CAST(value AS STRING) AS value", "offset AS seq", "timestamp AS kafka_ts"
    )


def file_envelope_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File source of JSONL envelopes with a monotone ``seq`` — the
    hermetic test twin of the Kafka source."""
    schema = StructType.fromDDL("value string, seq long")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )


class CdcPipeline:
    """End-to-end CDC materialization: envelopes in, snapshot table out.

    Parse once (``from_json`` with the typed envelope schema), derive
    the key with the delete/before rule, compact to the net change per
    key with deterministic ``(ts_ms, seq)`` ordering, and apply it as a
    single merge per micro-batch.
    """

    def __init__(
        self,
        spark: SparkSession,
        record_schema: StructType,
        table: SnapshotTable,
        key_col: str,
        dlq_path: str | None = None,
    ) -> None:
        self.spark = spark
        self.record_schema = record_schema
        self.envelope_schema = debezium_envelope_schema(record_schema)
        self.table = table
        self.key_col = key_col
        self.dlq_path = dlq_path

    # -- batch core (also usable on a static DataFrame) -------------------

    def parse(self, raw: DataFrame) -> DataFrame:
        """raw(value, seq) → typed change rows (key, op, ts_ms, seq, after image)."""
        parsed = raw.select(
            F.from_json("value", self.envelope_schema).alias("e"), "seq", "value"
        )
        if self.dlq_path:
            corrupt = parsed.filter(F.col("e.payload.op").isNull()).select("seq", "value")
            if not corrupt.isEmpty():
                corrupt.write.mode("append").parquet(self.dlq_path)
        ok = parsed.filter(F.col("e.payload.op").isNotNull())
        key = F.when(
            F.col("e.payload.op") == "d", F.col(f"e.payload.before.{self.key_col}")
        ).otherwise(F.col(f"e.payload.after.{self.key_col}"))
        fields = [f.name for f in self.record_schema.fields if f.name != self.key_col]
        return ok.select(
            key.alias(self.key_col),
            F.col("e.payload.op").alias("op"),
            F.col("e.payload.ts_ms").alias("ts_ms"),
            "seq",
            *[F.col(f"e.payload.after.{f}").alias(f) for f in fields],
        )

    def process_batch(self, raw: DataFrame, batch_id: int | None = None) -> None:
        """The foreachBatch body — also the whole batch-mode engine."""
        # the file/Kafka micro-batch often arrives in 1-2 partitions
        # (one per file / topic-partition); fan out before the parse or
        # the whole batch runs on one core
        target = self.spark.sparkContext.defaultParallelism
        if raw.rdd.getNumPartitions() < max(2, target // 4):
            raw = raw.repartition(target)
        changes = self.parse(raw)
        compacted = compact_latest(
            changes, [self.key_col], ["ts_ms", "seq"]
        )
        self.table.merge(compacted, batch_id=batch_id)

    # -- streaming wrapper -------------------------------------------------

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
