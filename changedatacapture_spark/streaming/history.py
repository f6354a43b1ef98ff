"""SCD2View: incrementally-maintained Type-2 history.

Completes the engine's IVM family (AggView = aggregates, JoinView /
StarJoinView = enrichment, this = HISTORY): the batch operator
``operators/cdc.py:scd2_history`` materializes validity intervals from
a WHOLE changelog; production can't rescan the log per batch, so this
view maintains the same relation from the per-batch deltas alone.

Storage is two snapshot tables:

- **open**: ≤1 row per key — the key's current version, stored with
  its natural change columns (time + order tie-break + payload), so
  the next batch can stitch against it without type games;
- **closed**: one row per TERMINATED version, keyed
  ``(key..., valid_from, order tie-breaks...)`` — the FULL order
  tuple, because two same-timestamp changes produce two zero-length
  versions at the same ``(key, valid_from)`` and a coarser key would
  silently overwrite one with the other. Append-mostly.

Per batch: the touched keys' open rows (``read_keys`` — key-routed
bucket reads, never a table scan) union with the batch's change rows
and ONE window pass (the same ``scd2_history`` shape) re-derives the
touched keys' intervals — the previous open row closes at the first
batch change, batch-internal chains close each other, the last
non-delete change stays open, a trailing delete leaves the key with
no open row. Work per batch ∝ |batch| + |touched keys|, never table
size. Batches must arrive in (time, order) order per key — the same
ordered-batch contract every e2e and property test in this repo cuts
its batches under.

Crash/replay safety: the closed merge commits before the open merge;
both carry the caller's batch id, so a replay after either commit
no-ops that table and recomputes the other from unchanged pre-state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sink import SnapshotTable


class SCD2View:
    def __init__(
        self,
        spark: SparkSession,
        open_table: SnapshotTable,
        closed_table: SnapshotTable,
        key_cols: Sequence[str],
        order_cols: Sequence[str],
        payload_cols: Sequence[str],
        op_col: str = "op",
        delete_op: str = "d",
    ) -> None:
        """``order_cols[0]`` is the event-time column (it becomes
        ``valid_from``/``valid_to``); the rest break ties. The
        ``closed_table`` must be keyed
        ``key_cols + ["valid_from"] + order_cols[1:]`` (the tie
        columns keep same-timestamp zero-length versions distinct);
        the ``open_table`` by ``key_cols``."""
        self.spark = spark
        self.open = open_table
        self.closed = closed_table
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.payload_cols = list(payload_cols)
        self.op_col = op_col
        self.delete_op = delete_op

    # -- maintenance ------------------------------------------------------

    def _change_cols(self) -> list[str]:
        seen: list[str] = []
        for c in (
            self.key_cols + self.order_cols + [self.op_col] + self.payload_cols
        ):
            if c not in seen:
                seen.append(c)
        return seen

    def apply(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """Fold one UNCOMPACTED change batch (every change row — SCD2
        keeps versions, so latest-per-key compaction would lose the
        intermediate intervals) into the history."""
        from changedatacapture_spark.operators.cdc import (
            compact_latest,
            scd2_history,
        )

        batch = batch.select(*self._change_cols())
        # bounded driver action: the micro-batch's distinct key set
        # (the JoinView/read_keys pattern — |touched| ≤ |batch|)
        touched = [
            tuple(r) if len(self.key_cols) > 1 else r[0]
            for r in batch.select(*self.key_cols).distinct().collect()
        ]
        if not touched:
            return
        if self.open.exists():
            prev = (
                self.open.read_keys(touched)
                .withColumn(self.op_col, F.lit("c"))
                .select(*self._change_cols())
            )
            events = prev.unionByName(batch)
        else:
            events = batch
        # carry the order tie-breaks through as payload so the closed
        # table's composite key can keep same-timestamp versions apart
        inner_payload = list(self.payload_cols) + [
            c for c in self.order_cols[1:] if c not in self.payload_cols
        ]
        hist = scd2_history(
            events, self.key_cols, self.order_cols,
            op_col=self.op_col, payload_cols=inner_payload,
        )
        closed_cols: list[str] = []
        for c in (
            self.key_cols
            + ["valid_from"]
            + self.order_cols[1:]
            + ["valid_to"]
            + self.payload_cols
        ):
            if c not in closed_cols:
                closed_cols.append(c)
        newly_closed = hist.filter(F.col("valid_to").isNotNull()).select(
            *closed_cols, F.lit("u").alias(self.op_col)
        )
        # the key's final state: last change wins; a trailing delete
        # leaves no open version (merge delete on the open table)
        latest = compact_latest(events, self.key_cols, self.order_cols)
        self.closed.merge(newly_closed, batch_id=batch_id)
        self.open.merge(latest, batch_id=batch_id)

    # -- reads ------------------------------------------------------------

    def history(self) -> DataFrame:
        """The full Type-2 relation: ``key..., payload..., valid_from,
        valid_to, is_current`` — equal to ``scd2_history`` over the
        whole changelog (the property the e2e oracle checks)."""
        time_col = self.order_cols[0]
        closed = self.closed.read().select(
            *self.key_cols,
            *self.payload_cols,
            "valid_from",
            "valid_to",
            F.lit(0).alias("is_current"),
        )
        open_rows = self.open.read().select(
            *self.key_cols,
            *self.payload_cols,
            F.col(time_col).alias("valid_from"),
            F.lit(None).cast(closed.schema["valid_to"].dataType).alias(
                "valid_to"
            ),
            F.lit(1).alias("is_current"),
        )
        return closed.unionByName(open_rows)

    def probe_as_of(
        self, facts: DataFrame, fact_time_col: str, prefix: str = "asof_"
    ) -> DataFrame:
        """Point-in-time enrichment against the maintained history:
        each fact row picks up the payload of the version whose
        ``[valid_from, valid_to)`` interval covers the fact's time —
        nulls when none does (before the first version, or inside a
        post-delete gap). Same visibility rule as
        ``operators/cdc.py:point_in_time_join`` (a version opening at
        exactly the fact's time IS visible), which is the law the
        shared-oracle e2e pins.

        Plan: equi-join on the key with the interval test as a
        residual — per-key histories are small, so the join never
        pair-explodes; the closed side's key blooms prune its buckets
        when the fact key set is selective."""
        t = F.col(f"_f_{fact_time_col}")
        hist = self.history().select(
            *[F.col(k) for k in self.key_cols],
            "valid_from",
            "valid_to",
            *[F.col(c).alias(f"_h_{c}") for c in self.payload_cols],
        )
        fa = facts.select(
            *[F.col(c).alias(f"_f_{c}") for c in facts.columns]
        )
        cond = None
        for k in self.key_cols:
            eq = F.col(f"_f_{k}") == F.col(k)
            cond = eq if cond is None else cond & eq
        cond = cond & (F.col("valid_from") <= t) & (
            F.col("valid_to").isNull() | (t < F.col("valid_to"))
        )
        joined = fa.join(hist, cond, "left")
        return joined.select(
            *[F.col(f"_f_{c}").alias(c) for c in facts.columns],
            *[
                F.col(f"_h_{c}").alias(f"{prefix}{c}")
                for c in self.payload_cols
            ],
        )
