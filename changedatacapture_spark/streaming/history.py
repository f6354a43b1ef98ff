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

Read-side pruning (round 15): ``history(keys=...)`` and
``probe_as_of`` with a bounded fact key set read the open side via
key-routed ``read_keys`` buckets and the closed side via chunked
``read_where`` IN-probes (key blooms/zones), with ``up_to`` /
``snapshot_as_of`` pushing a ``valid_from`` range into the closed
table's zone maps — append-in-time-order keeps those tight, so early
probes skip late files entirely. ``last_scan`` records each side's
kept/total after every pruned read.
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
        max_inlist: int = 10_000,
    ) -> None:
        """``order_cols[0]`` is the event-time column (it becomes
        ``valid_from``/``valid_to``); the rest break ties. The
        ``closed_table`` must be keyed
        ``key_cols + ["valid_from"] + order_cols[1:]`` (the tie
        columns keep same-timestamp zero-length versions distinct);
        the ``open_table`` by ``key_cols``. ``max_inlist`` bounds the
        driver-collected key set a :meth:`probe_as_of` may route
        through pruned history reads (the JoinView cap)."""
        self.spark = spark
        self.open = open_table
        self.closed = closed_table
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.payload_cols = list(payload_cols)
        self.op_col = op_col
        self.delete_op = delete_op
        self.max_inlist = max_inlist
        #: per-side manifest scan report of the last pruned history
        #: read (``probe_as_of`` / ``history(keys=...)``) — the
        #: buckets_kept < buckets_total evidence plan tests pin
        self.last_scan: dict = {}

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
        # synthesized markers must never collide with the caller's
        # delete marker (a non-default delete_op of "c"/"u" would
        # otherwise turn the stitched open row or every closed-version
        # append into a delete)
        keep_op = next(
            m for m in ("c", "u", "k") if m != self.delete_op
        )
        if self.open.exists():
            prev = (
                self.open.read_keys(touched)
                .withColumn(self.op_col, F.lit(keep_op))
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
            delete_op=self.delete_op,
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
            *closed_cols, F.lit(keep_op).alias(self.op_col)
        )
        # the key's final state: last change wins; a trailing delete
        # leaves no open version (merge delete on the open table)
        latest = compact_latest(events, self.key_cols, self.order_cols)
        self.closed.merge(
            newly_closed,
            op_col=self.op_col,
            delete_op=self.delete_op,
            batch_id=batch_id,
        )
        self.open.merge(
            latest,
            op_col=self.op_col,
            delete_op=self.delete_op,
            batch_id=batch_id,
        )

    # -- reads ------------------------------------------------------------

    def history(
        self, keys: list | None = None, up_to=None
    ) -> DataFrame:
        """The Type-2 relation: ``key..., payload..., valid_from,
        valid_to, is_current`` — with no arguments, equal to
        ``scd2_history`` over the whole changelog (the property the
        e2e oracle checks).

        ``keys`` (bounded driver metadata — a collected key list, the
        ``read_keys`` contract) restricts to those keys' versions AND
        prunes the reads: the open side routes its hash buckets via
        ``read_keys``; the closed side (keyed by the full
        ``(key..., valid_from, tie...)`` tuple, so bucket routing
        can't apply) probes chunked ``read_where`` IN-lists on the
        first key column — its blooms/zones drop buckets the probed
        keys never entered. ``up_to`` additionally pushes a
        ``valid_from <= up_to`` range into the closed read: the table
        appends in event-time order, so per-file zone maps on
        ``valid_from`` are tight and an early bound skips late files
        (``stats_on_merge=True`` keeps per-merge file stats alive).
        Both prune via manifest stats BEFORE Spark schedules a file;
        results are exact regardless (predicates re-apply on
        survivors). ``last_scan`` records both sides' kept/total."""
        time_col = self.order_cols[0]
        kcol = self.key_cols[0]
        closed_preds: list[tuple] = []
        if up_to is not None:
            closed_preds.append(("valid_from", "<=", up_to))
        self.last_scan = {}
        if keys is not None and len(keys) == 0:
            closed_src = self.closed.read().limit(0)
            open_src = self.open.read().limit(0)
        elif keys is not None:
            from .sink import chunked_in_read

            # NULL components never equi-join / never pass the IN
            # re-filter, so dropping them from the probe list is exact
            # (and read_where's per-value zone/bloom tests need real
            # values)
            first = [
                f
                for f in (
                    (k[0] if isinstance(k, tuple) else k) for k in keys
                )
                if f is not None
            ]
            closed_src, rep = chunked_in_read(
                self.closed, kcol, first, self.max_inlist,
                extra_preds=closed_preds,
            )
            self.last_scan["closed"] = rep
            open_src = self.open.read_keys(keys)
            self.last_scan["open"] = dict(self.open.last_scan_report)
            if len(self.key_cols) > 1:
                # first-component pruning is conservative; exact-set
                # membership re-applies on the composite key
                kdf = self.spark.createDataFrame(
                    [k if isinstance(k, tuple) else (k,) for k in keys],
                    self.key_cols,
                )
                closed_src = closed_src.join(
                    F.broadcast(kdf), self.key_cols, "leftsemi"
                )
        elif closed_preds:
            closed_src = self.closed.read_where(closed_preds)
            self.last_scan["closed"] = dict(self.closed.last_scan_report)
            open_src = self.open.read()
        else:
            closed_src = self.closed.read()
            open_src = self.open.read()
        closed = closed_src.select(
            *self.key_cols,
            *self.payload_cols,
            "valid_from",
            "valid_to",
            F.lit(0).alias("is_current"),
        )
        open_rows = open_src.select(
            *self.key_cols,
            *self.payload_cols,
            F.col(time_col).alias("valid_from"),
            F.lit(None).cast(closed.schema["valid_to"].dataType).alias(
                "valid_to"
            ),
            F.lit(1).alias("is_current"),
        )
        out = closed.unionByName(open_rows)
        if up_to is not None:
            # open rows and surviving closed rows past the bound drop
            # here (the closed read's zone pruning already skipped
            # whole files; this is the exactness re-filter)
            out = out.filter(F.col("valid_from") <= F.lit(up_to))
        return out

    def snapshot_as_of(self, at, keys: list | None = None) -> DataFrame:
        """Each key's state AS OF time ``at`` (≤1 row per key): the
        version whose ``[valid_from, valid_to)`` interval contains
        ``at`` — absent keys (pre-first-version, or inside a
        post-delete gap) yield no row. The closed read pushes
        ``valid_from <= at`` through zone maps (append-in-time-order
        keeps those zones tight), so an early ``at`` on a long-lived
        history reads a file subset, never the whole closed table."""
        h = self.history(keys=keys, up_to=at)
        return h.filter(
            F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(at))
        ).drop("is_current")

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
        pair-explodes. When the facts' distinct key set fits
        ``max_inlist`` (collected — bounded driver metadata, the
        JoinView pattern), BOTH history sides read pruned: the open
        table via key-routed ``read_keys`` buckets, the closed table
        via chunked ``read_where`` IN-probes whose key blooms/zones
        drop buckets the probed keys never entered, with the facts'
        max time pushed as a ``valid_from`` zone bound on top
        (versions opening after the last fact can never cover any
        fact). Past the cap the key set is no longer bounded metadata
        and the probe reads the full history — stated, not claimed
        otherwise. ``last_scan`` carries the kept/total evidence.

        The overflow probe is two-staged so a batch-scale fact set
        never pays a full per-key aggregate just to learn "read the
        full history": stage 1 collects ``distinct(keys).limit(cap+1)``
        — per-partition partial dedup + local limits, never a global
        per-key shuffle of millions of keys — and ONLY under the cap
        does stage 2 run the global ``max(fact_time)`` (a map-side
        scalar aggregate, no keyed shuffle at all). Two small driver
        jobs on the pruned path; one short-circuiting job and zero
        aggregates on the overflow path."""
        t = F.col(f"_f_{fact_time_col}")
        cap = self.max_inlist
        krows = (
            facts.select(*self.key_cols).distinct().limit(cap + 1).collect()
        )
        fkeys = [
            tuple(r[: len(self.key_cols)])
            if len(self.key_cols) > 1
            else r[0]
            for r in krows
            if (r[0] is not None if len(self.key_cols) == 1 else True)
        ]
        if fkeys and len(krows) <= cap:
            tmax = facts.agg(
                F.max(fact_time_col).alias("_tmax")
            ).collect()[0]["_tmax"]
            hist_rel = self.history(keys=fkeys, up_to=tmax)
        else:
            hist_rel = self.history()
        hist = hist_rel.select(
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
