"""Secondary (non-key) index over a :class:`SnapshotTable` column.

The store's primary access paths are key-routed (``read_keys``) or
stats-pruned (``read_where`` zone maps + bloom bitmaps). Both leave a
gap: "fetch every row whose PAYLOAD column equals v" on a column the
table is neither keyed nor clustered on still has to consult every
bucket's stats and scan the survivors. A **secondary index** closes it
the way Hudi's record index / DynamoDB's GSI do — a posting relation
``indexed value → primary key`` maintained INCREMENTALLY from the
table's own change feed, stored as its own ``SnapshotTable`` (so it
inherits atomic commits, replay idempotence, time travel, and bloom
skipping on the value column for free).

Scale design (100 TB): maintenance cost per sync is ∝ the change-feed
delta (never the table), lookups read (a) the posting buckets the
probed value's bloom/zones keep, then (b) only the key-routed base
buckets — two bounded scans, no full pass. The posting collect on the
lookup path is bounded by the value's selectivity, which is the
contract of ANY secondary index (point lookups on low-selectivity
values should use a scan; this mirrors e.g. Postgres planner rules).

Sizing rule: the 1024-bit manifest blooms stay selective up to
~200 DISTINCT indexed values per posting bucket (fill ≈ 54%, FP ≈
7%); past ~750 they saturate (FP ≈ 80%). Size ``n_buckets`` ≈
|distinct values| / 200 — measured at 10× scale: 12k distinct values
probe 13/16 kept at 16 buckets but 4/64 at 64. Posting buckets are
value-count-sized, not byte-sized, so high counts are cheap.

No reference analog: the reference engine has no secondary indexes;
this extends the snapshot store the same way bloom skipping did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sink import SnapshotTable


class SecondaryIndex:
    """Value→key posting index, change-feed maintained.

    ``sync()`` after any base-table commit brings the index to the
    table's current version:

    - first sync (or a gap past the base's ``retain_history``): full
      rebuild from one base read;
    - otherwise: ``changes_between(indexed, current,
      include_preimage=True)`` — inserts/update-postimages ADD
      postings, deletes/update-preimages RETRACT them; an update that
      left the indexed value unchanged nets out (its retraction is
      anti-joined away so the posting row never churns).

    NULL indexed values are not indexed (the usual engine contract);
    ``lookup(None)`` raises.

    Replay/crash safety: posting merges use the base version as the
    batch id, and that committed batch id IS the indexed-version
    record — one atomic commit carries both the postings and the
    version they reflect, so there is no window where the index's
    data and its progress marker disagree. A replayed sync no-ops on
    the batch-id check.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: SnapshotTable,
        col: str,
        path: str | None = None,
        n_buckets: int = 8,
        postings_mode: str = "cow",
        compact_every: int | None = None,
        compact_minor_ratio: float | None = None,
        compact_major_ratio: float | None = None,
        compact_max_files_per_bucket: int | None = None,
    ) -> None:
        if postings_mode not in ("cow", "mor"):
            raise ValueError(
                f"postings_mode must be 'cow' or 'mor', got {postings_mode!r}"
            )
        self.spark = spark
        self.table = table
        self.col = col
        #: posting-store maintenance policy, evaluated automatically
        #: after every :meth:`sync` (the same knobs ``CdcPipeline``
        #: applies to the base table after every batch — an index that
        #: needed a separate operator runbook to stay healthy would
        #: rot on exactly the high-churn tables it exists for). In
        #: ``postings_mode="mor"`` with no explicit policy, runs fold
        #: once ≥8 accumulate: unbounded run accumulation is read
        #: amplification on every probe plus an eventually-``None``
        #: planner estimate, so "no policy" is not a safe default
        #: there. Pass any knob explicitly (or ``compact_every=0``) to
        #: take manual control.
        if postings_mode == "mor" and all(
            x is None
            for x in (
                compact_every,
                compact_minor_ratio,
                compact_major_ratio,
                compact_max_files_per_bucket,
            )
        ):
            compact_every = 8
        self.compact_every = compact_every or None
        self.compact_minor_ratio = compact_minor_ratio
        self.compact_major_ratio = compact_major_ratio
        self.compact_max_files_per_bucket = compact_max_files_per_bucket
        #: posting-merge mode: "cow" (default) rewrites touched posting
        #: buckets per sync; "mor" appends each sync's postings as a
        #: delta run — the high-churn configuration where every sync
        #: touches most posting buckets and copy-on-write would rewrite
        #: the index per micro-batch. MoR runs commit per-file row
        #: counts (footer-read, no job), so the planner's zero-job
        #: hot-value gate (SnapshotTable.estimate_rows_where) stays
        #: live with runs pending; bound read amplification with
        #: ``postings.compact_runs()`` / ``compact_by_size`` on the
        #: usual maintenance cadence.
        self.postings_mode = postings_mode
        self.path = (path or f"{table.path}__idx__{col}").rstrip("/")
        # posting key = (value, base key...): one row per live posting,
        # deletes are real deletes. bloom_cols on the value column is
        # what makes lookup() prune posting buckets for values whose
        # hash never entered them (the value is the FIRST key component,
        # not the whole key, so bucket routing alone can't prune).
        # routing hashes the FULL posting key, so a hot value's
        # postings spread across buckets (skew-free parallel probes);
        # bloom bitmaps on the value prune buckets the value never
        # entered, and the value-sort (cluster_cols) gives parquet
        # row-group stats selectivity INSIDE surviving buckets.
        # stats_on_merge: the posting table is the scan-often /
        # merge-per-batch case that flag exists for — a merge that
        # DROPPED its touched buckets' stats (the default policy)
        # would strip the bloom bitmaps every sync and lookups would
        # degrade to full posting scans until the next rewrite.
        self.postings = SnapshotTable(
            spark,
            self.path,
            key_cols=[col] + list(table.key_cols),
            n_buckets=n_buckets,
            bloom_cols=[col],
            cluster_cols=[col],
            stats_on_merge=True,
        )

    # -- maintenance ------------------------------------------------------

    @property
    def indexed_version(self) -> int | None:
        """Base-table version the postings reflect — read from the
        posting table's OWN committed batch id (every posting commit
        carries the base version it indexed), so the indexed-version
        record is atomic with the postings themselves. A separate
        marker file would reopen the crash window it exists to close:
        a crash between the posting merge and the marker write leaves
        stale postings that the next (differently-versioned) sync
        never retracts."""
        if not self.postings.exists():
            return None
        return self.postings.last_batch_id()

    def _posting_cols(self) -> list[str]:
        return [self.col] + list(self.table.key_cols)

    def sync(self) -> dict:
        """Advance the index to the base table's current version.

        Returns ``{"mode": "noop"|"full"|"incremental", "from": ...,
        "to": ...}``. Incremental work is ∝ the feed delta; the full
        path is one base scan (bootstrap, or the feed's horizon was
        vacuumed — both logged in the return value, never silent).
        """
        v_now = self.table.version
        v_from = self.indexed_version
        if v_from == v_now:
            return {"mode": "noop", "from": v_from, "to": v_now}
        cols = self._posting_cols()
        feed = None
        if v_from is not None:
            try:
                # the version-availability check raises HERE (the reads
                # are constructed eagerly); the try stays this narrow so
                # a genuine maintenance bug can never masquerade as a
                # retention miss and silently degrade to full rebuilds
                feed = self.table.changes_between(
                    v_from, v_now, include_preimage=True
                )
            except ValueError:
                # v_from's files were vacuumed (past retain_history):
                # fall through to the full rebuild below
                feed = None
        if feed is not None:
            adds = (
                feed.filter(
                    F.col("change_type").isin("insert", "update_post")
                )
                .select(*cols)
                .filter(F.col(self.col).isNotNull())
                .withColumn("op", F.lit("c"))
            )
            # retract old postings — but an update whose indexed
            # value did NOT change re-adds the same posting in this
            # same batch; anti-join those retractions away so the
            # batch stays ≤1 row per posting key (the merge
            # contract) and unchanged postings never churn
            dels = (
                feed.filter(
                    F.col("change_type").isin("delete", "update_pre")
                )
                .select(*cols)
                .filter(F.col(self.col).isNotNull())
                .join(adds.select(*cols), cols, "left_anti")
                .withColumn("op", F.lit("d"))
            )
            self.postings.merge(
                adds.unionByName(dels),
                batch_id=v_now,
                mode=self.postings_mode,
            )
            did = self._maintain()
            return {
                "mode": "incremental", "from": v_from, "to": v_now,
                "maintenance": did,
            }
        # overwrite stores the frame as-is (merge consumes the op
        # column; overwrite must not carry one)
        full = (
            self.table.read()
            .select(*cols)
            .filter(F.col(self.col).isNotNull())
        )
        self.postings.overwrite(full, batch_id=v_now)
        return {"mode": "full", "from": v_from, "to": v_now}

    def _maintain(self) -> str:
        """Evaluate the posting-store maintenance policy (driver
        metadata only when nothing trips). Same crash-deferral
        argument as the pipeline's post-batch hook: the sync's merge
        already committed, so a crash here only defers the fold to
        the next sync."""
        did = "none"
        if self.compact_every is not None:
            ptr = self.postings._read_pointer()
            if (
                ptr is not None
                and len(ptr.get("runs") or []) >= self.compact_every
            ):
                self.postings.compact_runs()
                did = "minor"
        if did == "none" and (
            self.compact_minor_ratio is not None
            or self.compact_major_ratio is not None
            or self.compact_max_files_per_bucket is not None
        ):
            n = self.postings.compact_by_size(
                self.compact_minor_ratio,
                self.compact_major_ratio,
                self.compact_max_files_per_bucket,
            )
            did = "size" if n else "none"
        return did

    # -- lookup -----------------------------------------------------------

    def lookup_keys(self, value) -> DataFrame:
        """Posting probe only: the base-table keys whose indexed column
        equals ``value`` (as of the last sync). Bloom + zone pruning on
        the posting store bounds the scan to the value's buckets."""
        if value is None:
            raise ValueError("NULL values are not indexed")
        return self.postings.read_where([(self.col, "=", value)]).select(
            *self.table.key_cols
        )

    def lookup_keys_in(self, values: list) -> DataFrame:
        """IN-list posting probe: ``(value, key...)`` postings for N
        probed values in chunked bloom-pruned posting scans — the
        decontamination shape (thousands of probe values) costs
        ceil(N/max-inlist) pruned scans, never N point probes and
        never a full posting pass. NULLs in ``values`` are dropped
        (never indexed)."""
        from .sink import chunked_in_read

        vals = [v for v in values if v is not None]
        if not vals:
            return self.postings.read().limit(0).select(
                self.col, *self.table.key_cols
            )
        df, _ = chunked_in_read(self.postings, self.col, vals, 10_000)
        return df.select(self.col, *self.table.key_cols)

    def lookup_df(self, values: list) -> DataFrame:
        """Rows of the BASE table whose indexed column is in
        ``values`` — the JOIN-based plan: postings never collect to
        the driver (the hot-value escape hatch for :meth:`lookup`).

        The base read still prunes: the postings' base-key BUCKET IDS
        (≤ ``n_buckets`` longs — bounded metadata regardless of
        posting count, the JoinView pattern) route a
        ``read_buckets`` subset, the pruned postings semi-join it on
        the key, and the final IN re-filter keeps the result exact
        against a base that moved past the last sync."""
        # bucket ids are computed OUTSIDE a read call, so follow the
        # committed modulus first (a stale instance straddling a base
        # rebucket would route to buckets the keys no longer live in)
        self.table.refresh_layout()
        posts = self.lookup_keys_in(values)
        keys = list(self.table.key_cols)
        bids = [
            r[0]
            for r in posts.select(
                self.table._bucket_col().alias("b")
            ).distinct().collect()
        ]
        vals = [v for v in values if v is not None]
        base = self.table.read_buckets(bids).join(
            posts.select(*keys).distinct(), keys, "leftsemi"
        )
        return base.filter(F.col(self.col).isin(vals))

    def lookup_join(self, values_df: DataFrame) -> DataFrame:
        """Rows of the BASE table whose indexed column appears in
        ``values_df`` (one column, same name as the indexed column) —
        the fully-relational probe for value sets too large to
        collect at all (a benchmark suite's term table, another
        table's key column).

        No driver round-trip touches the VALUES: the postings
        semi-join ``values_df`` directly (the posting relation is
        skinny — value + key — so this scan is index-sized, never
        base-sized). Only the matched postings' base-key bucket ids
        (≤ ``n_buckets`` longs) collect, routing the base read to a
        bucket subset; the final semi-join re-applies the value set
        exactly. NULLs never match (equi-join semantics = the
        NULL-not-indexed contract)."""
        self.table.refresh_layout()  # see lookup_df
        vals = values_df.select(F.col(self.col)).distinct()
        posts = self.postings.read().join(vals, self.col, "leftsemi")
        keys = list(self.table.key_cols)
        bids = [
            r[0]
            for r in posts.select(
                self.table._bucket_col().alias("b")
            ).distinct().collect()
        ]
        base = self.table.read_buckets(bids).join(
            posts.select(*keys).distinct(), keys, "leftsemi"
        )
        return base.join(vals, self.col, "leftsemi")

    def lookup(self, value) -> DataFrame:
        """Rows of the BASE table whose indexed column equals ``value``.

        Two pruned scans: the posting probe (bloom/zone-skipped), then
        ``read_keys`` on the collected posting list (key-routed bucket
        subset). The collect is bounded by the value's posting count —
        the selectivity contract of a secondary index; a HOT value
        with millions of postings should use :meth:`lookup_df`
        instead, which joins postings to the base without any
        driver-side posting collect. The final equality re-filter
        keeps the result exact against the CURRENT base even if it
        moved past the last sync (stale postings can only over-fetch,
        never corrupt)."""
        keys = [
            tuple(r) if len(self.table.key_cols) > 1 else r[0]
            for r in self.lookup_keys(value).collect()
        ]
        return self.table.read_keys(keys).filter(F.col(self.col) == F.lit(value))
