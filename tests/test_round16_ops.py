"""Round-16 pins: chunked-probe hardening (duplicate values, the
accumulated adaptive bail), zero-job stats gating for index-routed
reads, attach_index table/column validation, per-file row counts in
the scan report, byte-targeted file sizing, and rebucket pruning.

Same contract as the JoinView/round-15 pins: every claimed pruning or
bail shows up in the manifest scan report without changing any result.
"""

from __future__ import annotations

import os

import pytest

from changedatacapture_spark.streaming.index import SecondaryIndex
from changedatacapture_spark.streaming.sink import (
    SnapshotTable,
    chunked_in_read,
)


def _mk(spark, path, rows, n_buckets=4, **kw):
    t = SnapshotTable(spark, path, ["k"], n_buckets=n_buckets, **kw)
    t.merge(
        spark.createDataFrame(rows, "k long, v long, op string"),
        batch_id=0,
    )
    return t


class TestChunkedInReadHardening:
    def test_duplicate_values_across_chunks_stay_exact(
        self, spark, tmp_path
    ):
        """Caller-supplied duplicates landing in DIFFERENT chunks used
        to re-match the same rows in two chunk probes and duplicate
        the union (ADVICE r15). Dedup at entry makes the result exact
        whatever the caller sends."""
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i % 5, "c") for i in range(40)],
        )
        # 3 in chunk 0 and again in chunk 1; 2 duplicated inside one
        vals = [3, 2, 2, 3, 4]
        df, rep = chunked_in_read(t, "v", vals, 2)
        got = sorted(r.k for r in df.collect())
        assert got == sorted(i for i in range(40) if i % 5 in (2, 3, 4))
        assert len(got) == len(set(got))

    def test_composite_key_history_dedups_first_components(
        self, spark, tmp_path
    ):
        """The reachable path ADVICE named: a composite-keyed
        SCD2View.history(keys=...) forwards the keys' FIRST components
        to chunked_in_read — shared first components past max_inlist
        must not duplicate closed rows."""
        from changedatacapture_spark.streaming.history import SCD2View

        open_t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "open"), ["k"], n_buckets=4
        )
        closed_t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "closed"),
            ["k", "valid_from", "seq"], n_buckets=4,
        )
        v = SCD2View(spark, open_t, closed_t, ["k"], ["ts", "seq"], ["p"])
        ddl = "k long, ts long, seq long, op string, p double"
        v.apply(
            spark.createDataFrame(
                [(k, 10, k, "c", float(k)) for k in range(8)], ddl
            ),
            batch_id=0,
        )
        v.apply(
            spark.createDataFrame(
                [(k, 20, 100 + k, "u", k + 0.5) for k in range(8)], ddl
            ),
            batch_id=1,
        )
        v.max_inlist = 2  # force multiple chunks
        # every key twice in the probe list → first components repeat
        keys = [k for k in range(8)] * 2
        hist = v.history(keys=keys).collect()
        # exactly one closed + one open version per key — no dupes
        assert len(hist) == 16
        per_key = {}
        for r in hist:
            per_key.setdefault(r.k, []).append(r.is_current)
        assert all(sorted(f) == [0, 1] for f in per_key.values())

    def test_accumulated_bail_caps_unselective_tails(
        self, spark, tmp_path
    ):
        """A first chunk that prunes does NOT license unbounded
        re-scanning by later chunks (ADVICE r15): once the RUNNING
        kept sum reaches one full pass with chunks remaining, the
        helper degrades to a single full-list probe. Chunk plans are
        lazy, so executed volume is that one pass."""
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(100)],
            n_buckets=4, bloom_cols=["v"],
        )
        # 8 single-value chunks over a 4-file table: each chunk keeps
        # >=1 file (the value IS present — blooms have no false
        # negatives), so the running sum crosses 4 kept files with
        # chunks remaining and the helper must bail.
        df, rep = chunked_in_read(t, "v", list(range(1, 9)), 1)
        assert rep.get("degraded_single_pass") is True
        assert rep["chunks"] == 1
        assert sorted(r.k for r in df.collect()) == list(range(1, 9))

    def test_report_carries_row_counts(self, spark, tmp_path):
        """Scan reports now measure rows, not just files — packing
        regressions read straight off the report (VERDICT r15 #3/#6)."""

        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(100)],
            n_buckets=4, bloom_cols=["v"],
        )
        t.read_where([("v", "=", 7)]).collect()
        rep = t.last_scan_report
        assert rep["rows_total"] == 100
        assert rep["rows_kept"] is not None
        assert rep["rows_kept"] <= rep["rows_total"]
        # pruning must show in rows too: one value's bucket subset
        assert rep["rows_kept"] < rep["rows_total"]


class TestEstimateRowsWhere:
    def test_upper_bounds_actual_matches_with_zero_jobs(
        self, spark, tmp_path
    ):
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i % 10, "c") for i in range(200)],
            n_buckets=8, bloom_cols=["v"],
        )
        est = t.estimate_rows_where([("v", "=", 3)])
        actual = t.read_where([("v", "=", 3)]).count()
        assert est is not None
        assert est >= actual
        assert est < 200  # the bound prunes: not the whole table

    def test_unknown_when_row_stats_absent(self, spark, tmp_path):
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(20)],
            n_buckets=2, collect_stats=False,
        )
        assert t.estimate_rows_where([("v", "=", 1)]) is None


class TestIndexRoutingStatsGate:
    def _mk_indexed(self, spark, tmp_path, n=400):
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "base"), ["k"], n_buckets=4
        )
        t.merge(
            spark.createDataFrame(
                [(i, i % 4, "c") for i in range(n)],
                "k long, v long, op string",
            ),
            batch_id=0,
        )
        idx = SecondaryIndex(spark, t, "v", n_buckets=4)
        idx.sync()
        t.attach_index(idx)
        return t, idx

    def test_hot_value_bails_with_zero_posting_jobs(self, spark, tmp_path):
        """VERDICT r16 item 3: a hot-value read_where must decline the
        index route from manifest stats alone — no posting scan, no
        100k-row collect — and the stats path answers exactly."""
        t, idx = self._mk_indexed(spark, tmp_path)
        t._INDEX_ROUTE_MAX_KEYS = 10  # every value is "hot" (100 postings)

        def boom(*a, **k):  # any posting probe is the regression
            raise AssertionError("posting scan ran for a hot value")

        idx.lookup_keys_in = boom
        got = sorted(r.k for r in t.read_where([("v", "=", 1)]).collect())
        assert got == sorted(i for i in range(400) if i % 4 == 1)

    def test_cold_value_still_routes(self, spark, tmp_path):
        t, idx = self._mk_indexed(spark, tmp_path)
        called = {}
        orig = idx.lookup_keys_in

        def spy(values):
            called["yes"] = True
            return orig(values)

        idx.lookup_keys_in = spy
        got = sorted(r.k for r in t.read_where([("v", "=", 2)]).collect())
        assert got == sorted(i for i in range(400) if i % 4 == 2)
        assert called.get("yes") is True

    def test_attach_rejects_foreign_table(self, spark, tmp_path):
        """ADVICE r15: a mis-attached index from ANOTHER table whose
        version number coincides would silently drop rows; attach must
        refuse it up front."""
        t, idx = self._mk_indexed(spark, tmp_path)
        other = SnapshotTable(
            spark, os.path.join(str(tmp_path), "other"), ["k"], n_buckets=2
        )
        other.merge(
            spark.createDataFrame(
                [(1, 5, "c")], "k long, v long, op string"
            ),
            batch_id=0,
        )
        with pytest.raises(ValueError, match="different table"):
            other.attach_index(idx)

    def test_attach_rejects_missing_column(self, spark, tmp_path):
        t, idx = self._mk_indexed(spark, tmp_path)
        idx2 = SecondaryIndex(spark, t, "v", n_buckets=2)
        idx2.col = "no_such_col"  # simulate a stale/mistyped config
        with pytest.raises(ValueError, match="not a column"):
            t.attach_index(idx2)


class TestByteTargetedSizing:
    def test_writes_land_in_the_byte_band(self, spark, tmp_path):
        """VERDICT r16 item 4: with target_file_bytes set and no row
        cap, the SECOND write on derives rows-per-file from measured
        bytes/row and splits files near the target (wide tolerance —
        parquet footers dominate at toy scale)."""
        target = 16 << 10
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, cluster_cols=["ts"],
            target_file_bytes=target, stats_on_merge=True,
        )
        ddl = "k long, ts long, payload string, op string"

        def batch(b):
            return spark.createDataFrame(
                [(i, b * 10_000 + i, "x" * 64, "c")
                 for i in range(b * 20_000, b * 20_000 + 20_000)],
                ddl,
            )

        t.merge(batch(0), batch_id=0)  # first write: no measurement yet
        assert t._derived_records_per_file() is not None
        t.overwrite(
            t.read().unionByName(batch(1).drop("op")), batch_id=1
        )
        pv = max(
            int(d.split("=")[1])
            for d in os.listdir(t.path)
            if d.startswith("v=")
        )
        sizes = [
            e.stat().st_size
            for b in os.listdir(f"{t.path}/v={pv}")
            if b.startswith("bucket=")
            for e in os.scandir(f"{t.path}/v={pv}/{b}")
            if e.name.endswith(".parquet")
        ]
        assert len(sizes) > 2  # the cap split buckets into bands
        # every file within a wide band of the target: the derivation
        # used measured bytes/row, so order-of-magnitude is guaranteed
        assert max(sizes) < 4 * target
        assert t.read().count() == 40_000

    def test_explicit_row_cap_still_wins(self, spark, tmp_path):
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, max_records_per_file=7,
            target_file_bytes=1 << 30,
        )
        t.merge(
            spark.createDataFrame(
                [(i, "c") for i in range(40)], "k long, op string"
            ),
            batch_id=0,
        )
        t.overwrite(t.read(), batch_id=1)
        pv = max(
            int(d.split("=")[1])
            for d in os.listdir(t.path)
            if d.startswith("v=")
        )
        counts = [
            len([e for e in os.scandir(f"{t.path}/v={pv}/{b}")
                 if e.name.endswith(".parquet")])
            for b in os.listdir(f"{t.path}/v={pv}")
            if b.startswith("bucket=")
        ]
        assert all(c >= 2 for c in counts)  # 20 rows / 7-cap → ≥3 files


class TestStaleWriterAcrossRebucket:
    """A LONG-LIVED writer instance that straddles another writer's
    rebucket must re-adopt the committed modulus when it plans — a
    stale modulus routes keys into buckets the incumbents no longer
    live in, the anti-join never sees them, and the key exists twice
    (plus the commit would persist the stale count). Found round 16:
    only the MoR path had a (commit-time) guard."""

    def _two_writers(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "t")
        t1 = SnapshotTable(spark, path, ["k"], n_buckets=4)
        t1.merge(
            spark.createDataFrame(
                [(k, k, "c") for k in range(40)],
                "k long, v long, op string",
            ),
            batch_id=0,
        )
        t2 = SnapshotTable(spark, path, ["k"], n_buckets=4)
        t2.rebucket(16)
        return t1, t2

    def test_cow_merge_adopts_new_modulus(self, spark, tmp_path):
        t1, _ = self._two_writers(spark, tmp_path)
        assert t1.n_buckets == 4  # stale by construction
        t1.merge(
            spark.createDataFrame(
                [(k, k + 1000, "u") for k in range(0, 40, 5)],
                "k long, v long, op string",
            ),
            batch_id=1,
        )
        assert t1.n_buckets == 16  # adopted while planning
        got = sorted((r.k, r.v) for r in t1.read().collect())
        want = sorted(
            (k, k + 1000 if k % 5 == 0 else k) for k in range(40)
        )
        assert got == want  # no duplicate keys, no stale rows
        assert int(t1._read_pointer()["n_buckets"]) == 16

    def test_guarded_merge_adopts_new_modulus(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "t")
        t1 = SnapshotTable(spark, path, ["k"], n_buckets=4)
        gb = lambda rows: spark.createDataFrame(  # noqa: E731
            rows, "k long, op string, ts long, v long"
        )
        t1.merge(gb([(k, "c", 100, k) for k in range(40)]),
                 guard_cols=["ts"], batch_id=0)
        SnapshotTable(spark, path, ["k"], n_buckets=4).rebucket(16)
        t1.merge(gb([(k, "u", 200, k + 1000) for k in range(0, 40, 5)]),
                 guard_cols=["ts"], batch_id=1)
        got = sorted((r.k, r.v) for r in t1.read().collect())
        want = sorted(
            (k, k + 1000 if k % 5 == 0 else k) for k in range(40)
        )
        assert got == want
        assert int(t1._read_pointer()["n_buckets"]) == 16

    def test_stale_reader_read_keys_finds_rows(self, spark, tmp_path):
        """The read-path twin: a stale reader's key routing must follow
        the committed modulus or point lookups silently miss rows."""
        t1, _ = self._two_writers(spark, tmp_path)
        got = sorted(r.k for r in t1.read_keys([3, 17, 29]).collect())
        assert got == [3, 17, 29]

    def test_stale_compact_preserves_committed_layout(
        self, spark, tmp_path
    ):
        """compact() from a stale instance must compact INTO the
        committed layout, not silently revert the rebucket."""
        t1, _ = self._two_writers(spark, tmp_path)
        t1.compact()
        assert int(t1._read_pointer()["n_buckets"]) == 16
        assert t1.read().count() == 40

    def test_mor_merge_adopts_new_modulus(self, spark, tmp_path):
        t1, _ = self._two_writers(spark, tmp_path)
        t1.merge(
            spark.createDataFrame(
                [(k, k + 1000, "u") for k in range(0, 40, 5)],
                "k long, v long, op string",
            ),
            batch_id=1,
            mode="mor",
        )
        got = sorted((r.k, r.v) for r in t1.read().collect())
        want = sorted(
            (k, k + 1000 if k % 5 == 0 else k) for k in range(40)
        )
        assert got == want


class TestIndexAcrossRebucket:
    def test_lookup_df_from_stale_table_instance(self, spark, tmp_path):
        """lookup_df derives base bucket ids OUTSIDE a read call; after
        a rebucket through ANOTHER instance + a sync, it must still
        find every row (refresh_layout before routing)."""
        path = os.path.join(str(tmp_path), "base")
        t = SnapshotTable(
            spark, path, ["k"], n_buckets=4, retain_history=2
        )
        t.merge(
            spark.createDataFrame(
                [(i, i % 10, "c") for i in range(100)],
                "k long, v long, op string",
            ),
            batch_id=0,
        )
        idx = SecondaryIndex(spark, t, "v", n_buckets=4)
        idx.sync()
        SnapshotTable(spark, path, ["k"], n_buckets=4).rebucket(16)
        idx.sync()  # catch up past the rebucket (empty logical diff)
        got = sorted(r.k for r in idx.lookup_df([3, 7]).collect())
        assert got == sorted(
            i for i in range(100) if i % 10 in (3, 7)
        )

    def test_stale_index_falls_back_then_syncs(self, spark, tmp_path):
        """A base rebucket bumps the table version, so the attached
        index goes stale: read_where must fall back to the stats path
        (exact results), and one sync() restores routing — across a
        bucket-count change, the CDF diff is empty, so the sync is a
        metadata-only catch-up."""
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "base"), ["k"],
            n_buckets=4, retain_history=2,
        )
        t.merge(
            spark.createDataFrame(
                [(i, i % 50, "c") for i in range(200)],
                "k long, v long, op string",
            ),
            batch_id=0,
        )
        idx = SecondaryIndex(spark, t, "v", n_buckets=4)
        idx.sync()
        t.attach_index(idx)
        t.rebucket(16)
        assert idx.indexed_version != t.version  # stale
        got = sorted(r.k for r in t.read_where([("v", "=", 7)]).collect())
        assert got == sorted(i for i in range(200) if i % 50 == 7)
        rep = idx.sync()
        assert rep["mode"] == "incremental"
        assert idx.indexed_version == t.version
        got2 = sorted(r.k for r in t.read_where([("v", "=", 7)]).collect())
        assert got2 == got


class TestMapOnlyRebucketSplit:
    def _seed(self, spark, tmp_path, n_buckets=4):
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=n_buckets, bloom_cols=["v"],
        )
        t.merge(
            spark.createDataFrame(
                [(i, i, "c") for i in range(300)],
                "k long, v long, op string",
            ),
            batch_id=0,
        )
        return t

    def test_multiple_target_splits_without_shuffle(
        self, spark, tmp_path
    ):
        """4 -> 16 is an integer multiple on a pure-CoW table: the
        rewrite must stream map-side (hash % 16 of a bucket-b row is
        b, b+4, b+8, or b+12 — children only), recorded as
        repartitioned=False; results and key routing stay exact."""

        t = self._seed(spark, tmp_path)
        before = sorted((r.k, r.v) for r in t.read().collect())
        t.rebucket(16)
        assert t.last_write_report == {"repartitioned": False}
        assert sorted((r.k, r.v) for r in t.read().collect()) == before
        t.read_keys([7, 123]).collect()
        rep = t.last_scan_report
        assert rep["buckets_total"] == 16
        assert rep["buckets_kept"] <= 2
        # children-only: every physical dir id is a valid new bucket
        manifest = t._bucket_manifest()
        assert set(manifest) <= set(range(16))

    def test_non_multiple_target_takes_the_shuffle_path(
        self, spark, tmp_path
    ):

        t = self._seed(spark, tmp_path)
        before = sorted((r.k, r.v) for r in t.read().collect())
        t.rebucket(6)
        assert t.last_write_report == {"repartitioned": True}
        assert sorted((r.k, r.v) for r in t.read().collect()) == before
        got = sorted(r.k for r in t.read_keys([42]).collect())
        assert got == [42]

    def test_mor_runs_take_the_shuffle_path(self, spark, tmp_path):
        t = self._seed(spark, tmp_path)
        t.merge(
            spark.createDataFrame(
                [(5, 5000, "u")], "k long, v long, op string"
            ),
            batch_id=1,
            mode="mor",
        )

        t.rebucket(8)
        assert t.last_write_report == {"repartitioned": True}
        got = {r.k: r.v for r in t.read().collect()}
        assert got[5] == 5000 and len(got) == 300


class TestDeepFsck:
    def _table(self, spark, tmp_path):
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, stats_on_merge=True,
        )
        t.merge(
            spark.createDataFrame(
                [(i, i, "c") for i in range(50)],
                "k long, v long, op string",
            ),
            batch_id=0,
        )
        return t

    def test_healthy_table_passes(self, spark, tmp_path):
        rep = self._table(spark, tmp_path).fsck(deep=True)
        assert rep["ok"] is True
        assert rep["missing_files"] == []
        assert rep["row_mismatches"] == []

    def test_out_of_band_file_swap_is_detected(self, spark, tmp_path):
        """A file replaced out-of-band (restore from the wrong backup,
        manual 'fix') keeps its name but not its rows — every
        committed stat for it is suspect. Deep fsck must flag it; the
        shallow dir check cannot."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = self._table(spark, tmp_path)
        ptr = t._read_pointer()
        b, v = next(iter(ptr["buckets"].items()))
        fname = next(iter(ptr["fstats"][b]))
        victim = f"{t.path}/v={v}/bucket={b}/{fname}"
        pq.write_table(
            pa.table({"k": [1], "v": [2]}), victim
        )
        rep = t.fsck(deep=True)
        assert rep["ok"] is False
        assert len(rep["row_mismatches"]) == 1
        assert rep["row_mismatches"][0]["actual_rows"] == 1
        assert t.fsck()["ok"] is True  # shallow check is blind to it

    def test_deleted_file_is_detected(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        ptr = t._read_pointer()
        b, v = next(iter(ptr["buckets"].items()))
        fname = next(iter(ptr["fstats"][b]))
        os.remove(f"{t.path}/v={v}/bucket={b}/{fname}")
        rep = t.fsck(deep=True)
        assert rep["ok"] is False
        assert rep["missing_files"] == [f"v={v}/bucket={b}/{fname}"]


class TestRebucketKeepsPruning:
    def test_pruning_engages_at_the_new_bucket_count(
        self, spark, tmp_path
    ):
        """VERDICT r16 item 5: after an online rebucket, stats prune
        and key routing run against the NEW modulus — a grown table
        keeps its scan bounds."""

        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, bloom_cols=["v"],
        )
        t.merge(
            spark.createDataFrame(
                [(i, i, "c") for i in range(400)],
                "k long, v long, op string",
            ),
            batch_id=0,
        )
        t.rebucket(16)
        got = sorted(r.k for r in t.read_where([("v", "=", 37)]).collect())
        assert got == [37]
        rep = t.last_scan_report
        assert rep["buckets_total"] == 16
        assert rep["buckets_kept"] < rep["buckets_total"]
        t.read_keys([37]).collect()
        rep = t.last_scan_report
        assert rep["buckets_total"] == 16
        assert rep["buckets_kept"] == 1
