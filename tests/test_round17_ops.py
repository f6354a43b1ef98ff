"""Round-17 pins: MoR run row stats feeding the planner bound and the
index-routing gate, broadcast-semi-join reads for oversized IN value
sets, instance-scoped plan reports, the file-count compaction tier,
vacuum_orphans, and parallel deep fsck.

Same contract as prior rounds: every claimed plan property shows up in
a report or a hook without changing any result.
"""

from __future__ import annotations

import json
import os

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


class TestMorRunRowStats:
    def test_run_entries_carry_per_file_rows(self, spark, tmp_path):
        """VERDICT r16 #1: every MoR run commit records per-file
        ``__rows`` (footer-read at write time, no Spark job)."""
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i % 5, "c") for i in range(80)],
        )
        t.merge(
            spark.createDataFrame(
                [(200 + i, 7, "c") for i in range(12)],
                "k long, v long, op string",
            ),
            batch_id=1, mode="mor",
        )
        run = t._read_pointer()["runs"][0]
        assert run.get("fstats")
        total = sum(
            z["__rows"]
            for fmap in run["fstats"].values()
            for z in fmap.values()
        )
        assert total == 12

    def test_estimate_covers_pending_runs(self, spark, tmp_path):
        """A pending run no longer blinds the planner bound: the
        estimate stays an upper bound on the scheduled rows (pruned
        base + ALL run rows, since resolution scans runs in full)."""
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i % 5, "c") for i in range(80)],
            bloom_cols=["v"],
        )
        base_est = t.estimate_rows_where([("v", "=", 3)])
        t.merge(
            spark.createDataFrame(
                [(200 + i, 3, "c") for i in range(10)],
                "k long, v long, op string",
            ),
            batch_id=1, mode="mor",
        )
        est = t.estimate_rows_where([("v", "=", 3)])
        assert est is not None
        assert est == base_est + 10  # run rows ride the bound in full
        assert est >= t.read_where([("v", "=", 3)]).count()

    def test_pre_stats_run_reports_unknown(self, spark, tmp_path):
        """A run committed before run row stats existed (simulated by
        stripping the entry) keeps the honest None — unknown, never
        zero."""
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(20)],
        )
        t.merge(
            spark.createDataFrame(
                [(100, 1, "c")], "k long, v long, op string"
            ),
            batch_id=1, mode="mor",
        )
        ptr = t._read_pointer()
        for run in ptr["runs"]:
            run.pop("fstats", None)
        with open(t._pointer_path(), "w") as f:
            json.dump(ptr, f)
        assert t.estimate_rows_where([("v", "=", 1)]) is None

    def test_scan_report_prices_run_volume(self, spark, tmp_path):
        """read_where reports the run volume its resolve schedules,
        separately from base pruning (run_files/run_rows)."""
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(40)],
        )
        t.read_where([("v", "=", 1)]).collect()
        rep = t.last_scan_report
        assert rep["run_files"] == 0 and rep["run_rows"] == 0
        t.merge(
            spark.createDataFrame(
                [(100 + i, 1, "c") for i in range(6)],
                "k long, v long, op string",
            ),
            batch_id=1, mode="mor",
        )
        got = sorted(r.k for r in t.read_where([("v", "=", 1)]).collect())
        assert got == [1] + [100 + i for i in range(6)]
        rep = t.last_scan_report
        assert rep["run_files"] >= 1
        assert rep["run_rows"] == 6

    def test_compact_runs_folds_stats_too(self, spark, tmp_path):
        """The minor fold's single surviving run keeps per-file row
        stats, so the planner bound survives L0 compaction."""
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(20)],
        )
        for b in (1, 2):
            t.merge(
                spark.createDataFrame(
                    [(100 * b + i, i, "c") for i in range(4)],
                    "k long, v long, op string",
                ),
                batch_id=b, mode="mor",
            )
        assert t.compact_runs() == 2
        run = t._read_pointer()["runs"][0]
        assert run.get("fstats")
        assert t.estimate_rows_where([("v", "=", 1)]) is not None


class TestEstimateBisectsLargeIns:
    def test_large_in_estimate_stays_upper_bound(
        self, spark, tmp_path, monkeypatch
    ):
        """Past _ESTIMATE_IN_BISECT values the driver-only estimate
        swaps per-value zone tests for one bisect per zone bound — a
        looser test that can only RAISE the estimate, so the
        upper-bound contract survives while the estimate stays
        sub-millisecond instead of linear in the probe set."""
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, cluster_cols=["v"], max_records_per_file=16,
            bloom_cols=["v"],
        )
        t.overwrite(
            spark.createDataFrame(
                [(i, i) for i in range(200)], "k long, v long"
            ),
            batch_id=0,
        )
        monkeypatch.setattr(SnapshotTable, "_ESTIMATE_IN_BISECT", 4)
        vals = [3, 4, 5, 6, 7, 8]  # > patched threshold: bisect path
        est = t.estimate_rows_where([("v", "in", vals)])
        actual = t.read_where([("v", "in", vals)]).count()
        assert est is not None and est >= actual == 6
        assert est < 200  # the bisect still prunes


class TestIndexGateOnMorPostings:
    """VERDICT r16 item 1's done-criterion: the zero-job hot-value
    gate must keep working when the posting store has PENDING RUNS —
    the high-churn ``postings_mode='mor'`` maintenance path."""

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
        idx = SecondaryIndex(
            spark, t, "v", n_buckets=4, postings_mode="mor"
        )
        idx.sync()  # full bootstrap (overwrite)
        # an incremental sync so the postings genuinely carry a run
        t.merge(
            spark.createDataFrame(
                [(900, 1, "c")], "k long, v long, op string"
            ),
            batch_id=1,
        )
        idx.sync()
        assert idx.postings._read_pointer().get("runs"), "no pending run"
        t.attach_index(idx)
        return t, idx

    def test_hot_value_bails_with_zero_posting_jobs(self, spark, tmp_path):
        t, idx = self._mk_indexed(spark, tmp_path)
        t._INDEX_ROUTE_MAX_KEYS = 10  # every value is "hot"

        def boom(*a, **k):
            raise AssertionError("posting scan ran for a hot value")

        idx.lookup_keys_in = boom
        got = sorted(r.k for r in t.read_where([("v", "=", 1)]).collect())
        assert got == sorted([i for i in range(400) if i % 4 == 1] + [900])

    def test_cold_value_still_routes_with_runs_pending(
        self, spark, tmp_path
    ):
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


class TestLargeInSemiJoin:
    def test_threshold_routes_to_semi_join_no_literal_in(
        self, spark, tmp_path
    ):
        """VERDICT r16 #2: past semi_threshold the plan must carry a
        broadcast LeftSemi join and NO literal IN over the values."""
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i % 10, "c") for i in range(100)],
        )
        vals = list(range(0, 2000))  # mostly absent, > threshold
        df, rep = chunked_in_read(t, "v", vals, 100, semi_threshold=500)
        assert rep.get("semi_join") is True
        assert rep.get("degraded_single_pass") is True
        assert rep["chunks"] == 1
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan
        assert " IN (" not in plan  # no literal value list anywhere
        got = sorted(r.k for r in df.collect())
        assert got == list(range(100))

    def test_read_where_routes_oversized_in(
        self, spark, tmp_path, monkeypatch
    ):
        """A DIRECT read_where with an oversized literal IN takes the
        semi route too — no caller has to know about chunked_in_read
        to dodge the linear driver planning cost (and the index
        route's per-value posting estimate never sees a huge list)."""
        from changedatacapture_spark.streaming import sink as sink_mod

        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i % 10, "c") for i in range(100)],
        )
        monkeypatch.setattr(sink_mod, "SEMI_JOIN_IN_THRESHOLD", 50)
        df = t.read_where([("v", "in", list(range(200))), ("k", "<", 30)])
        assert t.last_scan_report.get("semi_join") is True
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan and " IN (" not in plan
        assert sorted(r.k for r in df.collect()) == list(range(30))

    def test_semi_path_hash_equals_literal_path(self, spark, tmp_path):
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i % 7, "c") for i in range(70)],
            bloom_cols=["v"],
        )
        vals = [1, 3, 5, 99]
        semi = t.read_in_values("v", vals)
        lit = t.read_where([("v", "in", vals)])
        assert sorted((r.k, r.v) for r in semi.collect()) == sorted(
            (r.k, r.v) for r in lit.collect()
        )

    def test_value_range_pruning_still_engages(self, spark, tmp_path):
        """The semi path keeps file skipping: one sorted-values bisect
        per zone bound replaces per-value bloom probes — a clustered
        table still scans a file subset for a narrow probe set."""
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, cluster_cols=["v"], max_records_per_file=16,
        )
        t.overwrite(
            spark.createDataFrame(
                [(i, i) for i in range(200)], "k long, v long"
            ),
            batch_id=0,
        )
        df = t.read_in_values("v", [3, 4, 5])
        rep = t.last_scan_report
        assert rep["semi_join"] is True
        assert rep["files_kept"] < rep["files_total"], rep
        assert sorted(r.k for r in df.collect()) == [3, 4, 5]
        # all values outside every zone: nothing scheduled
        df = t.read_in_values("v", [10_000, 10_001])
        assert t.last_scan_report["files_kept"] == 0
        assert df.count() == 0

    def test_extra_preds_apply_and_prune(self, spark, tmp_path):
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, cluster_cols=["ts"], max_records_per_file=16,
        )
        t.overwrite(
            spark.createDataFrame(
                [(i, i % 10, i) for i in range(100)],
                "k long, v long, ts long",
            ),
            batch_id=0,
        )
        df = t.read_in_values("v", [2, 4], extra_preds=[("ts", "<", 50)])
        got = sorted(r.k for r in df.collect())
        assert got == [i for i in range(50) if i % 10 in (2, 4)]
        rep = t.last_scan_report
        assert rep["files_kept"] < rep["files_total"], rep

    def test_guard_tombstones_stay_invisible(self, spark, tmp_path):
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"], n_buckets=2
        )
        ddl = "k long, v long, ts long, seq long, op string"
        t.merge(
            spark.createDataFrame(
                [(i, i, 1, 1, "c") for i in range(10)], ddl
            ),
            batch_id=0, guard_cols=["ts", "seq"],
        )
        t.merge(
            spark.createDataFrame([(3, 3, 2, 2, "d")], ddl),
            batch_id=1, guard_cols=["ts", "seq"],
        )
        got = sorted(r.k for r in t.read_in_values("v", list(range(10))).collect())
        assert got == [i for i in range(10) if i != 3]

    def test_mor_runs_resolve_through_semi_path(self, spark, tmp_path):
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(20)],
        )
        t.merge(
            spark.createDataFrame(
                [(3, 300, "u"), (4, 4, "d")], "k long, v long, op string"
            ),
            batch_id=1, mode="mor",
        )
        got = {r.k: r.v for r in t.read_in_values("v", [3, 4, 300, 5]).collect()}
        assert got == {3: 300, 5: 5}  # update visible, delete masked


class TestInstanceScopedReports:
    def test_two_tables_keep_their_own_evidence(self, spark, tmp_path):
        """VERDICT r16 #3: plan evidence must not interleave across
        tables — each instance carries its own report."""
        a = _mk(
            spark, os.path.join(str(tmp_path), "a"),
            [(i, i, "c") for i in range(100)], n_buckets=2,
        )
        b = _mk(
            spark, os.path.join(str(tmp_path), "b"),
            [(i, i, "c") for i in range(100)], n_buckets=8,
        )
        a.read_where([("v", "=", 1)]).collect()
        b.read_where([("v", "=", 1)]).collect()
        assert a.last_scan_report["buckets_total"] == 2
        assert b.last_scan_report["buckets_total"] == 8

    def test_write_report_is_instance_scoped(self, spark, tmp_path):
        a = _mk(
            spark, os.path.join(str(tmp_path), "a"),
            [(i, i, "c") for i in range(50)], n_buckets=2,
        )
        b = _mk(
            spark, os.path.join(str(tmp_path), "b"),
            [(i, i, "c") for i in range(50)], n_buckets=2,
        )
        a.rebucket(4)  # map-only: repartitioned=False
        b.rebucket(3)  # non-multiple: shuffle path
        assert a.last_write_report == {"repartitioned": False}
        assert b.last_write_report == {"repartitioned": True}


class TestFileCountCompaction:
    def test_policy_trips_and_repacks(self, spark, tmp_path):
        """VERDICT r16 #4: fragmentation past max_files_per_bucket
        triggers a 'files' repack; contents unchanged."""
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, max_records_per_file=4,
        )
        t.merge(
            spark.createDataFrame(
                [(i, i, "c") for i in range(60)], "k long, v long, op string"
            ),
            batch_id=0,
        )
        before = sorted((r.k, r.v) for r in t.read().collect())
        assert t._max_files_per_bucket(t._read_pointer()) > 3
        t.max_records_per_file = None  # hand sizing back to the rewrite
        assert t.compact_by_size(max_files_per_bucket=3) == "files"
        assert t._max_files_per_bucket(t._read_pointer()) <= 3
        assert sorted((r.k, r.v) for r in t.read().collect()) == before
        # healthy table: policy is a no-op
        assert t.compact_by_size(max_files_per_bucket=3) == "none"

    def test_file_tier_folds_pending_runs_too(self, spark, tmp_path):
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, max_records_per_file=2,
        )
        t.merge(
            spark.createDataFrame(
                [(i, i, "c") for i in range(30)], "k long, v long, op string"
            ),
            batch_id=0,
        )
        t.merge(
            spark.createDataFrame(
                [(100, 1, "c")], "k long, v long, op string"
            ),
            batch_id=1, mode="mor",
        )
        t.max_records_per_file = None
        assert t.compact_by_size(max_files_per_bucket=2) == "files"
        ptr = t._read_pointer()
        assert not ptr.get("runs")  # major repack folded the run in
        got = sorted(r.k for r in t.read().collect())
        assert got == sorted(list(range(30)) + [100])

    def test_rebucket_then_policy_end_to_end(self, spark, tmp_path):
        """The round's lifecycle loop: map-only rebucket, deliberate
        fragmentation, MoR churn — one policy evaluation heals it all
        with the logical contents bit-identical."""
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"], n_buckets=4
        )
        t.merge(
            spark.createDataFrame(
                [(i, i, "c") for i in range(120)],
                "k long, v long, op string",
            ),
            batch_id=0,
        )
        t.rebucket(16)
        assert t.last_write_report == {"repartitioned": False}
        t.max_records_per_file = 2
        t.compact()  # fragment: churn stand-in
        t.max_records_per_file = None
        t.merge(
            spark.createDataFrame(
                [(5, 500, "u")], "k long, v long, op string"
            ),
            batch_id=1, mode="mor",
        )
        assert t.compact_by_size(max_files_per_bucket=2) == "files"
        assert t._max_files_per_bucket(t._read_pointer()) <= 2
        got = {r.k: r.v for r in t.read().collect()}
        assert got[5] == 500 and len(got) == 120


class TestVacuumOrphans:
    def _orphan(self, t):
        pv = t._new_data_version()
        os.makedirs(f"{t.path}/v={pv}/bucket=0", exist_ok=True)
        with open(f"{t.path}/v={pv}/bucket=0/part-x.parquet", "w"):
            pass
        return pv

    def test_crashed_orphan_removed_young_survives(self, spark, tmp_path):
        """VERDICT r16 #5's exact pin: fsck lists the crashed-write
        orphan, vacuum_orphans removes it (marker and all), the table
        reads hash-identical; an in-flight-young orphan survives."""
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(25)], n_buckets=2,
        )
        before = sorted((r.k, r.v) for r in t.read().collect())
        pv = self._orphan(t)
        assert pv in t.fsck()["orphans"]
        # young: the age guard protects a possibly in-flight writer
        assert t.vacuum_orphans(min_age_s=3600) == []
        assert os.path.isdir(f"{t.path}/v={pv}")
        # operator asserts nothing is in flight: reclaim now
        removed = t.vacuum_orphans(min_age_s=0.0)
        assert pv in removed
        assert not os.path.isdir(f"{t.path}/v={pv}")
        assert not os.path.exists(f"{t.path}/_staging/{pv}")
        assert sorted((r.k, r.v) for r in t.read().collect()) == before
        rep = t.fsck(deep=True)
        assert rep["ok"] is True and rep["orphans"] == []

    def test_referenced_versions_never_removed(self, spark, tmp_path):
        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, retain_history=1,
        )
        for b in (0, 1):
            t.merge(
                spark.createDataFrame(
                    [(i, i + b, "c") for i in range(10)],
                    "k long, v long, op string",
                ),
                batch_id=b,
            )
        assert t.vacuum_orphans(min_age_s=0.0) == []
        assert t.fsck()["ok"] is True
        # time travel across retained history still works
        assert t.read(at_version=0).count() == 10


class TestPointerCache:
    """At 100 TB the per-file-stats pointer is tens of MB; re-parsing
    it per operation is seconds of driver time per micro-batch. The
    identity-keyed cache must make repeat reads free WITHOUT ever
    serving a stale pointer across a commit."""

    def test_warm_reads_skip_the_parse(self, spark, tmp_path, monkeypatch):
        from changedatacapture_spark.streaming import sink as sink_mod

        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(10)],
        )
        t._read_pointer()
        calls = {"n": 0}
        real = sink_mod.json.load

        def counting(fp):
            calls["n"] += 1
            return real(fp)

        monkeypatch.setattr(sink_mod.json, "load", counting)
        for _ in range(5):
            assert t._read_pointer()["version"] == 0
        assert calls["n"] == 0  # identity unchanged: zero reparses

    def test_foreign_commit_invalidates(self, spark, tmp_path):
        """A second writer instance's commit must be visible to this
        instance's very next pointer read — the CAS checks depend on
        it (os.replace gives the file a new identity)."""
        path = os.path.join(str(tmp_path), "t")
        a = _mk(spark, path, [(i, i, "c") for i in range(10)])
        assert a.version == 0
        b = SnapshotTable(spark, path, ["k"], n_buckets=4)
        b.merge(
            spark.createDataFrame(
                [(99, 99, "c")], "k long, v long, op string"
            ),
            batch_id=1,
        )
        assert a.version == 1  # a's cache missed on the new identity
        assert 99 in {r.k for r in a.read().collect()}

    def test_doctored_rewrite_invalidates(self, spark, tmp_path):
        t = _mk(
            spark, os.path.join(str(tmp_path), "t"),
            [(i, i, "c") for i in range(10)],
        )
        ptr = dict(t._read_pointer())
        ptr["batch_id"] = 777
        with open(t._pointer_path(), "w") as f:
            json.dump(ptr, f)
        assert t.last_batch_id() == 777


class TestDeepFsckParallel:
    def test_many_files_and_sorted_mismatches(self, spark, tmp_path):
        """The pooled footer audit returns the same deterministic
        report the serial sweep did — multiple corruptions come back
        sorted by path, wholeness unchanged."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = SnapshotTable(
            spark, os.path.join(str(tmp_path), "t"), ["k"],
            n_buckets=2, stats_on_merge=True, max_records_per_file=3,
        )
        t.merge(
            spark.createDataFrame(
                [(i, i, "c") for i in range(60)], "k long, v long, op string"
            ),
            batch_id=0,
        )
        assert t.fsck(deep=True)["ok"] is True
        ptr = t._read_pointer()
        victims = []
        for b, v in list(ptr["buckets"].items()):
            fname = sorted(ptr["fstats"][b])[0]
            victims.append(f"v={v}/bucket={b}/{fname}")
            pq.write_table(
                pa.table({"k": [1], "v": [2]}), f"{t.path}/{victims[-1]}"
            )
        rep = t.fsck(deep=True)
        assert rep["ok"] is False
        got = [m["path"] for m in rep["row_mismatches"]]
        assert got == sorted(victims)
