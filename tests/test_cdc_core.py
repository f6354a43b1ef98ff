"""Unit tests for the core CDC operators.

Includes the reference's golden trace (docs/howitworks.txt): five
events on one key — the last-by-timestamp wins — plus the
delete/re-insert interleavings from docs/"SQLs For Test.txt" and
deterministic same-timestamp tie-breaks (SURVEY §7.6.1/3).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from changedatacapture_spark.operators import (
    apply_changes,
    compact_latest,
    derive_key,
    op_split,
    prune_columns,
    window_compact,
)


def _log(spark, rows):
    return spark.createDataFrame(
        [Row(seq=s, key_id=k, op=o, ts_ms=t, val=v) for (s, k, o, t, v) in rows],
        "seq long, key_id long, op string, ts_ms long, val string",
    )


def test_compact_latest_golden_trace(spark):
    # docs/howitworks.txt: u@10:05, d@10:10, c@10:20 on key 1 -> c wins.
    log = _log(
        spark,
        [
            (0, 1, "c", 1000, "a"),
            (1, 1, "u", 1005, "b"),
            (2, 1, "d", 1010, None),
            (3, 1, "c", 1020, "z"),
            (4, 2, "c", 1001, "x"),
        ],
    )
    out = compact_latest(log, ["key_id"], ["ts_ms", "seq"]).orderBy("key_id")
    rows = out.collect()
    assert [(r.key_id, r.op, r.val) for r in rows] == [(1, "c", "z"), (2, "c", "x")]


def test_compact_latest_tie_break_deterministic(spark):
    # Same ts_ms: higher seq (later offset) must win, every run.
    log = _log(spark, [(0, 1, "u", 1000, "first"), (1, 1, "u", 1000, "second")])
    for _ in range(3):
        out = compact_latest(log, ["key_id"], ["ts_ms", "seq"]).collect()
        assert out[0].val == "second"


def test_apply_changes_delete_wins(spark):
    log = _log(
        spark,
        [
            (0, 1, "c", 1000, "a"),
            (1, 1, "d", 1010, None),
            (2, 2, "c", 1000, "b"),
            (3, 2, "u", 1010, "b2"),
            (4, 3, "c", 1000, "c"),
            (5, 3, "d", 1005, None),
            (6, 3, "c", 1010, "c2"),  # delete-then-reinsert (SQLs For Test.txt)
        ],
    )
    out = apply_changes(log, ["key_id"], ["ts_ms", "seq"]).orderBy("key_id")
    rows = [(r.key_id, r.val) for r in out.collect()]
    assert rows == [(2, "b2"), (3, "c2")]


def test_op_split(spark):
    log = _log(
        spark,
        [(0, 1, "c", 1, "a"), (1, 1, "u", 2, "b"), (2, 1, "u", 3, "c"), (3, 2, "d", 4, None)],
    )
    counts = {r.op: r.n_events for r in op_split(log).collect()}
    assert counts == {"c": 1, "u": 2, "d": 1}


def test_derive_key(spark):
    df = spark.createDataFrame(
        [("d", 1, None), ("u", 1, 2), ("c", None, 3), ("u", 4, None)],
        "op string, before_k long, after_k long",
    )
    out = df.select(
        derive_key(F.col("op"), F.col("before_k"), F.col("after_k")).alias("k")
    ).collect()
    assert [r.k for r in out] == [1, 2, 3, 4]


def test_prune_columns_keeps_key(spark):
    df = spark.createDataFrame([(1, "a", "b", "c")], "k long, x string, y string, z string")
    out = prune_columns(df, ["y"], key_col="k")
    assert out.columns == ["k", "y"]


def test_window_compact(spark):
    log = spark.createDataFrame(
        [
            (0, 1, "c", "2024-01-01 00:00:10", "a"),
            (1, 1, "u", "2024-01-01 00:00:50", "b"),
            (2, 1, "u", "2024-01-01 00:01:10", "c"),
        ],
        "seq long, key_id long, op string, ts string, val string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = window_compact(
        log, ["key_id"], ["ts", "seq"], event_time_col="ts", window_duration="1 minute"
    ).orderBy("window_start")
    rows = out.collect()
    assert [r.val for r in rows] == ["b", "c"]
    assert rows[0].window_start.minute == 0 and rows[1].window_start.minute == 1


def test_compact_is_partial_aggregation(spark):
    """The core operator must plan as hash-aggregate (map-side partial),
    not a window sort — the 100 TB shape requirement."""
    log = _log(spark, [(0, 1, "c", 1000, "a")])
    plan = compact_latest(log, ["key_id"], ["ts_ms", "seq"])._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan
    assert "Window" not in plan


def test_sqls_for_test_full_sequence_all_apply_paths(spark, tmp_path):
    """Replay the reference's full manual test script
    (docs/"SQLs For Test.txt": inserts, deletes of live AND nonexistent
    keys, update-after-delete, re-insert-after-delete) through three
    apply paths — global apply_changes, batch-split snapshot merges,
    and out-of-order guarded merges — all must land on the same state."""
    from changedatacapture_spark.streaming.sink import SnapshotTable

    script = [
        ("u", 18000, "Marry"),
        ("c", 23000, "John"), ("c", 22000, "John"),
        ("c", 24000, "John"), ("c", 25000, "John"),
        ("c", 26000, "John"), ("c", 27000, "John"),
        ("d", 25000, None), ("d", 24000, None), ("d", 23000, None),
        ("d", 22000, None), ("d", 26000, None), ("d", 23405, None),
        ("u", 23000, "Marry"),          # update after delete -> upsert
        ("c", 25000, "John"), ("c", 24000, "John"),
        ("u", 24000, "Marry"),
        ("d", 25000, None),
        ("c", 24000, "John"),           # re-insert over live key
        ("c", 27000, "John"),
    ]
    rows = [
        (i, k, op, 1_000 + i, v) for i, (op, k, v) in enumerate(script)
    ]
    log = _log(spark, rows)
    expected = {
        (18000, "Marry"), (23000, "Marry"), (24000, "John"), (27000, "John")
    }

    got_apply = {
        (r.key_id, r.val)
        for r in apply_changes(log, ["key_id"], ["ts_ms", "seq"]).collect()
    }
    assert got_apply == expected

    t1 = SnapshotTable(spark, str(tmp_path / "t1"), ["key_id"], n_buckets=4)
    for lo, hi, bid in ((0, 7, 0), (7, 14, 1), (14, len(script), 2)):
        batch = log.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        t1.merge(
            compact_latest(batch, ["key_id"], ["ts_ms", "seq"]), batch_id=bid
        )
    got_merge = {(r.key_id, r.val) for r in t1.read().collect()}
    assert got_merge == expected

    t2 = SnapshotTable(spark, str(tmp_path / "t2"), ["key_id"], n_buckets=4)
    for bid, (lo, hi) in enumerate(((14, len(script)), (0, 7), (7, 14))):
        batch = log.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        t2.merge(
            compact_latest(batch, ["key_id"], ["ts_ms", "seq"]),
            batch_id=bid,
            guard_cols=["ts_ms", "seq"],
        )
    got_guarded = {
        (r.key_id, r.val) for r in t2.read().collect()
    }
    assert got_guarded == expected


# ---------------------------------------------------------------------------
# round-6 additions: SCD2 history + incremental aggregate maintenance
# ---------------------------------------------------------------------------


def _scd_log(spark):
    # key 1: insert @10, update @20, delete @30 → two closed versions
    # key 2: insert @15 → one open version
    # key 3: delete @5 of a row never seen → nothing
    rows = [
        (1, 1, "c", 10, 100.0),
        (2, 1, "u", 20, 110.0),
        (3, 1, "d", 30, 110.0),
        (4, 2, "c", 15, 200.0),
        (5, 3, "d", 5, 0.0),
    ]
    return spark.createDataFrame(
        rows, "seq long, key_id long, op string, ts_us long, value double"
    )


def test_scd2_history_intervals(spark):
    from changedatacapture_spark.operators.cdc import scd2_history

    out = scd2_history(
        _scd_log(spark), ["key_id"], ["ts_us", "seq"], payload_cols=["value"]
    )
    got = {
        (r.key_id, r.valid_from): (r.valid_to, r.is_current, r.value)
        for r in out.collect()
    }
    assert got == {
        (1, 10): (20, 0, 100.0),   # closed by the update
        (1, 20): (30, 0, 110.0),   # closed by the delete, no current row
        (2, 15): (None, 1, 200.0), # still open
    }


def test_scd2_history_single_shuffle(spark, sf_dir):
    from changedatacapture_spark.operators.cdc import scd2_history
    from changedatacapture_spark.plans.inspect import count_exchanges
    from changedatacapture_spark.queries import _changelog_us

    out = scd2_history(
        _changelog_us(spark, sf_dir), ["key_id"], ["ts_us", "seq"],
        payload_cols=["value", "props"],
    )
    out.collect()
    assert count_exchanges(out) == 1


def test_incremental_agg_matches_recompute(spark):
    from pyspark.sql import functions as F

    from changedatacapture_spark.operators.cdc import (
        aggregate_delta,
        compact_latest,
        merge_agg_state,
    )

    # batch 1: insert keys 1..4; batch 2: update 1, delete 2, insert 5
    b1 = spark.createDataFrame(
        [(1, 1, "c", 10.0), (2, 2, "c", 20.0), (3, 3, "c", 30.0), (4, 4, "c", 40.0)],
        "seq long, key_id long, op string, value double",
    )
    b2 = spark.createDataFrame(
        [(5, 1, "u", 15.0), (6, 2, "d", 0.0), (7, 5, "c", 50.0)],
        "seq long, key_id long, op string, value double",
    )
    grp = F.pmod(F.col("key_id"), F.lit(2)).cast("long")

    snapshot = None
    state = None
    for b in (b1, b2):
        batch = compact_latest(b, ["key_id"], ["seq"])
        prev = (
            snapshot
            if snapshot is not None
            else batch.filter(F.lit(False)).select("key_id", "value")
        )
        delta = aggregate_delta(prev, batch, ["key_id"], grp, "value")
        if state is None:
            state = delta.select(
                "grp", F.col("d_count").alias("cnt"), F.col("d_sum").alias("total")
            ).filter(F.col("cnt") > 0)
        else:
            state = merge_agg_state(state, delta)
        live = batch.filter(F.col("op") != "d").select("key_id", "value")
        snapshot = (
            live
            if snapshot is None
            else snapshot.join(batch.select("key_id"), "key_id", "left_anti")
            .unionByName(live)
        )

    got = {r.grp: (r.cnt, r.total) for r in state.collect()}
    # final snapshot: {1: 15, 3: 30, 4: 40, 5: 50}
    # grp 0 (even keys): {4: 40} ; grp 1 (odd): {1:15, 3:30, 5:50}
    assert got == {0: (1, 40.0), 1: (3, 95.0)}
    # and it equals a from-scratch recompute of the same aggregate
    recompute = {
        r.grp: (r.cnt, r.total)
        for r in snapshot.groupBy(grp.alias("grp"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == recompute


def test_incremental_agg_delete_only_batch(spark):
    from pyspark.sql import functions as F

    from changedatacapture_spark.operators.cdc import aggregate_delta, merge_agg_state

    snapshot = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "key_id long, value double"
    )
    state = spark.createDataFrame([(0, 1, 20.0), (1, 1, 10.0)], "grp long, cnt long, total double")
    batch = spark.createDataFrame(
        [(9, 1, "d", 0.0)], "seq long, key_id long, op string, value double"
    )
    grp = F.pmod(F.col("key_id"), F.lit(2)).cast("long")
    delta = aggregate_delta(snapshot, batch, ["key_id"], grp, "value")
    out = {r.grp: (r.cnt, r.total) for r in merge_agg_state(state, delta).collect()}
    # key 1 (grp 1) fully retracted → the group disappears
    assert out == {0: (1, 20.0)}
