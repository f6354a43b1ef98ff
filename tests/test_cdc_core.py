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
