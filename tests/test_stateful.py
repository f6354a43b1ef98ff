"""applyInPandasWithState sessionization: state persists across
micro-batches, closes on gap, survives per-key sharding."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import StructType


_MTIME = [1_000_000]


def _write_batch(src: str, name: str, rows: list[tuple[int, int]]) -> None:
    os.makedirs(src, exist_ok=True)
    path = f"{src}/{name}.jsonl"
    with open(path, "w") as f:
        for uid, ts_us in rows:
            f.write(json.dumps({"user_id": uid, "ts_us": ts_us}) + "\n")
    # the file source orders micro-batches by modification time; files
    # written in the same millisecond would replay in arbitrary order
    _MTIME[0] += 10
    os.utime(path, (_MTIME[0], _MTIME[0]))


def _run_stream(spark, src: str, ckpt: str, out_table: str):
    from changedatacapture_spark.streaming.stateful import stateful_sessionize

    schema = StructType.fromDDL("user_id long, ts_us long")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    sessions = stateful_sessionize(stream, gap_seconds=10)
    q = (
        sessions.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sessions_close_on_gap_and_state_persists(spark, tmp_path):
    src = str(tmp_path / "src")
    us = 1_000_000
    # batch file a: user 1 events at t=0s,5s (one open session)
    _write_batch(src, "a", [(1, 0), (1, 5 * us)])
    # batch file b: t=30s — gap > 10s closes the first session
    _write_batch(src, "b", [(1, 30 * us), (2, 0)])
    _run_stream(spark, src, str(tmp_path / "ckpt"), "sess_out")
    rows = spark.sql("select * from sess_out").collect()

    closed = [r for r in rows if r.closed and r.user_id == 1]
    assert len(closed) == 1
    assert (closed[0].session_start, closed[0].session_end, closed[0].n_events) == (
        0,
        5 * us,
        2,
    )
    # the new open session for user 1 carries only the t=30s event:
    # state (session_start/last/n) persisted across the two batches
    open_u1 = [r for r in rows if not r.closed and r.user_id == 1]
    assert any(
        (r.session_start, r.n_events) == (30 * us, 1) for r in open_u1
    )
    open_u2 = [r for r in rows if not r.closed and r.user_id == 2]
    assert any((r.session_start, r.n_events) == (0, 1) for r in open_u2)


def test_single_batch_multiple_gaps(spark, tmp_path):
    src = str(tmp_path / "src")
    us = 1_000_000
    _write_batch(
        src, "a", [(7, 0), (7, 2 * us), (7, 20 * us), (7, 40 * us), (7, 41 * us)]
    )
    _run_stream(spark, src, str(tmp_path / "ckpt"), "sess_out2")
    rows = spark.sql("select * from sess_out2 where user_id = 7").collect()
    closed = sorted(
        [(r.session_start, r.session_end, r.n_events) for r in rows if r.closed]
    )
    assert closed == [(0, 2 * us, 2), (20 * us, 20 * us, 1)]
    opened = [(r.session_start, r.n_events) for r in rows if not r.closed]
    assert (40 * us, 2) in opened


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the fold."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_fold_sorts_across_arrow_chunks():
    """A key's batch arriving as multiple Arrow chunks must be sorted as
    ONE batch: per-chunk sorting lets `last` move backwards and closes
    phantom sessions at chunk boundaries."""
    import pandas as pd

    from changedatacapture_spark.streaming.stateful import _fold_session

    chunk1 = pd.DataFrame({"ts_us": [100, 200]})
    chunk2 = pd.DataFrame({"ts_us": [50, 150]})  # earlier events, later chunk
    state = _FakeState()
    (out,) = list(
        _fold_session((7,), iter([chunk1, chunk2]), state, gap_us=60)
    )
    closed = out[out["closed"]]
    assert closed.empty  # gaps are all 50 < 60 once globally sorted
    open_s = out[~out["closed"]].iloc[0]
    assert (open_s.session_start, open_s.session_end, open_s.n_events) == (
        50,
        200,
        4,
    )
    assert state.get == (50, 200, 4)


# ------------------------------------------------------- rate limiter


def _run_rate_stream(spark, src, ckpt, out_table, window_seconds=100, cap=2):
    from changedatacapture_spark.streaming.stateful import stateful_rate_limit

    schema = StructType.fromDDL("user_id long, ts_us long")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        stateful_rate_limit(stream, window_seconds=window_seconds, cap=cap)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import functions as F

    return {
        (r["user_id"], r["window_start"]): (
            r["n_seen"], r["n_admitted"], r["last_admitted_ts"]
        )
        for r in spark.table(out_table)
        .groupBy("user_id", "window_start")
        .agg(
            F.max("n_seen").alias("n_seen"),
            F.max("n_admitted").alias("n_admitted"),
            F.max("last_admitted_ts").alias("last_admitted_ts"),
        )
        .collect()
    }


def test_rate_limit_invariant_to_batch_cuts(spark, tmp_path):
    """The same events split at different micro-batch boundaries must
    fold to identical (user, window) rows — the batching-invariance
    contract. Window 100s, cap 2; user 1 sends 4 events in window 0
    and 1 in window 1."""
    us = 1_000_000
    events = [(1, 5 * us), (1, 10 * us), (1, 20 * us), (1, 30 * us),
              (1, 150 * us), (2, 12 * us)]
    expect = {
        (1, 0): (4, 2, 10 * us),
        (1, 100 * us): (1, 1, 150 * us),
        (2, 0): (1, 1, 12 * us),
    }
    for cut in (1, 3, 5):
        src = str(tmp_path / f"src{cut}")
        _write_batch(src, "b1", events[:cut])
        _write_batch(src, "b2", events[cut:])
        got = _run_rate_stream(
            spark, src, str(tmp_path / f"ck{cut}"), f"rate_cut_{cut}"
        )
        assert got == expect, (cut, got)


def test_rate_limit_tied_timestamps_admit_by_value(spark, tmp_path):
    """With cap 2 and three equal timestamps, the emitted
    last_admitted_ts is the 2nd-smallest VALUE — deterministic no
    matter which of the tied events 'wins' admission."""
    us = 1_000_000
    src = str(tmp_path / "src_tie")
    _write_batch(src, "b1", [(7, 4 * us), (7, 4 * us), (7, 4 * us)])
    got = _run_rate_stream(spark, src, str(tmp_path / "ck_tie"), "rate_tie")
    assert got == {(7, 0): (3, 2, 4 * us)}
