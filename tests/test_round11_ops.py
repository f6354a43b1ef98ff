"""Round-11 operator tests: ADVICE fixes (late-event guard, empty-text
Jaccard parity, generic heavy-hitter key types) and the round's new
operator families."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_heavy_hitters_string_keys(spark):
    """ADVICE r10 (low): the key_col API is generic — a string key
    column must flow through the Misra-Gries candidate schema without
    int64 coercion."""
    from changedatacapture_spark.operators.stats import exact_heavy_hitters

    rows = [("hot",)] * 300 + [("warm",)] * 26 + [(f"k{i}",) for i in range(674)]
    df = spark.createDataFrame(rows, "name string")
    got = {
        r["key"]: r["n_rows"]
        for r in exact_heavy_hitters(
            df.repartition(7), "name", k=40, capacity=64
        ).collect()
    }
    assert got == {"hot": 300, "warm": 26}, got


def test_jaccard_prefix_join_drops_empty_docs(spark):
    """ADVICE r10 (low): documents with zero non-empty tokens must not
    appear in any pair (the oracle's brute-force WHERE would otherwise
    admit empty-vs-empty pairs and divide by zero)."""
    from changedatacapture_spark.operators.dedup import jaccard_prefix_join

    rows = [
        (0, "a b c"),
        (1, "a b c"),
        (2, ""),
        (3, "   "),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_prefix_join(df, t_pct=95).collect()
    }
    assert got == {(0, 1)}, got


def test_rate_limit_drops_late_window_events(spark):
    """ADVICE r10 (medium): an event for an already-flushed window must
    be DROPPED, not fold the open window back to the old one with
    counters reset (which emitted undercounted rows the downstream
    max-fold kept)."""
    import pandas as pd

    from changedatacapture_spark.streaming.stateful import _fold_rate

    class FakeState:
        def __init__(self):
            self.exists = False
            self.value = None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.exists = True
            self.value = v

    HOUR = 3_600_000_000
    state = FakeState()
    # batch 1: two events in window 0, three in window HOUR (flushes w0)
    b1 = pd.DataFrame({"ts_us": [10, 20, HOUR + 1, HOUR + 2, HOUR + 3]})
    out1 = next(_fold_rate((1,), iter([b1]), state, HOUR, cap=2))
    # batch 2: one LATE event for window 0, then one in-order for HOUR
    b2 = pd.DataFrame({"ts_us": [30, HOUR + 4]})
    out2 = next(_fold_rate((1,), iter([b2]), state, HOUR, cap=2))
    rows = pd.concat([out1, out2])
    final = (
        rows.groupby(["user_id", "window_start"])
        .agg({"n_seen": "max", "n_admitted": "max"})
        .reset_index()
    )
    got = {
        (int(r.window_start)): (int(r.n_seen), int(r.n_admitted))
        for r in final.itertuples()
    }
    # window 0 keeps its flushed counts (late 30 dropped); window HOUR
    # accumulates 3 + 1 = 4 seen, 2 admitted
    assert got == {0: (2, 2), HOUR: (4, 2)}, got
