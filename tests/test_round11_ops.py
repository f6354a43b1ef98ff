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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (arbitrary-state API v2) port
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import tempfile as _tempfile
import uuid as _uuid

import pytest


def _tws_available(spark):
    from changedatacapture_spark.compat import has_tws_support

    return has_tws_support(spark)


def _write_batches(batches, name_prefix="b"):
    work = _tempfile.mkdtemp(prefix="tws_test_")
    src = _os.path.join(work, "src")
    _os.makedirs(src)
    for i, b in enumerate(batches):
        p = _os.path.join(src, f"{name_prefix}{i}.json")
        with open(p, "w") as f:
            for uid, ts in b:
                f.write(_json.dumps({"user_id": uid, "ts_us": ts}) + "\n")
        _os.utime(p, (1_000_000 + i * 10, 1_000_000 + i * 10))
    return work, src


def _run_stream(spark, df, work, fmt_sink=None):
    sink = fmt_sink or f"tws_t_{_uuid.uuid4().hex[:8]}"
    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", _os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    return spark.table(sink)


def test_tws_sessionize_parity_with_legacy(spark):
    """v2 (timers, ValueState) and legacy (applyInPandasWithState) must
    fold to IDENTICAL final sessions on the same time-ordered replay —
    the differential port check."""
    if not _tws_available(spark):
        pytest.skip("no protobuf runtime for the v2 state API")
    from changedatacapture_spark.streaming.stateful import stateful_sessionize
    from changedatacapture_spark.streaming.stateful_v2 import tws_sessionize

    DAY = 86_400_000_000
    BASE = 1_700_000_000_000_000  # 2023 epoch-us: clear of the initial watermark
    batches = [
        [(1, BASE), (1, BASE + 100), (2, BASE + 50)],
        [(2, BASE + DAY), (1, BASE + DAY + 7)],
        [(3, BASE + 2 * DAY)],
        [(1, BASE + 3 * DAY), (2, BASE + 3 * DAY + 5)],
    ]
    gap = 21600  # 6 h

    def fold(emitted):
        return sorted(
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in emitted.groupBy("user_id", "session_start")
            .agg(
                F.max("session_end").alias("session_end"),
                F.max("n_events").alias("n_events"),
            )
            .collect()
        )

    work1, src1 = _write_batches(batches)
    s1 = (
        spark.readStream.schema("user_id long, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .json(src1)
    )
    legacy = fold(_run_stream(spark, stateful_sessionize(s1, gap), work1))

    work2, src2 = _write_batches(batches)
    s2 = (
        spark.readStream.schema("user_id long, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .json(src2)
        .select("user_id", F.timestamp_micros("ts_us").alias("ts"))
    )
    v2 = fold(_run_stream(spark, tws_sessionize(s2, gap, delay_seconds=1), work2))
    assert legacy == v2 and len(v2) >= 6, (legacy, v2)


def test_tws_sessionize_timer_closes_idle_key(spark):
    """The v2-only feature: a key with NO further events still gets its
    session CLOSED (via handleExpiredTimer) once other keys advance
    the watermark past last_ts + gap."""
    if not _tws_available(spark):
        pytest.skip("no protobuf runtime for the v2 state API")
    from changedatacapture_spark.streaming.stateful_v2 import tws_sessionize

    H = 3_600_000_000
    BASE = 1_700_000_000_000_000
    # user 7 events in batch 0 only; user 9 marches on, advancing the
    # watermark far past user 7's last_ts + gap
    batches = [
        [(7, BASE), (7, BASE + 100), (9, BASE + 50)],
        [(9, BASE + 10 * H)],
        [(9, BASE + 20 * H)],
    ]
    work, src = _write_batches(batches)
    s = (
        spark.readStream.schema("user_id long, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .select("user_id", F.timestamp_micros("ts_us").alias("ts"))
    )
    emitted = _run_stream(spark, tws_sessionize(s, gap_seconds=3600), work)
    timer_rows = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in emitted.filter("via_timer AND closed").collect()
    ]
    assert (7, BASE, BASE + 100, 2) in timer_rows, timer_rows
    # and no event-driven close exists for user 7 (no later events)
    assert not [
        r
        for r in emitted.filter(
            "user_id = 7 AND closed AND NOT via_timer"
        ).collect()
    ]


def test_tws_rate_limit_exact_under_disorder(spark):
    """Out-of-order arrival across batches folds into the RIGHT
    windows with the event-time-smallest admitted set — the exactness
    the legacy operator's drop-late policy cannot provide."""
    if not _tws_available(spark):
        pytest.skip("no protobuf runtime for the v2 state API")
    from changedatacapture_spark.streaming.stateful_v2 import tws_rate_limit
    from pyspark.sql import Window as W

    H = 3_600_000_000
    B = 1_700_000_000_000_000
    batches = [
        [(1, B + H + 50), (1, B + 10), (2, B + 20)],
        [(1, B + 30), (1, B + 5), (1, B + H + 10)],
        [(1, B + 40), (2, B + H + 1), (1, B + 15)],
    ]
    work, src = _write_batches(batches)
    s = (
        spark.readStream.schema("user_id long, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    emitted = _run_stream(spark, tws_rate_limit(s, window_seconds=3600, cap=2), work)
    final = (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "window_start").orderBy(F.desc("n_seen"))
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    got = {
        (r["user_id"], r["window_start"]): (
            r["n_seen"],
            r["n_admitted"],
            r["last_admitted_ts"],
        )
        for r in final
    }
    exp = {
        (1, (B + 10) // H * H): (5, 2, B + 10),
        (1, (B + H + 50) // H * H): (2, 2, B + H + 50),
        (2, (B + 20) // H * H): (1, 1, B + 20),
        (2, (B + H + 1) // H * H): (1, 1, B + H + 1),
    }
    assert got == exp, (got, exp)


def test_tws_rate_limit_bounded_state_counts_late(spark):
    """With lateness_windows bounded, windows behind the key's horizon
    evict from MapState and a too-late event is COUNTED in
    n_late_dropped instead of corrupting closed windows."""
    if not _tws_available(spark):
        pytest.skip("no protobuf runtime for the v2 state API")
    from changedatacapture_spark.streaming.stateful_v2 import tws_rate_limit

    H = 3_600_000_000
    B = 1_700_000_000_000_000 // H * H  # hour-aligned base
    batches = [
        [(1, B + 10), (1, B + 20)],
        [(1, B + 10 * H)],          # horizon jumps 10 windows ahead -> w0 evicts
        [(1, B + 30)],              # too late for w0: dropped + counted
        [(1, B + 10 * H + 5)],      # in-horizon event still exact
    ]
    work, src = _write_batches(batches)
    s = (
        spark.readStream.schema("user_id long, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    emitted = _run_stream(
        spark,
        tws_rate_limit(s, window_seconds=3600, cap=5, lateness_windows=2),
        work,
    )
    rows = emitted.collect()
    # w0's stats froze at eviction: no emission for w0 with n_seen > 2
    w0 = [r for r in rows if r["window_start"] == B]
    assert max(r["n_seen"] for r in w0) == 2, w0
    # the late event was counted
    assert max(r["n_late_dropped"] for r in rows) == 1, rows
    # the live window kept exact counts
    w10 = [r for r in rows if r["window_start"] == B + 10 * H]
    assert max(r["n_seen"] for r in w10) == 2, w10


# ---------------------------------------------------------------------------
# embedding hub guard (round-10 weak closed)
# ---------------------------------------------------------------------------


def test_embedding_neardup_hub_guard_modes(spark):
    """With the cap above every bucket size the hybrid must equal the
    unguarded all-pairs output; with a binding cap, hot buckets chain
    (bounded candidates) while small buckets stay exhaustive."""
    import numpy as np

    from changedatacapture_spark.operators.similarity import (
        embedding_hot_buckets,
        embedding_neardup_pairs,
    )

    rng = np.random.RandomState(11)
    # 3 tight clusters of 12 + 20 singletons, dim 64, int16-ish values
    rows = []
    vid = 0
    for c in range(3):
        center = rng.randint(-100, 100, 64)
        for _ in range(12):
            rows.append((vid, [int(v) for v in center + rng.randint(-2, 3, 64)]))
            vid += 1
    for _ in range(20):
        rows.append((vid, [int(v) for v in rng.randint(-100, 100, 64)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<int>")

    def pairset(out):
        return {(r["vec_a"], r["vec_b"]) for r in out.collect()}

    uncapped = pairset(
        embedding_neardup_pairs(df, threshold_scaled=250_000, n_planes=4)
    )
    loose = pairset(
        embedding_neardup_pairs(
            df, threshold_scaled=250_000, n_planes=4, max_bucket_size=1000
        )
    )
    assert loose == uncapped and uncapped, (len(uncapped), len(loose))

    tight = pairset(
        embedding_neardup_pairs(
            df, threshold_scaled=250_000, n_planes=4, max_bucket_size=5, window=4
        )
    )
    # chained pairs are a subset of all-pairs (same scoring, fewer
    # candidates), and clusters must stay represented
    assert tight <= uncapped and tight

    audit = {
        r["mode"]
        for r in embedding_hot_buckets(
            df, n_planes=4, max_bucket_size=5, window=4
        ).collect()
    }
    assert audit == {"allpairs", "chained"}, audit


# ---------------------------------------------------------------------------
# substring dedup (Lee et al. 2022 ExactSubstr, relational form)
# ---------------------------------------------------------------------------


def test_substring_dup_spans_semantics(spark):
    """Cross-doc shared k-grams produce merged maximal spans; intra-doc
    repeats alone do NOT count; docs shorter than k contribute
    nothing; hash_grams mode agrees with exact grams."""
    from changedatacapture_spark.operators.dedup import substring_dup_spans

    shared = "0123456789"  # k=6 grams inside this are cross-doc shared
    rows = [
        (0, "aaa" + shared + "zzz"),
        (1, "b" + shared + "yy"),
        (2, "ccccc"),              # shorter than k
        (3, "ddddddddddddd"),      # intra-doc repeats only (no partner)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in substring_dup_spans(df, k=6).collect()
    }
    # doc 0: shared occupies positions 4..13 -> grams at 4..8 -> span [4, 14)
    # doc 1: positions 2..11 -> grams at 2..6 -> span [2, 12)
    assert out == {0: (4, 14, 10), 1: (2, 12, 10)}, out

    hashed = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in substring_dup_spans(df, k=6, hash_grams=True).collect()
    }
    assert hashed == out


def test_ppl_buckets_fit_score_disjoint(spark, sf_dir):
    """CCNet bucketing contract: no scored document may come from the
    LM fit slice (md5 buckets < 30), and the tertile labels must cover
    the scored set in thirds."""
    from changedatacapture_spark.operators.curation import split_bucket
    from changedatacapture_spark.operators.text import ppl_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ppl_buckets(docs, fit_pct=30)
    joined = out.join(
        docs.select("doc_id", split_bucket("CAST(doc_id AS STRING)").alias("b")),
        "doc_id",
    )
    assert joined.filter("b < 30").count() == 0
    counts = {r["bucket"]: r["n"] for r in out.groupBy("bucket").agg(
        F.count("*").alias("n")).collect()}
    assert set(counts) == {"head", "middle", "tail"}
    assert max(counts.values()) - min(counts.values()) <= 1, counts
