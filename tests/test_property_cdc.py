"""Property-based differential tests for the core CDC semantics.

The reference's correctness philosophy is end-to-end differential:
a *randomized* CRUD workload streamed through the engine must leave
the target equal to an independently-computed expected state
(test/cdc_test_framework.py:160-214, test/validate_cdc_data.py:130-188).
These tests keep that philosophy but make it hermetic and adversarial:
hypothesis generates arbitrary change logs — including same-timestamp
ties, delete-then-reinsert interleavings (docs/SQLs For Test.txt:9-27),
delete-before-any-insert, and single-key floods — and the Spark
operators must match a trivially-correct Python fold of the log.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from changedatacapture_spark.operators import apply_changes, compact_latest

# One event: (key, ts, op, value). seq is the list index — the
# arrival-order tie-break, mirroring the Kafka offset.
_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # small keyspace → collisions
        st.integers(min_value=0, max_value=3),  # tiny ts range → ts ties
        st.sampled_from(["c", "u", "d", "r"]),
        st.integers(min_value=-1000, max_value=1000),
    ),
    min_size=0,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _expected_latest(events):
    """Oracle fold: last event per key by (ts, seq)."""
    best = {}
    for seq, (key, ts, op, value) in enumerate(events):
        cur = best.get(key)
        if cur is None or (ts, seq) >= (cur[0], cur[1]):
            best[key] = (ts, seq, op, value)
    return best


def _to_df(spark, events):
    rows = [
        (key, ts, seq, op, value)
        for seq, (key, ts, op, value) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "key_id long, ts long, seq long, op string, value long"
    )


@given(events=_EVENTS)
@_SETTINGS
def test_compact_matches_python_fold(spark, events):
    df = _to_df(spark, events)
    got = {
        r["key_id"]: (r["ts"], r["seq"], r["op"], r["value"])
        for r in compact_latest(df, ["key_id"], ["ts", "seq"]).collect()
    }
    assert got == _expected_latest(events)


@given(events=_EVENTS)
@_SETTINGS
def test_apply_matches_python_fold(spark, events):
    """apply = compact minus keys whose final op is a delete."""
    df = _to_df(spark, events)
    got = {
        r["key_id"]: (r["ts"], r["seq"], r["op"], r["value"])
        for r in apply_changes(df, ["key_id"], ["ts", "seq"]).collect()
    }
    expected = {
        k: v for k, v in _expected_latest(events).items() if v[2] != "d"
    }
    assert got == expected


@given(events=_EVENTS, cuts=st.lists(st.integers(0, 40), max_size=2))
@_SETTINGS
def test_guarded_merge_is_batch_split_invariant(spark, events, cuts):
    """Any sequence of order-guarded sink merges over any batch split
    of the log leaves the table equal to one global apply.

    This is the invariant the reference does NOT have (SURVEY §7.6.2:
    batches apply independently, so an older-timestamp event arriving
    a batch late overwrites newer state) and the guarded merge's
    tombstones restore: late deletes beat older upserts and vice
    versa, regardless of where the stream was cut into micro-batches.
    """
    import shutil
    import tempfile

    from changedatacapture_spark.streaming.sink import SnapshotTable

    bounds = sorted({min(c, len(events)) for c in cuts} | {0, len(events)})
    batches = [
        events[a:b] for a, b in zip(bounds, bounds[1:]) if events[a:b]
    ]

    path = tempfile.mkdtemp(prefix="guarded_merge_")
    try:
        table = SnapshotTable(spark, path, ["key_id"], n_buckets=4)
        offset = 0
        for batch in batches:
            rows = [
                (key, ts, offset + i, op, value)
                for i, (key, ts, op, value) in enumerate(batch)
            ]
            offset += len(batch)
            bdf = spark.createDataFrame(
                rows, "key_id long, ts long, seq long, op string, value long"
            )
            table.merge(
                compact_latest(bdf, ["key_id"], ["ts", "seq"]),
                guard_cols=["ts", "seq"],
            )

        expected = {
            k: v
            for k, v in _expected_latest(events).items()
            if v[2] != "d"
        }
        if not table.exists():
            assert expected == {}
            return
        got = {
            r["key_id"]: (r["ts"], r["seq"], r["op"], r["value"])
            for r in table.read().collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- round-2 operator properties -------------------------------------------

_POINTS = st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=30)
_INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),
        st.integers(min_value=0, max_value=120),
    ),
    min_size=0,
    max_size=10,
)


@given(points=_POINTS, intervals=_INTERVALS,
       width=st.sampled_from([7, 50, 128, 1000]))
@_SETTINGS
def test_range_join_bucketed_matches_naive(spark, points, intervals, width):
    """For any bucket width the bucketed rewrite must equal the naive
    BETWEEN join — bucketing is a plan optimization, not a semantic."""
    from changedatacapture_spark.operators.joins import range_join_bucketed

    from pyspark.sql.types import StructType

    p = spark.createDataFrame(
        [(i, "k", t) for i, t in enumerate(points)],
        StructType.fromDDL("pid long, key string, t long"),
    )
    iv = spark.createDataFrame(
        [(j, "k", s, s + ln) for j, (s, ln) in enumerate(intervals)],
        StructType.fromDDL("iid long, key string, s long, e long"),
    )
    got = {
        (r.pid, r.iid)
        for r in range_join_bucketed(
            p, iv, "t", "s", "e", keys=["key"], bucket_width=width
        ).collect()
    }
    naive = {
        (i, j)
        for i, t in enumerate(points)
        for j, (s, ln) in enumerate(intervals)
        if s <= t <= s + ln
    }
    assert got == naive


@given(sizes=st.lists(st.integers(min_value=0, max_value=50),
                      min_size=1, max_size=25),
       max_tokens=st.sampled_from([1, 10, 37]))
@_SETTINGS
def test_pack_sequences_invariants(spark, sizes, max_tokens):
    """Bins are contiguous, start at 0, and equal the exclusive-cumsum
    rule for every doc — for any size distribution and bin width."""
    from changedatacapture_spark.operators.curation import pack_sequences

    rows = [(i, "s", " ".join(["w"] * n) if n else "") for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: (r.bin, r.n_tokens) for r in
           pack_sequences(docs, max_tokens=max_tokens).collect()}
    cum = 0
    for i, n in enumerate(sizes):
        n_tok = n if n else 1  # split("") -> [""] : one empty token
        assert out[i] == (cum // max_tokens, n_tok)
        cum += n_tok


@given(events=_EVENTS, cuts=st.lists(st.integers(0, 40), max_size=2))
@_SETTINGS
def test_guarded_merge_invariant_survives_tombstone_gc(spark, events, cuts):
    """Running tombstone GC between guarded merges — with the horizon
    the contract allows (no future event is older than it) — must not
    change the final table: any tombstone the GC drops could only have
    fended off arrivals the horizon says cannot come."""
    import shutil
    import tempfile

    from changedatacapture_spark.streaming.sink import SnapshotTable

    bounds = sorted({min(c, len(events)) for c in cuts} | {0, len(events)})
    batches = [
        events[a:b] for a, b in zip(bounds, bounds[1:]) if events[a:b]
    ]

    path = tempfile.mkdtemp(prefix="guarded_gc_")
    try:
        table = SnapshotTable(spark, path, ["key_id"], n_buckets=4)
        offset = 0
        for i, batch in enumerate(batches):
            rows = [
                (key, ts, offset + j, op, value)
                for j, (key, ts, op, value) in enumerate(batch)
            ]
            offset += len(batch)
            bdf = spark.createDataFrame(
                rows, "key_id long, ts long, seq long, op string, value long"
            )
            table.merge(
                compact_latest(bdf, ["key_id"], ["ts", "seq"]),
                guard_cols=["ts", "seq"],
            )
            # the largest horizon the replay contract allows right now
            remaining = [e for b in batches[i + 1:] for e in b]
            horizon = (
                min(ts for _, ts, _, _ in remaining) if remaining else 10**9
            )
            table.gc_tombstones(horizon)

        expected = {
            k: v
            for k, v in _expected_latest(events).items()
            if v[2] != "d"
        }
        if not table.exists():
            assert expected == {}
            return
        got = {
            r["key_id"]: (r["ts"], r["seq"], r["op"], r["value"])
            for r in table.read().collect()
        }
        assert got == expected
        # final GC clears every tombstone; the logical view is unmoved
        table.gc_tombstones(10**9)
        n_tomb = (
            table.read(include_tombstones=True).filter("op = 'd'").count()
            if table.exists()
            else 0
        )
        assert n_tomb == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_tombstone_count_bounded_under_churn_with_gc(spark):
    """Churning distinct keys grows the tombstone set without bound;
    periodic GC at the advancing replay horizon keeps it bounded."""
    import shutil
    import tempfile

    from changedatacapture_spark.streaming.sink import SnapshotTable

    path = tempfile.mkdtemp(prefix="tomb_churn_")
    try:
        table = SnapshotTable(spark, path, ["key_id"], n_buckets=4)

        def tomb_count():
            return (
                table.read(include_tombstones=True).filter("op = 'd'").count()
            )

        n_batches, gc_every = 9, 3
        for i in range(n_batches):
            # key i is created at ts=2i and deleted at ts=2i+1
            bdf = spark.createDataFrame(
                [(i, 2 * i, 2 * i, "c", i), (i, 2 * i + 1, 2 * i + 1, "d", None)],
                "key_id long, ts long, seq long, op string, value long",
            )
            table.merge(
                compact_latest(bdf, ["key_id"], ["ts", "seq"]),
                guard_cols=["ts", "seq"],
                batch_id=i,
            )
            if (i + 1) % gc_every == 0:
                dropped = table.gc_tombstones(2 * i + 2)
                assert dropped > 0
                assert tomb_count() == 0
            assert tomb_count() <= gc_every
        # replay idempotence survives GC: re-merging the last batch id
        # is a no-op even though GC committed new versions after it
        before = table.version
        bdf = spark.createDataFrame(
            [(0, 100, 100, "c", 7)],
            "key_id long, ts long, seq long, op string, value long",
        )
        table.merge(
            compact_latest(bdf, ["key_id"], ["ts", "seq"]),
            guard_cols=["ts", "seq"],
            batch_id=n_batches - 1,
        )
        assert table.version == before
        assert table.read().count() == 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --- round-6 operator properties -------------------------------------------


def _expected_scd2(events):
    """Oracle fold: per key, the (ts,seq)-ordered non-delete versions
    with each closed by the next event's ts (None if last)."""
    per_key = {}
    for seq, (key, ts, op, value) in enumerate(events):
        per_key.setdefault(key, []).append((ts, seq, op, value))
    out = set()
    for key, evs in per_key.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        for i, (ts, seq, op, value) in enumerate(evs):
            if op == "d":
                continue
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            out.add((key, value, ts, nxt, 1 if nxt is None else 0))
    return out


@given(events=_EVENTS)
@_SETTINGS
def test_scd2_matches_python_fold(spark, events):
    from changedatacapture_spark.operators.cdc import scd2_history

    df = _to_df(spark, events)
    got = {
        (r.key_id, r.value, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(
            df, ["key_id"], ["ts", "seq"], payload_cols=["value"]
        ).collect()
    }
    assert got == _expected_scd2(events)


@given(events=_EVENTS, cuts=st.lists(st.integers(0, 40), max_size=2))
@_SETTINGS
def test_incremental_agg_equals_recompute_for_any_split(spark, events, cuts):
    """Fold the changelog through aggregate_delta/merge_agg_state over
    ANY batch split: the maintained (grp, cnt, total) must equal a
    from-scratch GROUP BY over the final applied snapshot."""
    from pyspark.sql import functions as F

    from changedatacapture_spark.operators.cdc import (
        aggregate_delta,
        merge_agg_state,
    )

    bounds = sorted({min(c, len(events)) for c in cuts} | {0, len(events)})
    batches = [events[a:b] for a, b in zip(bounds, bounds[1:]) if events[a:b]]

    grp = F.pmod(F.col("key_id"), F.lit(3)).cast("long")
    snapshot = None
    state = None
    offset = 0
    for batch in batches:
        rows = [
            (key, ts, offset + i, op, value)
            for i, (key, ts, op, value) in enumerate(batch)
        ]
        offset += len(batch)
        bdf = spark.createDataFrame(
            rows, "key_id long, ts long, seq long, op string, value long"
        )
        compacted = compact_latest(bdf, ["key_id"], ["ts", "seq"])
        prev = (
            snapshot
            if snapshot is not None
            else compacted.filter(F.lit(False)).select("key_id", "value")
        )
        delta = aggregate_delta(prev, compacted, ["key_id"], grp, "value")
        if state is None:
            state = delta.select(
                "grp", F.col("d_count").alias("cnt"), F.col("d_sum").alias("total")
            ).filter(F.col("cnt") > 0)
        else:
            state = merge_agg_state(state, delta)
        live = compacted.filter(F.col("op") != "d").select("key_id", "value")
        snapshot = (
            live
            if snapshot is None
            else snapshot.join(compacted.select("key_id"), "key_id", "left_anti")
            .unionByName(live)
        )

    got = (
        {r.grp: (r.cnt, r.total) for r in state.collect()}
        if state is not None
        else {}
    )
    expected = (
        {
            r.grp: (r.cnt, r.total)
            for r in snapshot.groupBy(grp.alias("grp"))
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
            .collect()
        }
        if snapshot is not None
        else {}
    )
    assert got == expected


@given(events=_EVENTS, cut=st.integers(0, 40))
@_SETTINGS
def test_change_feed_replication_property(spark, events, cut):
    """For ANY changelog split, applying changes_between(v1, v2) to a
    replica synced at v1 reproduces the v2 state exactly."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from changedatacapture_spark.streaming.sink import SnapshotTable

    cut = min(cut, len(events))
    b1, b2 = events[:cut], events[cut:]
    if not b1 or not b2:
        return
    path = tempfile.mkdtemp(prefix="cdf_prop_")
    try:
        src = SnapshotTable(
            spark, path + "/src", ["key_id"], n_buckets=4, retain_history=4
        )

        def to_df(batch, offset):
            rows = [
                (key, ts, offset + i, op, value)
                for i, (key, ts, op, value) in enumerate(batch)
            ]
            return spark.createDataFrame(
                rows, "key_id long, ts long, seq long, op string, value long"
            )

        src.merge(compact_latest(to_df(b1, 0), ["key_id"], ["ts", "seq"]))
        v1 = src.version
        src.merge(
            compact_latest(to_df(b1 + b2, 0), ["key_id"], ["ts", "seq"])
        )
        v2 = src.version
        if v2 == v1:  # second merge may be a no-op on an empty table
            return

        replica = SnapshotTable(spark, path + "/rep", ["key_id"], n_buckets=4)
        v1_state = src.read(at_version=v1)
        if v1_state.count():
            replica.merge(v1_state.withColumn("op", F.lit("c")))
        feed = src.changes_between(v1, v2)
        as_changes = feed.select(
            "key_id",
            F.when(F.col("change_type") == "delete", F.lit("d"))
            .otherwise(F.lit("u"))
            .alias("op"),
            "ts",
            "seq",
            "value",
        )
        replica.merge(as_changes)

        want = {
            (r.key_id, r.ts, r.seq, r.value) for r in src.read().collect()
        }
        have = (
            {
                (r.key_id, r.ts, r.seq, r.value)
                for r in replica.read().collect()
            }
            if replica.exists()
            else set()
        )
        assert have == want
    finally:
        shutil.rmtree(path, ignore_errors=True)
