"""Property-based differential test for the secondary index.

The index invariant: for ANY changelog, ANY contiguous batch split,
and ANY sync cadence (sync after every merge, or skipping merges so a
single sync must absorb a MULTI-VERSION net change feed), every value
lookup equals a plain filter of the table's final state — stale
postings always retract, missing postings never happen, and the net
feed (a key changing twice between syncs, or inserted-then-deleted
entirely inside a gap) resolves correctly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# (key, ts, op, band) — band is the INDEXED payload column; tiny
# domains force key collisions, band moves, delete-then-reinsert.
# None is IN the domain: a NULL band is un-indexed, so the invariant
# covers the non-null→NULL transition (the old value's posting must
# retract even though the update adds no posting of its own — the
# exact path a coalesce'd CDF post-image silently broke)
_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["c", "u", "d"]),
        st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
    ),
    min_size=1,
    max_size=24,
)

# per-batch: sync the index after this merge?
_SYNC_PLAN = st.lists(st.booleans(), min_size=1, max_size=4)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _expected(events):
    ordered = sorted(
        (ts, seq, key, op, band)
        for seq, (key, ts, op, band) in enumerate(events)
    )
    state = {}
    for ts, seq, key, op, band in ordered:
        if op == "d":
            state.pop(key, None)
        else:
            state[key] = band
    return state


@given(_EVENTS, _SYNC_PLAN, st.integers(min_value=0, max_value=2**31 - 1))
@_SETTINGS
def test_secondary_index_any_split_any_sync_cadence(
    spark, tmp_path_factory, events, sync_plan, cut_seed
):
    import random

    from changedatacapture_spark.operators.cdc import compact_latest
    from changedatacapture_spark.streaming.index import SecondaryIndex
    from changedatacapture_spark.streaming.sink import SnapshotTable

    rows = sorted(
        (ts, seq, key, op, band)
        for seq, (key, ts, op, band) in enumerate(events)
    )
    n_batches = len(sync_plan)
    rng = random.Random(cut_seed)
    cuts = sorted(rng.randint(0, len(rows)) for _ in range(n_batches - 1))
    bounds = [0] + cuts + [len(rows)]

    base = tmp_path_factory.mktemp("sidx_prop")
    t = SnapshotTable(
        spark, str(base / "t"), ["key_id"], n_buckets=2,
        retain_history=8,  # gaps up to the whole plan stay readable
    )
    idx = SecondaryIndex(spark, t, "band", n_buckets=2)
    for i, do_sync in enumerate(sync_plan):
        chunk = rows[bounds[i]:bounds[i + 1]]
        if chunk:
            df = spark.createDataFrame(
                [(k, ts, seq, op, b) for ts, seq, k, op, b in chunk],
                "key_id long, ts long, seq long, op string, band long",
            )
            t.merge(
                compact_latest(df, ["key_id"], ["ts", "seq"]), batch_id=i
            )
        if do_sync and t.exists():
            idx.sync()

    if not t.exists():
        return
    idx.sync()  # final catch-up absorbs whatever gap remains
    state = _expected(events)
    for band in (0, 1, 2):
        got = sorted(r.key_id for r in idx.lookup(band).collect())
        want = sorted(k for k, b in state.items() if b == band)
        assert got == want, (band, got, want, events, sync_plan)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=3),
            st.sampled_from(["c", "u", "d"]),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@_SETTINGS
def test_scd2_view_any_ordered_split_equals_batch_history(
    spark, tmp_path_factory, events, n_batches, cut_seed
):
    """The SCD2View law: ANY changelog folded through ANY time-ordered
    batch split leaves history() ≡ scd2_history over the whole log —
    including same-timestamp zero-length version chains that SPAN
    batch boundaries (the closed table's full-order-tuple key is what
    keeps those from overwriting each other)."""
    import random

    from changedatacapture_spark.operators.cdc import scd2_history
    from changedatacapture_spark.streaming.history import SCD2View
    from changedatacapture_spark.streaming.sink import SnapshotTable

    rows = sorted(
        (ts, seq, key, op, value)
        for seq, (key, ts, op, value) in enumerate(events)
    )
    ddl = "key_id long, ts long, seq long, op string, value long"
    full = spark.createDataFrame(
        [(k, ts, seq, op, v) for ts, seq, k, op, v in rows], ddl
    )
    expected = sorted(
        (r.key_id, r.value, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(
            full, ["key_id"], ["ts", "seq"], payload_cols=["value"]
        ).collect()
    )

    rng = random.Random(cut_seed)
    cuts = sorted(rng.randint(0, len(rows)) for _ in range(n_batches - 1))
    bounds = [0] + cuts + [len(rows)]
    base = tmp_path_factory.mktemp("scd2_prop")
    open_t = SnapshotTable(spark, str(base / "open"), ["key_id"], n_buckets=2)
    closed_t = SnapshotTable(
        spark, str(base / "closed"), ["key_id", "valid_from", "seq"],
        n_buckets=2,
    )
    view = SCD2View(
        spark, open_t, closed_t, ["key_id"], ["ts", "seq"], ["value"]
    )
    for i in range(n_batches):
        chunk = rows[bounds[i]:bounds[i + 1]]
        if not chunk:
            continue
        view.apply(
            spark.createDataFrame(
                [(k, ts, seq, op, v) for ts, seq, k, op, v in chunk], ddl
            ),
            batch_id=i,
        )
    if not open_t.exists() and not closed_t.exists():
        assert expected == []
        return
    got = sorted(
        (r.key_id, r.value, r.valid_from, r.valid_to, r.is_current)
        for r in view.history().collect()
    )
    assert got == expected, (events, bounds)
