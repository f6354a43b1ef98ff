"""Property-based differential tests for round-16 hardening.

Invariant 1 (chunked probes): for ANY table contents, ANY probe value
list (duplicates, absent values, NULL-free by contract), and ANY chunk
size, ``chunked_in_read`` returns exactly the rows of one
``read_where`` IN-probe carrying the whole list — whatever mix of
chunking, dedup, and adaptive single-pass bail the inputs trigger.

Invariant 2 (rebucket): for ANY contents and ANY rebucket target —
integer multiples (the map-only split) and non-multiples (the shuffle
path) alike — contents, point lookups, and filtered reads are
unchanged.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (key, v) rows: tiny v domain forces multi-row values; k unique-ified
_ROWS = st.lists(
    st.integers(min_value=0, max_value=6),
    min_size=1,
    max_size=30,
)
_PROBE = st.lists(
    st.integers(min_value=0, max_value=9),  # includes absent values
    min_size=0,
    max_size=12,
)


@given(_ROWS, _PROBE, st.integers(min_value=1, max_value=5),
       st.booleans())
@_SETTINGS
def test_chunked_in_read_equals_single_probe(
    spark, tmp_path_factory, vs, probe, max_inlist, blooms
):
    from changedatacapture_spark.streaming.sink import (
        SnapshotTable,
        chunked_in_read,
    )

    path = os.path.join(
        str(tmp_path_factory.mktemp("chunkprop")), "t"
    )
    t = SnapshotTable(
        spark, path, ["k"], n_buckets=3,
        bloom_cols=["v"] if blooms else None,
    )
    rows = [(i, v, "c") for i, v in enumerate(vs)]
    t.merge(
        spark.createDataFrame(rows, "k long, v long, op string"),
        batch_id=0,
    )
    chunked, rep = chunked_in_read(t, "v", list(probe), max_inlist)
    single = t.read_where([("v", "in", list(set(probe)))]) if probe \
        else t.read().limit(0)
    got = sorted(r.k for r in chunked.collect())
    want = sorted(r.k for r in single.collect())
    assert got == want
    assert len(got) == len(set(got))  # duplicate-free whatever the input


@given(
    _ROWS,
    st.sampled_from([2, 3, 4, 6, 8, 12]),
    st.booleans(),
)
@_SETTINGS
def test_rebucket_any_target_preserves_reads(
    spark, tmp_path_factory, vs, target, second_merge
):
    from changedatacapture_spark.streaming.sink import SnapshotTable

    path = os.path.join(
        str(tmp_path_factory.mktemp("rebprop")), "t"
    )
    t = SnapshotTable(spark, path, ["k"], n_buckets=4)
    rows = [(i, v, "c") for i, v in enumerate(vs)]
    t.merge(
        spark.createDataFrame(rows, "k long, v long, op string"),
        batch_id=0,
    )
    before = sorted((r.k, r.v) for r in t.read().collect())
    t.rebucket(target)
    if second_merge:  # post-rebucket routing must hit incumbents
        t.merge(
            spark.createDataFrame(
                [(0, 999, "u")], "k long, v long, op string"
            ),
            batch_id=1,
        )
        before = sorted(
            (k, 999 if k == 0 else v) for k, v in before
        )
    assert sorted((r.k, r.v) for r in t.read().collect()) == before
    ks = [k for k, _ in before][:3]
    got = sorted(r.k for r in t.read_keys(ks).collect())
    assert got == sorted(ks)
