"""Property-based differential tests for round-17 hardening.

Invariant (extends round-16's chunked-probe law per the r16 brief):
for ANY table contents, ANY probe list, ANY chunk size, and ANY
``semi_threshold`` — including thresholds that force the broadcast
semi-join route — ``chunked_in_read`` returns exactly the rows of one
literal ``read_where`` IN-probe. The physical plan (literal IN,
chunked probes, degraded single pass, or values-DataFrame semi-join)
must never be observable in the result.
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

_ROWS = st.lists(
    st.integers(min_value=0, max_value=6),
    min_size=1,
    max_size=30,
)
_PROBE = st.lists(
    st.integers(min_value=0, max_value=9),
    min_size=0,
    max_size=12,
)


@given(
    _ROWS,
    _PROBE,
    st.integers(min_value=1, max_value=5),
    st.sampled_from([1, 3, 0]),  # 0 = semi route disabled
    st.booleans(),
)
@_SETTINGS
def test_semi_route_equals_literal_probe(
    spark, tmp_path_factory, vs, probe, max_inlist, semi_threshold, mor
):
    from changedatacapture_spark.streaming.sink import (
        SnapshotTable,
        chunked_in_read,
    )

    path = os.path.join(str(tmp_path_factory.mktemp("semiprop")), "t")
    t = SnapshotTable(spark, path, ["k"], n_buckets=3, bloom_cols=["v"])
    rows = [(i, v, "c") for i, v in enumerate(vs)]
    split = len(rows) // 2 if mor else len(rows)
    t.merge(
        spark.createDataFrame(
            rows[:split] or [rows[0]], "k long, v long, op string"
        ),
        batch_id=0,
    )
    if mor and rows[split:]:
        t.merge(
            spark.createDataFrame(
                rows[split:], "k long, v long, op string"
            ),
            batch_id=1,
            mode="mor",
        )
    got_df, rep = chunked_in_read(
        t, "v", list(probe), max_inlist, semi_threshold=semi_threshold
    )
    want_df = (
        t.read_where([("v", "in", list(set(probe)))])
        if probe
        else t.read().limit(0)
    )
    got = sorted(r.k for r in got_df.collect())
    want = sorted(r.k for r in want_df.collect())
    assert got == want
    assert len(got) == len(set(got))
    if semi_threshold and len(set(probe)) > semi_threshold:
        assert rep.get("semi_join") is True
