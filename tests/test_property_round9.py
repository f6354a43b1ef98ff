"""Property-based tests for the round-9 operators: arbitrary inputs
must match trivially-correct Python folds.

- triangle_counts vs a brute-force enumeration over random edge lists
  (self-loops, duplicates, both orientations);
- mad_profile vs a plain sorted-list median/MAD computation with the
  same 1e-6 quantization and truncating arithmetic;
- dq check_rules vs per-row Python evaluation of every rule kind;
- the PQ encoder's ADC identity: the quantization error reported by
  pq_encode must equal the ADC distance of a vector to ITSELF (the
  self-distance through the lookup table), for any vectors/codebook.
"""

from __future__ import annotations

import itertools
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


@given(edges=_EDGES)
@_SETTINGS
def test_triangle_counts_matches_bruteforce(spark, edges):
    from changedatacapture_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [(str(u), str(v)) for u, v in edges], "src string, dst string"
    )
    got = {
        int(r.node): r.n_triangles for r in triangle_counts(df).collect()
    }
    und = {
        (min(u, v), max(u, v)) for u, v in edges if u != v
    }
    nodes = sorted({x for e in und for x in e})
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for x in (a, b, c):
                want[x] = want.get(x, 0) + 1
    assert got == want


_VALUES = st.lists(
    st.floats(
        min_value=-1000, max_value=1000,
        allow_nan=False, allow_infinity=False,
    ),
    min_size=1,
    max_size=40,
)


@given(vals=_VALUES)
@_SETTINGS
def test_mad_profile_matches_sorted_fold(spark, vals):
    from changedatacapture_spark.operators.stats import mad_profile

    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "grp string, value double"
    )
    r = mad_profile(df, "grp", "value").collect()[0]

    xs = sorted(math.floor(v * 1_000_000) for v in vals)
    n = len(xs)

    def med(sorted_vals):
        lo = sorted_vals[(n + 1) // 2 - 1]
        hi = sorted_vals[(n + 2) // 2 - 1]
        return (float(lo) + float(hi)) / 2.0

    m = med(xs)
    devs = sorted(abs(float(x) - m) for x in xs)
    md = med(devs)
    n_out = sum(1 for d in devs if d > 4.4478 * md)
    assert r["n"] == n
    assert r["median_value"] == m / 1_000_000
    assert r["mad_value"] == md / 1_000_000
    assert r["n_outliers"] == n_out
    q = abs(n_out * 1_000_000) // n
    assert r["outlier_ppm"] == q


_ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),  # key
        st.integers(min_value=0, max_value=3),                        # line no
        st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                       allow_nan=False)),             # value
        st.one_of(st.none(), st.sampled_from(["A", "B", "X"])),       # flag
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_ROWS)
@_SETTINGS
def test_dq_rules_match_python_eval(spark, rows):
    from changedatacapture_spark.operators.dq import check_rules

    df = spark.createDataFrame(
        [(k, ln, v, f) for k, ln, v, f in rows],
        "k long, ln long, v double, f string",
    )
    rules = [
        {"id": "nn", "type": "not_null", "col": "k"},
        {"id": "rng", "type": "range", "col": "v", "min": -10.0, "max": 10.0},
        {"id": "acc", "type": "accepted", "col": "f", "values": ["A", "B"]},
        {"id": "uq", "type": "unique", "cols": ["k", "ln"]},
    ]
    rep = {
        r["check_id"]: r["n_violations"]
        for r in check_rules(df, "t", rules).collect()
    }
    assert rep["nn"] == sum(1 for k, _, _, _ in rows if k is None)
    assert rep["rng"] == sum(
        1 for _, _, v, _ in rows if v is not None and (v < -10.0 or v > 10.0)
    )
    assert rep["acc"] == sum(
        1 for _, _, _, f in rows if f is not None and f not in ("A", "B")
    )
    keys = [(k, ln) for k, ln, _, _ in rows if k is not None]
    assert rep["uq"] == len(rows) - len(set(keys))


_VECS = st.lists(
    st.lists(
        st.floats(min_value=-1, max_value=1,
                  allow_nan=False, allow_infinity=False),
        min_size=16, max_size=16,
    ),
    min_size=1,
    max_size=6,
)


@given(vecs=_VECS)
@_SETTINGS
def test_pq_self_distance_equals_quantization_error(spark, vecs):
    """ADC identity: looking up a vector's own codes in its own LUT
    must reproduce pq_encode's reported quantization error exactly —
    ties all three PQ surfaces (encode, LUT, ADC fold) together."""
    from changedatacapture_spark.operators.similarity import pq_encode

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    enc = pq_encode(df, m=4, ks=4, dim=16).collect()
    # python replay of LUT + self-lookup
    from changedatacapture_spark.operators.similarity import (
        PQ_SCALE,
        pq_codebook,
    )

    book = pq_codebook(4, 4, 4)
    for r in enc:
        v = vecs[r["vec_id"]]
        xs = [math.floor(float(x) * PQ_SCALE) for x in v]
        total = 0
        for j in range(4):
            dl = [
                sum((xs[j * 4 + d] - book[j][c][d]) ** 2 for d in range(4))
                for c in range(4)
            ]
            total += dl[r["codes"][j]]
            assert dl[r["codes"][j]] == min(dl)
        assert total == r["dist_scaled"]
