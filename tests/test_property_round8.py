"""Property-based tests for the round-8 operators: arbitrary inputs
must match trivially-correct Python folds.

- connected_components vs a plain union-find over random edge lists
  (including self-loops, duplicate edges, both orientations);
- the histogram-threshold quality-gate selection law on random
  (group, score) corpora: the kept set is exactly { score >= thr }
  where thr is the largest score whose descending-cumulative count
  reaches ceil(n/4);
- bucket quantiles vs a sort-based rank on random value multisets.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=1,
    max_size=30,
)


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


@given(edges=_EDGES)
@_SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    from changedatacapture_spark.operators.dedup import connected_components

    df = spark.createDataFrame(
        [(int(u), int(v)) for u, v in edges], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.group_id for r in connected_components(df).collect()
    }
    uf = _UF()
    for u, v in edges:
        uf.union(u, v)
    want = {}
    for u, v in edges:
        for x in (u, v):
            want[x] = min(
                y for y in uf.p if uf.find(y) == uf.find(x)
            )
    assert got == want


_CORPUS = st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),
        st.integers(min_value=0, max_value=20),  # small score space → ties
    ),
    min_size=1,
    max_size=60,
)


@given(corpus=_CORPUS)
@_SETTINGS
def test_quality_gate_threshold_law_on_random_scores(spark, corpus):
    """Re-implements the gate's histogram/threshold selection inline
    over arbitrary scores and checks the selection law the registered
    query (score derivation aside) relies on: keep exactly the docs
    with score >= the largest score whose descending-cumulative count
    reaches ceil(n/4)."""
    from pyspark.sql.window import Window

    rows = [(i, lang, s) for i, (lang, s) in enumerate(corpus)]
    sc = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    hist = sc.groupBy("lang", "score").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.groupBy("lang").agg(F.sum("n").alias("n_docs"))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    thr = (
        hist.withColumn("cum", F.sum("n").over(w))
        .join(tot, "lang")
        .filter(F.col("cum") >= F.floor((F.col("n_docs") + 3) / 4))
        .groupBy("lang")
        .agg(F.max("score").alias("thr"))
    )
    kept = {
        r.doc_id
        for r in sc.join(thr, "lang")
        .filter(F.col("score") >= F.col("thr"))
        .collect()
    }
    want = set()
    langs = {lang for lang, _s in corpus}
    for lang in langs:
        scores = sorted(
            (s for lg, s in corpus if lg == lang), reverse=True
        )
        quota = math.ceil(len(scores) / 4)
        t = scores[quota - 1]  # quota-th highest, ties included
        want |= {
            i
            for i, (lg, s) in enumerate(corpus)
            if lg == lang and s >= t
        }
    assert kept == want


_LOG = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # key
        st.sampled_from(["u", "u", "d"]),  # op (deletes less common)
        st.integers(min_value=-99, max_value=99),  # value
    ),
    min_size=1,
    max_size=18,
)


@given(log=_LOG)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_time_travel_every_version_matches_prefix_fold(spark, tmp_path_factory, log):
    """Reading AT each committed version must equal a Python fold of
    the batch prefix up to that version — for ANY interleaving of
    upserts and deletes split into 3 arbitrary batches."""
    from changedatacapture_spark.streaming.sink import SnapshotTable

    tmp = tmp_path_factory.mktemp("tt_prop")
    t = SnapshotTable(
        spark, str(tmp / "t"), ["k"], n_buckets=2, retain_history=4
    )
    third = max(len(log) // 3, 1)
    batches = [log[:third], log[third : 2 * third], log[2 * third :]]
    batches = [b for b in batches if b]
    state: dict[int, int] = {}
    expected = []
    for bid, batch in enumerate(batches):
        # batch-compact: last op per key within the batch wins
        last = {}
        for k, op, v in batch:
            last[k] = (op, v)
        df = spark.createDataFrame(
            [(k, op, v) for k, (op, v) in last.items()],
            "k long, op string, value long",
        )
        t.merge(df, batch_id=bid)
        for k, (op, v) in last.items():
            if op == "d":
                state.pop(k, None)
            else:
                state[k] = v
        expected.append(dict(state))
    hist = t.history()
    assert len(hist) == len(batches)
    for entry, want in zip(hist, expected):
        got = {
            r.k: r.value
            for r in t.read(at_version=entry["version"]).collect()
        }
        assert got == want, (entry["version"], got, want)


_VALUES = st.lists(
    st.integers(min_value=0, max_value=40), min_size=1, max_size=50
)


@given(values=_VALUES)
@_SETTINGS
def test_histogram_quantile_thresholds_match_rank(spark, values):
    """cum*2 >= n picks the bucket of the ceil(n/2)-th smallest value
    (and likewise p90/p99) for ANY integer multiset — the identity the
    registered query's integer threshold tests encode."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame([(v,) for v in values], "bucket long")
    hist = df.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = len(values)
    cum = hist.withColumn("cum", F.sum("n").over(w))
    got = cum.agg(
        F.min(F.when(F.col("cum") * 2 >= n, F.col("bucket"))).alias("p50"),
        F.min(F.when(F.col("cum") * 10 >= n * 9, F.col("bucket"))).alias("p90"),
        F.min(F.when(F.col("cum") * 100 >= n * 99, F.col("bucket"))).alias("p99"),
    ).first()
    s = sorted(values)
    assert got.p50 == s[math.ceil(0.5 * n) - 1]
    assert got.p90 == s[math.ceil(0.9 * n) - 1]
    assert got.p99 == s[math.ceil(0.99 * n) - 1]
