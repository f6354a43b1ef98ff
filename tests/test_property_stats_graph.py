"""Property-based tests for the round-8 statistics/graph operators:
arbitrary inputs must match trivially-correct Python folds.

- pagerank vs the exact integer recursion on random weighted digraphs
  (duplicate edges collapse upstream in real use; here they are kept
  distinct inputs to the same recursion on both sides);
- numeric_profile moments vs numpy on random float multisets, plus
  invariants (var >= 0, min <= mean <= max);
- gini diversity bounds and its closed form on random token bags;
- CUSUM via prefix-min vs the sequential max(0, s + d) recursion on
  random integer count series.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_GRAPH = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=20,
).map(
    # collapse parallel edges (sum weights) the way an aggregated edge
    # build would; drop self-loops is NOT required — the operator and
    # the reference both allow them
    lambda es: sorted(
        {
            (s, t): sum(w for s2, t2, w in es if (s2, t2) == (s, t))
            for s, t, _ in es
        }.items()
    )
)


@given(graph=_GRAPH)
@_SETTINGS
def test_pagerank_random_graphs_match_reference(spark, graph):
    from changedatacapture_spark.operators.graph import RANK_SCALE, pagerank

    edges = [(f"n{s}", f"n{t}", int(w)) for (s, t), w in graph]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, n_iter=2).collect()}

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    n = len(nodes)
    base = RANK_SCALE * 15 // 100 // n
    rank = {v: RANK_SCALE // n for v in nodes}
    outw: dict[str, int] = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    for _ in range(2):
        contrib = dict.fromkeys(nodes, 0)
        for s, t, w in edges:
            contrib[t] += rank[s] * w // outw[s]
        rank = {v: base + 85 * contrib[v] // 100 for v in nodes}
    assert got == rank
    # floor division only loses mass; teleport floor bounds the loss
    assert sum(got.values()) <= RANK_SCALE


_VALUES = st.lists(
    st.floats(
        min_value=0.001,
        max_value=999.0,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=2,
    max_size=40,
)


@given(values=_VALUES)
@_SETTINGS
def test_numeric_profile_random_values_match_numpy(spark, values):
    import numpy as np

    from changedatacapture_spark.operators.stats import numeric_profile

    df = spark.createDataFrame([("g", float(v)) for v in values], "g string, v double")
    row = numeric_profile(df, "g", "v").collect()[0]
    q = np.array([math.floor(v * 1_000_000) / 1_000_000 for v in values])
    assert row["n"] == len(values)
    assert row["var_pop"] >= 0.0
    assert row["min_value"] <= row["mean_value"] <= row["max_value"]
    assert row["mean_value"] == __import__("pytest").approx(q.mean(), rel=1e-12)
    assert row["var_pop"] == __import__("pytest").approx(q.var(), rel=1e-6, abs=1e-9)


_BAG = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
    min_size=1,
    max_size=30,
)


@given(bag=_BAG)
@_SETTINGS
def test_gini_diversity_closed_form_on_random_bags(spark, bag):
    import os
    import tempfile

    from changedatacapture_spark.queries import SPARK_QUERIES

    work = tempfile.mkdtemp(prefix="gini_prop_")
    docs = spark.createDataFrame(
        [(0, " ".join(bag), "en", len(" ".join(bag)))],
        "doc_id long, text string, lang string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(os.path.join(work, "documents.parquet"))
    row = SPARK_QUERIES["text_gini_diversity"](spark, work).collect()[0]
    n = len(bag)
    counts = {t: bag.count(t) for t in set(bag)}
    expected = (n * n - sum(c * c for c in counts.values())) / (n * n)
    assert row["n_tokens"] == n
    assert row["gini"] == __import__("pytest").approx(expected, rel=1e-12)
    assert 0.0 <= row["gini"] < 1.0


_SERIES = st.lists(
    st.integers(min_value=0, max_value=50), min_size=1, max_size=40
)


@given(series=_SERIES)
@_SETTINGS
def test_cusum_prefix_min_equals_sequential_on_random_series(spark, series):
    """Feed a synthetic per-minute count series through the same
    prefix-min construction the registered query uses and compare to
    the sequential recursion."""
    import datetime as dt

    from pyspark.sql.window import Window

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("t", t0 + dt.timedelta(minutes=i), int(n))
        for i, n in enumerate(series)
    ]
    m = spark.createDataFrame(rows, "event_type string, minute timestamp, n long")
    k = m.groupBy("event_type").agg(
        F.expr("CAST(1000 * sum(n) AS BIGINT) DIV count(*)").alias("k_milli")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = m.join(k, "event_type").withColumn(
        "pref", F.sum(1000 * F.col("n") - F.col("k_milli")).over(w)
    )
    got = {
        r["minute"]: r["cusum"]
        for r in p.withColumn(
            "cusum",
            F.col("pref")
            - F.least(F.lit(0).cast("long"), F.min("pref").over(w)),
        ).collect()
    }
    km = 1000 * sum(series) // len(series)
    s = 0
    for i, n in enumerate(series):
        s = max(0, s + 1000 * n - km)
        assert got[t0 + dt.timedelta(minutes=i)] == s
