"""Regression tests for the round-9 ADVICE findings.

1. graph.py — the per-edge ``rank * w`` product must survive edge
   weights past int64/RANK_SCALE ≈ 9.2e6 (sf1000-scale lineitem counts
   per nation pair).  The product is widened to DECIMAL(38,0) on the
   Spark side and HUGEINT on the DuckDB side; both floor-divide the
   exact product.
2. graph.py — ``pagerank`` must not leave its internal edge cache
   pinned in the session's CacheManager after it returns.
3. stats.py — ``cv`` / ``corr`` denominators are NULLIF-guarded in
   BOTH expression trees so zero-mean / constant-valued groups emit
   NULL in Spark AND DuckDB (unguarded, Spark's double x/0.0 is NULL
   while DuckDB's is Inf/NaN — a silent oracle divergence).
4. dedup.py — the length-bucket block key uses integer ``DIV``, not a
   truncated double quotient (IEEE rounding can lift a quotient just
   below an integer UP to it, silently moving a doc across buckets).
"""

from __future__ import annotations

import math

import pytest


# ------------------------------------------------- 1. wide edge weights

def _pagerank_python(edges, n_iter=2, d=85):
    from changedatacapture_spark.operators.graph import RANK_SCALE

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    n = len(nodes)
    base = RANK_SCALE * (100 - d) // 100 // n
    rank = {v: RANK_SCALE // n for v in nodes}
    outw: dict = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    for _ in range(n_iter):
        contrib = dict.fromkeys(nodes, 0)
        for s, t, w in edges:
            contrib[t] += rank[s] * w // outw[s]  # python ints: exact
        rank = {v: base + d * contrib[v] // 100 for v in nodes}
    return rank


WIDE_EDGES = [
    # weights around 1e10 — far past the old int64 bound of ~9.2e6
    ("a", "b", 10_000_000_000),
    ("b", "c", 7_000_000_003),
    ("c", "a", 12_345_678_901),
    ("a", "c", 1),  # mixed magnitude on one src: outw > w matters
]


def test_pagerank_survives_wide_edge_weights(spark):
    """rank*w at w=1e10 overflows int64 (ANSI error / silent wrap);
    the DECIMAL(38,0) widening must instead produce the exact integer
    recursion that arbitrary-precision Python computes."""
    from changedatacapture_spark.operators.graph import pagerank

    df = spark.createDataFrame(WIDE_EDGES, "src string, dst string, w long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, n_iter=2).collect()}
    assert got == _pagerank_python(WIDE_EDGES, n_iter=2)


def test_pagerank_oracle_sql_survives_wide_edge_weights(spark):
    """The DuckDB twin must widen identically (HUGEINT): same scaled
    ranks on the same wide-weight graph, engine-exact."""
    import duckdb

    from changedatacapture_spark.operators.graph import (
        pagerank,
        pagerank_oracle_sql,
    )

    cte = " UNION ALL ".join(
        f"SELECT '{s}' AS src, '{t}' AS dst, CAST({w} AS BIGINT) AS w"
        for s, t, w in WIDE_EDGES
    )
    oracle = {
        r[0]: r[1]
        for r in duckdb.sql(pagerank_oracle_sql(cte, n_iter=2)).fetchall()
    }
    df = spark.createDataFrame(WIDE_EDGES, "src string, dst string, w long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, n_iter=2).collect()}
    assert got == oracle


# ------------------------------------------------- 2. cache release

def test_pagerank_releases_edge_cache(spark):
    from changedatacapture_spark.operators.graph import pagerank

    spark.catalog.clearCache()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    df = spark.createDataFrame(
        [("a", "b", 3), ("b", "a", 2)], "src string, dst string, w long"
    )
    result = pagerank(df, n_iter=2)
    rows = result.collect()
    assert len(rows) == 2
    assert cache_mgr.isEmpty(), (
        "pagerank must unpersist its internal edge cache before returning"
    )


# ------------------------------------------------- 3. NULLIF guards

def test_numeric_profile_zero_mean_cv_is_null_in_both_engines(spark):
    import duckdb
    import pandas as pd

    from changedatacapture_spark.operators.stats import numeric_profile

    pdf = pd.DataFrame(
        {
            "event_type": ["z", "z", "ok", "ok"],
            "value": [1.0, -1.0, 2.0, 4.0],  # group z: mean exactly 0
        }
    )
    df = spark.createDataFrame(pdf)
    got = {r["event_type"]: r for r in numeric_profile(df, "event_type", "value").collect()}
    assert got["z"]["cv"] is None
    assert got["ok"]["cv"] == pytest.approx(1.0 / 3.0)
    # the registered oracle tree on the same rows agrees
    from changedatacapture_spark.queries import ORACLE_SQL

    con = duckdb.connect()
    con.register("events", pdf)
    orc = {
        r[0]: r
        for r in con.execute(ORACLE_SQL["events_numeric_profile"]).fetchall()
    }
    assert orc["z"][-1] is None  # cv is the last column
    assert orc["ok"][-1] == pytest.approx(1.0 / 3.0)


def test_pearson_corr_constant_column_is_null_in_both_engines(spark):
    import duckdb
    import pandas as pd

    from changedatacapture_spark.operators.stats import pearson_corr

    pdf = pd.DataFrame(
        {
            "l_returnflag": ["c", "c", "c", "v", "v", "v"],
            "l_quantity": [5.0, 5.0, 5.0, 1.0, 2.0, 3.0],  # c: constant x
            "l_extendedprice": [1.0, 2.0, 3.0, 2.0, 4.0, 6.0],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        r["l_returnflag"]: r
        for r in pearson_corr(
            df, "l_returnflag", "l_quantity", "l_extendedprice"
        ).collect()
    }
    assert got["c"]["corr"] is None
    assert got["v"]["corr"] == pytest.approx(1.0)
    from changedatacapture_spark.queries import ORACLE_SQL

    con = duckdb.connect()
    con.register("lineitem", pdf)
    orc = {
        r[0]: r
        for r in con.execute(ORACLE_SQL["lineitem_qty_price_corr"]).fetchall()
    }
    assert orc["c"][-1] is None
    assert orc["v"][-1] == pytest.approx(1.0)


# ------------------------------------------- 4. integer length buckets

def test_len_bucket_is_true_integer_division(spark):
    """n_chars = 5e16-1 with bucket 10: the double quotient rounds UP
    to 5e15 and truncates into bucket 5_000_000_000_000_000 — the same
    bucket as n_chars = 5e16 — while true integer division separates
    them.  Identical texts would then produce a distance-0 pair under
    the double path; the DIV path must produce none."""
    from changedatacapture_spark.operators.dedup import edit_distance_pairs

    text = "identical payload " * 10
    docs = spark.createDataFrame(
        [
            (0, text, "en", 49_999_999_999_999_999),
            (1, text, "en", 50_000_000_000_000_000),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    # sanity: the double path really would collide these buckets
    assert int(49_999_999_999_999_999 / 10) == 50_000_000_000_000_000 // 10
    assert 49_999_999_999_999_999 // 10 != 50_000_000_000_000_000 // 10
    pairs = edit_distance_pairs(
        docs, max_distance=25, len_bucket=10, prefix_chars=200
    ).collect()
    assert pairs == []


def test_len_bucket_still_blocks_equal_buckets(spark):
    from changedatacapture_spark.operators.dedup import edit_distance_pairs

    text = "identical payload " * 10
    docs = spark.createDataFrame(
        [(0, text, "en", 95), (1, text, "en", 97)],  # both in bucket 9
        "doc_id long, text string, lang string, n_chars long",
    )
    pairs = edit_distance_pairs(
        docs, max_distance=25, len_bucket=10, prefix_chars=200
    ).collect()
    assert [(p["doc_a"], p["doc_b"], p["edit_distance"]) for p in pairs] == [
        (0, 1, 0)
    ]
