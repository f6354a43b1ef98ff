"""Round-8 extension operators: portable statistics, PageRank,
blocked edit-distance dedup.

Semantics tests replicate the exact integer/decimal recursions in
plain Python (not approximately — the operators are DETERMINISTIC by
design, so the tests can assert equality on the scaled integers) and
check the float finals against numpy within quantization error.
Plan tests pin the scale contract: one partial-aggregate shuffle for
the moment sums, broadcast rank vector for PageRank, and no cartesian
product in the blocked edit-distance join.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from changedatacapture_spark.plans.inspect import (
    count_exchanges,
    executed_plan,
    has_broadcast_join,
)


# ---------------------------------------------------------------- stats

def _events(spark, sf_dir):
    from changedatacapture_spark.sources.tables import load_table

    return load_table(spark, "events", sf_dir)


def test_numeric_profile_matches_numpy(spark, sf_dir):
    import numpy as np

    from changedatacapture_spark.operators.stats import numeric_profile

    ev = _events(spark, sf_dir)
    got = {
        r["event_type"]: r
        for r in numeric_profile(ev, "event_type", "value").collect()
    }
    rows = ev.select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        # the operator quantizes to 1e-6 before aggregating; replicate
        by_type.setdefault(r["event_type"], []).append(
            math.floor(r["value"] * 1_000_000) / 1_000_000
        )
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        a = np.array(vals)
        g = got[t]
        assert g["n"] == len(vals)
        assert g["min_value"] == pytest.approx(a.min(), abs=1e-9)
        assert g["max_value"] == pytest.approx(a.max(), abs=1e-9)
        assert g["mean_value"] == pytest.approx(a.mean(), rel=1e-12)
        assert g["var_pop"] == pytest.approx(a.var(), rel=1e-9)
        assert g["stddev_pop"] == pytest.approx(a.std(), rel=1e-9)
        assert g["cv"] == pytest.approx(a.std() / a.mean(), rel=1e-9)


def test_numeric_profile_is_one_partial_aggregate(spark, sf_dir):
    from changedatacapture_spark.operators.stats import numeric_profile

    df = numeric_profile(_events(spark, sf_dir), "event_type", "value")
    df.collect()
    plan = executed_plan(df)
    assert count_exchanges(df) == 1, plan
    assert "partial" in plan.lower(), "moment sums must combine map-side"


def test_pearson_corr_matches_numpy(spark, sf_dir):
    import numpy as np

    from changedatacapture_spark.operators.stats import pearson_corr
    from changedatacapture_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", sf_dir)
    got = {
        r["l_returnflag"]: r
        for r in pearson_corr(
            li, "l_returnflag", "l_quantity", "l_extendedprice"
        ).collect()
    }
    rows = li.select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(
            (
                math.floor(r["l_quantity"] * 1_000_000) / 1_000_000,
                math.floor(r["l_extendedprice"] * 1_000_000) / 1_000_000,
            )
        )
    for flag, pairs in by_flag.items():
        x = np.array([p[0] for p in pairs])
        y = np.array([p[1] for p in pairs])
        g = got[flag]
        assert g["n"] == len(pairs)
        assert g["cov_pop"] == pytest.approx(
            ((x - x.mean()) * (y - y.mean())).mean(), rel=1e-6
        )
        assert g["corr"] == pytest.approx(np.corrcoef(x, y)[0, 1], rel=1e-9)


# -------------------------------------------------------------- pagerank

def _pagerank_python(edges: list[tuple[str, str, int]], n_iter=2, d=85):
    """Reference implementation of the exact integer recursion."""
    from changedatacapture_spark.operators.graph import RANK_SCALE

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    n = len(nodes)
    base = RANK_SCALE * (100 - d) // 100 // n
    rank = {v: RANK_SCALE // n for v in nodes}
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    for _ in range(n_iter):
        contrib = dict.fromkeys(nodes, 0)
        for s, t, w in edges:
            contrib[t] += rank[s] * w // outw[s]
        rank = {v: base + d * contrib[v] // 100 for v in nodes}
    return rank


@pytest.mark.parametrize(
    "edges",
    [
        # symmetric triangle: uniform rank is the exact fixed point
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)],
        # weighted, with a sink-ish node and a multi-out hub
        [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 5),
         ("d", "a", 7)],
    ],
)
def test_pagerank_matches_integer_reference(spark, edges):
    from changedatacapture_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, n_iter=2).collect()}
    assert got == _pagerank_python(edges, n_iter=2)


def test_pagerank_broadcasts_rank_vector(spark, sf_dir):
    from changedatacapture_spark.operators.graph import pagerank
    from changedatacapture_spark.queries import SPARK_QUERIES

    # plan shape on the lazy form (the materialized default local-
    # checkpoints, which truncates lineage and hides the join)
    edges = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 2), ("c", "a", 5)],
        "src string, dst string, w long",
    )
    lazy = pagerank(edges, n_iter=2, materialize=False)
    try:
        lazy.collect()
        assert has_broadcast_join(lazy), (
            "rank vector must broadcast to the edge join"
        )
    finally:
        edges.unpersist()

    rows = SPARK_QUERIES["graph_pagerank_trade"](spark, sf_dir).collect()
    # rank mass: teleport is exact; floor division only ever LOSES mass
    from changedatacapture_spark.operators.graph import RANK_SCALE

    total = sum(r["rank_scaled"] for r in rows)
    assert total <= RANK_SCALE
    assert total >= RANK_SCALE * 98 // 100, "over 2% of rank mass lost"


# -------------------------------------------------- edit-distance dedup

def _docs(spark, rows):
    return spark.createDataFrame(
        [
            (i, text, lang, len(text))
            for i, (text, lang) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, n_chars long",
    )


def test_edit_distance_finds_in_block_pair_and_misses_cross_bucket(spark):
    from changedatacapture_spark.operators.dedup import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog " * 3  # 135 chars
    near = base[:-6] + "cat "  # small tail edit, same length bucket
    far_bucket = base + "x" * 80  # same prefix family, bucket differs
    other = "completely different content that shares nothing at all " * 3
    docs = _docs(
        spark,
        [(base, "en"), (near, "en"), (far_bucket, "en"), (other, "en"),
         (base, "de")],  # same text, different lang: must NOT pair
    )
    pairs = edit_distance_pairs(
        docs, max_distance=25, len_bucket=32, prefix_chars=200
    ).collect()
    assert {(p["doc_a"], p["doc_b"]) for p in pairs} == {(0, 1)}
    assert pairs[0]["edit_distance"] > 0


def test_cusum_equals_sequential_recursion(spark, sf_dir):
    """The prefix-min formulation must equal the textbook recursion
    s_i = max(0, s_{i-1} + (x_i - k)) replayed sequentially."""
    from changedatacapture_spark.queries import SPARK_QUERIES
    from changedatacapture_spark.sources.tables import load_table

    got = {
        (r["event_type"], r["minute"]): r["cusum_milli"]
        for r in SPARK_QUERIES["events_cusum_drift"](spark, sf_dir).collect()
    }
    ev = load_table(spark, "events", sf_dir)
    series = (
        ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("minute"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in series:
        by_type.setdefault(r["event_type"], []).append((r["minute"], r["n"]))
    for t, rows in by_type.items():
        rows.sort()
        k = 1000 * sum(n for _, n in rows) // len(rows)
        s = 0
        for minute, n in rows:
            s = max(0, s + 1000 * n - k)
            if s > 0:
                assert got[(t, minute)] == s
            else:
                assert (t, minute) not in got


def test_collocations_perfect_pair_gets_max_lift(spark):
    """A bigram that exhausts both words' occurrences has lift
    n_total / n_xy — the maximum for its support level."""
    docs = spark.createDataFrame(
        [(i, "asteroid belt " + ("common filler words here ") * 3)
         for i in range(6)],
        "doc_id long, text string",
    )
    toks = docs.select(
        F.split(
            F.trim(F.regexp_replace(F.lower("text"), "[^a-z]+", " ")), " "
        ).alias("t")
    )
    big = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t)-2),"
                    " i -> struct(t[i] AS w1, t[i+1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    counts = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    rows = counts.collect()
    n_total = sum(r["n_xy"] for r in rows)
    c1 = sum(r["n_xy"] for r in rows if r["w1"] == "asteroid")
    c2 = sum(r["n_xy"] for r in rows if r["w2"] == "belt")
    n_ab = next(r["n_xy"] for r in rows if (r["w1"], r["w2"]) == ("asteroid", "belt"))
    assert n_ab == 6 and c1 == 6 and c2 == 6
    assert n_ab * n_total / (c1 * c2) == n_total / 6


def test_collocations_marginals_aggregate_not_raw_pairs(spark, sf_dir):
    """The 1-row total must broadcast, and the bigram counts must
    partial-aggregate map-side; marginals join the aggregated
    vocabulary-sized table, never the raw pair stream."""
    from changedatacapture_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["text_collocations_lift"](spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert has_broadcast_join(df), "1-row total should broadcast"
    assert "partial" in plan.lower(), "bigram counts must combine map-side"
    assert "CartesianProduct" not in plan


def test_chunk_overlap_pairs_position_independent(spark):
    """A substring shared at DIFFERENT offsets must still pair — the
    content-defined property fixed-stride windows lack."""
    from changedatacapture_spark.operators.curation import chunk_overlap_pairs

    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    shared = "".join(rng.choice(alpha) for _ in range(400))
    pre_a = "".join(rng.choice(alpha) for _ in range(90))
    pre_b = "".join(rng.choice(alpha) for _ in range(251))  # different phase
    noise = "".join(rng.choice(alpha) for _ in range(600))
    docs = spark.createDataFrame(
        [
            (0, pre_a + shared),
            (1, pre_b + shared),
            (2, noise),
        ],
        "doc_id long, text string",
    )
    pairs = chunk_overlap_pairs(docs).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(0, 1)]
    assert pairs[0]["shared_len"] > 100  # most of the 400-char span


def test_chunk_overlap_hub_guard_drops_boilerplate(spark):
    """A chunk present in more than max_docs_per_chunk documents must
    not contribute pairs (quadratic-bucket guard)."""
    from changedatacapture_spark.operators.curation import chunk_overlap_pairs

    import random

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    boiler = "".join(rng.choice(alpha) for _ in range(300))
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(10)], "doc_id long, text string"
    )
    got = chunk_overlap_pairs(docs, max_docs_per_chunk=5).collect()
    assert got == []


def test_gini_diversity_hand_values(spark):
    from changedatacapture_spark.queries import SPARK_QUERIES
    import os
    import tempfile

    work = tempfile.mkdtemp(prefix="gini_")
    docs = spark.createDataFrame(
        [
            (0, "a a a b", "en", 7),
            (1, "x y z", "en", 5),
            (2, "w w", "en", 3),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )
    docs.write.parquet(os.path.join(work, "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in SPARK_QUERIES["text_gini_diversity"](spark, work).collect()
    }
    # doc 0: n=4, counts {a:3, b:1}, gini = (16 - 10) / 16
    assert out[0]["n_tokens"] == 4 and out[0]["n_distinct"] == 2
    assert out[0]["gini"] == pytest.approx(6 / 16)
    # doc 1: all unique -> (9 - 3) / 9
    assert out[1]["gini"] == pytest.approx(6 / 9)
    # doc 2: single repeated token -> 0
    assert out[2]["gini"] == 0.0


def _events_dir(spark, tmp_path, rows):
    import os

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_funnel_requires_strict_order(spark, tmp_path):
    """A user whose click PRECEDES every view must not count at stage
    2 — the unordered-intersection overcount the operator exists to
    avoid."""
    import datetime as dt

    from changedatacapture_spark.queries import SPARK_QUERIES

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, minute, uid, kind):
        return (i, t0 + dt.timedelta(minutes=minute), uid, kind, 1.0)

    rows = [
        # user 1: view -> click -> purchase (all three stages)
        ev(1, 0, 1, "view"), ev(2, 10, 1, "click"), ev(3, 20, 1, "purchase"),
        # user 2: click BEFORE the only view (stage 1 only)
        ev(4, 0, 2, "click"), ev(5, 10, 2, "view"),
        # user 3: view -> click, purchase BEFORE the click (stage 2 only)
        ev(6, 0, 3, "view"), ev(7, 5, 3, "purchase"), ev(8, 10, 3, "click"),
    ]
    out = {
        r["stage"]: r["n_users"]
        for r in SPARK_QUERIES["events_funnel_sequence"](
            spark, _events_dir(spark, tmp_path, rows)
        ).collect()
    }
    assert out == {
        "view": 3,
        "click_after_view": 2,
        "purchase_after_click": 1,
    }


def test_trimmed_mean_drops_exact_rank_tails(spark, tmp_path):
    """n=40 per group -> floor(40*5/100)=2 rows trimmed per tail; one
    huge outlier must vanish from the mean."""
    import datetime as dt

    from changedatacapture_spark.queries import SPARK_QUERIES

    t0 = dt.datetime(2024, 1, 1)
    # values 1..39 plus an outlier 1e6; trim drops {1, 2} and {39, 1e6}
    vals = [float(i) for i in range(1, 40)] + [1e6]
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "click", v)
        for i, v in enumerate(vals)
    ]
    out = SPARK_QUERIES["events_trimmed_mean"](
        spark, _events_dir(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 1
    kept = [v for v in vals if v not in (1.0, 2.0, 39.0, 1e6)]
    assert out[0]["n_kept"] == 36
    assert out[0]["trimmed_mean"] == pytest.approx(sum(kept) / len(kept))


def test_kmv_set_algebra_small_sets_are_exact(spark, tmp_path):
    """Below k=64 distinct users the sketches ARE the sets, so union /
    Jaccard / intersection estimates must be exact."""
    import datetime as dt

    from changedatacapture_spark.queries import SPARK_QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    # type A: users 0..19; type B: users 10..29  -> |A∪B|=30, |A∩B|=10
    for u in range(20):
        rows.append((i, t0, u, "a", 1.0)); i += 1
    for u in range(10, 30):
        rows.append((i, t0, u, "b", 1.0)); i += 1
    out = SPARK_QUERIES["kmv_set_algebra"](
        spark, _events_dir(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["ta"], r["tb"]) == ("a", "b")
    assert r["n_u"] == 30 and r["union_est"] == 30.0
    assert r["jaccard_est"] == pytest.approx(10 / 30)
    assert r["intersection_est"] == pytest.approx(10.0)


def test_sorted_neighborhood_finds_prefix_neighbors(spark):
    """Docs sharing a long normalized prefix sort adjacent and pair;
    the distributed rank must produce the same candidates a single
    global sort would."""
    from changedatacapture_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    filler = "unrelated filler content " * 4
    docs = spark.createDataFrame(
        [
            (0, "Alpha Beta Gamma Delta record one!"),
            (1, "alpha beta gamma delta record one?"),  # same normalized key
            (2, "zzz totally different " + filler),
            (3, "zzz totally different " + filler + "x"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (p["doc_a"], p["doc_b"]): p["rank_distance"]
        for p in sorted_neighborhood_pairs(docs).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1
    assert (2, 3) in pairs


def test_sorted_neighborhood_rank_is_not_single_partition(spark, sf_dir):
    """The corpus-sized row_number must run hash-partitioned by the
    leading-char bucket; the only single-partition window allowed is
    the running-offset sum over the ~alphabet-sized bucket COUNTS."""
    import re

    from changedatacapture_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["dedup_sorted_neighborhood"](spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    # the per-document rank window is partitioned by the bucket column
    assert re.search(r"row_number\(\) windowspecdefinition\(b#\d+, k#", plan), plan
    assert "Exchange hashpartitioning(b#" in plan, plan
    # at most the offsets aggregate may funnel to one partition
    assert plan.count("Exchange SinglePartition") <= 1, plan


def test_edit_distance_join_is_blocked_not_cartesian(spark, sf_dir):
    from changedatacapture_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["dedup_edit_distance"](spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, (
        "edit-distance join must run on the (lang, length-bucket) equi key:\n"
        + plan
    )
