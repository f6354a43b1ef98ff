"""Round-9 extension operators: product quantization, triangle
counting, MAD outliers, declarative data quality, EWMA, inverted
index.

Semantics tests replicate the exact integer recursions in plain
Python (the operators are deterministic by design); plan tests pin
the scale contracts: PQ encode is a zero-shuffle projection, the ADC
join broadcasts probes, triangle joins never go cartesian.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from changedatacapture_spark.plans.inspect import (
    count_exchanges,
    executed_plan,
    has_broadcast_join,
)


# ------------------------------------------------------------------- PQ

def _pq_python_codes(vec, m=8, ks=16, dsub=8):
    import math

    from changedatacapture_spark.operators.similarity import (
        PQ_SCALE,
        pq_codebook,
    )

    xs = [math.floor(float(x) * PQ_SCALE) for x in vec]
    book = pq_codebook(m, ks, dsub)
    codes, luts = [], []
    for j in range(m):
        dl = [
            sum(
                (xs[j * dsub + d] - book[j][c][d]) ** 2
                for d in range(dsub)
            )
            for c in range(ks)
        ]
        codes.append(dl.index(min(dl)))
        luts.append(dl)
    return codes, luts


def _vec(seed, dim=64):
    # deterministic pseudo-vector in [-1, 1)
    return [(((seed * 31 + d) * 2654435761) % 2000) / 1000.0 - 1.0 for d in range(dim)]


def test_pq_encode_matches_python_reference(spark):
    from changedatacapture_spark.operators.similarity import pq_encode

    rows = [(i, _vec(i)) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in pq_encode(df).collect()}
    for i, v in rows:
        codes, luts = _pq_python_codes(v)
        assert list(got[i]["codes"]) == codes, f"vec {i}"
        assert got[i]["dist_scaled"] == sum(min(dl) for dl in luts)


def test_pq_adc_topk_matches_python_reference(spark):
    from changedatacapture_spark.operators.similarity import pq_adc_topk

    rows = [(i, _vec(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = df.filter("vec_id < 2")
    got = {
        (r["probe_id"], r["rk"]): (r["neighbor_id"], r["dist_scaled"])
        for r in pq_adc_topk(df, probes, k=3).collect()
    }
    # python reference ADC
    enc = {i: _pq_python_codes(v)[0] for i, v in rows}
    for p in (0, 1):
        _, lut = _pq_python_codes(rows[p][1])
        scored = sorted(
            (sum(lut[j][enc[i][j]] for j in range(8)), i)
            for i, _ in rows
            if i != p
        )
        for rk in (1, 2, 3):
            d, i = scored[rk - 1]
            assert got[(p, rk)] == (i, d)


def test_pq_encode_is_zero_shuffle_projection(spark, sf_dir):
    from changedatacapture_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["emb_pq_codes"](spark, sf_dir)
    df.collect()
    assert count_exchanges(df) == 0, executed_plan(df)


def test_pq_adc_broadcasts_probe_luts(spark, sf_dir):
    from changedatacapture_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["knn_pq_topk"](spark, sf_dir)
    df.collect()
    assert has_broadcast_join(df), executed_plan(df)


# -------------------------------------------------------------- triangles

def _tri(spark, edges):
    from changedatacapture_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }


def test_triangles_k4_and_path(spark):
    # K4: every node sits in C(3,2) = 3 triangles
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    assert _tri(spark, k4) == {"a": 3, "b": 3, "c": 3, "d": 3}
    # path a-b-c-d: no triangles
    assert _tri(spark, [("a", "b"), ("b", "c"), ("c", "d")]) == {}


def test_triangles_direction_and_duplicate_insensitive(spark):
    # triangle given with mixed directions + duplicate edges + self loop
    edges = [
        ("a", "b"), ("b", "a"), ("c", "b"), ("a", "c"), ("a", "a"),
        ("a", "b"),
        ("c", "d"),  # pendant edge, not in any triangle
    ]
    assert _tri(spark, edges) == {"a": 1, "b": 1, "c": 1}


def test_triangles_plan_has_no_cartesian(spark):
    from changedatacapture_spark.operators.graph import triangle_counts

    # lazy form: the materialized default localCheckpoints, which
    # truncates lineage and would make this assertion vacuous
    edges = spark.createDataFrame(
        [(a, b) for a in "abcde" for b in "abcde" if a < b],
        "src string, dst string",
    )
    df = triangle_counts(edges, materialize=False)
    try:
        df.collect()
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
    finally:
        spark.catalog.clearCache()


def test_triangles_releases_edge_cache(spark, sf_dir):
    from changedatacapture_spark.queries import SPARK_QUERIES

    spark.catalog.clearCache()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    rows = SPARK_QUERIES["graph_triangles_trade"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert cache_mgr.isEmpty(), (
        "triangle_counts must unpersist its edge cache before returning"
    )


# ------------------------------------------------------------------- MAD

def test_mad_profile_hand_values(spark):
    from changedatacapture_spark.operators.stats import mad_profile

    vals = [float(i) for i in range(1, 10)] + [100.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    out = mad_profile(df, "grp", "value").collect()
    assert len(out) == 1
    r = out[0]
    # median of 1..9,100 -> (5+6)/2 = 5.5; devs sorted -> middle 2.5
    assert r["n"] == 10
    assert r["median_value"] == pytest.approx(5.5)
    assert r["mad_value"] == pytest.approx(2.5)
    # cutoff 4.4478 * 2.5 = 11.1195 -> only |100 - 5.5| exceeds it
    assert r["n_outliers"] == 1
    assert r["outlier_ppm"] == 100_000


def test_mad_profile_constant_group_no_outliers(spark):
    from changedatacapture_spark.operators.stats import mad_profile

    df = spark.createDataFrame(
        [("g", 7.0)] * 5, "grp string, value double"
    )
    r = mad_profile(df, "grp", "value").collect()[0]
    assert r["mad_value"] == 0.0 and r["n_outliers"] == 0


# -------------------------------------------------------------------- DQ

def test_dq_rules_count_violations_exactly(spark):
    from changedatacapture_spark.operators.dq import (
        check_referential,
        check_rules,
    )

    rows = [
        (1, 1, 5.0, "A"),
        (1, 2, -3.0, "A"),   # range violation (min 0)
        (2, 1, None, "X"),   # accepted violation; null value NOT a range hit
        (2, 1, 2.0, "A"),    # duplicate (2, 1) key
        (None, 1, 99.0, "A"),  # null key + range violation (max 50)
    ]
    df = spark.createDataFrame(rows, "k long, ln long, v double, f string")
    rep = {
        r["check_id"]: r
        for r in check_rules(
            df,
            "t",
            [
                {"id": "k_nn", "type": "not_null", "col": "k"},
                {"id": "v_rng", "type": "range", "col": "v",
                 "min": 0.0, "max": 50.0},
                {"id": "f_acc", "type": "accepted", "col": "f",
                 "values": ["A", "B"]},
                {"id": "pk", "type": "unique", "cols": ["k", "ln"]},
            ],
        ).collect()
    }
    assert rep["k_nn"]["n_violations"] == 1 and rep["k_nn"]["passed"] == 0
    assert rep["v_rng"]["n_violations"] == 2  # -3 and 99; null not counted
    assert rep["f_acc"]["n_violations"] == 1
    # distinct non-null keys: (1,1),(1,2),(2,1) = 3; count_distinct
    # drops the null-key row, so violations = 5 - 3 = 2
    assert rep["pk"]["n_violations"] == 2
    assert all(r["n_rows"] == 5 for r in rep.values())

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    ri = check_referential(
        df.filter("k IS NOT NULL"), "k", parent, "pk", "ri", "t.k->p.pk"
    ).collect()[0]
    assert ri["n_violations"] == 0 and ri["passed"] == 1
    parent2 = spark.createDataFrame([(1,)], "pk long")
    ri2 = check_referential(
        df.filter("k IS NOT NULL"), "k", parent2, "pk", "ri", "t.k->p.pk"
    ).collect()[0]
    assert ri2["n_violations"] == 2  # the two k=2 rows are orphans


def test_dq_row_rules_are_one_scan(spark, sf_dir):
    """All six lineitem rules must evaluate in a single aggregate over
    a single scan — rule count must not multiply scans."""
    from changedatacapture_spark.operators.dq import check_rules
    from changedatacapture_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", sf_dir)
    rep = check_rules(
        li,
        "lineitem",
        [
            {"id": "a", "type": "not_null", "col": "l_orderkey"},
            {"id": "b", "type": "range", "col": "l_quantity",
             "min": 1.0, "max": 50.0},
            {"id": "c", "type": "accepted", "col": "l_returnflag",
             "values": ["A", "N", "R"]},
        ],
    )
    rep.collect()
    plan = executed_plan(rep)
    assert plan.count("Scan parquet") <= 1, plan
    assert "partial" in plan.lower()


# ------------------------------------------------------------------ EWMA

def _events_dir(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    df.write.parquet(os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def test_ewma_weighted_lag_sum(spark, tmp_path):
    from changedatacapture_spark.queries import SPARK_QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    # minute m has m+1 events of type 'a': counts 1, 2, 3
    for m in range(3):
        for _ in range(m + 1):
            rows.append((i, t0 + dt.timedelta(minutes=m), 1, "a", 1.0))
            i += 1
    out = {
        r["minute"].minute: r
        for r in SPARK_QUERIES["events_ewma"](
            spark, _events_dir(spark, tmp_path, rows)
        ).collect()
    }
    assert out[0]["ewma_scaled"] == 1 * 512
    assert out[1]["ewma_scaled"] == 2 * 512 + 1 * 256
    assert out[2]["ewma_scaled"] == 3 * 512 + 2 * 256 + 1 * 128
    assert out[2]["ewma"] == pytest.approx((3 * 512 + 2 * 256 + 128) / 1023.0)


# -------------------------------------------------------------- inverted

def test_inverted_index_caps_postings_keeps_true_df(spark, tmp_path):
    from changedatacapture_spark.queries import SPARK_QUERIES

    docs = spark.createDataFrame(
        [(i, "common word", "en", 11) for i in range(120)]
        + [(200 + i, "rare thing", "en", 10) for i in range(5)]
        + [(300, "single once", "en", 11)],
        "doc_id long, text string, lang string, n_chars long",
    )
    docs.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = {
        r["token"]: r
        for r in SPARK_QUERIES["text_inverted_index"](
            spark, str(tmp_path)
        ).collect()
    }
    # df < 5 tokens dropped entirely
    assert set(out) == {"common", "word", "rare", "thing"}
    assert out["common"]["df_count"] == 120
    postings = out["common"]["postings"].split(",")
    assert len(postings) == 100  # capped
    assert postings == [str(i) for i in range(100)]  # smallest, sorted
    assert out["rare"]["postings"] == "200,201,202,203,204"


# ------------------------------------------------------------ PQ fit

def _trunc_div(a: int, b: int) -> int:
    # both engines truncate integer division toward zero
    q = abs(a) // b
    return q if a >= 0 else -q


def _fit_python(rows, m, ks, dsub, n_iter):
    import math

    from changedatacapture_spark.operators.similarity import PQ_SCALE

    xs = {
        i: [math.floor(float(x) * PQ_SCALE) for x in v] for i, v in rows
    }
    ids = sorted(xs)
    book = [
        [list(xs[ids[c]][j * dsub : (j + 1) * dsub]) for c in range(ks)]
        for j in range(m)
    ]
    for _ in range(n_iter):
        sums: dict = {}
        for i in ids:
            for j in range(m):
                sub = xs[i][j * dsub : (j + 1) * dsub]
                dl = [
                    sum((sub[d] - book[j][c][d]) ** 2 for d in range(dsub))
                    for c in range(ks)
                ]
                code = dl.index(min(dl))
                key = (j, code)
                acc = sums.setdefault(key, [0] * (dsub + 1))
                for d in range(dsub):
                    acc[d] += sub[d]
                acc[dsub] += 1
        for (j, c), acc in sums.items():
            if acc[dsub]:
                book[j][c] = [
                    _trunc_div(acc[d], acc[dsub]) for d in range(dsub)
                ]
        # cells absent from sums keep their previous centroid
    return book


def test_pq_fit_codebook_matches_python_recursion(spark):
    from changedatacapture_spark.operators.similarity import pq_fit_codebook

    rows = [(i, _vec(i + 100)) for i in range(24)]  # > ks=16 vectors
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = pq_fit_codebook(df, m=8, ks=16, n_iter=2)
    want = _fit_python(rows, m=8, ks=16, dsub=8, n_iter=2)
    assert got == want


def test_pq_fit_requires_enough_seed_vectors(spark):
    from changedatacapture_spark.operators.similarity import pq_fit_codebook

    df = spark.createDataFrame(
        [(i, _vec(i)) for i in range(5)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="seed"):
        pq_fit_codebook(df, m=8, ks=16, n_iter=1)


def test_pq_fitted_beats_lcg_recall(spark, sf_dir):
    """The whole point of the fit: on real(istic) embeddings the
    fitted codebook must strictly improve ADC recall@5 over the LCG
    stand-in at the registered (m, ks)."""
    from changedatacapture_spark.operators.similarity import (
        cosine_topk,
        pq_adc_topk,
        pq_fit_codebook,
    )
    from changedatacapture_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    probes = emb.filter("vec_id < 10")
    brute = cosine_topk(emb, probes, k=5).select("probe_id", "neighbor_id")

    def hits(book):
        pq = pq_adc_topk(
            emb, probes, k=5, m=32, ks=16, book=book
        ).select(
            F.col("probe_id").alias("pp"), F.col("neighbor_id").alias("pn")
        )
        return brute.join(
            pq,
            (F.col("probe_id") == F.col("pp"))
            & (F.col("neighbor_id") == F.col("pn")),
        ).count()

    fitted = hits(pq_fit_codebook(emb, m=32, ks=16, n_iter=2))
    lcg = hits(None)
    assert fitted > lcg, (fitted, lcg)


# --------------------------------------------------------- curation e2e

def test_curation_e2e_stage_semantics(spark, tmp_path):
    from changedatacapture_spark.queries import SPARK_QUERIES

    bench = ("the benchmark secret passage that nobody should train on "
             "ever again because it is held out ") * 3
    good_dup = "charlie delta echo foxtrot golf hotel india juliet " * 4
    contaminated = ("prefix words here " + bench[:60]
                    + " plus plenty of ordinary trailing words to pass the"
                      " minimum length quality gate easily")
    big_a = "alpha " * 300 + "x"      # 301 tokens, source sA
    big_b = "bravo " * 600 + "y"      # 601 tokens, source sA (budget victim)
    small_c = "whisky tango foxtrot uniform " * 8  # source sB

    rows = [
        (0, bench, "bench", "en"),            # held-out (doc_id < 100)
        (100, "too short", "sC", "en"),       # quality: length
        (101, "1234567890 " * 12, "sC", "en"),  # quality: alpha ratio
        (102, good_dup, "sC", "en"),
        (103, good_dup, "sC", "en"),          # exact dup of 102
        (104, contaminated, "sC", "en"),      # shares a 40-gram with bench
        (105, big_a, "sA", "en"),
        (106, big_b, "sA", "en"),             # same source, over budget
        (107, small_c, "sB", "en"),
    ]
    df = spark.createDataFrame(
        [(i, t, s, lang, len(t)) for i, t, s, lang in rows],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    df.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in SPARK_QUERIES["curation_e2e"](spark, str(tmp_path)).collect()
    }
    toks = {i: len(t.split(" ")) for i, t, _, _ in rows}

    def mass(ids):
        return (len(ids), sum(toks[i] for i in ids))

    assert out["0_corpus"] == mass([100, 101, 102, 103, 104, 105, 106, 107])
    assert out["1_quality"] == mass([102, 103, 104, 105, 106, 107])
    assert out["2_dedup"] == mass([102, 104, 105, 106, 107])
    assert out["3_decontam"] == mass([102, 105, 106, 107])
    assert out["4_budget"] == mass([102, 105, 107])
    split_rows = [v for k, v in out.items() if k.startswith("5_")]
    assert sum(v[0] for v in split_rows) == out["4_budget"][0]
    assert sum(v[1] for v in split_rows) == out["4_budget"][1]


# --------------------------------------------------------- k-anonymity

def test_k_anonymity_flags_small_cells_only(spark, tmp_path):
    from changedatacapture_spark.queries import SPARK_QUERIES

    rows = []
    k = 0
    for _ in range(4):   # cell (1, 'A', 0): 4 occupants -> flagged
        rows.append((k, f"c{k}", 1, 500.0, "A")); k += 1
    for _ in range(5):   # cell (2, 'B', 1): 5 occupants -> safe
        rows.append((k, f"c{k}", 2, 1500.0, "B")); k += 1
    rows.append((k, f"c{k}", 3, -500.0, "C")); k += 1  # negative bal -> bucket -1 (floor div)
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long,"
              " c_acctbal double, c_mktsegment string"
    )
    df.write.parquet(os.path.join(str(tmp_path), "customer.parquet"))
    out = {
        (r["c_nationkey"], r["c_mktsegment"], r["bal_bucket"]): r["group_size"]
        for r in SPARK_QUERIES["privacy_k_anonymity"](
            spark, str(tmp_path)
        ).collect()
    }
    # floor division (the ADVICE band-width fix) puts negative
    # balances in their own uniform 1000-wide band below zero
    assert out == {(1, "A", 0): 4, (3, "C", -1): 1}


# ------------------------------------------------------------ aHash

def test_average_hash_integer_threshold():
    from changedatacapture_spark.operators.multimodal import average_hash

    # pixels [0, 10, 20, 30]: sum 60, n 4 -> bit set iff px*4 > 60,
    # i.e. px > mean 15: pixels 20 and 30 (bits 2 and 3)
    assert average_hash(bytes([0, 10, 20, 30])) == 0b1100
    # constant image: px*n == sum everywhere -> no bits (strict >)
    assert average_hash(bytes([7] * 8)) == 0
    # single bright pixel
    assert average_hash(bytes([0, 0, 0, 255])) == 0b1000


def test_bmp_ahash_roundtrip_matches_pure_python(spark):
    from changedatacapture_spark.operators.multimodal import (
        _bmp_raster,
        average_hash,
        bmp_ahash,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    got = {r["doc_id"]: r["ahash"] for r in bmp_ahash(docs).collect()}
    # the decode round-trip must reproduce the raster exactly — any
    # padding/row-order bug would scramble pixel positions and flip bits
    want = {i: average_hash(_bmp_raster(i)) for i in range(12)}
    assert got == want


# ------------------------------------------------- incremental join MV

def test_join_view_apply_delta_rule(spark):
    """Updates retract the old joined row, deletes remove it, inserts
    join the dimension — after two batches the view must equal the
    full recompute from the final fact state."""
    from changedatacapture_spark.operators.cdc import join_view_apply

    dim = spark.createDataFrame(
        [(1, "red"), (2, "blue"), (3, "green")], "dk long, color string"
    )
    cond = F.col("dk") == F.col("jk")
    b1 = spark.createDataFrame(
        [(10, "c", 1, 100.0), (20, "c", 2, 200.0), (30, "c", 3, 300.0)],
        "k long, op string, jk long, v double",
    )
    mv = (
        b1.filter("op <> 'd'").drop("op").join(dim, cond)
        .select("k", "v", "color")
    )
    # batch 2: update 10 (moves from red to blue), delete 20, insert 40
    b2 = spark.createDataFrame(
        [(10, "u", 2, 111.0), (20, "d", 2, 0.0), (40, "c", 1, 400.0)],
        "k long, op string, jk long, v double",
    )
    mv2 = join_view_apply(mv, b2, dim, ["k"], cond)
    got = {(r["k"], r["v"], r["color"]) for r in mv2.collect()}
    assert got == {
        (10, 111.0, "blue"),
        (30, 300.0, "green"),
        (40, 400.0, "red"),
    }


def test_join_view_apply_retraction_broadcasts_batch_keys(spark):
    from changedatacapture_spark.operators.cdc import join_view_apply

    dim = spark.createDataFrame([(1, "red")], "dk long, color string")
    mv = spark.createDataFrame([(10, 1.0, "red")], "k long, v double, color string")
    batch = spark.createDataFrame(
        [(10, "u", 1, 2.0)], "k long, op string, jk long, v double"
    )
    out = join_view_apply(mv, batch, dim, ["k"], F.col("dk") == F.col("jk"))
    out.collect()
    assert has_broadcast_join(out), executed_plan(out)


# ----------------------------------------------------------- IVF + PQ

def test_ivfpq_results_respect_cell_restriction(spark, sf_dir):
    """Every returned neighbor must live in one of its probe's top-2
    IVF cells, and its ADC distance must match the full-PQ scorer
    (same codebook) for that pair."""
    from changedatacapture_spark.operators.similarity import (
        ivf_cell_scores,
        pq_adc_topk,
        pq_fit_codebook,
    )
    from changedatacapture_spark.queries import SPARK_QUERIES
    from changedatacapture_spark.sources.tables import load_table

    out = SPARK_QUERIES["knn_ivfpq_topk"](spark, sf_dir).collect()
    assert len(out) > 0 and all(r["rk"] <= 5 for r in out)

    emb = load_table(spark, "embeddings", sf_dir)
    cs = ivf_cell_scores("embedding", 8, 64)
    cells = {
        r["vec_id"]: (r["cell"], list(r["cs"]))
        for r in emb.select(
            "vec_id",
            (F.array_position(cs, F.array_max(cs)) - 1).cast("int").alias("cell"),
            cs.alias("cs"),
        ).collect()
    }
    for r in out:
        scores = cells[r["probe_id"]][1]
        top2 = sorted(range(8), key=lambda c: (-scores[c], c))[:2]
        assert cells[r["neighbor_id"]][0] in top2, r

    # distances agree with the unrestricted PQ scorer on shared pairs
    book = pq_fit_codebook(
        emb.filter("vec_id % 4 = 0"), m=32, ks=16, n_iter=2
    )
    full = {
        (r["probe_id"], r["neighbor_id"]): r["dist_scaled"]
        for r in pq_adc_topk(
            emb, emb.filter("vec_id < 10"), k=500, m=32, ks=16, book=book
        ).collect()
    }
    for r in out:
        key = (r["probe_id"], r["neighbor_id"])
        if key in full:
            assert full[key] == r["dist_scaled"], r


def test_ivfpq_plan_is_broadcast_equi_join(spark, sf_dir):
    from changedatacapture_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["knn_ivfpq_topk"](spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert has_broadcast_join(df), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# ------------------------------------------------------ column profile

def test_profile_columns_counts(spark):
    from changedatacapture_spark.operators.dq import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (1, None), (2, "b"), (None, "b")], "k long, s string"
    )
    out = {
        r["col_name"]: r
        for r in profile_columns(df, ["k", "s"], "t").collect()
    }
    assert out["t.k"]["n_rows"] == 4
    assert out["t.k"]["n_null"] == 1
    assert out["t.k"]["n_distinct"] == 2
    assert out["t.s"]["n_null"] == 1
    assert out["t.s"]["n_distinct"] == 2


def test_profile_columns_single_scan(spark, sf_dir):
    from changedatacapture_spark.operators.dq import profile_columns
    from changedatacapture_spark.sources.tables import load_table

    rep = profile_columns(
        load_table(spark, "orders", sf_dir), ["o_orderkey", "o_custkey"], "o"
    )
    rep.collect()
    plan = executed_plan(rep)
    assert plan.count("Scan parquet") <= 1, plan
