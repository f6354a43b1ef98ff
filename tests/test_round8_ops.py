"""Round-8 operator semantics: quality-gate quota/threshold laws,
MinHash-estimate calibration, skew-profile conservation, embedding
group closure, and spike-detection invariants. The oracle differential
pins bit-exactness vs DuckDB; these tests add the properties an oracle
can't express (set-selection laws, estimator identities, closure
transitivity on hand-built graphs)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from changedatacapture_spark.queries import SPARK_QUERIES
from changedatacapture_spark.sources.tables import load_table


def test_quality_gate_quota_and_threshold_laws(spark, sf_dir):
    """Per language: (a) at least ceil(n/4) docs pass; (b) removing
    the whole lowest-passing-score tie group would drop below quota
    (the threshold is tight, not slack); (c) every passing score >=
    every failing score (the cut is a clean score threshold)."""
    docs = load_table(spark, "documents", sf_dir)
    score = F.floor(
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")) * 1000
        / F.length("text")
    ).cast("long")
    all_scores = {
        (r.lang, r.doc_id): r.s
        for r in docs.select("lang", "doc_id", score.alias("s")).collect()
    }
    passed = SPARK_QUERIES["text_quality_gate"](spark, sf_dir).collect()
    by_lang_pass: dict[str, list] = {}
    for r in passed:
        by_lang_pass.setdefault(r.lang, []).append(r)
        assert r.score == all_scores[(r.lang, r.doc_id)]
        assert r.score >= r.thr
    langs = {lang for (lang, _d) in all_scores}
    assert set(by_lang_pass) == langs
    for lang in langs:
        scores = sorted(s for (lg, _d), s in all_scores.items() if lg == lang)
        n = len(scores)
        quota = math.ceil(n / 4)
        got = by_lang_pass[lang]
        thr = got[0].thr
        assert all(r.thr == thr for r in got)  # one threshold per lang
        assert len(got) >= quota  # (a)
        above_thr = sum(1 for s in scores if s > thr)
        assert above_thr < quota  # (b) tie group at thr is needed
        max_fail = max((s for s in scores if s < thr), default=None)
        if max_fail is not None:
            assert min(r.score for r in got) > max_fail  # (c)


def test_quality_gate_plan_histogram_not_corpus_sort(spark, sf_dir):
    """The scale claim: the window runs over the (lang, score)
    histogram, never a per-lang sort of documents, and the threshold
    side broadcasts. A Sort above the document scan would mean the
    dominant language's whole slice goes through one sorter."""
    df = SPARK_QUERIES["text_quality_gate"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.lower().count("partial") >= 1, "histogram lost map-side combine"


def test_minhash_est_jaccard_identical_and_disjoint_docs(spark):
    """Estimator identities: byte-identical docs agree on all 4 slots
    (est 100%); the estimate is always a multiple of 25 with n_agree
    in [1, 4] (candidates share >= 1 band = >= 2 agreeing slots is NOT
    guaranteed — one band = 2 slots hash together, so >= 0 agree on
    the other slots; but a shared band forces its own 2 slots equal,
    hence n_agree >= 2 for 2-band/4-hash configs)."""
    from changedatacapture_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(1, "the quick brown fox jumps over the lazy dog")] * 2
    rows = [(1, rows[0][1]), (2, rows[0][1]), (3, "completely different words here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, n_hashes=4, k=5)
    pairs = lsh_candidate_pairs(sigs, n_hashes=4, bands=2, max_bucket_size=500)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(4)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(4)],
    )
    agree = sum(
        (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("long") for i in range(4)
    )
    out = {
        (r.doc_a, r.doc_b): r.n
        for r in pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", agree.alias("n"))
        .collect()
    }
    assert out[(1, 2)] == 4  # identical docs: all slots agree
    for n in out.values():
        assert 2 <= n <= 4  # a shared band pins its 2 slots


def test_est_jaccard_single_signature_scan_via_reuse(spark, sf_dir):
    """The slots ride through the band self-join: after execution the
    adaptive plan must show a ReusedExchange (both join sides served
    by ONE signature scan) — a join-back to the signature table would
    show three document scans."""
    df = SPARK_QUERIES["dedup_minhash_est_jaccard"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, final
    assert final.count("FileScan parquet") == 1, final


def test_single_tokenizing_scan_via_reuse(spark, sf_dir):
    """Corpus-statistic queries must tokenize ONCE: the executed plan
    shows exactly one FileScan of documents — a second scan doubles
    the dominant cost at 100 TB. Where a self-join/score-join is
    involved, both consumers share the gram-key exchange, visible as a
    ReusedExchange (aggregate-then-join-back shapes never reuse:
    column pruning makes the branch exchanges non-identical)."""
    cases = [
        ("text_vocab_coverage", True),
        ("text_rare_bigram_score", True),
        ("text_winnow_pairs", True),
        ("text_boilerplate", False),  # window count: no join, no reuse
        ("text_repetition", False),  # combined explode: single pipeline
        ("curation_funnel", False),  # conditional aggregation
    ]
    for name, expect_reuse in cases:
        df = SPARK_QUERIES[name](spark, sf_dir)
        df.collect()
        final = (
            df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        assert final.count("FileScan parquet") == 1, (name, final)
        if expect_reuse:
            assert "ReusedExchange" in final, (name, final)


def test_skew_profile_share_and_skew_are_consistent(spark, sf_dir):
    """Top-20 rows are count-descending; share_ppm and skew_x1000 obey
    their integer definitions against independently computed totals."""
    prof = SPARK_QUERIES["q_join_skew_profile"](spark, sf_dir).collect()
    assert len(prof) == 20
    counts = [r.n_orders for r in prof]
    assert counts == sorted(counts, reverse=True)
    orders = load_table(spark, "orders", sf_dir)
    total = orders.count()
    n_keys = orders.select("o_custkey").distinct().count()
    for r in prof:
        assert r.share_ppm == r.n_orders * 1_000_000 // total
        assert r.skew_x1000 == r.n_orders * n_keys * 1000 // total


def test_emb_dedup_groups_closure_on_handmade_chain(spark):
    """Transitive closure law on a hand-built chain A~B~C plus an
    isolated pair: every member maps to the component minimum."""
    from changedatacapture_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (77, 99)], "vec_a long, vec_b long"
    )
    got = {
        r.doc_id: r.group_id
        for r in connected_components(pairs, a_col="vec_a", b_col="vec_b").collect()
    }
    assert got == {10: 10, 20: 10, 30: 10, 77: 77, 99: 77}


def test_emb_dedup_groups_consistent_with_pairs(spark, sf_dir):
    """Every near-dup pair's two members land in the same group, and
    every group_id is a member of its own group (canonical ids are
    real vectors, component minima). Pairs use the SAME hub-guard
    parameters as the registered query (round 11 capped the groups
    query's candidate generation — max_bucket_size=20, window=4 — so
    unguarded all-pairs output is a SUPERSET whose extra hot-bucket
    pairs the capped closure legitimately need not merge)."""
    from changedatacapture_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    # params must match the registered query's candidate generation
    pairs = embedding_neardup_pairs(
        emb, threshold_scaled=250_000, n_planes=6, max_bucket_size=20, window=4
    ).collect()
    groups = {
        r.vec_id: r.group_id
        for r in SPARK_QUERIES["emb_dedup_groups"](spark, sf_dir).collect()
    }
    for p in pairs:
        assert groups[p.vec_a] == groups[p.vec_b]
        assert groups[p.vec_a] <= min(p.vec_a, p.vec_b)
    for vec_id, gid in groups.items():
        assert groups[gid] == gid  # canonical id is its own canonical
        assert gid <= vec_id


def test_rolling_active_users_matches_bruteforce(spark, sf_dir):
    """active_7d per day equals the python brute-force over distinct
    (day, user) pairs with a (d-7, d] trailing window."""
    ev = load_table(spark, "events", sf_dir)
    du = {
        (r.day, r.user_id)
        for r in ev.select(
            F.date_trunc("day", "ts").alias("day"), "user_id"
        ).distinct().collect()
    }
    import datetime

    got = {
        r.day: r.active_7d
        for r in SPARK_QUERIES["events_rolling_active_users"](
            spark, sf_dir
        ).collect()
    }
    days = {d for d, _u in du}
    assert set(got) == days
    for d in days:
        lo = d - datetime.timedelta(days=7)
        want = len({u for (dd, u) in du if lo < dd <= d})
        assert got[d] == want, d


def test_grouping_sets_single_scan_expand(spark, sf_dir):
    """Three breakdowns in one scan: the plan must contain exactly one
    Expand over one FileScan with map-side partial aggregation — three
    separate GROUP BYs would be three scans of a 100 TB table."""
    df = SPARK_QUERIES["q_grouping_sets_lineitem"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1, plan
    assert plan.count("FileScan") == 1, plan
    assert "partial" in plan.lower(), "grouping sets lost map-side combine"


def test_histogram_quantiles_bracket_exact_percentiles(spark, sf_dir):
    """The bucket quantile must BRACKET the exact percentile: exact
    p_q lies in [bucket, bucket+1) for unit buckets (values < 1000).
    Computed against a python sort of the raw values."""
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    by_type: dict[str, list] = {}
    for r in ev.collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    out = SPARK_QUERIES["events_value_histogram_quantiles"](
        spark, sf_dir
    ).collect()
    assert {r.event_type for r in out} == set(by_type)
    for r in out:
        vals = sorted(by_type[r.event_type])
        n = len(vals)
        assert r.n_events == n
        for q, bucket in ((0.5, r.p50_bucket), (0.9, r.p90_bucket),
                          (0.99, r.p99_bucket)):
            # smallest index with cum >= ceil(q*n)  (1-based rank)
            import math

            rank = math.ceil(q * n)
            exact = vals[rank - 1]
            assert bucket <= exact < bucket + 1, (r.event_type, q, bucket, exact)


def test_dedup_corpus_stats_conserves_survivors(spark, sf_dir):
    """Corpus stats must agree with the per-doc survivor verdict:
    sum(n_kept) == number of keep=1 docs, chars conserve, and
    kept_ppm follows its integer definition."""
    stats = SPARK_QUERIES["dedup_corpus_stats"](spark, sf_dir).collect()
    surv = SPARK_QUERIES["dedup_survivors"](spark, sf_dir).collect()
    assert sum(r.n_kept for r in stats) == sum(r.keep for r in surv)
    assert sum(r.n_docs for r in stats) == len(surv)
    assert sum(r.chars_total for r in stats) == sum(r.n_chars for r in surv)
    for r in stats:
        assert r.kept_ppm == r.n_kept * 1_000_000 // r.n_docs
        assert 0 < r.n_kept <= r.n_docs


def test_bucketed_join_has_no_join_side_exchange(spark, sf_dir):
    """The whole point of bucketed tables: the sort-merge join reads
    co-located buckets with ZERO exchanges on either join side — the
    only exchange in the plan is the final small groupBy. The scan
    must show bucket selection."""
    df = SPARK_QUERIES["q_bucketed_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Bucketed: true" in plan, plan


def test_int8_quantization_laws(spark, sf_dir):
    """Codes bound to [-127, 127]; every vector's largest-magnitude
    component maps to exactly +/-127; signs preserved."""
    out = SPARK_QUERIES["emb_quantize_int8"](spark, sf_dir)
    lo, hi = out.agg(F.min("q"), F.max("q")).first()
    assert -127 <= lo and hi <= 127
    per_vec = out.groupBy("vec_id").agg(
        F.max(F.abs(F.col("q"))).alias("mx")
    )
    assert per_vec.filter(F.col("mx") != 127).count() == 0
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.posexplode("embedding").alias("dim_idx", "x")
    )
    joined = out.join(emb, ["vec_id", "dim_idx"])
    assert joined.filter(F.signum("q") * F.signum("x") < 0).count() == 0


def test_minute_spikes_flags_handmade_burst(spark, tmp_path):
    """A flat 10-events/minute series with one 100-event minute must
    flag exactly that minute; a uniform series flags nothing."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for minute in range(30):
        n = 100 if minute == 25 else 10
        for i in range(n):
            rows.append(
                (eid, base + datetime.timedelta(minutes=minute, seconds=i % 60),
                 1, "burst", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    path = str(tmp_path / "ev")
    df.write.parquet(path + "/events.parquet")
    out = SPARK_QUERIES["events_minute_spikes"](spark, path).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 100 and r.cnt_prev == 25 and r.sum_prev == 250


def test_bmp_round_trip_all_paddings():
    """encode->decode identity across every width in the corpus table —
    paddings 2/3/0 bytes, heights 12..2 — plus a non-divisor width."""
    from changedatacapture_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp,
    )

    for w in (2, 3, 4, 6, 8, 12):
        h = 24 // w
        raster = bytes((i * 7 + w) % 256 for i in range(w * h))
        payload = encode_bmp(raster, w, h)
        assert payload[:2] == b"BM"
        assert decode_bmp(payload) == (w, h, raster)
        assert decode_image(payload) == (w, h, raster)  # dispatch route
    # width 5 -> row 15 bytes -> pad 1: not in the corpus, still exact
    raster = bytes(range(25))
    assert decode_bmp(encode_bmp(raster, 5, 5)) == (5, 5, raster)


def test_resize_nearest_strides_and_ceil_dims():
    """2x nearest-neighbor keeps even rows/cols; odd dims round UP
    (ceil), and a factor larger than a dimension leaves one sample."""
    from changedatacapture_spark.operators.multimodal import resize_nearest

    # 4x3 raster, values = linear index
    px = bytes(range(12))
    w2, h2, out = resize_nearest(px, 4, 3, 2)
    assert (w2, h2) == (2, 2)
    # rows 0 and 2, cols 0 and 2 -> indices 0, 2, 8, 10
    assert out == bytes([0, 2, 8, 10])
    # 3x3 with factor 2: ceil(3/2)=2 per dim -> indices 0, 2, 6, 8
    px = bytes(range(9))
    assert resize_nearest(px, 3, 3, 2) == (2, 2, bytes([0, 2, 6, 8]))
    # factor beyond both dims: single top-left sample survives
    assert resize_nearest(px, 3, 3, 5) == (1, 1, bytes([0]))
    # factor 1 is the identity
    assert resize_nearest(px, 3, 3, 1) == (3, 3, px)


def test_bmp_decoder_handles_top_down_variant():
    """Negative biHeight (top-down row order) is the common 'other'
    BMP layout; the decoder must not mirror it."""
    import struct

    from changedatacapture_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    raster = bytes(range(12))
    up = bytearray(encode_bmp(raster, 4, 3))
    # rewrite header height to -3 and re-order rows top-down
    struct.pack_into("<i", up, 14 + 8, -3)
    row = 4 * 3  # no padding at width 4
    body = up[54:]
    up[54:] = body[2 * row : 3 * row] + body[row : 2 * row] + body[:row]
    assert decode_bmp(bytes(up)) == (4, 3, raster)


def test_bmp_decoder_rejects_non_bmp_and_unsupported():
    import pytest as _pytest

    from changedatacapture_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
    )

    with _pytest.raises(NotImplementedError):
        # JPEG: still no codec library in this container
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    with _pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 64)
